package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `array<float>` columns.
  *
  * All arithmetic is promoted to double and accumulated strictly
  * left-to-right so the DuckDB oracle (explicit list fold) produces
  * bit-identical values — a threshold comparison on cosine must not flip
  * between engines.
  *
  * The O(n·m) brute-force hot path evaluates through the fused codegen
  * expression graft.plans.DotProduct (one JVM loop per pair instead of
  * an interpreted `zip_with`+`aggregate` lambda per element — the round-1
  * bench's largest single cost). `dotReference` keeps the
  * higher-order-function form the spec checks the fused expression
  * against.
  */
object Vectors {

  /** Fused dot product over two `array<double>` columns. Callers cast
    * float embeddings up front (see `toDouble`).
    */
  def dot(a: Column, b: Column): Column =
    graft.plans.expressions.dotProduct(a, b)

  /** `array<float>` → `array<double>`, done once per row so every
    * downstream dot/norm runs on doubles.
    */
  def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Pre-fusion form of `dot` (equality-spec oracle). Unlike `dot` it
    * accepts float arrays directly (casts inside the lambda).
    */
  private[graft] def dotReference(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
