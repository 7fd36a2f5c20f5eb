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
  * Built on Spark's higher-order array functions (`zip_with`/`aggregate`),
  * which evaluate inside the generated plan without serialization; a fused
  * Catalyst expression (graft.plans.CosineSimilarity) covers the hot
  * O(n·m) brute-force path.
  */
object Vectors {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
