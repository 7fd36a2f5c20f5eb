package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.plans.{DotProduct, IntersectSize, KMinValues, MinHashSig, PolyHash, WordShingles}

/** SQL surface of the engine's fused expressions — the standard library
  * extension mechanism (`SparkSessionExtensions`), so a pure-SQL user
  * gets the same codegen'd operators the Scala API uses:
  *
  *   spark.sql.extensions=graft.GraftExtensions   (at session build), or
  *   GraftExtensions.register(spark)              (on a live session)
  *
  * then e.g.
  *   SELECT graft_polyhash(text)             AS fingerprint,
  *          graft_word_shingles(text, 3)     AS shingles,
  *          graft_minhash_sig(hashes, 128)   AS sig,
  *          graft_dot(a, b)                  AS dot,
  *          graft_intersect_size(sa, sb)     AS shared
  *
  * Width/base arguments must be integer literals: they parameterize the
  * generated expression tree (a MinHash signature width is plan
  * structure, not data).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) if v.isValidInt => v.toInt
    case other =>
      throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  private def fn(
      name: String,
      usage: String,
      builder: Seq[Expression] => Expression):
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = {
    def arity(args: Seq[Expression]): Expression =
      try builder(args) catch {
        case _: MatchError =>
          throw new IllegalArgumentException(s"wrong arguments for $name — usage: $usage")
      }
    (FunctionIdentifier(name), new ExpressionInfo("graft", name), arity)
  }

  /** (identifier, info, builder) for every exposed function. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("graft_polyhash", "graft_polyhash(str[, base])", {
      case Seq(c) => PolyHash(c)
      case Seq(c, b) => PolyHash(c, litInt(b, "base").toLong)
    }),
    fn("graft_dot", "graft_dot(array<double>, array<double>)", {
      case Seq(a, b) => DotProduct(a, b)
    }),
    fn("graft_word_shingles", "graft_word_shingles(str, k)", {
      case Seq(c, k) => WordShingles(c, litInt(k, "k"))
    }),
    fn("graft_minhash_sig", "graft_minhash_sig(array<bigint>, n)", {
      case Seq(c, n) => MinHashSig(c, litInt(n, "n"))
    }),
    fn("graft_intersect_size", "graft_intersect_size(array<string>, array<string>)", {
      case Seq(a, b) => IntersectSize(a, b)
    }),
    fn("graft_kmin", "graft_kmin(bigint, k) — aggregate: k smallest distinct values", {
      case Seq(c, k) => KMinValues(c, litInt(k, "k")).toAggregateExpression()
    }))

  /** Registers every function on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      Bridge.registerFunction(spark, id, info, builder)
    }
}
