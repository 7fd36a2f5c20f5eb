package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.ops.{Cleanse, Dedup}
import graft.functions.Text

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("W1 dedupLatest keeps exactly one row per key with deterministic tiebreak") {
    val df = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 20L, "c"), // tie on ts, id tiebreak
      (2L, 5L, "d")).toDF("user", "ts", "v")
      .withColumn("id", monotonically_increasing_id())
    val out = Dedup.latestByKey(df, Seq("user"), Seq(col("ts").desc, col("v").desc))
      .select("user", "v").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "c", 2L -> "d"))
  }

  test("A9 modePerGroup returns most frequent value, ascending-value tiebreak") {
    val df = Seq(
      (1, "x"), (1, "x"), (1, "y"),
      (2, "b"), (2, "a")).toDF("k", "v") // tie → 'a'
    val out = Dedup.modePerGroup(df, Seq("k"), "v")
      .select("k", "v").as[(Int, String)].collect().toMap
    assert(out === Map(1 -> "x", 2 -> "a"))
  }

  test("safeCast: corrupt values become NULL and are droppable") {
    val df = Seq("12", "x7", "", "42").toDF("s")
      .withColumn("i", Cleanse.safeCast(col("s"), IntegerType))
    assert(df.filter(col("i").isNotNull).count() === 2)
  }

  test("safeTimestamp: unparseable input yields NULL, not an exception") {
    val df = Seq("2024-01-02 03:04:05", "not-a-date").toDF("s")
      .withColumn("t", Cleanse.safeTimestamp(col("s"), "yyyy-MM-dd HH:mm:ss"))
    assert(df.filter(col("t").isNotNull).count() === 1)
  }

  test("normalization helpers") {
    val df = Seq(("  mIxEd Case  ", " SP ")).toDF("a", "b").select(
      Cleanse.normUpper(col("a")).as("u"),
      Cleanse.normLower(col("a")).as("l"),
      Cleanse.normTitle(col("a")).as("t"),
      Cleanse.withDefault(lit(null).cast("int"), lit(7)).as("d"))
    val r = df.as[(String, String, String, Int)].head()
    assert(r === (("MIXED CASE", "mixed case", "Mixed Case", 7)))
  }

  test("polyHash matches the reference arithmetic") {
    val got = Seq("hello world").toDF("s")
      .select(Text.polyHash(col("s"))).as[Long].head()
    var h = 0L
    "hello world".foreach(c => h = (h * 31 + c.toLong) % 1000000007L)
    assert(got === h)
  }

  test("shingles: k-grams for long docs, whole text for short docs") {
    val df = Seq("a b c d", "x y").toDF("s")
    val out = df.select(Text.shingles(col("s"), 3)).as[Seq[String]].collect()
    assert(out(0) === Seq("a b c", "b c d"))
    assert(out(1) === Seq("x y"))
  }

  test("langId picks the language with most marker hits") {
    val df = Seq(
      "the cat and the dog is in a house",
      "la que de el en y los",
      "zzz qqq www").toDF("s")
    val out = df.select(Text.langId(col("s"))).as[String].collect().toSeq
    assert(out === Seq("en", "es", "und"))
  }

  test("Quality rules flag, split, and summarize consistently; NULL cond fails") {
    import graft.ops.Quality
    val df = Seq[(java.lang.Long, String)](
      (1L, "ok"), (2L, "bad"), (null, "ok"), (4L, null))
      .toDF("k", "s")
    val rules = Seq(
      Quality.Rule("k_present", col("k").isNotNull),
      Quality.Rule("s_ok", col("s") === "ok")) // NULL s → NULL cond → fail
    val flagged = Quality.flag(df, rules)
      .select(col("s"), col("_violations"))
      .as[(Option[String], Seq[String])].collect()
    assert(flagged.toSet === Set(
      (Some("ok"), Seq.empty),
      (Some("bad"), Seq("s_ok")),
      (Some("ok"), Seq("k_present")),
      (None, Seq("s_ok"))))
    val (clean, dirty) = Quality.split(df, rules)
    assert(clean.columns.toSeq == df.columns.toSeq) // schema untouched
    assert(clean.count() == 1 && dirty.count() == 3)
    val sm = Quality.summary(df, rules)
      .select("rule", "n_rows", "n_fail")
      .as[(String, Long, Long)].collect().toSet
    assert(sm === Set(("k_present", 4L, 1L), ("s_ok", 4L, 2L)))
  }
}
