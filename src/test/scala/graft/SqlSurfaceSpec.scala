package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{Text, Vectors}

/** The SQL function surface (GraftExtensions) must evaluate identically
  * to the Column API it mirrors, through both registration paths.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("registered SQL functions match their Column twins") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(
      ("the quick brown fox jumps the fence", Seq(0.5, -1.0, 2.0), Seq(1.5, 0.25, -0.5)),
      ("a b", Seq(0.0, 0.0, 0.0), Seq(1.0, 1.0, 1.0)))
      .toDF("t", "va", "vb").createOrReplaceTempView("sqlsurface")

    val viaSql = spark.sql(
      """SELECT graft_polyhash(t) AS h,
        |       graft_polyhash(t, 131) AS h2,
        |       graft_word_shingles(t, 3) AS sh,
        |       graft_minhash_sig(transform(graft_word_shingles(t, 3),
        |         s -> graft_polyhash(s)), 8) AS sig,
        |       graft_dot(va, vb) AS d,
        |       graft_intersect_size(graft_word_shingles(t, 3),
        |         graft_word_shingles(t, 3)) AS isz
        |FROM sqlsurface""".stripMargin).collect()
    val viaColumns = spark.table("sqlsurface").select(
      Text.polyHash(col("t")).as("h"),
      Text.polyHash2(col("t")).as("h2"),
      Text.shingles(col("t"), 3).as("sh"),
      Text.minhashSignature(
        transform(Text.shingles(col("t"), 3), s => Text.polyHash(s)), 8).as("sig"),
      Vectors.dot(col("va"), col("vb")).as("d"),
      graft.plans.expressions.intersectSize(
        Text.shingles(col("t"), 3), Text.shingles(col("t"), 3)).as("isz")).collect()
    assert(viaSql.toSeq == viaColumns.toSeq)
  }

  test("graft_kmin SQL aggregate matches the Column-API sketch") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(5L, 3L, 9L, 3L, 1L, 7L).toDF("v").createOrReplaceTempView("kminsurface")
    val viaSql = spark.sql("SELECT graft_kmin(v, 3) AS km FROM kminsurface")
      .as[Seq[Long]].head
    val viaColumn = spark.table("kminsurface")
      .agg(graft.plans.expressions.kMinValues(col("v"), 3).as("km"))
      .as[Seq[Long]].head
    assert(viaSql == Seq(1L, 3L, 5L) && viaColumn == viaSql)
  }

  test("non-literal width argument fails with a clear message") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_word_shingles('a b c', cast(rand()*3 AS INT))").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("the extensions class applies at session build time") {
    // `spark.sql.extensions=graft.GraftExtensions` takes this same class
    // on a cold start; in-JVM (where a SharedState already exists and
    // static confs are frozen) the builder hook is the testable path.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      // 'abc' -> ((97*31 + 98)*31 + 99) mod 1e9+7 = 96354
      assert(s2.sql("SELECT graft_polyhash('abc')").head.getLong(0) == 96354L)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
