package graft

import graft.table.Versioned
import org.apache.spark.sql.functions._

/** Delta's constraint DDL through the delegating parser:
  * `ALTER TABLE t ADD CONSTRAINT name CHECK (expr)` /
  * `ALTER TABLE t DROP CONSTRAINT name` — thin commands onto the same
  * committed [[Versioned.addConstraint]]/[[Versioned.dropConstraint]]
  * the `CALL system.*` procedures run. Every other ALTER TABLE shape
  * keeps delegating to Spark's grammar untouched.
  */
class ConstraintDdlSpec extends SparkSpec {

  import spark.implicits._

  private def pathId(dir: String): String = s"`graft-versioned`.`$dir`"

  test("ADD CONSTRAINT enforces on subsequent appends; DROP lifts it") {
    val dir = tmpDir("consddl")
    Versioned.append(Seq((1L, 10L), (2L, 20L)).toDF("id", "x"), dir) // v1
    val v = spark.sql(
      s"ALTER TABLE ${pathId(dir)} ADD CONSTRAINT x_pos CHECK (x > 0)")
      .as[Long].head()
    assert(v == 2L)
    assert(Versioned.constraintsAt(spark, dir, 2L) == Map("x_pos" -> "x > 0"))
    val e = intercept[Exception] {
      Versioned.append(Seq((3L, -1L)).toDF("id", "x"), dir)
    }
    assert(e.getMessage.contains("x_pos"))
    // NULL passes (SQL CHECK semantics): x IS NULL is not FALSE
    Versioned.append(Seq((4L, Option.empty[Long])).toDF("id", "x"), dir) // v3
    val vd = spark.sql(
      s"ALTER TABLE ${pathId(dir)} DROP CONSTRAINT x_pos").as[Long].head()
    assert(vd == 4L)
    Versioned.append(Seq((5L, -9L)).toDF("id", "x"), dir) // v5: allowed again
    // rows: v1's two, v3's NULL row, v5's negative row (the violating
    // append never landed)
    assert(Versioned.read(spark, dir).count() == 4L)
    assert(Versioned.read(spark, dir).select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 4L, 5L))
  }

  test("ADD CONSTRAINT the current snapshot violates is refused") {
    val dir = tmpDir("consddl_viol")
    Versioned.append(Seq((1L, -5L)).toDF("id", "x"), dir)
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE ${pathId(dir)} ADD CONSTRAINT x_pos CHECK (x > 0)")
        .collect()
    }
    assert(e.getMessage.contains("x_pos"))
    assert(Versioned.currentVersion(spark, dir).contains(1L)) // nothing committed
  }

  test("compound expressions round-trip through the DDL") {
    val dir = tmpDir("consddl_compound")
    Versioned.append(Seq((1L, "web", 5L)).toDF("id", "src", "x"), dir)
    spark.sql(s"ALTER TABLE ${pathId(dir)} ADD CONSTRAINT shape " +
      "CHECK (x BETWEEN 0 AND 100 AND src IN ('web', 'app'))").collect()
    val e = intercept[Exception] {
      Versioned.append(Seq((2L, "bot", 5L)).toDF("id", "src", "x"), dir)
    }
    assert(e.getMessage.contains("shape"))
    Versioned.append(Seq((2L, "app", 99L)).toDF("id", "src", "x"), dir)
    assert(Versioned.read(spark, dir).count() == 2L)
  }

  test("other ALTER TABLE shapes still delegate to Spark's grammar") {
    spark.sql("CREATE TABLE IF NOT EXISTS consddl_sparktbl (id INT) USING parquet")
    try {
      // Spark's own ALTER TABLE productions must be untouched by the
      // constraint interception
      spark.sql(
        "ALTER TABLE consddl_sparktbl SET TBLPROPERTIES ('k' = 'v')")
      assert(spark.sql("SHOW TBLPROPERTIES consddl_sparktbl")
        .filter(col("key") === "k").count() == 1L)
    } finally spark.sql("DROP TABLE IF EXISTS consddl_sparktbl")
  }
}
