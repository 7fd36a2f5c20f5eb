package graft

import graft.table.Versioned
import org.apache.spark.sql.functions._

/** Declared clustering keys (the liquid-clustering analog): `CREATE
  * TABLE ... CLUSTER BY (cols)` / `ALTER TABLE ... CLUSTER BY` record
  * the layout contract as [[Versioned.ClusterByKey]]; bare `OPTIMIZE`
  * maintains it INCREMENTALLY (only the unclustered tail rewrites);
  * explicit ZORDER BY on a declared table refuses.
  */
class ClusterBySpec extends SparkSpec {

  import spark.implicits._

  private def freshCat(tag: String): String = {
    val cat = s"cbcat_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "org.apache.spark.sql.graft.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", tmpDir(s"cbwh_$tag"))
    spark.sql(s"CREATE NAMESPACE $cat.db")
    cat
  }

  test("CREATE TABLE ... CLUSTER BY declares; DESCRIBE surfaces; OPTIMIZE clusters") {
    val cat = freshCat("create")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, k BIGINT, v STRING) " +
      "CLUSTER BY (k, id)")
    // the declaration is a table property readable back through SHOW
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.db.t")
      .as[(String, String)].collect().toMap
    assert(props.get(Versioned.ClusterByKey).contains("k,id"))
    // and surfaces as clustering information in DESCRIBE output
    val desc = spark.sql(s"DESC EXTENDED $cat.db.t").collect().mkString("\n")
    assert(desc.contains("k") && desc.contains("id"))
    // several unclustered appends, then bare OPTIMIZE clusters them
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 7, 'a'), (2, 3, 'b')")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (3, 7, 'c'), (4, 1, 'd')")
    val v = spark.sql(s"OPTIMIZE $cat.db.t").collect().head.getLong(0)
    assert(v > 0)
    // content unchanged
    assert(spark.table(s"$cat.db.t").count() == 4)
    // incremental: a second OPTIMIZE with no new files is a no-op
    // (returns the same head — nothing left to cluster)
    val v2 = spark.sql(s"OPTIMIZE $cat.db.t").collect().head.getLong(0)
    assert(v2 == v, s"re-OPTIMIZE must be a no-op: $v -> $v2")
    // explicit ZORDER BY on a declared table refuses
    val e = intercept[Exception] {
      spark.sql(s"OPTIMIZE $cat.db.t ZORDER BY (id, k)").collect()
    }
    assert(e.getMessage.contains("CLUSTER BY"))
  }

  test("OPTIMIZE after new appends clusters only the tail") {
    val cat = freshCat("tail")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, k BIGINT) CLUSTER BY (k)")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 5), (2, 9)")
    val v1 = spark.sql(s"OPTIMIZE $cat.db.t").collect().head.getLong(0)
    val clusteredAfterFirst = Versioned.filesAt(spark,
      warehouseDir(cat, "db", "t"), v1).toSet
    // new unclustered batch
    spark.sql(s"INSERT INTO $cat.db.t VALUES (3, 2), (4, 8)")
    val v2 = spark.sql(s"OPTIMIZE $cat.db.t").collect().head.getLong(0)
    assert(v2 > v1)
    val after = Versioned.filesAt(spark, warehouseDir(cat, "db", "t"), v2).toSet
    // the first generation's clustered files carry verbatim — only the
    // appended tail rewrote
    assert(clusteredAfterFirst.subsetOf(after),
      s"first clustered generation must carry: $clusteredAfterFirst vs $after")
    assert(spark.table(s"$cat.db.t").count() == 4)
  }

  test("ALTER TABLE CLUSTER BY re-declares; CLUSTER BY NONE drops") {
    val cat = freshCat("alter")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, k BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 5)")
    spark.sql(s"ALTER TABLE $cat.db.t CLUSTER BY (k)")
    val dir = warehouseDir(cat, "db", "t")
    assert(Versioned.clusterByAt(spark, dir,
      Versioned.currentVersion(spark, dir).get) == Seq("k"))
    spark.sql(s"ALTER TABLE $cat.db.t CLUSTER BY NONE")
    assert(Versioned.clusterByAt(spark, dir,
      Versioned.currentVersion(spark, dir).get).isEmpty)
    // with no declaration, ZORDER BY works again
    spark.sql(s"OPTIMIZE $cat.db.t ZORDER BY (id, k)").collect()
  }

  test("invalid declarations refuse: absent column, non-zoneable type, >4 cols") {
    val cat = freshCat("invalid")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, s STRING, d DOUBLE)")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 'a', 1.5)")
    val e1 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.db.t CLUSTER BY (nope)")
    }
    assert(e1.getMessage.contains("nope"))
    // STRING clusters since string zones exist (truncated bounds);
    // a genuinely un-statable type still refuses
    spark.sql(s"ALTER TABLE $cat.db.t CLUSTER BY (s)")
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.db.t CLUSTER BY (d)")
    }
    assert(e2.getMessage.contains("zone-stat typed"))
    // CREATE with a bad declaration refuses too (validated at declare)
    val e3 = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.db.bad (a BIGINT, b DOUBLE) CLUSTER BY (b)")
    }
    assert(e3.getMessage.contains("zone-stat typed"))
  }

  test("path API: setProperties declares, zone pruning works after OPTIMIZE") {
    val dir = tmpDir("cb_path")
    Versioned.append(spark.range(0, 1000)
      .select(col("id"), (col("id") % 50).as("k")), dir)
    Versioned.append(spark.range(1000, 2000)
      .select(col("id"), (col("id") % 50).as("k")), dir)
    Versioned.setProperties(spark, dir, Map(Versioned.ClusterByKey -> "id"))
    val v = Versioned.zorderIncremental(spark, dir, Seq("id")).get
    // clustered + zoned: a range read prunes files
    val total = Versioned.filesAt(spark, dir, v).size
    val pruned = Versioned.prunedFiles(spark, dir, v, "id", 0L, 10L).size
    assert(pruned < total, s"zone pruning should drop files: $pruned of $total")
    assert(Versioned.readWhere(spark, dir, v, "id", 0L, 10L).count() == 11)
  }

  private def warehouseDir(cat: String, ns: String, t: String): String = {
    val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
    s"$wh/$ns/$t"
  }
}
