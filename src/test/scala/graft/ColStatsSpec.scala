package graft

import org.apache.spark.sql.functions._

import graft.table.{ColStats, Versioned}

/** ANALYZE ... FOR COLUMNS → CBO column statistics: the one-pass
  * computation, the sidecar round-trip and staleness rule, the SQL and
  * procedure spellings, and the wiring that matters — the optimizer's
  * per-attribute statistics populated from the DSv2 scan report.
  */
class ColStatsSpec extends SparkSpec {

  private def freshCat(tag: String): (String, String) = {
    val cat = s"cstat_$tag"
    val wh = tmpDir(s"cstatwh_$tag")
    spark.conf.set(s"spark.sql.catalog.$cat",
      "org.apache.spark.sql.graft.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    (cat, wh)
  }

  test("analyzeColumns computes exact nulls/min/max, plausible ndv; staleness rule") {
    val dir = tmpDir("cs_core")
    val df = spark.range(0, 1000).selectExpr(
      "id AS k",
      "CASE WHEN id % 10 = 0 THEN NULL ELSE id % 37 END AS m",
      "concat('s', id % 5) AS s",
      "date_add(DATE'2020-01-01', CAST(id % 30 AS INT)) AS d",
      "timestamp_micros(1577836800000000 + id * 1000000) AS t")
    Versioned.overwrite(df, dir)
    val (v, n) = Versioned.analyzeColumns(spark, dir, Seq("k", "m", "s", "d", "t"))
    assert(v == 1L && n == 5L)
    val stats = Versioned.colStatsAt(spark, dir, v).get
    val k = stats("k")
    assert(k.nulls == 0L && k.min.contains(0L) && k.max.contains(999L))
    assert(math.abs(k.ndv - 1000L) < 100L, s"HLL ndv off: ${k.ndv}")
    val m = stats("m")
    assert(m.nulls == 100L && m.min.contains(0L) && m.max.contains(36L))
    assert(m.ndv >= 30L && m.ndv <= 45L)
    val s = stats("s")
    assert(s.min.isEmpty && s.avgLen.contains(2L) && s.maxLen.contains(2L))
    assert(s.ndv >= 4L && s.ndv <= 6L)
    assert(s.hist.isEmpty, "strings never get a histogram")
    // histogram domains must match the served min/max domains: dates in
    // epoch DAYS, timestamps in epoch MICROS — a bare double cast would
    // refuse DATE outright and put timestamps in seconds while catalyst
    // estimation compares in micros
    val d = stats("d")
    assert(d.hist.exists(_.nonEmpty), "date column must get a histogram")
    assert(d.hist.get.head.lo == 18262.0 && d.hist.get.last.hi == 18291.0,
      s"date bins must span epoch days of [2020-01-01, 2020-01-30]: " +
        s"${d.hist.get.head.lo}..${d.hist.get.last.hi}")
    val ts = stats("t")
    assert(ts.hist.exists(_.nonEmpty), "timestamp column must get a histogram")
    assert(ts.hist.get.head.lo == 1577836800000000.0 &&
      ts.hist.get.last.hi == 1577836800000000.0 + 999e6,
      s"timestamp bins must be epoch micros: " +
        s"${ts.hist.get.head.lo}..${ts.hist.get.last.hi}")
    // append moves the head; stats still serve at the NEW head
    Versioned.append(spark.range(1000, 1100).selectExpr(
      "id AS k", "id % 37 AS m", "'sx' AS s",
      "DATE'2020-01-01' AS d", "timestamp_micros(1577836800000000) AS t"), dir)
    assert(Versioned.colStatsAt(spark, dir,
      Versioned.currentVersion(spark, dir).get).isDefined)
    // ...but never below the analyzed version (time travel)
    Versioned.analyzeColumns(spark, dir, Seq("k"))
    assert(Versioned.colStatsAt(spark, dir, 1L).isEmpty)
  }

  test("CBO reads the reported stats: attributeStats carry ndv and bounds") {
    val (cat, _) = freshCat("cbo")
    spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, v BIGINT)")
    spark.range(0, 5000).selectExpr("id % 50 AS k", "id AS v")
      .createOrReplaceTempView("cs_src")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM cs_src")
    val out = spark.sql(
      s"ANALYZE TABLE $cat.db.t COMPUTE STATISTICS FOR COLUMNS k, v")
      .collect().head
    assert(out.getLong(1) == 2L)
    val prev = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val q = spark.sql(s"SELECT * FROM $cat.db.t WHERE k = 3")
      val rel = q.queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
      }.get
      val attrs = rel.stats.attributeStats
      assert(attrs.nonEmpty, "attributeStats must be populated from columnStats()")
      val kStat = attrs.find(_._1.name == "k").get._2
      assert(kStat.distinctCount.exists(d =>
        (d.toLong - 50L).abs <= 5L), s"ndv(k) off: ${kStat.distinctCount}")
      assert(kStat.min.contains(0L) && kStat.max.contains(49L))
      assert(kStat.nullCount.contains(BigInt(0)))
      // the estimate CBO computes FROM the ndv: `k = 3` selects
      // ~n/ndv of the 5000 rows — the number join reorder runs on
      val filterRows = q.queryExecution.optimizedPlan.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.stats.rowCount
      }.flatten
      assert(filterRows.exists(rc =>
        rc.toLong >= 50L && rc.toLong <= 200L),
        s"CBO filter estimate should be ~5000/ndv(50) = 100: $filterRows")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None => spark.conf.unset("spark.sql.cbo.enabled")
    }
  }

  test("FOR ALL COLUMNS and CALL system.analyze_columns cover the surface") {
    val (cat, wh) = freshCat("all")
    spark.sql(s"CREATE TABLE $cat.db.t (a BIGINT, b STRING)")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 'x'), (2, 'yy'), (NULL, NULL)")
    val all = spark.sql(
      s"ANALYZE TABLE $cat.db.t COMPUTE STATISTICS FOR ALL COLUMNS")
      .collect().head
    assert(all.getLong(1) == 2L)
    val dir = s"$wh/db/t"
    val head = Versioned.currentVersion(spark, dir).get
    val stats = Versioned.colStatsAt(spark, dir, head).get
    assert(stats("a").nulls == 1L && stats("a").min.contains(1L) &&
      stats("a").max.contains(2L))
    assert(stats("b").maxLen.contains(2L))
    // procedure form re-analyzes a subset
    val pr = spark.sql(
      s"CALL $cat.system.analyze_columns(table => 'db.t', cols => 'a')")
      .collect().head
    assert(pr.getLong(1) == 1L)
    assert(Versioned.colStatsAt(spark, dir, head).get.keySet == Set("a"))
    // unknown column refuses loudly
    intercept[Exception] {
      Versioned.analyzeColumns(spark, dir, Seq("zz"))
    }
  }

  test("CBO join reorder runs on the served stats: selective join builds first") {
    val (cat, _) = freshCat("reorder")
    spark.sql(s"CREATE TABLE $cat.db.f (k1 BIGINT, k2 BIGINT, v BIGINT)")
    spark.sql(s"CREATE TABLE $cat.db.d1 (k1 BIGINT, a BIGINT)")
    spark.sql(s"CREATE TABLE $cat.db.d2 (k2 BIGINT, b BIGINT)")
    spark.range(0, 50000)
      .selectExpr("id % 5000 AS k1", "id % 10 AS k2", "id AS v")
      .createOrReplaceTempView("ro_f")
    spark.range(0, 5000).selectExpr("id AS k1", "id AS a")
      .createOrReplaceTempView("ro_d1")
    spark.range(0, 5000).selectExpr("id AS k2", "id AS b")
      .createOrReplaceTempView("ro_d2")
    spark.sql(s"INSERT INTO $cat.db.f SELECT * FROM ro_f")
    spark.sql(s"INSERT INTO $cat.db.d1 SELECT * FROM ro_d1")
    spark.sql(s"INSERT INTO $cat.db.d2 SELECT * FROM ro_d2")
    Seq("f", "d1", "d2").foreach(t => spark.sql(
      s"ANALYZE TABLE $cat.db.$t COMPUTE STATISTICS FOR ALL COLUMNS"))
    // written order joins d1 (unselective) first; `d2.b < 5` makes the
    // d2 join shrink the intermediate, which only statistics can see
    def innermostJoinKey(cbo: Boolean): String = {
      val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
      val prev = keys.map(k => k -> spark.conf.getOption(k))
      try {
        keys.foreach(k => spark.conf.set(k, cbo.toString))
        val q = spark.sql(s"SELECT sum(f.v + d1.a + d2.b) AS s FROM $cat.db.f f " +
          s"JOIN $cat.db.d1 d1 ON f.k1 = d1.k1 " +
          s"JOIN $cat.db.d2 d2 ON f.k2 = d2.k2 AND d2.b < 5")
        assert(q.head().getLong(0) ==
          spark.sql("SELECT sum(f.v + d1.a + d2.b) FROM ro_f f " +
            "JOIN ro_d1 d1 ON f.k1 = d1.k1 " +
            "JOIN ro_d2 d2 ON f.k2 = d2.k2 AND d2.b < 5").head().getLong(0))
        val joins = q.queryExecution.optimizedPlan.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
        }
        // deepest Join = built first; its condition names the key
        joins.last.condition.get.references.map(_.name)
          .filter(_.startsWith("k")).head
      } finally prev.foreach {
        case (k, Some(x)) => spark.conf.set(k, x)
        case (k, None) => spark.conf.unset(k)
      }
    }
    assert(innermostJoinKey(cbo = false) == "k1",
      "without CBO the written order stands (d1 joins first)")
    assert(innermostJoinKey(cbo = true) == "k2",
      "with stats, join reorder must build the selective d2 join first")
  }

  test("sidecar round-trips every field including null markers") {
    val dir = tmpDir("cs_rt")
    Versioned.overwrite(spark.range(3).selectExpr("id AS k"), dir)
    val stats = Map(
      "k" -> ColStats.Stat(3L, 0L, Some(-5L), Some(9L), None, None),
      "s" -> ColStats.Stat(2L, 1L, None, None, Some(4L), Some(7L)),
      "h" -> ColStats.Stat(9L, 0L, Some(0L), Some(99L), None, None,
        Some(12.5), Some(Seq(ColStats.Bin(0.0, 3.5, 4L),
          ColStats.Bin(3.5, 99.0, 5L)))))
    ColStats.write(spark, dir, 1L, stats)
    assert(ColStats.read(spark, dir).contains((1L, stats)))
  }

  test("equi-height histograms fix skewed-predicate estimation (hot key within 2x)") {
    val (cat, wh) = freshCat("hist")
    spark.sql(s"CREATE TABLE $cat.db.z (k BIGINT, v BIGINT)")
    // Zipfian-ish: 80% of rows carry the hot key 7; the rest spread
    // over ~1000 values. Uniform n/ndv estimation puts `k = 7` at
    // ~50000/1000 = 50 rows — off by nearly 3 orders of magnitude.
    spark.range(0, 50000)
      .selectExpr("CASE WHEN id % 5 < 4 THEN 7 ELSE id % 1000 END AS k",
        "id AS v")
      .createOrReplaceTempView("cs_zipf")
    spark.sql(s"INSERT INTO $cat.db.z SELECT * FROM cs_zipf")
    spark.sql(s"ANALYZE TABLE $cat.db.z COMPUTE STATISTICS FOR COLUMNS k")
    val stats = Versioned.colStatsAt(spark, wh + "/db/z",
      Versioned.currentVersion(spark, wh + "/db/z").get).get
    val kStat = stats("k")
    assert(kStat.hist.exists(_.nonEmpty), "ANALYZE must publish a histogram")
    assert(kStat.histHeight.exists(h => h > 0.0),
      s"histogram height must be positive: ${kStat.histHeight}")
    // ≥60% of equi-height bins collapse onto the hot key
    val hot = kStat.hist.get.count(b => b.lo == 7.0 && b.hi == 7.0)
    assert(hot.toDouble / kStat.hist.get.size > 0.6,
      s"hot key must dominate the bins: $hot of ${kStat.hist.get.size}")
    val prev = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      def estimate(pred: String): Option[BigInt] =
        spark.sql(s"SELECT * FROM $cat.db.z WHERE $pred")
          .queryExecution.optimizedPlan.collectFirst {
            case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
              f.stats.rowCount
          }.flatten
      val truth = 40000L
      val est = estimate("k = 7")
      assert(est.exists(rc =>
        rc.toLong >= truth / 2 && rc.toLong <= truth * 2),
        s"histogram estimate must land within 2x of $truth: $est")
      // ranges too: k <= 7 covers the hot mass plus a sliver; uniform
      // interpolation over [0, 999] would estimate ~8/1000 of the rows
      val rangeTruth = spark.sql(s"SELECT count(*) FROM $cat.db.z WHERE k <= 7")
        .head().getLong(0)
      val rangeEst = estimate("k <= 7")
      assert(rangeEst.exists(rc =>
        rc.toLong >= rangeTruth / 2 && rc.toLong <= rangeTruth * 2),
        s"histogram range estimate must land within 2x of $rangeTruth: $rangeEst")
    } finally prev match {
      case Some(x) => spark.conf.set("spark.sql.cbo.enabled", x)
      case None => spark.conf.unset("spark.sql.cbo.enabled")
    }
  }
}
