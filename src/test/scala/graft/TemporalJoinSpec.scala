package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOf, RangeJoin}

/** AsOf.joinAsOf and RangeJoin.joinRange edge semantics: tie-breaks,
  * strictness, no-match null extension, negative-epoch buckets, and
  * equivalence of the bucketized range join with the naive inequality
  * join on random data.
  */
class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def leftDf = Seq(
    (1L, 100L, "p1"), // before any right row
    (1L, 200L, "p2"), // exactly ON a right ts
    (1L, 350L, "p3"),
    (2L, 500L, "p4")  // key with no right rows at all
  ).toDF("k", "ts", "tag")

  private def rightDf = Seq(
    (1L, 200L, "r-early", 10L),
    (1L, 200L, "r-late", 20L), // same (k, ts): tiebreak must pick this
    (1L, 300L, "r-mid", 30L)
  ).toDF("k", "rts", "rtag", "seq")

  test("asof backward inclusive: equal-ts right row matches, ties resolved by tiebreak") {
    val out = AsOf.joinAsOf(leftDf, rightDf, Seq("k"),
        "ts", "rts", Seq("rtag", "rts"), tiebreak = col("seq"))
      .orderBy("k", "ts")
      .select("tag", "rtag", "rts").as[(String, Option[String], Option[Long])]
      .collect().toSeq
    assert(out == Seq(
      ("p1", None, None),            // nothing at or before 100
      ("p2", Some("r-late"), Some(200L)), // inclusive + max-seq tie win
      ("p3", Some("r-mid"), Some(300L)),  // latest of the two prior ts
      ("p4", None, None)))           // key absent on the right
  }

  test("asof strict excludes the equal-ts right row") {
    val out = AsOf.joinAsOf(leftDf, rightDf, Seq("k"),
        "ts", "rts", Seq("rtag"), tiebreak = col("seq"), strict = true)
      .orderBy("k", "ts")
      .select("tag", "rtag").as[(String, Option[String])].collect().toSeq
    assert(out == Seq(
      ("p1", None),
      ("p2", None),         // strict: the equal-ts rts=200 no longer qualifies
      ("p3", Some("r-mid")), // latest rts strictly before 350 is 300
      ("p4", None)))
  }

  test("asof payload name collision with left side is rejected") {
    val ex = intercept[IllegalArgumentException] {
      AsOf.joinAsOf(leftDf, rightDf.withColumnRenamed("rtag", "tag"),
        Seq("k"), "ts", "rts", Seq("tag"), tiebreak = col("seq"))
    }
    assert(ex.getMessage.contains("collide"))
  }

  test("asof join matches the naive per-row argmax on random data (both modes)") {
    val rnd = new scala.util.Random(23)
    val ls = Seq.tabulate(250)(i => (rnd.nextInt(6).toLong, rnd.nextInt(500).toLong, i.toLong))
    val rs = Seq.tabulate(250)(i => (rnd.nextInt(6).toLong, rnd.nextInt(500).toLong, (1000 + i).toLong))
    val l = ls.toDF("k", "ts", "lid")
    val r = rs.toDF("k", "rts", "rid")
    for (strict <- Seq(false, true); dir <- Seq("backward", "forward")) {
      val got = AsOf.joinAsOf(l, r, Seq("k"), "ts", "rts", Seq("rid"),
          tiebreak = col("rid"), strict = strict, direction = dir)
        .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
      val want = ls.map { case (lk, lt, lid) =>
        val cands = rs.filter { case (rk, rt, _) =>
          rk == lk && ((dir, strict) match {
            case ("backward", false) => rt <= lt
            case ("backward", true)  => rt < lt
            case ("forward", false)  => rt >= lt
            case (_, _)              => rt > lt
          })
        }
        lid -> (if (cands.isEmpty) None
                else if (dir == "backward")
                  Some(cands.maxBy(c => (c._2, c._3))._3) // latest ts, then max rid
                else
                  // earliest ts; ties still resolved by MAX rid
                  Some(cands.minBy(c => (c._2, -c._3))._3))
      }.toMap
      assert(got == want, s"strict=$strict direction=$dir")
    }
  }

  test("asof null semantics: null keys and null timestamps never match (both directions)") {
    val l = Seq(
      (Some(1L), Some(100L), "normal"),
      (Some(1L), None, "null-ts"),   // null left ts → no match
      (None, Some(100L), "null-key") // null left key → no match
    ).toDF("k", "ts", "tag")
    val r = Seq(
      (Some(1L), Some(50L), "real", 1L),
      (Some(1L), None, "ghost-ts", 2L), // null rts must never carry forward
      (None, Some(40L), "ghost-key", 3L) // null key must never equi-match
    ).toDF("k", "rts", "rtag", "seq")
    for (dir <- Seq("backward", "forward")) {
      val got = AsOf.joinAsOf(l, r, Seq("k"), "ts", "rts", Seq("rtag"),
          tiebreak = col("seq"), direction = dir)
        .select("tag", "rtag").as[(String, Option[String])].collect().toMap
      assert(got("null-ts").isEmpty, s"[$dir] null left ts must match nothing")
      assert(got("null-key").isEmpty, s"[$dir] null left key must match nothing")
      val wantNormal = if (dir == "backward") Some("real") else None
      assert(got("normal") == wantNormal,
        s"[$dir] only the non-null right row may match: $got")
    }
  }

  test("range join matches the naive inequality join on random data incl. negative epochs") {
    val rnd = new scala.util.Random(7)
    val ls = Seq.tabulate(300)(i =>
      (rnd.nextInt(5).toLong, rnd.nextLong() % 10000L - 3000L, i.toLong))
    val rs = Seq.tabulate(300)(i =>
      (rnd.nextInt(5).toLong, rnd.nextLong() % 10000L - 3000L, (1000 + i).toLong))
    val l = ls.toDF("k", "ts", "lid")
    val r = rs.toDF("k", "rts", "rid")
    val got = RangeJoin.joinRange(l, r, Seq("k"), "ts", "rts",
        lo = -700L, hi = 250L, payload = Seq("rid", "rts"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val want = (for {
      (lk, lt, lid) <- ls
      (rk, rt, rid) <- rs
      if lk == rk && rt >= lt - 700L && rt < lt + 250L
    } yield (lid, rid)).toSet
    assert(got == want && want.nonEmpty)
  }

  test("overlap join matches the naive interval-intersection join on random data") {
    val rnd = new scala.util.Random(31)
    def mk(n: Int, idBase: Int) = Seq.tabulate(n) { i =>
      val s = rnd.nextLong() % 5000L - 1000L
      (rnd.nextInt(4).toLong, s, s + rnd.nextInt(300), (idBase + i).toLong)
    }
    val ls = mk(200, 0)
    val rs = mk(200, 1000)
    val got = RangeJoin.joinOverlap(
        ls.toDF("k", "ls", "le", "lid"), rs.toDF("k", "rs", "re", "rid"),
        Seq("k"), "ls", "le", "rs", "re", maxLen = 300L, payload = Seq("rid", "rs", "re"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val want = (for {
      (lk, lsr, ler, lid) <- ls
      (rk, rsr, rer, rid) <- rs
      if lk == rk && lsr <= rer && rsr <= ler
    } yield (lid, rid)).toSet
    assert(got == want && want.nonEmpty)
  }

  test("overlap join fails loudly when an interval exceeds the declared bound") {
    val l = Seq((1L, 0L, 500L, 1L)).toDF("k", "ls", "le", "lid") // len 500 > 100
    val r = Seq((1L, 10L, 20L, 2L)).toDF("k", "rs", "re", "rid")
    val ex = intercept[Exception] {
      RangeJoin.joinOverlap(l, r, Seq("k"), "ls", "le", "rs", "re",
        maxLen = 100L, payload = Seq("rid")).collect()
    }
    assert(ex.getMessage != null &&
      (ex.getMessage.contains("maxLen") || ex.getMessage.contains("USER_RAISED")),
      s"expected the per-row bound guard to fire, got: ${ex.getMessage}")
  }

  test("range join keeps the physical plan an equi-join (no nested loop)") {
    val l = Seq((1L, 10L)).toDF("k", "ts")
    val r = Seq((1L, 12L, "x")).toDF("k", "rts", "p")
    val plan = RangeJoin.joinRange(l, r, Seq("k"), "ts", "rts", 0L, 100L, Seq("p"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n$plan")
  }
}
