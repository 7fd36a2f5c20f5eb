package graft

import graft.table.Versioned

/** Commit-COUNT scale: the sf1 rehearsal scaled data 10×; this pins the
  * other axis — a streamed bronze tier accumulates 10⁴–10⁵ commits, and
  * every hot read path must stay at BOUNDED driver log reads however
  * long the history grows: snapshot resolution O(CheckpointInterval),
  * timestamp index O(log N), change feeds O(window), z-order
  * provenance O(CheckpointInterval). `graft.tools.CommitScale` measures
  * the same contract at 10⁴ commits (numbers in BASELINE.md); this spec
  * pins the bounds at fixture scale so a regression fails fast.
  */
class CommitScaleSpec extends SparkSpec {

  import spark.implicits._

  private def reads[T](body: => T): (T, Long) = {
    val r0 = Versioned.logReads.get()
    val out = body
    (out, Versioned.logReads.get() - r0)
  }

  test("a 200-commit history keeps every hot read path at bounded log reads") {
    val dir = tmpDir("cs_tbl")
    // one real parquet file, byte-copied under N distinct names: N
    // log-only commits for the price of one write job (addFiles — the
    // path a backfill or CDC fixture lands micro-batch commits through)
    Versioned.append(Seq((0L, "seed")).toDF("id", "s"), dir) // v1
    val seedRel = Versioned.filesAt(spark, dir, 1L).head
    val seedBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, seedRel))
    val schema = Seq((0L, "")).toDF("id", "s").schema
    val n = 200
    (0 until n).foreach { i =>
      val rel = s"d-cs-$i/part-0.parquet"
      val p = java.nio.file.Paths.get(dir, rel)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, seedBytes)
      Versioned.addFiles(spark, dir, Seq(rel), knownSchema = Some(schema))
    }
    val head = Versioned.currentVersion(spark, dir).get
    assert(head == (n + 1).toLong)

    // snapshot resolution: nearest checkpoint + delta suffix, NOT a
    // walk over the whole history
    val (files, rFiles) = reads(Versioned.filesAt(spark, dir, head))
    assert(files.size == n + 1)
    assert(rFiles <= Versioned.CheckpointInterval + 4,
      s"filesAt opened $rFiles log entries on a $n-commit history")

    // timestamp index: binary search over the nondecreasing commit
    // timestamps — ~2·log2(N), not one read per retained version
    val (_, rAsOf) = reads(
      Versioned.versionAsOf(spark, dir, System.currentTimeMillis()))
    assert(rAsOf <= 24, s"versionAsOf opened $rAsOf log entries")
    val t0 = Versioned.commitTimestampAt(spark, dir, 1L)
    val (vSince, rSince) = reads(Versioned.versionSince(spark, dir, t0))
    assert(vSince == 1L)
    assert(rSince <= 24, s"versionSince opened $rSince log entries")

    // change feed over the last 8 commits: O(window) log reads — the
    // 192 out-of-window appends contribute nothing
    val (feedRows, rCdf) = reads(
      Versioned.changesWithType(spark, dir, head - 8, head).count())
    assert(feedRows == 8L) // 8 append commits × 1 row each
    assert(rCdf <= 8 * 3 + 2 * Versioned.CheckpointInterval + 8,
      s"an 8-commit CDF window opened $rCdf log entries")

    assert(Versioned.read(spark, dir).count() == (n + 1).toLong)

    // newest-K history: O(K + CheckpointInterval) log reads — the
    // monitoring query ("last 10 commits") must not replay the whole
    // log the way the unbounded walk does
    Versioned.clearFilesMemo()
    val (hist10, rHist) = reads(
      Versioned.history(spark, dir, 10).collect().toSeq)
    assert(hist10.size == 10)
    assert(hist10.map(_.getLong(0)) ==
      ((n - 8).toLong to (n + 1).toLong), "window must be the newest 10")
    // full walk for the same window's ground truth: n_files agrees
    val full10 = Versioned.history(spark, dir).collect().toSeq.takeRight(10)
    assert(hist10.map(r => (r.getLong(0), r.getString(1), r.getLong(3))) ==
      full10.map(r => (r.getLong(0), r.getString(1), r.getLong(3))))
    assert(rHist <= 10 + Versioned.CheckpointInterval + 4,
      s"history(10) opened $rHist log entries on a $n-commit history")

    // retention: vacuum truncates 196 versions; the head still resolves
    // in O(CheckpointInterval) from the published anchor. 196 dropped
    // versions exceed VacuumDistributedMin, so this sweep must run
    // EXECUTOR-side — the driver-loop bottleneck Delta also distributes.
    val sweeps0 = Versioned.vacuumDistributedSweeps.get()
    Versioned.vacuum(spark, dir, keepVersions = 5)
    assert(Versioned.vacuumDistributedSweeps.get() > sweeps0,
      "a 196-version truncation must sweep executor-side")
    assert(Versioned.versions(spark, dir).size == 5)
    val (files2, rFiles2) = reads(Versioned.filesAt(spark, dir, head))
    assert(files2.size == n + 1)
    assert(rFiles2 <= Versioned.CheckpointInterval + 4,
      s"post-vacuum filesAt opened $rFiles2 log entries")
    assert(Versioned.read(spark, dir).count() == (n + 1).toLong)
  }

  test("distributed vacuum removes exactly what the dry run reported, data files included") {
    val dir = tmpDir("cs_distvac")
    // 8 overwrite commits: each leaves the predecessor's d-* dir dead,
    // so the sweep has real data dirs to remove, not just log entries
    (1 to 8).foreach(i =>
      Versioned.overwrite(Seq((i.toLong, s"r$i")).toDF("id", "s"), dir))
    val before = Versioned.read(spark, dir).collect().toSeq
    val prevMin = Versioned.VacuumDistributedMin
    Versioned.VacuumDistributedMin = 2 // force the executor path at fixture scale
    try {
      val planned = Versioned.vacuum(spark, dir, keepVersions = 2, dryRun = true)
      val sweeps0 = Versioned.vacuumDistributedSweeps.get()
      val removed = Versioned.vacuum(spark, dir, keepVersions = 2)
      assert(Versioned.vacuumDistributedSweeps.get() > sweeps0)
      assert(removed.toSet == planned.toSet,
        s"live run must remove exactly the dry-run report; " +
          s"extra=${removed.toSet -- planned.toSet} missing=${planned.toSet -- removed.toSet}")
      assert(removed.exists(_.contains("/d-")), "dead data dirs must be swept")
      // the table survives intact: retained versions read, head unchanged
      assert(Versioned.versions(spark, dir) == Seq(7L, 8L))
      assert(Versioned.read(spark, dir).collect().toSeq == before)
      assert(Versioned.readAt(spark, dir, 7L).count() == 1L)
    } finally Versioned.VacuumDistributedMin = prevMin
  }

  test("checkpoints record z-order provenance even when EMPTY, bounding the walk") {
    val dir = tmpDir("cs_cl")
    // a never-OPTIMIZEd history spanning several checkpoints — the
    // shape a streamed bronze tier has. Every full-list entry must
    // still carry "clusteredidx":"" so clusteredKeysAt (called by
    // EVERY checkpoint commit) terminates at the nearest checkpoint
    // instead of walking all retained entries to conclude "empty"
    Versioned.append(Seq((0L, "seed")).toDF("id", "s"), dir) // v1
    val seedRel = Versioned.filesAt(spark, dir, 1L).head
    val seedBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, seedRel))
    val schema = Seq((0L, "")).toDF("id", "s").schema
    (0 until 40).foreach { i =>
      val rel = s"d-cscl-$i/part-0.parquet"
      val p = java.nio.file.Paths.get(dir, rel)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, seedBytes)
      Versioned.addFiles(spark, dir, Seq(rel), knownSchema = Some(schema))
    }
    val head = Versioned.currentVersion(spark, dir).get // 41
    // the checkpoint entries themselves carry the empty field
    val ckptJson = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_graft_log", f"v${32}%08d.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(ckptJson.contains("\"clusteredidx\":\"\""))
    // the walk stops at the nearest checkpoint: O(CheckpointInterval)
    // reads on a 41-commit never-clustered history, not O(41)
    val (keys, r) = reads(Versioned.clusteredKeysAt(spark, dir, head))
    assert(keys.isEmpty)
    assert(r <= Versioned.CheckpointInterval + 2,
      s"clusteredKeysAt opened $r log entries on a never-clustered history")
  }

  test("legacy entries without ts fall back to the linear timestamp scan") {
    val dir = tmpDir("cs_legacy")
    (1 to 3).foreach(i =>
      Versioned.append(Seq((i.toLong, s"r$i")).toDF("id", "s"), dir))
    // forge a LEGACY table: strip the ts field from every entry (the
    // pre-field log format) and give the files NON-monotonic mtimes —
    // what a file-by-file copy/restore can produce
    val mtimes = Map(1L -> 1_000_000L, 2L -> 2_000_000L, 3L -> 500_000L)
    (1L to 3L).foreach { v =>
      val p = java.nio.file.Paths.get(dir, "_graft_log", f"v$v%08d.json")
      val txt = new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8)
      val stripped = txt.replaceFirst("\"ts\":\\d+,", "")
      assert(stripped != txt, s"v$v carried no ts field to strip")
      java.nio.file.Files.write(p, stripped.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(mtimes(v)))
    }
    // latest at-or-before 1.2M: v1 (1.0M) and v3 (0.5M) qualify → the
    // MAX version, v3. A bisection trusting monotonicity probes v2
    // (2.0M > 1.2M), narrows left, and would wrongly answer v1.
    assert(Versioned.versionAsOf(spark, dir, 1_200_000L) == 3L)
    // first at-or-after 1.5M: only v2 (2.0M) qualifies
    assert(Versioned.versionSince(spark, dir, 1_500_000L) == 2L)
    // out-of-range instants still fail loudly on the legacy path
    intercept[IllegalArgumentException](
      Versioned.versionAsOf(spark, dir, 400_000L))
    intercept[IllegalArgumentException](
      Versioned.versionSince(spark, dir, 2_500_000L))
  }
}
