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

    // retention: vacuum truncates 196 versions; the head still resolves
    // in O(CheckpointInterval) from the published anchor
    Versioned.vacuum(spark, dir, keepVersions = 5)
    assert(Versioned.versions(spark, dir).size == 5)
    val (files2, rFiles2) = reads(Versioned.filesAt(spark, dir, head))
    assert(files2.size == n + 1)
    assert(rFiles2 <= Versioned.CheckpointInterval + 4,
      s"post-vacuum filesAt opened $rFiles2 log entries")
    assert(Versioned.read(spark, dir).count() == (n + 1).toLong)
  }
}
