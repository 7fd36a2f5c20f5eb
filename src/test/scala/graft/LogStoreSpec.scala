package graft

import org.apache.spark.sql.functions._

import graft.table.{ConditionalPutLogStore, HadoopFsLogStore, LogStore, Versioned}

/** The LogStore contract matrix, run against BOTH implementations:
  * the Hadoop-filesystem store (hard-link CAS / no-overwrite rename)
  * and the object-store-shaped [[ConditionalPutLogStore]] whose ONLY
  * mutual-exclusion primitive is a conditional PUT. Every scenario
  * passing under both proves the commit machinery depends on nothing
  * but [[LogStore.publishOnce]]'s contract — no hidden reliance on
  * filesystem-specific namespace atomicity (the exact property a real
  * S3 `If-None-Match` implementation would need to plug in safely).
  */
class LogStoreSpec extends SparkSpec {
  import spark.implicits._

  private def fsFor(dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val stores: Seq[(String, () => LogStore)] = Seq(
    "hadoop-fs" -> (() => HadoopFsLogStore),
    "conditional-put" -> (() => new ConditionalPutLogStore))

  for ((storeName, mkStore) <- stores) {

    test(s"[$storeName] N latched racers on one destination: exactly one publishes") {
      val store = mkStore()
      val dir = tmpDir(s"ls_race_$storeName")
      val fs = fsFor(dir)
      val log = new org.apache.hadoop.fs.Path(dir, "_graft_log")
      fs.mkdirs(log)
      val n = 8
      val tmps = (1 to n).map { i =>
        val t = new org.apache.hadoop.fs.Path(log, s".v1-$i.tmp")
        val o = fs.create(t, true)
        try o.write(s"""{"writer":$i}""".getBytes("UTF-8")) finally o.close()
        t
      }
      val dest = new org.apache.hadoop.fs.Path(log, "v00000001.json")
      val gate = new java.util.concurrent.CountDownLatch(1)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
      try {
        val futures = tmps.map { t =>
          pool.submit(new java.util.concurrent.Callable[Boolean] {
            def call(): Boolean = {
              gate.await()
              try { store.publishOnce(fs, t, dest); true }
              catch { case _: Versioned.CommitRace => false }
            }
          })
        }
        gate.countDown()
        val wins = futures.map(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
        assert(wins.count(identity) == 1, s"winners: ${wins.count(identity)}")
      } finally pool.shutdown()
      // the destination holds exactly one racer's full content and
      // every temp is gone (winners rename theirs, losers delete)
      val content = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "_graft_log", "v00000001.json")), "UTF-8")
      assert(content.matches("""\{"writer":\d\}"""), s"torn content: $content")
      assert(!fs.listStatus(log).exists(_.getPath.getName.endsWith(".tmp")),
        "racer temps must be cleaned on both win and loss")
    }

    test(s"[$storeName] a pre-existing destination refuses the publish") {
      val store = mkStore()
      val dir = tmpDir(s"ls_exist_$storeName")
      val fs = fsFor(dir)
      val log = new org.apache.hadoop.fs.Path(dir, "_graft_log")
      fs.mkdirs(log)
      val dest = new org.apache.hadoop.fs.Path(log, "v00000001.json")
      val o = fs.create(dest, true)
      try o.write("winner".getBytes("UTF-8")) finally o.close()
      val t = new org.apache.hadoop.fs.Path(log, ".v1-x.tmp")
      val o2 = fs.create(t, true)
      try o2.write("loser".getBytes("UTF-8")) finally o2.close()
      intercept[Versioned.CommitRace] { store.publishOnce(fs, t, dest) }
      assert(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "_graft_log", "v00000001.json")), "UTF-8")
        == "winner", "the existing object must survive untouched")
      assert(!fs.exists(t))
    }

    test(s"[$storeName] concurrent appenders all commit; no version or row lost") {
      Versioned.withLogStore(mkStore()) {
        val dir = tmpDir(s"ls_append_$storeName")
        Versioned.append(Seq((0L, "seed")).toDF("id", "s"), dir)
        val n = 6
        val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
        try {
          val futures = (1 to n).map { i =>
            pool.submit(new java.util.concurrent.Callable[Long] {
              def call(): Long =
                Versioned.append(Seq((i.toLong, s"w$i")).toDF("id", "s"), dir)
            })
          }
          val versions = futures.map(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
          assert(versions.toSet.size == n, s"collided versions: $versions")
        } finally pool.shutdown()
        assert(Versioned.currentVersion(spark, dir).contains(1L + n))
        assert(Versioned.read(spark, dir).count() == 1L + n,
          "a lost commit race dropped an appender's rows")
      }
    }

    test(s"[$storeName] concurrent replays of one (appId, txnVersion) commit at most once") {
      Versioned.withLogStore(mkStore()) {
        val dir = tmpDir(s"ls_txn_$storeName")
        Versioned.append(Seq((0L, "seed")).toDF("id", "s"), dir)
        val n = 5
        val gate = new java.util.concurrent.CountDownLatch(1)
        val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
        try {
          val futures = (1 to n).map { i =>
            pool.submit(new java.util.concurrent.Callable[Option[Long]] {
              def call(): Option[Long] = {
                gate.await()
                Versioned.appendIdempotent(
                  Seq((42L, s"replay$i")).toDF("id", "s"), dir, "app", 7L)
              }
            })
          }
          gate.countDown()
          val committed = futures.map(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
          assert(committed.count(_.nonEmpty) == 1,
            s"replayed txn committed ${committed.count(_.nonEmpty)} times")
        } finally pool.shutdown()
        assert(Versioned.read(spark, dir).filter(col("id") === 42L).count() == 1)
        assert(Versioned.lastTxnVersion(spark, dir, "app").contains(7L))
      }
    }

    test(s"[$storeName] disjoint-file rewrites commute; overlapping ones fail loudly") {
      Versioned.withLogStore(mkStore()) {
        val dir = tmpDir(s"ls_commute_$storeName")
        Versioned.append((1L to 10L).map(i => (i, "a")).toDF("id", "s"), dir)
        Versioned.append((11L to 20L).map(i => (i, "b")).toDF("id", "s"), dir)
        val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
        try {
          val fa = pool.submit(new java.util.concurrent.Callable[Option[Long]] {
            def call() = Versioned.deleteWhere(spark, dir, col("id") === 1L)
          })
          val fb = pool.submit(new java.util.concurrent.Callable[Option[Long]] {
            def call() = Versioned.deleteWhere(spark, dir, col("id") === 11L)
          })
          assert(fa.get(300, java.util.concurrent.TimeUnit.SECONDS).nonEmpty)
          assert(fb.get(300, java.util.concurrent.TimeUnit.SECONDS).nonEmpty)
        } finally pool.shutdown()
        assert(Versioned.read(spark, dir).select("id").as[Long].collect().sorted.toSeq
          == ((2L to 10L) ++ (12L to 20L)),
          "both disjoint-file deletes must apply under the re-base rule")
      }
    }
  }

  test("conditional-put releases its claim on rename failure and on exists-loss") {
    // regression: a claimed cell whose publish never landed used to stay
    // claimed forever, poisoning the version for every retry in this
    // JVM — contradicting the CommitRace message's retry guidance
    val store = new ConditionalPutLogStore
    val dir = tmpDir("ls_release")
    val fs = fsFor(dir)
    val log = new org.apache.hadoop.fs.Path(dir, "_graft_log")
    fs.mkdirs(log)
    val dest = new org.apache.hadoop.fs.Path(log, "v00000001.json")
    def tmpWith(body: String) = {
      val t = new org.apache.hadoop.fs.Path(
        log, s".v1-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      val o = fs.create(t, true)
      try o.write(body.getBytes("UTF-8")) finally o.close()
      t
    }
    // rename failure: the tmp vanishes before publish (simulating the
    // store's PUT failing after the claim) — the claim must come back
    val ghost = tmpWith("{}")
    fs.delete(ghost, false)
    intercept[IllegalStateException](store.publishOnce(fs, ghost, dest))
    store.publishOnce(fs, tmpWith("""{"writer":1}"""), dest)
    assert(fs.exists(dest), "retry after rename failure must be able to publish")
    // exists-loss: dest pre-exists on disk (outside this instance) → the
    // claim must release so a writer after a manual repair can claim it
    val dest2 = new org.apache.hadoop.fs.Path(log, "v00000002.json")
    val o2 = fs.create(dest2, true); o2.write("{}".getBytes("UTF-8")); o2.close()
    intercept[Versioned.CommitRace](
      store.publishOnce(fs, tmpWith("{}"), dest2))
    fs.delete(dest2, false) // the manual repair
    store.publishOnce(fs, tmpWith("""{"writer":2}"""), dest2)
    assert(fs.exists(dest2), "claim must release after losing to fs.exists")
  }
}
