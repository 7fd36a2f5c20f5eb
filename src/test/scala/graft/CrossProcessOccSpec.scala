package graft

import scala.jdk.CollectionConverters._

import graft.table.Versioned

/** The cross-process OCC proof. Every other concurrency spec races
  * THREADS in one JVM — one filesystem view, one file-lock table. The
  * hard-link CAS's actual claim is mutual exclusion between PROCESSES
  * with no coordination but the filesystem, so this spec forks real
  * JVMs ([[graft.tools.OccRaceWorker]]) racing appends and merges on
  * one table directory and asserts exactly-once commits: contiguous
  * versions (no version double-published, none lost) and every
  * worker's every row present exactly once.
  */
class CrossProcessOccSpec extends SparkSpec {
  import spark.implicits._

  // must match build.sbt's jdk17AddOpens — forked plain `java` gets no
  // spark-submit module injection
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("forked JVMs racing appends and merges commit exactly once each") {
    val dir = tmpDir("xproc_occ")
    // seed commit: merge mode needs a schema-bearing table to exist
    Versioned.append(Seq((-1L, -1L)).toDF("worker", "seq"), dir)

    val cp = System.getProperty("java.class.path")
    val logDir = java.nio.file.Files.createTempDirectory("xproc_logs")
    def fork(id: Int, n: Int, mode: String): (Process, java.io.File) = {
      val out = logDir.resolve(s"worker$id.log").toFile
      val cmd = (Seq("java") ++ addOpens ++ Seq(
        "-Xmx1500m", "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC",
        "-cp", cp, "graft.tools.OccRaceWorker",
        dir, id.toString, n.toString, mode)).asJava
      val p = new ProcessBuilder(cmd)
        .redirectOutput(out).redirectErrorStream(true).start()
      (p, out)
    }

    // 100 racing commits across three processes: two blind appenders
    // (the pure CAS path) and one merger (the re-plan loop — its
    // touched-file discovery must survive heads moving underneath it)
    val workers = Seq(fork(1, 35, "append"), fork(2, 35, "append"),
      fork(3, 30, "merge"))
    workers.foreach { case (p, out) =>
      assert(p.waitFor(10, java.util.concurrent.TimeUnit.MINUTES),
        s"worker timed out; log tail:\n${tail(out)}")
      assert(p.exitValue() == 0,
        s"worker failed (exit ${p.exitValue()}); log tail:\n${tail(out)}")
    }

    // exactly-once, no lost versions: seed + 100 commits, contiguous
    assert(Versioned.versions(spark, dir) == (1L to 101L),
      s"got ${Versioned.versions(spark, dir)}")
    // every row exactly once — a doubled commit would duplicate rows, a
    // lost one would drop them
    val rows = Versioned.read(spark, dir)
      .groupBy("worker").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(-1L -> 1L, 1L -> 35L, 2L -> 35L, 3L -> 30L), s"got $rows")
    assert(Versioned.read(spark, dir).distinct().count() == 101L)
  }

  private def tail(f: java.io.File): String = {
    val lines = java.nio.file.Files.readAllLines(f.toPath).asScala
    lines.takeRight(25).mkString("\n")
  }
}
