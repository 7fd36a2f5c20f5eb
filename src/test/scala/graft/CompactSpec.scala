package graft

import org.apache.spark.sql.functions._

import graft.streaming.Ingest
import graft.table.{Bucketed, BucketedRef, Compact, Table, TableRef}

/** Small-file compaction (Delta OPTIMIZE analog): append-swamped tables
  * collapse to target-sized files with rows, manifest, and ingest
  * idempotence all preserved.
  */
class CompactSpec extends SparkSpec {
  import spark.implicits._

  private def parquetFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        f.listFiles().toSeq
          .filterNot(c => c.getName.startsWith(".") || c.getName.startsWith("_"))
          .flatMap(walk)
      else Seq(f)
    val d = new java.io.File(dir)
    if (d.exists()) walk(d).filter(_.getName.endsWith(".parquet")) else Seq.empty
  }

  test("N appends collapse to one file-set, rows preserved, second compact is a no-op") {
    val root = tmpDir("compact")
    val ref = TableRef(s"$root/t")
    (1 to 5).foreach { i =>
      Table.append(Seq((i.toLong, s"v$i")).toDF("id", "v").repartition(2), ref)
    }
    assert(parquetFiles(ref.dir).size >= 5)
    val before = Table.read(spark, ref).orderBy("id").collect().toSeq

    val st = Compact.compact(spark, ref)
    assert(st.filesBefore >= 5 && st.filesAfter == 1 && !st.skipped)
    assert(parquetFiles(ref.dir).size == 1)
    assert(Table.read(spark, ref).orderBy("id").collect().toSeq == before)

    // already-compact table: stats report a skip and no file is rewritten
    val state = parquetFiles(ref.dir).map(f => (f.getPath, f.length(), f.lastModified()))
    val st2 = Compact.compact(spark, ref)
    assert(st2.skipped)
    assert(parquetFiles(ref.dir).map(f => (f.getPath, f.length(), f.lastModified())) == state)
  }

  test("compaction preserves the ingest manifest: replays stay no-ops") {
    val root = tmpDir("compactingest")
    val src = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val header =
      "customer_id,customer_unique_id,customer_zip_code_prefix,customer_city,customer_state"
    val schema = graft.pipeline.Entities.customers.bronzeSchema
    val bronze = TableRef(s"$root/bronze")

    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(src, "f1.csv"), s"$header\nc1,u1,01310,spc,sp")
    Ingest.csvToBronze(spark, src, schema, bronze, s"$root/cp")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(src, "f2.csv"), s"$header\nc2,u2,20000,rio,rj")
    Ingest.csvToBronze(spark, src, schema, bronze, s"$root/cp")
    assert(Table.read(spark, bronze).count() == 2)
    assert(parquetFiles(bronze.dir).size >= 2)

    val st = Compact.compact(spark, bronze)
    assert(st.filesAfter == 1)
    assert(Table.read(spark, bronze).count() == 2)
    // the seen-files manifest sidecar is untouched by the rewrite
    assert(Table.read(spark, Ingest.manifestRef(bronze)).count() == 2)

    // replay with the checkpoint intact: nothing re-enters
    Ingest.csvToBronze(spark, src, schema, bronze, s"$root/cp")
    assert(Table.read(spark, bronze).count() == 2)
    // checkpoint-wiped replay: the manifest anti-join still deduplicates
    new scala.reflect.io.Directory(new java.io.File(s"$root/cp")).deleteRecursively()
    Ingest.csvToBronze(spark, src, schema, bronze, s"$root/cp")
    assert(Table.read(spark, bronze).count() == 2)
  }

  test("bucketed tables compact per bucket; flat compact on a partitioned root refuses") {
    val root = tmpDir("compactbucketed")
    val ref = BucketedRef(s"$root/t", numBuckets = 4, keys = Seq("id"))
    val df = (0L until 64L).map(i => (i, s"p$i")).toDF("id", "payload").repartition(8)
    Bucketed.create(df, ref) // 8 writer partitions -> several files per bucket
    val before = Bucketed.read(spark, ref).orderBy("id").collect().toSeq
    assert((0 until 4).exists(b => parquetFiles(ref.bucketDir(b).dir).size > 1))

    val stats = Compact.compactBucketed(spark, ref)
    assert(stats.nonEmpty)
    (0 until 4).foreach { b =>
      assert(parquetFiles(ref.bucketDir(b).dir).size <= 1, s"bucket $b not compacted")
    }
    assert(Bucketed.read(spark, ref).orderBy("id").collect().toSeq == before)

    val e = intercept[IllegalArgumentException] {
      Compact.compact(spark, TableRef(ref.dir))
    }
    assert(e.getMessage.contains("compactBucketed"))
  }
}
