package graft

import java.nio.file.{Files, Paths}
import scala.reflect.io.Directory

import org.apache.spark.sql.functions._

import graft.pipeline.{Entities, LakeRoots}
import graft.streaming.Ingest
import graft.table.{Table, TableRef}

/** Streaming ingestion semantics (S1-S12 + M1): AvailableNow drain,
  * incremental file pickup, checkpoint-wipe replay idempotence via the
  * seen-files manifest, dynamic table discovery, and incremental
  * bronze→silver refresh.
  */
class IngestSpec extends SparkSpec {

  private val customersHeader =
    "customer_id,customer_unique_id,customer_zip_code_prefix,customer_city,customer_state"

  private def writeFile(dir: String, name: String, header: String, rows: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(dir, name), (header +: rows).mkString("\n"))
  }

  private def rmRecursive(dir: String): Unit =
    new Directory(new java.io.File(dir)).deleteRecursively()

  test("csvToBronze drains available files and stamps ingest metadata") {
    val root = tmpDir("ingest1")
    val src = s"$root/src"
    val bronze = TableRef(s"$root/bronze")
    writeFile(src, "f1.csv", customersHeader, Seq("c1,u1,01310,sp city,sp", "c2,u2,20000,rio,rj"))

    Ingest.csvToBronze(spark, src, Entities.customers.bronzeSchema, bronze, s"$root/cp")
    val b = Table.read(spark, bronze)
    assert(b.count() == 2)
    assert(b.columns.contains("ingestion_ts") && b.columns.contains("source_file"))
    assert(b.filter(col("source_file").contains("f1.csv")).count() == 2)
    // manifest sidecar records exactly the ingested file
    val m = Table.read(spark, Ingest.manifestRef(bronze))
    assert(m.collect().map(_.getString(0)).toSeq.forall(_.contains("f1.csv")))
    assert(m.count() == 1)
  }

  test("a second run picks up only newly arrived files") {
    val root = tmpDir("ingest2")
    val src = s"$root/src"
    val bronze = TableRef(s"$root/bronze")
    writeFile(src, "f1.csv", customersHeader, Seq("c1,u1,01310,spc,sp"))
    Ingest.csvToBronze(spark, src, Entities.customers.bronzeSchema, bronze, s"$root/cp")
    assert(Table.read(spark, bronze).count() == 1)

    writeFile(src, "f2.csv", customersHeader, Seq("c2,u2,20000,rio,rj", "c3,u3,30000,bh,mg"))
    Ingest.csvToBronze(spark, src, Entities.customers.bronzeSchema, bronze, s"$root/cp")
    val b = Table.read(spark, bronze)
    assert(b.count() == 3)
    assert(Table.read(spark, Ingest.manifestRef(bronze)).count() == 2)
  }

  test("checkpoint-wipe replay is idempotent (M1 manifest anti-join)") {
    val root = tmpDir("ingest3")
    val src = s"$root/src"
    val bronze = TableRef(s"$root/bronze")
    writeFile(src, "f1.csv", customersHeader, Seq("c1,u1,01310,spc,sp", "c2,u2,20000,rio,rj"))
    Ingest.csvToBronze(spark, src, Entities.customers.bronzeSchema, bronze, s"$root/cp")
    assert(Table.read(spark, bronze).count() == 2)

    // wipe the checkpoint: the stream re-delivers f1.csv, the manifest
    // merge must reject it (01:58-68 replay guarantee)
    rmRecursive(s"$root/cp")
    Ingest.csvToBronze(spark, src, Entities.customers.bronzeSchema, bronze, s"$root/cp")
    assert(Table.read(spark, bronze).count() == 2)
    assert(Table.read(spark, Ingest.manifestRef(bronze)).count() == 1)
  }

  test("S2 discovery enumerates table subdirs; ingestAll loops known entities") {
    val root = tmpDir("ingest4")
    val ingestRoot = s"$root/ingest"
    writeFile(s"$ingestRoot/customers", "f1.csv", customersHeader, Seq("c1,u1,01310,spc,sp"))
    writeFile(s"$ingestRoot/sellers", "f1.csv",
      "seller_id,seller_zip_code_prefix,seller_city,seller_state",
      Seq("s1,01310,sao paulo,sp"))
    writeFile(s"$ingestRoot/not_a_table", "junk.csv", "a,b", Seq("1,2"))

    assert(Ingest.discoverTables(spark, ingestRoot) == Seq("customers", "not_a_table", "sellers"))

    val roots = LakeRoots(s"$root/bronze", s"$root/silver", s"$root/gold", s"$root/cp")
    val ingested = Ingest.ingestAll(spark, ingestRoot, roots)
    assert(ingested == Seq("customers", "sellers")) // unknown dirs skipped
    assert(Table.read(spark, roots.bronzeRef("customers")).count() == 1)
    assert(Table.read(spark, roots.bronzeRef("sellers")).count() == 1)
  }

  test("schema evolution: new CSV columns widen bronze; old rows read as NULL") {
    val root = tmpDir("ingest6")
    val src = s"$root/src"
    val bronze = TableRef(s"$root/bronze")
    val schemaLoc = s"$root/schema_track"
    val base = Entities.customers.bronzeSchema

    writeFile(src, "f1.csv", customersHeader, Seq("c1,u1,01310,spc,sp"))
    val s1 = Ingest.csvToBronzeEvolving(spark, src, base, bronze, s"$root/cp", schemaLoc)
    assert(s1.fieldNames.toSeq == base.fieldNames.toSeq) // nothing new yet

    // a producer starts appending a loyalty_tier column
    writeFile(src, "f2.csv", customersHeader + ",loyalty_tier",
      Seq("c2,u2,20000,rio,rj,gold"))
    val s2 = Ingest.csvToBronzeEvolving(spark, src, base, bronze, s"$root/cp", schemaLoc)
    assert(s2.fieldNames.contains("loyalty_tier"))

    val b = Table.readMerged(spark, bronze)
    assert(b.count() == 2)
    assert(b.filter(col("customer_id") === "c2").head
      .getAs[String]("loyalty_tier") == "gold")
    assert(b.filter(col("customer_id") === "c1").head
      .isNullAt(b.columns.indexOf("loyalty_tier"))) // pre-evolution file

    // the discovery persists even after the source file expires
    rmRecursive(s"$src")
    val s3 = Ingest.evolveSchema(spark, src, base, schemaLoc)
    assert(s3.fieldNames.contains("loyalty_tier"))
  }

  test("bronzeToSilver refreshes incrementally with LWW upsert") {
    val root = tmpDir("ingest5")
    val src = s"$root/src"
    val bronze = TableRef(s"$root/bronze")
    val silver = TableRef(s"$root/silver")
    val e = Entities.customers

    writeFile(src, "f1.csv", customersHeader, Seq("c1,u1,01310,old city,sp"))
    Ingest.csvToBronze(spark, src, e.bronzeSchema, bronze, s"$root/cp_b")
    Ingest.bronzeToSilver(spark, bronze, e.bronzeStoredSchema, silver,
      s"$root/cp_s", e.silverKeys, e.cleanse)
    val first = Table.read(spark, silver)
    assert(first.count() == 1)
    assert(first.head.getAs[String]("customer_city") == "OLD CITY")

    // a later file updates the same key; the second ingest batch carries
    // a strictly newer ingestion_ts, so LWW must take the new version
    writeFile(src, "f2.csv", customersHeader,
      Seq("c1,u1,01310,new city,sp", "c9,u9,90000,porto,rs"))
    Ingest.csvToBronze(spark, src, e.bronzeSchema, bronze, s"$root/cp_b")
    Ingest.bronzeToSilver(spark, bronze, e.bronzeStoredSchema, silver,
      s"$root/cp_s", e.silverKeys, e.cleanse)
    val second = Table.read(spark, silver)
    assert(second.count() == 2)
    assert(second.filter(col("customer_id") === "c1").head
      .getAs[String]("customer_city") == "NEW CITY")
  }
}
