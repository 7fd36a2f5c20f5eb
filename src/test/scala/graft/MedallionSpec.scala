package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}

import graft.pipeline.{Entities, Entity, Gold, LakeRoots, Silver}
import graft.streaming.Ingest
import graft.table.{Table, TableRef}

/** End-to-end medallion pipeline verification (SURVEY.md §5.4): fixture
  * CSVs carrying the reference's dirty cases (FIXTURES.md §A — duplicate
  * PKs across files, null PKs, corrupt numerics/timestamps, out-of-range
  * scores, invalid status, messy case/whitespace) are streamed into
  * bronze (01 semantics), cleansed + upserted into silver (02), and
  * rolled into every gold dim/fact/metric (03-09). Assertions are
  * hand-computed expected values.
  */
class MedallionSpec extends SparkSpec {

  private lazy val root = tmpDir("medallion")
  private lazy val roots = LakeRoots(
    s"$root/bronze", s"$root/silver", s"$root/gold", s"$root/checkpoints")

  private lazy val fixtures: Unit = OlistFixtures.write(root)

  private def runEntity(e: Entity): Unit = {
    Ingest.csvToBronze(spark, s"$root/ingest/${e.name}", e.bronzeSchema,
      roots.bronzeRef(e.name), s"${roots.checkpoints}/${e.name}")
    val bronze = Table.read(spark, roots.bronzeRef(e.name))
    Silver.upsertInto(spark, roots.silverRef(e.name), e.cleanse(bronze), e.silverKeys)
  }

  /** Runs the whole pipeline once (lazy val = once per suite). */
  private lazy val pipeline: Unit = {
    fixtures
    Entities.all.foreach(runEntity)
  }

  private def silver(name: String): DataFrame = {
    pipeline
    Table.read(spark, roots.silverRef(name))
  }

  private def one(df: DataFrame, cond: org.apache.spark.sql.Column): Row = {
    val rows = df.filter(cond).collect()
    assert(rows.length == 1, s"expected exactly one row, got ${rows.mkString("; ")}")
    rows.head
  }

  // ---- silver layer ----------------------------------------------------

  test("silver customers: null-PK drop, cross-file LWW dedup, normalization") {
    val df = silver("customers")
    assert(df.count() == 2)
    assert(df.select("customer_id").distinct().count() == 2)
    val c1 = one(df, col("customer_id") === "c1")
    assert(c1.getAs[String]("customer_city") == "SAO PAULO CENTRO") // second file won
    assert(c1.getAs[String]("customer_state") == "SP")
  }

  test("silver geolocation: per-zip averages + mode city, corrupt row dropped") {
    val df = silver("geolocation")
    assert(df.count() == 2) // zip 30000 had null lat
    val z = one(df, col("zip_code_prefix") === "01310")
    assert(math.abs(z.getAs[Double]("latitude") - (-23.56)) < 1e-9)
    assert(math.abs(z.getAs[Double]("longitude") - (-46.64)) < 1e-9)
    assert(z.getAs[String]("city") == "SAO PAULO") // mode 2-vs-1 over osasco
    assert(z.getAs[String]("state") == "SP")
  }

  test("silver order_items: composite-PK dedup, derived total, corrupt price dropped") {
    val df = silver("order_items")
    assert(df.count() == 3)
    val i11 = one(df, col("order_id") === "o1" && col("order_item_id") === 1)
    assert(i11.getAs[Double]("price") == 120.0) // second file won
    assert(i11.getAs[Double]("item_total_value") == 132.0)
    assert(df.filter(col("order_id") === "o9").isEmpty)
  }

  test("silver order_payments: defaults, lowercasing, corrupt value dropped") {
    val df = silver("order_payments")
    assert(df.count() == 3)
    val p12 = one(df, col("order_id") === "o1" && col("payment_sequential") === 2)
    assert(p12.getAs[Int]("payment_installments") == 1) // null -> default
    val p21 = one(df, col("order_id") === "o2" && col("payment_sequential") === 1)
    assert(p21.getAs[String]("payment_type") == "credit_card")
    assert(p21.getAs[java.math.BigDecimal]("payment_value").doubleValue() == 220.0)
  }

  test("silver order_reviews: score range, timestamp parse rejection, LWW dedup") {
    val df = silver("order_reviews")
    assert(df.count() == 2) // r2 out-of-range, r3 corrupt ts
    val r1 = one(df, col("review_id") === "r1")
    assert(r1.getAs[Int]("review_score") == 4) // second file won
    assert(r1.getAs[String]("review_comment_title") == "Edited")
  }

  test("silver orders: status whitelist, lifecycle timestamps, corrupt purchase dropped") {
    val df = silver("orders")
    assert(df.count() == 2)
    assert(df.filter(col("order_id").isin("o3", "o4")).isEmpty)
    val o2 = one(df, col("order_id") === "o2")
    assert(o2.isNullAt(o2.fieldIndex("order_delivered_customer_date")))
  }

  test("silver products: seven safe casts, lowercase category") {
    val df = silver("products")
    assert(df.count() == 2)
    val p2 = one(df, col("product_id") === "p2")
    assert(p2.getAs[String]("product_category_name") == "moveis")
    assert(p2.isNullAt(p2.fieldIndex("product_weight_g"))) // corrupt -> NULL kept
    assert(p2.getAs[Int]("product_name_lenght") == 5)
  }

  test("silver sellers: initcap city, upper state") {
    val df = silver("sellers")
    assert(df.count() == 2)
    val s1 = one(df, col("seller_id") === "s1")
    assert(s1.getAs[String]("seller_city") == "Sao Paulo")
    assert(s1.getAs[String]("seller_state") == "SP")
    assert(s1.getAs[Int]("seller_zip_code_prefix") == 1310)
  }

  test("silver upsert is idempotent: re-running an entity changes nothing") {
    pipeline
    val before = silver("order_items").orderBy("order_id", "order_item_id")
      .drop("silver_processed_ts", "ingestion_ts").collect().toSeq
    runEntity(Entities.orderItems) // replays the same bronze batch
    val after = silver("order_items").orderBy("order_id", "order_item_id")
      .drop("silver_processed_ts", "ingestion_ts").collect().toSeq
    assert(before == after)
  }

  // ---- gold layer ------------------------------------------------------

  test("gold dims: counts, key uniqueness, deterministic surrogates") {
    val dimC = Gold.dimCustomers(silver("customers"))
    assert(dimC.count() == 2)
    val c1 = one(dimC, col("customer_id") === "c1")
    assert(c1.getAs[Int]("customer_zip_code_prefix") == 1310)
    assert(c1.getAs[String]("customer_city") == "sao paulo centro")

    val dimP = Gold.dimProducts(silver("products"))
    assert(dimP.count() == 2)
    val p1 = one(dimP, col("product_id") === "p1")
    assert(p1.getAs[Int]("product_volume_cm3") == 1000)
    val sks = dimP.select("product_sk").collect().map(_.getLong(0))
    assert(sks.distinct.length == 2)
    // surrogate keys are a pure function of the natural key
    val sksAgain = Gold.dimProducts(silver("products"))
      .select("product_sk").collect().map(_.getLong(0))
    assert(sks.sorted.sameElements(sksAgain.sorted))

    assert(Gold.dimSellers(silver("sellers")).count() == 2)
    val dimG = Gold.dimGeolocation(silver("geolocation"))
    assert(dimG.count() == 2)
    assert(dimG.select("geolocation_sk").distinct().count() == 2)
  }

  test("gold fact_orders: item aggregates and lifecycle day math") {
    val f = Gold.factOrders(silver("orders"), silver("customers"), silver("order_items"))
    assert(f.count() == 2)
    val o1 = one(f, col("order_id") === "o1")
    assert(o1.getAs[Long]("item_count") == 2)
    assert(o1.getAs[Double]("order_value") == 170.0) // 120 + 50
    assert(o1.getAs[Double]("order_freight") == 17.0) // 12 + 5
    assert(o1.getAs[Int]("days_to_approve") == 0)
    assert(o1.getAs[Int]("days_to_deliver") == 3)
    assert(o1.getAs[Int]("delivery_delay_days") == -6)
    val o2 = one(f, col("order_id") === "o2")
    assert(o2.getAs[Long]("item_count") == 1)
    assert(o2.isNullAt(o2.fieldIndex("days_to_deliver")))
  }

  test("gold fact_payments: per-order rollup joined to orders") {
    val f = Gold.factPayments(silver("order_payments"), silver("orders"))
    assert(f.count() == 2)
    val o1 = one(f, col("order_id") === "o1")
    assert(o1.getAs[Long]("payment_count") == 2)
    assert(o1.getAs[Double]("payment_total") == 170.0)
    assert(o1.getAs[Int]("max_installments") == 3)
    val o2 = one(f, col("order_id") === "o2")
    assert(o2.getAs[Long]("payment_count") == 1)
    assert(o2.getAs[Double]("payment_total") == 220.0)
    assert(o2.getAs[String]("order_status") == "shipped")
  }

  test("gold fact_reviews: cleansed reviews joined to order status") {
    val f = Gold.factReviews(silver("order_reviews"), silver("orders"))
    assert(f.count() == 2)
    assert(one(f, col("review_id") === "r1").getAs[String]("order_status") == "delivered")
    assert(one(f, col("review_id") === "r4").getAs[String]("order_status") == "shipped")
  }

  test("gold metrics_revenue: paid orders only, daily state/status rollup") {
    val m = Gold.metricsRevenue(
      Gold.factOrders(silver("orders"), silver("customers"), silver("order_items")),
      Gold.factPayments(silver("order_payments"), silver("orders")),
      Gold.dimCustomers(silver("customers")))
    assert(m.count() == 2)
    val sp = one(m, col("customer_state") === "SP")
    assert(sp.getAs[java.sql.Date]("order_date") == java.sql.Date.valueOf("2017-01-01"))
    assert(sp.getAs[String]("order_status") == "delivered")
    assert(sp.getAs[Double]("total_revenue") == 170.0)
    assert(sp.getAs[Long]("order_count") == 1)
    assert(sp.getAs[Long]("payment_count") == 2)
    val rj = one(m, col("customer_state") === "RJ")
    assert(rj.getAs[Double]("total_revenue") == 220.0)
  }

  test("gold metrics_orders: conditional status counts + avg delivery days") {
    val m = Gold.metricsOrders(
      Gold.factOrders(silver("orders"), silver("customers"), silver("order_items")),
      Gold.dimCustomers(silver("customers")))
    assert(m.count() == 2)
    val sp = one(m, col("customer_state") === "SP")
    assert(sp.getAs[Long]("total_orders") == 1)
    assert(sp.getAs[Long]("delivered_orders") == 1)
    assert(sp.getAs[Long]("shipped_orders") == 0)
    assert(sp.getAs[Double]("avg_delivery_days") == 3.0)
    val rj = one(m, col("customer_state") === "RJ")
    assert(rj.getAs[Long]("shipped_orders") == 1)
    assert(rj.isNullAt(rj.fieldIndex("avg_delivery_days"))) // no delivered date
  }

  test("gold metrics_customers: conditional distinct counts per state") {
    val m = Gold.metricsCustomers(
      Gold.dimCustomers(silver("customers")),
      Gold.factOrders(silver("orders"), silver("customers"), silver("order_items")))
    assert(m.count() == 2)
    val sp = one(m, col("customer_state") === "SP")
    assert(sp.getAs[Long]("total_customers") == 1)
    assert(sp.getAs[Long]("total_orders") == 1)
    assert(sp.getAs[Long]("delivered_orders") == 1)
    assert(sp.getAs[Long]("active_customers") == 1)
    val rj = one(m, col("customer_state") === "RJ")
    assert(rj.getAs[Long]("delivered_orders") == 0)
    assert(rj.getAs[Long]("active_customers") == 1)
  }
}
