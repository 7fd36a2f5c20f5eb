package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.ops.{Cleanse, Dedup, Upsert}
import graft.table.{Table, TableRef}

/** The reference's medallion lakehouse re-expressed Spark-first: pure
  * `DataFrame => DataFrame` cleanse/build functions (unit-testable, no
  * IO) plus thin table-layer writers. Bronze ingestion is in
  * graft.streaming.Ingest; this file is silver (02_bronze_to_silver.py)
  * and gold (03..09 notebooks).
  *
  * Layout: one parquet table dir per entity under the layer root.
  */
final case class LakeRoots(
    bronze: String, silver: String, gold: String, checkpoints: String,
    // Hash-bucket count for silver tables (graft.table.Bucketed): an
    // incremental refresh rewrites only the buckets its batch touches,
    // the analog of the Delta MERGE file pruning the reference relies
    // on (02:67-87). Size so one bucket ≈ a few GB at the deployed
    // scale; the default suits test fixtures.
    silverBuckets: Int = 8) {
  def bronzeRef(t: String): TableRef = TableRef(s"$bronze/$t")
  def silverRef(t: String): TableRef = TableRef(s"$silver/$t")
  /** Log-backed (time-traveling) silver table root — the optional
    * versioned-silver mode of `Lake.refreshSilverVersioned`.
    */
  def versionedSilverDir(t: String): String = s"$silver/${t}_v"
  /** Log-backed bronze table root — `Lake.buildAllVersioned`'s ACID
    * ingestion tier.
    */
  def versionedBronzeDir(t: String): String = s"$bronze/${t}_v"
  /** Log-backed gold table root — `Lake.refreshGoldVersioned`. */
  def versionedGoldDir(t: String): String = s"$gold/${t}_v"
  def goldRef(t: String): TableRef = TableRef(s"$gold/$t")
  def silverBucketedRef(e: Entity): graft.table.BucketedRef =
    graft.table.BucketedRef(s"$silver/${e.name}", silverBuckets, e.silverKeys)
}

/** Silver cleansing — one function per entity, mirroring
  * `02_bronze_to_silver.py` semantics (citations inline). Every builder:
  * null-PK drop → type coercion (try_cast: corrupt → NULL → dropped
  * where the reference does) → normalization → W1 latest-wins dedup.
  */
object Silver {

  private def stamp(df: DataFrame): Column = current_timestamp()

  /** 02:28-52 — customers: PK null-drop, upper(trim) city/state. */
  def cleanseCustomers(df: DataFrame): DataFrame =
    Cleanse.dropNullKeys(df, Seq("customer_id", "customer_unique_id"))
      .withColumn("customer_city", Cleanse.normUpper(col("customer_city")))
      .withColumn("customer_state", Cleanse.normUpper(col("customer_state")))
      .withColumn("customer_zip_code_prefix", col("customer_zip_code_prefix").cast(StringType))
      .transform(Dedup.latestByKey(_, Seq("customer_id"),
        Seq(col("ingestion_ts").desc, col("source_file").desc)))
      .withColumn("silver_processed_ts", current_timestamp())

  /** 02:131-185 — geolocation: per-zip average coordinates + most-frequent
    * city/state (A9 mode), one row per zip prefix.
    *
    * Numeric coercions here and below use try_cast (Cleanse.safeCast):
    * the reference's plain `.cast` ran under an ANSI-off runtime where
    * corrupt values became NULL; Spark 4 defaults to ANSI-on, where
    * `.cast` would abort the job instead — try_cast is the faithful
    * translation of the reference's observed corrupt→NULL behavior.
    */
  def cleanseGeolocation(df: DataFrame): DataFrame = {
    val renamed = df.select(
      col("geolocation_zip_code_prefix").cast(StringType).as("zip_code_prefix"),
      Cleanse.safeCast(col("geolocation_lat"), DoubleType).as("latitude"),
      Cleanse.safeCast(col("geolocation_lng"), DoubleType).as("longitude"),
      Cleanse.normUpper(col("geolocation_city")).as("city"),
      Cleanse.normUpper(col("geolocation_state")).as("state"),
      col("ingestion_ts"))
      .filter(col("zip_code_prefix").isNotNull &&
        col("latitude").isNotNull && col("longitude").isNotNull)
    // ONE full-data exchange: count + coordinate sums per (zip, city,
    // state) triple, map-side combinable. Everything after runs over the
    // distinct-triple set (≪ input at geolocation's duplication factor);
    // the previous form paid two more full-data count-shuffles plus two
    // window sorts for the city/state modes.
    val triple = renamed.groupBy("zip_code_prefix", "city", "state").agg(
      count(lit(1)).as("n"),
      sum("latitude").as("sum_lat"),
      sum("longitude").as("sum_lng"),
      max("ingestion_ts").as("max_ts"))
    val agg = triple.groupBy("zip_code_prefix").agg(
      (sum("sum_lat") / sum("n")).as("latitude"),
      (sum("sum_lng") / sum("n")).as("longitude"),
      max("max_ts").as("ingestion_ts"))
    // Exact MARGINAL mode per column (a city's votes summed across its
    // state variants — argmax over the per-triple n alone would be the
    // joint mode, a different statistic). Tie-break mirrors
    // Dedup.modePerGroup: highest count, then ascending value, via
    // min_by over (-n, value).
    def marginalMode(vc: String): DataFrame =
      triple.groupBy(col("zip_code_prefix"), col(vc))
        .agg(sum("n").as("n"))
        .groupBy("zip_code_prefix")
        .agg(min_by(col(vc), struct((-col("n")).as("negn"), col(vc))).as(vc))
    agg.join(marginalMode("city"), Seq("zip_code_prefix"), "left")
      .join(marginalMode("state"), Seq("zip_code_prefix"), "left")
      .withColumn("silver_processed_ts", current_timestamp())
  }

  /** 02:262-315 — order_items: composite PK, casts, timestamp parse,
    * item_total_value = price + freight (F15).
    */
  def cleanseOrderItems(df: DataFrame): DataFrame =
    Cleanse.dropNullKeys(df, Seq("order_id", "order_item_id", "product_id"))
      .withColumn("order_item_id", Cleanse.safeCast(col("order_item_id"), IntegerType))
      .withColumn("shipping_limit_date", Cleanse.safeTimestamp(col("shipping_limit_date")))
      .withColumn("price", Cleanse.safeCast(col("price"), DoubleType))
      .withColumn("freight_value", Cleanse.safeCast(col("freight_value"), DoubleType))
      .filter(col("order_item_id").isNotNull &&
        col("price").isNotNull && col("freight_value").isNotNull)
      .withColumn("item_total_value", col("price") + col("freight_value"))
      .transform(Dedup.latestByKey(_, Seq("order_id", "order_item_id"),
        Seq(col("ingestion_ts").desc, col("source_file").desc)))
      .withColumn("silver_processed_ts", current_timestamp())

  /** 02:403-442 — order_payments: try_cast decimal/ints (F6), lowercase
    * type, installments default 1 (F14), corrupt-value drop (P10).
    */
  def cleanseOrderPayments(df: DataFrame): DataFrame =
    Cleanse.dropNullKeys(df, Seq("order_id", "payment_sequential"))
      .withColumn("payment_sequential", Cleanse.safeCast(col("payment_sequential"), IntegerType))
      .withColumn("payment_value", Cleanse.safeCast(col("payment_value"), DecimalType(10, 2)))
      .withColumn("payment_installments",
        Cleanse.withDefault(Cleanse.safeCast(col("payment_installments"), IntegerType), lit(1)))
      .withColumn("payment_type", Cleanse.normLower(col("payment_type")))
      .filter(col("payment_sequential").isNotNull && col("payment_value").isNotNull)
      .transform(Dedup.latestByKey(_, Seq("order_id", "payment_sequential"),
        Seq(col("ingestion_ts").desc, col("source_file").desc)))
      .withColumn("silver_processed_ts", current_timestamp())

  /** 02:505-538 — order_reviews: score ∈ [1,5] (P8), trimmed comments,
    * try_to_timestamp with corrupt-row rejection (F8/P10).
    */
  def cleanseOrderReviews(df: DataFrame): DataFrame =
    Cleanse.dropNullKeys(df, Seq("review_id", "order_id"))
      .withColumn("review_score", Cleanse.safeCast(col("review_score"), IntegerType))
      .filter(col("review_score").between(1, 5))
      .withColumn("review_comment_title", trim(col("review_comment_title")))
      .withColumn("review_comment_message", trim(col("review_comment_message")))
      .withColumn("review_creation_date",
        Cleanse.safeTimestamp(col("review_creation_date"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("review_answer_timestamp",
        Cleanse.safeTimestamp(col("review_answer_timestamp"), "yyyy-MM-dd HH:mm:ss"))
      .filter(col("review_creation_date").isNotNull)
      .transform(Dedup.latestByKey(_, Seq("review_id"),
        Seq(col("ingestion_ts").desc, col("source_file").desc)))
      .withColumn("silver_processed_ts", current_timestamp())

  val ValidOrderStatus: Seq[String] = Seq(
    "created", "approved", "invoiced", "processing",
    "shipped", "delivered", "canceled", "unavailable")

  /** 02:565-627 — orders: status whitelist (P7), five lifecycle
    * timestamps via try_to_timestamp (F8).
    */
  def cleanseOrders(df: DataFrame): DataFrame = {
    val tsCols = Seq(
      "order_purchase_timestamp", "order_approved_at",
      "order_delivered_carrier_date", "order_delivered_customer_date",
      "order_estimated_delivery_date")
    tsCols.foldLeft(
        Cleanse.dropNullKeys(df, Seq("order_id", "customer_id"))
          .withColumn("order_status", Cleanse.normLower(col("order_status")))
          .filter(col("order_status").isin(ValidOrderStatus: _*)))(
        (d, c) => d.withColumn(c, Cleanse.safeTimestamp(col(c), "yyyy-MM-dd HH:mm:ss")))
      .filter(col("order_purchase_timestamp").isNotNull)
      .transform(Dedup.latestByKey(_, Seq("order_id"),
        Seq(col("ingestion_ts").desc, col("source_file").desc)))
      .withColumn("silver_processed_ts", current_timestamp())
  }

  /** 02:686-724 — products: seven try_cast ints, lowercase category. */
  def cleanseProducts(df: DataFrame): DataFrame = {
    val intCols = Seq(
      "product_name_lenght", "product_description_lenght", "product_photos_qty",
      "product_weight_g", "product_length_cm", "product_height_cm", "product_width_cm")
    intCols.foldLeft(
        Cleanse.dropNullKeys(df, Seq("product_id"))
          .withColumn("product_category_name", Cleanse.normLower(col("product_category_name"))))(
        (d, c) => d.withColumn(c, Cleanse.safeCast(col(c), IntegerType)))
      .transform(Dedup.latestByKey(_, Seq("product_id"),
        Seq(col("ingestion_ts").desc, col("source_file").desc)))
      .withColumn("silver_processed_ts", current_timestamp())
  }

  /** 02:779-820 — sellers: zip int, initcap city (F3), upper state. */
  def cleanseSellers(df: DataFrame): DataFrame =
    Cleanse.dropNullKeys(df, Seq("seller_id"))
      .withColumn("seller_zip_code_prefix", Cleanse.safeCast(col("seller_zip_code_prefix"), IntegerType))
      .withColumn("seller_city", Cleanse.normTitle(col("seller_city")))
      .withColumn("seller_state", Cleanse.normUpper(col("seller_state")))
      .transform(Dedup.latestByKey(_, Seq("seller_id"),
        Seq(col("ingestion_ts").desc, col("source_file").desc)))
      .withColumn("silver_processed_ts", current_timestamp())

  /** Upserts a cleansed batch into the silver table: LWW on ingestion_ts
    * (M2, `02:67-87`), create-if-missing (S8).
    *
    * This is the faithful port of the reference's Delta MERGE minus
    * Delta's file pruning: the whole target is rewritten per batch. For
    * large silver tables prefer `upsertIntoBucketed`, which rewrites
    * only the hash buckets the batch touches.
    */
  def upsertInto(spark: SparkSession, ref: TableRef, batch: DataFrame, keys: Seq[String]): Unit =
    if (!Table.exists(spark, ref)) {
      Table.overwriteAtomic(batch, ref)
    } else {
      val target = Table.read(spark, ref).select(batch.columns.map(col): _*)
      Table.overwriteAtomic(
        Upsert.lastWriterWins(target, batch, keys, "ingestion_ts"), ref)
    }

  /** Scale-path silver upsert: bucket-pruned LWW rewrite
    * (graft.table.Bucketed) — per-batch cost follows the touched
    * buckets, not the table size.
    */
  def upsertIntoBucketed(
      spark: SparkSession,
      ref: graft.table.BucketedRef,
      batch: DataFrame,
      zone: Option[graft.table.ZoneSpec] = None): Unit =
    if (!graft.table.Bucketed.exists(spark, ref)) {
      // creation establishes the zone sidecar; every later upsert
      // maintains it from the contract recorded there (Bucketed
      // .zoneSpec), so callers only declare zoning once
      graft.table.Bucketed.create(batch, ref, zone)
    } else {
      graft.table.Bucketed.upsertLww(spark, ref, batch, "ingestion_ts")
    }

  /** Versioned-silver upsert: the same LWW merge, committed THROUGH
    * the transaction log (graft.table.Versioned.merge) — every refresh
    * is an ACID version, so silver itself time-travels and serves CDF,
    * which is what the reference gets from Delta at every silver write
    * (`02_bronze_to_silver.py:56-62`). Matched-file pruning replaces
    * the bucketed path's bucket pruning: per batch only files holding
    * matched keys rewrite.
    */
  def upsertIntoVersioned(
      spark: SparkSession, dir: String, batch: DataFrame, keys: Seq[String]): Unit =
    if (graft.table.Versioned.currentVersion(spark, dir).isEmpty)
      graft.table.Versioned.append(batch, dir)
    else
      graft.table.Versioned.merge(spark, dir, batch, keys,
        updateWhen = Upsert.scol("ingestion_ts") > Upsert.tcol("ingestion_ts"))
}

/** Gold layer — dimensions (03), facts (04-06), metric marts (07-09). */
object Gold {

  /** Deterministic surrogate key from the natural key: 60 portable bits
    * from the two polynomial hash families (graft.functions.Text). The
    * reference uses monotonically_increasing_id (F17), which is
    * partitioning-dependent; a keyed hash is reproducible across runs
    * AND fully distributed — no global row_number window funneling the
    * table through one partition. Collision odds at 2^60 are ~n²/2^61
    * (≈ 5e-11 for a 10M-row dimension); uniqueness equals PK uniqueness
    * for practical dimension sizes.
    */
  private def surrogateKey(naturalKey: Column): Column =
    graft.functions.Text.polyHash(naturalKey) +
      graft.functions.Text.polyHash2(naturalKey) * lit(1L << 30)

  /** 03:25-47 — dim_customers. */
  def dimCustomers(silverCustomers: DataFrame): DataFrame =
    Dedup.latestByKey(silverCustomers, Seq("customer_id"),
        Seq(col("silver_processed_ts").desc, col("source_file").desc))
      .select(
        col("customer_id"),
        col("customer_unique_id"),
        Cleanse.safeCast(col("customer_zip_code_prefix"), IntegerType)
          .as("customer_zip_code_prefix"),
        Cleanse.normLower(col("customer_city")).as("customer_city"),
        Cleanse.normUpper(col("customer_state")).as("customer_state"))
      .withColumn("gold_processed_ts", current_timestamp())

  /** 03:112-145 — dim_products with volume (F16) and surrogate key. */
  def dimProducts(silverProducts: DataFrame): DataFrame =
    Dedup.latestByKey(silverProducts, Seq("product_id"),
        Seq(col("silver_processed_ts").desc, col("source_file").desc))
      .withColumn("product_volume_cm3",
        col("product_length_cm") * col("product_height_cm") * col("product_width_cm"))
      .withColumn("product_sk", surrogateKey(col("product_id")))
      .withColumn("gold_processed_ts", current_timestamp())

  /** 03:211-233 — dim_sellers. */
  def dimSellers(silverSellers: DataFrame): DataFrame =
    Dedup.latestByKey(silverSellers, Seq("seller_id"),
        Seq(col("silver_processed_ts").desc, col("source_file").desc))
      .withColumn("seller_sk", surrogateKey(col("seller_id")))
      .withColumn("gold_processed_ts", current_timestamp())

  /** 03:276-338 — dim_geolocation: re-aggregated coordinates + mode
    * city/state per zip, deterministic surrogate.
    */
  def dimGeolocation(silverGeo: DataFrame): DataFrame =
    silverGeo
      .withColumn("geolocation_sk", surrogateKey(col("zip_code_prefix")))
      .withColumn("gold_processed_ts", current_timestamp())

  /** 04_gold_fact_orders.py — orders ⋈ customers ⋈ per-order item aggs
    * (A4), lifecycle datediffs (F11).
    */
  def factOrders(silverOrders: DataFrame, silverCustomers: DataFrame, silverItems: DataFrame): DataFrame = {
    val itemAggs = silverItems.groupBy("order_id").agg(
      count(lit(1)).as("item_count"),
      sum("price").as("order_value"),
      sum("freight_value").as("order_freight"))
    // NB: the reference joins customers here and then selects none of
    // its columns (04:55-59 vs 04:64-91) — a dead join Catalyst cannot
    // eliminate (it can't prove the right side key-unique). We skip it;
    // the signature keeps the customers parameter for API parity.
    val _ = silverCustomers
    silverOrders.withColumnRenamed("silver_processed_ts", "orders_silver_ts")
      .join(itemAggs, Seq("order_id"), "left")
      // explicit fact schema mirroring 04:64-91 — customer attributes stay
      // in the dimension (08/09 re-join dim_customers for state), so the
      // fact never duplicates dim columns
      .select(
        col("order_id"), col("customer_id"), col("order_status"),
        col("order_purchase_timestamp"), col("order_approved_at"),
        col("order_delivered_customer_date"), col("order_estimated_delivery_date"),
        col("item_count"), col("order_value"), col("order_freight"),
        datediff(col("order_approved_at"), col("order_purchase_timestamp"))
          .as("days_to_approve"),
        datediff(col("order_delivered_customer_date"), col("order_purchase_timestamp"))
          .as("days_to_deliver"),
        datediff(col("order_delivered_customer_date"), col("order_estimated_delivery_date"))
          .as("delivery_delay_days"),
        col("orders_silver_ts"),
        current_timestamp().as("gold_processed_ts"))
  }

  /** 05_gold_fact_payments.py — per-order payment rollup (A4) ⋈ orders. */
  def factPayments(silverPayments: DataFrame, silverOrders: DataFrame): DataFrame =
    silverPayments
      .withColumn("payment_value", col("payment_value").cast(DoubleType))
      .groupBy("order_id")
      .agg(
        count(lit(1)).as("payment_count"),
        sum("payment_value").as("payment_total"),
        max("payment_installments").as("max_installments"))
      .join(silverOrders.select("order_id", "customer_id", "order_status"),
        Seq("order_id"), "left")
      .withColumn("gold_processed_ts", current_timestamp())

  /** 06_gold_fact_reviews.py — cleansed reviews ⋈ orders, re-deduped. */
  def factReviews(silverReviews: DataFrame, silverOrders: DataFrame): DataFrame =
    silverReviews
      .filter(col("review_score").between(1, 5))
      .join(silverOrders.select("order_id", "customer_id", "order_status"),
        Seq("order_id"), "left")
      .withColumn("gold_processed_ts", current_timestamp())
      .transform(Dedup.latestByKey(_, Seq("review_id"),
        Seq(col("silver_processed_ts").desc, col("order_id").desc)))

  /** 07_gold_metrics_revenue.py — fact_orders ⋈ fact_payments (inner:
    * only paid orders contribute) ⋈ dim_customers, daily rollup.
    */
  def metricsRevenue(factOrders: DataFrame, factPayments: DataFrame, dimCustomers: DataFrame): DataFrame =
    factOrders.select("order_id", "customer_id", "order_status", "order_purchase_timestamp")
      .join(factPayments.select("order_id", "payment_total", "payment_count"),
        Seq("order_id"), "inner")
      .join(dimCustomers.select("customer_id", "customer_state"), Seq("customer_id"), "left")
      .groupBy(
        to_date(col("order_purchase_timestamp")).as("order_date"),
        col("customer_state"),
        col("order_status"))
      .agg(
        sum("payment_total").as("total_revenue"),
        count_distinct(col("order_id")).as("order_count"),
        sum("payment_count").as("payment_count"))

  /** 08_gold_metric_orders.py — conditional status counts (A6) + average
    * delivery days (F11/A1).
    */
  def metricsOrders(factOrders: DataFrame, dimCustomers: DataFrame): DataFrame =
    factOrders
      .join(dimCustomers.select("customer_id", "customer_state"), Seq("customer_id"), "left")
      .groupBy(
        to_date(col("order_purchase_timestamp")).as("order_date"),
        col("customer_state"))
      .agg(
        count_distinct(col("order_id")).as("total_orders"),
        sum(when(col("order_status") === "delivered", 1).otherwise(0)).as("delivered_orders"),
        sum(when(col("order_status") === "canceled", 1).otherwise(0)).as("cancelled_orders"),
        sum(when(col("order_status") === "shipped", 1).otherwise(0)).as("shipped_orders"),
        sum(when(col("order_status") === "processing", 1).otherwise(0)).as("processing_orders"),
        avg(datediff(col("order_delivered_customer_date"), col("order_purchase_timestamp")))
          .as("avg_delivery_days"))

  /** 09_gold_metrics_customers.py — conditional countDistinct (A7). */
  def metricsCustomers(dimCustomers: DataFrame, factOrders: DataFrame): DataFrame =
    dimCustomers
      .join(factOrders.select("customer_id", "order_id", "order_status"),
        Seq("customer_id"), "left")
      .groupBy(col("customer_state"))
      .agg(
        count_distinct(col("customer_unique_id")).as("total_customers"),
        count_distinct(col("order_id")).as("total_orders"),
        count_distinct(when(col("order_status") === "delivered", col("order_id")))
          .as("delivered_orders"),
        count_distinct(when(col("order_id").isNotNull, col("customer_unique_id")))
          .as("active_customers"))
}
