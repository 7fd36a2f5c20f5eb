package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{StringType, StructField, StructType, TimestampType}

/** Registry of the reference's eight Olist entities: raw (bronze) CSV
  * schema, silver upsert keys, and the silver cleanse builder.
  *
  * Raw CSVs arrive all-string (`01_bronze_csv_to_delta.py:38-39` infers,
  * we pin — SURVEY.md §1.3); types are imposed by the cleansers. The
  * table name doubles as the ingest subdirectory name, which is what
  * dynamic table discovery (S2, `01:16-31`) enumerates.
  */
final case class Entity(
    name: String,
    rawColumns: Seq[String],
    silverKeys: Seq[String],
    cleanse: DataFrame => DataFrame,
    // true when the cleanser AGGREGATES rows into its silver grain
    // (geolocation: one row per zip from many raw rows). Such entities
    // must be recleansed from FULL bronze on every silver refresh: a
    // per-micro-batch cleanse would re-aggregate a re-seen key from the
    // batch alone and LWW-replace its all-history row — silver would
    // depend on file arrival order instead of being a pure function of
    // bronze contents.
    aggregatedGrain: Boolean = false,
    // long-castable CLEANSED columns to zone-map in the bucketed silver
    // layout (graft.table.ZoneSpec): bucket writes range-cluster on the
    // first and publish per-file [lo, hi] sidecars for all, so range
    // scans (Lake.silverWhere) prune files at planning time — the Delta
    // data-skipping row of SURVEY.md §4
    zoneCols: Seq[String] = Nil) {

  /** Bucketed-silver clustering contract, when `zoneCols` declares one. */
  def zoneSpec: Option[graft.table.ZoneSpec] =
    if (zoneCols.isEmpty) None else Some(graft.table.ZoneSpec(zoneCols))

  /** All-string bronze schema (before ingest metadata columns). */
  def bronzeSchema: StructType =
    StructType(rawColumns.map(StructField(_, StringType, nullable = true)))

  /** On-disk bronze schema: raw columns + ingest metadata (S3). Used to
    * pin the schema when tailing bronze as a stream (S5).
    */
  def bronzeStoredSchema: StructType =
    StructType(bronzeSchema.fields ++ Seq(
      StructField("ingestion_ts", TimestampType, nullable = true),
      StructField("source_file", StringType, nullable = true)))
}

object Entities {

  val customers: Entity = Entity(
    "customers",
    Seq("customer_id", "customer_unique_id", "customer_zip_code_prefix",
      "customer_city", "customer_state"),
    Seq("customer_id"),
    Silver.cleanseCustomers)

  val geolocation: Entity = Entity(
    "geolocation",
    Seq("geolocation_zip_code_prefix", "geolocation_lat", "geolocation_lng",
      "geolocation_city", "geolocation_state"),
    Seq("zip_code_prefix"), // post-cleanse grain: one row per zip
    Silver.cleanseGeolocation,
    aggregatedGrain = true)

  val orderItems: Entity = Entity(
    "order_items",
    Seq("order_id", "order_item_id", "product_id", "seller_id",
      "shipping_limit_date", "price", "freight_value"),
    Seq("order_id", "order_item_id"),
    Silver.cleanseOrderItems)

  val orderPayments: Entity = Entity(
    "order_payments",
    Seq("order_id", "payment_sequential", "payment_type",
      "payment_installments", "payment_value"),
    Seq("order_id", "payment_sequential"),
    Silver.cleanseOrderPayments)

  val orderReviews: Entity = Entity(
    "order_reviews",
    Seq("review_id", "order_id", "review_score", "review_comment_title",
      "review_comment_message", "review_creation_date", "review_answer_timestamp"),
    Seq("review_id"),
    Silver.cleanseOrderReviews)

  val orders: Entity = Entity(
    "orders",
    Seq("order_id", "customer_id", "order_status", "order_purchase_timestamp",
      "order_approved_at", "order_delivered_carrier_date",
      "order_delivered_customer_date", "order_estimated_delivery_date"),
    Seq("order_id"),
    Silver.cleanseOrders,
    // THE lakehouse range predicate is purchase time; delivered-customer
    // correlates with it, so its zones stay tight under the same
    // clustering and time-window scans on either column prune
    zoneCols = Seq("order_purchase_timestamp", "order_delivered_customer_date"))

  val products: Entity = Entity(
    "products",
    Seq("product_id", "product_category_name", "product_name_lenght",
      "product_description_lenght", "product_photos_qty", "product_weight_g",
      "product_length_cm", "product_height_cm", "product_width_cm"),
    Seq("product_id"),
    Silver.cleanseProducts)

  val sellers: Entity = Entity(
    "sellers",
    Seq("seller_id", "seller_zip_code_prefix", "seller_city", "seller_state"),
    Seq("seller_id"),
    Silver.cleanseSellers,
    zoneCols = Seq("seller_zip_code_prefix"))

  val all: Seq[Entity] = Seq(
    customers, geolocation, orderItems, orderPayments,
    orderReviews, orders, products, sellers)

  def byName(name: String): Option[Entity] = all.find(_.name == name)
}
