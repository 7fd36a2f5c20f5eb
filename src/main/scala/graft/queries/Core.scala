package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.operators.Skew
import graft.ops.{Dedup, Upsert}

/** Reference-parity query set (SURVEY.md §2 / §7.5), one per operator
  * family, over the driver testdata. Every query is deterministic
  * (SURVEY.md §7.4): money sums use integer cents, averages are a single
  * double division of exact integers, event-time ordering uses microsecond
  * epochs with unique-id tiebreaks, and outputs carry an explicit total
  * order (Catalyst's EliminateSorts drops the sort when a consumer like
  * `count()` doesn't need it, so bench runs don't pay for it).
  */
object Core {
  import Tables.t

  /** Money as integer cents: `round(x*100)` is identical in Spark and
    * DuckDB for any double (both round half away from zero on the same
    * binary value), and bigint sums are order-independent — unlike double
    * sums, whose value depends on aggregation order.
    */
  private def cents(c: Column): Column = round(c * lit(100)).cast("long")

  /** Event-time as epoch microseconds. The events table is
    * nanosecond-precision parquet, which our table layer surfaces as an
    * epoch-nanos BIGINT (Tables.t); integer floor-division to micros is
    * reproduced exactly by the oracle's `epoch_ns(ts) // 1000`.
    */
  private val tsUs: Column = expr("ts div 1000")
  private val OracleTsUs = "CAST(epoch_ns(ts) // 1000 AS BIGINT)"

  // J5/J6 + A4/A5/A8 + F10 — the reference's revenue mart
  // (07_gold_metrics_revenue.py:26-65): fact ⋈ fact inner, ⋈ dim left,
  // to_date grouping key, sum + countDistinct.
  def revenueRollup(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val customer = t(s, dir, "customer")
    val nation = t(s, dir, "nation")
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"), "inner")
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"), "left")
      .groupBy(
        // date grouping key emitted as an ISO string: date/timestamp
        // physical encodings differ across engines, strings never do
        date_format(to_date(col("o_orderdate")), "yyyy-MM-dd").as("order_date"),
        col("n_name").as("nation"),
        col("o_orderstatus").as("status"))
      .agg(
        sum(cents(col("o_totalprice"))).as("revenue_cents"),
        count_distinct(col("o_orderkey")).as("n_orders"),
        count_distinct(col("o_custkey")).as("n_customers"))
      .orderBy(col("order_date"), col("nation"), col("status"))
  }

  val revenueRollupSql: String =
    """SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
      |       n_name AS nation,
      |       o_orderstatus AS status,
      |       CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
      |       COUNT(DISTINCT o_orderkey) AS n_orders,
      |       COUNT(DISTINCT o_custkey) AS n_customers
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |LEFT JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  // P1-P8 + F5 — projection, aliasing, null/conjunctive/isin/between
  // filters, cast (02_bronze_to_silver.py:138-151, 02:579-601, 02:517).
  def projectFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_returnflag").isin("A", "R"))
      .filter(col("l_quantity").between(10, 40))
      .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
      .select(
        col("l_orderkey").as("okey"),
        col("l_linenumber").as("line"),
        col("l_quantity").cast("long").as("qty"),
        col("l_returnflag").as("flag"),
        cents(col("l_extendedprice")).as("price_cents"))
      .orderBy(col("okey"), col("line"))

  val projectFilterSql: String =
    """SELECT l_orderkey AS okey, l_linenumber AS line,
      |       CAST(l_quantity AS BIGINT) AS qty, l_returnflag AS flag,
      |       CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents
      |FROM lineitem
      |WHERE l_returnflag IN ('A','R') AND l_quantity BETWEEN 10 AND 40
      |  AND l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
      |ORDER BY okey, line""".stripMargin

  // W1 — latest-record-wins dedup (02:34-41 et al.), with the §7.4
  // deterministic tiebreak (event_id desc).
  def dedupLatest(s: SparkSession, dir: String): DataFrame =
    Dedup.latestByKey(
        t(s, dir, "events").withColumn("ts_us", tsUs),
        Seq("user_id"),
        Seq(col("ts_us").desc, col("event_id").desc))
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("user_id")

  val dedupLatestSql: String =
    s"""SELECT user_id, event_id, event_type, value FROM (
       |  SELECT user_id, event_id, event_type, value,
       |         row_number() OVER (PARTITION BY user_id
       |           ORDER BY $OracleTsUs DESC, event_id DESC) AS rn
       |  FROM events) WHERE rn = 1
       |ORDER BY user_id""".stripMargin

  // A9 — mode-per-group / argmax (02:164-179, 03:290-309): most frequent
  // event_type per user.
  def modePerGroup(s: SparkSession, dir: String): DataFrame =
    Dedup.modePerGroup(t(s, dir, "events"), Seq("user_id"), "event_type")
      .orderBy("user_id")

  val modePerGroupSql: String =
    """SELECT user_id, event_type, n FROM (
      |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n,
      |         row_number() OVER (PARTITION BY user_id
      |           ORDER BY count(*) DESC, event_type ASC) AS rn
      |  FROM events GROUP BY user_id, event_type) WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  // M1 — insert-only merge (01:58-68): target = first two thirds of
  // events, source = last two thirds re-delivered with doubled value;
  // overlap rows must keep the target version. The split bounds are
  // computed INSIDE the plan (broadcast scalar aggregate) — no eager
  // driver-side count() action before the query runs.
  def insertOnly(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select("event_id", "user_id", "event_type", "value")
    val bounds = ev.agg(
      expr("count(1) * 2 div 3").as("__lo"),
      expr("count(1) div 3").as("__hi"))
    val evB = ev.crossJoin(broadcast(bounds))
    val target = evB.filter(col("event_id") < col("__lo")).drop("__lo", "__hi")
    val source = evB.filter(col("event_id") >= col("__hi")).drop("__lo", "__hi")
      .withColumn("value", col("value") * 2)
    Upsert.insertOnly(target, source, Seq("event_id")).orderBy("event_id")
  }

  val insertOnlySql: String =
    """WITH n AS (SELECT count(*) AS c FROM events),
      |tgt AS (SELECT event_id, user_id, event_type, value
      |        FROM events WHERE event_id < (SELECT c*2//3 FROM n)),
      |src AS (SELECT event_id, user_id, event_type, value*2 AS value
      |        FROM events WHERE event_id >= (SELECT c//3 FROM n))
      |SELECT * FROM tgt
      |UNION ALL
      |SELECT * FROM src WHERE event_id NOT IN (SELECT event_id FROM tgt)
      |ORDER BY event_id""".stripMargin

  // M2 — conditional-update (last-writer-wins) merge (02:67-87 + 6 more):
  // per-user profile from older events upserted with newer events; the
  // source wins only when strictly newer.
  def upsertLww(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .withColumn("ts_us", tsUs)
      .select("user_id", "event_id", "event_type", "value", "ts_us")
    // split bound inside the plan, as in insertOnly
    val evB = ev.crossJoin(broadcast(ev.agg(expr("count(1) div 2").as("__split"))))
    def latest(df: DataFrame) =
      Dedup.latestByKey(df, Seq("user_id"), Seq(col("ts_us").desc, col("event_id").desc))
    val target = latest(evB.filter(col("event_id") < col("__split")).drop("__split"))
    val source = latest(evB.filter(col("event_id") >= col("__split")).drop("__split"))
    Upsert.lastWriterWins(target, source, Seq("user_id"), "ts_us")
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("user_id")
  }

  val upsertLwwSql: String =
    s"""WITH n AS (SELECT count(*) AS c FROM events),
       |ev AS (SELECT user_id, event_id, event_type, value,
       |              $OracleTsUs AS ts_us FROM events),
       |tgt AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY user_id
       |          ORDER BY ts_us DESC, event_id DESC) rn
       |        FROM ev WHERE event_id < (SELECT c//2 FROM n)) WHERE rn = 1),
       |src AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY user_id
       |          ORDER BY ts_us DESC, event_id DESC) rn
       |        FROM ev WHERE event_id >= (SELECT c//2 FROM n)) WHERE rn = 1),
       |u AS (SELECT user_id, event_id, event_type, value, ts_us, 1 AS pri FROM tgt
       |      UNION ALL
       |      SELECT user_id, event_id, event_type, value, ts_us, 0 AS pri FROM src)
       |SELECT user_id, event_id, event_type, value FROM (
       |  SELECT *, row_number() OVER (PARTITION BY user_id
       |    ORDER BY ts_us DESC, pri DESC) AS rn FROM u) WHERE rn = 1
       |ORDER BY user_id""".stripMargin

  // A6 — conditional counts via sum(when) (08_gold_metric_orders.py:48-58).
  def conditionalCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
        sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_p"),
        count(lit(1)).as("n"))
      .orderBy("priority")

  val conditionalCountsSql: String =
    """SELECT o_orderpriority AS priority,
      |  CAST(SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      |  CAST(SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
      |  CAST(SUM(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // A7 — conditional countDistinct (09_gold_metrics_customers.py:49-59):
  // `when` without `otherwise` yields NULL, which count_distinct ignores.
  def conditionalDistinct(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val customer = t(s, dir, "customer")
    customer
      .join(orders, customer("c_custkey") === orders("o_custkey"), "left")
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(
        count_distinct(col("c_custkey")).as("n_customers"),
        count_distinct(when(col("o_orderstatus") === "F", col("o_custkey"))).as("n_custs_f"),
        count_distinct(col("o_orderkey")).as("n_orders"))
      .orderBy("segment")
  }

  val conditionalDistinctSql: String =
    """SELECT c_mktsegment AS segment,
      |  COUNT(DISTINCT c_custkey) AS n_customers,
      |  COUNT(DISTINCT CASE WHEN o_orderstatus='F' THEN o_custkey END) AS n_custs_f,
      |  COUNT(DISTINCT o_orderkey) AS n_orders
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // F11 + A1 — datediff lifecycle metric (04:79-87, 08:61-66): average as
  // one double division of exact integer sums.
  def avgDatediff(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val orders = t(s, dir, "orders")
    li.join(orders, li("l_orderkey") === orders("o_orderkey"), "inner")
      .select(col("l_returnflag").as("flag"),
        datediff(col("l_shipdate"), col("o_orderdate")).as("days"))
      .groupBy("flag")
      .agg(
        sum(col("days").cast("long")).as("sum_days"),
        count(lit(1)).as("n"))
      .withColumn("avg_days", col("sum_days").cast("double") / col("n"))
      .orderBy("flag")
  }

  val avgDatediffSql: String =
    """SELECT l_returnflag AS flag,
      |  CAST(SUM(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS BIGINT) AS sum_days,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(SUM(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS DOUBLE) / count(*) AS avg_days
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // F1/F2/F3 — normalization projection (02:48-49, 02:142, 02:815).
  def normalize(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(
        col("c_custkey").as("custkey"),
        upper(trim(col("c_name"))).as("name_upper"),
        lower(trim(col("c_mktsegment"))).as("segment_lower"),
        initcap(lower(trim(col("c_mktsegment")))).as("segment_title"))
      .orderBy("custkey")

  val normalizeSql: String =
    """SELECT c_custkey AS custkey,
      |       upper(trim(c_name)) AS name_upper,
      |       lower(trim(c_mktsegment)) AS segment_lower,
      |       upper(substr(lower(trim(c_mktsegment)),1,1)) ||
      |         substr(lower(trim(c_mktsegment)),2) AS segment_title
      |FROM customer ORDER BY custkey""".stripMargin

  // F15/F16 + A4 — arithmetic enrichment + rollup (02:310-315, 03:130-135):
  // TPC-H Q1 shape over lineitem.
  def itemEnrich(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .withColumn("revenue", col("l_extendedprice") * (lit(1) - col("l_discount")))
      .withColumn("charged", col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
      .groupBy(col("l_returnflag").as("flag"), col("l_linestatus").as("status"))
      .agg(
        sum(cents(col("l_quantity"))).as("qty_cents"),
        sum(cents(col("revenue"))).as("revenue_cents"),
        sum(cents(col("charged"))).as("charged_cents"),
        count(lit(1)).as("n"))
      .orderBy("flag", "status")

  val itemEnrichSql: String =
    """SELECT l_returnflag AS flag, l_linestatus AS status,
      |  CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_cents,
      |  CAST(SUM(CAST(round((l_extendedprice*(1-l_discount))*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
      |  CAST(SUM(CAST(round((l_extendedprice*(1-l_discount)*(1+l_tax))*100) AS BIGINT)) AS BIGINT) AS charged_cents,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // §2.7 gap coverage — explicit global top-k (sort + limit).
  def topkOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey").as("okey"),
        col("o_totalprice").as("total"),
        col("o_orderstatus").as("status"))
      .orderBy(col("total").desc, col("okey").asc)
      .limit(10)

  val topkOrdersSql: String =
    """SELECT o_orderkey AS okey, o_totalprice AS total, o_orderstatus AS status
      |FROM orders ORDER BY total DESC, okey ASC LIMIT 10""".stripMargin

  // F6/F8 + P10 — safe casts: parse-or-null, then null-drop
  // (02:411-425, 02:524-534).
  def safeCast(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", regexp_extract(col("props"), "([0-9]+)", 1).try_cast("int"))
      .filter(col("k").isNotNull)
      .withColumn("day", concat(lit("2024-01-"), lpad((col("k") % 28 + 1).cast("string"), 2, "0")))
      .withColumn("day_ts", try_to_timestamp(col("day"), lit("yyyy-MM-dd")))
      .select(
        col("event_id"),
        col("k").cast("long").as("k"),
        date_format(to_date(col("day_ts")), "yyyy-MM-dd").as("k_date"))
      .orderBy("event_id")

  val safeCastSql: String =
    """SELECT event_id, CAST(k AS BIGINT) AS k,
      |       strftime(CAST(try_strptime('2024-01-' || lpad(CAST(k%28+1 AS VARCHAR),2,'0'), '%Y-%m-%d') AS DATE), '%Y-%m-%d') AS k_date
      |FROM (SELECT event_id, TRY_CAST(regexp_extract(props, '([0-9]+)', 1) AS INTEGER) AS k FROM events)
      |WHERE k IS NOT NULL ORDER BY event_id""".stripMargin

  // M3 — unconditional-update merge with an explicit set-list
  // (03_gold_dimensions.py:64-81, 05:65-85): matched rows take the
  // source's `value` but keep the target's other columns. Target/source
  // are per-user profiles from even/odd event ids — a deterministic
  // split with no count() anywhere.
  def mergeUnconditional(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .withColumn("ts_us", tsUs)
      .select("user_id", "event_id", "event_type", "value", "ts_us")
    def latest(df: DataFrame) =
      Dedup.latestByKey(df, Seq("user_id"), Seq(col("ts_us").desc, col("event_id").desc))
        .drop("ts_us")
    val target = latest(ev.filter(col("event_id") % 2 === 0))
    val source = latest(ev.filter(col("event_id") % 2 === 1))
    Upsert.merge(target, source, Seq("user_id"), setCols = Seq("value"))
      .orderBy("user_id")
  }

  private val OracleEvLatest =
    s"""ev AS (SELECT user_id, event_id, event_type, value,
       |              $OracleTsUs AS ts_us FROM events),
       |tgt AS (SELECT user_id, event_id, event_type, value FROM (
       |          SELECT *, row_number() OVER (PARTITION BY user_id
       |            ORDER BY ts_us DESC, event_id DESC) rn
       |          FROM ev WHERE event_id % 2 = 0) WHERE rn = 1),
       |src AS (SELECT user_id, event_id, event_type, value FROM (
       |          SELECT *, row_number() OVER (PARTITION BY user_id
       |            ORDER BY ts_us DESC, event_id DESC) rn
       |          FROM ev WHERE event_id % 2 = 1) WHERE rn = 1)""".stripMargin

  val mergeUnconditionalSql: String =
    s"""WITH $OracleEvLatest
       |SELECT coalesce(s.user_id, t.user_id) AS user_id,
       |       CASE WHEN t.user_id IS NOT NULL THEN t.event_id ELSE s.event_id END AS event_id,
       |       CASE WHEN t.user_id IS NOT NULL THEN t.event_type ELSE s.event_type END AS event_type,
       |       CASE WHEN s.user_id IS NOT NULL THEN s.value ELSE t.value END AS value
       |FROM tgt t FULL OUTER JOIN src s ON t.user_id = s.user_id
       |ORDER BY user_id""".stripMargin

  // M4 — update-all merge (02:463-475): matched rows take the source
  // version wholesale (`whenMatchedUpdateAll`).
  def mergeUpdateAll(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .withColumn("ts_us", tsUs)
      .select("user_id", "event_id", "event_type", "value", "ts_us")
    def latest(df: DataFrame) =
      Dedup.latestByKey(df, Seq("user_id"), Seq(col("ts_us").desc, col("event_id").desc))
        .drop("ts_us")
    val target = latest(ev.filter(col("event_id") % 2 === 0))
    val source = latest(ev.filter(col("event_id") % 2 === 1))
    Upsert.merge(target, source, Seq("user_id")).orderBy("user_id")
  }

  val mergeUpdateAllSql: String =
    s"""WITH $OracleEvLatest
       |SELECT coalesce(s.user_id, t.user_id) AS user_id,
       |       CASE WHEN s.user_id IS NOT NULL THEN s.event_id ELSE t.event_id END AS event_id,
       |       CASE WHEN s.user_id IS NOT NULL THEN s.event_type ELSE t.event_type END AS event_type,
       |       CASE WHEN s.user_id IS NOT NULL THEN s.value ELSE t.value END AS value
       |FROM tgt t FULL OUTER JOIN src s ON t.user_id = s.user_id
       |ORDER BY user_id""".stripMargin

  // A2 + F18 — max aggregate and avg-over-expression
  // (02:161, 08:61-66): latest ship day and average order→ship days per
  // return flag. The average is a single double division of exact
  // integer sums, reproduced identically by DuckDB.
  def lifecycleMax(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val orders = t(s, dir, "orders")
    li.join(orders, li("l_orderkey") === orders("o_orderkey"), "inner")
      .groupBy(col("l_returnflag").as("flag"))
      .agg(
        // format AFTER the max — ISO date strings order like dates, so
        // max(date) then one format per group beats formatting 600k rows
        date_format(max(to_date(col("l_shipdate"))), "yyyy-MM-dd").as("last_ship_day"),
        max(cents(col("l_extendedprice"))).as("max_price_cents"),
        avg(datediff(col("l_shipdate"), col("o_orderdate"))).as("avg_days"))
      .orderBy("flag")
  }

  val lifecycleMaxSql: String =
    """SELECT l_returnflag AS flag,
      |  strftime(max(CAST(l_shipdate AS DATE)), '%Y-%m-%d') AS last_ship_day,
      |  max(CAST(round(l_extendedprice*100) AS BIGINT)) AS max_price_cents,
      |  CAST(SUM(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS DOUBLE)
      |    / count(*) AS avg_days
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // F7 + F9 — to_timestamp on known-good strings and try_to_timestamp
  // (default format) on mixed good/corrupt strings (02:277, 06:35-42).
  def timestampParse(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", regexp_extract(col("props"), "([0-9]+)", 1).try_cast("int"))
      .filter(col("k").isNotNull)
      .withColumn("good",
        concat(lit("2024-01-"), lpad((col("k") % 28 + 1).cast("string"), 2, "0"),
          lit(" 03:04:05")))
      .withColumn("mixed", when(col("k") % 3 === 0, lit("not a time")).otherwise(col("good")))
      .select(
        col("event_id"),
        date_format(to_timestamp(col("good")), "yyyy-MM-dd HH:mm:ss").as("parsed_good"),
        date_format(try_to_timestamp(col("mixed")), "yyyy-MM-dd HH:mm:ss").as("parsed_mixed"))
      .orderBy("event_id")

  val timestampParseSql: String =
    """WITH e AS (SELECT event_id,
      |    TRY_CAST(regexp_extract(props, '([0-9]+)', 1) AS INTEGER) AS k FROM events),
      |g AS (SELECT event_id, k,
      |    '2024-01-' || lpad(CAST(k%28+1 AS VARCHAR),2,'0') || ' 03:04:05' AS good
      |  FROM e WHERE k IS NOT NULL)
      |SELECT event_id,
      |  strftime(strptime(good, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS parsed_good,
      |  strftime(try_strptime(CASE WHEN k%3=0 THEN 'not a time' ELSE good END,
      |    '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS parsed_mixed
      |FROM g ORDER BY event_id""".stripMargin

  // F17 — deterministic surrogate keys: 60 portable bits from the two
  // polynomial hash families over the natural key (the distributed
  // replacement for monotonically_increasing_id, §7.4 — same derivation
  // as the gold dimension builders).
  def surrogateKeys(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Text
    t(s, dir, "customer")
      .select(
        col("c_custkey").as("custkey"),
        (Text.polyHash(col("c_name")) + Text.polyHash2(col("c_name")) * lit(1L << 30))
          .as("customer_sk"))
      .orderBy("custkey")
  }

  val surrogateKeysSql: String = {
    def fold(base: Long) =
      "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(string_split(c_name, ''), c -> CAST(ord(c) AS BIGINT))), " +
        s"(acc,x) -> (acc*$base + x) % 1000000007)"
    s"""SELECT c_custkey AS custkey,
       |       ${fold(31)} + ${fold(131)} * ${1L << 30} AS customer_sk
       |FROM customer ORDER BY custkey""".stripMargin
  }

  // J-skew — salted fact⋈dim join: semantically a plain equi-join (the
  // oracle IS the plain join), physically spread over (key, salt) so a
  // hot supplier key cannot serialize one task at scale.
  def saltedJoin(s: SparkSession, dir: String): DataFrame =
    Skew.saltedJoin(
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
            cents(col("l_extendedprice")).as("price_cents")),
        t(s, dir, "supplier").select(col("s_suppkey").as("l_suppkey"), col("s_name")),
        Seq("l_suppkey"),
        saltBy = col("l_orderkey") * lit(8) + col("l_linenumber"),
        salts = 16)
      .groupBy(col("s_name"))
      .agg(sum(col("price_cents")).as("revenue_cents"), count(lit(1)).as("n_items"))
      .orderBy("s_name")

  val saltedJoinSql: String =
    """SELECT s_name,
      |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
      |  CAST(count(*) AS BIGINT) AS n_items
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // F-json — semi-structured extraction (beyond the reference, which has
  // no JSON anywhere): parse the events.props JSON payload both ways —
  // path extraction (get_json_object) and schema-full parsing
  // (from_json) — and aggregate over the extracted field.
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k_path", get_json_object(col("props"), "$.k").cast("int"))
      .withColumn("k_schema",
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType)))).getField("k"))
      .filter(col("k_path").isNotNull)
      .groupBy((col("k_path") % 10).cast("long").as("k_bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k_schema").cast("long")).as("sum_k"),
        sum(when(col("k_path") === col("k_schema"), 0).otherwise(1)).as("parse_disagreements"))
      .orderBy("k_bucket")

  val jsonExtractSql: String =
    """SELECT CAST(k % 10 AS BIGINT) AS k_bucket,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(SUM(k) AS BIGINT) AS sum_k,
      |       CAST(0 AS BIGINT) AS parse_disagreements
      |FROM (SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events)
      |WHERE k IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // A10 — ROLLUP hierarchy totals (beyond the reference, SURVEY §2.5
  // "not present": grouping sets/cube/rollup): per (status, priority)
  // with per-status subtotals and a grand total. NULL group keys from
  // rollup are disambiguated from real NULLs via grouping() flags.
  def rollupTotals(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        sum(cents(col("o_totalprice"))).as("revenue_cents"),
        count(lit(1)).as("n"),
        grouping(col("o_orderstatus")).cast("long").as("g_status"),
        grouping(col("o_orderpriority")).cast("long").as("g_priority"))
      .select(
        coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
        coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
        col("revenue_cents"), col("n"), col("g_status"), col("g_priority"))
      .orderBy("g_status", "g_priority", "status", "priority")

  val rollupTotalsSql: String =
    """SELECT coalesce(o_orderstatus, '<all>') AS status,
      |       coalesce(o_orderpriority, '<all>') AS priority,
      |       CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      |       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority
      |FROM orders
      |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY g_status, g_priority, status, priority""".stripMargin

  // A11 — CUBE (the remaining multi-grouping shape next to a10's
  // ROLLUP): all four grouping sets of (returnflag, linestatus) in one
  // pass — Spark expands the cube map-side, so the shuffle carries one
  // partial aggregate per (set, key), not four scans of lineitem.
  def cubeTotals(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        count(lit(1)).as("n"),
        grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"))
      .select(
        coalesce(col("l_returnflag"), lit("<all>")).as("flag"),
        coalesce(col("l_linestatus"), lit("<all>")).as("status"),
        col("sum_qty"), col("n"), col("g_flag"), col("g_status"))
      .orderBy("g_flag", "g_status", "flag", "status")

  val cubeTotalsSql: String =
    """SELECT coalesce(l_returnflag, '<all>') AS flag,
      |       coalesce(l_linestatus, '<all>') AS status,
      |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
      |       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY g_flag, g_status, flag, status""".stripMargin

  // A12 — explicit GROUPING SETS (the third multi-grouping shape next
  // to a10's ROLLUP and a11's CUBE): an arbitrary set list —
  // (status, priority), (priority), () — that neither rollup nor cube
  // can express (rollup would include (status); cube all four). Spark
  // expands the sets map-side exactly like rollup/cube: one scan, one
  // shuffle of per-(set, key) partials.
  def groupingSetsTotals(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderpriority")), Seq.empty),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        sum(cents(col("o_totalprice"))).as("revenue_cents"),
        count(lit(1)).as("n"),
        grouping(col("o_orderstatus")).cast("long").as("g_status"),
        grouping(col("o_orderpriority")).cast("long").as("g_priority"))
      .select(
        coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
        coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
        col("revenue_cents"), col("n"), col("g_status"), col("g_priority"))
      .orderBy("g_status", "g_priority", "status", "priority")

  val groupingSetsTotalsSql: String =
    """SELECT coalesce(o_orderstatus, '<all>') AS status,
      |       coalesce(o_orderpriority, '<all>') AS priority,
      |       CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      |       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
      |ORDER BY g_status, g_priority, status, priority""".stripMargin

  // S8-adjacent set operations (SURVEY §2.7 "none in reference"):
  // UNION ALL / INTERSECT / EXCEPT composed in one query over order-key
  // slices, so all three set semantics are exercised and checked.
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders").select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"))
    val a = orders.filter(col("st") === "F")
    val b = orders.filter(col("st") === "O")
    val highF = a.filter(col("k") % 3 === 0)
    a.select("k").intersect(highF.select("k"))
      .withColumn("src", lit("f_div3"))
      .unionByName(
        b.select("k").except(a.select("k")).filter(col("k") % 7 === 0)
          .withColumn("src", lit("o_not_f_div7")))
      .orderBy("src", "k")
  }

  val setOpsSql: String =
    """WITH a AS (SELECT o_orderkey AS k FROM orders WHERE o_orderstatus='F'),
      |b AS (SELECT o_orderkey AS k FROM orders WHERE o_orderstatus='O')
      |SELECT k, 'f_div3' AS src FROM (SELECT k FROM a INTERSECT SELECT k FROM a WHERE k % 3 = 0)
      |UNION ALL
      |SELECT k, 'o_not_f_div7' AS src FROM (
      |  SELECT k FROM (SELECT k FROM b EXCEPT SELECT k FROM a) WHERE k % 7 = 0)
      |ORDER BY src, k""".stripMargin

  /** J5-J8 at full star depth — the four-dimension snowflake
    * (lineitem ⋈ part ⋈ supplier ⋈ nation ⋈ region) that exercises the
    * remaining testdata tables. Every dimension is broadcast: at any
    * scale the dims are orders of magnitude smaller than the fact, so
    * the plan is one fact scan with four broadcast hash joins and a
    * map-side-combinable aggregate — no fact shuffle before the
    * grouping. Money as integer cents (order-independent sums); the
    * average is an explicit sum/count division, not avg(), so the
    * oracle replays it exactly.
    */
  def starMargin(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("p_brand").as("brand"))
      .agg(
        sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("net_cents"),
        count(lit(1)).as("n_items"),
        count_distinct(col("s_suppkey")).as("n_suppliers"),
        (sum(col("l_quantity").cast("long")).cast("double") / count(lit(1))).as("avg_qty"))
      .orderBy("region", "brand")
  }

  val starMarginSql: String =
    """SELECT r_name AS region, p_brand AS brand,
      |  CAST(SUM(CAST(round((l_extendedprice * (1.0 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS net_cents,
      |  CAST(count(*) AS BIGINT) AS n_items,
      |  COUNT(DISTINCT s_suppkey) AS n_suppliers,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // S9 — PIVOT (long→wide reshaping, SURVEY §2.7 gap): per-user event
  // counts spread across one column per type. The pivot value list is
  // EXPLICIT — with an inferred list Spark first runs a distinct query
  // whose result order (and thus column order) is nondeterministic, and
  // at scale the extra pass over the fact table is pure waste.
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  def pivotEvents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("user_id")
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .select(col("user_id") +:
        EventTypes.map(tp => coalesce(col(tp), lit(0L)).as(s"n_$tp")): _*)
      .orderBy("user_id")

  val pivotEventsSql: String = {
    val cols = EventTypes.map(tp =>
      s"CAST(count(*) FILTER (WHERE event_type = '$tp') AS BIGINT) AS n_$tp")
    s"""SELECT user_id, ${cols.mkString(", ")}
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  // S10 — UNPIVOT/melt (wide→long): the three lineitem amount columns
  // stacked into (component, amount) rows, then rolled up per
  // component. Unpivot is a zero-shuffle projection (each input row
  // emits 3 output rows in place); only the rollup exchanges data.
  def unpivotAmounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "component", "amount")
      .groupBy("component")
      .agg(
        sum(cents(col("amount"))).as("total_cents"),
        count(lit(1)).as("n"),
        max(cents(col("amount"))).as("max_cents"))
      .orderBy("component")

  val unpivotAmountsSql: String =
    """WITH m AS (
      |  SELECT 'l_extendedprice' AS component, l_extendedprice AS amount FROM lineitem
      |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
      |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
      |SELECT component,
      |  CAST(SUM(CAST(round(amount*100) AS BIGINT)) AS BIGINT) AS total_cents,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(max(CAST(round(amount*100) AS BIGINT)) AS BIGINT) AS max_cents
      |FROM m GROUP BY component ORDER BY component""".stripMargin

  // J11 — explicit semi/anti joins (used internally by the merge ops;
  // here as first-class queries): customers WITH an open order (semi —
  // no row duplication however many orders match, and Spark never
  // materializes the right payload) and customers with NO order at all
  // (anti). Both shuffle only the key column of the probe side.
  def semiAnti(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select("c_custkey", "c_mktsegment")
    val o = t(s, dir, "orders").select("o_custkey", "o_orderstatus")
    val semi = c.join(o.filter(col("o_orderstatus") === "O"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .withColumn("src", lit("has_open"))
    val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .withColumn("src", lit("no_orders"))
    semi.unionByName(anti)
      .select("src", "c_custkey", "c_mktsegment")
      .orderBy("src", "c_custkey")
  }

  val semiAntiSql: String =
    """SELECT 'has_open' AS src, c_custkey, c_mktsegment FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
      |UNION ALL
      |SELECT 'no_orders', c_custkey, c_mktsegment FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY src, c_custkey""".stripMargin

  // W5 — window-analytics battery over each customer's order history:
  // running revenue (rows-frame sum), days since the previous order
  // (lag), revenue rank and quartile (rank/ntile). Every window shares
  // ONE (custkey → date,key) sort: Spark plans a single exchange +
  // sort for all four functions. The per-customer order is total
  // (date, then key) so rank == a deterministic sequence, and ntile's
  // bucket boundaries are reproducible.
  def windowAnalytics(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("d"), cents(col("o_totalprice")).as("c"))
    val byDate = Window.partitionBy("o_custkey").orderBy(col("d"), col("o_orderkey"))
    o.select(
        col("o_custkey"), col("o_orderkey"),
        date_format(col("d"), "yyyy-MM-dd").as("order_date"),
        sum(col("c")).over(byDate.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("running_cents"),
        datediff(col("d"), lag(col("d"), 1).over(byDate)).cast("long").as("days_since_prev"),
        rank().over(byDate).cast("long").as("seq_rank"),
        ntile(4).over(byDate).cast("long").as("quartile"))
      .orderBy("o_custkey", "order_date", "o_orderkey")
  }

  val windowAnalyticsSql: String =
    """SELECT o_custkey, o_orderkey,
      |  strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
      |  CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT))
      |    OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey
      |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents,
      |  CAST(date_diff('day',
      |      lag(CAST(o_orderdate AS DATE)) OVER w, CAST(o_orderdate AS DATE)) AS BIGINT)
      |    AS days_since_prev,
      |  CAST(rank() OVER w AS BIGINT) AS seq_rank,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
      |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin

  // W7 — RANGE window frame (the value-based frame w5's ROWS battery
  // leaves uncovered): per customer, trailing-30-day revenue and order
  // count at each order. The frame is defined by the DAY-NUMBER range,
  // so all orders on tied dates are peers and the result is
  // deterministic under any tie order — no tiebreak column needed,
  // unlike every ROWS frame. One exchange + sort serves both
  // aggregates; integer day numbers keep the frame arithmetic exact in
  // both engines.
  def rangeFrame(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("d"), cents(col("o_totalprice")).as("c"))
      .withColumn("day_no", unix_date(col("d")).cast("long"))
    val trailing30 = Window.partitionBy("o_custkey").orderBy(col("day_no"))
      .rangeBetween(-30, Window.currentRow)
    o.select(
        col("o_custkey"), col("o_orderkey"),
        date_format(col("d"), "yyyy-MM-dd").as("order_date"),
        sum(col("c")).over(trailing30).as("trail30_cents"),
        count(lit(1)).over(trailing30).cast("long").as("trail30_n"))
      .orderBy("o_custkey", "order_date", "o_orderkey")
  }

  val rangeFrameSql: String =
    """SELECT o_custkey, o_orderkey,
      |  strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
      |  CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) OVER w AS BIGINT) AS trail30_cents,
      |  CAST(COUNT(*) OVER w AS BIGINT) AS trail30_n
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY CAST(o_orderdate AS DATE) - DATE '1970-01-01'
      |             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin

  // W8 — rank/navigation battery complementing w5 (which covers
  // running sum / lag / rank / ntile): dense_rank over the DATE-only
  // order (tied dates are peers, so no tiebreak column is needed),
  // lead (days until the next order), first/last/nth order key over
  // the full-partition frame, percent_rank and cume_dist over the
  // total (date, key) order. Both rank-family doubles are a SINGLE
  // integer division — (rank−1)/(n−1) and peers/n — so Spark and
  // DuckDB produce bit-identical float64 (SURVEY §7.4). The (d) sort
  // is a prefix of the (d, key) sort, so Spark satisfies every window
  // from ONE exchange + one sort.
  def rankNavigation(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), to_date(col("o_orderdate")).as("d"))
    val byDateKey = Window.partitionBy("o_custkey").orderBy(col("d"), col("o_orderkey"))
    val byDate = Window.partitionBy("o_custkey").orderBy(col("d"))
    val full = byDateKey.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    o.select(
        col("o_custkey"), col("o_orderkey"),
        date_format(col("d"), "yyyy-MM-dd").as("order_date"),
        dense_rank().over(byDate).cast("long").as("date_rank"),
        datediff(lead(col("d"), 1).over(byDateKey), col("d")).cast("long").as("days_to_next"),
        first(col("o_orderkey")).over(full).as("first_key"),
        last(col("o_orderkey")).over(full).as("last_key"),
        nth_value(col("o_orderkey"), 2).over(full).as("second_key"),
        percent_rank().over(byDateKey).as("pct_rank"),
        cume_dist().over(byDateKey).as("cum_dist"))
      .orderBy("o_custkey", "order_date", "o_orderkey")
  }

  val rankNavigationSql: String =
    """SELECT o_custkey, o_orderkey,
      |  strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
      |  CAST(dense_rank() OVER (PARTITION BY o_custkey
      |                          ORDER BY CAST(o_orderdate AS DATE)) AS BIGINT) AS date_rank,
      |  CAST(date_diff('day', CAST(o_orderdate AS DATE),
      |      lead(CAST(o_orderdate AS DATE)) OVER w) AS BIGINT) AS days_to_next,
      |  first_value(o_orderkey) OVER wf AS first_key,
      |  last_value(o_orderkey) OVER wf AS last_key,
      |  nth_value(o_orderkey, 2) OVER wf AS second_key,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cum_dist
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
      |  wf AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin

  // W9 — SCD2 interval build (the slowly-changing-dimension type-2
  // shape every gold dim table needs): each user's event-type history
  // collapses runs of the same state (lag ≠ current), then lead()
  // closes each surviving row's validity window — [valid_from, next
  // change) with NULL for the open current state. Two window passes
  // over the SAME (user → us, event_id) order: one exchange, one sort,
  // the filter between them is pipeline-local. Event-time ties are
  // broken by event_id, so run-collapsing is total-order deterministic
  // (SURVEY §7.4).
  def scd2Intervals(s: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"), tsUs.as("us"))
      .withColumn("prev", lag(col("event_type"), 1).over(byTime))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .select(
        col("user_id"), col("event_type"), col("event_id"),
        col("us").as("valid_from_us"),
        lead(col("us"), 1).over(byTime).as("valid_to_us"))
      .orderBy("user_id", "valid_from_us", "event_id")
  }

  val scd2IntervalsSql: String =
    s"""WITH e AS (SELECT user_id, event_id, event_type, $OracleTsUs AS us FROM events),
       |c AS (SELECT *, lag(event_type) OVER w AS prev FROM e
       |      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
       |f AS (SELECT user_id, event_id, event_type, us FROM c
       |      WHERE prev IS NULL OR prev <> event_type)
       |SELECT user_id, event_type, event_id, us AS valid_from_us,
       |  lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to_us
       |FROM f ORDER BY user_id, valid_from_us, event_id""".stripMargin

  // F20 — scalar string-function battery (the long tail of §2.8 F-ops
  // users reach for daily), every function chosen to have an exact
  // DuckDB twin so the whole battery is hash-checked.
  def stringFunctions(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(
        col("c_custkey"),
        concat_ws("|", lower(col("c_mktsegment")), upper(col("c_name"))).as("tagged"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("padded_key"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        substring(col("c_name"), 1, 8).as("prefix8"),
        reverse(col("c_name")).as("rev"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("xlated"),
        instr(col("c_name"), "#").cast("long").as("hash_pos"),
        repeat(col("c_mktsegment"), 2).as("doubled"),
        length(col("c_name")).cast("long").as("name_len"))
      .orderBy("c_custkey")

  val stringFunctionsSql: String =
    """SELECT c_custkey,
      |  lower(c_mktsegment) || '|' || upper(c_name) AS tagged,
      |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
      |  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
      |  substr(c_name, 1, 8) AS prefix8,
      |  reverse(c_name) AS rev,
      |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS xlated,
      |  CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
      |  repeat(c_mktsegment, 2) AS doubled,
      |  CAST(length(c_name) AS BIGINT) AS name_len
      |FROM customer ORDER BY c_custkey""".stripMargin

  // F21 — array/higher-order-function battery over document tokens:
  // slice/sort/distinct/contains plus a transform+aggregate fold, all
  // reduced to scalar outputs (list-typed outputs would make the
  // cross-engine compare depend on pandas list semantics).
  def arrayFunctions(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.Text.tokens(col("text")).as("w"))
      .select(
        col("doc_id"),
        size(col("w")).cast("long").as("n_tok"),
        concat_ws(" ", slice(col("w"), 1, 3)).as("first3"),
        concat_ws(" ", slice(sort_array(array_distinct(col("w"))), 1, 5)).as("lex5"),
        array_contains(col("w"), "the").as("has_the"),
        aggregate(transform(col("w"), x => length(x).cast("long")),
          lit(0L), (a, x) => a + x).as("total_chars"),
        size(filter(col("w"), x => length(x) > 4)).cast("long").as("n_long"))
      .orderBy("doc_id")

  val arrayFunctionsSql: String =
    s"""WITH d AS (SELECT doc_id, ${"string_split_regex(trim(text), '\\s+')"} AS w
       |           FROM documents)
       |SELECT doc_id,
       |  CAST(len(w) AS BIGINT) AS n_tok,
       |  array_to_string(w[1:3], ' ') AS first3,
       |  array_to_string(list_sort(list_distinct(w))[1:5], ' ') AS lex5,
       |  list_contains(w, 'the') AS has_the,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(w, x -> CAST(length(x) AS BIGINT))), (a, x) -> a + x)
       |    AS total_chars,
       |  CAST(len(list_filter(w, x -> length(x) > 4)) AS BIGINT) AS n_long
       |FROM d ORDER BY doc_id""".stripMargin

  // F23 — generator/flatMap family (LATERAL VIEW posexplode): the one
  // row-producing operator shape f21's array battery leaves uncovered.
  // Every internal blocking operator (LSH bands, salting, range-bucket
  // explode) is built on generate; this exposes it as a user-facing,
  // hash-checked query: tokens → one (doc_id, pos, token) row each,
  // 1-based position to match SQL ordinality. Generate is
  // pipeline-local (no shuffle, no state) — output partitioning
  // follows the input, so at 100 TB it scales linearly with no
  // exchange; the orderBy exists only for the deterministic dump.
  def explodeTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), graft.functions.Text.tokens(col("text")).as("w"))
      .select(col("doc_id"), posexplode(col("w")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"), col("col").as("token"))
      .orderBy("doc_id", "pos")

  val explodeTokensSql: String =
    """WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      |           FROM documents)
      |SELECT doc_id,
      |  CAST(unnest(range(1, len(w)+1)) AS BIGINT) AS pos,
      |  unnest(w) AS token
      |FROM d ORDER BY doc_id, pos""".stripMargin

  // F22 — Morton z-value encoding (the clustering key behind
  // Versioned.compactClustered): pure shift/mask integer algebra, so
  // the DuckDB twin replays the identical five dilation rounds and the
  // curve math itself is hash-checked (the file-pruning effect it
  // exists for is spec-asserted in VersionedSpec).
  def zorderEncode(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(
        col("c_custkey"),
        graft.functions.ZOrder.zValue(
          col("c_custkey").cast("long"), col("c_nationkey").cast("long")).as("zval"))
      .orderBy("c_custkey")

  val zorderEncodeSql: String = {
    // the same five (x | x<<s) & mask rounds, one CTE per round
    val masks = Seq(
      16 -> 281470681808895L, 8 -> 71777214294589695L, 4 -> 1085102592571150095L,
      2 -> 3689348814741910323L, 1 -> 6148914691236517205L)
    val steps = masks.zipWithIndex.map { case ((sh, m), i) =>
      s"s${i + 1} AS (SELECT c_custkey, (x|(x<<$sh)) & $m AS x, (y|(y<<$sh)) & $m AS y FROM s$i)"
    }.mkString(",\n")
    s"""WITH s0 AS (SELECT c_custkey,
       |    CAST(c_custkey AS BIGINT) & 2147483647 AS x,
       |    CAST(c_nationkey AS BIGINT) & 2147483647 AS y FROM customer),
       |$steps
       |SELECT c_custkey, x | (y<<1) AS zval FROM s5 ORDER BY c_custkey""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("j5_revenue_rollup", revenueRollup, Some(revenueRollupSql)),
    QueryDef("j10_star_margin", starMargin, Some(starMarginSql)),
    QueryDef("p1_project_filter", projectFilter, Some(projectFilterSql)),
    QueryDef("w1_dedup_latest", dedupLatest, Some(dedupLatestSql)),
    QueryDef("a9_mode_per_group", modePerGroup, Some(modePerGroupSql)),
    QueryDef("m1_insert_only", insertOnly, Some(insertOnlySql)),
    QueryDef("m2_upsert_lww", upsertLww, Some(upsertLwwSql)),
    QueryDef("a6_conditional_counts", conditionalCounts, Some(conditionalCountsSql)),
    QueryDef("a7_conditional_distinct", conditionalDistinct, Some(conditionalDistinctSql)),
    QueryDef("f11_avg_datediff", avgDatediff, Some(avgDatediffSql)),
    QueryDef("f1_normalize", normalize, Some(normalizeSql)),
    QueryDef("f15_item_enrich", itemEnrich, Some(itemEnrichSql)),
    QueryDef("s7_topk_orders", topkOrders, Some(topkOrdersSql)),
    QueryDef("f6_safe_cast", safeCast, Some(safeCastSql)),
    QueryDef("m3_merge_unconditional", mergeUnconditional, Some(mergeUnconditionalSql)),
    QueryDef("m4_merge_update_all", mergeUpdateAll, Some(mergeUpdateAllSql)),
    QueryDef("a2_f18_lifecycle", lifecycleMax, Some(lifecycleMaxSql)),
    QueryDef("f7_f9_timestamps", timestampParse, Some(timestampParseSql)),
    QueryDef("f17_surrogate", surrogateKeys, Some(surrogateKeysSql)),
    QueryDef("j9_salted_join", saltedJoin, Some(saltedJoinSql)),
    QueryDef("a10_rollup", rollupTotals, Some(rollupTotalsSql)),
    QueryDef("a11_cube", cubeTotals, Some(cubeTotalsSql)),
    QueryDef("a12_grouping_sets", groupingSetsTotals, Some(groupingSetsTotalsSql)),
    QueryDef("w7_range_frame", rangeFrame, Some(rangeFrameSql)),
    QueryDef("w8_rank_nav", rankNavigation, Some(rankNavigationSql)),
    QueryDef("w9_scd2", scd2Intervals, Some(scd2IntervalsSql)),
    QueryDef("s8_set_ops", setOps, Some(setOpsSql)),
    QueryDef("f19_json_extract", jsonExtract, Some(jsonExtractSql)),
    QueryDef("s9_pivot_events", pivotEvents, Some(pivotEventsSql)),
    QueryDef("s10_unpivot_amounts", unpivotAmounts, Some(unpivotAmountsSql)),
    QueryDef("j11_semi_anti", semiAnti, Some(semiAntiSql)),
    QueryDef("w5_window_analytics", windowAnalytics, Some(windowAnalyticsSql)),
    QueryDef("f20_string_funcs", stringFunctions, Some(stringFunctionsSql)),
    QueryDef("f21_array_funcs", arrayFunctions, Some(arrayFunctionsSql)),
    QueryDef("f22_zorder", zorderEncode, Some(zorderEncodeSql)),
    QueryDef("f23_explode", explodeTokens, Some(explodeTokensSql)))
}
