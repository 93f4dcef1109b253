package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables

/** Relational / OLAP operators over the base tables (SURVEY §2 R1–R6).
  *
  * All plans are declarative DataFrame chains: filters and projections reach
  * the parquet scan, dimension tables are broadcast, aggregates get map-side
  * partials. Every computed column is aliased to match the DuckDB oracle SQL
  * exactly (driver compares sorted-by-name column hashes).
  */
object Relational {

  /** TPC-H Q1 style: scan + filter + wide aggregate over lineitem. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 4) AS sum_qty,
      |  round(sum(l_extendedprice), 4) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
      |  round(avg(l_quantity), 6) AS avg_qty,
      |  round(avg(l_discount), 6) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3 style: revenue per order for one market segment.
    * customer is the smallest side but it still scales with SF (150k rows
    * per SF) — no broadcast hint; AQE broadcasts it while it fits and
    * falls back to a key-shuffled join at petabyte SFs. lineitem⋈orders
    * shuffles on the (already co-partitionable) orderkey.
    */
  def q3Revenue(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
  }

  val q3Sql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority""".stripMargin

  /** TPC-H Q5 style: revenue by nation through a 5-way star join.
    * region/nation are constant-size (5/25 rows at every SF) — broadcast
    * hints are always right there. supplier/customer scale with SF, so
    * they carry no hint: AQE broadcasts them while small and shuffles on
    * the join key beyond that; only orders⋈lineitem is always a shuffle.
    */
  def q5NationRevenue(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val ord = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
  }

  val q5Sql: String =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name""".stripMargin

  /** Top-3 orders per customer by totalprice (deterministic tie-break on
    * orderkey). One shuffle on o_custkey; window is whole-stage codegen'd.
    */
  def topkOrdersPerCust(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rank"))
  }

  val topkSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
      |  FROM orders) t
      |WHERE rank <= 3""".stripMargin

  /** Gap-based sessionization over events: a new session starts when the gap
    * to the previous event of the same user exceeds 30 minutes. Returns one
    * row per session. Single shuffle on user_id; lag + running sum windows
    * share the partitioning.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
  }

  val sessionizeSql: String =
    """WITH marked AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sess AS (
      |  SELECT user_id, value,
      |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM marked
      |)
      |SELECT user_id, session_seq, count(*) AS n_events,
      |  round(sum(value), 4) AS sum_value
      |FROM sess GROUP BY user_id, session_seq""".stripMargin

  /** Tumbling 1-hour windows per event type. `hour` is emitted as epoch
    * seconds (BIGINT) so the oracle compare is engine-neutral — DuckDB reads
    * the source as TIMESTAMP_NS, Spark as microseconds.
    */
  def eventsHourly(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value")), 4).as("sum_value"),
        count_distinct(col("user_id")).as("n_users"))
  }

  val eventsHourlySql: String =
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour, event_type,
      |  count(*) AS n,
      |  round(sum(value), 4) AS sum_value,
      |  count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1, 2""".stripMargin

  /** R15: hopping (sliding) windows — 1-hour windows every 15 minutes, so
    * each event lands in size/slide = 4 overlapping windows. Spark's
    * `window(ts, size, slide)` plans this as a codegen'd 4-row expansion
    * feeding ONE map-side-combined aggregate — the per-event fan-out never
    * shuffles unexpanded rows twice, and the output is bounded by
    * (#windows × #types), not the event count. The rolling-metric shape
    * (trailing-hour dashboards refreshed sub-hourly) that tumbling windows
    * (R6) can't express.
    *
    * Window starts are epoch-aligned slide multiples, emitted as epoch
    * seconds (BIGINT) for an engine-neutral compare.
    */
  def eventsHopping(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value")), 4).as("sum_value"),
        count_distinct(col("user_id")).as("n_users"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("sum_value"), col("n_users"))
  }

  /** Oracle: expand each event into its 4 containing windows explicitly —
    * starts are the slide multiples in (ts − 1h, ts], i.e. floor(ts/slide)
    * minus j slides for j = 0..3 — then aggregate per (start, type).
    */
  val eventsHoppingSql: String =
    """SELECT CAST(FLOOR(epoch(ts) / 900) AS BIGINT) * 900 - j.j * 900 AS win_start,
      |  event_type,
      |  count(*) AS n,
      |  round(sum(value), 4) AS sum_value,
      |  count(DISTINCT user_id) AS n_users
      |FROM events, (SELECT unnest([0, 1, 2, 3]) AS j) j
      |GROUP BY 1, 2""".stripMargin

  /** TPC-H Q6 style: the pure-pushdown query — every predicate reaches the
    * parquet scan (range on date, between on discount, bound on quantity),
    * a 4-column ReadSchema, and a single scalar aggregate. The plan is one
    * codegen'd scan stage; nothing shuffles but one row per partition.
    */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4).as("revenue"))

  val q6Sql: String =
    """SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** TPC-H Q18 style: large orders — aggregate-then-having on the fact
    * table, then join customers. The having filter runs BEFORE the customer
    * join (aggregate pushdown below the join), so only qualifying orders
    * join the dimension.
    */
  def q18LargeOrders(spark: SparkSession, dir: String, minQty: Double = 150.0): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") >= minQty)
    // customer scales with SF — no broadcast hint (AQE decides at runtime)
    big.join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_totalprice"), round(col("total_qty"), 4).as("total_qty"))
  }

  def q18Sql(minQty: Double = 150.0): String =
    s"""WITH big AS (
       |  SELECT l_orderkey, sum(l_quantity) AS total_qty
       |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) >= $minQty
       |)
       |SELECT c_custkey, c_name, o_orderkey, o_totalprice,
       |  round(total_qty, 4) AS total_qty
       |FROM big JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey""".stripMargin

  /** Generic distributed as-of join — for every left row, the latest right
    * row with the same keys and `rightTs` ≤ `leftTs` (rows at the exact
    * same instant match; ties among equal-ts right rows resolve to the
    * largest `rightId`, so the result is deterministic — native engines'
    * ASOF joins leave that unspecified).
    *
    * Spark has no native as-of join; the composition below is the
    * scale-right distributed formulation: union both sides, ONE window
    * per key ordered by (ts, side, id) carrying the last-seen right row
    * forward — a single shuffle on the key columns, no per-row range
    * probe, no range-condition join (which Spark would plan as a
    * broadcast-nested-loop). O(n log n) in each partition's row count,
    * streams at 100 TB exactly like sessionization.
    *
    * `right` must carry `on` ++ (rightTs, rightId); matched right columns
    * come back as `<rightId>_asof`, `<rightTs>_asof` (NULL when no right
    * row precedes the left row).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String, rightId: String): DataFrame = {
    // the composition stages rows through internal __-prefixed columns; an
    // input already using one would be silently clobbered
    val reserved = Set("__ts", "__side", "__ord", "__r", "__left", "__m")
    val clashes = (left.columns ++ right.columns).filter(reserved)
    require(clashes.isEmpty,
      s"asOfJoin inputs must not contain reserved columns: ${clashes.mkString(", ")}")
    val keyCols = on.map(col)
    val rStruct = struct(col(rightTs).as("ts"), col(rightId).as("id"))
    // side 0 = right, 1 = left: at an equal timestamp the right row sorts
    // first, so "at or before" includes the same instant
    val r = right.select(keyCols :+ col(rightTs).as("__ts") :+
      rStruct.as("__r") :+ col(rightId).as("__ord"): _*)
      .withColumn("__side", lit(0))
      .withColumn("__left", lit(null).cast(left.schema))
    val l = left
      .withColumn("__left", struct(left.columns.map(col): _*))
      .select(keyCols :+ col(leftTs).as("__ts") :+
        lit(null).cast(r.schema("__r").dataType).as("__r") :+
        // typed to the right side's id so the union doesn't fail (string
        // ids) or silently widen (decimal ids); the value itself only
        // orders left rows among themselves, which is irrelevant
        lit(null).cast(right.schema(rightId).dataType).as("__ord") :+
        lit(1).as("__side") :+ col("__left"): _*)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__ord").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__left.*") +:
        Seq(col("__m.id").as(s"${rightId}_asof"),
          col("__m.ts").as(s"${rightTs}_asof")): _*)
  }

  /** R9: as-of join query — every purchase matched to the same user's
    * latest click at or before it, with the gap in microseconds.
    */
  def purchaseAsOfClick(spark: SparkSession, dir: String): DataFrame = {
    val purchases = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_ts_us"))
    val clicks = Tables.events(spark, dir)
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
    asOfJoin(purchases, clicks, Seq("user_id"), "purchase_ts_us", "ts_us", "event_id")
      .select(col("purchase_id"), col("user_id"), col("purchase_ts_us"),
        col("event_id_asof").as("click_id"),
        col("ts_us_asof").as("click_ts_us"),
        (col("purchase_ts_us") - col("ts_us_asof")).as("gap_us"))
  }

  /** R16: interval (range) join via time bucketing. Catalyst plans a bare
    * `l.ts BETWEEN r.start AND r.end` as BroadcastNestedLoopJoin — O(|L|·|R|)
    * work however small the true match set, the classic range-join
    * scale-killer. Bucketing restores an equi-join: each interval explodes
    * into the fixed-width time buckets it overlaps (bounded fan-out =
    * ⌈len/bucket⌉+1 rows), probes join on their single bucket, and the exact
    * half-open predicate filters the candidates. Work is O(|L| + Σ len_i/w +
    * matches), the shuffle is an ordinary hash exchange AQE can skew-split
    * on hot buckets, and the small exploded side stays broadcast-eligible.
    * (Databricks' range-join optimization and Flink's interval join use the
    * same binning idea.)
    *
    * Join membership uses the exact timestamps — bucketing only routes; a
    * probe's truncated-seconds bucket always lies within the interval's
    * [start, end] truncated bucket range, so routing is lossless.
    */
  def intervalJoin(left: DataFrame, leftTs: String, right: DataFrame,
      startCol: String, endCol: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive: $bucketSeconds")
    val reserved = Set("__bucket")
    val clashes = (left.columns ++ right.columns).filter(reserved)
    require(clashes.isEmpty,
      s"intervalJoin inputs must not contain reserved columns: ${clashes.mkString(", ")}")
    def bucketOf(c: Column) = floor(unix_timestamp(c) / bucketSeconds).cast("long")
    val r = right.withColumn("__bucket",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    val l = left.withColumn("__bucket", bucketOf(col(leftTs)))
    l.join(r, Seq("__bucket"))
      .filter(col(leftTs) >= col(startCol) && col(leftTs) < col(endCol))
      .drop("__bucket")
  }

  /** R16 query: error-incident windows — every `error` event opens a
    * 30-minute window; count the events and distinct users falling inside
    * each. The alerting/attribution join every event pipeline runs.
    */
  def eventsIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val wins = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("win_id"), col("ts").as("win_start"),
        (col("ts") + expr("INTERVAL 1800 SECONDS")).as("win_end"))
    val probe = ev.select(col("user_id"), col("ts"))
    intervalJoin(probe, "ts", wins, "win_start", "win_end", bucketSeconds = 1800L)
      .groupBy(col("win_id"))
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"))
  }

  val eventsIntervalJoinSql: String =
    """SELECT r.event_id AS win_id, count(*) AS n_events,
      |  count(DISTINCT e.user_id) AS n_users
      |FROM (SELECT event_id, ts FROM events WHERE event_type = 'error') r
      |JOIN events e ON e.ts >= r.ts AND e.ts < r.ts + INTERVAL 1800 SECOND
      |GROUP BY 1""".stripMargin

  /** R17: pivot — long-to-wide reshaping (`GROUP BY cohort` × explicit
    * event-type columns). With the pivot values listed explicitly Spark
    * skips the extra distinct-values job and plans ONE map-side-combined
    * aggregate whose projections are codegen'd case-whens — same shuffle
    * cost as a plain groupBy, however many output columns. (Leaving the
    * value list implicit adds a full extra scan+distinct at 100 TB.)
    */
  def eventsPivot(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(floor(col("user_id") / 10).as("cohort"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(round(sum(col("value")), 4))
  }

  val eventsPivotSql: String =
    """SELECT CAST(FLOOR(user_id / 10) AS BIGINT) AS cohort,
      |  round(sum(CASE WHEN event_type = 'click' THEN value END), 4) AS click,
      |  round(sum(CASE WHEN event_type = 'error' THEN value END), 4) AS error,
      |  round(sum(CASE WHEN event_type = 'purchase' THEN value END), 4) AS purchase,
      |  round(sum(CASE WHEN event_type = 'signup' THEN value END), 4) AS signup,
      |  round(sum(CASE WHEN event_type = 'view' THEN value END), 4) AS view
      |FROM events GROUP BY 1""".stripMargin

  /** R18: global quantile bucketing WITHOUT a single-partition window.
    * `ntile(10) OVER (ORDER BY total)` is the textbook spelling and a
    * scale-killer: an unpartitioned window sorts the whole table in ONE
    * task. Instead: exact decile cut points from one `percentile` aggregate
    * (a scalar row), then each user buckets by comparing against the
    * broadcast cut array — two map-side-combined aggregates and zero
    * global sorts. Boundary semantics are cut-point comparison (documented,
    * mirrored exactly in the oracle), not ntile's equal-count split; totals
    * and cuts round to 4dp first so the FP summation-order ulp can't flip
    * a boundary user between engines.
    */
  def userSpendDeciles(spark: SparkSession, dir: String): DataFrame = {
    val totals = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(round(sum(col("value")), 4).as("total"))
    val cuts = totals.agg(
      percentile(col("total"), lit((1 to 9).map(_ / 10.0).toArray)).as("cuts"))
    // decile = 1 + #cuts at-or-below total: cross-join the one-row cut
    // array (broadcast by construction) and count with a codegen'd filter
    val bucketed = totals.crossJoin(broadcast(cuts))
      .select(col("user_id"), col("total"),
        (lit(1) + size(filter(col("cuts"),
          c => round(c, 4) <= col("total")))).cast("long").as("decile"))
    bucketed.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"),
        round(sum(col("total")), 4).as("sum_total"),
        round(min(col("total")), 4).as("min_total"),
        round(max(col("total")), 4).as("max_total"))
  }

  val userSpendDecilesSql: String =
    """WITH totals AS MATERIALIZED (
      |  SELECT user_id, round(sum(value), 4) AS total FROM events GROUP BY 1),
      |cutrow AS (
      |  SELECT [round(quantile_cont(total, 0.1), 4), round(quantile_cont(total, 0.2), 4),
      |    round(quantile_cont(total, 0.3), 4), round(quantile_cont(total, 0.4), 4),
      |    round(quantile_cont(total, 0.5), 4), round(quantile_cont(total, 0.6), 4),
      |    round(quantile_cont(total, 0.7), 4), round(quantile_cont(total, 0.8), 4),
      |    round(quantile_cont(total, 0.9), 4)] AS cs FROM totals),
      |cuts AS MATERIALIZED (SELECT unnest(cs) AS cut FROM cutrow),
      |buck AS (
      |  SELECT t.user_id, t.total,
      |    1 + (SELECT count(*) FROM cuts c WHERE c.cut <= t.total) AS decile
      |  FROM totals t)
      |SELECT decile, count(*) AS n_users, round(sum(total), 4) AS sum_total,
      |  round(min(total), 4) AS min_total, round(max(total), 4) AS max_total
      |FROM buck GROUP BY 1""".stripMargin

  /** R19: item-affinity (market-basket lift) — for each part, the top-3
    * co-purchased partners by lift = P(a,b)/(P(a)·P(b)) over orders,
    * minimum support 2 co-orders. The association-mining staple
    * (Agrawal & Srikant 1994's support/lift vocabulary) and the
    * "customers also bought" primitive.
    *
    * Scale shape: the pair generation is a per-order self-join whose
    * fan-out is quadratic in ORDER SIZE, not corpus size — TPC-H orders
    * hold ≤ 7 parts (real pipelines cap basket width first); the pair
    * aggregate shuffles on the canonical (a < b) pair key with map-side
    * combine, per-part order counts ride in via an AQE-decided join, and
    * the scalar order total is one broadcast literal. Lift is a single
    * integer-ratio division rounded to 6dp — no summation-order
    * sensitivity — and the per-part top-3 is one window on the (already
    * small) supported-pair set.
    */
  def partAffinity(spark: SparkSession, dir: String, minSupport: Long = 2L,
      topK: Int = 3): DataFrame = {
    // four consumers (order count, part counts, both pair-join sides) —
    // materialize the distinct (order, part) set once
    val op = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").cast("long").as("p"))
      .distinct()
      .localCheckpoint(true)
    val nOrders = op.select(col("o")).distinct().count()
    val partCounts = op.groupBy(col("p")).agg(count(lit(1)).as("n_p"))
    val pairs = op.as("a").join(op.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minSupport)
    // both directions so every part ranks its partners
    val sym = pairs.unionByName(pairs.select(col("pb").as("pa"),
      col("pa").as("pb"), col("n_both")))
    val w = Window.partitionBy(col("part"))
      .orderBy(col("lift").desc, col("partner").asc)
    sym.join(partCounts.select(col("p").as("pa"), col("n_p").as("na")), "pa")
      .join(partCounts.select(col("p").as("pb"), col("n_p").as("nb")), "pb")
      .select(col("pa").as("part"), col("pb").as("partner"), col("n_both"),
        // n_both enters the multiply as double (the oracle's `* 1.0`
        // promotion): long n_both * nOrders can overflow Int64 at very
        // large SF before Divide's implicit cast would have saved it
        round(col("n_both").cast("double") * lit(nOrders.toDouble) /
          (col("na").cast("double") * col("nb")), 6).as("lift"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }

  val partAffinitySql: String =
    """WITH op AS MATERIALIZED (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey::BIGINT AS p FROM lineitem),
      |n_orders AS (SELECT count(DISTINCT o) AS n FROM op),
      |pc AS MATERIALIZED (SELECT p, count(*) AS n_p FROM op GROUP BY 1),
      |pairs AS MATERIALIZED (
      |  SELECT a.p AS pa, b.p AS pb, count(*) AS n_both
      |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |sym AS (
      |  SELECT pa, pb, n_both FROM pairs
      |  UNION ALL SELECT pb, pa, n_both FROM pairs),
      |scored AS (
      |  SELECT s.pa AS part, s.pb AS partner, s.n_both,
      |    round(s.n_both * (SELECT n FROM n_orders) * 1.0
      |      / (x.n_p * y.n_p), 6) AS lift
      |  FROM sym s JOIN pc x ON s.pa = x.p JOIN pc y ON s.pb = y.p)
      |SELECT part, partner, n_both, lift, rank FROM (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY part
      |    ORDER BY lift DESC, partner ASC) AS BIGINT) AS rank
      |  FROM scored) WHERE rank <= 3""".stripMargin

  /** R10: semi-structured extraction — parse the `props` JSON column and
    * aggregate over an extracted field. The JSON parse itself can't push to
    * the parquet scan, but column pruning does (ReadSchema keeps only the 4
    * referenced columns), and the parse runs inside whole-stage codegen
    * (`get_json_object` is a codegen'd native expression — Jackson parse per
    * row, no UDF). One shuffle: the map-side-combined aggregate.
    *
    * `floor(k/10)` (not integer cast) keeps bucket semantics identical in
    * both engines — Spark's double→long cast truncates while DuckDB's
    * rounds half-even.
    */
  def eventsJson(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .select(col("event_type"), col("value"), col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k").isNotNull)
      .groupBy(col("event_type"), floor(col("k") / 10).as("k_bucket"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value")), 4).as("sum_value"),
        count_distinct(col("user_id")).as("n_users"),
        max(col("k")).as("max_k"))
  }

  val eventsJsonSql: String =
    """SELECT event_type,
      |  CAST(floor(CAST(json_extract(props, '$.k') AS BIGINT) / 10) AS BIGINT) AS k_bucket,
      |  count(*) AS n,
      |  round(sum(value), 4) AS sum_value,
      |  count(DISTINCT user_id) AS n_users,
      |  max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
      |FROM events
      |WHERE json_extract(props, '$.k') IS NOT NULL
      |GROUP BY 1, 2""".stripMargin

  /** R12: rolling window frame — per-user moving average of `value` over
    * the last 5 events (4 preceding + current, event-time order with
    * event_id tie-break). One shuffle on user_id; the frame aggregate is a
    * running window inside whole-stage codegen. The per-entity rolling
    * feature is the standard feature-engineering shape for training-data
    * pipelines.
    */
  def eventsMovingAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-4, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("ma5", round(avg(col("value")).over(w), 6))
      .withColumn("n_window", count(lit(1)).over(w))
      .select(col("event_id"), col("user_id"), col("ma5"), col("n_window"))
  }

  val eventsMovingAvgSql: String =
    """SELECT event_id, user_id,
      |  round(avg(value) OVER w, 6) AS ma5,
      |  count(*) OVER w AS n_window
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""".stripMargin

  /** R11: OLAP rollup — subtotal lattice over (event_type, hour) with a
    * grouping id distinguishing the aggregation levels. Spark expands the
    * rollup into a single Expand + hash-aggregate (one shuffle, map-side
    * combined, no per-level re-scan); the oracle is DuckDB's GROUP BY
    * ROLLUP with GROUPING() — both engines put the leftmost rollup column
    * in the most significant gid bit.
    */
  def eventsRollup(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .select(col("event_type"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour"),
        col("value"))
      .rollup(col("event_type"), col("hour"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n"),
        round(sum(col("value")), 4).as("sum_value"))
  }

  val eventsRollupSql: String =
    """SELECT event_type,
      |  CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour,
      |  CAST(GROUPING(event_type, date_trunc('hour', ts)) AS BIGINT) AS gid,
      |  count(*) AS n,
      |  round(sum(value), 4) AS sum_value
      |FROM events
      |GROUP BY ROLLUP (event_type, date_trunc('hour', ts))""".stripMargin

  /** R13: staged conversion funnel over events — per user, the first view,
    * the first click at-or-after that view, and the first purchase
    * at-or-after that click, all in event-sequence order (ts, event_id);
    * reports per-stage user counts and mean stage-transition times.
    *
    * Everything happens on ONE shuffle of events by user_id: running-min
    * windows compute stage reachability in sequence order (a click only
    * qualifies once a view precedes it in the same user's ordered stream),
    * then the per-user aggregate and the final single-row rollup reuse the
    * same partitioning. No self-joins of the event table — the naive
    * formulation joins events to itself once per stage, which at 100 TB is
    * two extra fact-to-fact shuffles.
    */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
    val staged = ev
      // earliest view at-or-before this row (sequence order)
      .withColumn("t1r",
        min(when(col("event_type") === "view", col("ts_us"))).over(byUser))
      // clicks that already saw a view
      .withColumn("t2c",
        when(col("event_type") === "click" && col("t1r").isNotNull, col("ts_us")))
      .withColumn("t2r", min(col("t2c")).over(byUser))
      // purchases that already saw a qualified click
      .withColumn("t3c",
        when(col("event_type") === "purchase" && col("t2r").isNotNull, col("ts_us")))
    staged.groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts_us"))).as("t1"),
        min(col("t2c")).as("t2"),
        min(col("t3c")).as("t3"))
      .agg(
        count(col("t1")).as("users_view"),
        count(col("t2")).as("users_click"),
        count(col("t3")).as("users_purchase"),
        round(avg(col("t2") - col("t1")) / 1e6, 4).as("avg_view_to_click_sec"),
        round(avg(col("t3") - col("t2")) / 1e6, 4).as("avg_click_to_purchase_sec"))
  }

  val eventsFunnelSql: String =
    """WITH staged AS (
      |  SELECT user_id, event_type, event_id, ts_us,
      |    min(CASE WHEN event_type = 'view' THEN ts_us END) OVER w AS t1r,
      |    CASE WHEN event_type = 'click' AND
      |      min(CASE WHEN event_type = 'view' THEN ts_us END) OVER w IS NOT NULL
      |      THEN ts_us END AS t2c
      |  FROM (SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us FROM events)
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |), staged2 AS (
      |  SELECT *,
      |    CASE WHEN event_type = 'purchase' AND
      |      min(t2c) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) IS NOT NULL
      |      THEN ts_us END AS t3c
      |  FROM (SELECT user_id, event_type, event_id, ts_us, t2c FROM staged)
      |), per_user AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN ts_us END) AS t1,
      |    min(t2c) AS t2,
      |    min(t3c) AS t3
      |  FROM staged2 GROUP BY user_id
      |)
      |SELECT count(t1) AS users_view, count(t2) AS users_click,
      |  count(t3) AS users_purchase,
      |  round(avg(t2 - t1) / 1e6, 4) AS avg_view_to_click_sec,
      |  round(avg(t3 - t2) / 1e6, 4) AS avg_click_to_purchase_sec
      |FROM per_user""".stripMargin

  /** R14: cohort retention — users grouped by first-activity day, counted
    * on each later active day offset. The canonical product/growth
    * analysis and, shape-wise, the "activity matrix" of any longitudinal
    * training corpus (documents per crawl cohort per snapshot).
    *
    * No self-join of the activity table: the per-user cohort day is a
    * window min over the deduped (user, day) rows, so the plan is
    * distinct → user_id window → final rollup — three map-side-combined
    * exchanges of strictly shrinking width, vs the naive first-day-table
    * join that shuffles the activity rows twice and materializes a
    * per-user side table.
    */
  def eventsRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("d"))
      .distinct()
    val cohort = min(col("d")).over(Window.partitionBy(col("user_id")))
    ev.select(col("user_id"), col("d"), cohort.as("cohort_d"))
      // rows are distinct per (user, day) ⇒ plain count = distinct users
      .groupBy(col("cohort_d"), (col("d") - col("cohort_d")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  val eventsRetentionSql: String =
    """WITH ev AS (
      |  SELECT DISTINCT user_id,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS d
      |  FROM events
      |), c AS (
      |  SELECT user_id, d, min(d) OVER (PARTITION BY user_id) AS cohort_d
      |  FROM ev
      |)
      |SELECT cohort_d, d - cohort_d AS day_offset,
      |  count(*) AS n_users
      |FROM c GROUP BY 1, 2""".stripMargin

  val asOfSql: String =
    """WITH u AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, 0 AS side
      |  FROM events WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, 1 AS side
      |  FROM events WHERE event_type = 'purchase'
      |), w AS (
      |  SELECT *,
      |    last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
      |      OVER win AS click_id,
      |    last_value(CASE WHEN side = 0 THEN ts_us END IGNORE NULLS)
      |      OVER win AS click_ts_us
      |  FROM u
      |  WINDOW win AS (PARTITION BY user_id
      |    ORDER BY ts_us ASC, side ASC, CASE WHEN side = 0 THEN event_id ELSE 0 END ASC
      |    ROWS UNBOUNDED PRECEDING)
      |)
      |SELECT event_id AS purchase_id, user_id, ts_us AS purchase_ts_us,
      |  click_id, click_ts_us, ts_us - click_ts_us AS gap_us
      |FROM w WHERE side = 1""".stripMargin

  /** R20, TPC-H Q22 style: per-nation count and balance of above-average
    * customers who have never placed an URGENT-priority order — the
    * anti-join + scalar subquery shape (NOT EXISTS) none of the other
    * relational ops cover. (The synthetic generator gives every customer
    * at least one order, so Q22's literal no-orders-at-all predicate is
    * empty at every SF; the priority restriction keeps the plan shape
    * identical and the result non-trivial.)
    *
    * The scalar threshold is ONE map-side-combined aggregate joined back
    * as a broadcast literal (a 1-row cross join — never a driver-side
    * collect), and the no-orders test is a left ANTI join on o_custkey:
    * the orders side is projected to its single join column before the
    * exchange, AQE picks hash-vs-broadcast by the filtered customer side's
    * runtime size. At 100 TB both sides shuffle on custkey — the same
    * co-partitioned exchange Q18's join already pays, with anti semantics
    * instead of inner. Threshold rounded to 4dp on both engines so
    * summation-order ulp can't flip a boundary customer.
    */
  def q22NoOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val thr = cust.filter(col("c_acctbal") > 0.0)
      .agg(round(avg(col("c_acctbal")), 4).as("thr"))
    cust.join(broadcast(thr))
      .filter(col("c_acctbal") > col("thr"))
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").cast("long").as("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"),
        round(sum(col("c_acctbal")), 4).as("total_bal"))
  }

  val q22Sql: String =
    """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
      |  count(*) AS n_cust,
      |  round(sum(c_acctbal), 4) AS total_bal
      |FROM customer
      |WHERE c_acctbal > (SELECT round(avg(c_acctbal), 4)
      |                   FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT')
      |GROUP BY 1""".stripMargin

  /** R21: TPC-H Q7-style volume shipping — bilateral trade between two
    * nations by ship year (Q7 adapted to the generated nation domain,
    * same workload family as Q1/Q3/Q5 above). The nation
    * dimension joins twice under two roles (supplier side / customer
    * side) — both broadcast (25 rows at any SF); the fact-side joins
    * shuffle on their keys and the date predicate pushes into the
    * lineitem scan.
    */
  def q7VolumeShipping(spark: SparkSession, dir: String,
      nationA: String = "NATION_1", nationB: String = "NATION_2"): DataFrame = {
    val n1 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") <= lit("1997-12-31").cast("timestamp"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .filter((col("supp_nation") === nationA && col("cust_nation") === nationB) ||
        (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("revenue"))
  }

  def q7Sql(nationA: String = "NATION_1", nationB: String = "NATION_2"): String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |  CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |WHERE l_shipdate BETWEEN '1996-01-01' AND '1997-12-31'
       |  AND ((n1.n_name = '$nationA' AND n2.n_name = '$nationB')
       |    OR (n1.n_name = '$nationB' AND n2.n_name = '$nationA'))
       |GROUP BY 1, 2, 3""".stripMargin

  /** R22: TPC-H Q10-style returned-item report — top 20 customers by
    * revenue lost to returns in one quarter, deterministic tie-break on
    * custkey. The revenue aggregate shuffles on custkey; the top-20 is a
    * global sort of the (already small) aggregate, not of the fact table.
    */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-04-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  val q10Sql: String =
    """SELECT c_custkey, c_name, c_acctbal, n_name,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
      |GROUP BY 1, 2, 3, 4
      |ORDER BY revenue DESC, c_custkey ASC
      |LIMIT 20""".stripMargin

  /** R23: TPC-H Q16-style supplier-count by part attribute — distinct
    * suppliers able to furnish each qualifying (brand, type, size), with
    * the part-supplier relation derived from lineitem (the generated
    * schema has no partsupp table). Attribute predicates push into the
    * part scan; the distinct-count is the standard two-phase aggregate on
    * the (attrs, suppkey) key.
    */
  def q16SupplierCnt(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#1" &&
        !col("p_type").startsWith("PROMO") &&
        col("p_size").isin(1, 2, 3, 4, 5))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(parts, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"),
        col("p_size").cast("long").as("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  val q16Sql: String =
    """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1'
      |  AND p_type NOT LIKE 'PROMO%'
      |  AND p_size IN (1, 2, 3, 4, 5)
      |GROUP BY 1, 2, 3""".stripMargin

  /** R24: TPC-H Q4-style order-priority checking — count orders per
    * priority that have at least one LATE lineitem (shipped >60 days after
    * the order date; the generated schema has no commit/receipt dates, so
    * lateness is ship-lag — the plan shape is Q4's: a date-windowed orders
    * scan SEMI-joined against lineitem on a correlated predicate that
    * references both sides, then a tiny 5-row aggregate). The semi-join
    * shuffles on orderkey; lineitem is never widened (EXISTS, not a join
    * multiplying rows — double-counting an order with two late lines is
    * the classic Q4 bug the semi-join shape exists to avoid).
    */
  def q4PriorityCheck(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_shipdate")),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY 1""".stripMargin

  /** R25: TPC-H Q12-style shipping-priority split — per lineitem status,
    * how many LATE-shipped lines belonged to high- vs low-priority orders
    * (Q12's conditional CASE aggregate; ship-lag stands in for the
    * receipt/commit lag, and l_linestatus for l_shipmode, neither of which
    * the generated schema carries). One fact⋈fact join on orderkey, then
    * two conditional sums folding map-side — the CASE never materializes
    * an intermediate column.
    */
  def q12ShipPriority(spark: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(col("l_linestatus"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
  }

  val q12Sql: String =
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
      |  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      |GROUP BY 1""".stripMargin

  /** R26: TPC-H Q14-style promotion effect — the share of one month's
    * revenue from PROMO-type parts, as a single scalar ratio (Q14's
    * conditional-numerator/total-denominator shape in ONE aggregate pass:
    * the CASE picks the numerator, the denominator is the plain sum —
    * never two scans). The month predicate pushes into the lineitem scan;
    * part is the broadcast side of the join.
    */
  def q14PromoEffect(spark: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .join(broadcast(Tables.part(spark, dir)
          .select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(round(lit(100.0) *
          sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))) /
          sum(rev), 6).as("promo_revenue"))
  }

  val q14Sql: String =
    """SELECT round(100.0 *
      |    sum(CASE WHEN p_type = 'PROMO'
      |        THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END) /
      |    sum(l_extendedprice * (1.0 - l_discount)), 6) AS promo_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= '1996-03-01' AND l_shipdate < '1996-04-01'""".stripMargin

  /** R27: TPC-H Q19-style disjunctive predicate revenue — revenue over an
    * OR of three (brand, size-range, quantity-range) conjunctions (Q19's
    * signature shape: a disjunction spanning BOTH join sides that naive
    * planners evaluate post-join; the per-side conjuncts each predicate
    * shares — p_size ≥ 1, l_quantity ≥ 1 — still push into the scans, and
    * the disjunction itself runs inside the join's codegen stage, not as a
    * post-join filter over a wider intermediate).
    */
  def q19DisjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val arm = (brand: String, sizeHi: Int, qLo: Double, qHi: Double) =>
      col("p_brand") === brand &&
        col("p_size").between(1, sizeHi) &&
        col("l_quantity").between(qLo, qHi)
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .join(broadcast(Tables.part(spark, dir)
          .select(col("p_partkey"), col("p_brand"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .filter(arm("Brand#1", 5, 1.0, 11.0) ||
        arm("Brand#2", 10, 10.0, 20.0) ||
        arm("Brand#3", 15, 20.0, 30.0))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("revenue"))
  }

  val q19Sql: String =
    """SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** R28: TPC-H Q20-style excess-share suppliers — suppliers that shipped
    * MORE THAN 2.5× the average per-supplier quantity of some PROMO part
    * (Q20's nested semi-join shape: supplier ← semi ← a per-(part,supplier)
    * aggregate compared against a correlated per-part threshold; the
    * generated schema has no partsupp/availqty, so "shipped > 2.5× the
    * part's per-supplier average" stands in for "availqty > half the
    * part's demand" — and unlike an absolute share cut it stays non-empty
    * at every SF, since the threshold scales with the supplier fan-out).
    * Both aggregates shuffle on partkey and join co-partitioned; supplier
    * only ever semi-joins a (small) qualifying-suppkey set. Quantities
    * are integer-valued doubles, so the sums are exact and the threshold
    * comparison is engine-order-independent.
    */
  def q20ExcessShare(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_partkey"),
      col("l_suppkey"), col("l_quantity"))
    val perSupp = li.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("qty"))
    val thr = li.groupBy(col("l_partkey"))
      .agg((lit(2.5) * sum(col("l_quantity")) /
        countDistinct(col("l_suppkey"))).as("thr"))
    val qualifying = perSupp
      .join(thr, Seq("l_partkey"))
      .join(broadcast(Tables.part(spark, dir)
          .filter(col("p_type") === "PROMO").select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .filter(col("qty") > col("thr"))
      .select(col("l_suppkey"))
    Tables.supplier(spark, dir)
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
  }

  val q20Sql: String =
    """SELECT s_suppkey, s_name
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT ps.l_suppkey
      |  FROM (SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      |        FROM lineitem GROUP BY 1, 2) ps
      |  JOIN (SELECT l_partkey,
      |          2.5 * sum(l_quantity) / count(DISTINCT l_suppkey) AS thr
      |        FROM lineitem GROUP BY 1) tot ON ps.l_partkey = tot.l_partkey
      |  WHERE ps.l_partkey IN (SELECT p_partkey FROM part
      |                         WHERE p_type = 'PROMO')
      |    AND ps.qty > tot.thr)""".stripMargin

  /** R29: TPC-H Q2-style minimum-cost supplier — for each small part, the
    * supplier(s) of minimum account balance among those that actually
    * shipped it (Q2's correlated-scalar-min shape: the per-part min is a
    * co-partitioned aggregate joined back on (part, min-value) equality —
    * never a per-row subquery; the part-supplier relation derives from
    * lineitem as in R23). Ties keep all minimal suppliers, exactly as
    * Q2's `= (SELECT min …)` does.
    */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val ps = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(Tables.part(spark, dir)
          .filter(col("p_size") <= 3).select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .join(Tables.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey"))
    val best = ps.groupBy(col("l_partkey").as("bp"))
      .agg(min(col("s_acctbal")).as("min_bal"))
    ps.join(best, col("l_partkey") === col("bp") &&
        col("s_acctbal") === col("min_bal"))
      .select(col("l_partkey").as("p_partkey"), col("s_suppkey"),
        col("s_name"), col("s_acctbal"))
  }

  val q2Sql: String =
    """WITH ps AS (
      |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 3)
      |)
      |SELECT ps.l_partkey AS p_partkey, s_suppkey, s_name, s_acctbal
      |FROM ps JOIN supplier ON l_suppkey = s_suppkey
      |WHERE s_acctbal = (
      |  SELECT min(s2.s_acctbal)
      |  FROM ps ps2 JOIN supplier s2 ON ps2.l_suppkey = s2.s_suppkey
      |  WHERE ps2.l_partkey = ps.l_partkey)""".stripMargin

  /** R30: TPC-H Q8-style national market share — per order year, the
    * fraction of PROMO-part revenue into one customer region that was
    * supplied from one nation (Q8's two-role nation dim + conditional
    * share in ONE aggregate, the q14 numerator/denominator shape). The
    * part/nation/region dims broadcast; the fact chain shuffles once per
    * non-broadcast join key, and the final per-year aggregate is 7 rows.
    */
  def q8MarketShare(spark: SparkSession, dir: String,
      suppNation: String = "NATION_1", custRegion: String = "ASIA"): DataFrame = {
    val n1 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("n1_key"), col("n_regionkey"))
    val n2 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("supp_nation"))
    val region = Tables.region(spark, dir).filter(col("r_name") === custRegion)
    val promo = Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO").select(col("p_partkey"))
    val volume = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .join(broadcast(promo), col("l_partkey") === col("p_partkey"), "left_semi")
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("c_nationkey") === col("n1_key"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"), "left_semi")
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n2), col("s_nationkey") === col("n2_key"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === suppNation, volume).otherwise(lit(0.0))) /
          sum(volume), 6).as("mkt_share"))
  }

  def q8Sql(suppNation: String = "NATION_1", custRegion: String = "ASIA"): String =
    s"""SELECT o_year,
       |  round(sum(CASE WHEN supp_nation = '$suppNation' THEN volume ELSE 0 END)
       |    / sum(volume), 6) AS mkt_share
       |FROM (
       |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |    l_extendedprice * (1.0 - l_discount) AS volume,
       |    n2.n_name AS supp_nation
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
       |  JOIN region ON n1.n_regionkey = r_regionkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
       |  WHERE r_name = '$custRegion'
       |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
       |) GROUP BY o_year""".stripMargin

  /** R31: TPC-H Q9-style product-type profit — profit by supplier nation
    * and order year for parts matching a name substring, with the supply
    * cost modeled as 0.6·p_retailprice (the generated schema has no
    * partsupp/ps_supplycost; the 0.6 factor mirrors TPC-H's own
    * retail-markup relation, keeping amounts positive-and-negative like
    * real Q9). The LIKE predicate pushes into the part scan; part then
    * broadcasts its (key, retailprice) projection into the fact chain.
    */
  def q9ProductProfit(spark: SparkSession, dir: String,
      nameLike: String = "red"): DataFrame = {
    val parts = Tables.part(spark, dir)
      .filter(col("p_name").contains(nameLike))
      .select(col("p_partkey"), col("p_retailprice"))
    val amount = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
      lit(0.6) * col("p_retailprice") * col("l_quantity")
    Tables.lineitem(spark, dir)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(round(sum(amount), 4).as("sum_profit"))
  }

  def q9Sql(nameLike: String = "red"): String =
    s"""SELECT n_name AS nation,
       |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |  round(sum(l_extendedprice * (1.0 - l_discount)
       |    - 0.6 * p_retailprice * l_quantity), 4) AS sum_profit
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE p_name LIKE '%$nameLike%'
       |GROUP BY 1, 2""".stripMargin

  /** R32: TPC-H Q11-style important-part value — per-part inventory value
    * from one nation's suppliers, keeping parts above a fraction of the
    * nation's total (Q11's group-sum-vs-global-scalar-subquery shape: one
    * grouped aggregate reused by both sides, the scalar total broadcast
    * back as a cross join). Values accumulate in exact DECIMAL — price
    * has 2 fixed decimals and quantity is integral, so the threshold
    * comparison `value·1000 > total` is integer-exact in both engines
    * (a double sum's partition order could flip a borderline part).
    */
  def q11ImportantParts(spark: SparkSession, dir: String,
      nation: String = "NATION_1"): DataFrame = {
    val natSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .filter(col("n_name") === nation).select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"), "left_semi")
      .select(col("s_suppkey"))
    val pv = Tables.lineitem(spark, dir)
      .join(natSupp, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
        col("l_quantity").cast("decimal(4,0)")).as("value_exact"))
    pv.join(broadcast(pv.agg(sum(col("value_exact")).as("total"))))
      .filter(col("value_exact") * lit(1000) > col("total"))
      .select(col("l_partkey"),
        round(col("value_exact").cast("double"), 4).as("value"))
  }

  def q11Sql(nation: String = "NATION_1"): String =
    s"""WITH pv AS (
       |  SELECT l_partkey,
       |    sum(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * CAST(l_quantity AS DECIMAL(4,0))) AS value_exact
       |  FROM lineitem
       |  WHERE l_suppkey IN (
       |    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
       |    WHERE n_name = '$nation')
       |  GROUP BY l_partkey
       |)
       |SELECT l_partkey, round(CAST(value_exact AS DOUBLE), 4) AS value
       |FROM pv
       |WHERE value_exact * 1000 > (SELECT sum(value_exact) FROM pv)""".stripMargin

  /** R33: TPC-H Q13-style customer order-count distribution — how many
    * customers placed exactly N qualifying orders, INCLUDING the
    * zero-order customers Q13 exists to count (hence the LEFT join with
    * the order filter in the join condition, not a WHERE — a WHERE would
    * silently drop the NULL rows back out). The priority exclusion stands
    * in for Q13's comment NOT LIKE (no o_comment in the generated
    * schema). Two aggregates: per-customer count shuffles on custkey, the
    * distribution is over ≤ max-orders-per-customer rows.
    */
  def q13CustDistribution(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).select(col("c_custkey"))
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
          .select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  val q13Sql: String =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM (
      |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      |  FROM customer
      |  LEFT JOIN orders ON c_custkey = o_custkey
      |    AND o_orderpriority <> '4-NOT SPECIFIED'
      |  GROUP BY c_custkey
      |) GROUP BY c_count""".stripMargin

  /** R34: TPC-H Q15-style top supplier — suppliers whose quarterly revenue
    * equals the maximum (Q15's view-then-max-equality shape; ties all
    * kept). The per-supplier aggregate rounds to 4 dp BEFORE the max /
    * equality so the comparison is on the same stable values in both
    * engines; the max is a 1-row broadcast back onto the ≤|supplier|-row
    * aggregate, never onto the fact table.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("total_revenue"))
    rev.join(broadcast(rev.agg(max(col("total_revenue")).as("max_rev"))))
      .filter(col("total_revenue") === col("max_rev"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  val q15Sql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
      |  GROUP BY l_suppkey
      |)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN rev ON s_suppkey = l_suppkey
      |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""".stripMargin

  /** R35: TPC-H Q17-style small-quantity revenue — average yearly revenue
    * lost if small-quantity orders (below half the part's mean quantity)
    * for one brand went unshipped. Q17's correlated per-part AVG becomes
    * one grouped aggregate joined back to the brand's lineitems; the
    * brand semi-join prunes BOTH sides of that self-join before any
    * aggregation, so the heavy path scans the brand's ~3% of the fact
    * table twice, never all of it. The threshold compare is deterministic
    * across engines: integral quantities sum exactly in doubles and the
    * divide/multiply are single IEEE ops.
    */
  def q17SmallQtyRevenue(spark: SparkSession, dir: String,
      brand: String = "Brand#1"): DataFrame = {
    val brandParts = Tables.part(spark, dir)
      .filter(col("p_brand") === brand).select(col("p_partkey"))
    val brandLines = Tables.lineitem(spark, dir)
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"), "left_semi")
    val partAvg = brandLines.groupBy(col("l_partkey").as("ap"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    brandLines
      .join(broadcast(partAvg), col("l_partkey") === col("ap"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 4).as("avg_yearly"))
  }

  def q17Sql(brand: String = "Brand#1"): String =
    s"""SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
       |FROM lineitem
       |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = '$brand')
       |  AND l_quantity < (
       |    SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
       |    WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin

  /** R36: TPC-H Q21-style waiting-supplier report — suppliers from one
    * nation who were the ONLY late shipper in a finished multi-supplier
    * order (ship-lag > 60 days stands in for receipt>commit, as in
    * q4/q12). Q21's EXISTS/NOT-EXISTS pair over the same fact table
    * becomes a semi-join (some other supplier shipped in the order) and
    * an anti-join (no OTHER supplier shipped late) — both shuffle on
    * orderkey, the same key the driving join already clustered, so the
    * three fact passes share one exchange layout. Top 10, deterministic
    * tie-break on name.
    */
  def q21WaitingSuppliers(spark: SparkSession, dir: String,
      nation: String = "NATION_1"): DataFrame = {
    val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")
    val natSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .filter(col("n_name") === nation).select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    val l1 = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(late)
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
    val l2 = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("l2_orderkey"), col("l_suppkey").as("l2_suppkey"))
    val l3 = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("l3_orderkey"),
        col("l_suppkey").as("l3_suppkey"), col("l_shipdate").as("l3_shipdate"))
    l1
      .join(l2, col("l2_orderkey") === col("l_orderkey") &&
        col("l2_suppkey") =!= col("l_suppkey"), "left_semi")
      .join(l3, col("l3_orderkey") === col("l_orderkey") &&
        col("l3_suppkey") =!= col("l_suppkey") &&
        col("l3_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_anti")
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(10)
  }

  def q21Sql(nation: String = "NATION_1"): String =
    s"""SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
       |FROM lineitem l1
       |JOIN orders ON o_orderkey = l1.l_orderkey
       |JOIN supplier ON l1.l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE o_orderstatus = 'F' AND n_name = '$nation'
       |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
       |  AND EXISTS (SELECT 1 FROM lineitem l2
       |              WHERE l2.l_orderkey = l1.l_orderkey
       |                AND l2.l_suppkey <> l1.l_suppkey)
       |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
       |                  WHERE l3.l_orderkey = l1.l_orderkey
       |                    AND l3.l_suppkey <> l1.l_suppkey
       |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
       |GROUP BY s_name
       |ORDER BY numwait DESC, s_name ASC
       |LIMIT 10""".stripMargin
}
