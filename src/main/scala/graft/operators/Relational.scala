package graft.operators

import graft.Tables.{t, dsum}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator surface (SURVEY.md §2.1–§2.3, §2.5).
  *
  * The reference (kaori-seasons/lance-flink) delegates all general
  * relational processing to the host engine (SURVEY §2.5); here the host
  * engine is Catalyst, so these queries both exercise the engine-delegated
  * operators (sort, join, window, set ops, having) and the scan-time
  * rewrites the reference pushes into its source (projection P1, filter
  * P2–P8, limit P9, aggregate A1–A9 — cf.
  * reference table/LanceDynamicTableSource.java:162-512).
  *
  * Every query is written scale-first: filters/projections sit directly on
  * the scan so Catalyst pushes them into Parquet (PushedFilters +
  * ReadSchema), small dimension tables are broadcast, aggregates are
  * partial+final hash aggregates, and ORDER BY is always on a bounded
  * result (never a full-table global sort unless the query itself is a
  * sort benchmark).
  */
object Relational {

  /** A1–A9: grouped aggregation over the largest table (TPC-H Q1 shape).
    * Partial agg happens map-side; 6 groups → tiny shuffle.
    */
  def q01AggLineitem(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .as("sum_disc_price"),
        graft.Tables.davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** P1+P2: projection + predicate pushdown; both reach the Parquet scan. */
  def q02FilterProject(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** P9: ordered limit → TakeOrderedAndProject (no global sort). */
  def q03TopkLimit(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** S4/A3: COUNT(*) — answerable from footer metadata at scan time. */
  def q04CountStar(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem").agg(count(lit(1)).as("cnt"))

  /** A4: exact COUNT(DISTINCT) — hash-based with spill, unlike the
    * reference's unbounded HashSet (AggregateExecutor.java:452-461).
    */
  def q05CountDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem").agg(
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"))

  /** A7: MIN/MAX over numerics, strings, and temporals. */
  def q06MinMax(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        min(col("l_shipdate").cast("date")).as("min_ship"),
        max(col("l_shipdate").cast("date")).as("max_ship"))
      .orderBy(col("l_returnflag"))

  /** Broadcast join: 1.5k customers broadcast to the 15k-order side.
    * At 100 TB the customer dim stays broadcastable far longer than the
    * fact side grows; AQE converts to shuffle join only if it outgrows
    * the threshold.
    */
  def q07JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("c_mktsegment"))
  }

  /** Engine-delegated multi-column sort with mixed asc/desc (SURVEY §2.5). */
  def q08SortMulti(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(col("o_totalprice") > 400000)
      .select(col("o_orderpriority"), col("o_orderstatus"), col("o_orderkey"))
      .orderBy(col("o_orderpriority"), col("o_orderstatus").desc, col("o_orderkey"))

  /** P4: IS NOT NULL pushdown (reference :248-258). */
  def q09NullFilter(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .filter(col("props").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), count(col("props")).as("n_props"))
      .orderBy(col("event_type"))

  /** P5: LIKE pushdown (reference :260-262). */
  def q10Like(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .filter(col("p_name").like("%re%"))
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey"))

  /** P7: IN predicate — the reference rejects IN (a latent bug,
    * LanceDynamicTableSource.java:263 vs its own test :248-268); we push it.
    */
  def q11In(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(col("o_orderstatus").isin("O", "F"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  /** P2 range predicate (BETWEEN decomposes to >= AND <=). */
  def q12Between(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_quantity").between(10, 20))
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))

  /** A8: empty-input aggregate defaults — COUNT→0, SUM/MIN→NULL
    * (reference AggregateExecutor.getDefaultResults :218-244).
    */
  def q13EmptyAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_quantity") < -1)
      .agg(count(lit(1)).as("cnt"),
        dsum(col("l_quantity")).as("sum_qty"),
        min(col("l_quantity")).as("min_qty"))

  /** 3-way join: two broadcast dims against the fact table, one shuffle. */
  def q14Join3Agg(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("n_name"))
  }

  /** Window function (SURVEY §2.5 "absent from the reference entirely"):
    * top order per customer. Partition by key → single shuffle, no skew
    * (keys ~uniform); ties broken by orderkey for determinism.
    */
  def q15WindowTopn(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"))
  }

  /** Set operation: EXCEPT (distinct) — negative-balance customers that
    * never placed a high-value order.
    */
  def q16Except(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
      .filter(col("c_acctbal") < 0).select(col("c_custkey"))
    val o = t(spark, dir, "orders")
      .filter(col("o_totalprice") > 200000)
      .select(col("o_custkey").as("c_custkey"))
    c.except(o).orderBy(col("c_custkey"))
  }

  /** GROUP BY + HAVING with deterministic top-N. */
  def q17Having(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 8)
      .orderBy(col("n").desc, col("l_partkey"))
      .limit(50)

  /** Event-time tumbling window over the events stream table (batch view).
    * Hour-bucket emitted as a string so both engines hash identically.
    */
  def q18EventsHourly(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(
        date_format(col("ts"), "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        dsum(col("value"), 6).as("sum_value"))
      .orderBy(col("hour"), col("event_type"))

  /** Daily distinct users — COUNT(DISTINCT) under a group. */
  def q19DailyUsers(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(col("ts").cast("date").as("day"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("day"))

  /** Left-semi join (EXISTS): customers that have orders, by segment. */
  def q20SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment"))
  }

  /** Grouping sets: ROLLUP over two dims — the reference's aggregate
    * pushdown explicitly rejects these (LanceDynamicTableSource.java:
    * 402-404); Catalyst expands them natively.
    */
  def q21Rollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** Set operation: INTERSECT (distinct) — customers with both an open and
    * a finished order.
    */
  def q22Intersect(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      .intersect(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
      .orderBy(col("o_custkey"))
  }

  /** Multi-branch append re-expressed as one scan: the two UNION ALL
    * branches are complementary filters on the same table, so a CASE
    * bucket computes the identical result while reading the table once —
    * at 100 TB the two-scan form pays a full extra table read. The
    * two-scan UNION ALL variant stays available for genuinely distinct
    * sources ([[q23UnionAllTwoScan]], equivalence pinned in
    * RelationalSpec).
    */
  def q23UnionAll(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      // no otherwise(): a NULL price yields a NULL bucket, dropped below —
      // matching the two-scan UNION ALL exactly, where a NULL price fails
      // BOTH branch filters (testdata has no NULL prices, but the CASE
      // form must not silently diverge if that ever changes)
      .withColumn("bucket",
        when(col("o_totalprice") > 150000, "high")
          .when(col("o_totalprice") <= 150000, "low"))
      .filter(col("bucket").isNotNull)
      .groupBy(col("o_orderstatus"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"), col("bucket"))

  /** The literal UNION ALL plan (two scans) — the shape used when the
    * branches really are different sources; kept for operator coverage.
    */
  def q23UnionAllTwoScan(spark: SparkSession, dir: String): DataFrame = {
    val hi = t(spark, dir, "orders").filter(col("o_totalprice") > 150000)
      .select(col("o_orderstatus"), lit("high").as("bucket"))
    val lo = t(spark, dir, "orders").filter(col("o_totalprice") <= 150000)
      .select(col("o_orderstatus"), lit("low").as("bucket"))
    hi.unionAll(lo)
      .groupBy(col("o_orderstatus"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"), col("bucket"))
  }

  /** Running window aggregates: cumulative sum + lag over each customer's
    * order history — one shuffle on the partition key, state bounded by
    * the frame.
    */
  def q24RunningWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(spark, dir, "orders")
      .withColumn("run_total",
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .over(w).cast("double"))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"), col("run_total"), col("prev_price"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      .limit(2000)
  }

  /** Navigation-function window family (q51): LEAD (next event + gap),
    * FIRST_VALUE / LAST_VALUE / NTH_VALUE over per-user event streams —
    * the "what happened next / how long until it" shape funnel analysis
    * runs (LAG rides q24). One shuffle on user_id serves every function;
    * the full-partition frames are explicit ROWS UNBOUNDED..UNBOUNDED on
    * both engines so the default-frame difference between running and
    * whole-partition semantics can never drift.
    */
  def q51LeadLag(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val winAll = win.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(spark, dir, "events")
      .withColumn("next_type", lead(col("event_type"), 1).over(win))
      .withColumn("gap_us",
        unix_micros(lead(col("ts"), 1).over(win)) - unix_micros(col("ts")))
      .withColumn("first_type", first(col("event_type")).over(win))
      .withColumn("last_type", last(col("event_type")).over(winAll))
      .withColumn("third_type", nth_value(col("event_type"), 3).over(winAll))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
      .select(col("user_id"), col("event_id"), col("next_type"), col("gap_us"),
        col("first_type"), col("last_type"), col("third_type"))
      .limit(2000)
  }

  /** Time-interval RANGE frames (q52) — the event-time rolling window
    * every telemetry/feature pipeline writes: per-user trailing-1-hour
    * SUM and COUNT at each event, `RANGE BETWEEN INTERVAL 1 HOUR
    * PRECEDING AND CURRENT ROW` over the timestamp order (q38 covers
    * NUMERIC range frames; the interval-on-timestamp variant has its own
    * planner path and peer semantics). RANGE frames treat equal-ts rows
    * as peers, so the result is deterministic under any tie order — the
    * one window shape that needs no unique-key tie-break. The sum
    * accumulates in decimal (Tables.dsum discipline) so both engines
    * produce identical doubles; one shuffle on user_id, state bounded by
    * a user's 1-hour event count.
    */
  def q52IntervalFrame(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "events").createOrReplaceTempView("events_q52")
    spark.sql(
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS v_1h,
        |  COUNT(*) OVER w AS n_1h
        |FROM events_q52
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin)
  }

  /** JSON property extraction (q53) — semi-structured payloads are the
    * norm in event pipelines; `get_json_object` path extraction is a
    * codegen'd per-row expression (Jackson under whole-stage codegen, no
    * UDF), aggregated per event type. A missing path yields NULL in both
    * engines, pinned by the n_missing column. At scale the extraction
    * rides the scan projection — the parse cost is the only cost, and a
    * hot pipeline promotes the path to a materialized column (or Spark
    * 4's VARIANT) with the same downstream plan.
    */
  def q53JsonExtract(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "events").createOrReplaceTempView("events_q53")
    spark.sql(
      """SELECT event_type, COUNT(*) AS n,
        |  SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS sum_k,
        |  MIN(CAST(get_json_object(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(get_json_object(props, '$.k') AS BIGINT)) AS max_k,
        |  COUNT(*) - COUNT(get_json_object(props, '$.absent')) AS n_missing
        |FROM events_q53 GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  /** Ordered string aggregation (q54) — `LISTAGG ... WITHIN GROUP`
    * (SQL:2016, new in Spark 4): the deterministic concat-per-group every
    * report/export layer writes. The WITHIN GROUP order makes the result
    * order-insensitive to shuffle nondeterminism — same contract as
    * q46's sort_array.
    */
  def q54ListAgg(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "nation").createOrReplaceTempView("nation_q54")
    spark.sql(
      """SELECT n_regionkey,
        |  listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS names,
        |  COUNT(*) AS n
        |FROM nation_q54 GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
  }

  /** Exponential time-decay aggregation (q55) — the recency-weighted
    * score every feature store / trending pipeline computes: each event
    * contributes `value * 2^-age_days` (one-day half-life) to its user's
    * score. Determinism trick: the weight is a DYADIC rational — the
    * query scales by `2^(40-age)` as an exact integer-valued decimal,
    * sums in decimal (exact), and only the FINAL decimal→double cast and
    * /2^40 shift run in floats. The 38-digit decimal→double cast itself
    * rounds differently across engines in the last ulp (~1e-14
    * relative), so the output is rounded to 4 decimals — 10 orders of
    * magnitude of margin. exp()-based decay would be ulp-divergent in
    * every row; this formulation confines engine float behavior to one
    * final cast. One hash shuffle on user_id, partial aggregation
    * map-side.
    */
  def q55TimeDecay(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "events").createOrReplaceTempView("events_q55")
    spark.sql(
      """SELECT user_id,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(20,6)) *
        |           CAST(POWER(2, 40 - LEAST(DATEDIFF(
        |             (SELECT MAX(CAST(ts AS DATE)) FROM events_q55),
        |             CAST(ts AS DATE)), 40)) AS DECIMAL(16,0))) AS DOUBLE)
        |    / POWER(2, 40), 4) AS decayed_value,
        |  COUNT(*) AS n
        |FROM events_q55
        |GROUP BY user_id ORDER BY user_id""".stripMargin)
  }

  /** Higher-order array lambdas (q56) — filter/transform/aggregate/
    * exists over per-document token arrays, the array-functional surface
    * the dedup/text family leans on internally, gated at the SQL level
    * against DuckDB's list lambdas. All codegen'd Catalyst expressions
    * (no UDF): the lambda work rides the scan projection, embarrassingly
    * parallel at any scale.
    */
  def q56HigherOrder(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "documents").createOrReplaceTempView("documents_q56")
    spark.sql(
      """SELECT doc_id,
        |  CAST(size(filter(split(text, ' '), w -> length(w) > 5)) AS BIGINT) AS n_long,
        |  CAST(aggregate(split(text, ' '), 0, (acc, w) -> acc + length(w)) AS BIGINT) AS chars,
        |  array_join(transform(slice(split(text, ' '), 1, 3), w -> upper(w)), '-') AS head3,
        |  exists(split(text, ' '), w -> w = 'the') AS has_the
        |FROM documents_q56 ORDER BY doc_id""".stripMargin)
  }

  /** GROUP BY ALL / ORDER BY ALL (q57) — the modern analyst shorthand
    * (SQL:2023-adjacent, in Spark 4 and DuckDB alike): every
    * non-aggregate select item groups, every output column orders. Same
    * partial+final hash aggregation as an explicit list — this gate pins
    * that both engines RESOLVE the shorthand to the same columns.
    */
  /** AS-OF join gate (q58): every click picks the latest at-or-before
    * view's value per user — [[asofJoin]]'s one-window-pass plan against
    * DuckDB's native `ASOF LEFT JOIN`. The view side is deduped per
    * (user, ts) first: same-timestamp duplicates make ANY engine's asof
    * nondeterministic, so determinism is re-established by construction.
    */
  def q58AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("value"))
    asofJoin(clicks, views, on = Seq("user_id"),
      leftTime = "ts", rightTime = "ts", payload = Seq("value"))
      .select(col("event_id"), col("user_id"), col("asof_value"))
      .orderBy(col("event_id"))
  }

  /** Binned range join gate (q59): lineitem prices against OVERLAPPING
    * price bands (width 3000, stride 2000) — the non-equi shape Spark
    * would otherwise plan as a nested-loop — via [[rangeJoin]]'s
    * bin-equi-join expansion; aggregated per band against DuckDB's
    * plain BETWEEN join.
    */
  def q59RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem").select(col("l_extendedprice"))
    val bands = spark.range(0, 41).select(col("id").as("band_id"),
      (col("id") * 2000).cast("double").as("lo"),
      (col("id") * 2000 + 2999).cast("double").as("hi"))
    rangeJoin(li, "l_extendedprice", bands, "lo", "hi", binWidth = 1000)
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("band_id"))
  }

  def q57GroupByAll(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders_q57")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders_q57 GROUP BY ALL ORDER BY ALL""".stripMargin)
  }

  /** AS-OF JOIN — the time-series primitive Spark lacks as an operator
    * (kdb's `aj`, Pandas `merge_asof`, DuckDB `ASOF JOIN`): every left
    * row picks the LATEST right row with `rightTime <= leftTime` in its
    * key group. Re-expressed as ONE window pass instead of a join:
    * tag both sides, union, and run `last_value(payload) IGNORE NULLS`
    * over (key, time) with right rows sorting BEFORE left rows on time
    * ties (`<=` semantics) — one shuffle on the key, no join node, no
    * per-row probe. At 100 TB this beats the range-condition
    * SortMergeJoin rewrite (which degenerates to per-key scans) and is
    * embarrassingly partition-parallel. Left rows with no prior right
    * row keep NULL payloads (LEFT OUTER asof).
    *
    * `right` must be deterministic per (key, rightTime) — dedup first if
    * the source can carry same-timestamp duplicates (any engine's asof
    * is nondeterministic there otherwise).
    *
    * Skew: the window runs a RUNNING frame (incremental state, no
    * full-partition buffering), but one hot key still lands in one task
    * — the same exposure as any keyed window. If a single key dominates
    * (one user holds most events), split its time range first and union,
    * or accept the straggler; results are identical either way.
    *
    * Tolerance boundary: a right row at EXACTLY `leftTime - tolerance`
    * is KEPT (`>=`); anything older nulls out — pandas merge_asof's
    * inclusive contract, pinned in RelationalSpec.
    */
  def asofJoin(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String,
      payload: Seq[String],
      // pandas merge_asof's `tolerance`: a match older than
      // `leftTime - tolerance` is discarded (payload nulls out). Any SQL
      // expression subtractable from the time column — "INTERVAL 5
      // MINUTES" for timestamps, a plain number for numeric times.
      tolerance: Option[String] = None): DataFrame = {
    require(on.nonEmpty, "asofJoin needs at least one key column")
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    val leftCols = left.columns.toSeq
    // the matched right TIME rides the payload so tolerance can judge it
    val pay = struct(col(rightTime).as("__rt") +: payload.map(col): _*)
    val r = right.select(
      on.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side"),
        pay.as("__pay")): _*)
    val l = left.select(
      on.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(r.schema("__pay").dataType).as("__pay")) ++
        leftCols.filterNot(on.contains).map(c => col(c).as(s"__l_$c")): _*)
    // right needs the left-only columns too (null) for a clean union
    val rAligned = leftCols.filterNot(on.contains).foldLeft(r)((d, c) =>
      d.withColumn(s"__l_$c", lit(null).cast(left.schema(c).dataType)))
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(rAligned)
      .withColumn("__asof", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val bounded = tolerance.fold(joined)(t => joined.withColumn("__asof",
      when(col("__asof").getField("__rt") >= col("__t") - expr(t),
        col("__asof"))))
    val out = on.map(col) ++
      leftCols.filterNot(on.contains).map(c => col(s"__l_$c").as(c)) ++
      payload.map(p => col("__asof").getField(p).as(s"asof_$p"))
    bounded.select(out: _*)
  }

  /** BINNED RANGE JOIN — `point BETWEEN lo AND hi` without the
    * BroadcastNestedLoop/cartesian Spark plans for non-equi conditions:
    * each right interval explodes into the fixed-width bins it overlaps
    * (`sequence(floor(lo/w), floor(hi/w))`), each left point computes
    * its one bin, and the match becomes an EQUI-join on bin (+ any extra
    * keys) with the exact BETWEEN as a post-filter. A (left, right) pair
    * meets in exactly one bin — the point's — so no dedup is needed.
    * Cost: shuffle on bin ∝ data + intervals×(span/w); pick `binWidth`
    * near the typical interval span so expansion stays ~1-2 rows per
    * interval. The Iceberg/H3 bucketed-interval-join shape, as one
    * declarative pipeline Catalyst fully optimizes.
    */
  def rangeJoin(left: DataFrame, pointCol: String,
      right: DataFrame, loCol: String, hiCol: String,
      binWidth: Long, extraKeys: Seq[String] = Seq.empty): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val r = right.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    val l = left.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    l.join(r, Seq("__bin") ++ extraKeys)
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Deterministic hash sampling — the reproducible train/eval split a
    * training pipeline needs (no RNG, no seed drift across engines):
    * md5(key) mod 10 picks a stable 10% of documents.
    */
  def q25HashSample(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .filter(expr(
        "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 10 = 0"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(size(split(text, ' ')) AS BIGINT)")).as("tokens"))
      .orderBy(col("lang"))

  /** Batch sessionization: per-user sessions split at 30-minute gaps via
    * lag + running sum — two window passes over one shuffle on user_id,
    * then a per-session aggregate. The streaming twin (session_window with
    * watermark) lives in graft.streaming.
    */
  def q26Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(spark, dir, "events")
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("new_s")).over(w))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        count(lit(1)).as("n_events"),
        ((max(col("us")) - min(col("us"))) / 1000000.0).as("duration_secs"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** Skew-handling: two-stage salted aggregation. `event_type` has only 5
    * values, so a direct groupBy over a wide cluster hot-spots 5 reducers;
    * salting fans each key over 16 partial groups (map-side + one narrow
    * shuffle), then the tiny second stage merges 80 rows. Result is
    * bit-identical to the plain groupBy (decimal partials re-sum exactly).
    */
  def q27SaltedAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("__salt", expr("pmod(hash(user_id), 16)"))
      .groupBy(col("event_type"), col("__salt"))
      .agg(count(lit(1)).as("pn"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6))).as("psum"))
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"), sum(col("psum")).cast("double").as("sum_value"))
      .orderBy(col("event_type"))

  /** Grouping sets: CUBE — all 4 grouping combinations in one pass. */
  def q28Cube(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** Left-anti join (NOT EXISTS): customers with no orders, per segment —
    * completes the join-type matrix (inner/broadcast/semi/anti).
    */
  def q29AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
      .filter(col("o_totalprice") > 200000).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment"))
  }

  /** AS-OF join (attribution): each purchase matched to the user's most
    * recent prior-or-equal click. Spark lacks a native as-of join; the
    * scale-correct plan is NOT a per-row range probe but the union+window
    * pattern: tag both sides, one shuffle on the join key, one in-partition
    * sort, and `last(_, ignoreNulls)` carries the latest click timestamp
    * forward to every later purchase row. Cost is one shuffle + sort of
    * events — the same shape at 100 TB — where a naive range join is
    * O(clicks × purchases) per user. (user_id, ts) is unique in the data,
    * so the window order is total and the result deterministic.
    */
  def q30AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("__click_ts",
        when(col("event_type") === "click", col("ts")))
      .withColumn("click_ts_raw", last(col("__click_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("click_ts_raw").isNotNull)
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
        date_format(col("click_ts_raw"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts"),
        (unix_micros(col("ts")) - unix_micros(col("click_ts_raw"))).as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** Sketch aggregate: HyperLogLog++ distinct-count next to the exact
    * count (the sketch is what a 100 TB pipeline actually runs — exact
    * distinct shuffles every key; HLL merges fixed-size registers). The
    * oracle states the exact count and the planted accuracy outcome,
    * v26p-style. The sketch runs at rsd = 0.02 while the gate asserts a
    * 5% envelope — a 2.5σ bound, so the row is stable across scale
    * factors (rsd = 0.05 made the assert a 1σ coin flip: it held at
    * sf0.01 and broke at sf0.1) yet still reddens on a real sketch
    * regression. HLL estimates are deterministic for fixed input.
    */
  def q31ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .agg(countDistinct(col("user_id")).as("exact_n"),
        approx_count_distinct(col("user_id"), 0.02).as("approx_n"))
      .select(col("exact_n"),
        (abs(col("approx_n") - col("exact_n")) <=
          col("exact_n") * 0.05).as("within_5pct"))

  /** Banded RANGE join: clicks within the hour before each error event,
    * per user. A naive inequality join is a per-user cross product the
    * optimizer can only nested-loop; the scale pattern is BANDING — bucket
    * the time axis at the window width, explode the probe side to the two
    * buckets its window can touch, equi-join on (user, bucket), then apply
    * the exact range predicate. Cost ∝ true matches + bucket collisions;
    * the join stays a hash join at any scale and AQE can still split skew.
    */
  def q32RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600000000L
    val ev = t(spark, dir, "events")
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
      // an error's 1h look-back can only touch its own and the previous bucket
      .withColumn("__b", explode(array(
        floor(unix_micros(col("ts")) / hourUs) - 1,
        floor(unix_micros(col("ts")) / hourUs))))
    val clk = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withColumn("__cb", floor(unix_micros(col("c_ts")) / hourUs))
    err.join(clk,
        col("user_id") === col("c_user") && col("__b") === col("__cb") &&
          col("c_ts") >= col("ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("ts"))
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_clicks"))
      .orderBy(col("event_id"))
  }

  /** Exact interpolated percentiles (continuous definition — the one
    * DuckDB's quantile_cont and ANSI percentile_cont share): per-flag
    * median and p90 of extended price. Exact percentile sorts within each
    * group; at 100 TB the approximate sketch is the production default,
    * but the exact form must exist for parity (and the per-group sort is
    * partition-local after the hash shuffle — no global sort).
    */
  def q33Percentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      // one percentile(array(...)) aggregate, not two: the value map per
      // group is built once and both quantiles read it (measured 2x)
      .agg(expr("percentile(l_extendedprice, array(0.5D, 0.9D))").as("ps"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("ps")(0).as("p50"),
        col("ps")(1).as("p90"), col("n"))
      .orderBy(col("l_returnflag"))

  /** The scale path for q33: `approx_percentile` (KLL-style quantile
    * sketch — fixed-size state, mergeable map-side, no per-group value
    * map) next to the exact interpolated percentile, q31-style: the gate
    * asserts the sketch lands within 1% of the exact P50/P90 per group.
    * accuracy=50000 bounds rank error at 1/50000·n ≪ 1% of these value
    * ranges; the sketch is deterministic for fixed input, so the row is
    * stable yet reddens on a real sketch regression.
    */
  def q34ApproxPercentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.5D, 0.9D))").as("ex"),
        expr("approx_percentile(l_extendedprice, array(0.5D, 0.9D), 50000)").as("ap"))
      .select(col("l_returnflag"),
        (abs(col("ap")(0) - col("ex")(0)) <= abs(col("ex")(0)) * 0.01 &&
          abs(col("ap")(1) - col("ex")(1)) <= abs(col("ex")(1)) * 0.01)
          .as("within_1pct"))
      .orderBy(col("l_returnflag"))

  /** PIVOT (wide aggregation): event counts per user bucket × event type.
    * The pivot values are DECLARED, not discovered — an undeclared pivot
    * costs a full distinct scan before the real aggregation can even
    * plan, which is the difference between one pass and two at 100 TB.
    * Plans as one hash aggregate over codegen'd conditional counts.
    * `na.fill(0)` pins the empty-combination representation to match
    * SQL's COUNT FILTER zero.
    */
  def q35Pivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("bucket", pmod(col("user_id"), lit(10)))
      .groupBy(col("bucket"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("bucket"))

  /** Correlated scalar subquery (SURVEY §4.1: decorrelation is Catalyst's
    * job — this gate proves it does that job over our tables): orders
    * more than twice their own customer's average order value. Expressed
    * in SQL so the engine must DECORRELATE — the planned shape is the
    * per-customer aggregate joined back, never a per-row subquery
    * execution, which is what makes the construct viable at scale.
    * The avg comparison is written as `price·n > 2·sum` over DECIMALs:
    * a double AVG's value depends on partial-sum order, and a boundary
    * row must not flip between engines.
    */
  def q36CorrelatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders_q36")
    spark.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders_q36 o
        |WHERE CAST(o_totalprice AS DECIMAL(18,2))
        |    * (SELECT COUNT(*) FROM orders_q36 c WHERE c.o_custkey = o.o_custkey)
        |  > 2 * (SELECT SUM(CAST(o2.o_totalprice AS DECIMAL(18,2)))
        |    FROM orders_q36 o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Multiset set ops — EXCEPT ALL / INTERSECT ALL keep DUPLICATE
    * multiplicity (a customer with 3 qualifying orders and 1 cancelled
    * one survives twice), unlike q16/q22's distinct variants. Both plan
    * as hash aggregations over a tagged union — no sort, shuffle on the
    * compared columns only.
    */
  def q37MultisetSetops(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val hi = o.filter(col("o_totalprice") > 100000).select(col("o_custkey"))
    val fo = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val ea = hi.exceptAll(fo).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
    val ia = hi.intersectAll(fo).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
    ea.unionByName(ia)
      .select(col("op"), col("o_custkey"), col("n"))
      .orderBy(col("op"), col("o_custkey"))
  }

  /** RANGE window frame over event-time days: a 3-DAY moving average,
    * not 3 ROWS — on a day axis with gaps the two differ exactly where
    * it matters (a quiet day shrinks the window, it doesn't reach back
    * further). Numeric day ordering keeps the frame codegen'd.
    */
  def q38RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "events")
      .groupBy(expr("unix_date(CAST(ts AS DATE))").as("day_num"),
        col("event_type"))
      .agg(dsum(col("value"), 6).as("day_value"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day_num"))
      .rangeBetween(-2, 0)
    daily
      .withColumn("n_days", count(lit(1)).over(w))
      // davg decomposed per window: decimal sum over the frame, double
      // division by the frame count. `.over` must wrap the AGGREGATE
      // itself — wrapping dsum's cast-of-sum leaves the sum un-windowed.
      .withColumn("avg3d",
        sum(col("day_value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .over(w).cast("double") / col("n_days"))
      .select(expr("DATE_FROM_UNIX_DATE(day_num)").cast("string").as("day"),
        col("event_type"), col("day_value"), col("n_days"), col("avg3d"))
      .orderBy(col("day"), col("event_type"))
  }

  /** UNPIVOT (q35's inverse): measure columns melted into (measure,
    * value) rows — the tidy-data step before a generic per-measure
    * aggregation. Per-partition row expansion, no shuffle until the
    * aggregate; declared measure list like q35's declared pivot values.
    */
  def q39Unpivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"))
      .unpivot(Array(col("l_orderkey")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "measure", "value")
      .groupBy(col("measure"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("total"))
      .orderBy(col("measure"))

  /** Explicit GROUPING SETS (the general form q21's ROLLUP and q28's CUBE
    * specialize) with `GROUPING()` flags — the only robust way to tell a
    * subtotal row from a genuinely-NULL group value. One pass, one
    * expand+aggregate, no self-union.
    */
  def q40GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders_q40")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders_q40
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio, o_orderstatus ASC NULLS FIRST,
        |  o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** LATERAL explode — one row per word of `p_name` (the tokenize-then-
    * aggregate shape every text pipeline starts with). Generate is a
    * per-partition row expansion with no shuffle; the only exchange is
    * the final small word-count aggregate, and the top-20 rides
    * TakeOrderedAndProject, never a global sort.
    */
  def q41LateralExplode(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(explode(split(col("p_name"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20)

  /** Distribution window functions — NTILE/PERCENT_RANK/CUME_DIST over a
    * deterministic total order (acctbal desc, custkey breaks ties, so the
    * rank-derived doubles are exact small-integer ratios — bit-identical
    * across engines). One shuffle on the partition key; the quartile
    * filter bounds the result to ~n/4 rows.
    */
  def q42RankFunctions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(spark, dir, "customer")
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
      // bigint: DuckDB's ntile yields BIGINT, Spark's INT — match the oracle
      .withColumn("quartile", ntile(4).over(w).cast("bigint"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .filter(col("quartile") === 1)
      .orderBy(col("c_mktsegment"), col("c_custkey"))
  }

  /** Bivariate statistics, exactly. Streaming corr/covar/stddev are
    * partial-order-dependent in ANY distributed engine, so the gated
    * values are closed forms over DECIMAL-exact moments (one map-side-
    * combined pass, six sums), identical on both engines; Spark's
    * built-in `corr`/`covar_samp`/`stddev_samp` are then asserted into a
    * 1e-6 envelope of those exact values (the q31/q34 pattern: the
    * approximation is gated by the oracle-replicable exact form).
    */
  def q43CorrStats(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem").select(
      col("l_quantity").cast("decimal(18,2)").as("x"),
      col("l_extendedprice").cast("decimal(18,2)").as("y"))
    val m = li.agg(
      count(lit(1)).as("n"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("y")).cast("double").as("sy"),
      sum(col("x") * col("x")).cast("double").as("sxx"),
      sum(col("y") * col("y")).cast("double").as("syy"),
      sum(col("x") * col("y")).cast("double").as("sxy"),
      corr(col("x"), col("y")).as("corr_s"),
      covar_samp(col("x"), col("y")).as("covar_s"),
      stddev_samp(col("x")).as("sd_s"))
    m.select(
        col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy")))).as("corr_x"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * (col("n") - 1))).as("covar_x"),
        sqrt((col("n") * col("sxx") - col("sx") * col("sx")) /
          (col("n") * (col("n") - 1))).as("sd_x"),
        col("corr_s"), col("covar_s"), col("sd_s"))
      .select(
        col("n"), round(col("corr_x"), 9).as("corr9"),
        round(col("covar_x"), 4).as("covar4"), round(col("sd_x"), 6).as("sd6"),
        (abs(col("corr_s") - col("corr_x")) < 1e-6).as("corr_ok"),
        (abs(col("covar_s") - col("covar_x")) / col("covar_x") < 1e-9).as("covar_ok"),
        (abs(col("sd_s") - col("sd_x")) / col("sd_x") < 1e-9).as("sd_ok"))
  }

  /** Aggregate FILTER clause — per-group conditional aggregation in ONE
    * pass (the idiomatic form of q23's CASE trick): counts and a decimal
    * sum each see a different predicate without extra scans or joins.
    */
  def q44FilterClause(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders_q44")
    spark.sql(
      """SELECT o_orderpriority,
        |  COUNT(*) AS n_all,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
        |  COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS open_total
        |FROM orders_q44 GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** String function surface — split_part / regexp_extract / upper /
    * length composed in a grouped aggregate. Patterns stay in the
    * RE2 ∩ java.util.regex common subset so both engines match
    * identically; all functions are codegen'd column expressions.
    */
  def q45StringFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(
        split_part(col("p_type"), lit(" "), lit(1)).as("type_head"),
        col("p_brand"), col("p_name"))
      .groupBy(col("type_head"))
      .agg(
        count(lit(1)).as("n"),
        min(upper(col("p_brand"))).as("first_brand"),
        max(length(col("p_name"))).cast("bigint").as("max_name_len"),
        countDistinct(regexp_extract(col("p_brand"), "[0-9]+", 0)).as("brand_nums"))
      .orderBy(col("type_head"))

  /** Sorted ARRAY_AGG top-k — per-customer top-3 order prices built as an
    * ARRAY column (the collect-then-truncate shape feature pipelines use
    * for "last k events per user"), then posexploded to (custkey, rank,
    * price) rows so the gate output is hash-stable scalars. Partial
    * collect_list combines map-side; sort_array+slice bound the row to k
    * values, so state per key is O(orders-per-customer), never global.
    */
  def q46ArrayAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(slice(sort_array(collect_list(col("o_totalprice")), asc = false),
        1, 3).as("top3"))
      .filter(size(col("top3")) >= 3)
      .select(col("o_custkey"), posexplode(col("top3")).as(Seq("pos", "price")))
      .select(col("o_custkey"),
        (col("pos") + 1).cast("bigint").as("rank"), col("price"))
      .orderBy(col("o_custkey"), col("rank"))

  /** ns→µs truncation pin (q50): the reference round-trips parquet
    * TIMESTAMP(NANOS) (ref:converter/RowDataConverter.java:228-231,
    * ref:LanceTypeConverter.java:157-161); Spark has no ns timestamp, so
    * this library truncates nanos to the containing microsecond via THE
    * ONE conversion helper ([[graft.Tables.nanosToMicrosTs]] — the same
    * expression the events loader uses on nanos-vintage testdata). The
    * gate synthesizes deterministic sub-µs offsets, converts, and proves
    * against the DuckDB oracle that (a) truncation recovers the original
    * µs timestamp exactly, (b) no value ever rounds UP, row for row over
    * the whole table. A silent regression (rounding, double drift) flips
    * n_exact.
    */
  def q50NsTruncation(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("ns",
        unix_micros(col("ts")) * lit(1000L) + pmod(col("event_id"), lit(1000L)))
      .withColumn("ts2", graft.Tables.nanosToMicrosTs(col("ns")))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("ts2") === col("ts"), 1L).otherwise(0L)).as("n_exact"),
        sum(when(col("ts2") > col("ts"), 1L).otherwise(0L)).as("n_rounded_up"),
        min(unix_micros(col("ts2"))).as("min_us"),
        max(unix_micros(col("ts2"))).as("max_us"))

  /** Opt-in ns fidelity (q61): the q50 truncation is the DEFAULT; this
    * gate pins the lossless alternative. Sub-µs offsets ride an int64
    * nanos column written with `write.ns-as-long=ns` — the table
    * declares the column a nanosecond timestamp
    * ([[graft.format.LanceFormat.PropNsAsLong]]), the values round-trip
    * through the lance write+scan BIT-EXACTLY (n_lossless == n_total is
    * what the oracle hash pins; the Spark side's ns values came back
    * from the table, the oracle recomputes them), and
    * [[graft.Lance.readNsAsTimestamp]] is the documented µs cast path
    * (q50's floor division — n_cast_exact). DuckDB 1.0's TIMESTAMP_NS
    * drops sub-µs digits on ingest/cast, so the oracle proves fidelity
    * in exact BIGINT-nanos space plus the µs twin via make_timestamp. */
  def q61NsRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val dest = graft.Tables.scratch(dir, "events_ns_v1")
    val root = new org.apache.hadoop.fs.Path(new java.io.File(dest).getAbsolutePath)
    val fs = graft.format.LanceFormat.fileSystem(root,
      spark.sessionState.newHadoopConf())
    if (fs.exists(root)) fs.delete(root, true)
    t(spark, dir, "events")
      .select(col("event_id"), col("ts"),
        (unix_micros(col("ts")) * lit(1000L) +
          pmod(col("event_id"), lit(1000L))).as("ns"))
      .write.format("lance").option("write.ns-as-long", "ns")
      .mode("overwrite").save(dest)
    require(graft.Lance.nsColumns(spark, dest) == Seq("ns"),
      "ns-as-long declaration did not land in the table properties")
    // the SQL spelling drives the same conversion — n_cast_exact below
    // is computed FROM the TVF frame, so the SQL surface is what the
    // oracle hash actually grades
    graft.MetaTvfs.register(spark)
    val casted = spark.sql(s"SELECT * FROM lance_read_ns('" +
      new java.io.File(dest).getAbsolutePath.replace("'", "''") + "')")
    require(casted.schema("ns").dataType ==
      org.apache.spark.sql.types.TimestampType,
      "lance_read_ns must surface the declared column as µs timestamp")
    require(casted.schema == graft.Lance.readNsAsTimestamp(spark, dest).schema,
      "lance_read_ns and Lance.readNsAsTimestamp must agree on the schema")
    val back = spark.read.format("lance").load(dest)
    require(back.schema("ns").dataType == org.apache.spark.sql.types.LongType,
      "the default read must keep the lossless longs")
    val roundtrip = back.agg(
      count(lit(1)).as("n_total"),
      sum(when(col("ns") === unix_micros(col("ts")) * lit(1000L) +
        pmod(col("event_id"), lit(1000L)), 1L).otherwise(0L)).as("n_lossless"),
      sum(when(pmod(col("ns"), lit(1000L)) =!= 0L, 1L).otherwise(0L))
        .as("n_subus"),
      min(col("ns")).as("min_ns"), max(col("ns")).as("max_ns"))
    val castExact = casted.agg(
      sum(when(col("ns") === col("ts"), 1L).otherwise(0L)).as("n_cast_exact"))
    roundtrip.crossJoin(castExact) // both single-row
  }

  /** Recursive CTE (Spark 4's WITH RECURSIVE): generate doubling price
    * tiers iteratively — the dimension-generation shape recursion is for
    * in analytics — then band-join orders onto them. The recursion is
    * driver-tiny (a dozen rows, data-independent bounds); the join
    * broadcasts the tiers against the fact scan.
    */
  def q47RecursiveCte(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders_q47")
    spark.sql(
      """WITH RECURSIVE tiers(lo, hi, tier) AS (
        |  SELECT CAST(0 AS DOUBLE), CAST(1000 AS DOUBLE), CAST(0 AS BIGINT)
        |  UNION ALL
        |  SELECT hi, hi * 2, tier + 1 FROM tiers WHERE hi < 1000000
        |)
        |SELECT t.tier, t.lo, t.hi, COUNT(o.o_orderkey) AS n
        |FROM tiers t LEFT JOIN orders_q47 o
        |  ON o.o_totalprice >= t.lo AND o.o_totalprice < t.hi
        |GROUP BY t.tier, t.lo, t.hi
        |ORDER BY t.tier""".stripMargin)
  }

  /** Correlated LATERAL subquery with ORDER BY + LIMIT — per-customer
    * top-2 orders in standard SQL (the decorrelated plan is a ranked
    * window join, never a per-row subquery execution; q15's windowed
    * top-n is the DataFrame spelling of the same thing).
    */
  def q48LateralTopk(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders_q48")
    t(spark, dir, "customer").createOrReplaceTempView("customer_q48")
    spark.sql(
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer_q48 c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders_q48
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""".stripMargin)
  }

  /** Count-min sketch (q49) — the heavy-hitter estimator completing the
    * sketch trio (q31 HLL distinct, q34 KLL percentiles). One pass builds
    * the seeded sketch (merge is element-wise counter addition —
    * commutative, so partial-order-independent and deterministic);
    * point estimates for 5 probed keys are then checked against their
    * exact counts inside the published ε·N one-sided envelope. The gate
    * row carries the exact counts + the envelope outcome (q31 pattern:
    * the sketch is gated by what the oracle CAN re-derive).
    */
  def q49CountMin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = t(spark, dir, "lineitem")
      .select(pmod(col("l_orderkey"), lit(100)).as("key"))
    val eps = 0.001
    val bytes = li
      .agg(expr(s"count_min_sketch(key, CAST($eps AS DOUBLE), 0.99D, 42)"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    val total = li.count()
    val slack = math.ceil(eps * total).toLong
    val exact = li.filter(col("key") < 5).groupBy(col("key"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 5L).map { k =>
      val n = exact.getOrElse(k, 0L)
      val est = cms.estimateCount(java.lang.Long.valueOf(k))
      // CMS never underestimates; overshoot is bounded by ε·N w.h.p.
      (k, n, est >= n && est <= n + slack)
    }.toDF("key", "n", "within")
      .orderBy(col("key"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_ns_truncation" -> q50NsTruncation,
    "q61_ns_roundtrip" -> q61NsRoundtrip,
    "q51_lead_lag" -> q51LeadLag,
    "q47_recursive_cte" -> q47RecursiveCte,
    "q48_lateral_topk" -> q48LateralTopk,
    "q49_count_min" -> q49CountMin,
    "q41_lateral_explode" -> q41LateralExplode,
    "q42_rank_functions" -> q42RankFunctions,
    "q43_corr_stats" -> q43CorrStats,
    "q44_filter_clause" -> q44FilterClause,
    "q45_string_funcs" -> q45StringFuncs,
    "q46_array_agg" -> q46ArrayAgg,
    "q52_interval_frame" -> q52IntervalFrame,
    "q53_json_extract" -> q53JsonExtract,
    "q54_listagg" -> q54ListAgg,
    "q55_time_decay" -> q55TimeDecay,
    "q56_higher_order" -> q56HigherOrder,
    "q57_group_by_all" -> q57GroupByAll,
    "q58_asof_join" -> q58AsofJoin,
    "q59_range_join" -> q59RangeJoin,
    "q33_percentiles" -> q33Percentiles,
    "q34_approx_percentiles" -> q34ApproxPercentiles,
    "q35_pivot" -> q35Pivot,
    "q36_correlated_subquery" -> q36CorrelatedSubquery,
    "q37_multiset_setops" -> q37MultisetSetops,
    "q38_range_frame" -> q38RangeFrame,
    "q39_unpivot" -> q39Unpivot,
    "q40_grouping_sets" -> q40GroupingSets,
    "q30_asof_join" -> q30AsofJoin,
    "q31_approx_distinct" -> q31ApproxDistinct,
    "q32_range_join" -> q32RangeJoin,
    "q29_anti_join" -> q29AntiJoin,
    "q27_salted_agg" -> q27SaltedAgg,
    "q28_cube" -> q28Cube,
    "q21_rollup" -> q21Rollup,
    "q22_intersect" -> q22Intersect,
    "q23_union_all" -> q23UnionAll,
    "q24_running_window" -> q24RunningWindow,
    "q25_hash_sample" -> q25HashSample,
    "q26_sessionize" -> q26Sessionize,
    "q01_agg_lineitem" -> q01AggLineitem,
    "q02_filter_project" -> q02FilterProject,
    "q03_topk_limit" -> q03TopkLimit,
    "q04_count_star" -> q04CountStar,
    "q05_count_distinct" -> q05CountDistinct,
    "q06_minmax" -> q06MinMax,
    "q07_join_agg" -> q07JoinAgg,
    "q08_sort_multi" -> q08SortMulti,
    "q09_null_filter" -> q09NullFilter,
    "q10_like" -> q10Like,
    "q11_in" -> q11In,
    "q12_between" -> q12Between,
    "q13_empty_agg" -> q13EmptyAgg,
    "q14_join3_agg" -> q14Join3Agg,
    "q15_window_topn" -> q15WindowTopn,
    "q16_except" -> q16Except,
    "q17_having" -> q17Having,
    "q18_events_hourly" -> q18EventsHourly,
    "q19_daily_users" -> q19DailyUsers,
    "q20_semi_join" -> q20SemiJoin,
  )

  val oracleSql: Map[String, String] = Map(
    "q47_recursive_cte" ->
      """WITH RECURSIVE tiers(lo, hi, tier) AS (
        |  SELECT CAST(0 AS DOUBLE), CAST(1000 AS DOUBLE), CAST(0 AS BIGINT)
        |  UNION ALL
        |  SELECT hi, hi * 2, tier + 1 FROM tiers WHERE hi < 1000000
        |)
        |SELECT t.tier, t.lo, t.hi, COUNT(o.o_orderkey) AS n
        |FROM tiers t LEFT JOIN orders o
        |  ON o.o_totalprice >= t.lo AND o.o_totalprice < t.hi
        |GROUP BY t.tier, t.lo, t.hi
        |ORDER BY t.tier""".stripMargin,
    "q48_lateral_topk" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""".stripMargin,
    // the oracle re-derives the exact counts and plants the envelope
    // outcome; a sketch drifting past ε·N turns the row red
    "q49_count_min" ->
      """WITH keys(key) AS (SELECT * FROM generate_series(0, 4))
        |SELECT k.key, COUNT(l.l_orderkey) AS n, true AS within
        |FROM keys k LEFT JOIN lineitem l ON l.l_orderkey % 100 = k.key
        |GROUP BY k.key ORDER BY k.key""".stripMargin,
    "q41_lateral_explode" ->
      """SELECT word, COUNT(*) AS n FROM (
        |  SELECT unnest(string_split(p_name, ' ')) AS word FROM part) w
        |GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin,
    // rank-derived doubles are exact ratios of small ints under a total
    // order (custkey tiebreak) — bit-identical across engines
    "q42_rank_functions" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal, quartile, pct_rank, cume
        |FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    ntile(4) OVER w AS quartile,
        |    percent_rank() OVER w AS pct_rank,
        |    cume_dist() OVER w AS cume
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal DESC, c_custkey)) r
        |WHERE quartile = 1 ORDER BY c_mktsegment, c_custkey""".stripMargin,
    // closed forms over DECIMAL-exact moments, the same double expression
    // tree on both sides; the _ok flags replicate as literal true (the
    // oracle plants the envelope outcome, q31/q34 pattern)
    "q43_corr_stats" ->
      """WITH m AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        |  FROM lineitem)
        |SELECT n,
        |  ROUND((n * sxy - sx * sy) /
        |    SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 9) AS corr9,
        |  ROUND((n * sxy - sx * sy) / (n * (n - 1)), 4) AS covar4,
        |  ROUND(SQRT((n * sxx - sx * sx) / (n * (n - 1))), 6) AS sd6,
        |  true AS corr_ok, true AS covar_ok, true AS sd_ok
        |FROM m""".stripMargin,
    "q44_filter_clause" ->
      """SELECT o_orderpriority,
        |  COUNT(*) AS n_all,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
        |  COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS open_total
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q45_string_funcs" ->
      """SELECT split_part(p_type, ' ', 1) AS type_head,
        |  COUNT(*) AS n,
        |  MIN(upper(p_brand)) AS first_brand,
        |  MAX(length(p_name)) AS max_name_len,
        |  COUNT(DISTINCT regexp_extract(p_brand, '[0-9]+')) AS brand_nums
        |FROM part GROUP BY type_head ORDER BY type_head""".stripMargin,
    // q50: DuckDB's // is floor division on BIGINT and make_timestamp
    // takes µs — the exact truncation contract nanosToMicrosTs implements
    "q50_ns_truncation" ->
      """WITH e AS (SELECT
        |    epoch_us(CAST(ts AS TIMESTAMP)) * 1000 + event_id % 1000 AS ns,
        |    CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |c AS (SELECT ts, make_timestamp(ns // 1000) AS ts2 FROM e)
        |SELECT COUNT(*) AS n_total,
        |  CAST(SUM(CASE WHEN ts2 = ts THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
        |  CAST(SUM(CASE WHEN ts2 > ts THEN 1 ELSE 0 END) AS BIGINT) AS n_rounded_up,
        |  MIN(epoch_us(ts2)) AS min_us, MAX(epoch_us(ts2)) AS max_us
        |FROM c""".stripMargin,
    // q61: the lossless twin of q50 — n_lossless proves the lance
    // write+scan round-trips the declared int64-nanos column bit-exact
    // (the Spark side's values came BACK from the table; this recomputes
    // them), n_cast_exact the µs floor-division opt-in. DuckDB 1.0's
    // TIMESTAMP_NS drops sub-µs digits on cast, so the proof rides
    // exact BIGINT nanos arithmetic.
    "q61_ns_roundtrip" ->
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
        |    epoch_us(CAST(ts AS TIMESTAMP)) * 1000 + event_id % 1000 AS ns
        |  FROM events)
        |SELECT COUNT(*) AS n_total,
        |  CAST(SUM(1) AS BIGINT) AS n_lossless,
        |  CAST(SUM(CASE WHEN ns % 1000 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_subus,
        |  MIN(ns) AS min_ns, MAX(ns) AS max_ns,
        |  CAST(SUM(CASE WHEN make_timestamp(ns // 1000) = ts THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_cast_exact
        |FROM e""".stripMargin,
    // q51: (ts, event_id) is a unique ordering, so the 2000-row prefix is
    // the same set on both engines; whole-partition frames are explicit
    "q51_lead_lag" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |    event_type FROM events),
        |w AS (SELECT user_id, event_id, ts,
        |    lead(event_type) OVER win AS next_type,
        |    epoch_us(lead(ts) OVER win) - epoch_us(ts) AS gap_us,
        |    first_value(event_type) OVER win AS first_type,
        |    last_value(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type,
        |    nth_value(event_type, 3) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_type
        |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_id, next_type, gap_us, first_type, last_type,
        |  third_type
        |FROM w ORDER BY user_id, ts, event_id LIMIT 2000""".stripMargin,
    // ties at the slice boundary carry equal values, so the value hash is
    // insensitive to tiebreak order; rank among equal prices swaps equal rows
    "q53_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        |  COUNT(*) - COUNT(json_extract_string(props, '$.absent')) AS n_missing
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q54_listagg" ->
      """SELECT n_regionkey,
        |  string_agg(n_name, ',' ORDER BY n_name) AS names,
        |  COUNT(*) AS n
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q52_interval_frame" ->
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS v_1h,
        |  COUNT(*) OVER w AS n_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q57_group_by_all" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY ALL ORDER BY ALL""".stripMargin,
    // q58: DuckDB's NATIVE asof join is the oracle for the one-window-
    // pass re-expression; views deduped per (user, ts) on both sides
    "q58_asof_join" ->
      """WITH clicks AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'click'),
        |views AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS value
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT c.event_id, c.user_id, v.value AS asof_value
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND c.ts >= v.ts
        |ORDER BY c.event_id""".stripMargin,
    // q59: the oracle states the BETWEEN join directly; the engine side
    // is the bin-expanded equi-join (same pairs by construction)
    "q59_range_join" ->
      """SELECT b.band_id, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem l JOIN (SELECT i AS band_id, i*2000 AS lo, i*2000+2999 AS hi
        |    FROM range(0, 41) t(i)) b
        |  ON l.l_extendedprice >= b.lo AND l.l_extendedprice <= b.hi
        |GROUP BY b.band_id ORDER BY b.band_id""".stripMargin,
    "q56_higher_order" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(str_split(text, ' '), w -> length(w) > 5)) AS BIGINT) AS n_long,
        |  CAST(list_sum(list_transform(str_split(text, ' '), w -> length(w))) AS BIGINT) AS chars,
        |  array_to_string(list_transform(str_split(text, ' ')[1:3], w -> upper(w)), '-') AS head3,
        |  len(list_filter(str_split(text, ' '), w -> w = 'the')) > 0 AS has_the
        |FROM documents ORDER BY doc_id""".stripMargin,
    // dyadic decay weights: exact decimal accumulate, final /2^40 is an
    // exponent shift — exact across engines by construction
    "q55_time_decay" ->
      """SELECT user_id,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(20,6)) *
        |           CAST(POWER(2, 40 - LEAST(DATEDIFF('day', CAST(ts AS DATE),
        |             (SELECT MAX(CAST(ts AS DATE)) FROM events)), 40)) AS DECIMAL(16,0))) AS DOUBLE)
        |    / POWER(2, 40), 4) AS decayed_value,
        |  COUNT(*) AS n
        |FROM events
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q46_array_agg" ->
      """SELECT o_custkey, rank, price FROM (
        |  SELECT o_custkey,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank,
        |    o_totalprice AS price,
        |    COUNT(*) OVER (PARTITION BY o_custkey) AS cnt
        |  FROM orders
        |) WHERE rank <= 3 AND cnt >= 3 ORDER BY o_custkey, rank""".stripMargin,
    // both engines compute lower + (upper - lower) * frac on doubles —
    // bit-identical interpolation (verified at sf0.01 and sf0.1)
    "q33_percentiles" ->
      """SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS p50,
        | quantile_cont(l_extendedprice, 0.9) AS p90, COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q29_anti_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // DuckDB's native ASOF JOIN is the oracle for the union+window as-of
    "q30_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        |  FROM events),
        |c AS (SELECT user_id, ts FROM e WHERE event_type = 'click'),
        |p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
        |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
    // the oracle plants the exact count and the accuracy outcome: the HLL
    // estimate drifting outside its published 5% envelope turns this red
    "q31_approx_distinct" ->
      """SELECT COUNT(DISTINCT user_id) AS exact_n, true AS within_5pct
        |FROM events""".stripMargin,
    // GROUPING() is engine-portable: 1 marks the aggregated-away column
    "q40_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        | CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio, o_orderstatus ASC NULLS FIRST,
        |  o_orderpriority ASC NULLS FIRST""".stripMargin,
    // UNION ALL melt = the oracle's unpivot; decimal sums exact per measure
    "q39_unpivot" ->
      """WITH m AS (
        |  SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', l_discount FROM lineitem)
        |SELECT measure, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM m GROUP BY measure ORDER BY measure""".stripMargin,
    "q37_multiset_setops" ->
      """WITH hi AS (SELECT o_custkey FROM orders WHERE o_totalprice > 100000),
        |fo AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |ea AS (SELECT o_custkey FROM hi EXCEPT ALL SELECT o_custkey FROM fo),
        |ia AS (SELECT o_custkey FROM hi INTERSECT ALL SELECT o_custkey FROM fo)
        |SELECT 'except_all' AS op, o_custkey, COUNT(*) AS n FROM ea GROUP BY o_custkey
        |UNION ALL
        |SELECT 'intersect_all' AS op, o_custkey, COUNT(*) AS n FROM ia GROUP BY o_custkey
        |ORDER BY op, o_custkey""".stripMargin,
    // decimal window sum / frame count: both engines divide the same
    // exact operands (day_value carries <= 6 decimals by construction)
    "q38_range_frame" ->
      """WITH d AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
        |   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS day_value,
        |   datediff('day', DATE '1970-01-01', CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS day_num
        | FROM events GROUP BY 1, 2, 4)
        |SELECT CAST(day AS VARCHAR) AS day, event_type, day_value,
        | COUNT(*) OVER w AS n_days,
        | CAST(SUM(CAST(day_value AS DECIMAL(18,6))) OVER w AS DOUBLE)
        |   / (COUNT(*) OVER w) AS avg3d
        |FROM d
        |WINDOW w AS (PARTITION BY event_type ORDER BY day_num
        |  RANGE BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY day, event_type""".stripMargin,
    // price*n > 2*sum over DECIMALs: exact in both engines regardless of
    // aggregation order; output columns are raw table values
    "q36_correlated_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE CAST(o_totalprice AS DECIMAL(18,2))
        |    * (SELECT COUNT(*) FROM orders c WHERE c.o_custkey = o.o_custkey)
        |  > 2 * (SELECT SUM(CAST(o2.o_totalprice AS DECIMAL(18,2)))
        |    FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q35_pivot" ->
      """SELECT user_id % 10 AS bucket,
        | COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        | COUNT(*) FILTER (WHERE event_type = 'error') AS error,
        | COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        | COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        | COUNT(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin,
    // planted envelope, q31-style: the oracle states the outcome per group
    "q34_approx_percentiles" ->
      """SELECT l_returnflag, true AS within_1pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // plain inequality join — the banding is an engine-side plan choice,
    // invisible in the result
    "q32_range_join" ->
      """SELECT e.event_id, COUNT(*) AS n_clicks
        |FROM events e JOIN events c
        |  ON c.user_id = e.user_id
        |  AND e.event_type = 'error' AND c.event_type = 'click'
        |  AND c.ts >= e.ts - INTERVAL 1 HOUR AND c.ts <= e.ts
        |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin,
    "q27_salted_agg" ->
      """SELECT event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q28_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q25_hash_sample" ->
      """SELECT lang, COUNT(*) AS n,
        | CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |FROM documents
        |WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 = 0
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q26_sessionize" ->
      """WITH b AS (SELECT user_id, ts, event_id, epoch_us(ts) AS us,
        |   lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |m AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |   THEN 1 ELSE 0 END AS new_s FROM b),
        |s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
        |  FROM m)
        |SELECT user_id, CAST(sid AS BIGINT) AS session_idx,
        | strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        | COUNT(*) AS n_events,
        | CAST(MAX(us) - MIN(us) AS DOUBLE) / 1000000.0 AS duration_secs
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_idx""".stripMargin,
    "q22_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,
    "q23_union_all" ->
      """SELECT o_orderstatus, bucket, COUNT(*) AS n FROM (
        |  SELECT o_orderstatus, 'high' AS bucket FROM orders WHERE o_totalprice > 150000
        |  UNION ALL
        |  SELECT o_orderstatus, 'low' AS bucket FROM orders WHERE o_totalprice <= 150000)
        |GROUP BY o_orderstatus, bucket ORDER BY o_orderstatus, bucket""".stripMargin,
    "q24_running_window" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS run_total,
        | lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey LIMIT 2000""".stripMargin,
    "q21_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q01_agg_lineitem" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_topk_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q04_count_star" -> "SELECT COUNT(*) AS cnt FROM lineitem",
    "q05_count_distinct" ->
      """SELECT COUNT(DISTINCT l_partkey) AS n_parts,
        | COUNT(DISTINCT l_suppkey) AS n_supps FROM lineitem""".stripMargin,
    "q06_minmax" ->
      """SELECT l_returnflag, MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
        | MIN(CAST(l_shipdate AS DATE)) AS min_ship, MAX(CAST(l_shipdate AS DATE)) AS max_ship
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q07_join_agg" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q08_sort_multi" ->
      """SELECT o_orderpriority, o_orderstatus, o_orderkey FROM orders
        |WHERE o_totalprice > 400000
        |ORDER BY o_orderpriority, o_orderstatus DESC, o_orderkey""".stripMargin,
    "q09_null_filter" ->
      """SELECT event_type, COUNT(*) AS n, COUNT(props) AS n_props
        |FROM events WHERE props IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q10_like" ->
      """SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%re%'
        |ORDER BY p_partkey""".stripMargin,
    "q11_in" ->
      """SELECT o_orderstatus, COUNT(*) AS n FROM orders
        |WHERE o_orderstatus IN ('O','F')
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q12_between" ->
      """SELECT COUNT(*) AS n,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem WHERE l_quantity BETWEEN 10 AND 20""".stripMargin,
    "q13_empty_agg" ->
      """SELECT COUNT(*) AS cnt,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | MIN(l_quantity) AS min_qty
        |FROM lineitem WHERE l_quantity < -1""".stripMargin,
    "q14_join3_agg" ->
      """SELECT n_name, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q15_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q16_except" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal < 0
        |EXCEPT SELECT o_custkey AS c_custkey FROM orders
        | WHERE o_totalprice > 200000
        |ORDER BY c_custkey""".stripMargin,
    "q17_having" ->
      """SELECT l_partkey, COUNT(*) AS n FROM lineitem
        |GROUP BY l_partkey HAVING COUNT(*) >= 8
        |ORDER BY n DESC, l_partkey LIMIT 50""".stripMargin,
    "q18_events_hourly" ->
      """SELECT strftime(ts, '%Y-%m-%d %H:00') AS hour, event_type,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "q19_daily_users" ->
      """SELECT CAST(ts AS DATE) AS day, COUNT(DISTINCT user_id) AS n_users,
        | COUNT(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q20_semi_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
  )
}
