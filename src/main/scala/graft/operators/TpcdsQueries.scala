package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A TPC-DS REPRESENTATIVE SUBSET as driver gates (`tpcds03`…`tpcds89`)
  * — the query SHAPES TPC-H lacks, adapted onto the driver's TPC-H-ish
  * synthetic schema (there is no dsdgen in this environment, and the
  * testdata is fixed): multi-level ROLLUPs over retail-style
  * hierarchies, GROUPING SETS, GROUPING() hierarchy columns, wide star
  * joins, CASE-count batteries, period-over-period self-joins of
  * aggregates, and window ranks over rolled-up aggregates. Each body
  * documents the TPC-DS query whose STRUCTURE it mirrors; literals and
  * dimensions map onto the synthetic domain the same way
  * [[TpchQueries]] maps validation parameters.
  *
  * Same one-shared-SQL-text discipline as [[TpchQueries]]: the retail
  * dimensions are DERIVED deterministically from the base tables by one
  * text ([[derivations]]) evaluated identically on both engines — Spark
  * registers them as `*_ds` temp views, the DuckDB oracle prepends them
  * as CTEs — and the query bodies are byte-identical across engines.
  *
  * Determinism rules (repo-wide): float SUM/AVG go through the decimal
  * accumulate (`CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`), window
  * sums likewise accumulate in decimal, EXTRACT casts to INTEGER, every
  * ORDER BY key that can be NULL (rollup supergroups) pins NULLS FIRST,
  * and every cut has a unique tie-break.
  *
  * 100 TB lens: the fact view (`sales_ds`) is lineitem⋈orders on the
  * order key — co-partitionable, and every dimension here is
  * broadcast-sized by construction (part/supplier/customer ⋈ geo), so
  * each body plans as one fact scan + broadcast hash joins + one
  * shuffle for the (grouped) aggregate; ROLLUP/GROUPING SETS expand in
  * the partial aggregate, not as extra scans.
  */
object TpcdsQueries {

  /** Retail-dimension derivations, parameterized by how a RAW table is
    * referenced (Spark: `tpcds_raw_*` temp views; oracle: DuckDB view
    * names). One text, two engines. */
  private def derivations(src: String => String): Seq[(String, String)] = Seq(
    // TPC-DS item: category/class/brand hierarchy from part
    "item_ds" ->
      s"""SELECT p_partkey AS i_item_sk, p_brand AS i_brand,
         |  p_type AS i_category,
         |  CONCAT('class', CAST(p_size % 5 AS INTEGER)) AS i_class,
         |  p_size AS i_size, p_retailprice AS i_price
         |FROM ${src("part")}""".stripMargin,
    // TPC-DS store: supplier placed in its nation/region geography
    "store_ds" ->
      s"""SELECT s_suppkey AS st_store_sk, n_name AS st_state,
         |  r_name AS st_country, s_acctbal AS st_bal
         |FROM ${src("supplier")}, ${src("nation")}, ${src("region")}
         |WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey"""
        .stripMargin,
    // TPC-DS customer + customer_address: segment and geography
    "cust_ds" ->
      s"""SELECT c_custkey AS cd_cust_sk, c_mktsegment AS cd_segment,
         |  n_name AS cd_state, r_name AS cd_country, c_acctbal AS cd_bal
         |FROM ${src("customer")}, ${src("nation")}, ${src("region")}
         |WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey"""
        .stripMargin,
    // TPC-DS store_returns: the returned half of 'R'-flagged lines —
    // FLOOR halves the quantity so a matched return OFFSETS, not zeroes
    "returns_ds" ->
      s"""SELECT l_orderkey AS sr_order, l_linenumber AS sr_line,
         |  FLOOR(l_quantity / 2) AS sr_qty
         |FROM ${src("lineitem")}
         |WHERE l_returnflag = 'R'""".stripMargin,
    // TPC-DS store_sales (+date_dim folded in): the sales fact with
    // calendar fields and a synthetic sales CHANNEL
    "sales_ds" ->
      s"""SELECT l_orderkey AS ss_order, l_linenumber AS ss_line,
         |  l_partkey AS ss_item_sk, l_suppkey AS ss_store_sk,
         |  o_custkey AS ss_cust_sk,
         |  CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS ss_year,
         |  CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS ss_moy,
         |  CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS ss_qoy,
         |  l_quantity AS ss_qty, l_extendedprice AS ss_price,
         |  l_discount AS ss_disc,
         |  l_extendedprice * (1 - l_discount) AS ss_net,
         |  CASE CAST((l_orderkey + l_linenumber) % 3 AS INTEGER)
         |    WHEN 0 THEN 'store' WHEN 1 THEN 'web' ELSE 'catalog'
         |    END AS ss_channel
         |FROM ${src("lineitem")}, ${src("orders")}
         |WHERE l_orderkey = o_orderkey""".stripMargin)

  /** Decimal-accumulate SUM (deterministic across engines). */
  private def D(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(18,4))) AS DOUBLE)"

  /** Decimal-accumulate AVG: exact sum / exact count. */
  private def A(e: String): String = s"${D(e)} / COUNT($e)"

  /** Query bodies — byte-identical on both engines. */
  private[graft] val bodies: Seq[(String, String)] = Seq(
    // ---- TPC-DS q3 shape: year × brand aggregate under a category
    // filter, ordered by the measure (the simplest ds reporting query)
    "tpcds03_brand_year" ->
      s"""SELECT ss_year, i_brand, ${D("ss_net")} AS sum_agg
         |FROM sales_ds, item_ds
         |WHERE ss_item_sk = i_item_sk AND i_category = 'ECONOMY'
         |  AND ss_moy = 11
         |GROUP BY ss_year, i_brand
         |ORDER BY ss_year, sum_agg DESC, i_brand""".stripMargin,
    // ---- TPC-DS q7 shape: four averaged measures for one customer
    // segment across the item dimension
    "tpcds07_segment_avgs" ->
      s"""SELECT i_brand, ${A("ss_qty")} AS agg1, ${A("ss_price")} AS agg2,
         |  ${A("ss_disc")} AS agg3, ${A("ss_net")} AS agg4
         |FROM sales_ds, item_ds, cust_ds
         |WHERE ss_item_sk = i_item_sk AND ss_cust_sk = cd_cust_sk
         |  AND cd_segment = 'BUILDING' AND ss_year = 1997
         |GROUP BY i_brand
         |ORDER BY i_brand""".stripMargin,
    // ---- TPC-DS q18 shape: averages over a geographic ROLLUP
    // (country, state) — supergroup rows carry NULLs
    "tpcds18_rollup_geo" ->
      s"""SELECT cd_country, cd_state, ${A("ss_qty")} AS agg1,
         |  ${A("ss_price")} AS agg2, ${A("ss_net")} AS agg3
         |FROM sales_ds, cust_ds
         |WHERE ss_cust_sk = cd_cust_sk AND ss_year = 1998
         |GROUP BY ROLLUP(cd_country, cd_state)
         |ORDER BY cd_country NULLS FIRST, cd_state NULLS FIRST"""
        .stripMargin,
    // ---- TPC-DS q22 shape: three-level item-hierarchy ROLLUP
    // (category, brand, class) over a quantity measure
    "tpcds22_rollup_item" ->
      s"""SELECT i_category, i_brand, i_class, ${A("ss_qty")} AS qoh
         |FROM sales_ds, item_ds
         |WHERE ss_item_sk = i_item_sk AND ss_year BETWEEN 1998 AND 1999
         |GROUP BY ROLLUP(i_category, i_brand, i_class)
         |ORDER BY qoh, i_category NULLS FIRST, i_brand NULLS FIRST,
         |  i_class NULLS FIRST""".stripMargin,
    // ---- TPC-DS q27 shape: GROUPING SETS over (category × state) with
    // the state margin — the partial-rollup form q27 uses
    "tpcds27_grouping_sets" ->
      s"""SELECT i_category, st_state,
         |  CAST(GROUPING(st_state) AS INTEGER) AS g_state,
         |  ${A("ss_qty")} AS agg1, ${A("ss_net")} AS agg2
         |FROM sales_ds, item_ds, store_ds
         |WHERE ss_item_sk = i_item_sk AND ss_store_sk = st_store_sk
         |  AND ss_year = 1997
         |GROUP BY GROUPING SETS ((i_category, st_state), (i_category))
         |ORDER BY i_category, st_state NULLS FIRST""".stripMargin,
    // ---- TPC-DS q36 shape: gross-margin ratio over a ROLLUP with the
    // GROUPING()-derived hierarchy level column
    "tpcds36_margin_rollup" ->
      s"""SELECT ${D("ss_net")} / ${D("ss_price")} AS gross_margin,
         |  i_category, i_class,
         |  CAST(GROUPING(i_category) + GROUPING(i_class) AS INTEGER)
         |    AS lochierarchy
         |FROM sales_ds, item_ds
         |WHERE ss_item_sk = i_item_sk AND ss_year = 1998
         |GROUP BY ROLLUP(i_category, i_class)
         |ORDER BY lochierarchy DESC, i_category NULLS FIRST,
         |  i_class NULLS FIRST""".stripMargin,
    // ---- TPC-DS q59 shape: period-over-period comparison — the same
    // aggregate computed for two years and self-joined into a ratio
    "tpcds59_period_compare" ->
      s"""WITH y AS (
         |  SELECT st_state, ss_year, ${D("ss_net")} AS rev
         |  FROM sales_ds, store_ds
         |  WHERE ss_store_sk = st_store_sk AND ss_year IN (1996, 1997)
         |  GROUP BY st_state, ss_year
         |)
         |SELECT a.st_state, a.rev AS rev_1996, b.rev AS rev_1997,
         |  b.rev / a.rev AS ratio
         |FROM y a JOIN y b ON a.st_state = b.st_state
         |WHERE a.ss_year = 1996 AND b.ss_year = 1997
         |ORDER BY a.st_state""".stripMargin,
    // ---- TPC-DS q64 shape (lite): the WIDE star — fact + item + store
    // geo + customer geo (seven base tables under the views)
    "tpcds64_wide_star" ->
      s"""SELECT st_country, cd_segment, i_category, COUNT(*) AS cnt,
         |  ${D("ss_net")} AS rev
         |FROM sales_ds, item_ds, store_ds, cust_ds
         |WHERE ss_item_sk = i_item_sk AND ss_store_sk = st_store_sk
         |  AND ss_cust_sk = cd_cust_sk AND ss_year BETWEEN 1996 AND 1998
         |GROUP BY st_country, cd_segment, i_category
         |ORDER BY st_country, cd_segment, i_category""".stripMargin,
    // ---- TPC-DS q88 shape: the CASE-count battery — eight bucket
    // counts from ONE fact scan (no joins, pure conditional aggregation)
    "tpcds88_case_battery" ->
      s"""SELECT
         |  COUNT(CASE WHEN ss_qty < 13 AND ss_moy <= 3 THEN 1 END) AS b1,
         |  COUNT(CASE WHEN ss_qty < 13 AND ss_moy BETWEEN 4 AND 6 THEN 1 END) AS b2,
         |  COUNT(CASE WHEN ss_qty < 13 AND ss_moy BETWEEN 7 AND 9 THEN 1 END) AS b3,
         |  COUNT(CASE WHEN ss_qty < 13 AND ss_moy >= 10 THEN 1 END) AS b4,
         |  COUNT(CASE WHEN ss_qty >= 13 AND ss_moy <= 3 THEN 1 END) AS b5,
         |  COUNT(CASE WHEN ss_qty >= 13 AND ss_moy BETWEEN 4 AND 6 THEN 1 END) AS b6,
         |  COUNT(CASE WHEN ss_qty >= 13 AND ss_moy BETWEEN 7 AND 9 THEN 1 END) AS b7,
         |  COUNT(CASE WHEN ss_qty >= 13 AND ss_moy >= 10 THEN 1 END) AS b8
         |FROM sales_ds
         |WHERE ss_year = 1999""".stripMargin,
    // ---- TPC-DS q14 shape (lite): cross-channel GROUPING SETS —
    // (channel, brand), (channel), () — the ds channel-rollup idiom
    "tpcds14_channel_sets" ->
      s"""SELECT ss_channel, i_brand, ${D("ss_net")} AS sales,
         |  COUNT(*) AS num_sales
         |FROM sales_ds, item_ds
         |WHERE ss_item_sk = i_item_sk AND ss_year = 1999
         |GROUP BY GROUPING SETS ((ss_channel, i_brand), (ss_channel), ())
         |ORDER BY ss_channel NULLS FIRST, i_brand NULLS FIRST"""
        .stripMargin,
    // ---- TPC-DS q67 shape: RANK() over a rolled-up aggregate — top 5
    // (brand, quarter) cells per category including supergroup rows
    "tpcds67_rank_rollup" ->
      s"""WITH agg AS (
         |  SELECT i_category, i_brand, ss_qoy, ${D("ss_net")} AS sumsales
         |  FROM sales_ds, item_ds
         |  WHERE ss_item_sk = i_item_sk AND ss_year = 1998
         |  GROUP BY ROLLUP(i_category, i_brand, ss_qoy)
         |)
         |SELECT i_category, i_brand, ss_qoy, sumsales,
         |  CAST(rk AS BIGINT) AS rk
         |FROM (
         |  SELECT i_category, i_brand, ss_qoy, sumsales,
         |    RANK() OVER (PARTITION BY i_category
         |      ORDER BY sumsales DESC, i_brand NULLS FIRST,
         |        ss_qoy NULLS FIRST) AS rk
         |  FROM agg) t
         |WHERE rk <= 5
         |ORDER BY i_category NULLS FIRST, rk, i_brand NULLS FIRST,
         |  ss_qoy NULLS FIRST""".stripMargin,
    // ---- TPC-DS q51 shape: per-channel cumulative sales FULL-joined —
    // two aggregates window into running totals, the FULL join aligns
    // periods present on either side, the filter compares the cumsums
    "tpcds51_cumulative_compare" ->
      s"""WITH sc AS (
         |  SELECT i_brand, ss_moy, ${D("ss_net")} AS s
         |  FROM sales_ds, item_ds
         |  WHERE ss_item_sk = i_item_sk AND ss_channel = 'store'
         |    AND ss_year = 1998
         |  GROUP BY i_brand, ss_moy
         |), wc AS (
         |  SELECT i_brand, ss_moy, ${D("ss_net")} AS s
         |  FROM sales_ds, item_ds
         |  WHERE ss_item_sk = i_item_sk AND ss_channel = 'web'
         |    AND ss_year = 1998
         |  GROUP BY i_brand, ss_moy
         |), cum AS (
         |  SELECT COALESCE(sc.i_brand, wc.i_brand) AS brand,
         |    COALESCE(sc.ss_moy, wc.ss_moy) AS moy,
         |    CAST(SUM(CAST(sc.s AS DECIMAL(18,4))) OVER (
         |      PARTITION BY COALESCE(sc.i_brand, wc.i_brand)
         |      ORDER BY COALESCE(sc.ss_moy, wc.ss_moy)) AS DOUBLE)
         |      AS store_cum,
         |    CAST(SUM(CAST(wc.s AS DECIMAL(18,4))) OVER (
         |      PARTITION BY COALESCE(sc.i_brand, wc.i_brand)
         |      ORDER BY COALESCE(sc.ss_moy, wc.ss_moy)) AS DOUBLE)
         |      AS web_cum
         |  FROM sc FULL JOIN wc
         |    ON sc.i_brand = wc.i_brand AND sc.ss_moy = wc.ss_moy
         |)
         |SELECT brand, moy, store_cum, web_cum
         |FROM cum
         |WHERE web_cum > store_cum
         |ORDER BY brand, moy""".stripMargin,
    // ---- TPC-DS q73 shape: the count HISTOGRAM — items-per-trip
    // aggregated per order, re-joined to the customer dimension, then
    // re-aggregated into a (segment, basket-size) frequency table
    "tpcds73_count_histogram" ->
      s"""SELECT cd_segment, cnt, COUNT(*) AS num_trips
         |FROM (
         |  SELECT ss_order, ss_cust_sk, COUNT(*) AS cnt
         |  FROM sales_ds
         |  WHERE ss_year = 1997
         |  GROUP BY ss_order, ss_cust_sk
         |) t, cust_ds
         |WHERE ss_cust_sk = cd_cust_sk AND cnt BETWEEN 3 AND 5
         |GROUP BY cd_segment, cnt
         |ORDER BY cd_segment, cnt""".stripMargin,
    // ---- TPC-DS q93 shape: returns OFFSET sales — the one deliberate
    // fact-to-fact join of the family (sales ⟕ returns on the line id:
    // co-partitioned shuffle join at scale, never broadcast), actual
    // revenue recomputed per line under the CASE
    "tpcds93_returns_offset" ->
      s"""WITH act AS (
         |  SELECT ss_cust_sk,
         |    CASE WHEN sr_order IS NOT NULL
         |      THEN (ss_qty - sr_qty) * ss_price
         |      ELSE ss_qty * ss_price END AS act_sales
         |  FROM sales_ds LEFT JOIN returns_ds
         |    ON ss_order = sr_order AND ss_line = sr_line
         |  WHERE ss_year = 1996
         |)
         |SELECT ss_cust_sk, ${D("act_sales")} AS sumsales
         |FROM act
         |GROUP BY ss_cust_sk
         |ORDER BY sumsales, ss_cust_sk
         |LIMIT 50""".stripMargin,
    // ---- TPC-DS q89 shape: monthly brand sales vs the category's
    // window total — the share computed with a DECIMAL window sum so
    // both engines accumulate identically
    "tpcds89_share_window" ->
      s"""WITH agg AS (
         |  SELECT i_category, i_brand, ss_moy, ${D("ss_net")} AS s
         |  FROM sales_ds, item_ds
         |  WHERE ss_item_sk = i_item_sk AND ss_year = 1997
         |  GROUP BY i_category, i_brand, ss_moy
         |)
         |SELECT i_category, i_brand, ss_moy, s,
         |  s / CAST(SUM(CAST(s AS DECIMAL(18,4)))
         |    OVER (PARTITION BY i_category) AS DOUBLE) AS share
         |FROM agg
         |ORDER BY i_category, i_brand, ss_moy""".stripMargin)

  /** Register the raw + derived temp views for one scale dir. Cheap
    * (metadata only) and idempotent, so every gate calls it. */
  /** Memoized per (session, dir) like [[TpchQueries.register]]: the
    * re-registration cost ~0.5 s per gate run; views are lazy metadata. */
  private val registeredFor =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()
  private def register(spark: SparkSession, dir: String): Unit =
    // one dir registered per session at a time: switching dirs re-registers
    if (registeredFor.put(spark, dir) != dir) {
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem").foreach { t =>
        graft.Tables.t(spark, dir, t).createOrReplaceTempView(s"tpcds_raw_$t")
      }
      derivations(n => s"tpcds_raw_$n").foreach { case (view, sql) =>
        spark.sql(sql).createOrReplaceTempView(view)
      }
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    bodies.map { case (name, body) =>
      name -> ((spark: SparkSession, dir: String) => {
        register(spark, dir)
        spark.sql(body)
      })
    }.toMap

  /** Oracle = the SAME body prefixed by the derivations as CTEs (the
    * `_ds` names never shadow a base table). Bodies opening their own
    * WITH merge into the prologue. */
  def oracleSql: Map[String, String] = {
    val prologue = derivations(identity).map { case (v, sql) =>
      s"$v AS (\n$sql\n)"
    }.mkString("WITH ", ", ", "")
    bodies.map { case (name, body) =>
      val t = body.trim
      val merged =
        if (t.toUpperCase.startsWith("WITH"))
          prologue + ", " + t.drop(4).trim
        else prologue + "\n" + t
      name -> merged
    }.toMap
  }
}
