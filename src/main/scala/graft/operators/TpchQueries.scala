package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The 22 TPC-H queries as driver gates (`tpch01`–`tpch22`), run
  * verbatim modulo three documented adaptation classes — the point is
  * external legibility of the relational claim plus the decimal /
  * null-ordering / correlated-subquery corners the paraphrased q-corpus
  * misses:
  *
  *  1. SCHEMA PLUMBING. The driver's synthetic star schema is TPC-H-ish
  *     but misses `partsupp` and several columns (commit/receipt dates,
  *     ship mode/instruct, comments, phones, mfgr/container). Each is
  *     DERIVED deterministically from existing columns by ONE shared
  *     SQL text ([[derivations]]) evaluated identically on both engines:
  *     Spark registers the derivations as `<table>_x` temp views; the
  *     DuckDB oracle prepends them as CTEs of the same names. Query
  *     bodies are byte-identical across both engines.
  *  2. DIALECT + DETERMINISM. Float aggregates use the repo-wide
  *     decimal-accumulate convention (`CAST(SUM(CAST(x AS
  *     DECIMAL(18,4))) AS DOUBLE)` — double summation order would
  *     otherwise differ between engines); `EXTRACT` results cast to
  *     INTEGER (engines disagree on the width); every ORDER BY under a
  *     LIMIT gains a unique tie-break key so the cut is deterministic.
  *  3. LITERALS. Validation parameters map onto the synthetic domain
  *     (`NATION_7` for GERMANY, `p_type = 'ECONOMY'` for the dressed
  *     type strings, date windows inside the generated 1995–2001 span,
  *     the q11 fraction fixed at 0.0005 so both SFs return rows, and
  *     q22's "customers without orders" scoped to orders since
  *     1999-01-01 — every synthetic customer has SOME order).
  */
object TpchQueries {

  /** Derived-table SQL, parameterized by how a RAW table is referenced
    * (Spark: the `tpch_raw_*` temp views; oracle: the DuckDB view names).
    * One text, two engines — the derivations must agree bit for bit. */
  private def derivations(src: String => String): Seq[(String, String)] = Seq(
    "lineitem_x" ->
      s"""SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
         |  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         |  l_shipdate,
         |  CAST(l_shipdate AS DATE)
         |    + (CAST((l_orderkey * 7 + l_linenumber * 3) % 30 AS INTEGER) - 15)
         |      * INTERVAL '1' DAY AS l_commitdate,
         |  CAST(l_shipdate AS DATE)
         |    + CAST(l_linenumber % 10 + 1 AS INTEGER)
         |      * INTERVAL '1' DAY AS l_receiptdate,
         |  CASE CAST((l_orderkey + l_linenumber) % 7 AS INTEGER)
         |    WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP' WHEN 2 THEN 'AIR'
         |    WHEN 3 THEN 'RAIL' WHEN 4 THEN 'TRUCK' WHEN 5 THEN 'REG AIR'
         |    ELSE 'FOB' END AS l_shipmode,
         |  CASE CAST(l_linenumber % 4 AS INTEGER)
         |    WHEN 0 THEN 'DELIVER IN PERSON' WHEN 1 THEN 'COLLECT COD'
         |    WHEN 2 THEN 'NONE' ELSE 'TAKE BACK RETURN' END AS l_shipinstruct
         |FROM ${src("lineitem")}""".stripMargin,
    "orders_x" ->
      s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         |  o_orderdate, o_orderpriority,
         |  CONCAT('Clerk#', o_orderkey % 1000) AS o_clerk,
         |  0 AS o_shippriority,
         |  CASE WHEN o_orderkey % 7 = 0 THEN 'special handling requests noted'
         |       ELSE 'standard order' END AS o_comment
         |FROM ${src("orders")}""".stripMargin,
    "customer_x" ->
      s"""SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
         |  CONCAT(10 + c_nationkey, '-', c_custkey % 1000) AS c_phone,
         |  CONCAT('addr-', c_custkey) AS c_address,
         |  CASE WHEN c_custkey % 9 = 0 THEN 'customer complaints pending'
         |       ELSE 'ok' END AS c_comment
         |FROM ${src("customer")}""".stripMargin,
    "supplier_x" ->
      s"""SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
         |  CONCAT('saddr-', s_suppkey) AS s_address,
         |  CONCAT(10 + s_nationkey, '-', s_suppkey % 1000) AS s_phone,
         |  CASE WHEN s_suppkey % 11 = 0
         |       THEN 'slow Customer service Complaints logged'
         |       ELSE 'prompt service' END AS s_comment
         |FROM ${src("supplier")}""".stripMargin,
    "part_x" ->
      s"""SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice,
         |  CONCAT('Manufacturer#', p_partkey % 5 + 1) AS p_mfgr,
         |  CASE CAST(p_partkey % 8 AS INTEGER)
         |    WHEN 0 THEN 'SM CASE' WHEN 1 THEN 'MED BOX' WHEN 2 THEN 'LG BOX'
         |    WHEN 3 THEN 'JUMBO PKG' WHEN 4 THEN 'SM PACK' WHEN 5 THEN 'MED BAG'
         |    WHEN 6 THEN 'WRAP JAR' ELSE 'LG PKG' END AS p_container
         |FROM ${src("part")}""".stripMargin,
    // partsupp never existed: one row per observed (part, supplier) pair
    // with deterministic availqty/supplycost. NOTE (100 TB lens): this
    // CTE re-derives (a DISTINCT shuffle) on every reference — q2 pays
    // it twice. That is the honest price of a missing base table in a
    // CORRECTNESS gate; a real deployment materializes it once (CTAS,
    // or an incremental view over lineitem) and every tpch body below
    // reads the materialized table unchanged.
    "partsupp_x" ->
      s"""SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         |  CAST((l_partkey * 37 + l_suppkey * 13) % 9999 + 1 AS INTEGER)
         |    AS ps_availqty,
         |  CAST((l_partkey * 31 + l_suppkey * 7) % 10000 AS DOUBLE) / 100.0
         |    + 1.0 AS ps_supplycost,
         |  CONCAT('ps-', l_partkey, '-', l_suppkey) AS ps_comment
         |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM ${src("lineitem")})"""
        .stripMargin)

  /** The repo-wide decimal-accumulate sum (dsum's SQL spelling). Scale 4
    * is EXACT for every summed expression here except q1's three-factor
    * charge (price, discount and tax are all 2-decimal values, so
    * price*(1-disc) has ≤4 decimals — no rounding, hence no
    * half-up-vs-half-even divergence between the engines; the charge
    * has ≤6 and takes scale 8 inline). */
  private def D(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(18,4))) AS DOUBLE)"

  private val Rev = "l_extendedprice * (1 - l_discount)"

  /** Query bodies — byte-identical on both engines. */
  private[graft] val bodies: Seq[(String, String)] = Seq(
    "tpch01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${D("l_quantity")} AS sum_qty,
         |  ${D("l_extendedprice")} AS sum_base_price,
         |  ${D(Rev)} AS sum_disc_price,
         |  CAST(SUM(CAST($Rev * (1 + l_tax) AS DECIMAL(18,8))) AS DOUBLE)
         |    AS sum_charge,
         |  ${D("l_quantity")} / COUNT(*) AS avg_qty,
         |  ${D("l_extendedprice")} / COUNT(*) AS avg_price,
         |  ${D("l_discount")} / COUNT(*) AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem_x
         |WHERE l_shipdate <= DATE '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "tpch02_min_cost_supplier" ->
      s"""SELECT s_acctbal, s_name, n_name, p_partkey, p_mfgr, s_address,
         |  s_phone
         |FROM part_x, supplier_x, partsupp_x, nation, region
         |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
         |  AND p_size = 15 AND p_type LIKE '%STANDARD%'
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'EUROPE'
         |  AND ps_supplycost = (
         |    SELECT MIN(ps_supplycost)
         |    FROM partsupp_x, supplier_x, nation, region
         |    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
         |      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |      AND r_name = 'EUROPE')
         |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
         |LIMIT 100""".stripMargin,
    "tpch03_shipping_priority" ->
      s"""SELECT l_orderkey, ${D(Rev)} AS revenue, o_orderdate, o_shippriority
         |FROM customer_x, orders_x, lineitem_x
         |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
         |  AND l_orderkey = o_orderkey
         |  AND o_orderdate < DATE '1996-03-15'
         |  AND l_shipdate > DATE '1996-03-15'
         |GROUP BY l_orderkey, o_orderdate, o_shippriority
         |ORDER BY revenue DESC, o_orderdate, l_orderkey
         |LIMIT 10""".stripMargin,
    "tpch04_order_priority" ->
      s"""SELECT o_orderpriority, COUNT(*) AS order_count
         |FROM orders_x
         |WHERE o_orderdate >= DATE '1996-07-01'
         |  AND o_orderdate < DATE '1996-10-01'
         |  AND EXISTS (SELECT * FROM lineitem_x
         |    WHERE l_orderkey = o_orderkey AND l_commitdate < l_receiptdate)
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin,
    "tpch05_local_supplier_volume" ->
      s"""SELECT n_name, ${D(Rev)} AS revenue
         |FROM customer_x, orders_x, lineitem_x, supplier_x, nation, region
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= DATE '1996-01-01'
         |  AND o_orderdate < DATE '1997-01-01'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,
    "tpch06_forecast_revenue" ->
      s"""SELECT ${D("l_extendedprice * l_discount")} AS revenue
         |FROM lineitem_x
         |WHERE l_shipdate >= DATE '1996-01-01'
         |  AND l_shipdate < DATE '1997-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "tpch07_volume_shipping" ->
      s"""SELECT supp_nation, cust_nation, l_year, ${D("volume")} AS revenue
         |FROM (
         |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |    CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
         |    $Rev AS volume
         |  FROM supplier_x, lineitem_x, orders_x, customer_x,
         |    nation n1, nation n2
         |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
         |    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
         |    AND c_nationkey = n2.n_nationkey
         |    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         |      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
         |    AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
         |) AS shipping
         |GROUP BY supp_nation, cust_nation, l_year
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "tpch08_market_share" ->
      s"""SELECT o_year,
         |  CAST(SUM(CAST(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END
         |    AS DECIMAL(18,4))) AS DOUBLE)
         |    / ${D("volume")} AS mkt_share
         |FROM (
         |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
         |    $Rev AS volume, n2.n_name AS nation
         |  FROM part_x, supplier_x, lineitem_x, orders_x, customer_x,
         |    nation n1, nation n2, region
         |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
         |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
         |    AND c_nationkey = n1.n_nationkey
         |    AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
         |    AND s_nationkey = n2.n_nationkey
         |    AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
         |    AND p_type = 'ECONOMY'
         |) AS all_nations
         |GROUP BY o_year
         |ORDER BY o_year""".stripMargin,
    "tpch09_product_profit" ->
      s"""SELECT nation, o_year, ${D("amount")} AS sum_profit
         |FROM (
         |  SELECT n_name AS nation,
         |    CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
         |    $Rev - ps_supplycost * l_quantity AS amount
         |  FROM part_x, supplier_x, lineitem_x, partsupp_x, orders_x, nation
         |  WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
         |    AND ps_partkey = l_partkey AND p_partkey = l_partkey
         |    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
         |    AND p_name LIKE '%red%'
         |) AS profit
         |GROUP BY nation, o_year
         |ORDER BY nation, o_year DESC""".stripMargin,
    "tpch10_returned_items" ->
      s"""SELECT c_custkey, c_name, ${D(Rev)} AS revenue, c_acctbal,
         |  n_name, c_address, c_phone, c_comment
         |FROM customer_x, orders_x, lineitem_x, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND o_orderdate >= DATE '1996-10-01'
         |  AND o_orderdate < DATE '1997-01-01'
         |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
         |GROUP BY c_custkey, c_name, c_acctbal, c_phone, n_name,
         |  c_address, c_comment
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin,
    "tpch11_important_stock" ->
      s"""SELECT ps_partkey, ${D("ps_supplycost * ps_availqty")} AS value
         |FROM partsupp_x, supplier_x, nation
         |WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
         |  AND n_name = 'NATION_7'
         |GROUP BY ps_partkey
         |HAVING ${D("ps_supplycost * ps_availqty")} > (
         |  SELECT ${D("ps_supplycost * ps_availqty")} * 0.0005
         |  FROM partsupp_x, supplier_x, nation
         |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
         |    AND n_name = 'NATION_7')
         |ORDER BY value DESC, ps_partkey""".stripMargin,
    "tpch12_shipmode_priority" ->
      s"""SELECT l_shipmode,
         |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
         |    OR o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS high_line_count,
         |  CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT'
         |    AND o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS low_line_count
         |FROM orders_x, lineitem_x
         |WHERE o_orderkey = l_orderkey AND l_shipmode IN ('MAIL', 'SHIP')
         |  AND l_commitdate < l_receiptdate AND l_shipdate < l_commitdate
         |  AND l_receiptdate >= DATE '1997-01-01'
         |  AND l_receiptdate < DATE '1998-01-01'
         |GROUP BY l_shipmode
         |ORDER BY l_shipmode""".stripMargin,
    "tpch13_customer_distribution" ->
      s"""SELECT c_count, COUNT(*) AS custdist
         |FROM (
         |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
         |  FROM customer_x LEFT OUTER JOIN orders_x ON c_custkey = o_custkey
         |    AND o_comment NOT LIKE '%special%requests%'
         |  GROUP BY c_custkey
         |) AS c_orders
         |GROUP BY c_count
         |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "tpch14_promotion_effect" ->
      s"""SELECT CAST(100.00 * SUM(CAST(CASE WHEN p_type LIKE 'PROMO%'
         |    THEN $Rev ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE)
         |    / ${D(Rev)} AS promo_revenue
         |FROM lineitem_x, part_x
         |WHERE l_partkey = p_partkey
         |  AND l_shipdate >= DATE '1996-09-01'
         |  AND l_shipdate < DATE '1996-10-01'""".stripMargin,
    "tpch15_top_supplier" ->
      s"""WITH revenue0 AS (
         |  SELECT l_suppkey AS supplier_no, ${D(Rev)} AS total_revenue
         |  FROM lineitem_x
         |  WHERE l_shipdate >= DATE '1996-01-01'
         |    AND l_shipdate < DATE '1996-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, s_address, s_phone, total_revenue
         |FROM supplier_x, revenue0
         |WHERE s_suppkey = supplier_no
         |  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
         |ORDER BY s_suppkey""".stripMargin,
    "tpch16_parts_supplier" ->
      s"""SELECT p_brand, p_type, p_size,
         |  COUNT(DISTINCT ps_suppkey) AS supplier_cnt
         |FROM partsupp_x, part_x
         |WHERE p_partkey = ps_partkey AND p_brand <> 'Brand#5'
         |  AND p_type NOT LIKE 'MEDIUM%'
         |  AND p_size IN (1, 2, 3, 4, 5, 6, 7, 8, 9)
         |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier_x
         |    WHERE s_comment LIKE '%Customer%Complaints%')
         |GROUP BY p_brand, p_type, p_size
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "tpch17_small_quantity" ->
      s"""SELECT ${D("l_extendedprice")} / 7.0 AS avg_yearly
         |FROM lineitem_x, part_x
         |WHERE p_partkey = l_partkey AND p_brand = 'Brand#3'
         |  AND p_container = 'MED BOX'
         |  AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem_x
         |    WHERE l_partkey = p_partkey)""".stripMargin,
    "tpch18_large_volume" ->
      s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
         |  ${D("l_quantity")} AS sum_qty
         |FROM customer_x, orders_x, lineitem_x
         |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem_x
         |    GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
         |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
         |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
         |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
         |LIMIT 100""".stripMargin,
    "tpch19_discounted_revenue" ->
      s"""SELECT ${D(Rev)} AS revenue
         |FROM lineitem_x, part_x
         |WHERE (p_partkey = l_partkey AND p_brand = 'Brand#1'
         |    AND p_container IN ('SM CASE', 'SM PACK')
         |    AND l_quantity >= 1 AND l_quantity <= 11
         |    AND p_size BETWEEN 1 AND 5
         |    AND l_shipmode IN ('AIR', 'REG AIR')
         |    AND l_shipinstruct = 'DELIVER IN PERSON')
         |  OR (p_partkey = l_partkey AND p_brand = 'Brand#2'
         |    AND p_container IN ('MED BAG', 'MED BOX')
         |    AND l_quantity >= 10 AND l_quantity <= 20
         |    AND p_size BETWEEN 1 AND 10
         |    AND l_shipmode IN ('AIR', 'REG AIR')
         |    AND l_shipinstruct = 'DELIVER IN PERSON')
         |  OR (p_partkey = l_partkey AND p_brand = 'Brand#3'
         |    AND p_container IN ('LG BOX', 'LG PKG')
         |    AND l_quantity >= 20 AND l_quantity <= 30
         |    AND p_size BETWEEN 1 AND 15
         |    AND l_shipmode IN ('AIR', 'REG AIR')
         |    AND l_shipinstruct = 'DELIVER IN PERSON')""".stripMargin,
    "tpch20_potential_promotion" ->
      s"""SELECT s_name, s_address
         |FROM supplier_x, nation
         |WHERE s_suppkey IN (
         |    SELECT ps_suppkey FROM partsupp_x
         |    WHERE ps_partkey IN (SELECT p_partkey FROM part_x
         |        WHERE p_name LIKE 'small%')
         |      AND ps_availqty > (
         |        SELECT 0.5 * SUM(l_quantity) FROM lineitem_x
         |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
         |          AND l_shipdate >= DATE '1996-01-01'
         |          AND l_shipdate < DATE '1997-01-01'))
         |  AND s_nationkey = n_nationkey AND n_name = 'NATION_9'
         |ORDER BY s_name""".stripMargin,
    "tpch21_waiting_suppliers" ->
      s"""SELECT s_name, COUNT(*) AS numwait
         |FROM supplier_x, lineitem_x l1, orders_x, nation
         |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
         |  AND o_orderstatus = 'F' AND l1.l_receiptdate > l1.l_commitdate
         |  AND EXISTS (SELECT * FROM lineitem_x l2
         |    WHERE l2.l_orderkey = l1.l_orderkey
         |      AND l2.l_suppkey <> l1.l_suppkey)
         |  AND NOT EXISTS (SELECT * FROM lineitem_x l3
         |    WHERE l3.l_orderkey = l1.l_orderkey
         |      AND l3.l_suppkey <> l1.l_suppkey
         |      AND l3.l_receiptdate > l3.l_commitdate)
         |  AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
         |GROUP BY s_name
         |ORDER BY numwait DESC, s_name
         |LIMIT 100""".stripMargin,
    "tpch22_global_sales" ->
      s"""SELECT cntrycode, COUNT(*) AS numcust,
         |  ${D("c_acctbal")} AS totacctbal
         |FROM (
         |  SELECT SUBSTRING(c_phone, 1, 2) AS cntrycode, c_acctbal, c_custkey
         |  FROM customer_x
         |  WHERE SUBSTRING(c_phone, 1, 2)
         |      IN ('10', '14', '20', '27', '30', '33', '34')
         |    AND c_acctbal > (
         |      SELECT ${D("c_acctbal")} / COUNT(*) FROM customer_x
         |      WHERE c_acctbal > 0.00 AND SUBSTRING(c_phone, 1, 2)
         |        IN ('10', '14', '20', '27', '30', '33', '34'))
         |) AS custsale
         |WHERE NOT EXISTS (SELECT * FROM orders_x
         |  WHERE o_custkey = c_custkey
         |    AND o_orderdate >= DATE '1999-01-01')
         |GROUP BY cntrycode
         |ORDER BY cntrycode""".stripMargin)

  /** Register the raw + derived temp views for one scale dir. Metadata
    * only and idempotent — and memoized per (session, dir): re-deriving
    * identical temp views cost ~0.6 s of parquet-footer reads + analysis
    * PER GATE RUN (22 gates × 4 bench runs ≈ a third of tpch_total). The
    * views are lazy; every query still computes from the parquet. */
  private val registeredFor =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()
  private def register(spark: SparkSession, dir: String): Unit =
    // one dir registered per session at a time: switching dirs re-registers
    // (the view names are session-global)
    if (registeredFor.put(spark, dir) != dir) {
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem").foreach { t =>
        graft.Tables.t(spark, dir, t).createOrReplaceTempView(s"tpch_raw_$t")
      }
      // region/nation need no derivation: the bodies reference them bare
      Seq("region", "nation").foreach(t =>
        spark.table(s"tpch_raw_$t").createOrReplaceTempView(t))
      derivations(n => s"tpch_raw_$n").foreach { case (view, sql) =>
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
    * oracle harness exposes each raw parquet as a view of its own name,
    * and no CTE shadows a base table — `_x` suffixes). A body that
    * opens its own WITH (q15) merges into the prologue. */
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
