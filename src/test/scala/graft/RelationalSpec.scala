package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites — one local JVM session, UTC, 8 threads. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      // the driver's Verify/Bench sessions install the extensions (TVFs,
      // ANN rewrite, the MV DDL parser); tests must exercise the same
      // session shape — suites still call MetaTvfs.register where they
      // need a TVF (idempotent re-registration)
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // driver-regenerated testdata carries isAdjustedToUTC=false; read micros
      // as session-TZ TIMESTAMP (UTC) like every prior round, not NTZ
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("every query has an oracle and runs at sf0.001") {
    val qs = SparkEntry.queries
    val os = SparkEntry.oracleSql
    // every oracle key must have a query; queries without oracle are the
    // documented weaker rows-only set
    assert(os.keySet.subsetOf(qs.keySet), s"orphan oracles: ${os.keySet -- qs.keySet}")
    qs.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      df.count() // must execute without throwing
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q01 agg semantics: groups and counts") {
    val rows = operators.Relational.q01AggLineitem(spark, sf).collect()
    assert(rows.length == 6) // 3 returnflags x 2 linestatus
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val cnt = Tables.t(spark, sf, "lineitem")
      .filter("l_shipdate <= timestamp'1998-09-02'").count()
    assert(total == cnt)
  }

  test("q13 empty-input aggregate defaults: COUNT=0, SUM/MIN null") {
    val r = operators.Relational.q13EmptyAgg(spark, sf).collect().head
    assert(r.getAs[Long]("cnt") == 0L)
    assert(r.isNullAt(r.fieldIndex("sum_qty")))
    assert(r.isNullAt(r.fieldIndex("min_qty")))
  }

  test("q03 topk is ordered desc") {
    val prices = operators.Relational.q03TopkLimit(spark, sf)
      .collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.length == 10)
    assert(prices.sameElements(prices.sorted(Ordering[Double].reverse)))
  }

  test("q15 window picks exactly one row per customer") {
    val df = operators.Relational.q15WindowTopn(spark, sf)
    assert(df.count() == df.select("o_custkey").distinct().count())
  }

  test("q23 single-scan CASE form equals the two-scan UNION ALL, with one scan") {
    val one = operators.Relational.q23UnionAll(spark, sf).collect().toSeq
    val two = operators.Relational.q23UnionAllTwoScan(spark, sf).collect().toSeq
    assert(one == two)
    // under AQE the pre-execution plan is an unfinalized AdaptiveSparkPlanExec
    // with no visible children — execute first, then count scans in the
    // finalized plan string (query-stage boundaries hide nodes from collect)
    val df = operators.Relational.q23UnionAll(spark, sf)
    df.collect() // finalize the adaptive plan
    // the AQE toString repeats the tree under "== Initial Plan ==" — count
    // scans only in the final section
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val scanCount = plan.linesIterator.count(l =>
      l.contains("FileScan parquet") || l.contains("BatchScan"))
    assert(scanCount == 1, s"expected a single table scan, got $scanCount in:\n$plan")
  }

  test("q30 as-of join matches a brute-force latest-prior-click per purchase") {
    import org.apache.spark.sql.functions.col
    val ev = Tables.t(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime * 1000 +
        r.getTimestamp(2).getNanos / 1000 % 1000, r.getString(3)))
    val clicksByUser = ev.filter(_._4 == "click").groupBy(_._2)
      .map { case (u, rs) => u -> rs.map(_._3).sorted }
    val expected = ev.filter(_._4 == "purchase").flatMap { case (id, u, ts, _) =>
      clicksByUser.get(u).flatMap { cs =>
        val prior = cs.takeWhile(_ <= ts)
        prior.lastOption.map(c => id -> (ts - c))
      }
    }.toMap
    val got = operators.Relational.q30AsofJoin(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(got.nonEmpty)
    assert(got == expected,
      s"missing=${(expected.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- expected.keySet).take(5)} " +
        s"diff=${got.collect { case (k, v) if expected.get(k).exists(_ != v) => k }.take(5)}")
  }

  test("q32 banded range join equals a brute-force window count") {
    import org.apache.spark.sql.functions.col
    val ev = Tables.t(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime * 1000 + r.getTimestamp(2).getNanos / 1000 % 1000,
        r.getString(3)))
    val clicksByUser = ev.filter(_._4 == "click").groupBy(_._2)
      .map { case (u, rs) => u -> rs.map(_._3) }
    val hourUs = 3600000000L
    val expected = ev.filter(_._4 == "error").flatMap { case (id, u, ts, _) =>
      val n = clicksByUser.getOrElse(u, Array.empty[Long])
        .count(c => c >= ts - hourUs && c <= ts)
      if (n > 0) Some(id -> n.toLong) else None
    }.toMap
    val got = operators.Relational.q32RangeJoin(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    assert(got == expected)
  }

  test("q31 HLL estimate sits inside its 5% envelope") {
    val r = operators.Relational.q31ApproxDistinct(spark, sf).collect().head
    assert(r.getLong(0) > 0)
    assert(r.getBoolean(1), s"approx_count_distinct drifted >5% off ${r.getLong(0)}")
  }

  test("q43 built-in corr/covar/stddev sit inside the exact-moment envelope") {
    val r = operators.Relational.q43CorrStats(spark, sf).collect().head
    assert(r.getAs[Long]("n") > 0)
    assert(r.getAs[Boolean]("corr_ok"), "corr drifted off the exact closed form")
    assert(r.getAs[Boolean]("covar_ok"), "covar_samp drifted off the exact closed form")
    assert(r.getAs[Boolean]("sd_ok"), "stddev_samp drifted off the exact closed form")
  }

  test("q42 distribution functions: quartile 1 is ~n/4 per segment, ratios in range") {
    val rows = operators.Relational.q42RankFunctions(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pr = r.getAs[Double]("pct_rank"); val cd = r.getAs[Double]("cume")
      assert(pr >= 0.0 && pr <= 1.0); assert(cd > 0.0 && cd <= 1.0)
    }
    val bySeg = rows.groupBy(_.getAs[String]("c_mktsegment")).view.mapValues(_.length)
    val totals = Tables.t(spark, sf, "customer")
      .groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySeg.foreach { case (seg, n1) =>
      val n = totals(seg)
      // ntile(4) gives the first tile ceil(n/4) members
      assert(n1 == (n + 3) / 4, s"$seg: quartile-1 size $n1 of $n")
    }
  }

  test("nanosToMicrosTs floors: sub-µs drops, negative nanos land in the earlier µs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, unix_micros}
    val r = Seq(1500L, 999L, 1000L, -1L, -1500L, 0L).toDF("ns")
      .select(unix_micros(graft.Tables.nanosToMicrosTs(col("ns"))).as("us"))
      .as[Long].collect().toSeq
    // floor semantics (arrow/DuckDB `//`), never round-toward-zero
    assert(r == Seq(1L, 0L, 1L, -1L, -2L, 0L), s"got $r")
  }

  test("asofJoin: <= tie takes the same-instant right row; no prior -> null") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 6L, 60.0))
      .toDF("k", "t", "v")
    val out = operators.Relational.asofJoin(left, right, Seq("k"), "t", "t",
      Seq("v")).orderBy(col("k"), col("t"))
      .select("k", "t", "tag", "asof_v").collect()
    // k=1,t=10: the SAME-instant right row qualifies (<=) -> 100
    // k=1,t=20: latest prior is t=15 -> 150
    // k=2,t=5: right is at t=6 (future) -> null (left-outer asof)
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      if (r.isNullAt(3)) null else r.getDouble(3))).toSeq ==
      Seq((1L, 10L, "a", 100.0), (1L, 20L, "b", 150.0), (2L, 5L, "c", null)))
    // one shuffle, no join node at all
    val plan = operators.Relational.asofJoin(left, right, Seq("k"), "t", "t",
      Seq("v")).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    // tolerance: a match older than leftTime - tol nulls out
    val tol = operators.Relational.asofJoin(left, right, Seq("k"), "t", "t",
      Seq("v"), tolerance = Some("3")).orderBy(col("k"), col("t"))
      .select("k", "t", "asof_v").collect()
    // k=1,t=20 matched right t=15: age 5 > 3 -> null; t=10 age 0 stays
    assert(tol.map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) null else r.getDouble(2))).toSeq ==
      Seq((1L, 10L, 100.0), (1L, 20L, null), (2L, 5L, null)))
  }

  test("asofJoin: exact tolerance boundary kept; hot key correct under the running frame") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, floor, lit, sum => fsum}
    // boundary: a right row at EXACTLY leftTime - tolerance qualifies
    // (inclusive, pandas merge_asof contract); one tick older nulls out
    val left = Seq((1L, 20L), (2L, 20L)).toDF("k", "t")
    val right = Seq((1L, 17L, 17.0), (2L, 16L, 16.0)).toDF("k", "t", "v")
    val out = operators.Relational.asofJoin(left, right, Seq("k"), "t", "t",
      Seq("v"), tolerance = Some("3")).orderBy(col("k"))
      .select("k", "asof_v").collect()
    assert(out(0).getLong(0) == 1L && out(0).getDouble(1) == 17.0,
      "match at exactly leftTime - tolerance must be kept")
    assert(out(1).getLong(0) == 2L && out(1).isNullAt(1),
      "match one tick older than the tolerance must null out")

    // hot key: ONE key holds every row (the single-user-with-most-events
    // shape). The running frame stays incremental - correct and bounded,
    // if serial for that key. Expected value is closed-form: latest
    // right at-or-before t is floor(t/10)*10.
    val n = 50000L
    val hotLeft = spark.range(0, n).select(lit(1L).as("k"), col("id").as("t"))
    val hotRight = spark.range(0, n / 10).select(lit(1L).as("k"),
      (col("id") * 10).as("t"), (col("id") * 10).cast("double").as("v"))
    val hot = operators.Relational.asofJoin(hotLeft, hotRight, Seq("k"),
      "t", "t", Seq("v"))
    val gotSum = hot.agg(fsum(col("asof_v"))).head.getDouble(0)
    val wantSum = hotLeft
      .select((floor(col("t") / 10) * 10).cast("double").as("e"))
      .agg(fsum(col("e"))).head.getDouble(0)
    assert(gotSum == wantSum, s"hot-key asof drifted: $gotSum vs $wantSum")
    assert(hot.count() == n)
  }

  test("rangeJoin: inclusive bounds, overlap without duplicates, no nested loop") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val pts = Seq(0L, 999L, 1000L, 2999L, 3000L, 5000L).toDF("p")
    // overlapping bands: [0,2999] and [2000,4999]
    val bands = Seq((0L, 0L, 2999L), (1L, 2000L, 4999L)).toDF("b", "lo", "hi")
    val out = operators.Relational.rangeJoin(pts, "p", bands, "lo", "hi", 1000L)
      .select("p", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((0L, 0L), (999L, 0L), (1000L, 0L), (2999L, 0L),
      (2999L, 1L), (3000L, 1L)), out)
    val plan = operators.Relational.rangeJoin(pts, "p", bands, "lo", "hi", 1000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
  }

  test("q46 emits (custkey, rank, price) rows, 3 per customer, prices desc") {
    val rows = operators.Relational.q46ArrayAgg(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.length % 3 == 0)
    rows.grouped(3).foreach { g =>
      assert(g.map(_.getLong(0)).distinct.length == 1, "each triple is one customer")
      assert(g.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
      val prices = g.map(_.getDouble(2)).toSeq
      assert(prices == prices.sorted(Ordering[Double].reverse))
    }
  }
}
