package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural plan guards over the whole query suite — the `.explain`
  * review loop, frozen as assertions so a plan regression (lost pushdown,
  * join degrading to a cartesian product, topk degrading to a global
  * sort) fails CI instead of silently costing 100× at scale.
  */
class PlanGuardSpec extends AnyFunSuite {
  import TestSpark._

  /** Queries that intentionally cross-join a broadcast single-row side
    * (query-vector pattern) or a 1-row aggregate (time-travel counts).
    */
  private val singleRowCross = Set(
    "v21_knn_l2", "v22_knn_cosine", "v23_dot_similarity", "s53_lance_time_travel",
    "s92_tags", // tagged-snapshot agg × live agg: two 1-row sides
    "v42_maxsim", // 4 broadcast query vectors × the vector table (maxsim)
    // v43/v44: the SAME 4-broadcast-query-vector cross, but over the
    // candidate-restricted bucket scan instead of the full table (plus
    // the cap path's per-query-vector window in v43r)
    "v43_maxsim_indexed", "v43r_maxsim_partial", "v44_maxsim_sql",
    // t36/t38 broadcast a 1-row corpus-size aggregate across every
    // document — a benign O(n) cross that replaced a second scan + collect()
    "t36_salient_terms", "t38_lm_rarity",
    // q47 band-joins the fact scan against ELEVEN recursively generated
    // tier rows on a range predicate: non-equi, so Spark correctly plans
    // BroadcastNestedLoopJoin — 11 broadcast rows × n is the cheapest
    // possible band join (an equi-join would need a per-row log2 whose
    // boundary ulps differ between engines)
    "q47_recursive_cte",
    // q61 crosses its two single-row proof aggregates (ns round-trip
    // stats × the µs-cast stats) into the one output row
    "q61_ns_roundtrip")

  /** Memoized per suite run: the two whole-suite sweeps (cartesian +
    * nested-loop guards) each ran EVERY gate body (scratch writes, DML,
    * index builds) just to re-derive the same deterministic plan string
    * — half the suite's ~9 min wall was that second sweep (guide §1.2
    * applied to the tests; VERDICT r14 item #6: the driver's test budget
    * needs the suite shorter, not weaker — every query is still planned
    * once from its real built state). */
  private val planCache = scala.collection.mutable.Map.empty[String, String]

  private def planOf(name: String): String =
    planCache.getOrElseUpdate(name, {
      val df = SparkEntry.queries(name)(spark, sf)
      df.queryExecution.executedPlan.toString
    })

  test("no query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val p = try planOf(name) catch { case e: Throwable =>
        fail(s"$name failed to plan: ${e.getMessage}")
      }
      if (p.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("nested-loop joins appear only in whitelisted single-row crosses") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(singleRowCross)
      .flatMap { name =>
        val p = planOf(name)
        if (p.contains("BroadcastNestedLoopJoin")) Some(name) else None
      }
    assert(offenders.isEmpty, s"unexpected nested-loop joins in: $offenders")
  }

  test("top-k queries use TakeOrderedAndProject, not a global sort+limit") {
    Seq("q03_topk_limit", "v21_knn_l2").foreach { name =>
      assert(planOf(name).contains("TakeOrderedAndProject"), name)
    }
  }

  test("dimension joins broadcast") {
    Seq("q07_join_agg", "q14_join3_agg").foreach { name =>
      assert(planOf(name).contains("BroadcastHashJoin"), name)
    }
  }

  test("filters reach the parquet scan") {
    val p = planOf("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull"), p.linesIterator.take(30).mkString("\n"))
    // plan toString truncates long filter lists; the shipdate bound
    // appears before the cutoff
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), "range filter not pushed")
  }

  test("projection pruning reaches the scan (no full-width read)") {
    val p = planOf("q02_filter_project")
    // lineitem has 16 columns; the query needs 4 (3 projected + 1 filter)
    val readSchema = p.split("ReadSchema: struct<").last.takeWhile(_ != '>')
    assert(readSchema.count(_ == ',') == 3, readSchema)
  }

  test("decontamination broadcasts the eval gram set (big side never shuffles)") {
    // the scale contract of t37: the fixed-size eval grams ride a
    // BroadcastHashJoin; a SortMergeJoin here would shuffle the full
    // training gram table
    assert(planOf("t37_decontaminate").contains("BroadcastHashJoin"))
  }

  test("LM rarity broadcasts the vocabulary join") {
    // vocab is bounded by the language, not the corpus — it must never
    // force a shuffle of the token stream
    assert(planOf("t38_lm_rarity").contains("BroadcastHashJoin"))
  }

  test("sequence packing shuffles once on shard, no global sort") {
    val p = planOf("p71_pack_sequences")
    // exactly one hashpartitioning exchange (the shard shuffle feeding the
    // window); the final orderBy is the driver-side presentation sort
    assert("hashpartitioning\\(shard".r.findAllIn(p).size == 1, p)
  }
}
