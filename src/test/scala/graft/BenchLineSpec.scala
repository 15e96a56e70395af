package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's ONE driver-parseable JSON line. A crashed child/query
  * records a -1 median and is EXCLUDED from the headline total — which
  * makes a failure read as a SPEEDUP unless the line says so. `failed`
  * carries that count; a healthy run must print failed:0.
  */
class BenchLineSpec extends AnyFunSuite {

  test("healthy run: failed=0, total sums all medians") {
    val line = Bench.jsonLine(
      Seq(("q01_agg", 1.25), ("d41_exact", 0.5)), "/root/testdata/sf0.1")
    assert(line.contains("\"failed\":0"), line)
    assert(line.contains("\"value\":1.75"), line)
    assert(line.contains("\"sf\":\"sf0.1\""), line)
  }

  test("a dead query surfaces as failed>0 instead of a smaller total") {
    val line = Bench.jsonLine(
      Seq(("q01_agg", 1.25), ("d41_exact", -1.0), ("v21_knn", -1.0)),
      "/root/testdata/sf0.1")
    assert(line.contains("\"failed\":2"), line)
    // the total still sums only the real medians (the -1s are sentinels,
    // not times) — failed is what keeps that from reading as a speedup
    assert(line.contains("\"value\":1.25"), line)
    assert(line.contains("\"d41\":-1"), line)
  }

  test("colliding short ids are refused loudly") {
    intercept[IllegalArgumentException] {
      Bench.jsonLine(Seq(("q01_a", 1.0), ("q01_b", 2.0)), "sf0.1")
    }
  }
}
