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

  test("sub-0.25s medians are omitted from the line but counted, never silently") {
    val line = Bench.jsonLine(
      Seq(("q01_agg", 1.25), ("q02_fast", 0.1), ("q03_fast", 0.2),
        ("v21_dead", -1.0)), "sf0.1")
    // total still includes the fast ones; the omission is declared
    assert(line.contains("\"value\":1.55"), line)
    assert(line.contains("\"omitted_fast\":2"), line)
    assert(line.contains("\"omitted_sec\":0.3"), line)
    assert(!line.contains("q02") && !line.contains("q03"), line)
    // failures are NEVER omitted, whatever their magnitude
    assert(line.contains("\"v21\":-1") && line.contains("\"failed\":1"), line)
  }

  test("the line stays inside the driver's 2000-char tail at 300 queries") {
    val many = (1 to 300).map(i => (f"x$i%03d_q", if (i % 3 == 0) 1.2 else 0.1))
    val line = Bench.jsonLine(many, "sf0.1")
    assert(line.length < 1900, s"line is ${line.length} chars")
  }
}
