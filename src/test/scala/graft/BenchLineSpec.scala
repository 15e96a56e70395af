package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's ONE driver-parseable JSON line. Two invariants guard the
  * driver's bounded 2000-char output tail (rounds 7 and 9 both lost the
  * bench to head-clipping):
  *  - the line stays near 1 kB however many queries exist (slowest-70
  *    shown, the rest aggregated into omitted_fast/omitted_sec — never
  *    silently dropped);
  *  - the headline fields (failed, value, sf) sit at the END of the
  *    object, the part a tail window always keeps.
  * A crashed child/query records a -1 median and is EXCLUDED from the
  * headline total — which would make a failure read as a SPEEDUP unless
  * the line says so. `failed` carries that count; a healthy run must
  * print failed:0.
  */
class BenchLineSpec extends AnyFunSuite {

  test("healthy run: failed=0, total sums all medians") {
    val line = Bench.jsonLine(
      Seq(("q01_agg", 1.25), ("d41_exact", 0.7)), "/root/testdata/sf0.1")
    assert(line.contains("\"failed\":0"), line)
    assert(line.contains("\"value\":1.95"), line)
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

  test("sub-0.6s medians are omitted from the line but counted, never silently") {
    val line = Bench.jsonLine(
      Seq(("q01_agg", 1.25), ("q02_fast", 0.1), ("q03_fast", 0.3),
        ("v21_dead", -1.0)), "sf0.1")
    // total still includes the fast ones; the omission is declared
    assert(line.contains("\"value\":1.65"), line)
    assert(line.contains("\"omitted_fast\":2"), line)
    assert(line.contains("\"omitted_sec\":0.4"), line)
    assert(!line.contains("q02") && !line.contains("q03"), line)
    // failures are NEVER omitted, whatever their magnitude
    assert(line.contains("\"v21\":-1") && line.contains("\"failed\":1"), line)
  }

  test("headline fields sit at the END of the object (clip-proof)") {
    val line = Bench.jsonLine(Seq(("q01_agg", 1.25)), "sf0.1")
    val iQueries = line.indexOf("\"queries\":")
    val iFailed = line.indexOf("\"failed\":")
    val iValue = line.indexOf("\"value\":")
    val iSf = line.indexOf("\"sf\":")
    assert(iQueries >= 0 && iQueries < iFailed && iFailed < iValue && iValue < iSf,
      line)
    // even a head-clipped line keeps the headline intact in its tail
    val tail = line.takeRight(60)
    assert(tail.contains("\"failed\":0") && tail.contains("\"value\":") &&
      tail.contains("\"sf\":"), tail)
  }

  test("shown map caps at the 70 slowest; omitted accounting stays exact") {
    // 250 queries, all slow enough to qualify — only the slowest 70 show
    val many = (1 to 250).map(i => (f"x$i%03d_q", 0.6 + i * 0.01))
    val line = Bench.jsonLine(many, "sf0.1")
    val shownCount = "\"x\\d+\":".r.findAllIn(line).size
    assert(shownCount == 70, s"shown=$shownCount in $line")
    assert(line.contains("\"omitted_fast\":180"), line)
    // slowest (x250) shown, fastest (x001) omitted
    assert(line.contains("\"x250\":") && !line.contains("\"x001\":"), line)
    val total = many.map(_._2).sum
    assert(line.contains(f""""value":$total%.2f"""), line)
  }

  test("setup map carries shown gates with >=0.5s setup; smaller setups omitted") {
    val line = Bench.jsonLine(
      Seq(("s103_range_index", 10.2), ("q01_agg", 1.25), ("d41_exact", 0.7)),
      "sf0.1", canary = 0.44, canaryIo = 0.31,
      setups = Map("s103_range_index" -> 8.4, "q01_agg" -> 0.1,
        "d41_exact" -> 0.6))
    // s103: big setup share -> attributed; q01: 0.1s setup -> noise, omitted
    assert(line.contains("\"setup\":{\"d41\":0.6,\"s103\":8.4}"), line)
    assert(line.contains("\"canary\":0.44"), line)
    assert(line.contains("\"canary_io\":0.31"), line)
  }

  test("tpch_total sums exactly the tpch family") {
    val line = Bench.jsonLine(
      Seq(("tpch01_pricing", 1.5), ("tpch21_wait", 2.0), ("q01_agg", 9.0)),
      "sf0.1")
    assert(line.contains("\"tpch_total\":3.50"), line)
  }

  test("setup map caps at the 16 largest setups (line-budget guard)") {
    val many = (1 to 40).map(i => (f"x$i%03d_q", 5.0))
    val line = Bench.jsonLine(many, "sf0.1",
      setups = (1 to 40).map(i => (f"x$i%03d_q", 1.0 + i * 0.1)).toMap)
    val n = "\"x\\d+\":[0-9.]+".r.findAllIn(
      line.substring(line.indexOf("\"setup\":"))).size
    assert(n == 16, s"setup entries=$n in $line")
  }

  test("setup entries never appear for omitted or failed gates") {
    val line = Bench.jsonLine(
      Seq(("q02_fast", 0.1), ("v21_dead", -1.0)), "sf0.1",
      setups = Map("q02_fast" -> 0.9, "v21_dead" -> 0.9))
    // q02 is omitted (total < 0.6) and v21 failed (-1): neither earns a
    // setup entry (a failed gate's -1 "setup" is a sentinel, not a time)
    assert(line.contains("\"setup\":{}"), line)
  }

  test("the line stays under 1200 chars at 250 realistic queries") {
    // realistic sf0.1 shape: a third fast, a third ~1s, a third slower
    val many = (1 to 250).map { i =>
      (f"x$i%03d_q", i % 3 match {
        case 0 => 0.4
        case 1 => 1.1
        case _ => 3.0 + (i % 7)
      })
    }
    val line = Bench.jsonLine(many, "sf0.1")
    assert(line.length < 1200, s"line is ${line.length} chars")
  }
}
