package graft

import org.apache.spark.sql.SparkSession

/** Benchmark entry point: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Round-6 change — per-family JVM isolation. With 138 queries in one
  * JVM, accumulated codegen classloaders / metaspace / GC pressure
  * inflated late-query medians 2.5-3.5x over their isolated times
  * (round-5 verdict re-ran d42 8.8s-full vs 1.9s-isolated; the shared-100
  * total drifted 49.9 -> 123.7s with NO plan changes). A bound that reads
  * those numbers governs harness state, not code. So the full bench now
  * forks one child JVM per query-family chunk (<= MaxPerJvm queries each,
  * plain `java` exec — no sbt in the loop) and merges the children's
  * per-query medians into the single parseable JSON line. Each child's
  * numbers match SPARK_GRAFT_BENCH_ONLY isolated runs because each child
  * IS such a run.
  *
  * In-process measurement (per child / dev mode): each query is fully
  * materialized through the noop sink (count() would let Catalyst prune
  * work a consumer must pay for); reported time is the MEDIAN of
  * SPARK_GRAFT_BENCH_RUNS (default 3) warm runs after one cold warm-up.
  * Per-query [min,max] spreads are emitted as `[bench-spread]` stdout
  * lines above the JSON line so a wide interval flags an untrustworthy
  * median without bloating the one parseable line.
  *
  * Dev knobs: SPARK_GRAFT_BENCH_ONLY=q33,d44 runs a subset in-process
  * (isolation off — that mode exists precisely to BE the isolated
  * reference run); SPARK_GRAFT_BENCH_ISOLATE=0 forces the old
  * single-JVM full run for harness A/B comparison.
  *
  * Round-12 addition — the noise CANARY. Round 11's driver bench showed
  * five maintenance gates ~doubled (s91 4.1→8.1 s etc.) with unchanged
  * gate bodies. Round-12 forensics: isolated re-times matched round 10
  * (s88 2.27 / s91 4.09 / s103 2.92 / s111 4.44 / s113 5.50 vs r10's
  * 2.6 / 4.1 / 2.9 / 3.9 / 4.4), an exact re-run of the r11 chunk
  * containing s103/s111/s113 ALSO matched r10 (2.65 / 3.97 / 4.62), and
  * that chunk's membership was byte-identical across both rounds — so
  * the doubling was pressure on the measuring machine during the r11
  * driver run (consistent with the builder's same-code full run landing
  * 14% below the driver's total). Nothing in the harness can prevent
  * external load, but it can make it ATTRIBUTABLE: each child JVM now
  * times a fixed CPU-bound reference job (median of 3) and the JSON
  * line carries the worst child's number as `canary`. A future round
  * whose gate times inflate while `canary` holds steady is a code
  * regression; inflation WITH a raised canary is machine pressure.
  *
  * Round-13 additions — ATTRIBUTABLE gate time. (1) Each gate's median
  * is split into `setup` (time inside the gate body: index builds,
  * trickle commits, table rewrites — the part that is NOT the measured
  * query) and the materialization remainder; the JSON line carries a
  * `setup` map for shown gates whose setup share is >= 0.5 s, so an
  * inflated s103/s111-style entry is attributable to setup-I/O vs plan
  * from the driver's artifact alone. (2) A second, I/O-bound canary
  * (128 x 8 KiB write+fsync on the target/ volume) rides next to the
  * CPU one as `canary_io`: the maintenance gates are commit-fsync
  * bound, which a CPU canary cannot see (r12's driver run showed them
  * 2-4x inflated at CPU canary 0.44 — unresolvable then).
  */
object Bench {
  /** Queries per child JVM. Small enough that in-JVM accumulation stays
    * below bench noise (round-5 isolated re-runs showed drift builds over
    * tens of queries, not a dozen), large enough that Spark startup
    * (~5-8s, unmeasured) stays a small fraction of total wall time. */
  private val MaxPerJvm = 18

  def main(args: Array[String]): Unit = {
    val isChild = sys.env.contains("SPARK_GRAFT_BENCH_CHILD")
    val devOnly = sys.env.get("SPARK_GRAFT_BENCH_ONLY").exists(_.trim.nonEmpty)
    val isolate = sys.env.getOrElse("SPARK_GRAFT_BENCH_ISOLATE", "1") != "0"
    if (isChild || devOnly || !isolate) runInProcess()
    else runIsolated()
  }

  // ---------------------------------------------------------------- parent

  /** Fork one child JVM per family chunk; merge children's [bench-med]
    * lines into the single driver-parseable JSON line. */
  private def runIsolated(): Unit = {
    val names = SparkEntry.queries.keys.toSeq.sorted
    // family = leading letter of the short id (d/m/p/q/s/t/v); chunks
    // never straddle families so a family's lance side-state (built under
    // target/graft-data by its own gates) stays within one JVM lifetime
    val chunks = names.groupBy(_.head).toSeq.sortBy(_._1).flatMap {
      case (_, fam) => fam.sorted.grouped(MaxPerJvm)
    }
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val jvmArgs = {
      import scala.jdk.CollectionConverters._
      // replicate this JVM's flags (add-opens, -Xmx, -D) — sbt's
      // `run / fork := true` passes build.sbt's javaOptions here
      java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments.asScala.toSeq.filterNot(_.startsWith("-agentlib"))
    }
    val cp = sys.props("java.class.path")
    val medians = scala.collection.mutable.Map[String, Double]()
    val setups = scala.collection.mutable.Map[String, Double]()
    var canary = -1.0 // worst (slowest) child's reference-job median
    var canaryIo = -1.0 // worst child's fsync-reference median
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      println(s"[bench] child ${i + 1}/${chunks.size}: ${chunk.head}..${chunk.last} " +
        s"(${chunk.size} queries)")
      val pb = new ProcessBuilder(
        (Seq(javaBin) ++ jvmArgs ++ Seq("-cp", cp, "graft.Bench")): _*)
      pb.redirectErrorStream(false)
      pb.environment().put("SPARK_GRAFT_BENCH_CHILD", "1")
      pb.environment().put("SPARK_GRAFT_BENCH_ONLY", chunk.mkString(","))
      val proc = pb.start()
      // drain stderr concurrently (Spark logs; discarding avoids pipe
      // deadlock without re-tagging them "[error]" through sbt)
      val errDrain = new Thread(() => {
        val r = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getErrorStream))
        while (r.readLine() != null) {}
      })
      errDrain.setDaemon(true); errDrain.start()
      val out = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream))
      var line = out.readLine()
      while (line != null) {
        if (line.startsWith("[bench-med] ")) {
          val parts = line.drop("[bench-med] ".length).split(' ')
          medians(parts(0)) = parts(1).toDouble
          if (parts.length > 2) setups(parts(0)) = parts(2).toDouble
        } else if (line.startsWith("[bench-canary] ")) {
          canary = canary max line.drop("[bench-canary] ".length).toDouble
        } else if (line.startsWith("[bench-iocanary] ")) {
          canaryIo = canaryIo max line.drop("[bench-iocanary] ".length).toDouble
        } else if (!line.startsWith("{\"metric\"")) {
          // forward progress + spread lines; swallow the child's own
          // JSON line so the driver's tail ends with the PARENT's
          println(line)
        }
        line = out.readLine()
      }
      val code = proc.waitFor()
      if (code != 0)
        println(s"[bench] WARNING: child ${i + 1} exited $code; " +
          "unreported queries recorded as -1")
    }
    val results = names.map(n => (n, medians.getOrElse(n, -1.0)))
    printJsonLine(results, canary, canaryIo, setups.toMap)
  }

  // ----------------------------------------------------------- child / dev

  private def runInProcess(): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // driver-regenerated testdata carries isAdjustedToUTC=false; read micros
      // as session-TZ TIMESTAMP (UTC) like every prior round, not NTZ
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Noise canary: a fixed CPU-bound reference job (codegen'd sum over
    // a 32-partition range — no I/O, no shuffle, no state) timed the
    // same way the gates are. Its median moves ONLY with machine
    // pressure, so gate-time inflation is attributable (see scaladoc).
    def canaryOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 400000000L, 1L, 32)
        .selectExpr("sum(hash(id))").collect() // hash: no ANSI overflow
      (System.nanoTime() - t0) / 1e9
    }
    canaryOnce() // warm-up (codegen compile) outside the measurement
    val canary = Seq.fill(3)(canaryOnce()).sorted.apply(1)
    println(f"[bench] canary reference job median=$canary%.3f s")
    println(s"[bench-canary] $canary")

    // I/O canary (round 13): the CPU canary cannot attribute inflation in
    // the I/O-heavy maintenance gates (r11/r12 both ended with s103/s111
    // inflated on the driver run while the CPU canary held at 0.44). This
    // one times what those gates actually spend their setup on — many
    // small file creates + fsyncs on the same volume target/graft-data
    // lives on. Gate inflation with a flat CPU canary but a raised I/O
    // canary = storage pressure, not code.
    // failure-guarded like every gate body: a volume where the canary's
    // own writes/fsyncs FAIL (disk full, fsync-less mount) must report
    // canary_io=-1 (unmeasured), not kill the child before a single
    // gate runs — the instrument must never destroy the measurement
    def ioCanaryOnce(): Double = {
      val dir = new java.io.File("target", "bench-io-canary")
      // cleanup in finally: a mid-loop failure (disk full) must not leak
      // partial canary files into later iterations/measurements
      try {
        dir.mkdirs()
        val buf = Array.fill[Byte](8192)(7)
        val t0 = System.nanoTime()
        var i = 0
        while (i < 128) {
          val out = new java.io.FileOutputStream(new java.io.File(dir, s"c$i.bin"))
          try { out.write(buf); out.getFD.sync() } finally out.close()
          i += 1
        }
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => -1.0 }
      finally Option(dir.listFiles()).foreach(_.foreach(_.delete()))
    }
    ioCanaryOnce() // warm-up (dir creation, page cache) outside the measurement
    val io3 = Seq.fill(3)(ioCanaryOnce())
    val canaryIo = if (io3.exists(_ < 0)) -1.0 else io3.sorted.apply(1)
    println(f"[bench] io canary (128 x 8KiB write+fsync) median=$canaryIo%.3f s")
    println(s"[bench-iocanary] $canaryIo")

    // (total, setup): setup is the time spent INSIDE the gate body —
    // where maintenance gates do their index builds / trickle commits /
    // rewrites eagerly — and total-setup is the measured materialization
    // of the returned plan through the noop sink. The split makes a slow
    // gate attributable: s103/s111-style entries are >80% setup.
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Double) = {
      val t0 = System.nanoTime()
      val df = try fn(spark, sfDir)
        catch { case _: Throwable => return (-1.0, -1.0) }
      val t1 = System.nanoTime()
      try df.write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return (-1.0, -1.0) }
      ((System.nanoTime() - t0) / 1e9, (t1 - t0) / 1e9)
    }

    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val selected = SparkEntry.selectQueries("SPARK_GRAFT_BENCH_ONLY")
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // Unload every cached state-store provider before each query: the
      // streaming gates otherwise accumulate loaded providers across the
      // run and their maintenance threads contend — measured s59 warm
      // runs GROWING 2.6 -> 5.5 -> 8.4 s within one bench.
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      // full GC OUTSIDE the timed section: collects dead codegen
      // classloaders + streaming state from earlier queries so a query's
      // median reflects its own plan, not its predecessors' garbage
      System.gc()
      val cold = once(fn)
      val warm = if (cold._1 < 0) Seq((-1.0, -1.0)) else Seq.fill(nRuns) {
        org.apache.spark.sql.execution.streaming.state.StateStore.stop()
        once(fn)
      }
      // the reported split is the MEDIAN-TOTAL run's own (total, setup)
      // pair, so setup + query always sum to the reported median exactly
      val (med, setupMed) =
        if (warm.exists(_._1 < 0)) (-1.0, -1.0)
        else warm.sortBy(_._1).apply(warm.size / 2)
      // stdout, not stderr: sbt tags forked stderr lines "[error]", which
      // made healthy runs look alarming in the driver log tail.
      println(f"[bench] $name cold=${cold._1}%.2f median=$med%.2f " +
        f"setup=$setupMed%.2f " +
        s"runs=${warm.map(t => f"${t._1}%.2f").mkString(",")}")
      // machine line the isolating parent parses (full precision)
      println(s"[bench-med] $name $med $setupMed")
      (name, med, setupMed, warm.map(_._1).min, warm.map(_._1).max)
    }
    results.foreach { case (k, _, _, lo, hi) =>
      println(s"[bench-spread] ${shortId(k)}=$k [${f3(lo)},${f3(hi)}]")
    }
    // stop BEFORE the final println: anything Spark logs while shutting
    // down (stderr, re-tagged "[error]" by sbt) then lands above the JSON
    // line instead of pushing it out of the driver's bounded tail window
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    printJsonLine(results.map(r => (r._1, r._2)), canary, canaryIo,
      results.map(r => (r._1, r._3)).toMap)
  }

  // ------------------------------------------------------------- formatting

  private def shortId(name: String): String = name.takeWhile(_ != '_')

  // seconds at 1 decimal, trailing zeros stripped ("5.0" -> "5"):
  // 0.1 s granularity is below bench noise and keeps the line short
  private def f3(v: Double): String =
    if (v < 0) "-1"
    else f"$v%.1f".reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse match {
      case "" => "0"
      case s => s
    }

  /** The ONE driver-parseable line. The driver captures only a bounded
    * 2000-char TAIL of MERGED stdout+stderr (r9 showed the stderr WARNING
    * and sbt's "[success]" line both landing AFTER the JSON line inside
    * that tail, clipping the line's HEAD) — so the warning, if any, now
    * prints to stdout BEFORE the line, and the line itself is the LAST
    * thing we emit. */
  private def printJsonLine(results: Seq[(String, Double)],
      canary: Double = -1.0, canaryIo: Double = -1.0,
      setups: Map[String, Double] = Map.empty): Unit = {
    val line = jsonLine(results,
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"), canary,
      canaryIo, setups)
    if (line.length > 1400)
      println(s"[bench] WARNING: JSON line is ${line.length} chars; the driver's " +
        "2000-char tail must also hold sbt's trailing output - shrink ShownCap")
    println(line)
  }

  /** Queries shown by id in the line; everything else is aggregated into
    * `omitted_fast`/`omitted_sec`. 70 entries at ~12 chars each plus the
    * headline fields keeps the line near 1 kB however many queries exist. */
  private val ShownCap = 70
  private val OmitBelowSec = 0.6

  /** Pure line builder (unit-testable). `failed` counts -1 medians —
    * a crashed child/query makes the headline total SMALLER (only
    * non-negative medians sum), so without the count a failure would
    * read as a speedup in the driver's parsed line. failed must be 0 on
    * a healthy run.
    *
    * The driver captures a bounded 2000-char TAIL of merged output; an
    * overflowing line clips its HEAD, and round 7/9 both lost the bench
    * that way. Two defenses, no silent caps:
    *  - the per-query map shows only the ShownCap SLOWEST medians that
    *    are >= OmitBelowSec; the rest ride `omitted_fast`/`omitted_sec`
    *    (count + summed seconds), the headline total still includes
    *    them, and full per-query data stays on the `[bench]` lines
    *    above. Failures are never omitted.
    *  - the headline fields (`failed`, `value`, `sf`) sit at the END of
    *    the object, so even a clipped head cannot take them — the tail
    *    of the line is the part the driver's window always keeps. */
  /** Setup seconds below this ride the total alone; at/above it the gate
    * is ELIGIBLE for a `setup` map entry so slow maintenance gates
    * (s103/s111-style: >80% of their time is index-build/commit setup,
    * not the measured query) are attributable from the driver's
    * artifact. Only the SetupShownCap LARGEST setups actually emit —
    * the first full run showed ~56 gates clear the 0.5 s floor at
    * sf0.1 (most gate bodies ARE setup), which pushed the line to
    * 1.5 kB; attribution matters for the top offenders, and the full
    * per-gate split stays on the `[bench]` lines above. */
  private val SetupShownSec = 0.5
  private val SetupShownCap = 16

  private[graft] def jsonLine(results: Seq[(String, Double)], sfDir: String,
      canary: Double = -1.0, canaryIo: Double = -1.0,
      setups: Map[String, Double] = Map.empty): String = {
    require(results.map(r => shortId(r._1)).distinct.size == results.size,
      "short query ids collide; fix the new query's id prefix")
    val (ok, dead) = results.partition(_._2 >= 0)
    val shownOk = ok.filter(_._2 >= OmitBelowSec)
      .sortBy(-_._2).take(ShownCap - dead.size max 0)
    val shownKeys = shownOk.map(_._1).toSet
    val omitted = ok.filterNot(r => shownKeys(r._1))
    // stable id order in the emitted map (diffs across rounds stay readable)
    val shown = (shownOk ++ dead).sortBy(_._1)
    val qs = shown.map { case (k, v) => "\"" + shortId(k) + "\":" + f3(v) }
      .mkString("{", ",", "}")
    // setup split, SHOWN gates only (the slow ones are where attribution
    // matters) and only when the setup share is material (>= 0.5 s) —
    // keeps the line bounded however many gates exist
    val ss = shown.filter { case (k, v) =>
      v >= 0 && setups.get(k).exists(_ >= SetupShownSec)
    }.sortBy { case (k, _) => -setups(k) }.take(SetupShownCap)
      .sortBy(_._1) // stable id order, like the queries map
      .map { case (k, _) => "\"" + shortId(k) + "\":" + f3(setups(k)) }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    val failed = dead.size
    val omittedSec = omitted.map(_._2).sum
    // the 22-query TPC-H family as one trendable number: join-planning
    // regressions move it even when individual queries hide under
    // OmitBelowSec (README pins the per-query sf0.1/sf1.0 table)
    val tpchTotal = ok.filter(_._1.startsWith("tpch")).map(_._2).sum
    // and the TPC-DS-shape family (rollups/grouping-sets/wide stars)
    val tpcdsTotal = ok.filter(_._1.startsWith("tpcds")).map(_._2).sum
    val sfName = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    // `canary`: the slowest child's fixed-reference-job median (machine-
    // pressure indicator, see scaladoc); `canary_io`: the slowest child's
    // 128-fsync small-file-write median (storage-pressure indicator);
    // -1 when unmeasured (unit tests). `setup` maps a shown gate to the
    // seconds its median run spent INSIDE the gate body (index builds,
    // commits) as opposed to materializing the returned plan.
    f"""{"metric":"total","unit":"sec","omitted_fast":${omitted.size},""" +
      f""""omitted_sec":$omittedSec%.1f,"queries":$qs,"setup":$ss,""" +
      f""""tpch_total":$tpchTotal%.2f,"tpcds_total":$tpcdsTotal%.2f,""" +
      f""""canary":$canary%.2f,"canary_io":$canaryIo%.2f,""" +
      f""""failed":$failed,"value":$total%.2f,"sf":"$sfName"}"""
  }
}
