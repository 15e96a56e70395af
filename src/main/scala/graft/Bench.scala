package graft

import org.apache.spark.sql.SparkSession

/** Benchmark entry point: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Each query is fully
  * materialized through the noop sink (count() would let Catalyst prune
  * work a consumer must pay for); reported time is the MEDIAN of
  * SPARK_GRAFT_BENCH_RUNS (default 3) warm runs after one cold warm-up —
  * single warm runs proved noisy enough (4-5× swings on untouched
  * queries between rounds) that per-round verdicts chased ghosts. The
  * per-query [min,max] spread is emitted as `[bench-spread]` stdout lines
  * above the JSON line so a wide interval flags an untrustworthy median
  * without bloating the one parseable line (stderr would be re-tagged
  * `[error]` by sbt, making healthy runs look alarming).
  */
object Bench {
  def main(args: Array[String]): Unit = {
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

    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // dev knob (unset in the driver): see SparkEntry.selectQueries
    val selected = SparkEntry.selectQueries("SPARK_GRAFT_BENCH_ONLY")
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // Unload every cached state-store provider before each query: the
      // streaming gates otherwise accumulate loaded providers across the
      // whole bench and their maintenance threads contend — measured s59
      // warm runs GROWING 2.6 -> 5.5 -> 8.4 s within one bench. Each
      // query is measured from a clean state-store cache instead.
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      // full GC OUTSIDE the timed section: collects dead codegen
      // classloaders + streaming state from earlier queries so a query's
      // median reflects its own plan, not its predecessors' garbage
      System.gc()
      val cold = once(fn)
      val warm = if (cold < 0) Seq(-1.0) else Seq.fill(nRuns) {
        org.apache.spark.sql.execution.streaming.state.StateStore.stop()
        once(fn)
      }
      val med =
        if (warm.exists(_ < 0)) -1.0
        else warm.sorted.apply(warm.size / 2)
      // stdout, not stderr: sbt tags forked stderr lines "[error]", which
      // made healthy runs look alarming in the driver log tail. These
      // lines precede the JSON line, so the 2000-char tail still ends
      // with the parseable line.
      println(f"[bench] $name cold=$cold%.2f median=$med%.2f " +
        s"runs=${warm.map(t => f"$t%.2f").mkString(",")}")
      (name, med, warm.min, warm.max)
    }
    // The driver captures only a bounded 2000-char TAIL of stdout (with
    // sbt's ~75-char "[success] Total time" line landing after ours) and
    // parses the JSON line out of it — keep this line SHORT (the full
    // 83-query line with long names measured 1891 chars, 33 from losing
    // the line start past the window; rounds 1-3 all recorded
    // parsed:null). Two levers: seconds are 1-decimal with trailing
    // zeros stripped ("5.0" -> "5" — 0.1 s granularity is below bench
    // noise), and query keys are the SHORT id ("q01", "v26p") — the id
    // prefix every query name starts with and all docs/verdicts use;
    // full names + [min,max] spreads go to stdout as [bench-spread]
    // lines ABOVE the JSON line (the tail still ends with the JSON
    // line). ~750 chars total leaves room for ~80 more queries.
    def f3(v: Double): String =
      if (v < 0) "-1"
      else f"$v%.1f".reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse match {
        case "" => "0"
        case s => s
      }
    def shortId(name: String): String = name.takeWhile(_ != '_')
    require(results.map(r => shortId(r._1)).distinct.size == results.size,
      "short query ids collide; fix the new query's id prefix")
    val qs = results.map { case (k, v, _, _) => "\"" + shortId(k) + "\":" + f3(v) }
      .mkString("{", ",", "}")
    results.foreach { case (k, _, lo, hi) =>
      println(s"[bench-spread] ${shortId(k)}=$k [${f3(lo)},${f3(hi)}]")
    }
    val total = results.map(_._2).filter(_ >= 0).sum
    // total keeps 2 decimals (it's the headline number); sf is the
    // basename — the full path spends 15 chars of window for no signal
    val sfName = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    val line =
      f"""{"metric":"total","value":$total%.2f,"unit":"sec","queries":$qs,"sf":"$sfName"}"""
    // sbt's "[success] Total time" (~75 chars) lands after this line inside
    // the same 2000-char tail; past ~1900 the line start falls out of the
    // window and the driver records parsed:null (the round-3 failure)
    if (line.length > 1900)
      System.err.println(s"[bench] WARNING: stdout JSON line is ${line.length} chars; " +
        "the driver's 2000-char tail window is nearly blown - shrink the line " +
        "before adding more queries")
    // stop BEFORE the final println: anything Spark logs while shutting
    // down (stderr, re-tagged "[error]" by sbt) then lands above the JSON
    // line instead of pushing it out of the driver's bounded tail window
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    println(line)
  }
}
