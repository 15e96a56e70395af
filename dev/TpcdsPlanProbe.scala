package graft

/** Plan audit for the TPC-DS-shape gates (round 14): every body must
  * plan as fact scan + BROADCAST hash joins + one shuffle for the
  * grouped aggregate — no SortMergeJoin (all dims are broadcast-sized
  * by construction), no CartesianProduct (the comma-joins all carry
  * equality predicates Catalyst lifts into join conditions). The one
  * allowed self-SMJ is tpcds59's period self-join of two AGGREGATES
  * (both sides are post-shuffle aggregate outputs, already tiny and
  * co-partitioned; at 100 TB the aggregate outputs stay dim-sized).
  * tpcds51's FULL join of two aggregates likewise rides one SMJ (Spark
  * cannot broadcast a full-outer side; both inputs are post-shuffle
  * aggregate cells). tpcds93's sales⟕returns is the family's one
  * deliberate fact-to-fact join: broadcast at probe scale, a
  * co-partitioned shuffle join on the line id at 100 TB — exactly what
  * its body documents.
  */
object TpcdsPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val names = graft.operators.TpcdsQueries.queries.keys.toSeq.sorted
    for (q <- names) {
      val df = graft.operators.TpcdsQueries.queries(q)(spark, "/root/testdata/sf0.001")
      df.collect() // AQE replans joins at runtime: read the FINAL plan
      // AdaptiveSparkPlan prints "final +- == Initial Plan == initial";
      // audit the FINAL section only
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val lines = plan.split('\n')
      val bhj = lines.count(_.contains("BroadcastHashJoin"))
      val smj = lines.count(_.contains("SortMergeJoin"))
      val cart = plan.contains("CartesianProduct")
      val expands = lines.count(_.contains("Expand")) // rollup/sets expansion
      val scans = lines.count(l => l.contains("Scan parquet") || l.contains("FileScan"))
      println(s"[plan] $q broadcastJoins=$bhj sortMergeJoins=$smj " +
        s"cartesian=$cart expand=$expands scans=$scans")
    }
  }
}
