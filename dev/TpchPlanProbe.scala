package graft
object TpchPlanProbe {
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
    for (q <- Seq("tpch03_shipping_priority", "tpch09_product_profit",
        // the two heaviest sf1.0 ratios in the round-13 README table
        "tpch21_waiting_suppliers", "tpch11_important_stock")) {
      val df = graft.operators.TpchQueries.queries(q)(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findAllIn(plan).take(4).toList
      val bhj = plan.split('\n').count(_.contains("BroadcastHashJoin"))
      val smj = plan.split('\n').count(_.contains("SortMergeJoin"))
      val cart = plan.contains("CartesianProduct")
      println(s"[plan] $q broadcastJoins=$bhj sortMergeJoins=$smj cartesian=$cart")
      pushed.foreach(p => println(s"[plan]   $p"))
    }
  }
}
