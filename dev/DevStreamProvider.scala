package graft

import org.apache.spark.sql.SparkSession

/** Scratch dev tool (delete freely): times the stateful streaming gates
  * under a chosen state-store provider — the round-15 experiment for
  * "would RocksDB beat the HDFS-backed provider on the streaming
  * family?" (guide §5). Runs the named gates exactly like Bench's
  * in-process mode (cold + 3 warm medians through the noop sink).
  *
  * usage: sbt 'Test/runMain graft.DevStreamProvider rocksdb|hdfs s55,s56 [sfDir]'
  */
object DevStreamProvider {
  def main(args: Array[String]): Unit = {
    val provider = args.headOption.getOrElse("hdfs")
    val pats = args.drop(1).headOption.getOrElse("s55").split(',').toSeq
    val dir = args.drop(2).headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    val spark = (if (provider == "rocksdb")
      b.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    else b).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val selected = SparkEntry.queries.filter { case (n, _) =>
      pats.exists(n.contains)
    }.toSeq.sortBy(_._1)
    selected.foreach { case (name, fn) =>
      def once(): Double = {
        org.apache.spark.sql.execution.streaming.state.StateStore.stop()
        System.gc()
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once()
      val warm = Seq.fill(3)(once())
      println(f"[provider=$provider] $name cold=$cold%.2f " +
        f"median=${warm.sorted.apply(1)}%.2f runs=${warm.map(w => f"$w%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
