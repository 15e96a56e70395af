package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The materialized-view scale claim, measured: refresh cost tracks the
  * CHANGE, not the source. Same fixed DML batch (one delete + one
  * update + one merge, ~600 rows) against a sum/count/avg view over the
  * sf0.1 orders table and over a 10× replica of it — a delta refresh
  * whose cost grew with the source would show ~10×; flat-ish ratios
  * prove the feed-window arithmetic. The min/max view measures the
  * scoped-group path the same way (its cost tracks affected-group rows,
  * also change-bounded on this workload).
  *
  *   sbt -batch 'Test/runMain graft.DevMvScale'
  */
object DevMvScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.MaterializedView
    import graft.operators.MaterializedView.AggSpec

    def orders(sf: String) = {
      val base = spark.read.parquet(s"/root/testdata/sf0.1/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      if (sf == "sf0.1") base
      else {
        val n = base.agg(max("o_orderkey")).collect()(0).getLong(0) + 1
        (0 until 10).map(i => base
          .withColumn("o_orderkey", col("o_orderkey") + lit(i * n)))
          .reduce(_ unionByName _)
      }
    }

    Seq("sf0.1", "sf1.0").foreach { sf =>
      val src = s"target/mvscale-$sf/src"
      val vd = s"target/mvscale-$sf/vd"
      val vm = s"target/mvscale-$sf/vm"
      val fsRoot = new org.apache.hadoop.fs.Path(s"target/mvscale-$sf")
      val fs = fsRoot.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(fsRoot)) fs.delete(fsRoot, true)
      orders(sf).repartition(16).write.format("lance").mode("overwrite")
        .option("write.max-rows-per-file", "200000").save(src)
      val t0 = System.nanoTime()
      MaterializedView.create(spark, vd, src, Seq("o_custkey"), Seq(
        AggSpec("count", "*", "n"), AggSpec("sum", "o_totalprice", "sp"),
        AggSpec("avg", "o_totalprice", "ap")))
      MaterializedView.create(spark, vm, src, Seq("o_custkey"), Seq(
        AggSpec("count", "*", "n"), AggSpec("max", "o_totalprice", "mx")))
      val tCreate = (System.nanoTime() - t0) / 1e9

      // the FIXED change: same absolute row counts at both scales
      spark.conf.set("spark.graft.dml.changeFeed", "true")
      try {
        graft.Lance.deleteWhere(spark, src, "o_orderkey % 997 = 3") // ~150
        graft.Lance.updateWhere(spark, src, "o_orderkey % 997 = 5",
          Map("o_totalprice" -> "o_totalprice * 2")) // ~150
        val ins = spark.range(0, 300).select(
          (col("id") - 10000000L).as("o_orderkey"),
          (col("id") % 50).as("o_custkey"),
          lit(9.99).as("o_totalprice"))
        graft.Lance.upsert(spark, src, ins, Seq("o_orderkey"))
      } finally spark.conf.unset("spark.graft.dml.changeFeed")

      def time(f: => Any): Double = {
        val s0 = System.nanoTime(); f; (System.nanoTime() - s0) / 1e9
      }
      val tDelta = time {
        val r = MaterializedView.refresh(spark, vd)
        require(r.mode == "delta", r.toString)
      }
      val tGroups = time {
        val r = MaterializedView.refresh(spark, vm)
        require(r.mode == "groups", r.toString)
      }
      Console.err.println(f"[mvscale] $sf create=${tCreate}%.1fs " +
        f"delta-refresh=${tDelta}%.2fs groups-refresh=${tGroups}%.2fs")
    }
    spark.stop()
  }
}
