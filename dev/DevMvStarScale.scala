package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The STAR-view scale claim, measured: the dim enrichment is a pinned
  * broadcast join of each feed image, so a star view's delta refresh —
  * like the flat view's — tracks the CHANGE, not the source. Same fixed
  * DML batch (~450 rows) against `orders ⋈ customer GROUP BY
  * c_mktsegment` over sf0.1 and a 10× fact replica (the dim stays, as a
  * dim does): a refresh whose cost grew with the fact would show ~10×;
  * flat-ish ratios prove the enrichment rides the feed window.
  *
  *   sbt -batch 'Test/runMain graft.DevMvStarScale'
  */
object DevMvStarScale {
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
    import graft.operators.MaterializedView.{AggSpec, DimSpec}

    def orders(sf: String) = {
      val base = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
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
      val root = s"target/mvstarscale-$sf"
      val src = s"$root/src"; val dim = s"$root/dim"; val v = s"$root/v"
      val fsRoot = new org.apache.hadoop.fs.Path(root)
      val fs = fsRoot.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(fsRoot)) fs.delete(fsRoot, true)
      orders(sf).repartition(16).write.format("lance").mode("overwrite")
        .option("write.max-rows-per-file", "200000").save(src)
      spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
        .select(col("c_custkey"), col("c_mktsegment"))
        .write.format("lance").mode("overwrite").save(dim)
      val t0 = System.nanoTime()
      MaterializedView.create(spark, v, src, Seq("c_mktsegment"), Seq(
        AggSpec("count", "*", "n"),
        AggSpec("sum", "o_totalprice", "sp")),
        dims = Seq(DimSpec(dim, Map("o_custkey" -> "c_custkey"))))
      val tCreate = (System.nanoTime() - t0) / 1e9

      // the FIXED change: same absolute row counts at both scales
      spark.conf.set("spark.graft.dml.changeFeed", "true")
      try {
        graft.Lance.deleteWhere(spark, src, "o_orderkey % 997 = 3")
        graft.Lance.updateWhere(spark, src, "o_orderkey % 997 = 5",
          Map("o_totalprice" -> "o_totalprice * 2"))
      } finally spark.conf.unset("spark.graft.dml.changeFeed")

      val s0 = System.nanoTime()
      val r = MaterializedView.refresh(spark, v)
      require(r.mode == "delta", r.toString)
      val tDelta = (System.nanoTime() - s0) / 1e9
      Console.err.println(
        f"[mvstarscale] $sf create=${tCreate}%.2fs starDeltaRefresh=${tDelta}%.2fs")
    }
    spark.stop()
  }
}
