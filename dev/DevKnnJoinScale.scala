package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch dev tool: partial-probe KNN-join scaling (the production
  * configuration, vs the v37/v40 gates' full-probe EXACT self-join,
  * which is quadratic by construction). Args: sfDir [nprobes].
  */
object DevKnnJoinScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nprobes = args.lift(1).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dest = graft.Tables.scratch(dir, "emb_ivf_devscale")
    val metaFile = new org.apache.hadoop.fs.Path(new java.io.File(
      s"${graft.index.IvfIndex.indexPath(dest, "embedding")}/index.json").getAbsolutePath)
    val fs = metaFile.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(metaFile)) {
      val r = graft.index.IvfIndex.build(spark,
        graft.Tables.t(spark, dir, "embeddings"),
        "embedding", "vec_id", dest, numPartitions = 8)
      require(r.success, r.error)
    }
    // FIXED-size query set: the scaling claim is "cost ∝ queries × data
    // × nprobes/parts" — a self-join grows BOTH sides, so holding the
    // query count constant isolates the corpus-linear term
    val nq = args.lift(2).map(_.toLong).getOrElse(2000L)
    val qs = graft.Tables.t(spark, dir, "embeddings")
      .filter(col("vec_id") < nq)
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.index.IvfIndex.searchJoin(spark, dest, "embedding", qs,
        "vec_id", k = 3, nprobes = nprobes, geometry = "flipped").count()
      Console.out.println(f"[devscale] $dir nprobes=$nprobes round=$round " +
        f"rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
