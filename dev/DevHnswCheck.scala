package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: measures HNSW top-k overlap with exact KNN per metric and
  * sf dir — decides which v26/v27 queries can carry an exact oracle.
  * Run: sbt Test/runMain graft.DevHnswCheck with sf dirs as args.
  */
object DevHnswCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // driver-regenerated testdata carries isAdjustedToUTC=false; read micros
      // as session-TZ TIMESTAMP (UTC) like every prior round, not NTZ
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      for (metric <- Seq("l2", "cosine", "dot")) {
        val dest = Tables.scratch(dir, s"dev_hnsw_$metric")
        val p = new org.apache.hadoop.fs.Path(new java.io.File(dest).getAbsolutePath)
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        if (fs.exists(p)) fs.delete(p, true)
        val emb = Tables.t(spark, dir, "embeddings")
        val r = index.IvfIndex.build(spark, emb, "embedding", "vec_id", dest,
          numPartitions = 8, metric = metric)
        require(r.success, r.error)
        val r2 = index.HnswIndex.build(spark, dest, "embedding")
        require(r2.success, r2.error)
        for (qid <- Seq(0L, 1L, 2L, 7L)) {
          val q = emb.filter(col("vec_id") === qid)
            .select(col("embedding")).collect().head.getSeq[Float](0).toArray
          val hnsw = index.HnswIndex.search(spark, dest, "embedding", q, 10,
            nprobes = 8, ef = 200)
            .select(col("vec_id")).collect().map(_.getLong(0)).toSet
          val exact = operators.Similarity.knnSearch(emb, "embedding", q, 10, metric)
            .select(col("vec_id")).collect().map(_.getLong(0)).toSet
          println(s"[devhnsw] $dir $metric q=$qid overlap=${(hnsw & exact).size}/10")
        }
      }
    }
    spark.stop()
  }
}
