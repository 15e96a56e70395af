package graft

import graft.Tables.t
import graft.index.HnswIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: measure HNSW partial-probe recall per sf to pick the gate
  * threshold for v26p. Run: sbt 'Test/runMain graft.DevPartialProbe'.
  */
object DevPartialProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val dest = operators.Similarity.devEnsureIvfHnsw(spark, sf)
      val q = t(spark, sf, "embeddings").filter(col("vec_id") === 0)
        .select(col("embedding")).collect().head.getSeq[Float](0).toArray
      val exact = t(spark, sf, "embeddings")
        .select(col("vec_id"),
          graft.functions.VectorFunctions.l2_distance(col("embedding"), lit(q.map(_.toDouble))).as("d"))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSet
      for (np <- Seq(1, 2, 4)) {
        val ann = HnswIndex.search(spark, dest, "embedding", q, 10, nprobes = np, ef = 200)
          .collect().map(_.getLong(0)).toSet
        println(s"[partial] sf=$sf nprobes=$np overlap=${(ann & exact).size}/10")
      }
    }
  }
}
