package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-9 additions, one empirical scale point each (sf0.1 → 10×):
  *
  *  - p78 decontamination: broadcast eval 13-grams + explode semi-join —
  *    the plan-shape claim is "linear in the corpus"; measure it.
  *  - bloom point lookup: a doc_id probe against a bloomed table — the
  *    claim is "row groups provably absent are skipped", so lookup cost
  *    should grow far slower than the corpus.
  *
  * The 10× documents corpus replicates sf0.1 with shifted doc_ids
  * (text reused: gram cardinality per doc is what p78's cost tracks).
  *
  *   sbt -batch 'Test/runMain graft.DevRound9Scale'
  */
object DevRound9Scale {
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

    def median3(f: => Unit): Double = {
      f
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      runs.sorted.apply(1)
    }

    // ---- 10x documents corpus
    val big = "target/sf1.0/documents.parquet"
    if (!new java.io.File(big).exists()) {
      val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      val n = base.count()
      val copies = (0 until 10).map(i => base.withColumn("doc_id",
        col("doc_id") + lit(i * n)))
      copies.reduce(_ unionByName _).coalesce(8)
        .write.mode("overwrite").parquet(big)
    }

    // ---- p78 decontamination at both scales
    Seq("/root/testdata/sf0.1" -> "sf0.1", "target/sf1.0" -> "sf1.0(docs)")
      .foreach { case (src, label) =>
        val t = median3 {
          graft.operators.TextAnalysis.p78Decontaminate(spark, src).collect()
        }
        Console.err.println(f"[r9scale] p78 $label median=${t}%.2fs")
      }

    // ---- bloom point lookup at both scales
    Seq("/root/testdata/sf0.1" -> "sf0.1", "target/sf1.0" -> "sf1.0(docs)")
      .foreach { case (src, label) =>
        val dest = s"target/r9bloom-${label.takeWhile(_ != '(')}"
        if (!new java.io.File(s"$dest/_versions").exists()) {
          val d = spark.read.parquet(s"$src/documents.parquet")
            .select(col("doc_id"), col("lang"), col("n_chars"))
          d.limit(0).write.format("lance").mode("overwrite").save(dest)
          Lance.setBloomFilters(spark, dest, Seq("doc_id"))
          d.repartition(8).write.format("lance").mode("append")
            .option("write.max-rows-per-file", "5000").save(dest)
        }
        val probe = 41L
        val t = median3 {
          spark.read.format("lance").load(dest)
            .filter(col("doc_id") === probe).collect()
        }
        Console.err.println(f"[r9scale] bloom-lookup $label median=${t}%.3fs")
      }

    spark.stop()
  }
}
