package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch dev tool: stage-level timing for hot queries (delete freely). */
object DevTiming {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // driver-regenerated testdata carries isAdjustedToUTC=false; read micros
      // as session-TZ TIMESTAMP (UTC) like every prior round, not NTZ
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      Console.err.println(f"[devtime] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val words = "split(text, ' ')"
    val shingles =
      "transform(sequence(0, size(__w) - 3)," +
        " i -> concat(__w[i], ' ', __w[i+1], ' ', __w[i+2]))"
    val P = 2147483647L
    val scratch = "target/graft-data/devtime_postings"

    for (round <- 1 to 2) {
      time(s"r$round shingle+write") {
        graft.Tables.t(spark, dir, "documents")
          .repartition(32, col("doc_id"))
          .withColumn("__w", expr(words))
          .select(col("doc_id"), expr(
            s"array_distinct(transform($shingles, s -> CAST(conv(substr(md5(s), 1, 8), 16, 10) AS BIGINT) % $P))").as("sh"))
          .select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("h"))
          .write.mode("overwrite").parquet(scratch)
      }
      time(s"r$round join+agg") {
        val d = spark.read.parquet(scratch)
        val a = d.select(col("h"), col("doc_id").as("a_id"), col("n").as("a_n"))
        val b = d.select(col("h").as("h2"), col("doc_id").as("b_id"), col("n").as("b_n"))
        a.join(b, col("h") === col("h2") && col("a_id") < col("b_id") &&
            col("a_n") * 2 >= col("b_n") && col("b_n") * 2 >= col("a_n"))
          .groupBy(col("a_id"), col("b_id"), col("a_n"), col("b_n"))
          .agg(count(lit(1)).as("inter"))
          .withColumn("jaccard", expr("CAST(inter AS DOUBLE) / (a_n + b_n - inter)"))
          .filter(col("jaccard") >= 0.5)
          .count()
      }
      time(s"r$round shingle-only-nodistinct") {
        graft.Tables.t(spark, dir, "documents")
          .repartition(32, col("doc_id"))
          .withColumn("__w", expr(words))
          .select(col("doc_id"), expr(
            s"array_distinct(transform(transform(sequence(0, size(__w) - 3)," +
              s" i -> concat(__w[i], ' ', __w[i+1], ' ', __w[i+2]))," +
              s" s -> CAST(conv(substr(md5(s), 1, 8), 16, 10) AS BIGINT) % $P))").as("sh"))
          .select(sum(size(col("sh")))).collect()
      }
      time(s"r$round split-only") {
        graft.Tables.t(spark, dir, "documents")
          .repartition(32, col("doc_id"))
          .withColumn("__w", expr(words))
          .select(sum(size(col("__w")))).collect()
      }
      time(s"r$round explode-count") {
        graft.Tables.t(spark, dir, "documents")
          .repartition(32, col("doc_id"))
          .withColumn("__w", expr(words))
          .select(col("doc_id"), expr(
            s"array_distinct(transform($shingles, s -> CAST(conv(substr(md5(s), 1, 8), 16, 10) AS BIGINT) % $P))").as("sh"))
          .select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("h"))
          .agg(count(lit(1)), sum(col("h"))).collect()
      }
      time(s"r$round write-arrays-noexplode") {
        graft.Tables.t(spark, dir, "documents")
          .repartition(32, col("doc_id"))
          .withColumn("__w", expr(words))
          .select(col("doc_id"), expr(
            s"array_distinct(transform($shingles, s -> CAST(conv(substr(md5(s), 1, 8), 16, 10) AS BIGINT) % $P))").as("sh"))
          .write.mode("overwrite").parquet(scratch + "_arr")
      }
      time(s"r$round explode-from-parquet") {
        spark.read.parquet(scratch + "_arr")
          .select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("h"))
          .agg(count(lit(1)), sum(col("h"))).collect()
      }
      time(s"r$round explode-materialized-2step") {
        graft.Tables.t(spark, dir, "documents")
          .repartition(32, col("doc_id"))
          .withColumn("__w", expr(words))
          .select(col("doc_id"), expr(
            s"array_distinct(transform($shingles, s -> CAST(conv(substr(md5(s), 1, 8), 16, 10) AS BIGINT) % $P))").as("sh"))
          .withColumn("n", size(col("sh")))
          .select(col("doc_id"), col("n"), explode(col("sh")).as("h"))
          .agg(count(lit(1)), sum(col("h"))).collect()
      }
      time(s"r$round hash-nodistinct-count") {
        graft.Tables.t(spark, dir, "documents")
          .repartition(32, col("doc_id"))
          .withColumn("__w", expr(words))
          .select(col("doc_id"), expr(
            s"transform($shingles, s -> CAST(conv(substr(md5(s), 1, 8), 16, 10) AS BIGINT) % $P)").as("sh"))
          .select(sum(size(col("sh")))).collect()
      }
    }
    spark.stop()
  }
}
