package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch dev tool: stage-level timing for d47 (delete freely). */
object DevSrp {
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
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      Console.err.println(f"[devtime] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (round <- 1 to 3) {
      time(s"r$round full d47") {
        graft.operators.Dedup.d47SrpNearDup(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
