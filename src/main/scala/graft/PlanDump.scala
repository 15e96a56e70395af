package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of selected queries at a
  * given scale factor — the `.explain("formatted")` review loop for
  * verifying pushdowns, broadcasts, and codegen spans.
  *
  * Usage: `sbt 'runMain graft.PlanDump /root/testdata/sf0.1 q01_agg_lineitem q07_join_agg'`
  * (no names = all queries).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // driver-regenerated testdata carries isAdjustedToUTC=false; read micros
      // as session-TZ TIMESTAMP (UTC) like every prior round, not NTZ
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"ERROR: ${e.getMessage}") }
      }
    spark.stop()
  }
}
