package graft.operators

import graft.Tables.{t, dsum}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Correctness-gate coverage for the lance connector itself (S1–S7): each
  * query routes driver testdata *through* the lance format — parallel
  * fragment write, manifest commit, fragment-parallel scan back — and the
  * oracle runs the equivalent SQL directly on the original parquet, so a
  * hash match proves the roundtrip is lossless and the scan is correct.
  */
object LanceQueries {

  private def scratch(dir: String, name: String): String =
    graft.Tables.scratch(dir, name)

  private def freshDataset(spark: SparkSession, dest: String): Unit = {
    val p = new Path(new java.io.File(dest).getAbsolutePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** S1+S5+A2: lineitem subset → lance fragments → scan → group-agg. */
  def s51LanceRoundtripAgg(spark: SparkSession, dir: String): DataFrame = {
    val dest = scratch(dir, "lineitem_subset")
    freshDataset(spark, dest)
    t(spark, dir, "lineitem")
      .filter(col("l_quantity") > 40)
      .write.format("lance").mode("overwrite").save(dest)
    spark.read.format("lance").load(dest)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("l_returnflag"))
  }

  /** S1+P1+P2: filtered+projected scan over lance fragments. */
  def s52LanceFilterScan(spark: SparkSession, dir: String): DataFrame = {
    val dest = scratch(dir, "orders_subset")
    freshDataset(spark, dest)
    t(spark, dir, "orders").write.format("lance").mode("overwrite").save(dest)
    spark.read.format("lance").load(dest)
      .filter(col("o_totalprice") > 450000 && col("o_orderstatus") === "O")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** MVCC time travel: version 1 = overwrite, version 2 = append; read v1
    * while latest is v2 (reference `_versions` manifests, S9).
    */
  def s53LanceTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val dest = scratch(dir, "nation_versions")
    freshDataset(spark, dest)
    val n = t(spark, dir, "nation")
    n.filter(col("n_regionkey") <= 1).write.format("lance").mode("overwrite").save(dest)
    n.filter(col("n_regionkey") > 1).write.format("lance").mode("append").save(dest)
    val v1 = spark.read.format("lance").option("versionAsOf", "1").load(dest)
      .agg(count(lit(1)).as("v1_rows"))
    val v2 = spark.read.format("lance").load(dest)
      .agg(count(lit(1)).as("v2_rows"))
    v1.crossJoin(v2)
  }

  /** S6 + streaming source: events → lance → `readStream` changefeed →
    * filtered transform → exactly-once lance sink (Trigger.AvailableNow) →
    * batch scan. The oracle computes the same filter+agg straight from the
    * original parquet, so a hash match proves the full streaming
    * round trip loses and duplicates nothing.
    */
  def s54LanceStreamRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val src = scratch(dir, "events_stream_src")
    val dst = scratch(dir, "events_stream_dst")
    freshDataset(spark, src); freshDataset(spark, dst)
    freshDataset(spark, s"$dst-ckpt")
    t(spark, dir, "events").write.format("lance").mode("overwrite").save(src)
    val q = spark.readStream.format("lance").load(src)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("value"))
      .writeStream.format("lance")
      .option("checkpointLocation", s"$dst-ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(dst)
    q.awaitTermination()
    spark.read.format("lance").load(dst)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("sum_value"))
      .orderBy(col("user_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s51_lance_roundtrip_agg" -> s51LanceRoundtripAgg,
    "s52_lance_filter_scan" -> s52LanceFilterScan,
    "s53_lance_time_travel" -> s53LanceTimeTravel,
    "s54_lance_stream_roundtrip" -> s54LanceStreamRoundtrip,
  )

  val oracleSql: Map[String, String] = Map(
    "s51_lance_roundtrip_agg" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem WHERE l_quantity > 40
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "s52_lance_filter_scan" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 450000 AND o_orderstatus = 'O'
        |ORDER BY o_orderkey""".stripMargin,
    "s53_lance_time_travel" ->
      """SELECT (SELECT COUNT(*) FROM nation WHERE n_regionkey <= 1) AS v1_rows,
        | (SELECT COUNT(*) FROM nation) AS v2_rows""".stripMargin,
    "s54_lance_stream_roundtrip" ->
      """SELECT user_id, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
  )
}
