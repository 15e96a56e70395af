package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Storage-partitioned-join scale probe: the SAME co-bucketed
  * lineitem⋈orders aggregate with and without SPJ, at sf0.1 and a 10×
  * corpus (`target/sf1.0`, replicated with shifted keys). Bucketing
  * setup is one-time table layout — only the query is timed (median of
  * 3 warm runs). Broadcast is disabled so the non-SPJ baseline is the
  * real sort-merge shuffle join a fact⋈fact query pays.
  *
  *   sbt -batch 'Test/runMain graft.DevSpjScale'
  */
object DevSpjScale {
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
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def median3(f: => Unit): Double = {
      f // cold
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      runs.sorted.apply(1)
    }

    Seq("/root/testdata/sf0.1" -> "sf0.1", "target/sf1.0" -> "sf1.0")
      .foreach { case (src, label) =>
        val wh = s"target/spjscale-$label"
        val li = s"$wh/db/lineitem_b"
        val od = s"$wh/db/orders_b"
        if (!new java.io.File(s"$li/_versions").exists()) {
          spark.read.parquet(s"$src/lineitem.parquet")
            .select(col("l_orderkey"), col("l_extendedprice"))
            .write.format("lance").mode("overwrite").save(li)
          spark.read.parquet(s"$src/orders.parquet")
            .select(col("o_orderkey"), col("o_orderpriority"))
            .write.format("lance").mode("overwrite").save(od)
          Lance.clusterByBucket(spark, li, Seq("l_orderkey"), 32)
          Lance.clusterByBucket(spark, od, Seq("o_orderkey"), 32)
        }
        // one catalog NAME per corpus: Spark caches catalog instances by
        // name, so re-pointing the warehouse conf would silently keep
        // querying the first corpus
        val cat = s"spjscale_${label.replace('.', '_')}"
        spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.LanceCatalog")
        spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
        def q(): Unit = spark.sql(
          s"""SELECT o.o_orderpriority, COUNT(*) AS n, SUM(l.l_extendedprice) AS s
            |FROM $cat.db.lineitem_b l
            |JOIN $cat.db.orders_b o ON l.l_orderkey = o.o_orderkey
            |GROUP BY o.o_orderpriority""".stripMargin).collect()
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
        val shuffle = median3(q())
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
        val spj = median3(q())
        Console.err.println(
          f"[spjscale] $label shuffleJoin=${shuffle}%.2fs spj=${spj}%.2fs " +
            f"speedup=${shuffle / spj}%.2fx")
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      }
    spark.stop()
  }
}
