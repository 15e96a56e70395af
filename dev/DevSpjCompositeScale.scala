package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** COMPOSITE-key storage-partitioned-join scale probe (round 11): the
  * SAME co-bucketed (l_partkey, l_suppkey) fact⋈dim aggregate with and
  * without SPJ, at sf0.1 and the 10× corpus. Composite specs carry GRID
  * tags (one pmod(hash(col), n) digit per column), reported as one unary
  * bucket transform per column — Spark's key-grouped planning then drops
  * both exchanges when the join covers every key column. tenant+day /
  * user+date composite keys are the fact⋈fact norm at 100 TB; this probe
  * turns that claim into a number. Bucketing is one-time layout — only
  * the query is timed (median of 3 warm runs); broadcast disabled so the
  * baseline is the real sort-merge shuffle join.
  *
  *   sbt -batch 'Test/runMain graft.DevSpjCompositeScale'
  */
object DevSpjCompositeScale {
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
        val wh = s"target/spjcomp-$label"
        val li = s"$wh/db/li_ps"
        val ps = s"$wh/db/ps_dim"
        if (!new java.io.File(s"$li/_versions").exists()) {
          val raw = spark.read.parquet(s"$src/lineitem.parquet")
          raw.select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
            .write.format("lance").mode("overwrite").save(li)
          raw.groupBy(col("l_partkey"), col("l_suppkey"))
            .agg(count(lit(1)).as("cnt"))
            .write.format("lance").mode("overwrite").save(ps)
          Lance.clusterByBucket(spark, li, Seq("l_partkey", "l_suppkey"), 8)
          Lance.clusterByBucket(spark, ps, Seq("l_partkey", "l_suppkey"), 8)
        }
        val cat = s"spjcomp_${label.replace('.', '_')}"
        spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.LanceCatalog")
        spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
        def q(): Unit = spark.sql(
          s"""SELECT COUNT(*) AS n, SUM(f.l_extendedprice) AS s, SUM(d.cnt) AS c
            |FROM $cat.db.li_ps f
            |JOIN $cat.db.ps_dim d
            |ON f.l_partkey = d.l_partkey AND f.l_suppkey = d.l_suppkey""".stripMargin)
          .collect()
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
        val shuffle = median3(q())
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
        val spj = median3(q())
        Console.err.println(
          f"[spjcomp] $label shuffleJoin=${shuffle}%.2fs spj=${spj}%.2fs " +
            f"speedup=${shuffle / spj}%.2fx")
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      }
    spark.stop()
  }
}
