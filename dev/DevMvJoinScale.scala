package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The JOIN-view scale claim, measured: a two-sided refresh costs the
  * CHANGE, not the tables. Same fixed DML batch (~150 order deletes +
  * ~150 item re-prices + 300 item appends) against an
  * orders⋈lineitem view at sf0.1 and at a 10× replica of both sides.
  * The telescoped terms ΔA⋈B@new and A@old⋈ΔB each IN-list-prune their
  * fact scan to the changed keys, so a flat-ish ratio across the 10×
  * proves the refresh is change-bounded; a cost growing ~10× would mean
  * a term degenerated into a full-table join.
  *
  *   sbt -batch 'Test/runMain graft.DevMvJoinScale'
  */
object DevMvJoinScale {
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
    import graft.operators.MaterializedView
    import graft.operators.MaterializedView.{AggSpec, JoinSpec}

    def times10(df: org.apache.spark.sql.DataFrame, key: String) = {
      val n = df.agg(max(key)).collect()(0).getLong(0) + 1
      (0 until 10).map(i => df.withColumn(key, col(key) + lit(i * n)))
        .reduce(_ unionByName _)
    }

    // "fulldim" = the s133 shape: FULL head + INNER dim tail keyed on
    // the MERGED order key, with a dim-side delta in the same window —
    // flat across the 10x proves the tail-composed flip/anti terms stay
    // change-bounded too
    Seq("inner", "left", "full", "fulldim").foreach { how =>
    val headHow = if (how == "fulldim") "full" else how
    Seq("sf0.1", "sf1.0x") foreach { sf =>
      val base = s"target/jmvscale-$how-$sf"
      val fsRoot = new org.apache.hadoop.fs.Path(base)
      val fs = fsRoot.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(fsRoot)) fs.delete(fsRoot, true)
      val a = s"$base/orders"; val b = s"$base/items"; val v = s"$base/view"
      val orders0 = {
        val raw = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
          .select(col("o_orderkey"), col("o_orderpriority"))
        // FULL mode: orders with okey % 5 = 1 start ABSENT, so their
        // items are join-side-only (anti) rows and the mirrored flip
        // terms engage from the first window
        if (headHow == "full") raw.filter(not(col("o_orderkey") % 5 === 1))
        else raw
      }
      val items0 = {
        val raw = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
          .select(col("l_orderkey"), col("l_extendedprice"))
        // LEFT/FULL mode: orders with okey % 7 = 3 start matchless, so
        // the window's appends/deletes cross zero and the flips engage
        if (headHow == "inner") raw
        else raw.filter(not(col("l_orderkey") % 7 === 3))
      }
      val dim0 =
        if (how != "fulldim") None
        else Some(spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
          .select(col("o_orderkey").as("d_orderkey"),
            (col("o_orderkey") % 4).as("obucket"))
          .filter(not(col("d_orderkey") % 11 === 7)))
      val (orders, items) =
        if (sf == "sf0.1") (orders0, items0)
        else (times10(orders0, "o_orderkey"), times10(items0, "l_orderkey"))
      val c = s"$base/dim"
      val dim = dim0.map(d => if (sf == "sf0.1") d
        else times10(d, "d_orderkey"))
      dim.foreach(_.repartition(16).write.format("lance").mode("overwrite")
        .option("write.max-rows-per-file", "200000").save(c))
      orders.repartition(16).write.format("lance").mode("overwrite")
        .option("write.max-rows-per-file", "200000").save(a)
      items.repartition(16).write.format("lance").mode("overwrite")
        .option("write.max-rows-per-file", "500000").save(b)
      // the 100 TB layout: both sides bucketed on the join key, so the
      // telescoped terms' IN-list prunes drop fragments by bucket tag
      // (a randomly-laid table turns each pruned "scan" into a full
      // read — cheap next to a full JOIN, but not change-bounded)
      graft.Lance.clusterByBucket(spark, a, Seq("o_orderkey"), 64,
        maxRowsPerFile = 200000L)
      graft.Lance.clusterByBucket(spark, b, Seq("l_orderkey"), 64,
        maxRowsPerFile = 500000L)
      dim.foreach(_ => graft.Lance.clusterByBucket(spark, c,
        Seq("d_orderkey"), 64, maxRowsPerFile = 200000L))

      val t0 = System.nanoTime()
      MaterializedView.create(spark, v, a,
        if (how == "fulldim") Seq("o_orderpriority", "obucket")
        else Seq("o_orderpriority"),
        Seq(AggSpec("count", "*", "n"),
          AggSpec("sum", "l_extendedprice", "sp")),
        joins = JoinSpec(b, Map("o_orderkey" -> "l_orderkey"), headHow) +:
          (if (how == "fulldim")
            Seq(JoinSpec(c, Map("o_orderkey" -> "d_orderkey"), "inner"))
          else Seq.empty))
      val tCreate = (System.nanoTime() - t0) / 1e9

      // the FIXED two-sided change: same absolute row counts both scales
      spark.conf.set("spark.graft.dml.changeFeed", "true")
      try {
        graft.Lance.deleteWhere(spark, a,
          "o_orderkey % 997 = 3 AND o_orderkey <= 150000") // ~150 orders
        graft.Lance.updateWhere(spark, b,
          "l_orderkey % 997 = 5 AND l_orderkey <= 150000",
          Map("l_extendedprice" -> "l_extendedprice * 2")) // ~600 items
        spark.range(0, 300).select(
          (col("id") + 3L).as("l_orderkey"),
          lit(9.99).as("l_extendedprice"))
          .write.format("lance").mode("append").save(b)
        if (headHow == "left" || headHow == "full") {
          // FIRST matches for ~40 previously-matchless orders, and every
          // item of ~150 matched orders out (LAST matches): both flip
          // directions in one window, fixed absolute size at any scale
          spark.read.format("lance").load(a)
            .filter("o_orderkey % 77 = 3 AND o_orderkey <= 30000")
            .select(col("o_orderkey").as("l_orderkey"),
              lit(1.23).as("l_extendedprice"))
            .write.format("lance").mode("append").save(b)
          graft.Lance.deleteWhere(spark, b,
            "l_orderkey % 997 = 7 AND l_orderkey <= 150000")
        }
        if (headHow == "full") {
          // join-side crossings at fixed absolute size: orders ARRIVE
          // for a bounded set of orderless item keys (their anti rows
          // retract — the dA-driven mirrored flip term), and a bounded
          // set of orderless items leaves (the dJ anti term). The
          // common deleteWhere(a) above already drives matched->anti.
          spark.read.format("lance").load(b)
            .filter("l_orderkey % 5 = 1 AND l_orderkey % 997 = 11 " +
              "AND l_orderkey <= 150000")
            .select(col("l_orderkey").as("o_orderkey"),
              lit("9-ARRIVED").as("o_orderpriority")).distinct()
            .write.format("lance").mode("append").save(a)
          graft.Lance.deleteWhere(spark, b,
            "l_orderkey % 5 = 1 AND l_orderkey % 997 = 13 " +
              "AND l_orderkey <= 150000")
        }
        if (how == "fulldim") {
          // dim-side delta over the FULL prefix at fixed absolute size:
          // regrouped keys move prefix rows (matched AND anti) across
          // groups, dropped keys remove them from the inner tail
          graft.Lance.updateWhere(spark, c,
            "d_orderkey % 997 = 17 AND d_orderkey <= 150000",
            Map("obucket" -> "(d_orderkey + 1) % 4"))
          graft.Lance.deleteWhere(spark, c,
            "d_orderkey % 997 = 19 AND d_orderkey <= 150000")
        }
      } finally spark.conf.unset("spark.graft.dml.changeFeed")

      val s0 = System.nanoTime()
      val r = MaterializedView.refresh(spark, v)
      require(r.mode == "delta", r.toString)
      val tRefresh = (System.nanoTime() - s0) / 1e9
      Console.err.println(f"[jmvscale] $how $sf create=${tCreate}%.1fs " +
        f"two-sided-delta-refresh=${tRefresh}%.2fs")
    }
    }
    spark.stop()
  }
}
