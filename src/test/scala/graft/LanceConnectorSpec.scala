package graft

import graft.format.LanceFormat
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class LanceConnectorSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "lance-test-")
      .toAbsolutePath.toString

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  /** Number of fragment files the executed scan actually read. */
  private def scannedFragments(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
    def strip(pl: SparkPlan): SparkPlan = pl match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    strip(df.queryExecution.executedPlan).collect { case b: BatchScanExec => b.scan }
      .collect { case ps: ParquetScan => ps.fileIndex.inputFiles.length }.sum
  }

  test("write/read roundtrip preserves data and schema") {
    val dir = s"${tmpDir()}/t1"
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)).toDF("id", "s", "v")
    df.write.format("lance").mode("append").save(dir)
    val back = spark.read.format("lance").load(dir)
    assert(back.schema == df.schema)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("append adds fragments and a new version; overwrite replaces") {
    val dir = s"${tmpDir()}/t2"
    Seq((1L, "x")).toDF("id", "s").write.format("lance").mode("append").save(dir)
    Seq((2L, "y")).toDF("id", "s").write.format("lance").mode("append").save(dir)
    assert(spark.read.format("lance").load(dir).count() == 2)
    val versions = LanceFormat.listVersions(fs(dir), new Path(dir))
    assert(versions.size == 2, s"expected 2 versions, got $versions")

    Seq((9L, "z")).toDF("id", "s").write.format("lance").mode("overwrite").save(dir)
    val after = spark.read.format("lance").load(dir)
    assert(after.count() == 1)
    assert(after.collect().head.getLong(0) == 9L)
  }

  test("time travel via versionAsOf") {
    val dir = s"${tmpDir()}/t3"
    Seq((1L, "v1")).toDF("id", "s").write.format("lance").mode("append").save(dir)
    Seq((2L, "v2")).toDF("id", "s").write.format("lance").mode("append").save(dir)
    assert(spark.read.format("lance").option("versionAsOf", "1").load(dir).count() == 1)
    assert(spark.read.format("lance").option("versionAsOf", "2").load(dir).count() == 2)
  }

  test("schema mismatch on append is rejected") {
    val dir = s"${tmpDir()}/t4"
    Seq((1L, "x")).toDF("id", "s").write.format("lance").mode("append").save(dir)
    val e = intercept[Exception] {
      Seq((1.0, 2.0)).toDF("a", "b").write.format("lance").mode("append").save(dir)
    }
    assert(e.getMessage.contains("schema mismatch") ||
      e.getMessage.contains("Failed to resolve") || e.getCause != null)
  }

  test("max-rows-per-file rolls fragments") {
    val dir = s"${tmpDir()}/t5"
    spark.range(0, 1000).coalesce(1).write.format("lance")
      .option("write.max-rows-per-file", "100").mode("append").save(dir)
    val m = LanceFormat.readLatest(fs(dir), new Path(dir)).get
    assert(m.fragments.size == 10, s"fragments: ${m.fragments.size}")
    assert(m.fragments.forall(_.rowCount == 100))
    assert(spark.read.format("lance").load(dir).count() == 1000)
  }

  test("fragment-parallel scan with filter/projection pushdown") {
    val dir = s"${tmpDir()}/t6"
    // 8 fragments via 8 partitions
    spark.range(0, 8000).repartition(8)
      .withColumn("v", col("id") * 2)
      .write.format("lance").mode("append").save(dir)
    val df = spark.read.format("lance").load(dir)
      .filter(col("id") > 4000).select("id")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [GreaterThan(id,4000)") ||
      plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,4000)"), plan)
    assert(plan.contains("ReadSchema: struct<id:bigint>"), plan)
    val m = LanceFormat.readLatest(fs(dir), new Path(dir)).get
    assert(m.fragments.size == 8)
    assert(df.count() == 3999)
  }

  test("count(*) answered from the manifest: metadata-only plan, zero file reads") {
    val dir = s"${tmpDir()}/t7"
    spark.range(0, 500).write.format("lance").mode("append").save(dir)
    // no aggregatePushdown conf needed — the manifest path is always on
    val agg = spark.read.format("lance").load(dir).agg(count(lit(1)))
    assert(agg.collect().head.getLong(0) == 500L)
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"), plan)
    assert(!plan.contains("FileScan") && !plan.contains("BatchScan"),
      s"count(*) plan read files:\n$plan")

    // a filter disqualifies the manifest shortcut — rows must be counted
    val filtered = spark.read.format("lance").load(dir)
      .filter($"id" < 100).agg(count(lit(1)))
    assert(filtered.collect().head.getLong(0) == 100L)
    assert(!filtered.queryExecution.executedPlan.toString.contains("LocalTableScan"))

    // append commits a new manifest; the count follows it, and time travel
    // counts the pinned version's manifest
    spark.range(500, 600).write.format("lance").mode("append").save(dir)
    assert(spark.read.format("lance").load(dir)
      .agg(count(lit(1))).collect().head.getLong(0) == 600L)
    assert(spark.read.format("lance").option("versionAsOf", "1").load(dir)
      .agg(count(lit(1))).collect().head.getLong(0) == 500L)
  }

  test("min/max/count(col) answered from manifest stats: metadata-only plan") {
    val dir = s"${tmpDir()}/t7mm"
    // three fragments, one holding the global extremes; d is NULLABLE
    // (Option) with nulls and an ALL-null fragment — fragment stats must
    // skip the all-null fragment, not bail (a non-null d would let
    // Catalyst itself rewrite count(d) to count(*) and hide the path)
    Seq((5L, 2.5, "x", Some(7.0)), (1L, -3.5, "y", None))
      .toDF("id", "v", "s", "d").coalesce(1)
      .write.format("lance").mode("overwrite").save(dir)
    Seq((9L, 0.5, "z", Option.empty[Double])).toDF("id", "v", "s", "d").coalesce(1)
      .write.format("lance").mode("append").save(dir)
    Seq((7L, 4.5, "w", Some(2.0))).toDF("id", "v", "s", "d").coalesce(1)
      .write.format("lance").mode("append").save(dir)

    val agg = spark.read.format("lance").load(dir)
      .agg(min($"id"), max($"id"), min($"v"), max($"v"),
        count($"d"), max($"d"), count(lit(1)))
    val r = agg.collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
      r.getLong(4), r.getDouble(5), r.getLong(6)) == ((1L, 9L, -3.5, 4.5, 2L, 7.0, 4L)))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"), plan)
    assert(!plan.contains("FileScan") && !plan.contains("BatchScan"),
      s"manifest min/max plan read files:\n$plan")

    // short strings: bounds are attained values, metadata-only
    val smax = spark.read.format("lance").load(dir).agg(max($"s"))
    assert(smax.collect().head.getString(0) == "z")
    assert(smax.queryExecution.executedPlan.toString.contains("LocalTableScan"))

    // a string at/over the truncation cap is an ambiguous bound — must
    // NOT be answered from the manifest (the scan must read the data)
    val longStr = s"${tmpDir()}/t7ls"
    Seq("short", "x" * 80).toDF("s")
      .write.format("lance").mode("overwrite").save(longStr)
    val lmax = spark.read.format("lance").load(longStr).agg(max($"s"))
    assert(lmax.collect().head.getString(0) == "x" * 80)
    assert(!lmax.queryExecution.executedPlan.toString.contains("LocalTableScan"))

    // a fully null column yields SQL NULL, still metadata-only
    val allNull = s"${tmpDir()}/t7nn"
    Seq(1L, 2L).toDF("id").withColumn("d", lit(null).cast("double"))
      .write.format("lance").mode("overwrite").save(allNull)
    val nn = spark.read.format("lance").load(allNull).agg(min($"d"), count($"d"))
    val rn = nn.collect().head
    assert(rn.isNullAt(0) && rn.getLong(1) == 0L)
    assert(nn.queryExecution.executedPlan.toString.contains("LocalTableScan"))

    // NaN poisons double stats — the manifest path must bail to a real
    // scan. (Parquet FOOTER agg pushdown is disabled here: Spark's own
    // footer path errors on NaN-omitted parquet stats, a limitation of
    // that conf, not of this connector.)
    val withNan = s"${tmpDir()}/t7nan"
    Seq(1.0, Double.NaN, 3.0).toDF("v")
      .write.format("lance").mode("overwrite").save(withNan)
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
    try {
      val nan = spark.read.format("lance").load(withNan).agg(max($"v"))
      assert(nan.collect().head.getDouble(0).isNaN) // Spark: NaN > everything
      assert(!nan.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    } finally spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")

    // write.stats=false leaves no stats — count(*) still works, min does not
    val noStats = s"${tmpDir()}/t7ns"
    Seq(1L, 2L).toDF("id").write.format("lance")
      .option("write.stats", "false").mode("overwrite").save(noStats)
    val ns = spark.read.format("lance").load(noStats).agg(min($"id"))
    assert(ns.collect().head.getLong(0) == 1L)
    assert(!ns.queryExecution.executedPlan.toString.contains("LocalTableScan"))
  }

  test("vector columns round-trip through lance fragments") {
    val dir = s"${tmpDir()}/t8"
    val df = Tables.t(spark, sf, "embeddings")
    df.write.format("lance").mode("append").save(dir)
    val back = spark.read.format("lance").load(dir)
    assert(back.count() == 500)
    val r = back.filter($"vec_id" === 0).select($"embedding").collect().head
    val orig = df.filter($"vec_id" === 0).select($"embedding").collect().head
    assert(r.getSeq[Float](0) == orig.getSeq[Float](0))
  }

  test("catalog: SQL DDL + INSERT + SELECT lifecycle") {
    val wh = tmpDir()
    spark.conf.set("spark.sql.catalog.lance_test", "graft.catalog.LanceCatalog")
    spark.conf.set("spark.sql.catalog.lance_test.warehouse", wh)
    spark.sql("CREATE NAMESPACE lance_test.db1")
    spark.sql("CREATE TABLE lance_test.db1.docs (doc_id BIGINT, title STRING, " +
      "embedding ARRAY<FLOAT>, category STRING)")
    spark.sql("INSERT INTO lance_test.db1.docs VALUES " +
      "(1, 'Intro', array(0.1f, 0.2f), 'tutorial'), " +
      "(2, 'Deep', array(0.3f, 0.4f), 'practice'), " +
      "(3, 'More', array(0.5f, 0.6f), 'tutorial')")
    val res = spark.sql("SELECT category, COUNT(*) AS n FROM lance_test.db1.docs " +
      "GROUP BY category ORDER BY n DESC, category").collect()
    assert(res.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("tutorial", 2L), ("practice", 1L)))
    assert(spark.sql("SHOW TABLES IN lance_test.db1").collect().map(_.getString(1))
      .contains("docs"))
    // rename + drop
    spark.sql("ALTER TABLE lance_test.db1.docs RENAME TO db1.docs2")
    assert(spark.sql("SELECT COUNT(*) FROM lance_test.db1.docs2").collect().head.getLong(0) == 3)
    spark.sql("DROP TABLE lance_test.db1.docs2")
    assert(spark.sql("SHOW TABLES IN lance_test.db1").collect().isEmpty)
    spark.sql("DROP NAMESPACE lance_test.db1")
  }

  test("streaming write commits epochs exactly once") {
    val dir = s"${tmpDir()}/stream"
    val checkpoint = s"${tmpDir()}/ckpt"
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](
      spark)
    val q = input.toDF().toDF("id", "s").writeStream
      .format("lance").option("checkpointLocation", checkpoint)
      .outputMode("append").start(dir)
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      assert(spark.read.format("lance").load(dir).count() == 2)
      input.addData((3L, "c"))
      q.processAllAvailable()
      assert(spark.read.format("lance").load(dir).count() == 3)
    } finally q.stop()
    val m = LanceFormat.readLatest(fs(dir), new Path(dir)).get
    assert(m.epochId.isDefined)
  }

  test("time-based vacuum: versions inside the horizon survive regardless of count") {
    val dir = s"${tmpDir()}/vact"
    Seq((1L, "a")).toDF("id", "s").write.format("lance").mode("append").save(dir)
    Thread.sleep(25)
    val betweenMs = System.currentTimeMillis()
    Thread.sleep(25)
    Seq((2L, "b")).toDF("id", "s").write.format("lance").mode("append").save(dir)
    Seq((3L, "c")).toDF("id", "s").write.format("lance").mode("append").save(dir)
    // a huge horizon pins everything even with keepVersions=1
    val (m0, f0) = Lance.vacuum(spark, dir, keepVersions = 1,
      olderThanMillis = Some(86400000L))
    assert(m0 == 0 && f0 == 0)
    assert(Lance.versions(spark, dir) == Seq(1L, 2L, 3L))
    // horizon at `betweenMs`: v1 (older) is reclaimed, v2 survives the
    // keepVersions=1 count cut because it is YOUNGER than the horizon
    val (m1, _) = Lance.vacuum(spark, dir, keepVersions = 1,
      olderThanMillis = Some(System.currentTimeMillis() - betweenMs))
    assert(m1 == 1, s"expected exactly v1 reclaimed, got $m1")
    assert(Lance.versions(spark, dir) == Seq(2L, 3L))
    // a TAGGED version outside the horizon still survives (pin order:
    // tags beat time beats count)
    Lance.tag(spark, dir, "keep", Some(2L))
    Thread.sleep(25)
    val cut = System.currentTimeMillis()
    Thread.sleep(25)
    Seq((4L, "d")).toDF("id", "s").write.format("lance").mode("append").save(dir)
    val (m2, _) = Lance.vacuum(spark, dir, keepVersions = 1,
      olderThanMillis = Some(System.currentTimeMillis() - cut))
    assert(Lance.versions(spark, dir).contains(2L), "tag must pin v2")
    assert(!Lance.versions(spark, dir).contains(3L), "untagged old v3 reclaimed")
    assert(m2 == 1)
    // rows of the pinned tag stay readable
    assert(spark.read.format("lance").option("tagAsOf", "keep").load(dir).count() == 2)
  }

  test("vacuum drops old versions and unreferenced fragments") {
    val dir = s"${tmpDir()}/vac"
    Seq((1L, "a")).toDF("id", "s").write.format("lance").mode("append").save(dir)
    Seq((2L, "b")).toDF("id", "s").write.format("lance").mode("append").save(dir)
    Seq((9L, "z")).toDF("id", "s").write.format("lance").mode("overwrite").save(dir)
    assert(Lance.versions(spark, dir) == Seq(1L, 2L, 3L))
    val (manifests, files) = Lance.vacuum(spark, dir, keepVersions = 1)
    assert(manifests == 2)
    assert(files == 2) // v1+v2 fragments are unreferenced after overwrite
    assert(Lance.versions(spark, dir) == Seq(3L))
    val df = spark.read.format("lance").load(dir)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("vector-dim metadata is stored and enforced on write") {
    val dir = s"${tmpDir()}/vdim"
    val ok = Lance.withVectorDim(
      Seq((1L, Seq(1.0f, 2.0f, 3.0f)), (2L, Seq(4.0f, 5.0f, 6.0f)))
        .toDF("id", "vec"), "vec", 3)
    ok.write.format("lance").mode("append").save(dir)
    // dimension survives the manifest round trip
    val back = spark.read.format("lance").load(dir)
    assert(back.schema("vec").metadata.getLong(Lance.VectorDimKey) == 3L)
    // a wrong-dimension append fails at the writer
    val bad = Seq((3L, Seq(1.0f, 2.0f))).toDF("id", "vec")
    val e = intercept[Exception] {
      Lance.withVectorDim(bad, "vec", 3)
        .write.format("lance").mode("append").save(dir)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).flatMap(c => Option(c.getMessage)).exists(_.contains("fixed vector dim 3")))
    assert(spark.read.format("lance").load(dir).count() == 2)
  }

  test("concurrent appends both commit under optimistic MVCC retry") {
    val dir = s"${tmpDir()}/conc"
    Seq((0L, "seed")).toDF("id", "s").write.format("lance").mode("append").save(dir)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writes = (1 to 4).map { i =>
      Future {
        Seq((i.toLong, s"w$i")).toDF("id", "s")
          .write.format("lance").mode("append").save(dir)
      }
    }
    Await.result(Future.sequence(writes), 120.seconds)
    val df = spark.read.format("lance").load(dir)
    assert(df.count() == 5)
    assert(df.select("id").collect().map(_.getLong(0)).toSet == (0L to 4L).toSet)
    // one version per commit: seed + 4 appends
    assert(Lance.versions(spark, dir).size == 5)
  }

  test("compact merges epoch fragments; data and time travel survive") {
    val dir = s"${tmpDir()}/compact"
    // 6 tiny appends = 6 versions, >= 6 fragments (streaming-sink shape)
    (1 to 6).foreach { i =>
      Seq((i.toLong, s"r$i")).toDF("id", "s")
        .write.format("lance").mode("append").save(dir)
    }
    val (before, after) = Lance.compact(spark, dir, maxRowsPerFile = 1000L)
    assert(before >= 6)
    assert(after == 1)
    val df = spark.read.format("lance").load(dir)
    assert(df.count() == 6)
    assert(df.select("id").collect().map(_.getLong(0)).toSet == (1L to 6L).toSet)
    // pre-compaction version still reads the old fragment list
    val v3 = spark.read.format("lance").option("versionAsOf", "3").load(dir)
    assert(v3.count() == 3)
  }

  test("write.distribution-mode plans the shuffle/sort in front of the write") {
    val dir = s"${tmpDir()}/distrange"
    // deliberately unsorted, many-partition input: the ENGINE must plan
    // the range shuffle + sort, not the caller
    val src = spark.range(0, 4000).select(
      (col("id") * 2654435761L % 4000).as("id")) // scrambled
      .repartition(8)
    src.write.format("lance")
      .option("write.distribute-by", "id")
      .option("write.distribution-mode", "range")
      .option("write.max-rows-per-file", "1000")
      .mode("overwrite").save(dir)
    val m = LanceFormat.readLatest(fs(dir), new Path(dir)).get
    assert(m.fragments.size >= 2)
    // range mode ⇒ disjoint per-fragment [min,max] on the distribute col
    val bounds = m.fragments.flatMap(_.stats.flatMap(_.get("id")))
      .map(st => (st.min.get.toLong, st.max.get.toLong)).sortBy(_._1)
    assert(bounds.size == m.fragments.size, "every fragment must carry id stats")
    bounds.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi < lo2,
        s"fragments must not overlap under range distribution: $bounds")
      case _ =>
    }
    // ...which is exactly what makes range predicates prune
    val probed = spark.read.format("lance").load(dir)
      .filter(col("id") >= 100 && col("id") < 200)
    assert(scannedFragments(probed) == 1, "range filter must prune to one fragment")
    assert(probed.count() ==
      (0L until 4000L).map(i => i * 2654435761L % 4000).count(v => v >= 100 && v < 200))
    // hash mode: every distinct key lands in exactly one fragment
    val dir2 = s"${tmpDir()}/disthash"
    spark.range(0, 1000).select((col("id") % 7).as("k"), col("id"))
      .repartition(5)
      .write.format("lance")
      .option("write.distribute-by", "k")
      .mode("overwrite").save(dir2) // distribute-by alone defaults to hash
    val m2 = LanceFormat.readLatest(fs(dir2), new Path(dir2)).get
    val keyFrags = m2.fragments.flatMap(f =>
      f.stats.flatMap(_.get("k")).flatMap(_.values).getOrElse(Seq.empty)
        .map(v => (v, f.file)))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size)
    assert(keyFrags.nonEmpty && keyFrags.values.forall(_ == 1),
      s"hash mode must co-locate each key: $keyFrags")
    // typo'd mode fails loud
    val bad = intercept[Exception] {
      spark.range(1).write.format("lance")
        .option("write.distribute-by", "id")
        .option("write.distribution-mode", "zorder")
        .mode("overwrite").save(s"${tmpDir()}/distbad")
    }
    assert(bad.getMessage.contains("none|hash|range"), bad.getMessage)
  }

  test("compactSmall bin-packs only the small tail; big fragments ride by reference") {
    val dir = s"${tmpDir()}/compact-small"
    // one big fragment + 6 tiny appends (the streaming-epoch long tail)
    (0L until 500L).map(i => (i, s"big$i")).toDF("id", "s")
      .coalesce(1).write.format("lance").mode("overwrite").save(dir)
    (1 to 6).foreach { i =>
      Seq((1000L + i, s"r$i")).toDF("id", "s")
        .write.format("lance").mode("append").save(dir)
    }
    val preBig = LanceFormat.readLatest(fs(dir), new Path(dir)).get
      .fragments.maxBy(_.rowCount)
    val (before, after) = Lance.compactSmall(spark, dir, minRows = 100L)
    assert(before == 7 && after == 2, s"got ($before, $after)")
    val post = LanceFormat.readLatest(fs(dir), new Path(dir)).get
    // the big fragment's FILE survives — carried by reference, zero I/O
    assert(post.fragments.map(_.file).contains(preBig.file))
    // row-preserving: changefeed readers skip this commit
    assert(post.operation.contains("rewrite"))
    val df = spark.read.format("lance").load(dir)
    assert(df.count() == 506)
    assert(df.filter(col("id") >= 1000L).count() == 6)
    // fewer than two small fragments: no-op, no new version
    val vBefore = Lance.versions(spark, dir).size
    assert(Lance.compactSmall(spark, dir, minRows = 1L) == ((2, 2)))
    assert(Lance.versions(spark, dir).size == vBefore)
  }

  test("compact preserves the streaming epoch watermark") {
    val dir = s"${tmpDir()}/compact-epoch"
    Seq((1L, "a")).toDF("id", "s").write.format("lance").mode("append").save(dir)
    Seq((2L, "b")).toDF("id", "s").write.format("lance")
      .option("write.epoch-id", "7").mode("append").save(dir)
    val pre = LanceFormat.readLatest(fs(dir), new Path(dir)).get
    assert(pre.epochId.contains(7L))
    Lance.compact(spark, dir, maxRowsPerFile = 1000L)
    val post = LanceFormat.readLatest(fs(dir), new Path(dir)).get
    assert(post.epochId.contains(7L)) // replayed epoch 7 still skips
    assert(spark.read.format("lance").load(dir).count() == 2)
  }

  test("SQL time travel through the catalog: VERSION AS OF / TIMESTAMP AS OF") {
    val wh = s"${tmpDir()}/tt-warehouse"
    spark.conf.set("spark.sql.catalog.lance_tt", "graft.catalog.LanceCatalog")
    spark.conf.set("spark.sql.catalog.lance_tt.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE lance_tt.db")
      spark.sql("CREATE TABLE lance_tt.db.t (id BIGINT, s STRING)")
      spark.sql("INSERT INTO lance_tt.db.t VALUES (1, 'a')")
      spark.sql("INSERT INTO lance_tt.db.t VALUES (2, 'b')")
      // v1 = empty create, v2 = first insert, v3 = second insert
      assert(spark.sql("SELECT * FROM lance_tt.db.t").count() == 2)
      assert(spark.sql("SELECT * FROM lance_tt.db.t VERSION AS OF 2").count() == 1)
      assert(spark.sql("SELECT * FROM lance_tt.db.t VERSION AS OF 1").count() == 0)
      val e = intercept[Exception] {
        spark.sql("SELECT * FROM lance_tt.db.t VERSION AS OF 9").collect()
      }
      assert(e.getMessage.contains("no version 9"), e.getMessage)
      // TIMESTAMP AS OF now -> latest
      assert(spark.sql(
        "SELECT * FROM lance_tt.db.t TIMESTAMP AS OF current_timestamp()").count() == 2)
      // a TAG name in VERSION AS OF resolves through the tag file
      Lance.tag(spark, s"$wh/db/t", "first-insert", version = Some(2L))
      assert(spark.sql(
        "SELECT * FROM lance_tt.db.t VERSION AS OF 'first-insert'").count() == 1)
      val badTag = intercept[Exception] {
        spark.sql("SELECT * FROM lance_tt.db.t VERSION AS OF 'nope'").collect()
      }
      assert(badTag.getMessage.contains("neither a numeric version nor a tag"),
        badTag.getMessage)
    } finally {
      spark.sql("DROP NAMESPACE IF EXISTS lance_tt.db CASCADE")
      spark.conf.unset("spark.sql.catalog.lance_tt")
      spark.conf.unset("spark.sql.catalog.lance_tt.warehouse")
    }
  }

  test("empty dataframe write creates a readable empty dataset") {
    val dir = s"${tmpDir()}/empty"
    spark.range(0).write.format("lance").mode("append").save(dir)
    assert(spark.read.format("lance").load(dir).count() == 0)
  }

  test("failed write aborts cleanly: no new version, no orphan data files") {
    val dir = s"${tmpDir()}/abortw"
    Seq((1L, "seed")).toDF("id", "s").write.format("lance").mode("append").save(dir)
    // 4 tasks; the poison row is the LAST of its partition and sleeps
    // before throwing, so the 3 sibling tasks deterministically commit
    // their files first — the job-level abort must then delete THOSE too,
    // not just the failing task's partials
    val poison = udf { id: Long =>
      if (id == 199) { Thread.sleep(3000); sys.error("poison row") }
      "r" + id
    }
    val bad = spark.range(200).repartition(4).select(col("id"), poison(col("id")).as("s"))
    intercept[Exception] {
      bad.write.format("lance").mode("append").save(dir)
    }
    assert(Lance.versions(spark, dir).size == 1, "aborted write must not commit a version")
    val back = spark.read.format("lance").load(dir)
    assert(back.count() == 1)
    val m = LanceFormat.readLatest(fs(dir), new Path(dir)).get
    val referenced = m.fragments.map(_.file).toSet
    val onDisk = fs(dir).listStatus(LanceFormat.dataPath(new Path(dir)))
      .map(_.getPath.getName).filterNot(_.endsWith(".crc")).toSet
    assert(onDisk == referenced, s"orphan files left behind: ${onDisk -- referenced}")
  }

  test("reference type surface round-trips data-exact (plus decimal and map)") {
    // The reference converts exactly these logical types (arrowTypeToFlinkType /
    // flinkTypeToArrowField, `converter/LanceTypeConverter.java:114-257`):
    // int8/16/32/64, float32/64, string, boolean, binary, date, timestamp,
    // and NESTED array/struct — map and decimal throw UnsupportedTypeException
    // there but ride Spark's Parquet path here for free. One row exercises
    // every type, one row is null in every nullable slot (incl. null array
    // ELEMENTS and a null nested struct — the converter's recursive cases).
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("i8", ByteType), StructField("i16", ShortType),
      StructField("i32", IntegerType), StructField("f32", FloatType),
      StructField("f64", DoubleType), StructField("s", StringType),
      StructField("b", BooleanType), StructField("bin", BinaryType),
      StructField("d", DateType), StructField("ts", TimestampType),
      StructField("arr", ArrayType(IntegerType, containsNull = true)),
      StructField("nested", StructType(Seq(
        StructField("tag", StringType),
        StructField("scores", ArrayType(DoubleType, containsNull = false))))),
      StructField("dec", DecimalType(18, 4)),
      StructField("m", MapType(StringType, LongType, valueContainsNull = true))))
    val rows = Seq(
      Row(1L, 7.toByte, 300.toShort, 70000, 1.5f, 2.25, "héllo", true,
        Array[Byte](0, 1, -2), java.sql.Date.valueOf("2026-08-12"),
        java.sql.Timestamp.valueOf("2026-08-12 10:30:00.123456"),
        Seq(1, null, 3), Row("t1", Seq(0.5, -0.5)),
        new java.math.BigDecimal("12345.6789"), Map("a" -> 1L, "b" -> null)),
      Row(2L, null, null, null, null, null, null, null, null, null, null,
        null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = s"${tmpDir()}/types"
    df.write.format("lance").mode("append").save(dir)
    val back = spark.read.format("lance").load(dir)
    assert(back.schema == schema, s"schema drifted: ${back.schema.treeString}")
    // Row-level == is reference equality for Array[Byte] and set ops reject
    // maps — compare canonical JSON projections instead (binary → base64,
    // map keys emitted in insertion order, which the Parquet round trip
    // preserves).
    def canon(x: org.apache.spark.sql.DataFrame): Seq[String] =
      x.select(to_json(struct(schema.fieldNames.map(col): _*)))
        .collect().map(_.getString(0)).sorted.toSeq
    assert(canon(back) == canon(df))
  }

  test("timestampAsOf resolves the newest version committed at or before the instant") {
    val dir = s"${tmpDir()}/ts1"
    Seq((1L, "a")).toDF("id", "s").write.format("lance").mode("append").save(dir)
    Thread.sleep(15) // committedAtMs has millisecond granularity
    val betweenMs = System.currentTimeMillis()
    Thread.sleep(15)
    Seq((2L, "b")).toDF("id", "s").write.format("lance").mode("append").save(dir)

    // epoch-millis form: sees only version 1
    val atV1 = spark.read.format("lance")
      .option("timestampAsOf", betweenMs.toString).load(dir)
    assert(atV1.count() == 1)
    // ISO instant in the future: sees both
    val now = spark.read.format("lance")
      .option("timestampAsOf",
        java.time.Instant.ofEpochMilli(System.currentTimeMillis() + 1000).toString)
      .load(dir)
    assert(now.count() == 2)
    // before the first commit: loud error
    val e = intercept[Exception] {
      spark.read.format("lance").option("timestampAsOf", "0").load(dir).count()
    }
    assert(e.getMessage.contains("timestampAsOf"))
    // both pins at once: rejected
    val e2 = intercept[Exception] {
      spark.read.format("lance").option("versionAsOf", "1")
        .option("timestampAsOf", betweenMs.toString).load(dir).count()
    }
    assert(e2.getMessage.contains("only one of"))
  }
}
