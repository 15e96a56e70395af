package graft

import graft.index.ScalarIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Scalar point-lookup index: value → fragment postings consulted by the
  * scan builder for pushed `=` / `IN` filters. Every pruning assertion is
  * paired with a row-level correctness check against the unpruned data,
  * and staleness tests prove appended fragments are NEVER wrongly pruned
  * before a refresh.
  */
class ScalarIndexSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "scalaridx-")
      .toAbsolutePath.toString

  /** Number of fragment files the executed scan actually read. */
  private def scannedFiles(df: DataFrame): Int = {
    df.collect()
    def strip(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val scans = strip(df.queryExecution.executedPlan).collect {
      case b: BatchScanExec => b.scan
    }
    scans.collect { case p: ParquetScan => p.fileIndex.inputFiles.length }.sum
  }

  /** 4 fragments, EVEN ids interleaved so every fragment's [min,max]
    * spans nearly the whole domain (range stats cannot prune) and holds
    * 100 distinct ids (value sets overflow) — only the scalar index can
    * prune a point lookup. Odd ids are reserved for append tests (inside
    * the covered range, so range stats can't prune those either).
    */
  private def plant(dir: String): Unit = {
    val df = (0L until 400L).map(i => (2 * i, s"name${2 * i}", i % 4))
      .toDF("id", "s", "m")
    (0 until 4).foreach { f =>
      df.filter(col("m") === f).drop("m").coalesce(1)
        .write.format("lance").mode(if (f == 0) "overwrite" else "append").save(dir)
    }
  }

  test("eq lookup prunes to the single containing fragment, exact rows") {
    val dir = tmpDir()
    plant(dir)
    val all = spark.read.format("lance").load(dir)
    assert(scannedFiles(all.filter(col("id") === 6L)) == 4,
      "without an index a hash-distributed point lookup scans everything")
    ScalarIndex.build(spark, dir, "id", numBuckets = 8)
    val probed = spark.read.format("lance").load(dir).filter(col("id") === 6L)
    assert(scannedFiles(probed) == 1, "postings must prune to one fragment")
    assert(probed.collect().map(_.getString(1)).toSeq == Seq("name6"))
  }

  test("range probe prunes through the sorted projection; appends stay conservative") {
    val dir = tmpDir()
    plant(dir)
    val all = spark.read.format("lance").load(dir)
    assert(scannedFiles(all.filter(col("id") >= 4L && col("id") <= 6L)) == 4,
      "min/max bounds cannot prune an interleaved range")
    ScalarIndex.build(spark, dir, "id", numBuckets = 8)
    // BETWEEN prunes to exactly the fragments holding ids 4 (f2) and 6 (f3)
    val probed = spark.read.format("lance").load(dir)
      .filter(col("id") >= 4L && col("id") <= 6L)
    assert(scannedFiles(probed) == 2,
      "range projection must prune to the two containing fragments")
    assert(probed.collect().map(_.getLong(0)).sorted.toSeq == Seq(4L, 6L))
    // one-sided range: ids > 792 live in 3 of 4 fragments (794, 796, 798)
    val oneSided = spark.read.format("lance").load(dir).filter(col("id") > 792L)
    assert(scannedFiles(oneSided) == 3)
    assert(oneSided.count() == 3)
    // empty span prunes to zero fragments, zero rows
    val none = spark.read.format("lance").load(dir).filter(col("id") > 5000L)
    assert(scannedFiles(none) == 0 && none.count() == 0)
    // an appended (uncovered) fragment is always scanned, never pruned
    Seq((5L, "five")).toDF("id", "s").coalesce(1)
      .write.format("lance").mode("append").save(dir)
    val after = spark.read.format("lance").load(dir)
      .filter(col("id") >= 4L && col("id") <= 6L)
    assert(after.collect().map(_.getLong(0)).sorted.toSeq == Seq(4L, 5L, 6L))
    assert(scannedFiles(after) == 3, "2 covered + the uncovered append")
    // refresh delta-indexes the append; the range projection tightens
    ScalarIndex.refresh(spark, dir, "id")
    val refreshed = spark.read.format("lance").load(dir)
      .filter(col("id") >= 5L && col("id") <= 5L)
    assert(refreshed.collect().map(_.getLong(0)).toSeq == Seq(5L))
    assert(scannedFiles(refreshed) == 1, "refreshed append prunes to itself")
  }

  test("LIKE 'p%' prunes through the string range projection") {
    val dir = tmpDir()
    plant(dir)
    val all = spark.read.format("lance").load(dir)
    assert(scannedFiles(all.filter(col("s").startsWith("name100"))) >= 3,
      "string min/max bounds alone leave most fragments in play")
    ScalarIndex.build(spark, dir, "s", numBuckets = 8)
    // 'name100' matches exactly the id=100 row (ids stop at 798, so no
    // name100X exists) — one fragment
    val probed = spark.read.format("lance").load(dir)
      .filter(col("s").startsWith("name100"))
    assert(scannedFiles(probed) == 1,
      "string prefix must prune through the sorted projection")
    assert(probed.collect().map(_.getLong(0)).toSeq == Seq(100L))
    // SQL LIKE pushes the same StringStartsWith
    probed.createOrReplaceTempView("__likeprobe")
    val like = spark.read.format("lance").load(dir).filter(col("s").like("name10%"))
    assert(like.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(10L, 100L, 102L, 104L, 106L, 108L))
    // prefix matching nothing prunes to zero fragments
    val none = spark.read.format("lance").load(dir).filter(col("s").startsWith("zzz"))
    assert(scannedFiles(none) == 0 && none.count() == 0)
  }

  test("order keys preserve value order for every range-supported type") {
    import org.apache.spark.sql.types._
    val longs = Seq(Long.MinValue, -7L, -1L, 0L, 1L, 42L, Long.MaxValue)
    val keys = longs.map(v => ScalarIndex.orderKey(LongType, v).get)
    assert(keys == keys.sorted, s"long keys must sort like values: $keys")
    val dates = Seq("1969-12-25", "1970-01-01", "2026-08-14")
      .map(java.sql.Date.valueOf)
    val dkeys = dates.map(v => ScalarIndex.orderKey(DateType, v).get)
    assert(dkeys == dkeys.sorted)
    assert(ScalarIndex.orderKey(BooleanType, java.lang.Boolean.FALSE).get <
      ScalarIndex.orderKey(BooleanType, java.lang.Boolean.TRUE).get)
    assert(ScalarIndex.orderKey(StringType, "abc").get == "abc")
    // the build expression renders the SAME bytes (uppercase hex path)
    val df = Seq(-7L, 0L, 42L).toDF("v")
      .select(org.apache.spark.sql.functions.lpad(
        org.apache.spark.sql.functions.hex(
          col("v").bitwiseXOR(org.apache.spark.sql.functions.lit(Long.MinValue))),
        16, "0").as("k"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq(-7L, 0L, 42L).map(v => ScalarIndex.orderKey(LongType, v).get))
  }

  test("absent value prunes to zero fragments; IN unions postings") {
    val dir = tmpDir()
    plant(dir)
    ScalarIndex.build(spark, dir, "id", numBuckets = 8)
    val miss = spark.read.format("lance").load(dir).filter(col("id") === 99999L)
    assert(scannedFiles(miss) == 0, "a never-written key reads no fragment")
    assert(miss.count() == 0)
    // ids 4 and 6 live in different fragments -> union = 2
    val in2 = spark.read.format("lance").load(dir)
      .filter(col("id").isin(4L, 6L))
    assert(scannedFiles(in2) == 2)
    assert(in2.count() == 2)
  }

  test("append stays correct unrefreshed; refresh restores pruning") {
    val dir = tmpDir()
    plant(dir)
    ScalarIndex.build(spark, dir, "id", numBuckets = 8)
    // 40 ODD ids inside the covered [0,798] range: the appended
    // fragment's [1,79] range contains probe key 6 and its 40 distinct
    // values overflow the value set — neither stats layer prunes it, so
    // what this pins is the SCALAR layer's uncovered-fragment contract
    (0L until 40L).map(j => (2 * j + 1, s"late$j")).toDF("id", "s")
      .coalesce(1).write.format("lance").mode("append").save(dir)
    // uncovered: scanned for ANY probe, so new rows are found even
    // though the index predates them
    val late = spark.read.format("lance").load(dir).filter(col("id") === 7L)
    assert(scannedFiles(late) == 1, "only the uncovered fragment survives")
    assert(late.collect().map(_.getString(1)).toSeq == Seq("late3"))
    val old = spark.read.format("lance").load(dir).filter(col("id") === 6L)
    assert(scannedFiles(old) == 2, "covered postings hit + uncovered fragment")
    val meta = ScalarIndex.refresh(spark, dir, "id")
    assert(meta.coveredFiles.size == 5)
    assert(scannedFiles(
      spark.read.format("lance").load(dir).filter(col("id") === 7L)) == 1)
    assert(scannedFiles(
      spark.read.format("lance").load(dir).filter(col("id") === 6L)) == 1)
    assert(scannedFiles(
      spark.read.format("lance").load(dir).filter(col("id") === 99999L)) == 0)
  }

  test("string column postings prune and render exactly") {
    val dir = tmpDir()
    plant(dir)
    ScalarIndex.build(spark, dir, "s", numBuckets = 8)
    val probed = spark.read.format("lance").load(dir)
      .filter(col("s") === "name42")
    assert(scannedFiles(probed) == 1)
    assert(probed.collect().map(_.getLong(0)).toSeq == Seq(42L))
  }

  test("hot value past maxFilesPerValue is present-but-unprunable") {
    val dir = tmpDir()
    // odd ids 1..799 interleaved (100 distinct/fragment: value sets
    // overflow, ranges straddle); the EVEN mid-range value 400 recurs at
    // i % 90 == 0 -> fragments 0 and 2 — hot at cap 1
    val df = (0L until 400L)
      .map(i => (if (i % 90 == 0) 400L else 2 * i + 1, i % 4))
      .toDF("id", "m")
    (0 until 4).foreach { f =>
      df.filter(col("m") === f).drop("m").coalesce(1)
        .write.format("lance").mode(if (f == 0) "overwrite" else "append").save(dir)
    }
    spark.conf.set("spark.graft.scalarindex.maxFilesPerValue", "1")
    try ScalarIndex.build(spark, dir, "id", numBuckets = 4)
    finally spark.conf.unset("spark.graft.scalarindex.maxFilesPerValue")
    val hot = spark.read.format("lance").load(dir).filter(col("id") === 400L)
    assert(scannedFiles(hot) == 4, "hot value must not be pruned")
    assert(hot.count() == 5)
    val cold = spark.read.format("lance").load(dir).filter(col("id") === 13L)
    assert(scannedFiles(cold) == 1)
    assert(cold.count() == 1)
  }

  test("pointer swap: rebuild re-points the meta; vanished postings never mis-prune") {
    val dir = tmpDir()
    plant(dir) // interleaved evens: stats/value-set layers cannot prune
    val m1 = ScalarIndex.build(spark, dir, "id")
    assert(m1.postingsDir.exists(_.startsWith("postings-")),
      "build must name a versioned postings dir in the meta")
    // rebuild: a NEW dir is staged and the pointer moves; the old dir is
    // reclaimed only after the new meta landed
    val m2 = ScalarIndex.build(spark, dir, "id")
    assert(m2.postingsDir != m1.postingsDir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val ip = ScalarIndex.indexPath(dir, "id")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$ip/${m1.postingsDir.get}")),
      "old postings dir must be reclaimed after the swap")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$ip/${m2.postingsDir.get}")))
    // the index still serves lookups through the new pointer
    val hit = spark.read.format("lance").load(dir).filter(col("id") === 42L)
    assert(scannedFiles(hit) == 1 && hit.count() == 1)
    // THE advice scenario: the meta survives but its postings are gone
    // (crashed swap / concurrent rebuild). The old in-place layout made
    // every later lookup read "provably absent" and silently drop rows;
    // pointer resolution must instead skip pruning conservatively.
    ScalarIndex.evictMeta(spark, dir, "id")
    fs.delete(new org.apache.hadoop.fs.Path(s"$ip/${m2.postingsDir.get}"), true)
    val all = spark.read.format("lance").load(dir).filter(col("id") === 42L)
    assert(all.count() == 1, "vanished postings must never lose rows")
    assert(scannedFiles(all) == 4, "no postings -> no pruning, full scan")
  }

  test("dropIndex scalar + disabled conf both restore full scans") {
    val dir = tmpDir()
    plant(dir)
    ScalarIndex.build(spark, dir, "id", numBuckets = 8)
    spark.conf.set("spark.graft.scalarindex.enabled", "false")
    try assert(scannedFiles(
      spark.read.format("lance").load(dir).filter(col("id") === 6L)) == 4)
    finally spark.conf.unset("spark.graft.scalarindex.enabled")
    assert(Lance.dropIndex(spark, dir, "id", "scalar") == 1)
    assert(scannedFiles(
      spark.read.format("lance").load(dir).filter(col("id") === 6L)) == 4)
  }

  test("renderValue matches Spark CAST(... AS STRING) per supported type") {
    assert(ScalarIndex.renderValue(LongType, 42L).contains("42"))
    assert(ScalarIndex.renderValue(IntegerType, -7).contains("-7"))
    assert(ScalarIndex.renderValue(BooleanType, java.lang.Boolean.TRUE)
      .contains("true"))
    assert(ScalarIndex.renderValue(StringType, "x y").contains("x y"))
    assert(ScalarIndex.renderValue(DateType,
      java.sql.Date.valueOf("2024-02-29")).contains("2024-02-29"))
    assert(ScalarIndex.renderValue(DateType,
      java.time.LocalDate.of(2024, 2, 29)).contains("2024-02-29"))
    assert(ScalarIndex.renderValue(DecimalType(10, 2),
      new java.math.BigDecimal("1.5")).contains("1.50"))
    assert(ScalarIndex.renderValue(LongType, null).isEmpty)
    // the engine side of the same contract
    val r = spark.sql(
      "SELECT CAST(42L AS STRING), CAST(true AS STRING), " +
        "CAST(DATE'2024-02-29' AS STRING), CAST(CAST(1.5 AS DECIMAL(10,2)) AS STRING)")
      .collect().head
    assert(r.getString(0) == "42" && r.getString(1) == "true" &&
      r.getString(2) == "2024-02-29" && r.getString(3) == "1.50")
  }

  test("decimal postings prune with scale-exact rendering") {
    val dir = tmpDir()
    val df = (0L until 100L)
      .map(i => (i, new java.math.BigDecimal(i).movePointLeft(2), i % 4))
      .toDF("id", "d", "m")
      .withColumn("d", col("d").cast(DecimalType(10, 2)))
    (0 until 4).foreach { f =>
      df.filter(col("m") === f).drop("m").coalesce(1)
        .write.format("lance").mode(if (f == 0) "overwrite" else "append").save(dir)
    }
    ScalarIndex.build(spark, dir, "d", numBuckets = 4)
    val probed = spark.read.format("lance").load(dir)
      .filter(col("d") === lit(new java.math.BigDecimal("0.42")).cast(DecimalType(10, 2)))
    assert(scannedFiles(probed) == 1)
    assert(probed.collect().map(_.getLong(0)).toSeq == Seq(42L))
  }

  test("DML rewrite: dead postings vanish, rewritten fragment unprunable until refresh") {
    val dir = tmpDir()
    // range-clustered so the DELETE's stats scoping rewrites ONE fragment
    (0L until 400L).map(i => (2 * i, s"name${2 * i}")).toDF("id", "s")
      .repartitionByRange(4, col("id"))
      .write.format("lance").mode("overwrite").save(dir)
    ScalarIndex.build(spark, dir, "id", numBuckets = 8)
    val r = Lance.deleteWhere(spark, dir, "id = 6")
    assert(r.rowsChanged == 1)
    // deleted key: its postings point at the DEAD pre-rewrite file, which
    // the live manifest no longer lists; the replacement fragment is
    // uncovered so it is scanned — correct (0 rows), conservative
    val gone = spark.read.format("lance").load(dir).filter(col("id") === 6L)
    assert(scannedFiles(gone) == 1, "only the uncovered rewritten fragment")
    assert(gone.count() == 0)
    // surviving key from the SAME rewritten fragment: found in the
    // uncovered replacement even though its posting names a dead file
    val kept = spark.read.format("lance").load(dir).filter(col("id") === 8L)
    assert(kept.count() == 1)
    ScalarIndex.refresh(spark, dir, "id")
    assert(scannedFiles(
      spark.read.format("lance").load(dir).filter(col("id") === 8L)) == 1)
    assert(scannedFiles(
      spark.read.format("lance").load(dir).filter(col("id") === 6L)) == 0,
      "after refresh the deleted key is provably nowhere")
  }

  test("lance_indexes lists the scalar index with coverage and freshness") {
    val dir = tmpDir()
    plant(dir)
    ScalarIndex.build(spark, dir, "id", numBuckets = 8)
    graft.MetaTvfs.register(spark)
    val row = spark.sql(s"SELECT * FROM lance_indexes('$dir') WHERE kind = 'scalar'")
      .collect()
    assert(row.length == 1)
    assert(row.head.getAs[String]("column") == "id")
    assert(row.head.getAs[String]("detail") == "covered=4")
    assert(row.head.getAs[Int]("partitions") == 8)
    assert(row.head.getAs[Boolean]("fresh"))
    // an append makes it stale (correct but unprunable on the new file)
    Seq((9999L, "x")).toDF("id", "s").write.format("lance").mode("append").save(dir)
    val stale = spark.sql(s"SELECT fresh FROM lance_indexes('$dir') WHERE kind = 'scalar'")
      .collect().head
    assert(!stale.getBoolean(0))
  }

  test("streaming write.refresh-indexes keeps the scalar index fresh per epoch") {
    val srcDir = tmpDir()
    val dir = tmpDir()
    plant(dir)
    ScalarIndex.build(spark, dir, "id", numBuckets = 8)
    // odd ids inside the covered range arrive by stream (value sets
    // overflow at 40 distinct; range straddles — only postings prune)
    (0L until 40L).map(j => (2 * j + 1, s"late$j")).toDF("id", "s")
      .coalesce(1).write.format("lance").mode("overwrite").save(srcDir)
    val q = spark.readStream.format("lance").load(srcDir)
      .writeStream.format("lance")
      .option("checkpointLocation", s"$dir-ckpt")
      .option("write.refresh-indexes", "scalar")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(dir)
    q.awaitTermination()
    val meta = ScalarIndex.loadMeta(spark, dir, "id")
    val m = graft.format.LanceFormat.readLatest(
      new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sessionState.newHadoopConf()),
      new org.apache.hadoop.fs.Path(dir)).get
    assert(meta.coveredFiles.toSet == m.fragments.map(_.file).toSet,
      "the epoch commit must leave every fragment covered")
    // streamed key prunes to exactly its fragment; absent key to zero
    assert(scannedFiles(
      spark.read.format("lance").load(dir).filter(col("id") === 7L)) == 1)
    assert(scannedFiles(
      spark.read.format("lance").load(dir).filter(col("id") === 99999L)) == 0)
  }

  test("batch write.refresh-indexes covers the appended fragment in-commit") {
    val dir = tmpDir()
    plant(dir)
    ScalarIndex.build(spark, dir, "id", numBuckets = 8)
    // same uncoverable-by-stats shape as the append test, but the write
    // itself carries the refresh — no CALL, no explicit refresh
    (0L until 40L).map(j => (2 * j + 1, s"late$j")).toDF("id", "s")
      .coalesce(1).write.format("lance").mode("append")
      .option("write.refresh-indexes", "scalar").save(dir)
    val meta = ScalarIndex.loadMeta(spark, dir, "id")
    assert(meta.coveredFiles.size == 5,
      "the batch commit must return with the appended fragment covered")
    assert(scannedFiles(
      spark.read.format("lance").load(dir).filter(col("id") === 7L)) == 1)
    assert(scannedFiles(
      spark.read.format("lance").load(dir).filter(col("id") === 6L)) == 1)
    assert(scannedFiles(
      spark.read.format("lance").load(dir).filter(col("id") === 99999L)) == 0)
  }

  test("spark.graft.dml.refreshIndexes re-covers the DML-rewritten fragment") {
    val dir = tmpDir()
    (0L until 400L).map(i => (2 * i, s"name${2 * i}")).toDF("id", "s")
      .repartitionByRange(4, col("id"))
      .write.format("lance").mode("overwrite").save(dir)
    ScalarIndex.build(spark, dir, "id", numBuckets = 8)
    spark.conf.set("spark.graft.dml.refreshIndexes", "scalar")
    try {
      val r = Lance.deleteWhere(spark, dir, "id = 6")
      assert(r.rowsChanged == 1)
    } finally spark.conf.unset("spark.graft.dml.refreshIndexes")
    val meta = ScalarIndex.loadMeta(spark, dir, "id")
    val m = graft.format.LanceFormat.readLatest(
      new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sessionState.newHadoopConf()),
      new org.apache.hadoop.fs.Path(dir)).get
    assert(m.fragments.map(_.file).toSet.subsetOf(meta.coveredFiles.toSet),
      "the DML must return with the rewritten fragment covered")
    // fully covered again: deleted key provably nowhere, survivor from
    // the rewritten fragment prunes to exactly that fragment
    assert(scannedFiles(
      spark.read.format("lance").load(dir).filter(col("id") === 6L)) == 0)
    val kept = spark.read.format("lance").load(dir).filter(col("id") === 8L)
    assert(scannedFiles(kept) == 1)
    assert(kept.count() == 1)
    // unknown kind fails loud, not silently-unrefreshed
    spark.conf.set("spark.graft.dml.refreshIndexes", "scalr")
    try intercept[IllegalArgumentException] {
      Lance.deleteWhere(spark, dir, "id = 8")
    } finally spark.conf.unset("spark.graft.dml.refreshIndexes")
  }

  test("renderValue == engine CAST over randomized values, all types") {
    val rnd = new scala.util.Random(42)
    // longs across the full range, scale-2 decimals, dates, tricky strings
    val longs = Seq(0L, -1L, Long.MaxValue, Long.MinValue + 1) ++
      Seq.fill(200)(rnd.nextLong())
    val decs = Seq.fill(100)(new java.math.BigDecimal(
      java.math.BigInteger.valueOf(rnd.nextInt(1000000000) - 500000000), 2))
    val dates = Seq.fill(50)(java.time.LocalDate.ofEpochDay(rnd.nextInt(40000) - 10000))
    val strs = Seq("", " ", "a b", "日本語", "naïve", "x\"y", "0", "-0.0") ++
      Seq.fill(100)(rnd.alphanumeric.take(1 + rnd.nextInt(20)).mkString)
    val longCast = longs.toDF("v").select(col("v").cast("string")).collect().map(_.getString(0))
    longs.zip(longCast).foreach { case (v, want) =>
      assert(ScalarIndex.renderValue(LongType, v).contains(want), s"long $v") }
    val decCast = decs.toDF("v").select(col("v").cast(DecimalType(12, 2)).cast("string"))
      .collect().map(_.getString(0))
    decs.zip(decCast).foreach { case (v, want) =>
      assert(ScalarIndex.renderValue(DecimalType(12, 2), v).contains(want), s"dec $v") }
    val dateCast = dates.map(java.sql.Date.valueOf).toDF("v")
      .select(col("v").cast("string")).collect().map(_.getString(0))
    dates.zip(dateCast).foreach { case (v, want) =>
      assert(ScalarIndex.renderValue(DateType, v).contains(want), s"date $v") }
    strs.foreach { v =>
      assert(ScalarIndex.renderValue(StringType, v).contains(v), s"str '$v'") }
    // bucket function: driver == engine on every rendered value
    val rendered = (longCast ++ decCast ++ dateCast ++ strs).distinct.toSeq
    val engine = rendered.toDF("v")
      .select(col("v"), pmod(xxhash64(col("v")), lit(64)).cast("int"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    rendered.foreach { v =>
      assert(ScalarIndex.bucketOf(v, 64) == engine(v), s"bucket '$v'") }
  }

  test("driver bucketOf matches the build job's pmod(xxhash64)") {
    val vals = Seq("42", "name7", "2024-02-29", "1.50", "true", "", "日本語")
    val expected = vals.toDF("v")
      .select(col("v"), pmod(xxhash64(col("v")), lit(8)).cast("int").as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    vals.foreach { v =>
      assert(ScalarIndex.bucketOf(v, 8) == expected(v), s"bucket mismatch for '$v'")
    }
  }
}
