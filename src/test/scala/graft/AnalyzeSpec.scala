package graft

import graft.format.{HllSketch, LanceFormat, TableStats}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** ANALYZE TABLE ([[Lance.analyze]]): per-column NDV via an own dense
  * HyperLogLog (p=12, ~1.6% error), persisted with its sketches so later
  * runs merge appends instead of rescanning history, and served to
  * Spark's CBO as DSv2 column statistics. Contracts pinned here:
  *  - sketch accuracy on planted cardinalities (1, 100, 10k, unique)
  *  - nulls are not values: they don't count toward NDV
  *  - INCREMENTAL: after an append, re-analyze reads ONLY the new
  *    fragments (proven by physically removing the old files first) and
  *    the merged result equals a from-scratch analyze bit for bit
  *  - a rewrite (DML delete) falls back to a full recompute — NDV can
  *    shrink again (sketch unions never un-learn)
  *  - the scan serves distinctCount/nullCount to the optimizer:
  *    attributeStats visible under CBO with the right numbers
  */
class AnalyzeSpec extends AnyFunSuite {
  import TestSpark._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "analyze-")
      .toAbsolutePath.toString

  private def fs(dir: String) =
    LanceFormat.fileSystem(new Path(dir), spark.sessionState.newHadoopConf())

  test("HLL sketch accuracy on planted cardinalities") {
    def ndvOf(n: Int): Long = {
      val sk = new HllSketch()
      (0 until n).foreach(i => sk.update(
        org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          i.toLong, org.apache.spark.sql.types.LongType, 42L)))
      sk.estimate()
    }
    Seq(1, 100, 10000, 200000).foreach { n =>
      val e = ndvOf(n)
      assert(math.abs(e - n) <= math.max(2, n * 0.05),
        s"ndv($n) estimated $e")
    }
    // serialization round-trip + merge = union
    val a = new HllSketch(); val b = new HllSketch()
    (0 until 1000).foreach(i => a.update(
      org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        i.toLong, org.apache.spark.sql.types.LongType, 42L)))
    (500 until 1500).foreach(i => b.update(
      org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        i.toLong, org.apache.spark.sql.types.LongType, 42L)))
    val m = HllSketch.deserialize(a.serialize()).merge(b)
    assert(math.abs(m.estimate() - 1500) <= 1500 * 0.05, m.estimate())
  }

  test("analyze: planted NDVs within 5%; nulls don't count") {
    val dir = tmpDir()
    spark.range(0, 20000).select(
        col("id").as("uniq"),
        pmod(col("id"), lit(100)).as("hundred"),
        lit(7L).as("constant"),
        when(pmod(col("id"), lit(2)) === 0, col("id")).as("half_null"),
        concat(lit("cat-"), pmod(col("id"), lit(10))).as("s"))
      .write.format("lance").mode("overwrite").save(dir)
    val ndv = Lance.analyze(spark, dir)
    def within(c: String, want: Long): Unit =
      assert(math.abs(ndv(c) - want) <= math.max(2, want * 0.05),
        s"$c: want ~$want got ${ndv(c)}")
    within("uniq", 20000); within("hundred", 100); within("constant", 1)
    within("half_null", 10000) // 10k non-null distinct ids
    within("s", 10)
  }

  test("incremental analyze reads only new fragments; merge == from-scratch") {
    val dir = tmpDir()
    spark.range(0, 5000).select(col("id").as("k"))
      .coalesce(2).write.format("lance").mode("overwrite").save(dir)
    Lance.analyze(spark, dir)
    val firstFiles = LanceFormat.readLatest(fs(dir), new Path(dir)).get
      .fragments.map(_.file)
    spark.range(4000, 9000).select(col("id").as("k"))
      .coalesce(2).write.format("lance").mode("append").save(dir)
    // the from-scratch answer, computed on a twin table with all the data
    val twin = tmpDir()
    spark.read.format("lance").load(dir)
      .write.format("lance").mode("overwrite").save(twin)
    val full = Lance.analyze(spark, twin)
    // physically remove the ORIGINAL fragments: an incremental analyze
    // that rescanned history would now crash
    firstFiles.foreach { f =>
      fs(dir).rename(LanceFormat.fragmentPath(new Path(dir), f),
        new Path(dir, s"hidden-$f"))
    }
    val inc = Lance.analyze(spark, dir)
    firstFiles.foreach { f => // restore for hygiene
      fs(dir).rename(new Path(dir, s"hidden-$f"),
        LanceFormat.fragmentPath(new Path(dir), f))
    }
    assert(inc("k") == full("k"),
      s"incremental ${inc("k")} != from-scratch ${full("k")}")
    assert(math.abs(inc("k") - 9000) <= 9000 * 0.05)
  }

  test("a rewrite falls back to full recompute: NDV shrinks after delete") {
    val dir = tmpDir()
    spark.range(0, 10000).select(col("id").as("k"))
      .write.format("lance").mode("overwrite").save(dir)
    val before = Lance.analyze(spark, dir)("k")
    Lance.deleteWhere(spark, dir, "k >= 2000") // 80% gone, via rewrite
    val after = Lance.analyze(spark, dir)("k")
    assert(math.abs(before - 10000) <= 10000 * 0.05)
    assert(math.abs(after - 2000) <= 2000 * 0.05,
      s"NDV did not shrink after rewrite: $after")
  }

  test("histograms: equi-height bins on skewed data, visible to CBO") {
    import spark.implicits._
    val dir = tmpDir()
    // heavy skew: 90% of rows in [0,100), a thin tail to 100k
    spark.range(0, 20000).select(
        when(pmod(col("id"), lit(10)) < 9, pmod(col("id"), lit(100)))
          .otherwise((col("id") * 5) + 100).as("k"))
      .write.format("lance").mode("overwrite").save(dir)
    Lance.analyze(spark, dir, histograms = true)
    val meta = graft.format.TableStats.read(fs(dir), new Path(dir)).get.columns("k")
    val bins = meta.histogram.get
    assert(bins.size >= 8 && bins.size <= 32, s"${bins.size} bins")
    // equi-HEIGHT: most bins land near height (skew collapses cut points
    // into fewer, denser bins, never wildly uneven ones)
    assert(meta.histogramHeight.exists(_ > 0))
    // the skewed mass concentrates the low range into many narrow bins:
    // at least half the bins must end below 200
    assert(bins.count(_.hi <= 200) >= bins.size / 2,
      bins.map(b => (b.lo, b.hi)).mkString(","))
    // CBO sees the histogram
    val saved = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val rel = spark.read.format("lance").load(dir)
        .queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
        }.head
      val k = rel.stats.attributeStats.map { case (a, s) => a.name -> s }.apply("k")
      assert(k.histogram.isDefined, "CBO sees no histogram")
      assert(k.histogram.get.bins.length == bins.size)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None => spark.conf.unset("spark.sql.cbo.enabled")
    }
    // incremental keeps the prior histogram (stale but shaped)
    spark.range(0, 100).select(col("id").as("k"))
      .write.format("lance").mode("append").save(dir)
    Lance.analyze(spark, dir)
    val after = graft.format.TableStats.read(fs(dir), new Path(dir)).get.columns("k")
    assert(after.histogram.map(_.size).contains(bins.size))
  }

  test("write.refresh-stats: the commit itself keeps ANALYZE fresh") {
    val dir = tmpDir()
    spark.range(0, 3000).select(col("id").as("k"))
      .write.format("lance").mode("overwrite").save(dir)
    Lance.analyze(spark, dir)
    // an append with the option merges its sketch in-commit (no manual
    // re-analyze); without it the sidecar would stay at 3000
    spark.range(3000, 6000).select(col("id").as("k"))
      .write.format("lance").option("write.refresh-stats", "true")
      .mode("append").save(dir)
    val stored = graft.format.TableStats.read(fs(dir), new Path(dir)).get
    assert(math.abs(stored.columns("k").ndv - 6000) <= 6000 * 0.05,
      s"in-commit refresh missing: ${stored.columns("k").ndv}")
    assert(stored.rowCount == 6000)
  }

  test("the scan serves NDV/nullCount to the optimizer under CBO") {
    val dir = tmpDir()
    spark.range(0, 8000).select(
        pmod(col("id"), lit(50)).as("k"),
        when(pmod(col("id"), lit(4)) === 0, col("id")).as("v"))
      .write.format("lance").mode("overwrite").save(dir)
    Lance.analyze(spark, dir)
    val saved = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val df = spark.read.format("lance").load(dir).select("k", "v")
      val scanRel = df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
      }.head
      val stats = scanRel.stats
      assert(stats.rowCount.contains(BigInt(8000)), stats.rowCount)
      val byName = stats.attributeStats.map { case (a, s) => a.name -> s }
      assert(byName.contains("k"), s"no column stats: ${byName.keySet}")
      val k = byName("k")
      assert(k.distinctCount.exists(d =>
        (d - BigInt(50)).abs <= BigInt(3)), k.distinctCount)
      assert(k.nullCount.contains(BigInt(0)), k.nullCount)
      val v = byName("v")
      assert(v.nullCount.contains(BigInt(6000)), v.nullCount) // 3/4 null
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None => spark.conf.unset("spark.sql.cbo.enabled")
    }
  }

  test("column statistics survive RENAME COLUMN without a re-ANALYZE") {
    val dir = tmpDir()
    spark.range(0, 8000).select(
        pmod(col("id"), lit(50)).as("k"), col("id").as("v"))
      .write.format("lance").mode("overwrite").save(dir)
    Lance.analyze(spark, dir)
    // sidecar keys carry analyze-time logical names; the scan must
    // resolve them through the analyzed version's mapping to the CURRENT
    // logical name, or a rename silently drops the stats from CBO
    Lance.renameColumn(spark, dir, "k", "key")
    val saved = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val df = spark.read.format("lance").load(dir).select("key", "v")
      val scanRel = df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
      }.head
      val byName = scanRel.stats.attributeStats.map { case (a, s) => a.name -> s }
      assert(byName.contains("key"),
        s"stats lost after rename: ${byName.keySet}")
      assert(byName("key").distinctCount.exists(d =>
        (d - BigInt(50)).abs <= BigInt(3)), byName("key").distinctCount)
      // nullCount resolves through the CURRENT physical name too
      assert(byName("key").nullCount.contains(BigInt(0)))
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None => spark.conf.unset("spark.sql.cbo.enabled")
    }
  }

  test("a SUBSET analyze merges into the sidecar instead of replacing it") {
    val dir = tmpDir()
    spark.range(0, 4000).select(
        pmod(col("id"), lit(50)).as("k"),
        pmod(col("id"), lit(7)).as("g"),
        col("id").as("v"))
      .write.format("lance").mode("overwrite").save(dir)
    Lance.analyze(spark, dir) // full: k, g, v
    val full = TableStats.read(fs(dir), new Path(dir)).get
    assert(full.columns.keySet == Set("k", "g", "v"))

    // re-analyze ONE column: the other two must survive with their stats
    Lance.analyze(spark, dir, columns = Seq("k"))
    val after = TableStats.read(fs(dir), new Path(dir)).get
    assert(after.columns.keySet == Set("k", "g", "v"),
      s"subset analyze deleted columns: ${after.columns.keySet}")
    assert(after.columns("g").ndv == full.columns("g").ndv)
    assert(after.columns("v").ndv == full.columns("v").ndv)

    // the carried columns stay INCREMENTALLY analyzable: append, then a
    // full analyze must still count the appended rows for every column
    // (the sidecar's datasetVersion pins the oldest honest coverage)
    spark.range(10000, 12000).select(
        col("id").as("k"), col("id").as("g"), col("id").as("v"))
      .write.format("lance").mode("append").save(dir)
    val ndv = Lance.analyze(spark, dir)
    assert(math.abs(ndv("g") - (7 + 2000)) <= (7 + 2000) * 0.05,
      s"carried column lost appended rows: ndv(g)=${ndv("g")}")
    assert(math.abs(ndv("k") - (50 + 2000)) <= (50 + 2000) * 0.05,
      s"ndv(k)=${ndv("k")}")
  }
}
