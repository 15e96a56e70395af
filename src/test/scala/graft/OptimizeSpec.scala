package graft

import graft.format.{LanceFormat, TableStats}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** `Lance.optimize` / `CALL optimize` — the single scheduled-maintenance
  * entry point: compact the small-fragment tail, refresh index sidecars
  * (stale ones reported, never silently rebuilt), re-analyze exactly the
  * previously analyzed columns, optionally vacuum. Contracts pinned:
  *  - the tail bin-packs; big fragments ride by reference
  *  - an appends-only scalar index refreshes (postings answer for the
  *    tail's values afterwards); a failure degrades to `indexesStale`
  *  - stats stay OPT-IN: no sidecar → nothing analyzed; an existing
  *    sidecar re-analyzes its own column set, not the whole schema
  *  - keep_versions > 0 vacuums after everything committed
  *  - the whole run through SQL: CALL returns the summary row
  */
class OptimizeSpec extends AnyFunSuite {
  import TestSpark._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "optimize-")
      .toAbsolutePath.toString

  private def fs(dir: String) =
    LanceFormat.fileSystem(new Path(dir), spark.sessionState.newHadoopConf())

  private def frags(dir: String) =
    LanceFormat.readLatest(fs(dir), new Path(dir)).get.fragments

  test("optimize: compacts the tail, refreshes the index, re-analyzes its columns") {
    val dir = tmpDir()
    spark.range(0, 5000).select(col("id").as("k"), col("id").as("v"))
      .coalesce(1).write.format("lance").mode("overwrite").save(dir)
    Lance.buildScalarIndex(spark, dir, "k", numBuckets = 4)
    Lance.analyze(spark, dir, columns = Seq("k")) // opt-in, ONE column
    // the trickle tail streaming epochs leave behind
    (0 until 4).foreach { i =>
      spark.range(9000 + i * 10, 9010 + i * 10)
        .select(col("id").as("k"), col("id").as("v"))
        .coalesce(1).write.format("lance").mode("append").save(dir)
    }
    val before = frags(dir).size
    val r = Lance.optimize(spark, dir, minRows = 100)
    assert(r.fragmentsBefore == before)
    assert(r.fragmentsAfter < before,
      s"tail not packed: ${r.fragmentsBefore} -> ${r.fragmentsAfter}")
    // the 5000-row base fragment rode by reference (compactSmall shape)
    assert(frags(dir).exists(_.rowCount == 5000))
    // the index survived maintenance and answers for the tail's values
    assert(r.indexesRefreshed.nonEmpty || r.indexesStale.nonEmpty)
    assert(spark.read.format("lance").load(dir)
      .filter(col("k") === 9035L).count() == 1)
    // stats: exactly the previously analyzed column set, no expansion
    assert(r.columnsAnalyzed == 1)
    val stored = TableStats.read(fs(dir), new Path(dir)).get
    assert(stored.columns.keySet == Set("k"))
    // no vacuum by default
    assert(r.manifestsDeleted == 0 && r.filesDeleted == 0)
    assert(spark.read.format("lance").load(dir).count() == 5040)
  }

  test("an FTS refresh needing a rebuild is REPORTED stale, never silently paid") {
    val dir = tmpDir()
    val docs = spark.range(0, 400).selectExpr("id AS doc_id",
      "concat('alpha bravo charlie word', CAST(id AS STRING)) AS text")
    docs.coalesce(1).write.format("lance").mode("overwrite").save(dir)
    graft.index.FtsIndex.build(spark, spark.read.format("lance").load(dir),
      "text", "doc_id", dir, numTermPartitions = 2)
    // a small tail so optimize's compaction commits a REWRITE — the
    // delta walk then demands a rebuild, which optimize must refuse
    (0 until 3).foreach { i =>
      spark.range(1000 + i * 10, 1010 + i * 10).selectExpr("id AS doc_id",
          "concat('delta echo word', CAST(id AS STRING)) AS text")
        .coalesce(1).write.format("lance").mode("append").save(dir)
    }
    val r = Lance.optimize(spark, dir, minRows = 100)
    assert(r.fragmentsAfter < r.fragmentsBefore)
    assert(r.indexesStale.exists(_.contains("(fts)")),
      s"FTS must report stale after a rewrite, got refreshed=" +
        s"${r.indexesRefreshed} stale=${r.indexesStale}")
    // stale means unaccelerated, never wrong: an explicit rebuild closes it
    graft.index.FtsIndex.refresh(spark, dir, "text") // allowRebuild default
    assert(graft.index.FtsIndex.search(spark, dir, "text", "alpha", 5).count() > 0)
  }

  test("stats stay opt-in: a never-analyzed table analyzes nothing") {
    val dir = tmpDir()
    spark.range(0, 100).select(col("id").as("k"))
      .coalesce(1).write.format("lance").mode("overwrite").save(dir)
    spark.range(100, 110).select(col("id").as("k"))
      .coalesce(1).write.format("lance").mode("append").save(dir)
    val r = Lance.optimize(spark, dir, minRows = 1000)
    assert(r.columnsAnalyzed == 0)
    assert(TableStats.read(fs(dir), new Path(dir)).isEmpty)
  }

  test("declared retention: optimize without keep_versions honors the policy") {
    val dir = tmpDir()
    spark.range(0, 100).select(col("id").as("k"))
      .coalesce(1).write.format("lance").mode("overwrite").save(dir)
    (0 until 4).foreach { i =>
      spark.range(100 + i * 10, 110 + i * 10).select(col("id").as("k"))
        .coalesce(1).write.format("lance").mode("append").save(dir)
    }
    // no policy, no explicit keep: nothing vacuumed
    val r0 = Lance.optimize(spark, dir, minRows = 5)
    assert(r0.manifestsDeleted == 0)
    assert(Lance.versions(spark, dir).size > 1)
    // declare the policy; the plain nightly call now vacuums to it
    Lance.setRetention(spark, dir, keepVersions = 1)
    assert(Lance.retention(spark, dir).contains((1, None)))
    val r1 = Lance.optimize(spark, dir, minRows = 5)
    assert(r1.manifestsDeleted > 0, r1.toString)
    assert(Lance.versions(spark, dir).size == 1)
    assert(spark.read.format("lance").load(dir).count() == 140)
    // clearing the policy stops the vacuuming
    Lance.setRetention(spark, dir, keepVersions = 0)
    assert(Lance.retention(spark, dir).isEmpty)
    spark.range(1000, 1010).select(col("id").as("k"))
      .coalesce(1).write.format("lance").mode("append").save(dir)
    assert(Lance.optimize(spark, dir, minRows = 5).manifestsDeleted == 0)
    // a generous older-than pin keeps everything young
    Lance.setRetention(spark, dir, keepVersions = 1,
      olderThanMs = 24L * 3600 * 1000)
    assert(Lance.optimize(spark, dir, minRows = 5).manifestsDeleted == 0,
      "versions inside the time horizon must survive the count limit")
  }

  test("external consumer pins: register survives retention, advance releases") {
    val dir = tmpDir()
    spark.range(0, 50).select(col("id").as("k"))
      .coalesce(1).write.format("lance").mode("overwrite").save(dir)
    // consumer registers at v1 ("consumed through v1"), then the source
    // moves on without the consumer reading
    val wm = Lance.registerConsumer(spark, dir, "etl-job")
    assert(wm == 1L) // the version AT registration (the pin's window start)
    (0 until 4).foreach { i =>
      spark.range(100 + i * 10, 110 + i * 10).select(col("id").as("k"))
        .coalesce(1).write.format("lance").mode("append").save(dir)
    }
    Lance.setRetention(spark, dir, keepVersions = 1)
    Lance.optimize(spark, dir, minRows = 5)
    // the pin kept the consumer's whole window: the feed reads clean
    graft.MetaTvfs.register(spark)
    val head = Lance.versions(spark, dir).max
    val feed = spark.sql(
      s"SELECT * FROM lance_changes('$dir', $wm, $head)")
    assert(feed.filter(col("_change_type") === "insert").count() == 40L)
    // monotonic: backwards refuses; forward advance releases history
    intercept[IllegalArgumentException](
      Lance.advanceConsumer(spark, dir, "etl-job", wm - 1))
    Lance.advanceConsumer(spark, dir, "etl-job", head)
    assert(Lance.consumers(spark, dir) == Map("etl-job" -> head))
    // SQL surface: lance_consumers(path) lists pins + lag (the advance
    // commit itself is one version past the watermark it stored)
    val crow = spark.sql(s"SELECT * FROM lance_consumers('$dir')").collect()(0)
    assert(crow.getString(0) == "etl-job" && crow.getLong(1) == head &&
      crow.getLong(2) == 1L, crow.toString)
    spark.range(500, 505).select(col("id").as("k"))
      .coalesce(1).write.format("lance").mode("append").save(dir)
    Lance.optimize(spark, dir, minRows = 5)
    assert(Lance.versions(spark, dir).size <= 3,
      s"advanced pin must release old versions: ${Lance.versions(spark, dir)}")
    // dropping the consumer removes the pin entirely
    assert(Lance.dropConsumer(spark, dir, "etl-job"))
    assert(!Lance.dropConsumer(spark, dir, "etl-job"))
    assert(Lance.consumers(spark, dir).isEmpty)
    // unknown consumer cannot advance
    intercept[IllegalArgumentException](
      Lance.advanceConsumer(spark, dir, "nope", 1L))
  }

  test("vacuum blockers: the lagging consumer is NAMED in the report; advancing unblocks") {
    val dir = tmpDir()
    spark.range(0, 50).select(col("id").as("k"))
      .coalesce(1).write.format("lance").mode("overwrite").save(dir)
    val wm = Lance.registerConsumer(spark, dir, "slow-etl")
    (0 until 4).foreach { i =>
      spark.range(100 + i * 10, 110 + i * 10).select(col("id").as("k"))
        .coalesce(1).write.format("lance").mode("append").save(dir)
    }
    Lance.setRetention(spark, dir, keepVersions = 1)
    val r = Lance.optimize(spark, dir, minRows = 5)
    // the report names WHO blocked the vacuum, how far behind, and what
    // it cost — not just 'manifestsDeleted: 0'
    assert(r.vacuumBlockers.nonEmpty, "a lagging pin must surface")
    val line = r.vacuumBlockers.find(_.contains("consumer slow-etl"))
      .getOrElse(fail(s"consumer not named: ${r.vacuumBlockers}"))
    assert(line.contains(s"watermark v$wm") &&
      line.contains("extra version(s) retained"), line)
    // the SQL row carries the same report
    spark.conf.set("spark.sql.catalog.optb", "graft.catalog.LanceCatalog")
    spark.conf.set("spark.sql.catalog.optb.warehouse",
      new java.io.File(dir).getParent)
    try {
      val tbl = new java.io.File(dir).getName
      val row = spark.sql(
        s"CALL optb.system.optimize('$tbl', min_rows => 5)").collect()(0)
      val blockers = row.getAs[String]("vacuum_blockers")
      assert(blockers.contains("consumer slow-etl"), blockers)
    } finally {
      spark.conf.unset("spark.sql.catalog.optb")
      spark.conf.unset("spark.sql.catalog.optb.warehouse")
    }
    // advancing the consumer to the head unblocks the NEXT vacuum:
    // history releases and the report comes back clean. (The advance
    // commit itself bumps the head, so an up-to-date consumer sits one
    // version behind by construction — under keep_versions=1 that is
    // still honestly a blocker; the realistic nightly policy keeps >=2.)
    Lance.setRetention(spark, dir, keepVersions = 2)
    spark.range(500, 505).select(col("id").as("k"))
      .coalesce(1).write.format("lance").mode("append").save(dir)
    Lance.advanceConsumer(spark, dir, "slow-etl",
      Lance.versions(spark, dir).max)
    val r2 = Lance.optimize(spark, dir, minRows = 5)
    assert(r2.vacuumBlockers.isEmpty,
      s"advanced pin must not block: ${r2.vacuumBlockers}")
    assert(Lance.versions(spark, dir).size <= 4,
      s"vacuum must proceed once unblocked: ${Lance.versions(spark, dir)}")
  }

  test("keep_versions vacuums after the maintenance commits; SQL CALL surface") {
    val wh = tmpDir()
    spark.conf.set("spark.sql.catalog.lance_opt", "graft.catalog.LanceCatalog")
    spark.conf.set("spark.sql.catalog.lance_opt.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE lance_opt.db")
      val p = s"$wh/db/t"
      spark.range(0, 300).select(col("id").as("k"))
        .coalesce(1).write.format("lance").mode("overwrite").save(p)
      (0 until 3).foreach { i =>
        spark.range(300 + i * 10, 310 + i * 10).select(col("id").as("k"))
          .coalesce(1).write.format("lance").mode("append").save(p)
      }
      val row = spark.sql(
        "CALL lance_opt.system.optimize('db.t', min_rows => 50, keep_versions => 1)")
        .collect()(0)
      assert(row.getAs[Int]("fragments_after") < row.getAs[Int]("fragments_before"))
      assert(row.getAs[Int]("manifests_deleted") > 0, "vacuum did not run")
      // everything still reads
      assert(spark.read.format("lance").load(p).count() == 330)
      // vacuumed history is gone: version 1 is unreachable
      intercept[Exception] {
        spark.read.format("lance").option("versionAsOf", "1").load(p).count()
      }
    } finally {
      spark.conf.unset("spark.sql.catalog.lance_opt")
      spark.conf.unset("spark.sql.catalog.lance_opt.warehouse")
    }
  }
}
