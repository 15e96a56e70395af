package graft

import graft.format.LanceFormat
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** [[graft.operators.Dml.applyChanges]] — CDC apply: keyed upserts AND
  * deletes from one change batch in ONE atomic commit. Contracts:
  *  - mixed batch (delete + update + insert) = exactly one new version
  *  - delete of an absent key is a no-op (idempotent replay); NULL
  *    delete flag reads false; null-keyed upserts are plain inserts
  *  - duplicate keys across the batch refused loud
  *  - `setProperties` lands in the same commit (the MV watermark ride);
  *    empty batch + properties = metadata-only commit
  *  - only fragments HOLDING matching keys rewrite (clustered table)
  *  - opt-in CDF images: delete / update_preimage / update_postimage /
  *    insert, exact rows
  */
class ApplyChangesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "applych-")
      .toAbsolutePath.toString

  private def manifest(dir: String) = {
    val root = new Path(dir)
    val fs = LanceFormat.fileSystem(root, spark.sessionState.newHadoopConf())
    LanceFormat.readLatest(fs, root).get
  }

  private def baseTable(dir: String): Unit =
    (1L to 100L).map(i => (i, s"v$i", i * 10.0)).toDF("id", "s", "x")
      .repartition(4).write.format("lance").mode("overwrite").save(dir)

  test("mixed delete+update+insert lands as ONE commit with exact content") {
    val dir = tmpDir()
    baseTable(dir)
    val v0 = manifest(dir).version
    // delete 3,4; update 5 (x -> -1); insert 200; delete absent 999 (no-op)
    val batch = Seq(
      (3L, null.asInstanceOf[String], 0.0, true),
      (4L, null.asInstanceOf[String], 0.0, true),
      (999L, null.asInstanceOf[String], 0.0, true),
      (5L, "v5b", -1.0, false),
      (200L, "new", 2000.0, false))
      .toDF("id", "s", "x", "_del")
    val r = Lance.applyChanges(spark, dir, batch, Seq("id"), col("_del"))
    val m = manifest(dir)
    assert(m.version == v0 + 1, "one atomic commit")
    assert(r.rowsChanged == 3L) // 3,4 deleted + 5 updated
    assert(r.rowsInserted == 1L)
    val live = spark.read.format("lance").load(dir)
    assert(live.count() == 99L) // 100 - 2 + 1
    assert(live.filter(col("id").isin(3L, 4L)).isEmpty)
    assert(live.filter(col("id") === 5L).select("s", "x").as[(String, Double)]
      .head() == ("v5b", -1.0))
    assert(live.filter(col("id") === 200L).count() == 1L)
    // replay the same batch: deletes are no-ops, update/insert idempotent
    Lance.applyChanges(spark, dir, batch, Seq("id"), col("_del"))
    val live2 = spark.read.format("lance").load(dir)
    assert(live2.count() == 99L)
  }

  test("NULL delete flag reads false; null keys and dup keys refused loud") {
    val dir = tmpDir()
    baseTable(dir)
    val batch = Seq((Option(7L), "upd7", 0.5, Option.empty[Boolean]))
      .toDF("id", "s", "x", "_del")
    Lance.applyChanges(spark, dir, batch, Seq("id"), col("_del"))
    val live = spark.read.format("lance").load(dir)
    assert(live.filter(col("id") === 7L).select("s").as[String].head() == "upd7")
    // a NULL key would break replay idempotence (null-dropping joins:
    // the delete no-ops, the upsert re-inserts every replay) — refused
    val nullKeyed = Seq(
      (Option(8L), "upd8", 0.5, Option(false)),
      (Option.empty[Long], "nullkey", 1.0, Option(false)))
      .toDF("id", "s", "x", "_del")
    val en = intercept[IllegalArgumentException](
      Lance.applyChanges(spark, dir, nullKeyed, Seq("id"), col("_del")))
    assert(en.getMessage.contains("NULL in a key column"))
    // same key as delete AND upsert: ambiguous, loud
    val dup = Seq((9L, "a", 1.0, true), (9L, "b", 2.0, false))
      .toDF("id", "s", "x", "_del")
    val e = intercept[IllegalArgumentException](
      Lance.applyChanges(spark, dir, dup, Seq("id"), col("_del")))
    assert(e.getMessage.contains("duplicate keys"))
  }

  test("setProperties rides the data commit; empty batch commits metadata only") {
    val dir = tmpDir()
    baseTable(dir)
    val v0 = manifest(dir).version
    val batch = Seq((1L, "one", 1.0, false)).toDF("id", "s", "x", "_del")
    graft.operators.Dml.applyChanges(spark, dir, batch, Seq("id"),
      col("_del"), setProperties = Map("graft.mv.version" -> "7"))
    val m = manifest(dir)
    assert(m.version == v0 + 1)
    assert(m.properties.get("graft.mv.version") == "7")
    // empty source: metadata-only commit carrying the mutation
    val empty = batch.limit(0)
    graft.operators.Dml.applyChanges(spark, dir, empty, Seq("id"),
      col("_del"), setProperties = Map("graft.mv.version" -> "8"))
    val m2 = manifest(dir)
    assert(m2.version == m.version + 1)
    assert(m2.fragments.map(_.file) == m.fragments.map(_.file))
    assert(m2.properties.get("graft.mv.version") == "8")
  }

  test("require-properties CAS: a moved watermark refuses every commit shape") {
    val dir = tmpDir()
    baseTable(dir)
    Lance.setProperties(spark, dir, Map("wm" -> "5"))
    def batch(id: Long) = Seq((id, "x", 1.0, false)).toDF("id", "s", "x", "_del")
    // replace-shaped commit (key 1 exists)
    val e1 = intercept[java.util.ConcurrentModificationException](
      graft.operators.Dml.applyChanges(spark, dir, batch(1L), Seq("id"),
        col("_del"), setProperties = Map("wm" -> "6"),
        requireProperties = Map("wm" -> "4")))
    assert(e1.getMessage.contains("wm=4"))
    // pure-insert commit (new key): previously the silent double-apply hole
    intercept[java.util.ConcurrentModificationException](
      graft.operators.Dml.applyChanges(spark, dir, batch(5000L), Seq("id"),
        col("_del"), setProperties = Map("wm" -> "6"),
        requireProperties = Map("wm" -> "4")))
    // metadata-only commit (empty batch)
    intercept[java.util.ConcurrentModificationException](
      graft.operators.Dml.applyChanges(spark, dir, batch(1L).limit(0), Seq("id"),
        col("_del"), setProperties = Map("wm" -> "6"),
        requireProperties = Map("wm" -> "4")))
    assert(Lance.tableProperties(spark, dir)("wm") == "5", "nothing landed")
    assert(spark.read.format("lance").load(dir).count() == 100L)
    // matching expectation: all three shapes commit
    graft.operators.Dml.applyChanges(spark, dir, batch(5000L), Seq("id"),
      col("_del"), setProperties = Map("wm" -> "6"),
      requireProperties = Map("wm" -> "5"))
    assert(Lance.tableProperties(spark, dir)("wm") == "6")
    assert(spark.read.format("lance").load(dir).count() == 101L)
    // overwrite-shaped commit (a full MV/replica rebuild): the CAS holds
    // here too — previously write.require-properties was silently SKIPPED
    // on mode=overwrite
    val ow = Seq((1L, "x", 1.0)).toDF("id", "s", "x")
    intercept[java.util.ConcurrentModificationException](
      ow.write.format("lance").mode("overwrite")
        .option("write.require-properties",
          graft.format.LanceFormat.serializeProperties(Map("wm" -> "4")))
        .save(dir))
    assert(spark.read.format("lance").load(dir).count() == 101L,
      "refused overwrite must land nothing")
    ow.write.format("lance").mode("overwrite")
      .option("write.require-properties",
        graft.format.LanceFormat.serializeProperties(Map("wm" -> "6")))
      .save(dir)
    assert(spark.read.format("lance").load(dir).count() == 1L)
  }

  test("only fragments holding matching keys rewrite (clustered table)") {
    val dir = tmpDir()
    (1L to 4000L).map(i => (i, i * 1.0)).toDF("id", "x")
      .write.format("lance").mode("overwrite")
      .option("write.max-rows-per-file", "500").save(dir)
    Lance.cluster(spark, dir, Seq("id"), maxRowsPerFile = 500L)
    val before = manifest(dir)
    // one delete + one update, both in the low-id range
    val batch = Seq((10L, 0.0, true), (12L, -1.0, false)).toDF("id", "x", "_del")
    val r = Lance.applyChanges(spark, dir, batch, Seq("id"), col("_del"))
    assert(r.candidateFragments <= 2,
      s"IN-list pruning should scope to the keys' fragments, got ${r.candidateFragments}")
    val after = manifest(dir)
    val survivors = after.fragments.map(_.file).toSet
      .intersect(before.fragments.map(_.file).toSet)
    assert(before.fragments.size - survivors.size <= 2,
      "untouched fragments must ride by reference")
    assert(spark.read.format("lance").load(dir).count() == 3999L)
  }

  test("CDF images: delete / update pre+post / insert, exact rows") {
    val dir = tmpDir()
    baseTable(dir)
    val v0 = manifest(dir).version
    spark.conf.set("spark.graft.dml.changeFeed", "true")
    try {
      val batch = Seq(
        (2L, null.asInstanceOf[String], 0.0, true),
        (6L, "upd6", 66.0, false),
        (300L, "ins", 3.0, false)).toDF("id", "s", "x", "_del")
      Lance.applyChanges(spark, dir, batch, Seq("id"), col("_del"))
    } finally spark.conf.unset("spark.graft.dml.changeFeed")
    val vN = manifest(dir).version
    graft.MetaTvfs.register(spark)
    val feed = spark.sql(s"SELECT * FROM lance_changes('$dir', $v0, $vN)")
    val byKind = feed.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind == Map("delete" -> 1L, "update_preimage" -> 1L,
      "update_postimage" -> 1L, "insert" -> 1L), s"got $byKind")
    assert(feed.filter(col("_change_type") === "delete")
      .select("id").as[Long].head() == 2L)
    assert(feed.filter(col("_change_type") === "update_preimage")
      .select("x").as[Double].head() == 60.0)
    assert(feed.filter(col("_change_type") === "update_postimage")
      .select("x").as[Double].head() == 66.0)
    assert(feed.filter(col("_change_type") === "insert")
      .select("id").as[Long].head() == 300L)
  }
}
