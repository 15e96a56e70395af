package graft

import graft.format.LanceFormat
import graft.operators.Replica
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Keyed table replication over the change feed ([[graft.operators.
  * Replica]]). Contracts:
  *  - create seeds a full copy + bookkeeping in one commit
  *  - sync applies NET-per-key changes from mixed DML (exact CDF images)
  *    and from plain appends/overwrites (fragment-diff feeds) alike;
  *    replica == source after every sync
  *  - multi-commit key history collapses (update then delete = delete;
  *    delete then re-insert = the new row)
  *  - sync twice = no-op; watermark rides the sync commit
  *  - a vacuumed feed window fails loud, never silently full-copies
  */
class ReplicaSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "repl-")
      .toAbsolutePath.toString

  private def manifest(dir: String) = {
    val root = new Path(dir)
    val fs = LanceFormat.fileSystem(root, spark.sessionState.newHadoopConf())
    LanceFormat.readLatest(fs, root).get
  }

  private def assertSame(a: DataFrame, b: DataFrame, hint: String): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, hint)

  test("mixed DML with CDF images replicates to an identical table") {
    val src = tmpDir(); val rep = tmpDir() + "/r"
    (1L to 200L).map(i => (i, s"v$i", i * 1.0)).toDF("id", "s", "x")
      .repartition(4).write.format("lance").mode("overwrite").save(src)
    Replica.create(spark, rep, src, Seq("id"))
    assertSame(spark.read.format("lance").load(rep),
      spark.read.format("lance").load(src), "seed copy differs")
    spark.conf.set("spark.graft.dml.changeFeed", "true")
    try {
      Lance.deleteWhere(spark, src, "id % 7 = 0")
      Lance.updateWhere(spark, src, "id % 5 = 1", Map("x" -> "x * 10"))
      Lance.upsert(spark, src,
        Seq((3L, "three", 0.3), (1001L, "new", 1.1)).toDF("id", "s", "x"),
        Seq("id"))
    } finally spark.conf.unset("spark.graft.dml.changeFeed")
    val r = Replica.sync(spark, rep)
    assert(r.rowsChanged > 0 && r.rowsInserted == 1L, r.toString)
    assertSame(spark.read.format("lance").load(rep),
      spark.read.format("lance").load(src), "post-DML sync differs")
    assert(manifest(rep).properties.get("graft.replica.version") ==
      manifest(src).version.toString)
    // idempotent: nothing moved, nothing committed
    val vBefore = manifest(rep).version
    assert(Replica.sync(spark, rep) == Replica.SyncResult(
      manifest(src).version, manifest(src).version, 0L, 0L))
    assert(manifest(rep).version == vBefore)
  }

  test("multi-commit per-key history collapses to the net effect") {
    val src = tmpDir(); val rep = tmpDir() + "/r"
    (1L to 20L).map(i => (i, i * 1.0)).toDF("id", "x")
      .write.format("lance").mode("overwrite").save(src)
    Replica.create(spark, rep, src, Seq("id"))
    spark.conf.set("spark.graft.dml.changeFeed", "true")
    try {
      // id=5: update then delete => net delete
      Lance.updateWhere(spark, src, "id = 5", Map("x" -> "555"))
      Lance.deleteWhere(spark, src, "id = 5")
      // id=7: delete then re-insert with a new value => net new row
      Lance.deleteWhere(spark, src, "id = 7")
      Lance.upsert(spark, src, Seq((7L, 777.0)).toDF("id", "x"), Seq("id"))
      // id=9: two updates => last wins
      Lance.updateWhere(spark, src, "id = 9", Map("x" -> "91"))
      Lance.updateWhere(spark, src, "id = 9", Map("x" -> "92"))
    } finally spark.conf.unset("spark.graft.dml.changeFeed")
    Replica.sync(spark, rep)
    val got = spark.read.format("lance").load(rep)
    assert(got.filter(col("id") === 5L).isEmpty)
    assert(got.filter(col("id") === 7L).select("x").as[Double].head() == 777.0)
    assert(got.filter(col("id") === 9L).select("x").as[Double].head() == 92.0)
    assertSame(got, spark.read.format("lance").load(src), "net collapse differs")
  }

  test("plain appends and overwrites (fragment-diff feeds) replicate too") {
    val src = tmpDir(); val rep = tmpDir() + "/r"
    (1L to 50L).map(i => (i, i * 1.0)).toDF("id", "x")
      .write.format("lance").mode("overwrite").save(src)
    Replica.create(spark, rep, src, Seq("id"))
    // append without CDF: feed = whole-fragment inserts
    (51L to 80L).map(i => (i, i * 1.0)).toDF("id", "x")
      .write.format("lance").mode("append").save(src)
    val r1 = Replica.sync(spark, rep)
    assert(r1.rowsInserted == 30L)
    assertSame(spark.read.format("lance").load(rep),
      spark.read.format("lance").load(src), "append sync differs")
    // overwrite: feed = delete-all + insert-all; net per key applies
    (100L to 109L).map(i => (i, i * 2.0)).toDF("id", "x")
      .write.format("lance").mode("overwrite").save(src)
    Replica.sync(spark, rep)
    assertSame(spark.read.format("lance").load(rep),
      spark.read.format("lance").load(src), "overwrite sync differs")
    assert(spark.read.format("lance").load(rep).count() == 10L)
  }

  test("SQL surface: CALL create_replica / sync_replica") {
    val wh = tmpDir()
    spark.conf.set("spark.sql.catalog.lance_rp", "graft.catalog.LanceCatalog")
    spark.conf.set("spark.sql.catalog.lance_rp.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE lance_rp.db")
      val src = s"$wh/db/t"
      (1L to 30L).map(i => (i, i * 1.0)).toDF("id", "x")
        .write.format("lance").mode("overwrite").save(src)
      val c = spark.sql(
        "CALL lance_rp.system.create_replica('db.r', 'db.t', 'id')").collect()(0)
      // create registers the replica on the source first (one metadata
      // commit), so the watermark is v2 of the source
      assert(c.getAs[Long]("source_version") == 2L)
      (31L to 40L).map(i => (i, i * 1.0)).toDF("id", "x")
        .write.format("lance").mode("append").save(src)
      val s = spark.sql("CALL lance_rp.system.sync_replica('db.r')").collect()(0)
      assert(s.getAs[Long]("rows_inserted") == 10L)
      assert(spark.read.format("lance").load(s"$wh/db/r").count() == 40L)
      // CALL drop_replica unregisters (releasing the retention pin) and
      // deletes the replica
      assert(spark.sql("CALL lance_rp.system.drop_replica('db.r')")
        .collect()(0).getAs[Boolean]("existed"))
      assert(!new java.io.File(s"$wh/db/r/_versions").exists())
      assert(!Lance.tableProperties(spark, src)
        .contains("graft.replica.dependents"))
    } finally {
      spark.conf.unset("spark.sql.catalog.lance_rp")
      spark.conf.unset("spark.sql.catalog.lance_rp.warehouse")
    }
  }

  test("lance_changes_net TVF: the collapsed per-key view of a window") {
    val dir = tmpDir()
    (1L to 10L).map(i => (i, i * 1.0)).toDF("id", "x")
      .write.format("lance").mode("overwrite").save(dir)
    spark.conf.set("spark.graft.dml.changeFeed", "true")
    try {
      Lance.updateWhere(spark, dir, "id = 5", Map("x" -> "555")) // then delete
      Lance.deleteWhere(spark, dir, "id = 5")
      Lance.updateWhere(spark, dir, "id = 9", Map("x" -> "91"))
      Lance.updateWhere(spark, dir, "id = 9", Map("x" -> "92")) // last wins
      Lance.upsert(spark, dir, Seq((20L, 20.0)).toDF("id", "x"), Seq("id"))
    } finally spark.conf.unset("spark.graft.dml.changeFeed")
    graft.MetaTvfs.register(spark)
    val vN = Lance.versions(spark, dir).max
    val net = spark.sql(
      s"SELECT * FROM lance_changes_net('$dir', 1, $vN, 'id')")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("_change_type"), r.getAs[Double]("x"))).toMap
    assert(net(5L)._1 == "delete")
    assert(net(9L) == ("upsert", 92.0))
    assert(net(20L) == ("upsert", 20.0))
    assert(net.size == 3, s"one net row per touched key: $net")
  }

  test("PROPERTY: random DML/append/compact sequences replicate exactly") {
    val rnd = new scala.util.Random(42)
    val src = tmpDir(); val rep = tmpDir() + "/r"
    (1L to 60L).map(i => (i, i * 1.0)).toDF("id", "x")
      .repartition(3).write.format("lance").mode("overwrite").save(src)
    Replica.create(spark, rep, src, Seq("id"))
    var nextId = 1000L
    (1 to 4).foreach { round =>
      // a random mix per round; CDF is ON for DML (exact images) while
      // appends/compaction exercise the fragment-diff / skip paths
      spark.conf.set("spark.graft.dml.changeFeed", "true")
      try {
        (1 to 3 + rnd.nextInt(3)).foreach { _ =>
          rnd.nextInt(5) match {
            case 0 =>
              Lance.deleteWhere(spark, src, s"id % 17 = ${rnd.nextInt(17)}")
            case 1 =>
              Lance.updateWhere(spark, src, s"id % 13 = ${rnd.nextInt(13)}",
                Map("x" -> s"x + ${rnd.nextInt(100)}"))
            case 2 =>
              val keys = (0 until 3).map(_ => 1L + rnd.nextInt(60))
                .distinct ++ Seq({ nextId += 1; nextId })
              Lance.upsert(spark, src,
                keys.map(k => (k, rnd.nextDouble() * 100)).toDF("id", "x"),
                Seq("id"))
            case 3 =>
              (0 until 2).map(_ => { nextId += 1; (nextId, 1.0) })
                .toDF("id", "x")
                .write.format("lance").mode("append").save(src)
            case 4 => Lance.compact(spark, src) // rewrite: feed skips it
          }
        }
      } finally spark.conf.unset("spark.graft.dml.changeFeed")
      Replica.sync(spark, rep)
      val s = spark.read.format("lance").load(src)
      val r = spark.read.format("lance").load(rep)
      assert(r.exceptAll(s).isEmpty && s.exceptAll(r).isEmpty,
        s"round $round: replica diverged " +
          s"(src=${s.count()}, rep=${r.count()})")
    }
  }

  test("retention vacuum pins the replica's feed window; drop releases it") {
    val src = tmpDir(); val rep = tmpDir() + "/r"
    (1L to 30L).map(i => (i, i * 1.0)).toDF("id", "x")
      .write.format("lance").mode("overwrite").save(src)
    Replica.create(spark, rep, src, Seq("id"))
    // source moves on; the replica does NOT sync (its own schedule)
    (0 until 3).foreach { i =>
      (100L + i * 10 to 109L + i * 10).map(j => (j, j * 1.0)).toDF("id", "x")
        .write.format("lance").mode("append").save(src)
    }
    Lance.setRetention(spark, src, keepVersions = 1)
    Lance.optimize(spark, src, minRows = 5)
    // the pin kept every version back to the replica's watermark:
    // the next sync still works incrementally
    val r = Replica.sync(spark, rep)
    assert(r.rowsInserted == 30L, r.toString)
    assert(spark.read.format("lance").load(rep).count() == 60L)
    // after the sync advanced the watermark, the next optimize CAN
    // vacuum history; and dropping the replica releases the pin
    assert(Replica.drop(spark, rep))
    (200L to 205L).map(j => (j, 1.0)).toDF("id", "x")
      .write.format("lance").mode("append").save(src)
    Lance.optimize(spark, src, minRows = 5)
    assert(Lance.versions(spark, src).size == 1,
      "no dependents left: the policy vacuums to keep=1")
  }

  test("a vacuumed feed window fails loud; compaction syncs as a no-op") {
    val src = tmpDir(); val rep = tmpDir() + "/r"
    (1L to 30L).map(i => (i, i * 1.0)).toDF("id", "x")
      .repartition(4).write.format("lance").mode("overwrite").save(src)
    Replica.create(spark, rep, src, Seq("id"))
    // row-preserving compaction: changefeed skips it, sync applies nothing
    Lance.compact(spark, src)
    val r = Replica.sync(spark, rep)
    assert(r.rowsChanged == 0L && r.rowsInserted == 0L)
    assertSame(spark.read.format("lance").load(rep),
      spark.read.format("lance").load(src), "compaction must be a no-op")
    // now make changes and vacuum the window away
    (31L to 40L).map(i => (i, i * 1.0)).toDF("id", "x")
      .write.format("lance").mode("append").save(src)
    Lance.vacuum(spark, src, keepVersions = 1)
    val e = intercept[IllegalStateException](Replica.sync(spark, rep))
    assert(e.getMessage.contains("feed window lost"))
  }
}
