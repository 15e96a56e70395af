package graft

import graft.format.LanceFormat
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** `Lance.fsck` / `CALL fsck` — read-only metadata integrity check.
  * Contracts pinned:
  *  - a healthy table (data + indexes + stats + layout) reports NOTHING
  *  - a fragment deleted or truncated out of band is an error
  *  - stale index = fine; an index AHEAD of the table = error
  *  - stats over a renamed column = warning
  *  - fsck never throws (an unreadable table IS a finding)
  */
class FsckSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "fsck-")
      .toAbsolutePath.toString

  private def fs(dir: String) =
    LanceFormat.fileSystem(new Path(dir), spark.sessionState.newHadoopConf())

  test("healthy table: zero findings across data, layout, indexes, stats") {
    val dir = tmpDir()
    spark.range(0, 2000).select(col("id").as("k"), col("id").as("v"))
      .write.format("lance").mode("overwrite").save(dir)
    Lance.clusterByBucket(spark, dir, Seq("k"), numBuckets = 4)
    Lance.buildScalarIndex(spark, dir, "v", numBuckets = 4)
    Lance.analyze(spark, dir, columns = Seq("k"))
    val found = Lance.fsck(spark, dir)
    assert(found.isEmpty, found.mkString("; "))
  }

  test("dangling dependent registrations surface as warnings") {
    import graft.operators.MaterializedView
    import graft.operators.MaterializedView.{AggSpec, JoinSpec}
    val a = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    (1L to 50L).map(i => (i, s"g${i % 3}")).toDF("k", "g")
      .write.format("lance").mode("overwrite").save(a)
    (1L to 50L).map(i => (i, i * 1.0)).toDF("j", "x")
      .write.format("lance").mode("overwrite").save(b)
    MaterializedView.create(spark, view, a, Seq("g"),
      Seq(AggSpec("sum", "x", "sx")),
      joins = Seq(JoinSpec(b, Map("k" -> "j"))))
    // a LIVE registration is healthy on both sides
    assert(Lance.fsck(spark, a).isEmpty, Lance.fsck(spark, a).mkString(";"))
    assert(Lance.fsck(spark, b).isEmpty, Lance.fsck(spark, b).mkString(";"))
    // delete the view OUT OF BAND (no drop): both registrations dangle
    val vr = new Path(new java.io.File(view).getAbsolutePath)
    LanceFormat.fileSystem(vr, spark.sessionState.newHadoopConf())
      .delete(vr, true)
    Seq(a, b).foreach { t =>
      val found = Lance.fsck(spark, t)
      assert(found.exists(i => i.severity == "warn" &&
        i.what.contains("does not exist")), s"$t: $found")
    }
    // the next maintenance pass self-heals; fsck goes quiet again
    MaterializedView.refreshDependents(spark, a)
    MaterializedView.refreshDependents(spark, b)
    assert(Lance.fsck(spark, a).isEmpty)
    assert(Lance.fsck(spark, b).isEmpty)
  }

  test("out-of-band file surgery and version skew are found, not thrown") {
    val dir = tmpDir()
    spark.range(0, 1000).select(col("id").as("k"))
      .repartition(3).write.format("lance").mode("overwrite").save(dir)
    val m = LanceFormat.readLatest(fs(dir), new Path(dir)).get

    // delete one fragment out of band
    val victim = m.fragments.head
    fs(dir).delete(LanceFormat.fragmentPath(new Path(dir), victim.file), false)
    // truncate another (recorded size mismatch)
    val trunc = m.fragments(1)
    val tp = LanceFormat.fragmentPath(new Path(dir), trunc.file)
    val out = fs(dir).create(tp, true)
    out.write(Array[Byte](1, 2, 3)); out.close()

    val found = Lance.fsck(spark, dir)
    assert(found.exists(i => i.severity == "error" &&
      i.what.contains(victim.file) && i.what.contains("missing")))
    assert(found.exists(i => i.severity == "error" &&
      i.what.contains(trunc.file) && i.what.contains("bytes")))
  }

  test("index ahead of the table is an error; stale is not; SQL CALL surface") {
    val wh = tmpDir()
    spark.conf.set("spark.sql.catalog.lance_fsck", "graft.catalog.LanceCatalog")
    spark.conf.set("spark.sql.catalog.lance_fsck.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE lance_fsck.db")
      val p = s"$wh/db/t"
      spark.range(0, 500).select(col("id").as("k"), col("id").as("v"))
        .coalesce(1).write.format("lance").mode("overwrite").save(p)
      Lance.buildScalarIndex(spark, p, "k", numBuckets = 2)
      // stale (appends since the index): NOT a finding
      spark.range(500, 600).select(col("id").as("k"), col("id").as("v"))
        .coalesce(1).write.format("lance").mode("append").save(p)
      assert(Lance.fsck(spark, p).isEmpty)
      // refresh the index to v2, then MANUALLY delete the v2 manifest
      // (the incident-surgery shape fsck exists for): the index now
      // claims a version AHEAD of the surviving head
      graft.index.ScalarIndex.refresh(spark, p, "k")
      val head = LanceFormat.readLatest(fs(p), new Path(p)).get.version
      fs(p).delete(new Path(s"$p/_versions/$head.manifest.json"), false)
      val found = Lance.fsck(spark, p)
      assert(found.exists(i => i.severity == "error" &&
        i.what.contains("claims dataset")), s"expected ahead finding: $found")
      val row = spark.sql("CALL lance_fsck.system.fsck('db.t')").collect()(0)
      assert(row.getAs[Int]("errors") >= 1)
      assert(row.getAs[String]("issues").contains("claims dataset"))
    } finally {
      spark.conf.unset("spark.sql.catalog.lance_fsck")
      spark.conf.unset("spark.sql.catalog.lance_fsck.warehouse")
    }
  }
}
