package graft

import graft.format.LanceFormat
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Zero-copy shallow clone ([[Lance.cloneTable]], Delta's SHALLOW CLONE
  * shape). Contracts pinned here:
  *  - a clone is ONE manifest write: zero files under the clone's data/,
  *    fragment refs are fully-qualified external URIs, reads match the
  *    source version exactly (including time travel to an older version)
  *  - the clone lives its own life: appends land local, the source never
  *    changes; DML copy-on-write replaces borrowed fragments with local
  *    rewrites, the source file survives untouched
  *  - deletion safety: the clone's vacuum never deletes a borrowed file;
  *    compact materializes everything local after which the clone stands
  *    alone
  *  - declarations (constraints, clustering, column mapping) carry
  */
class CloneSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "clone-")
      .toAbsolutePath.toString

  private def fs(dir: String) =
    LanceFormat.fileSystem(new Path(dir), spark.sessionState.newHadoopConf())

  private def manifest(dir: String) =
    LanceFormat.readLatest(fs(dir), new Path(dir)).get

  private def dataFiles(dir: String): Seq[String] = {
    val d = LanceFormat.dataPath(new Path(dir))
    val f = fs(dir)
    if (f.exists(d)) f.listStatus(d).toSeq.map(_.getPath.getName) else Seq.empty
  }

  test("clone is one manifest write; reads match; source untouched by appends") {
    val base = tmpDir()
    val src = s"$base/src"; val dst = s"$base/dst"
    spark.range(0, 100).select(col("id"), (col("id") % 7).as("v"))
      .repartition(3).write.format("lance").mode("overwrite").save(src)
    val srcFilesBefore = dataFiles(src).toSet

    val v = Lance.cloneTable(spark, src, dst)
    assert(v == 1L)
    assert(dataFiles(dst).isEmpty, "clone must copy zero data files")
    val m = manifest(dst)
    assert(m.fragments.nonEmpty &&
      m.fragments.forall(f => LanceFormat.isExternalRef(f.file)), m.fragments)

    val srcRows = spark.read.format("lance").load(src).collect().toSet
    val dstRows = spark.read.format("lance").load(dst).collect().toSet
    assert(dstRows == srcRows)

    // clone diverges: append lands LOCAL, source rows unchanged
    Seq((1000L, 1L)).toDF("id", "v")
      .write.format("lance").mode("append").save(dst)
    assert(dataFiles(dst).size == 1)
    assert(spark.read.format("lance").load(dst).count() == 101)
    assert(spark.read.format("lance").load(src).count() == 100)
    assert(dataFiles(src).toSet == srcFilesBefore)
  }

  test("clone of an older version time-travels; newer source commits invisible") {
    val base = tmpDir()
    val src = s"$base/src"; val dst = s"$base/dst"
    spark.range(0, 10).toDF("id").write.format("lance").mode("overwrite").save(src)
    spark.range(10, 20).toDF("id").write.format("lance").mode("append").save(src)
    Lance.cloneTable(spark, src, dst, version = Some(1L))
    assert(spark.read.format("lance").load(dst).count() == 10)
  }

  test("DML on the clone rewrites locally; the borrowed source file survives") {
    val base = tmpDir()
    val src = s"$base/src"; val dst = s"$base/dst"
    spark.range(0, 100).select(col("id"), (col("id") % 7).as("v"))
      .repartition(2).write.format("lance").mode("overwrite").save(src)
    Lance.cloneTable(spark, src, dst)
    Lance.deleteWhere(spark, dst, "id = 3")
    assert(spark.read.format("lance").load(dst).count() == 99)
    assert(spark.read.format("lance").load(src).count() == 100)
    // the touched fragment was rewritten LOCAL; untouched ones stay borrowed
    val afters = manifest(dst).fragments.map(_.file)
    assert(afters.exists(f => !LanceFormat.isExternalRef(f)), afters)
  }

  test("vacuum on the clone never deletes borrowed files; compact materializes") {
    val base = tmpDir()
    val src = s"$base/src"; val dst = s"$base/dst"
    spark.range(0, 50).toDF("id").repartition(2)
      .write.format("lance").mode("overwrite").save(src)
    Lance.cloneTable(spark, src, dst)
    // an overwrite drops every borrowed ref from the latest version...
    spark.range(100, 110).toDF("id")
      .write.format("lance").mode("overwrite").save(dst)
    // ...and vacuum of the old version must leave the SOURCE's files alone
    Lance.vacuum(spark, dst, keepVersions = 1)
    assert(spark.read.format("lance").load(src).count() == 50,
      "vacuum on the clone deleted borrowed source files")

    // fresh clone: compact rewrites everything local — the clone stands alone
    val dst2 = s"$base/dst2"
    Lance.cloneTable(spark, src, dst2)
    Lance.compact(spark, dst2)
    val m2 = manifest(dst2)
    assert(m2.fragments.nonEmpty &&
      m2.fragments.forall(f => !LanceFormat.isExternalRef(f.file)), m2.fragments)
    assert(spark.read.format("lance").load(dst2).count() == 50)
  }

  test("streaming read over a clone: borrowed snapshot, then local appends") {
    val base = tmpDir()
    val src = s"$base/src"; val dst = s"$base/dst"
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.format("lance").mode("overwrite").save(src)
    Lance.cloneTable(spark, src, dst)
    val q = spark.readStream.format("lance").load(dst)
      .writeStream.format("memory").queryName("clone_stream")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("clone_stream").count() == 2) // borrowed fragments stream
      Seq((3L, "c")).toDF("id", "s").write.format("lance").mode("append").save(dst)
      q.processAllAvailable()
      assert(spark.table("clone_stream").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet ==
        Set((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()
  }

  test("declarations carry: constraints, clustering, mapping; take() works") {
    val base = tmpDir()
    val src = s"$base/src"; val dst = s"$base/dst"
    spark.range(0, 60).select(col("id"), (col("id") * 3 % 60).as("v"))
      .write.format("lance").mode("overwrite").save(src)
    Lance.cluster(spark, src, Seq("v"), maxRowsPerFile = 20)
    Lance.renameColumn(spark, src, "v", "val")
    Lance.addConstraint(spark, src, "v_bounds", "`val` >= 0")
    Lance.cloneTable(spark, src, dst)
    val m = manifest(dst)
    assert(m.checkConstraints.contains("v_bounds"))
    assert(m.clusterBy.contains(Seq("val")))
    assert(m.mapping.get("val").contains("v"))
    // constraint enforced on the clone's own commits
    intercept[Exception] {
      Seq((999L, -5L)).toDF("id", "val")
        .write.format("lance").mode("append").save(dst)
    }
    // positional row access through external refs
    val taken = Lance.take(spark, dst, Seq(0L, 59L))
    assert(taken.count() == 2)
    // SQL CALL surface
    spark.conf.set("spark.sql.catalog.lance_cs", "graft.catalog.LanceCatalog")
    spark.conf.set("spark.sql.catalog.lance_cs.warehouse", s"$base/wh")
    try {
      spark.sql("CREATE NAMESPACE lance_cs.db")
      spark.range(0, 5).toDF("id").write.format("lance")
        .mode("overwrite").save(s"$base/wh/db/t")
      val out = spark.sql(
        "CALL lance_cs.clone_table('db.t', 'db.t2')").collect()
      assert(out.head.getLong(0) == 1L)
      assert(spark.sql("SELECT count(*) FROM lance_cs.db.t2")
        .head().getLong(0) == 5L)
      intercept[Exception](
        spark.sql("CALL lance_cs.clone_table('db.t', 'db.t2')").collect())
    } finally {
      spark.conf.unset("spark.sql.catalog.lance_cs")
      spark.conf.unset("spark.sql.catalog.lance_cs.warehouse")
    }
  }
}
