package graft

import graft.format.LanceFormat
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Round-15 optimization internals, pinned:
  *  - applyChanges `guard`: a violated source invariant fails with the
  *    caller's message BEFORE any commit — on both the small-batch
  *    (merged per-key collect) and the >inlistPrune fallback path;
  *  - applyChanges/upsert stats on the fallback path (>inlistPrune keys)
  *    still enforce dup/null-key refusal and commit correct content;
  *  - ScalarIndex small-input single-aggregate postings ==
  *    large-input two-pass postings, byte-content-wise;
  *  - FtsIndex refresh one-pass doc stats still count ZERO-TOKEN docs
  *    (they have no postings line — stats must not derive from postings);
  *  - IvfIndex refresh per-bucket counts sum over MANY part files per
  *    bucket (the parallel footer read).
  */
class R15OptimizationSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), prefix)
      .toAbsolutePath.toString

  private def version(dir: String): Long = {
    val root = new Path(dir)
    val fs = LanceFormat.fileSystem(root, spark.sessionState.newHadoopConf())
    LanceFormat.readLatest(fs, root).get.version
  }

  private def withConf[T](key: String, value: String)(f: => T): T = {
    val old = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try f finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  // ------------------------------------------------------ applyChanges guard

  private def guardTable(dir: String): Unit =
    (1L to 20L).map(i => (i, i * 1.0)).toDF("id", "x")
      .write.format("lance").mode("overwrite").save(dir)

  test("applyChanges guard refuses with the caller's message, no commit") {
    val dir = tmpDir("r15guard-")
    guardTable(dir)
    val v0 = version(dir)
    val batch = Seq((5L, -1.0, false), (21L, 21.0, false)).toDF("id", "x", "_d")
    val e = intercept[IllegalArgumentException] {
      operators.Dml.applyChanges(spark, dir, batch, Seq("id"), col("_d"),
        guard = Some((col("x") < 0, "negative x sneaked into the batch")))
    }
    assert(e.getMessage.contains("negative x sneaked into the batch"))
    assert(version(dir) == v0, "a refused guard must commit nothing")
    // the same batch without a violation applies normally
    val ok = Seq((5L, 5.5, false), (21L, 21.0, false)).toDF("id", "x", "_d")
    val r = operators.Dml.applyChanges(spark, dir, ok, Seq("id"), col("_d"),
      guard = Some((col("x") < 0, "unreachable")))
    assert(r.rowsChanged == 1L && r.rowsInserted == 1L)
    assert(version(dir) == v0 + 1)
  }

  test("applyChanges guard + dup/null refusal hold on the fallback path") {
    val dir = tmpDir("r15fall-")
    guardTable(dir)
    val v0 = version(dir)
    withConf("spark.graft.dml.inlistPrune", "3") {
      // > 3 distinct keys forces the two-level fallback aggregate
      val bad = (1L to 10L).map(i => (i, -i * 1.0, false)).toDF("id", "x", "_d")
      val e = intercept[IllegalArgumentException] {
        operators.Dml.applyChanges(spark, dir, bad, Seq("id"), col("_d"),
          guard = Some((col("x") < 0, "negative x on the fallback path")))
      }
      assert(e.getMessage.contains("negative x on the fallback path"))
      assert(version(dir) == v0)
      val dup = ((1L to 10L).map(i => (i, i * 1.0, false)) :+ ((5L, 5.0, false)))
        .toDF("id", "x", "_d")
      val e2 = intercept[IllegalArgumentException] {
        operators.Dml.applyChanges(spark, dir, dup, Seq("id"), col("_d"))
      }
      assert(e2.getMessage.contains("duplicate keys"))
      val nulls = ((1L to 10L).map(i => (Option(i), i * 1.0, false)) :+
        ((None: Option[Long]), 0.0, false))
        .toDF("id", "x", "_d")
      val e3 = intercept[IllegalArgumentException] {
        operators.Dml.applyChanges(spark, dir, nulls, Seq("id"), col("_d"))
      }
      assert(e3.getMessage.contains("NULL in a key column"))
      // a clean >cap batch still applies with exact content
      val okBatch = (1L to 10L).map(i => (i, i + 0.5, i % 2 == 0))
        .toDF("id", "x", "_d")
      val r = operators.Dml.applyChanges(spark, dir, okBatch, Seq("id"), col("_d"))
      assert(r.rowsChanged == 10L && r.rowsInserted == 0L)
      val live = spark.read.format("lance").load(dir)
      assert(live.count() == 15L) // 20 - 5 deleted evens(2,4,6,8,10)
      assert(live.filter(col("id") === 3L).select("x").as[Double].head() == 3.5)
    }
  }

  test("upsert fallback path (>inlistPrune keys) still merges exactly") {
    val dir = tmpDir("r15ups-")
    guardTable(dir)
    withConf("spark.graft.dml.inlistPrune", "3") {
      val src = (15L to 25L).map(i => (i, i * 100.0)).toDF("id", "x")
      val r = Lance.upsert(spark, dir, src, Seq("id"))
      assert(r.rowsChanged == 6L && r.rowsInserted == 5L)
      val live = spark.read.format("lance").load(dir)
      assert(live.count() == 25L)
      assert(live.filter(col("id") === 20L).select("x").as[Double].head() == 2000.0)
    }
  }

  // --------------------------------------------- ScalarIndex path equivalence

  test("scalar postings: single-aggregate path == two-pass path, content-wise") {
    val small = tmpDir("r15sx-small-")
    val large = tmpDir("r15sx-large-")
    val df = (1L to 400L).map(i => (i, s"k${i % 37}")).toDF("id", "tag")
      .repartition(4)
    df.write.format("lance").mode("overwrite").save(small)
    df.write.format("lance").mode("overwrite").save(large)
    // default threshold -> small single-aggregate path
    Lance.buildScalarIndex(spark, small, "tag", numBuckets = 8)
    // force the scale-safe two-pass path on the identical corpus
    val metaL = withConf("spark.graft.scalarindex.smallBuildRows", "0") {
      Lance.buildScalarIndex(spark, large, "tag", numBuckets = 8)
    }
    val metaS = index.ScalarIndex.loadMeta(spark, small, "tag")
    // fragment UUIDs differ across the two tables: canonicalize each
    // posting's file list to manifest-order fragment indexes
    def lines(dir: String, meta: index.ScalarIndex.ScalarMeta) = {
      val root = new Path(dir)
      val fs = LanceFormat.fileSystem(root, spark.sessionState.newHadoopConf())
      val byName = LanceFormat.readLatest(fs, root).get.fragments
        .map(f => f.file.substring(f.file.lastIndexOf('/') + 1))
        .zipWithIndex.toMap
      val pd = s"${index.ScalarIndex.indexPath(dir, "tag")}/${meta.postingsDir.get}"
      val raw = spark.read.json(pd).select(col("v"), col("f"))
        .as[(String, Seq[String])].collect().toMap
      assert(raw.values.forall(fs => fs == fs.sorted),
        s"file lists must stay NAME-sorted at $pd")
      raw.map { case (v, files) => v -> files.map(byName).sorted }
    }
    val (ls, ll) = (lines(small, metaS), lines(large, metaL))
    assert(ls == ll, "postings content must be identical across both shapes")
  }

  // --------------------------------------------------- FTS zero-token doc stats

  test("fts refresh one-pass stats still count zero-token docs") {
    val dir = tmpDir("r15fts-")
    Seq((1L, "alpha beta"), (2L, "beta gamma delta"))
      .toDF("doc_id", "body")
      .write.format("lance").mode("overwrite").save(dir)
    index.FtsIndex.build(spark,
      spark.read.format("lance").load(dir), "body", "doc_id", dir,
      numTermPartitions = 4, tokenizer = "unicode")
    // delta: one normal doc, one punctuation-only doc — ZERO tokens
    // under the unicode tokenizer, so it has no postings line at all
    Seq((3L, "alpha"), (4L, "..!!.."))
      .toDF("doc_id", "body")
      .write.format("lance").mode("append").save(dir)
    val meta = index.FtsIndex.refresh(spark, dir, "body")
    assert(meta.numDocs == 4L, "the zero-token doc must count into numDocs")
    assert(meta.sumDl == 2L + 3L + 1L + 0L)
  }

  // ------------------------------------------------ IVF many-file bucket counts

  test("ivf refresh sums bucket counts across many part files per bucket") {
    val dir = tmpDir("r15ivf-")
    def vec(i: Long): Array[Float] =
      Array((i % 2).toFloat * 10f, (i % 3).toFloat)
    (1L to 60L).map(i => (i, vec(i))).toDF("id", "emb")
      .write.format("lance").mode("overwrite").save(dir)
    val res = index.IvfIndex.build(spark,
      spark.read.format("lance").load(dir), "emb", "id", dir,
      numPartitions = 2)
    assert(res.success, res.error.getOrElse(""))
    val before = index.IvfIndex.loadMeta(spark, dir, "emb")
    // the delta arrives as SEVERAL fragments -> several part files land
    // in the same bucket dirs; the footer counts must sum them all
    (61L to 120L).map(i => (i, vec(i))).toDF("id", "emb")
      .repartition(5)
      .write.format("lance").mode("append").save(dir)
    val added = index.IvfIndex.refresh(spark, dir, "emb")
    assert(added == 60L)
    val after = index.IvfIndex.loadMeta(spark, dir, "emb")
    val sum = (m: Option[Map[String, Long]]) => m.map(_.values.sum).getOrElse(0L)
    assert(sum(after.bucketRows) == sum(before.bucketRows) + 60L,
      s"bucketRows must grow by the delta: ${before.bucketRows} -> ${after.bucketRows}")
  }
}
