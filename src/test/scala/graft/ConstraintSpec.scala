package graft

import graft.format.LanceFormat
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** CHECK constraints (Delta parity). Contracts pinned here:
  *  - add validates ALL existing rows first; a violating add fails loud
  *  - every data commit validates its batch BEFORE the manifest lands; a
  *    violating batch leaves no new version and no orphan data files
  *  - NULL passes (SQL CHECK semantics)
  *  - constraints survive append/overwrite; drop re-opens the gate
  *  - streamed epochs are enforced too (violation fails the stream)
  *  - SQL surface: CALL add_constraint / drop_constraint
  */
class ConstraintSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "constraint-")
      .toAbsolutePath.toString

  private def dataFiles(dir: String): Set[String] = {
    val dp = LanceFormat.dataPath(new Path(dir))
    val fs = dp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dp)) Set.empty
    else fs.listStatus(dp).map(_.getPath.getName).toSet
  }

  test("add validates existing rows; commits enforce; abort leaves no trace") {
    val dir = tmpDir()
    // Option values => nullable v in the stored schema (the NULL-passes
    // leg below appends a null; an inferred non-nullable schema would
    // simply WIDEN with that batch — see the widening spec below)
    Seq((1L, Some(10.0)), (2L, Some(20.0))).toDF("id", "v")
      .write.format("lance").mode("overwrite").save(dir)
    // a constraint existing data violates is refused
    val bad = intercept[IllegalArgumentException] {
      Lance.addConstraint(spark, dir, "v_big", "v > 15.0")
    }
    assert(bad.getMessage.contains("existing rows violate"), bad.getMessage)
    // a valid one commits (new version, metadata only)
    Lance.addConstraint(spark, dir, "v_pos", "v > 0.0")
    assert(Lance.constraints(spark, dir) == Map("v_pos" -> "v > 0.0"))
    intercept[IllegalArgumentException] {
      Lance.addConstraint(spark, dir, "v_pos", "v > 1.0") // duplicate name
    }
    // a good append passes and the constraint survives it
    Seq((3L, 30.0)).toDF("id", "v").write.format("lance").mode("append").save(dir)
    assert(Lance.constraints(spark, dir).contains("v_pos"))
    // a violating append fails BEFORE any manifest lands...
    val vBefore = Lance.versions(spark, dir).size
    val filesBefore = dataFiles(dir)
    val e = intercept[Exception] {
      Seq((4L, -1.0)).toDF("id", "v").write.format("lance").mode("append").save(dir)
    }
    assert(e.getMessage.contains("v_pos") ||
      Option(e.getCause).exists(_.getMessage.contains("v_pos")), e.getMessage)
    // ...leaving no new version AND no orphan data files (abort cleaned up)
    assert(Lance.versions(spark, dir).size == vBefore)
    assert(dataFiles(dir) == filesBefore, "violating batch must leave no files")
    assert(spark.read.format("lance").load(dir).count() == 3)
    // NULL passes (SQL CHECK semantics)
    Seq((5L, Option.empty[Double])).toDF("id", "v")
      .write.format("lance").mode("append").save(dir)
    assert(spark.read.format("lance").load(dir).count() == 4)
    // constraints survive overwrite (table rules, not data rules)
    Seq((9L, 1.0)).toDF("id", "v").write.format("lance").mode("overwrite").save(dir)
    assert(Lance.constraints(spark, dir).contains("v_pos"))
    intercept[Exception] {
      Seq((10L, -2.0)).toDF("id", "v").write.format("lance").mode("append").save(dir)
    }
    // drop re-opens the gate
    assert(Lance.dropConstraint(spark, dir, "v_pos"))
    assert(!Lance.dropConstraint(spark, dir, "v_pos"))
    Seq((10L, -2.0)).toDF("id", "v").write.format("lance").mode("append").save(dir)
    assert(spark.read.format("lance").load(dir).count() == 2)
  }

  test("NOT NULL: rule + schema flip in one commit; drop restores both") {
    val dir = tmpDir()
    Seq((1L, Some(10.0)), (2L, Some(20.0))).toDF("id", "v")
      .write.format("lance").mode("overwrite").save(dir)
    assert(spark.read.format("lance").load(dir).schema("v").nullable)
    Lance.setNotNull(spark, dir, "v")
    // both halves landed in ONE version
    assert(Lance.constraints(spark, dir) == Map("not_null_v" -> "`v` IS NOT NULL"))
    assert(!spark.read.format("lance").load(dir).schema("v").nullable)
    // duplicate declaration fails loud
    intercept[IllegalArgumentException](Lance.setNotNull(spark, dir, "v"))
    // a good append passes; a null batch is refused with no new version
    Seq((3L, Some(30.0))).toDF("id", "v").write.format("lance").mode("append").save(dir)
    val vBefore = Lance.versions(spark, dir).size
    val filesBefore = dataFiles(dir)
    val e = intercept[Exception] {
      Seq((4L, None: Option[Double])).toDF("id", "v")
        .write.format("lance").mode("append").save(dir)
    }
    assert(e.getMessage.contains("not_null_v") ||
      Option(e.getCause).exists(_.getMessage.contains("not_null_v")), e.getMessage)
    assert(Lance.versions(spark, dir).size == vBefore, "refused batch committed")
    assert(dataFiles(dir) == filesBefore, "refused batch left orphan files")
    // drop restores nullability AND removes the rule; nulls append again
    assert(Lance.dropNotNull(spark, dir, "v"))
    assert(!Lance.dropNotNull(spark, dir, "v")) // second drop: not found
    assert(spark.read.format("lance").load(dir).schema("v").nullable)
    Seq((5L, None: Option[Double])).toDF("id", "v")
      .write.format("lance").mode("append").save(dir)
    assert(spark.read.format("lance").load(dir).filter(col("v").isNull).count() == 1)
    // declaring over existing nulls is refused
    val bad = intercept[IllegalArgumentException](Lance.setNotNull(spark, dir, "v"))
    assert(bad.getMessage.contains("existing rows are null"), bad.getMessage)
    // unknown column fails loud
    intercept[IllegalArgumentException](Lance.setNotNull(spark, dir, "nope"))
  }

  test("inference-only non-nullable columns WIDEN on null arrival; declared ones refuse") {
    val dir = tmpDir()
    // toDF of primitives: `id` is non-nullable by INFERENCE — no user
    // ever declared it, so arriving NULLs must not be refused (upsert's
    // null-key contract depends on this: MERGE null keys always insert)
    Seq((1L, "a")).toDF("id", "s").write.format("lance").mode("overwrite").save(dir)
    assert(!spark.read.format("lance").load(dir).schema("id").nullable)
    Seq((Option.empty[Long], "n")).toDF("id", "s")
      .write.format("lance").mode("append").save(dir)
    val back = spark.read.format("lance").load(dir)
    assert(back.schema("id").nullable,
      "the stored schema must widen in the same commit as the null batch")
    assert(back.count() == 2 && back.filter(col("id").isNull).count() == 1,
      "the widened data must read back as real nulls")
    // stats-free fragments (write.stats=false) take the probe fallback
    val dir2 = tmpDir()
    Seq((1L, "a")).toDF("id", "s").write.format("lance").mode("overwrite").save(dir2)
    Seq((Option.empty[Long], "n")).toDF("id", "s").write.format("lance")
      .option("write.stats", "false").mode("append").save(dir2)
    assert(spark.read.format("lance").load(dir2).schema("id").nullable)
    // a DECLARED column refuses instead — declaration beats inference —
    // and its non-nullable flag survives the refused batch
    val dir3 = tmpDir()
    Seq((1L, "a")).toDF("id", "s").write.format("lance").mode("overwrite").save(dir3)
    Lance.setNotNull(spark, dir3, "id")
    val e = intercept[Exception] {
      Seq((Option.empty[Long], "x")).toDF("id", "s")
        .write.format("lance").mode("append").save(dir3)
    }
    assert(e.getMessage.contains("not_null_id") ||
      Option(e.getCause).exists(_.getMessage.contains("not_null_id")), e.getMessage)
    assert(!spark.read.format("lance").load(dir3).schema("id").nullable)
    // the declaration's rule namespace cannot be forged through CHECK
    intercept[IllegalArgumentException](
      Lance.addConstraint(spark, dir3, "not_null_s", "s IS NOT NULL"))
  }

  test("a stale append cannot silently revert a declared NOT NULL's schema flip") {
    // the lost-update shape: a writer derives its schema BEFORE a
    // concurrent setNotNull lands, then commits. The retry loop re-reads
    // prev for constraints — the committed schema must re-assert declared
    // nullability from that same fresh read, or rule and schema disagree.
    val dir = tmpDir()
    Seq((1L, Some(1.0))).toDF("id", "v").write.format("lance").mode("overwrite").save(dir)
    Lance.setNotNull(spark, dir, "v")
    val root = new Path(dir)
    val fs = LanceFormat.fileSystem(root, spark.sessionState.newHadoopConf())
    val staleSchema = org.apache.spark.sql.types.StructType(
      LanceFormat.readLatest(fs, root).get.schema.fields.map(_.copy(nullable = true)))
    val m = LanceFormat.commitAppend(fs, root, staleSchema, Seq.empty)
    assert(!m.schema("v").nullable,
      "declared non-nullability must survive a stale-schema append")
    assert(m.checkConstraints.contains("not_null_v"))
    // overwrite carries the declaration too: rule proved the new batch,
    // so the flag stays true of the data
    Seq((2L, 2.0)).toDF("id", "v").write.format("lance").mode("overwrite").save(dir)
    val after = LanceFormat.readLatest(fs, root).get
    assert(!after.schema("v").nullable && after.checkConstraints.contains("not_null_v"))
  }

  test("a rule added concurrently with a commit is re-proven post-commit") {
    // the writer side of the addConstraint TOCTOU: simulate the exact
    // interleaving — the writer enforced an EMPTY rule set, but the
    // manifest its batch landed in carries a rule the batch violates.
    // verifyConstraintsPostCommit must compensate the batch away and
    // fail loud.
    val dir = tmpDir()
    Seq((1L, 10.0)).toDF("id", "v").write.format("lance").mode("overwrite").save(dir)
    val root = new Path(dir)
    val fs = LanceFormat.fileSystem(root, spark.sessionState.newHadoopConf())
    // the "concurrently added" rule (existing row passes)
    Lance.addConstraint(spark, dir, "v_pos", "v > 0.0")
    // the racing writer's batch: stage a violating fragment and commit it
    // with the OLD (empty) enforced set, exactly what a writer that read
    // its constraints before the rule commit would do
    Seq((2L, -5.0)).toDF("id", "v").write.format("lance").mode("append").save(s"$dir-stage")
    val stagedRoot = new Path(s"$dir-stage")
    val staged = LanceFormat.readLatest(
      LanceFormat.fileSystem(stagedRoot, spark.sessionState.newHadoopConf()),
      stagedRoot).get.fragments
    // move the staged file into the target's data dir (same writer layout)
    staged.foreach { f =>
      fs.rename(new Path(LanceFormat.dataPath(stagedRoot), f.file),
        new Path(LanceFormat.dataPath(root), f.file))
    }
    val schema = LanceFormat.readLatest(fs, root).get.schema
    val committed = LanceFormat.commitAppend(fs, root, schema, staged)
    assert(committed.checkConstraints.contains("v_pos")) // carried the rule
    val ex = intercept[IllegalArgumentException] {
      graft.connector.LanceWrite.verifyConstraintsPostCommit(
        root, fs, schema, staged, enforced = Map.empty, committed = committed)
    }
    assert(ex.getMessage.contains("rolled back"), ex.getMessage)
    // the compensating replace removed exactly the violating batch
    val latest = LanceFormat.readLatest(fs, root).get
    assert(latest.operation.contains("replace"))
    assert(spark.read.format("lance").load(dir).count() == 1)
    assert(spark.read.format("lance").load(dir)
      .filter(col("v") < 0).count() == 0)
  }

  test("concurrent add/drop constraint: both edits survive (no lost update)") {
    val dir = tmpDir()
    Seq((1L, 5.0)).toDF("id", "v").write.format("lance").mode("overwrite").save(dir)
    Lance.addConstraint(spark, dir, "a", "v > 0.0")
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // one session drops 'a' while another adds 'b' — the mutate-per-retry
    // commit discipline must land BOTH edits regardless of interleaving
    val t1 = new Thread(() => {
      barrier.await()
      try Lance.dropConstraint(spark, dir, "a")
      catch { case e: Throwable => errs.add(e) }
    })
    val t2 = new Thread(() => {
      barrier.await()
      try Lance.addConstraint(spark, dir, "b", "id > 0")
      catch { case e: Throwable => errs.add(e) }
    })
    t1.start(); t2.start(); t1.join(60000); t2.join(60000)
    assert(errs.isEmpty, s"concurrent constraint edits failed: ${errs.toArray.mkString}")
    assert(Lance.constraints(spark, dir) == Map("b" -> "id > 0"),
      "drop of 'a' AND add of 'b' must both survive the race")
  }

  test("branch appends enforce the branch's rules (carried at fork)") {
    val dir = tmpDir()
    Seq((1L, 5.0)).toDF("id", "v").write.format("lance").mode("overwrite").save(dir)
    Lance.addConstraint(spark, dir, "v_pos", "v > 0.0")
    Lance.createBranch(spark, dir, "exp")
    // good branch append passes; violating one is refused on the branch
    Seq((2L, 7.0)).toDF("id", "v")
      .write.format("lance").option("write.branch", "exp").mode("append").save(dir)
    val e = intercept[Exception] {
      Seq((3L, -1.0)).toDF("id", "v")
        .write.format("lance").option("write.branch", "exp").mode("append").save(dir)
    }
    assert(e.getMessage.contains("v_pos") ||
      Option(e.getCause).exists(_.getMessage.contains("v_pos")), e.getMessage)
    assert(spark.read.format("lance").option("branch", "exp").load(dir).count() == 2)
    // fast-forward adopts only validated rows
    Lance.fastForward(spark, dir, "exp")
    assert(spark.read.format("lance").load(dir).count() == 2)
  }

  test("streamed epochs are enforced: a violating micro-batch fails the stream") {
    val src = tmpDir()
    val dst = tmpDir()
    Seq((1L, 5.0)).toDF("id", "v").write.format("lance").mode("overwrite").save(dst)
    Lance.addConstraint(spark, dst, "v_pos", "v > 0.0")
    Seq((2L, -7.0)).toDF("id", "v").write.format("lance").mode("overwrite").save(src)
    val q = spark.readStream.format("lance").load(src)
      .writeStream.format("lance")
      .option("checkpointLocation", s"$dst-ckpt")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(dst)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(e.getMessage.contains("v_pos") ||
      Option(e.getCause).exists(c => Option(c.getMessage).exists(_.contains("v_pos"))),
      e.getMessage)
    assert(spark.read.format("lance").load(dst).count() == 1, "no partial epoch")
  }

  test("CALL add_constraint / drop_constraint") {
    val wh = tmpDir()
    val s = spark
    s.conf.set("spark.sql.catalog.lance_ck", "graft.catalog.LanceCatalog")
    s.conf.set("spark.sql.catalog.lance_ck.warehouse", wh)
    try {
      s.sql("CREATE NAMESPACE lance_ck.db")
      s.sql("CREATE TABLE lance_ck.db.t (id BIGINT, v DOUBLE)")
      s.sql("INSERT INTO lance_ck.db.t VALUES (1, 1.0)")
      val added =
        s.sql("CALL lance_ck.add_constraint('db.t', 'v_pos', 'v > 0.0')").collect().head
      assert(added.getLong(0) > 0)
      graft.MetaTvfs.register(s)
      val listed = s.sql(s"SELECT * FROM lance_constraints('$wh/db/t')").collect()
      assert(listed.map(r => (r.getString(0), r.getString(1))).toSeq ==
        Seq(("v_pos", "v > 0.0")))
      val e = intercept[Exception] {
        s.sql("INSERT INTO lance_ck.db.t VALUES (2, -1.0)")
      }
      assert(e.getMessage.contains("v_pos") ||
        Option(e.getCause).exists(_.getMessage.contains("v_pos")), e.getMessage)
      assert(s.sql("SELECT COUNT(*) FROM lance_ck.db.t").collect().head.getLong(0) == 1)
      // DROP COLUMN of a constraint-referenced column is refused (the
      // alternative is a write-bricked table failing analysis on every
      // later commit)
      val dropRef = intercept[Exception](
        s.sql("ALTER TABLE lance_ck.db.t DROP COLUMN v"))
      assert(dropRef.getMessage.contains("drop_constraint first"), dropRef.getMessage)
      assert(s.sql("CALL lance_ck.drop_constraint('db.t', 'v_pos')")
        .collect().head.getBoolean(0))
      s.sql("INSERT INTO lance_ck.db.t VALUES (2, -1.0)")
      assert(s.sql("SELECT COUNT(*) FROM lance_ck.db.t").collect().head.getLong(0) == 2)
    } finally {
      s.sql("DROP TABLE IF EXISTS lance_ck.db.t")
      s.conf.unset("spark.sql.catalog.lance_ck")
      s.conf.unset("spark.sql.catalog.lance_ck.warehouse")
    }
  }
}
