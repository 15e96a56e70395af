package graft

import graft.format.LanceFormat
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** UNIQUE constraints. Contracts pinned here:
  *  - declaring validates ALL existing rows (duplicates refuse it)
  *  - every commit proves its batch: no internal repeats, no collision
  *    with the table it lands beside; violations leave no new version
  *    and no orphan files
  *  - NULL keys are exempt (SQL UNIQUE)
  *  - racing same-key appends resolve first-committer-wins via the
  *    post-commit conflict check (compensating rollback)
  *  - row-level UPDATE cannot move a key onto an existing one; replaced
  *    fragments' keys may legitimately reappear
  *  - branch appends enforce the fork-time rule against the branch
  *    lineage; rebase re-proves against MAIN's current fragments
  *  - SQL surface: CALL add_unique; drop_constraint re-opens
  */
class UniqueConstraintSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "unique-")
      .toAbsolutePath.toString

  private def dataFiles(dir: String): Set[String] = {
    val dp = LanceFormat.dataPath(new Path(dir))
    val fs = dp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dp)) Set.empty
    else fs.listStatus(dp).map(_.getPath.getName).toSet
  }

  test("declare validates existing rows; commits enforce both shapes") {
    val dir = tmpDir()
    Seq((1L, "a"), (1L, "dup"), (2L, "b")).toDF("id", "s")
      .write.format("lance").mode("overwrite").save(dir)
    val bad = intercept[IllegalArgumentException](
      Lance.addUniqueConstraint(spark, dir, "id"))
    assert(bad.getMessage.contains("existing rows repeat"), bad.getMessage)
    // clean table: declaration commits (Option keys => nullable id
    // column, so the NULL-exemption leg below is exercised)
    Seq((Option(1L), "a"), (Option(2L), "b")).toDF("id", "s")
      .write.format("lance").mode("overwrite").save(dir)
    Lance.addUniqueConstraint(spark, dir, "id")
    assert(Lance.constraints(spark, dir) == Map("unique_id" -> "__unique__:id"))
    intercept[IllegalArgumentException](Lance.addUniqueConstraint(spark, dir, "id"))
    // unknown column / CHECK-route misuse fail loud
    intercept[IllegalArgumentException](Lance.addUniqueConstraint(spark, dir, "nope"))
    intercept[IllegalArgumentException](
      Lance.addConstraint(spark, dir, "sneaky", "__unique__:id"))
    // disjoint keys pass
    Seq((3L, "c")).toDF("id", "s").write.format("lance").mode("append").save(dir)
    // collision with the table: refused, no version, no orphans
    val vBefore = Lance.versions(spark, dir).size
    val filesBefore = dataFiles(dir)
    val e1 = intercept[Exception] {
      Seq((2L, "again")).toDF("id", "s").write.format("lance").mode("append").save(dir)
    }
    assert(e1.getMessage.contains("unique_id") ||
      Option(e1.getCause).exists(_.getMessage.contains("unique_id")), e1.getMessage)
    // internal repeat: refused
    val e2 = intercept[Exception] {
      Seq((9L, "x"), (9L, "y")).toDF("id", "s")
        .write.format("lance").mode("append").save(dir)
    }
    assert(e2.getMessage.contains("INSIDE") ||
      Option(e2.getCause).exists(_.getMessage.contains("INSIDE")), e2.getMessage)
    assert(Lance.versions(spark, dir).size == vBefore, "refused batch committed")
    assert(dataFiles(dir) == filesBefore, "refused batch left orphans")
    // NULL keys are exempt: several nulls append fine
    Seq((Option.empty[Long], "n1"), (Option.empty[Long], "n2"))
      .toDF("id", "s").write.format("lance").mode("append").save(dir)
    assert(spark.read.format("lance").load(dir).filter(col("id").isNull).count() == 2)
    // drop re-opens the gate
    assert(Lance.dropConstraint(spark, dir, "unique_id"))
    Seq((2L, "again")).toDF("id", "s").write.format("lance").mode("append").save(dir)
    assert(spark.read.format("lance").load(dir).filter(col("id") === 2L).count() == 2)
  }

  test("composite keys: full-tuple equality, null-component exemption, race") {
    val dir = tmpDir()
    Seq((1L, 1, "a"), (1L, 2, "b"), (2L, 1, "c")).toDF("src", "doc", "s")
      .write.format("lance").mode("overwrite").save(dir)
    Lance.addUniqueConstraint(spark, dir, Seq("src", "doc"))
    assert(Lance.constraints(spark, dir) ==
      Map("unique_src_doc" -> "__unique__:src,doc"))
    // violation 1: a tuple the table holds — refused, no version, no orphans
    val vBefore = Lance.versions(spark, dir).size
    val filesBefore = dataFiles(dir)
    val e1 = intercept[Exception] {
      Seq((1L, 2, "x")).toDF("src", "doc", "s")
        .write.format("lance").mode("append").save(dir)
    }
    assert(e1.getMessage.contains("unique_src_doc") ||
      Option(e1.getCause).exists(_.getMessage.contains("unique_src_doc")))
    assert(Lance.versions(spark, dir).size == vBefore)
    assert(dataFiles(dir) == filesBefore)
    // violation 2: a fresh tuple repeated inside one batch
    intercept[Exception] {
      Seq((9L, 9, "x"), (9L, 9, "y")).toDF("src", "doc", "s")
        .write.format("lance").mode("append").save(dir)
    }
    // sharing ONE component is legal (the composite point)
    Seq((1L, 3, "ok"), (3L, 1, "ok2")).toDF("src", "doc", "s")
      .write.format("lance").mode("append").save(dir)
    // a key with a NULL component is exempt, even where doc=1 exists
    Seq((Option.empty[Long], 1, "n")).toDF("src", "doc", "s")
      .write.format("lance").mode("append").save(dir)
    assert(spark.read.format("lance").load(dir).count() == 6)
    // declaring over existing composite duplicates is refused
    val dir2 = tmpDir()
    Seq((1L, 1, "a"), (1L, 1, "b")).toDF("src", "doc", "s")
      .write.format("lance").mode("overwrite").save(dir2)
    val bad = intercept[IllegalArgumentException](
      Lance.addUniqueConstraint(spark, dir2, Seq("src", "doc")))
    assert(bad.getMessage.contains("existing rows repeat"), bad.getMessage)
    // duplicate column in the key is refused
    intercept[IllegalArgumentException](
      Lance.addUniqueConstraint(spark, dir2, Seq("src", "src")))
    // racing same-TUPLE appends: first committer wins, second rolls back
    val root = new Path(dir)
    val f = LanceFormat.fileSystem(root, spark.sessionState.newHadoopConf())
    val base = LanceFormat.readLatest(f, root).get
    Seq((7L, 7, "A")).toDF("src", "doc", "s")
      .write.format("lance").mode("append").save(dir)
    Seq((7L, 7, "B")).toDF("src", "doc", "s")
      .write.format("lance").mode("overwrite").save(s"$dir-stage")
    val stagedRoot = new Path(s"$dir-stage")
    val staged = LanceFormat.readLatest(
      LanceFormat.fileSystem(stagedRoot, spark.sessionState.newHadoopConf()),
      stagedRoot).get.fragments
    staged.foreach { fr =>
      f.rename(new Path(LanceFormat.dataPath(stagedRoot), fr.file),
        new Path(LanceFormat.dataPath(root), fr.file))
    }
    val committed = LanceFormat.commitAppend(f, root, base.schema, staged)
    val ex = intercept[IllegalArgumentException] {
      graft.connector.LanceWrite.verifyConstraintsPostCommit(
        root, f, base.schema, staged,
        enforced = base.checkConstraints, committed = committed,
        baseFragments = base.fragments)
    }
    assert(ex.getMessage.contains("rolled back"), ex.getMessage)
    val seven = spark.read.format("lance").load(dir)
      .filter(col("src") === 7L && col("doc") === 7)
    assert(seven.count() == 1 &&
      seven.select("s").collect().head.getString(0) == "A")
  }

  test("streaming epochs enforce UNIQUE: a colliding micro-batch fails the stream") {
    val dir = tmpDir()
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.format("lance").mode("overwrite").save(dir)
    Lance.addUniqueConstraint(spark, dir, "id")
    val base = tmpDir()
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark)
    val q = in.toDF().toDF("id", "s").writeStream.format("lance")
      .option("checkpointLocation", s"$base/ckpt").outputMode("append").start(dir)
    try {
      // clean epoch lands
      in.addData((3L, "c")); q.processAllAvailable()
      assert(spark.read.format("lance").load(dir).count() == 3)
      // colliding epoch fails the STREAM (correctness beats liveness),
      // and the refused batch leaves no version behind
      val vBefore = Lance.versions(spark, dir).size
      in.addData((2L, "dup"))
      val e = intercept[Exception] { q.processAllAvailable() }
      def chain(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(x => Option(x.getMessage).getOrElse("")).toSeq
      assert(chain(e).exists(_.contains("unique_id")), chain(e).mkString(" | "))
      assert(Lance.versions(spark, dir).size == vBefore)
      assert(spark.read.format("lance").load(dir).count() == 3)
    } finally q.stop()
  }

  test("racing same-key appends: first committer wins, second rolls back") {
    val dir = tmpDir()
    Seq((1L, "a")).toDF("id", "s").write.format("lance").mode("overwrite").save(dir)
    Lance.addUniqueConstraint(spark, dir, "id")
    val root = new Path(dir)
    val fs = LanceFormat.fileSystem(root, spark.sessionState.newHadoopConf())
    val base = LanceFormat.readLatest(fs, root).get
    // writer A lands key 5 normally
    Seq((5L, "A")).toDF("id", "s").write.format("lance").mode("append").save(dir)
    // writer B staged key 5 against the PRE-A base (the race), then lands
    Seq((5L, "B")).toDF("id", "s").write.format("lance").mode("overwrite").save(s"$dir-stage")
    val stagedRoot = new Path(s"$dir-stage")
    val staged = LanceFormat.readLatest(
      LanceFormat.fileSystem(stagedRoot, spark.sessionState.newHadoopConf()),
      stagedRoot).get.fragments
    staged.foreach { f =>
      fs.rename(new Path(LanceFormat.dataPath(stagedRoot), f.file),
        new Path(LanceFormat.dataPath(root), f.file))
    }
    val committed = LanceFormat.commitAppend(fs, root, base.schema, staged)
    val ex = intercept[IllegalArgumentException] {
      graft.connector.LanceWrite.verifyConstraintsPostCommit(
        root, fs, base.schema, staged,
        enforced = base.checkConstraints, committed = committed,
        baseFragments = base.fragments)
    }
    assert(ex.getMessage.contains("rolled back"), ex.getMessage)
    // exactly ONE row with key 5 survives — writer A's
    val five = spark.read.format("lance").load(dir).filter(col("id") === 5L)
    assert(five.count() == 1)
    assert(five.select("s").collect().head.getString(0) == "A")
  }

  test("UPDATE cannot move a key onto an existing one; replaces re-admit keys") {
    val dir = tmpDir()
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v")
      .write.format("lance").mode("overwrite").save(dir)
    Lance.addUniqueConstraint(spark, dir, "id")
    // a key-preserving update passes (its fragment leaves the table, so
    // re-writing the same keys is not a collision)
    val r = Lance.updateWhere(spark, dir, "id = 3", Map("v" -> "v + 1"))
    assert(r.rowsChanged == 1)
    // moving id 3 onto id 1 collides with a KEPT fragment: refused
    val e = intercept[Exception](
      Lance.updateWhere(spark, dir, "id = 3", Map("id" -> "1")))
    assert(e.getMessage.contains("unique_id") ||
      Option(e.getCause).exists(_.getMessage.contains("unique_id")), e.getMessage)
    val ids = spark.read.format("lance").load(dir)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("branch appends enforce the fork-time rule; rebase re-proves vs main") {
    val dir = tmpDir()
    Seq((1L, "a")).toDF("id", "s").write.format("lance").mode("overwrite").save(dir)
    Lance.addUniqueConstraint(spark, dir, "id")
    Lance.createBranch(spark, dir, "exp")
    // branch append colliding with the branch lineage: refused
    val e = intercept[Exception] {
      Seq((1L, "dup")).toDF("id", "s")
        .write.format("lance").option("write.branch", "exp").mode("append").save(dir)
    }
    assert(e.getMessage.contains("unique_id") ||
      Option(e.getCause).exists(_.getMessage.contains("unique_id")), e.getMessage)
    // branch adds key 7; main ALSO adds key 7 after the fork — the
    // rebase must catch the cross-lineage collision against main's
    // CURRENT state
    Seq((7L, "branch")).toDF("id", "s")
      .write.format("lance").option("write.branch", "exp").mode("append").save(dir)
    Seq((7L, "main")).toDF("id", "s")
      .write.format("lance").mode("append").save(dir)
    val re = intercept[IllegalArgumentException](Lance.rebaseBranch(spark, dir, "exp"))
    assert(re.getMessage.contains("unique_id"), re.getMessage)
    // with a disjoint branch key instead, the rebase lands
    Lance.deleteBranch(spark, dir, "exp")
    Lance.createBranch(spark, dir, "exp2")
    Seq((8L, "branch")).toDF("id", "s")
      .write.format("lance").option("write.branch", "exp2").mode("append").save(dir)
    Seq((9L, "main")).toDF("id", "s")
      .write.format("lance").mode("append").save(dir)
    Lance.rebaseBranch(spark, dir, "exp2")
    assert(spark.read.format("lance").load(dir)
      .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 7L, 8L, 9L))
  }

  test("CALL add_unique through the catalog; DROP COLUMN guard names the rule") {
    val wh = tmpDir()
    val s = spark
    s.conf.set("spark.sql.catalog.lance_uq", "graft.catalog.LanceCatalog")
    s.conf.set("spark.sql.catalog.lance_uq.warehouse", wh)
    try {
      s.sql("CREATE NAMESPACE lance_uq.db")
      s.sql("CREATE TABLE lance_uq.db.t (id BIGINT, v DOUBLE)")
      s.sql("INSERT INTO lance_uq.db.t VALUES (1, 1.0), (2, 2.0)")
      val r = s.sql("CALL lance_uq.add_unique('db.t', 'id')").collect().head
      assert(r.getLong(0) > 0)
      val e = intercept[Exception](
        s.sql("INSERT INTO lance_uq.db.t VALUES (2, 9.9)"))
      assert(e.getMessage.contains("unique_id") ||
        Option(e.getCause).exists(_.getMessage.contains("unique_id")), e.getMessage)
      // dropping the guarded column is refused with the rule named
      val d = intercept[Exception](s.sql("ALTER TABLE lance_uq.db.t DROP COLUMN id"))
      assert(d.getMessage.contains("unique_id"), d.getMessage)
    } finally {
      s.sql("DROP TABLE IF EXISTS lance_uq.db.t")
      s.conf.unset("spark.sql.catalog.lance_uq")
      s.conf.unset("spark.sql.catalog.lance_uq.warehouse")
    }
  }
}
