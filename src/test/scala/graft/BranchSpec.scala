package graft

import graft.format.LanceFormat
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Append-only branch lineages. Contracts pinned here:
  *  - create(O(1 manifest)) / list / delete lifecycle, error cases
  *  - branch reads see base + branch appends; main never does
  *  - versionAsOf addresses versions WITHIN the branch
  *  - overwrite / replace / streaming on a branch are refused loudly
  *  - GC (vacuum + removeOrphans) treats branch manifests as roots;
  *    deleteBranch + GC reclaims
  *  - fastForward adopts the head only when main has not moved
  *  - SQL surface: lance_branches TVF, CALL create_branch/fast_forward
  */
class BranchSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "branch-")
      .toAbsolutePath.toString

  private def fsRoot(dir: String) = {
    val root = new Path(dir)
    (LanceFormat.fileSystem(root, spark.sessionState.newHadoopConf()), root)
  }

  private def seed(dir: String): Unit = {
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.format("lance").mode("overwrite").save(dir)
  }

  test("branch lifecycle: isolated appends, per-branch time travel") {
    val dir = tmpDir()
    seed(dir)
    assert(Lance.createBranch(spark, dir, "exp") == 1L)
    // duplicate / bad names / bad versions fail loud
    intercept[IllegalArgumentException](Lance.createBranch(spark, dir, "exp"))
    intercept[IllegalArgumentException](Lance.createBranch(spark, dir, "no/slash"))
    intercept[IllegalArgumentException](Lance.createBranch(spark, dir, "b2", Some(99L)))
    // append to the branch: branch grows, main does not
    Seq((3L, "c"), (4L, "d")).toDF("id", "s")
      .write.format("lance").option("write.branch", "exp").mode("append").save(dir)
    val onBranch = spark.read.format("lance").option("branch", "exp").load(dir)
    assert(onBranch.count() == 4)
    assert(spark.read.format("lance").load(dir).count() == 2, "main untouched")
    // versionAsOf WITHIN the branch: v1 = base
    assert(spark.read.format("lance")
      .option("branch", "exp").option("versionAsOf", "1").load(dir).count() == 2)
    assert(Lance.branches(spark, dir) == Seq(("exp", 1L, 2L)))
    // unknown branch read fails loud
    val e = intercept[Exception] {
      spark.read.format("lance").option("branch", "nope").load(dir).count()
    }
    assert(e.getMessage.contains("no branch 'nope'"), e.getMessage)
    // path-traversal shapes are refused at the NAME level on both the
    // read and write surfaces — '../_versions' must never resolve to main
    val trav = intercept[Exception] {
      spark.read.format("lance").option("branch", "../_versions").load(dir).count()
    }
    assert(trav.getMessage.contains("invalid branch name"), trav.getMessage)
    val travW = intercept[Exception] {
      Seq((8L, "t")).toDF("id", "s")
        .write.format("lance").option("write.branch", "../_versions")
        .mode("append").save(dir)
    }
    assert(travW.getMessage.contains("invalid branch name") ||
      Option(travW.getCause).exists(_.getMessage.contains("invalid branch name")),
      travW.getMessage)
    assert(Lance.deleteBranch(spark, dir, "exp"))
    assert(Lance.branches(spark, dir).isEmpty)
  }

  test("branches are append-only: overwrite and streaming refused") {
    val dir = tmpDir()
    seed(dir)
    Lance.createBranch(spark, dir, "exp")
    val e = intercept[Exception] {
      Seq((9L, "z")).toDF("id", "s")
        .write.format("lance").option("write.branch", "exp")
        .mode("overwrite").save(dir)
    }
    assert(e.getMessage.contains("append-only"), e.getMessage)
    // appending to a DELETED branch fails instead of resurrecting it
    Lance.deleteBranch(spark, dir, "exp")
    val e2 = intercept[Exception] {
      Seq((9L, "z")).toDF("id", "s")
        .write.format("lance").option("write.branch", "exp")
        .mode("append").save(dir)
    }
    assert(e2.getMessage.contains("no branch 'exp'"), e2.getMessage)
  }

  test("GC treats branch manifests as roots; deleteBranch + GC reclaims") {
    val dir = tmpDir()
    seed(dir)
    Lance.createBranch(spark, dir, "exp")
    Seq((3L, "c")).toDF("id", "s")
      .write.format("lance").option("write.branch", "exp").mode("append").save(dir)
    // advance main past the fork, then vacuum to keep only main's latest
    Seq((5L, "e")).toDF("id", "s").write.format("lance").mode("append").save(dir)
    Lance.vacuum(spark, dir, keepVersions = 1)
    // the branch must still read fully: its manifests reference the base
    // fragments (shared with dropped main v1) AND its own append
    val onBranch = spark.read.format("lance").option("branch", "exp").load(dir)
    assert(onBranch.count() == 3)
    assert(onBranch.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    // removeOrphans(0 grace) must not touch branch-only files either
    val (_, removed) = Lance.removeOrphans(spark, dir, graceMinutes = 0)
    assert(removed == 0, s"GC deleted $removed files referenced by the branch")
    assert(spark.read.format("lance").option("branch", "exp").load(dir).count() == 3)
    // drop the branch: its unshared file is now a true orphan
    Lance.deleteBranch(spark, dir, "exp")
    val (_, removed2) = Lance.removeOrphans(spark, dir, graceMinutes = 0)
    assert(removed2 >= 1, "branch-only data must be reclaimable after deleteBranch")
    assert(spark.read.format("lance").load(dir).count() == 3) // main: 1,2,5
  }

  test("fastForward adopts the head only when main has not moved") {
    val dir = tmpDir()
    seed(dir)
    Lance.createBranch(spark, dir, "exp")
    Seq((3L, "c")).toDF("id", "s")
      .write.format("lance").option("write.branch", "exp").mode("append").save(dir)
    val (head, newV) = Lance.fastForward(spark, dir, "exp")
    assert(head == 2L && newV == 2L)
    val main = spark.read.format("lance").load(dir)
    assert(main.count() == 3)
    assert(main.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    val (fs, root) = fsRoot(dir)
    assert(LanceFormat.readLatest(fs, root).get.operation.contains("fast-forward"))
    // divergence: main moves past a new branch's base -> refuse
    Lance.createBranch(spark, dir, "exp2")
    Seq((7L, "g")).toDF("id", "s")
      .write.format("lance").option("write.branch", "exp2").mode("append").save(dir)
    Seq((8L, "h")).toDF("id", "s").write.format("lance").mode("append").save(dir)
    val e = intercept[IllegalArgumentException](Lance.fastForward(spark, dir, "exp2"))
    assert(e.getMessage.contains("divergent"), e.getMessage)
    // a commit-less branch fast-forwards as a no-op
    Lance.createBranch(spark, dir, "idle")
    val before = Lance.versions(spark, dir).size
    Lance.fastForward(spark, dir, "idle")
    assert(Lance.versions(spark, dir).size == before)
  }

  test("rebaseBranch lands append-only branch work on a diverged main") {
    val dir = tmpDir()
    seed(dir) // main v1: ids 1,2
    Lance.createBranch(spark, dir, "exp")
    Seq((3L, "c")).toDF("id", "s")
      .write.format("lance").option("write.branch", "exp").mode("append").save(dir)
    Seq((5L, "e")).toDF("id", "s")
      .write.format("lance").mode("append").save(dir) // main v2: diverged
    // fast-forward refuses forever once main moved — the gap rebase closes
    val ff = intercept[IllegalArgumentException](Lance.fastForward(spark, dir, "exp"))
    assert(ff.getMessage.contains("divergent"), ff.getMessage)
    val (head, newV) = Lance.rebaseBranch(spark, dir, "exp")
    assert(head == 2L && newV == 3L)
    val main = spark.read.format("lance").load(dir)
    assert(main.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 5L))
    val (fs, root) = fsRoot(dir)
    assert(LanceFormat.readLatest(fs, root).get.operation.contains("rebase"))
    // idempotent: a re-run finds nothing new to adopt and commits nothing
    val before = Lance.versions(spark, dir).size
    val (_, again) = Lance.rebaseBranch(spark, dir, "exp")
    assert(again == newV && Lance.versions(spark, dir).size == before)
    // the adopted rows flow through the batch changefeed as INSERTS
    graft.MetaTvfs.register(spark)
    val changes = spark.sql(
      s"SELECT _change_type, id FROM lance_changes('$dir', 2, 3)").collect()
    assert(changes.map(_.getString(0)).toSet == Set("insert"))
    assert(changes.map(_.getLong(1)).toSet == Set(3L))
  }

  test("rebase refuses non-append branch history, loudly") {
    val dir = tmpDir()
    seed(dir)
    Lance.createBranch(spark, dir, "bad")
    Seq((3L, "c")).toDF("id", "s")
      .write.format("lance").option("write.branch", "bad").mode("append").save(dir)
    // forge a non-append commit into the branch lineage (the write path
    // refuses them, but rebase must not TRUST that — a pre-guard branch
    // or an out-of-band writer could have landed one)
    val (fs, root) = fsRoot(dir)
    val bp = LanceFormat.branchPath(root, "bad")
    val head = LanceFormat.readManifestIn(fs, bp, 2L)
    implicit val fmts: org.json4s.Formats =
      org.json4s.jackson.Serialization.formats(org.json4s.NoTypeHints)
    val out = fs.create(new Path(bp, "3.manifest.json"), true)
    out.write(org.json4s.jackson.Serialization.write(
      head.copy(version = 3L, operation = Some("replace")))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    Seq((9L, "z")).toDF("id", "s")
      .write.format("lance").mode("append").save(dir) // diverge main
    val e = intercept[IllegalArgumentException](Lance.rebaseBranch(spark, dir, "bad"))
    assert(e.getMessage.contains("not an append"), e.getMessage)
  }

  test("rebase re-proves MAIN's current constraints over branch-only rows") {
    val dir = tmpDir()
    seed(dir) // ids 1,2
    Lance.createBranch(spark, dir, "exp")
    Seq((-5L, "neg")).toDF("id", "s")
      .write.format("lance").option("write.branch", "exp").mode("append").save(dir)
    // the rule lands on main AFTER the fork: existing main rows pass, the
    // branch's fork-time rule set never saw it
    Lance.addConstraint(spark, dir, "id_pos", "id > 0")
    val vBefore = Lance.versions(spark, dir).size
    val e = intercept[IllegalArgumentException](Lance.rebaseBranch(spark, dir, "exp"))
    assert(e.getMessage.contains("id_pos"), e.getMessage)
    assert(Lance.versions(spark, dir).size == vBefore, "refused rebase committed")
  }

  test("cherry-pick adopts ONE branch commit; idempotent; branch untouched") {
    val dir = tmpDir()
    seed(dir) // ids 1,2
    Lance.createBranch(spark, dir, "exp")
    // three branch appends: v2 (3), v3 (4), v4 (5)
    Seq(3L, 4L, 5L).foreach { i =>
      Seq((i, s"v$i")).toDF("id", "s")
        .write.format("lance").option("write.branch", "exp").mode("append").save(dir)
    }
    Seq((9L, "z")).toDF("id", "s")
      .write.format("lance").mode("append").save(dir) // diverge main
    // pick the MIDDLE commit only
    val (n, newV) = Lance.cherryPick(spark, dir, "exp", 3L)
    assert(n == 1, s"adopted $n fragments")
    val main = spark.read.format("lance").load(dir)
    assert(main.select("id").as[Long].collect().toSet == Set(1L, 2L, 9L, 4L))
    val (fs, root) = fsRoot(dir)
    assert(LanceFormat.readLatest(fs, root).get.operation.contains("cherry-pick"))
    // the branch is untouched (still holds all three commits)
    assert(spark.read.format("lance").option("branch", "exp").load(dir)
      .count() == 5L)
    // re-pick is a no-op, not a double-publish
    val (n2, v2) = Lance.cherryPick(spark, dir, "exp", 3L)
    assert(n2 == 0 && v2 == newV)
    // the fork point itself refuses
    val e = intercept[IllegalArgumentException](
      Lance.cherryPick(spark, dir, "exp", 1L))
    assert(e.getMessage.contains("fork point"), e.getMessage)
    // changefeed readers see the adoption as plain inserts
    graft.MetaTvfs.register(spark)
    val feed = spark.sql(
      s"SELECT * FROM lance_changes('$dir', ${newV - 1}, $newV)")
    assert(feed.select("_change_type").distinct().as[String]
      .collect().toSeq == Seq("insert"))
  }

  test("cherry-pick refuses non-append commits and re-proves constraints") {
    val dir = tmpDir()
    seed(dir)
    Lance.createBranch(spark, dir, "exp")
    Seq((-5L, "neg")).toDF("id", "s")
      .write.format("lance").option("write.branch", "exp").mode("append").save(dir)
    // a CHECK added on main AFTER the fork must hold over picked rows
    Lance.addConstraint(spark, dir, "id_pos", "id > 0")
    val e = intercept[IllegalArgumentException](
      Lance.cherryPick(spark, dir, "exp", 2L))
    assert(e.getMessage.contains("id_pos"), e.getMessage)
    // forge a non-append commit (replace) into the lineage: refused
    val (fs, root) = fsRoot(dir)
    val bp = LanceFormat.branchPath(root, "exp")
    val head = LanceFormat.readManifestIn(fs, bp, 2L)
    implicit val fmts: org.json4s.Formats =
      org.json4s.jackson.Serialization.formats(org.json4s.NoTypeHints)
    val out = fs.create(new Path(bp, "3.manifest.json"), true)
    out.write(org.json4s.jackson.Serialization.write(
      head.copy(version = 3L, operation = Some("replace")))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    val e2 = intercept[IllegalArgumentException](
      Lance.cherryPick(spark, dir, "exp", 3L))
    assert(e2.getMessage.contains("not an append"), e2.getMessage)
    // SQL surface
    val wh = tmpDir()
    spark.conf.set("spark.sql.catalog.cp", "graft.catalog.LanceCatalog")
    spark.conf.set("spark.sql.catalog.cp.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE cp.db")
      val t = s"$wh/db/t"
      seed(t)
      Lance.createBranch(spark, t, "b")
      Seq((7L, "g")).toDF("id", "s")
        .write.format("lance").option("write.branch", "b").mode("append").save(t)
      val row = spark.sql("CALL cp.system.cherry_pick('db.t', 'b', 2)")
        .collect()(0)
      assert(row.getAs[Int]("fragments_adopted") == 1)
      assert(spark.read.format("lance").load(t).count() == 3L)
    } finally {
      spark.conf.unset("spark.sql.catalog.cp")
      spark.conf.unset("spark.sql.catalog.cp.warehouse")
    }
  }

  test("cherry-pick imports only columns the PICKED fragments hold") {
    val dir = tmpDir()
    seed(dir) // schema (id, s)
    Lance.createBranch(spark, dir, "exp")
    // v2: schema-evolving append introduces an experimental column
    Seq((3L, "c", 9.9)).toDF("id", "s", "debug_flag")
      .write.format("lance").option("write.branch", "exp")
      .option("write.merge-schema", "true").mode("append").save(dir)
    // v3: an append whose FILES hold only (id, s) — merge-schema keeps
    // the branch's evolved table schema, the files stay narrow
    Seq((4L, "d")).toDF("id", "s")
      .write.format("lance").option("write.branch", "exp")
      .option("write.merge-schema", "true").mode("append").save(dir)
    val (n, _) = Lance.cherryPick(spark, dir, "exp", 3L)
    assert(n == 1)
    // the picked commit's manifest schema is CUMULATIVE over the branch
    // history; main must gain only what v3's files physically hold
    val cols = spark.read.format("lance").load(dir).columns.toSet
    assert(cols == Set("id", "s"),
      s"cherry-pick imported unpicked-commit columns: $cols")
    // picking v2 itself DOES bring the column (its files hold the data)
    Lance.cherryPick(spark, dir, "exp", 2L)
    val cols2 = spark.read.format("lance").load(dir).columns.toSet
    assert(cols2 == Set("id", "s", "debug_flag"))
  }

  test("rebase refuses resurrecting a column dropped on main after the fork") {
    val dir = tmpDir()
    seed(dir) // schema (id, s)
    Lance.createBranch(spark, dir, "exp")
    Seq((3L, "c")).toDF("id", "s")
      .write.format("lance").option("write.branch", "exp").mode("append").save(dir)
    // main drops column s after the fork (metadata-only, name recorded)
    val (fs, root) = fsRoot(dir)
    val cur = LanceFormat.readLatest(fs, root).get
    LanceFormat.commitAlter(fs, root,
      org.apache.spark.sql.types.StructType(cur.schema.fields.filter(_.name == "id")),
      droppedColumns = Seq("s"))
    val e = intercept[IllegalArgumentException](Lance.rebaseBranch(spark, dir, "exp"))
    assert(e.getMessage.contains("resurrect"), e.getMessage)
  }

  test("VERSION AS OF 'branch:...' equals the option(branch) read") {
    val wh = tmpDir()
    val s = spark
    s.conf.set("spark.sql.catalog.lance_bsq", "graft.catalog.LanceCatalog")
    s.conf.set("spark.sql.catalog.lance_bsq.warehouse", wh)
    try {
      s.sql("CREATE NAMESPACE lance_bsq.db")
      s.sql("CREATE TABLE lance_bsq.db.t (id BIGINT, v DOUBLE)")
      s.sql("INSERT INTO lance_bsq.db.t VALUES (1, 1.0), (2, 2.0)")
      val path = s"$wh/db/t"
      Lance.createBranch(s, path, "exp")
      Seq((3L, 3.0)).toDF("id", "v")
        .write.format("lance").option("write.branch", "exp").mode("append").save(path)
      // the SQL surface reaches the SAME lineage as the Scala option
      val sqlRows = s.sql(
        "SELECT id, v FROM lance_bsq.db.t VERSION AS OF 'branch:exp' ORDER BY id")
        .collect().toSeq
      val optRows = s.read.format("lance").option("branch", "exp").load(path)
        .select("id", "v").orderBy("id").collect().toSeq
      assert(sqlRows == optRows && sqlRows.size == 3)
      // main is untouched through SQL
      assert(s.sql("SELECT COUNT(*) FROM lance_bsq.db.t")
        .collect().head.getLong(0) == 2)
      // a bare branch name is NOT guessed: loud hint toward 'branch:'
      val bare = intercept[Exception](
        s.sql("SELECT * FROM lance_bsq.db.t VERSION AS OF 'exp'").collect())
      assert(bare.getMessage.contains("branch:exp"), bare.getMessage)
      // unknown branch fails loud
      val nope = intercept[Exception](
        s.sql("SELECT * FROM lance_bsq.db.t VERSION AS OF 'branch:nope'").collect())
      assert(nope.getMessage.contains("no branch 'nope'"), nope.getMessage)
      // a tag with VERSION AS OF still resolves (tags and branches
      // coexist): v1 = empty CREATE, v2 = the INSERT
      Lance.tag(s, path, "pin1", Some(2L))
      assert(s.sql("SELECT COUNT(*) FROM lance_bsq.db.t VERSION AS OF 'pin1'")
        .collect().head.getLong(0) == 2)
    } finally {
      s.sql("DROP TABLE IF EXISTS lance_bsq.db.t")
      s.conf.unset("spark.sql.catalog.lance_bsq")
      s.conf.unset("spark.sql.catalog.lance_bsq.warehouse")
    }
  }

  test("lance_branches TVF and CALL create_branch/fast_forward") {
    val wh = tmpDir()
    val s = spark
    s.conf.set("spark.sql.catalog.lance_br", "graft.catalog.LanceCatalog")
    s.conf.set("spark.sql.catalog.lance_br.warehouse", wh)
    try {
      s.sql("CREATE NAMESPACE lance_br.db")
      s.sql("CREATE TABLE lance_br.db.t (id BIGINT, v DOUBLE)")
      s.sql("INSERT INTO lance_br.db.t VALUES (1, 1.0), (2, 2.0)")
      val base = s.sql("CALL lance_br.create_branch('db.t', 'exp')").collect().head
      val path = s"$wh/db/t"
      Seq((3L, 3.0)).toDF("id", "v")
        .write.format("lance").option("write.branch", "exp").mode("append").save(path)
      graft.MetaTvfs.register(s)
      val rows = s.sql(s"SELECT * FROM lance_branches('$path')").collect()
      assert(rows.length == 1)
      assert(rows.head.getString(0) == "exp")
      assert(rows.head.getLong(1) == base.getLong(0))
      assert(rows.head.getLong(3) == 3L) // head row count
      val ff = s.sql("CALL lance_br.fast_forward('db.t', 'exp')").collect().head
      assert(ff.getLong(1) > base.getLong(0))
      assert(s.sql("SELECT COUNT(*) FROM lance_br.db.t").collect().head.getLong(0) == 3)
      assert(s.sql("CALL lance_br.drop_branch('db.t', 'exp')")
        .collect().head.getBoolean(0))
    } finally {
      s.sql("DROP TABLE IF EXISTS lance_br.db.t")
      s.conf.unset("spark.sql.catalog.lance_br")
      s.conf.unset("spark.sql.catalog.lance_br.warehouse")
    }
  }

  test("rebase clears adopted bucket tags when main re-declared its layout") {
    import org.apache.spark.sql.functions.col
    val dir = tmpDir()
    spark.range(0, 400).select(col("id").as("k"), col("id").as("v"))
      .write.format("lance").mode("overwrite").save(dir)
    Lance.clusterByBucket(spark, dir, Seq("k"), numBuckets = 4)
    Lance.createBranch(spark, dir, "work")
    // branch append: fragments tagged under the fork-time n=4 spec
    spark.range(400, 500).select(col("id").as("k"), col("id").as("v"))
      .write.format("lance").option("write.branch", "work").mode("append").save(dir)
    val (fs, root) = fsRoot(dir)
    val branchHead = LanceFormat.readLatestIn(fs,
      LanceFormat.branchPath(root, "work")).get
    assert(branchHead.fragments.exists(f =>
      f.bucket.isDefined && !LanceFormat.readManifest(fs, root, 2).fragments
        .map(_.file).contains(f.file)), "branch append should be tagged")
    // main re-declares to n=8 AFTER the fork (clears + re-tags main)
    Lance.clusterByBucket(spark, dir, Seq("k"), numBuckets = 8)
    val (_, newV) = Lance.rebaseBranch(spark, dir, "work")
    val main = LanceFormat.readLatest(fs, root).get
    assert(main.version == newV && main.bucketBy.get.numBuckets == 8)
    val mainV = LanceFormat.readManifest(fs, root,
      main.version - 1).fragments.map(_.file).toSet
    val adopted = main.fragments.filterNot(f => mainV.contains(f.file))
    assert(adopted.nonEmpty)
    assert(adopted.forall(f => f.bucket.isEmpty && f.sorted.isEmpty),
      "fork-time n=4 tags must not read through main's n=8 spec")
    // rows all present; a key filter stays correct (tags conservative)
    assert(spark.read.format("lance").load(dir).count() == 500)
    assert(spark.read.format("lance").load(dir)
      .filter(col("k") === 450L).count() == 1)
  }
}
