package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Write-audit-publish ([[Lance.publishBranch]]): stage risky ingest on
  * a branch, audit with named boolean checks, adopt into main only when
  * every check holds. Contracts:
  *  - audit pass + unmoved main = fast-forward; moved main = rebase
  *  - a failed audit (false OR NULL rows) refuses with per-check counts
  *    and leaves BOTH lineages byte-identical
  *  - rebase-path publish re-proves main's constraints over the adopted
  *    fragments (a post-fork UNIQUE can refuse the publish)
  *  - SQL surface: CALL publish_branch
  */
class WapSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "wap-")
      .toAbsolutePath.toString

  test("audit pass publishes: fast-forward when main unmoved, rebase when moved") {
    val dir = tmpDir()
    (1L to 50L).map(i => (i, i * 1.0)).toDF("id", "x")
      .write.format("lance").mode("overwrite").save(dir)
    Lance.createBranch(spark, dir, "audit")
    (51L to 60L).map(i => (i, i * 1.0)).toDF("id", "x")
      .write.format("lance").option("write.branch", "audit").mode("append").save(dir)
    val (head, newMain) = Lance.publishBranch(spark, dir, "audit",
      Map("positive" -> "x > 0", "id_set" -> "id IS NOT NULL"))
    assert(newMain > head || newMain > 1L)
    assert(spark.read.format("lance").load(dir).count() == 60L)
    // moved-main case: new branch, then main advances before publish
    Lance.createBranch(spark, dir, "audit2")
    (61L to 70L).map(i => (i, i * 1.0)).toDF("id", "x")
      .write.format("lance").option("write.branch", "audit2").mode("append").save(dir)
    (1000L to 1004L).map(i => (i, i * 1.0)).toDF("id", "x")
      .write.format("lance").mode("append").save(dir) // main moves
    Lance.publishBranch(spark, dir, "audit2", Map("positive" -> "x > 0"))
    assert(spark.read.format("lance").load(dir).count() == 75L,
      "rebase adoption must keep BOTH main's new rows and the branch's")
  }

  test("failed audit refuses with counts; both lineages untouched") {
    val dir = tmpDir()
    (1L to 20L).map(i => (i, i * 1.0)).toDF("id", "x")
      .write.format("lance").mode("overwrite").save(dir)
    Lance.createBranch(spark, dir, "bad")
    Seq((21L, -5.0), (22L, Double.NaN), (23L, 3.0)).toDF("id", "x")
      .write.format("lance").option("write.branch", "bad").mode("append").save(dir)
    val mainBefore = Lance.versions(spark, dir)
    val e = intercept[IllegalArgumentException](
      Lance.publishBranch(spark, dir, "bad",
        Map("positive" -> "x > 0", "finite" -> "NOT isnan(x)")))
    assert(e.getMessage.contains("positive (1 rows)") ||
      e.getMessage.contains("positive (2 rows)"), e.getMessage)
    assert(e.getMessage.contains("finite (1 rows)"), e.getMessage)
    assert(Lance.versions(spark, dir) == mainBefore, "main must not move")
    assert(spark.read.format("lance").option("branch", "bad").load(dir)
      .count() == 23L, "branch stays intact for fix-and-retry")
    assert(spark.read.format("lance").load(dir).count() == 20L)
    // NULL check result is a violation, CHECK-constraint style
    val dir2 = tmpDir()
    Seq((1L, Option(1.0)), (2L, Option.empty[Double])).toDF("id", "x")
      .write.format("lance").mode("overwrite").save(dir2)
    Lance.createBranch(spark, dir2, "b")
    val e2 = intercept[IllegalArgumentException](
      Lance.publishBranch(spark, dir2, "b", Map("pos" -> "x > 0")))
    assert(e2.getMessage.contains("pos (1 rows)"))
  }

  test("quarantine publish: main gets exactly the passing subset, the rest stages") {
    val dir = tmpDir()
    (1L to 20L).map(i => (i, i * 1.0)).toDF("id", "x")
      .write.format("lance").mode("overwrite").save(dir)
    Lance.createBranch(spark, dir, "ingest")
    // 10 clean rows, 2 bad ones (negative; NULL-check violation)
    (Seq((21L, -5.0), (22L, Double.NaN)) ++
      (23L to 32L).map(i => (i, i * 1.0))).toDF("id", "x")
      .write.format("lance").option("write.branch", "ingest").mode("append").save(dir)
    val (head, newMain) = Lance.publishBranch(spark, dir, "ingest",
      Map("positive" -> "x > 0", "finite" -> "NOT isnan(x)"),
      quarantine = true)
    assert(newMain > 0L && head > 0L)
    // main = base + exactly the 10 passing rows
    val main = spark.read.format("lance").load(dir)
    assert(main.count() == 30L, "main must gain exactly the passing subset")
    assert(main.filter(col("x") < 0 || isnan(col("x"))).isEmpty)
    assert(main.filter(col("id") >= 23L).count() == 10L)
    // the quarantine lineage holds ONLY the violations, with counts
    val q = spark.read.format("lance").option("branch", "ingest-quarantine").load(dir)
    assert(q.count() == 2L, "quarantine holds exactly the violations")
    assert(q.select("id").as[Long].collect().toSet == Set(21L, 22L))
    val qprops = {
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = graft.format.LanceFormat.fileSystem(root,
        spark.sessionState.newHadoopConf())
      graft.format.LanceFormat.readLatestIn(fs,
        graft.format.LanceFormat.branchPath(root, "ingest-quarantine"))
        .get.properties.getOrElse(Map.empty)
    }
    assert(qprops.get("graft.wap.violations.positive").contains("1"))
    assert(qprops.get("graft.wap.violations.finite").contains("1"))
    // the audited branch is gone: a re-publish cannot double-land rows
    intercept[Exception](Lance.publishBranch(spark, dir, "ingest"))
    // a half-finished quarantine publish (marker present) refuses a
    // re-run loud instead of double-landing rows on either side
    Lance.createBranch(spark, dir, "crashy")
    Seq((200L, -1.0)).toDF("id", "x")
      .write.format("lance").option("write.branch", "crashy").mode("append").save(dir)
    val root = new org.apache.hadoop.fs.Path(dir)
    val bfs = graft.format.LanceFormat.fileSystem(root,
      spark.sessionState.newHadoopConf())
    bfs.create(new org.apache.hadoop.fs.Path(
      graft.format.LanceFormat.branchPath(root, "crashy"),
      "_quarantine_publish"), false).close()
    val em = intercept[IllegalArgumentException](Lance.publishBranch(
      spark, dir, "crashy", Map("positive" -> "x > 0"), quarantine = true))
    assert(em.getMessage.contains("did not finish"), em.getMessage)
    // a CLEAN batch under quarantine publishes by reference (plain path)
    Lance.createBranch(spark, dir, "clean")
    (100L to 104L).map(i => (i, i * 1.0)).toDF("id", "x")
      .write.format("lance").option("write.branch", "clean").mode("append").save(dir)
    Lance.publishBranch(spark, dir, "clean", Map("positive" -> "x > 0"),
      quarantine = true)
    assert(spark.read.format("lance").load(dir).count() == 35L)
  }

  test("quarantine refuses when violations predate the fork (clean branch)") {
    val dir = tmpDir()
    // main already violates 'positive' BEFORE any branch exists
    (Seq((1L, -7.0)) ++ (2L to 10L).map(i => (i, i * 1.0))).toDF("id", "x")
      .write.format("lance").mode("overwrite").save(dir)
    Lance.createBranch(spark, dir, "b")
    // the branch adds only CLEAN rows
    (11L to 15L).map(i => (i, i * 1.0)).toDF("id", "x")
      .write.format("lance").option("write.branch", "b").mode("append").save(dir)
    val mainBefore = Lance.versions(spark, dir)
    // the audit sees 1 violation in the lineage, but the split could
    // stage 0 branch-only rows: publishing would mask the base defect
    // and leave quarantine counts disagreeing with its contents
    val e = intercept[IllegalArgumentException](Lance.publishBranch(
      spark, dir, "b", Map("positive" -> "x > 0"), quarantine = true))
    assert(e.getMessage.contains("predate the fork"), e.getMessage)
    assert(Lance.versions(spark, dir) == mainBefore, "main must not move")
    // the branch survives for fix-and-retry, and no quarantine lineage
    // was created
    assert(spark.read.format("lance").option("branch", "b").load(dir)
      .count() == 15L)
    val root = new org.apache.hadoop.fs.Path(dir)
    val bfs = graft.format.LanceFormat.fileSystem(root,
      spark.sessionState.newHadoopConf())
    assert(!bfs.exists(
      graft.format.LanceFormat.branchPath(root, "b-quarantine")))
  }

  test("rebase-path publish re-proves main's post-fork constraints") {
    val dir = tmpDir()
    (1L to 20L).map(i => (i, s"k$i")).toDF("id", "s")
      .write.format("lance").mode("overwrite").save(dir)
    Lance.createBranch(spark, dir, "stage")
    Seq((5L, "dup-of-main")).toDF("id", "s") // violates a UNIQUE(id) on main
      .write.format("lance").option("write.branch", "stage").mode("append").save(dir)
    Lance.addUniqueConstraint(spark, dir, "id") // post-fork, moves main
    intercept[Exception](Lance.publishBranch(spark, dir, "stage"))
    assert(spark.read.format("lance").load(dir).count() == 20L)
  }

  test("adoption is pinned to the audited head: a moved branch refuses") {
    val dir = tmpDir()
    (1L to 10L).map(i => (i, i * 1.0)).toDF("id", "x")
      .write.format("lance").mode("overwrite").save(dir)
    Lance.createBranch(spark, dir, "audit")
    (11L to 15L).map(i => (i, i * 1.0)).toDF("id", "x")
      .write.format("lance").option("write.branch", "audit").mode("append").save(dir)
    // the surface publishBranch pins through: an adoption expecting an
    // OLDER head (rows landed after the audit scan) must refuse
    val e = intercept[java.util.ConcurrentModificationException](
      Lance.fastForward(spark, dir, "audit", expectedHead = Some(1L)))
    assert(e.getMessage.contains("advanced"))
    assert(spark.read.format("lance").load(dir).count() == 10L,
      "main must not adopt unaudited rows")
    // the real head fast-forwards fine
    Lance.publishBranch(spark, dir, "audit", Map("pos" -> "x > 0"))
    assert(spark.read.format("lance").load(dir).count() == 15L)
  }

  test("SQL surface: CALL publish_branch") {
    val wh = tmpDir()
    spark.conf.set("spark.sql.catalog.lance_wap", "graft.catalog.LanceCatalog")
    spark.conf.set("spark.sql.catalog.lance_wap.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE lance_wap.db")
      val p = s"$wh/db/t"
      (1L to 10L).map(i => (i, i * 1.0)).toDF("id", "x")
        .write.format("lance").mode("overwrite").save(p)
      Lance.createBranch(spark, p, "audit")
      (11L to 15L).map(i => (i, i * 1.0)).toDF("id", "x")
        .write.format("lance").option("write.branch", "audit").mode("append").save(p)
      val row = spark.sql("CALL lance_wap.system.publish_branch('db.t', " +
        "'audit', 'positive = x > 0')").collect()(0)
      assert(row.getAs[Int]("checks_passed") == 1)
      assert(spark.read.format("lance").load(p).count() == 15L)
    } finally {
      spark.conf.unset("spark.sql.catalog.lance_wap")
      spark.conf.unset("spark.sql.catalog.lance_wap.warehouse")
    }
  }

  test("resume_publish lands exactly the passing subset once from every crash point") {
    val dir = tmpDir()
    val root = new org.apache.hadoop.fs.Path(dir)
    def bfs = graft.format.LanceFormat.fileSystem(root,
      spark.sessionState.newHadoopConf())
    def mainCount = spark.read.format("lance").load(dir).count()
    def qCount(b: String) =
      spark.read.format("lance").option("branch", b + "-quarantine").load(dir).count()
    def headOf(b: String) = graft.format.LanceFormat.listVersionsIn(
      bfs, graft.format.LanceFormat.branchPath(root, b)).last
    def writeMarker(b: String, token: String, head: Long): Unit = {
      val out = bfs.create(new org.apache.hadoop.fs.Path(
        graft.format.LanceFormat.branchPath(root, b), "_quarantine_publish"), false)
      out.write((s"""{"token":"$token","auditedHead":$head,""" +
        """"checks":{"positive":"x > 0"}}""").getBytes("UTF-8"))
      out.close()
    }
    (1L to 20L).map(i => (i, i * 1.0)).toDF("id", "x")
      .write.format("lance").mode("overwrite").save(dir)

    // ---- crash point A: marker written, NEITHER commit landed
    Lance.createBranch(spark, dir, "ia")
    (Seq((21L, -5.0)) ++ (22L to 31L).map(i => (i, i * 1.0))).toDF("id", "x")
      .write.format("lance").option("write.branch", "ia").mode("append").save(dir)
    writeMarker("ia", "tok-a", headOf("ia"))
    val (ha, _) = Lance.resumePublish(spark, dir, "ia")
    assert(ha > 0L)
    assert(mainCount == 30L, s"A: main must gain exactly the 10 passing rows, has $mainCount")
    assert(qCount("ia") == 1L, "A: quarantine holds exactly the violation")
    assert(!bfs.exists(graft.format.LanceFormat.branchPath(root, "ia")),
      "A: the audited branch (and its marker) must be gone")
    // a second resume refuses: the publish completed
    val eA = intercept[IllegalArgumentException](
      Lance.resumePublish(spark, dir, "ia"))
    assert(eA.getMessage.contains("nothing to resume"), eA.getMessage)

    // ---- crash point B: quarantine STAGED (token-stamped), main not touched
    Lance.createBranch(spark, dir, "ib")
    (Seq((41L, -1.0)) ++ (42L to 46L).map(i => (i, i * 1.0))).toDF("id", "x")
      .write.format("lance").option("write.branch", "ib").mode("append").save(dir)
    val headB = headOf("ib")
    writeMarker("ib", "tok-b", headB)
    bfs.mkdirs(graft.format.LanceFormat.branchPath(root, "ib-quarantine"))
    Seq((41L, -1.0)).toDF("id", "x").write.format("lance")
      .option("write.branch", "ib-quarantine")
      .option("write.set-properties",
        graft.format.LanceFormat.serializeProperties(Map(
          "graft.wap.violations.positive" -> "1",
          "graft.wap.audited-head" -> headB.toString,
          "graft.wap.publish-token" -> "tok-b")))
      .mode("append").save(dir)
    Lance.resumePublish(spark, dir, "ib")
    assert(mainCount == 35L, s"B: main must gain exactly the 5 passing rows, has $mainCount")
    assert(qCount("ib") == 1L, "B: staged violations must not re-stage")
    assert(!bfs.exists(graft.format.LanceFormat.branchPath(root, "ib")))

    // ---- crash point C: quarantine staged AND main appended, branch not dropped
    Lance.createBranch(spark, dir, "ic")
    (Seq((61L, -2.0)) ++ (62L to 64L).map(i => (i, i * 1.0))).toDF("id", "x")
      .write.format("lance").option("write.branch", "ic").mode("append").save(dir)
    val headC = headOf("ic")
    writeMarker("ic", "tok-c", headC)
    bfs.mkdirs(graft.format.LanceFormat.branchPath(root, "ic-quarantine"))
    Seq((61L, -2.0)).toDF("id", "x").write.format("lance")
      .option("write.branch", "ic-quarantine")
      .option("write.set-properties",
        graft.format.LanceFormat.serializeProperties(Map(
          "graft.wap.violations.positive" -> "1",
          "graft.wap.audited-head" -> headC.toString,
          "graft.wap.publish-token" -> "tok-c")))
      .mode("append").save(dir)
    (62L to 64L).map(i => (i, i * 1.0)).toDF("id", "x").write.format("lance")
      .option("write.set-properties",
        graft.format.LanceFormat.serializeProperties(Map(
          "graft.wap.last-publish.ic" -> "tok-c")))
      .mode("append").save(dir)
    assert(mainCount == 38L)
    Lance.resumePublish(spark, dir, "ic")
    assert(mainCount == 38L, "C: the main append must NOT repeat")
    assert(qCount("ic") == 1L)
    assert(!bfs.exists(graft.format.LanceFormat.branchPath(root, "ic")))

    // ---- a PRE-RESUME (empty) marker refuses with manual instructions
    Lance.createBranch(spark, dir, "legacy")
    Seq((200L, -1.0)).toDF("id", "x")
      .write.format("lance").option("write.branch", "legacy").mode("append").save(dir)
    bfs.create(new org.apache.hadoop.fs.Path(
      graft.format.LanceFormat.branchPath(root, "legacy"),
      "_quarantine_publish"), false).close()
    val eL = intercept[IllegalArgumentException](
      Lance.resumePublish(spark, dir, "legacy"))
    assert(eL.getMessage.contains("no resume state"), eL.getMessage)

    // ---- the SQL verb drives the same path
    spark.conf.set("spark.sql.catalog.wapres", "graft.catalog.LanceCatalog")
    spark.conf.set("spark.sql.catalog.wapres.warehouse", tmpDir())
    try {
      val wh = spark.conf.get("spark.sql.catalog.wapres.warehouse")
      (1L to 5L).map(i => (i, i * 1.0)).toDF("id", "x")
        .write.format("lance").mode("overwrite").save(s"$wh/db/t")
      Lance.createBranch(spark, s"$wh/db/t", "iz")
      (Seq((11L, -1.0), (12L, 2.0))).toDF("id", "x")
        .write.format("lance").option("write.branch", "iz").mode("append")
        .save(s"$wh/db/t")
      val r2 = new org.apache.hadoop.fs.Path(s"$wh/db/t")
      val f2 = graft.format.LanceFormat.fileSystem(r2,
        spark.sessionState.newHadoopConf())
      val h2 = graft.format.LanceFormat.listVersionsIn(f2,
        graft.format.LanceFormat.branchPath(r2, "iz")).last
      val out = f2.create(new org.apache.hadoop.fs.Path(
        graft.format.LanceFormat.branchPath(r2, "iz"), "_quarantine_publish"),
        false)
      out.write((s"""{"token":"tok-z","auditedHead":$h2,""" +
        """"checks":{"positive":"x > 0"}}""").getBytes("UTF-8"))
      out.close()
      val row = spark.sql(
        "CALL wapres.system.resume_publish('db.t', 'iz')").collect()(0)
      assert(row.getLong(0) == h2, row.toString)
      assert(spark.read.format("lance").load(s"$wh/db/t").count() == 6L)
    } finally {
      spark.conf.unset("spark.sql.catalog.wapres")
      spark.conf.unset("spark.sql.catalog.wapres.warehouse")
    }
  }
  test("main-append CAS: a raced double-land of the passing subset fails loud") {
    // Two concurrent resume_publish calls can both observe published=false
    // before either commits; quarantineLand's step-2 append therefore
    // asserts the publish token's OBSERVED pre-state (usually: absent)
    // via write.require-properties, with null = "must still be absent".
    // Simulate the loser: the winner lands subset+token first, then the
    // loser issues the same guarded append it would have built.
    val dir = tmpDir()
    (1L to 10L).map(i => (i, i * 1.0)).toDF("id", "x")
      .write.format("lance").mode("overwrite").save(dir)
    Seq((11L, 1.0)).toDF("id", "x").write.format("lance")
      .option("write.set-properties",
        graft.format.LanceFormat.serializeProperties(
          Map("graft.wap.last-publish.b" -> "tok-1")))
      .mode("append").save(dir)
    intercept[java.util.ConcurrentModificationException](
      Seq((11L, 1.0)).toDF("id", "x").write.format("lance")
        .option("write.set-properties",
          graft.format.LanceFormat.serializeProperties(
            Map("graft.wap.last-publish.b" -> "tok-1")))
        .option("write.require-properties",
          graft.format.LanceFormat.serializeProperties(
            Map[String, String]("graft.wap.last-publish.b" -> null)))
        .mode("append").save(dir))
    assert(spark.read.format("lance").load(dir).count() == 11L,
      "the raced append must land nothing")
    // and the non-raced guard passes: pre-state matches -> commit lands
    Seq((12L, 1.0)).toDF("id", "x").write.format("lance")
      .option("write.require-properties",
        graft.format.LanceFormat.serializeProperties(
          Map("graft.wap.last-publish.b" -> "tok-1")))
      .mode("append").save(dir)
    assert(spark.read.format("lance").load(dir).count() == 12L)
  }
}
