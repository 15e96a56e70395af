package graft

import graft.format.{FragmentMeta, LanceFormat}
import graft.operators.Dml
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Row-level DELETE/UPDATE/MERGE: copy-on-write scope, MVCC behavior,
  * SQL semantics corners (NULL conditions, pre-update reads, duplicate
  * merge keys), and the stale-rewrite concurrency guard.
  */
class DmlSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "dml-test-")
      .toAbsolutePath.toString

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  private def latest(dir: String) =
    LanceFormat.readLatest(fs(dir), new Path(dir)).get

  /** Range-clustered 3-fragment table: ids 0-9 / 10-19 / 20-29. */
  private def clustered(dir: String): Unit =
    (0 until 3).foreach { f =>
      (f * 10 until (f + 1) * 10).map(i => (i.toLong, s"row-$i", i * 1.5))
        .toDF("id", "s", "v").coalesce(1)
        .write.format("lance").mode(if (f == 0) "overwrite" else "append").save(dir)
    }

  test("delete rewrites only the fragments that may match; the rest carry by reference") {
    val dir = s"${tmpDir()}/d1"
    clustered(dir)
    val before = latest(dir)
    assert(before.fragments.size == 3)

    val r = Dml.deleteWhere(spark, dir, "id >= 10 AND id < 13")
    assert(r.candidateFragments == 1, s"stats should scope to 1 fragment, got $r")
    assert(r.rowsChanged == 3)

    val after = latest(dir)
    assert(after.version == before.version + 1)
    // the two untouched fragments survive as the SAME files and ids
    val untouched = before.fragments.filter(f => f.id != 1)
    untouched.foreach { f =>
      assert(after.fragments.exists(g => g.id == f.id && g.file == f.file),
        s"fragment ${f.id} should carry over by reference")
    }
    assert(!after.fragments.exists(_.file == before.fragments(1).file))

    val back = spark.read.format("lance").load(dir)
    assert(back.count() == 27)
    assert(back.filter($"id" >= 10 && $"id" < 13).count() == 0)
  }

  test("deleted rows remain readable via time travel; vacuum reclaims them") {
    val dir = s"${tmpDir()}/d2"
    clustered(dir)
    val vBefore = latest(dir).version
    Dml.deleteWhere(spark, dir, "id < 5")
    assert(spark.read.format("lance").load(dir).count() == 25)
    val old = spark.read.format("lance")
      .option("versionAsOf", vBefore.toString).load(dir)
    assert(old.count() == 30, "pre-delete snapshot must still see every row")

    val (manifests, files) = Lance.vacuum(spark, dir, keepVersions = 1)
    assert(manifests == vBefore.toInt && files >= 1)
    assert(spark.read.format("lance").load(dir).count() == 25)
  }

  test("no-op delete commits no version; NULL condition keeps the row") {
    val dir = s"${tmpDir()}/d3"
    Seq((1L, Some(1.0)), (2L, None), (3L, Some(3.0))).toDF("id", "v")
      .write.format("lance").mode("overwrite").save(dir)
    val v1 = latest(dir).version

    val miss = Dml.deleteWhere(spark, dir, "id > 100")
    assert(miss.rowsChanged == 0 && miss.committedVersion.isEmpty)
    assert(latest(dir).version == v1, "a no-op must not commit")

    // v > 2.0 is NULL for id=2: SQL DELETE keeps NULL-condition rows
    val r = Dml.deleteWhere(spark, dir, "v > 2.0")
    assert(r.rowsChanged == 1)
    assert(spark.read.format("lance").load(dir)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("delete everything leaves a readable empty table") {
    val dir = s"${tmpDir()}/d4"
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.format("lance").mode("overwrite").save(dir)
    val r = Dml.deleteWhere(spark, dir, "id IS NOT NULL")
    assert(r.rowsChanged == 2)
    val back = spark.read.format("lance").load(dir)
    assert(back.count() == 0)
    assert(back.schema.fieldNames.toSeq == Seq("id", "s"))
  }

  test("update sees the pre-update row (SET a = b, b = a swaps) and casts to the column type") {
    val dir = s"${tmpDir()}/u1"
    Seq((1L, 10.0, 20.0), (2L, 30.0, 40.0)).toDF("id", "a", "b")
      .write.format("lance").mode("overwrite").save(dir)
    val r = Dml.updateWhere(spark, dir, "id = 1", Map("a" -> "b", "b" -> "a"))
    assert(r.rowsChanged == 1)
    val rows = spark.read.format("lance").load(dir)
      .orderBy("id").as[(Long, Double, Double)].collect().toSeq
    assert(rows == Seq((1L, 20.0, 10.0), (2L, 30.0, 40.0)))

    // integer-typed column keeps its type even when the expression widens
    val dir2 = s"${tmpDir()}/u2"
    Seq((1, 5)).toDF("id", "n").write.format("lance").mode("overwrite").save(dir2)
    Dml.updateWhere(spark, dir2, "id = 1", Map("n" -> "n / 2 + 0.9"))
    val sch = spark.read.format("lance").load(dir2).schema
    assert(sch("n").dataType == org.apache.spark.sql.types.IntegerType)
  }

  test("upsert updates matches, inserts the rest, and scopes to key-bounded fragments") {
    val dir = s"${tmpDir()}/m1"
    clustered(dir)
    // source hits only fragment 0's id range, plus one brand-new key
    val src = Seq((3L, "updated-3", -1.0), (100L, "new-100", -2.0)).toDF("id", "s", "v")
    val r = Dml.upsert(spark, dir, src, Seq("id"))
    assert(r.rowsChanged == 1 && r.rowsInserted == 1)
    assert(r.candidateFragments == 1,
      s"IN-list pruning should admit only fragment 0 (key 3; 100 is beyond " +
        s"every max — a [3,100] range would wrongly rewrite all three), got $r")
    val back = spark.read.format("lance").load(dir)
    assert(back.count() == 31)
    assert(back.filter($"id" === 3L).select("s").as[String].head() == "updated-3")
    assert(back.filter($"id" === 100L).count() == 1)
    assert(back.filter($"id" === 15L).select("s").as[String].head() == "row-15",
      "pruned fragment's rows must be untouched")
  }

  test("upsert rejects duplicate source keys; null-key source rows just insert") {
    val dir = s"${tmpDir()}/m2"
    Seq((1L, "a")).toDF("id", "s").write.format("lance").mode("overwrite").save(dir)
    val dup = Seq((2L, "x"), (2L, "y")).toDF("id", "s")
    val e = intercept[IllegalArgumentException](Dml.upsert(spark, dir, dup, Seq("id")))
    assert(e.getMessage.contains("duplicate keys"))

    val nullKey = Seq((Option.empty[Long], "n")).toDF("id", "s")
    val r = Dml.upsert(spark, dir, nullKey, Seq("id"))
    assert(r.rowsChanged == 0 && r.rowsInserted == 1)
    assert(spark.read.format("lance").load(dir).count() == 2)
  }

  test("a stale rewrite fails loud instead of resurrecting replaced rows") {
    val dir = s"${tmpDir()}/c1"
    clustered(dir)
    val m = latest(dir)
    val f = fs(dir)
    // simulate: another committer already replaced fragment 1
    LanceFormat.commitReplace(f, new Path(dir), m.schema, Set(1), Seq.empty)
    val e = intercept[java.util.ConcurrentModificationException] {
      LanceFormat.commitReplace(f, new Path(dir), m.schema, Set(1),
        Seq(FragmentMeta(0, "ghost.parquet", 1)))
    }
    assert(e.getMessage.contains("concurrent commit"))
  }

  test("commitReplace merges with a concurrent append (its fragments survive)") {
    val dir = s"${tmpDir()}/c2"
    clustered(dir)
    val m = latest(dir)
    // an append lands AFTER the rewrite snapshotted the manifest
    Seq((99L, "appended", 0.0)).toDF("id", "s", "v")
      .write.format("lance").mode("append").save(dir)
    val (committed, removedRows) =
      LanceFormat.commitReplace(fs(dir), new Path(dir), m.schema, Set(0), Seq.empty)
    assert(removedRows == 10)
    assert(committed.fragments.map(_.id).toSet == Set(1, 2, 3),
      "the concurrent append's fragment must survive the replace")
    assert(spark.read.format("lance").load(dir).count() == 21)
  }

  test("DML staleness: refresh demands rebuild; the warning names the ghost-row risk") {
    val dir = s"${tmpDir()}/ix1"
    val dim = 4
    val rows = (0 until 40).map(i =>
      (i.toLong, Array.tabulate(dim)(d => (i * dim + d).toFloat / 100f)))
    Lance.withVectorDim(rows.toDF("id", "embedding"), "embedding", dim)
      .write.format("lance").mode("overwrite").save(dir)
    val df = spark.read.format("lance").load(dir)
    Lance.buildIndex(spark, df, "embedding", "id", dir, numPartitions = 4)

    // append-only staleness: refresh is the suggested fix
    Seq((100L, Array.fill(dim)(0.5f))).toDF("id", "embedding")
      .write.format("lance").mode("append").save(dir)
    val meta = graft.index.IvfIndex.loadMeta(spark, dir, "embedding")
    val appendWarn = graft.index.IvfIndex.freshnessWarning(spark, dir, meta)
    assert(appendWarn.exists(_.contains("refresh")), s"got $appendWarn")
    assert(appendWarn.forall(!_.contains("REWRITTEN")))

    // a row-level delete rewrites an indexed fragment: ghosts until rebuild
    val r = Dml.deleteWhere(spark, dir, "id < 5")
    assert(r.rowsChanged == 5)
    val rewriteWarn = graft.index.IvfIndex.freshnessWarning(spark, dir, meta)
    assert(rewriteWarn.exists(w => w.contains("REWRITTEN") && w.contains("rebuild")),
      s"got $rewriteWarn")
    val e = intercept[IllegalArgumentException](Lance.refreshIndex(spark, dir, "embedding"))
    assert(e.getMessage.contains("rebuild"),
      s"refresh over rewritten fragments must fail loud, got: ${e.getMessage}")
  }

  test("SQL DELETE refuses a time-travel snapshot") {
    val wh = tmpDir()
    spark.conf.set("spark.sql.catalog.dmlspec", "graft.catalog.LanceCatalog")
    spark.conf.set("spark.sql.catalog.dmlspec.warehouse", wh)
    try {
      Seq((1L, "a"), (2L, "b")).toDF("id", "s")
        .write.format("lance").mode("overwrite").save(s"$wh/db/t")
      Seq((3L, "c")).toDF("id", "s")
        .write.format("lance").mode("append").save(s"$wh/db/t")
      spark.sql("DELETE FROM dmlspec.db.t WHERE id = 1")
      assert(spark.sql("SELECT * FROM dmlspec.db.t").count() == 2)
      // a version-pinned table refuses deletes at both negotiation points
      val pinned = new graft.connector.LanceTable(s"$wh/db/t", null, Some(1L))
      assert(!pinned.canDeleteWhere(Array.empty[org.apache.spark.sql.sources.Filter]))
      val e = intercept[IllegalArgumentException] {
        pinned.deleteWhere(Array.empty[org.apache.spark.sql.sources.Filter])
      }
      assert(e.getMessage.contains("time-travel"))
    } finally {
      spark.conf.unset("spark.sql.catalog.dmlspec")
      spark.conf.unset("spark.sql.catalog.dmlspec.warehouse")
    }
  }

  test("fully-covered delete is metadata-only: fragments drop with zero data I/O") {
    val dir = s"${tmpDir()}/meta1"
    clustered(dir)
    val before = latest(dir)
    val dataDir = LanceFormat.dataPath(new Path(dir))
    val filesBefore = fs(dir).listStatus(dataDir).map(_.getPath.getName).toSet

    // id < 20 provably covers fragments 0 (0-9) and 1 (10-19) entirely
    val r = Dml.deleteWhere(spark, dir, "id < 20")
    assert(r.rowsChanged == 20, s"20 rows proven deleted from stats alone, got $r")
    assert(r.candidateFragments == 2)

    val after = latest(dir)
    assert(after.version == before.version + 1)
    assert(after.fragments.map(_.file) == Seq(before.fragments(2).file),
      "only the untouched fragment remains, by reference")
    val filesAfter = fs(dir).listStatus(dataDir).map(_.getPath.getName).toSet
    assert(filesAfter == filesBefore,
      "a metadata-only delete must write no data files")
    assert(spark.read.format("lance").load(dir)
      .select("id").as[Long].collect().sorted.toSeq == (20L until 30L))
  }

  test("mixed delete: covered fragments drop, only the boundary fragment rewrites") {
    val dir = s"${tmpDir()}/meta2"
    clustered(dir)
    val before = latest(dir)
    val dataDir = LanceFormat.dataPath(new Path(dir))
    val filesBefore = fs(dir).listStatus(dataDir).map(_.getPath.getName).toSet

    // fragment 0 (ids 0-9) fully covered; fragment 1 (10-19) is boundary
    val r = Dml.deleteWhere(spark, dir, "id < 13")
    assert(r.rowsChanged == 13)
    assert(r.candidateFragments == 2)

    val after = latest(dir)
    // fragment 2 carries by reference; fragments 0 and 1's files are gone
    assert(after.fragments.exists(_.file == before.fragments(2).file))
    assert(!after.fragments.exists(_.file == before.fragments(0).file))
    assert(!after.fragments.exists(_.file == before.fragments(1).file))
    // new files were written only for the boundary remainder (ids 13-19)
    val newFiles = fs(dir).listStatus(dataDir).map(_.getPath.getName).toSet -- filesBefore
    assert(newFiles.nonEmpty && newFiles == after.fragments.map(_.file).toSet -- filesBefore)
    val boundaryRows = after.fragments.filter(f => newFiles.contains(f.file)).map(_.rowCount).sum
    assert(boundaryRows == 7, "rewritten data is exactly the boundary remainder")
    assert(spark.read.format("lance").load(dir)
      .select("id").as[Long].collect().sorted.toSeq == (13L until 30L))
  }

  test("clean may-match candidates ride by reference: only match-holding fragments rewrite") {
    val dir = s"${tmpDir()}/scope1"
    // three fragments with IDENTICAL value ranges: stats admit all three
    // for any point probe, so the may-match candidate set is the whole
    // table — the per-file match scan must still rewrite exactly one
    import org.apache.spark.sql.functions.col
    (0 until 3).foreach { i =>
      // 300 distinct values per fragment: past ValueSetMaxSize, so only
      // min/max bounds are stored and every fragment stays a candidate
      spark.range(0, 300).select((col("id") * 3 + i).as("id"),
          org.apache.spark.sql.functions.lit(s"copy$i").as("tag"))
        .coalesce(1).write.format("lance")
        .mode(if (i == 0) "overwrite" else "append").save(dir)
    }
    val before = latest(dir)
    assert(before.fragments.size == 3)

    // id=31 lives ONLY in the i=1 fragment (31 = 10*3 + 1)
    val r = Dml.deleteWhere(spark, dir, col("id") === 31L)
    assert(r.rowsChanged == 1)
    assert(r.candidateFragments == 3, "stats cannot prune identical ranges")
    val after = latest(dir)
    val beforeFiles = before.fragments.map(_.file)
    // the two clean fragments carry BY REFERENCE (same file names)
    assert(after.fragments.exists(_.file == beforeFiles(0)))
    assert(after.fragments.exists(_.file == beforeFiles(2)))
    assert(!after.fragments.exists(_.file == beforeFiles(1)),
      "the match-holding fragment must be rewritten")
    assert(spark.read.format("lance").load(dir).count() == 899)

    // same scoping for UPDATE
    val r2 = Dml.updateWhere(spark, dir, col("id") === 32L,
      Seq("tag" -> org.apache.spark.sql.functions.lit("touched")))
    assert(r2.rowsChanged == 1)
    val after2 = latest(dir)
    assert(after2.fragments.exists(_.file == beforeFiles(0)),
      "UPDATE rewrote a fragment holding no matches")
    // and for MERGE: a one-key upsert rewrites one fragment
    val src = spark.range(34, 35).select(col("id"),
      org.apache.spark.sql.functions.lit("merged").as("tag"))
    val filesBefore3 = latest(dir).fragments.map(_.file).toSet
    val r3 = Dml.upsert(spark, dir, src, Seq("id"))
    assert(r3.rowsChanged == 1 && r3.rowsInserted == 0)
    val after3 = latest(dir)
    assert(after3.fragments.exists(_.file == beforeFiles(0)),
      "MERGE rewrote a fragment holding no matched keys")
    assert((filesBefore3 -- after3.fragments.map(_.file).toSet).size == 1,
      "exactly one fragment should have been replaced by the merge")
  }

  test("replaceWhere: predicate-scoped overwrite, strict range, one commit") {
    import org.apache.spark.sql.functions.{col, lit}
    val dir = s"${tmpDir()}/rw1"
    // three "days", clustered so day 2 is fully covered by its fragments
    (1 to 3).foreach { day =>
      spark.range(0, 100).select(lit(day).as("day"),
          (col("id") + day * 1000).as("v"))
        .coalesce(1).write.format("lance")
        .mode(if (day == 1) "overwrite" else "append").save(dir)
    }
    val before = latest(dir)
    val vBefore = before.version

    // the backfill: day 2 re-runs with half the rows, doubled values
    val fresh = spark.range(0, 50).select(lit(2).as("day"),
      (col("id") * 2 + 2000).as("v"))
    val r = Dml.replaceWhere(spark, dir, col("day") === 2, fresh)
    assert(r.rowsChanged == 100 && r.rowsInserted == 50)
    val after = latest(dir)
    assert(after.version == vBefore + 1, "replaceWhere must be ONE commit")
    // day 1 and 3 fragments carry by reference
    assert(after.fragments.exists(_.file == before.fragments(0).file))
    assert(after.fragments.exists(_.file == before.fragments(2).file))
    assert(!after.fragments.exists(_.file == before.fragments(1).file))
    val readBack = spark.read.format("lance").load(dir)
    assert(readBack.count() == 250)
    assert(readBack.filter(col("day") === 2).count() == 50)
    assert(readBack.filter(col("day") === 2)
      .agg(org.apache.spark.sql.functions.min(col("v"))).collect()(0).getLong(0) == 2000L)

    // strict: a row OUTSIDE the predicate refuses the whole write
    val vAfter = latest(dir).version
    val bad = spark.range(0, 2).select(
      org.apache.spark.sql.functions.when(col("id") === 0, 2).otherwise(9).as("day"),
      col("id").as("v"))
    val e = intercept[IllegalArgumentException] {
      Dml.replaceWhere(spark, dir, col("day") === 2, bad)
    }
    assert(e.getMessage.contains("does not"), e.getMessage)
    assert(latest(dir).version == vAfter, "refused write must commit nothing")

    // a predicate matching NOTHING (a new day's first run) plain-inserts
    val day4 = spark.range(0, 10).select(lit(4).as("day"),
      (col("id") + 4000).as("v"))
    val r4 = Dml.replaceWhere(spark, dir, col("day") === 4, day4)
    assert(r4.rowsChanged == 0 && r4.rowsInserted == 10)
    assert(spark.read.format("lance").load(dir).count() == 260)
    // and case-insensitive source columns resolve (Spark's posture)
    val day5 = spark.range(0, 5).select(lit(5).as("DAY"),
      (col("id") + 5000).as("V"))
    val r5 = Dml.replaceWhere(spark, dir, col("day") === 5, day5)
    assert(r5.rowsInserted == 5)
    assert(spark.read.format("lance").load(dir)
      .filter(col("day") === 5).count() == 5)
  }

  test("concurrent deletes on disjoint fragments both land (optimistic retry merges)") {
    val dir = s"${tmpDir()}/cc1"
    clustered(dir)
    // thread A deletes from fragment 0's range, thread B from fragment 2's;
    // whoever commits second re-reads the new manifest, finds its replaced
    // ids still present, and merges — no lost update, no manual locking
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq("id < 3" -> "A", "id >= 27" -> "B").map { case (cond, name) =>
      new Thread(() => {
        try Dml.deleteWhere(spark, dir, cond)
        catch { case t: Throwable => errs.add(t) }
      }, s"dml-$name")
    }
    threads.foreach(_.start()); threads.foreach(_.join(60000))
    assert(errs.isEmpty, s"concurrent disjoint deletes must not conflict: ${errs.peek()}")
    val ids = spark.read.format("lance").load(dir)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids == (3L until 27L), s"both deletes must apply, got $ids")
    // versions dense: base 3 + two delete commits
    assert(LanceFormat.listVersions(fs(dir), new Path(dir)) == (1L to 5L))
  }

  test("restore rolls back as a NEW commit; history preserved; no-op skips") {
    val dir = s"${tmpDir()}/restore"
    clustered(dir) // v1..v3: three appends, ids 0..29
    val vGood = latest(dir).version
    Dml.deleteWhere(spark, dir, "id >= 20")
    val vBad = latest(dir).version
    assert(spark.read.format("lance").load(dir).count() == 20)

    val (restored, vNew) = Lance.restore(spark, dir, vGood)
    assert(restored == vGood && vNew == vBad + 1)
    assert(spark.read.format("lance").load(dir).count() == 30,
      "restore must bring the deleted rows back")
    // the undone version is still addressable — history, not rewind
    assert(spark.read.format("lance").option("versionAsOf", vBad)
      .load(dir).count() == 20)
    // restoring to the state we're already at commits nothing
    val (_, vSame) = Lance.restore(spark, dir, vGood)
    assert(vSame == vNew, "no-op restore must not commit a version")
    assert(latest(dir).version == vNew)

    // CALL surface
    val wh = s"${tmpDir()}/restore_wh"
    spark.conf.set("spark.sql.catalog.lance_rst", "graft.catalog.LanceCatalog")
    spark.conf.set("spark.sql.catalog.lance_rst.warehouse",
      new java.io.File(wh).getAbsolutePath)
    try {
      spark.sql("CREATE NAMESPACE lance_rst.db")
      spark.sql("CREATE TABLE lance_rst.db.t (id BIGINT)")
      spark.sql("INSERT INTO lance_rst.db.t VALUES (1), (2)")
      val v = 2 // create=1, insert=2
      spark.sql("INSERT INTO lance_rst.db.t VALUES (3)")
      val r = spark.sql(s"CALL lance_rst.restore('db.t', $v)").collect().head
      assert(r.getLong(0) == v && r.getLong(1) > v)
      assert(spark.sql("SELECT COUNT(*) FROM lance_rst.db.t").head.getLong(0) == 2)
    } finally {
      spark.sql("DROP TABLE IF EXISTS lance_rst.db.t")
      spark.conf.unset("spark.sql.catalog.lance_rst")
      spark.conf.unset("spark.sql.catalog.lance_rst.warehouse")
    }
  }

  test("restore whose target fragments were reclaimed fails loud") {
    val dir = s"${tmpDir()}/restore_vac"
    clustered(dir)
    val vGood = latest(dir).version
    // fully-covered delete drops fragments 1+2 from the manifest; their
    // files stay on disk referenced only by the older manifests
    Dml.deleteWhere(spark, dir, "id >= 10")
    // simulate file-level reclamation racing the restore: one of the
    // restore target's fragment files disappears
    val victim = LanceFormat.readManifest(fs(dir), new Path(dir), vGood)
      .fragments.last.file
    assert(fs(dir).delete(
      new Path(LanceFormat.dataPath(new Path(dir)), victim), false))
    val e = intercept[IllegalArgumentException](Lance.restore(spark, dir, vGood))
    assert(e.getMessage.contains("vacuum"),
      s"must name the retention window: ${e.getMessage}")
  }
}
