package graft

import graft.format.LanceFormat
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The `__fragment_id` metadata column (row provenance) and the runtime
  * group filtering it enables for row-level SQL commands: an UPDATE/MERGE
  * whose condition manifest stats cannot bound must still rewrite only the
  * fragments that actually hold matching rows, discovered at runtime by
  * Spark's matching-groups subquery over the metadata column.
  */
class FragmentIdSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "fragid-test-")
      .toAbsolutePath.toString

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  private def latest(dir: String) =
    LanceFormat.readLatest(fs(dir), new Path(dir)).get

  private val catalogSeq = new java.util.concurrent.atomic.AtomicInteger()
  private def withCatalog[T](wh: String)(f: String => T): T = {
    val cat = s"fragid${catalogSeq.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.LanceCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try f(cat) finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }

  /** Range-clustered 3-fragment table: ids 0-9 / 10-19 / 20-29. */
  private def clustered(dir: String): Unit =
    (0 until 3).foreach { f =>
      (f * 10 until (f + 1) * 10).map(i => (i.toLong, s"row-$i", i * 1.0))
        .toDF("id", "s", "v").coalesce(1)
        .write.format("lance").mode(if (f == 0) "overwrite" else "append").save(dir)
    }

  test("__fragment_id groups rows exactly by manifest fragment") {
    val dir = tmpDir()
    clustered(dir)
    val byFrag = spark.read.format("lance").load(dir)
      .groupBy(col("__fragment_id"))
      .agg(count(lit(1)).as("n"), min(col("id")).as("lo"), max(col("id")).as("hi"))
      .orderBy(col("__fragment_id"))
      .as[(Int, Long, Long, Long)].collect().toSeq
    val expected = latest(dir).fragments.sortBy(_.id)
      .zipWithIndex.map { case (f, i) => (f.id, 10L, i * 10L, i * 10L + 9) }
    assert(byFrag == expected)
  }

  test("SELECT * does not surface the metadata column") {
    val dir = tmpDir()
    clustered(dir)
    assert(!spark.read.format("lance").load(dir).columns.contains("__fragment_id"))
  }

  test("filters still apply above the metadata scan, and stats prune it") {
    val dir = tmpDir()
    clustered(dir)
    val q = spark.read.format("lance").load(dir)
      .filter(col("id") >= 10L && col("id") < 13L)
      .select(col("id"), col("__fragment_id"))
    val rows = q.as[(Long, Int)].collect().toSeq.sortBy(_._1)
    val midFrag = latest(dir).fragments.sortBy(_.id).apply(1).id
    assert(rows == Seq((10L, midFrag), (11L, midFrag), (12L, midFrag)))
    // the scan itself is the fragment-per-partition metadata scan, stats-
    // pruned to the one fragment whose id range can match
    val desc = q.queryExecution.executedPlan.toString
    assert(desc.contains("LanceMetadataScan(1 fragments"), desc)
  }

  test("metadata scan stays on the vectorized reader (columnar batches)") {
    val dir = tmpDir()
    clustered(dir)
    val q = spark.read.format("lance").load(dir)
      .select(col("id"), col("__fragment_id"))
    // ColumnarToRow above the scan = batches flow out of the reader; the
    // constant-id vector rides each batch instead of a per-row JoinedRow
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"), plan)
    assert(q.count() == 30)
  }

  test("catalog SQL resolves __fragment_id") {
    val wh = tmpDir()
    withCatalog(wh) { cat =>
      clustered(s"$wh/db/t")
      val n = spark.sql(
        s"SELECT count(DISTINCT __fragment_id) AS nf FROM $cat.db.t")
        .as[Long].head()
      assert(n == 3)
    }
  }

  test("UPDATE with a stats-opaque condition rewrites only matching fragments") {
    val wh = tmpDir()
    withCatalog(wh) { cat =>
      clustered(s"$wh/db/t")
      val before = latest(s"$wh/db/t")
      // id % 30 = 5 only matches id=5 (fragment 0), but min/max stats
      // cannot bound a modulo: static pruning keeps all 3 candidates, so
      // only the runtime matching-groups subquery can scope the rewrite
      spark.sql(s"UPDATE $cat.db.t SET v = -1 WHERE id % 30 = 5")
      val after = latest(s"$wh/db/t")
      val untouched = before.fragments.sortBy(_.id).drop(1)
      untouched.foreach { f =>
        assert(after.fragments.exists(g => g.id == f.id && g.file == f.file),
          s"fragment ${f.id} held no matches and must carry over by reference")
      }
      assert(!after.fragments.exists(_.file == before.fragments.sortBy(_.id).head.file),
        "fragment 0 held the match and must be rewritten")
      assert(spark.sql(s"SELECT v FROM $cat.db.t WHERE id = 5").as[Double].head() == -1.0)
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.t").as[Long].head() == 30)
    }
  }

  test("MERGE with non-pushable ON keys rewrites only fragments holding matches") {
    val wh = tmpDir()
    withCatalog(wh) { cat =>
      clustered(s"$wh/db/t")
      val before = latest(s"$wh/db/t")
      Seq((10L, "upd", 1000.0), (12L, "upd", 1200.0), (99L, "new", 99.0))
        .toDF("id", "s", "v").createOrReplaceTempView("fragid_merge_src")
      spark.sql(
        s"""MERGE INTO $cat.db.t t USING fragid_merge_src s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val after = latest(s"$wh/db/t")
      val Seq(f0, f1, f2) = before.fragments.sortBy(_.id)
      Seq(f0, f2).foreach { f =>
        assert(after.fragments.exists(g => g.id == f.id && g.file == f.file),
          s"fragment ${f.id} held no ON matches and must carry over by reference")
      }
      assert(!after.fragments.exists(_.file == f1.file),
        "fragment 1 held the matches and must be rewritten")
      val back = spark.sql(s"SELECT id, s, v FROM $cat.db.t")
      assert(back.count() == 31)
      assert(back.filter($"id" === 10L).select("v").as[Double].head() == 1000.0)
      assert(back.filter($"id" === 99L).select("s").as[String].head() == "new")
      assert(back.filter($"id" === 15L).select("s").as[String].head() == "row-15")
    }
  }
}
