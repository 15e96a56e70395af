package graft

import graft.format.LanceFormat
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Native SQL UPDATE / MERGE INTO / rewrite-path DELETE through
  * SupportsRowLevelOperations (group-based copy-on-write over manifest
  * fragments).
  */
class RowLevelSqlSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "rls-test-")
      .toAbsolutePath.toString

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  private def latest(dir: String) =
    LanceFormat.readLatest(fs(dir), new Path(dir)).get

  /** One catalog NAME per test: Spark caches catalog instances by name,
    * so re-pointing `spark.sql.catalog.<name>.warehouse` after first use
    * would silently keep every test on the first warehouse.
    */
  private val catalogSeq = new java.util.concurrent.atomic.AtomicInteger()
  private def withCatalog[T](wh: String)(f: String => T): T = {
    val cat = s"rls${catalogSeq.incrementAndGet()}"
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

  test("SQL UPDATE rewrites only candidate fragments and applies assignments") {
    val wh = tmpDir()
    withCatalog(wh) { cat =>
      clustered(s"$wh/db/t")
      val before = latest(s"$wh/db/t")
      spark.sql(s"UPDATE $cat.db.t SET v = v + 100, s = concat(s, '!') WHERE id >= 10 AND id < 13")
      val after = latest(s"$wh/db/t")
      assert(after.version == before.version + 1)
      // fragments 0 and 2 carry over by reference
      Seq(0, 2).foreach { id =>
        val f = before.fragments.find(_.id == id).get
        assert(after.fragments.exists(g => g.id == id && g.file == f.file),
          s"fragment $id should be untouched by the scoped update")
      }
      val rows = spark.sql(s"SELECT id, s, v FROM $cat.db.t WHERE id IN (9, 10, 12, 13)")
        .orderBy("id").as[(Long, String, Double)].collect().toSeq
      assert(rows == Seq(
        (9L, "row-9", 9.0), (10L, "row-10!", 110.0),
        (12L, "row-12!", 112.0), (13L, "row-13", 13.0)))
      assert(spark.sql(s"SELECT * FROM $cat.db.t").count() == 30)
    }
  }

  test("SQL UPDATE matching nothing commits no version") {
    val wh = tmpDir()
    withCatalog(wh) { cat =>
      clustered(s"$wh/db/t")
      val v = latest(s"$wh/db/t").version
      spark.sql(s"UPDATE $cat.db.t SET v = 0 WHERE id > 1000")
      assert(latest(s"$wh/db/t").version == v,
        "stats prune every fragment; an empty rewrite must not commit")
    }
  }

  test("SQL MERGE INTO: conditional delete, update, and insert in one commit") {
    val wh = tmpDir()
    withCatalog(wh) { cat =>
      clustered(s"$wh/db/t")
      // source: id 5 -> delete (neg v), id 7 -> update, id 99 -> insert
      Seq((5L, "del", -1.0), (7L, "upd", 777.0), (99L, "new", 99.0))
        .toDF("id", "s", "v").createOrReplaceTempView("rls_src")
      spark.sql(
        s"""MERGE INTO $cat.db.t t USING rls_src s ON t.id = s.id
          |WHEN MATCHED AND s.v < 0 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val back = spark.sql(s"SELECT id, s, v FROM $cat.db.t")
      assert(back.count() == 30) // 30 - 1 deleted + 1 inserted
      assert(back.filter($"id" === 5L).count() == 0)
      assert(back.filter($"id" === 7L).select("s", "v").as[(String, Double)].head()
        == ("upd", 777.0))
      assert(back.filter($"id" === 99L).select("s").as[String].head() == "new")
      assert(back.filter($"id" === 15L).select("s").as[String].head() == "row-15")
    }
  }

  test("DELETE with a non-translatable condition goes through the rewrite path") {
    val wh = tmpDir()
    withCatalog(wh) { cat =>
      clustered(s"$wh/db/t")
      // id % 3 = 0 has no V1 filter form: SupportsDelete cannot take it,
      // the group-based rewrite must
      spark.sql(s"DELETE FROM $cat.db.t WHERE id % 3 = 0")
      val ids = spark.sql(s"SELECT id FROM $cat.db.t").as[Long].collect().sorted.toSeq
      assert(ids == (0L until 30L).filter(_ % 3 != 0))
    }
  }

  test("time travel still reads the pre-UPDATE version") {
    val wh = tmpDir()
    withCatalog(wh) { cat =>
      clustered(s"$wh/db/t")
      val v = latest(s"$wh/db/t").version
      spark.sql(s"UPDATE $cat.db.t SET v = -1 WHERE id < 100")
      assert(spark.sql(s"SELECT sum(v) FROM $cat.db.t VERSION AS OF $v")
        .as[Double].head() == (0 until 30).sum.toDouble)
      assert(spark.sql(s"SELECT sum(v) FROM $cat.db.t").as[Double].head() == -30.0)
    }
  }

  test("INSERT OVERWRITE ... WHERE: aligned swap, misaligned and out-of-range refuse") {
    val wh = tmpDir()
    withCatalog(wh) { cat =>
      spark.sql(s"CREATE NAMESPACE $cat.db")
      val dir = s"$wh/db/t"
      // day-aligned fragments: each day one file, disjoint stats
      (1 to 3).foreach { day =>
        spark.range(0, 100).select(lit(day).as("day"),
            (col("id") + day * 1000).as("v"))
          .coalesce(1).write.format("lance")
          .mode(if (day == 1) "overwrite" else "append").save(dir)
      }
      val before = latest(dir)
      spark.range(0, 40).select(lit(2).as("day"), (col("id") + 5000).as("v"))
        .createOrReplaceTempView("fresh_day2")

      // aligned: day 2's fragment is PROVABLY all-inside -> swaps
      spark.sql(s"INSERT INTO $cat.db.t REPLACE WHERE day = 2 " +
        "SELECT * FROM fresh_day2")
      val after = latest(dir)
      assert(after.version == before.version + 1)
      assert(spark.table(s"$cat.db.t").count() == 240)
      assert(spark.table(s"$cat.db.t").filter(col("day") === 2).count() == 40)
      // days 1 and 3 carried by reference
      assert(after.fragments.exists(_.file == before.fragments(0).file))
      assert(after.fragments.exists(_.file == before.fragments(2).file))

      // misaligned: a predicate splitting a fragment refuses and points
      // at replace_where (swapping would drop rows outside the range)
      spark.range(0, 5).select(lit(3).as("day"), col("id").as("v"))
        .createOrReplaceTempView("fresh_partial")
      val e = intercept[Exception] {
        spark.sql(s"INSERT INTO $cat.db.t REPLACE WHERE day = 3 AND v < 3050 " +
          "SELECT * FROM fresh_partial")
      }
      assert(e.getMessage.contains("replace_where"), e.getMessage)

      // out-of-range rows in the batch refuse before commit
      spark.range(0, 2).select(
          when(col("id") === 0, 2).otherwise(9).as("day"), col("id").as("v"))
        .createOrReplaceTempView("fresh_outside")
      val e2 = intercept[Exception] {
        spark.sql(s"INSERT INTO $cat.db.t REPLACE WHERE day = 2 " +
          "SELECT * FROM fresh_outside")
      }
      assert(e2.getMessage.contains("outside"), e2.getMessage)
      // nothing landed from either refusal
      assert(latest(dir).version == after.version)
      assert(spark.table(s"$cat.db.t").count() == 240)

      // a predicate provably matching NOTHING appends (a new day's
      // first backfill run - Delta/Iceberg parity)
      spark.range(0, 10).select(lit(4).as("day"), (col("id") + 4000).as("v"))
        .createOrReplaceTempView("fresh_day4")
      spark.sql(s"INSERT INTO $cat.db.t REPLACE WHERE day = 4 " +
        "SELECT * FROM fresh_day4")
      assert(spark.table(s"$cat.db.t").count() == 250)
      assert(spark.table(s"$cat.db.t").filter(col("day") === 4).count() == 10)
    }
  }
}
