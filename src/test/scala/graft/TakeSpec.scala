package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Random row access (`Lance.take`): global row id = manifest fragment
  * order × in-file row order; only containing fragments are read; ids
  * are per-version addresses.
  */
class TakeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "take-")
      .toAbsolutePath.toString

  /** Files behind the take's parquet read — the driver passed ONLY the
    * containing fragments in, so inputFiles IS the fragment I/O set. */
  private def scannedFiles(df: DataFrame): Int = df.inputFiles.length

  /** 4 fragments of 25 rows each, written in known partition order so
    * the global address of row (f, i) is f*25 + i by construction. */
  private def plant(dir: String): Unit =
    (0 until 4).foreach { f =>
      (0 until 25).map(i => (f.toLong * 25 + i, s"v${f * 25 + i}"))
        .toDF("expect_rowid", "payload").coalesce(1)
        .write.format("lance").mode(if (f == 0) "overwrite" else "append").save(dir)
    }

  test("take returns exactly the addressed rows, ordered, with _rowid") {
    val dir = tmpDir()
    plant(dir)
    val got = Lance.take(spark, dir, Seq(99L, 0L, 26L, 50L, 74L))
    val rows = got.select("_rowid", "expect_rowid", "payload").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 26L, 50L, 74L, 99L), "ordered by id")
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"address mismatch: ${r.toSeq}"))
    assert(rows.map(_.getString(2)).toSeq == Seq("v0", "v26", "v50", "v74", "v99"))
  }

  test("take reads only the fragments containing requested ids") {
    val dir = tmpDir()
    plant(dir)
    // ids 3 and 7 live in fragment 0 only
    assert(scannedFiles(Lance.take(spark, dir, Seq(3L, 7L))) == 1)
    // 3 in fragment 0, 60 in fragment 2
    assert(scannedFiles(Lance.take(spark, dir, Seq(3L, 60L))) == 2)
  }

  test("ids are per-version addresses: time travel pins the old space") {
    val dir = tmpDir()
    plant(dir)
    val v = Lance.versions(spark, dir).max
    Seq((999L, "late")).toDF("expect_rowid", "payload")
      .write.format("lance").mode("append").save(dir)
    // current space has 101 rows; id 100 is the appended row
    val cur = Lance.take(spark, dir, Seq(100L)).select("payload").collect()
    assert(cur.map(_.getString(0)).toSeq == Seq("late"))
    // the pinned version has only 100 addresses — 100 is out of range
    intercept[IllegalArgumentException] {
      Lance.take(spark, dir, Seq(100L), version = Some(v))
    }
    val old = Lance.take(spark, dir, Seq(99L), version = Some(v))
      .select("payload").collect()
    assert(old.map(_.getString(0)).toSeq == Seq("v99"))
  }

  test("out-of-range and empty id lists fail loud") {
    val dir = tmpDir()
    plant(dir)
    intercept[IllegalArgumentException] { Lance.take(spark, dir, Seq(-1L)) }
    intercept[IllegalArgumentException] { Lance.take(spark, dir, Seq(100L)) }
    intercept[IllegalArgumentException] { Lance.take(spark, dir, Seq.empty) }
  }
}
