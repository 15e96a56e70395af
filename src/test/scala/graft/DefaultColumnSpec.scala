package graft

import graft.format.LanceFormat
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** DEFAULT values for added columns (Iceberg v3 initial-default
  * semantics, carried through Spark's own EXISTS_DEFAULT field-metadata
  * contract — the parquet readers fill missing columns from it).
  *
  * Contract: `addColumn(..., default)` / `ALTER TABLE ADD COLUMN c T
  * DEFAULT v` is ONE metadata commit, zero data rewritten. A fragment
  * that PHYSICALLY lacks the column (pre-ADD, or a later merge-schema
  * write that omitted it) reads the default; a fragment that stored an
  * explicit NULL reads NULL. The default is a validated constant —
  * non-constant, non-castable, and NULL defaults refuse at commit time,
  * never at read time. Renames keep it; SHOW TBLPROPERTIES lists it.
  */
class DefaultColumnSpec extends AnyFunSuite {
  import TestSpark._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "default-")
      .toAbsolutePath.toString

  private def fs(dir: String) =
    LanceFormat.fileSystem(new Path(dir), spark.sessionState.newHadoopConf())

  test("old fragments read the default; explicit values and NULLs win") {
    val dir = tmpDir()
    spark.range(0, 50).select(col("id"))
      .write.format("lance").mode("overwrite").save(dir)
    Lance.addColumn(spark, dir, "score", LongType, Some("42"))
    // pre-ADD fragments: the column is physically absent -> default
    val back = spark.read.format("lance").load(dir)
    assert(back.filter(col("score") === 42L).count() == 50)
    assert(back.filter(col("score").isNull).count() == 0)
    // new write with explicit values (incl. an explicit NULL): stored
    // bytes win — NULL stays NULL, never the default
    spark.range(50, 60).select(col("id"),
        when(col("id") % 2 === 0, col("id")).as("score"))
      .write.format("lance").mode("append").save(dir)
    val all = spark.read.format("lance").load(dir)
    assert(all.filter(col("score").isNull).count() == 5)
    assert(all.filter(col("score") === 42L).count() == 50)
    // a later merge-schema-style write that OMITS the column: its
    // fragments also lack it physically -> default again
    spark.range(60, 70).select(col("id"))
      .write.format("lance").option("write.merge-schema", "true")
      .mode("append").save(dir)
    assert(spark.read.format("lance").load(dir)
      .filter(col("score") === 42L).count() == 60)
    // aggregates and filters see the filled values (not nulls)
    assert(spark.read.format("lance").load(dir)
      .agg(sum(col("score"))).head.getLong(0) ==
      42L * 60 + (50L + 52 + 54 + 56 + 58))
  }

  test("SQL surface: ALTER TABLE ADD COLUMN ... DEFAULT through the catalog") {
    val wh = tmpDir()
    spark.conf.set("spark.sql.catalog.defc", "graft.catalog.LanceCatalog")
    spark.conf.set("spark.sql.catalog.defc.warehouse", wh)
    try {
      spark.range(0, 20).select(col("id"))
        .write.format("lance").mode("overwrite").save(s"$wh/db/t")
      spark.sql("ALTER TABLE defc.db.t ADD COLUMN lang STRING DEFAULT 'en'")
      val rows = spark.sql("SELECT lang, COUNT(*) AS n FROM defc.db.t GROUP BY lang")
        .collect()
      assert(rows.length == 1 && rows(0).getString(0) == "en" &&
        rows(0).getLong(1) == 20, rows.mkString(","))
      // SHOW TBLPROPERTIES names the default
      val props = spark.sql("SHOW TBLPROPERTIES defc.db.t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("lance.default.lang").contains("'en'"), props.toString)
    } finally {
      spark.conf.unset("spark.sql.catalog.defc")
      spark.conf.unset("spark.sql.catalog.defc.warehouse")
    }
  }

  test("invalid defaults refuse at commit time, never at read time") {
    val dir = tmpDir()
    spark.range(0, 5).select(col("id"))
      .write.format("lance").mode("overwrite").save(dir)
    // non-constant
    val e1 = intercept[Exception] {
      Lance.addColumn(spark, dir, "r", DoubleType, Some("rand()"))
    }
    assert(e1.getMessage.contains("constant"), e1.getMessage)
    // non-castable
    intercept[Exception] {
      Lance.addColumn(spark, dir, "n", LongType, Some("'not-a-number'"))
    }
    // NULL default is a no-op disguised as a feature
    val e3 = intercept[Exception] {
      Lance.addColumn(spark, dir, "x", LongType, Some("NULL"))
    }
    assert(e3.getMessage.contains("NULL"), e3.getMessage)
    // the table is untouched by the refusals
    assert(spark.read.format("lance").load(dir).columns.toSeq == Seq("id"))
  }

  test("rename keeps the default; DML through the defaulted column is exact") {
    val dir = tmpDir()
    spark.range(0, 30).select(col("id"))
      .write.format("lance").mode("overwrite").save(dir)
    Lance.addColumn(spark, dir, "flag", LongType, Some("7"))
    Lance.renameColumn(spark, dir, "flag", "mark")
    assert(spark.read.format("lance").load(dir)
      .filter(col("mark") === 7L).count() == 30)
    // DML predicate over the defaulted column: old fragments' rows MATCH
    // the default (they read 7), and the rewrite materializes real bytes
    val res = Lance.updateWhere(spark, dir, "mark = 7 AND id < 10",
      Map("mark" -> "8"))
    assert(res.rowsChanged == 10)
    val after = spark.read.format("lance").load(dir)
    assert(after.filter(col("mark") === 8L).count() == 10)
    assert(after.filter(col("mark") === 7L).count() == 20)
  }

  test("defaults survive the manifest round-trip (schema JSON carries them)") {
    val dir = tmpDir()
    spark.range(0, 5).select(col("id"))
      .write.format("lance").mode("overwrite").save(dir)
    Lance.addColumn(spark, dir, "score", LongType, Some("42"))
    spark.range(5, 10).select(col("id"), lit(1L).as("score"))
      .write.format("lance").mode("append").save(dir)
    val m = LanceFormat.readLatest(fs(dir), new Path(dir)).get
    assert(LanceFormat.columnDefaults(m.schema) == Map("score" -> "42"),
      m.schema.json)
  }
}
