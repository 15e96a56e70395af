package graft

import graft.format.LanceFormat
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** ALTER TABLE ALTER COLUMN TYPE, widening only (Delta's type-widening
  * shape). Contracts pinned here:
  *  - one metadata commit, zero data rewritten: fragments written BEFORE
  *    the widen keep their narrower parquet encoding and read up through
  *    the widened type — on the vectorized AND the row-based reader
  *  - every lattice transition round-trips its values exactly
  *  - narrowing / lossy / scale-changing transitions refuse loudly, as
  *    does widening a column an index sidecar references
  *  - a stale append (writer holding the pre-widen schema) cannot narrow
  *    the column back (the nullability lost-update's sibling)
  *  - narrower-compatible appends land WITHOUT merge-schema (table wins)
  *  - time travel before the widen serves the old type
  *  - SQL surfaces: ALTER TABLE ... ALTER COLUMN ... TYPE, CALL
  *    widen_column
  */
class WidenTypeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "widen-")
      .toAbsolutePath.toString

  private def fs(dir: String) =
    LanceFormat.fileSystem(new Path(dir), spark.sessionState.newHadoopConf())

  private def schemaOf(dir: String): StructType =
    LanceFormat.readLatest(fs(dir), new Path(dir)).get.schema

  test("int->long is metadata-only; old fragments read up; wide values land after") {
    val dir = tmpDir()
    Seq(1, 2, 1000).toDF("v").withColumn("id", monotonically_increasing_id())
      .write.format("lance").mode("overwrite").save(dir)
    val before = LanceFormat.readLatest(fs(dir), new Path(dir)).get
    Lance.widenColumnType(spark, dir, "v", LongType)
    val after = LanceFormat.readLatest(fs(dir), new Path(dir)).get
    assert(after.version == before.version + 1)
    assert(after.fragments.map(_.file) == before.fragments.map(_.file),
      "widen must not rewrite data files")
    assert(schemaOf(dir)("v").dataType == LongType)
    // a value only a long can hold appends through the widened schema
    Seq(3000000000L).toDF("v").withColumn("id", lit(77L))
      .write.format("lance").mode("append").save(dir)
    val got = spark.read.format("lance").load(dir)
      .select("v").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L, 1000L, 3000000000L))
  }

  test("every lattice transition round-trips; on the row-based reader too") {
    // (from ddl, to ddl, seed ddl-literals, post-widen value as string)
    val cases = Seq(
      ("tinyint", "smallint", Seq("1", "-7"), "300"),
      ("smallint", "int", Seq("5", "-300"), "70000"),
      ("int", "long", Seq("42", "-1"), "3000000000"),
      ("tinyint", "long", Seq("3"), "3000000000"),
      ("int", "double", Seq("42", "-1"), "0.5"),
      ("float", "double", Seq("1.5", "-2.25"), "3.125"),
      ("int", "decimal(10,0)", Seq("42"), "2000000000"),
      ("long", "decimal(20,0)", Seq("42"), "9300000000000000000"),
      ("decimal(9,2)", "decimal(19,2)", Seq("12.34"), "12345678901234567.89"))
    for ((from, to, seeds, wide) <- cases) {
      val dir = tmpDir()
      val seedSql = seeds.map(s => s"(CAST($s AS $from))").mkString(", ")
      spark.sql(s"SELECT CAST(col1 AS $from) AS v FROM VALUES $seedSql")
        .write.format("lance").mode("overwrite").save(dir)
      Lance.widenColumnType(spark, dir, "v", to)
      spark.sql(s"SELECT CAST($wide AS $to) AS v")
        .write.format("lance").mode("append").save(dir)
      val expect = (seeds.map(s =>
        spark.sql(s"SELECT CAST(CAST($s AS $from) AS $to) AS v")
          .head.get(0).toString) :+
        spark.sql(s"SELECT CAST($wide AS $to) AS v").head.get(0).toString)
        .sorted
      def readBack(): Seq[String] = spark.read.format("lance").load(dir)
        .select("v").collect().map(_.get(0).toString).toSeq.sorted
      assert(readBack() == expect, s"$from -> $to (vectorized)")
      spark.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
      try assert(readBack() == expect, s"$from -> $to (row-based)")
      finally spark.conf.set("spark.sql.parquet.enableVectorizedReader", "true")
    }
  }

  test("filters and stats pruning work on the widened column over old fragments") {
    val dir = tmpDir()
    // two fragments with disjoint ranges, written as INT
    spark.range(0, 100).select(col("id").cast("int").as("v"), col("id"))
      .coalesce(1).write.format("lance").mode("overwrite").save(dir)
    spark.range(1000, 1100).select(col("id").cast("int").as("v"), col("id"))
      .coalesce(1).write.format("lance").mode("append").save(dir)
    Lance.widenColumnType(spark, dir, "v", LongType)
    val q = spark.read.format("lance").load(dir).filter(col("v") === 1050L)
    assert(q.count() == 1)
    // manifest stats (recorded as int strings) still prune for long probes
    val m = LanceFormat.readLatest(fs(dir), new Path(dir)).get
    val kept = graft.format.FragmentStats.prune(m.physicalSchema, m.fragments,
      Array(org.apache.spark.sql.sources.EqualTo("v", 1050L)))
    assert(kept.size == 1, s"expected 1 pruned-in fragment, got ${kept.size}")
  }

  test("non-widening transitions refuse; index sidecar on the column refuses") {
    val dir = tmpDir()
    Seq((1L, 1.5f, "a")).toDF("id", "f", "s")
      .write.format("lance").mode("overwrite").save(dir)
    def refuse(col: String, to: String): Unit = {
      val e = intercept[IllegalArgumentException](
        Lance.widenColumnType(spark, dir, col, to))
      assert(e.getMessage.contains("value-preserving"), e.getMessage)
    }
    refuse("id", "int") // narrowing
    refuse("id", "double") // lossy past 2^53
    refuse("s", "long") // nonsense
    refuse("f", "decimal(20,10)") // binary fractions don't round-trip
    refuse("id", "bigint") // not a change
    intercept[IllegalArgumentException](
      Lance.widenColumnType(spark, dir, "missing", "long"))
    // decimal scale change refused even when precision grows
    val dir2 = tmpDir()
    spark.sql("SELECT CAST(1.25 AS DECIMAL(9,2)) AS d")
      .write.format("lance").mode("overwrite").save(dir2)
    intercept[IllegalArgumentException](
      Lance.widenColumnType(spark, dir2, "d", "decimal(12,3)"))
    // a scalar index's keys were rendered under the old type: refuse
    val dir3 = tmpDir()
    Seq((1, "x"), (2, "y")).toDF("k", "s")
      .write.format("lance").mode("overwrite").save(dir3)
    Lance.buildScalarIndex(spark, dir3, "k", numBuckets = 2)
    val e = intercept[IllegalArgumentException](
      Lance.widenColumnType(spark, dir3, "k", LongType))
    assert(e.getMessage.contains("sidecar"), e.getMessage)
  }

  test("a stale append cannot narrow the column back; rules survive the widen") {
    val dir = tmpDir()
    Seq((1, "a"), (2, "b")).toDF("k", "s")
      .write.format("lance").mode("overwrite").save(dir)
    Lance.addUniqueConstraint(spark, dir, "k")
    Lance.setNotNull(spark, dir, "k")
    Lance.widenColumnType(spark, dir, "k", LongType)
    val f = schemaOf(dir)("k")
    assert(f.dataType == LongType && !f.nullable)
    // stale writer: commits fragments under the PRE-widen schema — the
    // commit loop must keep the wider stored type
    val narrow = StructType(Seq(StructField("k", IntegerType),
      StructField("s", StringType)))
    LanceFormat.commitAppendIn(fs(dir), LanceFormat.versionsPath(new Path(dir)),
      narrow, Seq.empty)
    assert(schemaOf(dir)("k").dataType == LongType,
      "stale append must not narrow a widened column")
    // the UNIQUE rule still enforces across the widen boundary
    val dup = intercept[Exception](Seq((2L, "dup")).toDF("k", "s")
      .write.format("lance").mode("append").save(dir))
    assert(dup.getMessage != null)
    assert(spark.read.format("lance").load(dir).count() == 2)
  }

  test("narrower-compatible append lands without merge-schema; time travel serves the old type") {
    val dir = tmpDir()
    Seq(1, 2).toDF("v").write.format("lance").mode("overwrite").save(dir)
    Lance.widenColumnType(spark, dir, "v", LongType)
    // writer still producing INT rows: compatible, table schema wins
    Seq(3).toDF("v").write.format("lance").mode("append").save(dir)
    val ds = spark.read.format("lance").load(dir)
    assert(ds.schema("v").dataType == LongType)
    assert(ds.select("v").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // the pre-widen version still reads as INT
    val old = spark.read.format("lance").option("versionAsOf", "1").load(dir)
    assert(old.schema("v").dataType == IntegerType)
    assert(old.select("v").as[Int].collect().sorted.toSeq == Seq(1, 2))
  }

  test("SQL: ALTER TABLE ... ALTER COLUMN ... TYPE and CALL widen_column") {
    val wh = tmpDir()
    spark.conf.set("spark.sql.catalog.lance_wid", "graft.catalog.LanceCatalog")
    spark.conf.set("spark.sql.catalog.lance_wid.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE lance_wid.db")
      spark.sql("CREATE TABLE lance_wid.db.t (id INT, amount FLOAT) USING lance")
      spark.sql("INSERT INTO lance_wid.db.t VALUES (1, 1.5), (2, 2.5)")
      spark.sql("ALTER TABLE lance_wid.db.t ALTER COLUMN id TYPE BIGINT")
      spark.sql("INSERT INTO lance_wid.db.t VALUES (3000000000, 3.5)")
      assert(spark.sql("SELECT SUM(id) FROM lance_wid.db.t")
        .head.getLong(0) == 3000000003L)
      spark.sql("CALL lance_wid.widen_column('db.t', 'amount', 'double')")
      assert(spark.sql("SELECT CAST(SUM(amount) AS DECIMAL(10,1)) FROM lance_wid.db.t")
        .head.getDecimal(0).toPlainString == "7.5")
      // narrowing through SQL refuses too
      intercept[Exception](
        spark.sql("ALTER TABLE lance_wid.db.t ALTER COLUMN id TYPE INT"))
    } finally {
      spark.conf.unset("spark.sql.catalog.lance_wid")
      spark.conf.unset("spark.sql.catalog.lance_wid.warehouse")
    }
  }
}
