package graft

import graft.format.LanceFormat
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Nested types (struct / array<struct> / map) through the lance format
  * end to end. The reference's converter recursively supports Struct and
  * List (ref: converter/LanceTypeConverter.java:171-186,
  * converter/RowDataConverter.java:351-368); Spark's parquet machinery
  * handles nested natively — what needs PROVING is this repo's own
  * format machinery on a nested schema: fragment-stats collection skips
  * nested bounds gracefully (scalar siblings still prune), DML predicate
  * scoping over a nested field falls back to all-fragments without
  * wrongness, ALTER on a sibling works, rename/widen OF a nested column
  * refuse or work loudly, constraints on nested fields enforce, and the
  * meta TVFs don't choke. Real corpora carry nested metadata columns on
  * day one.
  */
class NestedTypesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "nested-")
      .toAbsolutePath.toString

  private def fs(dir: String) =
    LanceFormat.fileSystem(new Path(dir), spark.sessionState.newHadoopConf())

  private def manifest(dir: String) =
    LanceFormat.readLatest(fs(dir), new Path(dir)).get

  /** docs-shaped nested frame: struct meta, array<struct> spans, map attrs. */
  private def nestedDf(from: Int, until: Int) =
    spark.range(from, until).select(
      col("id"),
      struct(
        concat(lit("lang"), pmod(col("id"), lit(3))).as("lang"),
        (col("id") * 10).as("n_chars")).as("meta"),
      array(
        struct(lit(0L).as("start"), (col("id") * 5).as("end")),
        struct((col("id") * 5).as("start"), (col("id") * 10).as("end"))
      ).as("spans"),
      map(lit("source"), concat(lit("s"), pmod(col("id"), lit(2)))).as("attrs"))

  test("nested schema round-trips; scalar sibling stats still collected") {
    val dir = tmpDir()
    nestedDf(0, 100).write.format("lance").mode("overwrite").save(dir)
    val back = spark.read.format("lance").load(dir)
    assert(back.schema("meta").dataType.isInstanceOf[StructType])
    assert(back.count() == 100)
    // struct field access + map access + array-of-struct access all work
    val r = back.filter(col("meta.n_chars") >= 990)
      .select(col("id"), col("meta.lang"), col("attrs")("source").as("src"),
        col("spans")(1)("end").as("e")).collect()
    assert(r.map(_.getLong(0)).toSet == Set(99L))
    assert(r.head.getLong(3) == 990L)
    // fragment stats: the scalar sibling has bounds, nested columns are
    // skipped (absent from the stats map), never a crash or a lie
    val m = manifest(dir)
    val st = m.fragments.head.stats.get
    assert(st.contains("id"), s"scalar sibling lost its stats: ${st.keySet}")
    assert(!st.keys.exists(k => k == "meta" || k == "spans" || k == "attrs"),
      s"nested columns must not carry (meaningless) scalar bounds: ${st.keySet}")
  }

  test("filter on a scalar sibling still prunes fragments next to nested columns") {
    val dir = tmpDir()
    // 4 disjoint id-range fragments
    (0 until 4).foreach { f =>
      nestedDf(f * 100, f * 100 + 100).coalesce(1).write.format("lance")
        .mode(if (f == 0) "overwrite" else "append").save(dir)
    }
    val kept = graft.format.FragmentStats.prune(
      manifest(dir).physicalSchema, manifest(dir).fragments,
      Array(org.apache.spark.sql.sources.GreaterThan("id", 350L)))
    assert(kept.size == 1, s"expected 1 fragment kept, got ${kept.size}")
  }

  test("DML on a nested field: correct rows deleted, scoping degrades gracefully") {
    val dir = tmpDir()
    (0 until 4).foreach { f =>
      nestedDf(f * 100, f * 100 + 100).write.format("lance")
        .mode(if (f == 0) "overwrite" else "append").save(dir)
    }
    // nested leaves carry dotted-path fragment stats: the rewrite scopes
    // to the fragments that MAY hold matches, and deletes exactly the
    // right rows (each write above landed as parallel multi-fragment
    // batches, so candidates < total proves the pruning engaged)
    val res = Lance.deleteWhere(spark, dir, "meta.n_chars < 500")
    assert(res.rowsChanged == 50, s"deleted ${res.rowsChanged}")
    assert(res.candidateFragments < res.totalFragments,
      s"nested-leaf stats must scope the rewrite: $res")
    val back = spark.read.format("lance").load(dir)
    assert(back.count() == 350)
    assert(back.agg(min(col("meta.n_chars"))).head.getLong(0) == 500L)
    // UPDATE through a nested predicate, setting a top-level column
    val up = Lance.updateWhere(spark, dir, "meta.n_chars >= 3500",
      Map("id" -> "id + 100000"))
    assert(up.rowsChanged == 50)
    assert(back.filter(col("id") >= 100000L).count() == 50)
  }

  test("ALTER on a sibling column; old fragments read NULL for the add") {
    val dir = tmpDir()
    nestedDf(0, 50).write.format("lance").mode("overwrite").save(dir)
    nestedDf(50, 100).withColumn("rev", col("id"))
      .write.format("lance").option("write.merge-schema", "true")
      .mode("append").save(dir)
    val back = spark.read.format("lance").load(dir)
    assert(back.filter(col("rev").isNull).count() == 50)
    assert(back.filter(col("rev") === col("id")).count() == 50)
    // rename a SIBLING next to nested columns: fine
    Lance.renameColumn(spark, dir, "rev", "revision")
    assert(spark.read.format("lance").load(dir)
      .filter(col("revision").isNotNull).count() == 50)
  }

  test("schema surgery OF nested columns: rename works, widen refuses loudly") {
    val dir = tmpDir()
    nestedDf(0, 20).write.format("lance").mode("overwrite").save(dir)
    // renaming the nested column itself is a top-level rename: allowed
    Lance.renameColumn(spark, dir, "attrs", "attributes")
    val back = spark.read.format("lance").load(dir)
    assert(back.select(col("attributes")("source")).count() == 20)
    // widening a nested column is not a scalar lattice transition: refuse
    val e = intercept[Exception] {
      Lance.widenColumnType(spark, dir, "meta", DoubleType)
    }
    assert(e.getMessage != null)
  }

  test("CHECK constraint on a nested field enforces on write") {
    val dir = tmpDir()
    nestedDf(0, 20).write.format("lance").mode("overwrite").save(dir)
    Lance.addConstraint(spark, dir, "chars_nonneg", "meta.n_chars >= 0")
    // clean batch passes
    nestedDf(20, 30).write.format("lance").mode("append").save(dir)
    assert(spark.read.format("lance").load(dir).count() == 30)
    // violating batch refuses and leaves no partial state
    val bad = spark.range(0, 5).select(
      col("id"),
      struct(lit("xx").as("lang"), lit(-1L).as("n_chars")).as("meta"),
      array(struct(lit(0L).as("start"), lit(1L).as("end")),
        struct(lit(1L).as("start"), lit(2L).as("end"))).as("spans"),
      map(lit("source"), lit("s0")).as("attrs"))
    intercept[Exception] { bad.write.format("lance").mode("append").save(dir) }
    assert(spark.read.format("lance").load(dir).count() == 30)
  }

  test("meta TVFs serve a nested table without choking") {
    val dir = tmpDir()
    nestedDf(0, 40).write.format("lance").mode("overwrite").save(dir)
    graft.MetaTvfs.register(spark)
    val stats = spark.sql(s"SELECT * FROM lance_stats('$dir')")
    assert(stats.count() >= 1)
    val frags = spark.sql(s"SELECT * FROM lance_fragments('$dir')")
    assert(frags.count() >= 1)
    // ANALYZE skips non-eligible nested columns instead of crashing
    val ndv = Lance.analyze(spark, dir)
    assert(ndv.contains("id") && !ndv.contains("meta"))
  }
}
