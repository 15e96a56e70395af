package graft

import graft.format.LanceFormat
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Declared clustering maintenance (the Delta liquid-clustering posture):
  * [[Lance.cluster]] RECORDS its columns in the manifest, and every later
  * maintenance rewrite re-establishes that order instead of destroying
  * it. Contracts pinned here:
  *  - cluster() records the spec; appends carry it; clusterSpec() reads it
  *  - compact() on a spec'd table re-sorts EVERYTHING (including
  *    fragments appended unsorted since) — fragment ranges become
  *    disjoint again and stats pruning works
  *  - compactSmall() keeps the spec and z-sorts the bin-packed tail
  *  - RENAME COLUMN remaps the spec; DROP COLUMN self-heals it out
  *  - restore() carries the column mapping and cluster spec of the
  *    target version (regression: restoring across a rename used to drop
  *    the logical→physical mapping)
  */
class ClusterMaintSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "clspec-")
      .toAbsolutePath.toString

  private def fs(dir: String) =
    LanceFormat.fileSystem(new Path(dir), spark.sessionState.newHadoopConf())

  private def manifest(dir: String) =
    LanceFormat.readLatest(fs(dir), new Path(dir)).get

  test("cluster records the spec; appends carry it; compact re-establishes order") {
    val dir = tmpDir()
    // 3000 rows in shuffled order across two eras
    spark.range(0, 2000).select(
        (col("id") * 997 % 2000).as("v"), col("id"))
      .repartition(4)
      .write.format("lance").mode("overwrite").save(dir)
    Lance.cluster(spark, dir, Seq("v"), maxRowsPerFile = 700)
    assert(Lance.clusterSpec(spark, dir) == Seq("v"))
    // an unsorted append spoils the physical order but carries the spec
    spark.range(2000, 3000).select(
        (col("id") * 997 % 3000).as("v"), col("id"))
      .repartition(3)
      .write.format("lance").mode("append").save(dir)
    assert(Lance.clusterSpec(spark, dir) == Seq("v"))
    // compact: all rows re-sorted by the DECLARED spec, no cols argument
    Lance.compact(spark, dir, maxRowsPerFile = 800)
    val m = manifest(dir)
    assert(m.fragments.size >= 3, s"want >2 fragments, got ${m.fragments.size}")
    assert(m.clusterBy.contains(Seq("v")))
    // ranges disjoint again: a point probe prunes to one fragment
    val kept = graft.format.FragmentStats.prune(m.physicalSchema, m.fragments,
      Array(org.apache.spark.sql.sources.EqualTo("v", 1500L)))
    assert(kept.size == 1,
      s"clustered compact must prune a point probe to 1 fragment, got ${kept.size}")
    // and no row was lost or duplicated
    assert(spark.read.format("lance").load(dir).count() == 3000)
  }

  test("compactSmall keeps the spec; rename remaps; drop self-heals") {
    val dir = tmpDir()
    spark.range(0, 500).select(col("id").as("v"), col("id"), lit("x").as("s"))
      .coalesce(1).write.format("lance").mode("overwrite").save(dir)
    Lance.cluster(spark, dir, Seq("v"))
    // small-fragment tail
    Seq((9000L, 9000L, "y"), (9001L, 9001L, "y")).toDF("v", "id", "s")
      .coalesce(1).write.format("lance").mode("append").save(dir)
    Seq((9002L, 9002L, "y")).toDF("v", "id", "s")
      .coalesce(1).write.format("lance").mode("append").save(dir)
    Lance.compactSmall(spark, dir, minRows = 10)
    assert(Lance.clusterSpec(spark, dir) == Seq("v"))
    assert(spark.read.format("lance").load(dir).count() == 503)
    // rename remaps the spec
    Lance.renameColumn(spark, dir, "v", "key")
    assert(Lance.clusterSpec(spark, dir) == Seq("key"))
    // compact still works through the rename (logical name, physical files)
    Lance.compact(spark, dir, maxRowsPerFile = 1000)
    assert(Lance.clusterSpec(spark, dir) == Seq("key"))
    assert(spark.read.format("lance").load(dir).count() == 503)
    // dropping the clustered column self-heals the spec away
    val wh = tmpDir()
    spark.conf.set("spark.sql.catalog.lance_cl", "graft.catalog.LanceCatalog")
    spark.conf.set("spark.sql.catalog.lance_cl.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE lance_cl.db")
      val p = s"$wh/db/t"
      spark.range(0, 10).select(col("id").as("a"), col("id").as("b"))
        .write.format("lance").mode("overwrite").save(p)
      Lance.cluster(spark, p, Seq("a"))
      spark.sql("ALTER TABLE lance_cl.db.t DROP COLUMN a")
      assert(Lance.clusterSpec(spark, p).isEmpty)
      // a later compact neither fails nor resurrects the spec
      Lance.compact(spark, p)
      assert(Lance.clusterSpec(spark, p).isEmpty)
    } finally {
      spark.conf.unset("spark.sql.catalog.lance_cl")
      spark.conf.unset("spark.sql.catalog.lance_cl.warehouse")
    }
  }

  test("appends to a clustered table range-distribute by default: prunable before any compact") {
    val dir = tmpDir()
    spark.range(0, 4000).select(col("id").as("v"), col("id").as("x"))
      .coalesce(1).write.format("lance").mode("overwrite").save(dir)
    Lance.cluster(spark, dir, Seq("v"), maxRowsPerFile = 1000)
    // a SHUFFLED trickle append, nothing hand-laid: the engine-planned
    // range distribution (Iceberg's sorted-table posture) must land it
    // as disjoint, internally sorted fragments
    spark.range(4000, 8000).select(col("id").as("v"), col("id").as("x"))
      .orderBy(rand(7)) // adversarial input order
      .write.format("lance").mode("append")
      .option("write.max-rows-per-file", "1000").save(dir)
    val m = LanceFormat.readLatest(fs(dir), new Path(dir)).get
    val appended = m.fragments.filter(_.rowCount <= 1000)
    assert(appended.size >= 4, s"append should roll files, got ${appended.size}")
    // narrow range probe prunes MOST fragments without any compact
    val kept = graft.format.FragmentStats.prune(m.physicalSchema, m.fragments,
      Array(org.apache.spark.sql.sources.GreaterThanOrEqual("v", 6100L),
        org.apache.spark.sql.sources.LessThanOrEqual("v", 6200L)))
    assert(kept.size <= 2,
      s"range-distributed append not prunable: kept ${kept.size}/${m.fragments.size}")
    assert(spark.read.format("lance").load(dir)
      .filter(col("v").between(6100L, 6200L)).count() == 101)
    // a write MISSING the cluster column falls back gracefully (no
    // distribution requirement it cannot satisfy)
    spark.range(0, 5).select(col("id").as("x"))
      .write.format("lance").mode("append")
      .option("write.merge-schema", "true").save(dir)
    assert(spark.read.format("lance").load(dir).count() == 8005)
  }

  test("declarations surface in SHOW TBLPROPERTIES / DESCRIBE EXTENDED") {
    val wh = tmpDir()
    spark.conf.set("spark.sql.catalog.lance_pr", "graft.catalog.LanceCatalog")
    spark.conf.set("spark.sql.catalog.lance_pr.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE lance_pr.db")
      val p = s"$wh/db/t"
      Seq((1L, 2.0), (2L, 3.0)).toDF("id", "v")
        .write.format("lance").mode("overwrite").save(p)
      Lance.cluster(spark, p, Seq("id"))
      Lance.setNotNull(spark, p, "id")
      Lance.renameColumn(spark, p, "v", "price")
      val props = spark.sql("SHOW TBLPROPERTIES lance_pr.db.t")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("lance.cluster-by").contains("id"), props)
      assert(props.get("lance.constraint.not_null_id")
        .contains("`id` IS NOT NULL"), props)
      assert(props.get("lance.column-mapping").contains("price->v"), props)
      assert(props.contains("lance.version"), props)
    } finally {
      spark.conf.unset("spark.sql.catalog.lance_pr")
      spark.conf.unset("spark.sql.catalog.lance_pr.warehouse")
    }
  }

  test("an overwrite that drops the clustered column self-heals the spec") {
    val dir = tmpDir()
    spark.range(0, 10).select(col("id").as("a"), col("id").as("b"))
      .write.format("lance").mode("overwrite").save(dir)
    Lance.cluster(spark, dir, Seq("a"))
    assert(Lance.clusterSpec(spark, dir) == Seq("a"))
    // schema-changing overwrite: 'a' is gone, the spec must not dangle
    spark.range(0, 5).select(col("id").as("b"), col("id").as("c"))
      .write.format("lance").mode("overwrite").save(dir)
    assert(Lance.clusterSpec(spark, dir).isEmpty)
    Lance.compact(spark, dir) // neither fails nor resurrects
    assert(Lance.clusterSpec(spark, dir).isEmpty)
  }

  test("restore across a rename keeps the mapping and the cluster spec") {
    val dir = tmpDir()
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .write.format("lance").mode("overwrite").save(dir) // v1
    Lance.cluster(spark, dir, Seq("id")) // v2 (rewrite) + v3 (spec)
    Lance.renameColumn(spark, dir, "v", "price") // v4
    val target = manifest(dir).version
    Seq((3L, 30.0)).toDF("id", "price")
      .write.format("lance").mode("append").save(dir) // v5
    Lance.restore(spark, dir, target)
    val m = manifest(dir)
    assert(m.mapping == Map("price" -> "v"),
      s"restore must carry the target's column mapping, got ${m.mapping}")
    assert(m.clusterBy.contains(Seq("id")))
    // the restored state reads through the renamed name with values intact
    val rows = spark.read.format("lance").load(dir)
      .orderBy("id").select("id", "price")
      .as[(Long, Double)].collect().toSeq
    assert(rows == Seq((1L, 10.0), (2L, 20.0)))
  }
}
