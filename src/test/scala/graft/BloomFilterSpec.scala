package graft

import graft.format.LanceFormat
import org.apache.hadoop.fs.Path
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Declared parquet bloom-filter columns ([[Lance.setBloomFilters]]):
  * every fragment written after the declaration carries an adaptive
  * per-row-group bloom filter the reader applies to pushed `=`/`IN`
  * probes — the skipping layer for high-cardinality point lookups where
  * min/max admits everything. Contracts pinned here:
  *  - declaration is one metadata commit; footers prove the filters on
  *    fragments written AFTER it, and compact() blooms the older ones
  *  - the filter actually ELIMINATES: bloom-ONLY row-group filtering
  *    (stats + dictionary disabled) drops every row group for an absent
  *    probe and keeps the present one's
  *  - point-lookup correctness is unchanged, filters or not
  *  - the declaration self-heals on DROP, remaps on RENAME, survives
  *    compaction, and surfaces in SHOW TBLPROPERTIES
  */
class BloomFilterSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "bloom-")
      .toAbsolutePath.toString

  private def fs(dir: String) =
    LanceFormat.fileSystem(new Path(dir), spark.sessionState.newHadoopConf())

  private def manifest(dir: String) =
    LanceFormat.readLatest(fs(dir), new Path(dir)).get

  /** Bloom-filter offsets for `col` per fragment file: one Boolean per
    * (fragment, row group). */
  private def bloomPresence(dir: String, col: String): Seq[(String, Boolean)] = {
    val conf = spark.sessionState.newHadoopConf()
    manifest(dir).fragments.map { f =>
      val p = LanceFormat.fragmentPath(new Path(dir), f.file)
      val r = ParquetFileReader.open(conf, p)
      try {
        val has = r.getRowGroups.asScala.forall(bg =>
          bg.getColumns.asScala.find(_.getPath.toDotString == col)
            .exists(_.getBloomFilterOffset >= 0))
        f.file -> has
      } finally r.close()
    }
  }

  // ~36-byte unique strings: the dictionary-page fallback threshold is
  // crossed, so parquet plain-encodes and ONLY the bloom filter can
  // prove absence (dictionary filtering would mask the test otherwise)
  private def docs(n: Int, from: Int = 0) =
    spark.range(from, from + n).select(
      concat(lit("doc-"), lpad(col("id").cast("string"), 24, "0"),
        lit("-suffix99")).as("doc_id"),
      col("id").as("v"))

  test("declaration + footers: new fragments bloom, compact blooms the rest") {
    val dir = tmpDir()
    docs(20000).coalesce(1).write.format("lance").mode("overwrite").save(dir)
    assert(bloomPresence(dir, "doc_id").forall(!_._2), "undeclared table has no filters")

    val v = Lance.setBloomFilters(spark, dir, Seq("doc_id"))
    assert(v == manifest(dir).version)
    assert(Lance.bloomFilterColumns(spark, dir) == Seq("doc_id"))

    docs(20000, from = 20000).coalesce(1)
      .write.format("lance").mode("append").save(dir)
    val presence = bloomPresence(dir, "doc_id").toMap
    val newFile = manifest(dir).fragments.maxBy(_.id).file
    assert(presence(newFile), "post-declaration fragment lacks a bloom filter")
    assert(presence.count(!_._2) >= 1, "pre-declaration fragment should lack one")

    // maintenance closes the gap: compact rewrites everything bloomed
    Lance.compact(spark, dir, maxRowsPerFile = 25000)
    assert(bloomPresence(dir, "doc_id").forall(_._2),
      "compact() must bloom every fragment")
    assert(spark.read.format("lance").load(dir).count() == 40000)
  }

  test("bloom-only row-group filtering eliminates absent probes") {
    val dir = tmpDir()
    docs(30000).coalesce(1).write.format("lance").mode("overwrite").save(dir)
    Lance.setBloomFilters(spark, dir, Seq("doc_id"))
    // rewrite so every fragment carries the filter
    Lance.compact(spark, dir, maxRowsPerFile = 40000)

    val conf = spark.sessionState.newHadoopConf()
    val present = "doc-000000000000000000012345-suffix99"
    val absentInRange = "doc-000000000000000000012345-suffix00" // inside min/max
    def filteredRows(probe: String): Long =
      manifest(dir).fragments.map { f =>
        val p = LanceFormat.fragmentPath(new Path(dir), f.file)
        val opts = org.apache.parquet.ParquetReadOptions.builder()
          .useStatsFilter(false)      // isolate the bloom filter:
          .useDictionaryFilter(false) // nothing else may prove absence
          .useColumnIndexFilter(false)
          .useBloomFilter(true)
          .withRecordFilter(FilterCompat.get(FilterApi.eq(
            FilterApi.binaryColumn("doc_id"), Binary.fromString(probe))))
          .build()
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf), opts)
        try r.getFilteredRecordCount finally r.close()
      }.sum
    assert(filteredRows(absentInRange) == 0L,
      "bloom filter failed to eliminate an absent probe's row groups")
    assert(filteredRows(present) > 0L,
      "bloom filter must keep the row group holding the probed value")

    // end to end through the scan: correctness unchanged
    assert(spark.read.format("lance").load(dir)
      .filter(col("doc_id") === present).count() == 1)
    assert(spark.read.format("lance").load(dir)
      .filter(col("doc_id") === absentInRange).count() == 0)
  }

  test("declaration lifecycle: clear, drop self-heal, rename remap, TBLPROPERTIES") {
    val dir = tmpDir()
    docs(100).write.format("lance").mode("overwrite").save(dir)
    Lance.setBloomFilters(spark, dir, Seq("doc_id", "v"))
    assert(Lance.bloomFilterColumns(spark, dir) == Seq("doc_id", "v"))

    // boolean columns refuse (parquet cannot bloom them) — the message
    // pins the TYPE check, not a missing-column error
    val bdir = tmpDir()
    spark.range(1).select(lit(true).as("b"))
      .write.format("lance").mode("overwrite").save(bdir)
    val e = intercept[IllegalArgumentException] {
      Lance.setBloomFilters(spark, bdir, Seq("b"))
    }
    assert(e.getMessage.contains("cannot carry a bloom"), e.getMessage)
    // and a missing column refuses with its own message
    intercept[IllegalArgumentException] {
      Lance.setBloomFilters(spark, dir, Seq("nope"))
    }

    // rename remaps the declaration
    Lance.renameColumn(spark, dir, "doc_id", "document_id")
    assert(Lance.bloomFilterColumns(spark, dir) == Seq("document_id", "v"))

    // TBLPROPERTIES surface
    val wh = tmpDir()
    spark.conf.set("spark.sql.catalog.lance_bf", "graft.catalog.LanceCatalog")
    spark.conf.set("spark.sql.catalog.lance_bf.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE lance_bf.db")
      val p = s"$wh/db/t"
      docs(50).write.format("lance").mode("overwrite").save(p)
      spark.sql(s"CALL lance_bf.system.set_bloom_filters('db.t', 'doc_id')")
      assert(Lance.bloomFilterColumns(spark, p) == Seq("doc_id"))
      val props = spark.sql("SHOW TBLPROPERTIES lance_bf.db.t")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("lance.bloom-filters").contains("doc_id"))
      // DROP self-heals the entry out (per-column independence)
      spark.sql("ALTER TABLE lance_bf.db.t ADD COLUMN extra INT")
      spark.sql(s"CALL lance_bf.system.set_bloom_filters('db.t', 'doc_id,extra')")
      spark.sql("ALTER TABLE lance_bf.db.t DROP COLUMN extra")
      assert(Lance.bloomFilterColumns(spark, p) == Seq("doc_id"))
    } finally {
      spark.conf.unset("spark.sql.catalog.lance_bf")
      spark.conf.unset("spark.sql.catalog.lance_bf.warehouse")
    }

    // clearing
    Lance.setBloomFilters(spark, dir, Seq.empty)
    assert(Lance.bloomFilterColumns(spark, dir).isEmpty)
  }

  test("the declaration survives restore and shallow clone") {
    val dir = tmpDir()
    docs(200).write.format("lance").mode("overwrite").save(dir)
    Lance.setBloomFilters(spark, dir, Seq("doc_id"))
    val declaredAt = LanceFormat.readLatest(fs(dir), new Path(dir)).get.version
    docs(50, from = 500).write.format("lance").mode("append").save(dir)
    // restore back to the declared state keeps the declaration
    Lance.restore(spark, dir, declaredAt)
    assert(Lance.bloomFilterColumns(spark, dir) == Seq("doc_id"))
    // a shallow clone inherits it: the clone's own appends keep blooming
    val dst = tmpDir() + "/clone"
    Lance.cloneTable(spark, dir, dst)
    assert(Lance.bloomFilterColumns(spark, dst) == Seq("doc_id"))
    docs(50, from = 900).coalesce(1)
      .write.format("lance").mode("append").save(dst)
    val newest = LanceFormat.readLatest(fs(dst), new Path(dst)).get
      .fragments.maxBy(_.id)
    assert(bloomPresence(dst, "doc_id").toMap.apply(newest.file),
      "clone-side append lost the bloom declaration")
  }
}
