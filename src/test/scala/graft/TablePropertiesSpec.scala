package graft

import graft.format.LanceFormat
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Free-form table properties (Delta TBLPROPERTIES shape). Contracts:
  *  - set / merge / unset lifecycle as metadata commits
  *  - reserved namespaces (`lance.*` / `graft.*`) refused in the facade
  *  - properties survive every commit kind: append, overwrite, DML
  *    replace, ALTER, compaction; restore returns the TARGET's map and
  *    clone copies the source's
  *  - `write.set-properties` lands the mutation IN a data commit (one
  *    manifest: the atomicity the MV refresh watermark rides on), and
  *    null-valued keys unset
  *  - SHOW TBLPROPERTIES surfaces user keys verbatim
  */
class TablePropertiesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "props-")
      .toAbsolutePath.toString

  private def manifest(dir: String) = {
    val root = new Path(dir)
    val fs = LanceFormat.fileSystem(root, spark.sessionState.newHadoopConf())
    LanceFormat.readLatest(fs, root).get
  }

  test("set / merge / unset lifecycle; reserved namespaces refused") {
    val dir = tmpDir()
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.format("lance").mode("overwrite").save(dir)
    val v1 = Lance.setProperties(spark, dir, Map("owner" -> "data-eng", "tier" -> "gold"))
    assert(Lance.tableProperties(spark, dir) ==
      Map("owner" -> "data-eng", "tier" -> "gold"))
    // merge overwrites only the named key
    val v2 = Lance.setProperties(spark, dir, Map("tier" -> "silver"))
    assert(v2 == v1 + 1)
    assert(Lance.tableProperties(spark, dir) ==
      Map("owner" -> "data-eng", "tier" -> "silver"))
    // unset removes; missing keys are a no-op within the commit
    Lance.unsetProperties(spark, dir, Seq("tier", "never-set"))
    assert(Lance.tableProperties(spark, dir) == Map("owner" -> "data-eng"))
    // reserved namespaces fail loud, nothing committed
    intercept[IllegalArgumentException](
      Lance.setProperties(spark, dir, Map("lance.version" -> "9")))
    intercept[IllegalArgumentException](
      Lance.setProperties(spark, dir, Map("graft.mv.source" -> "x")))
    intercept[IllegalArgumentException](
      Lance.unsetProperties(spark, dir, Seq("lance.cluster-by")))
    intercept[IllegalArgumentException](
      Lance.setProperties(spark, dir, Map("k" -> null)))
    assert(Lance.tableProperties(spark, dir) == Map("owner" -> "data-eng"))
  }

  test("properties survive append, overwrite, DML, ALTER, compaction") {
    val dir = tmpDir()
    (1L to 40L).map(i => (i, s"r$i")).toDF("id", "s")
      .repartition(4).write.format("lance").mode("overwrite").save(dir)
    Lance.setProperties(spark, dir, Map("owner" -> "data-eng"))
    Seq((100L, "x")).toDF("id", "s").write.format("lance").mode("append").save(dir)
    assert(manifest(dir).properties.get == Map("owner" -> "data-eng"))
    Lance.deleteWhere(spark, dir, "id = 7")
    assert(manifest(dir).properties.get == Map("owner" -> "data-eng"))
    Lance.addColumn(spark, dir, "extra", org.apache.spark.sql.types.StringType)
    assert(manifest(dir).properties.get == Map("owner" -> "data-eng"))
    Lance.compact(spark, dir)
    assert(manifest(dir).properties.get == Map("owner" -> "data-eng"))
    (1L to 5L).map(i => (i, s"o$i", "e")).toDF("id", "s", "extra")
      .write.format("lance").mode("overwrite").save(dir)
    assert(manifest(dir).properties.get == Map("owner" -> "data-eng"))
  }

  test("restore returns the target's map; clone copies the source's") {
    val dir = tmpDir()
    Seq((1L, "a")).toDF("id", "s").write.format("lance").mode("overwrite").save(dir)
    Lance.setProperties(spark, dir, Map("phase" -> "raw"))
    val vRaw = manifest(dir).version
    Lance.setProperties(spark, dir, Map("phase" -> "curated"))
    // clone sees the live map
    val cl = tmpDir()
    Lance.cloneTable(spark, dir, cl)
    assert(Lance.tableProperties(spark, cl) == Map("phase" -> "curated"))
    // restore to the raw-phase version brings its properties back
    Lance.restore(spark, dir, vRaw)
    assert(Lance.tableProperties(spark, dir) == Map("phase" -> "raw"))
  }

  test("restore crosses metadata-only declaration changes (bloom/cluster specs)") {
    val dir = tmpDir()
    (1L to 20L).map(i => (i, s"v$i")).toDF("id", "s")
      .write.format("lance").mode("overwrite").save(dir)
    val vBare = manifest(dir).version
    Lance.setBloomFilters(spark, dir, Seq("id"))
    assert(Lance.bloomFilterColumns(spark, dir) == Seq("id"))
    // fragments and schema are UNCHANGED - only the declaration differs;
    // the already-that-state early return must still see the difference
    val (_, newV) = Lance.restore(spark, dir, vBare)
    assert(newV > vBare, "metadata-only restore must commit")
    assert(Lance.bloomFilterColumns(spark, dir).isEmpty,
      "restore must return to the pre-declaration state")
  }

  test("write.set-properties: mutation lands in the data commit; null unsets") {
    val dir = tmpDir()
    Seq((1L, "a")).toDF("id", "s").write.format("lance").mode("overwrite").save(dir)
    Lance.setProperties(spark, dir, Map("stale" -> "yes"))
    val before = manifest(dir).version
    Seq((2L, "b")).toDF("id", "s").write.format("lance").mode("append")
      .option("write.set-properties", LanceFormat.serializeProperties(
        Map("watermark" -> "42", "stale" -> null)))
      .save(dir)
    val m = manifest(dir)
    // ONE commit: data + property mutation atomically
    assert(m.version == before + 1)
    assert(m.fragments.map(_.rowCount).sum == 2L)
    assert(m.properties.get == Map("watermark" -> "42"))
  }

  test("table properties surface alongside the lance.* declarations") {
    val dir = tmpDir()
    Seq((1L, "a")).toDF("id", "s").write.format("lance").mode("overwrite").save(dir)
    Lance.setProperties(spark, dir, Map("owner" -> "data-eng"))
    val props = new graft.connector.LanceTable(dir, null).properties()
    assert(props.get("owner") == "data-eng")
    assert(props.containsKey("lance.version"))
  }
  test("write.ns-as-long: declares int64-ns columns; wrong types refuse") {
    val dir = tmpDir()
    Seq((1L, 1000000000123456789L, "a"), (2L, 1000000000123456790L, "b"))
      .toDF("id", "ts_ns", "s")
      .write.format("lance").option("write.ns-as-long", "ts_ns")
      .mode("overwrite").save(dir)
    assert(Lance.nsColumns(spark, dir) == Seq("ts_ns"))
    // lossless by default; µs cast only through the opt-in reader
    val back = spark.read.format("lance").load(dir)
    assert(back.schema("ts_ns").dataType == org.apache.spark.sql.types.LongType)
    assert(back.orderBy("id").collect().map(_.getLong(1)).toSeq ==
      Seq(1000000000123456789L, 1000000000123456790L))
    val cast = Lance.readNsAsTimestamp(spark, dir)
    assert(cast.schema("ts_ns").dataType ==
      org.apache.spark.sql.types.TimestampType)
    // both sub-µs values truncate to the same containing microsecond
    assert(cast.select("ts_ns").distinct().count() == 1L)
    // a non-long column refuses loud
    val e = intercept[Exception](
      Seq((1L, "x")).toDF("id", "s").write.format("lance")
        .option("write.ns-as-long", "s").mode("append").save(dir))
    assert(Seq(e.getMessage,
      Option(e.getCause).map(_.getMessage).getOrElse(""))
      .mkString.contains("int64"), e.getMessage)
    // a missing column refuses loud
    val e2 = intercept[Exception](
      Seq((1L, 2L)).toDF("id", "nope_src").write.format("lance")
        .option("write.ns-as-long", "nope").mode("append").save(dir))
    assert(Seq(e2.getMessage,
      Option(e2.getCause).map(_.getMessage).getOrElse(""))
      .mkString.contains("not a column"), e2.getMessage)
  }

  test("readNsAsTimestamp resolves dotted and backtick column names literally") {
    // the declared list names LITERAL columns; resolution must neither
    // split dots into struct parts nor choke on an embedded backtick
    val dir = tmpDir()
    Seq((1L, 1000000000123456789L, 1000000000123456789L))
      .toDF("id", "ts.ns", "ts`ns")
      .write.format("lance").option("write.ns-as-long", "ts.ns,ts`ns")
      .mode("overwrite").save(dir)
    val cast = Lance.readNsAsTimestamp(spark, dir)
    assert(cast.schema("ts.ns").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(cast.schema("ts`ns").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(cast.count() == 1L)
  }
}
