package graft

import graft.format.LanceFormat
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Row-level change-data-feed images for DML (Delta CDF parity).
  *
  * Without images, a copy-on-write DML commit surfaces through
  * `lance_changes` / the streaming CDC mode as whole-fragment
  * delete+insert pairs — a 2-row update amplifies to 2M feed rows on a
  * 1M-row fragment, and a consumer cannot tell corrected rows from new
  * ones. With `spark.graft.dml.changeFeed=true`, the DML verbs stage
  * exact pre/post images (`delete` / `insert` / `update_preimage` /
  * `update_postimage`) as cdf files recorded in the commit's manifest,
  * and both feed surfaces serve those instead of the diff.
  *
  * Contracts pinned here: exact image rows per verb; feed-driven
  * replay reconstructs the table; fragment-diff behavior unchanged when
  * the flag is off; metadata commits never re-emit a prior commit's
  * images; retention (orphan sweep keeps cdf files, vacuum reclaims
  * them with their version).
  */
class CdfSpec extends AnyFunSuite {
  import TestSpark._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "cdf-")
      .toAbsolutePath.toString

  private def fs(dir: String) =
    LanceFormat.fileSystem(new Path(dir), spark.sessionState.newHadoopConf())

  private def withCdf[T](body: => T): T = {
    spark.conf.set("spark.graft.dml.changeFeed", "true")
    try body finally spark.conf.unset("spark.graft.dml.changeFeed")
  }

  private def seed(dir: String, n: Int = 100): Unit =
    spark.range(0, n).select(col("id"), (col("id") % 10).as("g"),
        concat(lit("v"), col("id")).as("s"))
      .coalesce(2).write.format("lance").mode("overwrite").save(dir)

  private def changes(dir: String, from: Long, to: Long): DataFrame = {
    graft.MetaTvfs.register(spark)
    spark.sql(s"SELECT * FROM lance_changes('$dir', $from, $to)")
  }

  test("DELETE emits exactly the deleted rows, not the fragment diff") {
    val dir = tmpDir()
    seed(dir)
    val v1 = LanceFormat.readLatest(fs(dir), new Path(dir)).get.version
    withCdf { Lance.deleteWhere(spark, dir, "id IN (7, 8, 9)") }
    val v2 = LanceFormat.readLatest(fs(dir), new Path(dir)).get.version
    val ch = changes(dir, v1, v2).collect()
    assert(ch.length == 3, s"want 3 delete images, got ${ch.length}")
    assert(ch.forall(_.getAs[String]("_change_type") == "delete"))
    assert(ch.map(_.getAs[Long]("id")).sorted.toSeq == Seq(7L, 8L, 9L))
    // the manifest records the change files with exact row accounting
    val m = LanceFormat.readLatest(fs(dir), new Path(dir)).get
    assert(m.changeFiles.exists(_.map(_.rows).sum == 3))
  }

  test("covered-fragment DELETE needs no cdf files: the diff IS exact") {
    val dir = tmpDir()
    // two disjoint fragments; delete one wholly by its id range
    spark.range(0, 50).select(col("id")).coalesce(1)
      .write.format("lance").mode("overwrite").save(dir)
    spark.range(50, 100).select(col("id")).coalesce(1)
      .write.format("lance").mode("append").save(dir)
    val v1 = LanceFormat.readLatest(fs(dir), new Path(dir)).get.version
    withCdf { Lance.deleteWhere(spark, dir, "id >= 50") }
    val v2 = LanceFormat.readLatest(fs(dir), new Path(dir)).get.version
    val m = LanceFormat.readLatest(fs(dir), new Path(dir)).get
    assert(m.changeFiles.isEmpty, "covered-only delete must not stage images")
    val ch = changes(dir, v1, v2).collect()
    assert(ch.length == 50 && ch.forall(_.getAs[String]("_change_type") == "delete"))
  }

  test("UPDATE emits matching pre/post images") {
    val dir = tmpDir()
    seed(dir)
    val v1 = LanceFormat.readLatest(fs(dir), new Path(dir)).get.version
    withCdf { Lance.updateWhere(spark, dir, "id < 5", Map("s" -> "concat(s, '!')")) }
    val v2 = LanceFormat.readLatest(fs(dir), new Path(dir)).get.version
    val ch = changes(dir, v1, v2).collect()
    val pre = ch.filter(_.getAs[String]("_change_type") == "update_preimage")
    val post = ch.filter(_.getAs[String]("_change_type") == "update_postimage")
    assert(pre.length == 5 && post.length == 5 && ch.length == 10)
    assert(pre.map(_.getAs[String]("s")).sorted.toSeq ==
      Seq("v0", "v1", "v2", "v3", "v4"))
    assert(post.map(_.getAs[String]("s")).sorted.toSeq ==
      Seq("v0!", "v1!", "v2!", "v3!", "v4!"))
  }

  test("MERGE emits update pre/post for matches and insert for the rest") {
    val dir = tmpDir()
    seed(dir, 20)
    val v1 = LanceFormat.readLatest(fs(dir), new Path(dir)).get.version
    val src = spark.range(18, 23).select(col("id"), lit(99L).as("g"),
      concat(lit("new"), col("id")).as("s"))
    withCdf { Lance.upsert(spark, dir, src, Seq("id")) }
    val v2 = LanceFormat.readLatest(fs(dir), new Path(dir)).get.version
    val ch = changes(dir, v1, v2).collect()
    val byKind = ch.groupBy(_.getAs[String]("_change_type"))
    assert(byKind("update_preimage").map(_.getAs[Long]("id")).sorted.toSeq ==
      Seq(18L, 19L))
    assert(byKind("update_postimage").map(_.getAs[Long]("id")).sorted.toSeq ==
      Seq(18L, 19L))
    assert(byKind("update_postimage").forall(_.getAs[Long]("g") == 99L))
    assert(byKind("insert").map(_.getAs[Long]("id")).sorted.toSeq ==
      Seq(20L, 21L, 22L))
  }

  test("replay from the feed reconstructs the table across mixed DML") {
    val dir = tmpDir()
    seed(dir)
    val v0 = LanceFormat.readLatest(fs(dir), new Path(dir)).get.version
    withCdf {
      Lance.deleteWhere(spark, dir, "id % 10 = 3")
      Lance.updateWhere(spark, dir, "id % 10 = 4", Map("g" -> "g + 100"))
      val src = spark.range(98, 105).select(col("id"), lit(7L).as("g"),
        concat(lit("m"), col("id")).as("s"))
      Lance.upsert(spark, dir, src, Seq("id"))
    }
    val vN = LanceFormat.readLatest(fs(dir), new Path(dir)).get.version
    val feed = changes(dir, v0, vN)
    val base = spark.read.format("lance")
      .option("versionAsOf", v0.toString).load(dir)
    // replay: removals are deletes + update/merge pre-images keyed by id;
    // additions are inserts + post-images. Applied IN COMMIT ORDER via
    // anti-join then union (ids are unique here, the common CDC shape).
    val removedKeys = feed.filter(col("_change_type")
        .isin("delete", "update_preimage")).select("id")
    val added = feed.filter(col("_change_type")
        .isin("insert", "update_postimage"))
      .select("id", "g", "s")
    val reconstructed = base.join(removedKeys, Seq("id"), "left_anti")
      .unionByName(added)
    val now = spark.read.format("lance").load(dir).select("id", "g", "s")
    assert(reconstructed.exceptAll(now).isEmpty && now.exceptAll(reconstructed).isEmpty,
      "feed replay must reconstruct the current table")
  }

  test("flag off: fragment-diff behavior unchanged (no cdf files staged)") {
    val dir = tmpDir()
    seed(dir)
    Lance.deleteWhere(spark, dir, "id IN (7, 8, 9)")
    val m = LanceFormat.readLatest(fs(dir), new Path(dir)).get
    assert(m.changeFiles.isEmpty)
    val dataFiles = fs(dir).listStatus(LanceFormat.dataPath(new Path(dir)))
      .map(_.getPath.getName)
    assert(!dataFiles.exists(_.startsWith("cdf-")))
  }

  test("metadata commits never re-emit a prior commit's images") {
    val dir = tmpDir()
    seed(dir)
    val v1 = LanceFormat.readLatest(fs(dir), new Path(dir)).get.version
    withCdf { Lance.deleteWhere(spark, dir, "id = 7") }
    Lance.renameColumn(spark, dir, "s", "txt")
    val vN = LanceFormat.readLatest(fs(dir), new Path(dir)).get
    assert(vN.operation.contains("alter") && vN.changeFiles.isEmpty,
      "prev.copy metadata commits must clear changeFiles")
    // the feed over the whole range holds exactly one delete image
    val ch = changes(dir, v1, vN.version).collect()
    assert(ch.count(_.getAs[String]("_change_type") == "delete") == 1)
  }

  test("streaming CDC mode serves the row-level images") {
    val dir = tmpDir()
    seed(dir)
    withCdf { Lance.updateWhere(spark, dir, "id = 7", Map("g" -> "77")) }
    val out = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "cdf-sink-").toAbsolutePath
    val q = spark.readStream.format("lance")
      .option("read.change-feed", "true").load(dir)
      .writeStream.format("memory").queryName("cdf_stream")
      .option("checkpointLocation", s"$out/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val rows = spark.table("cdf_stream")
    // snapshot (100 inserts) + 1 pre + 1 post — never a whole-fragment
    // delete+insert pair for the update commit
    val byKind = rows.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind("update_preimage") == 1 && byKind("update_postimage") == 1,
      byKind.toString)
    assert(byKind.get("delete").isEmpty, byKind.toString)
    assert(byKind("insert") == 100, byKind.toString)
  }

  test("retention: orphan sweep keeps cdf files; vacuum reclaims with the version") {
    val dir = tmpDir()
    seed(dir)
    withCdf { Lance.deleteWhere(spark, dir, "id IN (1, 2)") }
    def cdfFiles() = fs(dir).listStatus(LanceFormat.dataPath(new Path(dir)))
      .map(_.getPath.getName).filter(_.startsWith("cdf-")).toSeq
    assert(cdfFiles().nonEmpty)
    Lance.removeOrphans(spark, dir, graceMinutes = 0)
    assert(cdfFiles().nonEmpty, "referenced cdf files must survive the orphan sweep")
    // another commit, then vacuum to latest-only: the DML version drops
    // and its images go with it
    spark.range(200, 210).select(col("id"), lit(0L).as("g"), lit("x").as("s"))
      .write.format("lance").mode("append").save(dir)
    Lance.vacuum(spark, dir, keepVersions = 1)
    assert(cdfFiles().isEmpty, "vacuum must reclaim images with their version")
  }
}
