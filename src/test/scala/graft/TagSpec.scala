package graft

import graft.format.LanceFormat
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Named snapshot tags: stable names for committed versions
  * (Lance/Iceberg tags). Contracts pinned here:
  *  - create/resolve/list/delete lifecycle, atomic-if-absent creation
  *  - `tagAsOf` reads, mutually exclusive with the other travel options
  *  - vacuum PINS tagged versions (manifest + every referenced fragment)
  *  - SQL surface: `lance_tags` TVF, `CALL tag` / `CALL untag`
  */
class TagSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "tags-")
      .toAbsolutePath.toString

  private def fsRoot(dir: String) = {
    val root = new Path(dir)
    (LanceFormat.fileSystem(root, spark.sessionState.newHadoopConf()), root)
  }

  test("tag lifecycle: create, resolve, list, replace, delete") {
    val dir = tmpDir()
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.format("lance").mode("overwrite").save(dir)
    Seq((3L, "c")).toDF("id", "s")
      .write.format("lance").mode("append").save(dir)
    val (fs, root) = fsRoot(dir)
    // default = latest; explicit version; list is name-sorted
    assert(Lance.tag(spark, dir, "stable") == 2L)
    assert(Lance.tag(spark, dir, "base", version = Some(1L)) == 1L)
    assert(Lance.tags(spark, dir).map(t => (t.name, t.version)) ==
      Seq(("base", 1L), ("stable", 2L)))
    // duplicate fails loud; replace moves it
    val dup = intercept[IllegalArgumentException](Lance.tag(spark, dir, "base"))
    assert(dup.getMessage.contains("already exists"))
    assert(Lance.tag(spark, dir, "base", replace = true) == 2L)
    assert(LanceFormat.readTag(fs, root, "base").get.version == 2L)
    // bad names / versions fail loud
    intercept[IllegalArgumentException](Lance.tag(spark, dir, "no/slash"))
    intercept[IllegalArgumentException](Lance.tag(spark, dir, ".dot"))
    intercept[IllegalArgumentException](Lance.tag(spark, dir, "v9", Some(99L)))
    // delete: true once, false after
    assert(Lance.deleteTag(spark, dir, "base"))
    assert(!Lance.deleteTag(spark, dir, "base"))
    assert(Lance.tags(spark, dir).map(_.name) == Seq("stable"))
  }

  test("tagAsOf reads the pinned snapshot; exclusive with other travel") {
    val dir = tmpDir()
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.format("lance").mode("overwrite").save(dir)
    Lance.tag(spark, dir, "v1")
    Seq((3L, "c")).toDF("id", "s")
      .write.format("lance").mode("append").save(dir)
    val tagged = spark.read.format("lance").option("tagAsOf", "v1").load(dir)
    assert(tagged.count() == 2)
    assert(spark.read.format("lance").load(dir).count() == 3)
    val missing = intercept[Exception] {
      spark.read.format("lance").option("tagAsOf", "nope").load(dir).count()
    }
    assert(missing.getMessage.contains("no tag 'nope'"))
    val both = intercept[Exception] {
      spark.read.format("lance").option("tagAsOf", "v1")
        .option("versionAsOf", "1").load(dir).count()
    }
    assert(both.getMessage.contains("only one of"))
  }

  test("vacuum pins tagged versions and their fragment files") {
    val dir = tmpDir()
    // v1: two fragments; DELETE rewrites one of them at v2; more appends
    (0L until 100L).map(i => (i, s"n$i")).toDF("id", "s")
      .repartitionByRange(2, col("id"))
      .write.format("lance").mode("overwrite").save(dir)
    Lance.tag(spark, dir, "pinned")
    assert(Lance.deleteWhere(spark, dir, "id = 7").rowsChanged == 1)
    Seq((200L, "x")).toDF("id", "s").write.format("lance").mode("append").save(dir)
    val (fs, root) = fsRoot(dir)
    val before = LanceFormat.listVersions(fs, root)
    val (manifestsDropped, filesDropped) = Lance.vacuum(spark, dir, keepVersions = 1)
    // v2 (the delete) is neither latest nor tagged -> dropped; v1 pinned
    assert(manifestsDropped == before.size - 2,
      s"dropped $manifestsDropped of ${before.size}; expected all but latest+tagged")
    assert(LanceFormat.listVersions(fs, root).contains(1L))
    // the tagged snapshot still reads EXACTLY, including the fragment the
    // DML rewrite replaced (its pre-rewrite file must have been retained)
    val tagged = spark.read.format("lance").option("tagAsOf", "pinned").load(dir)
    assert(tagged.count() == 100)
    assert(tagged.filter(col("id") === 7L).count() == 1)
    assert(spark.read.format("lance").load(dir).count() == 100) // 100 - 1 + 1
    // untag -> next vacuum really drops it
    assert(Lance.deleteTag(spark, dir, "pinned"))
    Lance.vacuum(spark, dir, keepVersions = 1)
    assert(!LanceFormat.listVersions(fs, root).contains(1L))
  }

  test("racing tag creators: exactly one winner, loser fails loud") {
    val dir = tmpDir()
    Seq((1L, "a")).toDF("id", "s").write.format("lance").mode("overwrite").save(dir)
    Seq((2L, "b")).toDF("id", "s").write.format("lance").mode("append").save(dir)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[String, Long]]()
    val barrier = new java.util.concurrent.CyclicBarrier(4)
    // four threads race the same name at DIFFERENT versions: the winner's
    // version must be what the tag resolves to afterwards
    val threads = (0 until 4).map { t =>
      new Thread(() => {
        barrier.await()
        try results.add(Right(Lance.tag(spark, dir, "raced",
          version = Some(1L + (t % 2)))))
        catch { case e: IllegalArgumentException => results.add(Left(e.getMessage)) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(60000))
    val (losers, winners) = results.toArray(Array.empty[Either[String, Long]])
      .partition(_.isLeft)
    assert(winners.length == 1, s"want exactly one winner, got $winners / $losers")
    assert(losers.length == 3 && losers.forall(_.left.exists(_.contains("already exists"))))
    val pinned = Lance.tags(spark, dir).find(_.name == "raced").get.version
    assert(pinned == winners.head.toOption.get,
      "the tag must resolve to the WINNER's version")
  }

  test("lance_tags TVF and CALL tag/untag procedures") {
    val wh = tmpDir()
    val s = spark
    s.conf.set("spark.sql.catalog.lance_tagp", "graft.catalog.LanceCatalog")
    s.conf.set("spark.sql.catalog.lance_tagp.warehouse", wh)
    try {
      s.sql("CREATE NAMESPACE lance_tagp.db")
      s.sql("CREATE TABLE lance_tagp.db.t (id BIGINT, v DOUBLE)")
      s.sql("INSERT INTO lance_tagp.db.t VALUES (1, 1.0), (2, 2.0)")
      val tagged = s.sql("CALL lance_tagp.tag('db.t', 'rel1')").collect().head
      val v = tagged.getLong(0)
      s.sql("INSERT INTO lance_tagp.db.t VALUES (3, 3.0)")
      graft.MetaTvfs.register(s)
      val path = s"$wh/db/t"
      val rows = s.sql(s"SELECT name, version, n_rows FROM lance_tags('$path')")
        .collect()
      assert(rows.length == 1)
      assert(rows.head.getString(0) == "rel1")
      assert(rows.head.getLong(1) == v)
      assert(rows.head.getLong(2) == 2L)
      // move it to latest, then drop it
      val moved =
        s.sql("CALL lance_tagp.tag('db.t', 'rel1', -1, true)").collect().head
      assert(moved.getLong(0) > v)
      assert(s.sql("CALL lance_tagp.untag('db.t', 'rel1')")
        .collect().head.getBoolean(0))
      assert(s.sql(s"SELECT * FROM lance_tags('$path')").collect().isEmpty)
    } finally {
      s.sql("DROP TABLE IF EXISTS lance_tagp.db.t")
      s.conf.unset("spark.sql.catalog.lance_tagp")
      s.conf.unset("spark.sql.catalog.lance_tagp.warehouse")
    }
  }
}
