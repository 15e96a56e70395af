package graft

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class LanceStreamingReadSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "lstream-")
      .toAbsolutePath.toString

  test("readStream processes the snapshot then newly committed fragments") {
    val dir = s"${tmp()}/src"
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.format("lance").mode("append").save(dir)

    val q = spark.readStream.format("lance").load(dir)
      .writeStream.format("memory").queryName("lance_in")
      .option("checkpointLocation", s"${tmp()}/ckpt")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("lance_in").count() == 2)

      Seq((3L, "c")).toDF("id", "s").write.format("lance").mode("append").save(dir)
      q.processAllAvailable()
      assert(spark.table("lance_in").count() == 3)

      Seq((4L, "d"), (5L, "e")).toDF("id", "s")
        .write.format("lance").mode("append").save(dir)
      q.processAllAvailable()
      val got = spark.table("lance_in").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")))
    } finally q.stop()
  }

  test("offsets are manifest versions; restart resumes from checkpoint") {
    val dir = s"${tmp()}/src2"
    val ckpt = s"${tmp()}/ckpt2"
    Seq((1L, 1.0)).toDF("id", "v").write.format("lance").mode("append").save(dir)

    def run(sink: scala.collection.mutable.Set[Long]): Unit = {
      val q = spark.readStream.format("lance").load(dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => sink.synchronized { sink += r.getLong(0) })
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val first = scala.collection.mutable.Set.empty[Long]
    run(first)
    assert(first == Set(1L))

    // appended while the stream is down; restart must emit ONLY the delta
    Seq((2L, 2.0)).toDF("id", "v").write.format("lance").mode("append").save(dir)
    val second = scala.collection.mutable.Set.empty[Long]
    run(second)
    assert(second == Set(2L))
  }

  test("lance -> transform -> lance streaming pipeline is exactly-once") {
    val src = s"${tmp()}/src3"
    val dst = s"${tmp()}/dst3"
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .write.format("lance").mode("append").save(src)

    def run(): Unit = {
      val q = spark.readStream.format("lance").load(src)
        .selectExpr("id", "v * 2 AS v2")
        .writeStream.format("lance")
        .option("checkpointLocation", s"$src/_ckpt")
        .trigger(Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination()
    }
    run()
    assert(spark.read.format("lance").load(dst).count() == 2)

    Seq((3L, 30.0)).toDF("id", "v").write.format("lance").mode("append").save(src)
    run()
    val got = spark.read.format("lance").load(dst).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == Set((1L, 20.0), (2L, 40.0), (3L, 60.0)))
  }

  test("changefeed skips row-preserving compaction and resumes with only new appends") {
    val dir = s"${tmp()}/src5"
    val ckpt = s"${tmp()}/ckpt5"
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.format("lance").mode("append").save(dir)
    def run(sink: scala.collection.mutable.Set[Long]): Unit = {
      val q = spark.readStream.format("lance").load(dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => sink.synchronized { sink += r.getLong(0) })
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val first = scala.collection.mutable.Set.empty[Long]
    run(first) // snapshot processed
    assert(first == Set(1L, 2L))
    Lance.compact(spark, dir, maxRowsPerFile = 1000L) // rewrites fragments, keeps rows
    Seq((3L, "c")).toDF("id", "s").write.format("lance").mode("append").save(dir)
    Lance.compact(spark, dir, maxRowsPerFile = 1000L) // a second rewrite, last in range
    Seq((4L, "d")).toDF("id", "s").write.format("lance").mode("append").save(dir)
    val second = scala.collection.mutable.Set.empty[Long]
    run(second) // must skip both rewrites: only the appended rows, no dupes
    assert(second == Set(3L, 4L))
  }

  test("a row-CHANGING commit inside the streamed range fails loud, not duplicates") {
    val dir = s"${tmp()}/src6"
    val ckpt = s"${tmp()}/ckpt6"
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.format("lance").mode("append").save(dir)
    def run(): Unit = {
      val q = spark.readStream.format("lance").load(dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run() // snapshot processed
    // an overwrite REPLACES streamed rows — never skippable
    Seq((9L, "z")).toDF("id", "s").write.format("lance").mode("overwrite").save(dir)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] { run() }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).flatMap(c => Option(c.getMessage))
      .exists(_.contains("cannot flow through a changefeed")), e.getMessage)
  }

  test("change-feed stream emits delete/insert rows across a row-level update") {
    val dir = s"${tmp()}/cdcfeed"
    val ckpt = s"${tmp()}/cdcfeed-ckpt"
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1)
      .write.format("lance").mode("append").save(dir)
    def run(): Set[(String, Long, Long, String)] = {
      val got = scala.collection.mutable.Set.empty[(String, Long, Long, String)]
      val q = spark.readStream.format("lance")
        .option("read.change-feed", "true").load(dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("_change_type", "_commit_version", "id", "s").collect()
            .foreach(r => got.synchronized {
              got += ((r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
            })
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      got.toSet
    }
    assert(run() == Set(("insert", 1L, 1L, "a"), ("insert", 1L, 2L, "b")))
    // v2: copy-on-write UPDATE — the plain changefeed would fail loud
    // here; the CDC mode emits the fragment's pre- and post-image
    operators.Dml.updateWhere(spark, dir,
      org.apache.spark.sql.functions.col("id") === 2L,
      Seq("s" -> org.apache.spark.sql.functions.lit("B")))
    assert(run() == Set(
      ("delete", 2L, 1L, "a"), ("delete", 2L, 2L, "b"),
      ("insert", 2L, 1L, "a"), ("insert", 2L, 2L, "B")))
    // v3: row-preserving compaction is silent in CDC mode too (its
    // delete+insert pairs would be pure noise — no row changed)
    Lance.compact(spark, dir)
    assert(run() == Set.empty)
    // v4: append after the compaction flows as plain inserts
    Seq((3L, "c")).toDF("id", "s").coalesce(1)
      .write.format("lance").mode("append").save(dir)
    assert(run() == Set(("insert", 4L, 3L, "c")))
  }

  test("change-feed: meta-only projection and batch rejection") {
    val dir = s"${tmp()}/cdcfeed2"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s").coalesce(1)
      .write.format("lance").mode("append").save(dir)
    // projecting only the change-row columns counts rows without opening
    // data files (manifest rowCount drives the reader)
    val got = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val q = spark.readStream.format("lance")
      .option("read.change-feed", "true").load(dir)
      .select($"_change_type", $"_commit_version")
      .writeStream.option("checkpointLocation", s"${tmp()}/cdcfeed2-ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => got.synchronized {
          got += ((r.getString(0), r.getLong(1)))
        })
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(got.toSeq == Seq.fill(3)(("insert", 1L)))
    // a batch read of the mode points at the TVF instead
    val e = intercept[Exception] {
      spark.read.format("lance").option("read.change-feed", "true")
        .load(dir).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).flatMap(c => Option(c.getMessage))
      .exists(_.contains("lance_changes")), e)
  }

  test("read.since-version attaches mid-history: only later commits stream") {
    val dir = s"${tmp()}/sincev"
    (1 to 3).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "s").coalesce(1)
        .write.format("lance").mode("append").save(dir)
    }
    def run(opts: Map[String, String], ckpt: String): Seq[Long] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[Long]
      val reader = opts.foldLeft(spark.readStream.format("lance")) {
        case (r, (k, v)) => r.option(k, v)
      }
      val q = reader.load(dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("id").as[Long].collect()
            .foreach(v => got.synchronized { got += v })
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      got.toSeq.sorted
    }
    // plain stream: skip the snapshot, emit versions (1, 3]
    assert(run(Map("read.since-version" -> "1"), s"${tmp()}/sv-ckpt1") == Seq(2L, 3L))
    // CDC stream: same base semantics
    assert(run(Map("read.since-version" -> "2", "read.change-feed" -> "true"),
      s"${tmp()}/sv-ckpt2") == Seq(3L))
    // unknown base fails loud instead of silently snapshotting
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run(Map("read.since-version" -> "42"), s"${tmp()}/sv-ckpt3")
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).flatMap(c => Option(c.getMessage))
      .exists(_.contains("since-version")), e.getMessage)
  }

  test("streaming read prunes columns to the query projection") {
    val dir = s"${tmp()}/src4"
    Seq((1L, "x", 1.5)).toDF("id", "s", "v")
      .write.format("lance").mode("append").save(dir)
    val q = spark.readStream.format("lance").load(dir)
      .select($"id")
      .writeStream.format("memory").queryName("lance_prune")
      .option("checkpointLocation", s"${tmp()}/ckpt4").start()
    try {
      q.processAllAvailable()
      assert(spark.table("lance_prune").schema.fieldNames.toSeq == Seq("id"))
      assert(spark.table("lance_prune").count() == 1)
    } finally q.stop()
  }

  test("read.max-versions-per-batch throttles catch-up into per-version micro-batches") {
    val dir = s"${tmp()}/throttled"
    (1 to 3).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "s")
        .write.format("lance").mode("append").save(dir)
    }
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[Long])]()
    val q = spark.readStream.format("lance")
      .option("read.max-versions-per-batch", "1")
      .load(dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.add(id -> batch.select("id").as[Long].collect().toSeq.sorted)
        ()
      }
      .option("checkpointLocation", s"${tmp()}/ckpt-throttled")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val got = batches.asScala.toSeq.sortBy(_._1)
    // one micro-batch per manifest version, each carrying exactly that
    // version's fragments; unthrottled AvailableNow would take all 3 at once
    assert(got.map(_._2) == Seq(Seq(1L), Seq(2L), Seq(3L)),
      s"expected 3 single-version batches, got $got")
  }
}
