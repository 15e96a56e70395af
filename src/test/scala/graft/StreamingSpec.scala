package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.Timestamp

class StreamingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def tmp(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "stream-")
      .toAbsolutePath.toString

  test("event-time tumbling window with watermark finalizes windows") {
    val in = MemoryStream[(Timestamp, String, Double)](spark)
    val df = in.toDF().toDF("ts", "event_type", "value")
    val q = StreamingOps.windowedCounts(df, "ts", "event_type",
        window_ = "5 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      in.addData((ts(0), "a", 1.0), (ts(1), "a", 2.0), (ts(2), "b", 3.0))
      q.processAllAvailable()
      // watermark not advanced past window end yet -> nothing finalized
      assert(spark.table("win_out").count() == 0)
      // an event far in the future advances the watermark, closing 10:00-10:05
      in.addData((ts(30), "a", 9.0))
      q.processAllAvailable()
      val rows = spark.table("win_out").orderBy("event_type").collect()
      assert(rows.length == 2)
      assert(rows.map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"))).toSeq ==
        Seq(("a", 2L), ("b", 1L)))
      // late data older than the watermark is dropped silently
      in.addData((ts(1), "a", 100.0), (ts(31), "z", 0.0))
      q.processAllAvailable()
      val aRows = spark.table("win_out")
        .filter($"event_type" === "a" && $"win_start" === ts(0)).collect()
      assert(aRows.length == 1 && aRows.head.getAs[Long]("n") == 2L)
    } finally q.stop()
  }

  test("sliding windows assign each event to every overlapping window") {
    val in = MemoryStream[(Timestamp, String, Double)](spark)
    val df = in.toDF().toDF("ts", "event_type", "value")
    val q = StreamingOps.windowedCounts(df, "ts", "event_type",
        window_ = "10 minutes", slide = Some("5 minutes"), watermark = "5 minutes")
      .writeStream.format("memory").queryName("slide_out")
      .outputMode("append").start()
    try {
      // one event at 10:07 belongs to [10:00,10:10) and [10:05,10:15)
      in.addData((ts(7), "a", 1.0))
      in.addData((ts(45), "z", 0.0)) // advance the watermark past both
      q.processAllAvailable()
      val wins = spark.table("slide_out").filter($"event_type" === "a")
        .orderBy("win_start").collect()
        .map(r => (r.getAs[Timestamp]("win_start"), r.getAs[Long]("n"))).toSeq
      assert(wins == Seq((ts(0), 1L), (ts(5), 1L)), wins)
    } finally q.stop()
  }

  test("session windows merge events within the gap") {
    val in = MemoryStream[(Timestamp, Long)](spark)
    val df = in.toDF().toDF("ts", "user_id")
    val q = StreamingOps.sessionized(df, "ts", "user_id",
        gap = "5 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // user 1: events at 10:00, 10:03 (one session), 10:20 (a second one)
      in.addData((ts(0), 1L), (ts(3), 1L), (ts(20), 1L))
      in.addData((ts(59), 99L)) // advance watermark
      q.processAllAvailable()
      val sessions = spark.table("sess_out").filter($"user_id" === 1)
        .orderBy("sess_start").collect()
      assert(sessions.length == 2, sessions.mkString(","))
      assert(sessions.head.getAs[Long]("n_events") == 2L)
      assert(sessions(1).getAs[Long]("n_events") == 1L)
    } finally q.stop()
  }

  test("streaming dedup emits each id once within the watermark") {
    val in = MemoryStream[(Timestamp, Long, String)](spark)
    val df = in.toDF().toDF("ts", "event_id", "payload")
    val q = StreamingOps.dedupStream(df, "ts", "event_id")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      in.addData((ts(0), 1L, "a"), (ts(1), 1L, "dup"), (ts(2), 2L, "b"))
      q.processAllAvailable()
      in.addData((ts(3), 1L, "dup2"), (ts(4), 3L, "c"))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-stream interval join matches clicks to purchases in-horizon only") {
    val clicks = MemoryStream[(Long, Long, Timestamp)](spark)
    val purchases = MemoryStream[(Long, Long, Timestamp)](spark)
    val cdf = clicks.toDF().toDF("event_id", "user_id", "ts")
    val pdf = purchases.toDF().toDF("event_id", "user_id", "ts")
    val q = StreamingOps.intervalJoin(cdf, pdf, horizon = "1 hour")
      .writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    try {
      // user 1: click 10:00 -> purchase 10:30 (in) and 11:30 (out, >1h)
      // user 2: purchase 10:10 with no prior click (click arrives later)
      clicks.addData((100L, 1L, ts(0)), (101L, 2L, Timestamp.valueOf("2024-01-01 10:20:00")))
      purchases.addData(
        (200L, 1L, ts(30)),
        (201L, 1L, Timestamp.valueOf("2024-01-01 11:30:00")),
        (202L, 2L, ts(10)))
      q.processAllAvailable()
      val got = spark.table("ij_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // (100,200): 30 min gap; purchase 201 is beyond the horizon;
      // purchase 202 precedes user 2's click — an interval join is
      // direction-bounded, not symmetric
      assert(got == Set((100L, 200L, 1800000000L)), got)
    } finally q.stop()
  }

  test("flatMapGroupsWithState tracks per-user running counts") {
    val in = MemoryStream[(Long, Long)](spark)
    val q = StreamingOps.userActivity(in.toDS())
      .writeStream.format("memory").queryName("state_out")
      .outputMode("append").start()
    try {
      in.addData((1L, 1000L), (1L, 3000L), (2L, 1000L))
      q.processAllAvailable()
      in.addData((1L, 9000L))
      q.processAllAvailable()
      val rows = spark.table("state_out").orderBy("user_id", "n_events").collect()
      val u1 = rows.filter(_.getAs[Long]("user_id") == 1L)
      assert(u1.map(_.getAs[Long]("n_events")).toSeq == Seq(1L, 2L, 3L))
      assert(u1.map(_.getAs[Long]("gap_ms")).toSeq == Seq(0L, 2000L, 6000L))
    } finally q.stop()
  }

  test("windowed aggregate streams into a lance dataset exactly once") {
    val dest = s"${tmp()}/win_lance"
    val ckpt = s"${tmp()}/ckpt"
    val in = MemoryStream[(Timestamp, String, Double)](spark)
    val df = in.toDF().toDF("ts", "event_type", "value")
    val q = StreamingOps.windowedCounts(df, "ts", "event_type",
        window_ = "5 minutes", watermark = "5 minutes")
      .writeStream.format("lance")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start(dest)
    try {
      in.addData((ts(0), "a", 1.0), (ts(1), "a", 2.0))
      q.processAllAvailable()
      in.addData((ts(30), "b", 1.0))
      q.processAllAvailable()
      val out = spark.read.format("lance").load(dest)
      assert(out.count() == 1)
      assert(out.collect().head.getAs[Long]("n") == 2L)
    } finally q.stop()
  }

  test("rate -> lance pipeline runs and commits epochs (F7 demo parity)") {
    val dest = s"${tmp()}/rate_lance"
    val q = StreamingOps.rateToLance(spark, dest, s"${tmp()}/ckpt",
      rowsPerSecond = 500,
      trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
    try {
      Thread.sleep(1500) // let the rate source accumulate a second of data
      q.awaitTermination(60000)
      val out = spark.read.format("lance").load(dest)
      assert(out.schema.fieldNames.toSeq ==
        Seq("event_id", "event_type", "embedding", "event_time"))
      if (out.count() > 0) {
        val emb = out.select("embedding").collect().head.getSeq[Float](0)
        assert(emb.size == 4)
      }
    } finally q.stop()
  }
}
