package graft

import graft.format.LanceFormat
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Query-scoped streaming exactly-once (`Manifest.streamEpochs`).
  *
  * The replay guard is keyed by `LogicalWriteInfo.queryId()`, not a
  * per-table epoch scalar — the scalar silently DROPPED data in two
  * realistic shapes pinned here:
  *  (a) restart from a FRESH checkpoint: the new query's epochs restart
  *      at 0, which a table-level high-water mark reads as replays
  *  (b) two concurrent streaming queries on one table: the lower-epoch
  *      query's commits are discarded
  * and the shape the guard exists for:
  *  (c) a genuinely replayed (queryId, epoch) — sink-commit marker lost,
  *      batch re-executed on restart — skips, deletes its staged files,
  *      and duplicates nothing.
  */
class StreamingExactlyOnceSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "sxo-")
      .toAbsolutePath.toString

  private def fs(dir: String) =
    LanceFormat.fileSystem(new Path(dir), spark.sessionState.newHadoopConf())

  private def dataFiles(dir: String): Set[String] = {
    val dp = LanceFormat.dataPath(new Path(dir))
    val f = fs(dir)
    if (!f.exists(dp)) Set.empty
    else f.listStatus(dp).map(_.getPath.getName).toSet
  }

  private val inputSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType)))

  private def runFileStream(input: String, dir: String, ckpt: String): Unit = {
    val q = spark.readStream.schema(inputSchema).json(input)
      .writeStream.format("lance")
      .option("checkpointLocation", ckpt).outputMode("append").start(dir)
    try q.processAllAvailable() finally q.stop()
  }

  test("restart from a FRESH checkpoint lands every batch (new query, not a replay)") {
    val base = tmpDir()
    val input = s"$base/in"; val dir = s"$base/tbl"
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").repartition(1).write.json(input)
    runFileStream(input, dir, s"$base/ckpt1")
    assert(spark.read.format("lance").load(dir).count() == 2)
    // a fresh checkpoint = a NEW query: it re-reads the input from scratch
    // and every batch must LAND (the old table-level epoch scalar treated
    // the new query's epoch 0 as a replay and silently dropped it)
    runFileStream(input, dir, s"$base/ckpt2")
    assert(spark.read.format("lance").load(dir).count() == 4,
      "fresh-checkpoint restart must not silently drop its batches")
    val epochs = LanceFormat.readLatest(fs(dir), new Path(dir)).get.streamEpochs
    assert(epochs.exists(_.size == 2), s"expected one entry per query, got $epochs")
  }

  test("two concurrent streaming queries interleave commits without loss") {
    val base = tmpDir()
    val dir = s"$base/tbl"
    val in1 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark)
    val in2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark)
    val q1 = in1.toDF().toDF("id", "s").writeStream.format("lance")
      .option("checkpointLocation", s"$base/c1").outputMode("append").start(dir)
    val q2 = in2.toDF().toDF("id", "s").writeStream.format("lance")
      .option("checkpointLocation", s"$base/c2").outputMode("append").start(dir)
    try {
      in1.addData((1L, "a")); q1.processAllAvailable()
      // q2's epoch 0 lands AFTER q1's epoch 0 — the per-table scalar
      // discarded exactly this commit (0 >= 0 read as replay)
      in2.addData((10L, "x")); q2.processAllAvailable()
      in1.addData((2L, "b")); q1.processAllAvailable()
      in2.addData((11L, "y")); q2.processAllAvailable()
    } finally { q1.stop(); q2.stop() }
    val back = spark.read.format("lance").load(dir)
    assert(back.count() == 4)
    assert(back.select("id").as[Long].collect().toSet == Set(1L, 2L, 10L, 11L))
  }

  test("a replayed (queryId, epoch) skips, deletes staged files, duplicates nothing") {
    val base = tmpDir()
    val input = s"$base/in"; val dir = s"$base/tbl"; val ckpt = s"$base/ckpt"
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").repartition(1).write.json(input)
    runFileStream(input, dir, ckpt)
    assert(spark.read.format("lance").load(dir).count() == 2)
    val filesAfter = dataFiles(dir)
    val vAfter = LanceFormat.listVersions(fs(dir), new Path(dir)).size
    // lose the sink-commit marker: on restart Spark re-executes the batch
    // with the SAME queryId and epoch — the classic at-least-once replay
    // the guard must turn into exactly-once
    val f = fs(ckpt)
    val commits = f.listStatus(new Path(ckpt, "commits"))
      .map(_.getPath).filter(!_.getName.startsWith("."))
    val last = commits.maxBy(_.getName.toInt)
    assert(f.delete(last, false))
    runFileStream(input, dir, ckpt)
    assert(spark.read.format("lance").load(dir).count() == 2,
      "replayed epoch must not duplicate rows")
    assert(dataFiles(dir) == filesAfter,
      "replay's staged fragment files must be deleted, not orphaned")
    assert(LanceFormat.listVersions(fs(dir), new Path(dir)).size == vAfter,
      "replay must not create a version")
    // the stream is healthy after the skip: new data still lands
    Seq((3L, "c")).toDF("id", "s").repartition(1).write.mode("append").json(input)
    runFileStream(input, dir, ckpt)
    assert(spark.read.format("lance").load(dir).count() == 3)
  }
}
