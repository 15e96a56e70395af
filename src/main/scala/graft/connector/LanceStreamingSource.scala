package graft.connector

import graft.format.LanceFormat
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetReader
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport
import org.apache.spark.sql.types.{DataType, StructType}

/** Streaming read of a lance dataset — `spark.readStream.format("lance")`.
  *
  * The reference's `LanceSource` is a Flink *streaming* source over a
  * dataset snapshot (`LanceSource.java:147-190`); re-expressed on
  * Structured Streaming the natural semantics are a fragment changefeed:
  * offsets are manifest versions, and each micro-batch reads exactly the
  * fragments that versions (start, end] added. The first batch emits every
  * fragment of the current version (snapshot), later batches pick up newly
  * committed appends — a table that is both sink and source chains
  * pipelines end-to-end with exactly-once epochs on both sides.
  *
  * Scale: one InputPartition per new fragment (the reference's parallelism
  * unit); no state beyond the last processed version number. Row-PRESERVING
  * rewrites (compaction, re-clustering — manifest operation "rewrite") are
  * transparent: the feed skips them and keeps reading appended rows from
  * their original files. Two interleavings remain unsupported: vacuuming
  * manifests/files below the stream's current offset (a retention
  * contract, as in any log-compacted changefeed), and row-CHANGING
  * rewrites (overwrite, row-level DML) inside a streamed range, which fail
  * loud rather than re-emit rewritten fragments as duplicates.
  */
case class LanceStreamOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

class LanceMicroBatchStream(rootStr: String, readSchemaJson: String,
    conf: SerializableConf, maxVersionsPerBatch: Option[Long] = None)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private val root = new Path(rootStr)
  private def fs = LanceFormat.fileSystem(root, conf.value)

  /** Version ceiling pinned at query start under Trigger.AvailableNow.
    * Without this interface Spark falls back to one mega-batch and — more
    * important — never runs the trailing no-data batch, so append-mode
    * event-time aggregations downstream would emit NOTHING (the final
    * watermark advance is what closes their windows).
    */
  private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(LanceFormat.latestVersion(fs, root).getOrElse(0L))

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val latest = LanceFormat.latestVersion(fs, root).getOrElse(0L)
    val capped = availableNowCap.fold(latest)(math.min(latest, _))
    // `read.max-versions-per-batch` rate limit (the Delta maxFilesPerTrigger
    // analogue at manifest granularity): a backlogged stream catches up in
    // bounded micro-batches instead of one unbounded mega-batch — and under
    // AvailableNow it still drains to the pinned cap, batch by batch
    val sv = start.asInstanceOf[LanceStreamOffset].version
    LanceStreamOffset(maxVersionsPerBatch.fold(capped)(m => math.min(capped, sv + m)))
  }

  override def initialOffset(): Offset = LanceStreamOffset(0L)

  override def latestOffset(): Offset =
    LanceStreamOffset(LanceFormat.latestVersion(fs, root).getOrElse(0L))

  override def deserializeOffset(json: String): Offset =
    LanceStreamOffset(json.toLong)

  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val sv = start.asInstanceOf[LanceStreamOffset].version
    val ev = end.asInstanceOf[LanceStreamOffset].version
    if (ev <= sv) return Array.empty
    val before =
      if (sv == 0L) Set.empty[String]
      else LanceFormat.readManifest(fs, root, sv).fragments.map(_.file).toSet
    val endFrags = LanceFormat.readManifest(fs, root, ev).fragments
    val endFiles = endFrags.map(_.file).toSet
    // Fast path (two manifest reads): a pure-append range emits exactly
    // the fragments (start, end] added. When files DID drop inside the
    // range, the per-version walk below classifies each commit: a
    // row-PRESERVING rewrite (compaction / re-clustering, manifest
    // operation = "rewrite") is skipped — its rows were already emitted
    // from the pre-rewrite files, which stay on disk until vacuum — while
    // a commit that changed rows (overwrite, row-level delete/update/
    // merge) still fails loud: re-emitting rewritten rows would duplicate
    // the feed. At 100 TB compaction runs continuously; a changefeed that
    // died on every compaction would be unusable.
    val dropped = before -- endFiles
    val newFrags =
      if (dropped.isEmpty) endFrags.filterNot(f => before.contains(f.file))
      else {
        var prevFiles = before
        val out = Seq.newBuilder[graft.format.FragmentMeta]
        ((sv + 1) to ev).foreach { v =>
          val m = LanceFormat.readManifest(fs, root, v)
          val curFiles = m.fragments.map(_.file).toSet
          val drops = prevFiles -- curFiles
          if (drops.isEmpty)
            out ++= m.fragments.filterNot(f => prevFiles.contains(f.file))
          else if (!m.operation.contains("rewrite"))
            throw new IllegalStateException(
              s"lance stream at $root: version $v is a " +
                s"${m.operation.getOrElse("pre-operation-field")} commit that " +
                s"dropped ${drops.size} streamed fragments; row-changing " +
                "rewrites cannot flow through a changefeed - restart the " +
                "query from a fresh checkpoint to take a new snapshot")
          // else: row-preserving rewrite — emit nothing. Fragments appended
          // earlier in this same gap still stream from their ORIGINAL files
          // (time travel keeps them until vacuum), so nothing is lost.
          prevFiles = curFiles
        }
        out.result()
      }
    newFrags
      .map(f => LanceFragmentPartition(
        new Path(LanceFormat.dataPath(root), f.file).toString): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LanceFragmentReaderFactory(readSchemaJson, conf)

  override def stop(): Unit = ()
}

case class LanceFragmentPartition(file: String) extends InputPartition

/** Row-based fragment reader: the executor-side `ParquetReadSupport` path
  * (symmetric to [[LanceDataWriter]]'s `ParquetWriteSupport`), with the
  * requested Catalyst schema in the conf so parquet clips columns.
  */
class LanceFragmentReaderFactory(readSchemaJson: String, conf: SerializableConf)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[LanceFragmentPartition].file
    val schema = DataType.fromJson(readSchemaJson).asInstanceOf[StructType]
    val c = new org.apache.hadoop.conf.Configuration(conf.value)
    c.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, schema.json)
    c.setIfUnset("spark.sql.parquet.binaryAsString", "false")
    c.setIfUnset("spark.sql.parquet.int96AsTimestamp", "true")
    c.setIfUnset("spark.sql.caseSensitive", "false")
    c.setIfUnset("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    c.setIfUnset("spark.sql.legacy.parquet.nanosAsLong", "false")
    new PartitionReader[InternalRow] {
      private val reader: ParquetReader[InternalRow] =
        ParquetReader.builder(new ParquetReadSupport(), new Path(file))
          .withConf(c).build()
      private var current: InternalRow = _
      override def next(): Boolean = { current = reader.read(); current != null }
      override def get(): InternalRow = current
      override def close(): Unit = reader.close()
    }
  }
}
