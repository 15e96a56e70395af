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

/** Streaming CDC mode (`read.change-feed=true`, the streaming twin of the
  * `lance_changes` TVF): instead of failing on a row-level DML commit, the
  * stream emits the commit's removed fragments as `_change_type='delete'`
  * rows and its added fragments as `'insert'` rows (plus
  * `_commit_version`), so a live downstream consumer applies mutations
  * instead of restarting from a snapshot. Row-preserving rewrites
  * (compaction/re-clustering) stay silent, exactly like the TVF and the
  * plain changefeed.
  */
object LanceChangeFeed {
  val Option = "read.change-feed"
  val ChangeTypeColumn = "_change_type"
  val CommitVersionColumn = "_commit_version"
  val metaNames: Set[String] = Set(ChangeTypeColumn, CommitVersionColumn)

  import org.apache.spark.sql.types.{LongType, StringType, StructField}
  val metaFields: Array[StructField] = Array(
    StructField(ChangeTypeColumn, StringType, nullable = false),
    StructField(CommitVersionColumn, LongType, nullable = false))

  def dropMeta(schema: StructType): StructType =
    StructType(schema.fields.filterNot(f => metaNames.contains(f.name)))
}

/** The scan a `read.change-feed=true` load builds: streaming-only (batch
  * ranges are the `lance_changes` TVF's job), read schema = pruned data
  * columns + the requested change-row columns.
  */
class LanceChangeFeedScan(inner: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan,
    rootStr: String, metaCols: Seq[String],
    physToLogical: Map[String, String] = Map.empty)
    extends LanceParquetScan(inner, rootStr, physToLogical) {

  override def readSchema(): StructType = {
    val metaByName = LanceChangeFeed.metaFields.map(f => f.name -> f).toMap
    StructType(super.readSchema().fields ++ metaCols.map(metaByName))
  }

  override def planInputPartitions(): Array[InputPartition] =
    throw new IllegalArgumentException(
      s"${LanceChangeFeed.Option} is a STREAMING read mode " +
        "(spark.readStream); for a batch change feed over a committed " +
        "version range use lance_changes(path, fromVersion, toVersion)")

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(inner.options.get("branch") == null,
      "streaming reads follow the main lineage; branch streaming is not supported")
    val conf = {
      val c = sparkSession.sessionState.newHadoopConf()
      c.set("spark.sql.session.timeZone",
        sparkSession.sessionState.conf.sessionLocalTimeZone)
      new SerializableConf(c)
    }
    new LanceMicroBatchStream(rootStr, physicalReadSchema.json, conf,
      scala.Option(inner.options.get("read.max-versions-per-batch")).map(_.toLong),
      changeFeedMeta = Some(metaCols),
      sinceVersion = scala.Option(inner.options.get("read.since-version")).map(_.toLong))
  }
}

class LanceMicroBatchStream(rootStr: String, readSchemaJson: String,
    conf: SerializableConf, maxVersionsPerBatch: Option[Long] = None,
    changeFeedMeta: Option[Seq[String]] = None,
    sinceVersion: Option[Long] = None)
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

  /** Fresh-checkpoint start position. Default 0 = full snapshot first.
    * `read.since-version=N` (the Delta startingVersion analogue) attaches
    * mid-history: the first batch emits the changes AFTER version N —
    * what a CDC consumer that already holds a copy of version N wants.
    * Only consulted on a fresh checkpoint; resumes keep their offset.
    */
  override def initialOffset(): Offset = {
    sinceVersion.foreach { v =>
      require(v == 0 || LanceFormat.listVersions(fs, root).contains(v),
        s"read.since-version=$v: no such committed version at $root " +
          "(it may have been vacuumed; start from a retained version)")
    }
    LanceStreamOffset(sinceVersion.getOrElse(0L))
  }

  override def latestOffset(): Offset =
    LanceStreamOffset(LanceFormat.latestVersion(fs, root).getOrElse(0L))

  override def deserializeOffset(json: String): Offset =
    LanceStreamOffset(json.toLong)

  override def commit(end: Offset): Unit = ()

  /** CDC planning: every version's added fragments emit `insert` rows and
    * its removed fragments emit `delete` rows (read from the PREVIOUS
    * manifest's files, which stay on disk until vacuum); row-preserving
    * rewrites emit nothing. Unlike the plain changefeed there is no
    * fail-loud — representing row change is the point of the mode.
    *
    * A DML commit that recorded row-level CHANGE FILES (Delta CDF's
    * contract — `update_preimage`/`update_postimage`/`delete`/`insert`
    * images staged by the DML verb) serves exactly those instead of the
    * fragment diff: the diff would amplify a 2-row update into
    * whole-fragment delete+insert pairs; the images are the 2 rows.
    */
  private def planChangePartitions(sv: Long, ev: Long): Array[InputPartition] = {
    val out = Array.newBuilder[InputPartition]
    var prev: Seq[graft.format.FragmentMeta] =
      if (sv == 0L) Seq.empty else LanceFormat.readManifest(fs, root, sv).fragments
    ((sv + 1) to ev).foreach { v =>
      val m = LanceFormat.readManifest(fs, root, v)
      val cdf = m.changeFiles.getOrElse(Seq.empty)
      if (m.operation.contains("replace") && cdf.nonEmpty) {
        cdf.foreach(c => out += LanceChangePartition(
          LanceFormat.fragmentPath(root, c.file).toString, c.rows, c.kind, v))
      } else if (!m.operation.contains("rewrite")) {
        val prevFiles = prev.map(_.file).toSet
        val curFiles = m.fragments.map(_.file).toSet
        def part(f: graft.format.FragmentMeta, kind: String) =
          LanceChangePartition(
            LanceFormat.fragmentPath(root, f.file).toString,
            f.rowCount, kind, v)
        m.fragments.filterNot(f => prevFiles.contains(f.file))
          .foreach(f => out += part(f, "insert"))
        prev.filterNot(f => curFiles.contains(f.file))
          .foreach(f => out += part(f, "delete"))
      }
      prev = m.fragments
    }
    out.result()
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val sv = start.asInstanceOf[LanceStreamOffset].version
    val ev = end.asInstanceOf[LanceStreamOffset].version
    if (ev <= sv) return Array.empty
    if (changeFeedMeta.isDefined) return planChangePartitions(sv, ev)
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
        LanceFormat.fragmentPath(root, f.file).toString): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    changeFeedMeta match {
      case Some(meta) => new LanceChangeReaderFactory(readSchemaJson, meta, conf)
      case None => new LanceFragmentReaderFactory(readSchemaJson, conf)
    }

  override def stop(): Unit = ()
}

/** One emitted change unit: a fragment file + the change kind and commit
  * version its rows carry. `rowCount` enables the zero-I/O path when the
  * query projects only the change-row columns.
  */
case class LanceChangePartition(file: String, rowCount: Long,
    changeType: String, version: Long) extends InputPartition

/** Serves `data columns ++ requested change-row columns` per partition:
  * the data part rides the ordinary fragment reader, the constants are
  * joined per row. A projection of ONLY change-row columns (count of
  * deletes per commit, say) never opens the file — the manifest's
  * rowCount drives an empty-row emitter.
  */
class LanceChangeReaderFactory(readSchemaJson: String, metaCols: Seq[String],
    conf: SerializableConf) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LanceChangePartition]
    val full = DataType.fromJson(readSchemaJson).asInstanceOf[StructType]
    val dataSchema = LanceChangeFeed.dropMeta(full)
    val metaVals: Array[Any] = metaCols.map {
      case LanceChangeFeed.ChangeTypeColumn =>
        org.apache.spark.unsafe.types.UTF8String.fromString(p.changeType)
      case LanceChangeFeed.CommitVersionColumn => p.version
      case other => throw new IllegalStateException(s"unknown change column $other")
    }.toArray
    val metaRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(metaVals)
    if (dataSchema.isEmpty) {
      new PartitionReader[InternalRow] {
        private var remaining = p.rowCount
        override def next(): Boolean = { remaining -= 1; remaining >= 0 }
        override def get(): InternalRow = metaRow
        override def close(): Unit = ()
      }
    } else {
      val inner = new LanceFragmentReaderFactory(dataSchema.json, conf)
        .createReader(LanceFragmentPartition(p.file))
      new PartitionReader[InternalRow] {
        private val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
        override def next(): Boolean = inner.next()
        override def get(): InternalRow = joined(inner.get(), metaRow)
        override def close(): Unit = inner.close()
      }
    }
  }
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
