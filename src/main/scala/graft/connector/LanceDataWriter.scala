package graft.connector

import graft.format.{BucketHash, FragmentMeta, LanceFormat}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, DataWriterFactory, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.types.{DataType, StructType}

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}
import java.util.UUID
import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** Java-serializable Hadoop Configuration wrapper for task shipping. */
class SerializableConf(@transient var value: Configuration) extends Serializable {
  @throws(classOf[IOException])
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  @throws(classOf[IOException])
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** Creates one fragment writer per task (batch and streaming share it).
  * `bucketSpec` = (numBuckets, PHYSICAL key column names) when the table
  * declares hash bucketing ([[graft.Lance.clusterByBucket]]): the writer
  * routes every row to a per-bucket file so fragments stay bucket-pure
  * under ANY upstream distribution — purity is a writer invariant, not a
  * plan convention.
  */
class LanceWriterFactory(rootStr: String, schemaJson: String,
    conf: SerializableConf, maxRowsPerFile: Long, collectStats: Boolean = true,
    bucketSpec: Option[(Seq[Int], Seq[String])] = None,
    bloomCols: Seq[String] = Seq.empty)
    extends DataWriterFactory with StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new LanceDataWriter(rootStr, schemaJson, conf.value, maxRowsPerFile,
      collectStats, bucketSpec, bloomCols)

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new LanceDataWriter(rootStr, schemaJson, conf.value, maxRowsPerFile,
      collectStats, bucketSpec, bloomCols)
}

/** Executor-side fragment writer: streams InternalRows into Parquet
  * fragment files under `data/`, rolling at `maxRowsPerFile` (reference
  * `WriteParams.withMaxRowsPerFile`, `LanceSink.java:159-161`). Files are
  * invisible until the driver commits a manifest referencing them, so
  * writing directly into `data/` is safe; abort simply deletes them.
  *
  * With `bucketSpec` set, rows are routed to one open file per bucket id
  * (bounded by `maxOpenSinks` — the fullest file seals early under a
  * routing-heavy input; upstream bucket co-location keeps the realistic
  * number near one) and every produced [[FragmentMeta]] carries its
  * bucket tag.
  */
class LanceDataWriter(rootStr: String, schemaJson: String, conf: Configuration,
    maxRowsPerFile: Long, collectStats: Boolean = true,
    bucketSpec: Option[(Seq[Int], Seq[String])] = None,
    bloomCols: Seq[String] = Seq.empty) extends DataWriter[InternalRow] {

  private val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
  private val root = new Path(rootStr)

  /** Bucket routing, resolved to ordinals once: (per-column widths,
    * ordinal+type per key column). The factory passes PHYSICAL names —
    * this schema's. */
  private val routing: Option[(Seq[Int], Array[(Int, DataType)])] = bucketSpec.map {
    case (n, cols) =>
      val keyed = cols.map { c =>
        val i = schema.fieldNames.indexOf(c)
        require(i >= 0,
          s"bucketed table at $rootStr: write schema is missing bucket key " +
            s"column '$c' - bucketed writes must carry every key column")
        (i, schema.fields(i).dataType)
      }.toArray
      (n, keyed)
  }

  private val keyTypes: Seq[DataType] =
    routing.map(_._2.map(_._2).toSeq).getOrElse(Seq.empty)

  private def keyValuesOf(row: InternalRow): Array[Any] = {
    val keys = routing.get._2
    val values = new Array[Any](keys.length)
    var i = 0
    while (i < keys.length) {
      val (ord, dt) = keys(i)
      values(i) = if (row.isNullAt(ord)) null else row.get(ord, dt)
      i += 1
    }
    values
  }

  /** Fixed-size vector fidelity (SURVEY §7.4 risk 5 — the reference drops
    * the dimension, `LanceTypeConverter.java:235-242`): columns stamped
    * with [[graft.Lance.VectorDimKey]] metadata are length-checked on every
    * row; the metadata itself rides the manifest's schema JSON.
    */
  private val dimChecks: Array[(Int, String, Int)] =
    schema.fields.zipWithIndex.collect {
      case (f, i) if f.metadata.contains(graft.Lance.VectorDimKey) =>
        (i, f.name, f.metadata.getLong(graft.Lance.VectorDimKey).toInt)
    }

  private def validate(row: InternalRow): Unit = {
    var j = 0
    while (j < dimChecks.length) {
      val (i, name, dim) = dimChecks(j)
      if (!row.isNullAt(i)) {
        val n = row.getArray(i).numElements()
        if (n != dim) throw new IllegalArgumentException(
          s"column '$name' expects fixed vector dim $dim, got $n")
      }
      j += 1
    }
  }

  private val done = ArrayBuffer.empty[FragmentMeta]

  /** Per-key-column interpreted orderings for the sortedness observer
    * (bucket keys are atomic types by [[BucketHash.supportedKeyType]];
    * nulls order first, matching the writer paths' asc_nulls_first). */
  private val keyOrderings: Array[Ordering[Any]] = routing match {
    case None => Array.empty
    case Some((_, keys)) => keys.map { case (_, dt) =>
      org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(dt)
        .asInstanceOf[Ordering[Any]]
    }
  }

  private def compareKeys(a: Array[Any], b: Array[Any]): Int = {
    var i = 0
    while (i < a.length) {
      val x = a(i); val y = b(i)
      val c =
        if (x == null && y == null) 0
        else if (x == null) -1
        else if (y == null) 1
        else keyOrderings(i).compare(x, y)
      if (c != 0) return c
      i += 1
    }
    0
  }

  /** One open fragment file (the per-bucket unit; bucket -1 = unrouted). */
  private final class Sink(bucket: Int) {
    val file = s"frag-${UUID.randomUUID()}.parquet"
    private val stats =
      if (collectStats) Some(new graft.format.FragmentStats.Collector(schema)) else None
    private var rows = 0L
    // OBSERVED key-sortedness: stays true while rows arrive
    // non-decreasing by the bucket key. UTF8String values are copied out
    // of the reused row buffer before they are held across rows.
    private var keySorted = routing.isDefined
    private var prevKey: Array[Any] = null
    def observeKey(key: Array[Any]): Unit = if (keySorted) {
      val own = key.map {
        case u: org.apache.spark.unsafe.types.UTF8String => u.copy()
        case v => v
      }
      if (prevKey != null && compareKeys(prevKey, own) > 0) keySorted = false
      prevKey = own
    }
    val writer: ParquetWriter[InternalRow] = {
      val path = new Path(LanceFormat.dataPath(root), file)
      val c = new Configuration(conf)
      ParquetWriteSupport.setSchema(schema, c)
      // ParquetWriteSupport.init requires these (the driver already set them
      // from SQLConf; these are fallbacks for conf built elsewhere):
      c.setIfUnset("spark.sql.parquet.writeLegacyFormat", "false")
      c.setIfUnset("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      c.setIfUnset("spark.sql.parquet.fieldId.write.enabled", "false")
      c.setIfUnset("spark.sql.parquet.variant.annotateLogicalType.enabled", "false")
      val b = new Builder(path).withConf(c)
        .withCompressionCodec(CompressionCodecName.SNAPPY)
      // declared bloom columns ([[graft.Lance.setBloomFilters]], passed
      // as PHYSICAL names): a per-row-group membership proof the reader
      // applies to pushed =/IN predicates. Adaptive sizing right-sizes
      // the filter from the observed NDV instead of a fixed worst case.
      val blooming = bloomCols.filter(schema.fieldNames.contains)
      blooming.foldLeft(
        if (blooming.isEmpty) b else b.withAdaptiveBloomFilterEnabled(true))(
        (bb, name) => bb.withBloomFilterEnabled(name, true))
        .build()
    }
    def rowCount: Long = rows
    def write(row: InternalRow): Boolean = { // true when the file rolled
      writer.write(row)
      stats.foreach(_.observe(row))
      rows += 1
      rows >= maxRowsPerFile
    }
    def close(): Unit = {
      writer.close()
      val p = new Path(LanceFormat.dataPath(root), file)
      if (rows > 0) {
        // recorded size lets the scan plan without per-file FS calls
        val len = try Some(p.getFileSystem(conf).getFileStatus(p).getLen)
          catch { case _: Exception => None }
        done += FragmentMeta(0, file, rows, stats.flatMap(_.result()),
          bucket = Some(bucket).filter(_ >= 0), bytes = len,
          sorted = if (bucket >= 0) Some(keySorted) else None)
      } else p.getFileSystem(conf).delete(p, false)
    }
    def abort(): Unit = writer.close()
  }

  private final class Builder(file: Path)
      extends ParquetWriter.Builder[InternalRow, Builder](file) {
    override def self(): Builder = this
    override def getWriteSupport(c: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }

  private val open = mutable.Map.empty[Int, Sink]

  /** Concurrently open per-bucket files per task. Each ParquetWriter
    * buffers up to a row group in memory, so "one file per bucket" is an
    * executor-OOM invitation when an UNCLUSTERED write hits a wide-bucket
    * table (every task sees every bucket — 256 buckets × row-group buffer
    * × task slots). Above the cap the fullest file is sealed and its
    * bucket re-opens later if more rows arrive: bucket PURITY is
    * untouched (a bucket may just land in several files), memory is
    * bounded, and a bucket-co-located upstream never hits the cap. */
  private val maxOpenSinks = 16

  override def write(row: InternalRow): Unit = {
    if (dimChecks.nonEmpty) validate(row)
    // ONE key extraction per routed row serves both the bucket hash and
    // the sortedness observer (which no-ops once disproven)
    val keyVals = if (routing.isDefined) keyValuesOf(row) else null
    val b = routing match {
      case Some((n, _)) =>
        BucketHash.gridTagOfInternal(
          scala.collection.immutable.ArraySeq.unsafeWrapArray(keyVals), keyTypes, n)
      case None => -1
    }
    val sink = open.getOrElse(b, {
      if (open.size >= maxOpenSinks) {
        val (full, s) = open.maxBy(_._2.rowCount)
        s.close()
        open.remove(full)
      }
      val s = new Sink(b)
      open.put(b, s)
      s
    })
    if (keyVals != null) sink.observeKey(keyVals)
    if (sink.write(row)) { sink.close(); open.remove(b) }
  }

  override def commit(): WriterCommitMessage = {
    open.values.foreach(_.close())
    open.clear()
    LanceCommitMessage(done.toSeq)
  }

  override def abort(): Unit = {
    open.values.foreach(_.abort())
    val fs = root.getFileSystem(conf)
    (done.map(_.file) ++ open.values.map(_.file)).foreach { f =>
      fs.delete(new Path(LanceFormat.dataPath(root), f), false)
    }
    open.clear()
  }

  override def close(): Unit = {
    open.values.foreach(_.abort())
    open.clear()
  }
}
