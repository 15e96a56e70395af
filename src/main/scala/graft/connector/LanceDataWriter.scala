package graft.connector

import graft.format.{FragmentMeta, LanceFormat}
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

/** Creates one fragment writer per task (batch and streaming share it). */
class LanceWriterFactory(rootStr: String, schemaJson: String,
    conf: SerializableConf, maxRowsPerFile: Long, collectStats: Boolean = true)
    extends DataWriterFactory with StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new LanceDataWriter(rootStr, schemaJson, conf.value, maxRowsPerFile, collectStats)

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new LanceDataWriter(rootStr, schemaJson, conf.value, maxRowsPerFile, collectStats)
}

/** Executor-side fragment writer: streams InternalRows into Parquet
  * fragment files under `data/`, rolling at `maxRowsPerFile` (reference
  * `WriteParams.withMaxRowsPerFile`, `LanceSink.java:159-161`). Files are
  * invisible until the driver commits a manifest referencing them, so
  * writing directly into `data/` is safe; abort simply deletes them.
  */
class LanceDataWriter(rootStr: String, schemaJson: String, conf: Configuration,
    maxRowsPerFile: Long, collectStats: Boolean = true) extends DataWriter[InternalRow] {

  private val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
  private val root = new Path(rootStr)

  /** Per-fragment min/max/nullCount for manifest-level data skipping
    * ([[graft.format.FragmentStats]]); reset at every roll.
    */
  private val stats =
    if (collectStats) Some(new graft.format.FragmentStats.Collector(schema)) else None

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
  private var writer: ParquetWriter[InternalRow] = _
  private var currentFile: String = _
  private var rowsInFile = 0L

  private final class Builder(file: Path)
      extends ParquetWriter.Builder[InternalRow, Builder](file) {
    override def self(): Builder = this
    override def getWriteSupport(c: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }

  private def open(): Unit = {
    currentFile = s"frag-${UUID.randomUUID()}.parquet"
    val file = new Path(LanceFormat.dataPath(root), currentFile)
    val c = new Configuration(conf)
    ParquetWriteSupport.setSchema(schema, c)
    // ParquetWriteSupport.init requires these (the driver already set them
    // from SQLConf; these are fallbacks for conf built elsewhere):
    c.setIfUnset("spark.sql.parquet.writeLegacyFormat", "false")
    c.setIfUnset("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    c.setIfUnset("spark.sql.parquet.fieldId.write.enabled", "false")
    c.setIfUnset("spark.sql.parquet.variant.annotateLogicalType.enabled", "false")
    writer = new Builder(file)
      .withConf(c)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    rowsInFile = 0L
  }

  private def roll(): Unit = {
    if (writer != null) {
      writer.close()
      if (rowsInFile > 0)
        done += FragmentMeta(0, currentFile, rowsInFile, stats.flatMap(_.result()))
      else new Path(LanceFormat.dataPath(root), currentFile)
        .getFileSystem(conf).delete(new Path(LanceFormat.dataPath(root), currentFile), false)
      stats.foreach(_.reset())
      writer = null
    }
  }

  override def write(row: InternalRow): Unit = {
    if (dimChecks.nonEmpty) validate(row)
    if (writer == null) open()
    writer.write(row)
    stats.foreach(_.observe(row))
    rowsInFile += 1
    if (rowsInFile >= maxRowsPerFile) roll()
  }

  override def commit(): WriterCommitMessage = {
    roll()
    LanceCommitMessage(done.toSeq)
  }

  override def abort(): Unit = {
    if (writer != null) writer.close()
    val fs = root.getFileSystem(conf)
    (done.map(_.file) ++ Option(currentFile)).foreach { f =>
      fs.delete(new Path(LanceFormat.dataPath(root), f), false)
    }
  }

  override def close(): Unit = if (writer != null) { writer.close(); writer = null }
}
