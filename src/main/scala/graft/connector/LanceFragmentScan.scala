package graft.connector

import graft.format.FragmentMeta
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.catalog.MetadataColumn
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.execution.vectorized.ConstantColumnVector
import org.apache.spark.sql.types.{DataType, IntegerType, StructField, StructType}
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

/** The `__fragment_id` metadata column: every row's manifest fragment id,
  * Spark-resolved via [[org.apache.spark.sql.connector.catalog.SupportsMetadataColumns]]
  * (the Iceberg `_file` shape re-expressed at lance granularity). Two
  * consumers:
  *
  *  - row provenance: `SELECT *, __fragment_id FROM lance.db.t` tells a
  *    pipeline which fragment produced a row — the unit of replacement,
  *    compaction, and changefeed emission;
  *  - **runtime group filtering** for row-level operations: Spark's
  *    `RowLevelOperationRuntimeGroupFiltering` plans a subquery for the
  *    DISTINCT `__fragment_id` of rows matching the UPDATE/MERGE/DELETE
  *    condition and hands the id set to [[LanceRowLevelScan.filter]] — so
  *    a MERGE whose ON keys are not statically pushable still rewrites
  *    only the fragments that actually hold matches, found at the cost of
  *    one narrow pre-scan instead of a full-table rewrite.
  *
  * Serving the column needs per-row fragment identity, so these scans
  * regroup the vectorized parquet reader's planned chunks fragment-per-
  * partition (the reference's parallelism unit,
  * `ref:LanceSource.java:173-186`) and append the partition's constant id —
  * as a [[ConstantColumnVector]] on each columnar batch, so the scan stays
  * on the vectorized reader and inside whole-stage codegen exactly like a
  * plain scan; a [[JoinedRow]] in the row-based fallback. The column is
  * only materialized when a query names it; plain scans keep Spark's own
  * file packing.
  */
object LanceFragmentScan {
  val FragmentIdColumn = "__fragment_id"

  val fragmentIdField: StructField =
    StructField(FragmentIdColumn, IntegerType, nullable = false)

  val fragmentIdMetadataColumn: MetadataColumn = new MetadataColumn {
    override def name: String = FragmentIdColumn
    override def dataType: DataType = IntegerType
    override def isNullable: Boolean = false
    override def comment: String =
      "manifest fragment id of the row (lance group of replacement/compaction)"
  }

  def dropFragmentId(schema: StructType): StructType =
    StructType(schema.fields.filterNot(_.name == FragmentIdColumn))

  /** Regroup an inner parquet scan's planned partitions (file-packed,
    * possibly split) into fragment-per-partition units tagged with the
    * fragment id. Built from the chunks Spark itself planned, so sizes,
    * split offsets, and locality hints carry over; a fragment larger than
    * `maxPartitionBytes` keeps its splits as chunks of the one partition
    * (the id is per-fragment, so the fragment is the parallelism floor).
    */
  def fragmentIdPartitions(innerPartitions: Array[InputPartition],
      fragments: Seq[FragmentMeta],
      dropUnlisted: Boolean = false): Array[InputPartition] = {
    val idByName = fragments.map(f => f.file -> f.id).toMap
    val chunks = innerPartitions.flatMap {
      case fp: FilePartition => fp.files
      case other => throw new IllegalStateException(
        s"expected FilePartition from the parquet scan, got ${other.getClass}")
    }
    chunks.groupBy(_.filePath.toPath.getName).toSeq
      .flatMap { case (name, fileChunks) =>
        idByName.get(name) match {
          case Some(id) => Some(id -> fileChunks)
          // dropUnlisted: the chunk's fragment was excluded AFTER the
          // inner scan was planned (runtime group filtering) — skip it
          case None if dropUnlisted => None
          case None => throw new IllegalStateException(
            s"scanned file $name is not a manifest fragment")
        }
      }
      .sortBy(_._1)
      .zipWithIndex
      .map { case ((id, fileChunks), i) =>
        LanceFragmentIdFilePartition(FilePartition(i, fileChunks), id): InputPartition
      }
      .toArray
  }
}

/** One fragment's chunks + its manifest id; unwrapped by
  * [[LanceFragmentIdReaderFactory]] before reaching the parquet reader.
  */
case class LanceFragmentIdFilePartition(inner: FilePartition, fragmentId: Int)
    extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** One bucket's fragment chunks carrying the per-key-column grid digits
  * as the DSv2 partition key (one int per reported `bucket(n, cᵢ)`
  * transform; a unary spec has exactly one) — what Spark's
  * storage-partitioned join machinery groups and aligns across join
  * sides ([[graft.format.BucketSpecMeta]]). Unwrapped by
  * [[LanceBucketUnwrapReaderFactory]]; the key never reaches the parquet
  * reader.
  */
case class LanceBucketedFilePartition(inner: FilePartition, digits: Seq[Int])
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
  override def partitionKey(): InternalRow =
    new GenericInternalRow(digits.map(d => d: Any).toArray)
}

/** Pass-through factory: peels [[LanceBucketedFilePartition]] off before
  * delegating to the vectorized parquet reader (rows are untouched — the
  * key exists only for partition alignment).
  */
class LanceBucketUnwrapReaderFactory(inner: PartitionReaderFactory)
    extends PartitionReaderFactory {
  private def unwrap(p: InputPartition): InputPartition = p match {
    case b: LanceBucketedFilePartition => b.inner
    case other => other
  }
  override def supportColumnarReads(partition: InputPartition): Boolean =
    inner.supportColumnarReads(unwrap(partition))
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    inner.createReader(unwrap(partition))
  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] =
    inner.createColumnarReader(unwrap(partition))
}

/** Wraps the vectorized parquet reader factory: delegates the actual read
  * and appends the partition's constant fragment id — a
  * [[ConstantColumnVector]] per columnar batch (no per-row work, stays
  * codegen-friendly), a [[JoinedRow]] per row on the fallback path.
  */
class LanceFragmentIdReaderFactory(inner: PartitionReaderFactory)
    extends PartitionReaderFactory {

  private def unwrap(p: InputPartition) = p.asInstanceOf[LanceFragmentIdFilePartition]

  override def supportColumnarReads(partition: InputPartition): Boolean =
    inner.supportColumnarReads(unwrap(partition).inner)

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = unwrap(partition)
    val r = inner.createReader(p.inner)
    new PartitionReader[InternalRow] {
      private val idRow = new GenericInternalRow(Array[Any](p.fragmentId))
      private val joined = new JoinedRow
      override def next(): Boolean = r.next()
      override def get(): InternalRow = joined(r.get(), idRow)
      override def close(): Unit = r.close()
    }
  }

  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val p = unwrap(partition)
    val r = inner.createColumnarReader(p.inner)
    new PartitionReader[ColumnarBatch] {
      override def next(): Boolean = r.next()
      override def get(): ColumnarBatch = {
        val b = r.get()
        val id = new ConstantColumnVector(math.max(b.numRows, 1), IntegerType)
        id.setInt(p.fragmentId)
        val cols = Array.tabulate[ColumnVector](b.numCols)(b.column) :+ (id: ColumnVector)
        new ColumnarBatch(cols, b.numRows)
      }
      override def close(): Unit = r.close()
    }
  }
}

/** Main-read-path scan used when a query references `__fragment_id`:
  * fragment-per-partition over the (stats-surviving) fragments, data
  * columns clipped to the pruned read schema, id appended per batch.
  * Pushed filters are advisory here exactly as in the parquet path —
  * Spark re-applies them above the scan — so correctness does not depend
  * on this reader filtering.
  */
class LanceMetadataScan(inner: ParquetScan, rootStr: String,
    fragments: Seq[FragmentMeta],
    physToLogical: Map[String, String] = Map.empty)
    extends LanceParquetScan(inner, rootStr, physToLogical) {

  override def readSchema(): StructType =
    StructType(super.readSchema().fields :+ LanceFragmentScan.fragmentIdField)

  override def planInputPartitions(): Array[InputPartition] =
    LanceFragmentScan.fragmentIdPartitions(super.planInputPartitions(), fragments)

  override def createReaderFactory(): PartitionReaderFactory =
    new LanceFragmentIdReaderFactory(super.createReaderFactory())

  override def description(): String =
    s"LanceMetadataScan(${fragments.size} fragments, +${LanceFragmentScan.FragmentIdColumn})"
}
