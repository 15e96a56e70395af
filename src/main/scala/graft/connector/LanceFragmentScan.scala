package graft.connector

import graft.format.{FragmentMeta, LanceFormat}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.catalog.MetadataColumn
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.types.{DataType, IntegerType, StructField, StructType}

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
  *    condition and hands the id set to the row-level scan
  *    ([[LanceRowLevelScan.filter]]) — so a MERGE whose ON keys are not
  *    statically pushable still rewrites only the fragments that actually
  *    hold matches, found at the cost of one narrow pre-scan instead of a
  *    full-table rewrite.
  *
  * Serving the column needs per-row fragment identity, which the
  * vectorized parquet scan (file-packed partitions) cannot provide, so
  * these scans go fragment-per-partition with the row-based reader — the
  * same unit the reference parallelizes by (`ref:LanceSource.java:173-186`).
  * The column is only materialized when a query names it; plain scans keep
  * the vectorized path.
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
}

case class LanceFragmentIdPartition(file: String, fragmentId: Int) extends InputPartition

/** Row-based fragment reader that appends the partition's constant
  * fragment id after the data columns.
  */
class LanceFragmentIdReaderFactory(dataSchemaJson: String,
    conf: SerializableConf) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LanceFragmentIdPartition]
    val inner = new LanceFragmentReaderFactory(dataSchemaJson, conf)
      .createReader(LanceFragmentPartition(p.file))
    new PartitionReader[InternalRow] {
      private val idRow = new GenericInternalRow(Array[Any](p.fragmentId))
      private val joined = new JoinedRow
      override def next(): Boolean = inner.next()
      override def get(): InternalRow = joined(inner.get(), idRow)
      override def close(): Unit = inner.close()
    }
  }
}

/** Main-read-path scan used when a query references `__fragment_id`:
  * one partition per (stats-surviving) fragment, data columns clipped to
  * the pruned read schema, id appended per row. Pushed filters are
  * advisory here exactly as in the parquet path — Spark re-applies them
  * above the scan — so correctness does not depend on this reader
  * filtering.
  */
class LanceMetadataScan(inner: ParquetScan, rootStr: String,
    fragments: Seq[FragmentMeta]) extends LanceParquetScan(inner, rootStr) {

  private val root = new Path(rootStr)

  override def readSchema(): StructType =
    StructType(super.readSchema().fields :+ LanceFragmentScan.fragmentIdField)

  override def planInputPartitions(): Array[InputPartition] =
    fragments.map(f => LanceFragmentIdPartition(
      new Path(LanceFormat.dataPath(root), f.file).toString, f.id): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = {
      val c = sparkSession.sessionState.newHadoopConf()
      c.set("spark.sql.session.timeZone", sparkSession.sessionState.conf.sessionLocalTimeZone)
      new SerializableConf(c)
    }
    new LanceFragmentIdReaderFactory(super.readSchema().json, conf)
  }

  override def description(): String =
    s"LanceMetadataScan(${fragments.size} fragments, +${LanceFragmentScan.FragmentIdColumn})"
}
