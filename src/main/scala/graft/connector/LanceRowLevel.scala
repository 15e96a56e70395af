package graft.connector

import graft.format.{FragmentMeta, FragmentStats, LanceFormat, Manifest}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.{FileStatusCache, InMemoryFileIndex}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Group-based (copy-on-write) row-level operations: the DSv2 surface
  * behind native SQL `UPDATE`, `MERGE INTO`, and non-translatable
  * `DELETE` conditions. Spark's rewrite rules (RewriteUpdateTable /
  * RewriteMergeIntoTable / RewriteDeleteFromTable) plan a ReplaceData:
  * scan every row of the AFFECTED groups, apply the command's logic as
  * ordinary expressions/joins, and hand the replacement rows to this
  * operation's write. Our group = the manifest fragment:
  *
  *  - the scan uses Spark's pushed command condition ONLY to choose
  *    candidate fragments via manifest stats ([[FragmentStats.prune]]) —
  *    it must NOT row-filter, because rows that don't match the condition
  *    still belong to the replacement content of their fragment (a pushed
  *    parquet filter would silently drop them: data loss, not an
  *    optimization);
  *  - the write commits [[LanceFormat.commitReplace]] over exactly the
  *    fragments the scan selected — concurrent appends merge, conflicting
  *    rewrites fail loud. MERGE inserts ride the same commit (rows of
  *    unmatched source keys land in the new fragments).
  *
  * Simple translatable DELETEs never get here: Spark's
  * OptimizeMetadataOnlyDeleteFromTable converts them back to the
  * [[LanceTable.deleteWhere]] path (same stats-scoped rewrite, no join
  * machinery). A MERGE whose ON keys Spark cannot turn into pushable
  * bounds rewrites every fragment — correct, just unscoped; the
  * `CALL upsert` procedure stays the key-scoped fast path.
  */
class LanceRowLevelOperationBuilder(rootStr: String, info: RowLevelOperationInfo)
    extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new LanceRowLevelOperation(rootStr, info.command)
}

class LanceRowLevelOperation(rootStr: String, cmd: RowLevelOperation.Command)
    extends RowLevelOperation {

  /** Set by the scan at build time, read by the write at commit time —
    * the same operation instance spans both, which is how the affected
    * groups travel from plan to commit (the Iceberg group-based shape).
    */
  @volatile private[connector] var affected: Option[(Manifest, Seq[FragmentMeta])] = None

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LanceRowLevelScanBuilder(this, rootStr, options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = new WriteBuilder {
    override def build(): Write = new Write {
      override def toBatch: BatchWrite = new LanceReplaceGroupsBatchWrite(
        rootStr, info.schema(), LanceWrite.writerConf(SparkSession.active),
        LanceRowLevelOperation.this)
    }
  }
}

/** Scan over the candidate fragments of one pinned manifest. Pushed
  * filters select FRAGMENTS (inclusive: a kept fragment returns all its
  * rows); every filter is reported back as unhandled so nothing above
  * assumes row-level application.
  */
class LanceRowLevelScanBuilder(op: LanceRowLevelOperation, rootStr: String,
    options: CaseInsensitiveStringMap) extends ScanBuilder with SupportsPushDownFilters {

  private val spark = SparkSession.active
  private val root = new Path(rootStr)
  private val manifest: Manifest = {
    val fs = LanceFormat.fileSystem(root, spark.sessionState.newHadoopConf())
    LanceFormat.readLatest(fs, root).getOrElse(
      throw new IllegalArgumentException(s"no lance dataset at $rootStr"))
  }
  private var candidates: Seq[FragmentMeta] = manifest.fragments

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    candidates = FragmentStats.prune(manifest.schema, manifest.fragments, filters)
    filters // all unhandled: candidate fragments surface every row
  }
  override def pushedFilters(): Array[Filter] = Array.empty

  override def build(): Scan = {
    op.affected = Some((manifest, candidates))
    val files = candidates.map(f => new Path(LanceFormat.dataPath(root), f.file))
    val index = new InMemoryFileIndex(spark, files, Map.empty[String, String],
      Some(manifest.schema), FileStatusCache.getOrCreate(spark), None, None)
    // a fresh builder with nothing pushed: plain vectorized scan of the
    // candidate files, full rows
    new ParquetScanBuilder(spark, index, manifest.schema, manifest.schema, options).build()
  }
}

/** Commits the replacement rows over the scan's candidate fragments. */
class LanceReplaceGroupsBatchWrite(rootStr: String,
    schema: org.apache.spark.sql.types.StructType, conf: SerializableConf,
    op: LanceRowLevelOperation) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new LanceReplaceWriterFactory(rootStr, schema.json, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val frags = messages.collect { case LanceCommitMessage(f) => f }.flatten.toSeq
    val (m, cands) = op.affected.getOrElse(throw new IllegalStateException(
      "row-level write committed before its scan was planned"))
    val root = new Path(rootStr)
    val fs = LanceFormat.fileSystem(root, conf.value)
    if (cands.nonEmpty)
      LanceFormat.commitReplace(fs, root, m.schema, cands.map(_.id).toSet, frags)
    else if (frags.nonEmpty)
      // zero affected groups but rows written: a MERGE whose matches were
      // all pruned away — the replacement rows are pure inserts
      LanceFormat.commitAppend(fs, root, m.schema, frags)
    // else: nothing affected, nothing written — a no-op commits no version
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    LanceWrite.deleteFiles(rootStr, conf.value, messages)
}

/** The group-based rewrite prepends `RowDeltaUtils.OPERATION_COLUMN` to
  * every replacement row, and ReplaceDataExec only strips it for
  * operations that declare `requiredMetadataAttributes` (we have none —
  * the fragment snapshot travels through the operation instance instead).
  * This factory wraps the ordinary fragment writer with a projection that
  * skips that leading column; rows already matching the data schema pass
  * through untouched.
  */
class LanceReplaceWriterFactory(rootStr: String, schemaJson: String,
    conf: SerializableConf) extends DataWriterFactory {
  import org.apache.spark.sql.catalyst.InternalRow

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val schema = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val inner = new LanceDataWriter(rootStr, schemaJson, conf.value, 1000000L)
    new DataWriter[InternalRow] {
      private val proj =
        org.apache.spark.sql.catalyst.ProjectingInternalRow(schema, 1 to schema.length)
      override def write(row: InternalRow): Unit =
        if (row.numFields == schema.length + 1) { proj.project(row); inner.write(proj) }
        else inner.write(row)
      override def commit(): WriterCommitMessage = inner.commit()
      override def abort(): Unit = inner.abort()
      override def close(): Unit = inner.close()
    }
  }
}
