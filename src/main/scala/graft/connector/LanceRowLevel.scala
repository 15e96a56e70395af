package graft.connector

import graft.format.{FragmentMeta, FragmentStats, LanceFormat, Manifest}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{Batch, InputPartition, Scan, ScanBuilder, SupportsPushDownFilters}
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
  * machinery). When the condition is NOT statically pushable (a modulo, a
  * MERGE whose ON keys live in the source), runtime group filtering takes
  * over: the scan serves `__fragment_id` ([[LanceFragmentScan]]) and
  * Spark's matching-groups subquery narrows the rewrite to the fragments
  * that actually hold matches ([[LanceRowLevelScan.filter]]).
  */
class LanceRowLevelOperationBuilder(rootStr: String, info: RowLevelOperationInfo)
    extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new LanceRowLevelOperation(rootStr, info.command)
}

class LanceRowLevelOperation(rootStr: String, cmd: RowLevelOperation.Command)
    extends RowLevelOperation {

  /** Set by the scan at build time (and narrowed again by runtime group
    * filtering), read by the write at commit time — the same operation
    * instance spans both, which is how the affected groups travel from
    * plan to commit (the Iceberg group-based shape).
    */
  @volatile private[connector] var affected: Option[(Manifest, Seq[FragmentMeta])] = None

  override def command(): RowLevelOperation.Command = cmd

  /** Ask Spark to thread `__fragment_id` through the rewritten query:
    * the rewrite rules resolve it on the relation (metadata column), the
    * row-level scan serves it per row, and
    * `RowLevelOperationRuntimeGroupFiltering` can then plan the matching-
    * groups subquery and hand the id set to [[LanceRowLevelScan.filter]].
    * Declaring it also makes ReplaceDataExec strip the operation/metadata
    * columns itself before the write.
    */
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column(
      LanceFragmentScan.FragmentIdColumn))

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

  override def build(): Scan =
    new LanceRowLevelScan(op, rootStr, manifest, candidates, spark, options)
}

/** Fragment-per-partition scan over the candidate fragments of one pinned
  * manifest, each row carrying its `__fragment_id`. Implements
  * `SupportsRuntimeV2Filtering` on that id: Spark's
  * RowLevelOperationRuntimeGroupFiltering plans a subquery for the
  * DISTINCT fragment ids of rows actually matching the command condition
  * (evaluated on a regular batch scan of the table) and calls [[filter]]
  * with the resulting IN set — narrowing both the partitions scanned AND
  * the fragments the commit replaces. A MERGE whose ON keys are not
  * statically pushable thus rewrites only the fragments holding matches.
  * Unrecognized predicates narrow nothing (conservative: keeping a
  * fragment is always correct — its rows are rewritten unchanged).
  */
class LanceRowLevelScan(op: LanceRowLevelOperation, rootStr: String,
    manifest: Manifest, initial: Seq[FragmentMeta],
    spark: SparkSession, options: CaseInsensitiveStringMap)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {

  import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference}
  import org.apache.spark.sql.connector.expressions.filter.Predicate

  private val root = new Path(rootStr)
  private var candidates: Seq[FragmentMeta] = initial
  op.affected = Some((manifest, candidates))

  /** Vectorized scan over ALL build-time candidates (nothing pushed: the
    * rewrite needs every row of the fragments it replaces); runtime group
    * filtering narrows PARTITIONS, not this plan — the reader factory and
    * chunk planning are file-set-independent, so narrowing is free.
    */
  private lazy val innerScan: Scan = {
    // metadata-only planning when the manifest recorded sizes (the read
    // path's LanceManifestFileIndex posture); listing as the fallback
    val index =
      if (initial.nonEmpty && initial.forall(_.bytes.isDefined))
        new LanceManifestFileIndex(spark,
          initial.map(f => (LanceFormat.fragmentPath(root, f.file), f.bytes.get)),
          manifest.schema)
      else {
        val files = initial.map(f => LanceFormat.fragmentPath(root, f.file))
        new InMemoryFileIndex(spark, files, Map.empty[String, String],
          Some(manifest.schema), FileStatusCache.getOrCreate(spark), None, None)
      }
    new ParquetScanBuilder(spark, index, manifest.schema, manifest.schema, options).build()
  }

  override def readSchema(): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      manifest.schema.fields :+ LanceFragmentScan.fragmentIdField)

  override def toBatch: Batch = this

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(LanceFragmentScan.FragmentIdColumn))

  private def isFragmentIdRef(e: org.apache.spark.sql.connector.expressions.Expression) =
    e match {
      case r: NamedReference =>
        r.fieldNames.sameElements(Array(LanceFragmentScan.FragmentIdColumn))
      case _ => false
    }

  private def intLit(e: org.apache.spark.sql.connector.expressions.Expression): Option[Int] =
    e match {
      case l: Literal[_] => l.value match {
        case i: Integer => Some(i.intValue())
        case _ => None
      }
      case _ => None
    }

  /** The finite id set a predicate allows, if it provably constrains
    * `__fragment_id` to one (`IN` over literals, or `=` either way round).
    */
  private def allowedIds(p: Predicate): Option[Set[Int]] = p.name() match {
    case "IN" if p.children().nonEmpty && isFragmentIdRef(p.children().head) =>
      val vals = p.children().tail.map(intLit(_).getOrElse(return None))
      Some(vals.toSet)
    case "=" => p.children() match {
      case Array(r, l) if isFragmentIdRef(r) => intLit(l).map(Set(_))
      case Array(l, r) if isFragmentIdRef(r) => intLit(l).map(Set(_))
      case _ => None
    }
    case _ => None
  }

  override def filter(predicates: Array[Predicate]): Unit = {
    val sets = predicates.flatMap(allowedIds)
    if (sets.nonEmpty) {
      val keep = sets.reduce(_ intersect _)
      candidates = candidates.filter(f => keep.contains(f.id))
      op.affected = Some((manifest, candidates))
    }
  }

  override def planInputPartitions(): Array[InputPartition] =
    LanceFragmentScan.fragmentIdPartitions(
      innerScan.toBatch.planInputPartitions(), candidates, dropUnlisted = true)

  override def createReaderFactory(): org.apache.spark.sql.connector.read.PartitionReaderFactory =
    new LanceFragmentIdReaderFactory(innerScan.toBatch.createReaderFactory())

  override def description(): String =
    s"LanceRowLevelScan(${candidates.size}/${manifest.fragments.size} fragments)"
}

/** Commits the replacement rows over the scan's candidate fragments. */
class LanceReplaceGroupsBatchWrite(rootStr: String,
    schema: org.apache.spark.sql.types.StructType, conf: SerializableConf,
    op: LanceRowLevelOperation) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // a bucketed table's DML rewrites stay bucket-pure: route like every
    // other write path (rewrites read+write PHYSICAL names, like `schema`)
    val root = new Path(rootStr)
    val bucketSpec = LanceFormat.readLatest(
        LanceFormat.fileSystem(root, conf.value), root)
      .flatMap(m => m.bucketBy.map(b =>
        (b.widthsVec, b.columns.map(m.physicalName))))
    new LanceReplaceWriterFactory(rootStr, schema.json, conf, bucketSpec)
  }

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
    conf: SerializableConf,
    bucketSpec: Option[(Seq[Int], Seq[String])] = None) extends DataWriterFactory {
  import org.apache.spark.sql.catalyst.InternalRow

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val schema = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val inner = new LanceDataWriter(rootStr, schemaJson, conf.value, 1000000L,
      bucketSpec = bucketSpec)
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
