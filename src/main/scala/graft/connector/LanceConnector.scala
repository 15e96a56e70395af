package graft.connector

import graft.format.{FragmentMeta, LanceFormat, Manifest}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.{FileStatusCache, InMemoryFileIndex}
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util
import scala.jdk.CollectionConverters._

/** `spark.read.format("lance")` / `df.write.format("lance")` entry point.
  *
  * Spark-native re-expression of the reference connector's source/sink
  * (SURVEY §2.1 S1–S7, S11): a Lance-style dataset directory (immutable
  * fragments + `_versions` manifests) surfaced through DataSource V2.
  * Unlike the reference — which degenerates to a single subtask whenever a
  * filter, limit or aggregate is pushed (`LanceSource.java:156-170`) — every
  * scan here stays fragment-parallel: pushdown handling is delegated to
  * Spark's vectorized Parquet scan over the manifest's fragment files, so
  * projection/filter/aggregate pushdown (P1–P8, A1) and columnar batches
  * come from the engine.
  */
class LanceDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "lance"
  override def supportsExternalMetadata(): Boolean = true

  private def path(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "option 'path' is required for the lance format")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val root = new Path(path(options))
    val fs = LanceFormat.fileSystem(root, spark.sessionState.newHadoopConf())
    val base = LanceTable.resolveManifest(fs, root, options)
      .map(_.schema)
      .getOrElse(throw new IllegalArgumentException(
        s"no lance dataset at $root (missing ${LanceFormat.VersionsDir})"))
    // streaming CDC mode: the relation carries the change-row columns
    if (options.getBoolean(LanceChangeFeed.Option, false))
      StructType(base.fields ++ LanceChangeFeed.metaFields)
    else base
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new LanceTable(path(new CaseInsensitiveStringMap(properties)), schema)
}

/** A file index served entirely from manifest metadata — ZERO filesystem
  * calls at plan time: the manifest already knows every fragment's path
  * and byte size, so there is nothing to list. At a million fragments
  * the per-file `getFileStatus` storm of a listing-based index IS the
  * query-planning latency; Iceberg plans from manifests for the same
  * reason. Modification times are synthetic (0) — nothing in the scan
  * path reads them — and the index is static: MVCC manifests are
  * immutable, refresh is a no-op.
  */
class LanceManifestFileIndex(spark: SparkSession,
    files: Seq[(Path, Long)], schema: StructType)
    extends org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex(
      spark, Map.empty[String, String], Some(schema),
      FileStatusCache.getOrCreate(spark)) {
  import org.apache.hadoop.fs.FileStatus

  private val statuses: Seq[FileStatus] = {
    // the base class looks paths up FULLY QUALIFIED (scheme + authority);
    // makeQualified is pure string work against the FS URI, not an RPC
    val conf = spark.sessionState.newHadoopConf()
    var lastFs: (String, org.apache.hadoop.fs.FileSystem) = null
    files.map { case (p, len) =>
      val scheme = Option(p.toUri.getScheme).getOrElse("")
      if (lastFs == null || lastFs._1 != scheme)
        lastFs = (scheme, p.getFileSystem(conf))
      new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L,
        lastFs._2.makeQualified(p))
    }
  }

  override def partitionSpec(): org.apache.spark.sql.execution.datasources.PartitionSpec =
    org.apache.spark.sql.execution.datasources.PartitionSpec.emptySpec

  override val leafFiles: scala.collection.mutable.LinkedHashMap[Path, FileStatus] = {
    val m = new scala.collection.mutable.LinkedHashMap[Path, FileStatus]()
    statuses.foreach(s => m.put(s.getPath, s))
    m
  }

  override val leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    statuses.groupBy(_.getPath.getParent).map { case (d, fs) => d -> fs.toArray }

  override def rootPaths: Seq[Path] = statuses.map(_.getPath)

  override def refresh(): Unit = ()
}

object LanceTable {
  /** Pick the manifest for `versionAsOf` / `timestampAsOf` / `tagAsOf`
    * (time travel) or latest. `timestampAsOf` accepts epoch millis, an
    * ISO-8601 instant (`2026-01-01T00:00:00Z`), or `yyyy-MM-dd HH:mm:ss`
    * interpreted as UTC, and resolves to the newest version committed at
    * or before it — the path-read twin of the catalog's SQL
    * `TIMESTAMP AS OF`. `tagAsOf` resolves a named tag
    * ([[LanceFormat.writeTag]]) to its pinned version.
    */
  def resolveManifest(fs: org.apache.hadoop.fs.FileSystem, root: Path,
      options: CaseInsensitiveStringMap): Option[Manifest] = {
    if (!LanceFormat.isDataset(fs, root)) return None
    // `branch` switches the LINEAGE the other travel options resolve in
    // (versionAsOf/timestampAsOf address versions WITHIN the branch);
    // tags are main-lineage names and cannot combine with a branch
    val branch = Option(options.get("branch")).map(_.trim).filter(_.nonEmpty)
    val dir = branch match {
      case Some(b) =>
        val bp = LanceFormat.branchPath(root, b)
        require(fs.exists(bp), s"no branch '$b' at $root")
        bp
      case None => LanceFormat.versionsPath(root)
    }
    (Option(options.get("versionAsOf")), Option(options.get("timestampAsOf")),
        Option(options.get("tagAsOf"))) match {
      case (Some(v), None, None) => Some(LanceFormat.readManifestIn(fs, dir, v.toLong))
      case (None, Some(ts), None) =>
        val cutoffMs = parseTimestampMs(ts)
        val v = LanceFormat.listVersionsIn(fs, dir)
          .filter(LanceFormat.readManifestIn(fs, dir, _).committedAtMs <= cutoffMs)
          .lastOption.getOrElse(throw new IllegalArgumentException(
            s"no version of $root existed at or before timestampAsOf=$ts"))
        Some(LanceFormat.readManifestIn(fs, dir, v))
      case (None, None, Some(tag)) =>
        require(branch.isEmpty,
          "tagAsOf names a main-lineage snapshot; it cannot combine with branch")
        val info = LanceFormat.readTag(fs, root, tag).getOrElse(
          throw new IllegalArgumentException(s"no tag '$tag' at $root"))
        Some(LanceFormat.readManifest(fs, root, info.version))
      case (None, None, None) => LanceFormat.readLatestIn(fs, dir)
      case _ => throw new IllegalArgumentException(
        "set only one of versionAsOf, timestampAsOf, tagAsOf")
    }
  }

  private def parseTimestampMs(s: String): Long =
    if (s.forall(_.isDigit)) s.toLong
    else try java.time.Instant.parse(s).toEpochMilli
    catch {
      case _: java.time.format.DateTimeParseException =>
        java.time.LocalDateTime.parse(s.replace(' ', 'T'))
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    }

  val Capabilities: util.Set[TableCapability] = Set(
    TableCapability.BATCH_READ,
    TableCapability.MICRO_BATCH_READ,
    TableCapability.BATCH_WRITE,
    TableCapability.TRUNCATE,
    TableCapability.OVERWRITE_BY_FILTER,
    TableCapability.STREAMING_WRITE).asJava
}

/** A Lance dataset as a Spark Table (path-addressed or catalog-loaded).
  * `pinnedVersion` pins every scan to one manifest — the catalog's SQL
  * time travel (`VERSION AS OF` / `TIMESTAMP AS OF`); the path-addressed
  * `versionAsOf` read option still takes precedence when set.
  * `pinnedBranch` pins every scan to a BRANCH lineage's head — the
  * catalog's `VERSION AS OF 'branch:<name>'` (SQL users cannot pass read
  * options, so without it branches were Scala-only). A branch-pinned
  * table is read-only through SQL: branch writes go through the
  * `write.branch` option, which validates the lineage exists.
  */
class LanceTable(val rootStr: String, declaredSchema: StructType,
    pinnedVersion: Option[Long] = None,
    pinnedBranch: Option[String] = None) extends Table
    with SupportsRead with SupportsWrite with SupportsDelete
    with SupportsRowLevelOperations with SupportsMetadataColumns {

  /** Row provenance + runtime group filtering ([[LanceFragmentScan]]). */
  override def metadataColumns(): Array[MetadataColumn] =
    Array(LanceFragmentScan.fragmentIdMetadataColumn)

  /** Surface table-level declarations in `DESCRIBE EXTENDED` /
    * `SHOW TBLPROPERTIES`: CHECK/UNIQUE/NOT NULL rules, the declared
    * clustering spec, rename mappings, and the current version —
    * otherwise a SQL-only user has no way to see what the manifest
    * enforces. Snapshot per Table instance (one manifest read, lazy).
    */
  override def properties(): java.util.Map[String, String] = tableProps

  private lazy val tableProps: java.util.Map[String, String] = {
    val out = new java.util.HashMap[String, String]()
    try {
      val root = new org.apache.hadoop.fs.Path(rootStr)
      val fs = LanceFormat.fileSystem(root,
        SparkSession.active.sessionState.newHadoopConf())
      LanceFormat.readLatest(fs, root).foreach { m =>
        out.put("lance.version", m.version.toString)
        m.clusterBy.foreach(cs => out.put("lance.cluster-by", cs.mkString(",")))
        m.bucketBy.foreach { b =>
          out.put("lance.bucket-by",
            if (b.widths.isEmpty) s"${b.numBuckets}:${b.columns.mkString(",")}"
            // mixed widths render Iceberg-style so the display IS the
            // re-declaration syntax
            else b.columns.zip(b.widthsVec)
              .map { case (c, w) => s"bucket($w,$c)" }.mkString(","))
          // storage-partitioned joins engage for ANY key width: the scan
          // reports one bucket(n, col) transform per key column and
          // Spark's key-grouped planning matches when the join covers
          // every key column; a subset-key join falls back to the
          // exchange. The row must MIRROR the scan's gate: composite
          // specs whose fragments still carry legacy tuple-hash tags
          // (pre-grid scheme) report unavailable until a rebucket, or
          // a user disabling broadcast on its word gets an unexplained
          // full shuffle.
          out.put("lance.bucket-by.storage-partitioned-join",
            if (b.columns.size == 1) "available"
            else if (!b.compositeTagsReadable)
              "unavailable: legacy tuple-hash bucket tags - " +
                s"CALL rebucket to re-tag, then joins covering all of " +
                s"${b.columns.mkString(",")} run exchange-free"
            else s"available (composite key: the join must cover all of " +
              s"${b.columns.mkString(",")}; subset-key joins shuffle)")
        }
        m.bloomFilters.foreach(bs =>
          out.put("lance.bloom-filters", bs.mkString(",")))
        m.checkConstraints.foreach { case (n, e) =>
          out.put(s"lance.constraint.$n", e) }
        if (m.mapping.nonEmpty)
          out.put("lance.column-mapping",
            m.mapping.toSeq.sortBy(_._1)
              .map { case (l, p) => s"$l->$p" }.mkString(","))
        LanceFormat.columnDefaults(m.schema).foreach { case (c, d) =>
          out.put(s"lance.default.$c", d) }
        // free-form user / MV-bookkeeping properties, verbatim (keys
        // can't collide with the lance.* rows — that namespace is
        // refused by the set API)
        m.properties.foreach(_.foreach { case (k, v) => out.put(k, v) })
      }
    } catch { case _: Exception => () } // DESCRIBE must never fail a read
    out
  }

  /** SQL `UPDATE` / `MERGE INTO` / non-translatable `DELETE`: group-based
    * copy-on-write rewrite ([[LanceRowLevelOperation]]). Translatable
    * DELETEs are converted back to [[deleteWhere]] by Spark's
    * metadata-only-delete optimization.
    */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(pinnedVersion.isEmpty,
      s"cannot modify a time-travel snapshot of $rootStr")
    require(pinnedBranch.isEmpty,
      s"cannot modify a branch-pinned read of $rootStr (branches are " +
        "append-only; write through option(\"write.branch\", ...))")
    new LanceRowLevelOperationBuilder(rootStr, info)
  }

  /** SQL `DELETE FROM lance.db.t WHERE ...`: Spark hands over the fully
    * translated condition (an untranslatable one fails the query before
    * reaching here); the copy-on-write rewrite is stats-scoped to the
    * fragments that may match ([[graft.operators.Dml.deleteWhere]]).
    */
  override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    pinnedVersion.isEmpty && pinnedBranch.isEmpty
  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    require(pinnedVersion.isEmpty && pinnedBranch.isEmpty,
      s"cannot DELETE from a time-travel or branch-pinned snapshot of $rootStr")
    graft.operators.Dml.deleteWhere(SparkSession.active, rootStr,
      graft.operators.Dml.filtersToColumn(filters,
        flatCols = schema().fieldNames.toSet))
  }

  /** The time-travel pin, if any (AnnIndexRewrite must not fire on it). */
  def pinned: Option[Long] = pinnedVersion
  /** The branch pin, if any (AnnIndexRewrite must not fire on it either —
    * the index covers MAIN's lineage, not the branch's). */
  def pinnedBranchName: Option[String] = pinnedBranch

  private val root = new Path(rootStr)

  override def name(): String =
    s"lance.`$rootStr`" + pinnedVersion.fold("")(v => s"@v$v") +
      pinnedBranch.fold("")(b => s"@branch:$b")
  override def capabilities(): util.Set[TableCapability] = LanceTable.Capabilities

  private def manifestFor(fs: org.apache.hadoop.fs.FileSystem,
      options: CaseInsensitiveStringMap): Option[Manifest] =
    (pinnedVersion, pinnedBranch) match {
      case (Some(v), _) if options.get("versionAsOf") == null =>
        Some(LanceFormat.readManifest(fs, root, v))
      case (None, Some(b)) if options.get("branch") == null =>
        // SQL branch pin: the branch lineage's head at scan time (the
        // same freshness semantics as a main-lineage SQL read)
        val bp = LanceFormat.branchPath(root, b)
        require(fs.exists(bp), s"no branch '$b' at $root")
        LanceFormat.readLatestIn(fs, bp)
      case _ => LanceTable.resolveManifest(fs, root, options)
    }

  override def schema(): StructType = {
    if (declaredSchema != null && declaredSchema.nonEmpty) declaredSchema
    else {
      val spark = SparkSession.active
      val fs = LanceFormat.fileSystem(root, spark.sessionState.newHadoopConf())
      manifestFor(fs, CaseInsensitiveStringMap.empty())
        .map(_.schema).getOrElse(new StructType())
    }
  }

  /** One InputPartition per fragment (the reference's parallelism unit,
    * `LanceSource.java:173-186`) falls out of listing exactly the
    * manifest's fragment files: Spark splits/packs them into partitions
    * with locality, and row-group pruning still applies within fragments.
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val spark = SparkSession.active
    val fs = LanceFormat.fileSystem(root, spark.sessionState.newHadoopConf())
    val manifest = manifestFor(fs, options)
    val files = manifest.map(m => LanceFormat.fragmentFiles(root, m)).getOrElse(Seq.empty)
    // the parquet layer works in PHYSICAL names (what fragment files
    // carry — stable across RENAME COLUMN); the scan reports LOGICAL
    // names back to Spark. Rows are positional, so the two schemas are
    // interchangeable at execution.
    val dataSchema = manifest.map(_.physicalSchema).getOrElse(schema())
    // metadata-only planning when the manifest recorded every file's
    // size (zero getFileStatus calls); listing only as the fallback for
    // pre-`bytes` manifests
    val index = manifest match {
      case Some(m) if m.fragments.nonEmpty && m.fragments.forall(_.bytes.isDefined) =>
        new LanceManifestFileIndex(spark,
          m.fragments.map(f =>
            (LanceFormat.fragmentPath(root, f.file), f.bytes.get)), dataSchema)
      case _ => new InMemoryFileIndex(spark, files, Map.empty[String, String],
        Some(dataSchema), FileStatusCache.getOrCreate(spark), None, None)
    }
    new LanceScanBuilder(spark, index, dataSchema, options, rootStr, manifest)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinnedBranch.isEmpty,
      s"cannot write through a branch-pinned read of $rootStr; branch " +
        "writes use df.write.format(\"lance\").option(\"write.branch\", ...)")
    new LanceWriteBuilder(rootStr, info)
  }
}

/** Batch scans inherit the full vectorized-parquet pushdown surface; the
  * built Scan is wrapped only to add `toMicroBatchStream` (streaming reads
  * use the same pruned read schema; parquet row-group filters are advisory
  * and stay in the plan, so ignoring them in the stream is correct).
  *
  * Some aggregates are answered without touching data at all: an
  * ungrouped, unfiltered COUNT(*) / COUNT(col) / MIN(col) / MAX(col)
  * comes straight from the manifest, which already carries per-fragment
  * row counts and exact column min/max/nullCount stats (A1/S4; reference
  * analogue `LanceAggregateSource.java:135-157` reading
  * `LanceSplit.java:53,92-94`) — on a 100 TB dataset that is one JSON
  * read instead of opening a million parquet footers. Served only when
  * every fragment's stats PROVE the exact answer (numeric/date/timestamp/
  * boolean columns always; strings only when no bound hit the truncation
  * cap — a clipped bound is not an attained value; NaN or missing stats
  * bail out). Anything else (grouped, filtered, distinct, other types)
  * falls through to Spark's parquet footer pushdown.
  */
class LanceScanBuilder(spark: SparkSession,
    index: org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex,
    dataSchema: StructType,
    options: CaseInsensitiveStringMap, rootStr: String,
    manifest: Option[Manifest] = None)
    extends ParquetScanBuilder(spark, index, dataSchema, dataSchema, options) {

  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
  import org.apache.spark.sql.types._

  /** RENAME COLUMN translation boundary: Spark talks LOGICAL names
    * (relation output), parquet files hold PHYSICAL names. Pruning and
    * filter pushdown translate logical→physical on the way down; the
    * built scan reports the logical readSchema back up. Identity (and
    * zero-cost) for any table never renamed. */
  private val mapping: Map[String, String] =
    manifest.map(_.mapping).getOrElse(Map.empty)
  private val physToLogical: Map[String, String] = mapping.map(_.swap)

  private var manifestAggRow: Option[(StructType, Array[Any])] = None

  private def topCol(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[StructField] = e match {
    case r: NamedReference if r.fieldNames.length == 1 =>
      // dataSchema is physical; the reference arrives logical
      dataSchema.fields.find(_.name ==
        mapping.getOrElse(r.fieldNames.head, r.fieldNames.head))
    case _ => None
  }

  override def pushFilters(filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    if (mapping.isEmpty) return super.pushFilters(filters)
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    // rename attributes to physical so the translated sources.Filters
    // match the parquet footers; exprIds survive, so the post-scan
    // residue still binds to the (logical) scan output
    val translated = filters.map(_.transform {
      case a: AttributeReference if mapping.contains(a.name) =>
        a.withName(mapping(a.name))
    })
    super.pushFilters(translated).map(_.transform {
      case a: AttributeReference if physToLogical.contains(a.name) =>
        a.withName(physToLogical(a.name))
    })
  }

  /** Exact global MIN/MAX of a column from per-fragment stats, or None
    * when the stats cannot PROVE it: a fragment without a stats entry, a
    * bound missing for any reason other than an all-null fragment (NaN
    * observed, pre-stats manifest), or a bound that may not be an attained
    * value (a string at the truncation cap). All-null fragments are
    * skipped; a fully null column yields SQL NULL, like the engine's MIN.
    */
  private def minMaxFromStats(f: StructField, frags: Seq[FragmentMeta],
      isMin: Boolean): Option[Any] = {
    val bounds = Seq.newBuilder[String]
    frags.foreach { fr =>
      val st = fr.stats.flatMap(_.get(f.name)).getOrElse(return None)
      (if (isMin) st.min else st.max) match {
        case Some(b) => bounds += b
        case None if st.nullCount == fr.rowCount => // all-null fragment
        case None => return None // NaN or unknown: stats cannot prove
      }
    }
    val bs = bounds.result()
    def reduceLong(): Option[Any] = {
      val ls = bs.map(_.toLong)
      if (ls.isEmpty) Some(null) else Some(if (isMin) ls.min else ls.max)
    }
    f.dataType match {
      case ByteType => reduceLong().map(v => if (v == null) null else v.asInstanceOf[Long].toByte)
      case ShortType => reduceLong().map(v => if (v == null) null else v.asInstanceOf[Long].toShort)
      case IntegerType | DateType =>
        reduceLong().map(v => if (v == null) null else v.asInstanceOf[Long].toInt)
      case LongType | TimestampType | TimestampNTZType => reduceLong()
      case BooleanType =>
        reduceLong().map(v => if (v == null) null else v.asInstanceOf[Long] == 1L)
      case FloatType | DoubleType =>
        val ds = bs.map(_.toDouble)
        val v = if (ds.isEmpty) null else if (isMin) ds.min else ds.max
        if (v == null) Some(null)
        else if (f.dataType == FloatType) Some(v.asInstanceOf[Double].toFloat)
        else Some(v)
      case d: DecimalType =>
        val ds = bs.map(new java.math.BigDecimal(_))
        if (ds.isEmpty) Some(null)
        else {
          val v = ds.reduce((a, b) =>
            if ((a.compareTo(b) <= 0) == isMin) a else b)
          Some(Decimal(v.setScale(d.scale)))
        }
      case StringType =>
        // string stats are truncated at MaxStatLength: a bound of exactly
        // that length is ambiguous (attained or clipped), so the answer is
        // provable only when EVERY fragment bound is strictly shorter.
        // Compare as UTF8String (code-point order, matching Spark and
        // parquet) — Java String.compareTo diverges on supplementary chars.
        if (!bs.forall(_.length < graft.format.FragmentStats.MaxStatLength)) None
        else {
          val us = bs.map(org.apache.spark.unsafe.types.UTF8String.fromString)
          if (us.isEmpty) Some(null)
          else Some(us.reduce((a, b) => if ((a.compareTo(b) <= 0) == isMin) a else b))
        }
      case _ => None // non-stats-eligible types
    }
  }

  /** The (schema, row) of a fully manifest-answerable aggregation, or
    * None to fall through to parquet footer pushdown. Column order is
    * positional — Spark wires the pushed-agg scan output to the rewritten
    * aggregate by position, group-by columns first (none here).
    */
  private def fromManifest(agg: Aggregation): Option[(StructType, Array[Any])] = {
    val m = manifest.getOrElse(return None)
    if (agg.groupByExpressions.nonEmpty || dataFilters.nonEmpty) return None
    val fields = Seq.newBuilder[StructField]
    val values = Seq.newBuilder[Any]
    agg.aggregateExpressions.foreach {
      case _: CountStar =>
        fields += StructField("count(*)", LongType, nullable = false)
        values += m.rowCount
      case c: Count if !c.isDistinct =>
        val f = topCol(c.column).getOrElse(return None)
        var total = 0L
        m.fragments.foreach { fr =>
          val st = fr.stats.flatMap(_.get(f.name)).getOrElse(return None)
          total += fr.rowCount - st.nullCount // nullCount is always exact
        }
        fields += StructField(s"count(${f.name})", LongType, nullable = false)
        values += total
      case mn: Min =>
        val f = topCol(mn.column).getOrElse(return None)
        values += minMaxFromStats(f, m.fragments, isMin = true).getOrElse(return None)
        fields += StructField(s"min(${f.name})", f.dataType, nullable = true)
      case mx: Max =>
        val f = topCol(mx.column).getOrElse(return None)
        values += minMaxFromStats(f, m.fragments, isMin = false).getOrElse(return None)
        fields += StructField(s"max(${f.name})", f.dataType, nullable = true)
      case _ => return None
    }
    Some((StructType(fields.result()), values.result().toArray))
  }

  /** Set when column pruning requests the `__fragment_id` metadata column
    * ([[LanceFragmentScan]]): the built scan switches to the
    * fragment-per-partition reader that can serve per-row fragment ids.
    */
  private var wantFragmentId = false

  /** Streaming CDC mode (`read.change-feed=true`): the relation includes
    * `_change_type`/`_commit_version`; pruning records which of them the
    * query kept (in order) so the stream reader appends exactly those.
    */
  private val changeFeed = options.getBoolean(LanceChangeFeed.Option, false)
  private var changeMeta: Seq[String] =
    if (changeFeed) LanceChangeFeed.metaFields.map(_.name).toSeq else Seq.empty

  override def pruneColumns(requiredSchema: StructType): Unit = {
    wantFragmentId =
      requiredSchema.fieldNames.contains(LanceFragmentScan.FragmentIdColumn)
    if (changeFeed) changeMeta =
      requiredSchema.fieldNames.toSeq.filter(LanceChangeFeed.metaNames.contains)
    // the change-row names are ordinary data columns on any table NOT in
    // change-feed mode (e.g. a sink that persisted a feed) — strip them
    // from the parquet-side schema only when this read synthesizes them
    super.pruneColumns(LanceFormat.toPhysical(LanceFragmentScan.dropFragmentId(
      if (changeFeed) LanceChangeFeed.dropMeta(requiredSchema) else requiredSchema),
      mapping))
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    fromManifest(agg).isDefined || super.supportCompletePushDown(agg)

  override def pushAggregation(agg: Aggregation): Boolean = fromManifest(agg) match {
    case some @ Some(_) => manifestAggRow = some; true
    case None => super.pushAggregation(agg)
  }

  /** Manifest-stats fragment pruning (driver-side data skipping): with
    * pushed data filters, fragments whose min/max prove no row can match
    * are dropped BEFORE the scan is built — no task, no footer read, no
    * row-group pruning for them. At a million fragments the footer reads
    * alone dwarf a selective query's data; the manifest decides for free.
    * Conservative by construction ([[graft.format.FragmentStats.prune]]);
    * correctness is oracle-gated (s64) and spec'd with planted ranges.
    */
  /** (kept, total) after driver-side pruning — surfaced in the scan's
    * `.explain` description so a pruned plan is visibly pruned. */
  private var pruneInfo: Option[(Int, Int)] = None

  private def statsPruned(base: ParquetScan): ParquetScan = {
    val kept = manifest match {
      case Some(m) if pushedDataFilters.nonEmpty =>
        // layer 1+2: manifest min/max bounds + exact value sets; layer 3:
        // scalar point-lookup index (high-cardinality equality/IN the
        // stats can't answer); layer 4: declared hash-bucket placement
        // (point lookups on the bucket key, zero I/O) — each strictly
        // conservative. Pushed filters and fragment stats both speak
        // PHYSICAL names here.
        graft.format.BucketPrune.prune(m, pushedDataFilters,
          graft.index.ScalarIndex.prune(spark, rootStr, m, pushedDataFilters,
            graft.format.FragmentStats.prune(m.physicalSchema, m.fragments,
              pushedDataFilters)))
      case _ => return base
    }
    pruneInfo = Some((kept.size, manifest.get.fragments.size))
    if (kept.size == manifest.get.fragments.size) base
    else {
      val root = new org.apache.hadoop.fs.Path(rootStr)
      val pruned =
        if (kept.nonEmpty && kept.forall(_.bytes.isDefined))
          new LanceManifestFileIndex(spark,
            kept.map(f => (LanceFormat.fragmentPath(root, f.file), f.bytes.get)),
            dataSchema)
        else {
          val files = kept.map(f => LanceFormat.fragmentPath(root, f.file))
          new InMemoryFileIndex(spark, files, Map.empty[String, String],
            Some(dataSchema), FileStatusCache.getOrCreate(spark), None, None)
        }
      base.copy(fileIndex = pruned)
    }
  }

  override def build(): ParquetScan =
    if (changeFeed)
      new LanceChangeFeedScan(statsPruned(super.build()), rootStr, changeMeta,
        physToLogical)
    else manifestAggRow match {
    case Some((aggSchema, row)) =>
      new LanceManifestAggScan(super.build(), rootStr, aggSchema, row)
    case None if wantFragmentId =>
      val m = manifest.getOrElse(throw new IllegalArgumentException(
        s"${LanceFragmentScan.FragmentIdColumn} requires a lance dataset at $rootStr"))
      val kept =
        if (pushedDataFilters.nonEmpty)
          graft.format.BucketPrune.prune(m, pushedDataFilters,
            graft.index.ScalarIndex.prune(spark, rootStr, m, pushedDataFilters,
              graft.format.FragmentStats.prune(m.physicalSchema, m.fragments,
                pushedDataFilters)))
        else m.fragments
      new LanceMetadataScan(statsPruned(super.build()), rootStr, kept,
        physToLogical)
    case None =>
      val pruned = statsPruned(super.build())
      new LanceParquetScan(pruned, rootStr, physToLogical, manifest, pruneInfo)
  }
}

/** A ParquetScan that additionally answers `toMicroBatchStream` — batch
  * behavior (partitions, pushdown, columnar batches) is inherited verbatim.
  *
  * `physToLogical` closes the RENAME COLUMN loop: the parquet machinery
  * below reads PHYSICAL column names (what fragment files carry), while
  * [[readSchema]] reports the LOGICAL names Spark's plan expects — rows
  * are positional, so no data moves.
  *
  * With `manifest` present the scan also accepts RUNTIME filters
  * ([[org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering]],
  * the dynamic-partition-pruning hook Iceberg uses for file-group
  * filtering): in a star join, Spark collects the broadcast dim side's
  * join keys at execution time and hands them here as an IN predicate —
  * the fragment list is re-pruned through the same manifest-stats /
  * value-set / scalar-index layers the static path uses, so a clustered
  * 100 TB fact table scans only the fragments the dim filter can reach.
  * Static pushdown cannot see these keys (they exist only after the dim
  * filter runs); without this hook the fact side is a full scan.
  * Strictly conservative: untranslatable predicates, missing stats, or
  * an absent manifest leave the partition list unchanged.
  */
class LanceParquetScan(inner: ParquetScan, rootStr: String,
    physToLogical: Map[String, String] = Map.empty,
    manifest: Option[Manifest] = None,
    pruneInfo: Option[(Int, Int)] = None)
    extends ParquetScan(inner.sparkSession, inner.hadoopConf, inner.fileIndex,
      inner.dataSchema, inner.readDataSchema, inner.readPartitionSchema,
      inner.pushedFilters, inner.options, inner.pushedAggregate,
      inner.partitionFilters, inner.dataFilters, inner.pushedVariantExtractions)
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsReportOrdering {

  override def readSchema(): StructType =
    LanceFormat.toPhysical(super.readSchema(), physToLogical)

  /** `.explain` shows what the manifest decided: fragments kept by the
    * driver-side skipping layers and the declared bucket layout — a
    * pruned plan should LOOK pruned, not require a debugger. */
  override def description(): String = {
    val prune = pruneInfo.map { case (k, t) =>
      s", LanceFragments: $k/$t after driver-side pruning" }.getOrElse("")
    val bucket = manifest.flatMap(_.bucketBy).map { b =>
      s", BucketBy: ${b.columns.mkString(",")} x${b.numBuckets}"
    }.getOrElse("")
    super.description() + prune + bucket
  }

  import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
  import org.apache.spark.sql.connector.expressions.filter.Predicate

  /** Columns a runtime filter could prune on: every stats-eligible
    * top-level column (manifest min/max + value sets answer ranges and
    * INs; the scalar index answers high-cardinality points). LOGICAL
    * names — Spark matches them against the relation output. MUST be a
    * subset of the PRUNED read schema: `PartitionPruning` resolves every
    * attribute returned here against the scan relation's output and
    * throws (fails the whole query) on one that column pruning removed.
    */
  override def filterAttributes(): Array[NamedReference] = manifest match {
    case Some(m) =>
      val visible = readSchema().fieldNames.toSet
      m.schema.fields.collect {
        case f if visible.contains(f.name) &&
            graft.format.FragmentStats.eligible(f.dataType) =>
          Expressions.column(f.name)
      }
    case None => Array.empty
  }

  /** Fragment files that survived runtime pruning (by file name — flat
    * UUIDs, collision-free); None until [[filter]] proves something.
    */
  @volatile private var runtimeKept: Option[Set[String]] = None

  /** Spec/diagnostic hook: fragments surviving runtime pruning. */
  private[graft] def runtimeKeptCount: Option[Int] = runtimeKept.map(_.size)

  /** Runtime predicates arrive with LOGICAL attribute names and external
    * literal values (`translateRuntimeFilterV2` builds IN over the
    * collected join keys); stats and the scalar index speak PHYSICAL
    * names. Only shapes we can faithfully rename participate — anything
    * else is dropped, never mistranslated.
    */
  private def toPhysicalFilter(f: sources.Filter): Option[sources.Filter] = {
    val mapping = manifest.map(_.mapping).getOrElse(Map.empty)
    def p(a: String) = mapping.getOrElse(a, a)
    f match {
      case sources.In(a, vs) => Some(sources.In(p(a), vs))
      case sources.EqualTo(a, v) => Some(sources.EqualTo(p(a), v))
      case sources.GreaterThan(a, v) => Some(sources.GreaterThan(p(a), v))
      case sources.GreaterThanOrEqual(a, v) => Some(sources.GreaterThanOrEqual(p(a), v))
      case sources.LessThan(a, v) => Some(sources.LessThan(p(a), v))
      case sources.LessThanOrEqual(a, v) => Some(sources.LessThanOrEqual(p(a), v))
      case sources.And(l, r) =>
        for (lp <- toPhysicalFilter(l); rp <- toPhysicalFilter(r))
          yield sources.And(lp, rp)
      case _ => None
    }
  }

  /** The one predicate shape Spark's runtime-filter translation emits
    * (`DataSourceV2Strategy.translateRuntimeFilterV2`): `IN(col, lit...)`
    * over the collected join keys. Literals are converted back to their
    * external form — the domain [[graft.format.FragmentStats]] normalizes
    * from. Anything else: None (conservative).
    */
  private def inPredicateToV1(p: Predicate): Option[sources.Filter] =
    if (p.name != "IN") None
    else p.children().toSeq match {
      case scala.collection.Seq((ref: NamedReference), rest @ _*)
          if ref.fieldNames.length == 1 && rest.nonEmpty &&
            // driver-side pruning is O(keys × fragments): a dim side that
            // survives its filter with ~10⁴+ keys can't prove absence for
            // meaningful fragment counts anyway — skip, scan as planned
            rest.size <= 10000 &&
            rest.forall(_.isInstanceOf[
              org.apache.spark.sql.connector.expressions.Literal[_]]) =>
        val vals = rest.map {
          case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
            org.apache.spark.sql.catalyst.CatalystTypeConverters
              .convertToScala(l.value(), l.dataType())
        }
        Some(sources.In(ref.fieldNames.head, vals.toArray))
      case _ => None
    }

  override def filter(predicates: Array[Predicate]): Unit = manifest.foreach { m =>
    val phys = predicates.flatMap(inPredicateToV1).flatMap(toPhysicalFilter(_))
    if (phys.nonEmpty) {
      val kept = graft.format.BucketPrune.prune(m, phys.toSeq,
        graft.index.ScalarIndex.prune(sparkSession, rootStr, m,
          phys.toSeq, graft.format.FragmentStats.prune(m.physicalSchema,
            m.fragments, phys)))
      runtimeKept = Some(kept.map(f =>
        f.file.substring(f.file.lastIndexOf('/') + 1)).toSet)
    }
  }

  /** The manifest knows the EXACT row count of every fragment the (stats-
    * pruned) file index kept — report it, so CBO/AQE joins size the build
    * side from real cardinality instead of a bytes-only guess. Only when
    * no data filter was pushed: a pushed filter's selectivity is invisible
    * here, and overstating rows just biases planning away from broadcast
    * (the safe direction) — so in that case stay with the engine's
    * bytes-only estimate rather than claim a row count we can't stand
    * behind. sizeInBytes stays the file-length sum either way (it already
    * reflects fragment pruning — the index lists only kept files).
    */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics = {
    val base = super.estimateStatistics()
    val exactRows: Option[Long] = manifest match {
      case Some(m) if dataFilters.isEmpty =>
        val byName = m.fragments.map(f =>
          f.file.substring(f.file.lastIndexOf('/') + 1) -> f.rowCount).toMap
        val counts = fileIndex.allFiles().map(f => byName.get(f.getPath.getName))
        if (counts.forall(_.isDefined)) Some(counts.flatten.sum) else None
      case _ => None
    }
    val colStats = ndvColumnStats
    if (exactRows.isEmpty && colStats.isEmpty) base
    else new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong = base.sizeInBytes()
      override def numRows(): java.util.OptionalLong =
        exactRows.map(java.util.OptionalLong.of).getOrElse(base.numRows())
      override def columnStats(): java.util.Map[NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
        val out = new java.util.HashMap[NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
        colStats.foreach { case (c, s) => out.put(Expressions.column(c), s) }
        out
      }
    }
  }

  /** ANALYZE sidecar ([[graft.Lance.analyze]]) → DSv2 column statistics:
    * NDV (HLL estimate), exact nullCount from fragment stats, byte
    * lengths — what CBO join reordering and build-side choice run on.
    * Served only when no data filter was pushed (a full-table NDV is not
    * TRUE of a filtered scan; understating nothing is the safe side) and
    * the sidecar exists; staleness is fine (every warehouse serves the
    * last ANALYZE until the next one).
    */
  private lazy val ndvColumnStats: Map[String,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics] =
    if (dataFilters.nonEmpty || manifest.isEmpty) Map.empty
    else {
      // planning runs this on EVERY query: cache the rendered sidecar,
      // keyed to stay truthful across every refresh path — NORMALIZED
      // root (a trailing-slash spelling must hit the same entry ANALYZE
      // invalidates), lineage (branch v3 and main v3 are different
      // fragment sets under the same number), manifest version, and the
      // sidecar's mtime (a re-ANALYZE bumps no version — the mtime is
      // what expires the entry, including from ANOTHER application's
      // nightly optimize). The raw path re-reads the stats JSON and
      // re-sums per-fragment nullCounts, O(columns × fragments) driver
      // work that at a million fragments IS the planning latency; the
      // one getFileStatus the mtime costs is noise next to it.
      val visible = readSchema().fieldNames.toSet
      val root = new org.apache.hadoop.fs.Path(rootStr)
      val branch = Option(inner.options.get("branch")).getOrElse("")
      val mtime = try {
        val fs = LanceFormat.fileSystem(root, sparkSession.sessionState.newHadoopConf())
        fs.getFileStatus(graft.format.TableStats.statsPath(root)).getModificationTime
      } catch { case _: Exception => -1L } // no sidecar: cached negative
      ScanStatsCache.get(s"${root.toString}#$branch",
        manifest.get.version, mtime)(ndvColumnStats0)
        .view.filterKeys(visible.contains).toMap
    }

  private def ndvColumnStats0: Map[String,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
    val m = manifest.get
    val root = new org.apache.hadoop.fs.Path(rootStr)
    val fs = try Some(LanceFormat.fileSystem(root,
      sparkSession.sessionState.newHadoopConf())) catch { case _: Exception => None }
    val stored = try fs.flatMap(graft.format.TableStats.read(_, root))
    catch { case _: Exception => None }
    stored match {
      case None => Map.empty
      case Some(s) =>
        // the sidecar keys columns by their LOGICAL name AT ANALYZE TIME;
        // a RENAME COLUMN since would silently stop the stats applying.
        // Resolve each key to its stable PHYSICAL name via the ANALYZED
        // version's manifest, then forward to the CURRENT logical name —
        // statistics survive renames without a re-ANALYZE. An unreadable
        // analyzed manifest (vacuumed) falls back to name-as-is (the
        // pre-fix behavior: conservative, never wrong).
        val analyzedMapping: Map[String, String] =
          (try fs.map(f =>
            LanceFormat.readManifest(f, root, s.datasetVersion).mapping)
          catch { case _: Exception => None }).getOrElse(Map.empty)
        val physToCurrent = m.mapping.map(_.swap)
        val visible = m.schema.fieldNames.toSet
        s.columns.flatMap { case (c0, meta) =>
          val physAtAnalyze = analyzedMapping.getOrElse(c0, c0)
          val c = physToCurrent.getOrElse(physAtAnalyze, physAtAnalyze)
          if (!visible.contains(c)) None else Some((c, meta))
        }.map { case (c, meta) =>
          val phys = m.physicalName(c)
          val nulls: Option[Long] = {
            val per = m.fragments.map(_.stats.flatMap(_.get(phys).map(_.nullCount)))
            if (per.forall(_.isDefined)) Some(per.flatten.sum) else None
          }
          c -> (new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
            override def distinctCount(): java.util.OptionalLong =
              java.util.OptionalLong.of(meta.ndv)
            override def nullCount(): java.util.OptionalLong =
              nulls.map(java.util.OptionalLong.of)
                .getOrElse(java.util.OptionalLong.empty())
            override def avgLen(): java.util.OptionalLong =
              if (meta.avgLen > 0) java.util.OptionalLong.of(meta.avgLen)
              else java.util.OptionalLong.empty()
            override def maxLen(): java.util.OptionalLong =
              if (meta.maxLen > 0) java.util.OptionalLong.of(meta.maxLen)
              else java.util.OptionalLong.empty()
            // equi-height bins from ANALYZE(histograms=true): measured
            // range selectivity instead of CBO's uniformity assumption
            override def histogram(): java.util.Optional[
                org.apache.spark.sql.connector.read.colstats.Histogram] =
              meta.histogram match {
                case Some(bs) if bs.nonEmpty =>
                  java.util.Optional.of(
                    new org.apache.spark.sql.connector.read.colstats.Histogram {
                      override def height(): Double =
                        meta.histogramHeight.getOrElse(0.0)
                      override def bins(): Array[
                          org.apache.spark.sql.connector.read.colstats.HistogramBin] =
                        bs.map(b =>
                          new org.apache.spark.sql.connector.read.colstats.HistogramBin {
                            override def lo(): Double = b.lo
                            override def hi(): Double = b.hi
                            override def ndv(): Long = b.ndv
                          }: org.apache.spark.sql.connector.read.colstats.HistogramBin
                        ).toArray
                    })
                case _ => java.util.Optional.empty()
              }
          })
        }
    }
  }

  /** Storage-partitioned-join layout, provable for THIS scan: the table
    * declares hash bucketing, `spark.sql.sources.v2.bucketing.enabled` is
    * on (the grouping trades scan parallelism for shuffle-free joins —
    * strictly opt-in, Iceberg's posture), and EVERY file the scan reads
    * carries a bucket tag (a pre-declaration fragment disables the claim
    * rather than mis-aligning a join). Returns the spec + file→bucket.
    */
  private lazy val bucketLayout: Option[(graft.format.BucketSpecMeta, Map[String, Int])] =
    manifest.flatMap { m =>
      m.bucketBy.flatMap { spec =>
        val conf = sparkSession.sessionState.conf
        if (!conf.getConf(org.apache.spark.sql.internal.SQLConf.V2_BUCKETING_ENABLED))
          None
        // ANY key width: composite specs carry GRID tags (one
        // pmod(hash(cᵢ), n) digit per column, row-major composed), so
        // the scan reports one UNARY bucket transform per column — the
        // only shape Spark's SPJ machinery admits (keyPositions asserts
        // one column leaf per expression). A join covering every key
        // column goes exchange-free on both sides; a subset-key join
        // fails satisfies0 and shuffles normally (correct, never wrong).
        // Legacy (pre-grid, scheme-less) composite tags cannot be read
        // as digits — withdraw the claim until a rebucket re-tags.
        else if (!spec.compositeTagsReadable) None
        else if (!spec.columns.forall(m.schema.fieldNames.contains)) None
        else {
          val tagByName = m.fragments
            .map(f => f.file.substring(f.file.lastIndexOf('/') + 1) -> f.bucket)
            .toMap
          val files = fileIndex.allFiles().map(_.getPath.getName)
          val tags = files.map(n => tagByName.get(n).flatten)
          if (files.nonEmpty && tags.forall(_.isDefined))
            Some((spec, files.zip(tags.map(_.get)).toMap))
          else None
        }
      }
    }

  /** `KeyGroupedPartitioning` over the declared `bucket(n, cols)`: ONE
    * UNARY `bucket(n, cᵢ)` transform per key column (a composite key's
    * fragment tag is the row-major composition of exactly these per-column
    * digits — [[graft.format.BucketHash.gridTagOfInternal]]). Spark
    * resolves each transform against the catalog's V2 `bucket` function
    * ([[graft.catalog.LanceCatalog]]) and plans equi-joins between
    * co-bucketed tables WITHOUT an exchange on either side — on a 100 TB
    * fact⋈fact join the shuffle IS the cost, and this removes it. The
    * per-column shape is forced by Spark:
    * `KeyGroupedShuffleSpec.keyPositions` asserts one column leaf per
    * partition expression, so a single multi-column transform can never
    * engage (its generic translation also injects the numBuckets literal
    * as an expression leaf, failing `satisfies0`). Unresolvable contexts
    * (path-based reads with no catalog) fall back to unknown partitioning
    * in Spark's rule, never an error.
    */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    bucketLayout match {
      case Some((spec, byFile)) =>
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          spec.columns.zip(spec.widthsVec).map { case (c, w) =>
            Expressions.bucket(w, c)
              : org.apache.spark.sql.connector.expressions.Transform }.toArray,
          byFile.values.toSet.size)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)
    }

  /** Per-partition ordering by the bucket key, claimed ONLY when provable
    * from the manifest: the bucket layout holds (every file tagged),
    * every bucket has exactly ONE file (each partition is one file, so
    * file order IS partition order — the post-maintenance state
    * clusterByBucket/compact leave, and what the aligned default write
    * distribution produces), and every file was OBSERVED key-sorted at
    * write time (`FragmentMeta.sorted` — recorded, never assumed). Then a
    * sort-merge join over the storage-partitioned layout drops its sorts
    * too: the 100 TB join costs neither shuffle nor sort. Any unsorted or
    * multi-file bucket just withdraws the claim (Spark re-sorts; results
    * identical).
    */
  override def outputOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    bucketLayout match {
      case Some((spec, byFile))
          if spec.columns.forall(readSchema().fieldNames.contains) &&
            byFile.values.groupBy(identity).forall(_._2.size == 1) &&
            manifest.exists { m =>
              val sortedByName = m.fragments.map(f =>
                f.file.substring(f.file.lastIndexOf('/') + 1) -> f.sorted).toMap
              byFile.keys.forall(n => sortedByName.get(n).flatten.contains(true))
            } =>
        spec.columns.map(c => Expressions.sort(Expressions.column(c),
          org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING)).toArray
      case _ => Array.empty
    }

  /** `partitions` is a def — BatchScanExec re-plans after [[filter]], so
    * dropping the runtime-pruned files here removes their tasks (and
    * footer reads) entirely. Partition indexes are re-packed dense.
    * Under a provable bucket layout the surviving files are regrouped one
    * partition per bucket, each carrying its key ([[HasPartitionKey]]).
    */
  override def planInputPartitions()
      : Array[org.apache.spark.sql.connector.read.InputPartition] = {
    val base = super.planInputPartitions()
    val kept = runtimeKept match {
      case Some(keep) =>
        val pruned = base.flatMap {
          case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
            val fs = fp.files.filter(f => keep.contains(f.toPath.getName))
            if (fs.isEmpty) None
            else Some(org.apache.spark.sql.execution.datasources.FilePartition(0, fs))
          case other => Some(other)
        }
        pruned.zipWithIndex.map {
          case (fp: org.apache.spark.sql.execution.datasources.FilePartition, i) =>
            org.apache.spark.sql.execution.datasources.FilePartition(i, fp.files)
          case (other, _) => other
        }
      case None => base
    }
    bucketLayout match {
      case Some((spec, byFile)) =>
        val files = kept.flatMap {
          case fp: org.apache.spark.sql.execution.datasources.FilePartition => fp.files
          case _ => return kept // unexpected shape: never regroup blindly
        }
        // ONE keyed partition per chunk, NOT per bucket: Spark's
        // key-grouped execution groups same-key partitions itself
        // (BatchScanExec.groupPartitions), so correctness is identical —
        // but keeping chunks separate is what lets
        // `v2.bucketing.partiallyClusteredDistribution.enabled` SPLIT a
        // skewed bucket across tasks (replicating the other side)
        // instead of funnelling a hot key into one monolithic task. The
        // sort-free ordering claim is unaffected (it already requires
        // exactly one file per bucket). Chunks sort by (bucket, file,
        // offset) so a grouped task reads each file's chunks in order.
        files.map(f => (byFile(f.toPath.getName), f))
          .sortBy { case (b, f) => (b, f.toPath.getName, f.start) }
          .zipWithIndex.map { case ((bucket, f), i) =>
            // the partition key carries ONE value per reported transform:
            // the tag's per-column grid digits, in key-column order
            LanceBucketedFilePartition(
              org.apache.spark.sql.execution.datasources.FilePartition(
                i, Array(f)),
              graft.format.BucketHash.gridDigits(bucket, spec.widthsVec))
              : org.apache.spark.sql.connector.read.InputPartition
          }.toArray
      case None => kept
    }
  }

  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory = {
    val inner = super.createReaderFactory()
    if (bucketLayout.isDefined) new LanceBucketUnwrapReaderFactory(inner)
    else inner
  }

  /** The parquet-facing schema (physical names) — what file readers and
    * the micro-batch stream must use. */
  protected def physicalReadSchema: StructType = super.readSchema()

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    // the changefeed walks MAIN's manifests; silently streaming main
    // under a `branch` option would be wrong-lineage data
    require(inner.options.get("branch") == null,
      "streaming reads follow the main lineage; branch streaming is not supported")
    val conf = {
      val c = inner.sparkSession.sessionState.newHadoopConf()
      c.set("spark.sql.session.timeZone",
        inner.sparkSession.sessionState.conf.sessionLocalTimeZone)
      new SerializableConf(c)
    }
    new LanceMicroBatchStream(rootStr, physicalReadSchema.json, conf,
      Option(inner.options.get("read.max-versions-per-batch")).map(_.toLong),
      sinceVersion = Option(inner.options.get("read.since-version")).map(_.toLong))
  }
}

/** Metadata-only aggregate: Spark plans a [[org.apache.spark.sql.connector.read.LocalScan]]
  * as a driver-side LocalTableScanExec — zero tasks, zero file reads. The
  * single row holds COUNT(*)/COUNT(col)/MIN(col)/MAX(col) values computed
  * from the manifest's per-fragment rowCount and column stats, exact by
  * the commit protocol (every commit rewrites the manifest, and the
  * builder only routes here when stats prove the answer).
  */
class LanceManifestAggScan(inner: ParquetScan, rootStr: String,
    aggSchema: StructType, row: Array[Any])
    extends LanceParquetScan(inner, rootStr)
    with org.apache.spark.sql.connector.read.LocalScan {

  override def readSchema(): StructType = aggSchema

  override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] =
    Array(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(row))
}

/** Append by default; `SaveMode.Overwrite` arrives as truncate().
  * `INSERT OVERWRITE ... [REPLACE] WHERE` arrives as overwrite(filters):
  * fragments PROVABLY inside the predicate swap for the new batch in one
  * commit (Iceberg's strict-projection posture); a fragment only PARTLY
  * inside refuses loudly and points at [[graft.Lance.replaceWhere]],
  * which rewrites remainders. */
class LanceWriteBuilder(rootStr: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsOverwrite {
  private var overwrite = false
  private var overwriteFilters: Option[Seq[sources.Filter]] = None

  override def truncate(): WriteBuilder = { overwrite = true; this }

  override def overwrite(filters: Array[sources.Filter]): WriteBuilder = {
    if (filters.isEmpty || filters.forall(_ == sources.AlwaysTrue))
      overwrite = true
    else overwriteFilters = Some(filters.toSeq)
    this
  }

  override def build(): Write = new Write
      with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
    private val conf = LanceWrite.writerConf(SparkSession.active)

    // ---- declarative write layout (Iceberg's write.distribution-mode):
    // the ENGINE plans the shuffle/sort in front of the write, so
    // clustered fragments — the property every stats-pruning layer and
    // the DML scoping depend on — stop being a hand-written
    // repartitionByRange at each call site. `write.distribute-by` names
    // the columns; `write.distribution-mode` picks hash (same key, same
    // fragment) or range (disjoint per-fragment [min,max] — what range
    // predicates prune best); `write.sort-by` adds a within-partition
    // sort (defaults to the distribute columns under range mode, so
    // fragments are internally ordered for row-group pruning too).
    private def cols(opt: String): Seq[String] =
      Option(info.options.get(opt)).toSeq
        .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    private val distributeBy = cols("write.distribute-by")
    private val sortBy = cols("write.sort-by")
    private val distributionModeOpt = Option(info.options.get("write.distribution-mode"))
      .map(_.trim.toLowerCase)
    private val distributionMode = distributionModeOpt
      .getOrElse(if (distributeBy.nonEmpty) "hash" else "none")
    require(Set("none", "hash", "range").contains(distributionMode),
      s"write.distribution-mode: want none|hash|range, got '$distributionMode'")
    require(distributionMode == "none" || distributeBy.nonEmpty,
      s"write.distribution-mode=$distributionMode needs write.distribute-by=<cols>")

    import org.apache.spark.sql.connector.{distributions => dist}
    import org.apache.spark.sql.connector.{expressions => cexpr}
    private def asc(c: String): cexpr.SortOrder = cexpr.Expressions.sort(
      cexpr.Expressions.column(c), cexpr.SortDirection.ASCENDING)

    // a BUCKETED table defaults to an engine-planned shuffle that aligns
    // write tasks WITH buckets. For a UNARY spec,
    // ClusteredDistribution(key) becomes Spark's HashPartitioning —
    // `pmod(murmur3(key), P)`, the IDENTICAL function to the bucket
    // routing — so with P a multiple of numBuckets every task holds
    // exactly ONE bucket (partition i ⇒ bucket i mod n): one open
    // parquet writer per task under ANY upstream shape. A COMPOSITE
    // (grid) spec keeps the same clustered distribution on the key
    // columns — every row of one key tuple still lands in one task, but
    // the tuple hash is not the grid tag, so a task may hold several
    // grid buckets: the writer's fanout cap bounds open files, and the
    // hand-laid rewrite paths (clusterByBucket / rebucket / compact),
    // which repartition on the grid expression itself, restore exact
    // file-per-bucket layout. The keys-ordering default keeps bucket
    // files key-sorted for row-group pruning either way. An explicit
    // write.distribution-mode / distribute-by (including 'none' — the
    // hand-laying rewrite paths) always wins.
    private val declaredLayout: Option[graft.format.Manifest] =
      if (distributionModeOpt.isDefined || distributeBy.nonEmpty) None
      else try {
        // SHALLOW manifest peek: this runs on every write build and only
        // needs the two layout declarations — hydrating a two-level
        // manifest's fragment groups here would tax every ordinary
        // append with a full metadata read
        val root = new Path(rootStr)
        LanceFormat.readLatestMeta(LanceFormat.fileSystem(root, conf.value), root)
      } catch { case _: Exception => None }
    private def coversWriteSchema(cs: Seq[String]): Boolean =
      cs.nonEmpty && cs.forall(info.schema().fieldNames.contains)
    private val bucketDist: Option[graft.format.BucketSpecMeta] =
      declaredLayout.flatMap(_.bucketBy).filter(b => coversWriteSchema(b.columns))
    // a Z-ORDER clustered table (and no explicit setting) defaults to
    // Iceberg's posture for sorted tables: RANGE-distribute + sort by the
    // cluster columns, so trickle appends land as disjoint, internally
    // sorted fragments and the min/max skipping layers keep pruning
    // BETWEEN compactions instead of degrading until the next one.
    private val clusterDist: Seq[String] =
      if (bucketDist.isDefined) Seq.empty
      else declaredLayout.flatMap(_.clusterBy).filter(coversWriteSchema)
        .getOrElse(Seq.empty)

    override def requiredDistribution(): dist.Distribution = distributionMode match {
      case "hash" => dist.Distributions.clustered(
        distributeBy.map(c => cexpr.Expressions.column(c): cexpr.Expression).toArray)
      case "range" => dist.Distributions.ordered(distributeBy.map(asc).toArray)
      case _ => bucketDist match {
        case Some(b) => dist.Distributions.clustered(
          b.columns.map(c => cexpr.Expressions.column(c): cexpr.Expression).toArray)
        case None if clusterDist.nonEmpty =>
          dist.Distributions.ordered(clusterDist.map(asc).toArray)
        case None => dist.Distributions.unspecified()
      }
    }
    override def requiredOrdering(): Array[cexpr.SortOrder] = {
      val s = if (sortBy.nonEmpty) sortBy
        else if (distributionMode == "range") distributeBy
        else bucketDist.map(_.columns).getOrElse(clusterDist)
      s.map(asc).toArray
    }
    override def requiredNumPartitions(): Int = bucketDist match {
      case Some(b) =>
        // the smallest multiple of the tag count covering the cluster's
        // parallelism: task-per-bucket alignment (exact for unary specs)
        // without capping the write's concurrency at small bucket counts;
        // wide grids cap at 4096 write tasks
        val total = math.min(
          graft.format.BucketHash.totalTags(b.widthsVec), 4096L).toInt
        val par = SparkSession.active.sparkContext.defaultParallelism
        total * math.max(1, (par + total - 1) / total)
      case None => 0 // let AQE size the shuffle
    }
    private val maxRowsPerFile = Option(info.options.get("write.max-rows-per-file"))
      .map(_.toLong).getOrElse(1000000L) // reference default, LanceOptions.java:112-116
    // maintenance writes (compaction) preserve the streaming epoch
    // watermark of the manifest they rewrite
    private val epochId = Option(info.options.get("write.epoch-id")).map(_.toLong)
    // fragment min/max/nullCount stats for manifest-level data skipping;
    // on by default, `write.stats=false` opts a very wide schema out
    private val collectStats = Option(info.options.get("write.stats")).forall(_.toBoolean)
    // schema evolution on append: merge the write schema into the table
    // schema by name (adds ride along nullable) instead of rejecting it
    private val mergeSchema = Option(info.options.get("write.merge-schema"))
      .exists(_.toBoolean)
    // copy-on-write commit: this write REPLACES the named fragment ids
    // (row-level DELETE/UPDATE/MERGE rewrite scope) instead of appending
    private val replaceFragments = Option(info.options.get("write.replace-fragments"))
      .map(_.split(',').filter(_.nonEmpty).map(_.toInt).toSet)
    // row-preserving maintenance overwrite (compact/cluster): stamp the
    // manifest so changefeed readers skip the commit instead of failing
    private val rowPreserving = Option(info.options.get("write.operation"))
      .map { v =>
        require(v == "rewrite", s"write.operation supports only 'rewrite', got '$v'")
        v
      }.isDefined

    // append-only branch commit (`write.branch`): the fragments land in
    // the shared data/ dir, the manifest in the branch lineage
    private val branch = Option(info.options.get("write.branch"))
      .map(_.trim).filter(_.nonEmpty)

    // row-level change-data-feed files staged by the DML verb
    // (graft.operators.Dml): recorded in the replace commit's manifest so
    // feed readers serve exact pre/post images instead of fragment diffs
    private val changeFiles = Option(info.options.get("write.change-files"))
      .map(LanceFormat.parseChangeFiles).getOrElse(Seq.empty)

    // table-property mutation landing IN the data commit (JSON map,
    // null-valued keys unset): what makes a materialized-view refresh
    // atomic — the refreshed rows and the new `graft.mv.source-version`
    // watermark publish in one manifest, so a crash can never separate
    // them (a separated pair would double-apply the delta on re-run)
    private val setProps = Option(info.options.get("write.set-properties"))
      .map(LanceFormat.parseProperties).getOrElse(Map.empty[String, String]) ++
      nsAsLongProp

    // opt-in NANOSECOND fidelity (`write.ns-as-long=colA,colB`): the
    // reference stores Timestamp(9) natively (ref:converter/
    // RowDataConverter.java:228-231); Spark's TimestampType is µs-only,
    // so a typed column would silently truncate (the q50 contract).
    // Listed LongType columns are DECLARED int64-nanosecond timestamps
    // in the table properties instead: values round-trip losslessly as
    // longs, and readers opt into the µs cast via Lance.readNsAsTimestamp
    // (the one floor-division helper). Declaring replaces the list —
    // declare every ns column of the table in one write.
    private def nsAsLongProp: Map[String, String] =
      Option(info.options.get("write.ns-as-long"))
        .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
        .filter(_.nonEmpty).map { cols =>
          val fields = info.schema()
          // resolve case-insensitively (Spark's default) but STORE the
          // schema's canonical spelling: nsColumns/readNsAsTimestamp
          // match the stored names against the table schema exactly, so
          // a case drift at declaration must not yield a silently
          // never-converted column
          val canon = cols.map { c =>
            val f = fields.fields.find(_.name == c)
              .orElse(fields.fields.find(_.name.equalsIgnoreCase(c)))
              .getOrElse(throw new IllegalArgumentException(
                s"write.ns-as-long names '$c', not a column of this write"))
            require(f.dataType == org.apache.spark.sql.types.LongType,
              s"write.ns-as-long column '$c' is ${f.dataType.simpleString}: " +
                "nanosecond timestamps ride int64 (Spark has no ns type - " +
                "a typed column would truncate; that cast is the read-side " +
                "opt-in, Lance.readNsAsTimestamp)")
            f.name
          }
          Map(LanceFormat.PropNsAsLong -> canon.mkString(","))
        }.getOrElse(Map.empty)

    // optimistic CAS companion (JSON map): every listed key must still
    // hold its listed value at commit time or the commit refuses loud —
    // the MV-refresh/replica-sync watermark guard
    private val requireProps = Option(info.options.get("write.require-properties"))
      .map(LanceFormat.parseProperties).getOrElse(Map.empty[String, String])

    override def toBatch: BatchWrite = {
      branch.foreach { b =>
        require(!overwrite && replaceFragments.isEmpty,
          s"branch '$b' is append-only: overwrite/replace-fragments are " +
            "main-lineage operations (fast-forward or delete the branch instead)")
      }
      overwriteFilters.foreach { _ =>
        require(branch.isEmpty && replaceFragments.isEmpty && !overwrite,
          "overwrite-by-filter cannot combine with branch/replace-fragments/truncate")
      }
      require(changeFiles.isEmpty || replaceFragments.isDefined,
        "write.change-files rides a replace-fragments (DML rewrite) commit only")
      new LanceBatchWrite(rootStr, info.schema(), overwrite, conf, maxRowsPerFile,
        epochId, collectStats, mergeSchema, replaceFragments, rowPreserving,
        refreshIndexes, branch, refreshStats, overwriteFilters, changeFiles,
        setProps, refreshMvs, requireProps)
    }
    // delta-refresh the dataset's persisted indexes after the commit
    // ('all' or a comma list of scalar|fts|ivf) — streaming epochs and
    // batch writes alike
    private val refreshIndexes = Option(info.options.get("write.refresh-indexes"))
      .map(LanceWrite.parseRefreshKinds("write.refresh-indexes", _))
      .getOrElse(Set.empty[String])
    // in-commit incremental ANALYZE (`write.refresh-stats=true`): merge
    // the batch's NDV sketches into the stats sidecar before the write
    // returns — cost ∝ the batch by the sketch-union contract, the
    // refresh-indexes posture applied to optimizer statistics
    private val refreshStats = Option(info.options.get("write.refresh-stats"))
      .exists(_.toBoolean)
    // in-commit MATERIALIZED-VIEW maintenance (`write.refresh-mvs=true`):
    // after the data commit, refresh every view registered on this table
    // (graft.mv.dependents) — the refresh-indexes posture applied to
    // derived tables: warn-never-fail, a stale view must not unwind a
    // landed write. Batch writes and streaming epochs alike.
    private val refreshMvs = Option(info.options.get("write.refresh-mvs"))
      .exists(_.toBoolean)

    override def toStreaming: StreamingWrite = {
      require(branch.isEmpty,
        "write.branch is a batch write option; streaming sinks write the main lineage")
      new LanceStreamingWrite(rootStr, info.schema(), overwrite, conf, maxRowsPerFile,
        collectStats, refreshIndexes, queryId = info.queryId(),
        refreshStats = refreshStats, refreshMvs = refreshMvs)
    }
  }
}

case class LanceCommitMessage(fragments: Seq[FragmentMeta]) extends WriterCommitMessage

/** Driver-side commit: tasks write fragment files, the driver commits one
  * manifest — the atomicity point, exactly like the reference's
  * `FragmentOperation.Append/Overwrite` commits (`LanceSink.java:164-189`).
  */
class LanceBatchWrite(rootStr: String, schema: StructType, overwrite: Boolean,
    conf: SerializableConf, maxRowsPerFile: Long,
    epochId: Option[Long] = None, collectStats: Boolean = true,
    mergeSchema: Boolean = false,
    replaceFragments: Option[Set[Int]] = None,
    rowPreserving: Boolean = false,
    refreshIndexes: Set[String] = Set.empty,
    branch: Option[String] = None,
    refreshStats: Boolean = false,
    overwriteFilters: Option[Seq[sources.Filter]] = None,
    changeFiles: Seq[graft.format.ChangeFileMeta] = Seq.empty,
    setProperties: Map[String, String] = Map.empty,
    refreshMvs: Boolean = false,
    requireProperties: Map[String, String] = Map.empty) extends BatchWrite {

  // the (physical-name) bucket spec the task writers routed and tagged
  // under, captured at factory-build time; the commit loops compare it
  // against the spec at commit time and strip the tags on a mismatch —
  // a concurrent clusterByBucket re-declaration in that window must not
  // publish old-spec tags under the new spec head (mis-pruning)
  @volatile private var routedBucketSpec: Option[(Seq[Int], Seq[String])] = None

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // fragment files always carry PHYSICAL names (stable under RENAME
    // COLUMN); translate the (logical) write schema per the lineage the
    // write lands in — positions/types identical, rows untouched
    val root = new Path(rootStr)
    val fs = LanceFormat.fileSystem(root, conf.value)
    val lineage = branch.fold(LanceFormat.versionsPath(root))(
      LanceFormat.branchPath(root, _))
    // shallow read: only declarations are needed here, never fragments —
    // a million-fragment head answers from one small JSON
    val head = LanceFormat.readLatestMetaIn(fs, lineage)
    val mapping = head.map(_.mapping).getOrElse(Map.empty)
    val phys = LanceFormat.toPhysical(schema, mapping)
    require(phys.fieldNames.distinct.length == phys.fieldNames.length,
      "column name collision: the write introduces a column whose name is a " +
        "renamed column's PHYSICAL name (old fragments hold its bytes) - " +
        "pick another name")
    // a declared hash-bucket layout routes EVERY write path (append, DML
    // rewrite, compaction) per row in the task writer — purity is a
    // writer invariant. Key names travel physical, like the schema.
    val bucketSpec = head.flatMap(_.bucketBy).map(b =>
      (b.widthsVec, b.columns.map(c => mapping.getOrElse(c, c))))
    routedBucketSpec = bucketSpec
    val bloomCols = head.flatMap(_.bloomFilters).getOrElse(Seq.empty)
      .map(c => mapping.getOrElse(c, c))
    new LanceWriterFactory(rootStr, phys.json, conf, maxRowsPerFile, collectStats,
      bucketSpec, bloomCols)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val frags = messages.collect { case LanceCommitMessage(f) => f }.flatten.toSeq
    val root = new Path(rootStr)
    val fs = LanceFormat.fileSystem(root, conf.value)
    // INSERT OVERWRITE ... WHERE: swap the fragments PROVABLY inside the
    // predicate for the new batch, one commit. Strict both ways:
    //  - a fragment only PARTLY inside (mayMatch without mustMatch, or
    //    no stats) refuses — swapping it would delete rows outside the
    //    predicate; Lance.replaceWhere rewrites remainders instead;
    //  - a staged row OUTSIDE the predicate refuses — a backfill that
    //    writes past its declared range is a bug caught before commit.
    val scopedOverwrite: Option[(Set[Int], Option[Manifest], Array[sources.Filter])] =
        overwriteFilters.map { filters =>
      // ONE snapshot read: the replaced set, the constraint context, and
      // the commit all work from this manifest; the commit loop then
      // detects fragments landed SINCE it (serializability — a concurrent
      // append of predicate-matching rows must not silently survive the
      // overwrite)
      val prevM = LanceFormat.readLatest(fs, root)
      // filters carry LOGICAL names; stats speak PHYSICAL
      val physF: Array[sources.Filter] = filters.map(f =>
        graft.operators.Dml.renameFilter(f,
          prevM.map(_.mapping).getOrElse(Map.empty))).toArray
      val replaced: Set[Int] = prevM match {
        case None => Set.empty
        case Some(m) =>
          val phys = physF
          val may = graft.format.FragmentStats.prune(
            m.physicalSchema, m.fragments, phys)
          val mustIds = may.filter(f => f.stats.exists(st => phys.forall(
            graft.format.FragmentStats.mustMatch(
              m.physicalSchema, f.rowCount, st, _)))).map(_.id).toSet
          val partial = may.filterNot(f => mustIds.contains(f.id))
          require(partial.isEmpty,
            s"INSERT OVERWRITE WHERE: fragment(s) ${partial.map(_.file).mkString(", ")} " +
              "hold rows the predicate cannot prove all-in or all-out - " +
              "swapping them would drop rows outside the range; use " +
              "Lance.replaceWhere / CALL replace_where, which rewrites remainders")
          mustIds
      }
      // strict range: probe the staged batch for one row outside
      val cond = graft.operators.Dml.filtersToColumn(filters.toArray,
        flatCols = schema.fieldNames.toSet)
      val spark = SparkSession.active
      if (frags.nonEmpty) {
        val staged = spark.read.schema(
            prevM.map(_.toPhysicalSchema(schema)).getOrElse(schema))
          .parquet(frags.map(f =>
            LanceFormat.fragmentPath(root, f.file).toString): _*)
        val logical = prevM.filter(_.mapping.nonEmpty)
          .fold(staged)(_ => staged.toDF(schema.fieldNames.toIndexedSeq: _*))
        val outside = logical.filter(
          !org.apache.spark.sql.functions.coalesce(cond,
            org.apache.spark.sql.functions.lit(false))).limit(1).count()
        require(outside == 0L,
          "INSERT OVERWRITE WHERE: the incoming batch holds row(s) outside " +
            "the predicate - a scoped overwrite must stay inside its range; " +
            "commit refused, staged files removed")
      }
      (replaced, prevM, physF)
    }
    // serializability guard threaded into the commit loop: snapshot file
    // set + physical filters — a fragment committed since the snapshot
    // that may match the predicate fails the scoped overwrite loud
    val overwriteGuard: Option[(Set[String], Array[sources.Filter])] =
      scopedOverwrite.map { case (_, prevM, physF) =>
        (prevM.map(_.fragments.map(_.file).toSet).getOrElse(Set.empty), physF) }
    scopedOverwrite match {
      case Some((replaced, prevM, _)) if replaced.nonEmpty =>
        val enforced = prevM.map(_.checkConstraints).getOrElse(Map.empty)
        val cmap = prevM.map(_.mapping).getOrElse(Map.empty)
        LanceWrite.enforceConstraints(root, schema, frags, enforced,
          tableFrags = prevM.map(_.fragments).getOrElse(Seq.empty)
            .filterNot(f => replaced.contains(f.id)),
          mapping = cmap)
        val outSchema = LanceWrite.reconcileNullability(root, schema, frags, enforced, cmap)
        val (committedO, _) = LanceFormat.commitReplace(fs, root, outSchema,
          replaced, frags, epochId, operation = "replace",
          routedBucketSpec = Some(routedBucketSpec),
          failIfNewMatching = overwriteGuard,
          setProperties = setProperties,
          requireProperties = requireProperties,
          prevHint = prevM)
        LanceWrite.verifyConstraintsPostCommit(root, fs, outSchema, frags,
          enforced, committedO,
          baseFragments = prevM.map(_.fragments).getOrElse(Seq.empty))
        if (refreshIndexes.nonEmpty)
          LanceWrite.refreshIndexesAfterCommit(rootStr, refreshIndexes)
        if (refreshStats) LanceWrite.refreshStatsAfterCommit(rootStr)
        if (refreshMvs) LanceWrite.refreshMvsAfterCommit(rootStr)
        return
      case Some(_) =>
        // the predicate provably matches nothing: the scoped overwrite is
        // a plain insert (Delta/Iceberg parity — a NEW day's first
        // backfill run). Fall through to the ordinary append path below
        // (which carries overwriteGuard: a concurrent matching append in
        // the window still fails the commit loud).
        ()
      case None => ()
    }
    // copy-on-write swap: the rewritten rows replace exactly the scoped
    // fragment ids; the table schema is unchanged by construction (the
    // rewrite read those very fragments)
    if (replaceFragments.isDefined) {
      // row-preserving replace (targeted compaction): stamp `rewrite` so
      // changefeed readers skip the commit — its rows were already
      // emitted from the files it repacks
      // row-PRESERVING rewrites (compaction) repack rows that already
      // passed at ingest — re-proving them would re-read the whole
      // repacked batch once per constraint, the exact I/O compactSmall
      // exists to avoid. Row-CHANGING replaces (DML) are enforced.
      val prevM = LanceFormat.readLatest(fs, root)
      val enforced = prevM.map(_.checkConstraints).getOrElse(Map.empty)
      val cmap = prevM.map(_.mapping).getOrElse(Map.empty)
      if (!rowPreserving)
        LanceWrite.enforceConstraints(root, schema, frags, enforced,
          // uniqueness holds against the KEPT fragments — the ones being
          // replaced are leaving, their keys may legitimately reappear
          tableFrags = prevM.map(_.fragments).getOrElse(Seq.empty)
            .filterNot(f => replaceFragments.get.contains(f.id)),
          mapping = cmap)
      // inference-only non-nullable columns receiving NULLs widen in the
      // same commit (row-preserving rewrites repack existing rows — the
      // schema already tells their truth, nothing to reconcile)
      val replaceSchema = if (rowPreserving) schema
        else LanceWrite.reconcileNullability(root, schema, frags, enforced, cmap)
      val (committedR, _) = LanceFormat.commitReplace(fs, root, replaceSchema,
        replaceFragments.get, frags, epochId,
        operation = if (rowPreserving) "rewrite" else "replace",
        routedBucketSpec = Some(routedBucketSpec),
        changeFiles = changeFiles,
        setProperties = setProperties,
        requireProperties = requireProperties,
        prevHint = prevM)
      if (!rowPreserving)
        LanceWrite.verifyConstraintsPostCommit(root, fs, replaceSchema, frags,
          enforced, committedR,
          baseFragments = prevM.map(_.fragments).getOrElse(Seq.empty))
      if (refreshIndexes.nonEmpty)
        LanceWrite.refreshIndexesAfterCommit(rootStr, refreshIndexes)
      if (refreshMvs) LanceWrite.refreshMvsAfterCommit(rootStr)
      return
    }
    // branch append: same schema discipline, sourced from and committed
    // into the branch lineage (data files share the main data/ dir)
    val lineageDir = branch match {
      case Some(b) =>
        val bp = LanceFormat.branchPath(root, b)
        require(fs.exists(bp), s"no branch '$b' at $rootStr - create it first " +
          "(Lance.createBranch / CALL create_branch)")
        bp
      case None => LanceFormat.versionsPath(root)
    }
    val existing = LanceFormat.readLatestIn(fs, lineageDir)
    // Schema evolution (`write.merge-schema=true`): the committed schema
    // is the by-name union — new fragments carry the write schema, old
    // fragments read NULL for added columns. Without the option, any
    // NAME/TYPE drift still fails loud (silent schema drift at a
    // 1000-writer scale is how tables rot); nullability and metadata
    // differences are not drift — the table's schema (which carries
    // column metadata like vector dims) wins on a compatible append.
    def shape(s: StructType) = s.fields.map(f => (f.name, f.dataType)).toSeq
    // same names, and every differing column strictly NARROWER in the
    // write than the table (an ALTER-widened column being appended to by
    // a not-yet-updated writer): not drift — the narrower files read up
    // through the table type, the table's schema wins
    def narrowerCompatible(table: StructType, write: StructType): Boolean =
      table.fieldNames.toSeq == write.fieldNames.toSeq &&
        table.fields.zip(write.fields).forall { case (t, w) =>
          t.dataType == w.dataType || LanceFormat.widensTo(w.dataType, t.dataType)
        }
    val committedSchema = existing.filter(_.fragments.nonEmpty) match {
      case Some(m) if !overwrite && shape(m.schema) != shape(schema) &&
          narrowerCompatible(m.schema, schema) => m.schema
      case Some(m) if !overwrite && shape(m.schema) != shape(schema) =>
        if (mergeSchema) {
          // the DROP COLUMN resurrection guard applies to EVERY surface
          // that can widen the schema, not just ALTER ADD: a merged-in
          // name matching a dropped one would make old fragments'
          // supposedly-deleted values readable again
          val resurrected = schema.fieldNames.toSet
            .diff(m.schema.fieldNames.toSet).intersect(m.dropped.toSet)
          require(resurrected.isEmpty,
            s"columns ${resurrected.mkString(", ")} were previously DROPPED " +
              "and old fragments still hold their data - merge-schema would " +
              "resurrect those values (rewrite the table first, e.g. compact)")
          LanceFormat.mergeSchemas(m.schema, schema)
        } else throw new IllegalArgumentException(
          s"append schema mismatch: table has ${m.schema.simpleString}, " +
            s"write has ${schema.simpleString} (set write.merge-schema=true " +
            "to evolve the table schema)")
      case Some(m) if !overwrite => m.schema
      case _ => schema
    }
    val enforced = existing.map(_.checkConstraints).getOrElse(Map.empty)
    val cmap = existing.map(_.mapping).getOrElse(Map.empty)
    if (!rowPreserving)
      LanceWrite.enforceConstraints(root, committedSchema, frags, enforced,
        // append: unique vs the lineage head; overwrite replaces
        // everything, so only batch-internal uniqueness applies
        tableFrags = if (overwrite) Seq.empty
          else existing.map(_.fragments).getOrElse(Seq.empty),
        mapping = cmap)
    // NULLs arriving into an inference-only non-nullable column widen the
    // stored schema in this very commit; declared columns were refused
    // above by their rule
    val widenedSchema = if (rowPreserving) committedSchema
      else LanceWrite.reconcileNullability(root, committedSchema, frags,
        enforced, cmap)
    // `existing` was read from lineageDir a moment ago: hand it to the
    // commit loop as its first-attempt snapshot (write-scoped manifest
    // reuse — one head read per write instead of two; a conflict loses
    // the CAS and the retry re-reads fresh). The overwrite path commits
    // against root, so the hint only applies on the main lineage.
    val committed =
      if (overwrite) LanceFormat.commitOverwrite(fs, root, widenedSchema, frags, epochId,
        operation = if (rowPreserving) "rewrite" else "overwrite",
        routedBucketSpec = Some(routedBucketSpec),
        setProperties = setProperties,
        requireProperties = requireProperties,
        prevHint = if (branch.isEmpty) Some(existing) else None)
      else LanceFormat.commitAppendIn(fs, lineageDir, widenedSchema, frags, epochId,
        routedBucketSpec = Some(routedBucketSpec),
        failIfNewMatching = overwriteGuard,
        setProperties = setProperties,
        requireProperties = requireProperties,
        prevHint = Some(existing))
    // rules added concurrently with this write are re-proven against the
    // batch the moment its manifest lands (branch lineages skip it: their
    // rule set is the fork-time copy, static under main-side edits)
    if (!rowPreserving && branch.isEmpty)
      LanceWrite.verifyConstraintsPostCommit(root, fs, widenedSchema, frags,
        enforced, committed,
        baseFragments = existing.map(_.fragments).getOrElse(Seq.empty))
    // in-commit index maintenance, batch flavor of the s90 streaming
    // contract: delta-refresh the persisted sidecars before the write
    // call returns, so the next reader's point lookup / search covers
    // this write's fragments. Same failure posture as the epoch path —
    // stale-but-correct warn, never a failed write (the data commit
    // above already happened; unwinding it for an index would turn a
    // prune-miss into data loss). Indexes are main-lineage state, so
    // branch appends skip the refresh (branch reads treat branch-only
    // fragments as uncovered — scanned, never wrongly pruned).
    if (refreshIndexes.nonEmpty && branch.isEmpty)
      LanceWrite.refreshIndexesAfterCommit(rootStr, refreshIndexes)
    if (refreshStats && branch.isEmpty)
      LanceWrite.refreshStatsAfterCommit(rootStr)
    // derived tables are main-lineage state like indexes: branch appends
    // skip the maintenance
    if (refreshMvs && branch.isEmpty)
      LanceWrite.refreshMvsAfterCommit(rootStr)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    LanceWrite.deleteFiles(rootStr, conf.value, messages)
}

/** Streaming epoch commit — exactly-once parity with the reference's
  * checkpoint-aligned flush (`LanceSink.java:233-245`), scoped PER QUERY:
  * an epoch at or below the latest manifest's recorded high-water mark
  * FOR THIS QUERY (`Manifest.streamEpochs`, keyed by
  * `LogicalWriteInfo.queryId()`) is a replay — its staged files are
  * deleted and no version lands. Per-query scoping is what makes a
  * fresh-checkpoint restart (new queryId, epochs restart at 0) land every
  * batch, and lets two concurrent streaming queries interleave commits
  * without either discarding the other's.
  */
class LanceStreamingWrite(rootStr: String, schema: StructType, overwrite: Boolean,
    conf: SerializableConf, maxRowsPerFile: Long,
    collectStats: Boolean = true,
    refreshIndexes: Set[String] = Set.empty,
    queryId: String = "",
    refreshStats: Boolean = false,
    refreshMvs: Boolean = false) extends StreamingWrite {

  // spec-race guard, streaming flavor — see LanceBatchWrite.routedBucketSpec
  @volatile private var routedBucketSpec: Option[(Seq[Int], Seq[String])] = None

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val root = new Path(rootStr)
    val fs = LanceFormat.fileSystem(root, conf.value)
    val head = LanceFormat.readLatestMeta(fs, root) // declarations only
    val mapping = head.map(_.mapping).getOrElse(Map.empty)
    val phys = LanceFormat.toPhysical(schema, mapping)
    require(phys.fieldNames.distinct.length == phys.fieldNames.length,
      "column name collision: the write introduces a column whose name is a " +
        "renamed column's PHYSICAL name (old fragments hold its bytes) - " +
        "pick another name")
    // streamed epochs keep the declared bucket layout too
    val bucketSpec = head.flatMap(_.bucketBy).map(b =>
      (b.widthsVec, b.columns.map(c => mapping.getOrElse(c, c))))
    routedBucketSpec = bucketSpec
    val bloomCols = head.flatMap(_.bloomFilters).getOrElse(Seq.empty)
      .map(c => mapping.getOrElse(c, c))
    new LanceWriterFactory(rootStr, phys.json, conf, maxRowsPerFile, collectStats,
      bucketSpec, bloomCols)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(rootStr)
    val fs = LanceFormat.fileSystem(root, conf.value)
    val latestM = LanceFormat.readLatest(fs, root)
    val alreadyCommitted =
      latestM.exists(_.streamEpochFor(queryId).exists(_ >= epochId))
    if (alreadyCommitted) {
      LanceWrite.deleteFiles(rootStr, conf.value, messages)
    } else {
      val frags = messages.collect { case LanceCommitMessage(f) => f }.flatten.toSeq
      // CHECK constraints hold for streamed epochs too — a violating
      // micro-batch fails the stream (correctness, unlike the
      // stale-but-correct refresh warn below)
      val enforced = latestM.map(_.checkConstraints).getOrElse(Map.empty)
      val cmap = latestM.map(_.mapping).getOrElse(Map.empty)
      val epochOverwrite = overwrite && epochId == 0
      LanceWrite.enforceConstraints(root, schema, frags, enforced,
        tableFrags = if (epochOverwrite) Seq.empty
          else latestM.map(_.fragments).getOrElse(Seq.empty),
        mapping = cmap)
      val widened = LanceWrite.reconcileNullability(root, schema, frags,
        enforced, cmap)
      val committed =
        if (epochOverwrite)
          LanceFormat.commitOverwrite(fs, root, widened, frags, Some(epochId),
            streamEpoch = Some(queryId -> epochId),
            routedBucketSpec = Some(routedBucketSpec))
        else LanceFormat.commitAppend(fs, root, widened, frags, Some(epochId),
          streamEpoch = Some(queryId -> epochId),
          routedBucketSpec = Some(routedBucketSpec))
      // rules added concurrently with the epoch are re-proven post-commit
      LanceWrite.verifyConstraintsPostCommit(root, fs, widened, frags,
        enforced, committed,
        baseFragments = latestM.map(_.fragments).getOrElse(Seq.empty))
      // continuously-ingested corpus, always-serving indexes: delta-
      // refresh INSIDE the epoch commit (the index is fresh before the
      // next batch starts — the maintenance job a production pipeline
      // otherwise schedules out-of-band). Refresh cost is proportional
      // to the epoch's fragments by the v34/t43 delta contracts. A
      // refresh failure leaves a STALE-BUT-CORRECT index (uncovered
      // fragments are never wrongly pruned; vector/fts staleness guards
      // fire on their paths), so it warns instead of failing the stream.
      if (refreshIndexes.nonEmpty)
        LanceWrite.refreshIndexesAfterCommit(rootStr, refreshIndexes)
      if (refreshStats)
        LanceWrite.refreshStatsAfterCommit(rootStr)
      if (refreshMvs)
        LanceWrite.refreshMvsAfterCommit(rootStr)
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    LanceWrite.deleteFiles(rootStr, conf.value, messages)
}

private[graft] object LanceWrite {
  /** Parse a refresh-kinds spec: `all`/`true`, or a comma list drawn from
    * scalar|fts|ivf. Shared by the write option and the DML session conf
    * so both surfaces reject typos identically (a silently-ignored kind
    * would read as "refreshed" while serving stale postings). */
  def parseRefreshKinds(source: String, spec: String): Set[String] = {
    val v = spec.trim.toLowerCase
    if (v.isEmpty) Set.empty
    else v match {
      case "all" | "true" => Set("scalar", "fts", "ivf")
      case csv =>
        val kinds = csv.split(',').map(_.trim).filter(_.nonEmpty).toSet
        val bad = kinds -- Set("scalar", "fts", "ivf")
        require(bad.isEmpty,
          s"$source: unknown kinds ${bad.mkString(",")} (scalar|fts|ivf|all)")
        kinds
    }
  }

  /** ParquetWriteSupport/SparkToParquetSchemaConverter read these from the
    * task-side Hadoop conf (normally injected by FileFormatWriter).
    */
  def writerConf(spark: SparkSession): SerializableConf = {
    val c = spark.sessionState.newHadoopConf()
    val sc = spark.sessionState.conf
    c.set("spark.sql.parquet.writeLegacyFormat", sc.writeLegacyParquetFormat.toString)
    c.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    c.set("spark.sql.parquet.fieldId.write.enabled", sc.parquetFieldIdWriteEnabled.toString)
    c.setIfUnset("spark.sql.parquet.variant.annotateLogicalType.enabled", "false")
    new SerializableConf(c)
  }

  def deleteFiles(rootStr: String, conf: Configuration,
      messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(rootStr)
    val fs = LanceFormat.fileSystem(root, conf)
    messages.collect { case LanceCommitMessage(f) => f }.flatten.foreach { frag =>
      fs.delete(new Path(LanceFormat.dataPath(root), frag.file), false)
    }
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.LanceWrite")

  /** In-commit incremental ANALYZE: same failure posture as the index
    * refresh — a failure leaves STALE-but-valid optimizer statistics
    * (the last ANALYZE keeps serving), so it warns, never fails the
    * committed write. */
  def refreshStatsAfterCommit(rootStr: String): Unit =
    try graft.Lance.analyze(SparkSession.active, rootStr)
    catch { case e: Exception =>
      log.warn(s"post-commit ANALYZE refresh failed for $rootStr " +
        s"(stats stay at their last-analyzed version): ${e.getMessage}")
    }

  /** In-commit materialized-view maintenance: refresh every dependent
    * registered on this table. Per-view failures are already warn-only
    * inside [[graft.operators.MaterializedView.refreshDependents]]; a
    * registry-read failure warns here — a stale view never unwinds a
    * landed write. */
  def refreshMvsAfterCommit(rootStr: String): Unit =
    try {
      graft.operators.MaterializedView
        .refreshDependents(SparkSession.active, rootStr)
        .foreach {
          case (vp, Left(err)) =>
            log.warn(s"post-commit MV refresh failed for $vp " +
              s"(view is stale but correct): $err")
          case _ => ()
        }
    } catch { case e: Exception =>
      log.warn(s"post-commit MV maintenance failed for $rootStr: ${e.getMessage}")
    }

  /** CHECK-constraint gate: validate the staged fragment files BEFORE the
    * manifest commit (cost ∝ the batch, never the table — one filtered
    * existence probe per constraint over just-written files). Throwing
    * here makes Spark call abort(), which deletes the staged files: a
    * violating batch leaves no new version and no orphans. NULL passes
    * (SQL CHECK semantics).
    */
  def enforceConstraints(root: Path, schema: StructType,
      frags: Seq[FragmentMeta], constraints: Map[String, String],
      tableFrags: Seq[FragmentMeta] = Seq.empty,
      mapping: Map[String, String] = Map.empty): Unit = {
    if (frags.isEmpty) return
    import org.apache.spark.sql.functions.{coalesce, expr, lit}
    val spark = SparkSession.active
    val files = frags.map(f =>
      LanceFormat.fragmentPath(root, f.file).toString)
    // nullable read: this scan EXISTS to find rule-violating rows —
    // reading a null through a non-nullable schema (a NOT NULL table
    // validating a violating batch) is undefined behavior in the
    // vectorized reader, exactly where the violation must surface as a
    // filter hit instead
    val readSchema = StructType(schema.fields.map(_.copy(nullable = true)))
    val df = readLogical(spark, readSchema, mapping, files)
    val (uniqueRules, checkRules) = constraints.partition {
      case (_, e) => LanceFormat.uniqueColumn(e).isDefined }
    checkRules.foreach { case (name, e) =>
      // declared NOT NULL rules answer from the writer's own exact
      // nullCount stats when every staged fragment carries them — the
      // hot ingest path pays zero extra I/O for its declarations
      val byStats = Some(name).filter(_.startsWith(LanceFormat.NotNullPrefix))
        .map(_.stripPrefix(LanceFormat.NotNullPrefix))
        .filter(c => e == s"`$c` IS NOT NULL")
        .flatMap(c => nullsFromStats(frags, mapping.getOrElse(c, c)))
      val bad = byStats match {
        case Some(hasNulls) => if (hasNulls) 1L else 0L
        case None => df.filter(coalesce(expr(e), lit(true)) === lit(false))
          .limit(1).count()
      }
      if (bad > 0) throw new IllegalArgumentException(
        s"CHECK constraint '$name' ($e) violated by the written batch at " +
          s"$root - commit refused, no version created")
    }
    uniqueRules.foreach { case (name, e) =>
      enforceUnique(root, readSchema, frags, name,
        LanceFormat.uniqueColumns(e).get, tableFrags, mapping)
    }
  }

  /** Central fragment-file reader for the write-path validators: reads
    * the PHYSICAL parquet names (what files carry, stable under RENAME
    * COLUMN) and returns the LOGICAL-named frame the rule expressions
    * reference. Identity when the table was never renamed. */
  private def readLogical(spark: SparkSession, logical: StructType,
      mapping: Map[String, String],
      files: Seq[String]): org.apache.spark.sql.DataFrame = {
    val df = spark.read.schema(LanceFormat.toPhysical(logical, mapping))
      .parquet(files: _*)
    if (mapping.isEmpty) df else df.toDF(logical.fieldNames.toIndexedSeq: _*)
  }

  /** Exact null presence for `column` across the staged batch, answered
    * from write-time fragment stats (`ColStats.nullCount` is exact by
    * contract): Some(hasNulls) when every fragment covers the column,
    * None when any lacks stats (`write.stats=false`). */
  private def nullsFromStats(frags: Seq[FragmentMeta],
      column: String): Option[Boolean] = {
    val counts = frags.map(_.stats.flatMap(_.get(column).map(_.nullCount)))
    if (counts.forall(_.isDefined)) Some(counts.flatten.sum > 0L) else None
  }

  /** Inference-vs-declaration nullability reconciliation, the Delta
    * posture: a column non-nullable in the table schema WITHOUT a
    * declared `not_null_<col>` rule is non-nullable by `toDF` inference
    * alone — no user ever promised it. When a batch brings NULLs into
    * such a column, the commit WIDENS the stored schema to nullable in
    * the same manifest (the merge-schema precedent) instead of refusing:
    * refusing here broke upsert's documented null-key-inserts contract
    * (SQL MERGE: null keys never match, they insert), and committing
    * non-nullable over nulls is worse — the vectorized reader surfaces
    * them as garbage. Declared columns are never widened; their rule
    * refuses the batch in [[enforceConstraints]] with the rule's name.
    * Cost: free when the writer collected stats (default); one scoped
    * null-count aggregate over the staged files otherwise.
    */
  def reconcileNullability(root: Path, schema: StructType,
      frags: Seq[FragmentMeta], constraints: Map[String, String],
      mapping: Map[String, String] = Map.empty): StructType = {
    if (frags.isEmpty) return schema
    val declared = LanceFormat.declaredNonNullable(constraints)
    val candidates = schema.fields
      .filter(f => !f.nullable && !declared(f.name)).map(_.name)
    if (candidates.isEmpty) return schema
    def stats(c: String) = nullsFromStats(frags, mapping.getOrElse(c, c))
    val (known, unknown) = candidates.partition(c => stats(c).isDefined)
    var withNulls = known.filter(c => stats(c).contains(true)).toSet
    if (unknown.nonEmpty) {
      import org.apache.spark.sql.functions.{col, count, lit, when}
      val spark = SparkSession.active
      val files = frags.map(f =>
        LanceFormat.fragmentPath(root, f.file).toString)
      val readSchema = StructType(schema.fields.map(_.copy(nullable = true)))
      val aggs = unknown.map(c => count(when(col(c).isNull, lit(1))).as(c))
      val row = readLogical(spark, readSchema, mapping, files)
        .agg(aggs.head, aggs.tail: _*).head()
      withNulls ++= unknown.indices.filter(i => row.getLong(i) > 0L).map(unknown)
    }
    if (withNulls.isEmpty) schema
    else StructType(schema.fields.map(f =>
      if (withNulls(f.name)) f.copy(nullable = true) else f))
  }

  /** UNIQUE enforcement for one staged batch — single-column or COMPOSITE
    * key: the batch may not repeat a key internally, nor collide with
    * `tableFrags` (the fragments the commit will coexist with — the
    * lineage head for appends, the KEPT set for replaces, empty for
    * overwrites). A key with ANY null component is exempt (SQL UNIQUE:
    * nulls are never equal). Table-side cost is a PRUNED point probe, not
    * a scan: when the batch's distinct LEAD-column values fit
    * `spark.graft.unique.inlistLimit` (default 10000) they push as an IN
    * filter through manifest min/max + value-set + scalar-index pruning
    * and parquet row-group skipping — a clustered or scalar-indexed lead
    * column probes a handful of fragments regardless of table size, and
    * a composite key then confirms collisions with one broadcast-sized
    * semi-join over only the kept fragments; above the limit a
    * distributed semi-join does the whole check in one shuffle.
    */
  private def enforceUnique(root: Path, readSchema: StructType,
      frags: Seq[FragmentMeta], name: String, columns: Seq[String],
      tableFrags: Seq[FragmentMeta],
      mapping: Map[String, String] = Map.empty): Unit = {
    import org.apache.spark.sql.functions.col
    val spark = SparkSession.active
    val missing = columns.filterNot(readSchema.fieldNames.contains)
    require(missing.isEmpty,
      s"UNIQUE constraint '$name' references unknown column(s) " +
        s"${missing.mkString(", ")} at $root")
    val keyDesc = columns.mkString(", ")
    val allSet = columns.map(col(_).isNotNull).reduce(_ && _)
    val files = frags.map(f =>
      LanceFormat.fragmentPath(root, f.file).toString)
    val stagedKeys = readLogical(spark, readSchema, mapping, files)
      .select(columns.map(col): _*).filter(allSet)
    val dupInside = stagedKeys.groupBy(columns.map(col): _*)
      .count().filter(col("count") > 1).limit(1).count()
    if (dupInside > 0) throw new IllegalArgumentException(
      s"UNIQUE constraint '$name' ($keyDesc) violated INSIDE the written " +
        s"batch at $root - commit refused, no version created")
    if (tableFrags.isEmpty) return
    val limit = spark.conf.getOption("spark.graft.unique.inlistLimit")
      .map(_.toInt).getOrElse(10000)
    val lead = columns.head
    val distinctKeys = stagedKeys.distinct()
    // the prune driver is the LEAD column: distinct lead values push as an
    // IN filter through every skipping layer; a composite key prunes on
    // the lead and confirms on the full tuple
    val leadVals = stagedKeys.select(col(lead)).distinct()
      .limit(limit + 1).collect().map(_.get(0))
    def fail(): Nothing = throw new IllegalArgumentException(
      s"UNIQUE constraint '$name' ($keyDesc) violated: the written batch at " +
        s"$root repeats key(s) already in the table - commit refused")
    if (leadVals.length <= limit) {
      // point-probe path: stats + scalar-index prune the IN filter down
      // to candidate fragments, then one pushed-filter read of only those
      val physSchema = LanceFormat.toPhysical(readSchema, mapping)
      val inFilter: org.apache.spark.sql.sources.Filter =
        org.apache.spark.sql.sources.In(mapping.getOrElse(lead, lead), leadVals)
      val pseudo = graft.format.Manifest(0L, physSchema.json, tableFrags)
      val kept = graft.index.ScalarIndex.prune(spark, root.toString, pseudo,
        Seq(inFilter),
        graft.format.FragmentStats.prune(physSchema, tableFrags,
          Array(inFilter)))
      if (kept.isEmpty) return
      val tblFiles = kept.map(f =>
        LanceFormat.fragmentPath(root, f.file).toString)
      val candidates = readLogical(spark, readSchema, mapping, tblFiles)
        .select(columns.map(col): _*)
        .filter(col(lead).isin(leadVals: _*))
      val hit =
        if (columns.lengthCompare(1) == 0) candidates.limit(1).count()
        else candidates.filter(allSet)
          .join(distinctKeys, columns, "left_semi").limit(1).count()
      if (hit > 0) fail()
    } else {
      log.info(s"unique '$name' at $root: batch key set exceeds " +
        s"inlistLimit=$limit - checking via distributed semi-join")
      val tblFiles = tableFrags.map(f =>
        LanceFormat.fragmentPath(root, f.file).toString)
      val hit = readLogical(spark, readSchema, mapping, tblFiles)
        .select(columns.map(col): _*).filter(allSet)
        .join(distinctKeys, columns, "left_semi")
        .limit(1).count()
      if (hit > 0) fail()
    }
  }

  /** Close the enforce→commit window (the addConstraint TOCTOU's writer
    * side): a rule committed AFTER this writer read its constraint set
    * but BEFORE its manifest landed was never checked against this batch
    * — yet the committed manifest CARRIES it (append/replace re-read the
    * previous manifest inside their retry loops), so the table would
    * claim a rule its newest data never passed. After the commit, any
    * rule present in the committed manifest but absent from the enforced
    * set is validated against the batch's files; on violation the batch
    * is COMPENSATED away (one replace commit removing exactly its
    * fragments — identified by file name, collision-free UUIDs) and the
    * writer fails loud. The violating version is readable for the
    * instant between the two commits — the price of optimistic
    * concurrency without a table lock; addConstraint's own re-validation
    * covers the mirror-image interleaving.
    */
  def verifyConstraintsPostCommit(root: Path, fs: org.apache.hadoop.fs.FileSystem,
      schema: StructType, frags: Seq[FragmentMeta],
      enforced: Map[String, String],
      committed: graft.format.Manifest,
      baseFragments: Seq[FragmentMeta] = Seq.empty): Unit = {
    val mapping = committed.mapping
    if (frags.isEmpty) return
    val myFiles = frags.map(_.file).toSet
    val fresh = committed.checkConstraints -- enforced.keySet
    // UNIQUE rules additionally need CONFLICT DETECTION under optimistic
    // concurrency: two racing appends of the same key each pass the
    // pre-commit probe (neither sees the other's staged data). The
    // SECOND to land sees the first's fragments as "interleaved" —
    // committed but in neither its base nor its own batch — and re-probes
    // its keys against exactly those fragments (cost ∝ interleaved data,
    // zero when nothing raced). The first lands clean; the second rolls
    // back — the standard first-committer-wins outcome.
    val baseFiles = baseFragments.map(_.file).toSet
    val interleaved = committed.fragments.filterNot(f =>
      myFiles.contains(f.file) || baseFiles.contains(f.file))
    val carriedUnique = (committed.checkConstraints -- fresh.keySet)
      .filter { case (_, e) => LanceFormat.uniqueColumn(e).isDefined }
    if (fresh.isEmpty && (interleaved.isEmpty || carriedUnique.isEmpty)) return
    val readSchema = StructType(schema.fields.map(_.copy(nullable = true)))
    try {
      if (fresh.nonEmpty)
        enforceConstraints(root, schema, frags, fresh,
          tableFrags = committed.fragments.filterNot(f => myFiles.contains(f.file)),
          mapping = mapping)
      if (interleaved.nonEmpty) carriedUnique.foreach { case (n, e) =>
        enforceUnique(root, readSchema, frags, n,
          LanceFormat.uniqueColumns(e).get, interleaved, mapping)
      }
    } catch {
      case e: IllegalArgumentException =>
        // compensation must survive further concurrency: re-resolve the
        // batch's fragments BY FILE NAME (collision-free UUIDs) against
        // the CURRENT manifest — ids from `committed` go stale the moment
        // a concurrent compaction/replace renumbers or absorbs them, and
        // commitReplace would throw ConcurrentModificationException,
        // swallowing the violation and leaving the bad batch committed.
        val compFailure: Option[Throwable] = try {
          val cur = LanceFormat.readLatest(fs, root).getOrElse(committed)
          val ids = cur.fragments.filter(f => myFiles.contains(f.file))
            .map(_.id).toSet
          if (ids.nonEmpty) {
            LanceFormat.commitReplace(fs, root, cur.schema, ids,
              Seq.empty, operation = "replace")
            None
          } else if (committed.fragments.exists(f => myFiles.contains(f.file))) {
            // our files left the manifest but a row-preserving rewrite may
            // have REPACKED their rows into files we cannot identify —
            // compensation cannot address them; fail the loud way
            Some(new IllegalStateException(
              "batch fragments were absorbed by a concurrent rewrite; " +
                "their rows cannot be compensated away by file name"))
          } else None // batch never made the manifest — nothing to undo
        } catch { case c: Exception => Some(c) }
        compFailure match {
          case None =>
            throw new IllegalArgumentException(
              s"a constraint was added or a conflicting batch landed " +
                s"concurrently with this write at $root and the batch violates " +
                "it - the batch was rolled back in a compensating commit", e)
          case Some(c) =>
            val err = new IllegalArgumentException(
              s"a constraint was added or a conflicting batch landed " +
                s"concurrently with this write at $root and the batch violates " +
                "it - AND the compensating rollback itself failed (concurrent " +
                "maintenance?): the violating batch REMAINS COMMITTED while the " +
                "manifest carries the rule; repair with DELETE/compact", e)
            err.addSuppressed(c)
            throw err
        }
    }
  }

  /** Delta-refresh the dataset's persisted index sidecars after a
    * commit (`write.refresh-indexes`) — streaming epochs and batch
    * writes alike. Runs on the driver in the commit thread — blocking
    * there is the point: the indexes are fresh before the write returns
    * / the next epoch's data is visible. Each
    * refresh failure is a warn, not a stream failure: a stale index stays
    * CORRECT (scalar: uncovered fragments never wrongly pruned;
    * vector/fts: staleness guards on their search paths).
    */
  def refreshIndexesAfterCommit(rootStr: String, kinds: Set[String]): Unit = {
    val spark = SparkSession.active
    val root = new Path(rootStr)
    val fs = LanceFormat.fileSystem(root, spark.sessionState.newHadoopConf())
    LanceFormat.listIndexSidecars(fs, root).foreach { case (column, kind) =>
      def run(refresh: => Any): Unit =
        try { refresh; () } catch {
          case e: Exception =>
            log.warn(s"epoch index refresh failed ($kind, $column) at $rootStr " +
              s"- index is stale but correct: $e")
        }
      if (kinds(kind)) kind match {
        case "scalar" => run(graft.index.ScalarIndex.refresh(spark, rootStr, column))
        case "fts" => run(graft.index.FtsIndex.refresh(spark, rootStr, column))
        case "ivf" => run(graft.index.IvfIndex.refresh(spark, rootStr, column))
        case _ => () // "hnsw" graphs refresh through their ivf sidecar
      }
    }
  }
}

/** Driver-side cache of the ANALYZE sidecar rendered as DSv2 column
  * statistics, keyed by (table root, manifest version). A data commit
  * changes the version — a new key — so entries can never serve a stale
  * fragment set; [[graft.Lance.analyze]] invalidates its root explicitly
  * (a re-ANALYZE rewrites the sidecar without a new table version). Small
  * and LRU-bounded: one entry per (table, version) actively planned.
  */
object ScanStatsCache {
  private type Stats =
    Map[String, org.apache.spark.sql.connector.read.colstats.ColumnStatistics]
  private val cache =
    new java.util.LinkedHashMap[(String, Long, Long), Stats](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long, Long), Stats]): Boolean = size > 64
    }

  def get(rootAndLineage: String, version: Long, statsMtime: Long)(
      compute: => Stats): Stats = {
    val k = (rootAndLineage, version, statsMtime)
    cache.synchronized(Option(cache.get(k))) match {
      case Some(s) => s
      case None =>
        val s = compute
        cache.synchronized(cache.put(k, s))
        s
    }
  }

  /** Same-JVM fast path after [[graft.Lance.analyze]]; the sidecar mtime
    * in the key is what expires entries across applications. Prefix
    * match: the key carries a `#branch` suffix per lineage. */
  def invalidate(root: String): Unit = cache.synchronized {
    val norm = new org.apache.hadoop.fs.Path(root).toString
    cache.keySet.removeIf(_._1.startsWith(s"$norm#"))
  }
}
