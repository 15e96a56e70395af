package graft.catalog

import graft.connector.LanceTable
import graft.format.LanceFormat
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util
import scala.jdk.CollectionConverters._

/** Warehouse-directory catalog: `warehouse/<namespace>/<table>` where a
  * table dir is valid iff it contains `_versions/` — the same layout and
  * validity marker as the reference catalog (`table/LanceCatalog.java:
  * 100-202,379-403`). Register with:
  *
  * {{{
  * spark.sql.catalog.lance = graft.catalog.LanceCatalog
  * spark.sql.catalog.lance.warehouse = /path/to/warehouse
  * }}}
  *
  * then `CREATE/DROP/SHOW` DDL, `INSERT INTO lance.db.t`, and
  * `SELECT ... FROM lance.db.t` all flow through Spark SQL (S8–S9).
  * Object-store access needs no special plumbing (reference S10): Hadoop
  * `fs.s3a.*` configuration applies transparently to the warehouse path.
  */
class LanceCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog with FunctionCatalog {

  private var catalogName: String = _
  private var warehouse: Path = _

  // ---- V2 functions: the `bucket` transform behind storage-partitioned
  // joins. Spark resolves a scan's KeyGroupedPartitioning(bucket(n, col))
  // against THIS function and aligns two scans whose bound functions share
  // a canonical name — so both sides of a co-bucketed join agree on the
  // transform without evaluating it (partition values ride HasPartitionKey).
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, "bucket"))

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    ident.name.toLowerCase match {
      case "bucket" => GraftBucketFunction
      case _ => throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(ident)
    }

  private def spark: SparkSession = SparkSession.active
  private def fs: FileSystem =
    warehouse.getFileSystem(spark.sessionState.newHadoopConf())

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val wh = options.get("warehouse")
    require(wh != null, s"spark.sql.catalog.$name.warehouse must be set")
    warehouse = new Path(wh)
  }

  override def name(): String = catalogName

  /** Opt into `ALTER TABLE ... ADD COLUMN c T DEFAULT v` (Spark refuses
    * the syntax for catalogs that don't declare it). */
  override def capabilities(): java.util.Set[
      org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(org.apache.spark.sql.connector.catalog
      .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  private def nsPath(ns: Array[String]): Path =
    ns.foldLeft(warehouse)((p, n) => new Path(p, n))

  private def tablePath(ident: Identifier): Path =
    new Path(nsPath(ident.namespace), ident.name)

  // ---- namespaces (S8) ----

  override def listNamespaces(): Array[Array[String]] = {
    if (!fs.exists(warehouse)) return Array.empty
    fs.listStatus(warehouse).filter(_.isDirectory)
      .map(s => Array(s.getPath.getName))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || fs.exists(nsPath(namespace))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Map("location" -> nsPath(namespace).toString).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    // single-level only, like the reference's database-per-directory model
    // (`table/LanceCatalog.java:224-374`): nested namespaces would be
    // invisible to listNamespaces and escape the dropNamespace guard
    require(namespace.length == 1,
      s"lance catalog supports single-level namespaces, got ${namespace.mkString(".")}")
    if (namespaceExists(namespace)) throw new NamespaceAlreadyExistsException(namespace)
    fs.mkdirs(nsPath(namespace))
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE is not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    if (!cascade && listTables(namespace).nonEmpty)
      throw new IllegalStateException(s"namespace ${namespace.mkString(".")} is not empty")
    fs.delete(nsPath(namespace), true)
  }

  // ---- tables (S9) ----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val p = nsPath(namespace)
    if (!fs.exists(p)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(p).filter(_.isDirectory)
      .filter(s => LanceFormat.isDataset(fs, s.getPath))
      .map(s => Identifier.of(namespace, s.getPath.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    LanceFormat.isDataset(fs, tablePath(ident))

  override def loadTable(ident: Identifier): Table = {
    val p = tablePath(ident)
    if (!LanceFormat.isDataset(fs, p)) throw new NoSuchTableException(ident)
    // schema inferred from the stored manifest (reference getTable,
    // table/LanceCatalog.java:412-459)
    val schema = LanceFormat.readLatest(fs, p).map(_.schema).getOrElse(new StructType())
    new LanceTable(p.toString, schema)
  }

  /** SQL time travel: `SELECT ... FROM lance.db.t VERSION AS OF 3`, a
    * TAG name — `VERSION AS OF 'train-v1'` resolves through the tag file
    * (Iceberg's branch/tag-in-VERSION-AS-OF ergonomics) — or a BRANCH —
    * `VERSION AS OF 'branch:exp1'` reads the branch lineage's head
    * (previously Scala-only via `option("branch", ...)`). The explicit
    * `branch:` prefix keeps tags and branches unambiguous (`:` is not a
    * valid ref-name character); a bare name that is a branch but not a
    * tag fails loud with the prefixed spelling, never silently guesses.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val p = tablePath(ident)
    if (!LanceFormat.isDataset(fs, p)) throw new NoSuchTableException(ident)
    if (version.toLowerCase(java.util.Locale.ROOT).startsWith("branch:")) {
      val b = LanceFormat.validateName("branch", version.substring("branch:".length))
      val bp = LanceFormat.branchPath(p, b)
      require(fs.exists(bp), s"no branch '$b' of ${ident.name}")
      val head = LanceFormat.readLatestIn(fs, bp).getOrElse(
        throw new IllegalArgumentException(
          s"branch '$b' of ${ident.name} has no manifests"))
      return new LanceTable(p.toString, head.schema, None, Some(b))
    }
    val v = try version.toLong catch {
      case _: NumberFormatException =>
        LanceFormat.readTag(fs, p, version).map(_.version).getOrElse {
          if (fs.exists(LanceFormat.branchPath(p, version)))
            throw new IllegalArgumentException(
              s"'$version' is a BRANCH of ${ident.name}, not a tag - read it " +
                s"with VERSION AS OF 'branch:$version'")
          throw new IllegalArgumentException(
            s"'$version' is neither a numeric version nor a tag of ${ident.name}")
        }
    }
    require(LanceFormat.listVersions(fs, p).contains(v),
      s"no version $v of ${ident.name} (have ${LanceFormat.listVersions(fs, p).mkString(",")})")
    val schema = LanceFormat.readManifest(fs, p, v).schema
    new LanceTable(p.toString, schema, Some(v))
  }

  /** SQL time travel: `TIMESTAMP AS OF` — newest version committed at or
    * before the timestamp (micros since epoch, per the connector contract).
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val p = tablePath(ident)
    if (!LanceFormat.isDataset(fs, p)) throw new NoSuchTableException(ident)
    val cutoffMs = timestampMicros / 1000L
    val v = LanceFormat.listVersions(fs, p)
      .filter(LanceFormat.readManifest(fs, p, _).committedAtMs <= cutoffMs)
      .lastOption.getOrElse(throw new IllegalArgumentException(
        s"no version of ${ident.name} existed at timestamp $timestampMicros"))
    val schema = LanceFormat.readManifest(fs, p, v).schema
    new LanceTable(p.toString, schema, Some(v))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    require(partitions.isEmpty, "lance tables do not support partitioning transforms")
    val p = tablePath(ident)
    LanceFormat.create(fs, p, schema)
    new LanceTable(p.toString, schema)
  }

  /** Schema evolution: `ALTER TABLE ... ADD COLUMN` commits a new manifest
    * version with the widened schema and the SAME fragments — old
    * fragments read NULL for the added column (fragments resolve columns
    * by name), new writes carry it. Added columns must be top-level and
    * nullable (there is no value to backfill 100 TB of immutable
    * fragments with). `DROP COLUMN` is metadata-only too — readers
    * project the manifest schema, so the dropped bytes are never read —
    * with the dropped NAME recorded so a later re-ADD cannot resurrect
    * old values ([[graft.format.Manifest.dropped]]). Renames and type
    * changes would rewrite data and stay unsupported, loudly.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val p = tablePath(ident)
    if (!LanceFormat.isDataset(fs, p)) throw new NoSuchTableException(ident)
    val current = LanceFormat.readLatest(fs, p)
      .getOrElse(throw new NoSuchTableException(ident))
    val additions = Seq.newBuilder[org.apache.spark.sql.types.StructField]
    val deletions = Seq.newBuilder[String]
    val renames = Seq.newBuilder[(String, String)]
    val widens = Seq.newBuilder[(String, org.apache.spark.sql.types.DataType)]
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames.length == 1,
          s"lance supports adding top-level columns only, got ${add.fieldNames.mkString(".")}")
        // with a DEFAULT, old fragments read the constant (never NULL),
        // so nullability is the user's choice; without one they read
        // NULL, so the column must admit it
        require(add.isNullable || add.defaultValue() != null,
          s"added column '${add.fieldNames.head}' must be nullable or carry " +
            "a DEFAULT: existing fragments are immutable and read NULL " +
            "without one")
        require(!current.dropped.contains(add.fieldNames.head),
          s"column '${add.fieldNames.head}' was previously DROPPED and old " +
            "fragments still hold its data — re-adding the name would " +
            "resurrect those values (rewrite the table first, e.g. compact)")
        // rename-flavored resurrection: the PHYSICAL name of a renamed
        // column is still live on disk — a new column may not reuse it
        require(!current.mapping.values.exists(_ == add.fieldNames.head),
          s"column name '${add.fieldNames.head}' is the PHYSICAL name of a " +
            "renamed column - old fragments hold its bytes; pick another name")
        // DEFAULT: validated constant, carried as Spark's own
        // EXISTS_DEFAULT/CURRENT_DEFAULT schema metadata — every scan
        // fills it for fragments that physically lack the column
        val md = Option(add.defaultValue())
          .map(d => LanceFormat.defaultMetadata(
            add.fieldNames.head, add.dataType, d.getSql))
          .getOrElse(org.apache.spark.sql.types.Metadata.empty)
        additions += org.apache.spark.sql.types.StructField(
          add.fieldNames.head, add.dataType, nullable = add.isNullable,
          metadata = md)
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames.length == 1,
          s"lance supports dropping top-level columns only, got ${del.fieldNames.mkString(".")}")
        deletions += del.fieldNames.head
      case ren: TableChange.RenameColumn =>
        require(ren.fieldNames.length == 1,
          s"lance supports renaming top-level columns only, got ${ren.fieldNames.mkString(".")}")
        renames += ren.fieldNames.head -> ren.newName
      case upd: TableChange.UpdateColumnType =>
        require(upd.fieldNames.length == 1,
          s"lance supports widening top-level columns only, got ${upd.fieldNames.mkString(".")}")
        widens += upd.fieldNames.head -> upd.newDataType
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE supports ADD/DROP/RENAME COLUMN and widening ALTER " +
          s"COLUMN TYPE only on lance tables, got $other")
    }
    val adds = additions.result()
    val dels = deletions.result()
    val rens = renames.result()
    val wids = widens.result()
    if (wids.nonEmpty) {
      // type widening is its own metadata commit ([[LanceFormat
      // .commitWiden]]) — same single-statement posture as RENAME
      require(adds.isEmpty && dels.isEmpty && rens.isEmpty && wids.size == 1,
        "ALTER COLUMN TYPE must be its own ALTER TABLE statement")
      val (c, t) = wids.head
      val m = LanceFormat.commitWiden(fs, p, c, t)
      return new LanceTable(p.toString, m.schema)
    }
    if (rens.nonEmpty) {
      // RENAME is its own metadata commit (mapping + schema + remapped
      // rules in one, [[LanceFormat.commitRename]]); mixing it with
      // ADD/DROP in one statement is refused for a crisp failure story
      require(adds.isEmpty && dels.isEmpty && rens.size == 1,
        "RENAME COLUMN must be its own ALTER TABLE statement")
      val (o, n) = rens.head
      val m = LanceFormat.commitRename(fs, p, o, n)
      return new LanceTable(p.toString, m.schema)
    }
    adds.foreach(a => require(!current.schema.fieldNames.contains(a.name),
      s"column '${a.name}' already exists in ${ident.name}"))
    dels.foreach(d => require(current.schema.fieldNames.contains(d),
      s"no column '$d' in ${ident.name}"))
    require(current.schema.fields.length - dels.length + adds.length > 0,
      s"cannot drop every column of ${ident.name}")
    if (dels.isEmpty) {
      // pure ADD rides the append-merge path (concurrent-append safe)
      val merged = LanceFormat.mergeSchemas(current.schema,
        org.apache.spark.sql.types.StructType(adds.toArray))
      LanceFormat.commitAppend(fs, p, merged, Seq.empty)
      new LanceTable(p.toString, merged)
    } else {
      // DROP COLUMN is metadata-only: readers project the manifest
      // schema, so old fragments' extra bytes are simply never read.
      // The dropped name is RECORDED — re-adding it is refused until a
      // full rewrite clears the list (resurrection guard, Manifest doc).
      val kept = org.apache.spark.sql.types.StructType(
        current.schema.fields.filterNot(f => dels.contains(f.name)))
      val merged =
        if (adds.isEmpty) kept
        else LanceFormat.mergeSchemas(kept,
          org.apache.spark.sql.types.StructType(adds.toArray))
      // a CHECK constraint referencing a dropped column would fail
      // analysis inside EVERY later write's enforcement — the table
      // would be write-bricked by an unrelated-looking error. Refuse
      // here, naming the rule to drop first.
      current.checkConstraints.foreach { case (cname, e) =>
        LanceFormat.uniqueColumns(e) match {
          case Some(ucols) =>
            // the sentinel is not a SQL expression — check every key
            // column survives the drop directly
            val lost = ucols.filterNot(merged.fieldNames.contains)
            require(lost.isEmpty,
              s"cannot drop column(s) ${dels.mkString(", ")}: UNIQUE " +
                s"constraint '$cname' references '${lost.mkString(", ")}' - " +
                "CALL drop_constraint first")
          case None =>
            val analyzes = scala.util.Try {
              spark.createDataFrame(
                spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], merged)
                .filter(org.apache.spark.sql.functions.expr(e))
                .queryExecution.analyzed
            }.isSuccess
            require(analyzes,
              s"cannot drop column(s) ${dels.mkString(", ")}: CHECK constraint " +
                s"'$cname' ($e) references the post-drop schema invalidly - " +
                "CALL drop_constraint first")
        }
      }
      // registered MVs/replicas name source columns logically in their
      // specs — dropping one under them bricks every later refresh/sync
      LanceFormat.requireNoDependentReferences(current, dels.toSeq, "drop")
      // the change was derived FROM current.schema: a concurrent schema
      // evolution fails loud (CME) instead of being silently erased.
      // Dropped names are recorded under their PHYSICAL spelling (what
      // old fragments actually hold — the resurrection guard's subject)
      // and a dropped renamed column releases its mapping entry.
      LanceFormat.commitAlter(fs, p, merged,
        (current.dropped ++ dels.map(current.physicalName)).distinct,
        expectedSchemaJson = Some(current.schemaJson),
        mappingTransform = _ -- dels)
      new LanceTable(p.toString, merged)
    }
  }

  override def dropTable(ident: Identifier): Boolean =
    tableExists(ident) && fs.delete(tablePath(ident), true)

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    if (!fs.rename(tablePath(oldIdent), tablePath(newIdent)))
      throw new IllegalStateException(s"rename failed: $oldIdent -> $newIdent")
  }

  // ---- maintenance procedures (Iceberg-style SQL CALL) ----

  /** `CALL lance.compact('db.t')`, `CALL lance.vacuum('db.t', 3)`,
    * `CALL lance.cluster('db.t', 'a,b')`, `CALL lance.refresh_index('db.t',
    * 'embedding')` — the maintenance surface as SQL, each returning its
    * outcome as a one-row result. The table argument is `ns.table`
    * relative to THIS catalog.
    */
  override def loadProcedure(ident: Identifier): procedures.UnboundProcedure = {
    require(LanceCatalog.ProcedureNames.contains(ident.name.toLowerCase),
      s"unknown procedure ${ident.name}; have ${LanceCatalog.ProcedureNames.mkString(", ")}")
    new LanceProcedure(this, ident.name.toLowerCase)
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    LanceCatalog.ProcedureNames.map(Identifier.of(namespace, _)).toArray

  /** Resolve a procedure's `'ns.table'` argument to the dataset path. */
  private[graft] def resolveTableArg(table: String): Path = {
    val parts = table.split('.')
    val ident = Identifier.of(parts.init, parts.last)
    if (!LanceFormat.isDataset(fs, tablePath(ident)))
      throw new NoSuchTableException(ident)
    tablePath(ident)
  }

  /** A table argument resolved to its warehouse path with NO existence
    * check — DROP-style verbs that self-heal a missing target. */
  private[graft] def resolveAnyTableArg(table: String): Path = {
    val parts = table.split('.')
    tablePath(Identifier.of(parts.init, parts.last))
  }

  /** A procedure argument naming a table to be CREATED (clone targets):
    * resolved to its warehouse path, refused if it already exists. */
  private[graft] def resolveNewTableArg(table: String): Path = {
    val parts = table.split('.')
    val ident = Identifier.of(parts.init, parts.last)
    require(!LanceFormat.isDataset(fs, tablePath(ident)),
      s"table $table already exists")
    tablePath(ident)
  }
}

object LanceCatalog {
  private[catalog] val ProcedureNames =
    Seq("compact", "vacuum", "cluster", "refresh_index", "refresh_fts",
      "build_scalar_index", "refresh_scalar_index",
      "drop_index", "update_where", "upsert", "replace_where",
      "remove_orphans", "restore",
      "tag", "untag", "create_branch", "drop_branch", "fast_forward",
      "rebase_branch", "cherry_pick",
      "add_constraint", "drop_constraint", "set_not_null", "drop_not_null",
      "rename_column", "widen_column",
      "add_unique", "clone_table", "cluster_by_bucket", "rebucket",
      "analyze_table", "set_bloom_filters", "optimize", "fsck",
      "create_mv", "refresh_mv", "set_properties", "unset_properties",
      "publish_branch", "resume_publish", "create_replica",
      "sync_replica", "set_retention",
      "register_consumer", "advance_consumer", "drop_consumer",
      "drop_mv", "drop_replica")
}

private[catalog] object LanceProcedure {
  /** Parse `"col = expr, col2 = expr2"`: split on commas at bracket/quote
    * depth 0 (so `greatest(a, b)` survives), then on the first `=` of each
    * piece. Expressions are parsed by `expr()` downstream — this only
    * finds the assignment boundaries.
    */
  def parseAssignments(s: String): Map[String, String] =
    splitTopLevel(s).map { p =>
      val i = p.indexOf('=')
      require(i > 0, s"malformed assignment '$p' (expected col = expr)")
      p.take(i).trim -> p.drop(i + 1).trim
    }.toMap

  /** Split on commas at bracket/quote depth 0 (so `greatest(a, b)` and
    * `'a,b'` survive). */
  def splitTopLevel(s: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0; var quote: Char = 0
    s.foreach { ch =>
      if (quote != 0) { if (ch == quote) quote = 0; cur += ch }
      else ch match {
        case '\'' | '"' => quote = ch; cur += ch
        case '(' | '[' => depth += 1; cur += ch
        case ')' | ']' => depth -= 1; cur += ch
        case ',' if depth == 0 => parts += cur.result(); cur.clear()
        case _ => cur += ch
      }
    }
    if (cur.nonEmpty) parts += cur.result()
    parts.toSeq
  }

  /** Parse a `CALL create_mv` aggregate list: `func(col) AS alias
    * [, ...]` with func ∈ count|sum|min|max|avg and `count(*)` allowed. */
  /** `func(arg) AS alias [, ...]` where `arg` is a column OR any scalar
    * SQL expression (balanced parens/quotes survive the split) and
    * `func` ∈ count|sum|min|max|avg|count_distinct. */
  def parseAggList(s: String): Seq[graft.operators.MaterializedView.AggSpec] = {
    val AsRe = """(?i)^AS\s+(\w+)$""".r
    splitTopLevel(s).filter(_.trim.nonEmpty).map { item =>
      val t = item.trim
      val open = t.indexOf('(')
      def bad() = throw new IllegalArgumentException(
        s"malformed aggregate '$t' (expected func(col-or-expr) AS alias, " +
          "func in count|sum|min|max|avg|count_distinct)")
      if (open <= 0) bad()
      val func = t.substring(0, open).trim.toLowerCase
      // quote-aware paren matching (splitTopLevel's rule): a paren
      // inside a string literal — instr(s, '(') — is not structure
      var depth = 0; var close = -1; var i = open; var quote: Char = 0
      while (i < t.length && close < 0) {
        val ch = t(i)
        if (quote != 0) { if (ch == quote) quote = 0 }
        else ch match {
          case '\'' | '"' => quote = ch
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) close = i
          case _ => ()
        }
        i += 1
      }
      if (close < 0) bad()
      val arg = t.substring(open + 1, close).trim
      val alias = t.substring(close + 1).trim match {
        case AsRe(a) => a
        case _ => bad()
      }
      graft.operators.MaterializedView.AggSpec(func, arg, alias)
    }
  }
}

/** One class serves all four maintenance procedures: `bind` is identity
  * (parameters are static), `call` runs the facade op and returns the
  * outcome row as a driver-side LocalScan.
  */
private[catalog] class LanceProcedure(catalog: LanceCatalog, procName: String)
    extends procedures.UnboundProcedure with procedures.BoundProcedure {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.connector.catalog.procedures.ProcedureParameter.in
  import org.apache.spark.sql.types._

  override def name(): String = procName
  override def description(): String = procName match {
    case "compact" => "rewrite small fragments into maxRowsPerFile-sized ones (new MVCC version)"
    case "vacuum" => "drop old versions and reclaim fragment files only they referenced (older_than_ms pins young versions)"
    case "cluster" => "Z-order rewrite so manifest stats prune on every listed column"
    case "cluster_by_bucket" => "hash-bucket rewrite (bucket(n, cols)): co-bucketed tables join shuffle-free (storage-partitioned join); empty cols clears the layout"
    case "rebucket" => "re-route untagged fragments under the declared bucket layout (I/O proportional to what needs re-routing); storage-partitioned joins engage again once every fragment is tagged"
    case "set_bloom_filters" => "declare parquet bloom-filter columns: future fragments carry per-row-group membership proofs for =/IN point lookups; empty cols clears"
    case "optimize" => "one scheduled maintenance run: compact the small-fragment tail, refresh index sidecars (stale ones reported, never silently rebuilt), re-analyze previously analyzed columns, optionally vacuum"
    case "fsck" => "read-only metadata integrity check: referenced files exist at their recorded sizes, schema/rule/layout declarations agree, index sidecars load and never claim a version ahead of the table"
    case "analyze_table" => "per-column NDV sketches (HyperLogLog) into the stats sidecar; the scan serves them to CBO. Incremental: appends since the last ANALYZE merge by sketch union"
    case "update_where" => "row-level UPDATE: stats-scoped copy-on-write rewrite"
    case "upsert" => "MERGE a view/table into the dataset on key columns (update-or-insert)"
    case "replace_where" => "predicate-scoped overwrite (backfill): atomically replace exactly the rows matching the condition with a view/table's rows; refuses rows outside the range"
    case "remove_orphans" => "delete data files no retained manifest references (crash leftovers)"
    case "restore" => "roll the table back to a prior version as a NEW commit (history preserved)"
    case "create_mv" => "create an incremental materialized view: one full aggregate of the source plus graft.mv.* bookkeeping in ONE commit; refresh_mv then maintains it from the row-level change feed"
    case "refresh_mv" => "incremental view refresh: sum/count/avg views apply signed delta arithmetic over the change feed (cost = the change); min/max views recompute only affected groups; state + watermark land in one commit (exactly-once)"
    case "set_properties" => "set free-form table properties (TBLPROPERTIES) as one metadata commit; reserved lance.*/graft.* namespaces refused"
    case "unset_properties" => "remove table properties by key (one metadata commit)"
    case "publish_branch" => "write-audit-publish: audit the branch head against named boolean checks (one scan), then fast-forward or rebase it into main; a failed audit leaves main untouched"
    case "resume_publish" => "resume a crashed quarantine publish from its _quarantine_publish marker: re-runs the split idempotently (token-stamped commits), landing exactly the passing subset once"
    case "create_replica" => "seed a keyed downstream replica (full copy + graft.replica.* bookkeeping in one commit); sync_replica then maintains it from the change feed"
    case "sync_replica" => "apply the feed window's net-per-key changes to the replica in one atomic commit (cost = the change, never the table)"
    case "set_retention" => "declare a retention policy (graft.retention.* properties): CALL optimize without keep_versions then vacuums to it - the self-contained nightly maintenance call; keep_versions < 1 clears"
    case "register_consumer" => "register a named external changefeed consumer watermark (graft.consumer.<name>): the retention vacuum keeps versions back to it - the Kafka consumer-offset shape for lance_changes readers outside the view/replica registry"
    case "advance_consumer" => "advance a registered consumer's watermark (monotonic) after its window is processed"
    case "drop_consumer" => "release a consumer's retention pin"
    case "drop_mv" => "unregister a materialized view from its source (and its dims) and delete it; the source's feed window stops being pinned"
    case "drop_replica" => "unregister a replica from its source and delete it; the source's feed window stops being pinned"
    case "refresh_fts" => "delta-index appended fragments into the FTS postings (touched buckets only)"
    case "drop_index" => "delete a column's index sidecars (ivf | fts | scalar | all) and evict session caches"
    case "build_scalar_index" => "build the value->fragment scalar index for point-lookup pruning"
    case "refresh_scalar_index" => "delta-index appended fragments into the scalar postings"
    case "tag" => "pin a committed version under a stable name (vacuum keeps it; read via tagAsOf)"
    case "untag" => "drop a tag; its version becomes vacuum-eligible again"
    case "create_branch" => "seed an append-only branch lineage from a version (O(1 manifest), no data copy)"
    case "drop_branch" => "delete a branch; its unshared data becomes GC-reclaimable"
    case "fast_forward" => "adopt the branch head on main as one commit (only if main has not moved)"
    case "rebase_branch" => "re-commit an append-only branch's fragments onto main's CURRENT head (the diverged case fast_forward refuses)"
    case "cherry_pick" => "adopt ONE branch append commit into main by reference (metadata-only; main's current CHECK/UNIQUE constraints re-proven; idempotent re-pick)"
    case "add_constraint" => "add a CHECK constraint (validates existing data; every commit re-validates its batch)"
    case "drop_constraint" => "drop a CHECK constraint"
    case "set_not_null" => "declare a column NOT NULL (validates existing rows; rule + schema nullability in one commit)"
    case "add_unique" => "declare a column (or comma-listed composite key) UNIQUE (validates existing rows; every commit point-probes its keys against the table)"
    case "drop_not_null" => "drop a NOT NULL declaration (rule removed, column back to nullable)"
    case "rename_column" => "rename a column (one metadata commit: schema + logical-to-physical mapping; structured rules remap, CHECK/index references refuse)"
    case "widen_column" => "widen a column's type in place (one metadata commit, old fragments read up-converted; value-preserving transitions only, index references refuse)"
    case "clone_table" => "zero-copy shallow clone: a NEW table whose first manifest borrows the source version's fragment files (one manifest write, no data copied; vacuum the source breaks it — tag the source version to pin)"
    case _ => "delta-index fragments appended since the IVF index was built"
  }
  override def bind(inputType: StructType): procedures.BoundProcedure = this
  override def isDeterministic: Boolean = false

  override def parameters(): Array[procedures.ProcedureParameter] = procName match {
    case "compact" => Array(in("table", StringType).build(),
      in("min_rows", IntegerType).defaultValue("-1")
        .comment("-1 = full rewrite; >=0 = bin-pack only fragments " +
          "smaller than this (I/O proportional to the small tail)").build())
    case "vacuum" => Array(in("table", StringType).build(),
      in("keep_versions", IntegerType).defaultValue("1").build(),
      in("older_than_ms", LongType).defaultValue("-1")
        .comment("versions committed within this horizon survive " +
          "regardless of count; -1 disables the time pin").build())
    case "cluster" => Array(in("table", StringType).build(),
      in("cols", StringType).comment("comma-separated numeric columns").build())
    case "cluster_by_bucket" => Array(in("table", StringType).build(),
      in("cols", StringType)
        .comment("comma-separated key columns (uniform num_buckets), or " +
          "Iceberg-style 'bucket(8,a),bucket(32,b)' entries for " +
          "per-column widths; empty clears the layout").build(),
      in("num_buckets", IntegerType).defaultValue("16").build())
    case "rebucket" => Array(in("table", StringType).build(),
      in("max_rows_per_file", LongType).defaultValue("1000000").build())
    case "set_bloom_filters" => Array(in("table", StringType).build(),
      in("cols", StringType)
        .comment("comma-separated columns; empty clears the declaration").build())
    case "fsck" => Array(in("table", StringType).build())
    case "optimize" => Array(in("table", StringType).build(),
      in("min_rows", LongType).defaultValue("100000")
        .comment("fragments smaller than this bin-pack").build(),
      in("max_rows_per_file", LongType).defaultValue("1000000").build(),
      in("analyze", BooleanType).defaultValue("true")
        .comment("re-analyze previously analyzed columns").build(),
      in("keep_versions", IntegerType).defaultValue("-1")
        .comment("vacuum to this many versions after; -1 skips").build())
    case "analyze_table" => Array(in("table", StringType).build(),
      in("cols", StringType).defaultValue("''")
        .comment("comma-separated columns; empty = every analyzable column").build(),
      in("histograms", BooleanType).defaultValue("false")
        .comment("also build 32-bin equi-height histograms for numeric " +
          "columns (full analyze only)").build())
    case "update_where" => Array(in("table", StringType).build(),
      in("condition", StringType).build(),
      in("set", StringType).comment("assignments: col = expr [, col = expr ...]").build())
    case "replace_where" => Array(in("table", StringType).build(),
      in("condition", StringType).build(),
      in("source", StringType).comment("view/table name visible to spark.table()").build())
    case "upsert" => Array(in("table", StringType).build(),
      in("source", StringType).comment("view/table name visible to spark.table()").build(),
      in("keys", StringType).comment("comma-separated key columns").build())
    case "remove_orphans" => Array(in("table", StringType).build(),
      in("grace_minutes", IntegerType).defaultValue("4320")
        .comment("only files older than this are eligible; must exceed any " +
          "concurrent writer's stage-to-commit time (default 3 days, " +
          "Iceberg's remove_orphan_files contract)")
        .build())
    case "restore" => Array(in("table", StringType).build(),
      in("version", IntegerType).comment("committed version to restore to").build())
    case "create_mv" => Array(in("view", StringType).build(),
      in("source", StringType).comment("lance table path").build(),
      in("group_by", StringType).comment("comma-separated group columns").build(),
      in("aggs", StringType)
        .comment("aggregate list: func(col-or-expr) AS alias [, ...] with " +
          "func in count|sum|min|max|avg|count_distinct (count(*) and " +
          "expression arguments like sum(price*(1-disc)) allowed)").build(),
      in("where", StringType).defaultValue("''")
        .comment("optional boolean predicate over source columns: the " +
          "view aggregates only matching rows, refreshes filter the " +
          "feed identically").build(),
      in("dims", StringType).defaultValue("''")
        .comment("optional star dims, ';'-separated " +
          "'table|srcKey=dimKey[,k2=d2]' entries: each LEFT-joins at a " +
          "version pinned (and tagged) at create; group_by/aggs/where " +
          "may name dim columns; fullRefresh re-pins").build(),
      in("joins", StringType).defaultValue("''")
        .comment("optional fact joins, ';'-separated " +
          "'table|srcKey=joinKey[,k2=j2][|left|right|full]' entries: " +
          "each joins (INNER by default) with BOTH sides change-fed — " +
          "refresh telescopes dA JOIN B(new) UNION A(old) JOIN dB; " +
          "LEFT/FULL retract/insert null-extended rows when a key's " +
          "match count crosses zero, RIGHT/FULL carry join-side-only " +
          "rows (key in the merged source column; FULL/RIGHT must be " +
          "the FIRST factor); the view registers on every joined " +
          "table").build(),
      in("having", StringType).defaultValue("''")
        .comment("optional READ-time predicate over the view's OUTPUT " +
          "columns (group aliases + aggregate aliases, e.g. 'n >= 8'): " +
          "stored state stays unfiltered - the delta math never sees " +
          "it; read() applies it (the SQL DDL's HAVING)").build())
    case "refresh_mv" => Array(in("view", StringType).build(),
      in("full", BooleanType).defaultValue("false")
        .comment("true forces a full rebuild (vacuumed feed window / " +
          "out-of-band writes)").build())
    case "set_properties" => Array(in("table", StringType).build(),
      in("props", StringType)
        .comment("key = value [, key = value ...] (values taken verbatim, " +
          "surrounding quotes stripped)").build())
    case "unset_properties" => Array(in("table", StringType).build(),
      in("keys", StringType).comment("comma-separated keys").build())
    case "publish_branch" => Array(in("table", StringType).build(),
      in("branch", StringType).build(),
      in("checks", StringType).defaultValue("''")
        .comment("name = boolean_expr [, ...]; false-or-NULL rows are " +
          "violations and refuse the publish").build(),
      in("quarantine", BooleanType).defaultValue("false")
        .comment("publish passing rows; stage violations on a " +
          "<branch>-quarantine lineage with per-check counts").build())
    case "resume_publish" => Array(in("table", StringType).build(),
      in("branch", StringType).build())
    case "create_replica" => Array(in("replica", StringType).build(),
      in("source", StringType).build(),
      in("keys", StringType).comment("comma-separated unique key columns").build())
    case "sync_replica" => Array(in("replica", StringType).build())
    case "set_retention" => Array(in("table", StringType).build(),
      in("keep_versions", IntegerType).build(),
      in("older_than_ms", LongType).defaultValue("-1")
        .comment("versions within this horizon survive regardless of " +
          "count; -1 disables the time pin").build())
    case "register_consumer" => Array(in("table", StringType).build(),
      in("name", StringType).build(),
      in("from_version", LongType).defaultValue("-1")
        .comment("watermark to pin from; -1 = the current version").build())
    case "advance_consumer" => Array(in("table", StringType).build(),
      in("name", StringType).build(),
      in("to_version", LongType).build())
    case "drop_consumer" => Array(in("table", StringType).build(),
      in("name", StringType).build())
    case "drop_mv" => Array(in("view", StringType).build())
    case "drop_replica" => Array(in("replica", StringType).build())
    case "refresh_fts" => Array(in("table", StringType).build(),
      in("column", StringType).comment("indexed text column").build())
    case "drop_index" => Array(in("table", StringType).build(),
      in("column", StringType).build(),
      in("kind", StringType).defaultValue("'all'")
        .comment("ivf | fts | scalar | all").build())
    case "build_scalar_index" => Array(in("table", StringType).build(),
      in("column", StringType).build(),
      in("num_buckets", IntegerType)
        .defaultValue(graft.index.ScalarIndex.DefaultBuckets.toString).build())
    case "refresh_scalar_index" => Array(in("table", StringType).build(),
      in("column", StringType).comment("indexed column").build())
    case "tag" => Array(in("table", StringType).build(),
      in("name", StringType).build(),
      in("version", IntegerType).defaultValue("-1")
        .comment("committed version to tag; -1 = latest").build(),
      in("replace", BooleanType).defaultValue("false").build())
    case "untag" => Array(in("table", StringType).build(),
      in("name", StringType).build())
    case "create_branch" => Array(in("table", StringType).build(),
      in("name", StringType).build(),
      in("from_version", IntegerType).defaultValue("-1")
        .comment("version to fork from; -1 = latest").build())
    case "drop_branch" => Array(in("table", StringType).build(),
      in("name", StringType).build())
    case "fast_forward" => Array(in("table", StringType).build(),
      in("name", StringType).build())
    case "rebase_branch" => Array(in("table", StringType).build(),
      in("name", StringType).build())
    case "cherry_pick" => Array(in("table", StringType).build(),
      in("name", StringType).build(),
      in("version", IntegerType)
        .comment("branch version whose ADDED fragments adopt").build())
    case "add_constraint" => Array(in("table", StringType).build(),
      in("name", StringType).build(),
      in("expr", StringType).comment("boolean SQL expression; NULL passes").build())
    case "drop_constraint" => Array(in("table", StringType).build(),
      in("name", StringType).build())
    case "set_not_null" | "drop_not_null" | "add_unique" =>
      Array(in("table", StringType).build(),
        in("column", StringType).build())
    case "rename_column" => Array(in("table", StringType).build(),
      in("old_name", StringType).build(),
      in("new_name", StringType).build())
    case "widen_column" => Array(in("table", StringType).build(),
      in("column", StringType).build(),
      in("new_type", StringType).build())
    case "clone_table" => Array(in("table", StringType).build(),
      in("target", StringType).comment("new table name to create").build(),
      in("version", IntegerType).defaultValue("-1")
        .comment("source version to clone; -1 = latest").build())
    case _ => Array(in("table", StringType).build(),
      in("column", StringType).defaultValue("'embedding'").build())
  }

  override def call(input: InternalRow): java.util.Iterator[
      org.apache.spark.sql.connector.read.Scan] = {
    val spark = SparkSession.active
    // create_mv / create_replica CREATE their first argument; everything
    // else operates on an existing table
    val path =
      if (procName == "create_mv" || procName == "create_replica")
        catalog.resolveNewTableArg(input.getUTF8String(0).toString).toString
      else catalog.resolveTableArg(input.getUTF8String(0).toString).toString
    val (schema, row) = procName match {
      case "compact" =>
        val minRows = input.getInt(1)
        val (before, after) =
          if (minRows < 0) graft.Lance.compact(spark, path)
          else graft.Lance.compactSmall(spark, path, minRows.toLong)
        (new StructType().add("fragments_before", IntegerType, nullable = false)
          .add("fragments_after", IntegerType, nullable = false),
          new GenericInternalRow(Array[Any](before, after)))
      case "vacuum" =>
        val (manifests, files) = graft.Lance.vacuum(spark, path, input.getInt(1),
          Some(input.getLong(2)).filter(_ >= 0))
        (new StructType().add("manifests_deleted", IntegerType, nullable = false)
          .add("files_deleted", IntegerType, nullable = false),
          new GenericInternalRow(Array[Any](manifests, files)))
      case "cluster" =>
        val cols = input.getUTF8String(1).toString.split(',').map(_.trim).toSeq
        val (before, after) = graft.Lance.cluster(spark, path, cols)
        (new StructType().add("fragments_before", IntegerType, nullable = false)
          .add("fragments_after", IntegerType, nullable = false),
          new GenericInternalRow(Array[Any](before, after)))
      case "cluster_by_bucket" =>
        // two spellings: 'a,b' (uniform num_buckets) or Iceberg-style
        // 'bucket(8,a),bucket(32,b)' (per-column widths; num_buckets
        // ignored). Split on commas at paren depth 0 so the bucket(…)
        // entries survive.
        val raw = LanceProcedure.splitTopLevel(
          input.getUTF8String(1).toString).map(_.trim).filter(_.nonEmpty)
        val BucketRe = """(?i)^bucket\s*\(\s*(\d+)\s*,\s*([^)]+)\)$""".r
        val entries = raw.map {
          case BucketRe(w, c) => (c.trim, Some(w.toInt))
          case plain => (plain, None)
        }
        require(entries.forall(_._2.isEmpty) || entries.forall(_._2.isDefined),
          "mix of plain columns and bucket(n, col) entries - use one form")
        val cols = entries.map(_._1)
        val widths = entries.flatMap(_._2)
        val (before, after) = graft.Lance.clusterByBucket(spark, path, cols,
          input.getInt(2), widths = widths)
        (new StructType().add("fragments_before", IntegerType, nullable = false)
          .add("fragments_after", IntegerType, nullable = false),
          new GenericInternalRow(Array[Any](before, after)))
      case "rebucket" =>
        val (before, after) = graft.Lance.rebucket(spark, path, input.getLong(1))
        (new StructType().add("untagged_before", IntegerType, nullable = false)
          .add("untagged_after", IntegerType, nullable = false),
          new GenericInternalRow(Array[Any](before, after)))
      case "set_bloom_filters" =>
        val cols = input.getUTF8String(1).toString.split(',')
          .map(_.trim).filter(_.nonEmpty).toSeq
        val v = graft.Lance.setBloomFilters(spark, path, cols)
        (new StructType().add("version", LongType, nullable = false)
          .add("columns", StringType, nullable = false),
          new GenericInternalRow(Array[Any](v,
            org.apache.spark.unsafe.types.UTF8String.fromString(cols.mkString(",")))))
      case "fsck" =>
        val found = graft.Lance.fsck(spark, path)
        val text = found.map(i => s"[${i.severity}] ${i.what}").mkString("; ")
        (new StructType()
          .add("errors", IntegerType, nullable = false)
          .add("warnings", IntegerType, nullable = false)
          .add("issues", StringType, nullable = false),
          new GenericInternalRow(Array[Any](
            found.count(_.severity == "error"),
            found.count(_.severity == "warn"),
            org.apache.spark.unsafe.types.UTF8String.fromString(text))))
      case "optimize" =>
        val r = graft.Lance.optimize(spark, path,
          minRows = if (input.isNullAt(1)) 100000L else input.getLong(1),
          maxRowsPerFile = if (input.isNullAt(2)) 1000000L else input.getLong(2),
          reanalyze = input.isNullAt(3) || input.getBoolean(3),
          keepVersions = if (input.isNullAt(4)) -1 else input.getInt(4))
        (new StructType()
          .add("fragments_before", IntegerType, nullable = false)
          .add("fragments_after", IntegerType, nullable = false)
          .add("indexes_refreshed", StringType, nullable = false)
          .add("indexes_stale", StringType, nullable = false)
          .add("columns_analyzed", IntegerType, nullable = false)
          .add("manifests_deleted", IntegerType, nullable = false)
          .add("files_deleted", IntegerType, nullable = false)
          .add("views_refreshed", IntegerType, nullable = false)
          .add("views_stale", IntegerType, nullable = false)
          .add("vacuum_blockers", StringType, nullable = false),
          new GenericInternalRow(Array[Any](r.fragmentsBefore, r.fragmentsAfter,
            org.apache.spark.unsafe.types.UTF8String.fromString(
              r.indexesRefreshed.mkString(",")),
            org.apache.spark.unsafe.types.UTF8String.fromString(
              r.indexesStale.mkString(",")),
            r.columnsAnalyzed, r.manifestsDeleted, r.filesDeleted,
            r.viewsRefreshed, r.viewsStale,
            org.apache.spark.unsafe.types.UTF8String.fromString(
              r.vacuumBlockers.mkString("; ")))))
      case "analyze_table" =>
        val cols = input.getUTF8String(1).toString.split(',')
          .map(_.trim).filter(_.nonEmpty).toSeq
        val ndv = graft.Lance.analyze(spark, path, cols,
          histograms = !input.isNullAt(2) && input.getBoolean(2))
        (new StructType()
          .add("columns_analyzed", IntegerType, nullable = false)
          .add("ndv", StringType, nullable = false),
          new GenericInternalRow(Array[Any](ndv.size,
            org.apache.spark.unsafe.types.UTF8String.fromString(
              ndv.toSeq.sortBy(_._1).map { case (c, n) => s"$c=$n" }
                .mkString(",")))))
      case "update_where" =>
        val set = LanceProcedure.parseAssignments(input.getUTF8String(2).toString)
        val r = graft.Lance.updateWhere(spark, path,
          input.getUTF8String(1).toString, set)
        (new StructType().add("rows_updated", LongType, nullable = false)
          .add("fragments_rewritten", IntegerType, nullable = false),
          new GenericInternalRow(Array[Any](r.rowsChanged,
            if (r.committedVersion.isDefined) r.candidateFragments else 0)))
      case "replace_where" =>
        val r = graft.Lance.replaceWhere(spark, path,
          input.getUTF8String(1).toString,
          spark.table(input.getUTF8String(2).toString))
        (new StructType().add("rows_removed", LongType, nullable = false)
          .add("rows_inserted", LongType, nullable = false),
          new GenericInternalRow(Array[Any](r.rowsChanged, r.rowsInserted)))
      case "upsert" =>
        val src = spark.table(input.getUTF8String(1).toString)
        val keys = input.getUTF8String(2).toString.split(',').map(_.trim).toSeq
        val r = graft.Lance.upsert(spark, path, src, keys)
        (new StructType().add("rows_updated", LongType, nullable = false)
          .add("rows_inserted", LongType, nullable = false),
          new GenericInternalRow(Array[Any](r.rowsChanged, r.rowsInserted)))
      case "remove_orphans" =>
        val (scanned, deleted) =
          graft.Lance.removeOrphans(spark, path, input.getInt(1))
        (new StructType().add("files_scanned", IntegerType, nullable = false)
          .add("orphans_deleted", IntegerType, nullable = false),
          new GenericInternalRow(Array[Any](scanned, deleted)))
      case "restore" =>
        val (restored, newV) =
          graft.Lance.restore(spark, path, input.getInt(1).toLong)
        (new StructType().add("restored_version", LongType, nullable = false)
          .add("new_version", LongType, nullable = false),
          new GenericInternalRow(Array[Any](restored, newV)))
      case "create_mv" =>
        val source = catalog.resolveTableArg(
          input.getUTF8String(1).toString).toString
        // depth/quote-aware split: a group entry may be an expression
        // with its own commas (`date_format(d, 'yyyy-MM') AS omonth`)
        val groupBy = LanceProcedure.splitTopLevel(
          input.getUTF8String(2).toString)
          .map(_.trim).filter(_.nonEmpty)
        val aggs = LanceProcedure.parseAggList(input.getUTF8String(3).toString)
        val where = Some(input.getUTF8String(4).toString.trim).filter(_.nonEmpty)
        // star dims / fact joins: 'table|srcKey=otherKey[,k2=o2]'
        // entries, ';'-separated — one shared parse; joins accept an
        // optional third '|'-field for the join type (inner | left)
        def pathKeys(argIdx: Int): Seq[(String, Map[String, String], String)] =
          input.getUTF8String(argIdx).toString.split(';')
            .map(_.trim).filter(_.nonEmpty).toSeq.map { entry =>
              val parts = entry.split("\\|", 3)
              require(parts.length >= 2,
                s"malformed dim/join entry '$entry' (expected " +
                  "table|srcKey=otherKey[,k2=o2][|left])")
              (catalog.resolveTableArg(parts(0).trim).toString,
                parts(1).split(',').map { kv =>
                  val Array(a, b) = kv.split("=", 2); a.trim -> b.trim
                }.toMap,
                if (parts.length > 2) parts(2).trim.toLowerCase else "inner")
            }
        val dims = pathKeys(5).map { case (t, ks, ty) =>
          require(ty == "inner",
            s"dim entries take no join type (dims always LEFT-join a " +
              s"pinned snapshot); got '$ty'")
          graft.operators.MaterializedView.DimSpec(t, ks) }
        val joins = pathKeys(6).map { case (t, ks, ty) =>
          graft.operators.MaterializedView.JoinSpec(t, ks, ty) }
        val having =
          Some(input.getUTF8String(7).toString.trim).filter(_.nonEmpty)
        val v = graft.operators.MaterializedView.create(spark, path, source,
          groupBy, aggs, where, dims, joins, having)
        (new StructType().add("source_version", LongType, nullable = false),
          new GenericInternalRow(Array[Any](v)))
      case "refresh_mv" =>
        val r = if (input.getBoolean(1))
          graft.operators.MaterializedView.fullRefresh(spark, path)
        else graft.operators.MaterializedView.refresh(spark, path)
        (new StructType().add("mode", StringType, nullable = false)
          .add("from_version", LongType, nullable = false)
          .add("to_version", LongType, nullable = false)
          .add("groups_changed", LongType, nullable = false),
          new GenericInternalRow(Array[Any](
            org.apache.spark.unsafe.types.UTF8String.fromString(r.mode),
            r.fromVersion, r.toVersion, r.groupsChanged)))
      case "set_properties" =>
        val raw = LanceProcedure.parseAssignments(
          input.getUTF8String(1).toString)
        def unquote(s: String) =
          if (s.length >= 2 && ((s.head == '\'' && s.last == '\'') ||
            (s.head == '"' && s.last == '"'))) s.substring(1, s.length - 1)
          else s
        val v = graft.Lance.setProperties(spark, path,
          raw.map { case (k, x) => k -> unquote(x) })
        (new StructType().add("version", LongType, nullable = false)
          .add("set", IntegerType, nullable = false),
          new GenericInternalRow(Array[Any](v, raw.size)))
      case "unset_properties" =>
        val keys = input.getUTF8String(1).toString.split(',')
          .map(_.trim).filter(_.nonEmpty).toSeq
        val v = graft.Lance.unsetProperties(spark, path, keys)
        (new StructType().add("version", LongType, nullable = false)
          .add("unset", IntegerType, nullable = false),
          new GenericInternalRow(Array[Any](v, keys.size)))
      case "create_replica" =>
        val source = catalog.resolveTableArg(
          input.getUTF8String(1).toString).toString
        val keys = input.getUTF8String(2).toString.split(',')
          .map(_.trim).filter(_.nonEmpty).toSeq
        val v = graft.operators.Replica.create(spark, path, source, keys)
        (new StructType().add("source_version", LongType, nullable = false),
          new GenericInternalRow(Array[Any](v)))
      case "set_retention" =>
        val v = graft.Lance.setRetention(spark, path, input.getInt(1),
          input.getLong(2))
        (new StructType().add("version", LongType, nullable = false),
          new GenericInternalRow(Array[Any](v)))
      case "register_consumer" =>
        val wm = graft.Lance.registerConsumer(spark, path,
          input.getUTF8String(1).toString, input.getLong(2))
        (new StructType().add("watermark", LongType, nullable = false),
          new GenericInternalRow(Array[Any](wm)))
      case "advance_consumer" =>
        val wm = graft.Lance.advanceConsumer(spark, path,
          input.getUTF8String(1).toString, input.getLong(2))
        (new StructType().add("watermark", LongType, nullable = false),
          new GenericInternalRow(Array[Any](wm)))
      case "drop_consumer" =>
        val existed = graft.Lance.dropConsumer(spark, path,
          input.getUTF8String(1).toString)
        (new StructType().add("existed", BooleanType, nullable = false),
          new GenericInternalRow(Array[Any](existed)))
      case "drop_mv" =>
        val existed = graft.operators.MaterializedView.drop(spark, path)
        (new StructType().add("existed", BooleanType, nullable = false),
          new GenericInternalRow(Array[Any](existed)))
      case "drop_replica" =>
        val existed = graft.operators.Replica.drop(spark, path)
        (new StructType().add("existed", BooleanType, nullable = false),
          new GenericInternalRow(Array[Any](existed)))
      case "sync_replica" =>
        val r = graft.operators.Replica.sync(spark, path)
        (new StructType().add("from_version", LongType, nullable = false)
          .add("to_version", LongType, nullable = false)
          .add("rows_changed", LongType, nullable = false)
          .add("rows_inserted", LongType, nullable = false),
          new GenericInternalRow(Array[Any](r.fromVersion, r.toVersion,
            r.rowsChanged, r.rowsInserted)))
      case "publish_branch" =>
        val branch = input.getUTF8String(1).toString
        val checksRaw = input.getUTF8String(2).toString.trim
        val checks =
          if (checksRaw.isEmpty) Map.empty[String, String]
          else LanceProcedure.parseAssignments(checksRaw)
        val (head, newMain) =
          graft.Lance.publishBranch(spark, path, branch, checks,
            quarantine = input.getBoolean(3))
        (new StructType().add("branch_head", LongType, nullable = false)
          .add("new_main_version", LongType, nullable = false)
          .add("checks_passed", IntegerType, nullable = false),
          new GenericInternalRow(Array[Any](head, newMain, checks.size)))
      case "resume_publish" =>
        val (head, newMain) = graft.Lance.resumePublish(spark, path,
          input.getUTF8String(1).toString)
        (new StructType().add("branch_head", LongType, nullable = false)
          .add("new_main_version", LongType, nullable = false),
          new GenericInternalRow(Array[Any](head, newMain)))
      case "drop_index" =>
        val n = graft.Lance.dropIndex(spark, path,
          input.getUTF8String(1).toString, input.getUTF8String(2).toString)
        (new StructType().add("sidecars_removed", IntegerType, nullable = false),
          new GenericInternalRow(Array[Any](n)))
      case "build_scalar_index" =>
        val m = graft.Lance.buildScalarIndex(spark, path,
          input.getUTF8String(1).toString, input.getInt(2))
        (new StructType().add("covered_fragments", IntegerType, nullable = false)
          .add("dataset_version", LongType, nullable = false),
          new GenericInternalRow(Array[Any](m.coveredFiles.size,
            m.datasetVersion.getOrElse(-1L))))
      case "refresh_scalar_index" =>
        val m = graft.Lance.refreshScalarIndex(spark, path,
          input.getUTF8String(1).toString)
        (new StructType().add("covered_fragments", IntegerType, nullable = false)
          .add("dataset_version", LongType, nullable = false),
          new GenericInternalRow(Array[Any](m.coveredFiles.size,
            m.datasetVersion.getOrElse(-1L))))
      case "tag" =>
        val v = input.getInt(2)
        val tagged = graft.Lance.tag(spark, path,
          input.getUTF8String(1).toString,
          if (v < 0) None else Some(v.toLong), input.getBoolean(3))
        (new StructType().add("tagged_version", LongType, nullable = false),
          new GenericInternalRow(Array[Any](tagged)))
      case "untag" =>
        val existed = graft.Lance.deleteTag(spark, path,
          input.getUTF8String(1).toString)
        (new StructType().add("existed", BooleanType, nullable = false),
          new GenericInternalRow(Array[Any](existed)))
      case "create_branch" =>
        val v = input.getInt(2)
        val base = graft.Lance.createBranch(spark, path,
          input.getUTF8String(1).toString,
          if (v < 0) None else Some(v.toLong))
        (new StructType().add("base_version", LongType, nullable = false),
          new GenericInternalRow(Array[Any](base)))
      case "drop_branch" =>
        val existed = graft.Lance.deleteBranch(spark, path,
          input.getUTF8String(1).toString)
        (new StructType().add("existed", BooleanType, nullable = false),
          new GenericInternalRow(Array[Any](existed)))
      case "fast_forward" =>
        val (head, newV) = graft.Lance.fastForward(spark, path,
          input.getUTF8String(1).toString)
        (new StructType().add("branch_head", LongType, nullable = false)
          .add("new_version", LongType, nullable = false),
          new GenericInternalRow(Array[Any](head, newV)))
      case "rebase_branch" =>
        val (head, newV) = graft.Lance.rebaseBranch(spark, path,
          input.getUTF8String(1).toString)
        (new StructType().add("branch_head", LongType, nullable = false)
          .add("new_version", LongType, nullable = false),
          new GenericInternalRow(Array[Any](head, newV)))
      case "cherry_pick" =>
        val (n, newV) = graft.Lance.cherryPick(spark, path,
          input.getUTF8String(1).toString, input.getInt(2).toLong)
        (new StructType()
          .add("fragments_adopted", IntegerType, nullable = false)
          .add("new_version", LongType, nullable = false),
          new GenericInternalRow(Array[Any](n, newV)))
      case "add_constraint" =>
        val v = graft.Lance.addConstraint(spark, path,
          input.getUTF8String(1).toString, input.getUTF8String(2).toString)
        (new StructType().add("committed_version", LongType, nullable = false),
          new GenericInternalRow(Array[Any](v)))
      case "drop_constraint" =>
        val existed = graft.Lance.dropConstraint(spark, path,
          input.getUTF8String(1).toString)
        (new StructType().add("existed", BooleanType, nullable = false),
          new GenericInternalRow(Array[Any](existed)))
      case "set_not_null" =>
        val v = graft.Lance.setNotNull(spark, path,
          input.getUTF8String(1).toString)
        (new StructType().add("committed_version", LongType, nullable = false),
          new GenericInternalRow(Array[Any](v)))
      case "rename_column" =>
        val v = graft.Lance.renameColumn(spark, path,
          input.getUTF8String(1).toString, input.getUTF8String(2).toString)
        (new StructType().add("committed_version", LongType, nullable = false),
          new GenericInternalRow(Array[Any](v)))
      case "widen_column" =>
        val v = graft.Lance.widenColumnType(spark, path,
          input.getUTF8String(1).toString, input.getUTF8String(2).toString)
        (new StructType().add("committed_version", LongType, nullable = false),
          new GenericInternalRow(Array[Any](v)))
      case "clone_table" =>
        val dst = catalog.resolveNewTableArg(input.getUTF8String(1).toString)
        val ver = input.getInt(2)
        val v = graft.Lance.cloneTable(spark, path, dst.toString,
          if (ver < 0) None else Some(ver.toLong))
        (new StructType().add("committed_version", LongType, nullable = false),
          new GenericInternalRow(Array[Any](v)))
      case "add_unique" =>
        // comma list = composite key: CALL add_unique(t, 'source,doc_id')
        val v = graft.Lance.addUniqueConstraint(spark, path,
          input.getUTF8String(1).toString.split(',').map(_.trim)
            .filter(_.nonEmpty).toSeq)
        (new StructType().add("committed_version", LongType, nullable = false),
          new GenericInternalRow(Array[Any](v)))
      case "drop_not_null" =>
        val existed = graft.Lance.dropNotNull(spark, path,
          input.getUTF8String(1).toString)
        (new StructType().add("existed", BooleanType, nullable = false),
          new GenericInternalRow(Array[Any](existed)))
      case "refresh_fts" =>
        val m = graft.index.FtsIndex.refresh(spark, path,
          input.getUTF8String(1).toString)
        (new StructType().add("num_docs", LongType, nullable = false)
          .add("dataset_version", LongType, nullable = false),
          new GenericInternalRow(Array[Any](m.numDocs,
            m.datasetVersion.getOrElse(-1L))))
      case _ =>
        val n = graft.Lance.refreshIndex(spark, path, input.getUTF8String(1).toString)
        (new StructType().add("rows_indexed", LongType, nullable = false),
          new GenericInternalRow(Array[Any](n)))
    }
    val scan: org.apache.spark.sql.connector.read.Scan =
      new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = schema
        override def rows(): Array[InternalRow] = Array(row)
      }
    java.util.Collections.singletonList(scan).iterator()
  }
}

/** The catalog's V2 `bucket(numBuckets, keyCols...)` function — the
  * published contract every storage-partitioned-join participant shares:
  * `pmod(murmur3(cols), n)` chained with seed 42, byte-identical to
  * Spark's own `pmod(hash(cols), n)` and to the writer's routing
  * ([[graft.format.BucketHash]]). Spark compares the bound function's
  * `canonicalName` across the two join sides; evaluation is only needed
  * if an exchange must re-bucket rows (`V2_BUCKETING_SHUFFLE_ENABLED`).
  */
object GraftBucketFunction
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction}
  import org.apache.spark.sql.types._

  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, cols...): pmod(murmur3(cols), numBuckets)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length >= 2,
      s"bucket expects (numBuckets, key columns...), got ${inputType.simpleString}")
    require(inputType.fields.head.dataType == IntegerType,
      s"bucket's first argument is the integer bucket count, got " +
        inputType.fields.head.dataType.simpleString)
    val keyTypes = inputType.fields.tail.map(_.dataType)
    keyTypes.foreach(t => require(graft.format.BucketHash.supportedKeyType(t),
      s"bucket key type ${t.simpleString} is not supported"))
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = IntegerType +: keyTypes
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = "graft.bucket"
      override def isResultNullable: Boolean = false
      override def produceResult(input: org.apache.spark.sql.catalyst.InternalRow): Integer = {
        val n = input.getInt(0)
        val values = keyTypes.indices.map { i =>
          if (input.isNullAt(i + 1)) null else input.get(i + 1, keyTypes(i))
        }
        graft.format.BucketHash.bucketOfInternal(values, keyTypes.toSeq, n)
      }
    }
  }
}
