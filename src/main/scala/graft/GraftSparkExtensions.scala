package graft

import graft.functions.{CosineDistance, DotProduct, L2Distance}
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, Decimal, DecimalType, DoubleType, FloatType}

/** Session extensions giving the engine a SQL surface (reference V7):
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftSparkExtensions)...
  * // or: spark.sql.extensions=graft.GraftSparkExtensions
  *
  * SELECT l2_distance(embedding, array(0.1F, ...)) FROM t
  * SELECT * FROM vector_search('/path/to/dataset', 'embedding',
  *                             array(0.1, 0.2, ...), 5, 'l2')
  * }}}
  *
  * `vector_search` mirrors the reference UDTF
  * (`table/LanceVectorSearchFunction.java:111-259`): path-addressed
  * dataset, k-NN with metric, result rows widened by `_distance`. Spark
  * has no user-facing Scala UDTF registration, so it is implemented the
  * Catalyst way — a resolution rule rewrites the table-valued-function
  * node into the KNN logical plan (scan → distance → top-k), which then
  * optimizes like any other query (SURVEY §2.4 V7 plan (b)). SQL numeric
  * array literals arrive as DECIMAL — coerced here exactly like the
  * reference's BigDecimal[] overloads (`:190-221`).
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("l2_distance"),
      new ExpressionInfo(classOf[L2Distance].getName, "l2_distance"),
      (args: Seq[Expression]) => L2Distance(args.head, args(1))))
    e.injectFunction((FunctionIdentifier("cosine_distance"),
      new ExpressionInfo(classOf[CosineDistance].getName, "cosine_distance"),
      (args: Seq[Expression]) => CosineDistance(args.head, args(1))))
    e.injectFunction((FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args.head, args(1))))
    e.injectResolutionRule(session => new ResolveVectorSearch(session))
    e.injectOptimizerRule(session => new graft.plans.AnnIndexRewrite(session))
    // CREATE MATERIALIZED VIEW ... AS SELECT — intercepts only that
    // statement prefix; every other statement delegates untouched
    e.injectParser((session, delegate) =>
      new graft.plans.GraftSqlParser(session, delegate))
    // Metadata TVFs register in the TABLE-FUNCTION REGISTRY, not as a
    // resolution rule: ResolveFunctions fails any unregistered TVF whose
    // arguments are all resolved, and these take plain string literals.
    // (vector_search survives as a rule only because its array(...) arg
    // is unresolved on the first pass — a lucky ordering these can't use.)
    e.injectTableFunction((FunctionIdentifier("lance_versions"),
      new ExpressionInfo(MetaTvfs.getClass.getName, "lance_versions"),
      (args: Seq[Expression]) => MetaTvfs.plan("lance_versions", args)))
    e.injectTableFunction((FunctionIdentifier("lance_fragments"),
      new ExpressionInfo(MetaTvfs.getClass.getName, "lance_fragments"),
      (args: Seq[Expression]) => MetaTvfs.plan("lance_fragments", args)))
    e.injectTableFunction((FunctionIdentifier("lance_changes"),
      new ExpressionInfo(MetaTvfs.getClass.getName, "lance_changes"),
      (args: Seq[Expression]) => MetaTvfs.plan("lance_changes", args)))
    e.injectTableFunction((FunctionIdentifier("lance_changes_net"),
      new ExpressionInfo(MetaTvfs.getClass.getName, "lance_changes_net"),
      (args: Seq[Expression]) => MetaTvfs.plan("lance_changes_net", args)))
    e.injectTableFunction((FunctionIdentifier("lance_fts"),
      new ExpressionInfo(MetaTvfs.getClass.getName, "lance_fts"),
      (args: Seq[Expression]) => MetaTvfs.plan("lance_fts", args)))
    e.injectTableFunction((FunctionIdentifier("lance_fts_highlight"),
      new ExpressionInfo(MetaTvfs.getClass.getName, "lance_fts_highlight"),
      (args: Seq[Expression]) => MetaTvfs.plan("lance_fts_highlight", args)))
    e.injectTableFunction((FunctionIdentifier("lance_stats"),
      new ExpressionInfo(MetaTvfs.getClass.getName, "lance_stats"),
      (args: Seq[Expression]) => MetaTvfs.plan("lance_stats", args)))
    e.injectTableFunction((FunctionIdentifier("vector_search_join"),
      new ExpressionInfo(MetaTvfs.getClass.getName, "vector_search_join"),
      (args: Seq[Expression]) => MetaTvfs.plan("vector_search_join", args)))
    e.injectTableFunction((FunctionIdentifier("lance_indexes"),
      new ExpressionInfo(MetaTvfs.getClass.getName, "lance_indexes"),
      (args: Seq[Expression]) => MetaTvfs.plan("lance_indexes", args)))
    e.injectTableFunction((FunctionIdentifier("lance_take"),
      new ExpressionInfo(MetaTvfs.getClass.getName, "lance_take"),
      (args: Seq[Expression]) => MetaTvfs.plan("lance_take", args)))
    e.injectTableFunction((FunctionIdentifier("lance_tags"),
      new ExpressionInfo(MetaTvfs.getClass.getName, "lance_tags"),
      (args: Seq[Expression]) => MetaTvfs.plan("lance_tags", args)))
    e.injectTableFunction((FunctionIdentifier("lance_branches"),
      new ExpressionInfo(MetaTvfs.getClass.getName, "lance_branches"),
      (args: Seq[Expression]) => MetaTvfs.plan("lance_branches", args)))
    e.injectTableFunction((FunctionIdentifier("lance_consumers"),
      new ExpressionInfo(MetaTvfs.getClass.getName, "lance_consumers"),
      (args: Seq[Expression]) => MetaTvfs.plan("lance_consumers", args)))
    e.injectTableFunction((FunctionIdentifier("lance_constraints"),
      new ExpressionInfo(MetaTvfs.getClass.getName, "lance_constraints"),
      (args: Seq[Expression]) => MetaTvfs.plan("lance_constraints", args)))
    e.injectTableFunction((FunctionIdentifier("lance_dependents"),
      new ExpressionInfo(MetaTvfs.getClass.getName, "lance_dependents"),
      (args: Seq[Expression]) => MetaTvfs.plan("lance_dependents", args)))
    e.injectTableFunction((FunctionIdentifier("lance_maxsim"),
      new ExpressionInfo(MetaTvfs.getClass.getName, "lance_maxsim"),
      (args: Seq[Expression]) => MetaTvfs.plan("lance_maxsim", args)))
    e.injectTableFunction((FunctionIdentifier("lance_read_ns"),
      new ExpressionInfo(MetaTvfs.getClass.getName, "lance_read_ns"),
      (args: Seq[Expression]) => MetaTvfs.plan("lance_read_ns", args)))
  }
}

/** `lance_versions(path)` / `lance_fragments(path[, version])` /
  * `lance_changes(path, from, to)` / `lance_stats(path[, version])` —
  * metadata TVFs (DESCRIBE-HISTORY / table_changes / DESCRIBE-STATISTICS
  * parity): version history, per-fragment layout, and table-level column
  * statistics come straight from the manifests with zero data files
  * touched; the change feed turns a version range into `_change_type` =
  * delete/insert rows for incremental downstream consumers. (`lance_fts`
  * — BM25 over the persisted inverted index — rides the same registry.)
  */
object MetaTvfs {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  /** Imperative registration for sessions built without the extensions
    * (same ergonomics as `VectorFunctions.register`). Idempotent.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.tableFunctionRegistry
    Seq("lance_versions", "lance_fragments", "lance_changes",
        "lance_changes_net", "lance_fts",
        "lance_fts_highlight",
        "lance_stats", "vector_search_join", "lance_indexes",
        "lance_take", "lance_tags", "lance_branches",
        "lance_constraints", "lance_consumers", "lance_dependents",
        "lance_maxsim", "lance_read_ns").foreach { n =>
      if (!reg.functionExists(FunctionIdentifier(n)))
        reg.createOrReplaceTempFunction(n,
          (args: Seq[Expression]) => plan(n, args), "scala_udf")
    }
  }

  private def literalString(e: Expression, what: String): String = {
    require(e.foldable, s"$what must be a literal")
    String.valueOf(e.eval())
  }

  /** The batch change feed over (from, to] as a DataFrame — shared by
    * `lance_changes` and its net-per-key view. */
  private def changesDf(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, root: org.apache.hadoop.fs.Path,
      path: String, from: Long, to: Long,
      fn: String = "lance_changes"): org.apache.spark.sql.DataFrame = {
    require(from >= 0 && from <= to,
      s"$fn: need 0 <= fromVersion <= toVersion, got ($from, $to]")
    val versions = graft.format.LanceFormat.listVersions(fs, root).toSet
    require(versions.contains(to), s"no version $to at $path")
    require(from == 0 || versions.contains(from), s"no version $from at $path")
    val endM = graft.format.LanceFormat.readManifest(fs, root, to)
    val endSchema = endM.schema
    val outSchema = endSchema
      .add("_change_type", StringType, nullable = false)
      .add("_commit_version", LongType, nullable = false)
    def files(fr: Seq[graft.format.FragmentMeta]) = fr.map(f =>
      graft.format.LanceFormat.fragmentPath(root, f.file).toString)
    var prev: Seq[graft.format.FragmentMeta] =
      if (from == 0) Seq.empty
      else graft.format.LanceFormat.readManifest(fs, root, from).fragments
    val arms = Seq.newBuilder[org.apache.spark.sql.DataFrame]
    def arm(kind: String, v: Long, paths: Seq[String]) = {
      val a = spark.read.schema(endM.physicalSchema).parquet(paths: _*)
      arms += (if (endM.mapping.isEmpty) a
        else a.toDF(endSchema.fieldNames.toIndexedSeq: _*))
        .withColumn("_change_type", org.apache.spark.sql.functions.lit(kind))
        .withColumn("_commit_version", org.apache.spark.sql.functions.lit(v))
    }
    ((from + 1) to to).foreach { v =>
      if (versions.contains(v)) {
        val m = graft.format.LanceFormat.readManifest(fs, root, v)
        val cdf = m.changeFiles.getOrElse(Seq.empty)
        if (m.operation.contains("replace") && cdf.nonEmpty) {
          // row-level CDF recorded by the DML verb: serve the exact
          // pre/post images instead of the amplified fragment diff
          cdf.groupBy(_.kind).toSeq.sortBy(_._1).foreach { case (kind, cs) =>
            arm(kind, v, cs.map(c =>
              graft.format.LanceFormat.fragmentPath(root, c.file).toString))
          }
        } else if (!m.operation.contains("rewrite")) {
          val prevFiles = prev.map(_.file).toSet
          val curFiles = m.fragments.map(_.file).toSet
          val added = m.fragments.filterNot(f => prevFiles.contains(f.file))
          val removed = prev.filterNot(f => curFiles.contains(f.file))
          Seq(("insert", added), ("delete", removed)).foreach { case (kind, fr) =>
            if (fr.nonEmpty) arm(kind, v, files(fr))
          }
        }
        prev = m.fragments
      }
    }
    arms.result().reduceOption(_ unionByName _).getOrElse(
      spark.createDataFrame(java.util.Collections.emptyList[Row](), outSchema))
  }

  def plan(name: String, args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    require(args.nonEmpty, s"$name(path[, version])")
    val path = literalString(args.head, s"$name: path")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = graft.format.LanceFormat.fileSystem(root,
      spark.sessionState.newHadoopConf())
    val df = name match {
      // Batch change feed over a committed version range (Delta
      // `table_changes` re-expressed on manifests): walking (from, to],
      // fragments a commit ADDED become `insert` rows, fragments it
      // REMOVED become `delete` rows (their files stay on disk until
      // vacuum — same retention contract as the streaming changefeed),
      // and row-PRESERVING rewrites (compaction / re-clustering) emit
      // nothing. Granularity is the fragment: a row-level UPDATE surfaces
      // its whole rewritten fragment as delete+insert pairs, with the
      // unchanged rows identical on both sides — the standard CDC shape
      // for copy-on-write tables without per-row change tracking. Rows
      // read with the END version's schema (evolved columns null on old
      // fragments); each arm is an ordinary distributed parquet scan.
      case "lance_changes" =>
        require(args.size == 3, "lance_changes(path, fromVersion, toVersion)")
        changesDf(spark, fs, root, path,
          literalString(args(1), "lance_changes: fromVersion").toLong,
          literalString(args(2), "lance_changes: toVersion").toLong)
      // the NET view of the same window: one row per key — the latest
      // image in (commit, removal<addition) order wins, exactly what a
      // downstream keyed consumer applies ([[graft.operators.Replica]]'s
      // collapse served as SQL: `_change_type` is 'delete' or 'upsert')
      case "lance_changes_net" =>
        require(args.size == 4,
          "lance_changes_net(path, fromVersion, toVersion, keys_csv)")
        val keys = literalString(args(3), "lance_changes_net: keys")
          .split(',').map(_.trim).filter(_.nonEmpty).toSeq
        require(keys.nonEmpty, "lance_changes_net: empty key list")
        graft.operators.Replica.netChanges(
          changesDf(spark, fs, root, path,
            literalString(args(1), "lance_changes_net: fromVersion").toLong,
            literalString(args(2), "lance_changes_net: toVersion").toLong,
            fn = "lance_changes_net"),
          keys)
      // DESCRIBE-INDEXES parity: one row per persisted index sidecar
      // under <dataset>/_indices — vector (ivf / ivf_pq, + an hnsw_graph
      // row when the graph sidecar exists) and fts — with the staleness
      // verdict (indexed vs current dataset version) a maintenance
      // workflow polls before deciding refresh vs rebuild. Metadata only:
      // JSON sidecars + manifest listing, zero data files touched.
      case "lance_indexes" =>
        val indicesDir = new org.apache.hadoop.fs.Path(path, "_indices")
        val current: Option[Long] =
          graft.format.LanceFormat.readLatest(fs, root).map(_.version)
        val entries =
          if (!fs.exists(indicesDir)) Seq.empty[Row]
          else fs.listStatus(indicesDir).toSeq.filter(_.isDirectory)
            .map(_.getPath.getName).sorted.flatMap { dirName =>
              def freshRow(kind: String, column: String, detail: String,
                  partitions: Int, indexed: Option[Long]): Row = {
                val fresh: Any = (indexed, current) match {
                  case (Some(i), Some(c)) => Boolean.box(i == c)
                  case _ => null
                }
                Row(dirName, kind, column, detail, partitions,
                  indexed.map(Long.box).orNull,
                  current.map(Long.box).orNull, fresh)
              }
              // a sidecar that fails to LOAD (legacy format, corrupt
              // json) must not take the whole listing down — that is the
              // exact index a maintenance workflow most needs to see.
              // Surface it as an `error` row instead.
              def orError(column: String)(rows: => Seq[Row]): Seq[Row] =
                try rows catch {
                  case e: Exception => Seq(freshRow("error", column,
                    Option(e.getMessage).getOrElse(e.getClass.getName)
                      .linesIterator.next().take(120), -1, None))
                }
              if (dirName.endsWith("_ivf")) {
                val column = dirName.stripSuffix("_ivf")
                orError(column) {
                  val m = graft.index.IvfIndex.loadMeta(spark, path, column)
                  val kind = if (m.pq.isDefined) "ivf_pq" else "ivf"
                  val base = freshRow(kind, column, m.metric, m.numPartitions,
                    m.datasetVersion)
                  val gp = new org.apache.hadoop.fs.Path(
                    graft.index.HnswIndex.graphPath(path, column))
                  if (fs.exists(gp))
                    Seq(base, freshRow("hnsw_graph", column, m.metric,
                      m.numPartitions, m.datasetVersion))
                  else Seq(base)
                }
              } else if (dirName.endsWith("_fts")) {
                val column = dirName.stripSuffix("_fts")
                orError(column) {
                  val m = graft.index.FtsIndex.loadMeta(spark, path, column)
                  Seq(freshRow("fts", column, m.tokenizer.getOrElse("space"),
                    m.numTermPartitions, m.datasetVersion))
                }
              } else if (dirName.endsWith("_scalar")) {
                val column = dirName.stripSuffix("_scalar")
                orError(column) {
                  val m = graft.index.ScalarIndex.loadMeta(spark, path, column)
                  // freshness for the scalar index means "covers every
                  // current fragment" — appends keep it CORRECT but
                  // uncovered fragments are unprunable until a refresh
                  Seq(freshRow("scalar", column,
                    s"covered=${m.coveredFiles.size}", m.numBuckets,
                    m.datasetVersion))
                }
              } else Seq.empty
            }
        spark.createDataFrame(java.util.Arrays.asList(entries: _*),
          new StructType().add("name", StringType, nullable = false)
            .add("kind", StringType, nullable = false)
            .add("column", StringType, nullable = false)
            .add("detail", StringType, nullable = false) // metric / tokenizer
            .add("partitions", IntegerType, nullable = false)
            .add("indexed_version", LongType) // null = built off-dataset
            .add("current_version", LongType) // null = not a lance dataset
            .add("fresh", BooleanType))       // null = unknowable
      // KNN JOIN through SQL (the v37 flip-geometry path): the query
      // side is a TABLE/TEMP-VIEW NAME (Spark has no TABLE(...) TVF
      // arguments for injected catalyst TVFs), resolved via
      // spark.table so catalog tables and temp views both work. With
      // geometry 'auto' the broadcast-vs-flipped decision COUNTS the
      // query side at plan time — pass an explicit geometry to keep
      // resolution job-free.
      case "vector_search_join" =>
        require(args.size >= 5 && args.size <= 8,
          "vector_search_join(path, column, queryTable, queryIdCol, k" +
            "[, nprobes[, metric[, geometry]]])")
        graft.index.IvfIndex.searchJoin(spark, path,
          literalString(args(1), "vector_search_join: column"),
          spark.table(literalString(args(2), "vector_search_join: queryTable")),
          literalString(args(3), "vector_search_join: queryIdCol"),
          literalString(args(4), "vector_search_join: k").toInt,
          nprobes = if (args.size >= 6)
            literalString(args(5), "vector_search_join: nprobes").toInt else 20,
          metric = if (args.size >= 7)
            literalString(args(6), "vector_search_join: metric") else "l2",
          geometry = if (args.size >= 8)
            literalString(args(7), "vector_search_join: geometry") else "auto")
      // random row access from SQL: lance_take(path, id, id, ...) —
      // KNN-result hydration / sample inspection without a scan
      // (Lance's take, graft.Lance.take; ids are per-version addresses)
      case "lance_take" =>
        require(args.size >= 2,
          "lance_take(path[, 'version=N'], rowId[, rowId ...])")
        // row ids are PER-VERSION addresses (compaction/DML renumber
        // them): an optional 'version=N' second argument pins the version
        // the ids were minted against — without it, ids resolved against
        // an older snapshot silently address different rows today
        val second = literalString(args(1), "lance_take: arg")
        val versionRe = "(?i)version=(\\d+)".r
        val (version, idArgs) = second match {
          case versionRe(v) =>
            require(args.size >= 3,
              "lance_take(path, 'version=N', rowId[, rowId ...])")
            (Some(v.toLong), args.drop(2))
          case _ => (None, args.drop(1))
        }
        val ids = idArgs.map(a => literalString(a, "lance_take: rowId").toLong)
        graft.Lance.take(spark, path, ids, version)
      // the SQL spelling of [[graft.Lance.readNsAsTimestamp]]: every
      // column declared int64-nanoseconds (`write.ns-as-long`) surfaces
      // as a µs TimestampType via the one floor-division helper; the
      // plain scan keeps the lossless longs
      case "lance_read_ns" =>
        require(args.size == 1, "lance_read_ns(path)")
        graft.Lance.readNsAsTimestamp(spark, path)
      // Late interaction (ColBERT maxsim) through SQL: query vectors come
      // from a table/temp view (driver-small by definition — one query's
      // vectors), candidates from the probed IVF buckets, exact rerank
      // over candidates only (graft.index.IvfIndex.maxSim). docIdExpr is
      // a SQL expression over the indexed table grouping vectors into
      // documents; '' filter / 0 cap mean none (positional arg skipping).
      case "lance_maxsim" =>
        require(args.size >= 6 && args.size <= 9,
          "lance_maxsim(path, column, docIdExpr, queryTable, vecCol, k" +
            "[, nprobes[, candidatesPerQuery[, filter]]])")
        val qvecs = spark.table(literalString(args(3), "lance_maxsim: queryTable"))
          .select(org.apache.spark.sql.functions
            .col(literalString(args(4), "lance_maxsim: vecCol"))
            .cast("array<float>"))
          .collect().map(_.getSeq[Float](0).toArray).toSeq
        graft.index.IvfIndex.maxSim(spark, path,
          literalString(args(1), "lance_maxsim: column"),
          org.apache.spark.sql.functions.expr(
            literalString(args(2), "lance_maxsim: docIdExpr")),
          qvecs,
          literalString(args(5), "lance_maxsim: k").toInt,
          nprobes = if (args.size >= 7)
            literalString(args(6), "lance_maxsim: nprobes").toInt else 20,
          candidatesPerQuery = if (args.size >= 8)
            literalString(args(7), "lance_maxsim: candidatesPerQuery").toInt else 0,
          filter = if (args.size >= 9)
            Some(literalString(args(8), "lance_maxsim: filter")).filter(_.nonEmpty)
              .map(org.apache.spark.sql.functions.expr) else None)
      // BM25 over the persisted inverted index (graft.index.FtsIndex) —
      // the scalar-index sibling of the vector_search TVF
      case "lance_fts" =>
        require(args.size >= 4 && args.size <= 6,
          "lance_fts(path, column, query, k[, filter[, matchMode]])")
        val colSpec = literalString(args(1), "lance_fts: column")
        val query = literalString(args(2), "lance_fts: query")
        val k = literalString(args(3), "lance_fts: k").toInt
        val filter = if (args.size >= 5)
          Some(literalString(args(4), "lance_fts: filter"))
            .filter(_.nonEmpty) else None // '' = no filter (arg skipping)
        val matchMode = if (args.size >= 6)
          literalString(args(5), "lance_fts: matchMode") else "any"
        // 'title^2,body' = weighted multi-field (Lucene boost syntax) —
        // each field searched through its own index, scores boost-summed
        if (colSpec.contains(',') || colSpec.contains('^')) {
          val fields = colSpec.split(',').map(_.trim).filter(_.nonEmpty)
            .map { f =>
              f.split('^') match {
                case Array(c) => (c.trim, 1.0)
                case Array(c, b) => (c.trim, b.trim.toDouble)
                case _ => throw new IllegalArgumentException(
                  s"lance_fts: bad field spec '$f' (want col or col^boost)")
              }
            }.toSeq
          graft.index.FtsIndex.searchFields(spark, path, fields, query, k,
            filter, matchMode)
        } else graft.index.FtsIndex.search(spark, path, colSpec, query, k,
          filter = filter, matchMode = matchMode)
      // BM25 hits + highlighted snippets (Lucene Highlighter / ES
      // highlight): the top-k join back to the corpus (broadcast ids →
      // runtime fragment pruning) and one codegen'd pass marks matched
      // terms in a window around the first hit
      case "lance_fts_highlight" =>
        require(args.size >= 4 && args.size <= 7,
          "lance_fts_highlight(path, column, query, k[, filter[, " +
            "matchMode[, window]]])")
        val column = literalString(args(1), "lance_fts_highlight: column")
        val query = literalString(args(2), "lance_fts_highlight: query")
        val k = literalString(args(3), "lance_fts_highlight: k").toInt
        val filter = if (args.size >= 5)
          Some(literalString(args(4), "lance_fts_highlight: filter"))
            .filter(_.nonEmpty) else None
        val matchMode = if (args.size >= 6)
          literalString(args(5), "lance_fts_highlight: matchMode") else "any"
        val window = if (args.size >= 7)
          literalString(args(6), "lance_fts_highlight: window").toInt else 12
        graft.index.FtsIndex.searchHighlight(spark, path, column, query, k,
          filter = filter, matchMode = matchMode, window = window)
      // ANALYZE/DESCRIBE-STATISTICS parity, zero data files touched: the
      // per-fragment manifest stats rolled up to table level. min/max are
      // BOUNDS in the stored canonical encoding (strings ≤64 chars are
      // exact; longer string maxima are truncated-incremented upper
      // bounds), null ONLY when genuinely unknowable (a stats-less or
      // NaN-voided fragment) — never guessed. null_count is exact even
      // across schema evolution (pre-column fragments read all-null and
      // contribute their full rowCount).
      case "lance_stats" =>
        val version = if (args.size >= 2)
          Some(literalString(args(1), "lance_stats: version").toLong) else None
        val m = version
          .map(graft.format.LanceFormat.readManifest(fs, root, _))
          .orElse(graft.format.LanceFormat.readLatest(fs, root))
          .getOrElse(throw new IllegalArgumentException(s"no lance dataset at $path"))
        val totalRows = m.rowCount
        // the ANALYZE sidecar's NDV, when one exists (null = never
        // analyzed or column not covered — unknown, not zero)
        val ndvByCol: Map[String, Long] = graft.format.TableStats.read(fs, root)
          .map(_.columns.map { case (c, s) => c -> s.ndv }).getOrElse(Map.empty)
        val rows = graft.format.FragmentStats.aggregate(m.schema, m.fragments)
          .map { case (name, mn, mx, nulls, nBounded) =>
            Row(name, mn.orNull, mx.orNull, nulls.map(Long.box).orNull,
              ndvByCol.get(name).map(Long.box).orNull,
              totalRows, nBounded, m.fragments.size)
          }
        spark.createDataFrame(java.util.Arrays.asList(rows: _*),
          new StructType().add("col_name", StringType, nullable = false)
            .add("min", StringType) // null = unknowable, not "no rows"
            .add("max", StringType)
            .add("null_count", LongType)
            .add("ndv", LongType) // HLL estimate from the last ANALYZE
            .add("row_count", LongType, nullable = false)
            .add("n_fragments_bounded", IntegerType, nullable = false)
            .add("n_fragments", IntegerType, nullable = false))
      // named snapshots: one row per tag, joined to the tagged
      // manifest's row count / commit time (metadata only)
      case "lance_tags" =>
        val rows = graft.format.LanceFormat.listTags(fs, root).map { t =>
          val m = graft.format.LanceFormat.readManifest(fs, root, t.version)
          Row(t.name, t.version, m.rowCount,
            new java.sql.Timestamp(t.taggedAtMs),
            new java.sql.Timestamp(m.committedAtMs))
        }
        spark.createDataFrame(java.util.Arrays.asList(rows: _*),
          new StructType().add("name", StringType, nullable = false)
            .add("version", LongType, nullable = false)
            .add("n_rows", LongType, nullable = false)
            .add("tagged_at", TimestampType, nullable = false)
            .add("committed_at", TimestampType, nullable = false))
      // registered external changefeed consumers: one row per named pin
      // (name + consumed-through watermark + the current head, so the
      // operator sees each consumer's lag at a glance)
      case "lance_consumers" =>
        // ONE snapshot read: head and properties from the same manifest
        // (two reads could straddle a concurrent commit and show a
        // negative lag)
        val m = graft.format.LanceFormat.readLatest(fs, root)
        val head = m.map(_.version).getOrElse(0L)
        val rows = m.flatMap(_.properties).getOrElse(Map.empty)
          .collect { case (k, v) if k.startsWith("graft.consumer.") =>
            Row(k.stripPrefix("graft.consumer."), v.toLong, head - v.toLong)
          }.toSeq.sortBy(_.getString(0))
        spark.createDataFrame(java.util.Arrays.asList(rows: _*),
          new StructType().add("name", StringType, nullable = false)
            .add("watermark", LongType, nullable = false)
            .add("versions_behind", LongType, nullable = false))
      // registered derived-table dependents: one row per view / replica
      // / star-dim registration on THIS table, with the dependent's
      // watermark INTO this table's history and its lag — the companion
      // to lance_consumers for internal dependents (the same watermarks
      // pin this table's retention vacuum)
      case "lance_dependents" =>
        val m = graft.format.LanceFormat.readLatest(fs, root)
        val head = m.map(_.version).getOrElse(0L)
        val props = m.flatMap(_.properties).getOrElse(Map.empty)
        // registrations store java.io.File absolute paths — normalize
        // the TVF's path argument the same way before comparing
        val myAbs = new java.io.File(path).getAbsolutePath
        val conf = spark.sessionState.newHadoopConf()
        def depProps(dp: String): Map[String, String] =
          try {
            val dr = new org.apache.hadoop.fs.Path(dp)
            graft.format.LanceFormat.readLatest(
              graft.format.LanceFormat.fileSystem(dr, conf), dr)
              .flatMap(_.properties).getOrElse(Map.empty)
          } catch { case _: Exception => Map.empty }
        def deps(key: String): Seq[String] =
          props.get(key).toSeq.flatMap(_.split('\n')).filter(_.nonEmpty)
        val rows: Seq[Row] =
          deps("graft.mv.dependents").map { dp =>
            // role + watermark via the SAME parse the retention pin uses
            // (graft.mv.version counts only when this table IS the
            // view's source — a recreated-elsewhere view reports stale,
            // never a foreign watermark as negative lag)
            graft.operators.MaterializedView
              .roleAndWatermark(depProps(dp), myAbs) match {
              case Some((role, wm)) =>
                Row(dp, "view", role, wm.map(Long.box).orNull,
                  wm.map(w => Long.box(head - w)).orNull)
              case None => Row(dp, "view", "stale", null, null)
            }
          } ++
          deps("graft.replica.dependents").map { dp =>
            val wm = depProps(dp).get("graft.replica.version").map(_.toLong)
            Row(dp, "replica", "source", wm.map(Long.box).orNull,
              wm.map(w => Long.box(head - w)).orNull)
          } ++
          deps("graft.mv.dim-dependents").map { dp =>
            // a dim registration pins via TAG, not a watermark
            Row(dp, "view", "dim", null, null)
          }
        spark.createDataFrame(
          java.util.Arrays.asList(rows.sortBy(r =>
            (r.getString(0), r.getString(2))): _*),
          new StructType().add("dependent", StringType, nullable = false)
            .add("kind", StringType, nullable = false)
            .add("role", StringType, nullable = false)
            .add("watermark", LongType)
            .add("versions_behind", LongType))
      // DESCRIBE-CONSTRAINTS parity: one row per CHECK rule
      case "lance_constraints" =>
        val rows = graft.format.LanceFormat.readLatest(fs, root)
          .map(_.checkConstraints).getOrElse(Map.empty)
          .toSeq.sortBy(_._1)
          .map { case (n, e) => Row(n, e) }
        spark.createDataFrame(java.util.Arrays.asList(rows: _*),
          new StructType().add("name", StringType, nullable = false)
            .add("expr", StringType, nullable = false))
      // append-only branch lineages: name + base/head versions + head
      // row count (metadata only)
      case "lance_branches" =>
        val rows = graft.format.LanceFormat.listBranches(fs, root).map {
          case (name, base, head) =>
            val hm = graft.format.LanceFormat.readManifestIn(
              fs, graft.format.LanceFormat.branchPath(root, name), head)
            Row(name, base, head, hm.rowCount)
        }
        spark.createDataFrame(java.util.Arrays.asList(rows: _*),
          new StructType().add("name", StringType, nullable = false)
            .add("base_version", LongType, nullable = false)
            .add("head_version", LongType, nullable = false)
            .add("n_rows", LongType, nullable = false))
      case "lance_versions" =>
        val rows = graft.format.LanceFormat.listVersions(fs, root).map { v =>
          val m = graft.format.LanceFormat.readManifest(fs, root, v)
          Row(v, m.fragments.size, m.rowCount,
            m.operation.orNull,
            m.epochId.map(Long.box).orNull,
            new java.sql.Timestamp(m.committedAtMs))
        }
        spark.createDataFrame(java.util.Arrays.asList(rows: _*),
          new StructType().add("version", LongType, nullable = false)
            .add("n_fragments", IntegerType, nullable = false)
            .add("n_rows", LongType, nullable = false)
            .add("operation", StringType) // null on pre-field manifests
            .add("epoch_id", LongType)
            .add("committed_at", TimestampType, nullable = false))
      case _ =>
        val version = if (args.size >= 2)
          Some(literalString(args(1), s"$name: version").toLong) else None
        val m = version
          .map(graft.format.LanceFormat.readManifest(fs, root, _))
          .orElse(graft.format.LanceFormat.readLatest(fs, root))
          .getOrElse(throw new IllegalArgumentException(s"no lance dataset at $path"))
        val rows = m.fragments.map { f =>
          Row(f.id, f.file, f.rowCount, f.stats.isDefined,
            f.bucket.map(Int.box).orNull,
            f.sorted.map(Boolean.box).orNull,
            f.bytes.map(Long.box).orNull)
        }
        spark.createDataFrame(java.util.Arrays.asList(rows: _*),
          new StructType().add("id", IntegerType, nullable = false)
            .add("file", StringType, nullable = false)
            .add("row_count", LongType, nullable = false)
            .add("has_stats", BooleanType, nullable = false)
            // layout state an operator polls before relying on SPJ /
            // sort-free joins: bucket tag, observed key-sortedness,
            // recorded size (null = written before the field existed)
            .add("bucket", IntegerType)
            .add("key_sorted", BooleanType)
            .add("bytes", LongType))
    }
    df.queryExecution.analyzed
  }
}

/** Rewrites `vector_search(path, column, queryVec[, k[, metric]])` into the
  * exact-KNN plan over the lance dataset at `path`.
  */
class ResolveVectorSearch(spark: SparkSession) extends Rule[LogicalPlan] {

  private def literalString(e: Expression, what: String): String = {
    require(e.foldable, s"vector_search: $what must be a literal")
    String.valueOf(e.eval())
  }

  /** ONE traversal of a literal query-vector array — float32 (the walk)
    * and float64 (the exact re-rank) views of the SAME call must never
    * come from divergent element handling. Elements surface as Decimal
    * or Number so each target width converts with a SINGLE rounding
    * (DECIMAL literals -> float32 must not round through a double).
    */
  private def literalNumbers(e: Expression): IndexedSeq[Either[Decimal, java.lang.Number]] = {
    require(e.foldable, "vector_search: query vector must be a literal array")
    val arr = e.eval().asInstanceOf[ArrayData]
    val elemType = e.dataType.asInstanceOf[ArrayType].elementType
    (0 until arr.numElements()).map { i =>
      elemType match {
        case FloatType => Right(java.lang.Float.valueOf(arr.getFloat(i)))
        case DoubleType => Right(java.lang.Double.valueOf(arr.getDouble(i)))
        case dt: DecimalType => // SQL ARRAY[0.1, ...] parses as DECIMAL
          Left(arr.getDecimal(i, dt.precision, dt.scale))
        case _ => arr.get(i, elemType) match {
          case d: Decimal => Left(d)
          case n: java.lang.Number => Right(n)
          case o => Left(Decimal(BigDecimal(o.toString)))
        }
      }
    }
  }

  private def literalFloats(e: Expression): Array[Float] =
    literalNumbers(e).map(_.fold(_.toFloat, _.floatValue())).toArray

  private def literalDoubles(e: Expression): Array[Double] =
    literalNumbers(e).map(_.fold(_.toDouble, _.doubleValue())).toArray

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case tvf: UnresolvedTableValuedFunction
      if tvf.name.lastOption.exists(_.equalsIgnoreCase("vector_search")) =>
      val args = tvf.functionArgs
      require(args.size >= 3 && args.size <= 9,
        "vector_search(path, column, queryVec[, k[, metric[, mode[, nprobes[, ef[, filter]]]]]])")
      val path = literalString(args.head, "path")
      val column = literalString(args(1), "column")
      val vec = literalFloats(args(2))
      val k = if (args.size >= 4) literalString(args(3), "k").toInt else 10
      val metric = if (args.size >= 5) literalString(args(4), "metric") else "l2"
      // mode mirrors the reference's use-index switch (`vector.use-index`,
      // `LanceVectorSearch` Query.useIndex): 'exact' scans, 'ivf'/'hnsw'/
      // 'ivf_pq'/'hnsw_pq' probe the prebuilt index sidecar at `path`
      val mode = if (args.size >= 6) literalString(args(5), "mode") else "exact"
      // search-knob parity with the reference's option keys
      // (`config/LanceOptions.java:123-237,719-780`: vector.nprobes,
      // vector.ef, vector.refine-factor): positional TVF args first, then
      // session confs `spark.graft.vector.*`, then reference defaults —
      // SQL users can tune a search without touching Scala
      def conf(key: String, dflt: Int): Int = spark.conf
        .getOption(s"spark.graft.vector.$key").map(_.toInt).getOrElse(dflt)
      val nprobes = if (args.size >= 7) literalString(args(6), "nprobes").toInt
        else conf("nprobes", 20)
      val ef = if (args.size >= 8) literalString(args(7), "ef").toInt
        else conf("ef", 100)
      val refine = conf("refine-factor", 4)
      // arg 9: a SQL predicate applied as a PRE-filter inside the search —
      // reference filtered vector search (V3, `LanceVectorSearch.java:
      // 170-174`): all k results satisfy it, unlike a WHERE on the TVF
      // output, which post-trims an already-computed top-k
      val preFilter: Option[org.apache.spark.sql.Column] =
        if (args.size >= 9)
          Some(org.apache.spark.sql.functions.expr(
            literalString(args(8), "filter")))
        else None
      val df = mode.toLowerCase match {
        case "exact" => Similarity.knnSearch(
          spark.read.format("lance").load(path), column, vec, k, metric,
          filter = preFilter)
        case "ivf" =>
          graft.index.IvfIndex.search(spark, path, column, vec, k,
            nprobes = nprobes, metric = metric, filter = preFilter)
        case "ivf_pq" =>
          graft.index.IvfIndex.searchPq(spark, path, column, vec, k,
            nprobes = nprobes, refineFactor = refine, filter = preFilter,
            metric = Some(metric))
        case "hnsw" =>
          // filter composes with the beam walk (evaluate-during-search with
          // loud widening on shortfall) — reference filter-with-any-index
          // semantics, `LanceVectorSearch.java:170-174`
          graft.index.HnswIndex.search(spark, path, column, vec, k,
            nprobes = nprobes, ef = ef, metric = Some(metric),
            filter = preFilter)
        case "hnsw_pq" =>
          graft.index.HnswIndex.searchPq(spark, path, column, vec, k,
            nprobes = nprobes, ef = ef, filter = preFilter,
            metric = Some(metric))
        case "hnsw_rerank" =>
          // HNSW walk + exact-double re-rank (v47): the query vector is
          // re-read as DOUBLES (never through the float32 cast) so the
          // re-rank scores at full precision
          graft.index.HnswIndex.searchRerankDouble(spark, path, column,
            literalDoubles(args(2)), k, nprobes = nprobes, ef = ef,
            metric = Some(metric), filter = preFilter)
        case m => throw new IllegalArgumentException(
          s"vector_search mode must be exact|ivf|ivf_pq|hnsw|hnsw_pq|hnsw_rerank, got $m")
      }
      df.queryExecution.analyzed
  }
}
