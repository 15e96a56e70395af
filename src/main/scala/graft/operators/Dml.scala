package graft.operators

import graft.format.{FragmentMeta, FragmentStats, LanceFormat, Manifest}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{sources => v1}

/** Row-level DELETE / UPDATE / MERGE on lance datasets as copy-on-write
  * commits — the mutation surface the reference connector lacks entirely
  * (it is insert-only: `ref:LanceSink.java:152-195` knows Append/Overwrite)
  * but any long-lived 100 TB corpus needs: data corrections, takedown /
  * right-to-be-forgotten deletes, dimension backfills, dedup-driven purges.
  *
  * Design (Delta/Iceberg copy-on-write, re-expressed on the manifest):
  *
  *  1. **Scope by manifest stats.** [[FragmentStats.prune]] with the
  *     operation's predicate (or the source's key bounds, for MERGE) keeps
  *     only fragments that MAY contain affected rows — on a clustered
  *     table, deleting one key rewrites one fragment, not 100 TB. Fragments
  *     proven untouched carry over into the new version by reference.
  *  2. **Rewrite only the candidates** with the ordinary distributed lance
  *     writer (stats re-collected, files rolled at max-rows-per-file).
  *  3. **Commit a replace**: [[LanceFormat.commitReplace]] swaps exactly
  *     the candidate fragment ids under optimistic MVCC — concurrent
  *     appends merge; a concurrent rewrite of the same fragments fails
  *     loud instead of resurrecting replaced rows. Old files stay behind
  *     the old manifests (time travel), until vacuum.
  *
  * Copy-on-write (not merge-on-read deletion vectors) is the right trade
  * for a Spark batch/analytics engine: scans stay pure fragment-parallel
  * parquet with zero read-path overhead, and the write amplification is
  * bounded by stats pruning + clustering. The same trade Delta Lake
  * defaults to.
  */
object Dml {

  /** Outcome of a row-level operation. `rowsChanged` = rows deleted /
    * updated / overwritten-by-source; `rowsInserted` only for MERGE.
    * `committedVersion` is None when the operation was a no-op (nothing
    * matched — no new version is committed, the table is untouched).
    */
  case class RowLevelResult(totalFragments: Int, candidateFragments: Int,
      rowsChanged: Long, rowsInserted: Long, committedVersion: Option[Long])

  private def snapshot(spark: SparkSession, pathStr: String): (FileSystem, Path, Manifest) = {
    val root = new Path(pathStr)
    val fs = LanceFormat.fileSystem(root, spark.sessionState.newHadoopConf())
    val m = LanceFormat.readLatest(fs, root).getOrElse(
      throw new IllegalArgumentException(s"no lance dataset at $pathStr"))
    (fs, root, m)
  }

  /** Read exactly these fragments of a pinned manifest (immutable files —
    * snapshot-consistent regardless of concurrent commits).
    */
  private def readFragments(spark: SparkSession, root: Path, m: Manifest,
      frags: Seq[FragmentMeta]): DataFrame = {
    // fragment files carry PHYSICAL names (stable under RENAME COLUMN);
    // rename back to the logical schema the DML expressions reference
    val df = spark.read.schema(m.physicalSchema)
      .parquet(frags.map(f => LanceFormat.fragmentPath(root, f.file).toString): _*)
    if (m.mapping.isEmpty) df else df.toDF(m.schema.fieldNames.toIndexedSeq: _*)
  }

  private def q(name: String): Column = col(s"`$name`")

  /** A v1-filter ATTRIBUTE back to a Column: dotted names are
    * first-level struct-leaf paths ([[toV1]]'s keying) and become
    * nested accesses — UNLESS a top-level column literally owns that
    * name (`flatCols`, the [[graft.format.FragmentStats.leafType]]
    * preference), which quotes whole. */
  private def qa(name: String, flatCols: Set[String] = Set.empty): Column =
    if (name.contains('.') && !flatCols(name))
      col(name.split('.').map(p => s"`$p`").mkString("."))
    else q(name)

  /** Per-fragment match counts from a DataFrame carrying a `__f`
    * (input_file_name) column: fragment file name → matching rows. The
    * scoping that keeps a rewrite proportional to the fragments ACTUALLY
    * holding matches — "may match" candidates (stats admit the range,
    * postings admit the point) that turn out clean ride into the new
    * version BY REFERENCE instead of being read and rewritten. On a
    * 100 TB table a 2-row CDC delete then rewrites 2 fragments, not the
    * whole may-match span, and index staleness stays proportional too.
    */
  private def matchesByFile(withF: DataFrame): Map[String, Long] =
    withF.groupBy(col("__f")).count().collect()
      .map { r =>
        val p = r.getString(0)
        p.substring(p.lastIndexOf('/') + 1) -> r.getLong(1)
      }.toMap

  private def nameOf(f: FragmentMeta): String =
    f.file.substring(f.file.lastIndexOf('/') + 1)

  /** In-commit index maintenance for DML: SQL DELETE/UPDATE/MERGE carry
    * no write options, so `spark.graft.dml.refreshIndexes` (all | csv of
    * scalar|fts|ivf) opts a session in. Parsed at operation ENTRY — a
    * typo'd kind fails before any commit, never after a half-observed
    * mutation — then run after the commit with the same stale-but-correct
    * warn posture as `write.refresh-indexes`. The scalar index is
    * DML-safe by construction (postings for replaced files vanish by
    * intersection with the live manifest; rewritten fragments are
    * uncovered until refreshed, hence scanned, never wrongly pruned).
    */
  // ---------------------------------------------------- change-data feed

  /** Row-level CDF capture is opt-in (`spark.graft.dml.changeFeed=true`,
    * Delta's enableChangeDataFeed posture): recording exact pre/post
    * images costs one extra write of the MATCHED rows per DML commit —
    * cost ∝ the change, never the table — and buys downstream consumers
    * row-granular replay instead of whole-fragment delete+insert
    * amplification through `lance_changes` / the streaming CDC mode. */
  private def cdfEnabled(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.dml.changeFeed").exists(_.toBoolean)

  /** Stage row-level change images as `cdf-*.parquet` files in the data
    * dir under the table's PHYSICAL schema (like fragments — stable
    * across RENAME). The returned metas ride the DML commit's manifest
    * via `write.change-files`; a failed write leaves cdf orphans that
    * [[LanceFormat.removeOrphans]] reclaims after grace, like any staged
    * file. */
  private def stageChangeFiles(spark: SparkSession, fs: FileSystem,
      root: Path, m: Manifest,
      images: Seq[(String, DataFrame)]): Seq[graft.format.ChangeFileMeta] = {
    // ONE Spark job for the whole image set: each image rides a literal
    // `__cdf_kind` tag and the union writes partitioned by it, so a
    // 4-image applyChanges stages in one pass instead of four (the
    // per-kind files come back out of the partition directories; file
    // CONTENT is identical — partitionBy drops the tag column)
    require(!m.physicalSchema.fieldNames.contains("__cdf_kind"),
      "a column named __cdf_kind collides with CDF staging's routing tag")
    val tagged = images.map { case (kind, df0) =>
      val ordered = df0.select(m.schema.fieldNames.map(q).toIndexedSeq: _*)
      val phys =
        if (m.mapping.isEmpty) ordered
        else ordered.toDF(m.schema.fieldNames.map(m.physicalName).toIndexedSeq: _*)
      phys.withColumn("__cdf_kind", lit(kind))
    }.reduce(_ unionByName _)
    stageTagged(spark, fs, root, tagged, images.map(_._1).distinct)
  }

  /** Core CDF staging: `tagged` carries the table's PHYSICAL columns plus
    * a `__cdf_kind` literal per row; one partitioned write stages every
    * kind in one pass. */
  private def stageTagged(spark: SparkSession, fs: FileSystem, root: Path,
      tagged: DataFrame, kinds: Seq[String]): Seq[graft.format.ChangeFileMeta] = {
    val conf = spark.sessionState.newHadoopConf()
    val tmp = new Path(root, s"_tmp-cdf-${java.util.UUID.randomUUID()}")
    try {
      tagged.write.mode("overwrite").partitionBy("__cdf_kind").parquet(tmp.toString)
      // footer row counts read in bounded parallel (guide §5: the
      // driver-side per-file loop serializes on file count at scale);
      // the renames stay sequential — cheap FS metadata ops
      val parts = kinds.flatMap { kind =>
        val kindDir = new Path(tmp, s"__cdf_kind=$kind")
        val sts = if (fs.exists(kindDir)) fs.listStatus(kindDir).toSeq
          .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
          else Seq.empty
        sts.map(kind -> _)
      }
      val counts = graft.format.DriverPar.parMap(parts) { case (_, st) =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(st.getPath, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }
      parts.zip(counts).flatMap { case ((kind, st), rows) =>
        if (rows == 0L) None
        else {
          val name = s"cdf-${java.util.UUID.randomUUID()}.parquet"
          val dataDir = LanceFormat.dataPath(root)
          fs.mkdirs(dataDir)
          require(fs.rename(st.getPath, new Path(dataDir, name)),
            s"could not stage change file $name at $root")
          Some(graft.format.ChangeFileMeta(name, rows, kind))
        }
      }
    } finally fs.delete(tmp, true)
  }

  /** Attach staged change-file metas to a lance rewrite write. */
  private def withChangeFiles(w: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row],
      cdf: Seq[graft.format.ChangeFileMeta]) =
    if (cdf.isEmpty) w
    else w.option("write.change-files", LanceFormat.serializeChangeFiles(cdf))

  private def dmlRefreshKinds(spark: SparkSession): Set[String] =
    spark.conf.getOption("spark.graft.dml.refreshIndexes")
      .map(graft.connector.LanceWrite.parseRefreshKinds(
        "spark.graft.dml.refreshIndexes", _))
      .getOrElse(Set.empty[String])

  private def maybeRefreshIndexes(kinds: Set[String], path: String): Unit =
    if (kinds.nonEmpty)
      graft.connector.LanceWrite.refreshIndexesAfterCommit(path, kinds)

  // ------------------------------------------------ predicate translation

  /** Conservative Catalyst→V1 translation for manifest-stats pruning: any
    * shape we can't express keeps every fragment a candidate (correct,
    * just less scoped). Mirrors the vocabulary [[FragmentStats.mayMatch]]
    * understands; casts, functions and non-literal comparands yield None.
    */
  private def toV1(e: org.apache.spark.sql.catalyst.expressions.Expression): Option[v1.Filter] = {
    import org.apache.spark.sql.catalyst.{expressions => ce}
    def name(x: ce.Expression): Option[String] = x match {
      case a: ce.AttributeReference => Some(a.name)
      // first-level struct leaf (`meta.n_chars`): dotted-path filters,
      // same keying as the stats writer — nested predicates then scope
      // DML rewrites exactly like flat ones
      case g: ce.GetStructField => g.child match {
        case a: ce.AttributeReference => Some(s"${a.name}.${g.extractFieldName}")
        case _ => None
      }
      case _ => None
    }
    def value(l: ce.Literal): Any =
      org.apache.spark.sql.catalyst.CatalystTypeConverters.convertToScala(l.value, l.dataType)
    e match {
      case ce.And(l, r) => for { a <- toV1(l); b <- toV1(r) } yield v1.And(a, b)
      case ce.Or(l, r) => for { a <- toV1(l); b <- toV1(r) } yield v1.Or(a, b)
      case ce.Not(c) => toV1(c).map(v1.Not)
      case ce.EqualTo(a, l: ce.Literal) => name(a).map(v1.EqualTo(_, value(l)))
      case ce.EqualTo(l: ce.Literal, a) => name(a).map(v1.EqualTo(_, value(l)))
      case ce.GreaterThan(a, l: ce.Literal) => name(a).map(v1.GreaterThan(_, value(l)))
      case ce.GreaterThan(l: ce.Literal, a) => name(a).map(v1.LessThan(_, value(l)))
      case ce.GreaterThanOrEqual(a, l: ce.Literal) =>
        name(a).map(v1.GreaterThanOrEqual(_, value(l)))
      case ce.GreaterThanOrEqual(l: ce.Literal, a) =>
        name(a).map(v1.LessThanOrEqual(_, value(l)))
      case ce.LessThan(a, l: ce.Literal) => name(a).map(v1.LessThan(_, value(l)))
      case ce.LessThan(l: ce.Literal, a) => name(a).map(v1.GreaterThan(_, value(l)))
      case ce.LessThanOrEqual(a, l: ce.Literal) =>
        name(a).map(v1.LessThanOrEqual(_, value(l)))
      case ce.LessThanOrEqual(l: ce.Literal, a) =>
        name(a).map(v1.GreaterThanOrEqual(_, value(l)))
      case ce.In(a, vs) if vs.forall(_.isInstanceOf[ce.Literal]) =>
        name(a).map(v1.In(_, vs.map(v => value(v.asInstanceOf[ce.Literal])).toArray))
      case ce.IsNull(a) => name(a).map(v1.IsNull)
      case ce.IsNotNull(a) => name(a).map(v1.IsNotNull)
      case ce.StartsWith(a, l: ce.Literal) =>
        name(a).map(v1.StringStartsWith(_, value(l).toString))
      case _ => None
    }
  }

  /** Resolve `cond` against the table and translate its top-level
    * conjuncts — a partially translatable predicate still prunes on the
    * translated conjuncts (AND semantics make that sound). The Boolean is
    * true iff EVERY conjunct translated: only then do the V1 filters mean
    * exactly `cond`, which the metadata-only delete fast path requires
    * (proving a translated SUBSET true of all rows proves nothing about
    * the untranslated rest).
    */
  private def pruneFiltersFull(table: DataFrame, cond: Column): (Array[v1.Filter], Boolean) = {
    import org.apache.spark.sql.catalyst.{expressions => ce}
    def conjuncts(e: ce.Expression): Seq[ce.Expression] = e match {
      case ce.And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    // analysis wraps literals in type-coercion Casts (`id >= 10` on a
    // bigint column compares against cast(10 as bigint)); fold them back
    // to plain literals so the translator sees the comparable shape
    def fold(e: ce.Expression): ce.Expression = e.transformUp {
      case x if x.foldable && x.deterministic && !x.isInstanceOf[ce.Literal] =>
        ce.Literal.create(x.eval(ce.EmptyRow), x.dataType)
    }
    val translated = table.filter(cond).queryExecution.analyzed
      .collect { case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition }
      .flatMap(conjuncts)
      .map(fold)
      .map(toV1)
    (translated.flatten.toArray, translated.forall(_.isDefined))
  }

  private def pruneFilters(table: DataFrame, cond: Column): Array[v1.Filter] =
    pruneFiltersFull(table, cond)._1

  /** V1 filters (implicitly ANDed) back to one Column — the
    * `SupportsDelete.deleteWhere` entry point's condition. Total: Spark
    * only hands over predicates it could translate, and each translatable
    * shape has a Column form.
    */
  def filtersToColumn(filters: Array[v1.Filter],
      flatCols: Set[String] = Set.empty): Column =
    if (filters.isEmpty) lit(true)
    else filters.map(filterToColumn(_, flatCols)).reduce(_ && _)

  /** Rename a V1 filter's attributes logical → physical (fragment stats
    * speak physical names). Shapes with no attribute pass through. */
  private[graft] def renameFilter(f: v1.Filter,
      mapping: Map[String, String]): v1.Filter = {
    def p(a: String) = mapping.get(a).getOrElse {
      // dotted struct-leaf path: the PARENT may be renamed (leaves
      // themselves cannot be — rename is top-level only)
      val i = a.indexOf('.')
      if (i > 0) mapping.getOrElse(a.take(i), a.take(i)) + a.substring(i)
      else a
    }
    f match {
      case v1.EqualTo(a, v) => v1.EqualTo(p(a), v)
      case v1.EqualNullSafe(a, v) => v1.EqualNullSafe(p(a), v)
      case v1.GreaterThan(a, v) => v1.GreaterThan(p(a), v)
      case v1.GreaterThanOrEqual(a, v) => v1.GreaterThanOrEqual(p(a), v)
      case v1.LessThan(a, v) => v1.LessThan(p(a), v)
      case v1.LessThanOrEqual(a, v) => v1.LessThanOrEqual(p(a), v)
      case v1.In(a, vs) => v1.In(p(a), vs)
      case v1.IsNull(a) => v1.IsNull(p(a))
      case v1.IsNotNull(a) => v1.IsNotNull(p(a))
      case v1.StringStartsWith(a, x) => v1.StringStartsWith(p(a), x)
      case v1.StringEndsWith(a, x) => v1.StringEndsWith(p(a), x)
      case v1.StringContains(a, x) => v1.StringContains(p(a), x)
      case v1.And(l, r) => v1.And(renameFilter(l, mapping), renameFilter(r, mapping))
      case v1.Or(l, r) => v1.Or(renameFilter(l, mapping), renameFilter(r, mapping))
      case v1.Not(c) => v1.Not(renameFilter(c, mapping))
      case other => other
    }
  }

  private[graft] def filterToColumn(f: v1.Filter,
      flatCols: Set[String] = Set.empty): Column = f match {
    case v1.AlwaysTrue() => lit(true)
    case v1.AlwaysFalse() => lit(false)
    case v1.And(l, r) => filterToColumn(l, flatCols) && filterToColumn(r, flatCols)
    case v1.Or(l, r) => filterToColumn(l, flatCols) || filterToColumn(r, flatCols)
    case v1.Not(c) => !filterToColumn(c, flatCols)
    case v1.EqualTo(a, v) => qa(a, flatCols) === lit(v)
    case v1.EqualNullSafe(a, v) => qa(a, flatCols) <=> lit(v)
    case v1.GreaterThan(a, v) => qa(a, flatCols) > lit(v)
    case v1.GreaterThanOrEqual(a, v) => qa(a, flatCols) >= lit(v)
    case v1.LessThan(a, v) => qa(a, flatCols) < lit(v)
    case v1.LessThanOrEqual(a, v) => qa(a, flatCols) <= lit(v)
    case v1.In(a, vs) => qa(a, flatCols).isin(vs.toIndexedSeq: _*)
    case v1.IsNull(a) => qa(a, flatCols).isNull
    case v1.IsNotNull(a) => qa(a, flatCols).isNotNull
    case v1.StringStartsWith(a, p) => qa(a, flatCols).startsWith(p)
    case v1.StringEndsWith(a, p) => qa(a, flatCols).endsWith(p)
    case v1.StringContains(a, p) => qa(a, flatCols).contains(p)
    case other => throw new IllegalArgumentException(
      s"DELETE condition $other is not supported by the lance connector")
  }

  // --------------------------------------------------------------- DELETE

  /** Delete rows where `cond` is TRUE (SQL semantics: NULL keeps the row).
    * No-op — no new version — when nothing matches.
    *
    * Two-sided stats scoping: [[FragmentStats.prune]] (mayMatch) narrows
    * to fragments that MAY hold matches, then [[FragmentStats.mustMatch]]
    * splits those into fully-covered fragments — every row provably
    * matches — and boundary fragments. Covered fragments are dropped from
    * the manifest WITHOUT being read; only boundary fragments with actual
    * matches are rewritten. A retention delete (`ts < cutoff`) on a
    * clustered 100 TB table thus costs one metadata commit plus at most
    * two boundary-fragment rewrites — the same shape as Delta/Iceberg
    * partition-level deletes, derived here from column stats instead of
    * partition values.
    */
  /** The shared DELETE/replaceWhere condition scoping: candidates from
    * the full skipping stack (stats, scalar postings, bucket placement),
    * split into COVERED (every row provably matches — droppable without
    * a read; sound only when the V1 filters are exactly `cond`) and
    * boundary, with matches attributed per fragment so clean boundary
    * candidates carry by reference. One helper — the two verbs must
    * never silently diverge on this logic. */
  private case class CondScope(candidates: Seq[FragmentMeta],
      covered: Seq[FragmentMeta], touched: Seq[FragmentMeta],
      boundaryMatched: Long) {
    def coveredRows: Long = covered.map(_.rowCount).sum
    def matched: Long = coveredRows + boundaryMatched
  }

  private def scopeByCondition(spark: SparkSession, path: String,
      root: Path, m: Manifest, cond: Column): CondScope = {
    val table = spark.read.format("lance").load(path)
    val (filters, complete) = pruneFiltersFull(table, cond)
    val cands = graft.format.BucketPrune.prune(m, filters.toSeq,
      graft.index.ScalarIndex.prune(spark, path, m, filters.toSeq,
        FragmentStats.prune(m.schema, m.fragments, filters)))
    val (covered, boundary) =
      if (complete && filters.nonEmpty)
        cands.partition(f => f.stats.exists(st =>
          filters.forall(FragmentStats.mustMatch(m.schema, f.rowCount, st, _))))
      else (Seq.empty[FragmentMeta], cands)
    val perFile =
      if (boundary.isEmpty) Map.empty[String, Long]
      else matchesByFile(readFragments(spark, root, m, boundary)
        .withColumn("__f", input_file_name()).filter(cond))
    CondScope(cands, covered,
      boundary.filter(f => perFile.contains(nameOf(f))), perFile.values.sum)
  }

  def deleteWhere(spark: SparkSession, path: String, cond: Column): RowLevelResult = {
    val (fs, root, m) = snapshot(spark, path)
    val refreshKinds = dmlRefreshKinds(spark)
    val scope = scopeByCondition(spark, path, root, m, cond)
    if (scope.candidates.isEmpty)
      return RowLevelResult(m.fragments.size, 0, 0L, 0L, None)
    val covered = scope.covered
    val touched = scope.touched
    val matched = scope.matched
    if (matched == 0L)
      return RowLevelResult(m.fragments.size, scope.candidates.size, 0L, 0L, None)
    if (scope.boundaryMatched > 0L) {
      // opt-in row-level CDF: the deleted images are the covered
      // fragments' every row plus the touched fragments' matching rows —
      // without them the feed would amplify the rewrite into
      // whole-fragment delete+insert pairs
      val cdf = if (!cdfEnabled(spark)) Seq.empty else {
        val touchedDel = readFragments(spark, root, m, touched)
          .filter(coalesce(cond, lit(false)))
        val deleted =
          if (covered.isEmpty) touchedDel
          else readFragments(spark, root, m, covered).unionByName(touchedDel)
        stageChangeFiles(spark, fs, root, m, Seq("delete" -> deleted))
      }
      // touched survivors rewritten; covered fragments ride the same
      // commit as pure removals (their ids are replaced by nothing)
      withChangeFiles(readFragments(spark, root, m, touched)
        .filter(!coalesce(cond, lit(false)))
        .write.format("lance")
        .option("write.replace-fragments", (covered ++ touched).map(_.id).mkString(",")),
        cdf)
        .mode("append").save(path)
    } else {
      // every matching row lives in fully-covered fragments: one manifest
      // commit, zero data files read or written — and zero CDF files:
      // the fragment diff (removed files, nothing added) IS the exact
      // row-level delete feed for this commit shape
      LanceFormat.commitReplace(fs, root, m.schema, covered.map(_.id).toSet, Seq.empty)
    }
    maybeRefreshIndexes(refreshKinds, path)
    RowLevelResult(m.fragments.size, scope.candidates.size, matched, 0L,
      LanceFormat.readLatest(fs, root).map(_.version))
  }

  def deleteWhere(spark: SparkSession, path: String, condition: String): RowLevelResult =
    deleteWhere(spark, path, expr(condition))

  // --------------------------------------------------------- replaceWhere

  /** Predicate-scoped overwrite (Delta's `replaceWhere`) — the BACKFILL
    * primitive: atomically replace exactly the rows matching `cond` with
    * `data`, in one commit. Re-running a day's pipeline overwrites that
    * day and nothing else; readers see either the old day or the new
    * one, never a gap or a mix.
    *
    * Semantics match Delta's strict mode: every incoming row must
    * satisfy `cond` (a backfill that writes outside its declared range
    * is a bug caught HERE, not corruption discovered later). Scale
    * shape: candidates prune through stats/postings/buckets like every
    * DML verb, matches attribute per fragment via the match scan, and
    * only match-holding fragments rewrite — a one-day backfill on a
    * time-clustered 100 TB table rewrites that day's fragments plus an
    * append, one manifest commit.
    */
  def replaceWhere(spark: SparkSession, path: String, cond: Column,
      data: DataFrame): RowLevelResult = {
    val (fs, root, m) = snapshot(spark, path)
    val refreshKinds = dmlRefreshKinds(spark)
    val tableCols = m.schema.fieldNames.toSeq
    // case-INSENSITIVE source resolution, Spark's own default posture
    val byLower = data.columns.groupBy(_.toLowerCase)
    val src = data.select(tableCols.map { c =>
      byLower.get(c.toLowerCase) match {
        case Some(Array(one)) => col(s"`$one`").as(c)
        case Some(many) => throw new IllegalArgumentException(
          s"replaceWhere data has ambiguous columns ${many.mkString(", ")} for '$c'")
        case None => throw new IllegalArgumentException(
          s"replaceWhere data is missing table column '$c' (select every table column)")
      }
    }: _*)
      // PIN the source: the strict-range probe, the count, and the write
      // must see the SAME rows, or a non-deterministic source could pass
      // the probe and still write outside its range
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // strict range check BEFORE any commit: rows outside cond refuse
      val outside = src.filter(!coalesce(cond, lit(false))).limit(1).collect()
      require(outside.isEmpty,
        s"replaceWhere: incoming row ${outside.headOption.getOrElse("")} does not " +
          "satisfy the predicate - a backfill must stay inside its declared range")
      val inserted = src.count()
      val scope = scopeByCondition(spark, path, root, m, cond)
      val removed = scope.matched
      val replaceIds = (scope.covered ++ scope.touched).map(_.id)
      if (replaceIds.isEmpty) {
        // nothing matches (a NEW day's first run): a scoped overwrite of
        // an empty range is a plain insert, Delta parity — and the
        // append's fragment diff is already the exact insert feed
        src.write.format("lance").mode("append").save(path)
      } else {
        // opt-in row-level CDF: the replaced rows (covered fragments
        // whole + touched fragments' matches) are deletes, the incoming
        // batch is inserts
        val cdf = if (!cdfEnabled(spark)) Seq.empty else {
          val touchedDel =
            if (scope.touched.isEmpty) src.limit(0)
            else readFragments(spark, root, m, scope.touched)
              .filter(coalesce(cond, lit(false)))
          val deleted =
            if (scope.covered.isEmpty) touchedDel
            else readFragments(spark, root, m, scope.covered).unionByName(touchedDel)
          stageChangeFiles(spark, fs, root, m,
            Seq("delete" -> deleted, "insert" -> src))
        }
        val remainder =
          if (scope.touched.isEmpty) src.limit(0)
          else readFragments(spark, root, m, scope.touched)
            .filter(!coalesce(cond, lit(false)))
        withChangeFiles(remainder.unionByName(src)
          .write.format("lance")
          .option("write.replace-fragments", replaceIds.mkString(",")),
          cdf)
          .mode("append").save(path)
      }
      maybeRefreshIndexes(refreshKinds, path)
      RowLevelResult(m.fragments.size, scope.candidates.size, removed, inserted,
        LanceFormat.readLatest(fs, root).map(_.version))
    } finally src.unpersist()
  }

  // --------------------------------------------------------------- UPDATE

  /** Update rows where `cond` is TRUE: each assignment's expression is
    * cast back to the column's declared type (UPDATE never mutates the
    * schema). Assignments see the PRE-update row (standard SQL UPDATE:
    * `SET a = b, b = a` swaps).
    */
  def updateWhere(spark: SparkSession, path: String, cond: Column,
      assignments: Seq[(String, Column)]): RowLevelResult = {
    val (fs, root, m) = snapshot(spark, path)
    val refreshKinds = dmlRefreshKinds(spark)
    require(assignments.nonEmpty, "UPDATE needs at least one assignment")
    assignments.foreach { case (c, _) =>
      require(m.schema.fieldNames.contains(c), s"no column '$c' in $path")
    }
    val table = spark.read.format("lance").load(path)
    val updFilters = pruneFilters(table, cond).toSeq
    val cands = graft.format.BucketPrune.prune(m, updFilters,
      graft.index.ScalarIndex.prune(spark, path, m, updFilters,
        FragmentStats.prune(m.schema, m.fragments, updFilters.toArray)))
    if (cands.isEmpty) return RowLevelResult(m.fragments.size, 0, 0L, 0L, None)
    val perFile = matchesByFile(readFragments(spark, root, m, cands)
      .withColumn("__f", input_file_name()).filter(cond))
    val matched = perFile.values.sum
    if (matched == 0L) return RowLevelResult(m.fragments.size, cands.size, 0L, 0L, None)
    // rewrite only the fragments holding matches; clean candidates ride
    val touched = cands.filter(f => perFile.contains(nameOf(f)))
    val condSafe = coalesce(cond, lit(false))
    // one select evaluates every assignment against the original row
    val out = m.schema.fields.map { f =>
      assignments.find(_._1 == f.name) match {
        case Some((_, e)) => when(condSafe, e.cast(f.dataType)).otherwise(q(f.name)).as(f.name)
        case None => q(f.name)
      }
    }
    // opt-in row-level CDF: pre-image = the matching rows as stored,
    // post-image = the same rows through the assignments (Delta CDF's
    // update_preimage/update_postimage contract)
    val cdf = if (!cdfEnabled(spark)) Seq.empty else {
      // ONE scan of the touched fragments emits BOTH images: each matching
      // row explodes into its as-stored pre-image and its through-the-
      // assignments post-image (content identical to two separate passes;
      // at scale this halves the CDF read I/O of an update)
      val matchedRows = readFragments(spark, root, m, touched).filter(condSafe)
      val preS = struct(m.schema.fields.toSeq.map(f => q(f.name).as(f.name)): _*)
      val postS = struct(m.schema.fields.toSeq.map { f =>
        assignments.find(_._1 == f.name) match {
          case Some((_, e)) => e.cast(f.dataType).as(f.name)
          case None => q(f.name)
        }
      }: _*)
      val tagged = matchedRows.select(explode(array(
        struct(preS.as("__row"), lit("update_preimage").as("__cdf_kind")),
        struct(postS.as("__row"), lit("update_postimage").as("__cdf_kind"))
      )).as("__e"))
        .select(m.schema.fields.toSeq.map(f =>
          col("__e").getField("__row").getField(f.name)
            .as(m.physicalName(f.name))) :+
          col("__e").getField("__cdf_kind").as("__cdf_kind"): _*)
      stageTagged(spark, fs, root, tagged,
        Seq("update_preimage", "update_postimage"))
    }
    withChangeFiles(
      readFragments(spark, root, m, touched).select(out.toIndexedSeq: _*)
        .write.format("lance")
        .option("write.replace-fragments", touched.map(_.id).mkString(",")),
      cdf)
      .mode("append").save(path)
    maybeRefreshIndexes(refreshKinds, path)
    RowLevelResult(m.fragments.size, cands.size, matched, 0L,
      LanceFormat.readLatest(fs, root).map(_.version))
  }

  def updateWhere(spark: SparkSession, path: String, condition: String,
      set: Map[String, String]): RowLevelResult =
    updateWhere(spark, path, expr(condition),
      set.toSeq.map { case (c, e) => c -> expr(e) })

  // ---------------------------------------------------------------- MERGE

  /** MERGE (upsert form): target rows whose `keys` match a source row are
    * replaced by that source row; unmatched source rows are inserted;
    * everything else is untouched. The dominant MERGE shape (CDC apply,
    * dimension refresh, dedup keep-list application); conditional
    * matched/not-matched clauses compose from [[deleteWhere]]/
    * [[updateWhere]] when needed.
    *
    * Scale shape: candidates are pruned by the SOURCE's per-key min/max
    * (one small aggregate) — a CDC batch touching recent keys rewrites
    * only the fragments covering them. The source is the small side of
    * both joins (broadcast under AQE); matches can only live in candidate
    * fragments, by the pruning contract.
    */
  def upsert(spark: SparkSession, path: String, source0: DataFrame,
      keys: Seq[String]): RowLevelResult = {
    val (fs, root, m) = snapshot(spark, path)
    val refreshKinds = dmlRefreshKinds(spark)
    require(keys.nonEmpty, "MERGE needs at least one key column")
    val tableCols = m.schema.fieldNames.toSeq
    keys.foreach(k => require(tableCols.contains(k), s"no key column '$k' in $path"))
    keys.foreach(k => require(source0.columns.contains(k), s"no key column '$k' in source"))
    tableCols.foreach { c =>
      require(source0.columns.contains(c),
        s"MERGE source is missing table column '$c' (select every table column)")
      require(source0.schema(c).dataType == m.schema(c).dataType,
        s"MERGE source column '$c' is ${source0.schema(c).dataType.simpleString} but the " +
          s"table has ${m.schema(c).dataType.simpleString}; cast the source first")
    }
    val source = source0.select(tableCols.map(q): _*)

    // ONE job over the (small) source: row count, dup check AND the
    // exact key IN-lists, from a per-key HASH aggregate collected up to
    // inlistPrune+1 rows (map-side partial aggregation, shuffle ∝
    // distinct keys, no sort — the former count().over(partitionBy)
    // window sorted the whole source twice per MERGE, guide §2.3/§2.4;
    // and the former separate distinct-collect job for the IN-lists is
    // folded in, guide §1.2). A fully-non-null duplicate key tuple is a
    // cardinality violation (one target row would match two source
    // rows); null-keyed rows never match anything — plain inserts,
    // however many. Above the cap, one fallback aggregate computes the
    // global stats + per-key range bounds as before.
    val inListCap = spark.conf.getOption("spark.graft.dml.inlistPrune")
      .map(_.toInt).getOrElse(1000)
    val perKey = source.select(keys.map(q): _*)
      .groupBy(keys.map(q): _*)
      .agg(count(lit(1)).as("__cnt"))
      .limit(inListCap + 1).collect()
    val (srcRows, maxDup, keyBounds: Array[v1.Filter]) =
      if (perKey.length <= inListCap) {
        val n = perKey.map(_.getAs[Long]("__cnt")).sum
        val dup = (1L +: perKey.toSeq.collect {
          case r if keys.indices.forall(i => !r.isNullAt(i)) =>
            r.getAs[Long]("__cnt")
        }).max
        val bounds: Array[v1.Filter] = keys.zipWithIndex.map { case (k, i) =>
          val vals = perKey.map(_.get(i)).filter(_ != null).distinct.toSeq
          if (vals.isEmpty) v1.AlwaysFalse() // all NULL: no match possible
          else v1.In(k, vals.toArray)
        }.toArray
        (n, dup, bounds)
      } else {
        val aggCols = Seq(sum(col("__cnt")).as("__n"),
          max(when(keys.map(q(_).isNotNull).reduce(_ && _), col("__cnt"))
            .otherwise(lit(1L))).as("__maxdup")) ++
          keys.flatMap(k => Seq(min(q(s"__mn_$k")).as(s"__mn_$k"),
            max(q(s"__mx_$k")).as(s"__mx_$k")))
        val stats = source.select(keys.map(q): _*)
          .groupBy(keys.map(q): _*)
          .agg(count(lit(1)).as("__cnt"),
            keys.flatMap(k => Seq(min(q(k)).as(s"__mn_$k"),
              max(q(k)).as(s"__mx_$k"))): _*)
          .agg(aggCols.head, aggCols.tail: _*).collect()(0)
        val bounds: Array[v1.Filter] = keys.flatMap { k =>
          (Option(stats.getAs[Any](s"__mn_$k")),
            Option(stats.getAs[Any](s"__mx_$k"))) match {
            case (Some(mn), Some(mx)) =>
              Seq(v1.GreaterThanOrEqual(k, mn), v1.LessThanOrEqual(k, mx))
            case _ => Seq(v1.AlwaysFalse()) // every source key is NULL
          }
        }.toArray
        (stats.getAs[Long]("__n"), stats.getAs[Long]("__maxdup"), bounds)
      }
    if (srcRows == 0L) return RowLevelResult(m.fragments.size, 0, 0L, 0L, None)
    require(maxDup == 1L,
      "MERGE source has duplicate keys: each target row would match more " +
        "than one source row (nondeterministic); de-duplicate the source first")
    val cands = graft.format.BucketPrune.prune(m, keyBounds.toSeq,
      graft.index.ScalarIndex.prune(spark, path, m, keyBounds.toSeq,
        FragmentStats.prune(m.schema, m.fragments, keyBounds)))

    if (cands.isEmpty) {
      // no fragment can hold a matching key: pure insert
      source.write.format("lance").mode("append").save(path)
      maybeRefreshIndexes(refreshKinds, path)
      return RowLevelResult(m.fragments.size, 0, 0L, srcRows,
        LanceFormat.readLatest(fs, root).map(_.version))
    }
    val perFile = matchesByFile(readFragments(spark, root, m, cands)
      .withColumn("__f", input_file_name()).join(source, keys, "left_semi"))
    val matched = perFile.values.sum
    // only fragments holding matched keys rewrite; every other candidate
    // rides by reference and unmatched source rows append alongside
    val touched = cands.filter(f => perFile.contains(nameOf(f)))
    if (touched.isEmpty) {
      // pure insert: the append's fragment diff IS the exact insert feed
      source.write.format("lance").mode("append").save(path)
    } else {
      // opt-in row-level CDF: matched target rows are update pre-images,
      // their source replacements post-images, unmatched source = inserts
      val cdf = if (!cdfEnabled(spark)) Seq.empty else {
        val target = readFragments(spark, root, m, touched)
        val pre = target.join(source, keys, "left_semi")
        val matchedKeys = target.select(keys.map(q): _*).distinct()
        val post = source.join(matchedKeys, keys, "left_semi")
        val ins = source.join(matchedKeys, keys, "left_anti")
        stageChangeFiles(spark, fs, root, m, Seq(
          "update_preimage" -> pre, "update_postimage" -> post,
          "insert" -> ins))
      }
      withChangeFiles(
        readFragments(spark, root, m, touched).join(source, keys, "left_anti")
          .unionByName(source)
          .write.format("lance")
          .option("write.replace-fragments", touched.map(_.id).mkString(",")),
        cdf)
        .mode("append").save(path)
    }
    maybeRefreshIndexes(refreshKinds, path)
    RowLevelResult(m.fragments.size, cands.size, matched, srcRows - matched,
      LanceFormat.readLatest(fs, root).map(_.version))
  }

  /** CDC APPLY (the Delta `foreachBatch`-merge-with-deletes shape): ONE
    * atomic commit that applies keyed UPSERTS and keyed DELETES together
    * — `MERGE ... WHEN MATCHED AND del THEN DELETE / WHEN MATCHED THEN
    * UPDATE / WHEN NOT MATCHED THEN INSERT`. `deleteWhen` evaluates per
    * SOURCE row (e.g. `col("_change_type") === "delete"`; NULL reads as
    * false): delete rows remove their key's target row (absent key =
    * no-op, so replays are idempotent), the rest update matches and
    * insert the remainder. The whole batch lands as one manifest
    * version — a crash can never publish the deletes without the
    * upserts. Delete rows' non-key columns are ignored (only the key
    * routes them), but the source must still carry every table column.
    *
    * `setProperties` rides the SAME commit (`write.set-properties`):
    * [[graft.operators.MaterializedView]] stores its source-version
    * watermark through this, which is what makes an incremental refresh
    * exactly-once — delta and watermark can never separate.
    *
    * Scale: [[upsert]]'s pruning verbatim — exact IN-lists for small
    * batches (`spark.graft.dml.inlistPrune`), per-key bounds above it;
    * only fragments HOLDING matching keys rewrite. Cost ∝ matched
    * fragments + batch, never the table. Opt-in CDF images
    * (`spark.graft.dml.changeFeed`): delete / update_preimage /
    * update_postimage / insert, exact like the other verbs.
    *
    * `guard`: (predicate, message) over SOURCE rows that must match NO
    * row — verified inside the same source-stats job (one pass, before
    * any commit) and failed with the message. The MV refresh's
    * negative-group-count invariant rides here instead of paying its
    * own filter+count pass over the merged state.
    */
  def applyChanges(spark: SparkSession, path: String, source0: DataFrame,
      keys: Seq[String], deleteWhen: Column,
      setProperties: Map[String, String] = Map.empty,
      requireProperties: Map[String, String] = Map.empty,
      guard: Option[(Column, String)] = None): RowLevelResult = {
    val (fs, root, m) = snapshot(spark, path)
    val refreshKinds = dmlRefreshKinds(spark)
    require(keys.nonEmpty, "applyChanges needs at least one key column")
    val tableCols = m.schema.fieldNames.toSeq
    keys.foreach(k => require(tableCols.contains(k), s"no key column '$k' in $path"))
    tableCols.foreach { c =>
      require(source0.columns.contains(c),
        s"applyChanges source is missing table column '$c' (select every table column)")
      require(source0.schema(c).dataType == m.schema(c).dataType,
        s"applyChanges source column '$c' is ${source0.schema(c).dataType.simpleString} " +
          s"but the table has ${m.schema(c).dataType.simpleString}; cast the source first")
    }
    val source = source0
      .withColumn("__del", coalesce(deleteWhen, lit(false)))
      .select((tableCols.map(q) :+ col("__del")): _*)

    // ONE job over the (small) source covers the row counts, the
    // dup/null guards, the caller's guard predicate AND the exact
    // per-key IN-lists: the per-key HASH aggregate (map-side partial,
    // shuffle ∝ distinct keys, no sort) is collected up to
    // inlistPrune+1 rows. At or under the cap — the CDC batch / MV
    // refresh norm — every global stat derives driver-side from the
    // complete group list, so the former separate distinct-collect job
    // disappears (guide §1.2). Above it, one fallback aggregate
    // computes the global stats + per-key range bounds as before.
    // A key may appear ONCE across the whole batch — a delete and an
    // upsert for the same key (or two upserts) is ambiguous; callers
    // collapse their feed to net-effect-per-key first.
    val inListCap = spark.conf.getOption("spark.graft.dml.inlistPrune")
      .map(_.toInt).getOrElse(1000)
    val guardCol = guard.map { case (g, _) => coalesce(g, lit(false)) }
    val statsSrc = source0
      .withColumn("__del", coalesce(deleteWhen, lit(false)))
      .select(keys.map(q) ++ Seq(col("__del")) ++
        guardCol.map(_.as("__guard")).toSeq: _*)
    val perKeyAggs = Seq(count(lit(1)).as("__cnt"),
      sum(when(col("__del"), 1L).otherwise(0L)).as("__cntdel")) ++
      guardCol.map(_ =>
        max(when(col("__guard"), 1L).otherwise(0L)).as("__g")).toSeq
    val perKey = statsSrc.groupBy(keys.map(q): _*)
      .agg(perKeyAggs.head, perKeyAggs.tail: _*)
      .limit(inListCap + 1).collect()
    val (srcRows, delRows, maxDup, nullKey, guardHit,
        keyBounds: Array[v1.Filter]) =
      if (perKey.length <= inListCap) {
        // the collected rows are ALL the groups: derive everything here
        val n = perKey.map(_.getAs[Long]("__cnt")).sum
        val ndel = perKey.map(_.getAs[Long]("__cntdel")).sum
        val dup = (1L +: perKey.toSeq.collect {
          case r if keys.indices.forall(i => !r.isNullAt(i)) =>
            r.getAs[Long]("__cnt")
        }).max
        val nk = perKey.exists(r => keys.indices.exists(r.isNullAt))
        val g = guard.isDefined && perKey.exists(_.getAs[Long]("__g") > 0L)
        val bounds: Array[v1.Filter] = keys.zipWithIndex.map { case (k, i) =>
          val vals = perKey.map(_.get(i)).filter(_ != null).distinct.toSeq
          if (vals.isEmpty) v1.AlwaysFalse() // all NULL: no match possible
          else v1.In(k, vals.toArray)
        }.toArray
        (n, ndel, dup, nk, g, bounds)
      } else {
        // > cap distinct keys: global stats + per-key bounds in one
        // two-level aggregate (the prior shape), range bounds for pruning
        val aggCols = Seq(sum(col("__cnt")).as("__n"),
          sum(col("__cntdel")).as("__ndel"),
          max(when(keys.map(q(_).isNotNull).reduce(_ && _), col("__cnt"))
            .otherwise(lit(1L))).as("__maxdup"),
          max(when(keys.map(q(_).isNull).reduce(_ || _), 1L).otherwise(0L))
            .as("__nullkey")) ++
          guardCol.map(_ => max(col("__g")).as("__gmax")).toSeq ++
          keys.flatMap(k => Seq(min(q(s"__mn_$k")).as(s"__mn_$k"),
            max(q(s"__mx_$k")).as(s"__mx_$k")))
        val stats = statsSrc
          .groupBy(keys.map(q): _*)
          .agg(count(lit(1)).as("__cnt"),
            Seq(sum(when(col("__del"), 1L).otherwise(0L)).as("__cntdel")) ++
            guardCol.map(_ =>
              max(when(col("__guard"), 1L).otherwise(0L)).as("__g")).toSeq ++
            keys.flatMap(k => Seq(min(q(k)).as(s"__mn_$k"),
              max(q(k)).as(s"__mx_$k"))): _*)
          .agg(aggCols.head, aggCols.tail: _*).collect()(0)
        val bounds: Array[v1.Filter] = keys.flatMap { k =>
          (Option(stats.getAs[Any](s"__mn_$k")),
            Option(stats.getAs[Any](s"__mx_$k"))) match {
            case (Some(mn), Some(mx)) =>
              Seq(v1.GreaterThanOrEqual(k, mn), v1.LessThanOrEqual(k, mx))
            case _ => Seq(v1.AlwaysFalse())
          }
        }.toArray
        (stats.getAs[Long]("__n"), stats.getAs[Long]("__ndel"),
          stats.getAs[Long]("__maxdup"), stats.getAs[Long]("__nullkey") > 0L,
          guard.isDefined && stats.getAs[Long]("__gmax") > 0L, bounds)
      }
    // the caller's guard fires FIRST (it rode the same job): a violated
    // invariant must fail with ITS message, before the key-shape checks
    guard.foreach { case (_, msg) => require(!guardHit, msg) }
    // metadata-only commit shape, CAS included: the mutate function
    // re-checks per retry against the re-read current map
    def commitPropsOnly(): Unit =
      LanceFormat.commitPropertiesWith(fs, root, { prev =>
        requireProperties.foreach { case (k, v) =>
          if (!prev.get(k).contains(v))
            throw new java.util.ConcurrentModificationException(
              s"required property $k=$v does not hold at $path - the " +
                "watermark moved under this commit; re-derive and re-run")
        }
        val (unsets, sets) = setProperties.partition(_._2 == null)
        prev -- unsets.keys ++ sets
      })
    if (srcRows == 0L) {
      if (setProperties.nonEmpty) commitPropsOnly()
      return RowLevelResult(m.fragments.size, 0, 0L, 0L,
        LanceFormat.readLatest(fs, root).map(_.version))
    }
    val upsRows = srcRows - delRows
    require(maxDup == 1L,
      "applyChanges source has duplicate keys: collapse the change feed " +
        "to one net row per key first (a delete+insert pair for the same " +
        "key is ambiguous within one batch)")
    require(!nullKey,
      "applyChanges source has NULL in a key column: key joins drop " +
        "NULLs, so a null-keyed delete would silently no-op and a " +
        "null-keyed upsert would always insert - fix the feed's keys")
    val cands = graft.format.BucketPrune.prune(m, keyBounds.toSeq,
      graft.index.ScalarIndex.prune(spark, path, m, keyBounds.toSeq,
        FragmentStats.prune(m.schema, m.fragments, keyBounds)))

    val ups = source.filter(!col("__del")).drop("__del")
    def withPropOpts(w: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row]) = {
      val w1 = if (setProperties.isEmpty) w
        else w.option("write.set-properties",
          LanceFormat.serializeProperties(setProperties))
      if (requireProperties.isEmpty) w1
      else w1.option("write.require-properties",
        LanceFormat.serializeProperties(requireProperties))
    }
    def pureInsert(): RowLevelResult = {
      if (upsRows > 0) {
        withPropOpts(ups.write.format("lance").mode("append")).save(path)
      } else if (setProperties.nonEmpty) commitPropsOnly()
      maybeRefreshIndexes(refreshKinds, path)
      RowLevelResult(m.fragments.size, cands.size, 0L, upsRows,
        LanceFormat.readLatest(fs, root).map(_.version))
    }
    if (cands.isEmpty) return pureInsert()

    // candidate-scoped match discovery, the upsert shape (left-semi keeps
    // input_file_name on the streamed fragment side): total matches per
    // file, plus the delete-matched subset
    val dels = source.filter(col("__del")).drop("__del")
    val withF = readFragments(spark, root, m, cands)
      .withColumn("__f", input_file_name())
    // ONE match-discovery job for total AND delete-matched counts: source
    // keys are unique (the dup guard above), so an inner join against the
    // keyed __del flag hits each matching target row exactly once — the
    // same multiset the two left_semi probes saw, one pass instead of two
    val matchRows = withF.select((keys.map(q) :+ col("__f")): _*)
      .join(source.select((keys.map(q) :+ col("__del")): _*), keys)
      .groupBy(col("__f"))
      .agg(count(lit(1)).as("__all"),
        sum(when(col("__del"), 1L).otherwise(0L)).as("__ndel"))
      .collect()
    val perFile = matchRows.map { r =>
      val p = r.getAs[String]("__f")
      p.substring(p.lastIndexOf('/') + 1) -> r.getAs[Long]("__all")
    }.toMap
    val matched = perFile.values.sum
    val matchedDel = matchRows.map(_.getAs[Long]("__ndel")).sum
    val matchedUps = matched - matchedDel
    val touched = cands.filter(f => perFile.contains(nameOf(f)))
    if (touched.isEmpty) return pureInsert()
    val cdf = if (!cdfEnabled(spark)) Seq.empty else {
      val target = readFragments(spark, root, m, touched)
      val delMatched = target.join(dels, keys, "left_semi")
      val pre = target.join(ups, keys, "left_semi")
      val upsMatchedKeys = target.join(ups, keys, "left_semi")
        .select(keys.map(q): _*).distinct()
      val post = ups.join(upsMatchedKeys, keys, "left_semi")
      val ins = ups.join(target.select(keys.map(q): _*).distinct(),
        keys, "left_anti")
      stageChangeFiles(spark, fs, root, m, Seq(
        "delete" -> delMatched,
        "update_preimage" -> pre, "update_postimage" -> post,
        "insert" -> ins))
    }
    withPropOpts(withChangeFiles(
      readFragments(spark, root, m, touched)
        .join(source.select(keys.map(q): _*), keys, "left_anti")
        .unionByName(ups)
        .write.format("lance")
        .option("write.replace-fragments", touched.map(_.id).mkString(",")),
      cdf))
      .mode("append").save(path)
    maybeRefreshIndexes(refreshKinds, path)
    RowLevelResult(m.fragments.size, cands.size, matched, upsRows - matchedUps,
      LanceFormat.readLatest(fs, root).map(_.version))
  }
}
