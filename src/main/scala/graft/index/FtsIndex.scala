package graft.index

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s.NoTypeHints
import org.json4s.jackson.Serialization

/** Full-text search over a string column: a persisted inverted index +
  * BM25 ranking — the scalar-index sibling of [[IvfIndex]].
  *
  * The Lance format ships an INVERTED scalar index servicing full-text
  * queries next to its vector indexes; the reference connector surfaces
  * only the vector side (`ref:LanceIndexBuilder.java:117-152` builds
  * IVF_* indexes, nothing textual), so text search at corpus scale is a
  * gap a reference user hits immediately on any mixed retrieval
  * workload. This module closes it Spark-first.
  *
  * Layout v2 under `<dataset>/_indices/<column>_fts/`:
  *   - `postings/bucket=B/` — parquet rows `(term, doc id, tf, dl)`,
  *     DIRECTORY-partitioned by `bucket = pmod(xxhash64(term), P)` and
  *     SORTED by (term, doc) within each bucket's file. A query for T
  *     terms prunes to ≤ T bucket DIRECTORIES (true partition pruning,
  *     visible in the scan's PartitionFilters), and inside each file
  *     parquet row-group min/max on the sorted `term` column skips
  *     everything but the probed posting lists. The document length `dl`
  *     is DENORMALIZED into each posting so scoring never joins a
  *     doc-table side: at 100 TB that join would shuffle the corpus;
  *     here the only data read are the query terms' posting rows.
  *   - `fts.json` — corpus stats (`numDocs`, `sumDl`), tokenizer id +
  *     build lineage. (v1 indexes — flat hash-partitioned files, no
  *     bucket dirs — are still searchable; refresh upgrades them by
  *     rebuilding.)
  *
  * Scale contract: build is one explode + one hash aggregation (partial
  * combine on (term, doc)) + one repartition-by-bucket write — linear, no
  * driver materialization. REFRESH after appends is delta-only (the v34
  * pattern on the text side): only the appended fragments are tokenized,
  * and only the bucket directories their terms hash into are merged
  * (per-bucket union + re-sort, staged then swapped) — untouched buckets
  * are never read or written. Non-append history (row-level DML,
  * compaction) falls back to a full rebuild with a warning. Search reads
  * only probed posting lists (bucket dirs pruned, `term IN (...)` pushed
  * — the plan shows both), broadcasts the per-term document frequencies
  * (≤ #query terms rows), aggregates scores by doc id (narrow: candidate
  * rows only), and takes top-k via TakeOrderedAndProject (no global
  * sort).
  *
  * Determinism contract (gates t40, t43, t44): each per-term contribution
  * is cast to DECIMAL(18,6) before the per-doc sum, making the sum
  * order-insensitive and absorbing any 1-ulp `ln` difference between
  * engines; ties in the rounded score break by doc id.
  */
object FtsIndex {
  private implicit val fmts: org.json4s.Formats = Serialization.formats(NoTypeHints)
  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.FtsIndex")

  /** Reference-shaped BM25 constants (Robertson k1/b; Lucene's defaults). */
  val K1 = 1.2
  val B = 0.75

  case class FtsMeta(column: String, idColumn: String, numDocs: Long,
    sumDl: Long, numTermPartitions: Int,
    datasetVersion: Option[Long] = None,
    formatVersion: Option[Int] = None,
    tokenizer: Option[String] = None,
    buildId: Option[String] = None,
    positions: Option[Boolean] = None)

  val CurrentFormatVersion = 2

  def indexPath(datasetPath: String, column: String): String =
    s"$datasetPath/_indices/${column}_fts"

  private def postingsPath(ip: String) = s"$ip/postings"
  private def metaPath(ip: String) = new Path(s"$ip/fts.json")

  // ------------------------------------------------------------ tokenizer

  /** The pluggable tokenizer, shared by build, search, and the SQL
    * oracles ([[duckdbTokens]] emits the DuckDB-side twin so a gate's
    * oracle cannot drift from the engine).
    *
    *   - `space` (default): split on single spaces — the corpus contract
    *     of the TESTDATA documents and the rest of the text operators
    *     ([[graft.operators.TextAnalysis]]).
    *   - `unicode`: lowercase, split on runs of non-letter/non-digit
    *     (`[^\p{L}\p{N}]+` — the Java/RE2 dialect intersection, so Spark
    *     and DuckDB classify identically), drop empties. Handles
    *     punctuation, case, and accented text.
    *
    * The tokenizer id is stamped into the index meta at build time;
    * search always tokenizes the query with the INDEX's tokenizer.
    */
  def sparkTokens(c: Column, mode: String): Column = mode match {
    case "space" => split(c, " ")
    case "unicode" =>
      filter(split(lower(c), "[^\\p{L}\\p{N}]+"), w => w =!= "")
    case other => throw new IllegalArgumentException(
      s"unknown tokenizer '$other' (supported: space, unicode)")
  }

  /** Query-side twin of [[sparkTokens]] (driver Scala). */
  def scalaTokens(text: String, mode: String): Seq[String] = mode match {
    case "space" => text.split(" ").toSeq.filter(_.nonEmpty)
    case "unicode" =>
      text.toLowerCase(java.util.Locale.ROOT)
        .split("[^\\p{L}\\p{N}]+").toSeq.filter(_.nonEmpty)
    case other => throw new IllegalArgumentException(
      s"unknown tokenizer '$other' (supported: space, unicode)")
  }

  /** Oracle-side twin of [[sparkTokens]]: a DuckDB SQL expression
    * producing the same token list from the SQL expression `c`. */
  def duckdbTokens(c: String, mode: String): String = mode match {
    case "space" => s"string_split($c, ' ')"
    case "unicode" =>
      s"list_filter(string_split_regex(lower($c), '[^\\p{L}\\p{N}]+'), w -> w <> '')"
    case other => throw new IllegalArgumentException(
      s"unknown tokenizer '$other' (supported: space, unicode)")
  }

  /** Escape a term for embedding in an `expr(...)` string literal. */
  private def sqlLit(s: String): String =
    s.replace("\\", "\\\\").replace("'", "\\'")

  /** Driver-side bucket of a term — MUST match the executor-side
    * `pmod(xxhash64(term), P)` used at build time (both are Catalyst
    * XxHash64, seed 42). */
  private def termBucket(term: String, p: Int): Int = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val h = new XxHash64(Seq(Literal(term))).eval(null).asInstanceOf[Long]
    (((h % p) + p) % p).toInt
  }

  // ----------------------------------------------------------------- build

  /** Build (or rebuild) the inverted index for `df`'s `column`.
    *
    * `df` must carry a unique `idColumn`. When `datasetPath` is a lance
    * dataset, its current version is stamped into the meta — [[refresh]]
    * uses it to delta-index appends, and it doubles as the staleness
    * guard the vector indexes carry.
    */
  def build(spark: SparkSession, df: DataFrame, column: String,
      idColumn: String, datasetPath: String,
      numTermPartitions: Int = 32, tokenizer: String = "space",
      storePositions: Boolean = false): FtsMeta = {
    val ip = indexPath(datasetPath, column)
    val builtAt = currentVersion(spark, datasetPath)
    writePostings(deltaPostings(df, column, idColumn, tokenizer,
        numTermPartitions, builtAt.getOrElse(0L), storePositions),
      numTermPartitions, postingsPath(ip), overwrite = true)

    // corpus stats in one tiny aggregation (count + exact token sum)
    val stats = docStats(df, column, idColumn, tokenizer)
    val meta = writeMeta(spark, ip, FtsMeta(column, idColumn,
      stats._1, stats._2, numTermPartitions,
      datasetVersion = builtAt,
      formatVersion = Some(CurrentFormatVersion),
      tokenizer = Some(tokenizer),
      positions = if (storePositions) Some(true) else None))
    log.info(s"fts index built at $ip: ${meta.numDocs} docs, " +
      s"sumDl=${meta.sumDl}, $numTermPartitions term partitions, " +
      s"tokenizer=$tokenizer, positions=$storePositions")
    meta
  }

  /** `(term, doc, dl, tf, __v, bucket)` rows for `df` — the unit of both
    * a full build and a refresh delta. (doc, dl) exploded to terms; dl
    * rides the groupBy key (functionally dependent on the doc id, so it
    * adds no groups) to avoid a join. `__v` stamps the dataset version
    * the rows were indexed at — the refresh-retry idempotence key (see
    * [[refresh]]); search never reads it (column-pruned at scan). */
  private def deltaPostings(df: DataFrame, column: String, idColumn: String,
      tokenizer: String, p: Int, version: Long,
      positions: Boolean = false): DataFrame =
    deltaPostingsFromTokens(docTokens(df, column, idColumn, tokenizer),
      p, version, positions)

  /** The doc-grain tokenized frame `(doc, ws)` both the postings and the
    * doc stats derive from — [[refresh]] persists it so ONE tokenize
    * pass serves both (a zero-token doc contributes no posting but must
    * still count into numDocs, so stats can never derive from postings). */
  private def docTokens(df: DataFrame, column: String,
      idColumn: String, tokenizer: String): DataFrame =
    df.select(col(idColumn).as("doc"),
      sparkTokens(col(column), tokenizer).as("ws"))

  private def deltaPostingsFromTokens(base: DataFrame, p: Int, version: Long,
      positions: Boolean): DataFrame = {
    val agg =
      if (positions) {
        // token POSITIONS ride each posting (sorted int array) — the
        // phrase-query substrate, Lucene's positional postings. Costs
        // ~a second int per token of storage, which is why it is opt-in.
        base.select(col("doc"), size(col("ws")).cast("long").as("dl"),
            posexplode(col("ws")).as(Seq("pos", "term")))
          .groupBy(col("term"), col("doc"), col("dl"))
          .agg(count(lit(1)).as("tf"),
            sort_array(collect_list(col("pos"))).as("positions"))
      } else
        base.select(col("doc"), size(col("ws")).cast("long").as("dl"),
            explode(col("ws")).as("term"))
          .groupBy(col("term"), col("doc"), col("dl"))
          .agg(count(lit(1)).as("tf"))
    agg
      .withColumn("__v", lit(version))
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(p.toLong)).cast("int"))
  }

  private def docStats(df: DataFrame, column: String, idColumn: String,
      tokenizer: String): (Long, Long) = {
    val r = df.select(col(idColumn),
        size(sparkTokens(col(column), tokenizer)).cast("long").as("dl"))
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("s")).head()
    (r.getLong(0), r.getLong(1))
  }

  private def writePostings(postings: DataFrame, p: Int, path: String,
      overwrite: Boolean): Unit =
    postings
      .repartition(p, col("bucket"))
      .sortWithinPartitions("bucket", "term", "doc")
      .write.mode(if (overwrite) "overwrite" else "append")
      .partitionBy("bucket").parquet(path)

  // --------------------------------------------------------------- refresh

  /** Delta-index rows appended to the lance dataset since the indexed
    * version (the v34 incremental-refresh pattern on the text side).
    *
    * Append-only history: tokenizes ONLY the appended fragments, merges
    * postings into ONLY the bucket directories their terms hash to
    * (per-bucket union + re-sort, staged under `postings.tmp` then
    * swapped dir-by-dir so the live index is never read-while-
    * overwritten), and bumps `numDocs`/`sumDl`/`datasetVersion` in the
    * meta (evicting the session cache). Any non-append commit in the
    * range — row-level DML removal or compaction rewrite — falls back to
    * a full rebuild with a warning: postings reference doc rows, and
    * fragment-level tracking cannot prove which survived.
    *
    * Returns the updated meta; no-op when the index is already current.
    */
  def refresh(spark: SparkSession, datasetPath: String, column: String,
      allowRebuild: Boolean = true): FtsMeta = {
    val meta = loadMeta(spark, datasetPath, column)
    val root = new Path(datasetPath)
    val fs = graft.format.LanceFormat.fileSystem(root,
      spark.sessionState.newHadoopConf())
    val to = graft.format.LanceFormat.readLatest(fs, root).map(_.version)
      .getOrElse(throw new IllegalArgumentException(
        s"fts refresh: no lance dataset at $datasetPath"))
    val tokenizer = meta.tokenizer.getOrElse("space")

    def rebuild(why: String): FtsMeta = {
      // a delta refresh degenerating to a full re-tokenize is a real
      // cost decision at index scale: scheduled-maintenance callers
      // ([[graft.Lance.optimize]]) forbid it and report the index stale
      // instead of silently paying it every night
      if (!allowRebuild) throw new IllegalStateException(
        s"fts index at $datasetPath/$column needs a REBUILD ($why) - " +
          "run Lance.buildFtsIndex to pay it explicitly")
      log.warn(s"fts refresh at $datasetPath/$column: $why — full rebuild")
      build(spark, spark.read.format("lance").load(datasetPath), column,
        meta.idColumn, datasetPath, meta.numTermPartitions, tokenizer,
        storePositions = meta.positions.contains(true))
    }

    if (meta.datasetVersion.isEmpty)
      return rebuild("index carries no dataset version")
    val from = meta.datasetVersion.get
    if (meta.formatVersion.getOrElse(1) < 2)
      return rebuild(s"format v${meta.formatVersion.getOrElse(1)} layout (flat files)")
    if (to == from) return meta
    if (to < from) return rebuild(s"dataset at v$to behind indexed v$from (restore?)")

    // walk (from, to]: appends only, or give up to a rebuild
    val versions = graft.format.LanceFormat.listVersions(fs, root).toSet
    if (!versions.contains(from))
      return rebuild(s"indexed version $from no longer listed")
    var prev = graft.format.LanceFormat.readManifest(fs, root, from).fragments
    val added = Seq.newBuilder[graft.format.FragmentMeta]
    var bad: Option[String] = None
    var v = from + 1
    while (v <= to && bad.isEmpty) {
      if (versions.contains(v)) {
        val m = graft.format.LanceFormat.readManifest(fs, root, v)
        val prevFiles = prev.map(_.file).toSet
        val curFiles = m.fragments.map(_.file).toSet
        if (m.operation.contains("rewrite"))
          bad = Some(s"v$v is a compaction rewrite")
        else if (prev.exists(f => !curFiles.contains(f.file)))
          bad = Some(s"v$v removed fragments (row-level DML?)")
        else {
          added ++= m.fragments.filterNot(f => prevFiles.contains(f.file))
          prev = m.fragments
        }
      }
      v += 1
    }
    if (bad.isDefined) return rebuild(bad.get)
    val addedFrags = added.result()
    if (addedFrags.isEmpty) // metadata-only commits (e.g. ALTER): just
      return writeMeta(spark, indexPath(datasetPath, column), // advance
        meta.copy(datasetVersion = Some(to)))                 // the stamp

    val endSchema = graft.format.LanceFormat.readManifest(fs, root, to).schema
    val deltaDf = spark.read.schema(endSchema)
      .parquet(addedFrags.map(f =>
        graft.format.LanceFormat.fragmentPath(root, f.file).toString): _*)
    val p = meta.numTermPartitions
    val ip = indexPath(datasetPath, column)
    // ONE tokenize pass serves postings AND doc stats (guide §1.2): the
    // doc-grain tokenized frame persists for the refresh (delta-bounded,
    // never corpus-bounded), the postings derive from it, and the stats
    // read its cache instead of re-tokenizing the delta — which also
    // keeps zero-token docs counted (they have no postings line). The
    // touched-bucket probe and the stats aggregate ride ONE collect as a
    // tagged union, so the former separate docStats job disappears.
    val withPos = meta.positions.contains(true)
    val baseTok = docTokens(deltaDf, column, meta.idColumn, tokenizer)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val delta = deltaPostingsFromTokens(baseTok, p, to, positions = withPos)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (touchedCount, dn, ds) = try {
      val probe = delta
        .select(lit("b").as("k"), col("bucket").cast("long").as("a"),
          lit(0L).as("b2")).distinct()
        .unionByName(baseTok
          .agg(count(lit(1)).as("a"),
            sum(size(col("ws")).cast("long")).as("b2"))
          .select(lit("s").as("k"), col("a"), col("b2")))
        .collect()
      // touched buckets: ≤ P values to the driver, bounded by construction
      val touched = probe.filter(_.getString(0) == "b")
        .map(_.getLong(1).toInt).sorted
      val statRow = probe.find(_.getString(0) == "s").get
      val docsN = statRow.getLong(1)
      val docsDl = if (statRow.isNullAt(2)) 0L else statRow.getLong(2)
      val live = postingsPath(ip)
      val stage = s"$ip/postings.tmp"
      // retry idempotence: a PREVIOUS refresh attempt that crashed
      // mid-swap may have already landed `to`-stamped rows in some live
      // buckets (meta only advances after the full swap) — drop them
      // before re-merging, or the retry would double every (term, doc)
      val liveDf = spark.read.parquet(live)
      val keep = Seq("term", "doc", "dl", "tf", "__v") ++
        (if (withPos) Seq("positions") else Nil) ++ Seq("bucket")
      val merged = (if (liveDf.columns.contains("__v")) liveDf
                    else liveDf.withColumn("__v", lit(-1L))) // pre-__v layout
        .filter(col("bucket").isin(touched.map(Integer.valueOf).toSeq: _*))
        .filter(col("__v") =!= lit(to))
        .select(keep.map(col): _*)
        .unionByName(delta)
      writePostings(merged, p, stage, overwrite = true)

      // swap ONLY the touched bucket dirs in (reads above have completed —
      // the stage write materialized them); untouched buckets never move.
      // Verify the staged dir EXISTS before deleting the live one: a
      // touched bucket always has delta rows, so a missing stage dir is a
      // lost write — fail loud with the live postings intact.
      val hconf = spark.sessionState.newHadoopConf()
      val pfs = new Path(live).getFileSystem(hconf)
      val swaps = touched.map { b =>
        val src = new Path(s"$stage/bucket=$b")
        require(pfs.exists(src),
          s"fts refresh: staged bucket dir $src missing after write - aborting " +
            "swap with live postings untouched")
        (src, new Path(s"$live/bucket=$b"))
      }
      swaps.foreach { case (src, dst) =>
        if (pfs.exists(dst)) pfs.delete(dst, true)
        require(pfs.rename(src, dst), s"fts refresh: rename $src -> $dst failed")
      }
      pfs.delete(new Path(stage), true)
      (touched.length, docsN, docsDl)
    } finally { delta.unpersist(); baseTok.unpersist() }

    val updated = writeMeta(spark, ip, meta.copy(numDocs = meta.numDocs + dn,
      sumDl = meta.sumDl + ds, datasetVersion = Some(to)))
    log.info(s"fts index refreshed at $ip: +$dn docs (+$ds tokens) from " +
      s"${addedFrags.size} fragment(s), $touchedCount/$p buckets merged, " +
      s"v$from -> v$to")
    updated
  }

  // ------------------------------------------------------------------ meta

  private def currentVersion(spark: SparkSession, datasetPath: String): Option[Long] = {
    val root = new Path(datasetPath)
    val fs = graft.format.LanceFormat.fileSystem(root,
      spark.sessionState.newHadoopConf())
    graft.format.LanceFormat.readLatest(fs, root).map(_.version)
  }

  /** Persist `meta` (stamped with a fresh buildId) and return the stamped
    * copy — so the value a caller holds equals the value [[loadMeta]]
    * serves. buildId makes two builds of identical corpora differ in
    * CONTENT, so a cached (modTime, len) hit against a byte-identical
    * rebuild can only serve a meta that is ALSO value-identical — the one
    * stale-read case (path, modTime, len) cannot distinguish becomes
    * harmless. */
  private def writeMeta(spark: SparkSession, ip: String, meta: FtsMeta): FtsMeta = {
    val mp = metaPath(ip)
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(mp, true)
    val stamped = meta.copy(buildId = Some(
      java.util.UUID.randomUUID().toString))
    try out.write(Serialization.write(stamped).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // rebuild invalidates any cached meta for this index (same contract
    // as IvfIndex.metaCache); purge the LRU queue too or evicted keys
    // accumulate there unboundedly across rebuild/refresh cycles
    metaCache.keySet.removeIf(_._1 == mp.toString)
    metaCacheOrder.removeIf(_._1 == mp.toString)
    stamped
  }

  /** Session-lifetime meta cache keyed (path, modTime, len): a serving
    * workload's repeated searches skip the per-query JSON read; a rebuild
    * changes the file status (and writeMeta evicts explicitly). An
    * EXTERNAL rebuild landing within the filesystem's mtime granularity
    * at identical byte length is the residual stale window — tolerable
    * because equal length + equal stats means the serving-relevant fields
    * agree, and any numDocs/sumDl/version change alters the JSON length.
    * Eviction is per-entry oldest-first (not clear-the-world).
    */
  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), FtsMeta]()
  private val metaCacheOrder =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]()

  /** Evict any cached meta for this index (dropIndex's hook — a deleted
    * sidecar must not serve stale searches from the session cache). */
  private[graft] def evictMeta(spark: SparkSession, datasetPath: String,
      column: String): Unit = {
    val mp = metaPath(indexPath(datasetPath, column))
    metaCache.keySet.removeIf(_._1 == mp.toString)
    metaCacheOrder.removeIf(_._1 == mp.toString)
  }

  def loadMeta(spark: SparkSession, datasetPath: String, column: String): FtsMeta = {
    val mp = metaPath(indexPath(datasetPath, column))
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(mp), s"no fts index at $mp - build it first")
    val st = fs.getFileStatus(mp)
    val key = (mp.toString, st.getModificationTime, st.getLen)
    val cached = metaCache.get(key)
    if (cached != null) cached
    else {
      val in = fs.open(mp)
      val meta = try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n > 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Serialization.read[FtsMeta](bytes.toString("UTF-8"))
      } finally in.close()
      while (metaCache.size >= 64) { // bounded, oldest-entry eviction
        val victim = metaCacheOrder.poll()
        if (victim == null) { metaCache.clear() }
        else metaCache.remove(victim)
      }
      if (metaCache.putIfAbsent(key, meta) == null) metaCacheOrder.add(key)
      meta
    }
  }

  // ---------------------------------------------------------------- search

  /** BM25 top-k for `queryText` against the persisted index.
    *
    * Returns `(doc id, score)` ordered by `(score DESC, doc id)`. `score`
    * is the DECIMAL(18,6)-rounded BM25 sum — rounded so it is
    * reproducible across engines and summation orders (the ordering uses
    * the same rounded value, so ranking is deterministic too). The query
    * is tokenized with the INDEX's tokenizer (stamped at build time).
    *
    * `matchMode` `"any"` (default) ranks every doc matching ≥1 term
    * (Lucene's BooleanQuery SHOULD); `"all"` keeps only docs matching
    * EVERY query term (MUST) — scores are unchanged, the conjunction
    * only narrows candidates, and the matched-term count falls out of
    * the per-doc aggregation for free (postings are unique per
    * (term, doc)); `"phrase"` keeps only docs where the query tokens
    * appear CONSECUTIVELY in order (requires an index built with
    * `storePositions = true`) — candidates narrow to all-terms docs
    * first, then one codegen'd intersect-of-shifted-position-lists
    * check per candidate (Lucene's exact-phrase algorithm), then the
    * usual BM25 ranking of the phrase terms; `"phrase~N"` is the SLOPPY
    * phrase — tokens must appear IN ORDER within a window of N extra
    * positions (there exist positions q₀<…<q_{m-1} with
    * q_{m-1}−q₀ ≤ m−1+N; N=0 degenerates to the exact phrase) — checked
    * by a codegen'd greedy earliest-chain per candidate doc (greedy
    * minimizes the chain's end, so it decides the span bound exactly).
    *
    * NOT terms (Lucene's MUST_NOT): a query token with a leading `-`
    * (e.g. `"spark join -scala"`) EXCLUDES every doc containing that
    * term — its bucket-pruned postings anti-join the candidates before
    * scoring. Exclusions never affect corpus statistics (df/avgdl stay
    * index-wide) and excluded terms never score.
    *
    * FUZZY terms (Lucene's FuzzyQuery): `term~1` / `term~2` matches
    * every index term within that Levenshtein distance — expanded by
    * one column-pruned codegen pass over the postings' term column
    * (length window + bounded-threshold edit distance), each expansion
    * scoring with its OWN df, the whole clause counting as ONE term
    * under `all` (the prefix-clause contract). Expansion is capped by
    * `spark.graft.fts.maxFuzzyTerms` (default 256, fail-loud).
    *
    * `filter` is an optional SQL predicate over the LANCE DATASET at
    * `datasetPath` (pre-filter: candidates failing it never reach the
    * top-k, so k survivors are guaranteed eligible — the V3 semantics,
    * text-flavored). The filtered side reads only the id column behind
    * the pushed predicate (manifest-stats + parquet pruning apply), and
    * the postings are LEFT SEMI-joined against it BEFORE scoring — the
    * corpus is never shuffled. Corpus statistics (df, avgdl) stay
    * UNFILTERED, Lucene's filtered-query contract: a filter narrows the
    * result set, it does not re-weigh the corpus.
    */
  def search(spark: SparkSession, datasetPath: String, column: String,
      queryText: String, k: Int, filter: Option[String] = None,
      matchMode: String = "any"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // `phrases` / `phrases~N`: disjunction of '|'-separated phrases
    val phrasesRe = "phrases~(\\d+)".r
    matchMode match {
      case "phrases" | phrasesRe(_) =>
        val slop = matchMode match { case phrasesRe(n) => n.toInt; case _ => 0 }
        return searchPhrases(spark, datasetPath, column,
          queryText.split('|').map(_.trim).filter(_.nonEmpty).toSeq, k,
          slop = slop, filter = filter)
      case _ => ()
    }
    val meta = loadMeta(spark, datasetPath, column)
    scoredSearch(spark, datasetPath, column, queryText, filter, matchMode, meta)
      .orderBy(col("score").desc, col("doc"))
      .limit(k)
      .withColumnRenamed("doc", meta.idColumn)
  }

  /** Weighted multi-field search — Lucene's `title^2 body` / the
    * most_fields multi-match shape: the query runs through EACH field's
    * own index (every field keeps its own postings, df, and length
    * normalization — per-field BM25 is exactly [[search]]'s), scores are
    * boost-weighted and summed per doc, top-k of the combined score.
    * `matchMode` applies PER FIELD (`all` = the doc matches every term
    * within that field; it can still score from one field alone —
    * most_fields semantics, not cross_fields). Every field needs an FTS
    * index over the SAME id column.
    */
  def searchFields(spark: SparkSession, datasetPath: String,
      fields: Seq[(String, Double)], queryText: String, k: Int,
      filter: Option[String] = None, matchMode: String = "any"): DataFrame = {
    require(fields.nonEmpty, "searchFields needs at least one (column, boost)")
    require(k > 0, s"k must be positive, got $k")
    require(fields.map(_._1).distinct.size == fields.size,
      s"duplicate field in ${fields.map(_._1).mkString(", ")}")
    val metas = fields.map { case (c, _) => loadMeta(spark, datasetPath, c) }
    require(metas.map(_.idColumn).distinct.size == 1,
      s"multi-field search needs one shared id column, got " +
        metas.map(_.idColumn).distinct.mkString(", "))
    val per = fields.zip(metas).map { case ((c, boost), meta) =>
      scoredSearch(spark, datasetPath, c, queryText, filter, matchMode, meta)
        // round each weighted field score to decimal(18,6) before the
        // cross-field sum: decimal addition is order-insensitive, so the
        // combined score is bit-stable however Spark orders the rows
        .select(col("doc"),
          (col("score") * lit(boost)).cast("decimal(18,6)").as("c"))
    }
    per.reduce(_ unionByName _)
      .groupBy(col("doc"))
      .agg(sum(col("c")).cast("double").as("score"))
      .orderBy(col("score").desc, col("doc"))
      .limit(k)
      .withColumnRenamed("doc", metas.head.idColumn)
  }

  /** Disjunction of phrases — Lucene's BooleanQuery of SHOULD
    * PhraseQuery clauses: a doc matches if ANY of `phrases` occurs
    * (exact-consecutive, or in order within `slop` extra positions), and
    * scores the SUM of its matched clauses' BM25 scores, so a doc
    * matching two phrases outranks single-phrase docs. Per-clause scores
    * are decimal-exact before the cross-clause sum, keeping the ranking
    * deterministic. Each clause probes only its own terms' bucket
    * directories — disjunction cost is the sum of the clause probes, not
    * a corpus scan. SQL: `lance_fts(path, col, 'p1 a | p2 b', k, '',
    * 'phrases')` (or `phrases~N`).
    */
  def searchPhrases(spark: SparkSession, datasetPath: String, column: String,
      phrases: Seq[String], k: Int, slop: Int = 0,
      filter: Option[String] = None): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(phrases.nonEmpty, "searchPhrases needs at least one phrase")
    require(slop >= 0, s"slop must be >= 0, got $slop")
    val meta = loadMeta(spark, datasetPath, column)
    val mode = if (slop == 0) "phrase" else s"phrase~$slop"
    phrases.map(p => scoredSearch(spark, datasetPath, column, p, filter, mode, meta))
      .reduce(_ unionByName _)
      .groupBy(col("doc"))
      .agg(sum(col("score").cast("decimal(18,6)")).cast("double").as("score"))
      .orderBy(col("score").desc, col("doc"))
      .limit(k)
      .withColumnRenamed("doc", meta.idColumn)
  }

  /** [[search]] + highlighted snippets — Lucene's Highlighter /
    * Elasticsearch `highlight`, re-expressed as pure column expressions:
    * the top-k hits join BACK to the corpus for the text (hit ids are a
    * broadcast dim side, so the corpus scan runtime-prunes to the
    * fragments holding the k winners — never a second corpus pass), then
    * one codegen'd pass re-tokenizes each winning doc with the INDEX's
    * tokenizer, finds the first matched position, and emits a
    * `window`-token snippet with every query-term occurrence wrapped in
    * `preTag`/`postTag` (+ `n_matches`, the doc-wide occurrence count).
    * Highlighted: positive plain terms and `term*` prefixes; `-term`
    * exclusions never highlight (excluded docs aren't hits), fuzzy terms
    * highlight their literal base.
    */
  def searchHighlight(spark: SparkSession, datasetPath: String, column: String,
      queryText: String, k: Int, filter: Option[String] = None,
      matchMode: String = "any", preTag: String = "[", postTag: String = "]",
      window: Int = 12): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    val meta = loadMeta(spark, datasetPath, column)
    val tokenizer = meta.tokenizer.getOrElse("space")
    val hits = search(spark, datasetPath, column, queryText, k, filter, matchMode)
    // highlightable clauses: plain positive terms (fuzzy → its base),
    // and prefixes; '-term' exclusions are dropped
    val rawParts = queryText.split('|').flatMap(_.split("\\s+")).toSeq
      .filter(_.nonEmpty).filterNot(p => p.length > 1 && p.startsWith("-"))
    val fuzzyRe = "(.+)~([0-9]+)".r
    val (prefParts, plainParts) =
      rawParts.partition(p => p.length > 1 && p.endsWith("*"))
    val prefixes = prefParts.flatMap(p => scalaTokens(p.dropRight(1), tokenizer))
      .distinct
    val terms = plainParts.map { case fuzzyRe(body, _) => body; case p => p }
      .flatMap(scalaTokens(_, tokenizer)).distinct
    def isMatch(t: Column): Column = {
      val base: Column =
        if (terms.isEmpty) lit(false)
        else array_contains(array(terms.map(lit): _*), t)
      prefixes.foldLeft(base)((acc, p) => acc || t.startsWith(p))
    }
    val docs = spark.read.format("lance").load(datasetPath)
      .select(col(meta.idColumn), col(column))
    val joined = docs.join(broadcast(hits.select(col(meta.idColumn),
      col("score"))), Seq(meta.idColumn))
    val toks = sparkTokens(col(column), tokenizer)
    val idxs = org.apache.spark.sql.functions.filter(
      transform(toks, (t, i) => when(isMatch(t), i).otherwise(lit(-1))),
      x => x >= 0) // 0-based positions of every match
    // functions.get: null on a no-match doc (ANSI-safe), not an error
    val first = coalesce(get(col("__m"), lit(0)), lit(0))
    val start = greatest(lit(0), first - lit(window / 4))
    val snippet = array_join(
      transform(slice(toks, start + 1, lit(window)), t =>
        when(isMatch(t), concat(lit(preTag), t, lit(postTag))).otherwise(t)),
      " ")
    joined.withColumn("__m", idxs)
      .select(col(meta.idColumn), col("score"),
        coalesce(snippet, lit("")).as("snippet"),
        coalesce(size(col("__m")), lit(0)).as("n_matches"))
      .orderBy(col("score").desc, col(meta.idColumn))
  }

  /** The scored (doc, score) frame of one query — everything in
    * [[search]] except the final top-k/rename, so clause composers
    * ([[searchPhrases]]) can combine full result sets without k-
    * truncation losing cross-clause candidates. */
  private def scoredSearch(spark: SparkSession, datasetPath: String,
      column: String, queryText: String, filter: Option[String],
      matchMode: String, meta: FtsMeta): DataFrame = {
    val slopRe = "phrase~(\\d+)".r
    val (mode, slop) = matchMode match {
      case slopRe(n) => ("phrase", n.toInt)
      case m => (m, 0)
    }
    require(mode == "any" || mode == "all" || mode == "phrase",
      s"matchMode must be any|all|phrase|phrase~N|phrases|phrases~N, got $matchMode")
    if (mode == "phrase")
      require(meta.positions.contains(true),
        s"phrase search needs a positional index - rebuild with storePositions=true")
    val tokenizer = meta.tokenizer.getOrElse("space")
    // '-term' NOT clauses and 'term*' PREFIX clauses (Lucene PrefixQuery)
    // are peeled off the RAW query before tokenizing ('-'/'*' are
    // tokenizer-dependent: unicode would swallow them)
    val rawParts = queryText.split("\\s+").toSeq.filter(_.nonEmpty)
    val (exclParts, posParts0) =
      rawParts.partition(p => p.length > 1 && p.startsWith("-"))
    def prefixOf(p: String): String = {
      val ts = scalaTokens(p.dropRight(1), tokenizer)
      require(ts.size == 1,
        s"prefix query '$p' must tokenize to exactly one term, got $ts")
      ts.head
    }
    val (prefParts, posParts1) =
      posParts0.partition(p => p.length > 1 && p.endsWith("*"))
    val prefixes = prefParts.map(prefixOf).distinct
    // 'term~N' FUZZY clauses (Lucene FuzzyQuery, N capped at 2 like
    // Lucene's maxEdits): peeled off the raw parts like prefixes
    val fuzzyRe = "(.+)~([12])".r
    val (fuzParts, posParts) =
      posParts1.partition(fuzzyRe.pattern.matcher(_).matches)
    val fuzzies: Seq[(String, Int)] = fuzParts.map { p =>
      val fuzzyRe(body, d) = p
      val ts = scalaTokens(body, tokenizer)
      require(ts.size == 1,
        s"fuzzy query '$p' must tokenize to exactly one term, got $ts")
      (ts.head, d.toInt)
    }.distinct
    val (exclPrefParts, exclPlainParts) = exclParts.map(_.drop(1))
      .partition(p => p.length > 1 && p.endsWith("*"))
    exclPlainParts.find(fuzzyRe.pattern.matcher(_).matches).foreach { p =>
      throw new IllegalArgumentException(
        s"fuzzy clauses cannot be negated ('-$p'): exclude the concrete " +
          "terms instead")
    }
    val excludeTerms = exclPlainParts
      .flatMap(p => scalaTokens(p, tokenizer)).distinct
    val excludePrefixes = exclPrefParts.map(prefixOf).distinct
    val phraseSeq = scalaTokens(posParts.mkString(" "), tokenizer) // ordered, dups kept
    val terms = phraseSeq.distinct
    require(terms.nonEmpty || prefixes.nonEmpty || fuzzies.nonEmpty,
      "empty query (no positive terms)")
    require((prefixes.isEmpty && fuzzies.isEmpty) || mode == "any" || mode == "all",
      "prefix and fuzzy terms are supported in any/all mode, not phrase")
    val avgdl = meta.sumDl.toDouble / meta.numDocs

    // Only the probed posting lists leave storage: v2 prunes to the
    // terms' bucket DIRECTORIES (partition pruning), then `term IN (...)`
    // is pushed to the parquet scan inside them; v1 (flat files) relies
    // on row-group min/max alone.
    val raw = spark.read.parquet(postingsPath(indexPath(datasetPath, column)))
    // each posting row is tagged with its QUERY CLAUSE (`__qt`): the term
    // itself for exact clauses, the prefix for expanded ones — so the
    // matched-clause count under `all` treats a prefix as ONE clause no
    // matter how many index terms it expands to
    val exactPost = if (terms.isEmpty) None else Some(
      (if (meta.formatVersion.getOrElse(1) >= 2) {
        val buckets = terms.map(termBucket(_, meta.numTermPartitions))
          .distinct.map(Integer.valueOf)
        raw.filter(col("bucket").isin(buckets: _*))
      } else raw).filter(col("term").isin(terms: _*))
        .withColumn("__qt", col("term")))
    // prefix expansion: buckets hash by term, so a prefix cannot prune
    // directories — but postings are SORTED by term within every bucket
    // file, so the pushed StringStartsWith skips non-overlapping row
    // groups via parquet min/max: a term-range scan, not a postings scan
    val prefPost = if (prefixes.isEmpty) None else {
      val cond = prefixes.map(col("term").startsWith(_)).reduce(_ || _)
      val qt = prefixes.tail.foldLeft(
        when(col("term").startsWith(prefixes.head), lit(prefixes.head + "*"))) {
        (acc, p) => acc.when(col("term").startsWith(p), lit(p + "*"))
      }
      val pp = raw.filter(cond)
      // Lucene's TooManyClauses bound, df-cap flavored: a one-letter
      // prefix over a 100 TB vocabulary must fail loud, not OOM the agg
      val cap = spark.conf.getOption("spark.graft.fts.maxPrefixTerms")
        .map(_.toInt).getOrElse(1024)
      val expanded = pp.select(col("term")).distinct().limit(cap + 1).count()
      require(expanded <= cap,
        s"prefix query ${prefixes.mkString(", ")} expands to more than $cap " +
          "index terms - narrow the prefix or raise spark.graft.fts.maxPrefixTerms")
      Some(pp.withColumn("__qt", qt))
    }
    // fuzzy expansion: no automaton over a term dictionary here — the
    // Spark-shape equivalent is ONE column-pruned codegen pass over the
    // postings' term column (dictionary-encoded parquet): a cheap length
    // window first, then the bounded-threshold Levenshtein (early-exits
    // past the budget). Linear in index size like a cross-bucket prefix,
    // capped the same way.
    val fuzzPost = if (fuzzies.isEmpty) None else {
      def cond(q: String, d: Int): Column =
        length(col("term")).between(q.length - d, q.length + d) &&
          levenshtein(col("term"), lit(q), d) >= 0
      val qt = fuzzies.tail.foldLeft(
        when(cond(fuzzies.head._1, fuzzies.head._2),
          lit(s"${fuzzies.head._1}~${fuzzies.head._2}"))) {
        case (acc, (q, d)) => acc.when(cond(q, d), lit(s"$q~$d"))
      }
      val fp = raw.filter(fuzzies.map { case (q, d) => cond(q, d) }.reduce(_ || _))
      val cap = spark.conf.getOption("spark.graft.fts.maxFuzzyTerms")
        .map(_.toInt).getOrElse(256)
      val expanded = fp.select(col("term")).distinct().limit(cap + 1).count()
      require(expanded <= cap,
        s"fuzzy query ${fuzzies.map(f => s"${f._1}~${f._2}").mkString(", ")} " +
          s"expands to more than $cap index terms - tighten the distance or " +
          "raise spark.graft.fts.maxFuzzyTerms")
      Some(fp.withColumn("__qt", qt))
    }
    val postAll = (exactPost.toSeq ++ prefPost.toSeq ++ fuzzPost.toSeq)
      .reduce(_ unionByName _)

    // per-term DOCUMENT frequency — at most #terms rows, broadcast back.
    // Computed BEFORE any pre-filter: corpus stats are index-wide.
    // countDistinct, not count: overlapping clauses (the exact term also
    // inside a prefix/fuzzy expansion) duplicate a (term, doc) posting
    // row per clause — correct for scoring (each clause contributes,
    // Lucene's BooleanQuery), but df must stay the true per-term count.
    val dfs = postAll.groupBy(col("term"))
      .agg(countDistinct(col("doc")).as("df"))

    val postF = filter.fold(postAll) { pred =>
      val eligible = spark.read.format("lance").load(datasetPath)
        .filter(expr(pred)).select(col(meta.idColumn).as("doc"))
      postAll.join(eligible, Seq("doc"), "left_semi")
    }

    // NOT clauses: docs holding ANY excluded term are anti-joined away
    // before scoring — same bucket-pruned posting read as the positive
    // side, so exclusion cost is the excluded terms' posting lists, not
    // a corpus scan
    val post0 = if (excludeTerms.isEmpty && excludePrefixes.isEmpty) postF else {
      val exExact = if (excludeTerms.isEmpty) None else Some(
        (if (meta.formatVersion.getOrElse(1) >= 2) {
          val exBuckets = excludeTerms.map(termBucket(_, meta.numTermPartitions))
            .distinct.map(Integer.valueOf)
          raw.filter(col("bucket").isin(exBuckets: _*))
        } else raw).filter(col("term").isin(excludeTerms: _*)))
      val exPref = if (excludePrefixes.isEmpty) None else Some(
        raw.filter(excludePrefixes.map(col("term").startsWith(_)).reduce(_ || _)))
      val exDocs = (exExact.toSeq ++ exPref.toSeq).reduce(_ unionByName _)
        .select(col("doc")).distinct()
      postF.join(exDocs, Seq("doc"), "left_anti")
    }

    // phrase: keep only docs where the tokens appear in order within the
    // slop window. Per candidate doc, gather term → positions (the
    // candidate set is already narrowed to docs holding ALL phrase
    // terms), then one codegen'd expression decides membership:
    //  - slop 0: intersect-of-shifted-position-lists (any start p with
    //    phraseSeq(i) at exactly p+i — Lucene's exact-phrase algorithm);
    //  - slop N: greedy earliest chain — e₀ = p, eᵢ = min position of
    //    term i after eᵢ₋₁ — accepts iff e_{m-1} ≤ p + (m-1) + N. Greedy
    //    minimizes the chain end, so it decides "∃ in-order occurrence
    //    with span ≤ m-1+N" exactly; array_min(empty) = NULL propagates
    //    through the comparisons as a non-match.
    val post = if (mode != "phrase") post0 else {
      val member =
        if (slop == 0) {
          val adjacency = phraseSeq.zipWithIndex.tail.foldLeft(
            s"element_at(__m, '${sqlLit(phraseSeq.head)}')") { case (acc, (t, i)) =>
            s"filter($acc, p -> array_contains(element_at(__m, '${sqlLit(t)}'), p + $i))"
          }
          s"size($adjacency) > 0"
        } else {
          val budget = phraseSeq.size - 1 + slop
          val chain = phraseSeq.zipWithIndex.tail.foldLeft("p0") {
            case (acc, (t, i)) =>
              s"array_min(filter(element_at(__m, '${sqlLit(t)}'), " +
                s"x$i -> x$i > ($acc)))"
          }
          s"size(filter(element_at(__m, '${sqlLit(phraseSeq.head)}'), " +
            s"p0 -> ($chain) <= p0 + $budget)) > 0"
        }
      val phraseDocs = post0
        .groupBy(col("doc"))
        .agg(map_from_entries(collect_list(struct(col("term"),
          col("positions")))).as("__m"), count(lit(1)).as("__nt"))
        .filter(col("__nt") === terms.size)
        .filter(expr(member))
        .select(col("doc"))
      post0.join(phraseDocs, Seq("doc"), "left_semi")
    }

    val n = meta.numDocs
    val contrib =
      expr(s"ln(1.0D + ((CAST($n - df AS DOUBLE) + 0.5D) / (CAST(df AS DOUBLE) + 0.5D)))") *
        (col("tf") * lit(K1 + 1.0)) /
        (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / lit(avgdl)))

    val scored = post
      .join(broadcast(dfs), "term")
      .withColumn("c", contrib.cast("decimal(18,6)"))
      .groupBy(col("doc"))
      // postings are unique per (term, doc), so without prefixes the row
      // count per doc IS the matched-clause count; with prefixes the
      // distinct __qt count collapses each prefix's expansions to one
      .agg(sum(col("c")).cast("double").as("score"),
        (if (prefixes.isEmpty && fuzzies.isEmpty) count(lit(1))
         else countDistinct(col("__qt"))).as("__nt"))
    (if (mode == "all")
      scored.filter(col("__nt") === (terms.size + prefixes.size + fuzzies.size))
     else scored)
      .drop("__nt")
  }
}
