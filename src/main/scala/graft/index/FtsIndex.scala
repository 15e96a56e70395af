package graft.index

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * Layout under `<dataset>/_indices/<column>_fts/`:
  *   - `postings/` — parquet rows `(term, doc id, tf, dl)`, HASH
  *     PARTITIONED by term into `numTermPartitions` files and SORTED by
  *     term within each file. A query for T terms therefore touches at
  *     most T files (usually fewer), and inside each file parquet
  *     row-group min/max on the sorted `term` column skips everything
  *     but the probed posting lists. The document length `dl` is
  *     DENORMALIZED into each posting so scoring never joins a doc-table
  *     side: at 100 TB that join would shuffle the corpus; here the only
  *     data read are the query terms' posting rows.
  *   - `fts.json` — corpus stats (`numDocs`, `sumDl`) + build lineage.
  *
  * Scale contract: build is one explode + one hash aggregation (partial
  * combine on (term, doc)) + one repartition-by-term write — linear, no
  * driver materialization. Search reads only probed posting lists
  * (pushed `term IN (...)` filter — the plan shows it in PushedFilters),
  * broadcasts the per-term document frequencies (≤ #query terms rows),
  * aggregates scores by doc id (narrow: candidate rows only), and takes
  * top-k via TakeOrderedAndProject (no global sort).
  *
  * Determinism contract (gate t40): each per-term contribution is cast
  * to DECIMAL(18,6) before the per-doc sum, making the sum
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
    formatVersion: Option[Int] = None)

  val CurrentFormatVersion = 1

  def indexPath(datasetPath: String, column: String): String =
    s"$datasetPath/_indices/${column}_fts"

  private def postingsPath(ip: String) = s"$ip/postings"
  private def metaPath(ip: String) = new Path(s"$ip/fts.json")

  /** The one tokenizer, shared by build, search, and the SQL oracles:
    * split on single spaces. The corpus contract (TESTDATA documents,
    * and the rest of the text operators — [[graft.operators.TextAnalysis]])
    * is single-space-separated tokens; a production tokenizer slots in
    * here and in the oracle together.
    */
  private def tokens(c: org.apache.spark.sql.Column) = split(c, " ")

  /** Build (or rebuild) the inverted index for `df`'s `column`.
    *
    * `df` must carry a unique `idColumn`. When `datasetPath` is a lance
    * dataset, its current version is stamped into the meta for the same
    * staleness guard the vector indexes carry.
    */
  def build(spark: SparkSession, df: DataFrame, column: String,
      idColumn: String, datasetPath: String,
      numTermPartitions: Int = 32): FtsMeta = {
    val ip = indexPath(datasetPath, column)

    // (doc, dl) exploded to terms; dl rides the groupBy key (functionally
    // dependent on the doc id, so it adds no groups) to avoid a join.
    val tok = df
      .select(col(idColumn).as("doc"), tokens(col(column)).as("ws"))
      .select(col("doc"), size(col("ws")).cast("long").as("dl"),
        explode(col("ws")).as("term"))
    val postings = tok.groupBy(col("term"), col("doc"), col("dl"))
      .agg(count(lit(1)).as("tf"))

    postings
      .repartition(numTermPartitions, col("term"))
      .sortWithinPartitions("term", "doc")
      .write.mode("overwrite").parquet(postingsPath(ip))

    // corpus stats in one tiny aggregation (count + exact token sum)
    val stats = df.select(col(idColumn),
        size(tokens(col(column))).cast("long").as("dl"))
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("s")).head()
    val meta = FtsMeta(column, idColumn, stats.getLong(0), stats.getLong(1),
      numTermPartitions,
      datasetVersion = currentVersion(spark, datasetPath),
      formatVersion = Some(CurrentFormatVersion))
    writeMeta(spark, ip, meta)
    log.info(s"fts index built at $ip: ${meta.numDocs} docs, " +
      s"sumDl=${meta.sumDl}, $numTermPartitions term partitions")
    meta
  }

  private def currentVersion(spark: SparkSession, datasetPath: String): Option[Long] = {
    val root = new Path(datasetPath)
    val fs = graft.format.LanceFormat.fileSystem(root,
      spark.sessionState.newHadoopConf())
    graft.format.LanceFormat.readLatest(fs, root).map(_.version)
  }

  private def writeMeta(spark: SparkSession, ip: String, meta: FtsMeta): Unit = {
    val mp = metaPath(ip)
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(mp, true)
    try out.write(Serialization.write(meta).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // rebuild invalidates any cached meta for this index (same contract
    // as IvfIndex.metaCache)
    metaCache.keySet.removeIf(_._1 == mp.toString)
  }

  /** Session-lifetime meta cache keyed (path, modTime, len): a serving
    * workload's repeated searches skip the per-query JSON read; a rebuild
    * changes the file status (and writeMeta evicts explicitly), so stale
    * entries can't serve.
    */
  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), FtsMeta]()

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
      if (metaCache.size > 64) metaCache.clear() // bounded; rebuilt on demand
      metaCache.put(key, meta)
      meta
    }
  }

  /** BM25 top-k for `queryText` against the persisted index.
    *
    * Returns `(doc id, score)` ordered by `(score DESC, doc id)`. `score`
    * is the DECIMAL(18,6)-rounded BM25 sum — rounded so it is
    * reproducible across engines and summation orders (the ordering uses
    * the same rounded value, so ranking is deterministic too).
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
      queryText: String, k: Int, filter: Option[String] = None): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val meta = loadMeta(spark, datasetPath, column)
    val terms = queryText.split(" ").filter(_.nonEmpty).distinct.toSeq
    require(terms.nonEmpty, "empty query")
    val avgdl = meta.sumDl.toDouble / meta.numDocs

    // Only the probed posting lists leave storage: `term IN (...)` is
    // pushed to the parquet scan, and the term-hash file layout bounds
    // the touched files by the term count.
    val postAll = spark.read.parquet(postingsPath(indexPath(datasetPath, column)))
      .filter(col("term").isin(terms: _*))

    // per-term document frequency — at most #terms rows, broadcast back.
    // Computed BEFORE any pre-filter: corpus stats are index-wide.
    val dfs = postAll.groupBy(col("term")).agg(count(lit(1)).as("df"))

    val post = filter.fold(postAll) { pred =>
      val eligible = spark.read.format("lance").load(datasetPath)
        .filter(expr(pred)).select(col(meta.idColumn).as("doc"))
      postAll.join(eligible, Seq("doc"), "left_semi")
    }

    val n = meta.numDocs
    val contrib =
      expr(s"ln(1.0D + ((CAST($n - df AS DOUBLE) + 0.5D) / (CAST(df AS DOUBLE) + 0.5D)))") *
        (col("tf") * lit(K1 + 1.0)) /
        (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / lit(avgdl)))

    post
      .join(broadcast(dfs), "term")
      .withColumn("c", contrib.cast("decimal(18,6)"))
      .groupBy(col("doc"))
      .agg(sum(col("c")).cast("double").as("score"))
      .orderBy(col("score").desc, col("doc"))
      .limit(k)
      .withColumnRenamed("doc", meta.idColumn)
  }
}
