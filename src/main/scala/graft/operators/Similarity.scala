package graft.operators

import graft.Tables.t
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** KNN / similarity search (SURVEY §2.4 V1–V7).
  *
  * Exact path: distance expression + `orderBy(dist).limit(k)`, which
  * Catalyst plans as `TakeOrderedAndProjectExec` — each partition keeps a
  * k-row heap, the driver merges k·numPartitions rows. No global sort, no
  * full shuffle; this is the correct distributed top-k at any scale. The
  * reference gets the same semantics from Lance-Rust
  * (`LanceVectorSearch.java:121-210`); an IVF-pruned variant lives in
  * graft.index.
  */
object Similarity {

  /** Programmatic KNN — parity with reference `LanceVectorSearch.search`
    * (V1/V3/V6): optional pre-filter, `_distance` appended, top-k.
    */
  def knnSearch(df: DataFrame, vectorCol: String, query: Array[Float], k: Int,
      metric: String = "l2", filter: Option[Column] = None): DataFrame = {
    validateQueryVector(query)
    require(k > 0, "k must be positive")
    val q = lit(query.map(_.toDouble))
    val dist = metric.toLowerCase match {
      case "l2" => l2_distance(col(vectorCol), q)
      case "cosine" => cosine_distance(col(vectorCol), q)
      case "dot" => -dot_product(col(vectorCol), q) // larger dot = closer
      case m => throw new IllegalArgumentException(s"unknown metric: $m")
    }
    val base = filter.fold(df)(df.filter)
    base.withColumn("_distance", dist)
      .orderBy(col("_distance"))
      .limit(k)
  }

  /** The embeddings table joined with the query vector of `vec_id = qid`
    * via a broadcast single-row cross join — the query vector never leaves
    * the plan, so the same code runs unchanged on a cluster.
    */
  private def withQueryVec(spark: SparkSession, dir: String, qid: Long): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") === qid).select(col("embedding").as("qv"))
    e.filter(col("vec_id") =!= qid).crossJoin(broadcast(q))
  }

  /** V1+V2: exact KNN under L2, top 10. */
  def v21KnnL2(spark: SparkSession, dir: String): DataFrame =
    withQueryVec(spark, dir, 0L)
      .select(col("vec_id"), l2_distance(col("embedding"), col("qv")).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(10)

  /** V2: cosine metric. */
  def v22KnnCosine(spark: SparkSession, dir: String): DataFrame =
    withQueryVec(spark, dir, 1L)
      .select(col("vec_id"), cosine_distance(col("embedding"), col("qv")).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(10)

  /** V2 dot metric + V4 similarity transform on the L2 distance. */
  def v23DotSimilarity(spark: SparkSession, dir: String): DataFrame =
    withQueryVec(spark, dir, 2L)
      .select(
        col("vec_id"),
        dot_product(col("embedding"), col("qv")).as("dot"),
        similarity(l2_distance(col("embedding"), col("qv"))).as("sim"))
      .orderBy(col("dot").desc, col("vec_id"))
      .limit(10)

  /** Late-interaction multi-vector scoring (v42) — ColBERT's maxsim:
    * documents hold SEVERAL vectors (here: 4 consecutive vec_ids = one
    * mv_doc), the query holds several, and
    * score(doc) = Σ_q max_v dot(q, v) — each query vector picks its best
    * matching doc vector. Plan shape: the query's 4 vectors broadcast
    * against the flat vector table (one codegen'd dot per pair), then
    * max-per-(doc, query-vector) and sum-per-doc ride two hash
    * aggregations — no all-pairs doc join, linear in stored vectors. At
    * 100 TB this flat scan survives ONLY as the oracle/reference path:
    * production late interaction runs [[v43MaxSimIndexed]] /
    * [[graft.index.IvfIndex.maxSim]], which generates candidates from the
    * IVF index and reranks exactly over candidates alone (v43 gates
    * full-probe == this flat scan). Dots are sequential double
    * accumulation on both engines
    * (bit-identical, the v23 contract); only the final 4-term sum is
    * order-sensitive, rounded to 6 decimals.
    */
  def v42MaxSim(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), expr("vec_id div 4").as("mv_doc"))
    val qvecs = e.filter(col("mv_doc") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    e.filter(col("mv_doc") =!= 0)
      .crossJoin(broadcast(qvecs))
      .select(col("mv_doc"), col("q_id"),
        dot_product(col("embedding"), col("q_vec")).as("dot"))
      .groupBy(col("mv_doc"), col("q_id"))
      .agg(max(col("dot")).as("best"))
      .groupBy(col("mv_doc"))
      .agg(round(sum(col("best")), 6).as("maxsim"), count(lit(1)).as("n_q"))
      .orderBy(col("maxsim").desc, col("mv_doc"))
      .limit(10)
  }

  /** The 4 query vectors of the v42/v43 late-interaction gates (mv_doc 0 =
    * vec_ids 0..3), fetched driver-side — a late-interaction query is
    * driver-small by definition.
    */
  private def maxSimQueryVecs(spark: SparkSession, dir: String): Seq[Array[Float]] =
    t(spark, dir, "embeddings").filter(col("vec_id") < 4)
      .orderBy(col("vec_id"))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray).toSeq

  /** Index-accelerated maxsim (v43): the [[v42MaxSim]] semantics served
    * by [[graft.index.IvfIndex.maxSim]] — candidate docs from the probed
    * IVF buckets, exact two-hash-agg rerank over candidates only. FULL
    * probing (nprobes = all 8) makes every doc a candidate, so the result
    * is EXACTLY the flat scan — the gate carries v42's own oracle, proving
    * the index path and the flat path can never diverge (the v25
    * equivalence pattern). At scale the flat scan survives only as this
    * oracle; production late interaction probes partially ([[
    * v43rMaxSimPartial]]).
    */
  def v43MaxSimIndexed(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.IvfIndex
    val dest = ensureIvf(spark, dir)
    IvfIndex.maxSim(spark, dest, "embedding", expr("vec_id div 4"),
        maxSimQueryVecs(spark, dir), k = 10, nprobes = 8,
        filter = Some(expr("vec_id div 4 <> 0")))
      .withColumnRenamed("doc", "mv_doc")
  }

  /** Genuinely APPROXIMATE late interaction (v43r): HALF the buckets
    * probed (4 of 8) AND the candidate set capped to the top-32 docs per
    * query vector by single-vector dot (ColBERT's retrieval step) — the
    * production configuration at 100 TB, where phase 2's rerank cost is
    * bounded by the cap, not the corpus. The gate measures overlap of the
    * top-10 docs against the exact flat-scan maxsim; measured 10/10 at
    * sf0.01 and sf0.1, asserted ≥ 7 (the v26p pattern: a real
    * candidate-generation regression reddens the row, run-to-run
    * determinism keeps it stable).
    */
  def v43rMaxSimPartial(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.IvfIndex
    val dest = ensureIvf(spark, dir)
    val annDocs = IvfIndex.maxSim(spark, dest, "embedding",
        expr("vec_id div 4"), maxSimQueryVecs(spark, dir), k = 10,
        nprobes = 4, candidatesPerQuery = 32,
        filter = Some(expr("vec_id div 4 <> 0")))
      .select(col("doc"))
    val exactDocs = v42MaxSim(spark, dir).select(col("mv_doc").as("doc"))
    annDocs.join(exactDocs, "doc")
      .agg(count(lit(1)).as("n_overlap"))
      .select(lit(10).as("k"), lit(4).as("nprobes"),
        (col("n_overlap") >= 7).as("recall_ok"))
  }

  /** Late interaction through pure SQL (v44): the `lance_maxsim` TVF over
    * a temp view of the query doc's vectors drives the SAME v43 two-phase
    * path (probed-bucket candidates, exact rerank) — a hash match against
    * v43's oracle proves the SQL surface reaches the distributed plan,
    * not a re-implementation (the v40 pattern for the KNN join).
    */
  def v44MaxSimSql(spark: SparkSession, dir: String): DataFrame = {
    val dest = ensureIvf(spark, dir)
    graft.MetaTvfs.register(spark)
    t(spark, dir, "embeddings").filter(col("vec_id") < 4)
      .createOrReplaceTempView("mvq_v44")
    spark.sql(
      s"""SELECT doc AS mv_doc, maxsim, n_q
         |FROM lance_maxsim('$dest', 'embedding', 'vec_id div 4',
         |                  'mvq_v44', 'embedding', 10, 8, 0,
         |                  'vec_id div 4 <> 0')
         |ORDER BY maxsim DESC, mv_doc""".stripMargin)
  }

  /** Per-label centroid-ish stats over vector norms: exercises the distance
    * expression inside a hash aggregate (vector column never shuffled raw —
    * only the scalar norm).
    */
  def v24NormStats(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    e.select(col("label"),
        dot_product(col("embedding"), col("embedding")).as("norm2"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        graft.Tables.dsum(col("norm2"), 9).as("sum_norm2"),
        min(col("norm2")).as("min_norm2"),
        max(col("norm2")).as("max_norm2"))
      .orderBy(col("label"))
  }

  private val l2SqlBody =
    """sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)),
      |  i -> (e.embedding[i]::DOUBLE - q.qv[i]) * (e.embedding[i]::DOUBLE - q.qv[i]))))""".stripMargin

  /** V8+V1: IVF index build + probed search. Full probing (nprobes = all
    * partitions) is exactly equivalent to brute-force KNN, which is what
    * the SQL oracle computes; partial probing is exercised in the spec and
    * the benchmark.
    */
  /** Build-once ensure step: the index is an on-disk artifact keyed by
    * the dataset (like the reference's explicit index-build op); repeated
    * queries amortize the KMeans build exactly as production would.
    */
  private def ensureIvf(spark: SparkSession, dir: String,
      metric: String = "l2"): String = {
    import graft.index.IvfIndex
    // key carries the build parameters: changing them produces a new path
    // instead of silently reusing an index built with the old ones
    val tag = if (metric == "l2") "" else s"${metric}_"
    // v3: index.json now carries formatVersion (loadMeta REJECTS cosine
    // sidecars without it) — the key bump rebuilds rather than trips the
    // gate on sidecars written before the stamp existed
    val dest = graft.Tables.scratch(dir, s"emb_ivf_${tag}np8_v3")
    val metaFile = new org.apache.hadoop.fs.Path(
      new java.io.File(s"${IvfIndex.indexPath(dest, "embedding")}/index.json").getAbsolutePath)
    val fs = metaFile.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(metaFile)) {
      // a (re)build invalidates any HNSW graph built over the old buckets
      val gp = new org.apache.hadoop.fs.Path(new java.io.File(
        graft.index.HnswIndex.graphPath(dest, "embedding")).getAbsolutePath)
      if (fs.exists(gp)) fs.delete(gp, true)
      val r = IvfIndex.build(spark, t(spark, dir, "embeddings"),
        "embedding", "vec_id", dest, numPartitions = 8, metric = metric)
      require(r.success, r.error)
    }
    dest
  }

  /** Ensure the per-bucket HNSW graph sidecar exists over `dest`. */
  private def ensureHnswGraph(spark: SparkSession, dest: String): Unit = {
    import graft.index.HnswIndex
    val gp = new org.apache.hadoop.fs.Path(
      new java.io.File(s"${HnswIndex.graphPath(dest, "embedding")}/_SUCCESS").getAbsolutePath)
    val fs = gp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(gp)) {
      val r = HnswIndex.build(spark, dest, "embedding")
      require(r.success, r.error)
    }
  }

  /** Driver-side fetch of a stored embedding to use as the query vector
    * (shared by every index-gate query; the cost is one pushed-down
    * point lookup).
    */
  private def queryVec(spark: SparkSession, dir: String, qid: Long): Array[Float] =
    t(spark, dir, "embeddings").filter(col("vec_id") === qid)
      .select(col("embedding")).collect().head.getSeq[Float](0).toArray

  /** Exact brute-force L2 top-10 ids — the reference side of every
    * recall gate (deterministic tie-break on vec_id).
    */
  private def exactTop10Ids(spark: SparkSession, dir: String, q: Array[Float]): DataFrame =
    t(spark, dir, "embeddings")
      .select(col("vec_id"), l2_distance(col("embedding"), lit(q.map(_.toDouble))).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .select(col("vec_id"))

  /** Exact brute-force COSINE top-10 ids (the v35 recall reference). */
  private def exactTop10IdsCosine(spark: SparkSession, dir: String, q: Array[Float]): DataFrame =
    t(spark, dir, "embeddings")
      .select(col("vec_id"), cosine_distance(col("embedding"), lit(q.map(_.toDouble))).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .select(col("vec_id"))

  /** Dev/spec hook: ensure the default L2 IVF+HNSW sidecars exist. */
  private[graft] def devEnsureIvfHnsw(spark: SparkSession, dir: String): String = {
    val dest = ensureIvf(spark, dir)
    ensureHnswGraph(spark, dest)
    dest
  }

  def v25KnnIvf(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.IvfIndex
    val dest = ensureIvf(spark, dir)
    val q = queryVec(spark, dir, 0L)
    IvfIndex.search(spark, dest, "embedding", q, 10, nprobes = 8)
      .select(col("vec_id"), col("_distance").as("dist"))
      .orderBy(col("dist"), col("vec_id"))
  }

  /** V8 (IVF_HNSW): per-bucket navigable-graph ANN. With every bucket
    * probed and an ef beam wider than any bucket, the deterministic graph
    * walk reaches the exact top-10 on this data (verified at every sf),
    * so the query carries the exact-KNN oracle — HNSW results are graded
    * as first-class query output, like the reference treats them
    * (`LanceVectorSearch.java:121-210`). [[v26rHnswRecall]] gates the
    * recall property itself.
    *
    * KNOWN BET (documented, deliberate): exactness here is data-dependent —
    * the level-0 beam reaches only the entry point's connected component,
    * and neighbor pruning (cap 2m) can in principle disconnect a bucket
    * graph. If testdata or [[graft.index.HnswIndex.Params]] ever change and
    * this row turns red while [[v26rHnswRecall]]/[[v26pHnswPartialProbe]]
    * stay healthy, the ANN is behaving as designed: re-measure with
    * dev/DevPartialProbe.scala and re-plant the expectations rather than
    * hunting an engine bug.
    */
  def v26KnnHnsw(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.HnswIndex
    val dest = ensureIvf(spark, dir)
    ensureHnswGraph(spark, dest)
    val q = queryVec(spark, dir, 0L)
    HnswIndex.search(spark, dest, "embedding", q, 10, nprobes = 8, ef = 200)
      .select(col("vec_id"), col("_distance").as("dist"))
      .orderBy(col("dist"), col("vec_id"))
  }

  /** Deterministic recall gate for the HNSW index: overlap of the HNSW
    * top-10 with the exact in-engine top-10. The oracle computes the
    * exact side; the planted expectation is full overlap (k = 10,
    * n_overlap = 10) — any recall regression turns this row red.
    */
  def v26rHnswRecall(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.HnswIndex
    val dest = ensureIvf(spark, dir)
    ensureHnswGraph(spark, dest)
    val q = queryVec(spark, dir, 0L)
    val hnswIds = HnswIndex.search(spark, dest, "embedding", q, 10, nprobes = 8, ef = 200)
      .select(col("vec_id"))
    val exactIds = exactTop10Ids(spark, dir, q)
    hnswIds.join(exactIds, "vec_id")
      .agg(count(lit(1)).as("n_overlap"))
      .select(lit(10).as("k"), col("n_overlap"))
  }

  /** Genuinely APPROXIMATE gate: half the buckets probed (nprobes=4 of 8).
    * Unlike v26/v26r (full probe ⇒ exact), this row exercises the
    * partial-probe path the production search actually runs: probe
    * selection must rank the right centroids and the graph walk must
    * surface the true neighbors inside them. Measured overlap at sf0.01 is
    * 9/10 (8/10 at sf0.1); the gate asserts ≥ 7 so a real recall
    * regression — a broken probe ranking, a disconnected graph — turns the
    * row red while run-to-run determinism keeps it stable (fixed seed,
    * fixed insertion order, double accumulation).
    */
  def v26pHnswPartialProbe(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.HnswIndex
    val dest = ensureIvf(spark, dir)
    ensureHnswGraph(spark, dest)
    val q = queryVec(spark, dir, 0L)
    val hnswIds = HnswIndex.search(spark, dest, "embedding", q, 10, nprobes = 4, ef = 200)
      .select(col("vec_id"))
    val exactIds = exactTop10Ids(spark, dir, q)
    hnswIds.join(exactIds, "vec_id")
      .agg(count(lit(1)).as("n_overlap"))
      .select(lit(10).as("k"), lit(4).as("nprobes"),
        (col("n_overlap") >= 7).as("recall_ok"))
  }

  /** ANN recall floor at the production knobs (v45): MEAN recall@10 over
    * ten fixed queries — unlike the single-query v26p/v43r rows, a
    * per-query fluke cannot mask a real regression — for both the IVF
    * partial probe (nprobes=4 of 8) and the HNSW walk (nprobes=4,
    * ef=64), against the brute-force exact top-10. Measured curves live
    * in README ("ANN recall curves", recorded by dev/DevRecallCurve
    * .scala): mean recall 0.81/0.81 at sf0.01, 0.76/0.76 at sf0.1,
    * 1.00/1.00 at sf1.0 (the 10× corpus's replicated vectors share
    * buckets, trivially easy for IVF; the HNSW ef curve there is the
    * meaningful one: 0.75@ef=8 → 1.00@ef=64). Floor asserted at ≥ 0.65
    * so a probe-ranking or graph regression reddens the row while
    * run-to-run determinism (seeded KMeans, fixed insertion order)
    * keeps it stable.
    */
  def v45RecallFloor(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.{HnswIndex, IvfIndex}
    val dest = ensureIvf(spark, dir)
    ensureHnswGraph(spark, dest)
    val queries: Seq[(Long, Array[Float])] = t(spark, dir, "embeddings")
      .filter(col("vec_id") < 10L).select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).toSeq
    // ground truth for ALL ten queries in ONE windowed job (broadcast the
    // ten query vectors, rank per query) — not ten separate top-k scans
    val qdf = { import spark.implicits._; queries.toDF("qid", "qv") }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d"), col("vec_id"))
    val truth: Map[Long, Set[Long]] = t(spark, dir, "embeddings")
      .crossJoin(broadcast(qdf))
      .select(col("qid"), col("vec_id"),
        l2_distance(col("embedding"), col("qv").cast("array<double>")).as("d"))
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rk") <= 10).select(col("qid"), col("vec_id"))
      .collect().groupBy(_.getLong(0))
      .map { case (qid, rows) => qid -> rows.map(_.getLong(1)).toSet }
    def recallOf(search: Array[Float] => DataFrame): Int =
      queries.map { case (qid, q) =>
        search(q).select(col("vec_id")).collect().map(_.getLong(0)).toSet
          .intersect(truth(qid)).size
      }.sum // matched of 100
    val ivf = recallOf(q =>
      IvfIndex.search(spark, dest, "embedding", q, 10, nprobes = 4))
    val hnsw = recallOf(q =>
      HnswIndex.search(spark, dest, "embedding", q, 10, nprobes = 4, ef = 64))
    spark.range(1).select(
      lit(10).as("n_queries"),
      lit(ivf >= 65).as("ivf_floor_met"),
      lit(hnsw >= 65).as("hnsw_floor_met"))
  }

  /** Ensure an IVF_PQ sidecar (L2, 8 buckets, 16 sub-vectors × 8 bits —
    * the reference's PQ defaults, `config/LanceOptions.java:150-163`)
    * exists over `dir`'s embeddings. Separate scratch key from the FLAT
    * index: PQ codes are a build-time artifact, not a search-time option.
    */
  private def ensureIvfPq(spark: SparkSession, dir: String): String = {
    import graft.index.IvfIndex
    val dest = graft.Tables.scratch(dir, "emb_ivfpq_np8_v1")
    val metaFile = new org.apache.hadoop.fs.Path(
      new java.io.File(s"${IvfIndex.indexPath(dest, "embedding")}/index.json").getAbsolutePath)
    val fs = metaFile.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(metaFile)) {
      // a (re)build invalidates any HNSW graph built over the old buckets
      // (same guard as ensureIvf — v29 walks a graph over THESE buckets)
      val gp = new org.apache.hadoop.fs.Path(new java.io.File(
        graft.index.HnswIndex.graphPath(dest, "embedding")).getAbsolutePath)
      if (fs.exists(gp)) fs.delete(gp, true)
      val r = IvfIndex.build(spark, t(spark, dir, "embeddings"),
        "embedding", "vec_id", dest, numPartitions = 8, metric = "l2",
        pq = Some(IvfIndex.PqParams(numSubVectors = 16, numBits = 8)))
      require(r.success, r.error)
    }
    dest
  }

  /** V8 (IVF_PQ): deterministic recall gate for the ADC + exact-refine
    * search path — the one index mode previously covered by specs only.
    * Full probing isolates what the gate measures to the PQ approximation:
    * codes must rank the true neighbors into the k×refine window and the
    * exact refine must re-order them correctly. Codebooks are seeded
    * KMeans, the ADC fold is a deterministic codegen'd expression, and the
    * planted floor (10/10 at sf0.01 and sf0.1, asserted ≥ 8) reddens on
    * any quantization-quality regression.
    */
  def v28KnnIvfPq(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.IvfIndex
    val dest = ensureIvfPq(spark, dir)
    val q = queryVec(spark, dir, 0L)
    val pqIds = IvfIndex.searchPq(spark, dest, "embedding", q, 10,
        nprobes = 8, refineFactor = 4)
      .select(col("vec_id"))
    val exactIds = exactTop10Ids(spark, dir, q)
    pqIds.join(exactIds, "vec_id")
      .agg(count(lit(1)).as("n_overlap"))
      .select(lit(10).as("k"), lit(4).as("refine"),
        (col("n_overlap") >= 8).as("recall_ok"))
  }

  /** V8 (IVF_HNSW_PQ): the composite index mode — graph traversal scored
    * by the ADC lookup table, ef survivors refined exactly on raw
    * vectors. Completes the gated index-mode matrix (FLAT v25, HNSW
    * v26/v27, PQ v28). Same planted-floor recall-gate shape as v28; the
    * walk-on-ADC path can diverge from the exact walk, so the floor is
    * the measured overlap (10/10 at sf0.01 and sf0.1, asserted ≥ 8).
    */
  def v29KnnHnswPq(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.HnswIndex
    val dest = ensureIvfPq(spark, dir)
    ensureHnswGraph(spark, dest)
    val q = queryVec(spark, dir, 0L)
    val annIds = HnswIndex.searchPq(spark, dest, "embedding", q, 10,
        nprobes = 8, ef = 200)
      .select(col("vec_id"))
    val exactIds = exactTop10Ids(spark, dir, q)
    annIds.join(exactIds, "vec_id")
      .agg(count(lit(1)).as("n_overlap"))
      .select(lit(10).as("k"), lit(200).as("ef"),
        (col("n_overlap") >= 8).as("recall_ok"))
  }

  /** Ensure a COSINE IVF_PQ sidecar: codebooks trained on — and codes
    * encoding — L2-normalized vectors ([[graft.index.IvfIndex.PqMeta]]
    * `normalized`), the build convention cosine ADC requires.
    */
  private def ensureIvfPqCosine(spark: SparkSession, dir: String): String = {
    import graft.index.IvfIndex
    val dest = graft.Tables.scratch(dir, "emb_ivfpq_cos_np8_v1")
    val metaFile = new org.apache.hadoop.fs.Path(
      new java.io.File(s"${IvfIndex.indexPath(dest, "embedding")}/index.json").getAbsolutePath)
    val fs = metaFile.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(metaFile)) {
      val r = IvfIndex.build(spark, t(spark, dir, "embeddings"),
        "embedding", "vec_id", dest, numPartitions = 8, metric = "cosine",
        pq = Some(IvfIndex.PqParams(numSubVectors = 16, numBits = 8)))
      require(r.success, r.error)
    }
    dest
  }

  /** Cosine IVF_PQ (reference parity: Lance-Rust serves every metric
    * through IVF_PQ, `LanceVectorSearch.java:274-285`): ADC runs on the
    * NORMALIZED query against normalized-encoded codes — on the unit
    * sphere ‖qₙ−xₙ‖² = 2(1−cos) is monotone in cosine distance — and the
    * exact refine re-ranks on raw vectors under true cosine. Same
    * planted-floor recall-gate shape as v28 (measured 10/10 at sf0.01 and
    * sf0.1, asserted ≥ 8).
    */
  def v35KnnIvfPqCosine(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.IvfIndex
    val dest = ensureIvfPqCosine(spark, dir)
    val q = queryVec(spark, dir, 1L)
    val pqIds = IvfIndex.searchPq(spark, dest, "embedding", q, 10,
        nprobes = 8, refineFactor = 4)
      .select(col("vec_id"))
    val exactIds = exactTop10IdsCosine(spark, dir, q)
    pqIds.join(exactIds, "vec_id")
      .agg(count(lit(1)).as("n_overlap"))
      .select(lit(10).as("k"), lit(4).as("refine"),
        (col("n_overlap") >= 8).as("recall_ok"))
  }

  /** Filtered GRAPH search (the one filter×index combination previously
    * rejected): the pre-filter is evaluated during the level-0 beam —
    * non-matching nodes are traversed but never returned — with loud
    * geometric ef-widening on shortfall. Full probing plus a beam wider
    * than the per-bucket match count makes the walk exhaustive over each
    * bucket's connected component, so the result is the exact KNN over
    * the filtered subset — which is what the SQL oracle computes (same
    * exactness bet as v26, documented there).
    */
  def v36KnnHnswFiltered(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.HnswIndex
    val dest = ensureIvf(spark, dir)
    ensureHnswGraph(spark, dest)
    val q = queryVec(spark, dir, 0L)
    HnswIndex.search(spark, dest, "embedding", q, 10, nprobes = 8, ef = 200,
        metric = Some("l2"), filter = Some(col("label") === 3))
      .select(col("vec_id"), col("_distance").as("dist"))
      .orderBy(col("dist"), col("vec_id"))
  }

  /** Query side of the exact-KNN join gates. At the oracle SFs
    * (sf0.01 = 500 rows, sf0.1 = 2000) the FULL table queries — the
    * DuckDB cross-join + row_number oracle is the exact self-join. At
    * larger SFs that recompute is by-construction quadratic (it was
    * 37% of the round-12 sf1.0 bench headline, masking real engine
    * regressions), so the gate degrades to a deterministic planted
    * SUBSET of queries (the v26r posture): every sampled query still
    * drives the identical distributed join path, the per-query work it
    * measures is the engine's, and nothing about the index changes.
    * vec_id stride, never rand() — reruns sample identically. */
  private val knnJoinCorpusRows =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  /** Cheap driver-side fingerprint of the corpus parquet (file lengths +
    * mtimes): a scratch corpus REWRITTEN within one JVM (test suites do)
    * must invalidate the cached count, or the stride silently samples a
    * different query set than a fresh JVM would. */
  private def corpusStamp(dir: String): String = {
    val f = new java.io.File(dir, "embeddings.parquet")
    val leaves =
      if (f.isDirectory) Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      else Seq(f)
    leaves.sortBy(_.getName)
      .map(l => s"${l.getName}:${l.length}:${l.lastModified}").mkString("|")
  }
  private def knnJoinQueries(spark: SparkSession, dir: String): DataFrame = {
    val cap = 2000L
    val emb = t(spark, dir, "embeddings")
    // count once per corpus STATE (dir + file stamp) and reuse — v37 and
    // v40 each run this several times per bench (cold + warm), and a
    // count job inside the measured window would charge the SAMPLER to
    // the gate; the stamp keys out a regenerated corpus
    val n: Long = knnJoinCorpusRows
      .computeIfAbsent(s"$dir#${corpusStamp(dir)}", _ => emb.count())
    if (n <= cap) emb
    else emb.filter(pmod(col("vec_id"), lit((n + cap - 1) / cap)) === 0)
  }

  /** Flip-geometry KNN JOIN (corpus-scale query sets): the ENTIRE
    * embeddings table joined to itself, k=3 — the query side is never
    * collected to the driver; each query row ranks the broadcast
    * centroids in an executor, explodes into its probed buckets, and
    * both sides shuffle on the bucket key (the d47 blocked-join shape).
    * Full probing ⇒ the exact KNN self-join, which is what the oracle's
    * cross-join + row_number computes; identical results to the
    * broadcast geometry by construction. Above the oracle SFs the
    * query side strides down ([[knnJoinQueries]]).
    */
  def v37KnnJoinFlipped(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.IvfIndex
    val dest = ensureIvf(spark, dir)
    val qs = knnJoinQueries(spark, dir)
    IvfIndex.searchJoin(spark, dest, "embedding", qs, "vec_id", k = 3,
        nprobes = 8, geometry = "flipped")
      .select(col("query_id"), col("_rank").as("rk"), col("vec_id"),
        col("_distance").as("dist"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** Float64 vector search (v41): the reference's vector field admits
    * Float32 AND Float64 (ref:converter/LanceTypeConverter.java:267-295);
    * this gate pins the double-precision leg of the index surface. The
    * corpus is the embeddings table cast to `array<double>`; IVF build
    * quantizes bucket ASSIGNMENT through float32 centroids (k-means
    * precision is not a correctness surface — any partition works) but
    * stores and scores the ORIGINAL doubles: `_distance` is the codegen'd
    * double accumulation over the double column, so full probing is
    * bit-identical to the oracle's brute force over `embedding::DOUBLE[]`.
    */
  def v41KnnDouble(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.IvfIndex
    val dest = graft.Tables.scratch(dir, "emb_ivf_f64_np8_v1")
    val metaFile = new org.apache.hadoop.fs.Path(new java.io.File(
      s"${IvfIndex.indexPath(dest, "embedding")}/index.json").getAbsolutePath)
    val fs = metaFile.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(metaFile)) {
      val r = IvfIndex.build(spark,
        t(spark, dir, "embeddings")
          .withColumn("embedding", col("embedding").cast("array<double>")),
        "embedding", "vec_id", dest, numPartitions = 8)
      require(r.success, r.error)
    }
    val q = queryVec(spark, dir, 0L)
    IvfIndex.search(spark, dest, "embedding", q, 10, nprobes = 8)
      .select(col("vec_id"), col("_distance").as("dist"))
      .orderBy(col("dist"), col("vec_id"))
  }

  /** IVF_PQ over a FLOAT64 corpus (v46): codebooks quantize bucket and
    * code ASSIGNMENT through float32-insensitive k-means (quantization
    * precision only moves which cell a vector lands in), but the STORED
    * column, the refine window's exact re-scoring and `_distance` all
    * stay double — so full probing with an exact refine equals the
    * brute-force KNN over `embedding::DOUBLE[]`, the same oracle v41
    * pins for IVF_FLAT (the v25 equivalence pattern applied to the
    * memory-efficient mode). refineFactor 8 keeps the ADC window far
    * above the measured need (v28's window already ranked 10/10).
    */
  def v46KnnPqDouble(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.IvfIndex
    val dest = graft.Tables.scratch(dir, "emb_ivfpq_f64_np8_v1")
    val metaFile = new org.apache.hadoop.fs.Path(new java.io.File(
      s"${IvfIndex.indexPath(dest, "embedding")}/index.json").getAbsolutePath)
    val fs = metaFile.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(metaFile)) {
      val r = IvfIndex.build(spark,
        t(spark, dir, "embeddings")
          .withColumn("embedding", col("embedding").cast("array<double>")),
        "embedding", "vec_id", dest, numPartitions = 8,
        pq = Some(IvfIndex.PqParams(numSubVectors = 16, numBits = 8)))
      require(r.success, r.error)
    }
    val q = queryVec(spark, dir, 0L)
    IvfIndex.searchPq(spark, dest, "embedding", q, 10, nprobes = 8,
        refineFactor = 8)
      .select(col("vec_id"), col("_distance").as("dist"))
      .orderBy(col("dist"), col("vec_id"))
  }

  /** HNSW over FLOAT64 with exact-double re-rank (v47, round 14): the
    * graph walks float32 nodes by design ([[graft.index.HnswIndex]]'s
    * memory posture), so plain HNSW `_distance` over a double corpus
    * quantizes sub-float32 detail. The opt-in
    * [[graft.index.HnswIndex.searchRerankDouble]] re-ranks the walk's
    * candidate pool on the RAW double column at read time — full
    * probing + exact re-rank must therefore equal the brute-force
    * double KNN, the same oracle v41 pins for FLAT and v46 for PQ.
    */
  def v47HnswDoubleRerank(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.{HnswIndex, IvfIndex}
    val dest = graft.Tables.scratch(dir, "emb_hnsw_f64_np8_v1")
    val conf = spark.sessionState.newHadoopConf()
    val metaFile = new org.apache.hadoop.fs.Path(new java.io.File(
      s"${IvfIndex.indexPath(dest, "embedding")}/index.json").getAbsolutePath)
    val fs = metaFile.getFileSystem(conf)
    if (!fs.exists(metaFile)) {
      val r = IvfIndex.build(spark,
        t(spark, dir, "embeddings")
          .withColumn("embedding", col("embedding").cast("array<double>")),
        "embedding", "vec_id", dest, numPartitions = 8)
      require(r.success, r.error)
    }
    val gp = new org.apache.hadoop.fs.Path(new java.io.File(
      s"${HnswIndex.graphPath(dest, "embedding")}/_SUCCESS").getAbsolutePath)
    if (!fs.exists(gp))
      require(HnswIndex.build(spark, dest, "embedding").success)
    val qd = queryVec(spark, dir, 0L).map(_.toDouble)
    HnswIndex.searchRerankDouble(spark, dest, "embedding", qd, 10,
        nprobes = 8, ef = 200)
      .select(col("vec_id"), col("_distance").as("dist"))
      .orderBy(col("dist"), col("vec_id"))
  }

  /** KNN JOIN through pure SQL (v40): the `vector_search_join` TVF over
    * a temp view drives the SAME v37 flip-geometry path — query side
    * shuffled on bucket key, never driver-collected — so a hash match
    * against v37's oracle proves the SQL surface reaches the distributed
    * plan, not a re-implementation. Explicit 'flipped' keeps TVF
    * resolution job-free (no auto-geometry count).
    */
  def v40KnnJoinSql(spark: SparkSession, dir: String): DataFrame = {
    val dest = ensureIvf(spark, dir)
    graft.MetaTvfs.register(spark)
    // same query-side stride as v37: the two gates stay comparable
    // (SQL surface == API) at every SF
    knnJoinQueries(spark, dir).createOrReplaceTempView("emb_v40")
    spark.sql(
      s"""SELECT query_id, _rank AS rk, vec_id, _distance AS dist
         |FROM vector_search_join('$dest', 'embedding', 'emb_v40', 'vec_id',
         |                        3, 8, 'l2', 'flipped')
         |ORDER BY query_id, rk""".stripMargin)
  }

  /** V3 (filtered vector search) end-to-end through the index path: the
    * pre-filter applies INSIDE the probed buckets before the top-k, so
    * all k results satisfy it (search-within-index semantics,
    * `LanceVectorSearch.java:170-174`). Full probing makes the result
    * exactly the brute-force KNN over the filtered subset — which is what
    * the SQL oracle computes — so the gate proves the filter composes
    * with bucket pruning and the shortfall-widening guard stays silent on
    * the satisfiable path.
    */
  def v30KnnFiltered(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.IvfIndex
    val dest = ensureIvf(spark, dir)
    val q = queryVec(spark, dir, 0L)
    IvfIndex.search(spark, dest, "embedding", q, 10, nprobes = 8,
        filter = Some(col("label") === 3))
      .select(col("vec_id"), col("_distance").as("dist"))
      .orderBy(col("dist"), col("vec_id"))
  }

  /** §7.3 ANN optimizer rule end-to-end: a plain distance-orderBy-limit
    * over a LANCE scan, with `spark.graft.ann.useIndex` enabled, is
    * rewritten by the Catalyst rule into the bucket-pruned index probe —
    * the driver gate for the path AnnIndexRewriteSpec covers in specs.
    * The probe MUST be collected while the conf is still set: the rule
    * reads the conf at optimize time, and Verify/Bench execute the
    * returned DataFrame long after this function restores it — a lazy
    * return here would re-optimize WITHOUT the rule and gate the
    * brute-force path instead. k rows are driver-local by definition, so
    * the collect is the probe's own top-k output, not a driver-side scan.
    * `rule_fired` is read off the same finalized plan that produced the
    * rows (the probe's `__ivf_part` partition filter), so a
    * silently-not-firing rule turns the row red even though full probing
    * keeps the data rows correct. Full probing (nprobes = all 8) ⇒
    * results equal brute-force KNN ⇒ the data rows carry a real SQL
    * oracle.
    */
  def v31AnnRewrite(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.IvfIndex
    val dest = graft.Tables.scratch(dir, "emb_lance_ann_v1")
    val root = new org.apache.hadoop.fs.Path(new java.io.File(dest).getAbsolutePath)
    val fs = graft.format.LanceFormat.fileSystem(root, spark.sessionState.newHadoopConf())
    if (graft.format.LanceFormat.latestVersion(fs, root).isEmpty) {
      t(spark, dir, "embeddings")
        .write.format("lance").mode("overwrite").save(dest)
    }
    val metaFile = new org.apache.hadoop.fs.Path(
      new java.io.File(s"${IvfIndex.indexPath(dest, "embedding")}/index.json").getAbsolutePath)
    if (!fs.exists(metaFile)) {
      val r = IvfIndex.build(spark, spark.read.format("lance").load(dest),
        "embedding", "vec_id", dest, numPartitions = 8)
      require(r.success, r.error)
    }
    val q = queryVec(spark, dir, 0L)
    // save/restore: a caller's session-level opt-in must survive this gate
    val prev = Seq("spark.graft.ann.useIndex", "spark.graft.ann.nprobes")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.graft.ann.useIndex", "true")
    spark.conf.set("spark.graft.ann.nprobes", "8")
    try {
      // collect the BARE knnSearch: that Sort+Limit-over-scan is the rule's
      // match pattern — composing another orderBy on top lets the optimizer
      // eliminate the inner sort and the rule (correctly) no longer fires
      val knn = graft.Lance.knnSearch(
        spark.read.format("lance").load(dest), "embedding", q, 10)
      val rows = knn.collect() // force the probe while the rule is on
      val fired = knn.queryExecution.executedPlan.toString
        .contains("PartitionFilters: [__ivf_part")
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), knn.schema)
        .select(col("vec_id"), col("_distance").as("dist"))
        .withColumn("rule_fired", lit(fired))
        .orderBy(col("dist"), col("vec_id"))
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  /** v31's filtered twin: a `df.filter(label = 3)` BEFORE the
    * distance-orderBy-limit must still be rewritten into the index probe,
    * with the predicate forwarded as the probe's pre-filter (V3
    * semantics). Full probe (nprobes = numPartitions) makes the result
    * the exact filtered KNN — the oracle's brute force — while
    * `rule_fired` plants proof the rewrite (not the exact scan) answered.
    */
  def v39AnnRewriteFiltered(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.IvfIndex
    val dest = graft.Tables.scratch(dir, "emb_lance_ann_v1")
    val root = new org.apache.hadoop.fs.Path(new java.io.File(dest).getAbsolutePath)
    val fs = graft.format.LanceFormat.fileSystem(root, spark.sessionState.newHadoopConf())
    if (graft.format.LanceFormat.latestVersion(fs, root).isEmpty) {
      t(spark, dir, "embeddings")
        .write.format("lance").mode("overwrite").save(dest)
    }
    val metaFile = new org.apache.hadoop.fs.Path(
      new java.io.File(s"${IvfIndex.indexPath(dest, "embedding")}/index.json").getAbsolutePath)
    if (!fs.exists(metaFile)) {
      val r = IvfIndex.build(spark, spark.read.format("lance").load(dest),
        "embedding", "vec_id", dest, numPartitions = 8)
      require(r.success, r.error)
    }
    val q = queryVec(spark, dir, 0L)
    val prev = Seq("spark.graft.ann.useIndex", "spark.graft.ann.nprobes")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.graft.ann.useIndex", "true")
    spark.conf.set("spark.graft.ann.nprobes", "8")
    try {
      val knn = graft.Lance.knnSearch(
        spark.read.format("lance").load(dest).filter(col("label") === 3),
        "embedding", q, 10)
      val rows = knn.collect()
      // the filtered probe materializes at plan time (loud-widening
      // contract), so the fired plan is a LocalTableScan with no
      // TakeOrderedAndProject — the exact scan's signature
      val planStr = knn.queryExecution.executedPlan.toString
      val fired = planStr.contains("LocalTableScan") &&
        !planStr.contains("TakeOrderedAndProject")
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), knn.schema)
        .select(col("vec_id"), col("_distance").as("dist"))
        .withColumn("rule_fired", lit(fired))
        .orderBy(col("dist"), col("vec_id"))
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  /** V8 under cosine: the IVF buckets and the per-bucket graphs are built
    * on the cosine metric (reference delegates all three metrics to its
    * index, `LanceVectorSearch.java:274-285`). Same exactness argument as
    * [[v26KnnHnsw]] — full probing + wide beam ⇒ exact oracle.
    */
  def v27KnnHnswCosine(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.HnswIndex
    val dest = ensureIvf(spark, dir, metric = "cosine")
    ensureHnswGraph(spark, dest)
    val q = queryVec(spark, dir, 1L)
    HnswIndex.search(spark, dest, "embedding", q, 10, nprobes = 8, ef = 200,
        metric = Some("cosine"))
      .select(col("vec_id"), col("_distance").as("dist"))
      .orderBy(col("dist"), col("vec_id"))
  }

  /** V8 (IVF_HNSW, dot metric): max-inner-product search through the graph
    * walk — buckets are L2-assigned (the standard MIPS approximation,
    * documented in [[graft.index.IvfIndex.centroidDist]]) but probe
    * ranking, edge selection, and scoring all run on −⟨q,x⟩. Full probe +
    * wide beam makes the result the exact MIPS top-10, which is what the
    * oracle computes — closing the one index-metric branch
    * (`HnswIndex.metricDist` dot) that no gated query exercised (it lived
    * only in a dev harness). Same exactness bet as v26, documented there.
    */
  def v32KnnHnswDot(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.HnswIndex
    val dest = ensureIvf(spark, dir, metric = "dot")
    ensureHnswGraph(spark, dest)
    val q = queryVec(spark, dir, 2L)
    HnswIndex.search(spark, dest, "embedding", q, 10, nprobes = 8, ef = 200,
        metric = Some("dot"))
      .select(col("vec_id"), col("_distance").as("dist"))
      .orderBy(col("dist"), col("vec_id"))
  }

  /** Batch KNN JOIN (retrieval shape): top-3 neighbors for five query
    * vectors in ONE distributed plan — query→bucket pairs broadcast to
    * the bucket scan, per-query top-k as a window over candidates only
    * ([[graft.index.IvfIndex.searchJoin]]). Full probing makes it the
    * exact KNN join, which is what the oracle's cross-join + row_number
    * computes; partial-probe scaling is spec'd.
    */
  def v33KnnJoin(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.IvfIndex
    val dest = ensureIvf(spark, dir)
    val qs = t(spark, dir, "embeddings").filter(col("vec_id") < 5)
    IvfIndex.searchJoin(spark, dest, "embedding", qs, "vec_id", k = 3, nprobes = 8)
      .select(col("query_id"), col("_rank").as("rk"), col("vec_id"),
        col("_distance").as("dist"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** Incremental index maintenance end-to-end: the index is built BEFORE
    * the query vector's own row exists — the appended fragments (including
    * vec_id 0 itself, the zero-distance answer) only enter the index via
    * [[graft.index.IvfIndex.refresh]], which delta-assigns them to the
    * existing centroids. Full probing ⇒ brute-force-exact over the FULL
    * table, which is what the oracle computes — a refresh that missed or
    * double-indexed rows turns the hash red. Rebuilds from scratch every
    * run (refresh semantics are the thing under test).
    */
  def v34IndexRefresh(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.IvfIndex
    val dest = graft.Tables.scratch(dir, "emb_refresh_v1")
    val root = new org.apache.hadoop.fs.Path(new java.io.File(dest).getAbsolutePath)
    val fs = graft.format.LanceFormat.fileSystem(root, spark.sessionState.newHadoopConf())
    if (fs.exists(root)) fs.delete(root, true)
    val emb = t(spark, dir, "embeddings")
    emb.filter(col("vec_id") >= 100).write.format("lance").mode("overwrite").save(dest)
    val r = IvfIndex.build(spark, spark.read.format("lance").load(dest),
      "embedding", "vec_id", dest, numPartitions = 8)
    require(r.success, r.error)
    emb.filter(col("vec_id") < 100).write.format("lance").mode("append").save(dest)
    val added = IvfIndex.refresh(spark, dest, "embedding")
    require(added > 0, s"refresh indexed $added rows; the append planted 100")
    val q = queryVec(spark, dir, 0L)
    IvfIndex.search(spark, dest, "embedding", q, 10, nprobes = 8)
      .select(col("vec_id"), col("_distance").as("dist"))
      .orderBy(col("dist"), col("vec_id"))
  }

  /** Incremental GRAPH maintenance end-to-end: the IVF index AND its
    * per-bucket HNSW graphs are built before the query vector's own row
    * exists; the append enters via [[graft.index.IvfIndex.refresh]],
    * which delta-assigns the new fragments and rebuilds ONLY the touched
    * buckets' graphs ([[graft.index.HnswIndex.refreshBuckets]] — other
    * buckets' graph files never rewritten). Full probe + wide beam ⇒
    * brute-force-exact over the full table (same oracle as v34); a
    * refresh that left a bucket's graph stale would miss the appended
    * zero-distance row and redden the hash.
    */
  def v38GraphRefresh(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.{HnswIndex, IvfIndex}
    val dest = graft.Tables.scratch(dir, "emb_graph_refresh_v1")
    val root = new org.apache.hadoop.fs.Path(new java.io.File(dest).getAbsolutePath)
    val fs = graft.format.LanceFormat.fileSystem(root, spark.sessionState.newHadoopConf())
    if (fs.exists(root)) fs.delete(root, true)
    val emb = t(spark, dir, "embeddings")
    emb.filter(col("vec_id") >= 100).write.format("lance").mode("overwrite").save(dest)
    val r = IvfIndex.build(spark, spark.read.format("lance").load(dest),
      "embedding", "vec_id", dest, numPartitions = 8)
    require(r.success, r.error)
    require(HnswIndex.build(spark, dest, "embedding").success)
    emb.filter(col("vec_id") < 100).write.format("lance").mode("append").save(dest)
    val added = IvfIndex.refresh(spark, dest, "embedding")
    require(added > 0, s"refresh indexed $added rows; the append planted 100")
    val q = queryVec(spark, dir, 0L)
    HnswIndex.search(spark, dest, "embedding", q, 10, nprobes = 8, ef = 500)
      .select(col("vec_id"), col("_distance").as("dist"))
      .orderBy(col("dist"), col("vec_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v38_graph_refresh" -> v38GraphRefresh,
    "v21_knn_l2" -> v21KnnL2,
    "v32_knn_hnsw_dot" -> v32KnnHnswDot,
    "v33_knn_join" -> v33KnnJoin,
    "v34_index_refresh" -> v34IndexRefresh,
    "v25_knn_ivf" -> v25KnnIvf,
    "v26_knn_hnsw" -> v26KnnHnsw,
    "v26r_hnsw_recall" -> v26rHnswRecall,
    "v26p_hnsw_partial" -> v26pHnswPartialProbe,
    "v27_knn_hnsw_cosine" -> v27KnnHnswCosine,
    "v28_knn_ivfpq" -> v28KnnIvfPq,
    "v29_knn_hnswpq" -> v29KnnHnswPq,
    "v30_knn_filtered" -> v30KnnFiltered,
    "v31_ann_rewrite" -> v31AnnRewrite,
    "v39_ann_rewrite_filtered" -> v39AnnRewriteFiltered,
    "v35_knn_ivfpq_cosine" -> v35KnnIvfPqCosine,
    "v36_knn_hnsw_filtered" -> v36KnnHnswFiltered,
    "v37_knn_join_flipped" -> v37KnnJoinFlipped,
    "v40_knn_join_sql" -> v40KnnJoinSql,
    "v41_knn_double" -> v41KnnDouble,
    "v46_knn_pq_double" -> v46KnnPqDouble,
    "v47_hnsw_double_rerank" -> v47HnswDoubleRerank,
    "v22_knn_cosine" -> v22KnnCosine,
    "v23_dot_similarity" -> v23DotSimilarity,
    "v24_norm_stats" -> v24NormStats,
    "v42_maxsim" -> v42MaxSim,
    "v43_maxsim_indexed" -> v43MaxSimIndexed,
    "v43r_maxsim_partial" -> v43rMaxSimPartial,
    "v44_maxsim_sql" -> v44MaxSimSql,
    "v45_recall_floor" -> v45RecallFloor,
  )

  val oracleSql: Map[String, String] = Map(
    // v26: full-probe + wide-beam HNSW is exact on this data, and every
    // distance is the same left-to-right double accumulation both engines
    // compute — the oracle is the brute-force KNN itself
    "v26_knn_hnsw" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, $l2SqlBody AS dist
         |FROM embeddings e, q
         |ORDER BY dist, e.vec_id LIMIT 10""".stripMargin,
    "v26r_hnsw_recall" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
         |exact AS (SELECT e.vec_id, $l2SqlBody AS dist
         |  FROM embeddings e, q ORDER BY dist, e.vec_id LIMIT 10)
         |SELECT 10 AS k, COUNT(*) AS n_overlap FROM exact""".stripMargin,
    // the partial-probe expectation is the measured floor (9/10 at the
    // sf0.01 gate, asserted >= 7) — the oracle states the planted outcome
    "v26p_hnsw_partial" ->
      "SELECT 10 AS k, 4 AS nprobes, true AS recall_ok",
    // planted outcome: measured 10/10 overlap at sf0.01 and sf0.1,
    // asserted >= 8 so run-to-run determinism keeps the row stable while
    // a real PQ-quality regression turns it red
    "v28_knn_ivfpq" ->
      "SELECT 10 AS k, 4 AS refine, true AS recall_ok",
    "v29_knn_hnswpq" ->
      "SELECT 10 AS k, 200 AS ef, true AS recall_ok",
    // planted outcome: measured overlap vs the exact cosine top-10 at
    // sf0.01 and sf0.1, asserted >= 8 (same stability argument as v28)
    "v35_knn_ivfpq_cosine" ->
      "SELECT 10 AS k, 4 AS refine, true AS recall_ok",
    // filtered graph walk at full probe = exact KNN over the filtered
    // subset (beam wider than the per-bucket match count is exhaustive
    // over each connected component)
    "v36_knn_hnsw_filtered" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, $l2SqlBody AS dist
         |FROM embeddings e, q WHERE e.label = 3
         |ORDER BY dist, e.vec_id LIMIT 10""".stripMargin,
    // exact KNN self-join at full probe: cross join + per-query
    // row_number over the WHOLE table (the flipped geometry's result is
    // identical to broadcast by construction; only the plan differs)
    "v37_knn_join_flipped" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings),
         |d AS (SELECT q.q_id, e.vec_id, $l2SqlBody AS dist
         |  FROM embeddings e, q),
         |r AS (SELECT *, row_number()
         |    OVER (PARTITION BY q_id ORDER BY dist, vec_id) AS rk FROM d)
         |SELECT q_id AS query_id, CAST(rk AS INT) AS rk, vec_id, dist
         |FROM r WHERE rk <= 3 ORDER BY query_id, rk""".stripMargin,
    // v40 drives the SAME flipped path through SQL — identical oracle
    "v40_knn_join_sql" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings),
         |d AS (SELECT q.q_id, e.vec_id, $l2SqlBody AS dist
         |  FROM embeddings e, q),
         |r AS (SELECT *, row_number()
         |    OVER (PARTITION BY q_id ORDER BY dist, vec_id) AS rk FROM d)
         |SELECT q_id AS query_id, CAST(rk AS INT) AS rk, vec_id, dist
         |FROM r WHERE rk <= 3 ORDER BY query_id, rk""".stripMargin,
    // the optimizer-rule gate: brute-force rows (full probe = exact) plus
    // the planted plan outcome — the probe's partition filter must appear
    "v31_ann_rewrite" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, $l2SqlBody AS dist, true AS rule_fired
         |FROM embeddings e, q
         |ORDER BY dist, e.vec_id LIMIT 10""".stripMargin,
    // rewrite fires AND the filter survives it: exact filtered KNN
    "v39_ann_rewrite_filtered" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, $l2SqlBody AS dist, true AS rule_fired
         |FROM embeddings e, q WHERE e.label = 3
         |ORDER BY dist, e.vec_id LIMIT 10""".stripMargin,
    // full probe + pre-filter = exact KNN over the filtered subset
    "v30_knn_filtered" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, $l2SqlBody AS dist
         |FROM embeddings e, q WHERE e.label = 3
         |ORDER BY dist, e.vec_id LIMIT 10""".stripMargin,
    "v27_knn_hnsw_cosine" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 1)
        |SELECT e.vec_id,
        | 1.0 - list_sum(list_transform(generate_series(1, len(e.embedding)),
        |     i -> e.embedding[i]::DOUBLE * q.qv[i]))
        |   / (sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)),
        |        i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))
        |     * sqrt(list_sum(list_transform(generate_series(1, len(q.qv)),
        |        i -> q.qv[i] * q.qv[i])))) AS dist
        |FROM embeddings e, q
        |ORDER BY dist, e.vec_id LIMIT 10""".stripMargin,
    "v25_knn_ivf" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, $l2SqlBody AS dist
         |FROM embeddings e, q
         |ORDER BY dist, e.vec_id LIMIT 10""".stripMargin,
    // v41: the stored column IS double, so the oracle's ::DOUBLE[] cast
    // reads the exact same values the engine scores — same brute force
    "v41_knn_double" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, $l2SqlBody AS dist
         |FROM embeddings e, q
         |ORDER BY dist, e.vec_id LIMIT 10""".stripMargin,
    // v46: IVF_PQ over the double corpus — full probe + exact refine on
    // the raw doubles equals the same brute force v41 pins for FLAT
    "v46_knn_pq_double" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, $l2SqlBody AS dist
         |FROM embeddings e, q
         |ORDER BY dist, e.vec_id LIMIT 10""".stripMargin,
    // v47: HNSW graph walk (float32) + exact-double re-rank == the same
    // brute-force double KNN (the doc'd opt-in closing the last float64
    // fidelity gap)
    "v47_hnsw_double_rerank" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, $l2SqlBody AS dist
         |FROM embeddings e, q
         |ORDER BY dist, e.vec_id LIMIT 10""".stripMargin,
    "v21_knn_l2" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, $l2SqlBody AS dist
         |FROM embeddings e, q WHERE e.vec_id <> 0
         |ORDER BY dist, e.vec_id LIMIT 10""".stripMargin,
    "v22_knn_cosine" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 1)
        |SELECT e.vec_id,
        | 1.0 - list_sum(list_transform(generate_series(1, len(e.embedding)),
        |     i -> e.embedding[i]::DOUBLE * q.qv[i]))
        |   / (sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)),
        |        i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))
        |     * sqrt(list_sum(list_transform(generate_series(1, len(q.qv)),
        |        i -> q.qv[i] * q.qv[i])))) AS dist
        |FROM embeddings e, q WHERE e.vec_id <> 1
        |ORDER BY dist, e.vec_id LIMIT 10""".stripMargin,
    // refresh + full probe = brute-force KNN over the FULL table (the
    // query's own zero-distance row arrives via the refreshed delta)
    "v34_index_refresh" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, $l2SqlBody AS dist
         |FROM embeddings e, q
         |ORDER BY dist, e.vec_id LIMIT 10""".stripMargin,
    // graph refresh + full probe + wide beam = brute-force KNN over the
    // FULL table (the zero-distance row arrives via the refreshed delta
    // and its bucket's rebuilt graph)
    "v38_graph_refresh" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, $l2SqlBody AS dist
         |FROM embeddings e, q
         |ORDER BY dist, e.vec_id LIMIT 10""".stripMargin,
    // exact KNN join at full probe: cross join + per-query row_number
    "v33_knn_join" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
         |  FROM embeddings WHERE vec_id < 5),
         |d AS (SELECT q.q_id, e.vec_id, $l2SqlBody AS dist
         |  FROM embeddings e, q),
         |r AS (SELECT *, row_number()
         |    OVER (PARTITION BY q_id ORDER BY dist, vec_id) AS rk FROM d)
         |SELECT q_id AS query_id, CAST(rk AS INT) AS rk, vec_id, dist
         |FROM r WHERE rk <= 3 ORDER BY query_id, rk""".stripMargin,
    // full-probe + wide-beam dot-metric HNSW is exact MIPS on this data;
    // _distance = -dot, the same left-to-right double accumulation
    "v32_knn_hnsw_dot" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 2)
        |SELECT e.vec_id,
        | -list_sum(list_transform(generate_series(1, len(e.embedding)),
        |     i -> e.embedding[i]::DOUBLE * q.qv[i])) AS dist
        |FROM embeddings e, q
        |ORDER BY dist, e.vec_id LIMIT 10""".stripMargin,
    "v42_maxsim" -> maxSimOracleSql,
    // v43 = the SAME semantics through the index path at full probe — one
    // oracle definition, so flat scan and index rerank can never diverge
    "v43_maxsim_indexed" -> maxSimOracleSql,
    // planted outcome: measured 10/10 overlap at sf0.01 and sf0.1 under
    // nprobes=4 + candidatesPerQuery=32, asserted >= 7 (v26p stability
    // argument)
    "v43r_maxsim_partial" ->
      "SELECT 10 AS k, 4 AS nprobes, true AS recall_ok",
    // v45: floors recorded from dev/DevRecallCurve.scala; the gate
    // asserts them, the oracle pins the asserted shape
    "v45_recall_floor" ->
      "SELECT 10 AS n_queries, TRUE AS ivf_floor_met, TRUE AS hnsw_floor_met",
    // v44 drives the SAME two-phase path through SQL — identical oracle
    "v44_maxsim_sql" -> maxSimOracleSql,
    "v23_dot_similarity" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 2)
        |SELECT e.vec_id,
        | list_sum(list_transform(generate_series(1, len(e.embedding)),
        |     i -> e.embedding[i]::DOUBLE * q.qv[i])) AS dot,
        | 1.0 / (1.0 + sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)),
        |     i -> (e.embedding[i]::DOUBLE - q.qv[i]) * (e.embedding[i]::DOUBLE - q.qv[i]))))) AS sim
        |FROM embeddings e, q WHERE e.vec_id <> 2
        |ORDER BY dot DESC, e.vec_id LIMIT 10""".stripMargin,
    "v24_norm_stats" ->
      """SELECT label, COUNT(*) AS n,
        | CAST(SUM(CAST(list_sum(list_transform(generate_series(1, len(embedding)),
        |     i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)) AS DECIMAL(18,9))) AS DOUBLE) AS sum_norm2,
        | MIN(list_sum(list_transform(generate_series(1, len(embedding)),
        |     i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS min_norm2,
        | MAX(list_sum(list_transform(generate_series(1, len(embedding)),
        |     i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS max_norm2
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,
  )

  private lazy val maxSimOracleSql: String =
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb, vec_id // 4 AS mv_doc
      |  FROM embeddings),
      |q AS (SELECT vec_id AS q_id, emb AS q_vec FROM v WHERE mv_doc = 0),
      |d AS (SELECT v.mv_doc, q.q_id,
      |  list_sum(list_transform(generate_series(1, len(v.emb)),
      |    i -> v.emb[i] * q.q_vec[i])) AS dot
      |  FROM v CROSS JOIN q WHERE v.mv_doc <> 0),
      |m AS (SELECT mv_doc, q_id, MAX(dot) AS best FROM d GROUP BY mv_doc, q_id)
      |SELECT mv_doc, ROUND(SUM(best), 6) AS maxsim, COUNT(*) AS n_q
      |FROM m GROUP BY mv_doc ORDER BY maxsim DESC, mv_doc LIMIT 10""".stripMargin
}
