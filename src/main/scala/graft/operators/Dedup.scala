package graft.operators

import graft.Tables.t
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design: the production path is LSH (d44) — signatures are
  * computed per document (no shuffle), candidates come from a band-key
  * equi-join (shuffle on band key, output ∝ true near-dups), and only
  * candidates pay the exact-verification cost. The all-pairs variant (d42)
  * exists as the oracle baseline and for bounded blocks; at 100 TB you
  * never materialize the cross join.
  *
  * Determinism: shingle hashes derive from md5 prefixes; MinHash uses
  * fixed affine permutations mod 2^31-1; every float is a single division
  * of exact integers — all reproducible bit-for-bit by the DuckDB oracle.
  */
object Dedup {

  private val words = "split(text, ' ')"

  /** Word 3-gram shingles over a *materialized* word-array column.
    *
    * Two deliberate non-choices: (a) referencing `split(text)` inside the
    * lambda would re-split the full text on every element access (O(len²)
    * per document — Catalyst does not hoist loop-invariant subexpressions
    * out of higher-order-function lambdas); (b) string-level
    * `array_distinct` here costs ~14× the rest of the shingle stage
    * (measured at sf0.1) — dedup happens after hashing instead, where
    * distinct-over-longs is cheap, and MinHash (`array_min`) is
    * duplicate-insensitive anyway. Sub-3-word documents yield an EMPTY
    * list (matching DuckDB's generate_series) — without the guard,
    * sequence(0, -1) counts DOWN and __w[-1] is an ANSI runtime error.
    */
  private val shingles =
    "CASE WHEN size(__w) < 3 THEN CAST(array() AS ARRAY<STRING>) " +
      "ELSE transform(sequence(0, size(__w) - 3)," +
      " i -> concat(__w[i], ' ', __w[i+1], ' ', __w[i+2])) END"

  private def wordHash(w: String) =
    s"CAST(conv(substr(md5($w), 1, 8), 16, 10) AS BIGINT)"

  /** MinHash permutation params — fixed primes, mod 2^31-1. */
  private val P = 2147483647L
  private val seeds: Seq[(Long, Long)] = Seq(
    (947L, 311L), (1871L, 677L), (2833L, 1049L), (3989L, 1427L),
    (5023L, 1823L), (6197L, 2207L), (7307L, 2617L), (8419L, 3001L))

  /** Base shingle hashes (md5 evaluated ONCE per shingle; each seed then
    * applies only an affine map over the precomputed hash array).
    */
  private val shingleHashes = s"transform(__sh, s -> ${wordHash("s")} % $P)"

  private def minhashCol(j: Int): String = {
    val (a, b) = seeds(j)
    s"array_min(transform(__hs, x -> ($a * x + $b) % $P))"
  }

  /** Short content hash of the generating SQL expressions — versions the
    * scratch-table cache (testdata is immutable; code is not).
    */
  private[operators] def exprVersion(parts: String*): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(parts.mkString("|").getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString

  private[operators] def scratchExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(
      new java.io.File(s"$path/_SUCCESS").getAbsolutePath)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  private lazy val logger = org.slf4j.LoggerFactory.getLogger("graft.Dedup")

  /** Document-frequency cap over an inverted-index posting table — the
    * guard that keeps the d44 band self-join alive at 100 TB (d42 caps at
    * the array level instead, see [[d42JaccardPairs]], so its jaccard
    * numerator and denominator share one feature space; here the cap
    * affects CANDIDATE GENERATION only — verification still computes
    * jaccard over the full shingle arrays, so surviving pairs' values
    * carry no bias). The join
    * cost is Σ c(key)² over posting lists; one boilerplate shingle (or
    * band) present in 10⁶ documents alone yields 10¹² candidate pairs.
    * Dropping keys with df > τ bounds every posting list, so the join is
    * ≤ τ · |postings| — linear in data for fixed τ.
    *
    * Semantics: a pair is missed only if EVERY feature it shares is hot —
    * i.e. the overlap is pure boilerplate. Identical documents are caught
    * upstream by exact-hash dedup (d41); near-dup pairs with any
    * distinctive shared content keep a low-df key and survive. This is the
    * standard df-cap every production MinHash/LSH pipeline applies.
    * Dropped keys are counted and logged loudly, never silently.
    *
    * τ comes from `spark.graft.dedup.maxDocFreq` (default 32; ≤ 0
    * disables). Default chosen above the testdata max (shingle df ≤ 25 at
    * sf0.1), so gated outputs are provably unchanged.
    *
    * The hot-key set is ≤ |postings|/τ and shrinks as τ grows — tiny by
    * construction — so it broadcasts, and the cap costs one hash-aggregate
    * plus a broadcast anti-join, no extra shuffle of the posting table.
    */
  private def maxDocFreq(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.dedup.maxDocFreq")
      .map(_.toInt).getOrElse(32)

  private[graft] def capHotKeys(
      spark: SparkSession, posting: DataFrame, key: String, ctx: String): DataFrame = {
    val tau = maxDocFreq(spark)
    if (tau <= 0) posting
    else {
      val hot = posting.groupBy(col(key)).agg(count(lit(1)).as("__df"))
        .filter(col("__df") > tau)
      val d = hot.agg(count(lit(1)).as("k"), sum(col("__df")).as("p")).collect().head
      if (d.getLong(0) > 0)
        logger.warn(s"$ctx: df-cap dropping ${d.getLong(0)} hot keys " +
          s"(df > $tau, ${d.get(1)} postings) before the self-join")
      posting.join(broadcast(hot.select(col(key))), Seq(key), "left_anti")
    }
  }

  /** D1: exact dedup via content hash (one-row summary). */
  def d41Exact(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").agg(
      count(lit(1)).as("n_docs"),
      countDistinct(md5(col("text"))).as("n_unique"))

  /** D2: exact n-gram Jaccard pairs ≥ 0.5 via an inverted shingle index.
    *
    * Semantically identical to the all-pairs baseline (the DuckDB oracle
    * still brute-forces it): any pair with jaccard > 0 shares ≥ 1 shingle,
    * so exploding (shingle → doc) and equi-joining on the shingle hash
    * enumerates every qualifying pair, and COUNT(*) per pair IS the
    * intersection size (shingle arrays are distinct). Cost is Σ c(s)² over
    * shingle postings — ∝ true overlap, never n²/2 pairs — which is the
    * join an inverted-index dedup runs at 100 TB. The size-ratio prune
    * (jaccard ≥ 0.5 ⇒ 2·min ≥ max) drops mismatched pairs pre-aggregation.
    */
  def d42JaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    // Materialize the per-doc shingle-hash arrays before exploding and
    // self-joining. The barrier matters twice over: (a) Catalyst infers
    // join-key null filters and pushes them beneath the repartition,
    // re-deriving the shingle pipeline per raw row, and (b) CollapseProject
    // inlines the array expression into every post-explode column
    // reference, recomputing the full md5 chain per *output* row (~25× —
    // measured 4.5 s vs 0.2 s at sf0.1). A stored shingle table is also
    // what the 100 TB pipeline keeps.
    // cache key embeds a hash of the generating expressions: editing the
    // shingle pipeline changes the path, so a stale cache can never serve
    // results for code it didn't produce
    val scratch = graft.Tables.scratch(dir,
      s"shingle_arrays_${exprVersion(words,
        s"array_distinct(transform($shingles, s -> ${wordHash("s")} % $P))")}")
    if (!scratchExists(spark, scratch)) {
      t(spark, dir, "documents")
        // scale-adaptive: derive from the session's parallelism, not a
        // constant tuned for one machine (guide §2 — the driver re-runs
        // the bench at lower core counts)
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .withColumn("__w", expr(words))
        .select(col("doc_id"), expr(
          s"array_distinct(transform($shingles, s -> ${wordHash("s")} % $P))").as("sh"))
        .write.mode("overwrite").parquet(scratch)
    }
    // df-cap BEFORE the self-join — applied to the per-doc ARRAYS so that
    // numerator and denominator live in the SAME capped feature space: `n`
    // counts exactly the shingles the join can still intersect. (Capping
    // only the exploded postings while keeping full-array sizes would
    // undercount the intersection and overcount the union for any pair
    // sharing a hot shingle — a downward-biased jaccard that can drop a
    // true near-dup at the threshold.) The reported jaccard is therefore
    // the exact jaccard of the df-capped shingle sets — similarity of the
    // docs' DISTINCTIVE content, which is what a dedup threshold should
    // measure once boilerplate is excluded. The hot set is ≤ |postings|/τ —
    // boilerplate by construction, tiny — so it collects and broadcasts.
    val full = spark.read.parquet(scratch)
    val tau = maxDocFreq(spark)
    val capped = if (tau <= 0) full else {
      val hot = full.select(explode(col("sh")).as("h"))
        .groupBy(col("h")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") > tau).collect()
      if (hot.isEmpty) full
      else {
        logger.warn(s"d42: df-cap dropping ${hot.length} hot shingles " +
          s"(df > $tau) from every document before the self-join")
        val hotIds = hot.map(_.getLong(0))
        // codegen'd set difference against a literal array — stays inside
        // whole-stage codegen on the 100 TB path the df-cap exists for; a
        // broadcast + Scala UDF only if the hot set outgrows a sane
        // literal (it is <= |postings|/tau — boilerplate — by construction)
        if (hotIds.length <= 10000)
          full.select(col("doc_id"), array_except(col("sh"), lit(hotIds)).as("sh"))
        else {
          val bc = spark.sparkContext.broadcast(hotIds.toSet)
          val dropHot = udf { (sh: Seq[Long]) => sh.filterNot(bc.value.contains) }
          full.select(col("doc_id"), dropHot(col("sh")).as("sh"))
        }
      }
    }
    val d = capped
      .select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("h"))
    val a = d.select(col("h"), col("doc_id").as("a_id"), col("n").as("a_n"))
    val b = d.select(col("h").as("h2"), col("doc_id").as("b_id"), col("n").as("b_n"))
    a.join(b, col("h") === col("h2") && col("a_id") < col("b_id") &&
        col("a_n") * 2 >= col("b_n") && col("b_n") * 2 >= col("a_n"))
      .groupBy(col("a_id"), col("b_id"), col("a_n"), col("b_n"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        expr("CAST(inter AS DOUBLE) / (a_n + b_n - inter)"))
      .filter(col("jaccard") >= 0.5)
      .select(col("a_id"), col("b_id"), col("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** D3: MinHash signatures (8 permutations over word-3-gram shingles).
    * Pure per-document map — embarrassingly parallel.
    */
  def d43MinhashSigs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      // hash-heavy map stage: spread across cores even though the input
      // is a single small parquet split
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("__w", expr(words))
      .withColumn("__sh", expr(shingles))
      .withColumn("__hs", expr(shingleHashes))
      .select(col("doc_id") +: seeds.indices.map(j =>
        expr(minhashCol(j)).as(s"s$j")): _*)
      .orderBy(col("doc_id"))

  /** D4: MinHash LSH — 4 bands × 2 rows, equi-join on band key, exact
    * Jaccard verification ≥ 0.5 on candidates only. This is the 100 TB
    * dedup path: cost ∝ data + collisions, never n².
    */
  /** Build-once signature table (hashed shingle sets + LSH band keys) —
    * the design a production pipeline uses anyway (signatures land in
    * storage once, many dedup passes read them), and a hard optimizer
    * barrier: without it Catalyst inlines the full minhash pipeline into
    * filters it pushes beneath the repartition, recomputing everything
    * single-threaded. Shared by d44 (self-join pairs) and d51
    * (incremental old×new dedup).
    */
  private val bandsExpr = (0 until 4).map(bnd =>
    s"concat('$bnd:', ${minhashCol(2 * bnd)}, ':', ${minhashCol(2 * bnd + 1)})")
    .mkString("array(", ", ", ")")

  private val hashedShingleSet =
    s"array_distinct(transform(__sh, s -> ${wordHash("s")} % $P))"

  /** Stateless signature transform: (doc_id, text, …) → (doc_id, sh,
    * bands). Pure codegen'd column expressions, so it applies unchanged to
    * a STREAMING frame (the s87 ingest path computes signatures per
    * micro-batch with exactly this) and to the batch scratch-table build.
    */
  private[operators] def withMinhashSig(df: DataFrame): DataFrame =
    df.withColumn("__w", expr(words))
      .withColumn("__sh", expr(shingles))
      .withColumn("__hs", expr(shingleHashes))
      .select(col("doc_id"),
        expr(hashedShingleSet).as("sh"),
        expr(bandsExpr).as("bands"))

  private[operators] def minhashSigTable(spark: SparkSession, dir: String): DataFrame = {
    // the key hashes EVERY generating expression verbatim — a partial key
    // would let an edit to an unhashed part serve stale cached results
    val scratch = graft.Tables.scratch(dir,
      s"minhash_sigs_${exprVersion(words, shingles, shingleHashes,
        hashedShingleSet, bandsExpr)}")
    if (!scratchExists(spark, scratch)) {
      withMinhashSig(t(spark, dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism))
        .write.mode("overwrite").parquet(scratch)
    }
    spark.read.parquet(scratch)
  }

  def d44LshPairs(spark: SparkSession, dir: String): DataFrame = {
    val sig = minhashSigTable(spark, dir)
    // df-cap hot bands (a band shared by m docs yields m²/2 candidates);
    // exact verification below still uses the FULL shingle arrays
    val banded = capHotKeys(spark,
      sig.select(col("doc_id"), explode(col("bands")).as("bk")),
      "bk", "d44")
    // candidate pairs stay NARROW through the band join + distinct (the
    // d47 lesson: dragging two ~90-long hash arrays through distinct made
    // it the hottest stage); the shingle arrays join back onto the
    // deduplicated pair ids — two narrow equi-joins against the signature
    // table, broadcast when it is small
    val a = banded.select(col("bk"), col("doc_id").as("a_id"))
    val b = banded.select(col("bk").as("bk2"), col("doc_id").as("b_id"))
    val pairs = a.join(b, col("bk") === col("bk2") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    val shTbl = sig.select(col("doc_id"), col("sh"))
    pairs
      .join(shTbl.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(shTbl.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), "b_id")
      .withColumn("inter", expr("size(array_intersect(a_sh, b_sh))"))
      .withColumn("jaccard",
        expr("CAST(inter AS DOUBLE) / (size(a_sh) + size(b_sh) - inter)"))
      .filter(col("jaccard") >= 0.5)
      .select(col("a_id"), col("b_id"), col("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Incremental ingestion dedup (d51): dedup a NEW batch against the
    * EXISTING corpus — the daily-ingest shape (d42/d44 dedup a corpus
    * against itself; real pipelines mostly dedup today's crawl against
    * everything already kept). The old side is the persisted signature
    * table in its index role — band postings computed ONCE, reused by
    * every ingest; only the new batch pays signature cost. Candidates
    * come from the old×new band equi-join (cost ∝ new batch + true
    * collisions — the old corpus never self-joins, so a 100 TB history
    * deduping a 100 GB ingest costs ~the ingest), hot bands df-capped on
    * the postings side, and exact Jaccard verifies candidates. One row
    * per new doc: `kept`, or the OLDEST duplicate it collides with and
    * that pair's similarity.
    */
  def d51IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val sig = minhashSigTable(spark, dir)
    val old = sig.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val nw = sig.filter(pmod(col("doc_id"), lit(5)) === 0)
    val oldBands = capHotKeys(spark,
      old.select(col("doc_id"), explode(col("bands")).as("bk")), "bk", "d51")
    val cand = nw.select(explode(col("bands")).as("bk"), col("doc_id").as("n_id"))
      .join(oldBands.select(col("bk").as("bk2"), col("doc_id").as("o_id")),
        col("bk") === col("bk2"))
      .select(col("n_id"), col("o_id")).distinct()
    val shTbl = sig.select(col("doc_id"), col("sh"))
    val ver = cand
      .join(shTbl.select(col("doc_id").as("n_id"), col("sh").as("n_sh")), "n_id")
      .join(shTbl.select(col("doc_id").as("o_id"), col("sh").as("o_sh")), "o_id")
      .withColumn("inter", expr("size(array_intersect(n_sh, o_sh))"))
      .withColumn("jaccard",
        expr("CAST(inter AS DOUBLE) / (size(n_sh) + size(o_sh) - inter)"))
      .filter(col("jaccard") >= 0.5)
      .select(col("n_id"), col("o_id"), col("jaccard"))
    val best = ver.groupBy(col("n_id")).agg(min(col("o_id")).as("dup_of"))
      .join(ver.select(col("n_id"), col("o_id").as("dup_of"), col("jaccard")),
        Seq("n_id", "dup_of"))
    nw.select(col("doc_id"))
      .join(best.withColumnRenamed("n_id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("kept", col("dup_of").isNull)
      .select(col("doc_id"), col("dup_of"), col("jaccard"), col("kept"))
      .orderBy(col("doc_id"))
  }

  /** Exact duplicated-substring spans (d52) — the dedup grain between
    * d41 (whole document) and d49 (fixed paragraphs): find every maximal
    * run of token positions whose W-token windows recur VERBATIM in
    * other documents (boilerplate headers, license blocks, templated
    * intros — the "exact substring" dedup of Lee et al., Deduplicating
    * Training Data Makes Language Models Better, re-expressed without a
    * suffix array). A window counts as duplicated only when it appears
    * in ≥ 2 DISTINCT documents, so within-document repetition (t39's
    * concern) never flags here.
    *
    * Shape, stage by stage: (1) sliding W-windows via codegen'd
    * `transform(sequence)` + `posexplode` — linear fan-out, no shuffle;
    * (2) duplicated-window detection is a hash aggregate keyed on the
    * window (map-side partials; the distinct-doc test is a 2-level agg);
    * (3) marking positions is a LEFT SEMI join back on the same key —
    * both sides shuffle once on the window key and candidates ∝ true
    * duplication; (4) merging consecutive positions into maximal spans
    * is the gaps-and-islands trick (pos − row_number per doc): ONE
    * window function partitioned by doc_id, state bounded by a
    * document's own window count. At 100 TB stages 2–3 key on
    * `xxhash64(win)` (or a 128-bit fingerprint) instead of the raw
    * string to shrink shuffle payload — same plan, narrower rows; the
    * gate keys on the text itself so the DuckDB oracle is exact-equal.
    */
  def d52SubstringSpans(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val W = 10
    val wins = t(spark, dir, "documents")
      .withColumn("__w", expr(words))
      .filter(expr(s"size(__w) >= $W"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(__w) - $W)," +
          s" i -> concat_ws(' ', slice(__w, i + 1, $W)))")).as(Seq("pos", "win")))
    val dup = wins.groupBy(col("win"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("win"))
    val marked = wins.join(dup, Seq("win"), "left_semi")
    val spans = marked
      .withColumn("grp", col("pos") -
        row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("run"), min(col("pos")).as("start_pos"))
    spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("run")).cast("bigint").as("dup_windows"),
        max(col("run") + lit(W - 1)).cast("bigint").as("max_span_tokens"),
        min(col("start_pos")).cast("bigint").as("first_pos"))
      .orderBy(col("doc_id"))
  }

  /** D5: 32-bit SimHash over word hashes (with multiplicity): bit k set
    * when the ±1 majority over words is positive.
    *
    * Shape: explode word hashes → hash-aggregate with 32 codegen'd ±1
    * sums (map-side partials, one narrow shuffle keyed by doc) → assemble
    * the bits. A lambda fold per bit per doc would run 32·|words|
    * interpreted closures per document; the flat aggregate stays inside
    * whole-stage codegen and scales out on the doc key.
    */
  def d45Simhash(spark: SparkSession, dir: String): DataFrame = {
    val bitSums = (0 until 32).map(k =>
      sum(when(expr(s"(shiftright(h, $k) & 1) = 1"), 1).otherwise(-1)).as(s"b$k"))
    val assemble = (0 until 32).map(k =>
      s"CASE WHEN b$k > 0 THEN shiftleft(CAST(1 AS BIGINT), $k) ELSE CAST(0 AS BIGINT) END")
      .mkString(" + ")
    t(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
      // explode_OUTER: a NULL-text document keeps its row (h = NULL) and
      // surfaces as simhash NULL instead of vanishing from the output
      .select(col("doc_id"),
        explode_outer(expr(s"transform($words, w -> ${wordHash("w")})")).as("h"))
      .groupBy(col("doc_id"))
      .agg(count(col("h")).as("nh"), bitSums: _*)
      .select(col("doc_id"),
        when(col("nh") === 0, lit(null).cast("bigint"))
          .otherwise(expr(assemble)).as("simhash"))
      .orderBy(col("doc_id"))
  }

  /** Embedding-cosine near-dup: same-label blocking, cosine similarity
    * ≥ 0.4 via three exact dot products. At scale the blocking key comes
    * from an LSH/IVF bucket instead of a label.
    */
  def d46EmbNearDup(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val a = e.select(col("label"), col("vec_id").as("a_id"), col("embedding").as("a_v"))
    val b = e.select(col("label").as("label2"), col("vec_id").as("b_id"), col("embedding").as("b_v"))
    a.join(b, col("label") === col("label2") && col("a_id") < col("b_id"))
      .withColumn("sim",
        dot_product(col("a_v"), col("b_v")) /
          (sqrt(dot_product(col("a_v"), col("a_v"))) * sqrt(dot_product(col("b_v"), col("b_v")))))
      .filter(col("sim") >= 0.4)
      .select(col("label"), col("a_id"), col("b_id"), col("sim"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** SRP (sign-random-projection) hyperplanes for d47: 32 planes over 64
    * dims, coefficients derived from exact integer arithmetic —
    * `(1103515245·idx + 12345) mod 2048 − 1024` with `idx = p·64 + i−1` —
    * so any engine computes bit-identical signs: the coefficient is an
    * 11-bit integer (exact in double), float32·small-int products are
    * exact in double, and both engines fold left-to-right. NOTE the
    * modulus bounds the plane count: idx must stay < 2048, i.e. ≤ 32
    * planes at dim 64 (plane p+32 would repeat plane p exactly).
    */
  private val srpPlanes = 32
  private val srpBandBits = 8 // 4 bands × 8 bits: bucket ≈ n/256 per band
  private val srpBandCount = srpPlanes / srpBandBits

  private val srpBits =
    s"transform(sequence(0, ${srpPlanes - 1}), p -> CASE WHEN " +
      "aggregate(sequence(1, 64), CAST(0 AS DOUBLE), (acc, i) -> " +
      "acc + element_at(__v, i) * (CAST((CAST(1103515245 AS BIGINT) * " +
      "(p * 64 + i - 1) + 12345) % 2048 AS DOUBLE) - CAST(1024 AS DOUBLE))) " +
      "> CAST(0 AS DOUBLE) THEN 1 ELSE 0 END)"

  private val srpBandsExpr = (0 until srpBandCount).map { b =>
    val bits = (1 to srpBandBits)
      .map(j => s"CAST(element_at(__bits, ${srpBandBits * b + j}) AS STRING)")
      .mkString(", ")
    s"concat('$b:', $bits)"
  }.mkString("array(", ", ", ")")

  /** D6: embedding near-dup via SRP-LSH banding — the scale path that
    * d46's label blocking stands in for. A 32-bit signature of hyperplane
    * signs is computed per embedding (pure map, no shuffle), banded 4 × 8
    * bits; candidate pairs come from a band-key equi-join (cost ∝
    * collisions, never n²/2) with the same df-cap as d44 bounding hot
    * buckets, and only candidates pay the exact cosine verification
    * (threshold 0.4, matching d46). Semantics are fully deterministic —
    * the oracle replicates the planes, the banding, AND the df-cap — so
    * the result is exact over its own candidate set at any scale.
    * Production tunes planes/bits to the corpus similarity target; SRP
    * collision probability is `(1 − θ/π)^bits` per band.
    */
  def d47SrpNearDup(spark: SparkSession, dir: String): DataFrame = {
    val scratch = graft.Tables.scratch(dir,
      s"srp_sigs_${exprVersion(srpBits, srpBandsExpr)}")
    if (!scratchExists(spark, scratch)) {
      t(spark, dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("__v", col("embedding").cast("array<double>"))
        .withColumn("__bits", expr(srpBits))
        .select(col("vec_id"), expr(srpBandsExpr).as("bands"))
        .write.mode("overwrite").parquet(scratch)
    }
    // Candidate pairs stay NARROW (two longs) through the join + distinct —
    // carrying the vectors through the band join would shuffle 128 floats
    // per collision and made distinct() the hottest stage (measured 1.6 s
    // of a 2.2 s query at sf0.1). Vectors and precomputed norms join back
    // AFTER distinct; Catalyst picks broadcast for a small embeddings side
    // and a shuffled hash/merge join at scale — nothing here pins it.
    val banded = capHotKeys(spark,
      spark.read.parquet(scratch)
        .select(col("vec_id"), explode(col("bands")).as("bk")),
      "bk", "d47")
    val cand = banded
      .join(banded.select(col("bk").as("bk2"), col("vec_id").as("b_id")),
        col("bk") === col("bk2") && col("vec_id") < col("b_id"))
      .select(col("vec_id").as("a_id"), col("b_id")).distinct()
    val e = t(spark, dir, "embeddings").select(col("vec_id"),
      col("embedding"), sqrt(dot_product(col("embedding"), col("embedding"))).as("nrm"))
    cand
      .join(e.select(col("vec_id").as("a_id"), col("embedding").as("a_v"),
        col("nrm").as("a_n")), "a_id")
      .join(e.select(col("vec_id").as("b_id"), col("embedding").as("b_v"),
        col("nrm").as("b_n")), "b_id")
      // same doubles as dot/(sqrt·sqrt) per pair: the norm is computed once
      // per vector instead of once per pair, but the value is identical
      .withColumn("sim", dot_product(col("a_v"), col("b_v")) / (col("a_n") * col("b_n")))
      .filter(col("sim") >= 0.4)
      .select(col("a_id"), col("b_id"), col("sim"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** D7: near-dup GROUPS — connected components over the d44 pair graph,
    * each doc labeled with the min doc_id of its component (which IS the
    * canonical keeper, so `cluster_id` doubles as the keep-one choice).
    * Hash-min label propagation: every iteration joins labels to edges and
    * takes the min over neighbors, converging in O(component diameter)
    * rounds — near-dup components are shallow (diameter ≲ a few hops), so
    * this is a handful of shuffles regardless of corpus size, the standard
    * distributed connected-components for dedup. `localCheckpoint` cuts
    * the growing lineage each round so the plan stays O(1) per iteration.
    */
  def d48DedupGroups(spark: SparkSession, dir: String): DataFrame = {
    // the converged labels are deterministic per input + pipeline version —
    // cache them like the signature tables (p70 reuses them for free); the
    // key hashes every expression feeding d44 plus a clustering tag
    val scratch = graft.Tables.scratch(dir,
      s"dedup_groups_${exprVersion(words, shingles, shingleHashes, "hashmin-cc-v1")}")
    if (scratchExists(spark, scratch))
      return spark.read.parquet(scratch).orderBy(col("doc_id"))
    val pairs = d44LshPairs(spark, dir).select(col("a_id"), col("b_id"))
    val edges = pairs
      .union(pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .toDF("s", "d").localCheckpoint()
    var labels = edges.select(col("s").as("node")).distinct()
      .withColumn("lbl", col("node")).localCheckpoint()
    // labels only ever DECREASE, so the exact decimal label-sum is a
    // convergence certificate: unchanged sum ⇔ fixpoint. One narrow
    // aggregate per round instead of a join+filter+count.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("lbl")).cast("decimal(38,0)")).collect().head.getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var iters = 0
    while (!converged) {
      iters += 1
      require(iters <= 50, "connected components failed to converge")
      val viaNeighbor = edges.join(labels, edges("d") === labels("node"))
        .select(edges("s").as("node"), col("lbl"))
      val next = labels.union(viaNeighbor)
        .groupBy(col("node")).agg(min(col("lbl")).as("lbl"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
    }
    logger.info(s"d48: converged in $iters hash-min iterations")
    labels.select(col("node").as("doc_id"), col("lbl").as("cluster_id"))
      .write.mode("overwrite").parquet(scratch)
    spark.read.parquet(scratch).orderBy(col("doc_id"))
  }

  /** P70: the CURATION CAPSTONE — the three pipeline stages a training-data
    * run chains, composed as one flow: (1) near-dup keep-one (anti-join the
    * d48 non-canonical docs), (2) quality filter (t33's score ≥ 0.7), (3)
    * per-language corpus stats. Everything after the d48 fixpoint is one
    * lazy plan: the anti-join broadcasts the (tiny) drop-list, the quality
    * score is pure column arithmetic on the scan, and the final aggregate
    * is a partial+final hash agg on ≤ #langs groups.
    */
  def p70Curation(spark: SparkSession, dir: String): DataFrame = {
    val dropDocs = d48DedupGroups(spark, dir)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"))
    t(spark, dir, "documents")
      .join(dropDocs, Seq("doc_id"), "left_anti")
      .withColumn("n_tokens", expr(s"CAST(size($words) AS BIGINT)"))
      .withColumn("uniq_ratio",
        expr(s"CAST(size(array_distinct($words)) AS DOUBLE) / size($words)"))
      .withColumn("stopword_ratio",
        expr(s"CAST(size(filter($words, w -> w IN ('the', 'a'))) AS DOUBLE) / size($words)"))
      .withColumn("quality",
        expr("0.4 * uniq_ratio + 0.3 * least(1.0, CAST(n_tokens AS DOUBLE) / 50.0)" +
          " + 0.3 * (1.0 - stopword_ratio)"))
      .filter(col("quality") >= 0.7)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        graft.Tables.davg(col("quality"), 9).as("avg_quality"))
      .orderBy(col("lang"))
  }

  /** D49: PARAGRAPH-level dedup — the sub-document variant of d41 (the
    * Dolma/RefinedWeb "remove boilerplate paragraphs repeated across the
    * corpus" pass). Documents split into fixed 8-token chunks (the corpus
    * has no newlines; a real pipeline splits on them — same plan), every
    * chunk after the first corpus-wide occurrence (first = smallest
    * (doc_id, idx)) is dropped, and the per-document output reports how
    * much text survives.
    *
    * Scale shape: the ONLY shuffle keys are `(md5(chunk), doc_id, idx,
    * length)` — the chunk TEXT itself never shuffles (at 100 TB the
    * paragraph bodies dominate bytes; hashing first makes the exchange
    * narrow). md5 is 128-bit, so cross-corpus collisions are negligible
    * and both engines compute it identically. One window over the hash +
    * one per-doc aggregation; no joins, no collects.
    */
  def d49ParagraphDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("h")).orderBy(col("doc_id"), col("idx"))
    val chunks = t(spark, dir, "documents")
      .withColumn("__w", expr(words))
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, (size(__w) + 7) div 8 - 1)," +
          " i -> concat_ws(' ', slice(__w, i * 8 + 1, 8)))"))
        .as(Seq("idx", "chunk")))
      // narrow the rows BEFORE the shuffle: hash + length are all the
      // dedup and the report need
      .select(col("doc_id"), col("idx"), md5(col("chunk")).as("h"),
        length(col("chunk")).cast("long").as("clen"))
    chunks
      .withColumn("rn", row_number().over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rn") === 1, col("clen") + 1L).otherwise(0L)).as("__kl"))
      .withColumn("clean_len",
        when(col("n_kept") > 0, col("__kl") - 1L).otherwise(0L))
      .select(col("doc_id"), col("n_chunks"), col("n_kept"), col("clean_len"))
      .orderBy(col("doc_id"))
  }

  /** SemDeDup (d50): k-means the embedding space, then dedup WITHIN each
    * cluster only — per-cluster greedy keep-lowest-id over cosine ≥ θ
    * pairs. The clustering bounds the quadratic: all-pairs is O(n²),
    * SemDeDup is Σ O(|cluster|²), and with k ∝ √n the expected cluster
    * stays O(√n) — the published recipe for embedding dedup at corpus
    * scale (SemDeDup, Abbas et al. 2023; the d47 SRP buckets are the
    * hash-flavored sibling, this is the learned-partition flavor).
    *
    * Determinism note: spark.ml KMeans centroids depend on input
    * partitioning, so CLUSTER IDS are not cross-environment stable — but
    * the dedup CONTRACT is: kept docs of one cluster are pairwise < θ,
    * and every dropped doc had a smaller-id cluster-mate ≥ θ. The d50
    * gate verifies exactly those invariants (recomputed from the output,
    * not trusted), which hold under ANY clustering.
    *
    * Returns the input plus `cluster` and `kept` columns. Cosine is the
    * dot of pre-normalized vectors — one zip_with/aggregate pass, linear
    * in dim.
    */
  def semanticDedup(spark: SparkSession, df: DataFrame, vecCol: String,
      idCol: String, k: Int, theta: Double, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    val base = df.select(col(idCol).as("__id"),
        col(vecCol).cast("array<double>").as("__vd"))
      .withColumn("__n", expr("sqrt(aggregate(__vd, 0D, (a, x) -> a + x * x))"))
      .withColumn("__vn", expr(
        "transform(__vd, x -> CASE WHEN __n = 0D THEN x ELSE x / __n END)"))
      .select(col("__id"), col("__vn"))
    // row-copy barrier before ml's RDD cache (see IvfIndex.build). Few
    // partitions on purpose: the train set is centroids-per-iteration
    // small, and every extra partition is an extra task PER KMEANS JOB.
    val train = base.select(org.apache.spark.ml.functions
        .array_to_vector(col("__vn")).as("features"))
      .repartition(math.max(2, math.min(spark.sparkContext.defaultParallelism, 8)))
    // random seeded init (one job) over k-means|| (several): partition
    // QUALITY barely matters here — the dedup invariants hold under any
    // clustering, a worse partition only shifts which pairs co-cluster
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(5)
      .setInitMode("random").setFeaturesCol("features").fit(train)
    val bc = spark.sparkContext.broadcast(model.clusterCenters.map(_.toArray))
    val assign = udf { (v: Seq[Double]) =>
      val cs = bc.value
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < cs.length) {
        var acc = 0.0; var i = 0
        while (i < v.length) { val d = v(i) - cs(c)(i); acc += d * d; i += 1 }
        if (acc < bestD) { bestD = acc; best = c }; c += 1
      }
      best
    }
    val assigned0 = base.select(col("__id"), col("__vn"),
      assign(col("__vn")).as("cluster").cast("long"))
    // ---- mega-cluster guard: the within-cluster join below is quadratic
    // in the LARGEST cluster and k-means offers no balance guarantee — a
    // collapsed embedding space can put most of the corpus in one cluster
    // (the HNSW graph-search path has the same hazard and the same
    // guard, maxBucketBytes). Cluster sizes are one narrow agg (k rows to
    // the driver — bounded by construction); clusters above the row cap
    // get SRP sub-buckets (random-hyperplane signs keep near-dups
    // together, so recall degrades gracefully), and any sub-bucket STILL
    // above the cap (identical vectors share every SRP sign) falls back
    // to id-hash salting, which always splits by count. Both refinements
    // preserve the two gated invariants — they hold under ANY clustering
    // (see determinism note above); splitting only forgoes cross-bucket
    // drops. The returned `cluster` id encodes (cluster, srp, salt).
    // ONE materialization of the (id, normalized vector, cluster) table:
    // the guard's size agg already paid one assignment pass; without this
    // checkpoint the join's a-side, b-side and the final kept-join would
    // re-run normalization + the assign UDF three more times. This is
    // also THE persist point a corpus-scale SemDeDup run needs anyway —
    // the materialized bytes are the normalized embeddings + one long,
    // i.e. the same order as the shuffle the join pays regardless.
    val assigned = refineOversized(spark, assigned0,
      spark.conf.getOption("spark.graft.dedup.maxClusterRows")
        .map(_.toInt).getOrElse(100000), seed)
      .localCheckpoint()
    val a = assigned.select(col("cluster").as("__ca"), col("__id").as("__aid"),
      col("__vn").as("__av"))
    val b = assigned.select(col("cluster").as("__cb"), col("__id").as("__bid"),
      col("__vn").as("__bv"))
    // codegen'd dot (normalized vectors → cosine); the zip_with/aggregate
    // HOF spelling allocates an intermediate array PER PAIR — measured 3×
    // slower on the |cluster|² pair volume
    val drops = a.join(b, col("__ca") === col("__cb") && col("__aid") < col("__bid"))
      .withColumn("__sim", dot_product(col("__av"), col("__bv")))
      .filter(col("__sim") >= theta)
      .select(col("__bid").as("__drop")).distinct()
    df.join(assigned.select(col("__id"), col("cluster")),
        df(idCol) === col("__id"))
      .join(drops, col("__id") === col("__drop"), "left")
      .withColumn("kept", col("__drop").isNull)
      .drop("__id", "__drop")
  }

  /** Split clusters above `maxRows` (see the guard comment at the call
    * site). Round 1: SRP — `ceil(log2(size/maxRows))` seeded Rademacher
    * hyperplanes (deterministic ±1 weights from MurmurHash3, so the split
    * is reproducible across runs and partitionings); similar vectors
    * share signs, so near-duplicates mostly stay co-bucketed. Round 2:
    * any sub-bucket still above the cap (collapsed/identical embeddings
    * defeat SRP — equal vectors get equal signs) is id-hash salted, which
    * bounds the bucket by COUNT unconditionally. Both rounds warn with
    * the affected sizes. Cluster ids come back as
    * base * 2^24 + srpBits * 2^12 + salt (caps ≤ 12 bits each), so
    * refined ids never collide across base clusters.
    */
  private[operators] def refineOversized(spark: SparkSession, assigned0: DataFrame,
      maxRows: Int, seed: Long): DataFrame = {
    val hot = assigned0.groupBy(col("cluster")).agg(count(lit(1)).as("__sz"))
      .filter(col("__sz") > maxRows)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap // ≤ k rows
    if (hot.isEmpty) return assigned0
    // the guard path runs several more driver actions (SRP size re-check,
    // up to 8 salting iterations) — persist the assignment so each action
    // re-reads instead of re-running normalization + the assign UDF over
    // the full corpus. Unpersisted before returning: the caller's final
    // join then recomputes once, exactly as the unguarded path does.
    val assigned = assigned0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try refineHot(spark, assigned, hot, maxRows, seed)
    finally assigned.unpersist()
  }

  private def refineHot(spark: SparkSession, assigned: DataFrame,
      hot: Map[Long, Long], maxRows: Int, seed: Long): DataFrame = {
    logger.warn(s"semanticDedup: ${hot.size} cluster(s) exceed " +
      s"spark.graft.dedup.maxClusterRows=$maxRows (sizes ${hot.values.toSeq.sorted.reverse.take(5).mkString(",")}…); " +
      "splitting with SRP sub-buckets to bound the within-cluster join")
    def bitsFor(sz: Long): Int =
      math.min(12, math.max(1,
        (math.log(sz.toDouble / maxRows) / math.log(2)).ceil.toInt))
    val bcBits = spark.sparkContext.broadcast(hot.map { case (c, sz) => c -> bitsFor(sz) })
    val srpSeed = seed
    // The ±1 hyperplane weights depend only on (bit, dim index, seed) —
    // hash ONCE on the driver (maxBits × dim booleans, KB-sized) and
    // broadcast, instead of re-hashing bits × dim times PER ROW inside
    // the UDF (a constant-factor tax on exactly the pathological corpora
    // this guard exists for). Same MurmurHash3 inputs → same signs →
    // the split ids are bit-identical to the per-row-hashing version
    // (DedupGuardSpec pins them).
    val maxBits = hot.values.map(bitsFor).max
    val dim = assigned.select(size(col("__vn"))).head().getInt(0)
    val weights: Array[Array[Boolean]] = Array.tabulate(maxBits, dim) { (j, i) =>
      (scala.util.hashing.MurmurHash3.productHash((j, i, srpSeed)) & 1) == 0
    }
    val bcW = spark.sparkContext.broadcast(weights)
    val srp = udf { (c: Long, v: Seq[Double]) =>
      bcBits.value.get(c) match {
        case None => 0
        case Some(b) =>
          val w = bcW.value
          var sub = 0; var j = 0
          while (j < b) {
            val wj = w(j)
            var acc = 0.0; var i = 0
            while (i < v.length) {
              // ragged rows longer than the sampled dim (shouldn't happen
              // on a vector column) fall back to the identical per-(j,i)
              // hash, preserving exact pre-precompute behavior
              val pos = if (i < wj.length) wj(i)
                else (scala.util.hashing.MurmurHash3.productHash((j, i, srpSeed)) & 1) == 0
              acc += (if (pos) v(i) else -v(i)); i += 1
            }
            sub = (sub << 1) | (if (acc >= 0) 1 else 0); j += 1
          }
          sub
      }
    }
    val refined = assigned.withColumn("cluster",
      col("cluster") * lit(1L << 24) + srp(col("cluster"), col("__vn")).cast("long") * lit(1L << 12))
    // round 2: SRP cannot split identical vectors — salt the residue by id
    val still = refined.groupBy(col("cluster")).agg(count(lit(1)).as("__sz"))
      .filter(col("__sz") > maxRows)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    if (still.isEmpty) return refined
    logger.warn(s"semanticDedup: ${still.size} SRP sub-bucket(s) still exceed " +
      s"$maxRows rows (collapsed embeddings; sizes ${still.values.toSeq.sorted.reverse.take(5).mkString(",")}…); " +
      "falling back to id-hash salting — near-duplicates split across salts " +
      "are no longer compared, which weakens recall but preserves both " +
      "dedup invariants")
    import spark.implicits._
    // codegen'd salt (xxhash64 works on ANY id type) via a tiny broadcast
    // of (bucket, nSalts) — no UDF, no per-cluster when-chain. Hash
    // salting only bounds the EXPECTED bucket, so iterate: double the
    // salt count of any bucket still over the cap and re-check (one
    // narrow agg per round) until the bound actually holds. Salt ids stay
    // under 2^12 so they never collide into the SRP bits above.
    var nMap = still.map { case (c, sz) =>
      c -> math.min(4095L, 2L * ((sz + maxRows - 1) / maxRows)) }
    var out = refined
    var iter = 0
    var done = false
    while (!done && iter < 8) {
      val nDf = nMap.toSeq.toDF("__sc", "__sn")
      out = refined.join(broadcast(nDf), col("cluster") === col("__sc"), "left")
        .withColumn("cluster", col("cluster") +
          when(col("__sn").isNotNull,
            pmod(xxhash64(lit(srpSeed), col("__id")), col("__sn")))
            .otherwise(lit(0L)))
        .drop("__sc", "__sn")
      // salt occupies the low 12 bits — mask it off to find the bucket
      val over = out.groupBy(col("cluster")).agg(count(lit(1)).as("__sz"))
        .filter(col("__sz") > maxRows)
        .select((col("cluster") - pmod(col("cluster"), lit(4096L))).as("__base"))
        .distinct().as[Long].collect()
      if (over.isEmpty) done = true
      else {
        val grown = over.filter(c => nMap.getOrElse(c, 4095L) < 4095L)
        if (grown.isEmpty) {
          logger.warn("semanticDedup: salt count exhausted (4095) with " +
            "buckets still over the cap; proceeding with the best split")
          done = true
        } else nMap = nMap ++ grown.map(c => c -> math.min(4095L, nMap(c) * 2))
      }
      iter += 1
    }
    out
  }

  /** d50 gate: run SemDeDup on the embeddings table, then RE-VERIFY the
    * two invariants from the output (kept cluster-mates pairwise < θ;
    * every drop justified by a smaller-id cluster-mate ≥ θ) — planted as
    * booleans the oracle replicates as literal `true`, the v26r/v30
    * pattern for results a SQL engine cannot re-derive (k-means). The
    * exact n_total keeps the row anchored to the real table.
    */
  def d50SemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val r = semanticDedup(spark, e, "embedding", "vec_id", k = 8, theta = 0.4)
      .localCheckpoint() // pin one clustering: invariants must be checked
                         // against the SAME run they came from
    val vn = expr("transform(embedding, x -> CASE WHEN __nn = 0D THEN " +
      "CAST(x AS DOUBLE) ELSE x / __nn END)")
    val withVn = r.withColumn("__nn",
        expr("sqrt(aggregate(CAST(embedding AS ARRAY<DOUBLE>), 0D, (a, x) -> a + x * x))"))
      .withColumn("__vn", vn)
      .select(col("vec_id"), col("cluster"), col("kept"), col("__vn"))
    val x = withVn.select(col("cluster").as("c1"), col("vec_id").as("id1"),
      col("kept").as("k1"), col("__vn").as("v1"))
    val y = withVn.select(col("cluster").as("c2"), col("vec_id").as("id2"),
      col("kept").as("k2"), col("__vn").as("v2"))
    // both invariant checks read the SAME pair set — materialize once
    // (narrow: ids + kept flags + sim), not twice
    val pairs = x.join(y, col("c1") === col("c2") && col("id1") < col("id2"))
      .withColumn("sim", dot_product(col("v1"), col("v2")))
      .select(col("id1"), col("id2"), col("k1"), col("k2"), col("sim"))
      .localCheckpoint()
    val keptViol = pairs.filter(col("k1") && col("k2") && col("sim") >= 0.4).count()
    val unjustified = withVn.filter(!col("kept"))
      .join(pairs.filter(col("sim") >= 0.4).select(col("id2")),
        col("vec_id") === col("id2"), "left_anti").count()
    import spark.implicits._
    Seq((r.count(), unjustified == 0L, keptViol == 0L))
      .toDF("n_total", "drops_justified", "kept_distinct")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d50_semantic_dedup" -> d50SemanticDedup,
    "d41_exact_dedup" -> d41Exact,
    "d42_jaccard_pairs" -> d42JaccardPairs,
    "d43_minhash_sigs" -> d43MinhashSigs,
    "d44_lsh_pairs" -> d44LshPairs,
    "d51_incremental_dedup" -> d51IncrementalDedup,
    "d52_substring_spans" -> d52SubstringSpans,
    "d45_simhash" -> d45Simhash,
    "d46_emb_neardup" -> d46EmbNearDup,
    "d47_srp_neardup" -> d47SrpNearDup,
    "d48_dedup_groups" -> d48DedupGroups,
    "d49_paragraph_dedup" -> d49ParagraphDedup,
    "p70_curation" -> p70Curation,
  )

  val oracleSql: Map[String, String] = {
    val dWords = "string_split(text, ' ')"
    val dShingles =
      s"list_distinct(list_transform(generate_series(1, len($dWords) - 2)," +
        s" i -> $dWords[i] || ' ' || $dWords[i+1] || ' ' || $dWords[i+2]))"
    def dHash(w: String) = s"CAST(concat('0x', substr(md5($w), 1, 8)) AS BIGINT)"
    // hashed distinct shingles — mirrors the engine exactly (jaccard is
    // computed over 32-bit shingle hashes on both sides)
    val dHashedShingles = s"list_distinct(list_transform($dShingles, s -> ${dHash("s")} % $P))"
    def dMinhash(j: Int): String = {
      val (a, b) = seeds(j)
      s"list_min(list_transform(sh, x -> ($a * x + $b) % $P))"
    }
    val dJaccard =
      "CAST(len(list_intersect(a_sh, b_sh)) AS DOUBLE) / " +
        "(len(a_sh) + len(b_sh) - len(list_intersect(a_sh, b_sh)))"
    // candidate CTEs shared by d44 (pairs) and d48 (groups over the pairs)
    val dLshCand =
      s"""sig AS (
         |  SELECT doc_id, sh,
         |   [${(0 until 4).map(bd => s"'$bd:' || ${dMinhash(2 * bd)} || ':' || ${dMinhash(2 * bd + 1)}").mkString(", ")}] AS bands
         |  FROM (SELECT doc_id, $dHashedShingles AS sh FROM documents)),
         |banded AS (SELECT doc_id, sh, unnest(bands) AS bk FROM sig),
         |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
         |    a.sh AS a_sh, b.sh AS b_sh
         |  FROM banded a JOIN banded b ON a.bk = b.bk AND a.doc_id < b.doc_id)""".stripMargin
    Map(
      "d41_exact_dedup" ->
        "SELECT COUNT(*) AS n_docs, COUNT(DISTINCT md5(text)) AS n_unique FROM documents",
      // k-means isn't SQL-replicable; the gate ships Spark-RE-VERIFIED
      // invariants the oracle plants as literal true (v26r/v30 pattern),
      // anchored by the exact row count
      "d50_semantic_dedup" ->
        """SELECT COUNT(*) AS n_total, true AS drops_justified,
          | true AS kept_distinct FROM embeddings""".stripMargin,
      "d42_jaccard_pairs" ->
        s"""WITH s AS (SELECT doc_id, $dHashedShingles AS sh FROM documents)
           |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           | CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           |   / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
           |FROM s a JOIN s b ON a.doc_id < b.doc_id
           |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           |   / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5
           |ORDER BY a_id, b_id""".stripMargin,
      "d43_minhash_sigs" ->
        s"""SELECT doc_id, ${seeds.indices.map(j => s"${dMinhash(j)} AS s$j").mkString(", ")}
           |FROM (SELECT doc_id, $dHashedShingles AS sh FROM documents)
           |ORDER BY doc_id""".stripMargin,
      "d44_lsh_pairs" ->
        s"""WITH $dLshCand
           |SELECT a_id, b_id, $dJaccard AS jaccard FROM cand
           |WHERE $dJaccard >= 0.5 ORDER BY a_id, b_id""".stripMargin,
      // d51: old×new band join (never old×old), oldest duplicate per new
      // doc; the df-cap is inert at gate scale exactly as in d44
      "d51_incremental_dedup" ->
        s"""WITH sig AS (
           |  SELECT doc_id, sh,
           |   [${(0 until 4).map(bd => s"'$bd:' || ${dMinhash(2 * bd)} || ':' || ${dMinhash(2 * bd + 1)}").mkString(", ")}] AS bands
           |  FROM (SELECT doc_id, $dHashedShingles AS sh FROM documents)),
           |ob AS (SELECT doc_id, sh, unnest(bands) AS bk FROM sig
           |  WHERE doc_id % 5 <> 0),
           |nb AS (SELECT doc_id, sh, unnest(bands) AS bk FROM sig
           |  WHERE doc_id % 5 = 0),
           |cand AS (SELECT DISTINCT nb.doc_id AS n_id, ob.doc_id AS o_id,
           |    nb.sh AS n_sh, ob.sh AS o_sh
           |  FROM nb JOIN ob ON nb.bk = ob.bk),
           |ver AS (SELECT n_id, o_id,
           |    CAST(len(list_intersect(n_sh, o_sh)) AS DOUBLE)
           |      / (len(n_sh) + len(o_sh) - len(list_intersect(n_sh, o_sh))) AS jaccard
           |  FROM cand
           |  WHERE CAST(len(list_intersect(n_sh, o_sh)) AS DOUBLE)
           |      / (len(n_sh) + len(o_sh) - len(list_intersect(n_sh, o_sh))) >= 0.5),
           |best AS (SELECT n_id, MIN(o_id) AS dup_of FROM ver GROUP BY n_id)
           |SELECT s.doc_id, b.dup_of, v.jaccard,
           |  b.dup_of IS NULL AS kept
           |FROM (SELECT DISTINCT doc_id FROM sig WHERE doc_id % 5 = 0) s
           |LEFT JOIN best b ON b.n_id = s.doc_id
           |LEFT JOIN ver v ON v.n_id = s.doc_id AND v.o_id = b.dup_of
           |ORDER BY s.doc_id""".stripMargin,
      // same W=10 windows / distinct-doc test / gaps-and-islands merge;
      // range(1, n-W+2) is empty when n < W, mirroring the size guard
      "d52_substring_spans" ->
        """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
          |wins AS (SELECT doc_id, u.i - 1 AS pos,
          |    array_to_string(t[u.i:u.i+9], ' ') AS w
          |  FROM toks, UNNEST(range(1, len(t) - 10 + 2)) AS u(i)
          |  WHERE len(t) >= 10),
          |dupw AS (SELECT w FROM wins GROUP BY w
          |  HAVING COUNT(DISTINCT doc_id) >= 2),
          |m AS (SELECT doc_id, pos FROM wins WHERE w IN (SELECT w FROM dupw)),
          |sp AS (SELECT doc_id, pos,
          |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
          |  FROM m),
          |sg AS (SELECT doc_id, grp, COUNT(*) AS run, MIN(pos) AS start_pos
          |  FROM sp GROUP BY doc_id, grp)
          |SELECT doc_id, COUNT(*) AS n_spans,
          |  CAST(SUM(run) AS BIGINT) AS dup_windows,
          |  CAST(MAX(run + 9) AS BIGINT) AS max_span_tokens,
          |  CAST(MIN(start_pos) AS BIGINT) AS first_pos
          |FROM sg GROUP BY doc_id ORDER BY doc_id""".stripMargin,
      // transitive closure of the undirected pair graph; LEAST(s, MIN(d))
      // is the component's min doc_id — identical to hash-min convergence
      "d48_dedup_groups" ->
        s"""WITH RECURSIVE $dLshCand,
           |pairs AS (SELECT a_id, b_id FROM cand WHERE $dJaccard >= 0.5),
           |edges AS (SELECT a_id AS s, b_id AS d FROM pairs
           |  UNION SELECT b_id, a_id FROM pairs),
           |reach(s, d) AS (SELECT s, d FROM edges
           |  UNION SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s)
           |SELECT s AS doc_id, LEAST(s, MIN(d)) AS cluster_id
           |FROM reach GROUP BY s ORDER BY doc_id""".stripMargin,
      // chunking + keep-first mirrored on md5(chunk) — the narrow key the
      // engine shuffles; list slicing/join semantics match slice/concat_ws
      "d49_paragraph_dedup" ->
        s"""WITH ws AS (SELECT doc_id, $dWords AS w FROM documents),
           |ch AS (SELECT doc_id, i AS idx,
           |    array_to_string(w[(i*8+1):(i*8+8)], ' ') AS chunk
           |  FROM ws, (SELECT unnest(generate_series(0, (len(w)+7)//8 - 1)) AS i)),
           |f AS (SELECT doc_id, idx, length(chunk) AS clen, row_number()
           |    OVER (PARTITION BY md5(chunk) ORDER BY doc_id, idx) AS rn FROM ch)
           |SELECT doc_id, COUNT(*) AS n_chunks,
           |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           |  CAST(CASE WHEN SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) > 0
           |    THEN SUM(CASE WHEN rn = 1 THEN clen + 1 ELSE 0 END) - 1
           |    ELSE 0 END AS BIGINT) AS clean_len
           |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,
      // the full curation pipeline: same closure -> non-keeper drop list,
      // t33's quality formula, per-lang aggregate (davg = decimal-exact avg)
      "p70_curation" ->
        s"""WITH RECURSIVE $dLshCand,
           |pairs AS (SELECT a_id, b_id FROM cand WHERE $dJaccard >= 0.5),
           |edges AS (SELECT a_id AS s, b_id AS d FROM pairs
           |  UNION SELECT b_id, a_id FROM pairs),
           |reach(s, d) AS (SELECT s, d FROM edges
           |  UNION SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
           |drop_docs AS (SELECT s AS doc_id FROM reach
           |  GROUP BY s HAVING LEAST(s, MIN(d)) <> s),
           |scored AS (SELECT lang,
           |   CAST(len($dWords) AS BIGINT) AS n_tokens,
           |   0.4 * (CAST(len(list_distinct($dWords)) AS DOUBLE) / len($dWords))
           |    + 0.3 * least(1.0, CAST(len($dWords) AS DOUBLE) / 50.0)
           |    + 0.3 * (1.0 - CAST(len(list_filter($dWords, w -> w IN ('the', 'a'))) AS DOUBLE)
           |        / len($dWords)) AS quality
           |  FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM drop_docs))
           |SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           |  CAST(SUM(CAST(quality AS DECIMAL(18,9))) AS DOUBLE) / COUNT(quality) AS avg_quality
           |FROM scored WHERE quality >= 0.7
           |GROUP BY lang ORDER BY lang""".stripMargin,
      "d45_simhash" ->
        s"""SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, 31), k ->
           |  CASE WHEN list_sum(list_transform(hs,
           |    h -> CASE WHEN (h >> k) & 1 = 1 THEN 1 ELSE -1 END)) > 0
           |  THEN (CAST(1 AS BIGINT) << k) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS simhash
           |FROM (SELECT doc_id, list_transform($dWords, w -> ${dHash("w")}) AS hs
           |  FROM documents)
           |ORDER BY doc_id""".stripMargin,
      "d46_emb_neardup" ->
        """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
          |p AS (SELECT a.label, a.vec_id AS a_id, b.vec_id AS b_id,
          |  list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i]))
          |   / (sqrt(list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * a.v[i])))
          |    * sqrt(list_sum(list_transform(generate_series(1, len(b.v)), i -> b.v[i] * b.v[i])))) AS sim
          | FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
          |SELECT label, a_id, b_id, sim FROM p WHERE sim >= 0.4
          |ORDER BY a_id, b_id""".stripMargin,
      // replicates the engine bit-for-bit: integer-derived hyperplane
      // coefficients (exact in double), left-to-right sums, 4×8-bit bands,
      // AND the df-cap at the default τ=32 — so the gate stays green at any
      // sf, including ones where buckets run hot and the cap engages
      "d47_srp_neardup" -> {
        val bitcat = (1 to srpBandBits).map(j => s"bits[${srpBandBits}*b+$j]").mkString(" || ")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |sig AS (SELECT vec_id, v,
           |  list_transform(generate_series(0, ${srpPlanes - 1}), p ->
           |    CASE WHEN list_sum(list_transform(generate_series(1, 64),
           |      i -> v[i] * (CAST((CAST(1103515245 AS BIGINT) * (p * 64 + i - 1) + 12345)
           |        % 2048 AS DOUBLE) - 1024))) > 0 THEN 1 ELSE 0 END) AS bits
           |  FROM e),
           |banded AS (SELECT vec_id, v, b::VARCHAR || ':' || $bitcat AS bk
           |  FROM sig, (SELECT unnest(generate_series(0, ${srpBandCount - 1})) AS b)),
           |capped AS (SELECT * FROM banded
           |  WHERE bk IN (SELECT bk FROM banded GROUP BY bk HAVING COUNT(*) <= 32)),
           |cand AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id,
           |    a.v AS a_v, b.v AS b_v
           |  FROM capped a JOIN capped b ON a.bk = b.bk AND a.vec_id < b.vec_id),
           |p AS (SELECT a_id, b_id,
           |  list_sum(list_transform(generate_series(1, 64), i -> a_v[i] * b_v[i]))
           |   / (sqrt(list_sum(list_transform(generate_series(1, 64), i -> a_v[i] * a_v[i])))
           |    * sqrt(list_sum(list_transform(generate_series(1, 64), i -> b_v[i] * b_v[i])))) AS sim
           |  FROM cand)
           |SELECT a_id, b_id, sim FROM p WHERE sim >= 0.4 ORDER BY a_id, b_id""".stripMargin
      },
    )
  }
}
