package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token statistics, language identification, quality scoring, and
  * document fingerprinting over the `documents` table.
  *
  * All operators are pure column expressions (whole-stage codegen, no
  * UDFs), embarrassingly parallel per document — no shuffle except the
  * final aggregation, so they scale linearly with input size.
  *
  * Determinism: word hashes are the first 8 hex chars of md5 (identical in
  * any engine); all ratios are single IEEE divisions of exact integers.
  */
object TextAnalysis {

  /** Tokens of the single-space-separated document text. */
  private val words = "split(text, ' ')"

  /** 32-bit word hash: first 8 hex digits of md5, as BIGINT. */
  private def wordHash(w: String) =
    s"CAST(conv(substr(md5($w), 1, 8), 16, 10) AS BIGINT)"

  /** Shared DuckDB CTE: the per-document packing assignment
    * (doc_id, n_tokens, shard, start_off) — the SQL twin of
    * [[packedDocs]]. p71's oracle aggregates it per (shard, seq); p72's
    * ([[LanceQueries]]) re-aggregates the lance round trip per shard.
    * ONE definition, so a packing-parameter change (shard count, hash,
    * sequence length) cannot silently split the two oracles.
    */
  private[operators] val packedDocsOracleCte: String =
    """d AS (SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |    % 32 AS shard FROM documents),
      |c AS (SELECT *, SUM(n_tokens)
      |    OVER (PARTITION BY shard ORDER BY doc_id) - n_tokens AS start_off
      |  FROM d)""".stripMargin

  /** Per-source token statistics (token counting over an exploded view). */
  def t31TokenStats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("source"), explode(expr(words)).as("w"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("w")).as("n_uniq"),
        (sum(length(col("w"))).cast("double") / count(lit(1))).as("avg_len"))
      .orderBy(col("source"))

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  /** Marker-word language-ID heuristic: score each language by its marker
    * token count, pick the max (fixed precedence en>de>fr>es on ties),
    * "und" when no markers hit. Confusion counts vs the labeled `lang`.
    */
  def t32LangId(spark: SparkSession, dir: String): DataFrame = {
    val scores = langMarkers.map { case (l, ws) =>
      val inList = ws.map(w => s"'$w'").mkString(", ")
      l -> s"size(filter($words, w -> w IN ($inList)))"
    }
    val best = scores.map(_._2).mkString("greatest(", ", ", ")")
    val caseExpr = scores.map { case (l, s) =>
      s"WHEN $s = __best THEN '$l'"
    }.mkString(s"CASE WHEN __best = 0 THEN 'und' ", " ", " END")
    t(spark, dir, "documents")
      .withColumn("__best", expr(best))
      .withColumn("lang_pred", expr(caseExpr))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("lang_pred"))
  }

  /** Quality components + combined score appended to a `documents`-shaped
    * frame — ONE definition feeding both the t33 gate and the p73 mixer,
    * so a formula tweak cannot silently split them. Pure codegen'd
    * expressions, no shuffle.
    */
  private def withQuality(df: DataFrame): DataFrame =
    df.withColumn("n_tokens", expr(s"CAST(size($words) AS BIGINT)"))
      .withColumn("uniq_ratio",
        expr(s"CAST(size(array_distinct($words)) AS DOUBLE) / size($words)"))
      .withColumn("avg_word_len",
        expr(s"CAST(length(text) - (size($words) - 1) AS DOUBLE) / size($words)"))
      .withColumn("stopword_ratio",
        expr(s"CAST(size(filter($words, w -> w IN ('the', 'a'))) AS DOUBLE) / size($words)"))
      .withColumn("quality",
        expr("0.4 * uniq_ratio + 0.3 * least(1.0, CAST(n_tokens AS DOUBLE) / 50.0)" +
          " + 0.3 * (1.0 - stopword_ratio)"))

  /** Per-document quality score: lexical diversity, length saturation,
    * stopword pressure. Output is every component plus the combined score
    * so downstream filters can re-weight without recompute.
    */
  def t33Quality(spark: SparkSession, dir: String): DataFrame =
    withQuality(t(spark, dir, "documents"))
      .select(col("doc_id"), col("n_tokens"), col("uniq_ratio"),
        col("avg_word_len"), col("stopword_ratio"), col("quality"))
      .orderBy(col("doc_id"))

  /** Repetition scoring (t39) — the Gopher-style quality signal: the
    * fraction of a document's word 3-grams that are duplicates of an
    * earlier 3-gram in the SAME document. Boilerplate, keyword stuffing,
    * and decoding loops all show up as high `dup_ratio`; curation
    * pipelines filter on it next to t33's quality score. Pure per-doc
    * column expressions (no explode, no shuffle except the final sort) —
    * embarrassingly parallel at any scale.
    */
  def t39Repetition(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      // materialize the split ONCE per row: referencing `$words` inside
      // the per-element lambda re-evaluates the split per 3-gram (O(n²)
      // per document — measured 6.8 s vs 0.4 s at sf0.1). Catalyst does
      // not hoist loop invariants out of HOF lambdas, and CollapseProject
      // keeps the projection because the non-cheap split is multiply
      // referenced.
      .withColumn("__w", expr(words))
      .withColumn("grams", expr(
        """CASE WHEN size(__w) < 3 THEN array()
          | ELSE transform(sequence(1, size(__w) - 2),
          |   i -> concat_ws(' ', element_at(__w, i),
          |     element_at(__w, i + 1), element_at(__w, i + 2)))
          |END""".stripMargin))
      .select(col("doc_id"),
        expr("CAST(size(grams) AS BIGINT)").as("n_grams"),
        expr("CAST(size(array_distinct(grams)) AS BIGINT)").as("n_uniq"))
      .withColumn("dup_ratio", expr(
        "CASE WHEN n_grams = 0 THEN CAST(0 AS DOUBLE) " +
          "ELSE 1.0 - CAST(n_uniq AS DOUBLE) / n_grams END"))
      .orderBy(col("doc_id"))

  /** Language mixture weights for [[p73BudgetMix]]: the fraction of each
    * language's total tokens the curated mix retains (upsample-by-quality
    * semantics — e.g. keep the best 60% of zh tokens, best 20% of es).
    */
  private val mixWeights =
    "CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.6 WHEN 'de' THEN 0.4 " +
      "WHEN 'fr' THEN 0.3 WHEN 'es' THEN 0.2 ELSE 0.25 END"

  /** Token-budget data mixing (p73) — the step that turns a raw corpus
    * into a training MIXTURE: each language gets a token budget (a target
    * fraction of its total), filled greedily by descending quality until
    * the budget is spent (the document that crosses the line is kept — a
    * budget is a target, not a hard ceiling). Emits per-language audit
    * rows: docs/tokens kept and the quality floor that made the cut.
    *
    * Scale shape: one shuffle on `lang` for the two window passes
    * (running sum + partition total). Languages are few and skewed, so at
    * 100 TB the exact per-language sort is the bottleneck; the scale path
    * computes each language's quality THRESHOLD from an approximate
    * quantile sketch (`approx_percentile(quality, 1 - weight)`) and keeps
    * `quality >= threshold` with a plain filter — no global sort, one
    * aggregation pass, same result up to sketch error at the boundary.
    * The exact form below is what the DuckDB oracle can verify bit-for-bit.
    */
  def p73BudgetMix(spark: SparkSession, dir: String): DataFrame = {
    val ranked = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("quality").desc, col("doc_id"))
    val whole = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
    withQuality(t(spark, dir, "documents"))
      .withColumn("start_off", sum(col("n_tokens")).over(ranked) - col("n_tokens"))
      .withColumn("budget",
        expr(s"CAST($mixWeights AS DOUBLE)") * sum(col("n_tokens")).over(whole))
      .filter(col("start_off") < col("budget"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("kept_tokens"),
        min(col("quality")).as("min_quality"))
      .orderBy(col("lang"))
  }

  /** Rolling polynomial fingerprint over word hashes:
    * fp = fold(0, (acc, h) → (acc·31 + h) mod 1e9+7). Order-sensitive, so
    * it fingerprints the word *sequence*, not the bag.
    */
  def t34Fingerprint(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), expr(
        s"""aggregate(transform($words, w -> ${wordHash("w")}),
           | CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin)
        .as("fingerprint"))
      .orderBy(col("doc_id"))

  /** BPE-ish token counting: a GPT-style pre-tokenizer regex (letter runs,
    * digit runs, other non-space singletons — optionally space-prefixed)
    * followed by a fixed-size chunking that approximates subword merges.
    * Reported per source next to the whitespace token count.
    */
  def t35BpeTokens(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("pieces", expr("regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]', 0)"))
      // ceil(len/4) "merges" per pre-token: a 4-char subword budget
      .withColumn("n_bpe", expr(
        "aggregate(pieces, CAST(0 AS BIGINT), (acc, p) -> acc + CAST(ceil(length(trim(p)) / 4.0) AS BIGINT))"))
      .withColumn("n_ws", expr(s"size($words)"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bpe")).as("bpe_tokens"),
        sum(col("n_ws")).as("ws_tokens"))
      .orderBy(col("source"))

  /** TF-IDF-style salient terms: term frequency per doc joined with corpus
    * document frequency, scored tf·N/df, top-3 per doc by a window rank.
    * One explode + two hash aggregations + a broadcast-able df table + one
    * window pass — every stage scales out on (doc) or (term) keys. The
    * score uses exact-integer division instead of log-idf so both engines
    * produce identical IEEE doubles (ln differs in the last ulp across
    * libm implementations).
    */
  def t36SalientTerms(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val tokens = docs.select(col("doc_id"), explode(expr(words)).as("w"))
    val tf = tokens.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val dfreq = tokens.select(col("doc_id"), col("w")).distinct()
      .groupBy(col("w")).agg(count(lit(1)).as("df"))
    // corpus size as a broadcast single-row join, not a driver collect():
    // the whole operator stays one lazy plan and composes inside pipelines
    val n = docs.agg(countDistinct(col("doc_id")).cast("double").as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("w"))
    tf.join(dfreq, "w")
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf").cast("double") * col("__n") / col("df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("w").as("term"),
        col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** Word-5-gram array over a materialized word column — same ANSI guard
    * and lambda-hoisting rationale as the d42 shingle pipeline.
    */
  private val grams5 =
    "CASE WHEN size(__w) < 5 THEN CAST(array() AS ARRAY<STRING>) " +
      "ELSE array_distinct(transform(sequence(0, size(__w) - 5)," +
      " i -> concat(__w[i], ' ', __w[i+1], ' ', __w[i+2], ' ', __w[i+3], ' ', __w[i+4]))) END"

  /** Benchmark decontamination (training-data hygiene): flag every
    * training document that shares at least one word-5-gram with the
    * held-out eval set — here `doc_id < 20` stands in for the benchmark
    * suite, the way n-gram decontamination is run before every serious
    * pretraining job.
    *
    * Scale shape: the gram posting table is written to scratch storage
    * once (the same optimizer barrier as d42 — without it CollapseProject
    * re-derives the gram pipeline per output row); the eval gram set is
    * tiny by construction (benchmarks are fixed-size while the corpus
    * grows), so the contamination check is a broadcast semi-join against
    * the full training gram table — the 100 TB side is never shuffled.
    */
  def t37Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val scratch = graft.Tables.scratch(dir,
      s"gram5_postings_${Dedup.exprVersion(words, grams5)}")
    if (!Dedup.scratchExists(spark, scratch)) {
      t(spark, dir, "documents")
        // scale-adaptive parallelism (guide §2), not a one-machine constant
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .withColumn("__w", expr(words))
        .select(col("doc_id"), explode(expr(grams5)).as("gram"))
        .write.mode("overwrite").parquet(scratch)
    }
    val grams = spark.read.parquet(scratch)
    val eval = grams.filter(col("doc_id") < 20).select(col("gram")).distinct()
    grams.filter(col("doc_id") >= 20)
      .join(broadcast(eval), "gram")
      // gram arrays are distinct per doc, so plain COUNT is the distinct
      // shared-gram count — no expensive COUNT(DISTINCT) shuffle needed
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  /** Unigram-LM rarity score — the CCNet-style quality proxy: documents
    * whose tokens are rare under the corpus language model are likely
    * noise; documents of pure boilerplate score near 1. Per-token rarity
    * is inverse unigram probability N/count(w); the document score is its
    * mean.
    *
    * Scale shape: one hash-aggregate builds the vocabulary (bounded by
    * the language, not the corpus — broadcasts at any data size), the
    * corpus total rides a broadcast single-row cross join, and the scoring
    * join + per-doc aggregate shuffle only (token, doc_id) pairs. Exact
    * decimal accumulation (`dsum`) keeps the mean order-insensitive and
    * bit-identical to the oracle.
    */
  def t38LmRarity(spark: SparkSession, dir: String): DataFrame = {
    val tokens = t(spark, dir, "documents")
      .select(col("doc_id"), explode(expr(words)).as("w"))
    val vocab = tokens.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val n = vocab.agg(sum(col("cnt")).cast("double").as("__n"))
    tokens.join(broadcast(vocab), "w")
      .crossJoin(broadcast(n))
      .withColumn("r", col("__n") / col("cnt").cast("double"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        (graft.Tables.dsum(col("r"), 6) / count(lit(1))).as("rarity"))
      .orderBy(col("doc_id"))
  }

  /** Sequence packing (the pretraining batcher): documents are sharded by
    * a content-stable hash, concatenated in doc_id order within each
    * shard, and chunked into fixed 2048-token training sequences —
    * standard concat-then-chunk packing. A document belongs to the
    * sequence its FIRST token lands in (`seq_id = start_offset div 2048`);
    * documents straddle chunk boundaries, exactly as real packing does.
    * Output: per (shard, seq) document and token counts.
    *
    * Scale shape: the cumulative sum partitions by shard, so there is no
    * global sort — each shard packs independently, which is how N workers
    * pack 100 TB in parallel. A bigger cluster raises the shard count;
    * the semantics don't change.
    */
  /** Per-document packing assignment: (doc_id, n_tokens, shard, seq_id)
    * — the table a pipeline materializes before writing training shards
    * ([[p71PackSequences]] aggregates it; the storage-export gate in
    * LanceQueries round-trips it through the lance sink).
    */
  private[operators] def packedDocs(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
    t(spark, dir, "documents")
      .select(col("doc_id"),
        expr(s"CAST(size($words) AS BIGINT)").as("n_tokens"),
        expr(s"${wordHash("CAST(doc_id AS STRING)")} % 32").as("shard"))
      .withColumn("start_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_id", expr("start_off div 2048"))
      .select(col("doc_id"), col("n_tokens"), col("shard"), col("seq_id"))
  }

  def p71PackSequences(spark: SparkSession, dir: String): DataFrame =
    packedDocs(spark, dir)
      .groupBy(col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .orderBy(col("shard"), col("seq_id"))

  /** Curriculum-ordered packing (p77): p71's fixed-length sequence
    * packing, but each shard's documents are consumed in CURRICULUM
    * order — short-to-long difficulty buckets, then length, then doc_id
    * — so early sequences hold easy documents and late sequences hard
    * ones (the ordered-data-loading shape curriculum training wants;
    * Spark's window evaluates the per-shard order in one shuffle, the
    * same plan as p71). Per-sequence min/max bucket in the output pins
    * the monotone consumption order through the hash compare.
    */
  def p77CurriculumPack(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col("bucket"), col("n_tokens"), col("doc_id"))
    t(spark, dir, "documents")
      .select(col("doc_id"),
        expr(s"CAST(size($words) AS BIGINT)").as("n_tokens"),
        expr(s"${wordHash("CAST(doc_id AS STRING)")} % 32").as("shard"))
      .withColumn("bucket",
        when(col("n_tokens") < 50, 0).when(col("n_tokens") < 150, 1).otherwise(2))
      .withColumn("start_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_id", expr("start_off div 2048"))
      .groupBy(col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        min(col("bucket")).as("min_bucket"), max(col("bucket")).as("max_bucket"))
      .orderBy(col("shard"), col("seq_id"))
  }

  /** Multiplicative (Knuth) hash of doc_id: deterministic, uniform enough
    * for sampling, and pure 64-bit integer arithmetic — so the DuckDB
    * oracle reproduces it bit-for-bit (no engine-specific hash function,
    * no floating point). doc_id × 2654435761 stays far under 2⁶³.
    */
  private def sampleHash(offset: Long) =
    pmod(col("doc_id") * lit(2654435761L) + lit(offset), lit(4294967296L))

  /** Stratified quota sampling (p74): keep the N pseudo-random documents
    * per language — the "downsample over-represented languages" step of
    * corpus curation. Selection = smallest hash values per stratum, so
    * the sample is deterministic, stable across runs/partitionings, and
    * reproducible by any engine.
    *
    * Scale shape: one shuffle on `lang` for the per-stratum window. At
    * 100 TB the exact per-stratum sort is the bottleneck; the scale path
    * (same as p73's) turns the quota into a HASH THRESHOLD per language
    * (quota/count × 2³², refined by an approx-quantile of h) and keeps
    * `h < threshold` with a plain filter — no sort, same sample up to
    * sketch error at the boundary. The exact form is what DuckDB can
    * verify bit-for-bit.
    */
  def p74StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    t(spark, dir, "documents")
      .withColumn("h", sampleHash(0L))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 50)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"),
        max(col("h")).as("max_h"))
      .orderBy(col("lang"))
  }

  /** Deterministic train/valid/test split (p75): bucket = hash(doc_id) %
    * 100 → 90/5/5. Pure per-row arithmetic — no shuffle, no state: the
    * assignment is stable under appends, repartitioning, and re-runs,
    * which is what makes a split trustworthy at 100 TB (a random() split
    * silently reshuffles examples between train and eval on every
    * materialization). Offset decorrelates it from p74's sample.
    */
  /** Decontamination (p78): drop training documents sharing ANY 13-gram
    * with the held-out eval set — the GPT-3/Llama-style n-gram overlap
    * removal every serious LM pipeline runs before training. Scale
    * shape: the eval set is SMALL by construction, so its distinct
    * 13-grams broadcast and the train side pays one explode + hash
    * semi-join + one anti-join — linear in the corpus, no all-pairs
    * anything. 13 words is the published threshold where chance
    * collisions vanish but paraphrased leakage still catches.
    */
  def p78Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val gram13 =
      "CASE WHEN size(__w) < 13 THEN CAST(array() AS ARRAY<STRING>) " +
        "ELSE transform(sequence(0, size(__w) - 13)," +
        " i -> array_join(slice(__w, i + 1, 13), ' ')) END"
    // planted leakage (the synthetic corpus shares no natural 13-gram):
    // a 13-word "benchmark sentence" appears in every eval doc AND in the
    // doc_id%11==3 slice of training docs — exactly the accidental
    // eval-in-train duplication decontamination exists to catch
    val leak = (1 to 13).map(i => s"zzleak$i").mkString(" ")
    val docs = t(spark, dir, "documents")
      .withColumn("text", concat(col("text"),
        when(col("doc_id") % 97 === 0 || col("doc_id") % 11 === 3,
          lit(s" $leak")).otherwise(lit(""))))
      .withColumn("__w", split(col("text"), " "))
      .withColumn("__g", expr(gram13))
    val isEval = col("doc_id") % 97 === 0
    val evalGrams = docs.filter(isEval)
      .select(explode(col("__g")).as("g")).distinct()
    val train = docs.filter(!isEval)
    val contaminated = train
      .select(col("doc_id"), explode(col("__g")).as("g"))
      .join(broadcast(evalGrams), "g")
      .select(col("doc_id")).distinct()
    train.join(contaminated.withColumn("__c", lit(1)), Seq("doc_id"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_train"),
        sum(when(col("__c").isNotNull, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("__c").isNull, 1L).otherwise(0L)).as("n_kept"))
      .orderBy(col("lang"))
  }

  def p75HashSplit(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("bucket", sampleHash(1234567L) % 100)
      .withColumn("split",
        when(col("bucket") < 90, "train")
          .when(col("bucket") < 95, "valid").otherwise("test"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("split"), col("lang"))

  /** Temperature rebalancing (p76): sample language ℓ at rate
    * min(1, c/√n_ℓ) — the keep-probability ∝ n^(α−1) form of
    * temperature-T sampling with α = 1/T = 1/2, the standard multilingual
    * LM rebalance (big languages damped toward √n, small ones kept
    * whole). Deliberately NO cross-language normalizing sum: a Σ over
    * per-language doubles is partial-order-dependent and could flip a
    * threshold at the last ulp between engines; the per-language closed
    * form is bit-deterministic (IEEE sqrt + division on both sides).
    * Selection reuses the integer multiplicative hash (offset-
    * decorrelated from p74/p75): h < ⌊2³²·rate⌋. Scale shape: one tiny
    * per-language count aggregate, broadcast back, then a stateless
    * per-row filter — the 100 TB side is never shuffled.
    */
  def p76TemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents").withColumn("h", sampleHash(777L))
    val rates = d.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("thresh",
        least(lit(4294967296L),
          floor(lit(4294967296L) * lit(4.0) /
            sqrt(col("n_docs").cast("double")))))
    d.join(broadcast(rates), "lang")
      .filter(col("h") < col("thresh"))
      .groupBy(col("lang"))
      .agg(max(col("n_docs")).as("n_docs"), count(lit(1)).as("n_kept"),
        sum(col("n_chars")).as("kept_chars"))
      .orderBy(col("lang"))
  }

  /** BM25 terms/k of the t40 gate — shared with its oracle so the probe
    * and the SQL twin cannot drift. "the" is a near-stopword (df ≈ N):
    * its idf collapses toward 0, exercising the full idf spread.
    */
  private val bm25Terms = Seq("spark", "vector", "join", "merge", "the")
  private val bm25K = 15

  /** FTS prefix matching (t50): `graft*` expands against the sorted
    * postings (a term-range scan — buckets hash by term, so row-group
    * min/max on the sorted term column does the skipping, not directory
    * pruning) and each expanded term scores with its own df, Lucene's
    * BooleanQuery rewrite. The planted family: two true expansions
    * (`graftalpha`, `graftbeta`), one doc holding both, and a DECOY
    * sharing the prefix only below the boundary (`grafzz` matches
    * `graf*`, not `graft*`) — the gate proves the boundary is exact.
    */
  def t50FtsPrefix(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.FtsIndex
    val dest = graft.Tables.scratch(dir, "docs_fts_prefix")
    val mp = new org.apache.hadoop.fs.Path(new java.io.File(
      s"${FtsIndex.indexPath(dest, "txt")}/fts.json").getAbsolutePath)
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(mp)) {
      t(spark, dir, "documents")
        .withColumn("txt", concat(col("text"),
          when(col("doc_id") % 5 === 0, lit(" graftalpha"))
            .when(col("doc_id") % 5 === 1, lit(" graftbeta"))
            .when(col("doc_id") % 5 === 2, lit(" graftbeta graftalpha"))
            .when(col("doc_id") % 5 === 3, lit(" grafzz"))
            .otherwise(lit(""))))
        .select(col("doc_id"), col("txt"))
        .write.format("lance").mode("overwrite").save(dest)
      FtsIndex.build(spark, spark.read.format("lance").load(dest),
        "txt", "doc_id", dest)
    }
    FtsIndex.search(spark, dest, "txt", "graft*", bm25K)
  }

  /** FTS fuzzy matching (t52): `zzfuzzbase~1` expands to every index
    * term within Levenshtein distance 1 — one column-pruned codegen pass
    * over the postings' term column (length window + bounded-threshold
    * edit distance), each expansion scoring with its own df (Lucene's
    * FuzzyQuery under the BooleanQuery rewrite). Planted family: the
    * exact term, a substitution (`zzfuzzbasx`), a deletion (`zzfuzzbas`)
    * — both distance 1 — and a DECOY at distance 2 (`zzfuzzbaxy`) the
    * query must NOT match: the gate proves the distance boundary exact.
    */
  def t52FtsFuzzy(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.FtsIndex
    val dest = graft.Tables.scratch(dir, "docs_fts_fuzzy")
    val mp = new org.apache.hadoop.fs.Path(new java.io.File(
      s"${FtsIndex.indexPath(dest, "txt")}/fts.json").getAbsolutePath)
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(mp)) {
      t(spark, dir, "documents")
        .withColumn("txt", concat(col("text"),
          when(col("doc_id") % 9 === 0, lit(" zzfuzzbase"))
            .when(col("doc_id") % 9 === 1, lit(" zzfuzzbasx"))
            .when(col("doc_id") % 9 === 2, lit(" zzfuzzbas"))
            .when(col("doc_id") % 9 === 3, lit(" zzfuzzbaxy"))
            .otherwise(lit(""))))
        .select(col("doc_id"), col("txt"))
        .write.format("lance").mode("overwrite").save(dest)
      FtsIndex.build(spark, spark.read.format("lance").load(dest),
        "txt", "doc_id", dest)
    }
    FtsIndex.search(spark, dest, "txt", "zzfuzzbase~1", bm25K)
  }

  /** Weighted multi-field FTS (t53): `title^2 body` — the most common
    * search shape. Each field keeps its OWN index, postings, df and
    * length normalization; scores are boost-weighted and decimal-summed
    * per doc ([[graft.index.FtsIndex.searchFields]], ES most_fields).
    * Planted: `zzmf` lives in some TITLES (%8=0) and some BODIES (%8=2) —
    * title hits must carry the 2x boost, a doc in neither never surfaces.
    */
  def t53FtsFields(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.FtsIndex
    val dest = graft.Tables.scratch(dir, "docs_fts_fields")
    val mp = new org.apache.hadoop.fs.Path(new java.io.File(
      s"${FtsIndex.indexPath(dest, "title")}/fts.json").getAbsolutePath)
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(mp)) {
      t(spark, dir, "documents")
        .withColumn("txt", concat(col("text"),
          when(col("doc_id") % 8 === 2, lit(" zzmf")).otherwise(lit(""))))
        .withColumn("title",
          when(col("doc_id") % 8 === 0, lit("zzmf headline"))
            .when(col("doc_id") % 8 === 1, lit("plain headline"))
            .otherwise(lit("untitled")))
        .select(col("doc_id"), col("txt"), col("title"))
        .write.format("lance").mode("overwrite").save(dest)
      val ds = spark.read.format("lance").load(dest)
      FtsIndex.build(spark, ds, "txt", "doc_id", dest)
      FtsIndex.build(spark, ds, "title", "doc_id", dest)
    }
    FtsIndex.searchFields(spark, dest,
      Seq(("title", 2.0), ("txt", 1.0)), "zzmf", bm25K)
  }

  /** FTS phrase disjunction (t51): `matchMode = "phrases"` — Lucene's
    * BooleanQuery of SHOULD PhraseQuery clauses. Planted family: one doc
    * kind per clause, one holding BOTH (its score is the SUM of the two
    * clause scores — it must rank above every single-clause doc), one
    * with clause A's words REVERSED and the query runs at slop 0, so
    * order matters ([[graft.index.FtsIndex.searchPhrases]]).
    */
  def t51FtsPhrases(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.FtsIndex
    val dest = graft.Tables.scratch(dir, "docs_fts_phrases")
    val mp = new org.apache.hadoop.fs.Path(new java.io.File(
      s"${FtsIndex.indexPath(dest, "txt")}/fts.json").getAbsolutePath)
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(mp)) {
      t(spark, dir, "documents")
        .withColumn("txt", concat(col("text"),
          when(col("doc_id") % 7 === 0, lit(" zzg marker"))
            .when(col("doc_id") % 7 === 1, lit(" zzalpha zzbeta"))
            .when(col("doc_id") % 7 === 2, lit(" zzg marker zzalpha zzbeta"))
            .when(col("doc_id") % 7 === 3, lit(" marker zzg"))
            .otherwise(lit(""))))
        .select(col("doc_id"), col("txt"))
        .write.format("lance").mode("overwrite").save(dest)
      FtsIndex.build(spark, spark.read.format("lance").load(dest),
        "txt", "doc_id", dest, storePositions = true)
    }
    FtsIndex.search(spark, dest, "txt", "zzg marker | zzalpha zzbeta",
      bm25K, matchMode = "phrases")
  }

  /** Full-text search (t40): build the persisted inverted index over
    * `documents.text` once (sidecar parquet under the scratch path, like
    * the vector-index gates), then BM25 top-k through it. Correctness
    * covers the whole path: tokenize → posting lists → pushed term
    * filter → df broadcast → decimal-rounded scoring → top-k. See
    * [[graft.index.FtsIndex]] for the scale contract.
    */
  /** FTS highlighting (t54): t40's BM25 top-k, each hit joined back to
    * its text (broadcast ids → runtime fragment pruning on the corpus)
    * and rendered as a 12-token snippet around the first match with
    * every query-term occurrence bracketed, plus the doc-wide match
    * count — Lucene Highlighter / ES `highlight`, as one codegen'd
    * column expression over the winners only. Driven through the
    * `lance_fts_highlight` TVF (the SQL surface); the oracle recomputes
    * snippet + count with DuckDB list lambdas over the same tokens.
    */
  def t54FtsHighlight(spark: SparkSession, dir: String): DataFrame = {
    val dest = ensureFtsDataset(spark, dir)
    graft.MetaTvfs.register(spark)
    spark.sql(s"SELECT * FROM lance_fts_highlight('$dest', 'text', " +
      s"'${bm25Terms.mkString(" ")}', $bm25K)")
      .withColumn("n_matches", col("n_matches").cast("long"))
  }

  def t40Bm25(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.FtsIndex
    val dest = graft.Tables.scratch(dir, "docs_fts_v1")
    val mp = new org.apache.hadoop.fs.Path(new java.io.File(
      s"${FtsIndex.indexPath(dest, "text")}/fts.json").getAbsolutePath)
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(mp))
      FtsIndex.build(spark, t(spark, dir, "documents"), "text", "doc_id", dest)
    FtsIndex.search(spark, dest, "text", bm25Terms.mkString(" "), bm25K)
  }

  /** Filtered full-text search (t42): BM25 with a `lang = 'en'`
    * PRE-filter, driven through the `lance_fts` TVF (the SQL surface).
    * The documents live as a real lance dataset so the filter side is a
    * pushed-predicate id-column scan; postings are semi-joined against
    * it BEFORE scoring, and corpus stats stay unfiltered (Lucene's
    * filtered-query contract — a filter narrows results, it does not
    * re-weigh the corpus). The oracle replicates exactly that: df over
    * ALL matching docs, candidates restricted to the filter.
    */
  /** Build-once lance dataset + FTS index shared by t42/t45 (the fs.exists
    * guard makes repeat calls free — neither gate re-pays the build). */
  private def ensureFtsDataset(spark: SparkSession, dir: String): String = {
    import graft.index.FtsIndex
    val dest = graft.Tables.scratch(dir, "docs_fts_ds")
    val mp = new org.apache.hadoop.fs.Path(new java.io.File(
      s"${FtsIndex.indexPath(dest, "text")}/fts.json").getAbsolutePath)
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(mp)) {
      t(spark, dir, "documents")
        .write.format("lance").mode("overwrite").save(dest)
      FtsIndex.build(spark, spark.read.format("lance").load(dest),
        "text", "doc_id", dest)
    }
    dest
  }

  def t42FtsFiltered(spark: SparkSession, dir: String): DataFrame = {
    val dest = ensureFtsDataset(spark, dir)
    graft.MetaTvfs.register(spark)
    spark.sql(s"SELECT * FROM lance_fts('$dest', 'text', " +
      s"'${bm25Terms.mkString(" ")}', $bm25K, 'lang = ''en''')")
  }

  /** FTS append refresh (t43): index a SUBSET of the corpus, append the
    * rest to the lance dataset, delta-refresh the index
    * ([[graft.index.FtsIndex.refresh]] — appended fragments only,
    * touched-bucket merge), then BM25-search. The oracle is the SAME
    * full-corpus BM25 as t40, so a hash match proves refresh ==
    * rebuild-from-scratch. Built fresh on every run: the refresh path IS
    * the thing under test (the v34 pattern on the text side).
    */
  def t43FtsRefresh(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.FtsIndex
    val dest = graft.Tables.scratch(dir, "docs_fts_refresh")
    val docs = t(spark, dir, "documents")
    docs.filter(col("doc_id") % 5 =!= 0)
      .write.format("lance").mode("overwrite").save(dest)
    FtsIndex.build(spark, spark.read.format("lance").load(dest),
      "text", "doc_id", dest)
    docs.filter(col("doc_id") % 5 === 0)
      .write.format("lance").mode("append").save(dest)
    FtsIndex.refresh(spark, dest, "text")
    FtsIndex.search(spark, dest, "text", bm25Terms.mkString(" "), bm25K)
  }

  /** Unicode-tokenizer FTS (t44): the pluggable tokenizer under
    * punctuation, case, and accented text. Both sides derive the same
    * decorated column, tokenize with the SAME rule
    * ([[graft.index.FtsIndex.duckdbTokens]] emits the oracle twin of the
    * build/search tokenizer), and BM25-rank — "café" appears in every
    * doc (idf collapses toward 0), "naïve" in a third, spark/the ride
    * the underlying corpus.
    */
  private val t44Terms = Seq("café", "naïve", "spark", "the")

  def t44FtsUnicode(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.FtsIndex
    val dest = graft.Tables.scratch(dir, "docs_fts_uni")
    val mp = new org.apache.hadoop.fs.Path(new java.io.File(
      s"${FtsIndex.indexPath(dest, "txt")}/fts.json").getAbsolutePath)
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(mp)) {
      t(spark, dir, "documents")
        .withColumn("txt", concat(lit("Café, NAÏVE?! "), col("text"),
          when(col("doc_id") % 3 === 0, lit(" — naïve café!"))
            .otherwise(lit(""))))
        .select(col("doc_id"), col("txt"))
        .write.format("lance").mode("overwrite").save(dest)
      FtsIndex.build(spark, spark.read.format("lance").load(dest),
        "txt", "doc_id", dest, tokenizer = "unicode")
    }
    FtsIndex.search(spark, dest, "txt", "Café NAÏVE spark the", bm25K)
  }

  /** Boolean-AND FTS (t45): `matchMode='all'` through the `lance_fts`
    * TVF — only docs containing EVERY query term rank (Lucene MUST
    * semantics); scores are the same BM25 sums, the conjunction only
    * narrows candidates. Reuses t42's lance dataset + index (the ''
    * filter arg means unfiltered — positional-arg skipping).
    */
  def t45FtsConjunction(spark: SparkSession, dir: String): DataFrame = {
    val dest = ensureFtsDataset(spark, dir)
    graft.MetaTvfs.register(spark)
    spark.sql(s"SELECT * FROM lance_fts('$dest', 'text', " +
      s"'${bm25Terms.mkString(" ")}', $bm25K, '', 'all')")
  }

  /** Exact-phrase FTS (t46): positional postings + consecutive-position
    * verification. Docs with doc_id%7==0 get the planted phrase "graft
    * marker token" appended; doc_id%7==1 get the DECOY "token graft
    * marker x" — all three terms present (an AND-match would wrongly
    * include them) but never the in-order consecutive sequence, so the
    * gate fails if position checking regresses to term conjunction. The
    * oracle finds phrase docs by single-space substring match (exactly
    * the space tokenizer's adjacency) and scores them with the same BM25
    * sum over the phrase terms.
    */
  private val t46Phrase = Seq("graft", "marker", "token")

  def t46FtsPhrase(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.FtsIndex
    val dest = graft.Tables.scratch(dir, "docs_fts_phrase")
    val mp = new org.apache.hadoop.fs.Path(new java.io.File(
      s"${FtsIndex.indexPath(dest, "txt")}/fts.json").getAbsolutePath)
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(mp)) {
      t(spark, dir, "documents")
        .withColumn("txt", concat(col("text"),
          when(col("doc_id") % 7 === 0, lit(" graft marker token"))
            .when(col("doc_id") % 7 === 1, lit(" token graft marker x"))
            .otherwise(lit(""))))
        .select(col("doc_id"), col("txt"))
        .write.format("lance").mode("overwrite").save(dest)
      FtsIndex.build(spark, spark.read.format("lance").load(dest),
        "txt", "doc_id", dest, storePositions = true)
    }
    FtsIndex.search(spark, dest, "txt", t46Phrase.mkString(" "), bm25K,
      matchMode = "phrase")
  }

  /** NOT + sloppy-phrase FTS (t49): the two query operators a search
    * user types right after AND/phrase — `-term` exclusion (Lucene
    * MUST_NOT: anti-join on the excluded term's postings before scoring)
    * and `phrase~N` slop (in-order within-window match via a greedy
    * earliest position chain). Four planted suffixes make every decoy
    * class distinguishable:
    *   - %7==0: exact phrase              → matches at any slop
    *   - %7==1: one filler token inside   → slop 1 YES, slop 0 no
    *   - %7==2: two fillers               → slop 1 NO (the N vs N+1 line)
    *   - %7==3: exact phrase + `zzexcl`   → excluded despite matching
    * The oracle derives membership from the same decorated text with a
    * span-≤-(m-1+N) regex (the space tokenizer's positions ARE split
    * indexes) minus the exclusion, then scores the same BM25 sum.
    */
  private val t49Phrase = Seq("graft", "marker", "token")

  def t49FtsNotSlop(spark: SparkSession, dir: String): DataFrame = {
    import graft.index.FtsIndex
    val dest = graft.Tables.scratch(dir, "docs_fts_notslop")
    val mp = new org.apache.hadoop.fs.Path(new java.io.File(
      s"${FtsIndex.indexPath(dest, "txt")}/fts.json").getAbsolutePath)
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(mp)) {
      t(spark, dir, "documents")
        .withColumn("txt", concat(col("text"),
          when(col("doc_id") % 7 === 0, lit(" graft marker token"))
            .when(col("doc_id") % 7 === 1, lit(" graft marker pad token"))
            .when(col("doc_id") % 7 === 2, lit(" graft marker pad pad token"))
            .when(col("doc_id") % 7 === 3, lit(" graft marker token zzexcl"))
            .otherwise(lit(""))))
        .select(col("doc_id"), col("txt"))
        .write.format("lance").mode("overwrite").save(dest)
      FtsIndex.build(spark, spark.read.format("lance").load(dest),
        "txt", "doc_id", dest, storePositions = true)
    }
    FtsIndex.search(spark, dest, "txt",
      s"${t49Phrase.mkString(" ")} -zzexcl", bm25K, matchMode = "phrase~1")
  }

  /** PII patterns shared by t41 and its oracle. Restricted to the regex
    * dialect intersection of Java (Spark) and RE2 (DuckDB): character
    * classes, bounded repeats, `\b` — no backreferences, no lookaround.
    */
  private val emailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val ipPat = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  private val phonePat = "\\b[0-9]{3}-[0-9]{4}\\b"

  /** PII redaction (t41) — the compliance pass every training-data
    * pipeline runs before export: emails, IPv4s, and phone-shaped numbers
    * replaced by typed placeholder tokens, with per-source match counts
    * for the audit trail. The corpus is synthetic (no real PII), so the
    * gate plants deterministic contact strings derived from doc_id/source
    * — the redaction machinery (pattern order: emails first, then IPs,
    * then phones, so a broad pattern can never eat part of a narrower
    * earlier one), counting, and length accounting are the real thing.
    *
    * Pure per-row regex expressions (codegen'd, no UDFs, no shuffle
    * before the per-source aggregate) — linear at any scale.
    */
  def t41PiiRedact(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("txt", concat(
        col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@"), col("source"), lit(".com"),
        when(col("doc_id") % 3 =!= 0, concat(lit(" or 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(lit("")),
        when(col("doc_id") % 2 === 0, concat(lit(" from 10."),
          (col("doc_id") % 256).cast("string"), lit(".0.1"))).otherwise(lit(""))))
      .withColumn("red",
        regexp_replace(regexp_replace(regexp_replace(col("txt"),
          lit(emailPat), lit("<EMAIL>")),
          lit(ipPat), lit("<IP>")),
          lit(phonePat), lit("<PHONE>")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(regexp_count(col("txt"), lit(emailPat))).as("n_emails"),
        sum(regexp_count(col("txt"), lit(ipPat))).as("n_ips"),
        sum(regexp_count(col("txt"), lit(phonePat))).as("n_phones"),
        sum(length(col("red"))).as("sum_len_redacted"))
      .orderBy(col("source"))

  /** Sliding-window document chunking (t47) — the context-window prep step
    * every RAG / long-document training pipeline runs: cut each document
    * into fixed-size token windows (32 tokens) advanced by a fixed stride
    * (24 tokens → 8-token overlap, so no boundary sentence is ever seen by
    * zero chunks). Emits one row per chunk with its 0-based token offset,
    * actual length (the tail chunk may be short), and an md5 content
    * fingerprint so downstream exact-dedup (d41) can run at chunk grain.
    *
    * Scale shape: `sequence`+`posexplode` are per-row codegen'd expressions
    * — no shuffle at all before the gate's ORDER BY, linear in corpus
    * size, and the fan-out factor is n_tokens/stride (bounded by the
    * document length cap a real pipeline enforces upstream).
    */
  def t47Chunking(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      // materialize the split once per row (the t39 lesson: HOF lambdas
      // re-evaluate multiply-referenced non-cheap expressions)
      .withColumn("__w", expr(words))
      .select(col("doc_id"), col("__w"),
        posexplode(expr("sequence(0, greatest(size(__w) - 1, 0), 24)"))
          .as(Seq("chunk_id", "start_tok")))
      .select(
        col("doc_id"),
        col("chunk_id").cast("bigint").as("chunk_id"),
        col("start_tok").cast("bigint").as("start_tok"),
        expr("CAST(least(32, size(__w) - start_tok) AS BIGINT)")
          .as("n_chunk_tokens"),
        expr("md5(concat_ws(' ', slice(__w, start_tok + 1, 32)))")
          .as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))

  /** Corpus-level bigram heavy hitters per language (t48) — the
    * "what is actually in this corpus" audit query: top-5 most frequent
    * word bigrams per language with deterministic tie-break (count DESC,
    * then bigram). Boilerplate and templated text dominate this list, so
    * curation pipelines run it before and after dedup as a drift check.
    *
    * Scale shape: the explode is linear and the groupBy gets map-side
    * partial aggregation, so the shuffle carries (lang, bigram) partial
    * counts — vocabulary-bounded, not corpus-bounded. The per-lang top-5
    * window runs AFTER aggregation on the counts table. At 100 TB with an
    * open-ended vocabulary you'd pre-filter candidates with the q49
    * count-min sketch; the exact form is what DuckDB verifies.
    */
  def t48NgramTopk(spark: SparkSession, dir: String): DataFrame = {
    val byLang = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n").desc, col("bigram"))
    t(spark, dir, "documents")
      .withColumn("__w", expr(words))
      .filter(expr("size(__w) >= 2"))
      .select(col("lang"), explode(expr(
        """transform(sequence(1, size(__w) - 1),
          |  i -> concat(element_at(__w, i), ' ', element_at(__w, i + 1)))"""
          .stripMargin)).as("bigram"))
      .groupBy(col("lang"), col("bigram"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(byLang).cast("bigint"))
      .filter(col("rank") <= 5)
      .select(col("lang"), col("rank"), col("bigram"), col("n"))
      .orderBy(col("lang"), col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t35_bpe_tokens" -> t35BpeTokens,
    "t37_decontaminate" -> t37Decontaminate,
    "t38_lm_rarity" -> t38LmRarity,
    "p71_pack_sequences" -> p71PackSequences,
    "t36_salient_terms" -> t36SalientTerms,
    "t31_token_stats" -> t31TokenStats,
    "t32_lang_id" -> t32LangId,
    "t33_quality" -> t33Quality,
    "t34_fingerprint" -> t34Fingerprint,
    "t39_repetition" -> t39Repetition,
    "t40_bm25" -> t40Bm25,
    "t42_fts_filtered" -> t42FtsFiltered,
    "t43_fts_refresh" -> t43FtsRefresh,
    "t44_fts_unicode" -> t44FtsUnicode,
    "t45_fts_conjunction" -> t45FtsConjunction,
    "t46_fts_phrase" -> t46FtsPhrase,
    "t49_fts_not_slop" -> t49FtsNotSlop,
    "t50_fts_prefix" -> t50FtsPrefix,
    "t52_fts_fuzzy" -> t52FtsFuzzy,
    "t53_fts_fields" -> t53FtsFields,
    "t54_fts_highlight" -> t54FtsHighlight,
    "t51_fts_phrases" -> t51FtsPhrases,
    "t41_pii_redact" -> t41PiiRedact,
    "t47_chunking" -> t47Chunking,
    "t48_ngram_topk" -> t48NgramTopk,
    "p73_budget_mix" -> p73BudgetMix,
    "p74_stratified_sample" -> p74StratifiedSample,
    "p75_hash_split" -> p75HashSplit,
    "p78_decontaminate" -> p78Decontaminate,
    "p76_temperature_mix" -> p76TemperatureMix,
    "p77_curriculum_pack" -> p77CurriculumPack,
  )

  val oracleSql: Map[String, String] = {
    val dWords = "string_split(text, ' ')"
    def dHash(w: String) = s"CAST(concat('0x', substr(md5($w), 1, 8)) AS BIGINT)"
    val dScores = langMarkers.map { case (l, ws) =>
      val inList = ws.map(w => s"'$w'").mkString(", ")
      l -> s"len(list_filter($dWords, w -> w IN ($inList)))"
    }
    val dBest = dScores.map(_._2).mkString("greatest(", ", ", ")")
    val dCase = dScores.map { case (l, s) => s"WHEN $s = __best THEN '$l'" }
      .mkString("CASE WHEN __best = 0 THEN 'und' ", " ", " END")
    Map(
      "t36_salient_terms" ->
        s"""WITH tok AS (SELECT doc_id, unnest($dWords) AS w FROM documents),
           |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY doc_id, w),
           |dfreq AS (SELECT w, COUNT(*) AS df
           |  FROM (SELECT DISTINCT doc_id, w FROM tok) GROUP BY w),
           |n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
           |scored AS (SELECT tf.doc_id, tf.w, tf.tf, dfreq.df,
           |    CAST(tf.tf AS DOUBLE) * (SELECT n FROM n) / dfreq.df AS score
           |  FROM tf JOIN dfreq USING (w)),
           |ranked AS (SELECT *, row_number()
           |    OVER (PARTITION BY doc_id ORDER BY score DESC, w) AS rank
           |  FROM scored)
           |SELECT doc_id, CAST(rank AS INT) AS rank, w AS term, tf, df, score
           |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
      "t35_bpe_tokens" ->
        s"""SELECT source, COUNT(*) AS n_docs,
           | CAST(SUM(list_reduce(list_prepend(CAST(0 AS BIGINT),
           |   list_transform(regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]'),
           |     p -> CAST(ceil(length(trim(p)) / 4.0) AS BIGINT))),
           |   (acc, x) -> acc + x)) AS BIGINT) AS bpe_tokens,
           | CAST(SUM(len($dWords)) AS BIGINT) AS ws_tokens
           |FROM documents GROUP BY source ORDER BY source""".stripMargin,
      "t37_decontaminate" ->
        s"""WITH w AS (SELECT doc_id, $dWords AS ws FROM documents),
           |g AS (SELECT doc_id, unnest(list_distinct(list_transform(
           |    generate_series(1, len(ws) - 4),
           |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
           |      || ' ' || ws[i+4]))) AS gram FROM w),
           |ev AS (SELECT DISTINCT gram FROM g WHERE doc_id < 20)
           |SELECT g.doc_id, COUNT(*) AS n_shared
           |FROM g JOIN ev USING (gram) WHERE g.doc_id >= 20
           |GROUP BY g.doc_id ORDER BY doc_id""".stripMargin,
      "t38_lm_rarity" ->
        s"""WITH tok AS (SELECT doc_id, unnest($dWords) AS w FROM documents),
           |vocab AS (SELECT w, COUNT(*) AS cnt FROM tok GROUP BY w),
           |n AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n FROM vocab)
           |SELECT doc_id, COUNT(*) AS n_tokens,
           | CAST(SUM(CAST((SELECT n FROM n) / cnt AS DECIMAL(18,6))) AS DOUBLE)
           |   / COUNT(*) AS rarity
           |FROM tok JOIN vocab USING (w)
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
      "p77_curriculum_pack" ->
        s"""WITH d AS (SELECT doc_id,
           |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           |  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           |    % 32 AS shard FROM documents),
           |b AS (SELECT *, CASE WHEN n_tokens < 50 THEN 0
           |    WHEN n_tokens < 150 THEN 1 ELSE 2 END AS bucket FROM d),
           |c AS (SELECT *, SUM(n_tokens)
           |    OVER (PARTITION BY shard ORDER BY bucket, n_tokens, doc_id)
           |    - n_tokens AS start_off FROM b)
           |SELECT shard, CAST(start_off // 2048 AS BIGINT) AS seq_id,
           |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           |  MIN(bucket) AS min_bucket, MAX(bucket) AS max_bucket
           |FROM c GROUP BY shard, seq_id ORDER BY shard, seq_id""".stripMargin,
      "p71_pack_sequences" ->
        s"""WITH $packedDocsOracleCte
           |SELECT shard, CAST(start_off // 2048 AS BIGINT) AS seq_id, COUNT(*) AS n_docs,
           | CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
           |FROM c GROUP BY 1, 2 ORDER BY shard, seq_id""".stripMargin,
      "t47_chunking" ->
        s"""WITH w AS (SELECT doc_id, $dWords AS ws FROM documents),
           |c AS (SELECT doc_id, ws,
           |    unnest(generate_series(0, len(ws) - 1, 24)) AS start_tok
           |  FROM w)
           |SELECT doc_id, CAST(start_tok // 24 AS BIGINT) AS chunk_id,
           | CAST(start_tok AS BIGINT) AS start_tok,
           | CAST(least(32, len(ws) - start_tok) AS BIGINT) AS n_chunk_tokens,
           | md5(array_to_string(ws[start_tok + 1 : start_tok + 32], ' '))
           |   AS chunk_md5
           |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
      "t48_ngram_topk" ->
        s"""WITH w AS (SELECT lang, $dWords AS ws FROM documents
           |  WHERE len($dWords) >= 2),
           |b AS (SELECT lang, unnest(list_transform(
           |    generate_series(1, len(ws) - 1),
           |    i -> ws[i] || ' ' || ws[i + 1])) AS bigram FROM w),
           |c AS (SELECT lang, bigram, COUNT(*) AS n FROM b GROUP BY 1, 2),
           |r AS (SELECT *, row_number()
           |    OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rank
           |  FROM c)
           |SELECT lang, CAST(rank AS BIGINT) AS rank, bigram, n
           |FROM r WHERE rank <= 5 ORDER BY lang, rank""".stripMargin,
      "t31_token_stats" ->
        s"""SELECT source, COUNT(*) AS n_tokens, COUNT(DISTINCT w) AS n_uniq,
           | CAST(SUM(length(w)) AS DOUBLE) / COUNT(*) AS avg_len
           |FROM (SELECT source, unnest($dWords) AS w FROM documents)
           |GROUP BY source ORDER BY source""".stripMargin,
      "t32_lang_id" ->
        s"""SELECT lang, $dCase AS lang_pred, COUNT(*) AS n
           |FROM (SELECT lang, text, $dBest AS __best FROM documents)
           |GROUP BY 1, 2 ORDER BY lang, lang_pred""".stripMargin,
      "t33_quality" ->
        s"""SELECT doc_id, n_tokens, uniq_ratio, avg_word_len, stopword_ratio,
           | 0.4 * uniq_ratio + 0.3 * least(1.0, CAST(n_tokens AS DOUBLE) / 50.0)
           |   + 0.3 * (1.0 - stopword_ratio) AS quality
           |FROM (SELECT doc_id, len($dWords) AS n_tokens,
           |  CAST(len(list_distinct($dWords)) AS DOUBLE) / len($dWords) AS uniq_ratio,
           |  CAST(length(text) - (len($dWords) - 1) AS DOUBLE) / len($dWords) AS avg_word_len,
           |  CAST(len(list_filter($dWords, w -> w IN ('the', 'a'))) AS DOUBLE)
           |    / len($dWords) AS stopword_ratio
           | FROM documents)
           |ORDER BY doc_id""".stripMargin,
      "t34_fingerprint" ->
        s"""SELECT doc_id,
           | list_reduce(list_prepend(CAST(0 AS BIGINT),
           |   list_transform($dWords, w -> ${dHash("w")})),
           |   (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
           |FROM documents ORDER BY doc_id""".stripMargin,
      "t39_repetition" ->
        s"""SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
           | CAST(len(list_distinct(grams)) AS BIGINT) AS n_uniq,
           | CASE WHEN len(grams) = 0 THEN CAST(0 AS DOUBLE)
           |   ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams) END
           |   AS dup_ratio
           |FROM (SELECT doc_id,
           |  CASE WHEN len($dWords) < 3 THEN []
           |    ELSE list_transform(generate_series(1, len($dWords) - 2),
           |      i -> concat_ws(' ', $dWords[i], $dWords[i + 1], $dWords[i + 2]))
           |  END AS grams FROM documents)
           |ORDER BY doc_id""".stripMargin,
      // BM25 twin of FtsIndex.search: identical arithmetic order, each
      // contribution rounded to DECIMAL(18,6) before the order-insensitive
      // per-doc sum (absorbs any 1-ulp ln() difference between engines)
      // t40's BM25 with candidates restricted to the filter AFTER df/avgdl
      // are computed over the full corpus — the engine's exact semantics
      "t42_fts_filtered" -> {
        val inList = bm25Terms.map(w => s"'$w'").mkString(", ")
        s"""WITH tok AS (SELECT doc_id, len($dWords) AS dl,
           |    unnest($dWords) AS term FROM documents),
           |post AS (SELECT term, doc_id, dl, COUNT(*) AS tf FROM tok
           |  WHERE term IN ($inList) GROUP BY 1, 2, 3),
           |dfs AS (SELECT term, COUNT(*) AS df FROM post GROUP BY term),
           |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(len($dWords)) AS BIGINT) AS sumdl FROM documents),
           |cand AS (SELECT post.* FROM post
           |  WHERE doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en'))
           |SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS score FROM (
           |  SELECT cand.doc_id, CAST(
           |      (ln(1.0 + ((CAST((SELECT n FROM st) - df AS DOUBLE) + 0.5)
           |          / (CAST(df AS DOUBLE) + 0.5)))
           |        * (tf * CAST(2.2 AS DOUBLE)))
           |      / (tf + 1.2 * (0.25 + (0.75 * dl)
           |          / (CAST((SELECT sumdl FROM st) AS DOUBLE) / (SELECT n FROM st))))
           |    AS DECIMAL(18,6)) AS c
           |  FROM cand JOIN dfs USING (term))
           |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT $bm25K""".stripMargin
      },
      "t40_bm25" -> {
        val inList = bm25Terms.map(w => s"'$w'").mkString(", ")
        s"""WITH tok AS (SELECT doc_id, len($dWords) AS dl,
           |    unnest($dWords) AS term FROM documents),
           |post AS (SELECT term, doc_id, dl, COUNT(*) AS tf FROM tok
           |  WHERE term IN ($inList) GROUP BY 1, 2, 3),
           |dfs AS (SELECT term, COUNT(*) AS df FROM post GROUP BY term),
           |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(len($dWords)) AS BIGINT) AS sumdl FROM documents)
           |SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS score FROM (
           |  SELECT post.doc_id, CAST(
           |      (ln(1.0 + ((CAST((SELECT n FROM st) - df AS DOUBLE) + 0.5)
           |          / (CAST(df AS DOUBLE) + 0.5)))
           |        * (tf * CAST(2.2 AS DOUBLE)))
           |      / (tf + 1.2 * (0.25 + (0.75 * dl)
           |          / (CAST((SELECT sumdl FROM st) AS DOUBLE) / (SELECT n FROM st))))
           |    AS DECIMAL(18,6)) AS c
           |  FROM post JOIN dfs USING (term))
           |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT $bm25K""".stripMargin
      },
      // t54: t40's top-k, then snippet + match count recomputed with
      // DuckDB list lambdas over the same space-tokenized text (window
      // 12, 3 tokens of pre-context, both sides clamp identically)
      "t54_fts_highlight" -> {
        val inList = bm25Terms.map(w => s"'$w'").mkString(", ")
        s"""WITH tok AS (SELECT doc_id, len($dWords) AS dl,
           |    unnest($dWords) AS term FROM documents),
           |post AS (SELECT term, doc_id, dl, COUNT(*) AS tf FROM tok
           |  WHERE term IN ($inList) GROUP BY 1, 2, 3),
           |dfs AS (SELECT term, COUNT(*) AS df FROM post GROUP BY term),
           |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(len($dWords)) AS BIGINT) AS sumdl FROM documents),
           |hits AS (SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS score FROM (
           |  SELECT post.doc_id, CAST(
           |      (ln(1.0 + ((CAST((SELECT n FROM st) - df AS DOUBLE) + 0.5)
           |          / (CAST(df AS DOUBLE) + 0.5)))
           |        * (tf * CAST(2.2 AS DOUBLE)))
           |      / (tf + 1.2 * (0.25 + (0.75 * dl)
           |          / (CAST((SELECT sumdl FROM st) AS DOUBLE) / (SELECT n FROM st))))
           |    AS DECIMAL(18,6)) AS c
           |  FROM post JOIN dfs USING (term))
           |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT $bm25K),
           |calc AS (SELECT h.doc_id, h.score, d.t,
           |    list_filter(range(1, len(d.t) + 1),
           |      i -> list_contains([$inList], d.t[i])) AS m
           |  FROM hits h JOIN (SELECT doc_id, $dWords AS t FROM documents) d
           |    USING (doc_id))
           |SELECT doc_id, score,
           |  array_to_string(list_transform(
           |    list_slice(t, greatest(1, coalesce(m[1], 1) - 3),
           |      greatest(1, coalesce(m[1], 1) - 3) + 11),
           |    w -> CASE WHEN list_contains([$inList], w)
           |      THEN '[' || w || ']' ELSE w END), ' ') AS snippet,
           |  CAST(len(m) AS BIGINT) AS n_matches
           |FROM calc ORDER BY score DESC, doc_id""".stripMargin
      },
      // p78: eval 13-grams vs train docs with a planted leak sentence;
      // the oracle restates the overlap semi-join as plain SQL
      "p78_decontaminate" -> {
        val leak = (1 to 13).map(i => s"zzleak$i").mkString(" ")
        s"""WITH d AS (SELECT doc_id, lang,
           |    text || CASE WHEN doc_id % 97 = 0 OR doc_id % 11 = 3
           |      THEN ' $leak' ELSE '' END AS text FROM documents),
           |w AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM d),
           |g AS (SELECT doc_id, unnest(list_transform(
           |    generate_series(1, greatest(len(w) - 12, 0)),
           |    i -> array_to_string(list_slice(w, i, i + 12), ' '))) AS g FROM w),
           |eg AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0),
           |bad AS (SELECT DISTINCT doc_id FROM g
           |  WHERE doc_id % 97 <> 0 AND g IN (SELECT g FROM eg)),
           |tr AS (SELECT doc_id, lang FROM d WHERE doc_id % 97 <> 0)
           |SELECT lang, COUNT(*) AS n_train,
           |  CAST(SUM(CASE WHEN doc_id IN (SELECT doc_id FROM bad)
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           |  CAST(SUM(CASE WHEN doc_id IN (SELECT doc_id FROM bad)
           |    THEN 0 ELSE 1 END) AS BIGINT) AS n_kept
           |FROM tr GROUP BY lang ORDER BY lang""".stripMargin
      },
      // t43 indexes a subset, appends the rest, delta-refreshes — the
      // final indexed corpus is ALL documents, so the oracle is exactly
      // t40's full-corpus BM25: a hash match proves refresh == rebuild
      "t43_fts_refresh" -> {
        val inList = bm25Terms.map(w => s"'$w'").mkString(", ")
        s"""WITH tok AS (SELECT doc_id, len($dWords) AS dl,
           |    unnest($dWords) AS term FROM documents),
           |post AS (SELECT term, doc_id, dl, COUNT(*) AS tf FROM tok
           |  WHERE term IN ($inList) GROUP BY 1, 2, 3),
           |dfs AS (SELECT term, COUNT(*) AS df FROM post GROUP BY term),
           |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(len($dWords)) AS BIGINT) AS sumdl FROM documents)
           |SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS score FROM (
           |  SELECT post.doc_id, CAST(
           |      (ln(1.0 + ((CAST((SELECT n FROM st) - df AS DOUBLE) + 0.5)
           |          / (CAST(df AS DOUBLE) + 0.5)))
           |        * (tf * CAST(2.2 AS DOUBLE)))
           |      / (tf + 1.2 * (0.25 + (0.75 * dl)
           |          / (CAST((SELECT sumdl FROM st) AS DOUBLE) / (SELECT n FROM st))))
           |    AS DECIMAL(18,6)) AS c
           |  FROM post JOIN dfs USING (term))
           |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT $bm25K""".stripMargin
      },
      // t45: boolean AND — HAVING COUNT(*) = #terms on the per-doc agg
      // (post rows are unique per (term, doc)); scores unchanged
      "t45_fts_conjunction" -> {
        val inList = bm25Terms.map(w => s"'$w'").mkString(", ")
        s"""WITH tok AS (SELECT doc_id, len($dWords) AS dl,
           |    unnest($dWords) AS term FROM documents),
           |post AS (SELECT term, doc_id, dl, COUNT(*) AS tf FROM tok
           |  WHERE term IN ($inList) GROUP BY 1, 2, 3),
           |dfs AS (SELECT term, COUNT(*) AS df FROM post GROUP BY term),
           |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(len($dWords)) AS BIGINT) AS sumdl FROM documents)
           |SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS score FROM (
           |  SELECT post.doc_id, CAST(
           |      (ln(1.0 + ((CAST((SELECT n FROM st) - df AS DOUBLE) + 0.5)
           |          / (CAST(df AS DOUBLE) + 0.5)))
           |        * (tf * CAST(2.2 AS DOUBLE)))
           |      / (tf + 1.2 * (0.25 + (0.75 * dl)
           |          / (CAST((SELECT sumdl FROM st) AS DOUBLE) / (SELECT n FROM st))))
           |    AS DECIMAL(18,6)) AS c
           |  FROM post JOIN dfs USING (term))
           |GROUP BY doc_id HAVING COUNT(*) = ${bm25Terms.size}
           |ORDER BY score DESC, doc_id LIMIT $bm25K""".stripMargin
      },
      // t46: phrase membership via single-space substring match — exactly
      // the space tokenizer's adjacency — then the same BM25 sum over the
      // phrase terms, restricted to phrase docs
      // t49: sloppy-phrase membership via a span-<=3 in-order regex over
      // the SAME decorated text (space-tokenizer positions are split
      // indexes: the three in-order placements of one filler), minus the
      // '-zzexcl' exclusion; then the same BM25 sum over the phrase terms
      "t51_fts_phrases" -> {
        val toks = "string_split(txt, ' ')"
        val bm25 =
          s"""CAST(
             |      (ln(1.0 + ((CAST((SELECT n FROM st) - df AS DOUBLE) + 0.5)
             |          / (CAST(df AS DOUBLE) + 0.5)))
             |        * (tf * CAST(2.2 AS DOUBLE)))
             |      / (tf + 1.2 * (0.25 + (0.75 * dl)
             |          / (CAST((SELECT sumdl FROM st) AS DOUBLE) / (SELECT n FROM st))))
             |    AS DECIMAL(18,6))""".stripMargin
        s"""WITH d AS (SELECT doc_id, text ||
           |    CASE WHEN doc_id % 7 = 0 THEN ' zzg marker'
           |         WHEN doc_id % 7 = 1 THEN ' zzalpha zzbeta'
           |         WHEN doc_id % 7 = 2 THEN ' zzg marker zzalpha zzbeta'
           |         WHEN doc_id % 7 = 3 THEN ' marker zzg'
           |         ELSE '' END AS txt
           |  FROM documents),
           |tok AS (SELECT doc_id, len($toks) AS dl,
           |    unnest($toks) AS term FROM d),
           |post AS (SELECT term, doc_id, dl, COUNT(*) AS tf FROM tok
           |  WHERE term IN ('zzg', 'marker', 'zzalpha', 'zzbeta')
           |  GROUP BY 1, 2, 3),
           |dfs AS (SELECT term, COUNT(*) AS df FROM post GROUP BY term),
           |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(len($toks)) AS BIGINT) AS sumdl FROM d),
           |pha AS (SELECT doc_id FROM d WHERE ' ' || txt || ' ' LIKE '% zzg marker %'),
           |phb AS (SELECT doc_id FROM d WHERE ' ' || txt || ' ' LIKE '% zzalpha zzbeta %'),
           |ca AS (SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS s FROM (
           |    SELECT post.doc_id, $bm25 AS c
           |    FROM post JOIN dfs USING (term)
           |    WHERE term IN ('zzg', 'marker')
           |      AND post.doc_id IN (SELECT doc_id FROM pha))
           |  GROUP BY doc_id),
           |cb AS (SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS s FROM (
           |    SELECT post.doc_id, $bm25 AS c
           |    FROM post JOIN dfs USING (term)
           |    WHERE term IN ('zzalpha', 'zzbeta')
           |      AND post.doc_id IN (SELECT doc_id FROM phb))
           |  GROUP BY doc_id)
           |SELECT doc_id,
           |  CAST(SUM(CAST(s AS DECIMAL(18,6))) AS DOUBLE) AS score
           |FROM (SELECT * FROM ca UNION ALL SELECT * FROM cb)
           |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT $bm25K""".stripMargin
      },
      "t53_fts_fields" -> {
        val bm25 = (post: String, dfs: String, st: String) =>
          s"""CAST((ln(1.0 + ((CAST((SELECT n FROM $st) - df AS DOUBLE) + 0.5)
             |    / (CAST(df AS DOUBLE) + 0.5)))
             |  * (tf * CAST(2.2 AS DOUBLE)))
             |/ (tf + 1.2 * (0.25 + (0.75 * dl)
             |    / (CAST((SELECT sumdl FROM $st) AS DOUBLE) / (SELECT n FROM $st))))
             |AS DECIMAL(18,6))""".stripMargin
        s"""WITH d AS (SELECT doc_id,
           |    text || CASE WHEN doc_id % 8 = 2 THEN ' zzmf' ELSE '' END AS txt,
           |    CASE WHEN doc_id % 8 = 0 THEN 'zzmf headline'
           |         WHEN doc_id % 8 = 1 THEN 'plain headline'
           |         ELSE 'untitled' END AS title
           |  FROM documents),
           |ttok AS (SELECT doc_id, len(string_split(txt, ' ')) AS dl,
           |    unnest(string_split(txt, ' ')) AS term FROM d),
           |tpost AS (SELECT term, doc_id, dl, COUNT(*) AS tf FROM ttok
           |  WHERE term = 'zzmf' GROUP BY 1, 2, 3),
           |tdfs AS (SELECT term, COUNT(*) AS df FROM tpost GROUP BY term),
           |tst AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(len(string_split(txt, ' '))) AS BIGINT) AS sumdl FROM d),
           |tscore AS (SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS s FROM (
           |    SELECT tpost.doc_id, ${bm25("tpost", "tdfs", "tst")} AS c
           |    FROM tpost JOIN tdfs USING (term)) GROUP BY doc_id),
           |htok AS (SELECT doc_id, len(string_split(title, ' ')) AS dl,
           |    unnest(string_split(title, ' ')) AS term FROM d),
           |hpost AS (SELECT term, doc_id, dl, COUNT(*) AS tf FROM htok
           |  WHERE term = 'zzmf' GROUP BY 1, 2, 3),
           |hdfs AS (SELECT term, COUNT(*) AS df FROM hpost GROUP BY term),
           |hst AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(len(string_split(title, ' '))) AS BIGINT) AS sumdl FROM d),
           |hscore AS (SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS s FROM (
           |    SELECT hpost.doc_id, ${bm25("hpost", "hdfs", "hst")} AS c
           |    FROM hpost JOIN hdfs USING (term)) GROUP BY doc_id)
           |SELECT doc_id, CAST(SUM(c2) AS DOUBLE) AS score FROM (
           |  SELECT doc_id, CAST(s * CAST(1.0 AS DOUBLE) AS DECIMAL(18,6)) AS c2 FROM tscore
           |  UNION ALL
           |  SELECT doc_id, CAST(s * CAST(2.0 AS DOUBLE) AS DECIMAL(18,6)) AS c2 FROM hscore)
           |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT $bm25K""".stripMargin
      },
      "t52_fts_fuzzy" -> {
        val toks = "string_split(txt, ' ')"
        s"""WITH d AS (SELECT doc_id, text ||
           |    CASE WHEN doc_id % 9 = 0 THEN ' zzfuzzbase'
           |         WHEN doc_id % 9 = 1 THEN ' zzfuzzbasx'
           |         WHEN doc_id % 9 = 2 THEN ' zzfuzzbas'
           |         WHEN doc_id % 9 = 3 THEN ' zzfuzzbaxy'
           |         ELSE '' END AS txt
           |  FROM documents),
           |tok AS (SELECT doc_id, len($toks) AS dl,
           |    unnest($toks) AS term FROM d),
           |post AS (SELECT term, doc_id, dl, COUNT(*) AS tf FROM tok
           |  WHERE levenshtein(term, 'zzfuzzbase') <= 1 GROUP BY 1, 2, 3),
           |dfs AS (SELECT term, COUNT(*) AS df FROM post GROUP BY term),
           |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(len($toks)) AS BIGINT) AS sumdl FROM d)
           |SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS score FROM (
           |  SELECT post.doc_id, CAST(
           |      (ln(1.0 + ((CAST((SELECT n FROM st) - df AS DOUBLE) + 0.5)
           |          / (CAST(df AS DOUBLE) + 0.5)))
           |        * (tf * CAST(2.2 AS DOUBLE)))
           |      / (tf + 1.2 * (0.25 + (0.75 * dl)
           |          / (CAST((SELECT sumdl FROM st) AS DOUBLE) / (SELECT n FROM st))))
           |    AS DECIMAL(18,6)) AS c
           |  FROM post JOIN dfs USING (term))
           |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT $bm25K""".stripMargin
      },
      "t50_fts_prefix" -> {
        val toks = "string_split(txt, ' ')"
        s"""WITH d AS (SELECT doc_id, text ||
           |    CASE WHEN doc_id % 5 = 0 THEN ' graftalpha'
           |         WHEN doc_id % 5 = 1 THEN ' graftbeta'
           |         WHEN doc_id % 5 = 2 THEN ' graftbeta graftalpha'
           |         WHEN doc_id % 5 = 3 THEN ' grafzz'
           |         ELSE '' END AS txt
           |  FROM documents),
           |tok AS (SELECT doc_id, len($toks) AS dl,
           |    unnest($toks) AS term FROM d),
           |post AS (SELECT term, doc_id, dl, COUNT(*) AS tf FROM tok
           |  WHERE term LIKE 'graft%' GROUP BY 1, 2, 3),
           |dfs AS (SELECT term, COUNT(*) AS df FROM post GROUP BY term),
           |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(len($toks)) AS BIGINT) AS sumdl FROM d)
           |SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS score FROM (
           |  SELECT post.doc_id, CAST(
           |      (ln(1.0 + ((CAST((SELECT n FROM st) - df AS DOUBLE) + 0.5)
           |          / (CAST(df AS DOUBLE) + 0.5)))
           |        * (tf * CAST(2.2 AS DOUBLE)))
           |      / (tf + 1.2 * (0.25 + (0.75 * dl)
           |          / (CAST((SELECT sumdl FROM st) AS DOUBLE) / (SELECT n FROM st))))
           |    AS DECIMAL(18,6)) AS c
           |  FROM post JOIN dfs USING (term))
           |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT $bm25K""".stripMargin
      },
      "t49_fts_not_slop" -> {
        val inList = t49Phrase.map(w => s"'$w'").mkString(", ")
        val toks = "string_split(txt, ' ')"
        s"""WITH d AS (SELECT doc_id, text ||
           |    CASE WHEN doc_id % 7 = 0 THEN ' graft marker token'
           |         WHEN doc_id % 7 = 1 THEN ' graft marker pad token'
           |         WHEN doc_id % 7 = 2 THEN ' graft marker pad pad token'
           |         WHEN doc_id % 7 = 3 THEN ' graft marker token zzexcl'
           |         ELSE '' END AS txt
           |  FROM documents),
           |tok AS (SELECT doc_id, len($toks) AS dl,
           |    unnest($toks) AS term FROM d),
           |post AS (SELECT term, doc_id, dl, COUNT(*) AS tf FROM tok
           |  WHERE term IN ($inList) GROUP BY 1, 2, 3),
           |dfs AS (SELECT term, COUNT(*) AS df FROM post GROUP BY term),
           |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(len($toks)) AS BIGINT) AS sumdl FROM d),
           |ph AS (SELECT doc_id FROM d
           |  WHERE regexp_matches(' ' || txt || ' ',
           |      ' graft (marker token|marker [^ ]+ token|[^ ]+ marker token) ')
           |    AND NOT (' ' || txt || ' ' LIKE '% zzexcl %'))
           |SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS score FROM (
           |  SELECT post.doc_id, CAST(
           |      (ln(1.0 + ((CAST((SELECT n FROM st) - df AS DOUBLE) + 0.5)
           |          / (CAST(df AS DOUBLE) + 0.5)))
           |        * (tf * CAST(2.2 AS DOUBLE)))
           |      / (tf + 1.2 * (0.25 + (0.75 * dl)
           |          / (CAST((SELECT sumdl FROM st) AS DOUBLE) / (SELECT n FROM st))))
           |    AS DECIMAL(18,6)) AS c
           |  FROM post JOIN dfs USING (term)
           |  WHERE post.doc_id IN (SELECT doc_id FROM ph))
           |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT $bm25K""".stripMargin
      },
      "t46_fts_phrase" -> {
        val phrase = t46Phrase.mkString(" ")
        val inList = t46Phrase.map(w => s"'$w'").mkString(", ")
        val toks = "string_split(txt, ' ')"
        s"""WITH d AS (SELECT doc_id, text ||
           |    CASE WHEN doc_id % 7 = 0 THEN ' $phrase'
           |         WHEN doc_id % 7 = 1 THEN ' token graft marker x'
           |         ELSE '' END AS txt
           |  FROM documents),
           |tok AS (SELECT doc_id, len($toks) AS dl,
           |    unnest($toks) AS term FROM d),
           |post AS (SELECT term, doc_id, dl, COUNT(*) AS tf FROM tok
           |  WHERE term IN ($inList) GROUP BY 1, 2, 3),
           |dfs AS (SELECT term, COUNT(*) AS df FROM post GROUP BY term),
           |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(len($toks)) AS BIGINT) AS sumdl FROM d),
           |ph AS (SELECT doc_id FROM d
           |  WHERE ' ' || txt || ' ' LIKE '% $phrase %')
           |SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS score FROM (
           |  SELECT post.doc_id, CAST(
           |      (ln(1.0 + ((CAST((SELECT n FROM st) - df AS DOUBLE) + 0.5)
           |          / (CAST(df AS DOUBLE) + 0.5)))
           |        * (tf * CAST(2.2 AS DOUBLE)))
           |      / (tf + 1.2 * (0.25 + (0.75 * dl)
           |          / (CAST((SELECT sumdl FROM st) AS DOUBLE) / (SELECT n FROM st))))
           |    AS DECIMAL(18,6)) AS c
           |  FROM post JOIN dfs USING (term)
           |  WHERE post.doc_id IN (SELECT doc_id FROM ph))
           |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT $bm25K""".stripMargin
      },
      // t44: same decorated column, same unicode tokenization rule
      // (FtsIndex.duckdbTokens is the oracle twin of the build/search
      // tokenizer — one definition, two engines)
      "t44_fts_unicode" -> {
        val toks = graft.index.FtsIndex.duckdbTokens("txt", "unicode")
        val inList = t44Terms.map(w => s"'$w'").mkString(", ")
        s"""WITH d AS (SELECT doc_id,
           |    'Café, NAÏVE?! ' || text ||
           |      CASE WHEN doc_id % 3 = 0 THEN ' — naïve café!' ELSE '' END AS txt
           |  FROM documents),
           |tok AS (SELECT doc_id, len($toks) AS dl,
           |    unnest($toks) AS term FROM d),
           |post AS (SELECT term, doc_id, dl, COUNT(*) AS tf FROM tok
           |  WHERE term IN ($inList) GROUP BY 1, 2, 3),
           |dfs AS (SELECT term, COUNT(*) AS df FROM post GROUP BY term),
           |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(len($toks)) AS BIGINT) AS sumdl FROM d)
           |SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS score FROM (
           |  SELECT post.doc_id, CAST(
           |      (ln(1.0 + ((CAST((SELECT n FROM st) - df AS DOUBLE) + 0.5)
           |          / (CAST(df AS DOUBLE) + 0.5)))
           |        * (tf * CAST(2.2 AS DOUBLE)))
           |      / (tf + 1.2 * (0.25 + (0.75 * dl)
           |          / (CAST((SELECT sumdl FROM st) AS DOUBLE) / (SELECT n FROM st))))
           |    AS DECIMAL(18,6)) AS c
           |  FROM post JOIN dfs USING (term))
           |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT $bm25K""".stripMargin
      },
      // same planted contact strings, same patterns (RE2/Java-common
      // dialect), same replacement order; DuckDB needs the explicit 'g'
      // flag Spark applies by default
      "t41_pii_redact" ->
        s"""WITH d AS (SELECT source,
           |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@'
           |      || source || '.com'
           |      || CASE WHEN doc_id % 3 <> 0 THEN ' or 555-'
           |           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           |         ELSE '' END
           |      || CASE WHEN doc_id % 2 = 0 THEN ' from 10.'
           |           || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
           |         ELSE '' END AS txt
           |  FROM documents),
           |r AS (SELECT source, txt,
           |    regexp_replace(regexp_replace(regexp_replace(txt,
           |      '$emailPat', '<EMAIL>', 'g'),
           |      '$ipPat', '<IP>', 'g'),
           |      '$phonePat', '<PHONE>', 'g') AS red
           |  FROM d)
           |SELECT source, COUNT(*) AS n_docs,
           |  CAST(SUM(len(regexp_extract_all(txt, '$emailPat'))) AS BIGINT) AS n_emails,
           |  CAST(SUM(len(regexp_extract_all(txt, '$ipPat'))) AS BIGINT) AS n_ips,
           |  CAST(SUM(len(regexp_extract_all(txt, '$phonePat'))) AS BIGINT) AS n_phones,
           |  CAST(SUM(length(red)) AS BIGINT) AS sum_len_redacted
           |FROM r GROUP BY source ORDER BY source""".stripMargin,
      // same quality formula as t33 (one Scala definition feeds both Spark
      // sides; this SQL mirrors the t33 oracle), ranked prefix per language
      "p73_budget_mix" ->
        s"""WITH q AS (
           |  SELECT doc_id, lang, n_tokens,
           |    0.4 * uniq_ratio + 0.3 * least(1.0, CAST(n_tokens AS DOUBLE) / 50.0)
           |      + 0.3 * (1.0 - stopword_ratio) AS quality
           |  FROM (SELECT doc_id, lang,
           |    CAST(len($dWords) AS BIGINT) AS n_tokens,
           |    CAST(len(list_distinct($dWords)) AS DOUBLE) / len($dWords) AS uniq_ratio,
           |    CAST(len(list_filter($dWords, w -> w IN ('the', 'a'))) AS DOUBLE)
           |      / len($dWords) AS stopword_ratio
           |   FROM documents)),
           |r AS (SELECT *,
           |    SUM(n_tokens) OVER (PARTITION BY lang ORDER BY quality DESC, doc_id)
           |      - n_tokens AS start_off,
           |    CAST(CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.6
           |        WHEN 'de' THEN 0.4 WHEN 'fr' THEN 0.3 WHEN 'es' THEN 0.2
           |        ELSE 0.25 END AS DOUBLE)
           |      * SUM(n_tokens) OVER (PARTITION BY lang) AS budget
           |  FROM q)
           |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens,
           |  MIN(quality) AS min_quality
           |FROM r WHERE start_off < budget
           |GROUP BY lang ORDER BY lang""".stripMargin,
      // same multiplicative hash, pure integer arithmetic on both engines
      "p74_stratified_sample" ->
        """WITH d AS (SELECT lang, n_chars, doc_id,
          |    (doc_id * 2654435761) % 4294967296 AS h FROM documents),
          |r AS (SELECT *, row_number()
          |    OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn FROM d)
          |SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
          |  MAX(h) AS max_h
          |FROM r WHERE rn <= 50 GROUP BY lang ORDER BY lang""".stripMargin,
      "p75_hash_split" ->
        """WITH d AS (SELECT lang, n_chars,
          |    ((doc_id * 2654435761 + 1234567) % 4294967296) % 100 AS bucket
          |  FROM documents)
          |SELECT CASE WHEN bucket < 90 THEN 'train'
          |    WHEN bucket < 95 THEN 'valid' ELSE 'test' END AS split,
          |  lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
          |FROM d GROUP BY split, lang ORDER BY split, lang""".stripMargin,
      // per-language closed form (no cross-language double sum): both
      // engines compute floor(2^32 * 4/sqrt(n)) identically
      "p76_temperature_mix" ->
        """WITH d AS (SELECT lang, n_chars,
          |    (doc_id * 2654435761 + 777) % 4294967296 AS h FROM documents),
          |c AS (SELECT lang, COUNT(*) AS n_docs FROM d GROUP BY lang),
          |r AS (SELECT lang, n_docs,
          |    least(4294967296, CAST(floor(4294967296 * 4.0 /
          |      sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT)) AS thresh
          |  FROM c)
          |SELECT d.lang, MAX(r.n_docs) AS n_docs, COUNT(*) AS n_kept,
          |  CAST(SUM(d.n_chars) AS BIGINT) AS kept_chars
          |FROM d JOIN r ON d.lang = r.lang WHERE d.h < r.thresh
          |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
    )
  }
}
