package graft

import graft.index.FtsIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Full-text index: build layout, BM25 ranking on a hand-checkable corpus,
  * pushed term filter (only probed posting lists leave storage), and
  * determinism of the rounded score across repartitionings.
  */
class FtsIndexSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // Tiny corpus with known statistics: "rare" appears once in doc 1;
  // "common" in every doc; doc 3 is long (length normalization must
  // push its score below short doc 1's for query "rare common").
  private val corpus = Seq(
    (1L, "rare common alpha"),
    (2L, "common beta beta gamma"),
    (3L, "common " + Seq.fill(40)("filler").mkString(" ")),
    (4L, "alpha beta common gamma delta"))

  private lazy val datasetPath = {
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"), "fts-test-")
      .toAbsolutePath.toString
    s"$dir/docs"
  }

  private lazy val meta = {
    val df = corpus.toDF("doc_id", "text")
    FtsIndex.build(spark, df, "text", "doc_id", datasetPath, numTermPartitions = 4)
  }

  test("build records corpus stats and writes hash-partitioned postings") {
    assert(meta.numDocs == 4)
    val expectedSumDl = corpus.map(_._2.split(" ").length.toLong).sum
    assert(meta.sumDl == expectedSumDl)
    val loaded = FtsIndex.loadMeta(spark, datasetPath, "text")
    assert(loaded == meta)
    val postings = spark.read.parquet(
      s"${FtsIndex.indexPath(datasetPath, "text")}/postings")
    // one row per (term, doc); tf aggregated — "beta" in doc 2 has tf=2
    val beta2 = postings.filter($"term" === "beta" && $"doc" === 2L)
      .select($"tf", $"dl").collect()
    assert(beta2.toSeq.map(r => (r.getLong(0), r.getLong(1))) == Seq((2L, 4L)))
  }

  test("phrase disjunction: any clause matches, shared docs sum clauses") {
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"), "fts-ph-")
      .toAbsolutePath.toString + "/docs"
    val corpus2 = Seq(
      (1L, "zzg marker zzpad"),
      (2L, "zzalpha zzbeta zzpad"),
      (3L, "zzg marker zzalpha zzbeta"),
      (4L, "marker zzg zzpad"), // clause A reversed — no match
      (5L, "zzalpha zzpad zzbeta")) // clause B gapped — no match at slop 0
    FtsIndex.build(spark, corpus2.toDF("doc_id", "text"), "text", "doc_id",
      dir, numTermPartitions = 4, storePositions = true)
    val r = FtsIndex.searchPhrases(spark, dir, "text",
      Seq("zzg marker", "zzalpha zzbeta"), 10)
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
    assert(r.map(_._1).toSet == Set(1L, 2L, 3L), r.toSeq.toString)
    // the both-clauses doc outranks every single-clause doc
    assert(r.head._1 == 3L, s"doc 3 matches both clauses: ${r.toSeq}")
    val byId = r.toMap
    assert(byId(3L) > byId(1L) && byId(3L) > byId(2L))
    // slop admits the gapped clause-B doc
    val sloppy = FtsIndex.searchPhrases(spark, dir, "text",
      Seq("zzg marker", "zzalpha zzbeta"), 10, slop = 1)
      .collect().map(_.getLong(0)).toSet
    assert(sloppy == Set(1L, 2L, 3L, 5L), sloppy.toString)
    // the matchMode surface ('|'-separated) reaches the same results
    val viaMode = FtsIndex.search(spark, dir, "text",
      "zzg marker | zzalpha zzbeta", 10, matchMode = "phrases")
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
    assert(viaMode.toSeq == r.toSeq)
    assert(FtsIndex.search(spark, dir, "text",
      "zzg marker | zzalpha zzbeta", 10, matchMode = "phrases~1")
      .collect().map(_.getLong(0)).toSet == sloppy)
  }

  test("prefix query expands via the sorted postings; boundary is exact") {
    assert(meta.numDocs == 4)
    // "bet*" expands to {beta}; "ga*" to {gamma}; no term starts "gam m"
    val hits = FtsIndex.search(spark, datasetPath, "text", "bet*", 4)
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(2L, 4L), s"bet* must match docs holding 'beta': $hits")
    // the boundary is exact: "betax*" matches nothing
    assert(FtsIndex.search(spark, datasetPath, "text", "betax*", 4)
      .collect().isEmpty)
    // prefix counts as ONE clause under `all`: alpha AND ga* = docs
    // holding alpha and any gamma-prefixed term
    val allMode = FtsIndex.search(spark, datasetPath, "text", "alpha ga*", 4,
      matchMode = "all").collect().map(_.getLong(0)).toSet
    assert(allMode == Set(4L), s"all-mode prefix conjunction: $allMode")
    // a doc matching TWO expansions of one prefix is still one clause
    val one = FtsIndex.search(spark, datasetPath, "text", "common b*", 4,
      matchMode = "all").collect().map(_.getLong(0)).toSet
    assert(one == Set(2L, 4L), s"b* expands to beta (docs 2,4): $one")
    // NOT-prefix excludes: common docs minus any beta-prefixed holder
    val excl = FtsIndex.search(spark, datasetPath, "text", "common -bet*", 4)
      .collect().map(_.getLong(0)).toSet
    assert(excl == Set(1L, 3L), s"-bet* must exclude docs 2 and 4: $excl")
    // expansion cap fails loud (Lucene TooManyClauses posture)
    spark.conf.set("spark.graft.fts.maxPrefixTerms", "0")
    try {
      val e = intercept[IllegalArgumentException](
        FtsIndex.search(spark, datasetPath, "text", "g*", 4).collect())
      assert(e.getMessage.contains("maxPrefixTerms"), e.getMessage)
    } finally spark.conf.unset("spark.graft.fts.maxPrefixTerms")
    // phrase mode refuses prefixes
    intercept[IllegalArgumentException](
      FtsIndex.search(spark, datasetPath, "text", "bet* common", 4,
        matchMode = "phrase"))
  }

  test("fuzzy query expands by edit distance; boundary and df both exact") {
    assert(meta.numDocs == 4)
    // distance boundary: levenshtein(beta, delta) == 2 — inside ~2, not ~1
    val d1 = FtsIndex.search(spark, datasetPath, "text", "beta~1", 4)
      .collect().map(_.getLong(0)).toSet
    assert(d1 == Set(2L, 4L), s"beta~1 must match only beta holders: $d1")
    val d2 = FtsIndex.search(spark, datasetPath, "text", "beta~2", 4)
      .collect().map(_.getLong(0)).toSet
    assert(d2 == Set(2L, 4L), s"beta~2 adds delta - still docs 2,4: $d2")
    // ...and the delta expansion genuinely scores: doc 4 (beta AND delta)
    // must outrank doc 2 (beta only, same tf... no — beta tf=2 in doc 2).
    // Assert instead via a term only delta matches: 'delta~1'
    val dd = FtsIndex.search(spark, datasetPath, "text", "delta~1", 4)
      .collect().map(_.getLong(0)).toSet
    assert(dd == Set(4L), s"delta~1 matches doc 4 only: $dd")
    // fuzzy counts as ONE clause under `all`
    val allMode = FtsIndex.search(spark, datasetPath, "text", "common beta~1", 4,
      matchMode = "all").collect().map(_.getLong(0)).toSet
    assert(allMode == Set(2L, 4L), s"all-mode fuzzy conjunction: $allMode")
    // overlapping exact + fuzzy clauses: each contributes (BooleanQuery),
    // but df stays the TRUE per-term count — the doubled query scores
    // exactly twice the single-clause query
    val one = FtsIndex.search(spark, datasetPath, "text", "beta", 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val two = FtsIndex.search(spark, datasetPath, "text", "beta beta~1", 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(one.keySet == two.keySet)
    one.foreach { case (doc, s) =>
      assert(math.abs(two(doc) - 2.0 * s) < 1e-9,
        s"doc $doc: ${two(doc)} != 2 * $s (df inflated by clause overlap?)")
    }
    // expansion cap fails loud
    spark.conf.set("spark.graft.fts.maxFuzzyTerms", "0")
    try {
      val e = intercept[IllegalArgumentException](
        FtsIndex.search(spark, datasetPath, "text", "beta~2", 4).collect())
      assert(e.getMessage.contains("maxFuzzyTerms"), e.getMessage)
    } finally spark.conf.unset("spark.graft.fts.maxFuzzyTerms")
    // negated fuzzy refuses; phrase mode refuses fuzzy
    intercept[IllegalArgumentException](
      FtsIndex.search(spark, datasetPath, "text", "common -beta~1", 4))
    intercept[IllegalArgumentException](
      FtsIndex.search(spark, datasetPath, "text", "beta~1 common", 4,
        matchMode = "phrase"))
  }

  test("bm25 ranks rare-term hit first and length-penalizes long docs") {
    assert(meta.numDocs == 4)
    val top = FtsIndex.search(spark, datasetPath, "text", "rare common", 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // doc 1 holds the only "rare" posting -> far ahead of common-only docs
    assert(top.head._1 == 1L)
    assert(top.head._2 > top(1)._2 * 2)
    // all four docs contain "common", so all four surface
    assert(top.map(_._1).toSet == Set(1L, 2L, 3L, 4L))
    // doc 3 (41 tokens of filler) is length-normalized below the short
    // common-only docs
    assert(top.last._1 == 3L)
    // scores strictly ordered (desc) with doc-id tie-break
    assert(top.map(_._2).toSeq == top.map(_._2).sorted(Ordering[Double].reverse).toSeq)
  }

  test("query terms reach the postings scan as a pushed In filter") {
    assert(meta.numDocs == 4)
    val plan = FtsIndex.search(spark, datasetPath, "text", "rare common", 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(term"),
      s"expected pushed term filter in plan:\n$plan")
  }

  test("absent terms score nothing; unknown-only query returns empty") {
    assert(meta.numDocs == 4)
    assert(FtsIndex.search(spark, datasetPath, "text", "zzz qqq", 3).count() == 0)
    // mixed query: unknown term contributes nothing, known term still hits
    val hits = FtsIndex.search(spark, datasetPath, "text", "zzz rare", 3)
      .collect().map(_.getLong(0)).toSeq
    assert(hits == Seq(1L))
  }

  test("rounded score is stable across input partitionings") {
    assert(meta.numDocs == 4)
    val a = FtsIndex.search(spark, datasetPath, "text", "common beta alpha", 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // rebuild the same index from a differently-partitioned frame
    val dir2 = Files.createTempDirectory(java.nio.file.Paths.get("target"), "fts-test2-")
      .toAbsolutePath.toString
    val ds2 = s"$dir2/docs"
    FtsIndex.build(spark, corpus.toDF("doc_id", "text").repartition(7),
      "text", "doc_id", ds2, numTermPartitions = 2)
    val b = FtsIndex.search(spark, ds2, "text", "common beta alpha", 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b)
  }

  test("lance_fts TVF serves the same result through SQL") {
    assert(meta.numDocs == 4)
    MetaTvfs.register(spark)
    val api = FtsIndex.search(spark, datasetPath, "text", "rare common", 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val sql = spark.sql(
      s"SELECT * FROM lance_fts('$datasetPath', 'text', 'rare common', 2)")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(sql == api)
  }

  test("multi-field search: per-field BM25, boost-weighted, shared id required") {
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"), "fts-mf-")
      .toAbsolutePath.toString + "/docs"
    val docs = Seq(
      (1L, "zzq common pad", "other words here"),
      (2L, "common pad pad", "zzq headline"),
      (3L, "common filler filler filler", "nothing at all"))
    docs.toDF("doc_id", "body", "title")
      .write.format("lance").mode("overwrite").save(dir)
    val df = spark.read.format("lance").load(dir)
    FtsIndex.build(spark, df, "body", "doc_id", dir, numTermPartitions = 2)
    FtsIndex.build(spark, df, "title", "doc_id", dir, numTermPartitions = 2)
    val bodyOnly = FtsIndex.search(spark, dir, "body", "zzq", 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val titleOnly = FtsIndex.search(spark, dir, "title", "zzq", 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val multi = FtsIndex.searchFields(spark, dir,
      Seq(("title", 2.0), ("body", 1.0)), "zzq", 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val m = multi.toMap
    // doc 2 scores only from title (boosted 2x); doc 1 only from body
    assert(math.abs(m(2L) - 2.0 * titleOnly(2L)) < 1e-6, s"$m vs $titleOnly")
    assert(math.abs(m(1L) - bodyOnly(1L)) < 1e-6, s"$m vs $bodyOnly")
    assert(!m.contains(3L))
    // ranking by the combined score, boosted title first here
    assert(multi.map(_._1).toSeq == multi.sortBy(-_._2).map(_._1).toSeq)
    // SQL twin: the boost syntax routes through the same path
    MetaTvfs.register(spark)
    val sql = spark.sql(
      s"SELECT * FROM lance_fts('$dir', 'title^2.0,body', 'zzq', 3)")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(sql == multi.toSeq)
    // duplicate fields refuse
    intercept[IllegalArgumentException](
      FtsIndex.searchFields(spark, dir, Seq(("body", 1.0), ("body", 2.0)),
        "zzq", 3))
  }

  test("pre-filter narrows candidates without re-weighing corpus stats") {
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"),
      "fts-filter-").toAbsolutePath.toString
    val ds = s"$dir/docs"
    Seq(
      (1L, "rare common alpha", "en"),
      (2L, "common beta beta gamma", "de"),
      (3L, "rare common beta", "de"),
      (4L, "alpha beta common gamma delta", "en"))
      .toDF("doc_id", "text", "lang")
      .write.format("lance").mode("overwrite").save(ds)
    FtsIndex.build(spark, spark.read.format("lance").load(ds),
      "text", "doc_id", ds, numTermPartitions = 4)
    val unfiltered = FtsIndex.search(spark, ds, "text", "rare common", 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val filtered = FtsIndex.search(spark, ds, "text", "rare common", 10,
      filter = Some("lang = 'de'")).collect()
    assert(filtered.map(_.getLong(0)).toSet == Set(2L, 3L))
    // scores identical to the unfiltered run: the filter must not change
    // df/avgdl, only drop ineligible candidates
    filtered.foreach(r => assert(r.getDouble(1) == unfiltered(r.getLong(0))))
    // TVF form agrees
    MetaTvfs.register(spark)
    val sql = spark.sql(s"SELECT * FROM lance_fts('$ds', 'text', " +
      "'rare common', 10, 'lang = ''de''')")
      .collect().map(_.getLong(0)).toSet
    assert(sql == Set(2L, 3L))
  }

  test("meta cache serves repeated loads; rebuild evicts") {
    assert(meta.numDocs == 4) // force build
    val m1 = FtsIndex.loadMeta(spark, datasetPath, "text")
    val m2 = FtsIndex.loadMeta(spark, datasetPath, "text")
    assert(m1 eq m2, "second load must hit the session cache")
    FtsIndex.build(spark, corpus.toDF("doc_id", "text"), "text", "doc_id",
      datasetPath, numTermPartitions = 4)
    val m3 = FtsIndex.loadMeta(spark, datasetPath, "text")
    assert(m3.copy(buildId = None) == m1.copy(buildId = None),
      "identical rebuild keeps identical stats")
    assert(m3.buildId != m1.buildId,
      "every build gets a fresh buildId (content-distinguishes rebuilds)")
    assert(!(m3 eq m1), "rebuild must evict the cached instance")
  }

  test("probed buckets prune to partition directories in the scan") {
    assert(meta.numDocs == 4)
    val plan = FtsIndex.search(spark, datasetPath, "text", "rare", 4)
      .queryExecution.executedPlan.toString
    // v2 layout: the terms' bucket ids land in PartitionFilters, so
    // non-probed bucket DIRECTORIES are never listed or read
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"expected bucket partition pruning in plan:\n$plan")
  }

  test("refresh after append matches a from-scratch rebuild") {
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"),
      "fts-refresh-").toAbsolutePath.toString
    val ds = s"$dir/docs"
    val first = corpus.take(2).toDF("doc_id", "text")
    val rest = corpus.drop(2).toDF("doc_id", "text")
    first.write.format("lance").mode("overwrite").save(ds)
    val m0 = FtsIndex.build(spark, spark.read.format("lance").load(ds),
      "text", "doc_id", ds, numTermPartitions = 4)
    assert(m0.numDocs == 2)
    rest.write.format("lance").mode("append").save(ds)
    val m1 = FtsIndex.refresh(spark, ds, "text")
    assert(m1.numDocs == 4 && m1.sumDl == meta.sumDl)
    assert(m1.datasetVersion.get > m0.datasetVersion.get)
    // refreshed search == the from-scratch index over the same corpus
    val viaRefresh = FtsIndex.search(spark, ds, "text", "rare common beta", 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaBuild = FtsIndex.search(spark, datasetPath, "text", "rare common beta", 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaRefresh == viaBuild)
    // idempotent no-op when already current
    val m2 = FtsIndex.refresh(spark, ds, "text")
    assert(m2.copy(buildId = None) == m1.copy(buildId = None))
  }

  test("refresh falls back to a rebuild when history has non-append commits") {
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"),
      "fts-refresh-dml-").toAbsolutePath.toString
    val ds = s"$dir/docs"
    corpus.toDF("doc_id", "text")
      .write.format("lance").mode("overwrite").save(ds)
    FtsIndex.build(spark, spark.read.format("lance").load(ds),
      "text", "doc_id", ds, numTermPartitions = 4)
    // row-level delete: removes doc 2's fragment rows — not an append
    graft.operators.Dml.deleteWhere(spark, ds, "doc_id = 2")
    val m = FtsIndex.refresh(spark, ds, "text")
    assert(m.numDocs == 3, s"rebuild must reindex the surviving docs, got $m")
    val hits = FtsIndex.search(spark, ds, "text", "beta", 4)
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(4L), s"deleted doc 2 must not surface, got $hits")
  }

  test("matchMode=all keeps only docs containing every term, scores unchanged") {
    assert(meta.numDocs == 4)
    val any = FtsIndex.search(spark, datasetPath, "text", "common alpha", 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val all = FtsIndex.search(spark, datasetPath, "text", "common alpha", 10,
      matchMode = "all").collect().map(r => (r.getLong(0), r.getDouble(1)))
    // only docs 1 and 4 contain BOTH terms
    assert(all.map(_._1).toSet == Set(1L, 4L), s"got ${all.toSeq}")
    // conjunction narrows candidates; it must not re-weigh scores
    all.foreach { case (id, s) => assert(s == any(id)) }
    // AND of a term with an absent term is empty
    assert(FtsIndex.search(spark, datasetPath, "text", "common zzz", 10,
      matchMode = "all").count() == 0)
  }

  test("phrase search: consecutive in-order only, decoys excluded, dup terms work") {
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"),
      "fts-phrase-").toAbsolutePath.toString
    val ds = s"$dir/docs"
    val docs = Seq(
      (1L, "alpha beta gamma delta"),   // phrase "beta gamma" present
      (2L, "gamma beta alpha"),          // terms present, wrong order
      (3L, "beta delta gamma"),          // terms present, not adjacent
      (4L, "echo beta gamma beta gamma"),// phrase twice + dup terms
      (5L, "beta beta gamma"))           // dup-term prefix
    FtsIndex.build(spark, docs.toDF("doc_id", "text"), "text", "doc_id",
      ds, numTermPartitions = 4, storePositions = true)
    val hits = FtsIndex.search(spark, ds, "text", "beta gamma", 10,
      matchMode = "phrase").collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L, 4L, 5L), s"got $hits")
    // phrase with a REPEATED token: "beta beta gamma" matches only doc 5
    val dup = FtsIndex.search(spark, ds, "text", "beta beta gamma", 10,
      matchMode = "phrase").collect().map(_.getLong(0)).toSet
    assert(dup == Set(5L), s"got $dup")
    // phrase ranking scores come from the same BM25 terms as all-match
    val all = FtsIndex.search(spark, ds, "text", "beta gamma", 10,
      matchMode = "all").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    FtsIndex.search(spark, ds, "text", "beta gamma", 10, matchMode = "phrase")
      .collect().foreach(r => assert(r.getDouble(1) == all(r.getLong(0))))
    // a non-positional index refuses phrase queries loudly
    val e = intercept[IllegalArgumentException] {
      FtsIndex.search(spark, datasetPath, "text", "rare common", 3,
        matchMode = "phrase")
    }
    assert(e.getMessage.contains("positional"))
  }

  test("'-term' NOT clauses exclude docs without re-weighing corpus stats") {
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"),
      "fts-not-").toAbsolutePath.toString
    val ds = s"$dir/docs"
    val docs = Seq(
      (1L, "alpha beta"),
      (2L, "alpha beta noise"),
      (3L, "alpha other"),
      (4L, "noise only"))
    FtsIndex.build(spark, docs.toDF("doc_id", "text"), "text", "doc_id",
      ds, numTermPartitions = 4)
    val hits = FtsIndex.search(spark, ds, "text", "alpha -noise", 10)
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L, 3L), s"got $hits")
    // scores equal the un-excluded query's scores for surviving docs:
    // exclusion narrows candidates, never re-weighs (df/avgdl index-wide)
    val base = FtsIndex.search(spark, ds, "text", "alpha", 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    FtsIndex.search(spark, ds, "text", "alpha -noise", 10)
      .collect().foreach(r => assert(r.getDouble(1) == base(r.getLong(0))))
    // exclusion composes with matchMode=all
    val allHits = FtsIndex.search(spark, ds, "text", "alpha beta -noise", 10,
      matchMode = "all").collect().map(_.getLong(0)).toSet
    assert(allHits == Set(1L), s"got $allHits")
    // a query of ONLY exclusions is refused loudly
    val e = intercept[IllegalArgumentException](
      FtsIndex.search(spark, ds, "text", "-noise", 10))
    assert(e.getMessage.contains("no positive terms"))
  }

  test("phrase~N slop: in-order within-window; N vs N+1 boundary exact") {
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"),
      "fts-slop-").toAbsolutePath.toString
    val ds = s"$dir/docs"
    val docs = Seq(
      (1L, "beta gamma tail"),            // exact: slop 0+
      (2L, "beta pad gamma tail"),        // 1 filler: slop 1+
      (3L, "beta pad pad gamma tail"),    // 2 fillers: slop 2+
      (4L, "gamma pad beta tail"),        // wrong order: never
      (5L, "x beta y gamma beta gamma"))  // exact later in doc: slop 0+
    FtsIndex.build(spark, docs.toDF("doc_id", "text"), "text", "doc_id",
      ds, numTermPartitions = 4, storePositions = true)
    def hits(mode: String): Set[Long] =
      FtsIndex.search(spark, ds, "text", "beta gamma", 10, matchMode = mode)
        .collect().map(_.getLong(0)).toSet
    assert(hits("phrase") == Set(1L, 5L))
    assert(hits("phrase~0") == Set(1L, 5L), "phrase~0 == exact phrase")
    assert(hits("phrase~1") == Set(1L, 2L, 5L))
    assert(hits("phrase~2") == Set(1L, 2L, 3L, 5L))
    // three-term chain: budget is TOTAL span, not per-gap
    val docs3 = Seq(
      (1L, "a b c"),
      (2L, "a pad b c"),        // span 3 = 2+1
      (3L, "a b pad c"),        // span 3 = 2+1
      (4L, "a pad b pad c"))    // span 4 = 2+2
    val ds3 = s"$dir/docs3"
    FtsIndex.build(spark, docs3.toDF("doc_id", "text"), "text", "doc_id",
      ds3, numTermPartitions = 4, storePositions = true)
    def hits3(mode: String): Set[Long] =
      FtsIndex.search(spark, ds3, "text", "a b c", 10, matchMode = mode)
        .collect().map(_.getLong(0)).toSet
    assert(hits3("phrase~1") == Set(1L, 2L, 3L))
    assert(hits3("phrase~2") == Set(1L, 2L, 3L, 4L))
    // slop composes with '-term' exclusion
    val both = FtsIndex.search(spark, ds, "text", "beta gamma -tail", 10,
      matchMode = "phrase~1").collect().map(_.getLong(0)).toSet
    assert(both == Set(5L), s"got $both")
  }

  test("refresh preserves positional postings (phrase works after append)") {
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"),
      "fts-phrase-refresh-").toAbsolutePath.toString
    val ds = s"$dir/docs"
    Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
      .write.format("lance").mode("overwrite").save(ds)
    FtsIndex.build(spark, spark.read.format("lance").load(ds),
      "text", "doc_id", ds, numTermPartitions = 4, storePositions = true)
    Seq((2L, "beta gamma tail"), (3L, "gamma beta tail"))
      .toDF("doc_id", "text")
      .write.format("lance").mode("append").save(ds)
    val m = FtsIndex.refresh(spark, ds, "text")
    assert(m.positions.contains(true) && m.numDocs == 3)
    val hits = FtsIndex.search(spark, ds, "text", "beta gamma", 10,
      matchMode = "phrase").collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L, 2L), s"appended phrase doc must match, got $hits")
  }

  test("unicode tokenizer: punctuation, case, accents agree across build and query") {
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"),
      "fts-uni-").toAbsolutePath.toString
    val ds = s"$dir/docs"
    val docs = Seq(
      (1L, "Café! naïve, CAFÉ — test"),
      (2L, "plain words only"),
      (3L, "NAÏVE?café"))
    FtsIndex.build(spark, docs.toDF("doc_id", "text"), "text", "doc_id",
      ds, numTermPartitions = 4, tokenizer = "unicode")
    val m = FtsIndex.loadMeta(spark, ds, "text")
    assert(m.tokenizer.contains("unicode"))
    // dl counts TOKENS after splitting on punctuation: doc 1 has 4
    assert(m.sumDl == 4L + 3L + 2L, s"sumDl ${m.sumDl}")
    // query in mixed case + punctuation finds both café docs; tf of
    // doc 1 (café twice) ranks it first
    val hits = FtsIndex.search(spark, ds, "text", "CAFÉ!", 3)
      .collect().map(_.getLong(0)).toSeq
    assert(hits == Seq(1L, 3L), s"hits $hits")
  }
}
