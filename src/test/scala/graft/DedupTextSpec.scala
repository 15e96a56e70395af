package graft

import graft.operators.{Dedup, TextAnalysis}
import org.scalatest.funsuite.AnyFunSuite

class DedupTextSpec extends AnyFunSuite {
  import TestSpark._

  test("d50 semantic dedup keeps one per duplicate group, all isolated points") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(1f, 0f, 0f, 0f)),
      (3L, Array(1f, 0f, 0f, 0f)), // triple-duplicate group
      (4L, Array(0f, 1f, 0f, 0f)), (5L, Array(0f, 1f, 0f, 0f)), // pair
      (6L, Array(0f, 0f, 1f, 0f)), (7L, Array(0f, 0f, 0f, 1f))) // isolated
    val df = rows.toDF("vec_id", "embedding")
    val r = Dedup.semanticDedup(spark, df, "embedding", "vec_id", k = 2, theta = 0.9)
    val kept = r.filter(col("kept")).select("vec_id").as[Long].collect().toSet
    // lowest id survives each duplicate group; orthogonal points untouched
    assert(kept == Set(1L, 4L, 6L, 7L), s"kept $kept")
    val cl = r.select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(cl(1L) == cl(2L) && cl(2L) == cl(3L), "identical vectors must co-cluster")
    assert(cl(4L) == cl(5L))
  }

  test("d50 mega-cluster guard splits a collapsed corpus and keeps invariants") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // collapsed embedding space: 40 IDENTICAL vectors (k-means puts them
    // all in one cluster; SRP cannot split equal vectors either, so this
    // exercises BOTH guard rounds: SRP sub-buckets, then id-hash salting)
    // plus a handful of distinct points so k=2 has something to separate
    val rows = (1L to 40L).map(i => (i, Array(1f, 0f, 0f, 0f))) ++
      Seq((101L, Array(0f, 1f, 0f, 0f)), (102L, Array(0f, 0f, 1f, 0f)))
    val df = rows.toDF("vec_id", "embedding")
    val prev = spark.conf.getOption("spark.graft.dedup.maxClusterRows")
    spark.conf.set("spark.graft.dedup.maxClusterRows", "10")
    try {
      val r = Dedup.semanticDedup(spark, df, "embedding", "vec_id",
        k = 2, theta = 0.9).cache()
      try {
        // guard bound: no refined cluster exceeds the cap
        val maxSz = r.groupBy("cluster").count()
          .agg(org.apache.spark.sql.functions.max("count")).as[Long].head()
        assert(maxSz <= 10, s"largest refined cluster $maxSz > cap 10")
        // invariant 1: kept cluster-mates pairwise dissimilar — identical
        // vectors are sim=1, so each refined cluster keeps exactly one
        val dupKept = r.filter(col("vec_id") <= 40 && col("kept"))
        val perCluster = dupKept.groupBy("cluster").count()
          .as[(Long, Long)].collect()
        assert(perCluster.forall(_._2 == 1L),
          s"a refined cluster kept 2+ identical vectors: ${perCluster.mkString(",")}")
        // invariant 2: every drop justified by a smaller-id cluster-mate
        val cl = r.select("vec_id", "cluster").as[(Long, Long)].collect().toMap
        val dropped = r.filter(!col("kept")).select("vec_id").as[Long].collect()
        dropped.foreach { d =>
          assert(cl.exists { case (id, c) => id < d && c == cl(d) },
            s"drop $d has no smaller-id cluster-mate")
        }
        // isolated points survive untouched
        val kept = r.filter(col("kept")).select("vec_id").as[Long].collect().toSet
        assert(kept.contains(101L) && kept.contains(102L))
      } finally r.unpersist()
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.dedup.maxClusterRows", v)
        case None => spark.conf.unset("spark.graft.dedup.maxClusterRows")
      }
    }
  }

  test("d50 gate invariants hold on the real embeddings table") {
    val row = Dedup.d50SemanticDedup(spark, sf).collect().head
    assert(row.getAs[Long]("n_total") > 0)
    assert(row.getAs[Boolean]("drops_justified"))
    assert(row.getAs[Boolean]("kept_distinct"))
  }

  test("LSH candidate pairs achieve full recall vs brute-force jaccard") {
    val brute = Dedup.d42JaccardPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.d44LshPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "test data should contain planted near-dups")
    assert(lsh == brute,
      s"LSH missed ${brute -- lsh}, extra ${lsh -- brute}")
  }

  test("d51 incremental dedup drops exactly the new docs with cross-split dups") {
    val pairs = Dedup.d44LshPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val crossNew = pairs.collect {
      case (a, b) if (a % 5 == 0) != (b % 5 == 0) => if (a % 5 == 0) a else b
    }.toSet
    val rows = Dedup.d51IncrementalDedup(spark, sf).collect()
    val kept = rows.map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    // every new doc with an old near-dup is dropped; new-vs-new dups are
    // NOT d51's job (within-batch dedup is d44 over the batch)
    crossNew.foreach(id => assert(!kept(id),
      s"new doc $id has an old near-dup and must not be kept"))
    rows.filter(r => !r.getBoolean(3)).foreach { r =>
      assert(!r.isNullAt(1) && r.getLong(1) % 5 != 0,
        "every drop points at an OLD doc")
      assert(r.getDouble(2) >= 0.5, "every drop is jaccard-justified")
    }
  }

  test("d52 substring spans: planted shared runs yield exact span geometry") {
    import spark.implicits._
    // Globally-unique filler tokens guarantee no accidental window dup;
    // a 15-token shared run S yields 15-10+1 = 6 duplicated windows per
    // occurrence, merging into ONE span of max_span_tokens = 15. Docs 4/5
    // share TWO separate 10-token runs -> two spans of one window each.
    val S = (1 to 15).map(i => s"s$i")
    val s2 = (1 to 10).map(i => s"p$i")
    val s3 = (1 to 10).map(i => s"q$i")
    def mk(ts: Seq[String]) = ts.mkString(" ")
    val docs = Seq(
      (1L, mk((1 to 5).map(i => s"f$i") ++ S ++ (1 to 5).map(i => s"g$i"))),
      (2L, mk((1 to 8).map(i => s"h$i") ++ S ++ (1 to 2).map(i => s"k$i"))),
      (3L, mk((1 to 25).map(i => s"u$i"))), // fully unique -> absent
      (4L, mk(s2 ++ (1 to 5).map(i => s"w$i") ++ s3)),
      (5L, mk(s2 ++ (1 to 5).map(i => s"x$i") ++ s3)))
    val dir = java.nio.file.Files.createTempDirectory("d52spec").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val rows = Dedup.d52SubstringSpans(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(!rows.contains(3L), "unique doc must not appear")
    // (n_spans, dup_windows, max_span_tokens, first_pos)
    assert(rows(1L) == ((1L, 6L, 15L, 5L)), s"doc1 ${rows(1L)}")
    assert(rows(2L) == ((1L, 6L, 15L, 8L)), s"doc2 ${rows(2L)}")
    assert(rows(4L) == ((2L, 2L, 10L, 0L)), s"doc4 ${rows(4L)}")
    assert(rows(5L) == ((2L, 2L, 10L, 0L)), s"doc5 ${rows(5L)}")
  }

  test("minhash similarity approximates jaccard on planted dups") {
    val sigs = Dedup.d43MinhashSigs(spark, sf).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getLong).toVector).toMap
    val pairs = Dedup.d42JaccardPairs(spark, sf).collect()
    pairs.foreach { p =>
      val (a, b, j) = (p.getLong(0), p.getLong(1), p.getDouble(2))
      val est = sigs(a).zip(sigs(b)).count { case (x, y) => x == y } / 8.0
      // planted dups have j>=0.88; with 8 hashes estimate should be high
      assert(est >= 0.5, s"pair ($a,$b) j=$j est=$est")
    }
  }

  test("simhash hamming distance is small for near-dups, larger otherwise") {
    val sh = Dedup.d45Simhash(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dupPairs = Dedup.d42JaccardPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val dupHam = dupPairs.map { case (a, b) =>
      java.lang.Long.bitCount(sh(a) ^ sh(b))
    }
    assert(dupHam.forall(_ <= 8), s"near-dup hamming too large: ${dupHam.toList}")
    // the synthetic docs share one small vocabulary so simhash concentrates;
    // still, near-dups must be measurably closer than random pairs on average
    val ids = sh.keys.toVector.sorted
    val rndHam = (0 until 50).map { i =>
      java.lang.Long.bitCount(sh(ids(i)) ^ sh(ids(ids.size - 1 - i)))
    }
    val dupMean = dupHam.sum.toDouble / dupHam.length
    val rndMean = rndHam.sum.toDouble / rndHam.length
    assert(dupMean < rndMean,
      s"near-dup mean hamming $dupMean !< random mean $rndMean")
  }

  test("df-cap drops adversarial hot shingles but keeps planted near-dups") {
    import spark.implicits._
    // 40 identical boilerplate docs (every shingle df=40 > τ=32) plus one
    // planted near-dup pair built from unique words (every shingle df<=2).
    // Without the cap the boilerplate block alone yields C(40,2)=780
    // jaccard-1.0 pairs — the quadratic blowup the cap exists to stop.
    val boiler = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val uniqA = (0 until 20).map(i => s"uniq$i").mkString(" ")
    val uniqB = (0 until 20).map(i => if (i < 19) s"uniq$i" else "changed").mkString(" ")
    val docs = (0L until 40L).map(i => (i, boiler)) ++ Seq((100L, uniqA), (101L, uniqB))
    val dir = java.nio.file.Files.createTempDirectory("graft-dfcap").toString
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // default τ=32: boilerplate shingles are hot and dropped; only the
    // planted pair survives, with its jaccard untouched by the cap
    // (its shingles are all low-df, so the capped feature space — which
    // both the numerator AND denominator are computed over — equals the
    // full one and the jaccard is bit-identical to the uncapped run)
    val cappedDf = Dedup.d42JaccardPairs(spark, dir)
    // the hot-drop must stay codegen'd (array_except against a literal),
    // not a per-row Scala UDF — this is the 100 TB path the cap exists for
    assert(!cappedDf.queryExecution.executedPlan.toString.contains("ScalaUDF"),
      "hot-shingle drop fell back to a Scala UDF on a small hot set")
    val capped = cappedDf.collect()
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((100L, 101L)),
      s"capped d42: ${capped.toSeq}")
    val cappedJ = capped.head.getDouble(2)
    assert(cappedJ >= 0.5 && cappedJ < 1.0)

    val cappedLsh = pairs(Dedup.d44LshPairs(spark, dir))
    assert(!cappedLsh.exists(_._1 < 100L), s"hot bands leaked into d44: $cappedLsh")

    // cap disabled: the boilerplate block explodes into all 780 pairs —
    // and the planted pair's jaccard is identical to the capped run
    spark.conf.set("spark.graft.dedup.maxDocFreq", "0")
    try {
      val uncapped = Dedup.d42JaccardPairs(spark, dir).collect()
      assert(uncapped.length == 781, s"expected 780 boilerplate + 1 planted, got ${uncapped.length}")
      val uncappedJ = uncapped.find(r => r.getLong(0) == 100L).get.getDouble(2)
      assert(uncappedJ == cappedJ, "cap must not change surviving pairs' jaccard")
    } finally spark.conf.unset("spark.graft.dedup.maxDocFreq")
  }

  test("SRP near-dup pairs are sound: a subset of exact cosine pairs, exact sims") {
    val got = Dedup.d47SrpNearDup(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.nonEmpty, "SRP banding should surface some >=0.4 pairs")
    // brute-force reference: same left-to-right double accumulation the
    // engine's dot_product expression runs, so sims must match EXACTLY
    val vecs = Tables.t(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    got.foreach { case ((a, b), s) =>
      assert(a < b, s"pair order ($a,$b)")
      val expect = dot(vecs(a), vecs(b)) /
        (math.sqrt(dot(vecs(a), vecs(a))) * math.sqrt(dot(vecs(b), vecs(b))))
      assert(s >= 0.4 && s == expect, s"pair ($a,$b): got $s expected $expect")
    }
  }

  test("d48 groups equal brute-force connected components of the pair graph") {
    val pairs = Dedup.d44LshPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // driver-side union-find over the same pairs
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(n => n -> find(n)).toMap
    val got = Dedup.d48DedupGroups(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // cluster_id is the component min — the canonical keeper
    got.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid)
    }
  }

  test("exact dedup counts docs and unique texts") {
    val r = Dedup.d41Exact(spark, sf).collect().head
    assert(r.getLong(0) == 500L)
    assert(r.getLong(1) <= r.getLong(0))
  }

  test("fingerprint is order-sensitive") {
    import spark.implicits._
    // same bag of words, different order -> different fingerprint
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"))
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("documents_tmp")
    val fps = df.select(org.apache.spark.sql.functions.expr(
      """aggregate(transform(split(text, ' '),
        | w -> CAST(conv(substr(md5(w), 1, 8), 16, 10) AS BIGINT)),
        | CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin))
      .collect().map(_.getLong(0))
    assert(fps(0) != fps(1))
  }

  test("quality components are in [0,1] and score is bounded") {
    val rows = TextAnalysis.t33Quality(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val uniq = r.getAs[Double]("uniq_ratio")
      val stop = r.getAs[Double]("stopword_ratio")
      val q = r.getAs[Double]("quality")
      assert(uniq > 0 && uniq <= 1.0)
      assert(stop >= 0 && stop <= 1.0)
      assert(q > 0 && q <= 1.0)
    }
  }

  test("budget mix keeps a greedy quality prefix within one doc of budget") {
    import org.apache.spark.sql.functions._
    val weights = Map("en" -> 0.5, "zh" -> 0.6, "de" -> 0.4, "fr" -> 0.3, "es" -> 0.2)
    val totals = graft.Tables.t(spark, sf, "documents")
      .groupBy(col("lang"))
      .agg(sum(expr("CAST(size(split(text, ' ')) AS BIGINT)")).as("total"),
        max(expr("CAST(size(split(text, ' ')) AS BIGINT)")).as("max_doc"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = TextAnalysis.p73BudgetMix(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == weights.keySet) // every lang kept some
    rows.foreach { r =>
      val lang = r.getString(0)
      val kept = r.getAs[Long]("kept_tokens")
      val (total, maxDoc) = totals(lang)
      val budget = weights(lang) * total
      assert(kept >= budget, s"$lang under budget: $kept < $budget")
      assert(kept < budget + maxDoc, s"$lang overshot by a full doc: $kept vs $budget")
      assert(kept <= total)
    }
  }

  test("lang-id covers all docs and only emits known classes") {
    val rows = TextAnalysis.t32LangId(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == 500L)
    val preds = rows.map(_.getAs[String]("lang_pred")).toSet
    assert(preds.subsetOf(Set("en", "de", "fr", "es", "und")))
  }

  test("decontamination flags exactly the training docs sharing a 5-gram with eval") {
    // independent reference: recompute 5-gram overlap from the raw text
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams(s: String): Set[String] =
      s.split(' ').sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet
    val evalGrams = texts.filter(_._1 < 20).values.flatMap(grams).toSet
    val expected = texts.filter { case (id, txt) =>
      id >= 20 && grams(txt).exists(evalGrams.contains)
    }.map { case (id, txt) => id -> grams(txt).count(evalGrams.contains).toLong }
    val got = TextAnalysis.t37Decontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"missed ${expected.keySet -- got.keySet}, extra ${got.keySet -- expected.keySet}")
  }

  test("paragraph dedup keeps first corpus-wide chunk occurrence, shuffles only hashes") {
    import spark.implicits._
    // chunks are 8-token aligned: X repeats at index 0 of both docs, so
    // doc 20's copy is dropped; Y and Z are unique and survive.
    val x = (0 until 8).map(i => s"x$i").mkString(" ")
    val y = (0 until 8).map(i => s"y$i").mkString(" ")
    val z = (0 until 5).map(i => s"z$i").mkString(" ") // short tail chunk
    val dir = java.nio.file.Files.createTempDirectory("graft-pardedup").toString
    Seq((10L, s"$x $y"), (20L, s"$x $z")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val df = Dedup.d49ParagraphDedup(spark, dir)
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 10: both chunks kept; clean_len = len(x)+1+len(y)+1-1 = full text len
    // doc 20: X dropped, only Z kept -> clean_len = len(z)
    assert(rows.toSeq == Seq(
      (10L, 2L, 2L, (x.length + 1 + y.length).toLong),
      (20L, 2L, 1L, z.length.toLong)))
    // scale guard: the window's exchange partitions on the md5 hash, not
    // the paragraph text — the chunk string must not reach the shuffle
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(h#"), s"expected hash-keyed window:\n$plan")
  }

  test("pii redaction counts and scrubs planted contacts per source") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pii").toString
    (0L until 6L).map(i => (i, "plain words only", if (i < 3) "sa" else "sb"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.t41PiiRedact(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // every doc plants 1 email; phone unless doc_id%3==0; ip when doc_id%2==0
    // sa = ids 0,1,2: emails 3, ips 2 (0,2), phones 2 (1,2)
    // sb = ids 3,4,5: emails 3, ips 1 (4), phones 2 (4,5)
    assert(rows.toSeq == Seq(
      ("sa", 3L, 3L, 2L, 2L),
      ("sb", 3L, 3L, 1L, 2L)))
  }

  test("LM rarity is >= 1 (inverse probability) and covers every doc") {
    val rows = TextAnalysis.t38LmRarity(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val rar = r.getAs[Double]("rarity")
      assert(n > 0)
      // every token's inverse unigram probability N/cnt is >= 1, so the mean is
      assert(rar >= 1.0, s"doc ${r.getLong(0)} rarity $rar < 1")
    }
  }

  test("t47 chunking covers every token, overlaps by 8, tail may be short") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-chunk").toString
    // 70 tokens -> starts 0,24,48 (windows [0,32) [24,56) [48,70));
    // 10 tokens -> single short chunk; 33 tokens -> starts 0,24
    def doc(n: Int) = (0 until n).map(i => s"w$i").mkString(" ")
    Seq((1L, doc(70)), (2L, doc(10)), (3L, doc(33)))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.t47Chunking(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      (1L, 0L, 0L, 32L), (1L, 1L, 24L, 32L), (1L, 2L, 48L, 22L),
      (2L, 0L, 0L, 10L),
      (3L, 0L, 0L, 32L), (3L, 1L, 24L, 9L)))
    // coverage: consecutive chunks leave no gap (stride 24 < window 32)
    rows.groupBy(_._1).foreach { case (_, cs) =>
      cs.sortBy(_._2).toSeq.sliding(2).foreach {
        case Seq((_, _, s1, n1), (_, _, s2, _)) =>
          assert(s2 <= s1 + n1, s"gap between chunks at $s1+$n1 -> $s2")
        case _ => ()
      }
    }
    // fingerprints of identical windows are identical across docs: doc 1
    // and doc 3 share tokens w0..w31 at start 0
    val md5s = TextAnalysis.t47Chunking(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getString(4))).toMap
    assert(md5s((1L, 0L)) == md5s((3L, 0L)))
    assert(md5s((1L, 0L)) != md5s((1L, 1L)))
  }

  test("t48 bigram top-k is deterministic under count ties") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ngram").toString
    // "b b" appears 2x, "a a" 2x, others once; tie broken by bigram asc
    Seq((1L, "a a a", "en"), (2L, "b b b", "en"), (3L, "c d", "en"))
      .toDF("doc_id", "text", "lang").write.parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.t48NgramTopk(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      ("en", 1L, "a a", 2L), ("en", 2L, "b b", 2L), ("en", 3L, "c d", 1L)))
  }
}
