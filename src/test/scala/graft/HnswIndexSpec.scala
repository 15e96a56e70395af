package graft

import graft.index.{HnswIndex, IvfIndex}
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import scala.jdk.CollectionConverters._

class HnswIndexSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val datasetPath = {
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"), "hnsw-test-")
      .toAbsolutePath.toString
    val ds = s"$dir/emb"
    Tables.t(spark, sf, "embeddings").write.format("lance").mode("append").save(ds)
    ds
  }

  private lazy val built = {
    val df = spark.read.format("lance").load(datasetPath)
    val ivf = IvfIndex.build(spark, df, "embedding", "vec_id", datasetPath, numPartitions = 4)
    assert(ivf.success, ivf.error)
    HnswIndex.build(spark, datasetPath, "embedding")
  }

  private def queryVec(qid: Long): Array[Float] =
    Tables.t(spark, sf, "embeddings").filter($"vec_id" === qid)
      .select($"embedding").collect().head.getSeq[Float](0).toArray

  test("graph build succeeds and covers every vector") {
    assert(built.success, built.error)
    val g = spark.read.parquet(HnswIndex.graphPath(datasetPath, "embedding"))
    assert(g.count() == 500)
    assert(g.select("id").distinct().count() == 500)
    // levels follow the capped geometric distribution: level 0 dominates
    val l0 = g.filter($"level" === 0).count()
    assert(l0 > 400, s"expected most nodes at level 0, got $l0")
  }

  test("level assignment is deterministic and capped") {
    (0L until 1000L).foreach { id =>
      val l = HnswIndex.levelOf(id, 16, 7)
      assert(l >= 0 && l <= 7)
      assert(l == HnswIndex.levelOf(id, 16, 7))
    }
  }

  test("full-probe HNSW search recalls >= 90% of exact top-10") {
    assert(built.success)
    val q = queryVec(0L)
    val exact = Similarity.knnSearch(
      Tables.t(spark, sf, "embeddings").filter($"vec_id" =!= 0L),
      "embedding", q, 10).select("vec_id").collect().map(_.getLong(0)).toSet
    val ann = HnswIndex.search(spark, datasetPath, "embedding", q, 11,
      nprobes = 4, ef = 200)
      .filter($"vec_id" =!= 0L).limit(10)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall, exact=$exact ann=$ann")
  }

  test("search is deterministic across runs") {
    assert(built.success)
    val q = queryVec(3L)
    val r1 = HnswIndex.search(spark, datasetPath, "embedding", q, 5, nprobes = 2, ef = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val r2 = HnswIndex.search(spark, datasetPath, "embedding", q, 5, nprobes = 2, ef = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(r1 == r2)
    assert(r1.size == 5)
  }

  test("dot-metric HNSW: full-probe MIPS walk recalls >= 90% of exact dot top-10") {
    // the only CI exercise of the graph walk's dot branch (greedy NSW
    // descent on -<a,b> — the standard max-inner-product search shape)
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"), "hnswdot-")
      .toAbsolutePath.toString
    val ds = s"$dir/emb"
    val df = Tables.t(spark, sf, "embeddings")
    df.write.format("lance").mode("append").save(ds)
    val ivf = IvfIndex.build(spark, df, "embedding", "vec_id", ds,
      numPartitions = 4, metric = "dot")
    assert(ivf.success, ivf.error)
    assert(HnswIndex.build(spark, ds, "embedding").success)
    val q = queryVec(0L)
    val exact = Similarity.knnSearch(df, "embedding", q, 10, "dot")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ann = HnswIndex.search(spark, ds, "embedding", q, 10,
      nprobes = 4, ef = 200, metric = Some("dot"))
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.9, s"dot recall $recall, exact=$exact ann=$ann")
    // reported _distance is -dot, ascending (largest inner product first)
    val dists = HnswIndex.search(spark, ds, "embedding", q, 5,
      nprobes = 4, ef = 200, metric = Some("dot"))
      .collect().map(_.getDouble(1))
    assert(dists.sameElements(dists.sorted))
  }

  test("IVF_HNSW_PQ: ADC-scored walk with exact refine recalls >= 80%") {
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"), "hnswpq-")
      .toAbsolutePath.toString
    val ds = s"$dir/emb"
    val df = Tables.t(spark, sf, "embeddings")
    df.write.format("lance").mode("append").save(ds)
    val ivf = IvfIndex.build(spark, df, "embedding", "vec_id", ds,
      numPartitions = 4, pq = Some(IvfIndex.PqParams(numSubVectors = 16, numBits = 4)))
    assert(ivf.success, ivf.error)
    assert(HnswIndex.build(spark, ds, "embedding").success)
    val q = queryVec(0L)
    val exact = Similarity.knnSearch(df.filter($"vec_id" =!= 0L),
      "embedding", q, 10).select("vec_id").collect().map(_.getLong(0)).toSet
    val ann = HnswIndex.searchPq(spark, ds, "embedding", q, 11, nprobes = 4, ef = 200)
      .filter($"vec_id" =!= 0L).limit(10)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall, exact=$exact ann=$ann")
    // returned distances are exact (post-refine)
    val top = HnswIndex.searchPq(spark, ds, "embedding", q, 1, nprobes = 4, ef = 200)
      .collect().head
    assert(top.getLong(0) == 0L && top.getDouble(1) < 1e-9) // itself
  }

  test("filtered graph search: exact over the filtered subset, widens on shortfall") {
    assert(built.success)
    val q = queryVec(0L)
    // moderately selective filter (~10% of rows): beam result must equal
    // the exact KNN over the filtered subset at full probe
    val got = HnswIndex.search(spark, datasetPath, "embedding", q, 10,
        nprobes = 4, ef = 200, filter = Some($"label" === 3))
      .collect().map(_.getLong(0)).toSeq
    val exact = Similarity.knnSearch(
      Tables.t(spark, sf, "embeddings").filter($"label" === 3),
      "embedding", q, 10, "l2").select($"vec_id").collect().map(_.getLong(0)).toSeq
    assert(got == exact, s"got=$got exact=$exact")

    // matches scattered OUTSIDE the nearest bucket: after the beam covers
    // the probed bucket, the PROBE SET widens (1 -> all) and finds every
    // match — the same escalation as filtered IVF search
    val probeWidened = HnswIndex.search(spark, datasetPath, "embedding", q, 10,
        nprobes = 1, ef = 200, filter = Some($"vec_id" >= 490))
      .collect().map(_.getLong(0)).toSet
    assert(probeWidened == (490L until 500L).toSet, probeWidened.toString)

    // a starving filter (fewer than k matches in the whole index): the
    // widening loop must surface every reachable match, never a silent
    // short set of the wrong rows, and never loop forever
    val short = HnswIndex.search(spark, datasetPath, "embedding", q, 10,
        nprobes = 4, ef = 4, filter = Some($"vec_id" >= 495))
      .collect().map(_.getLong(0)).toSet
    assert(short == (495L until 500L).toSet, short.toString)

    // a tiny initial beam on a selective filter must WIDEN until k rows
    // match — never return the few nodes the first beam happened to
    // reach. (The widened beam is still a beam: assert k pre-filtered
    // results with high overlap, not bit-equality — that is the ef=200
    // assertion above.)
    val widened = HnswIndex.search(spark, datasetPath, "embedding", q, 10,
        nprobes = 4, ef = 2, filter = Some($"label" === 3))
      .collect().map(_.getLong(0)).toSeq
    assert(widened.length == 10, s"widening must reach k rows, got $widened")
    val label3 = Tables.t(spark, sf, "embeddings").filter($"label" === 3)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(widened.forall(label3.contains),
      "every result must satisfy the pre-filter")
    assert((widened.toSet intersect exact.toSet).size >= 7,
      s"widened=$widened exact=$exact")
  }

  test("oversized-bucket guard warns with the numPartitions fix") {
    // pure-function check on a deliberately lopsided index: one bucket
    // holds nearly everything
    val meta = IvfIndex.IndexMeta("embedding", "vec_id", "l2",
      numPartitions = 2, dim = 64,
      centroids = Seq(Seq.fill(64)(0.0), Seq.fill(64)(1.0)),
      bucketRows = Some(Map("0" -> 50000000L, "1" -> 10L)))
    val warnings = HnswIndex.oversizedBucketWarnings(meta, Seq(0, 1),
      maxBytes = 1L << 30)
    assert(warnings.size == 1, warnings.toString)
    assert(warnings.head.contains("bucket 0") &&
      warnings.head.contains("numPartitions"), warnings.head)
    // under the threshold: silent
    assert(HnswIndex.oversizedBucketWarnings(meta, Seq(1), 1L << 30).isEmpty)
    // pre-guard index metadata (no bucketRows): silent, not crashing
    assert(HnswIndex.oversizedBucketWarnings(
      meta.copy(bucketRows = None), Seq(0, 1), 1L).isEmpty)

    // integration: a real search under a 1-byte threshold still answers
    // correctly (the guard warns, never blocks)
    assert(built.success)
    spark.conf.set("spark.graft.vector.maxBucketBytes", "1")
    try {
      val q = queryVec(3L)
      val res = HnswIndex.search(spark, datasetPath, "embedding", q, 5,
        nprobes = 4, ef = 200).collect()
      assert(res.length == 5)
    } finally spark.conf.unset("spark.graft.vector.maxBucketBytes")
  }

  test("incremental graph refresh rebuilds only touched buckets") {
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"), "hnswrefresh-")
      .toAbsolutePath.toString
    val ds = s"$dir/emb"
    val emb = Tables.t(spark, sf, "embeddings")
    emb.filter($"vec_id" =!= 0L).write.format("lance").mode("overwrite").save(ds)
    val ivf = IvfIndex.build(spark, spark.read.format("lance").load(ds),
      "embedding", "vec_id", ds, numPartitions = 4)
    assert(ivf.success, ivf.error)
    assert(HnswIndex.build(spark, ds, "embedding",
      HnswIndex.Params(m = 8, maxLevel = 5, efConstruction = 64)).success)

    def graphFiles(): Map[String, Seq[(String, Long)]] = {
      val root = java.nio.file.Paths.get(HnswIndex.graphPath(ds, "embedding"))
      java.nio.file.Files.list(root).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("__ivf_part="))
        .map { p =>
          p.getFileName.toString -> java.nio.file.Files.list(p).iterator().asScala
            .map(f => (f.getFileName.toString,
              java.nio.file.Files.getLastModifiedTime(f).toMillis))
            .toSeq.sortBy(_._1)
        }.toMap
    }
    val before = graphFiles()

    // append ONE row: exactly one bucket receives it, so exactly one
    // bucket's graph directory may change
    emb.filter($"vec_id" === 0L).write.format("lance").mode("append").save(ds)
    assert(IvfIndex.refresh(spark, ds, "embedding") == 1L)
    val after = graphFiles()
    val changed = before.keySet.filter(k => before(k) != after.getOrElse(k, Seq.empty))
    assert(changed.size == 1,
      s"exactly one bucket graph should be rebuilt, got $changed")
    // untouched buckets: identical file names AND modification times
    (before.keySet -- changed).foreach(k => assert(before(k) == after(k), k))

    // the rebuilt graph covers old + new rows of its bucket: the appended
    // vector is findable at distance 0 through the graph walk, and the
    // refresh respected the recorded build params (graph loads fine)
    val q = emb.filter($"vec_id" === 0L)
      .select($"embedding").collect().head.getSeq[Float](0).toArray
    val top = HnswIndex.search(spark, ds, "embedding", q, 1, nprobes = 4, ef = 64)
      .collect().head
    assert(top.getLong(0) == 0L && top.getDouble(1) < 1e-12, top.toString)
    assert(spark.read.parquet(HnswIndex.graphPath(ds, "embedding")).count() == 500)
    assert(HnswIndex.readParams(spark, ds, "embedding") ==
      HnswIndex.Params(m = 8, maxLevel = 5, efConstruction = 64))
  }

  test("distances returned are exact L2 for the found ids") {
    assert(built.success)
    val q = queryVec(7L)
    val res = HnswIndex.search(spark, datasetPath, "embedding", q, 5, nprobes = 4, ef = 100)
      .collect()
    val emb = Tables.t(spark, sf, "embeddings")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    res.foreach { r =>
      val v = emb(r.getLong(0))
      val d = math.sqrt(v.zip(q).map { case (a, b) =>
        (a.toDouble - b.toDouble) * (a.toDouble - b.toDouble) }.sum)
      assert(math.abs(d - r.getDouble(1)) < 1e-9)
    }
  }

  test("exact-double re-rank (opt-in) equals brute-force double KNN") {
    // a FLOAT64 corpus: the plain graph walk quantizes to float32, the
    // re-rank path must return the exact double top-k WITH exact double
    // distances (id set, order, and values)
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"),
      "hnsw-f64-").toAbsolutePath.toString
    val ds = s"$dir/emb64"
    val df = Tables.t(spark, sf, "embeddings")
      .withColumn("embedding", $"embedding".cast("array<double>"))
    assert(IvfIndex.build(spark, df, "embedding", "vec_id", ds,
      numPartitions = 4).success)
    assert(HnswIndex.build(spark, ds, "embedding").success)
    val qd = queryVec(3L).map(_.toDouble)
    val got = HnswIndex.searchRerankDouble(spark, ds, "embedding", qd, 10,
      nprobes = 4, ef = 200).collect()
    val brute = df.select($"vec_id", $"embedding").collect()
      .map { r =>
        val v = r.getSeq[Double](1).toArray
        val d = math.sqrt(v.zip(qd).map { case (a, b) =>
          (a - b) * (a - b) }.sum)
        (r.getLong(0), d)
      }.sortBy { case (id, d) => (d, id) }.take(10)
    assert(got.length == 10)
    got.zip(brute).foreach { case (g, (id, d)) =>
      assert(g.getLong(0) == id,
        s"re-ranked ids diverge from brute-force double KNN: " +
          s"${got.map(_.getLong(0)).mkString(",")} vs " +
          s"${brute.map(_._1).mkString(",")}")
      assert(math.abs(g.getDouble(1) - d) < 1e-12,
        s"re-ranked distance not exact double: ${g.getDouble(1)} vs $d")
    }
    // a filter that matches nothing stays loud-but-empty, not a crash
    val none = HnswIndex.searchRerankDouble(spark, ds, "embedding", qd, 5,
      nprobes = 4, ef = 100, filter = Some(col("vec_id") < 0))
    assert(none.collect().isEmpty)
  }
}
