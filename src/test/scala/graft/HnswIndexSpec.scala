package graft

import graft.index.{HnswIndex, IvfIndex}
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

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
}
