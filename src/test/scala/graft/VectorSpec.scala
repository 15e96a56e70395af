package graft

import graft.functions.VectorFunctions._
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("distance expressions match hand-computed values") {
    val df = Seq((vec(1, 0, 0), vec(0, 1, 0))).toDF("a", "b")
    val r = df.select(
      dot_product($"a", $"b").as("dot"),
      l2_distance($"a", $"b").as("l2"),
      cosine_distance($"a", $"b").as("cos")).collect().head
    assert(r.getDouble(0) == 0.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(2)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("cosine of identical vectors is 0; zero vector yields 1") {
    val df = Seq((vec(1, 2, 3), vec(1, 2, 3), vec(0, 0, 0))).toDF("a", "b", "z")
    val r = df.select(
      cosine_distance($"a", $"b"),
      cosine_distance($"a", $"z")).collect().head
    assert(math.abs(r.getDouble(0)) < 1e-12)
    assert(r.getDouble(1) == 1.0)
  }

  test("property: engine eval matches reference loop on random vectors") {
    val rnd = new scala.util.Random(42)
    val cases = (1 to 25).map { _ =>
      (Array.fill(16)(rnd.nextFloat() * 20 - 10),
        Array.fill(16)(rnd.nextFloat() * 20 - 10))
    }
    val df = cases.toDF("a", "b")
    val got = df.select(dot_product($"a", $"b")).collect().map(_.getDouble(0))
    val want = cases.map { case (a, b) =>
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    }
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("codegen compiles for non-nullable-element arrays (no isNull var)") {
    // primitive-array encoders produce containsNull=false: with both
    // sides non-null-element the generated code must not reference the
    // isNull variable (declared only for nullable expressions)
    import graft.functions.VectorFunctions._
    val ds = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    assert(!ds.schema("a").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)
    val df = ds.select(
      dot_product($"a", $"b").as("d"),
      l2_distance($"a", $"b").as("l"),
      cosine_distance($"a", $"a").as("c"))
    val r = df.collect().head
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(8.0)) < 1e-12)
    assert(math.abs(r.getDouble(2)) < 1e-12)
  }

  test("a null vector element makes the distance NULL, not silently 0-filled") {
    graft.functions.VectorFunctions.register(spark)
    val df = spark.sql(
      "SELECT dot_product(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 5.0D)) AS d, " +
        "l2_distance(array(CAST(NULL AS DOUBLE)), array(2.0D)) AS l, " +
        "cosine_distance(array(1.0D, NULL), array(1.0D, 1.0D)) AS c")
    val r = df.collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("dimension mismatch throws a clear error") {
    val df = Seq((vec(1, 2), vec(1, 2, 3))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(l2_distance($"a", $"b")).collect()
    }
    assert(e.getMessage.contains("dimensions differ") ||
      e.getCause != null && e.getCause.getMessage.contains("dimensions differ"))
  }

  test("query vector validation rejects NaN/Inf/empty") {
    intercept[IllegalArgumentException](validateQueryVector(Array.empty[Float]))
    intercept[IllegalArgumentException](validateQueryVector(Array(1f, Float.NaN)))
    intercept[IllegalArgumentException](validateQueryVector(Array(Float.PositiveInfinity)))
  }

  test("knnSearch returns k rows ordered by _distance with filter applied") {
    val e = Tables.t(spark, sf, "embeddings")
    val q = e.filter($"vec_id" === 0).collect().head
      .getSeq[Float](1).toArray
    val res = Similarity.knnSearch(e, "embedding", q, 5, "l2",
      Some($"label" === 3)).collect()
    assert(res.length == 5)
    val dists = res.map(_.getAs[Double]("_distance"))
    assert(dists.sameElements(dists.sorted))
    assert(res.forall(_.getAs[Int]("label") == 3))
  }

  test("knn plan is TakeOrderedAndProject (no global sort) and codegen'd") {
    val df = Similarity.v21KnnL2(spark, sf)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // whole-stage codegen spans render as "*(n)" in the plan string; the
    // distance expression must sit inside one, not in an interpreted project
    assert(plan.contains("*(2) Project") || plan.contains("*(1) Project"), plan)
    assert(plan.contains("PushedFilters: [IsNotNull(vec_id)"), plan)
  }

  test("SQL registration works") {
    register(spark)
    Tables.t(spark, sf, "embeddings").createOrReplaceTempView("emb")
    val r = spark.sql(
      "SELECT l2_distance(embedding, embedding) AS d FROM emb LIMIT 1").collect()
    assert(r.head.getDouble(0) == 0.0)
  }
}
