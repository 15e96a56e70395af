package graft

import graft.index.IvfIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The opt-in ANN optimizer rule: distance-orderBy-limit over a lance scan
  * becomes an IVF bucket probe when enabled and an index exists.
  */
class AnnIndexRewriteSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // extensions bind at session build; clear the suite-shared session so
    // getOrCreate cannot hand back one built without them
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ann-rewrite")
      .withExtensions(new GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // driver-regenerated testdata carries isAdjustedToUTC=false; read micros
      // as session-TZ TIMESTAMP (UTC) like every prior round, not NTZ
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private lazy val datasetPath = {
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"), "ann-rw-")
      .toAbsolutePath.toString
    val ds = s"$dir/emb"
    Tables.t(spark, TestSpark.sf, "embeddings")
      .write.format("lance").mode("append").save(ds)
    val r = IvfIndex.build(spark, spark.read.format("lance").load(ds),
      "embedding", "vec_id", ds, numPartitions = 4)
    assert(r.success, r.error)
    ds
  }

  private def knnPlan() = {
    val q = Tables.t(spark, TestSpark.sf, "embeddings")
      .filter(col("vec_id") === 0).select("embedding")
      .collect().head.getSeq[Float](0).toArray
    Lance.knnSearch(spark.read.format("lance").load(datasetPath),
      "embedding", q, 5)
  }

  test("disabled by default: plan scans the dataset itself") {
    spark.conf.unset("spark.graft.ann.useIndex")
    val plan = knnPlan().queryExecution.executedPlan.toString
    assert(!plan.contains("_indices"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("enabled: plan probes the pruned index buckets, results stay correct") {
    spark.conf.set("spark.graft.ann.useIndex", "true")
    spark.conf.set("spark.graft.ann.nprobes", "2")
    try {
      val df = knnPlan()
      val rows = df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("_indices"), plan)
      assert(plan.contains("PartitionFilters: [__ivf_part"), plan)
      assert(rows.length == 5)
      // query vector is vec 0's own embedding: nearest hit survives probing
      assert(rows.head.getLong(0) == 0L)
      assert(rows.head.getAs[Double]("_distance") < 1e-9)
      val dists = rows.map(_.getAs[Double]("_distance"))
      assert(dists.sameElements(dists.sorted))
    } finally {
      spark.conf.unset("spark.graft.ann.useIndex")
      spark.conf.unset("spark.graft.ann.nprobes")
    }
  }

  test("time-traveled reads never rewrite: versionAsOf/timestampAsOf/tagAsOf keep the exact scan") {
    spark.conf.set("spark.graft.ann.useIndex", "true")
    try {
      val q = Tables.t(spark, TestSpark.sf, "embeddings")
        .filter(col("vec_id") === 0).select("embedding")
        .collect().head.getSeq[Float](0).toArray
      Lance.tag(spark, datasetPath, "ann-pin", replace = true)
      val pins = Seq(
        spark.read.format("lance").option("versionAsOf", "1").load(datasetPath),
        spark.read.format("lance")
          .option("timestampAsOf", System.currentTimeMillis().toString).load(datasetPath),
        spark.read.format("lance").option("tagAsOf", "ann-pin").load(datasetPath))
      pins.foreach { rel =>
        val df = Lance.knnSearch(rel, "embedding", q, 5)
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("_indices"),
          s"historical read must not probe the current-version index:\n$plan")
        assert(df.collect().head.getLong(0) == 0L)
      }
    } finally {
      spark.conf.unset("spark.graft.ann.useIndex")
      Lance.deleteTag(spark, datasetPath, "ann-pin")
    }
  }

  test("cosine query over a cosine index rewrites too; l2 index is skipped") {
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"), "ann-rw-cos-")
      .toAbsolutePath.toString
    val ds = s"$dir/emb"
    Tables.t(spark, TestSpark.sf, "embeddings")
      .write.format("lance").mode("append").save(ds)
    val r = IvfIndex.build(spark, spark.read.format("lance").load(ds),
      "embedding", "vec_id", ds, numPartitions = 4, metric = "cosine")
    assert(r.success, r.error)
    val q = Tables.t(spark, TestSpark.sf, "embeddings")
      .filter(col("vec_id") === 1).select("embedding")
      .collect().head.getSeq[Float](0).toArray
    spark.conf.set("spark.graft.ann.useIndex", "true")
    spark.conf.set("spark.graft.ann.nprobes", "4")
    try {
      val df = Lance.knnSearch(spark.read.format("lance").load(ds),
        "embedding", q, 5, metric = "cosine")
      val rows = df.collect()
      assert(df.queryExecution.executedPlan.toString.contains("__ivf_part"))
      assert(rows.head.getLong(0) == 1L) // own embedding: cosine distance 0
      // metric mismatch: an L2 query over this cosine-built index must NOT
      // rewrite (the probe would rank with the wrong geometry) — exact scan
      val l2 = Lance.knnSearch(spark.read.format("lance").load(ds),
        "embedding", q, 5, metric = "l2")
      l2.collect()
      assert(!l2.queryExecution.executedPlan.toString.contains("__ivf_part"))
    } finally {
      spark.conf.unset("spark.graft.ann.useIndex")
      spark.conf.unset("spark.graft.ann.nprobes")
    }
  }

  test("dot rewrites in both shapes: API ascending -dot and SQL dot DESC") {
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"), "ann-rw-dot-")
      .toAbsolutePath.toString
    val ds = s"$dir/emb"
    Tables.t(spark, TestSpark.sf, "embeddings")
      .write.format("lance").mode("append").save(ds)
    val r = IvfIndex.build(spark, spark.read.format("lance").load(ds),
      "embedding", "vec_id", ds, numPartitions = 4, metric = "dot")
    assert(r.success, r.error)
    val q = Tables.t(spark, TestSpark.sf, "embeddings")
      .filter(col("vec_id") === 2).select("embedding")
      .collect().head.getSeq[Float](0).toArray
    def exactIds(metricRun: => org.apache.spark.sql.DataFrame): Seq[Long] = {
      spark.conf.unset("spark.graft.ann.useIndex")
      try metricRun.collect().map(_.getLong(0)).toSeq
      finally spark.conf.set("spark.graft.ann.useIndex", "true")
    }
    spark.conf.set("spark.graft.ann.useIndex", "true")
    spark.conf.set("spark.graft.ann.nprobes", "4") // full probe -> exact
    try {
      // shape 1: the API's ascending sort on -dot (knnSearch metric="dot")
      val api = Lance.knnSearch(spark.read.format("lance").load(ds),
        "embedding", q, 5, metric = "dot")
      val apiRows = api.collect()
      assert(api.queryExecution.executedPlan.toString.contains("__ivf_part"),
        api.queryExecution.executedPlan.toString)
      val exact = exactIds(Lance.knnSearch(
        spark.read.format("lance").load(ds), "embedding", q, 5, metric = "dot"))
      assert(apiRows.map(_.getLong(0)).toSeq == exact)

      // shape 2: SQL `ORDER BY dot_product(...) DESC` — the probe's
      // _distance (= -dot) must be negated back in the output
      spark.read.format("lance").load(ds).createOrReplaceTempView("ann_dot_v")
      val vecSql = q.map(v => s"${v}D").mkString("array(", ", ", ")")
      val sql =
        s"""SELECT vec_id, dot_product(embedding, $vecSql) AS dp
           |FROM ann_dot_v ORDER BY dp DESC LIMIT 5""".stripMargin
      val df = spark.sql(sql)
      val rows = df.collect()
      assert(df.queryExecution.executedPlan.toString.contains("__ivf_part"),
        df.queryExecution.executedPlan.toString)
      assert(rows.map(_.getLong(0)).toSeq == exact)
      // dp carries the RAW dot (descending), not the probe's -dot
      val dps = rows.map(_.getDouble(1))
      assert(dps.sameElements(dps.sorted.reverse), dps.mkString(","))
      assert(dps.head > 0.0)
    } finally {
      spark.conf.unset("spark.graft.ann.useIndex")
      spark.conf.unset("spark.graft.ann.nprobes")
    }
  }

  test("full-probe rewrite equals the exact scan results") {
    spark.conf.set("spark.graft.ann.useIndex", "true")
    spark.conf.set("spark.graft.ann.nprobes", "4")
    try {
      val ann = knnPlan().collect().map(_.getLong(0)).toSet
      spark.conf.unset("spark.graft.ann.useIndex")
      val exact = knnPlan().collect().map(_.getLong(0)).toSet
      assert(ann == exact)
    } finally {
      spark.conf.unset("spark.graft.ann.useIndex")
      spark.conf.unset("spark.graft.ann.nprobes")
    }
  }

  private def filteredKnnPlan() = {
    val q = Tables.t(spark, TestSpark.sf, "embeddings")
      .filter(col("vec_id") === 0).select("embedding")
      .collect().head.getSeq[Float](0).toArray
    Lance.knnSearch(
      spark.read.format("lance").load(datasetPath).filter(col("label") === 3),
      "embedding", q, 5)
  }

  test("pre-filtered query rewrites, forwards the filter, stays correct") {
    spark.conf.set("spark.graft.ann.useIndex", "true")
    spark.conf.set("spark.graft.ann.nprobes", "4") // full probe: exact
    try {
      val df = filteredKnnPlan()
      val rows = df.collect()
      // the filtered probe materializes its k rows at plan time (loud-
      // widening contract), so a FIRED rewrite shows as a LocalTableScan
      // with no TakeOrderedAndProject — the exact scan's signature
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("LocalTableScan") &&
        !plan.contains("TakeOrderedAndProject"), plan)
      assert(rows.nonEmpty)
      spark.conf.unset("spark.graft.ann.useIndex")
      val exact = filteredKnnPlan().collect()
      assert(rows.map(_.getLong(0)).toSeq == exact.map(_.getLong(0)).toSeq,
        "full-probe filtered rewrite must equal the exact filtered scan")
      // the filter actually applied: every survivor has label 3
      val labels = spark.read.format("lance").load(datasetPath)
        .filter(col("vec_id").isin(rows.map(_.getLong(0)).toSeq: _*))
        .select("label").collect().map(_.getInt(0)).toSet
      assert(labels == Set(3))
    } finally {
      spark.conf.unset("spark.graft.ann.useIndex")
      spark.conf.unset("spark.graft.ann.nprobes")
    }
  }

  test("a subquery filter blocks the rewrite (exact scan answers)") {
    spark.conf.set("spark.graft.ann.useIndex", "true")
    try {
      val q = Tables.t(spark, TestSpark.sf, "embeddings")
        .filter(col("vec_id") === 0).select("embedding")
        .collect().head.getSeq[Float](0).toArray
      spark.read.format("lance").load(datasetPath)
        .createOrReplaceTempView("ann_rw_base")
      val df = Lance.knnSearch(
        spark.sql("SELECT * FROM ann_rw_base WHERE vec_id IN " +
          "(SELECT vec_id FROM ann_rw_base WHERE label = 3)"),
        "embedding", q, 5)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("__ivf_part"),
        s"subquery filter must keep the exact scan:\n$plan")
    } finally {
      spark.conf.unset("spark.graft.ann.useIndex")
    }
  }
}
