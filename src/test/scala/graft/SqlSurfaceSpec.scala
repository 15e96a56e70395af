package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** End-to-end SQL surface through GraftSparkExtensions — a separate
  * session because extensions bind at session build time.
  */
class SqlSurfaceSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // extensions bind at session build; clear the suite-shared session so
    // getOrCreate cannot hand back one built without them
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-sql-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // driver-regenerated testdata carries isAdjustedToUTC=false; read micros
      // as session-TZ TIMESTAMP (UTC) like every prior round, not NTZ
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftSparkExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private lazy val datasetPath: String = {
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"), "sql-test-")
      .toAbsolutePath.toString
    val ds = s"$dir/emb"
    Lance.write(Tables.t(spark, TestSpark.sf, "embeddings"), ds)
    ds
  }

  test("injected distance functions work in SQL") {
    Tables.t(spark, TestSpark.sf, "embeddings").createOrReplaceTempView("emb_sql")
    val r = spark.sql(
      "SELECT vec_id, l2_distance(embedding, embedding) AS zero, " +
        "dot_product(embedding, embedding) AS norm2, " +
        "cosine_distance(embedding, embedding) AS czero " +
        "FROM emb_sql ORDER BY vec_id LIMIT 3").collect()
    assert(r.length == 3)
    r.foreach { row =>
      assert(row.getDouble(1) == 0.0)
      assert(row.getDouble(2) > 0.0)
      assert(math.abs(row.getDouble(3)) < 1e-12)
    }
  }

  test("lance_versions/lance_fragments metadata TVFs read manifests only") {
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"), "meta-tvf-")
      .toAbsolutePath.toString
    spark.range(0, 100).repartition(4).write.format("lance").mode("overwrite").save(dir)
    spark.range(100, 150).coalesce(1).write.format("lance").mode("append").save(dir)

    val versions = spark.sql(
      s"SELECT version, n_fragments, n_rows FROM lance_versions('$dir') ORDER BY version")
      .collect()
    assert(versions.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq ==
      Seq((1L, 4, 100L), (2L, 5, 150L)))

    val frags = spark.sql(s"SELECT * FROM lance_fragments('$dir')").collect()
    assert(frags.length == 5)
    assert(frags.map(_.getAs[Long]("row_count")).sum == 150L)
    assert(frags.forall(_.getAs[Boolean]("has_stats")))

    // time travel: the fragment view of version 1
    val v1 = spark.sql(s"SELECT * FROM lance_fragments('$dir', 1)").collect()
    assert(v1.length == 4 && v1.map(_.getAs[Long]("row_count")).sum == 100L)

    // commit kinds surface in the history
    val ops = spark.sql(
      s"SELECT operation FROM lance_versions('$dir') ORDER BY version").collect()
    assert(ops.map(_.getString(0)).toSeq == Seq("overwrite", "append"))

    // layout state: unbucketed fragments carry null bucket/key_sorted
    // but a recorded size; after clusterByBucket both are populated
    assert(frags.forall(f => f.isNullAt(f.fieldIndex("bucket")) &&
      f.isNullAt(f.fieldIndex("key_sorted")) &&
      f.getAs[Long]("bytes") > 0L))
    Lance.clusterByBucket(spark, dir, Seq("id"), numBuckets = 4)
    val laid = spark.sql(s"SELECT * FROM lance_fragments('$dir')").collect()
    assert(laid.forall(f => !f.isNullAt(f.fieldIndex("bucket")) &&
      f.getAs[Boolean]("key_sorted")))
  }

  test("lance_take TVF: row addresses from SQL match the Scala API") {
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"), "take-tvf-")
      .toAbsolutePath.toString
    spark.range(0, 100).withColumn("sq", org.apache.spark.sql.functions.expr("id * id"))
      .repartitionByRange(4, org.apache.spark.sql.functions.col("id"))
      .sortWithinPartitions("id")
      .write.format("lance").mode("overwrite").save(dir)
    val rows = spark.sql(s"SELECT _rowid, id, sq FROM lance_take('$dir', 0, 42, 99)")
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 0L, 0L), (42L, 42L, 1764L), (99L, 99L, 9801L)))
    val api = Lance.take(spark, dir, Seq(0L, 42L, 99L))
      .select("_rowid", "id", "sq").collect()
    assert(rows.map(_.toSeq).toSeq == api.map(_.toSeq).toSeq)
  }

  test("lance_changes TVF: version-range change feed with delete/insert rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"), "changes-tvf-")
      .toAbsolutePath.toString
    // v1/v2: two appends of (id, v)
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v").coalesce(1)
      .write.format("lance").mode("overwrite").save(dir)
    Seq((3L, 3.0), (4L, 4.0)).toDF("id", "v").coalesce(1)
      .write.format("lance").mode("append").save(dir)
    // v3: row-preserving compaction — must emit NO changes
    Lance.compact(spark, dir)
    // v4: copy-on-write UPDATE rewrites the (now single) fragment
    operators.Dml.updateWhere(spark, dir,
      org.apache.spark.sql.functions.col("id") === 3L,
      Seq("v" -> org.apache.spark.sql.functions.lit(30.0)))

    // full range from 0: snapshot inserts (v1, v2) + compaction silence +
    // the update's delete/insert pair for the whole rewritten fragment
    val all = spark.sql(s"SELECT * FROM lance_changes('$dir', 0, 4)")
      .select("_change_type", "_commit_version", "id", "v")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(all == Set(
      ("insert", 1L, 1L, 1.0), ("insert", 1L, 2L, 2.0),
      ("insert", 2L, 3L, 3.0), ("insert", 2L, 4L, 4.0),
      ("delete", 4L, 1L, 1.0), ("delete", 4L, 2L, 2.0),
      ("delete", 4L, 3L, 3.0), ("delete", 4L, 4L, 4.0),
      ("insert", 4L, 1L, 1.0), ("insert", 4L, 2L, 2.0),
      ("insert", 4L, 3L, 30.0), ("insert", 4L, 4L, 4.0)))

    // narrow range across only the compaction: empty, with the full schema
    val quiet = spark.sql(s"SELECT * FROM lance_changes('$dir', 2, 3)")
    assert(quiet.columns.toSeq == Seq("id", "v", "_change_type", "_commit_version"))
    assert(quiet.count() == 0)

    // only the update commit: one delete+insert pair per row
    val upd = spark.sql(
      s"SELECT _change_type, count(*) AS n FROM lance_changes('$dir', 3, 4) " +
        "GROUP BY 1 ORDER BY 1").collect()
    assert(upd.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("delete", 4L), ("insert", 4L)))

    // invalid ranges fail loud
    intercept[Exception] { spark.sql(s"SELECT * FROM lance_changes('$dir', 4, 3)") }
    intercept[Exception] { spark.sql(s"SELECT * FROM lance_changes('$dir', 0, 99)") }
  }

  test("vector_search TVF: SELECT * FROM vector_search(path, col, vec, k, metric)") {
    val q = Tables.t(spark, TestSpark.sf, "embeddings")
      .filter(org.apache.spark.sql.functions.col("vec_id") === 0)
      .select("embedding").collect().head.getSeq[Float](0)
    val vecSql = q.map(v => f"$v%.9f").mkString("array(", ", ", ")")
    val rows = spark.sql(
      s"SELECT vec_id, _distance FROM vector_search('$datasetPath', 'embedding', $vecSql, 5, 'l2')")
      .collect()
    assert(rows.length == 5)
    // decimal-literal coercion means the query vector is float-rounded; the
    // self-match must still rank first with ~zero distance
    assert(rows.head.getLong(0) == 0L)
    assert(rows.head.getDouble(1) < 1e-6)
    val dists = rows.map(_.getDouble(1))
    assert(dists.sameElements(dists.sorted))
  }

  test("vector_search TVF defaults k and metric") {
    val rows = spark.sql(
      s"SELECT * FROM vector_search('$datasetPath', 'embedding', " +
        "array(0.1, 0.0, -0.1, 0.05, 0.2, -0.15, 0.0, 0.1, 0.1, 0.0, 0.0, 0.0, " +
        "0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, " +
        "0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, " +
        "0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, " +
        "0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))").collect()
    assert(rows.length == 10) // default k
  }

  test("TVF result composes: post-filter on _distance + join (demo parity)") {
    // FlinkSqlDemo.java:589-600 — LATERAL vector_search with a WHERE on
    // the appended _distance; here the TVF output is a plain relation, so
    // Catalyst filters/joins it like any subquery.
    val q = Tables.t(spark, TestSpark.sf, "embeddings")
      .filter(org.apache.spark.sql.functions.col("vec_id") === 2)
      .select("embedding").collect().head.getSeq[Float](0)
    val vecSql = q.map(v => f"$v%.9f").mkString("array(", ", ", ")")
    val rows = spark.sql(
      s"""SELECT s.vec_id, s._distance, e.label
         |FROM vector_search('$datasetPath', 'embedding', $vecSql, 10, 'l2') s
         |JOIN emb_sql e ON e.vec_id = s.vec_id
         |WHERE s._distance < 10.0
         |ORDER BY s._distance""".stripMargin).collect()
    assert(rows.nonEmpty)
    assert(rows.head.getLong(0) == 2L)
    assert(rows.forall(_.getDouble(1) < 10.0))
  }

  test("vector_search mode arg probes the prebuilt index (use-index parity)") {
    val r = Lance.buildIndex(spark, spark.read.format("lance").load(datasetPath),
      "embedding", "vec_id", datasetPath, numPartitions = 4)
    assert(r.success, r.error)
    val q = Tables.t(spark, TestSpark.sf, "embeddings")
      .filter(org.apache.spark.sql.functions.col("vec_id") === 5)
      .select("embedding").collect().head.getSeq[Float](0)
    val vecSql = q.map(v => f"$v%.9f").mkString("array(", ", ", ")")
    // nprobes default (20) >= 4 partitions -> identical to the exact scan
    val ivf = spark.sql(
      s"SELECT vec_id FROM vector_search('$datasetPath', 'embedding', $vecSql, 5, 'l2', 'ivf')")
      .collect().map(_.getLong(0)).toSet
    val exact = spark.sql(
      s"SELECT vec_id FROM vector_search('$datasetPath', 'embedding', $vecSql, 5, 'l2')")
      .collect().map(_.getLong(0)).toSet
    assert(ivf == exact)
  }

  /** Probed-bucket count read off the executed plan's partition filter. */
  private def probedParts(sql: String): Int = {
    val df = spark.sql(sql)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // a single probe renders as an equality, several as an IN list
    "__ivf_part[^ ]* IN \\(([-0-9,]+)\\)".r.findFirstMatchIn(plan)
      .map(_.group(1).split(",").length)
      .orElse("\\(__ivf_part[^ ]* = [-0-9]+\\)".r.findFirstIn(plan).map(_ => 1))
      .getOrElse(fail(s"no __ivf_part partition filter in:\n$plan"))
  }

  test("vector.nprobes/ef reach the TVF via args and session confs") {
    val r = Lance.buildIndex(spark, spark.read.format("lance").load(datasetPath),
      "embedding", "vec_id", datasetPath, numPartitions = 4)
    assert(r.success, r.error)
    val q = Tables.t(spark, TestSpark.sf, "embeddings")
      .filter(org.apache.spark.sql.functions.col("vec_id") === 5)
      .select("embedding").collect().head.getSeq[Float](0)
    val vecSql = q.map(v => f"$v%.9f").mkString("array(", ", ", ")")
    def searchSql(tail: String) =
      s"SELECT vec_id FROM vector_search('$datasetPath', 'embedding', $vecSql, 3, 'l2', 'ivf'$tail)"

    // positional arg 7: nprobes=1 probes one bucket, nprobes=3 probes three
    assert(probedParts(searchSql(", 1")) == 1)
    assert(probedParts(searchSql(", 3")) == 3)
    // session conf fallback (reference option-key parity: vector.nprobes)
    spark.conf.set("spark.graft.vector.nprobes", "2")
    try assert(probedParts(searchSql("")) == 2)
    finally spark.conf.unset("spark.graft.vector.nprobes")
    // default: 20 > 4 partitions -> all 4
    assert(probedParts(searchSql("")) == 4)

    // hnsw mode accepts nprobes+ef (arg 8) and vector.ef conf
    val g = graft.index.HnswIndex.build(spark, datasetPath, "embedding")
    assert(g.success, g.error)
    val viaArgs = spark.sql(
      s"SELECT vec_id FROM vector_search('$datasetPath', 'embedding', $vecSql, 3, 'l2', 'hnsw', 4, 64)")
      .collect()
    assert(viaArgs.length == 3)
    spark.conf.set("spark.graft.vector.ef", "64")
    try {
      val viaConf = spark.sql(
        s"SELECT vec_id FROM vector_search('$datasetPath', 'embedding', $vecSql, 3, 'l2', 'hnsw', 4)")
        .collect()
      assert(viaConf.map(_.getLong(0)).toSeq == viaArgs.map(_.getLong(0)).toSeq)
    } finally spark.conf.unset("spark.graft.vector.ef")
  }

  test("vector_search_join TVF reaches the flip-geometry KNN join from SQL") {
    val r = Lance.buildIndex(spark, spark.read.format("lance").load(datasetPath),
      "embedding", "vec_id", datasetPath, numPartitions = 4)
    assert(r.success, r.error)
    Tables.t(spark, TestSpark.sf, "embeddings").limit(20)
      .createOrReplaceTempView("q_side")
    val viaSql = spark.sql(
      s"""SELECT query_id, _rank, vec_id, _distance
         |FROM vector_search_join('$datasetPath', 'embedding', 'q_side',
         |                        'vec_id', 3, 20, 'l2', 'flipped')
         |ORDER BY query_id, _rank""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val viaApi = graft.index.IvfIndex.searchJoin(spark, datasetPath,
      "embedding", spark.table("q_side"), "vec_id", k = 3, nprobes = 20,
      geometry = "flipped")
      .orderBy("query_id", "_rank")
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("_rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("_distance")))
    assert(viaSql.nonEmpty && viaSql.length == 20 * 3)
    assert(viaSql.toSeq == viaApi.toSeq,
      "SQL TVF must hash-match the Scala API on the same path")
  }

  test("vector_search 'hnsw_rerank' mode: SQL == API, exact double distances") {
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"),
      "sql-rerank-").toAbsolutePath.toString
    val ds = s"$dir/emb64"
    val df = Tables.t(spark, TestSpark.sf, "embeddings")
      .withColumn("embedding",
        org.apache.spark.sql.functions.col("embedding").cast("array<double>"))
    assert(Lance.buildIndex(spark, df, "embedding", "vec_id", ds,
      numPartitions = 4).success)
    assert(Lance.buildHnswIndex(spark, ds, "embedding").success)
    val qd = df.filter(org.apache.spark.sql.functions.col("vec_id") === 7)
      .select("embedding").collect().head.getSeq[Double](0).toArray
    // Double.toString is shortest-roundtrip: the literal array re-parses
    // to the EXACT same doubles, so the self-match distance is exactly 0
    val vecSql = qd.map(_.toString).mkString("array(", ", ", ")")
    val viaSql = spark.sql(
      s"SELECT vec_id, _distance FROM vector_search('$ds', 'embedding', " +
        s"$vecSql, 5, 'l2', 'hnsw_rerank', 4, 200)")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val viaApi = Lance.annSearchHnswRerank(spark, ds, "embedding", qd, 5,
      nprobes = 4, ef = 200)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(viaSql.length == 5)
    assert(viaSql.toSeq == viaApi.toSeq,
      "hnsw_rerank TVF must match the Scala API row-for-row")
    assert(viaSql.head == ((7L, 0.0)),
      s"self-match must rank first at EXACT double zero, got ${viaSql.head}")
  }

  test("vector_search filter arg pre-filters: all k results satisfy it") {
    val q = Tables.t(spark, TestSpark.sf, "embeddings")
      .filter(org.apache.spark.sql.functions.col("vec_id") === 0)
      .select("embedding").collect().head.getSeq[Float](0)
    val vecSql = q.map(v => f"$v%.9f").mkString("array(", ", ", ")")
    // exact mode: a pre-filter returns k rows ALL matching label=3 — a
    // WHERE on the TVF output would instead post-trim the unfiltered top-k
    val rows = spark.sql(
      s"""SELECT s.vec_id, e.label FROM vector_search('$datasetPath', 'embedding',
         | $vecSql, 5, 'l2', 'exact', 20, 100, 'label = 3') s
         |JOIN emb_sql e ON e.vec_id = s.vec_id""".stripMargin).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getInt(1) == 3), rows.mkString(","))
    // ivf mode honors the same pre-filter (with probe widening if starved)
    val ivfRows = spark.sql(
      s"""SELECT s.vec_id, e.label FROM vector_search('$datasetPath', 'embedding',
         | $vecSql, 5, 'l2', 'ivf', 20, 100, 'label = 3') s
         |JOIN emb_sql e ON e.vec_id = s.vec_id""".stripMargin).collect()
    assert(ivfRows.length == 5)
    assert(ivfRows.forall(_.getInt(1) == 3))
    // graph mode composes the filter with the beam walk (traverse
    // non-matching nodes, never return them; ef widens loudly on
    // shortfall) — reference filter-with-any-index semantics
    val hnswRows = spark.sql(
      s"""SELECT s.vec_id, e.label FROM vector_search('$datasetPath', 'embedding',
         | $vecSql, 5, 'l2', 'hnsw', 4, 100, 'label = 3') s
         |JOIN emb_sql e ON e.vec_id = s.vec_id""".stripMargin).collect()
    assert(hnswRows.length == 5)
    assert(hnswRows.forall(_.getInt(1) == 3), hnswRows.mkString(","))
    // full-probe + wide-beam graph result equals the ivf (exact) filtered set
    assert(hnswRows.map(_.getLong(0)).toSet == ivfRows.map(_.getLong(0)).toSet)
  }

  test("Lance facade: write/read/knn/index/ann round trip") {
    val df = Lance.read(spark, datasetPath)
    assert(df.count() == 500)
    val filtered = Lance.read(spark, datasetPath, filter = Some("label = 3"))
    assert(filtered.count() > 0)
    // read.columns / read.limit option parity: projection reaches the
    // scan's ReadSchema (column pruning), limit bounds the result
    val pruned = Lance.read(spark, datasetPath,
      columns = Some(Seq("vec_id", "label")), limit = Some(7))
    assert(pruned.columns.toSeq == Seq("vec_id", "label"))
    assert(pruned.count() == 7)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<vec_id:bigint,label:int>"), scan)

    val q = df.filter(org.apache.spark.sql.functions.col("vec_id") === 7)
      .select("embedding").collect().head.getSeq[Float](0).toArray
    val exact = Lance.knnSearch(df, "embedding", q, 5)
    assert(exact.count() == 5)

    val build = Lance.buildIndex(spark, df, "embedding", "vec_id", datasetPath,
      numPartitions = 8)
    assert(build.success, build.error)
    val ann = Lance.annSearch(spark, datasetPath, "embedding", q, 5, nprobes = 8)
    assert(ann.select("vec_id").collect().map(_.getLong(0)).toSet ==
      exact.select("vec_id").collect().map(_.getLong(0)).toSet)
  }

  /** BASELINE.md parity check: the reference's own vector-search demo
    * (`ref:FlinkSqlDemo.java:496-584` — 5 known 8-dim vectors, k=3, L2
    * then COSINE) replayed end-to-end through OUR surface: catalog DDL,
    * INSERT VALUES, `vector_search` TVF. Expected rankings are hand-
    * derivable: the L2 query IS doc 1's vector (top-3 = 1, 5, 4 by
    * uniform per-dim offsets 0, .02, .05); the cosine query IS doc 3's
    * vector (top-3 = 3, 2, 4).
    */
  test("reference FlinkSqlDemo vector-search parity: exact demo data, L2 + COSINE") {
    val wh = Files.createTempDirectory(java.nio.file.Paths.get("target"), "demo-wh-")
      .toAbsolutePath.toString
    spark.conf.set("spark.sql.catalog.lance_demo", "graft.catalog.LanceCatalog")
    spark.conf.set("spark.sql.catalog.lance_demo.warehouse", wh)
    spark.sql("CREATE NAMESPACE lance_demo.db")
    spark.sql("CREATE TABLE lance_demo.db.vector_documents " +
      "(id BIGINT, content STRING, embedding ARRAY<FLOAT>)")
    spark.sql("INSERT INTO lance_demo.db.vector_documents VALUES " +
      "(1, 'Flink Stream Processing', array(0.1f,0.2f,0.3f,0.4f,0.5f,0.6f,0.7f,0.8f)), " +
      "(2, 'Spark Batch Processing', array(0.2f,0.3f,0.4f,0.5f,0.6f,0.7f,0.8f,0.9f)), " +
      "(3, 'Kafka Message Queue', array(0.8f,0.7f,0.6f,0.5f,0.4f,0.3f,0.2f,0.1f)), " +
      "(4, 'Vector Database', array(0.15f,0.25f,0.35f,0.45f,0.55f,0.65f,0.75f,0.85f)), " +
      "(5, 'Machine Learning Basics', array(0.12f,0.22f,0.32f,0.42f,0.52f,0.62f,0.72f,0.82f))")
    val path = s"$wh/db/vector_documents"

    val l2 = spark.sql(
      s"SELECT id, _distance FROM vector_search('$path', 'embedding', " +
        "array(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8), 3, 'L2')").collect()
    assert(l2.map(_.getLong(0)).toSeq == Seq(1L, 5L, 4L), l2.mkString(", "))
    assert(l2.head.getDouble(1) == 0.0) // the query is doc 1's own vector
    val l2d = l2.map(_.getDouble(1)).toSeq
    assert(l2d == l2d.sorted)

    val cos = spark.sql(
      s"SELECT id, _distance FROM vector_search('$path', 'embedding', " +
        "array(0.8, 0.7, 0.6, 0.5, 0.4, 0.3, 0.2, 0.1), 3, 'COSINE')").collect()
    assert(cos.map(_.getLong(0)).toSeq == Seq(3L, 2L, 4L), cos.mkString(", "))
    assert(math.abs(cos.head.getDouble(1)) < 1e-7) // doc 3's own vector
  }
}
