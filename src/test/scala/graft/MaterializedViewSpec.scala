package graft

import graft.format.LanceFormat
import graft.operators.MaterializedView
import graft.operators.MaterializedView.AggSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Incremental materialized views from the row-level CDF. Contracts:
  *  - create = full aggregate + `graft.mv.*` bookkeeping in ONE commit
  *  - delta refresh (sum/count/avg) after mixed DML equals a full
  *    recompute EXACTLY (decimal state: incremental float drift is a
  *    correctness bug, not noise); dead groups vanish, new groups appear
  *  - min/max views take the scoped-group path and also match recompute
  *  - refresh twice = noop; watermark advances IN the refresh commit
  *  - NULL group keys work (the _mv_gid surrogate routes them)
  *  - out-of-band state corruption fails loud (negative count guard)
  */
class MaterializedViewSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "mv-")
      .toAbsolutePath.toString

  private def manifest(dir: String) = {
    val root = new Path(dir)
    val fs = LanceFormat.fileSystem(root, spark.sessionState.newHadoopConf())
    LanceFormat.readLatest(fs, root).get
  }

  /** Source rows: groups g0..g9 (with some NULL groups), double + long
    * measures. */
  private def seed(dir: String): Unit =
    (1L to 500L).map { i =>
      val g = if (i % 50 == 0) null else s"g${i % 10}"
      (i, g, i * 0.1, i)
    }.toDF("id", "grp", "price", "qty")
      .repartition(4).write.format("lance").mode("overwrite").save(dir)

  private def mixedDml(src: String): Unit = {
    spark.conf.set("spark.graft.dml.changeFeed", "true")
    try {
      Lance.deleteWhere(spark, src, "id % 7 = 3")
      Lance.updateWhere(spark, src, "id % 11 = 5",
        Map("price" -> "price * 3", "qty" -> "qty + 100"))
      val ins = Seq((1001L, "g3", 7.7, 70L), (1002L, "gNEW", 8.8, 80L),
        (5L, "g5", 0.55, 5L)) // upsert over an existing id
        .toDF("id", "grp", "price", "qty")
      Lance.upsert(spark, src, ins, Seq("id"))
    } finally spark.conf.unset("spark.graft.dml.changeFeed")
  }

  private def assertSame(a: DataFrame, b: DataFrame, hint: String): Unit = {
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$hint:\nview:\n${a.orderBy("grp").collect().mkString("\n")}\n" +
        s"recompute:\n${b.orderBy("grp").collect().mkString("\n")}")
  }

  test("create materializes the full aggregate with bookkeeping in one commit") {
    val src = tmpDir(); val view = tmpDir() + "/v"
    seed(src)
    val v = MaterializedView.create(spark, view, src, Seq("grp"), Seq(
      AggSpec("count", "*", "n"), AggSpec("sum", "price", "sum_price"),
      AggSpec("avg", "qty", "avg_qty")))
    assert(v == manifest(src).version)
    val m = manifest(view)
    assert(m.version == 1L, "create is ONE commit (aggregate + properties)")
    val props = m.properties.get
    assert(props("graft.mv.group-by") == "grp")
    assert(props("graft.mv.version") == v.toString)
    val got = MaterializedView.read(spark, view)
    assert(got.columns.toSeq == Seq("grp", "n", "sum_price", "avg_qty"))
    val expect = spark.read.format("lance").load(src).groupBy("grp").agg(
      count(lit(1)).as("n"),
      Tables.dsum(col("price")).as("sum_price"),
      Tables.davg(col("qty")).as("avg_qty"))
    assertSame(got, expect, "created view != full aggregate")
    // 10 named groups + the NULL group
    assert(got.count() == 11L)
  }

  test("delta refresh after mixed DML equals full recompute exactly") {
    val src = tmpDir(); val view = tmpDir() + "/v"
    seed(src)
    MaterializedView.create(spark, view, src, Seq("grp"), Seq(
      AggSpec("count", "*", "n"), AggSpec("sum", "price", "sum_price", scale = 2),
      AggSpec("sum", "qty", "sum_qty"), AggSpec("avg", "price", "avg_price")))
    mixedDml(src)
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "delta", s"sum/count/avg views must never rescan: $r")
    assert(manifest(view).properties.get("graft.mv.version") ==
      manifest(src).version.toString, "watermark rides the refresh commit")
    val got = MaterializedView.read(spark, view)
    val expect = spark.read.format("lance").load(src).groupBy("grp").agg(
      count(lit(1)).as("n"),
      Tables.dsum(col("price")).as("sum_price"),
      sum(col("qty")).as("sum_qty"),
      Tables.davg(col("price")).as("avg_price"))
    assertSame(got, expect, "delta refresh drifted from recompute")
    // the brand-new group arrived
    assert(got.filter(col("grp") === "gNEW").count() == 1L)
    // refresh again: noop, nothing committed
    val vBefore = manifest(view).version
    assert(MaterializedView.refresh(spark, view).mode == "noop")
    assert(manifest(view).version == vBefore)
  }

  test("a group deleted to zero rows vanishes from the view") {
    val src = tmpDir(); val view = tmpDir() + "/v"
    (1L to 30L).map(i => (i, s"g${i % 3}", i * 1.0)).toDF("id", "grp", "x")
      .write.format("lance").mode("overwrite").save(src)
    MaterializedView.create(spark, view, src, Seq("grp"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "x", "sx")))
    spark.conf.set("spark.graft.dml.changeFeed", "true")
    try Lance.deleteWhere(spark, src, "grp = 'g1'")
    finally spark.conf.unset("spark.graft.dml.changeFeed")
    assert(MaterializedView.refresh(spark, view).mode == "delta")
    val got = MaterializedView.read(spark, view)
    assert(got.filter(col("grp") === "g1").isEmpty, "dead group must vanish")
    assert(got.count() == 2L)
  }

  test("min/max views take the scoped-group path and match recompute") {
    val src = tmpDir(); val view = tmpDir() + "/v"
    seed(src)
    MaterializedView.create(spark, view, src, Seq("grp"), Seq(
      AggSpec("count", "*", "n"), AggSpec("min", "price", "min_price"),
      AggSpec("max", "qty", "max_qty")))
    // deleting the max row is exactly what the delta path cannot handle
    spark.conf.set("spark.graft.dml.changeFeed", "true")
    try {
      Lance.deleteWhere(spark, src, "qty >= 490")
      Lance.deleteWhere(spark, src, "grp = 'g2'") // whole group dies
    } finally spark.conf.unset("spark.graft.dml.changeFeed")
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "groups")
    val got = MaterializedView.read(spark, view)
    val expect = spark.read.format("lance").load(src).groupBy("grp").agg(
      count(lit(1)).as("n"), min(col("price")).as("min_price"),
      max(col("qty")).as("max_qty"))
    assertSame(got, expect, "scoped recompute drifted")
    assert(got.filter(col("grp") === "g2").isEmpty)
  }

  test("min/max views stay on the DELTA path for removal-free windows") {
    val src = tmpDir(); val view = tmpDir() + "/v"
    (1L to 30L).map(i => (i, s"g${i % 3}", i * 1.0)).toDF("id", "grp", "x")
      .write.format("lance").mode("overwrite").save(src)
    MaterializedView.create(spark, view, src, Seq("grp"), Seq(
      AggSpec("count", "*", "n"), AggSpec("min", "x", "mn"),
      AggSpec("max", "x", "mx")))
    // insert-only window: a new max for g0, a new group, nothing removed
    Seq((100L, "g0", 999.0), (101L, "gN", -7.0)).toDF("id", "grp", "x")
      .write.format("lance").mode("append").save(src)
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "delta",
      s"append-only windows must never rescan min/max groups: $r")
    val got = MaterializedView.read(spark, view)
    val expect = spark.read.format("lance").load(src).groupBy("grp").agg(
      count(lit(1)).as("n"), min(col("x")).as("mn"), max(col("x")).as("mx"))
    assertSame(got, expect, "min/max delta drifted")
    // a later REMOVING window falls back to the scoped-group path
    spark.conf.set("spark.graft.dml.changeFeed", "true")
    try Lance.deleteWhere(spark, src, "x = 999.0")
    finally spark.conf.unset("spark.graft.dml.changeFeed")
    val r2 = MaterializedView.refresh(spark, view)
    assert(r2.mode == "groups")
    val expect2 = spark.read.format("lance").load(src).groupBy("grp").agg(
      count(lit(1)).as("n"), min(col("x")).as("mn"), max(col("x")).as("mx"))
    assertSame(MaterializedView.read(spark, view), expect2,
      "max must move back after the delete")
  }

  test("filtered views: the WHERE applies to state and to every feed image") {
    val src = tmpDir(); val view = tmpDir() + "/v"
    (1L to 40L).map(i => (i, s"g${i % 2}", i * 1.0)).toDF("id", "grp", "x")
      .write.format("lance").mode("overwrite").save(src)
    MaterializedView.create(spark, view, src, Seq("grp"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "x", "sx")),
      where = Some("x >= 10.0"))
    def expect() = spark.read.format("lance").load(src)
      .filter(col("x") >= 10.0).groupBy("grp")
      .agg(count(lit(1)).as("n"), Tables.dsum(col("x")).as("sx"))
    assertSame(MaterializedView.read(spark, view), expect(), "seed filter")
    spark.conf.set("spark.graft.dml.changeFeed", "true")
    try {
      // an UPDATE moves rows ACROSS the boundary in both directions:
      // id=5 (x=5, outside) -> 50 (inside); id=20 (x=20, inside) -> 2
      Lance.updateWhere(spark, src, "id = 5", Map("x" -> "50.0"))
      Lance.updateWhere(spark, src, "id = 20", Map("x" -> "2.0"))
      Lance.deleteWhere(spark, src, "id = 11") // inside: leaves the view
      Lance.deleteWhere(spark, src, "id = 3") // outside: invisible no-op
    } finally spark.conf.unset("spark.graft.dml.changeFeed")
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "delta")
    assertSame(MaterializedView.read(spark, view), expect(),
      "boundary-crossing updates must net to the right add/remove pairs")
  }

  test("scoped-group refresh with NULL group values keeps them (isNull arm)") {
    val src = tmpDir(); val view = tmpDir() + "/v"
    Seq((1L, Option("g0"), 1.0), (2L, Option("g0"), 9.0),
      (3L, Option.empty[String], 5.0), (4L, Option.empty[String], 7.0))
      .toDF("id", "grp", "x")
      .write.format("lance").mode("overwrite").save(src)
    MaterializedView.create(spark, view, src, Seq("grp"),
      Seq(AggSpec("count", "*", "n"), AggSpec("max", "x", "mx")))
    spark.conf.set("spark.graft.dml.changeFeed", "true")
    try Lance.deleteWhere(spark, src, "id = 4") // the NULL group's max
    finally spark.conf.unset("spark.graft.dml.changeFeed")
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "groups")
    // the raw-column pre-filter must NOT drop NULL-group source rows
    // (isin never matches null) - the isNull arm keeps them
    val got = MaterializedView.read(spark, view)
    assert(got.filter(col("grp").isNull).select("mx").as[Double].head() == 5.0)
    assert(got.filter(col("grp").isNull).select("n").as[Long].head() == 1L)
  }

  test("NULL group keys route through the surrogate like any other group") {
    val src = tmpDir(); val view = tmpDir() + "/v"
    seed(src)
    MaterializedView.create(spark, view, src, Seq("grp"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "qty", "sq")))
    val nullBefore = MaterializedView.read(spark, view)
      .filter(col("grp").isNull).select("n").as[Long].head()
    spark.conf.set("spark.graft.dml.changeFeed", "true")
    try Lance.deleteWhere(spark, src, "id = 50") // a NULL-group row
    finally spark.conf.unset("spark.graft.dml.changeFeed")
    MaterializedView.refresh(spark, view)
    val nullAfter = MaterializedView.read(spark, view)
      .filter(col("grp").isNull).select("n").as[Long].head()
    assert(nullAfter == nullBefore - 1,
      "the NULL group must UPDATE in place, not duplicate or stall")
    assert(MaterializedView.read(spark, view)
      .filter(col("grp").isNull).count() == 1L)
  }

  test("SQL surface: CALL create_mv / refresh_mv / set_properties") {
    val wh = tmpDir()
    spark.conf.set("spark.sql.catalog.lance_mv", "graft.catalog.LanceCatalog")
    spark.conf.set("spark.sql.catalog.lance_mv.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE lance_mv.db")
      val src = s"$wh/db/t"
      (1L to 40L).map(i => (i, s"g${i % 4}", i * 0.5)).toDF("id", "grp", "x")
        .write.format("lance").mode("overwrite").save(src)
      val created = spark.sql(
        "CALL lance_mv.system.create_mv('db.v', 'db.t', 'grp', " +
          "'count(*) AS n, sum(x) AS sx, avg(x) AS ax')").collect()(0)
      // create registers the dependent on the source first (one
      // metadata commit), so the watermark is v2 of the source
      assert(created.getAs[Long]("source_version") == 2L)
      spark.conf.set("spark.graft.dml.changeFeed", "true")
      try Lance.deleteWhere(spark, src, "id <= 8")
      finally spark.conf.unset("spark.graft.dml.changeFeed")
      val r = spark.sql("CALL lance_mv.system.refresh_mv('db.v')").collect()(0)
      assert(r.getAs[String]("mode") == "delta")
      assert(r.getAs[Long]("groups_changed") == 4L)
      val got = MaterializedView.read(spark, s"$wh/db/v")
      assert(got.agg(sum("n")).as[Long].head() == 32L)
      // properties through SQL too
      spark.sql("CALL lance_mv.system.set_properties('db.t', " +
        "\"owner = 'data-eng', tier = gold\")")
      // user keys land next to the MV-dependents registration
      def userProps() = Lance.tableProperties(spark, src)
        .filterNot(_._1.startsWith("graft."))
      assert(userProps() == Map("owner" -> "data-eng", "tier" -> "gold"))
      assert(Lance.tableProperties(spark, src)
        .contains("graft.mv.dependents"))
      spark.sql("CALL lance_mv.system.unset_properties('db.t', 'tier')")
      assert(userProps() == Map("owner" -> "data-eng"))
    } finally {
      spark.conf.unset("spark.sql.catalog.lance_mv")
      spark.conf.unset("spark.sql.catalog.lance_mv.warehouse")
    }
  }

  test("dependents registry: create registers, drop deregisters, gone views self-heal") {
    val src = tmpDir(); val v1 = tmpDir() + "/v1"; val v2 = tmpDir() + "/v2"
    (1L to 20L).map(i => (i, s"g${i % 2}", i * 1.0)).toDF("id", "grp", "x")
      .write.format("lance").mode("overwrite").save(src)
    MaterializedView.create(spark, v1, src, Seq("grp"),
      Seq(AggSpec("count", "*", "n")))
    MaterializedView.create(spark, v2, src, Seq("grp"),
      Seq(AggSpec("sum", "x", "sx")))
    val reg = manifest(src).properties.get("graft.mv.dependents").split('\n')
    assert(reg.length == 2 && reg.exists(_.endsWith("v1")) &&
      reg.exists(_.endsWith("v2")), reg.mkString(","))
    // refreshDependents refreshes both
    Seq((21L, "g0", 21.0)).toDF("id", "grp", "x")
      .write.format("lance").mode("append").save(src)
    val rs = MaterializedView.refreshDependents(spark, src)
    assert(rs.size == 2 && rs.forall(_._2.isRight), rs.toString)
    assert(MaterializedView.read(spark, v1).agg(sum("n")).as[Long].head() == 21L)
    // drop deregisters v1
    assert(MaterializedView.drop(spark, v1))
    assert(manifest(src).properties.get("graft.mv.dependents") ==
      new java.io.File(v2).getAbsolutePath)
    // a view deleted OUT-OF-BAND self-heals out of the registry
    val (vfs, vroot) = (graft.format.LanceFormat.fileSystem(
      new org.apache.hadoop.fs.Path(v2), spark.sessionState.newHadoopConf()),
      new org.apache.hadoop.fs.Path(v2))
    vfs.delete(vroot, true)
    val rs2 = MaterializedView.refreshDependents(spark, src)
    assert(rs2.size == 1 && rs2.head._2.isLeft)
    assert(!manifest(src).properties.getOrElse(Map.empty)
      .contains("graft.mv.dependents"))
  }

  test("write.refresh-mvs: batch appends keep registered views fresh in-commit") {
    val src = tmpDir(); val view = tmpDir() + "/v"
    (1L to 10L).map(i => (i, s"g${i % 2}", i * 1.0)).toDF("id", "grp", "x")
      .write.format("lance").mode("overwrite").save(src)
    MaterializedView.create(spark, view, src, Seq("grp"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "x", "sx")))
    (11L to 30L).map(i => (i, s"g${i % 2}", i * 1.0)).toDF("id", "grp", "x")
      .write.format("lance").mode("append")
      .option("write.refresh-mvs", "true").save(src)
    // no manual refresh: the write itself maintained the view
    val got = MaterializedView.read(spark, view)
    assert(got.agg(sum("n")).as[Long].head() == 30L)
    assert(manifest(view).properties.get("graft.mv.version") ==
      manifest(src).version.toString)
  }

  test("write.refresh-mvs: streaming epochs maintain the view too") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val src = tmpDir() + "/src"; val view = tmpDir() + "/v"
    val ckpt = tmpDir() + "/ckpt"
    (1L to 10L).map(i => (i, s"g${i % 2}", i * 1.0)).toDF("id", "grp", "x")
      .write.format("lance").mode("overwrite").save(src)
    MaterializedView.create(spark, view, src, Seq("grp"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "x", "sx")))
    val in = MemoryStream[(Long, String, Double)](spark)
    val q = in.toDF().toDF("id", "grp", "x")
      .writeStream.format("lance")
      .option("checkpointLocation", ckpt)
      .option("write.refresh-mvs", "true")
      .option("path", src).start()
    try {
      in.addData((11L, "g0", 11.0), (12L, "g1", 12.0))
      q.processAllAvailable()
      in.addData((13L, "g0", 13.0))
      q.processAllAvailable()
    } finally q.stop()
    // every epoch maintained the view in-commit: no manual refresh
    assert(MaterializedView.read(spark, view)
      .agg(sum("n")).as[Long].head() == 13L)
    assert(manifest(view).properties.get("graft.mv.version") ==
      manifest(src).version.toString)
  }

  test("delimiter-bearing aliases and group columns refuse at create") {
    intercept[IllegalArgumentException](AggSpec("sum", "c", "a:b"))
    intercept[IllegalArgumentException](AggSpec("sum", "c", "a\nb"))
    intercept[IllegalArgumentException](AggSpec("sum", "c\nd", "ok"))
    val src = tmpDir()
    (1L to 5L).map(i => (i, i * 1.0)).toDF("id", "x")
      .write.format("lance").mode("overwrite").save(src)
    intercept[IllegalArgumentException](
      MaterializedView.create(spark, tmpDir() + "/v", src,
        Seq("a,b"), Seq(AggSpec("count", "*", "n"))))
  }

  test("optimize refreshes dependent views (nightly-maintenance loop)") {
    val src = tmpDir(); val view = tmpDir() + "/v"
    (1L to 20L).map(i => (i, s"g${i % 2}", i * 1.0)).toDF("id", "grp", "x")
      .write.format("lance").mode("overwrite").save(src)
    MaterializedView.create(spark, view, src, Seq("grp"),
      Seq(AggSpec("count", "*", "n")))
    (21L to 30L).map(i => (i, s"g${i % 2}", i * 1.0)).toDF("id", "grp", "x")
      .write.format("lance").mode("append").save(src) // NOT maintained
    val r = Lance.optimize(spark, src)
    assert(r.viewsRefreshed == 1 && r.viewsStale == 0, r.toString)
    assert(MaterializedView.read(spark, view)
      .agg(sum("n")).as[Long].head() == 30L)
  }

  test("out-of-band writes to the view fail the next refresh loud") {
    val src = tmpDir(); val view = tmpDir() + "/v"
    (1L to 10L).map(i => (i, "g", i * 1.0)).toDF("id", "grp", "x")
      .write.format("lance").mode("overwrite").save(src)
    MaterializedView.create(spark, view, src, Seq("grp"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "x", "sx")))
    // corrupt the stored state: claim the group holds only 1 row
    val bad = spark.read.format("lance").load(view)
      .withColumn("_mv_n", lit(1L)).withColumn("n", lit(1L))
    bad.write.format("lance").mode("overwrite").save(view)
    spark.conf.set("spark.graft.dml.changeFeed", "true")
    try Lance.deleteWhere(spark, src, "id <= 5") // -5 rows on a claimed 1
    finally spark.conf.unset("spark.graft.dml.changeFeed")
    val e = intercept[IllegalArgumentException](
      MaterializedView.refresh(spark, view))
    assert(e.getMessage.contains("negative group count"))
    // fullRefresh is the documented way out
    val r = MaterializedView.fullRefresh(spark, view)
    assert(r.mode == "full")
    val got = MaterializedView.read(spark, view)
    assert(got.select("n").as[Long].head() == 5L)
  }
}
