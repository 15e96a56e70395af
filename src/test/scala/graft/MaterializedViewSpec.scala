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
    // assert(cond, clue) evaluates the clue EAGERLY — build the dump
    // only on an actual mismatch (it costs two sorts + collects)
    if (!(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)) {
      val key = a.columns.head
      fail(s"$hint:\nview:\n${a.orderBy(key).collect().mkString("\n")}\n" +
        s"recompute:\n${b.orderBy(key).collect().mkString("\n")}")
    }
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
      // expression + count_distinct aggregates parse through the CALL
      // surface too (depth-aware split keeps the expression's commas)
      spark.sql(
        "CALL lance_mv.system.create_mv('db.v2', 'db.t', 'grp', " +
          "'sum(x * (1 + x)) AS sx2, count_distinct(id) AS dc, " +
          "min(least(x, 0.5)) AS mn')")
      val v2 = MaterializedView.read(spark, s"$wh/db/v2")
      assert(v2.columns.toSeq == Seq("grp", "sx2", "dc", "mn"))
      assert(v2.count() == 4L)
      // star dims through the CALL surface: group by a DIM column
      (0 to 3).map(k => (s"g$k", s"tier${k % 2}")).toDF("dgrp", "tier")
        .write.format("lance").mode("overwrite").save(s"$wh/db/d")
      spark.sql("CALL lance_mv.system.create_mv('db.v3', 'db.t', 'tier', " +
        "'count(*) AS n, sum(x) AS sx', '', 'db.d|grp=dgrp')")
      val v3 = MaterializedView.read(spark, s"$wh/db/v3")
      assert(v3.columns.toSeq == Seq("tier", "n", "sx"))
      assert(v3.agg(sum("n")).as[Long].head() == 32L) // ids <= 8 deleted above
      assert(v3.count() == 2L)
      // CALL drop_mv unregisters (source AND dim) and deletes
      assert(spark.sql("CALL lance_mv.system.drop_mv('db.v3')")
        .collect()(0).getAs[Boolean]("existed"))
      assert(!new java.io.File(s"$wh/db/v3/_versions").exists())
      assert(!Lance.tableProperties(spark, s"$wh/db/d")
        .contains("graft.mv.dim-dependents"))
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

  test("decimal sum/avg keep exact decimal state (no long truncation)") {
    val src = tmpDir(); val view = tmpDir() + "/v"
    (1L to 100L).map(i => (i, s"g${i % 4}", BigDecimal(i) * 0.25 + 0.01))
      .toDF("id", "grp", "amt")
      .select(col("id"), col("grp"), col("amt").cast("decimal(12,2)").as("amt"))
      .write.format("lance").mode("overwrite").save(src)
    MaterializedView.create(spark, view, src, Seq("grp"), Seq(
      AggSpec("sum", "amt", "sa"), AggSpec("avg", "amt", "aa")))
    def expect() = spark.read.format("lance").load(src).groupBy("grp").agg(
      sum(col("amt")).cast("decimal(38,2)").as("sa"),
      (sum(col("amt")).cast("double") / count(col("amt"))).as("aa"))
    assertSame(MaterializedView.read(spark, view), expect(),
      "decimal sums truncated at create")
    // 0.01 per row would vanish entirely under a long-cast state
    assert(MaterializedView.read(spark, view)
      .agg(sum(col("sa"))).collect()(0).getDecimal(0)
      .compareTo(new java.math.BigDecimal("1263.50")) == 0)
    spark.conf.set("spark.graft.dml.changeFeed", "true")
    try {
      Lance.deleteWhere(spark, src, "id % 7 = 3")
      Lance.updateWhere(spark, src, "id % 11 = 5",
        Map("amt" -> "cast(amt * 3 as decimal(12,2))"))
    } finally spark.conf.unset("spark.graft.dml.changeFeed")
    assert(MaterializedView.refresh(spark, view).mode == "delta")
    assertSame(MaterializedView.read(spark, view), expect(),
      "decimal delta refresh drifted from recompute")
  }

  test("expression aggregates: sum(price * (1 - disc)) delta-refreshes exactly") {
    val src = tmpDir(); val view = tmpDir() + "/v"
    (1L to 200L).map(i => (i, s"g${i % 5}", i * 0.5, (i % 10) * 0.01, i))
      .toDF("id", "grp", "price", "disc", "qty")
      .repartition(3).write.format("lance").mode("overwrite").save(src)
    MaterializedView.create(spark, view, src, Seq("grp"), Seq(
      AggSpec("sum", "price * (1 - disc)", "rev", scale = 4),
      AggSpec("sum", "qty * 2", "q2"),
      AggSpec("count", "*", "n")))
    def expect() = spark.read.format("lance").load(src).groupBy("grp").agg(
      Tables.dsum(expr("price * (1 - disc)"), scale = 4).as("rev"),
      sum(expr("qty * 2")).as("q2"), count(lit(1)).as("n"))
    assertSame(MaterializedView.read(spark, view), expect(), "expr seed")
    spark.conf.set("spark.graft.dml.changeFeed", "true")
    try {
      Lance.deleteWhere(spark, src, "id % 6 = 1")
      Lance.updateWhere(spark, src, "id % 9 = 2",
        Map("price" -> "price * 2", "disc" -> "0.5"))
    } finally spark.conf.unset("spark.graft.dml.changeFeed")
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "delta", s"expression sums stay on the delta path: $r")
    assertSame(MaterializedView.read(spark, view), expect(),
      "expression delta refresh drifted from recompute")
  }

  test("count_distinct views: sketches union on inserts, rescan on removal") {
    val src = tmpDir(); val view = tmpDir() + "/v"
    (1L to 300L).map(i => (i, s"g${i % 3}", s"u${i % 37}"))
      .toDF("id", "grp", "user")
      .repartition(3).write.format("lance").mode("overwrite").save(src)
    MaterializedView.create(spark, view, src, Seq("grp"), Seq(
      AggSpec("count_distinct", "user", "du"), AggSpec("count", "*", "n")))
    def exact(): Map[String, Long] = spark.read.format("lance").load(src)
      .groupBy("grp").agg(countDistinct(col("user")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def got(): Map[String, Long] = MaterializedView.read(spark, view)
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Long]("du")).toMap
    def close(hint: String): Unit = {
      val (e, g) = (exact(), got())
      assert(e.keySet == g.keySet, s"$hint: groups differ: $e vs $g")
      e.foreach { case (k, ev) =>
        assert(math.abs(g(k) - ev) <= math.max(1L, (ev * 0.05).toLong),
          s"$hint: group $k estimate ${g(k)} vs exact $ev")
      }
    }
    close("create")
    // insert-only window: new users + re-seen users, DELTA path (union)
    (301L to 400L).map(i => (i, s"g${i % 3}", s"u${i % 61}"))
      .toDF("id", "grp", "user")
      .write.format("lance").mode("append").save(src)
    val r1 = MaterializedView.refresh(spark, view)
    assert(r1.mode == "delta", s"insert-only windows must union sketches: $r1")
    close("insert-only delta")
    // a removal can't un-merge: the window rescans affected groups
    spark.conf.set("spark.graft.dml.changeFeed", "true")
    try Lance.deleteWhere(spark, src, "user = 'u5'")
    finally spark.conf.unset("spark.graft.dml.changeFeed")
    val r2 = MaterializedView.refresh(spark, view)
    assert(r2.mode == "groups", s"removals must rescan: $r2")
    close("post-removal rescan")
    // non-sketchable type refuses at create
    val e = intercept[IllegalArgumentException](MaterializedView.create(
      spark, tmpDir() + "/v2", src, Seq("grp"),
      Seq(AggSpec("count_distinct", "id * 0.5", "dd"))))
    assert(e.getMessage.contains("HLL sketch admits"))
  }

  test("refreshDependents shares ONE feed materialization across same-window views") {
    val src = tmpDir()
    (1L to 60L).map(i => (i, s"g${i % 3}", i * 1.0)).toDF("id", "grp", "x")
      .write.format("lance").mode("overwrite").save(src)
    val views = (1 to 3).map { i =>
      val vp = tmpDir() + s"/v$i"
      MaterializedView.create(spark, vp, src, Seq("grp"),
        Seq(AggSpec("count", "*", "n"), AggSpec("sum", "x", "sx")))
      vp
    }
    // all three views now share the same watermark window
    // (creates registered sequentially: v1 at reg1, v2 at reg2, v3 at
    // reg3 — NOT identical; refresh them once to align the watermarks)
    MaterializedView.refreshDependents(spark, src)
    (61L to 80L).map(i => (i, s"g${i % 3}", i * 1.0)).toDF("id", "grp", "x")
      .write.format("lance").mode("append").save(src)
    MaterializedView.feedMaterializations = 0
    val rs = MaterializedView.refreshDependents(spark, src)
    assert(rs.size == 3 && rs.forall(_._2.isRight), rs.toString)
    assert(MaterializedView.feedMaterializations == 1,
      s"3 same-window views must share 1 feed scan, " +
        s"got ${MaterializedView.feedMaterializations}")
    views.foreach { vp =>
      assert(MaterializedView.read(spark, vp)
        .agg(sum("n")).as[Long].head() == 80L, vp)
    }
  }

  test("star views: pinned dim enrichment; vacuum-proof pin; fullRefresh repins") {
    import MaterializedView.DimSpec
    val src = tmpDir(); val dim = tmpDir() + "/d"; val view = tmpDir() + "/v"
    (1L to 100L).map(i => (i, i % 10, i * 1.0)).toDF("id", "cust", "amt")
      .write.format("lance").mode("overwrite").save(src)
    (0L to 9L).map(k => (k, s"seg${k % 3}")).toDF("cust_k", "seg")
      .write.format("lance").mode("overwrite").save(dim)
    MaterializedView.create(spark, view, src, Seq("seg"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "amt", "sa")),
      dims = Seq(DimSpec(dim, Map("cust" -> "cust_k"))))
    def expect() = spark.read.format("lance").load(src)
      .join(spark.read.format("lance").load(dim)
        .withColumnRenamed("cust_k", "cust"), Seq("cust"), "left")
      .groupBy("seg")
      .agg(count(lit(1)).as("n"), Tables.dsum(col("amt")).as("sa"))
      .select("seg", "n", "sa")
    assertSame(MaterializedView.read(spark, view), expect(), "star seed")
    // the pin is a TAG: a dim-side retention vacuum keeps the snapshot
    (10L to 25L).map(k => (k, s"seg${k % 3}")).toDF("cust_k", "seg")
      .write.format("lance").mode("append").save(dim)
    Lance.vacuum(spark, dim, keepVersions = 1)
    assert(Lance.versions(spark, dim).size == 2,
      "the mv-pin tag must keep the pinned dim version")
    // fact-side DML refreshes by DELTA; the dim APPEND above does not
    // affect enrichment (pinned snapshot)
    spark.conf.set("spark.graft.dml.changeFeed", "true")
    try {
      Lance.deleteWhere(spark, src, "id % 7 = 1")
      Lance.updateWhere(spark, src, "id % 7 = 2", Map("amt" -> "amt * 2"))
    } finally spark.conf.unset("spark.graft.dml.changeFeed")
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "delta", s"star views keep the delta path: $r")
    assertSame(MaterializedView.read(spark, view), expect(),
      "star delta refresh drifted (dim columns came from the pinned join)")
    // a dim UPDATE is invisible to incremental refresh (snapshot
    // semantics); fullRefresh RE-PINS and picks it up
    Lance.updateWhere(spark, dim, "cust_k = 3", Map("seg" -> "'segNEW'"))
    Lance.upsert(spark, src, Seq((1001L, 3L, 5.0)).toDF("id", "cust", "amt"),
      Seq("id"))
    MaterializedView.refresh(spark, view)
    assert(MaterializedView.read(spark, view)
      .filter(col("seg") === "segNEW").isEmpty,
      "incremental refresh must keep the CREATE-time dim snapshot")
    assert(MaterializedView.fullRefresh(spark, view).mode == "full")
    assertSame(MaterializedView.read(spark, view), expect(),
      "fullRefresh must re-pin the dims and rebuild against them")
    assert(MaterializedView.read(spark, view)
      .filter(col("seg") === "segNEW").count() > 0)
    // collisions and guards
    intercept[IllegalArgumentException](MaterializedView.create(
      spark, tmpDir() + "/v2", src, Seq("seg"),
      Seq(AggSpec("count", "*", "n")),
      dims = Seq(DimSpec(dim, Map("amt" -> "cust_k"))))) // type mismatch
    val eAlter = intercept[Exception](
      Lance.renameColumn(spark, dim, "seg", "segment"))
    assert(eAlter.getMessage.contains("registered dependent"))
    // drop releases the dim tag and the guard registration
    assert(MaterializedView.drop(spark, view))
    assert(Lance.tags(spark, dim).isEmpty, "drop must release the pin tag")
    Lance.renameColumn(spark, dim, "seg", "segment") // now free
  }

  test("views stack: a rollup view can source another view") {
    val src = tmpDir(); val vA = tmpDir() + "/a"; val vB = tmpDir() + "/b"
    (1L to 400L).map(i => (i, s"g${i % 4}", s"s${i % 10}", i * 0.5))
      .toDF("id", "grp", "sub", "x")
      .repartition(3).write.format("lance").mode("overwrite").save(src)
    // A: fine-grained (grp, sub) aggregate of the source
    MaterializedView.create(spark, vA, src, Seq("grp", "sub"),
      Seq(AggSpec("count", "*", "cnt"), AggSpec("sum", "x", "sx")))
    // B: rollup of A to grp — A's refresh commits are ordinary
    // fragment-level changes, so B's feed is exact (delete+insert pairs
    // of rewritten state rows) and its delta arithmetic just works
    MaterializedView.create(spark, vB, vA, Seq("grp"),
      Seq(AggSpec("sum", "cnt", "rows"), AggSpec("sum", "sx", "total")))
    // exact two-level recompute: B sums A's already-rounded per-(grp,
    // sub) decimal sums, so the expectation mirrors that shape exactly
    def expectStacked() = {
      val base = spark.read.format("lance").load(src)
      base.groupBy("grp", "sub").agg(Tables.dsum(col("x")).as("sx"))
        .groupBy("grp").agg(Tables.dsum(col("sx"), 2).as("total"))
        .join(base.groupBy("grp").agg(count(lit(1)).as("rows")), Seq("grp"))
        .select("grp", "rows", "total")
    }
    def gotB() = MaterializedView.read(spark, vB)
      .select("grp", "rows", "total")
    assertSame(gotB(), expectStacked(), "stacked seed")
    // source DML -> refresh A (delta) -> refresh B (delta over A's feed)
    spark.conf.set("spark.graft.dml.changeFeed", "true")
    try {
      Lance.deleteWhere(spark, src, "id % 6 = 1")
      Lance.updateWhere(spark, src, "id % 6 = 2", Map("x" -> "x * 3"))
    } finally spark.conf.unset("spark.graft.dml.changeFeed")
    assert(MaterializedView.refresh(spark, vA).mode == "delta")
    assert(MaterializedView.refresh(spark, vB).mode == "delta")
    assertSame(gotB(), expectStacked(), "stacked delta refresh drifted")
    // optimize(A) cascades: it refreshes B (registered on A)
    (401L to 420L).map(i => (i, s"g${i % 4}", s"s${i % 10}", i * 0.5))
      .toDF("id", "grp", "sub", "x")
      .write.format("lance").mode("append").save(src)
    MaterializedView.refresh(spark, vA)
    val r = Lance.optimize(spark, vA)
    assert(r.viewsRefreshed == 1, r.toString)
    assertSame(gotB(), expectStacked(), "optimize(A) must keep the rollup fresh")
  }

  test("3-level pyramid: optimize(base) cascades in dependency order, one feed per level") {
    val src = tmpDir(); val vA = tmpDir() + "/a"; val vB = tmpDir() + "/b"
    val vC = tmpDir() + "/c"
    (1L to 600L).map(i => (i, s"g${i % 4}", s"s${i % 12}", s"u${i % 48}", i * 0.5))
      .toDF("id", "grp", "sub", "unit", "x")
      .repartition(3).write.format("lance").mode("overwrite").save(src)
    // base -> A (unit grain) -> B (sub grain) -> C (grp grain)
    MaterializedView.create(spark, vA, src, Seq("grp", "sub", "unit"),
      Seq(AggSpec("count", "*", "cnt"), AggSpec("sum", "x", "sx")))
    MaterializedView.create(spark, vB, vA, Seq("grp", "sub"),
      Seq(AggSpec("sum", "cnt", "cnt"), AggSpec("sum", "sx", "sx")))
    MaterializedView.create(spark, vC, vB, Seq("grp"),
      Seq(AggSpec("sum", "cnt", "rows"), AggSpec("sum", "sx", "total")))
    // the leaf's exact three-level recompute (each level re-rounds at
    // its own decimal grain, so mirror the stacking shape precisely)
    def expectC() = spark.read.format("lance").load(src)
      .groupBy("grp", "sub", "unit").agg(Tables.dsum(col("x")).as("sx"))
      .groupBy("grp", "sub").agg(Tables.dsum(col("sx"), 2).as("sx"))
      .groupBy("grp").agg(Tables.dsum(col("sx"), 2).as("total"))
      .join(spark.read.format("lance").load(src)
        .groupBy("grp").agg(count(lit(1)).as("rows")), Seq("grp"))
      .select("grp", "rows", "total")
    def gotC() = MaterializedView.read(spark, vC)
      .select("grp", "rows", "total")
    assertSame(gotC(), expectC(), "pyramid seed")
    // one base DML batch; ONE optimize(base) must land it in the leaf
    spark.conf.set("spark.graft.dml.changeFeed", "true")
    try {
      Lance.deleteWhere(spark, src, "id % 6 = 1")
      Lance.updateWhere(spark, src, "id % 6 = 2", Map("x" -> "x * 3"))
    } finally spark.conf.unset("spark.graft.dml.changeFeed")
    MaterializedView.feedMaterializations = 0
    val rs = MaterializedView.refreshDependents(spark, src)
    // dependency order: A strictly before B strictly before C
    assert(rs.map(_._1.split('/').last) == Seq("a", "b", "c"),
      s"cascade order broke: ${rs.map(_._1)}")
    assert(rs.forall(_._2.isRight), rs.toString)
    assert(rs.flatMap(_._2.toOption).forall(_.mode == "delta"), rs.toString)
    // exactly one feed materialization per level (base->A, A->B, B->C)
    assert(MaterializedView.feedMaterializations == 3,
      s"expected 3 feed materializations, got " +
        s"${MaterializedView.feedMaterializations}")
    assertSame(gotC(), expectC(), "pyramid leaf drifted after one optimize pass")
    // and through the real nightly verb: optimize(base) reports all 3
    (601L to 640L).map(i => (i, s"g${i % 4}", s"s${i % 12}", s"u${i % 48}", i * 0.5))
      .toDF("id", "grp", "sub", "unit", "x")
      .write.format("lance").mode("append").save(src)
    val opt = Lance.optimize(spark, src, reanalyze = false)
    assert(opt.viewsRefreshed == 3, opt.toString)
    assertSame(gotC(), expectC(), "pyramid leaf drifted after optimize(base)")
    // a second pass is all noops — no refresh storms from stacking
    val rs2 = MaterializedView.refreshDependents(spark, src)
    assert(rs2.flatMap(_._2.toOption).forall(_.mode == "noop"), rs2.toString)
  }

  test("star dims refuse when too big to broadcast (manifest row count)") {
    val src = tmpDir(); val dim = tmpDir() + "/d"
    (1L to 10L).map(i => (i, i % 3)).toDF("id", "cust")
      .write.format("lance").mode("overwrite").save(src)
    (0L to 9L).map(k => (k, s"s$k")).toDF("cust_k", "seg")
      .write.format("lance").mode("overwrite").save(dim)
    spark.conf.set("spark.graft.mv.maxDimRows", "5")
    try {
      val e = intercept[IllegalArgumentException](MaterializedView.create(
        spark, tmpDir() + "/v", src, Seq("seg"),
        Seq(AggSpec("count", "*", "n")),
        dims = Seq(MaterializedView.DimSpec(dim, Map("cust" -> "cust_k")))))
      assert(e.getMessage.contains("broadcasts the dim"), e.getMessage)
    } finally spark.conf.unset("spark.graft.mv.maxDimRows")
  }

  test("create refuses bad aggregate arguments (type, resolution, shape)") {
    val src = tmpDir()
    (1L to 5L).map(i => (i, s"s$i", i * 1.0)).toDF("id", "name", "x")
      .write.format("lance").mode("overwrite").save(src)
    // sum over a string column: the silent-truncation family, refused
    val e1 = intercept[IllegalArgumentException](MaterializedView.create(
      spark, tmpDir() + "/v", src, Seq("id"),
      Seq(AggSpec("sum", "name", "s"))))
    assert(e1.getMessage.contains("not numeric"))
    // unresolvable expression
    intercept[IllegalArgumentException](MaterializedView.create(
      spark, tmpDir() + "/v", src, Seq("id"),
      Seq(AggSpec("sum", "nope + 1", "s"))))
    // nested aggregate and nondeterministic expressions change semantics
    val e3 = intercept[IllegalArgumentException](MaterializedView.create(
      spark, tmpDir() + "/v", src, Seq("id"),
      Seq(AggSpec("sum", "sum(x)", "s"))))
    assert(e3.getMessage.contains("may not itself aggregate"))
    val e4 = intercept[IllegalArgumentException](MaterializedView.create(
      spark, tmpDir() + "/v", src, Seq("id"),
      Seq(AggSpec("sum", "x + rand()", "s"))))
    assert(e4.getMessage.contains("nondeterministic"))
  }

  test("a refreshDependents racing create cannot deregister the new view") {
    val src = tmpDir(); val view = tmpDir() + "/v"
    (1L to 20L).map(i => (i, s"g${i % 2}", i * 1.0)).toDF("id", "grp", "x")
      .write.format("lance").mode("overwrite").save(src)
    // the seam fires BETWEEN the registration commit and the view
    // materialization — exactly where a concurrent write.refresh-mvs (or
    // nightly optimize) used to observe "no lance dataset" and
    // permanently de-register the view being created
    var raced: Seq[(String, Either[String, MaterializedView.RefreshResult])] = Nil
    MaterializedView.testHookAfterRegister = () => {
      raced = MaterializedView.refreshDependents(spark, src)
      MaterializedView.testHookAfterRegister = () => () // only the outer create
    }
    try MaterializedView.create(spark, view, src, Seq("grp"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "x", "sx")))
    finally MaterializedView.testHookAfterRegister = () => ()
    assert(raced.size == 1 && raced.head._2.isLeft, raced.toString)
    // the end state is REGISTERED: in-commit maintenance still covers the
    // view and the retention vacuum still pins its feed window
    val reg = manifest(src).properties.getOrElse(Map.empty)
      .getOrElse("graft.mv.dependents", "")
    assert(reg.split('\n').contains(new java.io.File(view).getAbsolutePath),
      s"view lost its registration to the racing self-heal: '$reg'")
    // and the next maintenance pass actually refreshes it
    Seq((21L, "g0", 21.0)).toDF("id", "grp", "x")
      .write.format("lance").mode("append").save(src)
    val rs = MaterializedView.refreshDependents(spark, src)
    assert(rs.size == 1 && rs.head._2.isRight, rs.toString)
    assert(MaterializedView.read(spark, view)
      .agg(sum("n")).as[Long].head() == 21L)
  }

  test("ALTER RENAME/DROP refuse columns a registered dependent references") {
    val wh = tmpDir()
    spark.conf.set("spark.sql.catalog.mv_alt", "graft.catalog.LanceCatalog")
    spark.conf.set("spark.sql.catalog.mv_alt.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE mv_alt.db")
      val src = s"$wh/db/t"
      (1L to 20L).map(i => (i, s"g${i % 2}", i * 1.0, i * 2.0, i))
        .toDF("id", "grp", "price", "disc", "extra")
        .write.format("lance").mode("overwrite").save(src)
      MaterializedView.create(spark, tmpDir() + "/v", src, Seq("grp"), Seq(
        AggSpec("sum", "price * (1 - disc)", "rev", scale = 4)),
        where = Some("id > 0"))
      graft.operators.Replica.create(spark, tmpDir() + "/r", src, Seq("id"))
      // group column, expression argument, WHERE column, replica key:
      // all load-bearing for the dependents' refresh — refused loud
      Seq("grp", "price", "disc", "id").foreach { c =>
        val e = intercept[Exception](
          Lance.renameColumn(spark, src, c, s"${c}2"))
        assert(e.getMessage.contains("registered dependent"), s"$c: $e")
        val e2 = intercept[Exception](spark.sql(
          s"ALTER TABLE mv_alt.db.t DROP COLUMN $c"))
        assert(e2.getMessage.contains("registered dependent"), s"drop $c: $e2")
      }
      // an unreferenced column renames and drops freely
      Lance.renameColumn(spark, src, "extra", "extra2")
      spark.sql("ALTER TABLE mv_alt.db.t DROP COLUMN extra2")
      assert(!spark.read.format("lance").load(src)
        .columns.contains("extra2"))
    } finally {
      spark.conf.unset("spark.sql.catalog.mv_alt")
      spark.conf.unset("spark.sql.catalog.mv_alt.warehouse")
    }
  }

  test("parseGroupKey: top-level AS only, quote- and paren-aware") {
    import MaterializedView.{parseGroupKey => p}
    assert(p("grp") == MaterializedView.GroupKey("grp", "grp"))
    assert(p("  upper(grp) AS ugrp ") ==
      MaterializedView.GroupKey("upper(grp)", "ugrp"))
    // the inner cast-AS sits at depth 1: not a split point
    assert(p("cast(id % 3 AS string) AS bucket") ==
      MaterializedView.GroupKey("cast(id % 3 AS string)", "bucket"))
    // an AS inside a string literal is content, not structure
    assert(p("concat(grp, ' AS x') AS label") ==
      MaterializedView.GroupKey("concat(grp, ' AS x')", "label"))
    // the LAST top-level AS wins (left side may nest CASE ... AS-free
    // but a projected sub-expression could alias internally)
    assert(p("a AS b AS c") == MaterializedView.GroupKey("a AS b", "c"))
    intercept[IllegalArgumentException](p("upper(grp) AS _hidden"))
    intercept[IllegalArgumentException](p("upper(grp) AS a,b"))
  }

  test("expression group keys: rollup view delta-refreshes exactly") {
    val src = tmpDir(); val view = tmpDir() + "/v"
    seed(src)
    MaterializedView.create(spark, view, src,
      Seq("upper(grp) AS ugrp", "cast(id % 3 AS string) AS bucket"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "price", "sum_price")))
    // the stored face uses the aliases; the expr rides its own property
    val props = manifest(view).properties.get
    assert(props("graft.mv.group-by") == "ugrp,bucket")
    assert(props("graft.mv.group-exprs") ==
      "ugrp:upper(grp)\nbucket:cast(id % 3 AS string)")
    mixedDml(src)
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "delta", s"sum/count views keep the delta path: $r")
    val got = MaterializedView.read(spark, view)
    val expect = spark.read.format("lance").load(src)
      .groupBy(upper(col("grp")).as("ugrp"),
        expr("cast(id % 3 AS string)").as("bucket"))
      .agg(count(lit(1)).as("n"), Tables.dsum(col("price")).as("sum_price"))
    assertSame(got, expect, "expression-key delta refresh != recompute")
  }

  test("expression group keys: min/max views rescan scoped groups exactly") {
    val src = tmpDir(); val view = tmpDir() + "/v"
    seed(src)
    MaterializedView.create(spark, view, src,
      Seq("upper(grp) AS ugrp"),
      Seq(AggSpec("min", "price", "min_price"),
        AggSpec("max", "qty", "max_qty")))
    mixedDml(src) // removals present: the scoped-group path
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "groups", s"min/max + removals must rescan groups: $r")
    val got = MaterializedView.read(spark, view)
    val expect = spark.read.format("lance").load(src)
      .groupBy(upper(col("grp")).as("ugrp"))
      .agg(min(col("price")).as("min_price"), max(col("qty")).as("max_qty"))
    assertSame(got, expect, "expression-key scoped rescan != recompute")
    // and a fullRefresh converges to the same answer
    MaterializedView.fullRefresh(spark, view)
    assertSame(MaterializedView.read(spark, view), expect,
      "fullRefresh of an expression-key view drifted")
  }

  test("expression group keys refuse bad shapes at create") {
    val src = tmpDir()
    seed(src)
    def bad(key: String): Exception =
      intercept[Exception](MaterializedView.create(spark,
        tmpDir() + "/v", src, Seq(key), Seq(AggSpec("count", "*", "n"))))
    // alias shadows a source column: withKeys would silently replace it
    assert(bad("upper(grp) AS price").getMessage.contains("shadows"))
    // nondeterministic: refresh paths would key images differently
    assert(bad("cast(rand() AS string) AS r").getMessage
      .contains("nondeterministic"))
    // aggregates/windows change the row-per-row delta semantics
    assert(bad("cast(sum(id) AS string) AS s").getMessage
      .contains("aggregate"))
    // unresolvable
    assert(bad("upper(nope) AS u").getMessage.contains("resolve"))
  }

  test("ALTER RENAME refuses a column a group EXPRESSION references") {
    val src = tmpDir()
    seed(src)
    MaterializedView.create(spark, tmpDir() + "/v", src,
      Seq("upper(grp) AS ugrp"), Seq(AggSpec("count", "*", "n")))
    val e = intercept[Exception](Lance.renameColumn(spark, src, "grp", "g2"))
    assert(e.getMessage.contains("registered dependent"), e.getMessage)
    // a column no key/agg/where references still renames freely
    Lance.renameColumn(spark, src, "qty", "qty2")
    assert(spark.read.format("lance").load(src).columns.contains("qty2"))
  }

  test("SQL surface: CALL create_mv takes expression group keys") {
    val wh = tmpDir()
    spark.conf.set("spark.sql.catalog.mv_gx", "graft.catalog.LanceCatalog")
    spark.conf.set("spark.sql.catalog.mv_gx.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE mv_gx.db")
      val src = s"$wh/db/t"
      (1L to 40L).map(i => (i, s"g${i % 4}", i * 0.5)).toDF("id", "grp", "x")
        .write.format("lance").mode("overwrite").save(src)
      // the group argument's commas inside parens survive the split
      spark.sql("CALL mv_gx.system.create_mv('db.v', 'db.t', " +
        "'concat(grp, cast(id % 3 AS string)) AS gb', 'count(*) AS n')")
      val got = MaterializedView.read(spark, s"$wh/db/v")
      assert(got.columns.toSeq == Seq("gb", "n"))
      assert(got.count() == 12L) // 4 grp values x 3 residues (coprime)
    } finally {
      spark.conf.unset("spark.sql.catalog.mv_gx")
      spark.conf.unset("spark.sql.catalog.mv_gx.warehouse")
    }
  }

  test("a rejected WHERE refuses BEFORE any dim pin or registration lands") {
    val src = tmpDir(); val dim = tmpDir()
    seed(src)
    (0 until 10).map(i => (s"g$i", s"seg${i % 3}")).toDF("grp", "segment")
      .toDF().write.format("lance").mode("overwrite").save(dim)
    val e = intercept[Exception](MaterializedView.create(spark,
      tmpDir() + "/v", src, Seq("segment"),
      Seq(AggSpec("count", "*", "n")),
      where = Some("no_such_col > 0"),
      dims = Seq(MaterializedView.DimSpec(dim, Map("grp" -> "grp")))))
    assert(e.getMessage.contains("WHERE"), e.getMessage)
    // no side effect leaked: a dim pin tag has no self-heal, so it must
    // never land for a view that was refused
    assert(Lance.tags(spark, dim).isEmpty, "leaked dim pin tag")
    assert(!manifest(dim).properties.getOrElse(Map.empty)
      .contains("graft.mv.dim-dependents"), "leaked dim registration")
    assert(!manifest(src).properties.getOrElse(Map.empty)
      .contains("graft.mv.dependents"), "leaked source registration")
  }

  test("plain group columns with a leading underscore keep working") {
    val src = tmpDir(); val view = tmpDir() + "/v"
    (1L to 100L).map(i => (s"u${i % 5}", i * 1.0)).toDF("_tenant", "x")
      .write.format("lance").mode("overwrite").save(src)
    // a plain key only references an existing column: any non-_mv_ name
    // is legal (and pre-expression-key views must keep decoding)
    MaterializedView.create(spark, view, src, Seq("_tenant"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "x", "sx")))
    spark.conf.set("spark.graft.dml.changeFeed", "true")
    try Lance.deleteWhere(spark, src, "x <= 10")
    finally spark.conf.unset("spark.graft.dml.changeFeed")
    assert(MaterializedView.refresh(spark, view).mode == "delta")
    val expect = spark.read.format("lance").load(src).groupBy("_tenant")
      .agg(count(lit(1)).as("n"), Tables.dsum(col("x")).as("sx"))
    assertSame(MaterializedView.read(spark, view), expect,
      "underscore-keyed view drifted")
  }

  test("stale dim registrations heal on optimize; missing datasets never do") {
    val src = tmpDir(); val dim = tmpDir(); val view = tmpDir() + "/v"
    seed(src)
    (0 until 10).map(i => (s"g$i", s"seg${i % 3}")).toDF("grp", "segment")
      .write.format("lance").mode("overwrite").save(dim)
    MaterializedView.create(spark, view, src, Seq("segment"),
      Seq(AggSpec("count", "*", "n")),
      dims = Seq(MaterializedView.DimSpec(dim, Map("grp" -> "grp"))))
    assert(Lance.tags(spark, dim).size == 1)
    // the view path is recreated as a PLAIN table (out of band): the
    // dim registration is now provably stale
    val vroot = new Path(new java.io.File(view).getAbsolutePath)
    LanceFormat.fileSystem(vroot, spark.sessionState.newHadoopConf())
      .delete(vroot, true)
    Seq((1L, "x")).toDF("a", "b")
      .write.format("lance").mode("overwrite").save(view)
    // fsck sees it; optimize heals it (tag + registration released)
    assert(Lance.fsck(spark, dim).exists(_.what.contains("does not reference")))
    Lance.optimize(spark, dim, reanalyze = false)
    assert(Lance.tags(spark, dim).isEmpty, "stale mv-pin tag not released")
    assert(!manifest(dim).properties.getOrElse(Map.empty)
      .contains("graft.mv.dim-dependents"))
    assert(Lance.fsck(spark, dim).isEmpty)
    // a registration whose view path holds NO dataset is LEFT alone —
    // it may be a create in flight (pins must not be stripped from
    // under it); fsck names the manual recovery instead
    val (dfs, droot) = {
      val r = new Path(dim)
      (LanceFormat.fileSystem(r, spark.sessionState.newHadoopConf()), r)
    }
    val ghost = tmpDir() + "/never-created"
    LanceFormat.commitPropertiesWith(dfs, droot, { prev =>
      prev + ("graft.mv.dim-dependents" ->
        new java.io.File(ghost).getAbsolutePath)
    })
    Lance.optimize(spark, dim, reanalyze = false)
    assert(manifest(dim).properties.getOrElse(Map.empty)
      .contains("graft.mv.dim-dependents"),
      "a missing-dataset registration must never auto-heal")
    assert(Lance.fsck(spark, dim).exists(_.what.contains("mv-pin tag")))
  }

  test("lance_dependents reports a hijacked registration as stale, not negative lag") {
    val src = tmpDir(); val view = tmpDir() + "/v"
    seed(src)
    MaterializedView.create(spark, view, src, Seq("grp"),
      Seq(AggSpec("count", "*", "n")))
    // recreate the view path as a view of a DIFFERENT source (its
    // watermark now indexes the other table's history)
    val other = tmpDir()
    (1L to 500L).map(i => (i, s"h${i % 4}", 0.0, i))
      .toDF("id", "grp", "price", "qty")
      .write.format("lance").mode("overwrite").save(other)
    val vroot = new Path(new java.io.File(view).getAbsolutePath)
    LanceFormat.fileSystem(vroot, spark.sessionState.newHadoopConf())
      .delete(vroot, true)
    MaterializedView.create(spark, view, other, Seq("grp"),
      Seq(AggSpec("count", "*", "n")))
    graft.MetaTvfs.register(spark)
    val row = spark.sql(s"SELECT * FROM lance_dependents('$src')").collect()
    assert(row.length == 1 && row(0).getAs[String]("role") == "stale" &&
      row(0).isNullAt(row(0).fieldIndex("versions_behind")),
      row.mkString(","))
  }

  test("create refuses a table registered as both join and dim (pin-eviction race)") {
    val src = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    (1L to 20L).map(i => (i, s"g${i % 2}", i * 1.0)).toDF("okey", "grp", "x")
      .write.format("lance").mode("overwrite").save(src)
    (1L to 20L).map(i => (i, s"t${i % 3}", i * 0.5))
      .toDF("o_key", "tag", "amount")
      .write.format("lance").mode("overwrite").save(b)
    // same table as JOIN and DIM: roleAndWatermark would report "join"
    // (checked first), so the dim self-heal would strip the mv-pin tag
    // and a vacuum could reclaim the pinned snapshot — refuse at create
    val e1 = intercept[IllegalArgumentException](
      MaterializedView.create(spark, view, src, Seq("grp"),
        Seq(AggSpec("count", "*", "n")),
        joins = Seq(MaterializedView.JoinSpec(b, Map("okey" -> "o_key"))),
        dims = Seq(MaterializedView.DimSpec(b, Map("grp" -> "tag")))))
    assert(e1.getMessage.contains("dim tables must be distinct"))
    // the source as a dim is the same hazard (role "source" wins)
    val e2 = intercept[IllegalArgumentException](
      MaterializedView.create(spark, view, src, Seq("grp"),
        Seq(AggSpec("count", "*", "n")),
        dims = Seq(MaterializedView.DimSpec(src, Map("grp" -> "grp")))))
    assert(e2.getMessage.contains("dim tables must be distinct"))
    // nothing registered, no pin tags left behind by the refusals
    assert(!manifest(src).properties.getOrElse(Map.empty)
      .contains("graft.mv.dependents"))
    assert(Lance.tags(spark, b).isEmpty && Lance.tags(spark, src).isEmpty)
  }

  test("a view recreated against a different source deregisters instead of re-refreshing") {
    val src = tmpDir(); val other = tmpDir(); val view = tmpDir() + "/v"
    seed(src); seed(other)
    MaterializedView.create(spark, view, src, Seq("grp"),
      Seq(AggSpec("count", "*", "n")))
    // hijack: recreate the view path against `other`
    val vroot = new Path(new java.io.File(view).getAbsolutePath)
    LanceFormat.fileSystem(vroot, spark.sessionState.newHadoopConf())
      .delete(vroot, true)
    MaterializedView.create(spark, view, other, Seq("grp"),
      Seq(AggSpec("count", "*", "n")))
    // advance BOTH tables so a refresh from either side would commit
    spark.conf.set("spark.graft.dml.changeFeed", "true")
    try {
      Seq((1001L, "g1", 1.0, 1L)).toDF("id", "grp", "price", "qty")
        .write.format("lance").mode("append").save(src)
      Seq((1001L, "g1", 1.0, 1L)).toDF("id", "grp", "price", "qty")
        .write.format("lance").mode("append").save(other)
    } finally spark.conf.unset("spark.graft.dml.changeFeed")
    val vBefore = manifest(view).version
    // src's maintenance pass must NOT refresh other's view (that was
    // the forever-redundant refresh) and must heal the registration
    val rs = MaterializedView.refreshDependents(spark, src)
    assert(rs.size == 1, rs.toString)
    rs.head._2 match {
      case Left(m) => assert(m.contains("stale"), m)
      case Right(r) => fail(s"stale registration was refreshed: $r")
    }
    assert(manifest(view).version == vBefore,
      "the hijacked view was committed to by the WRONG table's maintenance")
    assert(!manifest(src).properties.getOrElse(Map.empty)
      .contains("graft.mv.dependents"), "stale registration not healed")
    // the view's REAL source still maintains it
    val rs2 = MaterializedView.refreshDependents(spark, other)
    assert(rs2.size == 1 && rs2.head._2.isRight, rs2.toString)
    assert(manifest(view).version > vBefore)
  }

  test("plain group columns containing ':' keep decoding (compat); expression aliases refuse") {
    val src = tmpDir(); val view = tmpDir() + "/v"
    (1L to 40L).map(i => (i, s"k:${i % 3}", i * 1.0))
      .toDF("id", "a:b", "x")
      .write.format("lance").mode("overwrite").save(src)
    // a plain column key never rides the ':'-split group-exprs property,
    // so ':' in its NAME must create, refresh and decode fine
    MaterializedView.create(spark, view, src, Seq("a:b"),
      Seq(AggSpec("sum", "x", "sx")))
    spark.conf.set("spark.graft.dml.changeFeed", "true")
    try Lance.deleteWhere(spark, src, "id % 5 = 0")
    finally spark.conf.unset("spark.graft.dml.changeFeed")
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "delta", r.toString)
    val got = MaterializedView.read(spark, view)
    val want = spark.read.format("lance").load(src)
      .groupBy(col("`a:b`")).agg(Tables.dsum(col("x")).as("sx"))
    assertSame(got, want, "':'-named plain group column view != recompute")
    // an EXPRESSION alias mints a new column that DOES ride the
    // ':'-split property — still refused
    val e = intercept[IllegalArgumentException](
      MaterializedView.create(spark, tmpDir() + "/v2", src,
        Seq("upper(`a:b`) AS c:d"), Seq(AggSpec("count", "*", "n"))))
    assert(e.getMessage.contains("may not contain ':'"))
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

  // ------------------------------------------------- history edits (r14)

  private def recomputeSeedView(src: String): DataFrame =
    spark.read.format("lance").load(src).groupBy("grp")
      .agg(count(lit(1)).as("n"), Tables.dsum(col("price")).as("sp"))

  test("source restore: refresh heals the view, never serves restored-away state") {
    val src = tmpDir(); val view = tmpDir() + "/v"
    seed(src)
    MaterializedView.create(spark, view, src, Seq("grp"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "price", "sp", 2)))
    spark.conf.set("spark.graft.dml.changeFeed", "true")
    val mid = try {
      Lance.deleteWhere(spark, src, "id % 7 = 3")
      val m = Lance.versions(spark, src).max
      assert(MaterializedView.refresh(spark, view).mode == "delta")
      Lance.updateWhere(spark, src, "id % 11 = 5", Map("price" -> "price * 3"))
      assert(MaterializedView.refresh(spark, view).mode == "delta")
      m
    } finally spark.conf.unset("spark.graft.dml.changeFeed")
    // restore commits FORWARD (new head = mid state): the feed over
    // (watermark, head] is the exact undo diff, so refresh heals
    // incrementally — the view must equal the restored state, not the
    // restored-away one
    Lance.restore(spark, src, mid)
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "delta", s"restore windows delta-refresh, got $r")
    assertSame(MaterializedView.read(spark, view), recomputeSeedView(src),
      "view served restored-away state after a source restore")
    assert(MaterializedView.refresh(spark, view).mode == "noop")
  }

  test("view restore: state and watermark land together, refresh replays forward") {
    val src = tmpDir(); val view = tmpDir() + "/v"
    seed(src)
    MaterializedView.create(spark, view, src, Seq("grp"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "price", "sp", 2)))
    spark.conf.set("spark.graft.dml.changeFeed", "true")
    try {
      Lance.deleteWhere(spark, src, "id % 7 = 3")
      assert(MaterializedView.refresh(spark, view).mode == "delta")
      val viewMid = Lance.versions(spark, view).max
      Lance.updateWhere(spark, src, "id % 11 = 5", Map("price" -> "price * 3"))
      assert(MaterializedView.refresh(spark, view).mode == "delta")
      // restore the VIEW to its post-window-1 version: state and the
      // graft.mv.version watermark are properties of ONE manifest, so
      // they revert together — the next refresh simply replays window 2
      Lance.restore(spark, view, viewMid)
      val r = MaterializedView.refresh(spark, view)
      assert(r.mode == "delta", s"replay after view restore, got $r")
      assertSame(MaterializedView.read(spark, view), recomputeSeedView(src),
        "view restore desynced state from watermark")
    } finally spark.conf.unset("spark.graft.dml.changeFeed")
  }
}
