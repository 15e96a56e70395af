package graft

import graft.format.{ColStats, FragmentStats, LanceFormat}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Manifest-level data skipping: fragment min/max/nullCount collected at
  * write time, fragments pruned on the driver before any footer is read.
  * The evaluator must be strictly conservative — every test that prunes
  * also re-checks the query RESULT against an unpruned computation.
  */
class FragmentStatsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "fragstats-")
      .toAbsolutePath.toString

  private def manifest(dir: String) =
    LanceFormat.readLatest(
      new Path(dir).getFileSystem(spark.sessionState.newHadoopConf()), new Path(dir)).get

  /** Number of fragment files the executed scan actually read. */
  private def scannedFiles(df: DataFrame): Int = {
    df.collect() // finalize the adaptive plan
    def strip(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val scans = strip(df.queryExecution.executedPlan).collect {
      case b: BatchScanExec => b.scan
    }
    scans.collect { case p: ParquetScan => p.fileIndex.inputFiles.length }.sum
  }

  // ------------------------------------------------------------ collection

  test("writer records per-column min/max/nullCount in the manifest") {
    val dir = s"${tmpDir()}/stats"
    Seq((1L, Some("apple"), 1.5), (7L, None, -2.0), (4L, Some("pear"), 0.25))
      .toDF("id", "s", "v").coalesce(1)
      .write.format("lance").mode("overwrite").save(dir)
    val st = manifest(dir).fragments.head.stats.get
    assert(st("id") == ColStats(Some("1"), Some("7"), 0, Some(Seq("1", "4", "7"))))
    assert(st("s") == ColStats(Some("apple"), Some("pear"), 1, Some(Seq("apple", "pear"))))
    // float/double columns never carry value sets
    assert(st("v") == ColStats(Some("-2.0"), Some("1.5"), 0, None))
  }

  test("long strings are truncated to bounds, not dropped") {
    val dir = s"${tmpDir()}/trunc"
    val longA = "a" * 100
    val longZ = "z" * 100
    Seq(longA, longZ).toDF("s").coalesce(1)
      .write.format("lance").mode("overwrite").save(dir)
    val st = manifest(dir).fragments.head.stats.get("s")
    assert(st.min.get == "a" * 64) // prefix <= the real min
    assert(st.max.get == "z" * 63 + "{") // truncate-and-increment > the real max
    // the bounds must still admit the actual values (conservative)
    val schema = new StructType().add("s", StringType)
    assert(FragmentStats.mayMatch(schema, 2, Map("s" -> st), EqualTo("s", longZ)))
    assert(FragmentStats.mayMatch(schema, 2, Map("s" -> st), EqualTo("s", longA)))
    assert(!FragmentStats.mayMatch(schema, 2, Map("s" -> st), EqualTo("s", "Z")))
  }

  test("NaN disables a double column's bounds; nullCount stays exact") {
    val dir = s"${tmpDir()}/nan"
    Seq(1.0, Double.NaN, 3.0).toDF("v").coalesce(1)
      .write.format("lance").mode("overwrite").save(dir)
    val st = manifest(dir).fragments.head.stats.get("v")
    assert(st == ColStats(None, None, 0))
    val schema = new StructType().add("v", DoubleType)
    // no bounds -> never prune
    assert(FragmentStats.mayMatch(schema, 3, Map("v" -> st), EqualTo("v", 99.0)))
  }

  test("streaming writes collect stats too") {
    val dir = s"${tmpDir()}/stream"
    val src = s"${tmpDir()}/stream-src"
    spark.range(10, 20).select(col("id")).write.format("lance").mode("overwrite").save(src)
    val q = spark.readStream.format("lance").load(src)
      .writeStream.format("lance")
      .option("checkpointLocation", s"$dir-ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(dir)
    q.awaitTermination()
    val frags = manifest(dir).fragments
    assert(frags.nonEmpty)
    assert(frags.forall(_.stats.exists(_("id").min.isDefined)))
  }

  test("write.stats=false opts out") {
    val dir = s"${tmpDir()}/nostats"
    spark.range(5).write.format("lance").option("write.stats", "false")
      .mode("overwrite").save(dir)
    assert(manifest(dir).fragments.forall(_.stats.isEmpty))
  }

  // ------------------------------------------------------------- evaluator

  private val schema = new StructType()
    .add("n", LongType).add("s", StringType).add("d", DoubleType)
    .add("dt", DateType).add("b", BooleanType)
  private val stats = Map(
    "n" -> ColStats(Some("10"), Some("20"), 0),
    "s" -> ColStats(Some("delta"), Some("kilo"), 2),
    "d" -> ColStats(Some("-1.5"), Some("2.5"), 0),
    "dt" -> ColStats(Some("19000"), Some("19100"), 0), // days since epoch
    "b" -> ColStats(Some("1"), Some("1"), 0))
  private def may(f: Filter, rc: Long = 100): Boolean =
    FragmentStats.mayMatch(schema, rc, stats, f)

  test("interval evaluator: comparisons, In, null tests, boolean logic") {
    assert(may(EqualTo("n", 15L)) && !may(EqualTo("n", 9L)) && !may(EqualTo("n", 21L)))
    assert(may(EqualTo("n", 10L)) && may(EqualTo("n", 20L))) // inclusive ends
    assert(may(GreaterThan("n", 19L)) && !may(GreaterThan("n", 20L)))
    assert(may(GreaterThanOrEqual("n", 20L)) && !may(GreaterThanOrEqual("n", 21L)))
    assert(may(LessThan("n", 11L)) && !may(LessThan("n", 10L)))
    assert(may(LessThanOrEqual("n", 10L)) && !may(LessThanOrEqual("n", 9L)))
    assert(may(In("n", Array(1L, 2L, 12L))) && !may(In("n", Array(1L, 2L, 30L))))
    assert(may(EqualTo("d", 2.5)) && !may(EqualTo("d", 2.6)))
    assert(may(EqualTo("s", "echo")) && !may(EqualTo("s", "alpha")) && !may(EqualTo("s", "lima")))
    assert(may(IsNull("s")) && !may(IsNull("n")))
    assert(may(IsNotNull("s")) && may(IsNotNull("n")))
    assert(!may(And(EqualTo("n", 9L), EqualTo("s", "echo"))))
    assert(may(Or(EqualTo("n", 9L), EqualTo("s", "echo"))))
    assert(!may(Or(EqualTo("n", 9L), EqualTo("s", "alpha"))))
    // date pushdown values arrive as java.sql.Date / LocalDate
    assert(may(EqualTo("dt", java.time.LocalDate.ofEpochDay(19050))))
    assert(!may(EqualTo("dt", java.time.LocalDate.ofEpochDay(18000))))
    assert(may(EqualTo("dt", java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(19000)))))
    // constant-true boolean fragment: b = false prunes
    assert(may(EqualTo("b", java.lang.Boolean.TRUE)))
    assert(!may(EqualTo("b", java.lang.Boolean.FALSE)))
  }

  test("interval evaluator: prefixes, Not(EqualTo), all-null, unknowns") {
    assert(may(StringStartsWith("s", "e")) && may(StringStartsWith("s", "delt")))
    assert(!may(StringStartsWith("s", "z")) && !may(StringStartsWith("s", "a")))
    // a column that is one constant value: <> prunes, over-range does not
    val const = Map("n" -> ColStats(Some("5"), Some("5"), 0))
    assert(!FragmentStats.mayMatch(schema, 10, const, Not(EqualTo("n", 5L))))
    assert(FragmentStats.mayMatch(schema, 10, const, Not(EqualTo("n", 6L))))
    // all-null fragment: value comparisons can't match, IS NULL can
    val allNull = Map("n" -> ColStats(None, None, 10))
    assert(!FragmentStats.mayMatch(schema, 10, allNull, EqualTo("n", 5L)))
    assert(FragmentStats.mayMatch(schema, 10, allNull, IsNull("n")))
    assert(!FragmentStats.mayMatch(schema, 10, allNull, IsNotNull("n")))
    // contains/endsWith without a value set never prune...
    assert(may(StringContains("s", "zzz")))
    assert(may(EqualTo("missing_col", 1L)))
    // ...but a dictionary-ish column's exact value set proves absence
    val tagged = Map("s" -> ColStats(Some("alpha"), Some("beta"), 0,
      values = Some(Seq("alpha", "beta"))))
    def mayT(f: Filter) = FragmentStats.mayMatch(schema, 10, tagged, f)
    assert(mayT(StringContains("s", "lp")) && !mayT(StringContains("s", "zz")))
    assert(mayT(StringEndsWith("s", "ta")) && !mayT(StringEndsWith("s", "xx")))
  }

  // ------------------------------------------------------------ end-to-end

  test("selective filter prunes fragments from the scan (and stays correct)") {
    val dir = s"${tmpDir()}/prune"
    // 8 range-disjoint fragments over id 0..7999
    spark.range(0, 8000).withColumn("v", col("id") * 2)
      .repartitionByRange(8, col("id"))
      .write.format("lance").mode("overwrite").save(dir)
    val m = manifest(dir)
    assert(m.fragments.size == 8)

    val table = spark.read.format("lance").load(dir)
    val narrow = table.filter(col("id") >= 2000 && col("id") < 2100)
    assert(scannedFiles(narrow) == 1, "range filter should hit exactly one fragment")
    assert(narrow.count() == 100)
    assert(narrow.agg(sum("v")).head.getLong(0) == (2000L until 2100L).map(_ * 2).sum)

    val point = table.filter(col("id") === 4242)
    assert(scannedFiles(point) == 1)
    assert(point.select("v").head.getLong(0) == 8484L)

    val none = table.filter(col("id") === 999999)
    assert(scannedFiles(none) == 0, "out-of-range point lookup reads zero files")
    assert(none.count() == 0)

    val all = table.filter(col("id") >= 0)
    assert(scannedFiles(all) == 8)
    assert(all.count() == 8000)
  }

  test("string-prefix filter prunes by string bounds") {
    val dir = s"${tmpDir()}/prune-str"
    val words = Seq("apple", "avocado", "banana", "blueberry", "cherry", "citron",
      "mango", "melon")
    words.zipWithIndex.toDF("w", "i")
      .repartitionByRange(4, col("w"))
      .write.format("lance").mode("overwrite").save(dir)
    val table = spark.read.format("lance").load(dir)
    val m = table.filter(col("w").startsWith("me"))
    assert(scannedFiles(m) == 1)
    assert(m.select("w").as[String].collect().sorted.toSeq == Seq("melon"))
  }

  test("value sets prune point lookups that range bounds cannot") {
    val dir = s"${tmpDir()}/prune-valueset"
    // three fragments whose lang RANGES all straddle 'fr' ('de'..'zh',
    // 'en'..'es' vs 'fr' — only one actually contains it): min/max can
    // never prune this equality; the exact value set must.
    val rows = Seq(
      ("de", 0), ("zh", 0), ("de", 0), // fragment 0: {de, zh}
      ("en", 1), ("es", 1),            // fragment 1: {en, es}
      ("fr", 2), ("zh", 2))            // fragment 2: {fr, zh}
    rows.toDF("lang", "pk").repartitionByRange(3, col("pk")).drop("pk")
      .write.format("lance").mode("overwrite").save(dir)
    val m = manifest(dir)
    assert(m.fragments.size == 3)
    val withFr = m.fragments.count(_.stats.get("lang").values.exists(_.contains("fr")))
    assert(withFr == 1, s"expected one fragment holding fr: ${m.fragments.map(_.stats)}")

    val table = spark.read.format("lance").load(dir)
    val fr = table.filter(col("lang") === "fr")
    assert(scannedFiles(fr) == 1, "value set should prune the two fr-less fragments")
    assert(fr.count() == 1)
    // IN over absent values: zero files
    val none = table.filter(col("lang").isin("it", "pt"))
    assert(scannedFiles(none) == 0)
    assert(none.count() == 0)
    // overflow: >ValueSetMaxSize distinct values drops the set, never the rows
    val wide = s"${tmpDir()}/prune-valueset-wide"
    spark.range(100).select(concat(lit("v"), col("id")).as("s")).coalesce(1)
      .write.format("lance").mode("overwrite").save(wide)
    val wideStats = manifest(wide).fragments.head.stats.get("s")
    assert(wideStats.values.isEmpty)
    assert(spark.read.format("lance").load(wide)
      .filter(col("s") === "v42").count() == 1)
  }

  test("pre-stats manifests (no stats field) are never pruned") {
    val dir = s"${tmpDir()}/legacy"
    spark.range(100).write.format("lance").option("write.stats", "false")
      .mode("overwrite").save(dir)
    val df = spark.read.format("lance").load(dir).filter(col("id") === 1)
    assert(scannedFiles(df) >= 1) // no stats -> conservative full scan
    assert(df.count() == 1)
  }

  test("merge-schema append widens the table; old fragments read NULL") {
    val dir = s"${tmpDir()}/evolve"
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.format("lance").mode("overwrite").save(dir)
    // without the option: loud failure (existing behavior)
    val e = intercept[Exception] {
      Seq((3L, "c", 1.5)).toDF("id", "s", "v")
        .write.format("lance").mode("append").save(dir)
    }
    assert(e.getMessage.contains("merge-schema"))
    Seq((3L, "c", 1.5)).toDF("id", "s", "v")
      .write.format("lance").option("write.merge-schema", "true")
      .mode("append").save(dir)
    val back = spark.read.format("lance").load(dir).orderBy("id")
    assert(back.columns.toSeq == Seq("id", "s", "v"))
    assert(back.collect().map(r => (r.getLong(0), r.isNullAt(2))).toSeq ==
      Seq((1L, true), (2L, true), (3L, false)))
    // dropped-column direction: an append missing 's' nulls it for new rows
    Seq((4L, 9.9)).toDF("id", "v")
      .write.format("lance").option("write.merge-schema", "true")
      .mode("append").save(dir)
    val r4 = spark.read.format("lance").load(dir).filter(col("id") === 4).head
    assert(r4.isNullAt(1) && r4.getDouble(2) == 9.9)
    // type conflicts never merge
    val e2 = intercept[Exception] {
      Seq((5L, 7)).toDF("id", "s") // s was STRING, now INT
        .write.format("lance").option("write.merge-schema", "true")
        .mode("append").save(dir)
    }
    assert(e2.getMessage.contains("cannot merge schemas"))
  }

  test("ALTER TABLE ADD COLUMN evolves the schema as a new MVCC version") {
    val wh = tmpDir()
    val s = spark
    s.conf.set("spark.sql.catalog.lance_evo", "graft.catalog.LanceCatalog")
    s.conf.set("spark.sql.catalog.lance_evo.warehouse", wh)
    try {
      s.sql("CREATE NAMESPACE lance_evo.db")
      s.sql("CREATE TABLE lance_evo.db.t (id BIGINT, s STRING)")
      s.sql("INSERT INTO lance_evo.db.t VALUES (1, 'a')")
      s.sql("ALTER TABLE lance_evo.db.t ADD COLUMN v DOUBLE")
      s.sql("INSERT INTO lance_evo.db.t VALUES (2, 'b', 2.5)")
      val rows = s.sql("SELECT id, s, v FROM lance_evo.db.t ORDER BY id").collect()
      assert(rows.map(r => (r.getLong(0), r.isNullAt(2))).toSeq ==
        Seq((1L, true), (2L, false)))
      // time travel still sees the narrow schema
      val v1 = s.sql("SELECT * FROM lance_evo.db.t VERSION AS OF 2") // 1=create, 2=insert
      assert(v1.columns.toSeq == Seq("id", "s"))
      val e = intercept[Exception] {
        s.sql("ALTER TABLE lance_evo.db.t ADD COLUMN s STRING")
      }
      assert(e.getMessage.contains("already exists"))
    } finally {
      s.sql("DROP TABLE IF EXISTS lance_evo.db.t")
      s.conf.unset("spark.sql.catalog.lance_evo")
      s.conf.unset("spark.sql.catalog.lance_evo.warehouse")
    }
  }

  test("ALTER TABLE DROP COLUMN is metadata-only with a resurrection guard") {
    val wh = tmpDir()
    val s = spark
    s.conf.set("spark.sql.catalog.lance_drop", "graft.catalog.LanceCatalog")
    s.conf.set("spark.sql.catalog.lance_drop.warehouse", wh)
    try {
      s.sql("CREATE NAMESPACE lance_drop.db")
      s.sql("CREATE TABLE lance_drop.db.t (id BIGINT, s STRING, v DOUBLE)")
      s.sql("INSERT INTO lance_drop.db.t VALUES (1, 'a', 1.5), (2, 'b', 2.5)")
      val root = new Path(s"$wh/db/t")
      val filesBefore = LanceFormat.readLatest(root.getFileSystem(spark.sessionState.newHadoopConf()), root).get
        .fragments.map(_.file).toSet
      s.sql("ALTER TABLE lance_drop.db.t DROP COLUMN v")
      val m = LanceFormat.readLatest(root.getFileSystem(spark.sessionState.newHadoopConf()), root).get
      // metadata-only: same data files, narrower schema, name recorded
      assert(m.fragments.map(_.file).toSet == filesBefore)
      assert(m.schema.fieldNames.toSeq == Seq("id", "s"))
      assert(m.dropped == Seq("v"))
      assert(s.sql("SELECT * FROM lance_drop.db.t").columns.toSeq == Seq("id", "s"))
      assert(s.sql("SELECT * FROM lance_drop.db.t").count() == 2)
      // narrower writes now append cleanly
      s.sql("INSERT INTO lance_drop.db.t VALUES (3, 'c')")
      assert(s.sql("SELECT * FROM lance_drop.db.t").count() == 3)
      // time travel still reads the wide schema
      assert(s.sql("SELECT * FROM lance_drop.db.t VERSION AS OF 2")
        .columns.toSeq == Seq("id", "s", "v"))
      // resurrection guard: re-adding the dropped name is refused while
      // old fragments physically hold its data
      val e = intercept[Exception](
        s.sql("ALTER TABLE lance_drop.db.t ADD COLUMN v DOUBLE"))
      assert(e.getMessage.contains("resurrect"), e.getMessage)
      // the guard covers EVERY widening surface: merge-schema append of
      // the dropped name is refused too (same resurrection hazard)
      val e1b = intercept[Exception] {
        Seq((7L, "g", 9.9)).toDF("id", "s", "v")
          .write.format("lance").option("write.merge-schema", "true")
          .mode("append").save(root.toString)
      }
      assert(e1b.getMessage.contains("resurrect") ||
        Option(e1b.getCause).exists(_.getMessage.contains("resurrect")),
        e1b.getMessage)
      // a different name is fine; dropping a missing column fails loud
      s.sql("ALTER TABLE lance_drop.db.t ADD COLUMN w DOUBLE")
      // Spark's analyzer resolves the column before the catalog is asked
      val e2 = intercept[Exception](
        s.sql("ALTER TABLE lance_drop.db.t DROP COLUMN nope"))
      assert(e2.getMessage.contains("cannot be resolved"), e2.getMessage)
      // a full rewrite clears the guard: every file is fresh, nothing to
      // resurrect — the name becomes usable again (all-null)
      graft.Lance.compact(s, root.toString)
      assert(LanceFormat.readLatest(root.getFileSystem(spark.sessionState.newHadoopConf()), root).get.dropped.isEmpty)
      s.sql("ALTER TABLE lance_drop.db.t ADD COLUMN v DOUBLE")
      val vs = s.sql("SELECT v FROM lance_drop.db.t").collect()
      assert(vs.forall(_.isNullAt(0)), "rewritten files must not resurrect v")
    } finally {
      s.sql("DROP TABLE IF EXISTS lance_drop.db.t")
      s.conf.unset("spark.sql.catalog.lance_drop")
      s.conf.unset("spark.sql.catalog.lance_drop.warehouse")
    }
  }

  test("Z-order clustering makes stats prune on BOTH dimensions") {
    val dir = s"${tmpDir()}/zorder"
    // two independent dimensions: a ascending, b descending — a plain
    // sort on one cannot cluster the other
    spark.range(0, 8192)
      .select(col("id").as("a"), (lit(8191) - col("id")).cast("double").as("b"))
      .repartition(7) // unclustered: every fragment spans both full ranges
      .write.format("lance").mode("overwrite").save(dir)
    val (before, after) = graft.Lance.cluster(spark, dir, Seq("a", "b"),
      maxRowsPerFile = 512)
    assert(before == 7 && after >= 8, s"before=$before after=$after")

    val table = spark.read.format("lance").load(dir)
    val byA = table.filter(col("a") >= 1000 && col("a") < 1200)
    val byB = table.filter(col("b") >= 4000.0 && col("b") < 4200.0)
    assert(scannedFiles(byA) < after / 2, s"a-filter scanned too much of $after")
    assert(scannedFiles(byB) < after / 2, s"b-filter scanned too much of $after")
    assert(byA.count() == 200 && byB.count() == 200)
    assert(byA.agg(sum("a")).head.getLong(0) == (1000L until 1200L).sum)
    assert(table.count() == 8192)
  }

  test("CREATE TABLE AS SELECT lands through the catalog") {
    val wh = tmpDir()
    val s = spark
    s.conf.set("spark.sql.catalog.lance_ctas", "graft.catalog.LanceCatalog")
    s.conf.set("spark.sql.catalog.lance_ctas.warehouse", wh)
    try {
      s.sql("CREATE NAMESPACE lance_ctas.db")
      spark.range(0, 100).select(col("id"), (col("id") * 2).as("v"))
        .createOrReplaceTempView("ctas_src")
      s.sql("CREATE TABLE lance_ctas.db.t AS SELECT * FROM ctas_src WHERE id >= 50")
      val rows = s.sql("SELECT COUNT(*) AS n, SUM(v) AS s FROM lance_ctas.db.t").head
      assert(rows.getLong(0) == 50 && rows.getLong(1) == (50L until 100L).map(_ * 2).sum)
    } finally {
      s.sql("DROP TABLE IF EXISTS lance_ctas.db.t")
      s.conf.unset("spark.sql.catalog.lance_ctas")
      s.conf.unset("spark.sql.catalog.lance_ctas.warehouse")
    }
  }

  test("pruning stays sound across schema evolution (old fragments lack the new column)") {
    val dir = s"${tmpDir()}/evolve-prune"
    // generation 1: no 'v' column at all
    spark.range(0, 100).coalesce(1).write.format("lance").mode("overwrite").save(dir)
    // generation 2: adds 'v' with values 1000..1099
    spark.range(100, 200).withColumn("v", col("id") + 900).coalesce(1)
      .write.format("lance").option("write.merge-schema", "true")
      .mode("append").save(dir)
    val table = spark.read.format("lance").load(dir)
    // old fragments have NO stats entry for v: a v-filter may prune them
    // only via the all-null rule, never wrongly. IS NULL must reach gen-1.
    assert(table.filter(col("v").isNull).count() == 100)
    assert(table.filter(col("v") >= 1000 && col("v") < 1010).count() == 10)
    assert(table.filter(col("v") === 999999).count() == 0)
    // and an id-filter still prunes by generation (disjoint id ranges)
    val byId = table.filter(col("id") < 50)
    assert(scannedFiles(byId) == 1)
    assert(byId.count() == 50)
  }

  test("SQL CALL runs the maintenance procedures") {
    val wh = tmpDir()
    val s = spark
    s.conf.set("spark.sql.catalog.lance_proc", "graft.catalog.LanceCatalog")
    s.conf.set("spark.sql.catalog.lance_proc.warehouse", wh)
    try {
      s.sql("CREATE NAMESPACE lance_proc.db")
      s.sql("CREATE TABLE lance_proc.db.t (id BIGINT, v DOUBLE)")
      (0 until 4).foreach { i =>
        s.sql(s"INSERT INTO lance_proc.db.t VALUES ($i, ${i * 1.5})")
      }
      val compacted = s.sql("CALL lance_proc.compact('db.t')").collect().head
      assert(compacted.getInt(0) == 4 && compacted.getInt(1) == 1,
        s"compact returned $compacted")
      assert(s.sql("SELECT COUNT(*) FROM lance_proc.db.t").head.getLong(0) == 4)

      val vacuumed = s.sql("CALL lance_proc.vacuum('db.t', 1)").collect().head
      assert(vacuumed.getInt(0) >= 4, s"vacuum dropped ${vacuumed.getInt(0)} manifests")
      assert(vacuumed.getInt(1) >= 3, s"vacuum deleted ${vacuumed.getInt(1)} files")
      assert(s.sql("SELECT COUNT(*) FROM lance_proc.db.t").head.getLong(0) == 4)

      // post-vacuum the data dir holds exactly the referenced files
      val orphans = s.sql("CALL lance_proc.remove_orphans('db.t', 0)").collect().head
      assert(orphans.getInt(1) == 0, "nothing is orphaned after vacuum")

      val clustered = s.sql("CALL lance_proc.cluster('db.t', 'id,v')").collect().head
      assert(clustered.getInt(1) >= 1)
      assert(s.sql("SELECT SUM(id) FROM lance_proc.db.t").head.getLong(0) == 6)

      // refresh_fts: build over the current rows, append, delta-refresh
      s.sql("CREATE TABLE lance_proc.db.docs (doc_id BIGINT, body STRING)")
      s.sql("INSERT INTO lance_proc.db.docs VALUES (1, 'alpha beta'), (2, 'beta gamma')")
      val docsPath = s"$wh/db/docs"
      graft.index.FtsIndex.build(s, s.read.format("lance").load(docsPath),
        "body", "doc_id", docsPath, numTermPartitions = 4)
      s.sql("INSERT INTO lance_proc.db.docs VALUES (3, 'gamma delta')")
      val refreshed = s.sql("CALL lance_proc.refresh_fts('db.docs', 'body')")
        .collect().head
      assert(refreshed.getLong(0) == 3, s"refresh_fts returned $refreshed")
      val hits = graft.index.FtsIndex.search(s, docsPath, "body", "gamma", 5)
        .collect().map(_.getLong(0)).toSet
      assert(hits == Set(2L, 3L), s"appended doc must be searchable, got $hits")

      // drop_index removes the sidecar AND evicts the session meta cache
      val dropped = s.sql("CALL lance_proc.drop_index('db.docs', 'body', 'fts')")
        .collect().head
      assert(dropped.getInt(0) == 1, s"drop_index returned $dropped")
      val gone = intercept[Exception] {
        graft.index.FtsIndex.search(s, docsPath, "body", "gamma", 5).collect()
      }
      assert(gone.getMessage.contains("no fts index"),
        s"dropped index must fail loud, got: ${gone.getMessage}")
      s.sql("DROP TABLE IF EXISTS lance_proc.db.docs")

      // build_scalar_index / refresh_scalar_index: build over current
      // rows, append, delta-refresh — coverage counts surface in the row
      s.sql("CREATE TABLE lance_proc.db.kv (id BIGINT, s STRING)")
      s.sql("INSERT INTO lance_proc.db.kv VALUES (1, 'a'), (2, 'b')")
      val kvPath = s"$wh/db/kv"
      val built = s.sql("CALL lance_proc.build_scalar_index('db.kv', 'id', 8)")
        .collect().head
      val builtFrags = built.getInt(0)
      assert(builtFrags >= 1, s"build_scalar_index returned $built")
      s.sql("INSERT INTO lance_proc.db.kv VALUES (3, 'c')")
      val srefreshed =
        s.sql("CALL lance_proc.refresh_scalar_index('db.kv', 'id')").collect().head
      assert(srefreshed.getInt(0) > builtFrags,
        s"refresh must cover the appended fragment, got $srefreshed after $builtFrags")
      val meta = graft.index.ScalarIndex.loadMeta(s, kvPath, "id")
      assert(meta.numBuckets == 8 && meta.coveredFiles.size == srefreshed.getInt(0))
      val sdropped =
        s.sql("CALL lance_proc.drop_index('db.kv', 'id', 'scalar')").collect().head
      assert(sdropped.getInt(0) == 1)
      s.sql("DROP TABLE IF EXISTS lance_proc.db.kv")

      // Spark wraps the catalog's require into FAILED_TO_LOAD_ROUTINE
      val e = intercept[Exception](s.sql("CALL lance_proc.no_such_proc('db.t')"))
      assert(e.getMessage.contains("no_such_proc"))
    } finally {
      s.sql("DROP TABLE IF EXISTS lance_proc.db.t")
      s.conf.unset("spark.sql.catalog.lance_proc")
      s.conf.unset("spark.sql.catalog.lance_proc.warehouse")
    }
  }

  test("compaction regenerates stats for the rewritten fragments") {
    val dir = s"${tmpDir()}/compact"
    spark.range(0, 100).repartitionByRange(4, col("id"))
      .write.format("lance").mode("overwrite").save(dir)
    graft.Lance.compact(spark, dir)
    val frags = manifest(dir).fragments
    assert(frags.nonEmpty)
    assert(frags.forall(_.stats.exists(_("id").min.isDefined)))
  }

  test("aggregate rolls up bounds, schema-evolved nulls, and unknowables") {
    import org.apache.spark.sql.types._
    import graft.format.{ColStats, FragmentMeta}
    val schema = new StructType()
      .add("k", LongType).add("s", StringType).add("late", LongType)
    // f1 predates column `late` (no stats entry → its rows read all-null);
    // f2 carries full stats; f3 is all-null on `s`
    val f1 = FragmentMeta(0, "a", 10, Some(Map(
      "k" -> ColStats(Some("5"), Some("20"), 1),
      "s" -> ColStats(Some("bb"), Some("dd"), 0))))
    val f2 = FragmentMeta(1, "b", 7, Some(Map(
      "k" -> ColStats(Some("-3"), Some("9"), 0),
      "s" -> ColStats(Some("aa"), Some("cc"), 2),
      "late" -> ColStats(Some("100"), Some("200"), 3))))
    val f3 = FragmentMeta(2, "c", 4, Some(Map(
      "k" -> ColStats(Some("6"), Some("6"), 0),
      "s" -> ColStats(None, None, 4), // all-null: vacuous for bounds
      "late" -> ColStats(Some("150"), Some("150"), 0))))
    val agg = FragmentStats.aggregate(schema, Seq(f1, f2, f3))
      .map(r => r._1 -> r).toMap
    assert(agg("k") == (("k", Some("-3"), Some("20"), Some(1L), 3)))
    assert(agg("s") == (("s", Some("aa"), Some("dd"), Some(6L), 2)))
    // f1's 10 rows contribute as nulls to the younger column
    assert(agg("late") == (("late", Some("100"), Some("200"), Some(13L), 2)))

    // one stats-less fragment makes every column unknowable
    val bare = FragmentMeta(3, "d", 5, None)
    assert(FragmentStats.aggregate(schema, Seq(f1, f2, bare))
      .forall { case (_, mn, mx, nc, _) => mn.isEmpty && mx.isEmpty && nc.isEmpty })

    // NaN-voided bounds with non-null rows: bounds unknown for that column
    val dschema = new StructType().add("d", DoubleType)
    val nan = FragmentMeta(4, "e", 3, Some(Map("d" -> ColStats(None, None, 1))))
    val ok = FragmentMeta(5, "f", 2, Some(Map("d" -> ColStats(Some("1.5"), Some("2.5"), 0))))
    val dm = FragmentStats.aggregate(dschema, Seq(nan, ok)).head
    assert(dm._2.isEmpty && dm._3.isEmpty && dm._4.isEmpty)
  }

  test("remove_orphans deletes only unreferenced data files") {
    val dir = s"${tmpDir()}/orphans"
    spark.range(0, 20).coalesce(1).write.format("lance").mode("overwrite").save(dir)
    spark.range(20, 40).coalesce(1).write.format("lance").mode("append").save(dir)
    val root = new Path(new java.io.File(dir).getAbsolutePath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val data = graft.format.LanceFormat.dataPath(root)
    val before = fs.listStatus(data).map(_.getPath.getName).toSet
    // plant crash leftovers: a staged-but-never-committed fragment copy
    // and a stray temp file
    val ref = fs.listStatus(data).head.getPath
    org.apache.hadoop.fs.FileUtil.copy(fs, ref, fs,
      new Path(data, "orphan-fragment.parquet"), false,
      spark.sessionState.newHadoopConf())
    fs.create(new Path(data, "stray.tmp")).close()

    // grace shields fresh files: nothing is old enough yet
    val (_, shielded) = graft.Lance.removeOrphans(spark, dir, graceMinutes = 60)
    assert(shielded == 0, "grace window must protect fresh files")

    val (scanned, deleted) = graft.Lance.removeOrphans(spark, dir, graceMinutes = 0)
    assert(scanned == before.size + 2)
    assert(deleted == 2, "exactly the two planted orphans")
    assert(fs.listStatus(data).map(_.getPath.getName).toSet == before)
    assert(spark.read.format("lance").load(dir).count() == 40)
    // idempotent
    assert(graft.Lance.removeOrphans(spark, dir, graceMinutes = 0)._2 == 0)
  }

  test("lance_stats TVF answers from manifests and matches the data") {
    val dir = s"${tmpDir()}/statstvf"
    spark.range(0, 50)
      .select(col("id"), (col("id") % 7).as("m"),
        concat(lit("v"), lpad(col("id").cast("string"), 3, "0")).as("s"))
      .repartitionByRange(3, col("id"))
      .write.format("lance").mode("overwrite").save(dir)
    graft.MetaTvfs.register(spark)
    val rows = spark.sql(s"SELECT * FROM lance_stats('$dir') ORDER BY col_name")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("id").getString(1) == "0" && rows("id").getString(2) == "49")
    assert(rows("m").getString(1) == "0" && rows("m").getString(2) == "6")
    assert(rows("s").getString(1) == "v000" && rows("s").getString(2) == "v049")
    assert(rows.values.forall(r => r.getLong(5) == 50 && r.getLong(3) == 0))
    // never analyzed → NDV unknown (null), not zero
    assert(rows.values.forall(_.isNullAt(4)))
    graft.Lance.analyze(spark, dir)
    val after = spark.sql(s"SELECT * FROM lance_stats('$dir') ORDER BY col_name")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(after("id").getLong(4) == 50, after("id"))
    assert(after("m").getLong(4) == 7, after("m"))
  }

  // ------------------------------------------------- nested struct leaves

  test("struct leaves carry dotted-path stats; NULL structs count as leaf nulls") {
    val dir = s"${tmpDir()}/nested"
    Seq(
      (1L, Some(("en", 100L)), 0.5),
      (2L, Some(("fr", 900L)), 1.5),
      (3L, None, 2.5)) // NULL struct: every leaf reads null
      .toDF("id", "meta0", "v")
      .withColumn("meta", col("meta0").cast("struct<lang:string,n_chars:bigint>"))
      .drop("meta0").coalesce(1)
      .write.format("lance").mode("overwrite").save(dir)
    val st = manifest(dir).fragments.head.stats.get
    assert(st("meta.lang") ==
      ColStats(Some("en"), Some("fr"), 1, Some(Seq("en", "fr"))))
    assert(st("meta.n_chars") ==
      ColStats(Some("100"), Some("900"), 1, Some(Seq("100", "900"))))
    // the struct itself never carries scalar bounds
    assert(!st.contains("meta"))
    // rollup serves the leaves too
    graft.MetaTvfs.register(spark)
    val rows = spark.sql(s"SELECT * FROM lance_stats('$dir')")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.contains("meta.n_chars"))
    assert(rows("meta.n_chars").getString(1) == "100")
    assert(rows("meta.n_chars").getLong(3) == 1) // the NULL-struct row
  }

  test("filters on struct leaves prune fragments end-to-end") {
    val dir = s"${tmpDir()}/nestedprune"
    // 4 fragments with disjoint meta.n ranges
    (0 until 4).foreach { f =>
      spark.range(f * 100L, f * 100L + 100L)
        .select(col("id"),
          struct((col("id") * 10).as("n"),
            concat(lit("l"), lit(f)).as("tag")).as("meta"))
        .coalesce(1)
        .write.format("lance").mode(if (f == 0) "overwrite" else "append")
        .save(dir)
    }
    assert(manifest(dir).fragments.size == 4)
    val df = spark.read.format("lance").load(dir)
      .filter(col("meta.n") === 1500L) // only fragment 1 ([1000,1990])
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(150L))
    assert(scannedFiles(
      spark.read.format("lance").load(dir).filter(col("meta.n") === 1500L)) == 1,
      "a nested-leaf equality must prune to the one holding fragment")
    // value-set prune on the nested string leaf
    assert(scannedFiles(
      spark.read.format("lance").load(dir).filter(col("meta.tag") === "l2")) == 1)
    // conservative: a filter on an UNTRACKED depth keeps everything
    val deep = spark.read.format("lance").load(dir)
      .filter(col("meta.tag").isNotNull)
    assert(deep.count() == 400)
  }
}
