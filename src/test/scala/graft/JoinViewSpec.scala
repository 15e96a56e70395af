package graft

import graft.format.LanceFormat
import graft.operators.MaterializedView
import graft.operators.MaterializedView.{AggSpec, JoinSpec}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Fact⋈fact JOIN materialized views: both sides change-fed, refresh
  * telescopes the classical IVM identity Δ(A⋈B) = ΔA⋈B@new ∪ A@old⋈ΔB.
  * Contracts:
  *  - a mixed DML batch on EITHER side (or both) delta-refreshes to
  *    exactly the full join+group recompute — including join-key
  *    updates that move a row between match sets
  *  - the view registers on every joined table: refreshDependents from
  *    the join side maintains it, retention pins respect the join-side
  *    watermark, drop deregisters everywhere
  *  - min/max join views rescan scoped groups when a window removed
  *    rows; the per-table watermarks CAS in the refresh commit
  */
class JoinViewSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "jmv-")
      .toAbsolutePath.toString

  private def props(dir: String): Map[String, String] = {
    val root = new Path(dir)
    val fs = LanceFormat.fileSystem(root, spark.sessionState.newHadoopConf())
    LanceFormat.readLatest(fs, root).get.properties.getOrElse(Map.empty)
  }

  /** A: one row per order (okey, status, cust); B: 0..3 items per order
    * (o_key, amount, tag) — real inner-join multiplicity, some A rows
    * matchless. */
  private def seed(a: String, b: String): Unit = {
    (1L to 200L).map(i => (i, s"s${i % 4}", i % 7))
      .toDF("okey", "status", "cust")
      .repartition(3).write.format("lance").mode("overwrite").save(a)
    (1L to 200L).flatMap(i => (0 until (i % 4).toInt).map(r =>
      (i, i * 0.5 + r, s"t${r % 2}")))
      .toDF("o_key", "amount", "tag")
      .repartition(3).write.format("lance").mode("overwrite").save(b)
  }

  private def recompute(a: String, b: String): DataFrame =
    spark.read.format("lance").load(a)
      .join(spark.read.format("lance").load(b),
        col("okey") === col("o_key"), "inner").drop("o_key")
      .groupBy("status")
      .agg(count(lit(1)).as("n"), Tables.dsum(col("amount")).as("amt"))

  private def assertSame(x: DataFrame, y: DataFrame, hint: String): Unit =
    if (!(x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty)) {
      val key = x.columns.head
      fail(s"$hint:\nview:\n${x.orderBy(key).collect().mkString("\n")}\n" +
        s"recompute:\n${y.orderBy(key).collect().mkString("\n")}")
    }

  private def withFeed(body: => Unit): Unit = {
    spark.conf.set("spark.graft.dml.changeFeed", "true")
    try body finally spark.conf.unset("spark.graft.dml.changeFeed")
  }

  test("two-sided DML delta-refreshes to the exact join recompute") {
    val a = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    seed(a, b)
    MaterializedView.create(spark, view, a, Seq("status"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "amount", "amt")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"))))
    assertSame(MaterializedView.read(spark, view), recompute(a, b),
      "created join view != join recompute")
    withFeed {
      // A side: delete orders (removes all their items' contributions),
      // update a group column, insert a new order matching existing items
      Lance.deleteWhere(spark, a, "okey % 10 = 3")
      Lance.updateWhere(spark, a, "okey % 10 = 4", Map("status" -> "'sX'"))
      Lance.upsert(spark, a, Seq((500L, "s0", 1L), (6L, "s2", 2L))
        .toDF("okey", "status", "cust"), Seq("okey"))
      // B side: delete items, re-price others, add items for live orders
      Lance.deleteWhere(spark, b, "tag = 't1' AND o_key % 5 = 2")
      Lance.updateWhere(spark, b, "o_key % 5 = 1", Map("amount" -> "amount * 2"))
      Seq((6L, 100.0, "t9"), (999L, 9.9, "t9")) // 999 matches no order
        .toDF("o_key", "amount", "tag")
        .write.format("lance").mode("append").save(b)
    }
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "delta", s"sum/count join views keep the delta path: $r")
    assertSame(MaterializedView.read(spark, view), recompute(a, b),
      "two-sided delta refresh drifted from join recompute")
    // watermarks advanced on BOTH tables; same-state refresh is a noop
    assert(MaterializedView.refresh(spark, view).mode == "noop")
  }

  test("join-key update on the source moves rows between match sets") {
    val a = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    seed(a, b)
    MaterializedView.create(spark, view, a, Seq("status"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "amount", "amt")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"))))
    withFeed {
      // okey 8 (0 items at seed? 8%4=0 -> 0 items) -> repoint to 7's
      // items (3 of them); okey 11 (3 items) -> repoint to a matchless id
      Lance.updateWhere(spark, a, "okey = 8", Map("okey" -> "7"))
      Lance.updateWhere(spark, a, "okey = 11", Map("okey" -> "1000"))
    }
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "delta")
    assertSame(MaterializedView.read(spark, view), recompute(a, b),
      "join-key update did not net out across match sets")
  }

  test("a join-side-only window refreshes (source window empty)") {
    val a = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    seed(a, b)
    MaterializedView.create(spark, view, a, Seq("status"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "amount", "amt")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"))))
    withFeed {
      Lance.deleteWhere(spark, b, "o_key % 3 = 1")
    }
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "delta", s"got $r")
    assert(r.fromVersion == r.toVersion,
      "source watermark must not move when only the join side changed")
    assertSame(MaterializedView.read(spark, view), recompute(a, b),
      "join-side-only window drifted")
  }

  test("min/max join views rescan scoped groups on removal windows") {
    val a = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    seed(a, b)
    MaterializedView.create(spark, view, a, Seq("status"),
      Seq(AggSpec("max", "amount", "max_amt"),
        AggSpec("min", "amount", "min_amt")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"))))
    withFeed {
      // remove the current maxima candidates: forces the groups path
      Lance.deleteWhere(spark, b, "amount > 80")
      Lance.deleteWhere(spark, a, "okey > 190")
    }
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "groups", s"removals under min/max must rescan: $r")
    val expect = spark.read.format("lance").load(a)
      .join(spark.read.format("lance").load(b),
        col("okey") === col("o_key"), "inner")
      .groupBy("status")
      .agg(max(col("amount")).as("max_amt"), min(col("amount")).as("min_amt"))
    assertSame(MaterializedView.read(spark, view), expect,
      "join-view scoped rescan drifted")
  }

  test("registration/maintenance/drop span every joined table") {
    val a = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    seed(a, b)
    MaterializedView.create(spark, view, a, Seq("status"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "amount", "amt")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"))))
    val abs = new java.io.File(view).getAbsolutePath
    assert(props(a)("graft.mv.dependents").split('\n').contains(abs))
    assert(props(b)("graft.mv.dependents").split('\n').contains(abs),
      "the view must register on the JOIN table too")
    // a write to the JOIN side maintains the view through its registry
    withFeed { Lance.deleteWhere(spark, b, "o_key % 4 = 3") }
    val res = MaterializedView.refreshDependents(spark, b)
    assert(res.collect { case (p, Right(r)) if p == abs => r.mode } ==
      Seq("delta"), s"join-side refreshDependents: $res")
    assertSame(MaterializedView.read(spark, view), recompute(a, b),
      "join-side maintenance drifted")
    // ALTER guard holds on the join side as well
    val e = intercept[Exception](Lance.renameColumn(spark, b, "o_key", "ok2"))
    assert(e.getMessage.contains("registered dependent"), e.getMessage)
    val e2 = intercept[Exception](Lance.renameColumn(spark, b, "amount", "amt2"))
    assert(e2.getMessage.contains("registered dependent"), e2.getMessage)
    // drop releases both registrations
    assert(MaterializedView.drop(spark, view))
    assert(!props(a).contains("graft.mv.dependents"))
    assert(!props(b).contains("graft.mv.dependents"))
    Lance.renameColumn(spark, b, "amount", "amt2") // now free
  }

  test("join-side retention vacuum pins back to the view's watermark") {
    val a = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    seed(a, b)
    MaterializedView.create(spark, view, a, Seq("status"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "amount", "amt")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"))))
    // advance B far past the view's watermark WITHOUT refreshing
    withFeed {
      (1 to 6).foreach { i =>
        Lance.deleteWhere(spark, b, s"o_key % 97 = $i")
      }
    }
    // keep-1 vacuum would reclaim the view's feed window — the
    // dependent pin must hold it
    Lance.optimize(spark, b, keepVersions = 1, refreshViews = false)
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "delta",
      s"feed window must survive a join-side keep-1 vacuum: $r")
    assertSame(MaterializedView.read(spark, view), recompute(a, b),
      "post-vacuum refresh drifted")
  }

  test("fullRefresh rebuilds the join and advances every watermark") {
    val a = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    seed(a, b)
    MaterializedView.create(spark, view, a, Seq("status"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "amount", "amt")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"))))
    withFeed {
      Lance.deleteWhere(spark, a, "okey % 6 = 1")
      Lance.deleteWhere(spark, b, "o_key % 6 = 2")
    }
    val r = MaterializedView.fullRefresh(spark, view)
    assert(r.mode == "full")
    assertSame(MaterializedView.read(spark, view), recompute(a, b),
      "fullRefresh of a join view drifted")
    assert(MaterializedView.refresh(spark, view).mode == "noop",
      "fullRefresh must advance the join-side watermark too")
  }

  test("create refusals: bad keys, collisions, duplicate tables") {
    val a = tmpDir(); val b = tmpDir()
    seed(a, b)
    def bad(joins: Seq[JoinSpec], aggCol: String = "amount"): Exception =
      intercept[Exception](MaterializedView.create(spark, tmpDir() + "/v",
        a, Seq("status"), Seq(AggSpec("sum", aggCol, "s")), joins = joins))
    assert(bad(Seq(JoinSpec(b, Map("nope" -> "o_key")))).getMessage
      .contains("not a column"))
    assert(bad(Seq(JoinSpec(b, Map("okey" -> "nope")))).getMessage
      .contains("not a column"))
    assert(bad(Seq(JoinSpec(b, Map("status" -> "o_key")))).getMessage
      .contains("types differ"))
    assert(bad(Seq(JoinSpec(b, Map("okey" -> "o_key")),
      JoinSpec(b, Map("okey" -> "o_key")))).getMessage
      .contains("distinct"))
    assert(bad(Seq(JoinSpec(a, Map("okey" -> "okey")))).getMessage
      .contains("distinct"))
    // attr collision: a second join table sharing a non-key column name
    val c = tmpDir()
    (1L to 5L).map(i => (i, i * 1.0)).toDF("c_key", "amount")
      .write.format("lance").mode("overwrite").save(c)
    assert(bad(Seq(JoinSpec(b, Map("okey" -> "o_key")),
      JoinSpec(c, Map("okey" -> "c_key")))).getMessage
      .contains("collide"))
  }

  test("filtered join views: the WHERE names join columns and applies per image") {
    val a = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    seed(a, b)
    MaterializedView.create(spark, view, a,
      Seq("status", "upper(tag) AS utag"), // expression key over a JOIN column
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "amount", "amt")),
      where = Some("amount > 5.0"), // join-column predicate
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"))))
    withFeed {
      // re-pricing moves joined rows ACROSS the predicate boundary in
      // both directions; deletes hit rows on both sides of it
      Lance.updateWhere(spark, b, "o_key % 7 = 2", Map("amount" -> "amount / 20"))
      Lance.updateWhere(spark, b, "o_key % 7 = 3", Map("amount" -> "amount * 20"))
      Lance.deleteWhere(spark, a, "okey % 13 = 1")
    }
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "delta")
    val expect = spark.read.format("lance").load(a)
      .join(spark.read.format("lance").load(b),
        col("okey") === col("o_key"), "inner")
      .filter(col("amount") > 5.0)
      .groupBy(col("status"), upper(col("tag")).as("utag"))
      .agg(count(lit(1)).as("n"), Tables.dsum(col("amount")).as("amt"))
    assertSame(MaterializedView.read(spark, view), expect,
      "filtered join view drifted across the predicate boundary")
  }

  test("PROPERTY: random two-sided DML/append/compact rounds stay exact") {
    val rnd = new scala.util.Random(1711)
    val a = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    seed(a, b)
    MaterializedView.create(spark, view, a, Seq("status"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "amount", "amt"),
        AggSpec("avg", "amount", "avg_amt"),
        AggSpec("count_distinct", "tag", "tags")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"))))
    var nextKey = 1000L
    (1 to 4).foreach { round =>
      withFeed {
        (1 to 2 + rnd.nextInt(3)).foreach { _ =>
          rnd.nextInt(7) match {
            case 0 =>
              Lance.deleteWhere(spark, a, s"okey % 17 = ${rnd.nextInt(17)}")
            case 1 =>
              Lance.updateWhere(spark, a, s"okey % 13 = ${rnd.nextInt(13)}",
                Map("status" -> s"'s${rnd.nextInt(6)}'"))
            case 2 => // join-KEY update: rows move between match sets
              Lance.updateWhere(spark, a, s"okey = ${1 + rnd.nextInt(200)}",
                Map("okey" -> s"${1 + rnd.nextInt(250)}"))
            case 3 =>
              Lance.deleteWhere(spark, b, s"o_key % 11 = ${rnd.nextInt(11)}")
            case 4 =>
              Lance.updateWhere(spark, b, s"o_key % 7 = ${rnd.nextInt(7)}",
                Map("amount" -> s"amount + ${rnd.nextInt(50)}",
                  "tag" -> s"'t${rnd.nextInt(4)}'"))
            case 5 =>
              val rows = (0 until 2).map { _ =>
                nextKey += 1
                (if (rnd.nextBoolean()) nextKey else 1L + rnd.nextInt(200),
                  rnd.nextDouble() * 50, s"t${rnd.nextInt(4)}")
              }
              rows.toDF("o_key", "amount", "tag")
                .write.format("lance").mode("append").save(b)
            case 6 =>
              Lance.compact(spark, if (rnd.nextBoolean()) a else b)
          }
        }
      }
      val r = MaterializedView.refresh(spark, view)
      val expect = spark.read.format("lance").load(a)
        .join(spark.read.format("lance").load(b),
          col("okey") === col("o_key"), "inner")
        .groupBy("status")
        .agg(count(lit(1)).as("n"), Tables.dsum(col("amount")).as("amt"),
          Tables.davg(col("amount")).as("avg_amt"),
          countDistinct(col("tag")).as("tags")) // tiny domain: HLL exact
      assertSame(MaterializedView.read(spark, view), expect,
        s"round $round (mode=${r.mode}): join view diverged")
    }
  }

  test("PROPERTY: random two-sided rounds on a LEFT join view stay exact") {
    // the LEFT twin of the inner property test: the same DML mix plus
    // deliberate zero-crossing pressure (delete ALL items of a key /
    // first item for a matchless key) so flips fire most rounds
    val rnd = new scala.util.Random(2207)
    val a = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    seed(a, b) // okey % 4 == 0 starts matchless
    MaterializedView.create(spark, view, a, Seq("status"),
      Seq(AggSpec("count", "*", "n"), AggSpec("count", "amount", "nm"),
        AggSpec("sum", "amount", "amt")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"), "left")))
    var nextKey = 5000L
    (1 to 4).foreach { round =>
      withFeed {
        (1 to 2 + rnd.nextInt(3)).foreach { _ =>
          rnd.nextInt(7) match {
            case 0 =>
              Lance.deleteWhere(spark, a, s"okey % 17 = ${rnd.nextInt(17)}")
            case 1 =>
              Lance.updateWhere(spark, a, s"okey % 13 = ${rnd.nextInt(13)}",
                Map("status" -> s"'s${rnd.nextInt(6)}'"))
            case 2 => // LAST matches out for a whole key class
              Lance.deleteWhere(spark, b, s"o_key % 9 = ${rnd.nextInt(9)}")
            case 3 =>
              Lance.updateWhere(spark, b, s"o_key % 7 = ${rnd.nextInt(7)}",
                Map("amount" -> s"amount + ${rnd.nextInt(50)}"))
            case 4 => // FIRST matches for previously matchless keys
              val k = rnd.nextInt(200)
              spark.read.format("lance").load(a)
                .filter(s"okey % 20 = $k % 20")
                .select(col("okey").as("o_key"),
                  (rand(k) * 10).cast("double").as("amount"),
                  lit(s"t${rnd.nextInt(4)}").as("tag"))
                .limit(5)
                .write.format("lance").mode("append").save(b)
            case 5 =>
              val rows = (0 until 2).map { _ =>
                nextKey += 1
                (if (rnd.nextBoolean()) nextKey else 1L + rnd.nextInt(200),
                  rnd.nextDouble() * 50, s"t${rnd.nextInt(4)}")
              }
              rows.toDF("o_key", "amount", "tag")
                .write.format("lance").mode("append").save(b)
            case 6 =>
              Lance.compact(spark, if (rnd.nextBoolean()) a else b)
          }
        }
      }
      val r = MaterializedView.refresh(spark, view)
      val expect = spark.read.format("lance").load(a)
        .join(spark.read.format("lance").load(b),
          col("okey") === col("o_key"), "left")
        .groupBy("status")
        .agg(count(lit(1)).as("n"), count(col("amount")).as("nm"),
          Tables.dsum(col("amount")).as("amt"))
      assertSame(MaterializedView.read(spark, view), expect,
        s"round $round (mode=${r.mode}): LEFT join view diverged")
    }
  }

  test("snowflake chains: a join may key on an earlier join's attributes") {
    val a = tmpDir(); val b = tmpDir(); val c = tmpDir()
    val view = tmpDir() + "/v"
    seed(a, b) // A(okey, status, cust); B(o_key, amount, tag)
    // C keys on B's 'tag' attribute — the chain orders⋈items⋈tag-dim,
    // but change-fed (a real fact, not a pinned star dim)
    Seq(("t0", "bronze"), ("t1", "silver"))
      .toDF("t_key", "tier")
      .write.format("lance").mode("overwrite").save(c)
    MaterializedView.create(spark, view, a, Seq("status", "tier"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "amount", "amt")),
      joins = Seq(
        JoinSpec(b, Map("okey" -> "o_key")),
        JoinSpec(c, Map("tag" -> "t_key")))) // keyed on B's attr
    def expect() = spark.read.format("lance").load(a)
      .join(spark.read.format("lance").load(b),
        col("okey") === col("o_key"), "inner")
      .join(spark.read.format("lance").load(c),
        col("tag") === col("t_key"), "inner")
      .groupBy("status", "tier")
      .agg(count(lit(1)).as("n"), Tables.dsum(col("amount")).as("amt"))
    assertSame(MaterializedView.read(spark, view), expect(),
      "created snowflake view != recompute")
    // change EVERY level in one window: orders deleted, items re-priced
    // AND re-tagged (moving rows between C matches), C re-tiered + a
    // new tier matching existing tags... plus an unmatched one
    withFeed {
      Lance.deleteWhere(spark, a, "okey % 9 = 2")
      Lance.updateWhere(spark, b, "o_key % 5 = 1", Map("amount" -> "amount * 3"))
      Lance.updateWhere(spark, b, "o_key % 7 = 3", Map("tag" -> "'t9'"))
      Lance.updateWhere(spark, c, "t_key = 't1'", Map("tier" -> "'gold'"))
      Seq(("t9", "platinum"), ("tXX", "never-matches")).toDF("t_key", "tier")
        .write.format("lance").mode("append").save(c)
    }
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "delta", r.toString)
    assertSame(MaterializedView.read(spark, view), expect(),
      "three-level snowflake delta drifted from recompute")
    assert(MaterializedView.refresh(spark, view).mode == "noop")
    // out-of-order chains refuse loud at create
    val e = intercept[Exception](MaterializedView.create(spark,
      tmpDir() + "/v2", a, Seq("status"),
      Seq(AggSpec("count", "*", "n")),
      joins = Seq(
        JoinSpec(c, Map("tag" -> "t_key")), // 'tag' not known yet
        JoinSpec(b, Map("okey" -> "o_key")))))
    assert(e.getMessage.contains("dependency order"), e.getMessage)
  }

  test("snowflake chains: min/max removal windows rescan scoped groups") {
    val a = tmpDir(); val b = tmpDir(); val c = tmpDir()
    val view = tmpDir() + "/v"
    seed(a, b)
    Seq(("t0", "bronze"), ("t1", "silver"), ("t9", "gold"))
      .toDF("t_key", "tier")
      .write.format("lance").mode("overwrite").save(c)
    MaterializedView.create(spark, view, a, Seq("tier"),
      Seq(AggSpec("max", "amount", "max_amt"),
        AggSpec("min", "amount", "min_amt")),
      joins = Seq(
        JoinSpec(b, Map("okey" -> "o_key")),
        JoinSpec(c, Map("tag" -> "t_key"))))
    withFeed {
      // removals on every level: the rescan recomputes affected groups
      // against the CURRENT three-level join (the chain factor joins
      // unpruned — exactly the code path the delta tests never hit)
      Lance.deleteWhere(spark, b, "amount > 80")
      Lance.deleteWhere(spark, a, "okey > 180")
      Lance.updateWhere(spark, c, "t_key = 't0'", Map("tier" -> "'stone'"))
    }
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "groups", s"removals under min/max must rescan: $r")
    val expect = spark.read.format("lance").load(a)
      .join(spark.read.format("lance").load(b),
        col("okey") === col("o_key"), "inner")
      .join(spark.read.format("lance").load(c),
        col("tag") === col("t_key"), "inner")
      .groupBy("tier")
      .agg(max(col("amount")).as("max_amt"), min(col("amount")).as("min_amt"))
    assertSame(MaterializedView.read(spark, view), expect,
      "snowflake min/max scoped rescan drifted")
  }

  test("count_distinct join views: union on insert-only, rescan on removal") {
    val a = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    seed(a, b)
    MaterializedView.create(spark, view, a, Seq("status"),
      Seq(AggSpec("count", "*", "n"),
        AggSpec("count_distinct", "tag", "tags")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"))))
    // insert-only on BOTH sides: the joined delta is removal-free, so
    // sketches union (delta mode)
    withFeed {
      Seq((201L, "s1", 1L)).toDF("okey", "status", "cust")
        .write.format("lance").mode("append").save(a)
      Seq((201L, 1.0, "tNEW"), (7L, 2.0, "tNEW"))
        .toDF("o_key", "amount", "tag")
        .write.format("lance").mode("append").save(b)
    }
    assert(MaterializedView.refresh(spark, view).mode == "delta",
      "insert-only joined windows must union sketches")
    def exact() = spark.read.format("lance").load(a)
      .join(spark.read.format("lance").load(b),
        col("okey") === col("o_key"), "inner")
      .groupBy("status")
      .agg(count(lit(1)).as("n"), countDistinct(col("tag")).as("tags"))
    // tag cardinality is tiny (t0,t1,tNEW): the HLL estimate is exact
    assertSame(MaterializedView.read(spark, view), exact(),
      "insert-only count_distinct join view drifted")
    // a removal forces the scoped rescan (a sketch cannot un-merge)
    withFeed { Lance.deleteWhere(spark, b, "tag = 'tNEW'") }
    assert(MaterializedView.refresh(spark, view).mode == "groups")
    assertSame(MaterializedView.read(spark, view), exact(),
      "post-removal count_distinct join view drifted")
  }

  test("a compaction-only join-side window refreshes as an empty delta") {
    val a = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    seed(a, b)
    MaterializedView.create(spark, view, a, Seq("status"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "amount", "amt")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"))))
    val before = MaterializedView.read(spark, view).collect().toSet
    // row-preserving rewrite on B: the feed window is EMPTY but the
    // version advances — the watermark must still move (else every
    // later refresh re-walks the compaction)
    Lance.compact(spark, b, maxRowsPerFile = 1000000L)
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "delta" && r.groupsChanged == 0L, r.toString)
    assert(MaterializedView.read(spark, view).collect().toSet == before)
    assert(MaterializedView.refresh(spark, view).mode == "noop",
      "the join-side watermark must advance past a compaction")
  }

  test("a star dim may key on a JOIN column (dims enrich after joins)") {
    val a = tmpDir(); val b = tmpDir(); val d = tmpDir()
    val view = tmpDir() + "/v"
    seed(a, b)
    // dim keyed on the join table's 'tag' attribute
    Seq(("t0", "bronze"), ("t1", "silver"), ("t9", "gold"))
      .toDF("tag_key", "tier")
      .write.format("lance").mode("overwrite").save(d)
    MaterializedView.create(spark, view, a, Seq("tier"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "amount", "amt")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"))),
      dims = Seq(MaterializedView.DimSpec(d, Map("tag" -> "tag_key"))))
    withFeed {
      Lance.deleteWhere(spark, b, "o_key % 6 = 1")
      Lance.updateWhere(spark, a, "okey % 6 = 2", Map("status" -> "'sZ'"))
    }
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "delta")
    val expect = spark.read.format("lance").load(a)
      .join(spark.read.format("lance").load(b),
        col("okey") === col("o_key"), "inner")
      .join(spark.read.format("lance").load(d),
        col("tag") === col("tag_key"), "left").drop("tag_key")
      .groupBy("tier")
      .agg(count(lit(1)).as("n"), Tables.dsum(col("amount")).as("amt"))
    assertSame(MaterializedView.read(spark, view), expect,
      "join+dim view drifted (dim keyed on a join attribute)")
  }

  test("lance_dependents lists registrations with role-specific lag") {
    val a = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    seed(a, b)
    MaterializedView.create(spark, view, a, Seq("status"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "amount", "amt")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"))))
    graft.MetaTvfs.register(spark)
    val abs = new java.io.File(view).getAbsolutePath
    // on the SOURCE: the view reports role=source with the mv watermark
    val onA = spark.sql(s"SELECT * FROM lance_dependents('$a')").collect()
    assert(onA.length == 1)
    assert(onA(0).getAs[String]("dependent") == abs)
    assert(onA(0).getAs[String]("kind") == "view")
    assert(onA(0).getAs[String]("role") == "source")
    assert(onA(0).getAs[Long]("versions_behind") == 0L)
    // on the JOIN side: role=join with the join-side watermark; advance
    // B twice and the lag shows
    withFeed {
      Lance.deleteWhere(spark, b, "o_key % 50 = 1")
      Lance.deleteWhere(spark, b, "o_key % 50 = 2")
    }
    val onB = spark.sql(s"SELECT * FROM lance_dependents('$b')").collect()
    assert(onB.length == 1)
    assert(onB(0).getAs[String]("role") == "join")
    assert(onB(0).getAs[Long]("versions_behind") == 2L)
    MaterializedView.refresh(spark, view)
    assert(spark.sql(s"SELECT versions_behind FROM lance_dependents('$b')")
      .collect()(0).getLong(0) == 0L)
    // dropped views disappear from every side
    MaterializedView.drop(spark, view)
    assert(spark.sql(s"SELECT * FROM lance_dependents('$a')").isEmpty)
    assert(spark.sql(s"SELECT * FROM lance_dependents('$b')").isEmpty)
  }

  test("SQL surface: CALL create_mv with a joins argument") {
    val wh = tmpDir()
    spark.conf.set("spark.sql.catalog.jmv", "graft.catalog.LanceCatalog")
    spark.conf.set("spark.sql.catalog.jmv.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE jmv.db")
      val a = s"$wh/db/a"; val b = s"$wh/db/b"
      (1L to 20L).map(i => (i, s"g${i % 2}")).toDF("okey", "grp")
        .write.format("lance").mode("overwrite").save(a)
      (1L to 20L).map(i => (i, i * 1.0)).toDF("o_key", "amount")
        .write.format("lance").mode("overwrite").save(b)
      spark.sql("CALL jmv.system.create_mv('db.v', 'db.a', 'grp', " +
        "'sum(amount) AS amt', '', '', 'db.b|okey=o_key')")
      val got = MaterializedView.read(spark, s"$wh/db/v")
      assert(got.columns.toSeq == Seq("grp", "amt"))
      assert(got.count() == 2L)
      // the having argument (the SQL DDL twin): a FULL-join view over
      // the same pair, read face filtered, state unfiltered
      spark.sql("CALL jmv.system.create_mv('db.vh', 'db.a', 'grp', " +
        "'count(*) AS n, sum(amount) AS amt', '', '', " +
        "'db.b|okey=o_key|full', 'n >= 100')")
      assert(MaterializedView.read(spark, s"$wh/db/vh").count() == 0L)
      assert(spark.read.format("lance").load(s"$wh/db/vh").count() == 2L)
    } finally {
      spark.conf.unset("spark.sql.catalog.jmv")
      spark.conf.unset("spark.sql.catalog.jmv.warehouse")
    }
  }


  private def recomputeLeft(a: String, b: String, key: String = "status"): DataFrame =
    spark.read.format("lance").load(a)
      .join(spark.read.format("lance").load(b),
        col("okey") === col("o_key"), "left").drop("o_key")
      .groupBy(key)
      .agg(count(lit(1)).as("n"), count(col("amount")).as("nm"),
        Tables.dsum(col("amount")).as("amt"))

  test("LEFT join view: two-sided DML delta-refreshes to the exact left recompute") {
    val a = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    seed(a, b) // orders with okey % 4 == 0 are matchless
    MaterializedView.create(spark, view, a, Seq("status"),
      Seq(AggSpec("count", "*", "n"), AggSpec("count", "amount", "nm"),
        AggSpec("sum", "amount", "amt")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"), "left")))
    assertSame(MaterializedView.read(spark, view), recomputeLeft(a, b),
      "created LEFT view != recompute")
    withFeed {
      // first match for previously matchless orders (retract null rows)
      Seq((4L, 99.0, "tX"), (8L, 98.0, "tX")).toDF("o_key", "amount", "tag")
        .write.format("lance").mode("append").save(b)
      // last-match removal: strip EVERY item of some matched orders
      Lance.deleteWhere(spark, b, "o_key IN (2, 3, 7)")
      // plus ordinary two-sided churn
      Lance.deleteWhere(spark, a, "okey % 9 = 5")
      Lance.updateWhere(spark, b, "o_key % 11 = 6",
        Map("amount" -> "amount + 1000"))
      Seq((901L, "s1", 1L), (902L, "s9", 2L)).toDF("okey", "status", "cust")
        .write.format("lance").mode("append").save(a) // matchless inserts
    }
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "delta", s"expected delta, got $r")
    assertSame(MaterializedView.read(spark, view), recomputeLeft(a, b),
      "LEFT view after two-sided DML != recompute")
    // refresh again: noop (watermarks advanced on both tables)
    assert(MaterializedView.refresh(spark, view).mode == "noop")
  }

  test("LEFT join view pins first-match retraction and last-match re-extension") {
    val a = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    // per-order groups make the flip arithmetic directly visible
    Seq((1L, "s0", 0L), (2L, "s0", 0L)).toDF("okey", "status", "cust")
      .write.format("lance").mode("overwrite").save(a)
    Seq((2L, 5.0, "t0"), (2L, 7.0, "t0")).toDF("o_key", "amount", "tag")
      .write.format("lance").mode("overwrite").save(b)
    MaterializedView.create(spark, view, a, Seq("okey"),
      Seq(AggSpec("count", "*", "n"), AggSpec("count", "amount", "nm"),
        AggSpec("sum", "amount", "amt")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"), "left")))
    def rows() = MaterializedView.read(spark, view).orderBy("okey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)))).toSeq
    // okey=1 null-extended once; okey=2 matched twice
    assert(rows() == Seq((1L, 1L, 0L, None), (2L, 2L, 2L, Some(12.0))),
      rows().toString)
    // FIRST match arrives for okey=1: its null-extended row must retract
    withFeed {
      Seq((1L, 3.0, "t1")).toDF("o_key", "amount", "tag")
        .write.format("lance").mode("append").save(b)
    }
    assert(MaterializedView.refresh(spark, view).mode == "delta")
    assert(rows() == Seq((1L, 1L, 1L, Some(3.0)), (2L, 2L, 2L, Some(12.0))),
      rows().toString)
    // LAST match leaves okey=2: its null-extended row must re-appear
    withFeed { Lance.deleteWhere(spark, b, "o_key = 2") }
    assert(MaterializedView.refresh(spark, view).mode == "delta")
    assert(rows() == Seq((1L, 1L, 1L, Some(3.0)), (2L, 1L, 0L, None)),
      rows().toString)
    // non-crossing churn on okey=1 (second item in, first out): no flip,
    // plain signed arithmetic
    withFeed {
      Seq((1L, 9.0, "t1")).toDF("o_key", "amount", "tag")
        .write.format("lance").mode("append").save(b)
      Lance.deleteWhere(spark, b, "o_key = 1 AND amount = 3.0")
    }
    assert(MaterializedView.refresh(spark, view).mode == "delta")
    assert(rows() == Seq((1L, 1L, 1L, Some(9.0)), (2L, 1L, 0L, None)),
      rows().toString)
  }

  test("LEFT join view groups by a JOIN-side attr: unmatched rows land in the NULL group") {
    val a = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    seed(a, b)
    MaterializedView.create(spark, view, a, Seq("tag"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "amount", "amt")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"), "left")))
    def recomputeTag() = spark.read.format("lance").load(a)
      .join(spark.read.format("lance").load(b),
        col("okey") === col("o_key"), "left").drop("o_key")
      .groupBy("tag")
      .agg(count(lit(1)).as("n"), Tables.dsum(col("amount")).as("amt"))
    assertSame(MaterializedView.read(spark, view), recomputeTag(),
      "created tag-grouped LEFT view != recompute")
    withFeed {
      Seq((4L, 50.0, "t9")).toDF("o_key", "amount", "tag")
        .write.format("lance").mode("append").save(b) // first match + new group
      Lance.deleteWhere(spark, b, "o_key IN (5, 6)")  // last matches out
    }
    assert(MaterializedView.refresh(spark, view).mode == "delta")
    assertSame(MaterializedView.read(spark, view), recomputeTag(),
      "tag-grouped LEFT view after DML != recompute")
  }

  test("LEFT min/max join view rescans scoped groups on removal windows") {
    val a = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    seed(a, b)
    MaterializedView.create(spark, view, a, Seq("status"),
      Seq(AggSpec("count", "*", "n"), AggSpec("max", "amount", "mx")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"), "left")))
    def recomputeMx() = spark.read.format("lance").load(a)
      .join(spark.read.format("lance").load(b),
        col("okey") === col("o_key"), "left").drop("o_key")
      .groupBy("status")
      .agg(count(lit(1)).as("n"), max(col("amount")).as("mx"))
    withFeed {
      Lance.deleteWhere(spark, b, "amount > 80") // removals move maxima
      Seq((4L, 0.25, "t0")).toDF("o_key", "amount", "tag")
        .write.format("lance").mode("append").save(b)
    }
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "groups", s"expected scoped rescan, got $r")
    assertSame(MaterializedView.read(spark, view), recomputeMx(),
      "LEFT min/max view after removal window != recompute")
  }

  test("chain with a LEFT tail: inner prefix then LEFT factor delta-refreshes") {
    val a = tmpDir(); val b = tmpDir(); val c = tmpDir()
    val view = tmpDir() + "/v"
    seed(a, b)
    // c keys off B's tag; only t0 is present (t1 rows null-extend)
    Seq(("t0", "family0")).toDF("c_tag", "family")
      .write.format("lance").mode("overwrite").save(c)
    MaterializedView.create(spark, view, a, Seq("status"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "amount", "amt")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key")),
        JoinSpec(c, Map("tag" -> "c_tag"), "left")))
    def recomputeChain() = {
      val ab = spark.read.format("lance").load(a)
        .join(spark.read.format("lance").load(b),
          col("okey") === col("o_key"), "inner").drop("o_key")
      ab.join(spark.read.format("lance").load(c),
        col("tag") === col("c_tag"), "left").drop("c_tag")
        .groupBy("status")
        .agg(count(lit(1)).as("n"), Tables.dsum(col("amount")).as("amt"))
    }
    assertSame(MaterializedView.read(spark, view), recomputeChain(),
      "created chain view != recompute")
    withFeed {
      // flip the LEFT tail both ways: t1 gains its first match, t0
      // loses its last — every A-side t0/t1 row crosses zero
      Seq(("t1", "family1")).toDF("c_tag", "family")
        .write.format("lance").mode("append").save(c)
      Lance.deleteWhere(spark, c, "c_tag = 't0'")
      // and churn the inner factor in the same window
      Lance.deleteWhere(spark, b, "o_key % 13 = 1")
    }
    assert(MaterializedView.refresh(spark, view).mode == "delta")
    assertSame(MaterializedView.read(spark, view), recomputeChain(),
      "chain view after LEFT-tail flips != recompute")
  }

  test("LEFT fact join composes with pinned star dims in one view") {
    val a = tmpDir(); val b = tmpDir(); val d = tmpDir(); val view = tmpDir() + "/v"
    seed(a, b) // okey % 4 == 0 matchless
    (0 until 4).map(i => (s"s$i", s"seg${i % 2}")).toDF("d_status", "segment")
      .write.format("lance").mode("overwrite").save(d)
    MaterializedView.create(spark, view, a, Seq("segment"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "amount", "amt")),
      dims = Seq(MaterializedView.DimSpec(d, Map("status" -> "d_status"))),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"), "left")))
    def recompute() = spark.read.format("lance").load(a)
      .join(spark.read.format("lance").load(b),
        col("okey") === col("o_key"), "left").drop("o_key")
      .join(broadcast(spark.read.format("lance").load(d)),
        col("status") === col("d_status"), "left").drop("d_status")
      .groupBy("segment")
      .agg(count(lit(1)).as("n"), Tables.dsum(col("amount")).as("amt"))
    assertSame(MaterializedView.read(spark, view), recompute(),
      "created LEFT+dim view != recompute")
    withFeed {
      // both crossings + A churn; dim stays PINNED (enrichment is a
      // pure per-row function, so the flip images enrich identically)
      Seq((4L, 77.0, "tX")).toDF("o_key", "amount", "tag")
        .write.format("lance").mode("append").save(b)
      Lance.deleteWhere(spark, b, "o_key IN (2, 6)")
      Lance.deleteWhere(spark, a, "okey % 19 = 4")
    }
    assert(MaterializedView.refresh(spark, view).mode == "delta")
    assertSame(MaterializedView.read(spark, view), recompute(),
      "LEFT+dim view after flips != recompute")
  }

  test("TWO LEFT factors flipping in one window telescope independently") {
    val a = tmpDir(); val b = tmpDir(); val c = tmpDir()
    val view = tmpDir() + "/v"
    seed(a, b) // b: okey % 4 == 0 matchless
    // c: a second change-fed LEFT factor keyed on the SOURCE, sparse on
    // a different residue so both factors carry null extensions
    (1L to 200L).filter(_ % 5 != 0).map(i => (i, s"n${i % 3}"))
      .toDF("c_key", "note")
      .write.format("lance").mode("overwrite").save(c)
    MaterializedView.create(spark, view, a, Seq("status"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "amount", "amt"),
        AggSpec("count", "note", "nn")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"), "left"),
        JoinSpec(c, Map("okey" -> "c_key"), "left")))
    def recompute() = spark.read.format("lance").load(a)
      .join(spark.read.format("lance").load(b),
        col("okey") === col("o_key"), "left").drop("o_key")
      .join(spark.read.format("lance").load(c),
        col("okey") === col("c_key"), "left").drop("c_key")
      .groupBy("status")
      .agg(count(lit(1)).as("n"), Tables.dsum(col("amount")).as("amt"),
        count(col("note")).as("nn"))
    assertSame(MaterializedView.read(spark, view), recompute(),
      "created two-LEFT view != recompute")
    withFeed {
      // BOTH factors cross zero in the same window, both directions
      Seq((4L, 9.0, "tZ")).toDF("o_key", "amount", "tag")
        .write.format("lance").mode("append").save(b) // b: first match
      Lance.deleteWhere(spark, b, "o_key IN (1, 3)")  // b: last matches out
      Seq((5L, "nZ"), (10L, "nZ")).toDF("c_key", "note")
        .write.format("lance").mode("append").save(c) // c: first matches
      Lance.deleteWhere(spark, c, "c_key IN (2, 4)")  // c: last matches out
      Lance.deleteWhere(spark, a, "okey % 23 = 7")    // plus source churn
    }
    assert(MaterializedView.refresh(spark, view).mode == "delta")
    assertSame(MaterializedView.read(spark, view), recompute(),
      "two-LEFT view after double flips != recompute")
  }

  test("a refresh that throws after feeds persist leaks no cached frames") {
    val a = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    seed(a, b)
    MaterializedView.create(spark, view, a, Seq("status"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "amount", "amt")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"))))
    // corrupt the stored state so refresh throws at the negative-count
    // guard — which sits AFTER the change-feed frames persist
    val bad = spark.read.format("lance").load(view)
      .withColumn("_mv_n", lit(1L)).withColumn("n", lit(1L))
    bad.write.format("lance").mode("overwrite").save(view)
    withFeed { Lance.deleteWhere(spark, b, "o_key <= 100") }
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val e = intercept[IllegalArgumentException](
      MaterializedView.refresh(spark, view))
    assert(e.getMessage.contains("negative group count"))
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"refresh leaked persisted frames past the throw: $leaked")
    // fullRefresh recovers and the next delta window is clean
    MaterializedView.fullRefresh(spark, view)
    assertSame(MaterializedView.read(spark, view), recompute(a, b),
      "post-recovery view != recompute")
  }
  // ------------------------------------------------------- FULL / RIGHT

  private def recomputeOuter(a: String, b: String, how: String): DataFrame =
    spark.read.format("lance").load(a)
      .join(spark.read.format("lance").load(b),
        col("okey") === col("o_key"), how)
      .groupBy("status")
      .agg(count(lit(1)).as("n"), count(col("amount")).as("nm"),
        Tables.dsum(col("amount")).as("amt"))

  test("FULL join view: both-side zero crossings in one window delta-refresh exactly") {
    val a = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    seed(a, b) // okey % 4 == 0 matchless on the A side
    // join-side-only keys: no A row has okey 301..303
    Seq((301L, 10.0, "t0"), (301L, 11.0, "t1"), (302L, 12.0, "t0"),
      (303L, 13.0, "t1")).toDF("o_key", "amount", "tag")
      .write.format("lance").mode("append").save(b)
    MaterializedView.create(spark, view, a, Seq("status"),
      Seq(AggSpec("count", "*", "n"), AggSpec("count", "amount", "nm"),
        AggSpec("sum", "amount", "amt")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"), "full")))
    assertSame(MaterializedView.read(spark, view), recomputeOuter(a, b, "full"),
      "created FULL view != recompute")
    withFeed {
      // join-side 0 -> >0 (driven by dA): okey=301 arrives, its 2 anti rows retract
      Seq((301L, "s1", 3L)).toDF("okey", "status", "cust")
        .write.format("lance").mode("append").save(a)
      // join-side >0 -> 0 (driven by dA): matched orders leave, items flip anti
      Lance.deleteWhere(spark, a, "okey IN (2, 3)")
      // source-side 0 -> >0: first item for matchless okey=4, null row retracts
      Seq((4L, 40.0, "t0")).toDF("o_key", "amount", "tag")
        .write.format("lance").mode("append").save(b)
      // source-side >0 -> 0: strip all items of okey=7, null row re-extends
      Lance.deleteWhere(spark, b, "o_key = 7")
      // pure anti churn: matchless join rows in, existing anti rows out
      Seq((400L, 44.0, "t1")).toDF("o_key", "amount", "tag")
        .write.format("lance").mode("append").save(b)
      Lance.deleteWhere(spark, b, "o_key = 302")
      // a join-KEY update moving one row from matched to anti
      Lance.updateWhere(spark, b, "o_key = 10 AND amount < 5.4",
        Map("o_key" -> "999"))
      // ordinary non-crossing churn on both sides
      Lance.updateWhere(spark, b, "o_key % 11 = 6",
        Map("amount" -> "amount + 1000"))
      Seq((901L, "s1", 1L)).toDF("okey", "status", "cust")
        .write.format("lance").mode("append").save(a)
    }
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "delta", s"expected delta, got $r")
    assertSame(MaterializedView.read(spark, view), recomputeOuter(a, b, "full"),
      "FULL view after both-side crossings != recompute")
    assert(MaterializedView.refresh(spark, view).mode == "noop")
  }

  test("FULL join view pins both-side crossings per merged key") {
    val a = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    Seq((1L, "s0", 0L), (2L, "s0", 0L)).toDF("okey", "status", "cust")
      .write.format("lance").mode("overwrite").save(a)
    Seq((2L, 5.0, "t0"), (2L, 7.0, "t0"), (9L, 4.0, "t9"))
      .toDF("o_key", "amount", "tag")
      .write.format("lance").mode("overwrite").save(b)
    MaterializedView.create(spark, view, a, Seq("okey"),
      Seq(AggSpec("count", "*", "n"), AggSpec("count", "cust", "nc"),
        AggSpec("sum", "amount", "amt")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"), "full")))
    def rows() = MaterializedView.read(spark, view).orderBy("okey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)))).toSeq
    // okey=1 source-only; okey=2 matched; okey=9 join-side-only with its
    // key CARRIED in the merged okey column (not a NULL group): nc=0
    // tells the sides apart
    assert(rows() == Seq((1L, 1L, 1L, None), (2L, 2L, 2L, Some(12.0)),
      (9L, 1L, 0L, Some(4.0))), rows().toString)
    // the source row for 9 arrives: anti row retracts, matched row in
    withFeed {
      Seq((9L, "s9", 5L)).toDF("okey", "status", "cust")
        .write.format("lance").mode("append").save(a)
    }
    assert(MaterializedView.refresh(spark, view).mode == "delta")
    assert(rows() == Seq((1L, 1L, 1L, None), (2L, 2L, 2L, Some(12.0)),
      (9L, 1L, 1L, Some(4.0))), rows().toString)
    // and leaves again: back to the join-side-only shape
    withFeed { Lance.deleteWhere(spark, a, "okey = 9") }
    assert(MaterializedView.refresh(spark, view).mode == "delta")
    assert(rows() == Seq((1L, 1L, 1L, None), (2L, 2L, 2L, Some(12.0)),
      (9L, 1L, 0L, Some(4.0))), rows().toString)
    // last join row for 9 leaves: no side left, the group dies
    withFeed { Lance.deleteWhere(spark, b, "o_key = 9") }
    assert(MaterializedView.refresh(spark, view).mode == "delta")
    assert(rows() == Seq((1L, 1L, 1L, None), (2L, 2L, 2L, Some(12.0))),
      rows().toString)
  }

  test("RIGHT join view: inner part plus join-side-only rows, both change-fed") {
    val a = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    seed(a, b)
    Seq((301L, 10.0, "t0"), (302L, 12.0, "t0")).toDF("o_key", "amount", "tag")
      .write.format("lance").mode("append").save(b)
    MaterializedView.create(spark, view, a, Seq("status"),
      Seq(AggSpec("count", "*", "n"), AggSpec("count", "amount", "nm"),
        AggSpec("sum", "amount", "amt")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"), "right")))
    assertSame(MaterializedView.read(spark, view), recomputeOuter(a, b, "right"),
      "created RIGHT view != recompute")
    withFeed {
      Seq((301L, "s1", 3L)).toDF("okey", "status", "cust")
        .write.format("lance").mode("append").save(a)   // anti 0 -> >0
      Lance.deleteWhere(spark, a, "okey IN (2, 3)")     // matched -> anti
      Seq((400L, 44.0, "t1")).toDF("o_key", "amount", "tag")
        .write.format("lance").mode("append").save(b)   // anti insert
      Lance.deleteWhere(spark, b, "o_key = 302")        // anti delete
      Lance.deleteWhere(spark, b, "o_key = 7")          // inner rows out,
                                                        // NO null re-extension
      Seq((901L, "s1", 1L)).toDF("okey", "status", "cust")
        .write.format("lance").mode("append").save(a)   // matchless: no effect
    }
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "delta", s"expected delta, got $r")
    assertSame(MaterializedView.read(spark, view), recomputeOuter(a, b, "right"),
      "RIGHT view after two-sided window != recompute")
  }

  test("FULL min/max join view rescans scoped groups on removal windows") {
    val a = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    seed(a, b)
    Seq((301L, 95.0, "t0"), (302L, 12.0, "t0")).toDF("o_key", "amount", "tag")
      .write.format("lance").mode("append").save(b)
    MaterializedView.create(spark, view, a, Seq("status"),
      Seq(AggSpec("count", "*", "n"), AggSpec("max", "amount", "mx")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"), "full")))
    def recomputeMx() = spark.read.format("lance").load(a)
      .join(spark.read.format("lance").load(b),
        col("okey") === col("o_key"), "full")
      .groupBy("status")
      .agg(count(lit(1)).as("n"), max(col("amount")).as("mx"))
    withFeed {
      Lance.deleteWhere(spark, b, "amount > 80") // removals move maxima,
                                                 // incl. the anti 95.0
      Seq((4L, 0.25, "t0")).toDF("o_key", "amount", "tag")
        .write.format("lance").mode("append").save(b)
      Lance.deleteWhere(spark, a, "okey = 5")    // its items flip anti
    }
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "groups", s"expected scoped rescan, got $r")
    assertSame(MaterializedView.read(spark, view), recomputeMx(),
      "FULL min/max view after removal window != recompute")
  }

  test("PROPERTY: random two-sided rounds on a FULL join view stay exact") {
    val rnd = new scala.util.Random(1303)
    val a = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    seed(a, b)
    // standing join-side-only population so anti churn fires from round 1
    Seq((301L, 10.0, "t0"), (302L, 12.0, "t1"), (303L, 13.0, "t0"))
      .toDF("o_key", "amount", "tag")
      .write.format("lance").mode("append").save(b)
    MaterializedView.create(spark, view, a, Seq("status"),
      Seq(AggSpec("count", "*", "n"), AggSpec("count", "amount", "nm"),
        AggSpec("sum", "amount", "amt")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"), "full")))
    var nextKey = 5000L
    (1 to 4).foreach { round =>
      withFeed {
        (1 to 2 + rnd.nextInt(3)).foreach { _ =>
          rnd.nextInt(7) match {
            case 0 => // source rows out: their items flip anti
              Lance.deleteWhere(spark, a, s"okey % 17 = ${rnd.nextInt(17)}")
            case 1 =>
              Lance.updateWhere(spark, a, s"okey % 13 = ${rnd.nextInt(13)}",
                Map("status" -> s"'s${rnd.nextInt(6)}'"))
            case 2 => // LAST matches out for a whole key class
              Lance.deleteWhere(spark, b, s"o_key % 9 = ${rnd.nextInt(9)}")
            case 3 =>
              Lance.updateWhere(spark, b, s"o_key % 7 = ${rnd.nextInt(7)}",
                Map("amount" -> s"amount + ${rnd.nextInt(50)}"))
            case 4 => // FIRST matches for previously matchless keys
              val k = rnd.nextInt(200)
              spark.read.format("lance").load(a)
                .filter(s"okey % 20 = $k % 20")
                .select(col("okey").as("o_key"),
                  (rand(k) * 10).cast("double").as("amount"),
                  lit(s"t${rnd.nextInt(4)}").as("tag"))
                .limit(5)
                .write.format("lance").mode("append").save(b)
            case 5 => // half of these are join-side-only keys (anti rows)
              val rows = (0 until 2).map { _ =>
                nextKey += 1
                (if (rnd.nextBoolean()) nextKey else 1L + rnd.nextInt(200),
                  rnd.nextDouble() * 50, s"t${rnd.nextInt(4)}")
              }
              rows.toDF("o_key", "amount", "tag")
                .write.format("lance").mode("append").save(b)
            case 6 =>
              Lance.compact(spark, if (rnd.nextBoolean()) a else b)
          }
        }
      }
      val r = MaterializedView.refresh(spark, view)
      val expect = spark.read.format("lance").load(a)
        .join(spark.read.format("lance").load(b),
          col("okey") === col("o_key"), "full")
        .groupBy("status")
        .agg(count(lit(1)).as("n"), count(col("amount")).as("nm"),
          Tables.dsum(col("amount")).as("amt"))
      assertSame(MaterializedView.read(spark, view), expect,
        s"round $round (mode=${r.mode}): FULL join view diverged")
    }
  }

  test("FULL/RIGHT factor placement rules: first only, at most one") {
    val a = tmpDir(); val b = tmpDir(); val c = tmpDir()
    val view = tmpDir() + "/v"
    seed(a, b)
    (1L to 20L).map(i => (i, i * 2.0)).toDF("k2", "w")
      .write.format("lance").mode("overwrite").save(c)
    // an inner factor BEFORE the anti factor would make the anti part
    // flip with that factor's delta too - refused
    val e = intercept[IllegalArgumentException](
      MaterializedView.create(spark, view, a, Seq("status"),
        Seq(AggSpec("count", "*", "n")),
        joins = Seq(JoinSpec(c, Map("okey" -> "k2"), "inner"),
          JoinSpec(b, Map("okey" -> "o_key"), "full"))))
    assert(e.getMessage.contains("FIRST join factor"), e.getMessage)
    val d = tmpDir()
    (1L to 5L).map(i => (i, i * 3.0)).toDF("k3", "w3")
      .write.format("lance").mode("overwrite").save(d)
    val e1 = intercept[IllegalArgumentException](
      MaterializedView.create(spark, view, a, Seq("status"),
        Seq(AggSpec("count", "*", "n")),
        joins = Seq(JoinSpec(b, Map("okey" -> "o_key"), "full"),
          JoinSpec(d, Map("okey" -> "k3"), "right"))))
    assert(e1.getMessage.contains("at most one FULL/RIGHT"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      JoinSpec(b, Map("okey" -> "o_key"), "anti"))
    assert(e2.getMessage.contains("unsupported"), e2.getMessage)
  }

  // ---- FULL/RIGHT head factor + inner/left tail factors (round 14):
  // the coverage-dashboard star — a two-sided fact join with dim factors
  // attached on the merged key or the fact's attributes

  /** C: one row per key 1..210, joined on the MERGED okey column. */
  private def seedTail(c: String): Unit =
    (1L to 210L).map(i => (i, i * 2.0, s"g${i % 3}")).toDF("k2", "w", "grp")
      .repartition(2).write.format("lance").mode("overwrite").save(c)

  private def recomputeFullTail(a: String, b: String, c: String,
      tailHow: String): DataFrame =
    spark.read.format("lance").load(a)
      .join(spark.read.format("lance").load(b),
        col("okey") === col("o_key"), "full")
      .withColumn("okey", coalesce(col("okey"), col("o_key"))).drop("o_key")
      .join(spark.read.format("lance").load(c),
        col("okey") === col("k2"), tailHow).drop("k2")
      .groupBy("status", "grp")
      .agg(count(lit(1)).as("n"), count(col("amount")).as("nm"),
        Tables.dsum(col("amount")).as("amt"), Tables.dsum(col("w")).as("sw"))

  test("FULL head + INNER tail on the merged key: two-sided crossings refresh exactly") {
    val a = tmpDir(); val b = tmpDir(); val c = tmpDir()
    val view = tmpDir() + "/v"
    seed(a, b) // okey % 4 == 0 itemless on the A side
    seedTail(c)
    // join-side-only keys inside AND outside C's key range: anti rows
    // that survive (205) and vanish under (999) the inner tail
    Seq((205L, 10.0, "t0"), (205L, 11.0, "t1"), (999L, 12.0, "t0"))
      .toDF("o_key", "amount", "tag")
      .write.format("lance").mode("append").save(b)
    MaterializedView.create(spark, view, a, Seq("status", "grp"),
      Seq(AggSpec("count", "*", "n"), AggSpec("count", "amount", "nm"),
        AggSpec("sum", "amount", "amt"), AggSpec("sum", "w", "sw")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"), "full"),
        JoinSpec(c, Map("okey" -> "k2"), "inner")))
    assertSame(MaterializedView.read(spark, view),
      recomputeFullTail(a, b, c, "inner"),
      "created FULL+inner-tail view != recompute")
    withFeed {
      // dA-driven anti flips, both directions, THROUGH the tail
      Seq((205L, "s1", 3L)).toDF("okey", "status", "cust")
        .write.format("lance").mode("append").save(a) // anti 205 retracts
      Lance.deleteWhere(spark, a, "okey IN (2, 3)")   // items flip anti
      // dB anti images through the tail (new matchless key in C's range)
      Seq((207L, 17.0, "t1"), (4L, 40.0, "t0")).toDF("o_key", "amount", "tag")
        .write.format("lance").mode("append").save(b)
      Lance.deleteWhere(spark, b, "o_key = 7")        // null re-extend
      // dC: the tail factor's own delta over the FULL prefix — touches
      // matched, source-only AND anti rows of the prefix
      Lance.updateWhere(spark, c, "k2 % 5 = 2", Map("w" -> "w + 100"))
      Lance.deleteWhere(spark, c, "k2 IN (11, 205)")  // drops an anti row's tail
      Seq((203L, 7.5, "gX")).toDF("k2", "w", "grp")
        .write.format("lance").mode("append").save(c)
    }
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "delta", s"expected delta, got $r")
    assertSame(MaterializedView.read(spark, view),
      recomputeFullTail(a, b, c, "inner"),
      "FULL+inner-tail view after three-sided window != recompute")
    assert(MaterializedView.refresh(spark, view).mode == "noop")
  }

  test("FULL head + LEFT tail keyed on the fact's attribute (chain)") {
    val a = tmpDir(); val b = tmpDir(); val c = tmpDir()
    val view = tmpDir() + "/v"
    seed(a, b)
    Seq((301L, 10.0, "t0"), (302L, 12.0, "t1")).toDF("o_key", "amount", "tag")
      .write.format("lance").mode("append").save(b)
    // tail keyed on B's tag attribute: anti rows carry tag, source-only
    // rows have tag NULL (never match, stay null-extended under LEFT)
    Seq(("t0", 1.5), ("t1", 2.5)).toDF("ctag", "cw")
      .write.format("lance").mode("overwrite").save(c)
    MaterializedView.create(spark, view, a, Seq("status"),
      Seq(AggSpec("count", "*", "n"), AggSpec("count", "amount", "nm"),
        AggSpec("sum", "amount", "amt"), AggSpec("sum", "cw", "scw")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"), "full"),
        JoinSpec(c, Map("tag" -> "ctag"), "left")))
    def recompute() = spark.read.format("lance").load(a)
      .join(spark.read.format("lance").load(b),
        col("okey") === col("o_key"), "full")
      .withColumn("okey", coalesce(col("okey"), col("o_key"))).drop("o_key")
      .join(spark.read.format("lance").load(c),
        col("tag") === col("ctag"), "left").drop("ctag")
      .groupBy("status")
      .agg(count(lit(1)).as("n"), count(col("amount")).as("nm"),
        Tables.dsum(col("amount")).as("amt"), Tables.dsum(col("cw")).as("scw"))
    assertSame(MaterializedView.read(spark, view), recompute(),
      "created FULL+left-chain view != recompute")
    withFeed {
      Seq((301L, "s1", 3L)).toDF("okey", "status", "cust")
        .write.format("lance").mode("append").save(a) // anti retract
      Lance.deleteWhere(spark, a, "okey IN (5, 9)")   // items flip anti
      Seq((404L, 44.0, "t9")).toDF("o_key", "amount", "tag")
        .write.format("lance").mode("append").save(b) // anti in, tag t9
                                                      // matchless in C
      Lance.deleteWhere(spark, b, "o_key = 11")       // null re-extend
      // dC over the chain: t9 arrives (0 -> >0 for every t9 prefix row,
      // matched AND anti), t1 leaves (>0 -> 0)
      Seq(("t9", 9.0)).toDF("ctag", "cw")
        .write.format("lance").mode("append").save(c)
      Lance.deleteWhere(spark, c, "ctag = 't1'")
    }
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "delta", s"expected delta, got $r")
    assertSame(MaterializedView.read(spark, view), recompute(),
      "FULL+left-chain view after three-sided window != recompute")
  }

  test("RIGHT head + INNER tail on the merged key refreshes exactly") {
    val a = tmpDir(); val b = tmpDir(); val c = tmpDir()
    val view = tmpDir() + "/v"
    seed(a, b)
    seedTail(c)
    Seq((205L, 10.0, "t0"), (206L, 12.0, "t1")).toDF("o_key", "amount", "tag")
      .write.format("lance").mode("append").save(b)
    MaterializedView.create(spark, view, a, Seq("grp"),
      Seq(AggSpec("count", "*", "n"), AggSpec("count", "cust", "na"),
        AggSpec("sum", "amount", "amt")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"), "right"),
        JoinSpec(c, Map("okey" -> "k2"), "inner")))
    def recompute() = spark.read.format("lance").load(a)
      .join(spark.read.format("lance").load(b),
        col("okey") === col("o_key"), "right")
      .withColumn("okey", coalesce(col("okey"), col("o_key"))).drop("o_key")
      .join(spark.read.format("lance").load(c),
        col("okey") === col("k2"), "inner").drop("k2")
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), count(col("cust")).as("na"),
        Tables.dsum(col("amount")).as("amt"))
    assertSame(MaterializedView.read(spark, view), recompute(),
      "created RIGHT+inner-tail view != recompute")
    withFeed {
      Seq((205L, "s1", 3L)).toDF("okey", "status", "cust")
        .write.format("lance").mode("append").save(a) // anti retract
      Lance.deleteWhere(spark, a, "okey IN (2, 3)")   // matched -> anti
      Seq((208L, 18.0, "t0")).toDF("o_key", "amount", "tag")
        .write.format("lance").mode("append").save(b) // anti insert
      Lance.deleteWhere(spark, b, "o_key = 206")      // anti delete
      Lance.updateWhere(spark, c, "k2 % 4 = 1", Map("grp" -> "'gY'"))
    }
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "delta", s"expected delta, got $r")
    assertSame(MaterializedView.read(spark, view), recompute(),
      "RIGHT+inner-tail view after three-sided window != recompute")
  }

  test("PROPERTY: random three-sided rounds on FULL head + inner tail stay exact") {
    val rnd = new scala.util.Random(1414)
    val a = tmpDir(); val b = tmpDir(); val c = tmpDir()
    val view = tmpDir() + "/v"
    seed(a, b)
    seedTail(c)
    Seq((203L, 10.0, "t0"), (205L, 12.0, "t1"), (999L, 3.0, "t0"))
      .toDF("o_key", "amount", "tag")
      .write.format("lance").mode("append").save(b)
    MaterializedView.create(spark, view, a, Seq("status", "grp"),
      Seq(AggSpec("count", "*", "n"), AggSpec("count", "amount", "nm"),
        AggSpec("sum", "amount", "amt"), AggSpec("sum", "w", "sw")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"), "full"),
        JoinSpec(c, Map("okey" -> "k2"), "inner")))
    var nextKey = 6000L
    (1 to 4).foreach { round =>
      withFeed {
        (1 to 2 + rnd.nextInt(3)).foreach { _ =>
          rnd.nextInt(8) match {
            case 0 => // source rows out: their items flip anti
              Lance.deleteWhere(spark, a, s"okey % 17 = ${rnd.nextInt(17)}")
            case 1 =>
              Lance.updateWhere(spark, a, s"okey % 13 = ${rnd.nextInt(13)}",
                Map("status" -> s"'s${rnd.nextInt(6)}'"))
            case 2 => // LAST matches out for a whole key class
              Lance.deleteWhere(spark, b, s"o_key % 9 = ${rnd.nextInt(9)}")
            case 3 =>
              Lance.updateWhere(spark, b, s"o_key % 7 = ${rnd.nextInt(7)}",
                Map("amount" -> s"amount + ${rnd.nextInt(50)}"))
            case 4 => // FIRST matches for previously matchless keys
              val k = rnd.nextInt(200)
              spark.read.format("lance").load(a)
                .filter(s"okey % 20 = $k % 20")
                .select(col("okey").as("o_key"),
                  (rand(k) * 10).cast("double").as("amount"),
                  lit(s"t${rnd.nextInt(4)}").as("tag"))
                .limit(5)
                .write.format("lance").mode("append").save(b)
            case 5 => // half of these are join-side-only keys (anti rows)
              val rows = (0 until 2).map { _ =>
                nextKey += 1
                (if (rnd.nextBoolean()) nextKey else 1L + rnd.nextInt(210),
                  rnd.nextDouble() * 50, s"t${rnd.nextInt(4)}")
              }
              rows.toDF("o_key", "amount", "tag")
                .write.format("lance").mode("append").save(b)
            case 6 => // tail-side churn: regroup, re-weight, drop keys
              rnd.nextInt(3) match {
                case 0 => Lance.updateWhere(spark, c,
                  s"k2 % 11 = ${rnd.nextInt(11)}",
                  Map("grp" -> s"'g${rnd.nextInt(5)}'"))
                case 1 => Lance.updateWhere(spark, c,
                  s"k2 % 6 = ${rnd.nextInt(6)}",
                  Map("w" -> s"w + ${rnd.nextInt(30)}"))
                case 2 => Lance.deleteWhere(spark, c,
                  s"k2 % 23 = ${rnd.nextInt(23)}")
              }
            case 7 =>
              Lance.compact(spark, if (rnd.nextBoolean()) a else b)
          }
        }
      }
      val r = MaterializedView.refresh(spark, view)
      assertSame(MaterializedView.read(spark, view),
        recomputeFullTail(a, b, c, "inner"),
        s"round $round (mode=${r.mode}): FULL+tail view diverged")
    }
  }
  test("streaming epochs into the JOIN side maintain the view per epoch") {
    // s135 proves per-epoch freshness streaming into the SOURCE side;
    // the view registers on EVERY joined table, so the exactly-once
    // sink's refresh-mvs commit must maintain it from the join side too
    val a = tmpDir(); val b = tmpDir(); val stage = tmpDir()
    val ck = tmpDir() + "/ck"; val view = tmpDir() + "/v"
    seed(a, b)
    MaterializedView.create(spark, view, a, Seq("status"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "amount", "amt")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"))))
    (1 to 3).foreach { i =>
      (1L to 40L).map(k => ((k * 5) % 200 + 1, 100.0 + i, s"e$i"))
        .toDF("o_key", "amount", "tag")
        .write.format("lance")
        .mode(if (i == 1) "overwrite" else "append").save(stage)
      val q = spark.readStream.format("lance").load(stage)
        .writeStream.format("lance")
        .option("checkpointLocation", ck)
        .option("write.refresh-mvs", "true")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(b)
      q.awaitTermination()
      assertSame(MaterializedView.read(spark, view), recompute(a, b),
        s"join view STALE after streaming epoch $i into the JOIN side")
    }
  }

  test("join-side merge-schema evolution mid-window keeps the delta exact") {
    // the s134 contract from the JOIN side: an evolved append (new
    // column the view never names) inside a DML window must not break
    // the feed's end-schema re-reads or the delta math
    val a = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    seed(a, b)
    MaterializedView.create(spark, view, a, Seq("status"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "amount", "amt")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"))))
    withFeed {
      Seq((7L, 70.0, "t9", "web"), (11L, 11.5, "t0", "app"))
        .toDF("o_key", "amount", "tag", "channel")
        .write.format("lance").option("write.merge-schema", "true")
        .mode("append").save(b)
      Lance.deleteWhere(spark, b, "o_key % 9 = 2")
      Lance.updateWhere(spark, a, "okey % 5 = 1", Map("status" -> "'s9'"))
    }
    val r = MaterializedView.refresh(spark, view)
    assert(r.mode == "delta", s"expected delta across the evolution, got $r")
    assertSame(MaterializedView.read(spark, view), recompute(a, b),
      "join view drifted across a join-side merge-schema window")
  }

  test("FULL fact join composes with pinned star dims; fullRefresh rebuilds") {
    val a = tmpDir(); val b = tmpDir(); val d = tmpDir(); val view = tmpDir() + "/v"
    seed(a, b) // okey % 4 == 0 itemless
    Seq((900L, 9.0, "t0"), (901L, 9.5, "t1")).toDF("o_key", "amount", "tag")
      .write.format("lance").mode("append").save(b) // orderless items
    (0 until 4).map(i => (s"s$i", s"seg${i % 2}")).toDF("d_status", "segment")
      .write.format("lance").mode("overwrite").save(d)
    MaterializedView.create(spark, view, a, Seq("segment"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "amount", "amt")),
      dims = Seq(MaterializedView.DimSpec(d, Map("status" -> "d_status"))),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"), "full")))
    // anti rows carry NULL status -> NULL segment (dims enrich AFTER the
    // join, identically on create / delta / flip / anti paths)
    def recompute() = spark.read.format("lance").load(a)
      .join(spark.read.format("lance").load(b),
        col("okey") === col("o_key"), "full").drop("o_key")
      .join(broadcast(spark.read.format("lance").load(d)),
        col("status") === col("d_status"), "left").drop("d_status")
      .groupBy("segment")
      .agg(count(lit(1)).as("n"), Tables.dsum(col("amount")).as("amt"))
    assertSame(MaterializedView.read(spark, view), recompute(),
      "created FULL+dim view != recompute")
    withFeed {
      Seq((900L, "s1", 3L)).toDF("okey", "status", "cust")
        .write.format("lance").mode("append").save(a) // anti retract
      Lance.deleteWhere(spark, a, "okey % 19 = 4")    // items flip anti
      Seq((4L, 77.0, "tX")).toDF("o_key", "amount", "tag")
        .write.format("lance").mode("append").save(b) // null row retract
      Lance.deleteWhere(spark, b, "o_key IN (2, 6, 901)")
    }
    assert(MaterializedView.refresh(spark, view).mode == "delta")
    assertSame(MaterializedView.read(spark, view), recompute(),
      "FULL+dim view after both-side crossings != recompute")
    // fullRefresh rebuilds through the declared full join
    val r = MaterializedView.fullRefresh(spark, view)
    assert(r.mode == "full")
    assertSame(MaterializedView.read(spark, view), recompute(),
      "FULL view fullRefresh != recompute")
    assert(MaterializedView.refresh(spark, view).mode == "noop")
  }
  test("filtered FULL join view: the WHERE applies per image on every term") {
    val a = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    seed(a, b)
    Seq((301L, 10.0, "t0"), (302L, 95.0, "t0")).toDF("o_key", "amount", "tag")
      .write.format("lance").mode("append").save(b) // join-side-only keys
    // keeps null-extended rows AND caps amounts: both sides of the
    // predicate see anti/null rows
    val where = Some("amount IS NULL OR amount < 90")
    MaterializedView.create(spark, view, a, Seq("status"),
      Seq(AggSpec("count", "*", "n"), AggSpec("sum", "amount", "amt")),
      where = where,
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"), "full")))
    def recompute() = spark.read.format("lance").load(a)
      .join(spark.read.format("lance").load(b),
        col("okey") === col("o_key"), "full")
      .filter("amount IS NULL OR amount < 90")
      .groupBy("status")
      .agg(count(lit(1)).as("n"), Tables.dsum(col("amount")).as("amt"))
    assertSame(MaterializedView.read(spark, view), recompute(),
      "created filtered FULL view != recompute")
    withFeed {
      // cross the WHERE boundary in both directions, on matched AND
      // anti rows, plus zero crossings
      Lance.updateWhere(spark, b, "o_key % 13 = 2",
        Map("amount" -> "amount + 200")) // leaves the predicate
      Lance.updateWhere(spark, b, "o_key = 302",
        Map("amount" -> "5.0"))          // anti row enters the predicate
      Seq((301L, "s1", 3L)).toDF("okey", "status", "cust")
        .write.format("lance").mode("append").save(a) // anti retract
      Lance.deleteWhere(spark, a, "okey IN (2, 3)")   // items flip anti
      Lance.deleteWhere(spark, b, "o_key = 7")        // null re-extend
    }
    assert(MaterializedView.refresh(spark, view).mode == "delta")
    assertSame(MaterializedView.read(spark, view), recompute(),
      "filtered FULL view after boundary+zero crossings != recompute")
  }
  test("PROPERTY: random two-sided rounds on a RIGHT join view stay exact") {
    // RIGHT = INNER + the anti side WITHOUT the source-null flips: the
    // same churn mix as the FULL twin, verifying the anti terms compose
    // with a no-left-part plan across random interleavings
    val rnd = new scala.util.Random(4711)
    val a = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    seed(a, b)
    Seq((301L, 10.0, "t0"), (302L, 12.0, "t1")).toDF("o_key", "amount", "tag")
      .write.format("lance").mode("append").save(b)
    MaterializedView.create(spark, view, a, Seq("tag"),
      Seq(AggSpec("count", "*", "n"), AggSpec("count", "cust", "na"),
        AggSpec("sum", "amount", "amt")),
      joins = Seq(JoinSpec(b, Map("okey" -> "o_key"), "right")))
    var nextKey = 7000L
    (1 to 3).foreach { round =>
      withFeed {
        (1 to 2 + rnd.nextInt(3)).foreach { _ =>
          rnd.nextInt(6) match {
            case 0 =>
              Lance.deleteWhere(spark, a, s"okey % 17 = ${rnd.nextInt(17)}")
            case 1 =>
              Lance.updateWhere(spark, a, s"okey % 13 = ${rnd.nextInt(13)}",
                Map("cust" -> s"cust + ${rnd.nextInt(5)}"))
            case 2 =>
              Lance.deleteWhere(spark, b, s"o_key % 9 = ${rnd.nextInt(9)}")
            case 3 =>
              Lance.updateWhere(spark, b, s"o_key % 7 = ${rnd.nextInt(7)}",
                Map("amount" -> s"amount + ${rnd.nextInt(50)}"))
            case 4 =>
              val rows = (0 until 2).map { _ =>
                nextKey += 1
                (if (rnd.nextBoolean()) nextKey else 1L + rnd.nextInt(200),
                  rnd.nextDouble() * 50, s"t${rnd.nextInt(4)}")
              }
              rows.toDF("o_key", "amount", "tag")
                .write.format("lance").mode("append").save(b)
            case 5 =>
              Lance.compact(spark, if (rnd.nextBoolean()) a else b)
          }
        }
      }
      val r = MaterializedView.refresh(spark, view)
      val expect = spark.read.format("lance").load(a)
        .join(spark.read.format("lance").load(b),
          col("okey") === col("o_key"), "right")
        .groupBy("tag")
        .agg(count(lit(1)).as("n"), count(col("cust")).as("na"),
          Tables.dsum(col("amount")).as("amt"))
      assertSame(MaterializedView.read(spark, view), expect,
        s"round $round (mode=${r.mode}): RIGHT join view diverged")
    }
  }
  test("FULL join view with SAME-NAME key columns (okey = okey)") {
    // the merged-key projection must resolve by ATTRIBUTE: a name-based
    // withColumn would replace BOTH copies of the shared name and leave
    // a duplicate column behind (round-13 review finding)
    val a = tmpDir(); val b = tmpDir(); val view = tmpDir() + "/v"
    Seq((1L, "s0", 0L), (2L, "s0", 1L)).toDF("okey", "status", "cust")
      .write.format("lance").mode("overwrite").save(a)
    Seq((2L, 5.0), (2L, 7.0), (9L, 4.0)).toDF("okey", "amount")
      .write.format("lance").mode("overwrite").save(b)
    MaterializedView.create(spark, view, a, Seq("okey"),
      Seq(AggSpec("count", "*", "n"), AggSpec("count", "cust", "nc"),
        AggSpec("sum", "amount", "amt")),
      joins = Seq(JoinSpec(b, Map("okey" -> "okey"), "full")))
    def rows() = MaterializedView.read(spark, view).orderBy("okey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)))).toSeq
    assert(rows() == Seq((1L, 1L, 1L, None), (2L, 2L, 2L, Some(12.0)),
      (9L, 1L, 0L, Some(4.0))), rows().toString)
    withFeed {
      Seq((9L, "s9", 5L)).toDF("okey", "status", "cust")
        .write.format("lance").mode("append").save(a) // anti retract
      Lance.deleteWhere(spark, b, "okey = 2")         // null re-extend
    }
    assert(MaterializedView.refresh(spark, view).mode == "delta")
    assert(rows() == Seq((1L, 1L, 1L, None), (2L, 1L, 1L, None),
      (9L, 1L, 1L, Some(4.0))), rows().toString)
  }
}
