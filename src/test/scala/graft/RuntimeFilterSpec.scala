package graft

import graft.connector.LanceParquetScan
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Runtime (dynamic) fragment pruning — `SupportsRuntimeV2Filtering`,
  * the DPP hook: in a star join, the broadcast dim side's join keys are
  * collected at EXECUTION time and handed to the fact scan as an IN
  * predicate, which re-prunes the fragment list through the same
  * manifest-stats / value-set / scalar-index layers the static path
  * uses. Static pushdown can never see these keys (they exist only
  * after the dim filter runs). Contracts pinned here:
  *  - filter(IN) drops fragments whose bounds exclude every key;
  *    planInputPartitions reflects it; results stay correct
  *  - untranslatable predicates leave the partition list unchanged
  *  - an end-to-end broadcast star join injects the runtime filter and
  *    actually prunes (runtimeKeptCount < fragment count)
  */
class RuntimeFilterSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "rtf-")
      .toAbsolutePath.toString

  /** A lance table with range-disjoint fragments on `k` (0..3999 over 8
    * files of 500), so an IN over a narrow key set can prove most
    * fragments irrelevant.
    */
  private def writeFact(dir: String): Unit =
    spark.range(0, 4000).select(col("id").as("k"),
        (col("id") % 97).as("payload"))
      .orderBy(col("k"))
      .coalesce(1)
      .write.format("lance")
      .option("write.max-rows-per-file", "500")
      .mode("overwrite").save(dir)

  private def scanOf(plan: SparkPlan): LanceParquetScan = {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    def walk(p: SparkPlan): Seq[BatchScanExec] = {
      val here = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case b: BatchScanExec => Seq(b)
        case other => other.children.flatMap(walk)
      }
      here ++ p.subqueries.flatMap(walk)
    }
    // a star join holds TWO lance scans (fact + broadcast dim); the fact
    // side is the one carrying `payload`
    val scans = walk(plan).map(_.scan).collect {
      case l: LanceParquetScan
          if l.readSchema().fieldNames.contains("payload") => l
    }
    assert(scans.nonEmpty, s"no fact LanceParquetScan in:\n$plan")
    scans.head
  }

  test("filter(IN) prunes partitions; unknown predicates are no-ops") {
    val dir = tmpDir() + "/fact"
    writeFact(dir)
    val df = spark.read.format("lance").load(dir).select(col("k"), col("payload"))
    val scan = scanOf(df.queryExecution.executedPlan)
    val before = scan.planInputPartitions().length
    assert(before > 1, s"want multiple partitions, got $before")
    assert(scan.filterAttributes().map(_.fieldNames.head).toSet == Set("k", "payload"))

    // keys land in the first fragment (0..499) only
    scan.filter(Array(new Predicate("IN",
      Array[org.apache.spark.sql.connector.expressions.Expression](
        Expressions.column("k"),
        Expressions.literal(5L), Expressions.literal(17L)))))
    assert(scan.runtimeKeptCount.contains(1),
      s"want 1 fragment kept, got ${scan.runtimeKeptCount}")
    val after = scan.planInputPartitions().length
    assert(after < before, s"$after vs $before")

    // the pruned scan still returns exactly the matching rows
    val rows = df.filter(col("k").isin(5L, 17L)).collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(5L, 17L))

    // a predicate shape we can't translate must not change anything
    // (fresh read: queryExecution is cached, so df would reuse scan)
    val df2 = spark.read.format("lance").load(dir).select(col("k"), col("payload"))
    val scan2 = scanOf(df2.queryExecution.executedPlan)
    scan2.filter(Array(new Predicate("=",
      Array[org.apache.spark.sql.connector.expressions.Expression](
        Expressions.column("k"), Expressions.column("payload")))))
    assert(scan2.runtimeKeptCount.isEmpty)
    assert(scan2.planInputPartitions().length == before)
  }

  /** A dim TABLE (not a foldable in-memory relation — the optimizer
    * turns those into a static key predicate on the fact side, and DPP
    * correctly has nothing left to do): `region` decides survival, so
    * the surviving key set exists only at execution time.
    */
  private def writeDim(dir: String): Unit =
    spark.range(0, 4000, 800).select(col("id").as("k"),
        when(col("id") === 800, lit("west")).otherwise(lit("east")).as("region"))
      .coalesce(1)
      .write.format("lance").mode("overwrite").save(dir)

  test("broadcast star join injects the runtime filter and prunes fragments") {
    val base = tmpDir()
    val dir = base + "/fact"
    writeFact(dir)
    writeDim(base + "/dim")
    val fact = spark.read.format("lance").load(dir)
    val dim = spark.read.format("lance").load(base + "/dim")
    val joined = fact.join(dim.filter(col("region") === "west"), "k")
      .agg(sum("payload").as("s"), count(lit(1)).as("n"))

    val res = joined.collect()
    assert(res.head.getLong(1) == 1L)
    assert(res.head.getLong(0) == 800L % 97)

    val scan = scanOf(joined.queryExecution.executedPlan)
    // the dim side was broadcast, so DPP reused it: our filter() ran and
    // kept only the fragment holding k=800
    assert(scan.runtimeKeptCount.contains(1),
      s"runtime filter did not prune: ${scan.runtimeKeptCount}")
  }

  test("scan statistics report the manifest's exact row count") {
    val dir = tmpDir() + "/fact"
    writeFact(dir)
    val df = spark.read.format("lance").load(dir).select(col("k"), col("payload"))
    val scan = scanOf(df.queryExecution.executedPlan)
    val st = scan.estimateStatistics()
    assert(st.numRows.isPresent && st.numRows.getAsLong == 4000L, s"$st")
    assert(st.sizeInBytes.isPresent && st.sizeInBytes.getAsLong > 0)
    // a pushed filter makes the manifest count an overestimate — the scan
    // must then fall back to the engine's bytes-only answer, not claim it
    val filtered = spark.read.format("lance").load(dir)
      .filter(col("k") < 100L).select(col("k"), col("payload"))
    val fscan = scanOf(filtered.queryExecution.executedPlan)
    assert(!fscan.estimateStatistics().numRows.isPresent)
  }

  test("runtime pruning composes with a renamed column") {
    val base = tmpDir()
    val dir = base + "/fact"
    writeFact(dir)
    Lance.renameColumn(spark, dir, "k", "key")
    writeDim(base + "/dim")
    Lance.renameColumn(spark, base + "/dim", "k", "key")
    val fact = spark.read.format("lance").load(dir)
    val dim = spark.read.format("lance").load(base + "/dim")
    val joined = fact.join(dim.filter(col("region") === "west"), "key")
      .agg(sum("payload").as("s"))
    val rows = joined.collect()
    assert(rows.head.getLong(0) == 800L % 97)
    val scan = scanOf(joined.queryExecution.executedPlan)
    assert(scan.runtimeKeptCount.contains(1), s"${scan.runtimeKeptCount}")
  }
}
