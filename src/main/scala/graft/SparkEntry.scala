package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator family contributes a bundle of (query, oracle) pairs; this
  * object is just the union. The driver runs every `queries` entry at
  * sf0.01 via [[Verify]] and hash-compares against `oracleSql` run in
  * DuckDB over the same parquet tables.
  */
object SparkEntry {

  private def bundles: Seq[(Map[String, (SparkSession, String) => DataFrame],
    Map[String, String])] = Seq(
    (operators.Relational.queries, operators.Relational.oracleSql),
    (operators.Similarity.queries, operators.Similarity.oracleSql),
    (operators.TextAnalysis.queries, operators.TextAnalysis.oracleSql),
    (operators.Dedup.queries, operators.Dedup.oracleSql),
    (operators.LanceQueries.queries, operators.LanceQueries.oracleSql),
    (operators.Multimodal.queries, operators.Multimodal.oracleSql),
    (operators.TpchQueries.queries, operators.TpchQueries.oracleSql),
    (operators.TpcdsQueries.queries, operators.TpcdsQueries.oracleSql),
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q01AggLineitem(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    bundles.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    bundles.map(_._2).reduce(_ ++ _)

  /** Dev-only subset filter shared by Verify and Bench: comma-separated
    * substrings in `envVar` select matching queries; unset (the driver
    * case) runs everything. Blank patterns are ignored so a stray "" or
    * trailing comma cannot silently select all, and an active filter
    * banners loudly on stderr — a leaked env var must never quietly
    * narrow a correctness or bench run.
    */
  def selectQueries(envVar: String): Map[String, (SparkSession, String) => DataFrame] = {
    val pats = sys.env.get(envVar).toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    if (pats.isEmpty) queries
    else {
      System.err.println(s"[graft] $envVar=${pats.mkString(",")} — running a " +
        s"SUBSET of the ${queries.size} queries (dev mode; unset for a full run)")
      queries.filter { case (n, _) => pats.exists(n.contains) }
    }
  }
}
