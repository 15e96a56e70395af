package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialize a 10× (≈sf1.0) replica of the sf0.1 testdata into
  * `target/sf1.0`, FK-consistently: every key column shifts by
  * `copy × (max_key + 1)` so uniqueness, join fan-outs, and per-group
  * sizes are preserved exactly (an order still has the same lineitems,
  * a user the same events). Dimension tables (region, nation) stay as
  * they are — that is what scaling a star schema means. Text and
  * embedding payloads replicate verbatim, the same convention the
  * recorded sf1.0 probes (dev/DevRecallCurve, DevRound9Scale) used —
  * near-dup pair counts therefore inflate quadratically BY
  * CONSTRUCTION on the replicated corpus; the README bench notes call
  * those entries out.
  *
  *   sbt -batch 'Test/runMain graft.DevSf1Gen'
  */
object DevSf1Gen {
  val Copies = 10

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val out = "target/sf1.0"

    def read(name: String) = spark.read.parquet(s"$src/$name.parquet")
    def base(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).collect()(0).getLong(0) + 1L

    /** Replicate with per-copy shifts on the named int64 key columns. */
    def replicate(name: String, shifts: Map[String, Long], files: Int): Unit = {
      val t0 = System.nanoTime()
      val df = read(name)
      val copies = (0 until Copies).map { i =>
        shifts.foldLeft(df) { case (d, (k, b)) =>
          d.withColumn(k, col(k) + lit(i * b)) }
      }
      copies.reduce(_ unionByName _).coalesce(files)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      Console.err.println(f"[sf1gen] $name%-12s x$Copies in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1fs")
    }

    val oBase = base(read("orders"), "o_orderkey")
    val cBase = base(read("customer"), "c_custkey")
    val sBase = base(read("supplier"), "s_suppkey")
    val pBase = base(read("part"), "p_partkey")
    val eBase = base(read("events"), "event_id")
    val uBase = base(read("events"), "user_id")
    val dBase = base(read("documents"), "doc_id")
    val vBase = base(read("embeddings"), "vec_id")

    // dims copy verbatim (scaling a star schema grows facts, not dims)
    Seq("region", "nation").foreach { n =>
      read(n).write.mode("overwrite").parquet(s"$out/$n.parquet") }
    replicate("customer", Map("c_custkey" -> cBase), 4)
    replicate("supplier", Map("s_suppkey" -> sBase), 2)
    replicate("part", Map("p_partkey" -> pBase), 4)
    replicate("orders", Map("o_orderkey" -> oBase, "o_custkey" -> cBase), 8)
    replicate("lineitem", Map("l_orderkey" -> oBase, "l_partkey" -> pBase,
      "l_suppkey" -> sBase), 16)
    replicate("events", Map("event_id" -> eBase, "user_id" -> uBase), 8)
    replicate("documents", Map("doc_id" -> dBase), 8)
    replicate("embeddings", Map("vec_id" -> vBase), 8)
    spark.stop()
  }
}
