package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch dev tool: ANN recall curves — recall@10 vs nprobes (IVF) and
  * vs ef (HNSW) over a fixed query set, against the brute-force exact
  * top-10. Run on the 10× corpus to record the README table and the v45
  * gate's floors:
  *
  *   sbt -batch 'Test/runMain graft.DevRecallCurve target/sf1.0'
  *
  * Args: sfDir [numQueries].
  */
object DevRecallCurve {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf1.0")
    val nq = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dest = graft.operators.Similarity.devEnsureIvfHnsw(spark, dir)
    val emb = graft.Tables.t(spark, dir, "embeddings")

    val queries: Seq[(Long, Array[Float])] = emb.filter(col("vec_id") < nq)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    require(queries.nonEmpty, s"no query vectors under vec_id < $nq in $dir")

    def exactIds(q: Array[Float]): Set[Long] =
      emb.select(col("vec_id"),
        graft.functions.VectorFunctions.l2_distance(col("embedding"),
          lit(q.map(_.toDouble))).as("d"))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSet
    val truth: Map[Long, Set[Long]] =
      queries.map { case (id, q) => id -> exactIds(q) }.toMap

    def recall(ids: Set[Long], qid: Long): Double =
      ids.intersect(truth(qid)).size / 10.0

    Console.out.println(s"[recall] $dir  ${queries.size} queries, k=10, 8 buckets")
    Console.out.println("| index | knob | mean recall@10 |")
    Console.out.println("|---|---|---|")
    for (np <- Seq(1, 2, 4, 8)) {
      val r = queries.map { case (qid, q) =>
        val ids = graft.index.IvfIndex.search(spark, dest, "embedding", q, 10,
          nprobes = np).select(col("vec_id")).collect().map(_.getLong(0)).toSet
        recall(ids, qid)
      }.sum / queries.size
      Console.out.println(f"| IVF_FLAT | nprobes=$np | $r%.3f |")
    }
    for (ef <- Seq(8, 16, 32, 64, 128)) {
      val r = queries.map { case (qid, q) =>
        val ids = graft.index.HnswIndex.search(spark, dest, "embedding", q, 10,
          nprobes = 4, ef = ef).select(col("vec_id")).collect().map(_.getLong(0)).toSet
        recall(ids, qid)
      }.sum / queries.size
      Console.out.println(f"| IVF_HNSW | nprobes=4 ef=$ef | $r%.3f |")
    }
    spark.stop()
  }
}
