package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Scratch dev tool (delete freely): per-Spark-job wall-time breakdown of a
  * gate body. Runs the named gates exactly as the bench does (gate body +
  * noop materialization), with a listener that attributes every job to its
  * call site, so a 10-second "setup" is decomposable into the writes /
  * index builds / counts that compose it.
  *
  * usage: sbt 'Test/runMain graft.DevGateProfile s111 [sfDir]'
  */
object DevGateProfile {
  def main(args: Array[String]): Unit = {
    val pats = args.headOption.getOrElse("s111").split(',').toSeq
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // job id -> (start ns, callsite)
    val starts = mutable.Map.empty[Int, (Long, String)]
    val rows = mutable.ArrayBuffer.empty[(String, Double)] // callsite, sec
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        // attribute the job to its first graft.* stack frame (stage details
        // carry the creation-site stack trace)
        val site = j.stageInfos.lastOption.map(_.details).flatMap { d =>
          d.split('\n').find(l => l.contains("graft.") &&
            !l.contains("DevGateProfile"))
        }.map(_.trim).orElse {
          // no graft frame (broadcast/AQE/internal thread): name the exec
          // node that submitted it
          j.stageInfos.lastOption.map(_.details).flatMap(
            _.split('\n').find(l => l.contains("Exec") ||
              l.contains("execution."))).map(_.trim)
        }.getOrElse("?")
        starts(j.jobId) = (System.nanoTime(), site)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, site) =>
          rows += ((site, (System.nanoTime() - t0) / 1e9))
        }
    })

    val selected = SparkEntry.queries.filter { case (n, _) =>
      pats.exists(n.contains)
    }.toSeq.sortBy(_._1)
    selected.foreach { case (name, fn) =>
      // cold run un-profiled (codegen warm-up), then one profiled warm run
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      rows.clear()
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"== $name total=${(t2 - t0) / 1e9}%.2f s " +
        f"(setup=${(t1 - t0) / 1e9}%.2f, query=${(t2 - t1) / 1e9}%.2f), " +
        s"${rows.size} jobs ==")
      // jobs in execution order with their individual durations
      rows.zipWithIndex.foreach { case ((site, sec), i) =>
        if (sec >= 0.02) println(f"  job#$i%03d $sec%6.3f s  $site")
      }
      val agg = rows.groupBy(_._1).view
        .mapValues(v => (v.size, v.map(_._2).sum)).toSeq.sortBy(-_._2._2)
      println("  -- by call site --")
      agg.foreach { case (site, (n, sec)) =>
        println(f"  $sec%7.3f s  x$n%-4d $site")
      }
    }
    spark.stop()
  }
}
