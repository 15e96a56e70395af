package graft

import graft.format.{FragmentMeta, LanceFormat}
import org.apache.hadoop.fs.Path

/** Manifest-layer scale probe: commit cost and manifest bytes at a
  * 50k-fragment table, two-level groups vs forced inline. Metadata-only
  * measurements — fragment entries are synthetic (stats included, the
  * realistic per-entry weight); no data files are written or read.
  *
  *   sbt -batch 'Test/runMain graft.DevManifestScale'
  */
object DevManifestScale {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val conf = spark.sessionState.newHadoopConf()

    def frag(i: Int) = FragmentMeta(i, f"frag-$i%08d.parquet", 1000000L,
      stats = Some(Map(
        "k" -> graft.format.ColStats(Some((i * 1000L).toString),
          Some((i * 1000L + 999).toString), 0, None),
        "s" -> graft.format.ColStats(Some(f"a$i%08d"), Some(f"z$i%08d"), 10, None))))

    val schema = new org.apache.spark.sql.types.StructType()
      .add("k", org.apache.spark.sql.types.LongType)
      .add("s", org.apache.spark.sql.types.StringType)

    def run(label: String, inlineThreshold: Int): Unit = {
      val saved = LanceFormat.inlineFragmentThreshold
      LanceFormat.inlineFragmentThreshold = inlineThreshold
      try {
        val dir = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get("target"), s"mscale-$label-").toAbsolutePath.toString
        val root = new Path(dir)
        val fs = LanceFormat.fileSystem(root, conf)
        val base = (0 until 50000).map(frag)
        val t0 = System.nanoTime()
        LanceFormat.commitAppendIn(fs, LanceFormat.versionsPath(root), schema, base)
        val bulkMs = (System.nanoTime() - t0) / 1e6
        // ten incremental appends of 10 fragments each — the steady state
        val t1 = System.nanoTime()
        (0 until 10).foreach { j =>
          LanceFormat.commitAppendIn(fs, LanceFormat.versionsPath(root), schema,
            (0 until 10).map(i => frag(50000 + j * 10 + i)))
        }
        val appendMs = (System.nanoTime() - t1) / 1e6 / 10
        val latest = LanceFormat.latestVersion(fs, root).get
        val mBytes = fs.getFileStatus(
          new Path(LanceFormat.versionsPath(root), s"$latest.manifest.json")).getLen
        val gDir = LanceFormat.groupsPath(root)
        val (gCount, gBytes) =
          if (fs.exists(gDir)) {
            val st = fs.listStatus(gDir)
            (st.length, st.map(_.getLen).sum)
          } else (0, 0L)
        // cold resolve (drop cache effects by reading through a fresh fs
        // object; group cache inside LanceFormat still applies — report
        // both cold-ish and warm)
        val t2 = System.nanoTime()
        val m = LanceFormat.readManifest(fs, root, latest)
        val readMs = (System.nanoTime() - t2) / 1e6
        val t3 = System.nanoTime()
        LanceFormat.readManifest(fs, root, latest)
        val warmMs = (System.nanoTime() - t3) / 1e6
        println(f"[$label] fragments=${m.fragments.size} bulkCommit=${bulkMs}%.0fms " +
          f"appendCommit=${appendMs}%.1fms/commit manifestBytes=$mBytes " +
          f"groupFiles=$gCount groupBytes=$gBytes read=${readMs}%.0fms warm=${warmMs}%.0fms")
      } finally LanceFormat.inlineFragmentThreshold = saved
    }

    run("inline", inlineThreshold = Int.MaxValue)
    run("groups", inlineThreshold = 1000)
    spark.stop()
  }
}
