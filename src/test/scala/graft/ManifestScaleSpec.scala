package graft

import graft.format.LanceFormat
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Two-level manifests: above `inlineFragmentThreshold` the on-disk
  * manifest stores only content-addressed group-file refs
  * (`_groups/g-<sha1>.json`); the fragment list resolves transparently
  * on read. Content addressing makes commit cost proportional to what
  * CHANGED — the million-fragment table's append writes one small
  * manifest plus at most one partial tail chunk, not a gigabyte JSON.
  * Contracts pinned here (thresholds lowered for the tests):
  *  - above-threshold manifests hold no inline fragments on disk; reads
  *    resolve them back identically (round-trip, time travel included)
  *  - an append reuses every full prefix chunk BY NAME and adds at most
  *    two files (rewritten tail + new tail)
  *  - a metadata-only commit (bucket spec declaration) writes ZERO new
  *    group files
  *  - vacuum deletes group files only dropped versions referenced,
  *    never ones shared with retained versions or branches
  *  - removeOrphans reclaims unreferenced (race-loser) group files
  *  - a branch fork reuses the base's groups by reference (O(1) fork)
  */
class ManifestScaleSpec extends AnyFunSuite {
  import TestSpark._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "mfscale-")
      .toAbsolutePath.toString

  private def fs(dir: String) =
    LanceFormat.fileSystem(new Path(dir), spark.sessionState.newHadoopConf())

  private def rawManifest(dir: String, v: Long): String = {
    val p = new Path(s"$dir/_versions/$v.manifest.json")
    val f = fs(dir)
    val in = f.open(p)
    try {
      val bytes = new Array[Byte](f.getFileStatus(p).getLen.toInt)
      in.readFully(0L, bytes)
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  private def groupFiles(dir: String): Set[String] = {
    val gp = LanceFormat.groupsPath(new Path(dir))
    val f = fs(dir)
    if (!f.exists(gp)) Set.empty
    else f.listStatus(gp).map(_.getPath.getName).toSet
  }

  private def withSmallGroups[T](inline: Int, perGroup: Int)(body: => T): T = {
    val (i0, g0) = (LanceFormat.inlineFragmentThreshold, LanceFormat.fragmentsPerGroup)
    LanceFormat.inlineFragmentThreshold = inline
    LanceFormat.fragmentsPerGroup = perGroup
    try body finally {
      LanceFormat.inlineFragmentThreshold = i0
      LanceFormat.fragmentsPerGroup = g0
    }
  }

  test("spill, round-trip, O(changed) appends, metadata reuse") {
    withSmallGroups(10, 8) {
      val dir = tmpDir()
      // 24 fragments → 3 full chunks
      spark.range(0, 240).select(col("id").as("k"))
        .repartition(4)
        .write.format("lance").option("write.max-rows-per-file", "10")
        .mode("overwrite").save(dir)
      val m1 = LanceFormat.readLatest(fs(dir), new Path(dir)).get
      val n1 = m1.fragments.size
      assert(n1 >= 24, s"want >=24 fragments, got $n1") // 4 tasks x ~6 rolls
      val chunks1 = (n1 + 7) / 8
      assert(m1.fragmentGroups.exists(_.size == chunks1), m1.fragmentGroups)
      // the on-disk manifest carries refs, not fragments
      val raw = rawManifest(dir, m1.version)
      assert(!raw.contains("frag-"), "manifest still inlines fragments")
      assert(raw.contains("g-"), "manifest has no group refs")
      // round-trip: resolved fragments match the data
      assert(spark.read.format("lance").load(dir).count() == 240)
      val before = groupFiles(dir)
      assert(before.size == chunks1)

      // append ~8 more fragments: every FULL prefix chunk reused by
      // name; only the partial tail rewrites, plus new tail chunks
      spark.range(240, 320).select(col("id").as("k"))
        .repartition(2)
        .write.format("lance").option("write.max-rows-per-file", "10")
        .mode("append").save(dir)
      val m2 = LanceFormat.readLatest(fs(dir), new Path(dir)).get
      assert(m2.fragments.size > n1)
      val after = groupFiles(dir)
      assert(m1.fragmentGroups.get.toSet.subsetOf(after),
        "append rewrote previously-committed full chunks")
      val added = m2.fragments.size - n1
      assert((after -- before).size <= added / 8 + 2,
        s"append added ${(after -- before).size} group files for $added fragments")
      val fullPrefix = n1 / 8 // chunks untouched by the append
      assert(m2.fragmentGroups.get.take(fullPrefix) ==
        m1.fragmentGroups.get.take(fullPrefix),
        "prefix chunk names changed on append")

      // metadata-only commit: every group reused, zero new files
      LanceFormat.commitBucketBy(fs(dir), new Path(dir), 4, Seq("k"))
      val m3 = LanceFormat.readLatest(fs(dir), new Path(dir)).get
      assert(m3.fragmentGroups == m2.fragmentGroups)
      assert(groupFiles(dir) == after, "metadata commit wrote group files")

      // time travel: the first version still resolves through its groups
      val v1 = spark.read.format("lance")
        .option("versionAsOf", m1.version.toString).load(dir)
      assert(v1.count() == 240)
    }
  }

  test("vacuum GCs dropped-only groups; shared and branch groups survive") {
    withSmallGroups(5, 4) {
      val dir = tmpDir()
      spark.range(0, 80).select(col("id").as("k"))
        .coalesce(1)
        .write.format("lance").option("write.max-rows-per-file", "10")
        .mode("overwrite").save(dir) // v1: 8 fragments → 2 chunks
      val g1 = groupFiles(dir)
      assert(g1.size == 2)
      // branch forks at v1 → pins v1's groups whatever main does
      LanceFormat.createBranch(fs(dir), new Path(dir), "exp")
      // v2 OVERWRITE: fresh fragments, all-new groups
      spark.range(0, 60).select(col("id").as("k"))
        .coalesce(1)
        .write.format("lance").option("write.max-rows-per-file", "10")
        .mode("overwrite").save(dir)
      // v3 append on top of v2 (shares v2's prefix chunk)
      spark.range(60, 100).select(col("id").as("k"))
        .coalesce(1)
        .write.format("lance").option("write.max-rows-per-file", "10")
        .mode("append").save(dir)
      val m3 = LanceFormat.readLatest(fs(dir), new Path(dir)).get
      // vacuum to 1 version: v1+v2 manifests drop; v1's groups survive
      // ONLY via the branch pin; v3's groups survive
      LanceFormat.vacuum(fs(dir), new Path(dir), keepVersions = 1)
      val left = groupFiles(dir)
      assert(m3.fragmentGroups.get.toSet.subsetOf(left))
      assert(g1.subsetOf(left), "branch-pinned groups were vacuumed")
      // branch still reads
      assert(spark.read.format("lance").option("branch", "exp").load(dir)
        .count() == 80)
      // drop the branch: its groups become orphans for removeOrphans
      LanceFormat.deleteBranch(fs(dir), new Path(dir), "exp")
      val (_, removed) = LanceFormat.removeOrphans(fs(dir), new Path(dir), 0L)
      val finalGroups = groupFiles(dir)
      assert(m3.fragmentGroups.get.toSet.subsetOf(finalGroups))
      assert((g1 -- m3.fragmentGroups.get.toSet)
        .forall(!finalGroups.contains(_)),
        s"orphan groups survived removeOrphans (removed=$removed)")
      assert(spark.read.format("lance").load(dir).count() == 100)
    }
  }

  test("scan planning is metadata-only when the manifest recorded sizes") {
    val dir = tmpDir()
    spark.range(0, 100).select(col("id").as("k"))
      .write.format("lance").mode("overwrite").save(dir)
    val m = LanceFormat.readLatest(fs(dir), new Path(dir)).get
    assert(m.fragments.forall(_.bytes.isDefined), "writer did not record sizes")
    // and the recorded size is the TRUE file length (reads depend on it)
    m.fragments.foreach { f =>
      val real = fs(dir).getFileStatus(
        LanceFormat.fragmentPath(new Path(dir), f.file)).getLen
      assert(f.bytes.contains(real), s"${f.file}: ${f.bytes} vs $real")
    }
    val df = spark.read.format("lance").load(dir).filter(col("k") < 10)
    assert(df.queryExecution.executedPlan.toString
      .contains("LanceManifestFileIndex"),
      "scan did not plan from the manifest index")
    assert(df.count() == 10)
    // a pre-`bytes` manifest (hand-committed) falls back to listing
    val legacy = tmpDir()
    spark.range(0, 50).select(col("id").as("k"))
      .write.format("lance").mode("overwrite").save(legacy)
    val lm = LanceFormat.readLatest(fs(legacy), new Path(legacy)).get
    LanceFormat.commitAppendIn(fs(legacy), LanceFormat.versionsPath(new Path(legacy)),
      lm.schema, Seq.empty)
    // strip bytes by rewriting the manifest content via a replace commit
    val stripped = lm.fragments.map(_.copy(bytes = None))
    LanceFormat.commitOverwrite(fs(legacy), new Path(legacy), lm.schema, stripped)
    val df2 = spark.read.format("lance").load(legacy)
    assert(df2.queryExecution.executedPlan.toString
      .contains("InMemoryFileIndex"))
    assert(df2.count() == 50)
  }

  test("branch fork is O(1): the branch manifest reuses base groups by ref") {
    withSmallGroups(5, 4) {
      val dir = tmpDir()
      spark.range(0, 120).select(col("id").as("k"))
        .coalesce(1)
        .write.format("lance").option("write.max-rows-per-file", "10")
        .mode("overwrite").save(dir) // 12 fragments → 3 chunks
      val main = LanceFormat.readLatest(fs(dir), new Path(dir)).get
      val before = groupFiles(dir)
      LanceFormat.createBranch(fs(dir), new Path(dir), "fork")
      assert(groupFiles(dir) == before, "fork wrote group files")
      // the branch manifest on disk carries refs only
      val bp = new Path(s"$dir/_branches/fork/${main.version}.manifest.json")
      val f = fs(dir)
      val in = f.open(bp)
      val raw = try {
        val bytes = new Array[Byte](f.getFileStatus(bp).getLen.toInt)
        in.readFully(0L, bytes)
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
      assert(!raw.contains("frag-") && raw.contains("g-"))
      // and resolves
      assert(spark.read.format("lance").option("branch", "fork").load(dir)
        .count() == 120)
      // a branch append spills ITS tail into the shared groups dir and
      // the branch lineage keeps reading end to end
      spark.range(120, 160).select(col("id").as("k"))
        .coalesce(1)
        .write.format("lance").option("write.max-rows-per-file", "10")
        .option("write.branch", "fork")
        .mode("append").save(dir)
      assert(spark.read.format("lance").option("branch", "fork").load(dir)
        .count() == 160)
      assert(main.fragmentGroups.get.toSet.subsetOf(groupFiles(dir)))
    }
  }
}
