package graft

import graft.format.{FragmentMeta, LanceFormat, ManifestPublisher}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.UUID
import java.util.concurrent.{CountDownLatch, TimeUnit}

/** Racing-committer gates for the manifest publish seam: two concurrent
  * `commitAppend`s must BOTH land (no lost update, versions dense), on
  * both the local hard-link publisher and the object-store conditional-put
  * publisher (via [[CondPutMemoryFileSystem]], whose create-if-absent
  * fails at close exactly like a real S3 `If-None-Match` PUT).
  */
class CommitRaceSpec extends AnyFunSuite {

  private val schema = new StructType().add("id", LongType).add("v", StringType)

  private def localRoot(): (FileSystem, Path) = {
    val dir = Files.createTempDirectory(java.nio.file.Paths.get("target"), "race-")
    val root = new Path(s"${dir.toAbsolutePath}/tbl")
    (LanceFormat.fileSystem(root, new Configuration()), root)
  }

  private def memRoot(): (FileSystem, Path) = {
    val conf = new Configuration()
    conf.set("fs.condmem.impl", classOf[CondPutMemoryFileSystem].getName)
    val root = new Path(s"condmem://bucket/tbl-${UUID.randomUUID()}")
    (root.getFileSystem(conf), root)
  }

  /** Deterministic interleaver: the thread named `pausedThread` parks
    * right before its publish — after it has read the latest manifest and
    * built its merged commit — until the other committer has fully landed.
    * Forces the exact lost-update window the retry loop must survive.
    */
  private class GatedPublisher(inner: ManifestPublisher, gate: CountDownLatch,
      pausedThread: String) extends ManifestPublisher {
    override def publish(fs: FileSystem, target: Path, bytes: Array[Byte]): Boolean = {
      if (Thread.currentThread().getName == pausedThread)
        assert(gate.await(30, TimeUnit.SECONDS), "winner never landed")
      inner.publish(fs, target, bytes)
    }
  }

  /** Runs the forced race with `loser` publishing second, asserts both
    * appends land with dense versions and the winner's manifest untouched.
    */
  private def raceBothLand(fs: FileSystem, root: Path, inner: ManifestPublisher,
      loser: String, winner: String): Unit = {
    LanceFormat.commitAppend(fs, root, schema,
      Seq(FragmentMeta(0, "base.parquet", 10)), publisher = Some(inner))

    val gate = new CountDownLatch(1)
    val pub = Some(new GatedPublisher(inner, gate, loser): ManifestPublisher)
    var failure: Option[Throwable] = None
    def committer(name: String): Thread = {
      val t = new Thread(() => {
        try {
          LanceFormat.commitAppend(fs, root, schema,
            Seq(FragmentMeta(0, s"$name.parquet", 1)), publisher = pub)
          if (name == winner) gate.countDown()
        } catch { case e: Throwable => failure = Some(e); gate.countDown() }
      }, name)
      t.start(); t
    }
    // start the loser first so it reads the pre-race manifest, then parks
    val lt = committer(loser)
    Thread.sleep(50)
    val wt = committer(winner)
    lt.join(30000); wt.join(30000)
    failure.foreach(throw _)

    assert(LanceFormat.listVersions(fs, root) == Seq(1L, 2L, 3L),
      "versions must stay dense: winner at 2, loser retries onto 3")
    val v2 = LanceFormat.readManifest(fs, root, 2L).fragments.map(_.file)
    assert(v2.contains(s"$winner.parquet") && !v2.contains(s"$loser.parquet"),
      "the winner's manifest must not be replaced by the loser")
    val last = LanceFormat.readManifest(fs, root, 3L)
    assert(last.fragments.map(_.file).toSet ==
      Set("base.parquet", s"$winner.parquet", s"$loser.parquet"),
      "the loser must re-merge the winner's fragments, not drop them")
    assert(last.fragments.map(_.id).distinct.size == 3)
    assert(last.rowCount == 12L)
  }

  test("forced race, local hard-link publisher: both committers land, both orders") {
    for ((loser, winner) <- Seq(("a", "b"), ("b", "a"))) {
      val (fs, root) = localRoot()
      raceBothLand(fs, root, ManifestPublisher.HardLink, loser, winner)
    }
  }

  test("forced race, conditional-put publisher on an object store: both land, both orders") {
    for ((loser, winner) <- Seq(("a", "b"), ("b", "a"))) {
      val (fs, root) = memRoot()
      raceBothLand(fs, root, ManifestPublisher.ConditionalPut, loser, winner)
    }
  }

  test("unsynchronized stress: 4 committers x 5 appends on conditional put, none lost") {
    val (fs, root) = memRoot()
    ManifestPublisher.register("condmem", ManifestPublisher.ConditionalPut)
    try {
      val threads = (0 until 4).map { t =>
        new Thread(() => (0 until 5).foreach { i =>
          LanceFormat.commitAppend(fs, root, schema,
            Seq(FragmentMeta(0, s"t$t-$i.parquet", 1)))
        }, s"stress-$t")
      }
      threads.foreach(_.start()); threads.foreach(_.join(60000))
      assert(LanceFormat.listVersions(fs, root) == (1L to 20L),
        "every append lands on its own dense version")
      val last = LanceFormat.readLatest(fs, root).get
      assert(last.fragments.map(_.file).toSet ==
        (for (t <- 0 until 4; i <- 0 until 5) yield s"t$t-$i.parquet").toSet)
      assert(last.fragments.map(_.id).sorted == (0 until 20))
    } finally ManifestPublisher.unregister("condmem")
  }

  test("racing overwrites land as distinct dense versions, none replaced") {
    val (fs, root) = memRoot()
    ManifestPublisher.register("condmem", ManifestPublisher.ConditionalPut)
    try {
      val threads = (0 until 2).map { t =>
        new Thread(() => (0 until 3).foreach { i =>
          LanceFormat.commitOverwrite(fs, root, schema,
            Seq(FragmentMeta(0, s"ow-$t-$i.parquet", 1)))
        }, s"ow-$t")
      }
      threads.foreach(_.start()); threads.foreach(_.join(60000))
      assert(LanceFormat.listVersions(fs, root) == (1L to 6L))
      // every version is a complete single-writer overwrite: exactly one
      // fragment, and all six writes are present across the history
      val frags = (1L to 6L).map(v =>
        LanceFormat.readManifest(fs, root, v).fragments match {
          case Seq(one) => one.file
          case other => fail(s"version $v has ${other.size} fragments")
        })
      assert(frags.toSet ==
        (for (t <- 0 until 2; i <- 0 until 3) yield s"ow-$t-$i.parquet").toSet)
    } finally ManifestPublisher.unregister("condmem")
  }

  test("conditional PUT loses at close and never replaces the winner") {
    val (fs, root) = memRoot()
    val target = new Path(root, "_versions/1.manifest.json")
    assert(ManifestPublisher.ConditionalPut.publish(fs, target, "winner".getBytes))
    assert(!ManifestPublisher.ConditionalPut.publish(fs, target, "loser".getBytes))
    val in = fs.open(target)
    val buf = new Array[Byte](16)
    val n = in.read(buf); in.close()
    assert(new String(buf, 0, n) == "winner")
  }

  private def s3aRoot(): (FileSystem, Path) = {
    val conf = new Configuration()
    conf.set("fs.s3a.impl", classOf[S3AMockFileSystem].getName)
    // keep the mock out of the JVM-global FileSystem cache: other suites'
    // sessions must never resolve s3a:// to this store
    conf.setBoolean("fs.s3a.impl.disable.cache", true)
    val root = new Path(s"s3a://mock-bucket/tbl-${UUID.randomUUID()}")
    (root.getFileSystem(conf), root)
  }

  test("s3a contract: scheme resolution picks conditional PUT and survives the race") {
    val (fs, _) = s3aRoot()
    assert(fs.getScheme == "s3a")
    // the pin: resolution by SCHEME (no override, no explicit publisher)
    assert(ManifestPublisher.forFileSystem(fs) == ManifestPublisher.ConditionalPut)
    for ((loser, winner) <- Seq(("a", "b"), ("b", "a"))) {
      val (fs2, root2) = s3aRoot()
      raceBothLand(fs2, root2, ManifestPublisher.forFileSystem(fs2), loser, winner)
    }
  }

  test("s3a contract: unsynchronized committers with scheme-resolved publisher, none lost") {
    val (fs, root) = s3aRoot()
    // NO ManifestPublisher.register here (unlike the condmem stress test,
    // whose scheme is not in the table): the commit path must resolve
    // ConditionalPut from the s3a scheme on its own
    val threads = (0 until 4).map { t =>
      new Thread(() => (0 until 5).foreach { i =>
        LanceFormat.commitAppend(fs, root, schema,
          Seq(FragmentMeta(0, s"t$t-$i.parquet", 1)))
      }, s"s3a-stress-$t")
    }
    threads.foreach(_.start()); threads.foreach(_.join(60000))
    assert(LanceFormat.listVersions(fs, root) == (1L to 20L),
      "every append lands on its own dense version")
    val last = LanceFormat.readLatest(fs, root).get
    assert(last.fragments.map(_.file).toSet ==
      (for (t <- 0 until 4; i <- 0 until 5) yield s"t$t-$i.parquet").toSet)
  }

  test("bucket tags routed under a stale spec are stripped at commit") {
    val (fs, root) = localRoot()
    LanceFormat.commitAppend(fs, root, schema,
      Seq(FragmentMeta(0, "base.parquet", 10)))
    LanceFormat.commitBucketBy(fs, root, 4, Seq("id"))
    // a writer factory read spec (4, id) and routed/tagged under it; a
    // concurrent re-declaration to (8, id) lands BEFORE the commit —
    // publishing the old-spec tags under the new head would mis-prune
    LanceFormat.commitBucketBy(fs, root, 8, Seq("id"))
    val m = LanceFormat.commitAppend(fs, root, schema,
      Seq(FragmentMeta(0, "routed.parquet", 5,
        bucket = Some(2), sorted = Some(true))),
      routedBucketSpec = Some(Some((Seq(4), Seq("id")))))
    val frag = m.fragments.find(_.file == "routed.parquet").get
    assert(frag.bucket.isEmpty && frag.sorted.isEmpty,
      "stale-spec tags must be stripped, not published under the new spec")
    // and the same write under the CURRENT spec keeps its tags
    val m2 = LanceFormat.commitAppend(fs, root, schema,
      Seq(FragmentMeta(0, "routed2.parquet", 5,
        bucket = Some(3), sorted = Some(true))),
      routedBucketSpec = Some(Some((Seq(8), Seq("id")))))
    val frag2 = m2.fragments.find(_.file == "routed2.parquet").get
    assert(frag2.bucket.contains(3) && frag2.sorted.contains(true))
  }

  test("stale-spec tags are stripped on the replace path too") {
    val (fs, root) = localRoot()
    val m0 = LanceFormat.commitAppend(fs, root, schema,
      Seq(FragmentMeta(0, "base.parquet", 10)))
    LanceFormat.commitBucketBy(fs, root, 4, Seq("id"))
    LanceFormat.commitBucketBy(fs, root, 8, Seq("id"))
    val baseId = m0.fragments.head.id
    val (m, _) = LanceFormat.commitReplace(fs, root, schema, Set(baseId),
      Seq(FragmentMeta(0, "rw.parquet", 10, bucket = Some(1), sorted = Some(true))),
      routedBucketSpec = Some(Some((Seq(4), Seq("id")))))
    val frag = m.fragments.find(_.file == "rw.parquet").get
    assert(frag.bucket.isEmpty && frag.sorted.isEmpty)
  }

  test("scoped overwrite refuses when a may-matching fragment landed after its snapshot") {
    import org.apache.spark.sql.sources
    val (fs, root) = localRoot()
    val m0 = LanceFormat.commitAppend(fs, root, schema,
      Seq(FragmentMeta(0, "old.parquet", 10)))
    val snapshotFiles = m0.fragments.map(_.file).toSet
    val guard = Some((snapshotFiles,
      Array[sources.Filter](sources.GreaterThan("id", 5L))))
    // a concurrent append lands predicate-matching (stat-less) data
    LanceFormat.commitAppend(fs, root, schema,
      Seq(FragmentMeta(0, "concurrent.parquet", 3)))
    intercept[java.util.ConcurrentModificationException] {
      LanceFormat.commitReplace(fs, root, schema,
        m0.fragments.map(_.id).toSet,
        Seq(FragmentMeta(0, "backfill.parquet", 10)),
        failIfNewMatching = guard)
    }
    // the predicate-matched-nothing flavor falls through to append and
    // must hit the same wall
    intercept[java.util.ConcurrentModificationException] {
      LanceFormat.commitAppendIn(fs, LanceFormat.versionsPath(root), schema,
        Seq(FragmentMeta(0, "backfill2.parquet", 10)),
        failIfNewMatching = guard)
    }
  }

  test("scoped overwrite commits clean when nothing landed since its snapshot") {
    import org.apache.spark.sql.sources
    val (fs, root) = localRoot()
    val m0 = LanceFormat.commitAppend(fs, root, schema,
      Seq(FragmentMeta(0, "old.parquet", 10)))
    val guard = Some((m0.fragments.map(_.file).toSet,
      Array[sources.Filter](sources.GreaterThan("id", 5L))))
    val (m, removed) = LanceFormat.commitReplace(fs, root, schema,
      m0.fragments.map(_.id).toSet,
      Seq(FragmentMeta(0, "backfill.parquet", 10)),
      failIfNewMatching = guard)
    assert(removed == 10L && m.fragments.map(_.file) == Seq("backfill.parquet"))
  }

  test("publisher resolution: scheme map + registry override") {
    assert(ManifestPublisher.forScheme("file") == ManifestPublisher.HardLink)
    assert(ManifestPublisher.forScheme("hdfs") == ManifestPublisher.RenameIfAbsent)
    for (s <- Seq("s3a", "s3", "gs", "abfs", "abfss", "oss"))
      assert(ManifestPublisher.forScheme(s) == ManifestPublisher.ConditionalPut,
        s"object-store scheme $s must publish via conditional PUT")
    ManifestPublisher.register("file", ManifestPublisher.ConditionalPut)
    try assert(ManifestPublisher.forScheme("file") == ManifestPublisher.ConditionalPut)
    finally ManifestPublisher.unregister("file")
    assert(ManifestPublisher.forScheme("file") == ManifestPublisher.HardLink)
  }
}
