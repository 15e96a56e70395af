package graft.operators

import graft.format.LanceFormat
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** KEYED TABLE REPLICATION over the change feed — the third consumer of
  * the CDF machinery (after the streaming CDC mode and
  * [[MaterializedView]]): maintain an independent downstream COPY of a
  * lance table by applying each sync window's net row changes, never by
  * re-copying the table. The cross-region replica / dev-mirror /
  * downstream-pipeline-input shape: a 100 TB source with a million
  * changed rows syncs in changed-rows time.
  *
  * Mechanics per [[sync]]:
  *  1. `lance_changes(source, lastVersion, head)` yields row images —
  *     exact ones where DML recorded CDF, fragment-diff delete+insert
  *     pairs otherwise (both replay to the same state).
  *  2. Collapse to NET-EFFECT-PER-KEY: the latest image in
  *     (commit, kind) order wins — an update's postimage beats its
  *     preimage, a later delete beats an earlier insert. Unchanged-value
  *     images (a rewritten fragment's untouched rows) still apply,
  *     idempotently.
  *  3. [[Dml.applyChanges]] lands deletes + upserts in ONE commit
  *     carrying the advanced `graft.replica.version` watermark —
  *     exactly-once, same contract as the MV refresh.
  *
  * The replica is an ordinary lance table: query it, index it, bucket it
  * (bucket it BY THE KEY and sync rewrites stay bucket-pure and pruned).
  * Requires a unique key in the source — duplicate keys in one window
  * fail loud in applyChanges rather than replicating nondeterminism.
  */
object Replica {

  /** `rowsChanged` = replica rows deleted or updated; `rowsInserted` =
    * new keys. (0, 0) with `fromVersion == toVersion` means no-op. */
  case class SyncResult(fromVersion: Long, toVersion: Long,
    rowsChanged: Long, rowsInserted: Long)

  private val PropSource = "graft.replica.source"
  private val PropKeys = "graft.replica.keys"
  private val PropVersion = "graft.replica.version"
  /** On the SOURCE table: newline-joined replica paths — what lets
    * [[graft.Lance.optimize]]'s retention vacuum PIN the manifest
    * versions replicas still need for their next incremental sync. */
  private[graft] val PropDependents = "graft.replica.dependents"

  private def fsRoot(spark: SparkSession, path: String) = {
    val root = new Path(new java.io.File(path).getAbsolutePath)
    (LanceFormat.fileSystem(root, spark.sessionState.newHadoopConf()), root)
  }

  /** Collapse a change feed to its NET effect per key: the latest image
    * in (commit, removal<addition) order wins — an update's postimage
    * beats its preimage within the commit, the last commit beats earlier
    * ones across commits. `_change_type` in the result is 'delete' or
    * 'upsert'; `_commit_version` is dropped (the net view has no single
    * version per row). Also the `lance_changes_net` TVF. */
  private[graft] def netChanges(feed: DataFrame,
      keys: Seq[String]): DataFrame = {
    val rank = col("_commit_version") * 2 +
      when(col("_change_type").isin("insert", "update_postimage"), 1L)
        .otherwise(0L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(k => col(s"`$k`")): _*).orderBy(rank.desc)
    feed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "_commit_version")
      .withColumn("_change_type",
        when(col("_change_type").isin("delete", "update_preimage"),
          lit("delete")).otherwise(lit("upsert")))
  }

  /** Seed the replica: one full copy of the source's CURRENT version,
    * committed together with the `graft.replica.*` bookkeeping (one
    * manifest — no half-created replica). Returns the source version the
    * replica reflects. */
  def create(spark: SparkSession, replicaPath: String, sourcePath: String,
      keys: Seq[String]): Long = {
    require(keys.nonEmpty, "replica needs at least one key column")
    // keys round-trip through a comma-joined property: a ',' or newline
    // inside one would decode into DIFFERENT keys and leave the replica
    // permanently unsyncable (the MV group-column guard, applied here)
    keys.foreach(k => require(!k.contains(',') && !k.contains('\n'),
      s"key column '$k' may not contain ',' or newline (property encoding)"))
    val (sfs, sroot) = fsRoot(spark, sourcePath)
    val srcM = LanceFormat.readLatest(sfs, sroot).getOrElse(
      throw new IllegalArgumentException(s"no lance dataset at $sourcePath"))
    keys.foreach(k => require(srcM.schema.fieldNames.contains(k),
      s"no key column '$k' in $sourcePath"))
    val (rfs, rroot) = fsRoot(spark, replicaPath)
    require(LanceFormat.readLatest(rfs, rroot).isEmpty,
      s"dataset already exists at $replicaPath")
    // register FIRST (the MaterializedView.create posture): the copy
    // then reads the registration-inclusive version, and the vacuum pin
    // covers this replica from its first manifest on. A crash in
    // between leaves a registration that contributes no pin (the
    // replica path reads empty) — harmless, re-create overwrites it.
    val abs = new java.io.File(replicaPath).getAbsolutePath
    val registered = LanceFormat.commitPropertiesWith(sfs, sroot, { prev =>
      val cur = prev.get(PropDependents).toSeq.flatMap(_.split('\n'))
      if (cur.contains(abs)) prev
      else prev + (PropDependents -> (cur :+ abs).mkString("\n"))
    }).version
    spark.read.format("lance")
      .option("versionAsOf", registered.toString).load(sourcePath)
      .write.format("lance").mode("overwrite")
      .option("write.set-properties", LanceFormat.serializeProperties(Map(
        PropSource -> new java.io.File(sourcePath).getAbsolutePath,
        PropKeys -> keys.mkString(","),
        PropVersion -> registered.toString)))
      .save(replicaPath)
    registered
  }

  /** Unregister (from the source's replica registry) and delete a
    * replica. Either side already gone is tolerated. */
  def drop(spark: SparkSession, replicaPath: String): Boolean = {
    val (rfs, rroot) = fsRoot(spark, replicaPath)
    // ONE snapshot read serves the existence check and the source lookup
    val snapshot = LanceFormat.readLatest(rfs, rroot)
    val existed = snapshot.isDefined
    val abs = rroot.toString
    if (existed) {
      snapshot.get.properties
        .getOrElse(Map.empty).get(PropSource).foreach { source =>
          val (sfs, sroot) = fsRoot(spark, source)
          if (LanceFormat.readLatest(sfs, sroot).isDefined)
            LanceFormat.commitPropertiesWith(sfs, sroot, { prev =>
              val kept = prev.get(PropDependents).toSeq.flatMap(_.split('\n'))
                .filterNot(p => p == abs || p == replicaPath)
              if (kept.isEmpty) prev - PropDependents
              else prev + (PropDependents -> kept.mkString("\n"))
            })
        }
    }
    rfs.delete(rroot, true)
    existed
  }

  /** One incremental sync: apply the feed window's net row changes.
    * No-op (nothing committed) when the source has not moved. */
  def sync(spark: SparkSession, replicaPath: String): SyncResult = {
    val (rfs, rroot) = fsRoot(spark, replicaPath)
    val props = LanceFormat.readLatest(rfs, rroot).getOrElse(
      throw new IllegalArgumentException(s"no lance dataset at $replicaPath"))
      .properties.getOrElse(Map.empty)
    val source = props.getOrElse(PropSource, throw new IllegalArgumentException(
      s"$replicaPath is not a replica (no $PropSource property)"))
    val keys = props(PropKeys).split(',').toSeq
    val v0 = props(PropVersion).toLong
    val (sfs, sroot) = fsRoot(spark, source)
    val srcM = LanceFormat.readLatest(sfs, sroot).getOrElse(
      throw new IllegalStateException(s"replica source vanished: $source"))
    val vN = srcM.version
    if (vN == v0) return SyncResult(v0, vN, 0L, 0L)
    require(vN > v0, s"source $source went BACKWARDS (v$v0 -> v$vN): it was " +
      "recreated under the replica; recreate the replica")
    if (v0 != 0 && !LanceFormat.listVersions(sfs, sroot).contains(v0))
      throw new IllegalStateException(
        s"feed window lost: source version $v0 was vacuumed; recreate the replica")
    graft.MetaTvfs.register(spark)
    val feed = spark.sql(
      s"SELECT * FROM lance_changes('${source.replace("'", "''")}', $v0, $vN)")
    // persist: applyChanges runs several jobs over the net frame — the
    // window+filter over the feed must not recompute per job
    val net = netChanges(feed, keys)
      .withColumn("__del", col("_change_type") === "delete")
      .drop("_change_type")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // CAS on the watermark: two concurrent syncs of the same window
      // collide loudly instead of double-inserting new keys
      val res = Dml.applyChanges(spark, replicaPath, net, keys,
        deleteWhen = col("__del"),
        setProperties = Map(PropVersion -> vN.toString),
        requireProperties = Map(PropVersion -> v0.toString))
      SyncResult(v0, vN, res.rowsChanged, res.rowsInserted)
    } finally net.unpersist()
  }
}
