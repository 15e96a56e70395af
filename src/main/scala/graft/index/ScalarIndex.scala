package graft.index

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.json4s.NoTypeHints
import org.json4s.jackson.Serialization

import graft.format.{FragmentMeta, LanceFormat, Manifest}

/** Scalar point-lookup index: value → fragment postings — the
  * BTREE-style scalar index of the Lance format (the reference connector
  * surfaces only vector indexes, `ref:LanceIndexBuilder.java:117-152`),
  * re-expressed as driver-side fragment pruning.
  *
  * WHY a third pruning layer: manifest min/max bounds prune RANGE-shaped
  * predicates only when the write was range-clustered on that column, and
  * the exact value set ([[graft.format.FragmentStats.ValueSetMaxSize]])
  * prunes point lookups only below 32 distinct values per fragment. A
  * point lookup on a HIGH-cardinality, unclustered column (`doc_id = k`,
  * `user_id = u` over a hash-distributed 100 TB corpus) survives both:
  * every fragment's [min,max] straddles the key and the value set is
  * overflowed. This index answers exactly that shape with ONE small
  * driver-side read — no task launch, no footer storm.
  *
  * Layout under `<dataset>/_indices/<column>_scalar/`:
  *   - `postings/bucket=B/` — JSON lines `{"v": <rendered>, "f": [file…]}`,
  *     directory-partitioned by `bucket = pmod(xxhash64(v), numBuckets)`.
  *     A lookup hashes the literal with THE SAME xxhash64 (seed 42, via
  *     Spark's own XXH64 over the UTF-8 bytes) and reads one bucket
  *     directory: O(distinct values / numBuckets) bytes per probe,
  *     independent of corpus size. Values hotter than `maxFilesPerValue`
  *     fragments are stored as `"f": null` — "present but unprunable" —
  *     so one boilerplate value can never bloat a bucket or an agg
  *     buffer (the d42/d44 df-cap pattern at index grain). A production
  *     format would pack these as sorted binary pages; JSON-lines keeps
  *     the repo's manifest conventions and the ARCHITECTURE (bucketed
  *     postings, single-bucket probe) is what scales.
  *   - `scalar.json` — column, bucket count, covered fragment FILES,
  *     dataset version, buildId.
  *
  * Version drift is handled conservatively, not pessimistically: postings
  * reference fragment file NAMES, and the meta records which files the
  * build covered. At prune time the allowed set is
  * `postings(v) ∪ (current fragments not covered by the build)` — so
  * appended / DML-rewritten fragments are always scanned (never wrongly
  * pruned) and stale postings for deleted fragments vanish by
  * intersection with the live manifest. [[refresh]] delta-indexes ONLY
  * the uncovered fragments (the v34/t43 pattern): appended part files in
  * the same bucket directories, no rewrite of existing postings; lookup
  * unions lines per value, so a crashed-and-retried refresh at worst
  * duplicates lines — idempotent by union semantics.
  *
  * Supported columns: integral, string, boolean, date, decimal — types
  * whose Spark `CAST(col AS STRING)` rendering the driver can reproduce
  * exactly from a pushed filter literal ([[renderValue]]). Float/double
  * (NaN/-0.0 rendering traps) and timestamps (TZ-dependent rendering)
  * are excluded, like the value-set stats.
  */
object ScalarIndex {
  private implicit val fmts: org.json4s.Formats = Serialization.formats(NoTypeHints)
  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.ScalarIndex")

  val CurrentFormatVersion = 1
  val DefaultBuckets = 64

  case class ScalarMeta(column: String, numBuckets: Int,
    coveredFiles: Seq[String],
    datasetVersion: Option[Long] = None,
    formatVersion: Option[Int] = None,
    maxFilesPerValue: Option[Int] = None,
    buildId: Option[String] = None,
    postingsDir: Option[String] = None,
    rangesDir: Option[String] = None)

  /** One postings line: rendered value + fragment files, `f = None`
    * marking a value too hot to prune (present in > maxFilesPerValue
    * fragments). */
  private case class PostLine(v: String, f: Option[Seq[String]])

  def indexPath(datasetPath: String, column: String): String =
    s"$datasetPath/_indices/${column}_scalar"

  private def postingsPath(ip: String) = s"$ip/postings"
  /** The LIVE postings directory is named by the meta (pointer-based
    * swap): a rebuild stages a fresh `postings-<id>` dir and atomically
    * re-points `scalar.json`, so readers resolving through the meta never
    * observe a half-replaced directory — the delete+rename window of an
    * in-place swap let a concurrent reader see a missing bucket as
    * "value provably absent" and wrongly prune. Metas written before the
    * pointer existed resolve to the legacy `postings` dir. */
  private def livePostings(ip: String, meta: ScalarMeta): String =
    meta.postingsDir.map(d => s"$ip/$d").getOrElse(postingsPath(ip))
  private def metaPath(ip: String) = new Path(s"$ip/scalar.json")

  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType |
         BooleanType | DateType => true
    case _: DecimalType => true
    case _ => false
  }

  private def maxFilesPerValue(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.scalarindex.maxFilesPerValue")
      .map(_.toInt).getOrElse(1024)

  // ------------------------------------------------------------ rendering

  /** Driver-side literal rendering — MUST match the build job's
    * `CAST(col AS STRING)` byte-for-byte for every supported type. */
  private[graft] def renderValue(dt: DataType, value: Any): Option[String] =
    (dt, value) match {
      case (_, null) => None
      case (ByteType | ShortType | IntegerType | LongType, v) => Some(v.toString)
      case (BooleanType, v: java.lang.Boolean) => Some(v.toString)
      case (StringType, v: String) => Some(v)
      case (StringType, v: UTF8String) => Some(v.toString)
      case (DateType, v: java.sql.Date) => Some(v.toString)
      case (DateType, v: java.time.LocalDate) => Some(v.toString)
      case (d: DecimalType, v: java.math.BigDecimal) =>
        Some(v.setScale(d.scale).toPlainString)
      case (d: DecimalType, v: BigDecimal) =>
        Some(v.underlying.setScale(d.scale).toPlainString)
      case _ => None // unsupported literal shape -> no pruning
    }

  /** Spark's xxhash64(string) for a driver-held string: same algorithm,
    * same seed (42), same UTF-8 bytes — so the driver lands in the same
    * bucket directory the build job wrote. */
  private[graft] def bucketOf(rendered: String, numBuckets: Int): Int = {
    val s = UTF8String.fromString(rendered)
    val h = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
    // Spark's pmod semantics: ((h % n) + n) % n
    (((h % numBuckets) + numBuckets) % numBuckets).toInt
  }

  // ----------------------------------------------------- range order keys

  /** Types the RANGE projection covers: those with an order-preserving
    * string key the driver can reproduce from a pushed literal. Decimals
    * (unbounded sign-magnitude padding) stay point-only. */
  def rangeSupported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType |
         BooleanType | DateType => true
    case _ => false
  }

  /** 16-hex-digit order-preserving key for a signed long: XOR the sign
    * bit so unsigned/lexicographic order equals signed order, then pad —
    * identical bytes from the build expression ([[orderKeyExpr]], Spark's
    * uppercase `hex`) and the driver ([[orderKey]]). */
  private def padHex(v: Long): String = {
    val h = java.lang.Long.toHexString(v ^ Long.MinValue).toUpperCase
    "0" * (16 - h.length) + h
  }

  /** Build-side order key as a column expression. */
  private def orderKeyExpr(dt: DataType, c: Column): Option[Column] = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      Some(lpad(hex(c.cast("long").bitwiseXOR(lit(Long.MinValue))), 16, "0"))
    case DateType =>
      Some(lpad(hex(unix_date(c).cast("long").bitwiseXOR(lit(Long.MinValue))), 16, "0"))
    case BooleanType => Some(when(c, lit("1")).otherwise(lit("0")))
    case StringType => Some(c)
    case _ => None
  }

  /** Order key computed from the RENDERED value string of the point
    * postings — the rendering is lossless for every range-supported type
    * (`CAST AS STRING` round-trips), so the range projection derives from
    * the already-aggregated postings lines instead of a second corpus
    * scan: build/refresh cost for ranges ∝ distinct values, not data. */
  private def orderKeyFromRendered(dt: DataType, v: Column): Option[Column] =
    dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        Some(lpad(hex(v.cast("long").bitwiseXOR(lit(Long.MinValue))), 16, "0"))
      case DateType =>
        Some(lpad(hex(unix_date(v.cast("date")).cast("long")
          .bitwiseXOR(lit(Long.MinValue))), 16, "0"))
      case BooleanType =>
        Some(when(v === "true", lit("1")).otherwise(lit("0")))
      case StringType => Some(v)
      case _ => None
    }

  /** Driver-side order key for a pushed range literal. */
  private[graft] def orderKey(dt: DataType, value: Any): Option[String] =
    (dt, value) match {
      case (_, null) => None
      case (ByteType | ShortType | IntegerType | LongType, v: Number) =>
        Some(padHex(v.longValue()))
      case (BooleanType, v: java.lang.Boolean) => Some(if (v) "1" else "0")
      case (DateType, v: java.sql.Date) => Some(padHex(v.toLocalDate.toEpochDay))
      case (DateType, v: java.time.LocalDate) => Some(padHex(v.toEpochDay))
      case (StringType, v: String) => Some(v)
      case (StringType, v: UTF8String) => Some(v.toString)
      case _ => None
    }

  // ---------------------------------------------------------------- build

  /** Build the postings from scratch over the dataset's CURRENT version.
    * One distributed pass: distinct (value, fragment file) pairs — a
    * hash aggregate, the heavy lifting — then hot values are split off by
    * an anti-join BEFORE any collect_set, so no agg buffer ever holds
    * more than `maxFilesPerValue` file names. */
  def build(spark: SparkSession, datasetPath: String, column: String,
      numBuckets: Int = DefaultBuckets): ScalarMeta = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val m = latestManifest(spark, datasetPath)
    val dt = m.schema(column).dataType
    require(supported(dt), s"scalar index unsupported for column type $dt")
    val ip = indexPath(datasetPath, column)
    val fs = new Path(ip).getFileSystem(spark.sessionState.newHadoopConf())
    // POINTER-BASED swap: write the new postings into a fresh versioned
    // directory, then atomically re-point scalar.json at it. The old
    // postings stay whole on disk until the new meta lands, so a
    // concurrent reader (resolving its directory THROUGH the meta) can
    // never observe a half-replaced index — the delete-then-rename window
    // of an in-place swap read as "value provably absent" → silent
    // mis-prune. On any failure the meta is DELETED: a disabled index
    // (prune keeps everything) over a mis-pruning one.
    val newDirName = s"postings-${java.util.UUID.randomUUID().toString}"
    val newDir = new Path(s"$ip/$newDirName")
    val ds = spark.read.format("lance").load(datasetPath)
    val inputRows = m.fragments.map(_.rowCount).sum
    val small = inputRows <= smallBuildRows(spark)
    val (posts0, releasePairs) =
      postingsOf(spark, ds, column, numBuckets, maxFilesPerValue(spark),
        inputRows = Some(inputRows))
    val posts = posts0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    writePostings(spark, posts, newDir, overwrite = true)
    require(fs.exists(newDir),
      s"staged scalar postings missing at $newDir - aborting with the live index intact")
    // second projection for RANGE predicates: the same (value → files)
    // postings keyed by an ORDER-PRESERVING string and laid out as
    // range-partitioned, sorted parquet — a `>`/`BETWEEN` probe reads
    // only the overlapping key span (parquet min/max skips the rest),
    // the shape min/max fragment bounds cannot answer on an unclustered
    // high-cardinality column (every fragment straddles the range).
    // Derived from the cached point postings — zero extra corpus I/O.
    val rangeDirName = orderKeyFromRendered(dt, col("v")).map { keyExpr =>
      val rd = s"ranges-${java.util.UUID.randomUUID().toString}"
      writeRangePostings(spark,
        posts.select(keyExpr.as("k"), col("f")),
        new Path(s"$ip/$rd"), numBuckets, overwrite = true,
        smallInput = small)
      rd
    }
    posts.unpersist(); releasePairs()
    val prevMeta = if (exists(spark, datasetPath, column))
      Some(loadMeta(spark, datasetPath, column)) else None
    val prevDir = prevMeta.map(livePostings(ip, _))
    val prevRange = prevMeta.flatMap(_.rangesDir).map(d => s"$ip/$d")
    val stamped = try {
      writeMeta(spark, ip, ScalarMeta(column, numBuckets,
        coveredFiles = m.fragments.map(_.file),
        datasetVersion = Some(m.version),
        formatVersion = Some(CurrentFormatVersion),
        maxFilesPerValue = Some(maxFilesPerValue(spark)),
        postingsDir = Some(newDirName),
        rangesDir = rangeDirName))
    } catch {
      case e: Throwable =>
        // the pointer may be half-written: disable the index outright
        fs.delete(metaPath(ip), false)
        fs.delete(newDir, true)
        rangeDirName.foreach(rd => fs.delete(new Path(s"$ip/$rd"), true))
        throw e
    }
    // the old directories are unreferenced once the new meta is the
    // pointer; readers that resolved them a moment ago fail
    // conservatively (missing root -> prune skipped), never absently
    prevDir.filter(_ != s"$ip/$newDirName")
      .foreach(d => fs.delete(new Path(d), true))
    prevRange.filter(d => !rangeDirName.contains(d.stripPrefix(s"$ip/")))
      .foreach(d => fs.delete(new Path(d), true))
    stamped
  }

  /** Delta refresh: index ONLY fragments the last build/refresh did not
    * cover, appending part files into the existing bucket directories.
    * Existing postings are never rewritten — lookup unions lines — so
    * cost ∝ appended data, the v34/t43 contract on the scalar side. */
  def refresh(spark: SparkSession, datasetPath: String, column: String): ScalarMeta = {
    val meta = loadMeta(spark, datasetPath, column)
    val m = latestManifest(spark, datasetPath)
    val covered = meta.coveredFiles.toSet
    val fresh = m.fragments.filterNot(f => covered(f.file))
    if (fresh.isEmpty) {
      log.info(s"scalar refresh $datasetPath/$column: nothing to do")
      return writeMeta(spark, indexPath(datasetPath, column), meta.copy(
        datasetVersion = Some(m.version)))
    }
    val root = new Path(datasetPath)
    val files = fresh.map(f => LanceFormat.fragmentPath(root, f.file).toString)
    val ds = spark.read.schema(m.physicalSchema).parquet(files: _*)
    val ip = indexPath(datasetPath, column)
    val cap = meta.maxFilesPerValue.getOrElse(maxFilesPerValue(spark))
    val deltaRows = fresh.map(_.rowCount).sum
    val small = deltaRows <= smallBuildRows(spark)
    val (posts0, releasePairs) = postingsOf(spark, ds, column, meta.numBuckets,
      cap, inputRows = Some(deltaRows))
    val posts = posts0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    writePostings(spark, posts,
      new Path(livePostings(ip, meta)), overwrite = false)
    // delta-append the range projection too, derived from the cached
    // delta postings (cost ∝ appended distinct values); appended parquet
    // files are each internally sorted, so min/max skipping keeps working
    meta.rangesDir.foreach { rd =>
      orderKeyFromRendered(m.schema(column).dataType, col("v")).foreach { keyExpr =>
        writeRangePostings(spark, posts.select(keyExpr.as("k"), col("f")),
          new Path(s"$ip/$rd"), meta.numBuckets, overwrite = false,
          smallInput = small)
      }
    }
    posts.unpersist(); releasePairs()
    writeMeta(spark, ip, meta.copy(
      coveredFiles = meta.coveredFiles ++ fresh.map(_.file),
      datasetVersion = Some(m.version)))
  }

  /** Rows at or below which the postings derive from ONE hash aggregate
    * (count + collect_set in the same buffer): with the whole input
    * bounded, no agg buffer can outgrow it, so the hot-value anti-join
    * split — whose purpose is bounding buffers on an UNBOUNDED corpus —
    * buys nothing and costs two extra shuffles plus a persisted
    * intermediate. Size-ADAPTIVE, not machine-tuned: the row count comes
    * from the manifest (zero I/O) and big inputs keep the scale-safe
    * two-pass shape. */
  private def smallBuildRows(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.scalarindex.smallBuildRows")
      .map(_.toLong).getOrElse(4000000L)

  /** Distinct (rendered value, fragment file, bucket) postings with the
    * hot-value split. `input_file_name` attributes rows to fragments
    * without a join — the scan already knows its file.
    *
    * Two shapes, chosen by the caller-supplied manifest row count:
    *  - small input (≤ smallBuildRows): one aggregate computes the file
    *    set AND the hot verdict per value — buffers bounded by the input
    *    itself, nothing persisted, fewest shuffles;
    *  - large input: `pairs` feeds BOTH the hot probe and the cold
    *    aggregation, so it is persisted (one corpus scan + one distinct,
    *    not two) and no agg buffer ever holds more than `cap` file
    *    names. The returned cleanup releases it once the caller has
    *    materialized the postings.
    * Postings CONTENT is identical either way (hot values marked
    * `f: null`, cold file lists sorted). */
  private def postingsOf(spark: SparkSession, ds: DataFrame, column: String,
      numBuckets: Int, cap: Int, inputRows: Option[Long]): (DataFrame, () => Unit) = {
    val pairs0 = ds
      .filter(col(column).isNotNull)
      .select(col(column).cast("string").as("v"),
        element_at(split(input_file_name(), "/"), -1).as("f"))
      .distinct()
    if (inputRows.exists(_ <= smallBuildRows(spark))) {
      val posts = pairs0.groupBy(col("v"))
        .agg(count(lit(1)).as("__nf"),
          sort_array(collect_set(col("f"))).as("__files"))
        .select(col("v"),
          when(col("__nf") > cap, lit(null).cast("array<string>"))
            .otherwise(col("__files")).as("f"))
        .withColumn("bucket", pmod(xxhash64(col("v")), lit(numBuckets)))
      (posts, () => ())
    } else {
      val pairs = pairs0
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val hot = pairs.groupBy(col("v")).agg(count(lit(1)).as("__nf"))
        .filter(col("__nf") > cap).select(col("v"))
      val cold = pairs.join(hot, Seq("v"), "left_anti")
        .groupBy(col("v"))
        .agg(sort_array(collect_set(col("f"))).as("f"))
      val hotLines = hot.select(col("v"), lit(null).cast("array<string>").as("f"))
      (cold.unionByName(hotLines)
        .withColumn("bucket", pmod(xxhash64(col("v")), lit(numBuckets))),
        () => { pairs.unpersist(); () })
    }
  }

  private def writePostings(spark: SparkSession, postings: DataFrame,
      pp: Path, overwrite: Boolean): Unit =
    postings
      .repartition(col("bucket"))
      .write.partitionBy("bucket")
      .mode(if (overwrite) "overwrite" else "append")
      .json(pp.toString)

  /** Range-partitioned, key-sorted parquet: a range probe's pushed
    * `k >= lo AND k <= hi` filter skips non-overlapping files and row
    * groups via parquet min/max — probe cost ∝ the key span, not the
    * distinct-value count.
    *
    * `smallInput` (the postingsOf size verdict): one globally-sorted
    * file instead of repartitionByRange — the range partitioner's
    * SAMPLING job buys nothing when the whole projection is one small
    * file anyway (row-group min/max still skip inside it). Large inputs
    * keep the range layout. */
  private def writeRangePostings(spark: SparkSession, postings: DataFrame,
      dir: Path, numBuckets: Int, overwrite: Boolean,
      smallInput: Boolean): Unit =
    (if (smallInput) postings.repartition(1).sortWithinPartitions(col("k"))
     else postings
       .repartitionByRange(math.max(1, numBuckets / 4), col("k"))
       .sortWithinPartitions(col("k")))
      .write.mode(if (overwrite) "overwrite" else "append")
      .parquet(dir.toString)

  // ---------------------------------------------------------------- prune

  /** Narrow `kept` using every applicable scalar index. Strictly
    * conservative: any failure, unsupported literal, missing index, or
    * unprunable (hot/absent-marker) value keeps fragments; uncovered
    * fragments (appended or DML-rewritten after the build) always stay. */
  def prune(spark: SparkSession, datasetPath: String, manifest: Manifest,
      filters: Seq[sources.Filter], kept: Seq[FragmentMeta]): Seq[FragmentMeta] = {
    if (kept.isEmpty) return kept
    if (spark.conf.getOption("spark.graft.scalarindex.enabled")
        .exists(_.equalsIgnoreCase("false"))) return kept
    val byCol: Seq[(String, Seq[Any])] = filters.collect {
      case sources.EqualTo(a, v) if v != null => (a, Seq(v))
      case sources.EqualNullSafe(a, v) if v != null => (a, Seq(v))
      case sources.In(a, vs) if vs != null && vs.nonEmpty && !vs.contains(null) =>
        (a, vs.toSeq)
    }
    // range conjuncts prune through the sorted projection. ALL bounds on
    // one column probe TOGETHER (a BETWEEN is one span read): one-sided
    // legs of a narrow range each cover most values — only their
    // intersection is selective
    val rangeBounds: Seq[(String, Seq[(Any, Boolean)], Seq[(Any, Boolean)])] =
      filters.collect {
        case sources.GreaterThan(a, v) if v != null =>
          (a, Seq(v -> false), Seq.empty[(Any, Boolean)])
        case sources.GreaterThanOrEqual(a, v) if v != null =>
          (a, Seq(v -> true), Seq.empty[(Any, Boolean)])
        case sources.LessThan(a, v) if v != null =>
          (a, Seq.empty[(Any, Boolean)], Seq(v -> false))
        case sources.LessThanOrEqual(a, v) if v != null =>
          (a, Seq.empty[(Any, Boolean)], Seq(v -> true))
      }
    // LIKE 'p%' (pushed as StringStartsWith) prunes through the same
    // sorted projection: string order keys ARE the raw values, so the
    // prefix filter pushes into the projection read exactly like a range
    val prefixByCol: Map[String, Seq[String]] = filters.collect {
      case sources.StringStartsWith(a, p) if p != null && p.nonEmpty => (a, p)
    }.groupBy(_._1).map { case (a, ps) => a -> ps.map(_._2) }
    val rangeByCol: Seq[(String, Seq[(Any, Boolean)], Seq[(Any, Boolean)])] =
      (rangeBounds.groupBy(_._1).keySet ++ prefixByCol.keySet).toSeq.map { a =>
        val items = rangeBounds.filter(_._1 == a)
        (a, items.flatMap(_._2), items.flatMap(_._3))
      }
    if (byCol.isEmpty && rangeByCol.isEmpty) return kept
    var current = kept
    byCol.foreach { case (attr, values) =>
      if (current.nonEmpty) scala.util.control.Exception.nonFatalCatch
        .withApply { e =>
          log.warn(s"scalar-index prune skipped for $attr: $e"); ()
        }.apply {
          current = pruneOne(spark, datasetPath, manifest, attr, values, current)
        }
    }
    rangeByCol.foreach { case (attr, lo, hi) =>
      if (current.nonEmpty) scala.util.control.Exception.nonFatalCatch
        .withApply { e =>
          log.warn(s"scalar-index range prune skipped for $attr: $e"); ()
        }.apply {
          current = pruneRangeOne(spark, datasetPath, manifest, attr, lo, hi,
            prefixByCol.getOrElse(attr, Seq.empty), current)
        }
    }
    current
  }

  /** Range prune through the sorted projection: read only the postings
    * lines whose key falls in the span (parquet min/max skips the rest),
    * union their file lists. Strictly conservative — missing projection,
    * unsupported type/literal, or a HOT value inside the span keeps
    * everything; uncovered fragments always stay. */
  private def pruneRangeOne(spark: SparkSession, datasetPath: String, m: Manifest,
      attr: String, lower: Seq[(Any, Boolean)], upper: Seq[(Any, Boolean)],
      prefixes: Seq[String], kept: Seq[FragmentMeta]): Seq[FragmentMeta] = {
    val dt = m.schema.fields.find(_.name == attr).map(_.dataType)
      .getOrElse(return kept)
    if (!rangeSupported(dt)) return kept
    // prefix pruning is only sound where the order key IS the raw value
    if (prefixes.nonEmpty && dt != StringType) return kept
    val meta = tryLoadMeta(spark, datasetPath, attr).getOrElse(return kept)
    val rdirName = meta.rangesDir.getOrElse(return kept)
    val loKey = lower.map { case (v, i) => (orderKey(dt, v), i) }
    val hiKey = upper.map { case (v, i) => (orderKey(dt, v), i) }
    if (loKey.exists(_._1.isEmpty) || hiKey.exists(_._1.isEmpty)) return kept
    val dir = new Path(s"${indexPath(datasetPath, attr)}/$rdirName")
    val rfs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!rfs.exists(dir)) throw new IllegalStateException(
      s"scalar range postings dir $dir vanished (concurrent rebuild?) - " +
        "skipping prune conservatively")
    var df = spark.read.parquet(dir.toString)
    loKey.foreach { case (k, incl) =>
      df = df.filter(if (incl) col("k") >= k.get else col("k") > k.get) }
    hiKey.foreach { case (k, incl) =>
      df = df.filter(if (incl) col("k") <= k.get else col("k") < k.get) }
    prefixes.foreach { p => df = df.filter(col("k").startsWith(p)) }
    // one small job: distinct files in the span; a null marker = a hot
    // value inside the span -> cannot prune
    val hits = df.select(explode_outer(col("f")).as("file")).distinct().collect()
    if (hits.exists(_.isNullAt(0))) return kept
    val allowed = hits.map(_.getString(0)).toSet
    val covered = meta.coveredFiles.toSet
    val before = kept.size
    val result = kept.filter(f => !covered(f.file) || allowed(f.file))
    if (result.size < before)
      log.info(s"scalar-index range prune $attr: $before -> ${result.size} fragments")
    result
  }

  private def pruneOne(spark: SparkSession, datasetPath: String, m: Manifest,
      attr: String, values: Seq[Any], kept: Seq[FragmentMeta]): Seq[FragmentMeta] = {
    val dtOpt = m.schema.fields.find(_.name == attr).map(_.dataType)
    val dt = dtOpt.getOrElse(return kept)
    if (!supported(dt)) return kept
    val metaOpt = tryLoadMeta(spark, datasetPath, attr)
    val meta = metaOpt.getOrElse(return kept)
    val covered = meta.coveredFiles.toSet
    val rendered = values.map(v => renderValue(dt, v))
    if (rendered.exists(_.isEmpty)) return kept // one unrenderable literal
    var allowed = Set.empty[String]
    var unprunable = false
    rendered.flatten.foreach { r =>
      if (!unprunable) lookup(spark, datasetPath, meta, r) match {
        case Some(files) => allowed ++= files
        case None => unprunable = true // hot value: every covered file may match
      }
    }
    if (unprunable) return kept
    val before = kept.size
    val result = kept.filter(f => !covered(f.file) || allowed(f.file))
    if (result.size < before)
      log.info(s"scalar-index prune $attr: $before -> ${result.size} fragments")
    result
  }

  /** Files that may contain `rendered`, or None when the value is marked
    * unprunable. An ABSENT value yields Some(empty): provably in no
    * covered fragment. */
  private def lookup(spark: SparkSession, datasetPath: String,
      meta: ScalarMeta, rendered: String): Option[Set[String]] = {
    val b = bucketOf(rendered, meta.numBuckets)
    // a vanished postings ROOT (concurrent rebuild deleted the dir this
    // meta references, or a crashed swap) must read as "cannot prune",
    // NEVER as "value provably absent" — prune's catch keeps fragments
    val rootDir = new Path(livePostings(indexPath(datasetPath, meta.column), meta))
    val rfs = rootDir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!rfs.exists(rootDir)) throw new IllegalStateException(
      s"scalar postings dir $rootDir vanished (concurrent rebuild?) - " +
        "skipping prune conservatively")
    val lines = bucketLines(spark, datasetPath, meta, b)
    val hits = lines.filter(_.v == rendered)
    if (hits.exists(_.f.isEmpty)) None
    else Some(hits.flatMap(_.f.getOrElse(Nil)).toSet)
  }

  // ------------------------------------------------------ bucket read/cache

  /** Bounded session cache of parsed bucket lines keyed by buildId — a
    * serving loop's repeated point lookups skip the FS read; build and
    * refresh stamp a new buildId so stale entries can never serve. */
  private val bucketCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Int), Seq[PostLine]]()
  private val bucketCacheOrder =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, String, Int)]()

  private def bucketLines(spark: SparkSession, datasetPath: String,
      meta: ScalarMeta, bucket: Int): Seq[PostLine] = {
    val key = (indexPath(datasetPath, meta.column),
      meta.buildId.getOrElse(""), bucket)
    val cached = bucketCache.get(key)
    if (cached != null) return cached
    val dir = new Path(s"${livePostings(key._1, meta)}/bucket=$bucket")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val lines: Seq[PostLine] =
      if (!fs.exists(dir)) Nil
      else fs.listStatus(dir).toSeq
        .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
        .flatMap { st =>
          val in = fs.open(st.getPath)
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
            .filter(_.nonEmpty).map(Serialization.read[PostLine]).toList
          finally in.close()
        }
    while (bucketCache.size >= 256) {
      val victim = bucketCacheOrder.poll()
      if (victim == null) bucketCache.clear() else bucketCache.remove(victim)
    }
    bucketCache.put(key, lines)
    bucketCacheOrder.add(key)
    lines
  }

  // ------------------------------------------------------------- meta I/O

  private def latestManifest(spark: SparkSession, datasetPath: String): Manifest = {
    val root = new Path(datasetPath)
    val fs = LanceFormat.fileSystem(root, spark.sessionState.newHadoopConf())
    LanceFormat.readLatest(fs, root).getOrElse(
      throw new IllegalArgumentException(s"no lance dataset at $datasetPath"))
  }

  private def writeMeta(spark: SparkSession, ip: String, meta: ScalarMeta): ScalarMeta = {
    val mp = metaPath(ip)
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    val stamped = meta.copy(buildId = Some(java.util.UUID.randomUUID().toString))
    val out = fs.create(mp, true)
    try out.write(Serialization.write(stamped).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    metaCache.keySet.removeIf(_._1 == mp.toString)
    metaCacheOrder.removeIf(_._1 == mp.toString)
    stamped
  }

  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), ScalarMeta]()
  private val metaCacheOrder =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]()

  private[graft] def evictMeta(spark: SparkSession, datasetPath: String,
      column: String): Unit = {
    val mp = metaPath(indexPath(datasetPath, column))
    metaCache.keySet.removeIf(_._1 == mp.toString)
    metaCacheOrder.removeIf(_._1 == mp.toString)
    bucketCache.keySet.removeIf(_._1 == indexPath(datasetPath, column))
    bucketCacheOrder.removeIf(_._1 == indexPath(datasetPath, column))
  }

  def exists(spark: SparkSession, datasetPath: String, column: String): Boolean = {
    val mp = metaPath(indexPath(datasetPath, column))
    mp.getFileSystem(spark.sessionState.newHadoopConf()).exists(mp)
  }

  private def tryLoadMeta(spark: SparkSession, datasetPath: String,
      column: String): Option[ScalarMeta] =
    if (!exists(spark, datasetPath, column)) None
    else Some(loadMeta(spark, datasetPath, column))

  def loadMeta(spark: SparkSession, datasetPath: String, column: String): ScalarMeta = {
    val mp = metaPath(indexPath(datasetPath, column))
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(mp), s"no scalar index at $mp - build it first")
    val st = fs.getFileStatus(mp)
    val key = (mp.toString, st.getModificationTime, st.getLen)
    val cached = metaCache.get(key)
    if (cached != null) cached
    else {
      val in = fs.open(mp)
      val meta = try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n > 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Serialization.read[ScalarMeta](bytes.toString("UTF-8"))
      } finally in.close()
      while (metaCache.size >= 64) {
        val victim = metaCacheOrder.poll()
        if (victim == null) metaCache.clear() else metaCache.remove(victim)
      }
      metaCache.put(key, meta)
      metaCacheOrder.add(key)
      meta
    }
  }
}
