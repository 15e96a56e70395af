package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video
  * payloads ride as opaque `BINARY` columns with a typed metadata struct;
  * decode / feature-extract / resize / frame-sample run either as column
  * expressions (when byte arithmetic suffices) or as `mapPartitions`
  * batch jobs with a pluggable decoder.
  *
  * The decoders here are DETERMINISTIC STUBS (this environment has no
  * image/audio codecs); `RealCodecDecoder.decode` is the single marked
  * hole a production build fills in. Everything Spark-side — schema,
  * partitioning, batch iteration shape, explode of sampled frames — is
  * real and tested. Payload bytes are synthesized from `documents.text`
  * so the DuckDB oracle can reproduce every derived value.
  */
object Multimodal {

  /** Media table derived deterministically from documents:
    * (media_id, kind, bytes, mime) — kind cycles image/audio/video.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").select(
      col("doc_id").as("media_id"),
      expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END")
        .as("kind"),
      col("text").cast("binary").as("bytes"),
      expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END")
        .as("mime"))

  /** Exact media dedup by content digest (m66): the first pass every
    * multimodal corpus runs — identical payload bytes collapse regardless
    * of id/filename (re-uploads, mirror crawls). One codegen'd md5 per
    * row + one hash aggregate; at 100 TB the digest rides the scan and
    * only (kind, hash) shuffles, never the payload bytes.
    */
  def m66ContentDedup(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .withColumn("content_hash", md5(col("bytes")))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        countDistinct(col("content_hash")).as("n_unique"),
        (count(lit(1)) - countDistinct(col("content_hash"))).as("n_dupes"))
      .orderBy(col("kind"))

  /** Column-expression metadata extraction ("decode" as byte arithmetic):
    * sizes from the payload, fake dimensions from a content hash — the
    * shape a real EXIF/probe step would produce.
    */
  def m61MediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .withColumn("n_bytes", length(col("bytes")).cast("long"))
      .withColumn("__h", expr("CAST(conv(substr(md5(bytes), 1, 8), 16, 10) AS BIGINT)"))
      .withColumn("width", expr("CAST(1 + __h % 1920 AS INT)"))
      .withColumn("height", expr("CAST(1 + (__h DIV 1920) % 1080 AS INT)"))
      .withColumn("duration_ms",
        expr("CASE WHEN kind = 'image' THEN 0 ELSE n_bytes * 10 END"))
      .select(col("media_id"), col("kind"), col("mime"), col("n_bytes"),
        col("width"), col("height"), col("duration_ms"))
      .orderBy(col("media_id"))

  /** Frame sampling for video payloads: every 256-byte stride yields one
    * 64-byte "frame" (the real op samples at a time stride; the explode /
    * per-frame-row plumbing is identical). Output is one row per frame.
    *
    * Oracle caveat: the engine slices BYTES of the binary payload; DuckDB
    * has no BLOB substring, so the oracle slices VARCHAR codepoints. The
    * two agree exactly on the driver's pure-ASCII corpus; byte semantics
    * (the engine side) are the intended ones for real media payloads.
    */
  def m62FrameSample(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .filter(col("kind") === "video")
      .select(col("media_id"), posexplode(expr(
        "transform(sequence(0, CAST((length(bytes) - 1) / 256 AS INT))," +
          " i -> substring(bytes, i * 256 + 1, 64))")).as(Seq("frame_idx", "frame")))
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        length(col("frame")).cast("long").as("frame_bytes"),
        md5(col("frame")).as("frame_hash"))
      .orderBy(col("media_id"), col("frame_idx"))

  // ---- mapPartitions decode path (the batch-UDF shape) ----

  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
    width: Int, height: Int, mean_byte: Double)

  /** A decoder plugged into the partition-batch pipeline. */
  trait MediaDecoder extends Serializable {
    def decode(row: MediaRow): MediaFeatures
  }

  /** Deterministic stand-in for a codec: dims from a content hash, mean
    * byte value as the "signal" feature.
    */
  object StubDecoder extends MediaDecoder {
    override def decode(r: MediaRow): MediaFeatures = {
      val h = java.util.Arrays.hashCode(r.bytes) & 0x7fffffff
      var sum = 0L
      r.bytes.foreach(b => sum += (b & 0xff))
      MediaFeatures(r.media_id, r.kind, r.bytes.length,
        1 + h % 1920, 1 + (h / 1920) % 1080,
        if (r.bytes.isEmpty) 0.0 else sum.toDouble / r.bytes.length)
    }
  }

  /** Where a real codec integration goes (javacv/ffmpeg/ImageIO…). */
  object RealCodecDecoder extends MediaDecoder {
    override def decode(row: MediaRow): MediaFeatures =
      ??? // no codecs in this environment — see StubDecoder for the contract
  }

  /** Partition-batch decode: one decoder instance per partition iterator,
    * rows streamed through it (the Scala equivalent of mapInPandas —
    * amortizes decoder init, keeps memory at O(row), preserves
    * partitioning).
    */
  def decodeFeatures(media: Dataset[MediaRow],
      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decoder.decode))
  }

  /** "Resize": normalize payloads to exactly `size` bytes (truncate or
    * zero-pad) — the byte-plumbing shape of a thumbnailing step.
    */
  def resizeBytes(media: DataFrame, size: Int): DataFrame =
    media.withColumn("bytes",
      expr(s"CASE WHEN length(bytes) >= $size THEN substring(bytes, 1, $size) " +
        s"ELSE rpad(bytes, $size, X'00') END"))

  /** Driver gate for the partition-batch decode path: run the full
    * Dataset[MediaRow] → mapPartitions → Dataset[MediaFeatures] pipeline
    * and emit the oracle-reproducible features (payload size + mean byte
    * value — the hash-derived fake dims stay spec-only since the oracle
    * can't reproduce JVM Arrays.hashCode). What this row proves: encoder
    * round-trip, decoder-per-partition iteration, and the feature schema
    * — the plumbing a real codec drops into.
    */
  def m63DecodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ds = mediaTable(spark, dir)
      .select(col("media_id"), col("kind"), col("bytes")).as[MediaRow]
    decodeFeatures(ds, StubDecoder).toDF()
      .select(col("media_id"), col("kind"),
        col("n_bytes").cast("long").as("n_bytes"), col("mean_byte"))
      .orderBy(col("media_id"))
  }

  /** The resize/normalize step gated end-to-end: payloads truncated to a
    * fixed 40 bytes (every payload is ≥ 44 bytes at every sf, so the
    * truncate branch is what runs; the zero-pad branch stays spec-only —
    * NUL bytes don't survive a VARCHAR oracle). Content hashes prove the
    * byte slicing is exact.
    */
  def m64Resize(spark: SparkSession, dir: String): DataFrame =
    resizeBytes(mediaTable(spark, dir), 40)
      .select(col("media_id"), col("kind"),
        length(col("bytes")).cast("long").as("n_bytes"),
        md5(col("bytes")).as("content_hash"))
      .orderBy(col("media_id"))

  /** Int8 embedding quantization (m65) — the export step that shrinks a
    * float32 embedding corpus 4× for serving/training: per-vector
    * absmax scale (`max|x| / 127`), symmetric round-to-nearest codes in
    * [-127, 127]. With absmax scaling no code ever clips, and the
    * roundtrip error is bounded by scale/2 — the gate emits the exact
    * per-vector max error so a quantizer regression (wrong scale, wrong
    * rounding, clipping) moves hashed values, not just a tolerance.
    *
    * Everything is per-row codegen'd expression work — no shuffle before
    * the gate's ORDER BY — and every float op (float32→double widening,
    * one division, round, fused error max) is bit-reproducible by the
    * DuckDB oracle; min/max/sum over codes are order-insensitive exact.
    * Zero vectors define code 0 (the CASE guard, both engines).
    */
  def m65Int8Quant(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .withColumn("__v", col("embedding").cast("array<double>"))
      .withColumn("scale",
        expr("array_max(transform(__v, x -> abs(x))) / CAST(127 AS DOUBLE)"))
      .withColumn("q", expr(
        "transform(__v, x -> CASE WHEN scale = CAST(0 AS DOUBLE) THEN 0 " +
          "ELSE CAST(round(x / scale) AS INT) END)"))
      .select(col("vec_id"), col("scale"),
        expr("array_min(q)").as("q_min"),
        expr("array_max(q)").as("q_max"),
        expr("aggregate(q, CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("q_sum"),
        expr("array_max(zip_with(__v, q, (x, c) -> " +
          "abs(x - CAST(c AS DOUBLE) * scale)))").as("max_err"))
      .orderBy(col("vec_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m61_media_meta" -> m61MediaMeta,
    "m62_frame_sample" -> m62FrameSample,
    "m63_decode_features" -> m63DecodeFeatures,
    "m64_resize" -> m64Resize,
    "m65_int8_quant" -> m65Int8Quant,
    "m66_content_dedup" -> m66ContentDedup,
  )

  val oracleSql: Map[String, String] = Map(
    "m66_content_dedup" ->
      """SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |    WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  COUNT(*) AS n_media,
        |  COUNT(DISTINCT md5(text)) AS n_unique,
        |  COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dupes
        |FROM documents GROUP BY 1 ORDER BY kind""".stripMargin,
    // absmax int8: same widening, same single division, same round; the
    // error max is per-element double arithmetic, order-insensitive
    "m65_int8_quant" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |    list_max(list_transform(v, x -> abs(x))) / CAST(127 AS DOUBLE) AS scale
        |  FROM e),
        |q AS (SELECT vec_id, v, scale,
        |    list_transform(v, x -> CASE WHEN scale = 0 THEN 0
        |      ELSE CAST(round(x / scale) AS INT) END) AS qv
        |  FROM s)
        |SELECT vec_id, scale,
        |  CAST(list_min(qv) AS INT) AS q_min,
        |  CAST(list_max(qv) AS INT) AS q_max,
        |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
        |  list_max(list_transform(generate_series(1, len(v)),
        |    i -> abs(v[i] - CAST(qv[i] AS DOUBLE) * scale))) AS max_err
        |FROM q ORDER BY vec_id""".stripMargin,
    "m61_media_meta" ->
      """SELECT media_id, kind, mime, n_bytes,
        | CAST(1 + __h % 1920 AS INT) AS width,
        | CAST(1 + (__h // 1920) % 1080 AS INT) AS height,
        | CASE WHEN kind = 'image' THEN 0 ELSE n_bytes * 10 END AS duration_ms
        |FROM (
        | SELECT doc_id AS media_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
        |  octet_length(encode(text)) AS n_bytes,
        |  CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) AS __h
        | FROM documents)
        |ORDER BY media_id""".stripMargin,
    // mean byte of pure-ASCII payloads = mean codepoint; the integer sum
    // is exact in both engines so the single division is bit-identical
    "m63_decode_features" ->
      """SELECT media_id, kind, n_bytes,
        | CAST(bsum AS DOUBLE) / n_bytes AS mean_byte
        |FROM (
        | SELECT doc_id AS media_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  list_sum(list_transform(generate_series(1, length(text)),
        |    i -> ascii(substring(text, i, 1)))) AS bsum
        | FROM documents)
        |ORDER BY media_id""".stripMargin,
    "m64_resize" ->
      """SELECT doc_id AS media_id,
        | CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        | CAST(40 AS BIGINT) AS n_bytes,
        | md5(substring(text, 1, 40)) AS content_hash
        |FROM documents ORDER BY media_id""".stripMargin,
    "m62_frame_sample" ->
      """SELECT media_id, frame_idx, octet_length(encode(frame)) AS frame_bytes,
        | md5(frame) AS frame_hash
        |FROM (
        | SELECT doc_id AS media_id, i AS frame_idx,
        |  substring(text, i * 256 + 1, 64) AS frame
        | FROM documents,
        |  unnest(generate_series(0, CAST((octet_length(encode(text)) - 1) // 256 AS INT))) AS u(i)
        | WHERE CAST(doc_id % 3 AS INT) = 2)
        |ORDER BY media_id, frame_idx""".stripMargin,
  )
}
