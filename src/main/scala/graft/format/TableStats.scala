package graft.format

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.types._
import org.json4s.NoTypeHints
import org.json4s.jackson.Serialization

import java.nio.charset.StandardCharsets

/** Dense HyperLogLog sketch (p=12 → 4096 registers, ~1.6% relative
  * error) over 64-bit hashes — the mergeable NDV summary behind
  * [[graft.Lance.analyze]]. Own implementation on the published
  * algorithm (Flajolet et al.; HLL++'s 64-bit-hash variant needs no
  * large-range correction): registers hold max leading-zero ranks,
  * union is elementwise max — which is what makes ANALYZE incremental:
  * sketch the NEW fragments, merge, never rescan history.
  */
final class HllSketch(val registers: Array[Byte]) extends Serializable {
  import HllSketch._
  def this() = this(new Array[Byte](HllSketch.M))

  def update(hash64: Long): Unit = {
    val idx = (hash64 >>> (64 - P)).toInt
    val w = hash64 << P
    // rank = leading zeros of the remaining bits + 1; all-zero tail caps
    val rank = (if (w == 0L) (64 - P) else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > registers(idx)) registers(idx) = rank.toByte
  }

  def merge(other: HllSketch): HllSketch = {
    val out = new Array[Byte](M)
    var i = 0
    while (i < M) {
      out(i) = math.max(registers(i), other.registers(i)).toByte
      i += 1
    }
    new HllSketch(out)
  }

  def estimate(): Long = {
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      sum += math.pow(2.0, -registers(i))
      if (registers(i) == 0) zeros += 1
      i += 1
    }
    val raw = Alpha * M * M / sum
    val e =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros) // linear counting
      else raw
    math.round(e)
  }

  def serialize(): String =
    java.util.Base64.getEncoder.encodeToString(registers)
}

object HllSketch {
  val P = 12
  val M: Int = 1 << P
  // the standard alpha_m constant for m >= 128
  val Alpha: Double = 0.7213 / (1 + 1.079 / M)

  def deserialize(s: String): HllSketch =
    new HllSketch(java.util.Base64.getDecoder.decode(s))
}

/** One bin of an equi-height histogram: [lo, hi] value range (doubles —
  * the representation catalyst histograms use) and the bin's distinct
  * count. */
case class HistogramBinMeta(lo: Double, hi: Double, ndv: Long)

/** One analyzed column: the NDV estimate plus the sketch it came from
  * (kept so a later incremental ANALYZE can merge instead of rescan),
  * byte-length stats for CBO row-size estimates, and (opt-in, numeric
  * columns, full-analyze only) an equi-height histogram — what turns
  * CBO's range selectivity from a uniformity guess into measured
  * distribution. `histogramHeight` = non-null rows per bin at build
  * time; incremental runs keep the prior histogram (stale but shaped —
  * bins cannot merge, the full pass rebuilds them).
  */
case class ColumnNdvMeta(ndv: Long, avgLen: Long, maxLen: Long, sketch: String,
    histogram: Option[Seq[HistogramBinMeta]] = None,
    histogramHeight: Option[Double] = None)

/** The `_stats/table_stats.json` sidecar: per-column NDV sketches
  * analyzed at `datasetVersion` over `fragmentFiles`. Readers serve it
  * even when newer versions exist (approximate-but-useful, the posture
  * of every warehouse's stale ANALYZE); writers use the version + file
  * list to decide between an incremental merge (appends only) and a full
  * recompute (any rewrite — NDV cannot shrink-merge).
  */
case class TableStatsMeta(datasetVersion: Long, analyzedAtMs: Long,
    rowCount: Long, columns: Map[String, ColumnNdvMeta])

object TableStats {
  private implicit val fmts: org.json4s.Formats = Serialization.formats(NoTypeHints)

  def statsPath(root: Path) = new Path(new Path(root, "_stats"), "table_stats.json")

  def read(fs: FileSystem, root: Path): Option[TableStatsMeta] = {
    val p = statsPath(root)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    try {
      val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      in.readFully(0L, bytes)
      Some(Serialization.read[TableStatsMeta](new String(bytes, StandardCharsets.UTF_8)))
    } catch { case _: Exception => None } finally in.close()
  }

  def write(fs: FileSystem, root: Path, meta: TableStatsMeta): Unit = {
    fs.mkdirs(new Path(root, "_stats"))
    val out = fs.create(statsPath(root), true)
    try out.write(Serialization.write(meta).getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Types ANALYZE sketches: atomic exact-representation types plus
    * floats/decimals (NDV of a measure still guides join sizing). Nested
    * and binary columns (embeddings, media) are skipped — NDV of a blob
    * column never guides a plan.
    */
  def eligible(dt: DataType): Boolean = dt match {
    case _: NumericType | StringType | BooleanType | DateType |
         TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Average on-wire length per type for CBO's row-size estimate;
    * strings/decimals measured, the rest from the type's fixed size. */
  def fixedLen(dt: DataType): Option[Long] = dt match {
    case StringType => None // measured
    case t => Some(t.defaultSize.toLong)
  }
}
