package graft.format

import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.types._

/** The one bucket function every storage-partitioned-join participant
  * agrees on: writer routing ([[graft.connector.LanceDataWriter]]), the
  * catalog's V2 `bucket` function (what Spark's key-grouped partitioning
  * compares across join sides), bucket-equality fragment pruning, and
  * [[graft.Lance.clusterByBucket]]'s rewrite.
  *
  * A single-column spec is deliberately identical to Spark's own
  * `pmod(hash(col), n)` (Murmur3, seed 42) — users can compute a row's
  * bucket in plain SQL and specs cross-check the call sites against the
  * engine's `hash()`. A COMPOSITE spec is a GRID: each column gets its
  * own independent `pmod(hash(cᵢ), n)` digit and the fragment tag is the
  * row-major composition ([[gridTagOfInternal]]) — the Iceberg
  * multi-field shape, one unary `bucket(n, cᵢ)` transform per column, so
  * storage-partitioned joins engage for composite keys and equality on
  * ANY subset of the key prunes its digit. A NULL key component hashes
  * to the seed (Spark's `Murmur3Hash.eval` contract).
  */
object BucketHash {

  /** Key types admitted into a bucket spec: exact-equality types whose
    * catalyst representation is stable across engines and versions.
    * Floating point is excluded on purpose (NaN/-0.0 equality is a trap
    * for a join key), as are nested types.
    */
  def supportedKeyType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType |
         DateType | TimestampType | TimestampNTZType | BooleanType => true
    case _ => false
  }

  /** Bucket of catalyst-internal `values` (UTF8String for strings, the
    * representation an InternalRow yields). `pmod` of the chained 32-bit
    * murmur3 — always in [0, numBuckets). */
  def bucketOfInternal(values: Seq[Any], types: Seq[DataType], numBuckets: Int): Int = {
    var h = 42
    var i = 0
    while (i < values.length) {
      val v = values(i)
      if (v != null) h = Murmur3HashFunction.hash(v, types(i), h.toLong).toInt
      i += 1
    }
    val r = h % numBuckets
    if (r < 0) r + numBuckets else r
  }

  /** GRID tag of a (possibly composite) key: every column hashes
    * INDEPENDENTLY into its own `pmod(murmur3(col), n)` digit and the
    * digits compose row-major (`tag = (b₁·n + b₂)·n + …`). A single
    * column degenerates to the classic `pmod(hash(col), n)` — unary
    * specs keep their on-disk semantics bit for bit. Composite specs get
    * grid tags because per-column digits are what Spark's
    * storage-partitioned-join machinery admits: the scan reports ONE
    * UNARY `bucket(n, cᵢ)` transform per key column (Iceberg's
    * multi-field shape) — `KeyGroupedShuffleSpec.keyPositions` asserts
    * exactly one column leaf per partition expression, so a combined
    * tuple hash can never engage. Independent digits also prune on a
    * SUBSET of bound key columns (a tuple hash needs all of them). */
  def gridTagOfInternal(values: Seq[Any], types: Seq[DataType], numBuckets: Int): Int =
    gridTagOfInternal(values, types, Seq.fill(values.length)(numBuckets))

  /** Per-column-width form (Iceberg's `bucket(8,a), bucket(32,b)`):
    * digit i is `pmod(murmur3(cᵢ), widths(i))`, composed row-major with
    * MIXED radices (`tag = (b₁·w₂ + b₂)·w₃ + …`). Equal widths reproduce
    * the scalar form bit for bit. */
  def gridTagOfInternal(values: Seq[Any], types: Seq[DataType],
      widths: Seq[Int]): Int = {
    var tag = 0
    var i = 0
    while (i < values.length) {
      var h = 42
      if (values(i) != null)
        h = Murmur3HashFunction.hash(values(i), types(i), 42L).toInt
      val w = widths(i)
      val r = h % w
      tag = tag * w + (if (r < 0) r + w else r)
      i += 1
    }
    tag
  }

  /** Row-major digit decomposition of a grid tag — digit i is column i's
    * own `pmod(murmur3(cᵢ), n)` bucket. */
  def gridDigits(tag: Int, numCols: Int, numBuckets: Int): Array[Int] =
    gridDigits(tag, Seq.fill(numCols)(numBuckets))

  /** Mixed-radix decomposition under per-column widths. */
  def gridDigits(tag: Int, widths: Seq[Int]): Array[Int] = {
    val out = new Array[Int](widths.size)
    var t = tag
    var i = widths.size - 1
    while (i >= 0) { out(i) = t % widths(i); t /= widths(i); i -= 1 }
    out
  }

  /** Total distinct grid tags for a spec: numBuckets^numCols, saturating
    * (callers only compare against small caps). */
  def totalTags(numCols: Int, numBuckets: Int): Long =
    totalTags(Seq.fill(numCols)(numBuckets))

  /** Product of the per-column widths, saturating. */
  def totalTags(widths: Seq[Int]): Long =
    widths.foldLeft(1L)((acc, w) =>
      if (acc > (1L << 40)) acc else acc * w)

  /** The routing expression as a [[org.apache.spark.sql.Column]] —
    * byte-identical to [[gridTagOfInternal]]: `pmod(hash(c), n)` for one
    * column, the row-major digit composition for composite keys. Every
    * DataFrame call site that repartitions or sorts by bucket MUST build
    * the expression here: a drifted copy (different seed, column order,
    * tuple-vs-grid hash) silently breaks fragment purity and with it SPJ
    * correctness. */
  def bucketColumn(cols: Seq[String], numBuckets: Int): org.apache.spark.sql.Column =
    bucketColumn(cols, Seq.fill(cols.size)(numBuckets))

  /** Per-column-width form; mixed-radix composition mirrors
    * [[gridTagOfInternal]] exactly. */
  def bucketColumn(cols: Seq[String], widths: Seq[Int]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    val digits = cols.zip(widths).map { case (c, w) => pmod(hash(col(c)), lit(w)) }
    // tag = ((d₀·w₁ + d₁)·w₂ + d₂)·… — digit i enters under ITS width
    digits.zipWithIndex.tail.foldLeft(digits.head) {
      case (acc, (d, i)) => acc * widths(i) + d
    }
  }

  /** Bucket of EXTERNAL Scala values (String, java.sql types — the domain
    * pushed-filter literals live in); converted to catalyst first. */
  def bucketOfExternal(values: Seq[Any], types: Seq[DataType], numBuckets: Int): Int = {
    val internal = values.zip(types).map { case (v, t) =>
      org.apache.spark.sql.catalyst.CatalystTypeConverters.convertToCatalyst(v) match {
        // convertToCatalyst maps java.sql.Date/Timestamp and Instant/
        // LocalDate fine, but a raw Long for a timestamp stays a Long —
        // which is already the internal form, so identity covers it
        case c => c
      }
    }
    bucketOfInternal(internal, types, numBuckets)
  }

  /** A pushed-filter literal as the exact catalyst value the column's
    * hash expects, or None when the shapes don't line up (then the caller
    * must not prune — a mis-typed hash prunes WRONG, not just less). */
  private[graft] def toHashable(v: Any, dt: DataType): Option[Any] = {
    if (v == null) return None // IS NULL never arrives as EqualTo; bail out
    val c = org.apache.spark.sql.catalyst.CatalystTypeConverters.convertToCatalyst(v)
    (dt, c) match {
      case (ByteType, x: java.lang.Byte) => Some(x)
      case (ShortType, x: java.lang.Short) => Some(x)
      case (IntegerType | DateType, x: java.lang.Integer) => Some(x)
      case (LongType | TimestampType | TimestampNTZType, x: java.lang.Long) => Some(x)
      case (BooleanType, x: java.lang.Boolean) => Some(x)
      case (StringType, x: org.apache.spark.unsafe.types.UTF8String) => Some(x)
      case _ => None
    }
  }
}

/** Driver-side fragment pruning from the declared bucket layout: an
  * `=`/`IN` filter on a SINGLE-column bucket key keeps only fragments
  * tagged with the literals' buckets — the manifest answers a point
  * lookup with zero I/O, complementing min/max stats (useless for hashed
  * placement) and the scalar index (which costs a sidecar). Untagged
  * fragments (written before the declaration) always survive; any shape
  * mismatch prunes nothing. Composite keys carry GRID tags (one digit
  * per column), so equality on any SUBSET of the key columns prunes on
  * the bound digits.
  */
object BucketPrune {
  import org.apache.spark.sql.sources

  def prune(m: Manifest, filters: Seq[sources.Filter],
      frags: Seq[FragmentMeta]): Seq[FragmentMeta] = m.bucketBy match {
    case Some(spec @ BucketSpecMeta(_, Seq(col), _, _)) =>
      val n = spec.widthsVec.head
      // filters arrive in PHYSICAL names from the scan's runtime-filter
      // path but in LOGICAL names from the DML scoping path — match
      // either. Sound because a rename never frees its physical name for
      // a new column (mergeLogicalNames refuses the collision), so both
      // names always denote this one column.
      val names = Set(col, m.physicalName(col))
      val dt = m.schema.fields.find(_.name == col).map(_.dataType)
        .getOrElse(return frags)
      // buckets provably allowed by the conjunction of pushed filters:
      // intersect across top-level filters (they are AND-ed), None = no
      // equality evidence from that filter
      val allowed = filters.flatMap(allowedBuckets(_, names, dt, n))
        .reduceOption(_ intersect _)
      allowed match {
        case Some(bs) => frags.filter(_.bucket.forall(bs.contains))
        case None => frags
      }
    // composite key, GRID tags: each column is an independent digit of
    // the fragment tag, so equality evidence on ANY subset of the key
    // columns prunes on its digit(s) — no cross product, no all-bound
    // requirement. Gated on the spec's scheme: a legacy tuple-hash tag
    // decoded as digits would prune WRONG, not just less.
    case Some(spec @ BucketSpecMeta(_, cols, _, _))
        if cols.size > 1 && spec.compositeTagsReadable =>
      val widths = spec.widthsVec
      val perDigit: Seq[Option[Set[Int]]] = cols.zip(widths).map { case (c, n) =>
        val names = Set(c, m.physicalName(c))
        val dt = m.schema.fields.find(_.name == c).map(_.dataType)
          .getOrElse(return frags)
        filters.flatMap(allowedBuckets(_, names, dt, n))
          .reduceOption(_ intersect _)
      }
      if (perDigit.forall(_.isEmpty)) frags
      else frags.filter(_.bucket.forall { tag =>
        val ds = BucketHash.gridDigits(tag, widths)
        ds.iterator.zip(perDigit.iterator).forall {
          case (d, allowed) => allowed.forall(_.contains(d))
        }
      })
    case _ => frags
  }

  /** Buckets filter `f` permits for the named column, or None when it says nothing
    * provable about it (conservative). OR unions; AND intersects. */
  private def allowedBuckets(f: sources.Filter, names: Set[String],
      dt: org.apache.spark.sql.types.DataType, n: Int): Option[Set[Int]] = f match {
    case sources.EqualTo(a, v) if names(a) =>
      BucketHash.toHashable(v, dt).map(h =>
        Set(BucketHash.bucketOfInternal(Seq(h), Seq(dt), n)))
    case sources.In(a, vs) if names(a) =>
      val hs = vs.toSeq.map(BucketHash.toHashable(_, dt))
      if (hs.forall(_.isDefined))
        Some(hs.flatten.map(h => BucketHash.bucketOfInternal(Seq(h), Seq(dt), n)).toSet)
      else None
    case sources.And(l, r) =>
      (allowedBuckets(l, names, dt, n), allowedBuckets(r, names, dt, n)) match {
        case (Some(a), Some(b)) => Some(a intersect b)
        case (a, b) => a.orElse(b)
      }
    case sources.Or(l, r) =>
      for (a <- allowedBuckets(l, names, dt, n); b <- allowedBuckets(r, names, dt, n))
        yield a union b
    case _ => None
  }
}
