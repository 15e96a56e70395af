package graft.format

import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.types._

/** The one bucket function every storage-partitioned-join participant
  * agrees on: writer routing ([[graft.connector.LanceDataWriter]]), the
  * catalog's V2 `bucket` function (what Spark's key-grouped partitioning
  * compares across join sides), bucket-equality fragment pruning, and
  * [[graft.Lance.clusterByBucket]]'s rewrite.
  *
  * Deliberately identical to Spark's own `pmod(hash(cols...), n)`:
  * Murmur3 (seed 42) chained across the key columns with the running
  * 32-bit value as the next seed — so users can compute a row's bucket in
  * plain SQL and specs can cross-check the three call sites against the
  * engine's `hash()`. NULL key components leave the running hash
  * unchanged (Spark's `Murmur3Hash.eval` contract).
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

  /** The routing expression as a [[org.apache.spark.sql.Column]] —
    * `pmod(hash(cols...), numBuckets)`, byte-identical to
    * [[bucketOfInternal]] by the seed-42 contract above. Every DataFrame
    * call site that repartitions or sorts by bucket MUST build the
    * expression here: a drifted copy (different seed, column order)
    * silently breaks fragment purity and with it SPJ correctness. */
  def bucketColumn(cols: Seq[String], numBuckets: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    pmod(hash(cols.map(col): _*), lit(numBuckets))
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
  * mismatch prunes nothing. Multi-column keys only help when every
  * component is equality-bound — not implemented; single-column keys are
  * the overwhelmingly common join/lookup shape.
  */
object BucketPrune {
  import org.apache.spark.sql.sources

  def prune(m: Manifest, filters: Seq[sources.Filter],
      frags: Seq[FragmentMeta]): Seq[FragmentMeta] = m.bucketBy match {
    case Some(BucketSpecMeta(n, Seq(col))) =>
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
    // composite key: prunable only when EVERY component is equality-
    // bound (the tuple hash needs all of them); the per-column candidate
    // sets cross-product into tuple buckets, capped so a wide IN list
    // can't explode the driver
    case Some(BucketSpecMeta(n, cols)) if cols.size > 1 =>
      val fields = cols.map(c => (Set(c, m.physicalName(c)),
        m.schema.fields.find(_.name == c).map(_.dataType).getOrElse(return frags)))
      val perCol: Seq[Seq[Any]] = fields.map { case (names, dt) =>
        filters.flatMap(equalityValues(_, names, dt)).reduceOption(_ intersect _)
          .getOrElse(return frags).toSeq
      }
      if (perCol.map(_.size.toLong).product > 64L) return frags
      val types = fields.map(_._2)
      val allowed = perCol.foldLeft(Seq(Seq.empty[Any]))((acc, vs) =>
        acc.flatMap(prefix => vs.map(prefix :+ _)))
        .map(tuple => BucketHash.bucketOfInternal(tuple, types, n)).toSet
      frags.filter(_.bucket.forall(allowed.contains))
    case _ => frags
  }

  /** Catalyst-typed values `f` proves the named column must equal (None = no
    * evidence). The [[allowedBuckets]] shape restricted to value sets,
    * reused per component of a composite key. */
  private def equalityValues(f: sources.Filter, names: Set[String],
      dt: org.apache.spark.sql.types.DataType): Option[Set[Any]] = f match {
    case sources.EqualTo(a, v) if names(a) =>
      BucketHash.toHashable(v, dt).map(Set(_))
    case sources.In(a, vs) if names(a) =>
      val hs = vs.toSeq.map(BucketHash.toHashable(_, dt))
      if (hs.forall(_.isDefined)) Some(hs.flatten.toSet) else None
    case sources.And(l, r) =>
      (equalityValues(l, names, dt), equalityValues(r, names, dt)) match {
        case (Some(a), Some(b)) => Some(a intersect b)
        case (a, b) => a.orElse(b)
      }
    case _ => None
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
