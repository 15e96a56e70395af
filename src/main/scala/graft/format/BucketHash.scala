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
      val phys = m.physicalName(col)
      val dt = m.schema.fields.find(_.name == col).map(_.dataType)
        .getOrElse(return frags)
      // buckets provably allowed by the conjunction of pushed filters:
      // intersect across top-level filters (they are AND-ed), None = no
      // equality evidence from that filter
      val allowed = filters.flatMap(allowedBuckets(_, phys, dt, n))
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
      val fields = cols.map(c => (m.physicalName(c),
        m.schema.fields.find(_.name == c).map(_.dataType).getOrElse(return frags)))
      val perCol: Seq[Seq[Any]] = fields.map { case (phys, dt) =>
        filters.flatMap(equalityValues(_, phys, dt)).reduceOption(_ intersect _)
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

  /** Catalyst-typed values `f` proves `phys` must equal (None = no
    * evidence). The [[allowedBuckets]] shape restricted to value sets,
    * reused per component of a composite key. */
  private def equalityValues(f: sources.Filter, phys: String,
      dt: org.apache.spark.sql.types.DataType): Option[Set[Any]] = f match {
    case sources.EqualTo(a, v) if a == phys =>
      BucketHash.toHashable(v, dt).map(Set(_))
    case sources.In(a, vs) if a == phys =>
      val hs = vs.toSeq.map(BucketHash.toHashable(_, dt))
      if (hs.forall(_.isDefined)) Some(hs.flatten.toSet) else None
    case sources.And(l, r) =>
      (equalityValues(l, phys, dt), equalityValues(r, phys, dt)) match {
        case (Some(a), Some(b)) => Some(a intersect b)
        case (a, b) => a.orElse(b)
      }
    case _ => None
  }

  /** Buckets filter `f` permits for `phys`, or None when it says nothing
    * provable about it (conservative). OR unions; AND intersects. */
  private def allowedBuckets(f: sources.Filter, phys: String,
      dt: org.apache.spark.sql.types.DataType, n: Int): Option[Set[Int]] = f match {
    case sources.EqualTo(a, v) if a == phys =>
      BucketHash.toHashable(v, dt).map(h =>
        Set(BucketHash.bucketOfInternal(Seq(h), Seq(dt), n)))
    case sources.In(a, vs) if a == phys =>
      val hs = vs.toSeq.map(BucketHash.toHashable(_, dt))
      if (hs.forall(_.isDefined))
        Some(hs.flatten.map(h => BucketHash.bucketOfInternal(Seq(h), Seq(dt), n)).toSet)
      else None
    case sources.And(l, r) =>
      (allowedBuckets(l, phys, dt, n), allowedBuckets(r, phys, dt, n)) match {
        case (Some(a), Some(b)) => Some(a intersect b)
        case (a, b) => a.orElse(b)
      }
    case sources.Or(l, r) =>
      for (a <- allowedBuckets(l, phys, dt, n); b <- allowedBuckets(r, phys, dt, n))
        yield a union b
    case _ => None
  }
}
