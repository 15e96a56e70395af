package graft.format

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-column statistics of one fragment, carried in the manifest.
  *
  * `min`/`max` are BOUNDS, not necessarily attained values (string maxima
  * are truncated upward), encoded as strings for JSON stability: integral /
  * date-days / timestamp-micros as decimal longs, float/double via
  * `Double.toString` (`Infinity` included), decimals as plain strings,
  * strings raw (capped at [[FragmentStats.MaxStatLength]] chars). A column
  * with no entry — or an entry with `min`/`max` absent (all-null fragment,
  * NaN observed) — never prunes; `nullCount` is always exact.
  *
  * `values` is the EXACT distinct-value set of the fragment's column when
  * it stayed within [[FragmentStats.ValueSetMaxSize]] values (sorted for
  * JSON stability; absent on overflow, on float/double columns, and on
  * manifests written before the field existed). Range bounds cannot prune
  * point lookups on low-cardinality dictionary-ish columns (`lang = 'fr'`
  * survives min='de', max='zh' in every fragment); the value set is the
  * bitmap-index equivalent that can. Strings participate only when every
  * observed value fits [[FragmentStats.MaxStatLength]] untruncated — a
  * truncated member could prove a false absence.
  */
case class ColStats(min: Option[String], max: Option[String], nullCount: Long,
  values: Option[Seq[String]] = None)

/** Manifest-level data skipping — the piece of the Lance model that makes
  * selective scans cheap at 100 TB. Parquet row-group pruning only helps
  * AFTER every footer is opened: at a million fragments that is a million
  * object-store reads before the first data byte. Per-fragment min/max in
  * the manifest lets the DRIVER drop non-matching fragments with zero I/O —
  * one JSON read, then only surviving fragments get tasks, footers, and
  * row-group pruning. (The reference's manifest carries only `rowCount`,
  * `LanceSplit.java:53,92-94`; column stats are how the Lance format itself
  * — and Delta/Iceberg — solve the same problem at scale.)
  *
  * Pruning is strictly conservative: a fragment is dropped only when its
  * stats PROVE no row can satisfy the pushed filters. Unknown filter
  * shapes, missing stats, unparseable bounds all keep the fragment.
  */
object FragmentStats {

  /** String stats are capped at this many chars: a document-body column
    * must not bloat every manifest. A truncated prefix stays a valid lower
    * bound; maxima are truncated-then-incremented (see [[upperBound]]).
    */
  val MaxStatLength = 64

  /** Distinct values tracked per column before the set overflows to None.
    * 32 covers the dictionary-ish columns value sets exist for (languages,
    * sources, status codes, return flags) while bounding manifest bloat to
    * ≤ 32 short strings per column per fragment.
    */
  val ValueSetMaxSize = 32

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.FragmentStats")

  // ---------------------------------------------------------------- write

  def eligible(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | BooleanType |
         FloatType | DoubleType | StringType => true
    case _: DecimalType => true
    case _ => false
  }

  /** The stats-carrying columns of a schema: every eligible top-level
    * field PLUS first-level STRUCT leaves, keyed by their dotted path
    * (`meta.lang`) — real corpora carry nested metadata columns, and
    * `doc.meta.lang = 'fr'` deserves the same driver-side skipping as a
    * flat column. Deeper nesting, arrays, and maps stay out (their
    * bounds are not scalar); pruning on them is simply never claimed.
    */
  private[graft] def statColumns(schema: StructType): Seq[(String, DataType)] = {
    // a TOP-LEVEL field whose name literally contains a dot owns its
    // key: a colliding struct leaf is skipped (recording it would file
    // one column's bounds under the other's name — wrong pruning)
    val topNames = schema.fieldNames.toSet
    schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case dt if eligible(dt) => Seq(f.name -> dt)
        case st: StructType => st.fields.toSeq.collect {
          case c if eligible(c.dataType) &&
              !topNames.contains(s"${f.name}.${c.name}") =>
            s"${f.name}.${c.name}" -> c.dataType
        }
        case _ => Seq.empty
      }
    }
  }

  /** Resolve a pushed-filter attribute — a top-level name or a dotted
    * first-level struct path — to its leaf type, mirroring
    * [[statColumns]]'s keying. A top-level field whose name happens to
    * contain a dot wins over the path reading (it is the one the stats
    * writer keyed). */
  private[graft] def leafType(schema: StructType, attr: String): Option[DataType] =
    schema.fields.find(_.name == attr).map(_.dataType).orElse {
      attr.split('.') match {
        case Array(parent, child) =>
          schema.fields.find(_.name == parent).map(_.dataType).flatMap {
            case st: StructType => st.fields.find(_.name == child).map(_.dataType)
            case _ => None
          }
        case _ => None
      }
    }

  /** One column's running min/max/nullCount while a fragment is written.
    * Values are compared in their native domain (longs as longs — no
    * double rounding above 2^53; strings in UTF8 binary order, matching
    * both Spark's string ordering and parquet's).
    */
  private sealed abstract class Tracker(val name: String) {
    var nulls = 0L
    def observe(row: InternalRow, i: Int): Unit
    def minStr: Option[String]
    def maxStr: Option[String]
    def valuesStr: Option[Seq[String]] = None
    def result: ColStats = ColStats(minStr, maxStr, nulls, valuesStr)
  }

  private final class LongTracker(name: String, get: (InternalRow, Int) => Long)
      extends Tracker(name) {
    private var lo = Long.MaxValue
    private var hi = Long.MinValue
    private var seen = false
    // exact distinct values while ≤ ValueSetMaxSize: linear scan of a
    // compact array (no per-row boxing; ≤32 compares, usually a handful)
    private var vals = new Array[Long](ValueSetMaxSize)
    private var nVals = 0
    def observe(row: InternalRow, i: Int): Unit = {
      val v = get(row, i); seen = true
      if (v < lo) lo = v
      if (v > hi) hi = v
      if (nVals >= 0) {
        var j = 0
        while (j < nVals && vals(j) != v) j += 1
        if (j == nVals) {
          if (nVals == ValueSetMaxSize) { nVals = -1; vals = null } // overflow
          else { vals(nVals) = v; nVals += 1 }
        }
      }
    }
    def minStr: Option[String] = if (seen) Some(lo.toString) else None
    def maxStr: Option[String] = if (seen) Some(hi.toString) else None
    override def valuesStr: Option[Seq[String]] =
      if (nVals < 0) None
      else Some(vals.take(nVals).sorted.map(_.toString).toSeq)
  }

  private final class DoubleTracker(name: String, get: (InternalRow, Int) => Double)
      extends Tracker(name) {
    private var lo = Double.PositiveInfinity
    private var hi = Double.NegativeInfinity
    private var seen = false
    private var nan = false // a NaN makes min/max meaningless for pruning
    def observe(row: InternalRow, i: Int): Unit = {
      val v = get(row, i)
      if (java.lang.Double.isNaN(v)) nan = true
      else {
        seen = true
        if (v < lo) lo = v
        if (v > hi) hi = v
      }
    }
    def minStr: Option[String] = if (seen && !nan) Some(lo.toString) else None
    def maxStr: Option[String] = if (seen && !nan) Some(hi.toString) else None
  }

  private final class DecimalTracker(name: String, p: Int, s: Int)
      extends Tracker(name) {
    private var lo: java.math.BigDecimal = _
    private var hi: java.math.BigDecimal = _
    def observe(row: InternalRow, i: Int): Unit = {
      val v = row.getDecimal(i, p, s).toJavaBigDecimal
      if (lo == null || v.compareTo(lo) < 0) lo = v
      if (hi == null || v.compareTo(hi) > 0) hi = v
    }
    def minStr: Option[String] = Option(lo).map(_.toPlainString)
    def maxStr: Option[String] = Option(hi).map(_.toPlainString)
  }

  private final class StringTracker(name: String) extends Tracker(name) {
    private var lo: UTF8String = _
    private var hi: UTF8String = _
    // exact distinct values while ≤ ValueSetMaxSize AND every member is
    // short enough to store untruncated (a truncated member could prove
    // a false absence); cloned on insert (scan rows reuse buffers)
    private var vals = new Array[UTF8String](ValueSetMaxSize)
    private var nVals = 0
    def observe(row: InternalRow, i: Int): Unit = {
      val v = row.getUTF8String(i)
      // rows from the scan/shuffle reuse buffers — clone only on a new extreme
      if (lo == null || v.compareTo(lo) < 0) lo = v.clone()
      if (hi == null || v.compareTo(hi) > 0) hi = v.clone()
      if (nVals >= 0) {
        if (v.numChars() > MaxStatLength) { nVals = -1; vals = null }
        else {
          var j = 0
          while (j < nVals && !vals(j).equals(v)) j += 1
          if (j == nVals) {
            if (nVals == ValueSetMaxSize) { nVals = -1; vals = null }
            else { vals(nVals) = v.clone(); nVals += 1 }
          }
        }
      }
    }
    override def valuesStr: Option[Seq[String]] =
      if (nVals < 0) None
      else Some(vals.take(nVals).map(_.toString).sorted.toSeq)
    def minStr: Option[String] = // a prefix is always <= the full string
      Option(lo).map(s => truncate(s.toString))
    def maxStr: Option[String] = Option(hi).map(_.toString).flatMap { s =>
      if (s.length <= MaxStatLength) Some(s) else upperBound(truncate(s))
    }
  }

  private def truncate(s: String): String =
    if (s.length <= MaxStatLength) s else s.substring(0, MaxStatLength)

  /** Smallest convenient string > every string with this prefix: bump the
    * rightmost char that can grow and drop the tail (Iceberg's truncate-
    * and-increment). All-￿ prefixes have no such bound → None.
    */
  private[graft] def upperBound(prefix: String): Option[String] = {
    val cs = prefix.toCharArray
    var i = cs.length - 1
    while (i >= 0 && cs(i) == Char.MaxValue) i -= 1
    if (i < 0) None
    else Some(new String(cs, 0, i) + (cs(i) + 1).toChar)
  }

  /** A first-level struct leaf: the outer observe loop handles the
    * PARENT null (same slot index); this handles the leaf null and
    * delegates values to the wrapped scalar tracker over the struct row.
    */
  private final class StructLeafTracker(name: String, child: Int,
      width: Int, inner: Tracker) extends Tracker(name) {
    def observe(row: InternalRow, i: Int): Unit = {
      val s = row.getStruct(i, width)
      if (s.isNullAt(child)) nulls += 1 else inner.observe(s, child)
    }
    def minStr: Option[String] = inner.minStr
    def maxStr: Option[String] = inner.maxStr
    override def valuesStr: Option[Seq[String]] = inner.valuesStr
  }

  /** Streams every written row once; `result` snapshots the per-column
    * stats for the fragment being rolled. One virtual call + compare per
    * eligible column per row — noise next to parquet encoding.
    */
  final class Collector(schema: StructType) {
    private var trackers: Array[(Int, Tracker)] = mk()

    private def mkTracker(name: String, dt: DataType): Tracker = dt match {
      case ByteType => new LongTracker(name, (r, j) => r.getByte(j).toLong)
      case ShortType => new LongTracker(name, (r, j) => r.getShort(j).toLong)
      case IntegerType | DateType => new LongTracker(name, (r, j) => r.getInt(j).toLong)
      case LongType | TimestampType | TimestampNTZType =>
        new LongTracker(name, (r, j) => r.getLong(j))
      case BooleanType => new LongTracker(name, (r, j) => if (r.getBoolean(j)) 1L else 0L)
      case FloatType => new DoubleTracker(name, (r, j) => r.getFloat(j).toDouble)
      case DoubleType => new DoubleTracker(name, (r, j) => r.getDouble(j))
      case d: DecimalType => new DecimalTracker(name, d.precision, d.scale)
      case StringType => new StringTracker(name)
      case other => throw new IllegalStateException(s"not stats-eligible: $other")
    }

    private def mk(): Array[(Int, Tracker)] =
      schema.fields.zipWithIndex.flatMap { case (f, i) =>
        f.dataType match {
          case dt if eligible(dt) => Seq((i, mkTracker(f.name, dt)))
          case st: StructType =>
            // first-level struct leaves, keyed `parent.child` — the
            // outer loop's parent-null check rides the same slot, so a
            // NULL struct counts every leaf null (matching Spark's
            // `s.x IS NULL` semantics); deeper levels stay untracked.
            // A leaf colliding with a literal-dot top-level name is
            // skipped (statColumns' ownership rule).
            val topNames = schema.fieldNames.toSet
            st.fields.zipWithIndex.collect {
              case (c, j) if eligible(c.dataType) &&
                  !topNames.contains(s"${f.name}.${c.name}") =>
                (i, new StructLeafTracker(s"${f.name}.${c.name}", j,
                  st.size, mkTracker(s"${f.name}.${c.name}", c.dataType)))
            }.toSeq
          case _ => Seq.empty
        }
      }

    def observe(row: InternalRow): Unit = {
      var j = 0
      while (j < trackers.length) {
        val (i, t) = trackers(j)
        if (row.isNullAt(i)) t.nulls += 1 else t.observe(row, i)
        j += 1
      }
    }

    def reset(): Unit = trackers = mk()

    def result(): Option[Map[String, ColStats]] =
      if (trackers.isEmpty) None
      else Some(trackers.map { case (_, t) => t.name -> t.result }.toMap)
  }

  // ----------------------------------------------------------------- read

  /** Table-level rollup of the per-fragment stats — the zero-I/O answer
    * behind `lance_stats(path)` (ANALYZE/DESCRIBE-STATISTICS parity from
    * manifests alone). Per stats-eligible column:
    *
    *   - `min`/`max`: typed fold over fragment bounds, rendered in the
    *     stored canonical encoding. None when any fragment with non-null
    *     rows can't bound the column (no stats written, NaN observed) —
    *     an unknowable bound must stay unknown, never guessed.
    *   - `nullCount`: exact sum. A fragment written BEFORE the column
    *     existed (schema evolution) reads as all-null, so it contributes
    *     its rowCount — still exact. None only when a fragment carries
    *     no stats at all.
    *
    * Returns (column, min, max, nullCount, nFragmentsWithBounds).
    */
  def aggregate(schema: StructType, fragments: Seq[FragmentMeta])
      : Seq[(String, Option[String], Option[String], Option[Long], Int)] =
    statColumns(schema).map { case (colName, colType) =>
      val ord = ordering(colType)
      // per-fragment verdicts: Left(()) = unknowable; Right(None) = no
      // non-null rows (vacuous); Right(Some(bounds+nulls))
      val verdicts = fragments.map { f =>
        f.stats match {
          case None => Left(()) // stats-less fragment: everything unknown
          case Some(st) => st.get(colName) match {
            case None if colName.contains('.') =>
              // a NESTED leaf absent from a stats map is ambiguous: the
              // fragment may predate leaf tracking (values exist!) or
              // predate the struct column (all null) — unknowable, never
              // a claimed bound
              Left(())
            case None => // column younger than the fragment: all null
              Right(Some((None: Option[String], None: Option[String], f.rowCount)))
            case Some(cs) if cs.nullCount == f.rowCount =>
              Right(Some((None, None, cs.nullCount))) // all-null: no bounds needed
            case Some(cs) if cs.min.isDefined && cs.max.isDefined =>
              Right(Some((cs.min, cs.max, cs.nullCount)))
            case Some(_) => Left(()) // NaN-voided bounds with non-null rows
          }
        }
      }
      if (verdicts.exists(_.isLeft)) (colName, None, None, None, 0)
      else {
        val known = verdicts.collect { case Right(Some(v)) => v }
        val nulls = known.map(_._3).sum
        val bounded = known.filter(_._1.isDefined)
        def fold(takeMin: Boolean) = ord.flatMap { o =>
          bounded
            .flatMap { case (mn, mx, _) =>
              val s = if (takeMin) mn else mx
              s.flatMap(str => statValue(colType, str).map(v => (str, v)))
            }
            .reduceOption { (a, b) =>
              val c = o(a._2, b._2)
              if (if (takeMin) c <= 0 else c >= 0) a else b
            }.map(_._1)
        }
        (colName, fold(takeMin = true), fold(takeMin = false),
          Some(nulls), bounded.size)
      }
    }

  /** Keep only fragments whose stats admit at least one matching row.
    * Fragments without stats (pre-stats manifests, `write.stats=false`)
    * always survive. Logs what was skipped — silent pruning that is ever
    * wrong would be unfindable.
    */
  def prune(schema: StructType, fragments: Seq[FragmentMeta],
      filters: Array[Filter]): Seq[FragmentMeta] = {
    if (filters.isEmpty || fragments.forall(_.stats.isEmpty)) return fragments
    val kept = fragments.filter { f =>
      f.stats.forall(st => filters.forall(mayMatch(schema, f.rowCount, st, _)))
    }
    if (kept.size < fragments.size)
      log.info(s"manifest stats pruned ${fragments.size - kept.size} of " +
        s"${fragments.size} fragments for filters [${filters.mkString(", ")}]")
    kept
  }

  /** Conservative tri-state collapsed to two: false ONLY when no row of a
    * fragment with these stats can satisfy `filter`.
    */
  private[graft] def mayMatch(schema: StructType, rowCount: Long,
      stats: Map[String, ColStats], filter: Filter): Boolean = filter match {
    case And(l, r) => mayMatch(schema, rowCount, stats, l) &&
      mayMatch(schema, rowCount, stats, r)
    case Or(l, r) => mayMatch(schema, rowCount, stats, l) ||
      mayMatch(schema, rowCount, stats, r)
    case AlwaysTrue() => true
    case AlwaysFalse() => false

    case IsNull(a) => stats.get(a).forall(_.nullCount > 0)
    case IsNotNull(a) => stats.get(a).forall(_.nullCount < rowCount)

    case EqualTo(a, v) => boundsAdmit(schema, rowCount, stats, a,
      lo = Some((v, true)), hi = Some((v, true))) &&
      setAdmitsEq(schema, stats, a, v)
    case EqualNullSafe(a, null) => stats.get(a).forall(_.nullCount > 0)
    case EqualNullSafe(a, v) => boundsAdmit(schema, rowCount, stats, a,
      lo = Some((v, true)), hi = Some((v, true))) &&
      setAdmitsEq(schema, stats, a, v)
    case GreaterThan(a, v) => boundsAdmit(schema, rowCount, stats, a,
      lo = Some((v, false)), hi = None)
    case GreaterThanOrEqual(a, v) => boundsAdmit(schema, rowCount, stats, a,
      lo = Some((v, true)), hi = None)
    case LessThan(a, v) => boundsAdmit(schema, rowCount, stats, a,
      lo = None, hi = Some((v, false)))
    case LessThanOrEqual(a, v) => boundsAdmit(schema, rowCount, stats, a,
      lo = None, hi = Some((v, true)))
    case In(a, vs) =>
      vs.isEmpty || vs.exists(v => v == null || (boundsAdmit(schema, rowCount,
        stats, a, lo = Some((v, true)), hi = Some((v, true))) &&
        setAdmitsEq(schema, stats, a, v)))

    case StringStartsWith(a, p) =>
      // strings with prefix p live in [p, upperBound(p))
      boundsAdmit(schema, rowCount, stats, a, lo = Some((p, true)),
        hi = upperBound(p).map(ub => (ub: Any, false))) &&
      setAdmitsPrefix(schema, stats, a, p)

    // contains/endsWith have no range form, but a dictionary-ish column's
    // exact value set can still prove absence (`tag LIKE '%beta%'` against
    // a 5-value tag column) — the same grounds as setAdmitsPrefix
    case StringContains(a, sub) => setAdmitsString(schema, stats, a, _.contains(sub))
    case StringEndsWith(a, suf) => setAdmitsString(schema, stats, a, _.endsWith(suf))

    // Not(EqualTo) prunes the constant fragment: every row equal to v
    case Not(EqualTo(a, v)) =>
      !(for {
        cs <- stats.get(a)
        dt <- schema.fields.find(_.name == a).map(_.dataType)
        mn <- cs.min.flatMap(statValue(dt, _))
        mx <- cs.max.flatMap(statValue(dt, _))
        fv <- filterValue(dt, v)
        ord <- ordering(dt)
      } yield cs.nullCount == 0 && ord(mn, fv) == 0 && ord(mx, fv) == 0)
        .getOrElse(false)
    case _ => true // unknown shape: never prune
  }

  /** Dual of [[mayMatch]]: true ONLY when the stats PROVE every row of
    * the fragment satisfies `filter` — the predicate evaluates TRUE (not
    * NULL: any null in a compared column disproves, since NULL comparisons
    * aren't TRUE) for all rows. Conservative false on anything unprovable.
    *
    * This is the metadata-only fast path under fully-covered DELETEs: a
    * retention delete (`ts < cutoff`) on a clustered table drops interior
    * fragments from the manifest without reading them, and only boundary
    * fragments pay a rewrite. Soundness is property-tested the same way
    * as [[mayMatch]] (mustMatch=true ⇒ zero surviving rows).
    */
  private[graft] def mustMatch(schema: StructType, rowCount: Long,
      stats: Map[String, ColStats], filter: Filter): Boolean = filter match {
    case And(l, r) => mustMatch(schema, rowCount, stats, l) &&
      mustMatch(schema, rowCount, stats, r)
    case Or(l, r) => mustMatch(schema, rowCount, stats, l) ||
      mustMatch(schema, rowCount, stats, r)
    case AlwaysTrue() => true
    case AlwaysFalse() => false

    case IsNull(a) => stats.get(a).exists(_.nullCount == rowCount)
    case IsNotNull(a) => stats.get(a).exists(_.nullCount == 0)

    case EqualTo(a, v) => boundsContain(schema, stats, a,
      lo = Some((v, true)), hi = Some((v, true)))
    case EqualNullSafe(a, null) => stats.get(a).exists(_.nullCount == rowCount)
    case EqualNullSafe(a, v) => boundsContain(schema, stats, a,
      lo = Some((v, true)), hi = Some((v, true)))
    case GreaterThan(a, v) => boundsContain(schema, stats, a,
      lo = Some((v, false)), hi = None)
    case GreaterThanOrEqual(a, v) => boundsContain(schema, stats, a,
      lo = Some((v, true)), hi = None)
    case LessThan(a, v) => boundsContain(schema, stats, a,
      lo = None, hi = Some((v, false)))
    case LessThanOrEqual(a, v) => boundsContain(schema, stats, a,
      lo = None, hi = Some((v, true)))
    case In(a, vs) => // single-valued bounds, or full value-set coverage
      (vs.nonEmpty && vs.exists(v => v != null && boundsContain(schema, stats, a,
        lo = Some((v, true)), hi = Some((v, true))))) ||
      setCoveredByIn(schema, stats, a, vs)

    case _ => false // Not, LIKE, unknown shapes: never claim full coverage
  }

  /** Is [statMin, statMax] entirely inside the interval `lo..hi` with no
    * nulls? Any parse/compare failure answers false (never claim).
    */
  private def boundsContain(schema: StructType,
      stats: Map[String, ColStats], attr: String,
      lo: Option[(Any, Boolean)], hi: Option[(Any, Boolean)]): Boolean =
    (for {
      cs <- stats.get(attr)
      dt <- leafType(schema, attr)
      ord <- ordering(dt)
      mn <- cs.min.flatMap(statValue(dt, _))
      mx <- cs.max.flatMap(statValue(dt, _))
    } yield cs.nullCount == 0 &&
      lo.forall { case (v, incl) => filterValue(dt, v).exists(fv =>
        if (incl) ord(mn, fv) >= 0 else ord(mn, fv) > 0) } &&
      hi.forall { case (v, incl) => filterValue(dt, v).exists(fv =>
        if (incl) ord(mx, fv) <= 0 else ord(mx, fv) < 0) }
    ).getOrElse(false)

  /** Can any non-null value in [statMin, statMax] fall inside the filter
    * interval `lo..hi` (each bound optional, Boolean = inclusive)? Any
    * failure to parse or compare keeps the fragment.
    */
  private def boundsAdmit(schema: StructType, rowCount: Long,
      stats: Map[String, ColStats], attr: String,
      lo: Option[(Any, Boolean)], hi: Option[(Any, Boolean)]): Boolean = {
    val verdict = for {
      cs <- stats.get(attr)
      dt <- leafType(schema, attr)
    } yield {
      if (cs.nullCount == rowCount) false // all null: no value comparison matches
      else {
        val ord = ordering(dt)
        def aboveLo = lo.forall { case (v, incl) =>
          (for { mx <- cs.max.flatMap(statValue(dt, _)); fv <- filterValue(dt, v); o <- ord }
            yield if (incl) o(mx, fv) >= 0 else o(mx, fv) > 0).getOrElse(true)
        }
        def belowHi = hi.forall { case (v, incl) =>
          (for { mn <- cs.min.flatMap(statValue(dt, _)); fv <- filterValue(dt, v); o <- ord }
            yield if (incl) o(mn, fv) <= 0 else o(mn, fv) < 0).getOrElse(true)
        }
        aboveLo && belowHi
      }
    }
    verdict.getOrElse(true)
  }

  /** Decoded exact value set, all-or-nothing: one unparsable member voids
    * the whole set, because an incomplete set could prove a false absence.
    */
  private def valueSet(dt: DataType, cs: ColStats): Option[Seq[Any]] =
    cs.values.flatMap { vs =>
      val decoded = vs.map(statValue(dt, _))
      if (decoded.forall(_.isDefined)) Some(decoded.map(_.get)) else None
    }

  /** True unless the fragment's exact value set PROVES `v` absent — the
    * point-lookup prune range bounds cannot make on low-cardinality
    * columns. No set, undecodable set, or unnormalizable literal: admit.
    */
  private def setAdmitsEq(schema: StructType, stats: Map[String, ColStats],
      attr: String, v: Any): Boolean =
    (for {
      cs <- stats.get(attr)
      dt <- leafType(schema, attr)
      set <- valueSet(dt, cs)
      fv <- filterValue(dt, v)
      ord <- ordering(dt)
    } yield set.exists(x => ord(x, fv) == 0)).getOrElse(true)

  /** True unless a string column's exact value set proves no member has
    * prefix `p` (StartsWith is only pushed for strings; the stored set
    * members are raw untruncated values by construction).
    */
  private def setAdmitsPrefix(schema: StructType, stats: Map[String, ColStats],
      attr: String, p: String): Boolean =
    setAdmitsString(schema, stats, attr, _.startsWith(p))

  /** True unless a string column's exact value set proves NO member
    * satisfies `pred` (string-match filters are only pushed for strings;
    * stored set members are raw untruncated values by construction). */
  private def setAdmitsString(schema: StructType, stats: Map[String, ColStats],
      attr: String, pred: String => Boolean): Boolean =
    !leafType(schema, attr).contains(StringType) ||
      stats.get(attr).flatMap(_.values).forall(_.exists(pred))

  /** mustMatch arm: the value set PROVES In-coverage — no nulls and every
    * distinct value equal to some non-null literal of `vs`.
    */
  private def setCoveredByIn(schema: StructType, stats: Map[String, ColStats],
      attr: String, vs: Array[Any]): Boolean =
    (for {
      cs <- stats.get(attr)
      dt <- leafType(schema, attr)
      set <- valueSet(dt, cs)
      ord <- ordering(dt)
    } yield cs.nullCount == 0 && set.nonEmpty && set.forall(x =>
      vs.exists(v => v != null && filterValue(dt, v).exists(fv =>
        ord(x, fv) == 0)))).getOrElse(false)

  /** Decode a stored stat string into the column's comparison domain. */
  private def statValue(dt: DataType, s: String): Option[Any] =
    try dt match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
           TimestampType | TimestampNTZType | BooleanType => Some(s.toLong)
      case FloatType | DoubleType => Some(java.lang.Double.parseDouble(s))
      case _: DecimalType => Some(new java.math.BigDecimal(s))
      case StringType => Some(UTF8String.fromString(s))
      case _ => None
    } catch { case _: NumberFormatException => None }

  /** Normalize a pushed-filter literal into the same domain. Spark casts
    * literals to the column type before pushdown, so the runtime classes
    * here are the documented external types of that column.
    */
  private def filterValue(dt: DataType, v: Any): Option[Any] =
    try dt match {
      case ByteType | ShortType | IntegerType | LongType => v match {
        case n: java.lang.Number => Some(n.longValue())
        case _ => None
      }
      case BooleanType => v match {
        case b: java.lang.Boolean => Some(if (b) 1L else 0L)
        case _ => None
      }
      case DateType => v match {
        case d: java.sql.Date => Some(DateTimeUtils.fromJavaDate(d).toLong)
        case d: java.time.LocalDate => Some(DateTimeUtils.localDateToDays(d).toLong)
        case _ => None
      }
      case TimestampType => v match {
        case t: java.sql.Timestamp => Some(DateTimeUtils.fromJavaTimestamp(t))
        case t: java.time.Instant => Some(DateTimeUtils.instantToMicros(t))
        case _ => None
      }
      case TimestampNTZType => v match {
        case t: java.time.LocalDateTime => Some(DateTimeUtils.localDateTimeToMicros(t))
        case _ => None
      }
      case FloatType | DoubleType => v match {
        case n: java.lang.Number => Some(n.doubleValue())
        case _ => None
      }
      case _: DecimalType => v match {
        case d: java.math.BigDecimal => Some(d)
        case d: scala.math.BigDecimal => Some(d.bigDecimal)
        case n: java.lang.Number => Some(new java.math.BigDecimal(n.toString))
        case _ => None
      }
      case StringType => v match {
        case s: String => Some(UTF8String.fromString(s))
        case u: UTF8String => Some(u)
        case _ => None
      }
      case _ => None
    } catch { case _: Exception => None }

  private def ordering(dt: DataType): Option[(Any, Any) => Int] = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | BooleanType =>
      Some((a, b) => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long]))
    case FloatType | DoubleType =>
      Some((a, b) => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double]))
    case _: DecimalType =>
      Some((a, b) => a.asInstanceOf[java.math.BigDecimal]
        .compareTo(b.asInstanceOf[java.math.BigDecimal]))
    case StringType =>
      Some((a, b) => a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String]))
    case _ => None
  }
}
