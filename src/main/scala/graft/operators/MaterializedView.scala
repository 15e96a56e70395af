package graft.operators

import graft.format.LanceFormat
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** INCREMENTAL MATERIALIZED VIEWS over lance tables, maintained from the
  * row-level change feed — the downstream half of the CDF story
  * ([[Dml]] stages exact pre/post images; this consumes them).
  *
  * A view is an ordinary lance table holding one row per group of
  * `GROUP BY g1..gk` with aggregate columns, plus hidden state:
  *
  *  - `_mv_gid`  — sha2(to_json(struct(g1..gk))) group surrogate: ONE
  *    non-null key column however many (and however nullable) the group
  *    columns are, so refresh DML routes/prunes on a single key and the
  *    view can be hash-bucketed on it for storage-partitioned refreshes.
  *  - `_mv_n`    — live row count per group (group dies when it hits 0).
  *  - `_mv_s_<alias>` / `_mv_c_<alias>` — decimal sum / non-null count
  *    state behind sum and avg columns. Decimal, never double: delta
  *    application must be EXACTLY associative or an incremental refresh
  *    would drift from a full recompute (the [[graft.Tables.dsum]]
  *    convention, applied to view maintenance).
  *
  * Refresh reads `lance_changes(source, lastVersion, head)` and picks
  * the cheapest sound strategy:
  *
  *  - **delta** (no min/max in the view): signed per-group arithmetic
  *    over the feed — +1 for insert/update_postimage, −1 for
  *    delete/update_preimage — merged into the stored state. Cost ∝ the
  *    CHANGE, never the source: a 100 TB source with a 1000-row
  *    correction refreshes in 1000-row time.
  *  - **groups** (min/max present AND the window REMOVED rows): a
  *    deleted row may have BEEN the min/max, so affected groups
  *    recompute from the current source — scoped by a semi-join on the
  *    group surrogate (fragment pruning on clustered/bucketed group
  *    columns bounds the rescan); untouched groups never rewrite. A
  *    removal-free window (append-only ingest — the common case) keeps
  *    min/max on the delta path: extrema only grow, least/greatest
  *    against the stored value, no rescan ever.
  *
  * Either way the new state lands through [[Dml.applyChanges]] as ONE
  * commit carrying the advanced `graft.mv.version` watermark
  * (`write.set-properties`) — refresh is exactly-once by construction:
  * a crash either publishes nothing or publishes state+watermark
  * together, so a re-run can never double-apply a delta.
  *
  * The reference has no view maintenance at all; Delta's materialized
  * views (and Materialize/Flink's retractions) are the public prior art
  * this re-expresses on Spark + the lance manifest.
  */
object MaterializedView {

  /** One aggregate column: `func` ∈ count|sum|min|max|avg|count_distinct.
    * `column` is a source column name OR any deterministic scalar SQL
    * expression over source columns (`price * (1 - discount)` — TPC-H
    * Q1's shape); "*" only with count. `scale`: decimal scale for
    * sum/avg state over floating inputs (the dsum convention; decimal
    * inputs keep their own scale, integrals ignore it).
    * `count_distinct` is APPROXIMATE (Datasketches HLL, lgConfigK=12 —
    * ~1.6% relative standard error): per-group sketch state is
    * union-able, so insert-only windows delta-merge; a removal can't
    * un-merge, so removing windows take the scoped-group rescan (the
    * min/max posture). */
  /** One group key: `alias` is the view's column name, `expr` the scalar
    * SQL that computes it from the (enriched) source row. Plain column
    * keys have `expr == alias` (the original surface); expression keys
    * (`date_format(o_orderdate, 'yyyy-MM') AS omonth` — the time-rollup
    * norm) evaluate per row, so the change-feed delta arithmetic is
    * unchanged: a feed image keys exactly like the original row did. */
  case class GroupKey(expr: String, alias: String) {
    def isPlain: Boolean = expr == alias
    // a PLAIN key only references an existing column, so any name the
    // view state doesn't reserve (_mv_) is fine — including
    // underscore-leading source columns of pre-expression-key views,
    // which must keep decoding. An EXPRESSION key MINTS a new column:
    // the whole '_' namespace is reserved there (feed metadata like
    // _change_type lives in it).
    require(alias.nonEmpty && !alias.startsWith("_mv_"),
      s"group alias '$alias' empty or in the reserved _mv_ namespace")
    require(isPlain || !alias.startsWith("_"),
      s"expression-key alias '$alias' may not start with '_' (reserved)")
    // alias rides the comma-joined group-by property; expression-key
    // aliases ALSO ride the ':'-split group-exprs property, so ':' is
    // refused only for them — a plain column key never rides it, and a
    // pre-existing plain-column view whose group column contains ':'
    // must keep decoding (refusing here would brick it on every
    // refresh/spec read until recreate)
    require(!alias.contains(',') && !alias.contains('\n'),
      s"group alias '$alias' may not contain ',' or newline")
    require(isPlain || !alias.contains(':'),
      s"expression-key alias '$alias' may not contain ':'")
    require(!expr.contains('\n'), s"group expr '$expr' may not contain newline")
  }

  /** Parse one group-key entry: a plain column name, or `<expr> AS
    * <alias>` with the AS matched at TOP level only — quote- and
    * paren-aware, so `cast(x AS int) AS day` keeps its inner AS. */
  private[graft] def parseGroupKey(s: String): GroupKey = {
    val t = s.trim
    var depth = 0; var quote: Char = 0; var asAt = -1; var i = 0
    while (i < t.length) {
      val ch = t(i)
      if (quote != 0) { if (ch == quote) quote = 0 }
      else ch match {
        case '\'' | '"' | '`' => quote = ch
        case '(' => depth += 1
        case ')' => depth -= 1
        case 'a' | 'A' if depth == 0 && i > 0 && t(i - 1).isWhitespace &&
            i + 2 < t.length && (t(i + 1) == 's' || t(i + 1) == 'S') &&
            t(i + 2).isWhitespace =>
          asAt = i // LAST top-level AS wins (left side may nest CASE..AS)
        case _ => ()
      }
      i += 1
    }
    if (asAt < 0) GroupKey(t, t)
    else GroupKey(t.substring(0, asAt).trim, t.substring(asAt + 2).trim)
  }

  /** Materialize every expression key as its alias column; plain keys
    * already ARE columns. Applied to the (enriched, filtered) source and
    * to each feed image identically, so gid/state agree across paths. */
  private def withKeys(df: DataFrame, keys: Seq[GroupKey]): DataFrame =
    keys.filterNot(_.isPlain).foldLeft(df)((d, k) =>
      d.withColumn(k.alias, expr(k.expr)))

  case class AggSpec(func: String, column: String, alias: String, scale: Int = 2) {
    require(Set("count", "sum", "min", "max", "avg", "count_distinct")
      .contains(func),
      s"unsupported aggregate '$func' (count|sum|min|max|avg|count_distinct)")
    require(column != "*" || func == "count", "'*' only with count")
    require(alias.nonEmpty && !alias.startsWith("_mv_"),
      s"alias '$alias' empty or in the reserved _mv_ namespace")
    // the spec round-trips through a ':'/'\n'-delimited property string
    // (encodeAggs): a delimiter inside alias/column would decode into a
    // DIFFERENT spec and leave the view permanently unmaintainable
    require(!alias.contains(':') && !alias.contains('\n'),
      s"alias '$alias' may not contain ':' or newline")
    require(!column.contains('\n'), s"column '$column' may not contain newline")
  }

  /** A STAR-VIEW dimension: LEFT-joined onto the source by `keys`
    * (source column → dim column) at a version PINNED at create — the
    * enrichment is then a pure function of each source row, so the
    * delta arithmetic over the change feed is UNCHANGED (a feed image
    * enriches exactly like the original row did). Group columns, WHERE
    * and aggregate expressions may all name dim columns. The pinned dim
    * version is TAGGED (`mv-pin-<id>`), so a dim-side vacuum can never
    * reclaim it; [[fullRefresh]] re-pins to the dim's current version
    * (the rebuilt state and the new pin land together). Dim UPDATES do
    * not propagate incrementally by design — that would make every dim
    * write fan out into unbounded view rewrites; the nightly
    * fullRefresh (or recreate) is the documented freshness knob, the
    * posture dashboard star schemas actually run. */
  case class DimSpec(path: String, keys: Map[String, String]) {
    require(keys.nonEmpty, "a dimension needs at least one join key")
    require(!path.contains('|') && !path.contains('\n'),
      s"dim path '$path' may not contain '|' or newline (property encoding)")
    keys.foreach { case (s, k) =>
      Seq(s, k).foreach(c => require(
        !c.contains(',') && !c.contains('=') && !c.contains('\n') && !c.contains('|'),
        s"dim key column '$c' may not contain ',', '=', '|' or newline"))
    }
  }

  /** A JOIN-VIEW fact table: INNER-joined onto the source by `keys`
    * (source column → join column), with BOTH sides change-fed — the
    * fact⋈fact shape (`orders ⋈ lineitem`) a pinned star dim cannot
    * express. Refresh telescopes the classical IVM identity
    *
    *   Δ(A⋈B) = ΔA ⋈ B@new  ∪  A@old ⋈ ΔB
    *
    * (signed multiset algebra; each term's images carry their own
    * change-type, so the downstream delta arithmetic is the ordinary
    * one — and the version mapping generalizes to N joins, earlier
    * factors @old and later @new around each Δ, which also covers
    * SNOWFLAKE CHAINS: a join may key on an EARLIER join's attributes,
    * `orders ⋈ lineitem ⋈ part` with part keyed on l_partkey; declare
    * chains in dependency order). The view registers on EVERY joined
    * table: a write to any side can maintain it, and each side's
    * retention vacuum pins back to the view's per-table watermark.
    * Joined-side key columns drop after the join.
    *
    * Cost: each term IN-list-prunes the factors that OWN the Δ's key
    * columns (the source scan for source-owned keys, the owning earlier
    * join's frame for chain keys) to the keys the change touches, so
    * single-join refresh is change-bounded (measured flat across a 10×
    * scale-up — `DevMvJoinScale`). Factors that own none of the Δ's
    * keys join unpruned (their matching keys are only known at run
    * time); co-bucket those tables on the join keys to keep them
    * exchange-free, or split a wide view into single-join views over a
    * shared source. */
  case class JoinSpec(path: String, keys: Map[String, String],
      joinType: String = "inner") {
    require(keys.nonEmpty, "a join table needs at least one key")
    require(!path.contains('|') && !path.contains('\n'),
      s"join path '$path' may not contain '|' or newline (property encoding)")
    require(Set("inner", "left", "full", "right").contains(joinType),
      s"join type '$joinType' unsupported - inner, left, right and full are")
    /** FULL/RIGHT factors carry a join-side-only ("anti") part: rows of
      * the join table matching NO source row surface with the prefix
      * null-extended and the key value carried in the SOURCE key column
      * (coalesce(s, k) — the merged-key shape a coverage dashboard
      * groups by). Their IVM adds the mirrored flip terms; see refresh. */
    def hasAntiSide: Boolean = joinType == "full" || joinType == "right"
    keys.foreach { case (s, k) =>
      Seq(s, k).foreach(c => require(
        !c.contains(',') && !c.contains('=') && !c.contains('\n') && !c.contains('|'),
        s"join key column '$c' may not contain ',', '=', '|' or newline"))
    }
  }

  case class RefreshResult(mode: String, fromVersion: Long, toVersion: Long,
    groupsChanged: Long)

  private val GidCol = "_mv_gid"
  private val NCol = "_mv_n"
  private def sCol(a: String) = s"_mv_s_$a"
  private def cCol(a: String) = s"_mv_c_$a"
  /** HLL sketch state (binary) behind a count_distinct column. */
  private def hCol(a: String) = s"_mv_h_$a"
  /** Datasketches HLL lgConfigK: 2^12 registers, ~1.6% RSE — the
    * [[graft.format.TableStats]] ANALYZE precision, reused. */
  private val HllLgK = 12

  private val PropSource = "graft.mv.source"
  private val PropGroupBy = "graft.mv.group-by"
  /** Expression group keys only: newline-joined `alias:expr` lines
    * (alias guards ':'; expr may contain any). Plain-column views omit
    * the property entirely — their manifests are byte-identical to the
    * pre-expression format. */
  private val PropGroupExprs = "graft.mv.group-exprs"
  private val PropAggs = "graft.mv.aggs"
  private val PropVersion = "graft.mv.version"
  private val PropWhere = "graft.mv.where"
  /** Read-time HAVING over the view's OUTPUT columns (group aliases +
    * aggregate aliases). The stored state is UNFILTERED — refresh delta
    * math never sees this predicate; [[read]] applies it. */
  private val PropHaving = "graft.mv.having"
  /** Pinned star dims: one `<version>|<abs path>|s=k,s2=k2` line each. */
  private val PropDims = "graft.mv.dims"
  /** Change-fed join tables, same line shape as dims — but the version
    * is a WATERMARK (advanced by every refresh), not a pin. */
  private val PropJoins = "graft.mv.joins"
  /** Per-join join TYPES, comma-joined, aligned with the PropJoins
    * lines. All-inner views omit the property entirely, so their
    * manifests stay byte-identical to the pre-LEFT format (and old
    * readers of the joins lines — the ALTER guard's key split, the
    * roleAndWatermark path lift — never see a fourth `|` field). */
  private val PropJoinTypes = "graft.mv.join-types"
  /** On a DIM table: view paths whose specs reference its columns — read
    * ONLY by the ALTER RENAME/DROP guard (a dim is not a feed source:
    * no refresh fan-out, no retention watermark; the pin is a tag). */
  private[graft] val PropDimDependents = "graft.mv.dim-dependents"
  /** On the SOURCE table: newline-joined absolute view paths registered
    * for [[refreshDependents]] (in-commit maintenance via the
    * `write.refresh-mvs` option — the refresh-indexes posture applied
    * to derived tables). */
  private[graft] val PropDependents = "graft.mv.dependents"

  private def q(name: String): Column = col(s"`$name`")

  private def fsRoot(spark: SparkSession, path: String) = {
    val root = new Path(new java.io.File(path).getAbsolutePath)
    (LanceFormat.fileSystem(root, spark.sessionState.newHadoopConf()), root)
  }

  /** Group surrogate over possibly-NULL, possibly-many group columns:
    * to_json is deterministic and type-tagged, sha2 collisions are
    * negligible (2^-128 birthday at 2^64 groups). */
  private def gid(groupBy: Seq[String]): Column =
    sha2(to_json(struct(groupBy.map(q): _*)), 256)

  /** How a sum/avg argument's exact state is kept. Decimal inputs keep a
    * widened decimal at THEIR OWN scale (a long cast would silently
    * truncate DECIMAL(12,2) prices); floats round into decimal at the
    * spec's scale (dsum convention); integrals sum as long. */
  private sealed trait NumKind
  private case object FloatKind extends NumKind
  private case class DecKind(scale: Int) extends NumKind
  private case object LongKind extends NumKind

  private def numKind(dt: DataType, arg: String): NumKind = dt match {
    case DoubleType | FloatType => FloatKind
    case d: DecimalType => DecKind(d.scale)
    case ByteType | ShortType | IntegerType | LongType => LongKind
    case other => throw new IllegalArgumentException(
      s"sum/avg argument '$arg' is ${other.simpleString}: not numeric")
  }

  /** The aggregate argument as a Column: a plain source field routes
    * through backticks (names with dots/spaces stay literal); anything
    * else parses as a SQL expression over source columns. */
  private def argCol(schema: StructType, c: String): Column =
    if (schema.fieldNames.contains(c)) q(c) else expr(c)

  /** Resolved type of each sum/avg argument against a source-shaped
    * frame (analysis only — no job runs). */
  private def argTypes(df: DataFrame, aggs: Seq[AggSpec]): Map[String, DataType] =
    aggs.filter(a => a.func == "sum" || a.func == "avg").map { a =>
      a.alias -> df.select(argCol(df.schema, a.column).as("__t"))
        .schema.head.dataType
    }.toMap

  private def encodeDims(dims: Seq[(DimSpec, Long)]): String =
    dims.map { case (d, v) =>
      val abs = new java.io.File(d.path).getAbsolutePath
      s"$v|$abs|${d.keys.toSeq.sorted.map { case (s, k) => s"$s=$k" }.mkString(",")}"
    }.mkString("\n")
  private def decodeDims(s: String): Seq[(DimSpec, Long)] =
    s.split('\n').toSeq.filter(_.nonEmpty).map { line =>
      val Array(v, p, ks) = line.split("\\|", 3)
      (DimSpec(p, ks.split(',').map { kv =>
        val Array(a, b) = kv.split("=", 2); a -> b
      }.toMap), v.toLong)
    }

  private def encodeJoins(joins: Seq[(JoinSpec, Long)]): String =
    joins.map { case (j, v) =>
      val abs = new java.io.File(j.path).getAbsolutePath
      s"$v|$abs|${j.keys.toSeq.sorted.map { case (s, k) => s"$s=$k" }.mkString(",")}"
    }.mkString("\n")
  /** PropJoins + (only when a non-inner join exists) PropJoinTypes. */
  private def encodeJoinProps(joins: Seq[(JoinSpec, Long)]): Map[String, String] =
    Map(PropJoins -> encodeJoins(joins)) ++
      (if (joins.forall(_._1.joinType == "inner")) Map.empty
       else Map(PropJoinTypes -> joins.map(_._1.joinType).mkString(",")))
  private def decodeJoins(props: Map[String, String]): Seq[(JoinSpec, Long)] = {
    val types = props.get(PropJoinTypes).map(_.split(',').toSeq)
      .getOrElse(Seq.empty)
    props.get(PropJoins).toSeq.flatMap(_.split('\n')).filter(_.nonEmpty)
      .zipWithIndex.map { case (line, i) =>
        val Array(v, p, ks) = line.split("\\|", 3)
        (JoinSpec(p, ks.split(',').map { kv =>
          val Array(a, b) = kv.split("=", 2); a -> b
        }.toMap, types.lift(i).getOrElse("inner")), v.toLong)
      }
  }

  /** Join every fact table onto `rows` at the given versions, each with
    * its declared join type (inner/left/right/full). `images`: when set,
    * that one join's factor is the change-feed IMAGES frame instead of
    * the table — the telescoping terms of the IVM identity ride this.
    * `howOverride`: factor paths joined with the GIVEN type regardless
    * of their declared one — the Δ-image term of a LEFT factor joins
    * inner (unmatched left rows contribute nothing to that term; the
    * zero-crossing null extension rides the separate flip terms), the
    * ΔA term of a FULL factor joins left / of a RIGHT factor inner (the
    * join-side anti part rides the mirrored terms). Joined-side key
    * columns drop; for FULL/RIGHT factors the SOURCE key column becomes
    * coalesce(s, k) first, so join-side-only rows carry their key in
    * the source column (the merged-key shape) however the view groups. */
  private def applyJoins(spark: SparkSession, rows: DataFrame,
      joins: Seq[(JoinSpec, Long)],
      images: Map[String, DataFrame] = Map.empty,
      howOverride: Map[String, String] = Map.empty): DataFrame =
    joins.foldLeft(rows) { case (df, (j, v)) =>
      val abs = new java.io.File(j.path).getAbsolutePath
      val right = images.getOrElse(abs,
        spark.read.format("lance")
          .option("versionAsOf", v.toString).load(j.path))
      val cond = j.keys.map { case (s, k) => df(s) === right(k) }.reduce(_ && _)
      val how = howOverride.getOrElse(abs, j.joinType)
      val joined = df.join(right, cond, how)
      if (!j.hasAntiSide)
        j.keys.values.foldLeft(joined) { (o, k) => o.drop(right(k)) }
      else {
        // merged-key projection by ATTRIBUTE, not by name: the source
        // key column becomes coalesce(s, k) — matched and left-only rows
        // keep df(s) (right(k) is equal or null), anti rows get the key
        // — and the join-side key columns drop by attribute-set
        // selection, so a same-NAME key pair (okey = okey) resolves
        // unambiguously instead of a withColumn replacing both copies
        val leftCols = df.columns.toSeq.map { c =>
          j.keys.get(c).map(k => coalesce(df(c), right(k)).as(c))
            .getOrElse(df(c))
        }
        val dropK = j.keys.values.toSet
        val rightCols = right.columns.toSeq.filterNot(dropK)
          .map(c => right(c))
        joined.select(leftCols ++ rightCols: _*)
      }
    }

  /** How a VIEW's stored spec relates to the table at `tableAbs` — THE
    * shared parse for the retention pin, the `lance_dependents` TVF and
    * fsck (divergent hand-rolled copies of the `version|path|keys` line
    * split already produced one unguarded-index bug):
    *  - `("join", Some(wm))` — a `graft.mv.joins` line names the table;
    *    wm is that side's own watermark
    *  - `("source", Some(wm))` — the table IS the spec's source; wm is
    *    `graft.mv.version`
    *  - `("dim", None)` — a `graft.mv.dims` line names the table (the
    *    pin is a TAG, not a watermark)
    *  - None — the spec does not reference the table at all (a view
    *    recreated under the same registered path against elsewhere)
    * Malformed lines and numbers are skipped, never thrown. */
  private[graft] def roleAndWatermark(props: Map[String, String],
      tableAbs: String): Option[(String, Option[Long])] = {
    def abs(p: String) = new java.io.File(p).getAbsolutePath
    def lines(key: String) =
      props.get(key).toSeq.flatMap(_.split('\n')).filter(_.nonEmpty)
    val asJoin = lines(PropJoins).collectFirst {
      case line if line.split("\\|", 3).lift(1).contains(tableAbs) =>
        scala.util.Try(line.split("\\|", 3)(0).toLong).toOption
    }
    if (asJoin.isDefined) Some(("join", asJoin.get))
    else if (props.get(PropSource).exists(abs(_) == tableAbs))
      Some(("source",
        props.get(PropVersion).flatMap(v => scala.util.Try(v.toLong).toOption)))
    else if (lines(PropDims).exists(
      _.split("\\|", 3).lift(1).exists(p => abs(p) == tableAbs)))
      Some(("dim", None))
    else None
  }

  /** The view's pin tag on a dim table — derived from the view path so
    * several views can pin the same dim independently. */
  private def dimPinTag(viewAbs: String): String =
    "mv-pin-" + java.security.MessageDigest.getInstance("SHA-256")
      .digest(viewAbs.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString

  /** Broadcast-size guard for star dims: the enrichment join FORCES a
    * broadcast (that is what keeps delta refresh shuffle-light), so a
    * dim that outgrew driver/executor memory must refuse loud at
    * create/re-pin time, not OOM mid-refresh. Row count comes from the
    * manifest — zero I/O. */
  private def requireBroadcastable(spark: SparkSession, d: DimSpec,
      m: graft.format.Manifest): Unit = {
    val cap = spark.conf.getOption("spark.graft.mv.maxDimRows")
      .map(_.toLong).getOrElse(10000000L)
    require(m.rowCount <= cap,
      s"star dim ${d.path} holds ${m.rowCount} rows (> $cap): the " +
        "enrichment broadcasts the dim - raise spark.graft.mv.maxDimRows " +
        "only if it truly fits in memory, or aggregate the dim first")
  }

  /** LEFT-join every pinned dim onto `rows` (broadcast — a star dim is
    * the small side by definition). Dim-side join-key columns drop after
    * the join (the source key carries the value); attribute collisions
    * were refused at create. */
  private def enrich(spark: SparkSession, rows: DataFrame,
      dims: Seq[(DimSpec, Long)]): DataFrame =
    dims.foldLeft(rows) { case (df, (d, v)) =>
      val dim = spark.read.format("lance")
        .option("versionAsOf", v.toString).load(d.path)
      // Dataset.apply resolves names LITERALLY (resolveQuoted): no
      // backticks — dots and odd characters are taken as-is
      val cond = d.keys.map { case (s, k) => df(s) === dim(k) }.reduce(_ && _)
      d.keys.values.foldLeft(df.join(broadcast(dim), cond, "left")) {
        (j, k) => j.drop(dim(k))
      }
    }

  /** Group keys as properties: PropGroupBy carries the comma-joined
    * ALIASES (the view's group columns — unchanged from the plain-column
    * format); PropGroupExprs adds `alias:expr` lines for expression keys
    * only. */
  private def encodeGroupKeys(keys: Seq[GroupKey]): Map[String, String] =
    Map(PropGroupBy -> keys.map(_.alias).mkString(",")) ++
      (if (keys.forall(_.isPlain)) Map.empty
       else Map(PropGroupExprs -> keys.filterNot(_.isPlain)
         .map(k => s"${k.alias}:${k.expr}").mkString("\n")))
  private def decodeGroupKeys(props: Map[String, String]): Seq[GroupKey] = {
    val exprs = props.get(PropGroupExprs).toSeq.flatMap(_.split('\n'))
      .filter(_.nonEmpty).map { line =>
        val Array(a, e) = line.split(":", 2); a -> e
      }.toMap
    props(PropGroupBy).split(',').toSeq
      .map(a => GroupKey(exprs.getOrElse(a, a), a))
  }

  /** Encode/decode the agg list as a property string.
    * `func:scale:alias:column` — column LAST and unsplit since it may
    * contain ':' never do alias/func. */
  private def encodeAggs(aggs: Seq[AggSpec]): String =
    aggs.map(a => s"${a.func}:${a.scale}:${a.alias}:${a.column}").mkString("\n")
  private def decodeAggs(s: String): Seq[AggSpec] =
    s.split('\n').toSeq.filter(_.nonEmpty).map { line =>
      val Array(f, sc, al, c) = line.split(":", 4)
      AggSpec(f, c, al, sc.toInt)
    }

  /** The full-state aggregation of `rows` (source-shaped) into view rows
    * — used by create, full refresh, and the scoped group recompute, so
    * every path derives state identically. */
  private def stateAgg(rows0: DataFrame, keys: Seq[GroupKey],
      aggs: Seq[AggSpec]): DataFrame = {
    val rows = withKeys(rows0, keys)
    val groupBy = keys.map(_.alias)
    val schema = rows.schema
    val types = argTypes(rows, aggs)
    def arg(a: AggSpec) = argCol(schema, a.column)
    val aggCols = Seq(count(lit(1)).as(NCol)) ++ aggs.flatMap { a =>
      a.func match {
        case "count" => Seq.empty // derived below
        case "min" => Seq(min(arg(a)).as(a.alias))
        case "max" => Seq(max(arg(a)).as(a.alias))
        case "count_distinct" =>
          Seq(hll_sketch_agg(arg(a), lit(HllLgK)).as(hCol(a.alias)),
            count(arg(a)).as(cCol(a.alias)))
        case "sum" | "avg" =>
          val state = numKind(types(a.alias), a.column) match {
            case FloatKind => sum(arg(a).cast(DecimalType(18, a.scale)))
              .cast(DecimalType(38, a.scale))
            case DecKind(s) => sum(arg(a)).cast(DecimalType(38, s))
            case LongKind => sum(arg(a)).cast(LongType)
          }
          Seq(state.as(sCol(a.alias)), count(arg(a)).as(cCol(a.alias)))
      }
    } ++ aggs.collect { case a if a.func == "count" =>
      (if (a.column == "*") count(lit(1)) else count(arg(a))).as(a.alias)
    }
    val full = finalizeVisible(
      rows.groupBy((groupBy.map(q) :+ gid(groupBy).as(GidCol)): _*)
        .agg(aggCols.head, aggCols.tail: _*),
      aggs, types)
    // stored order = visible face (group cols, then aggregates in
    // DECLARED order), hidden state last — [[read]] is then a pure drop
    val hidden = full.columns.filter(_.startsWith("_mv_")).toSeq
    full.select((groupBy ++ aggs.map(_.alias) ++ hidden).map(q): _*)
  }

  /** (Re)derive the visible sum/avg columns from their exact state.
    * Float inputs surface as double, decimals as DECIMAL(38, own scale)
    * (DuckDB's sum-over-decimal shape), integrals as long. */
  private def finalizeVisible(states: DataFrame, aggs: Seq[AggSpec],
      types: Map[String, DataType]): DataFrame =
    aggs.filter(a => Set("sum", "avg", "count_distinct").contains(a.func))
      .foldLeft(states) { (df, a) =>
        val v = a.func match {
          case "count_distinct" =>
            // an all-NULL (or empty) group estimates 0, SQL
            // COUNT(DISTINCT)'s answer; the sketch itself may be NULL
            when(q(cCol(a.alias)) > 0 && q(hCol(a.alias)).isNotNull,
              hll_sketch_estimate(q(hCol(a.alias)))).otherwise(0L)
          case "sum" =>
            val floating = numKind(types(a.alias), a.column) == FloatKind
            val sumVisible =
              if (floating) q(sCol(a.alias)).cast(DoubleType)
              else q(sCol(a.alias))
            when(q(cCol(a.alias)) > 0, sumVisible).otherwise(lit(null))
          case "avg" =>
            when(q(cCol(a.alias)) > 0,
              q(sCol(a.alias)).cast(DoubleType) / q(cCol(a.alias)))
              .otherwise(lit(null))
        }
        df.withColumn(a.alias, v)
      }

  /** Create the view: one FULL aggregation of the source at its current
    * version, committed together with the `graft.mv.*` bookkeeping
    * (source path, group columns, agg spec, optional WHERE, version
    * watermark) — one manifest, so a half-created view cannot exist.
    * `where`: a boolean SQL predicate over source columns — the view
    * aggregates only matching rows, and every refresh path applies the
    * SAME predicate to the feed (an UPDATE moving a row across the
    * boundary nets out as the right insert/remove pair, because its
    * pre/post images filter independently). Returns the source version
    * the view reflects. */
  def create(spark: SparkSession, viewPath: String, sourcePath: String,
      groupBy: Seq[String], aggs: Seq[AggSpec],
      where: Option[String] = None,
      dims: Seq[DimSpec] = Seq.empty,
      joins: Seq[JoinSpec] = Seq.empty,
      having: Option[String] = None): Long = {
    require(groupBy.nonEmpty, "materialized view needs at least one group column")
    val keys = groupBy.map(parseGroupKey) // validates alias/expr characters
    val keyDups = keys.groupBy(_.alias).collect { case (a, ks) if ks.size > 1 => a }
    require(keyDups.isEmpty, s"duplicate group alias(es): ${keyDups.mkString(",")}")
    require(aggs.nonEmpty, "materialized view needs at least one aggregate")
    val dups = aggs.groupBy(_.alias).collect { case (a, as) if as.size > 1 => a }
    require(dups.isEmpty, s"duplicate aggregate alias(es): ${dups.mkString(",")}")
    require(keys.map(_.alias).toSet.intersect(aggs.map(_.alias).toSet).isEmpty,
      "aggregate alias collides with a group column")
    val (sfs, sroot) = fsRoot(spark, sourcePath)
    val srcM = LanceFormat.readLatest(sfs, sroot).getOrElse(
      throw new IllegalArgumentException(s"no lance dataset at $sourcePath"))
    val srcFields = srcM.schema.fieldNames.toSet
    val viewAbs = new java.io.File(viewPath).getAbsolutePath
    // fact⋈fact join tables: validate keys/types/collisions (keys
    // resolve over the ACCUMULATED namespace below — snowflake chains
    // in dependency order); the per-table WATERMARK version is
    // assigned at registration below
    val srcAbs = new java.io.File(sourcePath).getAbsolutePath
    val joinPaths = joins.map(j => new java.io.File(j.path).getAbsolutePath)
    require(joinPaths.distinct.size == joinPaths.size &&
      !joinPaths.contains(srcAbs),
      "join tables must be distinct from each other and from the source")
    // FULL/RIGHT views: at most ONE anti-side factor, and it must be the
    // FIRST join (its keys then resolve against the source alone, so its
    // match counts depend only on A — the ΔA-driven zero-crossing terms
    // stay the single-classifier shape). An inner/left factor BEFORE the
    // anti factor would make the anti part flip with THAT factor's delta
    // too, and those two-sided crossings do not telescope — stack
    // single-join views for such shapes. Inner/left factors AFTER the
    // anti factor compose freely: the anti/flip images simply continue
    // through the tail factors like any other prefix row (the coverage-
    // dashboard star: FULL fact join + INNER/LEFT dims on the merged key
    // or the fact's attributes).
    require(joins.count(_.hasAntiSide) <= 1,
      "at most one FULL/RIGHT join table per view - stack single-join " +
        "views for wider two-sided shapes")
    require(!joins.drop(1).exists(_.hasAntiSide),
      "a FULL/RIGHT join table must be the FIRST join factor (its match " +
        "counts must depend on the source alone) - reorder the joins, or " +
        "stack single-join views")
    var taken = srcFields
    // join keys resolve over the namespace ACCUMULATED so far — the
    // source, or an EARLIER join's attributes (the snowflake chain:
    // orders ⋈ lineitem ⋈ part with part keyed on l_partkey). Declare
    // chains in dependency order; the telescoped refresh identity's
    // version mapping (earlier factors @old, later @new around each Δ)
    // is already the general form, so chains need no new refresh math.
    var accSchema: StructType = srcM.schema
    val joinHeads: Seq[(JoinSpec, Long)] = joins.map { j =>
      val (jfs, jroot) = fsRoot(spark, j.path)
      val jm = LanceFormat.readLatest(jfs, jroot).getOrElse(
        throw new IllegalArgumentException(s"no lance dataset at ${j.path} (join)"))
      val jFields = jm.schema.fieldNames.toSet
      val accFields = accSchema.fieldNames.toSet
      j.keys.foreach { case (s, k) =>
        require(accFields.contains(s),
          s"join key '$s' is not a column of $sourcePath or an earlier " +
            "join (declare chains in dependency order)")
        require(jFields.contains(k),
          s"join key '$k' is not a column of ${j.path}")
        require(accSchema(s).dataType == jm.schema(k).dataType,
          s"join key types differ: $s is " +
            s"${accSchema(s).dataType.simpleString}, $k is " +
            s"${jm.schema(k).dataType.simpleString} - cast the join table")
      }
      val attrs = jFields -- j.keys.values
      val clash = attrs.intersect(taken)
      require(clash.isEmpty,
        s"join ${j.path} column(s) ${clash.mkString(", ")} collide with " +
          "the source (or an earlier join) - rename them")
      taken ++= attrs
      accSchema = StructType(accSchema.fields ++
        jm.schema.fields.filter(f => attrs.contains(f.name)))
      j -> jm.version
    }
    // dim paths must be disjoint from the source, every join table and
    // each other: a table registered as BOTH join and dim would report
    // role "join" from roleAndWatermark (join is checked first), so the
    // dim-side self-heal would read its dim registration as stale, drop
    // the mv-pin tag, and a later vacuum could reclaim the pinned
    // snapshot every refresh joins against. Nothing expressible is
    // lost: a same-table re-reference's attributes collide anyway.
    val dimPaths = dims.map(d => new java.io.File(d.path).getAbsolutePath)
    require(dimPaths.distinct.size == dimPaths.size &&
      !dimPaths.contains(srcAbs) && dimPaths.intersect(joinPaths).isEmpty,
      "dim tables must be distinct from each other, the source and the join tables")
    // the JOINED namespace (source + join attrs): dims key off it, and
    // group keys / aggregate args / WHERE resolve over it plus dim attrs
    val joinedProbe = applyJoins(spark, spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), srcM.schema),
      joinHeads)
    val joinedFields = joinedProbe.schema.fieldNames.toSet
    // star dims: validate join keys + attribute-name collisions, PIN each
    // dim's current version, TAG it (a dim-side vacuum must never
    // reclaim the snapshot every refresh joins against) and register the
    // view for the dim's ALTER RENAME/DROP guard
    val pinned: Seq[(DimSpec, Long)] = {
      dims.map { d =>
        val (dfs, droot) = fsRoot(spark, d.path)
        val dm = LanceFormat.readLatest(dfs, droot).getOrElse(
          throw new IllegalArgumentException(s"no lance dataset at ${d.path} (dim)"))
        requireBroadcastable(spark, d, dm)
        val dimFields = dm.schema.fieldNames.toSet
        d.keys.foreach { case (s, k) =>
          require(joinedFields.contains(s),
            s"dim join key '$s' is not a column of $sourcePath (or its joins)")
          require(dimFields.contains(k),
            s"dim join key '$k' is not a column of ${d.path}")
          require(joinedProbe.schema(s).dataType == dm.schema(k).dataType,
            s"dim join key types differ: $s is " +
              s"${joinedProbe.schema(s).dataType.simpleString}, $k is " +
              s"${dm.schema(k).dataType.simpleString} - cast the dim")
        }
        val attrs = dimFields -- d.keys.values
        val clash = attrs.intersect(taken)
        require(clash.isEmpty,
          s"dim ${d.path} column(s) ${clash.mkString(", ")} collide with " +
            "the source (or an earlier dim) - rename them in the dim")
        taken ++= attrs
        d -> dm.version
      }
    }
    // group keys resolve over the ENRICHED namespace (source + joins +
    // dims): plain keys must BE columns; expression keys must analyze
    // clean, stay scalar (no aggregate/window — both would change the
    // row-per-row delta semantics) and deterministic (every refresh
    // path must key each image identically), and their alias must not
    // SHADOW an existing column (withKeys would silently replace it)
    val enrichedProbe = enrich(spark, joinedProbe, pinned)
    val enrichedFields = enrichedProbe.schema.fieldNames.toSet
    keys.foreach { k =>
      if (k.isPlain)
        require(enrichedFields.contains(k.alias),
          s"no group column '${k.alias}' in $sourcePath (or its dims)")
      else {
        require(!enrichedFields.contains(k.alias),
          s"group alias '${k.alias}' shadows a source (or dim) column - " +
            "pick another alias")
        val analyzed = try {
          enrichedProbe.select(expr(k.expr).as(k.alias))
            .queryExecution.analyzed
        } catch {
          case e: org.apache.spark.sql.AnalysisException =>
            throw new IllegalArgumentException(
              s"group expression '${k.expr}' does not resolve over " +
                s"$sourcePath: ${e.getMessage}")
        }
        require(!analyzed.exists(p =>
          p.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Aggregate] ||
            p.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Window]),
          s"group expression '${k.expr}' may not aggregate or window")
        require(analyzed.expressions.forall(_.deterministic),
          s"group expression '${k.expr}' is nondeterministic: every " +
            "refresh path must key each feed image identically")
      }
    }
    // aggregate arguments may be expressions: resolve each against the
    // source schema (analysis only), refuse nested aggregates / windows
    // (both would change the row-per-row delta semantics) and anything
    // nondeterministic (full and incremental refresh must agree), and
    // type-check sum/avg arguments as numeric — a silent long-cast over
    // decimals was exactly the truncation bug this guard exists for
    aggs.filter(_.column != "*").foreach { a =>
      val analyzed = try {
        enrichedProbe.select(argCol(enrichedProbe.schema, a.column).as("__x"))
          .queryExecution.analyzed
      } catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"aggregate argument '${a.column}' does not resolve over " +
              s"$sourcePath: ${e.getMessage}")
      }
      require(!analyzed.exists(p =>
        p.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Aggregate] ||
          p.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Window]),
        s"aggregate argument '${a.column}' may not itself aggregate or window")
      require(analyzed.expressions.forall(_.deterministic),
        s"aggregate argument '${a.column}' is nondeterministic: every " +
          "refresh path must evaluate it identically")
      if (a.func == "sum" || a.func == "avg")
        numKind(analyzed.schema.head.dataType, a.column) // numeric or throw
      if (a.func == "count_distinct") {
        val dt = analyzed.schema.head.dataType
        require(Seq[DataType](IntegerType, LongType, StringType, BinaryType)
          .contains(dt),
          s"count_distinct argument '${a.column}' is ${dt.simpleString}: " +
            "the HLL sketch admits int, bigint, string, binary - cast it")
      }
    }
    // the WHERE must validate HERE, not first at materialization: the
    // pin tags below are permanent (no self-heal releases a dim tag for
    // a view that never materialized), so a rejected predicate must
    // refuse before any side effect
    where.foreach { w =>
      try enrichedProbe.filter(expr(w)).queryExecution.analyzed
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"WHERE '$w' does not resolve over $sourcePath (or its " +
            s"joins/dims): ${e.getMessage}")
      }
    }
    // HAVING resolves over the view's OUTPUT face (group aliases +
    // aggregate aliases) — analysis-only probe through the same
    // state-derivation path read() serves. Row-local and deterministic
    // for the same reason as WHERE: read() must filter each stored
    // group row independently, on every read identically.
    having.foreach { h =>
      val probe = stateAgg(enrichedProbe, keys, aggs)
      val visible = probe.drop(
        probe.columns.filter(_.startsWith("_mv_")).toIndexedSeq: _*)
      val analyzed = try visible.filter(expr(h)).queryExecution.analyzed
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"HAVING '$h' does not resolve over the view's output columns " +
            s"(${(keys.map(_.alias) ++ aggs.map(_.alias)).mkString(", ")}): " +
            e.getMessage)
      }
      require(!analyzed.exists(p =>
        p.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Window]) &&
        // the filter sits ABOVE the probe's aggregation; a second
        // aggregate INSIDE the predicate is the un-maintainable shape
        !analyzed.collectFirst { case f: org.apache.spark.sql.catalyst
          .plans.logical.Filter => f }.exists(_.expressions.exists(_.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.aggregate
            .AggregateExpression]))),
        s"HAVING '$h' may not aggregate or window: reference the selected " +
          "aggregates by their aliases")
      require(analyzed.expressions.forall(_.deterministic),
        s"HAVING '$h' is nondeterministic: every read must filter " +
          "identically")
    }
    val (vfs, vroot) = fsRoot(spark, viewPath)
    require(LanceFormat.readLatest(vfs, vroot).isEmpty,
      s"dataset already exists at $viewPath")
    // dim pin tags + guard registrations land only AFTER every
    // validation above: a refused create (bad column, existing view
    // path) must not leak a permanent vacuum pin on the dim
    pinned.foreach { case (d, v) =>
      graft.Lance.tag(spark, d.path, dimPinTag(viewAbs), Some(v), replace = true)
      val (dfs, droot) = fsRoot(spark, d.path)
      LanceFormat.commitPropertiesWith(dfs, droot, { prev =>
        val cur = prev.get(PropDimDependents).toSeq.flatMap(_.split('\n'))
        if (cur.contains(viewAbs)) prev
        else prev + (PropDimDependents -> (cur :+ viewAbs).mkString("\n"))
      })
    }
    // register FIRST (metadata commit on the source), then materialize
    // at the registration-inclusive version — the stored watermark then
    // names a version that already carries the registration, so the
    // next refresh window is pure data. A crash in between leaves a
    // dangling registration that refreshDependents self-heals away.
    // Function-shaped commit: two concurrent creates both land.
    val abs = viewAbs
    def register(fs: org.apache.hadoop.fs.FileSystem,
        root: org.apache.hadoop.fs.Path): Long =
      LanceFormat.commitPropertiesWith(fs, root, { prev =>
        val cur = prev.get(PropDependents).toSeq.flatMap(_.split('\n'))
        if (cur.contains(abs)) prev
        else prev + (PropDependents -> (cur :+ abs).mkString("\n"))
      }).version
    val registered = register(sfs, sroot)
    // join tables register too: a write to EITHER side can maintain the
    // view, and each side's retention vacuum pins to its own watermark
    val registeredJoins: Seq[(JoinSpec, Long)] = joins.map { j =>
      val (jfs, jroot) = fsRoot(spark, j.path)
      j -> register(jfs, jroot)
    }
    testHookAfterRegister()
    val src0 = spark.read.format("lance")
      .option("versionAsOf", registered.toString).load(sourcePath)
    // join → dims → where, the order every refresh path replays
    val src = where.foldLeft(
      enrich(spark, applyJoins(spark, src0, registeredJoins), pinned))(
      (df, w) => df.filter(expr(w))) // also validates w
    stateAgg(src, keys, aggs)
      .write.format("lance").mode("overwrite")
      .option("write.set-properties", LanceFormat.serializeProperties(Map(
        PropSource -> new java.io.File(sourcePath).getAbsolutePath,
        PropAggs -> encodeAggs(aggs),
        PropVersion -> registered.toString) ++ encodeGroupKeys(keys) ++
        where.map(PropWhere -> _) ++ having.map(PropHaving -> _) ++
        (if (pinned.isEmpty) Map.empty
         else Map(PropDims -> encodeDims(pinned))) ++
        (if (registeredJoins.isEmpty) Map.empty
         else encodeJoinProps(registeredJoins))))
      .save(viewPath)
    // re-assert the registrations: a refreshDependents racing this create
    // could observe "no lance dataset" in the register→materialize window
    // and deregister us (its re-check narrows but cannot close the race);
    // one idempotent metadata commit per table makes the end state
    // registered — on the source and on every join table
    ((sfs, sroot) +: joins.map(j => fsRoot(spark, j.path))).foreach {
      case (fs, root) =>
        val still = LanceFormat.readLatest(fs, root)
          .flatMap(_.properties).getOrElse(Map.empty)
          .get(PropDependents).toSeq.flatMap(_.split('\n')).contains(abs)
        if (!still) register(fs, root)
    }
    registered
  }

  /** Test seam: runs between the source-side registration commit and the
    * view materialization — the window a concurrent [[refreshDependents]]
    * races (see the self-heal contract there). Production no-op. */
  private[graft] var testHookAfterRegister: () => Unit = () => ()

  /** Test seam: cumulative count of feed frames [[refreshDependents]]
    * actually materialized — N same-window views should cost 1. */
  private[graft] var feedMaterializations = 0

  /** Unregister + delete a view. Missing registration self-heals; the
    * source not existing anymore is fine too. */
  def drop(spark: SparkSession, viewPath: String): Boolean = {
    val (vfs, vroot) = fsRoot(spark, viewPath)
    // ONE snapshot read serves both the existence check and the
    // source-path lookup (two reads could straddle a concurrent commit)
    val snapshot = LanceFormat.readLatest(vfs, vroot)
    val existed = snapshot.isDefined
    val abs = vroot.toString
    if (existed) {
      val props = snapshot.get.properties.getOrElse(Map.empty)
      props.get(PropSource).foreach { source =>
        val (sfs, sroot) = fsRoot(spark, source)
        if (LanceFormat.readLatest(sfs, sroot).isDefined)
          LanceFormat.commitPropertiesWith(sfs, sroot, { prev =>
            val kept = prev.get(PropDependents).toSeq.flatMap(_.split('\n'))
              .filterNot(p => p == abs || p == viewPath)
            if (kept.isEmpty) prev - PropDependents
            else prev + (PropDependents -> kept.mkString("\n"))
          })
      }
      // join tables: release their maintenance/pin registrations
      decodeJoins(props).foreach {
        case (j, _) =>
          try {
            val (jfs, jroot) = fsRoot(spark, j.path)
            if (LanceFormat.readLatest(jfs, jroot).isDefined)
              LanceFormat.commitPropertiesWith(jfs, jroot, { prev =>
                val kept = prev.get(PropDependents).toSeq.flatMap(_.split('\n'))
                  .filterNot(p => p == abs || p == viewPath)
                if (kept.isEmpty) prev - PropDependents
                else prev + (PropDependents -> kept.mkString("\n"))
              })
          } catch { case _: Exception => () } // join table gone: nothing to do
      }
      // star dims: release the pin tag and the ALTER-guard registration
      props.get(PropDims).map(decodeDims).getOrElse(Seq.empty).foreach {
        case (d, _) =>
          try {
            graft.Lance.deleteTag(spark, d.path, dimPinTag(abs))
            val (dfs, droot) = fsRoot(spark, d.path)
            if (LanceFormat.readLatest(dfs, droot).isDefined)
              LanceFormat.commitPropertiesWith(dfs, droot, { prev =>
                val kept = prev.get(PropDimDependents).toSeq
                  .flatMap(_.split('\n')).filterNot(_ == abs)
                if (kept.isEmpty) prev - PropDimDependents
                else prev + (PropDimDependents -> kept.mkString("\n"))
              })
          } catch { case _: Exception => () } // dim gone: nothing to release
      }
    }
    vfs.delete(vroot, true)
    existed
  }

  /** Refresh every view registered on `sourcePath`. Warn-never-fail per
    * view (the refresh-indexes posture: a stale view must not fail the
    * write that triggered maintenance); a registered path that is no
    * longer a view is DE-registered (self-heal). Returns
    * (viewPath, result-or-error-message) per dependent. */
  def refreshDependents(spark: SparkSession, sourcePath: String)
      : Seq[(String, Either[String, RefreshResult])] = {
    // one CACHED feed frame per (table, window) across the WHOLE cascade:
    // with several views registered on one hot source, the nightly
    // optimize would otherwise serialize N identical changefeed scans —
    // views sharing a watermark (the in-commit-maintenance norm) share
    // one materialization, one per stacking level. Keyed by table path
    // because a JOIN view pulls feeds from several tables through the
    // same callback.
    val feedCache =
      scala.collection.mutable.Map.empty[(String, Long, Long), DataFrame]
    def sharedFeed(path: String, v0: Long, vN: Long): DataFrame =
      feedCache.getOrElseUpdate((path, v0, vN), {
        feedMaterializations += 1
        graft.MetaTvfs.register(spark)
        spark.sql(s"SELECT * FROM lance_changes('${
          path.replace("'", "''")}', $v0, $vN)")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      })
    // visited guards stacked-view CYCLES (only constructible by
    // recreating a view against its own descendant) and diamond shapes
    // (a grandchild reached through two parents refreshes once — after
    // its FIRST refreshed parent; the other parent's change lands next
    // pass, incremental and correct either way)
    val visited = scala.collection.mutable.Set(
      new java.io.File(sourcePath).getAbsolutePath)
    try refreshLevel(spark, sourcePath, sharedFeed, visited)
    finally feedCache.values.foreach(_.unpersist())
  }

  /** One level of the dependency cascade: refresh every view registered
    * on `sourcePath`, and AFTER each success, recurse into that view's
    * own dependents — a 3-level pyramid (base → daily → monthly) stays
    * fresh from one `optimize(base)`, each level refreshing strictly
    * after the level it reads (dependency order by construction). */
  private def refreshLevel(spark: SparkSession, sourcePath: String,
      sharedFeed: (String, Long, Long) => DataFrame,
      visited: scala.collection.mutable.Set[String])
      : Seq[(String, Either[String, RefreshResult])] = {
    val (sfs, sroot) = fsRoot(spark, sourcePath)
    val deps = LanceFormat.readLatest(sfs, sroot)
      .flatMap(_.properties).getOrElse(Map.empty)
      .get(PropDependents).toSeq.flatMap(_.split('\n')).filter(_.nonEmpty)
    val srcAbs = new java.io.File(sourcePath).getAbsolutePath
    val dangling = scala.collection.mutable.ArrayBuffer.empty[String]
    val out = deps.flatMap { vp =>
      if (!visited.add(new java.io.File(vp).getAbsolutePath)) Seq.empty
      else {
        // A view recreated under its registered path against a DIFFERENT
        // source refreshes cleanly (it IS a valid view — of another
        // table), so the exception-driven self-heal below would never
        // fire for it: the stale registration would trigger a redundant
        // refresh from this table's every maintenance pass, forever (the
        // fsck warning promises it heals). One manifest read routes such
        // entries into the same dangling re-check instead of refreshing.
        val staleRole = {
          val (vfs, vroot) = fsRoot(spark, vp)
          LanceFormat.readLatest(vfs, vroot).exists { mm =>
            val p = mm.properties.getOrElse(Map.empty)
            p.contains(PropSource) && !roleAndWatermark(p, srcAbs).exists(
              r => r._1 == "source" || r._1 == "join")
          }
        }
        val res = if (staleRole) {
          dangling += vp
          Left("stale: view no longer references this table as source or join")
        } else try Right(refresh(spark, vp, Some(sharedFeed))) catch {
          case e: IllegalArgumentException
              if e.getMessage != null &&
                (e.getMessage.contains("no lance dataset") ||
                  e.getMessage.contains("not a materialized view")) =>
            dangling += vp
            Left(s"dangling: ${e.getMessage}")
          case e: Exception => Left(e.getMessage)
        }
        // cascade strictly AFTER this parent committed its refresh: the
        // child's feed then covers the parent window just applied
        (vp -> res) +: (res match {
          case Right(_) => refreshLevel(spark, vp, sharedFeed, visited)
          case Left(_) => Seq.empty
        })
      }
    }
    // Self-heal — but a registration whose path reads "no lance dataset"
    // may be a CREATE mid-flight (register-first contract): deregistering
    // it would silently orphan the view from maintenance AND drop its
    // retention pin. So re-check each dangling path at deregistration
    // time and only drop those still broken; a concurrent create that
    // slips past even this re-check re-asserts itself after
    // materializing, so the end state is registered either way. A truly
    // crashed create (dataset never appears) deregisters on the NEXT
    // maintenance pass — dangling for one window, then healed.
    if (dangling.nonEmpty) {
      val stillGone = dangling.filter { vp =>
        val (vfs, vroot) = fsRoot(spark, vp)
        LanceFormat.readLatest(vfs, vroot) match {
          case None => true // still no dataset: crashed create, heal it
          case Some(mm) => // exists but no longer (never was) a view of
            // THIS table — roleAndWatermark is the one parse, so a view
            // recreated against a different source deregisters here too
            val p = mm.properties.getOrElse(Map.empty)
            !p.contains(PropSource) || !roleAndWatermark(p, srcAbs)
              .exists(r => r._1 == "source" || r._1 == "join")
        }
      }
      if (stillGone.nonEmpty)
        LanceFormat.commitPropertiesWith(sfs, sroot, { prev =>
          val kept = prev.get(PropDependents).toSeq.flatMap(_.split('\n'))
            .filterNot(stillGone.contains)
          if (kept.isEmpty) prev - PropDependents
          else prev + (PropDependents -> kept.mkString("\n"))
        })
    }
    out
  }

  /** Dim-side self-heal: release `graft.mv.dim-dependents` entries (and
    * their vacuum pin TAGS) whose view EXISTS but no longer references
    * this dim — a view recreated under its registered path without this
    * dim would otherwise pin the dim's vacuum forever.
    * [[refreshDependents]] covers source/join registrations; dims have
    * no refresh fan-out, so the nightly `optimize` calls this instead.
    * Deliberately conservative: an entry whose view path holds NO
    * dataset is LEFT ALONE — `create` pins dims BEFORE materializing,
    * so "no dataset" may be a create in flight, and healing it would
    * strip the pin from under the new view (a crashed create's pin is
    * the operator's call — fsck surfaces it with the manual recovery).
    * Returns the released view paths. */
  def healDimRegistrations(spark: SparkSession, dimPath: String): Seq[String] = {
    val (dfs, droot) = fsRoot(spark, dimPath)
    val dimAbs = new java.io.File(dimPath).getAbsolutePath
    val regs = LanceFormat.readLatest(dfs, droot)
      .flatMap(_.properties).getOrElse(Map.empty)
      .get(PropDimDependents).toSeq.flatMap(_.split('\n')).filter(_.nonEmpty)
    val stale = regs.filter { vp =>
      val (vfs, vroot) = fsRoot(spark, vp)
      LanceFormat.readLatest(vfs, vroot) match {
        case None => false // mid-create or crashed create: never heal
        case Some(vm) =>
          val props = vm.properties.getOrElse(Map.empty)
          !props.contains(PropSource) || // not a view anymore
            !roleAndWatermark(props, dimAbs).contains(("dim", None))
      }
    }
    if (stale.nonEmpty) {
      stale.foreach { vp =>
        try graft.Lance.deleteTag(spark, dimPath, dimPinTag(
          new java.io.File(vp).getAbsolutePath))
        catch { case _: Exception => () } // tag already gone
      }
      LanceFormat.commitPropertiesWith(dfs, droot, { prev =>
        val kept = prev.get(PropDimDependents).toSeq.flatMap(_.split('\n'))
          .filterNot(stale.contains)
        if (kept.isEmpty) prev - PropDimDependents
        else prev + (PropDimDependents -> kept.mkString("\n"))
      })
    }
    stale
  }

  private case class ViewSpec(source: String, keys: Seq[GroupKey],
    aggs: Seq[AggSpec], v0: Long, where: Option[String],
    dims: Seq[(DimSpec, Long)], joins: Seq[(JoinSpec, Long)])

  private def spec(spark: SparkSession, viewPath: String): ViewSpec = {
    val (vfs, vroot) = fsRoot(spark, viewPath)
    val props = LanceFormat.readLatest(vfs, vroot).getOrElse(
      throw new IllegalArgumentException(s"no lance dataset at $viewPath"))
      .properties.getOrElse(Map.empty)
    val source = props.getOrElse(PropSource,
      throw new IllegalArgumentException(
        s"$viewPath is not a materialized view (no $PropSource property)"))
    ViewSpec(source, decodeGroupKeys(props),
      decodeAggs(props(PropAggs)), props(PropVersion).toLong,
      props.get(PropWhere),
      props.get(PropDims).map(decodeDims).getOrElse(Seq.empty),
      decodeJoins(props))
  }

  /** Incremental refresh. Picks delta vs scoped-group recompute (see
    * object doc); falls back loud — never silently full — when the feed
    * window is gone (vacuumed versions): use [[fullRefresh]] then. */
  def refresh(spark: SparkSession, viewPath: String): RefreshResult =
    refresh(spark, viewPath, None)

  /** `sharedFeed`: [[refreshDependents]]'s per-(window) feed cache — N
    * views on one hot source then pay ONE feed materialization per
    * window instead of N identical scans in the nightly optimize. */
  private def refresh(spark: SparkSession, viewPath: String,
      sharedFeed: Option[(String, Long, Long) => DataFrame]): RefreshResult = {
    val ViewSpec(source, keys, aggs, v0, where, dims, joins) =
      spec(spark, viewPath)
    val groupBy = keys.map(_.alias)
    val (sfs, sroot) = fsRoot(spark, source)
    val srcM = LanceFormat.readLatest(sfs, sroot).getOrElse(
      throw new IllegalStateException(s"materialized-view source vanished: $source"))
    val vN = srcM.version
    // join-table heads + window validity (same rules as the source)
    val joinHeads: Seq[(JoinSpec, Long, Long)] = joins.map { case (j, jv0) =>
      val (jfs, jroot) = fsRoot(spark, j.path)
      val jm = LanceFormat.readLatest(jfs, jroot).getOrElse(
        throw new IllegalStateException(s"join table vanished: ${j.path}"))
      require(jm.version >= jv0, s"join table ${j.path} went BACKWARDS " +
        s"(v$jv0 -> v${jm.version}); run fullRefresh")
      if (jm.version != jv0 && jv0 != 0 &&
          !LanceFormat.listVersions(jfs, jroot).contains(jv0))
        throw new IllegalStateException(s"feed window lost: ${j.path} " +
          s"version $jv0 was vacuumed; run fullRefresh")
      (j, jv0, jm.version)
    }
    val joinsChanged = joinHeads.exists { case (_, a, b) => a != b }
    if (vN == v0 && !joinsChanged) return RefreshResult("noop", v0, vN, 0L)
    require(vN >= v0, s"source $source went BACKWARDS (v$v0 -> v$vN): it was " +
      "restored/recreated under the view; run fullRefresh")
    if (v0 != 0 && !LanceFormat.listVersions(sfs, sroot).contains(v0))
      throw new IllegalStateException(
        s"feed window lost: source version $v0 was vacuumed; run fullRefresh")
    // a JOIN refresh replays each feed several times (IN-list prune
    // collects, the removal probe, the delta aggregation): persist the
    // change-bounded frames for the duration instead of re-scanning —
    // unpersisted in the final cleanup below (sharedFeed already caches)
    val localFeeds = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def tableFeed(path: String, a: Long, b: Long): DataFrame = {
      val abs = new java.io.File(path).getAbsolutePath
      sharedFeed.map(_(abs, a, b)).getOrElse {
        graft.MetaTvfs.register(spark)
        val df = spark.sql(
          s"SELECT * FROM lance_changes('${abs.replace("'", "''")}', $a, $b)")
        if (joins.isEmpty) df
        else {
          val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          localFeeds += p
          p
        }
      }
    }
    // EVERYTHING below may throw after a feed frame persists (the
    // window-lost checks above run first, but the scoped-path collect,
    // the removal probe and enrich/WHERE analysis all sit between a
    // persist and the commit) — one finally at this level releases the
    // MEMORY_AND_DISK frames on every exit path, not just the final
    // guard+commit section.
    try {
      // IN-list prune: scope a fact scan to the join keys a SMALL frame
      // touches — the predicates push into the scan, so manifest stats /
      // buckets / postings bound each telescoping term by the CHANGE, not
      // the table. Above the cap the term falls back to the full join
      // (co-bucketed tables still join exchange-free). Inner-join
      // semantics: NULL keys never match, so no isNull arm.
      //
      // The distinct-collect SAMPLES are memoized per (frame identity,
      // column list) for the refresh's duration (guide §1.2): the ΔA
      // factor prunes, the zero-crossing cnt probes, the anti-image
      // probe and each tail continuation all sample the same persisted
      // change-bounded frames — one Spark collect now serves them all
      // (a multi-join refresh previously re-ran the identical
      // distinct+collect up to 3x per factor).
      val cap = spark.conf.getOption("spark.graft.dml.inlistPrune")
        .map(_.toInt).getOrElse(1000)
      val sampleCache = new java.util.IdentityHashMap[DataFrame,
        scala.collection.mutable.Map[Seq[String], Array[org.apache.spark.sql.Row]]]()
      def keySample(small: DataFrame, cols: Seq[String])
          : Array[org.apache.spark.sql.Row] = {
        val per = Option(sampleCache.get(small)).getOrElse {
          val m = scala.collection.mutable.Map
            .empty[Seq[String], Array[org.apache.spark.sql.Row]]
          sampleCache.put(small, m); m
        }
        per.getOrElseUpdate(cols,
          small.select(cols.map(q): _*).distinct().limit(cap + 1).collect())
      }
      def pruneBySample(big: DataFrame, bigCols: Seq[String],
          sample: Array[org.apache.spark.sql.Row]): DataFrame =
        if (sample.length > cap) big
        else bigCols.zipWithIndex.foldLeft(big) { case (df, (b, i)) =>
          val vals = sample.map(_.get(i)).distinct.filter(_ != null).toSeq
          if (vals.isEmpty) df.filter(lit(false))
          else df.filter(q(b).isin(vals: _*))
        }
      def prunedByKeys(big: DataFrame, keyOf: Seq[(String, String)],
          small: DataFrame): DataFrame =
        pruneBySample(big, keyOf.map(_._1), keySample(small, keyOf.map(_._2)))
      // each join factor at its NEW version, pruned on the subset of its
      // keys the `small` frame OWNS (a chain join keyed on an earlier
      // join's attrs can't prune from the source side alone; pruning on
      // the owned subset stays a correct superset — every surviving row
      // must still satisfy the full join condition). Serves the ΔA
      // telescoping term (small = the source feed) and the scoped-group
      // rescan (small = the pre-filtered source).
      def prunedFactors(small: DataFrame): Map[String, DataFrame] =
        joinHeads.map { case (j, _, nv) =>
          val jAbs = new java.io.File(j.path).getAbsolutePath
          val full = spark.read.format("lance")
            .option("versionAsOf", nv.toString).load(j.path)
          val owned = j.keys.toSeq
            .filter { case (s, _) => small.columns.contains(s) }
            .map { case (s, k) => (k, s) }
          jAbs -> (if (owned.isEmpty) full
                   else prunedByKeys(full, owned, small))
        }.toMap
      // join `rows` (prefix-shaped through factor i) through the TAIL
      // factors at their NEW versions, declared types, each pruned to
      // the keys the rows own — anti images and zero-crossing flip rows
      // both continue through the tail this way: a NULLed key column
      // prunes the tail factor to empty, and inner-drops / left-null-
      // extends exactly like the unpruned join would.
      //
      // `proxy` maps a rows-column to an (already-sampled frame, column)
      // whose value set BOUNDS the rows' values for it (factor i's feed
      // or flip set — the join/flip conditions guarantee containment):
      // a tail factor whose owned keys are all proxied prunes from the
      // memoized samples with ZERO extra collects and no re-execution
      // of the rows DAG. `sampleRows = false` keeps an un-proxied tail
      // factor UNPRUNED instead of sampling the rows frame (the Δ-image
      // term's prior behavior — sampling there would add a collect that
      // re-runs the prefix join).
      def tailJoinNew(rows: DataFrame, i: Int,
          proxy: Map[String, (DataFrame, String)] = Map.empty,
          sampleRows: Boolean = true): DataFrame = {
        val tail = joinHeads.drop(i + 1)
        if (tail.isEmpty) rows
        else {
          val imgs = tail.map { case (jj, _, nv) =>
            val jjAbs = new java.io.File(jj.path).getAbsolutePath
            val full = spark.read.format("lance")
              .option("versionAsOf", nv.toString).load(jj.path)
            val owned = jj.keys.toSeq
              .filter { case (s2, _) => rows.columns.contains(s2) }
            val pruned =
              if (owned.isEmpty) full
              else if (owned.forall(p => proxy.contains(p._1)))
                owned.foldLeft(full) { case (df, (s2, k2)) =>
                  val (pf, pc) = proxy(s2)
                  pruneBySample(df, Seq(k2), keySample(pf, Seq(pc)))
                }
              else if (sampleRows)
                prunedByKeys(full,
                  owned.map { case (s2, k2) => (k2, s2) }, rows)
              else full
            jjAbs -> pruned
          }.toMap
          applyJoins(spark, rows,
            tail.map { case (jj, _, nv) => (jj, nv) }, images = imgs)
        }
      }
      val feed0: DataFrame =
        if (joins.isEmpty) tableFeed(source, v0, vN)
        else {
          // telescoped IVM identity over source A and join tables J1..Jn:
          //   Δ(A⋈J1⋈..⋈Jn) = ΔA ⋈ J1@new ⋈ .. ⋈ Jn@new
          //                  ∪ A@old ⋈ J1@old .. J(i-1)@old ⋈ ΔJi
          //                          ⋈ J(i+1)@new .. Jn@new   (i = 1..n)
          // Signed multiset algebra: each term's images carry their own
          // _change_type, so the ordinary delta arithmetic applies.
          val terms = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
          // build a join-side-only ("anti") row frame: prefix columns
          // null except the source KEY columns, which carry the join
          // side's key values (the coalesce(s,k) merged-key shape every
          // applyJoins path produces for FULL/RIGHT factors). `jRows` is
          // join-table-shaped; extra columns (feed meta, flip marks)
          // ride through untouched.
          def antiShape(jRows: DataFrame, keyPairs: Seq[(String, String)])
              : DataFrame = {
            val kOf = keyPairs.toMap // source col -> join col
            val srcNames = srcM.schema.fieldNames.toSet
            val kSet = keyPairs.map(_._2).toSet
            val sel = srcM.schema.fields.toSeq.map { f =>
              kOf.get(f.name).map(k => q(k).cast(f.dataType).as(f.name))
                .getOrElse(lit(null).cast(f.dataType).as(f.name))
            } ++ jRows.columns.toSeq
              .filterNot(c => kSet.contains(c) || srcNames.contains(c))
              .map(c => q(c))
            jRows.select(sel: _*)
          }
          // the ONE zero-crossing classifier, shared by both flip
          // directions (source-side null-extension flips driven by ΔJ;
          // join-side anti flips driven by ΔA): net = signed feed sum
          // per non-NULL key, cnt = the snapshot's count over the
          // touched keys (pruned scan + exact semi-join), cnt@old =
          // cnt − net. _mv_flip −1 on 0→>0 matches (retract the
          // extended/anti rows), +1 on >0→0 (re-extend them). Caller
          // persists and releases the returned frame.
          def zeroCrossings(feed: DataFrame, keyCols: Seq[String],
              snapshot: DataFrame): DataFrame = {
            val sign = when(col("_change_type")
              .isin("insert", "update_postimage"), 1L).otherwise(-1L)
            val net = feed
              .filter(keyCols.map(q(_).isNotNull).reduce(_ && _))
              .groupBy(keyCols.map(q): _*).agg(sum(sign).as("_mv_net"))
            // prune the snapshot from the FEED's memoized key sample
            // (per-column superset of net's keys — the exact semi-join
            // below still scopes): the factor-prune collect is reused,
            // where sampling `net` re-ran the feed aggregation per probe
            val cnt = pruneBySample(snapshot, keyCols, keySample(feed, keyCols))
              .join(net.select(keyCols.map(q): _*), keyCols, "left_semi")
              .groupBy(keyCols.map(q): _*).agg(count(lit(1)).as("_mv_cnt"))
            net.join(cnt, keyCols, "left")
              .withColumn("_mv_cnt", coalesce(q("_mv_cnt"), lit(0L)))
              .withColumn("_mv_flip",
                when(q("_mv_cnt") > 0 && q("_mv_cnt") === q("_mv_net"),
                  lit(-1L))
                  .when(q("_mv_cnt") === 0L && q("_mv_net") < 0, lit(1L))
                  .otherwise(lit(0L)))
              .filter(q("_mv_flip") =!= 0L)
          }
          if (vN != v0) {
            val aFeed = tableFeed(source, v0, vN)
            // a FULL factor's ΔA term joins LEFT, a RIGHT factor's INNER:
            // the images' own match/no-match decides their rows; the
            // join-side anti flips ride the mirrored term below
            terms += applyJoins(spark, aFeed,
              joinHeads.map { case (j, _, nv) => (j, nv) },
              prunedFactors(aFeed),
              howOverride = joinHeads.collect {
                case (j, _, _) if j.joinType == "full" =>
                  new java.io.File(j.path).getAbsolutePath -> "left"
                case (j, _, _) if j.joinType == "right" =>
                  new java.io.File(j.path).getAbsolutePath -> "inner"
              }.toMap)
            joinHeads.zipWithIndex.foreach {
              case ((j, _, jvN), ji) if j.hasAntiSide =>
              // ---- join-side zero-crossing flips driven by ΔA:
              //   (J@new ▷ A@new) − (J@new ▷ A@old), null-extended
              // A J@new row is "anti" iff NO source row matches its key;
              // membership flips exactly where the source-side match
              // count crosses zero. cnt@old = cnt@new − net(ΔA) per key
              // (no second snapshot). NULL-component keys never match on
              // either side — excluded here, constant-anti there.
              val keyPairs = j.keys.toSeq
              val sCols = keyPairs.map(_._1)
              val aNew = spark.read.format("lance")
                .option("versionAsOf", vN.toString).load(source)
              val flips = zeroCrossings(aFeed, sCols, aNew)
                .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
              localFeeds += flips
              // no isEmpty probe: an empty flips frame contributes an
              // empty term (the sample collect below materializes the
              // persisted flips anyway, so the probe was a pure extra job)
              val kCols = keyPairs.map(_._2)
              // flip keys renamed source→join side for the prune+join
              val fk = flips.select((keyPairs.map { case (s, k) =>
                q(s).as(k) } :+ q("_mv_flip")): _*)
              val jNew = spark.read.format("lance")
                .option("versionAsOf", jvN.toString).load(j.path)
              val jHit = pruneBySample(jNew, kCols, keySample(flips, sCols))
                .join(fk, kCols, "inner")
              // flipped anti rows continue through the TAIL factors at
              // @new (the ΔA term's version mapping), declared types —
              // an anti row carries its merged key and this factor's
              // attrs, so tail dims keyed on either join normally.
              // proxy: the anti rows' source key values ARE flip keys
              // ⊆ the flips frame's own memoized sample
              terms += tailJoinNew(antiShape(jHit, keyPairs), ji,
                proxy = keyPairs.map { case (s, _) =>
                  s -> ((flips: DataFrame), s) }.toMap)
                .withColumn("_change_type",
                  when(q("_mv_flip") === -1L, lit("delete"))
                    .otherwise(lit("insert")))
                .withColumn("_commit_version", lit(vN))
                .drop("_mv_flip")
            case _ => ()
            }
          }
          lazy val aOld = spark.read.format("lance")
            .option("versionAsOf", v0.toString).load(source)
          joinHeads.zipWithIndex.foreach { case ((j, jv0, jvN), i) =>
            if (jvN != jv0) {
              val jAbs = new java.io.File(j.path).getAbsolutePath
              val jFeed = tableFeed(j.path, jv0, jvN)
              val versions = joinHeads.zipWithIndex.map {
                case ((jj, ov, nv), k) => (jj, if (k < i) ov else nv)
              }
              // prune each factor that OWNS key columns of this Δ to the
              // key values a SMALL frame touches: source-owned keys prune
              // the A@old scan, chain keys prune the owning EARLIER
              // join's frame (through the images override). Shared by the
              // Δ-image term (small = this factor's feed) and the LEFT
              // flip term (small = the zero-crossing key set).
              val keyPairs = j.keys.toSeq
              val srcOwned = keyPairs.filter { case (s, _) =>
                srcM.schema.fieldNames.contains(s) }
              val chainKeys = keyPairs.diff(srcOwned)
              def prunedPrefix(small: DataFrame)
                  : (DataFrame, Map[String, DataFrame]) = {
                val aBase = if (srcOwned.isEmpty) aOld
                  else prunedByKeys(aOld, srcOwned, small)
                val m = scala.collection.mutable.Map.empty[String, DataFrame]
                joinHeads.take(i).foreach { case (jj, ov, _) =>
                  // a srcOwned key of this Δ whose source column is ALSO
                  // an earlier ANTI factor's key is a MERGED column: its
                  // values come from A.s OR jj's key column, so the anti
                  // factor prunes on its own key origin too — dropped
                  // rows' merged keys fall outside the Δ's key set, and
                  // the term's final join on those keys filters exactly
                  // there, so nothing a pruned row could contribute
                  // survives anyway (matched partners lose the match but
                  // their merged key is equally out-of-set)
                  val mergedOwned =
                    if (!jj.hasAntiSide) Seq.empty
                    else srcOwned.collect {
                      case (s2, k2) if jj.keys.contains(s2) =>
                        (jj.keys(s2), k2)
                    }
                  if (chainKeys.nonEmpty || mergedOwned.nonEmpty) {
                    val jjAbs = new java.io.File(jj.path).getAbsolutePath
                    val frame = spark.read.format("lance")
                      .option("versionAsOf", ov.toString).load(jj.path)
                    // ownership = the join's ATTRS (its own key columns
                    // drop from the namespace, never owning a later key)
                    val jjAttrs = frame.columns.toSet -- jj.keys.values
                    val owned = chainKeys.filter(p => jjAttrs.contains(p._1)) ++
                      mergedOwned
                    if (owned.nonEmpty)
                      m(jjAbs) = prunedByKeys(frame, owned, small)
                  }
                }
                (aBase, m.toMap)
              }
              val (aBase, pruned) = prunedPrefix(jFeed)
              // the Δ-image joins INNER even for a LEFT factor: unmatched
              // prefix rows contribute nothing to this term — their null
              // extension changes only when the match count crosses zero,
              // which the flip term below carries. Prefix through factor
              // i, then the tail through tailJoinNew: a tail factor keyed
              // on one of THIS factor's source key columns prunes from
              // the Δ feed's memoized sample (the term's rows passed the
              // inner join on that key, so their values ⊆ the feed's) —
              // previously those tail factors joined unpruned.
              val deltaPrefix = applyJoins(spark, aBase,
                versions.take(i + 1),
                images = pruned + (jAbs -> jFeed),
                howOverride = Map(jAbs -> "inner"))
              terms += tailJoinNew(deltaPrefix, i,
                proxy = j.keys.toSeq.map { case (s, k) =>
                  s -> ((jFeed: DataFrame), k) }.toMap,
                sampleRows = false)
              if (j.hasAntiSide) {
                // ---- join-side anti images: ΔJi ▷ A@old, null-extended.
                // Δ rows matching NO old-source row (or carrying a NULL
                // key component — those never match) enter/leave the
                // view's join-side-only rows under their own change
                // sign; the source-side count flips of THIS window's ΔA
                // were already handled against J@new above. The images
                // continue through the tail factors at @new (the ΔJi
                // version mapping: later factors @new), declared types.
                val kCols = keyPairs.map(_._2)
                val aKeys = prunedByKeys(aOld, srcOwned, jFeed)
                  .select(keyPairs.map { case (s, k) => q(s).as(k) }: _*)
                  .distinct()
                // left_anti keeps NULL-component keys (never equal) —
                // exactly the always-anti rows. proxy: the anti images'
                // merged source key columns carry THIS feed's key values
                // — tail pruning reuses the feed's memoized sample
                terms += tailJoinNew(
                  antiShape(jFeed.join(aKeys, kCols, "left_anti"), keyPairs), i,
                  proxy = keyPairs.map { case (s, k) =>
                    s -> ((jFeed: DataFrame), k) }.toMap)
              }
              if (j.joinType == "left" || j.joinType == "full") {
                // ---- LEFT zero-crossing flips over this window:
                //   P@old ⟕ Ji@new − P@old ⟕ Ji@old
                //     = P@old ⋈ ΔJi                  (the term above)
                //     + retract null-extension where cnt went 0 → >0
                //     + insert null-extension where cnt went >0 → 0
                // cnt@old needs no second snapshot: cnt@old = cnt@new −
                // net(ΔJi) per key. Keys with a NULL component never
                // match (and never null-flip a prefix row) — excluded.
                val kCols = keyPairs.map(_._2)
                val jNew = spark.read.format("lance")
                  .option("versionAsOf", jvN.toString).load(j.path)
                val flips = zeroCrossings(jFeed, kCols, jNew)
                  .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
                localFeeds += flips // released by the refresh-wide finally
                // no isEmpty probe — prunedPrefix's sample collect below
                // materializes the persisted flips, and an empty flips
                // frame contributes an empty term anyway
                val (fBase, fPruned) = prunedPrefix(flips)
                val prefix = applyJoins(spark, fBase,
                  joinHeads.take(i).map { case (jj, ov, _) => (jj, ov) },
                  images = fPruned)
                // rename the key columns before the join: a join keyed
                // name-on-name (okey = okey) would otherwise collide
                val fk = flips.select((kCols.zipWithIndex.map {
                  case (c, x) => q(c).as(s"_mv_fk$x") } :+ q("_mv_flip")): _*)
                val cond = keyPairs.zipWithIndex.map { case ((s, _), x) =>
                  prefix(s) === fk(s"_mv_fk$x") }.reduce(_ && _)
                var flipRows = prefix.join(fk, cond, "inner")
                  .drop(kCols.indices.map(x => s"_mv_fk$x"): _*)
                // null-extend THIS factor's attributes on the flip rows
                val keyVals = j.keys.values.toSet
                flipRows = jNew.schema.fields.filterNot(f => keyVals(f.name))
                  .foldLeft(flipRows)((df, f) =>
                    df.withColumn(f.name, lit(null).cast(f.dataType)))
                // tail factors at NEW versions via the shared helper,
                // each pruned by the keys the flip rows own (a nulled
                // chain key prunes the tail factor to empty — inner
                // drops, left null-extends: both exactly what the
                // unpruned join would do). proxy: flip rows' source
                // key values ARE the flip keys — the persisted flips
                // frame's memoized sample prunes the tail without
                // re-running the prefix⋈fk DAG for a fresh collect
                terms += tailJoinNew(flipRows, i,
                  proxy = keyPairs.map { case (s, k) =>
                    s -> ((flips: DataFrame), k) }.toMap)
                  .withColumn("_change_type",
                    when(q("_mv_flip") === -1L, lit("delete"))
                      .otherwise(lit("insert")))
                  .withColumn("_commit_version", lit(jvN))
                  .drop("_mv_flip")
              }
            }
          }
          val cols = terms.head.columns.toIndexedSeq
          terms.map(_.select(cols.map(q): _*)).reduce(_ unionByName _)
        }
      // star dims enrich each feed image exactly like the original row
      // (pinned snapshot — pure function), THEN the filtered view's WHERE
      // applies: images filter INDEPENDENTLY, so an update moving a row
      // across the predicate boundary nets to the right add/remove pair
      // enrich → WHERE → expression group keys, the create-time order:
      // every feed image keys exactly like the original row did
      val feed = withKeys(where.foldLeft(enrich(spark, feed0, dims))((df, w) =>
        df.filter(expr(w))), keys)
      val sign = when(col("_change_type").isin("insert", "update_postimage"), 1L)
        .otherwise(-1L)
      val srcSchema = srcM.schema
      // arg columns and types resolve against the ENRICHED feed (source +
      // dim columns + _change_type), the same namespace create validated —
      // resolving against the raw source schema would mis-route a plain
      // dim column name through expr() (dots would parse as field access)
      val types = argTypes(feed, aggs)
      val feedSchema = feed.schema
      def arg(a: AggSpec) = argCol(feedSchema, a.column)
      // min/max AND count_distinct share the removal posture: a removed
      // row may have been the extremum / a sketch can't un-merge a value
      val hasMinMax = aggs.exists(a =>
        a.func == "min" || a.func == "max" || a.func == "count_distinct")
      // min/max delta-apply fine under a REMOVAL-FREE window (insert-only
      // appends, pure-insert merges): extrema only grow — least/greatest
      // against the stored value. Only a removal can move them backwards,
      // and only then does the scoped-group rescan pay off. One cheap
      // existence probe over the feed decides.
      lazy val removalFree = feed
        .filter(col("_change_type").isin("delete", "update_preimage"))
        .isEmpty

      // ONE view snapshot serves the delta merge, the scoped-path column
      // list and the final alignment (three reads could straddle a
      // concurrent refresh: the CAS would still refuse, but the merge
      // would have been computed against one version and aligned against
      // another)
      val curView = spark.read.format("lance").load(viewPath)
      val deltaPath = !hasMinMax || removalFree
      val newStates: DataFrame = if (deltaPath) {
        // ---- delta: signed arithmetic over the feed, merged into state
        val deltaCols = Seq(sum(sign).as(s"_d$NCol")) ++ aggs.flatMap { a =>
          a.func match {
            case "count" if a.column == "*" => Seq.empty
            case "count" =>
              Seq(sum(when(arg(a).isNotNull, sign).otherwise(0L))
                .as(s"_d${cCol(a.alias)}"))
            case "min" => Seq(min(arg(a)).as(s"_dmm_${a.alias}"))
            case "max" => Seq(max(arg(a)).as(s"_dmm_${a.alias}"))
            case "count_distinct" =>
              // reachable only under a removal-free window (pure inserts):
              // the window's own sketch unions into the stored state below
              Seq(hll_sketch_agg(arg(a), lit(HllLgK)).as(s"_dh_${a.alias}"),
                sum(when(arg(a).isNotNull, sign).otherwise(0L))
                  .as(s"_d${cCol(a.alias)}"))
            case "sum" | "avg" =>
              val term = numKind(types(a.alias), a.column) match {
                case FloatKind =>
                  sum(when(arg(a).isNotNull,
                    arg(a).cast(DecimalType(18, a.scale)) * sign)
                    .otherwise(lit(0).cast(DecimalType(18, a.scale))))
                    .cast(DecimalType(38, a.scale))
                case DecKind(s) =>
                  // ±1 sign: the product is exact; widen to the state type
                  sum(when(arg(a).isNotNull,
                    (arg(a) * sign).cast(DecimalType(38, s)))
                    .otherwise(lit(0).cast(DecimalType(38, s))))
                    .cast(DecimalType(38, s))
                case LongKind =>
                  sum(when(arg(a).isNotNull, arg(a) * sign)
                    .otherwise(0L)).cast(LongType)
              }
              Seq(term.as(s"_d${sCol(a.alias)}"),
                sum(when(arg(a).isNotNull, sign).otherwise(0L))
                  .as(s"_d${cCol(a.alias)}"))
          }
        }
        val delta = feed
          .groupBy((groupBy.map(q) :+ gid(groupBy).as(GidCol)): _*)
          .agg(deltaCols.head, deltaCols.tail: _*)
          // a group whose feed rows cancel exactly (one -, one + with equal
          // values) still merges below to its unchanged state — harmless
        val cur = curView
        def zero(c: String, dt: DataType): Column = coalesce(q(c), lit(0).cast(dt))
        val curSchema = cur.schema
        var merged = delta.join(cur.drop(groupBy: _*), Seq(GidCol), "left")
          .withColumn(NCol, zero(NCol, LongType) + q(s"_d$NCol"))
        for (a <- aggs) a.func match {
          case "count" if a.column == "*" => ()
          case "count" =>
            merged = merged.withColumn(a.alias,
              coalesce(q(a.alias), lit(0L)) + q(s"_d${cCol(a.alias)}"))
          case "sum" | "avg" =>
            merged = merged
              .withColumn(sCol(a.alias),
                zero(sCol(a.alias), curSchema(sCol(a.alias)).dataType)
                  + q(s"_d${sCol(a.alias)}"))
              .withColumn(cCol(a.alias),
                zero(cCol(a.alias), LongType) + q(s"_d${cCol(a.alias)}"))
          case _ => ()
        }
        for (a <- aggs if a.func == "count" && a.column == "*")
          merged = merged.withColumn(a.alias, q(NCol))
        // removal-free window: sketches only UNION (merge never shrinks);
        // NULL on either side means "no values there yet"
        for (a <- aggs if a.func == "count_distinct")
          merged = merged
            .withColumn(hCol(a.alias),
              when(q(hCol(a.alias)).isNull, q(s"_dh_${a.alias}"))
                .when(q(s"_dh_${a.alias}").isNull, q(hCol(a.alias)))
                .otherwise(hll_union(q(hCol(a.alias)), q(s"_dh_${a.alias}"))))
            .withColumn(cCol(a.alias),
              zero(cCol(a.alias), LongType) + q(s"_d${cCol(a.alias)}"))
        // removal-free window: extrema merge monotonically (least/greatest
        // skip NULLs, so a new group or an all-null batch both behave)
        for (a <- aggs if a.func == "min" || a.func == "max")
          merged = merged.withColumn(a.alias,
            if (a.func == "min") least(q(a.alias), q(s"_dmm_${a.alias}"))
            else greatest(q(a.alias), q(s"_dmm_${a.alias}")))
        finalizeVisible(merged, aggs, types)
          .drop(merged.columns
            .filter(c => c.startsWith("_d_mv_") || c.startsWith("_dmm_") ||
              c.startsWith("_dh_"))
            .toIndexedSeq: _*)
      } else {
        // ---- groups: min/max can move on removal; recompute the affected
        // groups from the CURRENT source, scoped by the group surrogate
        val affected = feed
          .select((groupBy.map(q) :+ gid(groupBy).as(GidCol)): _*).distinct()
        val srcNow0 = spark.read.format("lance")
          .option("versionAsOf", vN.toString).load(source)
        // the semi-join keys on the COMPUTED gid, which no scan-side
        // pruning can see — so when the affected-group set is small
        // (the CDC norm), pre-filter on the RAW group columns too: those
        // predicates push into the scan, and manifest stats / buckets /
        // postings prune fragments before any read. Superset semantics
        // (per-column IN admits cross products); the semi-join stays the
        // exact filter. NULL group values ride an explicit isNull arm.
        // Dim-sourced group columns can't pre-filter the SOURCE scan —
        // they skip the push-down (the semi-join still scopes them); the
        // enrichment and WHERE apply after, on the pruned rows only.
        val cap = spark.conf.getOption("spark.graft.dml.inlistPrune")
          .map(_.toInt).getOrElse(1000)
        val sample = affected.limit(cap + 1).collect()
        val rawNames = srcSchema.fieldNames.toSet
        // a FULL/RIGHT view's recompute must join the UNFILTERED sides: a
        // source scan pre-filtered to the affected groups would make
        // every join row matching a filtered-out source row spuriously
        // "anti" (null-extended), and its merged key can land in an
        // affected group — the gid semi-join below stays the only
        // (exact) scope for those views
        val hasAnti = joinHeads.exists(_._1.hasAntiSide)
        val (preFiltered, preFilterApplied) =
          if (sample.length > cap || hasAnti) (srcNow0, false)
          else {
            val conds = groupBy.zipWithIndex.collect {
              case (c, i) if rawNames.contains(c) =>
                val vals = sample.map(_.get(i)).distinct.toSeq
                val nonNull = vals.filter(_ != null)
                val base = if (nonNull.isEmpty) lit(false)
                  else q(c).isin(nonNull: _*)
                if (vals.contains(null)) base || q(c).isNull else base
            }
            if (conds.isEmpty) (srcNow0, false)
            else (srcNow0.filter(conds.reduce(_ && _)), true)
          }
        // join factors prune to the join keys the PRE-FILTERED source
        // actually holds (prunedFactors' capped distinct-collect): a
        // min/max removal window on a 100 TB join view must not full-scan
        // the join table when the affected groups are few. ONLY when the
        // source pre-filter actually applied — distinct-collecting keys
        // off the FULL source is a scan that buys nothing. Chain-keyed
        // joins skip inside the helper; the recompute's join condition
        // stays the exact filter.
        val scopedJoins =
          if (preFilterApplied) prunedFactors(preFiltered)
          else Map.empty[String, DataFrame]
        val srcNow = where.foldLeft(enrich(spark,
          applyJoins(spark, preFiltered,
            joinHeads.map { case (j, _, nv) => (j, nv) }, scopedJoins),
          dims))(
          (df, w) => df.filter(expr(w)))
        // expression keys materialize before the gid (they can't pre-filter
        // the raw scan — the alias is not a source column — but the
        // semi-join scopes them exactly, the dim-column posture)
        val scoped = withKeys(srcNow, keys).withColumn(GidCol, gid(groupBy))
          .join(affected.select(GidCol), Seq(GidCol), "left_semi")
          .drop(GidCol)
        val recomputed = stateAgg(scoped, keys, aggs)
        // groups present in the feed but absent from the source died:
        // their state row carries _mv_n = 0 and applyChanges deletes it
        val curCols = curView.columns
        val dead = affected.join(recomputed.select(GidCol), Seq(GidCol), "left_anti")
        val deadStates = curCols.foldLeft(dead) { (df, c) =>
          if (df.columns.contains(c)) df
          else df.withColumn(c, lit(null))
        }.withColumn(NCol, lit(0L))
        recomputed.unionByName(deadStates.select(recomputed.columns.map(q): _*))
      }

      val viewSchema = curView.schema
      // persist: the guard below plus applyChanges' stats/prune/match/write
      // jobs would otherwise re-execute the whole feed+merge DAG each time
      val aligned = newStates.select(viewSchema.fieldNames.map(f =>
        q(f).cast(viewSchema(f).dataType).as(f)).toIndexedSeq: _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // CAS on the stored watermark: a concurrent refresh of the SAME
        // window (in-commit maintenance racing a manual refresh) fails
        // loud instead of double-applying through a pure-insert append.
        // The negative-count guard rides applyChanges' source-stats
        // aggregate (guide §1.2) — one job instead of a separate
        // filter+count pass over the merged state, still checked before
        // any commit.
        val res = Dml.applyChanges(spark, viewPath, aligned, Seq(GidCol),
          deleteWhen = q(NCol) === 0L,
          setProperties = Map(PropVersion -> vN.toString) ++
            (if (joins.isEmpty) Map.empty
             else encodeJoinProps(joinHeads.map { case (j, _, nv) => (j, nv) })),
          requireProperties = Map(PropVersion -> v0.toString) ++
            (if (joins.isEmpty) Map.empty
             else Map(PropJoins -> encodeJoins(joins))),
          guard = Some((q(NCol) < 0,
            s"negative group count after delta merge at $viewPath " +
              "- the feed and the stored state disagree (was the view " +
              "written to directly?); run fullRefresh")))
        RefreshResult(if (deltaPath) "delta" else "groups", v0, vN,
          res.rowsChanged + res.rowsInserted)
      } finally aligned.unpersist()
    } finally localFeeds.foreach(_.unpersist())
  }

  /** Full rebuild (vacuumed feed window, out-of-band writes to the view,
    * or a restored source): one source aggregation, one overwrite commit
    * carrying the new watermark. */
  def fullRefresh(spark: SparkSession, viewPath: String): RefreshResult = {
    val ViewSpec(source, keys, aggs, v0, where, dims, joins) =
      spec(spark, viewPath)
    val (sfs, sroot) = fsRoot(spark, source)
    val vN = LanceFormat.readLatest(sfs, sroot).get.version
    // star dims RE-PIN to their current versions: the rebuilt state and
    // the new pin PROPERTY land in ONE commit. The tag MOVES only after
    // that commit succeeds — a crash mid-rebuild leaves the old
    // state/pin/tag fully consistent (moving the tag first would strip
    // the vacuum protection off the version the stored spec still
    // names). The post-commit crash window (property=new, tag=old) is
    // benign: the new pin is the dim's HEAD, which any vacuum keeps.
    val viewAbs = new java.io.File(viewPath).getAbsolutePath
    val repinned = dims.map { case (d, _) =>
      val (dfs, droot) = fsRoot(spark, d.path)
      val dm = LanceFormat.readLatest(dfs, droot).getOrElse(
        throw new IllegalStateException(s"star dim vanished: ${d.path}"))
      requireBroadcastable(spark, d, dm) // a dim can outgrow its view
      d -> dm.version
    }
    // join tables advance to their current heads (watermarks, not pins)
    val joinsNow = joins.map { case (j, _) =>
      val (jfs, jroot) = fsRoot(spark, j.path)
      j -> LanceFormat.readLatest(jfs, jroot).getOrElse(
        throw new IllegalStateException(s"join table vanished: ${j.path}"))
        .version
    }
    val src0 = spark.read.format("lance")
      .option("versionAsOf", vN.toString).load(source)
    val src = where.foldLeft(
      enrich(spark, applyJoins(spark, src0, joinsNow), repinned))(
      (df, w) => df.filter(expr(w)))
    stateAgg(src, keys, aggs)
      .write.format("lance").mode("overwrite")
      .option("write.set-properties", LanceFormat.serializeProperties(
        Map(PropVersion -> vN.toString) ++
          (if (repinned.isEmpty) Map.empty
           else Map(PropDims -> encodeDims(repinned))) ++
          (if (joinsNow.isEmpty) Map.empty
           else encodeJoinProps(joinsNow))))
      .save(viewPath)
    repinned.foreach { case (d, v) =>
      graft.Lance.tag(spark, d.path, dimPinTag(viewAbs), Some(v), replace = true)
    }
    RefreshResult("full", v0, vN, -1L)
  }

  /** The view's visible face: group columns + aggregate columns, hidden
    * state dropped, and the registered HAVING predicate (if any)
    * applied. HAVING is a READ-TIME filter by design: the stored state
    * stays unfiltered, so the delta arithmetic never sees the predicate
    * — a group crossing the HAVING boundary needs no retract/re-extend
    * machinery, it simply starts (or stops) matching here. */
  def read(spark: SparkSession, viewPath: String): DataFrame = {
    val df = spark.read.format("lance").load(viewPath)
    // one extra manifest read per read() call (the load above resolved
    // its own); accepted — metadata-only, and caching it would risk
    // serving a stale predicate across a concurrent recreate
    val (vfs, vroot) = fsRoot(spark, viewPath)
    val having = LanceFormat.readLatest(vfs, vroot)
      .flatMap(_.properties).getOrElse(Map.empty).get(PropHaving)
    val visible = df.drop(df.columns.filter(_.startsWith("_mv_")).toIndexedSeq: _*)
    having.fold(visible)(h => visible.filter(expr(h)))
  }
}
