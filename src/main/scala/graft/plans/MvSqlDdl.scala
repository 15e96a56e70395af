package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StructType}

import graft.operators.MaterializedView
import graft.operators.MaterializedView.{AggSpec, DimSpec, JoinSpec}

/** `CREATE MATERIALIZED VIEW <table> AS SELECT ...` — the SQL spelling
  * of [[MaterializedView.create]]. Spark has no MATERIALIZED VIEW
  * grammar, so a delegating parser intercepts the statement prefix and
  * hands the SELECT to Spark's OWN parser (never a regex over the query
  * text); the resulting logical plan is translated into the
  * create() spec — group keys, aggregate specs, WHERE, fact joins
  * (INNER and LEFT, both change-fed) — and every shape the incremental
  * refresh cannot maintain is refused with a message naming the nearest
  * supported form. Star dims ride the hint channel (plain join syntax
  * cannot express "pin this side's version"): `SELECT /*+ MV_DIM(d) */
  * ... LEFT JOIN dim d ON ...` marks that join as a PINNED broadcast
  * dim — exactly `CALL create_mv(..., dims)`.
  *
  * Table references resolve like every other SQL surface here: a
  * `cat.db.t` identifier through the named [[graft.catalog.LanceCatalog]]
  * (the view is CREATED under that catalog's warehouse), or the
  * path-addressed form `lance`.`/abs/path`.
  */
object MvSqlDdl {
  private val DdlRe =
    """(?is)^\s*CREATE\s+MATERIALIZED\s+VIEW\s+(?:(IF\s+NOT\s+EXISTS)\s+)?(.+?)\s+AS\s+(SELECT\b[\s\S]*)$""".r
  private val DropRe =
    """(?is)^\s*DROP\s+MATERIALIZED\s+VIEW\s+(?:(IF\s+EXISTS)\s+)?(.+?)\s*$""".r
  private val RefreshRe =
    """(?is)^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+(?:(FULL)\s+)?(.+?)\s*$""".r

  /** Does the statement carry one of our prefixes? (Cheap gate so every
    * other statement goes straight to the delegate.) */
  def matches(sqlText: String): Boolean =
    sqlText != null && (DdlRe.pattern.matcher(sqlText).matches() ||
      DropRe.pattern.matcher(sqlText).matches() ||
      RefreshRe.pattern.matcher(sqlText).matches())

  def parse(session: SparkSession, delegate: ParserInterface,
      sqlText: String): LogicalPlan = sqlText match {
    case DdlRe(ifNotExists, viewIdent, select) =>
      val ident = delegate.parseMultipartIdentifier(viewIdent.trim)
      CreateMaterializedViewCommand(ident, delegate.parsePlan(select),
        ifNotExists != null)
    case DropRe(ifExists, viewIdent) =>
      DropMaterializedViewCommand(
        delegate.parseMultipartIdentifier(viewIdent.trim), ifExists != null)
    case RefreshRe(full, viewIdent) =>
      RefreshMaterializedViewCommand(
        delegate.parseMultipartIdentifier(viewIdent.trim), full != null)
    case _ => throw new IllegalArgumentException(
      "malformed MATERIALIZED VIEW statement (expected CREATE MATERIALIZED " +
        "VIEW <table> AS SELECT ..., DROP MATERIALIZED VIEW [IF EXISTS] " +
        "<table>, or REFRESH MATERIALIZED VIEW [FULL] <table>)")
  }

  private def refuse(what: String, nearest: String): Nothing =
    throw new IllegalArgumentException(
      s"CREATE MATERIALIZED VIEW: $what. Nearest supported form: $nearest")

  /** A multipart table reference → lance dataset path. `mode`:
    * "existing" (must be a dataset), "new" (must NOT be), "any" (no
    * check — DROP-style verbs that self-heal a missing target). */
  private[graft] def pathOf(session: SparkSession, parts: Seq[String],
      mode: String): String = parts match {
    case Seq("lance", p) if p.contains('/') &&
        // a catalog literally named "lance" wins over the path form
        !session.sessionState.catalogManager.isCatalogRegistered("lance") =>
      p
    case all if all.size >= 2 =>
      session.sessionState.catalogManager.catalog(all.head) match {
        case lc: graft.catalog.LanceCatalog =>
          val rest = all.tail.mkString(".")
          (mode match {
            case "new" => lc.resolveNewTableArg(rest)
            case "any" => lc.resolveAnyTableArg(rest)
            case _ => lc.resolveTableArg(rest)
          }).toString
        case other => refuse(
          s"table ${all.mkString(".")} lives in non-lance catalog " +
            s"'${all.head}' (${other.getClass.getSimpleName})",
          "a graft.catalog.LanceCatalog table (cat.db.t) or the " +
            "path form `lance`.`/abs/path`")
      }
    case _ => refuse(s"unqualified table '${parts.mkString(".")}'",
      "cat.db.t through a LanceCatalog, or `lance`.`/abs/path`")
  }

  /** Translate the parsed (UNRESOLVED) SELECT into the create() spec.
    * Returns (sourcePath, groupBy entries, aggs, where, joins, dims,
    * having). HAVING translates into a predicate over the view's OUTPUT
    * columns (aggregate calls rewrite to their selected aliases) and is
    * applied at READ time — the materialized state stays unfiltered, so
    * the delta refresh math never sees the predicate. */
  private[graft] def translate(session: SparkSession, plan: LogicalPlan)
      : (String, Seq[String], Seq[AggSpec], Option[String], Seq[JoinSpec],
        Seq[DimSpec], Option[String]) = {
    // ---- the MV_DIM hint channel: names joins that are PINNED star
    // dims rather than change-fed facts; any other hint is meaningless
    // in a STORED spec (there is no plan to hint) and refuses
    var dimNames = Set.empty[String]
    def stripHints(p: LogicalPlan): LogicalPlan = p match {
      case h: org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint
          if h.name.equalsIgnoreCase("MV_DIM") =>
        dimNames ++= h.parameters.collect {
          case a: UnresolvedAttribute => a.nameParts.last.toLowerCase }
        stripHints(h.child)
      case h: org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint =>
        refuse(s"hint ${h.name} (a stored view spec carries no plan hints)",
          "only MV_DIM(table) is meaningful here - it marks a LEFT JOIN " +
            "as a pinned star dim")
      case other => other
    }
    // ---- refuse un-maintainable STATEMENT shapes first, by name
    plan.foreach {
      case _: Sort | _: GlobalLimit | _: LocalLimit | _: Offset => refuse(
        "ORDER BY / LIMIT / OFFSET (a view stores state, not an order)",
        "create the view without them; order at read time")
      case _: Distinct => refuse("SELECT DISTINCT",
        "GROUP BY the selected columns (same rows, maintainable state)")
      case u: Union => refuse("UNION/set operations",
        "one view per branch, UNION at read time")
      case _ => ()
    }
    plan.foreach { node =>
      node.expressions.foreach { e =>
        e.foreach {
          case _: WindowExpression => refuse(
            "window functions (their value depends on OTHER rows, so no " +
              "per-row delta exists)",
            "plain aggregates — count/sum/min/max/avg/count(DISTINCT) " +
              "over GROUP BY; window on top of the view at read time")
          case _: SubqueryExpression => refuse(
            "subqueries (correlated or not) in the view definition",
            "a plain boolean WHERE over source/join columns; pre-join " +
              "the other table as a fact JOIN instead of IN/EXISTS")
          case _ => ()
        }
      }
    }

    // ---- the FROM tree: one relation, or left-deep INNER/LEFT equi-joins
    def strip(p: LogicalPlan): LogicalPlan = stripHints(p) match {
      case SubqueryAlias(_, child) => strip(child)
      case other => other
    }
    // the name the MV_DIM hint matches: the alias when present, else
    // the table's last identifier part
    def nameOf(p: LogicalPlan): Option[String] = stripHints(p) match {
      case SubqueryAlias(id, _) => Some(id.name.toLowerCase)
      case r: UnresolvedRelation =>
        Some(r.multipartIdentifier.last.toLowerCase)
      case _ => None
    }
    val dims = scala.collection.mutable.ArrayBuffer.empty[DimSpec]
    def relations(p: LogicalPlan): (Seq[String], Seq[JoinSpec]) =
      strip(p) match {
        case r: UnresolvedRelation =>
          (r.multipartIdentifier, Seq.empty)
        case Join(left, right, joinType, cond, _) =>
          val how = joinType match {
            case Inner => "inner"
            case LeftOuter => "left"
            case FullOuter => "full"
            case RightOuter => "right"
            case other => refuse(s"$other join",
              "INNER / LEFT / RIGHT / FULL JOIN with equality conditions " +
                "(both sides change-fed; FULL/RIGHT must be the FIRST " +
                "join factor, inner/left factors may follow)")
          }
          val (src, earlier) = relations(left)
          val rParts = strip(right) match {
            case rr: UnresolvedRelation => rr.multipartIdentifier
            case other => refuse(
              s"join right side is ${other.nodeName}, not a table",
              "JOIN a plain lance table (subqueries/derived tables " +
                "are not maintainable)")
          }
          val rPath = pathOf(session, rParts, "existing")
          val rFields = session.read.format("lance").load(rPath)
            .schema.fieldNames.toSet
          def conjuncts(e: Expression): Seq[Expression] = e match {
            case And(a, b) => conjuncts(a) ++ conjuncts(b)
            case other => Seq(other)
          }
          // the RIGHT side answers to its table name AND its alias
          val rIds = Set(rParts.last.toLowerCase) ++ nameOf(right)
          val keys = conjuncts(cond.getOrElse(refuse(
            "a JOIN without an ON condition",
            "JOIN ... ON left.k = right.k [AND ...]"))).map {
            case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute) =>
              val (an, bn) = (a.nameParts.last, b.nameParts.last)
              def qualifiedRight(x: UnresolvedAttribute) =
                x.nameParts.init.lastOption.exists(q => rIds(q.toLowerCase))
              // orient by membership in the RIGHT table's schema; a
              // column living on both sides needs the qualifier (table
              // name or alias, either works)
              (rFields.contains(bn), rFields.contains(an)) match {
                case (true, false) => an -> bn
                case (false, true) => bn -> an
                case (true, true) =>
                  if (qualifiedRight(a)) bn -> an
                  else if (qualifiedRight(b)) an -> bn
                  else refuse(s"ambiguous join key $an = $bn (both sides " +
                    "have both columns)",
                    "qualify one side with its table or alias")
                case (false, false) => refuse(
                  s"join condition $an = $bn names no column of " +
                    rParts.mkString("."),
                  "ON <left-or-earlier-join column> = <right column>")
              }
            case other => refuse(
              s"non-equality join condition ${other.sql}",
              "conjunctions of left.k = right.k equalities")
          }
          // finding: keys.toMap would silently DROP a duplicate
          // left-side column (ON a.k = b.k1 AND a.k = b.k2 must not
          // quietly become k = k2 alone)
          val dupLeft = keys.groupBy(_._1).collect {
            case (k, vs) if vs.size > 1 => k }
          if (dupLeft.nonEmpty) refuse(
            s"join key column(s) ${dupLeft.mkString(", ")} appear in " +
              "more than one ON equality",
            "one equality per left-side column (a.k = b.k1 AND " +
              "a.k = b.k2 is not an equi-join the view can key on)")
          if (nameOf(right).exists(dimNames.contains)) {
            if (how != "left") refuse(
              s"MV_DIM table ${rParts.mkString(".")} joined $how",
              "a star dim must LEFT JOIN (its snapshot is pinned and " +
                "unmatched fact rows keep their row)")
            dims += DimSpec(rPath, keys.toMap)
            (src, earlier)
          } else (src, earlier :+ JoinSpec(rPath, keys.toMap, how))
        case other => refuse(s"FROM shape ${other.nodeName}",
          "FROM <lance table> [INNER|LEFT|RIGHT|FULL JOIN <lance table> ON ...]")
      }

    // ---- the statement spine: [Having over] Aggregate over [Filter
    // over] FROM — the hint may wrap the WHOLE statement (SELECT
    // /*+ ... */ parses it above the Aggregate) or sit under it
    val (spine, havingCond) = stripHints(plan) match {
      case org.apache.spark.sql.catalyst.analysis
          .UnresolvedHaving(cond, child) => (stripHints(child), Some(cond))
      case other => (other, None)
    }
    val (agg, whereExpr, fromPlan) = spine match {
      case a @ Aggregate(_, _, child, _) => stripHints(child) match {
        case Filter(cond, from) => (a, Some(cond), from)
        case from => (a, None, from)
      }
      case Project(_, _) => refuse("a SELECT without GROUP BY",
        "SELECT <group cols>, <agg(col) AS alias>... GROUP BY <group cols>")
      case other => refuse(s"statement shape ${other.nodeName}",
        "SELECT <group cols>, <agg> FROM ... [WHERE ...] GROUP BY ...")
    }
    val (srcParts, joins) = relations(fromPlan)
    val srcPath = pathOf(session, srcParts, "existing")
    if (dimNames.size != dims.size) refuse(
      s"MV_DIM names ${dimNames.mkString(", ")} but only ${dims.size} " +
        "joined table(s) matched",
      "name the joined table (or its alias) exactly as it appears in " +
        "the FROM clause")

    // ---- select list → group columns + aggregate specs
    def exprSql(e: Expression): String = e match {
      case a: UnresolvedAttribute => a.nameParts.last
      case other => other.sql
    }
    // the CANONICAL spelling of every enriched-namespace column (source
    // + join attrs + dim attrs): Spark resolves names case-insensitively
    // but the stored spec is literal, so a select item spelled STATUS
    // over a column named status must canonicalize (and, when the
    // as-written output name differs, ride the expression-key form so
    // the view column is named exactly as the SELECT wrote it)
    val fieldCanon: Map[String, String] = {
      val srcFields = session.read.format("lance").load(srcPath)
        .schema.fieldNames.toSeq
      val joinAttrs = joins.flatMap { j =>
        session.read.format("lance").load(j.path).schema.fieldNames
          .filterNot(j.keys.values.toSet)
      }
      val dimAttrs = dims.flatMap { d =>
        session.read.format("lance").load(d.path).schema.fieldNames
          .filterNot(d.keys.values.toSet)
      }
      (srcFields ++ joinAttrs ++ dimAttrs).map(f => f.toLowerCase -> f).toMap
    }
    def canon(n: String): String = fieldCanon.getOrElse(n.toLowerCase, n)
    agg.groupingExpressions.foreach {
      // the parser emits UnresolvedOrdinal under groupByOrdinal (the
      // default); a plain Literal arrives when that conf is off
      case g if g.isInstanceOf[Literal] ||
          g.nodeName == "UnresolvedOrdinal" =>
        refuse("ordinal GROUP BY (GROUP BY 1)",
          "GROUP BY the column or expression itself")
      case c: BaseGroupingSets => refuse(
        s"${c.nodeName} grouping", "plain GROUP BY keys (one view per " +
          "rollup level; stack views for the pyramid)")
      case _ => ()
    }
    val groupSqls = agg.groupingExpressions.map(exprSql)
    val aggs = scala.collection.mutable.ArrayBuffer.empty[AggSpec]
    val groupEntries = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // plain column names match CASE-INSENSITIVELY (Spark's default
    // resolution); expression texts match exactly — case-folding an
    // EXPRESSION key would silently bind e.g. date_format(d,'mm')
    // (minute) to a GROUP BY date_format(d,'MM') (month) key, creating
    // a view whose key computes different semantics than the select item
    val groupIsAttr = agg.groupingExpressions
      .map(_.isInstanceOf[UnresolvedAttribute])
    def groupKeyOf(sql: String): Option[String] =
      groupSqls.find(_ == sql).orElse {
        groupSqls.zip(groupIsAttr).collectFirst {
          case (g, true) if g.equalsIgnoreCase(sql) => g
        }
      }
    def enterGroup(key: String, alias: String): Unit = {
      groupEntries.get(key).foreach { prev =>
        if (prev != alias) refuse(
          s"group expression '$key' is selected twice (as '$prev' and " +
            s"'$alias')", "select each group key once")
      }
      groupEntries(key) = alias
    }
    agg.aggregateExpressions.foreach {
      case a: UnresolvedAttribute =>
        val n = a.nameParts.last
        val key = groupKeyOf(n).getOrElse(refuse(
          s"select item '$n' is neither a GROUP BY column nor an " +
            "aliased aggregate", "add it to GROUP BY or aggregate it"))
        // output name = as written; source column = canonical spelling
        if (n == canon(n)) enterGroup(key, n)
        else enterGroup(key, s"${canon(n)} AS $n")
      case Alias(a: UnresolvedAttribute, name)
          if groupKeyOf(a.nameParts.last).isDefined =>
        // a RENAMED plain group column (`SELECT k AS alias ... GROUP BY
        // k`) rides the expression-key form: the view's column is the
        // alias, computed from the source column
        val key = groupKeyOf(a.nameParts.last).get
        if (name == canon(a.nameParts.last)) enterGroup(key, name)
        else enterGroup(key, s"${canon(a.nameParts.last)} AS $name")
      case Alias(e, name) if groupKeyOf(exprSql(e)).isDefined =>
        // expression group key (`date_format(d,'yyyy-MM') AS omonth`) —
        // matched FIRST: a scalar function here is a key, not an agg
        enterGroup(groupKeyOf(exprSql(e)).get, name)
      case Alias(f: UnresolvedFunction, name) =>
        val fn = f.nameParts.last.toLowerCase
        if (f.filter.isDefined) refuse("FILTER (WHERE ...) on an aggregate",
          "move the predicate into the view's WHERE, or a second view")
        val isStar = f.arguments.size == 1 &&
          f.arguments.head.isInstanceOf[UnresolvedStar]
        (fn, f.isDistinct) match {
          case ("count", true) if f.arguments.size == 1 && !isStar =>
            aggs += AggSpec("count_distinct", exprSql(f.arguments.head), name)
          case ("count", false) if isStar => aggs += AggSpec("count", "*", name)
          case ("count" | "sum" | "min" | "max" | "avg", false)
              if f.arguments.size == 1 =>
            aggs += AggSpec(fn, exprSql(f.arguments.head), name)
          case _ => refuse(s"aggregate ${f.nameParts.mkString(".")}" +
            s"(${if (f.isDistinct) "DISTINCT " else ""}...)",
            "count(*) | count(x) | sum(x) | min(x) | max(x) | avg(x) | " +
              "count(DISTINCT x) — x may be any scalar expression")
        }
      case Alias(e, name) => refuse(
        s"select item '${exprSql(e)} AS $name' is neither a GROUP BY " +
          "expression nor an aggregate",
        "repeat the exact expression in GROUP BY, or aggregate it")
      case star: UnresolvedStar => refuse("SELECT *",
        "name every output: group columns plus aliased aggregates")
      case other => refuse(s"select item '${exprSql(other)}' without an alias",
        "alias every aggregate/expression: agg(x) AS name")
    }
    val groupBy = groupSqls.map { g =>
      groupEntries.getOrElse(g,
        if (agg.groupingExpressions(groupSqls.indexOf(g))
            .isInstanceOf[UnresolvedAttribute]) g
        else refuse(s"GROUP BY expression '$g' is not selected",
          "select it with an alias: SELECT <expr> AS name ... GROUP BY <expr>"))
    }.zip(agg.groupingExpressions).map {
      // a renamed plain key already carries its "col AS alias" form
      case (entry, _: UnresolvedAttribute) => entry
      case (alias, e) => s"${exprSql(e)} AS $alias"
    }
    // ---- HAVING → a READ-TIME predicate over the view's OUTPUT
    // columns: aggregate calls rewrite to their selected aliases
    // (HAVING count(*) > 3 binds to n when count(*) AS n is selected),
    // group-key expressions to theirs, bare names must BE output
    // columns. The state stays unfiltered; refresh math is untouched.
    val having = havingCond.map { cond =>
      val groupAliases = groupEntries.values.toSeq
        .map(e => MaterializedView.parseGroupKey(e).alias)
      val outNames = groupAliases ++ aggs.map(_.alias)
      def outOf(n: String): Option[String] =
        outNames.find(_ == n).orElse(outNames.find(_.equalsIgnoreCase(n)))
      val rewritten = cond.transformDown {
        // a group-key EXPRESSION binds to its selected alias — checked
        // FIRST or a scalar-function key would read as an aggregate
        case e if !e.isInstanceOf[UnresolvedAttribute] &&
            groupKeyOf(exprSql(e)).isDefined =>
          UnresolvedAttribute.quoted(MaterializedView.parseGroupKey(
            groupEntries.getOrElse(groupKeyOf(exprSql(e)).get,
              refuse(s"HAVING references group expression " +
                s"'${exprSql(e)}' which is not selected",
                "select it with an alias and HAVING on the alias"))).alias)
        case f: UnresolvedFunction =>
          val fn = f.nameParts.last.toLowerCase
          val isStar = f.arguments.size == 1 &&
            f.arguments.head.isInstanceOf[UnresolvedStar]
          val spec = (fn, f.isDistinct) match {
            case ("count", true) if f.arguments.size == 1 && !isStar =>
              Some(("count_distinct", exprSql(f.arguments.head)))
            case ("count", false) if isStar => Some(("count", "*"))
            case ("count" | "sum" | "min" | "max" | "avg", false)
                if f.arguments.size == 1 =>
              Some((fn, exprSql(f.arguments.head)))
            case _ => None
          }
          spec.flatMap { case (func, c) =>
            val plainArg = f.arguments.headOption
              .exists(_.isInstanceOf[UnresolvedAttribute])
            aggs.find(a => a.func == func && (a.column == c ||
              (plainArg && a.column.equalsIgnoreCase(c))))
          }.map(a => UnresolvedAttribute.quoted(a.alias)).getOrElse(refuse(
            s"HAVING references ${f.nameParts.mkString(".")}(...) which " +
              "is not a selected aggregate",
            "select that aggregate with an alias (agg(x) AS name); " +
              "HAVING may then use either spelling"))
        case a: UnresolvedAttribute =>
          UnresolvedAttribute.quoted(outOf(a.nameParts.last).getOrElse(
            refuse(s"HAVING references '${a.nameParts.mkString(".")}' " +
              "which is not an output column of the view",
            "HAVING sees the view's OUTPUT: group aliases and aggregate " +
              "aliases (or the selected aggregate calls themselves)")))
      }
      rewritten.sql
    }
    (srcPath, groupBy, aggs.toSeq, whereExpr.map(_.sql), joins, dims.toSeq,
      having)
  }
}

/** The executable command the parser returns: translates + creates. */
case class CreateMaterializedViewCommand(viewIdent: Seq[String],
    select: LogicalPlan, ifNotExists: Boolean = false)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("source_version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    if (ifNotExists) {
      // the IF NOT EXISTS check is a read, not a reservation: two
      // concurrent creates still race in create() itself (one loses the
      // register CAS), exactly like the CALL surface
      val p = MvSqlDdl.pathOf(session, viewIdent, "any")
      val root = new org.apache.hadoop.fs.Path(p)
      if (graft.format.LanceFormat.isDataset(
          graft.format.LanceFormat.fileSystem(root,
            session.sessionState.newHadoopConf()), root))
        return Seq(Row(-1L)) // exists: no-op, the CREATE TABLE convention
    }
    val viewPath = MvSqlDdl.pathOf(session, viewIdent, "new")
    val (src, groupBy, aggs, where, joins, dims, having) =
      MvSqlDdl.translate(session, select)
    val v = MaterializedView.create(session, viewPath, src, groupBy, aggs,
      where, dims = dims, joins = joins, having = having)
    Seq(Row(v))
  }
}

/** `DROP MATERIALIZED VIEW [IF EXISTS] v` — unregisters from the source
  * and every join table, releases dim pins, deletes the view. */
case class DropMaterializedViewCommand(viewIdent: Seq[String],
    ifExists: Boolean) extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("dropped", org.apache.spark.sql.types.BooleanType,
      nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    // resolve WITHOUT an existence check: drop() self-heals a missing
    // view, and IF EXISTS must not throw on resolution either
    val path = MvSqlDdl.pathOf(session, viewIdent, "any")
    val dropped = MaterializedView.drop(session, path)
    if (!dropped && !ifExists) throw new IllegalArgumentException(
      s"no materialized view at ${viewIdent.mkString(".")}")
    Seq(Row(dropped))
  }
}

/** `REFRESH MATERIALIZED VIEW [FULL] v` — the CALL refresh_mv twin. */
case class RefreshMaterializedViewCommand(viewIdent: Seq[String],
    full: Boolean) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq(
    AttributeReference("mode", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("from_version", LongType, nullable = false)(),
    AttributeReference("to_version", LongType, nullable = false)(),
    AttributeReference("groups_changed", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val path = MvSqlDdl.pathOf(session, viewIdent, "existing")
    val r = if (full) MaterializedView.fullRefresh(session, path)
      else MaterializedView.refresh(session, path)
    Seq(Row(r.mode, r.fromVersion, r.toVersion, r.groupsChanged))
  }
}

/** Delegating parser: our three statements, everything else passes through. */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    if (MvSqlDdl.matches(sqlText)) MvSqlDdl.parse(session, delegate, sqlText)
    else delegate.parsePlan(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
