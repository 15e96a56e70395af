package graft.plans

import graft.connector.LanceTable
import graft.functions.{CosineDistance, DotProduct, L2Distance}
import graft.index.IvfIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Opt-in ANN rewrite (SURVEY §7.3 "optional custom rule ... rewrite
  * distance-orderBy-limit into index probe"): when
  * `spark.graft.ann.useIndex=true` and an IVF index exists for the scanned
  * column, a plan of the shape
  *
  * {{{ limit k ← sort _distance asc ← project [*, l2_distance(col, q) as
  *     _distance] ← lance scan }}}
  *
  * is replaced by the index probe (bucket-pruned scan of `nprobes`
  * partitions — `spark.graft.ann.nprobes`, default 20). This is exactly
  * the decision the reference delegates to Lance-Rust (`Query.useIndex`,
  * `LanceVectorSearch.java:146-163`), surfaced as a Catalyst rule:
  * results become approximate (top-k within probed buckets) and come from
  * the index-build-time snapshot — rows appended after the build are not
  * probed (checkFreshness warns) — which is why it is opt-in per session. The substituted subtree is re-aliased onto
  * the original output attribute ids, and downstream batches (pushdown,
  * AQE) optimize it like any other scan.
  */
class AnnIndexRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.ann.useIndex").exists(_.toBoolean)

  private def nprobes: Int =
    spark.conf.getOption("spark.graft.ann.nprobes").map(_.toInt).getOrElse(20)

  /** An index is usable by THIS rule only when it exists, loads (loadMeta
    * rejects stale assignment versions), and was built for the SAME metric
    * the query sorts by — IvfIndex.search fails loud on a metric mismatch
    * rather than degrade, and an optimizer rule must skip, not throw.
    */
  private def usableIndex(path: String, column: String, metric: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(
      s"${IvfIndex.indexPath(path, column)}/index.json")
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p) &&
      scala.util.Try(IvfIndex.loadMeta(spark, path, column))
        .toOption.exists(_.metric.equalsIgnoreCase(metric))
  }

  /** Never answer a historical query from the index over current data:
    * time-traveled relations keep the exact scan.
    */
  private def relRewritable(rel: DataSourceV2Relation): Boolean =
    rel.table.isInstanceOf[LanceTable] &&
      rel.table.asInstanceOf[LanceTable].pinned.isEmpty &&
      rel.table.asInstanceOf[LanceTable].pinnedBranchName.isEmpty &&
      Option(rel.options).forall(o => o.get("versionAsOf") == null &&
        o.get("timestampAsOf") == null && o.get("tagAsOf") == null &&
        o.get("branch") == null)

  /** Filtered probes EXECUTE at plan time (the widening loop needs row
    * counts; the k result rows substitute as a LocalRelation) — so every
    * re-analysis / explain / re-optimization of the same plan would
    * re-run the probe's Spark jobs. Memoize the analyzed LocalRelation
    * per (path, column, metric, query, k, nprobes, filterSql), keyed
    * additionally on the dataset's CURRENT committed version so an
    * append/DML between optimizations can never serve a stale probe
    * (version lookup is one manifest-listing read, no job). Bounded LRU;
    * k rows per entry by construction.
    */
  private val probeCache =
    new java.util.LinkedHashMap[(String, Long), LogicalPlan](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long), LogicalPlan]): Boolean = size > 32
    }

  private def datasetVersion(path: String): Long = {
    val root = new org.apache.hadoop.fs.Path(path)
    scala.util.Try(graft.format.LanceFormat.readLatest(
        graft.format.LanceFormat.fileSystem(root, spark.sessionState.newHadoopConf()),
        root)).toOption.flatten.map(_.version).getOrElse(-1L)
  }

  /** Serve a FRESH-exprId copy per substitution site: the cached plan is
    * a LocalRelation (MultiInstanceRelation), and handing the same
    * instance to two rewrite sites in one query (self-join / UNION of the
    * same probe) would plant duplicate attribute ids AFTER analysis-time
    * dedup already ran. */
  private def fresh(p: LogicalPlan): LogicalPlan = p match {
    case m: org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation =>
      m.newInstance()
    case other => other
  }

  private def memoized(key: String, path: String)(
      compute: => Option[LogicalPlan]): Option[LogicalPlan] = {
    val vkey = (key, datasetVersion(path))
    probeCache.synchronized(Option(probeCache.get(vkey))).map(fresh).orElse {
      val r = compute
      r.foreach(p => probeCache.synchronized(probeCache.put(vkey, p)))
      r
    }
  }

  private def literalVec(l: Literal): Option[Array[Float]] = l.dataType match {
    case ArrayType(DoubleType, _) =>
      val a = l.value.asInstanceOf[ArrayData]
      Some(Array.tabulate(a.numElements())(i => a.getDouble(i).toFloat))
    case ArrayType(FloatType, _) =>
      val a = l.value.asInstanceOf[ArrayData]
      Some(Array.tabulate(a.numElements())(i => a.getFloat(i)))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformDown {
      case gl @ GlobalLimit(Literal(k: Int, _),
          LocalLimit(_, Sort(Seq(order), true,
            Project(projList, projChild), _)))
          // with or without a pre-filter between projection and scan: a
          // `df.filter(pred)` before knnSearch sits as Filter(cond, rel),
          // and the rewrite forwards cond as the probe's pre-filter (the
          // V3 semantics — evaluated inside probed buckets, with the
          // search's loud widening on shortfall). NOTE the filtered probe
          // runs AT PLAN TIME (widening needs the row count) and
          // substitutes its k rows as a LocalRelation — one job either
          // way, but it executes during optimization, not execution.
          if (projChild match {
            case rel: DataSourceV2Relation => relRewritable(rel)
            case Filter(c, rel: DataSourceV2Relation) =>
              relRewritable(rel) && c.deterministic &&
                c.find(_.isInstanceOf[PlanExpression[_]]).isEmpty
            case _ => false
          }) =>
        val (rel, cond) = projChild match {
          case r: DataSourceV2Relation => (r, None)
          case Filter(c, r: DataSourceV2Relation) => (r, Some(c))
          case _ => throw new IllegalStateException("unreachable: guarded above")
        }
        val rewritten = for {
          sortAttr <- order.child match {
            case a: AttributeReference => Some(a)
            case _ => None
          }
          // Dot is MIPS and appears in two shapes: the API's ascending
          // sort on -dot (knnSearch emits UnaryMinus(DotProduct) as
          // _distance) and SQL's `ORDER BY dot_product(...) DESC` on the
          // raw dot — the latter needs the probe's _distance (= -dot)
          // negated back in the substituted projection.
          (vecCol, qvec, metric, negated) <- projList.collectFirst {
            case al @ Alias(L2Distance(v: AttributeReference, lit: Literal), _)
                if al.exprId == sortAttr.exprId && order.direction == Ascending =>
              (v, lit, "l2", false)
            case al @ Alias(CosineDistance(v: AttributeReference, lit: Literal), _)
                if al.exprId == sortAttr.exprId && order.direction == Ascending =>
              (v, lit, "cosine", false)
            case al @ Alias(UnaryMinus(DotProduct(v: AttributeReference, lit: Literal), _), _)
                if al.exprId == sortAttr.exprId && order.direction == Ascending =>
              (v, lit, "dot", false)
            case al @ Alias(DotProduct(v: AttributeReference, lit: Literal), _)
                if al.exprId == sortAttr.exprId && order.direction == Descending =>
              (v, lit, "dot", true)
          }
          q <- literalVec(qvec)
          path = rel.table.asInstanceOf[LanceTable].rootStr
          if usableIndex(path, vecCol.name, metric)
          // the pre-filter crosses into the probe as re-parsed SQL text
          // (attribute ids don't survive into the new subtree; names do —
          // the bucket sidecar stores every table column). Any filter the
          // probe can't express resolves to None and the rewrite is
          // skipped rather than risked.
          filterCol <- cond match {
            case None => Some(None)
            case Some(c) => scala.util.Try(
              org.apache.spark.sql.functions.expr(c.sql)).toOption.map(Some(_))
          }
          probe <- cond match {
            case None =>
              // unfiltered probe substitutes a LAZY bucket-pruned plan —
              // no job at plan time, nothing to memoize
              scala.util.Try(IvfIndex.search(spark, path, vecCol.name,
                q, k, nprobes = nprobes, metric = metric)
                .queryExecution.analyzed).toOption
            case Some(c) =>
              memoized(s"$path|${vecCol.name}|$metric|${q.mkString(",")}|" +
                  s"$k|$nprobes|${c.sql}", path) {
                scala.util.Try(IvfIndex.search(spark, path, vecCol.name,
                  q, k, nprobes = nprobes, metric = metric, filter = filterCol)
                  .queryExecution.analyzed).toOption
              }
          }
          // every projected column must exist in the probe output (the
          // bucket sidecar stores all table columns + _distance); the
          // descending-dot sort column maps to -(_distance), all other
          // columns by name
          mapped = gl.output.map { o =>
            if (negated && o.exprId == sortAttr.exprId)
              probe.output.find(_.name == "_distance")
                .map(n => o -> (UnaryMinus(n): Expression))
            else probe.output.find(_.name == o.name)
              .map(n => o -> (n: Expression))
          }
          if mapped.forall(_.isDefined)
        } yield Project(mapped.flatten.map { case (o, n) =>
          Alias(n, o.name)(exprId = o.exprId)
        }, probe)
        rewritten.getOrElse(gl)
    }
  }
}
