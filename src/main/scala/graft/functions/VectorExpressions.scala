package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native distance expressions over `ARRAY<FLOAT|DOUBLE>` vector columns.
  *
  * Re-expresses the reference's distance surface
  * (`LanceVectorSearch.java:274-285`, metric enum
  * `config/LanceOptions.java:323-346`) as codegen'd Catalyst expressions:
  * the hot loop compiles into whole-stage codegen instead of a boxed Scala
  * UDF, which is the difference between scanning 100 TB of embeddings at
  * memory bandwidth and at allocation speed.
  *
  * All accumulation is double, element-by-element left-to-right, so results
  * are bit-deterministic and reproducible by any engine that does the same
  * (the DuckDB oracle mirrors this with `list_sum(list_transform(...))`
  * over `DOUBLE`-cast lists).
  */
abstract class VectorDistanceExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  /** Whether either array type admits null elements; a null element makes
    * the whole distance NULL (SQL semantics — reading the slot as 0.0
    * would silently corrupt rankings). Checks are only emitted when the
    * type requires them, so tight non-null arrays keep the branch-free
    * loop.
    */
  protected lazy val elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })

  override def nullable: Boolean = left.nullable || right.nullable || elementsNullable

  /** Interpreted-path guard: true iff any element in range is null. */
  protected def anyNullElement(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Boolean = {
    if (!elementsNullable) return false
    var i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i) || b.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Codegen guard emitted at the top of the accumulation loop. */
  protected def nullElemCheck(a: String, b: String, i: String, hasNull: String): String =
    if (elementsNullable)
      s"if ($a.isNullAt($i) || $b.isNullAt($i)) { $hasNull = true; break; }"
    else ""

  /** hasNull declaration — empty when elements cannot be null, so the
    * non-nullable codegen path (where `ev.isNull` is never declared)
    * compiles cleanly and keeps the branch-free loop.
    */
  protected def declHasNull(hasNull: String): String =
    if (elementsNullable) s"boolean $hasNull = false;" else ""

  /** Wraps the result assignment in the null-propagation branch only when
    * a null element is possible (elementsNullable implies nullable, so
    * `ev.isNull` is declared exactly when referenced).
    */
  protected def finishCode(hasNull: String, isNull: String, assign: String): String =
    if (elementsNullable) s"if ($hasNull) { $isNull = true; } else { $assign }"
    else assign

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
      if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  protected def elemGetter(e: Expression): (ArrayData, Int) => Double =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => (a, i) => a.getFloat(i).toDouble
      case _ => (a, i) => a.getDouble(i)
    }

  /** Java source for reading element i of an ArrayData as double. */
  protected def elemCode(e: Expression, arr: String, i: String): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }

  protected def checkDims(n: Int, m: Int): Unit =
    if (n != m) throw new IllegalArgumentException(
      s"$prettyName: vector dimensions differ ($n vs $m)")
}

/** dot(a, b) = Σ a_i * b_i (double). */
case class DotProduct(left: Expression, right: Expression)
  extends VectorDistanceExpression {
  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    checkDims(a.numElements(), b.numElements())
    if (anyNullElement(a, b)) return null
    val (ga, gb) = (elemGetter(left), elemGetter(right))
    var acc = 0.0
    var i = 0
    while (i < a.numElements()) { acc += ga(a, i) * gb(b, i); i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val hasNull = ctx.freshName("hasNull")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException("dot_product: vector dimensions differ ("
         |    + $a.numElements() + " vs " + $b.numElements() + ")");
         |}
         |double $acc = 0.0;
         |${declHasNull(hasNull)}
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  ${nullElemCheck(a, b, i, hasNull)}
         |  $acc += (${elemCode(left, a, i)}) * (${elemCode(right, b, i)});
         |}
         |${finishCode(hasNull, ev.isNull.toString, s"${ev.value} = $acc;")}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** l2(a, b) = sqrt(Σ (a_i - b_i)^2) — Euclidean distance. */
case class L2Distance(left: Expression, right: Expression)
  extends VectorDistanceExpression {
  override def prettyName: String = "l2_distance"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    checkDims(a.numElements(), b.numElements())
    if (anyNullElement(a, b)) return null
    val (ga, gb) = (elemGetter(left), elemGetter(right))
    var acc = 0.0
    var i = 0
    while (i < a.numElements()) {
      val d = ga(a, i) - gb(b, i); acc += d * d; i += 1
    }
    math.sqrt(acc)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val hasNull = ctx.freshName("hasNull")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException("l2_distance: vector dimensions differ ("
         |    + $a.numElements() + " vs " + $b.numElements() + ")");
         |}
         |double $acc = 0.0;
         |${declHasNull(hasNull)}
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  ${nullElemCheck(a, b, i, hasNull)}
         |  double $d = (${elemCode(left, a, i)}) - (${elemCode(right, b, i)});
         |  $acc += $d * $d;
         |}
         |${finishCode(hasNull, ev.isNull.toString,
             s"${ev.value} = java.lang.Math.sqrt($acc);")}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = 1 - Σab / (sqrt(Σa²) * sqrt(Σb²)); zero-norm → 1.0. */
case class CosineDistance(left: Expression, right: Expression)
  extends VectorDistanceExpression {
  override def prettyName: String = "cosine_distance"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    checkDims(a.numElements(), b.numElements())
    if (anyNullElement(a, b)) return null
    val (ga, gb) = (elemGetter(left), elemGetter(right))
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.numElements()) {
      val x = ga(a, i); val y = gb(b, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 1.0
    else 1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val hasNull = ctx.freshName("hasNull")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException("cosine_distance: vector dimensions differ ("
         |    + $a.numElements() + " vs " + $b.numElements() + ")");
         |}
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |${declHasNull(hasNull)}
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  ${nullElemCheck(a, b, i, hasNull)}
         |  double $x = ${elemCode(left, a, i)};
         |  double $y = ${elemCode(right, b, i)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${finishCode(hasNull, ev.isNull.toString,
             s"${ev.value} = ($na == 0.0 || $nb == 0.0) " +
               s"? 1.0 : 1.0 - $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));")}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-level API + SQL registration for the vector functions. */
object VectorFunctions {
  import org.apache.spark.sql.graftshim.Shims.{toColumn, toExpression}

  def dot_product(a: Column, b: Column): Column =
    toColumn(DotProduct(toExpression(a), toExpression(b)))
  def l2_distance(a: Column, b: Column): Column =
    toColumn(L2Distance(toExpression(a), toExpression(b)))
  def cosine_distance(a: Column, b: Column): Column =
    toColumn(CosineDistance(toExpression(a), toExpression(b)))

  /** similarity = 1/(1+distance) — reference LanceVectorSearch.java:420-426. */
  def similarity(distance: Column): Column =
    org.apache.spark.sql.functions.lit(1.0) / (org.apache.spark.sql.functions.lit(1.0) + distance)

  /** Register `l2_distance`/`cosine_distance`/`dot_product` for SQL use. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("l2_distance", es => L2Distance(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_distance", es => CosineDistance(es.head, es(1)), "scala_udf")
  }

  /** Query-vector validation — reference LanceVectorSearch.java:258-269. */
  def validateQueryVector(v: Array[Float]): Unit = {
    require(v != null && v.nonEmpty, "query vector must be non-empty")
    require(v.forall(x => !x.isNaN && !x.isInfinite),
      "query vector must not contain NaN or Infinity")
  }
}
