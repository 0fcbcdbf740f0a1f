package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, BinaryExpression, ExpectsInputTypes, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, Subtract, ZipWith}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Base of the STRICT vector-fold kernels: bit-faithful replacements for
  * the higher-order-function idiom
  * `aggregate(zip_with(a, b, (x,y) -> f(x,y)), 0D, (s,v) -> s+v)`.
  *
  * Unlike [[DotProduct]]/[[SqDist]] (total functions that skip null
  * elements and min-length truncate — the right call when the engine
  * authors the expression over schema-guaranteed vectors), these
  * reproduce the lambda form's null algebra exactly, which is what makes
  * [[VectorKernelRule]] a sound rewrite for ARBITRARY user expressions:
  *
  *   - either array null          → null (both forms)
  *   - length mismatch            → null (zip_with pads with nulls, the
  *                                  padded product is null, the sum
  *                                  null-poisons)
  *   - any null element           → null (same poisoning)
  *   - otherwise                  → left-to-right sum, bit-identical
  *
  * Left-to-right accumulation matches the lambda fold and the DuckDB
  * oracle's `list_sum(list_transform(...))`.
  */
abstract class StrictVectorFold extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  /** Can return null even for non-null inputs (mismatch / null element). */
  override def nullable: Boolean = true

  protected def combine(x: Double, y: Double): Double

  /** Java source for one combined term, given element accessors. */
  protected def combineCode(x: String, y: String): String

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += combine(x.getDouble(i), y.getDouble(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |    } else {
         |      $s += ${combineCode(s"$a.getDouble($i)", s"$b.getDouble($i)")};
         |    }
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
}

/** Strict dot product — the rewrite target for the HOF `x * y` fold. */
case class DotProductStrict(left: Expression, right: Expression)
  extends StrictVectorFold {
  override def prettyName: String = "graft_dot_strict"
  override protected def combine(x: Double, y: Double): Double = x * y
  override protected def combineCode(x: String, y: String): String = s"$x * $y"
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): DotProductStrict =
    copy(left = newLeft, right = newRight)
}

/** Strict squared L2 distance — the rewrite target for `(x−y)*(x−y)`. */
case class SqDistStrict(left: Expression, right: Expression)
  extends StrictVectorFold {
  override def prettyName: String = "graft_sqdist_strict"
  override protected def combine(x: Double, y: Double): Double = {
    val d = x - y; d * d
  }
  override protected def combineCode(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): SqDistStrict =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: auto-vectorize the portable higher-order-function
  * dot-product / squared-distance idioms into the strict codegen kernels.
  *
  * Higher-order functions never enter whole-stage codegen — each row pays
  * an intermediate array allocation plus two interpreted lambdas (measured
  * 2-5× on the similarity family when the kernels replaced the HOF forms
  * by hand in r4/r5). This rule does that substitution inside Catalyst,
  * so SQL users writing the composable idiom get the kernel for free:
  *
  *   aggregate(zip_with(a, b, (x,y) -> x*y),         0D, (s,v) -> s+v)
  *   aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0D, (s,v) -> s+v)
  *
  * The match is deliberately narrow: zero literal 0D, merge `(s,v) ->
  * s+v` over exactly the lambda's own variables (exprId-checked, so a
  * closure over an outer lambda's variable never matches), identity
  * finish, both inputs array<double>. The rewrite targets are the STRICT
  * kernels, which reproduce the lambda form's null/length algebra — the
  * rule is semantics-preserving on every input, not just schema-clean
  * embeddings ([[StrictVectorFold]]).
  *
  * Runs in the user-provided-optimizer batch (after constant folding), so
  * literal-only expressions are already folded away and the rule only
  * sees row-dependent vectors. Injected by [[GraftExtensions]]; also
  * installable per-session via `spark.experimental.extraOptimizations`.
  */
object VectorKernelRule extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isZeroD(e: Expression): Boolean = e match {
    case Literal(v, DoubleType) => v == 0.0
    case _ => false
  }

  /** merge is `(s, v) -> s + v` over its own two parameters, in order. */
  private def isSumMerge(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(p1: NamedLambdaVariable, p2: NamedLambdaVariable), _) =>
      l.exprId == p1.exprId && r.exprId == p2.exprId
    case _ => false
  }

  /** finish is the identity lambda `s -> s`. */
  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(p: NamedLambdaVariable), _) =>
      v.exprId == p.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(
          Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
          Seq(p1: NamedLambdaVariable, p2: NamedLambdaVariable), _)),
        zero, merge, finish)
        if x.exprId == p1.exprId && y.exprId == p2.exprId &&
          isDoubleArray(a) && isDoubleArray(b) &&
          isZeroD(zero) && isSumMerge(merge) && isIdentity(finish) =>
      DotProductStrict(a, b)

    case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(
          Multiply(
            Subtract(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
            Subtract(x2: NamedLambdaVariable, y2: NamedLambdaVariable, _), _),
          Seq(p1: NamedLambdaVariable, p2: NamedLambdaVariable), _)),
        zero, merge, finish)
        if x1.exprId == p1.exprId && y1.exprId == p2.exprId &&
          x2.exprId == p1.exprId && y2.exprId == p2.exprId &&
          isDoubleArray(a) && isDoubleArray(b) &&
          isZeroD(zero) && isSumMerge(merge) && isIdentity(finish) =>
      SqDistStrict(a, b)
  }
}
