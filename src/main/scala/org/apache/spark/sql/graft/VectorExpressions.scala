package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_dot(a, b)` — native dot product of two array<double>.
  *
  * The composable alternative — `aggregate(zip_with(a, b, (x,y) -> x*y),
  * 0D, (s,v) -> s+v)` — allocates an intermediate array and evaluates two
  * interpreted lambdas per element (higher-order functions never enter
  * whole-stage codegen). This expression generates a tight primitive loop
  * instead: no allocation, no virtual calls — the hot kernel of every
  * cosine/similarity operator at 100 TB.
  *
  * Summation order is left-to-right, exactly matching the lambda form and
  * the DuckDB oracle's `list_sum(list_transform(...))`, so results stay
  * bit-identical and oracle SQL is unchanged.
  *
  * Null semantics: null if either array is null (BinaryExpression default);
  * null elements contribute 0.0, keeping the expression total.
  *
  * Lives under `org.apache.spark.sql.graft` because `AbstractDataType` /
  * expression internals are `private[sql]` in Spark 4 — the standard
  * packaging for engine-native extension expressions.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        s += x.getDouble(i) * y.getDouble(i)
      }
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
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** `graft_sqdist(a, b)` — native squared L2 distance of two
  * array<double>: Σ (a[i]−b[i])², accumulated left-to-right — exactly the
  * order of the composable `aggregate(zip_with(a, b, (x,y) ->
  * (x−y)*(x−y)), 0D, (s,v) -> s+v)` and of the DuckDB oracle's
  * `list_sum(list_transform(...))`, so results stay bit-identical while
  * replacing two interpreted lambdas + an intermediate array per row with
  * a tight primitive loop. The hot kernel of PQ codebook training (e07/
  * e11) and Lloyd assignment (e10), where it runs corpus×K times per
  * round. Null semantics match [[DotProduct]]: null if either array is
  * null; null ELEMENTS contribute 0 (total function, one bad element
  * degrades rather than poisons — embeddings are null-free by schema, the
  * domain VectorExpressionsSpec pins equivalence on). */
case class SqDist(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_sqdist"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val d = x.getDouble(i) - y.getDouble(i)
        s += d * d
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $s += $d * $d;
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): SqDist =
    copy(left = newLeft, right = newRight)
}

/** `graft_lsh_sig(v, lo, hi)` — random-hyperplane LSH signature of an
  * array<double>: bit j (MSB-first over planes lo..hi) is set iff
  * dot(v, plane_j) ≥ 0, where plane_j[i] = LCG(j·64 + i)/2³¹ − 0.5 (the
  * same deterministic LCG family the engine uses everywhere).
  *
  * The composable form — nested `aggregate(transform(sequence(...)))`
  * lambdas — evaluates (hi−lo+1)·64 interpreted closures and allocates a
  * plane array per row (higher-order functions never enter whole-stage
  * codegen). This expression generates two tight primitive loops instead:
  * the scan-side kernel of LSH bucketing at 100 TB. Accumulation order
  * (per-plane left-to-right sum, then acc·2+bit) matches the lambda form
  * exactly, so bucket values are bit-identical FOR NULL-FREE EMBEDDINGS
  * (VectorExpressionsSpec pins the equivalence on that domain — which is
  * all the testdata, where embedding elements are non-null by schema).
  * Intentional divergence on arrays containing null elements: this kernel
  * skips null elements (they contribute 0 to the dot product) so one bad
  * element degrades rather than destroys the signature, while the lambda
  * form null-poisons the whole product (zip_with → null → sum null →
  * CASE false → bit 0).
  */
case class LshSignature(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), IntegerType, IntegerType)

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_lsh_sig"

  override protected def nullSafeEval(v: Any, loAny: Any, hiAny: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val lo = loAny.asInstanceOf[Int]
    val hi = hiAny.asInstanceOf[Int]
    val n = x.numElements()
    var acc = 0L
    var j = lo
    while (j <= hi) {
      var s = 0.0
      var i = 0
      while (i < n) {
        if (!x.isNullAt(i)) {
          val h = ((j.toLong * 64 + i) * 1103515245L + 12345L) % 2147483648L
          s += x.getDouble(i) * (h.toDouble / 2147483648.0 - 0.5)
        }
        i += 1
      }
      acc = acc * 2 + (if (s >= 0.0) 1L else 0L)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, lo, hi) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $v.numElements();
         |long $acc = 0L;
         |for (int $j = $lo; $j <= $hi; $j++) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$v.isNullAt($i)) {
         |      long $h = (((long) $j * 64 + $i) * 1103515245L + 12345L) % 2147483648L;
         |      $s += $v.getDouble($i) * (((double) $h) / 2147483648.0 - 0.5);
         |    }
         |  }
         |  $acc = $acc * 2 + ($s >= 0.0 ? 1L : 0L);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
    newFirst: Expression, newSecond: Expression, newThird: Expression): LshSignature =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Static kernel shared by [[PolyHash]]'s interpreted and generated
  * paths (a plain top-level object gets Java static forwarders, which
  * keeps the janino codegen a single static call). */
object GraftHash {
  /** (((0·31+c₁)·31+c₂)…) % 1000000007 over the string's codepoints —
    * exactly the `aggregate(transform(sequence(…), ascii(substr(…))))`
    * fold (Spark `ascii`/DuckDB `ascii` = codepoint; identical for the
    * BMP text this corpus contains). */
  def poly(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  /** Content-defined-chunking bounds (x06): [0, cuts…, n] over CODEPOINT
    * positions, where 1-based position i (4 ≤ i < n) is a cut iff the
    * 4-codepoint window ending at i satisfies
    * (cp(i−3)·29791 + cp(i−2)·961 + cp(i−1)·31 + cp(i)) % mask == 0 —
    * exactly the `filter(sequence(4, length(text)), i -> i < length(text)
    * AND …ascii(substr(…))…)` lambda and DuckDB's `list_filter(range(4,
    * length(text)), …)` (SQL length/substr/ascii all count codepoints). */
  def cdcBounds(s: UTF8String, mask: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    val out = new scala.collection.mutable.ArrayBuffer[Int](n / 32 + 2)
    out += 0
    var i = 4
    while (i < n) {
      val h = cps(i - 4) * 29791 + cps(i - 3) * 961 + cps(i - 2) * 31 + cps(i - 1)
      if (h % mask == 0) out += i
      i += 1
    }
    out += n
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** `graft_poly_hash(s)` — the d06 rolling polynomial document fingerprint
  * as a native expression. The composable form materializes a
  * length(text)-element array and runs two interpreted lambdas per
  * character (~1M boxed ops per 5k docs — the d06 hot path); this
  * generates one static call over the string instead. Bit-identical to
  * the lambda fold and to DuckDB's `list_reduce` oracle. */
case class PolyHash(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_poly_hash"

  override protected def nullSafeEval(v: Any): Any =
    GraftHash.poly(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.GraftHash.poly($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** `graft_cdc_bounds(s, mask)` — x06's content-defined chunk bounds as a
  * native expression: array<int> [0, cuts…, length] with cuts where the
  * 4-codepoint rolling window hashes to 0 (mod mask). The composable form
  * re-evaluates 4 interpreted `ascii(substr(…))` calls per character
  * (and `substr` degrades to O(i) on non-ASCII text → O(len²) per doc);
  * this is one static pass over the codepoints. Bit-identical to the
  * lambda filter (VectorExpressionsSpec pins it) and to the DuckDB
  * oracle's `list_filter(range(…))`. */
case class CdcBounds(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, IntegerType)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_cdc_bounds"

  override protected def nullSafeEval(s: Any, m: Any): Any =
    GraftHash.cdcBounds(s.asInstanceOf[UTF8String], m.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, m) => s"org.apache.spark.sql.graft.GraftHash.cdcBounds($s, $m)")

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): CdcBounds =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  private val infos = Seq(
    (new FunctionIdentifier("graft_cdc_bounds"),
      new ExpressionInfo(classOf[CdcBounds].getName, "graft_cdc_bounds"),
      (children: Seq[Expression]) => CdcBounds(children(0), children(1)): Expression),
    (new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1)): Expression),
    (new FunctionIdentifier("graft_lsh_sig"),
      new ExpressionInfo(classOf[LshSignature].getName, "graft_lsh_sig"),
      (children: Seq[Expression]) => LshSignature(children(0), children(1), children(2)): Expression),
    (new FunctionIdentifier("graft_poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_poly_hash"),
      (children: Seq[Expression]) => PolyHash(children(0)): Expression),
    (new FunctionIdentifier("graft_sqdist"),
      new ExpressionInfo(classOf[SqDist].getName, "graft_sqdist"),
      (children: Seq[Expression]) => SqDist(children(0), children(1)): Expression))

  /** Idempotent in-session registration (for sessions built without
    * `withExtensions`, e.g. the driver's). */
  def register(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    infos.foreach { case (id, info, builder) =>
      classic.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
  }

  /** Column-API entry points; require [[register]] (or [[GraftExtensions]])
    * on the session first. */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def lshSig(v: Column, lo: Int, hi: Int): Column =
    call_function("graft_lsh_sig", v, lit(lo), lit(hi))

  def polyHash(c: Column): Column = call_function("graft_poly_hash", c)

  def cdcBounds(c: Column, mask: Int): Column =
    call_function("graft_cdc_bounds", c, lit(mask))

  def sqDist(a: Column, b: Column): Column = call_function("graft_sqdist", a, b)
}

/** `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions` (or
  * `SparkSession.builder.withExtensions`) makes `graft_dot` available to
  * plain SQL — the SparkSessionExtensions integration point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_lsh_sig"),
      new ExpressionInfo(classOf[LshSignature].getName, "graft_lsh_sig"),
      (children: Seq[Expression]) => LshSignature(children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("graft_poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_poly_hash"),
      (children: Seq[Expression]) => PolyHash(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("graft_sqdist"),
      new ExpressionInfo(classOf[SqDist].getName, "graft_sqdist"),
      (children: Seq[Expression]) => SqDist(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_cdc_bounds"),
      new ExpressionInfo(classOf[CdcBounds].getName, "graft_cdc_bounds"),
      (children: Seq[Expression]) => CdcBounds(children(0), children(1))))
    // auto-vectorize the HOF dot/sqdist idioms into the strict kernels —
    // semantics-preserving on all inputs (see VectorKernelRule)
    ext.injectOptimizerRule(_ => VectorKernelRule)
    // stored SQL views over lake tables (parser DDL hook + resolution
    // substitution — see graft.plans.GraftViewRules)
    new graft.plans.GraftViewExtensions().apply(ext)
  }
}
