package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Squared L2 distance of two double arrays as a native Catalyst
  * expression — the product-quantization assignment metric (codewords
  * minimize reconstruction error under L2, the standard PQ objective;
  * cosine would ignore subvector magnitude, which the reconstruction
  * needs). Same design rationale as [[CosineSim]]: a handwritten loop
  * in `doGenCode` stays inside whole-stage codegen and accumulates
  * strictly left-to-right, bit-identical to the DuckDB oracle's
  * `list_reduce(list_prepend(0.0, [(a[i]-b[i])^2 …]), (x,y) -> x+y)`.
  */
case class L2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_sq"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0; var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object L2Sq {
  def l2_sq(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      L2Sq(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

/** Left-fold dot product of two double arrays — the asymmetric-distance
  * (ADC) lookup-table primitive: `dot(query_sub, codeword)` entries
  * compose additively across subspaces, so a full-vector similarity is
  * recovered from per-subspace table lookups without touching the
  * original vectors. `dot(a, a)` doubles as the squared norm.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0; var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def dot_product(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      DotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

/** Product-quantization argmin over a codebook: given a subvector and
  * its subspace's codebook — passed as two FLAT aligned arrays, code
  * ids and concatenated codeword values — return struct(l2_sq,
  * code_id) of the codeword minimizing `round(squared_L2, 6)`, ties to
  * the lowest code id — bit-identical to ranking rounded [[L2Sq]]
  * scores, which is what the DuckDB oracle does.
  *
  * Why a custom expression and not `array_min(transform(...))`: the
  * higher-order form is a CodegenFallback — interpreted per element,
  * with a per-candidate `BigDecimal` rounding — and as a derived
  * column it gets DUPLICATED: projection collapse plus
  * constraint-inference pushdown copied FOUR evaluations per row into
  * one join condition in x55 (the LUT build side's codeword filters
  * get inferred onto the probe's derived join key). Measured 11 s at
  * sf0.1. This version stays inside whole-stage codegen (one static
  * call per row), and the flat-array layout makes each call a pure
  * primitive loop — zero per-candidate allocations (an
  * array-of-structs codebook pays an UnsafeRow + UnsafeArrayData view
  * PER candidate PER call; with the duplicated evaluations that was
  * ~1.3e9 allocations at 10×, GC-bound at ~10 s — so even the copies
  * the optimizer inserts cost microseconds).
  *
  * Rounding exploits monotonicity: the rounded minimum IS the rounding
  * of the raw minimum, so only candidates inside a +1e-6 window of the
  * raw minimum ever pay the `BigDecimal` rounding that tie-breaking
  * requires — one or two per fold instead of all ≤256.
  */
case class PqArgMin(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = PqArgMin.outType
  override def prettyName: String = "pq_argmin"

  // Nullable even when all children are non-null: an empty codebook
  // (zero candidate ids) has no argmin, and `compute` returns null for
  // it. Forcing nullable=true makes codegen declare a real isNull slot
  // so the empty case can't surface as isNull=false with a null struct.
  override def nullable: Boolean = true

  override protected def nullSafeEval(sv: Any, ids: Any, flat: Any): Any =
    PqArgMin.compute(sv.asInstanceOf[ArrayData], ids.asInstanceOf[ArrayData],
      flat.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sv, ids, flat) =>
      s"""
         |${ev.value} = graft.functions.PqArgMin.compute($sv, $ids, $flat);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqArgMin {
  val outType: StructType = StructType(Seq(
    StructField("l2_sq", DoubleType, nullable = false),
    StructField("code_id", LongType, nullable = false)))

  def pq_argmin(sv: Column, codeIds: Column, codeFlat: Column): Column =
    GraftSqlBridge.column(
      PqArgMin(GraftSqlBridge.expression(sv), GraftSqlBridge.expression(codeIds),
        GraftSqlBridge.expression(codeFlat)))

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x) // shortest-decimal rep, like Spark's Round
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Two passes over the codebook: (1) raw minimum; (2) lowest code id
    * among candidates whose ROUNDED l2 equals the rounded minimum.
    * Rounding is monotone non-decreasing, so round(min_raw) is the
    * minimal rounded value, and any candidate tying it satisfies
    * l2_raw ≤ round(min_raw) + 5e-7 ≤ min_raw + 1e-6 — the window that
    * bounds how many BigDecimal roundings ever run.
    */
  def compute(sv: ArrayData, ids: ArrayData, flat: ArrayData):
      org.apache.spark.sql.catalyst.InternalRow = {
    val n = ids.numElements()
    if (n == 0) return null
    val sub = sv.numElements()
    var minRaw = Double.MaxValue
    var i = 0
    while (i < n) {
      val base = i * sub
      var acc = 0.0; var j = 0
      while (j < sub) {
        val d = sv.getDouble(j) - flat.getDouble(base + j)
        acc += d * d
        j += 1
      }
      if (acc < minRaw) minRaw = acc
      i += 1
    }
    val target = round6(minRaw)
    val window = minRaw + 1.000001e-6
    var bestId = Long.MaxValue
    i = 0
    while (i < n) {
      val base = i * sub
      var acc = 0.0; var j = 0
      while (j < sub) {
        val d = sv.getDouble(j) - flat.getDouble(base + j)
        acc += d * d
        j += 1
      }
      if (acc <= window && round6(acc) == target) {
        val cid = ids.getLong(i)
        if (cid < bestId) bestId = cid
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](target, bestId))
  }
}
