package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity of two double arrays as a native Catalyst
  * expression with `doGenCode`.
  *
  * Why a custom expression (the (b) rung of the preference ladder):
  * composing built-ins can express this as an expanded 64-term sum or a
  * higher-order `aggregate` fold, but the expanded form is a single
  * unsplittable expression tree that blows past the generated-method
  * limit — whole-stage codegen disables itself and the projection runs
  * interpreted (measured ~10s for 500k pairs at sf0.1) — and the
  * higher-order form is interpreted per element by construction. This
  * loop generates ~10 lines of code, stays inside whole-stage codegen,
  * and accumulates strictly left-to-right, so results are bit-identical
  * to the sequential-fold definition the DuckDB oracle uses
  * (`list_reduce(list_prepend(0.0, …), (a,b) -> a+b)`).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  // callers construct over `array<double>` (cast upstream); no
  // ExpectsInputTypes because AbstractDataType is private[sql] in 4.x
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Column-API surface: `cosine_sim(a, b)`. */
  def cosine_sim(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      CosineSim(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
