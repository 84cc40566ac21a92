package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane LSH signature as a native Catalyst expression: bit
  * p of the result is 1 iff dot(v, planes(p)) >= 0, accumulating each
  * dot strictly left-to-right (bit-identical to the DuckDB oracle's
  * list_reduce fold). A composed-builtins version of this is a
  * ~2000-node expression tree: whole-stage codegen either compiles it
  * for seconds (janino, once per plan) or gives up — this generates a
  * two-line nested loop over a referenced constant matrix instead.
  */
case class HyperplaneSignature(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  @transient private lazy val mat: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var sig = 0L
    var p = 0
    while (p < mat.length) {
      val w = mat(p)
      val n = math.min(v.numElements(), w.length)
      var acc = 0.0
      var d = 0
      while (d < n) { acc += v.getDouble(d) * w(d); d += 1 }
      if (acc >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("planes", mat, "double[][]")
      val sig = ctx.freshName("sig")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |long $sig = 0L;
         |for (int $p = 0; $p < $m.length; $p++) {
         |  int $n = java.lang.Math.min($v.numElements(), $m[$p].length);
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $acc += $v.getDouble($d) * $m[$p][$d];
         |  }
         |  if ($acc >= 0) $sig |= 1L << $p;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSignature {
  def hyperplane_sig(v: Column, planes: Seq[Seq[Double]]): Column =
    GraftSqlBridge.column(
      HyperplaneSignature(GraftSqlBridge.expression(v), planes))
}
