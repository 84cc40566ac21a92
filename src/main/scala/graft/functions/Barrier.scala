package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity pass-through that the optimizer treats as nondeterministic,
  * so rules that CLONE expressions — predicate pushdown through
  * Project/Join (alias substitution) and project collapse — leave the
  * wrapped expression where the caller put it.
  *
  * Why this exists: Catalyst's cost guard against duplicating expensive
  * expressions lives in CollapseProject, not in
  * PushPredicateThroughNonJoin — a pushed-down filter substitutes
  * referenced aliases UNCONDITIONALLY. A predicate that references a
  * derived column k times is rewritten into k copies of the column's
  * defining expression; if that expression is itself a tree of
  * higher-order functions (ArrayFilter etc., all CodegenFallback, so no
  * codegen subexpression elimination ever merges the copies), the
  * evaluated cost multiplies by the full fan-out. Measured on the
  * stratified sampler over the language-ID projection: the pushed
  * predicate re-split every document's text ~100× per row — a 200×
  * slowdown at 10× scale — while the unpushed plan evaluates the
  * projection once.
  *
  * At runtime the value IS deterministic (pure function of the row);
  * only the optimizer's freedom to re-site/duplicate it is withdrawn.
  * The trade: the wrapped predicate no longer pushes toward scans or
  * through joins — callers wrap exactly the conjunct whose inputs are
  * expensive DERIVED columns and leave cheap base-column conjuncts
  * outside, keeping scan pushdown for those.
  */
case class NoInline(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "no_inline"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NoInline {
  /** Column-API surface: `noInline(expensiveDerivedPredicate)`. */
  def noInline(c: Column): Column =
    GraftSqlBridge.column(NoInline(GraftSqlBridge.expression(c)))
}
