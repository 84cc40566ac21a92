package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain` over a BROADCAST-carried Bloom filter — the big-blob
  * twin of Catalyst's `BloomFilterMightContain`.
  *
  * The built-in expression carries its filter as a binary `Literal`,
  * which rides inside every task binary: fine at the few-MB blobs a
  * benchmark blocklist produces, ruinous once
  * `optimalNumOfBits(items, fpp)/8` reaches hundreds of MB (a
  * 10⁹-item blocklist at 1% fpp is ~1.2 GB — re-shipped per STAGE as
  * a plan literal, but fetched once per EXECUTOR as a broadcast and
  * served from the block manager thereafter). This expression holds a
  * `Broadcast[BloomFilter]` instead: the task binary carries only the
  * broadcast handle, and codegen pins the dereferenced filter in a
  * mutable-state slot so the hot loop pays one virtual call per row,
  * same as the literal form.
  *
  * Null semantics mirror the built-in: null input → null out (callers
  * use it under `Filter`, where null keeps nothing).
  */
case class BloomMightContainBc(bfBc: Broadcast[BloomFilter], child: Expression)
    extends UnaryExpression with Predicate with ExpectsInputTypes {

  override def prettyName: String = "might_contain_bc"
  override def dataType: DataType = BooleanType

  // mightContainLong is the only probe this carrier serves; type-check at
  // analysis (like the built-in BloomFilterMightContain) instead of
  // failing in codegen compile / ClassCastException at runtime
  // (return type inferred: AbstractDataType is private[sql] in Spark 4)
  override def inputTypes = Seq(LongType)

  override protected def nullSafeEval(v: Any): Any =
    bfBc.value.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bfBc,
      classOf[Broadcast[BloomFilter]].getName)
    // dereference the broadcast ONCE per task, not once per row
    val bf = ctx.addMutableState(classOf[BloomFilter].getName, "bloomGate",
      v => s"$v = (${classOf[BloomFilter].getName}) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bf.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainBc =
    copy(child = newChild)
}
