package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** K-way merge of pre-sorted arrays: `array<array<T>>` → `array<T>`,
  * where each inner array is already sorted by T's natural SQL ordering
  * (struct = field-by-field ascending, nulls first — exactly the order
  * [[graft.plans.NestCollect]] emits when sorting by every attribute).
  *
  * This is the merge step of the salted hot-key embedding
  * ([[graft.operators.Embedding.oneWayEmbedSalted]]): per-salt chunks are
  * each sorted cheaply (narrow-key Tungsten sort inside NestCollect), and
  * this expression merges k chunks in O(m·log k) comparisons instead of
  * the O(m·log m) full re-sort that `array_sort(flatten(...))` pays —
  * with k=16 salts and a 10⁶-child hot parent that is ~5× fewer struct
  * comparator calls, on the one path that exists specifically for such
  * parents.
  *
  * CodegenFallback is deliberate: the expression runs once per PARENT row
  * (not per child), after aggregation, outside any hot scan loop — a
  * generated k-way heap over arbitrary struct comparators would add
  * complexity for no measurable win. Inner nulls: a null CHUNK is
  * skipped (contributes nothing); null ELEMENTS inside a chunk are not
  * supported (the producer contract — NestCollect arrays — is
  * containsNull=false).
  */
case class MergeSortedArrays(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def prettyName: String = "merge_sorted_arrays"

  @transient private lazy val elementType: DataType =
    dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(elementType)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(ArrayType(et, _), _) =>
        TypeUtils.checkForOrderingExpr(et, prettyName)
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<array<T>>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val outer = input.asInstanceOf[ArrayData]
    val k = outer.numElements()
    val chunks = new Array[ArrayData](k)
    var total = 0
    var i = 0
    while (i < k) {
      if (!outer.isNullAt(i)) {
        chunks(i) = outer.getArray(i)
        total += chunks(i).numElements()
      }
      i += 1
    }
    // min-heap of (chunk index) keyed by its current head element
    val headIdx = new Array[Int](k)
    implicit val byHead: Ordering[Int] = new Ordering[Int] {
      override def compare(a: Int, b: Int): Int =
        // PriorityQueue is a max-heap; invert for min-first by SWAPPING
        // arguments, never by negating — an underlying comparator is
        // allowed to return Int.MinValue, whose negation overflows back
        // to Int.MinValue and silently inverts the comparison.
        ord.compare(chunks(b).get(headIdx(b), elementType),
          chunks(a).get(headIdx(a), elementType))
    }
    val pq = new scala.collection.mutable.PriorityQueue[Int]()
    i = 0
    while (i < k) {
      if (chunks(i) != null && chunks(i).numElements() > 0) pq.enqueue(i)
      i += 1
    }
    val out = new Array[Any](total)
    var n = 0
    while (pq.nonEmpty) {
      val c = pq.dequeue()
      out(n) = chunks(c).get(headIdx(c), elementType)
      n += 1
      headIdx(c) += 1
      if (headIdx(c) < chunks(c).numElements()) pq.enqueue(c)
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MergeSortedArrays {
  /** Column-API surface: `merge_sorted_arrays(arrayOfSortedArrays)`. */
  def merge_sorted_arrays(c: Column): Column =
    GraftSqlBridge.column(MergeSortedArrays(GraftSqlBridge.expression(c)))
}
