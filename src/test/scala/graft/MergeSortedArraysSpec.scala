package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.functions.MergeSortedArrays.merge_sorted_arrays

/** Direct contract tests for the k-way merge expression
  * ([[graft.functions.MergeSortedArrays]]) — previously covered only
  * transitively by q15's end-to-end hash. Pins the edge behavior its
  * Scaladoc promises: null chunks skipped, duplicates preserved, struct
  * ordering = field-by-field ascending, non-nested input rejected at
  * analysis time.
  */
class MergeSortedArraysSpec extends SparkSpec {

  import spark.implicits._

  private def mergeInts(chunks: Seq[Seq[Int]]): Seq[Int] =
    Seq(Tuple1(chunks)).toDF("c")
      .select(merge_sorted_arrays(col("c")).as("m"))
      .as[Seq[Int]].head()

  test("empty outer array merges to an empty array") {
    assert(mergeInts(Seq.empty) === Seq.empty)
  }

  test("single chunk passes through unchanged") {
    assert(mergeInts(Seq(Seq(1, 2, 2, 5))) === Seq(1, 2, 2, 5))
  }

  test("all-empty chunks merge to an empty array") {
    assert(mergeInts(Seq(Seq.empty, Seq.empty, Seq.empty)) === Seq.empty)
  }

  test("duplicate elements across chunks are all preserved, in order") {
    assert(mergeInts(Seq(Seq(1, 3, 3), Seq(2, 3), Seq(3, 4))) ===
      Seq(1, 2, 3, 3, 3, 3, 4))
  }

  test("k-way merge equals a global sort for many interleaved chunks") {
    // extreme values included: the comparator must not negate (an
    // Int.MinValue comparator result would overflow) — merge order over
    // extremes is exactly what a negation bug silently breaks
    val chunks = Seq(
      Seq(Int.MinValue, -7, 0, Int.MaxValue),
      Seq(-1000000, -7, 13),
      Seq(Int.MinValue, 5),
      Seq.empty[Int],
      Seq(-7, -6, -5, Int.MaxValue))
    assert(mergeInts(chunks) === chunks.flatten.sorted)
  }

  test("null chunks are skipped, contributing nothing") {
    val out = Seq(Tuple1(Seq(Some(Seq(2, 9)), None, Some(Seq(1, 5)))))
      .toDF("c")
      .select(merge_sorted_arrays(col("c")).as("m"))
      .as[Seq[Int]].head()
    assert(out === Seq(1, 2, 5, 9))
  }

  test("struct elements merge by field-by-field ascending order") {
    // the exact element shape NestCollect produces: struct rows,
    // chunk-local pre-sorted by every field
    val df = Seq(Tuple1(Seq(
      Seq((1, "b"), (3, "a")),
      Seq((1, "a"), (2, "z"), (3, "a")),
      Seq((1, "a"))))).toDF("c")
    val out = df.select(merge_sorted_arrays(col("c")).as("m"))
      .selectExpr("transform(m, x -> concat(x._1, ':', x._2)) AS s")
      .as[Seq[String]].head()
    assert(out === Seq("1:a", "1:a", "1:b", "2:z", "3:a", "3:a"))
  }

  test("non-nested array input fails analysis with a clear message") {
    val e = intercept[AnalysisException] {
      Seq(Tuple1(Seq(1, 2, 3))).toDF("c")
        .select(merge_sorted_arrays(col("c")))
        .collect()
    }
    assert(e.getMessage.contains("merge_sorted_arrays"), e.getMessage)
  }

  test("null input row yields null output") {
    val out = spark.sql("SELECT CAST(NULL AS array<array<int>>) AS c")
      .select(merge_sorted_arrays(col("c")).as("m"))
      .collect()
    assert(out.head.isNullAt(0))
  }
}
