package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Distributed cardinality sketches (SURVEY.md §2.11). At 100 TB you
  * do not count distincts exactly per ad-hoc slice — you keep a
  * fixed-size sketch per group and merge. The KMV (k-minimum-values)
  * estimator is the classical bottom-k sketch (Bar-Yossef et al. 2002;
  * the ϑ-sketch family): keep the k smallest hash values of the
  * distinct items; if fewer than k exist the count is exact, else
  * estimate (k−1) · 2⁶⁰ / h₍ₖ₎.
  *
  * Two properties make this implementation verifiable where HLL-style
  * sketches are not:
  *   - the hash is the shared md5-derived [[Portable.hash60]], so the
  *     oracle computes the SAME sketch bit-for-bit (a DuckDB
  *     `approx_count_distinct` would use a different HLL and never
  *     hash-match);
  *   - the k-min set is a deterministic function of the input SET —
  *     order-free, dup-free — so the estimate reproduces under any
  *     partitioning.
  *
  * Scale shape: one distinct-pair shuffle (map-side combine collapses
  * repeats), then the bottom-k per group runs on the heap operator
  * ([[graft.plans.TopKPerGroup]]) whose map-side partial caps the
  * second exchange at k rows per (group, partition) — the sketch merge
  * IS the partial top-k merge, no sort anywhere. The exact count is
  * emitted alongside for error accounting; production at scale would
  * drop it (that is the point of the sketch).
  */
object Sketches {

  /** KMV distinct-count estimate of `itemCol` per `groupCol`.
    * Output: (groupCol, n_exact, kmv_k, kmv_estimate, rel_err).
    *
    * Contract: NULL items are ignored, and a group whose items are ALL
    * NULL is absent from the output entirely (not emitted with
    * n_seen=0) — a downstream join on `groupCol` must outer-join if
    * such groups matter.
    */
  def kmvDistinct(df: DataFrame, groupCol: String, itemCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val twoPow60 = 1152921504606846976.0 // 2^60, exact as a double
    // NULL items are excluded before hashing: hash60(NULL) is NULL,
    // which would survive distinct() as a phantom member and inflate
    // n_seen relative to n_exact (countDistinct ignores NULLs) — and
    // NULL ordering differs between engines, so a NULL in the bottom-k
    // would also break oracle parity.
    val hashed = df
      .filter(col(itemCol).isNotNull)
      .select(col(groupCol), Portable.hash60(col(itemCol).cast("string")).as("h"))
      .distinct()
    val bottomK = graft.plans.TopKPerGroup.topK(
      hashed, Seq(groupCol), Seq("h" -> graft.plans.TopKPerGroup.Asc), k)
    val sketch = bottomK.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_seen"), max(col("h")).as("kth"))
      // n_seen < k ⇒ the sketch saw every distinct item: exact by
      // construction. kth→double rounds identically in both engines
      // (same IEEE value, round-to-nearest), so the estimate is portable.
      .withColumn("kmv_estimate",
        when(col("n_seen") < k, col("n_seen"))
          .otherwise(round(lit((k - 1).toDouble * twoPow60) / col("kth").cast("double"))
            .cast("long")))
    val exact = df.groupBy(col(groupCol))
      .agg(countDistinct(col(itemCol)).as("n_exact"))
    exact.join(sketch, Seq(groupCol))
      .select(col(groupCol), col("n_exact"), lit(k.toLong).as("kmv_k"),
        col("kmv_estimate"),
        round(abs(col("kmv_estimate") - col("n_exact")).cast("double") / col("n_exact"), 6)
          .as("rel_err"))
  }
}
