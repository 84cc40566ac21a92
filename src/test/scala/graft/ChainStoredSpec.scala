package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Round-17: the NN-chain order computed from the PERSISTED semantic
  * index (x141 — `semanticChainOrderStored`, the family's "stored"
  * rung), plus the `chainCellCap` guard on the one non-spillable piece
  * of the chain fold (the round-16 advisory: a hot cell under drifted
  * centroids must refuse fast, not OOM an executor).
  */
class ChainStoredSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  // deterministic pseudo-random unit-ish vectors: distinct pairwise
  // cosines so the chain traversal is structure-bearing, not tie-walking
  private def vec(i: Long): Seq[Float] =
    Seq.tabulate(dim)(d => (((i * 31 + d * 7) % 11) + 1).toFloat / 11f)
  private def embDf(ids: Seq[Long]) =
    ids.map(i => i -> vec(i)).toDF("vec_id", "embedding")

  test("semanticChainOrderStored ≡ the in-plan chain when the stored " +
      "index mirrors the corpus") {
    val idx = Files.createTempDirectory("graft_chain_stored").toString + "/idx"
    val emb = embDf(0L to 11L)
    Similarity.writeSemanticIndex(emb, idx,
      centroidModulus = 3, maxCentroids = 4)
    val inPlan = Similarity.semanticChainOrder(emb,
        centroidModulus = 3, maxCentroids = 4)
      .collect().map(_.toSeq).sortBy(_.toString)
    val stored = Similarity.semanticChainOrderStored(spark, idx)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(stored === inPlan,
      "the stored assignment replays the same deterministic traversal")
  }

  test("tombstoned vectors cannot land in the chain: a non-seed takedown " +
      "re-threads ≡ the in-plan chain over the filtered corpus") {
    val idx = Files.createTempDirectory("graft_chain_td").toString + "/idx"
    val emb = embDf(0L to 11L)
    Similarity.writeSemanticIndex(emb, idx,
      centroidModulus = 3, maxCentroids = 4)
    // ids 4 and 7 are NOT centroid seeds (% 3 != 0), so the frozen
    // centroid set equals the filtered corpus's — the re-threaded chain
    // must match the in-plan chain over the survivors exactly
    Similarity.deleteFromSemanticIndex(Seq(4L, 7L).toDF("vec_id"), idx)
    val stored = Similarity.semanticChainOrderStored(spark, idx)
    assert(stored.filter(col("vec_id").isin(4L, 7L)).isEmpty,
      "deleted vectors never appear in a chain")
    val expected = Similarity.semanticChainOrder(
        embDf(Seq(0L, 1L, 2L, 3L, 5L, 6L, 8L, 9L, 10L, 11L)),
        centroidModulus = 3, maxCentroids = 4)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(stored.collect().map(_.toSeq).sortBy(_.toString) === expected,
      "the chain re-threads around the tombstones")
  }

  test("replayed append rows collapse: a double-appended batch chains " +
      "as if appended once") {
    val idx = Files.createTempDirectory("graft_chain_replay").toString + "/idx"
    Similarity.writeSemanticIndex(embDf(0L to 7L), idx,
      centroidModulus = 3, maxCentroids = 4)
    val batch = embDf(Seq(8L, 9L))
    Similarity.appendSemanticIndex(batch, idx)
    Similarity.appendSemanticIndex(batch, idx) // redelivery, no marker
    val stored = Similarity.semanticChainOrderStored(spark, idx)
    assert(stored.groupBy("vec_id").count().filter(col("count") > 1).isEmpty,
      "each vec_id chains exactly once")
    assert(stored.count() === 10L)
  }

  test("kNN chain with k >= |cell|-1 is bit-identical to the exact chain " +
      "(complete lists, no restart ever fires)") {
    val emb = embDf(0L to 11L)
    val exact = Similarity.semanticChainOrder(emb,
        centroidModulus = 3, maxCentroids = 4)
      .collect().map(_.toSeq).sortBy(_.toString)
    val knn = Similarity.semanticChainOrderKnn(emb,
        centroidModulus = 3, maxCentroids = 4, maxNeighbors = 16)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(knn === exact, "the exact chain is the large-k special case")
  }

  test("kNN chain at small k: restarts keep the output a contiguous " +
      "1-based permutation per cell, deterministically") {
    // one cell of 10 members (modulus 1 → seed 0 only): k = 2 lists
    // exhaust mid-traversal, so the restart rule genuinely fires
    val emb = embDf(0L to 9L)
    def run() = Similarity.semanticChainOrderKnn(emb, centroidModulus = 1,
      maxCentroids = 1, maxNeighbors = 2).collect()
    val a = run()
    assert(a.length === 10)
    assert(a.map(_.getAs[Long]("vec_id")).sorted === (0L to 9L).toArray,
      "every member chains exactly once")
    assert(a.map(_.getAs[Long]("chain_pos")).sorted === (1L to 10L).toArray,
      "positions stay contiguous across restarts")
    assert(a.map(_.toSeq).sortBy(_.toString)
      === run().map(_.toSeq).sortBy(_.toString), "deterministic replay")
  }

  test("the exact chain's refusal names the kNN rung, and the kNN rung " +
      "handles the same cell within its own (member-count) bound") {
    val emb = embDf(0L to 5L)
    val ex = intercept[org.apache.spark.SparkException] {
      Similarity.semanticChainOrder(emb, centroidModulus = 1,
        maxCentroids = 1, chainCellCap = 4).collect()
    }
    assert(ex.getMessage.contains("semanticChainOrderKnn") ||
      Option(ex.getCause).exists(_.getMessage.contains("semanticChainOrderKnn")))
    val ok = Similarity.semanticChainOrderKnn(emb, centroidModulus = 1,
      maxCentroids = 1, maxNeighbors = 2).collect()
    assert(ok.length === 6, "the memory-bounded rung chains the hot cell")
  }

  test("stored × kNN composition ≡ the in-plan kNN chain on a mirror " +
      "corpus, and tombstones stay out of it") {
    val idx = Files.createTempDirectory("graft_chain_sknn").toString + "/idx"
    val emb = embDf(0L to 11L)
    Similarity.writeSemanticIndex(emb, idx,
      centroidModulus = 3, maxCentroids = 4)
    val inPlan = Similarity.semanticChainOrderKnn(emb,
        centroidModulus = 3, maxCentroids = 4, maxNeighbors = 2)
      .collect().map(_.toSeq).sortBy(_.toString)
    val stored = Similarity.semanticChainOrderStoredKnn(spark, idx,
        maxNeighbors = 2)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(stored === inPlan)
    // a non-seed takedown: the k-capped chain re-threads over survivors
    Similarity.deleteFromSemanticIndex(Seq(4L).toDF("vec_id"), idx)
    val after = Similarity.semanticChainOrderStoredKnn(spark, idx,
      maxNeighbors = 2)
    assert(after.filter(col("vec_id") === 4L).isEmpty)
    assert(after.count() === 11L)
  }

  test("chainCellCap guard: a cell past the cap refuses fast with the " +
      "remedy in the message; a wider cap proceeds") {
    // modulus 1, cap 1 → one centroid → one cell of 6 members
    val emb = embDf(0L to 5L)
    val ex = intercept[org.apache.spark.SparkException] {
      Similarity.semanticChainOrder(emb, centroidModulus = 1,
        maxCentroids = 1, chainCellCap = 4).collect()
    }
    assert(ex.getMessage.contains("chainCellCap") ||
      Option(ex.getCause).exists(_.getMessage.contains("chainCellCap")),
      s"the refusal names the cap and remedy: ${ex.getMessage}")
    val ok = Similarity.semanticChainOrder(emb, centroidModulus = 1,
      maxCentroids = 1, chainCellCap = 16).collect()
    assert(ok.length === 6 && ok.map(_.getAs[Long]("chain_pos")).sorted
      === (1L to 6L).toArray, "one contiguous chain under a wide cap")
  }
}
