package graft

import org.apache.spark.sql.functions._
import graft.ext.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    // (stratum, id, weight)
    ("a", 1L, 4L), ("a", 2L, 5L), ("a", 3L, 2L), ("a", 4L, 10L),
    ("a", 5L, 11L), ("b", 6L, 3L)
  ).toDF("lang", "doc_id", "w")

  test("packGreedy: the textbook fold — fill, overflow, oversize-alone") {
    // budget 10, stratum a in id order: 4+5=9 fits; +2 overflows → bin 2
    // (fill 2); +10 overflows → bin 3 (exactly at budget); 11 > budget
    // → bin 4 alone, overflowing (assigned, never dropped)
    val out = Packing.packGreedy(docs, "lang", "doc_id", col("w"), budget = 10)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(4))).toSet
    assert(out === Set(
      ("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 2L), ("a", 4L, 3L),
      ("a", 5L, 4L), ("b", 6L, 1L)))
  }

  test("packGreedy: budget invariant — only oversize singletons overflow") {
    val out = Packing.packGreedy(docs, "lang", "doc_id", col("w"), budget = 10)
    val bins = out.groupBy("lang", "shard", "bin_id")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n_docs"))
      .collect()
    bins.foreach { r =>
      assert(r.getLong(3) <= 10 || r.getLong(4) === 1L,
        s"multi-doc bin over budget: $r")
    }
    assert(out.count() === 6, "every surviving doc assigned exactly once")
  }

  test("packGreedy: subShards splits by pmod(id), keeps the invariant") {
    val out = Packing.packGreedy(docs, "lang", "doc_id", col("w"),
      budget = 10, subShards = 2)
    assert(out.count() === 6)
    assert(out.filter(col("shard") =!= pmod(col("doc_id"), lit(2))).count() === 0)
    val bins = out.groupBy("lang", "shard", "bin_id")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n_docs")).collect()
    bins.foreach(r => assert(r.getLong(3) <= 10 || r.getLong(4) === 1L))
    // shard a/1 (ids 1,3,5): 4+2=6 fits, 11 oversize-alone; a/0 (2,4):
    // 5+10 overflows → two bins — the per-shard fold is independent
    val a1 = out.filter(col("lang") === "a" && col("shard") === 1)
      .collect().map(r => (r.getLong(2), r.getLong(4))).toSet
    assert(a1 === Set((1L, 1L), (3L, 1L), (5L, 2L)))
  }

  test("packGreedy: null stratum/id and non-positive weights are excluded") {
    val messy = Seq(
      (Some("a"), Some(1L), 5L), (None, Some(2L), 5L),
      (Some("a"), None, 5L), (Some("a"), Some(4L), 0L)
    ).toDF("lang", "doc_id", "w")
    val out = Packing.packGreedy(messy, "lang", "doc_id", col("w"), budget = 10)
    assert(out.collect().map(_.getLong(2)).toSeq === Seq(1L))
  }

  test("packGreedy: giant-single-stratum stress — waste stays within one " +
      "partial bin per extra shard") {
    // the one-language-dominates-the-web-corpus shape (90% of docs in
    // one stratum): subShards buys parallelism at the cost of at most
    // one trailing partial bin per extra (stratum, shard) stream —
    // assert that bound AND the greedy closing invariant that implies
    // it (a bin closes only because its successor's first doc would
    // have overflowed, so no mid-stream bin is gratuitously light)
    val n = 20000L
    val stress = spark.range(n).select(
      when(col("id") % 10 < 9, lit("en")).otherwise(lit("de")).as("lang"),
      col("id").as("doc_id"),
      (col("id") % 91 + 10).as("w")) // 10..100 tokens, fixture-shaped
    val budget = 256L
    val shards = 16
    def binCount(sub: Int): Long =
      Packing.packGreedy(stress, "lang", "doc_id", col("w"), budget, sub)
        .select(countDistinct(col("lang"), col("shard"), col("bin_id")))
        .head().getLong(0)
    val single = binCount(1)
    val sharded = Packing.packGreedy(
      stress, "lang", "doc_id", col("w"), budget, shards)
    assert(sharded.count() === n, "every doc assigned exactly once")
    val shardedBins = sharded
      .select(countDistinct(col("lang"), col("shard"), col("bin_id")))
      .head().getLong(0)
    assert(shardedBins - single <= 2 * (shards - 1),
      s"waste beyond one partial bin per extra shard per stratum: " +
        s"$shardedBins sharded vs $single single-stream")
    // closing invariant, every stream: fill(bin) + firstDoc(bin+1) > budget
    val rows = sharded.collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .groupBy(_._1)
    rows.values.foreach { stream =>
      val byBin = stream.sortBy(_._2).groupBy(_._4).toSeq.sortBy(_._1)
      byBin.sliding(2).foreach {
        case Seq((_, cur), (_, next)) =>
          val fill = cur.map(_._3).sum
          val firstNext = next.minBy(_._2)._3
          assert(fill + firstNext > budget,
            s"bin closed early: fill $fill + next $firstNext <= $budget")
        case _ =>
      }
    }
  }

  test("packGreedyOffsets: shared columns bit-identical to packGreedy; " +
      "offsets are the concatenation spans; pos dense per bin") {
    val plain = Packing.packGreedy(docs, "lang", "doc_id", col("w"),
      budget = 10).orderBy("lang", "doc_id")
      .collect().map(_.toSeq).toSeq
    val off = Packing.packGreedyOffsets(docs, "lang", "doc_id", col("w"),
      budget = 10)
    assert(off.select("lang", "shard", "doc_id", "n_tokens", "bin_id")
      .orderBy("lang", "doc_id").collect().map(_.toSeq).toSeq === plain,
      "the offset variant must not perturb the packing itself")
    // per bin, in pos order: offsets are the running token sum (the
    // exact spans a block-diagonal attention mask reads), pos is dense
    // from 0, and the first document starts at offset 0
    off.collect().groupBy(r => (r.getString(0), r.getLong(1), r.getLong(4)))
      .foreach { case (bin, rows) =>
        val sorted = rows.sortBy(_.getLong(6)) // pos
        assert(sorted.map(_.getLong(6)).toSeq === sorted.indices.map(_.toLong),
          s"pos must be dense from 0 in $bin")
        var expect = 0L
        sorted.foreach { r =>
          assert(r.getLong(5) === expect,
            s"offset must equal the running fill in $bin: $r")
          expect += r.getLong(3)
        }
      }
    // the crafted fold: bin 1 of stratum a holds ids 1 (offset 0) and
    // 2 (offset 4); every bin-opening doc sits at offset 0, pos 0
    val byId = off.collect().map(r => r.getLong(2) ->
      (r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(byId(1L) === ((1L, 0L, 0L)) && byId(2L) === ((1L, 4L, 1L)))
    assert(byId(3L) === ((2L, 0L, 0L)) && byId(5L) === ((4L, 0L, 0L)))
  }

  test("chunkTokens: window starts, overlap, and tail coverage") {
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, "x y"))
      .toDF("doc_id", "text")
    val out = Packing.chunkTokens(df, "doc_id", col("text"),
        chunkSize = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    assert(out === Seq(
      (1L, 0L, 4L, "t1 t2 t3 t4"),
      (1L, 1L, 4L, "t4 t5 t6 t7"),
      (1L, 2L, 4L, "t7 t8 t9 t10"),
      (2L, 0L, 2L, "x y")))
    // stride-3 starts with a 1-token overlap cover every token: each
    // chunk ends where computed (start + n_tokens), and the last chunk
    // ends at the document length
    assert(out.filter(_._1 == 1L).map(t => t._2 * 3 + t._3).max === 10L)
  }

  test("chunkTokens: short docs yield exactly one chunk; guards hold") {
    val df = Seq((1L, "only four tokens here")).toDF("doc_id", "text")
    val one = Packing.chunkTokens(df, "doc_id", col("text"), 32, 8).collect()
    assert(one.length === 1 && one.head.getLong(2) === 4L &&
      one.head.getString(3) === "only four tokens here")
    intercept[IllegalArgumentException] {
      Packing.chunkTokens(df, "doc_id", col("text"), 8, 8)
    }
    intercept[IllegalArgumentException] {
      Packing.packGreedy(docs, "lang", "doc_id", col("w"), budget = 0)
    }
  }

  // ---- x134: NN-chain order within the cell --------------------------

  private def angled(deg: Double): Seq[Float] = {
    val r = math.toRadians(deg)
    Seq.tabulate(64) { d =>
      if (d == 0) math.cos(r).toFloat
      else if (d == 1) math.sin(r).toFloat else 0.0f
    }
  }

  test("semanticChainOrder: greedy NN traversal — seed lowest id, step to " +
      "highest cosine, NOT id order; singleton cells are chains of one") {
    import graft.ext.Similarity
    // one cell (vec 0 is the only modulus-100 seed): vectors on the
    // (0,1)-plane at 0/30/45/15 degrees — from 0 the nearest is 3
    // (15 deg), then 1 (15 deg from 3), then 2: chain 0,3,1,2
    val emb = Seq(
      0L -> angled(0), 1L -> angled(30), 2L -> angled(45), 3L -> angled(15),
      // a second cell: vec 100 seeds it alone — singleton chain
      100L -> Seq.tabulate(64)(d => if (d == 5) 1.0f else 0.0f)
    ).toDF("vec_id", "embedding")
    val chain = Similarity.semanticChainOrder(emb)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(chain(0L) === (0L, 1L) && chain(3L) === (0L, 2L) &&
      chain(1L) === (0L, 3L) && chain(2L) === (0L, 4L),
      s"the traversal is semantic, not id order: $chain")
    assert(chain(100L) === (100L, 1L), "singleton cell: chain of length 1")
    // the chain is a permutation: positions 1..n per cell, each once
    assert(chain.values.filter(_._1 == 0L).map(_._2).toSeq.sorted
      === Seq(1L, 2L, 3L, 4L))
  }

  test("packGreedyByOrder: bins follow the supplied order, not id order") {
    // order reverses the ids; budget 6 with 3-token docs packs pairs
    // in VISIT order: {4,3} then {2,1} — id-order packing would give
    // {1,2},{3,4} with different members per bin id
    val df = Seq(
      ("a", 1L, 4L, 3L), ("a", 2L, 3L, 3L), ("a", 3L, 2L, 3L),
      ("a", 4L, 1L, 3L)
    ).toDF("lang", "doc_id", "ord", "w")
    val out = Packing.packGreedyByOrder(df, "lang", "doc_id", col("ord"),
        col("w"), budget = 6)
      .collect().map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(out === Map(4L -> 1L, 3L -> 1L, 2L -> 2L, 1L -> 2L))
  }

  test("x134 composition: chain-ordered packing keeps the budget invariant " +
      "and packs chain neighbors together") {
    import graft.ext.Similarity
    // 6 vectors in one cell at increasing angles; token counts chosen
    // so the 2-doc windows pair chain neighbors
    val emb = (0 to 5).map(i => i.toLong -> angled(i * 13.0))
      .toDF("vec_id", "embedding")
    val chain = Similarity.semanticChainOrder(emb)
    val docs = (0 to 5).map(i => (i.toLong, 3L)).toDF("doc_id", "n_tokens")
      .join(chain, col("doc_id") === col("vec_id"))
    val out = Packing.packGreedyByOrder(docs, "centroid_id", "doc_id",
      col("chain_pos"), col("n_tokens"), budget = 6)
    val bins = out.collect()
      .map(r => (r.getLong(4), r.getLong(1))).groupBy(_._1)
      .map { case (b, xs) => b -> xs.map(_._2).toSet }
    // the chain at 13-degree steps is the angular walk 0,1,2,3,4,5 —
    // windows pair consecutive chain steps
    assert(bins.values.toSet === Set(Set(0L, 1L), Set(2L, 3L), Set(4L, 5L)),
      s"2-doc windows of chain neighbors: $bins")
    out.groupBy("bin_id").agg(sum("n_tokens").as("fill")).collect()
      .foreach(r => assert(r.getLong(1) <= 6L))
  }

  test("packGreedyOffsetsByOrder: shared columns bit-identical to " +
      "packGreedyByOrder; offsets are the concatenation spans in visit order") {
    val df = Seq(
      ("a", 1L, 4L, 3L), ("a", 2L, 3L, 2L), ("a", 3L, 2L, 3L),
      ("a", 4L, 1L, 4L), ("b", 5L, 1L, 7L)
    ).toDF("lang", "doc_id", "ord", "w")
    val base = Packing.packGreedyByOrder(df, "lang", "doc_id", col("ord"),
      col("w"), budget = 7).collect().map(_.toSeq).toSet
    val off = Packing.packGreedyOffsetsByOrder(df, "lang", "doc_id",
      col("ord"), col("w"), budget = 7)
    assert(off.select("lang", "doc_id", "ord", "n_tokens", "bin_id")
      .collect().map(_.toSeq).toSet === base,
      "the shared columns must be bit-identical — the offset derivation " +
        "cannot perturb the bin decision")
    // visit order in stratum a is ord asc: 4(w4),3(w3) → bin1 spans
    // [0,4),[4,7); 2(w2),1(w3) → bin2 spans [0,2),[2,5)
    val rows = off.filter(col("lang") === "a").collect()
      .map(r => r.getLong(1) -> (r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(rows === Map(
      4L -> (1L, 0L, 0L), 3L -> (1L, 4L, 1L),
      2L -> (2L, 0L, 0L), 1L -> (2L, 2L, 1L)),
      s"offsets follow the visit order's running fill: $rows")
    // per-bin invariant: offsets tile the window — offset = running
    // sum of earlier docs' tokens, pos dense from 0
    val b = off.filter(col("lang") === "b").collect().head
    assert(b.getLong(4) === 1L && b.getLong(5) === 0L && b.getLong(6) === 0L)
  }
}
