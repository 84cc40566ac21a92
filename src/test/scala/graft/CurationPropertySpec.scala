package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ext.{Sampling, Scrub, Sketches}

/** Property-based invariants of the round-5 curation operators over
  * randomized inputs. Each property runs ONE Spark job per sample over
  * a generated batch (not one job per row), so the suite stays fast
  * while the inputs stay adversarial.
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, samples: Int): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(samples), prop)
    assert(result.passed, result.status.toString)
  }

  // text fragments that exercise every scrub rule boundary: words,
  // digit runs, email-shaped tokens, and the separators between them
  private val fragment: Gen[String] = Gen.oneOf(
    Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString),
    Gen.choose(0L, 999999999L).map(_.toString),
    for {
      a <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
      b <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
      tld <- Gen.oneOf("co", "com", "org")
    } yield s"$a@$b.$tld",
    Gen.oneOf("@", ".", "-", "%", "<NUM>", "<EMAIL>"))
  private val text: Gen[String] =
    Gen.listOf(fragment).map(_.mkString(" "))

  test("scrub is idempotent and leaves nothing for a second pass") {
    check(Prop.forAll(Gen.listOfN(40, text)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "txt")
      val once = Scrub.redact(df, Seq("id"), "txt")
        .select("id", "redacted", "n_email", "n_num")
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      val again = Scrub.redact(
          once.toSeq.toDF("id", "txt"), Seq("id"), "txt")
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .sortBy(_._1)
      // the replacements contain no digits and no @-pattern, so a second
      // pass finds zero matches and changes nothing
      again.forall { case (id, nEmail, nNum, redacted) =>
        nEmail == 0L && nNum == 0L &&
          redacted == once.find(_._1 == id).get._2
      }
    }, samples = 5)
  }

  test("KMV is exact whenever the distinct count stays below k") {
    check(Prop.forAll(Gen.listOf(Gen.choose(0L, 40L))) { items =>
      items.isEmpty || {
        val df = items.map(i => ("g", i)).toDF("g", "item")
        val r = Sketches.kmvDistinct(df, "g", "item").collect().head
        // <= 41 distinct values < k=64 -> the sketch saw everything
        r.getLong(1) == items.distinct.size.toLong &&
          r.getLong(3) == r.getLong(1) && r.getDouble(4) == 0.0
      }
    }, samples = 10)
  }

  test("weightedPriority equals the driver-side recomputation of its contract") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val rows: Gen[List[(String, Long, Long)]] = Gen.listOf(for {
      g <- Gen.oneOf("a", "b", "c")
      id <- Gen.choose(0L, 10000L)
      w <- Gen.choose(1L, 100L)
    } yield (g, id, w))
    check(Prop.forAll(rows) { rs =>
      // one weight per id (duplicate ids would make the expected set
      // ambiguous — the operator contract assumes id is a key)
      val uniq = rs.groupBy(_._2).map(_._2.head).toList
      val out = Sampling.weightedPriority(
          uniq.toDF("g", "id", "w"), "g", "id", col("w"), k = 4)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val expected = uniq
        .map { case (g, id, w) => (g, id, h60(id.toString) / w) }
        .groupBy(_._1)
        .flatMap { case (_, grp) => grp.sortBy(r => (r._3, r._2)).take(4) }
        .map(r => (r._1, r._2)).toSet
      out == expected
    }, samples = 10)
  }

  test("packGreedy equals the sequential reference fold, at any subShards") {
    val rows: Gen[List[(String, Long, Long)]] = Gen.listOf(for {
      g <- Gen.oneOf("a", "b")
      id <- Gen.choose(0L, 10000L)
      w <- Gen.choose(1L, 40L) // some weights exceed the budget below
    } yield (g, id, w))
    val budget = 25L
    check(Prop.forAll(rows, Gen.choose(1, 3)) { (rs, shards) =>
      val uniq = rs.groupBy(_._2).map(_._2.head).toList
      val out = graft.ext.Packing.packGreedy(
          uniq.toDF("g", "id", "w"), "g", "id", col("w"),
          budget = budget, subShards = shards)
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4))).toSet
      // sequential reference: greedy fold in id order per (g, shard)
      val expected = uniq
        .map { case (g, id, w) => (g, id % shards, id, w) }
        .groupBy(t => (t._1, t._2)).iterator.flatMap { case (_, grp) =>
          var fill = 0L; var bin = 0L
          grp.sortBy(_._3).map { case (g, sh, id, w) =>
            if (bin == 0L || fill + w > budget) { bin += 1; fill = w }
            else fill += w
            (g, sh, id, bin)
          }
        }.toSet
      out == expected
    }, samples = 10)
  }

  test("mergeSpans: islands cover exactly the hit-covered positions, are " +
    "disjoint with gaps, and conserve hit counts (randomized)") {
    // the gaps-and-islands core shared by x79/x81/x83/x85
    val hitsGen = for {
      k <- Gen.choose(2, 6)
      nDocs <- Gen.choose(1, 4)
      docs <- Gen.listOfN(nDocs, for {
        id <- Gen.choose(1L, 100L)
        ps <- Gen.nonEmptyListOf(Gen.choose(0L, 40L))
      } yield (id, ps.distinct))
    } yield (k, docs.toMap)
    check(Prop.forAll(hitsGen) { case (k, docs) =>
      val hits = docs.toSeq.flatMap { case (id, ps) => ps.map(p => (id, p)) }
      val out = graft.ext.Dedup.mergeSpans(
          hits.toDF("doc_id", "pos"), k)
        .as[(Long, Long, Long, Long, Long)].collect()
      docs.forall { case (id, ps) =>
        val spans = out.filter(_._1 == id).map(r => (r._2, r._3, r._5)).sortBy(_._1)
        val covered = ps.flatMap(p => p until p + k).toSet
        val spanCover = spans.flatMap(s => s._1 until s._2).toSet
        val disjointWithGaps = spans.toSeq.sliding(2).forall {
          case Seq((_, e1, _), (s2, _, _)) => s2 > e1 // gap ≥ 1 token
          case _ => true
        }
        spanCover == covered &&
          disjointWithGaps &&
          spans.map(_._3).sum == ps.size && // n_grams conserves hits
          spans.forall(s => s._2 - s._1 >= k) // every span ≥ one gram wide
      }
    }, samples = 20)
  }
}
