package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.Sampling

/** Token-budget corpus selection (x74): the binned threshold-finder
  * must be BIT-IDENTICAL to the exact global-window prefix rule — on
  * the fixture corpus across budgets and on crafted edges where the
  * cut lands exactly on a bin boundary.
  */
class BudgetSelectionSpec extends SparkSpec {
  import spark.implicits._

  private def docs = graft.sources.Tables.load(spark, sf, "documents")

  private def asSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.select(col("doc_id"), col("merit"), col("n_tokens"))
      .as[(Long, Long, Long)].collect().toSet

  test("binned selection ≡ exact prefix rule on the fixture, budgets across the range") {
    val total = Sampling.meritTokens(docs).agg(sum("n_tokens")).as[Long].head()
    for (budget <- Seq(0L, 17L, total / 10, total / 2, total - 1, total, total + 1000)) {
      val exact = asSet(Sampling.selectToBudget(docs, budget))
      val binned = asSet(Sampling.selectToBudgetBinned(docs, budget))
      assert(binned === exact, s"divergence at budget=$budget")
    }
    // sanity on the full-budget edge: everything selected
    assert(asSet(Sampling.selectToBudgetBinned(docs, total)).size ===
      Sampling.meritTokens(docs).count())
  }

  test("prefix rule, not best-fit: a later small doc does not leapfrog the cut") {
    // merit desc order: a(40), b(30), c(30): budget 60 takes a (cum 40),
    // cuts at b (cum 70), and must NOT admit c (cum would be 70 via
    // best-fit skip; the prefix rule stops at the first overflow).
    // Token counts are word counts of the crafted texts; punctuation-free
    // so merit = min(n_tokens,100)*1000.
    def words(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val d = Seq((1L, words(40)), (2L, words(30)), (3L, words(30)))
      .toDF("doc_id", "text")
    // distinct merits are equal here (all < 100 tokens → merit 40000/30000/30000);
    // order: doc 1 (40k? no — merit=min(40,100)*1000=40000), then 2, then 3
    val exact = asSet(Sampling.selectToBudget(d, 60L))
    val binned = asSet(Sampling.selectToBudgetBinned(d, 60L))
    assert(exact === Set((1L, 40000L, 40L)))
    assert(binned === exact)
  }

  test("boundary exactly on a bin edge: full bins admit, next bin excluded wholesale") {
    def words(n: Int): String = Seq.fill(n)("w").mkString(" ")
    // two merit bins: {50,50} at merit 50000 and {20,20} at merit 20000.
    // budget 100 = exact mass of the top bin → top bin fully in,
    // boundary flag lands on the next bin with zero leftover.
    val d = Seq((1L, words(50)), (2L, words(50)), (3L, words(20)), (4L, words(20)))
      .toDF("doc_id", "text")
    val exact = asSet(Sampling.selectToBudget(d, 100L))
    val binned = asSet(Sampling.selectToBudgetBinned(d, 100L))
    assert(exact === Set((1L, 50000L, 50L), (2L, 50000L, 50L)))
    assert(binned === exact)
  }

  test("within-bin cut orders by doc_id ascending") {
    def words(n: Int): String = Seq.fill(n)("w").mkString(" ")
    // one bin (merit 10000 each, 10 tokens each); budget 25 admits docs
    // 1 and 2 (cum 10, 20), cuts doc 3 (cum 30) — doc_id is the
    // tie-break, so the SMALLEST ids win, deterministically.
    val d = (1L to 5L).map(i => (i, words(10))).toDF("doc_id", "text")
    val exact = asSet(Sampling.selectToBudget(d, 25L))
    val binned = asSet(Sampling.selectToBudgetBinned(d, 25L))
    assert(exact === Set((1L, 10000L, 10L), (2L, 10000L, 10L)))
    assert(binned === exact)
  }

  test("the binned plan sorts no corpus-wide unpartitioned window") {
    // the exact baseline's defining flaw is a global (partition-less)
    // Window over the CORPUS; the binned path's only unpartitioned
    // window consumes the merit-bounded BIN aggregate. Gate: in the
    // binned plan, every Window node without partition keys sits above
    // an Aggregate (the bin table), never directly above the scan.
    val plan = Sampling.selectToBudgetBinned(docs, 13000L)
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val bad = plan.collect {
      case w: LWindow if w.partitionSpec.isEmpty &&
        w.collectFirst { case a: Aggregate => a }.isEmpty => w
    }
    assert(bad.isEmpty, "unpartitioned Window over raw corpus in binned plan")
    // and the exact baseline HAS one (the spec is honest about the pairing)
    val exactPlan = Sampling.selectToBudget(docs, 13000L)
      .queryExecution.optimizedPlan
    val global = exactPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w }
    assert(global.nonEmpty)
  }
}
