package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's self-describing contention stamp (round-17 verdict
  * item 2): after the load-aware start deferral exhausts its retries
  * and the box is STILL hot, the run proceeds (the bench must
  * terminate on a box that never goes idle) — but the artifact must
  * say so, because three of the last four rounds needed a judge
  * re-bench to distinguish a contended committed number from a real
  * regression. The predicate is pure (samples in, verdict out), so the
  * "forged high load" case the verdict prescribed is a unit test, not
  * a box-state dance.
  */
class BenchContentionSpec extends AnyFunSuite {

  private val target = 4.0 // cpus=32 / 8

  test("exhausted deferral still above target marks the run contended") {
    // five waits fired, the last sample is still way over target —
    // exactly the shape of the committed round-17 artifact (10.26)
    val samples = Seq("20.11,18.20,15.00", "14.52,15.00,15.10",
      "12.00,13.80,14.90", "10.90,12.70,14.20", "10.50,12.10,13.90",
      "10.26,11.80,13.60")
    assert(Bench.isContended(samples, target))
  }

  test("a deferral that settled below target is deferred but NOT contended") {
    val samples = Seq("20.11,18.20,15.00", "3.10,8.40,12.00")
    assert(!Bench.isContended(samples, target))
  }

  test("a clean start (single sample, quiet box) is not contended") {
    assert(!Bench.isContended(Seq("0.16,1.20,2.40"), target))
    // even a single HOT sample is not "contended": contention means the
    // deferral machinery ran out of waits, not that it never ran
    assert(!Bench.isContended(Seq("9.75,8.00,7.00"), target))
  }

  test("unparseable loadavg reads as quiet (no-evidence direction)") {
    assert(!Bench.isContended(Seq("unavailable", "unavailable"), target))
    assert(Bench.load1m("unavailable") == 0.0)
    assert(Bench.load1m("7.25,3.00,1.00") == 7.25)
  }
}
