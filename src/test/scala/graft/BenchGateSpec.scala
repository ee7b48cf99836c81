package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench gate rule that stamps `gate_rc`/`gate_regressed` into the
  * round's bench artifact (Bench.gateRegressed — VERDICT r10 item 7:
  * the gate verdict must ride the artifact, not depend on a human
  * reading bench_check stdout). Mirrors tools/bench_check.py exactly:
  * >RegressionX vs baseline AND over the AbsFloorSec noise floor;
  * new queries without a baseline never fail.
  */
class BenchGateSpec extends AnyFunSuite {

  private val baseline = Map("q_slow" -> 2.0, "q_fast" -> 0.2, "q_zero" -> 0.0)

  test("a query over RegressionX times its baseline is flagged") {
    assert(Bench.gateRegressed(Seq("q_slow" -> 3.5), baseline) === Seq("q_slow"))
  }

  test("at or under the ratio passes; the floor absorbs sub-second noise") {
    // 1.5x exactly is NOT a regression (strict >, same as bench_check)
    assert(Bench.gateRegressed(Seq("q_slow" -> 3.0), baseline).isEmpty)
    // 0.2s -> 0.6s is 3x but both sides sit under the 1s noise floor
    assert(Bench.gateRegressed(Seq("q_fast" -> 0.6), baseline).isEmpty)
    // ... while 0.2s -> 1.2s crosses the floor on the current side
    assert(Bench.gateRegressed(Seq("q_fast" -> 1.2), baseline) === Seq("q_fast"))
  }

  test("new queries absent from the baseline never fail the gate") {
    assert(Bench.gateRegressed(Seq("q_new" -> 99.0), baseline).isEmpty)
  }

  test("a zero baseline with measurable current time flags instead of dividing by zero") {
    assert(Bench.gateRegressed(Seq("q_zero" -> 1.5), baseline) === Seq("q_zero"))
  }

  test("the recorded artifact carries the gate fields") {
    // tools/last_bench.json is rewritten by every Bench run; whenever
    // it exists it must carry the self-recorded verdict so a
    // regression cannot hide in a green-looking round
    val p = java.nio.file.Paths.get("tools/last_bench.json")
    if (java.nio.file.Files.exists(p)) {
      val raw = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      assert(raw.contains("\"gate_rc\":"), "last_bench.json lacks gate_rc")
      assert(raw.contains("\"gate_regressed\":"), "last_bench.json lacks gate_regressed")
    }
  }
}
