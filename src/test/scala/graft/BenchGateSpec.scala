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

  test("median: odd middle, even mean-of-middle-two, empty is +inf") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) === 2.0)
    assert(Bench.median(Seq(4.0, 1.0)) === 2.5)
    assert(Bench.median(Seq(7.5)) === 7.5)
    assert(Bench.median(Seq.empty).isPosInfinity)
  }

  test("median gate: second pass clears a first-pass contention stall (gate_rc 0)") {
    // r11/r19's false-flag shape: a load window inflated EVERY
    // first-pass sample of a contiguous band; the quiet re-run put
    // them near baseline. The verdict is the min over all samples of
    // both passes, so the quiet second pass clears the flag.
    var reTimed = List.empty[String]
    val (regressed, second) = Bench.medianGate(
      Seq("q_slow" -> Seq(6.0, 6.2, 5.9), "q_fast" -> Seq(0.2, 0.21)),
      baseline,
      name => { reTimed ::= name; Seq(2.1, 2.05, 2.2) })
    assert(regressed.isEmpty)
    assert(reTimed === List("q_slow")) // only the suspect is re-timed
    assert(second === Map("q_slow" -> Seq(2.1, 2.05, 2.2)))
  }

  test("median gate: a single first-pass spike does not even trigger the second pass") {
    // the one-sided bias the min rule had is gone symmetric: one
    // 6 s straggler among quiet samples leaves the median quiet
    val (regressed, second) = Bench.medianGate(
      Seq("q_slow" -> Seq(2.1, 6.0, 2.0)),
      baseline,
      _ => fail("median of (2.0, 2.1, 6.0) is 2.1 — no suspect"))
    assert(regressed.isEmpty && second.isEmpty)
  }

  test("median gate: high dispersion with a baseline-near min never flags (q91/q158 shape)") {
    // The r20 false-positive this round's correction exists for: a
    // query whose per-pass MEDIANS both sit over 1.5x its
    // min-recorded baseline purely from run-to-run dispersion
    // (GC/checkpoint/JIT placement at the 1-2 s scale), while its
    // best samples land near the baseline. The median TRIGGERS the
    // second pass; the verdict reads the min over all samples, which
    // clears. A median-statistic verdict flagged exactly this shape
    // on its first live sweep with zero plan change.
    val (regressed, second) = Bench.medianGate(
      Seq("q_slow" -> Seq(4.1, 3.2, 2.1)), // median 3.2 > 1.5*2.0 -> suspect
      baseline,
      _ => Seq(3.4, 3.3, 2.9)) // re-time medians elevated too...
    assert(second === Map("q_slow" -> Seq(3.4, 3.3, 2.9)))
    assert(regressed.isEmpty) // ...but min 2.1 is 1.05x baseline: no flag
  }

  test("median gate: a genuine regression is slow in both passes (still flagged)") {
    val (regressed, _) = Bench.medianGate(
      Seq("q_slow" -> Seq(6.0, 6.1)),
      baseline,
      _ => Seq(5.9, 6.1, 6.0)) // quiet re-run is just as slow
    assert(regressed === Seq("q_slow"))
  }

  test("median gate: an all-errored second pass cannot clear the flag") {
    // timeOneChecked contributes no sample on error; an empty pass-2
    // median is +inf, so the verdict rests on the slow first pass
    val (regressed, _) = Bench.medianGate(
      Seq("q_slow" -> Seq(6.0, 6.1)),
      baseline,
      _ => Seq.empty)
    assert(regressed === Seq("q_slow"))
  }

  test("no suspects means no second pass at all") {
    val (regressed, second) = Bench.medianGate(
      Seq("q_slow" -> Seq(2.2, 2.3), "q_fast" -> Seq(0.3)),
      baseline,
      _ => fail("reTime must not be called when nothing is flagged"))
    assert(regressed.isEmpty && second.isEmpty)
  }

  test("sweep-mechanism pins: stream warm-up, GC cadence, periodic-GC override") {
    // r19's two end-of-sweep blowup mechanisms stay fixed by
    // construction (VERDICT r19 item 4): (1) the untimed warm-up list
    // must include a stateful STREAM (cold microbatch + state-store
    // init otherwise lands in the first stream query's samples) and
    // every warm-up name must exist in the catalog; (2) the
    // between-queries GC cadence must be small against the ~190-query
    // sweep so ContextCleaner cleanup stays incremental, with the
    // 30-min periodic GC pushed far past any sweep length.
    val qs = SparkEntry.queries
    assert(Bench.WarmupQueries.forall(qs.contains),
      s"warm-up names missing from catalog: ${Bench.WarmupQueries.filterNot(qs.contains)}")
    assert(Bench.WarmupQueries.exists(_.contains("stream")),
      "warm-up list lost its stateful stream (commit 0818436's fix)")
    assert(Bench.GcEveryN >= 1 && Bench.GcEveryN <= 20,
      s"GcEveryN=${Bench.GcEveryN} — between-queries GC no longer incremental")
    assert(Bench.PeriodicGcInterval == "6h")
    var fired = 0
    val c = new Bench.GcCadence(3, () => fired += 1)
    (1 to 9).foreach(_ => c.tick())
    assert(fired === 3 && c.fired === 3) // every 3rd tick, deterministic
    c.tick(force = true)
    assert(fired === 4) // forced fire resets the counter
    (1 to 2).foreach(_ => c.tick())
    assert(fired === 4)
  }

  test("bench_baseline.json's stored total equals its per-query entry sum") {
    // r14's verdict line overstated a 0.91x sweep as 1.24x because the
    // baseline's scalar "total" field went stale across a partial
    // per-query regeneration. bench_check.py now sums the entries; this
    // pins the stored scalar to the same statistic so a regeneration
    // that forgets the field is caught at test time, not judge time.
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/bench_baseline.json")), "UTF-8")
    val j = JsonMethods.parse(txt)
    val entrySum = (j \ "queries") match {
      case JObject(fields) => fields.map {
        case (_, JDouble(d)) => d
        case (_, JInt(i)) => i.toDouble
        case (_, JDecimal(d)) => d.toDouble
        case (n, other) => fail(s"non-numeric baseline entry $n: $other")
      }.sum
      case other => fail(s"no queries object in baseline: $other")
    }
    val stored = (j \ "total") match {
      case JDouble(d) => d
      case JDecimal(d) => d.toDouble
      case JInt(i) => i.toDouble
      case other => fail(s"no numeric total field in baseline: $other")
    }
    assert(math.abs(stored - entrySum) < 0.5,
      f"stored total $stored%.3f is stale vs entry sum $entrySum%.3f — " +
        "regenerate it (tools/bench_check.py prints the entry sum either way)")
  }

  test("every baseline re-record carries provenance (commit + reason)") {
    // VERDICT r17 item 6: the gate is only as honest as its baselines.
    // A re-recorded entry without a committed reason is
    // indistinguishable from a ratchet — require both fields on every
    // rerecords entry so a reviewer can audit each one.
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/bench_baseline.json")), "UTF-8")
    val j = JsonMethods.parse(txt)
    (j \ "rerecords") match {
      case JArray(entries) =>
        entries.foreach { e =>
          val q = (e \ "query") match { case JString(s) => s; case _ => fail(s"rerecord without query: $e") }
          (e \ "commit") match {
            case JString(c) if c.trim.nonEmpty => ()
            case other => fail(s"rerecord $q lacks a commit: $other")
          }
          (e \ "reason") match {
            case JString(r) if r.trim.length > 10 => ()
            case other => fail(s"rerecord $q lacks a substantive reason: $other")
          }
        }
      case JNothing => () // no rerecords yet is fine
      case other => fail(s"rerecords is not an array: $other")
    }
  }

  test("the assembled artifact line carries the gate fields") {
    // Generate the line in-test via the JSON-assembly helper instead
    // of reading whatever tools/last_bench.json a checkout carries
    // (ADVICE r11: a pre-gate-format artifact must not fail the suite)
    val line = Bench.benchJson(
      results = Seq(("q_slow", 2.05, Seq(6.0, 2.1, 2.05)), ("q_fast", 0.2, Seq(0.2, 0.21))),
      errors = Map.empty[String, String],
      sfDir = "/tmp/sf",
      regressed = Seq.empty,
      secondPass = Map("q_slow" -> Seq(2.1, 2.05)),
      withSamples = true)
    assert(line.contains("\"gate_rc\":0"), line)
    assert(line.contains("\"gate_regressed\":[]"), line)
    assert(line.contains("\"gate_second_pass\":{\"q_slow\":[2.100,2.050]}"), line)
    assert(line.contains("\"samples\":{\"q_slow\":[6.000,2.100,2.050],"), line)
    assert(line.contains("\"q_slow\":2.050"), line) // reported min spans both passes
    // errored queries force rc 1 even with no ratio regression
    val errLine = Bench.benchJson(
      results = Seq(("q_bad", 0.01, Seq(0.01))),
      errors = Map("q_bad" -> "boom"),
      sfDir = "/tmp/sf", regressed = Seq.empty, secondPass = Map.empty,
      withSamples = false)
    assert(errLine.contains("\"gate_rc\":1"), errLine)
    assert(!errLine.contains("\"samples\""), errLine)
  }

  test("env gauges ride the samples artifact and stay off the stdout line") {
    // envGauge emits a 6-number JSON array: [heapMb, gcMs, load1,
    // freeGb, sparkLocalMb, scratchMb] — the quantities the
    // cached_rdds census cannot see (VERDICT r18 item 1/7)
    val g = Bench.envGauge()
    val nums = g.stripPrefix("[").stripSuffix("]").split(",")
    assert(g.startsWith("[") && g.endsWith("]"), g)
    assert(nums.length == 6, g)
    nums.foreach(n => assert(n.toDouble >= -1.0, g)) // loadavg is -1 off-Linux
    val line = Bench.benchJson(
      results = Seq(("q_a", 1.0, Seq(1.0))),
      errors = Map.empty[String, String],
      sfDir = "/tmp/sf", regressed = Seq.empty, secondPass = Map.empty,
      withSamples = true, gauges = Map("q_a" -> 0),
      envs = Map("q_a" -> "[1,2,0.10,3.00,4,5]"),
      gateEnv = Map("q_a" -> "[6,7,0.20,8.00,9,10]"))
    assert(line.contains("\"env\":{\"q_a\":[1,2,0.10,3.00,4,5]}"), line)
    assert(line.contains("\"gate_env\":{\"q_a\":[6,7,0.20,8.00,9,10]}"), line)
    val stdoutLine = Bench.benchJson(
      results = Seq(("q_a", 1.0, Seq(1.0))),
      errors = Map.empty[String, String],
      sfDir = "/tmp/sf", regressed = Seq.empty, secondPass = Map.empty,
      withSamples = false, envs = Map("q_a" -> "[1,2,0.10,3.00,4,5]"))
    assert(!stdoutLine.contains("\"env\""), stdoutLine)
  }

  test("gate fields are tail-anchored: gate_rc is the final key, after total") {
    // Round 17's driver artifact kept only the tail of the bench line;
    // the gate fields were head-anchored and the artifact of record
    // silently lost its red verdict. The gate must be the part of the
    // line MOST likely to survive truncation-from-the-front.
    val line = Bench.benchJson(
      results = Seq(("q_a", 1.0, Seq(1.0))),
      errors = Map.empty[String, String],
      sfDir = "/tmp/sf", regressed = Seq("q_a"), secondPass = Map.empty,
      withSamples = false)
    assert(line.endsWith("\"gate_rc\":1}"), line)
    assert(line.indexOf("\"total\":") < line.indexOf("\"gate_second_pass\""), line)
    assert(line.indexOf("\"gate_regressed\"") < line.indexOf("\"gate_rc\""), line)
  }
}
