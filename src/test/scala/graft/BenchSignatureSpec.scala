package graft

import org.scalatest.funsuite.AnyFunSuite

/** The cold-flag signature classifier is the artifact's
  * self-adjudication (BENCH_r*.json `cold_signatures`); each class has
  * to fire on the metric shape it documents — in particular the
  * round-12 fix: identical tasks/jobs/shuffle bytes with inflated CPU
  * is `firstexec` (interpreter exposure of fresh codegen — interpreted
  * execution IS CPU), not `work`.
  */
class BenchSignatureSpec extends AnyFunSuite {

  private def m(tasks: Long, jobs: Long, cpuMs: Long, runMs: Long, gcMs: Long = 0,
                shr: Long = 0, shw: Long = 0, jitMs: Long = 0, wallMs: Long = 0): Bench.QueryMetrics = {
    val q = new Bench.QueryMetrics
    q.tasks = tasks; q.jobs = jobs; q.cpuNs = cpuMs * 1000000L; q.runMs = runMs
    q.gcMs = gcMs; q.shuffleRead = shr; q.shuffleWrite = shw
    q.jitMs = jitMs; q.wallMs = if (wallMs > 0) wallMs else runMs
    q
  }

  test("gc: GC dominating task run time") {
    val cold = m(32, 2, 900, 1000, gcMs = 400)
    assert(Bench.signature(cold, m(32, 2, 100, 120)) === "gc")
  }

  test("jit: compiler churn dominating wall") {
    val cold = m(32, 2, 400, 500, jitMs = 3000, wallMs = 4000)
    assert(Bench.signature(cold, m(32, 2, 100, 120)) === "jit")
  }

  test("stall: wall mostly outside tasks") {
    val cold = m(32, 2, 300, 350, wallMs = 5000)
    assert(Bench.signature(cold, m(32, 2, 100, 120)) === "stall")
  }

  test("firstexec: inflated cpu at IDENTICAL tasks/jobs/shuffle bytes (round-12 mislabel)") {
    // the curation_report/decontaminate_spans shape: cpu ≈ run, 9-11x
    // warm, same counts and bytes — interpreter exposure, not new work
    val cold = m(64, 3, 9000, 9500, shr = 1000000, shw = 2000000, wallMs = 10000)
    val warm = m(64, 3, 900, 1000, shr = 1010000, shw = 1990000, wallMs = 1100)
    assert(Bench.signature(cold, warm) === "firstexec")
  }

  test("work: inflated cpu at DIFFERENT work (cold-only jobs/tasks)") {
    val cold = m(128, 9, 9000, 9500, shr = 9000000, wallMs = 10000)
    val warm = m(64, 3, 900, 1000, shr = 1000000, wallMs = 1100)
    assert(Bench.signature(cold, warm) === "work")
  }

  test("shuffle-byte jitter within 10% still counts as same work") {
    val cold = m(64, 3, 9000, 9500, shr = 1000000, shw = 0, wallMs = 10000)
    val warm = m(64, 3, 900, 1000, shr = 1080000, shw = 0, wallMs = 1100)
    assert(Bench.signature(cold, warm) === "firstexec")
  }

  test("box: inflated run without a dominating cause") {
    val cold = m(32, 2, 300, 1000, wallMs = 1200)
    val warm = m(32, 2, 250, 300, wallMs = 350)
    assert(Bench.signature(cold, warm) === "box")
  }
}
