package graft

import graft.operators.Events
import org.apache.spark.sql.functions.col

class EventsSpec extends SparkSpec {
  import spark.implicits._

  test("funnel: stages count only in strict temporal order, one shuffle") {
    val ev = Seq(
      // u1: full ordered funnel
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // u2: click BEFORE any view — stage 2 not reached
      (2L, "click", 5L), (2L, "view", 10L), (2L, "purchase", 20L),
      // u3: purchase before the qualifying click — stage 3 not reached
      (3L, "view", 10L), (3L, "purchase", 15L), (3L, "click", 20L),
      // u4: view only
      (4L, "view", 10L),
      // u5: no view at all
      (5L, "click", 10L), (5L, "purchase", 20L),
      // u6: later view qualifies the click that follows it
      (6L, "click", 5L), (6L, "view", 10L), (6L, "click", 15L), (6L, "purchase", 25L)
    ).toDF("user_id", "event_type", "ts")
    val out = Events.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("view", 0L, 5L),      // u1 u2 u3 u4 u6
      ("click", 1L, 3L),     // u1, u3 (click@20 after view@10), u6 (second click)
      ("purchase", 2L, 2L)   // u1, u6 — u3's purchase precedes its qualifying click
    ), s"got $out")
    // plan: exactly one exchange on the user key feeds the window stack
    // (a per-stage self-join would scan the events input once per stage)
    val plan = Events.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase")).queryExecution.executedPlan.toString
    val bigExchanges = "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size
    assert(bigExchanges == 1, s"expected one user-key exchange, got $bigExchanges:\n$plan")
  }

  test("retention: cohort = first-seen day, offsets count distinct active users") {
    val day = 86400000000000L
    val ev = Seq(
      (1L, 0L * day), (1L, 0L * day + 5L), (1L, 1L * day), (1L, 3L * day), // cohort 0, days 0/1/3
      (2L, 1L * day), (2L, 2L * day),                                      // cohort 1, days 1/2
      (3L, 1L * day)                                                       // cohort 1, day 1
    ).toDF("user_id", "ts")
    val out = Events.retention(ev, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      (0L, 0L, 1L), (0L, 1L, 1L), (0L, 3L, 1L), // u1: duplicate same-day events collapse
      (1L, 0L, 2L), (1L, 1L, 1L)                // u2+u3 cohort day 1; u2 retained at +1
    ), s"got $out")
  }

  test("funnel on the real events table: monotone non-increasing stage counts") {
    val out = Queries.eventsFunnel(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(out.map(_._1).toSeq == Seq("view", "click", "purchase"))
    val counts = out.map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"funnel must narrow: ${counts.toSeq}")
    assert(counts.head > 0)
  }

  test("topPaths: paths never cross a session or user boundary, counts exact") {
    // u1 session A: v>c>p and c>p>v (4 events -> two 3-grams);
    // 40-min gap; u1 session B: v>c>p again (one 3-gram).
    // u2: v>c>p once. u3: only 2 events — no path.
    val ms = 60000L
    val ev = Seq(
      (1L, "v", 0 * ms, 1L), (1L, "c", 1 * ms, 2L), (1L, "p", 2 * ms, 3L), (1L, "v", 3 * ms, 4L),
      (1L, "v", 50 * ms, 5L), (1L, "c", 51 * ms, 6L), (1L, "p", 52 * ms, 7L),
      (2L, "v", 0 * ms, 8L), (2L, "c", 1 * ms, 9L), (2L, "p", 2 * ms, 10L),
      (3L, "v", 0 * ms, 11L), (3L, "c", 1 * ms, 12L)
    ).toDF("user_id", "event_type", "t", "event_id")
    val out = graft.operators.Events
      .topPaths(ev, "user_id", "event_type", "t", "event_id", n = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // v>c>p: u1 sessions A+B and u2 -> 3 occurrences, 2 users;
    // c>p>v: only inside u1 session A -> 1 occurrence. The 4th u1
    // session-A 3-gram would be p>v + session-B's v — but it CROSSES
    // the 40-min gap, so it must not appear.
    assert(out == Seq(("v>c>p", 3L, 2L), ("c>p>v", 1L, 1L)))
  }

  test("intervalJoin: bin-bucketing equals the naive range join, boundaries inclusive") {
    val rnd = new scala.util.Random(17)
    val points = (0 until 400)
      .map(i => (i.toLong, rnd.nextLong().abs % 100000L))
      .toDF("pid", "t")
    val windows = (0 until 60)
      .map { i =>
        val s = rnd.nextLong().abs % 95000L
        (i.toLong, s, s + 1 + rnd.nextLong().abs % 20000L) // spans 0..3 bins at width 7000
      }
      .toDF("win_id", "w_start", "w_end")
    val got = graft.operators.Events
      .intervalJoin(points, windows, "t", "w_start", "w_end", binWidth = 7000L)
      .select("win_id", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.crossJoin(windows)
      .filter(col("t") >= col("w_start") && col("t") <= col("w_end"))
      .select("win_id", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive, s"missing=${naive -- got} extra=${got -- naive}")
    // exact boundary points are included on both ends
    val bp = Seq((100L, 50L), (101L, 60L), (102L, 49L), (103L, 61L)).toDF("pid", "t")
    val bw = Seq((1L, 50L, 60L)).toDF("win_id", "w_start", "w_end")
    val hits = graft.operators.Events
      .intervalJoin(bp, bw, "t", "w_start", "w_end", binWidth = 7L)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(hits == Set(100L, 101L))
  }

  test("intervalJoin floors bins on negative timestamps (DIV-truncation trap)") {
    // window [-5, 5] and points straddling zero: truncate-toward-zero
    // bucketing would put t=-3 in bin 0 alongside t=3 but compute the
    // window's start bin as 0 too — missing the pre-epoch points when
    // the window is [-15, -5]. Brute-force parity over a signed domain.
    val points = (-30L to 30L).map(t => (t + 100, t)).toDF("pid", "t")
    val windows = Seq((1L, -15L, -5L), (2L, -5L, 5L), (3L, 5L, 15L))
      .toDF("win_id", "w_start", "w_end")
    val got = graft.operators.Events
      .intervalJoin(points, windows, "t", "w_start", "w_end", binWidth = 7L)
      .select("win_id", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.crossJoin(windows)
      .filter(col("t") >= col("w_start") && col("t") <= col("w_end"))
      .select("win_id", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive, s"missing=${naive -- got} extra=${got -- naive}")
    assert(naive.count(_._1 == 1L) == 11, "the pre-epoch window has 11 points")
  }

  test("intervalJoin plan: equi-join on the bin, no cartesian/BNLJ") {
    val points = (0 until 50).map(i => (i.toLong, i * 100L)).toDF("pid", "t")
    val windows = (0 until 5).map(i => (i.toLong, i * 1000L, i * 1000L + 500L))
      .toDF("win_id", "w_start", "w_end")
    val plan = graft.operators.Events
      .intervalJoin(points, windows, "t", "w_start", "w_end", binWidth = 500L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join must become an equi-join on the bin:\n$plan")
  }
}
