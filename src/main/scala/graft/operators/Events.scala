package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Event-table temporal operators. */
object Events {

  /** INTERVAL (range) JOIN at scale — points matched to the windows
    * containing them with NO shared equi key. The naive plan for
    * `p.ts BETWEEN w.start AND w.end` is a broadcast-nested-loop (or
    * worse, a cartesian): O(|P|·|W|) comparisons, the classic 100 TB
    * melter. Bin-bucketing converts it to an EQUI-join: every window
    * explodes into the fixed-width time bins it overlaps, every point
    * maps to its single bin, the shuffle key is the bin, and the
    * exact range predicate only filters same-bin candidates. A
    * (window, point) pair can meet in at most one bin — the point's —
    * so no dedup pass is needed. Shuffle cost: each window is
    * replicated once per overlapped bin; pick `binWidth` near the
    * typical window length to keep that factor ~2. All time math is
    * integer and uses FLOOR division — `DIV` truncates toward zero,
    * which puts t = −1 and t = +1 in the same bin 0 and silently
    * drops matches on any signed time domain (pre-epoch timestamps,
    * relative offsets); `(t − pmod(t, w)) DIV w` floors exactly in
    * long arithmetic (never doubles at ns/ms scale).
    */
  def intervalJoin(
      points: DataFrame,
      windows: DataFrame,
      tsCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long,
      maxBinsPerWindow: Long = 100000L
  ): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive (got $binWidth)")
    def floorBin(c: String): Column =
      expr(s"($c - pmod($c, ${binWidth}L)) DIV ${binWidth}L")
    // guard the explode: a corrupt outlier window (Long.MaxValue
    // sentinel end, or a caller whose binWidth is sized for a
    // different time unit) would otherwise build one multi-billion-
    // element bin array and kill the executor — fail fast WITH the
    // offending span instead (same contract as the block guards
    // elsewhere); reversed windows (end < start) match nothing in the
    // naive BETWEEN join, so they are dropped, not exploded
    val w = windows
      .filter(col(endCol) >= col(startCol))
      .withColumn("_binspan", floorBin(endCol) - floorBin(startCol) + 1L)
      .withColumn("_bin", explode(
        when(col("_binspan") <= maxBinsPerWindow,
          sequence(floorBin(startCol), floorBin(endCol)))
          .otherwise(raise_error(concat(
            lit(s"intervalJoin: a window spans "), col("_binspan").cast("string"),
            lit(s" bins (> maxBinsPerWindow=$maxBinsPerWindow) — widen binWidth " +
              "or filter outlier windows"))))))
      .drop("_binspan")
    val p = points.withColumn("_bin", floorBin(tsCol))
    p.join(w, Seq("_bin"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_bin")
  }

  /** Session PATH analysis (the ClickHouse `sequenceCount`/path-report
    * family): the top-k most common length-`n` event-type paths, where
    * a path is `n` CONSECUTIVE events of one user within one session
    * (same 30-minute inactivity boundary as sessionization). One
    * shuffle on the user key with a lag + running-sum session id and
    * n−1 leads over the SAME user-ordered sort (a single
    * Exchange+Sort, never a per-user collect), then a map-side-combined
    * hash aggregation on the path string and a bounded TakeOrdered —
    * the 100 TB shape: per-user windows partition cleanly, the agg
    * carries one row per DISTINCT path per task.
    *
    * `tsCol` must be epoch MILLIS (caller normalizes); ordering ties
    * break on `idCol` so the report is deterministic.
    */
  def topPaths(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      idCol: String,
      n: Int = 3,
      gapMs: Long = 1800000L,
      topK: Int = 20
  ): DataFrame = {
    require(n >= 2, s"a path needs >= 2 steps (got $n)")
    val wOrd = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessioned = events
      .select(col(userCol), col(typeCol), col(tsCol), col(idCol))
      .withColumn("_pt", lag(col(tsCol), 1).over(wOrd))
      .withColumn("_brk",
        when(col("_pt").isNull || col(tsCol) - col("_pt") > gapMs, 1L).otherwise(0L))
      .withColumn("_sid", sum("_brk").over(wRun))
    val steps = (1 until n).map(i => lead(col(typeCol), i).over(wOrd).as(s"_s$i"))
    val sids = (1 until n).map(i => lead(col("_sid"), i).over(wOrd).as(s"_g$i"))
    val withSteps = sessioned.select(
      (col(userCol) +: col(typeCol).as("_s0") +: col("_sid") +: (steps ++ sids)): _*)
    withSteps
      // the whole path must lie inside ONE session of this user
      .filter((1 until n).map(i => col(s"_g$i") === col("_sid")).reduce(_ && _))
      .select(col(userCol),
        concat_ws(">", (0 until n).map(i => col(s"_s$i")): _*).as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("occurrences"), countDistinct(col(userCol)).as("n_users"))
      .orderBy(col("occurrences").desc, col("path"))
      .limit(topK)
  }

  /** Ordered conversion FUNNEL over an event stream: how many users
    * reached each stage of `stages` in strict temporal order (stage
    * i+1 counts only when it happens strictly AFTER the user's first
    * qualifying stage-i event). Computed in ONE scan: one shuffle on
    * the user key, then a stack of running-min windows over the same
    * sort — window k's running "first qualifying stage-k time" feeds
    * the qualification predicate of window k+1, so Spark plans a
    * single Exchange+Sort with k window frames over it, never a
    * self-join per stage (the naive formulation joins the events table
    * once per stage — k corpus scans at 100 TB).
    *
    * Correctness of the running-min trick: at any row, the running min
    * of qualifying stage-k times equals the user's GLOBAL first
    * qualifying stage-k time whenever any qualifying event precedes
    * the row — the global first is itself the earliest, so it is in
    * every prefix that contains any qualifying event.
    *
    * Returns one row per stage: (stage, stage_index, users).
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      stages: Seq[String]
  ): DataFrame = {
    require(stages.nonEmpty)
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // _f0 = running first 'stages(0)' time; _fk = running first
    // 'stages(k)' time strictly after _f(k-1)
    val staged = stages.zipWithIndex.foldLeft(events.select(col(userCol), col(typeCol), col(tsCol))) {
      case (df, (stage, 0)) =>
        df.withColumn("_f0", min(when(col(typeCol) === stage, col(tsCol))).over(w))
      case (df, (stage, i)) =>
        df.withColumn(s"_f$i",
          min(when(col(typeCol) === stage && col(tsCol) > col(s"_f${i - 1}"), col(tsCol))).over(w))
    }
    val reachedAggs = stages.indices.map(i =>
      (max(when(col(s"_f$i").isNotNull, 1L).otherwise(0L)) === 1L).as(s"_r$i"))
    val reached = staged.groupBy(col(userCol)).agg(reachedAggs.head, reachedAggs.tail: _*)
    val countAggs = stages.indices.map(i => sum(when(col(s"_r$i"), 1L).otherwise(0L)).as(s"_c$i"))
    val counts = reached.agg(countAggs.head, countAggs.tail: _*)
    val stageRows = stages.zipWithIndex.map { case (st, i) => (st, i.toLong) }.toDF("stage", "stage_index")
    stageRows
      .crossJoin(broadcast(counts))
      .withColumn("users",
        coalesce(stages.indices.map(i => when(col("stage_index") === i, col(s"_c$i"))): _*))
      .select("stage", "stage_index", "users")
      .orderBy("stage_index")
  }

  /** Cohort RETENTION matrix: users bucketed by first-seen day (their
    * cohort), counted on each later active day as an offset from the
    * cohort day — the standard "day-N retention" analytics readout.
    * Shape: one distinct on (user, day) — a partial-agg shuffle — one
    * full-partition min window on the user key (same exchange), one
    * final (cohort, offset) aggregation. No self-join, nothing
    * driver-side; `dayDivisor` converts the raw ts unit to days (ns by
    * default, matching the normalized events table).
    */
  def retention(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      dayDivisor: Long = 86400000000000L
  ): DataFrame = {
    val days = events
      .select(col(userCol), expr(s"$tsCol DIV $dayDivisor").as("day"))
      .distinct()
    val cohorted = days.withColumn("cohort",
      min(col("day")).over(Window.partitionBy(col(userCol))))
    cohorted
      .groupBy(col("cohort"), (col("day") - col("cohort")).as("day_offset"))
      .agg(count(lit(1)).as("users")) // (user, day) is distinct ⇒ a count IS distinct users
      .orderBy("cohort", "day_offset")
  }

  /** As-of lookup within one table: for every row, the most recent
    * value of `markerValue` at rows satisfying `markerPred`, looking
    * backward in (timeCol, tieCol) order per key. The classic as-of
    * join expressed as a running `max` window — one shuffle on the key,
    * no self-join, no point-in-time probe per row (which is what makes
    * naive as-of joins explode at scale).
    */
  def asOfLastMarker(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      tieCol: String,
      markerPred: Column,
      markerValue: Column,
      outName: String
  ): DataFrame = {
    val w = Window
      .partitionBy(keyCol)
      .orderBy(col(timeCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_marker", when(markerPred, markerValue))
      .withColumn(outName, max(col("_marker")).over(w))
      .drop("_marker")
  }

  /** General two-table as-of join (trades/quotes style): for every left
    * row, the `rightVal` of the most recent right row with the same key
    * and time ≤ the left row's time. Expressed as union + one running
    * window — ONE shuffle on the key, never a per-row point-in-time
    * probe or a range self-join (the shapes that explode at scale).
    *
    * Tie semantics: a right row at exactly the left row's time IS
    * visible (right rows sort before left rows at equal times).
    * `rightVal` must be max-monotone-encodable (the running max carries
    * a (time, value) struct so the LATEST — not largest — value wins).
    */
  def asOfJoin(
      left: DataFrame,   // (keyCol, timeCol, ...payload)
      right: DataFrame,  // (keyCol, timeCol, rightVal)
      keyCol: String,
      timeCol: String,
      rightVal: String,
      outName: String
  ): DataFrame = {
    val l = left.withColumn("_side", lit(1))
      .withColumn("_rv", lit(null).cast(right.schema(rightVal).dataType))
    val r = right
      .select(col(keyCol), col(timeCol), col(rightVal).as("_rv"))
      .withColumn("_side", lit(0))
    val all = l.unionByName(r, allowMissingColumns = true)
    // right rows (side 0) sort before left rows at equal times → visible
    val w = Window
      .partitionBy(keyCol)
      .orderBy(col(timeCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry (time, value): max over structs picks the latest right row
    val carried = max(when(col("_side") === 0, struct(col(timeCol), col("_rv")))).over(w)
    all
      .withColumn(outName, carried.getField("_rv"))
      .filter(col("_side") === 1)
      .drop("_side", "_rv")
  }
}
