package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Bench {

  /** Fixed, data-independent calibration workloads that measure the BOX,
    * not the code: the round-9 driver run landed 1.38x warm / 4.15x cold
    * on a commit the builder box measured at 1.12x/1.04x the same
    * morning (the driver's sbt took 18:29 vs 7:19 — a ~2.5x-slower or
    * contended machine), flagging 12 healthy queries. Each workload
    * isolates one cost axis the suite actually spends time on:
    *
    *  - `sched`: 12 trivial 32-partition jobs — per-job scheduling
    *    overhead, the axis that dominates the tiny (<0.5 s) queries and
    *    the stream family's trigger latency.
    *  - `cpu1`: one long single-partition codegen loop — single-thread
    *    CPU speed, the axis behind janino/JIT compile time (the cold
    *    column's dominant cost).
    *  - `cpu32`: the same loop split over 32 partitions — parallel
    *    throughput under full fan-out, the axis contention hits first.
    *  - `shuffle`: a small groupBy — exchange machinery (serialize,
    *    spill files, fetch).
    *
    * The observed/baseline ratio per workload, aggregated by MEDIAN
    * (robust to one workload hitting a transient spike), gives a scalar
    * box factor; every per-query comparison divides by it. Calibration
    * runs once before each suite pass: the COLD factor uses pass A alone
    * (one sample, same as each query's cold sample — if the box is
    * contended during pass 1, A captures the same contention), the WARM
    * factor uses the per-workload min of A and B (same min-of-passes
    * policy as the warm query column). Factors are clamped to [0.5, 8]:
    * outside that range the box is not comparable and the raw numbers
    * (always reported alongside) are the only meaningful signal.
    */
  private val calibWorkloads: Seq[(String, SparkSession => Unit)] = Seq(
    "sched" -> { s => (1 to 12).foreach(_ => s.range(0, 32, 1, 32).count()) },
    "cpu1" -> { s =>
      s.range(0, 400000000L, 1, 1)
        .select(sum(col("id") % 7 + col("id") / 3)).head()
    },
    "cpu32" -> { s =>
      s.range(0, 6400000000L, 1, 32)
        .select(sum(col("id") % 7 + col("id") / 3)).head()
    },
    "shuffle" -> { s =>
      s.range(0, 20000000L, 1, 32)
        .select((col("id") % 1000000L).as("k"))
        .groupBy("k").agg(count(lit(1)).as("c"))
        .select(sum(col("c"))).head()
    })

  private def calibPass(spark: SparkSession): Map[String, Double] =
    calibWorkloads.map { case (name, work) =>
      val t0 = System.nanoTime()
      work(spark)
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap

  private def medianRatio(
      obs: Map[String, Double],
      base: Map[String, Double]): Double = {
    val rs = calibWorkloads.flatMap { case (n, _) =>
      for (o <- obs.get(n); b <- base.get(n) if b > 0) yield o / b
    }.sorted
    if (rs.isEmpty) 1.0
    else {
      val m =
        if (rs.size % 2 == 1) rs(rs.size / 2)
        else (rs(rs.size / 2 - 1) + rs(rs.size / 2)) / 2.0
      math.min(8.0, math.max(0.5, m))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: touch every table once so parquet footer reads,
    // filesystem listing and codegen warmup don't land on whichever
    // query happens to run first.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try {
        if (t == "events") graft.Tables.events(spark, sfDir).count()
        else spark.read.parquet(s"$sfDir/$t.parquet").count()
      } catch { case _: Throwable => () }
    }
    // Two passes over the suite. Pass 1 is cold (includes one-time codegen
    // and index builds — the IVF KMeans fit is memoized per session, so
    // pass 2's ann_probe measures the probe, the amortized production cost
    // of a persisted index). `queries` reports the per-query MIN — robust
    // to transient box noise (round-3's driver run showed a contiguous
    // alphabetical window of 2-6x slowdowns from a stale CPU-burning JVM,
    // not from any plan change) — and `cold_queries` reports pass 1
    // verbatim so cold-path regressions can never hide behind the min.
    // The checked-in baseline (BASELINE.md / baseline_sf01.txt) was
    // captured by THIS two-pass method: vs_baseline compares min to min
    // and vs_baseline_cold compares cold to cold, both apples-to-apples.
    def onePass(): Seq[(String, Either[String, Double])] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val r =
          try { fn(spark, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
          catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              Left(e.getClass.getSimpleName)
          }
        name -> r
      }
    val calibA = calibPass(spark) // rides pass 1's box conditions
    val cold = onePass()
    val calibB = calibPass(spark) // warm: same min-of-passes policy
    val warm = onePass().toMap
    val calibMin = calibWorkloads.map { case (n, _) =>
      n -> math.min(calibA(n), calibB(n))
    }.toMap
    // A query is a success only if BOTH passes succeeded (a single-pass
    // failure is flaky, not fast); failed_cold/failed_warm expose which
    // pass broke.
    val results: Seq[(String, Either[String, Double])] = cold.map {
      case (name, Right(c)) =>
        name -> (warm.get(name) match {
          case Some(Right(w)) => Right(math.min(c, w))
          case Some(Left(e))  => Left(e)
          case None           => Left("missing_warm_pass")
        })
      case (name, left) => name -> left
    }
    val ok = results.collect { case (k, Right(_)) => k }.toSet
    val coldOk = cold.collect { case (k, Right(v)) if ok(k) => k -> v }
    val coldTotal = coldOk.map(_._2).sum
    // 3dp: ms resolution is below the box's run-to-run noise, and the
    // shorter line keeps more per-query entries inside the driver's
    // bounded stdout-tail capture.
    def jmap(xs: Seq[(String, Either[String, Double])]): String = xs.map {
      case (k, Right(v))  => "\"" + k + "\":" + f"$v%.3f"
      case (k, Left(err)) => "\"" + k + "\":\"error:" + err + "\""
    }.mkString("{", ",", "}")
    val qs = jmap(results)
    val coldQs = jmap(cold)
    val total = results.collect { case (_, Right(v)) => v }.sum
    val nFailed = results.count(_._2.isLeft)
    val nFailedCold = cold.count(_._2.isLeft)
    val nFailedWarm = warm.count(_._2.isLeft)
    // Regression diff against the checked-in sf0.1 baseline (BASELINE.md
    // twin; resource lines are "<query> <min_sec> <cold_sec>", captured by
    // this same two-pass method; `__calib_*` rows are the calibration
    // workloads' baselines, excluded from the query comparison). Ratios
    // make the "within 2x of baseline" gate computable per round, on both
    // the warm-min and cold paths, CALIBRATED by the box factor so the
    // gate measures the code and not the machine; raw (uncalibrated)
    // ratios are reported alongside so nothing is hidden.
    val baselineAll: Map[String, (Double, Double)] = {
      val in = getClass.getResourceAsStream("/graft/baseline_sf01.txt")
      if (in == null) Map.empty
      else scala.io.Source.fromInputStream(in)(scala.io.Codec.UTF8).getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .flatMap { l =>
          l.split("\\s+") match {
            case Array(n, m, c) => Some(n -> (m.toDouble, c.toDouble))
            case _              => None
          }
        }.toMap
    }
    val baseline = baselineAll.view.filterKeys(!_.startsWith("__calib_")).toMap
    val calibBaseWarm = calibWorkloads.flatMap { case (n, _) =>
      baselineAll.get(s"__calib_$n").map(v => n -> v._1)
    }.toMap
    val calibBaseCold = calibWorkloads.flatMap { case (n, _) =>
      baselineAll.get(s"__calib_$n").map(v => n -> v._2)
    }.toMap
    val fWarm = medianRatio(calibMin, calibBaseWarm)
    val fCold = medianRatio(calibA, calibBaseCold)
    val calibJson = calibWorkloads.map { case (n, _) =>
      f""""$n":{"cold":${calibA(n)}%.3f,"min":${calibMin(n)}%.3f""" +
        calibBaseWarm.get(n).map(b =>
          f""","base_min":$b%.3f,"base_cold":${calibBaseCold(n)}%.3f""").getOrElse("") + "}"
    }.mkString("{", ",", "}")
    // Record the JVM's heap/GC flags so a cold-column divergence can be
    // attributed (or not) to a different memory/GC configuration.
    val jvmFlags = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getRuntimeMXBean.getInputArguments.asScala
        .filter(a => a.startsWith("-Xmx") || a.startsWith("-Xms") ||
          a.contains("UseG1GC") || a.contains("UseParallelGC") || a.contains("UseZGC"))
        .mkString(" ")
    }
    val extra =
      if (baseline.isEmpty || !sfDir.contains("sf0.1")) ""
      else {
        // flag queries >2x the CALIBRATED baseline AND >0.3s (calibrated)
        // absolute (codegen jitter floor): both thresholds scale by the
        // box factor, so the flag means "slow relative to THIS box's
        // demonstrated speed", reproducible across machines.
        def regs(cur: Seq[(String, Double)], base: String => Double, f: Double): String =
          cur.collect {
            case (k, v) if v > 2 * base(k) * f && v - base(k) * f > 0.3 * f =>
              "\"" + k + "\":" + f"${v / (base(k) * f)}%.2f"
          }.mkString("{", ",", "}")
        val shared = results.collect { case (k, Right(v)) if baseline.contains(k) => k -> v }
        val sharedCold = coldOk.filter { case (k, _) => baseline.contains(k) }
        val baseTotal = shared.map { case (k, _) => baseline(k)._1 }.sum
        val baseColdTotal = sharedCold.map { case (k, _) => baseline(k)._2 }.sum
        val ratioRaw = if (baseTotal > 0) shared.map(_._2).sum / baseTotal else 1.0
        val ratioColdRaw = if (baseColdTotal > 0) sharedCold.map(_._2).sum / baseColdTotal else 1.0
        f""","baseline_total":$baseTotal%.2f,"vs_baseline":${ratioRaw / fWarm}%.3f,"vs_baseline_raw":$ratioRaw%.3f""" +
          f""","regressions":${regs(shared, baseline(_)._1, fWarm)}""" +
          f""","baseline_cold_total":$baseColdTotal%.2f,"vs_baseline_cold":${ratioColdRaw / fCold}%.3f""" +
          f""","vs_baseline_cold_raw":$ratioColdRaw%.3f,"regressions_cold":${regs(sharedCold, baseline(_)._2, fCold)}""" +
          f""","box_factor":$fWarm%.3f,"box_factor_cold":$fCold%.3f,"calibration":$calibJson,"jvm_flags":"$jvmFlags""""
      }
    val full = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"cold_queries":$coldQs,"failed":$nFailed,"failed_cold":$nFailedCold,"failed_warm":$nFailedWarm,"cold_total":$coldTotal%.2f$extra,"sf":"$sfDir"}"""
    println(full)
    // The driver captures only a bounded TAIL of stdout (every published
    // BENCH_r*.json so far has parsed:null because the full line above
    // outgrew that window). Persist the full JSON to a file and finish
    // with a compact per-total summary line that fits any tail window,
    // so a last-JSON-line parser always has something valid to read.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_full.json"), full + "\n")
    catch { case _: Throwable => () }
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","failed":$nFailed,"failed_cold":$nFailedCold,"failed_warm":$nFailedWarm,"cold_total":$coldTotal%.2f$extra,"sf":"$sfDir","queries_file":"bench_full.json"}""")
    spark.stop()
  }
}
