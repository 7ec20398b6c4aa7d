package graft
import org.apache.spark.sql.SparkSession
object Bench {
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
    val cold = onePass()
    val warm = onePass().toMap
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
    // this same two-pass method). Ratios make the "within 2x of baseline"
    // gate computable per round, on both the warm-min and cold paths.
    val baseline: Map[String, (Double, Double)] = {
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
    val extra =
      if (baseline.isEmpty || !sfDir.contains("sf0.1")) ""
      else {
        // flag queries >2x baseline AND >0.3s absolute (codegen jitter floor)
        def regs(cur: Seq[(String, Double)], base: String => Double): String =
          cur.collect {
            case (k, v) if v > 2 * base(k) && v - base(k) > 0.3 =>
              "\"" + k + "\":" + f"${v / base(k)}%.2f"
          }.mkString("{", ",", "}")
        val shared = results.collect { case (k, Right(v)) if baseline.contains(k) => k -> v }
        val sharedCold = coldOk.filter { case (k, _) => baseline.contains(k) }
        val baseTotal = shared.map { case (k, _) => baseline(k)._1 }.sum
        val baseColdTotal = sharedCold.map { case (k, _) => baseline(k)._2 }.sum
        val ratio = if (baseTotal > 0) shared.map(_._2).sum / baseTotal else 1.0
        val ratioCold = if (baseColdTotal > 0) sharedCold.map(_._2).sum / baseColdTotal else 1.0
        f""","baseline_total":$baseTotal%.2f,"vs_baseline":$ratio%.3f,"regressions":${regs(shared, baseline(_)._1)}""" +
          f""","baseline_cold_total":$baseColdTotal%.2f,"vs_baseline_cold":$ratioCold%.3f,"regressions_cold":${regs(sharedCold, baseline(_)._2)}"""
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
