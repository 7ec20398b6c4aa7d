package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Driver-latency audit: for each named query, run it once cold
  * (builds/memos) and once warm, printing every job the WARM execution
  * fires with its description and stage count — the method that found
  * every round-11/12 per-probe driver-latency bug (see memory: a
  * SparkListener counting onJobStart between warm executions). Usage:
  *
  *   runMain graft.tools.JobAudit <sfDir> <q1,q2,...>
  */
object JobAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties).flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        val stages = e.stageInfos
          .map(s => s"${s.name.takeWhile(_ != '\n').take(70)}[${s.numTasks}t]")
          .mkString(" | ")
        jobs.add(s"job ${e.jobId}: ${e.stageInfos.size} stage(s) — $desc — $stages")
        ()
      }
    }
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // cold: builds, writes, memoizes
      org.apache.spark.GraftMainBridge.waitListenerBusEmpty(spark.sparkContext, 30000)
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val warmMs = (System.nanoTime() - t0) / 1e6
      org.apache.spark.GraftMainBridge.waitListenerBusEmpty(spark.sparkContext, 30000)
      spark.sparkContext.removeSparkListener(listener)
      println(f"[jobaudit] $name warm ${warmMs}%.0f ms, ${jobs.size} job(s):")
      jobs.forEach(j => println(s"[jobaudit]   $j"))
    }
    spark.stop()
  }
}
