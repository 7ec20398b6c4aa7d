package graft.tools

import graft._
import org.apache.spark.sql.SparkSession

/** Archive per-query formatted plans for round-over-round diffing:
  *   runMain graft.tools.Plans <sfDir> <outDir>
  * writes `<outDir>/<query>.txt` with `explain("formatted")` output.
  * A lost broadcast, a new Sort, or a vanished PushedFilters shows up
  * as a one-line diff between rounds instead of a bench regression
  * hunt.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 1) args(1) else "plans"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        // strip plan ids and temp paths so diffs are stable across runs
        val stable = plan
          .replaceAll("#\\d+", "#x")
          .replaceAll("plan_id=\\d+", "plan_id=x")
          .replaceAll("/tmp/[^\\s,\\]]*", "/tmp/...")
          .replaceAll("@[0-9a-f]+", "@x") // JVM identity hash of reference objects
          // lambda-variable numbering and lambda-class ids shift whenever an
          // unrelated query is added/removed earlier in the session — pure noise
          .replaceAll("lambda ([a-z]+)_\\d+", "lambda $1_n")
          .replaceAll("Lambda\\$\\d+/0x[0-9a-f]+", "Lambda\\$n")
          // RDD ids count up per session — same run-order noise as plan ids
          .replaceAll("RDD\\[\\d+\\]", "RDD[n]")
        java.nio.file.Files.writeString(java.nio.file.Paths.get(outDir, s"$name.txt"), stable)
        println(s"[plans] $name ok")
      } catch {
        case e: Throwable => println(s"[plans] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
