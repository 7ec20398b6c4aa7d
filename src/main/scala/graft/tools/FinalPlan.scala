package graft.tools
import graft._
import org.apache.spark.sql.SparkSession
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    println("SCANS=" + "Scan parquet".r.findAllMatchIn(p).size)
    println("REUSED_EXCHANGES=" + "ReusedExchange".r.findAllMatchIn(p).size)
    println("REUSED_SUBTREES=" + "ReusedSubquery".r.findAllMatchIn(p).size)
    spark.stop()
  }
}
