package graft.tools
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      (1 to 3).foreach { p =>
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        println(f"[timeq] $q pass$p ${(System.nanoTime()-t0)/1e9}%.3f s ($n rows)")
      }
    }
    spark.stop()
  }
}
