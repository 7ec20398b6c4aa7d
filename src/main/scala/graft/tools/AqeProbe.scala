package graft.tools
import org.apache.spark.sql.SparkSession

/** In-process A/B of AQE small-partition coalescing for the bench's
  * local[32] shape: times each named query min-of-3 with
  * `coalescePartitions.parallelismFirst` at its default (true), then
  * flipped (false), interleaved in one JVM so box noise cancels.
  * Usage: runMain graft.tools.AqeProbe <q1,q2,...>
  */
object AqeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args(0).split(",").toSeq
    def run(q: String): Double = {
      val fn = graft.SparkEntry.queries(q)
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count(): Unit
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    names.foreach(q => run(q)) // warm codegen for every query first
    names.foreach { q =>
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      val a = run(q)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      val b = run(q)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      val a2 = run(q)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      val b2 = run(q)
      println(f"[aqeprobe] $q pfirst=true ${math.min(a, a2)}%.3f  pfirst=false ${math.min(b, b2)}%.3f")
    }
    spark.stop()
  }
}
