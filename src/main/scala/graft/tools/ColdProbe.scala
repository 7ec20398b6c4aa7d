package graft.tools

import org.apache.spark.sql.SparkSession

/** First-execution cost profiler — the round-11 verdict's
  * `bloom_decontaminate` finding (cold 163 s of real task CPU vs 0.63 s
  * warm, same tasks/bytes, same JVM) is a class of bug correctness
  * tests cannot see: the FIRST execution of a freshly generated stage
  * runs in a slow mode (HotSpot interpreter before JIT, janino
  * interpreted fallback, code-cache-full no-compile) that the second
  * execution never pays because `CodeGenerator.cache` returns the same
  * loaded class with its hot machine code.
  *
  * For each named query this main runs THREE timed executions in one
  * fresh JVM and, around each, snapshots the JVM's cumulative JIT
  * compilation time (`CompilationMXBean`) and code-heap pool usage —
  * the two discriminators between "task threads burned cpu
  * interpreting" (compile-time delta small, wall huge) and "compiler
  * churned" (compile-time delta ≈ wall). Run with
  * `-XX:TieredStopAtLevel=0` to measure the interpreted-execution
  * ceiling directly, or `-XX:ReservedCodeCacheSize=32m` to reproduce
  * the code-cache-full mode.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ColdProbe q1 q2 …
  */
object ColdProbe {

  private def jitMs: Long = {
    val c = java.lang.management.ManagementFactory.getCompilationMXBean
    if (c != null && c.isCompilationTimeMonitoringSupported) c.getTotalCompilationTime else -1L
  }

  private def codeHeapUsedKb: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(p => p.getName.startsWith("CodeHeap") || p.getName == "Code Cache")
      .map(_.getUsage.getUsed).sum / 1024
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_CODEGEN_MODE").foreach { m =>
      spark.conf.set("spark.sql.codegen.factoryMode", m) // CODEGEN_ONLY | NO_CODEGEN
    }
    // Same untimed warmup as Bench: table footers + listing off the clock.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try {
        if (t == "events") graft.Tables.events(spark, sfDir).count()
        else spark.read.parquet(s"$sfDir/$t.parquet").count()
      } catch { case _: Throwable => () }
    }
    val names = if (args.nonEmpty) args.toSeq else Seq("bloom_decontaminate", "decontaminate_spans")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // Optional: replicate Bench's sf0.001 dry-run warmup before the
      // timed passes — the probe for "does the small-SF dry run actually
      // pre-compile this query's large-SF stages?" (AQE can re-plan at
      // the larger SF into stages the small run never generated; their
      // first execution then pays the interpreter/JIT on the timed
      // cold pass despite the warmup).
      sys.env.get("SPARK_GRAFT_COLDPROBE_WARMUP_DIR").foreach { wd =>
        val jit0 = jitMs
        val t0 = System.nanoTime()
        try fn(spark, wd).count()
        catch { case e: Throwable => println(s"[coldprobe] $name warmup failed: ${e.getMessage}") }
        println(f"[coldprobe] $name warmup@$wd wall=${(System.nanoTime() - t0) / 1e9}%.3f s jit_delta=${jitMs - jit0} ms")
      }
      (1 to 3).foreach { pass =>
        val jit0 = jitMs; val ch0 = codeHeapUsedKb
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[coldprobe] $name pass=$pass rows=$n wall=$sec%.3f s jit_delta=${jitMs - jit0} ms codeheap_delta=${codeHeapUsedKb - ch0} KB codeheap=${codeHeapUsedKb} KB")
      }
    }
    spark.stop()
  }
}
