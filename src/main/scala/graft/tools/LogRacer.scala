package graft.tools

import graft.operators.LayoutLog
import org.apache.spark.sql.SparkSession

/** Cross-PROCESS commit racer for [[LayoutLog]]'s CAS protocol — the
  * executable half of CrossProcessCasSpec. LayoutLogSpec races threads
  * inside one JVM, but the protocol's actual claim is multi-DRIVER
  * safety: two separate Spark drivers appending to the same layout must
  * serialize through the no-overwrite rename with no lost or duplicated
  * versions. Only a real process boundary exercises that (separate
  * FileSystem instances, separate page caches, true kernel-level rename
  * atomicity — nothing shared but the directory).
  *
  * Usage: runMain graft.tools.LogRacer <layoutDir> <tag> <n> <gateFile>
  *
  * Prints READY once the session is up, then spins until `gateFile`
  * exists (the spec releases all racers at once so the commit loops
  * genuinely overlap), then commits `n` append-class verbs, each
  * observing the current version fresh (the realistic continuous-writer
  * shape). Output: one `COMMIT <tag> <version>` line per landed verb,
  * then `DONE <tag> <n>`. Exit 0 on success; any protocol exception
  * crashes the process (the spec reads exit codes).
  */
object LogRacer {
  def main(args: Array[String]): Unit = {
    val Array(dir, tag, nStr, gate) = args
    val n = nStr.toInt
    val spark = SparkSession.builder()
      .master("local[1]")
      .appName(s"graft-logracer-$tag")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("READY")
    Console.out.flush()
    val gatePath = java.nio.file.Paths.get(gate)
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (!java.nio.file.Files.exists(gatePath)) {
      if (System.nanoTime() > deadline) sys.error(s"racer $tag: gate never opened")
      Thread.sleep(5)
    }
    var i = 0
    while (i < n) {
      val observed = LayoutLog.version(spark, dir)
      val v = LayoutLog.commitVerb(spark, dir, "append", observed)
      println(s"COMMIT $tag $v")
      i += 1
    }
    println(s"DONE $tag $n")
    Console.out.flush()
    spark.stop()
  }
}
