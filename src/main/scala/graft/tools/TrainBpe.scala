package graft.tools

import graft.{Tables}
import graft.operators.Bpe
import org.apache.spark.sql.SparkSession

/** One-off generator for the checked-in merge table
  * `src/main/resources/graft/bpe_merges.txt`:
  *
  *   sbt "runMain graft.tools.TrainBpe /root/testdata/sf0.001 src/main/resources/graft/bpe_merges.txt 256"
  *
  * Deterministic: documents are identical at every SF, word counts are
  * exact, and training tie-breaks lexicographically — re-running
  * reproduces the same file byte-for-byte.
  */
object TrainBpe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outPath, nMerges) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val merges = Bpe.trainFromCorpus(Tables.documents(spark, sfDir), "text", nMerges.toInt)
    val lines = merges.map { case (l, r) => s"$l $r" }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      lines.mkString("\n").concat("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[train-bpe] wrote ${merges.size} merges to $outPath")
    spark.stop()
  }
}
