package graft.tools

import graft.Tables
import graft.functions.TextOps
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Row, SparkSession}

/** One-off generator for the checked-in quality-classifier weights
  * `src/main/resources/graft/quality_weights.txt` (the DCLM/fastText
  * model-based-quality-filter pattern: a tiny linear model over
  * hashed-BoW features; training happens offline ONCE, scoring is a
  * distributed projection):
  *
  *   sbt "runMain graft.tools.TrainQuality /root/testdata/sf0.01 src/main/resources/graft/quality_weights.txt"
  *
  * The proxy objective distills the heuristic quality score
  * (TextAnalysis.qualityScore >= corpus median) into the linear model —
  * the synthetic corpus's lang label is random w.r.t. its text, so the
  * heuristic is the only learnable quality signal it carries. A real
  * deployment swaps in human labels; the artifact format and the
  * scoring path don't change. File format: 64 coefficient lines then
  * the intercept.
  */
object TrainQuality {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outPath) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = Tables.documents(spark, sfDir)
    val q = graft.operators.TextAnalysis.qualityScore(docs, "text", "doc_id")
    val median = q.stat.approxQuantile("quality", Array(0.5), 0.0).head
    val labeled = docs.join(
      q.select(col("doc_id"), (col("quality") >= median).cast("double").as("label")),
      Seq("doc_id"))
    val dims = labeled
      .select(col("doc_id"), col("label"),
        explode(TextOps.tokenize(col("text"))).as("term"))
      .select(col("doc_id"), col("label"), TextOps.hashedBowDim(col("term")).as("dim"))
      .groupBy("doc_id", "label", "dim").agg(count("*").cast("double").as("cnt"))
    val train = dims
      .groupBy("doc_id", "label")
      .agg(collect_list(struct(col("dim"), col("cnt"))).as("e"))
      .map { r: Row =>
        val pairs = r.getSeq[Row](2)
          .map(x => (x.getLong(0).toInt, x.getDouble(1))).sortBy(_._1)
        (r.getDouble(1), Vectors.sparse(64, pairs))
      }
      .toDF("label", "features")
      .cache()

    val m = new LogisticRegression()
      .setMaxIter(100).setRegParam(0.01).setStandardization(false)
      .fit(train)
    val acc = m.transform(train)
      .select(avg((col("prediction") === col("label")).cast("double")))
      .head().getDouble(0)
    println(f"[train-quality] train accuracy ${acc}%.3f (heuristic-distillation proxy)")

    val lines = (m.coefficients.toArray :+ m.intercept).map(_.toString)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      lines.mkString("\n").concat("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[train-quality] wrote ${lines.length - 1} weights + intercept to $outPath")
    spark.stop()
  }
}
