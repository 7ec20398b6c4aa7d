package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dissect the stream family's fixed cost: time (a) bare stream
  * machinery (file stream → empty foreachBatch), (b) the foreachBatch
  * BODY run as a plain batch call, and (c) the registered stream query,
  * so the 26 s the family costs at sf0.1 can be attributed to
  * micro-batch scheduling vs operator work vs snapshot probes.
  * Usage: runMain graft.tools.StreamCost <sfDir>
  */
object StreamCost {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[streamcost] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warm the tables + codegen once
    graft.Tables.documents(spark, dir).count()

    (1 to 3).foreach { i =>
      time(s"bare-stream-machinery pass$i") {
        val stream = graft.streaming.StreamPipeline.documentStream(spark, dir)
        val q = stream.writeStream.outputMode("append")
          .foreachBatch((_: org.apache.spark.sql.DataFrame, _: Long) => ())
          .start()
        try q.processAllAvailable() finally q.stop()
      }
    }
    (1 to 3).foreach { i =>
      time(s"isEmpty-only-foreachBatch pass$i") {
        val stream = graft.streaming.StreamPipeline.documentStream(spark, dir)
        val q = stream.writeStream.outputMode("append")
          .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => { b.isEmpty; () })
          .start()
        try q.processAllAvailable() finally q.stop()
      }
    }
    // the bm25 append body as a plain batch call (no stream)
    val base = graft.operators.Fts.buildCached(
      s"$dir#streamcost", graft.Tables.documents(spark, dir).filter(col("doc_id") % 5 =!= 0),
      "text", "doc_id")
    (1 to 3).foreach { i =>
      time(s"fts-append-body pass$i") {
        val idx = graft.operators.Fts.cloneIndex(base)
        val delta = graft.Tables.documents(spark, dir)
          .filter(col("doc_id") % 5 === 0).repartition(32).select("doc_id", "text")
        graft.operators.Fts.appendToIndex(idx, delta, "text", "doc_id"): Unit
      }
    }
    (1 to 3).foreach { i =>
      time(s"registered stream_bm25 pass$i") {
        graft.SparkEntry.queries("stream_bm25")(spark, dir).count(): Unit
      }
    }
    // step-by-step replica of Fts.writeSegments on the same delta
    (1 to 2).foreach { i =>
      val idx = graft.operators.Fts.cloneIndex(base)
      val outDir = idx.dir
      val delta = graft.Tables.documents(spark, dir)
        .filter(col("doc_id") % 5 === 0).repartition(32).select("doc_id", "text")
      time(s"step isEmpty pass$i") { delta.isEmpty: Unit }
      time(s"step logVersion pass$i") {
        graft.operators.LayoutLog.version(spark, outDir): Unit }
      val tf = delta
        .select(col("doc_id"), graft.functions.TextOps.tokenize(col("text")).as("_toks"))
        .select(col("doc_id"), explode(col("_toks")).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tfl"))
        .cache()
      val dl = tf.groupBy(col("doc_id")).agg(sum(col("tfl")).cast("double").as("dl"))
      val posts = tf.withColumn("tf", col("tfl").cast("double")).drop("tfl")
        .join(dl, Seq("doc_id"))
      time(s"step postings-write pass$i") {
        posts.repartitionByRange(4, col("term"))
          .sortWithinPartitions("term", "doc_id")
          .write.mode("append").parquet(s"$outDir/postings")
      }
      val dims = tf
        .select(col("doc_id"), graft.functions.TextOps.hashedBowDim(col("term")).as("dim"), col("tfl"))
        .groupBy(col("doc_id"), col("dim")).agg(sum(col("tfl")).as("cnt"))
      time(s"step docdims-write pass$i") {
        dims.coalesce(4).write.mode("append").parquet(s"$outDir/docdims")
      }
      time(s"step docnorms-write pass$i") {
        dims.groupBy(col("doc_id")).agg(sum(col("cnt") * col("cnt")).as("ss"))
          .coalesce(4).write.mode("append").parquet(s"$outDir/docnorms")
      }
      time(s"step stats-head pass$i") {
        dl.agg(count("*").cast("double"), sum("dl")).head(): Unit }
      time(s"step commitVerb pass$i") {
        graft.operators.LayoutLog.commitVerb(spark, outDir, "append", 0L): Unit }
      tf.unpersist(): Unit
    }
    spark.stop()
  }
}
