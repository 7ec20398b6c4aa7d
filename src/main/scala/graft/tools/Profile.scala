package graft.tools

import graft._
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query profiler: runMain graft.tools.Profile <name> <sfDir> [n]
  * Prints wall times for n repetitions plus the formatted plan.
  */
object Profile {
  /** Dissection pipelines for perf debugging. */
  val diag: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = {
    import org.apache.spark.sql.functions._
    import graft.functions.TextOps
    Map(
      "d_scan" -> ((s, dir) => Tables.documents(s, dir).select("doc_id", "text")),
      "d_tokens" -> ((s, dir) =>
        Tables.documents(s, dir).select(col("doc_id"), TextOps.tokenize(col("text")).as("t"))),
      "d_rawsh" -> ((s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), array_distinct(TextOps.rawShingles(TextOps.tokenize(col("text")))).as("sh"))),
      "d_explode" -> ((s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), explode(array_distinct(TextOps.rawShingles(TextOps.tokenize(col("text"))))).as("raw"))),
      "d_md5" -> ((s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), explode(array_distinct(TextOps.rawShingles(TextOps.tokenize(col("text"))))).as("raw"))
          .select(col("doc_id"), md5(col("raw")).as("shm"))),
      "d_amin" -> ((s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"),
            array_min(transform(array_distinct(TextOps.rawShingles(TextOps.tokenize(col("text")))), x => md5(x))).as("fp"))),
      "d_rep" -> ((s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), array_distinct(TextOps.rawShingles(TextOps.tokenize(col("text")))).as("sh"))
          .repartition(32)
          .select(col("doc_id"), explode(col("sh")).as("raw"))
          .select(col("doc_id"), md5(col("raw")).as("shm"))
          .groupBy("doc_id").agg(min("shm").as("fingerprint"), count("*").as("n"))),
      // window-sort vs bounded-heap head-to-head: 200 queries x all
      // vectors, top-10 per query (~400k scored pairs at sf0.1)
      "d_topk_window" -> ((s, dir) => {
        import org.apache.spark.sql.expressions.Window
        graft.plans.GraftFunctions.register(s)
        val e = Tables.embeddings(s, dir)
        val q = e.filter(col("vec_id") < 200).select(col("vec_id").as("qid"), col("embedding").as("qv"))
        val scored = e.crossJoin(broadcast(q))
          .withColumn("c", call_function("cosine_sim", col("embedding"), col("qv")))
          .select("qid", "vec_id", "c")
        scored.withColumn("rk",
          row_number().over(Window.partitionBy("qid").orderBy(col("c").desc, col("vec_id"))).cast("long"))
          .filter(col("rk") <= 10)
      }),
      // curation_disposition dissection: the universe and each detector
      // leg in isolation (flag joins excluded — they're the cheap part)
      "d_cur_universe" -> ((s, dir) => Queries.curationLegs(s, dir)._1),
      "d_cur_exact" -> ((s, dir) => Queries.curationLegs(s, dir)._2.head._2),
      "d_cur_near" -> ((s, dir) => Queries.curationLegs(s, dir)._2(1)._2),
      "d_cur_cont" -> ((s, dir) => Queries.curationLegs(s, dir)._2(2)._2),
      "d_cur_lowq" -> ((s, dir) => Queries.curationLegs(s, dir)._2(3)._2),
      "d_topk_heap" -> ((s, dir) => {
        graft.plans.GraftFunctions.register(s)
        val e = Tables.embeddings(s, dir)
        val q = e.filter(col("vec_id") < 200).select(col("vec_id").as("qid"), col("embedding").as("qv"))
        val scored = e.crossJoin(broadcast(q))
          .withColumn("c", call_function("cosine_sim", col("embedding"), col("qv")))
          .select("qid", "vec_id", "c")
        graft.plans.TopK.perKey(scored, Seq("qid"), Seq(("c", false), ("vec_id", true)), 10)
      }),
      // containment_pairs dissection: shingle-set materialization vs
      // postings explode vs the co-occurrence join
      "d_cont_sh" -> ((s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), TextOps.tokenize(col("text")).as("_toks"))
          .select(col("doc_id"), array_distinct(TextOps.shingles(col("_toks"), 5)).as("_sh"))
          .filter(size(col("_sh")) > 0)),
      "d_cont_ex" -> ((s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), TextOps.tokenize(col("text")).as("_toks"))
          .select(col("doc_id"), array_distinct(TextOps.shingles(col("_toks"), 5)).as("_sh"))
          .select(col("doc_id"), explode(col("_sh")).as("g"))),
      "d_cont_ex2" -> ((s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), TextOps.tokenize(col("text")).as("_toks"))
          .select(col("doc_id"), explode(array_distinct(TextOps.rawShingles(col("_toks"), 5))).as("raw"))
          .select(col("doc_id"), md5(col("raw")).as("g"))),
      // stream_decontaminate dissection: the foreachBatch inner work
      // replayed in batch mode, stage by stage
      "d_sd_checkpoint" -> ((s, dir) =>
        Tables.documents(s, dir).select("doc_id", "text").filter(col("doc_id") >= 10)
          .repartition(s.sparkContext.defaultParallelism).localCheckpoint()),
      "d_sd_inner" -> ((s, dir) => {
        val bench = graft.operators.Dedup.benchmarkGramHashes(
          Tables.documents(s, dir).filter(col("doc_id") < 10), "text")
        val corpus = Tables.documents(s, dir).select("doc_id", "text")
          .filter(col("doc_id") >= 10)
          .repartition(s.sparkContext.defaultParallelism).localCheckpoint()
        graft.operators.Dedup.decontaminateSpansPrecomputed(corpus, bench, "text", "doc_id")
      }),
      "d_sd_write" -> ((s, dir) => {
        val bench = graft.operators.Dedup.benchmarkGramHashes(
          Tables.documents(s, dir).filter(col("doc_id") < 10), "text")
        val corpus = Tables.documents(s, dir).select("doc_id", "text")
          .filter(col("doc_id") >= 10)
          .repartition(s.sparkContext.defaultParallelism).localCheckpoint()
        val out = java.nio.file.Files.createTempDirectory("graft_dsd_").toString + "/landed"
        graft.operators.Dedup.decontaminateSpansPrecomputed(corpus, bench, "text", "doc_id")
          .write.mode("append").parquet(out)
        s.read.parquet(out).orderBy("doc_id")
      }),
      "d_cont_join" -> ((s, dir) => {
        val ex = Tables.documents(s, dir)
          .select(col("doc_id"), TextOps.tokenize(col("text")).as("_toks"))
          .select(col("doc_id"), explode(array_distinct(TextOps.rawShingles(col("_toks"), 5))).as("raw"))
          .select(col("doc_id"), md5(col("raw")).as("g"))
        ex.select(col("g"), col("doc_id").as("id_a"))
          .join(ex.select(col("g"), col("doc_id").as("id_b")), "g")
          .filter(col("id_a") =!= col("id_b"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("c"))
      }),
      "d_agg" -> ((s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), explode(array_distinct(TextOps.rawShingles(TextOps.tokenize(col("text"))))).as("raw"))
          .select(col("doc_id"), md5(col("raw")).as("shm"))
          .groupBy("doc_id").agg(min("shm").as("fingerprint"), count("*").as("n"))),
      // --- decontaminateSpans dissection (round-9 regression hunt) ---
      "dx_toks" -> ((s, dir) =>
        Tables.documents(s, dir).filter(col("doc_id") >= 10)
          .select(col("doc_id"), TextOps.tokenize(col("text")).as("_toks"))
          .filter(size(col("_toks")) > 0)),
      // dx_gr: REGRESSION REPRO — plain (non-outer) posexplode, the shape
      // that trips InferFiltersFromGenerate (see PLANS.md round-9 fix).
      // dx_gr2 is the shipped outer-explode shape. With rawShingles'
      // lambda binding in place the gap is small (1.16 vs 1.10 s warm at
      // sf0.1 — the inferred filter now costs two extra LINEAR array
      // builds); before the binding it was 60 s vs 1.4 s. Keep both: a
      // future regression in either defense reopens the gap.
      "dx_gr" -> ((s, dir) =>
        diag("dx_toks")(s, dir)
          .select(col("doc_id"), TextOps.rawShingles(col("_toks"), 10).as("_sh"))
          .select(col("doc_id"), posexplode(col("_sh")).as(Seq("gpos", "gram")))
          .select(col("doc_id"), col("gpos"), md5(col("gram")).as("g"))),
      // ann_batch_persisted cold dissection: the KMeans fit vs the
      // partitioned layout write vs the probe itself
      "ann_fit" -> ((s, dir) => {
        val e = Tables.embeddings(s, dir)
        val idx = operators.Ann.build(e, "embedding", "vec_id", 10, 42L)
        idx.assigned.groupBy("cluster").count()
      }),
      "ann_fit2" -> ((s, dir) => {
        import org.apache.spark.ml.clustering.KMeans
        import org.apache.spark.ml.functions.array_to_vector
        val e = Tables.embeddings(s, dir)
        def t[A](l: String)(f: => A): A = {
          val t0 = System.nanoTime(); val r = f
          println(f"[fit2] $l: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
        }
        val n = t("count")(e.count())
        val featurized = e.withColumn("_features",
          array_to_vector(graft.functions.VectorOps.normalize(col("embedding"))))
        val target = math.max(operators.Ann.TrainPointsPerCentroid * 10, 2000L)
        val fitInput = (if (n > 2 * target)
            featurized.sample(false, target.toDouble / n, 42L) else featurized)
          .repartition(4).cache()
        t("sample_cache")(fitInput.count())
        val model = t("kmeans_fit")(new KMeans().setK(10).setSeed(42L).setMaxIter(10)
          .setFeaturesCol("_features").setPredictionCol("cluster").fit(fitInput))
        val cents = model.clusterCenters.map(_.toArray)
        t("assign_count")(operators.Ann.assign(e, "embedding", cents).groupBy("cluster").count().count())
        operators.Ann.assign(e, "embedding", cents).groupBy("cluster").count()
      }),
      "ann_layout" -> ((s, dir) => {
        val e = Tables.embeddings(s, dir)
        val idx = operators.Ann.buildCached(dir, e, "embedding", "vec_id", 10, 42L)
        val p = java.nio.file.Files.createTempDirectory("graft_prof_layout_").toString
        operators.Ann.writeIndex(idx, p)
        s.read.parquet(p).groupBy("cluster").count()
      }),
      "dx_gr2" -> ((s, dir) =>
        diag("dx_toks")(s, dir)
          .select(col("doc_id"), TextOps.rawShingles(col("_toks"), 10).as("_sh"))
          .select(col("doc_id"), posexplode_outer(col("_sh")).as(Seq("gpos", "gram")))
          .filter(col("gram").isNotNull)
          .select(col("doc_id"), col("gpos"), md5(col("gram")).as("g"))),
      "dx_bg" -> ((s, dir) =>
        Tables.documents(s, dir).filter(col("doc_id") < 10)
          .select(TextOps.tokenize(col("text")).as("_btoks"))
          .select(TextOps.rawShingles(col("_btoks"), 10).as("_sh"))
          .select(explode(col("_sh")).as("gram"))
          .select(md5(col("gram")).as("g")).distinct()),
      "dx_cov" -> ((s, dir) =>
        diag("dx_gr")(s, dir).join(broadcast(diag("dx_bg")(s, dir)), "g")
          .select(col("doc_id"), explode(sequence(col("gpos"), col("gpos") + 9)).as("pos"))
          .distinct()),
      "dx_ids" -> ((s, dir) => diag("dx_cov")(s, dir).select(col("doc_id")).distinct()),
      "dx_clean" -> ((s, dir) =>
        diag("dx_toks")(s, dir)
          .join(diag("dx_ids")(s, dir), Seq("doc_id"), "left_anti")
          .select(col("doc_id"),
            size(col("_toks")).cast("long").as("n_tokens"),
            lit(0L).as("dropped_tokens"),
            array_join(col("_toks"), " ").as("clean_text"))),
      "dx_reb" -> ((s, dir) =>
        diag("dx_toks")(s, dir)
          .join(diag("dx_ids")(s, dir), Seq("doc_id"), "left_semi")
          .select(col("doc_id"), posexplode(col("_toks")).as(Seq("pos", "tok")))
          .join(diag("dx_cov")(s, dir).withColumn("_cov", lit(true)), Seq("doc_id", "pos"), "left")
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_tokens"),
            sum(when(col("_cov"), 1L).otherwise(0L)).as("dropped_tokens"),
            concat_ws(" ",
              transform(
                sort_array(collect_list(when(col("_cov").isNull, struct(col("pos"), col("tok"))))),
                x => x.getField("tok"))).as("clean_text")))
    )
  }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn: (SparkSession, String) => org.apache.spark.sql.DataFrame =
      if (name == "entry") (s, _) => SparkEntry.entry(s)
      else diag.getOrElse(name, SparkEntry.queries(name))
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[profile] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    if (sys.env.get("PROFILE_EXPLAIN").contains("1"))
      fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
