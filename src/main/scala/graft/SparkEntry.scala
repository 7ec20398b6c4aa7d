package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Every implemented SURVEY.md §2 operator has a `queries` entry; every
  * SQL-expressible one has a DuckDB twin in [[OracleSql]] (same column
  * names, types, rounding and ordering — the driver hash-compares).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Hybrid BM25+vector RRF search — the reference's core capability
    * (reference: server.py:229 `search`, store.py:261).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.hybridRrf(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A. reference surface
    "scan_pruned"         -> (Queries.scanPruned(_, _)),
    "knn_topk"            -> (Queries.knnTopK(_, _)),
    "knn_pergroup"        -> (Queries.knnPerGroup(_, _)),
    "knn_batch"           -> (Queries.knnBatch(_, _)),
    "hard_negatives"      -> (Queries.hardNegatives(_, _)),
    "bm25_topk"           -> (Queries.bm25TopK(_, _)),
    "query_expand"        -> (Queries.queryExpand(_, _)),
    "bm25_phrase"         -> (Queries.bm25Phrase(_, _)),
    "bm25_pergroup"       -> (Queries.bm25PerGroup(_, _)),
    "snippet_extract"     -> (Queries.snippetExtract(_, _)),
    "phrase_search"       -> (Queries.phraseSearch(_, _)),
    "hybrid_rrf"          -> (Queries.hybridRrf(_, _)),
    "filtered_search"     -> (Queries.filteredSearch(_, _)),
    "chunk_explode"       -> (Queries.chunkExplode(_, _)),
    "chunk_stats"         -> (Queries.chunkStats(_, _)),
    "chunk_recursive"     -> (Queries.chunkRecursive(_, _)),
    "list_documents"      -> (Queries.listDocuments(_, _)),
    "list_libraries"      -> (Queries.listLibraries(_, _)),
    "get_document"        -> (Queries.getDocument(_, _)),
    "context_expand"      -> (Queries.contextExpand(_, _)),
    "delete_document"     -> (Queries.deleteDocument(_, _)),
    "ingest_dedup_status" -> (Queries.ingestDedupStatus(_, _)),
    "title_extract"       -> (Queries.titleExtract(_, _)),
    "upsert_merge"        -> (Queries.upsertMerge(_, _)),
    // B. dedup suite
    "dedup_exact"         -> (Queries.dedupExact(_, _)),
    "dedup_minhash_lsh"   -> (Queries.dedupMinhashLsh(_, _)),
    "dedup_minhash_incremental" -> (Queries.dedupMinhashIncremental(_, _)),
    "stream_minhash"      -> (Queries.streamMinhash(_, _)),
    "stream_upsert_cdc"   -> (Queries.streamUpsertCdc(_, _)),
    "dedup_clusters"      -> (Queries.dedupClusters(_, _)),
    "dedup_canonical"     -> (Queries.dedupCanonical(_, _)),
    "sim_ngram_jaccard"   -> (Queries.simNgramJaccard(_, _)),
    "dedup_embedding"     -> (Queries.dedupEmbedding(_, _)),
    "semdedup"            -> (Queries.semDeDup(_, _)),
    "cluster_topics"      -> (Queries.clusterTopics(_, _)),
    "zorder_scan"         -> (Queries.zorderScan(_, _)),
    "simhash_sketch"      -> (Queries.simhashSketch(_, _)),
    "simhash_pairs"       -> (Queries.simhashPairs(_, _)),
    // C. ANN
    "ann_probe"           -> (Queries.annProbe(_, _)),
    "ann_stats"           -> (Queries.annStats(_, _)),
    "ann_filtered"        -> (Queries.annFiltered(_, _)),
    "ann_recall"          -> (Queries.annRecall(_, _)),
    "ann_recall_sweep"    -> (Queries.annRecallSweep(_, _)),
    "pq_probe"            -> (Queries.pqProbe(_, _)),
    "lsh_pairs"           -> (Queries.lshPairs(_, _)),
    "lsh_query"           -> (Queries.lshQuery(_, _)),
    // D. multimodal
    "multimodal_features" -> (Queries.multimodalFeatures(_, _)),
    "multimodal_audio"    -> (Queries.multimodalAudio(_, _)),
    "multimodal_mp3"      -> (Queries.multimodalMp3(_, _)),
    "multimodal_webp"     -> (Queries.multimodalWebp(_, _)),
    "multimodal_image"    -> (Queries.multimodalImage(_, _)),
    "multimodal_embed"    -> (Queries.multimodalEmbed(_, _)),
    // E. text analysis
    "text_stats"          -> (Queries.textStats(_, _)),
    "lang_id"             -> (Queries.langId(_, _)),
    "token_topk"          -> (Queries.tokenTopK(_, _)),
    "keyword_topk"        -> (Queries.keywordTopK(_, _)),
    "quality_score"       -> (Queries.qualityScore(_, _)),
    "corpus_drift"        -> (Queries.corpusDrift(_, _)),
    "quality_filter"      -> (Queries.qualityFilter(_, _)),
    "doc_fingerprint"     -> (Queries.docFingerprint(_, _)),
    "embed_hashed_bow"    -> (Queries.embedHashedBow(_, _)),
    "doc_embedding"       -> (Queries.docEmbedding(_, _)),
    "docsim_topk"         -> (Queries.docsimTopK(_, _)),
    "docsim_incremental"  -> (Queries.docsimIncremental(_, _)),
    "embed_onnx"          -> (Queries.embedOnnx(_, _)),
    "embed_encoder"       -> (Queries.embedEncoder(_, _)),
    "embed_tfidf"         -> (Queries.embedTfidf(_, _)),
    "pii_scrub"           -> (Queries.piiScrub(_, _)),
    "contamination_check" -> (Queries.contaminationCheck(_, _)),
    "bloom_decontaminate" -> (Queries.bloomDecontaminate(_, _)),
    "fuzzy_join"          -> (Queries.fuzzyJoin(_, _)),
    "url_dedup"           -> (Queries.urlDedup(_, _)),
    "containment_pairs"   -> (Queries.containmentPairs(_, _)),
    "sample_stratified"   -> (Queries.sampleStratified(_, _)),
    "split_grouped"       -> (Queries.splitGrouped(_, _)),
    "curation_disposition" -> (Queries.curationDisposition(_, _)),
    "shuffle_shards"      -> (Queries.shuffleShards(_, _)),
    "dsir_sample"         -> (Queries.dsirSample(_, _)),
    "token_shards"        -> (Queries.tokenShards(_, _)),
    "pack_sequences"      -> (Queries.packSequences(_, _)),
    "pack_stats"          -> (Queries.packStats(_, _)),
    "dup_ngrams"          -> (Queries.dupNgrams(_, _)),
    // F. OLAP / events
    "q1_pricing"          -> (Queries.q1Pricing(_, _)),
    "q3_orders"           -> (Queries.q3Orders(_, _)),
    "q5_region"           -> (Queries.q5Region(_, _)),
    "events_window"       -> (Queries.eventsWindow(_, _)),
    "events_sessionize"   -> (Queries.eventsSessionize(_, _)),
    "events_paths"        -> (Queries.eventsPaths(_, _)),
    "events_funnel"       -> (Queries.eventsFunnel(_, _)),
    "events_retention"    -> (Queries.eventsRetention(_, _)),
    "stream_funnel"       -> (Queries.streamFunnel(_, _)),
    "stream_retention"    -> (Queries.streamRetention(_, _)),
    "stream_paths"        -> (Queries.streamPaths(_, _)),
    "stream_bm25"         -> (Queries.streamBm25(_, _)),
    "stream_docsim"       -> (Queries.streamDocsim(_, _)),
    "events_enrich"       -> (Queries.eventsEnrich(_, _)),
    "events_json"         -> (Queries.eventsJson(_, _)),
    "events_asof"         -> (Queries.eventsAsof(_, _)),
    "events_interval_join" -> (Queries.eventsIntervalJoin(_, _)),
    "stream_interval_join" -> ((s, d) => graft.streaming.StreamPipeline.intervalJoinSnapshot(s, d)),
    "stream_drift"        -> ((s, d) => graft.streaming.StreamPipeline.driftSnapshot(s, d)),
    "events_asof_join"    -> (Queries.eventsAsofJoin(_, _)),
    "events_percentiles"  -> (Queries.eventsPercentiles(_, _)),
    "events_rollup"       -> (Queries.eventsRollup(_, _)),
    "events_pivot"        -> (Queries.eventsPivot(_, _)),
    "events_skew_join"    -> (Queries.eventsSkewJoin(_, _)),
    "token_counts"        -> (Queries.tokenCounts(_, _)),
    "bpe_tokens"          -> (Queries.bpeTokens(_, _)),
    "chunk_token_budget"  -> (Queries.chunkTokenBudget(_, _)),
    "ann_incremental"     -> (Queries.annIncremental(_, _)),
    "stream_ann"          -> (Queries.streamAnn(_, _)),
    "ann_deleted"         -> (Queries.annDeleted(_, _)),
    "ann_compacted"       -> (Queries.annCompacted(_, _)),
    "ivfpq_probe"         -> (Queries.ivfpqProbe(_, _)),
    "ann_batch_probe"     -> (Queries.annBatchProbe(_, _)),
    "ann_batch_persisted" -> (Queries.annBatchPersisted(_, _)),
    "ann_batch_sq"        -> (Queries.annBatchSq(_, _)),
    "ann_batch_pq"        -> (Queries.annBatchPq(_, _)),
    "token_shards_bpe"    -> (Queries.tokenShardsBpe(_, _)),
    "semantic_search"     -> (Queries.semanticSearch(_, _)),
    "maxsim_search"       -> (Queries.maxsimSearch(_, _)),
    "bm25_indexed"        -> (Queries.bm25Indexed(_, _)),
    "fts_stats"           -> (Queries.ftsStats(_, _)),
    "server_info"         -> (Queries.serverInfo(_, _)),
    "bm25_incremental"    -> (Queries.bm25Incremental(_, _)),
    "bm25_deleted"        -> (Queries.bm25Deleted(_, _)),
    "bm25_compacted"      -> (Queries.bm25Compacted(_, _)),
    "repetition_stats"    -> (Queries.repetitionStats(_, _)),
    "line_dedup"          -> (Queries.lineDedup(_, _)),
    "perplexity_filter"   -> (Queries.perplexityFilter(_, _)),
    "lm_train"            -> (Queries.lmTrain(_, _)),
    "text_normalize"      -> (Queries.textNormalize(_, _)),
    "c4_filters"          -> (Queries.c4Filters(_, _)),
    "decontaminate_spans" -> (Queries.decontaminateSpans(_, _)),
    "decontaminate_xlingual" -> (Queries.decontaminateXlingual(_, _)),
    "stream_decontaminate" -> (Queries.streamDecontaminate(_, _)),
    "gopher_quality"      -> (Queries.gopherQuality(_, _)),
    "curation_report"     -> (Queries.curationReport(_, _)),
    "sq_probe"            -> (Queries.sqProbe(_, _)),
    "bq_probe"            -> (Queries.bqProbe(_, _)),
    "mmr_search"          -> (Queries.mmrSearch(_, _)),
    "ivfsq_probe"         -> (Queries.ivfsqProbe(_, _)),
    "ivfsq_residual"      -> (Queries.ivfsqResidual(_, _)),
    "bm25_batch"          -> (Queries.bm25Batch(_, _)),
    "retrieval_eval"      -> (Queries.retrievalEval(_, _)),
    "semantic_batch"      -> (Queries.semanticBatch(_, _)),
    "pca_probe"           -> (Queries.pcaProbe(_, _)),
    "stream_pipeline"     -> (Queries.streamPipeline(_, _)),
    "stream_token_budget" -> (Queries.streamTokenBudget(_, _)),
    "mix_temperature"     -> (Queries.mixTemperature(_, _)),
    "hybrid_indexed"      -> (Queries.hybridIndexed(_, _)),
    "chunkstore_read"     -> (Queries.chunkstoreRead(_, _)),
    "chunkstore_time_travel" -> (Queries.chunkstoreTimeTravel(_, _)),
    "chunkstore_changes"  -> (Queries.chunkstoreChanges(_, _)),
    "quality_model"       -> (Queries.qualityModel(_, _)),
    "span_dedup"          -> (Queries.spanDedup(_, _)),
    "semantic_indexed"    -> (Queries.semanticIndexed(_, _))
  )

  /** DuckDB-equivalent SQL per query key. The static map covers the
    * SQL-expressible queries; [[OracleSql.dynamic]] adds twins for the
    * fitted-model queries (ann_probe / ann_recall / pq_probe) with the
    * deterministic fitted constants inlined as literals — populated
    * because [[Verify]] runs every query before dumping the SQL.
    */
  def oracleSql: Map[String, String] = OracleSql.sql ++ OracleSql.composed ++ OracleSql.dynamic
}
