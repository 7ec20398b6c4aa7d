package graft

/** Fitted-model constants captured while [[Queries]] run, consumed by
  * [[OracleSql.dynamic]] to generate DuckDB twins with the artifacts
  * inlined as literals — the same trick that made the LSH family
  * hash-verifiable (Lsh.scala planes), extended to fitted models:
  * KMeans is seed-fixed and PQ training is fully deterministic, so
  * after a query runs, its centroids/codebooks are known driver-side
  * constants the oracle can re-apply independently.
  *
  * [[Verify]] executes every query BEFORE dumping oracle_sql.json, so
  * the holders are always populated in the driver's flow; if a query
  * failed, its dynamic twin is simply omitted (driver falls back to the
  * weaker rows-only check instead of comparing against a stale twin).
  */
object OracleArtifacts {

  /** Eval query set from retrieval_eval: (query_id = source doc_id,
    * first-tokens query terms) — captured from the corpus, inlined by
    * the twin as VALUES literals.
    */
  @volatile var retrievalEval: Option[Seq[(Long, Seq[String])]] = None

  /** Held-out eval set from retrieval_eval_clusters: (query_id = the
    * cluster's source doc_id, lossy query terms, relevant doc ids —
    * the OTHER members of the derived near-dup cluster). A bounded
    * driver artifact (≤16 clusters) the twin replays as VALUES.
    */
  @volatile var retrievalEvalClusters: Option[Seq[(Long, Seq[String], Seq[Long])]] = None

  /** (centroids, nProbe=5 ranked cells) from ann_recall_sweep — each
    * smaller nProbe probes a prefix of the ranked list.
    */
  @volatile var annSweep: Option[(Array[Array[Double]], Seq[Int])] = None

  /** (unit-sphere KMeans centroids, probed cell ids) from ann_probe. */
  @volatile var ann: Option[(Array[Array[Double]], Seq[Int])] = None

  /** Same shape from ann_incremental (centroids fitted on the BASE
    * subset only; the probe sees base + appended delta).
    */
  @volatile var annIncremental: Option[(Array[Array[Double]], Seq[Int])] = None

  /** Same shape from ann_deleted (probe over the tombstone-filtered
    * persisted layout).
    */
  @volatile var annDeleted: Option[(Array[Array[Double]], Seq[Int])] = None

  /** Same shape from ann_compacted (probe over the rewritten live
    * layout — same live corpus as ann_deleted, no sidecar left).
    */
  @volatile var annCompacted: Option[(Array[Array[Double]], Seq[Int])] = None

  /** IVF centroids from ann_batch_probe (cells are per-query, computed
    * in SQL by the twin itself).
    */
  @volatile var annBatch: Option[Array[Array[Double]]] = None

  /** (IVF centroids, probed cells) from ivfbq_probe — the binary-
    * quantization leg is pure sign arithmetic, computed by the twin.
    */
  @volatile var ivfbq: Option[(Array[Array[Double]], Seq[Int])] = None

  /** (IVF centroids, probed cells) from ann_filtered. */
  @volatile var annFiltered: Option[(Array[Array[Double]], Seq[Int])] = None

  /** IVF centroids from ann_batch_sq (per-query cells and the SQ8
    * arithmetic are both computed in SQL by the twin itself).
    */
  @volatile var annBatchSq: Option[Array[Array[Double]]] = None

  /** IVF centroids from ann_batch_mrl (per-query cells are computed in
    * SQL by the twin; the MRL leg is a plain list slice).
    */
  @volatile var annBatchMrl: Option[Array[Array[Double]]] = None

  /** (IVF centroids, PQ model) from ann_batch_pq — per-query cells,
    * codes AND per-query ADC tables are all recomputed in SQL by the
    * twin (batch ADC tables can't be driver literals).
    */
  @volatile var annBatchPq: Option[(Array[Array[Double]], operators.Pq.Model)] = None

  /** (PQ model, query ADC distance table) from pq_probe. */
  @volatile var pq: Option[(operators.Pq.Model, Array[Array[Double]])] = None

  /** (IVF centroids, probed cells, PQ model, query ADC table) from
    * ivfpq_probe.
    */
  @volatile var ivfpq: Option[(Array[Array[Double]], Seq[Int], operators.Pq.Model, Array[Array[Double]])] = None

  /** (IVF centroids, probed cells, residual PQ model, per-cell query
    * ADC tables) from ivfpq_residual.
    */
  @volatile var ivfpqResidual: Option[(Array[Array[Double]], Seq[Int], operators.Pq.Model, Map[Int, Array[Array[Double]]])] = None

  /** (IVF centroids, probed cells) from ivfsq_probe — the SQ8 leg is
    * pure element-wise arithmetic, so only the IVF side needs literals.
    */
  @volatile var ivfsq: Option[(Array[Array[Double]], Seq[Int])] = None

  /** (IVF centroids, probed cells) from ivfmrl_probe — the MRL leg is
    * a plain list slice, so only the IVF side needs literals.
    */
  @volatile var ivfmrl: Option[(Array[Array[Double]], Seq[Int])] = None

  /** Principal components (r x dim) from pca_probe's memoized fit. */
  @volatile var pca: Option[Array[Array[Double]]] = None

  /** (IVF centroids, probed cells) from ivfsq_residual. */
  @volatile var ivfsqResidual: Option[(Array[Array[Double]], Seq[Int])] = None

  /** (hashedBoW-space centroids, probed cells) from stream_pipeline.
    * The streamed index's content is a pure function of (corpus, fitted
    * centroids, query text), so the landed probe twins exactly like the
    * batch ANN probes.
    */
  @volatile var streamPipeline: Option[(Array[Array[Double]], Seq[Int])] = None

  /** SemDeDup coarse-quantizer centroids from semdedup (fitted on the
    * planted-near-dup corpus, unit-sphere space).
    */
  @volatile var semdedup: Option[Array[Array[Double]]] = None

  /** KMeans centroids from cluster_topics (the ann_probe fit, reused —
    * same data key / k / seed hits the memoized index).
    */
  @volatile var clusterTopics: Option[Array[Array[Double]]] = None

  def clear(): Unit = {
    ann = None; annIncremental = None; annDeleted = None; annCompacted = None
    annBatch = None; annBatchSq = None; annBatchMrl = None
    annBatchPq = None; annFiltered = None; pq = None; ivfpq = None
    ivfpqResidual = None
    ivfsq = None; ivfbq = None; ivfmrl = None; pca = None
    ivfsqResidual = None; streamPipeline = None
    semdedup = None; clusterTopics = None; annSweep = None
    retrievalEval = None; retrievalEvalClusters = None
  }
}
