package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Diagnostics (reference: server.py `server_info` tool): a one-row
  * DataFrame describing the engine environment, plus an optional
  * path-readability probe — the same "can the server see this file"
  * troubleshooting the reference offers before ingestion.
  */
object Info {

  def serverInfo(spark: SparkSession, checkPath: Option[String] = None): DataFrame = {
    import spark.implicits._
    val pathCheck = checkPath.map { p =>
      val f = new java.io.File(p)
      if (f.exists) s"exists size=${f.length}" else "missing"
    }
    Seq((
      spark.version,
      spark.sparkContext.master,
      spark.conf.get("spark.sql.shuffle.partitions"),
      spark.conf.getOption("spark.sql.extensions").getOrElse(""),
      spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim")),
      checkPath.getOrElse(""),
      pathCheck.getOrElse("")
    )).toDF("spark_version", "master", "shuffle_partitions", "extensions",
      "cosine_sim_registered", "check_path", "path_check")
  }

  /** LAYOUT CATALOG — the index-side analog of [[serverInfo]]: for each
    * named layout directory, the operational facts a serving layer asks
    * before routing a query there ("which indexes exist for this table
    * and how stale are they" — reference: server.py's `server_info` is
    * the environment half; LanceDB answers the index half from its own
    * transaction log, store.py:180):
    *
    *  - `log_version` / `last_verb`: the newest [[LayoutLog]] commit —
    *    which lifecycle verb produced the current generation;
    *  - `appends_since_build`: delta segments a probe's listing pays
    *    beyond the compacted base — the staleness metric
    *    `IndexMaintenance.maintainLayout`'s fold threshold reads;
    *  - `tombstones`: merge-on-read deletions the live face excludes.
    *
    * All facts are driver-side reads bounded by the (vacuumed) commit
    * log and the layout count — O(#layouts) FS listings, plus one
    * bounded count over each non-empty tombstone sidecar; no corpus
    * scan. The row set is a pure function of each layout's verb
    * history, which is what makes the catalog oracle-gateable when the
    * layouts were produced by a scripted lifecycle.
    */
  def layoutCatalog(spark: SparkSession, layouts: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    layouts
      .map { case (family, dir) =>
        val hist = LayoutLog.history(spark, dir)
        val version = hist.lastOption.map(_.version).getOrElse(0L)
        val lastVerb = hist.lastOption.map(_.verb).getOrElse("")
        val appends = LayoutLog.appendsSinceBuild(spark, dir).toLong
        val tombstones =
          if (Ann.hasTombstones(dir)) Ann.tombstones(spark, dir).count() else 0L
        (family, version, lastVerb, appends, tombstones)
      }
      .toDF("family", "log_version", "last_verb", "appends_since_build", "tombstones")
      .orderBy("family")
  }
}
