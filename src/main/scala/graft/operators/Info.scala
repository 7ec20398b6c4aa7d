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
}
