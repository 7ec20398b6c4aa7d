package graft.operators

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** WRITE-SIDE multi-writer safety for persisted index layouts — the
  * commit protocol [[ChunkStore]] already has (CAS manifest rename),
  * brought to the directory-scanned layouts every [[IndexMaintenance]]
  * family maintains (IVF vector layouts, compressed sidecars, BM25
  * segments). Before this log, two drivers appending delta or
  * tombstone files to the same layout dir had NO coordination: a
  * compaction could silently drop a concurrent append, and nothing
  * recorded which verbs produced the current file set.
  *
  * Layout: `<layoutDir>/_log/v00000001.commit` — one file per
  * committed lifecycle verb (underscore-prefixed dir, so data scans
  * never see it; same convention as `_tombstones`). Each commit file
  * holds one line: `<verb> observed=<version the writer read before
  * writing>`. A verb is committed by writing a temp file inside
  * `_log/` and RENAMING it to the next version — rename onto an
  * existing name FAILS instead of overwriting (atomic on HDFS/local;
  * on S3A multi-writer commits need a coordination layer, exactly as
  * Delta documents for its own log), and that failure IS the
  * optimistic-concurrency conflict signal.
  *
  * CONFLICT RESOLUTION is verb-aware, because the data model differs
  * from ChunkStore's: readers scan the DIRECTORY (partition-pruned),
  * not a manifest, and parquet task files are UUID-named, so two
  * append-class verbs (delta `append`, tombstone `delete`) COMMUTE —
  * both file sets are valid data and both survive. A losing
  * append-class writer therefore RETRIES its commit at the next
  * version (bounded); any conflict involving an overwrite-class verb
  * (`build`, `compact`) throws [[java.util.ConcurrentModificationException]]
  * loudly — an overwrite replaces the file set, so a write racing it
  * may have been destroyed and MUST surface to its caller.
  *
  * What the log does and does not give:
  *  - gives: writer serialization + loud lost-update detection
  *    (the round-14 verdict's ask), compaction FENCING
  *    ([[IndexMaintenance.fencedCompact]] — a verb committed to the
  *    source layout between a compaction's snapshot read and its
  *    output write fails the compaction instead of being silently
  *    dropped), an auditable verb history, and a cheap
  *    appends-since-compaction count for the auto-maintenance policy.
  *  - does not give: manifest-resolved READ visibility. The read path
  *    stays a partition-pruned directory scan (that is the 100 TB probe
  *    shape); within a JVM, [[LayoutCache]]'s memoized listing already
  *    freezes a probe's file set per layout generation, and external
  *    writes become visible via [[IndexMaintenance.refresh]] — Spark's
  *    own REFRESH TABLE contract.
  *  - crash contract: data files land BEFORE the commit (ChunkStore's
  *    order), so a writer that dies mid-verb leaves the layout one verb
  *    AHEAD of its log; the next committed verb seals over it. The log
  *    records completed verbs, it is not a redo log.
  *
  * Reference anchor: store.py:180 — LanceDB gives the reference
  * transactional table adds for free; this is the layout-dir analog.
  */
object LayoutLog {

  final val LogSub = "_log"

  /** One committed lifecycle verb. `observed` is the log version the
    * writer read before writing its data files — the fencing token
    * (`version == observed + 1` means the verb ran uncontended).
    */
  final case class Commit(version: Long, verb: String, observed: Long)

  /** Verbs whose data files commute with each other (UUID-named,
    * append-only): a CAS loss against another member of this set is
    * retried, not surfaced.
    */
  private val AppendClass = Set("append", "delete")

  private def logPath(dir: String): Path = new Path(dir.stripSuffix("/"), LogSub)

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    logPath(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def commitPath(dir: String, v: Long): Path =
    new Path(logPath(dir), f"v$v%08d.commit")

  private def listVersions(fs: FileSystem, dir: String): Seq[Long] = {
    val lp = logPath(dir)
    if (!fs.exists(lp)) Seq.empty
    else fs.listStatus(lp).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".commit"))
      .map(_.stripPrefix("v").stripSuffix(".commit").toLong)
      .sorted
  }

  /** Highest committed version of the layout (0 = no log yet — every
    * pre-log layout reads as version 0 and gains a log on its first
    * logged verb; fully backward compatible).
    */
  def version(spark: SparkSession, dir: String): Long =
    listVersions(fsOf(spark, dir), dir).lastOption.getOrElse(0L)

  private def readCommit(fs: FileSystem, dir: String, v: Long): Option[Commit] = {
    val p = commitPath(dir, v)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val body =
        try scala.io.Source.fromInputStream(in)(scala.io.Codec.UTF8).mkString.trim
        finally in.close()
      val parts = body.split("\\s+")
      val observed = parts.collectFirst {
        case s if s.startsWith("observed=") => s.stripPrefix("observed=").toLong
      }.getOrElse(-1L)
      Some(Commit(v, parts.headOption.getOrElse("?"), observed))
    }
  }

  /** The layout's committed verb history, oldest first. */
  def history(spark: SparkSession, dir: String): Seq[Commit] = {
    val fs = fsOf(spark, dir)
    listVersions(fs, dir).flatMap(v => readCommit(fs, dir, v))
  }

  /** Append-class verbs committed after the last overwrite-class verb —
    * the read amplification a probe's listing pays beyond the compacted
    * base, and the trigger metric of the auto-maintenance policy.
    */
  def appendsSinceBuild(spark: SparkSession, dir: String): Int = {
    val h = history(spark, dir)
    val lastBuild = h.lastIndexWhere(c => !AppendClass.contains(c.verb))
    h.drop(lastBuild + 1).count(_.verb == "append")
  }

  /** One rename attempt at exactly `v`; false = that version is taken. */
  private def tryCommit(
      fs: FileSystem, dir: String, v: Long, verb: String, observed: Long): Boolean = {
    val lp = logPath(dir)
    if (!fs.exists(lp)) fs.mkdirs(lp)
    val tmp = new Path(lp, s"_tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(s"$verb observed=$observed\n".getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val won = fs.rename(tmp, commitPath(dir, v))
    if (!won) fs.delete(tmp, false)
    won
  }

  /** Commit a completed lifecycle verb whose data files were written
    * after reading log version `observed`. Returns the committed
    * version. CAS conflicts resolve per the class rules above:
    * append-vs-append retries (both file sets are live data);
    * anything involving an overwrite-class verb throws — the caller's
    * write may have been clobbered and must not report success.
    */
  def commitVerb(spark: SparkSession, dir: String, verb: String, observed: Long): Long = {
    val fs = fsOf(spark, dir)
    // walk from the writer's own fencing token, NOT a re-read of the
    // current version: every version committed since `observed` is a
    // write this writer did not see, and each one must be adjudicated
    // (commutes -> step over it; overwrite-class -> surface). Re-reading
    // here would silently step over an interleaved build.
    var attempt = observed + 1
    var retries = 0
    while (retries < 64) {
      if (tryCommit(fs, dir, attempt, verb, observed)) return attempt
      val winner = readCommit(fs, dir, attempt).map(_.verb).getOrElse("?")
      if (AppendClass.contains(verb) && AppendClass.contains(winner)) {
        // commuting verbs: the winner's files and ours are both valid
        // directory data — take the next slot
        attempt += 1
        retries += 1
      } else {
        throw new java.util.ConcurrentModificationException(
          s"layout $dir: '$verb' (observed v$observed) lost the commit of " +
            s"v$attempt to a concurrent '$winner' — an overwrite-class verb " +
            "replaces the file set, so this write cannot assume its files " +
            "survived; re-read the layout and rerun the verb")
      }
    }
    throw new java.util.ConcurrentModificationException(
      s"layout $dir: '$verb' exhausted commit retries at v$attempt — " +
        "writer contention is pathological; serialize writers upstream")
  }
}
