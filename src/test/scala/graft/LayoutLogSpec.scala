package graft

import graft.operators.{Ann, IndexMaintenance, LayoutLog}
import org.apache.spark.sql.functions._

/** Write-side multi-writer safety of the index layouts (round-15): the
  * CAS commit log ([[LayoutLog]]) every [[IndexMaintenance]] verb now
  * routes through — matching ChunkStoreSpec's concurrent-commit
  * coverage for the directory-scanned layout families.
  *
  * Coverage map:
  *  1. every lifecycle verb commits one version; history is auditable;
  *  2. rename-onto-an-existing-commit FAILS — the physical conflict
  *     signal (ChunkStoreSpec's "concurrent commit of the same version
  *     fails instead of overwriting", applied to the layout log);
  *  3. append-class verbs COMMUTE: a writer whose token went stale to
  *     another append retries past it and BOTH writes survive;
  *  4. a writer whose token went stale to an OVERWRITE-class verb
  *     fails loudly (its files may have been destroyed);
  *  5. a compaction with a concurrent append to the source layout is
  *     FENCED: it throws instead of silently dropping the appended
  *     rows, and a rerun against the advanced source succeeds with the
  *     appended rows present.
  */
class LayoutLogSpec extends SparkSpec {
  import spark.implicits._

  private object M extends IndexMaintenance

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_layoutlog_").toString + "/idx"

  private def rows(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map(i => (i.toLong, i % 4)).toDF("id", "cluster")

  test("each lifecycle verb commits one version; history is auditable") {
    val dir = freshDir()
    M.writeClustered(rows(0 until 40), dir, "overwrite") // v1 build
    M.writeClustered(rows(40 until 60), dir, "append")   // v2 append
    M.writeClustered(rows(60 until 70), dir, "append")   // v3 append
    M.appendTombstones(Seq(5L).toDF("id"), dir)          // v4 delete
    assert(LayoutLog.version(spark, dir) == 4L)
    assert(LayoutLog.history(spark, dir).map(c => (c.version, c.verb, c.observed)) ==
      Seq((1L, "build", 0L), (2L, "append", 1L), (3L, "append", 2L), (4L, "delete", 3L)))
    assert(LayoutLog.appendsSinceBuild(spark, dir) == 2)
    // overwrite wipes the dir (log included) but version numbers stay
    // monotone — the rebuild observes the pre-wipe version
    M.writeClustered(rows(0 until 10), dir, "overwrite") // v5 build
    assert(LayoutLog.history(spark, dir).map(c => (c.version, c.verb)) ==
      Seq((5L, "build")))
    assert(LayoutLog.appendsSinceBuild(spark, dir) == 0)
  }

  test("a concurrent commit of the same version fails instead of overwriting") {
    val dir = freshDir()
    M.writeClustered(rows(0 until 10), dir, "overwrite") // v1
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val losing = new org.apache.hadoop.fs.Path(s"$dir/_log/_tmp-racer")
    val out = hfs.create(losing, false)
    out.write("append observed=0\n".getBytes("UTF-8")); out.close()
    val taken = new org.apache.hadoop.fs.Path(s"$dir/_log/v00000001.commit")
    assert(!hfs.rename(losing, taken),
      "rename onto an existing commit version must fail — that IS the conflict signal")
  }

  test("append-class verbs commute: a stale-token append retries past another append and both survive") {
    val dir = freshDir()
    M.writeClustered(rows(0 until 40), dir, "overwrite") // v1
    M.writeClustered(rows(40 until 50), dir, "append")   // v2 — the interloper
    // a second writer wrote its tombstone files having observed v1 (its
    // token is STALE to the interleaved append): adjudication steps over
    // the commuting append and lands at v3
    val committed = LayoutLog.commitVerb(spark, dir, "delete", observed = 1L)
    assert(committed == 3L)
    assert(LayoutLog.history(spark, dir).map(_.verb) == Seq("build", "append", "delete"))
  }

  test("a stale-token append racing an OVERWRITE fails loudly") {
    val dir = freshDir()
    M.writeClustered(rows(0 until 10), dir, "overwrite") // v1 build
    // a writer that observed the EMPTY layout (v0), wrote files, and
    // now finds a build committed at its slot: its files were wiped by
    // the overwrite — success must not be reported
    val e = intercept[java.util.ConcurrentModificationException] {
      LayoutLog.commitVerb(spark, dir, "append", observed = 0L)
    }
    assert(e.getMessage.contains("'build'"), e.getMessage)
  }

  test("compaction is fenced: a concurrent append to the source throws; rerun includes it") {
    val dir = freshDir()
    val out1 = dir + "-compact1"
    val out2 = dir + "-compact2"
    def vec(i: Int): Seq[Float] =
      Seq(i.toFloat + 1f, (i % 7).toFloat, ((i * 3) % 5).toFloat, 1f)
    val base = (0 until 40).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val idx = Ann.build(base, "embedding", "vec_id", k = 4, seed = 1L)
    Ann.writeIndex(idx, dir)
    M.appendTombstones(Seq(2L).toDF("vec_id"), dir)
    val delta = (100 until 110).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    // interleave: the delta append lands AFTER the compaction snapshot
    // (inside the fence window) — the lost-update the log alone cannot
    // catch, because the compaction commits to a DIFFERENT directory
    val e = intercept[java.util.ConcurrentModificationException] {
      M.fencedCompact(spark, "Ann", dir) {
        val snapshot = M.liveFace(spark, dir, spark.read.parquet(dir), "vec_id")
        snapshot.count() // the compaction's read of the source
        Ann.appendToIndex(dir, delta, "embedding", idx.centroids) // concurrent writer
        M.writeClustered(snapshot, out1, "overwrite")
      }
    }
    assert(e.getMessage.contains("advanced"), e.getMessage)
    // rerun against the advanced source: clean fence, delta rows present
    Ann.compact(spark, dir, out2, "vec_id")
    val compacted = spark.read.parquet(out2).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(compacted.contains(105L), "rerun compaction must include the appended delta")
    assert(!compacted.contains(2L), "tombstoned id must not survive compaction")
    assert(LayoutLog.history(spark, out2).map(_.verb) == Seq("build"))
  }
}
