package graft

import graft.operators.ChunkStore
import org.apache.spark.sql.functions._

class ChunkStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): ChunkStore =
    new ChunkStore(
      java.nio.file.Files.createTempDirectory("graft_store").resolve("chunks").toString,
      "doc_id")

  test("upsert batches resolve latest-wins on read") {
    val store = freshStore()
    store.upsert(Seq((1L, "v1 of doc 1"), (2L, "v1 of doc 2")).toDF("doc_id", "content"))
    store.upsert(Seq((2L, "v2 of doc 2"), (3L, "new doc 3")).toDF("doc_id", "content"))
    val out = store.read(spark).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "v1 of doc 1"), (2L, "v2 of doc 2"), (3L, "new doc 3")))
  }

  test("tombstones hide deleted docs; later upsert resurrects") {
    val store = freshStore()
    store.upsert(Seq((1L, "a"), (2L, "b")).toDF("doc_id", "content"))
    store.delete(Seq(Tuple1(1L)).toDF("doc_id"))
    assert(store.read(spark).select("doc_id").as[Long].collect().toSet == Set(2L))
    store.upsert(Seq((1L, "a-again")).toDF("doc_id", "content"))
    val out = store.read(spark).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "a-again"), (2L, "b")))
  }

  test("read never leaks internal bookkeeping columns") {
    val store = freshStore()
    store.upsert(Seq((1L, "a")).toDF("doc_id", "content"))
    val cols = store.read(spark).columns.toSet
    assert(cols == Set("doc_id", "content"), s"unexpected columns: $cols")
  }

  test("delete on an empty store writes a tombstone-only base delta") {
    val store = freshStore()
    store.delete(Seq(Tuple1(7L)).toDF("doc_id"))
    // the tombstone is resolvable and a later upsert of the key wins
    store.upsert(Seq((7L, "alive"), (8L, "other")).toDF("doc_id", "content"))
    val out = store.read(spark).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((7L, "alive"), (8L, "other")))
  }

  test("crash-safe compaction: partial states stay readable, next compact cleans up") {
    val store = freshStore()
    store.upsert(Seq((1L, "v1"), (2L, "b")).toDF("doc_id", "content"))
    store.upsert(Seq((1L, "v2")).toDF("doc_id", "content"))
    val expected = Seq((1L, "v2"), (2L, "b"))
    def view() = store.read(spark).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    // crash state A: temp dir written, compacted delta never landed
    store.read(spark).withColumn("_tombstone", lit(false))
      .write.mode("overwrite").parquet(s"${store.root}/_compact_tmp")
    assert(view() == expected, "temp dir must be invisible to readers")

    // crash state B: compacted delta landed, old deltas not yet removed
    store.read(spark).withColumn("_tombstone", lit(false))
      .write.mode("errorifexists").parquet(s"${store.root}/delta=2")
    assert(view() == expected, "latest-wins must absorb the landed compaction")

    // recovery: the next compact folds everything and clears the debris
    store.compact(spark)
    assert(view() == expected)
    val hfs = new org.apache.hadoop.fs.Path(store.root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!hfs.exists(new org.apache.hadoop.fs.Path(s"${store.root}/_compact_tmp")))
    assert(hfs.listStatus(hfs.makeQualified(new org.apache.hadoop.fs.Path(store.root)))
      .count(_.getPath.getName.startsWith("delta=")) == 1)
  }

  test("compact preserves the resolved view and shrinks the delta chain") {
    val store = freshStore()
    for (i <- 0 until 5)
      store.upsert(Seq((i.toLong % 3, s"batch$i")).toDF("doc_id", "content"))
    store.delete(Seq(Tuple1(0L)).toDF("doc_id"))
    val before = store.read(spark).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val filesBefore = store.fileCount(spark)
    store.compact(spark)
    val after = store.read(spark).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(after == before)
    assert(store.fileCount(spark) < filesBefore,
      s"compaction should shrink file count (${store.fileCount(spark)} vs $filesBefore)")
  }
}
