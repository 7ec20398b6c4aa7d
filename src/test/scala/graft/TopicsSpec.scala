package graft

import graft.Queries
import org.apache.spark.sql.functions._

/** cluster_topics composition: every cluster reports <= 5 ranked terms,
  * sizes sum to the corpus, ranks are dense from 1, counts non-increasing.
  */
class TopicsSpec extends SparkSpec {

  test("clusterTopics: dense per-cluster top-5 by count with consistent sizes") {
    val dir = "/root/testdata/sf0.001"
    val out = Queries.clusterTopics(spark, dir).collect()
    assert(out.nonEmpty)
    val byCluster = out.groupBy(_.getAs[Long]("cluster"))
    byCluster.foreach { case (c, rows) =>
      val ranks = rows.map(_.getAs[Long]("rank")).sorted.toSeq
      assert(ranks == (1L to rows.length).toSeq, s"cluster $c ranks not dense: $ranks")
      assert(rows.length <= 5)
      val cnts = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("cnt")).toSeq
      assert(cnts == cnts.sorted.reverse, s"cluster $c counts not non-increasing: $cnts")
      assert(rows.map(_.getAs[Long]("n_docs")).distinct.length == 1)
    }
    // every document lands in exactly one cluster: sizes sum to corpus size
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    val sizeSum = byCluster.values.map(_.head.getAs[Long]("n_docs")).sum
    assert(sizeSum == nDocs, s"cluster sizes $sizeSum != corpus $nDocs")
  }
}
