package graft

/** Bounded eval-cluster selection (Queries.selectEvalClusters) — the
  * distributed rewrite of retrieval_eval_clusters' ground-truth
  * derivation. Pins (a) exact equality with the previous full-collect
  * driver-side algorithm on an adversarial cluster table (singletons,
  * a min-id != cluster-id component, duplicate membership rows, more
  * eligible clusters than the cut), and (b) the collect bound: only
  * the chosen clusters' membership reaches the driver, ≤ maxClusters ×
  * max-cluster-size rows.
  */
class EvalClusterSelectSpec extends SparkSpec {
  import spark.implicits._

  private val rows: Seq[(Long, Long)] = {
    // 20 eligible clusters c = 100k, members {c, c+1, c+2}
    val eligible = (0 until 20).flatMap { k =>
      val c = 100L * k
      Seq((c, c), (c + 1, c), (c + 2, c), (c + 1, c)) // one duplicate row
    }
    // singleton (size 1 after distinct) — ineligible
    val singleton = Seq((5000L, 5000L), (5000L, 5000L))
    // min member id != cluster_id — ineligible under the head==c rule
    val misrooted = Seq((6001L, 6002L), (6002L, 6002L), (6003L, 6002L))
    eligible ++ singleton ++ misrooted
  }

  test("distributed selection equals the full-collect reference algorithm") {
    val df = rows.toDF("id", "cluster_id")
    val got = Queries.selectEvalClusters(df, maxClusters = 16)
    // the previous algorithm, verbatim, over the full collected mapping
    val expect = rows.groupBy(_._2).toSeq
      .map { case (c, ms) => (c, ms.map(_._1).distinct.sorted.toSeq) }
      .filter { case (c, ms) => ms.size >= 2 && ms.head == c }
      .sortBy(_._1).take(16)
    assert(got == expect, s"\n got: $got\n exp: $expect")
    assert(got.size == 16 && got.forall(_._2.size == 3))
  }

  test("only the chosen clusters' membership is collected (<= maxClusters x max-cluster rows)") {
    val got = Queries.selectEvalClusters(rows.toDF("id", "cluster_id"), maxClusters = 16)
    val collected = got.map(_._2.size).sum
    val maxCluster = got.map(_._2.size).max
    assert(collected <= 16 * maxCluster,
      s"collected $collected rows > 16 x $maxCluster")
    // the ineligible clusters never reach the driver-side result
    assert(!got.exists { case (c, _) => c == 5000L || c == 6002L })
  }
}
