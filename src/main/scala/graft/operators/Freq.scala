package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT heavy hitters above a frequency threshold without shuffling
  * the full key space: per-partition Misra-Gries candidate generation
  * followed by an exact recount of the bounded candidate set.
  *
  * Why this beats the obvious `groupBy(item).count.filter`: the
  * obvious plan shuffles |vocabulary| keys (at 100 TB, trillions of
  * n-grams — the E32 cardinality argument from the other side). Here
  * the only full-corpus pass is the candidate scan, whose output is
  * ≤ m keys PER PARTITION (a driver-safe, broadcastable set); the
  * exact recount then shuffles only the occurrences of those
  * candidates (a broadcast semi-join cuts everything else before the
  * exchange).
  *
  * No false negatives, by pigeonhole twice over: Misra-Gries with m
  * counters retains every item whose LOCAL count exceeds n_p/(m+1);
  * and an item with GLOBAL count > N/(m+1) must exceed n_p/(m+1) in
  * at least one partition (if it were ≤ everywhere, summing gives
  * ≤ N/(m+1)). So requiring θ·(m+1) ≥ 1 guarantees every θ-heavy item
  * is a candidate. False positives die in the exact recount, so the
  * output is EXACTLY `{item : count(item) ≥ ⌈θ·N⌉}` with exact counts
  * — which is why a plain HAVING twin can hash-match it.
  *
  * The Misra-Gries pass is genuine per-partition imperative state
  * (the mapPartitions carve-out): a bounded hash map with the classic
  * decrement-all step, O(1) amortized per item, O(m) memory.
  */
object Freq {

  /** @param items single-column input; the column named `itemCol` is
    *              counted (cast to string for the counter map)
    * @param theta frequency threshold in (0, 1): emit items with
    *              count ≥ ⌈θ·N⌉
    * @param m     Misra-Gries counters per partition; θ·(m+1) ≥ 1
    *              required for the no-false-negative guarantee
    */
  def heavyHitters(
      items: DataFrame,
      itemCol: String,
      theta: Double,
      m: Int = 512): DataFrame = {
    // STRICT inequality: at the boundary theta*(m+1) == 1 an item with
    // global count exactly N/(m+1) = ceil(theta*N) passes the HAVING cut
    // yet can have local count exactly n_p/(m+1) in EVERY partition —
    // Misra-Gries only retains items strictly above n_p/(m+1), so the
    // boundary item would be a silent false negative.
    require(theta * (m + 1) > 1.0,
      s"theta*(m+1) must be > 1 for completeness: theta=$theta m=$m")
    recount(items, mgCandidates(items, itemCol, m), itemCol, theta)
  }

  /** Stage 1: the per-partition Misra-Gries candidate keys — ≤ m per
    * partition, a bounded sketch artifact. Mergeable across any
    * partitioning of the corpus (micro-batches included): completeness
    * holds over the UNION of candidate sets from any cell
    * decomposition, by the pigeonhole argument above.
    */
  def mgCandidates(items: DataFrame, itemCol: String, m: Int = 512): DataFrame = {
    require(m > 0)
    val spark = items.sparkSession
    import spark.implicits._
    items.select(col(itemCol).cast("string")).as[String]
      .mapPartitions { it =>
        val counters = new java.util.HashMap[String, java.lang.Long](m * 2)
        it.foreach { x =>
          val c = counters.get(x)
          if (c ne null) counters.put(x, c + 1L)
          else if (counters.size < m) counters.put(x, 1L)
          else {
            // decrement-all: every live counter pays one; zeros evict
            val e = counters.entrySet().iterator()
            while (e.hasNext) {
              val kv = e.next()
              if (kv.getValue == 1L) e.remove() else kv.setValue(kv.getValue - 1L)
            }
          }
        }
        import scala.jdk.CollectionConverters._
        counters.keySet().iterator().asScala
      }
      .toDF(itemCol)
      .distinct()
  }

  /** Stage 2: exact recount of the bounded candidate set + the θ cut.
    * Output is exactly `{item : count(item) ≥ ⌈θ·N⌉}` with exact
    * counts, provided `candidates` ⊇ the θ-heavy set.
    */
  def recount(
      items: DataFrame,
      candidates: DataFrame,
      itemCol: String,
      theta: Double): DataFrame = {
    require(theta > 0.0 && theta < 1.0, s"theta must be in (0,1): $theta")
    val tot = items.agg(count(lit(1)).as("n_total"))
    items
      .join(broadcast(candidates), Seq(itemCol), "left_semi")
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tot))
      .filter(col("cnt") >= ceil(lit(theta) * col("n_total")))
      .select(col(itemCol), col("cnt"),
        round(col("cnt").cast("double") / col("n_total").cast("double"), 5).as("share"))
      .orderBy(col("cnt").desc, col(itemCol))
  }
}
