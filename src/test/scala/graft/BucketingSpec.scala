package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join: the 100 TB technique for repeated joins on
  * the same key — both sides pre-hashed into matching buckets so the
  * join plan has NO shuffle exchange (SURVEY §3 "co-locate joins via
  * bucketing").
  */
class BucketingSpec extends SparkSpec {

  test("joining two tables bucketed on the join key produces no shuffle") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")

    Tables.orders(spark, sf)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, sf)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count("*").as("n"))

    // Force a non-broadcast join so the bucketing is what saves the shuffle.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle-class join operator:\n$plan")
      // the join keys arrive pre-partitioned: no Exchange under the join
      val exchanges = "Exchange hashpartitioning\\((l_orderkey|o_orderkey)".r
        .findAllIn(plan).length
      assert(exchanges == 0, s"bucketed join should not re-shuffle join keys:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
