package graft

import graft.functions.VectorOps
import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._

class CosineExprSpec extends SparkSpec {
  import spark.implicits._

  test("native cosine_sim is bit-identical to the HOF cosine") {
    GraftFunctions.register(spark)
    val df = Tables.embeddings(spark, sf).limit(200)
      .crossJoin(Tables.embeddings(spark, sf).limit(5).select(col("embedding").as("q")))
    val cmp = df.select(
      VectorOps.cosine(col("embedding"), col("q")).as("hof"),
      call_function("cosine_sim", col("embedding"), col("q")).as("native")
    )
    assert(cmp.filter(col("hof") =!= col("native")).count() == 0)
  }

  test("cosine_sim is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val v = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c," +
        " cosine_sim(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS p"
    ).head
    assert(v.getDouble(0) == 0.0)
    assert(math.abs(v.getDouble(1) - 1.0) < 1e-15)
  }

  test("cosine_sim rejects non-array inputs at analysis") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim(1, 2)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("cosine_sim") ||
      e.getMessage.toLowerCase.contains("data type"))
  }

  test("null array elements null-poison the result, matching the HOF form") {
    GraftFunctions.register(spark)
    val df = spark.sql(
      "SELECT cosine_sim(array(1.0D, CAST(NULL AS DOUBLE), 3.0D), array(1.0D, 2.0D, 3.0D)) AS n," +
        " cosine_sim(array(1.0D, 2.0D), array(1.0D, 2.0D)) AS ok")
    val r = df.head
    assert(r.isNullAt(0), "null element must yield null, not garbage")
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-15)
  }
}
