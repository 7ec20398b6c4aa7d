package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Skew mitigation: salted equi-join.
  *
  * When a join key is heavily skewed (one hot key lands a whole
  * partition on one task), salt the fact side into `saltFactor`
  * sub-keys and replicate the other side once per salt. Each hot key's
  * rows spread over `saltFactor` tasks; results are identical to the
  * plain join. AQE's skew-join handles many cases at runtime — explicit
  * salting is for the pathological keys AQE can't split (e.g. a single
  * giant key inside one shuffle block).
  */
object Skew {

  /** Equi-join `fact` (possibly skewed on `key`) with `other`,
    * spreading each key over `saltFactor` partitions. The fact side's
    * salt is derived deterministically from a uniformly-distributed
    * column (`spreadCol`, e.g. a row id) so the same input always joins
    * identically.
    */
  def saltedJoin(
      fact: DataFrame,
      other: DataFrame,
      key: String,
      spreadCol: String,
      saltFactor: Int
  ): DataFrame = {
    val salted = fact.withColumn("_salt", pmod(hash(col(spreadCol)), lit(saltFactor)))
    val replicated = other
      .withColumn("_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted
      .join(replicated, Seq(key, "_salt"))
      .drop("_salt")
  }
}
