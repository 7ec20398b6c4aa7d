package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<float|double>` embedding columns.
  *
  * Everything here is built from higher-order functions (`zip_with`,
  * `aggregate`, `transform`) so it stays inside whole-stage codegen — no
  * UDFs, no serialization boundary. All arithmetic is promoted to double
  * (float32 inputs cast exactly) and folds run sequentially left-to-right,
  * which keeps results deterministic and reproducible across engines.
  *
  * Spark-side counterpart of the reference's vector search leg
  * (reference: store.py:313 vector query, embedder.py:41).
  */
object VectorOps {

  /** Elementwise-cast to double (no-op cost for float inputs; exact). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x
    )

  /** L2 norm in double precision. */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine rounded to `scale` decimals — the canonical comparison form.
    * Rounding collapses sub-ulp differences from summation order so
    * rankings are stable across partitionings and engines.
    */
  def cosineRounded(a: Column, b: Column, scale: Int = 5): Column =
    round(cosine(a, b), scale)

  /** Codegen'd single-loop cosine via the native `cosine_sim` Catalyst
    * expression (graft.plans.CosineSimilarity). Call
    * `GraftFunctions.register(spark)` once per session (operators using
    * this do it from `df.sparkSession`). Bit-identical to [[cosine]].
    */
  def cosineFastRounded(a: Column, b: Column, scale: Int = 5): Column =
    round(call_function("cosine_sim", a, b), scale)

  /** L2-normalize to the unit sphere (doubles). On unit vectors,
    * euclidean distance is monotone in cosine — this is what lets a
    * euclidean KMeans coarse quantizer serve a cosine search.
    *
    * The norm is BOUND ONCE through a 1-element struct wrapper before
    * the per-element division — splicing `l2Norm(v)` (an O(d) fold)
    * directly into the transform lambda would re-evaluate the whole
    * fold for every element: O(d²) per row, the same substitution/
    * re-evaluation class as [[graft.functions.TextOps.rawShingles]]'s
    * token binding (lambda variables are opaque to both interpreted
    * re-evaluation and optimizer substitution).
    */
  def normalize(v: Column): Column =
    flatten(transform(
      array(struct(toDouble(v).as("v"), l2Norm(v).as("n"))),
      s => transform(s.getField("v"), x => x / s.getField("n"))))

  /** Squared euclidean distance in double precision. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, x) => acc + x
    )
}
