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

  /** `excludeSelf` is only valid when queries and corpus are the SAME table
    * (self-search / dedup): on distinct tables with overlapping id spaces it
    * would silently drop the corpus row that happens to share the query's id. */
  private def notSelf(excludeSelf: Boolean): Column =
    if (excludeSelf) col("q_id") =!= col("c_id") else lit(true)

  /** Shared per-query ranking over (q_id, c_id, cosine). Degenerate scores
    * are dropped BEFORE the window: Spark orders NaN above every real value,
    * so one zero-norm (or NaN-element) corpus embedding would otherwise rank
    * first in EVERY query's top-k, silently evicting a true neighbor; a NULL
    * cosine (null element / dimension mismatch — the kernels' null contract)
    * carries no ranking information either. Dropping is detectable (the row
    * count shrinks); a poisoned rank 1 is not. */
  private def rank(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("c_id"))
    scored.filter(col("cosine").isNotNull && !isnan(col("cosine")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /**
   * Exact brute-force cosine top-k: broadcast the (small) query set against the
   * corpus scan; per-query row_number over cosine desc.
   */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id",
      excludeSelf: Boolean = true): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_v")))
    val c = corpus.select(col(idCol).as("c_id"), col(vecCol).as("c_v"))
    val scored = c.join(q, notSelf(excludeSelf))
      .select(col("q_id"), col("c_id"), cosine(col("q_v"), col("c_v")).as("cosine"))
    rank(scored, k)
  }

  /**
   * Deterministic IVF codebook: Lloyd's refinement over the corpus. Init =
   * the `cells` vectors with the smallest xxhash64(id) (seeded, spread across
   * the corpus, no RNG state); each iteration assigns every vector to its
   * nearest centroid (codegen'd [[graft.functions.NearestCells]] — no
   * per-element lambda) and re-averages per (cell, dimension) with one
   * posexplode aggregation. Centroids returned unit-normalized so dot ranking
   * equals cosine ranking. Driver memory is O(cells × dim) — trivial.
   */
  def trainCentroids(
      corpus: DataFrame, cells: Int, iters: Int = 2,
      vecCol: String = "embedding", idCol: String = "vec_id"): Array[Array[Double]] = {
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    var cents = corpus
      // dirty-row tolerance, the kernels' own contract (nearest_cells yields
      // NULL for a null/mismatched embedding): a NULL vector or element among
      // the seed rows would NPE the driver-side read below, killing the whole
      // job for one bad row — degrade the row, never the job
      .filter(col(vecCol).isNotNull && !array_contains(
        transform(col(vecCol), x => x.isNull), lit(true)))
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(cells)
      // read generically: the NearestCells/VecElem kernels accept any numeric
      // array element type, so centroid init must too (array<double>/<int>
      // embeddings would ClassCastException on a hardcoded getSeq[Float])
      .select(col(vecCol)).collect()
      .map(_.getSeq[Number](0).map(_.doubleValue()).toArray)
      .map(normalize)
    // before the Lloyd loop: an empty corpus would otherwise die inside the
    // nearest-cells kernel with a bare unlabeled 'requirement failed'
    require(cents.nonEmpty,
      s"trainCentroids: corpus is empty — nothing to index (cells=$cells)")
    for (_ <- 0 until iters) {
      val dims = corpus
        .select(element_at(VectorOps.nearest_cells(col(vecCol), cents, 1), 1).as("cell"),
          posexplode(col(vecCol)).as(Seq("pos", "x")))
        // nearest_cells is NULL for a dimension-mismatched/null embedding
        // (kernel contract) — such rows must skip the update, not NPE the
        // driver-side getInt on a null cell group
        .filter(col("cell").isNotNull)
        .groupBy("cell", "pos")
        .agg(avg(col("x").cast(DoubleType)).as("m"))
        .collect()
      val next = cents.map(_.clone())
      dims.groupBy(_.getInt(0)).foreach { case (cell, rows) =>
        val v = new Array[Double](rows.map(_.getInt(1)).max + 1)
        rows.foreach(r => v(r.getInt(1)) = r.getDouble(2))
        next(cell) = normalize(v)
      }
      cents = next // cells with no members keep their previous centroid
    }
    cents
  }

  /**
   * IVF ANN top-k: corpus partitioned into `cells` inverted lists by nearest
   * centroid; each query probes its `probes` nearest cells (multi-probe —
   * recall/candidate-ratio knob). Candidates per query ≈ probes × corpus/cells;
   * the join shuffles by cell id, never all-pairs.
   */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      cells: Int = 16, probes: Int = 2, iters: Int = 2,
      vecCol: String = "embedding", idCol: String = "vec_id",
      excludeSelf: Boolean = true): DataFrame = {
    val cents = trainCentroids(corpus, cells, iters, vecCol, idCol)
    // a corpus smaller than `cells` trains fewer centroids than requested:
    // clamp probes to what exists instead of dying on the kernel's bare
    // `require(probes <= centroids)` (the empty case fails inside
    // trainCentroids with the problem named)
    val effProbes = math.min(probes, cents.length)
    val c = corpus.select(col(idCol).as("c_id"), col(vecCol).as("c_v"),
      element_at(VectorOps.nearest_cells(col(vecCol), cents, 1), 1).as("cell"))
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_v"),
      explode(VectorOps.nearest_cells(col(vecCol), cents, effProbes)).as("cell")))
    val scored = c.join(q, Seq("cell")).filter(notSelf(excludeSelf))
      .select(col("q_id"), col("c_id"), cosine(col("q_v"), col("c_v")).as("cosine"))
    rank(scored, k)
  }

  /**
   * LSH-bucketed ANN top-k: corpus bucketed by hyperplane signature; each query
   * probes only its own bucket. Recall < 1 by design; `planes` trades recall
   * for candidate-set size (16 planes ⇒ ~corpus/65536 candidates per probe).
   */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame, k: Int, planes: Int = 6,
      vecCol: String = "embedding", idCol: String = "vec_id",
      excludeSelf: Boolean = true): DataFrame = {
    val sig = (c: Column) => hyperplaneSignature(c, planes)
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_v"),
      sig(col(vecCol)).as("bucket")))
    val c = corpus.select(col(idCol).as("c_id"), col(vecCol).as("c_v"),
      sig(col(vecCol)).as("bucket"))
    val scored = c.join(q, Seq("bucket")).filter(notSelf(excludeSelf))
      .select(col("q_id"), col("c_id"), cosine(col("q_v"), col("c_v")).as("cosine"))
    rank(scored, k)
  }
}
