package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd's algorithm) — the learned coarse quantizer
  * behind [[IvfIndex]], replacing any need for a pre-existing cell/label
  * column: a real corpus has no planted partition key, so the ANN build
  * stage must LEARN one (FAISS trains its IVF coarse quantizer the same
  * way; Lloyd 1982 is the public algorithm).
  *
  * Execution shape per iteration — the canonical scalable k-means plan:
  *   - ASSIGNMENT is a row-local argmin over the k broadcast centroids
  *     (plan literals, k·d doubles — KB at any corpus size): a narrow
  *     projection riding the scan, no shuffle, no UDF.
  *   - UPDATE is [[Similarity.centroidComponents]]'s portable quantized
  *     mean — one (cell, pos) hash aggregation with map-side partials,
  *     k·d output rows regardless of corpus size; only that metadata-sized
  *     result crosses the driver between iterations.
  * Total cost: `iters` scans of the vectors (FAISS-style practice at
  * 100 TB fits on a hash-sample — pass a sampled frame to [[fit]] and
  * assign the full corpus with [[assignCell]]; the arithmetic is
  * identical either way).
  *
  * Every arithmetic step is engine-portable so an external oracle can
  * replay the training bit-for-bit (the same contract as
  * [[Similarity.centroids]]):
  *   - seeds are the vectors of the k smallest ids (deterministic, no RNG
  *     in the cluster — k-means++ would trade replayability for quality);
  *   - distances compare as `floor(Σ(x−c)² · 1e8 + 0.5)` longs computed
  *     by an IN-ORDER IEEE fold (seeding with 0.0 equals DuckDB's
  *     `list_reduce` first-element seed exactly, because 0.0 + t is
  *     exact), ties break on the lower cell id;
  *   - means quantize through the 1e-10 long sum of
  *     [[Similarity.centroidComponents]] — order-independent integer
  *     accumulation, identical in any engine;
  *   - a cell that loses every member keeps its previous centroid (the
  *     deterministic convention; resampling would need cluster RNG).
  */
object KMeans {

  /** The argmin cell for a vector column against literal centroids —
    * the codegen'd [[graft.functions.CellArgmin]] Expression (primitive
    * loops over a referenced centroid matrix inside whole-stage codegen;
    * bit-identical to the interpreted `array_min` over `aggregate`-fold
    * struct formulation it replaced, which cost k·d interpreted closure
    * calls per row × `iters` corpus passes at build time). Distance is
    * the portable quantized shape from the class doc: in-order IEEE fold
    * of (x−c)² seeded 0.0, `floor(·1e8+0.5)` longs, ties to the lower
    * cell. Row-local, no shuffle. */
  def assignCell(vec: Column, cents: IndexedSeq[Seq[Double]]): Column =
    graft.functions.VectorFunctions.cell_argmin(vec, cents)

  /** Learn `k` centroids with `iters` Lloyd rounds. Returns the final
    * centroid table (k × d doubles — driver metadata, like FAISS's
    * trained quantizer object). Vectors never leave the cluster: only
    * the k·d quantized-mean components are collected per round. */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int,
          iters: Int): IndexedSeq[Seq[Double]] = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val v = Similarity.asDouble(col(vecCol))
    var cents: IndexedSeq[Seq[Double]] = df
      .orderBy(col(idCol)).limit(k)
      .select(v.as("c")).collect()
      .map(_.getSeq[Double](0).toIndexedSeq).toIndexedSeq
    require(cents.size == k,
      s"k=$k seeds need k rows, found only ${cents.size}")
    for (_ <- 1 to iters) {
      val assigned = df.select(assignCell(col(vecCol), cents).as("cell"),
        col(vecCol))
      val upd = Similarity.centroidComponents(assigned, vecCol, "cell")
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toIndexedSeq
        }
      cents = cents.indices.map(j => upd.getOrElse(j, cents(j)))
    }
    cents
  }

  /** `df` plus a learned `cell` column: [[fit]] then one final
    * [[assignCell]] pass with the trained centroids — what
    * [[IvfIndex.buildKMeans]] partitions the index by. */
  def assigned(df: DataFrame, idCol: String, vecCol: String, k: Int,
               iters: Int): DataFrame = {
    val cents = fit(df, idCol, vecCol, k, iters)
    df.withColumn("cell", assignCell(col(vecCol), cents))
  }
}
