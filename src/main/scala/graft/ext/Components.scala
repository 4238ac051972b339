package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the step that turns near-dup
  * PAIRS (MinHash/SimHash/LSH output) into dedup CLUSTERS with a canonical
  * representative. Production dedup needs this: pairs (a,b),(b,c) must
  * collapse to one cluster {a,b,c} keeping min-id, not two independent
  * decisions.
  *
  * Algorithm: iterative min-label propagation — every node repeatedly
  * takes the minimum label among itself and its neighbors until a fixpoint.
  * Each round is one equi-join + one groupBy (two shuffles) over the EDGE
  * list, all partition-parallel; rounds needed = graph diameter, and
  * near-dup graphs are unions of small dense clusters (diameter a few
  * hops), so convergence is fast regardless of corpus size. The label
  * frame is localCheckpoint'ed each round to cut the growing lineage —
  * without it, iteration k replans k joins deep.
  *
  * Converged = a fixpoint: the round's labels equal the previous round's
  * everywhere. Over budget → loud failure, never a silently-partial
  * clustering.
  */
object Components {

  /** @param edges undirected pair list (columns `src`, `dst`)
    * @return (id, component) — component = min node id reachable, i.e. the
    *         canonical representative; only nodes present in `edges`
    *         appear (singletons have no pair and need no resolution) */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val sym = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .union(edges.select(col("dst").cast("long").as("src"),
        col("src").cast("long").as("dst")))
      .localCheckpoint(true) // read many times; the pair job runs ONCE
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var iter = 0
    while (iter < maxIter) {
      val nbrMin = sym.join(labels, sym("dst") === labels("id"))
        .groupBy(sym("src").as("nid"))
        .agg(min(col("comp")).as("nbr_comp"))
      val next = labels.join(nbrMin, labels("id") === col("nid"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp")))
            .as("next_comp"), col("comp").as("prev_comp"))
        .localCheckpoint(true)
      val changed = next.filter(col("next_comp") < col("prev_comp")).count()
      labels = next.select(col("id"), col("next_comp").as("comp"))
      if (changed == 0) return labels
      iter += 1
    }
    throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds — graph " +
        "diameter exceeds the budget; raise maxIter explicitly")
  }

  /** Apply a clustering to the corpus: keep every document EXCEPT
    * non-canonical cluster members (the cluster minimum survives;
    * documents in no cluster were never duplicated and pass through).
    *
    * Shape: left_anti join against the drop list. The drop list is
    * |clustered docs| − |clusters| rows — duplicates only, tiny next to
    * the corpus — so Spark broadcasts it and the corpus never shuffles. */
  def applyClusters(df: DataFrame, idCol: String,
                    clusters: DataFrame): DataFrame = {
    val drop = clusters.filter(col("id") =!= col("comp")).select(col("id"))
    df.join(broadcast(drop), df(idCol) === drop("id"), "left_anti")
  }
}
