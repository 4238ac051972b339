package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A PERSISTED IVF (inverted-file) index for embedding search — the
  * build-once/query-many dual of [[Similarity.ivfTopK]], which recomputes
  * centroids on every call (fine as a query shape, wasteful as an index).
  *
  * Layout on disk ("the index"):
  *   `<path>/centroids/` — one row per cell: (cell, centroid array<double>);
  *                         nlist rows, metadata-sized at any data scale.
  *   `<path>/data/cell=<v>/` — the vectors, PARTITIONED BY CELL: a probe
  *                         reads only the probed cells' directories
  *                         (Catalyst partition pruning — `PartitionFilters`
  *                         on the scan), so query cost is nprobe/nlist of
  *                         the data regardless of table size.
  *
  * The cell assignment is an existing coarse-quantization column (the
  * `label` column plays the nlist role on the test corpus); a production
  * build would learn cells with k-means over a sample and assign by
  * nearest centroid — the index layout, probe selection, and pruned-scan
  * query path are identical either way.
  *
  * Centroid arithmetic matches [[Similarity.centroids]] exactly (the
  * portable floor(x·1e10 + 0.5) long-quantized accumulation —
  * order-independent integer sums) so an external engine can reproduce the
  * probe selection bit-for-bit.
  */
object IvfIndex {

  /** Build the index: write vectors partitioned by cell plus the per-cell
    * centroid table. One pass over the data + one centroid aggregation —
    * both fully distributed. */
  def build(df: DataFrame, idCol: String, vecCol: String, cellCol: String,
            path: String): Unit = {
    df.select(col(idCol), col(vecCol), col(cellCol).as("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(s"$path/data")
    Similarity.centroids(df, vecCol, cellCol)
      .withColumnRenamed("grp", "cell")
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Top-k cosine search against a built index: rank the nlist centroids
    * (tiny — collected to the driver like any metadata), then scan ONLY the
    * `nprobe` probed cell partitions. No centroid recomputation, no
    * full-table scan. */
  def topK(spark: SparkSession, path: String, idCol: String, vecCol: String,
           query: Seq[Double], k: Int, nprobe: Int): DataFrame = {
    val probes = spark.read.parquet(s"$path/centroids")
      .select(col("cell"),
        round(Similarity.cosine(col("centroid"), typedLit(query)), 4)
          .as("csim"))
      .orderBy(col("csim").desc, col("cell"))
      .limit(nprobe)
      .collect().map(_.get(0)).toIndexedSeq
    val data = spark.read.parquet(s"$path/data")
      .filter(col("cell").isin(probes: _*))
    Similarity.topK(data, idCol, vecCol, query, k)
  }
}
