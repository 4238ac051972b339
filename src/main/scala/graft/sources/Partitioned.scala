package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-style partitioned parquet layout — the directory-per-value data
  * organization every 100 TB corpus uses (by language, by source, by
  * date). Writing once partitioned by a low-cardinality column buys every
  * later predicate on it PARTITION pruning: the reader enumerates only
  * matching directories (`PartitionFilters` in the scan), so a
  * one-language query over a hundred-language corpus opens 1% of the
  * files — before any row-group or footer work.
  *
  * Contrast with [[Bucketing]]: bucketing co-locates a HIGH-cardinality
  * join key into a fixed bucket count (shuffle elimination); partitioning
  * splits a LOW-cardinality filter column into directories (scan
  * elimination). A production table often uses both.
  */
object Partitioned {

  /** One directory per `partCol` value. The per-partition file count
    * follows the writing frame's parallelism — repartition on the
    * partition column first if many small files per directory would
    * result (small-file pressure is the classic failure of naive
    * partitioned writes at scale). */
  def write(df: DataFrame, partCol: String, path: String): Unit =
    df.repartition(df.col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
