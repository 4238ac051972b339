package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned) tables — the co-located-join primitive.
  *
  * A shuffle join moves BOTH sides across the wire on every query. Writing
  * fact and dimension bucketed (and sorted) by the join key moves that
  * shuffle to write time, once: every subsequent equi-join on the key
  * plans with NO Exchange and NO Sort on either side. At 100 TB, for keys
  * joined repeatedly (custkey, user_id), this converts the dominant
  * per-query cost into a one-time layout decision — the same reasoning as
  * the reference delegating to MongoDB's persistent indexes.
  *
  * Bucket counts must MATCH (or divide) across tables for co-location,
  * and `spark.sql.sources.bucketing.enabled` (default true) must be on.
  */
object Bucketing {

  /** Write `df` as an external bucketed+sorted table at `path`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(table)

  /** Equi-join two bucketed tables on their bucket key — plans
    * exchange-free when both were written with [[writeBucketed]] and the
    * same bucket count. */
  def colocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String, leftKey: String,
                    rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
