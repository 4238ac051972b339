package graft.exec

import org.apache.spark.sql.DataFrame

/** Result sinks mirroring the reference's client-side exports. */
object Sinks {

  /** CSV export (/root/reference/main.py:211-218). The reference exports
    * the ≤1000-row result envelope, so a single-file CSV is correct parity;
    * `coalesce(1)` here is bounded by the limit clamp and must NOT be used
    * for arbitrary frames — use [[csvSharded]] for those. */
  def csv(df: DataFrame, path: String): Unit =
    Sanitizer.sanitize(df).coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(path)

  /** Scale-safe CSV: one shard per partition, no single-node funnel. */
  def csvSharded(df: DataFrame, path: String): Unit =
    Sanitizer.sanitize(df)
      .write.mode("overwrite").option("header", "true").csv(path)

  /** JSON envelope rows (No_Sql.py:424-433 + app_server.py:258-268):
    * sanitize then toJSON — distributed stringification. */
  def jsonRows(df: DataFrame): DataFrame =
    Sanitizer.sanitize(df).toJSON.toDF("json")
}
