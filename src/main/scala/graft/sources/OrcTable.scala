package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC ingest/export — the second columnar interchange format large
  * warehouses standardize on (Hive/Trino lineage, where parquet is the
  * Spark-native default). The engine treats it exactly like parquet: a
  * splittable, predicate-pushdown-capable columnar scan, so a corpus
  * delivered as ORC needs no conversion pass before querying.
  *
  * Scale notes: Spark's native ORC reader supports column pruning and
  * filter pushdown to stripe/row-group level (`spark.sql.orc.filterPushdown`
  * is on by default), so the 100 TB cost model is the same as parquet —
  * touched columns × surviving stripes, not file bytes. The read takes an
  * explicit schema for the same reason [[JsonLines.read]] does: inference
  * is an extra footer pass and can drift between runs.
  */
object OrcTable {

  /** Write `df` as ORC under `path` (overwrite), then read it back with
    * the SAME schema. The round trip certifies the codec end-to-end:
    * strings (including any control chars the corpus carries), numerics,
    * and nulls must survive serialize → parse to hash-match an oracle
    * reading the original parquet. */
  def roundTrip(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").orc(path)
    read(df.sparkSession, df.schema, path)
  }

  def read(s: SparkSession, schema: StructType, path: String): DataFrame =
    s.read.schema(schema).orc(path)
}
