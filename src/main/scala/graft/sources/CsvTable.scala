package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV ingest/export — the lowest-common-denominator interchange format:
  * header row, quoted fields, splittable when single-line. Same contract
  * as [[JsonLines]]/[[OrcTable]]: schema-enforced read (no inference pass
  * over the corpus), FAILFAST on malformed rows, and the write/read pair
  * is certified as a round trip against an oracle on the original table.
  *
  * Honest-format caveat (inherent to CSV, not this codec): an empty
  * string and SQL NULL serialize identically, so nullable string columns
  * do NOT round-trip losslessly — certified queries route non-null
  * columns through CSV and anything nullable through parquet/ORC/JSONL.
  * `multiLine` is enabled on read so quoted embedded newlines parse, at
  * the cost of per-file (not per-split) parallelism on such files —
  * quote-free corpora keep the splittable fast path. */
object CsvTable {

  def roundTrip(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").option("header", "true").csv(path)
    read(df.sparkSession, df.schema, path)
  }

  def read(s: SparkSession, schema: StructType, path: String): DataFrame =
    s.read.schema(schema)
      .option("header", "true")
      .option("multiLine", "true")
      .option("mode", "FAILFAST")
      .csv(path)
}
