package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JSON-lines ingest/export — the interchange format half the world's
  * training corpora arrive in (one JSON object per line, newline-delimited,
  * gzip-friendly). The reference's export surface is JSON documents
  * (/root/reference/No_Sql.py:404-445 materializes Mongo cursors to JSON);
  * this is the engine-side dual: a distributed JSONL sink plus a
  * schema-enforced splittable source.
  *
  * Scale notes: the read ALWAYS takes an explicit schema — schema inference
  * is a full extra pass over 100 TB and can silently widen types between
  * runs; with a schema the JSON source is a narrow, splittable,
  * whole-stage-codegen'd scan (Jackson parse per line), and corrupt lines
  * surface per the session's `spark.sql.jsonParser` policy rather than
  * poisoning inference. The write is one file per partition — partition the
  * upstream frame to control file sizes, same as any file sink.
  */
object JsonLines {

  /** Write `df` as JSON lines under `path` (overwrite), then read it back
    * with the SAME schema. The round trip certifies the codec: quoting,
    * escaping, nested-JSON-in-string payloads, and numeric fidelity all
    * have to survive serialize → parse to hash-match an oracle reading the
    * original table. Nullability does NOT round-trip — a JSON source reads
    * every field nullable, because any line may legally omit a key. */
  def roundTrip(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").json(path)
    read(df.sparkSession, df.schema, path)
  }

  /** Schema-enforced JSONL read (FAILFAST: a malformed line is a loud
    * error, not a silent null row — corrupt-record tolerance is a policy
    * decision the caller makes explicitly, not a default). */
  def read(s: SparkSession, schema: org.apache.spark.sql.types.StructType,
           path: String): DataFrame =
    s.read.schema(schema).option("mode", "FAILFAST").json(path)
}
