package graft.exec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Output-stage result sanitization — the Spark analog of the reference's
  * per-value "json.dumps probe, else str(v)" loop
  * (/root/reference/No_Sql.py:424-433): any value that is not
  * JSON-native (timestamp, date, decimal, binary) is stringified
  * deterministically so the result serializes as plain JSON.
  *
  * Runs as Column casts (codegen'd, fully distributed) — NOT a driver-side
  * loop over collected rows like the reference. Stringification is
  * deterministic: session timezone is pinned UTC (build.sbt), timestamps
  * render as `yyyy-MM-dd HH:mm:ss[.SSS]`, binary as base64.
  */
object Sanitizer {

  def sanitize(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case TimestampType | DateType | _: DecimalType =>
          col(f.name).cast(StringType).as(f.name)
        case BinaryType =>
          base64(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }
}
