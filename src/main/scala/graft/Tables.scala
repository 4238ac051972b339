package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table access for the driver's testdata contract (TESTDATA.md): one
  * parquet file per table under the per-SF dir. The reference's
  * `(db, collection)` addressing (/root/reference/No_Sql.py:389-390)
  * maps to `(dir, tableName)` here.
  *
  * All reads are plain `spark.read.parquet` so Catalyst's filter/column
  * pushdown reaches the scan. At cluster scale these paths would be
  * partitioned directories; nothing here assumes single files.
  */
object Tables {

  val Names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  /** events.ts normalized to a session-tz TimestampType whatever the
    * parquet writer produced — the driver has regenerated the testdata
    * with different physical types across rounds, and downstream
    * event-time operators (`window()`, watermarks, `unix_micros`) require
    * TIMESTAMP, not TIMESTAMP_NTZ:
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it outright;
    *    with `spark.sql.legacy.parquet.nanosAsLong=true` (set in the
    *    session builders) it arrives as nanos-since-epoch LongType and is
    *    truncated here to micros — the same truncation DuckDB applies
    *    casting TIMESTAMP_NS to TIMESTAMP. Integer `div` (not `/`): a
    *    double quotient would lose precision above 2^53 ns.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as
    *    TIMESTAMP_NTZ; the cast interprets the wall clock in the session
    *    timezone (pinned UTC in every builder), which is exactly how
    *    DuckDB's naive TIMESTAMP treats the same bytes — identical
    *    instants on both engines. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** The reference's canonical employees schema (FIXTURES.md §1) derived
    * deterministically from `customer` so the NL-pipeline queries run
    * end-to-end on the driver's testdata. The same mapping is inlined as a
    * subquery in the DuckDB oracles via [[EmployeesOracleView]] (used by the
    * `nl_*` entries in [[graft.SparkEntry.oracleSql]]). */
  def employees(spark: SparkSession, dir: String): DataFrame =
    customer(spark, dir).select(
      col("c_custkey").as("emp_id"),
      col("c_name").as("name"),
      col("c_acctbal").as("salary"),
      when(col("c_mktsegment").isin("MACHINERY", "AUTOMOBILE"), "engineering")
        .when(col("c_mktsegment") === "BUILDING", "sales")
        .when(col("c_mktsegment") === "FURNITURE", "marketing")
        .otherwise("hr").as("department"),
      (col("c_custkey") % 43 + 22).cast("double").as("age"),
      (col("c_custkey") % 30).cast("double").as("experience_years"))

  /** DuckDB subquery mirroring [[employees]] — keep in sync. */
  val EmployeesOracleView: String =
    """(SELECT c_custkey AS emp_id, c_name AS name, c_acctbal AS salary,
      | CASE WHEN c_mktsegment IN ('MACHINERY','AUTOMOBILE') THEN 'engineering'
      |      WHEN c_mktsegment = 'BUILDING' THEN 'sales'
      |      WHEN c_mktsegment = 'FURNITURE' THEN 'marketing'
      |      ELSE 'hr' END AS department,
      | CAST(c_custkey % 43 + 22 AS DOUBLE) AS age,
      | CAST(c_custkey % 30 AS DOUBLE) AS experience_years
      | FROM customer) emp""".stripMargin.replace("\n", " ")
}
