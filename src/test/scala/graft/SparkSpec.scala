package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole suite (Spark startup is ~2s;
  * per-suite sessions would dominate test time). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet is TIMESTAMP(NANOS): same legacy read as Verify/Bench
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // SQL functions + the tx-catalog row-level rule (UPDATE/MERGE)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import scala.jdk.CollectionConverters._

  /** Tiny employees fixture with a NULL department row — exercises the
    * Mongo null semantics paths (SURVEY.md §7.4.1). */
  lazy val employees: DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("emp_id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("age", DoubleType, nullable = true),
      StructField("department", StringType, nullable = true),
      StructField("salary", DoubleType, nullable = true),
      StructField("experience_years", DoubleType, nullable = true)))
    val rows = Seq(
      org.apache.spark.sql.Row(1L, "Ada", 35.0, "engineering", 90000.0, 12.0),
      org.apache.spark.sql.Row(2L, "Bob", 28.0, "sales", 50000.0, 4.0),
      org.apache.spark.sql.Row(3L, "Cat", 45.0, "marketing", 70000.0, 20.0),
      org.apache.spark.sql.Row(4L, "Dan", 35.0, null, 50000.0, 8.0),
      org.apache.spark.sql.Row(5L, "Eve", 52.0, "hr", 120000.0, 30.0))
    spark.createDataFrame(rows.asJava, schema)
  }

  def ids(df: DataFrame): Seq[Long] =
    df.select("emp_id").collect().map(_.getLong(0)).sorted.toSeq
}
