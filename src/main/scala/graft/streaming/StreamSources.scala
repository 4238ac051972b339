package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unbounded-source adapters for the events stream.
  *
  * Every operator in [[EventsStream]] takes a plain streaming DataFrame —
  * the operators are source-agnostic by construction. The certified
  * `stream_*` queries drain FILE sources (the only replayable source the
  * driver's oracle can see); this module wires the SAME events shape to
  * genuinely unbounded sources:
  *
  *  - [[rateEvents]]: Spark's built-in `rate-micro-batch` provider — a
  *    deterministic rowsPerBatch-per-trigger generator (the stand-in the
  *    Spark source tree itself uses for unbounded-source tests; no
  *    broker in this container). Every derived column is a pure function
  *    of the monotonically increasing `value`, so a test can predict the
  *    exact aggregate any batch prefix must produce.
  *  - [[kafkaEvents]]: the production wiring — `format("kafka")` + JSON
  *    value parse into the same schema. Config-pluggable (bootstrap
  *    servers + topic are the only knobs) and compiled against the
  *    public DataStreamReader API; running it needs the Kafka connector
  *    jar (`spark-sql-kafka-0-10`) on the cluster classpath, which this
  *    container doesn't ship — the rate demo certifies the operator
  *    side, this records the deploy-time config seam.
  */
object StreamSources {

  /** The events table shape (`graft.Tables.events` post-normalization):
    * what every [[EventsStream]] operator consumes. */
  val EventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** events-shaped stream over `rate-micro-batch`: batch `i` carries
    * exactly `value ∈ [i·rowsPerBatch, (i+1)·rowsPerBatch)`, and every
    * column derives from `value` by formula — one event per minute from
    * the epoch, users cycling mod 97, types cycling view/click/purchase,
    * a one-decimal value in [0.0, 99.9] — so an external model recomputes any prefix's
    * aggregate exactly (the planted-fixture discipline of `plantedPpm`
    * and the JL sign matrix, applied to an unbounded source). */
  def rateEvents(spark: SparkSession, rowsPerBatch: Int = 100): DataFrame = {
    require(rowsPerBatch > 0, s"rowsPerBatch must be positive, got $rowsPerBatch")
    spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch.toLong)
      .option("startTimestamp", 0L)
      .load()
      .select(
        col("value").as("event_id"),
        timestamp_micros(col("value") * (60L * 1000000L)).as("ts"),
        (col("value") % 97L).as("user_id"),
        element_at(typedLit(Seq("view", "click", "purchase")),
          (col("value") % 3L + 1L).cast("int")).as("event_type"),
        ((col("value") * 31L % 1000L).cast("double") / 10.0).as("value"),
        lit("{}").as("props"))
  }

  /** Production Kafka wiring for the same shape: the stream's `value`
    * bytes are JSON events parsed against [[EventsSchema]] (ts arrives as
    * epoch micros, the portable wire format — no timezone ambiguity).
    * Needs the Kafka connector on the classpath at runtime; the two
    * options are the entire config surface, everything downstream is
    * identical to the file/rate paths. */
  def kafkaEvents(spark: SparkSession, bootstrapServers: String,
                  topic: String): DataFrame = {
    val wire = StructType(EventsSchema.map(f =>
      if (f.name == "ts") StructField("ts_us", LongType) else f))
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .load()
      .select(from_json(col("value").cast("string"), wire).as("e"))
      .select(col("e.event_id"), timestamp_micros(col("e.ts_us")).as("ts"),
        col("e.user_id"), col("e.event_type"), col("e.value"),
        col("e.props"))
  }
}
