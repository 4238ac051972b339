package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata, and decode / feature-extraction runs as a
  * per-partition batch transform over a typed Dataset.
  *
  * The DECODE STEP IS A STUB — no image/audio codecs exist in this
  * container, so [[decodeStub]] derives deterministic fake features from the
  * raw bytes. Everything around it is the real Spark shape you'd keep when
  * swapping in a codec: schema, Encoders, `mapPartitions` batching (decoder
  * state initialized once per partition, not per row), and partition-local
  * work with no shuffle.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata (SURVEY.md's multimodal
    * mandate). `kind` ∈ image/audio/video in a real pipeline. */
  final case class Media(id: Long, kind: String, bytes: Array[Byte])

  final case class MediaFeatures(id: Long, kind: String, n_bytes: Long,
                                 byte_sum: Long, width: Int, height: Int)

  /** STUB decoder — deterministic fake in place of a codec: "dimensions"
    * from the first two bytes, a checksum-ish feature from the byte sum.
    * Replace with a real decoder; the signature (bytes → features) and the
    * call shape (per-partition, reusable decoder state) stay the same. */
  def decodeStub(bytes: Array[Byte]): (Long, Int, Int) = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    val w = if (bytes.length > 0) (bytes(0) & 0xff) + 1 else 0
    val h = if (bytes.length > 1) (bytes(1) & 0xff) + 1 else 0
    (sum, w, h)
  }

  /** Batch feature extraction: one decoder "session" per partition (the
    * real-codec pattern — JNI contexts / model handles are per-partition,
    * never per row), rows streamed through it lazily. */
  def features(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { m =>
        val (sum, w, h) = decodeStub(m.bytes)
        MediaFeatures(m.id, m.kind, m.bytes.length.toLong, sum, w, h)
      }
    }
  }

  /** Fixture adapter: documents.text bytes stand in for media payloads so
    * the plumbing is exercised end-to-end on the driver's testdata. */
  def fromDocuments(spark: SparkSession, documents: DataFrame): Dataset[Media] = {
    import spark.implicits._
    documents.select(col("doc_id").as("id"), lit("text").as("kind"),
      col("text").cast("binary").as("bytes")).as[Media]
  }

  /** Metadata-only projection (no decode): id, kind, payload size. */
  def meta(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      octet_length(col("text")).cast("long").as("n_bytes"))

  final case class Frame(id: Long, frame_idx: Long, n_bytes: Long,
                         byte_sum: Long)

  /** Frame sampling over an opaque media payload: the byte stream is cut
    * into fixed `frameBytes` chunks ("frames" — a real decoder would emit
    * decoded frames here) and every `step`-th frame is kept. The classic
    * video-pipeline shape: per-partition batch transform, one output row
    * per sampled frame, no shuffle — sampling density scales the work
    * linearly and each 100 TB split samples independently.
    *
    * The per-frame feature is the STUB (byte count + byte sum standing in
    * for a decode+embed); the flatMap plumbing — chunking, stride, typed
    * output rows — is the part a real codec drops into. */
  def frameSample(media: Dataset[Media], frameBytes: Int = 64,
                  step: Int = 4): Dataset[Frame] = {
    require(frameBytes > 0 && step > 0)
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val nFrames = (m.bytes.length + frameBytes - 1) / frameBytes
      (0 until nFrames by step).iterator.map { i =>
        val from = i * frameBytes
        val until = math.min(from + frameBytes, m.bytes.length)
        var sum = 0L
        var j = from
        while (j < until) { sum += m.bytes(j) & 0xff; j += 1 }
        Frame(m.id, i.toLong, (until - from).toLong, sum)
      }
    }
  }
}
