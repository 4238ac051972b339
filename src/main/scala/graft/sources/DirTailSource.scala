package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.{List => JList, Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-dirtail` — a custom DataSource V2 MICRO-BATCH streaming source:
  * a replayable tail over a directory of immutable newline-delimited JSON
  * files, with DETERMINISTIC offsets.
  *
  * Why it exists: the engine's other streams ride Spark's built-in file /
  * rate-micro-batch sources ([[graft.streaming.StreamSources]]); this is
  * the one public extension surface — implementing a `MicroBatchStream`
  * itself — the library exercises directly, the seam a production system
  * uses to adapt a queue or changelog Spark has no connector for.
  *
  * Offset model (the whole correctness story):
  *   - a data file, once written, is IMMUTABLE (the usual log-shipping
  *     contract; writers stage elsewhere and move in);
  *   - the file list is sorted lexicographically, so producers that name
  *     files monotonically (part-00001, 20260814-...) get arrival order;
  *   - an offset is simply "the first `n` files of that sorted list are
  *     consumed". Batch (start, end] therefore names an exact, stable
  *     file slice: the same offsets ALWAYS replay the same rows, which is
  *     what makes checkpoint recovery and `Trigger.AvailableNow` exact.
  *
  * Scale shape: one `InputPartition` per file — each task reads its own
  * file, nothing routes through the driver but the listing (O(files)
  * metadata, the same economics as [[TxTable]] commits). Records are
  * parsed straight to `InternalRow` against the user schema; unparseable
  * lines fail loudly (a tail that silently drops rows is worse than one
  * that stops).
  *
  * Schema contract: the caller MUST supply `.schema(...)` (JSONL carries
  * no types; guessing them per-batch would make offsets replay
  * DIFFERENT rows under a schema change). Supported field types: long,
  * int, double, string, boolean, timestamp (wire format: epoch MICROS as
  * a JSON number — the same portable convention as
  * [[graft.streaming.StreamSources.kafkaEvents]]). Missing field → null.
  */
class DirTailSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-dirtail"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft-dirtail requires an explicit .schema(...): JSONL carries no " +
        "types, and schema inference would make replayed offsets decode " +
        "differently across runs")

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "graft-dirtail requires option(\"path\", <directory>)")
    DirTail.validate(schema)
    new DirTailTable(schema, path)
  }
}

private[sources] class DirTailTable(schema: StructType, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft-dirtail:$path"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  /** Column pruning is the one pushdown that matters for a JSONL tail:
    * Catalyst hands the required columns down
    * (`SupportsPushDownRequiredColumns`) and the reader PARSES only
    * those fields — for a wide event schema projected to two columns,
    * the JSON tokenizer still scans the line but none of the dropped
    * fields are materialized, boxed, or converted (UTF8String copies are
    * the dominant per-row cost). The pruned schema is what
    * `planInputPartitions`' readers decode, so `.explain` shows the
    * narrow ReadSchema exactly like the parquet scans. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DirTailScanBuilder(schema, path)
}

private[graft] class DirTailScanBuilder(full: StructType, path: String)
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
  private var pruned: StructType = full
  override def pruneColumns(required: StructType): Unit = {
    // keep the FULL schema's field order and types (`required` arrives in
    // Catalyst's order and must not reorder what the reader emits); an
    // empty projection (count(*) over the stream) legitimately prunes to
    // zero fields — the reader then emits empty rows, the COUNT is the data
    val keep = required.fieldNames.toSet
    pruned = StructType(full.fields.filter(f => keep.contains(f.name)))
  }
  override def build(): Scan = new Scan {
    override def readSchema(): StructType = pruned
    override def toMicroBatchStream(ckpt: String): MicroBatchStream =
      new DirTailStream(pruned, path)
  }
}

/** Offset = number of files (of the lexicographically-sorted listing)
  * fully consumed. JSON form is just that integer, human-auditable in the
  * checkpoint's offset log. */
private[sources] case class DirTailOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[graft] class DirTailStream(schema: StructType, path: String)
    extends MicroBatchStream {

  /** Sorted stable listing. Files still being staged (dot-prefixed, the
    * convention every log shipper uses for in-flight writes) are
    * invisible; only `*.jsonl` participate so sinks can share the dir. */
  private def listing(): Array[String] = {
    val dir = Paths.get(path)
    if (!Files.isDirectory(dir)) Array.empty
    else Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(f => f.endsWith(".jsonl") && !f.startsWith("."))
      .toArray.sorted
  }

  override def initialOffset(): Offset = DirTailOffset(0L)
  override def latestOffset(): Offset = DirTailOffset(listing().length.toLong)
  override def deserializeOffset(json: String): Offset =
    DirTailOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[DirTailOffset].n.toInt
    val e = end.asInstanceOf[DirTailOffset].n.toInt
    val files = listing()
    require(e <= files.length,
      s"offset $e names files the directory no longer has " +
        s"(${files.length} present) — dirtail files must be immutable")
    files.slice(s, e)
      .map(f => DirTailPartition(s"$path/$f"): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DirTailReaderFactory(schema)
}

private[graft] case class DirTailPartition(file: String)
    extends InputPartition

private[sources] class DirTailReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new DirTailReader(schema, p.asInstanceOf[DirTailPartition].file)
}

private[sources] class DirTailReader(schema: StructType, file: String)
    extends PartitionReader[InternalRow] {
  private val lines: java.util.Iterator[String] = {
    val all: JList[String] =
      Files.readAllLines(Paths.get(file), StandardCharsets.UTF_8)
    all.iterator()
  }
  private val mapper = new ObjectMapper()
  private var row: InternalRow = _

  override def next(): Boolean = {
    var got = false
    while (!got && lines.hasNext) {
      val line = lines.next()
      if (line.trim.nonEmpty) { row = DirTail.parse(mapper, schema, line, file); got = true }
    }
    got
  }
  override def get(): InternalRow = row
  override def close(): Unit = ()
}

private[sources] object DirTail {
  private val Supported: Set[DataType] = Set(LongType, IntegerType,
    DoubleType, StringType, BooleanType, TimestampType)

  def validate(schema: StructType): Unit = schema.fields.foreach { f =>
    require(Supported.contains(f.dataType),
      s"graft-dirtail field '${f.name}': unsupported type " +
        s"${f.dataType.simpleString} (supported: bigint, int, double, " +
        "string, boolean, timestamp-as-epoch-micros)")
  }

  /** One JSONL line → InternalRow. Loud on malformed JSON or a value of
    * the wrong JSON kind; null for an absent or JSON-null field. */
  def parse(mapper: ObjectMapper, schema: StructType, line: String,
            file: String): InternalRow = {
    val node: JsonNode =
      try mapper.readTree(line)
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"graft-dirtail: malformed JSON line in $file: " +
            s"${line.take(120)}", e)
      }
    val vals = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      val v = node.get(f.name)
      vals(i) =
        if (v == null || v.isNull) null
        else f.dataType match {
          case LongType      => v.asLong()
          case IntegerType   => v.asInt()
          case DoubleType    => v.asDouble()
          case BooleanType   => v.asBoolean()
          case StringType    => UTF8String.fromString(v.asText())
          case TimestampType => v.asLong() // epoch micros on the wire
          case other => throw new IllegalStateException(
            s"unreachable: $other passed validate()")
        }
      i += 1
    }
    new GenericInternalRow(vals)
  }
}
