package graft.functions

import graft.ext.Hll
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._

/** The certified-HLL sketch as a NATIVE Catalyst aggregate
  * (`TypedImperativeAggregate`) — the repo's register-rows formulation
  * ([[graft.ext.Hll.registers]]) re-expressed as what a sketch is at the
  * execution layer: a 64-byte buffer per (partition, group) that
  * partial-aggregates map-side and merges by bytewise max.
  *
  * Why both formulations exist:
  *  - the register-ROWS shape is what Structured Streaming and external
  *    engines can maintain (a plain `max` aggregation — `stream_hll`
  *    certifies exactly that), and its state is queryable SQL data;
  *  - THIS shape is the cheaper batch plan: the wire carries one 64-byte
  *    buffer per group per map partition instead of ≤ m register rows,
  *    and no intermediate (group, register) frame materializes at all —
  *    the classic DataSketches-style aggregate.
  *
  * Every bit of arithmetic — the two-round multiply-mod/xor-shift hash,
  * the h mod m / h div m register split, the 26 − bitlength(w) rank, the
  * bytewise-max merge, the exact dyadic harmonic sum, and the one
  * fixed-order double division — is copied verbatim from the certified
  * column formulation, so `agg_hll_native` hash-matches the SAME DuckDB
  * oracle as `agg_hll` ([[graft.EntryHelpers.HllOracle]]): two execution
  * strategies, one bit-exact answer.
  */
case class HllSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  private val m = Hll.Registers // 64
  private val rankBase = Hll.RankBase.toInt // 26

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v match {
        case d: Decimal => d.toLong
        case n: java.lang.Number => n.longValue() // cast-to-long semantics
      }
      val p = 2147483647L
      val x0 = ((k % p) + p) % p
      val x1 = (x0 * 1103515245L) % p
      val x2 = x1 ^ (x1 >>> 15)
      val x3 = (x2 * 1566083941L) % p
      val h = x3 ^ (x3 >>> 13)
      val reg = (h % m).toInt
      val w = h / m
      val rank =
        if (w == 0L) rankBase
        else rankBase - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rank > buf(reg)) buf(reg) = rank.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var nRegs = 0L
    var isum = 0L
    var i = 0
    while (i < m) {
      if (buf(i) > 0) { nRegs += 1; isum += 1L << (rankBase - buf(i)) }
      else isum += Hll.AbsentWeight
      i += 1
    }
    // identical association to the column estimate: (α·m²)·2^26 / isum
    val est = (0.709 * (m.toLong * m).toDouble) *
      Hll.AbsentWeight.toDouble / isum.toDouble
    InternalRow(nRegs, isum, est)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def dataType: DataType = StructType(Seq(
    StructField("n_regs", LongType, nullable = false),
    StructField("isum", LongType, nullable = false),
    StructField("hll_estimate", DoubleType, nullable = false)))
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_sketch needs a numeric key, got ${other.simpleString} — " +
        "fold strings to a long first (same contract as Hll.registers)")
  }

  override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "hll_sketch"
}

/** Column entry point for the native sketch aggregate. */
object HllFunctions {
  /** `hll_sketch(key)` — struct(n_regs, isum, hll_estimate), SQL
    * count-distinct null semantics (NULL keys count nothing). */
  def hll_sketch(key: Column): Column =
    GraftBridge.column(
      HllSketchAgg(GraftBridge.expression(key)).toAggregateExpression())
}
