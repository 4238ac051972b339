package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional clustering
  * pass behind Delta `OPTIMIZE ZORDER BY` and Iceberg's sort-order zorder:
  * interleaving the bits of two keys gives a single sort key under which
  * rows close in EITHER dimension land in the same file, so per-file
  * min/max zone maps prune scans on both predicates at once — the one
  * layout trick a 100 TB corpus queried by more than one key cannot skip.
  *
  * Everything here is composed from `shiftright`/`bitwiseAND`/`shiftleft`
  * built-ins, so the z-value stays inside whole-stage codegen and the
  * identical arithmetic replays in any engine (the oracle emits the same
  * 2·bits-term expression). No UDF, no shuffle: the z-value is a scan-side
  * projection; what a writer does with it (range-partition + sort-within)
  * is the standard repartitionByRange write, and what the audit below does
  * is one aggregate.
  *
  * The reference has no layout machinery at all (it queries a Mongo server
  * and never writes files); this is engine-first-class surface.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two NON-NEGATIVE integer
    * columns: x's bit i lands at even position 2i, y's at odd 2i+1. Caller
    * is responsible for bounding the inputs into [0, 2^bits) — out-of-range
    * high bits are silently ignored by construction (only the low `bits`
    * are read), which is the documented contract, not a trap: layout keys
    * are always range-bucketed first. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    zValueN(Seq(x, y), bits)

  /** [[zValue]] generalized to N dimensions (Delta's `OPTIMIZE ZORDER
    * BY (c1, …, cN)` accepts any arity): round-robin interleave —
    * column j's bit i lands at position `i·N + j`, so every dimension
    * contributes equally to every prefix and a prefix tile is bounded
    * in ALL N dimensions simultaneously. The 2-column form is the
    * bit-identical special case. The interleaved key must fit a
    * non-negative long: `N·bits ≤ 63`. */
  def zValueN(dims: Seq[Column], bits: Int = 16): Column = {
    val n = dims.size
    require(n >= 2, s"z-order needs at least 2 dimensions, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"need 1 <= bits and dims*bits <= 63, got $n x $bits")
    val longs = dims.map(_.cast("long"))
    (0 until bits).flatMap { i =>
      longs.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Layout audit: bucket rows by the top bits of their z-value (each
    * bucket = one square tile of the key plane = one file of a z-ordered
    * write) and report per-bucket row count and the min/max extent of BOTH
    * dimensions. The point the numbers make: every tile's extent is bounded
    * to 2^(bits - prefixShift/2) in x AND y simultaneously — the property
    * that makes min/max pruning work on either predicate. One groupBy on a
    * scan-side integer; nothing else.
    *
    * `prefixShift` is how many LOW z-bits are discarded; it must be even
    * (odd shifts split tiles mid-dimension) and leave at least one bucket
    * bit. */
  def zOrderStats(df: DataFrame, xCol: String, yCol: String,
                  bits: Int = 8, prefixShift: Int = 8): DataFrame = {
    require(prefixShift > 0 && prefixShift % 2 == 0 && prefixShift < 2 * bits,
      s"prefixShift must be even and in (0, ${2 * bits}), got $prefixShift")
    df.select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .withColumn("bucket",
        shiftright(zValue(col("x"), col("y"), bits), prefixShift))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
  }
}
