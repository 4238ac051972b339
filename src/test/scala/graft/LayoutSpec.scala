package graft

import graft.sources.Layout
import org.apache.spark.sql.functions._

/** Z-order layout: hand-checkable interleaves and the tile-extent bound
  * that makes the layout min/max-prunable. */
class LayoutSpec extends SparkSpec {

  private def z(x: Long, y: Long, bits: Int = 8): Long = {
    import spark.implicits._
    Seq((x, y)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), bits).as("z"))
      .head().getLong(0)
  }

  test("zValue: known interleaves") {
    assert(z(0, 0) == 0L)
    assert(z(1, 0) == 1L)   // x bit 0 -> z bit 0
    assert(z(0, 1) == 2L)   // y bit 0 -> z bit 1
    assert(z(1, 1) == 3L)
    assert(z(3, 3) == 15L)  // two full low bits each
    assert(z(255, 0, bits = 8) == 0x5555L)
    assert(z(0, 255, bits = 8) == 0xAAAAL)
    assert(z(255, 255, bits = 8) == 0xFFFFL)
  }

  test("zValue: only the low `bits` bits are read") {
    // 256 = bit 8, outside an 8-bit interleave -> contributes nothing
    assert(z(256, 0, bits = 8) == 0L)
    assert(z(257, 0, bits = 8) == 1L)
  }

  test("zValue rejects out-of-range bits loudly") {
    import spark.implicits._
    val d = Seq((1L, 1L)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      d.select(Layout.zValue(col("x"), col("y"), 0))
    }
    intercept[IllegalArgumentException] {
      d.select(Layout.zValue(col("x"), col("y"), 32))
    }
  }

  test("zOrderStats: every tile bounds BOTH dimensions to the tile side") {
    import spark.implicits._
    // exhaustive 64x64 grid, 4 low z-bits dropped (2 per dimension)
    // -> 256 buckets, each one full 4x4 tile
    val grid = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val out = Layout.zOrderStats(grid, "x", "y", bits = 6, prefixShift = 4)
      .collect()
    assert(out.length == 256) // 4096 points / 16 per tile
    assert(out.forall { r =>
      r.getLong(1) == 16L &&
        r.getLong(3) - r.getLong(2) == 3L && // max_x - min_x: full tile
        r.getLong(5) - r.getLong(4) == 3L    // max_y - min_y
    })
  }

  test("zOrderStats rejects odd or out-of-range prefix shifts loudly") {
    import spark.implicits._
    val d = Seq((1L, 2L)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      Layout.zOrderStats(d, "x", "y", bits = 8, prefixShift = 7)
    }
    intercept[IllegalArgumentException] {
      Layout.zOrderStats(d, "x", "y", bits = 8, prefixShift = 16)
    }
  }

  test("zValueN: N=2 is bit-identical to zValue; N=3 interleaves " +
      "round-robin; key-width guard refuses") {
    import spark.implicits._
    val d = (0 until 64).flatMap(x => (0 until 8).map(y => (x.toLong,
      y.toLong, ((x * 7 + y) % 16).toLong))).toDF("x", "y", "w")
    // the 2-column special case stays bit-identical
    val diff = d.select((Layout.zValue(col("x"), col("y"), 6) =!=
      Layout.zValueN(Seq(col("x"), col("y")), 6)).as("m"))
      .filter(col("m")).count()
    assert(diff == 0L)
    // hand-checked 3-D interleave: x=1,y=0,w=1 with bits=2 →
    // bit x0@0, w0@2 set → 0b101 = 5; x=0,y=1,w=1 → y0@1, w0@2 → 6
    val z = d.sparkSession.range(1)
      .select(
        Layout.zValueN(Seq(lit(1L), lit(0L), lit(1L)), 2).as("a"),
        Layout.zValueN(Seq(lit(0L), lit(1L), lit(1L)), 2).as("b"))
      .head()
    assert((z.getLong(0), z.getLong(1)) == (5L, 6L))
    // a key that cannot fit a non-negative long refuses loudly
    intercept[IllegalArgumentException] {
      Layout.zValueN(Seq(col("x"), col("y"), col("w")), 22)
    }
    intercept[IllegalArgumentException] {
      Layout.zValueN(Seq(col("x")), 8)
    }
  }
}
