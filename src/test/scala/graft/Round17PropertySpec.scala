package graft

import graft.sources.TxTable
import org.scalacheck.{Gen, Prop, Properties}

/** Properties for the round-17 tx-table work, each against an
  * independent in-memory MODEL of the operation's contract:
  *  - dynamic partition overwrite ≡ (rows of untouched partitions) ∪
  *    (the reload frame) as a multiset, for random tables and frames;
  *  - replaceWhere ≡ (rows not matching the predicate) ∪ (new data);
  *  - type widening preserves every value exactly through parquet's
  *    read-schema promotion, including adversarial floats, and the
  *    rewritten float stats admit an exact-match filter on any row. */
object Round17PropertySpec extends Properties("round17") {

  // each trial writes real parquet commits — keep trials modest (the
  // ComponentsPropertySpec discipline)
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val spark = TestSpark.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("r17prop-").toString + "/tbl"

  private val langs = Seq("aa", "bb", "cc", "dd")

  private val rowsGen: Gen[List[(Long, String, Long)]] =
    Gen.nonEmptyListOf(for {
      id <- Gen.choose(0L, 1000L)
      lang <- Gen.oneOf(langs)
      n <- Gen.choose(-100L, 100L)
    } yield (id, lang, n))

  property("dynoverwrite = untouched-partition rows UNION reload frame") =
    Prop.forAll(rowsGen, rowsGen) { (base, reload) =>
      import spark.implicits._
      val tbl = tmp()
      TxTable.commit(base.toDF("id", "lang", "n"), tbl, "overwrite",
        partitionBy = Some(Seq("lang")))
      TxTable.commit(reload.toDF("id", "lang", "n"), tbl, "dynoverwrite")
      val got = TxTable.read(spark, tbl).select("id", "lang", "n")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toList.sorted
      val touched = reload.map(_._2).toSet
      val expect =
        (base.filterNot(r => touched(r._2)) ++ reload).sorted
      got == expect
    }

  property("replaceWhere = non-matching rows UNION new data") =
    Prop.forAll(rowsGen, Gen.oneOf(langs)) { (base, target) =>
      import spark.implicits._
      val tbl = tmp()
      TxTable.commit(base.toDF("id", "lang", "n"), tbl, "overwrite")
      val fresh = List((5000L, target, 7L), (5001L, target, 8L))
      TxTable.replaceWhere(spark, tbl,
        Seq(org.apache.spark.sql.sources.EqualTo("lang", target)),
        fresh.toDF("id", "lang", "n"))
      val got = TxTable.read(spark, tbl).select("id", "lang", "n")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toList.sorted
      (base.filterNot(_._2 == target) ++ fresh).sorted == got
    }

  property("widen int->long and float->double preserve every value exactly") =
    Prop.forAll(Gen.nonEmptyListOf(for {
      i <- Gen.choose(Int.MinValue, Int.MaxValue)
      f <- Gen.oneOf(Gen.choose(-1e6f, 1e6f),
        Gen.oneOf(0.1f, -0.1f, 1e-30f, 3.4e38f, Float.MinPositiveValue))
    } yield (i, f))) { rows =>
      import spark.implicits._
      val tbl = tmp()
      val indexed = rows.zipWithIndex.map { case ((i, f), k) =>
        (k.toLong, i, f) }
      TxTable.commit(indexed.toDF("k", "i", "f"), tbl, "overwrite")
      TxTable.widenColumn(spark, tbl, "i",
        org.apache.spark.sql.types.LongType): Unit
      TxTable.widenColumn(spark, tbl, "f",
        org.apache.spark.sql.types.DoubleType): Unit
      val got = TxTable.read(spark, tbl).select("k", "i", "f")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toList
      val expect = indexed.map { case (k, i, f) =>
        (k, i.toLong, f.toDouble) }.sortBy(_._1)
      // exact bit-level agreement with Scala's own promotion
      got.zip(expect).forall { case ((k1, i1, f1), (k2, i2, f2)) =>
        k1 == k2 && i1 == i2 &&
          java.lang.Double.doubleToRawLongBits(f1) ==
            java.lang.Double.doubleToRawLongBits(f2)
      } && {
        // and the rewritten float stats admit an exact-match filter on
        // the promoted value of the FIRST row (the wrong-skip trap)
        val probe = indexed.head._3.toDouble
        TxTable.read(spark, tbl)
          .filter(org.apache.spark.sql.functions.col("f") ===
            org.apache.spark.sql.functions.lit(probe))
          .count() >= 1L
      }
    }
}
