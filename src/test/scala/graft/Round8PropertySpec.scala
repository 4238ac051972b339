package graft

import graft.ext.{Dedup, Merge, Olap, TextStats}
import graft.sources.Compaction
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** Properties for the round-8 batch operators, each checked against an
  * independent in-memory Scala oracle on random inputs:
  *  - momentStats equals exact BigInt moment arithmetic + the same
  *    one-division-then-round finish;
  *  - lenDeciles reproduces the (cum_before·k) div total cut rule, covers
  *    every doc exactly once, and never splits a length value;
  *  - Compaction.plan reproduces start-offset integer division per
  *    partition dir and never reorders or splits files;
  *  - overlapRate is bounded in [0,1] and hits 1.0 when eval ⊆ train;
  *  - scd2 intervals chain per key (valid_to = next valid_from, one open
  *    interval at most, delete rows emit nothing). */
object Round8PropertySpec extends Properties("round8") {

  private lazy val spark = TestSpark.spark

  // ---------------------------------------------------------- momentStats
  private val genMoney: Gen[List[(String, Long)]] = for {
    n <- Gen.choose(1, 40)
    xs <- Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b", "c"),
      Gen.choose(-100000L, 100000L))) // cents
  } yield xs

  private def round4(x: Double): Double =
    new java.math.BigDecimal(x).setScale(4, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  property("momentStats equals exact BigInt moments + one division") =
    Prop.forAll(genMoney) { xs =>
      import spark.implicits._
      val df = xs.map { case (g, c) => (g, c / 100.0) }.toDF("g", "v")
      val got = Olap.momentStats(df, "g", "v").collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
          r.getDouble(3)))).toMap
      val want = xs.groupBy(_._1).map { case (g, rows) =>
        val cs = rows.map(r => BigInt(r._2))
        val n = BigInt(cs.size)
        val sv = cs.sum
        val svv = cs.map(c => c * c).sum
        g -> ((cs.size.toLong,
          round4(sv.toDouble / cs.size),
          round4((n * svv - sv * sv).toDouble / (n * n).toDouble)))
      }
      (got == want) :| s"got=$got want=$want"
    }

  // ----------------------------------------------------------- lenDeciles
  private val genLens: Gen[(List[Long], Int)] = for {
    n <- Gen.choose(1, 60)
    xs <- Gen.listOfN(n, Gen.choose(0L, 25L)) // heavy ties on purpose
    k <- Gen.oneOf(1, 2, 4, 10)
  } yield (xs, k)

  property("lenDeciles reproduces the integer cut rule and never splits") =
    Prop.forAll(genLens) { case (lens, k) =>
      import spark.implicits._
      val df = lens.zipWithIndex.map { case (l, i) => (i.toLong, l) }
        .toDF("doc_id", "len")
      val got = TextStats.lenDeciles(df, "len", k).collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      val total = lens.size.toLong
      val byLen = lens.groupBy(identity).map { case (l, g) =>
        (l, g.size.toLong) }.toSeq.sortBy(_._1)
      val want = byLen.zip(byLen.scanLeft(0L)(_ + _._2))
        .map { case ((l, c), cumBefore) => ((cumBefore * k) / total, l, c) }
        .groupBy(_._1).map { case (b, rows) =>
          (b, (rows.map(_._3).sum, rows.map(_._2).min, rows.map(_._2).max)) }
      (got == want) :| s"k=$k got=$got want=$want"
    }

  // ------------------------------------------------------------ compaction
  private val genInv: Gen[(List[(String, String, Long)], Long)] = for {
    n <- Gen.choose(0, 25)
    rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf("p1", "p2"),
      Gen.choose(1L, 500L)))
    t <- Gen.oneOf(50L, 100L, 1000L)
  } yield (rows.zipWithIndex.map { case ((p, b), i) =>
    (p, f"f$i%03d", b) }, t)

  property("compaction groups = start-offset div target, per dir") =
    Prop.forAll(genInv) { case (rows, target) =>
      import spark.implicits._
      val df = rows.toDF("part", "path", "bytes")
      val got = Compaction.plan(df, "part", "path", "bytes", target)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3)))
        .toSet
      val want = rows.groupBy(_._1).flatMap { case (p, fs) =>
        val sorted = fs.sortBy(_._2)
        sorted.zip(sorted.scanLeft(0L)(_ + _._3))
          .map { case ((_, path, _), off) => (p, path, off / target) }
      }.toSet
      (got == want) :| s"t=$target got=$got want=$want"
    }

  // ------------------------------------------------------------- overlap
  private val genDocs: Gen[(List[String], List[String])] = {
    val word = Gen.oneOf("a", "b", "c", "d", "e")
    val doc = for {
      n <- Gen.choose(1, 8)
      ws <- Gen.listOfN(n, word)
    } yield ws.mkString(" ")
    for {
      nt <- Gen.choose(1, 6); ne <- Gen.choose(1, 6)
      train <- Gen.listOfN(nt, doc); eval <- Gen.listOfN(ne, doc)
    } yield (train, eval)
  }

  private def shingleSet(text: String): Set[String] = {
    val t = text.split(" ").toSeq
    if (t.size < 3) Set(t.mkString(" "))
    else t.sliding(3).map(_.mkString(" ")).toSet
  }

  property("overlapRate matches the set oracle; eval⊆train gives 1.0") =
    Prop.forAll(genDocs) { case (train, eval) =>
      import spark.implicits._
      val tDf = train.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val eDf = eval.zipWithIndex.map { case (t, i) => (100L + i, t) }
        .toDF("doc_id", "text")
      val trainSet = train.flatMap(shingleSet).toSet
      val got = Dedup.overlapRate(tDf, eDf, "doc_id", "text").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
          r.getDouble(3)))).toMap
      val bounded = got.values.forall { case (n, h, o) =>
        h <= n && o >= 0.0 && o <= 1.0 }
      val exact = eval.zipWithIndex.forall { case (t, i) =>
        val s = shingleSet(t)
        val hits = s.count(trainSet)
        got(100L + i) == ((s.size.toLong, hits.toLong,
          round4(hits.toDouble / s.size)))
      }
      val self = Dedup.overlapRate(tDf, tDf, "doc_id", "text").collect()
        .forall(_.getDouble(3) == 1.0)
      (bounded && exact && self) :| s"got=$got"
    }

  // -------------------------------------------------------- intervalOverlap
  private val genOverlap: Gen[(List[(Long, Long, Long, Long)],
      List[(Long, Long, Long, Long)], Long)] = {
    val iv = Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 120L),
      Gen.choose(-5L, 90L)) // negative lengths: must match nothing
    for {
      nl <- Gen.choose(0, 12); nr <- Gen.choose(0, 12)
      ls <- Gen.listOfN(nl, iv); rs <- Gen.listOfN(nr, iv)
      w <- Gen.oneOf(1L, 7L, 60L, 600L)
    } yield (
      ls.zipWithIndex.map { case ((k, s, len), i) =>
        (i.toLong, k, s, s + len) },
      rs.zipWithIndex.map { case ((k, s, len), i) =>
        (100L + i, k, s, s + len) },
      w)
  }

  property("interval overlap equals the naive scan; every pair ONCE") =
    Prop.forAll(genOverlap) { case (ls, rs, w) =>
      import spark.implicits._
      def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
      val lDf = ls.map { case (id, k, s, e) => (id, k, ts(s), ts(e)) }
        .toDF("lid", "l_key", "l_start", "l_end")
      val rDf = rs.map { case (id, k, s, e) => (id, k, ts(s), ts(e)) }
        .toDF("rid", "r_key", "r_start", "r_end")
      // sorted Seq, not Set: a pair emitted twice must FAIL, not collapse
      val got = graft.ext.RangeJoin.intervalOverlap(lDf, rDf,
          "l_key", "r_key", "l_start", "l_end", "r_start", "r_end",
          bucketSeconds = w)
        .select("lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val want = (for {
        (lid, lk, s1, e1) <- ls
        (rid, rk, s2, e2) <- rs
        if lk == rk && s1 < e2 && s2 < e1 && e1 > s1 && e2 > s2
      } yield (lid, rid)).sorted
      (got == want) :| s"w=$w got=$got want=$want"
    }

  // ------------------------------------------------------------ corrStats
  property("corrStats equals exact BigInt co-moments + fixed-order finish") =
    Prop.forAll(genMoney, genMoney) { (xsRaw, ysRaw) =>
      import spark.implicits._
      val rows = xsRaw.zip(ysRaw).map { case ((g, x), (_, y)) =>
        (g, x / 100.0, y / 100.0) }
      val df = rows.toDF("g", "x", "y")
      val got = Olap.corrStats(df, "g", "x", "y").collect()
        .map(r => (r.getString(0),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        val xs = rs.map(r => BigInt(math.floor(r._2 * 100 + 0.5).toLong))
        val ys = rs.map(r => BigInt(math.floor(r._3 * 100 + 0.5).toLong))
        val n = BigInt(rs.size)
        val varx = n * xs.map(v => v * v).sum - xs.sum * xs.sum
        val vary = n * ys.map(v => v * v).sum - ys.sum * ys.sum
        val cov = n * xs.zip(ys).map { case (a, b) => a * b }.sum -
          xs.sum * ys.sum
        g -> (if (varx.toDouble == 0.0 || vary.toDouble == 0.0) None
          else Some(round4(cov.toDouble /
            (math.sqrt(varx.toDouble) * math.sqrt(vary.toDouble)))))
      }
      (got == want) :| s"got=$got want=$want"
    }

  // -------------------------------------------------------------- keySkew
  property("keySkew matches the counting oracle with its exact per-mille") =
    Prop.forAll(Gen.listOf(Gen.oneOf("a", "b", "c", "d")), Gen.choose(1, 4)) {
      (keys, k) =>
        import spark.implicits._
        (keys.nonEmpty) ==> {
          val got = graft.ext.Skew.keySkew(keys.toDF("key"), "key", k)
            .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
            .toSeq
          val total = keys.size.toLong
          val want = keys.groupBy(identity).map { case (key, g) =>
            (key, g.size.toLong, g.size.toLong * 1000 / total) }
            .toSeq.sortBy(r => (-r._2, r._1)).take(k)
          (got == want) :| s"k=$k got=$got want=$want"
        }
    }

  // ----------------------------------------------------------------- scd2
  private val genFeed: Gen[List[(Long, String, Long, String)]] = for {
    n <- Gen.choose(1, 20)
    rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 4L), Gen.choose(1L, 30L),
      Gen.oneOf("I", "U", "D")))
  } yield rows.map { case (k, seq, op) => (k, s"p$k-$seq", seq, op) }
    .distinctBy(r => (r._1, r._3)) // unique (key, seq): tie order not at test

  property("scd2 intervals chain per key; deletes emit nothing") =
    Prop.forAll(genFeed) { feed =>
      import spark.implicits._
      val df = feed.toDF("k", "payload", "seq", "op")
      val got = Merge.scd2(df, "k", "op", "seq").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
        .toSet
      val want = feed.groupBy(_._1).flatMap { case (k, rows) =>
        val sorted = rows.sortBy(_._3)
        val nextSeq = sorted.map(_._3).drop(1) :+ -1L
        sorted.zip(nextSeq).collect {
          case ((_, p, seq, op), nxt) if op != "D" =>
            (k, p, seq, nxt, nxt == -1L)
        }
      }.toSet
      (got == want) :| s"got=$got want=$want"
    }
}
