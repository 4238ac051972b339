package graft

import graft.ext.{Funnel, Hll, Olap, RangeJoin, TextStats}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** Properties for the round-5 analytics operators, each checked against an
  * independent in-memory Scala oracle on random inputs:
  *  - the bucketed range join equals the naive point-in-interval scan for
  *    every bucket width (bucketing must never change matches);
  *  - type-1 group quantiles equal the sorted-list element at rank
  *    ceil(n·p/100);
  *  - funnel stage counts equal a per-user sequential scan. */
object NewOpsPropertySpec extends Properties("newops") {

  private lazy val spark = TestSpark.spark

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  // ---------------------------------------------------------------- range
  private val genRange: Gen[(List[(Long, Long, Long)],
      List[(Long, Long, Long, Long)], Long)] = for {
    np <- Gen.choose(0, 15)
    ni <- Gen.choose(0, 8)
    ps <- Gen.listOfN(np, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 120L)))
    is <- Gen.listOfN(ni, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 120L),
      Gen.choose(-5L, 60L))) // negative lengths: must match nothing
    w <- Gen.oneOf(1L, 7L, 60L, 600L)
  } yield (
    ps.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
    is.zipWithIndex.map { case ((k, s, len), i) =>
      (100L + i, k, s, s + len) },
    w)

  property("range join equals the naive scan for every bucket width") =
    Prop.forAll(genRange) { case (ps, is, w) =>
      import spark.implicits._
      val pDf = ps.map { case (id, k, t) => (id, k, ts(t)) }
        .toDF("pid", "p_key", "p_ts")
      val iDf = is.map { case (id, k, s, e) => (id, k, ts(s), ts(e)) }
        .toDF("iid", "i_key", "i_start", "i_end")
      // sorted Seq, not Set: a bucketing regression that emits a matching
      // pair twice must fail the property, not be collapsed away
      val got = RangeJoin.pointInInterval(pDf, iDf, "p_key", "i_key",
          "p_ts", "i_start", "i_end", bucketSeconds = w)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val want = (for {
        (pid, pk, pt) <- ps
        (iid, ik, s, e) <- is
        if pk == ik && pt >= s && pt < e
      } yield (pid, iid)).sorted
      (got == want) :| s"w=$w got=$got want=$want"
    }

  // ------------------------------------------------------------ quantiles
  private val genGroups: Gen[List[(String, Long)]] = for {
    n <- Gen.choose(1, 30)
    xs <- Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b", "c"),
      Gen.choose(-50L, 50L)))
  } yield xs

  property("group quantiles equal sorted-list rank selection") =
    Prop.forAll(genGroups, Gen.nonEmptyListOf(Gen.choose(1, 100))) {
      (xs, pcts0) =>
        import spark.implicits._
        val pcts = pcts0.distinct
        val got = TextStats.groupQuantiles(xs.toDF("grp", "v"), "grp", "v",
            pcts)
          .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
          .toMap
        val want = (for {
          (g, vs) <- xs.groupBy(_._1).toSeq
          sorted = vs.map(_._2).sorted
          p <- pcts
        } yield ((g, p.toLong),
          sorted(((sorted.size * p + 99) / 100 - 1).toInt))).toMap
        (got == want) :| s"got=$got want=$want"
    }

  // --------------------------------------------------------------- funnel
  private val genEvents: Gen[List[(Long, String, Long)]] = for {
    n <- Gen.choose(0, 25)
    xs <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 4L),
      Gen.oneOf("A", "B", "C"), Gen.choose(0L, 20L)))
  } yield xs

  private def reachOracle(evts: Seq[(Long, String, Long)],
                          steps: Seq[String]): Seq[Long] = {
    val byUser = evts.groupBy(_._1)
    def reach(userEvts: Seq[(String, Long)]): Int = {
      var stage = 0
      var tMin = Long.MinValue
      for (step <- steps) {
        val cand = userEvts.filter(e => e._1 == step && e._2 >= tMin)
        if (stage == steps.indexOf(step) && cand.nonEmpty) {
          stage += 1
          tMin = cand.map(_._2).min
        }
      }
      stage
    }
    val stages = byUser.values.map(es => reach(es.map(e => (e._2, e._3))))
    steps.indices.map(i => stages.count(_ >= i + 1).toLong)
  }

  property("funnel stage counts equal the per-user sequential oracle") =
    Prop.forAll(genEvents) { evts =>
      import spark.implicits._
      val df = evts.map { case (u, t, s) => (u, t, ts(s)) }
        .toDF("uid", "etype", "ets")
      val steps = Seq("A", "B", "C")
      val got = Funnel.stages(df, "uid", "etype", "ets", steps)
        .orderBy("stage").collect().map(_.getLong(2)).toSeq
      val want = reachOracle(evts, steps)
      (got == want) :| s"got=$got want=$want"
    }

  // ----------------------------------------------------------------- hll
  private def hllReplica(keys: Seq[Long]): Map[Long, Long] = {
    val p = 2147483647L
    keys.map { k =>
      val x0 = ((k % p) + p) % p
      val x1 = x0 * 1103515245L % p
      val x2 = x1 ^ (x1 >>> 15)
      val x3 = x2 * 1566083941L % p
      val h = x3 ^ (x3 >>> 13)
      val w = h / 64
      (h % 64, if (w == 0) 26L else 26L - (64 - java.lang.Long.numberOfLeadingZeros(w)))
    }.groupBy(_._1).map { case (reg, rs) => reg -> rs.map(_._2).max }
  }

  property("hll register state equals the bit-level scala replica") =
    // negative keys included: the engine's pmod and the oracle's
    // ((k % p) + p) % p must agree below zero too
    Prop.forAll(Gen.listOf(Gen.choose(-5000000L, 5000000L))) { keys =>
      import spark.implicits._
      val got = Hll.registers(keys.map(("g", _)).toDF("grp", "key"),
          "grp", "key")
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      val want = hllReplica(keys)
      (got == want) :| s"got=$got want=$want"
    }

  // ---------------------------------------------------------------- olap
  property("rollup subtotals are consistent across grouping levels") =
    Prop.forAll(genGroups) { xs =>
      import spark.implicits._
      val df = xs.map { case (g, v) => (g, if (v >= 0) "p" else "n",
        v.toDouble / 4) }.toDF("a", "b", "amt")
      val rows = Olap.rollupStats(df, Seq("a", "b"), "amt").collect()
        .map(r => (r.getLong(4), Option(r.getString(0)),
          Option(r.getString(1)), r.getLong(2)))
      val leaf = rows.filter(_._1 == 0L)
      val mid = rows.filter(_._1 == 1L)
      val top = rows.filter(_._1 == 3L)
      val leafSum = leaf.map(_._4).sum
      Prop.all(
        (top.length == 1 && top.head._4 == xs.size.toLong) :| "grand total",
        (leafSum == xs.size.toLong) :| "leaves partition the input",
        Prop.all(mid.map(m => (m._4 ==
          leaf.filter(_._2 == m._2).map(_._4).sum) :|
          s"subtotal ${m._2}"): _*))
    }

  // --------------------------------------------------------------- bloom
  private val genWord: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(12))

  property("string bloom keys never produce false negatives") =
    // the round-7 landmine: string keys cast to NULL and the "pruned"
    // join silently returned empty — every built key must now probe true
    Prop.forAll(Gen.nonEmptyListOf(genWord)) { words =>
      import spark.implicits._
      val dim = words.toDF("k")
      val arr = graft.ext.Bloom.buildWords(dim, "k", words = 32, k = 4)
      val missed = dim.filter(!graft.ext.Bloom.mightContain(
        org.apache.spark.sql.functions.col("k"), arr, 4,
        isString = true)).count()
      (missed == 0L) :| s"$missed of ${words.size} built keys probed false"
    }

  // ---------------------------------------------------------- repetition
  private val genDoc: Gen[String] = Gen.chooseNum(1, 12).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd")).map(_.mkString(" ")))

  property("repetition metrics equal the in-memory token-count oracle") =
    Prop.forAll(Gen.nonEmptyListOf(genDoc)) { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = TextStats.repetitionStats(docs, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3))).toSeq.sortBy(_._1)
      val want = texts.zipWithIndex.map { case (t, i) =>
        val toks = t.split(" ", -1).toSeq
        val n = toks.length
        val bigrams = toks.sliding(2).filter(_.length == 2)
          .map(_.mkString(" ")).toSeq
        val dup = if (n < 2) 0.0
          else math.rint((bigrams.length - bigrams.distinct.length).toDouble /
            bigrams.length * 10000) / 10000
        val top = math.rint(toks.groupBy(identity).values.map(_.size).max
          .toDouble / n * 10000) / 10000
        (i.toLong, n.toLong, dup, top)
      }
      (got == want) :| s"got=$got want=$want"
    }

  property("pmi pairs carry exact counts and respect minCount ordering") =
    Prop.forAll(Gen.nonEmptyListOf(genDoc)) { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = TextStats.pmiTopBigrams(docs, "text", minCount = 1L, k = 1000)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
      val toks = texts.map(_.split(" ", -1).toSeq)
      val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong)
      val big = toks.flatMap(_.sliding(2).filter(_.length == 2))
        .groupBy(w => (w(0), w(1))).view.mapValues(_.size.toLong)
      Prop.all(
        (got.length == big.size) :| s"pair count ${got.length} != ${big.size}",
        Prop.all(got.map { case (x, y, cxy, cx, cy) =>
          (big.getOrElse((x, y), -1L) == cxy && uni(x) == cx && uni(y) == cy)
            .:|(s"counts drift for ($x,$y)")
        }: _*))
    }

  // ------------------------------------------------------- quota sampling
  property("quota sampling picks exactly the fingerprint-first rows") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.zip(Gen.oneOf("s0", "s1", "s2"),
        genDoc)), Gen.chooseNum(1, 4)) { (rows, quota) =>
      import spark.implicits._
      val docs = rows.zipWithIndex.map { case ((src, t), i) =>
        (i.toLong, src, t) }.toDF("doc_id", "source", "text")
      val got = graft.ext.Sampling.quotaSample(docs, "source", "doc_id",
          "text", quota)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      // the portable Rabin-Karp fold, replicated over code points
      def fp(s: String): Long =
        s.codePoints().toArray.foldLeft(0L)((a, c) => (a * 31 + c)
          % 1000000007L)
      val want = rows.zipWithIndex.groupBy(_._1._1).toSeq
        .flatMap { case (src, g) =>
          g.map { case ((_, t), i) => (i.toLong, fp(t)) }
            .sortBy { case (id, f) => (f, id) }.take(quota).zipWithIndex
            .map { case ((id, _), r) => (src, id, r + 1L) }
        }.toSet
      (got == want) :| s"got=$got want=$want"
    }

  // ----------------------------------------------------------- count-min
  property("count-min estimate is bounded below by the exact count") =
    Prop.forAll(Gen.nonEmptyListOf(genWord)) { words =>
      import spark.implicits._
      val docs = words.grouped(5).zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
        .toDF("doc_id", "text")
      val rows = graft.ext.FreqSketch.estimateTopK(docs, "text", k = 8)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      graft.ext.Dedup.unpersistAll()
      val exact = words.groupBy(identity).view.mapValues(_.size.toLong)
      Prop.all(
        (rows.nonEmpty && rows.forall { case (_, ex, est) => est >= ex })
          :| s"count-min underestimated: ${rows.mkString(",")}",
        rows.map { case (t, ex, _) =>
          (exact.getOrElse(t, -1L) == ex) :| s"exact count drift for '$t'"
        }.reduce(_ && _))
    }
}
