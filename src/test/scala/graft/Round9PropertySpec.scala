package graft

import graft.ext.Similarity
import graft.sources.Compaction
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** Properties for the round-9 certification fixes, each checked against
  * an independent in-memory Scala oracle on random inputs:
  *  - normalizeUnit equals the exact IEEE recipe floor(x/‖v‖·1e4 + 0.5)
  *    (same in-order double accumulation for the norm), so the quantized
  *    components reconstruct a unit vector within quantization error and
  *    zero vectors emit all-zero components;
  *  - Compaction.plan groups are contiguous runs in path order whose
  *    bytes minus the (possibly overshooting) last file stay under the
  *    target — greedy first-fit never splits a file and never underfills
  *    a closed group boundary. */
object Round9PropertySpec extends Properties("round9") {

  private lazy val spark = TestSpark.spark

  // --------------------------------------------------------- normalizeUnit
  private val genVecs: Gen[List[List[Float]]] = for {
    n <- Gen.choose(1, 8)
    vs <- Gen.listOfN(n, for {
      d <- Gen.choose(1, 8)
      xs <- Gen.listOfN(d, Gen.oneOf(
        Gen.const(0.0f),
        Gen.choose(-100.0f, 100.0f),
        Gen.choose(-1e-4f, 1e-4f))) // tiny components: the -0.0 trap zone
    } yield xs)
  } yield vs

  /** The engine's norm is the codegen'd array_dot: in-order double
    * accumulation over the widened components, then sqrt. */
  private def l2(xs: List[Float]): Double =
    math.sqrt(xs.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))

  property("normalizeUnit = floor(x/norm*1e4+0.5); unit within quant err") =
    Prop.forAll(genVecs) { vs =>
      import spark.implicits._
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val got = Similarity.normalizeUnit(df, "vec_id", "embedding")
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
        .toMap
      val want = vs.zipWithIndex.flatMap { case (v, i) =>
        val n = l2(v)
        v.zipWithIndex.map { case (x, p) =>
          ((i.toLong, p.toLong),
            if (n == 0.0) 0L
            else math.floor(x.toDouble / n * 1e4 + 0.5).toLong)
        }
      }.toMap
      val exact = got == want
      val unit = vs.zipWithIndex.forall { case (v, i) =>
        val ss = v.indices.map(p => {
          val u = got((i.toLong, p.toLong)) / 1e4
          u * u
        }).sum
        if (l2(v) == 0.0) ss == 0.0
        // d components each off by ≤0.5e-4 → |Σu²−1| ≤ ~2·d·1e-4 + ε
        else math.abs(ss - 1.0) <= 2e-3
      }
      (exact && unit) :| s"got=$got want=$want"
    }

  // ------------------------------------------------- compaction fill bound
  private val genInv: Gen[(List[(String, String, Long)], Long)] = for {
    n <- Gen.choose(0, 30)
    rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf("p1", "p2", "p3"),
      Gen.choose(1L, 400L))) // files can exceed the 50-byte target
    t <- Gen.oneOf(50L, 120L, 1000L)
  } yield (rows.zipWithIndex.map { case ((p, b), i) =>
    (p, f"f$i%03d", b) }, t)

  property("compaction: contiguous groups, closed fill < target, no split") =
    Prop.forAll(genInv) { case (rows, target) =>
      import spark.implicits._
      val df = rows.toDF("part", "path", "bytes")
      val planned = Compaction.plan(df, "part", "path", "bytes", target)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3)))
      // every input file appears exactly once — a plan never splits/drops
      val oneRowPerFile =
        planned.map(r => (r._1, r._2)).toSet == rows.map(r => (r._1, r._2)).toSet &&
        planned.length == rows.size
      val perDir = planned.groupBy(_._1).values.forall { fs =>
        val inOrder = fs.sortBy(_._2)
        // group ids never decrease as we walk files in path order
        val monotone = inOrder.map(_._4).sliding(2).forall {
          case Array(a, b) => a <= b
          case _           => true
        }
        // a group's bytes minus its LAST file fit under target: only the
        // final file may overshoot the boundary (never-split trade)
        val fill = inOrder.groupBy(_._4).values.forall { g =>
          g.sortBy(_._2).dropRight(1).map(_._3).sum < target
        }
        monotone && fill
      }
      (oneRowPerFile && perDir) :| s"t=$target planned=${planned.toList}"
    }

  // ------------------------------------------------------ z-order layout
  /** Independent bit-at-a-time Morton model. */
  private def morton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  private val genPts: Gen[(List[(Long, Long)], Int)] = for {
    bits <- Gen.choose(1, 16)
    n <- Gen.choose(1, 40)
    pts <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, (1L << bits) - 1),
      Gen.choose(0L, (1L << bits) - 1)))
  } yield (pts, bits)

  property("zValue = independent Morton model; same tile bounds both dims") =
    Prop.forAll(genPts) { case (pts, bits) =>
      import spark.implicits._
      val df = pts.toDF("x", "y")
      val got = df.select(org.apache.spark.sql.functions.col("x"),
          org.apache.spark.sql.functions.col("y"),
          graft.sources.Layout.zValue(
            org.apache.spark.sql.functions.col("x"),
            org.apache.spark.sql.functions.col("y"), bits).as("z"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val model = got.forall { case (x, y, z) => z == morton(x, y, bits) }
      // dropping 2k low z-bits (one tile) pins x>>k and y>>k: two points
      // in the same tile agree on both high parts — the pruning property
      val k = bits / 2
      val tiles = got.groupBy(_._3 >> (2 * k))
      val bounded = k == 0 || tiles.values.forall { g =>
        g.map(_._1 >> k).distinct.length == 1 &&
          g.map(_._2 >> k).distinct.length == 1
      }
      (model && bounded) :| s"bits=$bits got=${got.toList}"
    }

  // ------------------------------------------------- line dedup vs oracle
  private val genCorpus: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 12)
    docs <- Gen.listOfN(n, for {
      k <- Gen.choose(1, 5)
      ls <- Gen.listOfN(k, Gen.oneOf(
        "shared footer", "nav bar", "cookie banner",
        "alpha", "beta", "gamma", "delta", "epsilon"))
    } yield ls.mkString("\n"))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("lineDedup = per-line distinct-doc-count oracle, order kept") =
    Prop.forAll(genCorpus) { docs =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text")
      val got = graft.ext.TextStats.lineDedup(df, "doc_id", "text", 2)
        .collect()
        .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3))))
        .toMap
      val docsPerLine = docs.flatMap { case (id, t) =>
        t.split("\n", -1).distinct.map(l => (l, id))
      }.groupBy(_._1).map { case (l, xs) => (l, xs.size) }
      val want = docs.map { case (id, t) =>
        val ls = t.split("\n", -1)
        val kept = ls.filter(l => docsPerLine(l) < 2)
        (id, (kept.mkString("\n"), kept.length.toLong,
          (ls.length - kept.length).toLong))
      }.toMap
      (got == want) :| s"got=$got want=$want"
    }

  // ------------------------------------------------ winnowing vs oracle
  /** Independent replay of GramPolyOps + the sliding value-min. */
  private def polyGram(tokens: Seq[String]): Long = {
    val s = tokens.mkString(" ")
    var h1 = 0L
    var h2 = 0L
    var j = 0
    while (j < s.length) {
      val cp = s.codePointAt(j)
      h1 = (h1 * 31 + cp) % 2147483647L
      h2 = (h2 * 131 + cp) % 2147483629L
      j += Character.charCount(cp)
    }
    h1 * 2147483648L + h2
  }

  private def winnowModel(text: String, k: Int, w: Int): Set[Long] = {
    val ts = text.split(" ").filter(_.nonEmpty).toSeq
    if (ts.isEmpty) Set.empty
    else {
      val kk = math.min(k, ts.length)
      val grams = ts.sliding(kk).map(polyGram).toVector
      (0 to math.max(grams.length - w, 0))
        .map(i => grams.slice(i, i + w).min).toSet
    }
  }

  private val genWinnow: Gen[(List[String], Int, Int)] = for {
    k <- Gen.choose(1, 5)
    w <- Gen.choose(1, 6)
    n <- Gen.choose(1, 10)
    docs <- Gen.listOfN(n, for {
      t <- Gen.choose(0, 25)
      ws <- Gen.listOfN(t, Gen.oneOf(
        "aa", "bb", "cc", "dd", "ee", "ff", "gg"))
    } yield ws.mkString(" "))
  } yield (docs, k, w)

  property("winnowFingerprints = independent gram-hash sliding-min model") =
    Prop.forAll(genWinnow) { case (docs, k, w) =>
      import spark.implicits._
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.ext.TextStats
        .winnowFingerprints(df, "doc_id", "text", k, w)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (id, xs) => (id, xs.map(_._2).toSet) }
      val want = docs.zipWithIndex
        .map { case (t, i) => (i.toLong, winnowModel(t, k, w)) }
        .filter(_._2.nonEmpty).toMap
      (got == want) :| s"k=$k w=$w got=$got want=$want"
    }

  // ----------------------------------------------- integer pagerank
  /** Independent per-edge replay of Components.pageRank's arithmetic:
    * contribution divisions happen per EDGE ROW (then sum), exactly as
    * the engine's projection does. */
  private def prModel(edges: Seq[(String, String, Long)],
                      iters: Int): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size
    val outw = edges.groupBy(_._1).map { case (s, es) =>
      (s, es.map(_._3).sum) }
    var pr = nodes.map(v => v -> 1000000000L / n).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _, w) =>
          pr(s) * 85L * w / (100L * outw(s)) }.sum }
      pr = nodes.map(v =>
        v -> (15L * 1000000000L / (100L * n) +
          contrib.getOrElse(v, 0L))).toMap
    }
    pr
  }

  private val genGraph: Gen[(List[(String, String, Long)], Int)] = for {
    iters <- Gen.choose(1, 4)
    m <- Gen.choose(1, 12)
    edges <- Gen.listOfN(m, for {
      s <- Gen.oneOf("a", "b", "c", "d", "e")
      d <- Gen.oneOf("a", "b", "c", "d", "e")
      w <- Gen.choose(1L, 20L)
    } yield (s, d, w))
  } yield (edges, iters)

  property("pageRank = independent integer power-iteration model") =
    Prop.forAll(genGraph) { case (edges, iters) =>
      import spark.implicits._
      val got = graft.ext.Components.pageRank(
          edges.toDF("src", "dst", "w"), "src", "dst", "w", iters)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val want = prModel(edges, iters)
      (got == want) :| s"iters=$iters edges=$edges got=$got want=$want"
    }

  property("winnowing guarantee: w+k-1 shared tokens ⇒ shared fingerprint") =
    Prop.forAll(for {
      k <- Gen.choose(2, 4)
      w <- Gen.choose(2, 5)
      runLen = w + k - 1
      run <- Gen.listOfN(runLen, Gen.identifier.map(_.take(4)))
      pre <- Gen.listOfN(6, Gen.identifier.map(_.take(3)))
      post <- Gen.listOfN(6, Gen.identifier.map(_.take(3)))
    } yield (k, w, (pre ++ run).mkString(" "), (run ++ post).mkString(" "))) {
      case (k, w, d1, d2) =>
        val s1 = winnowModel(d1, k, w)
        val s2 = winnowModel(d2, k, w)
        (s1 & s2).nonEmpty :| s"k=$k w=$w d1=$d1 d2=$d2"
    }
}
