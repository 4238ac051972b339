package graft.ext

import graft.functions.VectorFunctions.array_dot
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over `ArrayType(FloatType)` columns
  * (embeddings.embedding, TESTDATA.md) — brute-force cosine top-k as the
  * exact baseline, coarse-quantized (IVF-style) and hyperplane-LSH variants
  * as the scale paths.
  *
  * All vector math goes through [[graft.functions.ArrayDot]] — a custom
  * codegen'd Catalyst expression (a tight primitive loop inside
  * WholeStageCodegen). The previous `zip_with`+`aggregate` formulation was
  * interpreted per element and dominated the whole benchmark on pairwise
  * workloads (BENCH_r02: sim_neardup 68 s). Values are bit-identical:
  * sequential left-fold, each element widened to double before multiply —
  * the same arithmetic as DuckDB's `list_dot_product` over `DOUBLE[]`.
  *
  * Scale notes: brute-force top-k is a single scan + TakeOrderedAndProject —
  * O(n·d) work, no shuffle of the vectors themselves, and the right answer
  * for one-off queries even at 100 TB (it parallelizes perfectly). The IVF
  * path cuts the scan to nprobe/nlist of the data for repeated queries; the
  * LSH path buckets near-dup pair search the same way MinHash does for text.
  * Pairwise variants precompute per-row norms BEFORE the join so each
  * candidate pair costs exactly one dot product, not three.
  */
object Similarity {

  /** Element-wise cast to double — only needed where a downstream operator
    * (posexplode/avg) consumes elements, not for [[dot]]/[[cosine]], which
    * widen internally. */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Codegen'd dot product — accepts array<float> and/or array<double>. */
  def dot(a: Column, b: Column): Column = array_dot(a, b)

  def norm(v: Column): Column = sqrt(array_dot(v, v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k against one query vector. One scan, no
    * shuffle: orderBy+limit plans as TakeOrderedAndProject. Deterministic:
    * rounded similarity desc, then id — ties cannot reorder across engines. */
  def topK(df: DataFrame, idCol: String, vecCol: String,
           query: Seq[Double], k: Int): DataFrame =
    df.select(col(idCol),
        round(cosine(col(vecCol), typedLit(query)), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)

  /** Top-k per group (e.g. per label): window row_number, same tiebreak. */
  def topKPerGroup(df: DataFrame, idCol: String, vecCol: String,
                   groupCol: String, query: Seq[Double], k: Int): DataFrame = {
    val scored = df.select(col(groupCol), col(idCol),
      round(cosine(col(vecCol), typedLit(query)), 4).as("sim"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("sim").desc, col(idCol))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** Exact cosine near-dup pairs (all-pairs — O(n²), a VERIFICATION
    * baseline for bounded subsets; the scale path is [[lshCosinePairs]]).
    *
    * `maxRows` is a hard input cap (default 50k ≈ 1.25e9 pairs, the edge of
    * single-job sanity): all-pairs cosine at 100× the rows is 10,000× the
    * pairs, so an unbounded call is never what a production pipeline wants —
    * it fails loudly with the row count and the scale alternative instead
    * of quietly planning a broadcast-NL join over the full table. Pass
    * `maxRows = 0` only from tests that knowingly bound the input
    * themselves. The cap costs one `count()` — with aggregate pushdown on
    * an unfiltered parquet scan that is a footer read, not a data scan.
    *
    * Norms are computed ONCE per row before the pair join: per pair the work
    * is one codegen'd dot + one divide, and the vectors shuffle as raw
    * floats (half the bytes of a pre-cast double array). */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, maxRows: Long = 50000L): DataFrame = {
    if (maxRows > 0) {
      val n = df.count()
      if (n > maxRows)
        throw new IllegalStateException(
          s"nearDupPairs input has $n rows (> cap $maxRows): all-pairs " +
            s"cosine is O(n²) — ${n * n / 2} pairs. Use lshCosinePairs " +
            "(bucketed, near-linear) for unbounded inputs, or raise the " +
            "cap explicitly for a bounded verification subset.")
    }
    val v = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("v"), norm(col(vecCol)).as("nrm"))
    val a = v.alias("a")
    val b = v.alias("b")
    a.join(b, col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(array_dot(col("a.v"), col("b.v")) /
          (col("a.nrm") * col("b.nrm")), 4).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Batched k-NN join: top-k neighbors for EVERY query in a query batch
    * at once — the retrieval shape of RAG and eval pipelines. The query
    * side is broadcast (a query batch is bounded by construction, not a
    * table); each candidate partition scores against all queries locally,
    * so the candidate table never shuffles for the scoring itself, and
    * WindowGroupLimit prunes to k per query before the one shuffle on the
    * query id. Work is O(|queries|·n·d) exact brute force — the baseline
    * that parallelizes perfectly; swap the candidate side for an
    * IVF-probed subset ([[ivfTopK]]/[[IvfIndex]]) for large repeated
    * batches. Norms are computed once per side before the join. */
  def knnJoin(candidates: DataFrame, queries: DataFrame,
              candIdCol: String, candVecCol: String,
              qIdCol: String, qVecCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    // ids are narrowed with cast('long'); a non-numeric id column would
    // silently null every id, so reject it here instead
    Seq(candidates.schema(candIdCol), queries.schema(qIdCol)).foreach(f =>
      require(f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"id column ${f.name} must be numeric, found ${f.dataType}"))
    val c = candidates.select(col(candIdCol).cast("long").as("cand_id"),
      col(candVecCol).as("__cv"), norm(col(candVecCol)).as("__cn"))
    val q = queries.select(col(qIdCol).cast("long").as("query_id"),
      col(qVecCol).as("__qv"), norm(col(qVecCol)).as("__qn"))
    c.crossJoin(broadcast(q))
      .select(col("query_id"), col("cand_id"),
        round(array_dot(col("__cv"), col("__qv")) /
          (col("__cn") * col("__qn")), 4).as("sim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col("cand_id"))).cast("long"))
      .filter(col("rn") <= k)
  }

  /** Deterministic pseudo-random unit-ish hyperplanes (seeded, reproducible
    * across executors — the planes are literals in the plan). */
  private[graft] def hyperplanes(numPlanes: Int, dim: Int,
                                 seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Random-hyperplane (SimHash-for-vectors) near-dup pairs: bucket on the
    * sign-bit key, all-pairs only WITHIN buckets, exact-cosine verify.
    * P[same bucket] = (1 - θ/π)^numPlanes for angle θ — candidates stay
    * near-linear while recall at high cosine stays high. */
  def lshCosinePairs(df: DataFrame, idCol: String, vecCol: String,
                     dim: Int, threshold: Double,
                     numPlanes: Int = 8, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(numPlanes, dim, seed)
    val v = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("v"), norm(col(vecCol)).as("nrm"))
    val key = planes.zipWithIndex.map { case (p, i) =>
      when(array_dot(col("v"), typedLit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
    val bucketed = v.withColumn("bucket", key)
    val a = bucketed.alias("a")
    val b = bucketed.alias("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(array_dot(col("a.v"), col("b.v")) /
          (col("a.nrm") * col("b.nrm")), 4).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Symmetric per-vector int8 quantization — the 4× compression step a
    * billion-vector ANN index takes before anything else: scale = the
    * vector's max |component|, qᵢ = floor(vᵢ/scale·127 + 0.5) ∈ [−127,127]
    * (an all-zero vector quantizes to zeros). Entirely row-local IEEE
    * arithmetic in a fixed operation order, so any engine reproduces every
    * code exactly; emitted as exploded (id, pos, q) scalars for the same
    * oracle-comparability reason as [[centroidComponents]]. */
  /** Product-quantization encode: split each vector into `numSub` equal
    * subspaces, build a per-subspace codebook, emit each vector as
    * `numSub` small codes plus its quantization error — the memory-side
    * half of IVF-PQ, collapsing d floats to numSub bytes so a 100 TB
    * embedding store's candidate lists fit in RAM.
    *
    * Codebook entries are the per-label portable-quantized means of each
    * subspace slice (the same honest stand-in for k-means as [[ivfTopK]]'s
    * label cells, and the same 1e-10 long-quantized mean every centroid
    * oracle replays). Distances use the expanded form
    * ‖a‖² − 2a·c + ‖c‖² — three codegen'd dots in a fixed literal order,
    * rounded before the argmin, ties broken by code id — so the assigned
    * codes are engine-portable, not ulp-lottery.
    *
    * Shape: the codebook is (numSub · |labels|) rows — broadcast-sized by
    * construction — so encoding is one broadcast join over the exploded
    * subvectors and a WindowGroupLimit-pruned argmin; the vectors
    * themselves never shuffle. */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
               groupCol: String, numSub: Int): DataFrame =
    pqEncodeKeepCell(df, idCol, vecCol, groupCol, numSub).drop("cell")

  /** [[pqEncode]] retaining each row's own coarse cell (`groupCol`) as a
    * `cell` column — what [[graft.ext.IvfIndex.buildPq]] partitions the
    * persisted code table by, so probe-time scans prune to nprobe cells.
    * `codebookOpt` lets a caller that already materialized the codebook
    * (the index build persists it anyway) skip recomputing it. */
  private[graft] def pqEncodeKeepCell(df: DataFrame, idCol: String,
                                      vecCol: String, groupCol: String,
                                      numSub: Int,
                                      codebookOpt: Option[DataFrame] = None)
      : DataFrame = {
    val subs = pqSubvectors(df, Seq(col(idCol), col(groupCol)), vecCol, numSub)
    val cb = codebookOpt.getOrElse(pqCodebook(df, vecCol, groupCol, numSub))
    val scored = subs.join(broadcast(cb), Seq("sub"))
      .select(col(idCol), col(groupCol).as("cell"), col("sub"), col("lbl"),
        round(dot(col("sv"), col("sv")) - lit(2.0) * dot(col("sv"), col("cent"))
          + dot(col("cent"), col("cent")), 6).as("d2"))
    // argmin as a partial-aggregable min(struct(d2, lbl)) — same
    // (distance, then code id) order a windowed row_number would sort by,
    // but map-side combinable and sort-free
    scored.groupBy(col(idCol), col("cell"), col("sub"))
      .agg(min(struct(col("d2").as("d2"), col("lbl").as("lbl"))).as("__m"))
      .select(col(idCol), col("cell"), col("sub").cast("long").as("sub"),
        col("__m.lbl").as("code"), col("__m.d2").as("d2"))
  }

  /** (keep-cols, sub, sv): each vector exploded into its `numSub`
    * subspace slices. */
  private def pqSubvectors(df: DataFrame, keep: Seq[Column], vecCol: String,
                           numSub: Int): DataFrame = {
    // one-row dimension probe (array width is data, not schema) — a
    // limit-1 scan, same class of metadata hop as [[ivfTopK]]'s probes
    val dims = df.select(size(col(vecCol)).as("d")).head().getInt(0)
    require(numSub > 0 && dims % numSub == 0,
      s"numSub=$numSub must divide the dimension $dims")
    val width = dims / numSub
    df.select(keep :+
      posexplode(transform(sequence(lit(0), lit(numSub - 1)),
        i => slice(asDouble(col(vecCol)), i * width + 1, lit(width))))
        .as(Seq("sub", "sv")): _*)
  }

  /** The per-subspace codebook behind [[pqEncode]]/[[pqTopK]]:
    * (sub, lbl, cent) with the portable 1e-10 quantized-mean centroid of
    * each label's slice — numSub·|labels| rows, broadcast-sized. */
  def pqCodebook(df: DataFrame, vecCol: String, groupCol: String,
                 numSub: Int): DataFrame =
    pqSubvectors(df, Seq(col(groupCol)), vecCol, numSub)
      .select(col("sub"), col(groupCol).as("lbl"),
        posexplode(col("sv")).as(Seq("pos", "x")))
      .groupBy(col("sub"), col("lbl"), col("pos"))
      .agg((sum(floor(col("x") * lit(1e10) + lit(0.5)).cast("long"))
        .cast("double") / count(lit(1)) / lit(1e10)).as("x"))
      .groupBy(col("sub"), col("lbl"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("x")))),
        s => s.getField("x")).as("cent"))

  /** Asymmetric-distance top-k over PQ codes — the query half of IVF-PQ:
    * vectors are scored from their `numSub` codes and the codebook ALONE
    * (the d-float embeddings are never touched at query time, which is
    * the entire point of PQ at 100 TB). Approximate cosine =
    * Σ q_s·c_s / (√(Σ ‖c_s‖²) · ‖q‖); the per-id component sums fold in
    * fixed `sub` order over a sorted collected array (a `sum(double)`
    * would be partition-order-dependent in the last ulp and could flip
    * the 1e-4 rounding — the same reason every centroid here quantizes).
    * Cost: the codes frame joins one broadcast lookup of
    * numSub·|labels| precomputed scalars, one groupBy on the id, one
    * TakeOrderedAndProject. */
  def pqTopK(df: DataFrame, idCol: String, vecCol: String, groupCol: String,
             numSub: Int, query: Seq[Double], k: Int): DataFrame = {
    val codes = pqEncode(df, idCol, vecCol, groupCol, numSub)
    val lut = pqQueryLut(pqCodebook(df, vecCol, groupCol, numSub), query,
      query.size / numSub)
    adcTopK(codes, lut, idCol, query, k)
  }

  /** The query-time half of the ADC lookup table: per (sub, lbl), the
    * query-subvector dot and the squared codeword norm — numSub·|labels|
    * broadcast scalars. The dots are the engine's own codegen'd
    * [[dot]], not Scala's `Seq#sum`: ArrayDot's fold order is the one
    * DuckDB's `list_dot_product` replays. */
  private[graft] def pqQueryLut(codebook: DataFrame, query: Seq[Double],
                                width: Int): DataFrame = {
    import codebook.sparkSession.implicits._
    val qdf = query.grouped(width).zipWithIndex
      .map { case (qs, i) => (i, qs) }.toSeq.toDF("sub", "qsub")
    codebook.join(broadcast(qdf), Seq("sub"))
      .select(col("sub").cast("long").as("sub"), col("lbl"),
        dot(col("cent"), col("qsub")).as("qd"),
        dot(col("cent"), col("cent")).as("cn"))
  }

  /** Asymmetric-distance top-k from a codes frame and a query LUT — the
    * shared scoring tail of [[pqTopK]] and [[graft.ext.IvfIndex.topKPq]]:
    * one broadcast lookup join, per-id folds in fixed `sub` order (a
    * `sum(double)` would be partition-order-dependent in the last ulp and
    * could flip the 1e-4 rounding), one TakeOrderedAndProject. */
  private[graft] def adcTopK(codes: DataFrame, lut: DataFrame, idCol: String,
                             query: Seq[Double], k: Int): DataFrame = {
    val qnorm = sqrt(dot(typedLit(query), typedLit(query)))
    val fold = (arr: Column) => aggregate(arr, lit(0.0), (a, x) => a + x)
    codes.join(broadcast(lut),
        codes("sub") === lut("sub") && codes("code") === lut("lbl"))
      .groupBy(col(idCol))
      .agg(
        fold(transform(array_sort(collect_list(struct(codes("sub"), col("qd")))),
          s => s.getField("qd"))).as("dotsum"),
        fold(transform(array_sort(collect_list(struct(codes("sub"), col("cn")))),
          s => s.getField("cn"))).as("norm2"))
      .select(col(idCol),
        round(col("dotsum") / (sqrt(col("norm2")) * qnorm), 4)
          .as("sim_pq"))
      .orderBy(col("sim_pq").desc, col(idCol))
      .limit(k)
  }

  /** Unit-L2 normalization, emitted as exploded (id, pos, u) scalars —
    * the retrieval-prep step that turns cosine into plain dot product.
    * Exploded rows rather than an array column for the same reason as
    * [[centroidComponents]]: scalars are what an external oracle can
    * hash-compare. Row-local arithmetic riding the scan (the codegen'd
    * [[dot]] for the norm, one division per element).
    *
    * `u` is the component quantized to 1e-4 units as a LONG —
    * `floor(x/‖v‖ · 1e4 + 0.5)` — the same plain-IEEE recipe as
    * [[quantizeInt8]] / [[pqEncode]], bit-identical in any engine.
    * Spark's `round` on doubles goes through BigDecimal HALF_UP and
    * collapses `-0.0`, which diverges from other engines on
    * representation-boundary ties; an integer quantity cannot. Divide by
    * 1e4 to recover the unit component. Zero-vector rows emit 0
    * components instead of NaN-poisoning downstream math. */
  def normalizeUnit(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val n = norm(col(vecCol))
    df.select(col(idCol), n.as("__n"),
        posexplode(asDouble(col(vecCol))).as(Seq("pos", "x")))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        when(col("__n") === 0d, lit(0L))
          .otherwise(floor(col("x") / col("__n") * 1e4 + 0.5d).cast("long"))
          .as("u"))
  }

  /** SemDeDup-shape semantic deduplication: inside each cluster
    * (`groupCol` — the same honest k-means stand-in as [[ivfTopK]]'s
    * cells and [[pqCodebook]]'s labels), a row is a semantic duplicate
    * when some LOWER-id member of its cluster has cosine ≥ `threshold`;
    * the survivors are everything else. The cluster-local pair search is
    * the entire point of the SemDeDup recipe (Abbas et al.,
    * arXiv:2303.09540): dedup work is Σ|cluster|², bounded by clustering
    * granularity — at 100 TB you size |clusters| ∝ √N precisely so this
    * stays near-linear — never corpus-global all-pairs.
    *
    * The drop rule compares against every lower id, not only surviving
    * ones: one pass, no iterative dependency, deterministic on any
    * engine, and the usual production simplification of the paper's
    * keep-one-representative rule.
    *
    * Plan shape: norms are computed once per row before the join; the
    * self-join keys on the cluster id (hash equi-join — pairs never
    * cross clusters); survivors come from one anti-join on the distinct
    * dropped-id set. `maxClusterRows` rejects a degenerate clustering
    * loudly (one metadata-sized agg) instead of quietly planning a
    * quadratic blow-up — the same contract as [[nearDupPairs]]'s cap. */
  def semDedupSurvivors(df: DataFrame, idCol: String, vecCol: String,
                        groupCol: String, threshold: Double,
                        maxClusterRows: Long = 100000L): DataFrame = {
    if (maxClusterRows > 0) {
      val top = df.groupBy(col(groupCol)).count().agg(max("count")).head()
      val biggest = if (top.isNullAt(0)) 0L else top.getLong(0)
      if (biggest > maxClusterRows)
        throw new IllegalStateException(
          s"semDedupSurvivors: largest cluster has $biggest rows (> cap " +
            s"$maxClusterRows) — within-cluster pair search is O(|c|²). " +
            "Refine the clustering (more cells) or raise the cap " +
            "explicitly for a bounded corpus.")
    }
    val v = df.select(col(idCol).cast("long").as("__id"),
      col(groupCol).as("__grp"), col(vecCol).as("__v"),
      norm(col(vecCol)).as("__nrm"))
    val a = v.alias("a")
    val b = v.alias("b")
    // Zero-norm guard: 0/0 is NaN, and Spark orders NaN ABOVE every
    // double, so an unguarded `__sim >= threshold` would be true against
    // a zero vector and wrongly drop every higher-id member of its
    // cluster. Define cosine-vs-zero-vector as 0 (no direction, never a
    // duplicate), matching [[normalizeUnit]]'s zero-vector contract.
    val dropped = a.join(b,
        col("a.__grp") === col("b.__grp") && col("a.__id") < col("b.__id"))
      .select(col("b.__id").as("__dropped"),
        when(col("a.__nrm") === 0d || col("b.__nrm") === 0d, lit(0d))
          .otherwise(round(array_dot(col("a.__v"), col("b.__v")) /
            (col("a.__nrm") * col("b.__nrm")), 4)).as("__sim"))
      .filter(col("__sim") >= threshold)
      .select(col("__dropped")).distinct()
    df.join(dropped, col(idCol).cast("long") === col("__dropped"), "left_anti")
  }

  /** Johnson–Lindenstrauss random projection to `outDim` dimensions with
    * an Achlioptas ±1 sign matrix — the dimensionality-reduction step a
    * 100 TB retrieval pipeline runs before ANN (shorter vectors: smaller
    * index, cheaper dots) with distance distortion bounded by the JL
    * lemma. y_j = Σ_i sign(i,j)·x_i / √outDim.
    *
    * The "random" matrix is DERIVED, not sampled: sign(i,j) comes from a
    * small integer hash of (i, j) — multiply-mod-prime mixing with every
    * intermediate bounded far under 2⁶³ — so any engine regenerates the
    * identical matrix from the formula alone (no seed state, no stored
    * matrix, certifiable like every sketch here). Entirely row-local
    * arithmetic riding the scan: the fold over input positions is an
    * in-order IEEE sum (matching `list_reduce`), quantized to 1e-4 longs
    * like [[normalizeUnit]]. Zero shuffles, zero driver hops.
    *
    * The dim×outDim kernel is the codegen'd
    * [[graft.functions.JlProject]] Expression (bit-identical to the
    * interpreted `transform`×`aggregate` HOF nest it replaced — same
    * hash, same per-j in-order fold — but a primitive loop inside
    * whole-stage codegen instead of ~dim×outDim interpreted closure
    * calls per row; the [[graft.functions.ArrayDot]] precedent).
    *
    * Output: (id, j ∈ [0, outDim), y) exploded scalars. */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
                    outDim: Int = 16): DataFrame = {
    require(outDim > 0, s"outDim must be positive, got $outDim")
    val proj = graft.functions.VectorFunctions.jl_project(col(vecCol), outDim)
    df.select(col(idCol), posexplode(proj).as(Seq("j", "__y")))
      .select(col(idCol), col("j").cast("long").as("j"),
        floor(col("__y") / sqrt(lit(outDim.toDouble)) * 1e4 + 0.5)
          .cast("long").as("y"))
  }

  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = asDouble(col(vecCol))
    val scale = array_max(transform(v, x => abs(x)))
    df.select(col(idCol), scale.as("__s"),
        posexplode(v).as(Seq("pos", "x")))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        when(col("__s") === 0d, lit(0L))
          .otherwise(floor(col("x") / col("__s") * 127d + 0.5d).cast("long"))
          .as("q"))
  }

  /** Per-group centroids via posexplode → (group, position) mean → array
    * reassembly. Fully distributed — no vector ever crosses the driver.
    *
    * The mean is NOT `avg(double)` (summation order varies with
    * partitioning, so a double sum is not reproducible across runs or
    * engines) — see [[centroidComponents]] for the portable long-quantized
    * accumulation both this and every oracle use. */
  def centroids(df: DataFrame, vecCol: String, groupCol: String): DataFrame =
    centroidComponents(df, vecCol, groupCol)
      .groupBy("grp")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("x")))),
        s => s.getField("x")).as("centroid"))

  /** The (group, position) → mean rows [[centroids]] assembles — exposed
    * directly because exploded scalars are what an external oracle can
    * hash-compare (array columns stringify differently across readers).
    * One shuffle on (group, position) with map-side partial aggregation;
    * cardinality is |groups| × dim regardless of row count.
    *
    * Quantization is `floor(x·1e10 + 0.5)` into a long — plain IEEE double
    * ops, bit-identical in any engine — then an exact order-independent
    * integer sum. NOT a double→decimal cast: engines disagree on boundary
    * values there (Spark rounds the shortest decimal representation,
    * DuckDB the exact binary value — observed one mismatched component in
    * 640 at sf0.01). Long sum bound: |x|≤1 ⇒ ~1e10 per element, overflow
    * needs ~9·10⁸ rows per (group, pos); past that, widen to decimal. */
  def centroidComponents(df: DataFrame, vecCol: String,
                         groupCol: String): DataFrame =
    df.select(col(groupCol).as("grp"),
        posexplode(asDouble(col(vecCol))).as(Seq("pos", "x")))
      .groupBy("grp", "pos")
      .agg((sum(floor(col("x") * lit(1e10) + lit(0.5)).cast("long"))
        .cast("double") / count(lit(1)) / lit(1e10)).as("x"))

  /** IVF-style top-k: coarse-quantize by a cell column — either an
    * existing partition key or a LEARNED one ([[KMeans.assigned]], which
    * is what the engine's certified queries use) — probe the `nprobe`
    * nearest centroids, brute-force only inside those cells.
    * Only the tiny centroid table (nlist rows) is collected to pick probes —
    * the data-sized scan stays distributed and shrinks by nprobe/nlist.
    *
    * Centroids are recomputed on EVERY call — correct, but wasteful for
    * repeated queries; [[graft.ext.IvfIndex]] is the build-once/query-many
    * persisted dual (centroid table + cell-partitioned data on disk). */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, groupCol: String,
              query: Seq[Double], k: Int, nprobe: Int): DataFrame = {
    val cents = centroids(df, vecCol, groupCol)
      .select(col("grp"),
        round(cosine(col("centroid"), typedLit(query)), 4).as("csim"))
      .orderBy(col("csim").desc, col("grp"))
      .limit(nprobe)
    val probes = cents.collect().map(_.get(0)).toIndexedSeq // nlist rows — metadata-sized
    topK(df.filter(col(groupCol).isin(probes: _*)), idCol, vecCol, query, k)
  }
}
