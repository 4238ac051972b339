package graft

import graft.compile.NlCompiler
import graft.exec.Executor
import graft.ext.{Dedup, Events, Multimodal, Similarity, TextStats}
import graft.ir.MongoJson
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import EntryHelpers._

/** Deduplication (exact through SimHash/winnow/cluster) and embedding similarity/ANN (brute force through IVF-PQ, k-means, JL).
  *
  * One of six per-domain registries merged by [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]] — pure relocation of the former monolithic
  * maps, no behavior change (27 entries incl. the round-12 fuzzy ER path). */
private[graft] object QueriesDedupSim {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_fingerprint" -> ((s: SparkSession, dir: String) =>
      Dedup.byFingerprint(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),
    // fuzzy entity resolution: dirty names (deterministic single-char
    // deletions of customer names) matched back to the clean side via
    // deletion-neighborhood blocking + exact levenshtein verify + argmin
    // (EntityResolution scaladoc). The oracle BRUTE-FORCES all pairs —
    // a green hash proves the blocking scheme loses no distance-1 match
    "er_resolve" -> ((s: SparkSession, dir: String) => {
      val cust = Tables.customer(s, dir)
      val p0 = (col("c_custkey") % length(col("c_name"))).cast("int")
      val dirty = cust.select(col("c_custkey").as("id"),
        when(col("c_custkey") % 3 === 0, col("c_name"))
          .otherwise(concat(col("c_name").substr(lit(1), p0),
            col("c_name").substr(p0 + 2, lit(Int.MaxValue))))
          .as("name"))
      graft.ext.EntityResolution.resolve(dirty, "id", "name",
          cust.select(col("c_custkey"), col("c_name")),
          "c_custkey", "c_name")
        .orderBy("id")
    }),
    // the DISTANCE-2 scheme through the staged cascade (EntityResolution
    // scaladoc): the d=1 stage resolves the 2/3 of rows within one edit,
    // only the residue pays deletionNeighborhood2's len²/2 fan-out,
    // with the measured pair-budget guard engaged (and not tripped)
    // before every stage's join. The brute-force all-pairs oracle at
    // lev <= 2 proves the cascade loses no match. The DECLARED fixture
    // is the c_custkey % 4 = 0 quarter of customers on BOTH sides
    // (every mutation class still present — classes key on % 3): the
    // cascade/budget logic is already property-tested at scale in
    // EntityResolutionSpec, and certifying the brute-force oracle does
    // not need the full quadratic fixture in every bench run (r16
    // §next-round #7)
    "er_resolve2" -> ((s: SparkSession, dir: String) => {
      val cust = Tables.customer(s, dir)
        .filter(col("c_custkey") % 4 === 0)
      val p0 = (col("c_custkey") % length(col("c_name"))).cast("int")
      val d1 = concat(col("c_name").substr(lit(1), p0),
        col("c_name").substr(p0 + 2, lit(Int.MaxValue)))
      val p1 = ((col("c_custkey") * 7) % length(d1)).cast("int")
      val d2 = concat(d1.substr(lit(1), p1),
        d1.substr(p1 + 2, lit(Int.MaxValue)))
      val dirty = cust.select(col("c_custkey").as("id"),
        when(col("c_custkey") % 3 === 0, col("c_name"))
          .when(col("c_custkey") % 3 === 1, d1)
          .otherwise(d2).as("name"))
      graft.ext.EntityResolution.resolve(dirty, "id", "name",
          cust.select(col("c_custkey"), col("c_name")),
          "c_custkey", "c_name", maxDist = 2)
        .orderBy("id")
    }),
    // skew guard ON: the uncut exact operator measures the implied
    // candidate-pair count before launching the quadratic join and fails
    // loudly over budget (the df-cut dual below is the silent-safe variant)
    "dedup_jaccard" -> ((s: SparkSession, dir: String) =>
      Dedup.jaccardPairs(Tables.documents(s, dir), "doc_id", "text",
          n = 3, threshold = 0.5, maxCandidatePairs = 50000000L)
        .orderBy("id_a", "id_b")),
    // pairs -> CLUSTERS: connected components by distributed min-label
    // propagation over the banded-LSH pair graph, canonical rep = min id
    // (the oracle resolves the same graph with a recursive CTE)
    "dedup_clusters" -> ((s: SparkSession, dir: String) =>
      graft.ext.Components.connectedComponents(
          Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
              n = 3, bands = 64, rowsPerBand = 2, threshold = 0.5)
            .select(col("id_a").as("src"), col("id_b").as("dst")))
        .select(col("id").as("doc_id"), col("comp").as("cluster"))
        .orderBy("doc_id")),
    // the APPLY step: corpus minus non-canonical cluster members — the
    // deduplicated corpus itself (drop list broadcast; corpus unshuffled)
    "dedup_survivors" -> ((s: SparkSession, dir: String) => {
      val docs = Tables.documents(s, dir)
      graft.ext.Components.applyClusters(docs, "doc_id",
          graft.ext.Components.connectedComponents(
            Dedup.minhashLshPairs(docs, "doc_id", "text",
                n = 3, bands = 64, rowsPerBand = 2, threshold = 0.5)
              .select(col("id_a").as("src"), col("id_b").as("dst"))))
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id")
    }),
    // quality-aware APPLY: keep each cluster's LONGEST member (ties to
    // the smallest id), not the arbitrary min-id — Components
    // .applyClustersBest scaladoc: one packed-struct argmax pass
    "dedup_best" -> ((s: SparkSession, dir: String) => {
      val docs = Tables.documents(s, dir)
      graft.ext.Components.applyClustersBest(docs, "doc_id",
          graft.ext.Components.connectedComponents(
            Dedup.minhashLshPairs(docs, "doc_id", "text",
                n = 3, bands = 64, rowsPerBand = 2, threshold = 0.5)
              .select(col("id_a").as("src"), col("id_b").as("dst"))),
          "n_chars")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    }),
    "dedup_minhash" -> ((s: SparkSession, dir: String) =>
      Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
          n = 3, bands = 64, rowsPerBand = 2, threshold = 0.5)
        .orderBy("id_a", "id_b")),
    // df-cut variant: hot shingles (document frequency > 10) dropped BEFORE
    // sizing — the skew guard that makes shared-shingle blocking survive
    // stop-phrase-heavy corpora at scale
    "dedup_jaccard_pruned" -> ((s: SparkSession, dir: String) =>
      Dedup.jaccardPairs(Tables.documents(s, dir), "doc_id", "text",
          n = 3, threshold = 0.5, maxShingleDf = 10L)
        .orderBy("id_a", "id_b")),
    "dedup_simhash" -> ((s: SparkSession, dir: String) =>
      Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text",
          maxHamming = 3)
        .orderBy("id_a", "id_b")),
    // ----- §2.10 similarity search -----
    "sim_topk" -> ((s: SparkSession, dir: String) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.topK(emb, "vec_id", "embedding", queryVec(emb), k = 10)
    }),
    "sim_topk_grouped" -> ((s: SparkSession, dir: String) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.topKPerGroup(emb, "vec_id", "embedding", "label",
          queryVec(emb), k = 3)
        .orderBy("label", "rn")
    }),
    // hard 50k-row input cap (loud failure above it): this is the bounded
    // verification baseline — sim_lsh below is the unbounded-scale path.
    // Declared on the vec_id % 2 = 0 half (pairs /4): the all-pairs
    // arithmetic is what the oracle certifies, and the LSH/minhash
    // queries keep full-corpus coverage (r16 §next-round #7)
    "sim_neardup" -> ((s: SparkSession, dir: String) =>
      Similarity.nearDupPairs(
          Tables.embeddings(s, dir).filter(col("vec_id") % 2 === 0),
          "vec_id", "embedding", threshold = 0.4)
        .orderBy("id_a", "id_b")),
    // hyperplane-LSH near-dup pairs — the O(n²)-avoiding scale path; the
    // seeded planes are plan literals, embedded verbatim in the oracle SQL
    "sim_lsh" -> ((s: SparkSession, dir: String) =>
      Similarity.lshCosinePairs(Tables.embeddings(s, dir), "vec_id",
          "embedding", dim = 64, threshold = 0.4, numPlanes = 8, seed = 42L)
        .orderBy("id_a", "id_b")),
    // batched k-NN join: one broadcast query batch (vec_id < 5), top-3
    // neighbors each in a single candidate scan (Similarity scaladoc)
    "sim_knn" -> ((s: SparkSession, dir: String) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.knnJoin(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", "vec_id", "embedding", k = 3)
        .orderBy("query_id", "rn")
    }),
    // IVF-style probed top-k over a LEARNED coarse quantizer: 4 k-means
    // cells (3 Lloyd rounds, KMeans scaladoc has the portable-arithmetic
    // contract), only the two nearest cells are brute-forced
    "sim_ivf" -> ((s: SparkSession, dir: String) => {
      val emb = Tables.embeddings(s, dir)
      // serving path: the session-memoized trained quantizer assigns
      // cells (kmCentsFor scaladoc — identical result, training is
      // deterministic; emb_kmeans is the query that measures training)
      val cents = kmCentsFor(dir, emb)
      Similarity.ivfTopK(
        emb.withColumn("cell",
          graft.ext.KMeans.assignCell(col("embedding"), cents)),
        "vec_id", "embedding", "cell", queryVec(emb), k = 5, nprobe = 2)
    }),
    // the learned clustering surfaced as its own certified result: cell
    // sizes + id ranges of the distributed k-means assignment (KMeans
    // scaladoc has the portable-arithmetic contract; the oracle replays
    // ALL training rounds in SQL) — document/embedding clustering is a
    // first-class pipeline op (SemDeDup's stage 1), not only IVF plumbing
    "emb_kmeans" -> ((s: SparkSession, dir: String) => {
      val emb = Tables.embeddings(s, dir)
      graft.ext.KMeans.assigned(emb, "vec_id", "embedding",
          k = KmK, iters = KmIters)
        .groupBy(col("cell")).agg(count(lit(1)).as("n"),
          min(col("vec_id")).as("min_id"), max(col("vec_id")).as("max_id"))
        .select(col("cell").cast("long").as("cell"), col("n"),
          col("min_id"), col("max_id"))
        .orderBy("cell")
    }),
    // the PERSISTED IVF index with a LEARNED quantizer: k-means cells
    // trained at build time (vectors partitioned by learned cell +
    // centroid table on disk), then query via probe selection + a scan
    // that reads ONLY the probed cell partitions (partition pruning;
    // plan-asserted in IvfIndexSpec) — no centroid rebuild per query
    "sim_ivf_indexed" -> ((s: SparkSession, dir: String) => {
      val emb = Tables.embeddings(s, dir)
      val idx = ivfIndexFor(s, dir, emb)
      graft.ext.IvfIndex.topK(s, idx, "vec_id", "embedding",
        queryVec(emb), k = 5, nprobe = 2)
    }),
    // ----- incremental index maintenance (IvfIndex.append scaladoc:
    // the FAISS `add` contract — new vectors assigned by the FROZEN
    // build-time quantizer and appended to their cell partitions, no
    // retraining, nothing rewritten, one pass over only the new rows;
    // frozen quantizer ⇒ the post-append index EQUALS a from-scratch
    // build with these centroids, which is what the oracle replays) -----
    "sim_ivf_append" -> ((s: SparkSession, dir: String) => {
      val emb = Tables.embeddings(s, dir)
      val idx = ivfAppendIndexFor(s, dir, emb)
      graft.ext.IvfIndex.topK(s, idx, "vec_id", "embedding",
        queryVec(emb), k = 5, nprobe = 2)
    }),
    // ----- the COMPOSED IVF-PQ serving path (IvfIndex.topKPq scaladoc:
    // coarse quantizer prunes to nprobe cell partitions, ADC scores the
    // PQ codes inside them — embeddings unread — then the final k
    // rescore exactly against the pruned raw partitions only). The index
    // build is memoized per corpus dir WITHIN the session: IvfIndex is
    // the build-once/query-many persisted dual by contract, and an ANN
    // serving path amortizes its offline build over every query — so
    // repeated invocations (and the bench, which warms this entry like
    // the other heavy kernels) measure the QUERY, not a rebuild. The
    // result is identical either way: the build is deterministic. -----
    "sim_ivfpq" -> ((s: SparkSession, dir: String) => {
      val emb = Tables.embeddings(s, dir)
      val idx = ivfPqIndexFor(s, dir, emb)
      graft.ext.IvfIndex.topKPq(s, idx, "vec_id", queryVec(emb), k = 10,
        nprobe = 2, rescore = true)
    }),
    // ----- ANN RECALL CERTIFICATION: recall@10 of the probed IVF-PQ
    // index against the EXACT cosine top-10, swept across the whole
    // nprobe range (1, 2, 4-of-4 cells) — the TUNING CURVE an operator
    // reads to set nprobe, as exact integer counts so the oracle
    // replays it bit-for-bit. Partial probes measure coverage loss
    // (true neighbors living in unprobed cells); the FULL probe
    // isolates pure ADC ranking loss, and that point carries the
    // asserted floor — at nprobe=nlist a miss can only mean the PQ
    // quantization is mis-ranking, never a tuning choice. Both sides
    // are tiny id sets (k=10), so each intersection is one
    // metadata-sized join. -----
    "sim_recall" -> ((s: SparkSession, dir: String) => {
      val emb = Tables.embeddings(s, dir)
      // persisted: the exact top-10 is the comparison side of EVERY curve
      // point — one computation instead of one per probe (TrackedCache
      // lifecycle, released by the harness's per-query unpersistAll)
      val exact = graft.ext.TrackedCache.persistTracked(
        Similarity.topK(emb, "vec_id", "embedding",
          queryVec(emb), k = 10).select(col("vec_id")))
      // ONE action per index kind: the three nprobe probes union with an
      // np tag and the intersection sizes come back from a single grouped
      // count — same six numbers as one count() per point, 6 jobs → 2
      def curveOf(kind: String,
                  probe: Int => org.apache.spark.sql.DataFrame)
          : Seq[(String, Long, Long, Long, Long)] = {
        val hm = Seq(1, 2, 4).map(np =>
            probe(np).select(col("vec_id"), lit(np.toLong).as("np")))
          .reduce(_ unionByName _)
          .join(exact, Seq("vec_id"))
          .groupBy(col("np")).agg(count(lit(1)).as("h"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        Seq(1L, 2L, 4L).map { np =>
          val h = hm.getOrElse(np, 0L)
          (kind, np, 10L, h, h * 10L)
        }
      }
      // IVF (exact search within probed cells): recall loss can ONLY be
      // coverage — true neighbors in unprobed cells — so the full probe
      // is required to be EXACTLY 10/10 (it is the exact scan).
      // The ranked cell list is computed ONCE per index (rankCellsMany:
      // a probe at any nprobe is a prefix of it) — one centroid job per
      // curve instead of one per swept nprobe point.
      val ivfIdx = ivfIndexFor(s, dir, emb)
      val ivfCells = graft.ext.IvfIndex.rankCellsMany(s, ivfIdx,
        Seq(queryVec(emb))).head
      val ivfCurve = curveOf("ivf", np =>
        graft.ext.IvfIndex.topKCells(s, ivfIdx, "vec_id",
          "embedding", queryVec(emb), k = 10, cells = ivfCells.take(np)))
      require(ivfCurve.last._4 == 10L,
        s"IVF full-probe recall@10 is ${ivfCurve.last._4}/10 — a full " +
          "probe IS the exact scan, so anything under 10 means the " +
          "index dropped or mis-assigned vectors")
      // IVF-PQ (ADC over the tiny 4-codeword/subspace demo codebook,
      // 100 rescored candidates): adds quantization ranking loss on
      // top of coverage; the floor is the measured envelope across
      // sf0.001-0.1 (0.6-1.0) with margin
      val pqIdx = ivfPqIndexFor(s, dir, emb)
      val pqCells = graft.ext.IvfIndex.rankCellsMany(s, pqIdx,
        Seq(queryVec(emb))).head
      val pqCurve = curveOf("ivfpq", np =>
        graft.ext.IvfIndex.topKPqCells(s, pqIdx, "vec_id",
          queryVec(emb), k = 10, probes = pqCells.take(np), rescore = true,
          candidates = 100))
      require(pqCurve.last._4 >= RecallFloorHits,
        s"IVF-PQ recall@10 at nprobe=4 (full probe, 100 rescored " +
          s"candidates) is ${pqCurve.last._4}/10 — below the certified " +
          s"floor of $RecallFloorHits/10; with every cell probed a " +
          "miss means the true neighbor's ADC rank fell outside the " +
          "candidate pool — the PQ quantization is broken")
      import s.implicits._
      (ivfCurve ++ pqCurve)
        .toDF("index_kind", "nprobe", "k", "hits", "recall_pct")
        .orderBy("index_kind", "nprobe")
    }),
    // ----- incremental IVF-PQ maintenance (IvfIndex.appendPq scaladoc:
    // frozen coarse quantizer AND frozen codebook — new vectors
    // assigned + PQ-encoded in one broadcast pass over only the new
    // rows, appended to their cell partitions; ADC serving sees the
    // ingest with no rebuild, exactly equal to a from-scratch build
    // with these tables, which the oracle replays) -----
    "sim_ivfpq_append" -> ((s: SparkSession, dir: String) => {
      val emb = Tables.embeddings(s, dir)
      val idx = ivfPqAppendIndexFor(s, dir, emb)
      graft.ext.IvfIndex.topKPq(s, idx, "vec_id", queryVec(emb), k = 10,
        nprobe = 2, rescore = true)
    }),
    // symmetric int8 quantization, exploded to scalars for the oracle
    // ----- product-quantization codes: 4 subspaces, per-label codebook,
    // broadcast encode (Similarity.pqEncode scaladoc: vectors never
    // shuffle; rounded-then-argmin portable assignment) -----
    "emb_pq" -> ((s: SparkSession, dir: String) =>
      graft.ext.Similarity.pqEncode(Tables.embeddings(s, dir),
          "vec_id", "embedding", "label", numSub = 4)
        .orderBy("vec_id", "sub")),
    // ----- asymmetric-distance top-k from the codes alone — the query
    // half of IVF-PQ (Similarity.pqTopK scaladoc: embeddings never
    // touched at query time, fixed-order component folds) -----
    "sim_pq_adc" -> ((s: SparkSession, dir: String) => {
      val emb = Tables.embeddings(s, dir)
      graft.ext.Similarity.pqTopK(emb, "vec_id", "embedding", "label",
        numSub = 4, queryVec(emb), k = 10)
    }),
    // ----- unit-L2 normalization to exploded scalars (Similarity
    // .normalizeUnit scaladoc: codegen'd norm, zero-vector-safe) -----
    "emb_normalize" -> ((s: SparkSession, dir: String) =>
      graft.ext.Similarity.normalizeUnit(Tables.embeddings(s, dir),
          "vec_id", "embedding")
        .orderBy("vec_id", "pos")),
    "emb_quantize" -> ((s: SparkSession, dir: String) =>
      Similarity.quantizeInt8(Tables.embeddings(s, dir), "vec_id",
          "embedding")
        .orderBy("vec_id", "pos")),
    // ----- JL random projection 64 → 16 dims (Similarity.randomProject
    // scaladoc: hash-derived Achlioptas sign matrix — both engines
    // regenerate it from the formula, nothing stored) -----
    "emb_project" -> ((s: SparkSession, dir: String) =>
      Similarity.randomProject(Tables.embeddings(s, dir), "vec_id",
          "embedding", outDim = 16)
        .orderBy("vec_id", "j")),
    // ----- SemDeDup-shape semantic dedup inside label clusters
    // (Similarity.semDedupSurvivors scaladoc: cluster-local pair search,
    // capped loudly). The synthetic embeddings have no natural near-dups
    // (max within-label cosine ≈ 0.47), so planted signal: scaled copies
    // (cosine 1 → must drop) AND negated copies (cosine −1 → must
    // survive) — pure vec_id arithmetic the oracle replays, exact float
    // ops (×2, negate are exponent/sign-bit changes) -----
    "dedup_semantic" -> ((s: SparkSession, dir: String) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"), col("embedding"))
      val planted = emb.filter(col("vec_id") % 9 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"), col("label"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
        .union(emb.filter(col("vec_id") % 11 === 0)
          .select((col("vec_id") + 200000L).as("vec_id"), col("label"),
            transform(col("embedding"), x => -x).as("embedding")))
      Similarity.semDedupSurvivors(emb.union(planted), "vec_id",
          "embedding", "label", threshold = 0.99)
        .select(col("vec_id"), col("label"))
        .orderBy("vec_id")
    }),
    // ----- partial-overlap near-dup pairs from winnowing fingerprints
    // (Dedup.winnowPairs scaladoc: localized shared-run detection where
    // whole-set Jaccard dilutes; fp df-cut bounds the blocking join) -----
    "dedup_winnow" -> ((s: SparkSession, dir: String) =>
      Dedup.winnowPairs(Tables.documents(s, dir), "doc_id", "text",
          k = 4, w = 5, minShared = 2L, maxFpDf = 100L)
        .orderBy("doc_a", "doc_b")),
    // Per-label mean embedding (average pooling) — the class-prototype /
    // cluster-seed primitive. Decimal accumulation keeps the mean exact
    // and order-independent (a double sum would vary with partitioning).
    "emb_centroids" -> ((s: SparkSession, dir: String) =>
      Similarity.centroidComponents(Tables.embeddings(s, dir),
          "embedding", "label")
        .select(col("grp").as("label"), col("pos").cast("long").as("pos"),
          col("x").as("mean_v"))
        .orderBy("label", "pos")),
    // ----- §2.10 text analysis -----
    "text_tokens" -> ((s: SparkSession, dir: String) =>
      TextStats.tokenStats(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),
  )

  val oracles: Map[String, String] = Map(
    "dedup_fingerprint" ->
      "SELECT min(doc_id) AS doc_id, md5(lower(text)) AS fp FROM documents GROUP BY md5(lower(text)) ORDER BY 1",
    // brute-force reference the engine never runs: ALL pairs at
    // levenshtein <= 1, argmin (dist, clean key) per dirty id — proves
    // the deletion-neighborhood blocking has exact distance-1 recall
    "er_resolve" ->
      ("""WITH dirty AS (
         |  SELECT c_custkey AS id,
         |    CASE WHEN c_custkey % 3 = 0 THEN c_name
         |         ELSE substr(c_name, 1,
         |                CAST(c_custkey % length(c_name) AS INT))
         |           || substr(c_name,
         |                CAST(c_custkey % length(c_name) AS INT) + 2)
         |    END AS dn
         |  FROM customer
         |), pairs AS (
         |  SELECT d.id, c.c_custkey AS ck,
         |    levenshtein(d.dn, c.c_name) AS dist
         |  FROM dirty d, customer c
         |  WHERE levenshtein(d.dn, c.c_name) <= 1
         |)
         |SELECT id, ck AS match_c_custkey, CAST(dist AS INT) AS dist
         |FROM pairs
         |QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist, ck) = 1
         |ORDER BY id""".stripMargin),
    // the distance-2 reference: the same brute force at lev <= 2 over a
    // dirty side whose worst class carries TWO planted deletions — the
    // identical substr arithmetic as the engine's derivation
    "er_resolve2" ->
      ("""WITH cust AS (
         |  SELECT c_custkey, c_name FROM customer WHERE c_custkey % 4 = 0
         |), s1 AS (
         |  SELECT c_custkey, c_name,
         |    substr(c_name, 1, CAST(c_custkey % length(c_name) AS INT))
         |      || substr(c_name,
         |           CAST(c_custkey % length(c_name) AS INT) + 2) AS d1
         |  FROM cust
         |), dirty AS (
         |  SELECT c_custkey AS id,
         |    CASE WHEN c_custkey % 3 = 0 THEN c_name
         |         WHEN c_custkey % 3 = 1 THEN d1
         |         ELSE substr(d1, 1,
         |                CAST((c_custkey * 7) % length(d1) AS INT))
         |           || substr(d1,
         |                CAST((c_custkey * 7) % length(d1) AS INT) + 2)
         |    END AS dn
         |  FROM s1
         |), pairs AS (
         |  SELECT d.id, c.c_custkey AS ck,
         |    levenshtein(d.dn, c.c_name) AS dist
         |  FROM dirty d, cust c
         |  WHERE levenshtein(d.dn, c.c_name) <= 2
         |)
         |SELECT id, ck AS match_c_custkey, CAST(dist AS INT) AS dist
         |FROM pairs
         |QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist, ck) = 1
         |ORDER BY id""".stripMargin),
    "dedup_jaccard" -> JaccardOracle,
    "dedup_minhash" -> JaccardOracle,
    "dedup_clusters" -> ClusterOracle,
    // corpus minus non-canonical cluster members, via the same recursive
    // component resolution
    "dedup_survivors" ->
      (s"""WITH RECURSIVE $ClusterWalkCtes, drops AS (
         |  SELECT id FROM walk GROUP BY id HAVING id <> min(comp)
         |)
         |SELECT doc_id, lang, source FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM drops)
         |ORDER BY doc_id""".stripMargin),
    // same cluster walk, then per-cluster argmax(n_chars) with the min-id
    // tie-break replayed as max-score join + min(id)
    "dedup_best" ->
      (s"""WITH RECURSIVE $ClusterWalkCtes, cl AS (
         |  SELECT id, min(comp) AS comp FROM walk GROUP BY id
         |), scored AS (
         |  SELECT cl.id, cl.comp, d.n_chars FROM cl
         |  JOIN documents d ON d.doc_id = cl.id
         |), mx AS (
         |  SELECT comp, max(n_chars) AS ms FROM scored GROUP BY comp
         |), reps AS (
         |  SELECT s.comp, min(s.id) AS keep
         |  FROM scored s JOIN mx ON s.comp = mx.comp AND s.n_chars = mx.ms
         |  GROUP BY s.comp
         |), drops AS (
         |  SELECT id FROM cl WHERE id NOT IN (SELECT keep FROM reps)
         |)
         |SELECT doc_id, lang, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM drops)
         |ORDER BY doc_id""".stripMargin),
    "dedup_simhash" -> SimhashOracle,
    "dedup_jaccard_pruned" -> PrunedJaccardOracle,
    "sim_lsh" -> LshOracle,
    "sim_ivf" -> IvfOracle,
    // the same unrolled training replay, aggregated per learned cell
    "emb_kmeans" ->
      (s"""WITH v AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
         |), ${kmeansCte(k = 4, iters = 3, dims = 64)}
         |SELECT CAST(cell AS BIGINT) AS cell, count(*) AS n,
         |  min(vec_id) AS min_id, max(vec_id) AS max_id
         |FROM km_fin GROUP BY cell ORDER BY cell""".stripMargin),
    // the indexed path answers the identical query — same oracle
    "sim_ivf_indexed" -> IvfOracle,
    "sim_ivf_append" -> IvfAppendOracle,
    "sim_topk" ->
      (cosineSql("sim") + " SELECT vec_id, sim FROM scored ORDER BY sim DESC, vec_id LIMIT 10"),
    "sim_topk_grouped" ->
      (cosineSql("sim") +
        ", ranked AS (SELECT label, vec_id, sim, " +
        "CAST(row_number() OVER (PARTITION BY label ORDER BY sim DESC, vec_id) AS BIGINT) AS rn " +
        "FROM scored) SELECT label, vec_id, sim, rn FROM ranked WHERE rn <= 3 ORDER BY label, rn"),
    // same (candidate, query) operand order and norm product as the engine
    "sim_knn" ->
      ("""WITH v AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
         |), q AS (
         |  SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 5
         |), scored AS (
         |  SELECT q.query_id, v.vec_id AS cand_id,
         |    round(list_dot_product(v.e, qe) /
         |      (sqrt(list_dot_product(v.e, v.e)) *
         |       sqrt(list_dot_product(qe, qe))), 4) AS sim
         |  FROM v, q
         |), ranked AS (
         |  SELECT query_id, cand_id, sim,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, cand_id) AS BIGINT) AS rn
         |  FROM scored
         |)
         |SELECT query_id, cand_id, sim, rn FROM ranked
         |WHERE rn <= 3 ORDER BY query_id, rn""".stripMargin),
    "sim_neardup" ->
      ("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |           FROM embeddings WHERE vec_id % 2 = 0),
         |pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    round(list_dot_product(a.e, b.e) /
         |      (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 4) AS sim
         |  FROM v a JOIN v b ON a.vec_id < b.vec_id
         |)
         |SELECT id_a, id_b, sim FROM pairs WHERE sim >= 0.4 ORDER BY id_a, id_b""".stripMargin),
    "text_tokens" ->
      ("""SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
         |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe
         |FROM documents ORDER BY doc_id""".stripMargin),
    // same subspace slices, same 1e-10 quantized-mean codebook, same
    // expanded-form distance with fixed op order, rounded before argmin
    "emb_pq" ->
      ("""WITH v AS (
         |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings
         |), s AS (
         |  SELECT vec_id, label, sub, e[sub*16+1 : sub*16+16] AS sv
         |  FROM v, (SELECT unnest(range(0, 4)) AS sub)
         |), comp AS (
         |  SELECT sub, label, generate_subscripts(sv, 1) AS pos,
         |    unnest(sv) AS x
         |  FROM s
         |), cent AS (
         |  SELECT sub, label, pos,
         |    CAST(sum(CAST(floor(x * 1e10 + 0.5) AS BIGINT)) AS DOUBLE)
         |      / count(*) / 1e10 AS x
         |  FROM comp GROUP BY 1, 2, 3
         |), cb AS (
         |  SELECT sub, label AS lbl, list(x ORDER BY pos) AS cent
         |  FROM cent GROUP BY 1, 2
         |), scored AS (
         |  SELECT s.vec_id, s.sub, cb.lbl,
         |    round(list_dot_product(sv, sv) - 2.0 * list_dot_product(sv, cent)
         |      + list_dot_product(cent, cent), 6) AS d2
         |  FROM s JOIN cb ON s.sub = cb.sub
         |), best AS (
         |  SELECT vec_id, sub, lbl, d2,
         |    row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, lbl)
         |      AS rn
         |  FROM scored
         |)
         |SELECT vec_id, CAST(sub AS BIGINT) AS sub, lbl AS code, d2
         |FROM best WHERE rn = 1 ORDER BY vec_id, sub""".stripMargin),
    // the emb_pq pipeline through codes, then the ADC score: per-sub
    // lookup scalars, fixed sub-order folds, one division, top-k
    "sim_pq_adc" ->
      ("""WITH v AS (
         |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings
         |), s AS (
         |  SELECT vec_id, label, sub, e[sub*16+1 : sub*16+16] AS sv
         |  FROM v, (SELECT unnest(range(0, 4)) AS sub)
         |), comp AS (
         |  SELECT sub, label, generate_subscripts(sv, 1) AS pos,
         |    unnest(sv) AS x
         |  FROM s
         |), cent AS (
         |  SELECT sub, label, pos,
         |    CAST(sum(CAST(floor(x * 1e10 + 0.5) AS BIGINT)) AS DOUBLE)
         |      / count(*) / 1e10 AS x
         |  FROM comp GROUP BY 1, 2, 3
         |), cb AS (
         |  SELECT sub, label AS lbl, list(x ORDER BY pos) AS cent
         |  FROM cent GROUP BY 1, 2
         |), scored AS (
         |  SELECT s.vec_id, s.sub, cb.lbl,
         |    round(list_dot_product(sv, sv) - 2.0 * list_dot_product(sv, cent)
         |      + list_dot_product(cent, cent), 6) AS d2
         |  FROM s JOIN cb ON s.sub = cb.sub
         |), best AS (
         |  SELECT vec_id, sub, lbl,
         |    row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, lbl)
         |      AS rn
         |  FROM scored
         |), q AS (
         |  SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
         |  WHERE vec_id = 0
         |), lut AS (
         |  SELECT cb.sub, cb.lbl,
         |    list_dot_product(cent, qe[cb.sub*16+1 : cb.sub*16+16]) AS qd,
         |    list_dot_product(cent, cent) AS cn
         |  FROM cb, q
         |), parts AS (
         |  SELECT b.vec_id, b.sub, lut.qd, lut.cn
         |  FROM (SELECT vec_id, sub, lbl FROM best WHERE rn = 1) b
         |  JOIN lut ON b.sub = lut.sub AND b.lbl = lut.lbl
         |), agg AS (
         |  SELECT vec_id,
         |    list_reduce(list(qd ORDER BY sub), (a, x) -> a + x) AS dotsum,
         |    list_reduce(list(cn ORDER BY sub), (a, x) -> a + x) AS norm2
         |  FROM parts GROUP BY vec_id
         |)
         |SELECT vec_id,
         |  round(dotsum / (sqrt(norm2) * sqrt(list_dot_product(qe, qe))), 4)
         |    AS sim_pq
         |FROM agg, q ORDER BY sim_pq DESC, vec_id LIMIT 10""".stripMargin),
    // the IVF-PQ composition over the LEARNED coarse quantizer: the
    // k-means training rounds are unrolled (km_* CTEs), their final
    // assignment plays the label role for both the probe selection
    // (portable quantized-mean coarse centroids, top-2 by rounded
    // cosine) and the PQ codebook; the final 10 ADC winners are
    // re-scored with the exact cosine and reordered by it
    // the incremental twin: train + codebook over the EVEN half only,
    // odd rows assigned by the frozen coarse argmin and PQ-encoded
    // against the frozen codebook, ADC + rescore over the union
    "sim_ivfpq_append" ->
      (s"""WITH vall AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings
         |), v AS (
         |  SELECT * FROM vall WHERE vec_id % 2 = 0
         |), va AS (
         |  SELECT * FROM vall WHERE vec_id % 2 = 1
         |), q AS (
         |  SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
         |  WHERE vec_id = 0
         |), ${kmeansCte(k = 4, iters = 3, dims = 64)}, vl AS (
         |  SELECT v.vec_id, f.cell AS label, v.e
         |  FROM v JOIN km_fin f USING (vec_id)
         |), cpos AS (
         |  SELECT label, generate_subscripts(e, 1) AS pos, unnest(e) AS x
         |  FROM vl
         |), ccent AS (
         |  SELECT label, pos,
         |    CAST(sum(CAST(floor(x * 1e10 + 0.5) AS BIGINT)) AS DOUBLE)
         |      / count(*) / 1e10 AS x
         |  FROM cpos GROUP BY label, pos
         |), carr AS (
         |  SELECT label, list(x ORDER BY pos) AS c FROM ccent GROUP BY label
         |), apps AS (
         |  SELECT vec_id, e, label,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY
         |      CAST(floor(list_reduce([ (e[i]-c[i])*(e[i]-c[i])
         |        for i in range(1, 65) ], (a,b) -> a + b) * 1e8 + 0.5)
         |        AS BIGINT), label) AS rn
         |  FROM va CROSS JOIN carr
         |), vl2 AS (
         |  SELECT vec_id, label, e FROM vl
         |  UNION ALL
         |  SELECT vec_id, label, e FROM apps WHERE rn = 1
         |), probes AS (
         |  SELECT label,
         |    round(list_dot_product(c, qe) /
         |      (sqrt(list_dot_product(c, c)) *
         |       sqrt(list_dot_product(qe, qe))), 4) AS cs
         |  FROM carr, q ORDER BY cs DESC, label LIMIT 2
         |), sb AS (
         |  SELECT vec_id, label, sub, e[sub*16+1 : sub*16+16] AS sv
         |  FROM vl, (SELECT unnest(range(0, 4)) AS sub)
         |), s AS (
         |  SELECT vec_id, label, sub, e[sub*16+1 : sub*16+16] AS sv
         |  FROM vl2, (SELECT unnest(range(0, 4)) AS sub)
         |), comp AS (
         |  SELECT sub, label, generate_subscripts(sv, 1) AS pos,
         |    unnest(sv) AS x
         |  FROM sb
         |), cent AS (
         |  SELECT sub, label, pos,
         |    CAST(sum(CAST(floor(x * 1e10 + 0.5) AS BIGINT)) AS DOUBLE)
         |      / count(*) / 1e10 AS x
         |  FROM comp GROUP BY 1, 2, 3
         |), cb AS (
         |  SELECT sub, label AS lbl, list(x ORDER BY pos) AS cent
         |  FROM cent GROUP BY 1, 2
         |), scored AS (
         |  SELECT s.vec_id, s.sub, cb.lbl,
         |    round(list_dot_product(sv, sv) - 2.0 * list_dot_product(sv, cent)
         |      + list_dot_product(cent, cent), 6) AS d2
         |  FROM s JOIN cb ON s.sub = cb.sub
         |), best AS (
         |  SELECT vec_id, sub, lbl,
         |    row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, lbl)
         |      AS rn
         |  FROM scored
         |), lut AS (
         |  SELECT cb.sub, cb.lbl,
         |    list_dot_product(cent, qe[cb.sub*16+1 : cb.sub*16+16]) AS qd,
         |    list_dot_product(cent, cent) AS cn
         |  FROM cb, q
         |), pv AS (
         |  SELECT vec_id FROM vl2 JOIN probes USING (label)
         |), parts AS (
         |  SELECT b.vec_id, b.sub, lut.qd, lut.cn
         |  FROM (SELECT vec_id, sub, lbl FROM best WHERE rn = 1) b
         |  JOIN pv ON b.vec_id = pv.vec_id
         |  JOIN lut ON b.sub = lut.sub AND b.lbl = lut.lbl
         |), agg AS (
         |  SELECT vec_id,
         |    list_reduce(list(qd ORDER BY sub), (a, x) -> a + x) AS dotsum,
         |    list_reduce(list(cn ORDER BY sub), (a, x) -> a + x) AS norm2
         |  FROM parts GROUP BY vec_id
         |), adc AS (
         |  SELECT vec_id,
         |    round(dotsum / (sqrt(norm2) * sqrt(list_dot_product(qe, qe))), 4)
         |      AS sim_pq
         |  FROM agg, q ORDER BY sim_pq DESC, vec_id LIMIT 10
         |)
         |SELECT adc.vec_id, adc.sim_pq,
         |  round(list_dot_product(vall.e, qe) /
         |    (sqrt(list_dot_product(vall.e, vall.e)) *
         |     sqrt(list_dot_product(qe, qe))), 4) AS sim
         |FROM adc JOIN vall ON adc.vec_id = vall.vec_id, q
         |ORDER BY sim DESC, adc.vec_id""".stripMargin),
    "sim_ivfpq" -> (IvfPqAdcCtes +
      """
         |SELECT adc.vec_id, adc.sim_pq,
         |  round(list_dot_product(v.e, qe) /
         |    (sqrt(list_dot_product(v.e, v.e)) *
         |     sqrt(list_dot_product(qe, qe))), 4) AS sim
         |FROM adc JOIN v ON adc.vec_id = v.vec_id, q
         |ORDER BY sim DESC, adc.vec_id""".stripMargin),
    // the recall tuning curve replayed: the same pipeline CTEs, but
    // instead of the fixed 2-cell probe filter, every vector carries
    // its cell's query-proximity RANK; for each nprobe in {1,2,4} the
    // ADC top-10 among cells ranked <= nprobe intersects the exact
    // top-10 — integer overlap counts, bit-replayable
    "sim_recall" -> (IvfPqAdcCtes +
      """, partsall AS (
         |  SELECT b.vec_id, b.sub, lut.qd, lut.cn
         |  FROM (SELECT vec_id, sub, lbl FROM best WHERE rn = 1) b
         |  JOIN lut ON b.sub = lut.sub AND b.lbl = lut.lbl
         |), aggall AS (
         |  SELECT vec_id,
         |    list_reduce(list(qd ORDER BY sub), (a, x) -> a + x) AS dotsum,
         |    list_reduce(list(cn ORDER BY sub), (a, x) -> a + x) AS norm2
         |  FROM partsall GROUP BY vec_id
         |), prk AS (
         |  SELECT label,
         |    row_number() OVER (ORDER BY cs DESC, label) AS pr
         |  FROM (
         |    SELECT label,
         |      round(list_dot_product(c, qe) /
         |        (sqrt(list_dot_product(c, c)) *
         |         sqrt(list_dot_product(qe, qe))), 4) AS cs
         |    FROM carr, q)
         |), vsim AS (
         |  SELECT agg.vec_id, prk.pr,
         |    round(dotsum / (sqrt(norm2) * sqrt(list_dot_product(qe, qe))),
         |      4) AS sim_pq
         |  FROM aggall agg
         |  JOIN vl ON agg.vec_id = vl.vec_id
         |  JOIN prk ON vl.label = prk.label, q
         |), cand AS (
         |  SELECT np, vec_id,
         |    row_number() OVER (PARTITION BY np
         |      ORDER BY sim_pq DESC, vec_id) AS rn
         |  FROM vsim, (SELECT unnest([1, 2, 4]) AS np)
         |  WHERE pr <= np
         |), vx AS (
         |  SELECT vec_id,
         |    round(list_dot_product(e, qe) /
         |      (sqrt(list_dot_product(e, e)) *
         |       sqrt(list_dot_product(qe, qe))), 4) AS sim
         |  FROM v, q
         |), probe AS (
         |  SELECT np, vec_id FROM (
         |    SELECT c.np, c.vec_id,
         |      row_number() OVER (PARTITION BY c.np
         |        ORDER BY vx.sim DESC, c.vec_id) AS rr
         |    FROM (SELECT np, vec_id FROM cand WHERE rn <= 100) c
         |    JOIN vx USING (vec_id))
         |  WHERE rr <= 10
         |), exact AS (
         |  SELECT vec_id FROM vx ORDER BY sim DESC, vec_id LIMIT 10
         |), ivfprobe AS (
         |  SELECT np, vec_id FROM (
         |    SELECT n.np, vx.vec_id,
         |      row_number() OVER (PARTITION BY n.np
         |        ORDER BY vx.sim DESC, vx.vec_id) AS rr
         |    FROM vx JOIN vl USING (vec_id)
         |    JOIN prk ON vl.label = prk.label,
         |    (SELECT unnest([1, 2, 4]) AS np) n
         |    WHERE prk.pr <= n.np)
         |  WHERE rr <= 10
         |)
         |SELECT 'ivf' AS index_kind, CAST(np AS BIGINT) AS nprobe,
         |  CAST(10 AS BIGINT) AS k,
         |  CAST(count(exact.vec_id) AS BIGINT) AS hits,
         |  CAST(count(exact.vec_id) * 10 AS BIGINT) AS recall_pct
         |FROM ivfprobe LEFT JOIN exact USING (vec_id) GROUP BY np
         |UNION ALL
         |SELECT 'ivfpq', CAST(np AS BIGINT), CAST(10 AS BIGINT),
         |  CAST(count(exact.vec_id) AS BIGINT),
         |  CAST(count(exact.vec_id) * 10 AS BIGINT)
         |FROM probe LEFT JOIN exact USING (vec_id) GROUP BY np
         |ORDER BY index_kind, nprobe""".stripMargin),
    
    // the same double-widened dot for the norm, one division per element,
    // then the portable floor-quantize into 1e-4 long units (plain IEEE
    // ops — round() ties and -0.0 diverge across engines, integers don't);
    // zero vectors emit 0 like the engine
    "emb_normalize" ->
      ("""WITH v AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
         |), n AS (
         |  SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v
         |)
         |SELECT vec_id,
         |  CAST(generate_subscripts(e, 1) - 1 AS BIGINT) AS pos,
         |  CASE WHEN nrm = 0 THEN 0
         |       ELSE CAST(floor(unnest(e) / nrm * 1e4 + 0.5) AS BIGINT)
         |  END AS u
         |FROM n ORDER BY vec_id, pos""".stripMargin),
    // the same planted corpus (×2 / negated copies via exact float ops),
    // the same lower-id drop rule on cluster-local rounded cosine
    "dedup_semantic" ->
      ("""WITH base AS (
         |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings
         |), corpus AS (
         |  SELECT vec_id, label, e FROM base
         |  UNION ALL
         |  SELECT vec_id + 100000, label, list_transform(e, x -> x * 2)
         |  FROM base WHERE vec_id % 9 = 0
         |  UNION ALL
         |  SELECT vec_id + 200000, label, list_transform(e, x -> -x)
         |  FROM base WHERE vec_id % 11 = 0
         |), n AS (
         |  SELECT vec_id, label, e, sqrt(list_dot_product(e, e)) AS nrm
         |  FROM corpus
         |), dropped AS (
         |  SELECT DISTINCT b.vec_id AS d
         |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE (CASE WHEN a.nrm = 0 OR b.nrm = 0 THEN 0
         |         ELSE round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 4)
         |         END) >= 0.99
         |)
         |SELECT vec_id, label FROM corpus
         |WHERE vec_id NOT IN (SELECT d FROM dropped)
         |ORDER BY vec_id""".stripMargin),
    // the same (i, j) multiply-mod-prime sign and the same in-order fold
    // (list_reduce seeds with the first element, which equals Spark's
    // 0.0-seeded fold exactly since 0.0 + x == x in IEEE)
    "emb_project" ->
      ("""WITH v AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
         |)
         |SELECT vec_id, CAST(j AS BIGINT) AS j,
         |  CAST(floor(yraw / sqrt(16.0) * 1e4 + 0.5) AS BIGINT) AS y
         |FROM (
         |  SELECT vec_id, j,
         |    list_reduce(
         |      [(1.0 - 2.0 * (((((((i-1) * 73856093 + j * 19349663
         |             + 83492791) % 65521) * 2654435761) % 2147483647) % 2))
         |        ) * e[i]
         |       for i in range(1, len(e) + 1)],
         |      (a, x) -> a + x) AS yraw
         |  FROM v, (SELECT unnest(range(0, 16)) AS j)
         |)
         |ORDER BY vec_id, j""".stripMargin),
    "emb_quantize" ->
      ("""WITH v AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
         |), m AS (
         |  SELECT vec_id, e,
         |    list_max(list_transform(e, x -> abs(x))) AS scale
         |  FROM v
         |)
         |SELECT vec_id,
         |  CAST(generate_subscripts(e, 1) - 1 AS BIGINT) AS pos,
         |  CASE WHEN scale = 0 THEN 0
         |       ELSE CAST(floor(unnest(e) / scale * 127 + 0.5) AS BIGINT)
         |  END AS q
         |FROM m ORDER BY vec_id, pos""".stripMargin),
    "emb_centroids" ->
      ("""WITH comp AS (
         |  SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
         |    unnest(embedding) AS v
         |  FROM embeddings
         |)
         |SELECT label, CAST(pos AS BIGINT) AS pos,
         |  CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1e10 + 0.5) AS BIGINT))
         |         AS DOUBLE)
         |    / count(*) / 1e10 AS mean_v
         |FROM comp GROUP BY label, pos ORDER BY label, pos""".stripMargin),
    // same [[WinnowCte]] fingerprints, then the df-cut band (2 <= df <=
    // 100) and the blocked self-join counting distinct shared hashes
    "dedup_winnow" ->
      (s"""WITH $WinnowCte,
         |fps AS (SELECT doc_id, unnest(fps) AS fp FROM win),
         |band AS (
         |  SELECT fp FROM fps GROUP BY fp
         |  HAVING count(*) >= 2 AND count(*) <= 100
         |), pr AS (
         |  SELECT f.doc_id, f.fp FROM fps f JOIN band USING (fp)
         |)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(count(*) AS BIGINT) AS shared
         |FROM pr a JOIN pr b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 2
         |ORDER BY doc_a, doc_b""".stripMargin),
  )

  /** The shared IVF-PQ pipeline replay (coarse k-means training, cell
    * centroids, probe selection, per-cell PQ codebooks, codes, ADC),
    * ending in the `adc` CTE — the probe's top-10 by PQ similarity.
    * Consumed by both the `sim_ivfpq` oracle (which rescores it
    * exactly) and the `sim_recall` oracle (which intersects its id set
    * with the exact top-10). */
  private lazy val IvfPqAdcCtes: String =
    s"""WITH v AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
       |  FROM embeddings
       |), q AS (
       |  SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
       |  WHERE vec_id = 0
       |), ${kmeansCte(k = 4, iters = 3, dims = 64)}, vl AS (
       |  SELECT v.vec_id, f.cell AS label, v.e
       |  FROM v JOIN km_fin f USING (vec_id)
       |), cpos AS (
       |  SELECT label, generate_subscripts(e, 1) AS pos, unnest(e) AS x
       |  FROM vl
       |), ccent AS (
       |  SELECT label, pos,
       |    CAST(sum(CAST(floor(x * 1e10 + 0.5) AS BIGINT)) AS DOUBLE)
       |      / count(*) / 1e10 AS x
       |  FROM cpos GROUP BY label, pos
       |), carr AS (
       |  SELECT label, list(x ORDER BY pos) AS c FROM ccent GROUP BY label
       |), probes AS (
       |  SELECT label,
       |    round(list_dot_product(c, qe) /
       |      (sqrt(list_dot_product(c, c)) *
       |       sqrt(list_dot_product(qe, qe))), 4) AS cs
       |  FROM carr, q ORDER BY cs DESC, label LIMIT 2
       |), s AS (
       |  SELECT vec_id, label, sub, e[sub*16+1 : sub*16+16] AS sv
       |  FROM vl, (SELECT unnest(range(0, 4)) AS sub)
       |), comp AS (
       |  SELECT sub, label, generate_subscripts(sv, 1) AS pos,
       |    unnest(sv) AS x
       |  FROM s
       |), cent AS (
       |  SELECT sub, label, pos,
       |    CAST(sum(CAST(floor(x * 1e10 + 0.5) AS BIGINT)) AS DOUBLE)
       |      / count(*) / 1e10 AS x
       |  FROM comp GROUP BY 1, 2, 3
       |), cb AS (
       |  SELECT sub, label AS lbl, list(x ORDER BY pos) AS cent
       |  FROM cent GROUP BY 1, 2
       |), scored AS (
       |  SELECT s.vec_id, s.sub, cb.lbl,
       |    round(list_dot_product(sv, sv) - 2.0 * list_dot_product(sv, cent)
       |      + list_dot_product(cent, cent), 6) AS d2
       |  FROM s JOIN cb ON s.sub = cb.sub
       |), best AS (
       |  SELECT vec_id, sub, lbl,
       |    row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, lbl)
       |      AS rn
       |  FROM scored
       |), lut AS (
       |  SELECT cb.sub, cb.lbl,
       |    list_dot_product(cent, qe[cb.sub*16+1 : cb.sub*16+16]) AS qd,
       |    list_dot_product(cent, cent) AS cn
       |  FROM cb, q
       |), pv AS (
       |  SELECT vec_id FROM vl JOIN probes USING (label)
       |), parts AS (
       |  SELECT b.vec_id, b.sub, lut.qd, lut.cn
       |  FROM (SELECT vec_id, sub, lbl FROM best WHERE rn = 1) b
       |  JOIN pv ON b.vec_id = pv.vec_id
       |  JOIN lut ON b.sub = lut.sub AND b.lbl = lut.lbl
       |), agg AS (
       |  SELECT vec_id,
       |    list_reduce(list(qd ORDER BY sub), (a, x) -> a + x) AS dotsum,
       |    list_reduce(list(cn ORDER BY sub), (a, x) -> a + x) AS norm2
       |  FROM parts GROUP BY vec_id
       |), adc AS (
       |  SELECT vec_id,
       |    round(dotsum / (sqrt(norm2) * sqrt(list_dot_product(qe, qe))), 4)
       |      AS sim_pq
       |  FROM agg, q ORDER BY sim_pq DESC, vec_id LIMIT 10
       |)""".stripMargin
}
