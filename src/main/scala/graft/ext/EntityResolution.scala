package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy entity resolution: match dirty records to a clean reference by
  * edit distance WITHOUT the all-pairs blowup — the record-linkage staple
  * (catalog dedup, user-record merge) every large-scale data pipeline
  * eventually needs.
  *
  * Shape: deletion-neighborhood blocking (the Symmetric-Delete scheme of
  * Garbe's public SymSpell algorithm) + exact Levenshtein verification +
  * deterministic argmin selection.
  *
  *  - BLOCK: each side expands its name into `{s} ∪ {s minus one char}`
  *    — `len+1` candidate keys per row, all built from codegen'd builtin
  *    functions (`sequence`/`transform`/`explode`, no UDF). Two strings
  *    within Levenshtein distance 1 ALWAYS share a key (a substitution's
  *    two sides share the deletion at that position; an insertion's long
  *    side deletes the inserted char), so blocking recall is exact for
  *    maxDist=1 — certified against a brute-force all-pairs oracle that
  *    never sees the blocking. Distance-2 neighborhoods (delete up to 2
  *    chars, len² keys) extend the same scheme when a looser match is
  *    worth the key fan-out.
  *  - VERIFY: shared keys admit some distance-2 impostors (two different
  *    single-deletions can land on the same string), so every candidate
  *    pair is re-checked with the exact `levenshtein` builtin.
  *  - SELECT: per dirty id, `min(struct(dist, clean_id))` — closest
  *    match, ties to the smallest clean id; deterministic, hash-stable.
  *
  * Scale: the only shuffle is the equi-join on variant keys, sized
  * `O(n·len)` rows per side — never `O(n²)`. Block sizes are bounded by
  * the true near-duplicate density (a variant key collides only for
  * strings one edit apart plus the bounded impostor class), so no key
  * explodes into a cartesian at 100× data. Duplicate candidate pairs
  * (one pair sharing several variants) are NOT pre-deduplicated: the
  * argmin aggregate absorbs them, saving a whole exchange.
  */
object EntityResolution {

  /** `{s} ∪ single-deletion variants of s`, distinct, as an array column
    * — pure builtin expressions, fully codegen'd. */
  def deletionNeighborhood(name: Column): Column =
    array_distinct(concat(
      array(name),
      transform(sequence(lit(1), length(name)),
        i => concat(name.substr(lit(1), i - lit(1)),
          name.substr(i + lit(1), lit(Int.MaxValue))))))

  /** The distance-2 neighborhood: `{s} ∪ delete-1 ∪ delete-2 variants`
    * (positions i < j removed together — `len·(len−1)/2` extra keys).
    * Two strings within Levenshtein distance 2 always share a member
    * (the SymSpell delete-intersection property at d = 2, certified
    * against the brute-force oracle exactly like the d = 1 scheme); the
    * key fan-out grows from `len+1` to `O(len²/2)` per row, which is the
    * deliberate price of the looser match. Still pure builtins — the
    * nested position loop is `transform` over `sequence`, flattened. */
  def deletionNeighborhood2(name: Column): Column =
    array_distinct(concat(
      deletionNeighborhood(name),
      // guard: sequence(1, len-1) on a sub-2-char string would DESCEND
      // (Spark infers step -1 when start > stop) — emit no pair keys
      when(length(name) >= 2,
        flatten(transform(sequence(lit(1), length(name) - lit(1)), i =>
          transform(sequence(i + lit(1), length(name)), j =>
            concat(name.substr(lit(1), i - lit(1)),
              name.substr(i + lit(1), j - i - lit(1)),
              name.substr(j + lit(1), lit(Int.MaxValue)))))))
        .otherwise(array().cast("array<string>"))))

  /** Resolve each dirty row to its closest clean row at Levenshtein
    * distance ≤ `maxDist` (1 by default; 2 switches both sides to the
    * `len²`-key [[deletionNeighborhood2]] — blocking recall is exact at
    * either setting, certified against brute-force oracles). Output:
    * `(id, match_<cleanId>, dist)`, inner (dirty rows with no admissible
    * match are dropped; run an anti-join on the output for the unmatched
    * side). */
  def resolve(dirty: DataFrame, dirtyId: String, dirtyName: String,
              clean: DataFrame, cleanId: String, cleanName: String,
              maxDist: Int = 1,
              maxBroadcastClean: Long = 1000000L): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      "resolve: deletion-neighborhood blocking is exact for maxDist 1 " +
        "(len+1 keys/row) and 2 (len²/2 keys/row); wider distances — " +
        "fall back to a banded MinHash/LSH pass (Dedup.minhash) instead")
    val nbhd: Column => Column =
      if (maxDist == 1) deletionNeighborhood else deletionNeighborhood2
    val dKeys = dirty.select(col(dirtyId).as("__did"),
        col(dirtyName).as("__dn"),
        explode(nbhd(col(dirtyName))).as("__key"))
    val cKeys = clean.select(col(cleanId).as("__cid"),
        col(cleanName).as("__cn"),
        explode(nbhd(col(cleanName))).as("__key"))
    // the common production shape is a HUGE dirty feed against a
    // dim-sized canonical reference: when the clean row count (one cheap
    // metadata-friendly action) is bounded, broadcast its exploded key
    // frame so the dirty side never shuffles at all; above the cap both
    // sides hash-partition on the variant key as before
    val cSide =
      if (clean.count() <= maxBroadcastClean) broadcast(cKeys) else cKeys
    dKeys.join(cSide, "__key")
      // one levenshtein per candidate row, shared by filter and argmin
      .withColumn("__dist", levenshtein(col("__dn"), col("__cn")))
      .where(col("__dist") <= maxDist)
      .groupBy(col("__did"))
      .agg(min(struct(col("__dist").as("dist"),
        col("__cid").as("cid"))).as("__m"))
      .select(col("__did").as("id"),
        col("__m.cid").as(s"match_$cleanId"),
        col("__m.dist").as("dist"))
  }
}
