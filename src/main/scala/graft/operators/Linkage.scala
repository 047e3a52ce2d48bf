package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / fuzzy entity resolution — the typo-tolerant
  * companion to [[Dedup]]'s exact and shingle-based families, for ENTITY
  * records (customer names, addresses, supplier strings) where
  * duplicates differ by keystroke edits rather than shared n-grams.
  * The reference's warehouse dedups on exact keys only
  * (`db_loader.py` upsert by primary key); real customer data needs the
  * fuzzy layer before keys exist.
  *
  * Scale shape — the classic blocking design: records group into small
  * BLOCKS by a cheap key, pairwise edit distance runs only INSIDE a
  * block, so cost is Σ block² (the LSH-bucket-join argument, never
  * corpus-quadratic) and the join is one hash exchange on the block key.
  * A hot block fails LOUDLY rather than detonating an executor.
  */
object Linkage {

  /** Candidate duplicate pairs by blocked edit distance: names fold
    * (trim + lower), records block by `blockKey` (default: the first
    * `blockLen` folded characters), and in-block pairs at
    * `levenshtein ≤ maxDist` emit as `(id_a, id_b, dist)` with
    * `id_a < id_b`. Any block over `maxBlockSize` rows fails LOUDLY
    * (the basketAffinity cap discipline) — a giant block means the
    * blocking key is wrong for this data: lengthen the prefix or switch
    * keys.
    *
    * Blocking on a prefix REQUIRES the blocked characters to be
    * edit-free: a typo inside the first `blockLen` chars lands the
    * copies in different blocks and the pair is missed. The standard
    * answer is multi-pass blocking — run again with an independent
    * `blockKey` (a suffix block, a phonetic key like `soundex`) and
    * union the pair sets; the pass structure is why `blockKey` is a
    * parameter, not a constant.
    */
  def blockedFuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
                        blockLen: Int = 4, maxDist: Int = 1,
                        maxBlockSize: Int = 1000,
                        blockKey: Option[Column] = None): DataFrame = {
    require(blockLen >= 1, s"blockedFuzzyPairs: blockLen must be ≥1, got $blockLen")
    require(maxDist >= 0, s"blockedFuzzyPairs: maxDist must be ≥0, got $maxDist")
    require(maxBlockSize >= 2,
      s"blockedFuzzyPairs: maxBlockSize must be ≥2, got $maxBlockSize")
    val id = Cols.qcol(idCol)
    val folded = lower(trim(Cols.qcol(nameCol)))
    val blk = blockKey.getOrElse(substring(folded, 1, blockLen))
    val keyed = df
      .select(id.as("_id"), folded.as("_nm"), blk.as("_blk"))
      .filter(col("_nm").isNotNull && col("_blk").isNotNull &&
        length(col("_nm")) >= blockLen)
    // ONE scan, ONE exchange: blocks aggregate to a bounded in-memory
    // array (the loud cap makes "bounded" a guarantee, not a hope) and
    // pairs explode INSIDE each block — a self-join formulation would
    // plan the whole scan+guard subtree twice (audited; the broadcast
    // hash join duplicated the corpus scan)
    val agg = keyed.groupBy(col("_blk"))
      .agg(collect_list(struct(col("_id"), col("_nm"))).as("_rows"))
    val rowsType = agg.schema("_rows").dataType
    val blocks = agg.select(
      when(size(col("_rows")) > maxBlockSize, raise_error(concat(
        lit(s"blockedFuzzyPairs: block '"), col("_blk"),
        lit(s"' holds more than $maxBlockSize records — cost is block², " +
          "lengthen the blocking prefix or switch blocking keys")))
        .cast(rowsType))
        .otherwise(col("_rows")).as("_rows"))
    blocks
      .select(col("_rows"), posexplode(col("_rows")).as(Seq("_i", "_a")))
      .select(col("_a"), col("_i"), posexplode(col("_rows")).as(Seq("_j", "_b")))
      .filter(col("_i") < col("_j") &&
        levenshtein(col("_a._nm"), col("_b._nm")) <= maxDist)
      .select(
        least(col("_a._id"), col("_b._id")).as("id_a"),
        greatest(col("_a._id"), col("_b._id")).as("id_b"),
        levenshtein(col("_a._nm"), col("_b._nm")).as("dist"))
  }

  /** Fuzzy entity dedup: [[blockedFuzzyPairs]] edges through
    * [[Dedup.assignCanonical]]'s connected-components clustering — every
    * record gets a `canonical` id (cluster min; singletons themselves),
    * transitively (a~b, b~c collapse to one entity even when a and c
    * exceed `maxDist` directly). `keep = id == canonical` is the dedup
    * filter; [[Dedup.keepBestPerCluster]] swaps in a quality-based
    * survivor policy.
    */
  def fuzzyDedup(df: DataFrame, idCol: String, nameCol: String,
                 blockLen: Int = 4, maxDist: Int = 1,
                 maxBlockSize: Int = 1000,
                 blockKey: Option[Column] = None): DataFrame = {
    val pairs = blockedFuzzyPairs(df, idCol, nameCol, blockLen, maxDist,
      maxBlockSize, blockKey).select(col("id_a"), col("id_b"))
    Dedup.assignCanonical(df, idCol, pairs)
  }
}
