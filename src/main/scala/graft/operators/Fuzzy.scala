package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching (entity resolution): find record pairs whose
  * key strings are within an edit-distance threshold WITHOUT the O(n²)
  * all-pairs comparison — the record-linkage step a curation pipeline
  * runs to reconcile near-identical titles/names before dedup or joining
  * external metadata (the reference's star schema reconciles members by
  * exact smart keys, 34_ETL_Gold_Fact_PySpark.py:61-77; fuzzy blocking is
  * the standard generalization when keys are free text).
  *
  * Multi-pass blocking, the classic ER device: each record lands in a
  * PREFIX block and a SUFFIX block of its key; only same-block pairs are
  * compared. Two passes catch pairs a single pass misses (an edit in the
  * first characters moves a record out of its prefix block but not its
  * suffix block, and vice versa) while keeping candidate generation
  * linear in block sizes — a pair must survive an edit budget of
  * `maxDist`, so it agrees on an untouched prefix OR suffix whenever
  * `maxDist < len - blockLen` edits can't cover both ends.
  *
  * Scale shape: each pass is one hash shuffle on the block key; the
  * length guard (`|len_a - len_b| <= maxDist`, a necessary condition for
  * edit distance) prunes candidates before the quadratic-cost
  * `levenshtein` runs, and levenshtein itself evaluates only inside
  * blocks, never across the corpus. Candidate pairs from both passes are
  * dedup'd by key BEFORE scoring so a pair sharing prefix and suffix
  * blocks is scored once. At 100 TB the block key is the unit of
  * parallelism: hot blocks (boilerplate prefixes) bound the worst case,
  * so production runs add a block-size cap or a third pass on a
  * mid-string window; blocks here are prefix/suffix only, the 2-pass
  * core of that scheme.
  */
object Fuzzy {

  /** Self-join `records` fuzzily on `key`: pairs (id_a < id_b) with
    * levenshtein(key_a, key_b) <= maxDist, discovered via prefix+suffix
    * blocking with block length `blockLen`. Returns (id_a, id_b, dist).
    *
    * Records whose key is shorter than `blockLen` share the whole-key
    * block (their prefix == suffix == key), so short strings still pair.
    */
  def fuzzySelfJoin(records: DataFrame, idCol: String, keyCol: String,
      maxDist: Int, blockLen: Int = 8): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    require(blockLen > 0, "blockLen must be positive")
    val keyed = records.select(col(idCol).cast("long").as("id"),
      col(keyCol).cast("string").as("k"))
    // two blocking passes: prefix block and suffix block of the key
    val prefixed = keyed.select(col("id"), col("k"),
      substring(col("k"), 1, blockLen).as("blk"))
    val suffixed = keyed.select(col("id"), col("k"),
      expr(s"substring(k, greatest(length(k) - ${blockLen - 1}, 1))").as("blk"))
    val blocked = prefixed.unionAll(suffixed)
    // candidates: same block, canonical order, length guard (necessary
    // condition for edit distance <= maxDist) BEFORE the quadratic scorer
    val a = blocked.as("a")
    val b = blocked.as("b")
    val candidates = a.join(b,
        col("a.blk") === col("b.blk") &&
          col("a.id") < col("b.id") &&
          abs(length(col("a.k")) - length(col("b.k"))) <= maxDist)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.k").as("k_a"), col("b.k").as("k_b"))
      .distinct() // a pair sharing prefix AND suffix blocks scores once
    // thresholded levenshtein: banded O(len·maxDist) DP with early exit
    // (returns -1 past the bound) instead of the full O(len²) table — the
    // scorer's cost is linear in the edit budget, not the key length
    candidates
      .select(col("id_a"), col("id_b"),
        levenshtein(col("k_a"), col("k_b"), maxDist).as("dist"))
      .filter(col("dist") >= 0)
  }

  /** Two-table fuzzy lookup — the record-linkage shape proper: match each
    * left record against a reference dictionary (master data, canonical
    * titles, a gazetteer) and keep the single BEST match within
    * `maxDist`, ties broken by the lower right id. Same prefix+suffix
    * blocking and length guard as [[fuzzySelfJoin]]; the per-left argmin
    * is a window over the (small) surviving candidate set, partitioned by
    * left id — never the corpus.
    *
    * Returns (left id, right id, left key, right key, dist) — one row per
    * MATCHED left record; unmatched records simply don't appear (left-join
    * the result back for a match-rate audit).
    */
  def fuzzyLookup(left: DataFrame, right: DataFrame,
      leftId: String, leftKey: String, rightId: String, rightKey: String,
      maxDist: Int, blockLen: Int = 8): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    require(blockLen > 0, "blockLen must be positive")
    def blocked(df: DataFrame, idCol: String, keyCol: String, side: String) = {
      val keyed = df.select(col(idCol).cast("long").as(s"${side}_id"),
        col(keyCol).cast("string").as(s"${side}_k"))
      keyed.select(col(s"${side}_id"), col(s"${side}_k"),
          substring(col(s"${side}_k"), 1, blockLen).as("blk"))
        .unionAll(keyed.select(col(s"${side}_id"), col(s"${side}_k"),
          expr(s"substring(${side}_k, greatest(length(${side}_k) - ${blockLen - 1}, 1))")
            .as("blk")))
    }
    val candidates = blocked(left, leftId, leftKey, "l")
      .join(blocked(right, rightId, rightKey, "r"),
        Seq("blk"))
      .filter(abs(length(col("l_k")) - length(col("r_k"))) <= maxDist)
      .select(col("l_id"), col("r_id"), col("l_k"), col("r_k"))
      .distinct()
      // banded thresholded scorer — see fuzzySelfJoin
      .select(col("l_id"), col("r_id"), col("l_k"), col("r_k"),
        levenshtein(col("l_k"), col("r_k"), maxDist).as("dist"))
      .filter(col("dist") >= 0)
    candidates
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("l_id"))
          .orderBy(col("dist"), col("r_id"))))
      .filter(col("rn") === 1)
      .select(col("l_id"), col("r_id"), col("l_k"), col("r_k"), col("dist"))
  }
}
