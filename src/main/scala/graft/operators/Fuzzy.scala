package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * blocks is scored once.
  *
  * Hot-block bound: candidate generation is quadratic PER BLOCK, so one
  * boilerplate prefix ("Copyright 20…", "The quick…") at corpus scale
  * would make a single block's pair count explode. Block sizes are
  * therefore pre-counted (one cheap map-side-combined agg on the same
  * key the candidate join shuffles on) and blocks over `maxBlock` rows
  * never enter the quadratic join; their member rows are REROUTED to a
  * third blocking pass on a mid-string window (an edit budget that
  * spares neither end usually spares the middle, and boilerplate heads/
  * tails tend to diverge mid-string). A block still hot under the mid
  * window is dropped from candidate generation — never silently:
  * [[Fuzzy.lastBlockStats]] records blocks/hot/rerouted/dropped counts
  * and the surviving pair-count bound for every run, the observability
  * hook a production run alerts on. On a corpus where no block exceeds
  * the cap the result is bit-identical to the uncapped two-pass plan
  * (the sf oracles pin this).
  */
object Fuzzy {

  /** Diagnosis record for the most recent blocking run on this JVM:
    * block counts per pass, hot-block MEMBERSHIPS rerouted to the
    * mid-string pass (a row hot in both its prefix and suffix block
    * reroutes once per hot block — mid windows are scoped per hot
    * block), memberships dropped because even their scoped mid window
    * stayed hot, and the sum of n·(n−1)/2 over surviving blocks — the
    * exact upper bound on candidate pairs entering the scorer. */
  final case class BlockStats(blocks: Long, maxBlockRows: Long, hotBlocks: Long,
      reroutedRows: Long, droppedRows: Long, candidatePairBound: Long)

  /** Stats of the most recent stats-collecting [[fuzzySelfJoin]]/
    * [[fuzzyLookup]] on this JVM — a single-run convenience for tests and
    * interactive use. Concurrent queries overwrite each other here; an
    * alert consumer that needs run-scoped stats uses the `WithStats`
    * variants, which return the reading WITH the frame it describes.
    * A `collectStats = false` run leaves this untouched (it measured
    * nothing, so it has nothing to overwrite). */
  @volatile var lastBlockStats: Option[BlockStats] = None

  private def prefixBlk(k: String, blockLen: Int) =
    substring(col(k), 1, blockLen)
  private def suffixBlk(k: String, blockLen: Int) =
    expr(s"substring($k, greatest(length($k) - ${blockLen - 1}, 1), $blockLen)")
  /** Centered mid-string window — the third pass hot-block rows reroute
    * to — SCOPED to the hot block the row came from: the composite
    * key `m:<hot blk>|<mid window>` pairs two rows in the mid pass
    * only when they (a) shared the hot block the uncapped plan would
    * have compared them in AND (b) agree mid-string. Without the
    * scope, rows from two DIFFERENT hot blocks sharing a mid window
    * would pair — pairs the uncapped two-pass plan never compares,
    * breaking the "capped ⊆ uncapped" soundness contract the property
    * suite pins. The `m:` tag also keeps the pass out of the
    * prefix/suffix namespace (those two share one namespace
    * deliberately: a prefix of one key matching a suffix of another
    * is a real agreement on the same characters; a mid window
    * matching a prefix is not). */
  private def midBlk(k: String, hotBlk: Column, blockLen: Int) =
    concat(lit("m:"), hotBlk, lit("|"),
      expr(s"substring($k, greatest((length($k) - $blockLen) div 2 + 1, 1), $blockLen)"))

  /** Split `blocked` (id, k, blk) into under-cap rows (ready for the
    * candidate join) and the mid-string reroute of hot-block rows,
    * returning the stats reading with the frame it describes. Shared by
    * self-join and lookup: the cap logic only looks at block keys, never
    * at which side a row is from.
    */
  private def capBlocks(blocked: DataFrame, keyCols: Seq[String],
      blockLen: Int, maxBlock: Int,
      collectStats: Boolean): (DataFrame, Option[BlockStats]) = {
    val sizes0 = blocked.groupBy(col("blk")).agg(count(lit(1)).as("bn"))
    // with stats on, the size tables serve TWO consumers — the eager
    // stats job below and the returned lazy plan — so they are persisted
    // across both (block-cardinality-bounded, tiny next to the corpus);
    // without the persist the whole blocking/count pass would run twice.
    // Lifecycle: the input-keyed [[graft.core.PinnedGenerations]] LRU — a
    // repeated call on the same inputs reuses the live size tables (the
    // previous single-slot evict-previous scheme released the entry a
    // repeated call had just registered, forcing a full rebuild); stats-
    // off runs stay fully lazy and persist nothing.
    val sizes =
      if (collectStats) graft.core.PinnedGenerations.persistPinned(sizes0)
      else sizes0
    val tagged = blocked.join(sizes, "blk")
    val ok = tagged.filter(col("bn") <= maxBlock).drop("bn")
    // hot-block MEMBERSHIPS (a row hot in both its prefix and suffix
    // block reroutes once per hot block — the mid window is scoped per
    // hot block, so the memberships stay distinct keys) — rerouted
    // through their hot-block-scoped mid-string window, which is itself
    // capped: a block hot even mid-string is dropped + reported
    val hotRows = tagged.filter(col("bn") > maxBlock)
      .select(keyCols.map(col) :+ col("blk").as("__hot_blk"): _*).distinct()
    val mid = hotRows.select(keyCols.map(col) :+
      midBlk(keyCols.last, col("__hot_blk"), blockLen).as("blk"): _*)
    val midSizes0 = mid.groupBy(col("blk")).agg(count(lit(1)).as("bn"))
    val midSizes =
      if (collectStats) graft.core.PinnedGenerations.persistPinned(midSizes0)
      else midSizes0
    val midTagged = mid.join(midSizes, "blk")
    val midOk = midTagged.filter(col("bn") <= maxBlock).drop("bn")
    // observability: one small job over the block-cardinality-bounded
    // size tables (map-side combined; never corpus-row-sized output).
    // The routing above is fully lazy — this driver-side job is the ONLY
    // eager work, so `collectStats = false` skips the blocking pass
    // entirely when the reading isn't being consumed (the cap itself
    // still applies; production keeps it on, it is the
    // no-silent-truncation alerting surface).
    if (!collectStats) return (ok.unionByName(midOk), None)
    graft.core.PinnedGenerations.pin(sizes, midSizes)
    val st = sizes.select(col("bn"), lit(0).as("pass"))
      .unionAll(midSizes.select(col("bn"), lit(1).as("pass")))
      .agg(count(lit(1)).as("blocks"),
        coalesce(max(col("bn")), lit(0L)).as("maxb"),
        coalesce(sum(when(col("bn") > maxBlock && col("pass") === 0, lit(1L))), lit(0L)).as("hot"),
        coalesce(sum(when(col("pass") === 1, col("bn"))), lit(0L)).as("rerouted"),
        coalesce(sum(when(col("bn") > maxBlock && col("pass") === 1, col("bn"))), lit(0L)).as("dropped"),
        coalesce(sum(when(col("bn") <= maxBlock,
          expr("bn * (bn - 1) div 2"))), lit(0L)).as("bound"))
      .head()
    (ok.unionByName(midOk), Some(BlockStats(
      blocks = st.getLong(0), maxBlockRows = st.getLong(1),
      hotBlocks = st.getLong(2), reroutedRows = st.getLong(3),
      droppedRows = st.getLong(4), candidatePairBound = st.getLong(5))))
  }

  /** Self-join `records` fuzzily on `key`: pairs (id_a < id_b) with
    * levenshtein(key_a, key_b) <= maxDist, discovered via prefix+suffix
    * blocking with block length `blockLen`; blocks over `maxBlock` rows
    * reroute through a mid-string pass (see object doc). Returns
    * (id_a, id_b, dist).
    *
    * Records whose key is shorter than `blockLen` share the whole-key
    * block (their prefix == suffix == key), so short strings still pair.
    */
  def fuzzySelfJoin(records: DataFrame, idCol: String, keyCol: String,
      maxDist: Int, blockLen: Int = 8, maxBlock: Int = 4096,
      collectStats: Boolean = true): DataFrame = {
    val (out, st) = fuzzySelfJoinWithStats(records, idCol, keyCol, maxDist,
      blockLen, maxBlock, collectStats)
    st.foreach(s => lastBlockStats = Some(s))
    out
  }

  /** [[fuzzySelfJoin]] returning the block-cap stats WITH the frame they
    * describe — the run-scoped form an alert consumer uses when queries
    * run concurrently (the [[lastBlockStats]] hook is last-writer-wins).
    * Stats are `None` iff `collectStats = false`. */
  def fuzzySelfJoinWithStats(records: DataFrame, idCol: String, keyCol: String,
      maxDist: Int, blockLen: Int = 8, maxBlock: Int = 4096,
      collectStats: Boolean = true): (DataFrame, Option[BlockStats]) = {
    require(maxDist >= 0, "maxDist must be non-negative")
    require(blockLen > 0, "blockLen must be positive")
    require(maxBlock > 1, "maxBlock must admit at least a pair")
    val keyed = records.select(col(idCol).cast("long").as("id"),
      col(keyCol).cast("string").as("k"))
    // two blocking passes: prefix block and suffix block of the key; the
    // suffix pass skips rows whose suffix equals their prefix (any key
    // shorter than blockLen) so no row enters a block twice — otherwise
    // the hot cap fires at maxBlock/2 true rows for whole-key blocks and
    // the stats double-count them
    val blocked = keyed.select(col("id"), col("k"), prefixBlk("k", blockLen).as("blk"))
      .unionAll(keyed
        .select(col("id"), col("k"), suffixBlk("k", blockLen).as("blk"))
        .filter(col("blk") =!= prefixBlk("k", blockLen)))
    val (capped, stats) =
      capBlocks(blocked, Seq("id", "k"), blockLen, maxBlock, collectStats)
    // candidates: same block, canonical order, length guard (necessary
    // condition for edit distance <= maxDist) BEFORE the quadratic scorer
    val a = capped.as("a")
    val b = capped.as("b")
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
    (candidates
      .select(col("id_a"), col("id_b"),
        levenshtein(col("k_a"), col("k_b"), maxDist).as("dist"))
      .filter(col("dist") >= 0), stats)
  }

  /** Two-table fuzzy lookup — the record-linkage shape proper: match each
    * left record against a reference dictionary (master data, canonical
    * titles, a gazetteer) and keep the single BEST match within
    * `maxDist`, ties broken by the lower right id. Same prefix+suffix
    * blocking, length guard, and hot-block cap as [[fuzzySelfJoin]] (the
    * cap counts a block's rows across BOTH sides — the candidate cost is
    * |L|·|R|, bounded by the total); the per-left argmin is a window over
    * the (small) surviving candidate set, partitioned by left id — never
    * the corpus.
    *
    * Returns (left id, right id, left key, right key, dist) — one row per
    * MATCHED left record; unmatched records simply don't appear (left-join
    * the result back for a match-rate audit).
    */
  def fuzzyLookup(left: DataFrame, right: DataFrame,
      leftId: String, leftKey: String, rightId: String, rightKey: String,
      maxDist: Int, blockLen: Int = 8, maxBlock: Int = 4096,
      collectStats: Boolean = true): DataFrame = {
    val (out, st) = fuzzyLookupWithStats(left, right, leftId, leftKey,
      rightId, rightKey, maxDist, blockLen, maxBlock, collectStats)
    st.foreach(s => lastBlockStats = Some(s))
    out
  }

  /** [[fuzzyLookup]] returning the block-cap stats WITH the frame they
    * describe — see [[fuzzySelfJoinWithStats]]. */
  def fuzzyLookupWithStats(left: DataFrame, right: DataFrame,
      leftId: String, leftKey: String, rightId: String, rightKey: String,
      maxDist: Int, blockLen: Int = 8, maxBlock: Int = 4096,
      collectStats: Boolean = true): (DataFrame, Option[BlockStats]) = {
    require(maxDist >= 0, "maxDist must be non-negative")
    require(blockLen > 0, "blockLen must be positive")
    require(maxBlock > 1, "maxBlock must admit at least a pair")
    // one shared blocked frame (side-tagged) so the hot-block cap sees a
    // block's TOTAL population — capping each side alone would admit a
    // 10 × 100k block (10^6 candidate pairs) through a per-side cap
    def sided(df: DataFrame, idCol: String, keyCol: String, side: String) = {
      val keyed = df.select(col(idCol).cast("long").as("id"),
        col(keyCol).cast("string").as("k"), lit(side).as("side"))
      // suffix pass skips suffix==prefix rows — see fuzzySelfJoin
      keyed.select(col("id"), col("k"), col("side"), prefixBlk("k", blockLen).as("blk"))
        .unionAll(keyed
          .select(col("id"), col("k"), col("side"), suffixBlk("k", blockLen).as("blk"))
          .filter(col("blk") =!= prefixBlk("k", blockLen)))
    }
    val blocked = sided(left, leftId, leftKey, "l")
      .unionAll(sided(right, rightId, rightKey, "r"))
    val (capped, stats) = capBlocks(blocked, Seq("id", "side", "k"),
      blockLen, maxBlock, collectStats)
    val candidates = capped.filter(col("side") === "l")
      .select(col("id").as("l_id"), col("k").as("l_k"), col("blk"))
      .join(capped.filter(col("side") === "r")
          .select(col("id").as("r_id"), col("k").as("r_k"), col("blk")),
        Seq("blk"))
      .filter(abs(length(col("l_k")) - length(col("r_k"))) <= maxDist)
      .select(col("l_id"), col("r_id"), col("l_k"), col("r_k"))
      .distinct()
      // banded thresholded scorer — see fuzzySelfJoin
      .select(col("l_id"), col("r_id"), col("l_k"), col("r_k"),
        levenshtein(col("l_k"), col("r_k"), maxDist).as("dist"))
      .filter(col("dist") >= 0)
    (candidates
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("l_id"))
          .orderBy(col("dist"), col("r_id"))))
      .filter(col("rn") === 1)
      .select(col("l_id"), col("r_id"), col("l_k"), col("r_k"), col("dist")), stats)
  }
}
