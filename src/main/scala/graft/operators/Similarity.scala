package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`):
  * brute-force cosine top-k as the exact baseline, and a bit-sampled
  * (sign-random-hyperplane flavored) LSH bucketing as the scale path.
  *
  * All vector math is built from higher-order functions
  * (`zip_with`/`transform`/`aggregate`) — codegen'd, no UDF, and the
  * sequential left-fold makes the double arithmetic deterministic (the
  * property the DuckDB oracle relies on).
  */
object Similarity {

  /** The ANN family's shared top-k tail: rank within `partCol` by
    * (`simCol` desc, `tieCol` asc) and keep rk <= k — ONE definition so
    * the ranking convention (row_number, deterministic id tie-break)
    * cannot drift between the seven entry points that all end this way. */
  private def topK(scored: DataFrame, partCol: String, simCol: String,
      tieCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(partCol)).orderBy(col(simCol).desc, col(tieCol))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }


  /** Sequential-fold dot product of two float arrays in double space —
    * native codegen expression (see [[graft.functions.DotProductFloat]]);
    * bit-identical to the HOF `aggregate(zip_with(...))` form. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot_f(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity rounded to 6 decimals (rounding pins engine-portable
    * comparisons; raw doubles agree to ~1e-15 anyway). */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  /** Exact top-k neighbors for each query vector. The query set is
    * broadcast (it is small by construction); candidates stream partition-
    * local, so the only shuffle is the per-query top-k window over
    * #queries × #corpus scored rows. At 100 TB-scale corpora, score+filter
    * stays embarrassingly parallel; the window shuffles only k×queries
    * survivors if preceded by a partial top-k — which AQE's local limit
    * already approximates. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cn = corpus.select(col(idCol), col(vecCol), norm(col(vecCol)).as("cnrm"))
    val scored = cn.alias("c").join(
        broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
          norm(col(vecCol)).as("qnrm"))),
        col("query_id") =!= col(s"c.$idCol"))
      .select(
        col("query_id"), col(s"c.$idCol").as("neighbor_id"),
        round(dot(col("qvec"), col(s"c.$vecCol")) / (col("qnrm") * col("cnrm")), 6).as("cos_sim"))
    topK(scored, "query_id", "cos_sim", "neighbor_id", k)
  }

  /** Hard-negative mining for contrastive training: for each anchor, the
    * top-k most cosine-similar corpus vectors carrying a DIFFERENT label —
    * high-similarity cross-label examples are exactly the negatives a
    * contrastive objective learns most from (cf. the cyclic-walk easy
    * negatives in ExtensionQueries.x43NegativeSampling — this is the
    * ANN-shaped hard counterpart).
    *
    * Scale shape mirrors [[bruteForceTopK]]: the anchor set broadcasts (it
    * is a small sample by construction), the corpus streams partition-local
    * through score+filter, and only the per-anchor top-k window shuffles.
    * For a billion-vector corpus swap the scoring join for [[lshTopK]]'s
    * bucketed candidates and keep the label filter — same contract. */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val cn = corpus.select(col(idCol), col(vecCol), col(labelCol),
      norm(col(vecCol)).as("cnrm"))
    // NULL-safe label inequality: NULL is treated as a label of its own —
    // a NULL-labeled corpus vector IS a negative for any labeled anchor
    // (and vice versa), and two NULLs are the same label. Plain =!= is
    // null-rejecting and silently dropped every NULL-labeled row from
    // both sides — an anchor with an unlabeled corpus half lost those
    // negatives with no error.
    val scored = cn.alias("c").join(
        broadcast(anchors.select(col(idCol).as("anchor_id"), col(vecCol).as("qvec"),
          col(labelCol).as("anchor_label"), norm(col(vecCol)).as("qnrm"))),
        !(col("anchor_label") <=> col(s"c.$labelCol")))
      .select(
        col("anchor_id"), col(s"c.$idCol").as("neg_id"),
        col(s"c.$labelCol").as("neg_label"),
        round(dot(col("qvec"), col(s"c.$vecCol")) / (col("qnrm") * col("cnrm")), 6).as("cos_sim"))
    topK(scored, "anchor_id", "cos_sim", "neg_id", k)
  }

  /** md5-derived component index per LSH bit — public so oracle SQL can be
    * generated from the same constants. */
  def lshComponents(nBits: Int, dim: Int): Seq[Int] =
    (0 until nBits).map(b => (java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s"graft_plane_$b").substring(0, 8), 16) % dim).toInt)

  /** Deterministic sign-LSH bucket per vector: bit b = sign of component
    * picked by md5(b) (a degenerate-but-deterministic hyperplane — no RNG,
    * so buckets are reproducible across engines and runs). Vectors sharing
    * a bucket are ANN candidates. */
  def lshBucket(vecCol: Column, nBits: Int, dim: Int): Column = {
    // 1L << b wraps mod 64 past bit 63 (Java shift semantics), so bit 64
    // would alias bit 0 and distinct sign patterns would silently share
    // buckets — fail loudly instead
    require(nBits >= 1 && nBits <= 63,
      s"lshBucket: nBits must be in [1, 63] (bucket is one signed long), got $nBits")
    lshComponents(nBits, dim).zipWithIndex.map { case (component, b) =>
      when(element_at(vecCol, component + 1) >= 0f, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** ANN top-k via LSH buckets: score only within-bucket candidates, then
    * per-query top-k. `probes` > 1 turns on multi-probe: each query also
    * searches the buckets at Hamming distance 1 from its own (bit flips),
    * recovering most of the recall lost to boundary effects for a probes×
    * candidate-cost increase — the standard LSH recall/cost dial. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, nBits: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding", probes: Int = 1): DataFrame = {
    val cb = corpus.withColumn("bucket", lshBucket(col(vecCol), nBits, dim))
    val baseQ = queries.withColumn("bucket", lshBucket(col(vecCol), nBits, dim))
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"), col("bucket"))
    val qb =
      if (probes <= 1) baseQ
      else baseQ
        .withColumn("bucket", explode(array(
          col("bucket") +: (0 until (probes - 1).min(nBits)).map(b =>
            col("bucket").bitwiseXOR(lit(1L << b))): _*)))
    val scored = cb.alias("c").join(broadcast(qb), Seq("bucket"))
      .filter(col("query_id") =!= col(s"c.$idCol"))
      .select(col("query_id"), col(s"c.$idCol").as("neighbor_id"),
        cosine(col("qvec"), col(s"c.$vecCol")).as("cos_sim"))
    topK(scored, "query_id", "cos_sim", "neighbor_id", k)
  }

  /** LSH-bucketed near-duplicate pairs — the scale path for [[nearDupPairs]]:
    * pair enumeration happens only within sign-LSH buckets, so corpus-wide
    * cost is linear in Σ bucket² instead of n². Recall trades against
    * bucket count exactly like the dedup LSH; semantics (bucketed, not
    * exhaustive) are deterministic and oracle-checkable. */
  def nearDupPairsLsh(corpus: DataFrame, threshold: Double, nBits: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val n = corpus.select(col(idCol), col(vecCol), norm(col(vecCol)).as("nrm"),
      lshBucket(col(vecCol), nBits, dim).as("bucket"))
    n.alias("a").join(n.alias("b"),
        col("a.bucket") === col("b.bucket") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        round(dot(col(s"a.$vecCol"), col(s"b.$vecCol")) /
          (col("a.nrm") * col("b.nrm")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** Nearest centroid per vector (spherical assignment): broadcast the k
    * centroids, score partition-local, keep the top `probes` centroids per
    * vector. Ties break on rounded cosine then centroid id — fully
    * deterministic, which the cross-engine oracle requires. */
  def nearestCentroids(df: DataFrame, centroids: DataFrame, probes: Int,
      idCol: String, vecCol: String): DataFrame = {
    // the vector norm is projected BEFORE the centroid cross join, so the
    // dim-length fold runs once per VECTOR (n rows), not once per
    // (vector, centroid) pair — k-fold redundant work otherwise, and
    // trainCentroids multiplies it again by `iterations`
    val scored = df.withColumn("__vnrm", norm(col(vecCol)))
      .join(broadcast(
        centroids.select(col("centroid_id"), col("cvec"), norm(col("cvec")).as("__cnrm"))))
      .withColumn("__csim", round(dot(col(vecCol), col("cvec")) /
        (col("__vnrm") * col("__cnrm")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__csim").desc, col("centroid_id"))
    scored.withColumn("__rk", row_number().over(w)).filter(col("__rk") <= probes)
      .select(df.columns.map(col) :+ col("centroid_id").as("cluster"): _*)
  }

  /** Deterministic spherical k-means (Lloyd's) as pure DataFrame ops:
    * seed = first k vectors by id, then `iterations` rounds of
    * assign-nearest → per-cluster mean. Exactness strategy (the DuckDB
    * oracle replays training bit-for-bit): components are scaled to
    * micro-units and summed as BIGINT — an order-independent exact sum,
    * immune to float reduction order across partitions — and the mean is
    * truncated back to FLOAT.
    *
    * Scale shape: each iteration is one broadcast join (corpus × k) plus a
    * (cluster, dim)-keyed partial-aggregated shuffle of n·dim longs; at
    * 100 TB you train on a sampled slice (caller passes the sample) and
    * assign the full corpus once with the final centroids. */
  def trainCentroids(corpus: DataFrame, nCentroids: Int, iterations: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val seeds = corpus.orderBy(col(idCol)).limit(nCentroids)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("cvec"))
    var centroids = seeds
    for (_ <- 1 to iterations) {
      val assigned = nearestCentroids(corpus, centroids, probes = 1, idCol, vecCol)
      val updated = assigned
        .select(col("cluster"), posexplode(col(vecCol)).as(Seq("pos", "comp")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(round(col("comp").cast("double") * 1e6).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .withColumn("m", (col("s").cast("double") / (col("n").cast("double") * 1e6)).cast("float"))
        .groupBy(col("cluster"))
        .agg(expr("transform(sort_array(collect_list(struct(pos, m))), x -> x.m)").as("cvec"))
        .select(col("cluster").as("centroid_id"), col("cvec"))
      centroids = updated
    }
    // A cluster that receives no vectors in some round (possible whenever
    // seeds duplicate: ties all break to the lower centroid_id, starving
    // the higher seed) must not silently SHRINK the codebook — downstream
    // IVF/PQ/semantic-dedup would run with fewer cells than requested and
    // no error. Backfill is done ONCE after the loop, from the seeds: any
    // centroid id the final round dropped returns with its seed vector.
    // Structure matters — a per-round carry-forward references the
    // round's plan (the whole corpus assignment) twice and re-executes it
    // (same-day solo A/Bs: x29 1.55s baseline vs 2.70 for the in-loop
    // union form, 4.64 for an eager per-round checkpoint); the final
    // seed-backfill is one k-row join OUTSIDE the loop, free by
    // comparison, at the cost of returning the seed rather than the
    // last-refined value for a starved cell — a valid (and deterministic)
    // empty-cluster convention, since any member-less cell is arbitrary.
    seeds.alias("s")
      .join(centroids.alias("t"), Seq("centroid_id"), "left_outer")
      .select(col("centroid_id"),
        coalesce(col("t.cvec"), col("s.cvec")).as("cvec"))
  }

  /** IVF ANN: k-means-trained centroids (deterministic Lloyd's, see
    * [[trainCentroids]]); vectors are assigned once to their nearest
    * centroid, a query probes its `probes` nearest centroids' clusters
    * (the standard IVF nprobe recall/cost dial). One broadcast of k
    * centroids, assignment is partition-local, and the probe join touches
    * probes/k of the corpus per query in expectation. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nCentroids: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      iterations: Int = 2, probes: Int = 1): DataFrame = {
    val centroids = trainCentroids(corpus, nCentroids, iterations, idCol, vecCol)
      // consumed by both assignment passes below; deliberately NOT
      // unpersisted here — the returned frame is lazy over it, so release
      // is the caller's (the bench's clearState / Scratch.seal both do).
      // The cached frame is nCentroids rows, KB-bounded.
      .persist()
    val assigned = nearestCentroids(corpus, centroids, probes = 1, idCol, vecCol)
      .select(col(idCol), col(vecCol), norm(col(vecCol)).as("cnrm"), col("cluster"))
    val probed = nearestCentroids(queries, centroids, probes, idCol, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        norm(col(vecCol)).as("qnrm"), col("cluster"))
    val scored = assigned.alias("c").join(broadcast(probed), Seq("cluster"))
      .filter(col("query_id") =!= col(s"c.$idCol"))
      .select(col("query_id"), col(s"c.$idCol").as("neighbor_id"),
        round(dot(col("qvec"), col(s"c.$vecCol")) / (col("qnrm") * col("cnrm")), 6).as("cos_sim"))
    // probes > 1: the same neighbor can surface via two clusters — dedup
    // only then (for probes=1 the extra shuffle would be pure cost).
    val deduped = if (probes > 1) scored.distinct() else scored
    topK(deduped, "query_id", "cos_sim", "neighbor_id", k)
  }

  /** Semantic (embedding-space) dedup: cluster the corpus with the
    * deterministic k-means of [[trainCentroids]], keep one canonical
    * representative per cluster (lowest id — stable across runs and
    * engines), and flag the rest as semantic duplicates. This is the
    * coarse-grained companion to the pairwise near-dup operators: where
    * [[nearDupPairsLsh]] finds near-identical vectors, cluster-canonical
    * dedup thins REDUNDANT REGIONS of embedding space — the diversity
    * lever of corpus curation (SemDeDup-style). Cost at scale: train on a
    * sample, then one broadcast-assign pass over the corpus and a
    * cluster-keyed window — no pairwise joins anywhere. Returns
    * (idCol, cluster, canonical_id, is_kept) — one row per vector. */
  def semanticDedup(corpus: DataFrame, nCentroids: Int, iterations: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = trainCentroids(corpus, nCentroids, iterations, idCol, vecCol)
    val assigned = nearestCentroids(corpus, centroids, probes = 1, idCol, vecCol)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cluster"))
    assigned
      .withColumn("canonical_id", min(col(idCol)).over(w))
      .select(col(idCol), col("cluster"),
        col("canonical_id"), (col(idCol) === col("canonical_id")).as("is_kept"))
  }

  /** Symmetric per-vector int8 quantization: each component maps to
    * round(x / max|x| · 127) ∈ [-127, 127]. 4× smaller vectors — at
    * 100 TB the scan is memory-bandwidth-bound, so quantization is the
    * standard first scale lever before any indexing. Stored as FLOAT so the
    * codegen dot product is reused; every value is an exact small integer,
    * which keeps the arithmetic (and the DuckDB oracle) exact. */
  def quantize(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    df.select(col(idCol),
        greatest(array_max(transform(col(vecCol), x => abs(x.cast("double")))), lit(1e-30)).as("__s"),
        col(vecCol))
      .select(col(idCol),
        transform(col(vecCol), x => round(x.cast("double") / col("__s") * 127).cast("int"))
          .cast("array<float>").as("qvec"))

  /** Brute-force top-k over int8-quantized vectors: the cheap re-rankable
    * first pass (quantized cosine orders candidates almost identically to
    * full precision — pinned by the recall spec). */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cq = quantize(corpus, idCol, vecCol)
      .select(col(idCol), col("qvec"), norm(col("qvec")).as("cnrm"))
    val qq = quantize(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("qvec").as("qvec_q"), norm(col("qvec")).as("qnrm"))
    val scored = cq.alias("c").join(broadcast(qq), col("query_id") =!= col(s"c.$idCol"))
      .select(col("query_id"), col(s"c.$idCol").as("neighbor_id"),
        round(dot(col("qvec_q"), col(s"c.qvec")) / (col("qnrm") * col("cnrm")), 6).as("qcos_sim"))
    topK(scored, "query_id", "qcos_sim", "neighbor_id", k)
  }

  /** Product quantization codebooks: the vector is split into `m`
    * contiguous subspaces and each subspace gets its own deterministic
    * k-means codebook ([[trainCentroids]] over the slice). Returns
    * (subspace → codebook) pairs; codebooks are small (m × nCentroids
    * short vectors) and broadcast everywhere they are used. */
  def pqTrain(corpus: DataFrame, m: Int, dim: Int, nCentroids: Int, iterations: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[(Int, DataFrame)] = {
    require(dim % m == 0, s"dim $dim must be divisible by m $m")
    val sub = dim / m
    // lazy: each codebook is a (small) plan over the corpus slice; the m
    // sub-plans evaluate concurrently as broadcast exchanges when consumed
    (0 until m).map { s =>
      val sliced = corpus.select(col(idCol), slice(col(vecCol), s * sub + 1, sub).as(vecCol))
      s -> trainCentroids(sliced, nCentroids, iterations, idCol, vecCol)
    }
  }

  /** PQ encode: one (id, subspace, code) row per vector and subspace —
    * the narrow relational spelling of the packed code array (m bytes per
    * vector at nCentroids ≤ 256: a 64-float embedding compresses 64×). */
  def pqEncode(corpus: DataFrame, codebooks: Seq[(Int, DataFrame)], m: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sub = dim / m
    codebooks.map { case (s, cents) =>
      nearestCentroids(
          corpus.select(col(idCol), slice(col(vecCol), s * sub + 1, sub).as(vecCol)),
          cents, probes = 1, idCol, vecCol)
        .select(col(idCol), lit(s).as("subspace"), col("cluster").as("code"))
    }.reduce(_ unionByName _)
  }

  /** PQ ANN top-k by asymmetric distance computation (ADC): each query
    * precomputes one partial-dot entry per (subspace, centroid) — an
    * m×nCentroids lookup table, broadcast — and a candidate's score is the
    * SUM of its codes' table entries, normalized by the query norm and the
    * reconstructed-vector norm (Σ‖c‖²). Per-subspace partial dots are
    * scaled to BIGINT micro-units before the sum, so the aggregation is
    * exact and order-independent — the same determinism device as the
    * k-means training, which is what lets DuckDB replay the entire
    * pipeline (training + encoding + ADC) bit-for-bit.
    *
    * Scale shape: training/encoding is the IVF cost paid once; a query
    * then never touches the float vectors — the scan reads m small ints
    * per candidate (the memory-bandwidth win PQ exists for), one
    * partial-aggregated shuffle of (query, vec) sums, top-k window. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, m: Int, dim: Int,
      nCentroids: Int = 16, iterations: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sub = dim / m
    val codebooks = pqTrain(corpus, m, dim, nCentroids, iterations, idCol, vecCol)
      // reused by encode + ADC tables; not unpersisted for the same
      // caller-owns-release reason as ivfTopK's centroids (m × nCentroids
      // rows, KB-bounded)
      .map { case (s, c) => s -> c.persist() }
    val codes = pqEncode(corpus, codebooks, m, dim, idCol, vecCol)
    val tables = codebooks.map { case (s, cents) =>
      queries.select(col(idCol).as("query_id"),
          slice(col(vecCol), s * sub + 1, sub).as("qsub"))
        .crossJoin(cents)
        .select(col("query_id"), lit(s).as("subspace"), col("centroid_id").as("code"),
          round(dot(col("qsub"), col("cvec")) * 1e6).cast("long").as("pdot_micro"),
          round(dot(col("cvec"), col("cvec")) * 1e6).cast("long").as("c2_micro"))
    }.reduce(_ unionByName _)
    val qn = queries.select(col(idCol).as("query_id"), norm(col(vecCol)).as("qnrm"))
    val scored = codes.join(broadcast(tables), Seq("subspace", "code"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("pdot_micro")).as("pd"), sum(col("c2_micro")).as("c2"))
      .join(broadcast(qn), Seq("query_id"))
      .filter(col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round((col("pd").cast("double") / 1e6) /
          (col("qnrm") * sqrt(col("c2").cast("double") / 1e6)), 6).as("pq_sim"))
    topK(scored, "query_id", "pq_sim", "neighbor_id", k)
  }

  /** Test/tooling observability for [[incrementalIvfTopK]]'s probe
    * pruning: (candidate files scanned, manifest total) of the most
    * recent probe. */
  @volatile var lastIvfScan: Option[(Int, Int)] = None

  /** Incrementally-maintained IVF index: the vector-side twin of
    * [[graft.operators.Dedup.incrementalDedup]]'s band index. Centroids
    * are trained ONCE (on the first batch — at 100 TB, on a sample) and
    * persisted; every later batch is assigned with the FROZEN centroids
    * and appended to a vectors table laid out by cluster
    * (`repartitionByRange` + sortWithin + per-file stats), so ingest cost
    * is ∝ batch — never ∝ index history — and the layout keeps each
    * file's cluster range tight for the probe-side file skipping below.
    * Re-training (index rebuild) is a deliberate, separate operation, as
    * in every production IVF deployment. */
  def incrementalIvfAppend(store: graft.tables.TableStore,
      centroidsTable: String, vectorsTable: String, batch: DataFrame,
      nCentroids: Int, iterations: Int, filesPerBatch: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val centroids =
      if (store.exists(centroidsTable)) store.read(centroidsTable)
      else {
        val c = trainCentroids(batch, nCentroids, iterations, idCol, vecCol)
        store.createOrReplace(centroidsTable, c)
        // read the COMMITTED centroids back: `c` is the unpersisted
        // i-iteration Lloyd's plan, and using it for the assignment below
        // would re-run the whole training a second time
        store.read(centroidsTable)
      }
    val assigned = nearestCentroids(batch, centroids, probes = 1, idCol, vecCol)
      .select(col(idCol), col(vecCol), col("cluster"))
      .repartitionByRange(filesPerBatch, col("cluster"))
    if (store.exists(vectorsTable)) store.append(vectorsTable, assigned)
    else store.createOrReplace(vectorsTable, assigned,
      sortWithin = Seq("cluster"), statsFor = Seq("cluster"))
  }

  /** Probe the incremental IVF index: queries pick their `probes` nearest
    * stored centroids, and the candidate scan is point-pruned to the
    * index files whose cluster range admits a probed cluster — on the
    * cluster-ranged layout [[incrementalIvfAppend]] writes, a probe
    * touches ~probes/nCentroids of each batch's files no matter how many
    * batches the index has accumulated. Queries broadcast; exact cosine
    * within candidates; per-query top-k. */
  def incrementalIvfTopK(store: graft.tables.TableStore,
      centroidsTable: String, vectorsTable: String, queries: DataFrame,
      k: Int, probes: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = store.read(centroidsTable)
    val probed = nearestCentroids(queries, centroids, probes, idCol, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        norm(col(vecCol)).as("qnrm"), col("cluster"))
    val (cand0, counts) = store.readPointPruned(vectorsTable,
      probed.select(col("cluster")), Seq("cluster"))
    lastIvfScan = Some(counts)
    // candidate norm projected BEFORE the query join: once per candidate
    // row, not once per (query, candidate) pair — the family convention
    // (bruteForceTopK/ivfTopK project cnrm on the corpus side)
    val cand = cand0.withColumn("cnrm", norm(col(vecCol)))
    val scored = cand.alias("c").join(broadcast(probed), Seq("cluster"))
      .filter(col("query_id") =!= col(s"c.$idCol"))
      .select(col("query_id"), col(s"c.$idCol").as("neighbor_id"),
        round(dot(col("qvec"), col(s"c.$vecCol")) /
          (col("qnrm") * col("cnrm")), 6).as("cos_sim"))
    // probes > 1: a neighbor can surface via two probed clusters
    val deduped =
      if (probes > 1) scored.dropDuplicates("query_id", "neighbor_id")
      else scored
    topK(deduped, "query_id", "cos_sim", "neighbor_id", k)
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold. Exact quadratic
    * form for oracle duty; bucket with [[lshBucket]] first at scale.
    * Norms are computed once per vector (n rows), not once per pair (n²):
    * the pair loop does only the dot product. */
  def nearDupPairs(corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // The nested-loop pair generation's parallelism is the STREAMED side's
    // partition count: a small corpus read from one parquet file would run
    // the whole n² dot-product loop in ONE task (measured: the 2M-pair
    // bench corpus is a single 780 KB file — one core busy, 31 idle).
    // Hash-repartition on the id (explicit width — AQE-exempt, and the
    // join's OUTPUT is the n² explosion AQE's input-sized coalescing
    // cannot see); the shuffle moves only (id, vec, norm) rows, linear in
    // the corpus this operator is documented small-corpus-only for.
    val parts = corpus.sparkSession.sparkContext.defaultParallelism
    val n = corpus.select(col(idCol), col(vecCol), norm(col(vecCol)).as("nrm"))
      .repartition(parts, col(idCol))
    n.alias("a").join(n.alias("b"), col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        round(dot(col(s"a.$vecCol"), col(s"b.$vecCol")) /
          (col("a.nrm") * col("b.nrm")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** One MMR-selected row: at `rank`, `vecId` maximized
    * relevance − max-similarity-to-already-selected. */
  final case class MmrPick(rank: Int, vecId: Long, relevance: Double,
      penalty: Double, score: Double)

  /** Maximal Marginal Relevance selection (Carbonell & Goldstein 1998):
    * greedily pick `k` corpus vectors maximizing
    *
    *   score(c) = rel(c) − max_{s ∈ selected} sim(c, s)
    *
    * (equal-weight MMR — λ = ½ up to an argmax-preserving ×2) — the
    * diversity-aware retrieval used to assemble demonstration/eval sets
    * without near-duplicate picks. `rel` and `sim` are cosines rounded to
    * 6 decimals (the engine-portable convention of the whole ANN family),
    * ties broken by id, so selection is deterministic and the DuckDB
    * oracle replays every pick.
    *
    * Scale shape: each of the k steps is ONE corpus-linear codegen
    * projection (the ≤ k selected vectors ride the plan as literals — the
    * penalty is a `greatest` over k dot products, no join, no shuffle)
    * followed by TakeOrderedAndProject(1); driver state is k rows. At
    * billion-vector scale, pre-filter candidates with [[lshTopK]] and run
    * the same k steps over the bounded pool — identical contract.
    *
    * Degenerate inputs: a `queryId` absent from the corpus throws a
    * descriptive IllegalArgumentException; `k` exceeding the candidate
    * pool (k > corpus − 1) returns the picks gathered when the pool
    * drains, never a mid-selection crash. */
  def mmrSelect(corpus: DataFrame, queryId: Long, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[MmrPick] = {
    require(k > 0, "k must be positive")
    val cn = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        norm(col(vecCol)).as("nrm"))
    val q = cn.filter(col("id") === queryId).limit(1).collect().headOption
      .getOrElse(throw new IllegalArgumentException(
        s"mmrSelect: query vector $idCol=$queryId not found in the corpus"))
    val (qv, qn) = (q.getSeq[Float](1), q.getDouble(2))
    // zero-norm contract: cosine with a zero-norm side is defined as 0.0.
    // Under Spark 4's default ANSI mode a plain `/` RAISES on the zero
    // divisor (non-ANSI yields NULL, which then NPEs the driver-side
    // getDouble) — either way the documented no-mid-selection-crash
    // promise broke; try_divide + coalesce pins the 0.0 contract in both
    // modes
    val rel = cn.filter(col("id") =!= queryId)
      .select(col("id"), col("v"), col("nrm"),
        coalesce(
          round(try_divide(dot(typedLit(qv), col("v")), lit(qn) * col("nrm")), 6),
          lit(0.0)).as("rel"))
    val picks = scala.collection.mutable.ArrayBuffer.empty[(MmrPick, Seq[Float], Double)]
    var r = 1
    var drained = false
    while (r <= k && !drained) {
      val pen: Column =
        if (picks.isEmpty) lit(0.0)
        else {
          val sims = picks.toSeq.map { case (_, sv, snrm) =>
            coalesce(
              round(try_divide(dot(typedLit(sv), col("v")), lit(snrm) * col("nrm")), 6),
              lit(0.0)) // zero-norm side → similarity 0, same contract as rel
          }
          if (sims.length == 1) sims.head else greatest(sims: _*)
        }
      rel.filter(!col("id").isin(picks.toSeq.map(_._1.vecId): _*))
        .select(col("id"), col("v"), col("nrm"), col("rel"), pen.as("pen"),
          (col("rel") - pen).as("score"))
        .orderBy(col("score").desc, col("id"))
        .limit(1).collect().headOption match {
        case None =>
          // k exceeded the candidate pool (k > corpus − 1): return the
          // picks gathered so far instead of crashing mid-selection
          drained = true
        case Some(top) =>
          picks += ((MmrPick(r, top.getLong(0), top.getDouble(3),
            top.getDouble(4), top.getDouble(5)),
            top.getSeq[Float](1), top.getDouble(2)))
          r += 1
      }
    }
    picks.toSeq.map(_._1)
  }
}
