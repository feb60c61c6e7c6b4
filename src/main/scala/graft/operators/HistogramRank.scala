package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group rank WITHOUT a per-group sort — the shape that keeps
  * `row_number().over(partitionBy(lowCardinalityCol))` out of corpus-sized
  * plans (x101 percentiles, x107 quotas). A window partitioned by a
  * low-cardinality column funnels every row of a group through ONE task;
  * at 100 TB that is a single-executor sort of billions of rows, the
  * textbook window scale-killer.
  *
  * The fix is two-level: bucket every row by a monotone function of its
  * score, build the per-(group, bucket) count histogram (bounded by
  * bucket cardinality, not row count), take a cumulative count over THAT
  * frame, and join it back: a row's exact global rank within its group is
  * `rows-in-lower-buckets + rank-within-its-bucket`. The only row-data
  * windows partition by (group, bucket) — fine-grained by construction —
  * and the result is bit-identical to the single-window rank.
  *
  * Bucketing choices: the score itself when its value cardinality is
  * bounded (x101's micro-unit qualities), or the top bits of a uniform
  * hash when it isn't (x107's md5 order, [[hashBuckets]]).
  */
object HistogramRank {

  /** Keep-the-top-bits bucketing for uniformly-distributed non-negative
    * long scores (hashes): monotone by construction; for a `w`-bit hash,
    * `shift = w - b` yields 2^b buckets. */
  def hashBuckets(shift: Int): Column => Column =
    s => shiftright(s, shift)

  /** Adds `rankName`: the 1-based rank of each row within its
    * `partCols` group under ascending (`scoreCol`, `tieCol`) order —
    * equal to `row_number().over(partitionBy(partCols).orderBy(score,
    * tie))` but with no per-group sort. `bucket` must be monotone
    * non-decreasing in the score; `None` buckets by the score value
    * itself (exact histogram — right when score cardinality is bounded).
    * `totalName` additionally emits the group's row count (it rides the
    * same histogram window pass — percentile denominators come free).
    *
    * `tieBuckets` closes the residual skew of the exact-histogram mode:
    * there the per-row window partitions by (part, score), so a
    * massively-tied score value — a corpus where quality quantizes to 0
    * for most docs — funnels that ONE tie group through a single task.
    * With `tieBuckets = Some(t)` the same histogram trick recurses one
    * level: each (part, score) group's LONG tie values are range-split
    * into ~t sub-buckets of width `(max-min) div t + 1` (integer
    * division of a shifted tie is monotone in the tie, so order is
    * preserved exactly), a second bounded histogram cumulates rows in
    * lower sub-buckets, and the only per-row window partitions by
    * (part, score, sub-bucket) — 1/t of the worst tie group. Costs one
    * extra map-side-combined aggregation pass; the min/max rides the
    * first histogram for free. Requires a long-castable tie column whose
    * ties order NUMERICALLY (by their long cast — the same order the
    * sub-bucket boundaries follow; for integral tie columns this is the
    * native order, bit-identical to the un-sub-bucketed mode), and
    * applies only to `bucket = None` (with a hash bucket, rows inside a
    * bucket order by (score, tie) — a tie-keyed split is not monotone in
    * that order; hash-bucket tie groups are hash collisions, already
    * tiny). Sub-buckets are range-uniform, not count-uniform: ties
    * clustered in a narrow value range split perfectly (width ≥ 1 keeps
    * distinct values apart), adversarial clustering at two far ends of
    * the long range degrades toward the unsplit case — one more
    * recursion level would fix that, realistic id spaces don't need it.
    *
    * Score, tie and partition values must be NON-NULL: the histogram
    * joins back on (partCols, bucket) equi-keys, and a null key would
    * silently drop its rows instead of ranking them first the way the
    * window equivalent does (enforced below — a null score fails fast
    * rather than losing rows).
    */
  def rank(df: DataFrame, partCols: Seq[String], scoreCol: String,
      tieCol: String, bucket: Option[Column => Column] = None,
      rankName: String = "rank", totalName: Option[String] = None,
      tieBuckets: Option[Int] = None): DataFrame = {
    require(tieBuckets.forall(_ > 1), "tieBuckets must be at least 2")
    require(tieBuckets.isEmpty || bucket.isEmpty,
      "tieBuckets applies to the exact-histogram mode only (bucket = None)")
    val part = partCols.map(col)
    // fail fast on a null key instead of silently dropping the row in the
    // equi-join: raise_error rides the bucketing projection (no extra pass)
    val guarded = df.withColumn(scoreCol,
      when((part :+ col(scoreCol)).map(_.isNull).reduce(_ || _),
        raise_error(lit(s"HistogramRank: null in ($scoreCol" +
          partCols.mkString(", ", ", ", "") + ") — null keys cannot rank")))
        .otherwise(col(scoreCol)))
    val (bucketed, bktCol) = bucket match {
      case Some(f) => (guarded.withColumn("__hr_bkt", f(col(scoreCol))), "__hr_bkt")
      case None => (guarded, scoreCol)
    }
    // tie min/max (for the sub-bucket width) ride the same histogram agg
    val histAggs = count(lit(1)).as("__hr_c") +: tieBuckets.toSeq.flatMap(_ =>
      Seq(min(col(tieCol).cast("long")).as("__hr_tmin"),
        max(col(tieCol).cast("long")).as("__hr_tmax")))
    val hist = bucketed.groupBy((part :+ col(bktCol)): _*)
      .agg(histAggs.head, histAggs.tail: _*)
    val below0 = hist.withColumn("__hr_below", coalesce(
        sum(col("__hr_c")).over(Window.partitionBy(part: _*)
          .orderBy(col(bktCol)).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val below = totalName.fold(below0) { n =>
      below0.withColumn(n,
        sum(col("__hr_c")).over(Window.partitionBy(part: _*)))
    }.drop("__hr_c")
    tieBuckets match {
      case None =>
        // when the bucket IS the score, the score is constant within a tie
        // partition — ordering by the tie column alone is the same order
        // and keeps the window's sort key minimal
        val tieOrder = bucket match {
          case Some(_) => Seq(col(scoreCol), col(tieCol))
          case None => Seq(col(tieCol))
        }
        bucketed
          .withColumn("__hr_tie", row_number().over(
            Window.partitionBy((part :+ col(bktCol)): _*).orderBy(tieOrder: _*)))
          .join(below, partCols :+ bktCol)
          .withColumn(rankName, col("__hr_below") + col("__hr_tie"))
          .drop("__hr_bkt", "__hr_tie", "__hr_below")
      case Some(tb) =>
        // range-split each tie group into ~tb sub-buckets; integer width
        // ≥ 1 so distinct tie values in a narrow range land in distinct
        // sub-buckets. Monotone in the tie by construction. Arithmetic is
        // divide-FIRST (quotient difference, never a raw span subtraction)
        // so full-range 64-bit ties cannot overflow — and the one residual
        // wrap is capped: for tb = 2 the quotient difference itself can
        // equal Long.MaxValue (tmin div 2 = -2^62, tmax div 2 = 2^62 - 1),
        // where + 1L would wrap width to Long.MinValue, greatest() would
        // collapse it to 1, and the tie - tmin subtraction would wrap —
        // silently wrong ranks. least(diff, MaxValue - 1) keeps the + 1L
        // in range; the capped width (MaxValue) still splits the full
        // 64-bit range into 3 monotone sub-buckets, and every division
        // below stays in [-1, 1] before subtraction.
        // A null (or not-long-castable) tie fails fast here: the sub-
        // bucket is a join key, and a null key would silently DROP the
        // row where the un-sub-bucketed plan merely sorted it first.
        val tieL = col(tieCol).cast("bigint")
        val widthSql = s"greatest(1L, least((__hr_tmax div ${tb}L) - " +
          s"(__hr_tmin div ${tb}L), ${Long.MaxValue - 1}L) + 1L)"
        val joined = bucketed.join(below, partCols :+ bktCol)
          .withColumn("__hr_tbkt",
            when(tieL.isNull, raise_error(lit(
              s"HistogramRank: $tieCol is null or not long-castable — " +
                "tieBuckets requires a non-null long-castable tie column"))
              .cast("bigint"))
            .otherwise(expr(
              s"(cast($tieCol as bigint) div $widthSql) - " +
                s"(__hr_tmin div $widthSql)")))
        // second-level histogram: rows of MY score in LOWER tie sub-buckets
        // (bounded by score-cardinality × tieBuckets, never corpus rows)
        val sub = joined.groupBy((part :+ col(bktCol) :+ col("__hr_tbkt")): _*)
          .agg(count(lit(1)).as("__hr_c2"))
          .withColumn("__hr_below2", coalesce(
            sum(col("__hr_c2")).over(
              Window.partitionBy((part :+ col(bktCol)): _*)
                .orderBy(col("__hr_tbkt"))
                .rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
          .drop("__hr_c2")
        // the within-sub-bucket order must agree with the sub-bucket
        // boundaries, which follow the tie's LONG cast — ordering by the
        // raw column would disagree for a long-castable but non-numeric
        // tie (string '9' sorts after '10') and produce ranks that differ
        // from the un-sub-bucketed mode. For integral tie columns the
        // native order IS the cast order, so the raw column sorts alone
        // (no redundant cast key in the window sort); otherwise the cast
        // leads and the raw column stays as a secondary key so cast-equal
        // raw-distinct ties stay deterministic.
        // resolve case-insensitively like col()/expr() do (StructType's
        // apply is case-sensitive and would reject a tie name the rest of
        // this function accepts); unresolvable → the safe cast-order path
        val integralTie = bucketed.schema.fields
          .find(_.name.equalsIgnoreCase(tieCol)).map(_.dataType).exists {
            case org.apache.spark.sql.types.LongType |
                 org.apache.spark.sql.types.IntegerType |
                 org.apache.spark.sql.types.ShortType |
                 org.apache.spark.sql.types.ByteType => true
            case _ => false
          }
        val tieOrder =
          if (integralTie) Seq(col(tieCol)) else Seq(tieL, col(tieCol))
        joined.join(sub, partCols ++ Seq(bktCol, "__hr_tbkt"))
          .withColumn("__hr_tie", row_number().over(
            Window.partitionBy((part :+ col(bktCol) :+ col("__hr_tbkt")): _*)
              .orderBy(tieOrder: _*)))
          .withColumn(rankName,
            col("__hr_below") + col("__hr_below2") + col("__hr_tie"))
          .drop("__hr_tbkt", "__hr_tie", "__hr_below", "__hr_below2",
            "__hr_tmin", "__hr_tmax")
    }
  }
}
