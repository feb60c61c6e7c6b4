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
    * Score, tie and partition values must be NON-NULL: the histogram
    * joins back on (partCols, bucket) equi-keys, and a null key would
    * silently drop its rows instead of ranking them first the way the
    * window equivalent does (enforced below — a null score fails fast
    * rather than losing rows).
    */
  def rank(df: DataFrame, partCols: Seq[String], scoreCol: String,
      tieCol: String, bucket: Option[Column => Column] = None,
      rankName: String = "rank", totalName: Option[String] = None): DataFrame = {
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
    val hist = bucketed.groupBy((part :+ col(bktCol)): _*)
      .agg(count(lit(1)).as("__hr_c"))
    val below0 = hist.withColumn("__hr_below", coalesce(
        sum(col("__hr_c")).over(Window.partitionBy(part: _*)
          .orderBy(col(bktCol)).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val below = totalName.fold(below0) { n =>
      below0.withColumn(n,
        sum(col("__hr_c")).over(Window.partitionBy(part: _*)))
    }.drop("__hr_c")
    // when the bucket IS the score, the score is constant within a tie
    // partition — ordering by the tie column alone is the same order and
    // keeps the window's sort key minimal
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
  }
}
