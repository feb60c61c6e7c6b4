package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over a batch or micro-batch —
  * the lakehouse pipeline-gate idiom (Delta Live Tables' EXPECT /
  * EXPECT OR DROP / EXPECT OR FAIL): each expectation is a named boolean
  * predicate with an enforcement action, and one load produces (a) the
  * kept rows, (b) a quarantine of dropped rows carrying WHY they were
  * dropped, and (c) a per-expectation pass/fail report for the run's
  * quality dashboard.
  *
  * Scale shape: the report is ONE global aggregation pass (all
  * expectations evaluated per row map-side, partial sums combine — no
  * per-expectation jobs); keep/quarantine are plain codegen filters over
  * the same scan. Nothing here shuffles row data at all. NULL predicate
  * results count as failures (SQL three-valued logic would otherwise let
  * a NULL comparison sneak past a gate).
  */
object Expectations {

  /** `action` ∈ warn (report only), drop (row leaves the kept set),
    * fail (any violation aborts the load). */
  final case class Expectation(name: String, pred: Column, action: String) {
    require(Set("warn", "drop", "fail")(action), s"unknown action: $action")
  }

  /** Per-expectation (expectation, action, n_pass, n_fail) — one job. */
  def report(df: DataFrame, exps: Seq[Expectation]): DataFrame = {
    require(exps.nonEmpty, "at least one expectation")
    val aggs = exps.flatMap { e =>
      Seq(sum(when(e.pred, 1L).otherwise(0L)).as(s"__p_${e.name}"),
        sum(when(e.pred, 0L).otherwise(1L)).as(s"__f_${e.name}"))
    }
    val rows = exps.map { e =>
      struct(lit(e.name).as("expectation"), lit(e.action).as("action"),
        coalesce(col(s"__p_${e.name}"), lit(0L)).as("n_pass"),
        coalesce(col(s"__f_${e.name}"), lit(0L)).as("n_fail"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.expectation"), col("r.action"),
        col("r.n_pass"), col("r.n_fail"))
  }

  /** Enforce the gate: returns (kept, quarantine). `fail` expectations
    * abort (IllegalStateException) if any row violates them; `drop` rows
    * land in the quarantine with a `_violations` array naming every
    * violated drop-expectation; `warn` never removes rows. */
  def enforce(df: DataFrame, exps: Seq[Expectation]): (DataFrame, DataFrame) = {
    val failing = exps.filter(_.action == "fail")
    failing.foreach { e =>
      val bad = df.filter(!coalesce(e.pred, lit(false))).count()
      if (bad > 0) throw new IllegalStateException(
        s"expectation '${e.name}' (fail): $bad violating rows — load aborted")
    }
    val drops = exps.filter(_.action == "drop")
    if (drops.isEmpty) return (df, df.limit(0).withColumn("_violations",
      array().cast("array<string>")))
    val passAll = drops.map(e => coalesce(e.pred, lit(false))).reduce(_ && _)
    val violations = filter(
      array(drops.map(e =>
        when(coalesce(e.pred, lit(false)), lit(null: String))
          .otherwise(lit(e.name))): _*),
      v => v.isNotNull)
    (df.filter(passAll),
      df.filter(!passAll).withColumn("_violations", violations))
  }

  /** Dead-letter replay: after a gate change (fixed data, relaxed
    * thresholds), re-run the CURRENT expectations over the quarantine —
    * rows that now pass move to `table`, rows still failing stay
    * quarantined with freshly computed `_violations`. Both sides commit
    * as ONE store transaction (append + snapshot-replace), so no reader
    * ever sees a row in both tables or in neither. The `_batch_id` each
    * row arrived with is preserved on the rows that stay. */
  def reprocessQuarantine(store: graft.tables.TableStore, table: String,
      quarantineTable: String, exps: Seq[Expectation]): Unit = {
    val cols = store.read(quarantineTable).columns
    val cur = store.read(quarantineTable).drop("_violations")
    val (admitted, still) = enforce(cur, exps)
    store.transaction { txn =>
      txn.append(table, admitted.drop("_batch_id"))
      txn.createOrReplace(quarantineTable, still.select(cols.map(col): _*))
    }
  }
}
