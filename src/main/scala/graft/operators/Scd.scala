package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, TimestampType}

/** SCD (slowly-changing-dimension) merges — the reference's silver/gold
  * incremental-load semantics rebuilt as Spark-first operators.
  *
  *  - SCD2 (reference: notebooks/22_ETL_Silver_PySpark.py:62-101): full
  *    history, "current" = `_tf_valid_to IS NULL`; change detection is the
  *    reference's null-unsafe `!=` OR-chain (SURVEY.md §2.3 F4) with an
  *    opt-in null-safe mode.
  *  - SCD1 (reference: notebooks/33_ETL_Gold_Dim_PySpark.py:61-104):
  *    update-in-place + insert, no delete.
  *
  * Two SCD2 implementations with identical semantics (cross-checked by
  * property tests):
  *
  *  - [[scd2Merge]] — the scale path. ONE full-outer join of the *current*
  *    slice against the source; each joined row emits 0–2 output rows
  *    (closed version and/or new version) through a single
  *    `explode(array(struct…))` projection, so the join output is never
  *    re-executed per branch. History rows union in untouched (their
  *    `_tf_valid_to IS NOT NULL` filter prunes at the scan).
  *  - [[scd2MergeTwoPhase]] — the faithful re-expression of the reference's
  *    two consecutive MERGE statements via [[MergeInto]]; used as the
  *    semantic oracle in tests.
  *
  * Timestamps are caller-supplied batch constants (`loadTs`), reproducing
  * Delta's statement-level `current_timestamp()` semantics explicitly
  * (SURVEY.md §2.9 note).
  */
object Scd {

  val ValidFrom = "_tf_valid_from"
  val ValidTo = "_tf_valid_to"
  /** Audit pair the reference carries on every table (01_Init.py:231-233)
    * and touches on every write (22_ETL_Silver_PySpark.py:76-77,99): set at
    * insert, bumped on every version-closing or payload-changing write.
    * Opt-in: the merge operators maintain the pair whenever the target
    * carries both columns. */
  val CreateDate = "_tf_create_date"
  val UpdateDate = "_tf_update_date"

  private[graft] def hasAudit(df: DataFrame): Boolean =
    df.columns.contains(CreateDate) && df.columns.contains(UpdateDate)

  /** Initial SCD2 load: every source row becomes a current version. */
  def scd2Init(source: DataFrame, loadTs: Column, audit: Boolean = false): DataFrame = {
    val base = source
      .withColumn(ValidFrom, loadTs.cast(TimestampType))
      .withColumn(ValidTo, lit(null).cast(TimestampType))
    if (audit)
      base.withColumn(CreateDate, loadTs.cast(TimestampType))
        .withColumn(UpdateDate, loadTs.cast(TimestampType))
    else base
  }

  private[graft] def changePredicate(payload: Seq[String], nullSafe: Boolean): Column =
    payload
      .map(c => if (nullSafe) !(col(s"t.$c") <=> col(s"s.$c")) else col(s"t.$c") =!= col(s"s.$c"))
      .reduceOption(_ || _)
      .getOrElse(lit(false))

  /** Incremental SCD2 merge (fused single-join path). `source` columns =
    * natural key + payload; `target` = same + envelope. */
  def scd2Merge(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      loadTs: Column,
      nullSafeCompare: Boolean = false): DataFrame = {

    val payload = source.columns.filterNot(keys.contains).toSeq
    val naturalCols = source.columns.toSeq
    val audit = hasAudit(target)
    val envelope = Seq(ValidFrom, ValidTo) ++ (if (audit) Seq(CreateDate, UpdateDate) else Nil)
    require(
      target.columns.toSet == (naturalCols ++ envelope).toSet,
      s"target must carry source columns + envelope; got ${target.columns.mkString(",")}")

    val hist = target.filter(col(ValidTo).isNotNull)
    val cur = target.filter(col(ValidTo).isNull)

    val t = cur.withColumn("__t", lit(true)).alias("t")
    val s = source.withColumn("__s", lit(true)).alias("s")
    val j = t.join(s, keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _), "full_outer")

    val isMatched = col("t.__t").isNotNull && col("s.__s").isNotNull
    val tOnly = col("t.__t").isNotNull && col("s.__s").isNull
    val sOnly = col("t.__t").isNull
    // Null-unsafe `!=` chain evaluates to NULL when only a NULL↔value flip
    // occurred — `<=> true` collapses NULL to "unchanged", matching the
    // reference's WHEN-clause skip behavior (SURVEY.md §2.3 F4).
    val changed = changePredicate(payload, nullSafeCompare) <=> true

    val outSchema = StructType(target.schema.fields.sortBy(f => target.columns.indexOf(f.name)))
    def mkStruct(cols: Seq[Column]): Column = struct(
      cols.zip(target.columns).map { case (c, n) => c.cast(outSchema(n).dataType).as(n) }: _*)

    val keepStruct = mkStruct(target.columns.toSeq.map(c => col(s"t.$c")))
    val closedStruct = mkStruct(target.columns.toSeq.map {
      case ValidTo => loadTs.cast(TimestampType)
      case UpdateDate if audit => loadTs.cast(TimestampType)
      case c => col(s"t.$c")
    })
    val newStruct = mkStruct(target.columns.toSeq.map {
      case ValidFrom => loadTs.cast(TimestampType)
      case ValidTo => lit(null).cast(TimestampType)
      case CreateDate if audit => loadTs.cast(TimestampType)
      case UpdateDate if audit => loadTs.cast(TimestampType)
      case c => col(s"s.$c")
    })

    val emitted =
      when(isMatched && !changed, array(keepStruct))
        .when(isMatched && changed, array(closedStruct, newStruct))
        .when(tOnly, array(closedStruct))
        .when(sOnly, array(newStruct))
    val merged = j.select(explode(emitted).as("__row")).select(col("__row.*"))

    hist.unionByName(merged)
  }

  /** Faithful two-phase SCD2 (reference 22:62-82 then 22:86-101): phase 1
    * closes changed + deleted current rows, phase 2 inserts new current
    * versions against the post-phase-1 state. */
  def scd2MergeTwoPhase(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      loadTs: Column,
      nullSafeCompare: Boolean = false): DataFrame = {

    val payload = source.columns.filterNot(keys.contains).toSeq
    val currentOnly = col(s"t.$ValidTo").isNull
    val audit = hasAudit(target)
    val ts = loadTs.cast(TimestampType)
    val closeSet = Map(ValidTo -> ts) ++ (if (audit) Map(UpdateDate -> ts) else Map.empty)

    // MERGE #1: close changed rows; close rows deleted from the source.
    val phase1 = MergeInto(
      target, source, keys,
      extraOn = Some(currentOnly),
      matched = Seq(MergeInto.MatchedUpdate(
        Some(changePredicate(payload, nullSafeCompare)), closeSet)),
      notMatchedBySource = Seq(MergeInto.BySourceUpdate(Some(currentOnly), closeSet)),
      failOnMultipleMatches = false)

    // MERGE #2: insert the new current version for new/changed keys.
    val insertValues: Map[String, Column] =
      (keys ++ payload).map(c => c -> col(s"s.$c")).toMap +
        (ValidFrom -> ts) +
        (ValidTo -> lit(null).cast(TimestampType)) ++
        (if (audit) Map(CreateDate -> ts, UpdateDate -> ts) else Map.empty)
    MergeInto(
      phase1, source, keys,
      extraOn = Some(currentOnly),
      notMatched = Seq(MergeInto.NotMatchedInsert(None, insertValues)),
      failOnMultipleMatches = false)
  }

  /** SCD1 merge: matched-and-changed → update payload, unmatched → insert;
    * rows missing from the source are kept (reference 33:61-104). When the
    * target carries the audit pair, pass `auditTs` to bump `_tf_update_date`
    * on changed rows and stamp both dates on inserts (reference 33:80,99). */
  def scd1Merge(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      nullSafeCompare: Boolean = false,
      auditTs: Option[Column] = None): DataFrame = {

    val payload = source.columns.filterNot(keys.contains).toSeq
    val ts = auditTs.map(_.cast(TimestampType))
    require(ts.isEmpty || hasAudit(target),
      s"auditTs requires the target to carry $CreateDate and $UpdateDate")
    MergeInto(
      target, source, keys,
      matched = Seq(MergeInto.MatchedUpdate(
        Some(changePredicate(payload, nullSafeCompare)),
        payload.map(c => c -> col(s"s.$c")).toMap ++
          ts.map(UpdateDate -> _).toMap)),
      notMatched = Seq(MergeInto.NotMatchedInsert(
        None, (keys ++ payload).map(c => c -> col(s"s.$c")).toMap ++
          ts.map(t => Map(CreateDate -> t, UpdateDate -> t)).getOrElse(Map.empty))),
      failOnMultipleMatches = false)
  }
}
