package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SQL `MERGE INTO` semantics as a DataFrame-level operator — the one real
  * capability gap vs the reference, which runs Delta MERGE on Databricks
  * (reference: notebooks/22_ETL_Silver_PySpark.py:62-101,
  * 33_ETL_Gold_Dim_PySpark.py:61-104, 34_ETL_Gold_Fact_PySpark.py:90-139).
  * Our environment has no Delta, so merge is rebuilt as a declarative plan:
  * one full-outer join on the ON predicate, per-row first-match clause
  * dispatch, single `select` + `filter` output (SURVEY.md §7.3).
  *
  * Semantics mirror SQL MERGE:
  *  - clauses are evaluated in declaration order, first match wins;
  *  - `WHEN NOT MATCHED BY SOURCE` sees every target row whose join
  *    condition found no source row (including extra non-equi ON conjuncts);
  *  - a target row matching >1 source row is an error (Delta parity,
  *    SURVEY.md §7.4) — detected up front when `failOnMultipleMatches`.
  *
  * Scale shape: the join shuffles both sides by the equi-keys once (or
  * broadcasts a small source); clause dispatch is pure projection —
  * whole-stage-codegen friendly, no driver-side iteration. Conditions and
  * set-expressions reference the two sides via the `t`/`s` aliases, e.g.
  * `col("s.qty") - col("t.qty")`.
  */
object MergeInto {

  sealed trait MatchedAction { def cond: Option[Column] }
  /** `WHEN MATCHED [AND cond] THEN UPDATE SET …` — unspecified columns keep
    * the target value. */
  final case class MatchedUpdate(cond: Option[Column], set: Map[String, Column]) extends MatchedAction
  /** `WHEN MATCHED [AND cond] THEN DELETE`. */
  final case class MatchedDelete(cond: Option[Column]) extends MatchedAction

  /** `WHEN NOT MATCHED [AND cond] THEN INSERT (…)` — unspecified target
    * columns become NULL. */
  final case class NotMatchedInsert(cond: Option[Column], values: Map[String, Column])

  sealed trait BySourceAction { def cond: Option[Column] }
  /** `WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET …`. */
  final case class BySourceUpdate(cond: Option[Column], set: Map[String, Column]) extends BySourceAction
  /** `WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE`. */
  final case class BySourceDelete(cond: Option[Column]) extends BySourceAction

  private val TMark = "__graft_t"
  private val SMark = "__graft_s"

  /** Resolve a user-written column reference against `fields` under the
    * session resolver: exact match first, else the unique case-insensitive
    * match (Spark's default resolution), else a named error. The r14
    * INSERT column-list bug (`ext/SqlDml.scala:898`) was an instance of a
    * CLASS — string-keyed Map lookups against schema-cased names silently
    * no-op on a cased identifier (`SET ACCTBAL = 0` leaving `acctbal`
    * untouched) — so every clause map funnels through this before any
    * `.get`/`.getOrElse` against schema names. */
  private[graft] def resolveColumn(fields: Seq[String], ref: String,
      caseSensitive: Boolean, ctx: String): String =
    fields.find(_ == ref).getOrElse {
      if (caseSensitive)
        throw new IllegalArgumentException(
          s"$ctx: column $ref not found among (${fields.mkString(", ")})")
      else fields.filter(_.equalsIgnoreCase(ref)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"$ctx: column $ref not found among (${fields.mkString(", ")})")
        case many => throw new IllegalArgumentException(
          s"$ctx: column $ref is ambiguous under case-insensitive " +
            s"resolution: ${many.mkString(", ")}")
      }
    }

  private[graft] def normalizeSet(fields: Seq[String], set: Map[String, Column],
      caseSensitive: Boolean, ctx: String): Map[String, Column] = {
    val resolved = set.toSeq.map { case (k, v) =>
      resolveColumn(fields, k, caseSensitive, ctx) -> v }
    val dups = resolved.groupBy(_._1).filter(_._2.size > 1).keys
    require(dups.isEmpty,
      s"$ctx: multiple assignments target the same column(s) ${dups.mkString(", ")}")
    resolved.toMap
  }

  /** Delta parity: error when a target row would match multiple source
    * rows. Kept as an up-front check (one cheap extra job) rather than
    * fused into the merge join — fusing needs a per-target-row window
    * count, a second full-size shuffle on every merge, which is the
    * wrong trade at scale for a skippable safety net. Also called
    * standalone by the table store's file-pruned merge, whose rewrite
    * subset may not contain every matched row. */
  def checkMultipleMatches(target: DataFrame, source: DataFrame, keys: Seq[String],
      extraOn: Option[Column]): Unit = {
    val dup = extraOn match {
      case None =>
        // fast path: key-duplicated source rows that hit any target key
        source.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
          .filter(col("__n") > 1)
          .join(target.select(keys.map(col): _*), keys, "left_semi")
          .limit(1).count()
      case Some(extra) =>
        // extra ON conjuncts can disambiguate key-duplicated source rows,
        // so count matches from the REAL join condition per target row
        val tt = target.withColumn("__graft_tid", monotonically_increasing_id()).alias("t")
        val cond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _) && extra
        tt.join(source.alias("s"), cond)
          .groupBy(col("__graft_tid")).agg(count(lit(1)).as("__n"))
          .filter(col("__n") > 1).limit(1).count()
    }
    if (dup > 0) throw new IllegalStateException(
      s"MERGE: multiple source rows match a single target row on keys ${keys.mkString(",")}")
  }

  /** Only the rows a merge would INSERT: source rows with no match under
    * the full ON condition, projected through the first-matching
    * `WHEN NOT MATCHED` clause (target schema). The anti-join needs just
    * the ON-condition columns of the target, so Catalyst prunes the
    * target scan to the keys — this is how the table store's file-pruned
    * merge appends inserts without rewriting a single existing file. */
  def insertedRows(target: DataFrame, source: DataFrame, keys: Seq[String],
      extraOn: Option[Column], notMatched0: Seq[NotMatchedInsert]): DataFrame = {
    val outCols = target.columns.toSeq
    val outTypes = target.schema.fields.map(f => f.name -> f.dataType).toMap
    if (notMatched0.isEmpty)
      return target.filter(lit(false)) // no insert clauses → empty, target schema
    val cs = target.sparkSession.conf
      .get("spark.sql.caseSensitive", "false").toBoolean
    val notMatched = notMatched0.map(i =>
      NotMatchedInsert(i.cond, normalizeSet(outCols, i.values, cs, "MERGE INSERT")))
    val t = target.alias("t")
    val s = source.alias("s")
    val keyCond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    val onCond = extraOn.map(keyCond && _).getOrElse(keyCond)
    val anti = s.join(t, onCond, "left_anti").alias("s")
    val insertSpecs = notMatched.map(i => (i.cond, Some(i.values)))
    val insertKeeps = notMatched.map(i => (i.cond, true))
    def chainValue(c: String, actions: Seq[(Option[Column], Option[Map[String, Column]])], default: Column): Column =
      actions.foldLeft(Option.empty[Column]) { case (acc, (cond, set)) =>
        val v = set.map(_.getOrElse(c, default)).getOrElse(default)
        val w = cond.getOrElse(lit(true))
        Some(acc.map(_.when(w, v)).getOrElse(when(w, v)))
      }.map(_.otherwise(default)).getOrElse(default)
    def chainKeep(actions: Seq[(Option[Column], Boolean)]): Column =
      actions.foldLeft(Option.empty[Column]) { case (acc, (cond, keep)) =>
        val w = cond.getOrElse(lit(true))
        Some(acc.map(_.when(w, lit(keep))).getOrElse(when(w, lit(keep))))
      }.map(_.otherwise(lit(false))).getOrElse(lit(false))
    anti.select(
        outCols.map(c => chainValue(c, insertSpecs, lit(null)).cast(outTypes(c)).as(c)) :+
          chainKeep(insertKeeps).as("__graft_keep"): _*)
      .filter(col("__graft_keep"))
      .drop("__graft_keep")
  }

  /** Row-level change set of a merge over `target` (Delta CDF semantics):
    * for every target row the FIRST matching clause decides its change
    * rows — `MatchedUpdate`/`BySourceUpdate` emit an
    * (`update_preimage`, `update_postimage`) pair, `MatchedDelete`/
    * `BySourceDelete` emit one `delete` row, a row no clause applies to
    * emits nothing. INSERT-clause rows are not produced here — label
    * [[insertedRows]] with `insert` and union. Output = target schema +
    * `_change_type`.
    *
    * Same join shape as the merge itself (left-outer from the target, one
    * explode projection, codegen-friendly); the caller passes the
    * file-pruned target subset, so at 100 TB this costs the touched rows,
    * not the table. NULL clause conditions fall through, matching SQL
    * WHEN-clause semantics. */
  def changeSet(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      extraOn: Option[Column],
      matched0: Seq[MatchedAction],
      notMatchedBySource0: Seq[BySourceAction]): DataFrame = {
    val outCols = target.columns.toSeq
    val outTypes = target.schema.fields.map(f => f.name -> f.dataType).toMap
    val cs = target.sparkSession.conf
      .get("spark.sql.caseSensitive", "false").toBoolean
    val matched = matched0.map {
      case MatchedUpdate(c, set) =>
        MatchedUpdate(c, normalizeSet(outCols, set, cs, "MERGE UPDATE SET"))
      case d => d
    }
    val notMatchedBySource = notMatchedBySource0.map {
      case BySourceUpdate(c, set) =>
        BySourceUpdate(c, normalizeSet(outCols, set, cs, "MERGE BY SOURCE UPDATE SET"))
      case d => d
    }
    val t = target.withColumn(TMark, lit(true)).alias("t")
    val s = source.withColumn(SMark, lit(true)).alias("s")
    val keyCond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    val onCond = extraOn.map(keyCond && _).getOrElse(keyCond)
    val j = t.join(s, onCond, "left_outer")
    val isMatched = col(s"s.$SMark").isNotNull

    def img(ct: String, set: Map[String, Column]): Column = struct(
      outCols.map(c => set.getOrElse(c, col(s"t.$c")).cast(outTypes(c)).as(c)) :+
        lit(ct).as("_change_type"): _*)
    def chain(actions: Seq[(Option[Column], Column)]): Column =
      actions.foldLeft(Option.empty[Column]) { case (acc, (cond, arr)) =>
        val w = cond.getOrElse(lit(true))
        Some(acc.map(_.when(w, arr)).getOrElse(when(w, arr)))
      }.map(_.otherwise(lit(null))).getOrElse(lit(null))

    val matchedEmit = chain(matched.map {
      case MatchedUpdate(c, set) =>
        (c, array(img("update_preimage", Map.empty), img("update_postimage", set)))
      case MatchedDelete(c) => (c, array(img("delete", Map.empty)))
    })
    val bySourceEmit = chain(notMatchedBySource.map {
      case BySourceUpdate(c, set) =>
        (c, array(img("update_preimage", Map.empty), img("update_postimage", set)))
      case BySourceDelete(c) => (c, array(img("delete", Map.empty)))
    })
    // explode(null array) emits nothing — rows no clause applies to vanish
    j.select(explode(when(isMatched, matchedEmit).otherwise(bySourceEmit)).as("__c"))
      .select(col("__c.*"))
  }

  /** Returns the post-merge target state (target schema preserved).
    *
    * Contract note: an INSERT-ONLY merge (no matched / by-source clauses)
    * takes a left-anti fast path whose NOT MATCHED clauses may reference
    * only SOURCE (`s.*`) columns — Delta's contract. A `t.*` reference in
    * an insert condition or value raises a named-column error instead of
    * the NULL the historical full-outer plan silently produced. */
  def apply(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      extraOn: Option[Column] = None,
      matched: Seq[MatchedAction] = Nil,
      notMatched: Seq[NotMatchedInsert] = Nil,
      notMatchedBySource: Seq[BySourceAction] = Nil,
      failOnMultipleMatches: Boolean = true): DataFrame = {

    require(keys.nonEmpty, "merge keys must be non-empty")

    // normalize every user-written identifier (ON keys, SET/INSERT map
    // keys) to the target schema's spelling before any exact-string
    // lookup below — see resolveColumn
    val cs = target.sparkSession.conf
      .get("spark.sql.caseSensitive", "false").toBoolean
    val tCols = target.columns.toSeq
    val keysN = keys.map(resolveColumn(tCols, _, cs, "MERGE ON"))
    val matchedN = matched.map {
      case MatchedUpdate(c, set) =>
        MatchedUpdate(c, normalizeSet(tCols, set, cs, "MERGE UPDATE SET"))
      case d => d
    }
    val notMatchedN = notMatched.map(i =>
      NotMatchedInsert(i.cond, normalizeSet(tCols, i.values, cs, "MERGE INSERT")))
    val notMatchedBySourceN = notMatchedBySource.map {
      case BySourceUpdate(c, set) =>
        BySourceUpdate(c, normalizeSet(tCols, set, cs, "MERGE BY SOURCE UPDATE SET"))
      case d => d
    }
    applyNormalized(target, source, keysN, extraOn, matchedN, notMatchedN,
      notMatchedBySourceN, failOnMultipleMatches)
  }

  private def applyNormalized(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      extraOn: Option[Column],
      matched: Seq[MatchedAction],
      notMatched: Seq[NotMatchedInsert],
      notMatchedBySource: Seq[BySourceAction],
      failOnMultipleMatches: Boolean): DataFrame = {

    // An INSERT-ONLY merge (no matched, no by-source clauses) is legal
    // even when several source rows match one target row — there is
    // nothing ambiguous for the duplicates to do (Delta allows this, and
    // TableStore's file-pruned merge path codifies it). The precheck
    // would spuriously abort, so it only guards merges whose matched/
    // by-source actions a duplicate match WOULD make ambiguous; the
    // insert-only dataflow below also bypasses the full-outer join,
    // which would otherwise emit a multiply-matched target row once per
    // source partner.
    val insertOnly = matched.isEmpty && notMatchedBySource.isEmpty
    if (failOnMultipleMatches && !insertOnly)
      checkMultipleMatches(target, source, keys, extraOn)

    val t = target.withColumn(TMark, lit(true)).alias("t")
    val s = source.withColumn(SMark, lit(true)).alias("s")
    val keyCond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    val onCond = extraOn.map(keyCond && _).getOrElse(keyCond)
    val j = t.join(s, onCond, "full_outer")

    val isMatched = col(s"t.$TMark").isNotNull && col(s"s.$SMark").isNotNull
    val sourceOnly = col(s"t.$TMark").isNull

    val outCols = target.columns.toSeq
    val outTypes = target.schema.fields.map(f => f.name -> f.dataType).toMap

    // First-match clause dispatch: when().when()…otherwise() chains.
    def chainValue(c: String, actions: Seq[(Option[Column], Option[Map[String, Column]])], default: Column): Column =
      actions.foldLeft(Option.empty[Column]) { case (acc, (cond, set)) =>
        val v = set.map(_.getOrElse(c, default)).getOrElse(default)
        val w = cond.getOrElse(lit(true))
        Some(acc.map(_.when(w, v)).getOrElse(when(w, v)))
      }.map(_.otherwise(default)).getOrElse(default)

    def chainKeep(actions: Seq[(Option[Column], Boolean)], default: Boolean): Column =
      actions.foldLeft(Option.empty[Column]) { case (acc, (cond, keep)) =>
        val w = cond.getOrElse(lit(true))
        Some(acc.map(_.when(w, lit(keep))).getOrElse(when(w, lit(keep))))
      }.map(_.otherwise(lit(default))).getOrElse(lit(default))

    val tDefault: String => Column = c => col(s"t.$c")
    val nullDefault: String => Column = c => lit(null).cast(outTypes(c))

    val matchedSpecs = matched.map {
      case MatchedUpdate(c, set) => (c, Some(set))
      case MatchedDelete(c) => (c, None)
    }
    val matchedKeeps = matched.map {
      case MatchedUpdate(c, _) => (c, true)
      case MatchedDelete(c) => (c, false)
    }
    val insertSpecs = notMatched.map(i => (i.cond, Some(i.values)))
    val insertKeeps = notMatched.map(i => (i.cond, true))
    val bySourceSpecs = notMatchedBySource.map {
      case BySourceUpdate(c, set) => (c, Some(set))
      case BySourceDelete(c) => (c, None)
    }
    val bySourceKeeps = notMatchedBySource.map {
      case BySourceUpdate(c, _) => (c, true)
      case BySourceDelete(c) => (c, false)
    }

    if (insertOnly) {
      // The fast path resolves insert clauses against a SOURCE-ONLY
      // left-anti frame, so a `t.*` reference — which the full-outer
      // plan would have evaluated as NULL (the row is by definition
      // unmatched) — has nothing to bind to. Rejecting it here with a
      // named-column error beats the resolver's generic failure, and the
      // contract matches Delta's: NOT MATCHED clauses may reference only
      // the source.
      // The alias match is case-INsensitive (the full-outer plan resolves
      // `T.v` against alias `t` under Spark's default resolver, so the
      // guard must catch the same spellings), and a head that ALSO names
      // a real top-level source column (a struct literally called `t`)
      // is exempt — those references legitimately resolve against the
      // source-only frame.
      val tIsSourceCol = source.columns.exists(_.equalsIgnoreCase("t"))
      val targetRefs = notMatched
        .flatMap(i => i.cond.toSeq ++ i.values.values)
        .flatMap(org.apache.spark.sql.GraftShims.catalystExpr(_).collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
              if a.nameParts.length > 1 && a.nameParts.head.equalsIgnoreCase("t") &&
                !tIsSourceCol => a.name
        }).distinct
      require(targetRefs.isEmpty,
        s"insert-only merge: NOT MATCHED clauses may reference only source " +
          s"columns (an unmatched row has no target side — the full plan " +
          s"evaluated these as NULL); found ${targetRefs.mkString(", ")}. " +
          s"Use typed NULL literals instead, or add a matched/by-source " +
          s"clause to engage the full-outer plan.")
      // target rows pass through untouched exactly once; only source rows
      // with no target partner run the insert clause chain
      val unmatchedSrc = s.join(t, onCond, "left_anti")
      val inserts = unmatchedSrc.select(outCols.map(c =>
          chainValue(c, insertSpecs, nullDefault(c)).cast(outTypes(c)).as(c)) :+
          chainKeep(insertKeeps, default = false).as("__graft_keep"): _*)
        .filter(col("__graft_keep"))
        .drop("__graft_keep")
      return target.unionByName(inserts)
    }

    val projected = outCols.map { c =>
      when(isMatched, chainValue(c, matchedSpecs, tDefault(c)))
        .when(sourceOnly, chainValue(c, insertSpecs, nullDefault(c)))
        .otherwise(chainValue(c, bySourceSpecs, tDefault(c)))
        .cast(outTypes(c)).as(c)
    }
    val keep =
      when(isMatched, chainKeep(matchedKeeps, default = true))
        .when(sourceOnly, chainKeep(insertKeeps, default = false))
        .otherwise(chainKeep(bySourceKeeps, default = true))

    j.select(projected :+ keep.as("__graft_keep"): _*)
      .filter(col("__graft_keep"))
      .drop("__graft_keep")
  }
}
