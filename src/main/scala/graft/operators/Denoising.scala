package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Span-corruption example generation — the T5/UL2 denoising objective's
  * preprocessing step ("Exploring the Limits of Transfer Learning with a
  * Unified Text-to-Text Transformer", Raffel et al. 2020, §3.1.4): mask
  * ~maskPct% of each document's tokens, collapse each CONSECUTIVE masked
  * run into one sentinel, and emit (input, target) where the input keeps
  * unmasked text with sentinels in place of spans and the target lists
  * each sentinel followed by the tokens it hides.
  *
  * Mask selection is the usual no-RNG discipline: token (doc, pos) is
  * masked when its md5 bucket falls under maskPct, so the corruption is
  * reproducible across engines, partitionings, and re-runs, and the
  * DuckDB oracle rebuilds every example string bit-for-bit.
  *
  * Scale shape: one tokenize explode, two window functions over
  * (doc, pos) — both run inside the SAME per-doc sort, Catalyst plans one
  * exchange + one sort for the pair — and one final per-doc aggregation
  * whose state is the document's own tokens (bounded by doc length,
  * never corpus-sized). No joins, no driver-side anything.
  */
object Denoising {

  /** (doc, n_spans, input_text, target_text) per document, ordered by id.
    * Sentinels are `<extra_id_k>`, k zero-based per document in span
    * order. Documents with no masked token keep their full text and an
    * empty target. */
  def spanCorruption(docs: DataFrame, idCol: String, textCol: String,
      maskPct: Int): DataFrame = {
    val toks = docs.select(col(idCol),
        posexplode(split(TextFunctions.normalizeText(col(textCol)), " "))
          .as(Seq("pos", "term")))
      .filter(length(col("term")) > 0)
    val bucket = conv(substring(md5(concat(lit("mask|"), col(idCol).cast("string"),
        lit("|"), col("pos").cast("string"))), 1, 8), 16, 10).cast("long") % 100
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val flagged = toks
      .withColumn("masked", bucket < maskPct)
      .withColumn("seg_start",
        col("masked") && !coalesce(lag(col("masked"), 1).over(w), lit(false)))
      .withColumn("span_idx",
        sum(when(col("seg_start"), 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val sentinel = concat(lit("<extra_id_"), (col("span_idx") - 1).cast("string"), lit(">"))
    // input keeps unmasked tokens and one sentinel per span (at its head);
    // target lists sentinel + hidden tokens per span — both reassembled
    // from pos-sorted piece lists, so empty selections become "" not null
    val inputPiece = when(!col("masked"), col("term"))
      .when(col("seg_start"), sentinel)
    val targetPiece = when(col("masked") && col("seg_start"),
        concat(sentinel, lit(" "), col("term")))
      .when(col("masked"), col("term"))
    def assemble(piece: org.apache.spark.sql.Column) =
      array_join(
        transform(
          sort_array(collect_list(when(piece.isNotNull, struct(col("pos"), piece.as("p"))))),
          s => s.getField("p")),
        " ")
    flagged.groupBy(col(idCol))
      .agg(
        coalesce(max(when(col("masked"), col("span_idx"))), lit(0L)).as("n_spans"),
        assemble(inputPiece).as("input_text"),
        assemble(targetPiece).as("target_text"))
      .orderBy(col(idCol))
  }
}
