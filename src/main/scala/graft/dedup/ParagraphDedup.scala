package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sub-document deduplication: remove repeated PARAGRAPHS corpus-wide,
  * keeping only each paragraph's first occurrence (C4/CCNet-style
  * boilerplate removal — the dedup granularity below [[ExactDedup]]'s
  * whole-document level). Documents survive with their duplicated
  * spans excised and the remainder stitched back in original order;
  * a document whose every paragraph was seen earlier collapses to
  * empty rather than disappearing, so corpus bookkeeping (doc counts,
  * id joins) is unaffected.
  *
  * Paragraphs here are fixed windows of `paraTokens` whitespace tokens
  * — the corpus is single-line text, so windowing stands in for real
  * paragraph breaks; on data with newlines, split on those instead
  * (the pipeline below the split is identical). "First occurrence" is
  * the corpus-global minimum `(id, pos)` — a total order, so the
  * result is deterministic and engine-reproducible.
  *
  * Scale shape (the interesting part at 100 TB):
  *  - explode to `(id, pos, para)` — linear, no shuffle;
  *  - first-occurrence selection is ONE shuffle keyed on paragraph
  *    content, then a per-key sort of only that paragraph's
  *    occurrences (`row_number` over a keyed window — partial
  *    per-paragraph sorts, never a global sort). Hot paragraphs (the
  *    exact boilerplate this op exists to kill) concentrate their df
  *    occurrences on one key each; AQE's skew handling splits them,
  *    and each costs O(df log df) — no df² pair blowup anywhere,
  *    which is what makes paragraph dedup cheaper than pairwise
  *    near-dup at the same scale;
  *  - reassembly groups by document id (second shuffle) and sorts
  *    only within each doc — per-doc cost bounded by doc length.
  *  Everything shuffled carries `(id, pos, para)`; no column is ever
  *  duplicated per candidate pair.
  */
object ParagraphDedup {

  /** Returns `(id, n_paras, n_kept, text_dedup)` for every input
    * document: original window count, surviving window count, and the
    * surviving windows re-joined in original order ("" if none).
    */
  def dedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      paraTokens: Int = 10): DataFrame = {
    require(paraTokens > 0, "paraTokens must be positive")
    val toks = split(col(textCol), " ")
    val nParas = ceil(size(toks).cast("double") / paraTokens).cast("long")
    val paras = Shingles.paragraphs(col(textCol), paraTokens)

    val base = docs.select(col(idCol).cast("long").as("id"), paras.as("paras"))
    val exploded = base.select(col("id"), posexplode(col("paras")).as(Seq("pos", "para")))

    // first corpus-wide occurrence per paragraph: keyed window, not a
    // global sort — each paragraph's occurrences sort independently
    val firstSeen = Window.partitionBy("para").orderBy("id", "pos")
    val kept = exploded
      .withColumn("rn", row_number().over(firstSeen))
      .where(col("rn") === 1)

    // stitch survivors back in document order; sort_array on
    // struct(pos, para) orders by pos first (struct field order)
    val reassembled = kept
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(sort_array(collect_list(struct(col("pos"), col("para")))), _("para")),
          " ").as("text_dedup"))

    docs
      .select(col(idCol).cast("long").as("id"), nParas.as("n_paras"))
      .join(reassembled, Seq("id"), "left")
      .select(
        col("id"),
        col("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"))
  }
}
