package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interpolated Kneser-Ney bigram language model as a fit/score
  * operator pair — the model-based quality gate a curation funnel
  * composes (CCNet's signal; q437 is this operator on the corpus
  * itself plus rounding). Fit produces four vocab-bounded tables —
  * bigram counts, history counts + distinct continuations, distinct
  * predecessors, and the (discount, type-total) scalar — all
  * broadcastable; scoring is one narrow bigram explode + model joins,
  * so the corpus rides exactly one (doc, w1, w2) shuffle.
  *
  * Unseen-event policy (never fires when scoring the fit corpus
  * itself — every doc bigram is in the model by construction — but an
  * INGESTION gate sees genuinely new text):
  *   - seen history, unseen bigram: the KN formula's own answer,
  *     max(0−D,0)/c1 + λ(w1)·P_cont(w2) — pure continuation mass;
  *   - unseen continuation word: P_cont floors at 1/T (one
  *     hypothetical predecessor among T bigram types);
  *   - unseen history: P = P_cont(w2) with the same floor (no
  *     history mass to discount — back off entirely to continuation).
  * Matched rows evaluate the exact same expression tree as q437's
  * inner-join form (the coalesce branches are identity on hits), so
  * fit-corpus scores are bit-identical to the oracle-checked query.
  */
object KnLm {

  /** Fitted model: four small frames, each localCheckpointed. */
  final case class Model(bg: DataFrame, c1: DataFrame, npre: DataFrame,
                         disc: DataFrame)

  /** Per-doc bigram counts (doc_id, source-ish passthrough omitted):
    * (idCol, w1, w2, n) over the shared lowercase-letters tokenizer. */
  def docBigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Spread.byKey(docs, col(idCol))
      .select(col(idCol), SubstringDedup.tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col(idCol), explode(
        transform(sequence(lit(0), size(col("__t")) - 2),
          i => struct(element_at(col("__t"), i + 1).as("w1"),
                      element_at(col("__t"), i + 2).as("w2")))).as("b"))
      .groupBy(col(idCol), col("b.w1"), col("b.w2"))
      .agg(count(lit(1)).as("n"))

  /** Fit the KN model from a corpus. Ney's discount n1/(n1+2n2) with
    * the 0.75 fallback for a fully-templated corpus (no singleton or
    * doubleton bigram types). */
  def fit(docs: DataFrame, idCol: String, textCol: String): Model =
    fitFromBigrams(docBigrams(docs, idCol, textCol))

  /** [[fit]] from a pre-computed [[docBigrams]] relation — the entry
    * point for queries that fit AND score the same corpus (q437/q482):
    * the tokenize + bigram-explode pass runs once and feeds both. */
  def fitFromBigrams(db: DataFrame): Model = {
    val bg = db
      .groupBy("w1", "w2").agg(sum("n").as("c2"))
      .localCheckpoint()
    val c1 = bg.groupBy("w1")
      .agg(sum("c2").as("c1"), count(lit(1)).as("n1p"))
      .localCheckpoint()
    val npre = bg.groupBy("w2").agg(count(lit(1)).as("npre"))
      .localCheckpoint()
    val disc = bg.agg(
      count(lit(1)).as("tt"),
      sum(when(col("c2") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("c2") === 2, 1L).otherwise(0L)).as("n2"))
      .select(col("tt"),
        when(col("n1") + col("n2") * 2 === 0, lit(0.75))
          .otherwise(col("n1").cast("double") / (col("n1") + col("n2") * 2))
          .as("dd"))
      .localCheckpoint()
    Model(bg, c1, npre, disc)
  }

  /** Per-doc average negative log-likelihood under the model.
    * Output: (idCol, n_bigrams, avg_nll) — docs with fewer than two
    * tokens have no bigrams and do NOT appear (the gate keeps them:
    * no evidence). The per-doc sum folds in sorted (w1, w2) order so
    * the number is partitioning-invariant and oracle-replayable. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: Model): DataFrame =
    scoreFromBigrams(docBigrams(docs, idCol, textCol), idCol, model)

  /** [[score]] from a pre-computed [[docBigrams]] relation — pairs
    * with [[fitFromBigrams]] so fit-and-score-same-corpus queries pay
    * the tokenize pass once. Bit-identical: both entry points fold
    * the same terms in the same sorted (w1, w2) order. */
  def scoreFromBigrams(db: DataFrame, idCol: String,
                       model: Model): DataFrame = {
    val pcont =
      greatest(coalesce(col("npre"), lit(0L)), lit(1L)).cast("double") /
        col("tt")
    val p = when(col("c1").isNotNull,
        greatest(coalesce(col("c2"), lit(0L)).cast("double") - col("dd"),
          lit(0.0)) / col("c1") +
          ((col("dd") * col("n1p")) / col("c1")) * pcont)
      .otherwise(pcont)
    val terms = db
      .join(model.bg, Seq("w1", "w2"), "left")
      .join(model.c1, Seq("w1"), "left")
      .join(model.npre, Seq("w2"), "left")
      .crossJoin(broadcast(model.disc))
      .select(col(idCol), col("w1"), col("w2"), col("n"),
        (col("n") * -log(p)).as("term"))
    terms.groupBy(idCol)
      .agg(sum("n").cast("long").as("n_bigrams"),
        aggregate(
          transform(
            sort_array(collect_list(struct(col("w1"), col("w2"), col("term")))),
            e => e.getField("term")),
          lit(0.0), (acc, x) => acc + x).as("nllsum"))
      .select(col(idCol), col("n_bigrams"),
        (col("nllsum") / col("n_bigrams")).as("avg_nll"))
  }
}
