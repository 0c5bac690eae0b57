package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Model-based quality filtering — the classifier stage of production
  * curation (the fastText wiki-vs-crawl pattern): a trained linear
  * model scores every document and a threshold gates it, replacing
  * hand-tuned rule stacks with one learned surface.
  *
  * Spark shape: the model is DRIVER-SIDE state measured in bytes
  * (bias + one weight per feature), inlined as literals into a single
  * row-local projection — featurize → dot → sigmoid runs inside
  * whole-stage codegen with zero shuffles, zero joins, zero UDFs, at
  * any corpus size. (A real deployment swaps the literal weights for
  * ones fit offline; the plan shape does not change.)
  *
  * Determinism: every feature is an exact integer ratio of counts the
  * SQL oracle recomputes bit-for-bit; the score applies one exp() per
  * row on an identical double, so round(6) output is engine-stable
  * (the q376 ln/exp precedent).
  */
object QualityClassifier {

  /** (feature expression, weight) pairs + bias. */
  final case class Model(bias: Double, terms: Seq[(Column, Double)])

  /** The library's default feature set over a text column — exact
    * count ratios, shared with the q22 rule-based profile. */
  def defaultModel(text: Column): Model = {
    val toks = TextFunctions.tokens(text)
    val nTok = size(toks).cast("double")
    val nChars = length(text).cast("double")
    Model(
      bias = -1.2,
      terms = Seq(
        // longer docs are likelier to be prose, saturating via ratio
        (nTok / (nTok + lit(50.0)), 2.4),
        // stopword density: the strongest natural-language signal
        (TextFunctions.stopwordCount(toks,
          Seq("the", "a", "of", "to", "and")).cast("double") /
          greatest(nTok, lit(1.0)), 6.0),
        // punctuation share: prose has some, boilerplate/code has lots
        (TextFunctions.punctCount(text).cast("double") /
          greatest(nChars, lit(1.0)), -8.0),
        // lexical diversity: near-zero for template/repetition spam
        (size(array_distinct(toks)).cast("double") /
          greatest(nTok, lit(1.0)), 1.5)))
  }

  /** The pre-sigmoid logit z = bias + Σ wᵢ·fᵢ, summed in term order —
    * pure rational arithmetic on exact count ratios, so it is
    * bit-identical across engines (unlike the sigmoid, whose exp()
    * differs in the last ulp). Rank/bucket logic should order on THIS,
    * not on the score (same ordering, no float hazard). */
  def logitExpr(model: Model): Column =
    model.terms.foldLeft(lit(model.bias): Column) {
      case (acc, (f, w)) => acc + f * lit(w)
    }

  /** score = sigmoid(bias + Σ wᵢ·fᵢ), summed in term order. */
  def scoreExpr(model: Model): Column =
    lit(1.0) / (lit(1.0) + exp(-logitExpr(model)))

  /** Score + gate every document: (idCol…, quality_score, kept). */
  def filter(docs: DataFrame, textCol: String,
             threshold: Double = 0.5,
             model: Column => Model = defaultModel): DataFrame = {
    val score = scoreExpr(model(col(textCol)))
    docs.withColumn("quality_score", score)
      .withColumn("kept", (col("quality_score") >= threshold).cast("int"))
  }
}
