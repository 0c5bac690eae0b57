package graft

import org.apache.spark.sql.DataFrame

/** Shared plant builders for the perplexity-gate specs: a FLUENT doc
  * (greedy maximum-probability bigram walk over the corpus's own
  * bigram graph) and a token SALAD (vocabulary words in hash order).
  * The walk never reuses a bigram (passes the repetition gate; its
  * 8-gram runs are novel recombinations, passing the winnow gate) and
  * never forms a word-3-gram present in a benchmark doc (doc_id % 97
  * == 0 — passes decontamination), so the only gate with grounds to
  * drop it is the perplexity gate — and every step is a seen
  * high-count bigram, so it must NOT. */
object TestCorpusPlants {

  def fluentAndSalad(corpus: DataFrame, n: Int = 60): (String, String) = {
    val rows = corpus.select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("[^a-z]+").filter(_.nonEmpty))
    val big = scala.collection.mutable.Map.empty[(String, String), Int]
    val uni = scala.collection.mutable.Map.empty[String, Int]
    val benchTri = scala.collection.mutable.Set.empty[(String, String, String)]
    rows.foreach { case (id, t) =>
      t.foreach(w => uni(w) = uni.getOrElse(w, 0) + 1)
      t.sliding(2).foreach {
        case Array(a, b) => big((a, b)) = big.getOrElse((a, b), 0) + 1
        case _ =>
      }
      if (id % 97 == 0) t.sliding(3).foreach {
        case Array(a, b, c) => benchTri += ((a, b, c))
        case _ =>
      }
    }
    val used = scala.collection.mutable.Set.empty[(String, String)]
    var w = uni.toSeq.maxBy(t => (t._2, t._1))._1
    val walk = scala.collection.mutable.ArrayBuffer(w)
    def triOk(x: String): Boolean =
      walk.length < 2 || !benchTri((walk(walk.length - 2), w, x))
    while (walk.length < n) {
      val succ = big.collect {
        case ((a, b), c) if a == w && !used((a, b)) && triOk(b) => (c, b)
      }.toSeq.sortBy { case (c, b) => (-c, b) }
      val nxt = succ.headOption.map(_._2).getOrElse(
        uni.toSeq.sortBy(t => (-t._2, t._1))
          .collectFirst { case (u, _) if !used((w, u)) && triOk(u) => u }.get)
      used += ((w, nxt)); walk += nxt; w = nxt
    }
    val salad = uni.keys.toSeq
      .sortBy(s => scala.util.hashing.MurmurHash3.stringHash(s))
      .take(n).mkString(" ")
    (walk.mkString(" "), salad)
  }
}
