package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join via prefix filtering — the
  * AllPairs/PPJoin candidate rule (Bayardo et al. 2007; Xiao et al.
  * 2008): the deterministic ground-truth counterpart of MinHash-LSH.
  *
  * Each document reduces to its distinct word-k-gram shingle set
  * (64-bit md5-prefix keys, never text). Under a fixed GLOBAL shingle
  * order (rarest first: ascending document frequency, then key), two
  * sets with Jaccard ≥ τ MUST share at least one shingle among each
  * set's first m − ⌈τ·m⌉ + 1 shingles (if they shared none, the
  * intersection is confined to the suffixes, which are too small to
  * reach τ). So indexing only those PREFIX shingles generates a
  * candidate set with zero false negatives, and rare-first ordering
  * makes it small: on this corpus the rule prunes the ~125k possible
  * pairs to the ~25 genuine near-dup pairs before any pairwise work.
  *
  * Scale shape: one gram shuffle for the document-frequency join + the
  * per-doc rank window (both partition on the same keys), a prefix⋈
  * prefix equi-join on the rare shingle keys (skew-free by
  * construction: a prefix shingle is rare by the ordering), and exact
  * intersection counting ONLY for surviving candidates. Versus MinHash:
  * no probability of a missed pair and exact Jaccard in the output, at
  * the cost of carrying the full (id, gram) relation into the verify
  * join — use this as the audit/ground-truth path and MinHash (q26/
  * q343) as the sketch path over the same shingle universe.
  */
object SetSimilarityJoin {

  /** All pairs with shingle-set Jaccard ≥ τ.
    * Output: (id_a, id_b, n_inter, n_union, jaccard), id_a < id_b. */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
            k: Int, tau: Double): DataFrame = {
    require(k >= 2 && tau > 0.0 && tau <= 1.0)
    // materialized ONCE: sh feeds five subtrees (df counts, the rank
    // window, both prefix-join sides, both verify-join sides, sizes) —
    // without this the corpus re-tokenizes per subtree unless
    // ReuseExchange happens to collapse every copy (same discipline as
    // minhashDedup's signature checkpoint / KMeans input caching)
    val sh = Spread.byKey(docs, col(idCol))
      .select(col(idCol).as("id"),
        SubstringDedup.tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= k)
      .select(col("id"), explode(transform(
        sequence(lit(0), size(col("t")) - k),
        i => SubstringDedup.md5Gram(
          concat_ws(" ", slice(col("t"), i + 1, lit(k)))))).as("g"))
      .distinct()
      .localCheckpoint()
    val gf = sh.groupBy("g").agg(count(lit(1)).as("df"))
    val ranked = sh.join(gf, "g")
      .withColumn("pos",
        row_number().over(Window.partitionBy("id").orderBy("df", "g")))
      .withColumn("m", count(lit(1)).over(Window.partitionBy("id")))
    val prefix = ranked
      .filter(col("pos") <= col("m") - ceil(lit(tau) * col("m")) + 1)
      .select("id", "g")
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("m"))
    val inter = cand
      .join(sh.as("x"), col("x.id") === col("id_a"))
      .join(sh.as("y"),
        col("y.id") === col("id_b") && col("x.g") === col("y.g"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.as("sa"), col("sa.id") === col("id_a"))
      .join(sizes.as("sb"), col("sb.id") === col("id_b"))
      .select(col("id_a"), col("id_b"), col("n_inter"),
        (col("sa.m") + col("sb.m") - col("n_inter")).as("n_union"))
      .withColumn("jaccard", col("n_inter").cast("double") / col("n_union"))
      .filter(col("jaccard") >= tau)
  }
}
