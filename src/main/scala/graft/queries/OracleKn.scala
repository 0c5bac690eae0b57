package graft.queries

/** Shared DuckDB-oracle CTE chain for the interpolated Kneser-Ney
  * bigram model ([[graft.operators.KnLm]]) — ONE source for the
  * fit-and-score replay that must stay bit-identical to the operator
  * (exact-integer model tables, one double discount, fixed nll
  * expression tree, sorted-bigram per-doc fold). q437 and the
  * perplexity curriculum (q471) compose the same fragment, the
  * OracleSketch/OracleVec consolidation pattern.
  *
  * Terminal CTE: `per_doc` (doc_id, source, n_bigrams, nllsum) —
  * documents with fewer than 2 alpha tokens have no bigram rows and
  * are absent, exactly like the operator's score output.
  */
private[queries] object OracleKn {

  val perDocCtes: String =
    """toks AS (
         SELECT doc_id, source,
                list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                  w -> w <> '') AS t
         FROM documents),
       db AS MATERIALIZED (
         SELECT doc_id, source, t[i + 1] AS w1, t[i + 2] AS w2,
                count(*) AS n
         FROM toks, unnest(generate_series(0, len(t) - 2)) AS u(i)
         WHERE len(t) >= 2
         GROUP BY 1, 2, 3, 4),
       bg AS MATERIALIZED (
         SELECT w1, w2, sum(n) AS c2 FROM db GROUP BY 1, 2),
       c1 AS MATERIALIZED (
         SELECT w1, sum(c2) AS c1, count(*) AS n1p FROM bg GROUP BY 1),
       npre AS MATERIALIZED (
         SELECT w2, count(*) AS npre FROM bg GROUP BY 1),
       disc AS (
         SELECT count(*) AS tt,
                CASE WHEN sum(CASE WHEN c2 = 1 THEN 1 ELSE 0 END) +
                          2 * sum(CASE WHEN c2 = 2 THEN 1 ELSE 0 END) = 0
                     THEN 0.75
                     ELSE CAST(sum(CASE WHEN c2 = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
                            (sum(CASE WHEN c2 = 1 THEN 1 ELSE 0 END) +
                             2 * sum(CASE WHEN c2 = 2 THEN 1 ELSE 0 END))
                END AS dd
         FROM bg),
       terms AS (
         SELECT db.doc_id, db.source, db.w1, db.w2, db.n,
                db.n * -ln(
                  greatest(CAST(bg.c2 AS DOUBLE) - disc.dd, 0.0) / c1.c1 +
                    ((disc.dd * c1.n1p) / c1.c1) *
                      (CAST(npre.npre AS DOUBLE) / disc.tt)) AS term
         FROM db
         JOIN bg ON bg.w1 = db.w1 AND bg.w2 = db.w2
         JOIN c1 ON c1.w1 = db.w1
         JOIN npre ON npre.w2 = db.w2
         CROSS JOIN disc),
       per_doc AS (
         SELECT doc_id, source, CAST(sum(n) AS BIGINT) AS n_bigrams,
                list_sum(list_transform(
                  list({'w1': w1, 'w2': w2, 'v': term} ORDER BY w1, w2),
                  e -> e.v)) AS nllsum
         FROM terms GROUP BY 1, 2)"""
}
