package graft.queries

/** Shared DuckDB-oracle CTE builders for the md5-family sketch
  * pipelines (the oracle-priced twins of the xxhash64 production
  * sketches) — ONE source for the minhash-LSH and simhash pair
  * relations that must stay bit-identical to
  * [[graft.operators.Dedup.minhashDedupMd5]] /
  * [[graft.operators.Dedup.simhashDedupMd5]]. Text.scala's q26/q27 and
  * the agreement audit (q461) compose the same fragments, so the two
  * engines' pipelines can never drift apart per-query.
  *
  * CTE names are prefixed (mh_ / sh_) so both relations can live in a
  * single WITH clause.
  */
private[queries] object OracleSketch {

  /** MinHash-LSH candidate CTEs (5-gram shingles, k=16 md5-family
    * signature, 4 raw-string band keys). Terminal CTE: `mh_est`
    * (id_a, id_b, e) — the caller filters `e >= threshold`.
    * `where`: SQL predicate choosing the document sample. */
  def minhashCtes(where: String): String = {
    val P = graft.functions.expressions.MinHashSignature.P
    val sigList = (0 until 16)
      .map { i =>
        val (a, b) = graft.functions.expressions.MinHashSignature.coef(i)
        s"list_min(list_transform(hx, x -> ($a * x + $b) % $P))"
      }
      .mkString("[", ", ", "]")
    val agree = (1 to 16)
      .map(i => s"CASE WHEN sig_a[$i] = sig_b[$i] THEN 1 ELSE 0 END")
      .mkString(" + ")
    val bandKey = (1 to 4)
      .map(j => s"sig[4 * t.b + $j]::VARCHAR")
      .mkString(" || ',' || ")
    s"""mh_d AS (
         SELECT doc_id,
           list_transform(
             list_distinct(list_transform(generate_series(1, length(text) - 4),
               i -> substring(text, i, 5))),
             s -> (('0x' || substr(md5(s), 1, 8))::BIGINT) % $P) AS hx
         FROM documents WHERE ($where) AND length(text) >= 5),
       mh_sigs AS (SELECT doc_id, $sigList AS sig FROM mh_d),
       mh_bands AS (
         SELECT doc_id, sig, t.b AS band_idx, $bandKey AS band_key
         FROM mh_sigs, unnest(generate_series(0, 3)) AS t(b)),
       mh_pairs AS (
         SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           a.sig AS sig_a, b.sig AS sig_b
         FROM mh_bands a JOIN mh_bands b
           ON a.band_idx = b.band_idx AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id),
       mh_est AS (
         SELECT id_a, id_b, ($agree) / 16.0 AS e
         FROM mh_pairs)"""
  }

  /** Connected-components CTEs over an edge relation `edgesCte`
    * (id_a, id_b): symmetric closure → recursive transitive closure →
    * min-reachable-id labeling. Terminal CTE: `cc_fam`
    * (doc_id, component). The caller's WITH must be RECURSIVE.
    * One source for the closure fragment q65/q368/q402/q417/q438/q474
    * replay (the older copies can migrate opportunistically, the
    * OracleVec discipline). */
  def componentsCtes(edgesCte: String): String =
    s"""cc_und AS (SELECT id_a AS a, id_b AS b FROM $edgesCte
               UNION SELECT id_b, id_a FROM $edgesCte),
       cc_cl AS (
         SELECT a, b FROM cc_und
         UNION
         SELECT cc_cl.a, u.b FROM cc_cl JOIN cc_und u ON cc_cl.b = u.a),
       cc_fam AS MATERIALIZED (
         SELECT a AS doc_id, least(a, min(b)) AS component
         FROM cc_cl GROUP BY a)"""

  /** SimHash candidate CTEs (whitespace tokens, 32-bit md5-family
    * signature, 4×8-bit chunk keys). Terminal CTE: `sh_ham`
    * (id_a, id_b, hamming) — the caller filters `hamming <= h`. */
  def simhashCtes(where: String): String = {
    val votes = (0 until 32)
      .map(b => s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS b$b")
      .mkString(", ")
    val packed = (0 until 32)
      .map(b => s"CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""sh_tok AS (
         SELECT doc_id,
           unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
         FROM documents WHERE ($where)),
       sh_h AS (
         SELECT doc_id, (('0x' || substr(md5(tok), 1, 8))::BIGINT) AS h
         FROM sh_tok),
       sh_v AS (SELECT doc_id, $votes FROM sh_h GROUP BY doc_id),
       sh_s AS (SELECT doc_id, CAST($packed AS BIGINT) AS simhash FROM sh_v),
       sh_chunks AS (
         SELECT doc_id, simhash, t.i AS chunk_idx,
           (simhash >> (8 * t.i)) & 255 AS chunk_key
         FROM sh_s, unnest(generate_series(0, 3)) AS t(i)),
       sh_pairs AS (
         SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           a.simhash AS sa, b.simhash AS sb
         FROM sh_chunks a JOIN sh_chunks b
           ON a.chunk_idx = b.chunk_idx AND a.chunk_key = b.chunk_key
              AND a.doc_id < b.doc_id),
       sh_ham AS (
         SELECT id_a, id_b, bit_count(xor(sa, sb)) AS hamming
         FROM sh_pairs)"""
  }
}
