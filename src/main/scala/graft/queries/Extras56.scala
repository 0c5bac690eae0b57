package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{ConnectedComponents, SetSimilarityJoin, Similarity, SubstringDedup}

/** Round-7 pack, part 3: feature-engineering statistics — mutual
  * information between categorical features (q365, completing the
  * dependence ladder next to chi-square q218, eta-squared q342 and JS
  * divergence q284), the hashing-trick bucket audit (q366, the
  * collision/load table that sizes a feature-hashed vectorizer),
  * multi-probe SRP-LSH (q367, the recall-at-same-index-size rung of
  * the ANN ladder) and canonical-member selection per near-dup cluster
  * (q368, the retention policy that turns q65's clusters into a kept
  * set).
  */
object Extras56 extends QueryPack {

  private val Dim = 64

  // DuckDB twins of VectorFunctions.dot/norm (same as the Vectors pack)
  import OracleVec.{dotSql, normSql}

  // --------------------------------------------------------------- q365
  /** Mutual information between event type and 6-hour day band, in
    * nats: MI = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))). All probabilities are
    * exact integer counts divided once; the ln argument is the exact
    * integer ratio (n·N)/(n_x·n_y), so both engines evaluate the same
    * double to the bit. One grouped aggregate + three window sums over
    * the (|X|·|Y|)-row joint table — the marginals never rescan the
    * fact. Per-cell terms plus the headline MI on every row. */
  private def q365(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events").select(
      col("event_type").as("x"),
      floor(hour(col("ts")) / 6).cast("int").as("band"))
    val joint = e.groupBy("x", "band").agg(count(lit(1)).as("n"))
    val wx = Window.partitionBy("x")
    val wy = Window.partitionBy("band")
    val wall = Window.partitionBy(lit(1))
    val out = joint
      .withColumn("nx", sum("n").over(wx))
      .withColumn("ny", sum("n").over(wy))
      .withColumn("nn", sum("n").over(wall))
    val term = (col("n").cast("double") / col("nn")) *
      log((col("n") * col("nn")).cast("double") / (col("nx") * col("ny")))
    out.select(col("x"), col("band").cast("long").as("band"),
        col("n").cast("long").as("n"),
        round(col("n").cast("double") / col("nn"), 6).as("p_xy"),
        term.as("mi_term"))
      .withColumn("mi_total",
        round(sum("mi_term").over(Window.partitionBy(lit(1))), 6))
      .withColumn("mi_term", round(col("mi_term"), 6))
      .orderBy("x", "band")
  }

  private val q365Sql =
    """WITH ev AS (
         SELECT event_type AS x,
                CAST(floor(hour(ts) / 6.0) AS INTEGER) AS band
         FROM events),
       joint AS (SELECT x, band, count(*) AS n FROM ev GROUP BY x, band),
       m AS (
         SELECT x, band, n,
                sum(n) OVER (PARTITION BY x) AS nx,
                sum(n) OVER (PARTITION BY band) AS ny,
                sum(n) OVER () AS nn
         FROM joint),
       t AS (
         SELECT x, CAST(band AS BIGINT) AS band, CAST(n AS BIGINT) AS n,
                round(CAST(n AS DOUBLE) / nn, 6) AS p_xy,
                (CAST(n AS DOUBLE) / nn)
                  * ln(CAST(n * nn AS DOUBLE) / (nx * ny)) AS mi_term
         FROM m)
       SELECT x, band, n, p_xy,
              round(mi_term, 6) AS mi_term,
              round(sum(mi_term) OVER (), 6) AS mi_total
       FROM t ORDER BY x, band"""

  // --------------------------------------------------------------- q366
  /** Hashing-trick bucket audit: every corpus token hashes into one of
    * 64 buckets (md5-uniform, the engine's replayable hash family) with
    * a ±1 sign from the next md5 nibble — exactly the signed feature
    * hashing of Weinberger et al. 2009. The output is the table that
    * sizes a hashed vectorizer: per-bucket occurrence load, distinct
    * tokens (collisions), and the signed mass whose cancellation is the
    * trick's variance control. One explode + one 64-group hash-agg; at
    * 100 TB the shuffle carries (bucket, token-hash) pairs, never text. */
  private def q366(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables(s, dir)("documents")
      .select(explode(SubstringDedup.tokens(col("text"))).as("tok"))
    val h = md5(concat(col("tok"), lit("-fh")))
    val hashed = toks.select(
      (conv(substring(h, 1, 8), 16, 10).cast("long") % 64).as("bucket"),
      when(substring(h, 9, 1) < "8", 1L).otherwise(-1L).as("sign"),
      col("tok"))
    hashed.groupBy("bucket")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("tok")).as("n_distinct"),
        sum("sign").as("signed_mass"))
      .withColumn("total",
        sum("n_occurrences").over(Window.partitionBy(lit(1))))
      .select(col("bucket"),
        col("n_occurrences").cast("long").as("n_occurrences"),
        col("n_distinct").cast("long").as("n_distinct"),
        col("signed_mass").cast("long").as("signed_mass"),
        round(col("n_occurrences").cast("double") / col("total"), 6)
          .as("load_share"))
      .orderBy("bucket")
  }

  private val q366Sql =
    """WITH toks AS (
         SELECT unnest(list_filter(
                  regexp_split_to_array(lower(text), '[^a-z]+'),
                  w -> w <> '')) AS tok
         FROM documents),
       hashed AS (
         SELECT ('0x' || substr(md5(tok || '-fh'), 1, 8))::BIGINT % 64
                  AS bucket,
                CASE WHEN substr(md5(tok || '-fh'), 9, 1) < '8'
                     THEN 1 ELSE -1 END AS sign,
                tok
         FROM toks),
       g AS (
         SELECT bucket, count(*) AS n_occurrences,
                count(DISTINCT tok) AS n_distinct,
                sum(sign) AS signed_mass,
                sum(count(*)) OVER () AS total
         FROM hashed GROUP BY bucket)
       SELECT bucket,
              CAST(n_occurrences AS BIGINT) AS n_occurrences,
              CAST(n_distinct AS BIGINT) AS n_distinct,
              CAST(signed_mass AS BIGINT) AS signed_mass,
              round(CAST(n_occurrences AS DOUBLE) / total, 6) AS load_share
       FROM g ORDER BY bucket"""

  // --------------------------------------------------------------- q367
  /** Multi-probe SRP-LSH (Lv et al. 2007): q30's index, but every query
    * band also probes its r one-bit-flip keys — recall rises at the
    * SAME index size, cost lands on the small query side only. The
    * oracle bakes the identical hyperplane doubles and replays probe
    * generation with xor over a correlated unnest; the zero-norm guard
    * matches the Scala side (q345 discipline). Candidates ⊇ q30's by
    * construction (the probe set contains the exact key). */
  private def q367(s: SparkSession, dir: String): DataFrame = {
    val all = Tables(s, dir)("embeddings")
    val queries = all.filter(pmod(col("vec_id"), lit(50)) === 0)
    Similarity.srpMultiProbeTopK(all, queries, "vec_id", "embedding",
        k = 5, dim = Dim)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
              round(col("cos"), 6).as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val q367Sql: String = {
    val bits = 16
    val bands = 4
    val r = bits / bands
    val mask = (1 << r) - 1
    def hpList(b: Int): String =
      Similarity.hyperplane(b, Dim)
        .map { d =>
          val s = d.toString
          if (s.contains("E") || s.contains("e")) s else s + "e0"
        }
        .mkString("[", ", ", "]")
    val sigExpr = (0 until bits)
      .map(b => s"CASE WHEN ${dotSql("embedding", s"(${hpList(b)})")} > 0 THEN ${1 << b} ELSE 0 END")
      .mkString(" + ")
    val probeList = ("band_key" +: (0 until r).map(j => s"xor(band_key, ${1 << j})"))
      .mkString("[", ", ", "]")
    s"""WITH sigs AS (
         SELECT vec_id, CAST($sigExpr AS BIGINT) AS sig FROM embeddings),
       bands AS (
         SELECT vec_id, t.b AS band_idx, (sig >> ($r * t.b)) & $mask AS band_key
         FROM sigs, unnest(generate_series(0, ${bands - 1})) AS t(b)),
       qprobes AS (
         SELECT vec_id, band_idx, p.pk AS band_key
         FROM bands, unnest($probeList) AS p(pk)
         WHERE vec_id % 50 = 0),
       cand AS (
         SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         FROM qprobes q JOIN bands c
           ON q.band_idx = c.band_idx AND q.band_key = c.band_key
         WHERE q.vec_id <> c.vec_id),
       scored AS (
         SELECT query_id, neighbor_id,
           CASE WHEN ${normSql("eq.embedding")} * ${normSql("ec.embedding")} = 0
                THEN 0.0
                ELSE ${dotSql("eq.embedding", "ec.embedding")} /
                  (${normSql("eq.embedding")} * ${normSql("ec.embedding")})
           END AS cos
         FROM cand
         JOIN embeddings eq ON eq.vec_id = query_id
         JOIN embeddings ec ON ec.vec_id = neighbor_id),
       ranked AS (
         SELECT query_id, neighbor_id, cos,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         FROM scored)
       SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, round(cos, 6) AS cos
       FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""
  }

  // --------------------------------------------------------------- q368
  /** Canonical-member selection — the retention policy over q65's
    * near-dup clusters: within each cluster keep the member with the
    * largest L2 norm (deterministic centrality proxy; both engines sum
    * the squared floats in array order, so the norms are bit-identical)
    * and report what the policy drops. Composes ConnectedComponents
    * with a per-cluster argmax (row_number over a size-bounded group,
    * rides WindowGroupLimit) — at 100 TB the clusters table is the
    * small output of the contraction, not the corpus. */
  private def q368(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir)("embeddings")
    val pairs = Similarity.nearDupPairs(emb, "vec_id", "embedding",
        blockCol = "label", threshold = 0.3)
      .select(col("id_a"), col("id_b"))
    val clusters = ConnectedComponents.components(pairs, "id_a", "id_b")
      .select(col("id").as("vec_id"), col("component").as("cluster"))
    val withNorm = clusters.join(
      emb.select(col("vec_id"),
        graft.functions.VectorFunctions.norm(
          graft.functions.VectorFunctions.toDoubleVec(col("embedding")))
          .as("nrm")),
      "vec_id")
    val w = Window.partitionBy("cluster")
      .orderBy(col("nrm").desc, col("vec_id"))
    withNorm.withColumn("rk", row_number().over(w))
      .groupBy("cluster")
      .agg(count(lit(1)).cast("long").as("n_members"),
        max(when(col("rk") === 1, col("vec_id"))).as("canonical_id"),
        round(max(when(col("rk") === 1, col("nrm"))), 6).as("canonical_norm"),
        (count(lit(1)) - 1).cast("long").as("n_dropped"))
      .orderBy("cluster")
  }

  private val q368Sql: String = {
    s"""WITH RECURSIVE
       p AS (
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ${dotSql("a.embedding", "b.embedding")} /
             (${normSql("a.embedding")} * ${normSql("b.embedding")}) AS cos
         FROM embeddings a JOIN embeddings b
           ON a.label = b.label AND a.vec_id < b.vec_id),
       edges AS (SELECT id_a, id_b FROM p WHERE cos >= 0.3),
       und AS (SELECT id_a AS a, id_b AS b FROM edges
               UNION SELECT id_b, id_a FROM edges),
       cc AS (
         SELECT a, b FROM und
         UNION
         SELECT cc.a, u.b FROM cc JOIN und u ON cc.b = u.a),
       clusters AS (
         SELECT a AS vec_id, least(a, min(b)) AS cluster
         FROM cc GROUP BY a),
       withnorm AS (
         SELECT c.cluster, c.vec_id, ${normSql("e.embedding")} AS nrm
         FROM clusters c JOIN embeddings e ON c.vec_id = e.vec_id),
       ranked AS (
         SELECT cluster, vec_id, nrm,
           row_number() OVER (PARTITION BY cluster
                              ORDER BY nrm DESC, vec_id) AS rk
         FROM withnorm)
       SELECT cluster,
              CAST(count(*) AS BIGINT) AS n_members,
              max(CASE WHEN rk = 1 THEN vec_id END) AS canonical_id,
              round(max(CASE WHEN rk = 1 THEN nrm END), 6) AS canonical_norm,
              CAST(count(*) - 1 AS BIGINT) AS n_dropped
       FROM ranked GROUP BY cluster ORDER BY cluster"""
  }

  // --------------------------------------------------------------- q369
  /** Exact set-similarity join via prefix filtering (AllPairs/PPJoin):
    * the deterministic ground truth for the MinHash sketch family, over
    * the same word-shingle universe. The prefix rule (zero false
    * negatives under a rarest-first global order — see
    * [[graft.operators.SetSimilarityJoin]]) prunes the ~125k possible
    * pairs to the ~25 genuine near-dups before any pairwise work; the
    * output is EXACT Jaccard, not an estimate. */
  private def q369(s: SparkSession, dir: String): DataFrame =
    SetSimilarityJoin.pairs(Tables(s, dir)("documents"),
        "doc_id", "text", k = 4, tau = 0.6)
      .select(col("id_a"), col("id_b"),
        col("n_inter").cast("long").as("n_inter"),
        col("n_union").cast("long").as("n_union"),
        round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_a", "id_b")

  private val q369Sql =
    """WITH toks AS (
         SELECT doc_id, list_filter(
                  regexp_split_to_array(lower(text), '[^a-z]+'),
                  w -> w <> '') AS t
         FROM documents),
       sh AS (
         SELECT DISTINCT doc_id,
                substring(md5(array_to_string(t[i + 1:i + 4], ' ')), 1, 16)
                  AS g
         FROM toks, unnest(generate_series(0, len(t) - 4)) AS u(i)
         WHERE len(t) >= 4),
       gf AS (SELECT g, count(*) AS df FROM sh GROUP BY g),
       ranked AS (
         SELECT s.doc_id, s.g,
                row_number() OVER (PARTITION BY s.doc_id
                                   ORDER BY gf.df, s.g) AS pos,
                count(*) OVER (PARTITION BY s.doc_id) AS m
         FROM sh s JOIN gf ON s.g = gf.g),
       prefix AS (
         SELECT doc_id, g FROM ranked
         WHERE pos <= m - ceil(0.6 * m) + 1),
       cand AS (
         SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM prefix a JOIN prefix b
           ON a.g = b.g AND a.doc_id < b.doc_id),
       sizes AS (SELECT doc_id, count(*) AS m FROM sh GROUP BY doc_id),
       inter AS (
         SELECT c.id_a, c.id_b, count(*) AS i
         FROM cand c
         JOIN sh x ON x.doc_id = c.id_a
         JOIN sh y ON y.doc_id = c.id_b AND x.g = y.g
         GROUP BY c.id_a, c.id_b),
       j AS (
         SELECT id_a, id_b, i, sa.m + sb.m - i AS u
         FROM inter
         JOIN sizes sa ON sa.doc_id = id_a
         JOIN sizes sb ON sb.doc_id = id_b)
       SELECT id_a, id_b, CAST(i AS BIGINT) AS n_inter,
              CAST(u AS BIGINT) AS n_union,
              round(CAST(i AS DOUBLE) / u, 6) AS jaccard
       FROM j WHERE CAST(i AS DOUBLE) / u >= 0.6
       ORDER BY id_a, id_b"""

  // --------------------------------------------------------------- q370
  /** Join-size estimation by keyed Bernoulli sampling — the optimizer's
    * cardinality problem as a driver-checked query: |R ⋈_key R| = Σ c²
    * over key counts, estimated from the keys whose md5-uniform falls
    * below p = 0.1 (each sampled key contributes c²/p). Deterministic
    * sampling makes the estimate replayable; at 100 TB the sample
    * decision is a row-local predicate on the already-aggregated key
    * counts — no second scan, no shuffle beyond the count itself. */
  private def q370(s: SparkSession, dir: String): DataFrame = {
    val p = 0.1
    val counts = Tables(s, dir)("lineitem")
      .groupBy("l_partkey").agg(count(lit(1)).as("c"))
    val exact = counts.agg(
      sum(col("c") * col("c")).cast("long").as("exact_pairs"),
      count(lit(1)).cast("long").as("n_keys"))
    val est = counts
      .filter(graft.operators.Anonymize.md5Uniform(col("l_partkey"), "js") < p)
      .agg((sum(col("c") * col("c")) / p).as("est_raw"),
           count(lit(1)).cast("long").as("n_sampled"))
    exact.crossJoin(est)
      .select(col("exact_pairs"), col("n_keys"), col("n_sampled"),
        round(col("est_raw"), 2).as("est_pairs"),
        round(abs(col("est_raw") - col("exact_pairs")) / col("exact_pairs"), 6)
          .as("rel_err"))
  }

  private val q370Sql =
    """WITH counts AS (
         SELECT l_partkey, count(*) AS c FROM lineitem GROUP BY l_partkey),
       ex AS (
         SELECT CAST(sum(c * c) AS BIGINT) AS exact_pairs,
                CAST(count(*) AS BIGINT) AS n_keys
         FROM counts),
       est AS (
         SELECT sum(c * c) / 0.1 AS est_raw,
                CAST(count(*) AS BIGINT) AS n_sampled
         FROM counts
         WHERE ('0x' || substr(md5(CAST(l_partkey AS VARCHAR) || '-js'),
                  1, 8))::BIGINT / 4294967296.0 < 0.1)
       SELECT exact_pairs, n_keys, n_sampled,
              round(est_raw, 2) AS est_pairs,
              round(abs(est_raw - exact_pairs) / exact_pairs, 6) AS rel_err
       FROM ex, est"""

  // --------------------------------------------------------------- q371
  /** Unlabeled-corpus embedding near-dup: SRP bands as the blocking key
    * (no label needed — the promise in nearDupPairs' scaladoc, now
    * driver-checked). Exact cosine verifies every candidate, so
    * precision is exact; recall is the banded collision probability and
    * the oracle replays the SAME blocking (hyperplane literals), so the
    * output is deterministic and engine-identical. */
  private def q371(s: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairsSrp(Tables(s, dir)("embeddings"),
        "vec_id", "embedding", threshold = 0.4, dim = Dim)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
      .orderBy("id_a", "id_b")

  private val q371Sql: String = {
    val bits = 16
    val bands = 4
    val r = bits / bands
    val mask = (1 << r) - 1
    def hpList(b: Int): String =
      Similarity.hyperplane(b, Dim)
        .map { d =>
          val s = d.toString
          if (s.contains("E") || s.contains("e")) s else s + "e0"
        }
        .mkString("[", ", ", "]")
    val sigExpr = (0 until bits)
      .map(b => s"CASE WHEN ${dotSql("embedding", s"(${hpList(b)})")} > 0 THEN ${1 << b} ELSE 0 END")
      .mkString(" + ")
    s"""WITH sigs AS (
         SELECT vec_id, CAST($sigExpr AS BIGINT) AS sig FROM embeddings),
       bands AS (
         SELECT vec_id, t.b AS band_idx, (sig >> ($r * t.b)) & $mask AS band_key
         FROM sigs, unnest(generate_series(0, ${bands - 1})) AS t(b)),
       cand AS (
         SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         FROM bands a JOIN bands b
           ON a.band_idx = b.band_idx AND a.band_key = b.band_key
              AND a.vec_id < b.vec_id),
       scored AS (
         SELECT id_a, id_b,
           CASE WHEN ${normSql("ea.embedding")} * ${normSql("eb.embedding")} = 0
                THEN 0.0
                ELSE ${dotSql("ea.embedding", "eb.embedding")} /
                  (${normSql("ea.embedding")} * ${normSql("eb.embedding")})
           END AS cos
         FROM cand
         JOIN embeddings ea ON ea.vec_id = id_a
         JOIN embeddings eb ON eb.vec_id = id_b)
       SELECT id_a, id_b, round(cos, 6) AS cos
       FROM scored WHERE cos >= 0.4 ORDER BY id_a, id_b"""
  }

  // --------------------------------------------------------------- q372
  /** WEIGHTED PageRank over the full nation trade graph: rank mass
    * flows in proportion to each pair's line-count share of the
    * source's out-volume, so the complete graph (which collapses
    * unweighted HITS/PageRank toward uniformity) still yields a
    * meaningful importance ordering — the weights ARE the structure.
    * Five unrolled iterations; weight shares are exact-integer ratios,
    * so the CTE-chain oracle replays the ranks bit-for-bit (q133
    * discipline, weighted). */
  private def q372(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val edges = t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .join(t("supplier"), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("weight"))
    graft.operators.PageRank.runWeighted(edges, iters = 5)
      .select(col("node"), round(col("rank"), 6).as("rank"))
      .orderBy("node")
  }

  private val q372Sql: String = {
    val base =
      """WITH e AS MATERIALIZED (
           SELECT c_nationkey AS src, s_nationkey AS dst, count(*) AS w
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN supplier ON l_suppkey = s_suppkey
           GROUP BY 1, 2),
         nodes AS MATERIALIZED (
           SELECT src AS node FROM e UNION SELECT dst FROM e),
         ow AS MATERIALIZED (
           SELECT src, sum(w) AS tw FROM e GROUP BY src),
         pr0 AS MATERIALIZED (
           SELECT node, 1.0::DOUBLE AS rank FROM nodes)"""
    val iters = (1 to 5).map { k =>
      s""",
         pr$k AS MATERIALIZED (
           SELECT n.node,
                  (1.0::DOUBLE - 0.85::DOUBLE)
                    + 0.85::DOUBLE * coalesce(m.mass, 0::DOUBLE) AS rank
           FROM nodes n LEFT JOIN (
             SELECT e.dst AS node, sum(p.rank * e.w / ow.tw) AS mass
             FROM pr${k - 1} p
             JOIN e ON p.node = e.src
             JOIN ow ON e.src = ow.src
             GROUP BY 1) m ON n.node = m.node)"""
    }.mkString
    base + iters +
      "\n       SELECT node, round(rank, 6) AS rank FROM pr5 ORDER BY node"
  }

  // --------------------------------------------------------------- q375
  /** Declarative expectations run (dbt-test / Deequ shape): eight rules
    * over four tables compile into ONE aggregate per table plus one
    * anti-join per FK rule — see [[graft.quality.Expectations]]. Rule
    * e6 (l_tax ≤ 0.05) is deliberately tighter than the data, so the
    * run demonstrates a non-zero violation count flowing through, not
    * just a wall of green. */
  private def q375(s: SparkSession, dir: String): DataFrame = {
    import graft.quality.Expectations._
    val t = Tables(s, dir)
    run(s, Map(
      "customer"  -> t("customer"),
      "orders"    -> t("orders"),
      "lineitem"  -> t("lineitem"),
      "events"    -> t("events"),
      "documents" -> t("documents")),
      Seq(
        NotNull("e1", "customer", "c_custkey"),
        Unique("e2", "customer", "c_custkey"),
        ForeignKey("e3", "orders", "o_custkey", "customer", "c_custkey"),
        InRange("e4", "lineitem", "l_quantity", 1, 50),
        InRange("e5", "lineitem", "l_discount", 0, 0.1),
        InRange("e6", "lineitem", "l_tax", 0, 0.05),
        InSet("e7", "events", "event_type",
          Seq("view", "click", "signup", "purchase", "error")),
        Unique("e8", "documents", "doc_id")))
  }

  private val q375Sql =
    """WITH u AS (
         SELECT 'e1' AS rule_id, 'customer' AS tbl,
                'not_null(c_custkey)' AS rule,
                CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_violations
         FROM customer
         UNION ALL
         SELECT 'e2', 'customer', 'unique(c_custkey)',
                CAST(count(c_custkey) - count(DISTINCT c_custkey) AS BIGINT)
         FROM customer
         UNION ALL
         SELECT 'e3', 'orders', 'fk(o_custkey -> customer.c_custkey)',
                CAST(count(*) AS BIGINT)
         FROM orders WHERE o_custkey IS NOT NULL
           AND o_custkey NOT IN (SELECT c_custkey FROM customer
                                 WHERE c_custkey IS NOT NULL)
         UNION ALL
         SELECT 'e4', 'lineitem', 'in_range(l_quantity, 1.0, 50.0)',
                CAST(sum(CASE WHEN l_quantity IS NULL OR l_quantity < 1
                              OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT)
         FROM lineitem
         UNION ALL
         SELECT 'e5', 'lineitem', 'in_range(l_discount, 0.0, 0.1)',
                CAST(sum(CASE WHEN l_discount IS NULL OR l_discount < 0
                              OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT)
         FROM lineitem
         UNION ALL
         SELECT 'e6', 'lineitem', 'in_range(l_tax, 0.0, 0.05)',
                CAST(sum(CASE WHEN l_tax IS NULL OR l_tax < 0
                              OR l_tax > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
         FROM lineitem
         UNION ALL
         SELECT 'e7', 'events', 'in_set(event_type)',
                CAST(sum(CASE WHEN event_type IS NULL OR event_type NOT IN
                              ('view','click','signup','purchase','error')
                              THEN 1 ELSE 0 END) AS BIGINT)
         FROM events
         UNION ALL
         SELECT 'e8', 'documents', 'unique(doc_id)',
                CAST(count(doc_id) - count(DISTINCT doc_id) AS BIGINT)
         FROM documents)
       SELECT rule_id, tbl, rule, n_violations,
              CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS INT)
                AS passed
       FROM u ORDER BY rule_id"""

  override def queries: Map[String, QueryFn] = Map(
    "q375_expectations"      -> q375 _,
    "q372_weighted_pagerank" -> q372 _,
    "q371_srp_neardup"    -> q371 _,
    "q365_mutual_info"    -> q365 _,
    "q366_feature_hash"   -> q366 _,
    "q367_multiprobe_srp" -> q367 _,
    "q368_canonical_pick" -> q368 _,
    "q369_setsim_join"    -> q369 _,
    "q370_joinsize_est"   -> q370 _)

  override def oracles: Map[String, String] = Map(
    "q375_expectations"      -> q375Sql,
    "q372_weighted_pagerank" -> q372Sql,
    "q371_srp_neardup"    -> q371Sql,
    "q365_mutual_info"    -> q365Sql,
    "q366_feature_hash"   -> q366Sql,
    "q367_multiprobe_srp" -> q367Sql,
    "q368_canonical_pick" -> q368Sql,
    "q369_setsim_join"    -> q369Sql,
    "q370_joinsize_est"   -> q370Sql)
}
