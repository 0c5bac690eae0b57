package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{LabelPropagation, WeightedSample}

/** Round-4 surface, part 41: corpus-construction machinery — weighted
  * sampling, split hygiene, community structure, mixture planning,
  * distribution calibration, and burstiness screening.
  *
  * Everything here is exact-integer logic or single-division ratios of
  * exact integers; the only interpolating doubles are the q104-parity
  * percentiles (q293). No cross-row double folds at all.
  */
object Extras45 extends QueryPack {

  // --------------------------------------------------------------- q289
  /** Deterministic weighted reservoir sample (Efraimidis-Spirakis
    * A-Res, operators.WeightedSample): 5 docs per source, weight =
    * text length, "randomness" from an md5-derived uniform so both
    * engines draw the SAME sample. Selection runs on the full-precision
    * score (identical doubles — one pow of one exact ratio); the
    * rounded score is display-only. */
  private def q289(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    WeightedSample.sample(d, Seq("source"), "doc_id",
        length(col("text")), k = 5)
      .select(col("source"), col("sample_rank").as("rank"),
        col("doc_id"), round(col("sample_score"), 6).as("score"))
      .orderBy(col("source"), col("rank"))
  }

  private val q289Sql =
    """WITH scored AS (
         SELECT source, doc_id,
                pow(((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    ::BIGINT) % 1000003 + 1) / CAST(1000004 AS DOUBLE),
                  CAST(1 AS DOUBLE) / length(text)) AS s
         FROM documents),
       ranked AS (
         SELECT source, doc_id, s,
                row_number() OVER (PARTITION BY source
                  ORDER BY s DESC, doc_id) AS rank
         FROM scored)
       SELECT source, CAST(rank AS INT) AS rank, doc_id,
              round(s, 6) AS score
       FROM ranked WHERE rank <= 5 ORDER BY source, rank"""

  // --------------------------------------------------------------- q290
  /** Train/val/test split hygiene: docs land in 90/5/5 splits by md5
    * of doc_id; exact-duplicate content groups (md5 of normalized
    * text) that appear in more than one split are LEAKS — the audit a
    * training pipeline runs before anything ships. Per split: doc and
    * content-group counts and how many of its groups also live in
    * another split. Pure integer logic. */
  private def q290(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val b = pmod(conv(substring(md5(encode(col("doc_id").cast("string"),
      "UTF-8")), 1, 8), 16, 10).cast("long"), lit(20))
    val tagged = d.select(
      when(b < 18, "train").when(b === 18, "val").otherwise("test")
        .as("split"),
      md5(encode(graft.functions.TextFunctions.normalize(col("text")),
        "UTF-8")).as("ckey"))
    val sk = tagged.select("split", "ckey").distinct()
    val leaked = sk.as("a").join(sk.as("b"),
        col("a.ckey") === col("b.ckey")
          && col("a.split") =!= col("b.split"))
      .select(col("a.split").as("split"), col("a.ckey").as("ckey"))
      .distinct()
      .groupBy("split").agg(count(lit(1)).as("leaked"))
    tagged.groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("ckey").as("n_groups"))
      .join(leaked, Seq("split"), "left")
      .select(col("split"), col("n_docs").cast("long").as("n_docs"),
        col("n_groups").cast("long").as("n_groups"),
        coalesce(col("leaked"), lit(0L)).cast("long")
          .as("groups_leaked_elsewhere"))
      .orderBy("split")
  }

  private val q290Sql =
    """WITH tagged AS (
         SELECT CASE
                  WHEN (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    ::BIGINT) % 20 < 18 THEN 'train'
                  WHEN (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    ::BIGINT) % 20 = 18 THEN 'val'
                  ELSE 'test' END AS split,
                md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
                  AS ckey
         FROM documents),
       sk AS (SELECT DISTINCT split, ckey FROM tagged),
       leaked AS (
         SELECT split, count(*) AS leaked FROM (
           SELECT DISTINCT a.split, a.ckey
           FROM sk a JOIN sk b
             ON a.ckey = b.ckey AND a.split <> b.split)
         GROUP BY split)
       SELECT t.split, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(count(DISTINCT t.ckey) AS BIGINT) AS n_groups,
              CAST(coalesce(any_value(l.leaked), 0) AS BIGINT)
                AS groups_leaked_elsewhere
       FROM tagged t LEFT JOIN leaked l ON t.split = l.split
       GROUP BY t.split ORDER BY t.split"""

  // --------------------------------------------------------------- q291
  /** Weighted label propagation (operators.LabelPropagation, 4 rounds)
    * on the customer-nation ↔ supplier-nation trade graph — the same
    * 25-node graph PageRank (q133) ranks, now partitioned into
    * communities. All-integer tie-broken argmax per round, so the
    * unrolled oracle matches exactly.
    *
    * Runs the CHECKPOINTED loop form (checkpointEvery = 2): the values
    * are pinned identical to the pure unrolled form by
    * LabelPropagationSpec, but the unrolled plan is exactly the shape
    * that collapses under memory/JIT pressure (25.9 s vs 2.5 s in the
    * r6 driver bench) and at 100 TB its unbounded lineage depth is a
    * scale-killer — so the registered (benched AND verified) query uses
    * the bounded-lineage form, and the CTE-chain oracle still matches
    * because checkpointing only truncates lineage, never values. */
  private def q291(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val edges = t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .join(t("supplier"), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    val labels = LabelPropagation.run(edges, iters = 4, checkpointEvery = 2)
    labels
      .withColumn("community_size",
        count(lit(1)).over(Window.partitionBy("label")))
      .select(col("node").cast("long").as("node"),
        col("label").cast("long").as("label"),
        col("community_size").cast("long").as("community_size"))
      .orderBy("node")
  }

  private val q291Sql = {
    def round(i: Int): String =
      s"""s$i AS (
            SELECT e.src, l${i - 1}.label, sum(e.w) AS wt
            FROM e JOIN l${i - 1} ON e.dst = l${i - 1}.node
            GROUP BY 1, 2),
          l$i AS (
            SELECT src AS node, label FROM (
              SELECT src, label, row_number() OVER (PARTITION BY src
                ORDER BY wt DESC, label) AS rn
              FROM s$i) WHERE rn = 1)"""
    s"""WITH e0 AS (
         SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
                count(*) AS w
         FROM lineitem l
           JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
         WHERE c.c_nationkey <> s.s_nationkey
         GROUP BY 1, 2),
       e AS (
         SELECT src, dst, sum(w) AS w FROM (
           SELECT src, dst, w FROM e0
           UNION ALL SELECT dst, src, w FROM e0)
         GROUP BY 1, 2),
       l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
       ${(1 to 4).map(round).mkString(",\n       ")}
       SELECT CAST(node AS BIGINT) AS node, CAST(label AS BIGINT) AS label,
              CAST(count(*) OVER (PARTITION BY label) AS BIGINT)
                AS community_size
       FROM l4 ORDER BY node"""
  }

  // --------------------------------------------------------------- q292
  /** Token-budget mixture planner: given a 50%-of-corpus token budget
    * split equally across sources, the per-source sampling rate is
    * min(1, budget_share / supply) — undersupplied sources cap at 1
    * and flag a deficit. Exact integer token counts; the rate is one
    * division of exact integers. The planning table a weighted-mixing
    * job (q79) consumes. */
  private def q292(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val perSrc = d.select(col("source"),
        size(filter(split(trim(col("text")), "\\s+"),
          w => length(w) > 0)).as("toks"))
      .groupBy("source").agg(sum("toks").as("tok"))
    val tot = perSrc.agg(sum("tok").as("tt"), count(lit(1)).as("ns"))
    perSrc.crossJoin(broadcast(tot))
      .withColumn("share",
        floor(col("tt").cast("double") / (lit(2) * col("ns"))).cast("long"))
      .withColumn("rate",
        least(lit(1.0),
          col("share").cast("double") / col("tok")))
      .select(col("source"), col("tok").cast("long").as("n_tokens"),
        round(col("rate"), 6).as("rate"),
        floor(col("rate") * col("tok")).cast("long")
          .as("expected_tokens"),
        (col("tok") < col("share")).as("deficit"))
      .orderBy("source")
  }

  private val q292Sql =
    """WITH per AS (
         SELECT source,
                sum(len(list_filter(regexp_split_to_array(trim(text),
                  '\s+'), w -> w <> ''))) AS tok
         FROM documents GROUP BY 1),
       tot AS (SELECT sum(tok) AS tt, count(*) AS ns FROM per),
       plan AS (
         SELECT source, tok,
                CAST(floor(CAST(tt AS DOUBLE) / (2 * ns)) AS BIGINT)
                  AS share
         FROM per CROSS JOIN tot)
       SELECT source, CAST(tok AS BIGINT) AS n_tokens,
              round(least(CAST(1 AS DOUBLE), CAST(share AS DOUBLE) / tok), 6)
                AS rate,
              CAST(floor(least(CAST(1 AS DOUBLE),
                CAST(share AS DOUBLE) / tok) * tok)
                AS BIGINT) AS expected_tokens,
              tok < share AS deficit
       FROM plan ORDER BY source"""

  // --------------------------------------------------------------- q293
  /** Q-Q calibration table: order-value deciles per year against the
    * all-time deciles, long form with the ratio — how a year's price
    * distribution shifted, decile by decile. Exact-cents inputs; the
    * q104-parity interpolated percentile is the only double, and both
    * engines interpolate the same two integers. */
  private def q293(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val cents = o.select(year(col("o_orderdate")).as("yr"),
      floor(col("o_totalprice") * 100 + 0.5).as("c"))
    val probs = array((1 to 9).map(i => lit(i / 10.0)): _*)
    val yearly = cents.groupBy("yr")
      .agg(percentile(col("c"), probs).as("q"))
    val overall = cents.agg(percentile(col("c"), probs).as("oq"))
    yearly.crossJoin(broadcast(overall))
      .select(col("yr"), posexplode(arrays_zip(col("q"), col("oq"))))
      .select(col("yr").cast("int").as("yr"),
        ((col("pos") + 1) * 10).cast("int").as("decile"),
        round(col("col.q") / 100, 4).as("year_value"),
        round(col("col.oq") / 100, 4).as("overall_value"),
        round(col("col.q") / col("col.oq"), 5).as("ratio"))
      .orderBy("yr", "decile")
  }

  private val q293Sql =
    """WITH cents AS (
         SELECT CAST(year(o_orderdate) AS INT) AS yr,
                CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
         FROM orders),
       yq AS (
         SELECT yr, quantile_cont(c, [0.1, 0.2, 0.3, 0.4, 0.5,
                                      0.6, 0.7, 0.8, 0.9]) AS q
         FROM cents GROUP BY yr),
       oq AS (
         SELECT quantile_cont(c, [0.1, 0.2, 0.3, 0.4, 0.5,
                                  0.6, 0.7, 0.8, 0.9]) AS q
         FROM cents),
       g AS (SELECT unnest(generate_series(1, 9)) AS i)
       SELECT yq.yr, CAST(g.i * 10 AS INT) AS decile,
              round(yq.q[g.i] / 100, 4) AS year_value,
              round(oq.q[g.i] / 100, 4) AS overall_value,
              round(yq.q[g.i] / oq.q[g.i], 5) AS ratio
       FROM yq CROSS JOIN oq CROSS JOIN g
       ORDER BY yr, decile"""

  // --------------------------------------------------------------- q294
  /** Burstiness screen: Fano factor (variance/mean of daily event
    * counts, active days only) per user, top 20. The variance reduces
    * to the closed form (g·Q − S²)/(g·(g−1)) over EXACT integer sums
    * (g days, S events, Q sum of squares), so the Fano ratio is
    * bit-identical — ranking needs no rounding at all. */
  private def q294(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val daily = e.groupBy(col("user_id"),
        to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    daily.groupBy("user_id")
      .agg(count(lit(1)).as("g"), sum("c").as("s"),
        sum(col("c") * col("c")).as("q"))
      .filter(col("g") >= 5)
      .withColumn("fano",
        ((col("g") * col("q") - col("s") * col("s")).cast("double")
          / (col("g") * (col("g") - 1)))
          / (col("s").cast("double") / col("g")))
      .orderBy(col("fano").desc, col("user_id"))
      .limit(20)
      .select(col("user_id"), col("g").cast("long").as("active_days"),
        col("s").cast("long").as("n_events"),
        round(col("fano"), 5).as("fano"))
  }

  private val q294Sql =
    """WITH daily AS (
         SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS c
         FROM events GROUP BY 1, 2),
       agg AS (
         SELECT user_id, count(*) AS g, sum(c) AS s,
                sum(c * c) AS q
         FROM daily GROUP BY 1),
       fano AS (
         SELECT user_id, g, s,
                (CAST(g * q - s * s AS DOUBLE) / (g * (g - 1)))
                  / (CAST(s AS DOUBLE) / g) AS fano
         FROM agg WHERE g >= 5)
       SELECT user_id, CAST(g AS BIGINT) AS active_days,
              CAST(s AS BIGINT) AS n_events, round(fano, 5) AS fano
       FROM fano ORDER BY fano DESC, user_id LIMIT 20"""

  override def queries: Map[String, QueryFn] = Map(
    "q289_weighted_sample" -> q289 _,
    "q290_split_leakage"   -> q290 _,
    "q291_label_prop"      -> q291 _,
    "q292_mixture_plan"    -> q292 _,
    "q293_qq_calibration"  -> q293 _,
    "q294_burstiness"      -> q294 _)

  override def oracles: Map[String, String] = Map(
    "q289_weighted_sample" -> q289Sql,
    "q290_split_leakage"   -> q290Sql,
    "q291_label_prop"      -> q291Sql,
    "q292_mixture_plan"    -> q292Sql,
    "q293_qq_calibration"  -> q293Sql,
    "q294_burstiness"      -> q294Sql)
}
