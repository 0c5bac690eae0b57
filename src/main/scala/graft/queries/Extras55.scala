package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.expressions.InterleaveBits
import graft.operators.{Anonymize, Hits, RandomWalk, Salting}

/** Round-7 pack, part 2: the scale-toolkit operators that had specs but
  * no driver-checkable query — explicit skew salting (q359) and the
  * Morton-curve interleave behind OPTIMIZE ZORDER BY (q360) — plus KMV
  * sketch set algebra (q361), distribution-drift monitoring via PSI
  * (q362), HITS hub/authority closing the graph family next to
  * PageRank / label propagation / components / triangles (q363), and
  * deterministic random walks — the DeepWalk/node2vec sampling pass —
  * replayed hop-for-hop by the oracle (q364).
  */
object Extras55 extends QueryPack {

  /** floor(expr*100 + 0.5): the exact-integer-cents map (see q204) —
    * money sums are order-independent longs, so Spark's partial-agg
    * order can never drift from DuckDB's single-threaded sum. */
  private def cents(c: Column): Column = floor(c * 100 + 0.5)

  // --------------------------------------------------------------- q359
  /** Brand revenue through an EXPLICITLY SALTED join: the probe side
    * (lineitem) takes a deterministic 8-way salt hashed from its own
    * row identity, the build side (part) is replicated ×8, and the join
    * key becomes (partkey, salt) — so a hot key's probe rows spread
    * across 8 tasks instead of one. The oracle is the PLAIN join: the
    * whole point of salting is that the result is identical, only the
    * task-level distribution changes. At 100 TB this is the manual tool
    * for extreme known skew where AQE's sort-merge skew split doesn't
    * apply (e.g. a forced broadcast-hash join); the build side grows
    * ×saltFactor, so it stays the small side. */
  private def q359(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val joined = Salting.saltedInnerJoin(
      t("lineitem"), "l_partkey", t("part"), "p_partkey",
      saltFactor = 8, saltSource = Seq("l_orderkey", "l_linenumber"))
    joined.groupBy("p_brand")
      .agg(count(lit(1)).cast("long").as("n_lines"),
        (sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))) / 100)
          .as("revenue"))
      .orderBy("p_brand")
  }

  private val q359Sql =
    """SELECT p_brand,
              CAST(count(*) AS BIGINT) AS n_lines,
              sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)) / 100
                AS revenue
       FROM lineitem JOIN part ON l_partkey = p_partkey
       GROUP BY p_brand ORDER BY p_brand"""

  // --------------------------------------------------------------- q360
  /** Morton-curve cell audit — oracles the native [[InterleaveBits]]
    * codegen expression (the kernel of ZOrder.clusterWrite) bit-for-bit:
    * two 8-bit dimensions interleave into a 16-bit z-value, and grouping
    * by the TOP 6 z-bits must yield exactly the 64 aligned 32×32 squares
    * of the curve — every cell's bounding box (x_span, y_span ≤ 32) is
    * the property that makes parquet min/max footers selective on EITHER
    * column after a z-clustered write. The DuckDB twin rebuilds the
    * interleave as explicit shift-mask-add bit math, so a single bit
    * placed wrong in the expression breaks the hash match. One scan, one
    * 64-group agg — free at any scale. */
  private def q360(s: SparkSession, dir: String): DataFrame = {
    val xy = Tables(s, dir)("lineitem").select(
      (col("l_partkey") % 256).cast("int").as("x"),
      (col("l_suppkey") % 256).cast("int").as("y"))
    xy.withColumn("z", InterleaveBits.interleaveBits(Seq(col("x"), col("y"))))
      .groupBy(shiftright(col("z"), 10).as("cell"))
      .agg(count(lit(1)).cast("long").as("n"),
        min("x").cast("long").as("x_lo"), max("x").cast("long").as("x_hi"),
        min("y").cast("long").as("y_lo"), max("y").cast("long").as("y_hi"))
      .withColumn("x_span", col("x_hi") - col("x_lo") + 1)
      .withColumn("y_span", col("y_hi") - col("y_lo") + 1)
      .orderBy("cell")
  }

  /** bit i of x → output bit 2i, bit i of y → 2i+1 (InterleaveBits puts
    * bit i of dim d at i·n + d, children ordered (x, y)). */
  private val q360Sql: String = {
    val zExpr = (0 until 8).map { i =>
      s"((x >> $i) & 1) * ${1L << (2 * i)} + ((y >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
    s"""WITH xy AS (
         SELECT CAST(l_partkey % 256 AS INTEGER) AS x,
                CAST(l_suppkey % 256 AS INTEGER) AS y
         FROM lineitem),
       zv AS (SELECT x, y, ($zExpr) AS z FROM xy)
       SELECT CAST(z >> 10 AS BIGINT) AS cell,
              CAST(count(*) AS BIGINT) AS n,
              CAST(min(x) AS BIGINT) AS x_lo, CAST(max(x) AS BIGINT) AS x_hi,
              CAST(min(y) AS BIGINT) AS y_lo, CAST(max(y) AS BIGINT) AS y_hi,
              CAST(max(x) - min(x) + 1 AS BIGINT) AS x_span,
              CAST(max(y) - min(y) + 1 AS BIGINT) AS y_span
       FROM zv GROUP BY 1 ORDER BY cell"""
  }

  // --------------------------------------------------------------- q361
  /** KMV sketch SET ALGEBRA: one bottom-k sketch per yearly customer
    * cohort (1995 vs 1996 order activity) estimates |A|, |B|, |A∪B| and
    * |A∩B| — union by "k smallest of the union of hash sets" (the KMV
    * merge is commutative/associative, so at 100 TB per-partition
    * bottom-k merges up a tree without ever holding a full set), and
    * intersection by the ratio ρ of union-sketch members present in
    * both sides: |A∩B| ≈ ρ·est(A∪B) (Beyer et al. 2007). Below k the
    * sketch holds the whole set and every figure is EXACT — the sf
    * ladder crosses that boundary, so both regimes are driver-checked.
    * The bottom-k selection is a TakeOrderedAndProject (per-partition
    * heap + single merge), never a global sort. */
  private def q361(s: SparkSession, dir: String): DataFrame = {
    val K = 256
    val o = Tables(s, dir)("orders")
    def yearKeys(yr: Int, tag: Int): DataFrame =
      o.filter(year(col("o_orderdate")) === yr)
        .select(col("o_custkey").as("v")).distinct()
        .withColumn("side", lit(tag))
    // materialized once: the exact rollup, both side estimates and the
    // union sketch all read this frame — uncut, the orders scan +
    // distinct would execute four times in one query (q288 discipline)
    val m = yearKeys(1995, 1).unionByName(yearKeys(1996, 2))
      .groupBy("v")
      .agg(max(when(col("side") === 1, 1).otherwise(0)).as("inA"),
           max(when(col("side") === 2, 1).otherwise(0)).as("inB"))
      .withColumn("h", Anonymize.md5Uniform(col("v"), "kmvset"))
      .localCheckpoint()
    val est: Column =
      when(col("nk") < K, col("nk").cast("double"))
        .otherwise(lit((K - 1).toDouble) / col("hk"))
    def sideEst(flag: String, name: String): DataFrame =
      m.filter(col(flag) === 1).orderBy("h", "v").limit(K)
        .agg(count(lit(1)).as("nk"), max("h").as("hk"))
        .select(est.as(name))
    val exact = m.agg(
      sum("inA").cast("long").as("exact_a"),
      sum("inB").cast("long").as("exact_b"),
      count(lit(1)).cast("long").as("exact_union"),
      sum(col("inA") * col("inB")).cast("long").as("exact_inter"))
    val union = m.orderBy("h", "v").limit(K)
      .agg(count(lit(1)).as("nk"), max("h").as("hk"),
           sum(col("inA") * col("inB")).as("both"))
      .select(
        est.as("eu"),
        when(col("nk") < K, col("both").cast("double"))
          .otherwise(col("both").cast("double") / K *
            (lit((K - 1).toDouble) / col("hk"))).as("ei"))
    exact.crossJoin(sideEst("inA", "ea")).crossJoin(sideEst("inB", "eb"))
      .crossJoin(union)
      .select(col("exact_a"), col("exact_b"),
        col("exact_union"), col("exact_inter"),
        round(col("ea"), 4).as("est_a"), round(col("eb"), 4).as("est_b"),
        round(col("eu"), 4).as("est_union"),
        round(col("ei"), 4).as("est_inter"),
        round(col("ei") / col("eu"), 6).as("est_jaccard"))
  }

  private val q361Sql =
    """WITH a AS (SELECT DISTINCT o_custkey AS v FROM orders
                  WHERE year(o_orderdate) = 1995),
       b AS (SELECT DISTINCT o_custkey AS v FROM orders
             WHERE year(o_orderdate) = 1996),
       m AS (
         SELECT v, max(inA) AS inA, max(inB) AS inB FROM (
           SELECT v, 1 AS inA, 0 AS inB FROM a
           UNION ALL
           SELECT v, 0, 1 FROM b) u
         GROUP BY v),
       hm AS (
         SELECT v, inA, inB,
                ('0x' || substr(md5(CAST(v AS VARCHAR) || '-kmvset'), 1, 8))
                  ::BIGINT / 4294967296.0 AS h
         FROM m),
       ra AS (SELECT h, row_number() OVER (ORDER BY h, v) AS r
              FROM hm WHERE inA = 1),
       rb AS (SELECT h, row_number() OVER (ORDER BY h, v) AS r
              FROM hm WHERE inB = 1),
       ru AS (SELECT h, inA, inB, row_number() OVER (ORDER BY h, v) AS r
              FROM hm),
       ea AS (SELECT CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
                          ELSE 255.0 / max(h) END AS ea
              FROM ra WHERE r <= 256),
       eb AS (SELECT CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
                          ELSE 255.0 / max(h) END AS eb
              FROM rb WHERE r <= 256),
       eu AS (SELECT CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
                          ELSE 255.0 / max(h) END AS eu,
                     CASE WHEN count(*) < 256
                          THEN CAST(sum(inA * inB) AS DOUBLE)
                          ELSE CAST(sum(inA * inB) AS DOUBLE) / 256.0
                               * (255.0 / max(h)) END AS ei
              FROM ru WHERE r <= 256),
       ex AS (SELECT CAST(sum(inA) AS BIGINT) AS exact_a,
                     CAST(sum(inB) AS BIGINT) AS exact_b,
                     CAST(count(*) AS BIGINT) AS exact_union,
                     CAST(sum(inA * inB) AS BIGINT) AS exact_inter
              FROM m)
       SELECT exact_a, exact_b, exact_union, exact_inter,
              round(ea, 4) AS est_a, round(eb, 4) AS est_b,
              round(eu, 4) AS est_union, round(ei, 4) AS est_inter,
              round(ei / eu, 6) AS est_jaccard
       FROM ex, ea, eb, eu"""

  // --------------------------------------------------------------- q362
  /** Population Stability Index over fixed price bands, 1995 → 1996 —
    * the standard drift monitor for a feature distribution between a
    * reference and a current window: PSI = Σ (p−q)·ln(p/q) with
    * Laplace(+1) smoothing so an empty band can't emit ±∞. Bands are
    * FIXED-WIDTH (10k price buckets capped at 9), not quantiles, so the
    * band edges are constants and the whole query is one scan + one
    * 10-group agg; the totals come back via a 1-row crossJoin, and the
    * headline PSI is an unbounded-window sum over the 10 band rows.
    * Complements q215 (categorical share drift) and q284 (Jensen-
    * Shannon) with the fixed-bin monitoring form. */
  private def q362(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir)("lineitem")
      .filter(year(col("l_shipdate")).isin(1995, 1996))
      .select(
        least(floor(col("l_extendedprice") / 10000), lit(9)).cast("int")
          .as("band"),
        year(col("l_shipdate")).as("yr"))
    val g = li.groupBy("band").agg(
      sum(when(col("yr") === 1995, 1L).otherwise(0L)).as("n_1995"),
      sum(when(col("yr") === 1996, 1L).otherwise(0L)).as("n_1996"))
    val tot = g.agg(sum("n_1995").as("t95"), sum("n_1996").as("t96"))
    val p95 = (col("n_1995") + 1).cast("double") / (col("t95") + 10)
    val p96 = (col("n_1996") + 1).cast("double") / (col("t96") + 10)
    g.crossJoin(tot)
      .select(col("band").cast("long").as("band"),
        col("n_1995").cast("long").as("n_1995"),
        col("n_1996").cast("long").as("n_1996"),
        round(p95, 6).as("p_1995"), round(p96, 6).as("p_1996"),
        ((p96 - p95) * log(p96 / p95)).as("psi_term"))
      .withColumn("psi_total",
        round(sum("psi_term").over(Window.partitionBy(lit(1))), 6))
      .withColumn("psi_term", round(col("psi_term"), 6))
      .orderBy("band")
  }

  private val q362Sql =
    """WITH li AS (
         SELECT least(CAST(floor(l_extendedprice / 10000) AS INTEGER), 9)
                  AS band,
                year(l_shipdate) AS yr
         FROM lineitem WHERE year(l_shipdate) IN (1995, 1996)),
       g AS (
         SELECT band,
                sum(CASE WHEN yr = 1995 THEN 1 ELSE 0 END) AS n_1995,
                sum(CASE WHEN yr = 1996 THEN 1 ELSE 0 END) AS n_1996
         FROM li GROUP BY band),
       tot AS (SELECT sum(n_1995) AS t95, sum(n_1996) AS t96 FROM g),
       terms AS (
         SELECT CAST(band AS BIGINT) AS band,
                CAST(n_1995 AS BIGINT) AS n_1995,
                CAST(n_1996 AS BIGINT) AS n_1996,
                CAST(n_1995 + 1 AS DOUBLE) / (t95 + 10) AS p95,
                CAST(n_1996 + 1 AS DOUBLE) / (t96 + 10) AS p96
         FROM g, tot)
       SELECT band, n_1995, n_1996,
              round(p95, 6) AS p_1995, round(p96, 6) AS p_1996,
              round((p96 - p95) * ln(p96 / p95), 6) AS psi_term,
              round(sum((p96 - p95) * ln(p96 / p95)) OVER (), 6) AS psi_total
       FROM terms ORDER BY band"""

  // --------------------------------------------------------------- q363
  /** HITS hub/authority over the ABOVE-AVERAGE nation trade graph: an
    * edge src→dst survives when the pair's line count exceeds the mean
    * pair volume (the raw q133 graph is complete at every SF, which
    * would collapse HITS to the all-ones fixed point — the relative
    * threshold keeps the subgraph sparse AND scale-invariant, so every
    * sf exercises a different non-trivial spectrum). Five full
    * iterations, L∞-normalized per half-step so the normalizer (a max,
    * order-independent in float) is bit-deterministic; the oracle
    * unrolls the identical computation as a MATERIALIZED CTE chain
    * (DuckDB 1.0 inlines CTEs, and the doubly-referenced score vectors
    * would otherwise expand the plan exponentially — the SQL mirror of
    * the same lineage blow-up [[graft.operators.Hits]] checkpoints
    * away). The distributed cost is the 4-table graph build; each
    * iteration then moves only the 25-row score vector against the
    * cached edge list. */
  private def q363(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val pairs = t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .join(t("supplier"), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    val edges = pairs.crossJoin(pairs.agg(avg("w").as("wavg")))
      .filter(col("w") > col("wavg")).select("src", "dst")
    // nation→nation graph: schema-bounded (≤ 625 edges at ANY corpus
    // scale), so the driver-local iteration path applies — see Hits.run
    Hits.run(edges, iters = 5, localThreshold = 1000L)
      .select(col("node"), round(col("auth"), 6).as("auth"),
        round(col("hub"), 6).as("hub"))
      .orderBy("node")
  }

  private val q363Sql: String = {
    val base =
      """WITH pairs AS MATERIALIZED (
           SELECT c_nationkey AS src, s_nationkey AS dst, count(*) AS w
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN supplier ON l_suppkey = s_suppkey
           GROUP BY 1, 2),
         e AS MATERIALIZED (
           SELECT src, dst FROM pairs
           WHERE w > (SELECT avg(w) FROM pairs)),
         nodes AS MATERIALIZED (
           SELECT src AS node FROM e UNION SELECT dst FROM e),
         s0 AS MATERIALIZED (
           SELECT node, 1.0::DOUBLE AS auth, 1.0::DOUBLE AS hub
           FROM nodes)"""
    val iters = (1 to 5).map { k =>
      s""",
         ar$k AS MATERIALIZED (
           SELECT e.dst AS node, sum(s.hub) AS a
           FROM s${k - 1} s JOIN e ON s.node = e.src GROUP BY 1),
         af$k AS MATERIALIZED (
           SELECT n.node, coalesce(ar$k.a, 0::DOUBLE) AS a
           FROM nodes n LEFT JOIN ar$k ON n.node = ar$k.node),
         an$k AS MATERIALIZED (
           SELECT node, a / (SELECT max(a) FROM af$k) AS auth FROM af$k),
         hr$k AS MATERIALIZED (
           SELECT e.src AS node, sum(a.auth) AS h
           FROM an$k a JOIN e ON a.node = e.dst GROUP BY 1),
         hf$k AS MATERIALIZED (
           SELECT n.node, coalesce(hr$k.h, 0::DOUBLE) AS h
           FROM nodes n LEFT JOIN hr$k ON n.node = hr$k.node),
         s$k AS MATERIALIZED (
           SELECT a.node, a.auth,
                  f.h / (SELECT max(h) FROM hf$k) AS hub
           FROM an$k a JOIN hf$k f ON a.node = f.node)"""
    }.mkString
    base + iters +
      "\n       SELECT node, round(auth, 6) AS auth, round(hub, 6) AS hub" +
      "\n       FROM s5 ORDER BY node"
  }

  // --------------------------------------------------------------- q364
  /** Deterministic random walks (DeepWalk/node2vec sampling prep) over
    * the q363 sparse trade graph: one 4-hop walk per node, each hop the
    * hash-argmin neighbor draw of [[graft.operators.RandomWalk]], dead
    * ends NULL-padded. The oracle replays every hop bit-for-bit — same
    * md5-uniform, same (u, dst) tie order — as an unrolled CTE chain
    * (MATERIALIZED: each step's frontier feeds the next, and DuckDB 1.0
    * would otherwise inline the chain multiplicatively). */
  private def q364(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val pairs = t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .join(t("supplier"), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    val edges = pairs.crossJoin(pairs.agg(avg("w").as("wavg")))
      .filter(col("w") > col("wavg")).select("src", "dst")
    RandomWalk.walks(edges, steps = 4, salt = "walk")
      .orderBy("start")
  }

  private val q364Sql: String = {
    val base =
      """WITH pairs AS MATERIALIZED (
           SELECT c_nationkey AS src, s_nationkey AS dst, count(*) AS w
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN supplier ON l_suppkey = s_suppkey
           GROUP BY 1, 2),
         e AS MATERIALIZED (
           SELECT src, dst FROM pairs
           WHERE w > (SELECT avg(w) FROM pairs)),
         nodes AS MATERIALIZED (
           SELECT src AS node FROM e UNION SELECT dst FROM e),
         w0 AS MATERIALIZED (SELECT node AS start, node AS cur FROM nodes)"""
    val steps = (1 to 4).map { k =>
      val prev = (1 until k).map(i => s"w.s$i, ").mkString
      s""",
         c$k AS (
           SELECT w.start, ${prev}e.dst,
                  ('0x' || substr(md5(CAST(w.cur AS VARCHAR) || '|$k|'
                    || CAST(e.dst AS VARCHAR) || '-walk'), 1, 8))::BIGINT
                    / 4294967296.0 AS u
           FROM w${k - 1} w LEFT JOIN e ON w.cur = e.src),
         w$k AS MATERIALIZED (
           SELECT start, ${prev.replace("w.", "")}dst AS s$k, dst AS cur
           FROM (SELECT *, row_number() OVER (PARTITION BY start
                   ORDER BY u ASC NULLS LAST, dst ASC NULLS LAST) AS r
                 FROM c$k)
           WHERE r = 1)"""
    }.mkString
    base + steps +
      "\n       SELECT start, s1, s2, s3, s4 FROM w4 ORDER BY start"
  }

  override def queries: Map[String, QueryFn] = Map(
    "q359_salted_join"  -> q359 _,
    "q360_zorder_cells" -> q360 _,
    "q361_kmv_setops"   -> q361 _,
    "q362_psi_drift"    -> q362 _,
    "q363_hits"         -> q363 _,
    "q364_random_walks" -> q364 _)

  override def oracles: Map[String, String] = Map(
    "q359_salted_join"  -> q359Sql,
    "q360_zorder_cells" -> q360Sql,
    "q361_kmv_setops"   -> q361Sql,
    "q362_psi_drift"    -> q362Sql,
    "q363_hits"         -> q363Sql,
    "q364_random_walks" -> q364Sql)
}
