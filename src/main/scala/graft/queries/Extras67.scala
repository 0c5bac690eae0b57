package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-8 pack, part 10: feed telemetry and allocation — change-point
  * detection (q422), UniMax budget water-filling (q423), quantile
  * normalization (q424), the Benford audit (q425), Jenks quality tiers
  * (q426), TextRank keywords (q428), modularity/assortativity graph
  * diagnostics (q429/q430), and the Mann-Kendall + Theil-Sen drift
  * pair (q431/q432).
  */
object Extras67 extends QueryPack {

  // --------------------------------------------------------------- q422
  /** Offline CHANGE-POINT detection per event type — binary
    * segmentation's first split: the day boundary that maximizes the
    * SSE reduction of the daily-count series (the "when did the
    * crawler/feed change behavior" telemetry question; a large
    * reduction with distant segment means flags a regime shift worth
    * gating ingestion on). Everything derives from prefix sums of
    * INTEGER counts — cs/cq running sums are exact in doubles (counts
    * ≪ 2⁵³), so SSE_left + SSE_right per candidate split is
    * bit-identical across engines without any fold ordering care, and
    * the argmax is total-ordered (reduction desc, then earliest day).
    * 100 TB shape: one (type, day) hash-agg over the corpus, then the
    * per-type scan of its ~365-row series under one window — the
    * candidate evaluation never rejoins the corpus. */
  private def q422(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables(s, dir)("events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("c"))
      .localCheckpoint() // feeds the window pass AND the totals pass
    val w = Window.partitionBy("event_type").orderBy("day")
    val pre = daily
      .withColumn("rn", row_number().over(w))
      .withColumn("cs", sum("c").over(w))
      .withColumn("cq", sum(col("c") * col("c")).over(w))
    val tot = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("c").as("s"),
        sum(col("c") * col("c")).as("q"))
    val cand = pre.join(tot, Seq("event_type"))
      .filter(col("rn") < col("n"))
      .withColumn("sse0", col("q") - col("s") * col("s") / col("n"))
      .withColumn("red",
        col("sse0") -
          (col("cq") - col("cs") * col("cs") / col("rn")) -
          ((col("q") - col("cq")) -
            (col("s") - col("cs")) * (col("s") - col("cs")) /
              (col("n") - col("rn"))))
    val best = Window.partitionBy("event_type")
      .orderBy(col("red").desc, col("day"))
    cand.withColumn("pick", row_number().over(best))
      .filter(col("pick") === 1)
      .select(col("event_type"), col("day").as("split_day"),
        col("n").cast("long").as("n_days"),
        round(col("cs") / col("rn"), 6).as("mean_left"),
        round((col("s") - col("cs")) / (col("n") - col("rn")), 6)
          .as("mean_right"),
        round(col("red"), 6).as("reduction"),
        round(when(col("sse0") === 0, 0.0)
          .otherwise(col("red") / col("sse0")), 6).as("reduction_frac"))
      .orderBy("event_type")
  }

  private val q422Sql =
    """WITH daily AS MATERIALIZED (
         SELECT event_type, CAST(ts AS DATE) AS day,
                CAST(count(*) AS DOUBLE) AS c
         FROM events GROUP BY 1, 2),
       pre AS (
         SELECT event_type, day, c,
           row_number() OVER w AS rn,
           sum(c) OVER w AS cs,
           sum(c * c) OVER w AS cq
         FROM daily
         WINDOW w AS (PARTITION BY event_type ORDER BY day
                      ROWS UNBOUNDED PRECEDING)),
       tot AS (
         SELECT event_type, count(*) AS n, sum(c) AS s, sum(c * c) AS q
         FROM daily GROUP BY 1),
       cand AS (
         SELECT pre.event_type, pre.day, pre.rn, pre.cs, tot.n, tot.s,
                tot.q - tot.s * tot.s / tot.n AS sse0,
                (tot.q - tot.s * tot.s / tot.n)
                  - (pre.cq - pre.cs * pre.cs / pre.rn)
                  - ((tot.q - pre.cq)
                     - (tot.s - pre.cs) * (tot.s - pre.cs)
                       / (tot.n - pre.rn)) AS red
         FROM pre JOIN tot USING (event_type)
         WHERE pre.rn < tot.n),
       best AS (
         SELECT *, row_number() OVER (PARTITION BY event_type
                     ORDER BY red DESC, day) AS pick
         FROM cand)
       SELECT event_type, day AS split_day,
              CAST(n AS BIGINT) AS n_days,
              round(cs / rn, 6) AS mean_left,
              round((s - cs) / (n - rn), 6) AS mean_right,
              round(red, 6) AS reduction,
              round(CASE WHEN sse0 = 0 THEN 0.0 ELSE red / sse0 END, 6)
                AS reduction_frac
       FROM best WHERE pick = 1
       ORDER BY event_type"""

  // --------------------------------------------------------------- q423
  /** UniMax token-budget WATER-FILLING (Chung et al. 2023, "UniMax:
    * Fairer and More Effective Language Sampling"): allocate a global
    * budget B (here 60% of total chars) across sources so small
    * sources keep everything and big sources share the remainder
    * evenly — the principled alternative to temperature mixing
    * (q156/q292) that never over-samples a small source. Closed-form
    * relational solve: sources sorted ascending, a source is FULL when
    * its size fits the per-remaining-source share given every smaller
    * source kept everything (prefix-AND via a running min, robust even
    * where the fit test is not monotone); the big ones split the
    * leftover as floor + first-r-get-one-extra (ascending order). All
    * INTEGER arithmetic — allocations are exact and sum to exactly B.
    * 100 TB shape: one source-keyed agg, then an S-row window solve. */
  private def q423(s: SparkSession, dir: String): DataFrame = {
    val src = Tables(s, dir)("documents")
      .groupBy("source").agg(sum(col("n_chars")).cast("long").as("n"))
    val tot = src.agg(sum("n").as("t"), count(lit(1)).as("ns"))
      .select(expr("(t * 6) div 10").as("b"), col("ns"))
    val w = Window.orderBy(col("n"), col("source"))
    val ord = src
      .withColumn("rn", row_number().over(w))
      .withColumn("cum", sum("n").over(w))
      .crossJoin(broadcast(tot))
      .withColumn("fits",
        when(col("n") * (col("ns") - col("rn") + 1) <=
          col("b") - (col("cum") - col("n")), 1L).otherwise(0L))
      .withColumn("full", min("fits").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val prefix = ord.agg(
      sum(when(col("full") === 1, col("n")).otherwise(0L)).as("cum_full"),
      sum(col("full")).as("p"))
    val out = ord.crossJoin(broadcast(prefix))
      .withColumn("nbig", col("ns") - col("p"))
      .withColumn("rem", col("b") - col("cum_full"))
      .withColumn("alloc",
        when(col("full") === 1, col("n"))
          .otherwise(expr("rem div nbig") +
            when(col("rn") - col("p") <= col("rem") % col("nbig"), 1L)
              .otherwise(0L)))
    out.select(col("source"), col("n").as("n_chars"),
        col("b").cast("long").as("budget"),
        col("alloc").cast("long").as("alloc"),
        when(col("alloc") < col("n"), 1L).otherwise(0L).as("capped"))
      .orderBy("source")
  }

  private val q423Sql =
    """WITH src AS MATERIALIZED (
         SELECT source, CAST(sum(n_chars) AS BIGINT) AS n
         FROM documents GROUP BY 1),
       tot AS (SELECT (sum(n) * 6) // 10 AS b, count(*) AS ns FROM src),
       ord AS MATERIALIZED (
         SELECT source, n,
           row_number() OVER w AS rn,
           sum(n) OVER w AS cum,
           b, ns
         FROM src CROSS JOIN tot
         WINDOW w AS (ORDER BY n, source ROWS UNBOUNDED PRECEDING)),
       flagged AS MATERIALIZED (
         SELECT *,
           CASE WHEN n * (ns - rn + 1) <= b - (cum - n)
                THEN 1 ELSE 0 END AS fits
         FROM ord),
       runmin AS MATERIALIZED (
         SELECT *, min(fits) OVER (ORDER BY rn
                      ROWS UNBOUNDED PRECEDING) AS is_full
         FROM flagged),
       prefix AS (
         SELECT sum(CASE WHEN is_full = 1 THEN n ELSE 0 END) AS cum_full,
                sum(is_full) AS p
         FROM runmin)
       SELECT source, n AS n_chars, CAST(b AS BIGINT) AS budget,
              CAST(CASE WHEN is_full = 1 THEN n
                   ELSE (b - cum_full) // (ns - p) +
                        (CASE WHEN rn - p <= (b - cum_full) % (ns - p)
                              THEN 1 ELSE 0 END)
                   END AS BIGINT) AS alloc,
              CAST(CASE WHEN is_full = 0 AND
                        (b - cum_full) // (ns - p) +
                        (CASE WHEN rn - p <= (b - cum_full) % (ns - p)
                              THEN 1 ELSE 0 END) < n
                   THEN 1 ELSE 0 END AS BIGINT) AS capped
       FROM runmin CROSS JOIN prefix
       ORDER BY source"""

  /** DuckDB twin of QualityClassifier.defaultModel's LOGIT as the
    * shared `f`/`d` CTE prefix (ends at `d(doc_id[, extra], z)`) —
    * feature counts and weights come from [[OracleLogit]], the one
    * source every classifier oracle (q386/q424/q426/q484) reads. */
  private def logitChainSql(extraCols: String): String =
    s"""f AS (
         ${OracleLogit.featuresSql(s"doc_id$extraCols")}),
       d AS MATERIALIZED (
         SELECT doc_id$extraCols,
           ${OracleLogit.zExprSql} AS z
         FROM f)"""

  // --------------------------------------------------------------- q424
  /** Cross-source QUANTILE NORMALIZATION of the quality signal — the
    * calibration step before comparing or thresholding quality across
    * sources (each source's classifier distribution is shifted; a 0.6
    * from a code-heavy source is not a 0.6 from prose). Mapping table:
    * each source's decile (ntile over the exact LOGIT — rational
    * arithmetic on counts, so ranks are bit-safe; the sigmoid's exp()
    * is NOT, see [[graft.operators.QualityClassifier.logitExpr]]) maps
    * to the pooled decile's max logit. The pooled decile split rides
    * [[graft.operators.RowIndexer]] (range shuffle + offset stamp +
    * exact ntile remainder rule) — never a single-task global ntile
    * window; at 100 TB the pooled reference can also come from the
    * q351 mergeable quantile sketch. The per-source side stays a
    * partitioned window. */
  private def q424(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{QualityClassifier, RowIndexer}
    val z = QualityClassifier.logitExpr(
      QualityClassifier.defaultModel(col("text")))
    val d = Tables(s, dir)("documents")
      .select(col("doc_id"), col("source"), z.as("z"))
      .localCheckpoint() // feeds the per-source window and pooled index
    val wSrc = Window.partitionBy("source").orderBy(col("z"), col("doc_id"))
    val n = d.count()
    val ref = RowIndexer.stableIndex(d, Seq(col("z"), col("doc_id")))
      .withColumn("pb", RowIndexer.ntileBucket("idx", n, 10))
      .groupBy("pb").agg(max("z").as("ref"))
    d.withColumn("bucket", ntile(10).over(wSrc))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        min("z").as("z_lo"), max("z").as("z_hi"))
      .join(broadcast(ref), col("bucket") === col("pb"))
      .select(col("source"), col("bucket").cast("long").as("bucket"),
        col("n_docs").cast("long").as("n_docs"),
        round(col("z_lo"), 6).as("z_lo"),
        round(col("z_hi"), 6).as("z_hi"),
        round(col("ref"), 6).as("norm_ref"))
      .orderBy("source", "bucket")
  }

  private val q424Sql = {
    s"""WITH ${logitChainSql(", source")},
       ref AS (
         SELECT pb, max(z) AS ref
         FROM (SELECT z, ntile(10) OVER (ORDER BY z, doc_id) AS pb FROM d)
         GROUP BY 1),
       b AS (
         SELECT source, ntile(10) OVER (PARTITION BY source
                  ORDER BY z, doc_id) AS bucket, z
         FROM d)
       SELECT source, CAST(bucket AS BIGINT) AS bucket,
              CAST(count(*) AS BIGINT) AS n_docs,
              round(min(z), 6) AS z_lo,
              round(max(z), 6) AS z_hi,
              round(any_value(ref), 6) AS norm_ref
       FROM b JOIN ref ON ref.pb = b.bucket
       GROUP BY source, bucket
       ORDER BY source, bucket"""
  }

  // --------------------------------------------------------------- q425
  /** BENFORD first-digit audit over event values — the classic
    * fabricated-data screen for ingested numeric feeds: observed
    * first-significant-digit counts vs Benford's log₁₀(1+1/d)
    * expectation, with the chi-square distance as the headline.
    * Digit extraction avoids log10-at-a-power-of-ten floor hazards:
    * floor(value·100) is one IEEE multiply (identical both engines),
    * and the leading digit is the first character of the BIGINT's
    * decimal string — exact. One corpus hash-agg on 9 groups; the
    * chi-square is a 9-term fold rounded once. */
  private def q425(s: SparkSession, dir: String): DataFrame = {
    // upper clamp keeps floor(value*100) castable to BIGINT on BOTH
    // engines (DuckDB raises on out-of-range doubles where Spark
    // saturates); values past 1e15 are feed corruption anyway
    val e = Tables(s, dir)("events")
      .filter(col("value") >= 0.01 && col("value") < 1e15)
      .select(substring(floor(col("value") * 100).cast("long")
        .cast("string"), 1, 1).as("digit"))
    // all nine digits are kept even at zero observed count — a missing
    // digit still owes its full expected mass to the chi-square (the
    // fabricated-data case the audit exists to flag)
    val obs = s.range(1, 10).select(col("id").cast("string").as("digit"))
      .join(e.groupBy("digit").agg(count(lit(1)).as("c")), Seq("digit"), "left")
      .select(col("digit"), coalesce(col("c"), lit(0L)).as("o"))
    val tot = obs.agg(sum("o").as("n"))
    val scored = obs.crossJoin(broadcast(tot))
      .withColumn("e",
        col("n") * log10(lit(1.0) + lit(1.0) / col("digit").cast("double")))
    val chi = scored.agg(
      round(aggregate(
        transform(sort_array(collect_list(struct(col("digit"),
          (((col("o") - col("e")) * (col("o") - col("e"))) / col("e"))
            .as("t")))),
          x => x.getField("t")),
        lit(0.0), (a, x) => a + x), 6).as("chi2"))
    scored.crossJoin(broadcast(chi))
      .select(col("digit"), col("o").cast("long").as("observed"),
        round(col("e"), 6).as("expected"),
        round(col("o") / col("e"), 6).as("obs_over_exp"),
        col("chi2"))
      .orderBy("digit")
  }

  private val q425Sql =
    """WITH d AS MATERIALIZED (
         SELECT substr(CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR),
                       1, 1) AS digit
         FROM events WHERE value >= 0.01 AND value < 1e15),
       raw AS (SELECT digit, count(*) AS c FROM d GROUP BY 1),
       obs AS (
         SELECT CAST(t.g AS VARCHAR) AS digit, coalesce(c, 0) AS o
         FROM (SELECT unnest(generate_series(1, 9)) AS g) t
         LEFT JOIN raw ON raw.digit = CAST(t.g AS VARCHAR)),
       tot AS (SELECT sum(o) AS n FROM obs),
       scored AS MATERIALIZED (
         SELECT digit, o,
                n * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS e
         FROM obs CROSS JOIN tot),
       chi AS (
         SELECT round(list_sum(list_transform(
           list({'d': digit, 't': (o - e) * (o - e) / e} ORDER BY digit),
           x -> x.t)), 6) AS chi2
         FROM scored)
       SELECT digit, CAST(o AS BIGINT) AS observed,
              round(e, 6) AS expected,
              round(o / e, 6) AS obs_over_exp,
              chi2
       FROM scored CROSS JOIN chi
       ORDER BY digit"""

  // --------------------------------------------------------------- q426
  /** Optimal quality TIERS — Jenks natural breaks over the corpus
    * quality distribution ([[graft.operators.OptimalBreaks]]): the
    * exact K=4-segment SSE-minimizing split of a 100-bin logit
    * histogram, generalizing q422's single change point and replacing
    * hand-picked tier thresholds. The histogram is one hash-agg
    * (bounded model state); the DP runs driver-side; the tier rollup
    * rejoins the corpus once with the break indices as literals. The
    * oracle unrolls the same DP as candidate-join CTE stages with
    * min-then-smallest-index tie-breaks; every cost is exact BIGINT
    * prefix arithmetic with one double division, so the breaks match
    * bit-for-bit. */
  private def q426(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{OptimalBreaks, QualityClassifier}
    val z = QualityClassifier.logitExpr(
      QualityClassifier.defaultModel(col("text")))
    val d = Tables(s, dir)("documents").select(col("doc_id"), z.as("z"))
    val st = d.agg(min("z").as("zmin"), max("z").as("zmax"))
    // degenerate all-equal-logit corpora pin to bin 0 explicitly —
    // Spark's floor(0/0)=floor(NaN)=0 vs DuckDB's 0/0=NULL would
    // otherwise diverge
    val db = d.crossJoin(broadcast(st))
      .withColumn("b",
        when(col("zmax") === col("zmin"), lit(0L))
          .otherwise(least(
            floor((col("z") - col("zmin")) / (col("zmax") - col("zmin"))
              * 100), lit(99L))).cast("int"))
      .localCheckpoint() // feeds the histogram collect and the rollup
    val hist = new Array[Long](100)
    db.groupBy("b").agg(count(lit(1)).as("c"))
      .collect().foreach(r => hist(r.getInt(0)) = r.getLong(1))
    val (bs, sse) = OptimalBreaks.breaks(hist, 4)
    val tier = when(col("b") <= bs(0), 1)
      .when(col("b") <= bs(1), 2)
      .when(col("b") <= bs(2), 3).otherwise(4)
    db.withColumn("tier", tier)
      .groupBy("tier")
      .agg(count(lit(1)).as("n_docs"),
        min("b").as("bin_lo"), max("b").as("bin_hi"),
        min("z").as("zl"), max("z").as("zh"))
      .select(col("tier").cast("long").as("tier"),
        col("n_docs").cast("long").as("n_docs"),
        col("bin_lo").cast("long").as("bin_lo"),
        col("bin_hi").cast("long").as("bin_hi"),
        round(col("zl"), 6).as("z_lo"),
        round(col("zh"), 6).as("z_hi"),
        round(lit(sse), 6).as("total_sse"))
      .orderBy("tier")
  }

  private val q426Sql = {
    val toksSql = "regexp_split_to_array(trim(text), '\\s+')"
    // cost of bins (i.b+1 .. j.b) from the inclusive prefix rows; the
    // squared sum multiplies in DOUBLE to mirror the Scala side's
    // overflow-safe math (identical below 2^53, where it is exact)
    def cost(i: String, j: String): String =
      s"""CASE WHEN $j.cn - $i.cn = 0 THEN 0.0
          ELSE ($j.cq - $i.cq) -
               CAST($j.cs - $i.cs AS DOUBLE) *
               CAST($j.cs - $i.cs AS DOUBLE)
                 / ($j.cn - $i.cn) END"""
    s"""WITH ${logitChainSql("")},
       st AS (SELECT min(z) AS zmin, max(z) AS zmax FROM d),
       db AS MATERIALIZED (
         SELECT doc_id, z,
           CASE WHEN zmax = zmin THEN 0
                ELSE least(CAST(floor((z - zmin) / (zmax - zmin) * 100)
                             AS BIGINT), 99) END AS b
         FROM d CROSS JOIN st),
       hist AS (SELECT b, count(*) AS c FROM db GROUP BY 1),
       bins AS (
         SELECT t.b, coalesce(c, 0) AS c
         FROM (SELECT unnest(generate_series(0, 99)) AS b) t
         LEFT JOIN hist USING (b)),
       pre AS MATERIALIZED (
         SELECT b, sum(c) OVER w AS cn, sum(c * b) OVER w AS cs,
                sum(c * b * b) OVER w AS cq
         FROM bins WINDOW w AS (ORDER BY b ROWS UNBOUNDED PRECEDING)),
       s1 AS MATERIALIZED (
         SELECT b AS j,
           CASE WHEN cn = 0 THEN 0.0
                ELSE cq - CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE) / cn
                END AS v
         FROM pre),
       c2 AS MATERIALIZED (
         SELECT i.b AS i, j.b AS j, s1.v + ${cost("i", "j")} AS v
         FROM pre i JOIN pre j ON i.b < j.b
              JOIN s1 ON s1.j = i.b),
       s2 AS MATERIALIZED (SELECT j, min(v) AS v FROM c2 GROUP BY 1),
       b2 AS MATERIALIZED (
         SELECT c2.j, min(c2.i) AS i
         FROM c2 JOIN s2 USING (j) WHERE c2.v = s2.v GROUP BY 1),
       c3 AS MATERIALIZED (
         SELECT i.b AS i, j.b AS j, s2.v + ${cost("i", "j")} AS v
         FROM pre i JOIN pre j ON i.b < j.b
              JOIN s2 ON s2.j = i.b),
       s3 AS MATERIALIZED (SELECT j, min(v) AS v FROM c3 GROUP BY 1),
       b3 AS MATERIALIZED (
         SELECT c3.j, min(c3.i) AS i
         FROM c3 JOIN s3 USING (j) WHERE c3.v = s3.v GROUP BY 1),
       c4 AS MATERIALIZED (
         SELECT i.b AS i, s3.v + ${cost("i", "j")} AS v
         FROM pre i JOIN s3 ON s3.j = i.b
              CROSS JOIN (SELECT * FROM pre WHERE b = 99) j
         WHERE i.b < 99),
       s4 AS (SELECT min(v) AS v FROM c4),
       i3 AS (SELECT min(i) AS i FROM c4, s4 WHERE c4.v = s4.v),
       i2 AS (SELECT b3.i AS i FROM b3, i3 WHERE b3.j = i3.i),
       i1 AS (SELECT b2.i AS i FROM b2, i2 WHERE b2.j = i2.i),
       tiers AS (
         SELECT db.z, db.b,
           CASE WHEN db.b <= i1.i THEN 1
                WHEN db.b <= i2.i THEN 2
                WHEN db.b <= i3.i THEN 3 ELSE 4 END AS tier
         FROM db CROSS JOIN i1 CROSS JOIN i2 CROSS JOIN i3)
       SELECT CAST(tier AS BIGINT) AS tier,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(min(b) AS BIGINT) AS bin_lo,
              CAST(max(b) AS BIGINT) AS bin_hi,
              round(min(z), 6) AS z_lo,
              round(max(z), 6) AS z_hi,
              round((SELECT v FROM s4), 6) AS total_sse
       FROM tiers GROUP BY tier ORDER BY tier"""
  }

  // --------------------------------------------------------------- q428
  /** TextRank keyword extraction (Mihalcea & Tarau 2004): corpus
    * keywords = the top PageRank mass in the word CO-OCCURRENCE graph
    * (adjacent-token pairs, both directions, count-weighted) — the
    * graph-centrality upgrade over raw frequency (q185-style counts)
    * and tf-idf: a word ranks high when it neighbors other
    * high-ranking words, not merely when it is common. Composition:
    * the q406 lowercase-letter-run lexer, stopword/short-token edge
    * filter, [[graft.operators.PageRank.runWeighted]] for 5
    * iterations (the q372 discipline — integer-ratio weights, unrolled
    * CTE oracle, cross-engine float noise ~1e-15 absorbed by
    * round(6)), and a top-20 ordered on the ROUNDED rank so exact-tie
    * words break on the word itself identically everywhere. 100 TB
    * shape: one (src, dst) hash-agg builds the graph; iterations touch
    * only the vocabulary-sized edge relation, never the corpus. */
  private def q428(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{PageRank, SubstringDedup}
    val stop = Seq("the", "a", "of", "to", "and")
    val toks = Tables(s, dir)("documents")
      .select(SubstringDedup.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
    val prs = toks.select(explode(transform(
        sequence(lit(1), size(col("t")) - 1),
        i => struct(element_at(col("t"), i).as("a"),
          element_at(col("t"), i + 1).as("b")))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .filter(length(col("a")) >= 3 && length(col("b")) >= 3 &&
        col("a") =!= col("b") &&
        !col("a").isin(stop: _*) && !col("b").isin(stop: _*))
    val edges = prs.select(col("a").as("src"), col("b").as("dst"))
      .union(prs.select(col("b"), col("a")))
      .groupBy("src", "dst").agg(count(lit(1)).as("weight"))
    PageRank.runWeighted(edges, iters = 5)
      .select(col("node").as("word"), round(col("rank"), 6).as("rank"))
      .orderBy(col("rank").desc, col("word"))
      .limit(20)
  }

  private val q428Sql = {
    val stopSql = "('the', 'a', 'of', 'to', 'and')"
    val base =
      s"""WITH toks AS (
           SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
             w -> w <> '') AS t
           FROM documents),
         prs AS MATERIALIZED (
           SELECT u.p.a AS a, u.p.b AS b
           FROM (SELECT list_transform(generate_series(1, len(t) - 1),
                   i -> {'a': t[i], 'b': t[i+1]}) AS ps
                 FROM toks WHERE len(t) >= 2),
                unnest(ps) AS u(p)
           WHERE length(u.p.a) >= 3 AND length(u.p.b) >= 3
             AND u.p.a <> u.p.b
             AND u.p.a NOT IN $stopSql AND u.p.b NOT IN $stopSql),
         e AS MATERIALIZED (
           SELECT src, dst, count(*) AS w
           FROM (SELECT a AS src, b AS dst FROM prs
                 UNION ALL SELECT b, a FROM prs)
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
      """
       SELECT node AS word, round(rank, 6) AS rank FROM pr5
       ORDER BY round(rank, 6) DESC, node LIMIT 20"""
  }

  // --------------------------------------------------------------- q429
  /** Newman WEIGHTED MODULARITY of the region partition over the
    * nation trade graph — "is trade volume region-assortative?": Q =
    * within/(2m) − Σ_c D_c²/(2m)², the gap between observed
    * within-region weight and the degree-preserving null model. The
    * same number scores ANY candidate partition (near-dup communities,
    * label blocks) against any graph here. Determinism: the graph is
    * symmetrized integer counts (self-loops excluded), so `within`,
    * D_c and 2m are EXACT integers; Σ_c D_c² multiplies and sums with
    * BOTH factors cast to DECIMAL(38,0) on the Spark side, mirroring
    * DuckDB's HUGEINT promotion (a raw Long product would wrap
    * silently past D_c ≈ 3e9 — exactly the 100 TB community masses);
    * Q is then two double divisions in a fixed order — no float folds
    * anywhere (the 2m² product is likewise computed in DOUBLE).
    * Overflow asymmetry past the decimal ceiling (D_c > ~1e19, i.e.
    * Σ D_c² > 1e38): Spark's non-ANSI decimal multiply yields NULL
    * (the modularity column goes null — visible, not wrong), while
    * DuckDB's HUGEINT errors at 1.7e38; neither silently wraps, but a
    * cluster deployment that could reach that mass should flip on
    * spark.sql.ansi.enabled so the Spark side errors too. One edges
    * hash-agg + a region-keyed rollup. */
  private def q429(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val e0 = t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .join(t("supplier"), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(col("c_nationkey").as("i"), col("s_nationkey").as("j"))
      .agg(count(lit(1)).as("c"))
    // symmetric weights: A(i,j) = c(i->j) + c(j->i), kept as ORDERED
    // pairs so within-community weight double-counts like 2m does
    val a = e0.select(col("i"), col("j"), col("c"))
      .union(e0.select(col("j"), col("i"), col("c")))
      .groupBy("i", "j").agg(sum("c").as("w"))
      .localCheckpoint() // feeds degrees AND the within-region sum
    val reg = t("nation").join(t("region"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("nk"), col("r_name").as("region"))
    val k = a.groupBy("i").agg(sum("w").as("k"))
      .join(broadcast(reg), col("i") === col("nk"))
    val dc = k.groupBy("region").agg(sum("k").as("d_c"))
    val within = a
      .join(broadcast(reg.select(col("nk").as("i"), col("region").as("ri"))), Seq("i"))
      .join(broadcast(reg.select(col("nk").as("j"), col("region").as("rj"))), Seq("j"))
      .filter(col("ri") === col("rj"))
      .groupBy(col("ri").as("region")).agg(sum("w").as("w_in"))
    val tot = dc.agg(sum("d_c").as("m2"),
      sum(col("d_c").cast("decimal(38,0)") *
        col("d_c").cast("decimal(38,0)")).as("sd2"))
      .crossJoin(dc.join(within, Seq("region"), "left")
        .agg(sum(coalesce(col("w_in"), lit(0L))).as("w_in_all")))
    val q = tot.select(
      (col("w_in_all").cast("double") / col("m2") -
        col("sd2").cast("double") /
          (col("m2").cast("double") * col("m2"))).as("q"))
    dc.join(within, Seq("region"), "left")
      .crossJoin(broadcast(q))
      .select(col("region"),
        col("d_c").cast("long").as("degree_mass"),
        coalesce(col("w_in"), lit(0L)).cast("long").as("within_weight"),
        round(col("q"), 6).as("modularity"))
      .orderBy("region")
  }

  private val q429Sql =
    """WITH e0 AS MATERIALIZED (
         SELECT c_nationkey AS i, s_nationkey AS j, count(*) AS c
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
         WHERE c_nationkey <> s_nationkey
         GROUP BY 1, 2),
       a AS MATERIALIZED (
         SELECT i, j, sum(c) AS w
         FROM (SELECT i, j, c FROM e0 UNION ALL SELECT j, i, c FROM e0)
         GROUP BY 1, 2),
       reg AS MATERIALIZED (
         SELECT n_nationkey AS nk, r_name AS region
         FROM nation JOIN region ON n_regionkey = r_regionkey),
       k AS (SELECT a.i, sum(a.w) AS k, reg.region
             FROM a JOIN reg ON reg.nk = a.i GROUP BY 1, 3),
       dc AS MATERIALIZED (
         SELECT region, sum(k) AS d_c FROM k GROUP BY 1),
       win AS MATERIALIZED (
         SELECT ri.region, sum(a.w) AS w_in
         FROM a JOIN reg ri ON ri.nk = a.i
                JOIN reg rj ON rj.nk = a.j
         WHERE ri.region = rj.region
         GROUP BY 1),
       tot AS (
         SELECT (SELECT sum(d_c) FROM dc) AS m2,
                (SELECT sum(CAST(d_c AS HUGEINT) * d_c) FROM dc) AS sd2,
                (SELECT sum(coalesce(w_in, 0))
                 FROM dc LEFT JOIN win USING (region)) AS w_in_all),
       q AS (
         SELECT CAST(w_in_all AS DOUBLE) / m2 -
                CAST(sd2 AS DOUBLE) / (CAST(m2 AS DOUBLE) * m2) AS q
         FROM tot)
       SELECT dc.region,
              CAST(d_c AS BIGINT) AS degree_mass,
              CAST(coalesce(w_in, 0) AS BIGINT) AS within_weight,
              round(q.q, 6) AS modularity
       FROM dc LEFT JOIN win USING (region) CROSS JOIN q
       ORDER BY dc.region"""

  // --------------------------------------------------------------- q430
  /** Degree ASSORTATIVITY (Newman 2002) of the embedding near-dup
    * graph — do highly-duplicated documents link to other
    * highly-duplicated ones (r > 0: boilerplate families chain into
    * hubs) or to isolated near-singletons (r < 0)? Pearson correlation
    * of endpoint degrees over the directed symmetric edge list: every
    * sum (M, Σk, Σk², Σk_i·k_j) is an EXACT integer aggregate, and r
    * is one fixed-order double expression at the end — the same
    * no-float-folds discipline as q429. Graph = the q65 blocked
    * near-dup pairs; degrees are per-node integer counts. */
  private def q430(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val pairs = Similarity.nearDupPairs(Tables(s, dir)("embeddings"),
        "vec_id", "embedding", blockCol = "label", threshold = 0.3)
      .select(col("id_a"), col("id_b"))
    val und = pairs.select(col("id_a").as("i"), col("id_b").as("j"))
      .union(pairs.select(col("id_b"), col("id_a")))
      .localCheckpoint() // feeds the degree agg AND the edge scan
    val deg = und.groupBy("i").agg(count(lit(1)).as("k"))
    val ej = und
      .join(deg.select(col("i"), col("k").as("ka")), Seq("i"))
      .join(deg.select(col("i").as("j"), col("k").as("kb")), Seq("j"))
    val sums = ej.agg(count(lit(1)).as("m"),
      sum("ka").as("sx"), sum("kb").as("sy"),
      sum(col("ka") * col("kb")).as("sxy"),
      sum(col("ka") * col("ka")).as("sxx"),
      sum(col("kb") * col("kb")).as("syy"))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes")))
    val md = col("m").cast("double")
    val num = col("sxy").cast("double") / md -
      (col("sx").cast("double") / md) * (col("sy").cast("double") / md)
    val vx = col("sxx").cast("double") / md -
      (col("sx").cast("double") / md) * (col("sx").cast("double") / md)
    val vy = col("syy").cast("double") / md -
      (col("sy").cast("double") / md) * (col("sy").cast("double") / md)
    sums.select(col("n_nodes").cast("long").as("n_nodes"),
      (col("m") / 2).cast("long").as("n_edges"),
      round(when(vx * vy === 0, 0.0)
        .otherwise(num / sqrt(vx * vy)), 6).as("assortativity"))
  }

  private val q430Sql =
    s"""WITH p AS MATERIALIZED (
         SELECT a.vec_id AS id_a, b.vec_id AS id_b
         FROM embeddings a JOIN embeddings b
           ON a.label = b.label AND a.vec_id < b.vec_id
         WHERE ${OracleVec.cosSql("a.embedding", "b.embedding")} >= 0.3),
       und AS MATERIALIZED (
         SELECT id_a AS i, id_b AS j FROM p
         UNION ALL SELECT id_b, id_a FROM p),
       deg AS MATERIALIZED (SELECT i, count(*) AS k FROM und GROUP BY 1),
       ej AS (
         SELECT da.k AS ka, db.k AS kb
         FROM und JOIN deg da ON da.i = und.i
                  JOIN deg db ON db.i = und.j),
       sums AS (
         SELECT count(*) AS m, sum(ka) AS sx, sum(kb) AS sy,
                sum(ka * kb) AS sxy, sum(ka * ka) AS sxx,
                sum(kb * kb) AS syy,
                (SELECT count(*) FROM deg) AS n_nodes
         FROM ej)
       SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
              CAST(m // 2 AS BIGINT) AS n_edges,
              round(CASE WHEN
                  (CAST(sxx AS DOUBLE) / CAST(m AS DOUBLE) -
                   (CAST(sx AS DOUBLE) / CAST(m AS DOUBLE)) *
                   (CAST(sx AS DOUBLE) / CAST(m AS DOUBLE))) *
                  (CAST(syy AS DOUBLE) / CAST(m AS DOUBLE) -
                   (CAST(sy AS DOUBLE) / CAST(m AS DOUBLE)) *
                   (CAST(sy AS DOUBLE) / CAST(m AS DOUBLE))) = 0
                THEN 0.0
                ELSE (CAST(sxy AS DOUBLE) / CAST(m AS DOUBLE) -
                      (CAST(sx AS DOUBLE) / CAST(m AS DOUBLE)) *
                      (CAST(sy AS DOUBLE) / CAST(m AS DOUBLE))) /
                     sqrt(
                  (CAST(sxx AS DOUBLE) / CAST(m AS DOUBLE) -
                   (CAST(sx AS DOUBLE) / CAST(m AS DOUBLE)) *
                   (CAST(sx AS DOUBLE) / CAST(m AS DOUBLE))) *
                  (CAST(syy AS DOUBLE) / CAST(m AS DOUBLE) -
                   (CAST(sy AS DOUBLE) / CAST(m AS DOUBLE)) *
                   (CAST(sy AS DOUBLE) / CAST(m AS DOUBLE))))
                END, 6) AS assortativity
       FROM sums"""

  // --------------------------------------------------------------- q431
  /** MANN-KENDALL trend test per event type — the nonparametric "is
    * this feed drifting" companion to q422's change point (a change
    * point is a STEP; this detects monotone DRIFT, robust to
    * distribution shape): S = Σ_{i<j} sgn(x_j − x_i) over the daily
    * count series, tie-corrected variance, and the ±1-continuity
    * Z score with the 1.96 two-sided call. Everything is integers (S,
    * the tie-group cubic sums, the 18ths numerator) until the final
    * Z division — no float folds. The pair join is quadratic in DAYS
    * (365² per series, not corpus-sized) after the one (type, day)
    * corpus hash-agg. */
  private def q431(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables(s, dir)("events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // feeds both pair sides, ties, and totals
    val a = daily.select(col("event_type"), col("day").as("di"), col("c").as("xi"))
    val b = daily.select(col("event_type"), col("day").as("dj"), col("c").as("xj"))
    val sRel = a.join(b, Seq("event_type")).filter(col("di") < col("dj"))
      .groupBy("event_type")
      .agg(sum(when(col("xj") > col("xi"), 1L)
        .when(col("xj") < col("xi"), -1L).otherwise(0L)).as("s"))
    val ties = daily.groupBy(col("event_type"), col("c"))
      .agg(count(lit(1)).as("t"))
      .groupBy("event_type")
      .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5)).as("tsum"))
    val n = daily.groupBy("event_type").agg(count(lit(1)).as("n"))
    val z = n.join(ties, Seq("event_type")).join(sRel, Seq("event_type"))
      .withColumn("vr",
        (col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) - col("tsum"))
          .cast("double") / 18.0)
      .withColumn("z",
        when(col("s") > 0, (col("s") - 1).cast("double") / sqrt(col("vr")))
          .when(col("s") < 0, (col("s") + 1).cast("double") / sqrt(col("vr")))
          .otherwise(0.0))
    z.select(col("event_type"), col("n").cast("long").as("n_days"),
        col("s").cast("long").as("s"),
        round(col("vr"), 6).as("variance"),
        round(col("z"), 6).as("z"),
        when(col("z") >= 1.96, "increasing")
          .when(col("z") <= -1.96, "decreasing")
          .otherwise("no_trend").as("trend"))
      .orderBy("event_type")
  }

  private val q431Sql =
    """WITH daily AS MATERIALIZED (
         SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
         FROM events GROUP BY 1, 2),
       s_rel AS (
         SELECT a.event_type,
                sum(CASE WHEN b.c > a.c THEN 1
                         WHEN b.c < a.c THEN -1 ELSE 0 END) AS s
         FROM daily a JOIN daily b
           ON a.event_type = b.event_type AND a.day < b.day
         GROUP BY 1),
       ties AS (
         SELECT event_type,
                sum(t * (t - 1) * (2 * t + 5)) AS tsum
         FROM (SELECT event_type, c, count(*) AS t
               FROM daily GROUP BY 1, 2)
         GROUP BY 1),
       n AS (SELECT event_type, count(*) AS n FROM daily GROUP BY 1),
       z AS (
         SELECT n.event_type, n.n, s_rel.s,
                CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tsum
                  AS DOUBLE) / 18.0 AS vr
         FROM n JOIN ties USING (event_type)
                JOIN s_rel USING (event_type))
       SELECT event_type, CAST(n AS BIGINT) AS n_days,
              CAST(s AS BIGINT) AS s,
              round(vr, 6) AS variance,
              round(CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) / sqrt(vr)
                         WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) / sqrt(vr)
                         ELSE 0.0 END, 6) AS z,
              CASE WHEN (CASE WHEN s > 0
                           THEN CAST(s - 1 AS DOUBLE) / sqrt(vr)
                           WHEN s < 0
                           THEN CAST(s + 1 AS DOUBLE) / sqrt(vr)
                           ELSE 0.0 END) >= 1.96 THEN 'increasing'
                   WHEN (CASE WHEN s > 0
                           THEN CAST(s - 1 AS DOUBLE) / sqrt(vr)
                           WHEN s < 0
                           THEN CAST(s + 1 AS DOUBLE) / sqrt(vr)
                           ELSE 0.0 END) <= -1.96 THEN 'decreasing'
                   ELSE 'no_trend' END AS trend
       FROM z ORDER BY event_type"""

  // --------------------------------------------------------------- q432
  /** THEIL-SEN robust slope per event type — the drift MAGNITUDE next
    * to q431's drift test: the median of all pairwise slopes
    * (x_j − x_i)/(day_j − day_i) shrugs off outlier days that wreck
    * a least-squares fit (q414's Zipf fit shows the OLS discipline;
    * this is its robust counterpart). The denominator is the CALENDAR
    * day gap (epoch-day coordinate), not the observation rank — a
    * series with missing days would otherwise compress the reported
    * drift into per-observed-step units. Each slope is ONE double
    * division of exact integers (IEEE-identical both engines); the
    * median is rank-selected under a (slope, i, j) total order — odd
    * count takes the middle row, even count averages the two middles
    * in fixed order. Intercept = median(x_i − slope·day_i) in the same
    * epoch-day coordinate, same selection. Quadratic in days per
    * series, never corpus-sized. */
  private def q432(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables(s, dir)("events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    // epoch-day integer coordinate: exact on both engines, carries the
    // true calendar gaps that row_number() would erase
    val ranked = daily
      .withColumn("dn", datediff(col("day"), to_date(lit("1970-01-01"))))
      .localCheckpoint() // feeds both pair sides and the residuals
    val a = ranked.select(col("event_type"), col("dn").as("i"), col("c").as("xi"))
    val b = ranked.select(col("event_type"), col("dn").as("j"), col("c").as("xj"))
    val slopes = a.join(b, Seq("event_type")).filter(col("i") < col("j"))
      .select(col("event_type"),
        ((col("xj") - col("xi")).cast("double") /
          (col("j") - col("i"))).as("sl"), col("i"), col("j"))
    def medianOf(df: DataFrame, valCol: String,
                 tieCols: Seq[String]): DataFrame = {
      val ord = (col(valCol) +: tieCols.map(col)).map(_.asc)
      val ww = Window.partitionBy("event_type").orderBy(ord: _*)
      val wp = Window.partitionBy("event_type")
      df.withColumn("r", row_number().over(ww))
        .withColumn("m", count(lit(1)).over(wp))
        .filter(col("r") === expr("(m + 1) div 2") ||
          col("r") === expr("(m + 2) div 2"))
        .groupBy("event_type")
        .agg((sum(col(valCol)) /
          when(pmod(max("m"), lit(2)) === 1, 1.0).otherwise(2.0)).as("med"))
    }
    val slope = medianOf(slopes, "sl", Seq("i", "j"))
      .withColumnRenamed("med", "slope")
    val resid = ranked.join(slope, Seq("event_type"))
      .select(col("event_type"),
        (col("c").cast("double") - col("slope") * col("dn")).as("rs"),
        col("dn"), col("slope"))
    val intercept = medianOf(resid.select(col("event_type"), col("rs"),
        col("dn")), "rs", Seq("dn"))
      .withColumnRenamed("med", "intercept")
    slope.join(intercept, Seq("event_type"))
      .select(col("event_type"),
        round(col("slope"), 6).as("slope"),
        round(col("intercept"), 6).as("intercept"))
      .orderBy("event_type")
  }

  private val q432Sql = {
    // median under a (val, ties...) total order: middle row for odd m,
    // mean of the two middles for even (integer (m+1)//2 and (m+2)//2
    // coincide when odd)
    def medianSql(rel: String, v: String, ties: String): String =
      s"""SELECT event_type,
            sum(CASE WHEN r = (m + 1) // 2 OR r = (m + 2) // 2
                THEN $v ELSE 0.0 END) /
            (CASE WHEN m % 2 = 1 THEN 1.0 ELSE 2.0 END) AS med
          FROM (SELECT event_type, $v,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY $v, $ties) AS r,
                  count(*) OVER (PARTITION BY event_type) AS m
                FROM $rel)
          GROUP BY event_type, m"""
    s"""WITH daily AS (
         SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
         FROM events GROUP BY 1, 2),
       ranked AS MATERIALIZED (
         SELECT event_type, c,
           datediff('day', DATE '1970-01-01', day) AS dn
         FROM daily),
       slopes AS MATERIALIZED (
         SELECT a.event_type,
                CAST(b.c - a.c AS DOUBLE) / (b.dn - a.dn) AS sl,
                a.dn AS i, b.dn AS j
         FROM ranked a JOIN ranked b
           ON a.event_type = b.event_type AND a.dn < b.dn),
       slope AS MATERIALIZED (
         ${medianSql("slopes", "sl", "i, j")}),
       resid AS (
         SELECT r.event_type,
                CAST(r.c AS DOUBLE) - slope.med * r.dn AS rs, r.dn
         FROM ranked r JOIN slope ON slope.event_type = r.event_type),
       icept AS (
         ${medianSql("resid", "rs", "dn")})
       SELECT slope.event_type,
              round(slope.med, 6) AS slope,
              round(icept.med, 6) AS intercept
       FROM slope JOIN icept ON icept.event_type = slope.event_type
       ORDER BY slope.event_type"""
  }

  // --------------------------------------------------------------- q433
  /** SEASONAL Mann-Kendall (Hirsch & Slack 1984) — q431 made robust to
    * weekly periodicity: a weekday cycle (weekend dips) reads as pure
    * noise to plain MK or even masks a real drift; stratifying by
    * weekday and comparing each day only against SAME-weekday days
    * removes the cycle from S entirely. S' = Σ_g S_g and
    * var' = Σ_g var_g over the seven strata, with the same ±1
    * continuity Z. The weekday key never appears in the output, so
    * Spark's 1-7 vs DuckDB's 0-6 dayofweek conventions don't matter —
    * only the equality PARTITIONING must agree, and both map the same
    * date to the same stratum. All integers until the final Z. */
  private def q433(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables(s, dir)("events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .withColumn("g", dayofweek(col("day")))
      .localCheckpoint() // feeds both pair sides, ties, and totals
    val a = daily.select(col("event_type"), col("g"),
      col("day").as("di"), col("c").as("xi"))
    val b = daily.select(col("event_type"), col("g"),
      col("day").as("dj"), col("c").as("xj"))
    val sRel = a.join(b, Seq("event_type", "g"))
      .filter(col("di") < col("dj"))
      .groupBy("event_type")
      .agg(sum(when(col("xj") > col("xi"), 1L)
        .when(col("xj") < col("xi"), -1L).otherwise(0L)).as("s"))
    val perG = daily.groupBy("event_type", "g")
      .agg(count(lit(1)).as("ng"))
    val ties = daily.groupBy(col("event_type"), col("g"), col("c"))
      .agg(count(lit(1)).as("t"))
      .groupBy("event_type", "g")
      .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5)).as("tsum"))
    val vr = perG.join(ties, Seq("event_type", "g"))
      .groupBy("event_type")
      .agg(sum(col("ng") * (col("ng") - 1) * (lit(2) * col("ng") + 5)
        - col("tsum")).as("vnum"),
        sum("ng").as("n"))
    val z = vr.join(sRel, Seq("event_type"))
      .withColumn("vr", col("vnum").cast("double") / 18.0)
      .withColumn("z",
        when(col("s") > 0, (col("s") - 1).cast("double") / sqrt(col("vr")))
          .when(col("s") < 0, (col("s") + 1).cast("double") / sqrt(col("vr")))
          .otherwise(0.0))
    z.select(col("event_type"), col("n").cast("long").as("n_days"),
        col("s").cast("long").as("s"),
        round(col("vr"), 6).as("variance"),
        round(col("z"), 6).as("z"),
        when(col("z") >= 1.96, "increasing")
          .when(col("z") <= -1.96, "decreasing")
          .otherwise("no_trend").as("trend"))
      .orderBy("event_type")
  }

  private val q433Sql =
    """WITH daily AS MATERIALIZED (
         SELECT event_type, CAST(ts AS DATE) AS day,
                dayofweek(CAST(ts AS DATE)) AS g, count(*) AS c
         FROM events GROUP BY 1, 2, 3),
       s_rel AS (
         SELECT a.event_type,
                sum(CASE WHEN b.c > a.c THEN 1
                         WHEN b.c < a.c THEN -1 ELSE 0 END) AS s
         FROM daily a JOIN daily b
           ON a.event_type = b.event_type AND a.g = b.g
              AND a.day < b.day
         GROUP BY 1),
       per_g AS (
         SELECT event_type, g, count(*) AS ng
         FROM daily GROUP BY 1, 2),
       ties AS (
         SELECT event_type, g,
                sum(t * (t - 1) * (2 * t + 5)) AS tsum
         FROM (SELECT event_type, g, c, count(*) AS t
               FROM daily GROUP BY 1, 2, 3)
         GROUP BY 1, 2),
       vr AS (
         SELECT p.event_type,
                sum(p.ng * (p.ng - 1) * (2 * p.ng + 5) - ties.tsum) AS vnum,
                sum(p.ng) AS n
         FROM per_g p JOIN ties USING (event_type, g)
         GROUP BY 1),
       z AS (
         SELECT vr.event_type, vr.n, s_rel.s,
                CAST(vr.vnum AS DOUBLE) / 18.0 AS vr
         FROM vr JOIN s_rel USING (event_type))
       SELECT event_type, CAST(n AS BIGINT) AS n_days,
              CAST(s AS BIGINT) AS s,
              round(vr, 6) AS variance,
              round(CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) / sqrt(vr)
                         WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) / sqrt(vr)
                         ELSE 0.0 END, 6) AS z,
              CASE WHEN (CASE WHEN s > 0
                           THEN CAST(s - 1 AS DOUBLE) / sqrt(vr)
                           WHEN s < 0
                           THEN CAST(s + 1 AS DOUBLE) / sqrt(vr)
                           ELSE 0.0 END) >= 1.96 THEN 'increasing'
                   WHEN (CASE WHEN s > 0
                           THEN CAST(s - 1 AS DOUBLE) / sqrt(vr)
                           WHEN s < 0
                           THEN CAST(s + 1 AS DOUBLE) / sqrt(vr)
                           ELSE 0.0 END) <= -1.96 THEN 'decreasing'
                   ELSE 'no_trend' END AS trend
       FROM z ORDER BY event_type"""

  override def queries: Map[String, QueryFn] = Map(
    "q433_seasonal_mk" -> q433 _,
    "q431_mann_kendall" -> q431 _,
    "q432_theil_sen" -> q432 _,
    "q430_assortativity" -> q430 _,
    "q429_modularity" -> q429 _,
    "q428_textrank" -> q428 _,
    "q426_jenks_tiers" -> q426 _,
    "q422_change_point" -> q422 _,
    "q423_unimax_budget" -> q423 _,
    "q424_quantile_norm" -> q424 _,
    "q425_benford" -> q425 _)

  override def oracles: Map[String, String] = Map(
    "q433_seasonal_mk" -> q433Sql,
    "q431_mann_kendall" -> q431Sql,
    "q432_theil_sen" -> q432Sql,
    "q430_assortativity" -> q430Sql,
    "q429_modularity" -> q429Sql,
    "q428_textrank" -> q428Sql,
    "q426_jenks_tiers" -> q426Sql,
    "q422_change_point" -> q422Sql,
    "q423_unimax_budget" -> q423Sql,
    "q424_quantile_norm" -> q424Sql,
    "q425_benford" -> q425Sql)
}
