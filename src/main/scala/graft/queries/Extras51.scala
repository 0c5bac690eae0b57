package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.CountMinSketch
import graft.functions.expressions.MinHashSignature

/** Round-4 surface, part 47: the Count-Min sketch family (audit +
  * width tuning), winsorized means, tail CCDFs, corpus duplication
  * mass, and first-touch attribution.
  *
  * The CMS queries are the sketch counterpart of q314's LSH sweep:
  * deterministic md5-affine hashes make the sketch bit-identical in
  * both engines, so the oracle rebuilds it relationally and the audit
  * is exact. Everything else is pure integer arithmetic. */
object Extras51 extends QueryPack {

  private val P = MinHashSignature.P

  private def mdHash(s: Column): Column =
    conv(substring(md5(encode(s, "UTF-8")), 1, 8), 16, 10).cast("long")

  private def mdHashSql(e: String) =
    s"(('0x' || substr(md5($e), 1, 8))::BIGINT)"

  private val toksSpark: SparkSession => (String => DataFrame) = s => dir =>
    Tables(s, dir)("documents").select(
      explode(filter(split(lower(col("text")), "[^a-z]+"),
        w => length(w) > 0)).as("w"))

  private val toksSqlCte =
    """toks AS (
         SELECT t.w
         FROM documents,
              unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS t(w)
         WHERE t.w <> '')"""

  // --------------------------------------------------------------- q325
  /** Count-Min sketch audit: a d=4 × w=256 sketch built by the typed
    * Aggregator (functions.CountMinSketch) over the token stream, then
    * point-estimated for the exact top-20 words — estimate, truth, and
    * the overestimate (always ≥ 0). The oracle rebuilds the identical
    * sketch with four GROUP BYs and a least() — the CM guarantee
    * verified end-to-end. */
  private val cmsD = 4
  private val cmsW = 256

  private def q325(s: SparkSession, dir: String): DataFrame = {
    val toks = toksSpark(s)(dir)
    val th = toks.select(pmod(mdHash(col("w")), lit(P)).as("h"))
    val cms = F.udaf(new CountMinSketch(cmsD, cmsW), Encoders.scalaLong)
    val sketch = th.agg(cms(col("h")).as("sk"))
    val top = toks.groupBy("w").agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("w").asc).limit(20)
      .withColumn("h", pmod(mdHash(col("w")), lit(P)))
    val est = least((0 until cmsD).map { r =>
      val (a, b) = MinHashSignature.coef(r)
      element_at(col("sk"),
        (lit(r * cmsW)
          + pmod(pmod(lit(a) * col("h") + lit(b), lit(P)), lit(cmsW))
          + 1).cast("int"))
    }: _*)
    top.crossJoin(broadcast(sketch))
      .select(col("w").as("word"), col("exact").cast("long").as("exact"),
        est.cast("long").as("cms_estimate"),
        (est - col("exact")).cast("long").as("overestimate"))
      .orderBy(col("exact").desc, col("word"))
  }

  private val q325Sql = {
    val rows = (0 until cmsD).map { r =>
      val (a, b) = MinHashSignature.coef(r)
      s"""b$r AS (
            SELECT (($a * h + $b) % $P) % $cmsW AS bkt, count(*) AS c
            FROM th GROUP BY 1)"""
    }
    val joins = (0 until cmsD).map { r =>
      val (a, b) = MinHashSignature.coef(r)
      s"JOIN b$r ON (($a * top.h + $b) % $P) % $cmsW = b$r.bkt"
    }
    val leastExpr = (0 until cmsD).map(r => s"b$r.c").mkString("least(", ", ", ")")
    s"""WITH $toksSqlCte,
       th AS (SELECT ${mdHashSql("w")} % $P AS h FROM toks),
       ${rows.mkString(",\n       ")},
       top AS (
         SELECT w, count(*) AS exact, ${mdHashSql("w")} % $P AS h
         FROM toks GROUP BY w ORDER BY exact DESC, w LIMIT 20)
       SELECT top.w AS word, CAST(exact AS BIGINT) AS exact,
              CAST($leastExpr AS BIGINT) AS cms_estimate,
              CAST($leastExpr - exact AS BIGINT) AS overestimate
       FROM top ${joins.mkString("\n         ")}
       ORDER BY exact DESC, word"""
  }

  // --------------------------------------------------------------- q326
  /** Winsorized vs raw mean order value per priority: the 5% tails are
    * CLAMPED to the exact order statistics at the cut points (not
    * dropped, unlike q305's trim), so the winsorized sum is
    * middle + cut·(lo + hi) — every term an exact integer. */
  private def q326(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val w = Window.partitionBy("prio").orderBy(col("c"), col("o_orderkey"))
    val wn = Window.partitionBy("prio")
    val ranked = o.select(col("o_orderpriority").as("prio"),
        floor(col("o_totalprice") * 100 + 0.5).as("c"), col("o_orderkey"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("cut", floor(col("n") / 20))
    ranked.groupBy("prio")
      .agg(max("n").as("n"), max("cut").as("cut"),
        sum("c").as("s_all"),
        sum(when(col("rn") > col("cut")
          && col("rn") <= col("n") - col("cut"), col("c"))
          .otherwise(0L)).as("s_mid"),
        max(when(col("rn") === col("cut") + 1, col("c"))).as("lo"),
        max(when(col("rn") === col("n") - col("cut"), col("c"))).as("hi"))
      .select(col("prio"), col("n").cast("long").as("n"),
        round(col("s_all").cast("double") / col("n") / 100, 4).as("mean"),
        round((col("s_mid") + col("cut") * (col("lo") + col("hi")))
          .cast("double") / col("n") / 100, 4).as("winsorized_mean"))
      .orderBy("prio")
  }

  private val q326Sql =
    """WITH ranked AS (
         SELECT o_orderpriority AS prio,
                CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
                row_number() OVER (PARTITION BY o_orderpriority
                  ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT),
                           o_orderkey) AS rn,
                count(*) OVER (PARTITION BY o_orderpriority) AS n
         FROM orders),
       cut AS (SELECT *, CAST(floor(n / 20) AS BIGINT) AS cut FROM ranked)
       SELECT prio, CAST(any_value(n) AS BIGINT) AS n,
              round(CAST(sum(c) AS DOUBLE) / any_value(n) / 100, 4)
                AS mean,
              round(CAST(sum(CASE WHEN rn > cut AND rn <= n - cut
                    THEN c ELSE 0 END)
                  + any_value(cut)
                    * (max(CASE WHEN rn = cut + 1 THEN c END)
                      + max(CASE WHEN rn = n - cut THEN c END))
                  AS DOUBLE) / any_value(n) / 100, 4) AS winsorized_mean
       FROM cut GROUP BY prio ORDER BY prio"""

  // --------------------------------------------------------------- q327
  /** Order-value CCDF at fixed cent thresholds — the log-spaced tail
    * table that pairs with q315's Hill fit. One pass of conditional
    * sums, unpivoted; integer counts and exact shares. */
  private val ccdfThresholds: Seq[Long] = Seq(
    1000000L, 2000000L, 5000000L, 10000000L,
    15000000L, 20000000L, 25000000L, 30000000L, 35000000L)

  private def q327(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val c = floor(col("o_totalprice") * 100 + 0.5)
    val aggs = count(lit(1)).as("n") +:
      ccdfThresholds.zipWithIndex.map { case (t, i) =>
        sum(when(c >= t, 1L).otherwise(0L)).as(s"a$i")
      }
    val wide = o.agg(aggs.head, aggs.tail: _*)
    val stacked = ccdfThresholds.zipWithIndex.map { case (t, i) =>
      wide.select(lit(t).as("threshold_cents"), col(s"a$i").as("n_above"),
        col("n"))
    }.reduce(_ unionByName _)
    stacked.select(col("threshold_cents"),
        col("n_above").cast("long").as("n_above"),
        round(col("n_above").cast("double") / col("n"), 6).as("ccdf"))
      .orderBy("threshold_cents")
  }

  private val q327Sql = {
    val sums = ccdfThresholds.zipWithIndex.map { case (t, i) =>
      s"sum(CASE WHEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) >= $t THEN 1 ELSE 0 END) AS a$i"
    }
    val rows = ccdfThresholds.zipWithIndex.map { case (t, i) =>
      s"SELECT CAST($t AS BIGINT) AS threshold_cents, a$i AS n_above, n FROM agg"
    }
    s"""WITH agg AS (
         SELECT count(*) AS n, ${sums.mkString(",\n                ")}
         FROM orders)
       SELECT threshold_cents, CAST(n_above AS BIGINT) AS n_above,
              round(CAST(n_above AS DOUBLE) / n, 6) AS ccdf
       FROM (${rows.mkString("\nUNION ALL\n")})
       ORDER BY threshold_cents"""
  }

  // --------------------------------------------------------------- q328
  /** Corpus-level duplication mass: what share of all word-5-gram
    * instances are repeats of an already-seen gram — the single number
    * that says "how much of this corpus is boilerplate". Two integer
    * counts (instances, distinct) from one explode. */
  private def q328(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val toks = filter(split(lower(col("text")), "[^a-z]+"),
      w => length(w) > 0)
    val grams = d.select(toks.as("toks"))
      .filter(size(col("toks")) >= 5)
      .select(explode(transform(
        sequence(lit(0), size(col("toks")) - 5),
        i => concat_ws(" ", slice(col("toks"), i + 1, lit(5))))).as("g"))
    grams.agg(count(lit(1)).as("total"),
        countDistinct("g").as("distinct_g"))
      .select(col("total").cast("long").as("total_grams"),
        col("distinct_g").cast("long").as("distinct_grams"),
        round((col("total") - col("distinct_g")).cast("double")
          / col("total"), 6).as("dup_mass"))
  }

  private val q328Sql =
    """WITH toks AS (
         SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                  w -> w <> '') AS t
         FROM documents),
       grams AS (
         SELECT unnest(list_transform(generate_series(0, len(t) - 5),
                  i -> array_to_string(t[i + 1:i + 5], ' '))) AS g
         FROM toks WHERE len(t) >= 5)
       SELECT CAST(count(*) AS BIGINT) AS total_grams,
              CAST(count(DISTINCT g) AS BIGINT) AS distinct_grams,
              round(CAST(count(*) - count(DISTINCT g) AS DOUBLE)
                / count(*), 6) AS dup_mass
       FROM grams"""

  // --------------------------------------------------------------- q329
  /** CMS width tuning: the mean/max overestimate on the exact top-20
    * words for w ∈ {64, 256, 1024} — the q314-style parameter table,
    * built relationally in BOTH engines (the sketch math is four
    * GROUP BYs whatever the width). Integer everywhere; the mean is
    * one exact division by 20. */
  private def q329(s: SparkSession, dir: String): DataFrame = {
    // ONE tokenization pass feeds both the hash stream and the exact
    // top-20 (materialized: the two branches would otherwise re-explode
    // the corpus), and ONE shuffled bucket-count at the FINEST width
    // replaces the previous 3×cmsD separate aggregate passes: the
    // widths nest (64 | 256 | 1024), so (x mod 1024) mod w == x mod w
    // and the narrower tables are exact rollups of the d×1024-row
    // finest table — integer math, bit-identical to counting each width
    // directly, which is what the oracle still does independently.
    val toks = toksSpark(s)(dir).localCheckpoint()
    val th = toks.select(pmod(mdHash(col("w")), lit(P)).as("h"))
    val top = toks.groupBy("w").agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("w").asc).limit(20)
      .withColumn("h", pmod(mdHash(col("w")), lit(P)))

    val wMax = 1024
    def buckets(width: Int): Seq[Column] = (0 until cmsD).map { r =>
      val (a, b) = MinHashSignature.coef(r)
      pmod(pmod(lit(a) * col("h") + lit(b), lit(P)), lit(width))
    }
    val cFine = th
      .select(posexplode(array(buckets(wMax): _*)).as(Seq("r", "bkt")))
      .groupBy("r", "bkt").agg(count(lit(1)).as("c"))
      .localCheckpoint() // ≤ d×1024 rows, read three times below
    def countsAt(width: Int): DataFrame =
      if (width == wMax) cFine
      else cFine.groupBy(col("r"), pmod(col("bkt"), lit(width)).as("bkt"))
        .agg(sum("c").as("c"))

    val perW = Seq(64, 256, 1024).map { width =>
      top
        .select(col("w"), col("exact"),
          posexplode(array(buckets(width): _*)).as(Seq("r", "bkt")))
        .join(broadcast(countsAt(width)), Seq("r", "bkt"))
        .groupBy(col("w"), col("exact"))
        .agg(min(col("c")).as("est")) // least over d rows == min per word
        .select((col("est") - col("exact")).as("over"))
        .agg(sum("over").as("sum_over"), max("over").as("max_over"))
        .select(lit(width).as("width"), col("sum_over"), col("max_over"))
    }
    perW.reduce(_ unionByName _)
      .select(col("width").cast("int").as("width"),
        round(col("sum_over").cast("double") / 20, 4).as("mean_overestimate"),
        col("max_over").cast("long").as("max_overestimate"))
      .orderBy("width")
  }

  private val q329Sql = {
    def block(width: Int): (String, String) = {
      val rows = (0 until cmsD).map { r =>
        val (a, b) = MinHashSignature.coef(r)
        s"""w${width}b$r AS (
              SELECT (($a * h + $b) % $P) % $width AS bkt, count(*) AS c
              FROM th GROUP BY 1)"""
      }
      val joins = (0 until cmsD).map { r =>
        val (a, b) = MinHashSignature.coef(r)
        s"JOIN w${width}b$r ON (($a * top.h + $b) % $P) % $width = w${width}b$r.bkt"
      }
      val leastExpr = (0 until cmsD).map(r => s"w${width}b$r.c")
        .mkString("least(", ", ", ")")
      (rows.mkString(",\n       "),
        s"""SELECT $width AS width,
              sum($leastExpr - exact) AS sum_over,
              max($leastExpr - exact) AS max_over
            FROM top ${joins.mkString("\n              ")}""")
    }
    val blocks = Seq(64, 256, 1024).map(block)
    s"""WITH $toksSqlCte,
       th AS (SELECT ${mdHashSql("w")} % $P AS h FROM toks),
       top AS (
         SELECT w, count(*) AS exact, ${mdHashSql("w")} % $P AS h
         FROM toks GROUP BY w ORDER BY exact DESC, w LIMIT 20),
       ${blocks.map(_._1).mkString(",\n       ")}
       SELECT CAST(width AS INT) AS width,
              round(CAST(sum_over AS DOUBLE) / 20, 4) AS mean_overestimate,
              CAST(max_over AS BIGINT) AS max_overestimate
       FROM (${blocks.map(_._2).mkString("\nUNION ALL\n")})
       ORDER BY width"""
  }

  // --------------------------------------------------------------- q330
  /** First-touch attribution over converted sessions: the 30-minute
    * islands of q322, filtered to purchase sessions, attributed to the
    * session's FIRST event type — counts and shares per entry channel.
    * Integer set logic on the same single user-keyed shuffle. */
  private def q330(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val marked = e
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("brk",
        when(col("us") - lag(col("us"), 1).over(w)
          > 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("sid", sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ws = Window.partitionBy("user_id", "sid")
      .orderBy(col("us"), col("event_id"))
    val sessions = marked
      .withColumn("rn", row_number().over(ws))
      .groupBy("user_id", "sid")
      .agg(max(when(col("rn") === 1, col("event_type"))).as("first_type"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
      .filter(col("conv") === 1)
    val tot = sessions.agg(count(lit(1)).as("n"))
    sessions.groupBy("first_type")
      .agg(count(lit(1)).as("n_sessions"))
      .crossJoin(broadcast(tot))
      .select(col("first_type"),
        col("n_sessions").cast("long").as("n_sessions"),
        round(col("n_sessions").cast("double") / col("n"), 5).as("share"))
      .orderBy("first_type")
  }

  private val q330Sql =
    """WITH marked AS (
         SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
                CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                       > 1800 * 1000000
                     THEN 1 ELSE 0 END AS brk
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       sess AS (
         SELECT user_id, event_id, event_type, us,
                sum(brk) OVER (PARTITION BY user_id
                  ORDER BY us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         FROM marked),
       sessions AS (
         SELECT user_id, sid,
                max(CASE WHEN rn = 1 THEN event_type END) AS first_type,
                max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS conv
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id, sid
                 ORDER BY us, event_id) AS rn FROM sess)
         GROUP BY 1, 2),
       conv AS (SELECT first_type FROM sessions WHERE conv = 1),
       tot AS (SELECT count(*) AS n FROM conv)
       SELECT first_type, CAST(count(*) AS BIGINT) AS n_sessions,
              round(CAST(count(*) AS DOUBLE) / any_value(n), 5) AS share
       FROM conv CROSS JOIN tot
       GROUP BY first_type ORDER BY first_type"""

  override def queries: Map[String, QueryFn] = Map(
    "q325_cms_audit"       -> q325 _,
    "q326_winsorized_mean" -> q326 _,
    "q327_ccdf_tail"       -> q327 _,
    "q328_dup_token_mass"  -> q328 _,
    "q329_cms_width_sweep" -> q329 _,
    "q330_attribution_mix" -> q330 _)

  override def oracles: Map[String, String] = Map(
    "q325_cms_audit"       -> q325Sql,
    "q326_winsorized_mean" -> q326Sql,
    "q327_ccdf_tail"       -> q327Sql,
    "q328_dup_token_mass"  -> q328Sql,
    "q329_cms_width_sweep" -> q329Sql,
    "q330_attribution_mix" -> q330Sql)
}
