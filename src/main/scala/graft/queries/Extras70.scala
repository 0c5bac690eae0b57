package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 pack: the language-sliced curation funnel (q449 — LangId
  * wired into [[graft.pipelines.CurationPipeline]] as stage 0), the
  * executable temperature-mixed sample (q450 —
  * [[graft.operators.TemperatureMix.sample]], the q446 allocations
  * actually drawn), the true Leiden level schedule (q451 — refine
  * BETWEEN local moves and contraction), and mixed-language document
  * segmentation (q452 — [[graft.operators.LangId.spans]], Chunker ×
  * LangId with run-length merge).
  */
object Extras70 extends QueryPack {

  // --------------------------------------------------------------- q449
  /** LANGUAGE-SLICED CURATION FUNNEL — the batch pipeline run with its
    * content-dedup gates switched OFF (threshold > max attainable
    * signal skips the work entirely, the perplexity-gate idiom) and the
    * LangId stage-0 gate ON (de/en/es/fr; 'und' drops), returning the
    * per-stage × per-predicted-language funnel report. This pins the
    * REAL runStages code path — classification, language gate, exact
    * dedup, decontamination, quality, repetition, hash sample, and the
    * per-language slice accounting — against a DuckDB replay of every
    * cross-engine-expressible stage (the off gates replay as
    * identities). The xxhash64 content gates are pinned separately by
    * their golden specs and the funnel-equality suite; this query is
    * the language-slice contract. */
  private def q449(s: SparkSession, dir: String): DataFrame = {
    import graft.pipelines.CurationPipeline
    val (_, funnel) = CurationPipeline.run(s, Tables(s, dir)("documents"),
      nearDupThreshold = 1.1,     // off: est-Jaccard <= 1
      maxSubstringDupFrac = 1.0,  // off: dup_frac <= 1
      minContainment = 1.1,       // off: containment <= 1
      maxWinnowDupFrac = 1.0,     // off: winnow frac <= 1
      allowedLangs = Some(Set("de", "en", "es", "fr")))
    import s.implicits._
    funnel
      .flatMap(r => r.byLang.map { case (l, n) => (r.stage, l, n) })
      .toDF("stage", "pred_lang", "docs")
      .orderBy("stage", "pred_lang")
  }

  private val q449Sql: String = {
    import graft.operators.LangId
    val langs = LangId.defaultModel.map(_._1)
    val toks = "regexp_split_to_array(trim(text), '\\s+')"
    s"""WITH cls AS MATERIALIZED (
         SELECT doc_id, n_chars, text,
           ${OracleLangId.predCaseSql(langs)} AS pred_lang
         FROM (SELECT doc_id, n_chars, text,
                 ${OracleLangId.scoreListSql()}
               FROM (SELECT doc_id, n_chars, text,
                       ${OracleLangId.surfaceSql("text")} AS s
                     FROM documents))),
       lg AS MATERIALIZED (
         SELECT * FROM cls WHERE pred_lang IN ('de', 'en', 'es', 'fr')),
       ex AS MATERIALIZED (
         SELECT lg.* FROM lg JOIN (
           SELECT min(doc_id) AS doc_id FROM (
             SELECT doc_id,
               md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
             FROM lg)
           GROUP BY fp) sv USING (doc_id)),
       shbase AS (
         SELECT doc_id, $toks AS toks FROM ex WHERE len($toks) >= 3),
       sh AS MATERIALIZED (
         SELECT doc_id,
           unnest(list_distinct(list_transform(
             generate_series(1, len(toks) - 2),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS sh
         FROM shbase),
       contaminated AS MATERIALIZED (
         SELECT DISTINCT c.doc_id
         FROM sh c JOIN sh b ON c.sh = b.sh AND b.doc_id % 97 = 0
         WHERE c.doc_id % 97 <> 0),
       dc AS MATERIALIZED (
         SELECT * FROM ex WHERE doc_id % 97 <> 0
           AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
       ql AS MATERIALIZED (
         SELECT * FROM dc
         WHERE n_chars >= 64 AND n_chars <= 4096 AND len($toks) >= 8),
       rep AS MATERIALIZED (
         SELECT * FROM (
           SELECT *, 1.0 -
             CAST(len(list_distinct(grams)) AS DOUBLE) /
               CAST(len(grams) AS DOUBLE) AS dup_frac
           FROM (SELECT *, list_transform(
                   generate_series(1, greatest(len(ws) - 1, 1)),
                   i -> ws[i] || ' ' || ws[least(i + 1, len(ws))]) AS grams
                 FROM (SELECT *, string_split(text, ' ') AS ws FROM ql)))
         WHERE dup_frac <= 0.6),
       smp AS MATERIALIZED (
         SELECT * FROM rep
         WHERE ('0x' || substr(md5('smp:' || doc_id), 1, 8))::BIGINT % 1000
               < CASE WHEN pred_lang = 'en' THEN 800 ELSE 900 END)
       SELECT stage, pred_lang, CAST(docs AS BIGINT) AS docs FROM (
         SELECT 'input' AS stage, pred_lang, count(*) AS docs
         FROM cls GROUP BY 2
         UNION ALL SELECT 'language_gate', pred_lang, count(*)
         FROM lg GROUP BY 2
         UNION ALL SELECT 'exact_dedup', pred_lang, count(*)
         FROM ex GROUP BY 2
         UNION ALL SELECT 'near_dedup', pred_lang, count(*)
         FROM ex GROUP BY 2
         UNION ALL SELECT 'substring_gate', pred_lang, count(*)
         FROM ex GROUP BY 2
         UNION ALL SELECT 'containment_gate', pred_lang, count(*)
         FROM ex GROUP BY 2
         UNION ALL SELECT 'winnow_gate', pred_lang, count(*)
         FROM ex GROUP BY 2
         UNION ALL SELECT 'decontaminate', pred_lang, count(*)
         FROM dc GROUP BY 2
         UNION ALL SELECT 'quality_gate', pred_lang, count(*)
         FROM ql GROUP BY 2
         UNION ALL SELECT 'adaptive_quality', pred_lang, count(*)
         FROM ql GROUP BY 2
         UNION ALL SELECT 'repetition_gate', pred_lang, count(*)
         FROM rep GROUP BY 2
         UNION ALL SELECT 'perplexity_gate', pred_lang, count(*)
         FROM rep GROUP BY 2
         UNION ALL SELECT 'domain_cap', pred_lang, count(*)
         FROM rep GROUP BY 2
         UNION ALL SELECT 'hash_sample', pred_lang, count(*)
         FROM smp GROUP BY 2)
       ORDER BY stage, pred_lang"""
  }

  // --------------------------------------------------------------- q450
  /** TEMPERATURE-MIXED SAMPLE, EXECUTED — q446 computed the n^α
    * allocations; this draws them ([[graft.operators.TemperatureMix
    * .sample]]): langid buckets the corpus, α=3/4 sets each bucket's
    * exact largest-remainder quota of a budget = ⌊N/5⌋ (data-relative,
    * so the draw is meaningful at every SF), and each bucket's first
    * `alloc` rows in deterministic md5 order survive. Output pins the
    * contract: n_sampled = alloc per language (an undersupplied tiny
    * bucket would cap at n — visible, not silent) and id_checksum
    * pins the MEMBERSHIP, not just the counts. */
  private def q450(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{LangId, TemperatureMix}
    val cls = LangId.classify(Tables(s, dir)("documents"), "text")
      .select(col("doc_id"), col("pred_lang"))
      .localCheckpoint() // feeds the budget count, allocation, and draw
    val budget = cls.count() / 5
    val counts = cls.groupBy("pred_lang").agg(count(lit(1)).as("n"))
    val alloc = TemperatureMix.allocate(counts, "pred_lang", "n", budget, 3)
    TemperatureMix.sample(cls, "pred_lang", "doc_id", budget, 3)
      .groupBy("pred_lang")
      .agg(count(lit(1)).as("n_sampled"), sum("doc_id").as("id_checksum"))
      .join(alloc, Seq("pred_lang"))
      .select(col("pred_lang"), col("n").as("n_docs"), col("alloc"),
        col("n_sampled"), col("id_checksum"))
      .orderBy("pred_lang")
  }

  private val q450Sql: String = {
    import graft.operators.LangId
    val langs = LangId.defaultModel.map(_._1)
    val root = "sqrt(sqrt(CAST(n AS DOUBLE)))"
    val w = s"1.0 * $root * $root * $root"
    s"""WITH cls AS MATERIALIZED (
         SELECT doc_id,
           ${OracleLangId.predCaseSql(langs)} AS pred_lang
         FROM (SELECT doc_id,
                 ${OracleLangId.scoreListSql()}
               FROM (SELECT doc_id,
                       ${OracleLangId.surfaceSql("text")} AS s
                     FROM documents))),
       bdg AS (SELECT count(*) // 5 AS b FROM cls),
       cnt AS MATERIALIZED (
         SELECT pred_lang, count(*) AS n FROM cls GROUP BY 1),
       tw AS (
         SELECT list_sum(list_transform(
           list({'k': pred_lang, 'w': $w} ORDER BY pred_lang),
           e -> e.w)) AS tw
         FROM cnt),
       q0 AS (
         SELECT pred_lang, n,
           CAST(floor(CAST(b AS DOUBLE) * ($w) / tw) AS BIGINT) AS fq,
           CAST(b AS DOUBLE) * ($w) / tw
             - floor(CAST(b AS DOUBLE) * ($w) / tw) AS rem,
           b
         FROM cnt CROSS JOIN tw CROSS JOIN bdg),
       al AS MATERIALIZED (
         SELECT pred_lang, n,
           fq + CASE WHEN row_number() OVER (ORDER BY rem DESC, pred_lang)
                       <= b - sum(fq) OVER () THEN 1 ELSE 0 END AS alloc
         FROM q0),
       rk AS MATERIALIZED (
         SELECT doc_id, pred_lang,
           row_number() OVER (PARTITION BY pred_lang
             ORDER BY md5('tmx:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
         FROM cls),
       smp AS (
         SELECT r.pred_lang, r.doc_id
         FROM rk r JOIN al ON al.pred_lang = r.pred_lang
         WHERE r.rk <= al.alloc)
       SELECT al.pred_lang, CAST(al.n AS BIGINT) AS n_docs,
              CAST(al.alloc AS BIGINT) AS alloc,
              CAST(count(smp.doc_id) AS BIGINT) AS n_sampled,
              CAST(sum(smp.doc_id) AS BIGINT) AS id_checksum
       FROM smp JOIN al ON al.pred_lang = smp.pred_lang
       GROUP BY 1, 2, 3
       ORDER BY al.pred_lang"""
  }

  // --------------------------------------------------------------- q451
  /** TRUE LEIDEN LEVEL SCHEDULE (Traag et al. 2019, Alg. 1) over the
    * trade graph: local moves → [[graft.operators.Louvain.refine]] →
    * contract the REFINED partition → moves → refine — refinement
    * sits BETWEEN the phases, so the aggregated graph's supernodes
    * are guaranteed-connected fragments (clusterLevels contracts the
    * unrefined partition, which can bake a disconnected community
    * into one unsplittable supernode; LouvainSpec plants that graph
    * and pins refined-schedule Q ≥ plain-schedule Q). The query
    * inlines the two-level schedule's phases (the same public
    * operators [[graft.operators.Louvain.clusterLevelsRefined]]
    * loops over — the spec pins query ≡ operator) so the output can
    * expose both the level-1 refined labels and the final projected
    * community; the oracle replays both 6-round chains, both
    * recursive-CTE fragment closures, and the contraction. m2 is
    * shared across levels because contraction preserves total edge
    * mass. */
  private def q451(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Louvain
    val a = LouvainGolden.edges(s, dir)
    val ref1 = Louvain.refine(a, "i", "j",
      LouvainGolden.chain(s, dir, LeidenRounds)).localCheckpoint()
    val e2 = Louvain.contract(a, "i", "j", "w",
      ref1.select(col("id"), col("community"))).localCheckpoint()
    val ref2 = Louvain.refine(e2, "i", "j",
      Louvain.cluster(e2, "i", "j", "w", LeidenRounds))
    Tables(s, dir)("nation")
      .join(ref1.select(col("id").as("__i1"), col("community").as("__c1")),
        col("n_nationkey") === col("__i1"))
      .join(ref2.select(col("id").as("__c1x"), col("community").as("__c2")),
        col("__c1") === col("__c1x"))
      .select(col("n_nationkey"), col("n_name"),
        col("__c1").cast("long").as("comm_l1"),
        col("__c2").cast("long").as("community"))
      .orderBy("n_nationkey")
  }

  private val LeidenRounds = 6

  private def refineSql(p: String, edgeRel: String, commRel: String,
                        nodeRel: String): String =
    s"""within$p AS MATERIALIZED (
         SELECT $edgeRel.i AS x, $edgeRel.j AS y
         FROM $edgeRel JOIN $commRel ci ON ci.i = $edgeRel.i
                       JOIN $commRel cj ON cj.i = $edgeRel.j
         WHERE ci.c = cj.c AND $edgeRel.i <> $edgeRel.j),
       reach$p AS (
         SELECT x AS aa, y AS bb FROM within$p
         UNION
         SELECT reach$p.aa, w2.y
         FROM reach$p JOIN within$p w2 ON reach$p.bb = w2.x),
       comp$p AS MATERIALIZED (
         SELECT aa AS i, least(aa, min(bb)) AS component
         FROM reach$p GROUP BY aa),
       ref$p AS MATERIALIZED (
         SELECT d.i, coalesce(comp$p.component, d.i) AS c
         FROM $nodeRel d LEFT JOIN comp$p ON comp$p.i = d.i)"""

  private val q451Sql: String =
    s"""WITH RECURSIVE ${OracleLouvain.tradeGraphPrefix},
       ${OracleLouvain.chainSql("la", LeidenRounds, "a", "deg", "selfw0")},
       ${refineSql("1", "a", s"commla$LeidenRounds", "deg")},
       e2 AS MATERIALIZED (
         SELECT ci.c AS i, cj.c AS j, sum(a.w) AS w
         FROM a JOIN ref1 ci ON ci.i = a.i
                JOIN ref1 cj ON cj.i = a.j
         GROUP BY 1, 2),
       deg2 AS MATERIALIZED (SELECT i, sum(w) AS k FROM e2 GROUP BY i),
       self2 AS MATERIALIZED (SELECT i, w AS wself FROM e2 WHERE i = j),
       ${OracleLouvain.chainSql("lb", LeidenRounds, "e2", "deg2", "self2")},
       ${refineSql("2", "e2", s"commlb$LeidenRounds", "deg2")}
       SELECT n_nationkey, n_name,
              CAST(r1.c AS BIGINT) AS comm_l1,
              CAST(r2.c AS BIGINT) AS community
       FROM nation
       JOIN ref1 r1 ON r1.i = n_nationkey
       JOIN ref2 r2 ON r2.i = r1.c
       ORDER BY n_nationkey"""

  // --------------------------------------------------------------- q452
  /** MIXED-LANGUAGE SEGMENTATION ([[graft.operators.LangId.spans]]) —
    * the mC4 page-level-vs-span-level langid question: documents cut
    * into 32-token chunks (Chunker, overlap 0), every chunk classified
    * by the trigram model, consecutive same-language chunks run-length
    * merged into spans. Monolingual documents come back as one span;
    * a planted bilingual page yields one span per language block
    * (LangIdSpec pins the plant). All scores are Long-exact and the
    * chunk boundaries are integer arithmetic, so the whole operator —
    * chunking, per-chunk argmax, run-length merge — replays
    * bit-for-bit in DuckDB. */
  private def q452(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.LangId
    LangId.spans(Tables(s, dir)("documents"), "doc_id", "text",
        chunkTokens = 32)
      .orderBy("doc_id", "span_idx")
  }

  private val q452Sql: String = {
    import graft.operators.LangId
    val langs = LangId.defaultModel.map(_._1)
    s"""WITH base AS (
         SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
         FROM documents),
       ch AS MATERIALIZED (
         SELECT doc_id, u.st // 32 AS chunk_idx, u.st AS start_tok,
           len(toks[u.st + 1 : u.st + 32]) AS n_tokens,
           array_to_string(toks[u.st + 1 : u.st + 32], ' ') AS chunk_text
         FROM base,
           unnest(generate_series(0, greatest(len(toks) - 1, 0), 32))
             AS u(st)),
       cc AS MATERIALIZED (
         SELECT doc_id, chunk_idx, start_tok, n_tokens,
           ${OracleLangId.predCaseSql(langs)} AS pred_lang
         FROM (SELECT doc_id, chunk_idx, start_tok, n_tokens,
                 ${OracleLangId.scoreListSql()}
               FROM (SELECT *, ${OracleLangId.surfaceSql("chunk_text")} AS s
                     FROM ch))),
       rl AS (
         SELECT *, CASE WHEN lag(pred_lang) OVER w IS NULL
                          OR lag(pred_lang) OVER w <> pred_lang
                        THEN 1 ELSE 0 END AS nw
         FROM cc WINDOW w AS (PARTITION BY doc_id ORDER BY chunk_idx)),
       sp AS (
         SELECT *, sum(nw) OVER (PARTITION BY doc_id ORDER BY chunk_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS span_idx
         FROM rl)
       SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx,
              min(pred_lang) AS span_lang,
              CAST(min(chunk_idx) AS BIGINT) AS start_chunk,
              CAST(min(start_tok) AS BIGINT) AS start_tok,
              CAST(count(*) AS BIGINT) AS n_chunks,
              CAST(sum(n_tokens) AS BIGINT) AS n_tokens
       FROM sp GROUP BY doc_id, span_idx
       ORDER BY doc_id, span_idx"""
  }

  // --------------------------------------------------------------- q453
  /** PER-LANGUAGE ADAPTIVE QUALITY GATE ([[graft.operators
    * .AdaptiveGate]]) — the mC4/CCNet per-language threshold shape: a
    * single global quality cutoff over-filters low-resource languages
    * whose whole distribution sits below the English-tuned constant,
    * so each predicted language drops its OWN bottom 10% by lexical
    * diversity (type-token ratio). Exact rank semantics — drop count
    * is the integer n·10/100, ranks order by (ttr, doc_id) — so the
    * survivor set reproduces bit-for-bit in DuckDB; the output stays
    * all-integer (counts + kept-id checksum), with the double TTR used
    * only as a ranking key both engines compute identically. */
  private def q453(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    import graft.operators.{AdaptiveGate, LangId}
    val toks = TextFunctions.tokens(col("text"))
    val scored = LangId.classify(Tables(s, dir)("documents"), "text")
      .select(col("doc_id"), col("pred_lang"),
        (size(array_distinct(toks)).cast("double") / size(toks)).as("ttr"))
      .localCheckpoint() // feeds the gate AND the per-language totals
    val kept = AdaptiveGate.dropBottom(scored, "pred_lang", "ttr",
      "doc_id", pct = 10)
    scored.groupBy("pred_lang").agg(count(lit(1)).as("n_docs"))
      .join(kept.groupBy("pred_lang")
          .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("id_checksum")),
        Seq("pred_lang"))
      .select(col("pred_lang"), col("n_docs"),
        (col("n_docs") - col("n_kept")).as("n_dropped"),
        col("n_kept"), col("id_checksum"))
      .orderBy("pred_lang")
  }

  private val q453Sql: String = {
    import graft.operators.LangId
    val langs = LangId.defaultModel.map(_._1)
    s"""WITH cls AS MATERIALIZED (
         SELECT doc_id,
           ${OracleLangId.predCaseSql(langs)} AS pred_lang,
           CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
         FROM (SELECT doc_id, toks,
                 ${OracleLangId.scoreListSql()}
               FROM (SELECT doc_id,
                       regexp_split_to_array(trim(text), '\\s+') AS toks,
                       ${OracleLangId.surfaceSql("text")} AS s
                     FROM documents))),
       rk AS MATERIALIZED (
         SELECT *, row_number() OVER (PARTITION BY pred_lang
                     ORDER BY ttr, doc_id) AS rk,
                count(*) OVER (PARTITION BY pred_lang) AS n
         FROM cls),
       kept AS (SELECT * FROM rk WHERE rk > n * 10 // 100)
       SELECT rk.pred_lang,
              CAST(max(rk.n) AS BIGINT) AS n_docs,
              CAST(max(rk.n) - count(kept.doc_id) AS BIGINT) AS n_dropped,
              CAST(count(kept.doc_id) AS BIGINT) AS n_kept,
              CAST(sum(kept.doc_id) AS BIGINT) AS id_checksum
       FROM rk LEFT JOIN kept ON kept.doc_id = rk.doc_id
       GROUP BY rk.pred_lang
       ORDER BY rk.pred_lang"""
  }

  // --------------------------------------------------------------- q454
  /** EPOCHED TEMPERATURE SAMPLE ([[graft.operators.TemperatureMix
    * .sampleWithEpochs]]) — the full mT5 mechanism q450's scaladoc
    * called a training-loader concern, made an operator: at α=0
    * (uniform) with budget 2N, every language's quota (2N/L) exceeds
    * its size, so small languages REPEAT — each doc emits
    * floor(alloc/n) full epochs plus an md5-rank partial epoch, and
    * per-language output counts equal the allocation exactly in all
    * cases (Σ = budget, no silent under-fill). Output: one row per
    * (language, epoch) with row count and id checksum — the epoch
    * schedule a data card publishes. */
  private def q454(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{LangId, TemperatureMix}
    val cls = LangId.classify(Tables(s, dir)("documents"), "text")
      .select(col("doc_id"), col("pred_lang"))
      .localCheckpoint() // feeds the budget count and the draw
    val budget = cls.count() * 2
    TemperatureMix.sampleWithEpochs(cls, "pred_lang", "doc_id", budget, 0)
      .groupBy("pred_lang", "epoch")
      .agg(count(lit(1)).as("n_rows"), sum("doc_id").as("id_checksum"))
      .orderBy("pred_lang", "epoch")
  }

  private val q454Sql: String = {
    import graft.operators.LangId
    val langs = LangId.defaultModel.map(_._1)
    s"""WITH cls AS MATERIALIZED (
         SELECT doc_id,
           ${OracleLangId.predCaseSql(langs)} AS pred_lang
         FROM (SELECT doc_id,
                 ${OracleLangId.scoreListSql()}
               FROM (SELECT doc_id,
                       ${OracleLangId.surfaceSql("text")} AS s
                     FROM documents))),
       bdg AS (SELECT count(*) * 2 AS b FROM cls),
       cnt AS MATERIALIZED (
         SELECT pred_lang, count(*) AS n FROM cls GROUP BY 1),
       tw AS (
         SELECT list_sum(list_transform(
           list({'k': pred_lang, 'w': 1.0} ORDER BY pred_lang),
           e -> e.w)) AS tw
         FROM cnt),
       q0 AS (
         SELECT pred_lang, n,
           CAST(floor(CAST(b AS DOUBLE) * (1.0) / tw) AS BIGINT) AS fq,
           CAST(b AS DOUBLE) * (1.0) / tw
             - floor(CAST(b AS DOUBLE) * (1.0) / tw) AS rem,
           b
         FROM cnt CROSS JOIN tw CROSS JOIN bdg),
       al AS MATERIALIZED (
         SELECT pred_lang, n,
           fq + CASE WHEN row_number() OVER (ORDER BY rem DESC, pred_lang)
                       <= b - sum(fq) OVER () THEN 1 ELSE 0 END AS alloc
         FROM q0),
       rk AS MATERIALIZED (
         SELECT doc_id, pred_lang,
           row_number() OVER (PARTITION BY pred_lang
             ORDER BY md5('tmx:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
         FROM cls),
       drawn AS (
         SELECT r.pred_lang, r.doc_id, u.e AS epoch
         FROM rk r JOIN al ON al.pred_lang = r.pred_lang,
           unnest(generate_series(0, al.alloc // al.n)) AS u(e)
         WHERE u.e < al.alloc // al.n
            OR (u.e = al.alloc // al.n AND r.rk <= al.alloc % al.n))
       SELECT pred_lang, CAST(epoch AS BIGINT) AS epoch,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(doc_id) AS BIGINT) AS id_checksum
       FROM drawn GROUP BY 1, 2
       ORDER BY pred_lang, epoch"""
  }

  // --------------------------------------------------------------- q455
  /** TRAINING-SHARD SHUFFLE MANIFEST — the step every pretraining data
    * pipeline ends with: a deterministic global shuffle (md5 hash
    * order destroys source/time locality, so every shard is an
    * unbiased sample of the corpus) followed by fixed-size shard
    * assignment and a per-shard manifest (doc count, id checksum,
    * token mass, key range) that the training loader validates against
    * at read time. The global index comes from
    * [[graft.operators.RowIndexer.stableIndex]] — range shuffle +
    * local sort + zipWithIndex, NOT a single-partition row_number
    * window, so the total order scales; shard = idx DIV 64 is
    * map-side after that. The oracle replays the same total order
    * relationally (rank over (key, id) is the semantic contract the
    * distributed index implements). */
  private def q455(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    import graft.operators.RowIndexer
    val keyed = Tables(s, dir)("documents")
      .select(col("doc_id"),
        md5(concat(lit("shd:"), col("doc_id").cast("string"))).as("skey"),
        TextFunctions.tokenCount(col("text")).as("tok"))
    RowIndexer.stableIndex(keyed, Seq(col("skey"), col("doc_id")))
      .withColumn("shard", expr("idx DIV 64"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("id_checksum"),
        sum(col("tok").cast("long")).as("shard_tokens"),
        min(col("skey")).as("first_key"),
        max(col("skey")).as("last_key"))
      .orderBy("shard")
  }

  private val q455Sql: String =
    s"""WITH keyed AS (
         SELECT doc_id, md5('shd:' || CAST(doc_id AS VARCHAR)) AS skey,
           len(regexp_split_to_array(trim(text), '\\s+')) AS tok
         FROM documents),
       idx AS MATERIALIZED (
         SELECT *, row_number() OVER (ORDER BY skey, doc_id) - 1 AS idx
         FROM keyed)
       SELECT CAST(idx // 64 AS BIGINT) AS shard,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(doc_id) AS BIGINT) AS id_checksum,
              CAST(sum(tok) AS BIGINT) AS shard_tokens,
              min(skey) AS first_key, max(skey) AS last_key
       FROM idx GROUP BY 1 ORDER BY 1"""

  override def queries: Map[String, QueryFn] = Map(
    "q449_funnel_lang_slices" -> q449 _,
    "q450_temperature_sample" -> q450 _,
    "q451_leiden_levels" -> q451 _,
    "q452_lang_spans" -> q452 _,
    "q453_adaptive_quality" -> q453 _,
    "q454_epoch_sample" -> q454 _,
    "q455_shard_shuffle" -> q455 _)

  override def oracles: Map[String, String] = Map(
    "q449_funnel_lang_slices" -> q449Sql,
    "q450_temperature_sample" -> q450Sql,
    "q451_leiden_levels" -> q451Sql,
    "q452_lang_spans" -> q452Sql,
    "q453_adaptive_quality" -> q453Sql,
    "q454_epoch_sample" -> q454Sql,
    "q455_shard_shuffle" -> q455Sql)
}
