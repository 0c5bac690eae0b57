package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Document deduplication operators for training-data pipelines:
  * exact (hash-groupBy), MinHash+LSH, and SimHash near-dup detection.
  *
  * Scale design (the point of these over a naive pairwise O(n²) compare):
  *   - exact dedup is one hash-aggregate shuffle on the fingerprint;
  *   - MinHash+LSH shuffles each doc k·(1/r) band keys, and only
  *     within-bucket candidates are ever paired — the all-pairs join
  *     never materializes;
  *   - SimHash reduces each doc to 64 bits, candidates via band-chunk
  *     equality, verified by popcount(xor).
  * All hashing derives from xxhash64 (Spark built-in, deterministic
  * across runs/partitionings), so results are stable for golden tests.
  */
object Dedup {

  /** Exact dedup via content fingerprint: survivor = min(id) per
    * normalized-text hash (deterministic, unlike dropDuplicates —
    * reference quirk B1/F2, SURVEY.md §2.10). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), TextFunctions.fingerprint(col(textCol)).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("n_copies"))

  // ------------------------------------------------------------ MinHash

  /** 2^31-1: Mersenne prime. (a·x+b) mod P stays in a long when
    * a, b, x < P (product < 2^62) — no mulmod BigInt needed. */
  private val P = graft.functions.expressions.MinHashSignature.P

  /** Deterministic per-permutation coefficients (Knuth multiplicative
    * constants; no runtime randomness so signatures are reproducible).
    * Shared with the native MinHashSignature expression. */
  private def coef(i: Int): (Long, Long) =
    graft.functions.expressions.MinHashSignature.coef(i)

  /** k min-hash values over a doc's shingle set.
    * Input: (id, shingle) exploded rows. Output: (id, sig: array<long>).
    * (Shuffles the exploded rows — prefer [[minhashSignaturesLocal]]
    * when shingles are derivable per row.) */
  def minhashSignatures(shingled: DataFrame, idCol: String,
                        shingleCol: String, k: Int): DataFrame = {
    val x = pmod(xxhash64(col(shingleCol)), lit(P))
    val hashes = (0 until k).map { i =>
      val (a, b) = coef(i)
      min(pmod(lit(a) * x + lit(b), lit(P))).as(s"h$i")
    }
    shingled
      .groupBy(col(idCol))
      .agg(hashes.head, hashes.tail: _*)
      .select(col(idCol), array((0 until k).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** md5-derived base hash: int64 of the first 8 md5 hex chars. The
    * oracle-checkable twin of xxhash64 — md5 is identical in DuckDB
    * (`('0x' || substr(md5(s), 1, 8))::BIGINT`), so pipelines built on
    * this family hash-match a SQL oracle end-to-end. Slower than
    * xxhash64 (full 128-bit digest per value); the scale default stays
    * xxhash64, whose math these twins verify. */
  def mdBaseHash(c: Column): Column =
    conv(substring(md5(encode(c, "UTF-8")), 1, 8), 16, 10).cast("long")

  /** Same signatures with ZERO shuffle: the native MinHashSignature
    * expression folds all k minima in one fused pass over each doc's
    * shingle ARRAY. The exploded+groupBy form moves |shingles| rows
    * through an exchange; a composed array_min∘transform form avoids
    * the shuffle but allocates k intermediate arrays per row (measured
    * slower). This one moves nothing and allocates nothing per shingle —
    * per-doc work, embarrassingly parallel, the 100 TB shape. Identical
    * output (same hash family), pinned by DedupSpec. */
  def minhashSignaturesLocal(docs: DataFrame, idCol: String,
                             shinglesCol: String, k: Int): DataFrame =
    docs.select(col(idCol),
      graft.functions.expressions.MinHashSignature
        .minhashSignature(col(shinglesCol), k).as("sig"))

  /** Signatures from an arbitrary base-hash family: one transform() to
    * evaluate the base hash per shingle, then the fused MinHashFromHashes
    * expression folds all k affine-permutation minima in a single pass —
    * same narrow per-row shape as the xxhash64 scale path, so the md5
    * oracle twin no longer pays k intermediate arrays per row (the old
    * array_min∘transform×k composition benched ~6× slower at sf0.1).
    * Output is bit-identical to that composition (pinned by DedupSpec). */
  def minhashSignaturesComposed(docs: DataFrame, idCol: String,
                                shinglesCol: String, k: Int,
                                baseHash: Column => Column): DataFrame = {
    val hx = transform(col(shinglesCol), sh => baseHash(sh))
    docs.select(col(idCol),
      graft.functions.expressions.MinHashSignature
        .minhashFromHashes(hx, k).as("sig"))
  }

  /** Per-doc shingle base-hash ARRAYS: (id, hx array<long>) — the
    * shared upstream of BOTH the signature fold
    * ([[minhashSignaturesFromHashes]]) and the exploded (id, h) set
    * relation ([[shingleHashes]] ≡ explode + distinct of this), so a
    * query that needs both (q447: resemblance edges + containment
    * gate) pays the text scan and the base hash ONCE instead of once
    * per leg — at corpus scale the base hash over every shingle is
    * the dominant compute of the whole sketch family. Input is
    * [[Spread]]-guarded: this is exactly the expensive fused
    * projection that serializes on an under-split scan. */
  def shingleHashArrays(docs: DataFrame, idCol: String, textCol: String,
                        shingleLen: Int,
                        baseHash: Column => Column): DataFrame =
    Spread.byKey(docs, col(idCol))
      .filter(length(col(textCol)) >= shingleLen)
      .select(col(idCol),
        transform(TextFunctions.charShingles(col(textCol), shingleLen),
          sh => baseHash(sh)).as("hx"))

  /** Signatures from a pre-computed hash-array frame (the
    * [[shingleHashArrays]] output): just the fused k-minima fold, no
    * text scan, no hashing — bit-identical to
    * [[minhashSignaturesComposed]] on the same base hash because the
    * affine-permutation minima depend only on the hash multiset. */
  def minhashSignaturesFromHashes(hashed: DataFrame, idCol: String,
                                  hxCol: String, k: Int): DataFrame =
    hashed.select(col(idCol),
      graft.functions.expressions.MinHashSignature
        .minhashFromHashes(col(hxCol), k).as("sig"))

  /** LSH candidate pairs: docs sharing any band (r consecutive signature
    * slots) are candidates; est_jaccard = fraction of agreeing slots.
    * Only `threshold`-passing pairs survive.
    *
    * Shuffle shape: band rows carry ONLY (id, band_idx, band_key) — the
    * k-slot signature would multiply the exchange by k·8 bytes per band
    * row (the dominant shuffle at corpus scale) just to be re-read once
    * per surviving pair. Instead candidates are deduped to (id_a, id_b)
    * first, then the narrow sigs frame joins back twice to score
    * est_jaccard — two small hash joins on id against the per-doc
    * signatures instead of a k×-heavier band exchange. Same result set,
    * orders of magnitude less shuffle at 100 TB. */
  /** Per-doc LSH band rows (id, band_idx, band_key[, sig]) from a
    * signature frame — the narrow relation every banded-LSH consumer
    * joins on. `carrySig` keeps the k-slot signature in the row for
    * consumers that cannot re-join against their own side (a streaming
    * source is not joinable with itself); batch paths leave it off so
    * the exchange stays (id, band_idx, band_key)-narrow. */
  def bandRows(sigs: DataFrame, idCol: String, k: Int, bands: Int,
               hashBandKeys: Boolean = true,
               carrySig: Boolean = false): DataFrame = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    val r = k / bands
    // band key: xxhash64 of the slice (narrow fixed-width shuffle key —
    // the scale default) or the raw slice string (collision-free, so an
    // SQL oracle reproduces the exact candidate set)
    def key(bnd: Column): Column = {
      val s = concat_ws(",",
        slice(col("sig"), bnd * lit(r) + lit(1), lit(r)).cast("array<string>"))
      if (hashBandKeys) xxhash64(s, bnd) else s
    }
    val base = if (carrySig) Seq(col(idCol), col("sig")) else Seq(col(idCol))
    sigs.select(base :+
      posexplode(transform(sequence(lit(0), lit(bands - 1)), key(_))): _*)
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_key")
  }

  // ------------------------------------------------- hot-bucket cap

  /** Per-band-bucket size cap for every banded-LSH candidate stage.
    *
    * THE one data-dependent quadratic in the sketch family: a bucket
    * holding B rows emits B·(B−1)/2 candidate pairs, and a
    * boilerplate-heavy corpus (license headers, templated pages) can
    * put millions of docs in ONE band bucket — 10⁶ docs → 5·10¹¹
    * pairs from a single key. AQE skew-split cannot help: it splits
    * partitions, not the pair count. The guard is semantic, not
    * physical: buckets over `maxBucket` are SKIPPED ENTIRELY (their
    * rows leave the candidate stage), which is the standard
    * production trade — a bucket that hot is boilerplate by
    * definition, and its members are still caught by their OTHER
    * bands (bands−1 more chances) or by exact dedup upstream.
    * Skipping (vs sub-sampling) keeps the result a pure function of
    * the corpus — no sampling-order dependence, so oracles and
    * goldens stay exact. [[bandCapReport]] accounts the skipped mass
    * so a pipeline can alert instead of silently degrading. */
  val DefaultMaxBucket: Int = 2000

  /** Buckets (grouped by `keyCols`) holding more than `maxBucket`
    * rows, with their sizes. Output: keyCols :+ bucket_n. */
  def hotBuckets(rows: DataFrame, keyCols: Seq[String],
                 maxBucket: Int): DataFrame =
    rows.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucket)

  /** Drop all rows of over-cap buckets. The hot-bucket relation is at
    * most |rows|/maxBucket keys (each holds > maxBucket rows), so the
    * anti-join's build side is tiny by construction — AQE broadcasts
    * it; the bucket count aggregate shares the candidate join's
    * shuffle keys. No-op (and no extra stages) at Int.MaxValue. */
  def dropHotBuckets(rows: DataFrame, keyCols: Seq[String],
                     maxBucket: Int): DataFrame =
    if (maxBucket == Int.MaxValue) rows
    else rows.join(
      hotBuckets(rows, keyCols, maxBucket).select(keyCols.map(col): _*),
      keyCols, "left_anti")

  /** Skipped-mass accounting for a banded relation (the report a
    * curation funnel emits next to its candidate counts): per
    * band_idx, how many buckets exist, how many are over the cap, how
    * many rows those hold, and the pair count the cap avoided
    * (Σ B·(B−1)/2 over hot buckets). One aggregate over the band
    * rows — same shuffle keys as the candidate join. */
  def bandCapReport(bandRowsDf: DataFrame, maxBucket: Int): DataFrame =
    bandRowsDf.groupBy("band_idx", "band_key")
      .agg(count(lit(1)).as("c"))
      .groupBy("band_idx")
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(col("c") > maxBucket, 1L).otherwise(0L)).as("n_hot_buckets"),
        sum(when(col("c") > maxBucket, col("c")).otherwise(0L))
          .as("rows_skipped"),
        // B·(B−1) is even, so >>1 is the exact pair count in pure
        // Long math (Spark's `/` would detour through double and lose
        // exactness past 2^53)
        sum(when(col("c") > maxBucket,
          shiftright(col("c") * (col("c") - 1), 1)).otherwise(0L))
          .as("pairs_avoided"))

  def minhashCandidates(sigs: DataFrame, idCol: String, k: Int, bands: Int,
                        threshold: Double,
                        hashBandKeys: Boolean = true,
                        maxBucket: Int = Int.MaxValue): DataFrame = {
    val bandRowsDf = dropHotBuckets(
      bandRows(sigs, idCol, k, bands, hashBandKeys),
      Seq("band_idx", "band_key"), maxBucket)
    val candidates = bandRowsDf.select(col(idCol).as("id_a"),
                                       col("band_idx"), col("band_key"))
      .join(bandRowsDf.select(col(idCol).as("id_b"),
                              col("band_idx"), col("band_key")),
            Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val est = size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
                          bool => bool)).cast("double") / lit(k.toDouble)
    candidates
      .join(sigs.select(col(idCol).as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col(idCol).as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"), est.as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** Full MinHash+LSH near-dup pipeline over raw documents using char
    * n-gram shingles. Signatures come from the fused
    * [[graft.functions.expressions.ShingleMinHash]] expression — the
    * shingle array is never materialized (no substring copies, no
    * array_distinct; duplicates can't change a minimum), bit-identical
    * to the charShingles→MinHashSignature composition (DedupSpec). */
  def minhashDedup(docs: DataFrame, idCol: String, textCol: String,
                   shingleLen: Int = 5, k: Int = 64, bands: Int = 16,
                   threshold: Double = 0.2,
                   maxBucket: Int = DefaultMaxBucket): DataFrame = {
    import graft.functions.expressions.ShingleMinHash.shingleMinhash
    // materialize signatures ONCE: minhashCandidates reads them three
    // times (band rows + two scoring re-joins) — without this the text
    // scan and signature fold would run three times. NOT Spread-guarded:
    // the fused xxhash64 fold is an order of magnitude cheaper than the
    // md5 family, and the guard's exchange measured as a net loss here
    // (q343 bench) where it was a 2-4× win on the md5 paths.
    val sigs = docs
      .filter(length(col(textCol)) >= shingleLen)
      .select(col(idCol), shingleMinhash(col(textCol), shingleLen, k).as("sig"))
      .localCheckpoint()
    minhashCandidates(sigs, idCol, k, bands, threshold, maxBucket = maxBucket)
  }

  /** Oracle-checkable MinHash+LSH pipeline: same shape as
    * [[minhashDedup]] — shingle → signature → banded candidates →
    * est-Jaccard filter — but the base hash is the md5 family and band
    * keys are raw slice strings, so a DuckDB oracle reproduces the
    * candidate set exactly. k=16 keeps the generated oracle SQL sane. */
  def minhashDedupMd5(docs: DataFrame, idCol: String, textCol: String,
                      shingleLen: Int = 5, k: Int = 16, bands: Int = 4,
                      threshold: Double = 0.2,
                      maxBucket: Int = Int.MaxValue): DataFrame = {
    // materialized once for the same three-reads reason as minhashDedup;
    // the shingle+md5 projection rides the shared Spread-guarded pass
    val sigs = minhashSignaturesFromHashes(
        shingleHashArrays(docs, idCol, textCol, shingleLen, mdBaseHash),
        idCol, "hx", k)
      .localCheckpoint()
    minhashCandidates(sigs, idCol, k, bands, threshold, hashBandKeys = false,
                      maxBucket = maxBucket)
  }

  /** The raw md5-family band-row relation the cap-accounting queries
    * aggregate over (q379 report, q389 sweep): shingle → composed md5
    * signature → raw-string band keys. */
  def minhashBandRowsMd5(docs: DataFrame, idCol: String, textCol: String,
                         shingleLen: Int = 5, k: Int = 16,
                         bands: Int = 4): DataFrame = {
    val sigs = minhashSignaturesFromHashes(
      shingleHashArrays(docs, idCol, textCol, shingleLen, mdBaseHash),
      idCol, "hx", k)
    bandRows(sigs, idCol, k, bands, hashBandKeys = false)
  }

  /** Oracle twin of the md5 pipeline's [[bandCapReport]]: signature →
    * raw-string band keys → per-band bucket-size rollup. The
    * accounting a DuckDB oracle can reproduce exactly (q379). */
  def minhashCapReportMd5(docs: DataFrame, idCol: String, textCol: String,
                          shingleLen: Int = 5, k: Int = 16, bands: Int = 4,
                          maxBucket: Int = Int.MaxValue): DataFrame =
    bandCapReport(minhashBandRowsMd5(docs, idCol, textCol, shingleLen, k, bands),
                  maxBucket)

  /** CROSS-corpus LSH gate: candidate pairs between an INCOMING and an
    * INDEXED signature set — the incremental-snapshot dedup shape. A
    * recurring crawl dedups each new snapshot against the accumulated
    * corpus WITHOUT re-pairing the old corpus with itself: the old
    * side's band index is built once (and at 100 TB written
    * partitioned by band key), the new side explodes its own bands and
    * equi-joins — new×old candidates only, never old×old, never
    * all-pairs. Same banding, scoring, and hot-bucket cap as
    * [[minhashCandidates]]; the batch twin of the streaming gate
    * ([[graft.streaming.StreamNearDup]]).
    * Output: (in_id, idx_id, est_jaccard) with est ≥ threshold. */
  def minhashGate(inSigs: DataFrame, idxSigs: DataFrame, idCol: String,
                  k: Int, bands: Int, threshold: Double,
                  hashBandKeys: Boolean = true,
                  maxBucket: Int = Int.MaxValue): DataFrame = {
    def side(sigs: DataFrame, outId: String): DataFrame =
      dropHotBuckets(bandRows(sigs, idCol, k, bands, hashBandKeys),
          Seq("band_idx", "band_key"), maxBucket)
        .select(col(idCol).as(outId), col("band_idx"), col("band_key"))
    val cand = side(inSigs, "in_id")
      .join(side(idxSigs, "idx_id"), Seq("band_idx", "band_key"))
      .select(col("in_id"), col("idx_id"))
      .distinct()
    val est = size(filter(zip_with(col("sig_in"), col("sig_idx"),
        (x, y) => x === y), b => b)).cast("double") / lit(k.toDouble)
    cand
      .join(inSigs.select(col(idCol).as("in_id"), col("sig").as("sig_in")),
        "in_id")
      .join(idxSigs.select(col(idCol).as("idx_id"), col("sig").as("sig_idx")),
        "idx_id")
      .select(col("in_id"), col("idx_id"), est.as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  // -------------------------------------------- bottom-k containment

  /** Distinct (id, h) char-shingle hash relation — the set
    * representation the containment estimator samples from and
    * verifies against. One narrow explode + distinct; the text never
    * rides past the projection. */
  def shingleHashes(docs: DataFrame, idCol: String, textCol: String,
                    shingleLen: Int,
                    baseHash: Column => Column): DataFrame =
    hashesFromArrays(
      shingleHashArrays(docs, idCol, textCol, shingleLen, baseHash), idCol)

  /** The exploded DISTINCT (id, h) relation from a
    * [[shingleHashArrays]] frame — hash-then-explode ≡ the original
    * explode-then-hash (the base hash is per-element), so callers that
    * already hold the array pass (q447) derive this without touching
    * the text again. */
  def hashesFromArrays(hashed: DataFrame, idCol: String): DataFrame =
    hashed.select(col(idCol), explode(col("hx")).as("h")).distinct()

  /** Bottom-k CONTAINMENT scores — the asymmetric companion to
    * [[minhashCandidates]]'s symmetric resemblance banding, which
    * structurally misses near-SUBSET pairs (a quote contained in a
    * long document collides in a band with probability jaccard^bands,
    * and subset pairs have LOW jaccard by construction — Broder 1997's
    * containment-vs-resemblance distinction).
    *
    * Estimator: each document's k smallest shingle hashes over the
    * hot-capped universe are a uniform sample of its shingle set, so
    * the count m of those sampled hashes present in another document
    * estimates containment |Q∩D|/|Q| as m/k — independent of jaccard,
    * which is exactly what a symmetric sketch cannot give.
    *
    * Scale shape (each stage bounded, never all-pairs):
    *   1. hot shingles (in > hotCap docs) are capped out first — the
    *      boilerplate guard; the estimate is then containment w.r.t.
    *      the capped universe, and the EXACT verify restores the
    *      uncapped truth for survivors;
    *   2. per-doc bottom-k via one partitioned window (k rows per doc
    *      ride forward — a fixed-size sample, not the shingle set);
    *   3. the probe equi-joins the capped relation on the hash, so
    *      fan-out per sampled hash is ≤ hotCap — candidate rows per
    *      query doc are ≤ k·hotCap by construction;
    *   4. only pairs with m ≥ k/2 (est containment ≥ 0.5) reach the
    *      exact (doc, shingle) equi-join verify on the UNCAPPED sets.
    *
    * Output (one row per surviving ORDERED pair — every doc is a
    * query, so q⊂d and d⊂q appear separately): (qid, did, m,
    * est_containment, shared, n_q, n_d, containment, jaccard), where
    * containment = shared/n_q is the fraction of the QUERY doc's
    * shingles inside the other doc. Ratios are unrounded doubles of
    * exact integer counts; q410's oracle rounds them.
    *
    * Reference scope: the reference has whole-row dedup only (Capstone
    * notebook cell 17); this is extension surface next to
    * MinHash/SimHash. */
  def containmentScores(docs: DataFrame, idCol: String, textCol: String,
                        shingleLen: Int = 5, k: Int = 16,
                        hotCap: Int = 200,
                        baseHash: Column => Column = xxhash64(_))
      : DataFrame = {
    // materialized once: the (doc, hash) relation feeds the cold
    // filter, the exact-count side, and both exact-verify joins
    val g = shingleHashes(docs, idCol, textCol, shingleLen, baseHash)
      .localCheckpoint()
    containmentScoresFromHashes(g, idCol, k, hotCap)
  }

  /** [[containmentScores]] from a pre-materialized DISTINCT (idCol, h)
    * relation — the entry point for queries that already paid the
    * shingle-hash pass for another leg (q447 shares ONE base-hash pass
    * between the resemblance and containment edges). `g` must be
    * materialized by the caller (localCheckpoint): it is read by the
    * cold filter, the exact-count side, and both exact-verify joins. */
  def containmentScoresFromHashes(g: DataFrame, idCol: String,
                                  k: Int = 16, hotCap: Int = 200)
      : DataFrame = {
    val gCold = dropHotBuckets(g, Seq("h"), hotCap).localCheckpoint()
    val w = Window.partitionBy(idCol).orderBy("h")
    val bottoms = gCold.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol).as("qid"), col("h"))
    val m = bottoms
      .join(gCold.select(col(idCol).as("did"), col("h")), Seq("h"))
      .filter(col("did") =!= col("qid"))
      .groupBy("qid", "did").agg(count(lit(1)).as("m"))
      .filter(col("m") >= k / 2)
    val cnt = g.groupBy(idCol).agg(count(lit(1)).as("n"))
    val ix = m
      .join(g.select(col(idCol).as("qid"), col("h")), Seq("qid"))
      .join(g.select(col(idCol).as("did"), col("h")), Seq("did", "h"))
      .groupBy("qid", "did").agg(count(lit(1)).as("shared"))
    m.join(ix, Seq("qid", "did"))
      .join(cnt.select(col(idCol).as("qid"), col("n").as("n_q")), Seq("qid"))
      .join(cnt.select(col(idCol).as("did"), col("n").as("n_d")), Seq("did"))
      .select(col("qid"), col("did"),
        col("m").cast("long").as("m"),
        (col("m").cast("double") / k).as("est_containment"),
        col("shared").cast("long").as("shared"),
        col("n_q").cast("long").as("n_q"), col("n_d").cast("long").as("n_d"),
        (col("shared").cast("double") / col("n_q")).as("containment"),
        (col("shared").cast("double") /
          (col("n_q") + col("n_d") - col("shared"))).as("jaccard"))
  }

  /** CROSS-CORPUS containment scores: INCOMING documents scored
    * against an INDEXED shingle-hash relation (idx_id, h) — the
    * incremental/ingestion twin of [[containmentScores]], the same
    * new-vs-index shape as [[minhashGate]]. The hot-shingle cap is
    * defined by the INDEX side (the corpus decides what boilerplate
    * is); incoming docs' hashes are computed content-side, so a
    * NEVER-SEEN document is priced too. On a replay of the index
    * corpus through itself this reproduces [[containmentScores]]'
    * qid-side rows exactly (same capped universe, same bottom-k
    * sample, same m >= k/2 gate, same uncapped exact verify) — the
    * property the streaming funnel-equality spec leans on. Within-
    * batch new×new pairs are NOT scored (same contract as the
    * near-dup gate: new×index only). Output shape = containmentScores
    * minus est: (qid, did, m, shared, n_q, n_d, containment,
    * jaccard). */
  def containmentScoresAgainst(inDocs: DataFrame, idCol: String,
                               textCol: String, idxHashes: DataFrame,
                               shingleLen: Int = 5, k: Int = 16,
                               hotCap: Int = 200,
                               baseHash: Column => Column = xxhash64(_))
      : DataFrame = {
    val hot = idxHashes.groupBy("h").agg(count(lit(1)).as("c"))
      .filter(col("c") > hotCap).select("h")
    val gIn = shingleHashes(inDocs, idCol, textCol, shingleLen, baseHash)
      .localCheckpoint() // feeds the cold probe AND the exact verify
    val gInCold = gIn.join(hot, Seq("h"), "left_anti")
    val idxCold = idxHashes.join(hot, Seq("h"), "left_anti")
    val w = Window.partitionBy(idCol).orderBy("h")
    val bottoms = gInCold.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol).as("qid"), col("h"))
    val m = bottoms
      .join(idxCold.select(col("idx_id").as("did"), col("h")), Seq("h"))
      .filter(col("did") =!= col("qid"))
      .groupBy("qid", "did").agg(count(lit(1)).as("m"))
      .filter(col("m") >= k / 2)
    val nQ = gIn.groupBy(idCol).agg(count(lit(1)).as("n_q"))
    val nD = idxHashes.groupBy("idx_id").agg(count(lit(1)).as("n_d"))
    val ix = m
      .join(gIn.select(col(idCol).as("qid"), col("h")), Seq("qid"))
      .join(idxHashes.select(col("idx_id").as("did"), col("h")),
        Seq("did", "h"))
      .groupBy("qid", "did").agg(count(lit(1)).as("shared"))
    m.join(ix, Seq("qid", "did"))
      .join(nQ.select(col(idCol).as("qid"), col("n_q")), Seq("qid"))
      .join(nD.select(col("idx_id").as("did"), col("n_d")), Seq("did"))
      .select(col("qid"), col("did"),
        col("m").cast("long").as("m"),
        col("shared").cast("long").as("shared"),
        col("n_q").cast("long").as("n_q"), col("n_d").cast("long").as("n_d"),
        (col("shared").cast("double") / col("n_q")).as("containment"),
        (col("shared").cast("double") /
          (col("n_q") + col("n_d") - col("shared"))).as("jaccard"))
  }

  /** The GATE over [[containmentScores]]: near-subset pairs — the
    * query doc's shingles are ≥ minContainment inside the other doc
    * while resemblance stays < maxJaccard (pairs above maxJaccard are
    * the symmetric near-dups the MinHash stage already owns). A
    * curation funnel drops `contained_id` (the doc that is mostly a
    * quote of `container_id`); syndication/patchwork corpora pass
    * resemblance dedup without this stage. */
  def containmentGate(docs: DataFrame, idCol: String, textCol: String,
                      shingleLen: Int = 5, k: Int = 16, hotCap: Int = 200,
                      minContainment: Double = 0.8,
                      maxJaccard: Double = 0.5,
                      baseHash: Column => Column = xxhash64(_))
      : DataFrame =
    containmentScores(docs, idCol, textCol, shingleLen, k, hotCap, baseHash)
      .filter(col("containment") >= minContainment &&
        col("jaccard") < maxJaccard)
      .select(col("qid").as("contained_id"), col("did").as("container_id"),
        col("containment"), col("jaccard"))

  // ------------------------------------------------------------ SimHash

  /** 64-bit SimHash per doc from whitespace tokens: bit b is the sign of
    * Σ±1 over token-hash bit b. The signature is row-local, so it's ONE
    * narrow pass through the fused native expression
    * ([[graft.functions.expressions.SimHash64]]) — the earlier
    * generation (explode → xxhash64 → 64-column sign-sum aggregate)
    * shuffled every token row for a value each row can compute alone;
    * same xxhash64/seed-42 hashes, bit-identical signatures. Empty-token
    * docs are filtered (the explode form dropped them implicitly). */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.expressions.TextSimHash.textSimhash
    // fused tokenize+hash+vote straight off the string bytes — the
    // token array is never materialized; bit-identical to
    // simhash64(tokens(text)) (DedupSpec/PropertiesSpec). split() never
    // yields an empty array (min [""]), so the old size-filter only
    // ever dropped NULL texts — made explicit here.
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), textSimhash(col(textCol)).as("simhash"))
  }

  /** SimHash near-dup pairs: candidates share at least one of four
    * 16-bit chunks, verified with popcount(xor) <= maxHamming.
    * Pigeonhole guarantees full recall only for hamming <= 3 (chunks-1);
    * with a larger maxHamming, pairs whose differing bits spread across
    * all four chunks are missed — an explicit recall/cost trade: finer
    * chunks would guarantee more but collapse the bucketing (2^w buckets
    * per w-bit chunk) into near-all-pairs joins at scale. */
  def simhashDedup(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3,
                   maxBucket: Int = DefaultMaxBucket): DataFrame =
    simhashChunkCandidates(simhashSignatures(docs, idCol, textCol),
                           idCol, "simhash", chunkBits = 16, nChunks = 4,
                           maxHamming = maxHamming, maxBucket = maxBucket)

  /** Shared chunk-candidate stage: signatures sharing any `chunkBits`-bit
    * chunk become candidates, verified with popcount(xor). Used by both
    * the 64-bit production path and the 16-bit md5 oracle twin. */
  def simhashChunkCandidates(sigs: DataFrame, idCol: String, sigCol: String,
                             chunkBits: Int, nChunks: Int,
                             maxHamming: Int,
                             maxBucket: Int = Int.MaxValue): DataFrame = {
    val mask = (1L << chunkBits) - 1
    val chunked = dropHotBuckets(
      sigs.select(
        col(idCol), col(sigCol).as("__sig"),
        posexplode(array((0 until nChunks).map(cix =>
          shiftrightunsigned(col(sigCol), cix * chunkBits).bitwiseAND(mask)): _*)))
        .withColumnRenamed("pos", "chunk_idx")
        .withColumnRenamed("col", "chunk_key"),
      Seq("chunk_idx", "chunk_key"), maxBucket)
    val a = chunked.select(col(idCol).as("id_a"), col("__sig").as("sim_a"),
                           col("chunk_idx"), col("chunk_key"))
    val b = chunked.select(col(idCol).as("id_b"), col("__sig").as("sim_b"),
                           col("chunk_idx"), col("chunk_key"))
    a.join(b, Seq("chunk_idx", "chunk_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
              bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Oracle-checkable SimHash pipeline: same shape as [[simhashDedup]]
    * — per-token hash → bit votes → packed signature → chunk candidates
    * → hamming filter — on a 32-bit md5-family signature (4 chunks of
    * 8 bits, so each chunk still buckets into 256 keys and the
    * candidate join stays far from all-pairs), so a DuckDB oracle
    * reproduces it end-to-end. The vote aggregation shuffles exploded
    * token rows; the production path stays the fused narrow SimHash64
    * expression. */
  def simhashDedupMd5(docs: DataFrame, idCol: String, textCol: String,
                      bits: Int = 32, maxHamming: Int = 6): DataFrame = {
    val tok = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .select(col(idCol), mdBaseHash(col("tok")).as("h"))
    val votes = (0 until bits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    val packed = (0 until bits)
      .map(b => when(col(s"b$b") > 0, lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
    val sigs = tok.groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol), packed.as("simhash"))
    simhashChunkCandidates(sigs, idCol, "simhash", chunkBits = bits / 4,
                           nChunks = 4, maxHamming = maxHamming)
  }
}
