package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftTestBase

/** Semantics of the near-dup operators, pinned on planted duplicates —
  * the driver's rows-only check can't see inside these, so this spec is
  * their correctness oracle. */
class DedupSpec extends GraftTestBase {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away " * 4

  /** corpus: 0 and 1 identical; 2 a near-dup of 0 (one word changed);
    * 3 unrelated. */
  private def corpus = Seq(
    (0L, base),
    (1L, base),
    (2L, base.replace("lazy dog", "sleepy dog")),
    (3L, "completely different content about spark query engines " * 6))
    .toDF("doc_id", "text")

  test("exact dedup groups identical texts deterministically (min id survives)") {
    val out = Dedup.exact(corpus, "doc_id", "text")
      .orderBy("survivor_id").collect()
    assert(out.length == 3)
    val dupGroup = out.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dupGroup.getAs[Long]("survivor_id") == 0L)
  }

  test("exact dedup is whitespace/case-insensitive via normalization") {
    val df = Seq((1L, "Hello  World"), (2L, "hello world "), (3L, "hello worlds"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", "text").collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[Long]("n_copies")).sorted.toSeq == Seq(1L, 2L))
  }

  test("minhash LSH finds planted near-dups with est_jaccard tracking exact jaccard") {
    val pairs = Dedup.minhashDedup(corpus, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // identical docs: every signature slot agrees
    assert(pairs.get((0L, 1L)).contains(1.0))
    // near-dup: high estimated jaccard
    assert(pairs.contains((0L, 2L)) && pairs((0L, 2L)) > 0.5)
    assert(pairs.contains((1L, 2L)))
    // unrelated doc never pairs
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("minhash estimate approximates exact char-5-gram jaccard") {
    import graft.functions.TextFunctions
    val sh = corpus.select($"doc_id",
      TextFunctions.charShingles($"text", 5).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val exact = sh(0L).intersect(sh(2L)).size.toDouble / sh(0L).union(sh(2L)).size
    val est = Dedup.minhashDedup(corpus, "doc_id", "text", threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      .apply((0L, 2L))
    assert(math.abs(est - exact) < 0.15, s"est=$est exact=$exact")
  }

  test("simhash: identical docs hamming 0, near-dups close, unrelated docs far") {
    val sigs = Dedup.simhashSignatures(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(0L) == sigs(1L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sigs(0L), sigs(2L)) <= 12)
    assert(hamming(sigs(0L), sigs(3L)) > 12)

    val pairs = Dedup.simhashDedup(corpus, "doc_id", "text", maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical docs (hamming 0) are guaranteed candidates by pigeonhole;
    // the hamming-12 near-dup is only opportunistically recalled (its
    // differing bits may spread across all 4 chunks), so not asserted.
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("fused shingle_minhash equals charShingles→MinHashSignature bit-for-bit (incl. multi-byte UTF-8)") {
    import graft.functions.TextFunctions
    import graft.functions.expressions.MinHashSignature
    import graft.functions.expressions.ShingleMinHash.shingleMinhash
    // real docs + adversarial rows: multi-byte chars (shingle byte spans
    // differ from char spans), repeated shingles (distinct no-op), and
    // docs shorter than the shingle (sentinel-P signature)
    val edge = Seq((9001L, "naïve café — 你好世界, 你好世界, naïve café"),
                   (9002L, "aaaaaaaaaaaaaaa"))
      .toDF("doc_id", "text")
    val docs = graft.Tables(spark, sf001)("documents")
      .select($"doc_id", $"text").limit(200)
      .union(edge)
      .filter(length($"text") >= 5) // the pipelines' precondition
    val k = 32
    val both = docs
      .select($"doc_id",
        shingleMinhash($"text", 5, k).as("fused"),
        MinHashSignature.minhashSignature(
          TextFunctions.charShingles($"text", 5), k).as("composed"))
      .filter(to_json($"fused") =!= to_json($"composed"))
    assert(both.count() == 0)
    // sub-shingle-length docs: sentinel P in every slot (never match)
    val P = MinHashSignature.P
    val short = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
      .select(shingleMinhash($"text", 5, 4).as("s"))
      .collect().map(_.getSeq[Long](0))
    assert(short.forall(_ == Seq.fill(4)(P)))
  }

  test("fused text_simhash equals simhash64∘tokens bit-for-bit (incl. whitespace edges)") {
    import graft.functions.TextFunctions
    import graft.functions.expressions.SimHash64.simhash64
    import graft.functions.expressions.TextSimHash.textSimhash
    // adversarial rows: leading/trailing tabs (empty tokens under Java
    // split limit -1), all-space (trim → [""]), empty string, multi-byte
    // tokens, CR/LF/VT/FF separators
    val edge = Seq("\tleading", "trailing\t", "  spaced out  ", "   ", "",
                   "a\r\nbc\fd", "naïve café 你好 🙂", "one")
      .zipWithIndex.map { case (t, i) => (9100L + i, t) }.toDF("doc_id", "text")
    val docs = graft.Tables(spark, sf001)("documents")
      .select($"doc_id", $"text").limit(200)
      .union(edge)
    val bad = docs.select(
        textSimhash($"text").as("fused"),
        simhash64(TextFunctions.tokens($"text")).as("composed"))
      .filter($"fused" =!= $"composed")
    assert(bad.count() == 0)
  }

  test("LSH band exchange is slim: signatures never ride the candidate shuffle") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
      case q: QueryStageExec        => q +: flatten(q.plan)
      case other                    => other +: other.children.flatMap(flatten)
    }
    // tiny corpus would broadcast-join; force the shuffle path so the
    // exchange under test exists (at real scale both sides are large)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val cand = Dedup.minhashDedup(corpus, "doc_id", "text", threshold = 0.0)
    try cand.collect() // materialize so AQE finalizes stages
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    val exchanges = flatten(cand.queryExecution.executedPlan)
      .collect { case s: ShuffleExchangeLike => s }
    assert(exchanges.nonEmpty)
    // any exchange moving band rows must NOT carry the k-slot signature
    // (the whole point of the slim candidate join: k·8 bytes per band
    // row stays out of the dominant shuffle)
    val bandExchanges = exchanges.filter(_.output.exists(_.name == "band_key"))
    assert(bandExchanges.nonEmpty, "expected a band-keyed exchange in the LSH plan")
    assert(bandExchanges.forall(!_.output.exists(_.name.startsWith("sig"))),
      s"signature column leaked into the band exchange:\n${bandExchanges.head}")
  }

  test("local (shuffle-free) signatures equal the exploded+groupBy signatures") {
    import graft.functions.TextFunctions
    val withShingles = corpus.select($"doc_id",
      TextFunctions.charShingles($"text", 5).as("sh"))
    val local = Dedup.minhashSignaturesLocal(withShingles, "doc_id", "sh", 32)
      .orderBy("doc_id").collect().map(_.toString)
    val exploded = Dedup.minhashSignatures(
      withShingles.select($"doc_id", explode($"sh").as("s")), "doc_id", "s", 32)
      .orderBy("doc_id").collect().map(_.toString)
    assert(local.toSeq == exploded.toSeq)
  }

  test("md5-family minhash pipeline (q26 oracle twin) mirrors the xxhash semantics") {
    val pairs = Dedup.minhashDedupMd5(corpus, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.get((0L, 1L)).contains(1.0))
    assert(pairs.contains((0L, 2L)) && pairs((0L, 2L)) > 0.5)
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("md5-family simhash pipeline (q27 oracle twin) mirrors the xxhash semantics") {
    val pairs = Dedup.simhashDedupMd5(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // identical docs: hamming 0, guaranteed candidates by pigeonhole
    assert(pairs.get((0L, 1L)).contains(0))
    // unrelated doc stays out at hamming <= 6 of 32
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  /** 10k docs sharing every band (identical boilerplate) + one genuine
    * near-dup pair in its own cold buckets. Uncapped, the boilerplate
    * alone is ~5·10⁷ candidate pairs; with the cap the stage must emit
    * ONLY the cold pair — and finish fast enough to run as a unit test,
    * which is itself the assertion that no quadratic blowup happened. */
  private def boilerplateCorpus = {
    val boiler = "copyright notice all rights reserved template page " * 3
    val planted = (100L until 10100L).map(i => (i, boiler))
    spark.createDataFrame(
      planted :+ (0L, base) :+ (2L, base.replace("lazy dog", "sleepy dog")))
      .toDF("doc_id", "text")
  }

  test("hot-bucket cap kills the boilerplate pair explosion, keeps cold-bucket pairs") {
    val pairs = Dedup.minhashDedup(boilerplateCorpus, "doc_id", "text",
        threshold = 0.5, maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 2L)))
    assert(!pairs.exists { case (a, b) => a >= 100L || b >= 100L })
  }

  test("uncapped minhashCandidates on the same corpus would pair the boilerplate") {
    // sanity check on a 50-doc slice (the 10k uncapped run is the
    // explosion this cap exists to prevent): without a cap the planted
    // docs DO all pair, so the capped test above is a real difference
    val slice = boilerplateCorpus.filter($"doc_id" < 150)
    val pairs = Dedup.minhashDedup(slice, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.count { case (a, b) => a >= 100L && b >= 100L } == 50 * 49 / 2)
  }

  test("bandCapReport accounts the skipped boilerplate mass exactly") {
    import graft.functions.expressions.ShingleMinHash.shingleMinhash
    val sigs = boilerplateCorpus
      .select($"doc_id", shingleMinhash($"text", 5, 64).as("sig"))
    val rep = Dedup.bandCapReport(
        Dedup.bandRows(sigs, "doc_id", 64, 16), maxBucket = 100)
      .orderBy("band_idx").collect()
    assert(rep.length == 16)
    rep.foreach { r =>
      // each band: the one boilerplate bucket is hot (10k rows), the
      // near-dup pair's buckets are cold
      assert(r.getAs[Long]("n_hot_buckets") == 1L)
      assert(r.getAs[Long]("rows_skipped") == 10000L)
      assert(r.getAs[Long]("pairs_avoided") == 10000L * 9999L / 2L)
    }
  }

  test("simhash chunk cap suppresses identical-signature floods") {
    // cold pair: identical texts (hamming 0, guaranteed candidate) in
    // their own size-2 buckets; the 10k boilerplate signature floods
    // every one of ITS chunk buckets past the cap
    val corpus2 = boilerplateCorpus
      .withColumn("text", when($"doc_id" === 2L, lit(base)).otherwise($"text"))
    val pairs = Dedup.simhashDedup(corpus2, "doc_id", "text",
        maxHamming = 3, maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.exists { case (a, b) => a >= 100L || b >= 100L })
    assert(pairs.contains((0L, 2L)))
  }

  test("minhashGate flags new-vs-old only, never old-vs-old") {
    import graft.functions.expressions.ShingleMinHash.shingleMinhash
    // old corpus: docs 0,1 identical; new snapshot: 10 = copy of 0,
    // 11 = unrelated. The gate must flag (10 -> 0) and (10 -> 1) but
    // never surface the old-old (0,1) duplicate — that's the whole
    // point of incremental dedup.
    val old = Seq((0L, base), (1L, base)).toDF("doc_id", "text")
    val fresh = Seq((10L, base),
      (11L, "completely different content about engines " * 6))
      .toDF("doc_id", "text")
    def sigs(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", shingleMinhash($"text", 5, 64).as("sig"))
    val out = Dedup.minhashGate(sigs(fresh), sigs(old), "doc_id",
        k = 64, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((10L, 0L), (10L, 1L)))
  }

  test("signatures are stable across repartitioning (deterministic hashing)") {
    val a = Dedup.minhashSignatures(
      corpus.select($"doc_id", explode(graft.functions.TextFunctions.charShingles($"text", 5)).as("sh")),
      "doc_id", "sh", 16).orderBy("doc_id").collect()
    val b = Dedup.minhashSignatures(
      corpus.repartition(7).select($"doc_id", explode(graft.functions.TextFunctions.charShingles($"text", 5)).as("sh")),
      "doc_id", "sh", 16).orderBy("doc_id").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }
}
