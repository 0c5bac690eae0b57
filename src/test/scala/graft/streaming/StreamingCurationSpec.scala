package graft.streaming

import graft.{GraftTestBase, Tables}
import graft.pipelines.CurationPipeline
import graft.sources.GraftCatalog

/** The streaming curation twin must reproduce the batch funnel on the
  * same corpus: the gates use the same distillates, the cap uses the
  * same deterministic hash order, and the MERGE admission converges
  * under replay (exactly-once by doc_id key). */
class StreamingCurationSpec extends GraftTestBase {

  private val Cap = 7L

  private def freshTable(name: String): String = {
    spark.conf.set("spark.sql.catalog.gcur", classOf[GraftCatalog].getName)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcur.db")
    spark.sql(s"DROP TABLE IF EXISTS gcur.db.$name")
    spark.sql(s"""CREATE TABLE gcur.db.$name
                  (doc_id BIGINT, source STRING, lang STRING,
                   pred_lang STRING, sampled BOOLEAN,
                   ict_ctx BOOLEAN, ict_chunks INT, triplet_ok BOOLEAN,
                   batch_contaminated INT, score_psi DOUBLE)""")
    s"gcur.db.$name"
  }

  test("drained stream equals the batch curation funnel (capped)") {
    val table = freshTable("curated")
    StreamingCuration.curateToTable(spark, sf001, table, domainCap = Cap)

    val (packed, funnel) = CurationPipeline.run(
      spark, Tables(spark, sf001)("documents"), domainCap = Cap)
    val f = funnel.map(r => r.stage -> r.docs).toMap

    // post-cap admission count matches the batch domain_cap stage
    assert(spark.table(table).count() == f("domain_cap"))
    // sampled flag reproduces the batch hash_sample stage — and since
    // the single-file source drains as ONE batch, the cap's hash order
    // matches the batch window exactly, so MEMBERSHIP agrees, not just
    // counts
    val streamed = spark.table(table).filter("sampled")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batch = packed.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == batch)
    assert(streamed.size.toLong == f("hash_sample"))
  }

  test("contrastive-prep columns match the batch definitions per document") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    val table = freshTable("curated_ict")
    StreamingCuration.curateToTable(spark, sf001, table, domainCap = Cap)
    // batch twins of the distillate columns: same corpus, same
    // expressions (q470's ict predicate, the q459 chunk count, the
    // cross-source negative pool)
    val corpus = Tables(spark, sf001)("documents")
    val tok = size(TextFunctions.tokens(col("text")))
    val pool = corpus.filter(tok > 32)
      .groupBy("source").agg(count(lit(1)).as("n"))
    val total = pool.agg(coalesce(sum("n"), lit(0L)))
      .collect()(0).getLong(0)
    val expect = corpus
      .withColumn("__tok", tok)
      .join(pool, Seq("source"), "left")
      .select(col("doc_id"),
        (col("__tok") > 32).as("e_ict"),
        (greatest(expr("(__tok - 1) DIV 32"), lit(0)) + 1)
          .cast("int").as("e_chunks"),
        (col("__tok") > 32 &&
          (lit(total) - coalesce(col("n"), lit(0L))) > 0).as("e_trip"))
    val mismatches = spark.table(table)
      .join(expect, "doc_id")
      .filter(col("ict_ctx") =!= col("e_ict") ||
        col("ict_chunks") =!= col("e_chunks") ||
        col("triplet_ok") =!= col("e_trip"))
      .count()
    assert(mismatches == 0, s"$mismatches contrastive columns diverged")
    // and the funnel yields are non-trivial on this corpus: some docs
    // have context, and with >1 source every ict doc can mine a negative
    val yields = spark.table(table)
      .agg(sum(when(col("ict_ctx"), 1L).otherwise(0L)).as("ict"),
        sum(when(col("triplet_ok"), 1L).otherwise(0L)).as("trip"))
      .collect()(0)
    assert(yields.getLong(0) > 0 && yields.getLong(1) > 0)
  }

  test("batch_contaminated equals the batch funnel's decontamination drop (non-benchmark side)") {
    import org.apache.spark.sql.functions._
    val table = freshTable("curated_dirt")
    StreamingCuration.curateToTable(spark, sf001, table, domainCap = Cap)
    // batch twin: the docs the decontamination stage dropped that are
    // NOT benchmark docs themselves (the stage also drops the 1-in-97
    // benchmark slice by construction) — exactly the streaming gate's
    // contaminated set, read off the disposition table
    val (_, _, disposition) = CurationPipeline.runWithDisposition(
      spark, Tables(spark, sf001)("documents"), domainCap = Cap)
    val expected = disposition
      .filter(col("dropped_at") === "decontaminate" &&
        pmod(col("doc_id"), lit(97)) =!= 0)
      .count()
    // single-file source drains as ONE batch → the column is uniform
    val stamped = spark.table(table)
      .select("batch_contaminated").distinct()
      .collect().map(_.getInt(0)).toSeq
    assert(stamped == Seq(expected.toInt),
      s"stamped $stamped vs batch-funnel $expected")
    // and the drift stamp: on corpus replay the micro-batch's score
    // distribution IS the corpus distillate, so the PSI is exactly 0.0
    val psi = spark.table(table)
      .select("score_psi").distinct().collect().map(_.getDouble(0)).toSeq
    assert(psi == Seq(0.0), s"replay score_psi must be 0.0, got $psi")
  }

  test("score_psi prices a drifted incoming shard against the corpus distillate") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.functions.TextFunctions
    import graft.operators.{LangId, QualityClassifier}
    val table = freshTable("curated_psi")
    val corpus = Tables(spark, sf001)("documents")
    // a shard with a very different quality profile: stopword-free
    // all-distinct gibberish that still clears the length/token gates
    // (so rows ARE admitted and carry the stamp) but whose scores pile
    // into a different decile than the corpus' prose
    def junk(i: Int) = (0 until 16).map(j => s"zw${i}q${j}xv").mkString(" ")
    val shard = (0 until 50).map(i =>
        (900000L + i, junk(i), "en", "srcJ", junk(i).length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("psi_src").toString
    shard.coalesce(1).write.mode("overwrite").parquet(s"$tmp/_stage")
    val part = new java.io.File(s"$tmp/_stage").listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$tmp/documents.parquet"))
    StreamingCuration.curateToTable(spark, sf001, table,
      streamDir = Some(tmp))
    val stamped = spark.table(table)
      .select("score_psi").distinct().collect().map(_.getDouble(0)).toSeq
    assert(stamped.length == 1, s"one batch → one stamp, got $stamped")
    // driver twin: decile counts of both sides (post the same stage-0
    // projection), 6-dp-rounded PSI terms, StrictMath.log
    def hist(df: org.apache.spark.sql.DataFrame): Array[Long] = {
      val scoreCols = LangId.defaultModel.map { case (l, _) => s"score_$l" }
      val m = LangId.classify(df, "text").drop(scoreCols: _*)
        .select(least(floor(round(QualityClassifier.scoreExpr(
            QualityClassifier.defaultModel(col("text"))), 6) * 10),
          lit(9.0)).cast("int").as("b"))
        .groupBy("b").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      Array.tabulate(10)(b => m.getOrElse(b, 0L))
    }
    val rh = hist(corpus)
    val ch = hist(shard)
    val expect = (0 until 10).map { b =>
      val p = math.max(rh(b).toDouble / rh.sum, 1e-6)
      val q = math.max(ch(b).toDouble / ch.sum, 1e-6)
      BigDecimal((p - q) * StrictMath.log(p / q))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.sum
    assert(stamped.head == expect,
      s"stamped ${stamped.head} vs twin $expect")
    // and the drift is non-trivial — this shard fails the 0.1 bar
    assert(stamped.head > 0.1, s"junk shard must read as drifted: $stamped")
  }

  test("funnel equality holds at a non-default maxJaccard (containment gate tuned)") {
    // the containment gate's jaccard ceiling must thread identically
    // through both twins — a batch-only (or stream-only) knob would
    // silently diverge the funnels off-default
    val table = freshTable("curated_mj")
    StreamingCuration.curateToTable(spark, sf001, table,
      domainCap = Cap, maxJaccard = 0.95)
    val (packed, funnel) = CurationPipeline.run(
      spark, Tables(spark, sf001)("documents"),
      domainCap = Cap, maxJaccard = 0.95)
    val f = funnel.map(r => r.stage -> r.docs).toMap
    assert(spark.table(table).count() == f("domain_cap"))
    val streamed = spark.table(table).filter("sampled")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batch = packed.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == batch)
  }

  test("replaying the drain converges instead of duplicating (MERGE exactly-once)") {
    val table = freshTable("curated_replay")
    StreamingCuration.curateToTable(spark, sf001, table, domainCap = Cap)
    val first = spark.table(table).orderBy("doc_id").collect().map(_.toString).toSeq
    // second drain over the same corpus: every row MERGE-matches, the
    // cap counts see the already-admitted rows, nothing changes
    StreamingCuration.curateToTable(spark, sf001, table, domainCap = Cap)
    val second = spark.table(table).orderBy("doc_id").collect().map(_.toString).toSeq
    assert(first == second)
  }

  test("never-seen docs at ingestion: patchwork rejected by winnow state, fresh doc admitted") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val table = freshTable("curated_ingest")
    val corpus = Tables(spark, sf001)("documents")

    // steal 30-token runs from four docs that SURVIVE the batch funnel
    // (so the stitched text is decon-safe and its spans are guaranteed
    // to be in the winnow gate state)
    val (packed, funnel) = CurationPipeline.run(spark, corpus)
    val donors = packed.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)
        .toLowerCase.split("[^a-z]+").filter(_.nonEmpty))
      .filter(_._2.length >= 40).take(4)
    assert(donors.length == 4, "not enough token-rich batch survivors")
    val patchwork = donors.map(_._2.take(30).mkString(" ")).mkString(" ")
    // a fresh doc sharing NOTHING with the corpus: unique letter words
    def cw(i: Int) =
      s"zq${('a' + i / 26).toChar}${('a' + i % 26).toChar}xverat"
    val fresh = (0 until 60).map(cw).mkString(" ")
    // 300001 % 97 == 77, 300002 % 97 == 78 — neither is a benchmark id
    val streamed = corpus.unionByName(Seq(
      (300001L, patchwork, "en", "srcP", patchwork.length.toLong),
      (300002L, fresh, "en", "srcNew", fresh.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    // the source expects a FILE named documents.parquet (pathGlobFilter
    // matches leaf files): write one part and rename it into place
    val tmp = java.nio.file.Files.createTempDirectory("ingest_src").toString
    streamed.coalesce(1).write.mode("overwrite").parquet(s"$tmp/_stage")
    val part = new java.io.File(s"$tmp/_stage").listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$tmp/documents.parquet"))

    // gate state from the CORPUS dir; stream from the extended dir
    StreamingCuration.curateToTable(spark, sf001, table,
      streamDir = Some(tmp))
    val admitted = spark.table(table).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // the patchwork is built from corpus spans → its winnowing
    // fingerprints are overwhelmingly held by OTHER docs → rejected
    // at ingestion, before any batch re-sweep
    assert(!admitted.contains(300001L), "patchwork doc was admitted")
    // the genuinely new doc sails through every content gate
    assert(admitted.contains(300002L), "fresh doc was rejected")
    // and the corpus slice still matches the batch funnel exactly
    val f = funnel.map(r => r.stage -> r.docs).toMap
    assert(admitted.count(_ < 300000L).toLong == f("domain_cap"))
  }

  test("reordered quote rejected at ingestion by the content containment gate") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val table = freshTable("curated_contain")
    // container doc B in the INDEX corpus (130 long pseudo-random
    // words — under the 4096-char quality ceiling); never-seen doc S =
    // 60 of B's words REVERSED: too low-Jaccard for the near-dup gate
    // (~0.38), zero long runs for the winnow gate (word order broken),
    // unique fingerprint — only the content-based bottom-k containment
    // probe can see that ~87% of S's shingles live inside B
    def word(i: Int) = {
      val r = new scala.util.Random(i)
      (0 until 30).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    }
    val big = (0 until 130).map(word).mkString(" ")
    val small = (50 until 110).map(word).reverse.mkString(" ")
    val corpusPlus = Tables(spark, sf001)("documents").unionByName(
      Seq((800001L, big, "en", "srcB", big.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    def writeDir(df: org.apache.spark.sql.DataFrame): String = {
      val tmp = java.nio.file.Files.createTempDirectory("contain_src").toString
      df.coalesce(1).write.mode("overwrite").parquet(s"$tmp/_stage")
      val part = new java.io.File(s"$tmp/_stage").listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp/documents.parquet"))
      tmp
    }
    val idxDir = writeDir(corpusPlus)
    val streamDir = writeDir(corpusPlus.unionByName(
      Seq((800002L, small, "en", "srcB", small.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")))
    StreamingCuration.curateToTable(spark, idxDir, table,
      streamDir = Some(streamDir))
    val admitted = spark.table(table).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(!admitted.contains(800002L), "reordered quote was admitted")
    assert(admitted.contains(800001L), "container doc was rejected")
    // index-corpus slice still equals the batch funnel
    val (_, funnel) = CurationPipeline.run(spark, corpusPlus)
    val f = funnel.map(r => r.stage -> r.docs).toMap
    assert((admitted - 800002L).size.toLong == f("domain_cap"))
  }

  test("perplexity gate prices never-seen docs at ingestion") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val table = freshTable("curated_ppl")
    val corpus = Tables(spark, sf001)("documents")
    // plants as in CurationPipelineSpec's gate test: a no-bigram-reuse
    // greedy walk (fluent, all SEEN high-count bigrams) vs hash-ordered
    // vocabulary (salad, bigrams the model has never seen — the score
    // probe's unseen-event fallbacks are exactly what prices it)
    val (fluent, salad) = graft.TestCorpusPlants.fluentAndSalad(corpus)
    // threshold from the corpus-fit model (what the gate state holds)
    import graft.operators.KnLm
    val m = KnLm.fit(corpus, "doc_id", "text")
    val plants = Seq(
      (700001L, fluent, "en", "srcR", fluent.length.toLong),
      (700002L, salad, "en", "srcR", salad.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val nll = KnLm.score(plants, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("avg_nll")).toMap
    val thr = (nll(700001L) + nll(700002L)) / 2
    val streamed = corpus.unionByName(plants)
    val tmp = java.nio.file.Files.createTempDirectory("ppl_src").toString
    streamed.coalesce(1).write.mode("overwrite").parquet(s"$tmp/_stage")
    val part = new java.io.File(s"$tmp/_stage").listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$tmp/documents.parquet"))
    StreamingCuration.curateToTable(spark, sf001, table,
      maxAvgNll = thr, streamDir = Some(tmp))
    val admitted = spark.table(table).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(!admitted.contains(700002L), "salad doc was admitted")
    assert(admitted.contains(700001L), "fluent doc was rejected")
    // corpus slice still equals the batch funnel under the same gate
    val (_, funnel) = CurationPipeline.run(spark, corpus, maxAvgNll = thr)
    val f = funnel.map(r => r.stage -> r.docs).toMap
    assert(admitted.count(_ < 700000L).toLong == f("domain_cap"))
  }

  test("language-gated drain equals the language-gated batch funnel") {
    import org.apache.spark.sql.functions._
    val table = freshTable("curated_lang")
    val langs = Some(Set("en"))
    StreamingCuration.curateToTable(spark, sf001, table, allowedLangs = langs)
    val (packed, funnel) = CurationPipeline.run(
      spark, Tables(spark, sf001)("documents"), allowedLangs = langs)
    val f = funnel.map(r => r.stage -> r.docs).toMap
    assert(spark.table(table).count() == f("domain_cap"))
    val streamed = spark.table(table).filter("sampled")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batch = packed.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == batch)
    // nothing outside the allowed set was admitted
    assert(spark.table(table)
      .filter(!col("pred_lang").isin("en")).count() == 0)
  }

  test("adaptive-quality-gated drain equals the gated batch funnel") {
    val table = freshTable("curated_adaptive")
    StreamingCuration.curateToTable(spark, sf001, table,
      adaptiveQualityPct = 10)
    val (packed, funnel) = CurationPipeline.run(
      spark, Tables(spark, sf001)("documents"), adaptiveQualityPct = 10)
    val f = funnel.map(r => r.stage -> r.docs).toMap
    // the gate actually gated
    assert(f("adaptive_quality") < f("quality_gate"))
    assert(spark.table(table).count() == f("domain_cap"))
    val streamed = spark.table(table).filter("sampled")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batch = packed.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == batch)
  }

  test("uncapped drain matches the uncapped batch membership") {
    val table = freshTable("curated_uncapped")
    StreamingCuration.curateToTable(spark, sf001, table)
    val (packed, funnel) = CurationPipeline.run(
      spark, Tables(spark, sf001)("documents"))
    val f = funnel.map(r => r.stage -> r.docs).toMap
    assert(spark.table(table).count() == f("domain_cap"))
    val streamed = spark.table(table).filter("sampled")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batch = packed.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == batch)
  }
}
