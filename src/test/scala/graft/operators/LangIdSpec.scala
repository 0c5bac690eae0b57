package graft.operators

import graft.GraftTestBase

class LangIdSpec extends GraftTestBase {
  import spark.implicits._

  private val fixture = Seq(
    (1L, "The cat sat on the mat and looked out of the window during the evening."),
    (2L, "Der Hund und die Katze spielen zusammen und ich finde das schön im Garten."),
    (3L, "Les enfants jouent dans le jardin et une femme regarde les oiseaux près de l'eau."),
    (4L, "El perro y los gatos que viven en la casa han jugado en el jardín."),
    (5L, "zqx vbk wpf jjq kzz xqv bbw ppk"), // token salad: nothing fires
    (6L, "")) // empty: nothing fires
    .toDF("doc_id", "text")

  test("planted multilingual docs route to their language, salad to und") {
    val pred = LangId.classify(fixture, "text")
      .select("doc_id", "pred_lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred(1L) == "en", s"en misrouted: $pred")
    assert(pred(2L) == "de", s"de misrouted: $pred")
    assert(pred(3L) == "fr", s"fr misrouted: $pred")
    assert(pred(4L) == "es", s"es misrouted: $pred")
    assert(pred(5L) == "und", s"salad not und: $pred")
    assert(pred(6L) == "und", s"empty not und: $pred")
  }

  test("scores are exact ×3 trigram-occurrence masses; ties break to the earlier language") {
    // " und " fires de:"und"(5) and en:"and"? no — exact surfaces:
    // "der der der" → de fires "der" twice in "der der" overlap-free
    // scan: " der der der " contains 'der' 3 times → score_de = 3·3·4
    val r = LangId.classify(Seq((1L, "der der der")).toDF("doc_id", "text"),
        "text")
      .select("score_de", "pred_lang").collect().head
    assert(r.getLong(0) == 3L * 3L * 4L, s"got ${r.getLong(0)}")
    assert(r.getString(1) == "de")
    // a surface where two languages tie: " la " fires es(" la", 3) and
    // fr(" la", 3) equally → tie breaks to the alphabetically earlier (es)
    val tie = LangId.classify(Seq((1L, "la")).toDF("doc_id", "text"), "text")
      .select("score_es", "score_fr", "pred_lang").collect().head
    assert(tie.getLong(0) == tie.getLong(1) && tie.getLong(0) > 0,
      s"fixture no longer ties: $tie")
    assert(tie.getString(2) == "es", s"tie broke wrong: $tie")
  }

  test("classification composes with the documents table (no nulls, all langs legal)") {
    val out = LangId.classify(graft.Tables(spark, sf001)("documents"), "text")
      .groupBy("pred_lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet.subsetOf(Set("de", "en", "es", "fr", "und")), s"$out")
    assert(out.values.sum == 500L, s"rows lost: $out")
  }

  test("spans segments a planted bilingual document into language runs") {
    import spark.implicits._
    // 64 English tokens then 64 German tokens; 32-token chunks give
    // exactly two chunks per language block
    val en = Seq.fill(8)("the thing and the song of the king").mkString(" ")
    val de = Seq.fill(8)("der schnelle und die schule ich zu einem").mkString(" ")
    val out = LangId.spans(Seq((1L, s"$en $de")).toDF("doc_id", "text"),
        "doc_id", "text", chunkTokens = 32)
      .orderBy("span_idx").collect()
    assert(out.length == 2, s"expected 2 spans, got ${out.length}")
    assert(out(0).getAs[String]("span_lang") == "en" &&
      out(0).getAs[Long]("n_chunks") == 2L &&
      out(0).getAs[Long]("start_chunk") == 0L &&
      out(0).getAs[Long]("n_tokens") == 64L, s"en span: ${out(0)}")
    assert(out(1).getAs[String]("span_lang") == "de" &&
      out(1).getAs[Long]("n_chunks") == 2L &&
      out(1).getAs[Long]("start_chunk") == 2L &&
      out(1).getAs[Long]("start_tok") == 64L &&
      out(1).getAs[Long]("n_tokens") == 64L, s"de span: ${out(1)}")
  }

  test("spans returns one span for a monolingual document") {
    import spark.implicits._
    val en = Seq.fill(10)("the thing and the song of the king").mkString(" ")
    val out = LangId.spans(Seq((7L, en)).toDF("doc_id", "text"),
        "doc_id", "text", chunkTokens = 16).collect()
    assert(out.length == 1 && out(0).getAs[String]("span_lang") == "en",
      s"monolingual doc split: ${out.mkString(",")}")
    assert(out(0).getAs[Long]("n_tokens") == 80L, s"token total: ${out(0)}")
  }
}
