package graft.functions

import org.apache.spark.sql.functions._

import graft.GraftTestBase

class TextFunctionsSpec extends GraftTestBase {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("t").select(c.as("r")).collect().head.get(0)

  test("tokens trims before splitting — no empty head token") {
    assert(one(TextFunctions.tokenCount($"t"), "  a b  c ") == 3)
    assert(one(TextFunctions.tokenCount($"t"), "one") == 1)
  }

  test("bpe-ish token count splits letter runs, digit runs, symbols") {
    // abc | 123 | x | ! | y
    assert(one(TextFunctions.bpeTokenCount($"t"), "abc 123 x!y") == 5)
  }

  test("word shingles: n-grams over token array") {
    val df = Seq("a b c d").toDF("t")
      .select(TextFunctions.wordShingles(TextFunctions.tokens($"t"), 3).as("sh"))
    assert(df.collect().head.getSeq[String](0) == Seq("a b c", "b c d"))
  }

  test("char shingles are distinct") {
    val got = Seq("ababab").toDF("t")
      .select(TextFunctions.charShingles($"t", 2).as("sh"))
      .collect().head.getSeq[String](0)
    assert(got.toSet == Set("ab", "ba"))
  }

  test("fingerprint is whitespace/case-normalized md5") {
    val a = one(TextFunctions.fingerprint($"t"), "Hello   World")
    val b = one(TextFunctions.fingerprint($"t"), " hello world")
    val c = one(TextFunctions.fingerprint($"t"), "hello worlds")
    assert(a == b && a != c)
    // pinned value so any hash-stack change is caught
    assert(a == "5eb63bbbe01eeed093cb22bb8f5acdc3")
  }

  test("predictLang picks marker-stopword argmax with zh char override") {
    val df = Seq(
      ("the size of the thing", "en"),
      ("der hund und die katze", "de"),
      ("el perro y los gatos", "es"),
      ("le chat et les chiens", "fr"),
      ("你好世界", "zh"))
      .toDF("t", "expected")
      .withColumn("got", TextFunctions.predictLang($"t"))
    assert(df.filter($"got" =!= $"expected").count() == 0)
  }

  test("SAS date round-trip including epoch-zero (quirk B5 fixed)") {
    val df = Seq(0.0, 1.0, 20545.0).toDF("sas")
      .select(SasDate.toIsoString($"sas").as("iso"),
              SasDate.toIsoString($"sas", nullOnZero = true).as("isoCompat"))
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("1960-01-01", "1960-01-02", "2016-04-01"))
    // bug-compat mode reproduces the reference's falsy-zero null
    assert(rows(0).isNullAt(1) && rows(1).getString(1) == "1960-01-02")
  }
}
