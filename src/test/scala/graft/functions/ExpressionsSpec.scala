package graft.functions

import org.apache.spark.sql.functions._

import graft.GraftTestBase
import graft.functions.expressions.DotProduct.vecDot
import graft.functions.expressions.SasToDate.sasToDate

/** Native Catalyst expressions: interpreted eval and codegen paths must
  * agree with each other and with the composed-built-in forms. */
class ExpressionsSpec extends GraftTestBase {
  import spark.implicits._

  test("sas_to_date matches the composed SasDate built-ins over a wide range") {
    val df = spark.range(-5000, 40000, 371).toDF("sas")
      .select(
        sasToDate($"sas").as("native"),
        SasDate.toDate($"sas").as("composed"))
    assert(df.filter($"native" =!= $"composed").count() == 0)
    // pinned anchors: epoch itself and the reference's April-2016 window
    val anchors = Seq(0, 20545).toDF("sas")
      .select(sasToDate($"sas").cast("string").as("d")).collect().map(_.getString(0))
    assert(anchors.toSeq == Seq("1960-01-01", "2016-04-01"))
  }

  test("sas_to_date is null-intolerant and SQL-registered") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT sas_to_date(CAST(20545 AS INT)) AS d, sas_to_date(CAST(NULL AS INT)) AS n")
      .collect().head
    assert(viaSql.getDate(0).toString == "2016-04-01" && viaSql.isNullAt(1))
  }

  test("vec_dot matches the higher-order fold bit-for-bit on real embeddings") {
    val e = graft.Tables(spark, sf001)("embeddings").limit(200)
    val diff = e.select(
        vecDot($"embedding", $"embedding").as("native"),
        VectorFunctions.dot($"embedding", $"embedding").as("composed"))
      .filter($"native" =!= $"composed")
    assert(diff.count() == 0)
  }

  test("vec_dot null semantics mirror the zip_with∘aggregate fold") {
    // mismatch → null (zip_with pads with null, which poisons the fold)
    val mism = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
    val both = mism.select(
      vecDot($"a", $"b").as("native"),
      VectorFunctions.dot($"a", $"b").as("composed")).collect().head
    assert(both.isNullAt(0) && both.isNullAt(1))
    // null element → null, matching the composed form
    val withNull =
      spark.sql("SELECT array(1.0d, CAST(NULL AS double)) a, array(3.0d, 4.0d) b")
    val r = withNull.select(
      vecDot($"a", $"b").as("native"),
      VectorFunctions.dot($"a", $"b").as("composed")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
    // null input → null
    val nin = spark.sql("SELECT CAST(NULL AS array<double>) a, array(1.0d) b")
    assert(nin.select(vecDot($"a", $"b")).collect().head.isNullAt(0))
  }

  test("rolling_hash equals the composed O(n²) fold, incl. non-ASCII codepoints") {
    import graft.functions.expressions.RollingHash.rollingHash
    val df = Seq("hello world", "", "a", "naïve café — 你好", "x" * 500).toDF("t")
    val P = graft.functions.expressions.MinHashSignature.P
    val composed = aggregate(
      transform(sequence(lit(1), length($"t")),
                i => ascii($"t".substr(i, lit(1))).cast("long")),
      lit(0L), (acc, c) => pmod(acc * lit(131L) + c, lit(P)))
    val bad = df.select(rollingHash($"t").as("native"), composed.as("slow"))
      .filter($"native" =!= $"slow")
    assert(bad.count() == 0)
  }

  test("simhash64 equals the explode + 64-agg sign-sum form bit-for-bit") {
    import graft.functions.expressions.SimHash64.simhash64
    val docs = graft.Tables(spark, sf001)("documents").limit(100)
    val native = docs.select($"doc_id",
        simhash64(TextFunctions.tokens($"text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the previous operator generation, inlined as the reference
    val tok = docs.select($"doc_id",
        explode(TextFunctions.tokens($"text")).as("tok"))
      .select($"doc_id", xxhash64($"tok").as("h"))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright($"h", b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    val sig = (0 until 64)
      .map(b => when(col(s"b$b") > 0, lit(1L << b)).otherwise(0L)).reduce(_ + _)
    val composed = tok.groupBy($"doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select($"doc_id", sig.as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == composed)
  }

  test("vec_dot works via SQL surface") {
    GraftFunctions.register(spark)
    val got = spark.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(got == 11.0)
  }

  test("every native expression is reachable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql("""
      SELECT simhash64(array('a', 'b')) AS sh,
             minhash_signature(array('a', 'b'), 4) AS mh,
             rolling_hash('abc') AS rh,
             minhash_from_hashes(array(7L, 11L), 4) AS mfh,
             shingle_minhash('hello world', 5, 4) AS smh,
             text_simhash('hello world') AS tsh
    """).collect().head
    // values themselves are pinned by the per-expression equivalence
    // tests; here we pin SQL reachability + shape
    assert(r.getSeq[Long](1).length == 4)
    assert(r.getLong(2) > 0)
    assert(r.getSeq[Long](3).length == 4)
    // shingle_minhash('hello world') == minhash_signature of its shingles
    val viaShingles = spark.sql(
      "SELECT minhash_signature(array('hello', 'ello ', 'llo w', 'lo wo', 'o wor', ' worl', 'world'), 4) AS m")
      .collect().head.getSeq[Long](0)
    assert(r.getSeq[Long](4) == viaShingles)
    // text_simhash == simhash64 over the whitespace tokens
    val viaTokens = spark.sql(
      "SELECT simhash64(array('hello', 'world')) AS s")
      .collect().head.getLong(0)
    assert(r.getLong(5) == viaTokens)
    // and the SQL result matches the Column API result
    import graft.functions.expressions.SimHash64.simhash64
    val viaCol = spark.sql("SELECT array('a','b') AS t")
      .select(simhash64($"t")).collect().head.getLong(0)
    assert(r.getLong(0) == viaCol)
  }

  test("weighted_avg UDAF is reachable from SQL and partial-aggregates") {
    GraftFunctions.register(spark)
    val got = spark.sql("""
      SELECT k, weighted_avg(v, w) AS wa
      FROM VALUES (1, 10.0d, 1.0d), (1, 20.0d, 3.0d), (2, 5.0d, 2.0d)
        AS t(k, v, w)
      GROUP BY k ORDER BY k
    """).collect()
    assert(got(0).getDouble(1) == (10.0 * 1 + 20.0 * 3) / 4)
    assert(got(1).getDouble(1) == 5.0)
  }

  test("native weighted_avg DeclarativeAggregate mirrors the udaf twin incl. null/empty semantics") {
    import graft.functions.expressions.WeightedAverage.weightedAvgNative
    GraftFunctions.register(spark)
    // SQL reachability + exact value
    val sql = spark.sql("""
      SELECT k, weighted_avg_native(v, w) AS wa
      FROM VALUES (1, 10.0d, 1.0d), (1, 20.0d, 3.0d), (2, 5.0d, 2.0d)
        AS t(k, v, w)
      GROUP BY k ORDER BY k
    """).collect()
    assert(sql(0).getDouble(1) == (10.0 * 1 + 20.0 * 3) / 4)
    assert(sql(1).getDouble(1) == 5.0)
    // null rows are skipped; an all-null group yields 0.0 like the
    // Aggregator's zero-division guard (NOT null)
    val nulls = spark.sql("""
      SELECT k, weighted_avg_native(v, w) AS wa
      FROM VALUES (1, 10.0d, 2.0d), (1, CAST(NULL AS DOUBLE), 5.0d),
                  (2, CAST(NULL AS DOUBLE), 1.0d)
        AS t(k, v, w)
      GROUP BY k ORDER BY k
    """).collect()
    assert(nulls(0).getDouble(1) == 10.0 && !nulls(1).isNullAt(1)
           && nulls(1).getDouble(1) == 0.0)
    // Column API equals the udaf twin on real data, group by group
    val wavg = org.apache.spark.sql.functions.udaf(graft.functions.WeightedAvg)
    val both = graft.Tables(spark, sf001)("lineitem")
      .groupBy($"l_returnflag")
      .agg(round(wavg($"l_extendedprice", $"l_quantity"), 6).as("u"),
           round(weightedAvgNative($"l_extendedprice", $"l_quantity"), 6).as("n"))
      .collect()
    assert(both.nonEmpty && both.forall(r => r.getDouble(1) == r.getDouble(2)))
  }

  test("minhash_from_hashes equals the array_min∘transform composition bit-for-bit") {
    import graft.functions.expressions.MinHashSignature
    val P = MinHashSignature.P
    val k = 16
    // real doc shingles hashed with the md5 family — the exact q26 input
    val hx = transform(
      TextFunctions.charShingles($"text", 5),
      sh => graft.operators.Dedup.mdBaseHash(sh))
    val composed = array((0 until k).map { i =>
      val (a, b) = MinHashSignature.coef(i)
      array_min(transform(hx, x => pmod(lit(a) * pmod(x, lit(P)) + lit(b), lit(P))))
    }: _*)
    val bad = graft.Tables(spark, sf001)("documents")
      .filter(length($"text") >= 5).limit(200)
      .select(MinHashSignature.minhashFromHashes(hx, k).as("native"),
              composed.as("slow"))
      .filter(to_json($"native") =!= to_json($"slow"))
    assert(bad.count() == 0)
    // empty array → NULL signature: the old all-P sentinel paired any
    // two empty docs at est_jaccard 1.0; NULL produces zero band rows
    // downstream (the composition yields [NULL × k] — same safe
    // outcome, per-slot instead of whole-value)
    val empty = spark.sql("SELECT array()::array<long> a")
      .select(MinHashSignature.minhashFromHashes($"a", 4).as("s"))
      .collect().head
    assert(empty.isNullAt(0))
  }

  test("unicode_normalize: NFC composes, NFKC folds compatibility forms, fast path intact") {
    import graft.functions.expressions.UnicodeNormalize
    val df = Seq(
      (1L, "cafe\u0301"),        // decomposed acute -> caf\u00e9 (4 chars)
      (2L, "already ascii"),      // fast path: returned as-is
      (3L, "\uFF11\uFF12")      // fullwidth digits -> "12" under NFKC only
    ).toDF("id", "s")
    val out = df.select($"id",
        UnicodeNormalize.nfc($"s").as("nfc"),
        UnicodeNormalize.nfkc($"s").as("nfkc"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1L)._1 == "caf\u00e9" && out(1L)._1.length == 4)
    assert(out(2L)._1 == "already ascii")
    assert(out(3L)._1 == "\uFF11\uFF12" && out(3L)._2 == "12")
    // SQL registration surfaces the same expression
    df.createOrReplaceTempView("un_t")
    val viaSql = spark.sql(
      "SELECT id, unicode_normalize(s, 'nfc') AS n FROM un_t ORDER BY id")
      .collect().map(_.getString(1))
    assert(viaSql(0) == "caf\u00e9")
  }
}
