package graft.queries

import org.apache.spark.sql.functions._

import graft.{GraftTestBase, SparkEntry}

/** Semantic invariants for the round-4 queries (value-level parity is
  * the DuckDB gate; these pin the behaviors the oracle can't see). */
class Round4Spec extends GraftTestBase {

  test("q111 gap-fill: prev/next purchase bracket the row in event time") {
    val df = SparkEntry.queries("q111_gap_fill")(spark, sf001)
    // the purchase rows themselves: prev must be a DIFFERENT earlier row's
    // value (lag ignoreNulls skips the current row by construction)
    val e = graft.Tables(spark, sf001)("events")
    // fresh-alias projections: Tables caches the plan, so both sides of
    // this self-join would otherwise share attribute ids
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_uid"), col("ts").as("p_ts"),
              round(col("value"), 2).as("p_v"))
    // for every event with a prev_purchase, some strictly-earlier purchase
    // by the same user carries exactly that value
    val withPrev = df.filter(col("prev_purchase").isNotNull)
      .join(e.select(col("event_id").as("event_id"), col("user_id").as("u"),
                     col("ts").as("t")), "event_id")
    val bad = withPrev.join(purchases,
        col("u") === col("p_uid") &&
        col("p_ts") < col("t") &&
        col("p_v") === col("prev_purchase"), "left_anti")
    assert(bad.count() == 0)
  }

  test("q113 canonicalization: no tracking params, ports, fragments, or www") {
    val urls = SparkEntry.queries("q113_url_domains")(spark, sf001)
      .select("url").collect().map(_.getString(0))
    assert(urls.nonEmpty)
    urls.foreach { u =>
      assert(u.startsWith("https://src"), u)
      assert(!u.contains("utm_") && !u.contains("#") && !u.contains(":443"), u)
      assert(!u.contains("www.") && u.contains("?id="), u)
      assert(u == u.toLowerCase, u)
    }
    // cap: at most 10 docs per host
    val caps = SparkEntry.queries("q113_url_domains")(spark, sf001)
      .groupBy("host").count().collect()
    assert(caps.forall(_.getAs[Long]("count") <= 10))
  }

  test("q114 chunking: strides cover every token exactly once at stride boundaries") {
    val d = graft.Tables(spark, sf001)("documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    val ch = SparkEntry.queries("q114_chunking")(spark, sf001)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), max(col("chunk_idx")).as("last_idx"),
           min(col("n_tok")).as("min_tok"), max(col("n_tok")).as("max_tok"))
    val joined = ch.join(d, "doc_id").collect()
    joined.foreach { r =>
      val (n, nChunks) = (r.getAs[Int]("n"), r.getAs[Long]("n_chunks"))
      // starts at 1, 49, 97... → number of chunks = ceil(n / 48) for n >= 1
      assert(nChunks == (n + 47) / 48, s"doc ${r.get(0)}: n=$n chunks=$nChunks")
      assert(r.getAs[Int]("max_tok") <= 64)
      assert(r.getAs[Int]("last_idx").toLong == nChunks - 1)
    }
  }

  test("q115 quantization: q_max bounded by 127 and norm positive") {
    val rows = SparkEntry.queries("q115_vec_quantize")(spark, sf001).collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("q_max") <= 127 && r.getAs[Int]("q_max") >= -127)
      assert(r.getAs[Double]("l2_norm") > 0.0)
      // max-abs scaling means SOME element hits ±127
      assert(r.getAs[Int]("q_nnz") >= 1)
    }
  }

  test("q116 CMS estimates are exact on low-cardinality keys") {
    val est = SparkEntry.queries("q116_cms_probe")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.Tables(spark, sf001)("events")
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == exact)
  }

  test("q112 repetition fractions are valid fractions") {
    val rows = SparkEntry.queries("q112_gopher_repetition")(spark, sf001).collect()
    rows.foreach { r =>
      val (dup, top) = (r.getAs[Double]("avg_dup_frac"), r.getAs[Double]("avg_top_frac"))
      assert(dup >= 0.0 && dup <= 1.0 && top > 0.0 && top <= 1.0)
    }
  }
}
