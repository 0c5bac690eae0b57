package graft.queries

import graft.{GraftTestBase, SparkEntry}

/** Invariant checks for the round-8 closers (value-level correctness is
  * the DuckDB oracle gate; these pin the semantic contracts). */
class Round8ClosersSpec extends GraftTestBase {

  for (q <- Seq("q415_dbscan", "q421_corpus_map"))
    test(s"$q: noise has cluster -1, clusters are led by a core min id") {
      val rows = SparkEntry.queries(q)(spark, sf001).collect()
      val byRole = rows.groupBy(_.getAs[String]("role"))
      assert(byRole.keySet.subsetOf(Set("core", "border", "noise")))
      assert(byRole("noise").forall(_.getAs[Long]("cluster") == -1L))
      // every non-noise cluster label is the min vec_id of a CORE member
      val coreByCluster = byRole("core").groupBy(_.getAs[Long]("cluster"))
      coreByCluster.foreach { case (cl, members) =>
        assert(members.map(_.getAs[Long]("vec_id")).min == cl)
      }
      // border clusters always point at an existing core cluster
      assert(byRole("border").forall(r =>
        coreByCluster.contains(r.getAs[Long]("cluster"))))
    }

  test("q416 ROUGE-2: recall in (0, 1], clipped <= ref_total, bench ids on the 97 grid") {
    val rows = SparkEntry.queries("q416_rouge2_clip")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("bench_id") % 97 == 0)
      assert(r.getAs[Long]("doc_id") % 97 != 0)
      assert(r.getAs[Long]("clipped") <= r.getAs[Long]("ref_total"))
      val rec = r.getAs[Double]("rouge2")
      assert(rec > 0.0 && rec <= 1.0)
    }
  }

  test("q419 PCA outliers: residual bounded by centered sum-of-squares") {
    val rows = SparkEntry.queries("q419_pca_outliers")(spark, sf001).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val ss = r.getAs[Double]("centered_ss")
      val resid = r.getAs[Double]("residual")
      val frac = r.getAs[Double]("resid_frac")
      assert(resid >= 0.0 && resid <= ss + 1e-9)
      assert(frac >= 0.0 && frac <= 1.0)
    }
  }

  test("q428 TextRank: 20 ranked keywords, no stopwords, positive mass") {
    val rows = SparkEntry.queries("q428_textrank")(spark, sf001).collect()
    assert(rows.length == 20)
    val stop = Set("the", "a", "of", "to", "and")
    val ranks = rows.map(_.getAs[Double]("rank"))
    rows.foreach { r =>
      val w = r.getAs[String]("word")
      assert(w.length >= 3 && !stop(w))
    }
    assert(ranks.forall(_ > 0.0))
    assert(ranks.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("q429 modularity: Q within [-0.5, 1], within-weight bounded by degree mass") {
    val rows = SparkEntry.queries("q429_modularity")(spark, sf001).collect()
    assert(rows.length == 5)
    val q = rows.map(_.getAs[Double]("modularity")).distinct
    assert(q.length == 1 && q.head >= -0.5 && q.head <= 1.0)
    rows.foreach { r =>
      assert(r.getAs[Long]("within_weight") <= r.getAs[Long]("degree_mass"))
    }
  }

  test("q430 assortativity: r within [-1, 1] on a non-empty near-dup graph") {
    val r = SparkEntry.queries("q430_assortativity")(spark, sf001)
      .collect().head
    assert(r.getAs[Long]("n_nodes") > 0 && r.getAs[Long]("n_edges") > 0)
    val a = r.getAs[Double]("assortativity")
    assert(a >= -1.0 && a <= 1.0)
  }

  test("q431 Mann-Kendall: S bounded by pair count, trend call matches z") {
    val rows = SparkEntry.queries("q431_mann_kendall")(spark, sf001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_days")
      val s = r.getAs[Long]("s")
      assert(math.abs(s) <= n * (n - 1) / 2)
      // z is the 6-dp ROUNDED column while the trend call used the
      // unrounded value — leave a rounding-width dead band at the
      // 1.96 boundaries instead of an exact iff
      val z = r.getAs[Double]("z")
      val t = r.getAs[String]("trend")
      if (z > 1.96 + 1e-6) assert(t == "increasing")
      if (z < -1.96 - 1e-6) assert(t == "decreasing")
      if (math.abs(z) < 1.96 - 1e-6) assert(t == "no_trend")
    }
  }

  test("q433 seasonal MK: stratified S bounded by within-stratum pair count") {
    val rows = SparkEntry.queries("q433_seasonal_mk")(spark, sf001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_days")
      // 7 strata of ~n/7 days each bound |S'| well below plain MK's nC2
      val bound = 7L * (n / 7 + 1) * (n / 7) / 2
      assert(math.abs(r.getAs[Long]("s")) <= bound)
      assert(r.getAs[Double]("variance") > 0.0)
    }
  }

  test("q432 Theil-Sen: the fitted line roughly centers the daily series") {
    import org.apache.spark.sql.functions._
    val fit = SparkEntry.queries("q432_theil_sen")(spark, sf001).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Double]("slope"), r.getAs[Double]("intercept")))).toMap
    val daily = graft.Tables(spark, sf001)("events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("c"))
      .withColumn("dn",
        datediff(col("day"), to_date(lit("1970-01-01"))).cast("double"))
      .collect().groupBy(_.getAs[String]("event_type"))
    daily.foreach { case (et, rows) =>
      val (sl, ic) = fit(et)
      val xs = rows.map(_.getAs[Double]("c")).sorted
      // robust-fit level at the mid-series CALENDAR coordinate (the
      // fit's x axis is epoch days, not observation ranks) stays
      // within the value range
      val dns = rows.map(_.getAs[Double]("dn")).sorted
      val mid = ic + sl * ((dns.head + dns.last) / 2.0)
      assert(mid >= xs.head - 1 && mid <= xs.last + 1,
        s"$et: mid-series fit $mid outside [${xs.head}, ${xs.last}]")
    }
  }

  test("q427 ARI: pair counts consistent and ari within [-1, 1]") {
    val r = SparkEntry.queries("q427_dbscan_ari")(spark, sf001).collect().head
    val n = r.getAs[Long]("n")
    val cn2 = n * (n - 1) / 2
    assert(r.getAs[Long]("pairs_both") <= r.getAs[Long]("pairs_cluster"))
    assert(r.getAs[Long]("pairs_both") <= r.getAs[Long]("pairs_label"))
    assert(r.getAs[Long]("pairs_cluster") <= cn2 &&
      r.getAs[Long]("pairs_label") <= cn2)
    val ari = r.getAs[Double]("ari")
    assert(ari >= -1.0 && ari <= 1.0)
  }

  test("q422 change point: reduction is a valid non-negative SSE fraction") {
    val rows = SparkEntry.queries("q422_change_point")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("reduction") >= 0.0)
      val f = r.getAs[Double]("reduction_frac")
      assert(f >= 0.0 && f <= 1.0)
      assert(r.getAs[Long]("n_days") >= 2)
    }
  }

  test("q423 UniMax: allocations are exact, within size, and sum to the budget") {
    val rows = SparkEntry.queries("q423_unimax_budget")(spark, sf001).collect()
    val budget = rows.head.getAs[Long]("budget")
    assert(rows.map(_.getAs[Long]("alloc")).sum == budget)
    rows.foreach { r =>
      val (n, a) = (r.getAs[Long]("n_chars"), r.getAs[Long]("alloc"))
      assert(a <= n && a >= 0)
      assert((r.getAs[Long]("capped") == 1L) == (a < n))
    }
    // the budget binds: at least one source is capped at 60%
    assert(rows.exists(_.getAs[Long]("capped") == 1L))
  }

  test("q424 quantile norm: buckets ordered, refs monotone, all docs covered") {
    val rows = SparkEntry.queries("q424_quantile_norm")(spark, sf001).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 500L)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("bucket"))
      // within a source, both the raw band and the normalized ref
      // must be non-decreasing in bucket order
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("z_hi") <= b.getAs[Double]("z_lo") + 1e-9)
          assert(a.getAs[Double]("norm_ref") <= b.getAs[Double]("norm_ref"))
        case _ =>
      }
    }
  }

  test("q425 Benford: digits 1-9, expected mass sums to n, chi2 constant") {
    val rows = SparkEntry.queries("q425_benford")(spark, sf001).collect()
    assert(rows.map(_.getAs[String]("digit")).toSeq ==
      (1 to 9).map(_.toString))
    val n = rows.map(_.getAs[Long]("observed")).sum
    val eSum = rows.map(_.getAs[Double]("expected")).sum
    assert(math.abs(eSum - n) < 0.01) // Benford probabilities sum to 1
    assert(rows.map(_.getAs[Double]("chi2")).distinct.length == 1)
  }

  test("q417 split leakage: cluster-hash split strands ZERO near-dup pairs") {
    val rows = SparkEntry.queries("q417_split_leakage")(spark, sf001).collect()
      .map(r => r.getAs[String]("scheme") ->
        ((r.getAs[Long]("n_train"), r.getAs[Long]("n_eval"),
          r.getAs[Long]("n_pairs"), r.getAs[Long]("n_leaked"))))
      .toMap
    val (trC, evC, nP, lkC) = rows("cluster_hash")
    val (trD, evD, nP2, lkD) = rows("doc_hash")
    assert(lkC == 0L, "cluster-hash split must never strand a near-dup pair")
    assert(nP == nP2 && nP > 0L)
    assert(trC + evC == trD + evD) // both schemes partition the corpus
    assert(lkD >= 0L)
  }
}
