package graft.operators

/** Optimal 1-D segmentation (Jenks natural breaks / 1-D k-means,
  * Fisher 1958): split a value distribution into K contiguous tiers
  * minimizing total within-tier SSE — the principled version of the
  * ad-hoc "quality tier" thresholds a curation pipeline otherwise
  * hard-codes, and the K-segment generalization of the q422 single
  * change point.
  *
  * Scale shape: the corpus collapses to a fixed-width INTEGER
  * histogram first (one hash-agg; 100 bins of counts is bounded model
  * state, the centroid precedent), and the exact O(bins²·K) dynamic
  * program runs driver-side. Binning loses within-bin detail, which
  * is the standard trade (Jenks on raw 100 TB rows is a non-starter;
  * on a histogram it is exact w.r.t. the binned values).
  *
  * Determinism (oracle contract): bin values are the INDICES, so all
  * prefix sums are exact integers; each segment cost is one double
  * division `(Σb)²/n` subtracted from an exact integer — the same
  * single IEEE op the SQL oracle's BIGINT arithmetic produces — and
  * ties in the argmin take the SMALLEST split index on both engines.
  */
object OptimalBreaks {

  /** @param hist counts per bin (bin value = index)
    * @param k    number of segments (tiers)
    * @return (break indices b1 < … < b(k-1) — segment t covers bins
    *         (b(t-1), b(t)], with b0 = -1 and b(k) = last — and the
    *         optimal total within-segment SSE). */
  def breaks(hist: Array[Long], k: Int): (Seq[Int], Double) = {
    val n = hist.length
    // prefix sums INCLUSIVE of bin i; index -1 handled via 0
    val cn = new Array[Long](n + 1); val cs = new Array[Long](n + 1)
    val cq = new Array[Long](n + 1)
    for (i <- 0 until n) {
      cn(i + 1) = cn(i) + hist(i)
      cs(i + 1) = cs(i) + hist(i) * i
      cq(i + 1) = cq(i) + hist(i) * i.toLong * i.toLong
    }
    // cost of bins (i+1 .. j); the squared sum is multiplied in DOUBLE
    // (ds can reach 99·N — Long would overflow past N ≈ 3e7 docs; the
    // oracle casts the same product to DOUBLE, and below 2⁵³ the
    // double math is still exact)
    def cost(i: Int, j: Int): Double = {
      val dn = cn(j + 1) - cn(i + 1)
      if (dn == 0) 0.0
      else {
        val ds = (cs(j + 1) - cs(i + 1)).toDouble
        (cq(j + 1) - cq(i + 1)).toDouble - ds * ds / dn.toDouble
      }
    }
    // dp(t)(j) = best cost of splitting bins 0..j into t segments of
    // >= 1 BIN each (defined only for j >= t-1 — the same domain the
    // SQL oracle's join chain induces, so degenerate empty-prefix
    // splits can neither win ties nor crash the backtrack);
    // bk(t)(j) = smallest argmin split (last segment = bk+1 .. j)
    var prev = Array.tabulate(n)(j => cost(-1, j))
    val back = Array.ofDim[Int](k + 1, n)
    for (t <- 2 to k) {
      val cur = Array.fill(n)(Double.MaxValue)
      for (j <- t - 1 until n) {
        var bestV = Double.MaxValue; var bestI = -1
        for (i <- t - 2 until j) {
          val v = prev(i) + cost(i, j)
          if (v < bestV) { bestV = v; bestI = i }
        }
        cur(j) = bestV
        back(t)(j) = bestI
      }
      prev = cur
    }
    val bs = new Array[Int](k - 1)
    var j = n - 1
    for (t <- k until 1 by -1) { bs(t - 2) = back(t)(j); j = back(t)(j) }
    (bs.toSeq, prev(n - 1))
  }
}
