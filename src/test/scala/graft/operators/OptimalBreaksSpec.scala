package graft.operators

class OptimalBreaksSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("four well-separated blobs split exactly at the gaps") {
    val hist = new Array[Long](100)
    for (b <- Seq(5, 6, 7, 30, 31, 32, 60, 61, 62, 90, 91, 92); _ <- 1 to 10)
      hist(b) += 1
    val (bs, sse) = OptimalBreaks.breaks(hist, 4)
    // any break inside a gap separates the blobs; each blob then has
    // within-SSE 10*((−1)²+0²+1²)·(1/…) — variance of {-1,0,1} = 2/3
    assert(bs.length == 3 && bs.sliding(2).forall { case Seq(a, b) => a < b })
    assert(bs(0) >= 7 && bs(0) < 30)
    assert(bs(1) >= 32 && bs(1) < 60)
    assert(bs(2) >= 62 && bs(2) < 90)
    assert(math.abs(sse - 4 * 20.0) < 1e-9) // 30·var = 30·(2/3) per blob
  }

  test("a uniform histogram splits into four equal quarters") {
    val hist = Array.fill(100)(7L)
    val (bs, _) = OptimalBreaks.breaks(hist, 4)
    assert(bs == Seq(24, 49, 74))
  }

  test("sparse histograms with empty edge bins do not crash or emit -1 breaks") {
    // regression: mass only at the extremes once crashed the backtrack
    // (degenerate empty-prefix DP states); every segment must span >= 1
    // bin, matching the SQL oracle's join-induced domain
    val h1 = new Array[Long](100); h1(0) = 5; h1(99) = 3
    val (bs1, sse1) = OptimalBreaks.breaks(h1, 4)
    assert(bs1.forall(_ >= 0) && bs1 == bs1.sorted && bs1.distinct == bs1)
    assert(sse1 == 0.0) // two point masses split perfectly by 4 tiers
    val h2 = new Array[Long](100); h2(0) = 4; h2(50) = 2; h2(99) = 1
    val (bs2, _) = OptimalBreaks.breaks(h2, 4)
    assert(bs2.forall(_ >= 0) && bs2 == bs2.sorted && bs2.distinct == bs2)
  }

  test("matches a brute-force search on a small random-ish histogram") {
    val hist = Array.tabulate(12)(i => ((i * 2654435761L) % 9 + 1))
    val (bs, sse) = OptimalBreaks.breaks(hist, 3)
    def segCost(lo: Int, hi: Int): Double = {
      val n = (lo to hi).map(hist).sum
      if (n == 0) 0.0
      else {
        val s = (lo to hi).map(i => hist(i) * i).sum
        val q = (lo to hi).map(i => hist(i) * i.toLong * i).sum
        q.toDouble - (s * s).toDouble / n.toDouble
      }
    }
    val best = (for {
      a <- 0 until 11; b <- a + 1 until 11
    } yield (Seq(a, b), segCost(0, a) + segCost(a + 1, b) + segCost(b + 1, 11)))
      .minBy(x => (x._2, x._1(0), x._1(1)))
    assert(math.abs(sse - best._2) < 1e-9)
    assert(bs == best._1)
  }
}
