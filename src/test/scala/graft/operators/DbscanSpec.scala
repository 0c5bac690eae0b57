package graft.operators

import graft.GraftTestBase

class DbscanSpec extends GraftTestBase {
  import spark.implicits._

  private def run(pts: Seq[(Long, Double, Double)], eps: Double, minPts: Int) =
    Dbscan.cluster(pts.toDF("id", "x", "y"), "id", "x", "y", eps, minPts)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getLong(3))))
      .toMap

  test("planted blobs: cores, a border, and a noise point get exact roles") {
    // blob A (ids 0-3, pairwise <= 0.71), blob B (ids 4-6), a border
    // point reaching exactly one of A's cores (n_nb = 2 < minPts, so
    // not core), and an isolated noise point
    val pts = Seq(
      (0L, 0.0, 0.0), (1L, 0.5, 0.0), (2L, 0.0, 0.5), (3L, 0.5, 0.5),
      (4L, 10.0, 10.0), (5L, 10.5, 10.0), (6L, 10.0, 10.5),
      (7L, 1.4, 0.0),
      (8L, 20.0, 20.0))
    val m = run(pts, eps = 1.0, minPts = 3)
    assert((0L to 3L).forall(i => m(i)._2 == "core" && m(i)._3 == 0L))
    assert((4L to 6L).forall(i => m(i)._2 == "core" && m(i)._3 == 4L))
    assert(m(7L) == ((2L, "border", 0L))) // reaches core 1 only
    assert(m(8L) == ((1L, "noise", -1L)))
  }

  test("a density chain links into ONE cluster spanning far beyond eps") {
    // the arbitrary-shape case k-means cannot express: 11 collinear
    // points 0.5 apart chain transitively into one component whose
    // span (5.0) is 5x eps
    val pts = (0 to 10).map(i => (i.toLong, i * 0.5, 0.0))
    val m = run(pts, eps = 1.0, minPts = 3)
    assert(m.values.forall { case (_, role, cl) => role == "core" && cl == 0L })
  }

  test("grid blocking matches a brute-force DBSCAN on scattered points") {
    // deterministic pseudo-random scatter; brute force replayed with a
    // driver-side union-find — the blocked plan must agree exactly
    val pts = (0 until 120).map { i =>
      val h = i * 2654435761L
      (i.toLong, (h % 1000).toDouble / 100.0, ((h / 1000) % 1000).toDouble / 100.0)
    }
    val eps = 0.7; val minPts = 4
    val within = (for {
      (a, xa, ya) <- pts; (b, xb, yb) <- pts
      if a < b && (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) <= eps * eps
    } yield (a, b)).toSet
    val nNb = pts.map { case (id, _, _) =>
      id -> (1L + within.count { case (a, b) => a == id || b == id })
    }.toMap
    val cores = pts.map(_._1).filter(nNb(_) >= minPts).toSet
    val parent = scala.collection.mutable.Map(cores.map(c => c -> c).toSeq: _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    within.foreach { case (a, b) =>
      if (cores(a) && cores(b)) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
    }
    // canonical label = min id in component (find() roots are min-kept)
    val coreCl = cores.map(c => c -> find(c)).toMap
    val expected = pts.map { case (id, _, _) =>
      if (cores(id)) (id, (nNb(id), "core", coreCl(id)))
      else {
        val adjCores = within.collect {
          case (a, b) if a == id && cores(b) => coreCl(b)
          case (a, b) if b == id && cores(a) => coreCl(a)
        }
        if (adjCores.nonEmpty) (id, (nNb(id), "border", adjCores.min))
        else (id, (nNb(id), "noise", -1L))
      }
    }.toMap
    assert(run(pts, eps, minPts) == expected)
  }
}
