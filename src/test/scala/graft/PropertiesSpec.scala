package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, forAllNoShrink}

import org.apache.spark.sql.functions._

import graft.functions.SasDate
import graft.operators.{Dedup, HashSampleQuantiles, KmvDistinct, Sessionize, SubstringDedup}

/** Property-based invariants (SURVEY.md §5 item 4). Each property runs
  * a batched DataFrame per sample (10 samples — Spark jobs aren't free)
  * with generator tolerances wide enough that the probabilistic MinHash
  * bound can't flake (5σ+ at k=64). */
object PropertiesSpec extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = GraftSession.local(4)
  import spark.implicits._

  property("sasDate roundtrip: fromDate(toDate(d)) == d over ±100y") =
    forAll(Gen.listOfN(50, Gen.choose(-36524, 36524))) { days =>
      val df = days.toDF("d")
        .select($"d", SasDate.fromDate(SasDate.toDate($"d")).as("rt"))
      df.filter($"d" =!= $"rt").count() == 0
    }

  property("sasDate toIsoString parses back to the same day") =
    forAll(Gen.listOfN(20, Gen.choose(0, 30000))) { days =>
      val df = days.toDF("d").select(
        $"d", datediff(to_date(SasDate.toIsoString($"d")),
                       to_date(lit("1960-01-01"))).as("back"))
      df.filter($"d" =!= $"back").count() == 0
    }

  property("cast fold int->double->int is identity on int-valued data") =
    forAll(Gen.listOfN(50, Gen.choose(-1000000, 1000000))) { xs =>
      val df = xs.toDF("x")
        .select($"x", $"x".cast("double").cast("int").as("rt"))
      df.filter($"x" =!= $"rt").count() == 0
    }

  private val wordGen = Gen.oneOf(
    "spark", "query", "table", "join", "scan", "sort", "merge", "row", "col")

  // No shrinking on the Spark-job-per-sample properties: a failure would
  // otherwise trigger hundreds of shrink re-runs, each a Spark pipeline.
  property("minhash estimate within 0.35 of exact jaccard when a candidate surfaces (k=64, >5 sigma)") =
    forAllNoShrink(Gen.listOfN(60, wordGen), Gen.listOfN(60, wordGen)) { (w1, w2) =>
      val t1 = w1.mkString(" "); val t2 = w2.mkString(" ")
      (t1.length < 5 || t2.length < 5) || {
        def shingles(t: String) =
          (0 to t.length - 5).map(i => t.substring(i, i + 5)).toSet
        val (s1, s2) = (shingles(t1), shingles(t2))
        val exact = s1.intersect(s2).size.toDouble / s1.union(s2).size
        val est = Dedup.minhashDedup(
            Seq((1L, t1), (2L, t2)).toDF("doc_id", "text"), "doc_id", "text",
            threshold = 0.0)
          .collect().headOption.map(_.getDouble(2))
        // absence is legitimate LSH non-recall (probabilistic) — the
        // recall floor lives in DedupSpec; HERE we pin estimate quality.
        est.forall(e => math.abs(e - exact) <= 0.35)
      }
    }

  property("TopK buffer algebra: any reduce/merge split == global sort-take") =
    forAllNoShrink(
      Gen.listOf(Gen.zip(Gen.choose(-1e6, 1e6), Gen.choose(0L, 50L))),
      Gen.choose(1, 6), Gen.choose(1, 5)) { (items, k, nChunks) =>
      // pure aggregator-contract test (no Spark job): fold each chunk
      // with reduce, combine buffers with merge in arbitrary order —
      // must equal the top-k of a full sort regardless of the split
      val agg = new graft.functions.TopK(k)
      val ord = Ordering.by[(Double, Long), (Double, Long)] { case (v, id) => (-v, id) }
      val chunks = items.grouped(math.max(1, items.length / nChunks)).toSeq
      val merged = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      agg.finish(merged) == items.sorted(ord).take(k)
    }

  property("as-of join == per-row latest-prior scan on random event times") =
    forAllNoShrink(
      Gen.listOfN(25, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 1000L))),
      Gen.listOfN(25, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 1000L)))) {
      (leftRaw, rightRaw) =>
        val base = 1700000000000L
        val left = leftRaw.zipWithIndex.map { case ((u, off), i) =>
          (u, i.toLong, new java.sql.Timestamp(base + off * 1000)) }
        // right timestamps made unique (+i ms): equal right times have
        // no deterministic winner in EITHER engine's as-of semantics
        val right = rightRaw.zipWithIndex.map { case ((u, off), i) =>
          (u, 1000L + i, new java.sql.Timestamp(base + off * 1000 + i)) }
        val out = graft.operators.AsOfJoin.backward(
            left.toDF("u", "lid", "t"), right.toDF("u", "rid", "t"),
            Seq("u"), "t", "t", Seq("rid"))
          .collect()
          .map(r => r.getLong(1) ->
            Option(r.getAs[java.lang.Long]("asof_rid")).map(_.toLong)).toMap
        left.forall { case (u, lid, lt) =>
          // expected: the rid of the latest right row at or before lt
          // for the same key (right times unique, so no tie ambiguity)
          val expect = right.filter(r => r._1 == u && !r._3.after(lt))
            .sortBy(_._3.getTime).lastOption.map(_._2)
          out(lid) == expect
        }
    }

  property("connected components == driver union-find on random graphs") =
    forAllNoShrink(Gen.listOf(
      Gen.zip(Gen.choose(0L, 40L), Gen.choose(0L, 40L)))) { edges =>
      edges.isEmpty || {
        // reference: plain union-find with min-id canonicalization
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val verts = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
        val want = verts.map(v => v -> find(v)).toMap
        val got = graft.operators.ConnectedComponents
          .components(edges.toDF("a", "b"), "a", "b", maxIters = 64)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == want
      }
    }

  property("shingle_minhash == charShingles∘minhash_signature on random unicode") =
    forAllNoShrink(Gen.listOfN(30, Gen.listOf(Gen.oneOf(
      "a", "bc", "é", "你", "—", " ", "\t", "🙂", "ß", "0")).map(_.mkString))) { texts =>
      import graft.functions.TextFunctions
      import graft.functions.expressions.MinHashSignature
      import graft.functions.expressions.ShingleMinHash.shingleMinhash
      // the pipelines' precondition (sub-shingle docs take the sentinel
      // path, pinned separately in DedupSpec)
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text").filter(length($"text") >= 5)
      df.select(
          shingleMinhash($"text", 5, 16).as("f"),
          MinHashSignature.minhashSignature(
            TextFunctions.charShingles($"text", 5), 16).as("c"))
        .filter(to_json($"f") =!= to_json($"c"))
        .count() == 0
    }

  property("text_simhash == simhash64∘tokens on random unicode + whitespace") =
    forAllNoShrink(Gen.listOfN(30, Gen.listOf(Gen.oneOf(
      "a", "bc", "é", "你", " ", "\t", "\n", "\r", "", "\f",
      "🙂", "ß", "0", "  ")).map(_.mkString))) { texts =>
      import graft.functions.TextFunctions
      import graft.functions.expressions.SimHash64.simhash64
      import graft.functions.expressions.TextSimHash.textSimhash
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
        .select(textSimhash($"text").as("f"),
                simhash64(TextFunctions.tokens($"text")).as("c"))
        .filter($"f" =!= $"c")
        .count() == 0
    }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  property("substring spans == brute-force k-gram interval union") =
    forAllNoShrink(
      Gen.listOfN(6, Gen.listOfN(20, Gen.oneOf("a", "b", "c", "d")))) { docs =>
      val k = 3
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      // driver-side reference: count every k-gram corpus-wide, mark
      // window starts whose gram count >= 2, union intervals by the
      // p2-p1<=k chain rule
      val toks = docs.map(_.toVector)
      val grams = toks.zipWithIndex.flatMap { case (t, d) =>
        (0 to t.length - k).map(p => (t.slice(p, p + k).mkString(" "), d, p))
      }
      val counts = grams.groupBy(_._1).map { case (g, v) => g -> v.size }
      val expected = grams.filter(g => counts(g._1) >= 2)
        .groupBy(_._2)
        .flatMap { case (d, gs) =>
          val ps = gs.map(_._3).sorted
          val spans = scala.collection.mutable.ListBuffer[(Int, Int)]()
          var start = ps.head; var prev = ps.head
          ps.tail.foreach { p =>
            if (p - prev <= k) prev = p
            else { spans += ((start, prev + k - 1)); start = p; prev = p }
          }
          spans += ((start, prev + k - 1))
          spans.map { case (s0, e0) => (d.toLong, s0, e0) }
        }.toSet
      val got = SubstringDedup.spans(df, "doc_id", "text", k)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      got == expected
    }

  property("bottomKSample == driver-side (md5,value) total-order cut") =
    forAllNoShrink(Gen.listOfN(40, Gen.choose(0, 10000))) { xs =>
      // keys repeat (i % 25) so the duplicate-key tiebreak is exercised
      val rows = xs.zipWithIndex.map { case (x, i) => (s"k${i % 25}", x.toDouble) }
      val got = HashSampleQuantiles
        .bottomKSample(rows.toDF("key", "x"), col("x"), col("key"), 10)
        .collect().map(_.getDouble(0)).sorted.toSeq
      val expected = rows.map { case (kk, v) => (md5hex(kk), v) }
        .sorted.take(10).map(_._2).sorted.toSeq
      got == expected
    }

  property("kmv estimate == driver replay of (k-1)/h(k); exact below k") =
    forAllNoShrink(Gen.listOfN(60, Gen.choose(0, 300))) { xs =>
      val k = 16
      val est = KmvDistinct
        .estimate(xs.map(("g", _)).toDF("g", "v"), "g", col("v"), k, "s")
        .collect().head.getDouble(2)
      val distinct = xs.distinct
      val expected =
        if (distinct.size < k) distinct.size.toDouble
        else {
          val hs = distinct.map(v =>
            java.lang.Long.parseLong(md5hex(s"$v-s").take(8), 16).toDouble
              / 4294967296.0).sorted
          (k - 1).toDouble / hs(k - 1)
        }
      est == expected
    }

  property("interleave_bits == driver bit placement for 1-4 dims") =
    forAllNoShrink(for {
      n    <- Gen.choose(1, 4)
      rows <- Gen.listOfN(20, Gen.listOfN(n, Gen.choose(0, Int.MaxValue)))
    } yield (n, rows)) { case (n, rows) =>
      val bits = 63 / n
      def ref(dims: Seq[Int]): Long = {
        var out = 0L
        for (i <- 0 until bits; d <- 0 until n)
          out |= ((dims(d).toLong >>> i) & 1L) << (i * n + d)
        out
      }
      val df = rows.map(r => Tuple1(r.toArray)).toDF("dims")
      val cols = (0 until n).map(i => element_at($"dims", i + 1))
      val got = df.select(graft.functions.expressions.InterleaveBits
          .interleaveBits(cols).as("z"))
        .collect().map(_.getLong(0)).toSeq
      got == rows.map(ref)
    }

  property("hits == driver power iteration on random graphs") =
    forAllNoShrink(Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0, 12), Gen.choose(0, 12)))) { rawEdges =>
      val edges = rawEdges.distinct.filter { case (a, b) => a != b }
      edges.isEmpty || {
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        val idx = nodes.zipWithIndex.toMap
        var auth = Array.fill(nodes.size)(1.0)
        var hub = Array.fill(nodes.size)(1.0)
        for (_ <- 1 to 3) {
          val a2 = Array.fill(nodes.size)(0.0)
          for ((s, d) <- edges) a2(idx(d)) += hub(idx(s))
          auth = a2.map(_ / a2.max)
          val h2 = Array.fill(nodes.size)(0.0)
          for ((s, d) <- edges) h2(idx(s)) += auth(idx(d))
          hub = h2.map(_ / h2.max)
        }
        val got = graft.operators.Hits.run(edges.toDF("src", "dst"), iters = 3)
          .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2)))
          .toMap
        nodes.forall { nd =>
          math.abs(got(nd)._1 - auth(idx(nd))) < 1e-9 &&
          math.abs(got(nd)._2 - hub(idx(nd))) < 1e-9
        }
      }
    }

  property("set-similarity join == brute-force jaccard over a tiny vocab") =
    forAllNoShrink(Gen.listOfN(8,
      Gen.listOfN(8, wordGen).map(_.mkString(" ")))) { texts =>
      val tau = 0.5
      val k = 3
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      def shingles(text: String): Set[String] = {
        val t = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
        if (t.length < k) Set.empty
        else t.sliding(k).map(_.mkString(" ")).toSet
      }
      val sh = docs.map { case (id, t) => id -> shingles(t) }
        .filter(_._2.nonEmpty)
      val want = (for {
        (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
        i = (sa intersect sb).size; u = (sa union sb).size
        if i.toDouble / u >= tau
      } yield (ia, ib)).toSet
      val got = graft.operators.SetSimilarityJoin
        .pairs(docs.toDF("doc_id", "text"), "doc_id", "text", k, tau)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got == want
    }

  property("hot-bucket cap: capped candidates are a subset of uncapped") =
    forAllNoShrink(Gen.listOfN(12, Gen.alphaLowerStr.suchThat(_.length >= 8)),
                   Gen.choose(2, 6)) { (texts, cap) =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, (t + " ") * 6) }
        .toDF("doc_id", "text")
      def pairs(mb: Int) = Dedup.minhashDedup(docs, "doc_id", "text",
          threshold = 0.1, maxBucket = mb)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      pairs(cap).subsetOf(pairs(Int.MaxValue))
    }

  property("minhashGate == self-join candidates restricted to new×old") =
    forAllNoShrink(Gen.listOfN(10, Gen.alphaLowerStr.suchThat(_.length >= 8))) { texts =>
      import graft.functions.expressions.ShingleMinHash.shingleMinhash
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, (t + " ") * 6) }
        .toDF("doc_id", "text")
      val sigs = docs.select($"doc_id", shingleMinhash($"text", 5, 32).as("sig"))
      val newS = sigs.filter($"doc_id" % 2 === 1)
      val oldS = sigs.filter($"doc_id" % 2 === 0)
      val gate = Dedup.minhashGate(newS, oldS, "doc_id", 32, 8, 0.2)
        .select("in_id", "idx_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val self = Dedup.minhashCandidates(sigs, "doc_id", 32, 8, 0.2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // self-join canonicalizes a<b; the gate flags new-vs-old in both
      // orientations — restrict and re-orient for comparison
      val want = self.collect {
        case (a, b) if a % 2 == 1 && b % 2 == 0 => (a, b)
        case (a, b) if b % 2 == 1 && a % 2 == 0 => (b, a)
      }
      gate == want
    }

  private val shortWordGen: Gen[String] =
    Gen.choose(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  property("BPE segmentation concatenates back to the original word") =
    forAllNoShrink(Gen.listOfN(8, shortWordGen)) { words =>
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val seg = graft.operators.BpeTrainer
        .segment(docs, "text", merges = 4, localThreshold = 1000L)
        .select("word", "segmented").collect()
      seg.forall(r => r.getString(1).replace(" ", "") == r.getString(0))
    }

  property("winnowing selections == driver window-min replay (ties via tiny vocab)") =
    forAllNoShrink(Gen.choose(7, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd")))) { words =>
      val (k, w) = (4, 4)
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val got = graft.operators.Winnowing
        .selections(docs, "doc_id", "text", k, w)
        .select("sel").collect().headOption
        .map(_.getSeq[Long](0).toSet).getOrElse(Set.empty[Long])
      // driver replay: md5-32 gram hashes, packed, per-window min
      val md = java.security.MessageDigest.getInstance("MD5")
      def h32(s: String): Long = {
        val hex = md.digest(s.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8)
        java.lang.Long.parseLong(hex, 16)
      }
      val grams = words.sliding(k).map(_.mkString(" ")).toVector
      val packed = grams.zipWithIndex.map { case (g, i) =>
        h32(g) * graft.operators.Winnowing.Shift +
          (graft.operators.Winnowing.Shift - (i + 1))
      }
      val expected =
        if (words.size < k + w - 1) Set.empty[Long]
        else packed.sliding(w).map(_.min).toSet
      got == expected
    }

  property("sessionize: session count per user == gap count + 1") =
    forAllNoShrink(Gen.listOfN(30, Gen.choose(0L, 100000L))) { offsets =>
      val base = 1700000000000L
      val evs = offsets.distinct.sorted.zipWithIndex.map { case (off, i) =>
        (1L, i.toLong, new java.sql.Timestamp(base + off * 1000))
      }
      evs.isEmpty || {
        val gapSec = 3600L
        val expected = 1 + evs.map(_._3.getTime).sliding(2)
          .count { case Seq(a, b) => b - a > gapSec * 1000; case _ => false }
        val got = Sessionize.sessionize(
            evs.toDF("user_id", "event_id", "ts"), "user_id", "ts", "event_id", gapSec)
          .agg(max("session_id")).collect().head.getLong(0)
        got == expected
      }
    }
}
