package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Greedy modularity optimization over a weighted graph — the
  * OPTIMIZER half of q429's scorer (which evaluates a GIVEN
  * partition): Louvain-style local moves (Blondel et al. 2008)
  * under the fixed-round discipline of [[LabelPropagation]], never
  * until-fixpoint.
  *
  * Move rule per round (all relational, all deterministic):
  *   1. every node i computes the EXACT integer modularity gain of
  *      moving from its community a to each neighbor community b:
  *      with Q in q429's ordered-pair convention, ΔQ · m2²/2 =
  *      G = (w(i,b) − w(i,a∖i))·m2 − k_i·(D_b − D_a + k_i) — pure
  *      Long arithmetic off integer edge weights, so the argmax is
  *      float-free (at masses where these products could pass 2^63
  *      the q429 DECIMAL(38,0) note applies verbatim);
  *   2. per node, the best positive move under the total order
  *      (G desc, b asc);
  *   3. LOCALLY-DOMINANT selection (the Manne–Bisseling parallel
  *      matching rule): a move survives only if it out-ranks — under
  *      the global order (G desc, i asc, b asc) — every other
  *      candidate move touching either of its two communities.
  *      Surviving moves therefore touch pairwise-DISJOINT community
  *      sets, and disjoint single-node moves have exactly ADDITIVE
  *      ΔQ (each move's w(i,·) and D_· terms are untouched by the
  *      others), so the round's total Q change is a sum of positive
  *      exact gains: Q is NON-DECREASING by construction — the
  *      property a free-for-all parallel Louvain round cannot
  *      guarantee (two simultaneous movers into each other's
  *      communities can oscillate);
  *   4. apply the survivors, localCheckpoint (cut the per-round
  *      lineage exactly as the other iterative graph operators).
  *
  * The globally best move always survives rule 3, so progress is
  * made whenever any positive move exists; fixed `rounds` bounds the
  * work (a round with no positive move is the identity). 100 TB
  * shape: each round is two hash-aggregates (D_c, w(i,c)), a handful
  * of equi-joins, and two window ranks — no collect, no all-pairs;
  * convergence speed scales with how many disjoint community pairs
  * improve per round (many, on a large graph).
  *
  * Reference scope: the reference repo has no graph operators at all
  * (SURVEY.md §2.9); this extends the graph family (components,
  * PageRank, HITS, label propagation, q429/q430 diagnostics).
  */
object Louvain {

  /** Materialize AND reset plan statistics. localCheckpoint alone cuts
    * the lineage but PROPAGATES the checkpointed plan's sizeInBytes —
    * and a loop whose state frame appears ~6 times per round makes
    * that estimate a PRODUCT of products: the BigInt's digit count
    * grows ~6× per round and Catalyst stats evaluation itself becomes
    * the bottleneck (observed: minutes inside BigInteger.multiply by
    * round 8 — the stats, not the data). Rebuilding from the
    * checkpointed RDD resets the leaf to the constant
    * defaultSizeInBytes, so every round plans against bounded stats.
    * Cost: one InternalRow↔Row conversion over the NODE frame (not
    * the edges) per round. */
  private def cutStats(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }

  /** Communities after `rounds` of locally-dominant moves.
    *
    * `edges`: ORDERED-pair weights (srcCol, dstCol, wCol) with BOTH
    * directions present (q429's symmetrized-count convention — build
    * it once, reuse for scoring). Self-loops are handled (they arise
    * on [[contract]]ed graphs: a supernode's internal mass rides as
    * w(i,i), counts toward its degree, and is EXCLUDED from the
    * move-gain's own-community term — it moves with the node and
    * cancels in ΔQ). Initial communities are the node ids.
    * Output: (id, community).
    *
    * @param gammaNum,gammaDen Reichardt–Bornholdt resolution γ as an
    *   EXACT RATIONAL (default 1/1 = classic modularity): the gain
    *   generalizes to G = den·(w_ib − w_ia)·m2 − num·k_i·(D_b − D_a +
    *   k_i) — multiplying through by den keeps every term a Long, so
    *   the argmax stays float-free at any γ. Larger γ penalizes
    *   degree mass harder → finer communities (γ→∞ leaves every node
    *   a singleton: no positive move exists); smaller γ → coarser. */
  def cluster(edges: DataFrame, srcCol: String, dstCol: String,
              wCol: String, rounds: Int,
              gammaNum: Long = 1L, gammaDen: Long = 1L): DataFrame = {
    require(gammaNum > 0 && gammaDen > 0, "γ must be a positive rational")
    val e = edges.select(col(srcCol).as("i"), col(dstCol).as("j"),
      col(wCol).cast("long").as("w"))
    // static per-node degree mass and total weight (moves never
    // change either) — computed once, reused every round; the
    // self-loop mass (contracted graphs) is likewise static
    val deg = e.groupBy("i").agg(sum("w").as("k")).localCheckpoint()
    val selfw = e.filter(col("i") === col("j"))
      .select(col("i"), col("w").as("wself")).localCheckpoint()
    val m2 = deg.agg(sum("k").as("m2"))
    var comm = cutStats(deg.select(col("i"), col("i").as("c")))
    var converged = false
    for (_ <- 0 until rounds if !converged) {
      val dc = comm.join(deg, "i").groupBy("c").agg(sum("k").as("d"))
      // w(i, community-of-j): one aggregate over the edge list
      val wic = e.join(comm.select(col("i").as("__j"), col("c").as("b")),
          col("j") === col("__j"))
        .groupBy("i", "b").agg(sum("w").as("wib"))
        .localCheckpoint() // feeds the candidate join AND the own-side lookup
      val cand = wic
        .join(comm, "i").filter(col("c") =!= col("b"))
        // own-community weight keyed on (i, c): null when i has no
        // within-community edges
        .join(wic.select(col("i"), col("b").as("c"), col("wib").as("wia")),
          Seq("i", "c"), "left")
        // own-community weight EXCLUDES the node's self-loop (it moves
        // with the node, so it must not count as mass left behind)
        .join(selfw, Seq("i"), "left")
        .withColumn("wia",
          coalesce(col("wia"), lit(0L)) - coalesce(col("wself"), lit(0L)))
        .join(deg, "i")
        .join(dc.select(col("c").as("__b2"), col("d").as("db")),
          col("b") === col("__b2"))
        .join(dc.select(col("c").as("__c2"), col("d").as("da")),
          col("c") === col("__c2"))
        .crossJoin(broadcast(m2))
        .select(col("i"), col("c").as("a"), col("b"),
          (lit(gammaDen) * (col("wib") - col("wia")) * col("m2") -
            lit(gammaNum) * col("k") *
              (col("db") - col("da") + col("k"))).as("g"))
        .filter(col("g") > 0)
      val wBest = Window.partitionBy("i").orderBy(col("g").desc, col("b"))
      val best = cand.withColumn("__rb", row_number().over(wBest))
        .filter(col("__rb") === 1).drop("__rb")
      // global priority as a comparable struct (−g, i, b) — min per
      // touched community replaces a global row_number, so there is
      // NO single-partition sort anywhere in the round
      val ranked = best
        .withColumn("pri", struct((-col("g")).as("ng"), col("i"), col("b")))
        .localCheckpoint() // feeds the touched-community min AND the filter
      // EARLY EXIT, identity-preserving: no positive-gain candidate
      // means no move this round — and since the state is unchanged,
      // none in any later round either; the remaining fixed rounds
      // are identities (the unrolled oracle replays them as such, so
      // results are byte-identical with or without the exit). One
      // cheap isEmpty on the already-materialized candidate frame.
      if (ranked.isEmpty) converged = true
      else {
        val tmin = ranked
        .select(col("pri"), explode(array(col("a"), col("b"))).as("tc"))
        .groupBy("tc").agg(min("pri").as("mn"))
        val movers = ranked
          .join(tmin.select(col("tc").as("a"), col("mn").as("mna")), Seq("a"))
          .join(tmin.select(col("tc").as("b"), col("mn").as("mnb")), Seq("b"))
          .filter(col("pri") === col("mna") && col("pri") === col("mnb"))
          .select(col("i"), col("b"))
        comm = cutStats(
          comm.join(movers.select(col("i"), col("b")), Seq("i"), "left")
            .select(col("i"), coalesce(col("b"), col("c")).as("c")))
      }
    }
    comm.select(col("i").as("id"), col("c").as("community"))
  }

  /** Phase 2 of Blondel et al.: CONTRACT each community to a
    * supernode — edge mass re-keyed by community on both endpoints,
    * so within-community mass becomes the supernode's self-loop.
    * Modularity of a partition of the contracted graph equals
    * modularity of its projection onto the original graph (the
    * classic Louvain invariant), which is what makes further moves on
    * the contracted graph legitimate Q improvements. One double join
    * + hash-agg; the contracted graph is communities², bounded by the
    * current community count, not the corpus. */
  def contract(edges: DataFrame, srcCol: String, dstCol: String,
               wCol: String, comm: DataFrame): DataFrame = {
    val e = edges.select(col(srcCol).as("i"), col(dstCol).as("j"),
      col(wCol).cast("long").as("w"))
    e.join(comm.select(col("id").as("i"), col("community").as("ci")),
        Seq("i"))
      .join(comm.select(col("id").as("j"), col("community").as("cj")),
        Seq("j"))
      .groupBy(col("ci").as("i"), col("cj").as("j"))
      .agg(sum("w").as("w"))
  }

  /** FULL Louvain: `levels` alternations of local-move rounds and
    * contraction, final labels projected back through every level.
    * Q is non-decreasing across the whole schedule: within a level by
    * the locally-dominant rule, and across the contraction boundary
    * because contracted-graph moves improve the PROJECTED partition's
    * Q by the [[contract]] invariant (a level with no positive move
    * is the identity). Output: (id, community) on the ORIGINAL ids. */
  def clusterLevels(edges: DataFrame, srcCol: String, dstCol: String,
                    wCol: String, rounds: Int, levels: Int): DataFrame = {
    require(levels >= 1)
    var e = edges.select(col(srcCol).as("i"), col(dstCol).as("j"),
      col(wCol).cast("long").as("w"))
    var mapping: DataFrame = null
    for (l <- 0 until levels) {
      val comm = cluster(e, "i", "j", "w", rounds)
      mapping =
        if (mapping == null) cutStats(comm)
        else cutStats(mapping
          .select(col("id"), col("community").as("__mid"))
          .join(comm.select(col("id").as("__mid"),
            col("community")), Seq("__mid"))
          .select(col("id"), col("community")))
      if (l < levels - 1)
        e = cutStats(contract(e, "i", "j", "w", comm))
    }
    mapping
  }

  /** The TRUE LEIDEN schedule (Traag et al. 2019, Alg. 1): per level,
    * local moves → [[refine]] → contract the REFINED partition —
    * refinement sits BETWEEN the move and contraction phases, so the
    * aggregated graph's supernodes are guaranteed-connected fragments
    * ([[clusterLevels]] contracts the unrefined partition instead,
    * which can bake a disconnected community into one supernode that
    * no later level can split). Q is non-decreasing across the whole
    * schedule: moves by the locally-dominant rule, refinement by the
    * Σ D_c² argument on [[refine]], contraction by the projection
    * invariant on [[contract]]. Fragments of a refined community start
    * the next level as singleton supernodes; positive-gain moves
    * re-merge the ones that belong together (on a connected community
    * the schedule degenerates to [[clusterLevels]] exactly). Output:
    * (id, community) on the ORIGINAL ids, labels = refined fragment
    * mins of the last level projected down. */
  def clusterLevelsRefined(edges: DataFrame, srcCol: String, dstCol: String,
                           wCol: String, rounds: Int, levels: Int)
      : DataFrame = {
    require(levels >= 1)
    var e = edges.select(col(srcCol).as("i"), col(dstCol).as("j"),
      col(wCol).cast("long").as("w"))
    var mapping: DataFrame = null
    for (l <- 0 until levels) {
      val moved = cluster(e, "i", "j", "w", rounds)
      val comm = refine(e, "i", "j", moved)
      mapping =
        if (mapping == null) cutStats(comm)
        else cutStats(mapping
          .select(col("id"), col("community").as("__mid"))
          .join(comm.select(col("id").as("__mid"),
            col("community")), Seq("__mid"))
          .select(col("id"), col("community")))
      if (l < levels - 1)
        e = cutStats(contract(e, "i", "j", "w", comm))
    }
    mapping
  }

  /** LEIDEN-STYLE connectivity refinement (the fix for Traag et al.
    * 2019's defect report on Louvain: a bridge node can move away and
    * strand its old community in pieces that keep one label — the
    * stranded members' only neighbor community is then their OWN, so
    * no local move can ever heal it). Per final community, relabel
    * each connected FRAGMENT of the community-induced subgraph with
    * its min member id. One global [[ConnectedComponents]] pass over
    * the within-community edge set does all communities at once
    * (cross-community edges are filtered, so fragments of different
    * communities cannot link), and the min-id labels are globally
    * unique because fragments are disjoint node sets.
    *
    * Q never decreases: a split removes NO within-community edge mass
    * (fragments have zero edges between them by definition) while
    * Σ D_c² strictly drops whenever a community actually splits
    * ((d₁+d₂)² > d₁² + d₂² for positive degree masses) — so refined
    * Q is ≥ the input partition's Q, strictly greater iff some
    * community was internally disconnected. A connected community
    * comes back as one fragment (pure relabel to min member id).
    *
    * Input comm: (id, community); output: (id, community) with
    * fragment labels — a drop-in replacement for [[cluster]]'s
    * output. Members with no within-community edge (isolated in
    * their community) become their own singleton. */
  def refine(edges: DataFrame, srcCol: String, dstCol: String,
             comm: DataFrame): DataFrame = {
    val e = edges.select(col(srcCol).as("i"), col(dstCol).as("j"))
      .filter(col("i") =!= col("j"))
    val within = e
      .join(comm.select(col("id").as("i"), col("community").as("__ci")),
        Seq("i"))
      .join(comm.select(col("id").as("j"), col("community").as("__cj")),
        Seq("j"))
      .filter(col("__ci") === col("__cj"))
      .select("i", "j")
    val cc = ConnectedComponents.components(within, "i", "j")
    comm.select(col("id"))
      .join(cc.select(col("id"), col("component")), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("component"), col("id")).as("community"))
  }

  /** q429's exact scorer for an arbitrary partition of the same
    * ordered-pair graph: Q = w_in/m2 − Σ_c D_c²/m2² with integer
    * masses and two fixed-order double divisions (the spec's monotone
    * and beats-the-region assertions evaluate THIS number). */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
                 wCol: String, comm: DataFrame): Double = {
    val e = edges.select(col(srcCol).as("i"), col(dstCol).as("j"),
      col(wCol).cast("long").as("w"))
    val cm = comm.select(col("id").as("__n"), col("community").as("__c"))
    val deg = e.groupBy("i").agg(sum("w").as("k"))
      .join(cm, col("i") === col("__n"))
    val dc = deg.groupBy("__c").agg(sum("k").as("d"))
    val win = e
      .join(cm.select(col("__n").as("i"), col("__c").as("ci")), Seq("i"))
      .join(cm.select(col("__n").as("j"), col("__c").as("cj")), Seq("j"))
      .filter(col("ci") === col("cj"))
      .agg(coalesce(sum("w"), lit(0L)).as("w_in"))
    val tot = dc.agg(sum("d").as("m2"),
      sum(col("d").cast("decimal(38,0)") * col("d").cast("decimal(38,0)"))
        .as("sd2"))
    win.crossJoin(tot)
      .select((col("w_in").cast("double") / col("m2") -
        col("sd2").cast("double") /
          (col("m2").cast("double") * col("m2"))).as("q"))
      .collect().head.getDouble(0)
  }
}
