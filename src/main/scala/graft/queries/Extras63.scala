package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions

/** Round-8 pack, part 6: embedding-training data mining — hard-negative
  * triplet mining (q400), margin-based bitext mining (q401), and the
  * cluster-respecting train/test split audit (q402).
  */
object Extras63 extends QueryPack {

  private val Dim = 64
  import OracleVec.{cosSql, dotSql, normSql}

  // --------------------------------------------------------------- q400
  /** Hard-negative TRIPLET mining (the FaceNet/SBERT training-data
    * shape): per anchor, the top-1 same-label neighbor (positive) and
    * the top-1 other-label neighbor (hardest negative) by cosine, the
    * triplet margin, and the margin-violation flag that selects which
    * triplets are worth training on. 100 TB shape: anchors broadcast
    * (bounded query set), the corpus streams map-side through the
    * scored join, and each ranking is one partitioned window — at full
    * corpus-as-anchors scale the scored join becomes the SRP-blocked
    * candidate path (q367) with identical downstream ranking. Ranks
    * are decided on RAW cosines (deterministic IEEE folds, id
    * tie-break); rounding happens only in the output projection. */
  private def q400(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir)("embeddings")
    val anchors = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("anchor_id"), col("label").as("a_label"),
        col("embedding").as("av"))
    val scored = emb.join(broadcast(anchors), col("vec_id") =!= col("anchor_id"))
      .select(col("anchor_id"), col("a_label"),
        col("vec_id").as("cand_id"), col("label").as("c_label"),
        VectorFunctions.cosine(col("av"), col("embedding")).as("c"))
    val w = Window.partitionBy("anchor_id")
      .orderBy(col("c").desc, col("cand_id"))
    val pos = scored.filter(col("c_label") === col("a_label"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("anchor_id"), col("a_label").as("label"),
        col("cand_id").as("pos_id"), col("c").as("pc"))
    val neg = scored.filter(col("c_label") =!= col("a_label"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("anchor_id"), col("cand_id").as("neg_id"), col("c").as("nc"))
    pos.join(neg, Seq("anchor_id"))
      .select(col("anchor_id"), col("label"),
        col("pos_id"), round(col("pc"), 6).as("pos_cos"),
        col("neg_id"), round(col("nc"), 6).as("neg_cos"),
        round(col("pc") - col("nc"), 6).as("margin"),
        when(col("nc") > col("pc"), 1L).otherwise(0L).as("is_hard"))
      .orderBy("anchor_id")
  }

  private val q400Sql =
    s"""WITH a AS (
         SELECT vec_id AS anchor_id, label AS a_label, embedding AS av
         FROM embeddings WHERE vec_id < 20),
       scored AS MATERIALIZED (
         SELECT a.anchor_id, a.a_label, e.vec_id AS cand_id,
                e.label AS c_label, ${cosSql("a.av", "e.embedding")} AS c
         FROM a JOIN embeddings e ON e.vec_id <> a.anchor_id),
       pos AS (
         SELECT anchor_id, a_label AS label, cand_id AS pos_id, c AS pc
         FROM (
           SELECT *, row_number() OVER (PARTITION BY anchor_id
                       ORDER BY c DESC, cand_id) AS rn
           FROM scored WHERE c_label = a_label)
         WHERE rn = 1),
       neg AS (
         SELECT anchor_id, cand_id AS neg_id, c AS nc
         FROM (
           SELECT *, row_number() OVER (PARTITION BY anchor_id
                       ORDER BY c DESC, cand_id) AS rn
           FROM scored WHERE c_label <> a_label)
         WHERE rn = 1)
       SELECT pos.anchor_id, label, pos_id, round(pc, 6) AS pos_cos,
              neg_id, round(nc, 6) AS neg_cos,
              round(pc - nc, 6) AS margin,
              CAST(CASE WHEN nc > pc THEN 1 ELSE 0 END AS BIGINT) AS is_hard
       FROM pos JOIN neg ON neg.anchor_id = pos.anchor_id
       ORDER BY pos.anchor_id"""

  // --------------------------------------------------------------- q401
  /** Margin-based BITEXT mining (Artetxe & Schwenk, ACL 2019): treat
    * label 0 as the source collection and label 1 as the target; for
    * every source vector pick the target maximizing the RATIO margin
    * cos(x,y) / ((avg₄(x→T) + avg₄(y→S)) / 2) — the normalization that
    * beats raw cosine because hub vectors with uniformly high
    * similarity get discounted by their own k-NN average. The k-NN
    * averages use k=4 cosines summed in EXPLICIT rank order
    * (c1+c2+c3+c4 via a conditional-aggregation pivot), so no
    * float-summation order can diverge between engines. 100 TB shape:
    * one S×T scored join (blocked by the SRP band index at full scale,
    * exactly as q382), two window ranks over it, and a pivot aggregate
    * per side; the matrix never materializes more than its scored
    * rows. */
  /** The rn=1 argmax-margin relation q401 projects and q408 audits —
    * shared so the audit never drags q401's output-only global sort
    * and round() projections into its plan. Columns: (src_id, tgt_id,
    * c, ax, ay, m). */
  private def bitextBest(s: SparkSession, dir: String): DataFrame = {
    val K = 4
    val emb = Tables(s, dir)("embeddings")
    // Spread-guarded (guide §2.5): the S×T cosine matrix streams the
    // src side through a nested-loop join — on a single-row-group scan
    // that is ONE task computing every cosine; a no-op on well-split
    // input. Results are partitioning-invariant (ranked windows with
    // full tie-breaks).
    val src = graft.operators.Spread.byKey(
        emb.filter(col("label") === 0)
          .select(col("vec_id").as("src_id"), col("embedding").as("sv")),
        col("src_id"))
    val tgt = emb.filter(col("label") === 1)
      .select(col("vec_id").as("tgt_id"), col("embedding").as("tv"))
    val cos = src.join(tgt)
      .select(col("src_id"), col("tgt_id"),
        VectorFunctions.cosine(col("sv"), col("tv")).as("c"))
    def knnAvg(part: String, order: String, out: String): DataFrame = {
      val w = Window.partitionBy(part).orderBy(col("c").desc, col(order))
      val ranked = cos.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= K)
      def cAt(i: Int): Column = max(when(col("rk") === i, col("c")))
      ranked.groupBy(part)
        .agg(((cAt(1) + cAt(2) + cAt(3) + cAt(4)) / K).as(out))
    }
    val ax = knnAvg("src_id", "tgt_id", "ax")
    val ay = knnAvg("tgt_id", "src_id", "ay")
    val margins = cos.join(ax, Seq("src_id")).join(ay, Seq("tgt_id"))
      .withColumn("m", col("c") / ((col("ax") + col("ay")) / 2))
    val w = Window.partitionBy("src_id").orderBy(col("m").desc, col("tgt_id"))
    margins.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
  }

  private def q401(s: SparkSession, dir: String): DataFrame =
    bitextBest(s, dir)
      .select(col("src_id"), col("tgt_id"),
        round(col("c"), 6).as("cos"),
        round(col("ax"), 6).as("src_knn_avg"),
        round(col("ay"), 6).as("tgt_knn_avg"),
        round(col("m"), 6).as("margin"))
      .orderBy("src_id")

  private val q401Sql = {
    val K = 4
    def pivot =
      (1 to K).map(i => s"max(CASE WHEN rk = $i THEN c END)").mkString(" + ")
    s"""WITH s AS (SELECT vec_id AS src_id, embedding AS sv
                   FROM embeddings WHERE label = 0),
       t AS (SELECT vec_id AS tgt_id, embedding AS tv
             FROM embeddings WHERE label = 1),
       cos AS MATERIALIZED (
         SELECT src_id, tgt_id, ${cosSql("s.sv", "t.tv")} AS c
         FROM s CROSS JOIN t),
       rs AS (SELECT src_id, tgt_id, c,
                row_number() OVER (PARTITION BY src_id
                  ORDER BY c DESC, tgt_id) AS rk FROM cos),
       ax AS (SELECT src_id, ($pivot) / $K AS ax
              FROM rs WHERE rk <= $K GROUP BY src_id),
       rt AS (SELECT src_id, tgt_id, c,
                row_number() OVER (PARTITION BY tgt_id
                  ORDER BY c DESC, src_id) AS rk FROM cos),
       ay AS (SELECT tgt_id, ($pivot) / $K AS ay
              FROM rt WHERE rk <= $K GROUP BY tgt_id),
       m AS (SELECT cos.src_id, cos.tgt_id, cos.c, ax.ax, ay.ay,
               cos.c / ((ax.ax + ay.ay) / 2) AS m
             FROM cos JOIN ax ON ax.src_id = cos.src_id
                      JOIN ay ON ay.tgt_id = cos.tgt_id)
       SELECT src_id, tgt_id, round(c, 6) AS cos,
              round(ax, 6) AS src_knn_avg,
              round(ay, 6) AS tgt_knn_avg,
              round(m, 6) AS margin
       FROM (SELECT *, row_number() OVER (PARTITION BY src_id
                         ORDER BY m DESC, tgt_id) AS rn FROM m)
       WHERE rn = 1 ORDER BY src_id"""
  }

  // --------------------------------------------------------------- q402
  /** CLUSTER-respecting train/test split with a leakage audit — the
    * "dedup before you split" rule made checkable: near-dup components
    * (q65's spanning-forest clustering over the same-label cosine>=0.3
    * pairs, singletons = their own cluster) are assigned WHOLLY to
    * train or test by an md5 hash of the cluster representative
    * (bucket 0 of 5 => test, ~20%), versus the naive per-document hash
    * split. The audit counts near-dup pairs STRADDLING the boundary
    * under each policy: the cluster split's count is 0 by construction
    * — and the driver-checked value IS that proof — while the naive
    * split leaks. One row; every count is exact integer math off the
    * replayable md5 family. */
  private def q402(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{ConnectedComponents, Similarity}
    val emb = Tables(s, dir)("embeddings")
    // materialized once: the exact same-label cosine pair join feeds
    // ConnectedComponents' eager contraction AND the straddle audit —
    // without this the quadratic scored join re-executes per consumer
    val pairs = Similarity.nearDupPairs(emb, "vec_id", "embedding",
        blockCol = "label", threshold = 0.3)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint()
    val comp = ConnectedComponents.components(pairs, "id_a", "id_b")
      .select(col("id").as("vec_id"), col("component"))
    def bucket(c: Column): Column =
      conv(substring(md5(encode(c.cast("string"), "UTF-8")), 1, 8), 16, 10)
        .cast("long") % 5
    val assigned = emb.select(col("vec_id"))
      .join(comp, Seq("vec_id"), "left")
      .withColumn("cluster", coalesce(col("component"), col("vec_id")))
      .select(col("vec_id"),
        (bucket(col("cluster")) === 0).cast("int").as("cl_test"),
        (bucket(col("vec_id")) === 0).cast("int").as("nv_test"))
    val counts = assigned.agg(
      sum(when(col("cl_test") === 0, 1L).otherwise(0L)).as("n_train_cluster"),
      sum(col("cl_test").cast("long")).as("n_test_cluster"),
      sum(when(col("nv_test") === 0, 1L).otherwise(0L)).as("n_train_naive"),
      sum(col("nv_test").cast("long")).as("n_test_naive"))
    val a = assigned.select(col("vec_id").as("id_a"),
      col("cl_test").as("cla"), col("nv_test").as("nva"))
    val b = assigned.select(col("vec_id").as("id_b"),
      col("cl_test").as("clb"), col("nv_test").as("nvb"))
    val straddle = pairs.join(a, Seq("id_a")).join(b, Seq("id_b")).agg(
      sum(when(col("cla") =!= col("clb"), 1L).otherwise(0L))
        .as("straddle_cluster"),
      sum(when(col("nva") =!= col("nvb"), 1L).otherwise(0L))
        .as("straddle_naive"))
    counts.crossJoin(straddle)
  }

  private val q402Sql =
    s"""WITH RECURSIVE
       p AS (
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ${dotSql("a.embedding", "b.embedding")} /
             (${normSql("a.embedding")} * ${normSql("b.embedding")}) AS cos
         FROM embeddings a JOIN embeddings b
           ON a.label = b.label AND a.vec_id < b.vec_id),
       edges AS MATERIALIZED (SELECT id_a, id_b FROM p WHERE cos >= 0.3),
       und AS (SELECT id_a AS a, id_b AS b FROM edges
               UNION SELECT id_b, id_a FROM edges),
       cc AS (
         SELECT a, b FROM und
         UNION
         SELECT cc.a, u.b FROM cc JOIN und u ON cc.b = u.a),
       comp AS MATERIALIZED (
         SELECT a AS vec_id, least(a, min(b)) AS component
         FROM cc GROUP BY a),
       assigned AS MATERIALIZED (
         SELECT e.vec_id,
           CASE WHEN ('0x' || substr(md5(CAST(coalesce(comp.component,
                  e.vec_id) AS VARCHAR)), 1, 8))::BIGINT % 5 = 0
                THEN 1 ELSE 0 END AS cl_test,
           CASE WHEN ('0x' || substr(md5(CAST(e.vec_id AS VARCHAR)),
                  1, 8))::BIGINT % 5 = 0
                THEN 1 ELSE 0 END AS nv_test
         FROM embeddings e LEFT JOIN comp ON comp.vec_id = e.vec_id),
       counts AS (
         SELECT CAST(sum(CASE WHEN cl_test = 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_train_cluster,
                CAST(sum(cl_test) AS BIGINT) AS n_test_cluster,
                CAST(sum(CASE WHEN nv_test = 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_train_naive,
                CAST(sum(nv_test) AS BIGINT) AS n_test_naive
         FROM assigned),
       str AS (
         SELECT CAST(sum(CASE WHEN a.cl_test <> b.cl_test THEN 1 ELSE 0 END)
                  AS BIGINT) AS straddle_cluster,
                CAST(sum(CASE WHEN a.nv_test <> b.nv_test THEN 1 ELSE 0 END)
                  AS BIGINT) AS straddle_naive
         FROM edges JOIN assigned a ON a.vec_id = edges.id_a
                    JOIN assigned b ON b.vec_id = edges.id_b)
       SELECT * FROM counts CROSS JOIN str"""

  // --------------------------------------------------------------- q408
  /** SRP-blocked bitext mining audit — the scale-path certification
    * for q401 (the q390 discipline applied to bitext): band the source
    * and target collections with the shared 16-bit SRP signature
    * (4 bands × 4 bits, hyperplanes replayed as literals), take the
    * band-collision pairs as the candidate set, and measure (a) what
    * fraction of q401's exact-margin best pairs the candidates
    * contain (recall) and (b) what fraction of the full S×T matrix
    * the candidates are (cost). One row: the recall/cost trade that
    * decides whether the blocked path may replace the exact matrix at
    * scale. */
  private def q408(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val Bits = 16; val Bands = 4; val R = Bits / Bands
    val emb = Tables(s, dir)("embeddings")
      .filter(col("label").isin(0, 1))
      .select(col("vec_id"), col("label"),
        Similarity.srpSignature(col("embedding"), Bits, Dim).as("sig"))
    val bandCols = (0 until Bands).map(b =>
      struct(lit(b).as("band"),
        (shiftright(col("sig"), b * R) % (1 << R)).cast("int").as("key")))
    val bnd = emb.select(col("vec_id"), col("label"),
      explode(array(bandCols: _*)).as("bk"))
      .select(col("vec_id"), col("label"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = bnd.filter(col("label") === 0)
      .select(col("vec_id").as("src_id"), col("band"), col("key"))
      .join(bnd.filter(col("label") === 1)
        .select(col("vec_id").as("tgt_id"), col("band"), col("key")),
        Seq("band", "key"))
      .select(col("src_id"), col("tgt_id")).distinct()
    val best = bitextBest(s, dir).select(col("src_id"), col("tgt_id"))
    val hit = best.join(cand.withColumn("inc", lit(1)),
        Seq("src_id", "tgt_id"), "left")
      .agg(count(lit(1)).cast("long").as("n_src"),
        sum(coalesce(col("inc"), lit(0))).cast("long").as("n_hit"))
      .withColumn("recall",
        round(col("n_hit").cast("double") / col("n_src"), 6))
    val sizes = emb.filter(col("label") === 0).agg(count(lit(1)).as("ns"))
      .crossJoin(emb.filter(col("label") === 1).agg(count(lit(1)).as("nt")))
      .crossJoin(cand.agg(count(lit(1)).as("nc")))
      .select((col("ns") * col("nt")).cast("long").as("n_full_pairs"),
        col("nc").cast("long").as("n_cand_pairs"),
        round(col("nc").cast("double") / (col("ns") * col("nt")), 6)
          .as("cand_frac"))
    hit.crossJoin(sizes)
  }

  private val q408Sql = {
    val Bits = 16; val Bands = 4; val R = Bits / Bands
    val mask = (1 << R) - 1
    import OracleVec.hpList
    val sigExpr = (0 until Bits)
      .map(b => s"CASE WHEN ${dotSql("embedding", s"(${hpList(b)})")} > 0 THEN ${1 << b} ELSE 0 END")
      .mkString(" + ")
    def pivot =
      (1 to 4).map(i => s"max(CASE WHEN rk = $i THEN c END)").mkString(" + ")
    s"""WITH sv AS MATERIALIZED (SELECT vec_id AS src_id, embedding AS s_emb
                    FROM embeddings WHERE label = 0),
       tv AS MATERIALIZED (SELECT vec_id AS tgt_id, embedding AS t_emb
              FROM embeddings WHERE label = 1),
       sigs AS MATERIALIZED (
         SELECT vec_id, label, CAST($sigExpr AS BIGINT) AS sig
         FROM embeddings WHERE label IN (0, 1)),
       bnd AS MATERIALIZED (
         SELECT vec_id, label, u.b AS band, (sig >> ($R * u.b)) & $mask AS key
         FROM sigs, unnest(generate_series(0, ${Bands - 1})) AS u(b)),
       cand AS MATERIALIZED (
         SELECT DISTINCT sb.vec_id AS src_id, tb.vec_id AS tgt_id
         FROM bnd sb JOIN bnd tb
           ON sb.band = tb.band AND sb.key = tb.key
         WHERE sb.label = 0 AND tb.label = 1),
       cos AS MATERIALIZED (
         SELECT src_id, tgt_id, ${cosSql("sv.s_emb", "tv.t_emb")} AS c
         FROM sv CROSS JOIN tv),
       rs AS (SELECT src_id, tgt_id, c,
                row_number() OVER (PARTITION BY src_id
                  ORDER BY c DESC, tgt_id) AS rk FROM cos),
       ax AS (SELECT src_id, ($pivot) / 4 AS ax
              FROM rs WHERE rk <= 4 GROUP BY src_id),
       rt AS (SELECT src_id, tgt_id, c,
                row_number() OVER (PARTITION BY tgt_id
                  ORDER BY c DESC, src_id) AS rk FROM cos),
       ay AS (SELECT tgt_id, ($pivot) / 4 AS ay
              FROM rt WHERE rk <= 4 GROUP BY tgt_id),
       m AS (SELECT cos.src_id, cos.tgt_id,
               cos.c / ((ax.ax + ay.ay) / 2) AS m
             FROM cos JOIN ax ON ax.src_id = cos.src_id
                      JOIN ay ON ay.tgt_id = cos.tgt_id),
       best AS (
         SELECT src_id, tgt_id
         FROM (SELECT *, row_number() OVER (PARTITION BY src_id
                           ORDER BY m DESC, tgt_id) AS rn FROM m)
         WHERE rn = 1),
       hit AS (
         SELECT CAST(count(*) AS BIGINT) AS n_src,
                CAST(sum(CASE WHEN cand.src_id IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
         FROM best LEFT JOIN cand
           ON cand.src_id = best.src_id AND cand.tgt_id = best.tgt_id),
       sizes AS (
         SELECT CAST((SELECT count(*) FROM sv) *
                     (SELECT count(*) FROM tv) AS BIGINT) AS n_full_pairs,
                CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_cand_pairs)
       SELECT n_src, n_hit,
              round(n_hit * 1.0 / n_src, 6) AS recall,
              n_full_pairs, n_cand_pairs,
              round(n_cand_pairs * 1.0 / n_full_pairs, 6) AS cand_frac
       FROM hit CROSS JOIN sizes"""
  }

  // --------------------------------------------------------------- q434
  /** MULTI-PROBE SRP bitext blocking — the recall remedy q408's ~0.4
    * honestly reports, measured side by side: the SOURCE collection
    * probes, per band, its exact key plus the r one-bit-flip keys
    * (Lv et al. 2007 via [[graft.operators.Similarity.srpMultiProbeTopK]]'s
    * probe rule), while the TARGET index stays byte-identical — the
    * multi-probe trade is query-side probe rows, never a re-index.
    * One row per mode (single vs multi) with recall against q401's
    * exact argmax-margin pairs and the candidate fraction of the full
    * S×T matrix — the table that decides whether the blocked path may
    * replace the exact matrix at scale. 100 TB shape: the exact-matrix
    * `best` side exists only for the audit; production runs the banded
    * join alone, so cost is the probe-side ×(r+1) row fan-out into the
    * same equi-join. */
  private def q434(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val Bits = 16; val Bands = 4; val R = Bits / Bands
    // band rows materialized once: the target index + both source
    // probe sets read them (three consumers of the 16-dot signature)
    val bnd = Tables(s, dir)("embeddings")
      .filter(col("label").isin(0, 1))
      .select(col("vec_id"), col("label"),
        Similarity.srpSignature(col("embedding"), Bits, Dim).as("sig"))
      .select(col("vec_id"), col("label"),
        posexplode(array((0 until Bands).map(b =>
          (shiftright(col("sig"), b * R) % (1 << R)).cast("int")): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "key")
      .localCheckpoint()
    val tgtB = bnd.filter(col("label") === 1)
      .select(col("vec_id").as("tgt_id"), col("band"), col("key"))
    val srcSingle = bnd.filter(col("label") === 0)
      .select(col("vec_id").as("src_id"), col("band"), col("key"))
    val srcMulti = bnd.filter(col("label") === 0)
      .select(col("vec_id").as("src_id"), col("band"),
        explode(array(col("key") +:
          (0 until R).map(j => col("key").bitwiseXOR(lit(1 << j))): _*))
          .as("key"))
    // exact argmax-margin truth, materialized once for both audits
    val best = bitextBest(s, dir).select(col("src_id"), col("tgt_id"))
      .localCheckpoint()
    val sizes = Tables(s, dir)("embeddings")
      .agg(sum(when(col("label") === 0, 1L).otherwise(0L)).as("ns"),
        sum(when(col("label") === 1, 1L).otherwise(0L)).as("nt"))
    def audit(mode: String, probes: DataFrame): DataFrame = {
      val cand = probes.join(tgtB, Seq("band", "key"))
        .select(col("src_id"), col("tgt_id")).distinct()
        .localCheckpoint() // feeds the hit join AND the size count
      val hit = best.join(cand.withColumn("inc", lit(1)),
          Seq("src_id", "tgt_id"), "left")
        .agg(count(lit(1)).cast("long").as("n_src"),
          sum(coalesce(col("inc"), lit(0))).cast("long").as("n_hit"))
      hit.crossJoin(sizes.crossJoin(cand.agg(count(lit(1)).as("nc"))))
        .select(lit(mode).as("mode"),
          col("n_src"), col("n_hit"),
          round(col("n_hit").cast("double") / col("n_src"), 6).as("recall"),
          (col("ns") * col("nt")).cast("long").as("n_full_pairs"),
          col("nc").cast("long").as("n_cand_pairs"),
          round(col("nc").cast("double") / (col("ns") * col("nt")), 6)
            .as("cand_frac"))
    }
    audit("multi", srcMulti).unionByName(audit("single", srcSingle))
      .orderBy("mode")
  }

  private val q434Sql = {
    val Bits = 16; val Bands = 4; val R = Bits / Bands
    val mask = (1 << R) - 1
    import OracleVec.hpList
    val sigExpr = (0 until Bits)
      .map(b => s"CASE WHEN ${dotSql("embedding", s"(${hpList(b)})")} > 0 THEN ${1 << b} ELSE 0 END")
      .mkString(" + ")
    val probeList = ("key" +: (0 until R).map(j => s"xor(key, ${1 << j})"))
      .mkString("[", ", ", "]")
    def pivot =
      (1 to 4).map(i => s"max(CASE WHEN rk = $i THEN c END)").mkString(" + ")
    def auditSql(mode: String, candRel: String) =
      s"""SELECT '$mode' AS mode,
            (SELECT count(*) FROM best) AS n_src,
            (SELECT count(*) FROM best b
             WHERE EXISTS (SELECT 1 FROM $candRel c
               WHERE c.src_id = b.src_id AND c.tgt_id = b.tgt_id)) AS n_hit,
            (SELECT count(*) FROM $candRel) AS nc"""
    s"""WITH sv AS MATERIALIZED (SELECT vec_id AS src_id, embedding AS s_emb
                    FROM embeddings WHERE label = 0),
       tv AS MATERIALIZED (SELECT vec_id AS tgt_id, embedding AS t_emb
              FROM embeddings WHERE label = 1),
       sigs AS MATERIALIZED (
         SELECT vec_id, label, CAST($sigExpr AS BIGINT) AS sig
         FROM embeddings WHERE label IN (0, 1)),
       bnd AS MATERIALIZED (
         SELECT vec_id, label, u.b AS band, (sig >> ($R * u.b)) & $mask AS key
         FROM sigs, unnest(generate_series(0, ${Bands - 1})) AS u(b)),
       tb AS MATERIALIZED (
         SELECT vec_id AS tgt_id, band, key FROM bnd WHERE label = 1),
       cand_single AS MATERIALIZED (
         SELECT DISTINCT sb.vec_id AS src_id, tb.tgt_id
         FROM bnd sb JOIN tb ON sb.band = tb.band AND sb.key = tb.key
         WHERE sb.label = 0),
       sprobe AS (
         SELECT vec_id, band, p.pk AS key
         FROM bnd, unnest($probeList) AS p(pk)
         WHERE label = 0),
       cand_multi AS MATERIALIZED (
         SELECT DISTINCT sp.vec_id AS src_id, tb.tgt_id
         FROM sprobe sp JOIN tb ON sp.band = tb.band AND sp.key = tb.key),
       cos AS MATERIALIZED (
         SELECT src_id, tgt_id, ${cosSql("sv.s_emb", "tv.t_emb")} AS c
         FROM sv CROSS JOIN tv),
       rs AS (SELECT src_id, tgt_id, c,
                row_number() OVER (PARTITION BY src_id
                  ORDER BY c DESC, tgt_id) AS rk FROM cos),
       ax AS (SELECT src_id, ($pivot) / 4 AS ax
              FROM rs WHERE rk <= 4 GROUP BY src_id),
       rt AS (SELECT src_id, tgt_id, c,
                row_number() OVER (PARTITION BY tgt_id
                  ORDER BY c DESC, src_id) AS rk FROM cos),
       ay AS (SELECT tgt_id, ($pivot) / 4 AS ay
              FROM rt WHERE rk <= 4 GROUP BY tgt_id),
       m AS (SELECT cos.src_id, cos.tgt_id,
               cos.c / ((ax.ax + ay.ay) / 2) AS m
             FROM cos JOIN ax ON ax.src_id = cos.src_id
                      JOIN ay ON ay.tgt_id = cos.tgt_id),
       best AS MATERIALIZED (
         SELECT src_id, tgt_id
         FROM (SELECT *, row_number() OVER (PARTITION BY src_id
                           ORDER BY m DESC, tgt_id) AS rn FROM m)
         WHERE rn = 1),
       sizes AS (
         SELECT CAST((SELECT count(*) FROM sv) *
                     (SELECT count(*) FROM tv) AS BIGINT) AS n_full_pairs),
       modes AS (
         ${auditSql("multi", "cand_multi")}
         UNION ALL
         ${auditSql("single", "cand_single")})
       SELECT mode, CAST(n_src AS BIGINT) AS n_src,
              CAST(n_hit AS BIGINT) AS n_hit,
              round(n_hit * 1.0 / n_src, 6) AS recall,
              n_full_pairs,
              CAST(nc AS BIGINT) AS n_cand_pairs,
              round(nc * 1.0 / n_full_pairs, 6) AS cand_frac
       FROM modes CROSS JOIN sizes ORDER BY mode"""
  }

  // --------------------------------------------------------------- q435
  /** QUERY-DIRECTED multi-probe bitext blocking — the production point
    * the q434 ladder motivates: naive all-Hamming-1 probing buys
    * recall 0.92 but at 0.77 of the matrix (uneconomical); the full
    * Lv et al. 2007 probe sequence ([[graft.operators.Similarity
    * .directedProbeRows]]) spends a FIXED probe budget (16) on the
    * perturbations most likely to flip — 1-2 bit flips scored by the
    * flipped hyperplanes' |dot| boundary distance — over a FINER
    * 36-bit / 6-band geometry whose smaller buckets make each probe
    * cheap. Measured here: recall ≈ 0.61-0.62 at ≈ 0.30 candidate
    * fraction (sf0.01/sf0.1) vs single-probe 0.38 at 0.23 — recall
    * +60% for +7pp cost, and the target index is exact-keys-only, so
    * serving more probes never re-indexes. (At sf0.001 the target
    * collection is 47 vectors — one missed pair is 2pp of recall —
    * and the point lands at ≈ 0.55/0.32.) One row: the audit shape of
    * q408/q434. */
  private def q435(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val Bands = 6; val R = 6; val P = 16
    val emb = Tables(s, dir)("embeddings")
    val srcProbes = Similarity.directedProbeRows(
        emb.filter(col("label") === 0), "vec_id", "embedding", Dim,
        Bands, R, P)
      .withColumnRenamed("vec_id", "src_id")
    val tgtIndex = Similarity.directedProbeRows(
        emb.filter(col("label") === 1), "vec_id", "embedding", Dim,
        Bands, R, probes = 0)
      .withColumnRenamed("vec_id", "tgt_id")
    val cand = srcProbes.join(tgtIndex, Seq("band", "key"))
      .select(col("src_id"), col("tgt_id")).distinct()
      .localCheckpoint() // feeds the hit join AND the size count
    val best = bitextBest(s, dir).select(col("src_id"), col("tgt_id"))
    val sizes = emb
      .agg(sum(when(col("label") === 0, 1L).otherwise(0L)).as("ns"),
        sum(when(col("label") === 1, 1L).otherwise(0L)).as("nt"))
    best.join(cand.withColumn("inc", lit(1)),
        Seq("src_id", "tgt_id"), "left")
      .agg(count(lit(1)).cast("long").as("n_src"),
        sum(coalesce(col("inc"), lit(0))).cast("long").as("n_hit"))
      .crossJoin(sizes.crossJoin(cand.agg(count(lit(1)).as("nc"))))
      .select(col("n_src"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_src"), 6).as("recall"),
        (col("ns") * col("nt")).cast("long").as("n_full_pairs"),
        col("nc").cast("long").as("n_cand_pairs"),
        round(col("nc").cast("double") / (col("ns") * col("nt")), 6)
          .as("cand_frac"))
  }

  private val q435Sql = {
    val Bands = 6; val R = 6; val P = 16
    import OracleVec.hpList
    val dots36 = (0 until Bands * R)
      .map(b => dotSql("embedding", s"(${hpList(b)})"))
      .mkString("[", ", ", "]")
    val keysList = (0 until Bands).map { b =>
      "(" + (0 until R)
        .map(j => s"CASE WHEN d[${b * R + j + 1}] > 0 THEN ${1 << j} ELSE 0 END")
        .mkString(" + ") + ")"
    }.mkString("[", ", ", "]")
    val subs: Seq[(Int, Seq[Int])] =
      (0 until R).map(j => (1 << j, Seq(j))) ++
        (for { j <- 0 until R; l <- j + 1 until R }
          yield ((1 << j) | (1 << l), Seq(j, l)))
    val pertList = (for { b <- 0 until Bands; (mask, js) <- subs } yield
      s"{'score': ${js.map(j => s"abs(d[${b * R + j + 1}])").mkString(" + ")}, " +
        s"'band': $b, 'mask': $mask}")
      .mkString("[", ", ", "]")
    def pivot =
      (1 to 4).map(i => s"max(CASE WHEN rk = $i THEN c END)").mkString(" + ")
    s"""WITH sv AS MATERIALIZED (SELECT vec_id AS src_id, embedding AS s_emb
                    FROM embeddings WHERE label = 0),
       tv AS MATERIALIZED (SELECT vec_id AS tgt_id, embedding AS t_emb
              FROM embeddings WHERE label = 1),
       alld AS MATERIALIZED (
         SELECT vec_id, label, $dots36 AS d
         FROM embeddings WHERE label IN (0, 1)),
       allk AS MATERIALIZED (
         SELECT vec_id, label, d, $keysList AS k FROM alld),
       tb AS MATERIALIZED (
         SELECT vec_id AS tgt_id, u.b AS band, k[u.b + 1] AS key
         FROM allk, unnest(generate_series(0, ${Bands - 1})) AS u(b)
         WHERE label = 1),
       spert AS (
         SELECT vec_id, k, list_slice(list_sort($pertList), 1, $P) AS pl
         FROM allk WHERE label = 0),
       sprobes AS MATERIALIZED (
         SELECT vec_id AS src_id, u.b AS band, k[u.b + 1] AS key
         FROM allk, unnest(generate_series(0, ${Bands - 1})) AS u(b)
         WHERE label = 0
         UNION ALL
         SELECT vec_id, p.band, xor(k[p.band + 1], p.mask)
         FROM spert, unnest(pl) AS t(p)),
       cand AS MATERIALIZED (
         SELECT DISTINCT sp.src_id, tb.tgt_id
         FROM sprobes sp JOIN tb
           ON sp.band = tb.band AND sp.key = tb.key),
       cos AS MATERIALIZED (
         SELECT src_id, tgt_id, ${cosSql("sv.s_emb", "tv.t_emb")} AS c
         FROM sv CROSS JOIN tv),
       rs AS (SELECT src_id, tgt_id, c,
                row_number() OVER (PARTITION BY src_id
                  ORDER BY c DESC, tgt_id) AS rk FROM cos),
       ax AS (SELECT src_id, ($pivot) / 4 AS ax
              FROM rs WHERE rk <= 4 GROUP BY src_id),
       rt AS (SELECT src_id, tgt_id, c,
                row_number() OVER (PARTITION BY tgt_id
                  ORDER BY c DESC, src_id) AS rk FROM cos),
       ay AS (SELECT tgt_id, ($pivot) / 4 AS ay
              FROM rt WHERE rk <= 4 GROUP BY tgt_id),
       m AS (SELECT cos.src_id, cos.tgt_id,
               cos.c / ((ax.ax + ay.ay) / 2) AS m
             FROM cos JOIN ax ON ax.src_id = cos.src_id
                      JOIN ay ON ay.tgt_id = cos.tgt_id),
       best AS (
         SELECT src_id, tgt_id
         FROM (SELECT *, row_number() OVER (PARTITION BY src_id
                           ORDER BY m DESC, tgt_id) AS rn FROM m)
         WHERE rn = 1),
       hit AS (
         SELECT CAST(count(*) AS BIGINT) AS n_src,
                CAST(sum(CASE WHEN cand.src_id IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
         FROM best LEFT JOIN cand
           ON cand.src_id = best.src_id AND cand.tgt_id = best.tgt_id),
       sizes AS (
         SELECT CAST((SELECT count(*) FROM sv) *
                     (SELECT count(*) FROM tv) AS BIGINT) AS n_full_pairs,
                CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_cand_pairs)
       SELECT n_src, n_hit,
              round(n_hit * 1.0 / n_src, 6) AS recall,
              n_full_pairs, n_cand_pairs,
              round(n_cand_pairs * 1.0 / n_full_pairs, 6) AS cand_frac
       FROM hit CROSS JOIN sizes"""
  }

  // --------------------------------------------------------------- q413
  /** Johnson-Lindenstrauss PROJECTION distortion audit — the
    * real-valued rung between exact 64-d search and the sign-quantized
    * SRP bits: project every vector onto the 16 shared hyperplanes
    * (the q30/q408 literals, WITHOUT sign quantization), and compare
    * projected-space cosine against exact 64-d cosine over all pairs
    * of the first 40 vectors. Reported as INTEGER error-band counts
    * (floor(|err|·20), capped at band 10) plus per-band min/max —
    * deterministic without any float summation, where a mean would
    * depend on reduction order. Projections are computed once per
    * VECTOR (40×16 dots), never per pair. */
  private def q413(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions
    import graft.operators.Similarity
    val P = 16
    val emb = Tables(s, dir)("embeddings").filter(col("vec_id") < 40)
    val projCols = (0 until P).map { j =>
      VectorFunctions.dot(col("embedding"),
        array(Similarity.hyperplane(j, Dim).map(lit): _*))
    }
    val proj = emb.select(col("vec_id"),
      col("embedding"), array(projCols: _*).as("p"))
    val a = proj.select(col("vec_id").as("id_a"),
      col("embedding").as("ea"), col("p").as("pa"))
    val b = proj.select(col("vec_id").as("id_b"),
      col("embedding").as("eb"), col("p").as("pb"))
    val pairs = a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFunctions.cosine(col("ea"), col("eb")).as("c64"),
        VectorFunctions.cosine(col("pa"), col("pb")).as("c16"))
      .withColumn("err", col("c16") - col("c64"))
      .withColumn("band",
        least(floor(abs(col("err")) * 20), lit(10L)).cast("long"))
    pairs.groupBy("band")
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        round(min("err"), 6).as("min_err"),
        round(max("err"), 6).as("max_err"))
      .orderBy("band")
  }

  private val q413Sql = {
    val P = 16
    import OracleVec.hpList
    val projList = (0 until P)
      .map(j => dotSql("embedding", s"(${hpList(j)})"))
      .mkString("[", ", ", "]")
    def dot16(x: String, y: String) =
      s"list_sum(list_transform(generate_series(1, $P), i -> $x[i] * $y[i]))"
    def norm16(v: String) = s"sqrt(${dot16(v, v)})"
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 40),
       proj AS MATERIALIZED (
         SELECT vec_id, embedding, $projList AS p FROM e),
       pairs AS (
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           CASE WHEN ${normSql("a.embedding")} * ${normSql("b.embedding")} = 0
                THEN 0.0
                ELSE ${dotSql("a.embedding", "b.embedding")} /
                  (${normSql("a.embedding")} * ${normSql("b.embedding")})
           END AS c64,
           CASE WHEN ${norm16("a.p")} * ${norm16("b.p")} = 0
                THEN 0.0
                ELSE ${dot16("a.p", "b.p")} / (${norm16("a.p")} * ${norm16("b.p")})
           END AS c16
         FROM proj a JOIN proj b ON a.vec_id < b.vec_id),
       banded AS (
         SELECT least(CAST(floor(abs(c16 - c64) * 20) AS BIGINT), 10) AS band,
                c16 - c64 AS err
         FROM pairs)
       SELECT band, CAST(count(*) AS BIGINT) AS n_pairs,
              round(min(err), 6) AS min_err,
              round(max(err), 6) AS max_err
       FROM banded GROUP BY band ORDER BY band"""
  }

  override def queries: Map[String, QueryFn] = Map(
    "q400_triplet_mining" -> q400 _,
    "q401_bitext_margin" -> q401 _,
    "q402_cluster_split" -> q402 _,
    "q408_bitext_blocked" -> q408 _,
    "q413_jl_distortion" -> q413 _,
    "q434_multiprobe_bitext" -> q434 _,
    "q435_directed_probe_bitext" -> q435 _)

  override def oracles: Map[String, String] = Map(
    "q400_triplet_mining" -> q400Sql,
    "q401_bitext_margin" -> q401Sql,
    "q402_cluster_split" -> q402Sql,
    "q408_bitext_blocked" -> q408Sql,
    "q413_jl_distortion" -> q413Sql,
    "q434_multiprobe_bitext" -> q434Sql,
    "q435_directed_probe_bitext" -> q435Sql)
}
