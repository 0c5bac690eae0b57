package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity search over embedding columns.
  *
  * Two paths, as a scale ladder:
  *   - [[bruteForceTopK]] — exact: queries × corpus with the (small)
  *     query side broadcast, ranked per query. Cost O(|Q|·|C|·d); right
  *     whenever |Q| is modest. At 100 TB the corpus side stays
  *     partitioned, never shuffles, and each partition streams once.
  *   - [[srpTopK]] — approximate: signed-random-projection (SRP) LSH.
  *     Each vector reduces to a `bits`-bit signature (signs of dot
  *     products with deterministic pseudo-random hyperplanes); vectors
  *     sharing any signature band become candidates and only candidates
  *     pay the exact-cosine cost. Hyperplanes derive from a hash of
  *     (bit, dim) — data-independent and reproducible, no fitted state
  *     to ship.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector.
    * Output: (query_id, neighbor_id, rank, cosine). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
              cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic hyperplane component for (bit, dim) in [-1, 1).
    * Plain Scala (not an Expression): hyperplanes are data-independent,
    * so they're computed once on the driver and shipped as literals. */
  private def hyperplane(bit: Int, dim: Int): Array[Double] = {
    (0 until dim).map { d =>
      val h = scala.util.hashing.MurmurHash3.productHash((bit, d))
      (h.toDouble / Int.MaxValue)
    }.toArray
  }

  /** SRP signature column: bit b = sign(v · hyperplane_b). */
  def srpSignature(vecCol: Column, bits: Int, dim: Int): Column = {
    val bitCols = (0 until bits).map { b =>
      val w = array(hyperplane(b, dim).map(lit): _*)
      when(dot(vecCol, w) > 0, lit(1 << b)).otherwise(lit(0))
    }
    bitCols.reduce(_ + _)
  }

  /** Approximate top-k via SRP-LSH band candidates + exact re-rank.
    * Output: (query_id, neighbor_id, rank, cosine) — same shape as
    * bruteForceTopK so recall is directly measurable. */
  def srpTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, dim: Int,
              bits: Int = 16, bands: Int = 4): DataFrame = {
    require(bits % bands == 0)
    val r = bits / bands
    val mask = (1 << r) - 1

    def withBands(df: DataFrame, id: String, vecOut: String): DataFrame = {
      val sig = srpSignature(col(vecCol), bits, dim)
      df.select(col(idCol).as(id), col(vecCol).as(vecOut), sig.as("sig"))
        .select(col(id), col(vecOut),
                posexplode(array((0 until bands).map(b =>
                  shiftright(col("sig"), b * r).bitwiseAND(mask)): _*)))
        .withColumnRenamed("pos", "band_idx")
        .withColumnRenamed("col", "band_key")
    }

    val qb = withBands(queries, "query_id", "qv")
    val cb = withBands(corpus, "neighbor_id", "cv")
    val cand = qb.join(cb, Seq("band_idx", "band_key"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("cv"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand
      .select(col("query_id"), col("neighbor_id"),
              cosine(col("qv"), col("cv")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Embedding near-dup pairs: same-`blockCol` blocking (no all-pairs
    * blowup), exact cosine >= threshold. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                   blockCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"),
                      col(blockCol).as("blk"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
                      col(blockCol).as("blk"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("blk"), col("id_a"), col("id_b"),
              cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
