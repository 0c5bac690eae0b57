package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persist/load contract for the engine's trained model artifacts —
  * the "train once, apply many" half of the index lifecycle.
  *
  * A 100 TB pipeline does not refit its quantizer or classifier per
  * run: the IVF coarse centroids, PQ codebooks, and quality-classifier
  * weights are fit ONCE on a bounded sample ([[IvfPq.fit]],
  * [[QualityClassifier.fit]]) and then served for months across
  * thousands of encode/probe/score jobs. This store gives every fitted
  * artifact a parquet layout plus a (key, value) manifest carrying a
  * format version and the shape parameters, so an apply job can
  * validate what it loads before baking the values into literals.
  *
  * Exactness: every model value is a Double and parquet round-trips
  * doubles bit-for-bit, so serve-from-disk output is BIT-IDENTICAL to
  * serve-from-fit — q480 pins that end-to-end by oracling the
  * persisted-serve query against q358's committed golden. Load order
  * is re-imposed from the stored ids (centroid_id / (subspace, code) /
  * weight pos), never from file row order, so the artifact survives
  * any writer partitioning.
  *
  * Layout under `path/`:
  *   - manifest.parquet           (key STRING, value STRING)
  *   - ivfpq:    coarse.parquet   (centroid_id INT, centroid ARRAY<DOUBLE>)
  *               codebooks.parquet(subspace INT, code INT, centroid ARRAY<DOUBLE>)
  *   - logistic: weights.parquet  (pos INT, feature STRING, weight DOUBLE)
  *               — pos 0 is the bias, pos i>=1 aligns with the feature list
  *   - centroids: centroids.parquet (centroid_id BIGINT, centroid ARRAY<DOUBLE>)
  *               — the [[Similarity.ivfTopK]]/[[KMeans.fit]] frame shape
  *   - isotonic: steps.parquet    (bin INT, value DOUBLE) — the 10
  *               decile values of a [[QualityClassifier.fitIsotonicDeciles]]
  *               step calibrator
  */
object ModelStore {

  val FormatVersion = "1"

  /** Canonical location for a named artifact: `spark.graft.modelRoot`
    * if set, else `<warehouse>/graft_models` — i.e. storage every
    * executor AND the driver can reach (on a real cluster the
    * warehouse is HDFS/S3), unlike a driver-local temp dir. Writers
    * here use SaveMode.Overwrite, so a fixed name is idempotent under
    * re-runs — re-fitting a query overwrites its artifact instead of
    * leaking a directory per invocation (the /tmp-per-run antipattern
    * this replaces). */
  def artifactPath(spark: SparkSession, name: String): String = {
    val root = spark.conf.getOption("spark.graft.modelRoot")
      .getOrElse(spark.sessionState.conf.warehousePath.stripSuffix("/")
        + "/graft_models")
    s"$root/$name"
  }

  private def manifestDf(spark: SparkSession,
                         kvs: Seq[(String, String)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("value", StringType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(kvs.map(kv => Row(kv._1, kv._2)): _*), schema)
  }

  private def readManifest(spark: SparkSession,
                           path: String): Map[String, String] =
    spark.read.parquet(s"$path/manifest.parquet")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  private def requireKind(manifest: Map[String, String], kind: String,
                          path: String): Unit = {
    require(manifest.get("kind").contains(kind),
      s"artifact at $path is '${manifest.getOrElse("kind", "?")}', expected '$kind'")
    require(manifest.get("version").contains(FormatVersion),
      s"artifact at $path has version ${manifest.getOrElse("version", "?")}, " +
        s"reader supports $FormatVersion")
  }

  // ------------------------------------------------------------ IVF-PQ

  def saveIvfPq(spark: SparkSession, model: IvfPq.Model,
                path: String): Unit = {
    val dim = model.coarse.head.length
    val vecArr = ArrayType(DoubleType, containsNull = false)
    val coarseSchema = StructType(Seq(
      StructField("centroid_id", IntegerType, nullable = false),
      StructField("centroid", vecArr, nullable = false)))
    val coarseRows = model.coarse.zipWithIndex.map {
      case (c, i) => Row(i, c)
    }
    val bookSchema = StructType(Seq(
      StructField("subspace", IntegerType, nullable = false),
      StructField("code", IntegerType, nullable = false),
      StructField("centroid", vecArr, nullable = false)))
    val bookRows = for {
      (book, s) <- model.pq.codebooks.zipWithIndex
      (c, k)    <- book.zipWithIndex
    } yield Row(s, k, c)
    spark.createDataFrame(java.util.Arrays.asList(coarseRows: _*), coarseSchema)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/coarse.parquet")
    spark.createDataFrame(java.util.Arrays.asList(bookRows: _*), bookSchema)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/codebooks.parquet")
    manifestDf(spark, Seq(
      "kind" -> "ivfpq", "version" -> FormatVersion,
      "dim" -> dim.toString, "coarse_k" -> model.coarse.length.toString,
      "m" -> model.pq.m.toString, "sub_dim" -> model.pq.subDim.toString,
      "codes" -> model.pq.codebooks.head.length.toString))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/manifest.parquet")
  }

  def loadIvfPq(spark: SparkSession, path: String): IvfPq.Model = {
    val man = readManifest(spark, path)
    requireKind(man, "ivfpq", path)
    val coarseK = man("coarse_k").toInt
    val m = man("m").toInt
    val codes = man("codes").toInt
    val coarse = spark.read.parquet(s"$path/coarse.parquet")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq)
      .sortBy(_._1).map(_._2).toSeq
    require(coarse.length == coarseK,
      s"coarse table at $path has ${coarse.length} rows, manifest says $coarseK")
    val books = spark.read.parquet(s"$path/codebooks.parquet")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toSeq))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.sortBy(_._2).map(_._3).toSeq }
    require(books.length == m && books.forall(_.length == codes),
      s"codebook table at $path does not match manifest shape m=$m codes=$codes")
    IvfPq.Model(coarse, ProductQuantizer.Model(m, man("sub_dim").toInt, books))
  }

  // --------------------------------------------------------- centroids

  /** Persist a (centroid_id, centroid) frame — the [[KMeans.fit]] /
    * [[Similarity.ivfTopK]] centroid-table shape. The frame is
    * k rows: coalesce(1) keeps the artifact one file. */
  def saveCentroids(centroids: DataFrame, path: String): Unit = {
    val spark = centroids.sparkSession
    val frame = centroids.select(
      col("centroid_id").cast("long").as("centroid_id"),
      col("centroid").cast("array<double>").as("centroid"))
    val dim = frame.select(size(col("centroid"))).head().getInt(0)
    frame.coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/centroids.parquet")
    manifestDf(spark, Seq(
      "kind" -> "centroids", "version" -> FormatVersion,
      "dim" -> dim.toString))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/manifest.parquet")
  }

  /** Load a persisted centroid table, ordered by centroid_id. */
  def loadCentroids(spark: SparkSession, path: String): DataFrame = {
    requireKind(readManifest(spark, path), "centroids", path)
    spark.read.parquet(s"$path/centroids.parquet").orderBy("centroid_id")
  }

  // --------------------------------------------------------------- BPE

  /** Persist a learned BPE merge table — the [[BpeTrainer.train]]
    * frame (merge_rank, left_sym, right_sym, pair_count). The
    * tokenizer is THE canonical train-once artifact: every downstream
    * corpus is segmented with the same frozen merges. */
  def saveBpe(merges: DataFrame, path: String): Unit = {
    val spark = merges.sparkSession
    val frame = merges.select(
      col("merge_rank").cast("int").as("merge_rank"),
      col("left_sym"), col("right_sym"),
      col("pair_count").cast("long").as("pair_count"))
    val n = frame.count()
    frame.coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/merges.parquet")
    manifestDf(spark, Seq(
      "kind" -> "bpe", "version" -> FormatVersion,
      "n_merges" -> n.toString))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/manifest.parquet")
  }

  /** Load a persisted BPE merge table in rank order — feed the
    * (left, right) pairs to [[BpeTrainer.segmentWith]]. */
  def loadBpe(spark: SparkSession,
              path: String): Seq[(Int, String, String, Long)] = {
    val man = readManifest(spark, path)
    requireKind(man, "bpe", path)
    val rows = spark.read.parquet(s"$path/merges.parquet")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    require(rows.length == man("n_merges").toInt,
      s"merge table at $path has ${rows.length} rows, manifest says " +
        man("n_merges"))
    rows
  }

  // -------------------------------------------------------------- KN LM

  /** Persist a fitted Kneser-Ney model — [[KnLm.Model]]'s four
    * vocab-bounded tables, one parquet each. The perplexity gate's
    * model is fit on a reference corpus once and then scores every
    * ingested shard ([[graft.streaming.StreamingCuration]]'s knModel
    * distillate is exactly this state). */
  def saveKnLm(model: KnLm.Model, path: String): Unit = {
    val spark = model.bg.sparkSession
    model.bg.write.mode(SaveMode.Overwrite).parquet(s"$path/bg.parquet")
    model.c1.write.mode(SaveMode.Overwrite).parquet(s"$path/c1.parquet")
    model.npre.write.mode(SaveMode.Overwrite).parquet(s"$path/npre.parquet")
    model.disc.coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/disc.parquet")
    manifestDf(spark, Seq("kind" -> "knlm", "version" -> FormatVersion))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/manifest.parquet")
  }

  /** Load a persisted KN model. The tables come back value-identical
    * (counts are integers, the discount a parquet-exact double), so
    * [[KnLm.score]] against the loaded model is bit-identical to
    * scoring against the fresh fit. */
  def loadKnLm(spark: SparkSession, path: String): KnLm.Model = {
    requireKind(readManifest(spark, path), "knlm", path)
    KnLm.Model(
      spark.read.parquet(s"$path/bg.parquet"),
      spark.read.parquet(s"$path/c1.parquet"),
      spark.read.parquet(s"$path/npre.parquet"),
      spark.read.parquet(s"$path/disc.parquet"))
  }

  // ---------------------------------------------------------- logistic

  /** Persist fitted logistic weights: pos 0 = bias, pos i aligns with
    * `featureNames(i - 1)` — the order [[QualityClassifier.fit]]
    * returns and [[QualityClassifier.fittedModel]] consumes.
    *
    * `scoreHist` (optional): the 10-decile histogram of the FIT
    * sample's scores — the training-time score distribution, carried
    * IN the artifact so a serving pipeline can ask "has the corpus
    * drifted from what this model was trained on?" (PSI vs the
    * artifact, q487) without ever re-touching the training corpus.
    * Ten integers ride the manifest; empty = not recorded. */
  def saveLogistic(spark: SparkSession, featureNames: Seq[String],
                   weights: Seq[Double], path: String,
                   scoreHist: Seq[Long] = Nil): Unit = {
    require(weights.length == featureNames.length + 1,
      s"${weights.length} weights for ${featureNames.length} features (+bias)")
    require(scoreHist.isEmpty || scoreHist.length == 10,
      s"scoreHist must be the 10 decile counts, got ${scoreHist.length}")
    val schema = StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("feature", StringType, nullable = false),
      StructField("weight", DoubleType, nullable = false)))
    val rows = ("bias" +: featureNames).zip(weights).zipWithIndex.map {
      case ((name, w), i) => Row(i, name, w)
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/weights.parquet")
    val histKv =
      if (scoreHist.isEmpty) Nil
      else Seq("score_hist" -> scoreHist.mkString(","))
    manifestDf(spark, Seq(
      "kind" -> "logistic", "version" -> FormatVersion,
      "n_features" -> featureNames.length.toString) ++ histKv)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/manifest.parquet")
  }

  /** Persist an isotonic step-function calibrator — the 10 decile
    * values of [[QualityClassifier.fitIsotonicDeciles]], one row per
    * decile so the artifact reads as the reliability repair it is. */
  def saveIsotonic(spark: SparkSession, steps: Seq[Double],
                   path: String): Unit = {
    require(steps.length == 10, s"want 10 step values, got ${steps.length}")
    val schema = StructType(Seq(
      StructField("bin", IntegerType, nullable = false),
      StructField("value", DoubleType, nullable = false)))
    val rows = steps.zipWithIndex.map { case (v, b) => Row(b, v) }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/steps.parquet")
    manifestDf(spark, Seq("kind" -> "isotonic", "version" -> FormatVersion))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/manifest.parquet")
  }

  /** Load a persisted isotonic calibrator, re-ordered by bin. */
  def loadIsotonic(spark: SparkSession, path: String): Seq[Double] = {
    requireKind(readManifest(spark, path), "isotonic", path)
    val rows = spark.read.parquet(s"$path/steps.parquet")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    require(rows.length == 10,
      s"isotonic table at $path has ${rows.length} rows, expected 10")
    rows.map(_._2).toSeq
  }

  /** The training-time score histogram stored by [[saveLogistic]] —
    * the 10 decile counts, or empty if the artifact predates the field
    * (manifest keys are additive within a format version). */
  def loadLogisticHist(spark: SparkSession, path: String): Seq[Long] = {
    val man = readManifest(spark, path)
    requireKind(man, "logistic", path)
    man.get("score_hist") match {
      case None => Nil
      case Some(s) =>
        val h = s.split(",").map(_.toLong).toSeq
        require(h.length == 10,
          s"score_hist at $path has ${h.length} entries, expected 10")
        h
    }
  }

  /** Load persisted logistic weights: (featureNames, bias +: weights),
    * re-ordered by stored pos. */
  def loadLogistic(spark: SparkSession,
                   path: String): (Seq[String], Seq[Double]) = {
    val man = readManifest(spark, path)
    requireKind(man, "logistic", path)
    val rows = spark.read.parquet(s"$path/weights.parquet")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1)
    require(rows.length == man("n_features").toInt + 1,
      s"weight table at $path has ${rows.length} rows, manifest says " +
        s"${man("n_features").toInt + 1}")
    (rows.drop(1).map(_._2).toSeq, rows.map(_._3).toSeq)
  }
}
