package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vectorized text-clustering pipelines (SURVEY.md §2.9 M7–M9).
  *
  * M7 TfidfVectorizer ≙ RegexTokenizer → StopWordsRemover →
  * CountVectorizer(minDF, maxDF) → IDF → Normalizer(L2)
  * (TF-IDF_K-Means_approach.ipynb:7707-7711; sklearn's smoothed IDF is what
  * ml.feature.IDF implements, so the vectorized path matches sklearn — the
  * relational Tfidf object keeps the reference's unsmoothed ln(N/df) twin).
  *
  * M8 LSA ≙ PCA(25) + re-normalize (TruncatedSVD+Normalizer, :7840-7844).
  * M9 KMeans(k=10, maxIter=500) with an n_init-style best-of-seeds loop
  * (sklearn n_init=100, :7894-7902 — we default to a handful of seeds; the
  * reference's 100 restarts is a hyperparameter, not a semantic).
  */
object TextPipeline {

  /** M7: fitted TF-IDF pipeline model applied to `textCol`, output column
    * `features` (L2-normalized sparse vectors). */
  def tfidfPipeline(minDF: Double = 0.02, maxDF: Double = 0.8,
                    vocabSize: Int = 1 << 18): Pipeline = {
    val tok = new RegexTokenizer().setInputCol("text").setOutputCol("raw_tokens")
      .setPattern("\\W+").setToLowercase(true)
    val stop = new StopWordsRemover().setInputCol("raw_tokens")
      .setOutputCol("tokens")
    val cv = new CountVectorizer().setInputCol("tokens").setOutputCol("tf_vec")
      .setMinDF(minDF).setMaxDF(maxDF).setVocabSize(vocabSize)
    val idf = new IDF().setInputCol("tf_vec").setOutputCol("tfidf_vec")
    val norm = new Normalizer().setInputCol("tfidf_vec").setOutputCol("features")
      .setP(2.0)
    new Pipeline().setStages(Array(tok, stop, cv, idf, norm))
  }

  /** M8 LSA: project `inputCol` onto the top-`dim` right singular vectors
    * of the TF-IDF matrix and L2-renormalize (the spherical-KMeans trick;
    * TruncatedSVD + Normalizer, TF-IDF_K-Means_approach.ipynb:7840-7844 —
    * sklearn's TruncatedSVD does NOT center, and neither does this, so the
    * semantics match the reference exactly, unlike a PCA stand-in).
    *
    * Scale shape: `RowMatrix.computeSVD(k, computeU=false)` — for small
    * vocabularies the d×d Gramian is local, past MLlib's ~17.5k-column line
    * it switches to distributed ARPACK (matrix-vector passes over the
    * rows), so there is no O(d²) driver allocation and no 65,535-feature
    * cap (the `ml.feature.PCA` limits this replaces; `tfidfPipeline`
    * permits vocabSize up to 1<<18). Driver/broadcast state is V alone:
    * O(d·k) ≈ 52 MB at the full 1<<18 vocab × k=25. The projection is a
    * single map over the rows — x·V at O(nnz·k) per doc, no shuffle. */
  def lsaProject(df: DataFrame, inputCol: String = "features",
                 outputCol: String = "lsa_vec", dim: Int = 25): DataFrame =
    lsaProjectTracked(df, inputCol, outputCol, dim)._1

  /** As [[lsaProject]], but also returns the V broadcast handle (up to
    * ~52 MB at the full 1<<18 vocab) so long-lived callers can
    * `unpersist(blocking = false)` it once the projection is
    * materialized, instead of leaving cleanup to the ContextCleaner. */
  def lsaProjectTracked(df: DataFrame, inputCol: String = "features",
                        outputCol: String = "lsa_vec", dim: Int = 25)
      : (DataFrame, org.apache.spark.broadcast.Broadcast[Array[Double]]) = {
    import org.apache.spark.mllib.linalg.distributed.RowMatrix
    val spark = df.sparkSession
    val vecRdd = df.select(col(inputCol)).rdd.map(r =>
      org.apache.spark.mllib.linalg.Vectors.fromML(
        r.getAs[org.apache.spark.ml.linalg.Vector](0)))
    val svd = new RowMatrix(vecRdd).computeSVD(dim, computeU = false)
    val v = svd.V // d×k, column-major; k may be < dim on rank deficiency
    val d = v.numRows
    val k = v.numCols
    val bc = spark.sparkContext.broadcast(v.toArray)
    val project = udf { x: org.apache.spark.ml.linalg.Vector =>
      val vv = bc.value
      // output is ALWAYS `dim` wide: computeSVD drops singular values
      // below rCond·σ₁, so k can come back < dim on a rank-deficient
      // corpus — the missing components are zero-padded (their true
      // projection is onto the null space, where 0 is the honest value)
      // so downstream schemas/oracles see a fixed width like sklearn's
      // TruncatedSVD
      val out = new Array[Double](dim)
      x.foreachActive { (i, value) =>
        var j = 0
        while (j < k) { out(j) += value * vv(j * d + i); j += 1 }
      }
      var norm = 0.0
      var j = 0
      while (j < k) { norm += out(j) * out(j); j += 1 }
      val inv = if (norm > 0) 1.0 / math.sqrt(norm) else 0.0
      j = 0
      while (j < k) { out(j) *= inv; j += 1 }
      org.apache.spark.ml.linalg.Vectors.dense(out)
    }
    (df.withColumn(outputCol, project(col(inputCol))), bc)
  }

  /** M9 KMeans with best-of-seeds restarts (sklearn n_init semantics):
    * fit `nInit` models, keep the lowest training cost. */
  def kmeansBest(df: DataFrame, featuresCol: String, k: Int = 10,
                 maxIter: Int = 500, nInit: Int = 4, baseSeed: Long = 42L)
      : org.apache.spark.ml.clustering.KMeansModel = {
    val models = (0 until nInit).map { i =>
      new KMeans().setK(k).setMaxIter(maxIter).setSeed(baseSeed + i)
        .setFeaturesCol(featuresCol).setPredictionCol("prediction")
        .fit(df)
    }
    models.minBy(_.summary.trainingCost)
  }

  /** The full flagship pipeline: clean text → TF-IDF → (optional LSA) →
    * KMeans labels attached (J2 by transform, no positional alignment). */
  def clusterDocuments(docs: DataFrame, textCol: String, k: Int,
                       useLsa: Boolean = false, nInit: Int = 2): DataFrame = {
    val txt = docs.withColumn("text", col(textCol))
      .filter(length(trim(col("text"))) > 0)
    // Cache the vectorized frame: KMeans iterates (maxIter up to 500) and
    // each iteration would otherwise recompute the whole tokenize→TF-IDF
    // chain from the scan — the single biggest wall-clock lever here.
    val feat = tfidfPipeline().fit(txt).transform(txt)
    val (clusterInput, featCol, lsaBc) =
      if (useLsa) {
        val (proj, bc) = lsaProjectTracked(feat.cache())
        (proj, "lsa_vec", Some(bc))
      } else (feat, "features", None)
    clusterInput.cache()
    try {
      // the fit gets an UNCACHED projection on purpose: ml.KMeans only
      // persists its internally-converted instances RDD when the input
      // reports StorageLevel.NONE — handing it the cached frame makes
      // every one of the (up to maxIter) iterations re-deserialize rows
      // from the DF cache, while the projection lets the fit iterate
      // over converted vectors directly (conversion paid once). Same
      // rows, same order, same floats → identical model; the cached
      // frame still serves the label transform below.
      val km = kmeansBest(clusterInput.select(featCol), featCol, k,
        nInit = nInit)
      // localCheckpoint: materialize labels eagerly (while the iteration
      // cache is alive) and truncate lineage — unlike an unowned .cache()
      // the checkpoint blocks are released by the ContextCleaner when the
      // returned frame is garbage-collected, so repeated pipeline runs in
      // one JVM don't accumulate storage
      km.transform(clusterInput)
        .withColumnRenamed("prediction", "cluster")
        .localCheckpoint(true)
    } finally {
      clusterInput.unpersist()
      if (useLsa) feat.unpersist()
      // the checkpointed result no longer references V; don't let the
      // broadcast accumulate across repeated pipeline runs in one JVM
      lsaBc.foreach(_.unpersist(false))
    }
  }
}
