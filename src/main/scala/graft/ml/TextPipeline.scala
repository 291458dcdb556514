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

  /** M8 LSA: project `features` to `dim` components and L2-renormalize
    * (the spherical-KMeans trick). PCA here = TruncatedSVD on centered
    * data; dims are small (25) so the driver-side eigendecomposition of
    * the d×d Gramian is trivial while the data pass is distributed. */
  def lsa(dim: Int = 25): Pipeline = {
    val pca = new PCA().setInputCol("features").setOutputCol("pca_vec")
      .setK(dim)
    val norm = new Normalizer().setInputCol("pca_vec").setOutputCol("lsa_vec")
      .setP(2.0)
    new Pipeline().setStages(Array(pca, norm))
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
    val (clusterInput, featCol) =
      if (useLsa) (lsa().fit(feat.cache()).transform(feat), "lsa_vec")
      else (feat, "features")
    clusterInput.cache()
    try {
      val km = kmeansBest(clusterInput, featCol, k, nInit = nInit)
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
    }
  }
}
