package graft.ml

import org.apache.spark.ml.evaluation.ClusteringEvaluator
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M10 external clustering metrics vs pseudo-ground-truth labels:
  * homogeneity, completeness, V-measure, adjusted Rand index
  * (`TF-IDF_K-Means_approach.ipynb:8161-8171`; sklearn.metrics semantics),
  * plus silhouette via ml.evaluation.ClusteringEvaluator.
  *
  * The contingency table (|labels| × |clusters|) is tiny after the
  * groupBy — computed distributed, collected, entropy/comb arithmetic on
  * the driver (same boundary sklearn draws).
  */
object Metrics {

  final case class External(homogeneity: Double, completeness: Double,
                            vMeasure: Double, adjustedRand: Double)

  def external(df: DataFrame, labelCol: String, predCol: String): External = {
    val cont = df.groupBy(col(labelCol).as("l"), col(predCol).as("p"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.get(0), r.get(1), r.getLong(2)))
    val n = cont.map(_._3).sum.toDouble
    val byL = cont.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val byP = cont.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap

    def entropy(counts: Iterable[Long]): Double =
      -counts.filter(_ > 0).map { c => val p = c / n; p * math.log(p) }.sum
    val hL = entropy(byL.values)
    val hP = entropy(byP.values)
    // conditional entropy H(L|P), H(P|L)
    val hLgP = -cont.map { case (_, p, c) =>
      if (c == 0) 0.0 else (c / n) * math.log(c.toDouble / byP(p))
    }.sum
    val hPgL = -cont.map { case (l, _, c) =>
      if (c == 0) 0.0 else (c / n) * math.log(c.toDouble / byL(l))
    }.sum
    val homogeneity = if (hL == 0) 1.0 else 1.0 - hLgP / hL
    val completeness = if (hP == 0) 1.0 else 1.0 - hPgL / hP
    val v = if (homogeneity + completeness == 0) 0.0
      else 2 * homogeneity * completeness / (homogeneity + completeness)
    // ARI
    def comb2(x: Double): Double = x * (x - 1) / 2.0
    val sumComb = cont.map(c => comb2(c._3.toDouble)).sum
    val sumCombL = byL.values.map(c => comb2(c.toDouble)).sum
    val sumCombP = byP.values.map(c => comb2(c.toDouble)).sum
    val expected = sumCombL * sumCombP / comb2(n)
    val maxIdx = (sumCombL + sumCombP) / 2.0
    val ari = if (maxIdx == expected) 0.0
      else (sumComb - expected) / (maxIdx - expected)
    External(homogeneity, completeness, v, ari)
  }

  /** Silhouette (squared Euclidean, sklearn default is Euclidean — the
    * evaluator's cosine variant also available via distanceMeasure). */
  def silhouette(df: DataFrame, featuresCol: String, predCol: String): Double =
    new ClusteringEvaluator()
      .setFeaturesCol(featuresCol).setPredictionCol(predCol)
      .setMetricName("silhouette").evaluate(df)

  /** Metrics as a 1-row DataFrame (for query registration). */
  def externalFrame(df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val m = external(df, labelCol, predCol)
    val spark = df.sparkSession
    import spark.implicits._
    Seq((m.homogeneity, m.completeness, m.vMeasure, m.adjustedRand))
      .toDF("homogeneity", "completeness", "v_measure", "adjusted_rand")
  }

  /** All five reference metrics as a 1-row DataFrame: H/C/V/ARI plus
    * silhouette (`TF-IDF_K-Means_approach.ipynb:8152-8156` reports the full
    * set). The evaluator needs a NUMERIC prediction column; a string
    * prediction is hashed to a stable code (silhouette only reads group
    * identity, not the value). */
  def allFrame(df: DataFrame, labelCol: String, predCol: String,
               featuresCol: String): DataFrame = {
    val m = external(df, labelCol, predCol)
    val sil = silhouette(
      df.withColumn("_pred_code", xxhash64(col(predCol).cast("string"))),
      featuresCol, "_pred_code")
    val spark = df.sparkSession
    import spark.implicits._
    Seq((m.homogeneity, m.completeness, m.vMeasure, m.adjustedRand, sil))
      .toDF("homogeneity", "completeness", "v_measure", "adjusted_rand",
        "silhouette")
  }
}
