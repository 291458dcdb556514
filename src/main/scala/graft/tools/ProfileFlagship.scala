package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Phase-level wall breakdown of the two bench heads (m7_m9 /
  * m_flagship_shape) — where do their ~5 s at sf0.1 actually go?
  * Usage: run_direct.sh graft.tools.ProfileFlagship <sfDir> */
object ProfileFlagship {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.session("profile-flagship",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[prof] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // ---- m7_m9 decomposition ----
    val docs = Tables.table(spark, dir, "documents")
      .select("doc_id", "text")
      .repartition(8, col("doc_id")).sortWithinPartitions("doc_id")
    val txt = docs.withColumn("text", col("text"))
      .filter(length(trim(col("text"))) > 0)
    val feat = timed("tfidf fit+transform+materialize") {
      val f = graft.ml.TextPipeline.tfidfPipeline().fit(txt).transform(txt)
      f.cache().count()
      f
    }
    val km = timed("kmeans fit (nInit=1, maxIter=500)") {
      graft.ml.TextPipeline.kmeansBest(feat.select("features"),
        "features", 5, nInit = 1)
    }
    println(s"[prof] kmeans iterations: ${km.summary.numIter}")
    timed("kmeans transform + groupBy sizes") {
      km.transform(feat).groupBy("prediction").count().collect()
    }
    feat.unpersist()
    // ---- flagship decomposition ----
    val docs2 = Tables.table(spark, dir, "documents")
      .select(col("doc_id"),
        graft.text.Clean.cleanMessage(col("text")).as("text"))
    val toks = docs2.select(col("doc_id"), col("text"),
        graft.text.Clean.tokenizeTreebankish(lower(col("text")))
          .as("tokens"))
      .filter(size(col("tokens")) > 0)
    timed("toks cache+materialize") { toks.cache().count() }
    val model = timed("w2v fit (16-dim, maxIter=1)") {
      graft.ml.Embed.word2vec(toks, "tokens", vectorSize = 16, maxIter = 1)
    }
    val vecs = timed("sentence2vec + materialize") {
      val v = graft.ml.Embed.sentence2vec(model, toks, "tokens")
        .select(col("doc_id"), col("text"),
          graft.ml.VectorOps.toArray(col("sent_vec")).as("v"))
        .cache()
      v.count()
      v
    }
    toks.unpersist()
    val n = vecs.count()
    val eps = timed("knn curve + kneedle") {
      val curveInput =
        if (n > 2000) vecs.sample(withReplacement = false, 2000.0 / n,
          seed = 42L)
        else vecs
      val nCurve = if (n > 2000) curveInput.count() else n
      val k = graft.ml.Embed.defaultK(nCurve)
      val curve = graft.ml.Embed.collectCurve(
        graft.ml.Embed.knnDistanceCurve(curveInput, "doc_id", "v", k,
          maxN = 4000))
      graft.ml.Kneedle.epsilonSearch(curve)
        .getOrElse(curve(curve.length / 2))
    }
    timed("dbscan (sampled/distributed) + stats") {
      val labels =
        if (n > 2000)
          graft.ml.Dbscan.sampled(vecs.select(col("doc_id"), col("v")),
            "doc_id", "v", eps = math.max(eps, 1e-3), minPts = 5,
            sampleCap = 2000)
        else graft.ml.Dbscan.distributed(
          vecs.select(col("doc_id"),
            graft.ml.VectorOps.toMlVector(col("v")).as("features")),
          "doc_id", "features", eps = math.max(eps, 1e-3), minPts = 5)
      val lab = vecs.join(labels, "doc_id")
        .select("doc_id", "text", "label")
      graft.ml.ClusterStats.stats(lab, "label", "text", "doc_id").collect()
    }
    vecs.unpersist()
    spark.stop()
  }
}
