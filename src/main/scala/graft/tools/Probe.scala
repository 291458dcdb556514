package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only stage probe for the flagship pipeline (not registered as a
  * query; run via `graft.tools.Probe <sfDir>` to see where wall-clock
  * goes between w2v / curve / kneedle / dbscan). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Tables.session("graft-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (round <- 1 to 2) {
      println(s"[probe] --- round $round ---")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), graft.text.Clean.cleanMessage(col("text")).as("text"))
      val toks = docs.select(col("doc_id"), col("text"),
          graft.text.Clean.tokenizeTreebankish(lower(col("text"))).as("tokens"))
        .filter(size(col("tokens")) > 0)
      val model = timed("word2vec fit")(
        graft.ml.Embed.word2vec(toks, "tokens", vectorSize = 16, maxIter = 1))
      val vecs = graft.ml.Embed.sentence2vec(model, toks, "tokens")
        .select(col("doc_id"), col("text"),
          graft.ml.VectorOps.toArray(col("sent_vec")).as("v"))
        .cache()
      val n = timed("sent2vec count")(vecs.count())
      val curveInput = vecs.sample(withReplacement = false, 2000.0 / n, seed = 42L)
      val nCurve = timed("sample count")(curveInput.count())
      val k = graft.ml.Embed.defaultK(nCurve)
      if (round == 1 && sys.env.contains("PROBE_EXPLAIN"))
        graft.ml.Embed.knnDistanceCurve(curveInput, "doc_id", "v", k)
          .explain("formatted")
      val curve = timed("knn curve")(graft.ml.Embed.collectCurve(
        graft.ml.Embed.knnDistanceCurve(curveInput, "doc_id", "v", k)))
      val eps = timed("kneedle")(graft.ml.Kneedle.epsilonSearch(curve)
        .getOrElse(curve(curve.length / 2)))
      val labels = timed("dbscan sampled")(
        graft.ml.Dbscan.sampled(vecs.select(col("doc_id"), col("v")),
          "doc_id", "v", eps = math.max(eps, 1e-3), minPts = 5,
          sampleCap = 2000).localCheckpoint(true))
      val out = timed("stats")(graft.ml.ClusterStats.stats(
        vecs.join(labels, "doc_id").select("doc_id", "text", "label"),
        "label", "text", "doc_id").count())
      println(s"[probe] n=$n k=$k eps=$eps rows=$out")
      vecs.unpersist()
    }
    spark.stop()
  }
}
