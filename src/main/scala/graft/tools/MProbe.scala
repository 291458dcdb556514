package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only probe for the m7_m9_cluster_pipeline cost breakdown
  * (r19 — VERDICT r18 Next #6: 5.7 s, the slowest suite query). */
object MProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Tables.session("graft-mprobe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[mprobe] $name%-32s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val pinned = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
      .repartition(8, col("doc_id")).sortWithinPartitions("doc_id")
    for (round <- 1 to 2) {
      println(s"[mprobe] --- round $round ---")
      val txt = pinned.withColumn("text", col("text"))
        .filter(length(trim(col("text"))) > 0)
      val model = timed("tfidf fit") {
        graft.ml.TextPipeline.tfidfPipeline().fit(txt)
      }
      val feat = timed("transform + cache + count") {
        val f = model.transform(txt).cache()
        f.count()
        f
      }
      val km = timed("kmeans fit (nInit=1)") {
        graft.ml.TextPipeline.kmeansBest(feat.select("features"),
          "features", 5, nInit = 1)
      }
      println(s"[mprobe] kmeans iterations: ${km.summary.numIter}, " +
        s"dim: ${km.clusterCenters.head.size}, n: ${feat.count()}")
      timed("label transform + sizes") {
        km.transform(feat).groupBy("prediction")
          .agg(count(lit(1)).as("n")).collect()
      }
      feat.unpersist()
      timed("FULL query (registry)") {
        graft.SparkEntry.queries("m7_m9_cluster_pipeline")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
