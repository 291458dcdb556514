package graft.tools

import org.apache.spark.sql.functions._
import graft.text.TextStats

/** Dev-only probe for the llm_quality_filter scaling anomaly. */
object QProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/benchdata/sf10")
    val spark = graft.core.Tables.session("graft-qprobe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    // noop sink, not count(): under count() the optimizer prunes unused
    // projections, so the "quality only"/"langid only" cases collapsed to
    // a parquet metadata count and measured nothing (same pitfall the
    // round-6 Bench fix removed)
    def timed(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val d = df
      val t0 = System.nanoTime()
      d.write.format("noop").mode("overwrite").save()
      println(f"[qprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    for (round <- 1 to 2) {
      println(s"[qprobe] --- round $round ---")
      timed("quality only") {
        docs.select(col("doc_id"),
          TextStats.qualityScore(col("text")).as("quality"))
      }
      timed("langid only") {
        docs.select(col("doc_id"),
          TextStats.langId(col("text")).as("lang_pred"))
      }
      timed("current (wc+filter+sort)") {
        docs.withColumn("quality", TextStats.qualityScore(col("text")))
          .withColumn("lang_pred", TextStats.langId(col("text")))
          .filter(col("quality") >= 0.7 && col("lang_pred") === "en")
          .select("doc_id", "quality").orderBy("doc_id")
      }
      timed("no sort") {
        docs.withColumn("quality", TextStats.qualityScore(col("text")))
          .withColumn("lang_pred", TextStats.langId(col("text")))
          .filter(col("quality") >= 0.7 && col("lang_pred") === "en")
          .select("doc_id", "quality")
      }
      timed("quality floor only") {
        docs.withColumn("quality", TextStats.qualityScore(col("text")))
          .filter(col("quality") >= 0.7).select("doc_id", "quality")
      }
      timed("lang pred only + filter") {
        docs.withColumn("lang_pred", TextStats.langId(col("text")))
          .filter(col("lang_pred") === "en").select("doc_id")
      }
    }
    if (sys.env.contains("PROBE_EXPLAIN")) {
      docs.withColumn("quality", TextStats.qualityScore(col("text")))
        .withColumn("lang_pred", TextStats.langId(col("text")))
        .filter(col("quality") >= 0.7 && col("lang_pred") === "en")
        .select("doc_id", "quality").orderBy("doc_id").explain("formatted")
    }
    spark.stop()
  }
}
