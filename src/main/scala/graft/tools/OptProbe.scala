package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Dev-only decomposition probe for the r19 optimization round: times
  * sub-stages of the expensive registry queries with the noop sink so
  * the bill can be attributed before anything is changed. */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Tables.session("graft-optprobe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[optprobe] $name%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val docs = graft.core.Tables.table(spark, dir, "documents")

    val positions: DataFrame = docs
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - 2)).as("i"))
      .select(col("doc_id"),
        expr("substring(text, i, 3)").as("tri"),
        expr("substring(text, i, 2)").as("pre"))
    for (round <- 1 to 2) {
      println(s"[optprobe] --- round $round ---")
      timed("positions explode only (no fanout)") { noop(positions) }
      timed("positions explode (fanout doc_id)") {
        noop(graft.core.Tables.fanOut(docs, col("doc_id"))
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(1), length(col("text")) - 2)).as("i"))
          .select(col("doc_id"),
            expr("substring(text, i, 3)").as("tri"),
            expr("substring(text, i, 2)").as("pre")))
      }
      timed("charlm train only") {
        val (tri, pre, a) =
          graft.text.CharLm.train(docs.filter(col("doc_id") % 2 === 0), "text")
        noop(tri); noop(pre); val _ = a
      }
      var triS: DataFrame = null; var preS: DataFrame = null; var aS = 0L
      timed("train (for reuse)") {
        val r = graft.text.CharLm.train(
          docs.filter(col("doc_id") % 2 === 0), "text")
        triS = r._1; preS = r._2; aS = r._3
      }
      timed("score only (given trained)") {
        noop(graft.text.CharLm.nllScore(docs, "doc_id", "text", triS, preS, aS))
      }
      timed("score only + orderBy") {
        noop(graft.text.CharLm.nllScore(docs, "doc_id", "text", triS, preS, aS)
          .orderBy("doc_id"))
      }
      timed("charlm full join-form (registry)") {
        noop(graft.SparkEntry.queries("llm_charlm_nll")(spark, dir))
      }
      timed("charlm scan-form (registry)") {
        noop(graft.SparkEntry.queries("llm_charlm_nll_scan")(spark, dir))
      }
    }
    spark.stop()
  }
}
