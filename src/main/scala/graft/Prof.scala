package graft
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.dedup.Dedup

/** Scratch profiling main (not part of the library surface). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session("prof")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name rows=$n time=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    val docs = Tables.table(spark, dir, "documents")
    time("md5_only") {
      docs.select(md5(col("text").cast("binary")).as("f")).count()
    }
    time("norm_md5") {
      docs.select(graft.text.TextStats.fingerprintMd5(col("text")).as("f")).count()
    }
    time("exact_dedup_keepers") {
      Dedup.exactDedupKeepers(docs, "doc_id", "text").count()
    }
    time("exact_dedup_keepers_again") {
      Dedup.exactDedupKeepers(docs, "doc_id", "text").count()
    }
    Dedup.exactDedupKeepers(docs, "doc_id", "text").explain("formatted")
    spark.stop()
  }
}
