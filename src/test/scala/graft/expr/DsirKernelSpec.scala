package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native DSIR kernels must reproduce the interpreted fold they
  * replaced BIT-FOR-BIT: same tokens, same gram order, same md5 buckets,
  * same left-to-right double summation. The fold is rebuilt here inline
  * (the production path no longer has it) and both are driven over the
  * fixture corpus plus whitespace/blank edge cases. */
class DsirKernelSpec extends SparkSpec {
  import spark.implicits._

  private val buckets = 4096

  private def foldGrams(textCol: org.apache.spark.sql.Column) = {
    val toks = filter(split(trim(regexp_replace(lower(textCol),
      "\\s+", " ")), " "), t => t =!= "")
    concat(toks, graft.text.Repetition.wordNgrams(toks, 2))
  }

  private def foldBucket(g: org.apache.spark.sql.Column) =
    (conv(substring(md5(g.cast("binary")), 1, 3), 16, 10)
      .cast("int") % buckets)

  test("graft_dsir_logw == the interpreted fold, bit-for-bit") {
    val ratios = Array.tabulate(buckets)(b => math.sin(b * 0.37) * 3.0)
    val ratioLit = typedLit(ratios)
    val extra = Seq((100001L, ""), (100002L, "   "), (100003L, "one"),
      (100004L, "a  b\tc\nd"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq ++ extra
    val df = docs.toDF("doc_id", "text")
    val rows = df.select($"doc_id",
        call_function("graft_dsir_logw", $"text", ratioLit).as("kernel"),
        aggregate(foldGrams($"text"), lit(0.0),
          (acc, g) => acc + element_at(ratioLit, foldBucket(g) + 1))
          .as("fold"))
      .as[(Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, k, f) =>
      assert(java.lang.Double.doubleToLongBits(k) ==
        java.lang.Double.doubleToLongBits(f), s"doc $id: $k vs $f")
    }
  }

  test("graft_dsir_buckets == the fold's bucket multiset, in order") {
    val docs = Seq((1L, "the cat sat on the mat"), (2L, ""), (3L, "  x  "))
      .toDF("doc_id", "text")
    val got = docs.select($"doc_id",
        call_function("graft_dsir_buckets", lower($"text"), lit(buckets))
          .as("b"))
      .as[(Long, Seq[Int])].collect().toMap
    val want = docs.select($"doc_id",
        transform(foldGrams($"text"), g => foldBucket(g)).as("b"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(got == want)
    assert(got(2L).isEmpty && got(3L).size == 1)
  }
}
