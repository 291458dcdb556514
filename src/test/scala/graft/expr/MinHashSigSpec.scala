package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  test("graft_minhash: k components, deterministic, edit-sensitive") {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy cat"),
      (2L, "unrelated text entirely different in content"),
      (3L, "")).toDF("id", "t")
    val sigs = df.select($"id",
        call_function("graft_minhash", $"t", lit(16), lit(4), lit(1)).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs.values.forall(_.length == 16))
    def overlap(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).count { case (x, y) => x == y }
    assert(overlap(sigs(0L), sigs(1L)) > overlap(sigs(0L), sigs(2L)))
    // determinism across evaluation paths: SQL string vs call_function
    df.createOrReplaceTempView("mh_docs")
    val viaSql = spark.sql(
      "SELECT id, graft_minhash(t, 16, 4, 1) AS sig FROM mh_docs")
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaSql == sigs)
  }

  test("graft_minhash: null input -> null, empty string defined") {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq((0L, Some("abc")), (1L, None)).toDF("id", "t")
    val out = df.select($"id",
        call_function("graft_minhash", $"t").as("sig"))
      .as[(Long, Option[Seq[Long]])].collect().toMap
    assert(out(0L).isDefined)
    assert(out(1L).isEmpty)
  }
}
