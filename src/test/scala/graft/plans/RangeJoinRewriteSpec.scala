package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The automatic band-join rewrite: a bare inequality join must become
  * the binned equi-join (no nested loop) when the width conf is set,
  * produce identical rows to the nested-loop plan, and leave non-band
  * joins untouched. */
class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val WidthKey = "spark.graft.rangeJoin.binWidth"

  private def points = Seq((1L, 5.0), (2L, 15.0), (3L, 25.0), (4L, 47.0))
    .toDF("pid", "p")
  private def intervals = Seq((10L, 0.0, 10.0), (20L, 12.0, 30.0),
    (30L, 40.0, 41.0), (40L, 50.0, 45.0)) // last inverted: matches nothing
    .toDF("iid", "lo", "hi")

  private def bandJoin(): DataFrame =
    points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid")

  private def withWidth[T](w: String)(body: => T): T = {
    spark.conf.set(WidthKey, w)
    try body finally spark.conf.unset(WidthKey)
  }

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("band join rewrites to a binned equi-join, same rows") {
    val naive = bandJoin().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(plan(bandJoin()).contains("BroadcastNestedLoopJoin"))
    withWidth("10.0") {
      val p = plan(bandJoin())
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
      assert(p.contains("_graft_bin"), p)
      val got = bandJoin().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive)
      assert(got == Set((1L, 10L), (2L, 20L), (3L, 20L)))
    }
  }

  test("flipped literal orders (lo <= p AND hi >= p) also rewrite") {
    withWidth("10.0") {
      val df = points.join(intervals,
          col("lo") <= col("p") && col("hi") >= col("p"))
        .select("pid", "iid")
      assert(!plan(df).contains("BroadcastNestedLoopJoin"))
      assert(df.count() == 3)
    }
  }

  test("strict bounds keep exact semantics after the rewrite") {
    withWidth("10.0") {
      val df = points.join(intervals,
          col("p") > col("lo") && col("p") < col("hi"))
        .select("pid", "iid")
      assert(!plan(df).contains("BroadcastNestedLoopJoin"))
      // (1,10): 0 < 5 < 10 keeps; boundary-equal rows would drop here
      assert(df.count() == 3)
    }
  }

  test("bin-replication guard: a too-wide interval raises, not OOMs") {
    // session-wide width + an unrelated join with huge intervals was the
    // blowup path: every interval row would explode into hi/w - lo/w
    // bins. The guard must raise a NAMED error before that, and leave
    // results untouched when the cap accommodates the data.
    val wide = Seq((1L, 0.0, 1.0e9)).toDF("iid", "lo", "hi")
    withWidth("10.0") {
      spark.conf.set("spark.graft.rangeJoin.maxBinsPerInterval", "1000")
      // the cap literal is baked in at plan time, so each conf change
      // needs a freshly-built frame
      def wideJoin() = points.join(wide,
          col("p") >= col("lo") && col("p") <= col("hi"))
        .select("pid", "iid")
      try {
        val e = intercept[Exception] { wideJoin().collect() }
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Nil
          else Option(t.getMessage).toSeq ++ msgs(t.getCause)
        assert(msgs(e).exists(_.contains("maxBinsPerInterval")),
          s"unexpected error: $e")
        // intervals that FIT the cap still rewrite and keep exact
        // semantics with the guard in the plan
        val narrow = bandJoin().collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(narrow == Set((1L, 10L), (2L, 20L), (3L, 20L)))
      } finally spark.conf.unset("spark.graft.rangeJoin.maxBinsPerInterval")
    }
  }

  test("non-band joins are left untouched") {
    withWidth("10.0") {
      // three conjuncts (equi + band) — not the 2-conjunct band shape
      val df = points.join(intervals,
        col("pid") === col("iid") && col("p") >= col("lo") &&
          col("p") <= col("hi"))
      assert(!plan(df).contains("_graft_bin"))
      // band whose "point" references both sides — untouched
      val df2 = points.join(intervals,
        col("p") + col("lo") >= col("lo") && col("p") <= col("hi"))
      assert(!plan(df2).contains("_graft_bin"))
    }
  }

  test("unset or nonpositive width disables the rewrite") {
    assert(plan(bandJoin()).contains("BroadcastNestedLoopJoin"))
    withWidth("0") {
      assert(plan(bandJoin()).contains("BroadcastNestedLoopJoin"))
    }
  }
}
