package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** a21/a22/a23 pins: where each sketch's EXACTNESS claim holds and
  * what happens just past its boundary.
  *
  * - bitmap distinct is exact ALWAYS (it's a real bitmap, not an
  *   estimator) — pinned across bucket boundaries and partitionings;
  * - approx_top_k is exact while maxItemsTracked ≥ domain, and keeps
  *   the heavy hitter (frequent-items guarantee) once undersized;
  * - theta sketches are exact below nominal entries (the mode a23's
  *   hash gate relies on) and ±5% in estimate mode above it, with
  *   exact-mode estimates merge-order stable.
  */
class SketchSetSpec extends SparkSpec {
  import spark.implicits._

  test("bitmap distinct exact across bucket boundaries + partitionings") {
    // ids straddling the 32768-bit bucket edges, with duplicates
    val ids = Seq(0L, 1L, 32767L, 32768L, 32769L, 1000000L,
      0L, 32768L, 1000000L, 65536L)
    val truth = ids.distinct.size.toLong
    for (p <- Seq(1, 3, 7)) {
      val got = ids.toDF("id").repartition(p)
        .groupBy(expr("bitmap_bucket_number(id)").as("bkt"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(id))").as("bm"))
        .agg(sum(expr("bitmap_count(bm)")).as("n"))
        .collect()(0).getLong(0)
      assert(got == truth, s"partitions=$p")
    }
  }

  test("approx_top_k exact at capacity >= domain; heavy hitter survives undersizing") {
    // skewed domain: 'hot' 500×, nine cold items 10× each
    val rows = Seq.fill(500)("hot") ++
      (1 to 9).flatMap(i => Seq.fill(10)(s"cold$i"))
    val df = rows.toDF("w").repartition(5)
    val top = df
      .agg(expr("approx_top_k(w, 10, 16)").as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.item"), col("e.count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(top("hot") == 500L)
    (1 to 9).foreach(i => assert(top(s"cold$i") == 10L))
    // undersized sketch (capacity 4 < domain 10): counts may be
    // OVERestimates, but the frequent-items guarantee keeps the heavy
    // hitter on top with count >= its true frequency
    val tiny = df
      .agg(expr("approx_top_k(w, 1, 4)").as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.item"), col("e.count"))
      .collect()(0)
    assert(tiny.getString(0) == "hot")
    assert(tiny.getLong(1) >= 500L)
  }

  test("theta: exact-mode set algebra on disjoint sets, any merge order") {
    // A = 0..99, B = 100..179 — disjoint by construction
    val df = (0L until 180L).toDF("id")
      .withColumn("grp", when(col("id") < 100, "a").otherwise("b"))
    for (p <- Seq(1, 4)) {
      val r = df.repartition(p)
        .agg(
          expr("theta_sketch_agg(CASE WHEN grp = 'a' THEN id END)").as("sa"),
          expr("theta_sketch_agg(CASE WHEN grp = 'b' THEN id END)").as("sb"))
        .select(
          expr("theta_sketch_estimate(theta_intersection(sa, sb))").as("i"),
          expr("theta_sketch_estimate(theta_union(sa, sb))").as("u"),
          expr("theta_sketch_estimate(theta_difference(sa, sb))").as("d"))
        .collect()(0)
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((0L, 180L, 100L)),
        s"partitions=$p")
    }
  }

  test("theta estimate mode past nominal stays within 5%") {
    // 20000 distinct > default nominal 4096 → sampling kicks in; the
    // a23 hash gate must never be used in this regime (spec-gated only)
    val n = 20000L
    val est = spark.range(n).agg(
      expr("theta_sketch_estimate(theta_sketch_agg(id))").as("e"))
      .collect()(0).getLong(0)
    assert(math.abs(est - n).toDouble / n < 0.05, s"est=$est")
  }
}
