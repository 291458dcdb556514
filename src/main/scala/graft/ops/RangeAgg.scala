package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Join-free per-interval range aggregation (r16, the j7 ×100 finding).
  *
  * The band-join fixture is OUTPUT-BOUND quadratic: every ×10 in rows is
  * ×100 in qualifying (point, interval) pairs (1.86M → 186M → 18.6B at
  * sf0.1/sf1/sf10), so ANY pair-enumerating plan — the binned equi-join,
  * DuckDB's IEJoin, a 1000-executor cluster's shuffle join — pays wall
  * time linear in the pair count (measured: 910 s engine-side at ×100).
  * When the downstream question is a per-interval COUNT + exact SUM, the
  * pairs are never needed: merge points and interval endpoints into one
  * value-ordered stream and read two prefix sums per interval —
  * O((n+q) log) with output linear in q, at any density.
  *
  * Distributed two-pass prefix sum (the llm_token_pack pattern):
  * range-partition the merged stream by (value, tag), local running
  * (count, centsSum) per partition, collect the per-partition totals
  * (bounded: one row per partition) to compute exclusive offsets, then a
  * second pass emits each probe's global prefix. Tag order pins the
  * inclusive-[lo, hi] semantics at equal values: lo-probe (0) sorts
  * BEFORE points (1), hi-probe (2) AFTER, so cnt(hi) − cnt(lo) counts
  * lo ≤ v ≤ hi exactly. Sums accumulate as LONG CENTS (exact for
  * 2-decimal money doubles, order-independent — the dsum contract), so
  * the answer is bit-identical under any partitioning.
  *
  * Intervals with zero qualifying points are dropped, matching the
  * join-then-aggregate form this replaces. */
object RangeAgg {

  /** Per-interval (cnt, sum) of `ptCol` values in [loCol, hiCol].
    * Output: (idCol, cnt: long, sum: double — exact cents/100). */
  def pointsInRangeAgg(points: DataFrame, ptCol: String,
                       intervals: DataFrame, idCol: String,
                       loCol: String, hiCol: String): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    // merged event stream: (v, tag, iid, c, cents)
    val pts = points.select(col(ptCol).cast("double").as("v"),
      lit(1).as("tag"), lit(-1L).as("iid"), lit(1L).as("c"),
      round(col(ptCol).cast("double") * 100).cast("long").as("cents"))
    def probe(vCol: String, tag: Int) = intervals
      .filter(col(loCol) <= col(hiCol))
      .select(col(vCol).cast("double").as("v"), lit(tag).as("tag"),
        col(idCol).cast("long").as("iid"), lit(0L).as("c"),
        lit(0L).as("cents"))
    val merged = pts.unionByName(probe(loCol, 0)).unionByName(probe(hiCol, 2))
      .as[(Double, Int, Long, Long, Long)]
    val prepared = merged
      .repartitionByRange(col("v"), col("tag"))
      .sortWithinPartitions("v", "tag")
      .persist()
    try {
      // pass 1: per-partition totals — one tiny row per partition
      val partials = prepared.mapPartitions { it =>
        var c = 0L; var s = 0L
        it.foreach { r => c += r._4; s += r._5 }
        Iterator.single((TaskContext.getPartitionId(), c, s))
      }.collect().sortBy(_._1)
      val nPart = prepared.rdd.getNumPartitions
      val offC = new Array[Long](nPart)
      val offS = new Array[Long](nPart)
      var accC = 0L; var accS = 0L
      partials.foreach { case (pid, c, s) =>
        offC(pid) = accC; offS(pid) = accS; accC += c; accS += s
      }
      val bcC = spark.sparkContext.broadcast(offC)
      val bcS = spark.sparkContext.broadcast(offS)
      // pass 2: emit each probe's global running (cnt, cents)
      val probes = prepared.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var c = bcC.value(pid); var s = bcS.value(pid)
        it.flatMap { r =>
          c += r._4; s += r._5
          if (r._2 == 1) Iterator.empty
          else Iterator.single((r._3, r._2, c, s))
        }
      }.toDF("iid", "tag", "rc", "rs")
      val out = probes.groupBy("iid")
        .agg(
          (max(when(col("tag") === 2, col("rc"))) -
            max(when(col("tag") === 0, col("rc")))).as("cnt"),
          (max(when(col("tag") === 2, col("rs"))) -
            max(when(col("tag") === 0, col("rs")))).as("cents"))
        .filter(col("cnt") > 0)
        .select(col("iid").as(idCol), col("cnt"),
          (col("cents").cast("double") / 100.0).as("sum"))
      // materialize before unpersisting the prepared stream
      out.localCheckpoint(true)
    } finally prepared.unpersist()
  }
}
