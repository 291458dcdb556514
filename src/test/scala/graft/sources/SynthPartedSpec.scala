package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** s20 pins: the storage-partitioned join's zero-Exchange plan under
  * v2 bucketing, result parity with the shuffled path, and the
  * mismatched-layout fallback (different `parts` → Spark must shuffle,
  * never silently co-locate incompatible key spaces).
  */
class SynthPartedSpec extends SparkSpec {

  private val SpjConfs = Seq(
    "spark.sql.sources.v2.bucketing.enabled" -> "true",
    "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

  private def withConfs[A](confs: Seq[(String, String)])(body: => A): A =
    graft.core.Util.withConfs(spark, confs)(body)

  private def parted(n: Long, parts: Int): DataFrame =
    spark.read.format("graft.sources.v2.SynthPartedSource")
      .option("numRows", n).option("parts", parts).load()

  private def joined(n1: Long, p1: Int, n2: Long, p2: Int): DataFrame =
    parted(n1, p1).as("a").join(parted(n2, p2).as("b"),
        col("a.part") === col("b.part") &&
          col("a.doc_id") === col("b.doc_id"))
      .groupBy(col("a.part").as("part"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("a.n_chars") + col("b.n_chars")).as("sum_chars"))
      .orderBy("part")

  test("matching layouts: SortMergeJoin with ZERO Exchange, agg included") {
    withConfs(SpjConfs) {
      val df = joined(10000, 8, 5000, 8)
      df.collect() // AQE finalizes the plan
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // no DATA exchange anywhere: the join co-locates on the reported
      // key partitions and the groupBy(part) reuses them; the one
      // permitted Exchange is the final ORDER BY's rangepartitioning
      // of the 8-row result (presentation, not data movement)
      assert(!plan.contains("Exchange hashpartitioning"),
        "storage-partitioned join must not shuffle:\n" + plan)
    }
  }

  test("result parity: SPJ path equals the shuffled path row for row") {
    val spj = withConfs(SpjConfs) {
      joined(10000, 8, 5000, 8).collect().toSeq
    }
    val shuffled = withConfs(SpjConfs.tail) { // bucketing OFF
      joined(10000, 8, 5000, 8).collect().toSeq
    }
    assert(spj == shuffled)
    assert(spj.map(_.getLong(1)).sum == 5000L) // every b row matches once
  }

  test("mismatched partition-value sets co-locate BY VALUE, still no shuffle") {
    withConfs(SpjConfs) {
      // measured, and stronger than a fallback: SPJ matches partitions
      // by their KEY VALUES, not their count — side A's values {0..7}
      // align with side B's {0..3}, the uncovered values pair with an
      // empty side, and the join still plans with zero data exchange
      val df = joined(10000, 8, 5000, 4)
      val rows = df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        "value-aligned SPJ expected, got a shuffle:\n" + plan)
      // a.part(8)==b.part(4) only where doc_id % 8 == doc_id % 4,
      // i.e. doc_id % 8 < 4 — 2500 of b's 5000 rows match
      assert(rows.map(_.getLong(1)).sum == 2500L)
    }
  }

  test("runtime V2 filtering: only the dim-matched partitions are planned") {
    import graft.sources.v2.SynthPartedV2
    def run(dppOn: Boolean): (Seq[String], Int) =
      withConfs(Seq(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled" ->
          dppOn.toString)) {
        SynthPartedV2.lastPlannedPartitions.set(-1)
        val rows = graft.SparkEntry
          .queries("s21_dpp_v2")(spark, sfDir)
          .collect().map(_.toString).toSeq
        (rows, SynthPartedV2.lastPlannedPartitions.get)
      }
    val (rowsOn, plannedOn) = run(dppOn = true)
    val (rowsOff, plannedOff) = run(dppOn = false)
    assert(rowsOn == rowsOff)        // pruning must never change rows
    assert(rowsOn.size == 2)
    assert(plannedOn == 2, s"runtime prune expected 2 of 8, got $plannedOn")
    assert(plannedOff == 8, s"without DPP all partitions plan, got $plannedOff")
  }

  test("runtime filter semantics: conjunctive intersect, empty set prunes ALL") {
    import org.apache.spark.sql.connector.expressions.{Expressions => E}
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    def planned(preds: Array[Predicate]): Int = {
      val scan = new graft.sources.v2.SynthPartedScanBuilder(1000L, 8)
        .build().asInstanceOf[graft.sources.v2.SynthPartedScan]
      scan.filter(preds)
      scan.planInputPartitions().length
    }
    val part = E.column("part")
    def in(vs: Long*) =
      new Predicate("IN", (part +: vs.map(v => E.literal(v))).toArray)
    def eq(v: Long) = new Predicate("=", Array(part, E.literal(v)))

    assert(planned(Array(in(1L, 2L))) == 2)
    // conjunction in ONE call intersects: IN (1,2) AND part = 5 -> {}
    assert(planned(Array(in(1L, 2L), eq(5L))) == 0)
    // the empty IN an empty dim produces is the STRONGEST prune
    assert(planned(Array(in())) == 0)
    // unrecognized predicates prune nothing (never half-applied)
    assert(planned(Array(new Predicate(">=", Array(part, E.literal(3L))))) == 8)
    // successive filter() calls intersect too
    val scan = new graft.sources.v2.SynthPartedScanBuilder(1000L, 8)
      .build().asInstanceOf[graft.sources.v2.SynthPartedScan]
    scan.filter(Array(in(1L, 2L, 3L)))
    scan.filter(Array(in(2L, 3L, 4L)))
    assert(scan.planInputPartitions().length == 2)
  }
}
