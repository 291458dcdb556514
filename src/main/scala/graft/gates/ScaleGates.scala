package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Similarity

/** Scale-portable gates for the golden-VALUES query family (r13 VERDICT
  * #1). The frozen twins pin exact values at the sf0.01 oracle-gate
  * scale; OFF that fixture those queries previously had no correctness
  * signal at all — they failed loudly by design. Each gate here is the
  * off-fixture branch of one such query: rows in the query's EXISTING
  * schema whose cells are either
  *
  *  (a) live-derivable in the DuckDB twin at ANY scale (counts, id
  *      sets, splitmix-derived asset parameters, length stats) — a
  *      genuine cross-engine check, or
  *  (b) thresholded self-check flags (ANN recall vs brute force,
  *      DBSCAN ARI vs the exact driver twin, quantile rank error vs
  *      the exact order statistic, MMR structural invariants): the
  *      engine-internal quality gates the specs run at fixture scale,
  *      promoted so EVERY sweep scale evaluates them.
  *
  * A failing flag emits the measured value instead of 1.0, so the hash
  * compare fails loudly AND shows what was measured. The twins branch
  * on the same live row count, so both engines pick the same arm at
  * every scale; at the sf0.01 fixture the behavior (and hash) is
  * byte-identical to the pre-r14 frozen goldens.
  */
object ScaleGates {

  /** The oracle-gate fixture: 500 documents / 500 embeddings at
    * sf0.01. (sf0.001 also has 500 rows of different content; it is
    * smoke-only — never oracle-compared — and the fixture arm fails
    * loudly there exactly as the frozen goldens always did.) */
  val FixtureRows = 500L

  /** Orders-table fixture count at sf0.01 (a6_quantiles_approx). */
  val FixtureOrders = 15000L

  /** Events-table fixture count at sf0.01 (a23_theta_sets). */
  val FixtureEvents = 10000L

  def atFixture(df: DataFrame, expected: Long = FixtureRows): Boolean =
    df.count() == expected

  /** 1.0 when the measured metric clears `floor`, else the measurement
    * itself (1e-4-rounded so the mismatch is readable in the compare
    * output, and never accidentally equal to the pass value). */
  def flag(measured: Double, floor: Double): Double =
    if (measured >= floor) 1.0
    else {
      val r = math.round(measured * 1e4) / 1e4
      if (r == 1.0) 0.9999 else r
    }

  /** Cap on the exact side of the ANN recall gates (r14 VERDICT #1):
    * past this many vectors the gate evaluates recall on a
    * deterministic hash-sampled sub-corpus of roughly this size (the
    * strided query ids always included), instead of paying a
    * full-corpus brute-force pass per sweep — r13 #1's "capped seeded
    * sample" as originally specified. Below the cap the gate corpus IS
    * the corpus, so sf0.1/sf1 behavior is unchanged; the cap first
    * binds at the sf10 200k-vector sweep. */
  val AnnGateCap = 100000L

  /** Sampled-endpoint stride for the three blocked near-dup oracle
    * twins (r15 VERDICT #2). Through sf1 (n ≤ [[NearDupFullCap]]) the
    * stride is 1 — the FULL blocked inverted-index twin runs (109–176 s
    * at sf1, inside the watchdog). Past it, stride = n/[[
    * NearDupSampleTarget]] (31 at the 500k-doc sf10 sweep): the oracle
    * joins only sampled docs' shingle postings against the full index —
    * cost full/stride — and the ENGINE's full-corpus run is compared
    * restricted to pairs touching a sampled id (the dup-groups twin
    * instead verifies the operator on the induced sampled sub-corpus,
    * since component ids depend on global connectivity). Both engines
    * derive the stride from the same live doc count, so they always
    * pick the same arm; a forced-stride fixture twin
    * (llm_near_dedup_sampled / llm_dup_groups_sampled) pins the
    * sampled SQL form against the engine at every driver run. */
  val NearDupFullCap = 50000L
  val NearDupSampleTarget = 16000L
  def nearDupStride(n: Long): Long =
    if (n > NearDupFullCap) math.max(n / NearDupSampleTarget, 1L) else 1L

  /** Shared exact side of every ANN recall gate — computed ONCE per
    * (session, dir, n) and reused by the LSH/IVF/PQ/int8/MMR gates
    * (r14 measured each gate paying ~10 sequential brute-force corpus
    * scans of its own: ~40 O(n) passes per sweep across the family).
    *
    *  - `corpus`: the CACHED gate corpus (capped seeded sample past
    *    [[AnnGateCap]], the full frame below it). Callers build their
    *    approximate index over THIS frame and must not unpersist it —
    *    the memo owns it for the session ([[annGateReset]] drops it).
    *  - `exact`: ordered exact cosine top-k per query id over the gate
    *    corpus, computed in ONE corpus pass for all `nq` queries (a
    *    10-row broadcast join + per-query top-k window, not 10 scans).
    */
  final case class AnnGateCtx(n: Long, gateN: Long, corpus: DataFrame,
                              qids: Seq[Long],
                              qvec: Map[Long, Seq[Float]],
                              exact: Map[Long, Seq[Long]]) {
    /** The (q_id, q_vec) frame for batched approx paths. */
    def queryFrame(idCol: String, vecCol: String): DataFrame = {
      val spark = corpus.sparkSession
      import spark.implicits._
      qids.map(q => (q, qvec(q))).toDF(idCol, vecCol)
        .withColumn(vecCol, col(vecCol).cast("array<float>"))
    }
  }

  private val annCtxCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[(String, Long, Int, Int), AnnGateCtx]]())

  /** Drops the memoized exact table (and its cached corpus) for the
    * session — Bench calls this before each timed run of the family's
    * alphabetically-first member so the official record stamps the
    * real one-pass exact cost on the payer and memo reads on the rest
    * (the flagshipStatsCache pattern). */
  def annGateReset(spark: SparkSession): Unit = annCtxCache.synchronized {
    Option(annCtxCache.get(spark)).foreach { m =>
      m.values.foreach(c => c.corpus.unpersist(blocking = false))
      m.clear()
    }
  }

  /** Session-agnostic reset for Bench's hook (which only has the query
    * name): drops every session's memo. */
  def annGateResetAll(): Unit = annCtxCache.synchronized {
    import scala.jdk.CollectionConverters._
    annCtxCache.values.asScala.foreach { m =>
      m.values.foreach(c => c.corpus.unpersist(blocking = false))
      m.clear()
    }
  }

  /** Memoized shared gate context — see [[AnnGateCtx]]. `dirKey` keys
    * the memo (two fixture dirs can share a count). */
  def annCtx(emb: DataFrame, idCol: String, vecCol: String, dirKey: String,
             n: Long, nq: Int = 10, k: Int = 10,
             cap: Long = AnnGateCap): AnnGateCtx =
    annCtxCache.synchronized {
      val perKey = Option(annCtxCache.get(emb.sparkSession)).getOrElse {
        val m = scala.collection.mutable.Map
          .empty[(String, Long, Int, Int), AnnGateCtx]
        annCtxCache.put(emb.sparkSession, m); m
      }
      perKey.getOrElseUpdate((s"$dirKey#$cap", n, nq, k),
        buildAnnCtx(emb, idCol, vecCol, n, nq, k, cap))
    }

  private def buildAnnCtx(emb: DataFrame, idCol: String, vecCol: String,
                          n: Long, nq: Int, k: Int,
                          cap: Long): AnnGateCtx = {
    val spark = emb.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val base = emb.select(col(idCol), col(vecCol))
    // one job yields BOTH the strided query ids and their vectors
    // (sampleIds + a second vector-fetch scan was two)
    val stride = math.max(1L, n / nq)
    val qrows = base.filter(col(idCol) % stride === 0)
      .orderBy(col(idCol))
      .select(col(idCol).cast("long"), col(vecCol)).limit(nq)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq)
    val qids = qrows.map(_._1).toSeq
    val qvec = qrows.toMap
    val gate =
      if (n <= cap) base
      else {
        // seeded deterministic sub-corpus, query ids always in
        val mod = math.ceil(n.toDouble / cap).toLong
        base.filter(
          pmod(xxhash64(col(idCol).cast("long"), lit(42L)), lit(mod)) === 0 ||
          col(idCol).isin(qids.map(Long.box): _*))
      }
    val corpus = gate.cache()
    // below the cap the gate corpus IS the corpus: skip the count job
    val gateN = if (n <= cap) n else corpus.count()
    // ONE corpus pass scores every query: 10-row broadcast join, then
    // top-k per q_id (the window shuffles n×nq (long,long,double) rows
    // — 1M at the capped max, nothing like the 40 O(n·dim) scans the
    // per-gate per-qid brute force paid in r14)
    val qdf = qids.map(q => (q, qvec(q))).toDF("q_id", "q_vec")
      .withColumn("q_vec", col("q_vec").cast("array<float>"))
    val w = Window.partitionBy("q_id")
      .orderBy(desc("c"), col("cand"))
    val exact = corpus.crossJoin(broadcast(qdf))
      .select(col("q_id"), col(idCol).cast("long").as("cand"),
        Similarity.cosine(col(vecCol), col("q_vec")).as("c"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("q_id"), col("rn"), col("cand"))
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (q, rs) =>
        q -> rs.sortBy(_._2).map(_._3).toSeq
      }
    AnnGateCtx(n, gateN, corpus, qids, qvec, exact.toMap)
  }

  /** Emits the gate frame in the ANN queries' (vec_id, cos_sim) schema
    * from approximate result sets vs the ctx's shared exact table:
    *   (-1, recall flag)   — self-check, 1.0 expected
    *   (-2, corpus count)  — cross-engine (DuckDB recomputes the count;
    *                         always the FULL count, capped gate or not)
    */
  def recallFlagFrame(ctx: AnnGateCtx, approx: Long => Set[Long],
                      floor: Double = 0.9): DataFrame = {
    val spark = ctx.corpus.sparkSession
    import spark.implicits._
    val recalls = ctx.qids.map { qid =>
      val exact = ctx.exact.getOrElse(qid, Seq.empty).toSet
      if (exact.isEmpty) 1.0
      else approx(qid).intersect(exact).size.toDouble / exact.size
    }
    val mean = if (recalls.isEmpty) 0.0 else recalls.sum / recalls.size
    Seq((-1L, flag(mean, floor)), (-2L, ctx.n.toDouble))
      .toDF("vec_id", "cos_sim")
  }

  /** Batched LSH recall gate for the annTopK path: all `nq` query
    * vectors ride ONE annCosineJoin against the (possibly capped) gate
    * corpus — the PRODUCTION path, since annTopK delegates to the same
    * batch form. Exact side comes from the shared memoized table. */
  def annRecallGateBatched(ctx: AnnGateCtx, idCol: String, vecCol: String,
                           bands: Int, bitsPerBand: Int,
                           floor: Double = 0.9, k: Int = 10): DataFrame = {
    val spark = ctx.corpus.sparkSession
    import spark.implicits._
    val approxAll = Similarity.annTopKBatch(ctx.corpus, idCol, vecCol,
        ctx.queryFrame(idCol, vecCol), k, bands, bitsPerBand)
      .select(col("query_id"), col(idCol)).as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    recallFlagFrame(ctx, q => approxAll.getOrElse(q, Set.empty), floor)
  }


  /** One-row gate frame in the MMR query's (rank, doc_id, mmr_score)
    * schema: (-1, -1, invariants flag), (-2, corpus count, 0.0). The
    * invariants: exactly k distinct picks, all from the corpus, and the
    * first pick is the brute-force top-1 (lambda-damping never changes
    * pick #1 — the greedy's first step is pure relevance). */
  def mmrGate(emb: DataFrame, idCol: String, vecCol: String,
              reranked: DataFrame, ctx: AnnGateCtx, k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val picks = reranked.select(col("rank"), col("doc_id")).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val ids = picks.map(_._2)
    val inCorpus = emb.filter(col(idCol).isin(ids.map(Long.box): _*))
      .count() == ids.distinct.length
    val minRow = emb.orderBy(col(idCol))
      .select(col(idCol).cast("long"), col(vecCol)).head()
    val (minId, q) = (minRow.getLong(0), minRow.getSeq[Float](1))
    // the rerank's query is the min-id vector, which is also the first
    // strided ctx query id whenever ids start at a stride multiple — in
    // that (uncapped) case the shared exact table already holds the
    // brute-force top-1 and the extra corpus scan is skipped; a capped
    // ctx's exact side covers only the gate sub-corpus while the rerank
    // ran over the full frame, so it cannot arbitrate here
    val top1 =
      if (ctx.gateN == ctx.n && ctx.exact.get(minId).exists(_.nonEmpty))
        ctx.exact(minId).head
      else Similarity.bruteForceTopK(emb, idCol, vecCol, q, 1)
        .select(col(idCol).cast("long")).as[Long].head()
    val ok = picks.length == k && ids.distinct.length == k &&
      inCorpus && picks.minBy(_._1)._2 == top1
    Seq((-1, -1L, if (ok) 1.0 else 0.0), (-2, ctx.n, 0.0))
      .toDF("rank", "doc_id", "mmr_score")
  }

  /** ARI of the distributed DBSCAN labeling vs the exact driver twin on
    * the SAME bounded sample — the DbscanSpec quality gate promoted to
    * any scale. Emits rows in the (vec_id, label) schema:
    *   (-1, 100)      — when ARI >= floor (else round(ari*100))
    *   (-2, sample n) — cross-engine (DuckDB recounts the sample)
    */
  def dbscanAriGate(sample: DataFrame, idCol: String, featuresCol: String,
                    distributedLabels: DataFrame, eps: Double,
                    minPts: Int, floor: Double = 0.85): DataFrame = {
    val spark = sample.sparkSession
    import spark.implicits._
    val exact = graft.ml.Dbscan.exactOnFrame(
      sample, idCol, featuresCol, eps, minPts)
      .select(col(idCol), col("label").as("label_exact"))
    val joined = distributedLabels
      .select(col(idCol), col("label").as("label_dist"))
      .join(exact, idCol)
    val nSample = sample.count()
    val ari = graft.ml.Metrics
      .external(joined, "label_exact", "label_dist").adjustedRand
    val ariCell = if (ari >= floor) 100L else math.round(ari * 100)
    Seq((-1L, ariCell), (-2L, nSample)).toDF("vec_id", "label")
  }
}
