package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Quality gates for [[Similarity.semanticDedup]] (SemDeDup): the
  * cluster-scoped answer is measured against the EXACT all-pairs answer
  * (brute cosine + the same CC resolver) on the embeddings fixture —
  * the same measured-not-assumed pattern as the DBSCAN ARI gate. */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private val Tau = 0.9

  /** Exact all-pairs semantic-dup groups on a small frame (crossJoin is
    * the test-only oracle device, same contract as the exact-neardup
    * fixtures): every pair with cos >= tau, resolved by the SAME
    * dupGroups CC, so the comparison isolates the CLUSTER-SCOPING loss. */
  private def exactGroups(df: org.apache.spark.sql.DataFrame) = {
    val a = df.select(col("vec_id").as("id_a"), col("embedding").as("vec_a"))
    val b = df.select(col("vec_id").as("id_b"), col("embedding").as("vec_b"))
    val pairs = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .filter(Similarity.cosine(col("vec_a"), col("vec_b")) >= Tau)
      .select("id_a", "id_b")
    Curation.dupGroups(df.select("vec_id"), pairs, "vec_id")
  }

  test("semanticDedup: planted exact duplicates are always caught; " +
    "keeper convention holds") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // plant exact copies of three vectors under fresh ids: an identical
    // vector has identical centroid distances, so it ALWAYS lands in its
    // twin's cluster — catching it is deterministic, not probabilistic
    val copies = emb.filter($"vec_id".isin(3L, 57L, 200L))
      .select(($"vec_id" + 10000L).as("vec_id"), $"embedding")
    val df = emb.select("vec_id", "embedding").union(copies)
    val got = Similarity.semanticDedup(df, "vec_id", "embedding",
      k = 16, threshold = Tau)
    val byId = got.select("vec_id", "group_id", "is_keeper")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    for (id <- Seq(3L, 57L, 200L)) {
      assert(byId(id)._1 == byId(id + 10000L)._1,
        s"copy of $id not grouped with original")
      // lowest id is the keeper, the copy is not
      assert(byId(id)._2 && !byId(id + 10000L)._2)
    }
    // every group has exactly one keeper (min id)
    val keeperCounts = got.groupBy("group_id")
      .agg(sum(when($"is_keeper", 1).otherwise(0)).as("nk"))
      .select("nk").as[Long].collect()
    assert(keeperCounts.forall(_ == 1L))
  }

  test("semanticDedup: measured agreement with the exact all-pairs answer") {
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    // The raw fixture has NO natural near-dup pairs at tau=0.9 (verified:
    // exact non-keeper count 0 — the gate would be vacuous). Plant 30
    // seeded small perturbations (cos ≈ 0.95-0.999 to their originals) so
    // the exact dropped set is non-empty and recall is a real number.
    val rng = new scala.util.Random(7)
    val perturbed = base.filter($"vec_id" < 30L)
      .as[(Long, Seq[Float])].collect().map { case (id, v) =>
        val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
        val eps = 0.05 * norm / math.sqrt(v.size)
        (id + 10000L,
          v.map(x => x + (rng.nextDouble() * 2 - 1).toFloat * eps.toFloat))
      }.toSeq.toDF("vec_id", "embedding")
    val emb = base.union(perturbed).cache()
    // one crossJoin + CC pass feeds both views of the exact answer
    val exactRows = exactGroups(emb)
      .select(col("doc_id").as("vec_id"), col("is_keeper"),
        col("group_size"))
      .as[(Long, Boolean, Long)].collect()
    val exactDropped = exactRows.collect { case (id, false, _) => id }.toSet
    val exactGrouped = exactRows.collect { case (id, _, sz) if sz > 1 => id }.toSet
    info(s"exact all-pairs non-keepers at tau=$Tau: ${exactDropped.size}")
    val got = Similarity.semanticDedup(emb, "vec_id", "embedding",
        k = 16, threshold = Tau)
      .select("vec_id", "is_keeper").as[(Long, Boolean)].collect().toMap
    val gotDropped = got.filter(!_._2).keySet
    // cluster scoping can only MISS pairs, never invent them. Gate both
    // directions:
    // (a) no doc is dropped unless the exact answer puts it in SOME group
    //     (i.e. it has at least one true near-dup partner)
    assert(gotDropped.subsetOf(exactGrouped),
      s"dropped docs with no exact near-dup: ${gotDropped.diff(exactGrouped)}")
    // (b) recall of the exact dropped set — SemDeDup's documented trade,
    //     measured: same-cluster scoping must still find the bulk
    if (exactDropped.nonEmpty) {
      val recall = gotDropped.intersect(exactDropped).size.toDouble /
        exactDropped.size
      info(f"semanticDedup dropped-set recall vs exact = $recall%.2f " +
        s"(${gotDropped.size} vs ${exactDropped.size})")
      assert(recall >= 0.8, f"recall $recall%.2f < 0.8")
    }
    emb.unpersist()
  }
}
