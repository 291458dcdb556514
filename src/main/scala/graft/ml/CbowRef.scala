package graft.ml

import scala.collection.mutable

/** Minimal CBOW word2vec with negative sampling — a compact, seeded
  * re-implementation of the gensim-DEFAULT training family (Mikolov et
  * al. 2013; gensim's `Word2Vec(sg=0)`). The reference trains gensim
  * with defaults (word2vec_dbscan_approach.ipynb:28587), while Spark ML
  * only offers skip-gram + hierarchical softmax — SURVEY §7 documents
  * that delta; this twin exists to MEASURE it: W2vDeltaSpec embeds the
  * corpus both ways and gates downstream DBSCAN label agreement.
  *
  * Deliberately driver-side and deterministic (sequential updates, one
  * fixed-seed RNG, no hogwild/threading): the point is a reproducible
  * measurement instrument, not a training engine — the distributed
  * trainer remains [[Embed.word2vec]].
  */
object CbowRef {

  final case class Model(vocab: Map[String, Int],
                         vecs: Array[Array[Float]]) {
    def vector(w: String): Option[Array[Float]] = vocab.get(w).map(vecs)

    /** Sentence vector: mean of known-token input vectors (the same
      * averaging [[Embed.sentence2vec]] applies); zero vector when no
      * token is in vocabulary. */
    def sentenceVector(tokens: Seq[String], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var n = 0
      tokens.foreach { t =>
        vector(t).foreach { v =>
          var i = 0; while (i < dim) { out(i) += v(i); i += 1 }; n += 1
        }
      }
      if (n > 0) { var i = 0; while (i < dim) { out(i) /= n; i += 1 } }
      out
    }
  }

  def train(sentences: Seq[Seq[String]], dim: Int = 16, window: Int = 5,
            epochs: Int = 3, negatives: Int = 5, lr: Double = 0.025,
            minCount: Int = 1, seed: Long = 42L): Model = {
    // vocab: frequency-sorted (count desc, then word — deterministic)
    val counts = mutable.HashMap.empty[String, Long]
    sentences.foreach(_.foreach(w => counts(w) = counts.getOrElse(w, 0L) + 1))
    val vocabWords = counts.toSeq.filter(_._2 >= minCount)
      .sortBy { case (w, c) => (-c, w) }.map(_._1)
    val vocab = vocabWords.zipWithIndex.toMap
    val v = vocabWords.length
    if (v == 0) return Model(Map.empty, Array.empty)
    val rng = new scala.util.Random(seed)
    // input vectors small-random, output vectors zero (the word2vec.c
    // initialization)
    val in = Array.fill(v, dim)(((rng.nextDouble() - 0.5) / dim).toFloat)
    val out = Array.fill(v, dim)(0.0f)
    // unigram^0.75 negative-sampling table as a cumulative array +
    // binary search (equivalent to word2vec.c's 1e8-slot table without
    // the memory)
    val pow = vocabWords.map(w => math.pow(counts(w).toDouble, 0.75))
    val cum = pow.scanLeft(0.0)(_ + _).tail.toArray
    val total = cum.last
    def sampleNeg(): Int = {
      val x = rng.nextDouble() * total
      val i = java.util.Arrays.binarySearch(cum, x)
      math.min(if (i >= 0) i else -i - 1, v - 1)
    }
    def sigmoid(x: Double): Double =
      if (x > 6) 1.0 else if (x < -6) 0.0 else 1.0 / (1.0 + math.exp(-x))
    val ids = sentences.map(_.flatMap(vocab.get).toArray)
    for (_ <- 0 until epochs; sent <- ids; pos <- sent.indices) {
      val center = sent(pos)
      // gensim-style randomized effective window ∈ [1, window]
      val b = rng.nextInt(window) + 1
      val ctx = (math.max(0, pos - b) until math.min(sent.length, pos + b + 1))
        .filter(_ != pos).map(sent)
      if (ctx.nonEmpty) {
        // forward: mean of context inputs (cbow_mean=1, the default)
        val h = new Array[Double](dim)
        ctx.foreach { c =>
          var i = 0; while (i < dim) { h(i) += in(c)(i); i += 1 }
        }
        var i = 0; while (i < dim) { h(i) /= ctx.length; i += 1 }
        val gradH = new Array[Double](dim)
        // center as positive + `negatives` sampled negatives
        var t = 0
        while (t <= negatives) {
          val (target, label) =
            if (t == 0) (center, 1.0)
            else (sampleNeg(), 0.0)
          if (t == 0 || target != center) {
            var dot = 0.0
            i = 0; while (i < dim) { dot += h(i) * out(target)(i); i += 1 }
            val g = (label - sigmoid(dot)) * lr
            i = 0
            while (i < dim) {
              gradH(i) += g * out(target)(i)
              out(target)(i) = (out(target)(i) + g * h(i)).toFloat
              i += 1
            }
          }
          t += 1
        }
        // backward to each context input (mean ⇒ gradient split)
        ctx.foreach { c =>
          var i = 0
          while (i < dim) {
            in(c)(i) = (in(c)(i) + gradH(i) / ctx.length).toFloat
            i += 1
          }
        }
      }
    }
    Model(vocab, in)
  }
}
