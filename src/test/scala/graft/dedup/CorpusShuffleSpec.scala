package graft.dedup

import graft.SparkSpec

class CorpusShuffleSpec extends SparkSpec {
  import spark.implicits._

  test("dense 0..n-1 permutation in md5 order, partition-count invariant") {
    val ids = (0L until 315L).toDF("doc_id")
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(i: Long) = md.digest(i.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val want = (0L until 315L).sortBy(i => (h(i), i)).zipWithIndex
      .map { case (id, p) => id -> p.toLong }.toMap
    for (parts <- Seq(1, 7)) {
      val got = Curation.corpusShuffle(ids, "doc_id", numPartitions = parts)
        .select("doc_id", "shuffle_pos").as[(Long, Long)].collect().toMap
      assert(got.values.toSeq.sorted == (0L until 315L))
      assert(got == want, s"parts=$parts")
    }
  }

  test("empty frame gives empty result") {
    val empty = Seq.empty[Long].toDF("doc_id")
    assert(Curation.corpusShuffle(empty, "doc_id").count() == 0)
  }
}
