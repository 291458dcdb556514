package graft.text

import graft.SparkSpec

class ChunkSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: Seq[String], win: Int, stride: Int) =
    Chunk.slidingChunks(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"), "doc_id", "text", win, stride)
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap

  test("windows, overlap, and tail chunk") {
    val r = run(Seq("a b c d e"), win = 3, stride = 2)(0L)
    assert(r.map(c => (c._3, c._4, c._6)).toSeq ==
      Seq((0L, 3L, "a b c"), (2L, 5L, "c d e")))
  }

  test("doc of exactly win tokens is one chunk; win+1 is two") {
    val r = run(Seq("a b c", "a b c d"), win = 3, stride = 2)
    assert(r(0L).map(_._6).toSeq == Seq("a b c"))
    assert(r(1L).map(c => (c._3, c._4)).toSeq == Seq((0L, 3L), (2L, 4L)))
  }

  test("blank doc survives as one empty chunk (provenance is total)") {
    val r = run(Seq("", "   "), win = 4, stride = 2)
    // str.split semantics: blank -> [""] -> n=1 -> one chunk of ""
    assert(r(0L).map(c => (c._2, c._5, c._6)).toSeq == Seq((0L, 1L, "")))
    assert(r(1L).map(_._6).toSeq == Seq(""))
  }

  test("null text survives as one empty chunk, same as blank") {
    val df = Seq((0L, Option.empty[String]), (1L, Some("a b")))
      .toDF("doc_id", "text")
    val r = Chunk.slidingChunks(df, "doc_id", "text", 4, 2)
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .groupBy(_._1)
    // a NULL text must not vanish under explode-over-null — it coalesces
    // to "" and gets the single-empty-token chunk
    assert(r(0L).map(c => (c._2, c._5, c._6)).toSeq == Seq((0L, 1L, "")))
    assert(r(1L).map(_._6).toSeq == Seq("a b"))
  }

  test("every token index is covered and overlap is win-stride") {
    val text = (1 to 103).map(i => s"t$i").mkString(" ")
    val r = run(Seq(text), win = 16, stride = 12)(0L)
    val covered = r.flatMap(c => c._3 until c._4).toSet
    assert(covered == (0L until 103L).toSet)
    for (Array(a, b) <- r.sliding(2))
      assert(a._4 - b._3 >= 16 - 12 || a._4 == 103L)
    assert(r.forall(c => c._5 == c._4 - c._3 && c._5 <= 16))
  }

  test("stride > win rejected") {
    intercept[IllegalArgumentException] {
      Chunk.slidingChunks(Seq((0L, "x")).toDF("doc_id", "text"),
        "doc_id", "text", win = 2, stride = 3)
    }
  }
}
