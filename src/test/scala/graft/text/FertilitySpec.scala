package graft.text

import graft.{SparkEntry, SparkSpec}

/** llm_token_fertility: the per-(source, lang) tokenizer-cost table must
  * equal a plain-Scala recomputation from the raw documents (independent
  * twin of both the kernels and the aggregation). */
class FertilitySpec extends SparkSpec {

  private def wsTokens(t: String): Seq[String] =
    t.split("\\s+").filter(_.nonEmpty).toSeq

  private def bpeishCount(t: String): Long =
    "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]".r.findAllIn(t).length.toLong

  private def langOf(t: String): String = {
    val toks = wsTokens(t.toLowerCase)
    def hits(stops: Seq[String]) = toks.count(stops.contains).toLong
    val (en, es, de, fr) = (hits(TextStats.enStops), hits(TextStats.esStops),
      hits(TextStats.deStops), hits(TextStats.frStops))
    val mx = Seq(en, es, de, fr).max
    if (mx == 0) "unk"
    else if (en == mx) "en" else if (es == mx) "es"
    else if (de == mx) "de" else "fr"
  }

  test("fertility table matches a plain-Scala recomputation on sf0.001") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy { case (src, t) => (src, langOf(t)) }
      .map { case ((src, lang), rows) =>
        val words = rows.map(r => wsTokens(r._2).size.toLong).sum
        val subs = rows.map(r => bpeishCount(r._2)).sum
        val bytes = rows.map(r => r._2.getBytes("UTF-8").length.toLong).sum
        val fert = math.round(subs.toDouble / math.max(words, 1L) * 1e6) / 1e6
        val bpt = math.round(bytes.toDouble / math.max(subs, 1L) * 1e6) / 1e6
        (src, lang) -> ((rows.size.toLong, words, subs, bytes, fert, bpt))
      }
    val got = SparkEntry.queries("llm_token_fertility")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7)))).toMap
    assert(got.keySet == expected.keySet)
    for ((k, v) <- expected) assert(got(k) == v, s"group $k")
    // sanity: the synthetic corpus is predominantly English
    val enDocs = got.collect { case ((_, "en"), t) => t._1 }.sum
    assert(enDocs > got.values.map(_._1).sum / 2)
  }
}
