package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts of the gear-hash CDC chunker. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def cutsOf(s: String, minLen: Int = 16, maxLen: Int = 128,
                     bits: Int = 6): Seq[Int] =
    Cdc.cuts(s, minLen, maxLen, bits).toIntArray().toSeq

  test("cuts: bounds, coverage, determinism") {
    val rng = new scala.util.Random(11)
    val text = (0 until 2000).map(_ => ('a' + rng.nextInt(26)).toChar)
      .mkString
    val cuts = cutsOf(text)
    // every chunk within [minLen, maxLen] except the final partial one
    val lens = (0 +: cuts.init).zip(cuts).map { case (a, b) => b - a }
    assert(lens.init.forall(l => l >= 16 && l <= 128), lens)
    assert(lens.last >= 1 && lens.last <= 128)
    assert(cuts.last == text.length) // full coverage, no gap
    assert(cuts == cutsOf(text))     // deterministic
    assert(cutsOf("") == Seq.empty)  // empty text -> no chunks
    // expected chunk length ~2^6: the 2000-char text must actually
    // chunk (not one giant maxLen run), or the mask is dead
    assert(cuts.length > 5, s"only ${cuts.length} chunks")
  }

  test("content-defined: an edit perturbs only chunks before re-sync") {
    // THE property that distinguishes CDC from fixed-size chunking: a
    // prefix insertion shifts every fixed-size boundary, but gear
    // boundaries re-synchronize at the first content-determined cut
    // after the edit — the suffix chunks have identical content again.
    val rng = new scala.util.Random(12)
    val text = (0 until 3000).map(_ => ('a' + rng.nextInt(26)).toChar)
      .mkString
    val edited = "INSERTED-PREFIX-" + text
    def chunkSet(s: String): Set[String] = {
      val cuts = cutsOf(s)
      (0 +: cuts.init).zip(cuts).map { case (a, b) =>
        s.substring(a, b)
      }.toSet
    }
    val orig = chunkSet(text)
    val ed = chunkSet(edited)
    val shared = orig.intersect(ed).size
    info(s"chunks orig=${orig.size} edited=${ed.size} shared=$shared")
    // the vast majority of chunks survive the edit verbatim
    assert(shared >= orig.size - 4,
      s"edit perturbed too many chunks: $shared of ${orig.size} shared")
  }

  test("SQL surface matches the JVM kernel and respects defaults") {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog " * 5))
      .toDF("id", "text")
    val viaSql = df.select(
        call_function("graft_cdc_cuts", $"text", lit(16), lit(128), lit(6)))
      .as[Seq[Int]].head()
    assert(viaSql == cutsOf("the quick brown fox jumps over the lazy dog " * 5))
    // 1-arg default form = (16, 128, 6)
    val viaDefault = df.select(call_function("graft_cdc_cuts", $"text"))
      .as[Seq[Int]].head()
    assert(viaDefault == viaSql)
  }

  /** The DuckDB twin's semantics replayed exactly: CHARACTER-indexed
    * walk (substr counts codepoints) hashing codepoint % 256. The JVM
    * kernel walks UTF-16 UNITS hashing `char & 0xFF`. For every BMP
    * codepoint the two coincide — one UTF-16 unit == the codepoint, and
    * `unit & 0xFF == codepoint % 256` — so the cross-engine contract is
    * actually all of BMP, not just ASCII. Astral codepoints (U+10000+)
    * are where they part: the kernel sees TWO surrogate units (two hash
    * steps, positions advance by 2), the twin one character. */
  private def twinCuts(s: String, minLen: Int = 16, maxLen: Int = 128,
                       bits: Int = 6): Seq[Int] = {
    val mask = (1 << bits) - 1
    val cps = s.codePoints().toArray
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var h = 0
    var start = 0
    var i = 0
    while (i < cps.length) {
      h = ((h << 1) + (Cdc.gear(cps(i) % 256) & mask).toInt) & mask
      val len = i - start + 1
      if ((len >= minLen && h == 0) || len >= maxLen) {
        out += i + 1; start = i + 1
      }
      i += 1
    }
    if (start < cps.length) out += cps.length
    out.toSeq
  }

  test("cross-engine contract: twin agrees on ALL BMP text, diverges on astral") {
    // BMP beyond ASCII: accented Latin, Greek, Cyrillic, CJK — the twin
    // and the kernel must produce identical cut sequences (this is what
    // lets the llm_cdc_* oracle hold on any BMP fixture, not only the
    // ASCII documents table)
    val rng = new scala.util.Random(14)
    val bmpAlphabet = "éüßñåçøπλΩцыдяшü中文漢字テスト한국어abcxyz .,"
    val bmp = (0 until 4000)
      .map(_ => bmpAlphabet(rng.nextInt(bmpAlphabet.length))).mkString
    assert(bmp.codePoints().count() == bmp.length) // all BMP, 1 unit each
    assert(cutsOf(bmp) == twinCuts(bmp), "BMP text must agree cross-engine")
    // mixed ASCII + BMP agrees too
    val mixed = "prefix " * 40 + bmp + " suffix" * 40
    assert(cutsOf(mixed) == twinCuts(mixed))

    // astral: surrogate pairs make the kernel's positions UTF-16-unit
    // counts while the twin counts characters — the divergence is real
    // and PINNED here so a non-BMP fixture fails loudly in this spec,
    // not confusingly in a hash mismatch
    val astral = ("some text with emoji 😀🚀 " * 120)
    assert(astral.codePoints().count() < astral.length) // has astral cps
    assert(cutsOf(astral) != twinCuts(astral),
      "astral divergence vanished — update the documented CDC contract")
    // the kernel's own positions remain UTF-16-consistent: full coverage
    // in units, so substring extraction downstream never splits OOB
    assert(cutsOf(astral).last == astral.length)
  }

  test("shared regions across documents chunk identically (dedup alignment)") {
    // two docs sharing a long middle region: chunk-level dedup
    // (group by chunk hash) must align the shared region even though
    // its OFFSET differs between the docs
    val rng = new scala.util.Random(13)
    def rand(n: Int) =
      (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val shared = rand(4000)
    val docA = rand(300) + shared + rand(100)
    val docB = rand(700) + shared // different prefix length AND suffix
    def chunks(s: String): Seq[String] = {
      val cuts = cutsOf(s)
      (0 +: cuts.init).zip(cuts).map { case (a, b) => s.substring(a, b) }
    }
    val common = chunks(docA).toSet.intersect(chunks(docB).toSet)
    // interior chunks align once the two walks place a cut at the same
    // shared offset; entry (sync-up takes a few chunk lengths — h and
    // len-since-cut both have to coincide), the exit straddle, and
    // docB's final partial each cost up to ~maxLen chars of alignment
    // toSeq first: mapping a Set[String] to lengths would COLLAPSE
    // duplicate lengths before the sum (measured: 2103 vs the true 3836)
    val sharedChars = common.toSeq.map(_.length).sum
    info(s"aligned shared chars: $sharedChars of ${shared.length}")
    assert(sharedChars >= shared.length - 10 * 128,
      s"only $sharedChars of ${shared.length} shared chars aligned")
    assert(common.size >= 10, s"too few aligned chunks: ${common.size}")
  }
}
