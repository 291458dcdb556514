package graft.expr

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** NFC kernel gate (the exact-value gate is the DuckDB nfc_normalize
  * oracle on llm_nfc_normalize). All fixtures use explicit \u escapes —
  * source-literal accents are ambiguous about their own normal form. */
class NfcSpec extends AnyFunSuite {

  private def nfc(s: String): String =
    NfcNormalize.nfc(UTF8String.fromString(s)).toString

  test("composes decomposed sequences to precomposed codepoints") {
    assert(nfc("e\u0301") == "\u00e9")            // e + acute → é
    assert(nfc("o\u0308") == "\u00f6")            // o + diaeresis → ö
    assert(nfc("erro\u0308r") == "err\u00f6r")
    assert(nfc("e\u0301").length == 1)
  }

  test("ASCII fast path returns the input unchanged") {
    assert(nfc("plain ascii text 123") == "plain ascii text 123")
    assert(nfc("") == "")
  }

  test("already-composed text is a fixpoint") {
    assert(nfc("\u00e9\u00f6") == "\u00e9\u00f6")
    val once = nfc("a\u0301b\u0308")
    assert(nfc(once) == once)
  }

  private def strip(s: String): String =
    graft.expr.NfcNormalize.stripAccents(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString

  test("stripAccents folds both precomposed and combining forms") {
    assert(strip("caf\u00e9") == "cafe") // precomposed \u00e9
    assert(strip("cafe\u0301") == "cafe") // e + combining acute
    assert(strip("na\u00efve \u00dcbung") == "naive Ubung")
  }

  test("stripAccents keeps non-decomposable letters (DuckDB contract)") {
    // \u00c6 and \u00f8 carry no combining marks after NFD \u2014 strip_accents in
    // DuckDB keeps them too, which is what makes the oracle exact
    assert(strip("sm\u00f6rg\u00e5sbord \u00c6r\u00f8") ==
      "smorgasbord \u00c6r\u00f8")
    assert(strip("plain ascii") == "plain ascii")
  }
}
