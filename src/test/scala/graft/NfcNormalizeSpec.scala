package graft

import org.apache.spark.sql.functions._
import graft.functions.NfcNormalize

/** [[graft.functions.NfcNormalize]] — semantics vs the JDK normalizer,
  * the zero-alloc ASCII fast path, null handling, astral-plane safety,
  * and whole-stage-codegen participation. Cross-engine agreement with
  * DuckDB's nfc_normalize is q285's oracle job; these tests pin the
  * expression itself. Every non-ASCII code point is spelled as an
  * explicit escape so no editor/tooling layer can silently re-normalize
  * the fixtures. */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val eAcute = "\u00e9"                 // é precomposed
  private val eDecomp = "e\u0301"               // e + combining acute
  private val sDots = "\u1e69"                  // s with dot below+above
  private val sDotsDecomp = "s\u0323\u0307"     // decomposed, marks in
                                                // canonical order

  test("composes decomposed sequences and matches the JDK normalizer") {
    val cases = Seq(
      s"caf$eDecomp",
      s"caf$eAcute",
      "A\u030angstro\u0308m",   // A+ring, o+diaeresis from marks
      sDots,
      sDotsDecomp,
      "plain ascii only",
      "")
    val out = spark.createDataset(cases).toDF("s")
      .select(expr("nfc_normalize(s)").as("n")).as[String].collect()
    cases.zip(out).foreach { case (in, got) =>
      val want = java.text.Normalizer.normalize(
        in, java.text.Normalizer.Form.NFC)
      assert(got == want, s"input ${in.codePoints().toArray.toSeq}")
    }
    // the decomposed spellings really did converge onto the composed ones
    assert(out(0) == s"caf$eAcute")
    assert(out(3) == out(4) && out(4) == sDots)
  }

  test("ascii fast path returns the input untouched; null propagates") {
    import org.apache.spark.unsafe.types.UTF8String
    val ascii = UTF8String.fromString("nothing to do here")
    // reference equality — the fast path must not copy
    assert(NfcNormalize.nfc(ascii) eq ascii)
    // already-NFC non-ASCII also avoids the rebuild
    val composed = UTF8String.fromString(s"caf$eAcute")
    assert(NfcNormalize.nfc(composed) eq composed)
    val out = Seq(Some(s"caf$eDecomp"), None).toDF("s")
      .select(expr("nfc_normalize(s)")).collect()
    assert(out(0).getString(0) == s"caf$eAcute")
    assert(out(1).isNullAt(0))
  }

  test("astral-plane code points survive normalization") {
    // surrogate pairs must round-trip intact next to composing text
    val grin = new String(Character.toChars(0x1F600))
    val s = s"$grin ok $eDecomp $grin"
    val got = Seq(s).toDF("s")
      .select(expr("nfc_normalize(s)")).as[String].head()
    assert(got ==
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    assert(got.contains(grin) && got.contains(eAcute))
  }

  test("nfc_normalize participates in whole-stage codegen") {
    val plan = Tables.load(spark, sf001, "documents")
      .select(expr("nfc_normalize(text)").as("n"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("nfc_normalize") && l.trim.startsWith("*(")),
      s"nfc_normalize not inside a codegen stage:\n$plan")
  }
}
