package graft

import graft.functions.TextExprs
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.NfcNormalize
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The native NFC-normalization expression: canonical composition against
  * java.text.Normalizer ground truth, the ASCII identity fast path, null
  * flow, SQL registration, and the q126 length invariant. All non-ASCII
  * in this file is written as explicit \uXXXX escapes so no tool can
  * silently NFC-compose the source and vacuate the decomposed fixtures.
  */
class TextExprsSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}
  import spark.implicits._

  private val decomposedCafe = "caf" + "e\u0301" // e + COMBINING ACUTE
  private val composedCafe = "caf\u00e9"

  test("nfc composes decomposed sequences to their canonical form") {
    val got = Seq(decomposedCafe, "u\u0308ber", "plain ascii", "")
      .toDF("s").select(TextExprs.nfc(col("s"))).as[String].collect()
    assert(got(0) == composedCafe)
    assert(got(1) == "\u00fcber")
    assert(got(2) == "plain ascii")
    assert(got(3) == "")
  }

  test("nfc is identity on already-NFC text and null-preserving") {
    val got = Seq(Some(composedCafe), None)
      .toDF("s").select(TextExprs.nfc(col("s"))).collect()
    assert(got(0).getString(0) == composedCafe)
    assert(got(1).isNullAt(0))
  }

  test("ASCII fast path returns the input UTF8String untouched") {
    val ascii = UTF8String.fromString("nothing to compose here")
    assert(NfcNormalize.nfcJava(ascii) eq ascii)
    // already-composed non-ASCII also avoids re-encoding
    val composed = UTF8String.fromString(composedCafe)
    assert(NfcNormalize.nfcJava(composed) eq composed)
  }

  test("nfcJava agrees with java.text.Normalizer on mixed samples") {
    // decomposed accents compose; the fi ligature is COMPATIBILITY, so
    // NFC must leave it alone (NFKC would fold it)
    val samples = Seq(decomposedCafe, "A\u030a", "\ufb01sh", "x", "")
    samples.foreach { s =>
      val expect = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      assert(NfcNormalize.nfcJava(UTF8String.fromString(s)).toString == expect)
    }
  }

  test("graft_nfc is SQL-registered via GraftExtensions") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT graft_nfc('caf' || 'e\u0301')").as[String].head()
    assert(got == composedCafe)
  }

  test("q126 composes exactly the two planted sequences per row") {
    val rows = SparkEntry.byName("q126_nfc_normalize").run(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getLong(1) - r.getLong(2) == 2,
        s"doc ${r.getLong(0)}: expected exactly 2 composed pairs")
    }
    assert(rows.head.getString(3).endsWith("\u00fcber"))
  }
}
