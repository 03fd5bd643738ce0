package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** nfc_norm pinned to the JDK Normalizer on randomized
  * combining-mark strings (the codegen and interpreted paths must
  * both produce exactly `Normalizer.normalize(s, NFC)`), plus the
  * allocation-free identity fast path on already-NFC text.
  */
class NfcNormSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  test("nfc_norm equals java.text.Normalizer.NFC on randomized strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val marks = Seq("\u0301", "\u0308", "\u0327", "\u0300")
    val strs = (1 to 300).map { _ =>
      (0 until rnd.nextInt(16)).map { _ =>
        val c = ('a' + rnd.nextInt(26)).toChar.toString
        if (rnd.nextInt(3) == 0) c + marks(rnd.nextInt(marks.length)) else c
      }.mkString
    }
    val got = strs.toDF("s").selectExpr("s", "nfc_norm(s) AS n")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    strs.foreach { s =>
      assert(got(s) ==
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
    // the fold is exercised: some string actually got shorter
    assert(strs.exists(s => got(s).length < s.length))
    // already-NFC text passes through untouched (same UTF8String)
    val ascii = UTF8StringOf("plain ascii 123")
    assert(NfcNorm.normalize(ascii) eq ascii)
  }

  private def UTF8StringOf(s: String) =
    org.apache.spark.unsafe.types.UTF8String.fromString(s)
}
