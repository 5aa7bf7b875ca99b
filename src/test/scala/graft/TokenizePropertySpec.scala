package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

/** Property-based pin of the tokenizer's core invariant: CleanToken is the
  * reference's BYTE-WISE loop (tolower each byte, keep only a-z —
  * /root/reference/src/tema1.h token cleaning), so the executable model is
  * defined over UTF-8 BYTES, not code points. ScalaCheck drives it across
  * ASCII, Latin-1, CJK, emoji, and adversarial mixed strings — the golden
  * corpus can't cover that input space.
  */
class TokenizePropertySpec extends AnyFunSuite {

  /** The reference model: per UTF-8 byte, ASCII tolower, keep [a-z]. */
  private def model(s: String): String = {
    val kept = s.getBytes("UTF-8").map { b =>
      if (b >= 'A'.toByte && b <= 'Z'.toByte) (b + 32).toByte else b
    }.filter(b => b >= 'a'.toByte && b <= 'z'.toByte)
    new String(kept, "UTF-8")
  }

  private def clean(s: String): String =
    graft.plans.CleanToken.clean(UTF8String.fromString(s)).toString

  private val anyText: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.alphaNumStr,
    Gen.listOf(Gen.oneOf("é", "ß", "中", "文", "🙂", "Ü", "a", "Z", "-", "'", " ", "0", "\t"))
      .map(_.mkString),
    Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue))
      .map(_.filterNot(Character.isSurrogate).mkString))

  private def checkProp(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("CleanToken == byte-wise reference model on arbitrary strings") {
    checkProp(Prop.forAll(anyText) { s => clean(s) == model(s) })
  }

  test("CleanToken is idempotent and always lowercase-alpha") {
    checkProp(Prop.forAll(anyText) { s =>
      val once = clean(s)
      clean(once) == once && once.forall(c => c >= 'a' && c <= 'z')
    })
  }
}
