package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Interpreted-eval property pin for `phrase_count` against a
  * plain-Scala sliding-window reference, plus the null/geometry
  * contract — the plan-level SearchSpec separately pins codegen ==
  * HOF on real corpora.
  */
class PhraseCountSpec extends AnyFunSuite {

  private def evalCount(ws: Seq[String], phrase: Seq[String]): Any =
    PhraseCount(
      Literal.create(ws, ArrayType(StringType, containsNull = true)),
      Literal.create(phrase, ArrayType(StringType, containsNull = true)))
      .eval(null)

  private def refCount(ws: Seq[String], phrase: Seq[String]): Long =
    if (ws.length < phrase.length) 0L
    else ws.sliding(phrase.length).count { win =>
      win.zip(phrase).forall { case (a, b) => a == b }
    }.toLong

  test("phrase_count equals the sliding-window reference on random corpora") {
    // small alphabet so matches and overlaps actually occur
    val word = Gen.oneOf("a", "b", "c")
    val gen = for {
      n <- Gen.choose(0, 40)
      ws <- Gen.listOfN(n, word)
      m <- Gen.choose(1, 4)
      ph <- Gen.listOfN(m, word)
    } yield (ws, ph)
    val prop = Prop.forAll(gen) { case (ws, ph) =>
      evalCount(ws, ph) == refCount(ws, ph)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("null and geometry contract") {
    // empty phrase → null (geometry violation)
    assert(evalCount(Seq("a", "b"), Seq.empty) == null)
    // null input array → null
    assert(PhraseCount(
      Literal.create(null, ArrayType(StringType, containsNull = true)),
      Literal.create(Seq("a"), ArrayType(StringType, containsNull = true)))
      .eval(null) == null)
    // a null words element matches only a null phrase element
    assert(evalCount(Seq("a", null, "b"), Seq("a", "b")) == 0L)
    assert(evalCount(Seq("a", null, "b"), Seq(null, "b")) == 1L)
    // words shorter than the phrase → 0
    assert(evalCount(Seq("a"), Seq("a", "a")) == 0L)
    // overlapping occurrences
    assert(evalCount(Seq("a", "a", "a"), Seq("a", "a")) == 2L)
  }
}
