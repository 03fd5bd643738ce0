package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property pin for the persisted gram store: on ARBITRARY small
  * corpora — not just the driver fixture — a batch deduped against a
  * store (built whole or grown by append) equals the in-session
  * operator row-for-row. The fixture specs prove the contract on one
  * corpus shape; this proves it wasn't shaped BY the fixture (skewed
  * vocabularies, all-duplicate corpora, single-word docs, docs with
  * no trigrams at all).
  */
class DedupStorePropertySpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  // tiny vocabulary → dense collisions; doc lengths straddle the
  // trigram threshold (< 3 words ⇒ no shingles at all)
  private val docGen: Gen[String] =
    Gen.choose(0, 9).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e"))
        .map(_.mkString(" ")))

  private val corpusGen: Gen[List[String]] =
    Gen.choose(6, 24).flatMap(Gen.listOfN(_, docGen))

  test("store dedup equals the in-session operator on arbitrary corpora") {
    val sp = spark; import sp.implicits._
    val prop = Prop.forAll(corpusGen) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val incoming = docs.filter(col("doc_id") % 3 === 0)
      val kept = docs.filter(col("doc_id") % 3 =!= 0)
      val dir = java.nio.file.Files
        .createTempDirectory("graft_store_prop").toString
      // grow the store in two installments to exercise append too
      DedupStore.save(kept.filter(col("doc_id") % 2 === 0), dir)
      DedupStore.append(kept.filter(col("doc_id") % 2 =!= 0), dir, "p1")
      val got = DedupStore.dedupAgainst(spark, incoming, dir)
        .collect().toSeq
      val want = Dedup.dedupAgainstCorpus(incoming, kept).collect().toSeq
      Dedup.clearShingleCache()
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
