package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property pin for the persisted PQ store: on ARBITRARY small
  * embedding corpora — not just the driver fixture — a store built
  * whole or grown by append answers exhaustive-depth self-queries
  * exactly like brute force over its contents. The fixture specs
  * prove the contract on one corpus shape; this proves the
  * encode→persist→read→rerank machinery wasn't shaped BY the fixture
  * (degenerate all-equal vectors, near-zero vectors, tiny corpora at
  * the k-seeds boundary).
  */
class PqStorePropertySpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  // small geometry so tiny corpora can train it: dim 8, m=4 subspaces
  // of 2, k=8 codes — the seeds need only 8 vectors
  private val vecGen: Gen[Seq[Float]] =
    Gen.oneOf(
      Gen.listOfN(8, Gen.choose(-1.0f, 1.0f)),
      // degenerate shapes: constant and axis-aligned vectors
      Gen.oneOf(0.5f, -0.5f, 1.0f).map(x => List.fill(8)(x)),
      Gen.choose(0, 7).map(i => List.tabulate(8)(j =>
        if (i == j) 1.0f else 0.0f))
    ).map(_.toSeq)

  // >= 16 vectors so the even-half BUILD still has the k=8 seed
  // minimum; the in-body guard below re-checks because ScalaCheck's
  // SHRINKER does not respect generator bounds
  private val corpusGen: Gen[List[Seq[Float]]] =
    Gen.choose(16, 40).flatMap(Gen.listOfN(_, vecGen))

  test("store self-query at exhaustive depth equals brute on arbitrary corpora") {
    val sp = spark; import sp.implicits._
    val prop = Prop.forAll(corpusGen) { vecs =>
      vecs.size < 16 || {
      val e = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val dir = java.nio.file.Files
        .createTempDirectory("graft_pq_prop").toString
      try {
        // grow in two installments to exercise append too
        PqStore.save(e.filter(col("vec_id") % 2 === 0), dir,
          m = 4, kCodes = 8)
        PqStore.append(e.filter(col("vec_id") % 2 =!= 0), dir, "p1")
        val got = PqStore.querySelf(spark, dir, k = 3, nQueries = 4,
          candidates = vecs.size).collect().toSeq
        val want = Similarity.knnBrute(e, k = 3, nQueries = 4)
          .collect().toSeq
        got == want
      } finally Pq.clearCodebookCache()
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
