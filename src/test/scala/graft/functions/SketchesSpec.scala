package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Direct semantics of the sketch Aggregators (the general-purpose
  * library API; the dedup query path uses built-in min aggregates for
  * the same math).
  */
class SketchesSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  test("MinHashSig: elementwise minimum of h1 + k*h2 over the group") {
    import spark.implicits._
    val rows = Seq((1L, 100L, 3L), (1L, 50L, 7L), (2L, 10L, 1L))
    val sig = rows.toDF("id", "h1", "h2")
      .groupBy(col("id"))
      .agg(Sketches.minhashSig(col("h1"), col("h2")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def expected(items: Seq[(Long, Long)]): Seq[Long] =
      (0 until Sketches.SigLen).map(k =>
        items.map { case (h1, h2) => h1 + k * h2 }.min)
    assert(sig(1L) == expected(Seq((100L, 3L), (50L, 7L))))
    assert(sig(2L) == expected(Seq((10L, 1L))))
  }

  test("SimHash: sign of per-bit vote counts") {
    import spark.implicits._
    // two tokens voting identically → signature equals their bits;
    // opposite tokens cancel → ties go to 0
    val sig = Seq((1L, 0xF0L), (1L, 0xF0L), (2L, 0x0FL), (2L, ~0x0FL))
      .toDF("id", "h")
      .groupBy(col("id"))
      .agg(Sketches.simhash(col("h")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == 0xF0L)
    assert(sig(2L) == 0L) // every bit has one +1 and one -1 vote
  }
}
