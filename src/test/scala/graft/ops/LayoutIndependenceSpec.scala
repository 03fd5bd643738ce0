package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-15 determinism contract, pinned to the BIT: both fitted
  * quantizers (the float IVF coarse quantizer and the PQ codebook)
  * are functions of the DATA alone — no partition re-layout of the
  * training corpus may move a centroid by an ulp. This is what the
  * exact fixed-point Lloyd means (decimal sums are order-independent)
  * plus the deterministic inits (hash-ordered init sub-sample with
  * vec_id tiebreak; id-ordered Forgy seeds), and it is the property
  * the old kmeans|| fit measurably LACKED (its init sampled per
  * partition, so a 1-partition re-layout moved the sf0.001 SDC gap
  * 0.30 → 0.37 — r14 PROF addendum 1). An ulp drift here can flip an
  * argmin tie downstream, which is a changed cell assignment, which
  * is a changed gate row.
  */
class LayoutIndependenceSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private def emb =
    graft.engine.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")

  test("coarse quantizer centroids are bit-identical across re-layouts") {
    try {
      // three materially different physical layouts of the same rows;
      // each trains its own fit (the memo keys on the optimized plan,
      // which retains the repartition) — the VALUES must agree exactly
      val layouts = Seq(
        emb,
        emb.repartition(7),
        emb.repartition(1).sortWithinPartitions(col("vec_id").desc))
      val fits = layouts.map { e =>
        val (_, model) = Similarity.assignedWithModel(e, nCells = 16,
          trainMod = 4)
        model.centroids.map(_.toSeq).toSeq
      }
      assert(fits(0).nonEmpty && fits(0).head.nonEmpty)
      assert(fits(1) == fits(0),
        "a 7-way repartition must not move a centroid by an ulp")
      assert(fits(2) == fits(0),
        "a 1-partition reverse-sorted layout must not move a centroid")
    } finally Similarity.clearQuantizerCache()
  }

  test("PQ codebook is bit-identical across re-layouts") {
    try {
      val layouts = Seq(
        emb,
        emb.repartition(7),
        emb.repartition(1).sortWithinPartitions(col("vec_id").desc))
      val books = layouts.map { e =>
        val b = Pq.codebookForStore(e, m = 16, kCodes = 32, trainMod = 1)
        b.cb.map(_.map(_.toSeq).toSeq).toSeq
      }
      assert(books(1) == books(0),
        "a 7-way repartition must not move a codebook centroid")
      assert(books(2) == books(0),
        "a 1-partition reverse-sorted layout must not move a codebook centroid")
    } finally Pq.clearCodebookCache()
  }

  test("cell assignment of the whole corpus is identical across re-layouts") {
    try {
      def cells(e: org.apache.spark.sql.DataFrame): Map[Long, Int] = {
        val (assigned, _) = Similarity.assignedWithModel(e, nCells = 16,
          trainMod = 4)
        assigned.select(col("vec_id"), col("cell")).collect()
          .map(r => r.getLong(0) -> r.getInt(1)).toMap
      }
      val base = cells(emb)
      assert(base.nonEmpty)
      assert(cells(emb.repartition(7)) == base,
        "per-vector cell assignment must be layout-independent end to end")
    } finally Similarity.clearQuantizerCache()
  }
}
