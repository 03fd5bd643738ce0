package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The PQ near-dup composition's exactness contract: at
  * nProbe == nCells and a covering SDC margin,
  * [[Pq.embeddingNearDupPq]] equals the exact bounded baseline
  * [[Dedup.embeddingCosinePairs]] row-for-row — which is what lets
  * the driver query carry the baseline's full DuckDB oracle.
  */
class PqDedupSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private def emb(sf: String) =
    graft.engine.Tables.table(spark, s"/root/testdata/$sf", "embeddings")

  test("SDC one-sided gap on qualifying pairs is dominated by the default margin") {
    try {
      // the covering statistic: only an UNDERESTIMATE on a pair at or
      // above the threshold can lose a true pair (overestimates pass
      // through to the exact verify, which filters them). If the
      // corpus generator or codebook geometry changes enough to push
      // the gap past the 0.35 default margin, the exactness contract
      // below is at risk and this test names it first.
      // at the operator's default trainMod=1: sampled fits and capped
      // iterations were both MEASURED past the margin on these
      // corpora (Prof pqgap, round 14) — this bound is what keeps
      // those knobs honest
      val gap1 = Pq.sdcTruePairGap(emb("sf0.001"))
      assert(gap1 < 0.33, f"sf0.001 worst exact-SDC gap $gap1%.4f leaves " +
        "< 0.02 headroom under the default 0.35 margin")
      Pq.clearCodebookCache()
      // sf0.01 is the driver's correctness-gate corpus
      val gap2 = Pq.sdcTruePairGap(emb("sf0.01"))
      assert(gap2 < 0.33, f"sf0.01 worst exact-SDC gap $gap2%.4f leaves " +
        "< 0.02 headroom under the default 0.35 margin")
    } finally Pq.clearCodebookCache()
  }

  test("embeddingNearDupPq at all-cells + covering margin equals the exact baseline") {
    try {
      val got = Pq.embeddingNearDupPq(emb("sf0.001")).collect().toSeq
      val want = Dedup.embeddingCosinePairs(emb("sf0.001")).collect().toSeq
      assert(want.nonEmpty, "fixture must contain near-dup pairs")
      assert(got == want,
        s"PQ near-dup must equal the exact baseline bit-for-bit " +
          s"(got ${got.size} rows, want ${want.size})")
    } finally {
      Pq.clearCodebookCache()
      Similarity.clearQuantizerCache()
    }
  }

  test("embeddingNearDupPq plan: no cartesian, survivor joins size-gated") {
    try {
      val df = Pq.embeddingNearDupPq(emb("sf0.001"))
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!plan.contains("CartesianProduct"),
        s"no unconstrained cartesian anywhere:\n$plan")
      // the survivor joins carry NO broadcast hint (a weak SDC prune
      // at scale would OOM a forced broadcast of pairs-with-vectors —
      // observed at the 30× ScaleGen corpus); what pins the small-case
      // efficiency is AQE's runtime conversion broadcasting the tiny
      // fixture survivor list here
      assert(plan.contains("BroadcastHashJoin"),
        s"AQE must size-gate the fixture's survivor fetch to broadcast:\n$plan")
      // the pair stream is scored on packed codes — the SDC filter
      // must sit in the plan (pruning before any vector is fetched)
      assert(plan.contains("sdc_dot"),
        s"expected the SDC prefilter in the pair join:\n$plan")
    } finally {
      Pq.clearCodebookCache()
      Similarity.clearQuantizerCache()
    }
  }

  test("margin self-certification raises when the configured margin provably loses pairs") {
    val e = graft.engine.Tables.table(spark, "/root/testdata/sf0.001",
      "embeddings")
    try {
      // adversarial geometry: 2 codes per 32-dim subspace cannot
      // represent these near-random unit vectors, so SDC is noise and
      // the sampled exact−SDC gap on qualifying pairs dwarfs any small
      // margin — the silent-recall-loss configuration the check exists
      // to refuse (the topTrigramsSketch self-certification convention)
      val err = intercept[IllegalArgumentException] {
        Pq.embeddingNearDupPq(e, minCosine = 0.3, m = 2, kCodes = 2,
          margin = 0.05).collect()
      }
      assert(err.getMessage.contains("cannot certify"),
        s"wrong refusal: ${err.getMessage}")
      // the same degraded geometry still runs when the caller opts
      // out explicitly — the knob stays a knob, just never a silent one
      Pq.embeddingNearDupPq(e, minCosine = 0.3, m = 2, kCodes = 2,
        margin = 0.05, certifyMargin = false).collect()
      // and the fixture corpus at the DEFAULT production knobs
      // certifies clean — not raising here IS the assertion (the
      // measured gap sits under the 0.35 margin)
      Pq.embeddingNearDupPq(e).collect()
    } finally {
      Pq.clearCodebookCache()
      Similarity.clearQuantizerCache()
    }
  }
}
