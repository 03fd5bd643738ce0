package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The trained token-rate classifier's learning power and decision
  * edges. The driver-gate corpus shares ONE vocabulary across langs
  * (labels are independent of text by construction), so the gate row
  * can only pin determinism + oracle parity; whether the learner
  * actually LEARNS is pinned here on a separable corpus — the same
  * split-fixture division of labor the curation-v4 verdict classes
  * use.
  */
class ClassifySpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  /** md5-bucket of an id, computed through the same expression the
    * operator splits by — the test picks ids per split by OBSERVING
    * the bucket, never by reimplementing it.
    */
  private def buckets(ids: Seq[Long]): Map[Long, Int] = {
    import spark.implicits._
    ids.toDF("doc_id")
      .select(col("doc_id"), Sampling.bucketOf(col("doc_id")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  test("separable corpus: perfect held-out accuracy, all-integer decisions") {
    import spark.implicits._
    // two classes over a SHARED vocabulary with different token
    // distributions: 70% class-indicative tokens, 30% shared filler —
    // the shape the discriminative rate-difference weights exist for
    // (raw rate sums are dominated by the shared mass)
    val rnd = new scala.util.Random(7)
    val aTok = Vector("alpha", "beta", "gamma", "delta")
    val bTok = Vector("omega", "sigma", "tau", "rho")
    val shared = Vector("common1", "common2", "the", "of")
    val docs = (0L until 400L).map { i =>
      val mine = if (i % 2 == 0) aTok else bTok
      val text = Seq.fill(30)(
        if (rnd.nextInt(10) < 7) mine(rnd.nextInt(4))
        else shared(rnd.nextInt(4))).mkString(" ")
      (i, text, if (i % 2 == 0) "A" else "B")
    }.toDF("doc_id", "text", "lang")

    val got = Classify.tokenClassifierPredict(docs).collect()
    assert(got.nonEmpty)
    // every held-out doc classified, every prediction correct
    assert(got.forall(r => r.getString(2) == r.getString(1)),
      got.filter(r => r.getString(2) != r.getString(1)).take(5).mkString("; "))

    // the confusion matrix is exactly the two diagonal cells
    val conf = Classify.tokenClassifierConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(conf.forall { case (l, p, _) => l == p })
    assert(conf.map(_._3).sum == got.length)

    // own-label scores (the curation-v5 gate statistic): on the
    // separable corpus every doc's tokens CORRELATE with its declared
    // label, so no doc scores negative — and a deliberately mislabeled
    // doc does (its tokens are the OTHER class's)
    val scores = Classify.ownLabelScore(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores.size == 400 && scores.values.forall(_ >= 0),
      s"in-label docs must not score negative: ${scores.filter(_._2 < 0)}")
    val mislabeled = docs.withColumn("lang",
      when(col("doc_id") === 0, "B").otherwise(col("lang")))
    val flipped = Classify.ownLabelScore(mislabeled).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flipped(0L) < 0,
      s"a doc carrying the other class's tokens must score negative " +
        s"under its declared label, got ${flipped(0L)}")
  }

  test("argmax ties break to the smallest label; OOV docs annotate '?', never vanish") {
    import spark.implicits._
    val ids = 0L until 64L
    val bks = buckets(ids)
    val (trainIds, hoIds) = ids.partition(i => bks(i) < 8000)
    assert(trainIds.size >= 2 && hoIds.size >= 2, s"split degenerate: $bks")

    // both classes see the identical token stream → every weight is
    // identical → every held-out score ties → label order decides
    val train = trainIds.zipWithIndex.map { case (i, ix) =>
      (i, "x x y", if (ix % 2 == 0) "A" else "B")
    }
    // one held-out doc inside the vocabulary, one fully outside it
    val ho = Seq(
      (hoIds(0), "x y", "B"),
      (hoIds(1), "zzz qqq", "A"))
    val docs = (train ++ ho).toDF("doc_id", "text", "lang")

    val got = Classify.tokenClassifierPredict(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3))))
      .toMap
    assert(got.size == 2) // exactly the two held-out docs, none dropped
    // tie → lexicographically smallest label
    assert(got(hoIds(0))._2 == "A")
    // out-of-vocabulary → '?' with score 0 (total, annotated)
    assert(got(hoIds(1)) == (("A", "?", 0L)))
  }

  test("plan shape: broadcast model join, WindowGroupLimit argmax, scalar-attach only cross join") {
    val docs = graft.engine.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val df = Classify.tokenClassifierPredict(docs)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the argmax compiles to rank-limit pushdown: at most one row per
    // doc survives each side of the window exchange
    assert(plan.contains("WindowGroupLimit"),
      s"argmax did not compile to WindowGroupLimit:\n$plan")
    // the vocab-x-k model join broadcasts under the default budget
    assert(plan.contains("BroadcastHashJoin"),
      s"model join did not broadcast:\n$plan")
    // the only nested-loop join is the 1-row corpus-total attach
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj <= 1, s"unexpected nested-loop joins ($bnlj):\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
  }
}
