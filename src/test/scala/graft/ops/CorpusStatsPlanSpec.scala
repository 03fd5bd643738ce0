package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests for the corpus-statistics family: the
  * "train on the corpus, score the corpus" operators must scan the
  * corpus ONCE (the tf relation's shuffle feeds both the model build
  * and the apply side via exchange reuse), and their vocabulary join
  * must be size-gated — broadcast when the materialized vocab fits the
  * budget, shuffle join when it doesn't — instead of a hard hint that
  * OOMs the driver on a non-Heaps corpus at 100 TB.
  */
class CorpusStatsPlanSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private lazy val docs =
    graft.engine.Tables.table(spark, "/root/testdata/sf0.001", "documents")

  /** Final (post-AQE) physical plan: run the query, then render —
    * keeping only the final-plan section (executed AQE plans also
    * print their initial plan, which would double-count scans and
    * still show the pre-conversion join).
    */
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  /** A corpus whose vocabulary is LINEAR in its size — every token is
    * unique to its document — the pathological (random IDs / base64)
    * shape the Heaps'-law broadcast argument does not cover.
    */
  private def linearVocabCorpus(nDocs: Int, wordsPerDoc: Int): DataFrame =
    spark.range(nDocs.toLong).selectExpr(
      "id AS doc_id",
      s"array_join(transform(sequence(0, ${wordsPerDoc - 1}), " +
        s"i -> concat('w', cast(id * $wordsPerDoc + i AS string))), ' ') AS text")

  /** Run `body` with the broadcast-budget confs scaled down, restoring
    * the session's previous values afterwards (suites share one
    * session; sbt runs them sequentially in the forked JVM).
    */
  private def withBroadcastBudget[T](bytes: String)(body: => T): T = {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, bytes))
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Hash exchanges that are NOT reuse markers (a ReusedExchange line
    * echoes the reused node's description, so a raw substring count
    * would double-count it).
    */
  private def hashExchanges(plan: String): Int =
    plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))

  test("unigramRarity scans once and never re-shuffles the term relation") {
    val plan = finalPlan(CorpusStats.unigramRarity(docs))
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 parquet scan, got $scans:\n$plan")
    // the explode appears once per consumer branch ABOVE the reused
    // doc_id exchange — a deliberate trade: re-running the codegen'd
    // tokenize on partition-local rows is cheaper than shuffling the
    // term relation a second time (which is what a single shared
    // explode below a term-keyed exchange would cost)
    val generates = "Generate explode".r.findAllIn(plan).size
    assert(generates == 2, s"expected 2 explodes (one per branch), got $generates:\n$plan")
    // exactly two hash shuffles: the up-front doc_id repartition of
    // the compact docs and the vocab-sized term exchange — the
    // exploded/aggregated term relation itself must never re-shuffle
    // (the doc_id partitioning satisfies the tf aggregation AND the
    // final per-doc fold, and the broadcast join preserves it)
    val ex = hashExchanges(plan)
    assert(ex == 2, s"expected 2 hash exchanges, got $ex:\n$plan")
  }

  test("topTermsPerDoc scans once and windows without re-shuffling") {
    val plan = finalPlan(CorpusStats.topTermsPerDoc(docs))
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 parquet scan, got $scans:\n$plan")
    val ex = hashExchanges(plan)
    assert(ex == 2, s"expected 2 hash exchanges, got $ex:\n$plan")
  }

  test("bigramLm explodes the corpus ONCE: all three tf consumers read the persisted substrate") {
    val plan = finalPlan(CorpusStats.bigramLm(docs))
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans <= 1, s"expected at most 1 parquet scan, got $scans:\n$plan")
    // ONE explode total — the memoized persisted bigram-tf substrate
    // (CorpusStats.corpusBigramTf): before it, each of the three tf
    // consumers (apply side, C(w1,w2) build, C(w1·) build) re-ran the
    // tokenize+explode transform post-shuffle — 3 explodes, measured
    // 2.2× the whole operator at sf0.1 (2.07 → 0.92 s warm)
    val generates = "Generate explode".r.findAllIn(plan).size
    assert(generates == 1, s"expected 1 explode (the shared substrate), got $generates:\n$plan")
    // both model joins size-gate to broadcast on a Heaps'-law corpus
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bhj == 2, s"expected 2 broadcast joins, got $bhj:\n$plan")
  }

  test("vocabulary join broadcasts on a normal (Heaps' law) corpus") {
    Seq(
      "unigramRarity" -> finalPlan(CorpusStats.unigramRarity(docs)),
      "topTermsPerDoc" -> finalPlan(CorpusStats.topTermsPerDoc(docs)))
      .foreach { case (name, plan) =>
        assert(plan.contains("BroadcastHashJoin"),
          s"$name vocab join did not broadcast under the default budget:\n$plan")
      }
  }

  test("vocabulary join falls back to a shuffle join when the vocab " +
    "exceeds the broadcast budget") {
    // linear-vocab corpus + scaled-down budget = the 100 TB non-Heaps
    // case at test size: the materialized vocab aggregate (~40k unique
    // terms, far over the 1 KB budget) must NOT broadcast
    val pathological = linearVocabCorpus(nDocs = 2000, wordsPerDoc = 20)
    withBroadcastBudget("1KB") {
      Seq(
        "unigramRarity" -> finalPlan(CorpusStats.unigramRarity(pathological)),
        "topTermsPerDoc" -> finalPlan(CorpusStats.topTermsPerDoc(pathological)))
        .foreach { case (name, plan) =>
          assert(!plan.contains("BroadcastHashJoin"),
            s"$name broadcast an over-budget vocab:\n$plan")
          assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
            s"$name vocab join is not a shuffle join:\n$plan")
        }
    }
  }

  test("gated-off path computes the same profile as the broadcast path") {
    val docs3 = docs.limit(50)
    val viaBroadcast = CorpusStats.unigramRarity(docs3).collect().toSeq
    val viaShuffle = withBroadcastBudget("1KB") {
      CorpusStats.unigramRarity(docs3).collect().toSeq
    }
    assert(viaBroadcast == viaShuffle)
  }
}
