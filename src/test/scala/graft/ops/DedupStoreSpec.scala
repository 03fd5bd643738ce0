package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted dedup gram store's contracts:
  *
  *  1. PARITY — a batch deduped against the store returns exactly
  *    what [[Dedup.dedupAgainstCorpus]] returns for the same split
  *    (shared candidate join + integer cut), which is what lets the
  *    driver gate row replay the in-session operator's oracle.
  *  2. APPEND — a store grown in two installments answers identically
  *    to one built whole: the growth path loses and duplicates no
  *    grams.
  */
class DedupStoreSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private def docs =
    graft.engine.Tables.table(spark, "/root/testdata/sf0.001", "documents")

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_dedup_store_$tag").toString

  test("store dedup equals the in-session operator bit-for-bit") {
    val dir = tmpDir("parity")
    val incoming = docs.filter(col("doc_id") % 10 === 0)
    val kept = docs.filter(col("doc_id") % 10 =!= 0)
    DedupStore.save(kept, dir)
    val got = DedupStore.dedupAgainst(spark, incoming, dir).collect().toSeq
    val want = Dedup.dedupAgainstCorpus(incoming, kept).collect().toSeq
    assert(want.nonEmpty, "fixture must contain incremental near-dups")
    assert(got == want,
      s"store dedup must equal dedupAgainstCorpus (got ${got.size} rows, " +
        s"want ${want.size})")
  }

  test("a store grown by append answers like one built whole") {
    val whole = tmpDir("whole")
    val grown = tmpDir("grown")
    val incoming = docs.filter(col("doc_id") % 10 === 0)
    val kept = docs.filter(col("doc_id") % 10 =!= 0)
    DedupStore.save(kept, whole)
    DedupStore.save(kept.filter(col("doc_id") % 2 === 0), grown)
    DedupStore.append(kept.filter(col("doc_id") % 2 =!= 0), grown, "day1")
    val a = DedupStore.dedupAgainst(spark, incoming, whole).collect().toSeq
    val b = DedupStore.dedupAgainst(spark, incoming, grown).collect().toSeq
    assert(a == b)
    // retrying the SAME append (the recovery contract for a failed or
    // ambiguous append) overwrites its own ingest partition instead of
    // double-counting grams — the store answers identically
    DedupStore.append(kept.filter(col("doc_id") % 2 =!= 0), grown, "day1")
    val c = DedupStore.dedupAgainst(spark, incoming, grown).collect().toSeq
    assert(c == a, "a retried append must be idempotent")
    // and the grown store holds each kept doc's grams exactly once
    val sizes = spark.read.parquet(
      s"${StoreVersioning.requireRoot(spark, grown)}/sizes")
    assert(sizes.count() == kept.count())
    assert(sizes.select(col("corpus_id")).distinct().count() == kept.count())
  }

  test("compaction applies tombstones, resets them, and answers identically") {
    val sp = spark; import sp.implicits._
    val dir = tmpDir("compact")
    val incoming = docs.filter(col("doc_id") % 10 === 0)
    val kept = docs.filter(col("doc_id") % 10 =!= 0)
    DedupStore.save(kept.filter(col("doc_id") % 2 === 0), dir)
    DedupStore.append(kept.filter(col("doc_id") % 2 =!= 0), dir, "day1")
    val matches = DedupStore.dedupAgainst(spark, incoming, dir)
      .select(col("inc_id"), col("corpus_id")).as[(Long, Long)]
      .collect().toSeq
    assert(matches.nonEmpty)
    val victim = matches.head._2
    DedupStore.delete(Seq(victim).toDF("doc_id"), dir)
    val before = DedupStore.dedupAgainst(spark, incoming, dir).collect().toSeq
    val rootBefore = StoreVersioning.requireRoot(spark, dir)
    DedupStore.compact(spark, dir)
    // answers unchanged; the commit moved to a FRESH version, and the
    // superseded one is RETAINED for one commit cycle (in-flight
    // reader grace) before the next commit prunes it
    val rootAfter = StoreVersioning.requireRoot(spark, dir)
    assert(rootAfter != rootBefore)
    assert(new java.io.File(rootBefore).exists(),
      "the superseded version must survive one commit for readers")
    DedupStore.compact(spark, dir)
    assert(!new java.io.File(rootBefore).exists(),
      "the second commit must prune the twice-superseded version")
    val after = DedupStore.dedupAgainst(spark, incoming, dir).collect().toSeq
    assert(after == before)
    assert(!new java.io.File(s"$rootAfter/deletes").exists())
    val sizes = spark.read.parquet(s"$rootAfter/sizes")
    assert(sizes.filter(col("corpus_id") === victim).count() == 0,
      "compaction must physically drop tombstoned docs")
    // partition inference types an all-"0" ingest column as int —
    // compare through a cast
    assert(sizes.select(col("ingest").cast("string")).distinct().collect()
      .map(_.getString(0)).toSeq == Seq("0"),
      "compaction must collapse all ingests into one")
  }

  test("a crashed rebuild is invisible: an orphan version never wins") {
    val dir = tmpDir("orphan")
    val incoming = docs.filter(col("doc_id") % 10 === 0)
    val kept = docs.filter(col("doc_id") % 10 =!= 0)
    DedupStore.save(kept, dir)
    val before = DedupStore.dedupAgainst(spark, incoming, dir).collect().toSeq
    // simulate a rebuild that died before its pointer swap: a higher
    // version dir exists but CURRENT still names the committed one
    val root = StoreVersioning.requireRoot(spark, dir)
    new java.io.File(s"$dir/v99").mkdirs()
    assert(DedupStore.dedupAgainst(spark, incoming, dir)
      .collect().toSeq == before,
      "readers must resolve through CURRENT, not directory listing")
    // the next successful save supersedes the orphan and prunes it;
    // the previously-committed root survives its one grace commit
    DedupStore.save(kept, dir)
    assert(!new java.io.File(s"$dir/v99").exists(),
      "marker-less orphans must be pruned at the next commit")
    assert(new java.io.File(root).exists(),
      "the superseded committed version must survive one commit")
    assert(DedupStore.dedupAgainst(spark, incoming, dir)
      .collect().toSeq == before)
  }

  test("an all-short corpus builds an empty store that matches nothing") {
    val sp = spark; import sp.implicits._
    val dir = tmpDir("empty")
    // every kept doc is under the trigram width: the store's grams
    // and sizes relations have ZERO rows (parquet lands only a
    // _SUCCESS for an empty partitioned write) — the batch dedup must
    // return empty like the in-session operator, not throw on an
    // uninferrable schema
    val kept = Seq((1L, "a b"), (2L, "c"), (3L, "")).toDF("doc_id", "text")
    val incoming = Seq((0L, "a b c d e")).toDF("doc_id", "text")
    DedupStore.save(kept, dir)
    val got = DedupStore.dedupAgainst(spark, incoming, dir).collect()
    val want = Dedup.dedupAgainstCorpus(incoming, kept).collect()
    Dedup.clearShingleCache()
    assert(got.isEmpty && want.isEmpty)
  }

  test("tombstoned docs stop matching; a rebuild resets the tombstones") {
    val sp = spark; import sp.implicits._
    val dir = tmpDir("tombstone")
    val incoming = docs.filter(col("doc_id") % 10 === 0)
    val kept = docs.filter(col("doc_id") % 10 =!= 0)
    DedupStore.save(kept, dir)
    val before = DedupStore.dedupAgainst(spark, incoming, dir)
      .select(col("inc_id"), col("corpus_id")).as[(Long, Long)]
      .collect().toSeq
    assert(before.nonEmpty, "fixture must contain incremental near-dups")
    // retract ONE matched corpus doc: exactly its pairs vanish, every
    // other pair survives untouched
    val victim = before.head._2
    DedupStore.delete(Seq(victim).toDF("doc_id"), dir)
    val afterOne = DedupStore.dedupAgainst(spark, incoming, dir)
      .select(col("inc_id"), col("corpus_id")).as[(Long, Long)]
      .collect().toSeq
    assert(afterOne == before.filterNot(_._2 == victim))
    // retract the rest (a second tombstone APPEND): nothing matches
    DedupStore.delete(before.map(_._2).distinct.toDF("doc_id"), dir)
    val after = DedupStore.dedupAgainst(spark, incoming, dir)
      .select(col("inc_id"), col("corpus_id")).as[(Long, Long)]
      .collect().toSeq
    assert(after.isEmpty,
      s"retracted docs must stop matching, still got ${after.size} pairs")
    // a rebuild resets the tombstones: matches come back
    DedupStore.save(kept, dir)
    val rebuilt = DedupStore.dedupAgainst(spark, incoming, dir)
      .select(col("inc_id"), col("corpus_id")).as[(Long, Long)]
      .collect().toSeq
    assert(rebuilt == before)
  }
}
