package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Extensions

/** Extension-operator behavior beyond what the DuckDB oracle covers:
  * sketch equivalence, ANN recall, codegen expression, multimodal
  * batching, streaming/batch agreement.
  */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("minhash-LSH and simhash find exactly the brute-force duplicate pairs") {
    val brute = Extensions.queries("x_dedup_ngram_jaccard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Extensions.queries("x_dedup_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Extensions.queries("x_dedup_simhash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    assert(lsh == brute)
    assert(sim == brute)
  }

  test("IVF ANN recall vs brute-force top-5 beats cell fraction") {
    val emb = graft.engine.Tables.table(spark, sf, "embeddings")
    val brute = Similarity.knnBrute(emb)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.knnIvf(emb)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    // probing 4 of 16 cells scans ~25% of the corpus; a working
    // quantizer concentrates true neighbors in probed cells
    assert(recall >= 0.3, s"IVF recall $recall")
  }

  test("LSH ANN recall vs brute-force top-5 is reasonable") {
    val brute = Similarity.knnBrute(graft.engine.Tables.table(spark, sf, "embeddings"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Similarity.knnLsh(graft.engine.Tables.table(spark, sf, "embeddings"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.2, s"LSH recall $recall collapsed — bucketing is broken")
    // and LSH scored strictly fewer candidates than brute force would
    assert(lsh.size <= brute.size + 25)
  }

  test("LSH ANN multi-probe plans as a hash join on bucket, not a nested loop") {
    val plan = Similarity.knnLsh(graft.engine.Tables.table(spark, sf, "embeddings"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected hash join on bucket:\n$plan")
    assert(!plan.contains("NestedLoop"), s"nested loop crept back into knnLsh:\n$plan")
  }

  test("rolling_hash: codegen result matches a reference implementation") {
    graft.functions.RollingHash.register(spark)
    import spark.implicits._
    val got = Seq("abc", "", "hello world", "日本語")
      .toDF("s").select(expr("rolling_hash(s)")).collect().map(_.getLong(0))
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 1000003L + b)
    assert(got.toSeq == Seq(ref("abc"), ref(""), ref("hello world"), ref("日本語")))
  }

  test("multimodal plumbing: binary payloads + batch decoder, schema intact") {
    import spark.implicits._
    val df = Seq((1L, "hello"), (2L, ""), (3L, "x" * 1000))
      .toDF("id", "s")
      .select(col("id"), encode(col("s"), "UTF-8").as("payload"))
      .repartition(2) // decoder must work per-partition
    val out = Multimodal.withMediaMeta(df, "payload")
    assert(out.schema("media").dataType == Multimodal.MediaMetaType)
    val byId = out.select("id", "media.width", "media.n_frames")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(byId(1L) == (5, 'h'.toInt & 0x0f))
    assert(byId(2L) == (0, 0))
    assert(byId(3L) == (1000 % 640, 'x'.toInt & 0x0f))
    // frame sampling over the decoded metadata
    val sampled = Multimodal.sampleFrames(out)
    assert(sampled.schema.fieldNames.contains("sampled_frames"))
    assert(sampled.count() == 3)
  }

  test("streaming tumbling agg equals the batch form (watermark + AvailableNow)") {
    val events = graft.engine.Tables.table(spark, sf, "events")
    val dir = java.nio.file.Files.createTempDirectory("events-stream").toString
    events.write.mode("overwrite").parquet(dir)
    val q = graft.streaming.EventWindows.streamingTumblingHourly(
      spark, dir, events.schema, "stream_out")
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("stream_out")
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))
    val batch = graft.streaming.EventWindows.tumblingHourly(events)
      .select(col("window_start"), col("event_type"), col("n"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stateful streaming sessionization equals the batch form") {
    val events = graft.engine.Tables.table(spark, sf, "events")
    val dir = java.nio.file.Files.createTempDirectory("events-sessions").toString
    events.write.mode("overwrite").parquet(dir)
    val q = graft.streaming.EventWindows.streamingUserSessions(
      spark, dir, events.schema, "session_out")
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("session_out")
    val batch = graft.streaming.EventWindows.userSessions(events)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("every extension query has an oracle or a documented reason not to") {
    val noOracle = Extensions.queries.keySet -- Extensions.oracle.keySet
    // approximate ANN and the Spark-only codegen fingerprint: rows-only
    assert(noOracle == Set("x_knn_lsh", "x_knn_ivf", "x_fingerprint_rolling"))
    assert((Extensions.oracle.keySet -- Extensions.queries.keySet).isEmpty)
  }

  test("langid predictions are accurate where the heuristic applies (en/zh)") {
    val out = Extensions.queries("x_text_langid")(spark, sf)
      .filter(col("lang").isin("en", "zh")).collect()
    val acc = out.count(r => r.getString(1) == r.getString(2)).toDouble / out.length
    assert(acc > 0.5, s"langid accuracy $acc on en/zh")
  }
}
