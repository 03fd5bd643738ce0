package graft.cli

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AfpStore, Multimodal}

/** The audio-dedup surface is orchestratable end to end from YAML —
  * the audio twin of [[ImageDedupStageSpec]]: a `store: afp` build +
  * ingest-keyed append leave a committed fingerprint store with audit
  * rows, and a `stream: audio_dedup` stage drains incoming clip drops
  * against it, decoding only the drops.
  */
class AudioDedupStageSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private def mix(seed: Long): Long = {
    var x = seed * 0x9E3779B97F4A7C15L + 0x165667B19E3779F9L
    x ^= x >>> 29; x *= 0xBF58476D1CE4E5B9L
    x ^= x >>> 32
    x
  }

  private def wav(bits: Long): Array[Byte] =
    Multimodal.energyCellsWav(Multimodal.cellsForBits(bits))

  test("audio pipeline from YAML: afp build + append, then an " +
      "audio_dedup drain lands flags exactly-once") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("stage_afpdedup")
    val modules = Files.createDirectories(dir.resolve("modules"))
    val warehouse = dir.resolve("warehouse").toString
    val storeDir = dir.resolve("afp_store").toString
    val srcDir = Files.createDirectories(dir.resolve("incoming")).toString
    val corpusDir = dir.resolve("corpus").toString

    (1L to 20L).map(i => (i, wav(mix(i)))).toDF("doc_id", "payload")
      .write.parquet(s"$corpusDir/documents.parquet")
    (21L to 30L).map(i => (i, wav(mix(i)))).toDF("doc_id", "payload")
      .write.parquet(s"$corpusDir/day1_docs.parquet")

    Files.writeString(dir.resolve("pipelines.yaml"),
      s"""stages:
         |  - name: build_afp
         |    kind: store
         |    store: afp
         |    action: build
         |    input_dir: $corpusDir
         |    dir: $storeDir
         |    dest_table: afp_audit
         |  - name: grow_afp
         |    kind: store
         |    store: afp
         |    action: append
         |    ingest_id: day1
         |    input_dir: $corpusDir
         |    table: day1_docs
         |    dir: $storeDir
         |    dest_table: afp_audit_growth
         |  - name: flag_clips
         |    kind: stream
         |    stream: audio_dedup
         |    input_dir: $corpusDir
         |    source_dir: $srcDir
         |    checkpoint: ${dir.resolve("ckpt")}
         |    dir: $storeDir
         |    out_dir: ${dir.resolve("flags")}
         |    dest_table: audio_flags
         |""".stripMargin)
    val args = Main.Args(
      modulesDir = modules.toString,
      configPath = dir.resolve("pipelines.yaml").toString,
      warehouse = Some(warehouse))

    // one drop: near-copies of a built clip AND an appended clip
    def batch1 = Seq(
      101L -> wav(mix(3) ^ 1L),   // near-dup of built clip 3
      102L -> wav(mix(25) ^ 2L),  // near-dup of APPENDED clip 25
      103L -> wav(mix(500))       // distinct
    ).toDF("doc_id", "payload")
    batch1.coalesce(1).write.mode("append").parquet(srcDir)
    assert(Main.run(args, sp) == 0)

    val audit = sp.read.parquet(s"$warehouse/afp_audit_growth")
    assert(audit.head().getAs[Long]("n_ingests") == 2L)
    assert(audit.head().getAs[Long]("n_clips") == 30L)

    val want = AfpStore.dedupAgainst(sp, batch1, storeDir).collect().toSeq
    def landed = sp.read.parquet(dir.resolve("flags").toString)
      .select(col("inc_id"), col("corpus_id"), col("hamming"))
      .orderBy(col("inc_id"), col("corpus_id"))
    assert(want.exists(_.getLong(1) == 25L),
      "fixture must flag against the appended ingest")
    assert(landed.collect().toSeq == want)

    // a re-run with nothing new must not re-flag (exactly-once)
    assert(Main.run(args, sp) == 0)
    assert(landed.collect().toSeq == want)
  }
}
