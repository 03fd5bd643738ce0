package graft.cli

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Multimodal, PhashStore}

/** The image-dedup surface is orchestratable end to end from YAML: a
  * `store: phash` build + ingest-keyed append leave a committed
  * fingerprint store with audit rows, and a `stream: image_dedup`
  * stage drains incoming image drops against it — decoding only the
  * drops, landing flags exactly-once across scheduled CLI runs.
  */
class ImageDedupStageSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private def mix(seed: Long): Long = {
    var x = seed * 0x9E3779B97F4A7C15L + 0x165667B19E3779F9L
    x ^= x >>> 29; x *= 0xBF58476D1CE4E5B9L
    x ^= x >>> 32
    x
  }

  private def png(bits: Long): Array[Byte] =
    Multimodal.grayCellsPng(Multimodal.cellsForBits(bits))

  test("image pipeline from YAML: phash build + append, then an " +
      "image_dedup drain lands flags exactly-once") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("stage_imgdedup")
    val modules = Files.createDirectories(dir.resolve("modules"))
    val warehouse = dir.resolve("warehouse").toString
    val storeDir = dir.resolve("phash_store").toString
    val srcDir = Files.createDirectories(dir.resolve("incoming")).toString
    val corpusDir = dir.resolve("corpus").toString

    // the historical image corpus: `documents` is the initial build,
    // `day1_docs` the appended ingest
    (1L to 20L).map(i => (i, png(mix(i)))).toDF("doc_id", "payload")
      .write.parquet(s"$corpusDir/documents.parquet")
    (21L to 30L).map(i => (i, png(mix(i)))).toDF("doc_id", "payload")
      .write.parquet(s"$corpusDir/day1_docs.parquet")

    Files.writeString(dir.resolve("pipelines.yaml"),
      s"""stages:
         |  - name: build_phash
         |    kind: store
         |    store: phash
         |    action: build
         |    input_dir: $corpusDir
         |    dir: $storeDir
         |    dest_table: phash_audit
         |  - name: grow_phash
         |    kind: store
         |    store: phash
         |    action: append
         |    ingest_id: day1
         |    input_dir: $corpusDir
         |    table: day1_docs
         |    dir: $storeDir
         |    dest_table: phash_audit_growth
         |  - name: flag_images
         |    kind: stream
         |    stream: image_dedup
         |    input_dir: $corpusDir
         |    source_dir: $srcDir
         |    checkpoint: ${dir.resolve("ckpt")}
         |    dir: $storeDir
         |    out_dir: ${dir.resolve("flags")}
         |    dest_table: image_flags
         |""".stripMargin)
    val args = Main.Args(
      modulesDir = modules.toString,
      configPath = dir.resolve("pipelines.yaml").toString,
      warehouse = Some(warehouse))

    // drop 1: near-copies of build-corpus AND appended-ingest images
    def batch1 = Seq(
      101L -> png(mix(3) ^ 1L),   // near-dup of built image 3
      102L -> png(mix(25) ^ 2L),  // near-dup of APPENDED image 25
      103L -> png(mix(500))       // distinct
    ).toDF("doc_id", "payload")
    batch1.coalesce(1).write.mode("append").parquet(srcDir)
    assert(Main.run(args, sp) == 0)

    // the stats audit rows landed: the build row counts the initial
    // corpus, the growth row shows both ingests
    val audit = sp.read.parquet(s"$warehouse/phash_audit_growth")
    assert(audit.head().getAs[Long]("n_ingests") == 2L)
    assert(audit.head().getAs[Long]("n_images") == 30L)

    // parity with the batch operator over the same drop — including a
    // flag against the APPENDED ingest (the store grew without a
    // rebuild or a re-decode)
    val want1 = PhashStore.dedupAgainst(sp, batch1, storeDir).collect().toSeq
    def landed = sp.read.parquet(dir.resolve("flags").toString)
      .select(col("inc_id"), col("corpus_id"), col("hamming"))
      .orderBy(col("inc_id"), col("corpus_id"))
    assert(want1.exists(_.getLong(1) == 25L),
      "fixture must flag against the appended ingest")
    assert(landed.collect().toSeq == want1)

    // a re-run with nothing new must not re-flag (exactly-once)
    assert(Main.run(args, sp) == 0)
    assert(landed.collect().toSeq == want1)

    // drop 2: only the delta lands, in its own batch partition
    def batch2 = Seq(104L -> png(mix(7) ^ 3L)).toDF("doc_id", "payload")
    batch2.coalesce(1).write.mode("append").parquet(srcDir)
    assert(Main.run(args, sp) == 0)
    val want2 = PhashStore.dedupAgainst(sp, batch2, storeDir).collect().toSeq
    assert(want2.nonEmpty)
    assert(landed.collect().toSeq == (want1 ++ want2)
      .sortBy(r => (r.getLong(0), r.getLong(1))))
    // the warehouse table mirrors the cumulative flags, not compounds
    assert(sp.read.parquet(s"$warehouse/image_flags").count() ==
      (want1.size + want2.size).toLong)
  }
}
