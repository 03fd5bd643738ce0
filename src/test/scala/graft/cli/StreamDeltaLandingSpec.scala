package graft.cli

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Delta landing for relation-producing stream stages (r16 verdict
  * item 3): the warehouse mirror of a cumulative stream relation must
  * stay EQUAL to that relation while each scheduled run's sink write
  * touches ONLY the batches that arrived since the last one — not a
  * full rewrite of the season's history per drain. The landing is
  * batch-partition-keyed (idempotent whole-partition overwrites, so a
  * crash between the data commit and the sidecar write can only
  * re-land identical partitions, never duplicate rows) and the
  * sidecar carries a GENERATION fingerprint so a rebuilt stream whose
  * new batch ids reach past the old mark still reconciles in full.
  */
class StreamDeltaLandingSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  import MirrorFiles.{fileSnapshot, deleteRec}

  test("run-2 lands only batch-2 rows; the mirror stays equal to the cumulative relation") {
    val sp = spark
    val dir = Files.createTempDirectory("delta_land")
    val modules = Files.createDirectories(dir.resolve("modules"))
    val warehouse = dir.resolve("warehouse")
    val mirror = warehouse.resolve("incoming_preds")
    val srcDir = Files.createDirectories(dir.resolve("incoming")).toString
    val outDir = dir.resolve("preds").toString
    val docs = graft.engine.Tables.table(sp, sf, "documents")
    def batchDf(lo: Long, hi: Long) = docs
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .select(col("doc_id"), col("text"))
    // throttle 1: every drop file is its own micro-batch, so the
    // rebuilt-generation scenario below re-reaches the old mark
    Files.writeString(dir.resolve("pipelines.yaml"),
      s"""stages:
         |  - name: score_incoming
         |    kind: stream
         |    stream: classify
         |    input_dir: $sf
         |    source_dir: $srcDir
         |    checkpoint: ${dir.resolve("ckpt")}
         |    out_dir: $outDir
         |    max_files_per_trigger: 1
         |    dest_table: incoming_preds
         |""".stripMargin)
    val args = Main.Args(
      modulesDir = modules.toString,
      configPath = dir.resolve("pipelines.yaml").toString,
      warehouse = Some(warehouse.toString))
    def mark: String =
      Files.readString(mirror.resolve("_graft_landed_max")).trim
    def mirrorDf = sp.read.parquet(mirror.toString)
    def relationTriples(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("predicted"), col("score"),
        col("graft_batch").cast("long").as("b"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet

    // run 1: first landing builds the batch-partitioned mirror in full
    batchDf(0, 40).coalesce(1).write.mode("append").parquet(srcDir)
    assert(Main.run(args, sp) == 0)
    assert(mirrorDf.count() == 40)
    assert(mark.split(' ').sameElements(
        Array("2", "0", mark.split(' ').last)) && mark.split(' ').length == 3,
      s"sidecar must carry layout version + mark + generation fingerprint, got '$mark'")
    val run1Files = fileSnapshot(mirror)
    assert(run1Files.nonEmpty &&
      run1Files.keySet.forall(_.startsWith("graft_batch_part=0")))
    // EXTERNAL-READ CONTRACT: a cold reader sees graft_batch as the
    // stable BIGINT data column the stream relation carries; the only
    // extra is the documented landing-mechanism partition column
    assert(mirrorDf.schema("graft_batch").dataType ==
      org.apache.spark.sql.types.LongType,
      "cold readers must see graft_batch as BIGINT data, not an inferred INT")
    assert(mirrorDf.columns.toSeq ==
      Seq("doc_id", "predicted", "score", "graft_batch", "graft_batch_part"))

    // run 2: only the new batch moves — every run-1 file is untouched
    // (same relative path, same mtime), the new files live under the
    // new batch's own partition and carry exactly its rows
    batchDf(40, 50).coalesce(1).write.mode("append").parquet(srcDir)
    assert(Main.run(args, sp) == 0)
    assert(mirrorDf.count() == 50)
    val run2Files = fileSnapshot(mirror)
    run1Files.foreach { case (name, mtime) =>
      assert(run2Files.get(name).contains(mtime),
        s"run-1 file $name was rewritten by the run-2 landing")
    }
    val newFiles = (run2Files.keySet -- run1Files.keySet).toSeq
    assert(newFiles.nonEmpty &&
      newFiles.forall(_.startsWith("graft_batch_part=1")))
    val newRows = sp.read.parquet(
      newFiles.map(n => mirror.resolve(n).toString): _*)
    assert(newRows.count() == 10)
    assert(newRows.select(col("doc_id")).collect().map(_.getLong(0)).toSet
      == (40L until 50L).toSet)
    assert(mark.split(' ')(1) == "1")
    // and the mirror still equals the cumulative stream relation
    assert(relationTriples(mirrorDf)
      == relationTriples(sp.read.parquet(outDir)))

    // idle run: nothing new arrived, every landed file stays put
    assert(Main.run(args, sp) == 0)
    assert(fileSnapshot(mirror) == run2Files)

    // REBUILT GENERATION past the old mark: wipe checkpoint + outDir
    // and re-drain — with throttle 1 the rebuilt batches are 0 and 1,
    // so the max REACHES the stale mark and a mark-only check would
    // have left the old generation's batch-0/1 partitions in place;
    // the generation fingerprint forces the full reconcile
    deleteRec(dir.resolve("ckpt"))
    deleteRec(dir.resolve("preds"))
    assert(Main.run(args, sp) == 0)
    assert(mirrorDf.count() == 50)
    assert(relationTriples(mirrorDf)
      == relationTriples(sp.read.parquet(outDir)),
      "rebuilt relation must be mirrored in full, not tail-patched")
    val rebuilt = fileSnapshot(mirror)
    run2Files.keySet.intersect(rebuilt.keySet).foreach { n =>
      assert(rebuilt(n) != run2Files(n),
        s"old-generation file $n survived the reconcile")
    }
    assert(mark.split(' ')(1) ==
      sp.read.parquet(outDir)
        .agg(org.apache.spark.sql.functions.max(col("graft_batch")
          .cast("long"))).head().getLong(0).toString)
  }

  test("a legacy graft_batch-partitioned mirror migrates through one full " +
      "reconcile to the stable-BIGINT layout") {
    val sp = spark
    val dir = Files.createTempDirectory("delta_land_legacy")
    val modules = Files.createDirectories(dir.resolve("modules"))
    val warehouse = dir.resolve("warehouse")
    val mirror = warehouse.resolve("incoming_preds")
    val srcDir = Files.createDirectories(dir.resolve("incoming")).toString
    val docs = graft.engine.Tables.table(sp, sf, "documents")
    Files.writeString(dir.resolve("pipelines.yaml"),
      s"""stages:
         |  - name: score_incoming
         |    kind: stream
         |    stream: classify
         |    input_dir: $sf
         |    source_dir: $srcDir
         |    checkpoint: ${dir.resolve("ckpt")}
         |    out_dir: ${dir.resolve("preds")}
         |    dest_table: incoming_preds
         |""".stripMargin)
    val args = Main.Args(
      modulesDir = modules.toString,
      configPath = dir.resolve("pipelines.yaml").toString,
      warehouse = Some(warehouse.toString))
    docs.filter(col("doc_id") < 30).select(col("doc_id"), col("text"))
      .coalesce(1).write.mode("append").parquet(srcDir)
    assert(Main.run(args, sp) == 0)
    val fp = Files.readString(mirror.resolve("_graft_landed_max"))
      .trim.split(' ').last

    // rewrite the mirror the way r17 laid it out: partitioned by
    // graft_batch itself, two-token sidecar with the CURRENT (still
    // valid) generation fingerprint — only the layout version differs
    val rows = sp.read.parquet(mirror.toString)
      .drop("graft_batch_part").cache()
    rows.count()
    deleteRec(mirror)
    rows.write.partitionBy("graft_batch").parquet(mirror.toString)
    rows.unpersist()
    Files.writeString(mirror.resolve("_graft_landed_max"), s"0 $fp")
    assert(fileSnapshot(mirror).keySet.forall(_.startsWith("graft_batch=")))

    // the next drain must NOT tail-patch a hybrid (new-layout dirs
    // next to legacy ones): the version bump forces one static full
    // reconcile that leaves only the new layout, graft_batch BIGINT
    docs.filter(col("doc_id") >= 30 && col("doc_id") < 40)
      .select(col("doc_id"), col("text"))
      .coalesce(1).write.mode("append").parquet(srcDir)
    assert(Main.run(args, sp) == 0)
    val after = fileSnapshot(mirror)
    assert(after.keySet.forall(_.startsWith("graft_batch_part=")),
      s"legacy partitions survived the migration: ${after.keySet}")
    val df = sp.read.parquet(mirror.toString)
    assert(df.count() == 40)
    assert(df.schema("graft_batch").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(Files.readString(mirror.resolve("_graft_landed_max"))
      .trim.startsWith("2 "))
  }
}
