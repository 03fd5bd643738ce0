package graft.cli

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Delta landing for relation-producing stream stages (r16 verdict
  * item 3): the warehouse mirror of a cumulative stream relation must
  * stay EQUAL to that relation while each scheduled run's sink write
  * touches ONLY the batches that arrived since the last one — not a
  * full rewrite of the season's history per drain.
  */
class StreamDeltaLandingSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def fileSnapshot(dir: java.nio.file.Path): Map[String, Long] = {
    val d = dir.toFile
    if (!d.exists()) Map.empty
    else d.listFiles().filter(f => !f.getName.startsWith("_") &&
      !f.getName.startsWith(".") && f.isFile)
      .map(f => f.getName -> f.lastModified()).toMap
  }

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
    Files.writeString(dir.resolve("pipelines.yaml"),
      s"""stages:
         |  - name: score_incoming
         |    kind: stream
         |    stream: classify
         |    input_dir: $sf
         |    source_dir: $srcDir
         |    checkpoint: ${dir.resolve("ckpt")}
         |    out_dir: $outDir
         |    dest_table: incoming_preds
         |""".stripMargin)
    val args = Main.Args(
      modulesDir = modules.toString,
      configPath = dir.resolve("pipelines.yaml").toString,
      warehouse = Some(warehouse.toString))

    // run 1: first landing replaces (mirror created), sidecar at batch 0
    batchDf(0, 40).coalesce(1).write.mode("append").parquet(srcDir)
    assert(Main.run(args, sp) == 0)
    def mirrorDf = sp.read.parquet(mirror.toString)
    assert(mirrorDf.count() == 40)
    assert(Files.readString(mirror.resolve("_graft_landed_max")).trim == "0")
    val run1Files = fileSnapshot(mirror)
    assert(run1Files.nonEmpty)

    // run 2: only the new batch moves — every run-1 file is untouched
    // (same name, same mtime), the new files carry exactly batch 1
    batchDf(40, 50).coalesce(1).write.mode("append").parquet(srcDir)
    assert(Main.run(args, sp) == 0)
    assert(mirrorDf.count() == 50)
    val run2Files = fileSnapshot(mirror)
    run1Files.foreach { case (name, mtime) =>
      assert(run2Files.get(name).contains(mtime),
        s"run-1 file $name was rewritten by the run-2 landing")
    }
    val newFiles = (run2Files.keySet -- run1Files.keySet).toSeq
    assert(newFiles.nonEmpty)
    val newRows = sp.read.parquet(
      newFiles.map(n => mirror.resolve(n).toString): _*)
    assert(newRows.count() == 10)
    assert(newRows.select(col("doc_id")).collect().map(_.getLong(0)).toSet
      == (40L until 50L).toSet)
    assert(Files.readString(mirror.resolve("_graft_landed_max")).trim == "1")
    // and the mirror still equals the cumulative stream relation
    val cum = sp.read.parquet(outDir)
      .select(col("doc_id"), col("predicted"), col("score")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(mirrorDf.select(col("doc_id"), col("predicted"), col("score"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet == cum)

    // idle run: nothing new arrived, the landed rows stay put
    assert(Main.run(args, sp) == 0)
    assert(mirrorDf.count() == 50)
    fileSnapshot(mirror).foreach { case (name, _) =>
      if (run2Files.contains(name))
        assert(run2Files(name) == fileSnapshot(mirror)(name))
    }

    // reconcile: the checkpoint and outDir are wiped (a rebuilt
    // stream), so batch ids restart at 0 BELOW the landed mark — the
    // mirror must converge to the rebuilt relation via a full replace,
    // never trust a stale watermark
    def deleteRec(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p))
        Files.list(p).forEach(c => deleteRec(c))
      Files.deleteIfExists(p); ()
    }
    deleteRec(dir.resolve("ckpt"))
    deleteRec(dir.resolve("preds"))
    assert(Main.run(args, sp) == 0)
    assert(mirrorDf.count() == 50, "rebuilt relation mirrored in full")
    val rebuiltMax = sp.read.parquet(outDir)
      .agg(org.apache.spark.sql.functions.max(col("graft_batch").cast("long")))
      .head().getLong(0)
    assert(Files.readString(mirror.resolve("_graft_landed_max")).trim
      == rebuiltMax.toString)
  }
}
