package graft.writer

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class FileWriterSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private def sample = {
    import spark.implicits._
    Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "v")
  }

  test("json sink writes NDJSON rows (A16 output shape)") {
    val dir = Files.createTempDirectory("w-json").toString + "/t"
    val stats = new FileWriter(dir, "json").write(sample, WriteMode.Append)
    assert(stats.rowsWritten == 2)
    val back = spark.read.json(dir)
    assert(back.count() == 2)
    assert(back.schema.fieldNames.sorted.toSeq == Seq("id", "s", "v"))
  }

  test("csv sink round-trips with header") {
    val dir = Files.createTempDirectory("w-csv").toString + "/t"
    new FileWriter(dir, "csv").write(sample, WriteMode.Append)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() == 2)
    assert(back.columns.sorted.toSeq == Seq("id", "s", "v"))
  }

  test("merge mode maps to overwrite for file sinks") {
    val dir = Files.createTempDirectory("w-ovw").toString + "/t"
    val w = new FileWriter(dir, "parquet")
    w.write(sample, WriteMode.Append)
    w.write(sample, WriteMode.Append)
    assert(spark.read.parquet(dir).count() == 4)
    assert(w.write(sample, WriteMode.Merge).rowsWritten == 2)
  }

  test("append into existing dest reports only the new batch's rows") {
    val dir = Files.createTempDirectory("w-app2").toString + "/t"
    val w = new FileWriter(dir, "parquet")
    assert(w.write(sample, WriteMode.Append).rowsWritten == 2)
    // second append must NOT count the pre-existing rows in the sink
    val second = w.write(sample.limit(1), WriteMode.Append)
    assert(second.rowsWritten == 1)
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("unknown format rejected") {
    intercept[IllegalArgumentException](new FileWriter("/tmp/x", "avro2"))
  }
}
