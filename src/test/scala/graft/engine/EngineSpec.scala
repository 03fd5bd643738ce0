package graft.engine

import org.scalatest.funsuite.AnyFunSuite

import graft.template.Templates

/** The reference Quick Start transform (/root/reference/README.md:204-217)
  * run end-to-end through ingest → unique temp view → spark.sql
  * (SURVEY §7.4 minimum slice, minus HTTP which HttpJsonSourceSpec covers).
  */
class EngineSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  test("quick-start module: projection + alias + WHERE over ingested JSON") {
    import spark.implicits._
    val rows = spark.createDataset(Seq(
      """{"userId": 1, "id": 1, "title": "a", "body": "x"}""",
      """{"userId": 7, "id": 61, "title": "t", "body": "b"}""",
      """{"userId": 9, "id": 90, "title": "u", "body": "c"}"""))
    val posts = graft.infer.SchemaInfer.readNested(spark, rows)
    val rendered = Templates.render("posts.sql",
      """{{ sink(name="pg") }}
        |SELECT id, userId AS user_id, title, body
        |FROM {{ use_source("posts") }} WHERE userId > 5""".stripMargin)
    assert(rendered.source.contains("posts"))
    val got = Engine.runModule(spark, posts, "posts", "posts", rendered.sql) {
      out => out.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    assert(got.toSeq == Seq((61L, 7L), (90L, 9L)))
  }

  test("temp view is dropped even on failure (RAII parity, datafusion_ext.rs:67-71)") {
    import spark.implicits._
    val df = spark.createDataset(Seq("""{"a": 1}""")).toDF()
    val before = spark.catalog.listTables().count()
    intercept[Exception] {
      Engine.withSqlOver(spark, df, "tbl", "SELECT nope FROM tbl")(_.collect())
    }
    assert(spark.catalog.listTables().count() == before)
  }

  test("schema-qualified dest tables get a sanitized view name and still rewrite") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val n = Engine.withSqlOver(spark, df, "analytics.daily",
      "SELECT v FROM analytics.daily WHERE id = 1")(_.count())
    assert(n == 1)
  }

  test("unique view names avoid collisions across concurrent modules") {
    import spark.implicits._
    val df1 = graft.infer.SchemaInfer.readNested(spark,
      spark.createDataset(Seq("""{"v": 1}""")))
    val df2 = graft.infer.SchemaInfer.readNested(spark,
      spark.createDataset(Seq("""{"v": 2}""")))
    val r1 = Engine.withSqlOver(spark, df1, "t", "SELECT v FROM t") { out1 =>
      // second module registered while the first is mid-query
      Engine.withSqlOver(spark, df2, "t", "SELECT v FROM t") { out2 =>
        (out1.collect().head.get(0), out2.collect().head.get(0))
      }
    }
    assert(r1 == (1L, 2L))
  }
}
