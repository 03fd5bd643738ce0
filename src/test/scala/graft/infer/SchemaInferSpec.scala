package graft.infer

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import SchemaInfer._

/** Mirrors the reference's inference tests
  * (/root/reference/tests/utils/schema_tests.rs) plus exhaustive
  * lattice laws (the domain is 5 elements — exhaustive beats sampled).
  */
class SchemaInferSpec extends AnyFunSuite {

  test("basic types (schema_tests.rs:8-33)") {
    val s = inferStreaming(Seq(
      """{"id": 1, "name": "Alice", "active": true, "score": 95.5}"""))
    assert(s == StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = false),
      StructField("active", BooleanType, nullable = false),
      StructField("score", DoubleType, nullable = false))))
  }

  test("nullable and missing fields (schema_tests.rs:45-66)") {
    val s = inferStreaming(Seq(
      """{"id": 1, "name": "Alice", "email": null}""",
      """{"id": 2, "name": "Bob", "email": "bob@example.com"}""",
      """{"id": 3, "name": "Carol", "email": "c@example.com", "extra": 1}"""))
    assert(s("email") == StructField("email", StringType, nullable = true))
    // fields absent from some rows are nullable
    assert(s("extra") == StructField("extra", LongType, nullable = true))
    assert(s("id").nullable == false)
  }

  test("int widens to double (schema_tests.rs:137-153)") {
    val s = inferStreaming(Seq(
      """{"id": 1, "value": 100}""",
      """{"id": 2, "value": 200.5}"""))
    assert(s("value").dataType == DoubleType)
  }

  test("arrays and objects degrade to string (schema_tests.rs:223-258)") {
    val s = inferStreaming(Seq(
      """{"id": 1, "data": {"nested": "value"}, "tags": ["tag1", "tag2"]}"""))
    assert(s("data").dataType == StringType)
    assert(s("tags").dataType == StringType)
  }

  test("bool/number conflict degrades to string (schema.rs:126)") {
    val s = inferStreaming(Seq("""{"x": true}""", """{"x": 3}"""))
    assert(s("x").dataType == StringType)
  }

  test("sample cap 100 (schema_tests.rs:156-172)") {
    // row 101 would widen x to double — must be ignored
    val rows = (1 to 100).map(i => s"""{"x": $i}""") :+ """{"x": 1.5}"""
    assert(inferStreaming(rows)("x").dataType == LongType)
  }

  test("empty input and non-object rows are errors (schema.rs:36-47)") {
    intercept[IllegalArgumentException](inferStreaming(Seq.empty[String]))
    intercept[IllegalArgumentException](inferStreaming(Seq("[1,2]")))
  }

  private val allTypes: Seq[JType] = Seq(JUnknown, JBool, JLong, JDouble, JString)

  test("lattice: commutative, idempotent, Unknown is identity, String absorbs") {
    for (a <- allTypes; b <- allTypes) assert(merge(a, b) == merge(b, a))
    for (a <- allTypes) {
      assert(merge(a, a) == a)
      assert(merge(JUnknown, a) == a)
      assert(merge(JString, a) == JString)
    }
  }

  test("lattice: associative (exhaustive over all 125 triples)") {
    for (a <- allTypes; b <- allTypes; c <- allTypes)
      assert(merge(merge(a, b), c) == merge(a, merge(b, c)))
  }

  test("degradeRow serializes containers to JSON text") {
    val out = degradeRow("""{"id":1,"data":{"k":"v"},"tags":[1,2]}""")
    assert(out.contains(""""data":"{\"k\":\"v\"}""""))
    assert(out.contains(""""tags":"[1,2]""""))
  }

  test("degradeRow rejects non-object rows — the rejection is not sample-capped") {
    // a bad row beyond the 100-row inference sample must fail loudly
    // at parse time, not become a silent all-null row
    val e = intercept[IllegalArgumentException] { degradeRow("[1,2]") }
    assert(e.getMessage.contains("expects JSON objects"))
    intercept[IllegalArgumentException] { degradeRow("\"scalar\"") }
  }

  test("integrals beyond Long range type as Double, not a row-nulling Long") {
    val schema = inferStreaming(Seq(
      """{"small": 1, "huge": 18446744073709551615}"""))
    assert(schema("small").dataType == LongType)
    assert(schema("huge").dataType == DoubleType)
  }

  test("empty-sample fallback infers from a bounded self-sample, pins no cache") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val rows = Seq("""{"a":1,"b":"x"}""", """{"a":2,"b":"y"}""").toDS()
    val df = readNestedSampled(spark, rows, Seq.empty)
    assert(df.columns.toSet == Set("a", "b"))
    assert(df.count() == 2)
    // the fallback must not leave the source dataset registered in
    // CacheManager (that pin outlives the returned DataFrame — the
    // leak this path previously had)
    val cachedNodes = rows.queryExecution.withCachedData.collect {
      case i: org.apache.spark.sql.execution.columnar.InMemoryRelation => i
    }
    assert(cachedNodes.isEmpty, "source rows were left cached")
    // a truly empty source degrades to an empty frame, not a throw
    assert(readNestedSampled(spark, spark.emptyDataset[String], Seq.empty)
      .count() == 0)
  }

  test("readStreaming end-to-end: degraded nested values, fixed schema") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      """{"id": 1, "data": {"nested": "value"}, "tags": ["a"]}""",
      """{"id": 2, "data": {"nested": "w"}, "tags": []}"""))
    val df = SchemaInfer.readStreaming(spark, ds)
    assert(df.schema("data").dataType == StringType)
    assert(df.count() == 2)
    val first = df.orderBy("id").collect()(0)
    assert(first.getAs[String]("data") == """{"nested":"value"}""")
  }

  test("readNested keeps structs and arrays (batch path, schema.rs:133-148)") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      """{"id": 1, "data": {"nested": "value"}, "tags": ["a", "b"]}"""))
    val df = SchemaInfer.readNested(spark, ds)
    assert(df.schema("data").dataType.isInstanceOf[StructType])
    assert(df.schema("tags").dataType.isInstanceOf[ArrayType])
  }
}
