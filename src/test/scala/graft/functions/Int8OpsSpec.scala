package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The packed-binary int8 path must agree byte-for-byte with the
  * auditable array-form arithmetic (`Quantize.codesOf`) — that
  * identity is what lets the DuckDB oracle, which recomputes the
  * ARRAY form, gate the packed search path.
  */
class Int8OpsSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  test("int8_pack bytes equal the floor(x/scale + 0.5) array form") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val data = Seq.fill(200)(Seq.fill(64)(rnd.nextFloat() * 2 - 1)) :+
      Seq.fill(64)(0.0f) // zero vector → scale 0 → all-zero codes
    val scale = graft.ops.Quantize.scaleOf(col("v"))
    val rows = data.toDF("v")
      .select(
        expr("int8_pack(v, " +
          "cast(array_max(transform(v, x -> abs(x))) as double) / 127.0d)").as("p"),
        graft.ops.Quantize.codesOf(col("v"), scale).as("c"))
      .collect()
    rows.foreach { r =>
      val packed = r.getAs[Array[Byte]]("p").map(_.toLong).toSeq
      val arr = r.getSeq[Long](1)
      assert(packed == arr, s"$packed != $arr")
    }
  }

  test("int8_dot equals the integer fold over code pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(200)((
      Seq.fill(64)(rnd.nextFloat() * 2 - 1),
      Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
    val sa = graft.ops.Quantize.scaleOf(col("a"))
    val sb = graft.ops.Quantize.scaleOf(col("b"))
    val fold = aggregate(
      zip_with(
        graft.ops.Quantize.codesOf(col("a"), sa),
        graft.ops.Quantize.codesOf(col("b"), sb),
        (x, y) => x * y),
      lit(0L), (acc, v) => acc + v)
    val rows = data.toDF("a", "b")
      .select(
        graft.ops.Quantize.i8dot(
          graft.ops.Quantize.packedOf(col("a"), sa),
          graft.ops.Quantize.packedOf(col("b"), sb)).as("d"),
        fold.as("h"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("empty embedding array: codesOf and int8_pack agree on NULL") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // scaleOf(empty) = array_max of nothing = NULL; both forms must
    // yield NULL (not zero-codes vs NULL) or the pack==codes identity
    // the quantization audit pins would break on degenerate rows
    val df = Seq(Seq.empty[Float]).toDF("v")
    val scale = graft.ops.Quantize.scaleOf(col("v"))
    val r = df.select(
      graft.ops.Quantize.codesOf(col("v"), scale).as("c"),
      graft.ops.Quantize.packedOf(col("v"), scale).as("p")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("codes stay within [-127, 127] under the companion scale") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val data = Seq.fill(500)(Seq.fill(16)(rnd.nextFloat() * 200 - 100))
    val scale = graft.ops.Quantize.scaleOf(col("v"))
    val rows = data.toDF("v")
      .select(
        array_min(graft.ops.Quantize.codesOf(col("v"), scale)).as("mn"),
        array_max(graft.ops.Quantize.codesOf(col("v"), scale)).as("mx"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) >= -127L && r.getLong(1) <= 127L)
    }
  }

  test("null contract: null array, null scale, null element, length mismatch") {
    val df = spark.sql(
      """SELECT
        |  int8_pack(CAST(NULL AS ARRAY<FLOAT>), 1.0d) AS p_null_arr,
        |  int8_pack(array(CAST(1.0 AS FLOAT)), CAST(NULL AS DOUBLE)) AS p_null_scale,
        |  int8_pack(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), 1.0d) AS p_null_elem,
        |  int8_dot(int8_pack(array(1.0f, 2.0f), 1.0d),
        |           int8_pack(array(1.0f), 1.0d)) AS d_len_mismatch,
        |  int8_dot(int8_pack(array(3.0f, -2.0f), 1.0d),
        |           int8_pack(array(2.0f, 5.0f), 1.0d)) AS d_ok""".stripMargin)
    val r = df.head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
    assert(r.getLong(4) == 3L * 2 - 2 * 5)
  }

  test("saturation engages only for a hostile (too-small) scale") {
    val r = spark.sql(
      "SELECT int8_dot(int8_pack(array(300.0f, -300.0f), 1.0d)," +
        " int8_pack(array(1.0f, 1.0f), 1.0d)) AS d").head()
    assert(r.getLong(0) == 127L - 128L) // clamped to 127 and -128
  }

  test("int8_dist2s equals the per-centroid reference on randomized blocks; geometry nulls") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(13)
    // 200 random (vector, centroid-block) pairs: d in 1..9, k in 1..7
    val rows = (1 to 200).map { i =>
      val d = 1 + rnd.nextInt(9)
      val k = 1 + rnd.nextInt(7)
      val v = Array.fill(d)((rnd.nextInt(255) - 127).toByte)
      val cents = Array.fill(k * d)((rnd.nextInt(255) - 127).toByte)
      (i, v, cents)
    }
    val got = rows.toDF("i", "v", "cents")
      .selectExpr("i", "int8_dist2s(v, cents) AS ds")
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    rows.foreach { case (i, v, cents) =>
      val d = v.length
      val want = cents.grouped(d).map { c =>
        v.indices.map(j => { val x = v(j).toLong - c(j).toLong; x * x }).sum
      }.toSeq
      assert(got(i) == want, s"case $i d=$d")
    }
    // geometry violations and nulls
    val g = spark.sql(
      """SELECT
        |  int8_dist2s(CAST(NULL AS BINARY), int8_pack(array(1.0d), 1.0d)) AS n1,
        |  int8_dist2s(int8_pack(array(1.0d, 2.0d), 1.0d),
        |              int8_pack(array(1.0d, 2.0d, 3.0d), 1.0d)) AS n2
        |""".stripMargin).head()
    assert(g.isNullAt(0) && g.isNullAt(1))
  }
}
