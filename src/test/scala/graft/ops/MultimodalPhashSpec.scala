package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Perceptual-hash image near-dup (r17 verdict item 5): dHash over
  * the real imageio decode seam, Hamming-banded candidate equi-join,
  * exact popcount verify. Pins (1) the fixture roundtrip the gate
  * leans on (render(cellsForBits(h)) decodes+hashes back to h through
  * the FULL codec path), (2) near-identical rendered photos landing
  * within the radius while distinct ones stay far, (3) totality on
  * mixed corpora (null/non-image payloads), (4) the pigeonhole
  * exactness claim: banded output == brute force, and (5) the
  * candidate stage staying an equi-join, never a nested loop.
  */
class MultimodalPhashSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  /** Deterministic pseudo-random 64-bit values (SplitMix64 — fixed
    * seed, no Math.random in specs).
    */
  private def splitmix(seed: Long, n: Int): Seq[Long] = {
    var x = seed
    (1 to n).map { _ =>
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
  }

  test("fixture roundtrip: rendered cells decode+hash back to the planted " +
      "64-bit value through the real codec path") {
    splitmix(7L, 32).foreach { bits =>
      val png = Multimodal.grayCellsPng(Multimodal.cellsForBits(bits))
      val got = Multimodal.phashOf(png)
      assert(got != null && got.longValue() == bits,
        s"roundtrip lost bits: planted $bits got $got")
    }
  }

  /** A real "photo": 64×48 RGB gradient with a seeded texture. */
  private def photo(seed: Long, w: Int = 64, h: Int = 48,
      invert: Boolean = false): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val noise = splitmix(seed, w * h).iterator
    for (y <- 0 until h; x <- 0 until w) {
      val base = (x * 255 / w + y * 255 / h) / 2
      val v0 = math.min(255, math.max(0, base + (noise.next() % 7).toInt))
      val v = if (invert) 255 - v0 else v0
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def pngOf(img: java.awt.image.BufferedImage): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  test("near-identical rendered images pair up within the radius; distinct " +
      "images and non-images never do") {
    val sp = spark; import sp.implicits._
    val base = photo(11L)
    // a light retouch: a 2×2 patch inside ONE downscale block — the
    // re-encoded copy must stay within a few dHash bits
    val touched = photo(11L)
    for (y <- 8 until 10; x <- 22 until 24)
      touched.setRGB(x, y, 0xffffff)
    val rows = Seq[(Long, Array[Byte])](
      (1L, pngOf(base)),
      (2L, pngOf(touched)),
      (3L, pngOf(photo(11L, invert = true))), // structurally opposite
      (4L, "not an image at all".getBytes("UTF-8")),
      (5L, null))
    val df = rows.toDF("doc_id", "payload")
    val hashed = Multimodal.imagePhash(df, "payload")
      .select(col("doc_id"), col("phash")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(hashed(4L).isEmpty && hashed(5L).isEmpty,
      "non-image payloads must hash to null, not crash or fake a value")
    assert(hashed(1L).isDefined && hashed(2L).isDefined && hashed(3L).isDefined)
    val d12 = java.lang.Long.bitCount(hashed(1L).get ^ hashed(2L).get)
    val d13 = java.lang.Long.bitCount(hashed(1L).get ^ hashed(3L).get)
    assert(d12 <= 3, s"retouched copy drifted $d12 bits from the original")
    assert(d13 > 20, s"inverted image only $d13 bits away — no discrimination")

    val pairs = Dedup.imagePhashNearDup(df, "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)),
      s"expected exactly the retouched pair, got $pairs")
  }

  test("banded pair join equals brute force (pigeonhole exactness) and " +
      "stays an equi-join") {
    val sp = spark; import sp.implicits._
    // 300 random hashes plus planted near-dups at distances 0..4
    val rnd = splitmix(23L, 300)
    val planted = Seq(
      rnd(0),                                  // dist 0 to id 0
      rnd(1) ^ 1L,                             // dist 1
      rnd(2) ^ (1L << 17) ^ (1L << 61),        // dist 2
      rnd(3) ^ (1L << 5) ^ (1L << 30) ^ (1L << 47), // dist 3
      rnd(4) ^ 0x0f0L)                         // dist 4 — OUTSIDE radius
    val all = (rnd ++ planted).zipWithIndex
      .map { case (h, i) => (i.toLong, h) }
    val df = all.toDF("id", "h")
    val banded = Dedup.hammingNearDup(df, "id", "h")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      (ia, ha) <- all; (ib, hb) <- all
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib, java.lang.Long.bitCount(ha ^ hb).toLong)).toSet
    assert(banded == brute,
      s"banded != brute: missing ${brute -- banded}, extra ${banded -- brute}")
    assert(brute.exists(_._1 == 0L) && brute.exists(p => p._3 == 3L),
      "fixture must actually exercise the radius boundary")
    assert(!banded.exists { case (a, b, _) => a == 4L + 300L || b == 304L },
      "distance-4 plant must stay outside the radius")

    val plan = Dedup.hammingNearDup(df, "id", "h")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.toLowerCase.contains("loop"),
      s"candidate stage must be an equi-join on (band, value):\n$plan")
  }

  test("a null id raises in-row instead of silently voiding its pairs") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(5L)),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(5L)))
      .toDF("id", "h")
    val e = intercept[Exception] {
      Dedup.hammingNearDup(df, "id", "h").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("null id")),
      s"expected the in-row null-id raise, got: $e")
  }

  test("maxDist >= nBands is refused (the exactness guarantee would break)") {
    val sp = spark; import sp.implicits._
    val df = Seq((1L, 2L)).toDF("id", "h")
    val e = intercept[IllegalArgumentException] {
      Dedup.hammingNearDup(df, "id", "h", maxDist = 4, nBands = 4)
    }
    assert(e.getMessage.contains("pigeonhole"))
  }
}
