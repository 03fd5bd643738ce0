package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The audio energy fingerprint — the last dedup modality: WAV decode
  * through the real javax.sound seam, silence trim, 72-block integer
  * energy grid, dHash packing. Pins the render/decode roundtrip the
  * gates rely on, the re-encode/padding invariances near-dup detection
  * needs, and parity of the cluster collapse with the pairwise closure
  * on planted clips.
  */
class MultimodalAudioFpSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private def bitsOf(seed: Long): Long = {
    // a deterministic, well-mixed 64-bit pattern per seed
    var x = seed * 0x9E3779B97F4A7C15L + 0x165667B19E3779F9L
    x ^= x >>> 29; x *= 0xBF58476D1CE4E5B9L
    x ^= x >>> 32
    x
  }

  private def wavForBits(bits: Long, samplesPerBlock: Int = 4): Array[Byte] =
    Multimodal.energyCellsWav(Multimodal.cellsForBits(bits),
      samplesPerBlock = samplesPerBlock)

  test("render/decode roundtrip recovers planted bits exactly through " +
      "the full WAV codec path") {
    val bits = Seq(0L, -1L, bitsOf(1), bitsOf(2), 0x5A5A5A5AF0F0F0F0L)
    bits.foreach { b =>
      val fp = Multimodal.audioFingerprintOf(wavForBits(b))
      assert(fp != null && fp.longValue == b,
        s"roundtrip lost bits: planted ${b.toHexString}, " +
          s"got ${Option(fp).map(_.longValue.toHexString)}")
    }
  }

  test("the fingerprint is invariant to time-stretch, amplitude scale, " +
      "and silence padding") {
    val b = bitsOf(7)
    val baseline = Multimodal.audioFingerprintOf(wavForBits(b))
    // time-stretch: same grid rendered at 2x/4x samples per block
    assert(Multimodal.audioFingerprintOf(wavForBits(b, 8)) == baseline)
    assert(Multimodal.audioFingerprintOf(wavForBits(b, 16)) == baseline)
    // amplitude scale: doubled gain (monotone on block energies)
    val louder = Multimodal.energyCellsWav(
      Multimodal.cellsForBits(b), samplesPerBlock = 4, scale = 128)
    assert(Multimodal.audioFingerprintOf(louder) == baseline)
    // silence padding: splice zero samples around the clip's PCM body
    // by rendering a padded cell row is NOT enough (cells never hit
    // zero) — pad the real WAV data chunk instead
    val padded = padWithSilence(wavForBits(b), padFrames = 500)
    assert(Multimodal.audioFingerprintOf(padded) == baseline,
      "zero-padding must trim away without moving the grid")
  }

  /** Re-render the clip with `padFrames` zero samples before and
    * after: decode the source WAV's PCM, splice, re-encode — a real
    * padded re-encode, not a byte hack.
    */
  private def padWithSilence(wav: Array[Byte], padFrames: Int): Array[Byte] = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val body = in.readAllBytes()
    val fmt = in.getFormat
    val padBytes = new Array[Byte](padFrames * fmt.getFrameSize)
    val all = padBytes ++ body ++ padBytes
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(all), fmt,
      all.length.toLong / fmt.getFrameSize)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    buf.toByteArray
  }

  test("near variants land within the radius; distinct clips disagree " +
      "on ~half the bits; non-audio payloads fingerprint null") {
    val b = bitsOf(11)
    val near = b ^ 0x0000000000010010L // 2 bits retouched
    val fpA = Multimodal.audioFingerprintOf(wavForBits(b)).longValue
    val fpN = Multimodal.audioFingerprintOf(wavForBits(near)).longValue
    assert(java.lang.Long.bitCount(fpA ^ fpN) == 2)
    val distinct = Multimodal.audioFingerprintOf(
      wavForBits(bitsOf(12))).longValue
    val d = java.lang.Long.bitCount(fpA ^ distinct)
    assert(d > 16, s"distinct clips too close: $d bits")
    // non-audio: PNG payload, garbage, null, pure silence
    assert(Multimodal.audioFingerprintOf(
      Multimodal.grayCellsPng(Multimodal.cellsForBits(b))) == null)
    assert(Multimodal.audioFingerprintOf("not audio".getBytes) == null)
    assert(Multimodal.audioFingerprintOf(null) == null)
    val silentCells = new Array[Int](Multimodal.PhashW * Multimodal.PhashH)
    assert(Multimodal.audioFingerprintOf(
      Multimodal.energyCellsWav(silentCells)) == null,
      "pure silence must fingerprint null, not zero")
  }

  test("audioFpNearDup pairs re-encoded copies across a mixed corpus; " +
      "audioFpClusters equals the pairwise closure") {
    val sp = spark; import sp.implicits._
    val b1 = bitsOf(21)
    val rows: Seq[(Long, Array[Byte])] = Seq(
      1L -> wavForBits(b1),
      2L -> wavForBits(b1, samplesPerBlock = 8),      // re-encoded copy
      3L -> padWithSilence(wavForBits(b1), 300),      // padded copy
      4L -> wavForBits(b1 ^ 3L),                      // light retouch (2 bits)
      5L -> wavForBits(bitsOf(22)),                   // distinct clip
      6L -> Multimodal.grayCellsPng(                  // an IMAGE row
        Multimodal.cellsForBits(bitsOf(23))),
      7L -> "plain text payload".getBytes             // a text row
    )
    val docs = rows.toDF("doc_id", "payload")
    val pairs = Dedup.audioFpNearDup(docs, "doc_id", "payload")
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L)),
      s"expected the 4-copy clique only, got $pairs")
    val clusters = Dedup.audioFpClusters(docs, "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val legacy = Dedup.clusterLabelsOf(
      Dedup.audioFpNearDup(docs, "doc_id", "payload")
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(clusters == legacy && clusters ==
      Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)))
  }
}
