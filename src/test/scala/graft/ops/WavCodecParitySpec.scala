package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** r19 optimization pins: the direct WAV writer and the direct PCM16
  * parse replaced the javax.sound SPI on the hot paths (the SPI's
  * global locks serialized the audio dedup legs under local[32]) —
  * these tests pin that the bytes and the fingerprints are IDENTICAL
  * to what the SPI produced, and that non-canonical payloads still
  * take the SPI fallback.
  */
class WavCodecParitySpec extends AnyFunSuite {

  private def bitsOf(seed: Long): Long = {
    var x = seed * 0x9E3779B97F4A7C15L + 0x165667B19E3779F9L
    x ^= x >>> 29; x *= 0xBF58476D1CE4E5B9L
    x ^= x >>> 32
    x
  }

  /** The pre-r19 renderer, verbatim: PCM16LE mono through
    * AudioSystem.write — the byte-identity reference.
    */
  private def spiRender(cells: Array[Int], samplesPerBlock: Int = 4,
      sampleRate: Int = 8000, scale: Int = 64): Array[Byte] = {
    val n = cells.length * samplesPerBlock
    val data = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      val v = math.min(32767, math.max(0, cells(t / samplesPerBlock) * scale))
      val s = (if (t % 2 == 0) v else -v).toShort
      data(2 * t) = (s & 0xff).toByte
      data(2 * t + 1) = ((s >> 8) & 0xff).toByte
      t += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    buf.toByteArray
  }

  test("direct WAV writer is byte-identical to the AudioSystem.write " +
      "it replaced, across block sizes and rates") {
    for (bits <- Seq(0L, -1L, bitsOf(3), bitsOf(11));
         spb <- Seq(1, 4, 16); rate <- Seq(8000, 44100)) {
      val cells = Multimodal.cellsForBits(bits)
      val direct = Multimodal.energyCellsWav(cells, spb, rate)
      val spi = spiRender(cells, spb, rate)
      assert(java.util.Arrays.equals(direct, spi),
        s"bytes diverged for bits=${bits.toHexString} spb=$spb rate=$rate " +
          s"(direct ${direct.length}B vs spi ${spi.length}B)")
    }
  }

  test("pcm16WavData parses the canonical render (offset 44, full data " +
      "chunk, mono) and refuses non-PCM16 payloads") {
    val wav = Multimodal.energyCellsWav(Multimodal.cellsForBits(bitsOf(5)))
    assert(Multimodal.pcm16WavData(wav).contains((44, wav.length - 44, 1)))
    // an 8-bit unsigned PCM WAV must take the SPI path (format ok but
    // not 16-bit)
    val fmt8 = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val body8 = Array.tabulate[Byte](64)(i => (128 + (i % 32)).toByte)
    val ais8 = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(body8), fmt8, 64L)
    val buf8 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais8,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, buf8)
    assert(Multimodal.pcm16WavData(buf8.toByteArray).isEmpty)
    // non-audio bytes refuse
    assert(Multimodal.pcm16WavData("not a wav at all, too short".getBytes).isEmpty)
  }

  test("direct PNG writer: ImageIO's real decode recovers every cell " +
      "value exactly (pixel-level, stronger than the dHash roundtrip)") {
    for (bits <- Seq(0L, -1L, bitsOf(9))) {
      val cells = Multimodal.cellsForBits(bits)
      val png = Multimodal.grayCellsPng(cells)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      assert(img != null && img.getWidth == 9 && img.getHeight == 8)
      for (i <- 0 until 8; j <- 0 until 9) {
        val rgb = img.getRGB(j, i)
        val (r, g, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
        val want = math.min(255, math.max(0, cells(i * 9 + j)))
        assert(r == want && g == want && b == want,
          s"pixel ($i,$j): got ($r,$g,$b) want $want for bits=${bits.toHexString}")
      }
    }
  }

  test("fast-path fingerprint equals the SPI fallback's on the same " +
      "samples; non-canonical audio still fingerprints via the SPI") {
    for (bits <- Seq(bitsOf(1), bitsOf(2), 0x5A5A5A5AF0F0F0F0L)) {
      val wav = Multimodal.energyCellsWav(Multimodal.cellsForBits(bits))
      // fast path (canonical WAV)
      val fast = Multimodal.audioFingerprintOf(wav)
      // force the SPI path on the same samples by re-encoding as AIFF
      // (big-endian container — pcm16WavData can't parse it)
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      val buf = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(in,
        javax.sound.sampled.AudioFileFormat.Type.AIFF, buf)
      val aiff = buf.toByteArray
      assert(Multimodal.pcm16WavData(aiff).isEmpty,
        "AIFF must not parse as canonical WAV")
      val spi = Multimodal.audioFingerprintOf(aiff)
      assert(fast != null && fast == spi && fast.longValue == bits,
        s"paths diverged for ${bits.toHexString}: fast=$fast spi=$spi")
    }
  }
}
