package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, processed in partition-sized batches.
  *
  * The actual media codecs are NOT in this container, so the decoder
  * is pluggable: production wires a real library behind [[Decoder]];
  * tests and the probe corpus use [[StubDecoder]], a deterministic
  * fake. Everything Spark-side — schema, batching, partitioning, the
  * mapPartitions seam — is real and tested.
  */
object Multimodal {

  // ImageIO's default input-stream cache is DISK-backed: every
  // createImageInputStream over an in-memory byte[] allocates (and
  // later deletes) a temp file. Pure waste for byte-array decodes —
  // switch it off once per JVM (object init runs on driver and on
  // each executor the first time a decode closure touches Multimodal).
  javax.imageio.ImageIO.setUseCache(false)

  val MediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Batch decoder contract: one call per bounded batch, never per
    * row — the shape a native codec binding needs to amortize setup.
    * Decoders MUST be 1:1 — emit a fallback row for every payload
    * they cannot decode (including null payloads) rather than
    * skipping it; [[withMediaMeta]] enforces the count per batch.
    */
  trait Decoder extends Serializable {
    def decodeBatch(payloads: Iterator[Array[Byte]]): Iterator[Row]
  }

  private def fallbackRow(bytes: Array[Byte]): Row = {
    val n = if (bytes == null) 0 else bytes.length
    Row("stub", n % 640, (n / 2) % 480,
      if (n == 0) 0 else bytes(0) & 0x0f)
  }

  /** Deterministic fake: "decodes" metadata from the payload bytes
    * (length + first bytes), standing in for an audio/video codec.
    * Total: null payloads map to the zero-byte row.
    */
  object StubDecoder extends Decoder {
    override def decodeBatch(payloads: Iterator[Array[Byte]]): Iterator[Row] =
      payloads.map(fallbackRow)
  }

  /** Real image decoding via the JDK's built-in `javax.imageio` (PNG,
    * JPEG, GIF, BMP — no external codec library needed): actual pixel
    * dimensions, the reader's format name, and the frame count (>1 for
    * animated GIFs). Reader instances are NOT thread-safe but ARE
    * reusable, so each partition-batch resolves readers per image
    * while the surrounding task amortizes classloading/SPI lookup —
    * the batch shape [[Decoder]] prescribes. Payloads no reader
    * recognizes (audio/video/garbage) fall back to [[StubDecoder]]'s
    * deterministic row, keeping the decode total and the pipeline
    * non-failing on mixed corpora.
    */
  object ImageIoDecoder extends Decoder {
    override def decodeBatch(payloads: Iterator[Array[Byte]]): Iterator[Row] =
      payloads.map(b => decodeImage(b).getOrElse(fallbackRow(b)))
  }

  // the JDK image plugins throw UNCHECKED exceptions on corrupt
  // payloads (ArrayIndexOutOfBounds on truncated GIFs, CMMException on
  // broken JPEG color profiles) — a total decode seam must catch
  // NonFatal, not just IOException, or one wild-corpus row kills the
  // task deterministically across retries
  private def decodeImage(bytes: Array[Byte]): Option[Row] = {
    if (bytes == null) return None
    try {
      val stream = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(stream)
        if (readers.hasNext) {
          val reader = readers.next()
          try {
            reader.setInput(stream, false, true)
            val nFrames =
              try reader.getNumImages(true)
              catch { case _: java.io.IOException => 1 }
            Some(Row(reader.getFormatName.toLowerCase,
              reader.getWidth(0), reader.getHeight(0), nFrames))
          } finally reader.dispose()
        } else None
      } finally if (stream != null) stream.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Real audio header parsing via the JDK's built-in
    * `javax.sound.sampled` (WAV, AIFF, AU — no external codec
    * library): the container type as `format`, the sample rate (Hz)
    * as `width`, the channel count as `height`, and the PCM frame
    * length as `n_frames` — the same typed-metadata struct the image
    * path fills, so downstream filters (`media.format`,
    * `media.n_frames`) work across modalities. Header-only: the
    * stream is never fully decoded, so cost is independent of clip
    * length. Payloads the sound SPI rejects fall back to the
    * deterministic stub row, keeping the decode total.
    */
  object AudioIoDecoder extends Decoder {
    override def decodeBatch(payloads: Iterator[Array[Byte]]): Iterator[Row] =
      payloads.map(b => decodeAudio(b).getOrElse(fallbackRow(b)))
  }

  private def decodeAudio(bytes: Array[Byte]): Option[Row] = {
    if (bytes == null) return None
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = aff.getFormat
      Some(Row(aff.getType.toString.toLowerCase,
        math.round(fmt.getSampleRate), fmt.getChannels,
        aff.getFrameLength))
    } catch {
      // NonFatal, not just the two declared types: a malformed header
      // with a valid RIFF magic can drive the SPI parsers into
      // unchecked arithmetic/bounds errors (same totality argument as
      // decodeImage)
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Magic-byte modality sniff: every container format the JDK's two
    * built-in codec stacks can actually open is identifiable from the
    * first ≤12 bytes, so the mixed-corpus decoder can dispatch
    * straight to the one matching decoder — or the stub — without
    * paying an ImageIO stream + SPI probe AND an audio-SPI
    * `UnsupportedAudioFileException` per non-media row (on a text
    * corpus that is ~every row: exception-driven dispatch plus, before
    * [[ImageIO.setUseCache]] was switched off, a disk-backed cache
    * file per row).
    *
    * Returns 'i' (image: PNG/JPEG/GIF/BMP/TIFF, plus the two-NUL-lead
    * WBMP candidate), 'a' (audio: RIFF-WAVE/AIFF/AU), or 'o'
    * (neither). Narrowing only: a payload sniffed 'i' that then fails
    * image decode still lands on the fallback row, exactly as the
    * old probe-everything chain did.
    */
  private[ops] def sniffModality(b: Array[Byte]): Char = {
    if (b == null || b.length < 4) return 'o'
    @inline def at(i: Int) = b(i) & 0xff
    if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') 'i'
    else if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) 'i' // JPEG
    else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8') 'i'
    else if (at(0) == 'B' && at(1) == 'M') 'i' // BMP
    else if ((at(0) == 'I' && at(1) == 'I' && at(2) == 0x2a && at(3) == 0) ||
             (at(0) == 'M' && at(1) == 'M' && at(2) == 0 && at(3) == 0x2a)) 'i' // TIFF
    else if (at(0) == 0 && at(1) == 0) 'i' // WBMP has no magic; two-NUL lead is its only tell
    else if (b.length >= 12 &&
             at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
             at(8) == 'W' && at(9) == 'A' && at(10) == 'V' && at(11) == 'E') 'a'
    else if (b.length >= 12 &&
             at(0) == 'F' && at(1) == 'O' && at(2) == 'R' && at(3) == 'M' &&
             at(8) == 'A' && at(9) == 'I' && at(10) == 'F') 'a' // AIFF/AIFC
    else if (at(0) == '.' && at(1) == 's' && at(2) == 'n' && at(3) == 'd') 'a' // AU
    else 'o'
  }

  /** Mixed-corpus decoder: magic-byte sniff first, then ONLY the
    * matching decoder — image readers for image magics, the audio SPI
    * for audio magics, the deterministic stub for everything else —
    * one decoder instance for a corpus whose `payload` column carries
    * several modalities, the shape a real curation pipeline has.
    * Non-media rows (i.e. ~every row of a text corpus) never touch a
    * codec SPI: no per-row exception, no ImageIO stream. Video stays
    * stubbed (no JDK-built-in video demuxer exists; a production
    * binding lands behind the same [[Decoder]] seam).
    */
  object MediaIoDecoder extends Decoder {
    override def decodeBatch(payloads: Iterator[Array[Byte]]): Iterator[Row] =
      payloads.map { b =>
        sniffModality(b) match {
          case 'i' => decodeImage(b).getOrElse(fallbackRow(b))
          case 'a' => decodeAudio(b).getOrElse(fallbackRow(b))
          case _   => fallbackRow(b)
        }
      }
  }

  /** Attach decoded metadata to a DataFrame with a binary `payload`
    * column. Runs as mapPartitions over BOUNDED row batches
    * (`batchRows` at a time): the decoder sees one iterator per batch
    * — the amortize-native-setup shape — while memory stays bounded
    * by the batch, never the partition. Each batch's output count is
    * CHECKED against its input count: a decoder that skips an
    * undecodable payload would otherwise silently shift every later
    * row's metadata onto the wrong row, corpus-wide — that's an
    * error, not a misalignment.
    */
  def withMediaMeta(df: DataFrame, payloadCol: String,
      decoder: Decoder = StubDecoder, batchRows: Int = 256): DataFrame = {
    require(batchRows > 0, s"batchRows must be positive, got $batchRows")
    val schema = StructType(df.schema.fields :+ StructField("media", MediaMetaType))
    val payloadIx = df.schema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchRows).flatMap { chunk =>
        val metas = decoder.decodeBatch(
          chunk.iterator.map(_.getAs[Array[Byte]](payloadIx))).toIndexedSeq
        require(metas.size == chunk.size,
          s"decoder returned ${metas.size} rows for a ${chunk.size}-payload " +
            "batch — decoders must be 1:1 (emit a fallback row instead of skipping)")
        chunk.iterator.zip(metas.iterator).map { case (r, meta) =>
          Row.fromSeq(r.toSeq :+ meta)
        }
      }
    }(enc)
  }

  val ImageFeaturesType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_r", IntegerType),
    StructField("mean_g", IntegerType),
    StructField("mean_b", IntegerType)))

  /** REAL image feature extraction — the decode → feature step of a
    * multimodal training pipeline, via the JDK's imageio (PNG, JPEG,
    * GIF, BMP): per-image dimensions plus integer per-channel pixel
    * means (sum div count — deterministic, no float accumulation).
    * Payloads the magic-byte sniff rules out never touch a codec
    * (the [[MediaIoDecoder]] lesson); images that then fail to
    * decode, non-images, and null payloads all map to a NULL struct —
    * total, annotate-don't-filter. One mapPartitions pass like
    * [[resizeImages]]; per-row cost is O(pixels) only where an image
    * actually is, so a mostly-text corpus streams through at scan
    * speed.
    */
  def imageFeatures(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("img_features", ImageFeaturesType))
    val payloadIx = df.schema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIx)
        val feats: Row =
          if (sniffModality(bytes) != 'i') null
          else try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            if (img == null) null
            else {
              val (w, h) = (img.getWidth, img.getHeight)
              var (sr, sg, sb) = (0L, 0L, 0L)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  sr += (rgb >> 16) & 0xff
                  sg += (rgb >> 8) & 0xff
                  sb += rgb & 0xff
                  x += 1
                }
                y += 1
              }
              val n = w.toLong * h
              Row(w, h, (sr / n).toInt, (sg / n).toInt, (sb / n).toInt)
            }
            // NonFatal: JDK plugins throw unchecked on corrupt bodies
            // behind a valid magic (see decodeImage)
          } catch { case scala.util.control.NonFatal(_) => null }
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(enc)
  }

  /** Perceptual difference-hash (dHash) of an image payload: decode
    * via the JDK's imageio, integer area-average to a 9-wide × 8-tall
    * grayscale grid, then one bit per adjacent-cell comparison —
    * bit `i*8+j` is set iff `cell(i, j+1) > cell(i, j)` — packed into
    * one BIGINT. All-integer arithmetic end to end (gray =
    * (299r+587g+114b)/1000, block mean = sum div count), so the hash
    * is bit-deterministic across JVMs and platforms — a hash VALUE,
    * not a float score, which is what lets near-dup candidate joins
    * and their oracles treat it as plain data. Non-images, null
    * payloads and corrupt bodies map to a null hash
    * (annotate-don't-filter; the pair join drops nulls). Robustness
    * comes from the downscale: re-encodes, small crops/noise move few
    * cell means, so true near-dups land within a few bits while
    * distinct images disagree on ~half of them.
    */
  def imagePhash(df: DataFrame, payloadCol: String): DataFrame =
    fingerprintColumn(df, payloadCol, "phash", phashOf)

  /** The shared schema-append `mapPartitions` wrapper every
    * per-payload 64-bit fingerprint rides ([[imagePhash]],
    * [[audioFingerprint]]): append one nullable BIGINT column whose
    * value is `fp(payload bytes)` — a third modality adds only its
    * core function, not another copy of the encoder plumbing.
    */
  private def fingerprintColumn(df: DataFrame, payloadCol: String,
      outCol: String, fp: Array[Byte] => java.lang.Long): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, LongType))
    val payloadIx = df.schema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+ fp(r.getAs[Array[Byte]](payloadIx))))
    }(enc)
  }

  private[ops] val PhashW = 9
  private[ops] val PhashH = 8

  /** The dHash core, decode included — null for anything that is not
    * a decodable image (the [[imageFeatures]] totality contract).
    */
  private[graft] def phashOf(bytes: Array[Byte]): java.lang.Long = {
    if (sniffModality(bytes) != 'i') return null
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) return null
      java.lang.Long.valueOf(dHashOfCells(grayCells(img)))
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** Integer area-average of `img` to the [[PhashW]]×[[PhashH]] gray
    * grid, row-major (`cells(i*PhashW + j)` is row i, column j). Each
    * target cell averages its source block `[j·w/9, (j+1)·w/9) ×
    * [i·h/8, (i+1)·h/8)`; images narrower/shorter than the grid
    * resample single pixels (blocks clamp to at least one source
    * pixel), so the hash is total over every decodable image.
    */
  private[graft] def grayCells(img: java.awt.image.BufferedImage): Array[Int] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val cells = new Array[Int](PhashW * PhashH)
    var i = 0
    while (i < PhashH) {
      val y0 = i * h / PhashH
      val y1 = math.min(h, math.max((i + 1) * h / PhashH, y0 + 1))
      var j = 0
      while (j < PhashW) {
        val x0 = j * w / PhashW
        val x1 = math.min(w, math.max((j + 1) * w / PhashW, x0 + 1))
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
              114L * (rgb & 0xff)) / 1000L
            x += 1
          }
          y += 1
        }
        cells(i * PhashW + j) = (sum / ((x1 - x0).toLong * (y1 - y0))).toInt
        j += 1
      }
      i += 1
    }
    cells
  }

  /** dHash bit-packing over a row-major 9×8 cell grid. */
  private[graft] def dHashOfCells(cells: Array[Int]): Long = {
    var hash = 0L
    var i = 0
    while (i < PhashH) {
      var j = 0
      while (j < PhashW - 1) {
        if (cells(i * PhashW + j + 1) > cells(i * PhashW + j))
          hash |= 1L << (i * (PhashW - 1) + j)
        j += 1
      }
      i += 1
    }
    hash
  }

  /** A cell grid whose [[dHashOfCells]] is exactly `bits`: each row
    * starts at mid-gray and steps ±1 per planted bit, so rendering it
    * with [[grayCellsPng]] and hashing through the REAL decode path
    * recovers the planted 64-bit value bit-for-bit. This is what lets
    * a gate derive its expected hashes from replayable data while the
    * Spark side still pays the full imageio decode.
    */
  /** The media-gate bigram → bit-index polynomial — ONE definition
    * (ADVICE r19: three inline copies had grown — the gate builder in
    * `queries/Extensions.fixtureBits` and two prof harnesses — so a
    * drifting copy would silently measure a stale shape). The DuckDB
    * oracles replay this exact integer rule (`phashBitsCte`); change
    * it ONLY together with them.
    */
  private[graft] def bigramBitIndex(g: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    def a(k: Int) = ascii(substring(g, k, 1)).cast("long")
    (a(1) + a(2) * 31L + a(3) * 961L + a(4) * 29791L +
      a(5) * 923521L + a(6) * 28629151L + a(7) * 887503681L +
      length(g).cast("long") * 127L) % 64L
  }

  def cellsForBits(bits: Long): Array[Int] = {
    val cells = new Array[Int](PhashW * PhashH)
    var i = 0
    while (i < PhashH) {
      cells(i * PhashW) = 128
      var j = 0
      while (j < PhashW - 1) {
        val up = ((bits >>> (i * (PhashW - 1) + j)) & 1L) == 1L
        cells(i * PhashW + j + 1) = cells(i * PhashW + j) + (if (up) 1 else -1)
        j += 1
      }
      i += 1
    }
    cells
  }

  /** Render a row-major 9×8 cell grid as a real grayscale PNG — the
    * fixture substrate for phash gates and specs: TYPE_INT_RGB with
    * r=g=b=cell (PNG is lossless and the gray formula is identity on
    * equal channels), so `imagePhash(render(cells))` recovers exactly
    * `dHashOfCells(cells)` THROUGH the full decode path. Cell values
    * are clamped to 0..255.
    */
  def grayCellsPng(cells: Array[Int]): Array[Byte] = {
    require(cells.length == PhashW * PhashH,
      s"expected ${PhashW * PhashH} cells, got ${cells.length}")
    // spec-compliant truecolor PNG written directly (signature +
    // IHDR + one deflated IDAT + IEND) instead of ImageIO.write:
    // the encoder SPI serialized under local[32] exactly like the
    // audio seam (measured 1.7 s/5k single vs 0.8 s/5k at 32
    // threads), while Deflater/CRC32 are plain per-instance zlib.
    // r=g=b=v truecolor (NOT grayscale colortype: a CS_GRAY decode
    // would pass through a colorspace conversion and could move
    // pixel values), so ImageIO's REAL decode recovers each cell
    // exactly — the roundtrip spec pins it.
    val raw = new Array[Byte](PhashH * (1 + PhashW * 3))
    var i = 0
    var o = 0
    while (i < PhashH) {
      raw(o) = 0 // filter: None
      o += 1
      var j = 0
      while (j < PhashW) {
        val v = math.min(255, math.max(0, cells(i * PhashW + j))).toByte
        raw(o) = v; raw(o + 1) = v; raw(o + 2) = v
        o += 3
        j += 1
      }
      i += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zout = new java.io.ByteArrayOutputStream(raw.length + 64)
    val zchunk = new Array[Byte](raw.length + 64)
    while (!deflater.finished())
      zout.write(zchunk, 0, deflater.deflate(zchunk))
    deflater.end()
    val zbytes = zout.toByteArray
    val out = new java.io.ByteArrayOutputStream(64 + zbytes.length)
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'))
    def chunk(tag: String, body: Array[Byte]): Unit = {
      def be32(v: Int) = Array[Byte](((v >> 24) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      out.write(be32(body.length))
      val tb = tag.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(body)
      out.write(tb); out.write(body); out.write(be32(crc.getValue.toInt))
    }
    chunk("IHDR", Array[Byte](0, 0, 0, PhashW.toByte, 0, 0, 0, PhashH.toByte,
      8 /* bit depth */ , 2 /* truecolor */ , 0, 0, 0))
    chunk("IDAT", zbytes)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Energy fingerprint of an audio payload: decode via the JDK's
    * `javax.sound.sampled` (WAV/AIFF/AU — PCM, any byte order, µ-law;
    * the SPI converts to signed 16-bit), fold channels to one
    * |amplitude| per frame, TRIM leading/trailing quiet (≤ peak/64 —
    * so zero-padded re-encodes fingerprint identically), integer
    * area-average the trimmed envelope to the same 9×8 = 72-block
    * grid the image path uses, then pack one bit per adjacent-block
    * comparison ([[dHashOfCells]] — the dHash convention, applied in
    * the time domain). All-integer end to end (channel fold = sum div
    * channels, block energy = sum div count), so the fingerprint is a
    * bit-deterministic VALUE the near-dup joins and their oracles can
    * treat as plain data — exactly the [[imagePhash]] contract, which
    * is what lets [[graft.ops.Dedup.hammingNearDup]] and the cluster
    * collapse serve both modalities unchanged.
    *
    * Robustness by construction: amplitude scaling is monotone on
    * block energies (comparisons unchanged), time-stretch/resample
    * moves block BOUNDARIES proportionally (the grid is fractional),
    * and padding trims away — while distinct clips disagree on ~half
    * the comparisons. Non-audio payloads, undecodable bodies, and
    * pure silence map to a null fingerprint (annotate-don't-fail; the
    * pair join drops nulls).
    */
  def audioFingerprint(df: DataFrame, payloadCol: String): DataFrame =
    fingerprintColumn(df, payloadCol, "afp", audioFingerprintOf)

  /** The audio fingerprint core, decode included — null for anything
    * that is not decodable audio with at least one non-silent frame.
    */
  private[graft] def audioFingerprintOf(bytes: Array[Byte]): java.lang.Long = {
    if (sniffModality(bytes) != 'a') return null
    // Fast path: plain PCM16LE WAV parsed directly — the dominant
    // wire format, and the one [[energyCellsWav]] renders. The
    // javax.sound SPI path below is CORRECT for it too, but
    // AudioSystem.getAudioInputStream serializes on a JDK-global SPI
    // seam: measured 1.44 s/5k single-threaded vs 1.75 s/5k at 32
    // threads (NEGATIVE scaling) — under local[32] the audio dedup
    // legs ran effectively single-threaded (r19 opt). Identical
    // samples → identical fingerprint; AIFF/AU/µ-law/big-endian
    // still take the SPI + convert path.
    pcm16WavData(bytes) match {
      case Some((off, len, ch)) =>
        val n = len / (2 * ch)
        if (n == 0) return null
        return fingerprintFromPcm16(bytes, off, n, ch)
      case None => // not canonical PCM16LE WAV: SPI fallback below
    }
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val src = in.getFormat
        val pcm =
          if (src.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              src.getSampleSizeInBits == 16 && !src.isBigEndian) in
          else javax.sound.sampled.AudioSystem.getAudioInputStream(
            new javax.sound.sampled.AudioFormat(
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
              src.getSampleRate, 16, src.getChannels,
              src.getChannels * 2, src.getSampleRate, false), in)
        val raw = pcm.readAllBytes()
        val ch = math.max(1, src.getChannels)
        val n = raw.length / (2 * ch)
        if (n == 0) return null
        fingerprintFromPcm16(raw, 0, n, ch)
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** The fingerprint core over interleaved PCM16LE frames at `off`:
    * per-frame |amplitude| fold, peak/64 silence trim, 72-block
    * integer area-average, dHash pack — shared verbatim by the direct
    * WAV parse and the SPI fallback so the two paths cannot diverge.
    */
  private def fingerprintFromPcm16(raw: Array[Byte], off: Int, n: Int,
      ch: Int): java.lang.Long = {
    // one |amplitude| per frame: mean over channels of |sample|
    val amp = new Array[Long](n)
    var i = 0
    while (i < n) {
      var s = 0L
      var c = 0
      while (c < ch) {
        val o = off + (i * ch + c) * 2
        s += math.abs(((raw(o) & 0xff) | (raw(o + 1) << 8)).toShort.toLong)
        c += 1
      }
      amp(i) = s / ch
      i += 1
    }
    var peak = 0L
    i = 0
    while (i < n) { if (amp(i) > peak) peak = amp(i); i += 1 }
    if (peak == 0L) return null // pure silence: nothing to fingerprint
    // trim quiet lead/tail so padding never shifts the grid
    val floor = peak / 64
    var lo = 0
    while (lo < n && amp(lo) <= floor) lo += 1
    var hi = n - 1
    while (hi > lo && amp(hi) <= floor) hi -= 1
    val len = hi - lo + 1
    // integer area-average to 72 time blocks (the 9×8 grid
    // row-major); short clips clamp blocks to ≥1 frame like
    // grayCells does for small images
    val nb = PhashW * PhashH
    val cells = new Array[Int](nb)
    var k = 0
    while (k < nb) {
      val t0 = lo + (k.toLong * len / nb).toInt
      val t1 = math.min(lo + len,
        math.max(lo + ((k + 1).toLong * len / nb).toInt, t0 + 1))
      var sum = 0L
      var t = t0
      while (t < t1) { sum += amp(t); t += 1 }
      cells(k) = (sum / (t1 - t0)).toInt
      k += 1
    }
    java.lang.Long.valueOf(dHashOfCells(cells))
  }

  /** Direct RIFF/WAVE chunk walk: Some((data offset, data length,
    * channels)) when the payload is a plain PCM (format tag 1)
    * 16-bit little-endian WAV whose data chunk lies in bounds —
    * exactly the case whose samples the SPI path would hand over
    * unconverted, so parsing here is sample-identical. Anything else
    * (extensible/float/µ-law tags, other depths, truncated chunks)
    * returns None and takes the SPI path.
    */
  private[graft] def pcm16WavData(b: Array[Byte]): Option[(Int, Int, Int)] = {
    @inline def u16(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    @inline def u32(o: Int) = (b(o) & 0xff).toLong | ((b(o + 1) & 0xff).toLong << 8) |
      ((b(o + 2) & 0xff).toLong << 16) | ((b(o + 3) & 0xff).toLong << 24)
    if (b.length < 44) return None
    // sniffModality already matched RIFF....WAVE for 'a'; re-check so
    // the parser is safe standalone
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var pos = 12
    var channels = -1
    var ok = false
    var dataOff = -1
    var dataLen = -1
    while (pos + 8 <= b.length && (dataOff < 0 || channels < 0)) {
      val size = u32(pos + 4)
      if (size < 0 || size > Int.MaxValue - 8) return None
      val body = pos + 8
      if (b(pos) == 'f' && b(pos + 1) == 'm' && b(pos + 2) == 't' &&
          b(pos + 3) == ' ') {
        if (size < 16 || body + 16 > b.length) return None
        val tag = u16(body)
        channels = u16(body + 2)
        val bits = u16(body + 14)
        ok = tag == 1 && bits == 16 && channels >= 1
        if (!ok) return None
      } else if (b(pos) == 'd' && b(pos + 1) == 'a' && b(pos + 2) == 't' &&
          b(pos + 3) == 'a') {
        dataOff = body
        dataLen = math.min(size, (b.length - body).toLong).toInt
      }
      pos = body + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    if (ok && dataOff >= 0) Some((dataOff, dataLen, channels)) else None
  }

  /** Render a 72-cell energy grid as a real 16-bit PCM mono WAV whose
    * [[audioFingerprintOf]] is exactly `dHashOfCells(cells)` — the
    * audio counterpart of [[grayCellsPng]]: each block holds
    * `samplesPerBlock` alternating ±(cell·scale) samples, so the
    * decoded block energy is cell·scale EXACTLY (integer mean of a
    * constant) and the adjacent-block comparisons reproduce the
    * planted bits through the full decode path. [[cellsForBits]]
    * grids stay within 121..135, far above the peak/64 trim floor,
    * so nothing trims. `samplesPerBlock` varies the clip length
    * WITHOUT moving the fingerprint (blocks scale with the grid) —
    * the time-stretch invariance fixture.
    */
  def energyCellsWav(cells: Array[Int], samplesPerBlock: Int = 4,
      sampleRate: Int = 8000, scale: Int = 64): Array[Byte] = {
    require(cells.length == PhashW * PhashH,
      s"expected ${PhashW * PhashH} cells, got ${cells.length}")
    require(samplesPerBlock >= 1 && scale >= 1)
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
    // canonical 44-byte RIFF/WAVE header written directly —
    // byte-identical to AudioSystem.write's PCM16LE-mono output
    // (spec-pinned), but with no trip through the JDK sound SPI,
    // whose global locks serialized the render under local[32]
    // (measured 3.5 s/5k single-threaded vs 2.7 s/5k at 32 threads;
    // the direct writer parallelizes like any byte copy — r19 opt)
    val out = new Array[Byte](44 + data.length)
    @inline def w32(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte; out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    @inline def w16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    @inline def tag(o: Int, s: String): Unit = {
      var i = 0; while (i < 4) { out(o + i) = s.charAt(i).toByte; i += 1 }
    }
    tag(0, "RIFF"); w32(4, 36 + data.length); tag(8, "WAVE")
    tag(12, "fmt "); w32(16, 16)
    w16(20, 1) // PCM
    w16(22, 1) // mono
    w32(24, sampleRate)
    w32(28, sampleRate * 2) // byte rate = rate * blockAlign(2)
    w16(32, 2) // block align: 1 channel * 16 bit
    w16(34, 16) // bits per sample
    tag(36, "data"); w32(40, data.length)
    System.arraycopy(data, 0, out, 44, data.length)
    out
  }

  /** Deterministic frame sampling for (stub) video payloads: every
    * k-th frame index up to n_frames; zero-frame media sample an
    * EMPTY list (not frame 0 — there is no frame 0 to extract).
    */
  def sampleFrames(df: DataFrame, every: Int = 2): DataFrame =
    df.withColumn("sampled_frames",
      when(col("media.n_frames") <= 0,
        array().cast(ArrayType(IntegerType)))
        .otherwise(filter(sequence(lit(0), col("media.n_frames") - 1),
          i => i % every === 0)))

  /** Downscale image payloads to fit a bounding box, preserving aspect
    * ratio — the thumbnail/normalize step of a multimodal training
    * pipeline, real via the JDK's imageio (decode → AffineTransform
    * scale → re-encode PNG). Adds `resized: binary`; payloads that are
    * already inside the box pass through unchanged, payloads no image
    * reader recognizes map to null (total, non-failing on mixed
    * corpora). Runs as one mapPartitions pass so codec setup amortizes
    * per batch, like [[withMediaMeta]].
    */
  def resizeImages(df: DataFrame, payloadCol: String,
      maxW: Int = 256, maxH: Int = 256): DataFrame = {
    require(maxW > 0 && maxH > 0, "bounding box must be positive")
    val schema = StructType(df.schema.fields :+ StructField("resized", BinaryType))
    val payloadIx = df.schema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIx)
        val resized: Array[Byte] =
          if (bytes == null) null // total on nullable payload columns
          else try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            if (img == null) null
            else if (img.getWidth <= maxW && img.getHeight <= maxH) bytes
            else {
              val scale = math.min(
                maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight)
              val (w, h) = (
                math.max(1, math.round(img.getWidth * scale).toInt),
                math.max(1, math.round(img.getHeight * scale).toInt))
              val out = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              try {
                g.setRenderingHint(
                  java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(img, 0, 0, w, h, null)
              } finally g.dispose()
              val buf = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", buf)
              buf.toByteArray
            }
            // NonFatal: JDK plugins throw unchecked on corrupt bodies
            // behind a valid magic (see decodeImage)
          } catch { case scala.util.control.NonFatal(_) => null }
        Row.fromSeq(r.toSeq :+ resized)
      }
    }(enc)
  }
}
