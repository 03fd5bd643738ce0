package graft.ops

/** Modality-decode microbench (no Spark): isolates the per-payload
  * cost of the audio and image fingerprint paths — render, decode,
  * and their thread-scaling — so a slow media dedup leg can be
  * attributed to per-row work vs plan shape before touching the plan.
  * Run: `runMain graft.ops.ProfModality [nDocs] [threads]`.
  */
object ProfModality {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    val threads = args.lift(1).map(_.toInt).getOrElse(32)
    val bits = (0 until n).map(i => i.toLong * 0x9E3779B97F4A7C15L)

    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.3f s ($n payloads)")
    }
    def parTimed(name: String)(f: Long => Unit): Unit = {
      val t0 = System.nanoTime()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      bits.foreach(b => pool.submit(new Runnable { def run(): Unit = f(b) }))
      pool.shutdown()
      pool.awaitTermination(600, java.util.concurrent.TimeUnit.SECONDS)
      println(f"PROF $name(x$threads) ${(System.nanoTime() - t0) / 1e9}%.3f s ($n payloads)")
    }

    // single-threaded costs
    val wavs = new Array[Array[Byte]](n)
    val pngs = new Array[Array[Byte]](n)
    timed("wav_render")(bits.zipWithIndex.foreach { case (b, i) =>
      wavs(i) = Multimodal.energyCellsWav(Multimodal.cellsForBits(b)) })
    timed("png_render")(bits.zipWithIndex.foreach { case (b, i) =>
      pngs(i) = Multimodal.grayCellsPng(Multimodal.cellsForBits(b)) })
    timed("wav_decode")(wavs.foreach(Multimodal.audioFingerprintOf(_)))
    timed("png_decode")(pngs.foreach(Multimodal.phashOf(_)))

    // multi-threaded: does the JDK SPI seam serialize under load?
    parTimed("wav_render")(b =>
      Multimodal.energyCellsWav(Multimodal.cellsForBits(b)))
    parTimed("png_render")(b =>
      Multimodal.grayCellsPng(Multimodal.cellsForBits(b)))
    val wav0 = Multimodal.energyCellsWav(Multimodal.cellsForBits(42L))
    val png0 = Multimodal.grayCellsPng(Multimodal.cellsForBits(42L))
    parTimed("wav_decode")(_ => Multimodal.audioFingerprintOf(wav0))
    parTimed("png_decode")(_ => Multimodal.phashOf(png0))
  }
}
