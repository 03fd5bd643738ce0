package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Sketch aggregators for near-duplicate detection.
  *
  * Both are `Aggregator`s (partial-aggregation-capable: map-side
  * combine runs on executors before the shuffle, so the shuffle
  * carries one 64-element signature per document, not one row per
  * shingle — the property that makes these viable at 100 TB).
  */
object Sketches {

  val SigLen = 64

  /** MinHash signature of a set of shingles. Input: two base hashes
    * (h1, h2) per shingle; the k-th hash function is h1 + k·h2
    * (Kirsch–Mitzenmacher double hashing), signature element k is the
    * minimum over all shingles.
    */
  class MinHashSig extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.fill(SigLen)(Long.MaxValue)
    override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
      val (h1, h2) = in
      var k = 0
      while (k < SigLen) {
        val h = h1 + k * h2
        if (h < buf(k)) buf(k) = h
        k += 1
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var k = 0
      while (k < SigLen) { if (b(k) < a(k)) a(k) = b(k); k += 1 }
      a
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = ExprEncoders.longArray
    override def outputEncoder: Encoder[Array[Long]] = ExprEncoders.longArray
  }

  /** 64-bit SimHash: per input token hash, add +1/-1 to each bit
    * counter depending on the token's bit; the final signature sets
    * bit k iff counter k > 0.
    */
  class SimHash extends Aggregator[Long, Array[Int], Long] {
    override def zero: Array[Int] = new Array[Int](SigLen)
    override def reduce(buf: Array[Int], h: Long): Array[Int] = {
      var k = 0
      while (k < SigLen) {
        buf(k) += (if (((h >>> k) & 1L) == 1L) 1 else -1)
        k += 1
      }
      buf
    }
    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var k = 0
      while (k < SigLen) { a(k) += b(k); k += 1 }
      a
    }
    override def finish(buf: Array[Int]): Long = {
      var sig = 0L
      var k = 0
      while (k < SigLen) { if (buf(k) > 0) sig |= (1L << k); k += 1 }
      sig
    }
    override def bufferEncoder: Encoder[Array[Int]] = ExprEncoders.intArray
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  private object ExprEncoders {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val longArray: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    val intArray: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
  }

  /** minhash_sig(h1, h2) → array<bigint>[64] */
  def minhashSig(h1: Column, h2: Column): Column =
    udaf(new MinHashSig(), Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .apply(h1, h2)

  /** simhash(h) → bigint */
  def simhash(h: Column): Column =
    udaf(new SimHash(), Encoders.scalaLong).apply(h)
}
