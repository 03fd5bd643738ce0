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

  /** Misra-Gries frequent-items result: surviving candidate items and
    * the total decrement mass applied (`debt`). The a-posteriori
    * guarantee the consumers gate on: for ANY item, true count −
    * sketch estimate ≤ debt, so an item ABSENT from `items` has true
    * count ≤ debt.
    */
  final case class MGResult(items: Array[String], debt: Long)

  /** Misra-Gries heavy-hitters sketch (Misra & Gries 1982; mergeable
    * form per Agarwal et al., "Mergeable Summaries", PODS 2012) over
    * string items, at most `capacity` counters.
    *
    * reduce: increment if tracked or there is room; otherwise
    * decrement every counter by 1 (one global decrement, debt += 1)
    * and drop zeros — amortized O(1) per item since each overflow
    * removes `capacity`+1 mass. merge: sum counter maps; if over
    * capacity, subtract the (capacity+1)-th largest count from all
    * and keep the positive ones (debt += that count). The debt field
    * is what makes the sketch SELF-CERTIFYING downstream: a consumer
    * that exact-counts the candidates can prove its top-k exact
    * whenever the k-th exact count exceeds the debt.
    */
  class FreqItems(capacity: Int)
      extends Aggregator[String, (scala.collection.mutable.HashMap[String, Long], Long), MGResult] {
    require(capacity > 0, s"FreqItems capacity must be positive, got $capacity")
    type Buf = (scala.collection.mutable.HashMap[String, Long], Long)

    override def zero: Buf = (scala.collection.mutable.HashMap.empty, 0L)

    override def reduce(buf: Buf, item: String): Buf = {
      val (m, debt) = buf
      if (m.contains(item)) { m(item) += 1; (m, debt) }
      else if (m.size < capacity) { m(item) = 1; (m, debt) }
      else {
        // decrement-all: absorbs one occurrence of capacity+1 distinct
        // items (including the new one), keeping every estimate an
        // underestimate by at most the accumulated debt
        val dead = m.iterator.filter(_._2 == 1).map(_._1).toList
        m.mapValuesInPlace((_, v) => v - 1)
        dead.foreach(m.remove)
        (m, debt + 1)
      }
    }

    override def merge(a: Buf, b: Buf): Buf = {
      val (ma, da) = a
      val (mb, db) = b
      mb.foreach { case (k, v) => ma(k) = ma.getOrElse(k, 0L) + v }
      if (ma.size <= capacity) (ma, da + db)
      else {
        // subtract the (capacity+1)-th largest count from everything:
        // at most `capacity` survivors, debt grows by the subtracted
        // count (the per-item underestimate this step introduces)
        val cut = ma.values.toArray.sortInPlaceWith(_ > _).apply(capacity)
        val dead = ma.iterator.filter(_._2 <= cut).map(_._1).toList
        ma.mapValuesInPlace((_, v) => v - cut)
        dead.foreach(ma.remove)
        (ma, da + db + cut)
      }
    }

    override def finish(buf: Buf): MGResult =
      MGResult(buf._1.keys.toArray.sorted, buf._2)

    override def bufferEncoder: Encoder[Buf] =
      Encoders.kryo[(scala.collection.mutable.HashMap[String, Long], Long)]
    override def outputEncoder: Encoder[MGResult] = Encoders.product[MGResult]
  }

  /** freq_items(item) → struct<items: array<string>, debt: bigint> */
  def freqItems(item: Column, capacity: Int): Column =
    udaf(new FreqItems(capacity), Encoders.STRING).apply(item)
}
