package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed SimHash vote aggregator: input = (doc_id, token xxhash64), buffer =
  * 64 vote counters, output = the 64-bit signature (bit i set iff counter i
  * > 0 — the same sign rule as Dedup.simhash64's declarative form).
  *
  * Map-side partial aggregation folds every token on its source partition
  * into the 64-int buffer, so the shuffle carries one 256-byte buffer per
  * (partition, doc) instead of 64 vote rows per token — the difference
  * between O(tokens·64) and O(docs·64) shuffled rows at 100 TB.
  */
class SimhashAgg extends Aggregator[(Long, Long), Array[Int], Long] {

  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(b: Array[Int], t: (Long, Long)): Array[Int] = {
    val h = t._2
    var i = 0
    while (i < 64) {
      b(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
      i += 1
    }
    b
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Int]): Long = {
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (b(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
