package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (query, candidate) scored pair. */
case class ScoredPair(query_id: Long, neighbor_id: Long, score: Double)

/** Bounded top-k buffer: parallel primitive arrays (native encoder, no
  * kryo), kept sorted by (score DESC, id ASC), length ≤ k. */
case class TopKBuf(scores: Array[Double], ids: Array[Long])

/** Typed top-k-by-score aggregator (SURVEY.md §7.3): per group keeps at
  * most k (score, id) pairs; map-side partial aggregation ships O(k) per
  * partition per group instead of sorting the whole group. The scale path
  * for "top-k neighbors per query" — shuffle volume O(groups·k),
  * independent of corpus size. Ordering ties break by lower id, matching
  * the declared ORDER BY score DESC, neighbor_id ASC.
  */
class TopKByScore(k: Int) extends Aggregator[ScoredPair, TopKBuf, TopKBuf] {

  private def trim(pairs: Seq[(Double, Long)]): TopKBuf = {
    val best = pairs.sortBy { case (s, id) => (-s, id) }.take(k)
    TopKBuf(best.map(_._1).toArray, best.map(_._2).toArray)
  }

  override def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)
  override def reduce(b: TopKBuf, x: ScoredPair): TopKBuf =
    trim(b.scores.zip(b.ids).toSeq :+ (x.score, x.neighbor_id))
  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    trim(a.scores.zip(a.ids).toSeq ++ b.scores.zip(b.ids).toSeq)
  override def finish(b: TopKBuf): TopKBuf = b
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}

object TopKByScore {
  /** Collapse a DataFrame of (query_id, neighbor_id, score) rows to the
    * top-k per query with ranks — aggregation instead of a window sort. */
  def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored.as[ScoredPair]
      .groupByKey(_.query_id)
      .agg(new TopKByScore(k).toColumn.name("topk"))
      .flatMap { case (qid, buf) =>
        buf.scores.zip(buf.ids).zipWithIndex.map { case ((s, id), i) =>
          (qid, id, s, i + 1)
        }
      }
      .toDF("query_id", "neighbor_id", "score", "rk")
  }
}
