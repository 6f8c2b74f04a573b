package graft.llm

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact bounded top-k as a typed [[Aggregator]] — the
  * map-side-combined spelling of "top k rows per group".
  *
  * Why not a window: `row_number() OVER (PARTITION BY g ORDER BY s)`
  * shuffles EVERY row of every group and sorts each group in full
  * before discarding all but k — at 100 TB that is a corpus-sized
  * exchange and sort for a k-sized answer. This aggregator's state
  * is never more than k (score, id) pairs, it combines on the map
  * side like any aggregate (partial top-k per partition, merged at
  * reduce), so the shuffle carries |groups|·k rows. Spark has no
  * built-in bounded-top-k aggregate; this is the idiomatic
  * `Aggregator` + `functions.udaf` extension point.
  *
  * Ordering is TOTAL and deterministic — score descending, id
  * ascending on ties — which is what makes the result (and the
  * DuckDB oracle's row_number replay) exact rather than
  * tie-arbitrary. The buffer is kept sorted; insert into a full
  * buffer first checks against the current minimum, so the common
  * below-threshold row costs one comparison and no allocation.
  * Merge is an ordered merge of two ≤k lists: associative and
  * commutative (TopKAggProps pins both against the sort-take
  * reference). */
class TopKAgg(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k > 0, "k must be positive")

  /** score desc, id asc — (a before b) as a strict total order. */
  private def before(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Long, Long)] = Vector.empty

  override def reduce(buf: Seq[(Long, Long)],
      in: (Long, Long)): Seq[(Long, Long)] = {
    if (buf.size >= k && !before(in, buf.last)) buf
    else {
      val i = buf.indexWhere(e => before(in, e)) match {
        case -1 => buf.size
        case n => n
      }
      val grown = (buf.take(i) :+ in) ++ buf.drop(i)
      if (grown.size > k) grown.take(k) else grown
    }
  }

  override def merge(a: Seq[(Long, Long)],
      b: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val out = Vector.newBuilder[(Long, Long)]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.size || j < b.size)) {
      val takeA = j >= b.size || (i < a.size && before(a(i), b(j)))
      if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Long, Long)]] = bufferEncoder
}
