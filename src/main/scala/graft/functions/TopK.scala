package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k by (score desc, id asc) as a typed `Aggregator`
  * (SURVEY.md §2.8): the scalable alternative to window `row_number` top-k.
  *
  * A window top-k sorts EVERY candidate row inside each partition of the
  * window; this aggregator keeps at most k entries per partial buffer, so
  * the shuffle carries O(groups × k) instead of O(candidates), with map-side
  * combine for free. For k=5 over millions of candidates per query vector
  * that is the difference between shuffling gigabytes and kilobytes.
  *
  * Buffers are small sorted vectors (k ≤ ~100 intended); insertion keeps
  * them ordered so `merge` is a bounded merge, and ties resolve by id for
  * deterministic, oracle-reproducible output.
  */
object TopK {

  final case class Scored(id: Long, score: Double)
  final case class Buf(entries: Seq[Scored])

  private def lt(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  final class TopKAgg(k: Int) extends Aggregator[Scored, Buf, Seq[Scored]] {
    require(k >= 1, s"topK needs k >= 1, got $k")

    override def zero: Buf = Buf(Vector.empty)

    // NaN scores never enter the buffer: `lt` is not a total order under
    // NaN (every comparison is false), so one NaN-scored entry reaching
    // `entries.last` would make the full-buffer guard reject ALL later
    // candidates — an arrival-order-dependent wrong top-k. cosine_sim
    // returns NaN exactly for zero-norm vectors, which have no meaningful
    // similarity rank; dropping them matches the window-oracle convention
    // of ranking only comparable scores.
    override def reduce(b: Buf, in: Scored): Buf =
      if (java.lang.Double.isNaN(in.score)) b else insert(b, in)

    override def merge(a: Buf, b: Buf): Buf =
      b.entries.foldLeft(a)(insert)

    private def insert(b: Buf, in: Scored): Buf = {
      if (b.entries.size == k && !lt(in, b.entries.last)) b
      else {
        val (pre, post) = b.entries.span(e => lt(e, in))
        Buf((pre :+ in) ++ post.take(k - pre.size - 1))
      }
    }

    override def finish(b: Buf): Seq[Scored] = b.entries

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  def topK(k: Int): TopKAgg = new TopKAgg(k)
}
