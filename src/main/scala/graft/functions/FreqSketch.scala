package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters summary as a typed mergeable `Aggregator` —
  * the frequent-items sketch of a training-data pipeline (hot tokens /
  * domains / fingerprints) in the shape that scales: each partial buffer
  * holds at most `k` counters, partials combine map-side, and the shuffle
  * carries O(partitions × k) counters instead of O(distinct items) rows.
  * The exact groupBy-count alternative shuffles the full item domain — at
  * 100 TB that is the vocabulary of the web, while this is `k` longs per
  * core.
  *
  * Semantics (classic MG + Agarwal et al.'s mergeable-summaries rule):
  *  - reduce: increment the item's counter; if the item is new and all `k`
  *    counters are taken, decrement every counter by 1 and drop zeros (the
  *    arriving item's own count absorbs the same decrement, i.e. it is NOT
  *    inserted).
  *  - merge: sum counters by item; if more than `k` survive, subtract the
  *    (k+1)-st largest count from every counter, keep the positive top-k
  *    (ties broken by item for determinism of the KEPT SET given the same
  *    merge tree).
  *
  * Guarantee (the contract `an_heavy_hitters` verifies): reported counts
  * are lower bounds under-counting by at most n/(k+1) in total per stream
  * prefix, so ANY item with true count > n/(k+1) is present in the final
  * summary — regardless of arrival order, partitioning, or merge tree.
  * Which TAIL items pad the remaining counters IS order-dependent (like
  * any MG implementation), which is why consumers threshold on the
  * guarantee, never on raw membership. */
object FreqSketch {

  final case class Counted(item: String, cnt: Long)
  final case class MgBuf(entries: Seq[Counted])

  final class MisraGriesAgg(k: Int) extends Aggregator[String, MgBuf, Seq[Counted]] {
    require(k >= 1)

    override def zero: MgBuf = MgBuf(Vector.empty)

    override def reduce(b: MgBuf, item: String): MgBuf = {
      // Typed Aggregators see nulls un-filtered (unlike built-in aggs,
      // which skip them): a null item would enter the buffer and NPE in
      // the count-tie String comparison of merge/finish's sortBy. Skip
      // nulls — the built-in-aggregate convention.
      if (item == null) return b
      val i = b.entries.indexWhere(_.item == item)
      if (i >= 0)
        MgBuf(b.entries.updated(i, Counted(item, b.entries(i).cnt + 1L)))
      else if (b.entries.size < k)
        MgBuf(b.entries :+ Counted(item, 1L))
      else
        MgBuf(b.entries.flatMap(e =>
          if (e.cnt > 1L) Some(Counted(e.item, e.cnt - 1L)) else None))
    }

    override def merge(a: MgBuf, b: MgBuf): MgBuf = {
      val summed = (a.entries ++ b.entries)
        .groupBy(_.item).view
        .mapValues(_.map(_.cnt).sum).toSeq
        .map { case (it, c) => Counted(it, c) }
      if (summed.size <= k) MgBuf(summed.sortBy(e => (-e.cnt, e.item)))
      else {
        val sorted = summed.sortBy(e => (-e.cnt, e.item))
        val sub = sorted(k).cnt
        MgBuf(sorted.take(k)
          .flatMap(e =>
            if (e.cnt > sub) Some(Counted(e.item, e.cnt - sub)) else None))
      }
    }

    override def finish(b: MgBuf): Seq[Counted] =
      b.entries.sortBy(e => (-e.cnt, e.item))

    override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
    override def outputEncoder: Encoder[Seq[Counted]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  def misraGries(k: Int): MisraGriesAgg = new MisraGriesAgg(k)
}
