package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The Misra-Gries guarantee, exercised where sketches break: adversarial
  * orderings and arbitrary merge trees. Any item with true count > n/(k+1)
  * must survive with a positive lower-bound count, whatever the partitioning. */
class FreqSketchSpec extends AnyFunSuite {

  private def runSketch(k: Int, parts: Seq[Seq[String]]): Seq[FreqSketch.Counted] = {
    val agg = FreqSketch.misraGries(k)
    val bufs = parts.map(_.foldLeft(agg.zero)(agg.reduce))
    agg.finish(bufs.foldLeft(agg.zero)(agg.merge))
  }

  test("reported counts are lower bounds within n/(k+1), single partition") {
    val k = 4
    val stream = Seq.fill(40)("hot") ++ (1 to 60).map(i => s"c$i")
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val out = runSketch(k, Seq(stream))
    assert(out.size <= k)
    out.foreach { e =>
      assert(e.cnt <= exact(e.item), s"${e.item}: over-counted")
      assert(exact(e.item) - e.cnt <= stream.size / (k + 1), s"${e.item}: bound broken")
    }
    assert(out.exists(_.item == "hot"), "40/100 > 100/5: hot must survive")
  }

  test("heavy hitters survive ANY ordering and merge tree") {
    val k = 4
    val base = Seq.fill(50)("hot1") ++ Seq.fill(35)("hot2") ++
      (1 to 75).map(i => s"c$i") // n=160, n/(k+1)=32: hot1, hot2 guaranteed
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 10) {
      val stream = rnd.shuffle(base)
      val nParts = 1 + rnd.nextInt(6)
      val parts = stream.grouped(math.max(1, stream.size / nParts)).toSeq
      val out = runSketch(k, rnd.shuffle(parts))
      Seq("hot1", "hot2").foreach(h =>
        assert(out.exists(e => e.item == h && e.cnt > 0),
          s"trial $trial ($nParts parts): $h evicted — guarantee broken"))
    }
  }

  test("merge matches the subtract-(k+1)-st rule and never over-counts") {
    val agg = FreqSketch.misraGries(2)
    val a = FreqSketch.MgBuf(Vector(
      FreqSketch.Counted("x", 10), FreqSketch.Counted("y", 6)))
    val b = FreqSketch.MgBuf(Vector(
      FreqSketch.Counted("x", 3), FreqSketch.Counted("z", 5)))
    // summed: x=13, y=6, z=5 -> 3rd largest = 5 -> keep x=8, y=1
    assert(agg.merge(a, b).entries == Vector(
      FreqSketch.Counted("x", 8), FreqSketch.Counted("y", 1)))
  }

  test("null items are skipped, not buffered (typed Aggregators see nulls un-filtered)") {
    // A null entering the buffer NPE'd in the count-tie String comparison
    // of merge/finish's sortBy; nulls now skip, matching the built-in
    // aggregate convention.
    val agg = FreqSketch.misraGries(2)
    val b = Seq("a", null, "a", null, "b").foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(b, b)) == Vector(
      FreqSketch.Counted("a", 4), FreqSketch.Counted("b", 2)))
  }
}
