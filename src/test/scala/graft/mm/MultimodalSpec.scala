package graft.mm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("decodePartitions: batched partition-local decode preserves rows and matches the UDF path") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val viaPartitions = Multimodal.decodePartitions(docs, "payload")
    val viaQuery = Multimodal.defs.find(_.name == "mm_decode_stub").get.fn(spark, sf)
    assert(viaPartitions.count() == docs.count())
    val joined = viaPartitions.alias("p")
      .join(viaQuery.alias("q"), "doc_id")
      .filter(col("p.width") =!= col("q.width") || col("p.height") =!= col("q.height"))
    assert(joined.count() == 0)
  }

  test("decode stub is deterministic on byte payloads") {
    val m1 = Multimodal.fakeDecode("hello world".getBytes("UTF-8"))
    val m2 = Multimodal.fakeDecode("hello world".getBytes("UTF-8"))
    assert(m1 == m2)
    assert(m1.width >= 64 && m1.width < 128 && m1.height >= 64 && m1.height < 128)
  }

  test("mm_phash_dedup: identical payloads pair at Hamming 0; disjoint content is absent") {
    val s = spark; import s.implicits._
    // docs 1 and 2 share identical bytes -> phash equal -> hamming 0.
    // doc 3 alternates two very different byte classes -> different code.
    val a = Seq.tabulate(120)(i => ('a' + i % 26).toChar).mkString
    val c = Seq.tabulate(120)(i => if (i % 2 == 0) ' ' else '~').mkString
    val dir = java.nio.file.Files.createTempDirectory("phash_docs").toString
    Seq((1L, a, "en", "s0", 120L), (2L, a, "en", "s0", 120L), (3L, c, "en", "s0", 120L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Multimodal.defs.find(_.name == "mm_phash_dedup").get.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.contains((1L, 2L, 0L)), s"identical payloads must pair at distance 0: ${got.toSeq}")
    got.foreach { case (x, y, h) =>
      assert(x < y && h >= 0 && h <= 8, s"bad pair ($x,$y,$h)")
    }
  }
}
