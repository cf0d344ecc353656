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
}
