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

  test("fakeLuma samples in BYTE units (multibyte payloads included)") {
    // "ë" is 0xC3 0xAB: a char-indexed sampler would see codepoints, a
    // byte-indexed one sees the utf8 bytes. 60 bytes exactly -> stride 1 ->
    // luma = the raw byte sequence.
    val p = ("ë" * 30).getBytes("UTF-8") // 60 bytes
    val luma = Multimodal.fakeLuma(p).get
    assert(luma.length == 60)
    assert(luma.toSeq == Seq.tabulate(60)(i => if (i % 2 == 0) 0xC3 else 0xAB))
    assert(Multimodal.fakeLuma(p.take(59)).isEmpty, "under 60 bytes: no plane")
  }

  test("mm_phash_dedup: decode-seam signatures equal the pure-expression byte path, pairs included") {
    val s = spark; import s.implicits._
    // Near-identical multibyte docs (one trailing char differs) plus one
    // disjoint doc: byte-unit sampling must agree between the batched
    // decode seam and a pure-SQL byte formulation, so the banded pair sets
    // are equal by construction; the expected near-dup pair must survive.
    val base = "ünïcode payload mit ümlauten ëxtra länge füllung padding xyz"
    val docs = Seq(
      (1L, base + " ende eins"), (2L, base + " ende zwei"),
      (3L, Seq.tabulate(120)(i => if (i % 2 == 0) ' ' else '~').mkString))
      .toDF("doc_id", "text")
    val payloads = docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val phashOf: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = df =>
      df.withColumn("mean_b", expr("aggregate(luma, 0, (a, x) -> a + x) div 60"))
        .withColumn("phash", expr(
          "aggregate(zip_with(luma, sequence(0, 59), (b, i) -> " +
            "IF(b > mean_b, shiftleft(CAST(1 AS BIGINT), CAST(i AS INT)), " +
            "CAST(0 AS BIGINT))), CAST(0 AS BIGINT), (a, x) -> a + x)"))
        .select(col("doc_id"), col("phash"))
    val viaSeam = phashOf(Multimodal.decodeLumaPartitions(payloads, "payload"))
    val viaExpr = phashOf(payloads
      .filter(length(col("payload")) >= 60)
      .withColumn("stride", expr("length(payload) div 60"))
      .withColumn("luma", expr(
        "transform(sequence(0, 59), i -> CAST(conv(hex(substring(" +
          "payload, CAST(i * stride + 1 AS INT), 1)), 16, 10) AS INT))")))
    assert(viaSeam.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      viaExpr.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    // end-to-end on the same fixture: docs 1 and 2 must pair, 3 must not
    val dir = java.nio.file.Files.createTempDirectory("phash_mb").toString
    docs.select(col("doc_id"), col("text"), lit("de").as("lang"),
        lit("s0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = Multimodal.defs.find(_.name == "mm_phash_dedup").get.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"near-identical docs must pair: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"disjoint doc paired: $pairs")
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

  test("phashBandedPairs at the 2x30 TOP rung: planted dup survives; graph equals JVM reference") {
    // Round 17 (VERDICT r16 #1): the pHash family rides the simhash
    // SimShape ladder, whose 30-bit rung fires only past 2,097,152 docs.
    // The banded expansion is factored to an explicit width
    // (Multimodal.phashBandedPairs), so this exercises the production
    // expansion at bits=30 on a small corpus: a planted exact-dup payload
    // (identical pHash -> both 30-bit bands match) must pair at Hamming 0,
    // and the whole graph must equal an independent JVM banding of the
    // collected code table (2 bands of 30 bits, MaxBucket cap, Hamming<=8,
    // deduped across bands) - the DedupSpec simhash top-rung recipe
    // applied to the third ladder family.
    val s = spark; import s.implicits._
    val mk = (seed: Int) => Seq.tabulate(120)(i =>
      ('a' + (i * (seed + 3) + seed) % 26).toChar).mkString
    val base = (0 until 60).map(k => (100L + k, mk(k), "en", "s0", 120L))
    val a = mk(7)
    val docs = base ++ Seq((9001L, a, "en", "s1", 120L), (9002L, a, "en", "s1", 120L))
    val dir = java.nio.file.Files.createTempDirectory("phash_top").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Multimodal.phashBandedPairs(spark, dir, 30).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.contains((9001L, 9002L, 0L)),
      s"planted exact dup must survive 2x30 banding: ${got.toSeq.sorted.take(10)}")
    // independent JVM reference from the collected code table
    val codes = Multimodal.decodeLumaPartitions(
        graft.Tables.documents(spark, dir)
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")), "payload")
      .withColumn("mean_b", expr("aggregate(luma, 0, (a, x) -> a + x) div 60"))
      .withColumn("phash", expr(
        "aggregate(zip_with(luma, sequence(0, 59), (b, i) -> " +
          "IF(b > mean_b, shiftleft(CAST(1 AS BIGINT), CAST(i AS INT)), " +
          "CAST(0 AS BIGINT))), CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .select(col("doc_id"), col("phash"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mask30 = (1L << 30) - 1
    val ref = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    for (b <- 0 until 2) {
      codes.groupBy { case (_, c) => (c >> (30 * b)) & mask30 }
        .values.filter(_.length <= graft.dedup.Dedup.MaxBucket)
        .foreach { bucket =>
          val sorted = bucket.sortBy(identity)
          for (i <- sorted.indices; j <- (i + 1) until sorted.length) {
            val h = java.lang.Long.bitCount(sorted(i)._2 ^ sorted(j)._2).toLong
            if (h <= 8) ref += ((sorted(i)._1, sorted(j)._1, h))
          }
        }
    }
    assert(got == ref.toSet,
      s"top-rung pHash graph diverged: got ${got.size}, ref ${ref.size}")
  }

  test("phashEntropyWarning: fires below the 1/64 bucket floor, silent at healthy entropy and tiny corpora") {
    // Round 18 (VERDICT r17 #2): calibrated on the 2.56M-doc rung census —
    // degenerate stub-decode pHash sits at 28,642 buckets (0.011/doc, warns),
    // healthy simhash at ~1.0 buckets/doc (silent). The measured rung point
    // itself is the canonical degenerate case; the ±1 boundary cases pin the
    // floor arithmetic; corpora under the divisor never warn (a 50-doc spec
    // fixture with few buckets is small, not degenerate).
    assert(Multimodal.phashEntropyWarning(2560000L, 28642L).isDefined,
      "the censused degenerate rung point must warn")
    assert(Multimodal.phashEntropyWarning(2560000L, 2604413L).isEmpty,
      "healthy ~1 bucket/doc entropy must not warn")
    val div = Multimodal.PhashEntropyFloorDiv
    assert(Multimodal.phashEntropyWarning(64000L, 64000L / div - 1).isDefined,
      "one bucket under the floor must warn")
    assert(Multimodal.phashEntropyWarning(64000L, 64000L / div).isEmpty,
      "exactly at the floor must not warn")
    assert(Multimodal.phashEntropyWarning(div - 1, 0L).isEmpty,
      "corpora smaller than the divisor never warn")
  }

  test("mm_video_dedup: a stop-frame shared by a hot corpus cannot go quadratic") {
    val s = spark; import s.implicits._
    // 1200 payloads that share ONE sampled frame (a black/silence stand-in:
    // identical first 32 bytes) and are otherwise unique. The stop-frame
    // bucket exceeds MaxBucket (1000) so it must be DROPPED, and since no
    // two payloads share a second frame, the pair output must be empty —
    // the cap property the shared bucket expansion guarantees for frames.
    val black = "B" * 32
    val dir = java.nio.file.Files.createTempDirectory("video_hot").toString
    (0 until 1200).map { i =>
      val uniq = (0 until 15).map(j => f"u${i}%04d_${j}%02d".padTo(10, 'x')).mkString("")
      (i.toLong, black + uniq, "en", "s0", (32 + uniq.length).toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val n = Multimodal.defs.find(_.name == "mm_video_dedup").get.fn(spark, dir).count()
    assert(n == 0, s"stop-frame bucket above MaxBucket must be dropped, got $n pairs")
  }

  test("mm_video_dedup: a header rewrite keeps frame identity; disjoint payloads don't pair") {
    val s = spark; import s.implicits._
    // 256-byte payload = 8 frames, frames 0 and 4 sampled. Doc 2 rewrites
    // doc 1's first 32 bytes IN PLACE (same length — the re-mux/metadata
    // edit): sampled frame 0 differs, frame 4 still matches... so force a
    // second match by using a 512-byte payload (frames 0,4,8,12 sampled;
    // header edit kills frame 0, frames 4/8/12 survive).
    val base = (0 until 16).map(i => ('a' + i % 26).toChar.toString * 32).mkString
    val edited = "Z" * 32 + base.drop(32)
    val other = (0 until 16).map(i => ('A' + (i * 7) % 26).toChar.toString * 32).mkString
    val dir = java.nio.file.Files.createTempDirectory("video_docs").toString
    Seq((1L, base, "en", "s0", 512L), (2L, edited, "en", "s0", 512L),
        (3L, other, "en", "s0", 512L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Multimodal.defs.find(_.name == "mm_video_dedup").get.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val p12 = got.find(p => p._1 == 1L && p._2 == 2L)
    assert(p12.isDefined, s"header-edited copy must still pair: ${got.toSeq}")
    // 4 sampled frames, the edited header kills exactly frame 0
    assert(p12.get._3 == 3L && p12.get._4 == 750L,
      s"expected 3/4 shared frames at 750 permille, got ${p12.get}")
    assert(!got.exists(p => p._2 == 3L || p._1 == 3L),
      "frame-disjoint payload must not pair")
  }

  test("mm_modality_mix: census conserves items and bytes; shares sum to ~1e6") {
    val sf = graft.TestSpark.sf
    val mix = Multimodal.defs.find(_.name == "mm_modality_mix").get.fn(spark, sf)
    val rows = mix.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSet == Set("text", "image", "audio", "video"))
    val docs = graft.Tables.documents(spark, sf)
    assert(rows.map(_._2).sum == docs.count(), "every item counted once")
    val totalBytes = docs
      .agg(sum(expr("CAST(octet_length(encode(text, 'UTF-8')) AS BIGINT)"))).head.getLong(0)
    assert(rows.map(_._3).sum == totalBytes, "byte mass conserved")
    // integer-floor shares: sum in (1e6 - |modalities|, 1e6]
    val shareSum = rows.map(_._5).sum
    assert(shareSum > 1000000L - rows.length && shareSum <= 1000000L,
      s"micro shares must floor-sum to ~1e6, got $shareSum")
    // 6:2:1:1 doc_id sharding => text strictly dominates on any uniform fixture
    val byMod = rows.map(r => r._1 -> r._2).toMap
    assert(byMod("text") > byMod("image") && byMod("image") > byMod("audio"))
  }

  test("frame contract: fingerprints are md5-over-hex of BYTE slices (multibyte-split safe)") {
    // Round 20: the old oracles hashed 32-CHARACTER string slices and
    // relied on an all-ASCII corpus (char ≡ byte, enforced by a fixture
    // tripwire here). The contract is now byte-exact for ANY payload: the
    // frame hash is md5 of the UPPERCASE HEX rendering of the 32-byte
    // frame (DuckDB 1.0 cannot slice or md5 a BLOB; hex is ASCII in both
    // engines). This pins the hard case the old contract could not
    // express: a multibyte char STRADDLING the frame boundary — byte
    // frame 0 ends mid-emoji, which no char slice can produce.
    val text = "a" * 31 + "😀" + " tail text long enough for a second frame " + "b" * 80
    val bytes = text.getBytes("UTF-8")
    def expFp(frame: Array[Byte]): String = {
      val hex = frame.map(b => f"$b%02X").mkString
      java.security.MessageDigest.getInstance("MD5")
        .digest(hex.getBytes("US-ASCII")).map(b => f"$b%02x").mkString
    }
    import spark.implicits._
    val fps = graft.mm.Multimodal.withFrameFps(
        Seq((1L, text)).toDF("doc_id", "text"))
      .select(col("fps")).collect()(0).getSeq[String](0)
    assert(fps.head == expFp(bytes.slice(0, 32)),
      "frame 0 must hash the exact BYTE slice (31 ASCII bytes + the first " +
        "emoji byte), rendered as uppercase hex")
    assert(fps.contains(expFp(bytes.slice(128, 160))),
      "sampled frame 4 must hash bytes 128..159 byte-exactly")
  }
}
