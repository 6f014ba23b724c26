package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The image-modality fingerprint family: multimodal_phash (aHash of
  * the decoded pixel grid) and dedup_image (banded Hamming near-dup).
  * The known-vector test pins the bit layout; the replay test proves
  * the banded LSH query equals a driver-side brute-force replay of the
  * same spec (banding, cap, Hamming verify) on the real fixture. */
class MultimodalSpec extends AnyFunSuite with SparkFixture {

  test("multimodal_phash bit layout on a hand-computable image") {
    import spark.implicits._
    // 32×'a' (97) then 32×'b' (98): Σ = (97+98)·32 = 6240.
    // 97·64 = 6208 < 6240 → bits 0..31 clear; 98·64 = 6272 > 6240 →
    // bits 32..63 set ⇒ lo = 0, hi = 0xFFFFFFFF.
    val dir = java.nio.file.Files.createTempDirectory("graft_phash").toString
    Seq((1L, "a" * 32 + "b" * 32), (2L, "short"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = operators.MultimodalQueries.multimodalPhash(spark, dir).collect()
    assert(rows.length == 1) // the <64-byte doc is filtered
    assert(rows(0).getLong(0) == 1L)
    assert(rows(0).getLong(1) == 0xFFFFFFFFL, s"hi=${rows(0).getLong(1)}")
    assert(rows(0).getLong(2) == 0L, s"lo=${rows(0).getLong(2)}")
  }

  test("dedup_image equals a driver-side brute-force replay of the banded spec") {
    val ph = SparkEntry.queries("multimodal_phash")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // replay: four 16-bit bands, bucket-population cap 2..64, pairs
    // sharing a band, exact Hamming <= 8
    val bands = ph.flatMap { case (id, hi, lo) =>
      Seq((0, lo & 0xffffL), (1, (lo >>> 16) & 0xffffL),
        (2, hi & 0xffffL), (3, (hi >>> 16) & 0xffffL))
        .map { case (bi, bv) => (bi, bv, id, hi, lo) }
    }
    val byBucket = bands.groupBy(b => (b._1, b._2))
      .filter { case (_, ms) => ms.length >= 2 && ms.length <= 64 }
    val want = byBucket.values.flatMap { ms =>
      val s = ms.toSeq
      for {
        a <- s; b <- s if a._3 < b._3
        h = java.lang.Long.bitCount(a._5 ^ b._5) +
          java.lang.Long.bitCount(a._4 ^ b._4)
        if h <= 8
      } yield (a._3, b._3, h.toLong)
    }.toSet
    val got = SparkEntry.queries("dedup_image")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"got=${got.size} want=${want.size}")
    assert(got.nonEmpty, "fixture should produce at least one near-dup pair")
  }

  test("a 1-bit perturbed image is found by dedup_image banding") {
    import spark.implicits._
    // two images differing in ONE pixel around the mean boundary →
    // Hamming 1; with <= 3 flipped bits one of the four 16-bit bands
    // is always intact, so banding can never miss such a pair
    val base = ("x" * 16) + ("a" * 24) + ("z" * 24) // mixed values
    val pert = ("x" * 16) + ("a" * 23) + "z" + ("z" * 24)
    val dir = java.nio.file.Files.createTempDirectory("graft_dimg").toString
    Seq((1L, base), (2L, pert)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = operators.MultimodalQueries.dedupImage(spark, dir).collect()
    assert(pairs.length == 1, pairs.mkString(","))
    assert(pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 2L)
    assert(pairs(0).getLong(2) <= 8)
  }
}
