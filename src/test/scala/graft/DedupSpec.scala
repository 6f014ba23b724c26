package graft

import graft.operators.DedupQueries
import org.scalatest.funsuite.AnyFunSuite

/** Self-check invariants for the dedup operators that have no SQL
  * oracle (SURVEY §2B "self" rule): determinism across runs, exact
  * duplicates always pairing, sketch equality for equal text.
  */
class DedupSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown fox jumps over the lazy dog today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat today"), // near dup
    (4L, "completely different words about spark and scala engines"),
    (5L, "another unrelated document mentioning parquet shuffle joins")
  ).toDF("doc_id", "text")

  test("minhash: exact duplicates always become a candidate pair") {
    val pairs = DedupQueries.minhashPairs(docs)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    // dissimilar docs don't pair
    assert(!pairs.contains((4L, 5L)))
  }

  test("minhash: pair set is deterministic across runs") {
    val a = DedupQueries.minhashPairs(docs).as[(Long, Long)].collect().toSeq
    val b = DedupQueries.minhashPairs(docs).as[(Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("simhash: equal texts get equal sketches; near-dups are Hamming-close") {
    val sk = DedupQueries.simhashSketch(docs).as[(Long, Long)].collect().toMap
    assert(sk(1L) == sk(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sk(1L), sk(3L)) < hamming(sk(1L), sk(4L)),
      s"near-dup ${hamming(sk(1L), sk(3L))} vs unrelated ${hamming(sk(1L), sk(4L))}")
  }

  test("exact dedup is idempotent on the documents table") {
    val once = SparkEntry.queries("dedup_exact")(spark, sf)
    // survivors are distinct by hash ⇒ re-dedup of survivors is identity
    assert(once.count() == once.select("text_sha").distinct().count())
  }

  test("jaccard is within (0,1] and symmetric by construction (a<b ordering)") {
    val rows = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf).collect()
    rows.foreach { r =>
      val j = r.getDouble(2)
      assert(j > 0.0 && j <= 1.0)
      assert(r.getLong(0) < r.getLong(1))
    }
  }
}
