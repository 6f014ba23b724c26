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

  test("MinHashSig (codegen) is bit-identical to the shared kernel on real docs") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val rows = graft.Tables.t(spark, sf, "documents").limit(50)
      .select(col("text"),
        graft.functions.Native.minhashSig(split(col("text"), " "),
          DedupQueries.MinhashPerms).as("sig"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // Spark's split(_, " ") keeps trailing empties (limit -1)
      val words = r.getString(0).split(" ", -1)
        .map(w => UTF8String.fromString(w): Any)
      val expected = graft.functions.MinHashKernel
        .sig(new GenericArrayData(words), DedupQueries.MinhashPerms)
      if (expected == null) assert(r.isNullAt(1))
      else assert(r.getSeq[Long](1) == expected.toSeq)
    }
  }

  test("simhash pairs: banded equi-join equals brute-force Hamming<=3 pairs") {
    // pigeonhole completeness: d<=3 over 4 disjoint 16-bit bands means
    // >=1 band agrees exactly, so the candidate join loses nothing
    val table = graft.Tables.t(spark, sf, "documents")
      .selectExpr("doc_id", "text")
    val sk = DedupQueries.simhashSketch(table).as[(Long, Long)].collect()
    val brute = (for {
      (ida, sa) <- sk; (idb, sb) <- sk
      if ida < idb && java.lang.Long.bitCount(sa ^ sb) <= DedupQueries.SimhashMaxHamming
    } yield (ida, idb)).toSet
    val joined = DedupQueries.simhashPairs(DedupQueries.simhashSketch(table))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(joined == brute)
  }

  test("simhash pairs: sketch pipeline is derived exactly once in the plan") {
    // the r6 formulation self-joined the band frame, re-deriving the
    // tokenize→explode→48-vote sketch for both sides; the bucket
    // collect_list emit must plan ONE md5 chain and ONE vote aggregate
    val plan = SparkEntry.queries("dedup_simhash_pairs")(spark, sf)
      .queryExecution.executedPlan.toString
    val md5Count = "md5\\(".r.findAllIn(plan).length
    assert(md5Count == 1, s"sketch derived $md5Count times:\n$plan")
    assert(!plan.contains("Join"), s"pair emit should not plan a join:\n$plan")
  }

  test("simhash pairs: exact duplicates pair at Hamming 0; deterministic") {
    val pairs = DedupQueries.simhashPairs(DedupQueries.simhashSketch(docs))
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
    val again = DedupQueries.simhashPairs(DedupQueries.simhashSketch(docs))
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs == again)
  }

  /** Deterministic 64-dim synthetic embeddings: a planted exact dup
    * (20/21) and a planted near-dup (20/22, one coordinate nudged). */
  private lazy val synthVecs = {
    def base(seed: Int): Array[Float] =
      Array.tabulate(64)(i => (((seed * 64 + i) * 2654435761L % 199) - 99) / 99.0f)
    val b = base(7)
    val near = b.clone(); near(40) = near(40) + 0.01f
    (Seq(20L -> b, 21L -> b.clone(), 22L -> near) ++
      (0 until 12).map(s => (s.toLong, base(s)))).toDF("vec_id", "embedding")
  }

  test("embedding pairs: exact dups and near-dups pair; result is a subset of all-pairs truth") {
    import org.apache.spark.sql.functions._
    val got = DedupQueries.embeddingPairs(synthVecs)
      .as[(Long, Long, Double)].collect()
    val gotPairs = got.map(p => (p._1, p._2)).toSet
    // identical vectors share every bucket — always candidates — and cos=1
    assert(gotPairs.contains((20L, 21L)))
    assert(gotPairs.contains((20L, 22L)), "near-dup must share >=1 of 8 sign buckets")
    // every emitted pair is a true >=0.35 pair (verify stage is exact)
    val e = synthVecs.select(col("vec_id"),
      sqrt(graft.functions.Native.dotF32(col("embedding"), col("embedding"))).as("nrm"),
      col("embedding"))
    val truth = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        Fp.r4(graft.functions.Native.dotF32(col("a.embedding"), col("b.embedding"))
          / (col("a.nrm") * col("b.nrm"))).as("cos"))
      .filter(col("cos") >= 0.35)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(gotPairs.subsetOf(truth))
  }

  test("embedding pairs: candidate stage is an equi-join, never a nested loop") {
    val plan = DedupQueries.embeddingPairs(synthVecs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("components: chains collapse transitively, singletons label themselves") {
    import org.apache.spark.sql.functions._
    val nodes = (0L to 9L).toDF("doc_id")
    // chain 1-2-3 (1 and 3 never directly paired), pair 5-7, rest singletons
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 7L)).toDF("doc_a", "doc_b")
    val got = DedupQueries.components(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L,
      s"chain must collapse to min id: $got")
    assert(got(5L) == 5L && got(7L) == 5L)
    Seq(0L, 4L, 6L, 8L, 9L).foreach(d => assert(got(d) == d))
    // deterministic
    val again = DedupQueries.components(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got == again)
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

  test("substring pairs equal a brute-force driver-side replay") {
    import graft.operators.DedupQueries.{SubstrLen, SubstrStride, SubstrMaxDf}
    val docsArr = graft.Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // replay: stride windows -> distinct per doc -> df cap -> pairs
    val byWindow = scala.collection.mutable.Map.empty[String, Set[Long]]
    for ((id, text) <- docsArr if text.length >= SubstrLen) {
      val wnds = (0 to text.length - SubstrLen by SubstrStride)
        .map(i => text.substring(i, i + SubstrLen)).toSet
      wnds.foreach(w => byWindow(w) = byWindow.getOrElse(w, Set.empty) + id)
    }
    val expect = byWindow.values
      .filter(ds => ds.size >= 2 && ds.size <= SubstrMaxDf)
      .flatMap(ds => ds.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (p, hits) => (p._1, p._2, hits.size.toLong) }
      .toSet
    val got = SparkEntry.queries("dedup_substring")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    got.foreach { case (a, b, n) => assert(a < b && n >= 1) }
    assert(got == expect)
  }

  test("the gram-df cap actually fires: a stop-gram shared by >GramDfCap docs is dropped") {
    import spark.implicits._
    import graft.operators.DedupQueries
    // 12 docs all containing one boilerplate trigram ("x y z"), each
    // with one unique trigram tail. df("x y z") = 12 > cap=10 → the
    // stop-gram must vanish from the capped universe; the 12 unique
    // tail grams (df=1) must survive. Without the cap this corpus
    // would candidate-join 12·11/2 = 66 pairs off one gram.
    val docs = (1 to 12).map(i => (i.toLong, s"x y z u$i v$i w$i")).toDF("doc_id", "text")
    val capped = DedupQueries.dfCappedGrams(docs)
    val perDoc = capped.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    // each 6-word doc shingles to 4 trigrams, 1 of which ("x y z") is
    // capped away; "y z u_i" / "z u_i v_i" / "u_i v_i w_i" are unique
    // per doc (df=1) and survive
    assert(perDoc.size == 12 && perDoc.values.forall(_ == 3L),
      s"expected 3 surviving grams per doc, got $perDoc")
    // and no surviving gram pairs two docs: the capped candidate join
    // is EMPTY where the uncapped one had 66 candidate pairs
    val pairs = capped.as("a").join(capped.as("b"),
      $"a.gram" === $"b.gram" && $"a.doc_id" < $"b.doc_id").count()
    assert(pairs == 0L, s"stop-gram survived the cap: $pairs candidate pairs")
  }

  test("dedup_containment equals the driver-side shingle replay and catches the asymmetric case") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.t(spark, sf, "documents")
      .filter(col("doc_id") < 300).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def grams(t: String): Set[String] = {
      val ws = t.split(" ")
      // <3-word docs shingle to nothing (matching the generator's
      // range(1, greatest(len-1, 1)) — empty), so they never pair
      (0 to ws.length - 3).map(i => s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}").toSet
    }
    val gsRaw = docs.map { case (id, t) => id -> grams(t) }.toMap
    // replay the df cap: grams in more than GramDfCap docs are dropped
    // from the universe before sizes AND intersections (r8)
    val df = gsRaw.values.toSeq.flatten
      .groupBy(identity).map { case (g, xs) => g -> xs.size }
    val gs = gsRaw.map { case (id, set) =>
      id -> set.filter(g => df(g) <= graft.operators.DedupQueries.GramDfCap)
    }
    val ids = docs.map(_._1).sorted
    val expect = (for {
      a <- ids; b <- ids if a < b && gs(a).nonEmpty && gs(b).nonEmpty
      ni = (gs(a) & gs(b)).size if ni > 0
      cont = 10000L * ni / math.min(gs(a).size, gs(b).size) if cont >= 2500
    } yield (a, b, gs(a).size.toLong, gs(b).size.toLong, ni.toLong, cont,
      if (gs(a).size <= gs(b).size) "a_in_b" else "b_in_a")).toSet
    val got = SparkEntry.queries("dedup_containment")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6))).toSet
    assert(got == expect)
    assert(got.exists(_._6 == 10000L), "no full-containment pair found")
  }

  test("pipeline_entity_resolution equals a sequential union-find over brute-force matches") {
    import org.apache.spark.sql.functions.col
    def ed(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => i + j)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val part = graft.Tables.t(spark, sf, "part")
      .select(col("p_partkey"), col("p_name")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val cleanCnt = part.flatMap(_._2.split(" "))
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val dirtyCnt = part.filter(_._1 % 7 == 0).map { case (k, n) =>
      val fw = n.split(" ").head
      val i = ((k / 7) % fw.length).toInt
      fw.substring(0, i) + fw.substring(i + 1)
    }.groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val cnt = (cleanCnt.keySet ++ dirtyCnt.keySet).map(w =>
      w -> (cleanCnt.getOrElse(w, 0L) + dirtyCnt.getOrElse(w, 0L))).toMap
    // sequential union-find over the brute-force ed<=1 match graph
    val parent = scala.collection.mutable.Map(cnt.keySet.map(w => w -> w).toSeq: _*)
    def find(w: String): String =
      if (parent(w) == w) w else { val r = find(parent(w)); parent(w) = r; r }
    val vs = cnt.keySet.toSeq.sorted
    for (a <- vs; b <- vs if a < b && ed(a, b) <= 1)
      { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(rb) = ra }
    val expect = cnt.keySet.groupBy(find).map { case (_, ws) =>
      val m = ws.toSeq.sorted
      (m.head, ws.size.toLong, ws.toSeq.map(cnt).sum, m.mkString(","))
    }.toSet
    val got = SparkEntry.queries("pipeline_entity_resolution")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got == expect)
    // the injected typos genuinely merge: some cluster has >= 2 words
    assert(got.exists(_._2 >= 2), "no multi-word cluster formed")
  }
}
