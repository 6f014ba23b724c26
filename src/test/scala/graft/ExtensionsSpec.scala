package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom expressions as SQL functions: injected once via
  * `spark.sql.extensions=graft.functions.GraftExtensions`
  * (SparkFixture) and once via the live-session registry path —
  * both must agree bit-for-bit with the Column API.
  */
class ExtensionsSpec extends AnyFunSuite with SparkFixture {

  test("dot_f32 is callable from SQL and matches the Column API bit-for-bit") {
    Tables.t(spark, sf, "embeddings").limit(50)
      .createOrReplaceTempView("ext_emb")
    val viaSql = spark.sql(
      "SELECT vec_id, dot_f32(embedding, embedding) AS d FROM ext_emb ORDER BY vec_id")
      .collect()
    val viaCol = Tables.t(spark, sf, "embeddings").limit(50)
      .select(col("vec_id"),
        graft.functions.Native.dotF32(col("embedding"), col("embedding")).as("d"))
      .orderBy("vec_id")
      .collect()
    assert(viaSql.nonEmpty)
    viaSql.zip(viaCol).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(java.lang.Double.doubleToLongBits(a.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(b.getDouble(1)))
    }
  }

  test("dot_i64 matches the zip_with/aggregate fold bit-for-bit") {
    val q = transform(col("embedding"),
      x => floor(x.cast("double") * lit(1024.0) + lit(0.5)).cast("long"))
    val plane = array((0 until 64).map(i => lit((i * 40503L % 101) - 50)): _*)
    val viaExpr = Tables.t(spark, sf, "embeddings").limit(100)
      .select(col("vec_id"),
        graft.functions.Native.dotI64(q, plane).as("d"))
      .orderBy("vec_id").collect()
    val viaFold = Tables.t(spark, sf, "embeddings").limit(100)
      .select(col("vec_id"),
        aggregate(zip_with(q, plane, (a, b) => a * b),
          lit(0L), (acc, v) => acc + v).as("d"))
      .orderBy("vec_id").collect()
    assert(viaExpr.nonEmpty)
    viaExpr.zip(viaFold).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1))
    }
  }

  test("minhash_sig is callable from SQL and matches the Column API") {
    Tables.t(spark, sf, "documents").limit(30)
      .createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, minhash_sig(split(text, ' '), 16) AS sig FROM ext_docs ORDER BY doc_id")
      .collect()
    val viaCol = Tables.t(spark, sf, "documents").limit(30)
      .select(col("doc_id"),
        graft.functions.Native.minhashSig(split(col("text"), " "), 16).as("sig"))
      .orderBy("doc_id")
      .collect()
    assert(viaSql.nonEmpty)
    viaSql.zip(viaCol).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(a.isNullAt(1) == b.isNullAt(1))
      if (!a.isNullAt(1)) assert(a.getSeq[Long](1) == b.getSeq[Long](1))
    }
  }

  test("registerSql injects into a session whose registry lacks the functions") {
    // newSession INHERITS the fixture's extensions, so drop the
    // functions from its registry first and prove SQL then fails —
    // otherwise this test would pass with an empty registerSql
    val fresh = spark.newSession()
    graft.functions.GraftFunctions.registrations.foreach { case (ident, _, _) =>
      fresh.sessionState.functionRegistry.dropFunction(ident)
    }
    assertThrows[Exception] {
      fresh.sql("SELECT dot_f32(array(1.0f), array(1.0f))").collect()
    }
    graft.functions.GraftFunctions.registerSql(fresh)
    Tables.t(fresh, sf, "embeddings").limit(5)
      .createOrReplaceTempView("ext_emb_fresh")
    val rows = fresh.sql(
      "SELECT dot_f32(embedding, embedding) AS d FROM ext_emb_fresh").collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(r.getDouble(0) > 0.0))
  }

  test("winnow_stats and repetition_stats are callable from SQL and match the Column API") {
    import org.apache.spark.sql.functions._
    Tables.t(spark, sf, "documents").filter(col("doc_id") < 20)
      .createOrReplaceTempView("ext_docs_kernels")
    val sqlRows = spark.sql(
      """SELECT doc_id, winnow_stats(text, 8, 4) AS w,
        |  repetition_stats(text) AS r
        |FROM ext_docs_kernels ORDER BY doc_id""".stripMargin)
      .selectExpr("doc_id", "w.n_fp", "w.fp_sum", "r.n_words", "r.dup3_pos")
      .collect()
    val colRows = Tables.t(spark, sf, "documents").filter(col("doc_id") < 20)
      .select(col("doc_id"),
        graft.functions.Native.winnowStats(col("text"), 8, 4).as("w"),
        graft.functions.Native.repetitionStats(col("text")).as("r"))
      .selectExpr("doc_id", "w.n_fp", "w.fp_sum", "r.n_words", "r.dup3_pos")
      .orderBy("doc_id")
      .collect()
    assert(sqlRows.sameElements(colRows))
  }

  test("entropy_stats is callable from SQL and matches the Column API") {
    import org.apache.spark.sql.functions._
    Tables.t(spark, sf, "documents").filter(col("doc_id") < 20)
      .createOrReplaceTempView("ext_docs_entropy")
    val sqlRows = spark.sql(
      """SELECT doc_id, entropy_stats(text) AS e
        |FROM ext_docs_entropy ORDER BY doc_id""".stripMargin)
      .selectExpr("doc_id", "e.n_chars", "e.distinct_chars",
        "e.top_char_n", "e.distinct_bigrams")
      .collect()
    val colRows = Tables.t(spark, sf, "documents").filter(col("doc_id") < 20)
      .select(col("doc_id"),
        graft.functions.Native.entropyStats(col("text")).as("e"))
      .selectExpr("doc_id", "e.n_chars", "e.distinct_chars",
        "e.top_char_n", "e.distinct_bigrams")
      .orderBy("doc_id")
      .collect()
    assert(sqlRows.sameElements(colRows))
  }

  test("collectCappedLong equals collect_list under the cap and hard-bounds over it") {
    // 8 partitions force real partial-buffer MERGES, not just updates
    val df = spark.range(0, 1000)
      .select((col("id") % 50).as("g"), col("id").as("v"))
      .repartition(8)
    // 20 elements/group, cap 21: no group hits the cap → bit-identical
    // to collect_list once sorted (the graph_jaccard survivor path)
    val capped = df.groupBy("g")
      .agg(array_sort(graft.functions.Native.collectCappedLong(col("v"), 21))
        .as("ps"))
      .orderBy("g").collect()
    val full = df.groupBy("g")
      .agg(array_sort(collect_list("v")).as("ps"))
      .orderBy("g").collect()
    assert(capped.sameElements(full))
    // 100 elements/group, cap 21: every group is clamped at EXACTLY
    // cap (the filter-side signal: size > JacMaxDeg ⇒ drop), and the
    // kept elements are genuine group members (arrival-order subset)
    val over = spark.range(0, 1000)
      .select((col("id") % 10).as("g"), col("id").as("v"))
      .repartition(8)
      .groupBy("g")
      .agg(graft.functions.Native.collectCappedLong(col("v"), 21).as("ps"))
      .collect()
    assert(over.length == 10)
    over.foreach { r =>
      val g = r.getLong(0)
      val ps = r.getSeq[Long](1)
      assert(ps.length == 21, s"group $g kept ${ps.length}, want exactly cap")
      assert(ps.forall(v => v % 10 == g), s"group $g kept a non-member")
      assert(ps.distinct.length == 21, s"group $g duplicated an element")
    }
  }

  test("collectCappedLong names the type problem on a non-BIGINT child") {
    // r12 ADVICE: the int64-only contract used to be enforced by
    // overriding `resolved`, which surfaced as an opaque "unresolved
    // operator" failure; checkInputDataTypes must name the actual
    // problem instead
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(5).select(col("id").cast("int").as("v"))
        .agg(graft.functions.Native.collectCappedLong(col("v"), 3))
        .collect(): Unit
    }
    assert(e.getMessage.contains("collect_capped_long requires BIGINT"),
      s"expected the named type error, got: ${e.getMessage}")
  }

  test("minhash_sig rejects a non-literal perms argument") {
    Tables.t(spark, sf, "documents").limit(1)
      .createOrReplaceTempView("ext_docs_bad")
    val e = intercept[Exception] {
      spark.sql(
        "SELECT minhash_sig(split(text, ' '), CAST(doc_id AS INT)) FROM ext_docs_bad")
        .collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      e.getMessage.toLowerCase.contains("minhash_sig"))
  }
}
