package graft

import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz of the dedup family's native feature kernels
  * against the declarative spellings they replaced (the DuckDB oracles
  * keep those spellings, so these equivalences are the correctness
  * argument end-to-end):
  *
  *  - `graft_shingles(toks)` vs the guarded
  *    `array_distinct(transform(sequence(1, n-2), …))` 3-token shingle
  *    build ([[graft.engine.ops.TextFeatures.shingleSetSql]]), element
  *    order included (first occurrence wins in both).
  *  - `graft_tok_hashes(toks)` vs `transform(toks, t ->
  *    graft_polyhash(t))` — the simhash pipelines' token-hash stage.
  */
class ShinglesSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session

  /** Random token arrays: sizes 0–12 (straddling the <3 empty-set
    * guard), heavy duplication (small word pool) so array_distinct has
    * real work, plus multi-byte and case-edge tokens. */
  private def tokenArrays(seed: Int, n: Int): Seq[Seq[String]] = {
    val rnd = new scala.util.Random(seed)
    val words = Seq("a", "b", "ab", "the", "the", "9", "é中", "🙂", "x1",
      "istanbul", "", " ")
    Seq(Seq.empty[String], Seq("a"), Seq("a", "b"), Seq("a", "b", "c"),
      Seq("a", "a", "a", "a"), Seq("a", "b", "a", "b", "a", "b")) ++
      (1 to n).map(_ => (1 to rnd.nextInt(13))
        .map(_ => words(rnd.nextInt(words.length))))
  }

  test("native shingle set matches the transform-over-sequence spelling, " +
    "order included") {
    val s = spark
    import s.implicits._
    graft.engine.functions.VectorOps.register(s)
    val arrays = tokenArrays(83, 300)
    val rows = arrays.toDF("toks").repartition(8).selectExpr(
      "graft_shingles(toks) AS fast",
      graft.engine.ops.TextFeatures.shingleSetSql("toks") + " AS ref")
      .collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"shingle sets diverge on #$i: ${arrays(i).take(12)}")
    }
  }

  test("native token hashes match the transform-polyhash spelling") {
    val s = spark
    import s.implicits._
    graft.engine.functions.VectorOps.register(s)
    val arrays = tokenArrays(89, 300)
    val rows = arrays.toDF("toks").repartition(8).selectExpr(
      "graft_tok_hashes(toks) AS fast",
      "transform(toks, t -> graft_polyhash(t)) AS ref").collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"token hashes diverge on #$i: ${arrays(i).take(12)}")
    }
  }

  test("null token elements propagate like the replaced spellings " +
    "(no NPE on user SQL arrays)") {
    // both kernels are session-registered SQL functions, so user arrays
    // with null elements can reach them; until round 15 they NPE'd where
    // the declarative twins (concat → null-out; per-element polyhash →
    // null element) propagate
    val s = spark
    graft.engine.functions.VectorOps.register(s)
    val rows = s.sql(
      """SELECT toks FROM VALUES
         (array('a', CAST(NULL AS STRING), 'b', 'c', 'd')),
         (array(CAST(NULL AS STRING))),
         (array('a', 'b', CAST(NULL AS STRING))),
         (array(CAST(NULL AS STRING), NULL, NULL, 'x', 'y', 'z', NULL)),
         (array('a', 'b', 'c', 'a', CAST(NULL AS STRING), 'b', 'c')),
         (array('a', 'b', 'c', 'd')) AS t(toks)""")
      .selectExpr(
        "graft_shingles(toks) AS fast_s",
        graft.engine.ops.TextFeatures.shingleSetSql("toks") + " AS ref_s",
        "graft_tok_hashes(toks) AS fast_h",
        "transform(toks, t -> graft_polyhash(t)) AS ref_h")
      .collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"shingle sets diverge on null-bearing array #$i")
      assert(r.getSeq[java.lang.Long](2) == r.getSeq[java.lang.Long](3),
        s"token hashes diverge on null-bearing array #$i")
    }
  }

  test("null-free token arrays take the primitive unboxed path") {
    // round-16 advice: the round-15 NPE guard had switched the output
    // to Array[Any], boxing every hash on the (always null-free)
    // engine tokenizer output; the fast path must return an
    // UnsafeArrayData over a primitive long array, the boxed
    // GenericArrayData only when a null element is actually present
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val clean = new GenericArrayData(
      Array[Any](UTF8String.fromString("a"), UTF8String.fromString("bb"),
        UTF8String.fromString("ccc")))
    val fast = graft.engine.functions.VectorOps.tokHashes(clean)
    assert(fast.isInstanceOf[
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData],
      "null-free input must produce the primitive array form")
    assert((0 until 3).map(fast.getLong) ==
      Seq("a", "bb", "ccc").map(t =>
        graft.engine.functions.VectorOps.polyHash(UTF8String.fromString(t))))
    val dirty = new GenericArrayData(
      Array[Any](UTF8String.fromString("a"), null))
    val slow = graft.engine.functions.VectorOps.tokHashes(dirty)
    assert(slow.isInstanceOf[GenericArrayData])
    assert(slow.isNullAt(1) && !slow.isNullAt(0))
  }

  test("native shingle set matches the declarative spelling on the " +
    "document corpus") {
    val s = spark
    graft.engine.functions.VectorOps.register(s)
    val rows = graft.engine.Tables.documents(s, "/root/testdata/sf0.01")
      .selectExpr("graft_tokens(text) AS toks")
      .selectExpr("graft_shingles(toks) AS fast",
        graft.engine.ops.TextFeatures.shingleSetSql("toks") + " AS ref")
      .collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"shingle sets diverge on corpus doc #$i")
    }
  }
}
