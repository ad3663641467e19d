package graft

import org.apache.spark.sql.functions.{count, expr, lit, sum}
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz of the native `graft_tokens` tokenizer against
  * the declarative `regexp_extract_all(lower(text), '[a-z0-9]+')` it
  * replaces: element-for-element equality on random unicode strings
  * (mixed ASCII, punctuation, multi-byte code points, case-folding
  * edge cases) AND on the real document corpus — the DuckDB oracles
  * keep the regexp spelling, so this equivalence IS the correctness
  * argument for every text query's tokenization.
  */
class TokensSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session

  private def both(texts: Seq[String]): Unit = {
    val s = spark
    import s.implicits._
    graft.engine.functions.VectorOps.register(s)
    val df = texts.toDF("text").repartition(8)
    val rows = df.selectExpr(
      "graft_tokens(text) AS fast",
      "regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS ref").collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"tokenizers diverge on input #$i: ${texts(i).take(80)}")
    }
  }

  test("native tokenizer matches the regexp spelling on adversarial " +
    "generated strings") {
    val rnd = new scala.util.Random(31)
    val alphabet: IndexedSeq[String] =
      ('a' to 'z').map(_.toString) ++ ('A' to 'Z').map(_.toString) ++
        ('0' to '9').map(_.toString) ++
        Seq(" ", "\t", "\n", ".", ",", "-", "_", "'", "\"", "é", "Ü", "ß",
          "Σ", "И", "中", "🙂", "İ", "ı", "\u0000", "­")
    val cases = Seq("", "a", "A", "0", " ", "...", "a1B2c3",
      "İstanbul ısparta ß STRASSE", "中文 mixed ascii123 tail") ++
      (1 to 200).map { _ =>
        (1 to rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length)))
          .mkString
      }
    both(cases)
  }

  test("native tokenizer matches the regexp spelling on the document corpus") {
    val texts = graft.engine.Tables.documents(spark, "/root/testdata/sf0.01")
      .select("text").collect().map(_.getString(0)).toSeq
    both(texts)
  }

  /** `graft_count_sub` vs the length-difference replace spelling it
    * replaced in text_langid_ngram (the DuckDB oracle keeps replace,
    * so this equivalence is the correctness argument). */
  private def bothCounts(pairs: Seq[(String, String)]): Unit = {
    val s = spark
    import s.implicits._
    graft.engine.functions.VectorOps.register(s)
    val rows = pairs.toDF("t", "g").repartition(8).selectExpr(
      "graft_count_sub(t, g) AS fast",
      "CAST((length(t) - length(replace(t, g, ''))) / length(g) AS INT)" +
        " AS ref").collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(0) == r.getInt(1),
        s"substring counters diverge on #$i: ${pairs(i)}")
    }
  }

  /** `graft_count_in` vs the strip-then-length regexp spelling it
    * replaced in text_quality. */
  test("native set counter matches the regexp_replace spelling on " +
    "adversarial strings") {
    val s = spark
    import s.implicits._
    graft.engine.functions.VectorOps.register(s)
    val rnd = new scala.util.Random(53)
    val alpha = "aZ9 .,;:!?-_éÜ中🙂\t\n"
    val texts = Seq("", "abcXYZ", "...", "é.a,é", "🙂!🙂?", "中文abc.,") ++
      (1 to 200).map(_ => (1 to rnd.nextInt(50))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    val letters = (('a' to 'z') ++ ('A' to 'Z')).mkString
    for (set <- Seq(letters, ".,;:!?")) {
      val rows = texts.toDF("t").repartition(8).selectExpr(
        s"graft_count_in(t, '$set') AS fast",
        s"length(regexp_replace(t, '[^${set.replace("?", "\\\\?")
          .replace(".", "\\\\.")}]', '')) AS ref").collect()
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.getInt(0) == r.getInt(1),
          s"set counters diverge on #$i set=$set: ${texts(i)}")
      }
    }
  }

  /** `graft_char_stats` vs the explode(split(text, '')) double
    * aggregate it replaced in text_char_diversity — same code-point
    * units, including surrogate pairs. */
  test("native char stats match the explode-split spelling on " +
    "adversarial strings") {
    val s = spark
    import s.implicits._
    graft.engine.functions.VectorOps.register(s)
    val rnd = new scala.util.Random(59)
    val alpha = "ab9 .é中🙂"
    val texts = Seq("a", "aa", "ab", "é", "🙂🙂a", "中中中文") ++
      (1 to 150).map(_ => (1 to (1 + rnd.nextInt(40)))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t").repartition(8)
    val fast = df.selectExpr("id", "graft_char_stats(t) AS st")
      .selectExpr("id", "st.n_distinct AS nd", "st.s2 AS s2", "st.n AS n")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val ref = df.selectExpr("id", "explode(split(t, '')) AS c")
      .where("c <> ''")
      .groupBy($"id", $"c").count()
      .groupBy($"id")
      .agg(count(lit(1)).as("nd"),
        sum($"count" * $"count").as("s2"), sum($"count").as("n"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    ref.foreach { case (id, expd) =>
      assert(fast(id) == expd,
        s"char stats diverge on #$id: '${texts(id.toInt).take(40)}' " +
          s"fast=${fast(id)} ref=$expd")
    }
  }

  /** `graft_token_counts` vs the two regexp_extract_all spellings it
    * replaced in text_token_count. */
  test("native token counts match the regexp spellings on adversarial " +
    "strings") {
    val s = spark
    import s.implicits._
    graft.engine.functions.VectorOps.register(s)
    val rnd = new scala.util.Random(61)
    // includes vertical tab / form feed (\s-class but NOT excluded by
    // the bpe char class) and multi-byte code points
    val alpha = "aZ9 .!-é中🙂\t\n\r\f"
    val texts = Seq("", " ", "a b", "ab12cd", "é é", "🙂a🙂", "ab\fc",
      "x\r\ny", "...") ++
      (1 to 250).map(_ => (1 to rnd.nextInt(50))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    val rows = texts.toDF("t").repartition(8).selectExpr(
      "graft_token_counts(t) AS tc",
      "size(regexp_extract_all(t, '\\\\S+', 0)) AS ws_ref",
      "size(regexp_extract_all(t, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 \\\\t\\\\r\\\\n]', 0)) AS bpe_ref")
      .selectExpr("tc.n_ws", "tc.n_bpe", "ws_ref", "bpe_ref").collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(0) == r.getInt(2) && r.getInt(1) == r.getInt(3),
        s"token counts diverge on #$i '${texts(i).take(40)}': " +
          s"fast=(${r.getInt(0)},${r.getInt(1)}) " +
          s"ref=(${r.getInt(2)},${r.getInt(3)})")
    }
  }

  /** `graft_bigram_stats` / `graft_line_stats` vs the explode /
    * filter-split spellings they replaced in text_repetition. */
  test("native repetition stats match the declarative spellings on " +
    "adversarial strings") {
    val s = spark
    import s.implicits._
    graft.engine.functions.VectorOps.register(s)
    val rnd = new scala.util.Random(67)
    val words = Seq("a", "b", "ab", "the", "9")
    val texts = Seq("", "a", "a b", "a b a b a b", "x\n\nx\ny\n",
      "line\nline\nline", "\n\n\n") ++
      (1 to 200).map { _ =>
        (1 to rnd.nextInt(30)).map(_ =>
          if (rnd.nextInt(6) == 0) "\n" else words(rnd.nextInt(words.length)))
          .mkString(" ")
      }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t").repartition(8)
    val fast = df.selectExpr("id",
      "graft_bigram_stats(graft_tokens(t)) AS bs",
      "graft_line_stats(t) AS ls")
      .selectExpr("id", "bs.mx", "bs.tot", "ls.n", "ls.nd")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4))).toMap
    val ref = df
      .withColumn("toks", expr("graft_tokens(t)"))
      .withColumn("grams", expr(
        "CASE WHEN size(toks) >= 2 THEN transform(sequence(1, size(toks) - 1), " +
          "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))) " +
          "ELSE array() END"))
      .withColumn("lines", expr("filter(split(t, '\\n'), x -> x <> '')"))
      .selectExpr("id",
        "CAST(coalesce(array_max(transform(array_distinct(grams), " +
          "g -> size(filter(grams, x -> x = g)))), 0) AS BIGINT) AS mx",
        "CAST(size(grams) AS BIGINT) AS tot",
        "size(lines) AS n", "size(array_distinct(lines)) AS nd")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4))).toMap
    ref.foreach { case (id, expd) =>
      assert(fast(id) == expd,
        s"repetition stats diverge on #$id '${texts(id.toInt).take(40)}': " +
          s"fast=${fast(id)} ref=$expd")
    }
  }

  /** `graft_gopher_counts` vs the three HOF lambdas it replaced in
    * text_gopher_rules. */
  test("native gopher counters match the HOF spellings on adversarial " +
    "token arrays") {
    val s = spark
    import s.implicits._
    graft.engine.functions.VectorOps.register(s)
    val rnd = new scala.util.Random(71)
    val words = Seq("the", "and", "99", "a1", "z", "0", "be", "have")
    val texts = Seq("", "the the the", "9 99 999", "of to with") ++
      (1 to 200).map(_ => (1 to rnd.nextInt(25))
        .map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    val stops = graft.engine.ops.TextOps.GopherStopwords
    val stopList = stops.map(w => s"'$w'").mkString(", ")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t").repartition(8)
      .withColumn("toks", expr("graft_tokens(t)"))
    val fast = df
      .withColumn("gc", org.apache.spark.sql.functions.call_function(
        "graft_gopher_counts", $"toks",
        org.apache.spark.sql.functions.typedLit(stops)))
      .selectExpr("id", "gc.sum_len", "gc.n_alpha", "gc.n_stop")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val ref = df.selectExpr("id",
      "aggregate(toks, CAST(0 AS BIGINT), (a, x) -> a + length(x)) AS sl",
      "CAST(size(filter(toks, x -> x rlike '[a-z]')) AS BIGINT) AS na",
      s"CAST(size(filter(toks, x -> x IN ($stopList))) AS BIGINT) AS ns")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    ref.foreach { case (id, expd) =>
      assert(fast(id) == expd,
        s"gopher counters diverge on #$id '${texts(id.toInt).take(40)}': " +
          s"fast=${fast(id)} ref=$expd")
    }
  }

  /** `graft_ttr_stats` vs the explode/rollup spelling it replaced in
    * text_ttr. */
  test("native lexical-diversity stats match the explode spelling") {
    val s = spark
    import s.implicits._
    graft.engine.functions.VectorOps.register(s)
    val rnd = new scala.util.Random(73)
    val words = Seq("a", "b", "the", "the", "x9", "unique")
    val texts = Seq("", "a", "a a", "a b a", "one two three") ++
      (1 to 200).map(_ => (1 to rnd.nextInt(25))
        .map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t").repartition(8)
      .withColumn("toks", expr("graft_tokens(t)"))
    val fast = df.selectExpr("id", "graft_ttr_stats(toks) AS ts")
      .selectExpr("id", "ts.n_tokens", "ts.n_types", "ts.n_hapax")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val ref = df.select($"id", org.apache.spark.sql.functions
        .explode($"toks").as("tok"))
      .groupBy($"id", $"tok").agg(count(lit(1)).as("c"))
      .groupBy($"id")
      .agg(sum($"c").as("nt"), count(lit(1)).as("ty"),
        expr("count_if(c = 1)").as("h"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // explode drops token-free docs; the kernel reports (0,0,0) — the
    // query reproduces absence with its n_tokens > 0 filter
    ref.foreach { case (id, expd) =>
      assert(fast(id) == expd, s"ttr stats diverge on #$id: " +
        s"'${texts(id.toInt)}' fast=${fast(id)} ref=$expd")
    }
    fast.filterNot(kv => ref.contains(kv._1)).foreach { case (id, st) =>
      assert(st == ((0L, 0L, 0L)),
        s"doc #$id absent from explode must be token-free, got $st")
    }
  }

  /** `graft_token_count` vs `size(graft_tokens(text))` — the nine
    * count-only consumers rely on identical run structure. */
  test("native token-run count equals the token array's size on " +
    "adversarial strings") {
    val s = spark
    import s.implicits._
    graft.engine.functions.VectorOps.register(s)
    val rnd = new scala.util.Random(79)
    val alphabet: IndexedSeq[String] =
      ('a' to 'z').map(_.toString) ++ ('A' to 'Z').map(_.toString) ++
        ('0' to '9').map(_.toString) ++
        Seq(" ", "\t", "\n", ".", ",", "-", "é", "Ü", "ß", "中", "🙂",
          "İ", "ı")
    val texts = Seq("", "a", "İstanbul ısparta ß", "a1B2c3", "  .. ") ++
      (1 to 250).map(_ => (1 to rnd.nextInt(50))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val rows = texts.toDF("t").repartition(8).selectExpr(
      "graft_token_count(t) AS fast",
      "size(graft_tokens(t)) AS ref").collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(0) == r.getInt(1),
        s"token counts diverge on #$i: '${texts(i).take(40)}'")
    }
  }

  test("native substring counter matches the replace spelling, " +
    "including overlap and multi-byte cases") {
    val rnd = new scala.util.Random(47)
    val fixed = Seq(
      ("aaaa", "aa"),   // non-overlapping: 2, not 3
      ("aaa", "aa"),    // 1
      ("ababab", "aba"),// 1 (left-to-right non-overlap)
      ("", "the"), ("the", "the"), ("thethe", "the"),
      ("ééé", "éé"),    // multi-byte self-sync: 1
      ("中文中文中", "中文中"), ("xyz", "q"))
    val alpha = "abthe中é "
    val fuzz = (1 to 300).map { _ =>
      val t = (1 to rnd.nextInt(40))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val g = (1 to (1 + rnd.nextInt(3)))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      (t, g)
    }
    bothCounts(fixed ++ fuzz)
  }
}
