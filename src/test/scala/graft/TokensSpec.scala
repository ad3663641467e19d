package graft

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
