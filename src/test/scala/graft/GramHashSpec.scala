package graft

import org.apache.spark.sql.functions._

import graft.functions.WordGramHashes.wordGramHashes

/** WordGramHashes must be byte-equivalent to the interpreted chain it
  * replaces: split(trim) → n-gram → array_distinct → unsigned 32-bit
  * Java hash of prefix+gram — including the empty/short-doc and
  * repeated-gram edge cases, in the codegen path over a DataFrame.
  */
class GramHashSpec extends SparkSpec {
  import spark.implicits._

  /** The reference (interpreted) semantics, computed in plain Scala. */
  private def oracle(text: String, n: Int, prefix: String): Seq[Long] = {
    val toks = text.trim.split(" ", -1).toSeq
    val grams = toks.sliding(n).filter(_.size == n).map(_.mkString(" "))
    grams.toSeq.distinct.map(g => (prefix + g).hashCode.toLong & 0xFFFFFFFFL)
  }

  private val cases = Seq(
    ("the quick brown fox", 2, "en|"),
    ("the quick brown fox", 3, ""),
    ("one", 2, "x|"),                    // shorter than n → empty
    ("", 3, ""),                         // empty text
    ("a a a a a", 2, "en|"),             // all grams identical → 1 distinct
    ("a  b", 2, ""),                     // double space → empty interior token
    ("  padded text here  ", 2, "p|"))   // trim applies first

  test("matches the interpreted chain on every edge case (codegen path)") {
    cases.zipWithIndex.foreach { case ((text, n, pref), i) =>
      val got = Seq(text).toDF("text")
        .select(wordGramHashes(col("text"), n, lit(pref)).as("ghs"))
        .head().getSeq[Long](0)
      assert(got == oracle(text, n, pref), s"case $i: '$text' n=$n pref='$pref'")
    }
  }

  test("matches on 200 seeded-random texts against the Scala oracle") {
    val rnd = new scala.util.Random(7)
    val words = Seq("alpha", "beta", "gamma", "delta", "x", "longword", "z9")
    val texts = (1 to 200).map { _ =>
      (0 until rnd.nextInt(12)).map(_ => words(rnd.nextInt(words.size)))
        .mkString(" ")
    }
    val got = texts.toDF("text")
      .select(col("text"), wordGramHashes(col("text"), 2, lit("l|")).as("ghs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    texts.distinct.foreach { t =>
      assert(got(t) == oracle(t, 2, "l|"), s"for '$t'")
    }
  }

  test("clamped window hashes equal String.hashCode of the built gram " +
      "on adversarial inputs (composition law, positional form)") {
    import graft.functions.ClampedShingleHashes.clampedShingleHashes
    // positional reference: hash of the literal clamped 3-gram STRING
    // at every window — the fast path must reproduce it exactly,
    // including empty tokens from space runs, surrogate pairs, and
    // a non-empty prefix folded in via SQL registration
    def positional(text: String): Seq[Long] = {
      val toks = text.trim.split(" ", -1).toSeq
      (0 until math.max(toks.size - 2, 1)).map { i =>
        val g = (0 until 3)
          .map(k => toks(math.min(i + k, toks.size - 1))).mkString(" ")
        g.hashCode.toLong & 0xFFFFFFFFL
      }
    }
    val texts = Seq(
      "a a a a",                          // duplicates RETAINED now
      "x  y   z",                         // space runs → empty tokens
      "emoji 😀 pair 😀😁 tail", // surrogates
      "", "one", "two words",
      "  padded   with runs  ")
    val got = texts.toDF("text")
      .select(col("text"), clampedShingleHashes(col("text")).as("sh"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    texts.foreach(t => assert(got(t) == positional(t), s"for '$t'"))
    // non-empty prefix composes exactly too (SQL two-arg form)
    GraftFunctions.register(spark)
    val withPref = spark.sql(
      "SELECT clamped_shingle_hashes('a b c d', 'p|') AS sh")
      .head().getSeq[Long](0)
    val wantPref = (0 until 2).map { i =>
      val toks = Seq("a", "b", "c", "d")
      ("p|" + (0 until 3).map(k => toks(math.min(i + k, 3))).mkString(" "))
        .hashCode.toLong & 0xFFFFFFFFL
    }
    assert(withPref == wantPref)
  }

  test("word_gram_strings matches the interpreted transform/slice/" +
      "concat_ws chain, positional and distinct, on edge cases") {
    import graft.functions.WordGramStrings.wordGramStrings
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a a a a a a",                      // heavy duplicates
      "x  y   z q r",                     // space runs → empty tokens
      "", "one", "two words", "1 2 3 4 5",
      "  padded   text here with runs  ")
    for (n <- Seq(2, 5, 8)) {
      // interpreted positional reference (guarded: descending sequence
      // errors on short texts, exactly why call sites carried filters)
      val ref = texts.toDF("text")
        .withColumn("toks", split(trim(col("text")), " "))
        .select(col("text"),
          when(size(col("toks")) >= n, expr(
            s"""transform(sequence(0, size(toks) - $n),
                i -> concat_ws(' ', slice(toks, i + 1, $n)))"""))
            .otherwise(expr("array()")).as("g"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      val gotPos = texts.toDF("text")
        .select(col("text"),
          wordGramStrings(trim(col("text")), n, distinct = false).as("g"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      val gotDist = texts.toDF("text")
        .select(col("text"),
          wordGramStrings(trim(col("text")), n, distinct = true).as("g"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      texts.foreach { t =>
        assert(gotPos(t) == ref(t), s"positional n=$n for '$t'")
        assert(gotDist(t) == ref(t).distinct, s"distinct n=$n for '$t'")
      }
    }
    // untrimmed tokenization is the caller's choice (dup-span contract)
    val raw = Seq(" a b c ").toDF("text")
      .select(wordGramStrings(col("text"), 2, distinct = false).as("g"))
      .head().getSeq[String](0)
    assert(raw == Seq(" a", "a b", "b c", "c "))
  }

  test("clamped shingles + minhash bands match the aggregate form") {
    import graft.functions.{ClampedShingleHashes, MinHashBands}
    val P = 4294967311L
    def scalaBands(text: String): Seq[String] = {
      val toks = text.trim.split(" ", -1).toSeq
      val grams = (0 until math.max(toks.size - 2, 1)).map { i =>
        (0 until 3).map(k => toks(math.min(i + k, toks.size - 1))).mkString(" ")
      }.distinct
      val hs = grams.map(g => g.hashCode.toLong & 0xFFFFFFFFL)
      val mins = (0 until 16).map(i =>
        hs.map(h => (h * (2L * i + 1) + (7919L * i + 1)) % P).min)
      (0 until 4).map(b => (0 until 4).map(r => mins(b * 4 + r)).mkString("-"))
    }
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one", "two words", "", "a a a a")
    val got = texts.toDF("text")
      .select(col("text"), MinHashBands.minhashBands(
        ClampedShingleHashes.clampedShingleHashes(col("text")), 16, 4).as("b"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    texts.foreach { t =>
      assert(got(t) == scalaBands(t), s"for '$t'")
    }
  }

  test("SQL registration: word_gram_hashes callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT word_gram_hashes('a b c', 2, 'en|') AS g").head().getSeq[Long](0)
    assert(r == oracle("a b c", 2, "en|"))
  }

  test("SQL registration: all five native expressions callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql("""SELECT
        java_string_hash('abc') AS jh,
        array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
        word_gram_hashes('a b c', 2, 'p|') AS g,
        clamped_shingle_hashes('a b c', '') AS sh,
        minhash_bands(clamped_shingle_hashes('a b c', ''), 16, 4) AS b
      """).head()
    assert(r.getInt(0) == "abc".hashCode)
    assert(r.getDouble(1) == 1.0 * 3 + 2.0 * 4)
    assert(r.getSeq[Long](2) == oracle("a b c", 2, "p|"))
    assert(r.getSeq[Long](3).nonEmpty)
    assert(r.getSeq[String](4).length == 4)
    // geometry args must be literals — a column there is a config error
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_bands(clamped_shingle_hashes('a', ''), CAST(id AS INT), 4) FROM range(1)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
