package graft

import org.apache.spark.sql.functions._

import graft.operators.BpeTrainer
import graft.operators.BpeTrainer.Merge

/** BpeTrainer vs an independent in-memory reference implementation of
  * Sennrich-style BPE (max-count pair per round, lexicographic
  * tie-break, left-to-right non-overlapping merge).
  */
class BpeSpec extends SparkSpec {

  private def refTrain(words: Seq[(String, Long)], steps: Int): Seq[Merge] = {
    var vocab: Seq[(Vector[String], Long)] =
      words.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var continue = true
    while (continue && out.size < steps) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      vocab.foreach { case (syms, c) =>
        syms.iterator.sliding(2).withPartial(false).foreach { p =>
          counts((p.head, p(1))) += c
        }
      }
      if (counts.isEmpty) continue = false
      else {
        val ((a, b), c) = counts.toSeq
          .minBy { case ((x, y), n) => (-n, s"$x $y") }
        out += Merge(a, b, c)
        vocab = vocab.map { case (syms, cnt) =>
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              merged += (a + b); i += 2
            } else { merged += syms(i); i += 1 }
          }
          (merged.result(), cnt)
        }
      }
    }
    out.toSeq
  }

  private val corpus: Seq[(String, Long)] =
    Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("distributed BPE training matches the reference merges exactly " +
      "(counts, order, tie-breaks)") {
    import spark.implicits._
    val words = corpus.toDF("w", "cnt")
    val got = BpeTrainer.train(words, steps = 8)
    val want = refTrain(corpus, steps = 8)
    assert(got === want)
  }

  test("applyMerges encodes a new word consistently with the learned " +
      "merge table (left-to-right non-overlapping)") {
    import spark.implicits._
    val words = corpus.toDF("w", "cnt")
    val merges = BpeTrainer.train(words, steps = 6)
    val enc = Seq("lowest").toDF("w")
      .select(BpeTrainer.applyMerges(
        concat_ws(" ", split(col("w"), "")), merges).as("sym"))
      .head().getString(0)
    // reference encode
    var syms = "lowest".map(_.toString).toVector
    merges.foreach { m =>
      val merged = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == m.left && syms(i + 1) == m.right) {
          merged += (m.left + m.right); i += 2
        } else { merged += syms(i); i += 1 }
      }
      syms = merged.result()
    }
    assert(enc === syms.mkString(" "))
  }

  test("overlapping-run merge is left-to-right: 'a a a' under merge " +
      "(a,a) becomes 'aa a'") {
    import spark.implicits._
    val enc = Seq("aaa").toDF("w")
      .select(BpeTrainer.applyMerges(
        concat_ws(" ", split(col("w"), "")),
        Seq(Merge("a", "a", 0L))).as("sym"))
      .head().getString(0)
    assert(enc === "aa a")
  }
}
