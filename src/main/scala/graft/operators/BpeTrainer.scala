package graft.operators

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction over a distributed word-count
  * table (Sennrich et al. 2016 semantics: highest-count adjacent symbol
  * pair merges each round, ties broken lexicographically; merges apply
  * left-to-right non-overlapping).
  *
  * Scale shape: the corpus collapses to its VOCABULARY first (one
  * word-count aggregation), so each round's pair count runs over distinct
  * words weighted by frequency — at 100 TB the vocabulary is millions of
  * rows, not trillions of tokens. Each round is one keyed aggregation +
  * a 1-row argmax collect (iteration control only, like
  * [[KMeans]]/[[ConnectedComponents]]); the merge itself is a per-row
  * regexp projection. Intermediate state is persisted per round and the
  * previous round unpersisted, keeping lineage O(1).
  */
object BpeTrainer {

  /** One learned merge: the adjacent pair and its weighted count. */
  final case class Merge(left: String, right: String, count: Long)

  /** `words`: columns (w: string, cnt: long) — the vocabulary with
    * frequencies. Returns up to `steps` merges in learned order (stops
    * early when no adjacent pair remains).
    */
  def train(words: DataFrame, steps: Int): Seq[Merge] = {
    // symbol sequences as space-separated strings: "hello" -> "h e l l o"
    var syms = words.select(
      concat_ws(" ", split(col("w"), "")).as("sym"), col("cnt")).persist()
    syms.count()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    try {
      var continue = true
      while (continue && merges.size < steps) {
        val top = syms
          // fully-merged words (1 symbol) contribute no pairs — and
          // sequence(0, -1) would count DOWN, so they must not reach it
          .filter(size(split(col("sym"), " ")) >= 2)
          .select(col("cnt"), explode(expr(
            """transform(sequence(0, size(split(sym, ' ')) - 2),
               i -> concat(element_at(split(sym, ' '), i + 1), ' ',
                           element_at(split(sym, ' '), i + 2)))"""))
            .as("pair"))
          .groupBy(col("pair")).agg(sum(col("cnt")).as("c"))
          .orderBy(col("c").desc, col("pair"))
          .limit(1).collect()
        if (top.isEmpty) continue = false
        else {
          val Array(a, b) = top.head.getString(0).split(" ", 2)
          merges += Merge(a, b, top.head.getLong(1))
          // left-to-right non-overlapping replacement of "a b" -> "ab",
          // bounded by start/end-of-string or the space separator
          val pat = s"(?<=^| )${Pattern.quote(a)} ${Pattern.quote(b)}(?=$$| )"
          val next = syms.select(
            regexp_replace(col("sym"), pat,
              Matcher.quoteReplacement(a + b)).as("sym"), col("cnt")).persist()
          next.count()
          syms.unpersist()
          syms = next
        }
      }
      merges.toSeq
    } finally syms.unpersist()
  }

  /** Apply learned merges to a token column (space-separated symbol
    * string in, merged symbol string out) — the encode side, a pure
    * per-row projection chain.
    */
  def applyMerges(sym: org.apache.spark.sql.Column,
      merges: Seq[Merge]): org.apache.spark.sql.Column =
    merges.foldLeft(sym) { (c, m) =>
      regexp_replace(c,
        s"(?<=^| )${Pattern.quote(m.left)} ${Pattern.quote(m.right)}(?=$$| )",
        Matcher.quoteReplacement(m.left + m.right))
    }
}
