package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused word-n-gram hasher: `word_gram_hashes(text, n, prefix)` ⇒
  * `array<long>` of unsigned-32-bit Java string hashes of the DISTINCT
  * space-joined word n-grams of `trim(text)`, each hashed as
  * `prefix + gram`.
  *
  * Exactly equivalent to (and a drop-in for) the interpreted chain
  *   `split(trim(text), " ")` → slide/`zip_with`/`transform` n-gram
  *   construction → `array_distinct` → `java_string_hash(concat(prefix,
  *   gram)) & 0xFFFFFFFF`
  * used by the gram-based dedup/decontamination operators — but as ONE
  * codegen-participating call per row. Spark's higher-order functions
  * are CodegenFallback: each of the 4 steps re-enters the interpreter
  * per element and materializes an intermediate array. At 100 TB the
  * gram stage dominates those scans, so this is the hot-path tier-(b)
  * custom expression from the build plan (same rationale as
  * [[ArrayDot]]; reference behavior anchor: the corpus operators are
  * graft extensions beyond flink-cdc-msk's surface).
  *
  * Parity details that keep the DuckDB oracle bit-exact:
  *   - split on the single-space regex keeps interior empty tokens;
  *     `trim` strips 0x20 only — both match `split(trim(text), " ")`
  *   - distinct is over GRAM STRINGS (first occurrence kept), not over
  *     hashes: two distinct grams colliding to one hash stay two
  *     elements, as in the `array_distinct`-then-hash chain
  *   - the hash is `java.lang.String.hashCode` over the UTF-16 form of
  *     `prefix + gram`, masked to unsigned 32 bits — the fold DuckDB
  *     replicates via `list_reduce` (see `QueryDef.uhashSql`)
  */
case class WordGramHashes(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_gram_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, StringType) =>
        if (second.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"$prettyName: n must be foldable")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int, string) arguments, got $other")
    }

  override def nullSafeEval(text: Any, n: Any, prefix: Any): Any =
    WordGramHashes.compute(
      text.asInstanceOf[UTF8String],
      n.asInstanceOf[Int],
      prefix.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n, p) =>
      // Janino callers see no 3-arg overload for a Scala default arg —
      // the `clamp` parameter must be passed explicitly or codegen fails
      // to compile and the whole stage silently falls back to interpreted.
      s"${ev.value} = graft.functions.WordGramHashes.compute($t, $n, $p, false);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): WordGramHashes =
    copy(first = f, second = s, third = t)
}

object WordGramHashes {

  /** Single fused pass: trim → split(' ') → n-grams → distinct → hash.
    * Called from both the interpreted and generated code paths.
    *
    * `clamp = false`: standard n-grams — windows of n consecutive
    * tokens, none for texts shorter than n tokens.
    * `clamp = true`: the MinHash-shingle variant (`DedupQueries.
    * shingleHashes` semantics) — 3-grams at 1-based positions
    * `1 .. max(len-2, 1)` with out-of-range indices clamped to the
    * last token (`least(i+k, size)`), so every document (even a 1- or
    * 2-token one) yields at least one shingle. This variant emits one
    * hash PER WINDOW POSITION (duplicates retained, no distinct set):
    * its consumers are min aggregations, for which the retained
    * duplicates are invisible — and dropping the distinct set lets
    * the whole pass run allocation-free off composed token hashes.
    */
  def compute(text: UTF8String, n: Int, prefix: UTF8String,
      clamp: Boolean = false): ArrayData = {
    // split on every single space, keeping interior empties — identical
    // to split(trim(text), " ") (regex split, limit -1, on trimmed input)
    val s = text.trim.toString
    val toks = s.split(" ", -1)
    val len = toks.length
    val count = if (clamp) math.max(len - 2, 1) else len - n + 1
    if (count <= 0) return new GenericArrayData(Array.emptyLongArray)
    val pref = prefix.toString
    if (clamp) {
      // MinHash-shingle fast path: every consumer is a MIN aggregation
      // over the hashes (duplicate- and order-insensitive), so neither
      // the distinct set nor the gram STRINGS need materializing — the
      // 31-polynomial string hash composes exactly over concatenation,
      //   H(s1 ++ s2) = H(s1)·31^|s2| + H(s2)   (UTF-16 code units),
      // so each window's hash derives from per-token hashes with zero
      // allocations. Emits ONE hash per window position (duplicates
      // retained); the minima — and therefore the band signatures —
      // are bit-identical to the distinct-set string form
      // (GramHashSpec proves the window hash against String.hashCode
      // on adversarial inputs: runs of spaces, surrogate pairs, dups).
      val th = new Array[Int](len) // String.hashCode per token
      val tp = new Array[Int](len) // 31^len(token), wrapping like hashCode
      var t = 0
      while (t < len) {
        val tok = toks(t)
        val l = tok.length
        var h = 0
        var p = 1
        var c = 0
        while (c < l) { h = h * 31 + tok.charAt(c); p = p * 31; c += 1 }
        th(t) = h
        tp(t) = p
        t += 1
      }
      val prefH = pref.hashCode
      val out = new Array[Long](count)
      var i = 0
      while (i < count) {
        val i1 = math.min(i + 1, len - 1)
        val i2 = math.min(i + 2, len - 1)
        var h = th(i)
        var pg = tp(i)
        h = h * 31 + ' '; pg = pg * 31
        h = h * tp(i1) + th(i1); pg = pg * tp(i1)
        h = h * 31 + ' '; pg = pg * 31
        h = h * tp(i2) + th(i2); pg = pg * tp(i2)
        out(i) = (prefH * pg + h).toLong & 0xFFFFFFFFL
        i += 1
      }
      return new GenericArrayData(out)
    }
    val seen = new java.util.LinkedHashSet[String](count * 2)
    var i = 0
    val sb = new java.lang.StringBuilder(64)
    while (i < count) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)) // clamp=true returned above
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = (pref + it.next()).hashCode.toLong & 0xFFFFFFFFL
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Word n-gram STRINGS of `text` (no trim — see [[WordGramStrings]]):
    * positional window order when `distinct = false`, first-occurrence
    * distinct set when `distinct = true`. Shares the tokenize/window
    * semantics of [[compute]] (split on every single space, empties
    * kept), minus the internal trim.
    */
  def computeStrings(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val len = toks.length
    val count = len - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[AnyRef])
    val sb = new java.lang.StringBuilder(64)
    def gram(i: Int): String = {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      sb.toString
    }
    if (distinct) {
      val seen = new java.util.LinkedHashSet[String](count * 2)
      var i = 0
      while (i < count) { seen.add(gram(i)); i += 1 }
      val out = new Array[AnyRef](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[AnyRef](count)
      var i = 0
      while (i < count) { out(i) = UTF8String.fromString(gram(i)); i += 1 }
      new GenericArrayData(out)
    }
  }

  /** Column-API entry: distinct word-n-gram hashes of `text`, each
    * hashed as `prefix + gram`.
    */
  def wordGramHashes(text: Column, n: Int, prefix: Column): Column =
    ColumnBridge.column(WordGramHashes(
      ColumnBridge.expression(text),
      org.apache.spark.sql.catalyst.expressions.Literal(n),
      ColumnBridge.expression(prefix)))
}

/** Fused word-n-gram STRING builder: `word_gram_strings(text, n,
  * distinct)` ⇒ `array<string>` of the space-joined word n-grams of
  * `text` — positional window order when `distinct = false` (one
  * element per window, duplicates retained, so `posexplode` yields
  * window indices), first-occurrence distinct set when `distinct =
  * true`.
  *
  * Drop-in replacement for the interpreted
  *   `transform(sequence(0, size(toks) - n), i -> concat_ws(' ',
  *   slice(toks, i + 1, n)))` (+ `array_distinct`)
  * chains in the phrase-mining / dup-span / bigram operators: those
  * higher-order functions are CodegenFallback — each element re-enters
  * the interpreter and materializes intermediate arrays — and several
  * operators evaluate the chain twice (either side of a self-join).
  * NOTE: does NOT trim — pass `trim(col)` to match `split(trim(text))`
  * call sites (the dup-span operators tokenize untrimmed on purpose).
  * Texts shorter than `n` tokens yield an EMPTY array (the interpreted
  * chain errors on the descending `sequence`, so call sites guarded
  * with `size(toks) >= n` — the guard becomes unnecessary).
  */
case class WordGramStrings(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_gram_strings"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, org.apache.spark.sql.types.BooleanType) =>
        if (second.foldable && third.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName: n and distinct must be foldable")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int, boolean) arguments, got $other")
    }

  override def nullSafeEval(text: Any, n: Any, distinct: Any): Any =
    WordGramHashes.computeStrings(
      text.asInstanceOf[UTF8String],
      n.asInstanceOf[Int],
      distinct.asInstanceOf[Boolean])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n, d) =>
      s"${ev.value} = graft.functions.WordGramHashes.computeStrings($t, $n, $d);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): WordGramStrings =
    copy(first = f, second = s, third = t)
}

object WordGramStrings {
  /** Column-API entry: word n-gram strings of `text` (positional when
    * `distinct = false`); pass `trim(text)` for trimmed tokenization.
    */
  def wordGramStrings(text: Column, n: Int, distinct: Boolean): Column =
    ColumnBridge.column(WordGramStrings(
      ColumnBridge.expression(text),
      org.apache.spark.sql.catalyst.expressions.Literal(n),
      org.apache.spark.sql.catalyst.expressions.Literal(distinct)))
}

/** Clamped 3-gram shingle hashes — the MinHash shingling variant (see
  * [[WordGramHashes.compute]] with `clamp = true`): one positional
  * window hash per shingle (duplicates retained — its consumers are
  * min aggregations, which cannot see them), computed allocation-free
  * from composed per-token hashes; min-equivalent to hashing the
  * interpreted `sequence`/`element_at(least(...))` distinct-gram
  * chain in the batch dedup operators, fused into one codegen call.
  */
case class ClampedShingleHashes(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "clamped_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string) arguments, got $other")
    }

  override def nullSafeEval(text: Any, prefix: Any): Any =
    WordGramHashes.compute(
      text.asInstanceOf[UTF8String], 3,
      prefix.asInstanceOf[UTF8String], clamp = true)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, p) =>
      s"${ev.value} = graft.functions.WordGramHashes.compute($t, 3, $p, true);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ClampedShingleHashes =
    copy(left = l, right = r)
}

object ClampedShingleHashes {
  def clampedShingleHashes(text: Column): Column =
    ColumnBridge.column(ClampedShingleHashes(
      ColumnBridge.expression(text),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        "", StringType)))
}
