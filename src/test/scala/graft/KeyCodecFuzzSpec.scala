package graft

import org.apache.spark.sql.functions._

import graft.streaming.StateKeys

/** Randomized proof of the packed-key codec's unique decodability: a
  * reference DECODER (the parse the encoding's doc claims is
  * unambiguous) must round-trip every randomly generated key tuple —
  * nulls, empties, separator bytes, digit runs, colons, the null
  * marker itself as a VALUE — back to exactly the original parts.
  * Round-trip bijectivity is strictly stronger than the sampled
  * distinctness check in StateKeysSpec: it proves no two tuples can
  * EVER pack alike, not just that none did in a fixed fixture.
  */
class KeyCodecFuzzSpec extends SparkSpec {

  /** Reference decoder for the `len:value` / `_:` part grammar. */
  private def decode(packed: String): Seq[Option[String]] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[Option[String]]
    var i = 0
    while (i < packed.length) {
      if (packed.charAt(i) == '_') {
        require(i + 1 < packed.length && packed.charAt(i + 1) == ':',
          s"malformed null marker at $i in <$packed>")
        parts += None
        i += 2
      } else {
        val colon = packed.indexOf(':', i)
        require(colon > i, s"missing length prefix at $i in <$packed>")
        val len = packed.substring(i, colon).toInt
        parts += Some(packed.substring(colon + 1, colon + 1 + len))
        i = colon + 1 + len
      }
    }
    parts.toSeq
  }

  // alphabet chosen to attack the codec: the old separator byte,
  // the codec's own ':' and '_', digits (fake length prefixes),
  // spaces, and letters
  private val alphabet =
    ":_0123456789ab: _".toVector

  test("600 random 1..4-ary key tuples (nulls, separators, digit runs, " +
      "marker bytes) round-trip through pack -> reference decode " +
      "bit-exactly, and distinct tuples never collide") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    def randPart(): Option[String] =
      if (rnd.nextInt(6) == 0) None
      else Some(Seq.fill(rnd.nextInt(8))(
        alphabet(rnd.nextInt(alphabet.size))).mkString)
    val tuples = Seq.fill(600) {
      Seq.fill(1 + rnd.nextInt(4))(randPart())
    }
    // group by arity — packKey is arity-typed (one column per part)
    tuples.groupBy(_.size).foreach { case (arity, ts) =>
      val cols = (0 until arity).map(i => s"k$i")
      val rows = ts.map(t => org.apache.spark.sql.Row.fromSeq(t.map(_.orNull)))
      val schema = org.apache.spark.sql.types.StructType(cols.map(c =>
        org.apache.spark.sql.types.StructField(c,
          org.apache.spark.sql.types.StringType)))
      val df = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
      val packed = df.select(StateKeys.packKey(cols).as("p"),
          struct(cols.map(col): _*).as("t"))
        .collect()
      packed.zip(ts).foreach { case (row, orig) =>
        val p = row.getString(0)
        assert(decode(p) == orig,
          s"round-trip failed: $orig -> <$p> -> ${decode(p)}")
      }
      // bijectivity implies this, but assert the user-facing property
      // directly too: distinct tuples, distinct keys
      val distinctTuples = ts.distinct.size
      val distinctKeys = packed.map(_.getString(0)).distinct.size
      assert(distinctKeys == distinctTuples,
        s"arity $arity: $distinctTuples tuples -> $distinctKeys keys")
    }
  }

  test("2000 random same-millisecond mongo envelope pairs: the winner " +
      "is always the numeric (ts, t, i) maximum, across both clusterTime " +
      "renderings and digit-boundary crossings") {
    import spark.implicits._
    import graft.operators.CdcApply
    val rnd = new scala.util.Random(987654321L)
    // per key: 2..4 envelopes, ts drawn from {100, 101} to force ties,
    // (t, i) drawn from digit-boundary-heavy ranges, rendering form
    // randomized per envelope. Values are the per-key index, so the
    // model can name the expected winner.
    case class Env(ts: Long, t: Long, i: Long, form: Int, v: Int)
    def render(e: Env): String =
      if (e.form == 0) s"Timestamp(${e.t}, ${e.i})"
      else s"""{\\"t\\":${e.t},\\"i\\":${e.i}}"""
    val boundary = Seq(8L, 9L, 10L, 11L, 99L, 100L, 101L, 999L, 1000L)
    val keys = (0 until 500).map { k =>
      val n = 2 + rnd.nextInt(3)
      // distinct (ts, t, i) triples per key so the model's winner is
      // unambiguous without modeling the raw-string tiebreak
      val triples = scala.collection.mutable.LinkedHashSet.empty[(Long, Long, Long)]
      while (triples.size < n)
        triples += ((100L + rnd.nextInt(2),
          boundary(rnd.nextInt(boundary.size)),
          boundary(rnd.nextInt(boundary.size))))
      val envs = triples.toSeq.zipWithIndex.map { case ((ts, t, i), idx) =>
        Env(ts, t, i, rnd.nextInt(2), idx)
      }
      s"key_$k" -> envs
    }
    val rows = keys.flatMap { case (key, envs) =>
      envs.map { e =>
        val ct = render(e)
        (key,
          s"""{"_id":"82AB","operationType":"update","fullDocument":""" +
            s""""{\\"v\\": \\"${e.v}\\"}","ts_ms":${e.ts},""" +
            s""""clusterTime":"$ct"}""")
      }
    }
    val model: Map[String, Int] = keys.map { case (key, envs) =>
      key -> envs.maxBy(e => (e.ts, e.t, e.i)).v
    }.toMap
    val out = CdcApply.lastChangePerKeyMongo(
        rows.toDF("partitionKey", "value"))
      .select(col("partitionKey"),
        element_at(col("after"), "v").as("v"))
      .collect()
      .map(r => r.getString(0) -> r.getString(1).toInt)
      .toMap
    assert(out.size == model.size)
    val wrong = model.collect {
      case (k, v) if out(k) != v => s"$k: got ${out(k)} want $v"
    }
    assert(wrong.isEmpty, wrong.take(5).mkString("; "))
  }
}
