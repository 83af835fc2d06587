package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Online GPT-style sequence packing — the streaming twin of the batch
  * `pack_sequences` query: per language, documents concatenate in
  * doc_id order and chunk into fixed context windows; each doc is
  * assigned the bin where it STARTS plus its offset in that bin.
  *
  * State per language is ONE long (the running token count), so an
  * always-on ingest path can pack documents into training contexts as
  * they arrive with O(languages) state — no corpus-wide window, no
  * re-pack of history when new docs land (the batch query's running
  * sum becomes carried state).
  *
  * Ordering contract: within a micro-batch a language's docs may
  * arrive in any order (the operator sorts the batch's group
  * locally — bounded memory, one micro-batch's worth); ACROSS
  * micro-batches each language's doc_ids must ascend (the shape of a
  * dataloader feed that ingests shards in order). Under that contract
  * the streamed assignment is row-for-row identical to the batch
  * query, which the spec proves on the fixture replay.
  */
object StreamingPacker {

  final case class DocIn(lang: String, doc_id: Long, n_tokens: Long)
  final case class PackedDoc(lang: String, doc_id: Long, n_tokens: Long,
      bin: Long, bin_offset: Long)

  def pack(docs: Dataset[DocIn], ctxLen: Long): Dataset[PackedDoc] = {
    val session = docs.sparkSession
    import session.implicits._
    docs
      .groupByKey(_.lang)
      .flatMapGroupsWithState[Long, PackedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (lang: String, ds: Iterator[DocIn],
         state: org.apache.spark.sql.streaming.GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          val out = ds.toSeq.sortBy(_.doc_id).map { d =>
            val start = cum
            cum += d.n_tokens
            PackedDoc(lang, d.doc_id, d.n_tokens,
              start / ctxLen, start % ctxLen)
          }
          state.update(cum)
          out.iterator
      }
  }
}
