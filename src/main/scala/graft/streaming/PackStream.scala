package graft.streaming

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One doc of the permutation stream, tokenized (the SAME
  * [[TextFunctions.tokens]] Catalyst expression as the batch packer —
  * tokenization cannot drift between the two faces).
  */
final case class PackIn(shard: Int, pos: Long, doc_id: Long,
                        toks: Seq[String])

/** A doc's token interval inside the open buffer: [start, end) offsets
  * relative to the buffer head. `start` goes negative once the piece
  * straddles an emitted boundary — exactly one piece can, and it is the
  * open sequence's offset-0 piece (the batch packer's min-seq_off doc).
  */
final case class PackPiece(doc_id: Long, start: Long, end: Long)

/** Per-shard carry-over state: next sequence id, the open (not yet
  * budget-full) token buffer, its contributing pieces, and the last
  * consumed permutation position (the in-order ingest contract guard).
  */
final case class PackState(nextSeq: Long, toks: Seq[String],
                           pieces: Seq[PackPiece], lastPos: Long)

/** One packed sequence — the same columns as the batch
  * [[graft.ops.PackingQueries]] packed relation, so the differential
  * spec compares rows directly.
  */
final case class PackedOut(shard: Int, seq_id: Long, n_tokens: Long,
                           n_pad: Long, n_docs: Long, first_doc: Long,
                           seq_fp: String, toks: Seq[String])

/** Streaming face of the packed training artifact (H9p): packs an
  * ARRIVING permutation stream into fixed-token-budget sequences with
  * carry-over state across micro-batches — the ingest-time twin of the
  * batch `packedSequences` layout, for the pipeline that keeps the
  * epoch input growing as new curated docs land instead of re-packing
  * history every day.
  *
  * Contract (the loader-replay contract, same as the batch artifact):
  * per shard, rows arrive in permutation-position order ACROSS
  * micro-batches (within a batch any order — the group sorts its slice,
  * bounded by the trigger size); a position regression throws rather
  * than silently mis-packing. Emitted sequences are exactly `budget`
  * tokens; the open remainder stays in state until a flush sentinel
  * (doc_id = [[PackStream.FlushDocId]]) closes the shard, emitting the
  * one padded final sequence — so stream output == batch output row for
  * row, including the only-last-sequence-padded invariant.
  *
  * State at 100 TB: one open buffer per shard (< budget tokens) + its
  * piece offsets — constant-bounded per shard, independent of history
  * length; shard count is the parallelism knob, as in the batch layout.
  */
object PackStream {

  /** Sentinel doc_id: closes a shard, emitting its padded remainder. */
  val FlushDocId: Long = -1L

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** Emit every completed sequence from `st`, returning the advanced
    * state. `force` also emits a non-empty sub-budget remainder (the
    * flush path — the batch layout's padded last sequence).
    */
  private def drain(shard: Int, st: PackState, budget: Int, force: Boolean,
                    out: scala.collection.mutable.Builder[PackedOut, Vector[PackedOut]])
  : PackState = {
    var s = st
    while (s.toks.size >= budget || (force && s.toks.nonEmpty)) {
      val take = math.min(budget, s.toks.size)
      val seqToks = s.toks.take(take)
      // a piece contributes iff its interval overlaps [0, take) — end>0
      // holds for every retained piece, so the filter is start-only
      val contrib = s.pieces.filter(_.start < take)
      out += PackedOut(shard, s.nextSeq, take.toLong, (budget - take).toLong,
        contrib.size.toLong, contrib.minBy(_.start).doc_id,
        md5hex(seqToks.mkString(" ")), seqToks)
      s = PackState(s.nextSeq + 1, s.toks.drop(take),
        s.pieces.map(p => PackPiece(p.doc_id, p.start - take, p.end - take))
          .filter(_.end > 0), s.lastPos)
    }
    s
  }

  /** The stateful packer over a streaming (or batch) `rows` relation
    * carrying shard / pos / doc_id / text. Update-mode compatible: each
    * trigger emits the sequences COMPLETED by that trigger's rows.
    *
    * Position contract: `pos` is the 1-BASED within-shard permutation
    * rank ([[graft.ops.SampleQueries.shuffleShardPerm]]'s `row_number`
    * column — the only producer of this stream), strictly increasing
    * per shard across triggers. The fresh-state sentinel `lastPos = 0`
    * relies on 1-based ranks; a 0-based producer would trip the
    * ordering require on its FIRST row, so the contract is checked,
    * not silently mis-packed.
    */
  def packStream(rows: DataFrame)(implicit spark: SparkSession)
  : Dataset[PackedOut] = packStream(rows, graft.ops.PackingQueries.ArtifactBudget)

  def packStream(rows: DataFrame, budget: Int)(implicit spark: SparkSession)
  : Dataset[PackedOut] = {
    import spark.implicits._
    rows.select(col("shard").cast("int").as("shard"),
        col("pos").cast("long").as("pos"),
        col("doc_id").cast("long").as("doc_id"),
        when(col("doc_id") === FlushDocId,
          array().cast("array<string>"))
          .otherwise(TextFunctions.tokens(col("text"))).as("toks"))
      .as[PackIn]
      .groupByKey(_.shard)
      .flatMapGroupsWithState[PackState, PackedOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (shard, it, state: GroupState[PackState]) =>
          // iterator order within a trigger is unspecified: sort the
          // slice (bounded by the micro-batch) to restore stream order
          val slice = it.toVector.sortBy(_.pos)
          var st = state.getOption
            .getOrElse(PackState(0L, Vector.empty, Vector.empty, 0L))
          val out = Vector.newBuilder[PackedOut]
          slice.foreach { r =>
            if (r.doc_id == FlushDocId) {
              st = drain(shard, st, budget, force = true, out)
            } else {
              require(r.pos >= 1,
                s"shard $shard: pos ${r.pos} — positions are the 1-BASED " +
                  "shuffleShardPerm row_number ranks (0-based input " +
                  "would silently shift the stream contract)")
              require(r.pos > st.lastPos,
                s"shard $shard: pos ${r.pos} arrived after ${st.lastPos} — " +
                  "permutation stream must be position-ordered across triggers")
              val start = st.toks.size.toLong
              st = PackState(st.nextSeq, st.toks ++ r.toks,
                st.pieces :+ PackPiece(r.doc_id, start, start + r.toks.size),
                r.pos)
              st = drain(shard, st, budget, force = false, out)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
