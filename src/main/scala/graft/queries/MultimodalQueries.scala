package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import QHelp._

/** Multimodal (binary-payload) plumbing queries. The codec is a
  * deterministic STUB (see Multimodal.FakeCodec) — the oracle verifies
  * the real Spark-side plumbing: binary encode, partition-batched
  * decode shape, metadata schema, and the frame-sampling fan-out.
  */
object MultimodalQueries extends QueryPack {

  override def queries: Map[String, Q] = Map(

    "q_multimodal_decode_meta" -> Q(
      (s, d) => {
        val assets = Multimodal.asAssets(t(s, d, "documents"),
          "doc_id", "text")
        Multimodal.decodeMeta(s, assets).toDF()
      },
      Some("""SELECT doc_id AS asset_id,
             |  octet_length(encode(text)) AS byte_len,
             |  lower(substr(hex(encode(text)), 1, 8)) AS magic,
             |  64 + octet_length(encode(text)) % 1024 AS width,
             |  64 + (octet_length(encode(text)) * 7) % 1024 AS height,
             |  1 + octet_length(encode(text)) % 30 AS frames
             |FROM documents
             |""".stripMargin)),

    "q_multimodal_frame_sample" -> Q(
      (s, d) => {
        val assets = Multimodal.asAssets(t(s, d, "documents"),
          "doc_id", "text")
        val meta = Multimodal.decodeMeta(s, assets).toDF()
        Multimodal.sampleFrames(meta, every = 7)
      },
      Some("""WITH meta AS (
             |  SELECT doc_id AS asset_id,
             |    1 + octet_length(encode(text)) % 30 AS frames
             |  FROM documents)
             |SELECT asset_id, frames,
             |  unnest(range(0, frames, 7)) AS frame_idx
             |FROM meta
             |""".stripMargin))
  )
}
