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
             |""".stripMargin)),

    // aspect-preserving resize plumbing over decoded metadata —
    // integer math end to end, so the oracle replays it exactly
    "q_multimodal_resize" -> Q(
      (s, d) => {
        val assets = Multimodal.asAssets(t(s, d, "documents"),
          "doc_id", "text")
        val meta = Multimodal.decodeMeta(s, assets)
        Multimodal.resize(s, meta, maxDim = 256L).toDF()
      },
      Some("""WITH meta AS (
             |  SELECT doc_id AS asset_id,
             |    64 + octet_length(encode(text)) % 1024 AS w,
             |    64 + (octet_length(encode(text)) * 7) % 1024 AS h
             |  FROM documents),
             |r AS (
             |  SELECT asset_id, w AS width, h AS height,
             |    CASE WHEN greatest(w, h) <= 256 THEN w
             |         ELSE w * 256 // greatest(w, h) END AS out_w,
             |    CASE WHEN greatest(w, h) <= 256 THEN h
             |         ELSE h * 256 // greatest(w, h) END AS out_h
             |  FROM meta)
             |SELECT asset_id, width, height, out_w, out_h,
             |       out_w * out_h * 3 AS out_bytes
             |FROM r
             |""".stripMargin)),

    // feature extraction over raw payload bytes: byte stats, rolling
    // content hash (polyHash fold), 4-bin byte histogram — the
    // fixed-dim feature contract a real extractor would fill
    "q_multimodal_features" -> Q(
      (s, d) => {
        val assets = Multimodal.asAssets(t(s, d, "documents"),
          "doc_id", "text")
        Multimodal.extractFeatures(s, assets).toDF()
      },
      // text is ASCII (verified), so per-character codepoints == bytes
      Some("""WITH cs AS (
             |  SELECT doc_id,
             |    list_transform(string_split(text, ''), c -> ascii(c)) AS bs
             |  FROM documents)
             |SELECT doc_id AS asset_id,
             |  len(bs) AS n_bytes,
             |  CASE WHEN len(bs) = 0 THEN 0
             |       ELSE CAST(list_sum(bs) AS BIGINT) // len(bs) END
             |    AS mean_byte,
             |  list_reduce(list_prepend(7, bs),
             |              (a, b) -> (a * 31 + b) % 1048576) AS content_hash,
             |  len(list_filter(bs, b -> b % 4 = 0)) AS h0,
             |  len(list_filter(bs, b -> b % 4 = 1)) AS h1,
             |  len(list_filter(bs, b -> b % 4 = 2)) AS h2,
             |  len(list_filter(bs, b -> b % 4 = 3)) AS h3
             |FROM cs
             |""".stripMargin))
  )
}
