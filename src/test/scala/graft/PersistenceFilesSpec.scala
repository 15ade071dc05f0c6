package graft

import graft.sources.Tables

/** Stored-probe scan parallelism for EVERY persistence unit: the sf10
  * forensics (BASELINE.md round 12) caught the BM25 posting table
  * landing as ONE size-accurate file, which serialized every stored
  * probe onto a single task (914 s vs 147 s fresh). The fix —
  * `Sinks.writeSizedParquet(..., minFiles = defaultParallelism)` —
  * initially covered only the BM25 writers; this spec pins the floor
  * for all six units' corpus-sized tables, so a writer regressing to
  * a plain coalesced write fails here instead of in the next sf10
  * forensics session. (Small sidecar tables — codebooks, strata, df
  * partials — are exempt: they are driver-small by construction.) */
class PersistenceFilesSpec extends SparkSpec {

  private def parts(dir: String, table: String): Int = {
    val d = new java.io.File(s"$dir/$table")
    assert(d.isDirectory, s"$d missing")
    d.listFiles().count(f => f.isFile && f.getName.endsWith(".parquet"))
  }

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-pfiles-$name")
      .toString + "/store"

  test("all six persistence units write their big table at >= scan parallelism files") {
    val s = spark
    val p = s.sparkContext.defaultParallelism
    assert(p > 1, "test session must be multi-core for this to bite")
    val docs = Tables.load(s, sf0001, "documents")
    val emb = Tables.load(s, sf0001, "embeddings")

    val mhDir = tmp("minhash")
    graft.operators.Dedup.writeMinhashIndex(
      graft.operators.Dedup.minhashIndex(docs, "doc_id", "text",
        n = 5, numHashes = 16, rowsPerBand = 4), mhDir)
    assert(parts(mhDir, "signed.parquet") >= p, "minhash signed")

    val ivfDir = tmp("ivf")
    graft.operators.Similarity.ivfIndex(emb, "vec_id", "embedding",
      nlist = 16).write(ivfDir)
    assert(parts(ivfDir, "assigned.parquet") >= p, "ivf assigned")

    val pqDir = tmp("pq")
    graft.operators.Similarity.pqIndex(emb, "vec_id", "embedding",
      dim = 64).write(pqDir)
    assert(parts(pqDir, "codes.parquet") >= p, "pq codes")

    val ivfpqDir = tmp("ivfpq")
    val ivfpq = graft.operators.Similarity.ivfPqIndex(emb, "vec_id",
      "embedding", dim = 64, nlist = 16)
    ivfpq.write(ivfpqDir)
    ivfpq.release()
    assert(parts(ivfpqDir, "codes.parquet") >= p, "ivfpq codes")

    val cpDir = tmp("profile")
    graft.operators.CorpusProfile.write(
      graft.operators.CorpusProfile.build(docs, "doc_id", "lang",
        "text"), cpDir)
    assert(parts(cpDir, "tokens.parquet") >= p, "profile tokens")

    val bmDir = tmp("bm25")
    graft.operators.TextProfile.bm25Index(docs, "doc_id", "text")
      .write(bmDir)
    assert(parts(bmDir, "postings.parquet") >= p, "bm25 postings")
  }
}
