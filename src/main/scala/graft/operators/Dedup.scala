package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Deduplication operators for large-scale corpus pipelines: exact,
  * n-gram Jaccard, MinHash+LSH, and SimHash.
  *
  * Scale design (the point of each algorithm at 100 TB):
  *  - exact: one hash-shuffle on a 32-char digest — the minimum
  *    possible; never shuffles document text, only (digest, id).
  *  - jaccard: inverted-index self-join on shingles (shuffle keyed by
  *    shingle), so cost is Σ postings², not n² documents. Hot shingles
  *    are the skew risk — AQE skew-join handles it; a stopword-shingle
  *    filter is the structural fix if needed.
  *  - MinHash+LSH: fixed-size signatures (numHashes minhashes) replace
  *    shingle sets, then banding buckets candidates; only candidate
  *    pairs are verified with true Jaccard. This is the linear-ish
  *    scale path.
  *  - SimHash: constant-size (bits-wide) signature per document;
  *    near-dup = small Hamming distance.
  *
  * All signature computation is Spark SQL higher-order functions
  * (codegen'd); hashes are md5-based so they are reproducible across
  * engines and runs — no JVM hashCode dependence.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per identical-text group.
    * Returns (id, digest, copies). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(col(textCol)).as("digest"))
      .groupBy(col("digest"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("copies"))
      .select(col(idCol), col("digest"), col("copies"))

  /** Distinct (id, shingle) pairs — the inverted-index input. Tokens
    * are materialized as a column BEFORE shingling (see
    * TextFunctions.shinglesOfTokens' performance note). */
  def shingleIndex(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol), tokens(col(textCol)).as("__w"))
      .select(col(idCol), explode(shinglesOfTokens(col("__w"), n)).as("shingle"))
      .distinct()

  /** All-pairs n-gram Jaccard via inverted index: pairs of documents
    * with jaccard >= threshold. Returns (id_a, id_b, jaccard) with
    * id_a < id_b. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    // the index feeds three consumers (sizes + both join sides): persist
    // it — in a production pipeline this is a materialized intermediate
    // table, not a recomputed scan. Lifecycle note: the cache outlives
    // this call (the result DataFrame still references it); callers that
    // loop over many corpora should spark.catalog.clearCache() between
    // runs, as Verify/Bench do.
    val idx = shingleIndex(df, idCol, textCol, n).persist()
    val sizes = idx.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val a = idx.select(col(idCol).as("id_a"), col("shingle"))
    val b = idx.select(col(idCol).as("id_b"), col("shingle"))
    val shared = a.join(b, "shingle")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard", round(col("shared").cast("double") /
        (col("sz_a") + col("sz_b") - col("shared")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash modulus (2^20) — matches TextFunctions.polyHash's range. */
  val MinhashMod: Int = 1 << 20

  /** Universal-hash family member k applied to a base shingle hash:
    * h_k(x) = (a_k·x + b_k) mod m with odd a_k. ONE polynomial hash per
    * shingle plus K cheap arithmetic transforms — computing K
    * independent digests per shingle (e.g. K md5s) costs ~K× more and
    * dominated the whole pipeline before this. */
  private def universal(h: Column, k: Int): Column =
    (h * (2 * k + 1) + (97 * k + 31)) % MinhashMod

  private def minhashCol(k: Int): Column =
    min(universal(col("sh_h"), k)).as(s"mh_$k")

  /** MinHash signatures from an existing shingle index (one row per id,
    * numHashes minhash columns). */
  def minhashSignaturesOfIndex(idx: DataFrame, idCol: String,
      numHashes: Int): DataFrame =
    idx.withColumn("sh_h", polyHash(col("shingle"), 7, 20))
      .groupBy(col(idCol))
      .agg(minhashCol(0), (1 until numHashes).map(minhashCol): _*)

  /** MinHash signatures from raw text. Documents with no shingles are
    * dropped (nothing to sign). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int): DataFrame =
    minhashSignaturesOfIndex(shingleIndex(df, idCol, textCol, n), idCol,
      numHashes)

  /** MinHash + LSH banding: candidate pairs from band-signature buckets,
    * then verified with true n-gram Jaccard. rowsPerBand minhashes are
    * concatenated per band; a pair is a candidate if ANY band matches.
    * Returns (id_a, id_b, jaccard) with jaccard >= threshold, id_a<id_b. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, rowsPerBand: Int,
      threshold: Double): DataFrame = {
    require(numHashes % rowsPerBand == 0, "bands must tile the signature")
    val numBands = numHashes / rowsPerBand
    // ONE aggregation computes everything per document — the minhash
    // signature, the shingle set (for verification) and its size — so
    // the pipeline pays a single shuffle over the shingle index before
    // the (tiny) candidate joins. Set sizes are bounded by document
    // length, so collect_set stays safe at scale.
    val idx = shingleIndex(df, idCol, textCol, n)
      .withColumn("sh_h", polyHash(col("shingle"), 7, 20))
    val aggCols = (0 until numHashes).map(minhashCol) :+
      collect_set(col("shingle")).as("sh_set")
    val docAgg = idx.groupBy(col(idCol))
      .agg(aggCols.head, aggCols.tail: _*)
      .withColumn("sz", size(col("sh_set")).cast("long"))
      .persist()
    // one pass computes every band key (explode of an array literal);
    // building each band as its own select would recompute the
    // signature pipeline once per band per join side
    val bandArray = array((0 until numBands).map { b =>
      val cols = (0 until rowsPerBand)
        .map(r => col(s"mh_${b * rowsPerBand + r}"))
      concat_ws("|", lit(b.toString) +: cols: _*)
    }: _*)
    val bands = docAgg.select(col(idCol), explode(bandArray).as("band_key"))
    val l = bands.select(col(idCol).as("id_a"), col("band_key"))
    val r = bands.select(col(idCol).as("id_b"), col("band_key"))
    val candidates = l.join(r, "band_key")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // verify candidates with true jaccard via set intersection — only
    // candidate pairs pay this cost
    val aSide = docAgg.select(col(idCol).as("id_a"),
      col("sh_set").as("set_a"), col("sz").as("sz_a"))
    val bSide = docAgg.select(col(idCol).as("id_b"),
      col("sh_set").as("set_b"), col("sz").as("sz_b"))
    candidates.join(aSide, "id_a").join(bSide, "id_b")
      .withColumn("shared",
        size(array_intersect(col("set_a"), col("set_b"))).cast("long"))
      .withColumn("jaccard", round(col("shared").cast("double") /
        (col("sz_a") + col("sz_b") - col("shared")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash over word unigrams with `bits`-wide polynomial hashes:
    * bit b of the signature is set iff more word-hashes have bit b set
    * than clear. Returns (id, simhash). */
  def simhash(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 20): DataFrame = {
    val hashes = df.select(col(idCol),
      transform(tokens(col(textCol)), w => polyHash(w, 7, bits)).as("hs"))
    // per-bit majority vote, folded into a single integer
    val sig = (0 until bits).map { b =>
      val votes = aggregate(col("hs"), lit(0),
        (acc, h) => acc + when(shiftright(h, b) % 2 === 1, 1).otherwise(-1))
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    hashes.select(col(idCol), sig.as("simhash"))
  }
}
