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

  /** Distinct (id, shingle) pairs — the inverted-index input. */
  def shingleIndex(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol), explode(wordShingles(col(textCol), n)).as("shingle"))
      .distinct()

  /** All-pairs n-gram Jaccard via inverted index: pairs of documents
    * with jaccard >= threshold. Returns (id_a, id_b, jaccard) with
    * id_a < id_b. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    val idx = shingleIndex(df, idCol, textCol, n)
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

  /** MinHash signature component h: min over shingles of md5(h || ':' ||
    * shingle). Minwise hashing over the md5-hex ordering — engine-stable
    * and uniform enough for banding. */
  private def minhashCol(h: Int): Column =
    min(md5(concat(lit(s"$h:"), col("shingle")))).as(s"mh_$h")

  /** MinHash signatures: one row per id, numHashes minhash columns.
    * Documents with no shingles are dropped (nothing to sign). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int): DataFrame =
    shingleIndex(df, idCol, textCol, n)
      .groupBy(col(idCol))
      .agg(minhashCol(0), (1 until numHashes).map(minhashCol): _*)

  /** MinHash + LSH banding: candidate pairs from band-signature buckets,
    * then verified with true n-gram Jaccard. rowsPerBand minhashes are
    * concatenated per band; a pair is a candidate if ANY band matches.
    * Returns (id_a, id_b, jaccard) with jaccard >= threshold, id_a<id_b. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, rowsPerBand: Int,
      threshold: Double): DataFrame = {
    require(numHashes % rowsPerBand == 0, "bands must tile the signature")
    val sig = minhashSignatures(df, idCol, textCol, n, numHashes)
    val numBands = numHashes / rowsPerBand
    val bands = (0 until numBands).map { b =>
      val cols = (0 until rowsPerBand)
        .map(r => col(s"mh_${b * rowsPerBand + r}"))
      sig.select(col(idCol),
        concat_ws("|", lit(b.toString) +: cols: _*).as("band_key"))
    }.reduce(_ union _)
    val l = bands.select(col(idCol).as("id_a"), col("band_key"))
    val r = bands.select(col(idCol).as("id_b"), col("band_key"))
    val candidates = l.join(r, "band_key")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // verify candidates with true jaccard (exact, but only on candidates)
    val idx = shingleIndex(df, idCol, textCol, n)
    val sizes = idx.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val a = idx.select(col(idCol).as("id_a"), col("shingle"))
    val b = idx.select(col(idCol).as("id_b"), col("shingle"))
    val shared = candidates.join(a, "id_a").join(b, Seq("id_b", "shingle"))
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
