package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Streaming near-duplicate detection at ingest: MinHash+LSH with the
  * band buckets held as OPERATOR STATE, so every arriving document is
  * checked against the corpus seen so far and verified pairs are
  * emitted the moment the duplicate lands — the shape a continuous
  * crawl pipeline needs (detect-at-ingest), vs the batch
  * [[graft.operators.Dedup.minhashLshPairs]] re-scan.
  *
  * Reference frame: this is the reference's per-key local state store
  * discipline (samza-kv/src/main/java/org/apache/samza/storage/kv/KeyValueStore.java:1)
  * applied to LSH buckets — the stream is partitioned by band key
  * exactly as Samza partitions by message key, and each task's store
  * holds only its bands' documents.
  *
  * EXACT agreement with the batch pair set: signatures and band keys
  * come from the same codegen expressions and
  * [[graft.operators.Dedup.bandArrayCol]] scheme, and a pair is
  * emitted only from its MINIMAL matching band — each stored document
  * carries its full signature, so any band group can decide locally
  * whether a lower band already collides for this pair. That makes
  * cross-band dedup exact WITHOUT a second stateful stage (no global
  * distinct), and when documents arrive in id order the emitted set
  * is exactly the batch `minhashLshPairs` output (q_stream_neardup's
  * oracle is literally the batch oracle).
  *
  * 100 TB shape: band state is the reusable MinHash index
  * ([[graft.operators.Dedup.MinhashIndex]]) in streaming form — per-band
  * occupancy is the same quantity the maxPostings sub-bucketing
  * bounds in batch; hot bands are hot keys and salt the same way. The
  * parity harness runs NoTimeout; a production deployment bounds
  * state with `stateTtl` (event-horizon eviction, the same
  * bounded-state discipline as the corpus-clean horizon variant). */
object StreamDedup {

  /** One (document, band) occurrence flowing into the stateful op. */
  final case class BandDoc(id: Long, shSet: Seq[String], sig: Seq[Long],
      bandIdx: Int, bandKey: String)

  /** What a band bucket remembers per document: id + full signature
    * (for the minimal-band check) + shingle set (for exact Jaccard
    * verification on arrival). */
  final case class StoredDoc(id: Long, sig: Seq[Long], shSet: Seq[String])

  final case class PairHit(id_a: Long, id_b: Long, jaccard: Double)

  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue

  /** Near-dup pairs over a STREAMING (id, text) frame. Emits
    * (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 4dp
    * and >= threshold — the batch contract, verified per arrival.
    * `stateTtl` > 0 arms a processing-time timeout that drops a
    * band's bucket after that idle period (production bound; leave 0
    * under the parity harness, whose no-data batches must not spin). */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, rowsPerBand: Int, threshold: Double,
      stateTtl: Long = 0L): DataFrame = {
    require(numHashes % rowsPerBand == 0, "bands must tile the signature")
    val numBands = numHashes / rowsPerBand
    val spark = df.sparkSession
    import spark.implicits._

    val signed = Dedup.shingleSets(df, idCol, textCol, n)
      .withColumn("sig", Dedup.minhashSigCol(col("sh_set"), numHashes))
    val banded = signed
      .select(col(idCol).cast("long").as("id"),
        col("sh_set").as("shSet"), col("sig"),
        posexplode(Dedup.bandArrayCol(numHashes, rowsPerBand)))
      .withColumnRenamed("pos", "bandIdx")
      .withColumnRenamed("col", "bandKey")
      .as[BandDoc]

    def process(key: String, values: Iterator[BandDoc],
        state: GroupState[Seq[StoredDoc]]): Iterator[PairHit] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      var stored = state.getOption.getOrElse(Seq.empty)
      val out = Seq.newBuilder[PairHit]
      // id order: groupByKey does not preserve cross-partition arrival
      // order within a micro-batch, and "seen so far" must be
      // deterministic for the parity oracle
      values.toSeq.sortBy(_.id).foreach { b =>
        if (!stored.exists(_.id == b.id)) {
          stored.foreach { a =>
            // minimal matching band: both full signatures are at hand,
            // so this group can tell locally whether a lower band
            // already owns the pair
            val jstar = (0 until numBands).find { j =>
              (0 until rowsPerBand).forall(r =>
                a.sig(j * rowsPerBand + r) == b.sig(j * rowsPerBand + r))
            }
            if (jstar.contains(b.bandIdx)) {
              val sa = a.shSet.toSet
              val inter = b.shSet.count(sa)
              val jac = round4(inter.toDouble /
                (a.shSet.size + b.shSet.size - inter))
              if (jac >= threshold) {
                val (lo, hi) = if (a.id < b.id) (a.id, b.id) else (b.id, a.id)
                out += PairHit(lo, hi, jac)
              }
            }
          }
          stored = stored :+ StoredDoc(b.id, b.sig, b.shSet)
        }
      }
      state.update(stored)
      if (stateTtl > 0L) state.setTimeoutDuration(stateTtl)
      out.result().iterator
    }

    val timeout =
      if (stateTtl > 0L) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded.groupByKey(_.bandKey)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(process)
      .toDF()
  }
}
