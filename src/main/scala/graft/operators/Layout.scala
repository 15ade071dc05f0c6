package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton-curve) clustered layout — the multi-column data
  * layout pass a 100 TB lakehouse runs so that scans filtering on ANY
  * of the clustered columns skip most files/row-groups via parquet
  * min/max statistics. A single-column sort gives perfect pruning on
  * one column and none on the others; interleaving the bits of
  * several columns' ranks gives each column locality proportional to
  * its bit share.
  *
  * Reference frame: the reference partitions topics by ONE key and
  * relies on that for locality (SystemStreamPartition — one
  * partitioning per stream). Z-order is the batch-lakehouse
  * generalization this engine adds for multi-predicate scan pruning;
  * same spirit as the date-time Bucketer's layout-for-reads
  * (samza-hdfs/src/main/scala/org/apache/samza/system/hdfs/writer/Bucketer.scala:1).
  *
  * Everything here is built from codegen'd built-ins (width_bucket,
  * shiftleft/right, bitwise and/or, xxhash64) — no UDF, no custom
  * expression; the z-value computation rides whole-stage codegen and
  * the only exchange is the RANGE partition on the z-value that the
  * write needs anyway to form sized, sorted files. */
object Layout {

  /** Bits of z-value rank per clustered column: 2 cols → 16 bits
    * each, 3 → 16, 4 → 12, capped so the interleaved value stays
    * within a signed Long's 63 usable bits. */
  def bitsFor(nCols: Int): Int = math.min(16, 63 / nCols)

  /** Per-column rank in [0, 2^bits): numeric/date/timestamp columns
    * get a LINEAR min-max bucket (width_bucket — preserves range
    * locality, so range predicates prune); string/binary columns get
    * a HASH bucket (xxhash64 — clusters equal values, so equality
    * predicates prune; ranges on strings do not). Nulls rank 0.
    * min/max must be the column's actual bounds (collected once by
    * [[zorderWrite]]); a degenerate column (min==max) ranks 0. */
  private def rankCol(c: Column, dt: DataType, mn: Double, mx: Double,
      bits: Int): Column = {
    val nb = 1 << bits
    dt match {
      case _: StringType | _: BinaryType =>
        pmod(xxhash64(c), lit(nb.toLong)).cast(LongType)
      case _ =>
        val d = numericAsDouble(c, dt)
        val bucket =
          if (mx > mn)
            least(width_bucket(d, lit(mn), lit(mx), lit(nb)), lit(nb)) - 1
          else lit(0L)
        coalesce(bucket.cast(LongType), lit(0L))
    }
  }

  private def numericAsDouble(c: Column, dt: DataType): Column = dt match {
    case _: TimestampType | _: TimestampNTZType => unix_micros(c).cast(DoubleType)
    case _: DateType => datediff(c, lit(java.sql.Date.valueOf("1970-01-01")))
      .cast(DoubleType)
    case _ => c.cast(DoubleType)
  }

  /** Interleave the low `bits` bits of each rank column: bit j of
    * column i lands at position j*n + i (Morton order). Pure
    * shift/mask/or expression tree — n*bits terms, all codegen'd,
    * constant-folded where possible. */
  private def interleave(ranks: Seq[Column], bits: Int): Column = {
    val n = ranks.size
    val terms = for {
      (r, i) <- ranks.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(r, j).bitwiseAND(lit(1L)), j * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The z-value column for `cols` given each column's (min, max)
    * bounds. Exposed for tests; [[zorderWrite]] collects the bounds
    * and drives the write. */
  def zValue(df: DataFrame, cols: Seq[String],
      bounds: Map[String, (Double, Double)]): Column = {
    val bits = bitsFor(cols.size)
    val ranks = cols.map { name =>
      val dt = df.schema(name).dataType
      val (mn, mx) = bounds.getOrElse(name, (0.0, 0.0))
      rankCol(col(name), dt, mn, mx, bits)
    }
    interleave(ranks, bits)
  }

  /** Write `df` as parquet clustered on the Morton curve of `cols`.
    *
    * One small agg collects per-column min/max (string columns need
    * none — hash-ranked), one range exchange partitions by z-value
    * into `Sinks.writeSizedParquet`-style target-sized files, and a
    * within-partition sort orders rows along the curve so parquet
    * row-group min/max stats are tight on EVERY clustered column.
    * Cost at 100 TB: the same single shuffle + sort any sized write
    * pays; the curve layout is free on top and amortizes over every
    * downstream multi-predicate scan. Returns the file count.
    *
    * Caveats (documented, not silent): ranks are computed from the
    * GLOBAL min/max, so a later append with drifted bounds degrades
    * clustering (rewrite or re-cluster periodically — same contract
    * as any OPTIMIZE ZORDER); heavy skew on one clustered column
    * concentrates its rank buckets (the range exchange still balances
    * ROWS per file — AQE-independent — only pruning selectivity on
    * that column suffers). */
  def zorderWrite(df: DataFrame, path: String, cols: Seq[String],
      targetFileBytes: Long = 128L << 20, numFiles: Int = 0): Int = {
    require(cols.nonEmpty && cols.size <= 4,
      s"zorderWrite clusters 1-4 columns, got ${cols.size}")
    val numericCols = cols.filter { n =>
      df.schema(n).dataType match {
        case _: StringType | _: BinaryType => false
        case _ => true
      }
    }
    val bounds: Map[String, (Double, Double)] =
      if (numericCols.isEmpty) Map.empty
      else {
        val aggs = numericCols.flatMap { n =>
          val d = numericAsDouble(col(n), df.schema(n).dataType)
          Seq(min(d).as(s"__mn_$n"), max(d).as(s"__mx_$n"))
        }
        val r = df.agg(aggs.head, aggs.tail: _*).head()
        numericCols.zipWithIndex.map { case (n, i) =>
          def v(k: Int): Double = if (r.isNullAt(k)) 0.0
            else r.getDouble(k)
          n -> (v(2 * i), v(2 * i + 1))
        }.toMap
      }
    val z = zValue(df, cols, bounds)
    val n = if (numFiles > 0) numFiles
      else graft.sources.Sinks.plannedFileCount(df, targetFileBytes)
    df.withColumn("__zval", z)
      .repartitionByRange(n, col("__zval"))
      .sortWithinPartitions(col("__zval"))
      .drop("__zval")
      .write.mode(SaveMode.Overwrite).parquet(path)
    n
  }

  /** Small-file compaction of a flat parquet directory — the
    * OPTIMIZE/bin-packing maintenance pass every incremental store in
    * this engine eventually needs: the append paths (CorpusProfile,
    * MinhashIndex, IVF/IVF-PQ ingest, annLookupStream batch outputs)
    * each add O(batch) files per batch by design, and a year of
    * batches turns every read into a small-file listing storm. Sized
    * from the ACTUAL on-disk byte count (a directory listing — no
    * stats estimate to poison, unlike plannedFileCount's plan-stats
    * path, which exists for frames with no backing files yet).
    *
    * Two modes: with `zorderCols` the rewrite re-clusters through
    * [[zorderWrite]] (fresh bounds — this is also the documented
    * remedy for bound drift after appends); without, the rewrite is a
    * shuffle-free `coalesce` that merges input files, preserving
    * within-file row order. Honest sizing/ordering limits of the
    * coalesce mode: the output file count is
    * min(ceil(bytes/target), scan partitions) — Spark packs small
    * files into ~`spark.sql.files.maxPartitionBytes` read partitions,
    * so a `targetFileBytes` far below that packs up to the scan's
    * granularity instead (files land near the conf value, never above
    * ceil-many); and packing order is size-driven, not name-adjacent,
    * so a clustered layout's merged-file min/max can coarsen beyond
    * neighbor-merging. When pruning granularity after compaction
    * matters, pass `zorderCols` (numeric/temporal range clustering) or
    * use a store-specific SORTED compactor (lexicographic string keys:
    * `TextProfile.bm25IndexCompact` — zorderWrite hash-ranks strings,
    * which equality-prunes but cannot tighten string min/max).
    *
    * Crash-safe and append-aware: the rewrite stages next to the
    * target and swaps in via [[graft.core.FsUtil.swapInto]] (readers
    * never observe a half-compacted dir; a crash leaves the original
    * intact). Compaction of a LIVE append target requires quiescing
    * the appender (single-writer-per-dir — the same contract as
    * CorpusProfile.compact); as a backstop, the file listing is
    * re-checked after staging fully materializes and the compact
    * ABORTS (original untouched, staging reaped) if the target
    * changed underneath — shrinking the undetected-append window to
    * the swap's rename section. Hive-partitioned layouts (batch_id=N
    * subdirs) go through [[compactPartitioned]]. Returns
    * (filesBefore, filesAfter). */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetFileBytes: Long = 128L << 20,
      zorderCols: Seq[String] = Nil, minFiles: Int = -1): (Int, Int) = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def listing = fs.listStatus(new Path(path)).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(f => (f.getPath.getName, f.getLen)).sortBy(_._1)
    val files = listing
    require(files.nonEmpty,
      s"compact: no parquet files directly under $path (hive-" +
        "partitioned dirs go through compactPartitioned)")
    val bytes = files.map(_._2).sum
    // floor at scan parallelism (the writeSizedParquet minFiles
    // lesson: a size-accurate-but-single file serializes every later
    // scan — measured 914 s vs 147 s on the BM25 posting table), but
    // never INCREASE the file count: compacting 5 tiny files into 32
    // tinier ones would recreate the small-file problem this pass
    // exists to fix. minFiles = -1 resolves to defaultParallelism;
    // per-partition callers (compactPartitioned) pass 1 — cross-leaf
    // parallelism already covers their scans.
    val floor = math.min(files.size,
      if (minFiles >= 0) math.max(1, minFiles)
      else spark.sparkContext.defaultParallelism)
    val n = math.max(floor,
      math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(path)
    graft.core.FsUtil.swapInto(fs, new Path(path)) { staging =>
      if (zorderCols.nonEmpty)
        zorderWrite(df, staging.toString, zorderCols, targetFileBytes,
          numFiles = n)
      else
        df.coalesce(n).write.mode(SaveMode.Overwrite)
          .parquet(staging.toString)
      // concurrent-append backstop: everything above read the
      // SNAPSHOT listing; an append that landed meanwhile would be
      // deleted by the swap below. Abort instead — swapInto reaps the
      // staging dir and the target (including the new append) stays
      // intact. The remaining unguarded window is the ms-scale rename
      // section; a live appender still requires quiescing.
      if (listing != files)
        throw new java.io.IOException(
          s"compact: $path changed during compaction (concurrent " +
            "append?) — aborted with the target untouched; quiesce " +
            "appenders and retry")
    }
    val after = fs.listStatus(new Path(path)).count(f =>
      f.isFile && f.getPath.getName.endsWith(".parquet"))
    (files.size, after)
  }

  /** [[compact]] over a hive-partitioned layout (`name=value`
    * subdirs — e.g. `annLookupStream`'s `batch_id=<id>` outputs,
    * including MULTI-LEVEL layouts like `date=…/hour=…`): partition
    * dirs are discovered recursively down to the LEAF dirs that
    * actually hold parquet files, and each leaf compacts
    * independently under its own crash-safe swap — the partition
    * columns survive untouched (discovery reads them from the path,
    * which never changes) and a crash mid-run leaves every partition
    * either original or fully compacted, never mixed. Leaf dirs with
    * no parquet files (e.g. just a _SUCCESS marker) are skipped.
    * Returns per-partition (filesBefore, filesAfter), keyed by the
    * partition path relative to the root. */
  def compactPartitioned(spark: org.apache.spark.sql.SparkSession,
      rootPath: String, targetFileBytes: Long = 128L << 20,
      zorderCols: Seq[String] = Nil): Map[String, (Int, Int)] = {
    val parts = partitionLeaves(spark, rootPath)
    require(parts.nonEmpty && parts.forall(_._1.nonEmpty),
      s"compactPartitioned: no name=value partition dirs holding " +
        s"parquet under $rootPath (flat dirs go through compact)")
    parts.map { case (rel, p) =>
      // minFiles = 1 per leaf: partitions scan in parallel ACROSS
      // leaves, so the single-file-serialization hazard the flat-dir
      // floor guards against doesn't apply within one
      rel -> compact(spark, p.toString, targetFileBytes, zorderCols,
        minFiles = 1)
    }.toMap
  }

  /** The leaf partition dirs of a hive-partitioned layout: descend
    * through `name=value` levels; a dir is a LEAF when it holds
    * parquet files directly (deeper name=value dirs under a
    * parquet-bearing dir would be a malformed layout — not expected
    * from any writer here). Keys are partition paths relative to the
    * root. Shared by [[compactPartitioned]] and the maintenance
    * pass's per-leaf drift gate (`Maintenance.compactAll` compacts
    * only the leaves that drifted — compacting every leaf would
    * rewrite an idle store wholesale on every run). */
  def partitionLeaves(spark: org.apache.spark.sql.SparkSession,
      rootPath: String)
      : Seq[(String, org.apache.hadoop.fs.Path)] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(rootPath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def leaves(p: Path, rel: String): Seq[(String, Path)] = {
      val entries = fs.listStatus(p).toSeq
      if (entries.exists(f => f.isFile &&
          f.getPath.getName.endsWith(".parquet")))
        Seq(rel -> p)
      else entries
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
        .flatMap { s =>
          val name = s.getPath.getName
          leaves(s.getPath,
            if (rel.isEmpty) name else s"$rel/$name")
        }
    }
    leaves(new Path(rootPath), "")
  }
}
