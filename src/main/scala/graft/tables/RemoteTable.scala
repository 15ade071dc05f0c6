package graft.tables

import java.util.concurrent.{ConcurrentHashMap, Executors, TimeUnit}

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future, Promise}

import org.apache.spark.sql.{Dataset, Encoder}

/** Remote-table lookup join with the reference's composable wrappers:
  * rate limiting (table/ratelimit/AsyncRateLimitedTable.java), retries
  * (table/retry/AsyncRetriableTable.java), read-through caching
  * (table/caching/CachingTable.java), and batching
  * (table/batching/AsyncBatchingTable.java).
  *
  * Spark shape: a mapPartitions stage — one client + cache + rate
  * limiter per partition (per executor-core), async lookups launched
  * `batchSize` at a time and drained in order. This is SURVEY §4.3's
  * "one genuinely custom physical piece": there is no Catalyst operator
  * for per-row remote I/O, and hiding it in mapPartitions keeps the
  * surrounding plan declarative.
  */
object RemoteTable {

  /** The async lookup SPI (AsyncReadWriteUpdateTable.getAsync). */
  trait AsyncReader[K, V] extends Serializable {
    def getAsync(key: K)(implicit ec: ExecutionContext): Future[Option[V]]
  }

  final case class LookupConfig(
      batchSize: Int = 64,          // concurrent in-flight lookups
      maxRetries: Int = 3,          // AsyncRetriableTable
      retryBackoffMs: Long = 10,
      ratePermitsPerSec: Int = 0,   // 0 = unlimited (AsyncRateLimitedTable)
      cacheSize: Int = 10000,       // CachingTable (read-through)
      timeout: Duration = Duration("30s"))

  /** Shared timer for retry backoff (AsyncRetriableTable's retry
    * scheduling). One small daemon pool per executor JVM: it only runs
    * `schedule` callbacks that re-launch lookups, never the lookups
    * themselves, so 2 threads serve any number of concurrent backoffs.
    * Sleeping on the ExecutionContext instead (the old shape) parked a
    * worker thread per backing-off key and stalled unrelated lookups. */
  private lazy val retryTimer = Executors.newScheduledThreadPool(2, r => {
    val t = new Thread(r, "graft-remote-table-retry")
    t.setDaemon(true)
    t
  })

  /** Complete with `f`, started after `delayMs` — without blocking any
    * caller or EC thread. */
  private def after[A](delayMs: Long)(f: => Future[A]): Future[A] = {
    val p = Promise[A]()
    retryTimer.schedule(new Runnable {
      override def run(): Unit = p.completeWith(f)
    }, delayMs, TimeUnit.MILLISECONDS)
    p.future
  }

  /** Simple token-bucket rate limiter, one per partition. */
  private final class TokenBucket(permitsPerSec: Int) {
    private var allowance = permitsPerSec.toDouble
    private var last = System.nanoTime()
    def acquire(): Unit = if (permitsPerSec > 0) synchronized {
      while ({
        val now = System.nanoTime()
        allowance = math.min(permitsPerSec.toDouble,
          allowance + (now - last) * 1e-9 * permitsPerSec)
        last = now
        allowance < 1.0
      }) Thread.sleep(1)
      allowance -= 1.0
    }
  }

  /** Lookup-join `ds` against a remote table: per row, key = keyFn(row),
    * output (row, value-option). Inner-vs-left is the caller's filter on
    * the Option — the same contract as StreamTableJoinFunction returning
    * null (StreamTableJoinOperatorImpl.java:76-80). */
  def lookupJoin[T, K, V](ds: Dataset[T], keyFn: T => K,
      reader: AsyncReader[K, V], cfg: LookupConfig = LookupConfig())(
      implicit enc: Encoder[(T, Option[V])]): Dataset[(T, Option[V])] =
    ds.mapPartitions(rows => lookupIterator(rows, keyFn, reader, cfg))

  /** The per-partition lookup pipeline shared by the typed
    * [[lookupJoin]] and the SQL-surface Row stage
    * (graft.sql.RemoteSql): one cache + rate limiter per partition,
    * `batchSize` lookups in flight, drained in input order. */
  private[graft] def lookupIterator[T, K, V](rows: Iterator[T], keyFn: T => K,
      reader: AsyncReader[K, V], cfg: LookupConfig): Iterator[(T, Option[V])] = {
    implicit val ec: ExecutionContext = ExecutionContext.global
    val cache = new ConcurrentHashMap[K, Option[V]]()
    val bucket = new TokenBucket(cfg.ratePermitsPerSec)

    def getWithRetry(key: K, attempt: Int = 0): Future[Option[V]] =
      reader.getAsync(key).recoverWith {
        case _ if attempt < cfg.maxRetries =>
          // exponential backoff on the shared timer — the EC thread
          // returns to the pool, concurrent lookups keep flowing
          after(cfg.retryBackoffMs << attempt)(getWithRetry(key, attempt + 1))
      }

    rows.grouped(cfg.batchSize).flatMap { batch =>
      val futs = batch.map { row =>
        val k = keyFn(row)
        val cached = cache.get(k)
        if (cached != null) (row, Future.successful(cached))
        else {
          bucket.acquire()
          (row, getWithRetry(k).map { v =>
            if (cache.size < cfg.cacheSize) cache.put(k, v)
            v
          })
        }
      }
      futs.map { case (row, fu) => (row, Await.result(fu, cfg.timeout)) }
    }
  }
}
