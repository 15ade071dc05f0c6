package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.core.FsUtil

/** Crash-safety of the staged-swap helper behind the persistable
  * index writers: a failing staging write must leave the old target
  * untouched and no staging litter; a successful swap must leave
  * exactly the new content and no backup litter. */
class FsUtilSpec extends SparkSpec {

  private def fs = new Path("/tmp").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def listHidden(parent: java.io.File): Seq[String] =
    Option(parent.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith(".")).toSeq

  test("failed staging write keeps the old target and cleans staging") {
    val parent = Files.createTempDirectory("graft-fsutil").toFile
    val target = new Path(parent.toString, "idx")
    // seed an existing "index"
    FsUtil.swapInto(fs, target) { staging =>
      fs.mkdirs(staging)
      FsUtil.writeSidecar(fs, new Path(staging, "v"), "old")
    }
    intercept[RuntimeException] {
      FsUtil.swapInto(fs, target) { staging =>
        fs.mkdirs(staging)
        FsUtil.writeSidecar(fs, new Path(staging, "v"), "half-written")
        throw new RuntimeException("simulated write crash")
      }
    }
    // old index intact, no hidden staging/backup dirs leaked
    assert(FsUtil.readSidecar(fs, new Path(target, "v")).contains("old"))
    assert(listHidden(parent).isEmpty)
  }

  test("successful swap replaces content and leaves no backup") {
    val parent = Files.createTempDirectory("graft-fsutil").toFile
    val target = new Path(parent.toString, "idx")
    FsUtil.swapInto(fs, target) { staging =>
      fs.mkdirs(staging)
      FsUtil.writeSidecar(fs, new Path(staging, "v"), "one")
    }
    FsUtil.swapInto(fs, target) { staging =>
      fs.mkdirs(staging)
      FsUtil.writeSidecar(fs, new Path(staging, "v"), "two")
    }
    assert(FsUtil.readSidecar(fs, new Path(target, "v")).contains("two"))
    assert(listHidden(parent).isEmpty)
  }

  test("first write (no prior target) works and leaves no litter") {
    val parent = Files.createTempDirectory("graft-fsutil").toFile
    val target = new Path(parent.toString, "fresh")
    FsUtil.swapInto(fs, target) { staging =>
      fs.mkdirs(staging)
      FsUtil.writeSidecar(fs, new Path(staging, "v"), "x")
    }
    assert(FsUtil.readSidecar(fs, new Path(target, "v")).contains("x"))
    assert(listHidden(parent).isEmpty)
  }

  test("concurrent swaps serialize: consistent last-writer-wins, no litter") {
    val parent = Files.createTempDirectory("graft-fsutil").toFile
    val target = new Path(parent.toString, "idx")
    val f = fs // bind once; used from worker threads
    // each writer stamps BOTH files with its own tag; an interleaved
    // swap (possible pre-lock: local-fs rename onto an existing dir
    // nests INTO it) would show as a missing/mixed pair or a nested
    // hidden dir inside the target
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (1 to 4).map { w =>
      val th = new Thread(() => {
        try {
          (1 to 10).foreach { i =>
            FsUtil.swapInto(f, target) { staging =>
              f.mkdirs(staging)
              FsUtil.writeSidecar(f, new Path(staging, "a"), s"$w-$i")
              FsUtil.writeSidecar(f, new Path(staging, "b"), s"$w-$i")
            }
          }
        } catch { case t: Throwable => errors.add(t) }
      })
      th.start(); th
    }
    threads.foreach(_.join())
    assert(errors.isEmpty, s"writer failed: ${errors.peek()}")
    val a = FsUtil.readSidecar(fs, new Path(target, "a"))
    val b = FsUtil.readSidecar(fs, new Path(target, "b"))
    assert(a.isDefined && a == b, s"torn swap: a=$a b=$b")
    assert(listHidden(parent).isEmpty)
    // no writer's staging dir got nested inside the installed target
    assert(Option(new java.io.File(parent, "idx").listFiles())
      .getOrElse(Array.empty).forall(_.isFile))
  }

  test("writeSidecar replace is atomic: a hammering reader never sees the target absent or torn") {
    // round 19: the FileContext overwrite-rename on file:// delegates
    // to AbstractFileSystem.renameInternal's DELETE-then-rename
    // default, leaving a window where the target does not exist — a
    // concurrent Sinks.readTagged catching that window fell back to
    // the raw directory read and raced a stranded-file purge
    // (IngestSpec's concurrent serve test, under suite load). Local
    // targets must swap via POSIX rename(2): old content or new
    // content, NEVER absent, never torn.
    val parent = Files.createTempDirectory("graft-sidecar-atomic")
    val target = new Path(parent.toString, "manifest.json")
    def payload(i: Int) = s"""{"gen":$i,"pad":"${"x" * 64}"}"""
    FsUtil.writeSidecar(fs, target, payload(0))
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reads = new java.util.concurrent.atomic.AtomicLong(0L)
    val reader = new Thread(() => {
      while (!stop.get()) {
        FsUtil.readSidecar(fs, target) match {
          case None => bad.add("ABSENT")
          case Some(c) if !c.startsWith("""{"gen":""") ||
            !c.endsWith("\"}") => bad.add(s"TORN: $c")
          case _ => ()
        }
        reads.incrementAndGet()
        ()
      }
    }, "graft-sidecar-reader")
    reader.start()
    try (1 to 500).foreach(i => FsUtil.writeSidecar(fs, target, payload(i)))
    finally { stop.set(true); reader.join() }
    assert(bad.isEmpty, s"reader caught: ${bad.peek()}")
    assert(reads.get() >= 1, "reader never completed a probe")
    assert(FsUtil.readSidecar(fs, target).contains(payload(500)))
  }

  test("a non-contention lock-create failure raises immediately, not after the wait") {
    // a filesystem whose create fails PERSISTENTLY (read-only fs,
    // permission denied — not stageable on a root-owned local disk,
    // so simulated): must NOT be read as "another writer", and must
    // not spin the full lockWaitMs before surfacing. (Note Hadoop's
    // local fs reports even a file-where-a-dir-should-be as
    // FileAlreadyExistsException, so only a non-already-exists
    // IOException takes this path.)
    val failFs = new org.apache.hadoop.fs.RawLocalFileSystem {
      override def create(f: Path, overwrite: Boolean)
          : org.apache.hadoop.fs.FSDataOutputStream =
        throw new java.io.IOException("simulated: read-only filesystem")
    }
    failFs.setConf(new org.apache.hadoop.conf.Configuration())
    val parent = Files.createTempDirectory("graft-fsutil").toFile
    val lock = new Path(parent.toString, ".idx.swap-lock")
    val t0 = System.nanoTime()
    val e = intercept[java.io.IOException] {
      FsUtil.withSwapFileLock(failFs, lock, 10000L) {
        fail("body must not run")
      }
    }
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(e.getMessage.contains("other than contention"), e.getMessage)
    assert(elapsedMs < 5000, s"spun ${elapsedMs}ms on a persistent failure")
  }

  test("a held swap lock times out loudly, naming the lock file") {
    val parent = Files.createTempDirectory("graft-fsutil").toFile
    val target = new Path(parent.toString, "idx")
    val lock = new Path(parent.toString, ".idx.swap-lock")
    FsUtil.writeSidecar(fs, lock, "12345@elsewhere") // stale/held lock
    val e = intercept[java.io.IOException] {
      FsUtil.swapInto(fs, target, lockWaitMs = 200L) { staging =>
        fs.mkdirs(staging)
        FsUtil.writeSidecar(fs, new Path(staging, "v"), "x")
      }
    }
    assert(e.getMessage.contains("swap-lock"), e.getMessage)
    fs.delete(lock, false)
    // after manual lock removal the writer proceeds normally
    FsUtil.swapInto(fs, target) { staging =>
      fs.mkdirs(staging)
      FsUtil.writeSidecar(fs, new Path(staging, "v"), "x")
    }
    assert(FsUtil.readSidecar(fs, new Path(target, "v")).contains("x"))
  }
}
