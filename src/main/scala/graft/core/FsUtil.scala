package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}

/** Filesystem helpers shared by the persistable-index writers
  * (`Similarity.IvfIndex.write`, `Dedup.writeMinhashIndex`).
  * Reference analog for the durability discipline: the
  * changelog-backed store that must never be observable half-written
  * (samza-kv/src/main/scala/org/apache/samza/storage/kv/LoggedStore.scala:1). */
object FsUtil {

  /** Crash-safe replace of `target` with freshly staged content.
    *
    * `write` receives a hidden staging dir next to `target` and must
    * fully materialize the new content under it. Failure modes are
    * all recoverable:
    *  - staging write fails → staging dir is deleted, `target`
    *    untouched;
    *  - swap fails after the old target was moved aside → the backup
    *    is renamed back, so a reader never finds the dir missing;
    *  - only after the staging dir is renamed in is the backup
    *    deleted.
    * The one non-atomic window (rename-out then rename-in) is
    * restored on failure rather than left empty — the previous
    * delete-then-rename shape left NO index at `target` if the JVM
    * died between the two calls, and leaked the staging dir forever
    * if its write failed. */
  def swapInto(fs: FileSystem, target: Path)(write: Path => Unit): Unit = {
    val parent = Option(target.getParent).getOrElse(new Path("."))
    val uuid = java.util.UUID.randomUUID
    val staging = new Path(parent, s".${target.getName}-staging-$uuid")
    try write(staging)
    catch { case e: Throwable =>
      try fs.delete(staging, true) catch { case _: Throwable => () }
      throw e
    }
    fs.mkdirs(parent)
    val backup = new Path(parent, s".${target.getName}-backup-$uuid")
    val hadOld = fs.exists(target)
    if (hadOld && !fs.rename(target, backup))
      throw new java.io.IOException(
        s"swapInto: rename $target -> $backup failed")
    try {
      if (!fs.rename(staging, target))
        throw new java.io.IOException(
          s"swapInto: rename $staging -> $target failed")
    } catch { case e: Throwable =>
      if (hadOld) fs.rename(backup, target) // restore the old index
      throw e
    }
    if (hadOld) fs.delete(backup, true)
  }

  /** Write a small text sidecar (e.g. a params manifest) under `dir`
    * in one shot — create-overwrite, closed before return. */
  def writeSidecar(fs: FileSystem, file: Path, content: String): Unit = {
    val out = fs.create(file, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read a sidecar written by [[writeSidecar]]; None if absent. */
  def readSidecar(fs: FileSystem, file: Path): Option[String] =
    if (!fs.exists(file)) None
    else {
      val in = fs.open(file)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }

  private val exitDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  @volatile private var hookInstalled = false

  /** Register `dir` for recursive deletion at JVM exit. Idempotent
    * per path; one shutdown hook total. Without this, every
    * pid-scoped scratch dir (e.g. the per-JVM IVF index under
    * java.io.tmpdir) outlives its Verify/Bench JVM and /tmp
    * accumulates a corpus-sized parquet tree per run. */
  def deleteOnExit(dir: String): String = {
    if (exitDirs.add(dir) && !hookInstalled) synchronized {
      if (!hookInstalled) {
        hookInstalled = true
        Runtime.getRuntime.addShutdownHook(new Thread(() =>
          exitDirs.forEach { d =>
            try deleteRecursively(new java.io.File(d))
            catch { case _: Throwable => () }
          }, "graft-tmp-cleanup"))
      }
    }
    dir
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(deleteRecursively)
    }
    f.delete()
  }
}
