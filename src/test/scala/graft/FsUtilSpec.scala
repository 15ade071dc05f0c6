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
}
