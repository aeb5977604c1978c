package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.HadoopTools
import graft.sources.Tables

class HadoopToolsSpec extends AnyFunSuite {
  import TestSpark._

  test("counters (Observation) report alongside the action") {
    val (df, obs) = HadoopTools.withCounters(Tables.lineitem(spark, sf))
    val n = df.count()
    val row = obs.get
    assert(row("rows_seen") == n)
    assert(row("large_qty_rows").asInstanceOf[Long] > 0)
  }

  test("distCp copies every file with identical sizes") {
    val dst = Files.createTempDirectory("graft-distcp-").toString
    val copied = HadoopTools.distCp(spark, sf, dst)
    val srcFiles = new java.io.File(sf).listFiles().filter(_.isFile)
      .map(f => f.getName -> f.length()).toMap
    // ignore the .crc sidecars Hadoop's checksummed local FS writes
    val dstFiles = new java.io.File(dst).listFiles().filter(_.isFile)
      .filterNot(_.getName.startsWith("."))
      .map(f => f.getName -> f.length()).toMap
    assert(copied == srcFiles.size)
    assert(dstFiles == srcFiles)
  }

  test("pi estimate lands near pi") {
    val row = SparkEntry.queries("mr_pi")(spark, sf).collect()(0)
    val pi = row.getLong(2) / 10000.0
    assert(math.abs(pi - math.Pi) < 0.02, s"pi estimate $pi")
  }
}
