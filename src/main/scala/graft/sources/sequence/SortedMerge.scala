package graft.sources.sequence

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{LongWritable, SequenceFile, Text}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Merge k SORTED SequenceFile runs into one globally ordered stream
  * WITHOUT re-sorting — the reference's merge phase as a reusable
  * primitive (reference io/SequenceFile.java `Sorter.merge` ~:3001
  * and io/MapFile.java's sorted-key contract). q9 can SORT; this is
  * the operator for inputs that are ALREADY runs of sorted files
  * (sorted sink output, MR merge spills, LSM-style level files).
  *
  * Scale design — there is NO shuffle and NO sort anywhere:
  *  - each run directory holds files that are individually sorted
  *    (the sorted sink's per-file contract) and mutually
  *    range-disjoint (a range-partitioned sorted write), so a run's
  *    key space is tiled by its files;
  *  - the driver reads ONE record per file (its first key — file-list
  *    scale, the same tier as distcp's listing) and derives each
  *    file's key interval from its successor's first key;
  *  - output partitions are range slices between boundary keys
  *    sampled from the pooled first-key list, so partition
  *    boundaries track the actual key density, the TeraSort trick
  *    applied to metadata instead of data;
  *  - every output task opens ONLY the files intersecting its slice,
  *    k-way heap-merges them, and emits `[lo, hi)` in order. Tasks
  *    pull their byte ranges straight from the source files — the
  *    merge never materializes, shuffles, or sorts the data.
  *
  * A file spanning multiple slices is sequentially skipped to `lo` by
  * each later task (SequenceFile has sync markers but no key index);
  * with range-disjoint run files that skip is bounded by one slice's
  * rows per (file, task) pair. The MapFile analog of this operator
  * would `seek(lo)` through the index instead — the plumbing here is
  * identical, only the positioning call changes.
  */
object SortedMerge {

  private case class RunFile(path: String, firstKey: Long, endKey: Long)

  val schema: StructType = StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("value", StringType, nullable = false)))

  /** List a run's data files with their [firstKey, endKey) intervals.
    * endKey = the next file's first key (files of one run are
    * range-disjoint), Long.MaxValue for the last. */
  private def runFiles(dir: String): Seq[RunFile] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    val files = fs.listStatus(p).filter(_.isFile)
      .map(_.getPath)
      .filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
      .toSeq
    val withFirst = files.flatMap { f =>
      val r = new SequenceFile.Reader(new Configuration(),
        SequenceFile.Reader.file(f))
      try {
        val k = new LongWritable(); val v = new Text()
        if (r.next(k, v)) Some((f.toString, k.get())) else None // skip empties
      } finally r.close()
    }.sortBy(_._2)
    withFirst.zipWithIndex.map { case ((path, first), i) =>
      val end = if (i + 1 < withFirst.size) withFirst(i + 1)._2
                else Long.MaxValue
      RunFile(path, first, end)
    }
  }

  /** Sorted (key, value) iterator over one file clipped to [lo, hi):
    * sequential skip to lo, stop at hi — single forward pass. */
  private def clipped(file: String, lo: Long, hi: Long): Iterator[(Long, String)] =
    new Iterator[(Long, String)] {
      private val reader = new SequenceFile.Reader(new Configuration(),
        SequenceFile.Reader.file(new Path(file)))
      private val k = new LongWritable(); private val v = new Text()
      private var nextRow: (Long, String) = null
      private var closed = false
      advance()
      private def advance(): Unit = {
        nextRow = null
        while (nextRow == null && !closed) {
          if (!reader.next(k, v)) { reader.close(); closed = true }
          else if (k.get() >= hi) { reader.close(); closed = true }
          else if (k.get() >= lo) nextRow = (k.get(), v.toString)
          // else: before lo — keep skipping
        }
      }
      override def hasNext: Boolean = nextRow != null
      override def next(): (Long, String) = {
        val r = nextRow; advance(); r
      }
    }

  /** The merged stream as a DataFrame(key long, value string),
    * globally ordered by key ascending across ascending partition
    * ids (ties broken by run order, so the merge is stable and
    * deterministic). `slices` bounds the output parallelism. */
  def mergeSorted(s: SparkSession, runDirs: Seq[String],
      slices: Int = 16): DataFrame = {
    require(runDirs.nonEmpty, "mergeSorted: no run directories")
    val runs = runDirs.map(runFiles)
    val allFiles: Seq[RunFile] = runs.flatten
    require(allFiles.nonEmpty, "mergeSorted: no data files in runs")
    // boundaries from the pooled per-file first keys: every file is a
    // density sample of its run, so ~equal files per slice ~ equal
    // rows per slice when file sizes are uniform (the sorted sink's
    // range-partitioned output)
    val firsts = allFiles.map(_.firstKey).sorted
    val n = math.max(1, math.min(slices, firsts.size))
    val bounds = (1 until n)
      .map(i => firsts(i * firsts.size / n)).distinct
    val ranges: Seq[(Long, Long)] =
      (Seq(Long.MinValue) ++ bounds).zip(bounds :+ Long.MaxValue)
    val tasks: Seq[(Long, Long, Seq[RunFile])] = ranges.map { case (lo, hi) =>
      (lo, hi, allFiles.filter(f => f.firstKey < hi && f.endKey > lo))
    }
    val rdd = s.sparkContext
      .parallelize(tasks, tasks.size)
      .mapPartitions { it =>
        it.flatMap { case (lo, hi, files) =>
          // k-way heap merge of the clipped per-file streams; the
          // heap orders by (key, stream index) so equal keys emit in
          // run order — stable, partitioning-independent output
          val streams = files.map(f => clipped(f.path, lo, hi).buffered)
          val heap = mutable.PriorityQueue.empty[(Long, Int)](
            Ordering.Tuple2[Long, Int].reverse)
          streams.zipWithIndex.foreach { case (st, i) =>
            if (st.hasNext) heap.enqueue((st.head._1, i))
          }
          new Iterator[Row] {
            override def hasNext: Boolean = heap.nonEmpty
            override def next(): Row = {
              val (_, i) = heap.dequeue()
              val (k, v) = streams(i).next()
              if (streams(i).hasNext) heap.enqueue((streams(i).head._1, i))
              Row(k, v)
            }
          }
        }
      }
    s.createDataFrame(rdd, schema)
  }
}
