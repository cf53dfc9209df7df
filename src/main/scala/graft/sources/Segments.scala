package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Generic maintenance for `batch=<id>` segment tables — the layout all
  * streaming writers here share ([[RollupTable.writeSegment]],
  * [[graft.dedup.LshIndex.appendBatch]], [[graft.ann.IvfIndex.appendBatch]]).
  * A long-running stream writes one segment per micro-batch, so a day of
  * short triggers accretes thousands of small files and every later scan
  * pays the per-file open cost.
  */
object Segments {

  /** Rewrite ALL current segments into one, repartitioned by
    * `partitionCols` so each partition directory holds one file per
    * compaction run (bounded file count), absorbed into the highest existing
    * batch id (the id space stays monotone — a restarted stream's next batch
    * id is always higher, so no collision). Rows pass through untouched, so
    * every query over the table returns identical results before and after.
    *
    * Write protocol: the compacted copy lands complete in a dot-prefixed
    * temp dir (invisible to parquet listings), then source segments are
    * removed and the temp dir promoted. Like Druid's compaction task this
    * assumes the single-maintenance-writer discipline (the caller serializes
    * compaction against ingest) — a crash between remove and promote leaves
    * the data intact in the temp dir for the next run, which detects and
    * re-promotes it rather than re-reading half-removed sources.
    *
    * @return number of source segments absorbed (0 = nothing to do).
    */
  def compact(spark: SparkSession, path: String, partitionCols: Seq[String]): Int = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(root, ".compact_tmp")
    def segments() = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
    // recovery: a temp dir carrying _SUCCESS is a COMPLETE compacted copy of
    // every segment that existed when it was written, so a crash anywhere in
    // the remove/promote window (sources partially deleted) must finish that
    // commit — re-compacting from half-removed sources would lose the rows
    // whose only remaining copy is the temp dir. No _SUCCESS = incomplete
    // copy with all sources intact: discard and start over.
    if (fs.exists(tmp)) {
      if (fs.exists(new Path(tmp, "_SUCCESS"))) {
        val leftover = segments()
        val id = if (leftover.isEmpty) 0L
          else leftover.map(_.getPath.getName.stripPrefix("batch=").toLong).max
        leftover.foreach(s => fs.delete(s.getPath, true))
        fs.rename(tmp, new Path(root, s"batch=$id"))
        return leftover.length
      }
      fs.delete(tmp, true)
    }
    val segs = segments()
    if (segs.length <= 1) return 0
    val maxId = segs.map(_.getPath.getName.stripPrefix("batch=").toLong).max
    val data = spark.read.option("basePath", path).parquet(path).drop("batch")
    val sized = // one task → one file per partition dir
      if (partitionCols.nonEmpty) data.repartition(partitionCols.map(col): _*)
      else data.coalesce(math.max(1, spark.sparkContext.defaultParallelism / 4))
    val writer = sized.write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(tmp.toString)
    segs.foreach(s => fs.delete(s.getPath, true))
    fs.rename(tmp, new Path(root, s"batch=$maxId"))
    segs.length
  }
}
