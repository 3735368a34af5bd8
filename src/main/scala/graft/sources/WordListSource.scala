package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Newline-delimited word-list source — the reference's input format
  * (`/root/reference/mapreduce.erl:41-43`: whole-file read + split on \n).
  *
  * Spark's `text` source already handles line splitting, emits no trailing
  * empty element, and scales to many files/splits. The one behavioral gap
  * is the reference's trailing-element drop `tl(lists:reverse(Words))`
  * (`mapreduce.erl:44,82,303`): on a file NOT terminated by a newline it
  * silently discards the real last word (SURVEY.md §5 quirk — `test.ngl`'s
  * final `spirit`). `referenceQuirk = true` reproduces that for golden
  * parity.
  *
  * Scale note: quirk mode is a compatibility shim for single small legacy
  * files. It does one O(1) driver-side seek to the file's last byte and, if
  * unterminated, one extra `zipWithIndex` pass to drop exactly the final
  * line. Default mode (`referenceQuirk = false`) is a plain distributed
  * `text` scan with zero extra work.
  */
object WordListSource {

  def read(spark: SparkSession, path: String,
           referenceQuirk: Boolean = false): DataFrame = {
    val lines = spark.read.textFile(path)
    if (!referenceQuirk || endsWithNewline(spark, path)) lines.toDF("w")
    else {
      // Drop exactly the final line (the element after the last \n).
      // zipWithIndex is an RDD hop that runs an extra job to count
      // per-partition sizes — acceptable because this branch exists ONLY
      // on the reference-parity read path (quirk mode, file not
      // newline-terminated); no driver query ever takes it, and the
      // default mode above is a plain zero-extra-work text scan.
      val indexed = lines.rdd.zipWithIndex()
      val last = indexed.map(_._2).max()
      import spark.implicits._
      indexed.filter(_._2 != last).map(_._1).toDF("w")
    }
  }

  private def endsWithNewline(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val status = fs.getFileStatus(p)
    require(status.isFile, s"referenceQuirk mode expects a single file: $path")
    val len = status.getLen
    if (len == 0) return true
    val in = fs.open(p)
    try { in.seek(len - 1); in.read() == '\n' } finally in.close()
  }
}
