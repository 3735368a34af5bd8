package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout for co-located joins — the storage-side answer
  * to repeated large joins on the same key: both tables pre-hashed into
  * the same number of buckets on the join key (and sorted within
  * buckets), so a sort-merge join reads bucket i against bucket i with
  * NO shuffle exchange on either side (asserted in BucketingSpec).
  *
  * Scale notes: bucket count is a layout-time decision — size it so one
  * bucket of the larger table fits an executor core's working set
  * (typically total_size / (2-4 × cluster cores)). Bucketing pays off
  * when the write is amortized over many reads: nightly fact tables
  * joined repeatedly, not one-shot staging data. */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed (and sorted) by
    * `bucketCol` into `buckets` buckets. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)

  /** Write `df` hive-style partitioned by `partitionCol` — the layout
    * that turns equality/range predicates on the partition column into
    * directory-level pruning (`PartitionFilters` in the scan; zero I/O
    * for excluded partitions). Partition by coarse, low-cardinality,
    * always-filtered columns (date, region) — thousands of partitions,
    * not millions. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
}
