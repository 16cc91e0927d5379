package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table staging: the storage half of the 100 TB join strategy.
  *
  * A shuffle join moves BOTH sides over the network every time it runs. For
  * tables that are joined repeatedly on a stable key (the corpus signature
  * table every incremental dedup batch probes, the inverted band-key index,
  * the event log keyed by user), writing them bucketed by that key pays the
  * shuffle ONCE at write time: every later equi-join between tables
  * bucketed the same way is planned with zero Exchange on the pre-bucketed
  * side(s) — Spark trusts the on-disk hash layout (`spark.sql.sources
  * .bucketing.enabled`, on by default).
  *
  * `sortBy` on the bucket key additionally lets sort-merge joins skip the
  * per-task sort. Bucket count is a layout commitment: pick it for the
  * TARGET scale (e.g. corpus_rows / rows_per_task), not the current one —
  * repartitioning to match a mismatched bucket count reintroduces the
  * shuffle this exists to avoid.
  */
object Bucketing {

  /** Writes `df` as a parquet table bucketed (and sorted) by `keyCols`,
    * registered as `table` in the session catalog. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      keyCols: Seq[String],
      buckets: Int
  ): Unit =
    df.write
      .format("parquet")
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .saveAsTable(table)

  /** Hive-partitioned parquet sink: one directory per distinct value
    * combination of `partCols` (`dir/lang=en/part-*.parquet`). The layout
    * complement of [[writeBucketed]]: bucketing co-locates JOIN keys,
    * directory partitioning prunes SCANS — a reader filtering on a
    * partition column never opens the other directories (PartitionFilters
    * in the scan node, asserted by BucketingSpec). Partition by low-
    * cardinality columns only (each value pair is a directory and at least
    * one file); high-cardinality pruning belongs to row-group statistics,
    * not directories. */
  def writePartitioned(df: DataFrame, dir: String, partCols: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partCols: _*)
      .parquet(dir)

  /** Range-sorted parquet layout: `repartitionByRange` on the key +
    * `sortWithinPartitions` before the write. The third storage lever next
    * to [[writeBucketed]] (join co-location) and [[writePartitioned]]
    * (directory pruning): every output file covers a DISJOINT key range, so
    * a reader filtering on the key skips whole files via parquet row-group
    * min/max statistics — the high-cardinality complement to directory
    * partitioning (which would explode into one directory per value).
    * Sorting within partitions also gives run-length/dictionary encoders
    * monotone input — smaller files at 100 TB. */
  def writeRangeSorted(
      df: DataFrame,
      dir: String,
      keyCol: String,
      numFiles: Int
  ): Unit =
    df.repartitionByRange(numFiles, df.col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode(SaveMode.Overwrite).parquet(dir)

  /** Morton (Z-order) interleave of two non-negative keys, `bits` low bits
    * each: bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Rows
    * close in z-value are close in BOTH keys, so sorting the layout by z
    * gives row-group min/max skipping on two filter dimensions at once —
    * what a single-key sort ([[writeRangeSorted]]) cannot do. Pure bit-op
    * built-ins (2·bits shift/and/sum terms, fully codegen'd, no UDF), and
    * the same arithmetic is expressible in the DuckDB oracle. */
  def zValue(a: Column, b: Column, bits: Int): Column =
    zValueN(Seq(a, b), bits)

  /** N-dimensional Morton interleave: bit i of column j lands at
    * position n·i + j — the [[zValue]] arithmetic generalized to the
    * 3–4-column clustering Delta/Iceberg users routinely ask of
    * `OPTIMIZE ZORDER BY`. n·bits must stay ≤ 63 so the interleave fits
    * a signed 64-bit value with no sign-bit cases (portable to any
    * engine, including the DuckDB oracle). Still pure bit-op built-ins —
    * n·bits shift/and/sum terms, fully codegen'd, no UDF. */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, s"z-ordering needs at least 2 columns, got $n")
    require(n * bits <= 63,
      s"$n columns x $bits bits = ${n * bits} interleaved bits; max 63")
    cols.zipWithIndex.foldLeft(lit(0L)) { case (acc, (c, j)) =>
      (0 until bits).foldLeft(acc) { (a, i) =>
        a + shiftleft(shiftright(c.cast("long"), i).bitwiseAND(1L), n * i + j)
      }
    }
  }

  /** Z-ordered parquet layout over two keys: range-partition and sort by
    * the interleaved z-value, then drop it — files end up clustered in both
    * dimensions for two-sided data skipping. */
  def writeZOrdered(
      df: DataFrame,
      dir: String,
      colA: String,
      colB: String,
      bits: Int,
      numFiles: Int
  ): Unit =
    df.withColumn("__z", zValue(df.col(colA), df.col(colB), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(dir)

  /** Equi-join of two same-bucketed tables — co-located by layout, no
    * Exchange in the plan (assert with `requireNoExchange`). */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      keyCols: Seq[String]
  ): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keyCols)

  /** Small-file compaction: rewrite a parquet directory into `targetFiles`
    * files via temp-dir + rename-aside swap. Incremental pipelines
    * accumulate one-file-per-micro-batch layouts whose per-file open/footer
    * cost eventually dominates scans — the classic small-file problem.
    * `coalesce` (not repartition) merges WITHOUT a shuffle: each output
    * task concatenates whole input files. Run where layout matters less
    * than file count (landing/staging zones); for sorted/bucketed layouts
    * use the layout writers above, which re-sort.
    *
    * Swap order: write tmp → rename dst aside → rename tmp into place →
    * delete the aside copy. The not-found window is one directory rename
    * (rolled back on failure), and the data always exists somewhere on
    * disk. NOTE: directory rename is atomic on HDFS/POSIX but NOT on
    * object stores (S3 renames are copy+delete) — there, keep the table
    * under [[graft.sources.ManifestTable]] and use ITS `compact`, which
    * commits by a single pointer swap and never renames a directory. */
  def compact(spark: SparkSession, dir: String, targetFiles: Int): Unit = {
    val dst = new org.apache.hadoop.fs.Path(dir)
    // resolve the FS from the path itself — dir may live on a different
    // scheme than the default filesystem
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(dir + "__compacting")
    val aside = new org.apache.hadoop.fs.Path(dir + "__old")
    spark.read.parquet(dir).coalesce(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(aside, true) // leftover from a crashed previous run
    if (!fs.rename(dst, aside))
      throw new java.io.IOException(s"compact: cannot move $dst aside")
    if (!fs.rename(tmp, dst)) {
      // roll back so the dataset stays visible; if even that fails, say
      // exactly where the data now lives instead of implying it is intact
      val rolledBack = fs.rename(aside, dst)
      throw new java.io.IOException(
        if (rolledBack) s"compact: cannot publish $tmp to $dst (rolled back, $dst intact)"
        else s"compact: cannot publish $tmp to $dst AND rollback failed — data is at $aside")
    }
    fs.delete(aside, true)
  }

  /** True when the executed plan contains no shuffle Exchange — the
    * property bucketing buys. Exposed for tests and plan audits. */
  def hasNoShuffle(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
