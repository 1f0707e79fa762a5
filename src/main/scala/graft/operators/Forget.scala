package graft.operators

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions._

/** Key erasure over a partitioned parquet layout — the "right to be
  * forgotten" operation a data platform must run routinely: given a set
  * of subject keys, remove every row carrying one of them, WITHOUT
  * rewriting the table.
  *
  * Scale design (100 TB): erasure is a partition-pruned rewrite.
  * 1. ONE distributed scan finds the distinct partitions that contain a
  *    target key (the scan prunes columns to key + partition cols); the
  *    result is collected — control-plane only, ≤ #affected partitions
  *    rows, the same class as IVF's probed-cell collect.
  * 2. Each affected partition directory is rewritten through an
  *    anti-filter; every UNaffected partition's files are never read
  *    again, never rewritten, and stay byte-identical (spec-pinned) —
  *    at 100 TB with date-partitioned data a deletion request touches
  *    the handful of partitions the subject appears in.
  * 3. The swap is rename-aside (stage → old aside → staging in → drop
  *    old; the [[graft.Serving.buildOnce]] discipline), so a concurrent
  *    reader sees the old complete tree or the new complete tree, never
  *    a half-rewritten directory.
  * Re-running with the same keys finds zero affected partitions —
  * idempotent by construction. Returns the per-partition audit (rows
  * removed / kept) the erasure request needs for its compliance record.
  */
object Forget {

  /** Convenience form for small subject lists. */
  def forgetKeys(spark: SparkSession, path: String,
      partitionCols: Seq[String], keyCol: String,
      keys: Seq[Long]): DataFrame = {
    import spark.implicits._
    forgetKeysTable(spark, path, partitionCols, keyCol, keys.toDF(keyCol))
  }

  /** Erase every row whose `keyCol` appears in `keysDf` from the layout
    * at `path` partitioned by `partitionCols`. The subjects arrive as a
    * TABLE, not literals: a real erasure backlog is millions of keys,
    * which joins (semi for detection, anti for the rewrite) handle at
    * any size while an IN-literal plan would not. `keyCol` must be a
    * DATA column (not a partition column — erasing a whole partition
    * value is a directory delete, not a rewrite). Returns the audit
    * frame (partition, rows_removed, rows_kept). */
  def forgetKeysTable(spark: SparkSession, path: String,
      partitionCols: Seq[String], keyCol: String,
      keysDf: DataFrame): DataFrame = {
    import spark.implicits._
    require(!partitionCols.contains(keyCol),
      s"$keyCol is a partition column — erase it by dropping directories")
    val layout = spark.read.option("basePath", path).parquet(path)
    val affected = layout
      .join(keysDf.select(col(keyCol)).distinct(), Seq(keyCol), "left_semi")
      .groupBy(partitionCols.map(col): _*)
      .agg(count(lit(1)).as("rows_removed"))
      .collect()
    val audit = affected.map { row =>
      // directory names via Spark's own partition-path rules — raw
      // interpolation resolves a value containing ' ', '/', ':', '='
      // (or a null, written as __HIVE_DEFAULT_PARTITION__) to a wrong or
      // missing path and the erasure crashes mid-run (ADVICE r11).
      // Values here are the writer's own string forms read back
      // (int/long/string partition columns — the layouts this sweep
      // serves); getPartitionPathString maps null/empty to the Hive
      // default partition exactly as the writer did.
      val segs = partitionCols.zipWithIndex.map { case (c, i) =>
        val v = row.get(i)
        ExternalCatalogUtils.getPartitionPathString(c,
          if (v == null) null else v.toString)
      }
      val dir = Paths.get(path, segs: _*)
      val part = spark.read.parquet(dir.toString)
      val kept = part.join(keysDf.select(col(keyCol)).distinct(),
        Seq(keyCol), "left_anti")
        // the anti-join reorders columns (join key first); restore the
        // partition files' original column order so appended readers and
        // schema checks see one layout
        .select(part.columns.map(col).toIndexedSeq: _*)
      // dot-prefixed siblings: Spark's file listing skips paths whose
      // name starts with '.' or '_', so a concurrent reader of the table
      // ROOT never lists the staging/old trees even transiently
      // (ADVICE r11; the leaf-level swap itself is already rename-aside)
      val staging = dir.resolveSibling(
        "." + dir.getFileName.toString + ".forget_staging")
      val old = dir.resolveSibling(
        "." + dir.getFileName.toString + ".forget_old")
      kept.write.mode("overwrite").parquet(staging.toString)
      val keptRows = spark.read.parquet(staging.toString).count()
      deleteRecursively(old)
      mv(dir, old)
      mv(staging, dir)
      deleteRecursively(old)
      (segs.mkString("/"), row.getLong(partitionCols.size), keptRows)
    }
    audit.toSeq.toDF("partition", "rows_removed", "rows_kept")
      .orderBy(col("partition"))
  }

  private def mv(from: Path, to: Path): Unit =
    try Files.move(from, to, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        Files.move(from, to): Path
        ()
    }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => { Files.delete(f); () })
      finally s.close()
    }
}
