package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-shaped checkpoint layer over parquet (no Iceberg jar ships in
  * this environment — see SURVEY.md §7): every stage commit is
  * write-to-temp + atomic rename + JSON snapshot manifest, so a killed job
  * resumes from the last committed snapshot and a half-written stage is
  * never read. Swap [[TableIO]] for a real Iceberg catalog by replacing
  * this one class.
  *
  * Manifest records per-stage lineage counters (rows written, upstream
  * stage, wall-clock) — the north rule's per-partition lineage/metrics.
  */
final class TableIO(spark: SparkSession, root: String) {

  private val rootPath = Paths.get(root)
  Files.createDirectories(rootPath)

  private def stageDir(stage: String): Path = rootPath.resolve(stage)
  private def manifestPath(stage: String): Path =
    rootPath.resolve(s"$stage.manifest.json")

  def isCommitted(stage: String): Boolean = Files.exists(manifestPath(stage))

  def read(stage: String): DataFrame =
    spark.read.parquet(stageDir(stage).toString)

  /** Run `compute` and commit its result as `stage`, unless a committed
    * snapshot already exists (resume path). Returns the stage DataFrame.
    */
  def stage(
      stage: String,
      upstream: Seq[String] = Nil,
      partitionBy: Seq[String] = Nil)(compute: => DataFrame): DataFrame = {
    if (isCommitted(stage)) return read(stage)

    val t0 = System.nanoTime()
    val df = compute
    val tmp = rootPath.resolve(s"_tmp_$stage")
    deleteRecursively(tmp)
    var writer = df.write.mode("overwrite")
    if (partitionBy.nonEmpty)
      writer = writer.partitionBy(partitionBy: _*)
    writer.parquet(tmp.toString)

    val committed = spark.read.parquet(tmp.toString)
    // per-partition lineage counters (north rule): row count per partition
    // in one pass; the histogram summary lands in the manifest as skew
    // evidence (max/min/mean rows per partition)
    val partCounts = committed
      .groupBy(org.apache.spark.sql.functions.spark_partition_id().as("pid"))
      .count()
      .collect()
      .map(r => r.getLong(1))
      .sorted
    val rows = partCounts.sum
    val partitions = partCounts.length

    deleteRecursively(stageDir(stage))
    Files.move(tmp, stageDir(stage), StandardCopyOption.ATOMIC_MOVE)

    val elapsedMs = (System.nanoTime() - t0) / 1000000
    val maxRows = if (partCounts.isEmpty) 0L else partCounts.last
    val minRows = if (partCounts.isEmpty) 0L else partCounts.head
    val meanRows = if (partitions == 0) 0L else rows / partitions
    val manifest =
      s"""{"stage":"${esc(stage)}","rows":$rows,"partitions":$partitions,
         |"partition_rows":{"min":$minRows,"mean":$meanRows,"max":$maxRows},
         |"rows_per_sec":${if (elapsedMs == 0) 0 else rows * 1000 / elapsedMs},
         |"upstream":[${upstream.map(u => "\"" + esc(u) + "\"").mkString(",")}],
         |"elapsed_ms":$elapsedMs,
         |"committed_at":"${java.time.Instant.now()}"}""".stripMargin
    val tmpManifest = rootPath.resolve(s"_tmp_$stage.manifest.json")
    Files.write(tmpManifest, manifest.getBytes(StandardCharsets.UTF_8))
    Files.move(tmpManifest, manifestPath(stage),
      StandardCopyOption.ATOMIC_MOVE)
    read(stage)
  }

  /** Drop a stage (and force recompute on next run). */
  def invalidate(stage: String): Unit = {
    Files.deleteIfExists(manifestPath(stage))
    deleteRecursively(stageDir(stage))
  }

  def manifest(stage: String): Option[String] =
    if (isCommitted(stage))
      Some(new String(Files.readAllBytes(manifestPath(stage)),
        StandardCharsets.UTF_8))
    else None

  private def esc(s: String): String = s.replace("\"", "\\\"")

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
}
