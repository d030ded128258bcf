package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic repo-file table with the north-rule shape
  * `(repo, path, commit, lang, content)` (per BASELINE.json.input_hint).
  *
  * Every file's path/content embeds an identifier built from a name-variant
  * family ([[NameFixtures.families]]); files generated from the same family
  * are the ground-truth entity cluster. Generated distributed via
  * `spark.range` — no driver-side materialization, scales linearly with
  * `nFiles`.
  */
object RepoFiles {

  val Langs: Seq[String] = Seq("scala", "java", "rust", "py")

  /** Pure row generator, shared by the Spark path and tests. */
  def row(i: Long, seed: Long): (String, String, String, String, String, Int) = {
    val families = NameFixtures.families
    val familyIdx = (i % families.length).toInt
    val family = families(familyIdx)
    // deterministic per-row mix, independent of partitioning
    val h = scrambleBits(i * 0x9E3779B97F4A7C15L + seed)
    val variant = family((h & 0x7FFFFFFF).toInt % family.length)
    // fuse multi-word names ("Jo Ann" -> "Joann") so the identifier carries
    // the whole name as one token through camelCase splitting
    val letters = variant.filter(_.isLetter)
    val ident =
      if (letters.isEmpty) "Anon"
      else letters.substring(0, 1).toUpperCase + letters.substring(1).toLowerCase
    val repo = s"org/repo-${(h >>> 8) % 97}"
    val lang = Langs(((h >>> 16) & 0x3).toInt)
    val ext = lang match {
      case "scala" => "scala"; case "java" => "java"
      case "rust" => "rs"; case _ => "py"
    }
    val path = s"src/main/$lang/pkg${(h >>> 24) % 13}/${ident}Service$i.$ext"
    val commit =
      (f"${scrambleBits(h ^ 0xD1B54A32D192ED03L)}%016x" +
        f"${scrambleBits(h + 31)}%016x" +
        f"${scrambleBits(h - 17)}%016x").substring(0, 40)
    val content =
      s"""// $lang module for $variant (generated, seed=$seed)
         |class ${ident}Service {
         |  def handle${ident}Request(input: String): String = {
         |    val ${ident.toLowerCase}Store = lookup("$variant")
         |    process(${ident.toLowerCase}Store, input)
         |  }
         |}
         |""".stripMargin
    (repo, path, commit, lang, content, familyIdx)
  }

  private def scrambleBits(x: Long): Long = {
    var z = x
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Distributed generation: `nFiles` rows with ground-truth `entity_id`. */
  def generate(spark: SparkSession, nFiles: Long, seed: Long = 42L,
      partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val parts =
      if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    spark
      .range(0, nFiles, 1, parts)
      .mapPartitions { it =>
        it.map { i =>
          val (repo, path, commit, lang, content, fam) = row(i, seed)
          (i, repo, path, commit, lang, content, fam)
        }
      }
      .toDF("file_id", "repo", "path", "commit", "lang", "content",
        "entity_id")
      .withColumn("content_sha", sha2(col("content"), 256))
  }
}
