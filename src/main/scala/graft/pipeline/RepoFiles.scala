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

  /** Boundary of the fixture-name regime: the first `FixtureSpan` files
    * (41 families x 25 files) come from the hand-labeled name-variant
    * fixtures — every correctness suite and driver query fits inside, so
    * their outputs are byte-identical to the pre-scaling generator.
    * Beyond it, entities are SYNTHESIZED (25 files each, random
    * consonant-vowel base names with phonetically-conservative variant
    * perturbations) so entity count grows with nFiles — without that, a
    * 1.6M-file run has ~39k files per name block, every block trips the
    * skew cap, and the pipeline benchmark degenerates to dropping all
    * its work.
    */
  val FixtureSpan: Long = NameFixtures.families.length.toLong * 25

  /** Files per synthesized entity (matches the fixture density). */
  val SynthEntitySize: Long = 25

  // Only consonants with NO vowel-context rules in Metaphone or Soundex
  // (no c/g/s/t: DGE/GE/SIO/TIO rewrites; no h/w/y: soundex specials):
  // the Metaphone code of a synthesized name is exactly its consonant
  // sequence, so the consonant digits below make names metaphone-
  // DISTINCT across entities while every perturbation keeps codes
  // identical within an entity.
  private val SynthConsonants = "bdfklmnpr"
  private val SynthVowels = "aeiou"

  /** Alternating consonant-vowel base name of a synthesized entity: the
    * consonants are the base-9 digits of a BIJECTIVELY scrambled entity
    * id (affine map by a unit mod 9^d), vowels are hash-random filler the
    * encoders ignore. Injective by construction — entities NEVER share a
    * consonant sequence, so cross-entity Metaphone codes are distinct.
    * (The earlier hash-then-mod scramble had ~900 birthday collisions at
    * 32k entities in the 9^6 space; every one was a false metaphone_eq
    * cluster merge at the 800k-file scale.) Name length grows with the
    * entity count: 6 consonant digits below 9^6 entities, then +2 digits
    * per 81x — injective through 9^12 ≈ 2.8e11 entities (a 7e12-file
    * corpus at 25 files/entity).
    */
  private[pipeline] def synthBase(entityId: Long): String = {
    var digits = 6
    var space = 531441L // 9^6
    while (entityId >= space && digits < 12) { digits += 2; space *= 81L }
    // affine bijection: 362867 is not divisible by 3, hence a unit mod 9^d
    var code = java.lang.Long.remainderUnsigned(
      entityId * 362867L + 54321L, space)
    var hv = scrambleBits(scrambleBits(entityId * 0xC2B2AE3D27D4EB4FL + 17) + 99)
    val sb = new StringBuilder(2 * digits - 1)
    var i = 0
    while (i < digits) {
      sb.append(SynthConsonants((code % 9).toInt))
      code /= 9
      if (i < digits - 1) {
        hv = scrambleBits(hv + i)
        sb.append(SynthVowels((((hv >>> 8) & 0x7FFFFFFF) % 5).toInt))
      }
      i += 1
    }
    sb.toString
  }

  /** A phonetically-conservative variant of a base name: identity, an
    * internal vowel swap, a doubled internal consonant, or a trailing
    * 'e' — all invisible to Soundex and Metaphone, so the entity's files
    * co-block exactly like the fixture families do.
    */
  private[pipeline] def synthVariant(base: String, h: Long): String =
    ((h >>> 2) & 3) match {
      case 0 => base
      case 1 =>
        val nVowels = base.length / 2
        val idx = 1 + 2 * (((h >>> 16) & 0x7FFFFFFF).toInt % nVowels)
        base.updated(idx,
          SynthVowels((((h >>> 24) & 0x7FFFFFFF) % 5).toInt))
      case 2 =>
        val nInner = (base.length - 1) / 2
        val idx = 2 * (1 + ((h >>> 16) & 0x7FFFFFFF).toInt % nInner)
        base.substring(0, idx + 1) + base.charAt(idx) + base.substring(idx + 1)
      case _ => base + "e"
    }

  /** Pure row generator, shared by the Spark path and tests. */
  def row(i: Long, seed: Long): (String, String, String, String, String, Int) = {
    val families = NameFixtures.families
    // deterministic per-row mix, independent of partitioning
    val h = scrambleBits(i * 0x9E3779B97F4A7C15L + seed)
    val (variant, entityId) =
      if (i < FixtureSpan) {
        val familyIdx = (i % families.length).toInt
        val family = families(familyIdx)
        (family((h & 0x7FFFFFFF).toInt % family.length), familyIdx)
      } else {
        val entity = i / SynthEntitySize // >= 41: disjoint from families
        (synthVariant(synthBase(entity), h), entity.toInt)
      }
    buildRow(i, h, variant, entityId, seed)
  }

  /** The file template for a given name variant — the single source the
    * uniform and skewed generators share.
    */
  private def buildRow(i: Long, h: Long, variant: String, entityId: Int,
      seed: Long): (String, String, String, String, String, Int) = {
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
    (repo, path, commit, lang, content, entityId)
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

  /** Ground-truth entity id of the deliberately hot entity in
    * [[generateSkewed]] (outside both the fixture range and the
    * synthesized i/25 range, so it never collides).
    */
  val HotEntityId: Int = -1

  /** The hot identifier every skewed row carries. */
  val HotName: String = "Hotspot"

  /** [[generate]] with a deliberately skewed identifier distribution:
    * every `hotEveryK`-th file (20% at the default 5) carries the SAME
    * name, so every one of that name's blocking keys collects
    * nFiles/hotEveryK rows — the degenerate-key regime the
    * `maxBlockSize` cap + broadcast anti-join exists for. Used to
    * MEASURE the skew defuse (ScalingBench `skew` mode), not just pin
    * its plan shape.
    */
  def generateSkewed(spark: SparkSession, nFiles: Long, seed: Long = 42L,
      hotEveryK: Int = 5, partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val parts =
      if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    spark
      .range(0, nFiles, 1, parts)
      .mapPartitions { it =>
        it.map { i =>
          val (repo, path, commit, lang, content, fam) =
            if (i % hotEveryK == 0) {
              val h = scrambleBits(i * 0x9E3779B97F4A7C15L + seed)
              buildRow(i, h, HotName, HotEntityId, seed)
            } else row(i, seed)
          (i, repo, path, commit, lang, content, fam)
        }
      }
      .toDF("file_id", "repo", "path", "commit", "lang", "content",
        "entity_id")
      .withColumn("content_sha", sha2(col("content"), 256))
  }
}
