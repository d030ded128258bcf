package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Identifier-token extraction from `path` + `content` — pure declarative
  * Spark (regexp split + explode), so Catalyst prunes/pushes around it.
  *
  * camelCase and snake_case identifiers are split into alphabetic tokens;
  * short tokens and common language keywords are dropped. One output row
  * per (file, token), deduplicated per file.
  */
object Tokenizer {

  /** Generic code tokens that carry no entity signal. */
  val StopWords: Seq[String] = Seq(
    "class", "def", "val", "var", "fn", "let", "mut", "pub", "import",
    "package", "return", "public", "private", "static", "void", "new",
    "string", "int", "long", "double", "input", "output", "main", "src",
    "org", "com", "service", "handle", "request", "process", "lookup",
    "store", "module", "generated", "seed", "for", "the", "pkg")

  /** Split a camelCase / snake_case / path string into lowercase alphabetic
    * tokens (Column -> Column of array<string>).
    */
  def tokensOf(c: Column): Column = {
    // break camelCase boundaries, then split on any non-letter run
    val decamel = regexp_replace(c, "([a-z])([A-Z])", "$1 $2")
    split(lower(decamel), "[^\\p{L}]+")
  }

  /** files(file_id, path, content, ...) -> (file_id, token), distinct
    * per file. No explicit `distinct()` needed: `array_union` already
    * returns the DISTINCT union per row, so the exploded (file_id, token)
    * rows are unique by construction — an explicit distinct here would be
    * a full extra shuffle of the token stream (measured ~16M rows at 800k
    * files) that removes nothing.
    *
    * PRECONDITION: `files` has one row per file_id (true for every
    * pipeline source — the input stage is the table of record). A caller
    * unioning ingest sources with repeated file_ids must dedupe first, or
    * pruneCommon's document-frequency counts (which assume one row per
    * (file, token)) inflate.
    */
  def tokenize(files: DataFrame, minLength: Int = 2): DataFrame =
    files
      .select(
        col("file_id"),
        explode(
          array_union(tokensOf(col("path")), tokensOf(col("content"))))
          .as("token"))
      .where(length(col("token")) >= minLength)
      .where(!col("token").isInCollection(StopWords))

  /** Drops tokens present in more than `maxDfFraction` of the files — the
    * Zipf head (language names, framework words) that carries no entity
    * signal and would otherwise chain unrelated records into one giant
    * cluster. Scale path: only the (tiny) common-token head is broadcast;
    * the token stream itself is never collected or re-shuffled.
    *
    * Pass `knownFileCount` whenever the producer already knows it (the
    * TableIO manifest records it; generators know their size): the cap is
    * then a plan-time literal. Without it the file count is computed
    * LAZILY inside the same plan (1-row EXACT `count_distinct` aggregate
    * broadcast-joined onto the token DF stats) — never an eager `count()`
    * job at DAG-construction time, which at 100 TB would be a full extra
    * scan before stage 1. Exact, not approx: tokens whose document
    * frequency sits at the cap boundary must not flip pruned/kept between
    * the literal and lazy paths.
    */
  def pruneCommon(tokens: DataFrame, maxDfFraction: Double = 0.05,
      knownFileCount: Long = -1L): DataFrame = {
    // tokens are distinct per file, so count = document frequency
    val dfCounts = tokens.groupBy("token").agg(count(lit(1)).as("df"))
    val common =
      if (knownFileCount > 0) {
        val cap = math.max(1L, (knownFileCount * maxDfFraction).toLong)
        dfCounts.where(col("df") > cap)
      } else {
        val nFiles = tokens.select(
          count_distinct(col("file_id")).as("n_files"))
        dfCounts
          .join(broadcast(nFiles))
          .where(col("df") >
            greatest(lit(1L), floor(col("n_files") * maxDfFraction)))
      }
    tokens.join(broadcast(common.select("token")), Seq("token"), "left_anti")
  }
}
