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

  /** files(file_id, path, content, ...) -> (file_id, token), distinct. */
  def tokenize(files: DataFrame, minLength: Int = 2): DataFrame = {
    val raw = files
      .select(
        col("file_id"),
        explode(
          array_union(tokensOf(col("path")), tokensOf(col("content"))))
          .as("token"))
      .where(length(col("token")) >= minLength)
      .where(!col("token").isInCollection(StopWords))
    raw.distinct()
  }

  /** Drops tokens present in more than `maxDfFraction` of the files — the
    * Zipf head (language names, framework words) that carries no entity
    * signal and would otherwise chain unrelated records into one giant
    * cluster. Scale path: only the (tiny) common-token head is broadcast;
    * the token stream itself is never collected or re-shuffled.
    */
  def pruneCommon(tokens: DataFrame, maxDfFraction: Double = 0.05,
      knownFileCount: Long = -1L): DataFrame = {
    val nFiles =
      if (knownFileCount > 0) knownFileCount
      else tokens.select("file_id").distinct().count()
    val cap = math.max(1L, (nFiles * maxDfFraction).toLong)
    // tokens are distinct per file, so count = document frequency
    val common = tokens
      .groupBy("token")
      .agg(count(lit(1)).as("df"))
      .where(col("df") > cap)
      .select("token")
    tokens.join(broadcast(common), Seq("token"), "left_anti")
  }
}
