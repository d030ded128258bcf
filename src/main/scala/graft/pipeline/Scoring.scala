package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Pairwise scoring of candidate pairs.
  *
  * Feature columns (all codegen'd Catalyst expressions / built-ins, no
  * UDFs): Jaro-Winkler, Levenshtein (built-in), the MRA similarity-rating
  * decision + rating, Metaphone equality, Soundex difference. The edge
  * decision replicates the reference comparators: identical tokens, an MRA
  * match (match_rating_approach.rs:202-228), or Metaphone code equality
  * (`is_encoded_equals`, lib.rs:226-231).
  */
object Scoring {

  def score(pairs: DataFrame): DataFrame = {
    val a = col("token_a")
    val b = col("token_b")
    pairs
      .withColumn("jaro_winkler", graftJaroWinkler(a, b))
      .withColumn("lev", levenshtein(a, b))
      .withColumn("mra_match", graftMraMatch(a, b))
      .withColumn("mra_rating", graftMraRating(a, b))
      .withColumn("metaphone_eq", graftMetaphone(a) === graftMetaphone(b))
      .withColumn("soundex_diff", graftSoundexDifference(a, b))
  }

  /** Match decision -> undirected edges (src < dst). */
  def edges(scored: DataFrame): DataFrame =
    scored
      .where(
        col("token_a") === col("token_b") ||
          col("mra_match") || col("metaphone_eq"))
      .select("src", "dst")
      .dropDuplicates("src", "dst")
}
