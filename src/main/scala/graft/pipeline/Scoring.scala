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
    // one fused expression per pair: token strings converted once, MRA
    // encodes shared; whole-stage codegen's subexpression elimination
    // evaluates the struct once even though six fields are extracted
    val f = graftScoreFeatures(a, b)
    pairs
      .withColumn("jaro_winkler", f.getField("jaro_winkler"))
      .withColumn("lev", f.getField("lev"))
      .withColumn("mra_match", f.getField("mra_match"))
      .withColumn("mra_rating", f.getField("mra_rating"))
      .withColumn("metaphone_eq", f.getField("metaphone_eq"))
      .withColumn("soundex_diff", f.getField("soundex_diff"))
  }

  /** Jaro-Winkler corroboration threshold for MRA in the *clustering*
    * criterion (see [[edges]]).
    */
  val MraJwGate = 0.85

  /** Pairwise match decision — the reference comparators' semantics
    * (exact, MRA `is_encoded_equals`, Metaphone `is_encoded_equals`).
    * This is what the labeled-pair F1 is measured on.
    */
  def matchDecision(scored: DataFrame): DataFrame =
    scored.withColumn("is_match",
      col("token_a") === col("token_b") ||
        col("mra_match") || col("metaphone_eq"))

  /** Clustering edges (src < dst). Stricter than [[matchDecision]]: MRA
    * alone rates too leniently to survive transitive closure (it happily
    * matches Ailbert/Auerbach), so as a cluster edge it must be
    * corroborated by Jaro-Winkler >= [[MraJwGate]]. Metaphone equality is
    * a true equivalence relation, so it is closure-safe as-is.
    */
  def edges(scored: DataFrame): DataFrame =
    scored
      .where(
        col("token_a") === col("token_b") ||
          col("metaphone_eq") ||
          (col("mra_match") && col("jaro_winkler") >= MraJwGate))
      .select("src", "dst")
      .dropDuplicates("src", "dst")

  /** Driver-side mirror of [[edges]]'s criterion on plain strings — the
    * single source of truth shared with the synthetic ground-truth
    * generator ([[NameFixtures.families]]).
    */
  def clusterMatch(a: String, b: String): Boolean =
    a == b ||
      graft.phonetic.Metaphone.unbounded.encode(a) ==
        graft.phonetic.Metaphone.unbounded.encode(b) ||
      (graft.phonetic.MatchRatingApproach.isEncodedEquals(a, b) &&
        graft.phonetic.JaroWinkler.similarity(a, b) >= MraJwGate)

  /** [[clusterMatch]] with pre-computed unbounded-Metaphone and MRA codes
    * — identical decision, zero encode work. The streaming linkage state
    * stores each member's codes and each arrival's codes are computed once
    * in the (codegen'd) key projection, so a comparison is string
    * equality + rating + Jaro-Winkler only.
    */
  def clusterMatchCoded(a: String, aMeta: String, aMra: String,
      b: String, bMeta: String, bMra: String): Boolean =
    a == b || aMeta == bMeta ||
      (graft.phonetic.MatchRatingApproach
        .isEncodedEqualsCoded(a, aMra, b, bMra) &&
        graft.phonetic.JaroWinkler.similarity(a, b) >= MraJwGate)
}
