package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Registration + Column API for the phonetic Catalyst expressions.
  *
  * Register once per session (`GraftFunctions.register(spark)`) — or via
  * `spark.sql.extensions=graft.functions.GraftExtensions` — then use either
  * the Column helpers below or SQL (`SELECT graft_soundex(name) ...`).
  */
object GraftFunctions {

  /** Option arguments are folded at registration time — they must be
    * non-null foldable literals; anything else fails analysis with a clear
    * message instead of silently evaluating against no input row.
    */
  private def lit(e: Expression, param: String): Any = {
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"option argument '$param' must be a literal, got: ${e.sql}")
    val v = e.eval()
    if (v == null)
      throw new IllegalArgumentException(
        s"option argument '$param' must not be NULL")
    v
  }

  private def intLit(e: Expression, param: String = "maxLen"): Int =
    lit(e, param).asInstanceOf[Number].intValue()

  private def boolLit(e: Expression, param: String = "flag"): Boolean =
    lit(e, param).asInstanceOf[Boolean]

  private def strLit(e: Expression, param: String = "option"): String =
    lit(e, param).toString

  /** (name, builder, usage) for every function. */
  val builders: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("graft_soundex", { case Seq(c) => SoundexExpr(c) },
      "graft_soundex(str) - American Soundex (commons-codec semantics incl. H/W rule)"),
    ("graft_soundex_genealogy", { case Seq(c) => SoundexGenealogyExpr(c) },
      "graft_soundex_genealogy(str) - Soundex with the genealogy.com mapping"),
    ("graft_soundex_simplified", { case Seq(c) => SoundexSimplifiedExpr(c) },
      "graft_soundex_simplified(str) - Soundex without the H/W special case"),
    ("graft_soundex_mapping",
      { case Seq(c, m) => SoundexMappingExpr(c, strLit(m, "mapping")) },
      "graft_soundex_mapping(str, mapping) - Soundex with a custom 26-char mapping literal"),
    ("graft_refined_soundex", { case Seq(c) => RefinedSoundexExpr(c) },
      "graft_refined_soundex(str) - Refined Soundex"),
    ("graft_metaphone", {
      case Seq(c) => MetaphoneExpr(c, 4)
      case Seq(c, l) => MetaphoneExpr(c, intLit(l))
    }, "graft_metaphone(str[, maxLen]) - Metaphone; maxLen<=0 for unbounded"),
    ("graft_double_metaphone", {
      case Seq(c) => DoubleMetaphoneExpr(c, 4)
      case Seq(c, l) => DoubleMetaphoneExpr(c, intLit(l))
    }, "graft_double_metaphone(str[, maxLen]) - array(primary, alternate)"),
    ("graft_double_metaphone_primary",
      { case Seq(c) => DoubleMetaphonePrimaryExpr(c) },
      "graft_double_metaphone_primary(str)"),
    ("graft_double_metaphone_alternate",
      { case Seq(c) => DoubleMetaphoneAlternateExpr(c) },
      "graft_double_metaphone_alternate(str)"),
    ("graft_nysiis", {
      case Seq(c) => NysiisExpr(c, strict = true)
      case Seq(c, s) => NysiisExpr(c, boolLit(s))
    }, "graft_nysiis(str[, strict]) - NYSIIS"),
    ("graft_phonex", {
      case Seq(c) => PhonexExpr(c, 4)
      case Seq(c, l) => PhonexExpr(c, intLit(l))
    }, "graft_phonex(str[, maxLen]) - Phonex"),
    ("graft_cologne", { case Seq(c) => CologneExpr(c) },
      "graft_cologne(str) - Koelner Phonetik"),
    ("graft_caverphone1", { case Seq(c) => Caverphone1Expr(c) },
      "graft_caverphone1(str) - Caverphone 1 (6 chars)"),
    ("graft_caverphone2", { case Seq(c) => Caverphone2Expr(c) },
      "graft_caverphone2(str) - Caverphone 2 (10 chars)"),
    ("graft_mra_encode", { case Seq(c) => MraEncodeExpr(c) },
      "graft_mra_encode(str) - Match Rating Approach codex"),
    ("graft_mra_match", { case Seq(a, b) => MraMatchExpr(a, b) },
      "graft_mra_match(a, b) - MRA similarity-rating match decision"),
    ("graft_mra_rating", { case Seq(a, b) => MraRatingExpr(a, b) },
      "graft_mra_rating(a, b) - MRA rating (6 best, -1 guard failure)"),
    ("graft_double_metaphone_equal", {
      case Seq(a, b) => DoubleMetaphoneEqualExpr(a, b, alternate = false)
      case Seq(a, b, alt) =>
        DoubleMetaphoneEqualExpr(a, b, boolLit(alt, "alternate"))
    }, "graft_double_metaphone_equal(a, b[, alternate]) - compare primary " +
      "(or alternate) double-metaphone codes"),
    ("graft_bm_guess_lang", {
      case Seq(c) => BmGuessLangExpr(c, "gen")
      case Seq(c, nt) => BmGuessLangExpr(c, strLit(nt, "nameType"))
    }, "graft_bm_guess_lang(str[, nameType]) - Beider-Morse guessed " +
      "languages, sorted and '|'-joined ('any' when unrestricted)"),
    ("graft_bm_encode_langs", {
      case Seq(c, nt, rt, cc, mp, langs) =>
        BmEncodeWithLangsExpr(c, strLit(nt, "nameType"),
          strLit(rt, "ruleType"), boolLit(cc, "concat"),
          intLit(mp, "maxPhonemes"), strLit(langs, "languagesCsv"))
    }, "graft_bm_encode_langs(str, nameType, ruleType, concat, maxPhonemes, " +
      "languagesCsv) - Beider-Morse encode restricted to a language set"),
    ("graft_dm_soundex", { case Seq(c) => DmSoundexExpr(c) },
      "graft_dm_soundex(str) - Daitch-Mokotoff branching codes as array"),
    ("graft_dm_encode", { case Seq(c) => DmEncodeExpr(c) },
      "graft_dm_encode(str) - Daitch-Mokotoff single (non-branching) code"),
    ("graft_soundex_difference", { case Seq(a, b) => SoundexDifferenceExpr(a, b) },
      "graft_soundex_difference(a, b) - positional overlap of soundex codes (0-4)"),
    ("graft_refined_soundex_difference",
      { case Seq(a, b) => RefinedSoundexDifferenceExpr(a, b) },
      "graft_refined_soundex_difference(a, b)"),
    ("graft_jaro_winkler", { case Seq(a, b) => JaroWinklerExpr(a, b) },
      "graft_jaro_winkler(a, b) - Jaro-Winkler similarity in [0,1]"),
    ("graft_score_features", { case Seq(a, b) => ScoreFeaturesExpr(a, b) },
      "graft_score_features(a, b) - struct of all pairwise scoring " +
        "features computed in one pass"),
    ("graft_beider_morse", {
      case Seq(c) => BeiderMorseExpr(c, "gen", "approx", concat = true, 20)
      case Seq(c, nt) => BeiderMorseExpr(c, strLit(nt), "approx", concat = true, 20)
      case Seq(c, nt, rt) =>
        BeiderMorseExpr(c, strLit(nt), strLit(rt), concat = true, 20)
      case Seq(c, nt, rt, cc) =>
        BeiderMorseExpr(c, strLit(nt), strLit(rt), boolLit(cc), 20)
      case Seq(c, nt, rt, cc, mp) =>
        BeiderMorseExpr(c, strLit(nt), strLit(rt), boolLit(cc), intLit(mp))
    }, "graft_beider_morse(str[, nameType, ruleType, concat, maxPhonemes]) - " +
      "Beider-Morse encoding, '|'-joined variants"),
    ("graft_bm_codes", {
      case Seq(c) => BmCodesExpr(c, "gen", "approx", concat = true, 20)
      case Seq(c, nt) => BmCodesExpr(c, strLit(nt), "approx", concat = true, 20)
      case Seq(c, nt, rt) =>
        BmCodesExpr(c, strLit(nt), strLit(rt), concat = true, 20)
      case Seq(c, nt, rt, cc) =>
        BmCodesExpr(c, strLit(nt), strLit(rt), boolLit(cc), 20)
      case Seq(c, nt, rt, cc, mp) =>
        BmCodesExpr(c, strLit(nt), strLit(rt), boolLit(cc), intLit(mp))
    }, "graft_bm_codes(str[, nameType, ruleType, concat, maxPhonemes]) - " +
      "Beider-Morse variants flattened to array<string> for explode()"),
    ("graft_cosine", { case Seq(a, b) => CosineExpr(a, b) },
      "graft_cosine(a, b) - cosine similarity of two numeric arrays " +
        "(single-pass, codegen'd)"),
    ("graft_lsh_signatures", {
      case Seq(c, d, p, b, s) => LshSignaturesExpr(c, intLit(d, "dim"),
        intLit(p, "nPlanes"), intLit(b, "bands"), intLit(s, "seedBase"))
    }, "graft_lsh_signatures(vec, dim, nPlanes, bands, seedBase) - " +
      "array of per-band random-hyperplane LSH signatures (single pass); " +
      "vec must have exactly dim elements"),
    ("graft_langid", {
      case Seq(c) => LangIdExpr(c)
      case Seq(c, m) => LangIdExpr(c, intLit(m, "minHits"))
    }, "graft_langid(text[, minHits]) - stopword-signature language ID " +
      "(single-pass form of TextAnalysis.langIdCol); guesses with fewer " +
      "than minHits signature hits map to 'und'"),
    ("graft_langid_scored", {
      case Seq(c) => LangIdScoredExpr(c)
      case Seq(c, m) => LangIdScoredExpr(c, intLit(m, "minHits"))
    }, "graft_langid_scored(text[, minHits]) - struct(lang, hits): floored " +
      "language guess plus raw best-signature hit count"),
    ("graft_tokens", { case Seq(c) => TokensExpr(c) },
      "graft_tokens(text) - portable Unicode tokens (CJK chars single, " +
        "other letter/digit runs as words) of the lowercased text"),
    ("graft_minhash_signature", {
      case Seq(c) => MinHashSignatureExpr(c, 64, 3)
      case Seq(c, n) => MinHashSignatureExpr(c, intLit(n), 3)
      case Seq(c, n, k) => MinHashSignatureExpr(c, intLit(n), intLit(k))
    }, "graft_minhash_signature(text[, numHashes[, k]]) - MinHash signature of word k-shingles"),
    ("graft_bpe_count", {
      case Seq(c, m) => BpeCountExpr(c, strLit(m, "merges"))
    }, "graft_bpe_count(text, merges) - learned-BPE subword token count; " +
      "merges is the newline-joined table from Bpe.mergesAsString"),
    ("graft_bpe_encode", {
      case Seq(c, m) => BpeEncodeExpr(c, strLit(m, "merges"))
    }, "graft_bpe_encode(text, merges) - learned-BPE subword token stream " +
      "as array<string>")
  )

  /** Wraps a builder so a wrong argument count raises a clear arity error
    * instead of a bare MatchError.
    */
  private[functions] def checkedBuilder(name: String,
      builder: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args =>
      try builder(args)
      catch {
        case _: MatchError =>
          throw new IllegalArgumentException(
            s"$name: invalid number of arguments (${args.length})")
      }

  /** Registries this object has already populated, keyed on registry
    * identity (weak, so dropped sessions can be collected). Skipping on a
    * seen REGISTRY — not on any pre-existing binding of the name — means a
    * stale or third-party temp function with a graft_* name gets replaced
    * on first registration instead of silently shadowing the library.
    */
  private val registeredRegistries =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[AnyRef, java.lang.Boolean]())

  /** Idempotent per-session registration: the first call on a session
    * (re)binds every graft_* function; repeat calls are no-ops (no
    * "replaced a previously registered function" log spam).
    *
    * The whole check-and-bind runs under the map's lock and the registry is
    * marked registered only AFTER every function is bound, so a concurrent
    * second `register()` cannot return while the first is still mid-way
    * through the builders loop (which would let that thread's next
    * `call_function` fail with an undefined-function error).
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registeredRegistries.synchronized {
      if (!registeredRegistries.containsKey(registry)) {
        builders.foreach { case (name, builder, _) =>
          registry.createOrReplaceTempFunction(
            name, checkedBuilder(name, builder), "built-in")
        }
        registeredRegistries.put(registry, java.lang.Boolean.TRUE)
      }
    }
  }

  // ---- Column API (requires register(spark) on the active session) ----
  def graftSoundex(c: Column): Column = call_function("graft_soundex", c)
  def graftRefinedSoundex(c: Column): Column =
    call_function("graft_refined_soundex", c)
  def graftMetaphone(c: Column): Column = call_function("graft_metaphone", c)
  def graftDoubleMetaphone(c: Column): Column =
    call_function("graft_double_metaphone", c)
  def graftNysiis(c: Column): Column = call_function("graft_nysiis", c)
  def graftPhonex(c: Column): Column = call_function("graft_phonex", c)
  def graftCologne(c: Column): Column = call_function("graft_cologne", c)
  def graftCaverphone1(c: Column): Column = call_function("graft_caverphone1", c)
  def graftCaverphone2(c: Column): Column = call_function("graft_caverphone2", c)
  def graftMraEncode(c: Column): Column = call_function("graft_mra_encode", c)
  def graftMraMatch(a: Column, b: Column): Column =
    call_function("graft_mra_match", a, b)
  def graftMraRating(a: Column, b: Column): Column =
    call_function("graft_mra_rating", a, b)
  def graftDmSoundex(c: Column): Column = call_function("graft_dm_soundex", c)
  def graftBeiderMorse(c: Column): Column =
    call_function("graft_beider_morse", c)
  def graftBmCodes(c: Column): Column = call_function("graft_bm_codes", c)
  def graftDmEncode(c: Column): Column = call_function("graft_dm_encode", c)
  def graftSoundexDifference(a: Column, b: Column): Column =
    call_function("graft_soundex_difference", a, b)
  def graftJaroWinkler(a: Column, b: Column): Column =
    call_function("graft_jaro_winkler", a, b)
  def graftScoreFeatures(a: Column, b: Column): Column =
    call_function("graft_score_features", a, b)
  def graftLangId(c: Column): Column = call_function("graft_langid", c)
  def graftLangIdScored(c: Column): Column =
    call_function("graft_langid_scored", c)
  def graftTokens(c: Column): Column = call_function("graft_tokens", c)
  def graftCosine(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)
  def graftMinhashSignature(c: Column): Column =
    call_function("graft_minhash_signature", c)
}

/** `spark.sql.extensions`-pluggable registration. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder, usage) =>
      ext.injectFunction(
        (FunctionIdentifier(name),
          new ExpressionInfo("graft.functions.GraftFunctions", name, usage),
          GraftFunctions.checkedBuilder(name, builder)))
    }
  }
}
