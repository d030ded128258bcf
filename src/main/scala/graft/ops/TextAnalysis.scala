package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * declarative Spark (codegen'd built-ins) — no UDFs — so they push down,
  * prune, and survive 100TB scans.
  */
object TextAnalysis {

  /** Tiny per-language stopword signatures for the n-gram/stopword
    * language-ID heuristic (deterministic, embedded — no external model).
    * Signatures are plain substrings counted over the space-padded
    * lowercased text: space-delimited for segmented scripts, bare
    * particles/function words for unsegmented ones (ja, zh). 14 languages —
    * the filter set a training-data pipeline actually routes on.
    */
  val StopwordSignatures: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " to ", " in ", " is "),
    "de" -> Seq(" der ", " die ", " und ", " das ", " ist ", " nicht "),
    "fr" -> Seq(" le ", " la ", " et ", " les ", " des ", " est "),
    "es" -> Seq(" el ", " la ", " los ", " que ", " y ", " es "),
    "it" -> Seq(" il ", " di ", " che ", " per ", " con ", " una "),
    "pt" -> Seq(" o ", " em ", " que ", " uma ", " do ", " da "),
    "nl" -> Seq(" de ", " het ", " een ", " en ", " van ", " niet "),
    "sv" -> Seq(" och ", " att ", " det ", " som ", " en ", " är "),
    "pl" -> Seq(" i ", " w ", " się ", " na ", " jest ", " nie "),
    "ru" -> Seq(" и ", " в ", " не ", " на ", " что ", " это "),
    "tr" -> Seq(" bir ", " ve ", " bu ", " için ", " çok ", " ile "),
    "id" -> Seq(" yang ", " dan ", " di ", " ini ", " untuk ", " dengan "),
    "ja" -> Seq("の", "は", "を", "です", "ます", "した"),
    "zh" -> Seq("的", "是", "了", "在", "我们", "和"))

  /** Scalar mirror of [[langIdCol]] — one lowercase pass + intrinsified
    * `String.indexOf` per signature, instead of 84 regex-split + array
    * allocations per row. Exactly the declarative semantics: hits = count
    * of NON-overlapping signature occurrences in the space-padded
    * lowercased text (what `size(split(...)) - 1` counts), winner = max
    * (hits, lang) lexicographically. Returns (bestHits, bestLang);
    * bestLang is meaningful only when bestHits > 0.
    */
  def bestSignature(text: String): (Int, String) = {
    val padded = new java.lang.StringBuilder(text.length + 2)
      .append(' ').append(text.toLowerCase(java.util.Locale.ROOT))
      .append(' ').toString
    var bestHits = 0
    var bestLang = ""
    var li = 0
    while (li < SortedSignatures.length) {
      val (lang, words) = SortedSignatures(li)
      var hits = 0
      var wi = 0
      while (wi < words.length) {
        val w = words(wi)
        var i = padded.indexOf(w)
        while (i >= 0) {
          hits += 1
          i = padded.indexOf(w, i + w.length)
        }
        wi += 1
      }
      if (hits > bestHits || (hits == bestHits && lang.compareTo(bestLang) > 0)) {
        bestHits = hits
        bestLang = lang
      }
      li += 1
    }
    (bestHits, bestLang)
  }

  /** Winner language, or "und" when the hit count is below `minHits` —
    * the confidence floor: at corpus scale a single stopword hit routing a
    * document to a language is noise, so routing passes raise the floor.
    */
  def langIdOf(text: String, minHits: Int = 1): String = {
    val (hits, lang) = bestSignature(text)
    if (hits >= math.max(1, minHits)) lang else "und"
  }

  /** UTF8String entry point for the Catalyst expression's codegen. */
  def langIdUtf8(
      u: org.apache.spark.unsafe.types.UTF8String,
      minHits: Int): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      langIdOf(u.toString, minHits))

  /** struct(lang, hits) entry point for [[graft.functions.LangIdScoredExpr]]
    * codegen: the floored guess plus the raw best-signature hit count, so a
    * routing pass can both filter on confidence and keep the evidence.
    */
  def langIdScored(
      u: org.apache.spark.unsafe.types.UTF8String,
      minHits: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val (hits, lang) = bestSignature(u.toString)
    val guess = if (hits >= math.max(1, minHits)) lang else "und"
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(guess),
        hits))
  }

  private val SortedSignatures: Array[(String, Array[String])] =
    StopwordSignatures.toSeq.sortBy(_._1)
      .map { case (l, ws) => (l, ws.toArray) }.toArray

  /** Best (hits, lang) struct under the signature spec — declarative
    * reference form shared by [[langIdCol]] and [[langIdScoredCol]].
    */
  private def bestSignatureCol(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val scores = StopwordSignatures.toSeq.sortBy(_._1).map {
      case (lang, words) =>
        val hits = words
          .map(w =>
            size(split(padded, java.util.regex.Pattern.quote(w), -1)) - 1)
          .reduce(_ + _)
        struct(hits.cast("int").as("hits"), lit(lang).as("lang"))
    }
    greatest(scores: _*)
  }

  /** Heuristic language ID over a text column: counts stopword-signature
    * hits per language, returns the argmax (or "und" when the hit count is
    * under `minHits`). This is the declarative reference form;
    * [[langIdFastCol]] is the codegen'd single-expression equivalent used
    * on the hot path.
    */
  def langIdCol(text: Column, minHits: Int = 1): Column = {
    val best = bestSignatureCol(text)
    when(best.getField("hits") >= math.max(1, minHits),
      best.getField("lang")).otherwise("und")
  }

  /** struct(lang, hits): the floored guess plus its raw hit count —
    * declarative mirror of [[graft.functions.LangIdScoredExpr]].
    */
  def langIdScoredCol(text: Column, minHits: Int = 1): Column = {
    val best = bestSignatureCol(text)
    struct(
      when(best.getField("hits") >= math.max(1, minHits),
        best.getField("lang")).otherwise("und").as("lang"),
      best.getField("hits").as("hits"))
  }

  /** Codegen'd single-expression language ID (requires
    * `GraftFunctions.register`): one lowercase pass + intrinsified
    * substring scans instead of |langs| x |signatures| regex splits —
    * bit-identical to [[langIdCol]] (parity-pinned in the spec), ~10x
    * cheaper per row, the form a 100-TB language-routing pass wants.
    */
  def langIdFastCol(text: Column, minHits: Int = 1): Column =
    call_function("graft_langid", text, lit(minHits))

  /** Codegen'd struct(lang, hits) — fast form of [[langIdScoredCol]]. */
  def langIdScoredFastCol(text: Column, minHits: Int = 1): Column =
    call_function("graft_langid_scored", text, lit(minHits))

  /** Quality features: char length, token count, punctuation ratio,
    * uppercase ratio, mean token length, and a composite [0,1] score.
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val nChars = length(t).cast("double")
    val tokens = tokenCountCol(t).cast("double")
    val punct = length(regexp_replace(t, "[^!?.,;:]", "")).cast("double")
    val upper = length(regexp_replace(t, "[^A-Z]", "")).cast("double")
    df.withColumn("n_chars", nChars)
      .withColumn("n_tokens", tokens)
      .withColumn("punct_ratio", round(punct / greatest(nChars, lit(1.0)), 6))
      .withColumn("upper_ratio", round(upper / greatest(nChars, lit(1.0)), 6))
      .withColumn("mean_token_len",
        round(nChars / greatest(tokens, lit(1.0)), 6))
      .withColumn("quality_score",
        round(
          when(nChars < 10, 0.0)
            .otherwise(
              lit(1.0)
                - least(lit(1.0), col("punct_ratio") * 5)
                * lit(0.3)
                - least(lit(1.0), col("upper_ratio") * 3) * lit(0.2)),
          6))
  }

  /** Whitespace token count (split semantics match ANSI regexp split). */
  def tokenCountCol(text: Column): Column =
    size(split(text, "\\s+"))

  /** BPE-ish subword count: alphanumeric runs + standalone punctuation. */
  def subwordCountCol(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Normalized-content fingerprint: md5 of whitespace-collapsed,
    * lowercased text — the exact-dup key robust to formatting noise.
    */
  def fingerprintCol(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))
}
