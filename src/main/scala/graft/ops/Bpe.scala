package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained byte-pair-encoding subword tokenizer.
  *
  * A training-data pipeline budgets corpora in learned subword tokens,
  * not regex segments — this is the missing half of token accounting
  * (`q_subword_stats` counts regex segments; `graft_bpe_count` counts
  * real BPE merges learned from the corpus itself).
  *
  * Scale split (how real BPE trainers work, and the only shape that
  * survives 100 TB):
  *  - the DATA-sized step — word frequency counting — runs distributed
  *    ([[trainFromCorpus]]: one `groupBy(word).count()` with map-side
  *    partial aggregation, then a top-`maxVocab` sort+limit, which Spark
  *    executes as per-partition partial top-k). 100 TB of text reduces
  *    to a <=`maxVocab`-row frequency table in one shuffle.
  *  - the MODEL-sized step — the iterative best-pair merge loop — runs
  *    on that bounded table ([[train]], pure Scala, O(vocab x merges)):
  *    at 50k words x 200 merges it is milliseconds, and making each
  *    merge round a Spark job would add 200 driver round-trips for no
  *    parallelism gain.
  *  - encoding rides a broadcast merge table inside a codegen'd Catalyst
  *    expression (`graft_bpe_count` / `graft_bpe_encode`), one pass over
  *    the data, no UDF.
  *
  * Every step is deterministic: word extraction is a fixed regex,
  * vocabulary capping orders by (count desc, word asc), and the merge
  * loop breaks count ties by pair lexicographic order — so a re-trained
  * table on the same corpus is byte-identical, and the distributed
  * counting path must agree with the pure scalar path
  * ([[pureWordFrequencies]]) bit-for-bit (spec-pinned).
  */
object Bpe {

  /** End-of-word sentinel symbol (Sennrich-style BPE: it lets the model
    * learn word-final subwords like "ing</w>" distinct from mid-word
    * "ing").
    */
  val EndOfWord = "</w>"

  private val WordRe = "[a-z0-9]+".r

  /** ASCII-only case fold: 'A'-'Z' to 'a'-'z', every other char
    * unchanged. Deliberately NOT String.toLowerCase — the JVM's
    * locale-sensitive slow path (e.g. Turkish 'I' -> dotless 'ı') and
    * Spark's `lower()` can disagree per locale, and the word regex only
    * keeps [a-z0-9] anyway; an ASCII fold is the one mapping that is
    * identical in the pure path, Spark `translate`, and any oracle
    * engine, for any input and any JVM default locale.
    */
  private[ops] def asciiFold(text: String): String =
    text.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)

  /** Lowercased alphanumeric words of a text — the SINGLE tokenization
    * spec shared by the pure path, the distributed path (same regex via
    * `regexp_extract_all` over the same ASCII fold) and the encoder.
    */
  def words(text: String): Seq[String] =
    WordRe.findAllIn(asciiFold(text)).toSeq

  /** Initial symbol sequence of a word: one symbol per char plus the
    * end-of-word sentinel.
    */
  def symbols(word: String): Vector[String] =
    word.map(_.toString).toVector :+ EndOfWord

  /** Pure scalar word-frequency table of a corpus — the reference
    * semantics the distributed counting path must reproduce. Ordered by
    * (count desc, word asc) and capped at `maxVocab`.
    */
  def pureWordFrequencies(
      texts: Seq[String], maxVocab: Int = 50000): Seq[(String, Long)] = {
    val m = mutable.Map.empty[String, Long]
    texts.foreach(t => words(t).foreach(w => m(w) = m.getOrElse(w, 0L) + 1L))
    m.toSeq.sortBy { case (w, c) => (-c, w) }.take(maxVocab)
  }

  /** Learn `numMerges` byte-pair merges from a word-frequency table.
    * Each round counts adjacent symbol pairs weighted by word frequency,
    * merges the most frequent pair (ties broken by pair lexicographic
    * order), and stops early when no pair occurs twice. Pure and
    * deterministic.
    */
  def train(
      wordFreq: Seq[(String, Long)],
      numMerges: Int): Vector[(String, String)] = {
    var vocab = wordFreq.map { case (w, c) => (symbols(w), c) }.toVector
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val pairCounts = mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        if (best._2 < 2) done = true // a pair seen once carries no signal
        else {
          val (a, b) = best._1
          merges += ((a, b))
          val merged = a + b
          vocab = vocab.map { case (syms, c) =>
            (mergeOnce(syms, a, b, merged), c)
          }
          round += 1
        }
      }
    }
    merges.result()
  }

  /** One full left-to-right replacement pass of adjacent (a, b) by
    * `merged` (non-overlapping, greedy — the classic BPE merge step).
    */
  private def mergeOnce(
      syms: Vector[String], a: String, b: String,
      merged: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += merged
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Encode one word under a learned merge table: repeatedly apply the
    * LOWEST-rank applicable merge (the standard greedy BPE encoder, so
    * encoding agrees with how the table was trained).
    */
  def encodeWord(
      word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = symbols(word)
    var continue = true
    while (continue && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) continue = false
      else {
        val (a, b) = (syms(bestAt), syms(bestAt + 1))
        syms = mergeOnce(syms, a, b, a + b)
      }
    }
    syms
  }

  /** BPE token stream of a text (pure reference semantics for
    * `graft_bpe_encode`).
    */
  def encode(
      text: String, ranks: Map[(String, String), Int]): Seq[String] =
    words(text).flatMap(encodeWord(_, ranks))

  /** BPE token count of a text (pure reference semantics for
    * `graft_bpe_count`).
    */
  def countTokens(text: String, ranks: Map[(String, String), Int]): Int =
    words(text).iterator.map(encodeWord(_, ranks).length).sum

  /** Serialize a merge table to the single-string form the Catalyst
    * expressions take as a foldable literal (symbols are `[a-z0-9]`
    * runs plus the sentinel — never contain space or newline, so the
    * join is unambiguous).
    */
  def mergesAsString(merges: Seq[(String, String)]): String =
    merges.map { case (a, b) => s"$a $b" }.mkString("\n")

  /** Parse [[mergesAsString]] back to rank order. */
  def parseMerges(s: String): Map[(String, String), Int] =
    if (s.isEmpty) Map.empty
    else s.split('\n').iterator.zipWithIndex.map { case (line, i) =>
      val sp = line.indexOf(' ')
      ((line.substring(0, sp), line.substring(sp + 1)), i)
    }.toMap

  /** Distributed word-frequency counting + pure merge training: the
    * 100-TB path. One map-side-combinable aggregation over the corpus,
    * a top-`maxVocab` cap (deterministic (count desc, word asc) order),
    * then the bounded merge loop on the driver.
    */
  def trainFromCorpus(
      docs: DataFrame,
      textCol: String,
      numMerges: Int = 200,
      maxVocab: Int = 50000): Vector[(String, String)] = {
    val wf = docs
      .select(explode(
        // translate = ASCII-only case fold, matching [[asciiFold]]
        // exactly on every JVM locale (Spark's lower() delegates
        // non-ASCII strings to locale-sensitive String.toLowerCase)
        regexp_extract_all(
          translate(col(textCol),
            "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"),
          lit("[a-z0-9]+"), lit(0)))
        .as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc)
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    train(wf, numMerges)
  }

  /** Deterministic demo corpus for the oracled driver query
    * (`q_bpe_stats`): fixed English-ish sentences with heavy word reuse
    * so the learned merges are meaningful at 24 rows. Pure data — the
    * DuckDB oracle re-derives expected counts from the SAME pure
    * train/encode functions over the SAME literals.
    */
  val demoCorpus: Seq[(Long, String)] = Seq(
    1L -> "the lower bound is lower than the lowest bound seen so far",
    2L -> "newer tests test the newest tester with the slower test runner",
    3L -> "distributed systems distribute work across distributed workers",
    4L -> "the worker reworked the network while the framework worked",
    5L -> "streaming streams stream the streamed events into the stream",
    6L -> "partition the partitions by the partitioning key of the table",
    7L -> "lower the lowest latency and slow the slowest writer slowly",
    8L -> "the tokenizer tokenizes tokens into smaller token sequences",
    9L -> "encode the encoded encoding with the encoder that encodes",
    10L -> "the cluster clusters clustered records into cluster groups",
    11L -> "shuffle the shuffled partitions with the shuffling shuffler",
    12L -> "a reader reads the readable records and rereads the reread",
    13L -> "the writer writes rewritten records and the rewriter rewrites",
    14L -> "linking the linked linkage links the linker to the linkage",
    15L -> "the scheduler schedules scheduled tasks on the scheduling queue",
    16L -> "hashing hashes the hashed keys with the hasher that rehashes",
    17L -> "the scanner scans scanned files and rescans the rescanned scan",
    18L -> "merge the merged merges with the merger that remerges merges",
    19L -> "the broadcaster broadcasts broadcast variables to the workers",
    20L -> "sorting sorts the sorted records with the sorter that resorts",
    21L -> "the sampler samples sampled rows and resamples the resampled",
    22L -> "caching caches the cached blocks with the cacher that recaches",
    23L -> "the planner plans planned queries on the planning optimizer",
    24L -> "filter the filtered rows with the filtering filter that refilters")
}
