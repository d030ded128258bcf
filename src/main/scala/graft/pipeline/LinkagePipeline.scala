package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.TableIO

/** The record-linkage pipeline (north rule): read repo-file table ->
  * tokenize -> phonetic blocking keys (exploded multi-code) -> salted/
  * capped candidate pairs -> batch pairwise scoring -> edges -> transitive
  * closure -> (file_id, cluster_id), every stage checkpointed through
  * [[TableIO]] so a killed job resumes from the last committed snapshot.
  *
  * The per-row `content_sha` (sha2-256 of content) is carried from the
  * input to the final output; `shaInvariantHolds` proves no row was
  * corrupted or dropped across the stages.
  */
final class LinkagePipeline(
    spark: SparkSession,
    io: TableIO,
    maxBlockSize: Int = 10000,
    neighborWindow: Int = 3) {

  graft.functions.GraftFunctions.register(spark)

  /** Run (or resume) the full pipeline over `files`
    * (file_id, repo, path, commit, lang, content[, content_sha]).
    * Returns (file_id, repo, path, commit, lang, content_sha, cluster_id).
    */
  def run(files: DataFrame): DataFrame = {
    val input = io.stage("input") {
      val withSha =
        if (files.columns.contains("content_sha")) files
        else files.withColumn("content_sha", sha2(col("content"), 256))
      withSha
    }

    val tokens = io.stage("tokens", upstream = Seq("input")) {
      // file count comes from the input stage's commit manifest — lineage
      // metadata recorded during the write, so no extra count job here
      Tokenizer.pruneCommon(Tokenizer.tokenize(input),
        knownFileCount = io.committedRows("input").getOrElse(-1L))
    }

    val keys = io.stage("blocking_keys", upstream = Seq("tokens")) {
      Blocking.blockingKeys(tokens)
    }

    val pairs = io.stage("candidate_pairs", upstream = Seq("blocking_keys")) {
      // keys is a committed stage: the sizing and pairing branches
      // re-read durable parquet instead of pinning an in-memory copy
      Blocking.candidatePairs(keys, maxBlockSize, neighborWindow,
        materializeKeys = false)
    }

    val scored = io.stage("scored_pairs", upstream = Seq("candidate_pairs")) {
      Scoring.score(pairs)
    }

    val edges = io.stage("edges", upstream = Seq("scored_pairs")) {
      Scoring.edges(scored)
    }

    val clusters = io.stage("clusters", upstream = Seq("edges", "input")) {
      // durable loop snapshots every 8 rounds: a mid-closure kill resumes
      // the loop from the newest snapshot instead of replaying all rounds.
      // Snapshots are stamped with the edges stage's opaque commit token
      // (not its timestamp — equality of tokens is immune to clock skew
      // between writer hosts) so a snapshot computed against a
      // since-recomputed edge set is discarded instead of silently
      // resumed.
      ConnectedComponents.run(
        spark,
        input.select("file_id"),
        edges,
        durable = Some((io, 8)),
        lineageToken = io.committedToken("edges").getOrElse(""),
        canonicalEdges = true) // Scoring.edges: distinct, src < dst
    }

    // output partitioned by lang (low cardinality): downstream consumers
    // that read one language's slice get storage-level partition pruning
    // instead of a full scan — the layout choice that matters at 10^12
    // rows
    io.stage("resolved", upstream = Seq("clusters", "input"),
      partitionBy = Seq("lang")) {
      input
        .select("file_id", "repo", "path", "commit", "lang", "content_sha")
        .join(clusters, "file_id")
    }
  }

  /** Per-row sha256(content) equality between pipeline output and input. */
  def shaInvariantHolds(files: DataFrame, resolved: DataFrame): Boolean = {
    val expected = files
      .select(col("file_id"),
        sha2(col("content"), 256).as("expected_sha"))
    val mismatches = resolved
      .join(expected, Seq("file_id"), "full")
      .where(
        col("content_sha").isNull || col("expected_sha").isNull ||
          col("content_sha") =!= col("expected_sha"))
      .limit(1)
      .count()
    mismatches == 0
  }
}
