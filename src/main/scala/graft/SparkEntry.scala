package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Every entry in [[queries]]
  * that has a deterministic, SQL-expressible semantics also has a DuckDB
  * oracle in [[oracleSql]] (driver hash-compares at sf0.01); entries without
  * an oracle get the weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.registry ++
      graft.queries.Events.registry ++
      graft.queries.TextAnalysis.registry ++
      graft.queries.Dedup.registry ++
      graft.queries.Similarity.registry ++
      graft.queries.MultimodalQ.registry ++
      graft.queries.Advanced.registry ++
      graft.queries.Analytics.registry

  /** The BENCH lane's query set: [[queries]] with oracle-verifier
    * constructs swapped for operator-cost forms. `q_dedup_index_append`'s
    * registry form embeds a full-corpus recompute + full-outer compare —
    * the bit-identity PIN for incremental ingestion (kept, unchanged, in
    * the correctness gate) — which priced the *verifier* at ~36 s of every
    * bench run; the bench form runs the same build + O(batch) append and
    * checks the append's own O(|edges|) invariants instead. */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    queries -- Seq("q_dedup_index_append", "q_dedup_indexed",
        "q_dedup_ppjoin_indexed", "q_dedup_index_merge",
        "q_dedup_index_forget") +
      ("q_dedup_index_append_bench" ->
        ((s: SparkSession, d: String) =>
          graft.queries.Dedup.qDedupIndexAppendBench(s, d))) +
      ("q_dedup_index_merge_bench" ->
        ((s: SparkSession, d: String) =>
          graft.queries.Dedup.qDedupIndexMergeBench(s, d))) +
      ("q_dedup_index_forget_bench" ->
        ((s: SparkSession, d: String) =>
          graft.queries.Dedup.qDedupIndexForgetBench(s, d))) +
      ("q_dedup_indexed_bench" ->
        ((s: SparkSession, d: String) =>
          graft.queries.Dedup.qDedupIndexedBench(s, d))) +
      ("q_dedup_ppjoin_indexed_bench" ->
        ((s: SparkSession, d: String) =>
          graft.queries.Dedup.qDedupPpjoinIndexedBench(s, d)))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.Events.oracles ++
      graft.queries.TextAnalysis.oracles ++
      graft.queries.Dedup.oracles ++
      graft.queries.Similarity.oracles ++
      graft.queries.MultimodalQ.oracles ++
      graft.queries.Advanced.oracles ++
      graft.queries.Analytics.oracles
}
