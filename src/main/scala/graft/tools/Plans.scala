package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for representative queries — the evidence
  * trail that scans prune/push down, small joins broadcast, aggregates run
  * partial+final, and sort+limit plans as TakeOrderedAndProject. */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val interesting = Seq(
      "q1_agg", "q_filter_complex", "q_join_inner", "q_topk",
      "q_dedup_minhash", "q_sim_topk", "q_ev_tumbling",
      "q_sim_lsh_verify", "q_dedup_lsh_pairs", "q_dedup_jaccard",
      "q_ev_latest", "q_tpch_q18", "q_txt_bigrams", "q_dedup_incremental",
      "q_sim_centroid", "q_sample_stratified", "q_profile", "q_ev_retention",
      "q_txt_winnow", "q_txt_lm_score", "q_txt_redact", "q_sim_hamming",
      "q_dedup_substr", "q_ev_attribution", "q_ev_lifecycle",
      "q_mm_phash", "q_dq_refint", "q_pipeline_curate",
      "q_tpch_q2", "q_tpch_q9", "q_tpch_q11", "q_tpch_q12", "q_tpch_q16",
      "q_tpch_q20", "q_dq_keys", "q_approx_distinct", "q_sim_ivf")
    interesting.foreach { name =>
      println(s"\n===== $name =====")
      println(graft.SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
