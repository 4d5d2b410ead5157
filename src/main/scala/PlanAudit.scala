object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("plans")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q02_filter_project", "q04_brand_volume", "q03_shipping_priority",
        "q01_pricing_summary", "q52_minhash_lsh", "q60_knn_bruteforce",
        "q26_grouping_sets", "q27_window_range", "q66_band_join",
        "q67_exists_correlated", "q74_simhash_pairs", "q81_tfidf",
        "q64_decontaminate", "q89_token_budget", "q100_passage_dedup",
        "q101_pagerank", "q102_salted_join", "q107_snapshot_diff",
        "q110_nfc_normalize")) {
      println(s"========== $q")
      println(graft.SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString.take(3500))
    }
    spark.stop()
  }
}
