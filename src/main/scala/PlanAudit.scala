object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("plans")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q02_filter_project", "q04_brand_volume", "q03_shipping_priority", "q01_pricing_summary", "q52_minhash_lsh", "q60_knn_bruteforce")) {
      println(s"========== $q")
      println(graft.SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString.take(3500))
    }
    spark.stop()
  }
}
