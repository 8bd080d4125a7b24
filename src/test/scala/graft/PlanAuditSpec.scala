package graft

/** Cross-cutting plan audit over EVERY registered query: the plan
  * shapes that must never regress silently. A CartesianProduct (a
  * non-broadcast pair explosion) is banned outright; broadcast
  * nested-loop joins are legitimate only where the operator is BY
  * DESIGN a broadcast × scan (documented allowlist below) — anywhere
  * else one appearing means a join lost its equi-key or a broadcast
  * hint leaked.
  */
class PlanAuditSpec extends SparkSpec {

  // operators that are deliberately broadcast × corpus-scan shaped:
  // the O(n²) exact dedup twins (labeled scale-killers kept as the
  // oracle/refine path), the broadcast-query top-k scans, and the
  // 1-row scalar cross joins (snippet / n_docs / total constants)
  private val bnljByDesign = Set(
    "dedup_embedding", "dedup_embedding_045", "dedup_embedding_090",
    "dedup_embedding_lsh", "dedup_embedding_lsh_090",
    "emb_topk", "emb_quantized_topk", "emb_ivf_topk",
    "a10_recent_distribution", "decontaminate", "tx_unigram_bits",
    "tx_keywords", "a6_sketch_merge",
    // 1-row scalar cross joins (broadcast max_ts / dup-count scalars)
    "o1_recent_readings", "l8_integrity")

  test("no registered query plans a CartesianProduct; BNLJ only by design") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan =
          try fn(spark, Sf0001).queryExecution.executedPlan.toString
          catch { case e: Throwable => fail(s"$name failed to plan: $e") }
        val cartesian = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoop")
        if (cartesian) Some(s"$name: CartesianProduct")
        else if (bnlj && !bnljByDesign(name)) Some(s"$name: undeclared BNLJ")
        else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
