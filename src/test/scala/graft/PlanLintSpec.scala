package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.{GlobalLimitExec, LocalTableScanExec, RangeExec, TakeOrderedAndProjectExec}
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}

/** Plan-lint regression gate over EVERY SparkEntry query (VERDICT r7
  * top item): the per-round manual plan audits, turned into a spec
  * that fails the build if a future query ships a scale-killer plan.
  *
  * Lints, on the pre-AQE physical plan (subqueries included):
  *   - `CartesianProductExec` — never acceptable outside the declared
  *     audit allowlist;
  *   - `BroadcastNestedLoopJoinExec` whose build side is NOT provably
  *     tiny — acceptable only when the broadcast side is a scalar
  *     (no-grouping) aggregate, a small limit, a literal local
  *     relation, or a small range (the "scalar crossJoin" pattern the
  *     repo uses for totals/bounds), or when the query is on the
  *     allowlist.
  *
  * The allowlist entries are the AUDIT-PRICED queries whose quadratic
  * or broadcast construction is their documented contract (see
  * PLANS.md "plan-lint allowlist"): exactness baselines and
  * recall-audit truth sides that exist to price the scale path, plus
  * guarded brute-force kernels whose inputs carry an explicit
  * `require(n <= cap)` instead of a plan-level bound.
  */
class PlanLintSpec extends SparkSpec {

  /** A BNLJ side that is provably metadata-sized: strip row-preserving
    * (or row-reducing) unary wrappers — project/filter/exchange/sort —
    * then demand the node itself bounds its output (scalar agg, small
    * literal relation, small limit, small range). Deliberately NOT a
    * subtree exists(): a corpus-sized join that merely CONTAINS a
    * scalar aggregate somewhere below (documents.crossJoin(total).join
    * ...) must not pass; any node that can multiply rows (join,
    * generate, union, grouped agg) stops the walk and fails the check.
    */
  private def tiny(p: SparkPlan): Boolean = p match {
    case w: org.apache.spark.sql.execution.ProjectExec => tiny(w.child)
    case w: org.apache.spark.sql.execution.FilterExec => tiny(w.child)
    case w: org.apache.spark.sql.execution.SortExec => tiny(w.child)
    case w: org.apache.spark.sql.execution.CoalesceExec => tiny(w.child)
    case w: org.apache.spark.sql.execution.exchange.Exchange => tiny(w.child)
    case w: org.apache.spark.sql.execution.LocalLimitExec => tiny(w.child)
    case w: org.apache.spark.sql.execution.window.WindowExec => tiny(w.child)
    case a: BaseAggregateExec =>
      a.groupingExpressions.isEmpty || tiny(a.child) // scalar agg: 1 row
    // a generate over a tiny child explodes ONE row's arrays — the
    // engine's axis-generation idiom (sequence over a scalar bounds
    // row, E4), bounded by the axis length, never by the corpus
    case g: org.apache.spark.sql.execution.GenerateExec => tiny(g.child)
    case u: org.apache.spark.sql.execution.UnionExec => u.children.forall(tiny)
    case l: LocalTableScanExec => l.rows.size <= 256 // literal relation
    case g: GlobalLimitExec => g.limit <= 256
    case t: TakeOrderedAndProjectExec => t.limit <= 256
    case r: RangeExec => r.numElements <= BigInt(256)
    case _ => false
  }

  private def violations(plan: SparkPlan): Seq[String] =
    plan.collectWithSubqueries {
      case c: CartesianProductExec => Seq(s"CartesianProduct")
      case b: BroadcastNestedLoopJoinExec =>
        // a BNLJ is bounded when EITHER side is provably metadata-sized:
        // tiny build = the scalar-crossJoin pattern (totals/bounds
        // riding along a scan); tiny stream = a literal/range row probed
        // against a broadcast relation (the planted-row union branches)
        if (tiny(b.left) || tiny(b.right)) Seq.empty
        else Seq(s"BroadcastNestedLoopJoin(non-tiny both sides, ${b.joinType})")
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty =>
        // an empty-partition window moves ALL rows to one task — fine
        // as a final presentation over an already-bounded relation
        // (top-k/limit/scalar subtree), a corpus-killer anywhere else
        // (the "WindowExec: No Partition Defined" warnings the bench
        // log shows must all be of the bounded kind)
        if (tiny(w.child)) Seq.empty
        else Seq("GlobalWindow(non-tiny child)")
    }.flatten

  /** Audit-priced / guarded queries allowed to plan a non-tiny BNLJ
    * or cartesian construction — each with the in-code guard or
    * pricing convention that sanctions it (PLANS.md).
    */
  private val allow: Map[String, String] = Map(
    "n20_embedding_allpairs" ->
      "allPairsExact: O(n^2) exactness baseline, require(n <= 200k) guard",
    "n08_knn_bruteforce" ->
      "bruteForceTopK: exact baseline, require(queries <= maxQueries) guard",
    "n137_hard_negatives" ->
      ("hardNegatives: guarded brute-force scorer (same shape as n08); " +
        "positives/queries broadcast by declared contract"),
    "n45_int8_quantize" ->
      ("quantized-vs-exact cosine audit against ONE query vector (the " +
        "1-row filter is a parquet scan the plan cannot prove tiny)"),
    "n46_knn_int8" ->
      ("quantizedTopK shortlist scoring: query side filtered to 3 rows, " +
        "broadcast — the guarded brute-force query-side convention"),
    "n123_retrieval_metrics" ->
      "recall@k/MRR need the guarded bruteForceTopK truth ranking",
    "n147_rbo" ->
      ("RBO audits the SAME retriever pair as n123 (guarded " +
        "bruteForceTopK truth + int8TopK candidate, both query-side " +
        "bounded); the RBO fold itself is top-k-list-sized"),
    "n69_hybrid_rrf" ->
      "fusion's vector arm is the guarded bruteForceTopK truth retriever",
    "n117_matryoshka" ->
      ("prefixDimAudit: full-dim vs prefix-dim brute-force rankings, " +
        "nQueries-bounded query side"),
    "n140_margin_mining" ->
      ("marginMine: guarded brute-force cross-scoring (require(|A| <= " +
        "cap)) — the exactness baseline the ANN-shortlist mining path " +
        "degrades gracefully from"),
    "n54_semantic_contamination" ->
      ("contamination scan broadcasts the eval set by declaration " +
        "(benchmark-sized; an eval too big to broadcast is a near-dup " +
        "problem, per the operator scaladoc)"),
    "n79_hll_overlap" ->
      ("register-algebra pairwise joins are sketch-sized by construction " +
        "(sources^2 x 2^p register rows, never corpus rows)"),
    "n126_kmeans" ->
      ("broadcast centroid table is k-bounded (grouped agg keyed by " +
        "cluster, k=4) — a bound a static plan walk cannot see"),
    "n132_cluster_profile" ->
      "same k-bounded centroid broadcasts as n126 (shared kernel)",
    // global-window (empty partitionSpec) entries: every one is a
    // window over a relation a grouped aggregation already reduced to
    // metadata size — a cardinality bound the static walk cannot see
    // (the n126 class). The corpus-sized input is consumed by the agg
    // BELOW the window in each of these plans.
    "g48_spatial_sum_acf" ->
      ("ACF lag windows run over the per-timestep domain-total series " +
        "(time-axis-bounded groupBy(time) agg), not grid cells"),
    "n120_good_turing" ->
      ("Good-Turing lead window over the count-of-counts relation " +
        "(<= maxR rows after the frequency-of-frequencies agg)"),
    "n121_ks_drift" ->
      ("KS cumulative window over DISTINCT values of the drift column " +
        "(grouped agg below the window), not corpus rows"),
    "n43_hist_quantiles" ->
      ("quantile-bracket windows over the bins-bounded histogram " +
        "relation (64 bins), exact-audit side included"),
    "n59_budget_select" ->
      ("greedy-prefix window over the score-histogram level relation " +
        "(histogram-threshold decomposition — the operator exists to " +
        "avoid the corpus-wide ORDER BY)"),
    "q53_skyline" ->
      ("running max over the distinct-price LEVEL relation; the " +
        "Skyline scaladoc documents the range-partitioned two-phase " +
        "fallback if levels ever outgrow one task"))

  test("no scale-killer plans outside the documented audit allowlist") {
    val bad = scala.collection.mutable.ListBuffer.empty[String]
    val stale = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val vs =
        try violations(fn(spark, sf).queryExecution.sparkPlan)
        catch { case e: Throwable =>
          bad += s"$name: failed to plan: ${e.getMessage}"; Seq.empty
        }
      if (vs.nonEmpty && !allow.contains(name))
        bad += s"$name: ${vs.mkString(", ")}"
      if (vs.isEmpty && allow.contains(name)) stale += name
    }
    assert(bad.isEmpty,
      s"\nscale-killer plans detected (extend the PLANS.md allowlist ONLY " +
      s"for documented audit pricing):\n  ${bad.mkString("\n  ")}")
    assert(stale.isEmpty,
      s"allowlist entries no longer needed (query plans clean now — " +
      s"remove them): ${stale.mkString(", ")}")
  }

  test("the lint itself catches a corpus-sized global window (negative control)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // a window with no partition over a raw table scan — the exact
    // shape the GlobalWindow lint exists to reject
    val bad = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("rn", row_number().over(Window.orderBy(col("doc_id"))))
    assert(violations(bad.queryExecution.sparkPlan)
      .exists(_.startsWith("GlobalWindow")),
      "corpus-sized global window not flagged")
    // and the bounded presentation idiom stays clean: the same window
    // above a small limit
    val ok = spark.read.parquet(s"$sf/documents.parquet").limit(25)
      .withColumn("rn", row_number().over(Window.orderBy(col("doc_id"))))
    assert(violations(ok.queryExecution.sparkPlan).isEmpty,
      "limit-bounded global window wrongly flagged")
  }
}
