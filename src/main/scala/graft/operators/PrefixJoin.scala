package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Longest-prefix-match enrichment — the IP → geo/ASN/owner tagging
  * every crawl pipeline runs before per-network curation decisions
  * (politeness budgets, datacenter filtering, per-ASN caps).
  *
  * Relational LPM is awkward (the natural formulation is a per-row
  * scan of a trie); the scale-correct Spark shape used here is one
  * broadcast LEFT join PER DISTINCT PREFIX LENGTH on the masked
  * address, most-specific first, with a coalesce picking the longest
  * hit. The dim table is metadata-sized (a global routing table is
  * ~1M rows) and the length set is at most 33, so the whole operator
  * is a ZERO-SHUFFLE chain of broadcast hash joins over codegen'd
  * mask arithmetic — the fact side is never repartitioned, exploded,
  * or aggregated.
  */
object PrefixJoin {

  private def maskOf(len: Int): Long =
    if (len == 0) 0L else (0xffffffffL << (32 - len)) & 0xffffffffL

  /** facts(factKey, ipCol: IPv4 as a long in [0, 2^32)) enriched
    * against dims(prefix_ip, prefix_len, label): returns
    * (factKey, ipCol, prefix_len, label) for every fact whose address
    * matches at least one prefix, labeled by the LONGEST match.
    * Conflicting labels for one (prefix_len, masked network) collapse
    * deterministically to the minimum label.
    */
  def longestPrefixMatch(facts: DataFrame, factKey: String, ipCol: String,
                         dims: DataFrame): DataFrame = {
    // distinct lengths: <= 33 values, driver-collected by convention
    val lens = dims.select(col("prefix_len").cast("int")).distinct()
      .collect().map(_.getInt(0)).sorted.reverse
    require(lens.nonEmpty && lens.forall(l => l >= 0 && l <= 32),
      "prefix_len must be in [0, 32]")
    val base = facts.select(col(factKey), col(ipCol))
    val joined = lens.foldLeft(base) { (acc, l) =>
      val d = dims.filter(col("prefix_len") === l)
        .select((col("prefix_ip").bitwiseAND(lit(maskOf(l)))).as(s"m_$l"),
          col("label").as(s"label_$l"))
        .groupBy(s"m_$l").agg(min(s"label_$l").as(s"label_$l")) // dim-sized
      acc.join(broadcast(d),
        acc(ipCol).bitwiseAND(lit(maskOf(l))) === d(s"m_$l"), "left")
        .drop(s"m_$l")
    }
    val label = coalesce(lens.map(l => col(s"label_$l")): _*)
    val plen = coalesce(lens.map(l =>
      when(col(s"label_$l").isNotNull, lit(l.toLong))): _*)
    joined.filter(label.isNotNull)
      .select(col(factKey), col(ipCol), plen.as("prefix_len"), label.as("label"))
  }
}
