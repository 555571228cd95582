package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling operator: per-column quality stats for pipeline
  * validation gates. One aggregation pass over the input produces a
  * single wide row (null counts + distinct counts per column), which is
  * then unpivoted driver-free into one row per column — the scan count
  * does not grow with the number of profiled columns.
  *
  * `exact = false` swaps count(DISTINCT) for approx_count_distinct
  * (HLL): at 100 TB the exact variant shuffles every distinct value of
  * every column, the approximate one shuffles fixed-size sketches.
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String] = Seq.empty,
              exact: Boolean = true): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    val aggs = Seq(count(lit(1)).as("__total")) ++ cols.flatMap { c =>
      Seq(
        (count(lit(1)) - count(col(c))).as(s"__nulls_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__distinct_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("column"), col("__total").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"), col(s"__distinct_$c").as("n_distinct"))
    }
    wide.select(explode(array(entries: _*)).as("p"))
      .select("p.column", "p.n_rows", "p.n_nulls", "p.n_distinct")
      .orderBy("column")
  }

  /** Corpus data card — the one-call observability summary a dataset
    * release ships with (Gebru et al., "Datasheets for Datasets"):
    * corpus counts, language mix, exact-duplicate mass, and token-length
    * quantiles as one tall (section, key, value) relation.
    *
    * 100 TB shape: the input projects once to a slim text-free relation
    * (id, lang, digest, token count) that is persisted and fanned into
    * four section aggregates — each a combinable one-shuffle agg
    * (corpus totals, lang-sized group counts, digest-sized dup groups,
    * a quantile over the token-count column). No section rescans the
    * text. All values land in DOUBLE (counts are < 2^53 — exact);
    * persisted projection follows the caller-owned cache lifecycle.
    */
  def dataCard(docs: DataFrame): DataFrame = {
    val slim = docs.select(col("doc_id"), col("lang"),
        md5(col("text")).as("dg"),
        graft.ops.TextAnalysis.tokenCount(col("text")).as("tk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def sec(section: String, key: String, value: Column): DataFrame => DataFrame =
      df => df.select(lit(section).as("section"), lit(key).as("key"), value.as("value"))
    val nDocs = sec("corpus", "n_docs", col("v"))(
      slim.agg(count(lit(1)).cast("double").as("v")))
    val nTokens = sec("corpus", "n_tokens", col("v"))(
      slim.agg(sum(col("tk")).cast("double").as("v")))
    val langs = slim.groupBy(col("lang"))
      .agg(count(lit(1)).cast("double").as("value"))
      .select(lit("lang").as("section"), col("lang").as("key"), col("value"))
    val dupMass = sec("dup", "n_dup_docs", col("v"))(
      slim.groupBy(col("dg")).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .agg(coalesce(sum(col("n")), lit(0L)).cast("double").as("v")))
    val p50 = sec("quality", "p50_tokens", round(col("v"), 6))(
      slim.agg(percentile(col("tk"), lit(0.5)).as("v")))
    nDocs.unionAll(nTokens).unionAll(langs).unionAll(dupMass).unionAll(p50)
  }

  /** MERGEABLE data-card state — [[dataCard]] restructured for the
    * corpus that is maintained, not recomputed: a weekly slice's card
    * statistics publish as a tall `(kind, key, value: long)` relation
    * whose ONLY merge operation is keyed addition, so slices combine
    * associatively ([[mergeCardStates]]) and a takedown subtracts
    * ([[retractCardState]]) — the n159 count algebra applied to the
    * observability layer. State kinds: per-language doc and token
    * counts (`lang_docs` / `lang_tokens`, exact), and a FIXED-EDGE
    * token-count histogram (`tok_bin`, the streaming-quantiles bin
    * convention: edges are parameters, not data, so shard bins align
    * by construction; a VALUE outside [lo, hi] is clamped to the
    * nearest edge BEFORE binning, so every out-of-range token count is
    * recorded as lo or hi — choose `hi` at or above the real range for
    * exact brackets). Bin-occupancy note (ADVICE r12): the integer
    * width `w = ceil((hi - lo + 1) / bins)` over-covers whenever
    * bins does not divide the range, so only bins `0 .. (hi - lo) / w`
    * are reachable — `floor((hi - lo) / w) + 1` occupied bins (241 of
    * 256 at the defaults: w = 17 over [0, 4096]); the effective
    * histogram resolution is that occupied count, not `bins`. The
    * width formula is part of the state's IDENTITY exactly like the
    * edges (changing it orphans every published state), so it is
    * documented rather than repacked. Deliberately NO min/max/HLL
    * rows: min/max cannot
    * retract and HLL cannot subtract — everything in this state is a
    * count, so append/retract interleavings commute exactly (spec
    * law). Zero-valued rows are never emitted (zero IS the absent row
    * — the same convention [[mergeCardStates]] enforces, so merge ≡
    * from-scratch rebuild even for a language whose every text is
    * empty). The edge parameters are part of the state's IDENTITY:
    * every lifecycle call on a state must pass the same (bins, lo,
    * hi) — publish them beside the state (e.g. a
    * [[graft.sources.Manifest]] blob); a mismatched retraction shows
    * up as negative counts, which [[cardFromState]] rejects.
    *
    * 100 TB shape: one grouped agg per shard over a text-free slim
    * projection (lang, token count) — the card state for a slice is
    * langs+bins rows, metadata-sized; the corpus card is then
    * [[cardFromState]] over the merged state and never rescans a byte
    * of retained text.
    */
  def cardState(docs: DataFrame, bins: Int = 256, lo: Long = 0L,
                hi: Long = 4096L): DataFrame = {
    require(bins >= 2 && hi > lo, "need bins >= 2 and hi > lo")
    val w = (hi - lo + bins) / bins
    val slim = docs.select(col("lang"),
      graft.ops.TextAnalysis.tokenCount(col("text")).as("tk"))
    val langRows = slim.groupBy(col("lang")).agg(
        count(lit(1)).as("nd"), sum(col("tk")).as("nt"))
      .select(explode(array(
        struct(lit("lang_docs").as("kind"), col("lang").as("key"),
          col("nd").as("value")),
        struct(lit("lang_tokens").as("kind"), col("lang").as("key"),
          col("nt").cast("long").as("value")))).as("r"))
      .select("r.kind", "r.key", "r.value")
    // integer `div`, not `/` (Column./ is double division). The VALUE
    // clamps into [lo, hi] before binning — so the occupied bins all
    // lie at or below bin(hi), and every bin's bracket [lo + b*w,
    // min(hi, lo + (b+1)*w - 1)] truly contains its members
    val binRows = slim.select(
        expr(s"(least(greatest(tk, ${lo}L), ${hi}L) - ${lo}L) div ${w}L")
          .cast("long").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("value"))
      .select(lit("tok_bin").as("kind"), col("bin").cast("string").as("key"),
        col("value"))
    // zero rows never enter the state: zero is the absent row (keeps
    // merge ≡ rebuild when e.g. a language's every text is empty —
    // its lang_tokens sum is 0 and must be absent on BOTH sides)
    langRows.unionByName(binRows).filter(col("value") =!= 0L)
  }

  /** Keyed addition over two card states — associative and
    * commutative, so any merge tree of shard states lands on
    * [[cardState]] of the union (spec law); zero rows are dropped so a
    * fully-retracted key vanishes exactly as a rebuild would omit it.
    */
  def mergeCardStates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("kind"), col("key"))
      .agg(sum(col("value")).as("value"))
      .filter(col("value") =!= 0L)

  /** Card-state RETRACTION: subtract the removed docs' own shard state
    * (negated merge — counts are the one statistic takedown can undo,
    * which is why [[cardState]] carries nothing else). `removedDocs`
    * is the removed rows themselves (lang + text — the purge pipeline
    * has them in hand when it drops the payload); retraction ≡ the
    * state of the survivors, and interleaves freely with appends.
    */
  def retractCardState(state: DataFrame, removedDocs: DataFrame,
                       bins: Int = 256, lo: Long = 0L,
                       hi: Long = 4096L): DataFrame =
    mergeCardStates(state,
      cardState(removedDocs, bins, lo, hi)
        .select(col("kind"), col("key"), (-col("value")).as("value")))

  /** Render the release card from a maintained state: corpus totals
    * and language mix EXACT (they are sums of state rows), token
    * quantiles as the [lo, hi] BRACKET of the bin holding rank
    * ceil(q·n) (the [[Sketch.histQuantiles]] semantics — the state
    * keeps bin counts, not values, so a bracket is what it can
    * honestly answer). The bracket law holds for the CLAMPED
    * distribution: [[cardState]] records out-of-range values as
    * lo/hi, so a rank landing in an edge bin brackets the clamp
    * point — choose `hi` at or above the real range for exact
    * brackets (the spec pins bracket-contains-clamped-order-statistic).
    * Output: `(section, key, value)` doubles, the [[dataCard]] shape.
    */
  def cardFromState(state: DataFrame, qs: Seq[Double] = Seq(0.5),
                    bins: Int = 256, lo: Long = 0L,
                    hi: Long = 4096L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must lie in (0, 1]")
    // quantile keys label as round(q*100) — a truncating cast would
    // mislabel 0.29 as p28 (0.29*100 = 28.999... in binary); quantiles
    // closer than 0.01 would collide on one label, so refuse them
    val labels = qs.map(q => math.round(q * 100.0))
    require(labels.distinct.size == qs.size,
      s"quantile labels collide: $qs all label p{round(q*100)} — " +
        "quantiles must differ by at least 0.01")
    val w = (hi - lo + bins) / bins
    val st = state.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // a negative count is ALWAYS lifecycle corruption (a retraction
      // applied with different edges, or against the wrong state) —
      // fail fast instead of rendering a silently-wrong card
      val neg = st.filter(col("value") < 0L).limit(1).collect()
      require(neg.isEmpty,
        s"card state carries a negative count (${neg.headOption}) — a " +
          "retraction ran with mismatched (bins, lo, hi) edges or " +
          "against the wrong state; edges are part of the state's identity")
      def sec(section: String, key: Column, value: Column)
             (df: DataFrame): DataFrame =
        df.select(lit(section).as("section"), key.as("key"),
          value.cast("double").as("value"))
      val nDocs = sec("corpus", lit("n_docs"), col("v"))(
        st.filter(col("kind") === "lang_docs")
          .agg(coalesce(sum(col("value")), lit(0L)).as("v")))
      val nTokens = sec("corpus", lit("n_tokens"), col("v"))(
        st.filter(col("kind") === "lang_tokens")
          .agg(coalesce(sum(col("value")), lit(0L)).as("v")))
      val langs = sec("lang", col("key"), col("value"))(
        st.filter(col("kind") === "lang_docs"))
      val cum = st.filter(col("kind") === "tok_bin")
        .select(col("key").cast("long").as("bin"), col("value"))
        .withColumn("cum", sum(col("value")).over(Window.orderBy("bin")))
      val total = st.filter(col("kind") === "tok_bin")
        .agg(coalesce(sum(col("value")), lit(0L)).as("n"))
      val probes = total
        .select(col("n"), explode(array(qs.map(lit): _*)).as("q"))
        .withColumn("r", greatest(ceil(col("q") * col("n")), lit(1L)))
      val bracket = probes.join(cum, col("cum") >= col("r"))
        .groupBy("q", "r").agg(min(col("bin")).as("bin"))
        .select(col("q"), (lit(lo) + col("bin") * w).as("blo"),
          least(lit(hi), lit(lo) + (col("bin") + 1) * w - 1).as("bhi"))
      val qLo = sec("quality", concat(lit("p"),
        round(col("q") * 100).cast("int"), lit("_tokens_lo")),
        col("blo"))(bracket)
      val qHi = sec("quality", concat(lit("p"),
        round(col("q") * 100).cast("int"), lit("_tokens_hi")),
        col("bhi"))(bracket)
      // materialize before releasing the working set (reliable
      // checkpoint when configured — the Iterate flavor choice)
      graft.ops.Iterate.checkpointed(
        nDocs.unionAll(nTokens).unionAll(langs).unionAll(qLo).unionAll(qHi)
          .orderBy("section", "key"))
    } finally st.unpersist(blocking = false)
  }

  /** Per-group feature scaling — the normalization pass before numeric
    * features feed a model: z-score and min-max, with the moments
    * accumulated as INTEGERS (the value is long-cast first), so the
    * group statistics are partition-invariant and replay exactly —
    * variance comes from the closed form (n*Σx² - (Σx)²) / n², never
    * from a streaming float accumulation whose fold order differs per
    * partitioning. One grouped agg (groups-sized) joined back in one
    * pass (AQE broadcasts it); z and mm are then per-row expressions:
    * one subtraction, one division, one sqrt — the engine-exact chain.
    * Degenerate groups (zero variance / zero range) yield null rather
    * than a division artifact. Long overflow bound: n * Σx² must fit
    * 63 bits — at |x| ≤ 2^15 that is ~2^33 rows per group; larger
    * magnitudes should be pre-scaled (this is a feature-scaling pass,
    * not a ledger).
    */
  def scaleFeatures(df: DataFrame, valueCol: String,
                    groupCol: String): DataFrame = {
    val v = col(valueCol).cast("long")
    val stats = df.select(col(groupCol), v.as("__v"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"),
        sum(col("__v") * col("__v")).as("__sq"),
        min(col("__v")).as("__mn"), max(col("__v")).as("__mx"))
    val varNum = (col("__n") * col("__sq") - col("__s") * col("__s"))
    df.join(stats, Seq(groupCol))
      .withColumn("__mean", col("__s").cast("double") / col("__n"))
      .withColumn("z",
        when(varNum > 0L,
          (v.cast("double") - col("__mean")) /
            sqrt(varNum.cast("double") / (col("__n") * col("__n"))))
          .otherwise(lit(null).cast("double")))
      .withColumn("mm",
        when(col("__mx") > col("__mn"),
          (v - col("__mn")).cast("double") / (col("__mx") - col("__mn")))
          .otherwise(lit(null).cast("double")))
      .drop("__n", "__s", "__sq", "__mn", "__mx", "__mean")
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic between groups `ga`
    * and `gb` of `valueCol` — the distribution-shift gate between two
    * corpus slices (new crawl vs old, train vs serve). ENTIRELY
    * integer: D = max over values of |cumA·nB − cumB·nA| (the CDF
    * difference cross-multiplied to clear both denominators), with the
    * attaining value reported (ties to the smallest value). One row:
    * (n_a, n_b, ks_num, ks_x1e6 = 10^6·D/(nA·nB), at_value).
    *
    * Scale shape: one counting agg keyed by value, one cumulative
    * window over the DISTINCT-VALUE relation (metric-cardinality-
    * sized, like the skyline levels — never row-sized), a broadcast
    * of the two totals, and a top-1. Nothing row-sized sorts.
    */
  def ksDrift(df: DataFrame, groupCol: String, valueCol: String,
              ga: String, gb: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = df.filter(col(groupCol).isin(ga, gb))
      .select(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
    val counts = s.groupBy("v").agg(
      sum(when(col("g") === ga, 1L).otherwise(0L)).as("ca"),
      sum(when(col("g") === gb, 1L).otherwise(0L)).as("cb"))
    val totals = counts.agg(sum("ca").as("na"), sum("cb").as("nb"))
    val w = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)
    counts
      .select(col("v"), sum("ca").over(w).as("cuma"), sum("cb").over(w).as("cumb"))
      .crossJoin(broadcast(totals))
      .withColumn("d", abs(col("cuma") * col("nb") - col("cumb") * col("na")))
      .orderBy(col("d").desc, col("v"))
      .limit(1)
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        col("d").as("ks_num"),
        expr("(1000000 * d) div (na * nb)").as("ks_x1e6"),
        col("v").as("at_value"))
  }

  /** Population Stability Index between groups `ga` and `gb` of
    * `valueCol` — the binned drift report that complements [[ksDrift]]
    * (KS gives the max deviation; PSI weights the whole distribution):
    * psi = Σ_bins (p_a − p_b) · ln(p_a / p_b). Bins are fixed-width
    * over the POOLED min/max (integer arithmetic, the n43 binning
    * convention); bins where either side is empty are skipped — the
    * pinned convention instead of an epsilon fudge. Returns one row
    * per populated bin with its contribution (x1e6, rounded) plus the
    * per-bin counts, so the drift is localized, not just totaled.
    *
    * Scale shape: one counting agg keyed by bin (bins-bounded output),
    * the totals broadcast. The ln runs on ratios of exact counts, and
    * the rounding absorbs the engines' sub-ulp ln differences.
    */
  def psiDrift(df: DataFrame, groupCol: String, valueCol: String,
               ga: String, gb: String, bins: Int = 16): DataFrame = {
    require(bins >= 2, "need at least two bins")
    val s = df.filter(col(groupCol).isin(ga, gb))
      .select(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
    val bounds = s.agg(min("v").as("lo"), max("v").as("hi"))
    val binned = s.crossJoin(broadcast(bounds))
      .withColumn("w", expr(s"greatest(1L, (hi - lo + $bins) div $bins)"))
      .withColumn("bin", expr("(v - lo) div w"))
      .groupBy("bin").agg(
        sum(when(col("g") === ga, 1L).otherwise(0L)).as("ca"),
        sum(when(col("g") === gb, 1L).otherwise(0L)).as("cb"))
    val totals = binned.agg(sum("ca").as("na"), sum("cb").as("nb"))
    binned.crossJoin(broadcast(totals))
      .filter(col("ca") > 0 && col("cb") > 0)
      .select(col("bin"), col("ca"), col("cb"),
        round(lit(1000000.0) *
          (col("ca") / col("na") - col("cb") / col("nb")) *
          log(col("ca") / col("na") * col("nb") / col("cb")), 6)
          .as("psi_term_x1e6"))
      .orderBy("bin")
  }

  /** Declarative data-quality report — the Deequ/expectations pattern
    * as three composable relational shapes, each emitting
    * `(rule, n_checked, n_violations, pass)`:
    *
    *   - [[dqColumnRules]]: ALL row-level predicates in ONE scan via
    *     conditional aggregation (never a pass per rule);
    *   - [[dqUnique]]: key uniqueness as `rows − distinct keys`
    *     (two combinable aggs, no self-join);
    *   - [[dqReferential]]: orphan detection as a LEFT ANTI join
    *     count (broadcast when the parent key set is small).
    *
    * Union the rows into one report (the n134 query does); `pass` is
    * `n_violations == 0`, so the report doubles as a circuit-breaker
    * relation a pipeline can crash on.
    */
  def dqColumnRules(df: DataFrame,
                    rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = count(lit(1)).as("_n") +:
      rules.map { case (name, violated) =>
        sum(when(violated, 1L).otherwise(0L)).as(s"_v_$name")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    rules.map { case (name, _) =>
      one.select(lit(name).as("rule"), col("_n").as("n_checked"),
        col(s"_v_$name").as("n_violations"),
        (col(s"_v_$name") === 0L).as("pass"))
    }.reduce(_ unionAll _)
  }

  def dqUnique(df: DataFrame, cols: Seq[String], rule: String): DataFrame = {
    // NULL-key convention pinned to SQL COUNT(DISTINCT): a key with any
    // NULL component never counts as a distinct value (count_distinct
    // over a bare struct would — struct(NULL) is itself non-null), so a
    // NULL-keyed row is a uniqueness VIOLATION, exactly as the oracle's
    // count(*) - count(DISTINCT key) scores it. One semantics, both
    // engines, NULL fixtures included.
    val key = when(cols.map(col(_).isNotNull).reduce(_ && _),
      struct(cols.map(col): _*))
    df.agg(count(lit(1)).as("_n"), count_distinct(key).as("_d"))
      .select(lit(rule).as("rule"), col("_n").as("n_checked"),
        (col("_n") - col("_d")).as("n_violations"),
        (col("_n") === col("_d")).as("pass"))
  }

  def dqReferential(child: DataFrame, childCol: String,
                    parent: DataFrame, parentCol: String,
                    rule: String): DataFrame = {
    val orphans = child.join(
        parent.select(col(parentCol).as(childCol)).distinct(),
        Seq(childCol), "left_anti")
      .agg(count(lit(1)).as("_v"))
    child.agg(count(lit(1)).as("_n")).crossJoin(orphans)
      .select(lit(rule).as("rule"), col("_n").as("n_checked"),
        col("_v").as("n_violations"), (col("_v") === 0L).as("pass"))
  }

  /** Laplace-mechanism noisy count release per group (Dwork et al.
    * 2006): `released = n + Laplace(Δ/ε)` with sensitivity Δ = 1 for
    * counting queries — the standard mechanism for publishing
    * per-group statistics of a private corpus.
    *
    * The noise draw here is DERIVED, not random: a seeded hash of the
    * group key (`fmix64(fnv64(group) + seed)` → 53-bit uniform →
    * inverse-CDF Laplace), so the release replays bit-for-bit for the
    * oracle and for reproducible pipeline tests. A REAL privacy
    * release must swap this stream for a CSPRNG draw — the mechanism,
    * sensitivity, and scale calculus are unchanged (same honesty
    * convention as the multimodal decode stubs). `noise_x1e6` is
    * rounded at 1e-6, which absorbs sub-ulp `ln` differences between
    * engines (the n122 convention); the released count adds the
    * integral part (truncating division, both engines).
    *
    * One map-side-combinable counting agg; the noise is a per-GROUP
    * column expression on the groups-sized aggregate — nothing
    * corpus-scale happens after the count.
    */
  def dpNoisyCounts(df: DataFrame, groupCol: String, b: Double,
                    seed: Long): DataFrame = {
    require(b > 0, s"Laplace scale must be positive, got $b")
    import org.apache.spark.sql.graft.GraftFunctions.{fmix64, fnv64}
    // bits clamped to >= 1: a key whose 53-bit draw lands exactly on 0
    // would put log(0) = -Inf through the inverse CDF (a deterministic
    // seed-dependent landmine); u = 2^-53 caps |noise| at ~36.7b
    val u = greatest(
      shiftrightunsigned(fmix64(fnv64(col(groupCol)) + lit(seed)), 11), lit(1L))
      .cast("double") / lit(9007199254740992.0) // 2^53
    val noise = -lit(b) * signum(u - lit(0.5)) *
      log(lit(1.0) - lit(2.0) * abs(u - lit(0.5)))
    df.groupBy(groupCol).agg(count(lit(1)).as("n"))
      .withColumn("noise_x1e6", round(noise * lit(1000000.0)).cast("long"))
      .withColumn("released", col("n") + expr("noise_x1e6 div 1000000"))
  }
}
