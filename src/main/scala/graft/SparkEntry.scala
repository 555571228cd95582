package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.BBox
import graft.operators.{AsOfJoin, Crop, Gssha, PointExtract, Reproject, SaltedJoin, SpatialResample, TemporalResample, VariableMerge}
import graft.ops.{Dedup, Ivf, Multimodal, Similarity, TextAnalysis}
import graft.sources.{SyntheticGrid, Tables}
import graft.streaming.EventStreams

/** Driver contract (see SURVEY.md §7): one `queries` entry per
  * implemented operator from SURVEY.md §2, with equivalent DuckDB SQL in
  * `oracleSql` for the hash-match correctness gate.
  *
  * Conventions that keep the cross-engine compare exact:
  *  - every query has a deterministic total ORDER BY on non-null keys;
  *  - floating-point results of order-dependent reductions are rounded
  *    (round(x, n) on identical doubles agrees across engines);
  *  - Spark int-typed results (row_number, size) are cast to long to
  *    match DuckDB's BIGINT;
  *  - grid queries derive from `SyntheticGrid` whose values are exact
  *    binary fractions (order-independent sums — see SyntheticGrid).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Embeddings fixture + deterministically planted near-duplicates
    * (shared by n14/n23): copies of vec_id < 3 scaled by
    * 1 + 1e-6*(vec_id+1), recast to float, re-idd at +1000000. Positive
    * scaling preserves every sign-LSH hyperplane bit, so the planted
    * pairs are recalled with probability 1 and the exact all-pairs
    * oracle is a true set equality on a non-empty result. SQL twin:
    * [[plantedEmbCte]].
    */
  private def plantedEmbeddings(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "embeddings").select("vec_id", "embedding")
    base.unionAll(base.filter(col("vec_id") < 3)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"),
          x => (x * (lit(1.0) + lit(1e-6) * (col("vec_id") + 1))).cast("float"))
          .as("embedding")))
  }

  /** documents ∪ exact copies of the three lowest-id docs (ids offset
    * by 1,000,000, text unchanged): the fixture alone has no duplicate
    * texts, so without planting the exact-dedup oracle is an identity
    * map and the dup-groups oracle is the empty set — the same vacuity
    * the round-4 verdict flagged for n14. SQL twin: [[plantedDocsCte]].
    */
  private def plantedDocs(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents")
    base.unionAll(base.filter(col("doc_id") < 3)
      .withColumn("doc_id", col("doc_id") + 1000000L))
  }

  /** Planted encoding damage for n114 (SQL twin inline in the oracle
    * via chr() codes): one U+FFFD, one C1 control (U+0085 NEL), three
    * 'Ã' UTF-8-as-latin1 pairs (café / naïve / ë).
    */
  private val mojibakeSuffix: String =
    " caf\u00c3\u00a9 na\u00c3\u00afve \ufffd x\u0085y \u00c3\u00ab"

  private val plantedDocsCte: String =
    """pd AS (
      | SELECT doc_id, text, n_chars FROM documents
      | UNION ALL
      | SELECT doc_id + 1000000 AS doc_id, text, n_chars
      | FROM documents WHERE doc_id < 3)""".stripMargin

  // DuckDB twin of plantedEmbeddings: float mult in double then recast
  // to FLOAT is IEEE-identical to Spark's transform+cast
  private val plantedEmbCte: String =
    """planted AS (
      | SELECT vec_id + 1000000 AS vec_id,
      |  list_transform(embedding,
      |    x -> CAST(x * (1e0 + 1e-6 * (vec_id + 1)) AS FLOAT)) AS embedding
      | FROM embeddings WHERE vec_id < 3),
      |allv AS (
      | SELECT vec_id, embedding FROM embeddings
      | UNION ALL SELECT vec_id, embedding FROM planted),
      |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM allv)""".stripMargin

  /** Flagship: the reference's signature pipeline (SURVEY.md §3.1+§3.2)
    * — load a grid dataset via the accessor registry, crop to AOI and
    * time range, extract a points-to-wide time-series table. 73 rows.
    */
  def entry(spark: SparkSession): DataFrame = {
    val g = graft.sources.SourceRegistry.get("SyntheticEra5")
      .load(spark, "synthetic-era5-single-levels", Seq("t2m"),
        bbox = Some(BBox(-83.5, 41.25, -79.0, 42.75)),
        timeRange = Some(("2019-01-30 00:00:00", "2019-02-02 00:00:00")))
    PointExtract.pointsToTable(g, points, "t2m")
  }

  /** DuckDB replay of [[graft.ops.TextAnalysis.bigramCrossEntropy]] —
    * one definition shared by the n51 oracle and every oracle that
    * composes the score (n57), so the replays can never drift.
    * Emits (doc_id, n_bigrams, avg_nll), no ORDER BY.
    */
  private val bigramNllSql: String =
    """WITH g AS (SELECT doc_id, text,
      |  unnest(generate_series(1, strlen(text) - 1)) AS pos
      | FROM documents WHERE strlen(text) >= 2),
      |g2 AS (SELECT doc_id,
      |  unicode(substr(text, pos, 1)) * 65536 + unicode(substr(text, pos + 1, 1)) AS bigram
      | FROM g),
      |dg AS (SELECT doc_id, bigram, CAST(count(*) AS BIGINT) AS occ
      |       FROM g2 GROUP BY doc_id, bigram),
      |counts AS (SELECT bigram, CAST(sum(occ) AS BIGINT) AS cnt
      |           FROM dg GROUP BY bigram),
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM counts),
      |perdoc AS (SELECT doc_id, CAST(sum(occ) AS BIGINT) AS n_bigrams,
      |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list(occ * ln(cnt) ORDER BY bigram)), (acc, x) -> acc + x) AS sum_ln
      | FROM dg JOIN counts USING (bigram) GROUP BY doc_id)
      |SELECT doc_id, n_bigrams,
      | round(ln(total) - sum_ln / n_bigrams, 6) AS avg_nll
      |FROM perdoc, tot""".stripMargin

  /** BM25 oracle CTE chain ending in `pd(query_id, doc_id, n_terms,
    * score)` — shared by n65 (direct search) and n69 (hybrid fusion).
    * Constants are rendered from the SAME Scala doubles bm25Search
    * multiplies by (dlit round-trips exactly) and every expression
    * tree is parenthesized identically to the Column tree.
    */
  private def bm25Ctes(valuesSql: String, where: String = ""): String = {
    val k1 = dlit(1.2); val bb = dlit(0.75)
    val k1p1 = dlit(1.2 + 1.0); val oneMinusB = dlit(1.0 - 0.75)
    s"""q(query_id, qtext) AS (VALUES
       |  $valuesSql),
       |tok AS (SELECT doc_id,
       |    unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS term
       |  FROM documents$where),
       |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
       |       FROM tok GROUP BY doc_id),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS nd,
       |    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
       |qt AS (SELECT DISTINCT query_id, term FROM (
       |  SELECT query_id,
       |    unnest(list_filter(string_split(qtext, ' '), w -> w <> '')) AS term
       |  FROM q)),
       |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |       FROM tok WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
       |dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |sc AS (SELECT qt.query_id, tf.doc_id, qt.term,
       |    ln((CAST(nd AS DOUBLE) - df + 0.5e0) / (df + 0.5e0) + 1e0) *
       |    ((tf * $k1p1) / (tf + $k1 * ($oneMinusB + $bb * (dl / avgdl)))) AS s
       |  FROM qt JOIN tf USING (term) JOIN dfr USING (term)
       |    JOIN dl ON tf.doc_id = dl.doc_id, stats),
       |pd AS (SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_terms,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list(s ORDER BY term)), (acc, x) -> acc + x) AS score
       |  FROM sc GROUP BY query_id, doc_id)""".stripMargin
  }

  // ---- constants shared by Spark queries and oracle SQL ---------------
  private val xa = SyntheticGrid.meta.xAxis.get
  private val ya = SyntheticGrid.meta.yAxis.get
  // bbox crop (P2): raw box snaps to nearest grid lines
  private val cropBox = BBox(-82.9, 41.6, -80.2, 42.4)
  private val cxLo = xa.nearestValue(cropBox.west)
  private val cxHi = xa.nearestValue(cropBox.east)
  private val cyLo = ya.nearestValue(cropBox.south)
  private val cyHi = ya.nearestValue(cropBox.north)
  // reference sample points (FIXTURES.md §1), snapped to cells
  private val points = Seq(("p0", -82.98, 41.63), ("p1", -79.43, 42.88), ("p2", -83.23, 41.85))
  private val snapped = points.map { case (id, lon, lat) =>
    (id, xa.nearestValue(lon), ya.nearestValue(lat))
  }
  // small 2x2-cell box for the upsample queries
  private val upBox = BBox(-83.5, 41.25, -83.25, 41.5)

  private val grid = SyntheticGrid.sqlCte // WITH-clause body for oracles
  // deterministic CMR granule-entry fixtures (reference response shapes:
  // nasa_from_LPDAAC.py:322-342 — 'boxes' as "S W N E", or a polygon
  // ring of "lat lon lat lon ..." to reduce); shared with the oracle
  private val cmrEntries = Seq(
    """{"producer_granule_id":"G01","boxes":["41.0 -84.0 43.0 -79.0"],"time_start":"2019-01-30T00:00:00.000Z","time_end":"2019-01-31T00:00:00.000Z"}""",
    """{"producer_granule_id":"G02","polygons":[["41.5 -83.0 42.5 -80.0 41.75 -81.25 42.25 -82.5"]],"time_start":"2019-02-01T06:30:00.000Z","time_end":"2019-02-02T00:00:00.000Z"}""",
    """{"producer_granule_id":"G03","boxes":["40.25 -85.5 44.0 -78.25"],"time_start":"2019-03-01T12:00:00.000Z","time_end":"2019-03-02T12:00:00.000Z"}""",
    """{"producer_granule_id":"G04","polygons":[["39.875 -80.125 41.0 -79.0"]],"time_start":"2019-04-01T00:00:00.000Z","time_end":"2019-04-01T23:59:59.000Z"}""")
  // target axes for the spatial-resample queries (shared with oracles)
  private val xt2 = SpatialResample.targetAxis(xa, 2.0)
  private val yt2 = SpatialResample.targetAxis(ya, 2.0)
  // half-resolution target axes for the aggregating downsample kernels
  private val xth = SpatialResample.targetAxis(xa, 0.5)
  private val yth = SpatialResample.targetAxis(ya, 0.5)
  // raster west/south edges (GDAL geometry) for the block-membership rule
  private val blockWx = xa.origin - xa.step / 2.0
  private val blockWy = ya.origin - ya.step / 2.0
  // projected (GLanCE LAEA) twin of the synthetic axes for the reproject
  // query: exact power-of-two meters so index recomputation is exact
  private val glXa = graft.model.AxisSpec(1310720.0, 32768.0, SyntheticGrid.NX)
  private val glYa = graft.model.AxisSpec(-1048576.0, 32768.0, SyntheticGrid.NY)
  // force-DOUBLE literal (DuckDB parses long fractional literals as
  // DECIMAL; exponent notation always parses as DOUBLE)
  private def dlit(v: Double): String = {
    val s0 = v.toString
    if (s0.contains("E")) s0 else s0 + "e0"
  }
  // FNV-1a-64 over a string's UTF-16 units (two byte steps per char),
  // replayed by DuckDB in HUGEINT mod 2^64 — shared by the native-
  // expression oracles (n11/n15)
  private def fnvSql(arg: String): String =
    (s"list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), " +
     s"list_transform(list_filter(string_split_regex($arg, ''), ch -> ch <> ''), " +
     s"ch -> CAST(unicode(ch) AS HUGEINT))), " +
     s"(acc, c) -> (xor((xor(acc, c & 255) * 1099511628211) & 18446744073709551615, " +
     s"(c >> 8) & 255) * 1099511628211) & 18446744073709551615)")
  // whitespace-token simhash (per-bit majority votes over token FNVs)
  // as a CTE producing (doc_id, sh BIGINT)
  private def simhashCte: String =
    s"""shs AS (SELECT doc_id,
       |  CAST(CASE WHEN shu >= CAST(1 AS HUGEINT) << 63
       |            THEN shu - (CAST(1 AS HUGEINT) << 64) ELSE shu END AS BIGINT) AS sh
       | FROM (SELECT doc_id,
       |   list_sum(list_transform(generate_series(0, 63), b ->
       |     CASE WHEN 2 * len(list_filter(hl, h -> (h >> b) % 2 = 1)) > len(hl)
       |          THEN CAST(1 AS HUGEINT) << b ELSE CAST(0 AS HUGEINT) END)) AS shu
       |  FROM (SELECT doc_id,
       |    list_transform(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''),
       |      tok -> ${fnvSql("tok")}) AS hl
       |   FROM documents)))""".stripMargin
  // unsigned rendering of a signed long for HUGEINT literals
  private def uns(l: Long): java.math.BigInteger =
    if (l >= 0) java.math.BigInteger.valueOf(l)
    else java.math.BigInteger.valueOf(l).add(java.math.BigInteger.ONE.shiftLeft(64))

  // murmur3 fmix64 in HUGEINT mod 2^64, shared by the minhash and HLL
  // oracles. A full 64x64-bit multiply overflows INT128, so
  // (x * C) mod 2^64 is computed from 32-bit halves:
  // xLo*C + ((xHi*CLo mod 2^32) << 32)
  private val M64 = "18446744073709551615" // 2^64 - 1 (mask)
  private def mulC(x: String, c: String, cLo: String): String =
    s"((($x & 4294967295) * $c & $M64) + ((($x >> 32) * $cLo & 4294967295) << 32)) & $M64"
  private val (c1, c1lo) = ("18397679294719823053", "3981806797") // 0xff51afd7ed558ccd
  private val (c2, c2lo) = ("14181476777654086739", "444984403")  // 0xc4ceb9fe1a85ec53

  // Full HLL replay (p=8: m=256, maxRank=57), parameterized over the
  // (col_name, v) vals CTE so one generator serves the whole-column
  // sketch (n39) and the group-wise variant (n47). Pipeline: FNV fold
  // in HUGEINT -> fmix64 via 32-bit-half multiplies -> register/rank
  // in pure integer arithmetic -> exact 2^(57-mj) register sum ->
  // alpha_m estimate with the linear-counting branch.
  private def hllReplaySql(valsCte: String): String =
    s"""WITH vals AS (
       |$valsCte),
       |h0 AS (SELECT col_name, ${fnvSql("v")} AS x FROM vals),
       |f1 AS (SELECT col_name, xor(x, x >> 33) AS v1 FROM h0),
       |f2 AS (SELECT col_name, xor(v2, v2 >> 33) AS v3
       |       FROM (SELECT col_name, ${mulC("v1", c1, c1lo)} AS v2 FROM f1)),
       |h AS (SELECT col_name, xor(v4, v4 >> 33) AS wu
       |      FROM (SELECT col_name, ${mulC("v3", c2, c2lo)} AS v4 FROM f2)),
       |rk AS (SELECT col_name, CAST(wu % 256 AS BIGINT) AS reg,
       |  CASE WHEN (wu >> 8) = 0 THEN 57
       |       ELSE bit_count(CAST(((wu >> 8) & (-(wu >> 8))) - 1 AS BIGINT)) + 1 END AS rank
       | FROM h),
       |regs AS (SELECT col_name, reg, max(rank) AS mj FROM rk GROUP BY 1, 2),
       |agg AS (SELECT col_name, count(*) AS nonzero,
       |  sum(CAST(power(2.0, 57 - mj) AS HUGEINT)) AS s FROM regs GROUP BY 1),
       |est AS (SELECT col_name, nonzero, 256 - nonzero AS empty,
       |  s + CAST(256 - nonzero AS HUGEINT) * CAST(144115188075855872 AS HUGEINT) AS bigN
       | FROM agg),
       |fin AS (SELECT col_name, nonzero, empty,
       |  (0.7213/(1.0 + 1.079/256.0)) * (256.0 * 256.0) * 144115188075855872.0
       |    / CAST(bigN AS DOUBLE) AS e_raw
       | FROM est),
       |ex AS (SELECT col_name, count(DISTINCT v) AS exact_distinct FROM vals GROUP BY 1)
       |SELECT f.col_name, ex.exact_distinct,
       |  round(CASE WHEN f.e_raw <= 640.0 AND f.empty > 0
       |    THEN 256.0 * ln(256.0 / CAST(f.empty AS DOUBLE)) ELSE f.e_raw END, 2) AS hll_estimate,
       |  CAST(f.nonzero AS BIGINT) AS registers_used
       |FROM fin f JOIN ex USING (col_name) ORDER BY col_name""".stripMargin

  /** Register-level HLL set-algebra replay for [[graft.ops.Sketch
    * .hllOverlapByGroup]]: the n39/n47 register pipeline, then
    * per-source and pairwise-union-max estimates through the identical
    * alpha/linear-counting formula, inclusion-exclusion on the rounded
    * estimates, and the exact-common audit join. p=8 (m=256,
    * maxRank=57) like the other HLL oracles.
    */
  private def hllOverlapOracleSql: String =
    s"""WITH vals AS (
       |  SELECT source AS col_name,
       |    unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS v
       |  FROM documents),
       |h0 AS (SELECT col_name, v, ${fnvSql("v")} AS x FROM vals),
       |f1 AS (SELECT col_name, v, xor(x, x >> 33) AS v1 FROM h0),
       |f2 AS (SELECT col_name, v, xor(v2, v2 >> 33) AS v3
       |       FROM (SELECT col_name, v, ${mulC("v1", c1, c1lo)} AS v2 FROM f1)),
       |h AS (SELECT col_name, xor(v4, v4 >> 33) AS wu
       |      FROM (SELECT col_name, v, ${mulC("v3", c2, c2lo)} AS v4 FROM f2)),
       |rk AS (SELECT col_name, CAST(wu % 256 AS BIGINT) AS reg,
       |  CASE WHEN (wu >> 8) = 0 THEN 57
       |       ELSE bit_count(CAST(((wu >> 8) & (-(wu >> 8))) - 1 AS BIGINT)) + 1 END AS rank
       | FROM h),
       |regs AS (SELECT col_name, reg, max(rank) AS mj FROM rk GROUP BY 1, 2),
       |srcs AS (SELECT DISTINCT col_name FROM regs),
       |gp AS (SELECT a.col_name AS ga, b.col_name AS gb
       |       FROM srcs a JOIN srcs b ON a.col_name < b.col_name),
       |ur AS (SELECT gp.ga, gp.gb, r.reg, max(r.mj) AS mj
       |       FROM gp JOIN regs r ON r.col_name = gp.ga OR r.col_name = gp.gb
       |       GROUP BY 1, 2, 3),
       |agg1 AS (SELECT col_name, count(*) AS nonzero,
       |  sum(CAST(power(2.0, 57 - mj) AS HUGEINT)) AS s FROM regs GROUP BY 1),
       |est1 AS (SELECT col_name, nonzero, 256 - nonzero AS empty,
       |  s + CAST(256 - nonzero AS HUGEINT) * CAST(144115188075855872 AS HUGEINT) AS bigN
       | FROM agg1),
       |fin1 AS (SELECT col_name,
       |  round(CASE WHEN e_raw <= 640.0 AND empty > 0
       |    THEN 256.0 * ln(256.0 / CAST(empty AS DOUBLE)) ELSE e_raw END, 2) AS est
       | FROM (SELECT col_name, empty,
       |   (0.7213/(1.0 + 1.079/256.0)) * (256.0 * 256.0) * 144115188075855872.0
       |     / CAST(bigN AS DOUBLE) AS e_raw FROM est1)),
       |agg2 AS (SELECT ga, gb, count(*) AS nonzero,
       |  sum(CAST(power(2.0, 57 - mj) AS HUGEINT)) AS s FROM ur GROUP BY 1, 2),
       |est2 AS (SELECT ga, gb, nonzero, 256 - nonzero AS empty,
       |  s + CAST(256 - nonzero AS HUGEINT) * CAST(144115188075855872 AS HUGEINT) AS bigN
       | FROM agg2),
       |fin2 AS (SELECT ga, gb,
       |  round(CASE WHEN e_raw <= 640.0 AND empty > 0
       |    THEN 256.0 * ln(256.0 / CAST(empty AS DOUBLE)) ELSE e_raw END, 2) AS est_union
       | FROM (SELECT ga, gb, empty,
       |   (0.7213/(1.0 + 1.079/256.0)) * (256.0 * 256.0) * 144115188075855872.0
       |     / CAST(bigN AS DOUBLE) AS e_raw FROM est2)),
       |dv AS (SELECT DISTINCT col_name, v FROM vals),
       |exc AS (SELECT gp.ga, gp.gb, count(*) AS exact_common
       |        FROM gp JOIN dv a2 ON a2.col_name = gp.ga
       |             JOIN dv b2 ON b2.col_name = gp.gb AND b2.v = a2.v
       |        GROUP BY 1, 2)
       |SELECT fin2.ga AS source_a, fin2.gb AS source_b,
       | CAST(coalesce(exc.exact_common, 0) AS BIGINT) AS exact_common,
       | fa.est AS est_a, fb.est AS est_b, fin2.est_union,
       | round(greatest(fa.est + fb.est - fin2.est_union, 0.0), 2) AS est_common
       |FROM fin2 JOIN fin1 fa ON fa.col_name = fin2.ga
       |     JOIN fin1 fb ON fb.col_name = fin2.gb
       |     LEFT JOIN exc ON exc.ga = fin2.ga AND exc.gb = fin2.gb
       |ORDER BY source_a, source_b""".stripMargin

  /** Two-phase BPE replay for n81: `numMerges` unrolled training steps
    * (pair-count argmax with the (cnt DESC, l, r) tie-break, then the
    * greedy leftmost non-overlapping re-segmentation as a list_reduce
    * whose accumulator and element are both VARCHAR[] — DuckDB's
    * binary reduce seeds from the first element, hence the
    * list_transform to singleton lists), then the encode join + per-doc
    * count agg. Mirrors TextAnalysis.bpeTrain/bpeEncode step for step.
    */
  private def bpeEncodeOracleSql(numMerges: Int): String = {
    val steps = (1 to numMerges).map { k =>
      s"""p$k AS (SELECT syms[i] AS l, syms[i+1] AS r,
         |  CAST(sum(wcount) AS BIGINT) AS cnt
         | FROM s${k - 1}, unnest(generate_series(1, len(syms) - 1)) AS t(i)
         | WHERE len(syms) >= 2 GROUP BY 1, 2),
         |m$k AS (SELECT l, r FROM p$k ORDER BY cnt DESC, l, r LIMIT 1),
         |s$k AS (SELECT word, wcount,
         |  CASE WHEN m$k.l IS NULL THEN syms
         |  ELSE list_reduce(list_transform(syms, s -> [s]), (acc, x) ->
         |    CASE WHEN len(acc) > 0 AND acc[-1] = m$k.l AND x[1] = m$k.r
         |         THEN list_concat(acc[1:len(acc)-1], [m$k.l || m$k.r])
         |         ELSE list_concat(acc, x) END) END AS syms
         | FROM s${k - 1} LEFT JOIN m$k ON true)""".stripMargin
    }.mkString(",\n")
    s"""WITH wc AS (SELECT word, CAST(count(*) AS BIGINT) AS wcount
       | FROM (SELECT unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS word
       |       FROM documents) GROUP BY word),
       |s0 AS (SELECT word, wcount,
       |  list_filter(string_split(word, ''), s -> s <> '') AS syms FROM wc),
       |$steps,
       |enc AS (SELECT word, CAST(len(syms) AS BIGINT) AS n_toks FROM s$numMerges),
       |dw AS (SELECT doc_id,
       |  unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS word
       | FROM documents)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       | CAST(sum(n_toks) AS BIGINT) AS n_tokens
       |FROM dw JOIN enc USING (word)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // Sign-LSH bucketing replay: hyperplane components exactly as
  // Similarity.planeComponent (splitmix64 -> [-1, 1) double -> FLOAT,
  // emitted as the widened double so DuckDB's literal equals Spark's
  // float bit-for-bit), dot products as sequential left-folds matching
  // the kernel's loop. Emits the CTE chain `hp, e, bk` — bk is one
  // (vec_id, t, bucket) row per table, the exact collision key — for
  // the n09 rerank tail and the n151 candidate build to share.
  private def signLshBkCtes(planes: Int, tables: Int, dim: Int,
                            src: String = "embeddings"): String = {
    def comp(t: Int, p: Int, d: Int): Double = {
      val h = graft.functions.Hashing.splitmix64(
        t.toLong * 1000003L + p.toLong * 8191L + d)
      (h.toDouble / Long.MaxValue.toDouble).toFloat.toDouble
    }
    val hpRows = (for (t <- 0 until tables; p <- 0 until planes) yield {
      val vec = (0 until dim).map(d => dlit(comp(t, p, d))).mkString(", ")
      s"($t, $p, [$vec])"
    }).mkString(",\n  ")
    val dot = s"list_reduce(list_transform(generate_series(1, $dim), " +
      "i -> emb[i] * v[i]), (acc, x) -> acc + x)"
    s"""hp(t, p, v) AS (VALUES
       |  $hpRows),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM $src),
       |bk AS (SELECT vec_id, t,
       |  CAST(sum(CASE WHEN $dot >= 0.0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
       | FROM e, hp GROUP BY vec_id, t)""".stripMargin
  }

  // Full MinHash-LSH choreography replay, parameterized over shingle
  // width / signature length / banding / Jaccard threshold so one
  // generator serves every minhash-family query (n10 and the n-gram-
  // Jaccard wrapper n31). Signatures are FNV shingles xor splitmix64
  // permutation seeds pushed through fmix64 in HUGEINT mod-2^64
  // arithmetic; the banded candidate join and exact-Jaccard
  // verification mirror Dedup.minhashNearDups step for step.
  private def minhashOracleSql(k: Int, numHashes: Int, bands: Int,
                               threshold: Double, seed: Long = 42L,
                               wordGrams: Boolean = false,
                               src: String = "documents"): String = {
    require(numHashes % bands == 0)
    val r = numHashes / bands
    // shingle hash list per doc: character k-shingles, or word n-grams
    // rebuilt as the exact joined-with-space strings the kernel hashes.
    // `src` lets a caller band a CTE instead of the raw table (n150's
    // old-corpus ∪ planted-slice union)
    val baseCte =
      if (wordGrams)
        s"""base AS (SELECT doc_id,
           |  list_distinct(list_transform(generate_series(1, greatest(len(ws) - ${k - 1}, 1)),
           |    j -> ${fnvSql(s"array_to_string(ws[j:j+${k - 1}], ' ')")})) AS hs
           | FROM (SELECT doc_id,
           |   list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
           |  FROM $src))""".stripMargin
      else
        s"""base AS (SELECT doc_id,
           |  list_distinct(list_transform(generate_series(1, greatest(len(text) - ${k - 1}, 1)),
           |    j -> ${fnvSql(s"substr(text, j, $k)")})) AS hs
           | FROM $src)""".stripMargin
    def u(l: Long): java.math.BigInteger =
      if (l >= 0) java.math.BigInteger.valueOf(l)
      else java.math.BigInteger.valueOf(l).add(java.math.BigInteger.ONE.shiftLeft(64))
    val permRows = (0 until numHashes).map(i =>
      s"($i, CAST('${u(graft.functions.Hashing.splitmix64(seed + i))}' AS HUGEINT))")
      .mkString(",\n  ")
    // fmix64 unrolled over a columnar (shingle x perm) relation - a
    // vectorized pipeline instead of per-element lambdas, so the
    // replay stays fast at larger fixtures
    s"""WITH $baseCte,
       |perms(p, pv) AS (VALUES
       |  $permRows),
       |sh AS (SELECT doc_id, unnest(hs) AS h FROM base),
       |uh AS (SELECT DISTINCT h FROM sh),
       |m1 AS (SELECT h, p, xor(x, x >> 33) AS v1
       |       FROM (SELECT h, p, xor(h, pv) AS x FROM uh, perms)),
       |m2 AS (SELECT h, p, xor(v2, v2 >> 33) AS v3
       |       FROM (SELECT h, p, ${mulC("v1", c1, c1lo)} AS v2 FROM m1)),
       |fx AS (SELECT h, p,
       |  CAST(CASE WHEN f >= CAST(1 AS HUGEINT) << 63
       |       THEN f - (CAST(1 AS HUGEINT) << 63) - (CAST(1 AS HUGEINT) << 63)
       |       ELSE f END AS BIGINT) AS f
       | FROM (SELECT h, p, xor(v4, v4 >> 33) AS f
       |       FROM (SELECT h, p, ${mulC("v3", c2, c2lo)} AS v4 FROM m2))),
       |sigel AS (SELECT doc_id, p, min(f) AS mel
       |          FROM sh JOIN fx USING (h) GROUP BY doc_id, p),
       |sigs AS (SELECT doc_id, list(mel ORDER BY p) AS sig
       |         FROM sigel GROUP BY doc_id),
       |bands AS (SELECT doc_id, b, sig[b * $r + 1 : b * $r + $r] AS key
       |          FROM sigs, (SELECT unnest(generate_series(0, ${bands - 1})) AS b) t),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
       |         FROM bands a JOIN bands b
       |           ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id),
       |v AS (SELECT doc_id_a, doc_id_b,
       |  len(list_intersect(sa.hs, sb.hs)) AS inter,
       |  len(sa.hs) AS la, len(sb.hs) AS lb
       | FROM cand JOIN base sa ON sa.doc_id = doc_id_a
       |           JOIN base sb ON sb.doc_id = doc_id_b)
       |SELECT doc_id_a, doc_id_b,
       | round(CAST(inter AS DOUBLE) / (la + lb - inter), 6) AS jaccard
       |FROM v WHERE CAST(inter AS DOUBLE) / (la + lb - inter) >= ${dlit(threshold)}
       |ORDER BY doc_id_a, doc_id_b""".stripMargin
  }
  // DuckDB parses long fractional literals as DECIMAL and keeps pure
  // decimal/bigint arithmetic in DECIMAL — cast to DOUBLE so the oracle
  // computes in IEEE754 exactly like Spark
  private def D(v: Double): String = s"CAST($v AS DOUBLE)"
  // oracle CTE: source rows labeled with their downsample target cell,
  // mirroring SpatialResample.blockIdx expression-for-expression
  private val blockCte: String =
    s"""b AS (SELECT time, t2m,
       |  (${D(yth.origin)} + least(greatest(CAST(floor((y - $blockWy) / ${D(yth.step)}) AS BIGINT), 0), ${yth.n - 1}) * ${D(yth.step)}) AS y2,
       |  (${D(xth.origin)} + least(greatest(CAST(floor((x - $blockWx) / ${D(xth.step)}) AS BIGINT), 0), ${xth.n - 1}) * ${D(xth.step)}) AS x2
       | FROM grid)""".stripMargin
  // timezone-subset bounds: wall-clock America/New_York -> UTC constants
  private val tzStart = java.time.LocalDateTime.parse("2019-01-30T07:00:00")
  private val tzEnd = java.time.LocalDateTime.parse("2019-01-31T04:00:00")
  private def toUtc(t: java.time.LocalDateTime): String =
    t.atZone(java.time.ZoneId.of("America/New_York"))
      .withZoneSameInstant(java.time.ZoneId.of("UTC"))
      .toLocalDateTime.format(
        java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))

  // ---- spline-upsample oracle scaffolding -----------------------------
  // The spline value at any output time is linear in the knot values, so
  // the oracle can be a weight table joined to the knots: out(q) =
  // sum_j L_j(q) * y_j with L_j the cardinal functions of the 73-knot
  // uniform grid. For the CUBIC oracle the weights come from an
  // INDEPENDENT dense assembly (explicit third-derivative-continuity
  // rows + partial-pivot Gaussian elimination, in knot units) rather
  // than the production folded-Thomas solver; agreement is ~1e-12,
  // far inside the round(.., 6) compare. The QUADRATIC weights reuse the
  // production `Spline.quadratic` (no second independent B-spline
  // implementation) — that oracle verifies the distributed pipeline
  // (grid generation, grouping, evaluation), not the solver itself,
  // which SplineSpec pins against closed-form polynomial laws.
  private def denseNotAKnotM(y: Array[Double]): Array[Double] = {
    val n = y.length
    val a = Array.ofDim[Double](n, n)
    val rhs = new Array[Double](n)
    a(0)(0) = 1; a(0)(1) = -2; a(0)(2) = 1 // 3rd-deriv continuity at t1
    for (i <- 1 until n - 1) {
      a(i)(i - 1) = 1; a(i)(i) = 4; a(i)(i + 1) = 1
      rhs(i) = 6.0 * (y(i + 1) - 2 * y(i) + y(i - 1))
    }
    a(n - 1)(n - 3) = 1; a(n - 1)(n - 2) = -2; a(n - 1)(n - 1) = 1
    // Gaussian elimination with partial pivoting
    for (col <- 0 until n) {
      val piv = (col until n).maxBy(r => math.abs(a(r)(col)))
      if (piv != col) { val t = a(piv); a(piv) = a(col); a(col) = t
        val tr = rhs(piv); rhs(piv) = rhs(col); rhs(col) = tr }
      for (r <- col + 1 until n) {
        val f = a(r)(col) / a(col)(col)
        if (f != 0.0) {
          for (c <- col until n) a(r)(c) -= f * a(col)(c)
          rhs(r) -= f * rhs(col)
        }
      }
    }
    val m = new Array[Double](n)
    for (r <- n - 1 to 0 by -1) {
      var s = rhs(r)
      for (c <- r + 1 until n) s -= a(r)(c) * m(c)
      m(r) = s / a(r)(r)
    }
    m
  }

  /** (qi, j, weight) triples for an upsample of an n-knot uniform grid
    * by `upFactor`, dropping |w| <= 1e-12 (cardinal splines decay
    * geometrically away from their knot).
    */
  private def splineWeights(n: Int, upFactor: Int,
      eval: (Array[Double], Int) => Double): Seq[(Int, Int, Double)] = {
    val nq = (n - 1) * upFactor + 1
    (0 until n).flatMap { j =>
      val y = new Array[Double](n); y(j) = 1.0
      (0 until nq).map(qi => (qi, j, eval(y, qi)))
    }.filter(t => math.abs(t._3) > 1e-12)
  }

  private lazy val cubicWeights: Seq[(Int, Int, Double)] =
    splineWeights(SyntheticGrid.NT, 2, { (y, qi) =>
      val m = denseNotAKnotM(y)
      val tq = qi / 2.0
      val i = math.min(y.length - 2, tq.toInt)
      val a = (i + 1) - tq; val b = tq - i
      a * y(i) + b * y(i + 1) +
        ((a * a * a - a) * m(i) + (b * b * b - b) * m(i + 1)) / 6.0
    })

  private lazy val quadraticWeights: Seq[(Int, Int, Double)] = {
    val n = SyntheticGrid.NT
    val ts = Array.tabulate(n)(_.toDouble)
    val qs = Array.tabulate((n - 1) * 2 + 1)(_ / 2.0)
    (0 until n).flatMap { j =>
      val y = new Array[Double](n); y(j) = 1.0
      val vs = graft.functions.Spline.quadratic(ts, y, qs)
      vs.indices.map(qi => (qi, j, vs(qi)))
    }.filter(t => math.abs(t._3) > 1e-12)
  }

  private def splineOracleSql(weights: Seq[(Int, Int, Double)],
                              nudge: Boolean = false): String = {
    val epoch0 = java.time.LocalDateTime.parse("2019-01-30T00:00:00")
      .toEpochSecond(java.time.ZoneOffset.UTC)
    val values = weights.map { case (qi, j, w) =>
      s"($qi, $j, ${dlit(w)})"
    }.mkString(",\n  ")
    val v = if (nudge) "sum(wt * t2m) + 1e-9" else "sum(wt * t2m)"
    s"""WITH $grid,
       |src AS (SELECT time, y, x, t2m FROM grid
       |        WHERE x BETWEEN ${upBox.west} AND ${upBox.east}
       |          AND y BETWEEN ${upBox.south} AND ${upBox.north}),
       |knots AS (SELECT y, x,
       |  CAST((epoch(time) - $epoch0) / 3600 AS BIGINT) AS j, t2m FROM src),
       |w(qi, j, wt) AS (VALUES
       |  $values)
       |SELECT make_timestamp((CAST($epoch0 AS BIGINT) + qi * 1800) * 1000000) AS time,
       | y, x, round($v, 6) AS t2m
       |FROM knots JOIN w USING (j)
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  }

  /** Unrolled-CTE DuckDB replay of [[graft.ops.Graph.integerPageRank]]
    * over any edge relation: `edgeCtes` must end by defining
    * `e(src, dst, wt)`; the generator appends degrees, the uniform
    * init, `iters` fixed-point damped updates (integer `//` matches
    * Spark's `div` on the all-positive ranks; integer sums are
    * order-independent, so the replay is bit-exact), and
    * `finalSelect` reads the result off `r{iters}(word, rank)`. One
    * generator serves both graph instances — word co-occurrence (n76)
    * and domain co-citation (n89).
    */
  private def pageRankOracleSql(edgeCtes: String, iters: Int,
                                finalSelect: String): String = {
    val S = graft.ops.Graph.Scale
    val steps = (1 to iters).map { k =>
      s"""c$k AS (SELECT ed.dst AS word,
         |  CAST(sum((r${k - 1}.rank * ed.wt) // ed.wdeg) AS BIGINT) AS csum
         | FROM ed JOIN r${k - 1} ON ed.src = r${k - 1}.word GROUP BY 1),
         |r$k AS (SELECT word,
         |  ((15 * $S) // 100) // n + (85 * csum) // 100 AS rank
         | FROM c$k CROSS JOIN nn)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgeCtes,
       |deg AS (SELECT src, CAST(sum(wt) AS BIGINT) AS wdeg FROM e GROUP BY 1),
       |ed AS (SELECT e.src, e.dst, e.wt, deg.wdeg FROM e JOIN deg USING (src)),
       |nn AS (SELECT count(*) AS n FROM deg),
       |r0 AS (SELECT src AS word, $S // n AS rank FROM deg CROSS JOIN nn),
       |$steps
       |$finalSelect""".stripMargin
  }

  private def textRankOracleSql(iters: Int, topK: Int): String =
    pageRankOracleSql(
      """w AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |       FROM documents),
        |w2 AS (SELECT ws FROM w WHERE len(ws) >= 2),
        |p AS (SELECT ws[i] AS a, ws[i+1] AS b
        |      FROM w2, unnest(generate_series(1, len(ws) - 1)) AS t(i)
        |      WHERE ws[i] <> ws[i+1]),
        |und AS (SELECT a AS src, b AS dst FROM p
        |        UNION ALL SELECT b, a FROM p),
        |e AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS wt
        |      FROM und GROUP BY 1, 2)""".stripMargin,
      iters,
      s"""SELECT word, CAST(rank AS BIGINT) AS rank,
         | CAST(row_number() OVER (ORDER BY rank DESC, word) AS BIGINT) AS rk
         |FROM r$iters ORDER BY rank DESC, word LIMIT $topK""".stripMargin)

  /** Unrolled synchronous label-propagation replay over the n97 word
    * co-occurrence graph: `rounds` argmax rounds (count DESC, label
    * ASC — counts are integers, so the per-round argmax is
    * deterministic in any engine), initial label = the node itself.
    */
  private def lpaOracleSql(rounds: Int): String = {
    val steps = (1 to rounds).map { k =>
      s"""v$k AS (SELECT s.src, l.label
         |  FROM sym s JOIN l${k - 1} l ON s.dst = l.node
         |  UNION ALL SELECT node, label FROM l${k - 1}),
         |l$k AS (SELECT src AS node, label FROM (
         |  SELECT src, label, count(*) AS cnt,
         |   row_number() OVER (PARTITION BY src
         |     ORDER BY count(*) DESC, label) AS rn
         |  FROM v$k GROUP BY src, label) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH d AS (SELECT text FROM documents
       |     UNION ALL SELECT 'zza0 zza1 zza2 zza0'
       |     UNION ALL SELECT 'zzb0 zzb1 zzb2 zzb0'),
       |w AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ws
       |           FROM d),
       |w2 AS (SELECT ws FROM w WHERE len(ws) >= 2),
       |p AS (SELECT ws[i] AS a, ws[i+1] AS b
       |      FROM w2, unnest(generate_series(1, len(ws) - 1)) AS t(i)
       |      WHERE ws[i] <> ws[i+1]),
       |und AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM p),
       |sym AS (SELECT u AS src, v AS dst FROM und
       |        UNION ALL SELECT v, u FROM und),
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
       |$steps
       |SELECT node AS word, label FROM l$rounds ORDER BY word""".stripMargin
  }

  /** Unrolled integer-Lloyd replay: the n45 quantizer CTEs, then per
    * round an argmin assignment (squared-L2 in BIGINT, (dist, cluster)
    * tie-break) and a truncating-division centroid update with the
    * empty-cluster carry-over, closing with the final assignment.
    * Seeding replays the engine's contract exactly: the k SMALLEST
    * vec_ids via row_number with rank-1 as the cluster id — not
    * `vec_id < k`, which only coincides on 0-based contiguous ids.
    */
  private def kmeansOracleSql(k: Int, rounds: Int,
      finalSelect: String = """SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, dist
        |FROM af ORDER BY vec_id""".stripMargin): String = {
    def assign(out: String, cin: String): String =
      s"""$out AS (SELECT vec_id, codes, cluster, dist FROM (
         |  SELECT vec_id, codes, cluster, dist,
         |   row_number() OVER (PARTITION BY vec_id
         |     ORDER BY dist, cluster) AS rn
         |  FROM (SELECT t.vec_id, t.codes, $cin.cluster,
         |   CAST(list_sum(list_transform(generate_series(1, len(t.codes)),
         |     i -> CAST((t.codes[i] - $cin.cent[i]) *
         |       (t.codes[i] - $cin.cent[i]) AS BIGINT))) AS BIGINT) AS dist
         |   FROM c t, $cin)) WHERE rn = 1)""".stripMargin
    val steps = (1 to rounds).map { r =>
      s"""${assign(s"a$r", s"c${r - 1}")},
         |u$r AS (SELECT cluster, i AS pos,
         |   CAST(sum(codes[i]) AS BIGINT) AS s2, CAST(count(*) AS BIGINT) AS cn
         | FROM a$r, unnest(generate_series(1, len(codes))) t(i) GROUP BY 1, 2),
         |m$r AS (SELECT cluster, list(CAST(s2 // cn AS INT) ORDER BY pos) AS cent
         |        FROM u$r GROUP BY 1),
         |c$r AS (SELECT * FROM m$r UNION ALL
         |        SELECT cluster, cent FROM c${r - 1}
         |        WHERE cluster NOT IN (SELECT cluster FROM m$r))""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |s AS (SELECT vec_id, v,
       |       list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e),
       |c AS (SELECT vec_id,
       |       CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
       |            ELSE list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INT))
       |       END AS codes FROM s),
       |c0 AS (SELECT CAST(rn - 1 AS INT) AS cluster, codes AS cent
       |       FROM (SELECT codes, row_number() OVER (ORDER BY vec_id) AS rn
       |             FROM c)
       |       WHERE rn <= $k),
       |$steps,
       |${assign("af", s"c$rounds")}
       |$finalSelect""".stripMargin
  }

  /** The naive all-shared-gram exact-pair CTEs ending in
    * `v(doc_id_a, doc_id_b, inter, la, lb)`, parameterized over the
    * source relation so n72 (documents) and n131 (planted docs) share
    * one replay.
    */
  private def jaccardPairsCte(src: String): String =
    s"""base AS (SELECT doc_id,
       |  list_distinct(list_transform(generate_series(1, greatest(len(ws) - 2, 1)),
       |    j -> ${fnvSql("array_to_string(ws[j:j+2], ' ')")})) AS hs
       | FROM (SELECT doc_id,
       |   list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
       |  FROM $src)),
       |g AS (SELECT doc_id, len(hs) AS sz, hs FROM base),
       |ex AS (SELECT doc_id, unnest(hs) AS h FROM g),
       |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |         FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id),
       |v AS (SELECT da AS doc_id_a, db AS doc_id_b,
       |  len(list_intersect(ga.hs, gb.hs)) AS inter, ga.sz AS la, gb.sz AS lb
       | FROM cand JOIN g ga ON ga.doc_id = da JOIN g gb ON gb.doc_id = db)""".stripMargin

  /** Exact word-trigram Jaccard pairs at threshold 0.5 — n72's oracle
    * (proves the prefix filter lossless) and the truth side of n84's
    * recall audit.
    */
  private val jaccardExactPairsSql: String =
    s"""WITH ${jaccardPairsCte("documents")}
         |SELECT doc_id_a, doc_id_b,
         | round(CAST(inter AS DOUBLE) / (la + lb - inter), 6) AS jaccard
         |FROM v WHERE CAST(inter AS DOUBLE) / (la + lb - inter) >= 0.5
         |ORDER BY doc_id_a, doc_id_b""".stripMargin

  /** The n92 bottom-k key chain as reusable CTEs ending in
    * `keys($cols, key)` — three fmix chains in HUGEINT mod-2^64 with
    * the sign-adjusted BIGINT key, parameterized over the carried
    * columns so the global (n92) and stratified (n93) samples share
    * one replay.
    */
  private def ppsKeysSql(cols: String): String = {
    val seedMixU = uns(graft.functions.Hashing.splitmix64(42L))
    s"""d AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight
       |      FROM documents WHERE n_chars >= 1),
       |a1 AS (SELECT $cols,
       |  xor(CAST(doc_id AS HUGEINT), CAST(doc_id AS HUGEINT) >> 33) AS x
       | FROM d),
       |a2 AS (SELECT $cols, xor(y, y >> 33) AS x2
       |       FROM (SELECT $cols, ${mulC("x", c1, c1lo)} AS y FROM a1)),
       |a3 AS (SELECT $cols, xor(z, z >> 33) AS base
       |       FROM (SELECT $cols, ${mulC("x2", c2, c2lo)} AS z FROM a2)),
       |e AS (SELECT $cols, base,
       |  unnest(generate_series(1, least(weight, 100000))) AS j FROM a3),
       |m0 AS (SELECT $cols, base,
       |  xor(CAST(j AS HUGEINT), CAST('$seedMixU' AS HUGEINT)) AS x FROM e),
       |i1 AS (SELECT $cols, base, xor(x, x >> 33) AS v1 FROM m0),
       |i2 AS (SELECT $cols, base, xor(y, y >> 33) AS v3
       |       FROM (SELECT $cols, base, ${mulC("v1", c1, c1lo)} AS y FROM i1)),
       |i3 AS (SELECT $cols, base, xor(z, z >> 33) AS jmix
       |       FROM (SELECT $cols, base, ${mulC("v3", c2, c2lo)} AS z FROM i2)),
       |m AS (SELECT $cols, xor(base, jmix) AS x FROM i3),
       |k1 AS (SELECT $cols, xor(x, x >> 33) AS v1 FROM m),
       |k2 AS (SELECT $cols, xor(y, y >> 33) AS v3
       |       FROM (SELECT $cols, ${mulC("v1", c1, c1lo)} AS y FROM k1)),
       |k3 AS (SELECT $cols, xor(z, z >> 33) AS u
       |       FROM (SELECT $cols, ${mulC("v3", c2, c2lo)} AS z FROM k2)),
       |keys AS (SELECT $cols,
       |  CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
       |       THEN u - CAST('18446744073709551616' AS HUGEINT)
       |       ELSE u END AS BIGINT) AS key
       | FROM k3)""".stripMargin
  }

  /** Full integer replay of [[graft.ops.Similarity.principalProjection]]:
    * the proven n45 quantizer CTE, covariance C = n·M − S·Sᵀ in
    * HUGEINT, the ±1e6 rescale, and `iters` unrolled power-iteration
    * rounds with the sign-split truncating division (`//` floors on
    * negatives, so both engines divide magnitudes only).
    */
  private def principalProjectionOracleSql(iters: Int): String = {
    val iterCtes = (1 to iters).map { i =>
      val pv = if (i == 1) "v0" else s"v${i - 1}"
      s"""w$i AS (SELECT cr.j, sum(cr.c * $pv.v) AS w
         |        FROM cr JOIN $pv ON $pv.j = cr.k GROUP BY 1),
         |m$i AS (SELECT max(abs(w)) AS mx FROM w$i),
         |v$i AS (SELECT w$i.j,
         |  CASE WHEN m$i.mx = 0 THEN $pv.v
         |       WHEN w$i.w < 0 THEN -((-w$i.w) * 100000 // m$i.mx)
         |       ELSE (w$i.w * 100000 // m$i.mx) END AS v
         | FROM w$i JOIN $pv ON $pv.j = w$i.j CROSS JOIN m$i),""".stripMargin
    }.mkString("\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |s AS (SELECT vec_id, v,
       |      list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e),
       |c AS (SELECT vec_id,
       |      CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
       |           ELSE list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INT))
       |      END AS codes FROM s),
       |x AS (SELECT vec_id, j, CAST(codes[j] AS HUGEINT) AS xj
       |      FROM c, unnest(generate_series(1, 64)) AS t(j)),
       |nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM c),
       |sv AS (SELECT j, sum(xj) AS sj FROM x GROUP BY j),
       |mm AS (SELECT a.j AS j, b.j AS k, sum(a.xj * b.xj) AS mjk
       |       FROM x a JOIN x b ON a.vec_id = b.vec_id GROUP BY 1, 2),
       |cov AS (SELECT mm.j, mm.k, nn.n * mm.mjk - sa.sj * sb.sj AS cjk
       |        FROM mm CROSS JOIN nn
       |        JOIN sv sa ON sa.j = mm.j JOIN sv sb ON sb.j = mm.k),
       |cmax AS (SELECT max(abs(cjk)) AS cm FROM cov),
       |cr AS (SELECT j, k,
       |       CASE WHEN cm = 0 THEN cjk
       |            WHEN cjk < 0 THEN -((-cjk) * 1000000 // cm)
       |            ELSE (cjk * 1000000 // cm) END AS c
       |      FROM cov CROSS JOIN cmax),
       |v0 AS (SELECT unnest(generate_series(1, 64)) AS j,
       |       CAST(100000 AS HUGEINT) AS v),
       |$iterCtes
       |proj AS (SELECT x.vec_id, sum(x.xj * v$iters.v) AS p
       |         FROM x JOIN v$iters ON v$iters.j = x.j GROUP BY 1)
       |SELECT vec_id, CAST(p AS BIGINT) AS proj FROM proj ORDER BY vec_id""".stripMargin
  }

  /** n107's planted cascade: `hub` interleaved with 28 vocabulary
    * words (degree 29 = exactly the k bar) plus a degree-1 `spoke` —
    * round 1 peels spoke, dropping hub to 28, so round 2 peels hub:
    * the multi-round cascade that distinguishes k-core peeling from a
    * single degree filter. Shared verbatim by the Spark fixture and
    * the oracle.
    */
  private val kcoreHubText: String = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the")
    .flatMap(w => Seq("hub", w)).mkString(" ")

  /** Unrolled replay of [[graft.ops.Graph.kCore]]: each round is a
    * degree agg, a >= k filter, and an endpoint semi-filter.
    */
  private def kCoreOracleSql(k: Int, rounds: Int,
                             materialized: Boolean = false): String = {
    // deep unrolls need MATERIALIZED round CTEs: each e_i references
    // e_{i-1} three times (directly + via both k_i joins), so DuckDB's
    // default CTE inlining expands 3^rounds scans — fine at 4 rounds,
    // fd-exhausting at 10 (the n135 fixpoint oracle)
    val mat = if (materialized) "MATERIALIZED " else ""
    val roundCtes = (1 to rounds).map { i =>
      val pe = s"e${i - 1}"
      s"""k$i AS $mat(SELECT src FROM (SELECT src, count(*) AS d FROM $pe GROUP BY 1)
         |        WHERE d >= $k),
         |e$i AS $mat(SELECT e.src, e.dst FROM $pe e
         |        JOIN k$i a ON a.src = e.src JOIN k$i b ON b.src = e.dst),""".stripMargin
    }.mkString("\n")
    s"""WITH d AS (SELECT text FROM documents
       | UNION ALL SELECT '$kcoreHubText'
       | UNION ALL SELECT 'spoke hub'),
       |w AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM d),
       |w2 AS (SELECT ws FROM w WHERE len(ws) >= 2),
       |p AS (SELECT ws[i] AS a, ws[i+1] AS b
       |      FROM w2, unnest(generate_series(1, len(ws) - 1)) AS t(i)
       |      WHERE ws[i] <> ws[i+1]),
       |und AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM p),
       |e0 AS (SELECT u AS src, v AS dst FROM und UNION ALL SELECT v, u FROM und),
       |$roundCtes
       |f AS (SELECT src, CAST(count(*) AS BIGINT) AS degree FROM e$rounds GROUP BY 1)
       |SELECT src AS word, degree FROM f ORDER BY degree DESC, word""".stripMargin
  }

  /** Full arithmetic replay of the pixel-dHash fixtures (shared by
    * n94/BMP and n108/PNG — both containers encode the same cellGray
    * pixels): fmix64 per (group, cell) in HUGEINT mod-2^64 ->
    * member-cell inversion -> 8x8 horizontal-gradient bits -> 64-bit
    * hash (sign-adjusted to BIGINT like the Spark long) -> the n11
    * banding at maxDistance=2 (3 bands: widths 22/21/21 at offsets
    * 0/22/43) -> exact bit_count filter. Green proves the byte-level
    * decodes reproduce this formula bit-for-bit.
    */
  private lazy val pixelDhashOracleSql: String =
    s"""WITH d AS (SELECT doc_id, doc_id // 4 AS g, doc_id % 4 AS m FROM documents),
       |cells AS (SELECT doc_id, g, m, unnest(generate_series(0, 71)) AS cell FROM d),
       |v0 AS (SELECT doc_id, g, m, cell,
       |  CAST(g * 73 + cell + 1234567 AS HUGEINT) AS x FROM cells),
       |f1 AS (SELECT doc_id, g, m, cell, xor(x, x >> 33) AS v1 FROM v0),
       |f2 AS (SELECT doc_id, g, m, cell, xor(y, y >> 33) AS v3
       |       FROM (SELECT doc_id, g, m, cell, ${mulC("v1", c1, c1lo)} AS y FROM f1)),
       |f3 AS (SELECT doc_id, g, m, cell, xor(z, z >> 33) AS u
       |       FROM (SELECT doc_id, g, m, cell, ${mulC("v3", c2, c2lo)} AS z FROM f2)),
       |gr AS (SELECT doc_id, cell,
       |  CASE WHEN m > 0 AND cell = (g + m * 13) % 72
       |       THEN 255 - CAST(u & 255 AS BIGINT)
       |       ELSE CAST(u & 255 AS BIGINT) END AS gray FROM f3),
       |bitgrid AS (SELECT doc_id, bit, (bit // 8) * 9 + (bit % 8) AS cl
       |            FROM d, unnest(generate_series(0, 63)) AS t(bit)),
       |bset AS (SELECT bg.doc_id, bg.bit
       |         FROM bitgrid bg
       |         JOIN gr ga ON ga.doc_id = bg.doc_id AND ga.cell = bg.cl
       |         JOIN gr gb ON gb.doc_id = bg.doc_id AND gb.cell = bg.cl + 1
       |         WHERE gb.gray > ga.gray),
       |hsh AS (SELECT d.doc_id,
       |  coalesce(sum(CAST(1 AS HUGEINT) << bit), CAST(0 AS HUGEINT)) AS hu
       | FROM d LEFT JOIN bset ON bset.doc_id = d.doc_id GROUP BY 1),
       |sh AS (SELECT doc_id,
       |  CAST(CASE WHEN hu >= CAST('9223372036854775808' AS HUGEINT)
       |       THEN hu - CAST('18446744073709551616' AS HUGEINT)
       |       ELSE hu END AS BIGINT) AS sh, hu FROM hsh),
       |bands AS (
       |  SELECT doc_id, sh, 0 AS band, CAST(hu & 4194303 AS BIGINT) AS key FROM sh
       |  UNION ALL SELECT doc_id, sh, 1, CAST((hu >> 22) & 2097151 AS BIGINT) FROM sh
       |  UNION ALL SELECT doc_id, sh, 2, CAST((hu >> 43) & 2097151 AS BIGINT) FROM sh),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       |    a.sh AS sha, b.sh AS shb
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
       |SELECT doc_id_a, doc_id_b,
       | CAST(bit_count(xor(sha, shb)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(sha, shb)) <= 2
       |ORDER BY doc_id_a, doc_id_b""".stripMargin

  /** Unrolled greedy-MMR replay shared by n138 (full corpus) and n139
    * (exact top-`shortlist` candidates): step j scores candidate CTE
    * `s` with 0.75·simq − 0.25·greatest(cos to each prior pick) and
    * takes the (score DESC, vec_id) argmax — identical IEEE
    * expressions to the engine's greedy loop, so the argmax replays
    * step by step. The shortlist variant narrows `s` to the
    * (simq DESC, vec_id) top-m first, exactly the candidate relation
    * `mmrSelectShortlist` is handed.
    */
  private def mmrOracleSql(shortlist: Option[Int]): String = {
    val steps = (1 to 5).map { j =>
      val prior = (1 until j).map(i => s"s$i")
      val penalty =
        if (prior.isEmpty) "0.0"
        else if (prior.size == 1)
          s"list_cosine_similarity(s.v, s1.v)"
        else prior.map(p => s"list_cosine_similarity(s.v, $p.v)")
          .mkString("greatest(", ", ", ")")
      val from = ("s" +: prior).mkString(", ")
      val excl = if (prior.isEmpty) ""
        else prior.map(p => s"s.vec_id <> $p.vec_id").mkString(" WHERE ", " AND ", "")
      s"""p$j AS (SELECT s.vec_id, s.v, s.simq,
         |  0.75 * s.simq - 0.25 * ($penalty) AS score
         | FROM $from$excl),
         |s$j AS (SELECT * FROM p$j ORDER BY score DESC, vec_id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val out = (1 to 5).map(j =>
      s"""SELECT CAST($j AS BIGINT) AS rank, vec_id,
         | round(simq, 6) AS simq, round(score, 6) AS score FROM s$j""".stripMargin)
      .mkString("\nUNION ALL\n")
    val cand = shortlist match {
      case None =>
        """s AS (SELECT e.vec_id, e.v, list_cosine_similarity(e.v, q.qv) AS simq
          |      FROM e, q WHERE e.vec_id <> 0)""".stripMargin
      case Some(m) =>
        s"""s0 AS (SELECT e.vec_id, e.v, list_cosine_similarity(e.v, q.qv) AS simq
           |       FROM e, q WHERE e.vec_id <> 0),
           |s AS (SELECT vec_id, v, simq FROM (
           |       SELECT s0.*, row_number() OVER (ORDER BY simq DESC, vec_id) AS rnk
           |       FROM s0) WHERE rnk <= $m)""".stripMargin
    }
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |$cand,
       |$steps
       |$out
       |ORDER BY rank""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(

    // ================= relational core (driver tables) ================
    "q01_pricing_summary" -> ((s, dir) => {
      // TPC-H Q1-shape pricing summary: pushed date filter -> partial agg
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q02_revenue_filter" -> ((s, dir) => {
      // selective revenue filter scan (predicate pushdown)
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
                col("l_shipdate") <  lit("1998-01-01").cast("timestamp") &&
                col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
             count(lit(1)).as("n"))
    }),

    "q03_revenue_by_nation" -> ((s, dir) => {
      // star join revenue rollup, all dimensions broadcast
      val orders = t(s, dir, "orders")
      val customer = t(s, dir, "customer")
      val nation = t(s, dir, "nation")
      val region = t(s, dir, "region")
      orders
        .join(customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(round(sum("o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy("r_name", "n_name")
    }),

    "q04_order_rank_window" -> ((s, dir) => {
      // per-customer order ranking window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
        .orderBy("o_custkey", "rk")
    }),

    "q05_top10_orders" -> ((s, dir) => {
      // top-10 orders via distributed partial top-k (TakeOrderedAndProject)
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }),

    "q29_range_frame" -> ((s, dir) => {
      // RANGE (value-based) window frame: per customer, the trailing
      // 7-day order count — the frame is keyed on integer epoch days,
      // so peer handling and the count replay exactly
      import org.apache.spark.sql.expressions.Window
      val o = t(s, dir, "orders")
        .withColumn("d", datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("d"))
        .rangeBetween(-6, 0)
      o.select(col("o_custkey"), col("o_orderkey"),
          count(lit(1)).over(w).as("n_last7"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "q28_set_ops" -> ((s, dir) => {
      // INTERSECT / EXCEPT surface: big-spender customers with open
      // orders and no finalized ones. Spark compiles both to
      // distinct + semi/anti joins — partial-agg'd, ids-only shuffles
      val o = t(s, dir, "orders")
      o.filter(col("o_totalprice") > 100000)
        .select(col("o_custkey").as("custkey"))
        .intersect(o.filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("custkey")))
        .except(o.filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey")))
        .orderBy("custkey")
    }),

    "q30_sessionization" -> ((s, dir) => {
      // batch sessionization at the standard 30-minute gap — see
      // EventStreams.batchSessions for the bounded-window shape
      EventStreams.batchSessions(t(s, dir, "events"), gapUs = 1800000000L)
        .orderBy("user_id", "session_idx")
    }),

    "q52_not_in_nulls" -> ((s, dir) => {
      // the NOT IN null trap as a pinned surface: a NULL in the
      // subquery makes NOT IN three-valued (empty result), while NOT
      // EXISTS keeps filtering rows — both engines implement the SQL
      // standard, and a migration MUST know which one a query meant
      t(s, dir, "nation").createOrReplaceTempView("nation")
      t(s, dir, "supplier").createOrReplaceTempView("supplier")
      s.sql("""WITH keys AS (SELECT CASE WHEN s_suppkey % 7 = 0 THEN NULL
              |                     ELSE s_nationkey END AS k FROM supplier)
              |SELECT 'not_in' AS variant, CAST(count(*) AS BIGINT) AS n
              |FROM nation WHERE n_nationkey NOT IN (SELECT k FROM keys)
              |UNION ALL
              |SELECT 'not_exists', CAST(count(*) AS BIGINT)
              |FROM nation WHERE NOT EXISTS (
              |  SELECT 1 FROM keys WHERE keys.k = nation.n_nationkey)
              |ORDER BY variant""".stripMargin)
    }),

    "q64_union_by_name" -> ((s, dir) => {
      // name-based union: position-independent column matching — the
      // schema-drift-safe union. Spark's surface is the DataFrame
      // unionByName API (OSS Spark SQL has no BY NAME clause; DuckDB
      // does, and the oracle uses it — cross-engine agreement on the
      // SEMANTICS). The branches deliberately swap column order, so a
      // positional union would be wrong, not just reordered: the
      // swapped columns have different types and values
      val a = t(s, dir, "nation").select(col("n_name").as("name"),
        lit("nation").as("kind"), col("n_nationkey").cast("long").as("key"))
      val b = t(s, dir, "region").select(col("r_regionkey").cast("long").as("key"),
        lit("region").as("kind"), col("r_name").as("name"))
      a.unionByName(b).orderBy("kind", "key")
    }),

    "q63_grouping_id" -> ((s, dir) => {
      // the GROUPING() disambiguation surface: nullif plants REAL NULL
      // group values, so without the flags a rollup subtotal row and a
      // null-valued data row are indistinguishable — gid composes the
      // flags portably (2*g_rf + g_ls)
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql("""SELECT nullif(l_returnflag, 'N') AS rf, l_linestatus AS ls,
              | CAST(grouping(nullif(l_returnflag, 'N')) AS BIGINT) AS g_rf,
              | CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
              | CAST(grouping(nullif(l_returnflag, 'N')) * 2
              |   + grouping(l_linestatus) AS BIGINT) AS gid,
              | CAST(count(*) AS BIGINT) AS n,
              | round(sum(l_quantity), 2) AS sum_qty
              |FROM lineitem
              |GROUP BY ROLLUP(nullif(l_returnflag, 'N'), l_linestatus)
              |ORDER BY gid, rf NULLS FIRST, ls NULLS FIRST""".stripMargin)
    }),

    "q61_cohort_retention" -> ((s, dir) => {
      // daily cohort retention matrix: cohort = day of the user's
      // first event (the fixture splits 134/16 across two days); one
      // user-keyed min-agg, one co-partitioned join, one distinct-agg,
      // and the cohort size read off the offset-0 row via a
      // cohort-keyed window — retention as integer fixed point
      val ev = t(s, dir, "events").select(col("user_id"), col("ts"))
      val firsts = ev.groupBy("user_id").agg(min("ts").as("first_ts"))
      val j = ev.join(firsts, "user_id").select(
        col("user_id"),
        date_trunc("day", col("first_ts")).as("cohort_day"),
        datediff(date_trunc("day", col("ts")),
          date_trunc("day", col("first_ts"))).cast("long").as("day_offset"))
      val r = j.groupBy("cohort_day", "day_offset")
        .agg(countDistinct("user_id").as("n_users"))
      val w = Window.partitionBy(col("cohort_day")).orderBy(col("day_offset"))
      r.withColumn("cohort_size", first(col("n_users")).over(w))
        .withColumn("retention_x1e4", expr("n_users * 10000 div cohort_size"))
        .orderBy("cohort_day", "day_offset")
    }),

    "q62_event_transitions" -> ((s, dir) => {
      // Markov transition matrix over the per-user event stream: lead
      // window on (ts, event_id) total order, then a pair-count agg;
      // transition probability as integer fixed point over the
      // from-type total (one window on the 25-row pair relation)
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val pairs = ev.select(col("event_type"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .filter(col("next_type").isNotNull)
      pairs.groupBy("event_type", "next_type").agg(count(lit(1)).as("cnt"))
        .withColumn("p_x1e6", expr(
          "cnt * 1000000 div sum(cnt) OVER (PARTITION BY event_type)"))
        .orderBy("event_type", "next_type")
    }),

    "q51_event_funnel" -> ((s, dir) => {
      // stepwise funnel (view -> click -> purchase, each within 24h of
      // the previous stage's earliest completion): three user-keyed
      // min-aggs chained by co-partitioned joins — the classic funnel
      // shape that never materializes event pairs
      val ev = t(s, dir, "events").select(col("user_id"), col("event_type"), col("ts"))
      val v1 = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val c2 = ev.filter(col("event_type") === "click").join(v1, "user_id")
        .filter(col("ts") > col("t1") &&
          col("ts") <= col("t1") + expr("INTERVAL 24 HOUR"))
        .groupBy("user_id").agg(min("ts").as("t2"))
      val p3 = ev.filter(col("event_type") === "purchase").join(c2, "user_id")
        .filter(col("ts") > col("t2") &&
          col("ts") <= col("t2") + expr("INTERVAL 24 HOUR"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      v1.agg(count(lit(1)).as("n_users")).select(lit("1_view").as("stage"), col("n_users"))
        .unionAll(c2.agg(count(lit(1)).as("n_users"))
          .select(lit("2_click").as("stage"), col("n_users")))
        .unionAll(p3.agg(count(lit(1)).as("n_users"))
          .select(lit("3_purchase").as("stage"), col("n_users")))
        .orderBy("stage")
    }),

    "q50_semi_anti_join" -> ((s, dir) => {
      // explicit SEMI/ANTI JOIN syntax surface (q07/q08 prove the
      // semantics via EXISTS; this pins the join-type keywords both
      // engines ship) — per-customer-class counts in one result
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT 'with_orders' AS cls, count(*) AS n
              |FROM customer LEFT SEMI JOIN orders ON o_custkey = c_custkey
              |UNION ALL
              |SELECT 'without_orders', count(*)
              |FROM customer LEFT ANTI JOIN orders ON o_custkey = c_custkey
              |ORDER BY cls""".stripMargin)
    }),

    "q48_session_window" -> ((s, dir) => {
      // the ENGINE's session_window (q30 is the manual gaps-and-islands
      // build): the oracle derives sessions from the DEFINITION (break
      // when the gap >= 30min — session windows are half-open
      // [ts, ts+gap), so an exact-gap event starts a new session), so
      // green proves Spark's built-in merge semantics
      t(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("session_end"), col("n_events"))
        .orderBy("user_id", "session_start")
    }),

    "q49_limit_offset" -> ((s, dir) => {
      // pagination surface: LIMIT/OFFSET over a total order
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT o_orderkey, o_totalprice FROM orders
              |ORDER BY o_orderkey LIMIT 50 OFFSET 100""".stripMargin)
    }),

    "q31_pivot" -> ((s, dir) => {
      // PIVOT surface with an explicit value list (no extra distinct
      // pass to discover columns — the list is the contract, which is
      // also what keeps the plan static at 100 TB); count cells,
      // null-for-absent coalesced to 0 to match SQL FILTER semantics
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("st_f"),
          coalesce(col("O"), lit(0L)).as("st_o"),
          coalesce(col("P"), lit(0L)).as("st_p"))
        .orderBy("o_orderpriority")
    }),

    "q34_scalar_subquery" -> ((s, dir) => {
      // correlated scalar subquery surface: each order's price as a
      // share of its customer's biggest order. Catalyst de-correlates
      // to an aggregate + equi-join (no per-row re-execution — the
      // rewrite is what makes the surface usable at scale); max()
      // returns an input bit-for-bit, so the share division replays
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT o_orderkey, o_custkey,
              |  round(o_totalprice / (SELECT max(o2.o_totalprice)
              |                        FROM orders o2
              |                        WHERE o2.o_custkey = o.o_custkey), 6)
              |    AS price_share
              |FROM orders o
              |ORDER BY o_orderkey""".stripMargin)
    }),

    "q35_exists_surface" -> ((s, dir) => {
      // correlated EXISTS / NOT EXISTS surface: customers with an open
      // order and no finalized urgent one. Catalyst de-correlates both
      // to left-semi / left-anti hash joins on o_custkey — ids-only
      // shuffles, no per-row subquery execution; the anti side is the
      // bloom-prunable shape (RuntimeFilterSpec)
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT c_custkey, c_name FROM customer c
              |WHERE EXISTS (SELECT 1 FROM orders o
              |              WHERE o.o_custkey = c.c_custkey
              |                AND o.o_orderstatus = 'O')
              |  AND NOT EXISTS (SELECT 1 FROM orders o
              |                  WHERE o.o_custkey = c.c_custkey
              |                    AND o.o_orderstatus = 'F'
              |                    AND o.o_orderpriority = '1-URGENT')
              |ORDER BY c_custkey""".stripMargin)
    }),

    "q36_posexplode" -> ((s, dir) => {
      // LATERAL VIEW posexplode surface — the long-format unnest every
      // array column (embeddings, token lists) flows through. Generate
      // exec, no shuffle; pos cast to long for cross-engine schema
      // agreement
      t(s, dir, "embeddings").createOrReplaceTempView("embeddings")
      s.sql("""SELECT vec_id, CAST(pos AS BIGINT) AS pos, val
              |FROM embeddings
              |LATERAL VIEW posexplode(embedding) t AS pos, val
              |WHERE vec_id < 50
              |ORDER BY vec_id, pos""".stripMargin)
    }),

    "q37_lateral_join" -> ((s, dir) => {
      // correlated LATERAL subquery surface (SQL:99 lateral derived
      // table): per-customer order stats computed in a correlated
      // aggregate subquery in FROM. Catalyst decorrelates to one
      // hash-agg over orders + one equi-join on o_custkey — ids-only
      // shuffle, no per-row subquery execution (the q34 rewrite, but
      // through the multi-column LATERAL surface)
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT c_custkey, c_name, o.n_orders, o.max_price
              |FROM customer c,
              |LATERAL (SELECT count(*) AS n_orders,
              |                max(o_totalprice) AS max_price
              |         FROM orders WHERE o_custkey = c_custkey) o
              |WHERE o.n_orders >= 5
              |ORDER BY c_custkey""".stripMargin)
    }),

    "q38_filter_clause" -> ((s, dir) => {
      // aggregate FILTER clause surface (SQL:2003): conditional
      // aggregation without self-joins or CASE pyramids — one scan,
      // one hash-agg, every FILTER a codegen predicate on the
      // aggregate's input
      t(s, dir, "documents").createOrReplaceTempView("documents")
      s.sql("""SELECT source,
              | count(*) AS n_docs,
              | count(*) FILTER (WHERE lang = 'en') AS n_en,
              | sum(n_chars) FILTER (WHERE lang = 'en') AS chars_en,
              | count(*) FILTER (WHERE n_chars >= 500) AS n_long
              |FROM documents GROUP BY source ORDER BY source""".stripMargin)
    }),

    "q39_ignore_nulls" -> ((s, dir) => {
      // IGNORE NULLS window surface: forward-fill the last non-click
      // value per user (the event-stream twin of g08's grid ffill).
      // Values are bit-copied, never computed, so doubles hash-match;
      // (ts, event_id) is a unique total order per partition
      t(s, dir, "events").createOrReplaceTempView("events")
      s.sql("""SELECT event_id, user_id, ts,
              | last_value(CASE WHEN event_type <> 'click' THEN value END)
              |   IGNORE NULLS OVER (PARTITION BY user_id
              |     ORDER BY ts, event_id
              |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |   AS last_nonclick_value
              |FROM events
              |ORDER BY user_id, ts, event_id""".stripMargin)
    }),

    "q40_rank_stats" -> ((s, dir) => {
      // percent_rank / cume_dist surface — the remaining ranking
      // family members beside row_number/rank (q04), ntile (q25);
      // each is one division on integer rank/count inputs, identical
      // cross-engine. Partitioned by priority: a surface demo (the
      // scale path partitions by a high-cardinality key)
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT o_orderkey, o_orderpriority,
              | round(percent_rank() OVER (PARTITION BY o_orderpriority
              |   ORDER BY o_totalprice, o_orderkey), 6) AS pr,
              | round(cume_dist() OVER (PARTITION BY o_orderpriority
              |   ORDER BY o_totalprice, o_orderkey), 6) AS cd
              |FROM orders
              |ORDER BY o_orderpriority, o_orderkey""".stripMargin)
    }),

    "q33_cube" -> ((s, dir) => {
      // CUBE surface — the third grouping operator beside rollup (q15)
      // and grouping sets (q22). Quantities are integral doubles in
      // the fixture; summed as longs so the 2^d grouping combinations
      // stay partition-invariant (count is exact anyway)
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("n"), col("sum_qty"))
        .orderBy("rflag", "lstatus")
    }),

    "q32_unpivot" -> ((s, dir) => {
      // UNPIVOT (stack) surface: wide measure columns to long
      // (metric, value) rows — a generator, zero shuffle; values are
      // copied bits, so doubles survive the hash compare untouched
      t(s, dir, "lineitem")
        .filter(col("l_quantity") >= 49)
        .selectExpr("l_orderkey",
          "CAST(l_linenumber AS BIGINT) AS lineno",
          "stack(2, 'price', l_extendedprice, 'qty', l_quantity) AS (metric, value)")
        .orderBy("l_orderkey", "lineno", "metric")
    }),

    "q06_nations_no_suppliers" -> ((s, dir) => {
      // non-vacuous: every fixture nation has suppliers, so a planted
      // nationkey with none must be the EXCEPT's one surviving row — a
      // broken set-difference returning the empty set can't pass
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey")).distinct()
        .unionAll(s.range(1).select(lit(9999).as("nationkey")))
      val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")).distinct()
      c.except(sup).orderBy("nationkey")
    }),

    "q07_big_orders_semi" -> ((s, dir) => {
      // customers with big orders via left-semi join
      val big = t(s, dir, "lineitem").filter(col("l_quantity") >= 49)
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    "q08_customers_no_orders" -> ((s, dir) => {
      // non-vacuous: every fixture customer has orders, so the planted
      // orderless customer must be the anti-join's one surviving row
      t(s, dir, "customer").select("c_custkey", "c_name")
        .unionAll(s.range(1).select(lit(9999999L).as("c_custkey"),
          lit("planted-no-orders").as("c_name")))
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "q09_status_pivot" -> ((s, dir) => {
      // order-status pivot with known width (no distinct-values job)
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O", "P"))
        .orderBy("o_orderpriority")
    }),

    "q10_part_type_stats" -> ((s, dir) => {
      // per-type part statistics aggregate
      t(s, dir, "part")
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_parts"),
             round(avg("p_retailprice"), 4).as("avg_price"),
             round(stddev("p_retailprice"), 4).as("std_price"),
             min("p_size").cast("long").as("min_size"),
             max("p_size").cast("long").as("max_size"),
             round(median(col("p_retailprice")), 4).as("med_price"))
        .orderBy("p_brand")
    }),

    "q20_range_join" -> ((s, dir) => {
      // banded proximity join through the BandedIntervalJoin rule
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id"), col("ts").as("c_ts"))
      graft.operators.RangeJoin.within(purchases, clicks, "p_ts", "c_ts",
          Seq("user_id"), maxGapSeconds = 600)
        .select("user_id", "p_id", "c_id")
        .orderBy("user_id", "p_id", "c_id")
    }),

    "q21_percentiles" -> ((s, dir) => {
      // exact percentile aggregates per group
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(percentile(col("l_quantity"), lit(0.25)), 6).as("p25"),
             round(percentile(col("l_quantity"), lit(0.5)), 6).as("p50"),
             round(percentile(col("l_quantity"), lit(0.75)), 6).as("p75"),
             round(percentile(col("l_extendedprice"), lit(0.9)), 4).as("price_p90"))
        .orderBy("l_returnflag")
    }),

    "q22_grouping_sets" -> ((s, dir) => {
      // GROUPING SETS rollup of order statistics
      Seq("orders").foreach(n => t(s, dir, n).createOrReplaceTempView(n))
      s.sql("""SELECT coalesce(o_orderpriority, 'ALL') AS priority,
              |       coalesce(o_orderstatus, 'ALL') AS status,
              |       count(*) AS n, round(sum(o_totalprice), 2) AS revenue
              |FROM orders
              |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus),
              |                        (o_orderpriority, o_orderstatus), ())
              |ORDER BY priority, status""".stripMargin)
    }),

    "q17_distinct_agg" -> ((s, dir) => {
      // multi-column distinct aggregation
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
             countDistinct(col("l_partkey")).as("n_part"),
             count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    "q24_interval_join_sql" -> ((s, dir) => {
      // key-less proximity join through the SQL surface: the
      // BandedIntervalJoinRule rewrite (SparkSessionExtensions) turns
      // the abs-band nested loop into a binned hash equi-join
      org.apache.spark.sql.graft.GraftExtensions.register(s)
      t(s, dir, "events").createOrReplaceTempView("events")
      s.sql("""WITH p AS (SELECT event_id AS p_id, ts AS p_ts FROM events
              |           WHERE event_type = 'purchase'),
              |c AS (SELECT event_id AS c_id, ts AS c_ts FROM events
              |      WHERE event_type = 'click')
              |SELECT p_id, c_id FROM p JOIN c
              |ON abs(CAST(p_ts AS DOUBLE) - CAST(c_ts AS DOUBLE)) <= 5.0
              |ORDER BY p_id, c_id""".stripMargin)
    }),

    "q23_salted_skew_join" -> ((s, dir) => {
      // pathological planted skew: ~30% of orders collapse onto one hot
      // customer key, then a salted join spreads that key over 8 buckets.
      // The salt only redistributes rows across tasks — the join RESULT
      // is the plain inner join, so a plain-join oracle hash-checks it.
      val hot = t(s, dir, "orders")
        .withColumn("k", when(col("o_custkey") % 10 < 3, lit(1L))
          .otherwise(col("o_custkey")))
        .select("k", "o_totalprice")
      val dim = t(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_nationkey"))
      SaltedJoin.inner(hot, dim, "k", buckets = 8)
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"),
             round(sum("o_totalprice"), 2).as("revenue"))
        .orderBy("c_nationkey")
    }),

    "q25_window_ntile" -> ((s, dir) => {
      // the remaining ranking-window family: ntile / percent_rank /
      // cume_dist (rank ratios are exact rationals; round for parity)
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .filter(col("o_orderkey") % 100 === 0)
        .orderBy("o_orderpriority", "o_orderkey")
    }),

    "q26_bucketed_join" -> ((s, dir) => {
      // bucketed-layout co-located join: both fact tables written
      // bucketed by the join key into the same bucket count, then the
      // join AND the same-key aggregation plan with zero Exchange
      // (BucketingSpec asserts the plan; this query oracles the values
      // against the plain parquet join)
      val tmp = java.nio.file.Files.createTempDirectory("graft-buckets").toString
      graft.sources.Bucketing.writeBucketed(
        t(s, dir, "orders").select("o_orderkey", "o_totalprice"),
        "graft_orders_bucketed", s"$tmp/orders", "o_orderkey", 8)
      graft.sources.Bucketing.writeBucketed(
        t(s, dir, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice"),
        "graft_lineitem_bucketed", s"$tmp/lineitem", "l_orderkey", 8)
      s.table("graft_orders_bucketed").hint("merge")
        .join(s.table("graft_lineitem_bucketed"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_lines"),
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          round(max("o_totalprice"), 2).as("o_total"))
        .orderBy("o_orderkey")
    }),

    "q27_partition_pruning" -> ((s, dir) => {
      // hive-partitioned layout, the third storage lever next to
      // bucketing (q26, shuffle elimination) and Z-order (g33, file
      // pruning): a predicate on the partition column never reads the
      // other partitions' files at all — PartitionedLayoutSpec asserts
      // every scanned file sits under lang=en/
      val tmp = java.nio.file.Files.createTempDirectory("graft-partitioned").toString
      t(s, dir, "documents").write.mode("overwrite")
        .partitionBy("lang").parquet(tmp)
      s.read.parquet(tmp)
        .filter(col("lang") === "en")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
        .orderBy("source")
    }),

    "q18_running_totals" -> ((s, dir) => {
      // running totals window (unbounded preceding frame)
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          round(sum("o_totalprice").over(
            w.rowsBetween(Window.unboundedPreceding, 0)), 2).as("run_total"),
          lag("o_orderkey", 1).over(w).as("prev_order"),
          lead("o_orderkey", 1).over(w).as("next_order"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "q19_json_extract" -> ((s, dir) => {
      // distributed JSON field extraction over event payloads
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
             min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type")
    }),

    "n17_embedding_norms" -> ((s, dir) => {
      // array higher-order functions: aggregate over the vector column
      val emb = t(s, dir, "embeddings")
      val sq = aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double"))
      emb.select(col("label"), sqrt(sq).as("norm"), size(col("embedding")).cast("long").as("dim"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"), round(avg("norm"), 6).as("avg_norm"),
             max("dim").as("dim"))
        .orderBy("label")
    }),

    // ============ streaming-shaped windows (batch = same plan) ========
    "q11_events_tumbling" -> ((s, dir) => {
      // tumbling event-time window counts (batch twin of the streaming A1)
      EventStreams.tumblingCounts(t(s, dir, "events"), "1 hour")
        .withColumn("sum_value", round(col("sum_value"), 4))
        .orderBy("window_start", "event_type")
    }),

    "q12_events_sliding" -> ((s, dir) => {
      // sliding window counts (1h window, 30m hop)
      EventStreams.slidingCounts(t(s, dir, "events"), "1 hour", "30 minutes")
        .orderBy("window_start", "event_type")
    }),

    "q13_events_sessions" -> ((s, dir) => {
      // gap-based session windows over events
      EventStreams.sessionCounts(t(s, dir, "events"), "30 minutes")
        .withColumn("sum_value", round(col("sum_value"), 4))
        .orderBy("user_id", "session_start")
    }),

    // ================= grid operators (SyntheticGrid) =================
    "g01_crop" -> ((s, _) => {
      // snapped bbox crop + inclusive-both-ends time crop (P2+P3)
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m", "u100"))
      Crop.time(Crop.bbox(g, cropBox), "2019-01-30 12:00:00", "2019-01-31 06:00:00")
        .df.orderBy("time", "y", "x")
    }),

    "g41_where_clip_fillna" -> ((s, _) => {
      // the xarray masking trio on one relation: where(t2m >= 50)
      // nulls the low half, fillna(0) restores it as a sentinel, and
      // clip(20, 80) clamps the raw values — all pure column
      // expressions, rows never dropped
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m"))
      val masked = g.whereMask(col("t2m") >= 50.0)
      val out = masked.df
        .withColumnRenamed("t2m", "t2m_masked")
        .withColumn("t2m_filled", coalesce(col("t2m_masked"), lit(0.0)))
      out.join(g.clip(20.0, 80.0).df.withColumnRenamed("t2m", "t2m_clip"),
          Seq("time", "y", "x"))
        .select(col("time"), col("y"), col("x"),
          col("t2m_masked"), col("t2m_filled"), col("t2m_clip"))
        .orderBy("time", "y", "x")
    }),

    "g48_spatial_sum_acf" -> ((s, _) => {
      // periodicity audit of the domain-total series: spatial SUM per
      // timestep in exact x1024 longs, then integer-moment
      // autocorrelation at lags 1..30 (the lag-24 peak is the diurnal
      // detector; this hash-based field shows none — the flat ACF IS
      // the finding, like n130's flat Zipf slope)
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m"))
      val series = g.df.groupBy(col("time"))
        .agg(sum((col("t2m") * 1024).cast("long")).as("ksum"))
      graft.ops.TimeSeries.integerAcf(series, "time", "ksum", maxLag = 30)
        .orderBy("lag")
    }),

    "g47_spatial_gradient" -> ((s, _) => {
      // spatial differentiate: central differences over x and y per
      // timestep (one-sided at edges) + the gradient magnitude — the
      // same two window partitionings as the focal mean, no join
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m"))
      operators.SpatialResample.spatialGradient(g, "t2m")
        .orderBy("time", "y", "x")
    }),

    "n130_zipf_fit" -> ((s, dir) => {
      // corpus-health one-liner: OLS of ln(freq) on ln(rank) over the
      // top 25 ranks (the 31-word vocabulary caps the fit window), all
      // sums exact integers after x1e3 log rounding
      TextAnalysis.zipfFit(t(s, dir, "documents"), topR = 25)
    }),

    "g46_bilinear_points" -> ((s, _) => {
      // xarray ds.interp(method="linear") at scattered station points:
      // driver-side stencil/weight arithmetic (closed form from the
      // axis, no scan), one pruned conditional-agg pass, fixed-order
      // weighted sum — pC sits exactly on grid lines so the degenerate
      // fx=fy=0 path is value-bearing too
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m"))
      operators.PointExtract.bilinearPoints(g, Seq(
          ("pA", -83.1234, 41.4567),
          ("pB", -80.001, 42.70),
          ("pC", -82.0, 42.0)), "t2m")
        .orderBy("time", "point_id")
    }),

    "g45_seasonal_mase" -> ((s, _) => {
      // diurnal predictability audit: seasonal-naive (lag 24h) vs
      // one-step-naive error per cell over the same evaluation rows;
      // both sums exact, the MASE ratio one deterministic division
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m"))
      TemporalResample.seasonalMase(g, season = 24).orderBy("y", "x")
    }),

    "g42_focal_mean" -> ((s, _) => {
      // 2-D focal mean (raster focal statistics / centered 3x3 rolling
      // window): SEPARABLE two-pass sum+count box filter — two 1-D
      // RANGE windows, no neighbor self-join; edge boxes shrink to the
      // cells that exist. Grid rationals keep every partial sum exact,
      // so no rounding is needed for the cross-engine hash
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m"))
      operators.SpatialResample.focalMean(g, radius = 1)
        .df.orderBy("time", "y", "x")
    }),

    "g43_polyfit_trend" -> ((s, _) => {
      // xarray ds.polyfit(dim="time", deg=1): per-cell OLS trend in
      // units/hour, regressor centered per cell so the normal-equation
      // sums stay exactly representable — slope and intercept are
      // exact until the final IEEE divisions (no rounding)
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m"))
      TemporalResample.polyfitTrend(g).orderBy("y", "x")
    }),

    "g44_shift_diff_cumsum" -> ((s, _) => {
      // the xarray along-time trio on one relation: shift(time=2),
      // diff("time"), cumsum("time") — three cell-keyed window columns
      // sharing ONE sort+exchange (same partition keys and order), no
      // self-join; GridModelSpec proves the GridDataset.shiftTime/
      // diffTime/cumsumTime methods equal these columns exactly
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m"))
      val w = Window.partitionBy(col("y"), col("x")).orderBy(col("time"))
      g.df.select(col("time"), col("y"), col("x"),
          lag(col("t2m"), 2).over(w).as("t2m_shift2"),
          (col("t2m") - lag(col("t2m"), 1).over(w)).as("t2m_diff"),
          sum(col("t2m")).over(w.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)).as("t2m_cumsum"))
        .orderBy("time", "y", "x")
    }),

    "g39_diurnal_cycle" -> ((s, _) => {
      // xarray ds.groupby("time.hour").mean() climatology: per-cell
      // diurnal cycle — one map-side-combinable agg on (hour, y, x)
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m"))
      g.df.groupBy(hour(col("time")).cast("long").as("hr"), col("y"), col("x"))
        .agg(avg("t2m").as("t2m_mean"), count(lit(1)).as("n"))
        .orderBy("hr", "y", "x")
    }),

    "g40_anomaly" -> ((s, _) => {
      // the groupby-transform surface (xarray g - g.groupby(..).mean()):
      // anomaly against the per-(hour, cell) climatology via ONE
      // window — no self-join of the grid against its own aggregate
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m"))
      val w = Window.partitionBy(hour(col("time")), col("y"), col("x"))
      g.df.select(col("time"), col("y"), col("x"),
          (col("t2m") - avg(col("t2m")).over(w)).as("t2m_anom"))
        .orderBy("time", "y", "x")
    }),

    "g37_time_integral" -> ((s, _) => {
      // xarray ds.integrate("time"): trapezoidal integral per cell
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m"))
      TemporalResample.timeIntegral(g)
        .withColumn("integral_t2m", round(col("integral_t2m"), 6))
        .orderBy("y", "x")
    }),

    "g38_time_derivative" -> ((s, _) => {
      // xarray ds.differentiate("time"): central differences inside,
      // one-sided at the edges — per-row IEEE expressions, no rounding
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m"))
      TemporalResample.timeDerivative(g).df.orderBy("time", "y", "x")
    }),

    "g36_weighted_spatial_mean" -> ((s, _) => {
      // xarray ds.weighted(cos(lat)).mean() — the area-correct spatial
      // mean; the unweighted mean rides along so the bias is visible
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m"))
      SpatialResample.weightedSpatialMean(g).orderBy("time")
    }),

    "g34_rolling_time_mean" -> ((s, _) => {
      // xarray ds.rolling(time=4).mean() surface: trailing 4-step
      // window per cell, leading edge NULL (min_periods = window).
      // One (y,x)-partitioned window — a single cell-key shuffle
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m"))
      TemporalResample.rollingTime(g, nSteps = 4, method = "mean")
        .df.orderBy("time", "y", "x")
    }),

    "g02_downsample_6h_mean" -> ((s, _) => {
      // 6-hourly mean temporal downsample (A1)
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m", "u100"))
      TemporalResample.downsample(g, "6 hours", "mean").df.orderBy("time", "y", "x")
    }),

    "g03_daily_stats" -> ((s, _) => {
      // daily multi-aggregate temporal downsample (A1)
      val g = SyntheticGrid.grid(s)
      g.df.groupBy(date_trunc("day", col("time")).as("day"), col("y"), col("x"))
        .agg(median(col("t2m")).as("med_t2m"), min("t2m").as("min_t2m"),
             max("t2m").as("max_t2m"), sum("t2m").as("sum_t2m"))
        .orderBy("day", "y", "x")
    }),

    "g04_spatial_stats" -> ((s, _) => {
      // per-timestep spatial aggregate over the grid (A3)
      val g = SyntheticGrid.grid(s)
      g.df.groupBy(col("time"))
        .agg(avg("t2m").as("mean_t2m"), round(stddev("t2m"), 6).as("std_t2m"),
             min("t2m").as("min_t2m"), max("t2m").as("max_t2m"))
        .orderBy("time")
    }),

    "g05_points_table" -> ((s, _) => {
      // nearest-cell point extraction pivoted to a time x station table (J2+R1)
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m"))
      PointExtract.pointsToTable(g, points, "t2m")
    }),

    "g06_var_merge" -> ((s, _) => {
      // coordinate equi-join merge of two variables (J1)
      val g = SyntheticGrid.grid(s)
      val a = Crop.bbox(g.selectVariables(Seq("t2m")), BBox(-83.5, 41.25, -81.0, 42.75))
      val b = Crop.bbox(g.selectVariables(Seq("u100")), BBox(-82.0, 41.25, -79.0, 42.75))
      VariableMerge.merge(Seq(a, b)).df.orderBy("time", "y", "x")
    }),

    "g07_upsample_linear" -> ((s, _) => {
      // hourly -> 3-hourly-grid linear interpolation upsample (W3)
      val g = Crop.bbox(SyntheticGrid.grid(s).selectVariables(Seq("t2m")), upBox)
      TemporalResample.upsample(g, 1800, "linear").df.orderBy("time", "y", "x")
    }),

    "g08_upsample_ffill" -> ((s, _) => {
      // forward-fill upsample onto a denser time grid (W1)
      val g = Crop.bbox(SyntheticGrid.grid(s).selectVariables(Seq("t2m")), upBox)
      TemporalResample.upsample(g, 1800, "ffill").df.orderBy("time", "y", "x")
    }),

    "g31_upsample_bfill" -> ((s, _) => {
      // W2 bfill, previously spec-only: the backward mirror of g08
      val g = Crop.bbox(SyntheticGrid.grid(s).selectVariables(Seq("t2m")), upBox)
      TemporalResample.upsample(g, 1800, "bfill").df.orderBy("time", "y", "x")
    }),

    "g32_concat_time" -> ((s, _) => {
      // U1 time-concat, previously spec-only: split the grid into two
      // disjoint time chunks and reassemble — must equal the source
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m", "u100"))
      val first = Crop.time(g, "2019-01-30 00:00:00", "2019-01-31 23:00:00")
      val second = Crop.time(g, "2019-02-01 00:00:00", "2019-02-02 00:00:00")
      VariableMerge.concatTime(Seq(first, second)).df.orderBy("time", "y", "x")
    }),

    "g35_hilbert_key" -> ((s, _) => {
      // the Hilbert clustering key (Zorder.writeHilbertClustered's
      // sort key) as a codegen expression; the oracle replays the
      // 16-step bit-descent with quadrant rotation as unrolled CTEs
      SyntheticGrid.df(s)
        .select(col("time"), col("y"), col("x"),
          org.apache.spark.sql.graft.GraftFunctions
            .hilbert_key(col("jy"), col("jx")).as("hkey"))
        .orderBy("time", "y", "x")
    }),

    "g33_zorder_key" -> ((s, _) => {
      // the storage-layout clustering key Zorder.writeZordered sorts
      // by: Morton bit-interleave of the cell indices, as a codegen
      // expression — oracled by a plain bit-arithmetic replay
      SyntheticGrid.df(s)
        .select(col("time"), col("y"), col("x"),
          org.apache.spark.sql.graft.GraftFunctions
            .interleave_bits(col("jy"), col("jx")).as("zkey"))
        .orderBy("time", "y", "x")
    }),

    "g22_flagship_pipeline" -> ((s, _) => {
      // the full reference-shaped pipeline as one oracled query:
      // registry load -> bbox crop -> time crop -> snap-join -> pivot
      entry(s)
    }),

    "g09_spatial_nearest_x2" -> ((s, _) => {
      // 2x nearest-neighbor spatial regrid (X1)
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m"))
      SpatialResample.nearest(g, fy = 2.0, fx = 2.0).df.orderBy("time", "y", "x")
    }),

    "g10_spatial_bilinear_x2" -> ((s, _) => {
      // 2x bilinear spatial regrid via generated-mapping join (X1)
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m"))
      SpatialResample.bilinear(g, fy = 2.0, fx = 2.0).df
        .withColumn("t2m", round(col("t2m"), 6))
        .orderBy("time", "y", "x")
    }),

    "g21_spatial_cubic_x2" -> ((s, _) => {
      // 2x cubic-convolution (4x4-tap) spatial regrid (X1)
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m"))
      SpatialResample.cubic(g, fy = 2.0, fx = 2.0).df
        .withColumn("t2m", round(col("t2m"), 6))
        .orderBy("time", "y", "x")
    }),

    "g29_spatial_cubicspline_x2" -> ((s, _) => {
      // GDAL cubic_spline: B3 smoothing kernel, completes the
      // rasterio.Resampling family
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m"))
      // +1e-9 before rounding: B3 weights are k/6 rationals, so aligned
      // cells can land exactly on the .5e-6 rounding boundary with
      // engine-order ulp residue on either side (cf. g20)
      SpatialResample.cubicSpline(g, fy = 2.0, fx = 2.0).df
        .withColumn("t2m", round(col("t2m") + 1e-9, 6))
        .orderBy("time", "y", "x")
    }),

    "g23_spatial_agg_half" -> ((s, _) => {
      // reduction half of the rasterio.Resampling family (X1):
      // average/sum/min/max/rms block downsample; exact across engines
      // (values are k/2^10, all reductions order-independent)
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m"))
      SpatialResample.blockAgg(g, fy = 0.5, fx = 0.5,
          Seq("average", "sum", "min", "max", "rms"))
        .df.orderBy("time", "y", "x")
    }),

    "g24_spatial_quantiles_half" -> ((s, _) => {
      // med/q1/q3 block downsample (exact linear-interp percentiles)
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m"))
      SpatialResample.blockAgg(g, fy = 0.5, fx = 0.5, Seq("med", "q1", "q3"))
        .df.orderBy("time", "y", "x")
    }),

    "g25_spatial_mode_half" -> ((s, _) => {
      // mode block downsample over integer-binned values (ties broken by
      // smallest value — deterministic, unlike GDAL's unspecified order)
      val g0 = SyntheticGrid.grid(s).selectVariables(Seq("t2m"))
      val g = g0.copy(df = g0.df.withColumn("t2m", floor(col("t2m"))))
      SpatialResample.blockMode(g, fy = 0.5, fx = 0.5)
        .df.orderBy("time", "y", "x")
    }),

    "g26_spatial_gauss_half" -> ((s, _) => {
      // half-resolution Gaussian-kernel downsample (X1)
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m"))
      SpatialResample.blockGauss(g, fy = 0.5, fx = 0.5).df
        .withColumn("t2m", round(col("t2m"), 6))
        .orderBy("time", "y", "x")
    }),

    "g27_spatial_lanczos_x2" -> ((s, _) => {
      // 2x Lanczos (6x6-tap) spatial regrid (X1)
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m"))
      SpatialResample.lanczos(g, fy = 2.0, fx = 2.0).df
        .withColumn("t2m", round(col("t2m"), 6))
        .orderBy("time", "y", "x")
    }),

    "g11_tz_subset" -> ((s, _) => {
      // timezone-aware bounds-only time subset (P4)
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m"))
      Crop.timeByZone(g, tzStart, tzEnd, "America/New_York")
        .df.orderBy("time", "y", "x")
    }),

    "g12_bbox_extremes" -> ((s, _) => {
      // per-variable extremes inside a bbox (A4)
      SyntheticGrid.grid(s).df
        .agg(min("x").as("west"), max("x").as("east"),
             min("y").as("south"), max("y").as("north"))
    }),

    "g13_downsample_first_last" -> ((s, _) => {
      // first/last temporal downsample aggregates (A1)
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m"))
      g.df.groupBy(window(col("time"), "1 day").getField("start").as("time"),
          col("y"), col("x"))
        .agg(TemporalResample.aggFor("first", col("t2m"), col("time")).as("first_t2m"),
             TemporalResample.aggFor("last", col("t2m"), col("time")).as("last_t2m"))
        .orderBy("time", "y", "x")
    }),

    "g14_upsample_nearest" -> ((s, _) => {
      // nearest-in-time upsample (W3)
      val g = Crop.bbox(SyntheticGrid.grid(s).selectVariables(Seq("t2m")), upBox)
      TemporalResample.upsample(g, 1800, "nearest").df.orderBy("time", "y", "x")
    }),

    "g19_upsample_cubic" -> ((s, _) => {
      // oracled against an independent dense not-a-knot solve (see the
      // spline-oracle scaffolding above)
      val g = Crop.bbox(SyntheticGrid.grid(s).selectVariables(Seq("t2m")), upBox)
      TemporalResample.upsample(g, 1800, "cubic").df
        .withColumn("t2m", round(col("t2m"), 6)).orderBy("time", "y", "x")
    }),

    "g20_upsample_quadratic" -> ((s, _) => {
      // oracled pipeline check (weights from the production solver).
      // +1e-9 before rounding: at knot times the true value is a dyadic
      // k/2^10 that often sits EXACTLY on the .5e-6 rounding boundary,
      // while both engines evaluate it with ~1e-13 residue on either
      // side; the nudge moves the boundary off those values symmetrically
      val g = Crop.bbox(SyntheticGrid.grid(s).selectVariables(Seq("t2m")), upBox)
      TemporalResample.upsample(g, 1800, "quadratic").df
        .withColumn("t2m", round(col("t2m") + 1e-9, 6)).orderBy("time", "y", "x")
    }),

    "g15_gage_render" -> ((s, _) => {
      // oracled: grid values are k/2^10 — exact binary doubles whose
      // shortest decimal rendering agrees across engines
      val g = Crop.bbox(SyntheticGrid.grid(s).selectVariables(Seq("t2m")),
        BBox(-83.5, 41.25, -83.0, 41.5))
      Gssha.gageRows(g, "t2m", "GAGES",
        Seq(("e1", "2019-01-30 00:00:00", "2019-01-30 23:00:00"),
            ("e2", "2019-02-01 00:00:00", "2019-02-02 00:00:00")))
    }),

    "g16_wes_render" -> ((s, _) => {
      // oracled: spatial means rendered after round(.., 6) so the string
      // form is reproducible across engines
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m", "u100"))
      Gssha.wesRows(g, Map("t2m" -> "Dry Bulb Temperature", "u100" -> "Wind Speed"),
        roundTo = Some(6))
    }),

    "g17_grass_render" -> ((s, _) => {
      // full-content oracle: header + per-row value rendering are exact
      // strings (grid values are binary-exact doubles)
      val g = Crop.bbox(SyntheticGrid.grid(s).selectVariables(Seq("t2m")),
        BBox(-83.5, 41.25, -83.0, 41.5))
      Gssha.grassAscii(g, "t2m", Some("Dry Bulb Temperature"))
    }),

    "g30_reproject_wgs84" -> ((s, _) => {
      // X2: the synthetic grid re-labeled onto a GLanCE LAEA meter grid,
      // warped to lat/lon; the trig runs driver-side on the
      // metadata-sized mapping, which the oracle shares
      val base = SyntheticGrid.df(s).select(col("time"),
        (lit(glYa.origin) + col("jy") * lit(glYa.step)).as("y"),
        (lit(glXa.origin) + col("jx") * lit(glXa.step)).as("x"),
        col("t2m"))
      val g = graft.model.GridDataset(base, SyntheticGrid.meta.copy(
        epsg = 0, xAxis = Some(glXa), yAxis = Some(glYa)))
      Reproject.toWgs84(g, graft.functions.Crs.GlanceNA).df
        .orderBy("time", "lat", "lon")
    }),

    "g28_cmr_granule_bbox" -> ((s, _) => {
      // S3 catalog-search parsing as a distributed projection
      import s.implicits._
      graft.sources.Cmr.granuleBBoxes(cmrEntries.toDF("entry"), "entry")
        .orderBy("granule_id")
    }),

    // ============== more relational: subquery / rollup / as-of =========
    "q14_above_avg_orders" -> ((s, dir) => {
      // orders above the average total (scalar subquery)
      val w = Window.partitionBy("o_custkey")
      // cust_avg itself is excluded from the output: a windowed double
      // average is order-dependent in its last bits, which the exact
      // hash-compare would see; the comparison against it is stable
      t(s, dir, "orders")
        .withColumn("cust_avg", avg("o_totalprice").over(w))
        .filter(col("o_totalprice") > col("cust_avg"))
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "o_orderkey")
    }),

    "q15_rollup_revenue" -> ((s, dir) => {
      // via the engine's SQL surface: Dataset.rollup after a multi-join
      // trips Spark 4.1's ambiguous-self-join check (false positive; even
      // with fresh aliases), while SQL-path resolution plans it cleanly
      Seq("orders", "customer", "nation", "region")
        .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
      // broadcast the dimension side explicitly so the rollup star join
      // keeps q03's broadcast-hash plan (no stats on temp views)
      s.sql("""SELECT /*+ BROADCAST(customer, nation, region) */
              |       coalesce(r_name, 'ALL') AS r_name,
              |       coalesce(n_name, 'ALL') AS n_name,
              |       round(sum(o_totalprice), 2) AS revenue,
              |       count(*) AS n_orders
              |FROM orders JOIN customer ON o_custkey = c_custkey
              | JOIN nation ON c_nationkey = n_nationkey
              | JOIN region ON n_regionkey = r_regionkey
              |GROUP BY ROLLUP(r_name, n_name)
              |ORDER BY r_name, n_name""".stripMargin)
    }),

    "q16_asof_click_before_purchase" -> ((s, dir) => {
      // as-of join: last click before each purchase (union-tag + window, no inequality-join blowup)
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"),
                col("event_id").as("click_id"))
      AsOfJoin.backward(purchases, clicks, leftOn = "ts", rightOn = "click_ts",
          by = Seq("user_id"), payload = Seq("click_id", "click_ts"))
        .orderBy("event_id")
    }),

    // ================= LLM-pipeline north-star ops ====================
    "n01_exact_dedup" -> ((s, dir) => {
      // non-vacuous: runs over plantedDocs (exact copies of the three
      // lowest ids), so the dedup must actually DROP the copies — the
      // fixture alone has no duplicate texts and the op would be an
      // identity map
      Dedup.exactDedup(plantedDocs(s, dir))
        .select("doc_id", "n_chars").orderBy("doc_id")
    }),

    "n02_dup_groups" -> ((s, dir) => {
      // non-vacuous for the same reason: three 2-copy groups
      Dedup.exactGroups(plantedDocs(s, dir))
        .select("digest", "keep_id", "n_copies").orderBy("digest")
    }),

    "n03_token_counts" -> ((s, dir) => {
      // whitespace + BPE-ish regex token counts per doc
      val d = t(s, dir, "documents")
      d.select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          TextAnalysis.subwordCount(col("text")).as("n_subwords"))
        .orderBy("doc_id")
    }),

    "n04_quality" -> ((s, dir) => {
      // length/punctuation/stopword-ratio quality features
      TextAnalysis.qualityFeatures(t(s, dir, "documents"))
        .select(col("doc_id"), col("n_chars"), col("n_tokens"),
          round(col("alpha_ratio"), 6).as("alpha_ratio"),
          round(col("punct_ratio"), 6).as("punct_ratio"),
          round(col("stopword_ratio"), 6).as("stopword_ratio"),
          col("quality_score"))
        .orderBy("doc_id")
    }),

    "n05_langid" -> ((s, dir) => {
      // character-n-gram heuristic language identification
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_guess"))
        .orderBy("doc_id")
    }),

    "n06_fingerprints" -> ((s, dir) => {
      // rolling-hash document fingerprints (codegen expression)
      TextAnalysis.fingerprints(t(s, dir, "documents"))
        .select("doc_id", "md5_fingerprint").orderBy("doc_id")
    }),

    "n07_fingerprints_rolling" -> ((s, dir) => {
      // the native rolling_hash64 expression, oracled: DuckDB replays
      // h = (h*131 + char) mod (2^61 - 1) via list_reduce in HUGEINT
      TextAnalysis.fingerprints(t(s, dir, "documents"))
        .select("doc_id", "rolling_fingerprint").orderBy("doc_id")
    }),

    "n08_knn_bruteforce" -> ((s, dir) => {
      // exact brute-force cosine top-k (guarded audit baseline)
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), 10)
        .select(col("query_id"), col("vec_id"),
          round(col("cos"), 6).as("cos"), col("rank").cast("long").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    "n138_mmr_select" -> ((s, dir) => {
      // greedy maximal-marginal-relevance pick of 5 diverse neighbors
      // for query 0 at λ=0.75 (complement 0.25 is binary-exact — the
      // cross-engine IEEE caveat on the operator): each step's argmax
      // replays in the oracle as an unrolled CTE chain over the same
      // cosine kernel
      Similarity.mmrSelect(t(s, dir, "embeddings"), queryId = 0L,
          k = 5, lambda = 0.75)
        .select(col("rank"), col("vec_id"),
          round(col("simq"), 6).as("simq"), round(col("score"), 6).as("score"))
        .orderBy("rank")
    }),

    "n140_margin_mining" -> ((s, dir) => {
      // bitext-style pair mining: a 200-vector mining batch (even ids
      // < 400) scored against the odd-id side by the Artetxe-Schwenk
      // RATIO margin — cosine normalized by both endpoints' top-4
      // neighborhood density, so hub vectors stop winning every
      // pairing; neighborhood sums fold in rank order, so the oracle
      // replays margins bit-for-bit
      val emb = t(s, dir, "embeddings")
      Similarity.marginMine(
          emb.filter(col("vec_id") % 2 === 0 && col("vec_id") < 400),
          emb.filter(col("vec_id") % 2 === 1), k = 4)
        .select(col("src_id"), col("dst_id"),
          round(col("cos"), 6).as("cos"), round(col("margin"), 6).as("margin"),
          col("mrank").cast("long").as("mrank"))
        .orderBy("src_id", "mrank")
    }),

    "n151_margin_shortlist" -> ((s, dir) => {
      // the n140 miner composed with a REAL ANN retriever: candidates
      // are sign-LSH bucket co-occurrences (the n09 bucketing, 10
      // planes x 6 tables) between the even-id mining batch and the
      // odd-id side; only candidate pairs are scored and ranked — no
      // broadcast cross-scoring, no side-size guard needed — and the
      // margin arithmetic downstream is marginMine's own code path
      val emb = t(s, dir, "embeddings")
      val a = emb.filter(col("vec_id") % 2 === 0 && col("vec_id") < 400)
      val b = emb.filter(col("vec_id") % 2 === 1)
      val ca = Similarity.withSignBuckets(a, "embedding", 10, 6)
        .select(col("table"), col("bucket"), col("vec_id").as("src_id"))
      val cb = Similarity.withSignBuckets(b, "embedding", 10, 6)
        .select(col("table"), col("bucket"), col("vec_id").as("dst_id"))
      val cand = ca.join(cb, Seq("table", "bucket"))
        .select("src_id", "dst_id")
      Similarity.marginMineShortlist(a, b, cand, k = 4)
        .select(col("src_id"), col("dst_id"),
          round(col("cos"), 6).as("cos"), round(col("margin"), 6).as("margin"),
          col("mrank").cast("long").as("mrank"))
        .orderBy("src_id", "mrank")
    }),

    "n139_mmr_shortlist" -> ((s, dir) => {
      // scale-bounded MMR: the same greedy λ-tempered loop as n138,
      // but each of the 5 steps scans a 20-candidate exact-cosine
      // shortlist instead of the corpus (the ANN-shortlist
      // composition made concrete); the oracle rebuilds the
      // (simq DESC, vec_id) top-20 and replays the identical
      // unrolled steps over it
      val emb = t(s, dir, "embeddings")
      val short = Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id") === 0L), 20)
      Similarity.mmrSelectShortlist(emb, short, queryId = 0L,
          k = 5, lambda = 0.75)
        .select(col("rank"), col("vec_id"),
          round(col("simq"), 6).as("simq"), round(col("score"), 6).as("score"))
        .orderBy("rank")
    }),

    "n137_hard_negatives" -> ((s, dir) => {
      // contrastive-training data prep: top-5 nearest neighbors per
      // query EXCLUDING self and the declared positive (the q -> q+1
      // pairing fixture) — ranks renumber after the exclusions, so a
      // positive inside the true top-5 shifts every rank below it
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 3)
      val positives = Seq((0L, 1L), (1L, 2L), (2L, 3L))
        .toDF("query_id", "pos_id")
      Similarity.hardNegatives(emb, queries, positives, k = 5)
        .select(col("query_id"), col("vec_id"),
          round(col("cos"), 6).as("cos"), col("rank").cast("long").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    "n09_knn_lsh" -> ((s, dir) => {
      // oracled: the sign-LSH buckets are deterministic (splitmix-derived
      // hyperplanes, sequential double dot), so DuckDB replays bucketing,
      // the candidate join, and the exact-cosine re-rank
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5), 10, dim = 64)
        .select(col("query_id"), col("vec_id"),
          round(col("cos"), 6).as("cos"), col("rank").cast("long").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    "n10_minhash_neardups" -> ((s, dir) => {
      // oracled: the whole LSH choreography is deterministic — DuckDB
      // replays minhash signatures (FNV shingles, splitmix perms,
      // fmix64), the banded candidate join, and the exact-Jaccard
      // verification
      Dedup.minhashNearDups(t(s, dir, "documents"), k = 5, numHashes = 64,
          bands = 16, threshold = 0.5)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("doc_id_a", "doc_id_b")
    }),

    "n11_simhash_neardups" -> ((s, dir) => {
      // oracled: pigeonhole banding (maxDistance+1 bands) guarantees
      // full recall at hamming <= 6, so the output IS the exact pair
      // set — DuckDB self-joins replayed simhashes
      Dedup.simhashNearDups(t(s, dir, "documents"), maxDistance = 6)
        .orderBy("doc_id_a", "doc_id_b")
    }),

    "n12_media_schema" -> ((s, dir) => {
      // real-bytes fixture: image rows carry genuine PNG/GIF/BMP headers
      // (byte_len = header + text, replayed arithmetically by the oracle)
      val media = Multimodal.mediaWithHeaders(t(s, dir, "documents"))
      Multimodal.extractFeatures(media).toDF()
        .select(col("media_id"), col("media_type"), col("byte_len"))
        .orderBy("media_id")
    }),

    "n13_media_features" -> ((s, dir) => {
      // every emitted value comes from a REAL header parse: image
      // width/height from PNG/GIF/BMP, video n_frames from the MP4
      // stsz sample_count, audio/video dims pinned to 0 by the parser
      // (no pixel dims in WAV/mvhd). The fixture encodes each field
      // from doc_id, so DuckDB recomputes them arithmetically — any
      // parse bug breaks the hash. Ints cast to long for BIGINT parity.
      val media = Multimodal.mediaWithHeaders(t(s, dir, "documents"))
      Multimodal.extractFeatures(media).toDF()
        .select(col("media_id"), col("media_type"), col("byte_len"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_frames").cast("long").as("n_frames"))
        .orderBy("media_id")
    }),

    "n14_embedding_neardups" -> ((s, dir) => {
      // Oracled against exact all-pairs on a NON-vacuous result: the
      // fixture alone has no pairs at cosine >= 0.8 (max organic pair
      // ~0.51 — OpsSpec guards that assumption), so the query runs over
      // plantedEmbeddings, whose scaled copies are recalled with
      // probability 1 (sign-invariance) — the oracle is a true set
      // equality on a non-empty pair set (cos ~1, three pairs).
      Dedup.embeddingNearDups(plantedEmbeddings(s, dir), threshold = 0.8,
          planes = 8, tables = 8, dim = 64)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("vec_id_a", "vec_id_b")
    }),

    "n23_embedding_dedup" -> ((s, dir) => {
      // the dedup wrapper over the same planted construction: keeps
      // every vector that does not near-duplicate a lower vec_id —
      // oracled as an anti-join against the exact duplicate set
      Dedup.embeddingDedup(plantedEmbeddings(s, dir), threshold = 0.8,
          planes = 8, tables = 8, dim = 64)
        .select("vec_id")
        .orderBy("vec_id")
    }),

    "n24_media_resize" -> ((s, dir) => {
      // resize geometry over REAL header dims: scale = min(1, 256/edge),
      // aspect preserved — pure arithmetic the oracle replays from the
      // dims the fixture encoded into each PNG/GIF/BMP header. The
      // media_type filter runs BEFORE the decode: the typed
      // mapPartitions boundary blocks predicate pushdown, so at 100 TB
      // an after-the-fact filter would decode the whole corpus
      val media = Multimodal.mediaWithHeaders(t(s, dir, "documents"))
        .filter(col("media_type") === "image")
      Multimodal.resizePlan(Multimodal.extractFeatures(media), maxEdge = 256)
        .select(col("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("target_w").cast("long").as("target_w"),
          col("target_h").cast("long").as("target_h"))
        .orderBy("media_id")
    }),

    "n25_media_frames" -> ((s, dir) => {
      // frame sampling: every 10th frame index of each video row;
      // n_frames is the REAL stsz sample_count parsed from the MP4
      // prefix the fixture wrote; video filter pushed ahead of the
      // decode boundary, as in n24
      val media = Multimodal.mediaWithHeaders(t(s, dir, "documents"))
        .filter(col("media_type") === "video")
      Multimodal.sampleFrames(Multimodal.extractFeatures(media), stride = 10)
        .select(col("media_id"),
          col("n_frames").cast("long").as("n_frames"),
          col("frame_idx").cast("long").as("frame_idx"))
        .orderBy("media_id", "frame_idx")
    }),

    "n64_slice_diff" -> ((s, dir) => {
      // crawl-yield report over n49's exact fixture: per source, how
      // much of the slice is new vs cross-corpus vs within-slice dup —
      // all-integer counts that partition the slice exactly
      val base = t(s, dir, "documents")
      val existing = base.filter(col("doc_id") % 2 === 0)
      val incoming = base.filter(col("doc_id") % 2 === 1)
        .unionAll(base.filter(col("doc_id").isin(0L, 2L, 4L))
          .withColumn("doc_id", col("doc_id") + 2000001L))
        .unionAll(base.filter(col("doc_id") === 1L)
          .withColumn("doc_id", lit(2000007L)))
      Dedup.sliceDiffReport(existing, incoming).orderBy("source")
    }),

    "n74_bloom_dedup" -> ((s, dir) => {
      // the bloom-prefiltered shape of n49's incremental dedup, same
      // fixture — the result-equality law (bloom == plain anti-join)
      // is what the shared oracle proves; only might-contain rows
      // reach the shuffle join
      val base = t(s, dir, "documents")
      val existing = base.filter(col("doc_id") % 2 === 0)
      val incoming = base.filter(col("doc_id") % 2 === 1)
        .unionAll(base.filter(col("doc_id").isin(0L, 2L, 4L))
          .withColumn("doc_id", col("doc_id") + 2000001L))
        .unionAll(base.filter(col("doc_id") === 1L)
          .withColumn("doc_id", lit(2000007L)))
      Dedup.incrementalDedupBloom(
          existing.select(md5(col("text")).as("__digest")), incoming)
        .select("doc_id", "n_chars").orderBy("doc_id")
    }),

    "n49_incremental_dedup" -> ((s, dir) => {
      // a new crawl slice deduped against the published corpus without
      // rescanning it: existing = even doc_ids, incoming = odd doc_ids
      // plus planted copies (three existing texts re-id'd, which the
      // cross-corpus anti-join must drop, and one within-slice copy of
      // doc 1, which the slice-local dedup must drop) — non-vacuous in
      // the n01 planting style: a bug either leaks a planted row in or
      // drops an original out
      val base = t(s, dir, "documents")
      val existing = base.filter(col("doc_id") % 2 === 0)
      val incoming = base.filter(col("doc_id") % 2 === 1)
        .unionAll(base.filter(col("doc_id").isin(0L, 2L, 4L))
          .withColumn("doc_id", col("doc_id") + 2000001L))
        .unionAll(base.filter(col("doc_id") === 1L)
          .withColumn("doc_id", lit(2000007L)))
      Dedup.incrementalDedup(existing, incoming)
        .select("doc_id", "n_chars").orderBy("doc_id")
    }),

    "n150_incremental_neardup" -> ((s, dir) => {
      // the weekly re-crawl, NEAR-dup edition: a slice deduped against
      // the published corpus's minhash BAND INDEX — old signatures read
      // from the index relation, never recomputed. Planted MUTATED
      // copies (short appended tails: high Jaccard, different digest,
      // so n49's exact path cannot catch them) of existing docs 0/2/4
      // must drop via the index join, a mutated copy of slice mate 251
      // via the within-slice banding; genuinely new docs survive. Ids
      // keep the ingest-order invariant (old < 250 <= new), so the
      // oracle replays batch banding over the union and drops doc_id_b
      val base = t(s, dir, "documents")
      val existing = base.filter(col("doc_id") < 250)
      val incoming = base.filter(col("doc_id") >= 250)
        .unionAll(base.filter(col("doc_id").isin(0L, 2L, 4L))
          .withColumn("doc_id", col("doc_id") + 3000000L)
          .withColumn("text", concat(col("text"), lit(" tail bit"))))
        // doc_id stays a COLUMN (251 + 2999756 = 3000007): a lit() id
        // would fold the semi-join keys on this branch into constants
        // and degrade every downstream id join to a nested loop —
        // PlanLintSpec caught exactly that
        .unionAll(base.filter(col("doc_id") === 251L)
          .withColumn("doc_id", col("doc_id") + 2999756L)
          .withColumn("text", concat(col("text"), lit(" x"))))
      val index = Dedup.minhashBandIndex(existing, k = 5, numHashes = 64,
        bands = 16)
      Dedup.incrementalMinhashDedup(index, existing, incoming,
          k = 5, numHashes = 64, bands = 16, threshold = 0.5)
        .select(col("doc_id"), col("n_chars")).orderBy("doc_id")
    }),

    "n152_incremental_embdedup" -> ((s, dir) => {
      // the embedding-lake member of the incremental ladder: a vector
      // slice deduped against the published sign-LSH bucket index —
      // old embeddings never re-bucketed. Planted scaled copies
      // (x(1 + 1e-6·(id+1)), cos ~ 1: the n14 planting) of existing
      // vecs 0/1/2 must drop via the index join, a scaled copy of
      // slice mate 251 via within-slice bucketing; plant ids stay
      // COLUMNS (the n150 lit() lesson)
      val base = t(s, dir, "embeddings").select("vec_id", "embedding")
      def scaled(src: org.apache.spark.sql.DataFrame, offset: Long) = src
        .select((col("vec_id") + offset).as("vec_id"),
          transform(col("embedding"),
            x => (x * (lit(1.0) + lit(1e-6) * (col("vec_id") + 1))).cast("float"))
            .as("embedding"))
      val existing = base.filter(col("vec_id") < 250)
      val incoming = base.filter(col("vec_id") >= 250)
        .unionAll(scaled(base.filter(col("vec_id") < 3), 3000000L))
        .unionAll(scaled(base.filter(col("vec_id") === 251L), 2999756L))
      val index = Dedup.signBucketIndex(existing, planes = 12, tables = 4)
      Dedup.incrementalEmbeddingDedup(index, existing, incoming,
          threshold = 0.95, planes = 12, tables = 4)
        .select(col("vec_id")).orderBy("vec_id")
    }),

    "n153_neardup_slice_report" -> ((s, dir) => {
      // crawl-yield observability for the n150 path (the n64 report's
      // near-dup twin): per source, how much of the slice
      // near-duplicates the corpus (cross — the authority, wins mixed
      // evidence), a lower-id slice mate (within), or is new; the
      // three buckets partition the slice and n_new matches the n150
      // survivor counts (spec laws). Same planted fixture as n150
      val base = t(s, dir, "documents")
      val existing = base.filter(col("doc_id") < 250)
      val incoming = base.filter(col("doc_id") >= 250)
        .unionAll(base.filter(col("doc_id").isin(0L, 2L, 4L))
          .withColumn("doc_id", col("doc_id") + 3000000L)
          .withColumn("text", concat(col("text"), lit(" tail bit"))))
        .unionAll(base.filter(col("doc_id") === 251L)
          .withColumn("doc_id", col("doc_id") + 2999756L)
          .withColumn("text", concat(col("text"), lit(" x"))))
      val index = Dedup.minhashBandIndex(existing, k = 5, numHashes = 64,
        bands = 16)
      Dedup.minhashSliceDiffReport(index, existing, incoming,
          groupCol = "source", k = 5, numHashes = 64, bands = 16,
          threshold = 0.5)
        .orderBy("source")
    }),

    "n159_exact_retraction" -> ((s, dir) => {
      // takedown for the EXACT-dedup ladder, where the bare digest set
      // cannot retract (dropping a purged doc's digest would re-admit
      // copies a surviving doc still holds): the corpus carries a
      // SHARED text (doc 0's, also held by planted 2000100), docs 0
      // and 4 are purged, and the refcounted digest relation must keep
      // suppressing doc 0's text (one live holder remains) while
      // freeing doc 4's (last holder gone) — so the slice's planted
      // re-crawl of text 0 drops and of text 4 is admitted. Plant ids
      // stay COLUMNS (the n150 lit() lesson).
      val base = t(s, dir, "documents")
      val corpus = base.filter(col("doc_id") % 2 === 0)
        .unionAll(base.filter(col("doc_id") === 0L)
          .withColumn("doc_id", col("doc_id") + 2000100L))
      val removed = corpus.filter(col("doc_id").isin(0L, 4L))
      val counts = Dedup.retractFromDigestCounts(
        Dedup.digestCounts(corpus), removed)
      val slice = base.filter(col("doc_id") % 2 === 1)
        .unionAll(base.filter(col("doc_id").isin(0L, 4L))
          .withColumn("doc_id", col("doc_id") + 3000001L))
        .unionAll(base.filter(col("doc_id") === 1L)
          .withColumn("doc_id", col("doc_id") + 3000006L))
      Dedup.incrementalDedupByDigests(counts.select("__digest"), slice)
        .select("doc_id", "n_chars").orderBy("doc_id")
    }),

    "n154_index_retraction" -> ((s, dir) => {
      // the takedown path — the index lifecycle's missing third (build
      // n150 / append / RETRACT): docs 0 and 2 are purged from the
      // corpus and retracted from the published band index BEFORE the
      // slice lands, so their mutated copies (which n150 proves the
      // intact index drops) must now be ADMITTED — a retracted doc may
      // suppress nothing — while the mutated copy of surviving doc 4
      // still drops via the index and the within-slice dup of 251
      // still drops via slice banding. Oracle: batch banding replayed
      // over corpus∖removed ∪ slice (retract-then-dedup ≡ rebuild
      // from corpus-minus-removed, the OpsSpec lifecycle law).
      val base = t(s, dir, "documents")
      val existing = base.filter(col("doc_id") < 250)
      val removed = existing.filter(col("doc_id").isin(0L, 2L))
        .select("doc_id")
      val incoming = base.filter(col("doc_id") >= 250)
        .unionAll(base.filter(col("doc_id").isin(0L, 2L, 4L))
          .withColumn("doc_id", col("doc_id") + 3000000L)
          .withColumn("text", concat(col("text"), lit(" tail bit"))))
        .unionAll(base.filter(col("doc_id") === 251L)
          .withColumn("doc_id", col("doc_id") + 2999756L)
          .withColumn("text", concat(col("text"), lit(" x"))))
      val index = Dedup.minhashBandIndex(existing, k = 5, numHashes = 64,
        bands = 16)
      val retracted = Dedup.retractFromIndex(index, removed)
      // the corpus-side contract: the purge drops the payload too
      val corpusAfter = existing.join(removed, Seq("doc_id"), "left_anti")
      Dedup.incrementalMinhashDedup(retracted, corpusAfter, incoming,
          k = 5, numHashes = 64, bands = 16, threshold = 0.5)
        .select(col("doc_id"), col("n_chars")).orderBy("doc_id")
    }),

    "n157_incremental_bloom" -> ((s, dir) => {
      // the n150 path with the published bloom sidecar consulted
      // before the index semi-join — same fixture, same oracle SQL as
      // n150 BY DESIGN: bloom filters have no false negatives, so the
      // pruned probe must return exactly the unpruned rows (the
      // OpsSpec law), and this row makes the driver's DuckDB gate
      // re-prove it at sf0.01 every round
      val base = t(s, dir, "documents")
      val existing = base.filter(col("doc_id") < 250)
      val incoming = base.filter(col("doc_id") >= 250)
        .unionAll(base.filter(col("doc_id").isin(0L, 2L, 4L))
          .withColumn("doc_id", col("doc_id") + 3000000L)
          .withColumn("text", concat(col("text"), lit(" tail bit"))))
        .unionAll(base.filter(col("doc_id") === 251L)
          .withColumn("doc_id", col("doc_id") + 2999756L)
          .withColumn("text", concat(col("text"), lit(" x"))))
      val index = Dedup.minhashBandIndex(existing, k = 5, numHashes = 64,
        bands = 16)
      val bloom = Dedup.indexBloom(index)
      Dedup.incrementalMinhashDedup(index, existing, incoming,
          k = 5, numHashes = 64, bands = 16, threshold = 0.5,
          bloom = Some(bloom))
        .select(col("doc_id"), col("n_chars")).orderBy("doc_id")
    }),

    "n162_incremental_bloom_perband" -> ((s, dir) => {
      // n157 with the SHARDED sidecar (indexBloomPerBand — the scale
      // path beyond the aggregate caps, VERDICT r11 #2): same fixture,
      // same oracle as n150/n157 BY DESIGN — per-shard blooms have no
      // false negatives either, so the sharded-pruned dedup must
      // return exactly the unpruned rows, and this row makes the
      // driver's gate re-prove the sharding law at sf0.01 every round
      val base = t(s, dir, "documents")
      val existing = base.filter(col("doc_id") < 250)
      val incoming = base.filter(col("doc_id") >= 250)
        .unionAll(base.filter(col("doc_id").isin(0L, 2L, 4L))
          .withColumn("doc_id", col("doc_id") + 3000000L)
          .withColumn("text", concat(col("text"), lit(" tail bit"))))
        .unionAll(base.filter(col("doc_id") === 251L)
          .withColumn("doc_id", col("doc_id") + 2999756L)
          .withColumn("text", concat(col("text"), lit(" x"))))
      val index = Dedup.minhashBandIndex(existing, k = 5, numHashes = 64,
        bands = 16)
      val shards = Dedup.indexBloomPerBand(index)
      Dedup.incrementalMinhashDedup(index, existing, incoming,
          k = 5, numHashes = 64, bands = 16, threshold = 0.5,
          bloomPerBand = Some(shards))
        .select(col("doc_id"), col("n_chars")).orderBy("doc_id")
    }),

    "n155_exact_substr_dedup" -> ((s, dir) => {
      // Lee et al. 2022 ExactSubstr at ARBITRARY boundaries — the
      // removal n38's chunk grid cannot do: planted copies shifted by
      // one token (a prefix word) or extended past the grid (a suffix
      // tail) never line up with any 16-word chunk, but every interior
      // word-8-gram is a duplicated anchor, so the whole copied span
      // is excised from the LATER occurrence (keep-first; the
      // originals 0/1 keep their text). Natural duplicated 8-grams in
      // the corpus collapse identically in both engines. Plant ids
      // stay COLUMNS (the n150 lit() lesson).
      val base = t(s, dir, "documents").select("doc_id", "text")
      val planted = base.filter(col("doc_id") === 0L)
        .select((col("doc_id") + 4000001L).as("doc_id"),
          concat(lit("zyxprefix "), col("text")).as("text"))
        .unionAll(base.filter(col("doc_id") === 1L)
          .select((col("doc_id") + 4000002L).as("doc_id"),
            concat(col("text"), lit(" zyxsuffix trailing words appended"))
              .as("text")))
      TextAnalysis.exactSubstrDedup(base.unionAll(planted), n = 8)
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          col("n_tokens_kept"), md5(col("text_clean")).as("text_md5"))
        .orderBy("doc_id")
    }),

    "n164_incremental_exactsubstr" -> ((s, dir) => {
      // n155's fixture run INCREMENTALLY (VERDICT r11 #8): the corpus
      // publishes its gram index once, the planted slice dedups
      // against it WITHOUT re-anchoring the corpus — merged per-gram
      // stats (counts add, first takes the min) make the excision
      // equal batch exactSubstrDedup over the union restricted to the
      // slice, which is exactly what the oracle replays
      val base = t(s, dir, "documents").select("doc_id", "text")
      val planted = base.filter(col("doc_id") === 0L)
        .select((col("doc_id") + 4000001L).as("doc_id"),
          concat(lit("zyxprefix "), col("text")).as("text"))
        .unionAll(base.filter(col("doc_id") === 1L)
          .select((col("doc_id") + 4000002L).as("doc_id"),
            concat(col("text"), lit(" zyxsuffix trailing words appended"))
              .as("text")))
      val index = TextAnalysis.exactSubstrGramIndex(base, n = 8)
      TextAnalysis.incrementalExactSubstrDedup(index, planted, n = 8)
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          col("n_tokens_kept"), md5(col("text_clean")).as("text_md5"))
        .orderBy("doc_id")
    }),

    "n50_line_dedup" -> ((s, dir) => {
      // C4-style boilerplate line removal over a planted multi-line
      // fixture (corpus texts are single-line): every doc gets a shared
      // header (removed: 100% of docs), a GROUP5 line shared by 5 docs
      // (removed: == minDocs), a GROUP4 line shared by 4 docs (kept:
      // below threshold — exercises the boundary exactly), and an
      // even/odd footer (removed: half the corpus each)
      val ld = t(s, dir, "documents").select(col("doc_id"), concat_ws("\n",
        lit("SHARED BOILERPLATE HEADER"), col("text"),
        concat(lit("GROUP4 "), expr("CAST(doc_id DIV 4 AS STRING)")),
        concat(lit("GROUP5 "), expr("CAST(doc_id DIV 5 AS STRING)")),
        when(col("doc_id") % 2 === 0, lit("EVEN FOOTER"))
          .otherwise(lit("ODD FOOTER"))).as("text"))
      TextAnalysis.lineDedup(ld, minDocs = 5)
        .select(col("doc_id"), col("n_lines_kept"),
          length(col("text_clean")).cast("long").as("n_chars_clean"),
          md5(col("text_clean")).as("text_md5"))
        .orderBy("doc_id")
    }),

    "n51_bigram_nll" -> ((s, dir) => {
      // corpus-statistics quality score; ln replay + position-ordered
      // fold are the established cross-engine conventions (cf. n03)
      TextAnalysis.bigramCrossEntropy(t(s, dir, "documents"))
        .orderBy("doc_id")
    }),

    "n172_lm_state_score" -> ((s, dir) => {
      // the ingestion-time perplexity gate against a PUBLISHED LM
      // state driven through its lifecycle: the reference corpus
      // (doc_id % 5 != 2) builds as two merged shards, a takedown
      // (doc_id % 97) subtracts its contribution (the purge reaches
      // the quality MODEL), then a DISJOINT incoming slice
      // (doc_id % 5 == 2) scores against the maintained counts —
      // never against its own statistics. The oracle recounts the
      // surviving reference from scratch, so the maintained state
      // cannot drift
      val docs = t(s, dir, "documents")
      val ref = docs.filter(col("doc_id") % 5 =!= 2)
      val state = TextAnalysis.retractBigramLmState(
        TextAnalysis.mergeBigramLmStates(
          TextAnalysis.bigramLmState(ref.filter(col("doc_id") % 3 =!= 0)),
          TextAnalysis.bigramLmState(ref.filter(col("doc_id") % 3 === 0))),
        ref.filter(col("doc_id") % 97 === 0))
      TextAnalysis.bigramNllAgainstState(
        docs.filter(col("doc_id") % 5 === 2), state).orderBy("doc_id")
    }),

    "n57_nll_gate" -> ((s, dir) => {
      // the composed quality gate a curation pipeline actually runs:
      // score every doc by corpus surprise (n51), then drop the worst
      // decile. The threshold is the exact 90th percentile (q21's
      // percentile <-> quantile_cont replay convention) over the
      // already-rounded scores
      // persisted: the scores relation feeds both the threshold agg and
      // the gate scan — (doc_id, 2 numbers) rows, ~3 orders smaller
      // than the text it was derived from, the standard two-pass shape
      val scored = TextAnalysis.bigramCrossEntropy(t(s, dir, "documents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val thr = scored.agg(percentile(col("avg_nll"), lit(0.9)).as("__thr"))
      scored.crossJoin(thr)
        .filter(col("avg_nll") <= col("__thr"))
        .select("doc_id", "avg_nll")
        .orderBy("doc_id")
    }),

    "n56_mixture_sample" -> ((s, dir) => {
      // rebalance to a skewed 5-source target over the uniform fixture:
      // rates land at 1.0 / 0.75 / 0.5 / 0.125 / 0.125 and the other
      // 15 sources drop — non-vacuous in every direction (rows dropped
      // per source, whole sources dropped, one source kept whole)
      graft.ops.Sampling.mixtureSample(t(s, dir, "documents"),
          Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2,
              "src3" -> 0.05, "src4" -> 0.05))
        .select("doc_id", "source").orderBy("doc_id")
    }),

    "n54_semantic_contamination" -> ((s, dir) => {
      // the planted scaled copies play the eval set: their originals
      // are the only corpus vectors at cosine >= 0.8 (organic max
      // ~0.51), so the scan must flag exactly those three — the
      // embedding-space twin of n22's n-gram check
      val pe = plantedEmbeddings(s, dir)
      Similarity.semanticContamination(
          corpus = pe.filter(col("vec_id") < 1000000L),
          eval = pe.filter(col("vec_id") >= 1000000L), threshold = 0.8)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("eval_id", "vec_id")
    }),

    "n55_vocab_coverage" -> ((s, dir) => {
      // ks sized to the fixture's 31-word vocabulary (5/10/20); the
      // 20-row curve still exercises rank ties and the cumulative sum
      TextAnalysis.vocabCoverage(t(s, dir, "documents"), ks = Seq(5, 10, 20))
        .orderBy("vocab_k")
    }),

    "n53_rag_chunks" -> ((s, dir) => {
      // window 16 / stride 12 (overlap 4) so fixture docs (~50 words)
      // tile into several chunks, exercising the final-short-window
      // and the single-chunk-short-doc paths
      TextAnalysis.slidingChunks(t(s, dir, "documents"),
          windowWords = 16, strideWords = 12)
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          col("chunk"), col("n_words"))
        .orderBy("doc_id", "chunk_idx")
    }),

    "n52_semantic_dedup" -> ((s, dir) => {
      // SemDeDup over the planted construction (cf. n14): the scaled
      // copies are cosine-identical to their originals, so they land in
      // the same cluster (assignment is cosine-argmax) and are the only
      // pairs above 0.8 — non-vacuous, and cross-cluster blindness is
      // exactly the semantics being tested
      Dedup.semanticDedup(plantedEmbeddings(s, dir), k = 8, threshold = 0.8)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("cluster", "vec_id_a", "vec_id_b")
    }),

    "n48_media_av_meta" -> ((s, dir) => {
      // audio/video container metadata parsed from REAL headers: WAV
      // fmt-chunk sample rate + data-chunk duration, MP4 mvhd duration
      // + stsz frame count — the type filter again runs before the
      // decode boundary so images never reach the parser
      val media = Multimodal.mediaWithHeaders(t(s, dir, "documents"))
        .filter(col("media_type") =!= "image")
      Multimodal.extractFeatures(media).toDF()
        .select(col("media_id"), col("media_type"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("duration_ms"),
          col("n_frames").cast("long").as("n_frames"))
        .orderBy("media_id")
    }),

    "n94_image_dhash" -> ((s, dir) => {
      // perceptual image near-dup: REAL 24bpp BMP pixel decode
      // (bottom-up rows, 4-byte stride padding, BGR order, integer
      // ITU-R 601 luma) -> 9x8 dHash -> the same recall-lossless
      // Hamming banding as n11 (factored into Dedup.hammingNearDups).
      // The fixture plants one BMP per doc with group-structured
      // pixels (doc_id/4 groups, members <= 2 bits from the base), so
      // the oracle verifies the byte-level decode by replaying the
      // pixel formula arithmetically from doc_id alone. The LSH-style
      // maxBucket cap never triggers at these SFs (random 21-bit band
      // keys over 5k docs), so the replay omits it.
      val media = Multimodal.bmpPixelMedia(t(s, dir, "documents"))
      val hashes = Multimodal.dhashRelation(media)
        .select(col("media_id").as("doc_id"), col("dhash").as("sh"))
      Dedup.hammingNearDups(hashes, maxDistance = 2)
        .orderBy("doc_id_a", "doc_id_b")
    }),

    "n163_incremental_hamming" -> ((s, dir) => {
      // the incremental ladder's IMAGE member (n150's stance for
      // dHashes — VERDICT r11 #5): the corpus half's dHashes are
      // published as a persisted Hamming band index, the slice half
      // dedups against it WITHOUT re-banding the corpus, and because
      // pigeonhole banding is recall-lossless the survivors must
      // EQUAL the batch replay over the union restricted to the slice
      // — the oracle replays n94's full pixel->dHash->banding formula
      // and drops every slice doc a qualifying pair victimizes (the
      // ids are ingest-ordered, so the victim is always the pair's
      // higher side)
      val media = Multimodal.bmpPixelMedia(t(s, dir, "documents"))
      val hashes = Multimodal.dhashRelation(media)
        .select(col("media_id").as("doc_id"), col("dhash").as("sh"))
      val old = hashes.filter(col("doc_id") < 250)
      val incoming = hashes.filter(col("doc_id") >= 250)
      val index = Dedup.hammingBandIndex(old, maxDistance = 2)
      Dedup.incrementalHammingDedup(index, old, incoming, maxDistance = 2)
        .select(col("doc_id")).orderBy("doc_id")
    }),

    "n110_frame_offsets" -> ((s, dir) => {
      // real frame-extraction bookkeeping: per-frame byte ranges read
      // from genuine stsz (per-sample size table) + stco (chunk
      // offset) boxes — the fields a frame sampler actually seeks by.
      // Every offset replays arithmetically: payload starts at
      // 212 + 4n and frame i begins after the cumulative sizes
      Multimodal.frameOffsetTable(Multimodal.mp4FrameMedia(t(s, dir, "documents")))
        .orderBy("media_id", "frame_idx")
    }),

    "n122_psi_drift" -> ((s, dir) => {
      // PSI between the same two slices as n121, localized per bin —
      // KS's max-deviation twin weighted over the whole distribution
      graft.ops.Profile.psiDrift(t(s, dir, "documents"),
        groupCol = "source", valueCol = "n_chars", ga = "src0", gb = "src1")
    }),

    "n121_ks_drift" -> ((s, dir) => {
      // two-sample KS between the src0 and src1 doc-length
      // distributions, cross-multiplied to exact integers; the
      // cumulative window runs over distinct lengths only
      graft.ops.Profile.ksDrift(t(s, dir, "documents"),
        groupCol = "source", valueCol = "n_chars", ga = "src0", gb = "src1")
    }),

    "n131_threshold_curve" -> ((s, dir) => {
      // the dedup-threshold decision table: pair/doc yield at each
      // candidate Jaccard bar over the planted corpus (the exact
      // copies keep the t=100 row non-zero), every comparison a
      // cross-multiplied integer
      Dedup.thresholdCurve(plantedDocs(s, dir), n = 3,
          thresholds = (1 to 10).map(_ * 10))
        .orderBy("threshold_x100")
    }),

    "n129_entity_resolution" -> ((s, dir) => {
      // multi-evidence entity resolution: URL-exact blocks contribute
      // STAR edges (hub = min doc_id per canonical URL — linear in
      // block size, never the within-block clique), fuzzy-title
      // matches contribute pair edges, and the n28 min-label
      // components resolve transitively ACROSS evidence kinds: the
      // planted exact copies (title dist 0) bridge their own URL block
      // into the originals' block, so one entity spans both. Docs with
      // no evidence stay their own entity
      val d = plantedDocs(s, dir)
      val base = d.select(col("doc_id"),
        expr("doc_id DIV 5").cast("string").as("gs"), (col("doc_id") % 5).as("m"))
      val url = when(col("m") === 0,
          concat(lit("https://example"), col("gs"), lit(".com/p"), col("gs"), lit("?a=1&b=2")))
        .when(col("m") === 1,
          concat(lit("HTTPS://EXAMPLE"), col("gs"), lit(".COM:443/p"), col("gs"), lit("?b=2&a=1")))
        .when(col("m") === 2,
          concat(lit("https://example"), col("gs"), lit(".com/p"), col("gs"), lit("?a=1&utm_source=feed&b=2")))
        .when(col("m") === 3,
          concat(lit("https://example"), col("gs"), lit(".com/p"), col("gs"), lit("?a=1&b=2#section")))
        .otherwise(
          concat(lit("https://example"), col("gs"), lit(".com:8080/p"), col("gs"), lit("?a=1&b=2")))
      val canon = base.select(col("doc_id"),
        TextAnalysis.canonicalizeUrl(url).as("cu"))
      val hub = canon.groupBy("cu").agg(min("doc_id").as("hub"))
      val urlEdges = canon.join(hub, "cu").filter(col("doc_id") =!= col("hub"))
        .select(col("hub").as("doc_id_a"), col("doc_id").as("doc_id_b"))
      val titleEdges = Dedup.fuzzyTitlePairs(d, keyLen = 32)
        .select("doc_id_a", "doc_id_b")
      // pointer-jumping CC (identical fixpoint — the n141 law):
      // the r10 stage profile put the CC rounds at ~60% of this
      // query's cost, and the shortcut cuts the round count below the
      // star+bridge graph's propagation depth (PLANS.md "n129 stage
      // profile": 6.3 -> 5.7 s measured, hashes unchanged)
      val comps = Dedup.dupClustersFast(urlEdges.unionAll(titleEdges))
      d.select("doc_id").join(comps, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("entity_id"))
        .orderBy("doc_id")
    }),

    "n128_mad_outliers" -> ((s, dir) => {
      // robust outliers by the median/MAD rule over per-type event
      // values (x1024 longs, the n116 scaling): the fixture has no
      // 3.5-robust-z tail, so one literal outlier is PLANTED on each
      // side of 'click' — both flags fire, proving the cross-
      // multiplied test on both tails; the DEFINITIONAL oracle
      // restates median and MAD as rank-window order statistics
      import s.implicits._
      val sv = t(s, dir, "events").select(col("event_type"),
          floor(col("value") * 1024).cast("long").as("v"))
        .unionAll(Seq(("click", 9000000L), ("click", -9000000L))
          .toDF("event_type", "v"))
      graft.ops.Sketch.madOutliers(sv, "event_type", "v").orderBy("event_type")
    }),

    "n127_dp_counts" -> ((s, dir) => {
      // Laplace-mechanism noisy per-source counts (sensitivity 1,
      // scale b = 2 i.e. epsilon = 0.5) with the seeded-hash noise
      // stream, so the whole release replays: fnv64+fmix64 uniform,
      // inverse-CDF Laplace, 1e-6 rounding absorbing ln() ulps
      org.apache.spark.sql.graft.GraftExtensions.register(s)
      graft.ops.Profile.dpNoisyCounts(t(s, dir, "documents"),
          "source", b = 2.0, seed = 42L)
        .orderBy("source")
    }),

    "n134_dq_report" -> ((s, dir) => {
      // declarative data-quality gate (the Deequ/expectations shape):
      // row rules in ONE documents scan, key uniqueness without a
      // self-join, and referential integrity as an anti-join — with a
      // planted orphan lineitem, the planted duplicate doc_ids, AND a
      // planted NULL-text row so every violation column — including
      // the NULL-key uniqueness convention (NULL is never a distinct
      // value, so a NULL key is a violation, the SQL COUNT(DISTINCT)
      // semantics dqUnique pins) — is value-bearing, not all-zero
      import s.implicits._
      val docs = plantedDocs(s, dir)
        .select(col("doc_id").cast("long"), col("text"),
          col("n_chars").cast("long"))
        .unionAll(s.range(1).select(lit(-1L).as("doc_id"),
          lit(null).cast("string").as("text"), lit(0L).as("n_chars")))
      val li = t(s, dir, "lineitem").select(col("l_orderkey").cast("long"))
        .unionAll(Seq(-999L).toDF("l_orderkey"))
      val rows = graft.ops.Profile.dqColumnRules(docs, Seq(
          "text_complete" -> (col("text").isNull || col("text") === ""),
          "n_chars_consistent" -> (col("n_chars") =!= length(col("text")))))
        .unionAll(graft.ops.Profile.dqUnique(docs, Seq("doc_id"), "doc_id_unique"))
        .unionAll(graft.ops.Profile.dqUnique(docs, Seq("text"), "text_unique"))
        .unionAll(graft.ops.Profile.dqReferential(li, "l_orderkey",
          t(s, dir, "orders").select(col("o_orderkey").cast("long").as("l_orderkey")),
          "l_orderkey", "orderkey_referential"))
      rows.orderBy("rule")
    }),

    "n133_jump_hash" -> ((s, dir) => {
      // jump consistent hashing (Lamping–Veach, integer-division
      // variant) vs n119's rendezvous: the same only-moves-to-the-new-
      // shard resharding contract with O(1) memory and an O(ln n) loop
      // instead of an O(n) scoring pass — the (shard-at-8, shard-at-9)
      // contingency table IS the proof (off-diagonal mass only in
      // column 8), replayed by the oracle as a recursive-CTE jump walk
      import org.apache.spark.sql.graft.GraftFunctions.jump_hash
      t(s, dir, "documents").select(
          jump_hash(col("doc_id"), 8).as("shard8"),
          jump_hash(col("doc_id"), 9).as("shard9"))
        .groupBy("shard8", "shard9").agg(count(lit(1)).as("n"))
        .orderBy("shard8", "shard9")
    }),

    "n132_cluster_profile" -> ((s, dir) => {
      // cluster cartography: size, representative (nearest-to-centroid
      // medoid proxy, the SemDeDup keep policy), and integer mean
      // squared distance per k-means cluster — the oracle extends the
      // n126 unrolled replay with an argmin + agg final stage
      graft.ops.Clustering.clusterProfile(t(s, dir, "embeddings"),
          k = 4, rounds = 2)
        .orderBy("cluster")
    }),

    "n126_kmeans" -> ((s, dir) => {
      // distributed fixed-round Lloyd k-means over int8 codes, every
      // step integer-exact: init from the k smallest vec_ids, squared-
      // L2 argmin assignment, truncating-division centroid update —
      // the oracle replays both full rounds plus the final assignment
      // as unrolled CTEs (float k-means could never hash-match)
      graft.ops.Clustering.kMeans(t(s, dir, "embeddings"), k = 4, rounds = 2)
        .orderBy("vec_id")
    }),

    "n124_lpa_communities" -> ((s, dir) => {
      // community detection on the word co-occurrence graph (n97's
      // graph): 3 rounds of deterministic synchronous label
      // propagation — argmax of neighbor+self label counts with the
      // smallest-label tie-break, so every round replays as an
      // unrolled CTE (float modularity methods never could). The
      // fixture's 31-word blob is one dense community (it collapses to
      // a single label — itself a real finding); two PLANTED
      // disconnected word triangles prove multi-community output is
      // value-bearing, each converging to its own min label
      import s.implicits._
      val ws = t(s, dir, "documents").select(col("text"))
        .unionAll(Seq("zza0 zza1 zza2 zza0", "zzb0 zzb1 zzb2 zzb0")
          .toDF("text"))
        .select(filter(split(col("text"), " "), w => w =!= lit("")).as("ws"))
        .filter(size(col("ws")) >= 2)
      val pairs = ws.select(explode(expr(
          "transform(sequence(1, size(ws) - 1), " +
            "i -> struct(element_at(ws, i) AS a, element_at(ws, i + 1) AS b))")).as("p"))
        .select(col("p.a").as("src"), col("p.b").as("dst"))
        .filter(col("src") =!= col("dst"))
      graft.ops.Graph.labelPropagation(pairs, rounds = 3)
        .select(col("node").as("word"), col("label"))
        .orderBy("word")
    }),

    "n125_kneser_ney" -> ((s, dir) => {
      // interpolated Kneser–Ney bigram model with D = 3/4 exact: the
      // n-gram-LM smoothing standard, every term in x1e9 integer
      // fixed point so discount, backoff weight, and continuation
      // probability all replay
      TextAnalysis.kneserNey(t(s, dir, "documents"))
        .orderBy("w1", "w2")
    }),

    "n120_good_turing" -> ((s, dir) => {
      // Good-Turing r* = (r+1) N_{r+1} / N_r in x1e6 fixed point over
      // the corpus word-BIGRAM frequencies (the granularity whose
      // r = 1..4 tail is populated — every unigram of the 31-word
      // synthetic vocabulary is frequent, which made a unigram first
      // cut return the empty set) — the unseen-mass smoothing of every
      // n-gram LM, with the lead window on the tiny count-of-counts
      // relation
      TextAnalysis.goodTuring(t(s, dir, "documents"), maxR = 10)
        .orderBy("r")
    }),

    "n119_rendezvous" -> ((s, dir) => {
      // HRW sharding + the resharding audit: the (shard-at-8,
      // shard-at-9) contingency table — HRW's contract makes every
      // off-diagonal cell land in column 8 (keys move ONLY to the new
      // shard), with ~1/9 of keys moving
      val d = t(s, dir, "documents").select(col("doc_id"),
        graft.ops.Sampling.rendezvousShard(col("doc_id"), 8).as("shard8"),
        graft.ops.Sampling.rendezvousShard(col("doc_id"), 9).as("shard9"))
      d.groupBy("shard8", "shard9").agg(count(lit(1)).as("n"))
        .orderBy("shard8", "shard9")
    }),

    "n118_poisson_bootstrap" -> ((s, dir) => {
      // distributed bootstrap: per-(row, replicate) Poisson(1) weights
      // from the fmix64 uniform, 16 weighted means in one combinable
      // agg — the uncertainty-quantification shape that needs no
      // resampling pass
      graft.ops.Sampling.poissonBootstrap(t(s, dir, "lineitem"),
          key = (col("l_orderkey") * 8 + col("l_linenumber")).cast("long"),
          value = col("l_extendedprice"), replicates = 16)
        .orderBy("replicate")
    }),

    "n117_matryoshka" -> ((s, dir) => {
      // MRL truncation audit: top-10 by integer code dot over the full
      // 64 dims vs the first 16 — overlap and top-1 agreement per
      // query, all-integer rankings with vec_id tie-break
      Similarity.prefixDimAudit(t(s, dir, "embeddings"),
          prefixDim = 16, k = 10, nQueries = 5)
        .orderBy("query_id")
    }),

    "n116_outlier_fences" -> ((s, dir) => {
      // Tukey IQR anomaly audit per event_type: exact fixed-point
      // quartiles from the lock-step bisection (no sort), integer
      // fences, one broadcast join + counting agg. DEFINITIONAL
      // oracle: the rank window states what a quartile IS
      graft.ops.Sketch.outlierFences(t(s, dir, "events"),
          groupCol = "event_type", valueCol = "value")
        .orderBy("event_type")
    }),

    "n115_ewma" -> ((s, dir) => {
      // per-user EWMA (alpha = 1/4) in 2^10 fixed point via the
      // secondary-sort fold — O(1) state per key, no collect_list;
      // the recurrence is sequential, so the oracle replays it as a
      // per-user recursive CTE over row_number
      graft.ops.TimeSeries.ewmaScaled(t(s, dir, "events"),
          key = "user_id", ts = "ts", tie = "event_id", value = col("value"))
        .orderBy("user_id", "ts", "event_id")
    }),

    "n113_readability" -> ((s, dir) => {
      // integer Flesch fixed point: both ratio terms floor-divided so
      // the classic readability gate replays exactly cross-engine
      TextAnalysis.readability(t(s, dir, "documents")).orderBy("doc_id")
    }),

    "n114_mojibake" -> ((s, dir) => {
      // encoding-damage gate with planted damage (the fixture is clean
      // ASCII, so without salting every count is 0 and the oracle
      // proves nothing): docs at doc_id % 7 == 0 get a suffix carrying
      // the three signatures — U+FFFD, a C1 control (U+0085), and
      // three UTF-8-as-latin1 'Ã' pairs
      val salted = t(s, dir, "documents").withColumn("text",
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(mojibakeSuffix))).otherwise(col("text")))
      TextAnalysis.encodingDamage(salted)
        .withColumn("is_suspect", col("is_suspect").cast("long"))
        .orderBy("doc_id")
    }),

    "n112_audio_resample" -> ((s, dir) => {
      // integer PCM resample 8 kHz -> 12 kHz over the real WAV
      // payloads: decode -> linear-interp resample (floor division,
      // convention-pinned) -> loudness stats of the RESAMPLED signal,
      // so the oracle certifies the whole chain arithmetically; the
      // 3:2 ratio mixes exact sample hits (every 3rd output) with
      // interpolated values, covering both branches
      Multimodal.resampledAudioStats(
          Multimodal.pcmWavMedia(t(s, dir, "documents")), targetRate = 12000)
        .orderBy("media_id")
    }),

    "n109_audio_stats" -> ((s, dir) => {
      // real 16-bit PCM SAMPLE decode (the r5 verdict's "audio decode
      // stubbed" gap, sample level): peak / mean-square / zero
      // crossings over real WAV payloads whose samples replay
      // arithmetically from doc_id — the loudness and silence gates of
      // an audio-corpus pipeline, all integer
      Multimodal.audioStats(Multimodal.pcmWavMedia(t(s, dir, "documents")))
        .orderBy("media_id")
    }),

    "n108_png_dhash" -> ((s, dir) => {
      // REAL PNG pixel decode: zlib inflate (JDK Inflater) + all five
      // scanline filters unfiltered per RFC 2083 (the fixture rotates
      // Sub/Up/Average/Paeth through the rows), feeding the SAME
      // dHash/banding pipeline and the SAME oracle as n94 — one
      // arithmetic replay certifying two independent container
      // decoders
      val media = Multimodal.pngPixelMedia(t(s, dir, "documents"))
      val hashes = Multimodal.dhashRelation(media)
        .select(col("media_id").as("doc_id"), col("dhash").as("sh"))
      Dedup.hammingNearDups(hashes, maxDistance = 2)
        .orderBy("doc_id_a", "doc_id_b")
    }),

    "q60_sql_udf" -> ((s, dir) => {
      // Spark 4 SQL UDFs: a scalar function and a TABLE-VALUED
      // function (declarative chunking) applied via LATERAL — the
      // reusable-logic surface that needs no JVM code; the oracle
      // inlines both bodies
      t(s, dir, "documents").createOrReplaceTempView("documents")
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION len_bucket(s STRING)
              |RETURNS BIGINT RETURN length(s) DIV 100""".stripMargin)
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION char_chunks(s STRING, k INT)
              |RETURNS TABLE(i INT, piece STRING)
              |RETURN SELECT i, substr(s, (i - 1) * k + 1, k)
              |FROM (SELECT explode(sequence(1,
              |  CAST(ceil(length(s) / k) AS INT))) AS i)""".stripMargin)
      s.sql("""SELECT d.doc_id, len_bucket(d.text) AS bucket,
              | CAST(c.i AS BIGINT) AS chunk_idx,
              | CAST(length(c.piece) AS BIGINT) AS piece_len
              |FROM documents d, LATERAL char_chunks(d.text, 500) c
              |ORDER BY doc_id, chunk_idx""".stripMargin)
    }),

    "q59_time_range_frame" -> ((s, dir) => {
      // event-TIME range frame (trailing 1 hour per user) — the
      // interval twin of q29's numeric RANGE frame; peers share
      // frames, so ties in ts are deterministic by construction
      t(s, dir, "events").createOrReplaceTempView("events")
      s.sql("""SELECT user_id, ts, event_id,
              | CAST(count(*) OVER w AS BIGINT) AS n_events_1h,
              | round(sum(value) OVER w, 6) AS sum_value_1h
              |FROM events
              |WINDOW w AS (PARTITION BY user_id ORDER BY ts
              |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
              |ORDER BY user_id, ts, event_id""".stripMargin)
    }),

    "q58_regression" -> ((s, dir) => {
      // OLS aggregate surface: slope/intercept/r2/corr of extended
      // price against quantity per return flag — a genuinely
      // correlated pair, so the fit is value-bearing. Order-dependent
      // double reductions rounded per the repo convention
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql("""SELECT l_returnflag,
              | CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
              | round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
              | round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
              | round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
              | round(corr(l_extendedprice, l_quantity), 6) AS corr_qty
              |FROM lineitem GROUP BY l_returnflag
              |ORDER BY l_returnflag""".stripMargin)
    }),

    "q56_collation" -> ((s, dir) => {
      // Spark 4 collation surface: UTF8_LCASE grouping collapses
      // planted case variants (even doc_ids upper-cased). The emitted
      // group key is min(lower(..)) — the collated group's
      // REPRESENTATIVE value is engine-chosen, so a deterministic
      // projection is part of using collations correctly
      t(s, dir, "documents").createOrReplaceTempView("documents")
      s.sql("""WITH mixed AS (SELECT doc_id,
              |  CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END AS src,
              |  n_chars FROM documents)
              |SELECT min(lower(src)) AS source_key,
              |       CAST(count(*) AS BIGINT) AS n_docs,
              |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
              |FROM mixed GROUP BY src COLLATE UTF8_LCASE
              |ORDER BY source_key""".stripMargin)
    }),

    "q57_variant" -> ((s, dir) => {
      // Spark 4 VARIANT surface: build nested JSON from typed columns,
      // parse_json into VARIANT, extract typed fields back by path
      // (object, array index, and a missing path via try_variant_get).
      // The oracle is definitional: round-tripping through VARIANT
      // must recover exactly the constructed values
      t(s, dir, "events").createOrReplaceTempView("events")
      s.sql("""WITH j AS (SELECT event_id,
              |  parse_json(concat('{"meta":{"type":"', event_type,
              |    '","uid":', CAST(user_id AS STRING),
              |    '},"tags":[', CAST(event_id % 5 AS STRING), ',',
              |    CAST(event_id % 7 AS STRING), ']}')) AS v
              | FROM events)
              |SELECT event_id,
              | variant_get(v, '$.meta.type', 'string') AS vtype,
              | variant_get(v, '$.meta.uid', 'long') AS uid,
              | variant_get(v, '$.tags[1]', 'long') AS tag1,
              | try_variant_get(v, '$.meta.missing', 'long') AS missing
              |FROM j ORDER BY event_id""".stripMargin)
    }),

    "q55_scd2" -> ((s, dir) => {
      // SCD type-2 dimension build: per-user event_type runs become
      // version rows with half-open [valid_from, valid_to) intervals
      // (lag-compare islands + lead close-off). Every window
      // partitions by user_id — one key shuffle, no global order
      graft.operators.Scd.scd2(t(s, dir, "events"),
          key = "user_id", ts = "ts", attr = "event_type", tieBreaker = "event_id")
        .orderBy("user_id", "version")
    }),

    "q54_recursive_cte" -> ((s, dir) => {
      // Spark 4's WITH RECURSIVE surface: a recursive calendar
      // dimension (the classic date-spine build) LEFT-joined to
      // orders so silent zero days appear explicitly — the join
      // direction a plain GROUP BY over orders cannot express.
      // DuckDB replays the SAME recursion; 90 levels sits under
      // Spark's default cteRecursionLevelLimit of 100
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""WITH RECURSIVE cal(d) AS (
              |  SELECT DATE '1998-01-01'
              |  UNION ALL
              |  SELECT date_add(d, 1) FROM cal WHERE d < DATE '1998-03-31'
              |)
              |SELECT CAST(cal.d AS TIMESTAMP) AS day,
              |       CAST(count(o_orderkey) AS BIGINT) AS n_orders,
              |       round(coalesce(sum(o_totalprice), 0), 2) AS revenue
              |FROM cal LEFT JOIN orders ON CAST(o_orderdate AS DATE) = cal.d
              |GROUP BY cal.d ORDER BY day""".stripMargin)
    }),

    "q53_skyline" -> ((s, dir) => {
      // 2-D Pareto frontier (cheapest AND biggest part): the operator
      // reduces dominance to a per-price-level max + a running max
      // over the LEVEL relation — no quadratic pair join (the spec
      // asserts the plan is nested-loop-free); the oracle is the
      // DEFINITION (NOT EXISTS a dominating row), so green proves the
      // level-reduction algorithm, not a replay of it
      graft.operators.Skyline.skyline2d(t(s, dir, "part"), "p_retailprice", "p_size")
        .select("p_partkey", "p_size", "p_retailprice")
        .orderBy("p_partkey")
    }),

    "n111_gif_dhash" -> ((s, dir) => {
      // REAL GIF pixel decode: full LZW decompression (variable code
      // width, CLEAR/EOI, KwKwK, dictionary growth) + palette lookup,
      // feeding the SAME dHash/banding pipeline and the SAME oracle as
      // n94/n108 — one arithmetic replay now certifying THREE
      // independent container decoders (BMP stride walk, PNG
      // inflate+unfilter, GIF LZW) against each other
      val media = graft.ops.Gif.gifPixelMedia(t(s, dir, "documents"))
      val hashes = Multimodal.dhashRelation(media)
        .select(col("media_id").as("doc_id"), col("dhash").as("sh"))
      Dedup.hammingNearDups(hashes, maxDistance = 2)
        .orderBy("doc_id_a", "doc_id_b")
    }),

    "n107_kcore" -> ((s, dir) => {
      // k-core of the word graph at k=29 with the planted hub/spoke
      // cascade (spoke peels round 1, hub — at exactly the bar —
      // peels round 2): survivors + their in-core degrees after 4
      // rounds, replayed by unrolled peel CTEs
      import s.implicits._
      val planted = Seq(
        (9700001L, kcoreHubText, "en", "planted", 0L),
        (9700002L, "spoke hub", "en", "planted", 0L)
      ).toDF("doc_id", "text", "lang", "source", "n_chars")
      val ws = t(s, dir, "documents").unionByName(planted).select(
          filter(split(col("text"), " "), w => w =!= lit("")).as("ws"))
        .filter(size(col("ws")) >= 2)
      val pairs = ws.select(explode(expr(
          "transform(sequence(1, size(ws) - 1), " +
            "i -> struct(element_at(ws, i) AS a, element_at(ws, i + 1) AS b))")).as("p"))
        .select(col("p.a").as("src"), col("p.b").as("dst"))
        .filter(col("src") =!= col("dst"))
      graft.ops.Graph.kCore(pairs, k = 29, rounds = 4)
        .select(col("node").as("word"), col("degree"))
        .orderBy(col("degree").desc, col("word"))
    }),

    "n135_kcore_converged" -> ((s, dir) => {
      // run-to-FIXPOINT k-core (checkpoint per round via
      // Iterate.toFixpoint, no lineage bound): the n107 fixture again,
      // so this green row proves the converged variant returns the
      // true core through the driver gate (the oracle unrolls peel
      // rounds well past convergence — peeling is idempotent at the
      // fixpoint, so extra rounds are no-ops); the spec separately
      // proves convergence beyond kCore's rounds<=6 bound
      import s.implicits._
      val planted = Seq(
        (9700001L, kcoreHubText, "en", "planted", 0L),
        (9700002L, "spoke hub", "en", "planted", 0L)
      ).toDF("doc_id", "text", "lang", "source", "n_chars")
      val ws = t(s, dir, "documents").unionByName(planted).select(
          filter(split(col("text"), " "), w => w =!= lit("")).as("ws"))
        .filter(size(col("ws")) >= 2)
      val pairs = ws.select(explode(expr(
          "transform(sequence(1, size(ws) - 1), " +
            "i -> struct(element_at(ws, i) AS a, element_at(ws, i + 1) AS b))")).as("p"))
        .select(col("p.a").as("src"), col("p.b").as("dst"))
        .filter(col("src") =!= col("dst"))
      graft.ops.Graph.kCoreConverged(pairs, k = 29)
        .select(col("node").as("word"), col("degree"))
        .orderBy(col("degree").desc, col("word"))
    }),

    "n136_pagerank_dangling" -> ((s, dir) => {
      // DIRECTED successor-word graph, deliberately UNsymmetrized:
      // sink words (never followed — the planted zzdangletail
      // guarantees at least one) hold rank that must redistribute
      // uniformly, exercising the dangling-mass term end to end in
      // integer fixed point; the oracle replays the rounds with the
      // same dsum div n redistribution
      import s.implicits._
      val planted = Seq((9990001L, "zzdanglehead zzdangletail", "en",
        "planted", 0L)).toDF("doc_id", "text", "lang", "source", "n_chars")
      val ws = t(s, dir, "documents").unionByName(planted).select(
          filter(split(col("text"), " "), w => w =!= lit("")).as("ws"))
        .filter(size(col("ws")) >= 2)
      val pairs = ws.select(explode(expr(
          "transform(sequence(1, size(ws) - 1), " +
            "i -> struct(element_at(ws, i) AS a, element_at(ws, i + 1) AS b))")).as("p"))
        .select(col("p.a").as("src"), col("p.b").as("dst"))
        .filter(col("src") =!= col("dst"))
      val edges = pairs.groupBy("src", "dst").agg(count(lit(1)).as("wt"))
      graft.ops.Graph.integerPageRank(edges, iters = 3)
        .select(col("node").as("word"), col("rank"))
        .orderBy(col("rank").desc, col("word")).limit(25)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("rank").desc, col("word"))).cast("long"))
    }),

    "n141_cc_pointer_jump" -> ((s, dir) => {
      // connected components via POINTER-JUMPING min-label (the
      // Shiloach-Vishkin shortcut): the simhash near-dup graph WELDED
      // to a planted diameter-249 chain over doc_ids 0..249 — the
      // high-diameter shape (chained edits, re-crawls of re-crawls)
      // where plain min-label propagation needs O(diameter) rounds and
      // the shortcut needs O(log diameter). The oracle replays the
      // COMPONENT STRUCTURE, not the rounds — a recursive-CTE
      // transitive closure is algorithm-independent, and the shortcut
      // provably shares dupClusters' fixpoint
      val docs = t(s, dir, "documents")
      val chain = docs.filter(col("doc_id") < 249)
        .select(col("doc_id").as("doc_id_a"),
          (col("doc_id") + 1).as("doc_id_b"))
      val pairs = Dedup.simhashNearDups(docs, maxDistance = 6)
        .select("doc_id_a", "doc_id_b").unionAll(chain)
      Dedup.dupClustersFast(pairs).orderBy("doc_id")
    }),

    "n165_incremental_clusters" -> ((s, dir) => {
      // incremental CC maintenance (the clustering family's APPEND
      // member): n141's edge set — simhash near-dups welded to the
      // diameter-249 chain — split at doc_id 125 into a published "old
      // crawl" (both endpoints < 125, clustered from scratch) and a
      // slice (every remaining pair, incl. the 124-125 chain link that
      // bridges old and new). The maintained assignment relabels the
      // old clusters through a slice-sized contracted CC and must
      // equal the batch fixpoint over the UNION — the oracle is n141's
      // algorithm-independent recursive-CTE closure verbatim (the
      // split cannot show in a correct answer)
      val docs = t(s, dir, "documents")
      val chain = docs.filter(col("doc_id") < 249)
        .select(col("doc_id").as("doc_id_a"),
          (col("doc_id") + 1).as("doc_id_b"))
      val pairs = graft.ops.Iterate.lazyCheckpointed(
        Dedup.simhashNearDups(docs, maxDistance = 6)
          .select("doc_id_a", "doc_id_b").unionAll(chain))
      val old = pairs.filter(col("doc_id_a") < 125 && col("doc_id_b") < 125)
      val slice = pairs.filter(!(col("doc_id_a") < 125 && col("doc_id_b") < 125))
      val published = Dedup.dupClustersFast(old)
      Dedup.incrementalDupClusters(published, slice).orderBy("doc_id")
    }),

    "n166_cluster_retraction" -> ((s, dir) => {
      // component-local takedown for the clustering family: purge
      // every doc_id % 83 == 0 holder from the published n141
      // assignment. Removed chain bridges (83, 166) SPLIT the
      // diameter-249 chain into segments — the split only the retained
      // EDGE relation can decide — while clusters holding no removed
      // doc pass through verbatim; the oracle re-closes over exactly
      // the edges whose both endpoints survive
      val docs = t(s, dir, "documents")
      val chain = docs.filter(col("doc_id") < 249)
        .select(col("doc_id").as("doc_id_a"),
          (col("doc_id") + 1).as("doc_id_b"))
      val pairs = graft.ops.Iterate.lazyCheckpointed(
        Dedup.simhashNearDups(docs, maxDistance = 6)
          .select("doc_id_a", "doc_id_b").unionAll(chain))
      val published = Dedup.dupClustersFast(pairs)
      val removed = docs.filter(col("doc_id") % 83 === 0).select("doc_id")
      Dedup.retractFromClusters(published, pairs, removed).orderBy("doc_id")
    }),

    "n167_benchmark_decontamination" -> ((s, dir) => {
      // n22's decontamination pass restructured as PUBLISH-then-PROBE:
      // the eval suite's gram index published once, the train slice
      // probed against it behind the bloom sidecar (map-side prune; no
      // false negatives, so pruned == unpruned == the recompute-both-
      // sides n22 semantics — the oracle is n22's replay verbatim)
      val docs = t(s, dir, "documents")
      val evalSet = graft.ops.Sampling.deterministicSample(docs, "doc_id", 0.1)
      val train = docs.filter(!graft.ops.Sampling.hashFilter(col("doc_id"), 0.1))
      // checkpoint = the PUBLISHED index artifact (in production the
      // probe reads parquet, it never re-derives the suite's grams)
      val index = graft.ops.Iterate.lazyCheckpointed(
        TextAnalysis.benchmarkGramIndex(evalSet, 5))
      val bloom = TextAnalysis.benchmarkGramBloom(index)
      TextAnalysis.contaminationAgainstIndex(train, index, 5, Some(bloom))
        .orderBy("doc_id")
    }),

    "n168_decontaminate" -> ((s, dir) => {
      // the decontamination FILTER at maxContamination = 0 (any shared
      // 5-gram drops the doc; gram-less docs survive): the surviving
      // train rows against the published index + bloom sidecar
      val docs = t(s, dir, "documents")
      val evalSet = graft.ops.Sampling.deterministicSample(docs, "doc_id", 0.1)
      val train = docs.filter(!graft.ops.Sampling.hashFilter(col("doc_id"), 0.1))
      val index = graft.ops.Iterate.lazyCheckpointed(
        TextAnalysis.benchmarkGramIndex(evalSet, 5))
      val bloom = TextAnalysis.benchmarkGramBloom(index)
      TextAnalysis.decontaminateAgainstIndex(train, index, 5, Some(bloom))
        .select("doc_id", "source").orderBy("doc_id")
    }),

    "n169_card_state" -> ((s, dir) => {
      // mergeable data-card state driven through its whole lifecycle:
      // two shard states (doc_id % 3 split) merged, then a takedown
      // (doc_id % 89) retracted — pure keyed addition, so the
      // maintained state must equal the from-scratch state of the
      // SURVIVORS, which is exactly what the oracle computes
      val docs = t(s, dir, "documents")
      val state = graft.ops.Profile.retractCardState(
        graft.ops.Profile.mergeCardStates(
          graft.ops.Profile.cardState(docs.filter(col("doc_id") % 3 =!= 0)),
          graft.ops.Profile.cardState(docs.filter(col("doc_id") % 3 === 0))),
        docs.filter(col("doc_id") % 89 === 0))
      state.orderBy("kind", "key")
    }),

    "n170_card_render" -> ((s, dir) => {
      // the release card rendered from the maintained state: corpus
      // totals and language mix exact, p50 token count as the bracket
      // of the bin holding rank ceil(0.5 n) under the FIXED edges
      // (lo 0, hi 4096, 256 bins -> width 17)
      val docs = t(s, dir, "documents")
      val state = graft.ops.Profile.retractCardState(
        graft.ops.Profile.mergeCardStates(
          graft.ops.Profile.cardState(docs.filter(col("doc_id") % 3 =!= 0)),
          graft.ops.Profile.cardState(docs.filter(col("doc_id") % 3 === 0))),
        docs.filter(col("doc_id") % 89 === 0))
      graft.ops.Profile.cardFromState(state, Seq(0.5))
        .orderBy("section", "key")
    }),

    "n142_trustrank" -> ((s, dir) => {
      // seed-biased PageRank (TrustRank / topic-sensitive PageRank)
      // over the n136 DIRECTED successor-word graph incl. its planted
      // sink: teleport + dangling mass land only on the 5
      // lexicographically-smallest words (a deterministic, corpus-
      // derived seed set both engines construct identically), so
      // authority decays with distance from the seeds; the oracle
      // replays every round's seed-conditional teleport and dsum div
      // ns redistribution in the same integer fixed point
      import s.implicits._
      val planted = Seq((9990001L, "zzdanglehead zzdangletail", "en",
        "planted", 0L)).toDF("doc_id", "text", "lang", "source", "n_chars")
      val ws = t(s, dir, "documents").unionByName(planted).select(
          filter(split(col("text"), " "), w => w =!= lit("")).as("ws"))
        .filter(size(col("ws")) >= 2)
      val pairs = ws.select(explode(expr(
          "transform(sequence(1, size(ws) - 1), " +
            "i -> struct(element_at(ws, i) AS a, element_at(ws, i + 1) AS b))")).as("p"))
        .select(col("p.a").as("src"), col("p.b").as("dst"))
        .filter(col("src") =!= col("dst"))
      val edges = pairs.groupBy("src", "dst").agg(count(lit(1)).as("wt"))
      val seeds = edges.select(col("src").as("node"))
        .unionAll(edges.select(col("dst").as("node"))).distinct()
        .orderBy("node").limit(5)
      graft.ops.Graph.trustRank(edges, seeds, iters = 3)
        .select(col("node").as("word"), col("rank"))
        .orderBy(col("rank").desc, col("word")).limit(25)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("rank").desc, col("word"))).cast("long"))
    }),

    "n143_hits" -> ((s, dir) => {
      // HITS hubs-and-authorities (Kleinberg 1999) over the directed
      // successor-word graph incl. the planted sink: the link-analysis
      // complement to PageRank — a word scores as a HUB by preceding
      // authoritative words and as an AUTHORITY by following strong
      // hubs. Two I/O rounds in L1-normalized integer fixed point; the
      // oracle replays each half-round's raw sums and HUGEINT-scaled
      // normalization bit-exactly
      import s.implicits._
      val planted = Seq((9990001L, "zzdanglehead zzdangletail", "en",
        "planted", 0L)).toDF("doc_id", "text", "lang", "source", "n_chars")
      val ws = t(s, dir, "documents").unionByName(planted).select(
          filter(split(col("text"), " "), w => w =!= lit("")).as("ws"))
        .filter(size(col("ws")) >= 2)
      val pairs = ws.select(explode(expr(
          "transform(sequence(1, size(ws) - 1), " +
            "i -> struct(element_at(ws, i) AS a, element_at(ws, i + 1) AS b))")).as("p"))
        .select(col("p.a").as("src"), col("p.b").as("dst"))
        .filter(col("src") =!= col("dst"))
      val edges = pairs.groupBy("src", "dst").agg(count(lit(1)).as("wt"))
      graft.ops.Graph.hits(edges, iters = 2)
        .select(col("node").as("word"), col("hub"), col("auth"))
        .orderBy(col("auth").desc, col("word")).limit(25)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("auth").desc, col("word"))).cast("long"))
    }),

    "n144_gopher_rules" -> ((s, dir) => {
      // the published Gopher quality gate (Rae et al. 2021 App. A1),
      // every rule exercised by deterministic decorations both engines
      // build identically: '#' runs (hash ratio — gated SEPARATELY
      // from the ellipsis ratio, per the paper's "either"), '42' runs
      // (alpha fraction + mean word length), mod-3 stopword padding
      // (the required-words rule), mod-17 bullet-wall docs (>90%
      // bullet lines), mod-5 ellipsis-line trailers (which also feed
      // the ellipsis-ratio count); all thresholds compare in
      // cross-multiplied integer form, so the flags hash-replay
      val g = t(s, dir, "documents").select(col("doc_id"), concat(
          when(col("doc_id") % 17 === 0, lit("tiny start")).otherwise(col("text")),
          expr("repeat(' #', CAST(doc_id % 9 AS INT))"),
          expr("repeat(' 42', CAST(doc_id % 23 AS INT))"),
          when(col("doc_id") % 3 === 0, lit(" and the of")).otherwise(lit(" the")),
          when(col("doc_id") % 17 === 0,
            repeat(lit("\n- b"), 10)).otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            lit("\nit goes on...\nmore soon...\nfin")).otherwise(lit("")))
        .as("text"))
      TextAnalysis.gopherRules(g)
        .select(col("doc_id"), col("n_words"), col("n_word_chars"),
          col("n_hash"), col("n_ellipsis"), col("n_lines"), col("n_bullet_lines"),
          col("n_ellipsis_lines"), col("n_alpha_words"), col("n_stopword_kinds"),
          col("ok_word_count").cast("long").as("ok_word_count"),
          col("ok_mean_word_len").cast("long").as("ok_mean_word_len"),
          col("ok_hash_ratio").cast("long").as("ok_hash_ratio"),
          col("ok_ellipsis_ratio").cast("long").as("ok_ellipsis_ratio"),
          col("ok_bullet_lines").cast("long").as("ok_bullet_lines"),
          col("ok_ellipsis_lines").cast("long").as("ok_ellipsis_lines"),
          col("ok_alpha_words").cast("long").as("ok_alpha_words"),
          col("ok_stopwords").cast("long").as("ok_stopwords"),
          col("gopher_pass").cast("long").as("gopher_pass"))
        .orderBy("doc_id")
    }),

    "n145_c4_clean" -> ((s, dir) => {
      // the C4 cleaning pass (Raffel et al. 2020 §2.2) over planted
      // multi-line pages: a universal opener sentence, the corpus text
      // terminal-punctuated only on even doc_ids (line rule: terminal
      // punct + >= 5 words), a too-short sentence, a mod-7 javascript
      // line (line-dropped, page kept), mod-11 lorem ipsum and mod-13
      // curly-brace pages (page-dropped), and an ORGANIC blocklist hit
      // ('vector' appears in corpus text); sentence count = terminal
      // punctuation marks, >= 3 to keep the page
      val deco = t(s, dir, "documents").select(col("doc_id"), concat(
          lit("A fine opening statement stands here today."),
          lit("\n"), col("text"),
          when(col("doc_id") % 2 === 0, lit(".")).otherwise(lit("")),
          lit("\nshort line."),
          when(col("doc_id") % 7 === 0,
            lit("\nthis page needs javascript to render.")).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            lit("\nlorem ipsum dolor sit amet today.")).otherwise(lit("")),
          when(col("doc_id") % 13 === 0, lit(" {")).otherwise(lit("")))
        .as("text"))
      TextAnalysis.c4Clean(deco, blocklist = Seq("vector", "laser"))
        .select(col("doc_id"), col("kept").cast("long").as("kept"),
          col("n_sentences"), col("n_lines_kept"),
          length(col("text_clean")).cast("long").as("n_chars_clean"),
          md5(col("text_clean")).as("text_md5"))
        .orderBy("doc_id")
    }),

    "n146_weighted_quantiles" -> ((s, dir) => {
      // token-MASS quantiles of document length — the curation budget
      // question ("what length cutoff keeps 90% of the TOKEN mass",
      // where the per-DOC p90 answers the wrong thing): exact weighted
      // range bisection, never a global sort. The oracle states the
      // DEFINITION (smallest v with cumulative weight >= ceil(q*totalW)
      // via one window over value-grouped sums), so green proves the
      // weighted bisection finds the true weighted order statistic
      val d = t(s, dir, "documents").select(col("n_chars"),
        size(filter(split(col("text"), " "), w => w =!= lit("")))
          .cast("long").as("n_tokens"))
      graft.ops.Sketch.weightedQuantiles(d, "n_chars", "n_tokens",
          qs = Seq(0.25, 0.5, 0.9, 0.99), bins = 16)
        .select("q", "total_w", "r", "exact_value").orderBy("q")
    }),

    "n149_weighted_quantiles_by_source" -> ((s, dir) => {
      // per-SOURCE token-mass length quantiles — "what length cutoff
      // keeps 90% of THIS source's token mass": the n91 lock-step
      // bisection summing weights instead of counting rows; the oracle
      // is the per-group definitional window over value-grouped weight
      // sums
      val d = t(s, dir, "documents").select(col("source"), col("n_chars"),
        size(filter(split(col("text"), " "), w => w =!= lit("")))
          .cast("long").as("n_tokens"))
      graft.ops.Sketch.weightedQuantilesByGroup(d, "source", "n_chars",
          "n_tokens", qs = Seq(0.5, 0.9), bins = 16)
        .orderBy("source", "q")
    }),

    "n147_rbo" -> ((s, dir) => {
      // rank-biased overlap between exact-cosine truth and the pure
      // int8 code ranking (n123's retriever pair): recall@k scores the
      // top-k as a SET, RBO weights agreement by depth (geometric
      // decay p = 0.9) — the "is the cheap retriever serving the same
      // experience" audit. Weights are driver-computed literals (no
      // libm pow on either engine) and the per-query sum folds
      // d-ascending on both
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 5)
      val truth = Similarity.bruteForceTopK(emb, qs, 10)
        .select(col("query_id"), col("vec_id"), col("rank").cast("long").as("rank"))
      val cand = Similarity.int8TopK(emb, qs, 10)
      Similarity.rankBiasedOverlap(truth, cand, k = 10, p = 0.9)
        .orderBy("query_id")
    }),

    "n148_weak_label" -> ((s, dir) => {
      // Snorkel-style keyword-rule weak labeling (Ratner et al. 2017)
      // over the corpus vocabulary: three topic rule sets vote per
      // document, argmax label with the alphabetic tie-break, zero
      // fires -> abstain; the oracle replays the votes via
      // list_contains and the tie-break as a CASE chain in label order
      val rules = Seq(
        ("table", "sql"), ("query", "sql"), ("join", "sql"), ("row", "sql"),
        ("stream", "stream"), ("window", "stream"), ("batch", "stream"),
        ("vector", "vec"), ("group", "vec"), ("hash", "vec"))
      TextAnalysis.keywordVoteLabel(t(s, dir, "documents"), rules)
        .orderBy("doc_id")
    }),

    "n106_containment" -> ((s, dir) => {
      // near-SUPERSET detection: containment |A∩B|/|A| over word
      // trigrams — the asymmetric case Jaccard misses (wrapper pages,
      // quoted fragments). Both planted paths derive from the corpus
      // itself (a words-6..25 fragment of doc 0, doc 1 wrapped in
      // boilerplate) so the engines build identical fixtures
      val base = t(s, dir, "documents")
      val toks = filter(split(col("text"), " "), w => w =!= lit(""))
      val frag = base.filter(col("doc_id") === 0).select(
        lit(9600001L).as("doc_id"),
        array_join(slice(toks, 6, 20), " ").as("text"),
        col("lang"), col("source"), col("n_chars"))
      val wrap = base.filter(col("doc_id") === 1).select(
        lit(9600002L).as("doc_id"),
        concat(lit("wrapper header boilerplate "), col("text"),
          lit(" trailing footer block")).as("text"),
        col("lang"), col("source"), col("n_chars"))
      Dedup.containmentPairs(base.unionByName(frag).unionByName(wrap),
          n = 3, threshold = 0.9)
        .withColumn("containment", round(col("containment"), 6))
        .orderBy("doc_id_contained", "doc_id_container")
    }),

    "n105_multi_phrase" -> ((s, dir) => {
      // the contamination-sweep form of n103: MANY quote strings in
      // ONE corpus pass (broadcast parts dim, offset-aligned count ==
      // phrase length). Two natural phrases + one planted four-word
      // quote occurring twice in one doc
      import s.implicits._
      val planted = Seq((9500002L,
        "alpha beta gamma delta filler words alpha beta gamma delta",
        "en", "planted", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      TextAnalysis.multiPhraseSearch(
          t(s, dir, "documents").unionByName(planted),
          Seq(
            "bench1" -> Seq("slow", "hash", "batch"),
            "bench2" -> Seq("stream", "table", "hash"),
            "planted" -> Seq("alpha", "beta", "gamma", "delta")))
        .orderBy("phrase_id", "doc_id", "pos")
    }),

    "n173_phrase_index" -> ((s, dir) => {
      // n105's quote sweep as an INDEX PROBE over maintained
      // positional postings driven through the lifecycle: old/slice
      // shards union (per-doc rows), the takedown (doc_id % 103)
      // retracts through the shared doc-keyed anti-join, and the sweep
      // probes the published state — the oracle replays the
      // consecutive-word definition over the surviving text, so the
      // index cannot drift from what a re-tokenization would find
      import s.implicits._
      val planted = Seq((9500002L,
        "alpha beta gamma delta filler words alpha beta gamma delta",
        "en", "planted", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val all = t(s, dir, "documents").unionByName(planted)
      val removed = all.filter(col("doc_id") % 103 === 0).select("doc_id")
      val postings = Dedup.retractFromIndex(
        TextAnalysis.positionalPostings(all.filter(col("doc_id") % 2 === 0))
          .unionByName(TextAnalysis.positionalPostings(
            all.filter(col("doc_id") % 2 =!= 0))), removed)
        .select("word", "doc_id", "pos")
      TextAnalysis.multiPhraseSearchAgainstIndex(postings,
          Seq(
            "bench1" -> Seq("slow", "hash", "batch"),
            "bench2" -> Seq("stream", "table", "hash"),
            "planted" -> Seq("alpha", "beta", "gamma", "delta")))
        .orderBy("phrase_id", "doc_id", "pos")
    }),

    "n174_benchmark_lifecycle" -> ((s, dir) => {
      // the benchmark gram index driven through its LIFECYCLE (r13):
      // two eval suites publish as per-doc postings (suite A = the
      // n167 hash sample, suite B = every 7th remaining doc), suite B
      // retires through the doc-keyed anti-join, the bloom sidecar
      // rebuilds from the survivors, and the train slice probes the
      // retracted index — which must equal the from-scratch
      // single-suite recompute (the oracle: n167's replay with eval =
      // suite A only)
      val docs = t(s, dir, "documents")
      val inA = graft.ops.Sampling.hashFilter(col("doc_id"), 0.1)
      val suiteA = docs.filter(inA)
      val suiteB = docs.filter(!inA && col("doc_id") % 7 === 0)
      val train = docs.filter(!inA && col("doc_id") % 7 =!= 0)
      // lazy checkpoints: same published-artifact lineage cuts, but the
      // materialization rides the bloom build's count action instead of
      // two standalone fill jobs (r13 — the postings artifact feeds
      // only the retraction, the retraction only the bloom + probe)
      val postings = graft.ops.Iterate.lazyCheckpointed(
        TextAnalysis.appendToBenchmarkIndex(
          TextAnalysis.benchmarkGramPostings(suiteA, 5), suiteB, 5))
      val retracted = graft.ops.Iterate.lazyCheckpointed(
        TextAnalysis.retractFromBenchmarkIndex(postings,
          suiteB.select("doc_id")))
      val bloom = TextAnalysis.benchmarkGramBloom(retracted)
      TextAnalysis.contaminationAgainstIndex(train, retracted, 5, Some(bloom))
        .orderBy("doc_id")
    }),

    "n104_heavy_hitters_by_source" -> ((s, dir) => {
      // n95 stratified: per-source heavy hitters (count > n_source/24)
      // via one Misra-Gries summary per (group, partition) and a
      // per-group exact recount — same definitional oracle shape,
      // applied within each source
      val words = t(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
      graft.ops.Sketch.exactHeavyHittersByGroup(words, "source", "word", k = 24)
        .orderBy(col("source"), col("cnt").desc, col("word"))
    }),

    "n103_phrase_search" -> ((s, dir) => {
      // exact-quote detection via positional postings: the corpus
      // contains the phrase naturally AND one planted doc carries two
      // occurrences (so multi-hit-per-doc is value-bearing). Oracle is
      // DEFINITIONAL — consecutive-word equality on the token list —
      // so green proves the filtered k-way alignment join finds
      // exactly the phrase starts
      import s.implicits._
      val planted = Seq((9500001L,
        "prefix slow hash batch suffix slow hash batch", "en", "planted", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      TextAnalysis.phraseSearch(
          t(s, dir, "documents").unionByName(planted),
          Seq("slow", "hash", "batch"))
        .orderBy("doc_id", "pos")
    }),

    "n102_vocab_drift" -> ((s, dir) => {
      // distribution-level drift between corpus versions (even docs =
      // old slice, odd = new), all classes planted value-bearing:
      // vanishterm (old only), novelterm (new only), upword (1 -> 9),
      // downword (14 -> 1). Classification is exact integer
      // cross-multiplication — no float ratio
      import s.implicits._
      val base = t(s, dir, "documents")
      val oldPlanted = Seq((9400000L,
        "vanishterm " * 5 + "downword " * 14 + "upword", "en", "planted", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val newPlanted = Seq((9400001L,
        "novelterm " * 5 + "upword " * 9 + "downword", "en", "planted", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      TextAnalysis.vocabularyDrift(
          base.filter(col("doc_id") % 2 === 0).unionByName(oldPlanted),
          base.filter(col("doc_id") % 2 === 1).unionByName(newPlanted))
        .orderBy("word")
    }),

    "n101_exif_orientation" -> ((s, dir) => {
      // real EXIF decode: APP1/TIFF IFD walk in BOTH byte orders (II
      // for even ids, MM for odd), orientation = 1 + doc_id % 8, dims
      // from the SOF0 BEHIND the APP1 (the dims walk must skip it,
      // the EXIF walk must enter it); orientations 5..8 transpose the
      // display dims — every field replayed arithmetically from doc_id
      Multimodal.exifFeatures(Multimodal.exifJpegMedia(t(s, dir, "documents")))
        .select(col("media_id"), col("orientation"),
          col("display_w"), col("display_h"))
        .orderBy("media_id")
    }),

    "n100_cdc_chunks" -> ((s, dir) => {
      // content-defined chunking census: boundaries where the 8-char
      // window fingerprint ≡ 0 (mod 32), so cut points are content-
      // determined and re-synchronize after a prefix shift — the two
      // planted docs share a 140-char interior region behind DIFFERENT
      // prefixes, and their interior chunks still align (the property
      // fixed-size blocks lack). Output: chunks seen in >= 2 docs
      import s.implicits._
      val shared = "the content defined chunking boundary stream re " +
        "synchronizes after any prefix shift because cut points depend " +
        "only on the local window bytes"
      val planted = Seq(
        (9300001L, s"intro A $shared tail one", "en", "planted", 0L),
        (9300002L, s"a completely different and much longer preamble here $shared other ending",
          "en", "planted", 0L)
      ).toDF("doc_id", "text", "lang", "source", "n_chars")
      TextAnalysis.cdcChunks(t(s, dir, "documents").unionByName(planted))
        .groupBy("digest")
        .agg(count_distinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_total"),
          min("doc_id").as("min_doc"),
          max(length(col("chunk"))).cast("long").as("chunk_len"))
        .filter(col("n_docs") >= 2)
        .orderBy("digest")
    }),

    "n99_top_component" -> ((s, dir) => {
      // "all-but-the-top" phase 1: dominant principal direction of the
      // int8 code cloud by INTEGER power iteration (BigInt/HUGEINT —
      // float PCA could never hash-match), per-vector projection as
      // the output. Covariance accumulates per-partition in one
      // mapPartitions pass (dim^2 longs each, no n x dim^2 explode);
      // the d x d iteration is metadata-sized driver arithmetic
      Similarity.principalProjection(t(s, dir, "embeddings"), dim = 64, iters = 3)
        .orderBy("vec_id")
    }),

    "q46_try_arithmetic" -> ((s, dir) => {
      // ANSI-safe error-handling surface: Spark 4 runs ANSI mode, so
      // plain /0 and bad casts THROW — try_divide / try_cast are the
      // NULL-on-error forms a pipeline needs. DuckDB's lenient
      // division + TRY_CAST replay the same semantics
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT o_orderkey,
              | round(try_divide(o_totalprice, o_custkey % 7), 6) AS ratio,
              | try_cast(CASE WHEN o_orderkey % 3 = 0
              |   THEN CAST(o_orderkey AS STRING)
              |   ELSE o_orderpriority END AS BIGINT) AS parsed
              |FROM orders ORDER BY o_orderkey LIMIT 200""".stripMargin)
    }),

    "q47_listagg" -> ((s, dir) => {
      // ordered string aggregation surface (SQL:2023 LISTAGG ...
      // WITHIN GROUP, Spark 4) — deterministic only because the
      // within-group order is pinned; DuckDB's ORDER BY-qualified
      // string_agg is the same contract
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT o_orderstatus,
              | listagg(CAST(o_orderkey AS STRING), ',')
              |   WITHIN GROUP (ORDER BY o_orderkey) AS keys
              |FROM orders WHERE o_orderkey < 120
              |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    }),

    "n98_ip_prefix_join" -> ((s, dir) => {
      // longest-prefix-match IP enrichment: per-doc synthetic IPv4
      // (fmix64 of doc_id), a three-level prefix table derived from
      // the %5 / %13 / %97 docs' own addresses (so every level is
      // value-bearing and /24 beats /16 beats /8 on the planted
      // collisions), matched by the zero-shuffle broadcast-left-join
      // chain in PrefixJoin. Oracle is definitional: max prefix_len
      // over the per-level masked joins
      import org.apache.spark.sql.graft.GraftFunctions.fmix64
      val ips = t(s, dir, "documents").select(col("doc_id"),
        fmix64(col("doc_id")).bitwiseAND(lit(0xffffffffL)).as("ip"))
      def level(modK: Int, len: Int, mask: Long): DataFrame =
        ips.filter(col("doc_id") % modK === 0)
          .select(col("ip").as("prefix_ip"), lit(len).as("prefix_len"),
            concat(lit(s"p$len-"),
              col("ip").bitwiseAND(lit(mask)).cast("string")).as("label"))
      val dims = level(5, 8, 4278190080L)
        .unionByName(level(13, 16, 4294901760L))
        .unionByName(level(97, 24, 4294967040L))
      graft.operators.PrefixJoin
        .longestPrefixMatch(ips, "doc_id", "ip", dims)
        .orderBy("doc_id")
    }),

    "n97_word_triangles" -> ((s, dir) => {
      // triangle census of the word co-occurrence graph (n76's graph):
      // degree-oriented wedge closure — the O(m^1.5) choreography —
      // under a DEFINITIONAL oracle (an ordered three-way edge join
      // states what a triangle IS), so green proves the orientation
      // trick finds every triangle exactly once, not that the
      // choreography replays
      val ws = t(s, dir, "documents").select(
          filter(split(col("text"), " "), w => w =!= lit("")).as("ws"))
        .filter(size(col("ws")) >= 2)
      val pairs = ws.select(explode(expr(
          "transform(sequence(1, size(ws) - 1), " +
            "i -> struct(element_at(ws, i) AS a, element_at(ws, i + 1) AS b))")).as("p"))
        .select(col("p.a").as("src"), col("p.b").as("dst"))
        .filter(col("src") =!= col("dst"))
      graft.ops.Graph.triangleCounts(pairs)
        .select(col("node").as("word"), col("n_triangles"))
        .orderBy(col("n_triangles").desc, col("word"))
    }),

    "n96_url_canonical" -> ((s, dir) => {
      // URL-level dedup: five URL variants per group derived from
      // doc_id (case, default port, tracking params, param order,
      // fragment — all must collapse; a NON-default port stays
      // distinct), collapsed by the real codegen canonicalizer. The
      // oracle replays the normalization in DuckDB's string machinery,
      // so green is cross-engine agreement on the canonical form
      val d = t(s, dir, "documents")
        .select(col("doc_id"), expr("doc_id DIV 5").as("g"), (col("doc_id") % 5).as("m"))
      val gs = col("g").cast("string")
      val url = when(col("m") === 0,
          concat(lit("https://example"), gs, lit(".com/p"), gs, lit("?a=1&b=2")))
        .when(col("m") === 1,
          concat(lit("HTTPS://EXAMPLE"), gs, lit(".COM:443/p"), gs, lit("?b=2&a=1")))
        .when(col("m") === 2,
          concat(lit("https://example"), gs, lit(".com/p"), gs, lit("?a=1&utm_source=feed&b=2")))
        .when(col("m") === 3,
          concat(lit("https://example"), gs, lit(".com/p"), gs, lit("?a=1&b=2#section")))
        .otherwise(
          concat(lit("https://example"), gs, lit(".com:8080/p"), gs, lit("?a=1&b=2")))
      d.select(col("doc_id"), TextAnalysis.canonicalizeUrl(url).as("canonical_url"))
        .groupBy("canonical_url")
        .agg(count(lit(1)).as("n_urls"), min("doc_id").as("min_doc"))
        .orderBy("canonical_url")
    }),

    "n95_heavy_hitters" -> ((s, dir) => {
      // EXACT heavy hitters (count > n/32) in two scans: per-partition
      // Misra-Gries candidates (a proven superset, partitions x k
      // rows) then an exact recount behind a broadcast semi-join. The
      // oracle is DEFINITIONAL — HAVING cnt * 32 > n — so green proves
      // the candidate pass loses no true heavy hitter, not that the
      // choreography replays
      import s.implicits._
      val words = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "").as[String]
      graft.ops.Sketch.exactHeavyHitters(words, k = 32)
        .select(col("item").as("word"), col("cnt"))
        .orderBy(col("cnt").desc, col("word"))
    }),

    "n20_embedding_allpairs" -> ((s, dir) => {
      // exact O(n^2) baseline for n14 (cf. n08 for n09): broadcast
      // self-join; at scale this runs on deterministic samples only
      Similarity.allPairsExact(t(s, dir, "embeddings"), threshold = 0.4)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("vec_id_a", "vec_id_b")
    }),

    "n16_knn_ivf" -> ((s, dir) => {
      // full probe (nProbe = nLists) is exhaustive -> shares the
      // brute-force oracle; partial probe is the approximate scale path
      val emb = t(s, dir, "embeddings")
      // one count over the bare scan (parquet-footer job), threaded into
      // the build instead of a second action inside it
      val idx = Ivf.build(emb, nLists = 8, nRows = emb.count())
      Ivf.search(idx, emb.filter(col("vec_id") < 5), 10, nProbe = 8)
        .select(col("query_id"), col("vec_id"),
          round(col("cos"), 6).as("cos"), col("rank").cast("long").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    "n156_ivf_append" -> ((s, dir) => {
      // incremental ANN maintenance (the dedup indexes' lifecycle,
      // brought to the ANN column): the index is FIT on the even half
      // only, the odd half appends against FROZEN centroids — no
      // retrain, no re-read of the old corpus — and the full-probe
      // search over the appended index must still equal brute force
      // over the WHOLE table (the n16 exhaustive-probe convention:
      // frozen assignment partitions the union, so nothing is lost,
      // duplicated, or re-ranked by the append).
      val emb = t(s, dir, "embeddings")
      val old = emb.filter(col("vec_id") % 2 === 0)
      val idx = Ivf.build(old, nLists = 8, nRows = old.count())
      val appended = Ivf.append(idx, emb.filter(col("vec_id") % 2 === 1))
      Ivf.search(appended, emb.filter(col("vec_id") < 5), 10, nProbe = 8)
        .select(col("query_id"), col("vec_id"),
          round(col("cos"), 6).as("cos"), col("rank").cast("long").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    "n160_ivf_retract" -> ((s, dir) => {
      // ANN retraction (the n154 lifecycle, ANN edition — VERDICT r11
      // #1): build on the whole table, retract a planted takedown
      // list, and the full-probe search over the retracted index must
      // equal brute force over the SURVIVORS — a removed vector is
      // never returned, nothing else moves (per-row assignment makes
      // deletion as local as the append), and the oracle's
      // survivor-side WHERE is the whole law
      val emb = t(s, dir, "embeddings")
      val idx = Ivf.build(emb, nLists = 8, nRows = emb.count())
      val removed = emb
        .filter(col("vec_id") >= 5 && col("vec_id") % 7 === 3)
        .select("vec_id")
      val retracted = Ivf.retract(idx, removed)
      Ivf.search(retracted, emb.filter(col("vec_id") < 5), 10, nProbe = 8)
        .select(col("query_id"), col("vec_id"),
          round(col("cos"), 6).as("cos"), col("rank").cast("long").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    "n161_ivfpq_retract" -> ((s, dir) => {
      // the PQ flavor of n160: codes retract through the same
      // broadcast anti-join, coarse centroids and codebooks stay
      // frozen, and exhaustive-intent searchPq (full probe + wide
      // rerank, the n21 convention) over the retracted index equals
      // brute force over the survivors. The rerank fetch-back reads
      // the SURVIVOR corpus — the corpus-side purge contract
      val emb = t(s, dir, "embeddings")
      val n = emb.count()
      val idx = Ivf.build(emb, nLists = 8, nRows = n)
      val pq = Ivf.buildPq(idx, m = 16, codebookSize = 32, nRows = n)
      val removed = emb
        .filter(col("vec_id") >= 5 && col("vec_id") % 7 === 3)
        .select("vec_id")
      val rPq = Ivf.retractPq(pq, removed)
      val corpusAfter = emb.join(removed, Seq("vec_id"), "left_anti")
      Ivf.searchPq(rPq, corpusAfter, emb.filter(col("vec_id") < 5), 10,
          nProbe = 8, rerank = Ivf.rerankFor(n))
        .select(col("query_id"), col("vec_id"),
          round(col("cos"), 6).as("cos"), col("rank").cast("long").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    "n30_top_word_share" -> ((s, dir) => {
      // the shuffle-shaped repetition signal (explode + two partial
      // aggs), vs n27's in-row shape
      TextAnalysis.topWordShare(t(s, dir, "documents"))
        .withColumn("top_word_share", round(col("top_word_share"), 6))
        .orderBy("doc_id")
    }),

    "n31_ngram_jaccard" -> ((s, dir) => {
      // word-trigram Jaccard near-dup — the minhash choreography at
      // word-gram granularity (32 narrow bands: near-total recall at
      // the 0.5 threshold, affordable because word grams are
      // discriminative between unrelated docs); the oracle replays it
      // via the same generator as n10 in word-gram mode
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), n = 3, threshold = 0.5)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("doc_id_a", "doc_id_b")
    }),

    "n72_jaccard_prefix_join" -> ((s, dir) => {
      // EXACT set-similarity join (AllPairs/PPJoin prefix filter) —
      // recall 1.0 by the prefix theorem, so the oracle is the NAIVE
      // all-shared-gram-pairs join: any pair the pruning lost would
      // fail the gate. Compare with n31, the minhash approximation of
      // the same word-trigram Jaccard relation
      Dedup.jaccardPrefixJoin(t(s, dir, "documents"), n = 3, threshold = 0.5)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("doc_id_a", "doc_id_b")
    }),

    "n73_fuzzy_title_pairs" -> ((s, dir) => {
      // symmetric-deletion fuzzy title dedup (recall 1.0 at dist<=1 by
      // the SymSpell pigeonhole); oracle is the naive all-pairs
      // levenshtein join, so the gate proves the neighborhood index
      // loses nothing
      Dedup.fuzzyTitlePairs(t(s, dir, "documents"), keyLen = 32)
        .orderBy("doc_id_a", "doc_id_b")
    }),

    "n75_script_mix" -> ((s, dir) => {
      // Unicode script detection under language-ID: the ASCII corpus
      // plus planted Cyrillic / Han / mixed / digit-only docs, so every
      // CASE branch of the dominant-script rule is value-bearing
      import s.implicits._
      val planted = Seq(
        (9000001L, "привет мир это тестовый документ", "ru", "planted", 32L),
        (9000002L, "这是一个测试文档你好世界", "zh", "planted", 12L),
        (9000003L, "hello мир 世界 123", "xx", "planted", 16L),
        (9000004L, "12345 67890", "xx", "planted", 11L)
      ).toDF("doc_id", "text", "lang", "source", "n_chars")
      TextAnalysis.scriptMix(t(s, dir, "documents").unionByName(planted))
        .orderBy("doc_id")
    }),

    "n76_textrank_keywords" -> ((s, dir) => {
      // TextRank keyword ranking: 3 damped power-iteration rounds over
      // the word co-occurrence graph in 1e-12 fixed point — integer
      // sums are partition-order-independent, so DuckDB replays the
      // iterations bit-exactly with unrolled CTEs
      TextAnalysis.textRankKeywords(t(s, dir, "documents"),
        iters = 3, topK = 20).orderBy("rk")
    }),

    "n77_corpus_merge" -> ((s, dir) => {
      // MERGE-semantics version bump: base = corpus minus the %5 ids,
      // changeset = the %3 ids (odd → delete, even → upsert with
      // revised text/n_chars). Every MERGE path is value-bearing:
      // updates (%3 even in base), inserts (%15 even, absent from
      // base), deletes of present ids, and no-op deletes of absent ids
      val docs = t(s, dir, "documents")
      val base = docs.filter(col("doc_id") % 5 =!= 0)
      val changes = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"),
          when(col("doc_id") % 2 === 1, lit("delete"))
            .otherwise(lit("upsert")).as("op"),
          concat(col("text"), lit(" [v2]")).as("text"),
          col("lang"), col("source"),
          (col("n_chars") + 5L).as("n_chars"))
      Dedup.applyChangeset(base, changes).orderBy("doc_id")
    }),

    "n78_pmi_collocations" -> ((s, dir) => {
      // top-20 adjacent-bigram collocations by integer-scaled PMI:
      // the log is monotone so the all-long ratio ranking replays
      // exactly where a float PMI would be ULP-hostage
      TextAnalysis.pmiCollocations(t(s, dir, "documents"),
        minCount = 5, topK = 20).orderBy("rk")
    }),

    "n79_hll_overlap" -> ((s, dir) => {
      // pairwise shared-vocabulary estimate between sources: union
      // registers are the elementwise max (mergeability — THE property
      // that lets HLL replace exact distinct at 100 TB), intersection
      // by inclusion-exclusion; the exact common count rides along as
      // the droppable audit branch
      val words = t(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
      graft.ops.Sketch.hllOverlapByGroup(words, "source", "word", p = 8)
        .orderBy("source_a", "source_b")
    }),

    "n80_char_entropy" -> ((s, dir) => {
      // per-doc character entropy (compression-ratio quality proxy):
      // zero-shuffle run-length fold over each row's sorted chars; a
      // planted degenerate doc ("aaaa...", entropy 0) and a planted
      // near-uniform doc make both filter tails value-bearing
      import s.implicits._
      val planted = Seq(
        (9000001L, "a" * 64, "en", "planted", 64L),
        (9000002L, ('a' to 'z').mkString * 2, "en", "planted", 52L)
      ).toDF("doc_id", "text", "lang", "source", "n_chars")
      TextAnalysis.charEntropy(t(s, dir, "documents").unionByName(planted))
        .orderBy("doc_id")
    }),

    "n81_bpe_encode" -> ((s, dir) => {
      // train-then-apply: 4 BPE merges trained on the corpus (n63's
      // primitive iterated), then the tokenizer-apply pass — per-doc
      // exact token counts under the learned merges. The oracle
      // replays BOTH phases: 4 unrolled argmax+re-segment steps, then
      // the same greedy fold at encode time
      val docs = t(s, dir, "documents")
      val (merges, _) = TextAnalysis.bpeTrain(docs, numMerges = 4)
      TextAnalysis.bpeEncode(docs, merges.map(m => (m._1, m._2)))
        .orderBy("doc_id")
    }),

    "n82_embedding_diversity" -> ((s, dir) => {
      // avg pairwise cosine per label WITHOUT a pair relation: the
      // ||sum||^2 identity over unit-sphere int8 codes — all-long
      // sums, two pinned float steps
      graft.ops.Similarity.embeddingDiversity(
        t(s, dir, "embeddings").withColumn("label", col("label").cast("long")),
        groupCol = "label").orderBy("label")
    }),

    "n85_distinctive_terms" -> ((s, dir) => {
      // per-source distinctive vocabulary by integer-scaled PMI lift;
      // grouped top-3 under WindowGroupLimit
      TextAnalysis.distinctiveTerms(t(s, dir, "documents"),
        groupCol = "source", minCount = 5, topK = 3)
        .orderBy("source", "rk")
    }),

    "q41_set_ops_all" -> ((s, dir) => {
      // bag-semantics set operations (INTERSECT ALL / EXCEPT ALL) —
      // the multiplicity-preserving complement of q28's distinct set
      // ops; Catalyst plans both as counted joins, no distinct shuffle
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
              |INTERSECT ALL
              |SELECT o_custkey FROM orders WHERE o_totalprice > 100000
              |EXCEPT ALL
              |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
              |ORDER BY o_custkey""".stripMargin)
    }),

    "n87_html_extract" -> ((s, dir) => {
      // WET-style HTML -> text over the corpus plus planted real HTML
      // (title, nested tags, script/style bodies, entities incl. the
      // &amp;lt; double-decode trap, hrefs) so every branch of the
      // extraction is value-bearing; plain text passes through
      import s.implicits._
      val planted = Seq(
        (9000001L,
          "<html><head><title>Spark at Scale</title>" +
            "<style>body { color: red; }</style></head>" +
            "<body><h1>Intro</h1><p>Shuffles &amp; joins are " +
            "<b>expensive</b> &#39;at&#39; scale &amp;lt;sometimes&amp;gt;." +
            "</p><script>var x = \"<p>not text</p>\";</script>" +
            "<a href=\"https://a.example/x\">one</a> " +
            "<a HREF=\"https://b.example/y\">two</a></body></html>",
          "en", "planted", 0L),
        (9000002L, "plain text, no tags &amp; one entity", "en", "planted", 0L)
      ).toDF("doc_id", "text", "lang", "source", "n_chars")
      TextAnalysis.htmlExtract(t(s, dir, "documents").unionByName(planted))
        .orderBy("doc_id")
    }),

    "n92_weighted_sample" -> ((s, dir) => {
      // bottom-k weighted priority sample, PPS-without-replacement by
      // document length: zero-shuffle per-row key folds, top-k via
      // TakeOrderedAndProject; the oracle replays the double-fmix key
      // chain in HUGEINT mod-2^64 arithmetic with a sign-adjusted min
      graft.ops.Sampling.weightedPrioritySample(t(s, dir, "documents"),
        weight = col("n_chars"), k = 25)
    }),

    "n93_stratified_pps" -> ((s, dir) => {
      // per-source bottom-5 PPS by document length: n92's key fold
      // under a WindowGroupLimit rank filter — stratified sampling
      // where heavy docs win their stratum's race proportionally
      graft.ops.Sampling.weightedPrioritySampleByGroup(
          t(s, dir, "documents"), "source",
          weight = col("n_chars"), perGroup = 5)
        .orderBy("source", "rk")
    }),

    "n91_exact_quantiles_by_source" -> ((s, dir) => {
      // per-source exact p50/p99 via lock-step group bisection: one
      // corpus pass per round for ALL (group, q) pairs; definitional
      // oracle (per-group rank window) as n86
      graft.ops.Sketch.exactQuantilesByGroup(t(s, dir, "documents"),
          "source", "n_chars", qs = Seq(0.5, 0.99), bins = 16)
        .orderBy("source", "q")
    }),

    "n90_curation_v2" -> ((s, dir) => {
      // the round-7 composition: crawl HTML -> text extraction ->
      // entropy + length quality gates -> exact dedup on the
      // EXTRACTED text (two planted pages with identical content
      // under different markup collapse to one; a degenerate
      // low-entropy page drops at the gate) — each stage is an
      // already-oracled operator, composed
      import s.implicits._
      val planted = Seq(
        (9200001L, "<html><body><p>the quick brown fox jumps over " +
          "the lazy dog near the river bank</p></body></html>"),
        (9200002L, "<div>the quick <b>brown</b> fox jumps over the " +
          "lazy dog near the river bank</div>"),
        (9200003L, "<p>" + ("a" * 80) + "</p>"))
        .map { case (id, html) => (id, html, "en", "planted", 0L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val ex = TextAnalysis.htmlExtract(
        t(s, dir, "documents").unionByName(planted))
        .select(col("doc_id"), col("text_extracted").as("text"),
          col("n_chars_extracted"))
      val ent = TextAnalysis.charEntropy(ex.select("doc_id", "text"))
        .select(col("doc_id"), col("entropy_nats"))
      val gated = ex.join(ent, "doc_id")
        .filter(col("entropy_nats") >= 2.0 && col("n_chars_extracted") >= 10)
      Dedup.exactDedup(gated)
        .select("doc_id", "n_chars_extracted", "entropy_nats")
        .orderBy("doc_id")
    }),

    "n89_domain_pagerank" -> ((s, dir) => {
      // domain authority over the crawl outlink graph: co-citation
      // edges (two domains linked by the same page) ranked by the
      // SAME integer-fixed-point PageRank kernel as n76 — one graph
      // operator, two graph instances. Raw fixture docs carry no
      // links; the planted pages form a 4-domain co-citation graph
      import s.implicits._
      val planted = Seq(
        (9100001L, "<a href=\"https://a.ex/1\">.</a>" +
          "<a href=\"https://b.ex/2\">.</a><a href=\"https://c.ex/3\">.</a>"),
        (9100002L, "<a href=\"https://a.ex/1\">.</a><a href=\"https://b.ex/4\">.</a>"),
        (9100003L, "<a href=\"https://b.ex/5\">.</a><a href=\"https://c.ex/6\">.</a>"),
        (9100004L, "<a href=\"https://c.ex/7\">.</a><a href=\"https://d.ex/8\">.</a>"),
        (9100005L, "<a href=\"https://a.ex/9\">.</a><a href=\"https://d.ex/10\">.</a>"))
        .map { case (id, html) => (id, html, "en", "planted", 0L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val links = TextAnalysis.extractLinks(
        t(s, dir, "documents").unionByName(planted))
      val dd = links.select("doc_id", "domain").distinct()
      val pairs = dd.as("a").join(dd.as("b"),
          col("a.doc_id") === col("b.doc_id") &&
            col("a.domain") =!= col("b.domain"))
        .select(col("a.domain").as("src"), col("b.domain").as("dst"))
      val edges = pairs.groupBy("src", "dst").agg(count(lit(1)).as("wt"))
      // the a/b self-join emits every co-citation pair in BOTH
      // directions: symmetrized by construction, so the kernel skips
      // the dangling probe entirely
      graft.ops.Graph.integerPageRank(edges, iters = 3, symmetrized = true)
        .select(col("node").as("domain"), col("rank"))
        .orderBy(col("rank").desc, col("domain"))
    }),

    "n88_link_domains" -> ((s, dir) => {
      // per-domain outlink profile over the corpus plus planted HTML
      // (absolute http/https, mixed case, relative and mailto links
      // that must drop) — the relation behind domain caps and
      // spam-domain filters
      import s.implicits._
      val planted = Seq(
        (9000001L, "<a href=\"https://a.example/x\">1</a>" +
          "<a HREF=\"https://A.EXAMPLE/y\">2</a>" +
          "<a href=\"http://b.example:8080/z\">3</a>" +
          "<a href=\"/relative/path\">4</a>" +
          "<a href=\"mailto:x@c.example\">5</a>", "en", "planted", 0L),
        (9000002L, "<a href=\"https://b.example/only\">6</a>", "en", "planted", 0L)
      ).toDF("doc_id", "text", "lang", "source", "n_chars")
      TextAnalysis.extractLinks(t(s, dir, "documents").unionByName(planted))
        .groupBy("domain")
        .agg(count(lit(1)).as("n_links"),
          count_distinct(col("doc_id")).as("n_docs"))
        .orderBy("domain")
    }),

    "q43_nulls_order" -> ((s, dir) => {
      // explicit NULLS placement surface: the engines DISAGREE on the
      // default (Spark: nulls first on ASC; DuckDB: nulls last), so a
      // portable ordered query must pin it — this one does, both ways
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT o_orderkey,
              | CASE WHEN o_orderpriority = '1-URGENT' THEN NULL
              |      ELSE o_totalprice END AS p
              |FROM orders
              |ORDER BY p DESC NULLS LAST, o_orderkey
              |LIMIT 100""".stripMargin)
    }),

    "n86_exact_quantiles" -> ((s, dir) => {
      // EXACT order statistics without a global sort: iterative range
      // bisection (3 combinable aggs at bins=16 on this range). The
      // oracle is the DEFINITION (smallest v with cumulative count
      // >= ceil(q*n)), so green proves the bisection finds the true
      // order statistic rather than replaying itself
      graft.ops.Sketch.exactQuantiles(t(s, dir, "documents"), "n_chars",
          qs = Seq(0.25, 0.5, 0.9, 0.99), bins = 16)
        .select("q", "n", "r", "exact_value").orderBy("q")
    }),

    "q44_join_hints" -> ((s, dir) => {
      // join-strategy hint surface: BROADCAST on the dim side forces
      // BroadcastHashJoin (OpsSpec asserts the plan; a MERGE hint
      // flips it to SortMergeJoin) — hints steer the physical plan
      // and NEVER the result, which is exactly what the oracle checks
      t(s, dir, "nation").createOrReplaceTempView("nation")
      t(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql("""SELECT /*+ BROADCAST(n) */ n.n_name,
              | count(*) AS n_customers
              |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
              |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin)
    }),

    "q45_distribute_by" -> ((s, dir) => {
      // DISTRIBUTE BY / SORT BY surface: partition-layout control
      // (hash-partition by source, sort within partitions) — layout
      // only, content identical, so the oracle is the plain
      // aggregation; the repartition feeds the agg pre-shuffled
      t(s, dir, "documents").createOrReplaceTempView("documents")
      s.sql("""SELECT source, count(*) AS n_docs,
              | sum(n_chars) AS total_chars
              |FROM (SELECT * FROM documents
              |      DISTRIBUTE BY source SORT BY source, doc_id)
              |GROUP BY source ORDER BY source""".stripMargin)
    }),

    "q42_group_by_all" -> ((s, dir) => {
      // GROUP BY ALL surface (group on every non-aggregate select
      // item) — resolves at analysis time to the explicit grouping,
      // so the plan is identical to q38's; longs keep sums exact
      t(s, dir, "documents").createOrReplaceTempView("documents")
      s.sql("""SELECT source, lang, count(*) AS n_docs,
              | sum(n_chars) AS total_chars
              |FROM documents GROUP BY ALL
              |ORDER BY source, lang""".stripMargin)
    }),

    "n84_lsh_recall" -> ((s, dir) => {
      // the audit you run before trusting banded minhash at scale:
      // n31's approximation scored against n72's exact truth set over
      // the same word-trigram Jaccard >= 0.5 relation. Precision is
      // 1.0 by construction (verified LSH); recall is the banding's
      val docs = t(s, dir, "documents")
      Dedup.pairRecall(
        Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5),
        Dedup.jaccardPrefixJoin(docs, n = 3, threshold = 0.5))
    }),

    "n83_random_projection" -> ((s, dir) => {
      // Johnson–Lindenstrauss projection 64 -> 8 dims through the
      // codegen random_project expression: hyperplanes derive on the
      // fly from splitmix64 (the sign_buckets machinery), so the plan
      // carries only k — never k×dim literals
      t(s, dir, "embeddings")
        .select(col("vec_id"),
          posexplode(org.apache.spark.sql.graft.GraftFunctions
            .random_project(col("embedding"), 8)).as(Seq("pos", "val")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          round(col("val"), 6).as("val"))
        .orderBy("vec_id", "pos")
    }),

    "n28_dup_clusters" -> ((s, dir) => {
      // connected components over the simhash near-dup graph: every doc
      // in a pair labeled with the min doc_id of its component via
      // distributed label propagation; DuckDB replays it as a RECURSIVE
      // CTE transitive closure over the same replayed simhash edges
      val pairs = Dedup.simhashNearDups(t(s, dir, "documents"), maxDistance = 6)
      Dedup.dupClusters(pairs).orderBy("doc_id")
    }),

    "n60_temperature_sample" -> ((s, dir) => {
      // alpha=0.5 temperature flattening over the SKEWED lang
      // distribution (en dominates): closed-form water-fill rate
      // sqrt(n_min/n_s) — no cross-source sum, so the rate replays
      // bit-for-bit; the smallest lang is kept whole
      graft.ops.Sampling.temperatureSample(t(s, dir, "documents"), 0.5,
          groupCol = "lang")
        .select("doc_id", "lang").orderBy("doc_id")
    }),

    "n59_budget_select" -> ((s, dir) => {
      // "take the best 15k tokens": greedy prefix by (alpha_ratio DESC,
      // doc_id), exact semantics via the histogram-threshold
      // decomposition — no corpus-wide window runs. alpha_ratio is one
      // per-row division, so ordering is bit-exact cross-engine.
      val alpha = length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("double") /
        greatest(length(col("text")).cast("long"), lit(1L))
      graft.ops.Sampling.budgetSelect(t(s, dir, "documents"), 15000L,
          alpha, TextAnalysis.tokenCount(col("text")))
        .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .orderBy("doc_id")
    }),

    "n63_bpe_pairs" -> ((s, dir) => {
      // first BPE merge iteration: adjacent char-pair counts weighted
      // by word frequency, top-10 merge candidates — all-integer
      TextAnalysis.bpePairCounts(t(s, dir, "documents"), k = 10)
        .orderBy(col("pair_count").desc, col("pair"))
    }),

    "n62_quality_classifier" -> ((s, dir) => {
      // fastText-shaped hashed classifier inference: one scan, zero
      // shuffle; raw integer score exact, mean one division
      TextAnalysis.hashedClassifierScore(t(s, dir, "documents")).orderBy("doc_id")
    }),

    "n58_dedup_keep_best" -> ((s, dir) => {
      // cluster-aware dedup keeping the BEST member of each simhash
      // near-dup component — here the longest (whitespace token count,
      // integer, so the argmax replays exactly); ties break to the
      // lowest doc_id, unclustered docs pass through untouched
      val docs = t(s, dir, "documents")
      val clusters = Dedup.dupClusters(Dedup.simhashNearDups(docs, maxDistance = 6))
      Dedup.dedupKeepBest(docs, clusters, TextAnalysis.tokenCount(col("text")))
        .select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .orderBy("doc_id")
    }),

    "n29_stratified_sample" -> ((s, dir) => {
      // domain-balancing: keep 50% of en, 20% of de, 10% of the rest,
      // decided per-row by the same engine-independent hash rule the
      // oracle replays
      graft.ops.Sampling.stratifiedSample(t(s, dir, "documents"), "doc_id", "lang",
          Map("en" -> 0.5, "de" -> 0.2), defaultFraction = 0.1)
        .select("doc_id", "lang", "source").orderBy("doc_id")
    }),

    "n27_repetition" -> ((s, dir) => {
      // word-repetition quality signals, computed inside the row
      TextAnalysis.repetitionFeatures(t(s, dir, "documents"))
        .withColumn("repetition_ratio", round(col("repetition_ratio"), 6))
        .orderBy("doc_id")
    }),

    "n37_crossmodal_pairs" -> ((s, dir) => {
      // cross-modal dedup audit: textual near-dup pairs (word-trigram
      // minhash LSH) scored by the cosine of the paired docs'
      // embeddings (vec_id aligns with doc_id in the fixture). The
      // pair set is LSH-sized (tiny vs the corpus), so both embedding
      // fetch-backs are broadcast-able semi-joins at any corpus scale —
      // the embeddings never shuffle by pair
      val pairs = Dedup.ngramJaccardPairs(t(s, dir, "documents"), n = 3, threshold = 0.5)
      val emb = t(s, dir, "embeddings")
      pairs
        .join(emb.select(col("vec_id").as("doc_id_a"), col("embedding").as("emb_a")), Seq("doc_id_a"))
        .join(emb.select(col("vec_id").as("doc_id_b"), col("embedding").as("emb_b")), Seq("doc_id_b"))
        .select(col("doc_id_a"), col("doc_id_b"),
          round(col("jaccard"), 6).as("jaccard"),
          round(org.apache.spark.sql.graft.GraftFunctions
            .cosine_similarity(col("emb_a"), col("emb_b")), 6).as("cos"))
        .orderBy("doc_id_a", "doc_id_b")
    }),

    "n36_curation_pipeline" -> ((s, dir) => {
      // end-to-end curation: language gate -> token-count gate ->
      // repetition gate -> exact dedup -> audit columns. Non-vacuous
      // dedup by construction: copies of the three lowest surviving ids
      // are planted AFTER the filters, so the dedup window must remove
      // exactly those three at every SF
      val docs = t(s, dir, "documents")
      val kept = docs
        .withColumn("lang_guess", TextAnalysis.langId(col("text")))
        .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
        .withColumn("repetition_ratio", TextAnalysis.repetitionRatio(col("text")))
        .filter(col("lang_guess") === "en" && col("n_tokens") >= 20
          && col("repetition_ratio") <= 0.4)
      val planted = kept.orderBy("doc_id").limit(3)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      Dedup.exactDedup(kept.unionAll(planted))
        .select(col("doc_id"), col("lang_guess"), col("n_tokens"),
          round(col("repetition_ratio"), 6).as("repetition_ratio"), col("n_chars"))
        .orderBy("doc_id")
    }),

    "n32_word_freq_score" -> ((s, dir) => {
      // train->score unigram pass: global word counts joined back to
      // grade each doc by mean corpus frequency; all-integer aggregates
      TextAnalysis.corpusFrequencyScore(t(s, dir, "documents"))
        .withColumn("mean_word_freq", round(col("mean_word_freq"), 6))
        .orderBy("doc_id")
    }),

    "n33_tfidf_terms" -> ((s, dir) => {
      // top-3 TF-IDF terms per doc (linear idf keeps scores exact
      // integer ratios -> cross-engine total order)
      TextAnalysis.tfidfTopTerms(t(s, dir, "documents"), k = 3)
        .withColumn("tf_idf", round(col("tf_idf"), 6))
        .orderBy("doc_id", "rk")
    }),

    "n34_dup_spans" -> ((s, dir) => {
      // exact-substring dedup audit: word-8-gram spans occurring in >1
      // doc; non-vacuous on the raw fixture (1000+ naturally shared
      // 8-grams at both verify SFs)
      TextAnalysis.duplicatedSpans(t(s, dir, "documents"), n = 8)
        .withColumn("dup_share", round(col("dup_share"), 6))
        .orderBy("doc_id")
    }),

    "n38_chunk_dedup" -> ((s, dir) => {
      // exact-substring dedup with removal: disjoint 16-word chunks,
      // first corpus occurrence survives, documents reassembled;
      // non-vacuous on the raw fixture (chunks repeat across docs at
      // every verify SF)
      TextAnalysis.chunkDedup(t(s, dir, "documents"), chunkWords = 16)
        .orderBy("doc_id")
    }),

    "n39_hll_distinct" -> ((s, dir) => {
      // deterministic HyperLogLog distinct sketch over four columns in
      // one scan, exact distinct joined alongside as the audit; the
      // oracle replays the full sketch (FNV hash -> register/rank ->
      // exact integer register sum -> alpha/linear-counting estimate)
      graft.ops.Sketch.hllDistinct(t(s, dir, "documents"),
          Seq("doc_id", "lang", "source", "text"), p = 8)
        .orderBy("col_name")
    }),

    "n47_hll_by_source" -> ((s, dir) => {
      // group-wise HLL: distinct vocabulary per source in one scan,
      // register shuffle bounded by sources x 256 regardless of corpus
      val words = t(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
      graft.ops.Sketch.hllDistinctByGroup(words, "source", "word", p = 8)
        .orderBy("source")
    }),

    "n40_cms_counts" -> ((s, dir) => {
      // count-min term-frequency sketch, probed at the top-10 exact
      // terms (the heavy hitters CMS exists for); exact counts joined
      // alongside as the audit — fully integer, so the oracle replay
      // is float-free
      graft.ops.Sketch.cmsWordCounts(t(s, dir, "documents"),
          depth = 4, width = 1024, topK = 10)
        .orderBy("word")
    }),

    "n123_retrieval_metrics" -> ((s, dir) => {
      // ranked-retrieval quality audit: recall@10 and MRR of the pure
      // int8 code ranking (what a code-only deployment serves) against
      // exact-cosine truth, per query, all-integer fixed point — the
      // ann-benchmarks harness as a relational operator
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 5)
      val truth = Similarity.bruteForceTopK(emb, qs, 10)
        .select(col("query_id"), col("vec_id"), col("rank").cast("long").as("rank"))
      val cand = Similarity.int8TopK(emb, qs, 10)
      Similarity.retrievalMetrics(truth, cand, 10).orderBy("query_id")
    }),

    "n46_knn_int8" -> ((s, dir) => {
      // int8 search path: integer-dot shortlist (4x over-retrieval)
      // over the quantized codes, exact float re-rank of the shortlist
      // only — same shortlist-then-rerank shape as the IVF-PQ query
      val emb = t(s, dir, "embeddings")
      Similarity.quantizedTopK(emb, emb.filter(col("vec_id") < 3),
          k = 5, shortlist = 4)
        .select(col("query_id"), col("vec_id"),
          round(col("cos"), 6).as("cos"), col("rank").cast("long").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    "n45_int8_quantize" -> ((s, dir) => {
      // int8 scalar quantization + quantized-vs-exact cosine audit
      // against query vector 0: the codes replay bit-for-bit (explicit
      // floor(x/scale + 0.5) rounding), the quantized cosine is pure
      // integer dot products (scales cancel), and the exact cosine
      // reuses the proven list_cosine_similarity replay
      Similarity.quantizedCosineAudit(t(s, dir, "embeddings"), queryId = 0L)
        .select(col("vec_id"), round(col("qcos"), 6).as("qcos"),
          round(col("exact_cos"), 6).as("exact_cos"),
          round(col("abs_err"), 6).as("abs_err"))
        .orderBy("vec_id")
    }),

    "n44_text_clean" -> ((s, dir) => {
      // text cleanup, non-vacuous by planted construction (the fixture
      // is clean ASCII): every 4th doc gets a leading tab, a double
      // space, a decomposed accent (e + U+0301, which NFC must compose
      // to é) and a C0 control char — both engines synthesize the same
      // dirt and must emit the same cleaned text
      val docs = t(s, dir, "documents")
      val salted = docs.withColumn("text",
        when(col("doc_id") % 4 === 0,
          concat(lit("\t "), col("text"), lit("  nfce\u0301\u0001x")))
          .otherwise(col("text")))
      TextAnalysis.cleanText(salted)
        .select(col("doc_id"), col("text_clean"), col("was_dirty"))
        .orderBy("doc_id")
    }),

    "n43_hist_quantiles" -> ((s, dir) => {
      // histogram quantile sketch over the per-doc token counts, exact
      // quantiles joined alongside as the audit; all-integer binning,
      // so the brackets replay exactly in the oracle
      graft.ops.Sketch.histQuantiles(
          t(s, dir, "documents")
            .select(TextAnalysis.tokenCount(col("text")).as("n_tokens")),
          "n_tokens", qs = Seq(0.25, 0.5, 0.75, 0.99), bins = 64)
        .orderBy("q")
    }),

    "n61_hist_quantiles_by_lang" -> ((s, dir) => {
      // per-language token-count quantile brackets + exact audit: the
      // group-wise profiling shape of n43; every window partitioned by
      // lang with bins- or cardinality-bounded partitions
      graft.ops.Sketch.histQuantilesByGroup(
          t(s, dir, "documents")
            .select(col("lang"), TextAnalysis.tokenCount(col("text")).as("n_tokens")),
          "lang", "n_tokens", qs = Seq(0.25, 0.5, 0.75, 0.99), bins = 64)
        .withColumnRenamed("g", "lang")
        .orderBy("lang", "q")
    }),

    "n41_inverted_index" -> ((s, dir) => {
      // inverted index over the df band [2, 50]: hapax terms carry no
      // retrieval signal, terms above the band are the stopword class
      // whose postings the two-pass build never materializes; postings
      // rendered to a comma string for the hash compare (the operator
      // itself returns the array)
      TextAnalysis.invertedIndex(t(s, dir, "documents"), minDf = 2, maxDf = 50)
        .select(col("term"), col("df"),
          array_join(transform(col("postings"), _.cast("string")), ",")
            .as("postings"))
        .orderBy("term")
    }),

    "n42_seq_packing" -> ((s, dir) => {
      // concatenate-and-chop sequence packing: 8 shards, 256-token
      // sequences; every column is exact integer arithmetic on the
      // data, so the packing replays identically in the oracle
      graft.ops.Sampling.packSequences(t(s, dir, "documents"),
          budget = 256L, shards = 8)
        .orderBy("doc_id")
    }),

    "n35_source_cap" -> ((s, dir) => {
      // per-domain cap: at most 10 docs per source, survivor set decided
      // by the data (md5 order), so both engines keep identical rows
      graft.ops.Sampling.capPerGroup(t(s, dir, "documents"),
          "source", "doc_id", maxPerGroup = 10)
        .select("doc_id", "source", "sample_rank").orderBy("doc_id")
    }),

    "n26_pii_redaction" -> ((s, dir) => {
      // PII scrubbing, non-vacuous by planted construction (the fixture
      // text is clean word soup): every 5th doc gets a deterministic
      // email/IP/id/phone suffix both engines synthesize identically,
      // then redaction replaces each with its typed placeholder and the
      // per-category counts are hash-compared
      val docs = t(s, dir, "documents")
      val salted = docs.withColumn("text",
        when(col("doc_id") % 5 === 0,
          concat(col("text"),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com via 10.0."), (col("doc_id") % 256).cast("string"),
            lit(".7 id 123-45-6789 tel 555-867-5309")))
          .otherwise(col("text")))
      TextAnalysis.redactPii(salted)
        .select(col("doc_id"), col("text_redacted"),
          col("n_emails"), col("n_ips"), col("n_ids"), col("n_phones"))
        .orderBy("doc_id")
    }),

    "n22_contamination" -> ((s, dir) => {
      // decontamination pass: word-5-gram overlap of each training doc
      // against a deterministically hash-sampled eval set
      val docs = t(s, dir, "documents")
      val evalSet = graft.ops.Sampling.deterministicSample(docs, "doc_id", 0.1)
      val train = docs.filter(!graft.ops.Sampling.hashFilter(col("doc_id"), 0.1))
      TextAnalysis.ngramContamination(train, evalSet, 5).orderBy("doc_id")
    }),

    "n21_knn_ivfpq" -> ((s, dir) => {
      // IVF-PQ with full probing and a rerank window comfortably larger
      // than k: the exact re-rank then reproduces brute-force top-k
      // (OpsSpec guards that containment on the fixture), so the query
      // shares the n08 oracle
      val emb = t(s, dir, "embeddings")
      // ONE corpus count (parquet-footer job on the bare scan) threaded
      // through coarse build, PQ build, and the rerank-window sizing —
      // previously three separate actions over the corpus
      val n = emb.count()
      val idx = Ivf.build(emb, nLists = 8, nRows = n)
      val pq = Ivf.buildPq(idx, m = 16, codebookSize = 32, nRows = n)
      Ivf.searchPq(pq, emb, emb.filter(col("vec_id") < 5), 10,
          nProbe = 8, rerank = Ivf.rerankFor(n))
        .select(col("query_id"), col("vec_id"),
          round(col("cos"), 6).as("cos"), col("rank").cast("long").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    "n158_ivfpq_append" -> ((s, dir) => {
      // IVF-PQ maintenance, the n156 stance for the encoded flavor:
      // coarse centroids AND codebooks fit on the even half only, the
      // odd half appends frozen-encoded — and full probing + the wide
      // rerank window still reproduces brute force over the union
      // (the n21 convention), which holds iff the append partitioned
      // the union and the frozen shortlist kept the true top-k inside
      // the rerank window
      val emb = t(s, dir, "embeddings")
      val old = emb.filter(col("vec_id") % 2 === 0)
      val nOld = old.count()
      val idx = Ivf.build(old, nLists = 8, nRows = nOld)
      val pq = Ivf.buildPq(idx, m = 16, codebookSize = 32, nRows = nOld)
      val appended = Ivf.appendPq(pq, emb.filter(col("vec_id") % 2 === 1))
      Ivf.searchPq(appended, emb, emb.filter(col("vec_id") < 5), 10,
          nProbe = 8, rerank = Ivf.rerankFor(nOld * 2))
        .select(col("query_id"), col("vec_id"),
          round(col("cos"), 6).as("cos"), col("rank").cast("long").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    "n19_deterministic_sample" -> ((s, dir) => {
      // seeded-hash deterministic sample (replayable, no RNG)
      graft.ops.Sampling.deterministicSample(t(s, dir, "documents"), "doc_id", 0.3)
        .select("doc_id", "lang", "n_chars").orderBy("doc_id")
    }),

    "n65_bm25_search" -> ((s, dir) => {
      // BM25 top-10 retrieval for four fixed queries (one matches no
      // corpus term and must vanish from the result — both engines
      // drop it in the postings probe, not via special-casing)
      import s.implicits._
      val qs = Seq((1L, "spark join"), (2L, "window agg row"),
        (3L, "stream batch data"), (4L, "quantum")).toDF("query_id", "qtext")
      TextAnalysis.bm25Search(t(s, dir, "documents"), qs, k = 10)
        .orderBy("query_id", "rnk")
    }),

    "n171_bm25_index" -> ((s, dir) => {
      // BM25 over the MAINTAINED postings state driven through its
      // whole lifecycle: build on the old crawl (doc_id % 4 != 0),
      // append the slice's postings (plain union — per-doc rows),
      // retract the takedown (doc_id % 101) through the SAME
      // doc-keyed anti-join every index family uses; the search must
      // equal from-text BM25 over the survivors — which is exactly
      // what the oracle replays (n65's CTE chain with the survivor
      // WHERE), so the maintained state cannot drift from the text
      import s.implicits._
      val docs = t(s, dir, "documents")
      val old = docs.filter(col("doc_id") % 4 =!= 0)
      val slice = docs.filter(col("doc_id") % 4 === 0)
      val removed = docs.filter(col("doc_id") % 101 === 0).select("doc_id")
      val postings = Dedup.retractFromIndex(
        TextAnalysis.retrievalPostings(old)
          .unionByName(TextAnalysis.retrievalPostings(slice)), removed)
      val docStats = TextAnalysis.retrievalDocStats(postings)
      val qs = Seq((1L, "spark join"), (2L, "window agg row"),
        (3L, "stream batch data"), (4L, "quantum")).toDF("query_id", "qtext")
      TextAnalysis.bm25AgainstIndex(postings, docStats, qs, k = 10)
        .orderBy("query_id", "rnk")
    }),

    "n71_data_card" -> ((s, dir) => {
      // release datasheet over the planted corpus (the dup section is
      // non-vacuous only with the planted copies: 6 duplicate docs)
      graft.ops.Profile.dataCard(plantedDocs(s, dir))
        .orderBy("section", "key")
    }),

    "n70_feature_scaling" -> ((s, dir) => {
      // per-group z-score + min-max normalization with integer-exact
      // moments (closed-form variance from long sums — partition-
      // invariant, so the group stats replay bit-for-bit)
      graft.ops.Profile.scaleFeatures(t(s, dir, "lineitem"),
          "l_quantity", "l_returnflag")
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("lineno"),
          col("l_returnflag"), col("l_quantity").cast("long").as("qty"),
          round(col("z"), 6).as("z"), round(col("mm"), 6).as("mm"))
        // (orderkey, lineno) is NOT unique in the fixture; the sort
        // covers every determining column so row order is total (rows
        // tied on all keys are identical in all emitted columns)
        .orderBy("l_orderkey", "lineno", "l_returnflag", "qty")
    }),

    "n69_hybrid_rrf" -> ((s, dir) => {
      // hybrid retrieval: BM25 top-20 and exact-cosine top-20 fused by
      // reciprocal-rank fusion. The fixture aligns vec_id with doc_id,
      // so query i = (text query i, embedding of vector i); both
      // retrievers' candidate lists are metadata-sized before fusion
      import s.implicits._
      val qs = Seq((1L, "spark join"), (2L, "window agg row"))
        .toDF("query_id", "qtext")
      val text = TextAnalysis.bm25Search(t(s, dir, "documents"), qs, k = 20)
        .select(col("query_id"), col("doc_id"), col("rnk").as("rank"))
      val emb = t(s, dir, "embeddings")
      val vec = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id").isin(1L, 2L)), 20)
        .select(col("query_id"), col("vec_id").as("doc_id"), col("rank"))
      Similarity.rrfFuse(text, vec, k = 10)
        .select(col("query_id"), col("doc_id"), col("rnk"),
          col("rank_a").as("rank_text"), col("rank_b").as("rank_vec"),
          round(col("rrf"), 6).as("rrf"))
        .orderBy("query_id", "rnk")
    }),

    "n68_dsir_weights" -> ((s, dir) => {
      // importance-resampling weights toward the English slice; the
      // weight separates target-looking from non-target documents and
      // every arithmetic step replays (integer counts, pinned ln fold)
      TextAnalysis.dsirWeights(t(s, dir, "documents"), col("lang") === "en")
        .orderBy("doc_id")
    }),

    "n66_shuffle_order" -> ((s, dir) => {
      // deterministic training-order shuffle: hash order key + shard +
      // within-shard position, no global sort anywhere; 8 shards so
      // the per-shard permutation is non-trivially interleaved at sf
      graft.ops.Sampling.shuffleOrder(t(s, dir, "documents"), shards = 8)
        .orderBy("shard", "pos")
    }),

    "n67_split_leakage" -> ((s, dir) => {
      // train/valid/test assignment + duplicate-leakage audit over the
      // planted exact copies (the fixture alone has no duplicate
      // texts — the audit would be vacuous); count algebra only, no
      // pair rows. The planted copies land: one train<->valid crossing,
      // two train-train pairs — a broken cross-split join or a broken
      // same-split n*(n-1)/2 each change the result
      val d = plantedDocs(s, dir)
      graft.ops.Sampling.splitLeakage(d,
          graft.ops.Sampling.hashSplit(col("doc_id"),
            Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)))
        .orderBy("split_a", "split_b")
    }),

    "n18_profile" -> ((s, dir) => {
      // one-pass per-column null/distinct profile
      graft.ops.Profile.profile(t(s, dir, "documents"),
        Seq("doc_id", "text", "lang", "source", "n_chars"))
    }),

    "g18_resample_rms_udaf" -> ((s, _) => {
      // custom typed Aggregator through the resample hook (E1/A2)
      val g = SyntheticGrid.grid(s).selectVariables(Seq("t2m"))
      TemporalResample.downsampleCustom(g, "1 day", c => graft.functions.Udafs.rms(c))
        .df.orderBy("time", "y", "x")
    }),

    "n15_sql_surface" -> ((s, dir) => {
      // native expressions through the SQL surface, fully oracled:
      // DuckDB replays FNV-1a/simhash votes/rolling hash in HUGEINT
      org.apache.spark.sql.graft.GraftExtensions.register(s)
      t(s, dir, "documents").createOrReplaceTempView("documents")
      s.sql("""SELECT doc_id, simhash64(text) AS sh,
              |       rolling_hash64(text) AS rh,
              |       CAST(size(shingle_set(text, 5)) AS BIGINT) AS n_shingles,
              |       CAST(size(word_shingle_set(text, 3)) AS BIGINT) AS n_word_grams
              |FROM documents ORDER BY doc_id""".stripMargin)
    })
  )

  def oracleSql: Map[String, String] = ListMap(

    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_revenue_filter" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q03_revenue_by_nation" ->
      """SELECT r_name, n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q04_order_rank_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        | FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    "q05_top10_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q29_range_frame" ->
      // integer epoch-day RANGE frame; count is BIGINT on both sides
      """SELECT o_custkey, o_orderkey,
        |  CAST(count(*) OVER (PARTITION BY o_custkey
        |    ORDER BY (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_last7
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q28_set_ops" ->
      // parenthesized so the (A INTERSECT B) EXCEPT C association is
      // explicit and matches Spark's left-to-right chaining
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY custkey""".stripMargin,

    "q52_not_in_nulls" ->
      """WITH keys AS (SELECT CASE WHEN s_suppkey % 7 = 0 THEN NULL
        |                     ELSE s_nationkey END AS k FROM supplier)
        |SELECT 'not_in' AS variant, CAST(count(*) AS BIGINT) AS n
        |FROM nation WHERE n_nationkey NOT IN (SELECT k FROM keys)
        |UNION ALL
        |SELECT 'not_exists', CAST(count(*) AS BIGINT)
        |FROM nation WHERE NOT EXISTS (
        |  SELECT 1 FROM keys WHERE keys.k = nation.n_nationkey)
        |ORDER BY variant""".stripMargin,

    "q64_union_by_name" ->
      """SELECT name, kind, key FROM (
        |  SELECT n_name AS name, 'nation' AS kind,
        |   CAST(n_nationkey AS BIGINT) AS key FROM nation
        |  UNION ALL BY NAME
        |  SELECT CAST(r_regionkey AS BIGINT) AS key, 'region' AS kind,
        |   r_name AS name FROM region)
        |ORDER BY kind, key""".stripMargin,

    "q63_grouping_id" ->
      """SELECT nullif(l_returnflag, 'N') AS rf, l_linestatus AS ls,
        | CAST(grouping(nullif(l_returnflag, 'N')) AS BIGINT) AS g_rf,
        | CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
        | CAST(grouping(nullif(l_returnflag, 'N')) * 2
        |   + grouping(l_linestatus) AS BIGINT) AS gid,
        | CAST(count(*) AS BIGINT) AS n,
        | round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(nullif(l_returnflag, 'N'), l_linestatus)
        |ORDER BY gid, rf NULLS FIRST, ls NULLS FIRST""".stripMargin,

    "q61_cohort_retention" ->
      """WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1),
        |j AS (SELECT e.user_id,
        |  date_trunc('day', f.first_ts) AS cohort_day,
        |  CAST(date_diff('day', date_trunc('day', f.first_ts),
        |    date_trunc('day', e.ts)) AS BIGINT) AS day_offset
        | FROM events e JOIN f USING (user_id)),
        |r AS (SELECT cohort_day, day_offset,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        | FROM j GROUP BY 1, 2)
        |SELECT cohort_day, day_offset, n_users,
        | first_value(n_users) OVER w AS cohort_size,
        | n_users * 10000 // first_value(n_users) OVER w AS retention_x1e4
        |FROM r WINDOW w AS (PARTITION BY cohort_day ORDER BY day_offset)
        |ORDER BY cohort_day, day_offset""".stripMargin,

    "q62_event_transitions" ->
      """WITH p AS (SELECT event_type,
        |  lead(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS next_type
        | FROM events),
        |c AS (SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS cnt
        | FROM p WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, next_type, cnt,
        | CAST(cnt * 1000000 //
        |   sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS p_x1e6
        |FROM c ORDER BY event_type, next_type""".stripMargin,

    "q51_event_funnel" ->
      """WITH v1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |            WHERE event_type = 'view' GROUP BY 1),
        |c2 AS (SELECT e.user_id, min(e.ts) AS t2
        |       FROM events e JOIN v1 ON v1.user_id = e.user_id
        |       WHERE e.event_type = 'click' AND e.ts > v1.t1
        |         AND e.ts <= v1.t1 + INTERVAL 24 HOUR GROUP BY 1),
        |p3 AS (SELECT e.user_id, min(e.ts) AS t3
        |       FROM events e JOIN c2 ON c2.user_id = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > c2.t2
        |         AND e.ts <= c2.t2 + INTERVAL 24 HOUR GROUP BY 1)
        |SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v1
        |UNION ALL SELECT '2_click', CAST(count(*) AS BIGINT) FROM c2
        |UNION ALL SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM p3
        |ORDER BY stage""".stripMargin,

    "q50_semi_anti_join" ->
      """SELECT 'with_orders' AS cls, CAST(count(*) AS BIGINT) AS n
        |FROM customer SEMI JOIN orders ON o_custkey = c_custkey
        |UNION ALL
        |SELECT 'without_orders', CAST(count(*) AS BIGINT)
        |FROM customer ANTI JOIN orders ON o_custkey = c_custkey
        |ORDER BY cls""".stripMargin,

    "q48_session_window" -> // definitional: gap rule + half-open end
      """WITH f AS (SELECT user_id, ts,
        |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |          >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        | FROM events),
        |g AS (SELECT user_id, ts,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sid
        | FROM f)
        |SELECT user_id, min(ts) AS session_start,
        | max(ts) + INTERVAL 30 MINUTE AS session_end,
        | CAST(count(*) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "q49_limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 50 OFFSET 100""".stripMargin,

    "q30_sessionization" ->
      // identical gap-flag + running-sum choreography in integer
      // micros; the window sum is HUGEINT in DuckDB -> BIGINT cast
      """WITH e AS (SELECT user_id, event_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |f AS (SELECT user_id, event_id, us,
        |  CASE WHEN coalesce(us - lag(us) OVER
        |      (PARTITION BY user_id ORDER BY us, event_id),
        |      9223372036854775807) > 1800000000
        |    THEN 1 ELSE 0 END AS new_s
        | FROM e),
        |g AS (SELECT user_id, us,
        |  CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        | FROM f)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  min(us) AS start_us, max(us) AS end_us,
        |  max(us) - min(us) AS dur_us
        |FROM g GROUP BY 1, 2 ORDER BY user_id, session_idx""".stripMargin,

    "q31_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS st_f,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS st_o,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS st_p
        |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    "q32_unpivot" ->
      // manual UNION ALL unpivot: values are copied bits, no arithmetic
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS lineno,
        |  'price' AS metric, l_extendedprice AS value
        |FROM lineitem WHERE l_quantity >= 49
        |UNION ALL
        |SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'qty', l_quantity
        |FROM lineitem WHERE l_quantity >= 49
        |ORDER BY l_orderkey, lineno, metric""".stripMargin,

    "q06_nations_no_suppliers" ->
      """WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |            UNION SELECT CAST(9999 AS INTEGER) AS nationkey)
        |SELECT nationkey FROM cn
        |EXCEPT SELECT DISTINCT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q07_big_orders_semi" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin,

    "q08_customers_no_orders" ->
      """WITH c AS (SELECT c_custkey, c_name FROM customer
        |           UNION ALL SELECT CAST(9999999 AS BIGINT), 'planted-no-orders')
        |SELECT c_custkey, c_name FROM c
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q09_status_pivot" ->
      """SELECT o_orderpriority,
        | count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        | count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        | count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q10_part_type_stats" ->
      """SELECT p_brand, count(*) AS n_parts,
        | round(avg(p_retailprice), 4) AS avg_price,
        | round(stddev_samp(p_retailprice), 4) AS std_price,
        | CAST(min(p_size) AS BIGINT) AS min_size,
        | CAST(max(p_size) AS BIGINT) AS max_size,
        | round(median(p_retailprice), 4) AS med_price
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q20_range_join" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS c_id, user_id, ts AS c_ts FROM events
        |      WHERE event_type = 'click')
        |SELECT p.user_id, p.p_id, c.c_id
        |FROM p JOIN c ON p.user_id = c.user_id
        | AND abs(epoch(p.p_ts) - epoch(c.c_ts)) <= 600
        |ORDER BY p.user_id, p.p_id, c.c_id""".stripMargin,

    "q21_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_quantity, 0.25), 6) AS p25,
        | round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        | round(quantile_cont(l_quantity, 0.75), 6) AS p75,
        | round(quantile_cont(l_extendedprice, 0.9), 4) AS price_p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q22_grouping_sets" ->
      """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
        |       coalesce(o_orderstatus, 'ALL') AS status,
        |       count(*) AS n, round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus),
        |                        (o_orderpriority, o_orderstatus), ())
        |ORDER BY priority, status""".stripMargin,

    "q17_distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
        | count(DISTINCT l_partkey) AS n_part, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q24_interval_join_sql" ->
      """WITH p AS (SELECT event_id AS p_id, ts AS p_ts FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS c_id, ts AS c_ts FROM events
        |      WHERE event_type = 'click')
        |SELECT p_id, c_id FROM p JOIN c
        |ON abs(epoch(p_ts) - epoch(c_ts)) <= 5.0
        |ORDER BY p_id, c_id""".stripMargin,

    "q23_salted_skew_join" ->
      """SELECT c_nationkey, count(*) AS n, round(sum(o_totalprice), 2) AS revenue
        |FROM (SELECT CASE WHEN o_custkey % 10 < 3 THEN 1 ELSE o_custkey END AS k,
        |             o_totalprice FROM orders) o
        |JOIN (SELECT c_custkey AS k, c_nationkey FROM customer) c USING (k)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q18_running_totals" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total,
        | lag(o_orderkey, 1) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey) AS prev_order,
        | lead(o_orderkey, 1) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey) AS next_order
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q25_window_ntile" ->
      """SELECT o_orderpriority, o_orderkey, quartile, pr, cd FROM (
        | SELECT o_orderpriority, o_orderkey,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd
        | FROM orders WINDOW w AS (PARTITION BY o_orderpriority
        |   ORDER BY o_totalprice DESC, o_orderkey))
        |WHERE o_orderkey % 100 = 0
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    "q26_bucketed_join" ->
      // the layout changes the PLAN, never the answer: the oracle is
      // the plain join over the raw parquet
      """SELECT o_orderkey, count(*) AS n_lines,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_price,
        | round(max(o_totalprice), 2) AS o_total
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

    "q27_partition_pruning" ->
      // the layout changes which FILES are read, never the answer
      """SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE lang = 'en'
        |GROUP BY source ORDER BY source""".stripMargin,

    "q19_json_extract" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        | max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "n17_embedding_norms" ->
      """SELECT label, count(*) AS n,
        | round(avg(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x)))), 6) AS avg_norm,
        | max(len(embedding)) AS dim
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,

    "q11_events_tumbling" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        | count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q12_events_sliding" ->
      """SELECT ws AS window_start, ws + INTERVAL 1 HOUR AS window_end, event_type,
        | count(*) AS n_events
        |FROM (SELECT event_type,
        |       make_timestamp(CAST((floor(epoch(ts) / 1800) - k) * 1800 AS BIGINT) * 1000000) AS ws
        |      FROM events, (VALUES (0), (1)) t(k))
        |GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin,

    "q13_events_sessions" ->
      """WITH m AS (
        | SELECT user_id, ts, value,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |        OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        | SELECT user_id, ts, value,
        |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        | FROM m)
        |SELECT min(ts) AS session_start, max(ts) + INTERVAL 30 MINUTE AS session_end,
        | user_id, count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,

    "g01_crop" ->
      s"""WITH $grid
         |SELECT time, y, x, t2m, u100 FROM grid
         |WHERE x BETWEEN $cxLo AND $cxHi AND y BETWEEN $cyLo AND $cyHi
         |  AND time BETWEEN TIMESTAMP '2019-01-30 12:00:00' AND TIMESTAMP '2019-01-31 06:00:00'
         |ORDER BY time, y, x""".stripMargin,

    "g41_where_clip_fillna" ->
      s"""WITH $grid
         |SELECT time, y, x,
         | CASE WHEN t2m >= 50.0 THEN t2m END AS t2m_masked,
         | coalesce(CASE WHEN t2m >= 50.0 THEN t2m END, 0.0) AS t2m_filled,
         | least(greatest(t2m, 20.0), 80.0) AS t2m_clip
         |FROM grid ORDER BY time, y, x""".stripMargin,

    "g48_spatial_sum_acf" ->
      s"""WITH $grid,
         |s0 AS (SELECT time, CAST(sum(CAST(t2m * 1024 AS BIGINT)) AS BIGINT) AS v
         |       FROM grid GROUP BY time),
         |s AS (SELECT v, row_number() OVER (ORDER BY time) AS rn FROM s0),
         |lg AS (SELECT unnest(generate_series(1, 30)) AS lag),
         |p AS (SELECT lg.lag, a.v AS x, b.v AS y
         |      FROM s a CROSS JOIN lg JOIN s b ON a.rn + lg.lag = b.rn),
         |m AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |  CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
         |  CAST(sum(x * y) AS BIGINT) AS sxy
         | FROM p GROUP BY lag)
         |SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
         | CAST(n_pairs * sxy - sx * sy AS DOUBLE) /
         |  (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)) *
         |   sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE))) AS r
         |FROM m ORDER BY lag""".stripMargin,

    "g47_spatial_gradient" ->
      s"""WITH $grid,
         |m AS (SELECT time, y, x, t2m,
         |  lag(t2m) OVER wx AS vxp, lead(t2m) OVER wx AS vxn,
         |  lag(x) OVER wx AS cxp, lead(x) OVER wx AS cxn,
         |  lag(t2m) OVER wy AS vyp, lead(t2m) OVER wy AS vyn,
         |  lag(y) OVER wy AS cyp, lead(y) OVER wy AS cyn
         | FROM grid
         | WINDOW wx AS (PARTITION BY time, y ORDER BY x),
         |        wy AS (PARTITION BY time, x ORDER BY y)),
         |d AS (SELECT time, y, x,
         |  CASE WHEN cxp IS NULL AND cxn IS NULL THEN NULL
         |       WHEN cxp IS NULL THEN (vxn - t2m) / (cxn - x)
         |       WHEN cxn IS NULL THEN (t2m - vxp) / (x - cxp)
         |       ELSE (vxn - vxp) / (cxn - cxp) END AS ddx,
         |  CASE WHEN cyp IS NULL AND cyn IS NULL THEN NULL
         |       WHEN cyp IS NULL THEN (vyn - t2m) / (cyn - y)
         |       WHEN cyn IS NULL THEN (t2m - vyp) / (y - cyp)
         |       ELSE (vyn - vyp) / (cyn - cyp) END AS ddy
         | FROM m)
         |SELECT time, y, x, ddx, ddy,
         | sqrt(ddx * ddx + ddy * ddy) AS grad_mag
         |FROM d ORDER BY time, y, x""".stripMargin,

    "n130_zipf_fit" ->
      """WITH w AS (SELECT unnest(list_filter(
        |    regexp_split_to_array(trim(text), '\s+'), t -> t <> '')) AS w
        |  FROM documents),
        |c AS (SELECT w, count(*) AS c FROM w GROUP BY w),
        |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rank
        |      FROM c QUALIFY rank <= 25),
        |t AS (SELECT CAST(round(ln(CAST(rank AS DOUBLE)) * 1000) AS BIGINT) AS lr,
        |       CAST(round(ln(CAST(c AS DOUBLE)) * 1000) AS BIGINT) AS lf FROM r),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_ranks,
        |  CAST(sum(lr) AS BIGINT) AS sx, CAST(sum(lr * lr) AS BIGINT) AS sxx,
        |  CAST(sum(lf) AS BIGINT) AS sy, CAST(sum(lr * lf) AS BIGINT) AS sxy
        | FROM t),
        |f AS (SELECT n_ranks, sx, sy,
        |  (1000000 * (n_ranks * sxy - sx * sy)) // (n_ranks * sxx - sx * sx)
        |    AS slope_x1e6 FROM m)
        |SELECT n_ranks, slope_x1e6,
        | (sy - (slope_x1e6 * sx) // 1000000) // n_ranks AS icept_x1e3
        |FROM f""".stripMargin,

    "g46_bilinear_points" ->
      s"""WITH $grid,
         |p AS (SELECT pid, CAST(lon AS DOUBLE) AS lon,
         |        CAST(lat AS DOUBLE) AS lat FROM (VALUES
         |  ('pA', -83.1234, 41.4567),
         |  ('pB', -80.001, 42.70),
         |  ('pC', -82.0, 42.0)) t(pid, lon, lat)),
         |st AS (SELECT pid, lon, lat,
         |  least(greatest(CAST(floor((lon - (-83.5)) / 0.25) AS BIGINT), 0), 17) AS i0,
         |  least(greatest(CAST(floor((lat - 41.25) / 0.25) AS BIGINT), 0), 5) AS j0
         | FROM p),
         |w AS (SELECT pid,
         |  (-83.5) + i0 * 0.25 AS x0, (-83.5) + (i0 + 1) * 0.25 AS x1,
         |  41.25 + j0 * 0.25 AS y0, 41.25 + (j0 + 1) * 0.25 AS y1,
         |  (lon - ((-83.5) + i0 * 0.25)) / 0.25 AS fx,
         |  (lat - (41.25 + j0 * 0.25)) / 0.25 AS fy
         | FROM st),
         |j AS (SELECT g.time, w.pid,
         |  sum(CASE WHEN g.x = w.x0 AND g.y = w.y0 THEN t2m END) AS v00,
         |  sum(CASE WHEN g.x = w.x1 AND g.y = w.y0 THEN t2m END) AS v10,
         |  sum(CASE WHEN g.x = w.x0 AND g.y = w.y1 THEN t2m END) AS v01,
         |  sum(CASE WHEN g.x = w.x1 AND g.y = w.y1 THEN t2m END) AS v11
         | FROM grid g JOIN w ON (g.x = w.x0 OR g.x = w.x1)
         |   AND (g.y = w.y0 OR g.y = w.y1)
         | GROUP BY 1, 2)
         |SELECT j.time, j.pid AS point_id,
         | j.v00 * ((1 - w.fx) * (1 - w.fy)) + j.v10 * (w.fx * (1 - w.fy)) +
         | j.v01 * ((1 - w.fx) * w.fy) + j.v11 * (w.fx * w.fy) AS t2m
         |FROM j JOIN w ON j.pid = w.pid
         |ORDER BY time, point_id""".stripMargin,

    "g45_seasonal_mase" ->
      s"""WITH $grid,
         |m AS (SELECT y, x,
         |  abs(t2m - lag(t2m, 24) OVER w) AS se,
         |  abs(t2m - lag(t2m, 1) OVER w) AS ne
         | FROM grid WINDOW w AS (PARTITION BY y, x ORDER BY time))
         |SELECT y, x, sum(se) AS sae_t2m, sum(ne) AS sne_t2m,
         | sum(se) / sum(ne) AS mase_t2m, CAST(count(*) AS BIGINT) AS n_eval
         |FROM m WHERE se IS NOT NULL GROUP BY y, x ORDER BY y, x""".stripMargin,

    "g42_focal_mean" -> // separable box filter replayed as two RANGE passes
      s"""WITH $grid,
         |ix AS (SELECT time, y, x, t2m,
         |  CAST(floor((x - (-83.5)) / 0.25 + 0.5) AS BIGINT) AS jx,
         |  CAST(floor((y - 41.25) / 0.25 + 0.5) AS BIGINT) AS jy
         | FROM grid),
         |p1 AS (SELECT time, y, x, jx, jy,
         |  sum(t2m) OVER wx AS sx, count(t2m) OVER wx AS cx
         | FROM ix WINDOW wx AS (PARTITION BY time, jy ORDER BY jx
         |   RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING))
         |SELECT time, y, x,
         | sum(sx) OVER wy / sum(cx) OVER wy AS t2m
         |FROM p1 WINDOW wy AS (PARTITION BY time, jx ORDER BY jy
         |  RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)
         |ORDER BY time, y, x""".stripMargin,

    "g43_polyfit_trend" -> // exact normal-equation sums, two IEEE divisions
      s"""WITH $grid,
         |h AS (SELECT y, x, t2m,
         |  (epoch(time) - min(epoch(time)) OVER (PARTITION BY y, x))
         |    / 3600.0 AS hx
         | FROM grid),
         |m AS (SELECT y, x, CAST(count(*) AS DOUBLE) AS n,
         |  sum(hx) AS sx, sum(hx * hx) AS sxx,
         |  sum(t2m) AS sy, sum(hx * t2m) AS sxy
         | FROM h GROUP BY y, x)
         |SELECT y, x,
         | (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope_t2m,
         | (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
         |   AS icept_t2m
         |FROM m ORDER BY y, x""".stripMargin,

    "g44_shift_diff_cumsum" ->
      s"""WITH $grid
         |SELECT time, y, x,
         | lag(t2m, 2) OVER w AS t2m_shift2,
         | t2m - lag(t2m, 1) OVER w AS t2m_diff,
         | sum(t2m) OVER (PARTITION BY y, x ORDER BY time
         |   ROWS UNBOUNDED PRECEDING) AS t2m_cumsum
         |FROM grid WINDOW w AS (PARTITION BY y, x ORDER BY time)
         |ORDER BY time, y, x""".stripMargin,

    "g39_diurnal_cycle" ->
      s"""WITH $grid
         |SELECT CAST(hour(time) AS BIGINT) AS hr, y, x,
         | avg(t2m) AS t2m_mean, CAST(count(*) AS BIGINT) AS n
         |FROM grid GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "g40_anomaly" ->
      s"""WITH $grid
         |SELECT time, y, x,
         | t2m - avg(t2m) OVER (PARTITION BY hour(time), y, x) AS t2m_anom
         |FROM grid ORDER BY time, y, x""".stripMargin,

    "g37_time_integral" ->
      s"""WITH $grid,
         |m AS (SELECT y, x, t2m, lead(t2m) OVER w AS nv,
         |        epoch(time) AS t, lead(epoch(time)) OVER w AS nt
         |      FROM grid WINDOW w AS (PARTITION BY y, x ORDER BY time))
         |SELECT y, x, round(sum((t2m + nv) / 2.0 * (nt - t)), 6) AS integral_t2m
         |FROM m WHERE nt IS NOT NULL GROUP BY y, x ORDER BY y, x""".stripMargin,

    "g38_time_derivative" ->
      s"""WITH $grid,
         |m AS (SELECT time, y, x, t2m,
         |  lag(t2m) OVER w AS pv, lead(t2m) OVER w AS nv,
         |  lag(epoch(time)) OVER w AS pt, lead(epoch(time)) OVER w AS nt,
         |  epoch(time) AS t
         | FROM grid WINDOW w AS (PARTITION BY y, x ORDER BY time))
         |SELECT time, y, x,
         | CASE WHEN pt IS NULL AND nt IS NULL THEN NULL
         |      WHEN pt IS NULL THEN (nv - t2m) / (nt - t)
         |      WHEN nt IS NULL THEN (t2m - pv) / (t - pt)
         |      ELSE (nv - pv) / (nt - pt) END AS t2m
         |FROM m ORDER BY time, y, x""".stripMargin,

    "g36_weighted_spatial_mean" ->
      s"""WITH $grid
         |SELECT time,
         | round(sum(t2m * cos(radians(y))) / sum(cos(radians(y))), 6) AS wmean_t2m,
         | round(avg(t2m), 6) AS mean_t2m
         |FROM grid GROUP BY time ORDER BY time""".stripMargin,

    "g34_rolling_time_mean" ->
      s"""WITH $grid
         |SELECT time, y, x,
         | CASE WHEN count(t2m) OVER w >= 4 THEN avg(t2m) OVER w END AS t2m
         |FROM grid
         |WINDOW w AS (PARTITION BY y, x ORDER BY time
         |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
         |ORDER BY time, y, x""".stripMargin,

    "g02_downsample_6h_mean" ->
      s"""WITH $grid
         |SELECT make_timestamp(CAST(floor(epoch(time) / 21600) * 21600 AS BIGINT) * 1000000) AS time,
         | y, x, avg(t2m) AS t2m, avg(u100) AS u100
         |FROM grid GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "g03_daily_stats" ->
      s"""WITH $grid
         |SELECT date_trunc('day', time) AS day, y, x,
         | median(t2m) AS med_t2m, min(t2m) AS min_t2m,
         | max(t2m) AS max_t2m, sum(t2m) AS sum_t2m
         |FROM grid GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "g04_spatial_stats" ->
      s"""WITH $grid
         |SELECT time, avg(t2m) AS mean_t2m, round(stddev_samp(t2m), 6) AS std_t2m,
         | min(t2m) AS min_t2m, max(t2m) AS max_t2m
         |FROM grid GROUP BY time ORDER BY time""".stripMargin,

    "g05_points_table" -> {
      val cols = snapped.map { case (id, sx, sy) =>
        s" max(t2m) FILTER (WHERE x = $sx AND y = $sy) AS $id"
      }.mkString(",\n")
      s"""WITH $grid
         |SELECT time,
         |$cols
         |FROM grid GROUP BY time ORDER BY time""".stripMargin
    },

    "g22_flagship_pipeline" -> {
      // the flagship's AOI/time range cover the fixture exactly, so the
      // pivot reduces to the g05 relation
      val cols = snapped.map { case (id, sx, sy) =>
        s" max(t2m) FILTER (WHERE x = $sx AND y = $sy) AS $id"
      }.mkString(",\n")
      s"""WITH $grid
         |SELECT time,
         |$cols
         |FROM grid GROUP BY time ORDER BY time""".stripMargin
    },

    "g06_var_merge" ->
      s"""WITH $grid,
         |a AS (SELECT time, y, x, t2m FROM grid WHERE x BETWEEN -83.5 AND -81.0),
         |b AS (SELECT time, y, x, u100 FROM grid WHERE x BETWEEN -82.0 AND -79.0)
         |SELECT time, y, x, t2m, u100 FROM a FULL OUTER JOIN b USING (time, y, x)
         |ORDER BY time, y, x""".stripMargin,

    "g07_upsample_linear" ->
      s"""WITH $grid,
         |src AS (SELECT time, y, x, t2m FROM grid
         |        WHERE x BETWEEN ${upBox.west} AND ${upBox.east}
         |          AND y BETWEEN ${upBox.south} AND ${upBox.north}),
         |times AS (SELECT generate_series AS time FROM generate_series(
         |  TIMESTAMP '2019-01-30 00:00:00', TIMESTAMP '2019-02-02 00:00:00', INTERVAL 30 MINUTE)),
         |cells AS (SELECT DISTINCT y, x FROM src),
         |g AS (SELECT t.time, c.y, c.x, s.t2m
         |      FROM times t CROSS JOIN cells c
         |      LEFT JOIN src s ON s.time = t.time AND s.y = c.y AND s.x = c.x),
         |f AS (SELECT time, y, x, t2m,
         |  last_value(t2m IGNORE NULLS) OVER w AS pv,
         |  last_value(CASE WHEN t2m IS NOT NULL THEN time END IGNORE NULLS) OVER w AS pt,
         |  first_value(t2m IGNORE NULLS) OVER w2 AS nv,
         |  first_value(CASE WHEN t2m IS NOT NULL THEN time END IGNORE NULLS) OVER w2 AS nt
         | FROM g WINDOW
         |  w AS (PARTITION BY y, x ORDER BY time ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |  w2 AS (PARTITION BY y, x ORDER BY time ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT time, y, x,
         | CASE WHEN t2m IS NOT NULL THEN t2m
         |      WHEN pt IS NULL OR nt IS NULL THEN NULL
         |      ELSE pv + (nv - pv) * (epoch(time) - epoch(pt)) / (epoch(nt) - epoch(pt)) END AS t2m
         |FROM f ORDER BY time, y, x""".stripMargin,

    "g08_upsample_ffill" ->
      s"""WITH $grid,
         |src AS (SELECT time, y, x, t2m FROM grid
         |        WHERE x BETWEEN ${upBox.west} AND ${upBox.east}
         |          AND y BETWEEN ${upBox.south} AND ${upBox.north}),
         |times AS (SELECT generate_series AS time FROM generate_series(
         |  TIMESTAMP '2019-01-30 00:00:00', TIMESTAMP '2019-02-02 00:00:00', INTERVAL 30 MINUTE)),
         |cells AS (SELECT DISTINCT y, x FROM src),
         |g AS (SELECT t.time, c.y, c.x, s.t2m
         |      FROM times t CROSS JOIN cells c
         |      LEFT JOIN src s ON s.time = t.time AND s.y = c.y AND s.x = c.x)
         |SELECT time, y, x,
         | last_value(t2m IGNORE NULLS) OVER (PARTITION BY y, x ORDER BY time
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t2m
         |FROM g ORDER BY time, y, x""".stripMargin,

    "g31_upsample_bfill" ->
      s"""WITH $grid,
         |src AS (SELECT time, y, x, t2m FROM grid
         |        WHERE x BETWEEN ${upBox.west} AND ${upBox.east}
         |          AND y BETWEEN ${upBox.south} AND ${upBox.north}),
         |times AS (SELECT generate_series AS time FROM generate_series(
         |  TIMESTAMP '2019-01-30 00:00:00', TIMESTAMP '2019-02-02 00:00:00', INTERVAL 30 MINUTE)),
         |cells AS (SELECT DISTINCT y, x FROM src),
         |g AS (SELECT t.time, c.y, c.x, s.t2m
         |      FROM times t CROSS JOIN cells c
         |      LEFT JOIN src s ON s.time = t.time AND s.y = c.y AND s.x = c.x)
         |SELECT time, y, x,
         | first_value(t2m IGNORE NULLS) OVER (PARTITION BY y, x ORDER BY time
         |   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS t2m
         |FROM g ORDER BY time, y, x""".stripMargin,

    "g32_concat_time" ->
      s"""WITH $grid
         |SELECT time, y, x, t2m, u100 FROM grid
         |WHERE time <= TIMESTAMP '2019-01-31 23:00:00'
         |   OR time >= TIMESTAMP '2019-02-01 00:00:00'
         |ORDER BY time, y, x""".stripMargin,

    "g33_zorder_key" ->
      s"""WITH $grid
         |SELECT time, y, x,
         | CAST(list_sum(list_transform(generate_series(0, 15), b ->
         |   (((jx >> b) & 1) << (2 * b)) + (((jy >> b) & 1) << (2 * b + 1))))
         |  AS BIGINT) AS zkey
         |FROM grid ORDER BY time, y, x""".stripMargin,

    "g35_hilbert_key" -> {
      // one CTE per curve order bit, each applying the loop body of
      // HilbertKernels.xy2d verbatim: quadrant digit into d, then the
      // conditional reflect+transpose of the running (hx, hy) frame.
      // All references in a step's SELECT read the PREVIOUS step's
      // columns, so the aliases carry the mutation exactly
      val steps = (15 to 0 by -1).map { b =>
        val s = 1L << b
        val src = if (b == 15) "hinit" else "h" + (b + 1)
        s"""h$b AS (SELECT time, yc, xc,
           | CASE WHEN ((hy >> $b) & 1) = 1 THEN hx
           |      WHEN ((hx >> $b) & 1) = 1 THEN ${s - 1} - hy ELSE hy END AS hx,
           | CASE WHEN ((hy >> $b) & 1) = 1 THEN hy
           |      WHEN ((hx >> $b) & 1) = 1 THEN ${s - 1} - hx ELSE hx END AS hy,
           | d + ${s * s} * xor(3 * ((hx >> $b) & 1), (hy >> $b) & 1) AS d
           | FROM $src)"""
      }.mkString(",\n")
      s"""WITH $grid,
         |hinit AS (SELECT time, y AS yc, x AS xc, CAST(jy AS BIGINT) AS hy,
         |          CAST(jx AS BIGINT) AS hx, CAST(0 AS BIGINT) AS d FROM grid),
         |$steps
         |SELECT time, yc AS y, xc AS x, CAST(d AS BIGINT) AS hkey
         |FROM h0 ORDER BY time, y, x""".stripMargin
    },

    "g09_spatial_nearest_x2" ->
      s"""WITH $grid,
         |tgt AS (SELECT id // ${xt2.n} AS jy2, id % ${xt2.n} AS jx2
         |        FROM range(${xt2.n.toLong * yt2.n}) t(id)),
         |m AS (SELECT (${yt2.origin} + jy2 * ${yt2.step}) AS y2,
         |             (${xt2.origin} + jx2 * ${xt2.step}) AS x2,
         |  least(greatest(CAST(floor((${xt2.origin} + jx2 * ${xt2.step} - ${xa.origin}) / ${xa.step} + 0.5) AS BIGINT), 0), ${xa.n - 1}) AS jx,
         |  least(greatest(CAST(floor((${yt2.origin} + jy2 * ${yt2.step} - ${ya.origin}) / ${ya.step} + 0.5) AS BIGINT), 0), ${ya.n - 1}) AS jy
         | FROM tgt)
         |SELECT g.time, CAST(m.y2 AS DOUBLE) AS y, CAST(m.x2 AS DOUBLE) AS x, g.t2m
         |FROM grid g JOIN m ON g.jy = m.jy AND g.jx = m.jx
         |ORDER BY time, y, x""".stripMargin,

    "g10_spatial_bilinear_x2" ->
      s"""WITH $grid,
         |tgt AS (SELECT id // ${xt2.n} AS jy2, id % ${xt2.n} AS jx2
         |        FROM range(${xt2.n.toLong * yt2.n}) t(id)),
         |m AS (SELECT (${yt2.origin} + jy2 * ${yt2.step}) AS y2,
         |             (${xt2.origin} + jx2 * ${xt2.step}) AS x2,
         |  (${xt2.origin} + jx2 * ${xt2.step} - ${xa.origin}) / ${xa.step} AS gx,
         |  (${yt2.origin} + jy2 * ${yt2.step} - ${ya.origin}) / ${ya.step} AS gy
         | FROM tgt),
         |mb AS (SELECT y2, x2,
         |  least(greatest(CAST(floor(gx) AS BIGINT), 0), ${xa.n - 1}) AS jx0,
         |  least(greatest(CAST(floor(gx) AS BIGINT) + 1, 0), ${xa.n - 1}) AS jx1,
         |  least(greatest(CAST(floor(gy) AS BIGINT), 0), ${ya.n - 1}) AS jy0,
         |  least(greatest(CAST(floor(gy) AS BIGINT) + 1, 0), ${ya.n - 1}) AS jy1,
         |  gx - floor(gx) AS wx1, gy - floor(gy) AS wy1
         | FROM m),
         |corners AS (
         | SELECT y2, x2, jy0 AS jy, jx0 AS jx, (1.0 - wy1) * (1.0 - wx1) AS w FROM mb
         | UNION ALL SELECT y2, x2, jy0, jx1, (1.0 - wy1) * wx1 FROM mb
         | UNION ALL SELECT y2, x2, jy1, jx0, wy1 * (1.0 - wx1) FROM mb
         | UNION ALL SELECT y2, x2, jy1, jx1, wy1 * wx1 FROM mb)
         |SELECT g.time, CAST(c.y2 AS DOUBLE) AS y, CAST(c.x2 AS DOUBLE) AS x, round(sum(g.t2m * c.w), 6) AS t2m
         |FROM grid g JOIN corners c ON g.jy = c.jy AND g.jx = c.jx
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "g21_spatial_cubic_x2" -> {
      def kern(d: String): String =
        s"""CASE WHEN abs($d) <= 1.0
           | THEN (1.5 * abs($d) - 2.5) * abs($d) * abs($d) + 1.0
           | WHEN abs($d) < 2.0
           | THEN ((-0.5 * abs($d) + 2.5) * abs($d) - 4.0) * abs($d) + 2.0
           | ELSE 0.0 END""".stripMargin.replace("\n", " ")
      s"""WITH $grid,
         |tgt AS (SELECT id // ${xt2.n} AS jy2, id % ${xt2.n} AS jx2
         |        FROM range(${xt2.n.toLong * yt2.n}) t(id)),
         |m AS (SELECT (${yt2.origin} + jy2 * ${yt2.step}) AS y2,
         |             (${xt2.origin} + jx2 * ${xt2.step}) AS x2,
         |  (${xt2.origin} + jx2 * ${xt2.step} - ${xa.origin}) / ${xa.step} AS gx,
         |  (${yt2.origin} + jy2 * ${yt2.step} - ${ya.origin}) / ${ya.step} AS gy
         | FROM tgt),
         |taps AS (SELECT a.ky, b.kx
         |         FROM (VALUES (-1),(0),(1),(2)) a(ky), (VALUES (-1),(0),(1),(2)) b(kx)),
         |corners AS (
         | SELECT y2, x2,
         |  least(greatest(CAST(floor(gy) + ky AS BIGINT), 0), ${ya.n - 1}) AS jy,
         |  least(greatest(CAST(floor(gx) + kx AS BIGINT), 0), ${xa.n - 1}) AS jx,
         |  (${kern("gx - (floor(gx) + kx)")}) * (${kern("gy - (floor(gy) + ky)")}) AS w
         | FROM m, taps)
         |SELECT g.time, CAST(c.y2 AS DOUBLE) AS y, CAST(c.x2 AS DOUBLE) AS x, round(sum(g.t2m * c.w), 6) AS t2m
         |FROM grid g JOIN corners c ON g.jy = c.jy AND g.jx = c.jx
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
    },

    "g19_upsample_cubic" -> splineOracleSql(cubicWeights),

    "g20_upsample_quadratic" -> splineOracleSql(quadraticWeights, nudge = true),

    "g29_spatial_cubicspline_x2" -> {
      def kern(d: String): String =
        s"""CASE WHEN abs($d) <= 1.0
           | THEN (4.0 - 6.0 * abs($d) * abs($d) + 3.0 * abs($d) * abs($d) * abs($d)) / 6.0
           | WHEN abs($d) < 2.0
           | THEN (2.0 - abs($d)) * (2.0 - abs($d)) * (2.0 - abs($d)) / 6.0
           | ELSE 0.0 END""".stripMargin.replace("\n", " ")
      s"""WITH $grid,
         |tgt AS (SELECT id // ${xt2.n} AS jy2, id % ${xt2.n} AS jx2
         |        FROM range(${xt2.n.toLong * yt2.n}) t(id)),
         |m AS (SELECT (${yt2.origin} + jy2 * ${yt2.step}) AS y2,
         |             (${xt2.origin} + jx2 * ${xt2.step}) AS x2,
         |  (${xt2.origin} + jx2 * ${xt2.step} - ${xa.origin}) / ${xa.step} AS gx,
         |  (${yt2.origin} + jy2 * ${yt2.step} - ${ya.origin}) / ${ya.step} AS gy
         | FROM tgt),
         |taps AS (SELECT a.ky, b.kx
         |         FROM (VALUES (-1),(0),(1),(2)) a(ky), (VALUES (-1),(0),(1),(2)) b(kx)),
         |corners AS (
         | SELECT y2, x2,
         |  least(greatest(CAST(floor(gy) + ky AS BIGINT), 0), ${ya.n - 1}) AS jy,
         |  least(greatest(CAST(floor(gx) + kx AS BIGINT), 0), ${xa.n - 1}) AS jx,
         |  (${kern("gx - (floor(gx) + kx)")}) * (${kern("gy - (floor(gy) + ky)")}) AS w
         | FROM m, taps)
         |SELECT g.time, CAST(c.y2 AS DOUBLE) AS y, CAST(c.x2 AS DOUBLE) AS x, round(sum(g.t2m * c.w) + 1e-9, 6) AS t2m
         |FROM grid g JOIN corners c ON g.jy = c.jy AND g.jx = c.jx
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
    },

    "g23_spatial_agg_half" ->
      s"""WITH $grid,
         |$blockCte
         |SELECT time, y2 AS y, x2 AS x,
         | avg(t2m) AS average_t2m, sum(t2m) AS sum_t2m,
         | min(t2m) AS min_t2m, max(t2m) AS max_t2m,
         | sqrt(avg(t2m * t2m)) AS rms_t2m
         |FROM b GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "g24_spatial_quantiles_half" ->
      s"""WITH $grid,
         |$blockCte
         |SELECT time, y2 AS y, x2 AS x,
         | quantile_cont(t2m, 0.5) AS med_t2m,
         | quantile_cont(t2m, 0.25) AS q1_t2m,
         | quantile_cont(t2m, 0.75) AS q3_t2m
         |FROM b GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "g25_spatial_mode_half" ->
      s"""WITH $grid,
         |b AS (SELECT time, CAST(floor(t2m) AS BIGINT) AS v,
         |  least(greatest(CAST(floor((y - $blockWy) / ${D(yth.step)}) AS BIGINT), 0), ${yth.n - 1}) AS jy2,
         |  least(greatest(CAST(floor((x - $blockWx) / ${D(xth.step)}) AS BIGINT), 0), ${xth.n - 1}) AS jx2
         | FROM grid),
         |c AS (SELECT time, jy2, jx2, v, count(*) AS cnt FROM b GROUP BY 1, 2, 3, 4),
         |r AS (SELECT time, jy2, jx2, v,
         |  row_number() OVER (PARTITION BY time, jy2, jx2 ORDER BY cnt DESC, v) AS rk
         | FROM c)
         |SELECT time, (${D(yth.origin)} + jy2 * ${D(yth.step)}) AS y,
         | (${D(xth.origin)} + jx2 * ${D(xth.step)}) AS x, v AS t2m
         |FROM r WHERE rk = 1 ORDER BY 1, 2, 3""".stripMargin,

    "g26_spatial_gauss_half" ->
      s"""WITH $grid,
         |b AS (SELECT time, t2m, y, x,
         |  least(greatest(CAST(floor((y - $blockWy) / ${D(yth.step)}) AS BIGINT), 0), ${yth.n - 1}) AS jy2,
         |  least(greatest(CAST(floor((x - $blockWx) / ${D(xth.step)}) AS BIGINT), 0), ${xth.n - 1}) AS jx2
         | FROM grid),
         |w AS (SELECT time, jy2, jx2, t2m,
         |  exp(-((x - (${D(xth.origin)} + jx2 * ${D(xth.step)})) / ${D(xa.step)}
         |        * ((x - (${D(xth.origin)} + jx2 * ${D(xth.step)})) / ${D(xa.step)}) / 2.0
         |      + (y - (${D(yth.origin)} + jy2 * ${D(yth.step)})) / ${D(ya.step)}
         |        * ((y - (${D(yth.origin)} + jy2 * ${D(yth.step)})) / ${D(ya.step)}) / 2.0)) AS w
         | FROM b)
         |SELECT time, (${D(yth.origin)} + jy2 * ${D(yth.step)}) AS y,
         | (${D(xth.origin)} + jx2 * ${D(xth.step)}) AS x,
         | round(sum(t2m * w) / sum(w), 6) AS t2m
         |FROM w GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "g27_spatial_lanczos_x2" -> {
      val pi = math.Pi.toString
      def kern(d: String): String =
        s"""CASE WHEN abs($d) < 1e-12 THEN 1.0
           | WHEN abs($d) < 3.0
           | THEN 3.0 * sin($pi * ($d)) * sin($pi * ($d) / 3.0)
           |      / ($pi * $pi * ($d) * ($d))
           | ELSE 0.0 END""".stripMargin.replace("\n", " ")
      val swx = (-2 to 3).map(k => s"(${kern(s"fx - ($k)")})").mkString(" + ")
      val swy = (-2 to 3).map(k => s"(${kern(s"fy - ($k)")})").mkString(" + ")
      s"""WITH $grid,
         |tgt AS (SELECT id // ${xt2.n} AS jy2, id % ${xt2.n} AS jx2
         |        FROM range(${xt2.n.toLong * yt2.n}) t(id)),
         |m AS (SELECT (${yt2.origin} + jy2 * ${yt2.step}) AS y2,
         |             (${xt2.origin} + jx2 * ${xt2.step}) AS x2,
         |  (${xt2.origin} + jx2 * ${xt2.step} - ${xa.origin}) / ${xa.step} AS gx,
         |  (${yt2.origin} + jy2 * ${yt2.step} - ${ya.origin}) / ${ya.step} AS gy
         | FROM tgt),
         |k AS (SELECT y2, x2, gx, gy, gx - floor(gx) AS fx, gy - floor(gy) AS fy,
         |  ($swx) AS swx, ($swy) AS swy FROM m),
         |taps AS (SELECT a.ky, b.kx
         |         FROM (VALUES (-2),(-1),(0),(1),(2),(3)) a(ky),
         |              (VALUES (-2),(-1),(0),(1),(2),(3)) b(kx)),
         |corners AS (
         | SELECT y2, x2,
         |  least(greatest(CAST(floor(gy) + ky AS BIGINT), 0), ${ya.n - 1}) AS jy,
         |  least(greatest(CAST(floor(gx) + kx AS BIGINT), 0), ${xa.n - 1}) AS jx,
         |  (${kern("fx - (kx)")}) / swx * ((${kern("fy - (ky)")}) / swy) AS w
         | FROM k, taps)
         |SELECT g.time, CAST(c.y2 AS DOUBLE) AS y, CAST(c.x2 AS DOUBLE) AS x, round(sum(g.t2m * c.w), 6) AS t2m
         |FROM grid g JOIN corners c ON g.jy = c.jy AND g.jx = c.jx
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
    },

    "g11_tz_subset" ->
      s"""WITH $grid
         |SELECT time, y, x, t2m FROM grid
         |WHERE time BETWEEN TIMESTAMP '${toUtc(tzStart)}' AND TIMESTAMP '${toUtc(tzEnd)}'
         |ORDER BY time, y, x""".stripMargin,

    "g12_bbox_extremes" ->
      s"""WITH $grid
         |SELECT min(x) AS west, max(x) AS east, min(y) AS south, max(y) AS north
         |FROM grid""".stripMargin,

    "g13_downsample_first_last" ->
      s"""WITH $grid
         |SELECT date_trunc('day', time) AS time, y, x,
         | arg_min(t2m, time) AS first_t2m, arg_max(t2m, time) AS last_t2m
         |FROM grid GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "g14_upsample_nearest" ->
      s"""WITH $grid,
         |src AS (SELECT time, y, x, t2m FROM grid
         |        WHERE x BETWEEN ${upBox.west} AND ${upBox.east}
         |          AND y BETWEEN ${upBox.south} AND ${upBox.north}),
         |times AS (SELECT generate_series AS time FROM generate_series(
         |  TIMESTAMP '2019-01-30 00:00:00', TIMESTAMP '2019-02-02 00:00:00', INTERVAL 30 MINUTE)),
         |cells AS (SELECT DISTINCT y, x FROM src),
         |g AS (SELECT t.time, c.y, c.x, s.t2m
         |      FROM times t CROSS JOIN cells c
         |      LEFT JOIN src s ON s.time = t.time AND s.y = c.y AND s.x = c.x),
         |f AS (SELECT time, y, x, t2m,
         |  last_value(t2m IGNORE NULLS) OVER w AS pv,
         |  last_value(CASE WHEN t2m IS NOT NULL THEN time END IGNORE NULLS) OVER w AS pt,
         |  first_value(t2m IGNORE NULLS) OVER w2 AS nv,
         |  first_value(CASE WHEN t2m IS NOT NULL THEN time END IGNORE NULLS) OVER w2 AS nt
         | FROM g WINDOW
         |  w AS (PARTITION BY y, x ORDER BY time ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |  w2 AS (PARTITION BY y, x ORDER BY time ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT time, y, x,
         | CASE WHEN t2m IS NOT NULL THEN t2m
         |      WHEN pt IS NULL THEN nv
         |      WHEN nt IS NULL THEN pv
         |      WHEN epoch(time) - epoch(pt) <= epoch(nt) - epoch(time) THEN pv
         |      ELSE nv END AS t2m
         |FROM f ORDER BY time, y, x""".stripMargin,

    "g15_gage_render" ->
      s"""WITH $grid,
         |src AS (SELECT time, y, x, t2m FROM grid
         |        WHERE x BETWEEN -83.5 AND -83.0 AND y BETWEEN 41.25 AND 41.5),
         |ev(event, st, en) AS (VALUES
         |  ('e1', TIMESTAMP '2019-01-30 00:00:00', TIMESTAMP '2019-01-30 23:00:00'),
         |  ('e2', TIMESTAMP '2019-02-01 00:00:00', TIMESTAMP '2019-02-02 00:00:00'))
         |SELECT event, time,
         | concat_ws(' ', 'GAGES', strftime(time, '%Y %m %d %H %M'),
         |   string_agg(CAST(t2m AS VARCHAR), ' ' ORDER BY x, y)) AS line
         |FROM src JOIN ev ON time BETWEEN st AND en
         |GROUP BY event, time ORDER BY event, time""".stripMargin,

    "g16_wes_render" ->
      s"""WITH $grid
         |SELECT time,
         | concat_ws(' ', strftime(time, '%Y %m %d %H %M'),
         |   '99.999', '999.0', '999.0',
         |   CAST(round(avg(u100), 6) AS VARCHAR),
         |   CAST(round(avg(t2m), 6) AS VARCHAR),
         |   '999.99', '999.99') AS line
         |FROM grid GROUP BY time ORDER BY time""".stripMargin,

    "g17_grass_render" -> {
      // header lines mirror Gssha.grassAscii on the cropped axes
      // (x: -83.5..-83.0 step 0.25 -> 3 cols; y: 41.25..41.5 -> 2 rows)
      val hdr = Seq("north: 41.5", "south: 41.25", "east: -83.0",
          "west: -83.5", "rows: 2", "cols: 3")
        .map(l => s"'$l'").mkString(" || chr(10) || ") + " || chr(10)"
      s"""WITH $grid,
         |src AS (SELECT time, y, x, t2m FROM grid
         |        WHERE x BETWEEN -83.5 AND -83.0 AND y BETWEEN 41.25 AND 41.5),
         |r AS (SELECT time, y, string_agg(CAST(t2m AS VARCHAR), ' ' ORDER BY x) AS rowstr
         |      FROM src GROUP BY time, y)
         |SELECT time, strftime(time, '%Y%m%d%H') || '_Temp.asc' AS file_name,
         | $hdr || string_agg(rowstr, chr(10) ORDER BY y DESC) AS content
         |FROM r GROUP BY time ORDER BY time""".stripMargin
    },

    "g30_reproject_wgs84" -> {
      // pipeline-check oracle: the same metadata-sized mapping the
      // operator broadcasts, as a VALUES table (CrsSpec pins the
      // projection math itself against golden round-trips)
      val (mapping, _, _) = graft.operators.Reproject.wgs84Mapping(
        glXa, glYa, graft.functions.Crs.GlanceNA)
      val values = mapping.map { case (lon, lat, jy, jx) =>
        s"(${dlit(lon)}, ${dlit(lat)}, $jy, $jx)"
      }.mkString(",\n  ")
      s"""WITH $grid,
         |m(lon, lat, jy, jx) AS (VALUES
         |  $values)
         |SELECT g.time, m.lat, m.lon, g.t2m
         |FROM grid g JOIN m ON g.jy = m.jy AND g.jx = m.jx
         |ORDER BY 1, 2, 3""".stripMargin
    },

    "g28_cmr_granule_bbox" -> {
      val values = cmrEntries.map(e => s"('$e')").mkString(",\n  ")
      def ringNums = "list_transform(string_split(ring, ' '), x -> CAST(x AS DOUBLE))"
      s"""WITH e(entry) AS (VALUES
         |  $values),
         |g AS (SELECT
         |  json_extract_string(entry, '$$.producer_granule_id') AS granule_id,
         |  json_extract_string(entry, '$$.boxes[0]') AS box,
         |  json_extract_string(entry, '$$.polygons[0][0]') AS ring,
         |  json_extract_string(entry, '$$.time_start') AS ts0,
         |  json_extract_string(entry, '$$.time_end') AS ts1
         | FROM e),
         |b AS (SELECT granule_id, ts0, ts1,
         |  CASE WHEN box IS NOT NULL
         |   THEN list_transform(string_split(box, ' '), x -> CAST(x AS DOUBLE))
         |   ELSE [list_min(list_filter($ringNums, (x, i) -> i % 2 = 1)),
         |         list_min(list_filter($ringNums, (x, i) -> i % 2 = 0)),
         |         list_max(list_filter($ringNums, (x, i) -> i % 2 = 1)),
         |         list_max(list_filter($ringNums, (x, i) -> i % 2 = 0))]
         |  END AS bbox
         | FROM g)
         |SELECT granule_id, bbox[2] AS west, bbox[1] AS south,
         | bbox[4] AS east, bbox[3] AS north,
         | strptime(ts0, '%Y-%m-%dT%H:%M:%S.%fZ') AS start_date,
         | strptime(ts1, '%Y-%m-%dT%H:%M:%S.%fZ') AS end_date
         |FROM b ORDER BY granule_id""".stripMargin
    },

    "q14_above_avg_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |       avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg
        |      FROM orders)
        |WHERE o_totalprice > cust_avg ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q15_rollup_revenue" ->
      """SELECT coalesce(r_name, 'ALL') AS r_name, coalesce(n_name, 'ALL') AS n_name,
        | round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name) ORDER BY r_name, n_name""".stripMargin,

    "q16_asof_click_before_purchase" ->
      """WITH purchases AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |clicks AS (SELECT user_id, ts AS click_ts, event_id AS click_id
        |           FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.ts, c.click_id, c.click_ts
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts >= c.click_ts
        |ORDER BY p.event_id""".stripMargin,

    "n01_exact_dedup" ->
      s"""WITH $plantedDocsCte
         |SELECT doc_id, n_chars FROM pd
         |QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
         |ORDER BY doc_id""".stripMargin,

    "n02_dup_groups" ->
      s"""WITH $plantedDocsCte
         |SELECT md5(text) AS digest, min(doc_id) AS keep_id, count(*) AS n_copies
         |FROM pd GROUP BY text HAVING count(*) > 1 ORDER BY digest""".stripMargin,

    "n03_token_counts" ->
      """SELECT doc_id,
        | CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
        | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_subwords
        |FROM documents ORDER BY doc_id""".stripMargin,

    "n04_quality" ->
      """WITH f AS (
        | SELECT doc_id,
        |  length(text) AS n_chars,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
        |  length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
        |  length(regexp_replace(text, '[^.,;:!?''"()\[\]{}-]', '', 'g')) AS n_punct,
        |  len(regexp_extract_all(text, '(?i)\b(the|and|of|to|in|is|that|with|for|it)\b')) AS en_hits
        | FROM documents)
        |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, CAST(n_tokens AS BIGINT) AS n_tokens,
        | round(n_alpha * 1.0 / greatest(n_chars, 1), 6) AS alpha_ratio,
        | round(n_punct * 1.0 / greatest(n_chars, 1), 6) AS punct_ratio,
        | round(en_hits * 1.0 / greatest(n_tokens, 1), 6) AS stopword_ratio,
        | (CASE WHEN n_chars BETWEEN 100 AND 10000 THEN 1.0 ELSE 0.0 END +
        |  CASE WHEN n_alpha * 1.0 / greatest(n_chars, 1) >= 0.6 THEN 1.0 ELSE 0.0 END +
        |  CASE WHEN n_punct * 1.0 / greatest(n_chars, 1) <= 0.1 THEN 1.0 ELSE 0.0 END +
        |  CASE WHEN en_hits * 1.0 / greatest(n_tokens, 1) >= 0.01 THEN 1.0 ELSE 0.0 END) / 4.0
        |   AS quality_score
        |FROM f ORDER BY doc_id""".stripMargin,

    "n05_langid" -> {
      val hits = Map(
        "de" -> "(?i)\\b(der|die|das|und|ist|nicht|ein|mit|von|zu)\\b",
        "en" -> "(?i)\\b(the|and|of|to|in|is|that|with|for|it)\\b",
        "es" -> "(?i)\\b(el|la|los|y|es|en|que|por|una|con)\\b",
        "fr" -> "(?i)\\b(le|la|les|et|est|dans|pour|que|une|des)\\b")
      s"""WITH h AS (
         | SELECT doc_id,
         |  len(regexp_extract_all(text, '${hits("de")}')) AS h_de,
         |  len(regexp_extract_all(text, '${hits("en")}')) AS h_en,
         |  len(regexp_extract_all(text, '${hits("es")}')) AS h_es,
         |  len(regexp_extract_all(text, '${hits("fr")}')) AS h_fr
         | FROM documents)
         |SELECT doc_id,
         | CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
         |      WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
         |      WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
         |      WHEN h_es >= h_fr THEN 'es' ELSE 'fr' END AS lang_guess
         |FROM h ORDER BY doc_id""".stripMargin
    },

    "n06_fingerprints" ->
      """SELECT doc_id,
        | md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS md5_fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "n07_fingerprints_rolling" ->
      // chars via unicode() codepoints == Java UTF-16 units for the
      // BMP text the fixtures carry; empty strings filtered (their
      // hash is the 0 seed on both sides)
      """SELECT doc_id,
        | CAST(list_reduce(
        |   list_prepend(CAST(0 AS HUGEINT),
        |     list_transform(
        |       list_filter(string_split_regex(
        |         regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ''),
        |         ch -> ch <> ''),
        |       ch -> CAST(unicode(ch) AS HUGEINT))),
        |   (acc, c) -> (acc * 131 + c) % 2305843009213693951) AS BIGINT)
        |   AS rolling_fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "n08_knn_bruteforce" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb
        |           FROM embeddings WHERE vec_id < 5),
        |scored AS (
        | SELECT q.query_id, e.vec_id,
        |  list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_emb) AS cos_raw,
        |  row_number() OVER (PARTITION BY q.query_id
        |    ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_emb) DESC, e.vec_id) AS rnk
        | FROM embeddings e, q WHERE e.vec_id <> q.query_id)
        |SELECT query_id, vec_id, round(cos_raw, 6) AS cos, rnk
        |FROM scored WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin,

    // unrolled greedy replay (shared builder): identical IEEE
    // expressions, identical argmax; n139 narrows the candidate CTE
    // to the exact top-20 shortlist first
    "n138_mmr_select" -> mmrOracleSql(None),
    "n139_mmr_shortlist" -> mmrOracleSql(Some(20)),

    // margins replay exactly: the neighborhood sums fold in rank order
    // (list(cos ORDER BY rank) reduced sequentially = Spark's sorted
    // collect_list fold) and the margin is one pinned expression
    "n140_margin_mining" ->
      """WITH a AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |           WHERE vec_id % 2 = 0 AND vec_id < 400),
        |b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |      WHERE vec_id % 2 = 1),
        |s AS (SELECT a.vec_id AS src_id, b.vec_id AS dst_id,
        |       list_cosine_similarity(a.v, b.v) AS cos FROM a, b),
        |r AS (SELECT *,
        |      row_number() OVER (PARTITION BY src_id ORDER BY cos DESC, dst_id) AS rkx,
        |      row_number() OVER (PARTITION BY dst_id ORDER BY cos DESC, src_id) AS rky
        |      FROM s),
        |sx AS (SELECT src_id,
        |        list_reduce(list_prepend(0.0, list(cos ORDER BY rkx)),
        |          (acc, c) -> acc + c) AS sumx
        |       FROM r WHERE rkx <= 4 GROUP BY src_id),
        |sy AS (SELECT dst_id,
        |        list_reduce(list_prepend(0.0, list(cos ORDER BY rky)),
        |          (acc, c) -> acc + c) AS sumy
        |       FROM r WHERE rky <= 4 GROUP BY dst_id),
        |m AS (SELECT r.src_id, r.dst_id, r.cos,
        |       8.0 * r.cos / (sx.sumx + sy.sumy) AS margin
        |      FROM r JOIN sx USING (src_id) JOIN sy USING (dst_id)
        |      WHERE r.rkx <= 4)
        |SELECT src_id, dst_id, round(cos, 6) AS cos, round(margin, 6) AS margin,
        | CAST(row_number() OVER (PARTITION BY src_id
        |   ORDER BY margin DESC, dst_id) AS BIGINT) AS mrank
        |FROM m ORDER BY src_id, mrank""".stripMargin,

    // the n140 margin replay with the pair relation narrowed to the
    // n09 sign-LSH bucket co-occurrences — the candidate CTE is the
    // ONLY difference, proving the shortlist composition runs the
    // identical downstream arithmetic
    "n151_margin_shortlist" ->
      s"""WITH ${signLshBkCtes(planes = 10, tables = 6, dim = 64)},
         |cand AS (SELECT DISTINCT qa.vec_id AS src_id, qb.vec_id AS dst_id
         | FROM bk qa JOIN bk qb ON qa.t = qb.t AND qa.bucket = qb.bucket
         | WHERE qa.vec_id % 2 = 0 AND qa.vec_id < 400 AND qb.vec_id % 2 = 1
         |   AND qa.vec_id <> qb.vec_id),
         |s AS (SELECT cand.src_id, cand.dst_id,
         |  list_cosine_similarity(ae.emb, be.emb) AS cos
         | FROM cand JOIN e ae ON ae.vec_id = cand.src_id
         |           JOIN e be ON be.vec_id = cand.dst_id),
         |r AS (SELECT *,
         |      row_number() OVER (PARTITION BY src_id ORDER BY cos DESC, dst_id) AS rkx,
         |      row_number() OVER (PARTITION BY dst_id ORDER BY cos DESC, src_id) AS rky
         |      FROM s),
         |sx AS (SELECT src_id,
         |        list_reduce(list_prepend(0.0, list(cos ORDER BY rkx)),
         |          (acc, c) -> acc + c) AS sumx
         |       FROM r WHERE rkx <= 4 GROUP BY src_id),
         |sy AS (SELECT dst_id,
         |        list_reduce(list_prepend(0.0, list(cos ORDER BY rky)),
         |          (acc, c) -> acc + c) AS sumy
         |       FROM r WHERE rky <= 4 GROUP BY dst_id),
         |m AS (SELECT r.src_id, r.dst_id, r.cos,
         |       8.0 * r.cos / (sx.sumx + sy.sumy) AS margin
         |      FROM r JOIN sx USING (src_id) JOIN sy USING (dst_id)
         |      WHERE r.rkx <= 4)
         |SELECT src_id, dst_id, round(cos, 6) AS cos, round(margin, 6) AS margin,
         | CAST(row_number() OVER (PARTITION BY src_id
         |   ORDER BY margin DESC, dst_id) AS BIGINT) AS mrank
         |FROM m ORDER BY src_id, mrank""".stripMargin,

    "n137_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb
        |           FROM embeddings WHERE vec_id < 3),
        |scored AS (
        | SELECT q.query_id, e.vec_id,
        |  list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_emb) AS cos_raw,
        |  row_number() OVER (PARTITION BY q.query_id
        |    ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_emb) DESC, e.vec_id) AS rnk
        | FROM embeddings e, q
        | WHERE e.vec_id <> q.query_id AND e.vec_id <> q.query_id + 1)
        |SELECT query_id, vec_id, round(cos_raw, 6) AS cos, rnk
        |FROM scored WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    "n22_contamination" -> {
      val thr = graft.ops.Sampling.hexThreshold(0.1)
      val grams = """list_distinct(list_transform(
        | generate_series(1, len(ws) - 4),
        | i -> array_to_string(ws[i:i+4], ' ')))""".stripMargin.replace("\n", "")
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |tg AS (SELECT doc_id, unnest($grams) AS gram FROM w
         |       WHERE NOT (substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$thr')),
         |eg AS (SELECT DISTINCT unnest($grams) AS gram FROM w
         |       WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$thr')
         |SELECT tg.doc_id, count(*) AS n_grams, count(eg.gram) AS n_shared,
         | CAST(count(eg.gram) AS DOUBLE) / count(*) AS contamination
         |FROM tg LEFT JOIN eg ON tg.gram = eg.gram
         |GROUP BY tg.doc_id ORDER BY tg.doc_id""".stripMargin
    },

    "n167_benchmark_decontamination" -> {
      // n22's overlap replay VERBATIM: publish-then-probe with the
      // bloom pre-prune must land on the recompute-both-sides answer
      // (no false negatives + semi-join re-check), so the published
      // index and the sidecar cannot appear in a correct oracle
      val thr = graft.ops.Sampling.hexThreshold(0.1)
      val grams = """list_distinct(list_transform(
        | generate_series(1, len(ws) - 4),
        | i -> array_to_string(ws[i:i+4], ' ')))""".stripMargin.replace("\n", "")
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |tg AS (SELECT doc_id, unnest($grams) AS gram FROM w
         |       WHERE NOT (substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$thr')),
         |eg AS (SELECT DISTINCT unnest($grams) AS gram FROM w
         |       WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$thr')
         |SELECT tg.doc_id, count(*) AS n_grams, count(eg.gram) AS n_shared,
         | CAST(count(eg.gram) AS DOUBLE) / count(*) AS contamination
         |FROM tg LEFT JOIN eg ON tg.gram = eg.gram
         |GROUP BY tg.doc_id ORDER BY tg.doc_id""".stripMargin
    },

    "n168_decontaminate" -> {
      // survivors at maxContamination = 0: every train doc with NO
      // shared gram — including the gram-less short docs the stats
      // relation never lists (they cannot be flagged)
      val thr = graft.ops.Sampling.hexThreshold(0.1)
      val grams = """list_distinct(list_transform(
        | generate_series(1, len(ws) - 4),
        | i -> array_to_string(ws[i:i+4], ' ')))""".stripMargin.replace("\n", "")
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |tg AS (SELECT doc_id, unnest($grams) AS gram FROM w
         |       WHERE NOT (substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$thr')),
         |eg AS (SELECT DISTINCT unnest($grams) AS gram FROM w
         |       WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$thr'),
         |fl AS (SELECT DISTINCT tg.doc_id FROM tg JOIN eg USING (gram))
         |SELECT d.doc_id, d.source FROM documents d
         |WHERE NOT (substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < '$thr')
         |  AND d.doc_id NOT IN (SELECT doc_id FROM fl)
         |ORDER BY d.doc_id""".stripMargin
    },

    "n169_card_state" ->
      // the from-scratch state of the SURVIVORS (doc_id % 89 <> 0):
      // per-lang doc/token counts plus the fixed-edge token histogram
      // (lo 0, hi 4096, 256 bins -> width (4096 + 256) // 256 = 17;
      // the VALUE clamps into [lo, hi] before binning) — merge and
      // retraction are keyed addition and zero is the absent row, so
      // the maintained state must land here exactly
      """WITH f AS (SELECT lang, CASE WHEN length(trim(text)) = 0 THEN 0
        |    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS tk
        |  FROM documents WHERE doc_id % 89 <> 0),
        |ld AS (SELECT 'lang_docs' AS kind, lang AS key,
        |       CAST(count(*) AS BIGINT) AS value FROM f GROUP BY lang),
        |lt AS (SELECT 'lang_tokens' AS kind, lang AS key,
        |       CAST(sum(tk) AS BIGINT) AS value FROM f GROUP BY lang),
        |tb AS (SELECT 'tok_bin' AS kind,
        |       CAST(least(greatest(tk, 0), 4096) // 17 AS VARCHAR) AS key,
        |       CAST(count(*) AS BIGINT) AS value FROM f GROUP BY 2)
        |SELECT kind, key, value FROM
        | (SELECT * FROM ld UNION ALL SELECT * FROM lt UNION ALL SELECT * FROM tb)
        |WHERE value <> 0
        |ORDER BY kind, key""".stripMargin,

    "n170_card_render" ->
      // the rendered card over the survivors: exact corpus totals and
      // language mix, p50 token bracket = the fixed-width bin holding
      // rank ceil(0.5 n) (cumulative bin counts, the n43 bracket
      // arithmetic), all values DOUBLE
      """WITH f AS (SELECT lang, CASE WHEN length(trim(text)) = 0 THEN 0
        |    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS tk
        |  FROM documents WHERE doc_id % 89 <> 0),
        |tb AS (SELECT least(greatest(tk, 0), 4096) // 17 AS bin,
        |       count(*) AS cnt FROM f GROUP BY 1),
        |cum AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum FROM tb),
        |nn AS (SELECT count(*) AS n FROM f),
        |r AS (SELECT greatest(CAST(ceil(0.5 * n) AS BIGINT), 1) AS rk FROM nn),
        |b AS (SELECT min(bin) AS bin FROM cum, r WHERE cum >= r.rk)
        |SELECT section, key, value FROM (
        | SELECT 'corpus' AS section, 'n_docs' AS key,
        |        CAST(count(*) AS DOUBLE) AS value FROM f
        | UNION ALL SELECT 'corpus', 'n_tokens', CAST(sum(tk) AS DOUBLE) FROM f
        | UNION ALL SELECT 'lang', lang, CAST(count(*) AS DOUBLE) FROM f GROUP BY lang
        | UNION ALL SELECT 'quality', 'p50_tokens_lo',
        |        CAST(bin * 17 AS DOUBLE) FROM b
        | UNION ALL SELECT 'quality', 'p50_tokens_hi',
        |        CAST(least(4096, (bin + 1) * 17 - 1) AS DOUBLE) FROM b)
        |ORDER BY section, key""".stripMargin,

    "n15_sql_surface" -> {
      // FNV-1a-64 over UTF-16 units (two byte steps per char) replayed
      // in HUGEINT mod 2^64; simhash = per-bit majority votes over
      // whitespace-token hashes; shingle count = distinct FNV of char
      // 5-grams; rolling hash as in n07 but over the raw text
      s"""WITH hs AS (SELECT doc_id, text,
         |  list_transform(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''),
         |    tok -> ${fnvSql("tok")}) AS hl
         | FROM documents),
         |v AS (SELECT doc_id,
         |  list_sum(list_transform(generate_series(0, 63), b ->
         |    CASE WHEN 2 * len(list_filter(hl, h -> (h >> b) % 2 = 1)) > len(hl)
         |         THEN CAST(1 AS HUGEINT) << b ELSE CAST(0 AS HUGEINT) END)) AS shu,
         |  CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
         |    list_transform(list_filter(string_split_regex(text, ''), ch -> ch <> ''),
         |      ch -> CAST(unicode(ch) AS HUGEINT))),
         |    (acc, c) -> (acc * 131 + c) % 2305843009213693951) AS BIGINT) AS rh,
         |  len(list_distinct(list_transform(
         |    generate_series(1, greatest(len(text) - 4, 1)),
         |    j -> ${fnvSql("substr(text, j, 5)")}))) AS ns,
         |  len(list_distinct(list_transform(
         |    generate_series(1, greatest(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) - 2, 1)),
         |    j -> ${fnvSql("array_to_string(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')[j:j+2], ' ')")}))) AS nw
         | FROM hs)
         |SELECT doc_id,
         | CAST(CASE WHEN shu >= CAST(1 AS HUGEINT) << 63
         |           THEN shu - (CAST(1 AS HUGEINT) << 64) ELSE shu END AS BIGINT) AS sh,
         | rh, ns AS n_shingles, nw AS n_word_grams
         |FROM v ORDER BY doc_id""".stripMargin
    },

    "n19_deterministic_sample" -> {
      val thr = graft.ops.Sampling.hexThreshold(0.3)
      s"""SELECT doc_id, lang, n_chars FROM documents
         |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$thr'
         |ORDER BY doc_id""".stripMargin
    },

    "n65_bm25_search" ->
      s"""WITH ${bm25Ctes(
           """(CAST(1 AS BIGINT), 'spark join'),
             |  (CAST(2 AS BIGINT), 'window agg row'),
             |  (CAST(3 AS BIGINT), 'stream batch data'),
             |  (CAST(4 AS BIGINT), 'quantum')""".stripMargin)}
         |SELECT query_id, doc_id,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY score DESC, doc_id) AS BIGINT) AS rnk,
         |  n_terms, round(score, 6) AS score
         |FROM pd QUALIFY rnk <= 10 ORDER BY query_id, rnk""".stripMargin,

    "n171_bm25_index" ->
      // n65's from-text replay over the SURVIVORS (doc_id % 101 <> 0):
      // the maintained postings (old build + slice append + takedown
      // retraction) must produce exactly the search the surviving text
      // produces — the old/slice split and the index itself cannot
      // appear in a correct answer
      s"""WITH ${bm25Ctes(
           """(CAST(1 AS BIGINT), 'spark join'),
             |  (CAST(2 AS BIGINT), 'window agg row'),
             |  (CAST(3 AS BIGINT), 'stream batch data'),
             |  (CAST(4 AS BIGINT), 'quantum')""".stripMargin,
           where = " WHERE doc_id % 101 <> 0")}
         |SELECT query_id, doc_id,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY score DESC, doc_id) AS BIGINT) AS rnk,
         |  n_terms, round(score, 6) AS score
         |FROM pd QUALIFY rnk <= 10 ORDER BY query_id, rnk""".stripMargin,

    "q35_exists_surface" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderstatus = 'O')
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'F'
        |                    AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    // DuckDB zips parallel select-list unnests, giving (index, element)
    // pairs — the ordinality twin of Spark's posexplode
    "q36_posexplode" ->
      """SELECT vec_id,
        |  unnest(generate_series(0, len(embedding) - 1)) AS pos,
        |  unnest(embedding) AS val
        |FROM embeddings WHERE vec_id < 50
        |ORDER BY vec_id, pos""".stripMargin,

    "q39_ignore_nulls" ->
      // DuckDB places IGNORE NULLS inside the call parens; Spark after
      // them — same SQL:2011 semantics either way
      """SELECT event_id, user_id, ts,
        | last_value(CASE WHEN event_type <> 'click' THEN value END
        |   IGNORE NULLS) OVER (PARTITION BY user_id
        |     ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |   AS last_nonclick_value
        |FROM events
        |ORDER BY user_id, ts, event_id""".stripMargin,

    "q40_rank_stats" ->
      """SELECT o_orderkey, o_orderpriority,
        | round(percent_rank() OVER (PARTITION BY o_orderpriority
        |   ORDER BY o_totalprice, o_orderkey), 6) AS pr,
        | round(cume_dist() OVER (PARTITION BY o_orderpriority
        |   ORDER BY o_totalprice, o_orderkey), 6) AS cd
        |FROM orders
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    "q37_lateral_join" ->
      """SELECT c_custkey, c_name, o.n_orders, o.max_price
        |FROM customer c,
        |LATERAL (SELECT count(*) AS n_orders,
        |                max(o_totalprice) AS max_price
        |         FROM orders WHERE o_custkey = c_custkey) o
        |WHERE o.n_orders >= 5
        |ORDER BY c_custkey""".stripMargin,

    "q38_filter_clause" ->
      """SELECT source,
        | count(*) AS n_docs,
        | count(*) FILTER (WHERE lang = 'en') AS n_en,
        | CAST(sum(n_chars) FILTER (WHERE lang = 'en') AS BIGINT) AS chars_en,
        | count(*) FILTER (WHERE n_chars >= 500) AS n_long
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q34_scalar_subquery" ->
      """SELECT o_orderkey, o_custkey,
        |  round(o_totalprice / (SELECT max(o2.o_totalprice)
        |                        FROM orders o2
        |                        WHERE o2.o_custkey = o.o_custkey), 6)
        |    AS price_share
        |FROM orders o
        |ORDER BY o_orderkey""".stripMargin,

    "q33_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
        |  coalesce(l_linestatus, 'ALL') AS lstatus,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY rflag, lstatus""".stripMargin,

    "n71_data_card" ->
      // section-wise UNION ALL over one slim projection; token counts
      // via the n03 CASE, dup mass over md5 digests, median via the
      // q21 quantile_cont replay; every value exact in DOUBLE
      """WITH pd AS (
        | SELECT doc_id, text, lang FROM documents
        | UNION ALL
        | SELECT doc_id + 1000000 AS doc_id, text, lang
        | FROM documents WHERE doc_id < 3),
        |b AS (SELECT doc_id, lang, md5(text) AS dg,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS tk
        | FROM pd)
        |SELECT * FROM (
        | SELECT 'corpus' AS section, 'n_docs' AS key,
        |   CAST(count(*) AS DOUBLE) AS value FROM b
        | UNION ALL
        | SELECT 'corpus', 'n_tokens', CAST(sum(tk) AS DOUBLE) FROM b
        | UNION ALL
        | SELECT 'lang', lang, CAST(count(*) AS DOUBLE) FROM b GROUP BY lang
        | UNION ALL
        | SELECT 'dup', 'n_dup_docs', CAST(coalesce(sum(n), 0) AS DOUBLE)
        | FROM (SELECT count(*) AS n FROM b GROUP BY dg HAVING count(*) > 1)
        | UNION ALL
        | SELECT 'quality', 'p50_tokens', round(quantile_cont(tk, 0.5), 6) FROM b)
        |ORDER BY section, key""".stripMargin,

    "n70_feature_scaling" ->
      // moments in HUGEINT == Spark's longs (all fit 63 bits); mean,
      // z, mm written in the same expression-tree order as
      // scaleFeatures; degenerate groups -> NULL on both engines
      """WITH v AS (SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS lineno,
        |    l_returnflag, CAST(l_quantity AS BIGINT) AS qty FROM lineitem),
        |st AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(qty) AS BIGINT) AS s, CAST(sum(qty * qty) AS BIGINT) AS sq,
        |    min(qty) AS mn, max(qty) AS mx
        |  FROM v GROUP BY l_returnflag)
        |SELECT l_orderkey, lineno, l_returnflag, qty,
        |  round(CASE WHEN n * sq - s * s > 0 THEN
        |    (CAST(qty AS DOUBLE) - CAST(s AS DOUBLE) / n) /
        |    sqrt(CAST(n * sq - s * s AS DOUBLE) / (n * n)) END, 6) AS z,
        |  round(CASE WHEN mx > mn THEN
        |    CAST(qty - mn AS DOUBLE) / (mx - mn) END, 6) AS mm
        |FROM v JOIN st USING (l_returnflag)
        |ORDER BY l_orderkey, lineno, l_returnflag, qty""".stripMargin,

    "n69_hybrid_rrf" ->
      // BM25 CTEs (shared generator, k=20 cut) + the n08 cosine-rank
      // replay + RRF: one division per present rank, fixed two-term
      // sum order, USING-join coalesced keys
      s"""WITH ${bm25Ctes(
           """(CAST(1 AS BIGINT), 'spark join'),
             |  (CAST(2 AS BIGINT), 'window agg row')""".stripMargin)},
         |ttop AS (SELECT query_id, doc_id,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS BIGINT) AS rt
         |  FROM pd QUALIFY rt <= 20),
         |vq AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb
         |       FROM embeddings WHERE vec_id IN (1, 2)),
         |vs AS (SELECT q.query_id, e.vec_id AS doc_id,
         |    CAST(row_number() OVER (PARTITION BY q.query_id
         |      ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_emb) DESC,
         |        e.vec_id) AS BIGINT) AS rv
         |  FROM embeddings e, vq q WHERE e.vec_id <> q.query_id),
         |vtop AS (SELECT query_id, doc_id, rv FROM vs WHERE rv <= 20),
         |f AS (SELECT query_id, doc_id,
         |    coalesce(1e0 / (60 + rt), 0e0) + coalesce(1e0 / (60 + rv), 0e0) AS rrf,
         |    CAST(coalesce(rt, 0) AS BIGINT) AS rank_text,
         |    CAST(coalesce(rv, 0) AS BIGINT) AS rank_vec
         |  FROM ttop FULL OUTER JOIN vtop USING (query_id, doc_id))
         |SELECT query_id, doc_id,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY rrf DESC, doc_id) AS BIGINT) AS rnk,
         |  rank_text, rank_vec, round(rrf, 6) AS rrf
         |FROM f QUALIFY rnk <= 10 ORDER BY query_id, rnk""".stripMargin,

    "n68_dsir_weights" ->
      // n51's bigram-code machinery: one-pass target+raw counts, ln of
      // integer counts, bigram-ordered fold; the smoothing constant
      // factors out as n_bigrams * (ln(tot_t+V) - ln(tot_r+V))
      """WITH g AS (SELECT doc_id, text, lang,
        |  unnest(generate_series(1, strlen(text) - 1)) AS pos
        | FROM documents WHERE strlen(text) >= 2),
        |g2 AS (SELECT doc_id, lang,
        |  unicode(substr(text, pos, 1)) * 65536 + unicode(substr(text, pos + 1, 1)) AS bigram
        | FROM g),
        |dg AS (SELECT doc_id, lang, bigram, CAST(count(*) AS BIGINT) AS occ
        |       FROM g2 GROUP BY 1, 2, 3),
        |counts AS (SELECT bigram, CAST(sum(occ) AS BIGINT) AS cnt_r,
        |    CAST(sum(CASE WHEN lang = 'en' THEN occ ELSE 0 END) AS BIGINT) AS cnt_t
        |  FROM dg GROUP BY bigram),
        |tot AS (SELECT CAST(sum(cnt_r) AS BIGINT) AS tot_r,
        |    CAST(sum(cnt_t) AS BIGINT) AS tot_t,
        |    CAST(count(*) AS BIGINT) AS vocab FROM counts),
        |perdoc AS (SELECT doc_id, CAST(sum(occ) AS BIGINT) AS n_bigrams,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(occ * (ln(cnt_t + 1) - ln(cnt_r + 1)) ORDER BY bigram)),
        |      (acc, x) -> acc + x) AS sum_ratio
        |  FROM dg JOIN counts USING (bigram) GROUP BY doc_id)
        |SELECT doc_id, n_bigrams,
        |  round(sum_ratio - n_bigrams * (ln(tot_t + vocab) - ln(tot_r + vocab)), 6)
        |    AS log_weight
        |FROM perdoc, tot ORDER BY doc_id""".stripMargin,

    "n66_shuffle_order" ->
      // fnv64 -> fmix64 through the shared HUGEINT chain, masked to 62
      // bits (signed/unsigned order agreement), shard = low 3 bits
      // (power-of-two modulus), position = within-shard row_number
      s"""WITH h0 AS (SELECT doc_id,
         |    ${fnvSql("CAST(doc_id AS VARCHAR)")} AS x FROM documents),
         |f1 AS (SELECT doc_id, xor(x, x >> 33) AS v1 FROM h0),
         |f2 AS (SELECT doc_id, xor(v2, v2 >> 33) AS v3
         |       FROM (SELECT doc_id, ${mulC("v1", c1, c1lo)} AS v2 FROM f1)),
         |hk AS (SELECT doc_id,
         |    CAST(xor(v4, v4 >> 33) & 4611686018427387903 AS BIGINT) AS hkey
         |  FROM (SELECT doc_id, ${mulC("v3", c2, c2lo)} AS v4 FROM f2))
         |SELECT doc_id, hkey % 8 AS shard,
         |  CAST(row_number() OVER (PARTITION BY hkey % 8
         |    ORDER BY hkey, doc_id) AS BIGINT) AS pos
         |FROM hk ORDER BY shard, pos""".stripMargin,

    "n67_split_leakage" -> {
      val t1 = graft.ops.Sampling.hexThreshold(0.8)
      val t2 = graft.ops.Sampling.hexThreshold(0.9)
      s"""WITH $plantedDocsCte,
         |sp AS (SELECT doc_id, md5(text) AS dg,
         |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$t1' THEN 'train'
         |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$t2' THEN 'valid'
         |       ELSE 'test' END AS split
         | FROM pd),
         |c AS (SELECT dg, split, count(*) AS n FROM sp GROUP BY 1, 2),
         |pairs AS (
         |  SELECT a.split AS split_a, b.split AS split_b, a.n * b.n AS pairs
         |  FROM c a JOIN c b ON a.dg = b.dg AND a.split < b.split
         |  UNION ALL
         |  SELECT split, split, (n * (n - 1)) // 2 FROM c)
         |SELECT split_a, split_b, CAST(sum(pairs) AS BIGINT) AS n_leaked_pairs
         |FROM pairs GROUP BY 1, 2 HAVING sum(pairs) > 0
         |ORDER BY split_a, split_b""".stripMargin
    },

    "n18_profile" -> {
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      cols.map(c =>
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           | count(*) - count($c) AS n_nulls,
           | count(DISTINCT $c) AS n_distinct FROM documents""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    },

    "n14_embedding_neardups" ->
      // replays the planted perturbation (plantedEmbCte), then the
      // exact all-pairs truth over fixture + planted rows
      s"""WITH $plantedEmbCte
         |SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
         | round(list_cosine_similarity(a.emb, b.emb), 6) AS cos
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE list_cosine_similarity(a.emb, b.emb) >= 0.8
         |ORDER BY vec_id_a, vec_id_b""".stripMargin,

    "n23_embedding_dedup" ->
      s"""WITH $plantedEmbCte,
         |dups AS (SELECT DISTINCT b.vec_id
         | FROM e a JOIN e b ON a.vec_id < b.vec_id
         | WHERE list_cosine_similarity(a.emb, b.emb) >= 0.8)
         |SELECT vec_id FROM allv
         |WHERE vec_id NOT IN (SELECT vec_id FROM dups)
         |ORDER BY vec_id""".stripMargin,

    "n24_media_resize" ->
      // real header dims (w = 16 + id % 1000, h = 16 + (id/7) % 1000)
      // through the resize formula, mirroring resizePlan's expression
      // order exactly: round(dim * least(1, 256/greatest(w, h)))
      """WITH img AS (SELECT doc_id AS media_id,
        |  16 + doc_id % 1000 AS w, 16 + (doc_id // 7) % 1000 AS h
        | FROM documents WHERE doc_id % 3 = 0)
        |SELECT media_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        | CAST(round(w * least(1e0, 256e0 / greatest(w, h))) AS BIGINT) AS target_w,
        | CAST(round(h * least(1e0, 256e0 / greatest(w, h))) AS BIGINT) AS target_h
        |FROM img ORDER BY media_id""".stripMargin,

    "n25_media_frames" ->
      // n_frames = the REAL stsz sample_count the fixture wrote
      """WITH vid AS (SELECT doc_id AS media_id,
        |  1 + doc_id % 300 AS n_frames
        | FROM documents WHERE doc_id % 3 = 2)
        |SELECT media_id, CAST(n_frames AS BIGINT) AS n_frames,
        | CAST(unnest(generate_series(0, n_frames - 1, 10)) AS BIGINT) AS frame_idx
        |FROM vid ORDER BY media_id, frame_idx""".stripMargin,

    "n64_slice_diff" ->
      // n49's fixture; md5-keyed first-of-digest window + corpus
      // membership, partitioned counts — all BIGINT
      """WITH existing AS (
        | SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
        |incoming AS (
        | SELECT doc_id, text, source FROM documents WHERE doc_id % 2 = 1
        | UNION ALL SELECT doc_id + 2000001, text, source
        |   FROM documents WHERE doc_id IN (0, 2, 4)
        | UNION ALL SELECT 2000007, text, source
        |   FROM documents WHERE doc_id = 1),
        |m AS (SELECT source, doc_id, md5(text) AS dg,
        |        row_number() OVER (PARTITION BY md5(text)
        |                           ORDER BY doc_id, source) AS rn
        |      FROM incoming),
        |ed AS (SELECT DISTINCT md5(text) AS dg FROM existing),
        |j AS (SELECT m.source, m.rn, ed.dg IS NOT NULL AS inc
        |      FROM m LEFT JOIN ed ON m.dg = ed.dg)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_incoming,
        |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_within_dup,
        |  CAST(sum(CASE WHEN rn = 1 AND inc THEN 1 ELSE 0 END) AS BIGINT) AS n_cross_dup,
        |  CAST(sum(CASE WHEN rn = 1 AND NOT inc THEN 1 ELSE 0 END) AS BIGINT) AS n_new
        |FROM j GROUP BY source ORDER BY source""".stripMargin,

    // the bloom path must produce EXACTLY the plain anti-join's rows
    // (no false negatives + exact recheck), so n49's oracle serves
    // verbatim
    "n74_bloom_dedup" ->
      """WITH existing AS (
        | SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
        |incoming AS (
        | SELECT doc_id, text, n_chars FROM documents WHERE doc_id % 2 = 1
        | UNION ALL SELECT doc_id + 2000001, text, n_chars
        |   FROM documents WHERE doc_id IN (0, 2, 4)
        | UNION ALL SELECT 2000007, text, n_chars
        |   FROM documents WHERE doc_id = 1),
        |deduped AS (
        | SELECT doc_id, text, n_chars FROM incoming
        | QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1)
        |SELECT doc_id, n_chars FROM deduped
        |WHERE text NOT IN (SELECT text FROM existing)
        |ORDER BY doc_id""".stripMargin,

    "n49_incremental_dedup" ->
      // same text-equality replay as n01 (md5 collision risk accepted)
      """WITH existing AS (
        | SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
        |incoming AS (
        | SELECT doc_id, text, n_chars FROM documents WHERE doc_id % 2 = 1
        | UNION ALL SELECT doc_id + 2000001, text, n_chars
        |   FROM documents WHERE doc_id IN (0, 2, 4)
        | UNION ALL SELECT 2000007, text, n_chars
        |   FROM documents WHERE doc_id = 1),
        |deduped AS (
        | SELECT doc_id, text, n_chars FROM incoming
        | QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1)
        |SELECT doc_id, n_chars FROM deduped
        |WHERE text NOT IN (SELECT text FROM existing)
        |ORDER BY doc_id""".stripMargin,

    // batch minhash banding replayed over the old∪new union (the
    // spec-pinned law: under the ingest-order id invariant the
    // incremental result equals batch minhashDedup restricted to
    // incoming rows, so the oracle IS the batch replay — every victim
    // is a doc_id_b of some banded+verified pair)
    "n150_incremental_neardup" ->
      s"""WITH u AS (
         | SELECT doc_id, text, n_chars FROM documents
         | UNION ALL SELECT doc_id + 3000000, text || ' tail bit', n_chars
         |   FROM documents WHERE doc_id IN (0, 2, 4)
         | UNION ALL SELECT 3000007, text || ' x', n_chars
         |   FROM documents WHERE doc_id = 251),
         |p AS (SELECT doc_id_b FROM (${minhashOracleSql(k = 5, numHashes = 64,
               bands = 16, threshold = 0.5, src = "u")}))
         |SELECT doc_id, n_chars FROM u
         |WHERE doc_id >= 250 AND doc_id NOT IN (SELECT doc_id_b FROM p)
         |ORDER BY doc_id""".stripMargin,

    // bloom-pruned ≡ unpruned (no false negatives), so the oracle IS
    // n150's batch replay — the driver gate re-proves the sidecar law
    "n157_incremental_bloom" ->
      s"""WITH u AS (
         | SELECT doc_id, text, n_chars FROM documents
         | UNION ALL SELECT doc_id + 3000000, text || ' tail bit', n_chars
         |   FROM documents WHERE doc_id IN (0, 2, 4)
         | UNION ALL SELECT 3000007, text || ' x', n_chars
         |   FROM documents WHERE doc_id = 251),
         |p AS (SELECT doc_id_b FROM (${minhashOracleSql(k = 5, numHashes = 64,
               bands = 16, threshold = 0.5, src = "u")}))
         |SELECT doc_id, n_chars FROM u
         |WHERE doc_id >= 250 AND doc_id NOT IN (SELECT doc_id_b FROM p)
         |ORDER BY doc_id""".stripMargin,

    // sharded blooms have no false negatives either: sharded-pruned ≡
    // unpruned ≡ n150's batch replay — same oracle by design
    "n162_incremental_bloom_perband" ->
      s"""WITH u AS (
         | SELECT doc_id, text, n_chars FROM documents
         | UNION ALL SELECT doc_id + 3000000, text || ' tail bit', n_chars
         |   FROM documents WHERE doc_id IN (0, 2, 4)
         | UNION ALL SELECT 3000007, text || ' x', n_chars
         |   FROM documents WHERE doc_id = 251),
         |p AS (SELECT doc_id_b FROM (${minhashOracleSql(k = 5, numHashes = 64,
               bands = 16, threshold = 0.5, src = "u")}))
         |SELECT doc_id, n_chars FROM u
         |WHERE doc_id >= 250 AND doc_id NOT IN (SELECT doc_id_b FROM p)
         |ORDER BY doc_id""".stripMargin,

    // refcounted retraction replayed on text equality: live = corpus
    // texts of UNPURGED holders (string semantics — the refcount is
    // the digest-space implementation of exactly this set), slice
    // deduped within (lowest id per text) then anti-joined on live
    "n159_exact_retraction" ->
      """WITH corpus AS (
        | SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
        | UNION ALL SELECT doc_id + 2000100, text FROM documents WHERE doc_id = 0),
        |live AS (SELECT text FROM corpus WHERE doc_id NOT IN (0, 4)),
        |slice AS (
        | SELECT doc_id, text, n_chars FROM documents WHERE doc_id % 2 = 1
        | UNION ALL SELECT doc_id + 3000001, text, n_chars
        |   FROM documents WHERE doc_id IN (0, 4)
        | UNION ALL SELECT doc_id + 3000006, text, n_chars
        |   FROM documents WHERE doc_id = 1),
        |dd AS (SELECT * FROM slice
        |       QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1)
        |SELECT doc_id, n_chars FROM dd
        |WHERE text NOT IN (SELECT text FROM live)
        |ORDER BY doc_id""".stripMargin,

    // the retraction law, replayed: banding over corpus∖removed ∪ slice
    // (docs 0/2 purged — their planted near-copies are ADMITTED, doc
    // 4's still drops). Identical construction to n150 with the two
    // retracted docs cut from the union's corpus side.
    "n154_index_retraction" ->
      s"""WITH u AS (
         | SELECT doc_id, text, n_chars FROM documents
         |   WHERE doc_id NOT IN (0, 2)
         | UNION ALL SELECT doc_id + 3000000, text || ' tail bit', n_chars
         |   FROM documents WHERE doc_id IN (0, 2, 4)
         | UNION ALL SELECT 3000007, text || ' x', n_chars
         |   FROM documents WHERE doc_id = 251),
         |p AS (SELECT doc_id_b FROM (${minhashOracleSql(k = 5, numHashes = 64,
               bands = 16, threshold = 0.5, src = "u")}))
         |SELECT doc_id, n_chars FROM u
         |WHERE doc_id >= 250 AND doc_id NOT IN (SELECT doc_id_b FROM p)
         |ORDER BY doc_id""".stripMargin,

    // sign-LSH bucket replay over the old∪planted-slice union (the
    // n150 stance for embeddings): under the ingest-order id invariant
    // every victim is the higher side of a bucket-shared pair whose
    // exact cosine reaches the threshold, so survivors are one NOT IN
    "n152_incremental_embdedup" -> {
      val uCte =
        """uemb AS (
          | SELECT vec_id, embedding FROM embeddings
          | UNION ALL SELECT vec_id + 3000000,
          |   list_transform(embedding,
          |     x -> CAST(x * (1e0 + 1e-6 * (vec_id + 1)) AS FLOAT))
          |   FROM embeddings WHERE vec_id < 3
          | UNION ALL SELECT vec_id + 2999756,
          |   list_transform(embedding,
          |     x -> CAST(x * (1e0 + 1e-6 * (vec_id + 1)) AS FLOAT))
          |   FROM embeddings WHERE vec_id = 251)""".stripMargin
      s"""WITH $uCte,
         |${signLshBkCtes(planes = 12, tables = 4, dim = 64, src = "uemb")},
         |cand AS (SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
         | FROM bk a JOIN bk b ON a.t = b.t AND a.bucket = b.bucket
         |   AND a.vec_id < b.vec_id),
         |v AS (SELECT vb FROM cand
         | JOIN e ea ON ea.vec_id = va JOIN e eb ON eb.vec_id = vb
         | WHERE list_cosine_similarity(ea.emb, eb.emb) >= 0.95)
         |SELECT vec_id FROM uemb
         |WHERE vec_id >= 250 AND vec_id NOT IN (SELECT vb FROM v)
         |ORDER BY vec_id""".stripMargin
    },

    // the n150 pair replay classified per victim: cross evidence (the
    // lower side is an old doc — ids < 250 under the invariant) wins
    // over within evidence; the three buckets partition the slice
    "n153_neardup_slice_report" ->
      s"""WITH u AS (
         | SELECT doc_id, text, source FROM documents
         | UNION ALL SELECT doc_id + 3000000, text || ' tail bit', source
         |   FROM documents WHERE doc_id IN (0, 2, 4)
         | UNION ALL SELECT doc_id + 2999756, text || ' x', source
         |   FROM documents WHERE doc_id = 251),
         |p AS (SELECT doc_id_a, doc_id_b FROM (${minhashOracleSql(k = 5,
               numHashes = 64, bands = 16, threshold = 0.5, src = "u")})),
         |ev AS (SELECT doc_id_b AS doc_id,
         |        max(CASE WHEN doc_id_a < 250 THEN 1 ELSE 0 END) AS has_cross
         |       FROM p WHERE doc_id_b >= 250 GROUP BY doc_id_b)
         |SELECT source,
         | CAST(count(*) AS BIGINT) AS n_incoming,
         | CAST(sum(CASE WHEN ev.has_cross = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_cross_neardup,
         | CAST(sum(CASE WHEN ev.has_cross = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_within_neardup,
         | CAST(sum(CASE WHEN ev.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_new
         |FROM (SELECT * FROM u WHERE doc_id >= 250) i
         |LEFT JOIN ev ON ev.doc_id = i.doc_id
         |GROUP BY source ORDER BY source""".stripMargin,

    // anchor+extend replayed on gram STRINGS (string-equality replay
    // of the hash-keyed construction — the n50 convention, fnv64's
    // 2^-64 collision risk accepted); keep-first is the same
    // (doc_id, pos) minimum on both engines, and 1-based DuckDB
    // positions vs Spark's 0-based anchors induce identical covers
    "n155_exact_substr_dedup" ->
      """WITH u AS (
        | SELECT doc_id, text FROM documents
        | UNION ALL SELECT doc_id + 4000001, 'zyxprefix ' || text
        |   FROM documents WHERE doc_id = 0
        | UNION ALL SELECT doc_id + 4000002,
        |   text || ' zyxsuffix trailing words appended'
        |   FROM documents WHERE doc_id = 1),
        |toks AS (SELECT doc_id,
        |  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
        | FROM u),
        |w AS (SELECT doc_id, len(ws) AS n_tokens, s.pos AS pos, s.word AS word
        |  FROM (SELECT doc_id, ws,
        |    unnest(list_transform(generate_series(1, len(ws)),
        |      j -> {'pos': j, 'word': ws[j]})) AS s
        |   FROM toks WHERE len(ws) > 0)),
        |occ AS (SELECT doc_id, o.pos AS pos, o.g AS g
        |  FROM (SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws) - 7),
        |      j -> {'pos': j, 'g': array_to_string(ws[j:j+7], ' ')})) AS o
        |   FROM toks WHERE len(ws) >= 8)),
        |ranked AS (SELECT doc_id, pos,
        |   row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn,
        |   count(*) OVER (PARTITION BY g) AS cnt FROM occ),
        |dup AS (SELECT doc_id, pos FROM ranked WHERE cnt >= 2 AND rn >= 2),
        |taint AS (SELECT DISTINCT w.doc_id, w.pos FROM w
        |  JOIN dup d ON w.doc_id = d.doc_id AND w.pos BETWEEN d.pos AND d.pos + 7),
        |kept AS (SELECT w.* FROM w ANTI JOIN taint USING (doc_id, pos))
        |SELECT doc_id, CAST(any_value(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_tokens_kept,
        |  md5(string_agg(word, ' ' ORDER BY pos)) AS text_md5
        |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the incremental path equals batch over corpus ∪ slice restricted
    // to the slice (merged gram stats == union gram stats), so the
    // oracle IS n155's replay filtered to the planted slice ids
    "n164_incremental_exactsubstr" ->
      """WITH u AS (
        | SELECT doc_id, text FROM documents
        | UNION ALL SELECT doc_id + 4000001, 'zyxprefix ' || text
        |   FROM documents WHERE doc_id = 0
        | UNION ALL SELECT doc_id + 4000002,
        |   text || ' zyxsuffix trailing words appended'
        |   FROM documents WHERE doc_id = 1),
        |toks AS (SELECT doc_id,
        |  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
        | FROM u),
        |w AS (SELECT doc_id, len(ws) AS n_tokens, s.pos AS pos, s.word AS word
        |  FROM (SELECT doc_id, ws,
        |    unnest(list_transform(generate_series(1, len(ws)),
        |      j -> {'pos': j, 'word': ws[j]})) AS s
        |   FROM toks WHERE len(ws) > 0)),
        |occ AS (SELECT doc_id, o.pos AS pos, o.g AS g
        |  FROM (SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws) - 7),
        |      j -> {'pos': j, 'g': array_to_string(ws[j:j+7], ' ')})) AS o
        |   FROM toks WHERE len(ws) >= 8)),
        |ranked AS (SELECT doc_id, pos,
        |   row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn,
        |   count(*) OVER (PARTITION BY g) AS cnt FROM occ),
        |dup AS (SELECT doc_id, pos FROM ranked WHERE cnt >= 2 AND rn >= 2),
        |taint AS (SELECT DISTINCT w.doc_id, w.pos FROM w
        |  JOIN dup d ON w.doc_id = d.doc_id AND w.pos BETWEEN d.pos AND d.pos + 7),
        |kept AS (SELECT w.* FROM w ANTI JOIN taint USING (doc_id, pos))
        |SELECT doc_id, CAST(any_value(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_tokens_kept,
        |  md5(string_agg(word, ' ' ORDER BY pos)) AS text_md5
        |FROM kept WHERE doc_id >= 4000000
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "n50_line_dedup" ->
      // string-equality replay of the hash-keyed frequent-line set
      // (fnv64 collision risk accepted, as n01's md5); 1-based list
      // positions vs Spark's 0-based posexplode don't matter — only
      // the ordering they induce does
      """WITH ld AS (SELECT doc_id,
        |  'SHARED BOILERPLATE HEADER' || chr(10) || text || chr(10) ||
        |  'GROUP4 ' || CAST(doc_id // 4 AS VARCHAR) || chr(10) ||
        |  'GROUP5 ' || CAST(doc_id // 5 AS VARCHAR) || chr(10) ||
        |  CASE WHEN doc_id % 2 = 0 THEN 'EVEN FOOTER' ELSE 'ODD FOOTER' END AS text
        | FROM documents),
        |lns AS (SELECT doc_id,
        |  unnest(generate_series(1, len(string_split(text, chr(10))))) AS line_idx,
        |  string_split(text, chr(10)) AS ls
        | FROM ld),
        |lines AS (SELECT doc_id, line_idx, ls[line_idx] AS line FROM lns),
        |freq AS (SELECT line FROM (
        |  SELECT line, count(DISTINCT doc_id) AS n_docs FROM lines GROUP BY line)
        | WHERE n_docs >= 5),
        |kept AS (SELECT doc_id, line_idx, line FROM lines
        | WHERE line NOT IN (SELECT line FROM freq))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines_kept,
        | CAST(strlen(string_agg(line, chr(10) ORDER BY line_idx)) AS BIGINT) AS n_chars_clean,
        | md5(string_agg(line, chr(10) ORDER BY line_idx)) AS text_md5
        |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "n51_bigram_nll" ->
      // ln() of integer counts replays exactly (single IEEE op); the
      // per-doc sum folds occ * ln(cnt) in bigram-code order on both
      // engines; the code replays char_bigrams' (c1 << 16) | c2
      // packing via unicode() (UTF-16 unit == codepoint for this BMP/
      // ASCII fixture). Shared with n57 via bigramNllSql.
      s"$bigramNllSql ORDER BY doc_id",

    "n172_lm_state_score" ->
      // the n51 replay with the COUNTS recounted from the surviving
      // reference corpus from scratch (the lifecycle laws make the
      // maintained state land exactly here) and the scored slice
      // LEFT-joined: an unseen bigram scores coalesce(cnt, 1) —
      // ln(1) = 0, the formula's maximum surprise
      """WITH rg AS (SELECT doc_id, text,
        |  unnest(generate_series(1, strlen(text) - 1)) AS pos
        | FROM documents
        | WHERE doc_id % 5 <> 2 AND doc_id % 97 <> 0 AND strlen(text) >= 2),
        |rc AS (SELECT
        |  unicode(substr(text, pos, 1)) * 65536 + unicode(substr(text, pos + 1, 1)) AS bigram
        | FROM rg),
        |counts AS (SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
        |           FROM rc GROUP BY bigram),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM counts),
        |sg AS (SELECT doc_id, text,
        |  unnest(generate_series(1, strlen(text) - 1)) AS pos
        | FROM documents WHERE doc_id % 5 = 2 AND strlen(text) >= 2),
        |s2 AS (SELECT doc_id,
        |  unicode(substr(text, pos, 1)) * 65536 + unicode(substr(text, pos + 1, 1)) AS bigram
        | FROM sg),
        |dg AS (SELECT doc_id, bigram, CAST(count(*) AS BIGINT) AS occ
        |       FROM s2 GROUP BY doc_id, bigram),
        |perdoc AS (SELECT doc_id, CAST(sum(occ) AS BIGINT) AS n_bigrams,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(occ * ln(coalesce(cnt, 1)) ORDER BY bigram)),
        |    (acc, x) -> acc + x) AS sum_ln
        | FROM dg LEFT JOIN counts USING (bigram) GROUP BY doc_id)
        |SELECT doc_id, n_bigrams,
        | round(ln(total) - sum_ln / n_bigrams, 6) AS avg_nll
        |FROM perdoc, tot ORDER BY doc_id""".stripMargin,

    "n57_nll_gate" ->
      s"""WITH scores AS ($bigramNllSql)
        |SELECT doc_id, avg_nll FROM scores
        |CROSS JOIN (SELECT quantile_cont(avg_nll, 0.9) AS thr FROM scores)
        |WHERE avg_nll <= thr ORDER BY doc_id""".stripMargin,

    "n56_mixture_sample" ->
      // rate arithmetic written in the same op order as the Spark
      // column expressions (share * tstar / n; n / share) so the
      // doubles match bit-for-bit; floor, not round (half-tie rule)
      """WITH sh(source, share) AS (VALUES
        |  ('src0', CAST(0.4 AS DOUBLE)), ('src1', CAST(0.3 AS DOUBLE)),
        |  ('src2', CAST(0.2 AS DOUBLE)), ('src3', CAST(0.05 AS DOUBLE)),
        |  ('src4', CAST(0.05 AS DOUBLE))),
        |cn AS (SELECT source, CAST(count(*) AS BIGINT) AS n
        |       FROM documents GROUP BY source),
        |j AS (SELECT s.source, s.share, c.n FROM sh s JOIN cn c USING (source)),
        |t AS (SELECT min(n / share) AS tstar FROM j),
        |r AS (SELECT source, CASE WHEN n / share = tstar THEN 1.0
        |        ELSE share * tstar / n END AS rate FROM j CROSS JOIN t)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN r USING (source)
        |WHERE rate >= 1.0 OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
        |  < printf('%08x', CAST(least(floor(rate * 4294967296.0), 4294967295.0) AS BIGINT))
        |ORDER BY doc_id""".stripMargin,

    "n54_semantic_contamination" ->
      s"""WITH $plantedEmbCte,
        |ev AS (SELECT vec_id AS eval_id, emb AS eemb FROM e WHERE vec_id >= 1000000),
        |co AS (SELECT vec_id, emb FROM e WHERE vec_id < 1000000)
        |SELECT eval_id, vec_id,
        | round(list_cosine_similarity(emb, eemb), 6) AS cos
        |FROM co, ev WHERE list_cosine_similarity(emb, eemb) >= 0.8
        |ORDER BY eval_id, vec_id""".stripMargin,

    "n55_vocab_coverage" ->
      // rank ties break (cnt DESC, word); cum is a window sum ->
      // HUGEINT, compared through BIGINT per convention
      """WITH wc AS (SELECT w AS word, count(*) AS cnt FROM (
        |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        |  FROM documents) GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_tokens FROM wc),
        |rk AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, word) AS rnk,
        |  sum(cnt) OVER (ORDER BY cnt DESC, word ROWS UNBOUNDED PRECEDING) AS cum
        | FROM wc),
        |ks(vocab_k) AS (VALUES (5), (10), (20))
        |SELECT CAST(vocab_k AS BIGINT) AS vocab_k,
        | CAST(max(cum) AS BIGINT) AS covered_tokens, total_tokens
        |FROM ks JOIN rk ON rk.rnk <= ks.vocab_k CROSS JOIN tot
        |GROUP BY vocab_k, total_tokens ORDER BY vocab_k""".stripMargin,

    "n53_rag_chunks" ->
      // integer tiling arithmetic; DuckDB list slice [a:b] is 1-based
      // inclusive == Spark slice(start, length)
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |nc AS (SELECT doc_id, w,
        |  1 + greatest(0, (len(w) - 16 + 12 - 1) // 12) AS n FROM ws),
        |ch AS (SELECT doc_id, w,
        |  unnest(generate_series(0, n - 1)) AS chunk_idx FROM nc),
        |cc AS (SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  array_to_string(w[chunk_idx * 12 + 1 : chunk_idx * 12 + 16], ' ') AS chunk
        | FROM ch)
        |SELECT doc_id, chunk_idx, chunk,
        | CAST(CASE WHEN chunk = '' THEN 0
        |      ELSE len(string_split(chunk, ' ')) END AS BIGINT) AS n_words
        |FROM cc ORDER BY doc_id, chunk_idx""".stripMargin,

    "n52_semantic_dedup" ->
      // argmax assignment replayed as row_number over (cos DESC, cid),
      // the size cap and pair join replayed literally
      s"""WITH $plantedEmbCte,
        |c AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < 8),
        |asg AS (SELECT vec_id, cid AS cluster FROM (
        |  SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY list_cosine_similarity(e.emb, c.cemb) DESC, c.cid) AS rn
        |  FROM e, c) t WHERE rn = 1),
        |sized AS (SELECT cluster FROM asg GROUP BY cluster
        |          HAVING count(*) BETWEEN 2 AND 2000),
        |p AS (SELECT a.cluster, a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
        |       list_cosine_similarity(ea.emb, eb.emb) AS cos
        |      FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        |      JOIN sized s ON s.cluster = a.cluster
        |      JOIN e ea ON ea.vec_id = a.vec_id
        |      JOIN e eb ON eb.vec_id = b.vec_id)
        |SELECT cluster, vec_id_a, vec_id_b, round(cos, 6) AS cos
        |FROM p WHERE cos >= 0.8 ORDER BY cluster, vec_id_a, vec_id_b""".stripMargin,

    "n48_media_av_meta" ->
      // audio: sample_rate/duration from the WAV fmt+data chunks
      // (duration_ms = dataLen * 1000 // byteRate, byteRate = sr * ch * 2);
      // video: duration from mvhd (timescale 1000 -> ms identity);
      // every field replayed from the fixture's doc_id formulas
      """SELECT doc_id AS media_id,
        | CASE WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        | CAST(CASE WHEN doc_id % 3 = 1 THEN 8000 + (doc_id % 8) * 1000
        |      ELSE 0 END AS BIGINT) AS sample_rate,
        | CAST(CASE WHEN doc_id % 3 = 1 THEN
        |    strlen(text) * 1000 // ((8000 + (doc_id % 8) * 1000) * (1 + (doc_id // 3) % 2) * 2)
        |  ELSE (1 + doc_id % 60) * 1000 END AS BIGINT) AS duration_ms,
        | CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + doc_id % 300 ELSE 1 END AS BIGINT) AS n_frames
        |FROM documents WHERE doc_id % 3 <> 0 ORDER BY media_id""".stripMargin,

    "n110_frame_offsets" ->
      s"""WITH d AS (SELECT doc_id, 1 + doc_id % 20 AS n FROM documents),
         |fr AS (SELECT doc_id, n,
         |  unnest(generate_series(0, CAST(n AS BIGINT) - 1)) AS i FROM d),
         |v0 AS (SELECT doc_id, n, i,
         |  CAST(doc_id * 31 + i AS HUGEINT) AS x FROM fr),
         |f1 AS (SELECT doc_id, n, i, xor(x, x >> 33) AS v1 FROM v0),
         |f2 AS (SELECT doc_id, n, i, xor(y, y >> 33) AS v3
         |       FROM (SELECT doc_id, n, i, ${mulC("v1", c1, c1lo)} AS y FROM f1)),
         |f3 AS (SELECT doc_id, n, i, xor(z, z >> 33) AS u
         |       FROM (SELECT doc_id, n, i, ${mulC("v3", c2, c2lo)} AS z FROM f2)),
         |sz AS (SELECT doc_id, n, i, 100 + CAST(u & 255 AS BIGINT) AS len FROM f3),
         |c AS (SELECT doc_id, n, i, len,
         |  coalesce(sum(len) OVER (PARTITION BY doc_id ORDER BY i
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef FROM sz)
         |SELECT doc_id AS media_id, CAST(i AS BIGINT) AS frame_idx,
         | CAST(212 + 4 * n + bef AS BIGINT) AS byte_off, len AS byte_len
         |FROM c ORDER BY media_id, frame_idx""".stripMargin,

    "n109_audio_stats" ->
      s"""WITH d AS (SELECT doc_id, unnest(generate_series(0, 63)) AS i FROM documents),
         |v0 AS (SELECT doc_id, i, CAST(doc_id * 1000003 + i AS HUGEINT) AS x FROM d),
         |f1 AS (SELECT doc_id, i, xor(x, x >> 33) AS v1 FROM v0),
         |f2 AS (SELECT doc_id, i, xor(y, y >> 33) AS v3
         |       FROM (SELECT doc_id, i, ${mulC("v1", c1, c1lo)} AS y FROM f1)),
         |f3 AS (SELECT doc_id, i, xor(z, z >> 33) AS u
         |       FROM (SELECT doc_id, i, ${mulC("v3", c2, c2lo)} AS z FROM f2)),
         |sm AS (SELECT doc_id, i, CAST(u & 65535 AS BIGINT) - 32768 AS s FROM f3),
         |l AS (SELECT doc_id, i, s,
         |  lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev FROM sm),
         |a AS (SELECT doc_id,
         |  CAST(max(abs(s)) AS BIGINT) AS peak,
         |  CAST(sum(s * s) // 64 AS BIGINT) AS mean_square,
         |  CAST(sum(CASE WHEN prev IS NOT NULL AND (prev < 0) <> (s < 0)
         |           THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
         | FROM l GROUP BY 1)
         |SELECT doc_id AS media_id, CAST(8000 AS BIGINT) AS sample_rate,
         | CAST(64 AS BIGINT) AS n_samples, peak, mean_square, zero_crossings
         |FROM a ORDER BY media_id""".stripMargin,

    "n122_psi_drift" ->
      """WITH s AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v
        |  FROM documents WHERE source IN ('src0', 'src1')),
        |b AS (SELECT min(v) AS lo, max(v) AS hi FROM s),
        |w AS (SELECT greatest(1, (hi - lo + 16) // 16) AS w, lo FROM b),
        |c AS (SELECT (v - lo) // w AS bin,
        |  sum(CASE WHEN g = 'src0' THEN 1 ELSE 0 END) AS ca,
        |  sum(CASE WHEN g = 'src1' THEN 1 ELSE 0 END) AS cb
        | FROM s, w GROUP BY 1),
        |t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM c)
        |SELECT CAST(bin AS BIGINT) AS bin, CAST(ca AS BIGINT) AS ca,
        | CAST(cb AS BIGINT) AS cb,
        | round(1000000.0 * (ca / na - cb / nb) * ln(ca / na * nb / cb), 6)
        |   AS psi_term_x1e6
        |FROM c, t WHERE ca > 0 AND cb > 0 ORDER BY bin""".stripMargin,

    "n121_ks_drift" ->
      """WITH s AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v
        |  FROM documents WHERE source IN ('src0', 'src1')),
        |c AS (SELECT v,
        |  sum(CASE WHEN g = 'src0' THEN 1 ELSE 0 END) AS ca,
        |  sum(CASE WHEN g = 'src1' THEN 1 ELSE 0 END) AS cb
        | FROM s GROUP BY v),
        |t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM c),
        |cum AS (SELECT v,
        |  sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
        |  sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb
        | FROM c),
        |d AS (SELECT v, abs(cuma * nb - cumb * na) AS d, na, nb FROM cum, t)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        | CAST(d AS BIGINT) AS ks_num,
        | CAST((1000000 * d) // (na * nb) AS BIGINT) AS ks_x1e6,
        | v AS at_value
        |FROM d ORDER BY d DESC, v LIMIT 1""".stripMargin,

    "n126_kmeans" -> kmeansOracleSql(k = 4, rounds = 2),

    "n134_dq_report" ->
      s"""WITH $plantedDocsCte,
         |pdx AS (SELECT * FROM pd
         |        UNION ALL SELECT -1, NULL, 0),
         |li AS (SELECT CAST(l_orderkey AS BIGINT) AS k FROM lineitem
         |       UNION ALL SELECT -999),
         |ok AS (SELECT DISTINCT CAST(o_orderkey AS BIGINT) AS k FROM orders)
         |SELECT 'text_complete' AS rule,
         | CAST(count(*) AS BIGINT) AS n_checked,
         | CAST(sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END)
         |   AS BIGINT) AS n_violations,
         | sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END) = 0 AS pass
         |FROM pdx
         |UNION ALL
         |SELECT 'n_chars_consistent', CAST(count(*) AS BIGINT),
         | CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT),
         | sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) = 0
         |FROM pdx
         |UNION ALL
         |SELECT 'doc_id_unique', CAST(count(*) AS BIGINT),
         | CAST(count(*) - count(DISTINCT doc_id) AS BIGINT),
         | count(*) = count(DISTINCT doc_id)
         |FROM pdx
         |UNION ALL
         |SELECT 'text_unique', CAST(count(*) AS BIGINT),
         | CAST(count(*) - count(DISTINCT text) AS BIGINT),
         | count(*) = count(DISTINCT text)
         |FROM pdx
         |UNION ALL
         |SELECT 'orderkey_referential', CAST(count(*) AS BIGINT),
         | CAST(sum(CASE WHEN ok.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         | sum(CASE WHEN ok.k IS NULL THEN 1 ELSE 0 END) = 0
         |FROM li LEFT JOIN ok ON li.k = ok.k
         |ORDER BY rule""".stripMargin,

    "n133_jump_hash" ->
      // the jump walk in HUGEINT mod 2^64: strictly ascending b's, so
      // shard_n = max b below n; both shards read off ONE walk to n=9
      s"""WITH RECURSIVE it AS (
         |  SELECT doc_id, CAST(doc_id AS HUGEINT) AS key,
         |         CAST(-1 AS BIGINT) AS b, CAST(0 AS BIGINT) AS j
         |  FROM documents
         |  UNION ALL
         |  SELECT doc_id, k2, j,
         |    ((j + 1) * 2147483648) // (CAST(k2 >> 33 AS BIGINT) + 1)
         |  FROM (SELECT doc_id,
         |          ((${mulC("key", "2862933555777941757", "2276503805")}) + 1)
         |            & $M64 AS k2, j
         |        FROM it WHERE j < 9)),
         |a AS (SELECT doc_id,
         |   max(CASE WHEN b < 8 THEN b END) AS shard8,
         |   max(b) AS shard9
         |  FROM it WHERE b >= 0 GROUP BY doc_id)
         |SELECT shard8, shard9, CAST(count(*) AS BIGINT) AS n
         |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "n132_cluster_profile" -> kmeansOracleSql(k = 4, rounds = 2,
      finalSelect =
        """,
          |r AS (SELECT cluster, vec_id, dist,
          |  row_number() OVER (PARTITION BY cluster
          |    ORDER BY dist, vec_id) AS rn FROM af),
          |st AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(dist) AS BIGINT) AS sdist FROM af GROUP BY cluster)
          |SELECT CAST(st.cluster AS BIGINT) AS cluster, st.n,
          | r.vec_id AS rep_id, r.dist AS rep_dist,
          | st.sdist // st.n AS mean_dist
          |FROM st JOIN r ON st.cluster = r.cluster AND r.rn = 1
          |ORDER BY cluster""".stripMargin),

    "n131_threshold_curve" ->
      s"""WITH $plantedDocsCte,
         |${jaccardPairsCte("pd")},
         |th AS (SELECT unnest([10, 20, 30, 40, 50, 60, 70, 80, 90, 100]) AS t),
         |h AS (SELECT th.t, v.doc_id_a, v.doc_id_b
         |      FROM v CROSS JOIN th
         |      WHERE inter * 100 >= t * (la + lb - inter)),
         |np AS (SELECT t, CAST(count(*) AS BIGINT) AS n_pairs FROM h GROUP BY t),
         |nd AS (SELECT t, CAST(count(DISTINCT d) AS BIGINT) AS n_docs
         |       FROM (SELECT t, doc_id_a AS d FROM h
         |             UNION ALL SELECT t, doc_id_b FROM h) GROUP BY t)
         |SELECT CAST(th.t AS BIGINT) AS threshold_x100,
         | coalesce(np.n_pairs, 0) AS n_pairs,
         | coalesce(nd.n_docs, 0) AS n_docs
         |FROM th LEFT JOIN np ON th.t = np.t LEFT JOIN nd ON th.t = nd.t
         |ORDER BY threshold_x100""".stripMargin,

    "n129_entity_resolution" ->
      // the canonical URL forms are PINNED BY n96 (cross-engine
      // canonicalizer agreement), so this oracle constructs them
      // directly; star edges + levenshtein pairs + transitive closure
      s"""WITH RECURSIVE $plantedDocsCte,
         |u AS (SELECT doc_id, CAST(doc_id // 5 AS VARCHAR) AS gs,
         |       doc_id % 5 AS m FROM pd),
         |cu AS (SELECT doc_id,
         |  'https://example' || gs || '.com' ||
         |  CASE WHEN m = 4 THEN ':8080' ELSE '' END ||
         |  '/p' || gs || '?a=1&b=2' AS cu FROM u),
         |hub AS (SELECT cu, min(doc_id) AS hub FROM cu GROUP BY cu),
         |ue AS (SELECT h.hub AS u, c.doc_id AS v
         |       FROM cu c JOIN hub h ON c.cu = h.cu
         |       WHERE c.doc_id <> h.hub),
         |k AS (SELECT doc_id, substr(text, 1, 32) AS key FROM pd),
         |te AS (SELECT a.doc_id AS u, b.doc_id AS v
         |       FROM k a JOIN k b ON a.doc_id < b.doc_id
         |       WHERE levenshtein(a.key, b.key) <= 1),
         |e AS (SELECT u, v FROM ue UNION SELECT v, u FROM ue
         |      UNION SELECT u, v FROM te UNION SELECT v, u FROM te),
         |reach(u, v) AS (
         |  SELECT u, v FROM e
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u),
         |ent AS (SELECT u AS doc_id, least(u, min(v)) AS ent
         |        FROM reach GROUP BY u)
         |SELECT d.doc_id,
         | CAST(coalesce(ent.ent, d.doc_id) AS BIGINT) AS entity_id
         |FROM pd d LEFT JOIN ent ON d.doc_id = ent.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "n128_mad_outliers" ->
      // definitional: rank windows state what median and MAD are; the
      // cross-multiplied flag counts replay in pure integers
      """WITH s AS (SELECT event_type AS grp,
        |  CAST(floor(value * 1024) AS BIGINT) AS v FROM events
        |  UNION ALL VALUES ('click', 9000000), ('click', -9000000)),
        |n AS (SELECT grp, count(*) AS n FROM s GROUP BY grp),
        |r AS (SELECT grp, v,
        |  row_number() OVER (PARTITION BY grp ORDER BY v) AS rn FROM s),
        |q AS (SELECT r.grp,
        |  max(CASE WHEN rn = greatest(1, CAST(ceil(0.5 * n) AS BIGINT))
        |      THEN v END) AS med
        | FROM r JOIN n ON r.grp = n.grp GROUP BY r.grp),
        |d AS (SELECT s.grp, s.v, q.med, abs(s.v - q.med) AS adev
        |      FROM s JOIN q ON s.grp = q.grp),
        |r2 AS (SELECT grp, adev,
        |  row_number() OVER (PARTITION BY grp ORDER BY adev) AS rn FROM d),
        |m AS (SELECT r2.grp,
        |  max(CASE WHEN rn = greatest(1, CAST(ceil(0.5 * n) AS BIGINT))
        |      THEN adev END) AS mad
        | FROM r2 JOIN n ON r2.grp = n.grp GROUP BY r2.grp)
        |SELECT d.grp AS event_type, d.med, m.mad,
        | CAST(sum(CASE WHEN 6745 * (d.med - d.v) > 35000 * m.mad
        |     THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        | CAST(sum(CASE WHEN 6745 * (d.v - d.med) > 35000 * m.mad
        |     THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        | CAST(count(*) AS BIGINT) AS n
        |FROM d JOIN m ON d.grp = m.grp
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,

    "n127_dp_counts" ->
      // seeded Laplace replay: FNV + fmix64 chain in HUGEINT mod 2^64,
      // 53-bit uniform, inverse CDF, 1e-6 rounding; released adds the
      // truncating-division integral part
      s"""WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n
         |           FROM documents GROUP BY 1),
         |h0 AS (SELECT source, n,
         |        (${fnvSql("source")} + 42) & $M64 AS x FROM g),
         |f1 AS (SELECT source, n, xor(x, x >> 33) AS v1 FROM h0),
         |f2 AS (SELECT source, n, xor(v2, v2 >> 33) AS v3
         |       FROM (SELECT source, n, ${mulC("v1", c1, c1lo)} AS v2 FROM f1)),
         |f3 AS (SELECT source, n, xor(v4, v4 >> 33) AS wu
         |       FROM (SELECT source, n, ${mulC("v3", c2, c2lo)} AS v4 FROM f2)),
         |t AS (SELECT source, n,
         |       CAST(greatest(CAST(wu >> 11 AS BIGINT), 1) AS DOUBLE)
         |         / 9007199254740992.0 AS u FROM f3),
         |no AS (SELECT source, n,
         |       CAST(round((-2.0 * sign(u - 0.5) *
         |         ln(1.0 - 2.0 * abs(u - 0.5))) * 1000000.0) AS BIGINT)
         |         AS noise_x1e6 FROM t)
         |SELECT source, n, noise_x1e6,
         | n + noise_x1e6 // 1000000 AS released
         |FROM no ORDER BY source""".stripMargin,

    "n124_lpa_communities" -> lpaOracleSql(rounds = 3),

    "n125_kneser_ney" ->
      // same bigram counting, then the three x1e9 ratio terms with
      // truncating // division; c1 cast back from DuckDB's HUGEINT sum
      """WITH ws AS (SELECT list_filter(
        |    regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |g AS (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
        |      FROM ws WHERE len(ws) >= 2),
        |b AS (SELECT ws[i] AS w1, ws[i + 1] AS w2 FROM g),
        |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        |        FROM b GROUP BY 1, 2),
        |lft AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
        |         CAST(count(*) AS BIGINT) AS nfollow FROM c12 GROUP BY 1),
        |rgt AS (SELECT w2, CAST(count(*) AS BIGINT) AS nprec
        |        FROM c12 GROUP BY 1),
        |ty AS (SELECT CAST(count(*) AS BIGINT) AS ntypes FROM c12),
        |t AS (SELECT w1, w2, c12,
        |  (1000000000 * (4 * c12 - 3)) // (4 * c1) AS t1_x1e9,
        |  (3000000000 * nfollow) // (4 * c1) AS lambda_x1e9,
        |  (1000000000 * nprec) // ntypes AS pcont_x1e9
        | FROM c12 JOIN lft USING (w1) JOIN rgt USING (w2) CROSS JOIN ty)
        |SELECT w1, w2, c12, t1_x1e9, lambda_x1e9, pcont_x1e9,
        | t1_x1e9 + (lambda_x1e9 * pcont_x1e9) // 1000000000 AS pkn_x1e9
        |FROM t ORDER BY w1, w2""".stripMargin,

    "n120_good_turing" ->
      """WITH ws AS (SELECT list_filter(
        |    regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |g AS (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
        |      FROM ws WHERE len(ws) >= 2),
        |w AS (SELECT ws[i] || ' ' || ws[i + 1] AS w FROM g),
        |wc AS (SELECT w, count(*) AS c FROM w GROUP BY w),
        |coc AS (SELECT c AS r, CAST(count(*) AS BIGINT) AS n_r FROM wc GROUP BY c),
        |l AS (SELECT r, n_r, lead(n_r) OVER (ORDER BY r) AS n_next,
        |        lead(r) OVER (ORDER BY r) AS r_next FROM coc)
        |SELECT CAST(r AS BIGINT) AS r, n_r,
        | CAST(CASE WHEN r_next = r + 1
        |      THEN (1000000 * (r + 1) * n_next) // n_r END AS BIGINT) AS r_star_x1e6
        |FROM l WHERE r <= 10 ORDER BY r""".stripMargin,

    "n119_rendezvous" ->
      // same fmix64 HUGEINT replay, scores masked to 63 bits so the
      // max is order-identical to the signed Scala comparison;
      // arg_max ties are a 2^-63 event
      s"""WITH g AS (SELECT doc_id, unnest(generate_series(0, 8)) AS s FROM documents),
         |v0 AS (SELECT doc_id, s, CAST(doc_id AS HUGEINT) * 31 + s AS x FROM g),
         |f1 AS (SELECT doc_id, s, xor(x, x >> 33) AS v1 FROM v0),
         |f2 AS (SELECT doc_id, s, xor(y, y >> 33) AS v3
         |       FROM (SELECT doc_id, s, ${mulC("v1", c1, c1lo)} AS y FROM f1)),
         |f3 AS (SELECT doc_id, s, xor(z, z >> 33) AS u
         |       FROM (SELECT doc_id, s, ${mulC("v3", c2, c2lo)} AS z FROM f2)),
         |sc AS (SELECT doc_id, s,
         |       CAST(u & 9223372036854775807 AS BIGINT) AS score FROM f3),
         |a8 AS (SELECT doc_id, arg_max(s, score) AS shard8 FROM sc
         |       WHERE s < 8 GROUP BY doc_id),
         |a9 AS (SELECT doc_id, arg_max(s, score) AS shard9 FROM sc GROUP BY doc_id)
         |SELECT CAST(shard8 AS BIGINT) AS shard8, CAST(shard9 AS BIGINT) AS shard9,
         | CAST(count(*) AS BIGINT) AS n
         |FROM a8 JOIN a9 USING (doc_id) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "n118_poisson_bootstrap" -> {
      val cdf = graft.ops.Sampling.PoissonCdf
      // same fmix64 HUGEINT replay as n109, then the shared CDF
      // thresholds bucket the identical uniforms
      s"""WITH d AS (SELECT l_orderkey * 8 + l_linenumber AS k, l_extendedprice AS v,
         |  unnest(generate_series(0, 15)) AS r FROM lineitem),
         |v0 AS (SELECT k, v, r, CAST(k AS HUGEINT) * 1000003 + r AS x FROM d),
         |f1 AS (SELECT v, r, xor(x, x >> 33) AS v1 FROM v0),
         |f2 AS (SELECT v, r, xor(y, y >> 33) AS v3
         |       FROM (SELECT v, r, ${mulC("v1", c1, c1lo)} AS y FROM f1)),
         |f3 AS (SELECT v, r, xor(z, z >> 33) AS u64
         |       FROM (SELECT v, r, ${mulC("v3", c2, c2lo)} AS z FROM f2)),
         |w AS (SELECT v, r,
         |  CASE WHEN u < ${cdf(0)} THEN 0 WHEN u < ${cdf(1)} THEN 1
         |       WHEN u < ${cdf(2)} THEN 2 WHEN u < ${cdf(3)} THEN 3
         |       WHEN u < ${cdf(4)} THEN 4 WHEN u < ${cdf(5)} THEN 5
         |       ELSE 6 END AS w
         | FROM (SELECT v, r,
         |   CAST(u64 >> 11 AS DOUBLE) / 9007199254740992.0 AS u FROM f3))
         |SELECT CAST(r AS BIGINT) AS replicate, CAST(sum(w) AS BIGINT) AS n_eff,
         | round(sum(w * v) / sum(w), 6) AS wmean
         |FROM w GROUP BY r ORDER BY replicate""".stripMargin
    },

    "n117_matryoshka" ->
      // n45's proven code formula + list slices; both rankings are
      // integer dots (exact in double far below 2^53) with vec_id
      // tie-break, so the windows replay deterministically
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |       list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e),
        |c AS (SELECT vec_id,
        |       CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
        |            ELSE list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INT))
        |       END AS codes FROM s),
        |q AS (SELECT vec_id AS query_id, codes AS qc FROM c WHERE vec_id < 5),
        |p AS (SELECT q.query_id, c.vec_id,
        |  CAST(list_dot_product(c.codes, q.qc) AS BIGINT) AS dot_full,
        |  CAST(list_dot_product(c.codes[1:16], q.qc[1:16]) AS BIGINT) AS dot_prefix
        | FROM c, q WHERE c.vec_id <> q.query_id),
        |r AS (SELECT query_id, vec_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY dot_full DESC, vec_id) AS rf,
        |  row_number() OVER (PARTITION BY query_id ORDER BY dot_prefix DESC, vec_id) AS rp
        | FROM p),
        |ov AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_overlap
        |  FROM (SELECT query_id, vec_id FROM r WHERE rf <= 10) f
        |  JOIN (SELECT query_id, vec_id FROM r WHERE rp <= 10) pp
        |    USING (query_id, vec_id) GROUP BY query_id),
        |t1 AS (SELECT query_id,
        |  max(CASE WHEN rf = 1 THEN vec_id END) AS full_top1,
        |  max(CASE WHEN rp = 1 THEN vec_id END) AS prefix_top1
        | FROM r GROUP BY query_id)
        |SELECT query_id, n_overlap, full_top1, prefix_top1,
        | CAST(CASE WHEN full_top1 = prefix_top1 THEN 1 ELSE 0 END AS BIGINT) AS top1_same
        |FROM ov JOIN t1 USING (query_id) ORDER BY query_id""".stripMargin,

    "n116_outlier_fences" ->
      // definitional: row_number at rank ceil(q*n) IS the exact
      // quartile; fences and counts replay in integer arithmetic
      """WITH s AS (SELECT event_type AS grp,
        |  CAST(floor(value * 1024) AS BIGINT) AS v FROM events),
        |n AS (SELECT grp, count(*) AS n FROM s GROUP BY grp),
        |r AS (SELECT grp, v,
        |  row_number() OVER (PARTITION BY grp ORDER BY v) AS rn FROM s),
        |q AS (SELECT r.grp,
        |  max(CASE WHEN rn = greatest(1, CAST(ceil(0.25 * n) AS BIGINT))
        |      THEN v END) AS q1,
        |  max(CASE WHEN rn = greatest(1, CAST(ceil(0.75 * n) AS BIGINT))
        |      THEN v END) AS q3
        | FROM r JOIN n ON r.grp = n.grp GROUP BY r.grp)
        |SELECT q.grp AS event_type, q1, q3,
        | q1 - (3 * (q3 - q1)) // 2 AS lo, q3 + (3 * (q3 - q1)) // 2 AS hi,
        | CAST(sum(CASE WHEN s.v < q1 - (3 * (q3 - q1)) // 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        | CAST(sum(CASE WHEN s.v > q3 + (3 * (q3 - q1)) // 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        | CAST(count(*) AS BIGINT) AS n_total
        |FROM q JOIN s ON s.grp = q.grp
        |GROUP BY 1, 2, 3, 4, 5 ORDER BY 1""".stripMargin,

    "n115_ewma" ->
      // sequential recurrence replayed as a recursive CTE chained on
      // per-user row_number; the (d % 4 + 4) % 4 adjustment turns
      // DuckDB's truncating // into the floor division the fold takes
      """WITH RECURSIVE o AS (SELECT user_id, ts, event_id,
        |  CAST(floor(value * 1024) AS BIGINT) AS v,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        | FROM events),
        |r(user_id, rn, s) AS (
        |  SELECT user_id, rn, v FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.user_id, o.rn,
        |    r.s + ((o.v - r.s) - (((o.v - r.s) % 4 + 4) % 4)) // 4
        |  FROM r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1)
        |SELECT o.user_id, o.ts, o.event_id, o.v AS v_scaled, r.s AS ewma_scaled
        |FROM o JOIN r ON o.user_id = r.user_id AND o.rn = r.rn
        |ORDER BY o.user_id, o.ts, o.event_id""".stripMargin,

    "n113_readability" ->
      // all terms non-negative, so DuckDB's truncating // equals the
      // floor the Spark side takes
      """WITH f AS (SELECT doc_id,
        | CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_words,
        | CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT) AS n_sentences,
        | CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
        | FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        | CAST(CASE WHEN n_words = 0 THEN NULL
        |      ELSE 206835 - (1015 * n_words) // n_sentences
        |                  - (84600 * n_syllables) // n_words END AS BIGINT) AS flesch_x1000
        |FROM f ORDER BY doc_id""".stripMargin,

    "n114_mojibake" ->
      // chr() builds the identical planted suffix; replace() is
      // replace-all in both engines, and the \x{..} hex class parses
      // identically in RE2 and Java regex
      """WITH salted AS (SELECT doc_id,
        | CASE WHEN doc_id % 7 = 0 THEN text || ' caf' || chr(195) || chr(169) ||
        |   ' na' || chr(195) || chr(175) || 've ' || chr(65533) || ' x' ||
        |   chr(133) || 'y ' || chr(195) || chr(171)
        | ELSE text END AS text FROM documents),
        |c AS (SELECT doc_id,
        | CAST(length(text) - length(replace(text, chr(65533), '')) AS BIGINT) AS n_replacement,
        | CAST(len(regexp_extract_all(text, '[\x{80}-\x{9f}]')) AS BIGINT) AS n_c1,
        | CAST(length(text) - length(replace(text, chr(195), '')) AS BIGINT) AS n_atilde
        | FROM salted)
        |SELECT doc_id, n_replacement, n_c1, n_atilde,
        | CAST(CASE WHEN n_replacement > 0 OR n_c1 > 0 OR n_atilde >= 2
        |      THEN 1 ELSE 0 END AS BIGINT) AS is_suspect
        |FROM c ORDER BY doc_id""".stripMargin,

    "n112_audio_resample" ->
      // the n109 sample replay extended through the interpolation:
      // output j sits at input position (j*8000) // 12000 with
      // remainder frac; exact hits (frac = 0) copy, otherwise floor
      // division matches Math.floorDiv on negative samples. n_out =
      // (64-1)*12000/8000 + 1 = 95
      s"""WITH d AS (SELECT doc_id, unnest(generate_series(0, 63)) AS i FROM documents),
         |v0 AS (SELECT doc_id, i, CAST(doc_id * 1000003 + i AS HUGEINT) AS x FROM d),
         |f1 AS (SELECT doc_id, i, xor(x, x >> 33) AS v1 FROM v0),
         |f2 AS (SELECT doc_id, i, xor(y, y >> 33) AS v3
         |       FROM (SELECT doc_id, i, ${mulC("v1", c1, c1lo)} AS y FROM f1)),
         |f3 AS (SELECT doc_id, i, xor(z, z >> 33) AS u
         |       FROM (SELECT doc_id, i, ${mulC("v3", c2, c2lo)} AS z FROM f2)),
         |sm AS (SELECT doc_id, i, CAST(u & 65535 AS BIGINT) - 32768 AS s FROM f3),
         |pos0 AS (SELECT doc_id, unnest(generate_series(0, 94)) AS j FROM documents),
         |ip AS (SELECT doc_id, j, (j * 8000) // 12000 AS pos,
         |               (j * 8000) % 12000 AS frac FROM pos0),
         |nm AS (SELECT ip.doc_id, ip.j, ip.frac,
         |  a.s AS sa, a.s * (12000 - ip.frac) + b.s * ip.frac AS num
         | FROM ip JOIN sm a ON a.doc_id = ip.doc_id AND a.i = ip.pos
         |   LEFT JOIN sm b ON b.doc_id = ip.doc_id AND b.i = ip.pos + 1),
         |r0 AS (SELECT doc_id, j,
         |  -- FLOOR division (DuckDB // truncates toward zero on
         |  -- integers; Math.floorDiv floors on negative numerators)
         |  CASE WHEN frac = 0 THEN sa
         |       ELSE (num - ((num % 12000 + 12000) % 12000)) // 12000 END AS r
         | FROM nm),
         |l2 AS (SELECT doc_id, j, r,
         |  lag(r) OVER (PARTITION BY doc_id ORDER BY j) AS prev FROM r0),
         |a2 AS (SELECT doc_id,
         |  CAST(max(abs(r)) AS BIGINT) AS peak,
         |  CAST(sum(r * r) // 95 AS BIGINT) AS mean_square,
         |  CAST(sum(CASE WHEN prev IS NOT NULL AND (prev < 0) <> (r < 0)
         |           THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
         | FROM l2 GROUP BY 1)
         |SELECT doc_id AS media_id, CAST(8000 AS BIGINT) AS src_rate,
         | CAST(12000 AS BIGINT) AS target_rate, CAST(95 AS BIGINT) AS n_out,
         | peak, mean_square, zero_crossings
         |FROM a2 ORDER BY media_id""".stripMargin,

    "n94_image_dhash" -> pixelDhashOracleSql,

    // the incremental path is recall-lossless (pigeonhole banding), so
    // the oracle is n94's full replay with the victim rule applied to
    // the slice: a slice doc drops iff a qualifying pair names it as
    // the higher side (old ids < 250 <= slice ids, so cross and within
    // victims are both doc_id_b)
    "n163_incremental_hamming" -> {
      val cand = pixelDhashOracleSql
        .replaceAll("(?s)\\nSELECT doc_id_a, doc_id_b,.*$", "").trim
      s"""$cand,
         |victims AS (SELECT DISTINCT doc_id_b FROM cand
         |  WHERE bit_count(xor(sha, shb)) <= 2 AND doc_id_b >= 250)
         |SELECT doc_id FROM d
         |WHERE doc_id >= 250 AND doc_id NOT IN (SELECT doc_id_b FROM victims)
         |ORDER BY doc_id""".stripMargin
    },

    "n108_png_dhash" ->
      // the SAME oracle as n94 on purpose: the PNG fixture encodes the
      // identical cellGray pixels through a REAL deflate stream with
      // all five scanline filters, so one arithmetic replay certifies
      // two independent byte-level decoders (BMP stride walk and PNG
      // inflate+unfilter) against each other
      pixelDhashOracleSql,

    "n111_gif_dhash" ->
      // third container over the same arithmetic truth: the GIF
      // fixture carries the identical cellGray pixels through REAL
      // dictionary-built LZW, so the one replay certifies the LZW
      // decoder too
      pixelDhashOracleSql,

    "q60_sql_udf" ->
      // both UDF bodies inlined
      """WITH c AS (SELECT doc_id, text,
        |  unnest(generate_series(1,
        |    CAST(ceil(strlen(text) / 500.0) AS BIGINT))) AS i
        | FROM documents)
        |SELECT doc_id, CAST(strlen(text) // 100 AS BIGINT) AS bucket,
        | CAST(i AS BIGINT) AS chunk_idx,
        | CAST(strlen(substr(text, CAST((i - 1) * 500 + 1 AS INT), 500)) AS BIGINT) AS piece_len
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "q59_time_range_frame" ->
      """SELECT user_id, ts, event_id,
        | CAST(count(*) OVER w AS BIGINT) AS n_events_1h,
        | round(sum(value) OVER w, 6) AS sum_value_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts, event_id""".stripMargin,

    "q58_regression" ->
      """SELECT l_returnflag,
        | CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
        | round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        | round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
        | round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        | round(corr(l_extendedprice, l_quantity), 6) AS corr_qty
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q56_collation" ->
      // the collation collapse replayed as grouping by lower()
      """WITH mixed AS (SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END AS src,
        |  n_chars FROM documents)
        |SELECT min(lower(src)) AS source_key,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM mixed GROUP BY lower(src)
        |ORDER BY source_key""".stripMargin,

    "q57_variant" ->
      // definitional: the VARIANT round-trip must recover the typed
      // source columns exactly
      """SELECT event_id, event_type AS vtype, user_id AS uid,
        | CAST(event_id % 7 AS BIGINT) AS tag1,
        | CAST(NULL AS BIGINT) AS missing
        |FROM events ORDER BY event_id""".stripMargin,

    "q55_scd2" ->
      // the islands derivation replayed: lag-compare change flags,
      // running-sum version ids, min(ts) starts, lead close-off
      """WITH e AS (SELECT user_id, ts, event_id, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        | FROM events),
        |g AS (SELECT *, sum(CASE WHEN prev IS NULL OR prev <> event_type
        |                    THEN 1 ELSE 0 END)
        |        OVER (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS UNBOUNDED PRECEDING) AS version
        |      FROM e),
        |v AS (SELECT user_id, version, min(event_type) AS event_type,
        |             min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
        |      FROM g GROUP BY user_id, version)
        |SELECT user_id, CAST(version AS BIGINT) AS version, event_type, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to,
        |  n_events
        |FROM v ORDER BY user_id, version""".stripMargin,

    "q54_recursive_cte" ->
      // the same recursion in DuckDB's dialect (DATE + INTEGER)
      """WITH RECURSIVE cal(d) AS (
        |  SELECT DATE '1998-01-01'
        |  UNION ALL
        |  SELECT d + 1 FROM cal WHERE d < DATE '1998-03-31'
        |)
        |SELECT CAST(cal.d AS TIMESTAMP) AS day,
        |       CAST(count(o_orderkey) AS BIGINT) AS n_orders,
        |       round(coalesce(sum(o_totalprice), 0), 2) AS revenue
        |FROM cal LEFT JOIN orders ON CAST(o_orderdate AS DATE) = cal.d
        |GROUP BY cal.d ORDER BY day""".stripMargin,

    "q53_skyline" ->
      // definitional: a frontier row is one no other row strictly
      // dominates (<= price, >= size, at least one strict)
      """SELECT p_partkey, p_size, p_retailprice FROM part a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part b
        |  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
        |    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
        |ORDER BY p_partkey""".stripMargin,

    "n107_kcore" -> kCoreOracleSql(k = 29, rounds = 4),

    // fixpoint oracle: 10 unrolled rounds — peeling is idempotent at
    // the fixpoint, so any round count >= convergence depth replays
    // the converged core exactly
    "n135_kcore_converged" -> kCoreOracleSql(k = 29, rounds = 10, materialized = true),

    "n136_pagerank_dangling" -> {
      val S = graft.ops.Graph.Scale
      val steps = (1 to 3).map { k =>
        s"""dx$k AS (SELECT CAST(coalesce(sum(r.rank), 0) AS BIGINT) AS dsum
           | FROM dang JOIN r${k - 1} r USING (word)),
           |c$k AS (SELECT ed.dst AS word,
           |  CAST(sum((r${k - 1}.rank * ed.wt) // ed.wdeg) AS BIGINT) AS csum
           | FROM ed JOIN r${k - 1} ON ed.src = r${k - 1}.word GROUP BY 1),
           |r$k AS (SELECT nodes.word,
           |  ((15 * $S) // 100) // n +
           |    (85 * (coalesce(c$k.csum, 0) + dsum // n)) // 100 AS rank
           | FROM nodes LEFT JOIN c$k USING (word)
           | CROSS JOIN nn CROSS JOIN dx$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH d AS (SELECT text FROM documents
         | UNION ALL SELECT 'zzdanglehead zzdangletail'),
         |w AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ws
         |      FROM d),
         |w2 AS (SELECT ws FROM w WHERE len(ws) >= 2),
         |p AS (SELECT ws[i] AS a, ws[i+1] AS b
         |      FROM w2, unnest(generate_series(1, len(ws) - 1)) AS t(i)
         |      WHERE ws[i] <> ws[i+1]),
         |e AS (SELECT a AS src, b AS dst, CAST(count(*) AS BIGINT) AS wt
         |      FROM p GROUP BY 1, 2),
         |deg AS (SELECT src, CAST(sum(wt) AS BIGINT) AS wdeg FROM e GROUP BY 1),
         |ed AS (SELECT e.src, e.dst, e.wt, deg.wdeg FROM e JOIN deg USING (src)),
         |nodes AS (SELECT src AS word FROM e UNION SELECT dst FROM e),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |dang AS (SELECT word FROM nodes
         |         WHERE word NOT IN (SELECT src FROM e)),
         |r0 AS (SELECT word, $S // n AS rank FROM nodes CROSS JOIN nn),
         |$steps
         |SELECT word, CAST(rank AS BIGINT) AS rank,
         | CAST(row_number() OVER (ORDER BY rank DESC, word) AS BIGINT) AS rk
         |FROM r3 ORDER BY rank DESC, word LIMIT 25""".stripMargin
    },

    "n141_cc_pointer_jump" ->
      // the n28 recursive-CTE transitive closure — algorithm-
      // independent, so it gates the pointer-jumping variant against
      // the same component-min definition — over the simhash edge set
      // UNION a planted doc_id chain (the high-diameter fixture)
      s"""WITH RECURSIVE $simhashCte,
         |p AS (SELECT a.doc_id AS u, b.doc_id AS v FROM shs a, shs b
         |      WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sh, b.sh)) <= 6),
         |ch AS (SELECT doc_id AS u, doc_id + 1 AS v FROM documents
         |       WHERE doc_id < 249),
         |pp AS (SELECT u, v FROM p UNION SELECT u, v FROM ch),
         |e AS (SELECT u, v FROM pp UNION SELECT v, u FROM pp),
         |reach(u, v) AS (
         |  SELECT u, v FROM e
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u)
         |SELECT u AS doc_id, CAST(least(u, min(v)) AS BIGINT) AS cluster_id
         |FROM reach GROUP BY u ORDER BY doc_id""".stripMargin,

    "n165_incremental_clusters" ->
      // n141's closure VERBATIM: the maintained assignment (old crawl
      // clustered from scratch, slice folded in through the contracted
      // CC) must land on the batch fixpoint over the union, so the
      // old/slice split the engine used cannot appear in the oracle
      s"""WITH RECURSIVE $simhashCte,
         |p AS (SELECT a.doc_id AS u, b.doc_id AS v FROM shs a, shs b
         |      WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sh, b.sh)) <= 6),
         |ch AS (SELECT doc_id AS u, doc_id + 1 AS v FROM documents
         |       WHERE doc_id < 249),
         |pp AS (SELECT u, v FROM p UNION SELECT u, v FROM ch),
         |e AS (SELECT u, v FROM pp UNION SELECT v, u FROM pp),
         |reach(u, v) AS (
         |  SELECT u, v FROM e
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u)
         |SELECT u AS doc_id, CAST(least(u, min(v)) AS BIGINT) AS cluster_id
         |FROM reach GROUP BY u ORDER BY doc_id""".stripMargin,

    "n166_cluster_retraction" ->
      // the closure over exactly the SURVIVING edges (both endpoints
      // keep doc_id % 83 <> 0): removed bridges split the chain into
      // segments, removed-touching simhash edges vanish, and a doc
      // that lost its every edge carries no row — the component-local
      // recompute must reproduce this global re-closure
      s"""WITH RECURSIVE $simhashCte,
         |p AS (SELECT a.doc_id AS u, b.doc_id AS v FROM shs a, shs b
         |      WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sh, b.sh)) <= 6),
         |ch AS (SELECT doc_id AS u, doc_id + 1 AS v FROM documents
         |       WHERE doc_id < 249),
         |pp AS (SELECT u, v FROM p UNION SELECT u, v FROM ch),
         |sv AS (SELECT u, v FROM pp WHERE u % 83 <> 0 AND v % 83 <> 0),
         |e AS (SELECT u, v FROM sv UNION SELECT v, u FROM sv),
         |reach(u, v) AS (
         |  SELECT u, v FROM e
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u)
         |SELECT u AS doc_id, CAST(least(u, min(v)) AS BIGINT) AS cluster_id
         |FROM reach GROUP BY u ORDER BY doc_id""".stripMargin,

    "n142_trustrank" -> {
      // n136's round replay with the seed-conditional teleport: rank
      // mass enters only at the 5 lexicographically-smallest words
      // (CASE == the engine's is_seed 0/1 multiply), and the dangling
      // sum re-enters at the seeds (dsum // ns), not uniformly
      val S = graft.ops.Graph.Scale
      val steps = (1 to 3).map { k =>
        s"""dx$k AS (SELECT CAST(coalesce(sum(r.rank), 0) AS BIGINT) AS dsum
           | FROM dang JOIN r${k - 1} r USING (word)),
           |c$k AS (SELECT ed.dst AS word,
           |  CAST(sum((r${k - 1}.rank * ed.wt) // ed.wdeg) AS BIGINT) AS csum
           | FROM ed JOIN r${k - 1} ON ed.src = r${k - 1}.word GROUP BY 1),
           |r$k AS (SELECT nf.word,
           |  nf.is_seed * (((15 * $S) // 100) // ns) +
           |    (85 * (coalesce(c$k.csum, 0) + nf.is_seed * (dsum // ns))) // 100 AS rank
           | FROM nf LEFT JOIN c$k USING (word)
           | CROSS JOIN nn CROSS JOIN dx$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH d AS (SELECT text FROM documents
         | UNION ALL SELECT 'zzdanglehead zzdangletail'),
         |w AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ws
         |      FROM d),
         |w2 AS (SELECT ws FROM w WHERE len(ws) >= 2),
         |p AS (SELECT ws[i] AS a, ws[i+1] AS b
         |      FROM w2, unnest(generate_series(1, len(ws) - 1)) AS t(i)
         |      WHERE ws[i] <> ws[i+1]),
         |e AS (SELECT a AS src, b AS dst, CAST(count(*) AS BIGINT) AS wt
         |      FROM p GROUP BY 1, 2),
         |deg AS (SELECT src, CAST(sum(wt) AS BIGINT) AS wdeg FROM e GROUP BY 1),
         |ed AS (SELECT e.src, e.dst, e.wt, deg.wdeg FROM e JOIN deg USING (src)),
         |nodes AS (SELECT src AS word FROM e UNION SELECT dst FROM e),
         |seeds AS (SELECT word FROM nodes ORDER BY word LIMIT 5),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS ns FROM seeds),
         |nf AS (SELECT nodes.word,
         |  CASE WHEN s.word IS NULL THEN 0 ELSE 1 END AS is_seed
         | FROM nodes LEFT JOIN seeds s USING (word)),
         |dang AS (SELECT word FROM nodes
         |         WHERE word NOT IN (SELECT src FROM e)),
         |r0 AS (SELECT word, is_seed * ($S // ns) AS rank
         |       FROM nf CROSS JOIN nn),
         |$steps
         |SELECT word, CAST(rank AS BIGINT) AS rank,
         | CAST(row_number() OVER (ORDER BY rank DESC, word) AS BIGINT) AS rk
         |FROM r3 ORDER BY rank DESC, word LIMIT 25""".stripMargin
    },

    "n143_hits" -> {
      // replay of both I/O half-rounds per iteration: raw sums in
      // BIGINT, the one overflow-prone normalization multiply in
      // HUGEINT (the engine uses DECIMAL(38,0) for the same step),
      // cast back to BIGINT; vector CTEs MATERIALIZED (the n135
      // lesson: DuckDB inlines chained CTEs exponentially otherwise)
      val S = graft.ops.Graph.Scale
      val rounds = (1 to 2).map { k =>
        s"""a${k}r AS (SELECT e.dst AS word,
           |  CAST(sum(h${k - 1}.hub * e.wt) AS BIGINT) AS araw
           | FROM e JOIN h${k - 1} ON e.src = h${k - 1}.word GROUP BY 1),
           |as$k AS (SELECT CAST(sum(araw) AS BIGINT) AS asum FROM a${k}r),
           |a$k AS MATERIALIZED (SELECT nodes.word,
           |  CAST((CAST(coalesce(araw, 0) AS HUGEINT) * $S) // asum AS BIGINT) AS auth
           | FROM nodes LEFT JOIN a${k}r USING (word) CROSS JOIN as$k),
           |h${k}r AS (SELECT e.src AS word,
           |  CAST(sum(a$k.auth * e.wt) AS BIGINT) AS hraw
           | FROM e JOIN a$k ON e.dst = a$k.word GROUP BY 1),
           |hs$k AS (SELECT CAST(sum(hraw) AS BIGINT) AS hsum FROM h${k}r),
           |h$k AS MATERIALIZED (SELECT nodes.word,
           |  CAST((CAST(coalesce(hraw, 0) AS HUGEINT) * $S) // hsum AS BIGINT) AS hub
           | FROM nodes LEFT JOIN h${k}r USING (word) CROSS JOIN hs$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH d AS (SELECT text FROM documents
         | UNION ALL SELECT 'zzdanglehead zzdangletail'),
         |w AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ws
         |      FROM d),
         |w2 AS (SELECT ws FROM w WHERE len(ws) >= 2),
         |p AS (SELECT ws[i] AS a, ws[i+1] AS b
         |      FROM w2, unnest(generate_series(1, len(ws) - 1)) AS t(i)
         |      WHERE ws[i] <> ws[i+1]),
         |e AS (SELECT a AS src, b AS dst, CAST(count(*) AS BIGINT) AS wt
         |      FROM p GROUP BY 1, 2),
         |nodes AS (SELECT src AS word FROM e UNION SELECT dst FROM e),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
         |h0 AS (SELECT word, $S // n AS hub FROM nodes CROSS JOIN nn),
         |$rounds
         |SELECT word, hub, auth,
         | CAST(row_number() OVER (ORDER BY auth DESC, word) AS BIGINT) AS rk
         |FROM h2 JOIN a2 USING (word)
         |ORDER BY auth DESC, word LIMIT 25""".stripMargin
    },

    "n144_gopher_rules" ->
      // decoration replay + the same cross-multiplied integer
      // thresholds; words = regex whitespace split, lines = chr(10)
      // split, '…' counted via length() (characters, not strlen bytes)
      """WITH g AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 17 = 0 THEN 'tiny start' ELSE text END)
        |  || repeat(' #', CAST(doc_id % 9 AS INT))
        |  || repeat(' 42', CAST(doc_id % 23 AS INT))
        |  || (CASE WHEN doc_id % 3 = 0 THEN ' and the of' ELSE ' the' END)
        |  || (CASE WHEN doc_id % 17 = 0 THEN repeat(chr(10) || '- b', 10) ELSE '' END)
        |  || (CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'it goes on...' ||
        |        chr(10) || 'more soon...' || chr(10) || 'fin' ELSE '' END) AS text
        | FROM documents),
        |f AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws,
        |  string_split(text, chr(10)) AS ls,
        |  length(text) - length(replace(text, '#', '')) AS n_hash,
        |  (length(text) - length(replace(text, '...', ''))) // 3 AS n_dots,
        |  length(text) - length(replace(text, '…', '')) AS n_uni
        | FROM g),
        |c AS (SELECT doc_id,
        |  CAST(len(ws) AS BIGINT) AS n_words,
        |  CAST(coalesce(list_sum(list_transform(ws, x -> length(x))), 0) AS BIGINT)
        |    AS n_word_chars,
        |  CAST(n_hash AS BIGINT) AS n_hash,
        |  CAST(n_dots + n_uni AS BIGINT) AS n_ellipsis,
        |  CAST(len(ls) AS BIGINT) AS n_lines,
        |  CAST(len(list_filter(ls, x -> starts_with(ltrim(x), '- ')
        |    OR starts_with(ltrim(x), '* ') OR starts_with(ltrim(x), '•')))
        |    AS BIGINT) AS n_bullet_lines,
        |  CAST(len(list_filter(ls, x -> ends_with(rtrim(x), '...')
        |    OR ends_with(rtrim(x), '…'))) AS BIGINT) AS n_ellipsis_lines,
        |  CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
        |    AS BIGINT) AS n_alpha_words,
        |  CAST((CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'the') THEN 1 ELSE 0 END)
        |     + (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'be') THEN 1 ELSE 0 END)
        |     + (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'to') THEN 1 ELSE 0 END)
        |     + (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'of') THEN 1 ELSE 0 END)
        |     + (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'and') THEN 1 ELSE 0 END)
        |     + (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'that') THEN 1 ELSE 0 END)
        |     + (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'have') THEN 1 ELSE 0 END)
        |     + (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'with') THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_stopword_kinds
        | FROM f)
        |SELECT doc_id, n_words, n_word_chars, n_hash, n_ellipsis, n_lines,
        |  n_bullet_lines, n_ellipsis_lines, n_alpha_words, n_stopword_kinds,
        |  CAST(CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS BIGINT) AS ok_word_count,
        |  CAST(CASE WHEN 3 * n_words <= n_word_chars AND n_word_chars <= 10 * n_words THEN 1 ELSE 0 END AS BIGINT) AS ok_mean_word_len,
        |  CAST(CASE WHEN 10 * n_hash <= n_words THEN 1 ELSE 0 END AS BIGINT) AS ok_hash_ratio,
        |  CAST(CASE WHEN 10 * n_ellipsis <= n_words THEN 1 ELSE 0 END AS BIGINT) AS ok_ellipsis_ratio,
        |  CAST(CASE WHEN 10 * n_bullet_lines <= 9 * n_lines THEN 1 ELSE 0 END AS BIGINT) AS ok_bullet_lines,
        |  CAST(CASE WHEN 10 * n_ellipsis_lines <= 3 * n_lines THEN 1 ELSE 0 END AS BIGINT) AS ok_ellipsis_lines,
        |  CAST(CASE WHEN 5 * n_alpha_words >= 4 * n_words THEN 1 ELSE 0 END AS BIGINT) AS ok_alpha_words,
        |  CAST(CASE WHEN n_stopword_kinds >= 2 THEN 1 ELSE 0 END AS BIGINT) AS ok_stopwords,
        |  CAST(CASE WHEN n_words BETWEEN 50 AND 100000
        |    AND 3 * n_words <= n_word_chars AND n_word_chars <= 10 * n_words
        |    AND 10 * n_hash <= n_words
        |    AND 10 * n_ellipsis <= n_words
        |    AND 10 * n_bullet_lines <= 9 * n_lines
        |    AND 10 * n_ellipsis_lines <= 3 * n_lines
        |    AND 5 * n_alpha_words >= 4 * n_words
        |    AND n_stopword_kinds >= 2 THEN 1 ELSE 0 END AS BIGINT) AS gopher_pass
        |FROM c ORDER BY doc_id""".stripMargin,

    "n145_c4_clean" ->
      // decoration replay; line filter = terminal punct + >= 5 regex-
      // split words + no 'javascript'; page gates on the ORIGINAL
      // decorated text; reassembly via string_agg ORDER BY line_idx
      // (the n50 convention)
      """WITH deco AS (SELECT doc_id,
        |  'A fine opening statement stands here today.' || chr(10) || text ||
        |  (CASE WHEN doc_id % 2 = 0 THEN '.' ELSE '' END) ||
        |  chr(10) || 'short line.' ||
        |  (CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'this page needs javascript to render.' ELSE '' END) ||
        |  (CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet today.' ELSE '' END) ||
        |  (CASE WHEN doc_id % 13 = 0 THEN ' {' ELSE '' END) AS text
        | FROM documents),
        |pages AS (SELECT doc_id,
        |  CAST((length(text) - length(replace(text, '.', '')))
        |     + (length(text) - length(replace(text, '!', '')))
        |     + (length(text) - length(replace(text, '?', ''))) AS BIGINT) AS n_sentences,
        |  (NOT (contains(text, '{') OR contains(lower(text), 'lorem ipsum')
        |    OR len(list_filter(regexp_split_to_array(text, '\s+'),
        |         x -> lower(x) IN ('vector', 'laser'))) > 0)) AS page_ok
        | FROM deco),
        |lns AS (SELECT doc_id,
        |  unnest(generate_series(1, len(string_split(text, chr(10))))) AS line_idx,
        |  string_split(text, chr(10)) AS ls
        | FROM deco),
        |lines AS (SELECT doc_id, line_idx, ls[line_idx] AS line FROM lns),
        |kept AS (SELECT doc_id, line_idx, line FROM lines
        | WHERE (ends_with(rtrim(line), '.') OR ends_with(rtrim(line), '!')
        |     OR ends_with(rtrim(line), '?') OR ends_with(rtrim(line), '"'))
        |   AND len(list_filter(regexp_split_to_array(line, '\s+'), x -> x <> '')) >= 5
        |   AND NOT contains(lower(line), 'javascript')),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines_kept,
        |  string_agg(line, chr(10) ORDER BY line_idx) AS text_clean
        | FROM kept GROUP BY doc_id)
        |SELECT p.doc_id,
        |  CAST(CASE WHEN p.page_ok AND p.n_sentences >= 3 THEN 1 ELSE 0 END AS BIGINT) AS kept,
        |  p.n_sentences,
        |  CAST(coalesce(a.n_lines_kept, 0) AS BIGINT) AS n_lines_kept,
        |  CAST(length(coalesce(a.text_clean, '')) AS BIGINT) AS n_chars_clean,
        |  md5(coalesce(a.text_clean, '')) AS text_md5
        |FROM pages p LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin,

    "n146_weighted_quantiles" ->
      // the n86 definitional stance, weighted: smallest v whose
      // cumulative TOKEN mass reaches ceil(q * totalW) — one window
      // over value-grouped weight sums; ceil(q * w) is the same single
      // IEEE multiply on both engines
      """WITH t AS (SELECT CAST(n_chars AS BIGINT) AS v,
        |  CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS w
        | FROM documents),
        |tp AS (SELECT v, w FROM t WHERE v IS NOT NULL AND w > 0),
        |tot AS (SELECT CAST(sum(w) AS BIGINT) AS total_w FROM tp),
        |probes(q) AS (VALUES (0.25), (0.5), (0.9), (0.99)),
        |r AS (SELECT CAST(q AS DOUBLE) AS q, total_w,
        |       greatest(CAST(ceil(q * total_w) AS BIGINT), 1) AS r
        |      FROM probes CROSS JOIN tot),
        |cum AS (SELECT v, CAST(sum(sum(w)) OVER (ORDER BY v) AS BIGINT) AS vcum
        |        FROM tp GROUP BY v)
        |SELECT r.q, r.total_w, r.r, CAST(min(cum.v) AS BIGINT) AS exact_value
        |FROM r JOIN cum ON cum.vcum >= r.r
        |GROUP BY 1, 2, 3 ORDER BY q""".stripMargin,

    "n149_weighted_quantiles_by_source" ->
      // the n91 definitional stance, weighted: per group, smallest v
      // whose cumulative TOKEN mass reaches ceil(q * group total)
      """WITH t AS (SELECT source AS grp, CAST(n_chars AS BIGINT) AS v,
        |  CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS w
        | FROM documents),
        |tp AS (SELECT grp, v, w FROM t WHERE v IS NOT NULL AND w > 0),
        |tw AS (SELECT grp, CAST(sum(w) AS BIGINT) AS total_w FROM tp GROUP BY 1),
        |probes(q) AS (VALUES (0.5), (0.9)),
        |r AS (SELECT grp, CAST(q AS DOUBLE) AS q, total_w,
        |       greatest(CAST(ceil(q * total_w) AS BIGINT), 1) AS r
        |      FROM tw CROSS JOIN probes),
        |cum AS (SELECT grp, v,
        |  CAST(sum(sum(w)) OVER (PARTITION BY grp ORDER BY v) AS BIGINT) AS vcum
        | FROM tp GROUP BY grp, v)
        |SELECT r.grp AS source, r.q, r.total_w, r.r,
        | CAST(min(cum.v) AS BIGINT) AS exact_value
        |FROM r JOIN cum ON cum.grp = r.grp AND cum.vcum >= r.r
        |GROUP BY 1, 2, 3, 4 ORDER BY source, q""".stripMargin,

    "n147_rbo" -> {
      // n123's two ranking CTEs (ranks kept), then the RBO fold: the
      // same driver-computed weight literals (shortest-round-trip
      // doubles re-parse to identical bits), zero-overlap depths kept
      // as 0.0 terms so both engines fold exactly k terms d-ascending
      // (list_reduce's first element == Spark's 0.0 + t1)
      val k = 10; val p = 0.9
      val w = Array.iterate(1.0, k + 1)(_ * p)
      val wvals = (1 to k).map(d => s"($d, ${w(d - 1)})").mkString(", ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |qe AS (SELECT vec_id AS query_id, v AS q_v FROM e WHERE vec_id < 5),
         |tr AS (SELECT query_id, vec_id, rnk AS ra FROM (
         |  SELECT qe.query_id, e.vec_id,
         |   row_number() OVER (PARTITION BY qe.query_id
         |     ORDER BY list_cosine_similarity(e.v, qe.q_v) DESC, e.vec_id) AS rnk
         |  FROM e, qe WHERE e.vec_id <> qe.query_id) WHERE rnk <= $k),
         |s AS (SELECT vec_id, v,
         |       list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e),
         |c AS (SELECT vec_id,
         |       CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
         |            ELSE list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INT))
         |       END AS codes FROM s),
         |q AS (SELECT vec_id AS query_id, codes AS q_codes FROM c WHERE vec_id < 5),
         |cd AS (SELECT query_id, vec_id, rnk AS rb FROM (
         |  SELECT q.query_id, c.vec_id,
         |   row_number() OVER (PARTITION BY q.query_id ORDER BY
         |    CASE WHEN list_dot_product(c.codes, c.codes) = 0
         |           OR list_dot_product(q.q_codes, q.q_codes) = 0 THEN 0.0
         |    ELSE CAST(list_dot_product(c.codes, q.q_codes) AS DOUBLE) /
         |      (sqrt(CAST(list_dot_product(c.codes, c.codes) AS DOUBLE)) *
         |       sqrt(CAST(list_dot_product(q.q_codes, q.q_codes) AS DOUBLE)))
         |    END DESC, c.vec_id) AS rnk
         |  FROM c, q WHERE c.vec_id <> q.query_id) WHERE rnk <= $k),
         |wts(d, w) AS (VALUES $wvals),
         |qs2 AS (SELECT DISTINCT query_id FROM tr
         |        UNION SELECT DISTINCT query_id FROM cd),
         |m AS (SELECT tr.query_id, greatest(tr.ra, cd.rb) AS m
         |      FROM tr JOIN cd
         |        ON tr.query_id = cd.query_id AND tr.vec_id = cd.vec_id),
         |ag AS (SELECT q2.query_id, w.d, w.w,
         |        CAST(coalesce(sum(CASE WHEN m.m <= w.d THEN 1 ELSE 0 END), 0)
         |          AS BIGINT) AS cdd
         |       FROM qs2 q2 CROSS JOIN wts w
         |       LEFT JOIN m ON m.query_id = q2.query_id
         |       GROUP BY 1, 2, 3),
         |fold AS (SELECT query_id,
         |          list_reduce(list(w * (cdd / CAST(d AS DOUBLE)) ORDER BY d),
         |            (a, b) -> a + b) AS sm,
         |          max(CASE WHEN d = $k THEN cdd END) AS cdk
         |         FROM ag GROUP BY query_id)
         |SELECT query_id, CAST(cdk AS BIGINT) AS n_overlap_k,
         | ${1.0 - p} * sm AS rbo_base,
         | ${1.0 - p} * sm + ${w(k)} * (cdk / CAST($k AS DOUBLE)) AS rbo_ext
         |FROM fold ORDER BY query_id""".stripMargin
    },

    "n148_weak_label" ->
      // vote replay via list_contains over the lowercased token list;
      // the argmax tie-break is a CASE chain in alphabetic label order
      // (sql, stream, vec) — exactly the engine's (votes, -rank)
      // greatest-struct device
      """WITH ws AS (SELECT doc_id,
        |  list_transform(list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> x <> ''), x -> lower(x)) AS ws
        | FROM documents),
        |v AS (SELECT doc_id,
        |  CAST((CASE WHEN list_contains(ws, 'table') THEN 1 ELSE 0 END)
        |     + (CASE WHEN list_contains(ws, 'query') THEN 1 ELSE 0 END)
        |     + (CASE WHEN list_contains(ws, 'join') THEN 1 ELSE 0 END)
        |     + (CASE WHEN list_contains(ws, 'row') THEN 1 ELSE 0 END)
        |    AS BIGINT) AS votes_sql,
        |  CAST((CASE WHEN list_contains(ws, 'stream') THEN 1 ELSE 0 END)
        |     + (CASE WHEN list_contains(ws, 'window') THEN 1 ELSE 0 END)
        |     + (CASE WHEN list_contains(ws, 'batch') THEN 1 ELSE 0 END)
        |    AS BIGINT) AS votes_stream,
        |  CAST((CASE WHEN list_contains(ws, 'vector') THEN 1 ELSE 0 END)
        |     + (CASE WHEN list_contains(ws, 'group') THEN 1 ELSE 0 END)
        |     + (CASE WHEN list_contains(ws, 'hash') THEN 1 ELSE 0 END)
        |    AS BIGINT) AS votes_vec
        | FROM ws)
        |SELECT doc_id, votes_sql, votes_stream, votes_vec,
        | CAST(votes_sql + votes_stream + votes_vec AS BIGINT) AS n_fired,
        | CASE WHEN votes_sql + votes_stream + votes_vec = 0 THEN 'abstain'
        |      WHEN votes_sql >= votes_stream AND votes_sql >= votes_vec THEN 'sql'
        |      WHEN votes_stream >= votes_vec THEN 'stream'
        |      ELSE 'vec' END AS label,
        | CAST(greatest(votes_sql, votes_stream, votes_vec) AS BIGINT) AS n_votes
        |FROM v ORDER BY doc_id""".stripMargin,

    "n106_containment" -> // definitional: exact containment over any-shared-gram pairs
      s"""WITH d0 AS (SELECT doc_id, text FROM documents),
         |aug AS (
         | SELECT doc_id, text FROM d0
         | UNION ALL
         | SELECT 9600001, array_to_string(
         |   list_filter(string_split_regex(text, '\\s+'), x -> x <> '')[6:25], ' ')
         |  FROM d0 WHERE doc_id = 0
         | UNION ALL
         | SELECT 9600002, 'wrapper header boilerplate ' || text || ' trailing footer block'
         |  FROM d0 WHERE doc_id = 1),
         |base AS (SELECT doc_id,
         |  list_distinct(list_transform(generate_series(1, greatest(len(ws) - 2, 1)),
         |    j -> ${fnvSql("array_to_string(ws[j:j+2], ' ')")})) AS hs
         | FROM (SELECT doc_id,
         |   list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
         |  FROM aug)),
         |g AS (SELECT doc_id, len(hs) AS sz, hs FROM base WHERE len(hs) > 0),
         |exx AS (SELECT doc_id, unnest(hs) AS h FROM g),
         |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
         |         FROM exx a JOIN exx b ON a.h = b.h AND a.doc_id <> b.doc_id),
         |v AS (SELECT da AS doc_id_contained, db AS doc_id_container,
         |  len(list_intersect(ga.hs, gb.hs)) AS inter, ga.sz AS la
         | FROM cand JOIN g ga ON ga.doc_id = da JOIN g gb ON gb.doc_id = db)
         |SELECT doc_id_contained, doc_id_container,
         | round(CAST(inter AS DOUBLE) / la, 6) AS containment
         |FROM v WHERE CAST(inter AS DOUBLE) / la >= 0.9
         |ORDER BY doc_id_contained, doc_id_container""".stripMargin,

    "n105_multi_phrase" -> // definitional per phrase, unioned
      """WITH d AS (SELECT doc_id, text FROM documents
        | UNION ALL SELECT 9500002,
        |  'alpha beta gamma delta filler words alpha beta gamma delta'),
        |w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |      FROM d),
        |m AS (
        | SELECT 'bench1' AS phrase_id, doc_id, i AS pos
        |  FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i)
        |  WHERE len(ws) >= 3 AND ws[i] = 'slow' AND ws[i+1] = 'hash' AND ws[i+2] = 'batch'
        | UNION ALL
        | SELECT 'bench2', doc_id, i
        |  FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i)
        |  WHERE len(ws) >= 3 AND ws[i] = 'stream' AND ws[i+1] = 'table' AND ws[i+2] = 'hash'
        | UNION ALL
        | SELECT 'planted', doc_id, i
        |  FROM w, unnest(generate_series(1, len(ws) - 3)) AS t(i)
        |  WHERE len(ws) >= 4 AND ws[i] = 'alpha' AND ws[i+1] = 'beta'
        |    AND ws[i+2] = 'gamma' AND ws[i+3] = 'delta')
        |SELECT phrase_id, doc_id, CAST(pos AS BIGINT) AS pos FROM m
        |ORDER BY phrase_id, doc_id, pos""".stripMargin,

    "n173_phrase_index" -> // n105's definition over the SURVIVORS
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id % 103 <> 0
        | UNION ALL SELECT 9500002,
        |  'alpha beta gamma delta filler words alpha beta gamma delta'),
        |w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |      FROM d),
        |m AS (
        | SELECT 'bench1' AS phrase_id, doc_id, i AS pos
        |  FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i)
        |  WHERE len(ws) >= 3 AND ws[i] = 'slow' AND ws[i+1] = 'hash' AND ws[i+2] = 'batch'
        | UNION ALL
        | SELECT 'bench2', doc_id, i
        |  FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i)
        |  WHERE len(ws) >= 3 AND ws[i] = 'stream' AND ws[i+1] = 'table' AND ws[i+2] = 'hash'
        | UNION ALL
        | SELECT 'planted', doc_id, i
        |  FROM w, unnest(generate_series(1, len(ws) - 3)) AS t(i)
        |  WHERE len(ws) >= 4 AND ws[i] = 'alpha' AND ws[i+1] = 'beta'
        |    AND ws[i+2] = 'gamma' AND ws[i+3] = 'delta')
        |SELECT phrase_id, doc_id, CAST(pos AS BIGINT) AS pos FROM m
        |ORDER BY phrase_id, doc_id, pos""".stripMargin,

    "n174_benchmark_lifecycle" -> {
      // the retracted two-suite index must equal the from-scratch
      // single-suite recompute, so the oracle is n167's replay with
      // eval = suite A and train excluding BOTH suites — the lifecycle
      // (append then retract) cannot appear in a correct oracle
      val thr = graft.ops.Sampling.hexThreshold(0.1)
      val grams = """list_distinct(list_transform(
        | generate_series(1, len(ws) - 4),
        | i -> array_to_string(ws[i:i+4], ' ')))""".stripMargin.replace("\n", "")
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |tg AS (SELECT doc_id, unnest($grams) AS gram FROM w
         |       WHERE NOT (substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$thr')
         |         AND doc_id % 7 <> 0),
         |eg AS (SELECT DISTINCT unnest($grams) AS gram FROM w
         |       WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$thr')
         |SELECT tg.doc_id, count(*) AS n_grams, count(eg.gram) AS n_shared,
         | CAST(count(eg.gram) AS DOUBLE) / count(*) AS contamination
         |FROM tg LEFT JOIN eg ON tg.gram = eg.gram
         |GROUP BY tg.doc_id ORDER BY tg.doc_id""".stripMargin
    },

    "n104_heavy_hitters_by_source" -> // definitional per group
      """WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS word
        |           FROM documents),
        |f AS (SELECT source, word, CAST(count(*) AS BIGINT) AS cnt
        |      FROM w WHERE word <> '' GROUP BY 1, 2),
        |n AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n FROM f GROUP BY 1)
        |SELECT f.source, f.word, f.cnt FROM f JOIN n ON n.source = f.source
        |WHERE f.cnt * 24 > n.n
        |ORDER BY f.source, f.cnt DESC, f.word""".stripMargin,

    "n103_phrase_search" -> // definitional: consecutive-word equality
      """WITH d AS (SELECT doc_id, text FROM documents
        | UNION ALL SELECT 9500001, 'prefix slow hash batch suffix slow hash batch'),
        |w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |      FROM d),
        |m AS (SELECT doc_id, i AS pos
        |      FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i)
        |      WHERE len(ws) >= 3 AND ws[i] = 'slow' AND ws[i+1] = 'hash'
        |        AND ws[i+2] = 'batch')
        |SELECT doc_id, CAST(pos AS BIGINT) AS pos FROM m
        |ORDER BY doc_id, pos""".stripMargin,

    "n102_vocab_drift" ->
      """WITH old_d AS (SELECT text FROM documents WHERE doc_id % 2 = 0
        | UNION ALL SELECT repeat('vanishterm ', 5) || repeat('downword ', 14) || 'upword'),
        |new_d AS (SELECT text FROM documents WHERE doc_id % 2 = 1
        | UNION ALL SELECT repeat('novelterm ', 5) || repeat('upword ', 9) || 'downword'),
        |oc AS (SELECT word, CAST(count(*) AS BIGINT) AS c_old
        |       FROM (SELECT unnest(string_split(text, ' ')) AS word FROM old_d)
        |       WHERE word <> '' GROUP BY 1),
        |nc AS (SELECT word, CAST(count(*) AS BIGINT) AS c_new
        |       FROM (SELECT unnest(string_split(text, ' ')) AS word FROM new_d)
        |       WHERE word <> '' GROUP BY 1),
        |j AS (SELECT word, coalesce(c_old, 0) AS c_old, coalesce(c_new, 0) AS c_new
        |      FROM oc FULL OUTER JOIN nc USING (word)),
        |t AS (SELECT CAST(sum(c_old) AS BIGINT) AS n_old,
        |             CAST(sum(c_new) AS BIGINT) AS n_new FROM j)
        |SELECT word, c_old, c_new,
        | CASE WHEN c_old = 0 AND c_new >= 5 THEN 'new'
        |      WHEN c_new = 0 AND c_old >= 5 THEN 'vanished'
        |      WHEN c_old = 0 OR c_new = 0 THEN 'rare'
        |      WHEN c_new * n_old > 2 * c_old * n_new THEN 'up'
        |      WHEN c_old * n_new > 2 * c_new * n_old THEN 'down'
        |      ELSE 'stable' END AS drift
        |FROM j, t ORDER BY word""".stripMargin,

    "n101_exif_orientation" ->
      """SELECT doc_id AS media_id,
        | CAST(1 + doc_id % 8 AS BIGINT) AS orientation,
        | CAST(CASE WHEN 1 + doc_id % 8 >= 5 THEN 16 + (doc_id // 7) % 1000
        |      ELSE 16 + doc_id % 1000 END AS BIGINT) AS display_w,
        | CAST(CASE WHEN 1 + doc_id % 8 >= 5 THEN 16 + doc_id % 1000
        |      ELSE 16 + (doc_id // 7) % 1000 END AS BIGINT) AS display_h
        |FROM documents ORDER BY media_id""".stripMargin,

    "n100_cdc_chunks" -> {
      val shared = "the content defined chunking boundary stream re " +
        "synchronizes after any prefix shift because cut points depend " +
        "only on the local window bytes"
      s"""WITH d AS (SELECT doc_id, text FROM documents
         | UNION ALL SELECT * FROM (VALUES
         |  (9300001, 'intro A $shared tail one'),
         |  (9300002, 'a completely different and much longer preamble here $shared other ending')) v(doc_id, text)),
         |pos AS (SELECT doc_id, text, unnest(generate_series(8, strlen(text))) AS i
         |        FROM d WHERE strlen(text) >= 8),
         |b AS (SELECT doc_id, i FROM pos
         |      WHERE (${fnvSql("substr(text, CAST(i AS INT) - 7, 8)")}) % 32 = 0),
         |bl AS (SELECT doc_id, list_sort(list(i)) AS bs FROM b GROUP BY 1),
         |cuts AS (SELECT d.doc_id, d.text,
         |  list_prepend(CAST(0 AS BIGINT),
         |    list_append(coalesce(bl.bs, CAST([] AS BIGINT[])), strlen(d.text))) AS cs
         | FROM d LEFT JOIN bl USING (doc_id)),
         |ch AS (SELECT doc_id,
         |  substr(text, CAST(cs[k] AS INT) + 1, CAST(cs[k+1] - cs[k] AS INT)) AS chunk
         | FROM cuts, unnest(generate_series(1, len(cs) - 1)) AS t(k)),
         |chf AS (SELECT doc_id, chunk FROM ch WHERE strlen(chunk) > 0),
         |dg AS (SELECT doc_id, chunk,
         |  CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
         |       THEN u - CAST('18446744073709551616' AS HUGEINT)
         |       ELSE u END AS BIGINT) AS digest
         | FROM (SELECT doc_id, chunk, ${fnvSql("chunk")} AS u FROM chf))
         |SELECT digest, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         | CAST(count(*) AS BIGINT) AS n_total,
         | CAST(min(doc_id) AS BIGINT) AS min_doc,
         | CAST(max(strlen(chunk)) AS BIGINT) AS chunk_len
         |FROM dg GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
         |ORDER BY digest""".stripMargin
    },

    "n99_top_component" -> principalProjectionOracleSql(iters = 3),

    "q46_try_arithmetic" ->
      """SELECT o_orderkey,
        | round(o_totalprice / nullif(o_custkey % 7, 0), 6) AS ratio,
        | try_cast(CASE WHEN o_orderkey % 3 = 0
        |   THEN CAST(o_orderkey AS VARCHAR)
        |   ELSE o_orderpriority END AS BIGINT) AS parsed
        |FROM orders ORDER BY o_orderkey LIMIT 200""".stripMargin,

    "q47_listagg" ->
      """SELECT o_orderstatus,
        | string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS keys
        |FROM orders WHERE o_orderkey < 120
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "n98_ip_prefix_join" -> // definitional: max prefix_len over levels
      s"""WITH ids AS (SELECT doc_id FROM documents),
         |h0 AS (SELECT doc_id, CAST(doc_id AS HUGEINT) AS x FROM ids),
         |f1 AS (SELECT doc_id, xor(x, x >> 33) AS v1 FROM h0),
         |f2 AS (SELECT doc_id, xor(y, y >> 33) AS v3
         |       FROM (SELECT doc_id, ${mulC("v1", c1, c1lo)} AS y FROM f1)),
         |f3 AS (SELECT doc_id, xor(z, z >> 33) AS u
         |       FROM (SELECT doc_id, ${mulC("v3", c2, c2lo)} AS z FROM f2)),
         |ip AS (SELECT doc_id, CAST(u & 4294967295 AS BIGINT) AS ip FROM f3),
         |d8 AS (SELECT DISTINCT (ip & 4278190080) AS m,
         |        'p8-' || CAST(ip & 4278190080 AS VARCHAR) AS label
         |       FROM ip WHERE doc_id % 5 = 0),
         |d16 AS (SELECT DISTINCT (ip & 4294901760) AS m,
         |        'p16-' || CAST(ip & 4294901760 AS VARCHAR) AS label
         |       FROM ip WHERE doc_id % 13 = 0),
         |d24 AS (SELECT DISTINCT (ip & 4294967040) AS m,
         |        'p24-' || CAST(ip & 4294967040 AS VARCHAR) AS label
         |       FROM ip WHERE doc_id % 97 = 0),
         |matched AS (
         | SELECT i.doc_id, i.ip, 24 AS prefix_len, d.label
         |   FROM ip i JOIN d24 d ON (i.ip & 4294967040) = d.m
         | UNION ALL SELECT i.doc_id, i.ip, 16, d.label
         |   FROM ip i JOIN d16 d ON (i.ip & 4294901760) = d.m
         | UNION ALL SELECT i.doc_id, i.ip, 8, d.label
         |   FROM ip i JOIN d8 d ON (i.ip & 4278190080) = d.m),
         |best AS (SELECT doc_id, ip, prefix_len, label,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY prefix_len DESC) AS rk
         | FROM matched)
         |SELECT doc_id, ip, CAST(prefix_len AS BIGINT) AS prefix_len, label
         |FROM best WHERE rk = 1 ORDER BY doc_id""".stripMargin,

    "n97_word_triangles" -> // definitional: ordered 3-way edge join
      """WITH w AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |           FROM documents),
        |w2 AS (SELECT ws FROM w WHERE len(ws) >= 2),
        |p AS (SELECT ws[i] AS a, ws[i+1] AS b
        |      FROM w2, unnest(generate_series(1, len(ws) - 1)) AS t(i)
        |      WHERE ws[i] <> ws[i+1]),
        |und AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM p),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |        FROM und e1
        |        JOIN und e2 ON e2.u = e1.v
        |        JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v),
        |x AS (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        |      UNION ALL SELECT c FROM tri)
        |SELECT node AS word, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM x GROUP BY 1 ORDER BY n_triangles DESC, word""".stripMargin,

    "n96_url_canonical" ->
      """WITH d AS (SELECT doc_id, doc_id // 5 AS g, doc_id % 5 AS m FROM documents),
        |u AS (SELECT doc_id, CASE m
        |  WHEN 0 THEN 'https://example' || CAST(g AS VARCHAR) || '.com/p' || CAST(g AS VARCHAR) || '?a=1&b=2'
        |  WHEN 1 THEN 'HTTPS://EXAMPLE' || CAST(g AS VARCHAR) || '.COM:443/p' || CAST(g AS VARCHAR) || '?b=2&a=1'
        |  WHEN 2 THEN 'https://example' || CAST(g AS VARCHAR) || '.com/p' || CAST(g AS VARCHAR) || '?a=1&utm_source=feed&b=2'
        |  WHEN 3 THEN 'https://example' || CAST(g AS VARCHAR) || '.com/p' || CAST(g AS VARCHAR) || '?a=1&b=2#section'
        |  ELSE 'https://example' || CAST(g AS VARCHAR) || '.com:8080/p' || CAST(g AS VARCHAR) || '?a=1&b=2' END AS url
        | FROM d),
        |c AS (SELECT doc_id,
        |  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS scheme,
        |  lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)', 1)) AS hostport,
        |  regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1) AS rawpath,
        |  regexp_extract(url, '\?([^#]*)', 1) AS rawq
        | FROM u),
        |c2 AS (SELECT doc_id, scheme,
        |  CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
        |       WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
        |       ELSE hostport END AS host,
        |  CASE WHEN rawpath = '' THEN '/' ELSE rawpath END AS path,
        |  array_to_string(list_sort(list_filter(string_split(rawq, '&'),
        |    p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=&]*|fbclid|gclid)(=|$)'))), '&') AS q
        | FROM c)
        |SELECT scheme || '://' || host || path ||
        |  CASE WHEN q = '' THEN '' ELSE '?' || q END AS canonical_url,
        | CAST(count(*) AS BIGINT) AS n_urls,
        | CAST(min(doc_id) AS BIGINT) AS min_doc
        |FROM c2 GROUP BY 1 ORDER BY canonical_url""".stripMargin,

    "n95_heavy_hitters" -> // definitional: the frequency bar itself
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
        |f AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt
        |      FROM w WHERE word <> '' GROUP BY 1),
        |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM f)
        |SELECT word, cnt FROM f, n WHERE cnt * 32 > n
        |ORDER BY cnt DESC, word""".stripMargin,

    "n20_embedding_allpairs" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
        |SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
        | round(list_cosine_similarity(a.emb, b.emb), 6) AS cos
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.emb, b.emb) >= 0.4
        |ORDER BY vec_id_a, vec_id_b""".stripMargin,

    "n21_knn_ivfpq" -> // full probe + wide rerank == brute force (see query)
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb
        |           FROM embeddings WHERE vec_id < 5),
        |scored AS (
        | SELECT q.query_id, e.vec_id,
        |  list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_emb) AS cos_raw,
        |  row_number() OVER (PARTITION BY q.query_id
        |    ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_emb) DESC, e.vec_id) AS rnk
        | FROM embeddings e, q WHERE e.vec_id <> q.query_id)
        |SELECT query_id, vec_id, round(cos_raw, 6) AS cos, rnk
        |FROM scored WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin,

    // PQ append: frozen codebooks + full probe + wide rerank == brute
    // force over the union (the n21 oracle verbatim — the split must
    // be invisible to exhaustive search)
    "n158_ivfpq_append" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb
        |           FROM embeddings WHERE vec_id < 5),
        |scored AS (
        | SELECT q.query_id, e.vec_id,
        |  list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_emb) AS cos_raw,
        |  row_number() OVER (PARTITION BY q.query_id
        |    ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_emb) DESC, e.vec_id) AS rnk
        | FROM embeddings e, q WHERE e.vec_id <> q.query_id)
        |SELECT query_id, vec_id, round(cos_raw, 6) AS cos, rnk
        |FROM scored WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin,

    // append-then-full-probe == brute force over the union == the n16
    // oracle verbatim (the even/odd split is invisible to exhaustive
    // probing — that invisibility IS the law being checked)
    "n156_ivf_append" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb
        |           FROM embeddings WHERE vec_id < 5),
        |scored AS (
        | SELECT q.query_id, e.vec_id,
        |  list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_emb) AS cos_raw,
        |  row_number() OVER (PARTITION BY q.query_id
        |    ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_emb) DESC, e.vec_id) AS rnk
        | FROM embeddings e, q WHERE e.vec_id <> q.query_id)
        |SELECT query_id, vec_id, round(cos_raw, 6) AS cos, rnk
        |FROM scored WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin,

    // retraction ≡ rebuild on survivors: brute force with the takedown
    // list's WHERE — a removed vector never returned IS the oracle
    "n160_ivf_retract" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb
        |           FROM embeddings WHERE vec_id < 5),
        |surv AS (SELECT * FROM embeddings
        |         WHERE NOT (vec_id >= 5 AND vec_id % 7 = 3)),
        |scored AS (
        | SELECT q.query_id, e.vec_id,
        |  list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_emb) AS cos_raw,
        |  row_number() OVER (PARTITION BY q.query_id
        |    ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_emb) DESC, e.vec_id) AS rnk
        | FROM surv e, q WHERE e.vec_id <> q.query_id)
        |SELECT query_id, vec_id, round(cos_raw, 6) AS cos, rnk
        |FROM scored WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin,

    // the PQ flavor shares the survivor oracle (full probe + wide
    // rerank reproduces brute force, the n21/n158 law)
    "n161_ivfpq_retract" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb
        |           FROM embeddings WHERE vec_id < 5),
        |surv AS (SELECT * FROM embeddings
        |         WHERE NOT (vec_id >= 5 AND vec_id % 7 = 3)),
        |scored AS (
        | SELECT q.query_id, e.vec_id,
        |  list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_emb) AS cos_raw,
        |  row_number() OVER (PARTITION BY q.query_id
        |    ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_emb) DESC, e.vec_id) AS rnk
        | FROM surv e, q WHERE e.vec_id <> q.query_id)
        |SELECT query_id, vec_id, round(cos_raw, 6) AS cos, rnk
        |FROM scored WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin,

    "n16_knn_ivf" -> // exhaustive probe == brute force, same oracle as n08
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb
        |           FROM embeddings WHERE vec_id < 5),
        |scored AS (
        | SELECT q.query_id, e.vec_id,
        |  list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_emb) AS cos_raw,
        |  row_number() OVER (PARTITION BY q.query_id
        |    ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_emb) DESC, e.vec_id) AS rnk
        | FROM embeddings e, q WHERE e.vec_id <> q.query_id)
        |SELECT query_id, vec_id, round(cos_raw, 6) AS cos, rnk
        |FROM scored WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin,

    "g18_resample_rms_udaf" ->
      s"""WITH $grid
         |SELECT date_trunc('day', time) AS time, y, x,
         | sqrt(avg(t2m * t2m)) AS t2m
         |FROM grid GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "n09_knn_lsh" ->
      s"""WITH ${signLshBkCtes(planes = 10, tables = 6, dim = 64)},
         |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id
         | FROM (SELECT * FROM bk WHERE vec_id < 5) q
         | JOIN bk c ON q.t = c.t AND q.bucket = c.bucket AND c.vec_id <> q.vec_id),
         |scored AS (SELECT cand.query_id, cand.vec_id,
         |  list_cosine_similarity(ce.emb, qe.emb) AS cos_raw,
         |  row_number() OVER (PARTITION BY cand.query_id
         |    ORDER BY list_cosine_similarity(ce.emb, qe.emb) DESC, cand.vec_id) AS rnk
         | FROM cand JOIN e ce ON ce.vec_id = cand.vec_id
         |           JOIN e qe ON qe.vec_id = cand.query_id)
         |SELECT query_id, vec_id, round(cos_raw, 6) AS cos, rnk
         |FROM scored WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin,

    "n10_minhash_neardups" -> minhashOracleSql(k = 5, numHashes = 64,
      bands = 16, threshold = 0.5),

    "n31_ngram_jaccard" -> minhashOracleSql(k = 3, numHashes = 64,
      bands = 32, threshold = 0.5, wordGrams = true),

    // RE2 script classes (\p{Latin}) mirror Java's \p{IsLatin}
    "n75_script_mix" ->
      """WITH d AS (SELECT doc_id, text FROM documents
        | UNION ALL SELECT * FROM (VALUES
        |  (9000001, 'привет мир это тестовый документ'),
        |  (9000002, '这是一个测试文档你好世界'),
        |  (9000003, 'hello мир 世界 123'),
        |  (9000004, '12345 67890')) v(doc_id, text)),
        |c AS (SELECT doc_id,
        |  len(regexp_extract_all(text, '\p{Latin}')) AS n_latin,
        |  len(regexp_extract_all(text, '\p{Cyrillic}')) AS n_cyrillic,
        |  len(regexp_extract_all(text, '\p{Han}')) AS n_han,
        |  len(regexp_extract_all(text, '[0-9]')) AS n_digit
        | FROM d)
        |SELECT doc_id, n_latin, n_cyrillic, n_han, n_digit,
        | CASE WHEN n_latin + n_cyrillic + n_han = 0 THEN 'none'
        |      WHEN n_latin >= n_cyrillic AND n_latin >= n_han THEN 'latin'
        |      WHEN n_cyrillic >= n_han THEN 'cyrillic'
        |      ELSE 'han' END AS main_script
        |FROM c ORDER BY doc_id""".stripMargin,

    "n76_textrank_keywords" -> textRankOracleSql(iters = 3, topK = 20),

    "n79_hll_overlap" -> hllOverlapOracleSql,

    "n81_bpe_encode" -> bpeEncodeOracleSql(numMerges = 4),

    "n85_distinctive_terms" ->
      """WITH wf AS (SELECT source AS grp, unnest(string_split(text, ' ')) AS w
        |           FROM documents),
        |w2 AS (SELECT grp, w FROM wf WHERE w <> ''),
        |cws AS (SELECT grp, w, CAST(count(*) AS BIGINT) AS c_ws
        |        FROM w2 GROUP BY 1, 2),
        |cw AS (SELECT w, CAST(sum(c_ws) AS BIGINT) AS c_w FROM cws GROUP BY 1),
        |ns AS (SELECT grp, CAST(sum(c_ws) AS BIGINT) AS n_s FROM cws GROUP BY 1),
        |nt AS (SELECT CAST(sum(c_ws) AS BIGINT) AS n_tot FROM cws),
        |s AS (SELECT cws.grp, cws.w, cws.c_ws, cw.c_w, ns.n_s,
        |        ((cws.c_ws * 1000000000) // cw.c_w) * n_tot // ns.n_s AS score
        |      FROM cws JOIN cw USING (w) JOIN ns USING (grp) CROSS JOIN nt
        |      WHERE cws.c_ws >= 5),
        |r AS (SELECT grp AS source, w AS word, c_ws, c_w, n_s,
        |        CAST(score AS BIGINT) AS score,
        |        CAST(row_number() OVER (PARTITION BY grp
        |          ORDER BY score DESC, w) AS BIGINT) AS rk
        |      FROM s)
        |SELECT source, word, c_ws, c_w, n_s, score, rk
        |FROM r WHERE rk <= 3 ORDER BY source, rk""".stripMargin,

    "n92_weighted_sample" ->
      s"""WITH ${ppsKeysSql("doc_id, weight")}
         |SELECT doc_id, weight, min(key) AS priority_key
         |FROM keys GROUP BY 1, 2
         |ORDER BY priority_key, doc_id LIMIT 25""".stripMargin,

    "n93_stratified_pps" ->
      s"""WITH ${ppsKeysSql("doc_id, source, weight")},
         |mins AS (SELECT source, doc_id, weight, min(key) AS priority_key
         |         FROM keys GROUP BY 1, 2, 3),
         |r AS (SELECT source, doc_id, weight, priority_key,
         |  CAST(row_number() OVER (PARTITION BY source
         |    ORDER BY priority_key, doc_id) AS BIGINT) AS rk
         | FROM mins)
         |SELECT source, doc_id, weight, priority_key, rk
         |FROM r WHERE rk <= 5 ORDER BY source, rk""".stripMargin,

    "n91_exact_quantiles_by_source" ->
      """WITH v AS (SELECT source AS grp, CAST(n_chars AS BIGINT) AS v
        |           FROM documents WHERE n_chars IS NOT NULL),
        |n AS (SELECT grp, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1),
        |probes(q) AS (VALUES (0.5), (0.99)),
        |r AS (SELECT grp, CAST(q AS DOUBLE) AS q, n,
        |       greatest(CAST(ceil(q * n) AS BIGINT), 1) AS r
        |      FROM n CROSS JOIN probes),
        |cum AS (SELECT grp, v,
        |  sum(count(*)) OVER (PARTITION BY grp ORDER BY v) AS vcum
        | FROM v GROUP BY grp, v)
        |SELECT r.grp AS source, r.q, r.n, r.r,
        | CAST(min(cum.v) AS BIGINT) AS exact_value
        |FROM r JOIN cum ON cum.grp = r.grp AND cum.vcum >= r.r
        |GROUP BY 1, 2, 3, 4 ORDER BY source, q""".stripMargin,

    "n90_curation_v2" ->
      // the n87 extraction chain feeding the n80 entropy chain feeding
      // the n01 keep-lowest dedup rule — stage replays composed
      """WITH d AS (SELECT doc_id, text FROM documents
        | UNION ALL SELECT * FROM (VALUES
        |  (9200001, '<html><body><p>the quick brown fox jumps over the lazy dog near the river bank</p></body></html>'),
        |  (9200002, '<div>the quick <b>brown</b> fox jumps over the lazy dog near the river bank</div>'),
        |  (9200003, '<p>' || repeat('a', 80) || '</p>')) v(doc_id, text)),
        |s1 AS (SELECT doc_id,
        |  regexp_replace(text, '(?is)<(script|style)[^>]*>.*?</(script|style)\s*>', ' ', 'g') AS t1
        | FROM d),
        |s2 AS (SELECT doc_id, regexp_replace(t1, '<[^>]+>', ' ', 'g') AS t2 FROM s1),
        |s3 AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    t2, '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
        |    '&#39;', '''', 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g') AS t3
        | FROM s2),
        |ex2 AS (SELECT doc_id, trim(regexp_replace(t3, '\s+', ' ', 'g')) AS text,
        |  CAST(length(trim(regexp_replace(t3, '\s+', ' ', 'g'))) AS BIGINT)
        |    AS n_chars_extracted
        | FROM s3),
        |g AS (SELECT doc_id, substr(text, pos, 1) AS ch
        |      FROM (SELECT doc_id, text,
        |              unnest(generate_series(1, strlen(text))) AS pos
        |            FROM ex2 WHERE strlen(text) >= 1)),
        |cc AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
        |       FROM g GROUP BY 1, 2),
        |pd AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(c * ln(c) ORDER BY ch)), (a, x) -> a + x) AS sum_ln
        | FROM cc GROUP BY doc_id),
        |ent AS (SELECT doc_id, round(ln(n) - sum_ln / n, 6) AS entropy_nats FROM pd),
        |gated AS (SELECT ex2.doc_id, ex2.text, ex2.n_chars_extracted,
        |            ent.entropy_nats
        |          FROM ex2 JOIN ent USING (doc_id)
        |          WHERE ent.entropy_nats >= 2.0 AND ex2.n_chars_extracted >= 10),
        |dd AS (SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |       FROM gated)
        |SELECT doc_id, n_chars_extracted, entropy_nats
        |FROM dd WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "n89_domain_pagerank" -> pageRankOracleSql(
      """d AS (SELECT doc_id, text FROM documents
        | UNION ALL SELECT * FROM (VALUES
        |  (9100001, '<a href="https://a.ex/1">.</a><a href="https://b.ex/2">.</a><a href="https://c.ex/3">.</a>'),
        |  (9100002, '<a href="https://a.ex/1">.</a><a href="https://b.ex/4">.</a>'),
        |  (9100003, '<a href="https://b.ex/5">.</a><a href="https://c.ex/6">.</a>'),
        |  (9100004, '<a href="https://c.ex/7">.</a><a href="https://d.ex/8">.</a>'),
        |  (9100005, '<a href="https://a.ex/9">.</a><a href="https://d.ex/10">.</a>')) v(doc_id, text)),
        |u AS (SELECT doc_id,
        |  unnest(regexp_extract_all(text, '(?i)href\s*=\s*"([^"]*)"', 1)) AS url
        | FROM d),
        |l AS (SELECT DISTINCT doc_id,
        |  lower(regexp_extract(url, '(?i)^https?://([^/:]+)', 1)) AS domain
        | FROM u),
        |l2 AS (SELECT doc_id, domain FROM l WHERE domain <> ''),
        |p AS (SELECT a.domain AS src, b.domain AS dst
        |      FROM l2 a JOIN l2 b
        |        ON a.doc_id = b.doc_id AND a.domain <> b.domain),
        |e AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS wt
        |      FROM p GROUP BY 1, 2)""".stripMargin,
      iters = 3,
      """SELECT word AS domain, CAST(rank AS BIGINT) AS rank
        |FROM r3 ORDER BY rank DESC, domain""".stripMargin),

    "n88_link_domains" ->
      """WITH d AS (SELECT doc_id, text FROM documents
        | UNION ALL SELECT * FROM (VALUES
        |  (9000001, '<a href="https://a.example/x">1</a><a HREF="https://A.EXAMPLE/y">2</a><a href="http://b.example:8080/z">3</a><a href="/relative/path">4</a><a href="mailto:x@c.example">5</a>'),
        |  (9000002, '<a href="https://b.example/only">6</a>')) v(doc_id, text)),
        |u AS (SELECT doc_id,
        |  unnest(regexp_extract_all(text, '(?i)href\s*=\s*"([^"]*)"', 1)) AS url
        | FROM d),
        |l AS (SELECT doc_id, url,
        |  lower(regexp_extract(url, '(?i)^https?://([^/:]+)', 1)) AS domain
        | FROM u)
        |SELECT domain, CAST(count(*) AS BIGINT) AS n_links,
        | CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM l WHERE domain <> '' GROUP BY domain ORDER BY domain""".stripMargin,

    "q43_nulls_order" ->
      """SELECT o_orderkey,
        | CASE WHEN o_orderpriority = '1-URGENT' THEN NULL
        |      ELSE o_totalprice END AS p
        |FROM orders
        |ORDER BY p DESC NULLS LAST, o_orderkey
        |LIMIT 100""".stripMargin,

    "n87_html_extract" ->
      // same regex chain under RE2 with the 'g' flag (Spark's
      // regexp_replace is global by default); entity decode order
      // pinned (&amp; last)
      """WITH d AS (SELECT doc_id, text FROM documents
        | UNION ALL SELECT * FROM (VALUES
        |  (9000001, '<html><head><title>Spark at Scale</title><style>body { color: red; }</style></head><body><h1>Intro</h1><p>Shuffles &amp; joins are <b>expensive</b> &#39;at&#39; scale &amp;lt;sometimes&amp;gt;.</p><script>var x = "<p>not text</p>";</script><a href="https://a.example/x">one</a> <a HREF="https://b.example/y">two</a></body></html>'),
        |  (9000002, 'plain text, no tags &amp; one entity')) v(doc_id, text)),
        |s1 AS (SELECT doc_id, text,
        |  regexp_replace(text, '(?is)<(script|style)[^>]*>.*?</(script|style)\s*>', ' ', 'g') AS t1
        | FROM d),
        |s2 AS (SELECT doc_id, text, regexp_replace(t1, '<[^>]+>', ' ', 'g') AS t2 FROM s1),
        |s3 AS (SELECT doc_id, text,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    t2, '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
        |    '&#39;', '''', 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g') AS t3
        | FROM s2),
        |f AS (SELECT doc_id,
        |  regexp_extract(text, '(?is)<title[^>]*>(.*?)</title\s*>', 1) AS title,
        |  CAST(len(regexp_extract_all(text, '(?i)href\s*=\s*"([^"]*)"', 1)) AS BIGINT) AS n_links,
        |  trim(regexp_replace(t3, '\s+', ' ', 'g')) AS text_extracted
        | FROM s3)
        |SELECT doc_id, title, n_links, text_extracted,
        | CAST(length(text_extracted) AS BIGINT) AS n_chars_extracted
        |FROM f ORDER BY doc_id""".stripMargin,

    "n86_exact_quantiles" ->
      """WITH v AS (SELECT CAST(n_chars AS BIGINT) AS v FROM documents
        |           WHERE n_chars IS NOT NULL),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
        |probes(q) AS (VALUES (0.25), (0.5), (0.9), (0.99)),
        |r AS (SELECT CAST(q AS DOUBLE) AS q, n,
        |       greatest(CAST(ceil(q * n) AS BIGINT), 1) AS r
        |      FROM probes CROSS JOIN n),
        |cum AS (SELECT v, sum(count(*)) OVER (ORDER BY v) AS vcum
        |        FROM v GROUP BY v)
        |SELECT r.q, r.n, r.r, CAST(min(cum.v) AS BIGINT) AS exact_value
        |FROM r JOIN cum ON cum.vcum >= r.r
        |GROUP BY 1, 2, 3 ORDER BY q""".stripMargin,

    "q44_join_hints" ->
      """SELECT n.n_name, count(*) AS n_customers
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin,

    "q45_distribute_by" ->
      """SELECT source, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q42_group_by_all" ->
      """SELECT source, lang, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY ALL
        |ORDER BY source, lang""".stripMargin,

    "q41_set_ops_all" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE o_totalprice > 100000
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_custkey""".stripMargin,

    "n84_lsh_recall" ->
      s"""SELECT n_pred, n_truth, n_hit, n_truth - n_hit AS n_missed,
         | round(CASE WHEN n_pred > 0
         |   THEN CAST(n_hit AS DOUBLE) / CAST(n_pred AS DOUBLE) END, 6) AS precision,
         | round(CASE WHEN n_truth > 0
         |   THEN CAST(n_hit AS DOUBLE) / CAST(n_truth AS DOUBLE) END, 6) AS recall
         |FROM
         | (SELECT CAST(count(*) AS BIGINT) AS n_pred FROM (${minhashOracleSql(
              k = 3, numHashes = 64, bands = 32, threshold = 0.5,
              wordGrams = true)}) p0),
         | (SELECT CAST(count(*) AS BIGINT) AS n_truth
         |  FROM ($jaccardExactPairsSql) t0),
         | (SELECT CAST(count(*) AS BIGINT) AS n_hit
         |  FROM (${minhashOracleSql(k = 3, numHashes = 64, bands = 32,
              threshold = 0.5, wordGrams = true)}) p1
         |  JOIN ($jaccardExactPairsSql) t1 USING (doc_id_a, doc_id_b))""".stripMargin,

    "n83_random_projection" -> {
      // table-0 hyperplane components exactly as SimilarityKernels
      // .hyperplanes: splitmix64 -> [-1,1) double -> FLOAT, widened
      // back to double literals; sequential left-fold dot like the
      // kernel's loop
      def comp(p: Int, d: Int): Double = {
        val h = graft.functions.Hashing.splitmix64(p.toLong * 8191L + d)
        (h.toDouble / Long.MaxValue.toDouble).toFloat.toDouble
      }
      val (k, dim) = (8, 64)
      val hpRows = (0 until k).map { p =>
        val vec = (0 until dim).map(d => dlit(comp(p, d))).mkString(", ")
        s"($p, [$vec])"
      }.mkString(",\n  ")
      val dot = "list_reduce(list_transform(generate_series(1, 64), " +
        "i -> emb[i] * v[i]), (acc, x) -> acc + x)"
      s"""WITH hp(p, v) AS (VALUES
         |  $hpRows),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
         |SELECT vec_id, CAST(p AS BIGINT) AS pos, round($dot, 6) AS val
         |FROM e, hp ORDER BY vec_id, pos""".stripMargin
    },

    "n82_embedding_diversity" ->
      // norm fold and final division pinned to the Spark expression
      // order; everything between is exact LONG arithmetic
      """WITH nrm AS (SELECT label, embedding,
        |  sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))),
        |    (a, x) -> a + x)) AS nq
        | FROM embeddings WHERE embedding IS NOT NULL),
        |codes AS (SELECT CAST(label AS BIGINT) AS label,
        |  CASE WHEN nq = 0.0 THEN list_transform(embedding, v -> 0)
        |       ELSE list_transform(embedding,
        |         v -> CAST(floor(CAST(v AS DOUBLE) / nq * 127.0 + 0.5) AS INTEGER))
        |  END AS codes
        | FROM nrm),
        |sd AS (SELECT label, codes,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(codes, c -> CAST(c AS BIGINT) * CAST(c AS BIGINT))),
        |    (a, x) -> a + x) AS self_dot
        | FROM codes),
        |pos AS (SELECT label, i, CAST(codes[i] AS BIGINT) AS c
        |        FROM sd, unnest(generate_series(1, len(codes))) AS t(i)),
        |ds AS (SELECT label, i, CAST(sum(c) AS BIGINT) AS s FROM pos GROUP BY 1, 2),
        |s2 AS (SELECT label, CAST(sum(s * s) AS BIGINT) AS s2 FROM ds GROUP BY 1),
        |b AS (SELECT label, CAST(count(*) AS BIGINT) AS n,
        |      CAST(sum(self_dot) AS BIGINT) AS sum_self FROM sd GROUP BY 1)
        |SELECT b.label, b.n, b.sum_self, s2.s2,
        | round((CAST(s2.s2 - b.sum_self AS DOUBLE) /
        |   CAST(b.n * (b.n - 1) AS DOUBLE)) / 16129.0, 6) AS avg_pair_cos
        |FROM b JOIN s2 USING (label)
        |WHERE b.n >= 2 ORDER BY label""".stripMargin,

    "n80_char_entropy" ->
      // the n51 float convention: ln(count) is one IEEE op, the fold
      // adds run*ln(run) in ascending char order on both engines
      """WITH d AS (SELECT doc_id, text FROM documents
        | UNION ALL SELECT * FROM (VALUES
        |  (9000001, repeat('a', 64)),
        |  (9000002, repeat('abcdefghijklmnopqrstuvwxyz', 2))) v(doc_id, text)),
        |g AS (SELECT doc_id, substr(text, pos, 1) AS ch
        |      FROM (SELECT doc_id, text,
        |              unnest(generate_series(1, strlen(text))) AS pos
        |            FROM d WHERE strlen(text) >= 1)),
        |cc AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
        |       FROM g GROUP BY 1, 2),
        |pd AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars_counted,
        |  CAST(count(*) AS BIGINT) AS distinct_chars,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(c * ln(c) ORDER BY ch)), (acc, x) -> acc + x) AS sum_ln
        | FROM cc GROUP BY doc_id)
        |SELECT doc_id, n_chars_counted, distinct_chars,
        | round(ln(n_chars_counted) - sum_ln / n_chars_counted, 6) AS entropy_nats
        |FROM pd ORDER BY doc_id""".stripMargin,

    "n78_pmi_collocations" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM toks
        |        WHERE w <> '' GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_tok FROM uni),
        |wl AS (SELECT string_split(text, ' ') AS ws FROM documents),
        |bi AS (SELECT ws[i] AS a, ws[i+1] AS b, CAST(count(*) AS BIGINT) AS c_ab
        |       FROM wl, unnest(generate_series(1, len(ws) - 1)) AS t(i)
        |       WHERE len(ws) >= 2 GROUP BY 1, 2 HAVING count(*) >= 5),
        |s AS (SELECT bi.a, bi.b, bi.c_ab, ua.c AS c_a, ub.c AS c_b,
        |        ((bi.c_ab * 1000000000) // ua.c) * n_tok // ub.c AS pmi_scaled
        |      FROM bi JOIN uni ua ON bi.a = ua.w
        |           JOIN uni ub ON bi.b = ub.w CROSS JOIN tot)
        |SELECT a, b, c_ab, c_a, c_b, CAST(pmi_scaled AS BIGINT) AS pmi_scaled,
        | CAST(row_number() OVER (ORDER BY pmi_scaled DESC, a, b) AS BIGINT) AS rk
        |FROM s ORDER BY pmi_scaled DESC, a, b LIMIT 20""".stripMargin,

    "n77_corpus_merge" ->
      """WITH base AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
        |ch AS (SELECT doc_id,
        |        CASE WHEN doc_id % 2 = 1 THEN 'delete' ELSE 'upsert' END AS op,
        |        text || ' [v2]' AS text, lang, source,
        |        n_chars + 5 AS n_chars
        |       FROM documents WHERE doc_id % 3 = 0),
        |surv AS (SELECT b.* FROM base b
        |         WHERE NOT EXISTS (SELECT 1 FROM ch WHERE ch.doc_id = b.doc_id)),
        |ups AS (SELECT doc_id, text, lang, source, n_chars
        |        FROM ch WHERE op <> 'delete')
        |SELECT doc_id, text, lang, source, CAST(n_chars AS BIGINT) AS n_chars
        |FROM surv
        |UNION ALL
        |SELECT doc_id, text, lang, source, CAST(n_chars AS BIGINT) FROM ups
        |ORDER BY doc_id""".stripMargin,

    // naive all-pairs levenshtein — deliberately WITHOUT the deletion-
    // neighborhood index, so a green row proves the index is lossless
    "n73_fuzzy_title_pairs" ->
      """WITH k AS (SELECT doc_id, substr(text, 1, 32) AS key FROM documents)
        |SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
        | CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
        |FROM k a JOIN k b ON a.doc_id < b.doc_id
        |WHERE levenshtein(a.key, b.key) <= 1
        |ORDER BY doc_id_a, doc_id_b""".stripMargin,

    // naive all-shared-gram-pairs Jaccard — deliberately WITHOUT the
    // prefix filter, so a green row proves the Spark-side pruning is
    // lossless (recall 1.0), not just replayed
    "n72_jaccard_prefix_join" -> jaccardExactPairsSql,

    "n11_simhash_neardups" ->
      s"""WITH $simhashCte
         |SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
         | CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
         |FROM shs a, shs b
         |WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sh, b.sh)) <= 6
         |ORDER BY doc_id_a, doc_id_b""".stripMargin,

    "n30_top_word_share" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        |c AS (SELECT doc_id, word, count(*) AS n FROM w WHERE word <> '' GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_words, CAST(max(n) AS BIGINT) AS top_n,
        | round(CAST(max(n) AS DOUBLE) / sum(n), 6) AS top_word_share
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "n37_crossmodal_pairs" ->
      s"""SELECT p.doc_id_a, p.doc_id_b, p.jaccard,
         | round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
         |   CAST(eb.embedding AS DOUBLE[])), 6) AS cos
         |FROM (${minhashOracleSql(k = 3, numHashes = 64, bands = 32,
                  threshold = 0.5, wordGrams = true)}) p
         |JOIN embeddings ea ON ea.vec_id = p.doc_id_a
         |JOIN embeddings eb ON eb.vec_id = p.doc_id_b
         |ORDER BY p.doc_id_a, p.doc_id_b""".stripMargin,

    "n36_curation_pipeline" -> {
      val hits = Map(
        "de" -> "(?i)\\b(der|die|das|und|ist|nicht|ein|mit|von|zu)\\b",
        "en" -> "(?i)\\b(the|and|of|to|in|is|that|with|for|it)\\b",
        "es" -> "(?i)\\b(el|la|los|y|es|en|que|por|una|con)\\b",
        "fr" -> "(?i)\\b(le|la|les|et|est|dans|pour|que|une|des)\\b")
      s"""WITH h AS (
         | SELECT doc_id, text, n_chars,
         |  len(regexp_extract_all(text, '${hits("de")}')) AS h_de,
         |  len(regexp_extract_all(text, '${hits("en")}')) AS h_en,
         |  len(regexp_extract_all(text, '${hits("es")}')) AS h_es,
         |  len(regexp_extract_all(text, '${hits("fr")}')) AS h_fr,
         |  CASE WHEN len(trim(text)) = 0 THEN 0
         |       ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
         |  CASE WHEN len(trim(text)) = 0 THEN 0e0
         |       ELSE 1e0 - CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |            / len(string_split(text, ' ')) END AS rep
         | FROM documents),
         |k AS (SELECT doc_id, text, n_chars, n_tokens, rep,
         |  CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
         |       WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
         |       WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
         |       WHEN h_es >= h_fr THEN 'es' ELSE 'fr' END AS lang_guess
         | FROM h),
         |f AS (SELECT * FROM k
         |      WHERE lang_guess = 'en' AND n_tokens >= 20 AND rep <= 0.4),
         |pl AS (SELECT doc_id + 1000000 AS doc_id, text, n_chars, n_tokens, rep, lang_guess
         |       FROM f ORDER BY doc_id LIMIT 3),
         |a AS (SELECT doc_id, text, n_chars, n_tokens, rep, lang_guess FROM f
         |      UNION ALL
         |      SELECT doc_id, text, n_chars, n_tokens, rep, lang_guess FROM pl)
         |SELECT doc_id, lang_guess, CAST(n_tokens AS BIGINT) AS n_tokens,
         | round(rep, 6) AS repetition_ratio, n_chars
         |FROM a
         |QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
         |ORDER BY doc_id""".stripMargin
    },

    "n32_word_freq_score" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        |w2 AS (SELECT doc_id, word FROM w WHERE word <> ''),
        |v AS (SELECT word, count(*) AS word_freq FROM w2 GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        | CAST(sum(word_freq) AS BIGINT) AS freq_sum,
        | round(CAST(sum(word_freq) AS DOUBLE) / count(*), 6) AS mean_word_freq
        |FROM w2 JOIN v USING (word)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "n33_tfidf_terms" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM w WHERE term <> '' GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
        |s AS (SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
        |        CAST(tf.tf * nd.n_docs AS DOUBLE) / dfreq.df AS tf_idf,
        |        row_number() OVER (PARTITION BY tf.doc_id
        |          ORDER BY CAST(tf.tf * nd.n_docs AS DOUBLE) / dfreq.df DESC,
        |                   dfreq.df ASC, tf.term ASC) AS rk
        |      FROM tf JOIN dfreq USING (term) CROSS JOIN nd)
        |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        | round(tf_idf, 6) AS tf_idf, CAST(rk AS BIGINT) AS rk
        |FROM s WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    "n34_dup_spans" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT doc_id, md5(array_to_string(ws[i:i+7], ' ')) AS g
        |      FROM w, unnest(generate_series(1, greatest(len(ws) - 7, 0))) AS t(i)),
        |pg AS (SELECT doc_id, g, count(*) AS cnt FROM g GROUP BY 1, 2),
        |nd AS (SELECT doc_id, cnt, count(*) OVER (PARTITION BY g) AS nd FROM pg)
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_grams,
        | CAST(sum(CASE WHEN nd > 1 THEN cnt ELSE 0 END) AS BIGINT) AS n_dup_positions,
        | round(CAST(sum(CASE WHEN nd > 1 THEN cnt ELSE 0 END) AS DOUBLE) / sum(cnt), 6) AS dup_share
        |FROM nd GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "n38_chunk_dedup" ->
      // the first-occurrence rule is a total order ((doc_id, chunk_idx)
      // is unique), so both engines keep the identical survivor set;
      // DuckDB list slices are 1-based inclusive = Spark slice(start, len)
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |c0 AS (SELECT doc_id, ws, CAST(ceil(len(ws)/16.0) AS BIGINT) AS n_chunks FROM w),
        |c AS (SELECT doc_id, n_chunks, unnest(range(0, n_chunks)) AS chunk_idx, ws FROM c0),
        |ch AS (SELECT doc_id, n_chunks, chunk_idx,
        |       array_to_string(ws[(chunk_idx*16+1):(chunk_idx*16+16)], ' ') AS chunk FROM c),
        |r AS (SELECT *, row_number() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn FROM ch)
        |SELECT doc_id, any_value(n_chunks) AS n_chunks,
        | count(*) AS kept_chunks,
        | string_agg(chunk, ' ' ORDER BY chunk_idx) AS text_deduped
        |FROM r WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "n39_hll_distinct" ->
      // full HLL replay: same FNV fold (HUGEINT), same integer
      // register/rank arithmetic, same single-expression float steps
      // (rank via trailing zeros = bit_count((w & -w) - 1) + 1 — pure
      // integer, unlike a float log2; register sum exact via
      // 2^(57-mj) summed in HUGEINT). p=8: m=256, maxRank=57.
      hllReplaySql(
        """  SELECT 'doc_id' AS col_name, CAST(doc_id AS VARCHAR) AS v FROM documents
          |  UNION ALL SELECT 'lang', lang FROM documents
          |  UNION ALL SELECT 'source', source FROM documents
          |  UNION ALL SELECT 'text', text FROM documents""".stripMargin),

    "n47_hll_by_source" ->
      // the same replay pipeline keyed by the data's own source column:
      // distinct vocabulary per source
      s"""SELECT col_name AS source, exact_distinct, hll_estimate, registers_used
         |FROM (${hllReplaySql(
               """  SELECT source AS col_name,
                 |    unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS v
                 |  FROM documents""".stripMargin)})
         |ORDER BY source""".stripMargin,

    "n40_cms_counts" -> {
      // CMS replay: per-word exact counts, then the same integer hash
      // pipeline (fnv xor splitmix row seed -> fmix64 -> low 10 bits),
      // counter sums per (row, cell), min over rows at the probes
      val permRows = (0 until 4).map(i =>
        s"($i, CAST('${uns(graft.functions.Hashing.splitmix64(42L + i))}' AS HUGEINT))")
        .mkString(", ")
      s"""WITH words AS (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
         |  FROM documents),
         |counts AS (SELECT word, count(*) AS cnt FROM words GROUP BY word),
         |rows_(i, pv) AS (VALUES $permRows),
         |h0 AS (SELECT word, cnt, i, xor(${fnvSql("word")}, pv) AS x FROM counts, rows_),
         |f1 AS (SELECT word, cnt, i, xor(x, x >> 33) AS v1 FROM h0),
         |f2 AS (SELECT word, cnt, i, xor(v2, v2 >> 33) AS v3
         |       FROM (SELECT word, cnt, i, ${mulC("v1", c1, c1lo)} AS v2 FROM f1)),
         |wh AS (SELECT word, cnt, i, CAST(xor(v4, v4 >> 33) % 1024 AS BIGINT) AS cell
         |       FROM (SELECT word, cnt, i, ${mulC("v3", c2, c2lo)} AS v4 FROM f2)),
         |cms AS (SELECT i, cell, sum(cnt) AS c FROM wh GROUP BY 1, 2),
         |probes AS (SELECT word, cnt FROM counts ORDER BY cnt DESC, word LIMIT 10)
         |SELECT p.word AS word, p.cnt AS exact_count,
         |  CAST(min(cm.c) AS BIGINT) AS cms_estimate
         |FROM probes p JOIN wh w ON w.word = p.word
         |JOIN cms cm ON cm.i = w.i AND cm.cell = w.cell
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin
    },

    "n123_retrieval_metrics" ->
      // truth = n08's exact-cosine replay; candidate = n46's quantizer
      // + integer-dot ranking (NO re-rank); metrics are pure integer
      // arithmetic over the two metadata-sized top-10 lists
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |qe AS (SELECT vec_id AS query_id, v AS q_v FROM e WHERE vec_id < 5),
        |tr AS (SELECT query_id, vec_id FROM (
        |  SELECT qe.query_id, e.vec_id,
        |   row_number() OVER (PARTITION BY qe.query_id
        |     ORDER BY list_cosine_similarity(e.v, qe.q_v) DESC, e.vec_id) AS rnk
        |  FROM e, qe WHERE e.vec_id <> qe.query_id) WHERE rnk <= 10),
        |s AS (SELECT vec_id, v,
        |       list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e),
        |c AS (SELECT vec_id,
        |       CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
        |            ELSE list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INT))
        |       END AS codes FROM s),
        |q AS (SELECT vec_id AS query_id, codes AS q_codes FROM c WHERE vec_id < 5),
        |cd AS (SELECT query_id, vec_id, rnk AS crank FROM (
        |  SELECT q.query_id, c.vec_id,
        |   row_number() OVER (PARTITION BY q.query_id ORDER BY
        |    CASE WHEN list_dot_product(c.codes, c.codes) = 0
        |           OR list_dot_product(q.q_codes, q.q_codes) = 0 THEN 0.0
        |    ELSE CAST(list_dot_product(c.codes, q.q_codes) AS DOUBLE) /
        |      (sqrt(CAST(list_dot_product(c.codes, c.codes) AS DOUBLE)) *
        |       sqrt(CAST(list_dot_product(q.q_codes, q.q_codes) AS DOUBLE)))
        |    END DESC, c.vec_id) AS rnk
        |  FROM c, q WHERE c.vec_id <> q.query_id) WHERE rnk <= 10)
        |SELECT tr.query_id,
        | CAST(count(cd.vec_id) AS BIGINT) AS n_hits,
        | CAST(count(cd.vec_id) * 10000 // 10 AS BIGINT) AS recall_x1e4,
        | CAST(coalesce(1000000 // min(cd.crank), 0) AS BIGINT) AS mrr_x1e6
        |FROM tr LEFT JOIN cd
        |  ON tr.query_id = cd.query_id AND tr.vec_id = cd.vec_id
        |GROUP BY tr.query_id ORDER BY tr.query_id""".stripMargin,

    "n46_knn_int8" ->
      // full replay: n45's quantizer CTEs, integer-dot shortlist ranked
      // (qcos DESC, vec_id), exact-cosine re-rank of the top k*4
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |       list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e),
        |c AS (SELECT vec_id, v,
        |       CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
        |            ELSE list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INT))
        |       END AS codes FROM s),
        |q AS (SELECT vec_id AS query_id, codes AS q_codes, v AS q_v FROM c
        |      WHERE vec_id < 3),
        |sc AS (SELECT q.query_id, c.vec_id, c.v, q.q_v,
        |        CASE WHEN list_dot_product(c.codes, c.codes) = 0
        |               OR list_dot_product(q.q_codes, q.q_codes) = 0 THEN 0.0
        |        ELSE CAST(list_dot_product(c.codes, q.q_codes) AS DOUBLE) /
        |          (sqrt(CAST(list_dot_product(c.codes, c.codes) AS DOUBLE)) *
        |           sqrt(CAST(list_dot_product(q.q_codes, q.q_codes) AS DOUBLE)))
        |        END AS qcos
        |       FROM c, q WHERE c.vec_id <> q.query_id),
        |sl AS (SELECT query_id, vec_id, v, q_v,
        |        row_number() OVER (PARTITION BY query_id
        |          ORDER BY qcos DESC, vec_id) AS qrank FROM sc),
        |rr AS (SELECT query_id, vec_id,
        |        list_cosine_similarity(v, q_v) AS cos_raw,
        |        row_number() OVER (PARTITION BY query_id
        |          ORDER BY list_cosine_similarity(v, q_v) DESC, vec_id) AS rnk
        |       FROM sl WHERE qrank <= 20)
        |SELECT query_id, vec_id, round(cos_raw, 6) AS cos, rnk
        |FROM rr WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    "n45_int8_quantize" ->
      // same quantizer: scale column first, then floor(x/scale + 0.5)
      // verbatim; integer dots are exact in any engine, and the two
      // sqrt/divide steps are single IEEE expressions
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |       list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e),
        |c AS (SELECT vec_id, v,
        |       CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
        |            ELSE list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INT))
        |       END AS codes FROM s),
        |q AS (SELECT codes AS q_codes, v AS q_v FROM c WHERE vec_id = 0)
        |SELECT c.vec_id,
        |  round(CAST(list_dot_product(c.codes, q.q_codes) AS DOUBLE) /
        |    (sqrt(CAST(list_dot_product(c.codes, c.codes) AS DOUBLE)) *
        |     sqrt(CAST(list_dot_product(q.q_codes, q.q_codes) AS DOUBLE))), 6) AS qcos,
        |  round(list_cosine_similarity(c.v, q.q_v), 6) AS exact_cos,
        |  round(abs(CAST(list_dot_product(c.codes, q.q_codes) AS DOUBLE) /
        |    (sqrt(CAST(list_dot_product(c.codes, c.codes) AS DOUBLE)) *
        |     sqrt(CAST(list_dot_product(q.q_codes, q.q_codes) AS DOUBLE)))
        |    - list_cosine_similarity(c.v, q.q_v)), 6) AS abs_err
        |FROM c, q WHERE c.vec_id <> 0 ORDER BY c.vec_id""".stripMargin,

    "n44_text_clean" ->
      // utf8proc's nfc_normalize and java.text.Normalizer implement the
      // same Unicode NFC algorithm; strip/collapse/trim replay as RE2
      // regexes (the \x0B/\x0C chars whose \s membership differs
      // between Java and RE2 are stripped BEFORE the collapse, so the
      // engines never disagree)
      """WITH salted AS (SELECT doc_id,
        |  CASE WHEN doc_id % 4 = 0
        |    THEN chr(9) || ' ' || text || '  nfce' || chr(769) || chr(1) || 'x'
        |    ELSE text END AS text FROM documents),
        |c AS (SELECT doc_id, text,
        |  trim(regexp_replace(regexp_replace(nfc_normalize(text),
        |    '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'), '\s+', ' ', 'g')) AS text_clean
        | FROM salted)
        |SELECT doc_id, text_clean,
        |  CASE WHEN text_clean <> text THEN 1 ELSE 0 END::BIGINT AS was_dirty
        |FROM c ORDER BY doc_id""".stripMargin,

    "n61_hist_quantiles_by_lang" ->
      // n43's replay with every stage grouped by lang; same integer
      // binning, same single-IEEE-expression rank step
      """WITH vals AS (SELECT lang AS g, CASE WHEN trim(text) = '' THEN 0
        |    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS v
        |  FROM documents),
        |b AS (SELECT g, min(v) AS lo, max(v) AS hi, count(*) AS n
        |      FROM vals GROUP BY g),
        |h AS (SELECT vals.g, (v - lo) // ((hi - lo + 64) // 64) AS bin, count(*) AS cnt
        |      FROM vals JOIN b ON vals.g = b.g GROUP BY 1, 2),
        |c AS (SELECT g, bin, sum(cnt) OVER (PARTITION BY g ORDER BY bin) AS cum FROM h),
        |p AS (SELECT b.g, q, lo, hi, n, (hi - lo + 64) // 64 AS w,
        |        greatest(CAST(ceil(q * n) AS BIGINT), 1) AS r
        |      FROM b, (SELECT unnest([0.25e0, 0.5e0, 0.75e0, 0.99e0]) AS q)),
        |e AS (SELECT p.g, p.q, p.n, p.r, any_value(p.lo) AS lo,
        |        any_value(p.hi) AS hi, any_value(p.w) AS w, min(c.bin) AS bin
        |      FROM p JOIN c ON c.g = p.g AND c.cum >= p.r GROUP BY 1, 2, 3, 4),
        |vc AS (SELECT g, v, sum(count(*)) OVER (PARTITION BY g ORDER BY v) AS vcum
        |       FROM vals GROUP BY g, v),
        |x AS (SELECT p.g, p.q, p.r, min(vc.v) AS exact_value
        |      FROM p JOIN vc ON vc.g = p.g AND vc.vcum >= p.r GROUP BY 1, 2, 3)
        |SELECT e.g AS lang, e.q, e.n, e.r, e.lo + e.bin * e.w AS est_lo,
        |  least(e.hi, e.lo + (e.bin + 1) * e.w - 1) AS est_hi, x.exact_value
        |FROM e JOIN x ON e.g = x.g AND e.q = x.q AND e.r = x.r
        |ORDER BY lang, e.q""".stripMargin,

    "n43_hist_quantiles" ->
      // same integer binning: width = ceil(range/64) via div, bin = div,
      // cumulative integer counts; the one float step (ceil(q*n)) is a
      // single IEEE expression both engines evaluate identically
      """WITH vals AS (SELECT CASE WHEN trim(text) = '' THEN 0
        |    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS v
        |  FROM documents),
        |b AS (SELECT min(v) AS lo, max(v) AS hi, count(*) AS n FROM vals),
        |h AS (SELECT (v - lo) // ((hi - lo + 64) // 64) AS bin, count(*) AS cnt
        |      FROM vals, b GROUP BY 1),
        |c AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum FROM h),
        |p AS (SELECT q, lo, hi, n, (hi - lo + 64) // 64 AS w,
        |        greatest(CAST(ceil(q * n) AS BIGINT), 1) AS r
        |      FROM b, (SELECT unnest([0.25e0, 0.5e0, 0.75e0, 0.99e0]) AS q)),
        |e AS (SELECT p.q, p.n, p.r, any_value(p.lo) AS lo, any_value(p.hi) AS hi,
        |        any_value(p.w) AS w, min(c.bin) AS bin
        |      FROM p JOIN c ON c.cum >= p.r GROUP BY 1, 2, 3),
        |vc AS (SELECT v, sum(count(*)) OVER (ORDER BY v) AS vcum FROM vals GROUP BY v),
        |x AS (SELECT p.q, p.r, min(vc.v) AS exact_value
        |      FROM p JOIN vc ON vc.vcum >= p.r GROUP BY 1, 2)
        |SELECT e.q, e.n, e.r, e.lo + e.bin * e.w AS est_lo,
        |  least(e.hi, e.lo + (e.bin + 1) * e.w - 1) AS est_hi, x.exact_value
        |FROM e JOIN x ON e.q = x.q AND e.r = x.r ORDER BY e.q""".stripMargin,

    "n41_inverted_index" ->
      // per-doc-distinct terms, df band decided before any postings
      // collection — identical two-pass semantics to the Scala build
      """WITH t AS (SELECT doc_id,
        |  unnest(list_distinct(list_filter(string_split(text, ' '), w -> w <> ''))) AS term
        | FROM documents),
        |b AS (SELECT term, count(*) AS df FROM t GROUP BY term
        |      HAVING count(*) BETWEEN 2 AND 50)
        |SELECT t.term, b.df,
        |  array_to_string(list_sort(list(t.doc_id)), ',') AS postings
        |FROM t JOIN b ON t.term = b.term
        |GROUP BY t.term, b.df ORDER BY t.term""".stripMargin,

    "n42_seq_packing" ->
      // same chop arithmetic: shard = doc_id % 8, running token sum per
      // shard ordered by doc_id, integral division for sequence indices
      """WITH d AS (SELECT doc_id, doc_id % 8 AS shard,
        |  CASE WHEN trim(text) = '' THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
        | FROM documents),
        |s AS (SELECT doc_id, shard, n_tokens,
        |  sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS end_tok
        | FROM d WHERE n_tokens > 0)
        |SELECT doc_id, shard, n_tokens,
        |  CAST(end_tok - n_tokens AS BIGINT) AS start_tok,
        |  CAST((end_tok - n_tokens) // 256 AS BIGINT) AS seq_first,
        |  CAST((end_tok - 1) // 256 AS BIGINT) AS seq_last
        |FROM s ORDER BY doc_id""".stripMargin,

    "n35_source_cap" ->
      """WITH r AS (SELECT doc_id, source,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 16), doc_id) AS rk
        | FROM documents)
        |SELECT doc_id, source, CAST(rk AS BIGINT) AS sample_rank
        |FROM r WHERE rk <= 10 ORDER BY doc_id""".stripMargin,

    "n28_dup_clusters" ->
      // transitive closure over the replayed simhash edge set: reach
      // accumulates every (node, reachable node) path pair; the cluster
      // id is the min over node itself and everything reachable
      s"""WITH RECURSIVE $simhashCte,
         |p AS (SELECT a.doc_id AS u, b.doc_id AS v FROM shs a, shs b
         |      WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sh, b.sh)) <= 6),
         |e AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
         |reach(u, v) AS (
         |  SELECT u, v FROM e
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u)
         |SELECT u AS doc_id, CAST(least(u, min(v)) AS BIGINT) AS cluster_id
         |FROM reach GROUP BY u ORDER BY doc_id""".stripMargin,

    "n60_temperature_sample" ->
      // rate = sqrt(nmin/n): one exact integer->double division and a
      // correctly-rounded sqrt — the softmax denominator cancels in
      // the water-fill, so no fold-order-dependent sum exists to break
      // the replay; threshold arithmetic identical to n56's
      """WITH cn AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
        |           FROM documents GROUP BY lang),
        |m AS (SELECT min(n) AS nmin FROM cn),
        |r AS (SELECT lang, sqrt(CAST(nmin AS DOUBLE) / n) AS rate
        |      FROM cn CROSS JOIN m)
        |SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
        |WHERE rate >= 1.0 OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
        |  < printf('%08x', CAST(least(floor(rate * 4294967296.0), 4294967295.0) AS BIGINT))
        |ORDER BY doc_id""".stripMargin,

    "n59_budget_select" ->
      // the oracle replays the PURE greedy definition (global ordered
      // cumsum); the engine's histogram-threshold decomposition must
      // land on the identical prefix. cum is a HUGEINT window sum but
      // only feeds the WHERE compare — output columns stay BIGINT
      """WITH f AS (SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS tk,
        |  length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
        |    / greatest(length(text), 1) AS s
        | FROM documents),
        |c AS (SELECT doc_id, tk,
        |  sum(tk) OVER (ORDER BY s DESC, doc_id ROWS UNBOUNDED PRECEDING) AS cum
        | FROM f)
        |SELECT doc_id, CAST(tk AS BIGINT) AS n_tokens
        |FROM c WHERE cum <= 15000 ORDER BY doc_id""".stripMargin,

    "n63_bpe_pairs" ->
      // unicode() replay of the char_bigrams packing ((left<<16)|right,
      // ASCII fixture: codepoint == UTF-16 unit); integer tie-break
      // (count DESC, pair) makes the top-10 engine-exact
      """WITH w AS (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
        |  FROM documents),
        |wc AS (SELECT word, count(*) AS wcount FROM w GROUP BY word),
        |p AS (SELECT unnest(list_transform(generate_series(1, strlen(word) - 1),
        |        i -> unicode(substr(word, i, 1)) * 65536 + unicode(substr(word, i + 1, 1)))) AS pair,
        |        wcount
        |      FROM wc WHERE strlen(word) >= 2),
        |pc AS (SELECT pair, CAST(sum(wcount) AS BIGINT) AS pair_count FROM p GROUP BY pair)
        |SELECT CAST(pair AS BIGINT) AS pair, CAST(pair // 65536 AS BIGINT) AS left_code,
        |  CAST(pair % 65536 AS BIGINT) AS right_code, pair_count
        |FROM pc ORDER BY pair_count DESC, pair LIMIT 10""".stripMargin,

    "n62_quality_classifier" ->
      // per-distinct-word fmix64(fnv64) through the shared HUGEINT
      // chain, low 10 bits centered (1024 is a power of two, so the
      // unsigned modulus equals Spark's signed pmod), occurrence sum
      // re-joined per doc; integer raw exact, LEFT JOIN keeps
      // empty-text docs at 0
      s"""WITH w AS (SELECT doc_id,
         |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
         |  FROM documents),
         |dw AS (SELECT DISTINCT word FROM w),
         |h0 AS (SELECT word, ${fnvSql("word")} AS x FROM dw),
         |f1 AS (SELECT word, xor(x, x >> 33) AS v1 FROM h0),
         |f2 AS (SELECT word, xor(v2, v2 >> 33) AS v3
         |       FROM (SELECT word, ${mulC("v1", c1, c1lo)} AS v2 FROM f1)),
         |wt AS (SELECT word, CAST(xor(v4, v4 >> 33) % 1024 AS BIGINT) - 512 AS wgt
         |       FROM (SELECT word, ${mulC("v3", c2, c2lo)} AS v4 FROM f2)),
         |agg AS (SELECT w.doc_id, count(*) AS n_words, sum(wt.wgt) AS raw
         |        FROM w JOIN wt USING (word) GROUP BY 1)
         |SELECT d.doc_id, CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
         |  CAST(coalesce(a.raw, 0) AS BIGINT) AS raw_score,
         |  round(CAST(coalesce(a.raw, 0) AS DOUBLE)
         |    / greatest(coalesce(a.n_words, 0), 1), 6) AS score
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    "n58_dedup_keep_best" ->
      // n28's recursive-CTE components + n03's token-count replay; the
      // per-cluster winner is row_number over (tokens DESC, doc_id) —
      // an all-integer argmax, so selection is engine-exact
      s"""WITH RECURSIVE $simhashCte,
         |p AS (SELECT a.doc_id AS u, b.doc_id AS v FROM shs a, shs b
         |      WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sh, b.sh)) <= 6),
         |e AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
         |reach(u, v) AS (
         |  SELECT u, v FROM e
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u),
         |cl AS (SELECT u AS doc_id, least(u, min(v)) AS cluster_id
         |       FROM reach GROUP BY u),
         |tk AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN 0
         |        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS tk
         |       FROM documents),
         |w AS (SELECT cl.doc_id,
         |        row_number() OVER (PARTITION BY cl.cluster_id
         |                           ORDER BY tk.tk DESC, cl.doc_id) AS rn
         |      FROM cl JOIN tk USING (doc_id))
         |SELECT d.doc_id, d.source, CAST(tk.tk AS BIGINT) AS n_tokens
         |FROM documents d JOIN tk USING (doc_id)
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM cl)
         |   OR d.doc_id IN (SELECT doc_id FROM w WHERE rn = 1)
         |ORDER BY d.doc_id""".stripMargin,

    "n29_stratified_sample" -> {
      val (tEn, tDe, tDef) = (graft.ops.Sampling.hexThreshold(0.5),
        graft.ops.Sampling.hexThreshold(0.2), graft.ops.Sampling.hexThreshold(0.1))
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE CASE
         |  WHEN lang = 'en' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$tEn'
         |  WHEN lang = 'de' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$tDe'
         |  ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$tDef' END
         |ORDER BY doc_id""".stripMargin
    },

    "n27_repetition" ->
      """WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents)
        |SELECT doc_id,
        | CAST(CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len(ws) END AS BIGINT) AS n_words,
        | CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |      ELSE len(list_distinct(ws)) END AS BIGINT) AS n_distinct_words,
        | round(CASE WHEN len(trim(text)) = 0 THEN 0e0
        |      ELSE 1e0 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) END, 6) AS repetition_ratio
        |FROM w ORDER BY doc_id""".stripMargin,

    "n26_pii_redaction" -> {
      // same regexes as TextAnalysis (RE2-compatible by construction);
      // DuckDB needs the 'g' flag for replace-all parity with Spark
      val (em, ip, id, ph) = (TextAnalysis.emailPat, TextAnalysis.ipPat,
        TextAnalysis.idPat, TextAnalysis.phonePat)
      s"""WITH salted AS (SELECT doc_id,
         |  CASE WHEN doc_id % 5 = 0 THEN text || ' contact user' ||
         |    CAST(doc_id AS VARCHAR) || '@example.com via 10.0.' ||
         |    CAST(doc_id % 256 AS VARCHAR) || '.7 id 123-45-6789 tel 555-867-5309'
         |  ELSE text END AS text
         | FROM documents)
         |SELECT doc_id,
         | regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
         |   '$em', '<EMAIL>', 'g'),
         |   '$ip', '<IP>', 'g'),
         |   '$id', '<ID>', 'g'),
         |   '$ph', '<PHONE>', 'g') AS text_redacted,
         | CAST(len(regexp_extract_all(text, '$em')) AS BIGINT) AS n_emails,
         | CAST(len(regexp_extract_all(text, '$ip')) AS BIGINT) AS n_ips,
         | CAST(len(regexp_extract_all(text, '$id')) AS BIGINT) AS n_ids,
         | CAST(len(regexp_extract_all(text, '$ph')) AS BIGINT) AS n_phones
         |FROM salted ORDER BY doc_id""".stripMargin
    },

    "n12_media_schema" ->
      // header lengths: PNG sig+IHDR 33, GIF header+LSD 13, BMP
      // file header + BITMAPINFOHEADER 54, JPEG SOI+SOF0 21, WebP
      // RIFF+VP8L 25, WAV RIFF+fmt+data 44, MP4 ftyp+moov+mdat prefix
      // 192 (ASCII fixture: strlen = bytes)
      """SELECT doc_id AS media_id,
        | CASE WHEN doc_id % 3 = 0 THEN 'image'
        |      WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        | CAST(strlen(text) + CASE WHEN doc_id % 3 = 0 THEN
        |    CASE (doc_id // 3) % 5 WHEN 0 THEN 33 WHEN 1 THEN 13 WHEN 2 THEN 54
        |         WHEN 3 THEN 21 ELSE 25 END
        |  WHEN doc_id % 3 = 1 THEN 44 ELSE 192 END AS BIGINT) AS byte_len
        |FROM documents ORDER BY media_id""".stripMargin,

    "n13_media_features" ->
      // every value is a REAL header field recomputed arithmetically
      // from the formulas the fixture encoded: image dims w = 16 +
      // id % 1000, h = 16 + (id/7) % 1000 parsed back by headerDims;
      // audio/video dims 0 (no pixel dims in WAV/mvhd); video n_frames
      // = the stsz sample_count 1 + id % 300 parsed back by mp4Meta
      """SELECT doc_id AS media_id,
        | CASE WHEN doc_id % 3 = 0 THEN 'image'
        |      WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        | CAST(strlen(text) + CASE WHEN doc_id % 3 = 0 THEN
        |    CASE (doc_id // 3) % 5 WHEN 0 THEN 33 WHEN 1 THEN 13 WHEN 2 THEN 54
        |         WHEN 3 THEN 21 ELSE 25 END
        |  WHEN doc_id % 3 = 1 THEN 44 ELSE 192 END AS BIGINT) AS byte_len,
        | CAST(CASE WHEN doc_id % 3 = 0 THEN 16 + doc_id % 1000 ELSE 0 END AS BIGINT) AS width,
        | CAST(CASE WHEN doc_id % 3 = 0 THEN 16 + (doc_id // 7) % 1000 ELSE 0 END AS BIGINT) AS height,
        | CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + doc_id % 300 ELSE 1 END AS BIGINT) AS n_frames
        |FROM documents ORDER BY media_id""".stripMargin
  )
}
