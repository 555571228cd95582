package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the rows not dominated by any other
  * row, where row `b` dominates row `a` iff `b.minCol <= a.minCol` and
  * `b.maxCol >= a.maxCol` with at least one strict — the classic
  * "cheapest AND biggest" frontier query (Börzsönyi et al., ICDE 2001).
  *
  * Scale shape: the naive formulation is a quadratic NOT EXISTS
  * self-join. But 2-D dominance only depends on the per-`minCol`-level
  * maximum of `maxCol`: a row survives iff (a) it attains its level's
  * max (otherwise a same-level row dominates it) and (b) that max
  * strictly beats every strictly-cheaper level's max (otherwise a
  * cheaper-and-at-least-as-big row dominates it). So the plan is
  * corpus-sized only in one map-side-combinable `groupBy(minCol)` agg;
  * the running-max window runs over the LEVEL relation (cardinality of
  * distinct `minCol` values, not rows), and survivors semi-join back on
  * the (level, max) pair — broadcastable whenever the frontier's level
  * set is dimension-sized, which it is by construction. No pair joins
  * anywhere; ties on both columns all survive, exactly matching strict
  * dominance. At 1000 executors the only global-ordering step is the
  * window over distinct levels; if even that relation were huge the
  * standard fix is a range-partitioned two-phase prefix max, but a
  * frontier over more levels than fits one task is not a real workload.
  */
object Skyline {

  /** Rows of `df` minimizing `minCol` and maximizing `maxCol` that no
    * other row strictly dominates. Preserves the full input schema and
    * duplicate rows (incomparable duplicates are all frontier members).
    */
  def skyline2d(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    val levels = df.groupBy(col(minCol).as("_sky_lvl"))
      .agg(max(col(maxCol)).as("_sky_max"))
    val strictlyCheaper = Window.orderBy(col("_sky_lvl"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = levels
      .withColumn("_sky_run", max(col("_sky_max")).over(strictlyCheaper))
      .filter(col("_sky_run").isNull || col("_sky_max") > col("_sky_run"))
      .select(col("_sky_lvl"), col("_sky_max"))
    df.join(frontier,
      df(minCol) === frontier("_sky_lvl") && df(maxCol) === frontier("_sky_max"),
      "left_semi")
  }
}
