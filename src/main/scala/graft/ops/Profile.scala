package graft.ops

import org.apache.spark.sql.DataFrame
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
}
