package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-predecessor) join — the general form of the reference's
  * nearest-match lookups (SURVEY.md §2.3 J2/J3), and a first-class
  * operator for event pipelines that Spark lacks natively.
  *
  * For each left row, attach the latest right row with
  * `rightOn <= leftOn` within the same `by` key (backward direction).
  *
  * Implementation is the union-tag trick, NOT a range join:
  * union left and right with a side tag, then one window pass per key
  * ordered by (time, side) forward-fills the most recent right payload
  * onto left rows. Cost = one shuffle on `by` + one sort — linear in
  * input, no per-row range probe, no skew blowup from inequality joins;
  * this is the plan that survives 100 TB (a broadcast-range join would
  * not, and Spark's inequality joins degrade to BNL).
  *
  * Ties (right.ts == left.ts): the right row wins (<= semantics), because
  * rights sort before lefts at equal timestamps.
  */
object AsOfJoin {

  /** @param left       left rows (kept in full)
    * @param right      right rows; `payload` columns are attached
    * @param leftOn     left event-time column name
    * @param rightOn    right event-time column name
    * @param by         equi-key column names (same names both sides)
    * @param payload    right columns to carry (renamed as-is onto output)
    */
  def backward(left: DataFrame, right: DataFrame, leftOn: String,
               rightOn: String, by: Seq[String], payload: Seq[String]): DataFrame = {
    val t = "__asof_t"
    val side = "__asof_side" // 0 = right, 1 = left: rights first on ties
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn(t, col(leftOn)).withColumn(side, lit(1))
      .select((by ++ Seq(t, side)).map(col) ++
        leftCols.filterNot(by.contains).map(col) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")): _*)
    val r = right
      .withColumn(t, col(rightOn)).withColumn(side, lit(0))
      .select((by ++ Seq(t, side)).map(col) ++
        leftCols.filterNot(by.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(c => col(c).as(s"__p_$c")): _*)
    // Payload columns appended as tiebreakers: multiple right rows at the
    // same (key, ts) would otherwise attach a shuffle-order-dependent
    // payload; with the tiebreak the max payload tuple wins, always.
    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(col(t) +: col(side) +: payload.map(c => col(s"__p_$c")): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = l.unionByName(r)
      .select(col("*") +: payload.map(c =>
        last(col(s"__p_$c"), ignoreNulls = true).over(w).as(c)): _*)
    filled.filter(col(side) === 1)
      .select((leftCols ++ payload).map(col): _*)
  }
}
