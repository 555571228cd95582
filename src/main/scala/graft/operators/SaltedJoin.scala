package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join (SURVEY.md §4 / the 100 TB checklist).
  *
  * AQE's skew-join handles most cases at runtime; this explicit salt is
  * for the pathological long-tail key (one key = double-digit % of the
  * table) where even a split partition overwhelms a task, or when AQE
  * is unavailable (streaming joins, deterministic plans).
  *
  * Left rows get a random salt in [0, buckets); the right side is
  * replicated `buckets` times (explode of a literal range — NOT a
  * shuffle; the replication happens post-scan, map-side). The join key
  * becomes (key, salt), spreading each hot key over `buckets` tasks.
  * Right-side replication cost = |right| * buckets, so use this with a
  * small-to-medium right side that is still too big (or unwanted) to
  * broadcast.
  */
object SaltedJoin {

  def inner(left: DataFrame, right: DataFrame, key: String,
            buckets: Int = 16, seed: Long = 42L): DataFrame = {
    require(buckets > 0)
    val salted = left.withColumn("__salt",
      (rand(seed) * buckets).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
