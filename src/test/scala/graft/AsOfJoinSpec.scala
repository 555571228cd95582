package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  test("salted join returns exactly the rows of the plain join") {
    import spark.implicits._
    // skewed left: one hot key
    val left = (1 to 500).map(i => (if (i % 5 == 0) "hot" else s"k$i", i))
      .toDF("key", "lv")
    val right = Seq(("hot", 1.0), ("k3", 2.0), ("k7", 3.0)).toDF("key", "rv")
    val plain = left.join(right, "key")
    val salted = graft.operators.SaltedJoin.inner(left, right, "key", buckets = 8)
    assert(salted.count() == plain.count())
    assert(salted.select("key", "lv", "rv").except(plain.select("key", "lv", "rv")).count() == 0)
    assert(plain.select("key", "lv", "rv").except(salted.select("key", "lv", "rv")).count() == 0)
  }

  test("banded range join equals the naive inequality join") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = (1 to 200).map(i => (i.toLong, (i % 5).toLong, rnd.nextInt(100000).toDouble))
      .toDF("p_id", "user_id", "p_t")
      .withColumn("p_ts", col("p_t").cast("timestamp")).drop("p_t")
    val right = (1 to 200).map(i => (i.toLong + 1000, (i % 5).toLong, rnd.nextInt(100000).toDouble))
      .toDF("c_id", "user_id", "c_t")
      .withColumn("c_ts", col("c_t").cast("timestamp")).drop("c_t")
    val banded = graft.operators.RangeJoin.within(left, right, "p_ts", "c_ts",
        Seq("user_id"), 500).select("p_id", "c_id")
    val naive = left.join(right, Seq("user_id"))
      .filter(abs(col("p_ts").cast("double") - col("c_ts").cast("double")) <= 500)
      .select("p_id", "c_id")
    assert(banded.count() == naive.count())
    assert(banded.except(naive).count() == 0 && naive.except(banded).count() == 0)
  }

  test("backward as-of join picks latest right <= left, ties inclusive") {
    import spark.implicits._
    val left = Seq((1L, "2020-01-01 10:00:00", 100L), (1L, "2020-01-01 12:00:00", 101L),
                   (2L, "2020-01-01 09:00:00", 102L))
      .toDF("user_id", "ts", "order_id")
      .withColumn("ts", col("ts").cast("timestamp"))
    val right = Seq((1L, "2020-01-01 09:30:00", 900L), (1L, "2020-01-01 10:00:00", 901L),
                    (1L, "2020-01-01 11:00:00", 902L), (2L, "2020-01-01 09:30:00", 903L))
      .toDF("user_id", "click_ts", "click_id")
      .withColumn("click_ts", col("click_ts").cast("timestamp"))
    val out = AsOfJoin.backward(left, right, "ts", "click_ts",
        by = Seq("user_id"), payload = Seq("click_id"))
      .orderBy("order_id").collect()
    // order 100 at 10:00 ties with click 901 at 10:00 -> inclusive (<=)
    assert(out(0).getAs[Long]("click_id") == 901L)
    // order 101 at 12:00 -> latest prior click is 902
    assert(out(1).getAs[Long]("click_id") == 902L)
    // order 102 at 09:00 has no prior click -> null
    assert(out(2).isNullAt(out(2).fieldIndex("click_id")))
  }
}
