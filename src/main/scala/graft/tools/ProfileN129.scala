package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextAnalysis}

/** Throwaway stage profiler for n129 (VERDICT r9 #5): times the three
  * stages — URL star-edge build, SymSpell fuzzy-title pairs, min-label
  * CC — separately on the bench fixture, twice each (min-of-two, the
  * Bench convention), cache cleared between runs. Results land in
  * PLANS.md "n129 stage profile".
  */
object ProfileN129 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id * 2)").collect()

    def docs: DataFrame = {
      val base = graft.sources.Tables(spark, sfDir, "documents")
      base.unionAll(base.filter(col("doc_id") < 3)
        .withColumn("doc_id", col("doc_id") + 1000000L))
    }
    def urlEdges: DataFrame = {
      val base = docs.select(col("doc_id"),
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
      canon.join(hub, "cu").filter(col("doc_id") =!= col("hub"))
        .select(col("hub").as("doc_id_a"), col("doc_id").as("doc_id_b"))
    }
    def titleEdges: DataFrame =
      Dedup.fuzzyTitlePairs(docs, keyLen = 32).select("doc_id_a", "doc_id_b")

    def time(name: String)(mk: => DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      val (a, b) = (once(), once())
      println(f"[profile] $name%-28s min=${math.min(a, b)}%7.3f  runs=[$a%.3f, $b%.3f]")
    }

    time("url_star_edges")(urlEdges)
    time("symspell_title_pairs")(titleEdges)
    time("cc_on_prebuilt_edges") {
      // isolate the CC rounds: edges materialized first, outside the clock
      val edges = urlEdges.unionAll(titleEdges)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      edges.count()
      val t0 = System.nanoTime()
      val out = Dedup.dupClusters(edges)
      out.write.format("noop").mode("overwrite").save()
      println(f"[profile] cc_rounds_only             min=${(System.nanoTime() - t0) / 1e9}%7.3f")
      edges.unpersist()
      out
    }
    time("cc_fast_on_prebuilt_edges") {
      val edges = urlEdges.unionAll(titleEdges)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      edges.count()
      val t0 = System.nanoTime()
      val out = Dedup.dupClustersFast(edges)
      out.write.format("noop").mode("overwrite").save()
      println(f"[profile] cc_fast_rounds_only        min=${(System.nanoTime() - t0) / 1e9}%7.3f")
      edges.unpersist()
      out
    }
    time("full_n129")(graft.SparkEntry.queries("n129_entity_resolution")(spark, sfDir))
    spark.stop()
  }
}
