package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import org.apache.spark.sql.graft.{GraftFunctions, ZorderKernels}
import graft.sources.Zorder

class ZorderSpec extends SparkSpec {

  test("property: interleave matches a naive bit-by-bit reimplementation") {
    val idx = Gen.choose(0L, 0xffffffffL)
    val prop = Prop.forAll(idx, idx) { (y, x) =>
      val naive = (0 until 32).foldLeft(0L) { (acc, b) =>
        acc | (((x >>> b) & 1L) << (2 * b)) | (((y >>> b) & 1L) << (2 * b + 1))
      }
      ZorderKernels.interleave(y, x) == naive
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
    // locality sanity: the 2x2 neighborhood at the origin is the first
    // four curve positions
    assert(ZorderKernels.interleave(0, 0) == 0L)
    assert(ZorderKernels.interleave(0, 1) == 1L)
    assert(ZorderKernels.interleave(1, 0) == 2L)
    assert(ZorderKernels.interleave(1, 1) == 3L)
  }

  test("z-ordered layout clusters both axes: an x-stripe touches few files") {
    import spark.implicits._
    // 32x32 cell grid; 16 files of ~64 cells each. Row-major: each file
    // is a y-band covering ALL x, so an x-stripe predicate intersects
    // every file. Z-ordered: each file is ~an 8x8 tile, so the 8-wide
    // x-stripe lives in ~4 of 16 files — that clustering is exactly
    // what parquet min/max row-group pruning needs on a bbox filter.
    val cells = (0 until 32).flatMap(jy => (0 until 32).map(jx =>
      (jy.toLong, jx.toLong, jy * 32L + jx))).toDF("jy", "jx", "v")
    val dir = Files.createTempDirectory("zorder").toString
    Zorder.writeZordered(cells, col("jy"), col("jx"), s"$dir/z", numFiles = 16)
    cells.repartitionByRange(16, col("jy"), col("jx"))
      .sortWithinPartitions("jy", "jx")
      .write.parquet(s"$dir/rowmajor")
    def filesTouched(path: String): Long =
      spark.read.parquet(path).filter(col("jx") < 8)
        .select(input_file_name()).distinct().count()
    val zFiles = filesTouched(s"$dir/z")
    val rmFiles = filesTouched(s"$dir/rowmajor")
    assert(rmFiles >= 12, s"row-major control should spread the stripe (got $rmFiles)")
    assert(zFiles <= 8, s"z-order should confine the stripe (got $zFiles)")
    assert(zFiles < rmFiles)
    // and the layout is lossless
    assert(spark.read.parquet(s"$dir/z").drop("zkey").count() == 1024)
  }

  test("hilbert key: nesting bijectivity and the adjacency property Morton lacks") {
    import org.apache.spark.sql.graft.HilbertKernels
    // the first 4^4 positions of the order-16 curve fill exactly the
    // [0,16)^2 subsquare (nesting), bijectively
    val cells = for (y <- 0 until 16; x <- 0 until 16)
      yield (HilbertKernels.xy2d(y.toLong, x.toLong), (y, x))
    assert(cells.map(_._1).sorted == (0L until 256L))
    // DEFINING property: consecutive curve positions are 4-adjacent
    // grid neighbors — everywhere, no seam jumps
    val byKey = cells.sortBy(_._1).map(_._2)
    for (i <- 1 until byKey.length) {
      val (y0, x0) = byKey(i - 1); val (y1, x1) = byKey(i)
      assert(math.abs(y1 - y0) + math.abs(x1 - x0) == 1,
        s"curve jump between d=${i - 1} and d=$i: ($y0,$x0) -> ($y1,$x1)")
    }
    // Morton, by contrast, jumps at the first quadrant seam (d=3 -> 4)
    val mByKey = (for (y <- 0 until 16; x <- 0 until 16)
      yield (ZorderKernels.interleave(y.toLong, x.toLong), (y, x))).sortBy(_._1).map(_._2)
    assert((1 until mByKey.length).exists { i =>
      val (y0, x0) = mByKey(i - 1); val (y1, x1) = mByKey(i)
      math.abs(y1 - y0) + math.abs(x1 - x0) > 1
    })
    // domain guard
    intercept[IllegalArgumentException](HilbertKernels.xy2d(-1L, 0L))
    intercept[IllegalArgumentException](HilbertKernels.xy2d(0L, 1L << 16))
  }

  test("hilbert-clustered layout confines an x-stripe like z-order") {
    import spark.implicits._
    val cells = (0 until 32).flatMap(jy => (0 until 32).map(jx =>
      (jy.toLong, jx.toLong, jy * 32L + jx))).toDF("jy", "jx", "v")
    val dir = java.nio.file.Files.createTempDirectory("hilbert").toString
    Zorder.writeHilbertClustered(cells, col("jy"), col("jx"), s"$dir/h", numFiles = 16)
    val touched = spark.read.parquet(s"$dir/h").filter(col("jx") < 8)
      .select(input_file_name()).distinct().count()
    assert(touched <= 8, s"hilbert should confine the stripe (got $touched)")
    assert(spark.read.parquet(s"$dir/h").drop("hkey").count() == 1024)
    // SQL surface agrees with the kernel
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT hilbert_key(5L, 9L) AS h").collect()(0).getLong(0)
    assert(viaSql == org.apache.spark.sql.graft.HilbertKernels.xy2d(5L, 9L))
  }

  test("interleave_bits through the SQL surface") {
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    val r = spark.sql("SELECT interleave_bits(3L, 5L) AS z").collect()(0)
    // y=0b11 odd positions, x=0b101 even positions -> 0b101+0b11 pattern
    assert(r.getLong(0) == ZorderKernels.interleave(3L, 5L))
    import spark.implicits._
    val viaColumn = Seq((3L, 5L)).toDF("y", "x")
      .select(GraftFunctions.interleave_bits(col("y"), col("x"))).collect()(0).getLong(0)
    assert(viaColumn == r.getLong(0))
  }
}
