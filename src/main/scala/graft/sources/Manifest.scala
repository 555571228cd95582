package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic, versioned multi-relation publish — the coordination layer
  * the maintained-corpus story needs once MORE THAN ONE index family
  * serves readers (TakedownDemo publishes nine: corpus, refcounted
  * digests, minhash bands, sign buckets, IVF, IVF-PQ, Hamming bands,
  * gram index, clusters + card state). Each family alone rewrites
  * atomically (parquet overwrite), but a purge that rewrites nine
  * directories one-by-one exposes every intermediate mix to readers:
  * a dedup slice could fetch text the band index no longer admits, or
  * admit a near-copy whose suppressor is mid-rewrite. The fix is the
  * standard snapshot-pointer scheme (the idea behind table formats'
  * manifest files — Iceberg/Delta-style, re-expressed minimally):
  *
  *   - every publish writes ALL families under a fresh `v=N/`
  *     directory (never in place),
  *   - then swaps one small `MANIFEST.json` pointer via
  *     write-temp + ATOMIC_MOVE — readers resolve the pointer first,
  *     so they see version N-1 in full until the rename lands, then
  *     version N in full; no reader ever observes a mix,
  *   - old versions stay readable (time travel / slow-reader grace)
  *     until [[vacuum]] drops them.
  *
  * Scope: a local/posix-rename filesystem (the test and demo
  * environment). On an object store the same pointer scheme rides the
  * store's conditional-put; the layout and reader protocol are
  * unchanged — that is why the pointer is one tiny JSON, not a
  * directory listing convention.
  *
  * Cf. reference repo `xarray_data_accessor/shared_functions.py`
  * (write_crs_file / table-sink helpers) for the closest surface the
  * reference has — single-file sinks with no multi-relation atomicity;
  * this extension is the production completion of that seam.
  */
object Manifest {

  /** One published family: relation + optional partition columns (the
    * spec-proven layouts: band indexes partitionBy(band), IVF by
    * list_id).
    */
  final case class Family(df: DataFrame, partitionBy: Seq[String] = Seq.empty)

  private def pointerPath(root: String): Path = Paths.get(root, "MANIFEST.json")

  /** Publish `families` as the next version: write every relation
    * under `root/v=N/<name>` (N = current version + 1), then swap the
    * pointer atomically. Returns N. Concurrent publishers are detected
    * by the version directory already existing (first-writer-wins;
    * losers must re-read and retry on a fresh version). `blobs` are
    * byte sidecars that version WITH the relations — bloom sketches,
    * centroid dumps: a sidecar that outlives the index it summarizes
    * is exactly the skew the manifest exists to prevent.
    */
  def publish(root: String, families: Map[String, Family],
              blobs: Map[String, Array[Byte]] = Map.empty): Long = {
    require(families.nonEmpty, "nothing to publish")
    require((families.keys ++ blobs.keys).forall(n => n.nonEmpty &&
      !n.contains('/') && !n.contains('\\') && n != "." && n != ".."),
      "family/blob names must be plain")
    require(families.keySet.intersect(blobs.keySet).isEmpty,
      "a name cannot be both a relation and a blob")
    Files.createDirectories(Paths.get(root))
    // next = 1 + max(pointer, highest v= dir): a publisher that crashed
    // after creating its directory but before the pointer swap must not
    // block the next publish forever — its orphan dir is skipped over
    // (and reclaimed by vacuum once the pointer passes it)
    val next = math.max(currentVersion(root).getOrElse(0L),
      versionDirs(root).maxOption.getOrElse(0L)) + 1L
    val vDir = Paths.get(root, s"v=$next")
    // the concurrent-writer guard: createDirectory is atomic — a loser
    // fails here and must retry against the new current version
    Files.createDirectory(vDir)
    families.foreach { case (name, fam) =>
      val w = fam.df.write.mode("errorifexists")
      val w2 = if (fam.partitionBy.nonEmpty)
        w.partitionBy(fam.partitionBy: _*) else w
      w2.parquet(vDir.resolve(name).toString)
    }
    blobs.foreach { case (name, bytes) =>
      Files.write(vDir.resolve(name), bytes)
    }
    val json = ("{\"version\": " + next + ", \"families\": [" +
      families.keys.toSeq.sorted.map(n => "\"" + n + "\"").mkString(", ") +
      "]}\n").getBytes(StandardCharsets.UTF_8)
    val tmp = Paths.get(root, s".MANIFEST.json.tmp.$next")
    Files.write(tmp, json)
    // the swap: readers resolve the pointer before any data path, so
    // this single rename is the publish's linearization point
    Files.move(tmp, pointerPath(root), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** The pointer's current version, if any publish has landed. */
  def currentVersion(root: String): Option[Long] = {
    val p = pointerPath(root)
    if (!Files.exists(p)) None
    else {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      val m = """"version"\s*:\s*(\d+)""".r.findFirstMatchIn(s)
      m.map(_.group(1).toLong)
    }
  }

  /** RELATION family names present in version `version`. Always read
    * from the version directory — relations are DIRECTORIES, blob
    * sidecars are plain files, so the listing filter keeps the answer
    * identical for the current and for time-traveled versions (a
    * pointer-JSON read would cover only the current one and drift).
    */
  def familiesOf(root: String, version: Long): Seq[String] = {
    val vDir = Paths.get(root, s"v=$version")
    if (!Files.isDirectory(vDir)) Seq.empty
    else {
      val it = Files.list(vDir)
      try it.iterator().asScala.filter(Files.isDirectory(_))
        .map(_.getFileName.toString).toSeq.sorted
      finally it.close()
    }
  }

  /** Read family `name` at the pointer's current version. */
  def read(spark: SparkSession, root: String, name: String): DataFrame = {
    val v = currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no manifest at $root"))
    readAt(spark, root, name, v)
  }

  /** Time travel: read family `name` at an explicit version (older
    * versions stay on disk until [[vacuum]]).
    */
  def readAt(spark: SparkSession, root: String, name: String,
             version: Long): DataFrame =
    spark.read.parquet(Paths.get(root, s"v=$version", name).toString)

  /** Read a byte sidecar at the pointer's current version. */
  def readBlob(root: String, name: String): Array[Byte] = {
    val v = currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no manifest at $root"))
    Files.readAllBytes(Paths.get(root, s"v=$v", name))
  }

  /** Drop every version strictly older than `keepFrom` (slow-reader
    * grace is the caller's policy — e.g. keep the pointer's version
    * and one behind). The pointer's version itself is always kept.
    */
  def vacuum(root: String, keepFrom: Long): Seq[Long] = {
    val keep = math.min(keepFrom, currentVersion(root).getOrElse(keepFrom))
    val dropped = versionDirs(root).filter(_ < keep)
      .map(v => (Paths.get(root, s"v=$v"), v))
    dropped.foreach { case (p, _) => deleteRecursively(p) }
    // a publish that crashed between writing its temp pointer and the
    // atomic rename leaves .MANIFEST.json.tmp.N behind — reclaim those
    // under the same version rule as the directories
    val it = Files.list(Paths.get(root))
    try it.iterator().asScala
      .filter(p => p.getFileName.toString.startsWith(".MANIFEST.json.tmp."))
      .filter(_.getFileName.toString.stripPrefix(".MANIFEST.json.tmp.")
        .toLongOption.exists(_ < keep))
      .foreach(Files.delete(_))
    finally it.close()
    dropped.map(_._2).sorted
  }

  private def versionDirs(root: String): Seq[Long] = {
    val r = Paths.get(root)
    if (!Files.isDirectory(r)) Seq.empty
    else {
      val it = Files.list(r)
      try it.iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("v="))
        .flatMap(p => p.getFileName.toString.drop(2).toLongOption)
        .toSeq
      finally it.close()
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val it = Files.list(p)
      try it.iterator().asScala.foreach(deleteRecursively)
      finally it.close()
    }
    Files.delete(p)
  }
}
