package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic, versioned multi-relation publish — the coordination layer
  * the maintained-corpus story needs once MORE THAN ONE index family
  * serves readers (TakedownDemo publishes eleven: corpus, refcounted
  * digests, minhash bands, sign buckets, IVF, IVF-PQ, Hamming bands,
  * gram index, clusters, BM25 postings, LM state + card state). Each
  * family alone rewrites atomically (parquet overwrite), but a purge
  * that rewrites eleven directories one-by-one exposes every
  * intermediate mix to readers: a dedup slice could fetch text the
  * band index no longer admits, or admit a near-copy whose suppressor
  * is mid-rewrite. The fix is the standard snapshot-pointer scheme
  * (the idea behind table formats' manifest files — Iceberg/Delta-
  * style, re-expressed minimally):
  *
  *   - every publish writes the CHANGED families under a fresh `v=N/`
  *     directory (never in place), and records a snapshot that maps
  *     EVERY family to the version directories holding its data,
  *   - then swaps one small `MANIFEST.json` pointer via
  *     write-temp + ATOMIC_MOVE — readers resolve the pointer first,
  *     so they see version N-1 in full until the rename lands, then
  *     version N in full; no reader ever observes a mix,
  *   - old versions stay readable (time travel / slow-reader grace)
  *     until [[vacuum]] drops them.
  *
  * DELTA PUBLISH (r13 — the O(slice) publish the delta-sized
  * maintenance operators deserve; before this, every publish rewrote
  * every family in full, so a weekly purge re-materialized the whole
  * corpus plus all eleven index families per version):
  *
  *   - an UNCHANGED family is simply not passed: its snapshot entry
  *     carries forward verbatim, pointing at the version directories
  *     that last wrote it — zero bytes written;
  *   - a REWRITTEN family (`Family(df)`) gets one fresh segment
  *     `v=N/<name>` and its entry becomes `[N]` — the retraction
  *     flavor (anti-joins shrink, so the rewrite is the honest form);
  *   - an APPENDED family (`Family(df, append = true)`) gets a fresh
  *     DELTA segment and its entry becomes `prior :+ N`; readers
  *     union all segments — the slice-append flavor (per-doc-keyed
  *     index families make append a plain union by construction);
  *   - [[compactFamily]] folds a family's accumulated deltas back
  *     into one base segment through an ordinary publish, so
  *     compaction inherits the same atomicity.
  *
  * Each snapshot is also persisted inside its own version directory
  * (`v=N/_manifest.json`, immutable once the pointer lands), so time
  * travel resolves mixed-version snapshots without trusting directory
  * listings, and [[vacuum]] can see which old version directories a
  * retained snapshot still references — it refuses to drop those.
  *
  * Concurrency (ADVICE r12): publishers are optimistic. The version
  * directory create is atomic (a same-instant loser fails there), and
  * immediately before the pointer swap the publisher re-reads the
  * pointer and ABORTS (`ConcurrentModificationException`) if it moved
  * off the snapshot the publish was planned against — a slow publisher
  * can no longer move the pointer backward over a faster one's commit,
  * nor carry forward entries that commit made stale. The residual
  * read-to-rename window is microseconds but not zero: on a posix
  * filesystem with no compare-and-swap rename this is as far as
  * optimism goes — serialize publishers externally (single maintenance
  * job — the production norm) or retry on the exception; an aborted
  * publish leaves only an orphan `v=N` directory that the next
  * publish skips and [[vacuum]] reclaims.
  *
  * Scope: a local/posix-rename filesystem (the test and demo
  * environment). On an object store the same pointer scheme rides the
  * store's conditional-put (which also closes the residual window);
  * the layout and reader protocol are unchanged — that is why the
  * pointer is one tiny JSON, not a directory listing convention.
  *
  * Cf. reference repo `xarray_data_accessor/shared_functions.py`
  * (write_crs_file / table-sink helpers) for the closest surface the
  * reference has — single-file sinks with no multi-relation atomicity;
  * this extension is the production completion of that seam.
  */
object Manifest {

  /** One published family: relation + optional partition columns (the
    * spec-proven layouts: band indexes partitionBy(band), IVF by
    * list_id). `append = true` publishes the rows as a DELTA segment
    * on top of the family's prior segments (readers union); `false`
    * replaces the family outright. An appended family must keep its
    * recorded partition columns (one layout per family).
    */
  final case class Family(df: DataFrame, partitionBy: Seq[String] = Seq.empty,
                          append: Boolean = false)

  /** One family's snapshot entry: the ordered version directories
    * holding its segments (base first, deltas after — readers union
    * `v=<seg>/<name>` over all of them) and its partition columns.
    */
  final case class FamilyEntry(segments: Seq[Long], partitionBy: Seq[String])

  /** A full snapshot: what every family and blob resolves to at one
    * version. Immutable once its pointer swap lands.
    */
  final case class Snapshot(version: Long, families: Map[String, FamilyEntry],
                            blobs: Map[String, Long])

  private val mapper = new ObjectMapper()

  private def pointerPath(root: String): Path = Paths.get(root, "MANIFEST.json")

  private def snapshotJson(s: Snapshot): Array[Byte] = {
    val rootNode = mapper.createObjectNode()
    rootNode.put("version", s.version)
    val famNode = rootNode.putObject("families")
    s.families.toSeq.sortBy(_._1).foreach { case (name, e) =>
      val f = famNode.putObject(name)
      val segs = f.putArray("segments")
      e.segments.foreach(segs.add)
      val parts = f.putArray("partitionBy")
      e.partitionBy.foreach(parts.add)
    }
    val blobNode = rootNode.putObject("blobs")
    s.blobs.toSeq.sortBy(_._1).foreach { case (n, v) => blobNode.put(n, v) }
    (mapper.writerWithDefaultPrettyPrinter().writeValueAsString(rootNode) + "\n")
      .getBytes(StandardCharsets.UTF_8)
  }

  private def parseSnapshot(bytes: Array[Byte]): Snapshot = {
    val t = mapper.readTree(bytes)
    val fams = t.get("families").properties().asScala.map { e =>
      val segs = e.getValue.get("segments").elements().asScala
        .map(_.asLong()).toSeq
      val parts = e.getValue.get("partitionBy").elements().asScala
        .map(_.asText()).toSeq
      e.getKey -> FamilyEntry(segs, parts)
    }.toMap
    val blobs = t.get("blobs").properties().asScala
      .map(e => e.getKey -> e.getValue.asLong()).toMap
    Snapshot(t.get("version").asLong(), fams, blobs)
  }

  /** Publish `families` as the next version: write each CHANGED
    * relation under `root/v=N/<name>` (N = current version + 1), carry
    * every unnamed prior family and blob forward by reference (zero
    * bytes — the delta-publish contract), then swap the pointer
    * atomically. Returns N. `blobs` are byte sidecars that version
    * WITH the relations — bloom sketches, centroid dumps: a sidecar
    * that outlives the index it summarizes is exactly the skew the
    * manifest exists to prevent; pass a blob in the same publish as
    * the family it summarizes.
    */
  def publish(root: String, families: Map[String, Family],
              blobs: Map[String, Array[Byte]] = Map.empty): Long = {
    require(families.nonEmpty || blobs.nonEmpty, "nothing to publish")
    require((families.keys ++ blobs.keys).forall(n =>
      n.nonEmpty && n != "_manifest.json" &&
      !n.contains('/') && !n.contains('\\') && n != "." && n != ".."),
      "family/blob names must be plain")
    require(families.keySet.intersect(blobs.keySet).isEmpty,
      "a name cannot be both a relation and a blob")
    Files.createDirectories(Paths.get(root))
    // the snapshot this publish is planned against — carry-forward
    // entries come from here, and the pre-swap guard checks the
    // pointer has not moved off it
    val base = currentVersion(root).map(v => snapshotAt(root, v))
    val baseVersion = base.map(_.version).getOrElse(0L)
    // next = 1 + max(pointer, highest v= dir): a publisher that crashed
    // after creating its directory but before the pointer swap must not
    // block the next publish forever — its orphan dir is skipped over
    // (and reclaimed by vacuum once the pointer passes it)
    val next = math.max(baseVersion, versionDirs(root).maxOption.getOrElse(0L)) + 1L
    val vDir = Paths.get(root, s"v=$next")
    // the same-instant concurrent-writer guard: createDirectory is
    // atomic — a loser fails here and must retry against the new
    // current version
    Files.createDirectory(vDir)
    families.foreach { case (name, fam) =>
      if (fam.append)
        base.flatMap(_.families.get(name)).foreach(prior =>
          require(prior.partitionBy == fam.partitionBy,
            s"append to '$name' must keep its recorded layout " +
              s"(${prior.partitionBy} != ${fam.partitionBy})"))
      val w = fam.df.write.mode("errorifexists")
      val w2 = if (fam.partitionBy.nonEmpty)
        w.partitionBy(fam.partitionBy: _*) else w
      w2.parquet(vDir.resolve(name).toString)
    }
    blobs.foreach { case (name, bytes) =>
      Files.write(vDir.resolve(name), bytes)
    }
    // the new snapshot: changed families point at (or extend into)
    // v=N, everything else carries forward by reference
    val priorFams = base.map(_.families).getOrElse(Map.empty)
    val newFams = priorFams ++ families.map { case (name, fam) =>
      val segs =
        if (fam.append)
          priorFams.get(name).map(_.segments).getOrElse(Seq.empty) :+ next
        else Seq(next)
      name -> FamilyEntry(segs, fam.partitionBy)
    }
    val newBlobs = base.map(_.blobs).getOrElse(Map.empty) ++
      blobs.keys.map(_ -> next)
    val snap = Snapshot(next, newFams, newBlobs)
    val json = snapshotJson(snap)
    // the snapshot persists INSIDE its version dir too (immutable once
    // the swap lands) — time travel and vacuum resolve through it
    Files.write(vDir.resolve("_manifest.json"), json)
    val tmp = Paths.get(root, s".MANIFEST.json.tmp.$next")
    Files.write(tmp, json)
    // pre-swap guard (ADVICE r12): abort if another publisher moved the
    // pointer off the snapshot this publish was planned against — a
    // slow publisher must neither move the pointer backward over a
    // faster one's commit nor carry forward entries that commit made
    // stale. The orphan v=N dir is left for vacuum.
    val nowV = currentVersion(root).getOrElse(0L)
    if (nowV != baseVersion)
      throw new java.util.ConcurrentModificationException(
        s"manifest at $root advanced $baseVersion -> $nowV during publish " +
          s"of v=$next; re-plan against the new current version")
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
    else Some(parseSnapshot(Files.readAllBytes(p)).version)
  }

  /** The full snapshot at an explicit version (its immutable
    * `v=N/_manifest.json`). For the pointer's version this equals the
    * pointer's own content.
    */
  def snapshotAt(root: String, version: Long): Snapshot = {
    val p = Paths.get(root, s"v=$version", "_manifest.json")
    require(Files.exists(p), s"no snapshot v=$version at $root")
    parseSnapshot(Files.readAllBytes(p))
  }

  /** The pointer's current snapshot. */
  def currentSnapshot(root: String): Snapshot = {
    val p = pointerPath(root)
    require(Files.exists(p), s"no manifest at $root")
    parseSnapshot(Files.readAllBytes(p))
  }

  /** RELATION family names visible at version `version` — ALL families
    * the snapshot resolves, including carried-forward ones whose data
    * lives in earlier version directories (a directory listing would
    * miss exactly those; the r12 listing convention predates delta
    * publish). An orphan version (crashed publish, no snapshot) has no
    * families.
    */
  def familiesOf(root: String, version: Long): Seq[String] =
    if (!Files.exists(Paths.get(root, s"v=$version", "_manifest.json")))
      Seq.empty
    else snapshotAt(root, version).families.keys.toSeq.sorted

  /** Read family `name` at the pointer's current version. */
  def read(spark: SparkSession, root: String, name: String): DataFrame = {
    val v = currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no manifest at $root"))
    readAt(spark, root, name, v)
  }

  /** Time travel: read family `name` at an explicit version. Resolves
    * through that version's snapshot, so a carried-forward or
    * segmented family reads identically to a freshly-rewritten one
    * (the union over its recorded segment directories — one dir for a
    * base, several for base + deltas).
    */
  def readAt(spark: SparkSession, root: String, name: String,
             version: Long): DataFrame = {
    val snap = snapshotAt(root, version)
    val entry = snap.families.getOrElse(name,
      throw new IllegalArgumentException(
        s"family '$name' not in snapshot v=$version at $root"))
    // one read per segment dir, unioned BY NAME: a single multi-path
    // read would run partition discovery across the v=N roots and
    // reject them as conflicting partition layers (v= itself parses as
    // a partition dir); per-root reads keep each segment's
    // partitionBy() columns and the union is order-safe
    entry.segments
      .map(s => spark.read.parquet(Paths.get(root, s"v=$s", name).toString))
      .reduce(_.unionByName(_))
  }

  /** Read a byte sidecar at the pointer's current version. */
  def readBlob(root: String, name: String): Array[Byte] = {
    val v = currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no manifest at $root"))
    readBlobAt(root, name, v)
  }

  /** Read a byte sidecar at an explicit version (resolves through the
    * snapshot, so a carried-forward blob reads from the version that
    * last wrote it).
    */
  def readBlobAt(root: String, name: String, version: Long): Array[Byte] = {
    val snap = snapshotAt(root, version)
    val bv = snap.blobs.getOrElse(name,
      throw new IllegalArgumentException(
        s"blob '$name' not in snapshot v=$version at $root"))
    Files.readAllBytes(Paths.get(root, s"v=$bv", name))
  }

  /** Fold a family's accumulated delta segments into ONE base segment
    * at the next version — the compaction pass delta publish makes
    * necessary (a weekly delta dir per family fragments the layout the
    * full rewrite was accidentally hiding). An ordinary [[publish]]
    * carries the rewritten rows, so atomicity, carry-forward of every
    * other family, and the vacuum contract all come free; the rewrite
    * repartitions to the target layout first:
    *
    *  - a partitioned family repartitions BY its partition columns, so
    *    each partition value lands in one task and writes ~one file —
    *    the probe-pruning layout restored;
    *  - an unpartitioned family repartitions to the
    *    [[Compaction.plan]] FFD bin count over its current segment
    *    files (metadata-only arithmetic), so output files pack to
    *    ~`targetBytes`.
    *
    * Content equality is the contract (spec law: compacted ≡
    * uncompacted row-for-row); the old segments stay readable for time
    * travel until [[vacuum]] drops the versions no retained snapshot
    * references. Returns the new version.
    */
  def compactFamily(spark: SparkSession, root: String, name: String,
                    targetBytes: Long = 128L << 20): Long = {
    val snap = currentSnapshot(root)
    val entry = snap.families.getOrElse(name,
      throw new IllegalArgumentException(s"family '$name' not published at $root"))
    val df = readAt(spark, root, name, snap.version)
    val repacked =
      if (entry.partitionBy.nonEmpty)
        df.repartition(entry.partitionBy.map(org.apache.spark.sql.functions.col): _*)
      else {
        val dirs = entry.segments.map(s => Paths.get(root, s"v=$s", name).toString)
        val p = Compaction.plan(spark, dirs, targetBytes)
        df.repartition(math.max(1, p.map(_.bin).fold(-1)(math.max) + 1))
      }
    publish(root, Map(name -> Family(repacked, entry.partitionBy)))
  }

  /** Total bytes under `root/v=version` — what the publish of that
    * version actually wrote (delta-publish accounting: a carried-
    * forward family contributes zero here).
    */
  def versionBytes(root: String, version: Long): Long = {
    def sizeOf(p: Path): Long =
      if (Files.isDirectory(p)) {
        val it = Files.list(p)
        try it.iterator().asScala.map(sizeOf).sum finally it.close()
      } else Files.size(p)
    val vDir = Paths.get(root, s"v=$version")
    if (Files.isDirectory(vDir)) sizeOf(vDir) else 0L
  }

  /** Drop version directories strictly older than `keepFrom`
    * (slow-reader grace is the caller's policy — e.g. keep the
    * pointer's version and one behind) — EXCEPT any a retained
    * snapshot still references: with delta publish, a live snapshot's
    * family segments may point into much older version directories
    * (that is the whole point), and dropping one would corrupt a
    * family the current reader resolves. The pointer's version is
    * always kept. Returns the versions actually dropped.
    */
  def vacuum(root: String, keepFrom: Long): Seq[Long] = {
    val keep = math.min(keepFrom, currentVersion(root).getOrElse(keepFrom))
    // every version >= keep that has a snapshot is retained (time
    // travel) — collect every version directory any of them references
    val referenced = versionDirs(root).filter(_ >= keep)
      .filter(v => Files.exists(Paths.get(root, s"v=$v", "_manifest.json")))
      .flatMap { v =>
        val s = snapshotAt(root, v)
        s.families.values.flatMap(_.segments) ++ s.blobs.values
      }.toSet
    val dropped = versionDirs(root)
      .filter(v => v < keep && !referenced.contains(v))
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
