package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Generates `docs/OPERATORS.md` — the discoverable operator index
  * (query id → engine entry points → oracle kind → one-line
  * description) that VERDICT r7 asked for: the 246-query surface in
  * one table, instead of 350 lines of prose in COVERAGE.md.
  *
  * The generator is deliberately source-derived so it can never lie
  * about the surface: query ids and oracle coverage come from
  * [[SparkEntry.queries]] / [[SparkEntry.oracleSql]] at runtime, the
  * description is each query's own leading comment in
  * `SparkEntry.scala`, and the entry points are the `Object.method(`
  * references inside the query body (filtered to the library's
  * operator objects). `EngineSpec` regenerates the document in memory
  * and fails if the checked-in file drifts from the code.
  */
object OperatorIndex {

  /** Repo root found by walking up from the CWD to `build.sbt`, so
    * generate() (and the EngineSpec drift gate) work no matter which
    * directory sbt or a test runner launched from — CWD-relative
    * paths failed with "layout changed" from anywhere but the root.
    */
  private def repoRoot: java.nio.file.Path = {
    var d = Paths.get("").toAbsolutePath
    while (d != null && !Files.exists(d.resolve("build.sbt"))) d = d.getParent
    require(d != null, "repo root not found: no build.sbt above " +
      Paths.get("").toAbsolutePath)
    d
  }

  private lazy val SparkEntryPath =
    repoRoot.resolve("src/main/scala/graft/SparkEntry.scala")

  /** Where the generated index lives (root-anchored, for the drift gate). */
  lazy val docsPath: java.nio.file.Path = repoRoot.resolve("docs/OPERATORS.md")

  /** Operator-bearing objects worth naming in the index. */
  private val Objects = Set(
    "Dedup", "Similarity", "Ivf", "Clustering", "TextAnalysis", "Sampling",
    "Sketch", "Graph", "Multimodal", "Profile", "Gssha", "Crop",
    "TemporalResample", "SpatialResample", "PointExtract", "VariableMerge",
    "Reproject", "AsOfJoin", "RangeJoin", "SaltedJoin", "PrefixJoin", "Scd",
    "Skyline", "TimeSeries", "EventStreams", "Catalog", "Cmr",
    "PointsAndSinks", "SyntheticGrid", "Zorder", "Bucketing", "Compaction",
    "GraftFunctions", "GraftExtensions", "Spline", "Crs", "TimeParse",
    "Udafs", "Gif", "Iterate", "Grid", "Tables")

  private val queryStart =
    """^\s*"([a-zA-Z0-9_]+)"\s*->\s*\(\(.*\)\s*=>\s*\{\s*$""".r
  private val comment = """^\s*//\s?(.*)$""".r
  private val call = """([A-Z][A-Za-z]*)\.([a-zA-Z0-9_]+)\(""".r

  final case class Entry(name: String, description: String,
                         entryPoints: Seq[String])

  /** Parse the queries map region of SparkEntry.scala into entries. */
  private def parseEntries(): Map[String, Entry] = {
    val lines = Files.readAllLines(SparkEntryPath).asScala.toVector
    val from = lines.indexWhere(_.contains("def queries"))
    val until = lines.indexWhere(_.contains("def oracleSql"), from)
    require(from >= 0 && until > from, "SparkEntry.scala layout changed")
    val region = lines.slice(from, until)
    // split into (name, bodyLines) blocks
    val starts = region.zipWithIndex.collect {
      case (queryStart(n), i) => (n, i)
    }
    starts.zipAll(starts.drop(1).map(_._2), ("", 0), region.size).collect {
      case ((name, i), end) if name.nonEmpty =>
        val body = region.slice(i + 1, end)
        val desc = body.takeWhile(l => comment.findFirstIn(l).isDefined)
          .collect { case comment(t) => t }
          .mkString(" ").replaceAll("\\s+", " ").trim
        val eps = body.flatMap(l => call.findAllMatchIn(l).map(m =>
            (m.group(1), m.group(2))))
          .filter { case (o, _) => Objects(o) }
          .map { case (o, m) => s"$o.$m" }
          .distinct.take(3)
        name -> Entry(name, desc, eps)
    }.toMap
  }

  def generate(): String = {
    val parsed = parseEntries()
    val names = SparkEntry.queries.keySet
    val oracled = SparkEntry.oracleSql.keySet
    require(parsed.keySet == names,
      "SparkEntry.scala parse drifted from the queries map: " +
        s"missing=${(names -- parsed.keySet).toSeq.sorted.take(5)} " +
        s"extra=${(parsed.keySet -- names).toSeq.sorted.take(5)}")
    val groups = Seq(
      ("g — grid / reference-parity queries", "g"),
      ("q — relational / SQL-surface queries", "q"),
      ("n — LLM-data-pipeline queries", "n"))
    // completeness guard: a query outside the known prefixes would be
    // silently absent from every table (and the drift check, comparing
    // generator output to generator output, would never notice)
    val orphans = names.filterNot(n => groups.exists { case (_, p) => n.startsWith(p) })
    require(orphans.isEmpty,
      s"queries outside the g/q/n groups would vanish from the index: " +
        s"${orphans.toSeq.sorted.mkString(", ")} — add their prefix group")
    val sb = new StringBuilder
    sb.append("# Operator index\n\n")
    sb.append("GENERATED by `sbt \"runMain graft.OperatorIndex\"` — do not " +
      "edit by hand (EngineSpec fails if this file drifts from " +
      "`SparkEntry`).\n\n")
    sb.append(s"${names.size} queries; ${oracled.size} DuckDB-oracled, " +
      s"${names.size - oracled.size} rows-only. Columns: the engine entry " +
      "points a query exercises (up to 3), whether the driver gate " +
      "hash-matches it against oracle SQL, and the query's own header " +
      "comment.\n")
    groups.foreach { case (title, prefix) =>
      sb.append(s"\n## $title\n\n")
      sb.append("| query | entry points | oracle | description |\n")
      sb.append("|---|---|---|---|\n")
      names.filter(_.startsWith(prefix)).toSeq.sorted.foreach { n =>
        val e = parsed(n)
        val eps = if (e.entryPoints.isEmpty) "SparkEntry (inline DataFrame/SQL)"
          else e.entryPoints.map(p => s"`$p`").mkString(", ")
        val ora = if (oracled(n)) "SQL" else "rows-only"
        val desc = e.description.replace("|", "\\|")
        sb.append(s"| $n | $eps | $ora | $desc |\n")
      }
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val out = docsPath
    Files.createDirectories(out.getParent)
    Files.writeString(out, generate())
    println(s"wrote $out")
  }
}
