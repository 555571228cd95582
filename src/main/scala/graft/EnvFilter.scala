package graft

/** Shared SPARK_GRAFT_ONLY parsing for [[Bench]] and [[Verify]] — one
  * definition so the two entry points cannot drift. Names must match
  * `SparkEntry.queries` keys exactly; [[validate]] fails fast on
  * unknown names or an empty selection, because a filter that matches
  * nothing would otherwise produce a vacuously green gate ("0 pass,
  * 0 fail") — the repo's vacuity rule applied to the tooling itself.
  */
object EnvFilter {
  def only: Option[Set[String]] =
    sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)

  def selected(name: String): Boolean = only.forall(_.contains(name))

  /** Call once with the known query names before using [[selected]]. */
  def validate(known: Set[String]): Unit = only.foreach { names =>
    require(names.nonEmpty,
      "SPARK_GRAFT_ONLY is set but selects zero queries")
    val unknown = names.diff(known)
    require(unknown.isEmpty,
      s"SPARK_GRAFT_ONLY names not in SparkEntry.queries: ${unknown.toSeq.sorted.mkString(", ")}")
  }
}
