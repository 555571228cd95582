package graft.operators

import graft.model.GridDataset

/** Variable merge (SURVEY.md §2.3 J1) and time-concat (§2.7 U1).
  *
  * Reference: `xr.merge` aligns N single-variable datasets on shared
  * (time, y, x) coords (reference: shared_functions.py:64-97). In our
  * columnar model, variables fetched together are already columns of one
  * scan — the merge is only needed for genuinely heterogeneous sources,
  * where it is a multi-way full-outer equi-join on the dimension key.
  * Spark plans this as a shuffle join on (time, y, x); when sources are
  * bucketed/partitioned the same way, no extra exchange is needed.
  */
object VariableMerge {

  /** Full-outer coordinate-aligned merge (xr.merge semantics: cells
    * missing from one source carry null for its variables).
    */
  def merge(gs: Seq[GridDataset]): GridDataset = {
    require(gs.nonEmpty, "nothing to merge")
    val head = gs.head
    val dims = Seq(head.meta.timeDim, head.meta.yDim, head.meta.xDim)
    val df = gs.map(_.df).reduce(_.join(_, dims, "full_outer"))
    head.copy(df = df)
  }

  /** Time-concat of disjoint chunks (xr.concat along time — reference:
    * era5_from_aws.py:254-261). Chunk order is irrelevant: a union is
    * unordered and sinks that need order sort explicitly.
    */
  def concatTime(gs: Seq[GridDataset]): GridDataset = {
    require(gs.nonEmpty, "nothing to concat")
    gs.head.copy(df = gs.map(_.df).reduce(_.unionByName(_)))
  }
}
