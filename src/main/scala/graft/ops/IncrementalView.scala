package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance over a snapshot table's
  * row-level change feed ([[graft.sources.SnapshotTable.changeFeed]]).
  *
  * The view is a grouped COUNT + SUM frame — the standing corpus
  * dashboard of a training-data pipeline (docs and chars/tokens per
  * source, per language, per shard). [[build]] computes it directly
  * from a table frame; [[maintain]] advances it from a change feed at
  * DELTA price: every op is a signed contribution (`A`/`I`/`U` add a
  * row, `UB`/`D` retract one — the pre-images the feed records are
  * exactly what makes subtraction possible), the feed collapses to a
  * per-group delta in one map-side-combined aggregation, and the
  * delta folds into the standing view with a second aggregation over
  * (view ∪ delta) — the view is per-group partials, metadata-sized
  * next to the table. Counts and integer sums are exact by
  * construction (the same arithmetic [[build]] runs, reordered), so a
  * maintained view hash-equals a rebuild — the `pipe_imv` gate and
  * `IncrementalViewSpec` prove it through append, merge, copy-on-write
  * delete, and merge-on-read delete steps.
  *
  * At 100 TB: a rebuild scans the corpus; maintenance scans the
  * increment. Work per step is O(|delta| + |view|), never O(table) —
  * the bound that makes a per-commit dashboard refresh affordable,
  * measured by the `snap_imv` probe (maintain flat across a ×100
  * table, rebuild growing with it). `wh_ivm_agg` proves the same view
  * algebra on a hand-built change frame; this operator runs it over
  * the snapshot layer's REAL feed, pre-images and deletes included.
  * Reference: the reference engine has no incremental layer at all
  * (every job recomputes, `panda_mapreduce.cc` lifecycle); this is the
  * north-star extension surface (SURVEY §2.5).
  */
object IncrementalView {

  private def sumAlias(c: String) = s"sum_$c"

  /** The view, computed directly: one row per group with `n_rows` and
    * `sum_<c>` for each of `sumCols`. The bootstrap — and the truth a
    * maintained view must equal.
    */
  def build(table: DataFrame, groupCols: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "IncrementalView: at least one group column")
    val aggs = count(lit(1)).as("n_rows") +:
      sumCols.map(c => sum(col(c)).as(sumAlias(c)))
    table.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Advance `view` (a [[build]] result) by `feed` (a
    * [[graft.sources.SnapshotTable.changeFeed]] frame). Signed
    * contributions: `A`/`I`/`U`/`XA` rows +1, `UB`/`D`/`XB` rows −1
    * (a row a file-diff step carried unchanged appears on both sides
    * and cancels exactly); a group whose row count reaches zero
    * leaves the view. The result equals `build(<table at the feed's
    * toId>)` row for row.
    */
  def maintain(view: DataFrame, feed: DataFrame, groupCols: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "IncrementalView: at least one group column")
    val w = when(col("_op").isin("A", "I", "U", "XA"), lit(1L))
      .otherwise(lit(-1L))
    val deltaAggs = sum(w).as("n_rows") +:
      sumCols.map(c => sum(col(c) * w).as(sumAlias(c)))
    val delta = feed.groupBy(groupCols.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
    val foldAggs = sum(col("n_rows")).as("n_rows") +:
      sumCols.map(c => sum(col(sumAlias(c))).as(sumAlias(c)))
    view.unionByName(delta)
      .groupBy(groupCols.map(col): _*)
      .agg(foldAggs.head, foldAggs.tail: _*)
      .filter(col("n_rows") > 0L)
  }
}
