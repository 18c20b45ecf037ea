package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** MULTI-TABLE atomic publish — the WAP generalization the snapshot
  * layer was missing: a curation pipeline writing N output tables (the
  * corpus, its quality scorecard, its shard schedule) has no business
  * letting a consumer see table 1's new version next to table 2's old
  * one. A COMMIT GROUP stages one WAP snapshot per member table under
  * a shared group id, then publishes every head in one fast-forward
  * pass fenced by a persisted GROUP MARKER for crash recovery:
  *
  *   1. [[stage]] each member (an ordinary [[SnapshotTable.commitWap]]
  *      under wap id `grp-<group>` — expensive writes happen here, off
  *      the serving path, auditable via [[SnapshotTable.readWap]]);
  *   2. [[publish]] validates EVERY stage against its base first
  *      (all-or-nothing starts by refusing a doomed pass outright),
  *      writes the marker — membership lines `<root>TAB<wapId>` — into
  *      every member's `_manifests/` (so recovery from ANY member sees
  *      the full group), then fast-forwards each member
  *      ([[SnapshotTable.publishWap]], O(metadata) each), then removes
  *      the markers;
  *   3. a crash anywhere in step 2 leaves the marker: [[recover]]
  *      rolls the group FORWARD (presumed commit — the marker exists
  *      only after every stage validated), republishing still-staged
  *      members and skipping already-published ones, converging to
  *      all-visible; a crash BEFORE the marker leaves plain WAP stages
  *      that [[dropGroup]] discards — all-invisible. All-or-nothing
  *      either way.
  *
  * Boundary (stated, not hidden): atomicity holds against CRASHES, not
  * against a concurrent interleaved commit on a member table between
  * marker and publish — that member's fast-forward then refuses loudly
  * ([[SnapshotTable.publishWap]]'s divergence error) exactly like
  * single-table WAP, and recovery surfaces the conflict instead of
  * silently dropping anything. Same single-writer-per-table contract
  * as every commit shape; Iceberg has no multi-table transactions at
  * all, Delta's are engine-level. Readers between two member publishes
  * of a HEALTHY pass can observe the intermediate state for the
  * milliseconds the loop runs — the marker bounds how long a crash can
  * stretch that window, and recovery closes it.
  */
object CommitGroup {

  private def markerPath(root: String, group: String): Path =
    new Path(new Path(root, "_manifests"), s"grp-${enc(group)}.group")

  private def enc(v: String): String =
    java.net.URLEncoder.encode(v, "UTF-8")

  private def wapIdOf(group: String): String = s"grp-$group"

  private def fsOf(s: SparkSession, p: Path): FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Stage `df` as `root`'s member of commit group `group` — a normal
    * WAP stage under the group's wap id: invisible to every reader
    * until the GROUP publishes. Returns the base snapshot staged
    * against.
    */
  def stage(df: DataFrame, root: String, group: String,
      statsCol: Option[String] = None,
      props: Map[String, String] = Map.empty): Long =
    SnapshotTable.commitWap(df, root, wapIdOf(group), statsCol, props)

  /** Publish every member's staged snapshot, all-or-nothing under
    * crash recovery. `roots` is the full membership (order-insensitive
    * — publishes run in sorted order for determinism). Returns the new
    * snapshot id per root.
    */
  def publish(s: SparkSession, group: String,
      roots: Seq[String]): Map[String, Long] =
    publishCrashable(s, group, roots, crashAfter = Int.MaxValue)

  /** [[publish]] with a fault-injection point for the recovery spec:
    * throws after `crashAfter` member publishes, markers in place —
    * exactly the crash window [[recover]] exists for.
    */
  private[sources] def publishCrashable(s: SparkSession, group: String,
      roots: Seq[String], crashAfter: Int): Map[String, Long] = {
    require(roots.nonEmpty, "commit group with no members")
    require(roots.distinct.size == roots.size,
      s"commit group '$group': duplicate member roots")
    val ordered = roots.sorted
    // validate EVERY stage before touching anything: each must exist
    // and still sit on its table's current head — a doomed pass
    // refuses here, before any member becomes visible
    ordered.foreach { root =>
      val base = SnapshotTable.wapBase(s, root, wapIdOf(group))
      val cur = SnapshotTable.currentSnapshot(s, root)
      require(cur == base,
        s"commit group '$group': member $root advanced to v$cur past " +
          s"its stage's base v$base — drop the group and re-stage " +
          "against the new heads")
    }
    // the marker IS the commit decision: written to every member (so
    // recovery from any one sees the whole group) before the first
    // publish; a crash before the last marker write leaves only
    // plain stages (all-invisible, dropGroup's debris)
    val body = ordered.map(r => s"$r\t${wapIdOf(group)}")
      .mkString("\n").getBytes(StandardCharsets.UTF_8)
    ordered.foreach { root =>
      val p = markerPath(root, group)
      val fs = fsOf(s, p)
      val out = fs.create(p, false) // a taken marker = the group id is
      // mid-publish or leaked — refuse rather than join it
      try out.write(body) finally out.close()
    }
    val published = ordered.zipWithIndex.map { case (root, i) =>
      if (i >= crashAfter)
        throw new IllegalStateException(
          s"commit group '$group': injected crash after $crashAfter " +
            "member publish(es) — recover() rolls the group forward")
      root -> publishMember(s, root, group)
    }.toMap
    ordered.foreach(root =>
      fsOf(s, markerPath(root, group)).delete(markerPath(root, group), false))
    published
  }

  /** Publish one member idempotently: still-staged → fast-forward;
    * already published under this group's wap id (a crash between a
    * member's manifest rename and its wap-file cleanup, or a resumed
    * recovery) → converge silently.
    */
  private def publishMember(s: SparkSession, root: String,
      group: String): Long = {
    val wapId = wapIdOf(group)
    val cur = SnapshotTable.currentSnapshot(s, root)
    val headWap = SnapshotTable.snapshotProps(s, root, cur).get("wap.id")
    if (headWap.contains(wapId)) {
      // this member already published (crash after its rename): drop
      // the leftover stage manifest if the cleanup half also crashed
      val stale = new Path(new Path(root, "_manifests"),
        s"wap-${enc(wapId)}.manifest")
      fsOf(s, stale).delete(stale, false)
      cur
    } else SnapshotTable.publishWap(s, root, wapId)
  }

  /** Roll an interrupted group FORWARD from any member's marker:
    * republish every member the crash left staged (presumed commit —
    * the marker exists only after full validation), converge the ones
    * already published, then clear the markers. Returns the recovered
    * membership (empty = no marker, nothing to do).
    */
  def recover(s: SparkSession, anyMemberRoot: String,
      group: String): Map[String, Long] = {
    val p = markerPath(anyMemberRoot, group)
    val fs = fsOf(s, p)
    if (!fs.exists(p)) return Map.empty
    val in = fs.open(p)
    val members =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty)
        .map(_.split("\t")(0)).toList
      finally in.close()
    val published = members.sorted.map { root =>
      root -> publishMember(s, root, group)
    }.toMap
    members.foreach(root =>
      fsOf(s, markerPath(root, group)).delete(markerPath(root, group), false))
    published
  }

  /** The failed-audit exit: drop every member's stage (their added
    * files included) and any markers; no table ever saw the group.
    * Returns deleted staged-file count.
    */
  def dropGroup(s: SparkSession, group: String, roots: Seq[String]): Int =
    roots.sorted.map { root =>
      fsOf(s, markerPath(root, group)).delete(markerPath(root, group), false)
      try SnapshotTable.dropWap(s, root, wapIdOf(group))
      catch { case _: IllegalArgumentException => 0 } // never staged
    }.sum
}
