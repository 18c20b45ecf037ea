package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multi-table atomic publish ([[CommitGroup]]): all-or-nothing
  * visibility across N snapshot tables under crash recovery.
  */
class CommitGroupSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_grp").toString

  private def seed(root: String, n: Long): Unit = {
    SnapshotTable.commit(
      spark.range(0, n).select(col("id").as("k")), root)
    ()
  }

  test("happy path: stage N members, publish once — every head " +
      "advances, markers clear, stages consumed") {
    val b = tmp()
    val roots = Seq(s"$b/t1", s"$b/t2", s"$b/t3")
    roots.foreach(seed(_, 10))
    roots.zipWithIndex.foreach { case (r, i) =>
      CommitGroup.stage(
        spark.range(100, 110 + i).select(col("id").as("k")), r, "g1")
    }
    // staged = invisible everywhere
    roots.foreach(r =>
      assert(SnapshotTable.read(spark, r).count() == 10L))
    val out = CommitGroup.publish(spark, "g1", roots)
    assert(out.values.toSet == Set(2L))
    roots.zipWithIndex.foreach { case (r, i) =>
      assert(SnapshotTable.read(spark, r).count() == 20L + i)
    }
    val fs = new Path(b).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    roots.foreach { r =>
      // the `.published` record deliberately survives (readAll's pin
      // set); markers and stages must be consumed
      val leftovers = fs.listStatus(new Path(r, "_manifests"))
        .map(_.getPath.getName)
        .filter(n => (n.contains("grp-") && !n.endsWith(".published")) ||
          n.startsWith("wap-"))
      assert(leftovers.isEmpty, leftovers.mkString(","))
    }
  }

  test("group-id REUSE publishes the new stage instead of silently " +
      "discarding it as crash debris") {
    val b = tmp()
    val roots = Seq(s"$b/r1", s"$b/r2")
    roots.foreach(seed(_, 4))
    // pass 1: stage + publish under group id "gr"
    roots.foreach(r => CommitGroup.stage(
      spark.range(100, 103).select(col("id").as("k")), r, "gr"))
    val first = CommitGroup.publish(spark, "gr", roots)
    assert(first.values.toSet == Set(2L))
    // pass 2, SAME group id, no intervening commit: every head still
    // carries wap.id grp-gr — the old code deleted the fresh stage as
    // stale and reported success at the old snapshot
    roots.foreach(r => CommitGroup.stage(
      spark.range(200, 210).select(col("id").as("k")), r, "gr"))
    val second = CommitGroup.publish(spark, "gr", roots)
    assert(second.values.toSet == Set(3L),
      "the re-staged pass must fast-forward, not converge to the old head")
    roots.foreach { r =>
      assert(SnapshotTable.read(spark, r).count() == 4L + 3L + 10L, r)
      assert(SnapshotTable.currentSnapshot(spark, r) == 3L, r)
    }
  }

  test("crash mid-MARKER-loop: the commit is decided — dropGroup " +
      "refuses, recover from the membership converges all-new") {
    val b = tmp()
    val roots = Seq(s"$b/p", s"$b/q", s"$b/r")
    roots.foreach(seed(_, 5))
    roots.foreach(r => CommitGroup.stage(
      spark.range(50, 56).select(col("id").as("k")), r, "gm"))
    // crash after ONE marker write: marker on the first sorted member
    // only, zero publishes — the prefix state the ADVICE flagged
    intercept[IllegalStateException](CommitGroup.publishCrashable(
      spark, "gm", roots, crashAfter = Int.MaxValue, crashAfterMarkers = 1))
    roots.foreach(r =>
      assert(SnapshotTable.read(spark, r).count() == 5L, r))
    // the operator cannot abort a decided commit, whatever entry point
    val e = intercept[IllegalArgumentException](
      CommitGroup.dropGroup(spark, "gm", roots))
    assert(e.getMessage.contains("recover"), e.getMessage)
    // recover from the membership scan (the marker-bearing member may
    // be any prefix element) converges the WHOLE group forward
    val rec = CommitGroup.recover(spark, "gm", roots)
    assert(rec.keySet == roots.toSet)
    roots.foreach(r =>
      assert(SnapshotTable.read(spark, r).count() == 11L, r))
    // no marker anywhere: a later recover scan is a no-op
    assert(CommitGroup.recover(spark, "gm", roots).isEmpty)
  }

  test("readAll is group-consistent: all-old while a crashed pass " +
      "holds the marker, all-new after recovery, pinned against later " +
      "unrelated commits") {
    val b = tmp()
    val roots = Seq(s"$b/u", s"$b/v", s"$b/w")
    roots.foreach(seed(_, 7))
    roots.foreach(r => CommitGroup.stage(
      spark.range(0, 3).select(col("id").as("k")), r, "gc"))
    intercept[IllegalStateException](
      CommitGroup.publishCrashable(spark, "gc", roots, crashAfter = 1))
    // HEADS are torn (first member published) ...
    assert(SnapshotTable.read(spark, roots.sorted.head).count() == 10L)
    assert(SnapshotTable.read(spark, roots.sorted.last).count() == 7L)
    // ... but the pinned read is all-OLD: every member at its base
    val mid = CommitGroup.readAll(spark, "gc", roots)
    assert(mid.keySet == roots.toSet)
    mid.foreach { case (r, df) => assert(df.count() == 7L, r) }
    CommitGroup.recover(spark, "gc", roots)
    // now all-NEW ...
    CommitGroup.readAll(spark, "gc", roots)
      .foreach { case (r, df) => assert(df.count() == 10L, r) }
    // ... and pinned: an unrelated commit on one member moves its head
    // but not the group read
    SnapshotTable.commit(
      spark.range(900, 950).select(col("id").as("k")), roots.sorted.head)
    assert(SnapshotTable.read(spark, roots.sorted.head).count() == 60L)
    CommitGroup.readAll(spark, "gc", roots)
      .foreach { case (r, df) => assert(df.count() == 10L, r) }
    // the single-member entry point derives the membership from the
    // member's own record — no side-channel root list
    val one = CommitGroup.readAll(spark, "gc", roots.sorted.last)
    assert(one.keySet == roots.toSet)
    one.foreach { case (r, df) => assert(df.count() == 10L, r) }
    // an unknown group refuses rather than guessing heads
    intercept[IllegalArgumentException](
      CommitGroup.readAll(spark, "never-published", roots))
  }

  test("crash between member publishes: recover() rolls the group " +
      "FORWARD to all-visible from any member's marker") {
    val b = tmp()
    val roots = Seq(s"$b/a", s"$b/c", s"$b/e")
    roots.foreach(seed(_, 5))
    roots.foreach(r => CommitGroup.stage(
      spark.range(50, 60).select(col("id").as("k")), r, "g2"))
    intercept[IllegalStateException](
      CommitGroup.publishCrashable(spark, "g2", roots, crashAfter = 1))
    // torn state: first (sorted) member visible, the rest staged
    assert(SnapshotTable.read(spark, s"$b/a").count() == 15L)
    assert(SnapshotTable.read(spark, s"$b/c").count() == 5L)
    assert(SnapshotTable.read(spark, s"$b/e").count() == 5L)
    // recovery from a NOT-YET-PUBLISHED member's marker
    val recovered = CommitGroup.recover(spark, s"$b/c", "g2")
    assert(recovered.keySet == roots.toSet)
    roots.foreach(r =>
      assert(SnapshotTable.read(spark, r).count() == 15L, r))
    // idempotent: a second recover finds no marker
    assert(CommitGroup.recover(spark, s"$b/c", "g2").isEmpty)
  }

  test("dropGroup discards every stage — no table ever saw the group") {
    val b = tmp()
    val roots = Seq(s"$b/x", s"$b/y")
    roots.foreach(seed(_, 5))
    roots.foreach(r => CommitGroup.stage(
      spark.range(0, 100).select(col("id").as("k")), r, "g3"))
    assert(CommitGroup.dropGroup(spark, "g3", roots) > 0)
    roots.foreach { r =>
      assert(SnapshotTable.read(spark, r).count() == 5L)
      assert(SnapshotTable.currentSnapshot(spark, r) == 1L)
    }
  }

  test("readAll pins the EMPTY seed when the group is the members' " +
      "first real commit; dropGroup of a re-staged pass keeps the " +
      "completed pass's record") {
    import spark.implicits._
    val b = tmp()
    val roots = Seq(s"$b/e1", s"$b/e2")
    // empty SEEDS (schema only, zero files) — the fmt gate's shape
    roots.foreach(r => SnapshotTable.commit(
      spark.range(0, 5).select(col("id").as("k")).limit(0), r))
    roots.foreach(r => CommitGroup.stage(
      spark.range(0, 4).select(col("id").as("k")), r, "ge"))
    intercept[IllegalStateException](
      CommitGroup.publishCrashable(spark, "ge", roots, crashAfter = 1))
    // all-old = the EMPTY seeds: must read as 0 rows, not throw
    val mid = CommitGroup.readAll(spark, "ge", roots)
    assert(mid.keySet == roots.toSet)
    mid.foreach { case (r, df) =>
      assert(df.count() == 0L, r)
      assert(df.columns.toSeq == Seq("k"), r)
    }
    CommitGroup.recover(spark, "ge", roots)
    CommitGroup.readAll(spark, "ge", roots)
      .foreach { case (r, df) => assert(df.count() == 4L, r) }
    // a re-staged pass under the SAME id that gets dropped must not
    // destroy the completed pass's pin set
    roots.foreach(r => CommitGroup.stage(
      spark.range(100, 103).select(col("id").as("k")), r, "ge"))
    assert(CommitGroup.dropGroup(spark, "ge", roots) > 0)
    CommitGroup.readAll(spark, "ge", roots)
      .foreach { case (r, df) => assert(df.count() == 4L, r) }
  }

  test("a pre-existing marker refuses a new publish LOUDLY (the " +
      "exclusive create is a real claim, not a local-FS clobber)") {
    import spark.implicits._
    val b = tmp()
    val roots = Seq(s"$b/m1", s"$b/m2")
    roots.foreach(seed(_, 3))
    roots.foreach(r => CommitGroup.stage(
      spark.range(0, 2).select(col("id").as("k")), r, "gx"))
    // plant a leaked marker on the SECOND sorted member: the publish
    // must refuse when it reaches it (and the first member's marker is
    // then recoverable debris, not a silent overwrite)
    val planted = new Path(s"${roots.sorted.last}/_manifests/grp-gx.group")
    val fs = planted.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(planted, false)
    try out.write(s"${roots.sorted.last}\tgrp-gx\t1".getBytes("UTF-8"))
    finally out.close()
    val e = intercept[IllegalStateException](
      CommitGroup.publish(spark, "gx", roots))
    assert(e.getMessage.contains("already exists"), e.getMessage)
    // no member became visible
    roots.foreach(r =>
      assert(SnapshotTable.read(spark, r).count() == 3L, r))
  }

  test("pure-SQL surface: stage members via graft.wap.id INSERTs, " +
      "publish atomically via CALL publish_group") {
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.grpcat",
      classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.grpcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grpcat.db")
    Seq("p1", "p2").foreach { t =>
      spark.sql(s"CREATE TABLE grpcat.db.$t (k BIGINT)")
      spark.sql(s"INSERT INTO grpcat.db.$t VALUES (1), (2)")
    }
    spark.conf.set("graft.wap.id", "grp-gq")
    try {
      spark.sql("INSERT INTO grpcat.db.p1 VALUES (10), (11)")
      spark.sql("INSERT INTO grpcat.db.p2 VALUES (20)")
    } finally spark.conf.unset("graft.wap.id")
    // staged: both still read their pre-group state
    Seq("p1", "p2").foreach(t => assert(
      spark.sql(s"SELECT count(*) FROM grpcat.db.$t").head.getLong(0) == 2L))
    val n = spark.sql(
      "CALL grpcat.system.publish_group('db.p1,db.p2', 'gq')")
      .head.getInt(0)
    assert(n == 2)
    assert(spark.sql("SELECT count(*) FROM grpcat.db.p1")
      .head.getLong(0) == 4L)
    assert(spark.sql("SELECT count(*) FROM grpcat.db.p2")
      .head.getLong(0) == 3L)
  }

  test("a NON-ADDITIVE interleaved commit on any member refuses the " +
      "WHOLE publish before any member becomes visible") {
    val b = tmp()
    val roots = Seq(s"$b/m", s"$b/n")
    roots.foreach(seed(_, 5))
    roots.foreach(r => CommitGroup.stage(
      spark.range(0, 3).select(col("id").as("k")), r, "g4"))
    // someone OVERWRITES the second member while the group is staged —
    // the audit's subject no longer exists, nothing can rebase
    SnapshotTable.commit(
      spark.range(900, 905).select(col("id").as("k")), s"$b/n",
      overwrite = true)
    val e = intercept[IllegalArgumentException](
      CommitGroup.publish(spark, "g4", roots))
    assert(e.getMessage.contains("cannot rebase"), e.getMessage)
    // nothing published — the first member's head did not move either
    assert(SnapshotTable.currentSnapshot(spark, s"$b/m") == 1L)
  }

  test("a purely-ADDITIVE interleaved append on a member REBASES " +
      "through the group publish: both deltas land on that member, " +
      "the group stays all-or-nothing") {
    val b = tmp()
    val roots = Seq(s"$b/p", s"$b/q")
    roots.foreach(seed(_, 5))
    roots.foreach(r => CommitGroup.stage(
      spark.range(100, 103).select(col("id").as("k")), r, "g5"))
    // a plain append lands on q between stage and publish — the
    // routine interleave at streaming-ingest cadence
    SnapshotTable.commit(
      spark.range(900, 910).select(col("id").as("k")), s"$b/q")
    val out = CommitGroup.publish(spark, "g5", roots)
    assert(out(s"$b/p") == 2L)
    assert(out(s"$b/q") == 3L) // rebased past the interleaved v2
    assert(SnapshotTable.read(spark, s"$b/p").count() == 8L)
    // q holds seed + interleaved append + the group's delta
    assert(SnapshotTable.read(spark, s"$b/q").count() == 18L)
    // group-consistent read serves the RECORDED pins (all-new)
    val all = CommitGroup.readAll(spark, "g5", roots)
    assert(all(s"$b/p").count() == 8L)
    assert(all(s"$b/q").count() == 18L)
    // markers cleared, stages consumed — a clean completed pass
    assert(CommitGroup.recover(spark, "g5", roots).isEmpty)
  }
}
