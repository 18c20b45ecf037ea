package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming CDC materialization — the continuous twin of
  * [[graft.ops.Warehouse.cdcApply]]: a changelog of versioned
  * insert/update/delete records is folded into the current snapshot by
  * per-key state, so the memory sink holds exactly what a `MERGE INTO`
  * of the drained batch would produce (checked against the SAME DuckDB
  * oracle).
  *
  * The state fold is ARRIVAL-ORDER independent: each key's state stores
  * the ops seen so far and every emission re-folds them in version
  * order, so a late insert arriving after its own update (possible
  * across micro-batches on a real feed) converges to the same row. Per
  * key the op count is bounded by the changelog depth between
  * compactions (here ≤ 2), so state is O(keys in flight) — the same
  * bound a production streaming upsert sink (e.g. a lakehouse MERGE
  * stream) carries.
  */
object ChangelogStream {

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  private def ordersStream(s: SparkSession, dir: String): DataFrame =
    EventStreams.tableStream(s, dir, "orders", ordersSchema)

  final case class ChOp(key: Long, version: Int, op: String, status: String,
    price: Double, priority: String, odate: java.sql.Timestamp)
  final case class ChState(ops: Seq[ChOp])
  final case class ChOut(o_orderkey: Long, n_ops: Int, deleted: Boolean,
    status: String, price: Double, priority: String,
    odate: java.sql.Timestamp)

  /** Fold ops in version order into the current row. */
  private def fold(key: Long, ops: Seq[ChOp]): ChOut = {
    var out = ChOut(key, ops.size, deleted = false, null, 0.0, null, null)
    ops.sortBy(_.version).foreach { o =>
      o.op match {
        case "I" =>
          out = out.copy(deleted = false, status = o.status, price = o.price,
            priority = o.priority, odate = o.odate)
        case "U" =>
          out = out.copy(deleted = false, price = o.price)
        case "D" =>
          out = out.copy(deleted = true)
      }
    }
    out
  }

  private[graft] def materialize(log: DataFrame): DataFrame = {
    val s = log.sparkSession
    import s.implicits._
    val fn: (Long, Iterator[ChOp], GroupState[ChState]) => ChOut =
      (key, ops, state) => {
        val all = state.getOption.map(_.ops).getOrElse(Seq.empty) ++ ops
        state.update(ChState(all))
        fold(key, all)
      }
    log.as[ChOp]
      .groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
      .toDF()
  }

  /** Update mode re-emits a key whenever more of its ops arrive; the
    * fold with the most ops seen is the converged row. Keep it, drop
    * deletes, and project the batch MERGE's exact schema.
    */
  private[graft] def finalizeSnapshot(sink: DataFrame): DataFrame =
    sink
      .groupBy("o_orderkey")
      .agg(max(struct(col("n_ops"), col("deleted"), col("status"),
        col("price"), col("priority"), col("odate"))).as("last"))
      .filter(!col("last.deleted"))
      .select(col("o_orderkey"),
        col("last.status").as("o_orderstatus"),
        round(col("last.price"), 2).as("o_totalprice"),
        col("last.priority").as("o_orderpriority"),
        date_format(col("last.odate"), "yyyy-MM-dd HH:mm:ss")
          .as("o_orderdate"))

  /** The changelog both engines derive from key residues — version-0
    * inserts (the snapshot itself) plus the version-1 update/delete
    * batch of [[graft.ops.Warehouse]]: keys ≡ 0..2 (mod 10) get a price
    * bump, keys ≡ 3 (mod 10) a delete.
    */
  private[graft] def changelog(o: DataFrame): DataFrame = {
    val ins = o.select(col("o_orderkey").as("key"),
      lit(0).as("version"), lit("I").as("op"),
      col("o_orderstatus").as("status"),
      col("o_totalprice").as("price"),
      col("o_orderpriority").as("priority"),
      col("o_orderdate").as("odate"))
    val ch = o.filter(col("o_orderkey") % 10 <= lit(3))
      .select(col("o_orderkey").as("key"),
        lit(1).as("version"),
        when(col("o_orderkey") % 10 === lit(3), lit("D"))
          .otherwise(lit("U")).as("op"),
        col("o_orderstatus").as("status"),
        (col("o_totalprice") + lit(100.0)).as("price"),
        col("o_orderpriority").as("priority"),
        col("o_orderdate").as("odate"))
    ins.unionByName(ch)
  }

  def cdcApplyStream(s: SparkSession, dir: String): DataFrame = {
    val out = finalizeSnapshot(
      EventStreams.runToMemorySink(s,
        materialize(changelog(ordersStream(s, dir))),
        OutputMode.Update))
    out.localCheckpoint(eager = true)
  }
}
