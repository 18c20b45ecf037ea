package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (100 TB playbook, SURVEY.md §2.5
  * scale notes): a hot key that would pin one reducer is spread over
  * `salts` sub-partitions; the build side is replicated `salts` times.
  * AQE's skew-join handles moderate skew adaptively — explicit salting is
  * for the pathological hot-key case (one key >> one executor's memory)
  * where runtime splitting of a single map output isn't enough.
  *
  * The salt is derived from a hash of the whole probe-side row, so the
  * result is deterministic (no `rand()` in the plan — reruns and
  * speculative tasks agree).
  */
object SkewJoin {

  def saltedInnerJoin(
      probe: DataFrame, build: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val saltedProbe = probe.withColumn(
      "__salt",
      pmod(xxhash64(struct(probe.columns.map(col): _*)), lit(salts.toLong)))
    val replicatedBuild = build.withColumn(
      "__salt", explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    saltedProbe
      .join(replicatedBuild, Seq(key, "__salt"))
      .drop("__salt")
  }
}
