package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A shuffled join sends every row of one key to one reducer; at 100 TB a
  * heavy-hitter key (the empty document, a bot user_id, a default label)
  * becomes a straggler task holding the whole stage. AQE's skew-join split
  * handles the sort-merge case automatically — use THIS when AQE can't:
  * a skewed build side of a shuffled hash join, or a join immediately
  * followed by a same-key aggregation that re-concentrates the key.
  *
  * Mechanics: scatter the big (probe) side across `salts` sub-keys and
  * replicate the small (build) side once per salt. Row-level output is
  * identical to `probe.join(build, keys)` no matter how rows scatter, so
  * the salt can be any cheap expression — including a nondeterministic one:
  * a task retry that re-scatters differently still joins each probe row to
  * the same replicated build rows.
  */
object SkewJoin {

  /** Inner equi-join equal to `probe.join(build, keys)`, with the hot keys
    * of `probe` spread over `salts` reducers. `build` is replicated
    * `salts`× through the shuffle (size its replication accordingly:
    * salts × |build| rows move). */
  def saltedJoin(
      probe: DataFrame, build: DataFrame, keys: Seq[String],
      salts: Int): DataFrame = {
    require(salts > 1, s"salts must be > 1, got $salts")
    val scattered = probe.withColumn("__salt",
      pmod(xxhash64(keys.map(col) :+ monotonically_increasing_id(): _*),
        lit(salts.toLong)).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    scattered.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
