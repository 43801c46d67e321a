package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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
  * replicate the small (build) side once per salt.
  *
  * The salt is DETERMINISTIC per row content — never
  * `monotonically_increasing_id()`/`rand()`: a nondeterministic expression
  * inside a shuffle key means a fetch-failure retry recomputes different
  * salts and routes rows to different reducers than the lost map output —
  * the SPARK-38388 class of silent row duplication/loss, and fetch
  * failures are routine on large clusters. Hashing the full row keeps the
  * routing stable across retries; rows that are bytewise identical land in
  * the same salt bucket (interchangeable rows — correctness unaffected;
  * pass `saltOn` with a stable unique column to spread even those).
  */
object SkewJoin {

  /** Inner equi-join equal to `probe.join(build, keys)`, with the hot keys
    * of `probe` spread over `salts` reducers. `build` is replicated
    * `salts`× through the shuffle (size its replication accordingly:
    * salts × |build| rows move). `saltOn` defaults to all probe columns —
    * deterministic across task retries (see class doc). */
  def saltedJoin(
      probe: DataFrame, build: DataFrame, keys: Seq[String],
      salts: Int, saltOn: Option[Column] = None): DataFrame = {
    require(salts > 1, s"salts must be > 1, got $salts")
    // default salt: every HASHABLE probe column — xxhash64 rejects
    // MapType (at any nesting); such columns are skipped rather than
    // failing analysis. Join keys are always hashable (maps can't be
    // join keys), so the source is never empty.
    val saltSource = saltOn.getOrElse {
      def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
        case _: org.apache.spark.sql.types.MapType => false
        case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
        case s: org.apache.spark.sql.types.StructType =>
          s.fields.forall(f => hashable(f.dataType))
        case _ => true
      }
      xxhash64(probe.schema.fields.collect {
        case f if hashable(f.dataType) => col(f.name)
      }.toIndexedSeq: _*)
    }
    val scattered = probe.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(salts.toLong)).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    scattered.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
