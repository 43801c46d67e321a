package graft.pipeline

import org.apache.spark.sql.DataFrame

import scala.jdk.CollectionConverters._

/** Cache-lifecycle helpers: several pipeline stats persist a shared
  * intermediate (one corpus pass, two+ consumers) whose cache would
  * otherwise outlive the call — in a long-lived session running many
  * entries those add up (r7 advisory). Where the RESULT is small by
  * construction (groups², checkpoints, one row), the fix is to finish the
  * computation eagerly and release the intermediate before returning.
  */
object Caches {

  /** Materialize a SMALL result eagerly and release the given persisted
    * intermediates: collect the result (its jobs run while the caches are
    * still live), unpersist every intermediate, and return the rows as a
    * local relation with the exact original schema (types, nullability —
    * the driver's hasher is representation-sensitive). Only for results
    * bounded by construction — never corpus- or candidate-sized. */
  def localized(result: DataFrame, intermediates: DataFrame*): DataFrame = {
    val spark = result.sparkSession
    val rows = result.collect()
    intermediates.foreach(_.unpersist())
    spark.createDataFrame(rows.toSeq.asJava, result.schema)
  }
}
