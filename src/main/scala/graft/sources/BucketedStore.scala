package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Hash-bucketed table layout for co-located joins — the shuffle-elimination
  * tool for 100 TB fact-to-fact joins.
  *
  * `bucketBy(n, key)` persists each file pre-hashed on the join key; two
  * tables bucketed on the same key with the same bucket count join WITHOUT
  * either side shuffling (the planner proves both children already satisfy
  * `HashClusteredDistribution(key)`), and `groupBy(key)` over one bucketed
  * table skips its exchange too. At 100 TB that converts the dominant cost
  * of every repeated join/agg on a stable key (content log ⋈ ledger,
  * lineitem ⋈ orders, embeddings ⋈ shard assignments) from a full network
  * shuffle into local file reads — pay one bucketed write, reuse it for
  * every downstream join on that key.
  *
  * Spark persists bucketing metadata only through the catalog
  * (`saveAsTable`), not plain parquet paths, so this wraps managed tables:
  * the co-location contract must survive restarts, which is exactly what
  * the metastore is for. `sortBy` within buckets additionally enables
  * sort-merge joins with no sort step.
  */
object BucketedStore {

  /** Write `df` as a managed bucketed table (overwrites). One shuffle now
    * (`repartition` aligns task count to bucket count so each bucket is
    * one file per writer wave, not `tasks × buckets` small files) buys
    * shuffle-free joins/aggs on `key` forever after. */
  def write(df: DataFrame, table: String, key: String, buckets: Int,
      sorted: Boolean = true): Unit = {
    val aligned = df.repartition(buckets, df(key))
    val w = aligned.write.mode(SaveMode.Overwrite)
      .format("parquet").bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Join two same-key bucketed tables — planner-verified co-located (the
    * caller can assert no Exchange in `.queryExecution.executedPlan`). */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    read(spark, leftTable).join(read(spark, rightTable), key)
}
