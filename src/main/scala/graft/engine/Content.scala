package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Content-table model.
  *
  * Mirrors the reference's `content` storage row (scheme.cql:1-11): a
  * document URI partitions a collection; items cluster by `item_id`;
  * `revision` is per-document monotonic; deletes are tombstones. Bodies are
  * JSON text parsed lazily (Db.scala:34-38) — here a JSON string column.
  *
  * At scale the physical layout is an append-only log (every write is a new
  * row at revision N); the queryable current state is the latest-revision
  * view. Partition-by `document_uri` means per-collection locality exactly
  * like the reference's Cassandra partition key.
  */
object Content {
  val schema: StructType = StructType(Seq(
    StructField("document_uri", StringType, nullable = false),
    StructField("item_id", StringType, nullable = false),
    StructField("revision", LongType, nullable = false),
    StructField("body", StringType),
    StructField("is_deleted", BooleanType, nullable = false),
    StructField("created_at", TimestampType),
    StructField("modified_at", TimestampType)
  ))

  /** Latest visible state from an append log: one row per (uri, item),
    * highest revision wins, tombstones filtered. */
  def latestView(log: DataFrame): DataFrame = {
    val w = Window.partitionBy("document_uri", "item_id").orderBy(col("revision").desc)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .filter(!col("is_deleted"))
  }

  /** Empty content log. */
  def empty(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Adapt an arbitrary table into collection form: every row becomes an
    * item of `collectionUri` with the given id column; remaining columns
    * are serialized into the JSON body (id injected, reference
    * PrimaryWorker.scala:378-380). */
  def fromTable(df: DataFrame, collectionUri: String, idCol: String): DataFrame = {
    val bodyCols = df.columns.filterNot(_ == idCol)
    df.select(
      lit(collectionUri).as("document_uri"),
      col(idCol).cast(StringType).as("item_id"),
      lit(1L).as("revision"),
      to_json(struct(col(idCol).cast(StringType).as("id") +: bodyCols.map(col): _*))
        .as("body"),
      lit(false).as("is_deleted"),
      lit(null).cast(TimestampType).as("created_at"),
      lit(null).cast(TimestampType).as("modified_at")
    )
  }
}
