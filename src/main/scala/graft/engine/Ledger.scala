package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Transaction ledger — the reference's write-ahead `transaction` table
  * (scheme.cql:13-24): every applied write gets a ledger row keyed by
  * (time quantum, partition), completed asynchronously after the change
  * event publishes (BackgroundContentTaskCompleter.scala:83-96), scanned by
  * quantum+partition during recovery (RecoveryWorker.scala:204-356), with a
  * per-partition checkpoint low-water mark (scheme.cql:26-29).
  *
  * Spark shape: an append-only DataFrame. Transaction ids are
  * DETERMINISTIC (`uri/item#revision`) rather than timeuuids so that batch
  * retries are idempotent — replaying a batch yields the same ledger rows
  * (SURVEY §7.4 risk 1). */
object Ledger {
  /** CRC32(uri) % 1024 — reference TransactionLogic.scala:11, 26-30. */
  val MaxPartitions = 1024

  /** 1-minute time quanta — reference TransactionLogic.scala:32-38. */
  def quantum(tsMillis: Column): Column = floor(tsMillis / 60000L).cast("long")

  def partitionOf(uri: Column): Column =
    (crc32(uri) % MaxPartitions).cast("int")

  /** Ledger rows for a batch of feed events, stamped with the batch's
    * event-time millis (passed in — never wall-clock, for determinism). */
  def fromFeed(feed: DataFrame, batchTsMillis: Long): DataFrame =
    feed.select(
      quantum(lit(batchTsMillis)).as("dt_quantum"),
      partitionOf(col("document_uri")).as("partition"),
      col("document_uri"),
      concat(col("document_uri"), lit("/"), col("item_id"),
        lit("#"), col("revision")).as("txn_id"),
      col("item_id"), col("revision"), col("method"), col("body"),
      lit(false).as("completed"))

  /** S5: recovery scan of one (quantum, partition) cell — prunes to one
    * partition of the ledger exactly like the reference's
    * selectPartitionTransactions (Db.scala:205-208). */
  def scanCell(ledger: DataFrame, dtQuantum: Long, partition: Int): DataFrame =
    ledger.filter(col("dt_quantum") === dtQuantum && col("partition") === partition)

  def incomplete(ledger: DataFrame): DataFrame = ledger.filter(!col("completed"))

  /** S8: mark the given txn_ids completed (idempotent — completing a
    * completed txn is a no-op, the at-least-once contract ST2). No
    * broadcast hint: a recovery window can carry millions of txn_ids, so
    * the join strategy is left to AQE, which broadcasts small sides at
    * runtime and shuffles big ones. */
  def complete(ledger: DataFrame, txnIds: DataFrame): DataFrame = {
    val done = txnIds.select(col("txn_id")).distinct()
      .withColumn("__done", lit(true))
    ledger.join(done, Seq("txn_id"), "left_outer")
      .withColumn("completed", col("completed") || coalesce(col("__done"), lit(false)))
      .drop("__done")
  }

  /** Fold an APPEND-ONLY ledger log (intent rows + completion markers with
    * identical identity columns) into current per-transaction state. */
  def current(ledgerLog: DataFrame): DataFrame = {
    val keys = ledgerLog.columns.filterNot(_ == "completed")
    ledgerLog.groupBy(keys.map(col): _*)
      .agg(max(col("completed")).as("completed"))
      .select(ledgerLog.columns.map(col): _*)
  }

  /** The reference's `transaction_list` static column (scheme.cql:5,
    * PrimaryWorker.scala:254,263): the pending (uncompleted) transactions
    * of each document, visible to readers until the background completer
    * clears them. Here the ledger is the source of truth, so the list is
    * a per-document aggregation of incomplete rows, ordered by revision. */
  def transactionList(ledger: DataFrame): DataFrame =
    incomplete(ledger)
      .groupBy("document_uri")
      .agg(array_sort(collect_list(struct(col("revision"), col("txn_id"))))
        .as("__txns"))
      .select(col("document_uri"),
        // GetArrayStructFields (codegen'd) — not a transform() lambda,
        // which would evaluate interpreted (CodegenFallback)
        col("__txns").getField("txn_id").as("transaction_list"))

  /** S10 checkpoint: per-partition low-water mark = the quantum below
    * which everything is complete (min incomplete quantum − 1, or the max
    * seen quantum when the partition is fully complete). */
  def checkpoints(ledger: DataFrame): DataFrame =
    ledger.groupBy("partition").agg(
      coalesce(
        min(when(!col("completed"), col("dt_quantum"))) - 1,
        max(col("dt_quantum"))).as("checkpoint_quantum"))

  /** ST3/ST4 recovery work list: incomplete transactions in
    * [fromQuantum, toQuantum], grouped per document in revision order —
    * what a recovery pass must re-drive (RecoveryWorker.scala:204-266). */
  def recoveryWorkList(ledger: DataFrame, fromQuantum: Long, toQuantum: Long): DataFrame =
    incomplete(ledger)
      .filter(col("dt_quantum").between(fromQuantum, toQuantum))
      .orderBy(col("document_uri"), col("revision"))
}
