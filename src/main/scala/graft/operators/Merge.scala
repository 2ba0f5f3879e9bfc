package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed MERGE — the write-side twin of [[SnapshotDiff]]: apply a change
  * set (inserts / updates / deletes) to a base snapshot and produce the
  * next snapshot. Together they close the incremental-maintenance loop
  * the reference lacks (it rebuilds every table per run,
  * `/root/reference/Time_Series_Functions.py`): diff what changed,
  * reprocess only that, MERGE the result back.
  *
  * Scale shape: the base table — the 100-TB side — is touched by exactly
  * ONE left-anti hash join against the (small) change-key set, and the
  * union that follows is a no-shuffle concatenation. The change set is
  * broadcast when it fits; nothing ever shuffles the base on a non-key.
  * This is the same plan a Delta/Iceberg MERGE compiles to once file
  * pruning is done, minus the transaction log — which is [[SnapshotDiff]]
  * + a compaction pass in this engine.
  */
object Merge {

  /** SCD1 upsert: rows in `updates` replace base rows with the same key;
    * unmatched update rows are inserted; all other base rows survive.
    * `updates` must be unique per key (keyed-table contract; a dup key
    * would emit two versions of the row).
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String],
             broadcastChanges: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val touched = hint(updates.select(keys.map(col): _*), broadcastChanges)
    val survivors = base.join(touched, keys, "left_anti")
    survivors.unionByName(updates.select(base.columns.map(col): _*))
  }

  /** CDC apply: `changes` carries `opCol` ∈ {I, U, D}. Deletes drop the
    * key from the base; inserts and updates both upsert (an I on an
    * existing key behaves as U — the tolerant semantics every CDC
    * consumer ends up wanting when replays happen). One key must appear
    * at most once in `changes` — feed compacted change sets, not raw
    * logs (compact with a last-wins window upstream if needed).
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keys: Seq[String],
                   opCol: String = "op",
                   broadcastChanges: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "applyChanges needs at least one key column")
    // Fail fast on a malformed feed instead of corrupting the snapshot
    // silently: without this, a NULL op acts as a delete (its key is
    // anti-joined out, then `=!= "D"` drops the row via three-valued
    // logic) and any unexpected op string (a lowercase 'd') upserts.
    // The guard is a per-row expression in the existing pass — no extra
    // scan, no extra action.
    val vetted = changes.withColumn(opCol,
      when(col(opCol).isin("I", "U", "D"), col(opCol)).otherwise(
        raise_error(concat(lit("applyChanges: invalid op '"),
          coalesce(col(opCol).cast("string"), lit("NULL")),
          lit("' — expected I, U, or D")))))
    val touched = hint(vetted.select(keys.map(col): _*), broadcastChanges)
    val survivors = base.join(touched, keys, "left_anti")
    val upserts = vetted.filter(col(opCol) =!= "D")
      .select(base.columns.map(col): _*)
    survivors.unionByName(upserts)
  }

  /** Reconstruct the new snapshot from the old one plus a
    * [[SnapshotDiff.rowStatus]]-shaped delta joined back to payloads —
    * the round-trip proof that diff and merge are inverses:
    * `applyDiff(old, diff, new-payloads) == new`. `statuses` must carry
    * the key columns + `status`; `payload` the full-width rows for every
    * added/changed key. */
  def applyDiff(base: DataFrame, statuses: DataFrame, payload: DataFrame,
                keys: Seq[String]): DataFrame = {
    val changes = statuses.filter(col("status").isin("added", "changed", "removed"))
      .select(keys.map(col) :+
        when(col("status") === "removed", "D").otherwise("U").as("op"): _*)
      .join(payload, keys, "left")
    applyChanges(base, changes, keys)
  }

  /** The change-key side is broadcast by CALLER CHOICE (default true —
    * the normal CDC regime is a change set ≪ base). A forced broadcast
    * of a giant change set would OOM the executors, so bulk backfills
    * pass `broadcastChanges = false` and take the shuffled anti join;
    * AQE then picks the strategy from runtime sizes. */
  private def hint(df: DataFrame, bc: Boolean): DataFrame =
    if (bc) broadcast(df) else df
}
