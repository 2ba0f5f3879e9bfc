package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed diff between two snapshots of the same logical table — the
  * table-maintenance primitive behind incremental re-curation: "which
  * documents were added / removed / changed since the last crawl?".
  *
  * The reference recomputes its whole world every run
  * (`/root/reference/Time_Series_Functions.py` rebuilds every table from
  * scratch); at 100 TB you diff snapshots instead and reprocess only the
  * delta, so the diff itself has to be shuffle-lean:
  *
  *  - Both sides are projected to `key columns + compared columns` BEFORE
  *    the join — the exchange never carries payload columns the caller
  *    didn't ask to compare. For wide tables, callers pass a digest
  *    column (e.g. `xxhash64(struct(*))` computed map-side) as the single
  *    compare column and the shuffle carries 8 bytes of payload per row.
  *  - One full-outer sort-merge join on the key is the whole plan; status
  *    classification is a projection on top. Changed/added keys can then
  *    semi-join back into the full-width snapshot to fetch payloads —
  *    that second pass touches only the delta.
  *
  * Null-safe semantics: compared columns use `<=>` so NULL→value and
  * value→NULL count as changes, NULL→NULL does not (DuckDB mirror:
  * `IS DISTINCT FROM`).
  */
object SnapshotDiff {

  /** Per-key diff status. Returns one row per key present in either
    * snapshot: the key columns plus `status ∈
    * {added, removed, changed, unchanged}`.
    *
    * Requires `keys` to be unique per snapshot (a keyed table contract —
    * the caller's upstream dedup guarantees it; a duplicated key would
    * fan out the join and double-count).
    */
  def rowStatus(old: DataFrame, neu: DataFrame,
                keys: Seq[String], compare: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshot diff needs at least one key column")
    val oldP = old.select((keys ++ compare).map(col): _*)
    val neuP = neu.select((keys ++ compare).map(col): _*)
    val joinCond = keys.map(k => oldP(k) === neuP(k)).reduce(_ && _)
    val changedCond =
      if (compare.isEmpty) lit(false)
      else compare.map(c => !(oldP(c) <=> neuP(c))).reduce(_ || _)
    // old-side key null ⇒ the row exists only in `neu` (keys are NOT NULL
    // per the keyed-table contract, so a null here can only come from the
    // outer join).
    val status =
      when(oldP(keys.head).isNull, "added")
        .when(neuP(keys.head).isNull, "removed")
        .when(changedCond, "changed")
        .otherwise("unchanged")
    val keyCols = keys.map(k => coalesce(oldP(k), neuP(k)).as(k))
    oldP.join(neuP, joinCond, "full_outer")
      .select(keyCols :+ status.as("status"): _*)
  }

  /** Digest-based variant for wide rows: compares
    * `xxhash64(struct(compare…))` instead of the columns themselves, so
    * the shuffled payload is 8 bytes/row however wide the snapshot is.
    * Same output contract as [[rowStatus]]. (Engine-internal — xxhash64
    * has no cross-engine oracle; the oracle-able face is [[rowStatus]].)
    */
  def rowStatusDigest(old: DataFrame, neu: DataFrame,
                      keys: Seq[String], compare: Seq[String]): DataFrame = {
    val digest = (df: DataFrame) =>
      df.select(keys.map(col) :+
        xxhash64(compare.map(col): _*).as("graft_digest"): _*)
    rowStatus(digest(old), digest(neu), keys, Seq("graft_digest"))
  }
}
