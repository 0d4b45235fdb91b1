package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.TypeWidening

/** Change-data-capture maintenance (beyond the reference — the lakehouse
  * operation a 100 TB training corpus actually needs): apply a changelog of
  * upserts and deletes onto a base snapshot, last-writer-wins per key.
  *
  * This is the MERGE INTO shape without a table format: at scale the
  * snapshot is rewritten periodically from (previous snapshot ∪ accumulated
  * changes), and the whole reconciliation must be ONE hash shuffle on the
  * key — never a per-change point update, never a driver loop.
  */
object Cdc {

  /** Op-column values understood by [[applyChangeLog]]. */
  val Upsert = "U"
  val Delete = "D"

  /** Apply `changes` to `base`, producing the new snapshot.
    *
    *   - `keys`: primary key columns (present in both frames).
    *   - `changes` carries the payload columns plus `seqCol` (monotone
    *     version: log offset, commit timestamp — ties broken deterministically
    *     in favor of the LATER union side is NOT assumed; (key, seq) must be
    *     unique, which every real changelog provides) and `opCol`
    *     ([[Upsert]] or [[Delete]]).
    *   - base rows rank below every change: ranking is on
    *     (seq desc, change-side desc), so even a change carrying
    *     seq == Long.MinValue (the base sentinel) still outranks the base
    *     row — "a change always beats the snapshot" holds for the full
    *     seq domain, not just MinValue+1 and above.
    *
    * Scale shape: union (no shuffle) → one hash shuffle on `keys` → per-key
    * top-1 by seq via running max — a partial-aggregable pattern, skew-safe
    * for real primary keys (each key holds 1 + its change count rows).
    * Deletes survive ranking and are dropped at the end, so a delete
    * followed by nothing removes the row, and an upsert AFTER a delete
    * resurrects it — exact changelog semantics.
    */
  def applyChangeLog(base: DataFrame, changes: DataFrame, keys: Seq[String],
      seqCol: String, opCol: String): DataFrame = {
    val payload = base.columns.filterNot(keys.contains).toSeq
    require(payload.forall(changes.columns.contains),
      "applyChangeLog: changes must carry every base payload column")
    val b = base
      .withColumn(seqCol, lit(Long.MinValue))
      .withColumn(opCol, lit(Upsert))
      .withColumn("__chg", lit(0))
    val c = changes.select((keys ++ payload ++ Seq(seqCol, opCol)).map(col): _*)
      .withColumn("__chg", lit(1))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc, col("__chg").desc)
    TypeWidening.unionByNameWide(Seq(b, c))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && col(opCol) === Upsert)
      .select((keys ++ payload).map(col): _*)
  }
}
