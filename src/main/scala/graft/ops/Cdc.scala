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

  /** Type-2 slowly-changing-dimension history from a changelog: one row
    * per surviving change version, carrying `valid_from` (the change's
    * seq), `valid_to` (the NEXT change's seq for the key — exclusive —
    * or null while current) and `is_current`. A [[Delete]] closes the
    * previous version's interval at its seq and emits no row, so a key
    * whose last change is a delete has no current version; an upsert
    * after a delete opens a fresh interval — exact changelog semantics,
    * the history-preserving sibling of [[applyChangeLog]] (which keeps
    * only the winners).
    *
    * Determinism: versions are ordered by (seq, op, payload struct), so
    * even a changelog with duplicate (key, seq) rows — which real CDC
    * feeds produce on replays — yields one well-defined history (the
    * duplicate becomes a zero-length interval, not a coin flip).
    *
    * Scale shape: ONE hash shuffle on `keys` (the window); `lead` is a
    * running single-row state per key, no join, no second pass. At 100 TB
    * the changelog is the small side of the lake — this never touches
    * the fact data.
    */
  def scd2Build(changes: DataFrame, keys: Seq[String], seqCol: String,
      opCol: String): DataFrame = {
    val payload = changes.columns
      .filterNot(c => keys.contains(c) || c == seqCol || c == opCol).toSeq
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol), col(opCol), struct(payload.map(col): _*))
    changes
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .where(col(opCol) =!= Delete)
      .select(keys.map(col) ++ payload.map(col) ++ Seq(
        col(seqCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current")): _*)
  }

  /** Point-in-time (bitemporal) lookup: each fact row joins the dimension
    * version that was valid AT its timestamp — `fact.ts ∈
    * [valid_from, valid_to)` — the join that makes SCD2 history usable
    * (training-data labeling as-of event time, revenue at the price then
    * in force). Facts in a deleted/never-existing interval get nulls
    * (left) or drop (inner).
    *
    * Scale shape: an EQUI-join on `keys` with the interval predicate as a
    * residual join condition — Spark picks hash/broadcast on the key
    * columns, and each fact probes only its key's few versions (bounded
    * by the key's change count, never a range-join cross product). The
    * SCD2 invariant (intervals per key are disjoint) guarantees ≤ 1 match
    * per fact, so the join never fans out.
    */
  def pointInTimeJoin(facts: DataFrame, dim: DataFrame, keys: Seq[String],
      factTs: String, joinType: String = "left"): DataFrame = {
    require(joinType == "left" || joinType == "inner",
      s"pointInTimeJoin: joinType must be left or inner, got $joinType")
    val d = dim.columns.foldLeft(dim)((acc, c) =>
      if (keys.contains(c)) acc else acc.withColumnRenamed(c, "__d_" + c))
    val cond = keys.map(k => facts(k) === d(k)).reduce(_ && _) &&
      facts(factTs) >= d("__d_valid_from") &&
      (d("__d_valid_to").isNull || facts(factTs) < d("__d_valid_to"))
    val joined = facts.join(d, cond, joinType)
    val dimPayload = dim.columns.filterNot(keys.contains)
    joined.select(facts.columns.map(facts(_)) ++
      dimPayload.map(c => d("__d_" + c).as(c)): _*)
  }
}
