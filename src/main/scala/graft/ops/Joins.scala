package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join surface (reference `api/join.kt`, SURVEY §2.5).
  *
  * The reference hard-codes one algorithm (build a hash map on the right,
  * probe from the left). Here the join is *declared* and Catalyst/AQE picks
  * broadcast / shuffled-hash / sort-merge by size — callers can force
  * broadcast for known-small dimensions via `hintBroadcast = true`.
  */
object Joins {

  implicit final class JoinableDataFrame(private val left: DataFrame)
      extends AnyVal {

    /** Natural-join default keys: intersecting column names
      * (reference `defaultJoinColumns`, `join.kt:56-64`). */
    def naturalKeys(right: DataFrame): Seq[String] =
      left.columns.filter(right.columns.toSet).toSeq

    private def run(right: DataFrame, keys: Seq[String], how: String,
        hintBroadcast: Boolean): DataFrame = {
      val r  = if (hintBroadcast) broadcast(right) else right
      val ks = if (keys.isEmpty) naturalKeys(right) else keys
      require(ks.nonEmpty, "join: no keys given and no shared column names")
      left.join(r, ks, how)
    }

    def innerJoin(right: DataFrame, keys: Seq[String] = Nil,
        hintBroadcast: Boolean = false): DataFrame =
      run(right, keys, "inner", hintBroadcast)
    def leftJoin(right: DataFrame, keys: Seq[String] = Nil,
        hintBroadcast: Boolean = false): DataFrame =
      run(right, keys, "left", hintBroadcast)
    def rightJoin(right: DataFrame, keys: Seq[String] = Nil,
        hintBroadcast: Boolean = false): DataFrame =
      run(right, keys, "right", hintBroadcast)
    def outerJoin(right: DataFrame, keys: Seq[String] = Nil,
        hintBroadcast: Boolean = false): DataFrame =
      run(right, keys, "full", hintBroadcast)
    /** reference `filterJoin` = inner with no right columns = left-semi.
      * Left schema/order preserved (using-join moves keys first). */
    def filterJoin(right: DataFrame, keys: Seq[String] = Nil,
        hintBroadcast: Boolean = false): DataFrame =
      run(right, keys, "left_semi", hintBroadcast)
        .select(left.columns.map(col).toIndexedSeq: _*)
    /** reference `excludeJoin` = unmatched left = left-anti. */
    def excludeJoin(right: DataFrame, keys: Seq[String] = Nil,
        hintBroadcast: Boolean = false): DataFrame =
      run(right, keys, "left_anti", hintBroadcast)
        .select(left.columns.map(col).toIndexedSeq: _*)

    /** Reference's clashing-right-column policy: suffix `_1`
      * (test `person/JoinTests.kt:46`). Applied by renaming the right side
      * before joining, so the output schema matches the reference. */
    def joinDedupNames(right: DataFrame, keys: Seq[String], how: String)
        : DataFrame = {
      val clash = right.columns.toSet
        .intersect(left.columns.toSet) -- keys.toSet
      val r2 = clash.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"${c}_1"))
      left.join(r2, keys, how)
    }
  }

  /** Skew-salted equi-join (beyond the reference; the join-side sibling of
    * `Agg.sumForSalted`): when one join key dominates (a hot user, the
    * empty-string document, a null-ish default), the shuffle hash-partitions
    * every matching row of BOTH sides onto one task — the classic straggler
    * that stalls a 1000-executor job on one core. Salting splits each left
    * row across `salts` sub-keys derived from a hash of the whole row, and
    * replicates the (small) right side once per salt, so the hot key's probe
    * work spreads over `salts` tasks. The right side grows `salts`× — use
    * this when right is the dimension side (or pre-filtered), and prefer
    * plain broadcast when right fits in memory; salting is the middle
    * regime: right too big to broadcast, left too skewed to shuffle flat.
    * Results are identical to the plain join (oracle-pinned): the salt is
    * an AND-ed equi-key, never a filter. AQE's skew-join handles sort-merge
    * skew after the fact; explicit salting also covers shuffled-hash plans
    * and composes with bucketing.
    *
    * Only inner/left joins are exposed: for right/full joins the replicated
    * right side would need a post-join dedup of unmatched copies. */
  def saltedSkewJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int, how: String = "inner"): DataFrame = {
    require(salts > 0, "saltedSkewJoin: salts must be > 0")
    require(how == "inner" || how == "left",
      s"saltedSkewJoin: only inner/left joins (got $how)")
    // deterministic per-row salt: hash over ALL left columns — duplicate
    // rows land on the same salt (harmless), everything else spreads
    val l = left.withColumn("__salt",
      pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "__salt", how).drop("__salt")
  }
}
