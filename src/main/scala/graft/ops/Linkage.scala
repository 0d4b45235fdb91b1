package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.CacheHandle
import graft.functions.TextFunctions.tokens

/** Entity resolution (record linkage): the pipeline that answers "which of
  * these rows are the same real-world thing" across dirty, partially
  * duplicated sources — customer files, crawled product pages, author
  * records. Reference analogue: the dedup/join surface (`api/join.kt`,
  * `api/distinct.kt`) stops at equal keys; linkage is the probabilistic
  * generalization (Fellegi–Sunter 1969).
  *
  * Four composable stages, each a separate operator so pipelines can
  * inspect / threshold / audit between them:
  *
  *  1. [[blockCandidates]] — cheap key(s) bound the candidate space.
  *  2. [[scorePairs]] — per-field comparator weights in integer MICROS,
  *     summed to a match score (exact BIGINT arithmetic, engine-portable).
  *  3. match clusters — threshold the score, then connected components via
  *     [[Dedup.propagateMinLabels]] (the checkpointed label-prop loop).
  *  4. [[goldenRecords]] — per-cluster survivorship: best base row plus
  *     per-field backfill from the highest-ranked non-null value.
  *
  * Scale design (100 TB): blocking is the only stage that sees the full
  * corpus — it shuffles skinny (key, id) pairs once per pass, and
  * oversized blocks (stop-word keys) are DROPPED with an explicit cap so
  * a degenerate key can never detonate into O(n²) pairs. Scoring joins
  * the record payload to the (already bounded) candidate set by id —
  * two hash joins, comparators all scan-side expressions. Clustering
  * touches only matched ids; survivorship is one aggregation shuffle
  * whose per-group state is bounded by cluster size.
  */
object Linkage {

  /** A per-field comparator: given the a-side and b-side value columns,
    * yields an integer-micro agreement weight (positive = evidence the
    * pair co-refers, negative = evidence against, 0 = no evidence).
    * All built-ins are null-transparent: a null on either side yields 0
    * rather than penalizing records with missing fields. */
  final case class FieldRule(name: String, weigh: (Column, Column) => Column)

  object FieldRule {
    private def nullGuard(a: Column, b: Column, w: Column): Column =
      when(a.isNull || b.isNull, lit(0L)).otherwise(w)

    /** Token-set Jaccard on a text field, mapped affinely to
      * [-scale, +scale] micros: w = floor((2·|∩| − |∪|)·scale / |∪|).
      * Integer-exact inputs; the one IEEE division is replayed
      * bit-identically by any engine. Empty∩empty token sets agree. */
    def tokenJaccard(field: String, scaleMicros: Long): FieldRule =
      FieldRule(field + "_jac", (a, b) => {
        val ta = array_distinct(tokens(a))
        val tb = array_distinct(tokens(b))
        val inter = size(array_intersect(ta, tb)).cast("long")
        val uni = (size(ta) + size(tb)).cast("long") - inter
        nullGuard(a, b, when(uni === 0L, lit(scaleMicros))
          .otherwise(floor((inter * 2L - uni) * lit(scaleMicros.toDouble)
            / uni).cast("long")))
      })

    /** Normalized Levenshtein similarity, mapped affinely to
      * [-scale, +scale] micros: w = floor((2·(L−d) − L)·scale / L) with
      * L = max(len a, len b). Both-empty strings agree at +scale. */
    def editSimilarity(field: String, scaleMicros: Long): FieldRule =
      FieldRule(field + "_edit", (a, b) => {
        val L = greatest(length(a), length(b)).cast("long")
        val d = levenshtein(a, b).cast("long")
        nullGuard(a, b, when(L === 0L, lit(scaleMicros))
          .otherwise(floor(((L - d) * 2L - L) * lit(scaleMicros.toDouble)
            / L).cast("long")))
      })

    /** Null-safe exact equality: `agree` micros on match (including
      * null == null), `disagree` otherwise. */
    def exact(field: String, agreeMicros: Long, disagreeMicros: Long)
        : FieldRule =
      FieldRule(field + "_eq", (a, b) =>
        when(a <=> b, lit(agreeMicros)).otherwise(lit(disagreeMicros)))

    /** Numeric proximity: `agree` micros when |a − b| ≤ tol, `disagree`
      * otherwise; nulls → 0. */
    def numericWithin(field: String, tol: Double, agreeMicros: Long,
        disagreeMicros: Long): FieldRule =
      FieldRule(field + "_near", (a, b) =>
        nullGuard(a, b, when(abs(a - b) <= lit(tol), lit(agreeMicros))
          .otherwise(lit(disagreeMicros))))
  }

  /** Candidate pairs via multi-pass blocking: for each key expression,
    * records sharing a non-null key value become candidates; passes
    * union and the pair set dedups on (id_a < id_b). Cross-source
    * linkage = union the sources into `records` first (ids must be
    * globally unique).
    *
    * `maxBlockSize` drops blocks larger than the cap BEFORE the pair
    * join (a block of size s yields s·(s−1)/2 pairs — a stop-word key
    * at 100 TB is an O(n²) detonation; real linkage systems always cap).
    * 0 = uncapped.
    *
    * Plan shape: per pass, one skinny (key, id) projection, a count
    * shuffle for the cap, and a self equi-join on the key — candidate
    * output is Σ_blocks s², never corpus². */
  def blockCandidates(records: DataFrame, idCol: String,
      blockKeys: Seq[Column], maxBlockSize: Int = 0): DataFrame = {
    require(blockKeys.nonEmpty, "blockCandidates: need >= 1 blocking key")
    blockKeys.map { key =>
      val keyed = records.select(key.as("__bk"), col(idCol).as("__id"))
        .where(col("__bk").isNotNull)
      val kept =
        if (maxBlockSize <= 0) keyed
        else {
          val sizes = keyed.groupBy("__bk")
            .agg(count(lit(1)).as("__n"))
            .where(col("__n") <= maxBlockSize)
          keyed.join(sizes.select("__bk"), Seq("__bk"))
        }
      kept.as("a")
        .join(kept.as("b"), col("a.__bk") === col("b.__bk")
          && col("a.__id") < col("b.__id"))
        .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
    }.reduce(_ unionByName _).distinct()
  }

  /** Scores candidate `pairs` (id_a, id_b) against `records`: one output
    * row per pair carrying each rule's micro weight (`w_<rule>`) and
    * their BIGINT sum (`score`). Two hash joins pull the payload to the
    * pair; every comparator is a scan-side expression, so the cost is
    * O(candidates), bounded by the blocking stage. */
  def scorePairs(records: DataFrame, idCol: String, pairs: DataFrame,
      rules: Seq[FieldRule]): DataFrame = {
    require(rules.nonEmpty, "scorePairs: need >= 1 field rule")
    val payload = records.columns.filter(_ != idCol).toSeq
    val wrap = records.select(col(idCol),
      struct(payload.map(col): _*).as("__r"))
    val joined = pairs
      .join(wrap.select(col(idCol).as("id_a"), col("__r").as("__ra")), "id_a")
      .join(wrap.select(col(idCol).as("id_b"), col("__r").as("__rb")), "id_b")
    val ws = rules.map { r =>
      r.weigh(col("__ra." + fieldOf(r, payload)),
        col("__rb." + fieldOf(r, payload))).as("w_" + r.name)
    }
    joined.select(col("id_a") +: col("id_b") +: ws: _*)
      .withColumn("score", rules.map(r => col("w_" + r.name)).reduce(_ + _))
  }

  private def fieldOf(r: FieldRule, payload: Seq[String]): String = {
    // rule names are "<field>_<kind>" by construction of the built-ins;
    // resolve the longest payload column that prefixes the rule name so
    // fields containing '_' work.
    payload.filter(c => r.name.startsWith(c + "_"))
      .sortBy(-_.length).headOption.getOrElse(
        throw new IllegalArgumentException(
          s"FieldRule '${r.name}' matches no record column"))
  }

  /** Match clusters: threshold `scored` (from [[scorePairs]]) at
    * `minScoreMicros`, then connected components over the match graph —
    * [[Dedup.propagateMinLabels]]' iterate-checkpoint loop on the skinny
    * (id_a, id_b) edges. Output (id, cluster): matched ids only;
    * singletons are implicit (cluster = own id), which
    * [[goldenRecords]] restores with a left join. */
  def linkClusters(scored: DataFrame, minScoreMicros: Long,
      maxIters: Int = 10, cache: CacheHandle = CacheHandle.unmanaged)
      : DataFrame =
    Dedup.propagateMinLabels(
      scored.where(col("score") >= minScoreMicros).select("id_a", "id_b"),
      maxIters, cache)

  /** Golden records (survivorship): one canonical row per entity. Base
    * row = highest `rankCol`, ties to lowest id; every OTHER field
    * backfills from the highest-ranked row where it is non-null — so a
    * fresher row that is missing a phone number still inherits it from
    * an older duplicate (field-level survivorship, the standard MDM
    * rule).
    *
    * `clusters` is (id, cluster) from [[linkClusters]]; records absent
    * from it keep themselves (singleton entities). Output: `cluster`,
    * `n_members`, and the record payload.
    *
    * Plan shape: ONE aggregation shuffle on the cluster key. Per-group
    * state is the member array — bounded by cluster size, the same bound
    * every stage of linkage already assumes (a 10⁶-member "cluster"
    * means the blocking/threshold upstream is broken, not this agg).
    * The sort comparator (rank desc, id asc) avoids id negation, so ids
    * of any orderable type work ([[Dedup.clusterRepresentatives]]'s
    * negation trick needs numeric ids). */
  def goldenRecords(records: DataFrame, idCol: String, clusters: DataFrame,
      rankCol: String): DataFrame = {
    val payload = records.columns.filter(c => c != idCol && c != rankCol)
      .toSeq
    val labeled = records
      .join(clusters.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("cluster", coalesce(col("cluster"), col(idCol)))
    val member = struct(col(rankCol).as("__rank"),
      col(idCol).as("__id"), struct(payload.map(col): _*).as("__p"))
    // rank desc, id asc — expressed as a comparator, not negation
    val cmp = (l: Column, r: Column) =>
      when(l("__rank") > r("__rank"), -1)
        .when(l("__rank") < r("__rank"), 1)
        .when(l("__id") < r("__id"), -1)
        .when(l("__id") > r("__id"), 1)
        .otherwise(0)
    val agged = labeled.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        array_sort(collect_list(member), cmp).as("__m"))
    // `get` (not element_at): an all-null field across a whole cluster
    // backfills to null instead of an ANSI out-of-bounds error
    val bestId = get(col("__m"), lit(0))("__id").as(idCol)
    val fields = payload.map { c =>
      // first non-null value of c in survivorship order
      get(filter(col("__m"), m => m("__p")(c).isNotNull), lit(0))("__p")(c)
        .as(c)
    }
    agged.select(col("cluster") +: col("n_members") +: bestId +: fields: _*)
  }
}
