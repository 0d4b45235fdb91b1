package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextFunctions._
import graft.core.CacheHandle

/** Deduplication for training-data pipelines (brief: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup).
  *
  * Scale design (the part that matters at 100 TB):
  *  - exact dedup is one hash-shuffle on a 64/256-bit content key — never
  *    a sort, never a full-text compare;
  *  - near-dup is MinHash banding: each doc lands in `bands` buckets, a
  *    candidate pair must share ≥1 bucket → candidate generation is
  *    O(n·bands) with a single shuffle on the (band, key) pair — NEVER the
  *    O(n²) all-pairs cross join; the Jaccard verify runs only on bucket
  *    collisions;
  *  - bucket skew (boilerplate shingles) is handled by AQE skew-join
  *    splitting — keys stay salted-free because the verify side is tiny.
  */
object Dedup {

  // ---- exact ----------------------------------------------------------
  /** Exact dedup: keep the first (smallest `idCol`) row per normalized
    * content key. One shuffle on the 256-bit key. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    import RowOps._
    df.withColumn("__key", contentKey(col(textCol)))
      .distinctByFirst(Seq("__key"), Seq(col(idCol)))
      .drop("__key")
  }

  /** Per-source exact-duplication rate report — the corpus-governance
    * rollup read BEFORE committing to a dedup pass ("which feeds are
    * recycling content, and how much of the budget would dedup
    * reclaim"). A row is a duplicate iff its normalized content key
    * has a smaller-id holder anywhere in the corpus (the exactDedup
    * keep-first rule — cross-source duplicates charge the LATER
    * source). Output: (source, n_docs, n_dupes, dup_rate_micro).
    * Null-text rows COUNT in n_docs (they are real rows in the feed's
    * budget) but are never duplicates — the keep join is a left join,
    * and a null content key matches nothing.
    *
    * Scale shape: scan-side 256-bit keys; one partial-aggregated min
    * shuffle over (key → min id); the winners frame re-joins
    * shuffle-hash on the key (aggregated side ≪ corpus side); one
    * (sources)-cardinality rollup. Text never shuffles — only keys and
    * ids move. */
  def dedupRateReport(df: DataFrame, textCol: String, idCol: String,
      srcCol: String): DataFrame = {
    val keyed = df.select(col(idCol).as("id"), col(srcCol).as("source"),
      contentKey(col(textCol)).as("__key"))
    val keep = keyed.where(col("__key").isNotNull).groupBy(col("__key"))
      .agg(min(col("id")).as("__keep"))
    keyed.join(keep.hint("shuffle_hash"), Seq("__key"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("id") =!= col("__keep"), 1L).otherwise(0L))
          .as("n_dupes"))
      .withColumn("dup_rate_micro",
        round(col("n_dupes") * lit(1000000.0) / col("n_docs"))
          .cast(LongType))
  }

  /** Keep-BEST dedup policy: given cluster labels (`nearDupClusters`
    * output: id, cluster) and a per-doc score, pick each cluster's
    * highest-scoring member (ties → lowest id) — what production
    * pipelines actually keep (the longest / highest-quality copy), where
    * keep-first is only the degenerate score=-id case.
    *
    * Implemented as two partial-aggregable passes — max score per
    * cluster, then min id among the rows holding that max — rather than
    * an ordered-struct max over (score, -id): negating the id to invert
    * its sort order silently casts string ids to double (null
    * representatives instead of an error) and overflows at
    * Long.MinValue, so no column is ever negated here and any orderable
    * id type works. Both aggregations combine map-side; the tie join is
    * on (cluster, score) against a one-row-per-cluster frame, which AQE
    * broadcasts when small. */
  def clusterRepresentatives(clusters: DataFrame, scored: DataFrame,
      idCol: String, scoreCol: String): DataFrame = {
    val joined = clusters.select(col("id").as(idCol), col("cluster"))
      .join(scored.select(col(idCol), col(scoreCol)), Seq(idCol))
    val best = joined.groupBy(col("cluster"))
      .agg(max(col(scoreCol)).as(scoreCol))
    joined.join(best, Seq("cluster", scoreCol))
      .groupBy(col("cluster"), col(scoreCol))
      .agg(min(col(idCol)).as(idCol))
      .select(col("cluster"), col(idCol), col(scoreCol))
  }

  /** Cross-source duplicate overlap matrix (corpus governance: which
    * sources re-publish each other's content — the table that decides
    * which source to keep as canonical before dedup). For every unordered
    * source pair, counts the distinct content keys present in BOTH.
    *
    * Scale shape: one shuffle of skinny (256-bit key, source) distinct
    * pairs — full text never shuffles; the self-join hash-partitions on
    * the key, and per-key fanout is (sources holding that key)², bounded
    * by the source count, not the corpus. Collision risk of the 256-bit
    * key is nil, so counting hashed keys equals counting texts — which is
    * how an oracle engine without this hash can verify the result from
    * raw strings. */
  def sourceOverlap(df: DataFrame, textCol: String, srcCol: String)
      : DataFrame = {
    val ks = df.select(contentKey(col(textCol)).as("__key"),
      col(srcCol).as("__src")).distinct()
    ks.as("a").join(ks.as("b"),
        col("a.__key") === col("b.__key") &&
          col("a.__src") < col("b.__src"))
      .groupBy(col("a.__src").as("source_a"),
        col("b.__src").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Snapshot diff (dataset versioning): classify every doc id across two
    * corpus versions as added / removed / changed / unchanged by
    * comparing 256-bit content keys — the audit table behind "what moved
    * between crawl v3 and v4". ONE full-outer join on the id; text never
    * shuffles (keys are computed scan-side), so the cost is two scans +
    * one skinny shuffle regardless of document size. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val o = oldDf.select(col(idCol), contentKey(col(textCol)).as("__ko"))
    val n = newDf.select(col(idCol), contentKey(col(textCol)).as("__kn"))
    o.join(n, Seq(idCol), "full")
      .select(col(idCol),
        when(col("__ko").isNull, "added")
          .when(col("__kn").isNull, "removed")
          .when(col("__ko") =!= col("__kn"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Minimal patch transforming snapshot `oldDf` into `newDf`: one row
    * per differing id — op = "upsert" (added or changed ids, payload =
    * the NEW row) or "delete" (removed ids, payload null). The inverse
    * of [[applySnapshotPatch]]: `apply(old, patch(old, new)) ≡ new`
    * row-for-row (the CI law pinned by unit test), which is what makes
    * incremental corpus publication safe — ship the patch, not the
    * 100 TB snapshot.
    *
    * Scale shape: one full-outer join hash-partitioned on the id; rows
    * compare by a null-safe struct equality over the payload columns, so
    * unchanged rows are dropped map-side after the join and only the
    * (usually tiny) changed set survives. */
  def snapshotPatch(oldDf: DataFrame, newDf: DataFrame, idCol: String)
      : DataFrame = {
    val payload = newDf.columns.filter(_ != idCol).toSeq
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      "snapshotPatch: snapshots must share a schema")
    val o = oldDf.select(col(idCol),
      struct(payload.map(col): _*).as("__po"))
    val n = newDf.select(col(idCol),
      struct(payload.map(col): _*).as("__pn"))
    o.join(n, Seq(idCol), "full")
      .filter(!(col("__po") <=> col("__pn")))
      .select(col(idCol) +:
        when(col("__pn").isNull, "delete").otherwise("upsert").as("op") +:
        payload.map(c => col(s"__pn.$c").as(c)): _*)
  }

  /** Applies a [[snapshotPatch]] to a snapshot: deletes and replaced
    * rows drop, upsert payloads union in. One left-anti-shaped join on
    * the id plus a union — the MERGE INTO shape without sequence
    * numbers (a patch is a complete, conflict-free delta by
    * construction; for incremental CHANGELOGS with competing writers
    * use [[Cdc.applyChangeLog]]). */
  def applySnapshotPatch(oldDf: DataFrame, patch: DataFrame, idCol: String)
      : DataFrame = {
    val payload = oldDf.columns.filter(_ != idCol).toSeq
    oldDf.join(patch.select(col(idCol)), Seq(idCol), "left_anti")
      .unionByName(patch.filter(col("op") === "upsert")
        .select(col(idCol) +: payload.map(col): _*))
  }

  // ---- MinHash signatures ----------------------------------------------
  /** k-permutation MinHash signature over word `n`-gram shingles, as one
    * codegen-friendly expression: sig[i] = min over shingles of
    * xxhash64(shingle, i). */
  def minhashSignature(text: Column, numHashes: Int, shingleN: Int): Column =
    minhashFromShingles(shingles(text, shingleN), numHashes)

  /** Same, over an already-materialized shingle column. Backed by the
    * native [[org.apache.spark.sql.graftnative.MinHashSignature]]
    * expression — one compiled pass instead of k×|shingles| interpreted
    * lambda evaluations. */
  def minhashFromShingles(sh: Column, numHashes: Int): Column =
    org.apache.spark.sql.graftnative.NativeFunctions
      .minhashSignature(sh, numHashes)

  /** Banded bucket keys from a signature: `bands` buckets of `rowsPerBand`
    * signature slots each; two docs collide iff any band hashes equal. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      j => xxhash64(slice(sig, j * rowsPerBand + 1, lit(rowsPerBand)), j))

  /** Candidate near-dup pairs via MinHash-LSH banding, verified with exact
    * n-gram Jaccard. Returns (id_a, id_b, jaccard) with id_a < id_b.
    *
    * Scale shape (the part that must survive 100×):
    *  - the per-row hash compute is spread by an id-repartition first
    *    (text parquet compresses so well that the scan has far fewer
    *    partitions than cores — without this all minhashing lands on a
    *    couple of tasks);
    *  - candidate generation explodes SKINNY (id, band, key) tuples only —
    *    never the shingle/signature arrays (carrying those 32× through the
    *    shuffle is what makes banding fall over at scale);
    *  - the band self-join is hinted shuffle-hash: both sides are the same
    *    size, and the planner's scan-size estimate would otherwise
    *    broadcast the whole exploded relation;
    *  - shingles are re-joined BY ID only for the ~|candidates| verify
    *    rows.
    */
  def nearDupPairs(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleN: Int = 3,
      minJaccard: Double = 0.8,
      cache: CacheHandle = CacheHandle.unmanaged,
      tokenMode: String = "word"): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    // ZERO-TOKEN docs are excluded from near-dup candidacy (r16
    // finding, surfaced by the CJK corpus under the word tokenizer):
    // a doc with no tokens has no similarity features, and the
    // kernel's empty-input fallback shingle is one CONSTANT — every
    // zero-token doc would pair with every other at jaccard 1.0,
    // collapsing all image-only/empty/wrong-tokenizer pages into one
    // pseudo-dup cluster. True empties belong to exactDedup (same
    // normalized content key), not here. The token array is bound to
    // a projected attribute (the chunkTokenWindows precedent), so the
    // tokenizer subtree evaluates once per row.
    // tokenMode "cjk" shingles per-codepoint unigrams (the standard
    // space-less-script granularity) — the whitespace tokenizer sees a
    // CJK document as ZERO tokens and misses every near-dup.
    val base = df.select(col(idCol).as("id"),
        graft.functions.TextFunctions
          .tokensMode(col(textCol), tokenMode).as("__tk"))
      .where(size(col("__tk")) > 0)
      .repartition(col("id"))
    // persisted: consumed by candidate generation AND both verify joins —
    // without this the shingling runs 4× (and the whole job was ~10×
    // slower measured at sf0.1). Shingles are 64-bit HASHES, not strings:
    // Jaccard is identical modulo 2^-64 collisions, and skipping the
    // per-shingle string allocation is the dominant remaining cost.
    val shingled = cache.track(base
      .select(col("id"), org.apache.spark.sql.graftnative.NativeFunctions
        .shingleHashes(col("__tk"), shingleN).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val cand = cache.track(shingled
      .select(col("id"), posexplode(
        bandKeys(org.apache.spark.sql.graftnative.NativeFunctions
          .minhashFromLongs(col("sh"), numHashes), bands, r)))
      .select(col("id"), col("pos").as("b"), col("col").as("k"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // materialize before the self-join: its two sides start concurrently
    // and would otherwise BOTH compute the signatures on a cold cache
    cand.count()
    val pairs = cand.as("a")
      .join(cand.as("b").hint("shuffle_hash"),
        col("a.b") === col("b.b") && col("a.k") === col("b.k") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    pairs
      .join(shingled.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(shingled.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b"))).cast(DoubleType))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** FUZZY decontamination: MinHash near-dup matching BETWEEN two corpora
    * (train × benchmark) — catches contamination that survives the exact
    * n-gram check ([[ngramContamination]]/[[bloomDecontaminate]]) because
    * the benchmark text was lightly edited before leaking into the train
    * set. Returns (train_id, bench_id) pairs with verified shingle
    * Jaccard ≥ `minJaccard`.
    *
    * Scale shape: the same banded-LSH discipline as [[nearDupPairs]], but
    * the band join is train × bench and the BENCHMARK side is broadcast —
    * benchmarks are thousands of documents against a 100 TB train corpus,
    * so the train side streams through map-side hash probes with NO
    * shuffle of train candidates at all; only the ~|hits| verify rows
    * re-join shingles by id. Banding at 32 bands × r=2 misses a
    * j ≥ 0.8 pair with probability < 1e-14. */
  def fuzzyContamination(train: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, numHashes: Int = 64, bands: Int = 32,
      shingleN: Int = 3, minJaccard: Double = 0.8,
      cache: CacheHandle = CacheHandle.unmanaged): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    // zero-token docs excluded (no similarity features; the empty-input
    // fallback shingle is a constant that would cross-match every
    // zero-token train doc with every zero-token bench doc — the
    // nearDupPairs r16 contract)
    def shingled(df: DataFrame) = df
      .select(col(idCol).as("id"), tokens(col(textCol)).as("__tk"))
      .where(size(col("__tk")) > 0)
      .repartition(col("id"))
      .select(col("id"), org.apache.spark.sql.graftnative.NativeFunctions
        .shingleHashes(col("__tk"), shingleN).as("sh"))
    def candOf(sh: DataFrame) = sh
      .select(col("id"), posexplode(
        bandKeys(org.apache.spark.sql.graftnative.NativeFunctions
          .minhashFromLongs(col("sh"), numHashes), bands, r)))
      .select(col("id"), col("pos").as("b"), col("col").as("k"))
    val shT = cache.track(shingled(train)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val shB = cache.track(shingled(bench)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val hits = candOf(shT).as("a")
      .join(broadcast(candOf(shB)).as("b"),
        col("a.b") === col("b.b") && col("a.k") === col("b.k"))
      .select(col("a.id").as("train_id"), col("b.id").as("bench_id"))
      .dropDuplicates("train_id", "bench_id")
    hits
      .join(shT.select(col("id").as("train_id"), col("sh").as("sh_a")),
        "train_id")
      .join(shB.select(col("id").as("bench_id"), col("sh").as("sh_b")),
        "bench_id")
      .filter(size(array_intersect(col("sh_a"), col("sh_b")))
        .cast(DoubleType) /
        size(array_union(col("sh_a"), col("sh_b"))).cast(DoubleType)
        >= minJaccard)
      .select("train_id", "bench_id")
  }

  /** Near-dup dedup: drop every doc that near-matches a smaller-id doc
    * (greedy cluster representative = min id; no transitive closure —
    * documented, same policy most pipeline dedups use). */
  def nearDupDedup(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleN: Int = 3,
      minJaccard: Double = 0.8,
      cache: CacheHandle = CacheHandle.unmanaged): DataFrame = {
    val dupIds = nearDupPairs(df, textCol, idCol, numHashes, bands,
      shingleN, minJaccard, cache).select(col("id_b").as(idCol)).distinct()
    df.join(dupIds, Seq(idCol), "left_anti")
  }

  /** Near-dup clusters via iterative min-label propagation over the pair
    * graph (connected components): every doc converges to the smallest id
    * reachable through near-dup edges. Bounded iterations (component
    * diameters in dedup graphs are tiny — chains of edits); each round is
    * one join + one aggregation, fully distributed. Returns (id, cluster).
    *
    * Memory/lineage design:
    *  - propagation runs ONLY over edge-touched ids (dedup graphs are
    *    sparse — the overwhelming majority of docs have no near-dup edge
    *    and are trivially their own cluster; keeping them in the loop
    *    would shuffle the full corpus every round for nothing);
    *  - each round's label frame (small by the above) is eagerly
    *    `localCheckpoint`ed: truncated lineage means freeing the previous
    *    round — or the LSH caches at the end — can never force a
    *    recompute (Spark's non-cascading uncache re-plans dependent cache
    *    entries and discards their buffers, so a merely-persisted chain
    *    would quietly re-run the whole LSH on next use);
    *  - every internal cache is released before returning; the ONLY
    *    retained storage is the final (tiny) label checkpoint, whose
    *    release thunk goes on the caller's handle. The returned frame is
    *    a lazy corpus-scan ⋈ labels — cheap to re-run, nothing big held.
    */
  def nearDupClusters(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleN: Int = 3,
      minJaccard: Double = 0.8, maxIters: Int = 10,
      cache: CacheHandle = CacheHandle.unmanaged): DataFrame = {
    // pairs + the shingle/candidate caches inside nearDupPairs live only
    // for the propagation loop — released before returning
    val internal = new CacheHandle
    val pairs = internal.track(nearDupPairs(df, textCol, idCol, numHashes,
      bands, shingleN, minJaccard, internal).select("id_a", "id_b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // materialize before fan-out: edges + the seed labels both read this
    // cache, and concurrent cold reads would re-run the whole LSH verify
    pairs.count()
    val labels = propagateMinLabels(pairs, maxIters, cache)
    // labels is lineage-independent of the LSH caches — release them all
    internal.release()
    // rejoin the edge-free majority (cluster = own id): lazy, re-runnable
    // at the cost of one corpus scan + a join against the tiny labels
    df.select(col(idCol).as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
  }

  /** Min-label propagation (connected components) over a MATERIALIZED
    * (id_a, id_b) pair frame — the loop [[nearDupClusters]] always ran,
    * extracted so pair generators other than text LSH (e.g.
    * [[semanticDedup]]'s embedding-cell pairs) reuse it. Returns the
    * labels of edge-touched ids only (id, cluster); callers left-join
    * and coalesce to cover the edge-free majority. The final label
    * checkpoint's release goes on `cache`; every intermediate round is
    * freed inside the loop. `pairs` must already be persisted/
    * checkpointed — the loop reads it every round. */
  def propagateMinLabels(pairs: DataFrame, maxIters: Int = 10,
      cache: CacheHandle = CacheHandle.unmanaged): DataFrame = {
    // undirected edge list (both directions) for propagation
    val edges = pairs.union(pairs.select(col("id_b").as("id_a"),
      col("id_a").as("id_b")))
    var (labels, freeLabels) = CacheHandle.checkpointSmall(
      edges.select(col("id_a").as("id")).distinct()
        .select(col("id"), col("id").as("cluster")))
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val viaNeighbors = edges
        .join(labels.select(col("id").as("id_b"), col("cluster")), "id_b")
        .groupBy(col("id_a").as("id"))
        .agg(min(col("cluster")).as("nbr_cluster"))
      // carry the previous label through the join so the convergence
      // check is a filter on the SAME checkpointed frame, not a join
      val (next, freeNext) = CacheHandle.checkpointSmall(
        labels.join(viaNeighbors, Seq("id"), "left")
          .select(col("id"),
            least(col("cluster"),
              coalesce(col("nbr_cluster"), col("cluster"))).as("cluster"),
            col("cluster").as("__prev")))
      val changed = next.filter(col("cluster") =!= col("__prev"))
        .limit(1).count()
      // `next` is self-contained — the superseded round frees safely
      freeLabels(false)
      labels = next.drop("__prev")
      freeLabels = freeNext
      converged = changed == 0
      i += 1
    }
    cache.trackRelease(freeLabels)
    labels
  }

  // ---- n-gram Jaccard (direct pairwise verify) ------------------------
  /** Exact n-gram Jaccard similarity between two text columns. */
  def ngramJaccard(a: Column, b: Column, n: Int): Column = {
    val (sa, sb) = (array_distinct(shingles(a, n)), array_distinct(shingles(b, n)))
    size(array_intersect(sa, sb)).cast(DoubleType) /
      size(array_union(sa, sb)).cast(DoubleType)
  }

  /** ASYMMETRIC n-gram containment |shingles(a) ∩ shingles(b)| /
    * |shingles(a)| — "how much of A sits inside B" (quote/subset
    * detection Jaccard can't see: a tweet quoted whole inside a long
    * article has tiny Jaccard but containment ≈ 1 from the tweet's
    * side). NULL text on either side propagates null EXPLICITLY —
    * without the guard, [[shingles]]' whole-text fallback turns a null
    * into the [""] singleton and the score silently reads 0.0 while a
    * SQL replay reads NULL (a latent cross-engine divergence this
    * corpus never triggers but a real one would). Same scan-side shape
    * as [[ngramJaccard]]. */
  def ngramContainment(a: Column, b: Column, n: Int): Column = {
    val (sa, sb) = (array_distinct(shingles(a, n)),
      array_distinct(shingles(b, n)))
    when(a.isNull || b.isNull, lit(null).cast(DoubleType))
      .otherwise(
        size(array_intersect(sa, sb)).cast(DoubleType) /
          size(sa).cast(DoubleType))
  }

  // ---- SimHash ---------------------------------------------------------
  /** Per-token 64-bit hashes — materialize this as a column once, then
    * feed [[simhashFromHashes]] (keeps the bit loop from re-tokenizing). */
  def tokenHashes(text: Column): Column =
    transform(tokens(text), t => xxhash64(t))

  /** 60-bit sha256-prefix token hash — a drop-in alternative to the
    * xxhash64 default that an independent SQL engine re-derives exactly
    * (`('0x' || substr(sha256(t), 1, 15))::BIGINT` in DuckDB): 15 hex
    * chars = 60 bits, fitting a signed long in any engine. Bits 60–63
    * of the resulting simhash are structurally 0 (every token votes
    * them clear) — 4 of 64 bits of discrimination traded for a
    * bit-for-bit cross-engine replay of the whole pigeonhole pipeline
    * (the `dedup_simhash_pairs` oracle). The xxhash64 default stays
    * the production path (no crypto hash per token). */
  def shaTokenHash(t: Column): Column =
    conv(substring(sha2(t, 256), 1, 15), 16, 10).cast(LongType)

  /** 64-bit SimHash: bit j of the result is set iff more token hashes have
    * bit j set than clear (majority vote). Backed by the native codegen'd
    * [[org.apache.spark.sql.graftnative.SimHash64]] expression — one fused pass per row (the
    * HOF formulation needed 64 interpreted array traversals). */
  def simhashFromHashes(hashes: Column): Column =
    org.apache.spark.sql.graftnative.NativeFunctions.simhash64(hashes)

  def simhash(text: Column): Column = simhashFromHashes(tokenHashes(text))

  /** Hamming distance between two 64-bit simhashes. */
  def hammingDist(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: docs bucketed by the 4 16-bit quarters of the
    * simhash (pigeonhole: hamming ≤ 3 ⇒ at least one identical quarter),
    * verified by full hamming distance. O(n·4) candidate generation.
    * `tokenHash` swaps the per-token hash (default xxhash64; pass
    * [[shaTokenHash]] for the cross-engine-replayable variant). */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3,
      cache: CacheHandle = CacheHandle.unmanaged,
      tokenHash: Column => Column = xxhash64(_)): DataFrame = {
    // same skinny-candidate shape as nearDupPairs: spread the hash
    // compute, explode (id, quarter, key) only, verify by id re-join
    val sigs = cache.track(df
      .select(col(idCol).as("id"), col(textCol).as("__text"))
      .repartition(col("id"))
      .select(col("id"),
        transform(tokens(col("__text")), tokenHash).as("__h"))
      .select(col("id"), simhashFromHashes(col("__h")).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val cand = sigs
      .withColumn("q", explode(array((0 until 4).map(j =>
        struct(lit(j).as("b"),
          shiftright(col("sh"), j * 16).bitwiseAND(lit(0xFFFFL)).as("k"))): _*)))
      .select(col("id"), col("q.b").as("b"), col("q.k").as("k"))
    cand.as("a")
      .join(cand.as("b").hint("shuffle_hash"),
        col("a.b") === col("b.b") && col("a.k") === col("b.k") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
      .join(sigs.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        hammingDist(col("sh_a"), col("sh_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** LSH banding TUNING report — "which (bands, rowsPerBand) do I run
    * on THIS corpus?" answered with measurements instead of folklore.
    * For each candidate config (all sharing the `numHashes` signature
    * budget: bands·rowsPerBand == numHashes), the report computes over
    * a deterministic corpus sample's EXACT pairwise Jaccards:
    *
    *  - `j50_micro`: the config's S-curve midpoint (1/b)^(1/r) — pairs
    *    above it mostly collide, below mostly don't;
    *  - `n_pairs` / `n_above`: sample pairs and how many are true
    *    positives at `targetJaccardMicro`;
    *  - `recall_micro`: expected banding recall on the true positives —
    *    mean of p(j) = 1 − (1 − j^r)^b, the exact collision probability
    *    of MinHash banding (expectation over the hash draw);
    *  - `fp_micro`: the same mean over the below-threshold pairs — the
    *    expected false-candidate rate the verify join must absorb;
    *  - `exp_candidates_micro`: Σ p(j) — expected candidate volume on
    *    the sample (scale by (corpus/sample)² for a sizing estimate).
    *
    * Engine-exactness: p(j) is built by LEFT-ASSOCIATIVE repeated
    * multiplication (no pow/libm — the EWMA rule) from the exact
    * rational Jaccard, rounded to integer micros PER PAIR before any
    * aggregate; the ratio reports use integral division — every number
    * replays bit-for-bit in the `dedup_lsh_tuning` oracle.
    *
    * Scale shape: the sample is `TakeOrderedAndProject` over
    * sha256(id) (deterministic, unbiased, no global sort) and is
    * BOUNDED by a named guard — the all-pairs Jaccard is sample²,
    * never corpus²; per-pair config math is scan-side; one
    * group-by-config aggregate ends the plan. Null-text docs are
    * excluded from the sample (they carry no shingles to tune on).
    * The report always carries one row per config: a sample with no
    * pairs at all (e.g. one non-null doc) reports n_pairs = 0 and
    * null recall/fp rather than returning an empty frame. */
  def lshTuningReport(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int, configs: Seq[(Int, Int)],
      targetJaccardMicro: Long = 800000L, shingleN: Int = 3,
      sampleSize: Int = 200): DataFrame = {
    require(configs.nonEmpty, "lshTuningReport: no configs")
    configs.foreach { case (b, r) =>
      require(b >= 1 && r >= 1 && b * r == numHashes,
        s"lshTuningReport: config (bands=$b, rowsPerBand=$r) must " +
          s"satisfy bands*rowsPerBand == numHashes=$numHashes")
    }
    require(sampleSize >= 2 && sampleSize <= 1000,
      s"lshTuningReport: sampleSize must be in [2, 1000] (the report " +
        s"brute-forces sample^2 pairs), got $sampleSize")
    val sample = df.where(col(textCol).isNotNull)
      .select(col(idCol).as("id"), col(textCol).as("__text"))
      .orderBy(sha2(col("id").cast("string"), 256), col("id"))
      .limit(sampleSize)
    val sh = sample.select(col("id"),
      array_distinct(shingles(col("__text"), shingleN)).as("__sh"))
    val pairs = sh.as("a")
      .join(sh.as("b"), col("a.id") < col("b.id"))
      .select((size(array_intersect(col("a.__sh"), col("b.__sh")))
          .cast(DoubleType) /
        size(array_union(col("a.__sh"), col("b.__sh"))).cast(DoubleType))
        .as("__j"))
    val cfgCols = configs.map { case (b, r) =>
      val jr = (0 until r).foldLeft(lit(1.0))((acc, _) => acc * col("__j"))
      val nomiss = (0 until b).foldLeft(lit(1.0))((acc, _) =>
        acc * (lit(1.0) - jr))
      struct(lit(b).as("bands"), lit(r).as("rows_per_band"),
        lit(math.round(math.pow(1.0 / b, 1.0 / r) * 1e6)).as("j50_micro"),
        round((lit(1.0) - nomiss) * lit(1e6)).cast(LongType).as("p_micro"))
    }
    val perConfig = pairs
      .select(explode(array(cfgCols: _*)).as("c"),
        (round(col("__j") * lit(1e6)).cast(LongType) >=
          lit(targetJaccardMicro)).as("__above"))
      .select(col("c.bands").as("bands"),
        col("c.rows_per_band").as("rows_per_band"),
        col("c.j50_micro").as("j50_micro"), col("c.p_micro").as("__p"),
        col("__above"))
      .groupBy(col("bands"), col("rows_per_band"), col("j50_micro"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("__above"), 1L).otherwise(0L)).as("n_above"),
        sum(when(col("__above"), col("__p")).otherwise(0L)).as("__pa"),
        sum(when(!col("__above"), col("__p")).otherwise(0L)).as("__pb"),
        sum(col("__p")).as("exp_candidates_micro"))
      .select(col("bands"), col("rows_per_band"), col("j50_micro"),
        col("n_pairs"), col("n_above"),
        expr("CASE WHEN n_above > 0 THEN __pa div n_above END")
          .as("recall_micro"),
        expr("CASE WHEN n_pairs - n_above > 0 THEN __pb div " +
          "(n_pairs - n_above) END").as("fp_micro"),
        col("exp_candidates_micro"))
    // the report contract is ONE ROW PER CONFIG even when the sample
    // yields no pairs (e.g. a single non-null doc): left-join the
    // config list against the pair aggregate so empty configs report
    // n_pairs = 0 with null recall/fp instead of vanishing
    val cfgFrame = df.sparkSession
      .createDataFrame(configs.map { case (b, r) =>
        (b, r, math.round(math.pow(1.0 / b, 1.0 / r) * 1e6)) })
      .toDF("bands", "rows_per_band", "j50_micro")
    cfgFrame.join(broadcast(perConfig),
        Seq("bands", "rows_per_band", "j50_micro"), "left")
      .na.fill(0L, Seq("n_pairs", "n_above", "exp_candidates_micro"))
  }

  /** n-gram decontamination: for every corpus doc, count the DISTINCT
    * word n-grams it shares with ANY benchmark doc — the standard
    * train/test-overlap check run before pretraining (drop or flag docs
    * with `shared_ngrams > 0`). Scale shape: both sides explode to
    * skinny (id, shingle-hash) pairs — distinct per side, inner-joined
    * on the 64-bit hash (fixed-width key, never the string), then one
    * groupBy on the corpus id. The benchmark side is typically tiny
    * relative to the corpus; Catalyst broadcasts it when its stats
    * allow. Every corpus doc is returned (left join), `shared_ngrams =
    * 0` for clean docs. Joining on hashes rather than strings is exact
    * up to 64-bit collisions (~2⁻⁶⁴ per candidate pair) — the
    * `text_decontaminate` oracle re-derives the counts from the strings
    * and has never disagreed. */
  def ngramContamination(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int = 13): DataFrame = {
    val nf = org.apache.spark.sql.graftnative.NativeFunctions
    // zero-token docs produce NO grams (the kernel's empty-input
    // fallback is a constant hash — a zero-token corpus doc would
    // otherwise "share" it with a zero-token benchmark doc and flag
    // false contamination); they still return shared_ngrams = 0
    // through the left join
    def grams(df: DataFrame, id: String): DataFrame = df
      .select(col(id), tokens(col(textCol)).as("__tk"))
      .where(size(col("__tk")) > 0)
      .select(col(id), explode(array_distinct(
        nf.shingleHashes(col("__tk"), n))).as("__g"))
    val corpusGrams = grams(corpus, idCol)
    val benchGrams  = grams(benchmark, idCol)
      .select(col("__g")).distinct()
    val hits = corpusGrams.join(benchGrams, Seq("__g"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("shared_ngrams"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .na.fill(0L, Seq("shared_ngrams"))
  }

  /** [[ngramContamination]] with a bloom prefilter on the corpus grams —
    * the composition for benchmark sets too large to broadcast: a sketch
    * of the distinct benchmark gram hashes is probed scan-side, so only
    * grams that MIGHT be contaminated (true hits + fpp sliver) enter the
    * shuffle join at all; the join then removes the false positives, and
    * clean grams never shuffle. Result is EXACT — identical to
    * [[ngramContamination]] at any fpp — because a gram the sketch rules
    * out could only have contributed zero to the join anyway. Shuffle
    * volume drops from |corpus grams| to ~(contaminated + fpp·|corpus
    * grams|); the corpus is still scanned once. */
  def ngramContaminationBloom(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int = 13,
      fpp: Double = 1e-3,
      cache: CacheHandle = CacheHandle.unmanaged): DataFrame = {
    val bloom = org.apache.spark.sql.graftnative.BloomSketch
    val nf = org.apache.spark.sql.graftnative.NativeFunctions
    // zero-token docs produce no grams (ngramContamination contract)
    def grams(df: DataFrame): DataFrame = df
      .select(col(idCol), tokens(col(textCol)).as("__tk"))
      .where(size(col("__tk")) > 0)
      .select(col(idCol), explode(array_distinct(
        nf.shingleHashes(col("__tk"), n))).as("__g"))
    val benchGrams = cache.track(grams(benchmark)
      .select(col("__g")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val nBench = math.max(benchGrams.count(), 1L)
    val bytes = bloom.buildBytes(benchGrams, col("__g"), nBench, fpp)
    val hits = grams(corpus)
      .where(bloom.mightContain(bytes, col("__g")))
      .join(benchGrams, Seq("__g"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("shared_ngrams"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .na.fill(0L, Seq("shared_ngrams"))
  }

  /** Bloom-filter decontamination: drop every corpus row whose `keyCol`
    * appears in `deny(denyKeyCol)` — EXACT result, bloom-accelerated.
    * The key-level complement of [[ngramContamination]] for deny-lists
    * (benchmark fingerprints, opt-out ids, blocked URLs) too large to
    * broadcast as a join hash table.
    *
    * Scale shape: a plain anti-join at 100 TB shuffles the whole corpus
    * on the key. Here a bloom sketch of the deny keys (distributed
    * build, numBits/8 bytes on the driver) is probed scan-side inside
    * codegen: rows the sketch rules out are kept with ZERO shuffle —
    * that is all rows except true hits + an `fpp` sliver — and only the
    * sliver flows into an exact anti-join that removes the true hits
    * and re-admits the false positives. The corpus is scanned twice
    * (both branches of the probe), the cheap currency; the shuffle
    * shrinks from |corpus| to ~(hits + fpp·|corpus|). Result equals the
    * plain anti-join row-for-row regardless of fpp.
    *
    * The deny side is counted once (driver scalar) to size the sketch —
    * the deny list is the small side by contract, the sketch its
    * compressed broadcast form (~1.2 GB per 10⁹ keys at fpp 1e-3). */
  def bloomDecontaminate(corpus: DataFrame, deny: DataFrame,
      keyCol: String, denyKeyCol: String, fpp: Double = 1e-3,
      cache: CacheHandle = CacheHandle.unmanaged): DataFrame = {
    val bloom = org.apache.spark.sql.graftnative.BloomSketch
    val denyKeys = cache.track(deny
      .select(col(denyKeyCol).as("__deny_key"))
      .where(col("__deny_key").isNotNull)
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val n = math.max(denyKeys.count(), 1L) // also materializes the cache
    val bytes = bloom.buildBytes(denyKeys, col("__deny_key"), n, fpp)
    val maybe = bloom.mightContain(bytes, col(keyCol))
    // definite-clean branch: codegen'd probe, no shuffle, no join
    val clean = corpus.where(!maybe || col(keyCol).isNull)
    // candidate sliver: exact anti-join kills true hits, keeps FPs
    val candidates = corpus.where(maybe && col(keyCol).isNotNull)
      .join(denyKeys, col(keyCol) === col("__deny_key"), "left_anti")
    clean.unionAll(candidates)
  }

  // ---- incremental (batch-vs-history) dedup ---------------------------
  /** Signature index over a historical corpus: one row per doc with the
    * 256-bit exact content key, hashed shingle set, and MinHash-LSH band
    * keys. This is what a daily-ingest pipeline PERSISTS (parquet, next
    * to the corpus): re-scanning 100 TB of history text per batch is the
    * thing it exists to avoid — the index is a few percent of corpus
    * bytes and carries everything both dedup layers of
    * [[incrementalDedup]] need. */
  def buildDedupIndex(history: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 64, bands: Int = 32, shingleN: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val nf = org.apache.spark.sql.graftnative.NativeFunctions
    // zero-token history docs keep their EXACT content key (layer b of
    // incrementalDedup still works on true empties) but get NO band
    // keys — they must not near-match zero-token batch docs via the
    // kernel's constant empty-input fallback shingle (r16 contract)
    // two select steps so the shingle kernel — the dominant cost of an
    // index build — is evaluated ONCE per row and the minhash reads the
    // projected column (r16 advice: the single-select form re-invoked
    // shingleHashes inside the when() branch, doubling the work)
    history
      .withColumn("__tk", tokens(col(textCol)))
      .select(col(idCol).as("hist_id"),
        contentKey(col(textCol)).as("ckey"),
        nf.shingleHashes(col("__tk"), shingleN).as("sh"),
        (size(col("__tk")) > 0).as("__nonempty"))
      .select(col("hist_id"), col("ckey"), col("sh"),
        when(col("__nonempty"), bandKeys(
          nf.minhashFromLongs(col("sh"), numHashes),
          bands, numHashes / bands))
          .otherwise(array().cast("array<bigint>")).as("bk"))
  }

  /** Incremental dedup — the daily-ingest shape: keep the rows of a NEW
    * batch that survive
    *  (a) exact within-batch keep-first on the content key,
    *  (b) exact anti-join against the history index's content keys,
    *  (c) near-dup rejection against history: candidates are LSH
    *      band-key collisions between batch and index, verified by exact
    *      Jaccard on the hashed shingle sets (≥ `minJaccard` ⇒ drop).
    * Near-dup WITHIN the batch composes with [[nearDupDedup]] upstream.
    *
    * Scale shape: history TEXT is never read — only the index. Layer (b)
    * is one anti-join on a fixed-width key; layer (c) explodes skinny
    * (id, band, key) tuples on both sides and equi-joins on (band, key)
    * — O(n·bands), never batch × history — and the Jaccard verify
    * re-joins shingle sets BY ID for the ~|candidates| rows only. A
    * daily batch is ≪ history, so AQE broadcasts the batch side of the
    * candidate join naturally. */
  def incrementalDedup(batch: DataFrame, index: DataFrame, textCol: String,
      idCol: String, numHashes: Int = 64, bands: Int = 32,
      shingleN: Int = 3, minJaccard: Double = 0.8,
      cache: CacheHandle = CacheHandle.unmanaged): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val nf = org.apache.spark.sql.graftnative.NativeFunctions
    import RowOps._
    // batch signatures, computed once (consumed by layers a+b and c);
    // zero-token rows get no band keys (buildDedupIndex contract) —
    // they still dedup exactly via the content key and SURVIVE layer c
    val sig = cache.track(batch
      .withColumn("__ckey", contentKey(col(textCol)))
      .withColumn("__tk0", tokens(col(textCol)))
      .withColumn("__sh", nf.shingleHashes(col("__tk0"), shingleN))
      .withColumn("__bk", when(size(col("__tk0")) > 0, bandKeys(
        nf.minhashFromLongs(col("__sh"), numHashes), bands,
        numHashes / bands)).otherwise(array().cast("array<bigint>")))
      .drop("__tk0")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val afterExact = sig
      .distinctByFirst(Seq("__ckey"), Seq(col(idCol)))
      .join(index.select(col("ckey")), col("__ckey") === col("ckey"),
        "left_anti")
    val bandsBatch = afterExact
      .select(col(idCol).as("__bid"), posexplode(col("__bk")))
      .select(col("__bid"), col("pos").as("__b"), col("col").as("__k"))
    val bandsHist = index
      .select(col("hist_id"), posexplode(col("bk")))
      .select(col("hist_id"), col("pos").as("__b"), col("col").as("__k"))
    val nearHits = bandsBatch.join(bandsHist, Seq("__b", "__k"))
      .select(col("__bid"), col("hist_id")).distinct()
      .join(afterExact.select(col(idCol).as("__bid"), col("__sh").as("__sha")),
        Seq("__bid"))
      .join(index.select(col("hist_id"), col("sh").as("__shb")),
        Seq("hist_id"))
      .filter(size(array_intersect(col("__sha"), col("__shb")))
          .cast(DoubleType) /
        size(array_union(col("__sha"), col("__shb"))).cast(DoubleType)
          >= minJaccard)
      .select(col("__bid")).distinct()
    afterExact
      .join(nearHits, afterExact(idCol) === nearHits("__bid"), "left_anti")
      .drop("__ckey", "__sh", "__bk")
  }

  /** Hard ceiling on the input row count for [[simhashBruteForcePairs]]:
    * the all-pairs differential is O(n²) by construction and exists only
    * to verify the pigeonhole path on test-scale corpora. Same fail-fast
    * contract as [[Similarity.MaxBroadcastQueries]]. */
  val MaxBruteForceRows: Long = 100000L

  /** All-pairs simhash hamming join — the verification oracle for
    * [[simhashPairs]], DELIBERATELY O(n²). Guarded: refuses more than
    * `maxRows` input rows (limit-bounded count, so the guard never scans
    * an oversized side) — pointing it at a real corpus fails fast instead
    * of launching an n² cross join. `sigs` must carry (`id`, `sh`). */
  def simhashBruteForcePairs(sigs: DataFrame, maxHamming: Int,
      maxRows: Long = MaxBruteForceRows): DataFrame = {
    // guard and broadcast share one materialization (bruteForceTopK's
    // pattern): skinny limit-bounded projection, checkpointed, counted
    val bounded = sigs.select(col("id"), col("sh"))
      .limit(math.min(maxRows + 1, Int.MaxValue).toInt)
      .localCheckpoint()
    val n = bounded.count()
    require(n <= maxRows,
      s"simhashBruteForcePairs: input has > $maxRows rows - the all-pairs " +
        "differential is O(n^2) and test-scoped; use simhashPairs for " +
        "real corpora")
    bounded.as("a").crossJoin(broadcast(bounded.as("b")))
      .filter(col("a.id") < col("b.id") &&
        hammingDist(col("a.sh"), col("b.sh")) <= maxHamming)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
  }

  // ---- embedding cosine near-dup ---------------------------------------
  /** Embedding-cosine near-dup pairs, LSH-bucketed (random hyperplane
    * signatures, banded) — never the all-pairs cross join. See
    * [[Similarity]] for the shared primitives. */
  def embeddingNearDupPairs(df: DataFrame, vecCol: String, idCol: String,
      minCosine: Double = 0.95, planes: Int = 16, bands: Int = 4,
      seed: Long = 42L,
      cache: CacheHandle = CacheHandle.unmanaged): DataFrame = {
    val dim = Similarity.vectorDim(df, vecCol)
    val r = planes / bands
    val vecs = cache.track(df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .repartition(col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val cand = vecs
      .select(col("id"), posexplode(bandKeys(
        Similarity.hyperplaneSignature(col("v"), dim, planes, seed),
        bands, r)))
      .select(col("id"), col("pos").as("b"), col("col").as("k"))
    cand.as("a")
      .join(cand.as("b").hint("shuffle_hash"),
        col("a.b") === col("b.b") && col("a.k") === col("b.k") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
      .join(vecs.select(col("id").as("id_a"), col("v").as("va")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("va"), col("vb")).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  // ---- semantic dedup (SemDeDup composition) ---------------------------
  /** Semantic dedup, the SemDeDup shape (Abbas et al. 2023): cluster the
    * embedding space (k-means cells), find near-duplicate pairs WITHIN
    * each cell, connected-components them, and keep one representative
    * per cluster — the member FARTHEST from its cell centroid (max
    * `score = -cos(v, centroid)`, ties → lowest id), preserving
    * diversity while dropping semantic copies. Composes the three
    * existing pieces: [[graft.ops.Similarity]] centroids/assignment,
    * within-cell pair generation, [[propagateMinLabels]], and the
    * [[clusterRepresentatives]] argmax.
    *
    * Returns (id, cell, cluster, score, kept): every input row labeled
    * with its cell, its semantic cluster (min reachable id; own id when
    * unclustered), its diversity score, and whether it survives.
    *
    * Scale shape: centroids are nlist×dim literals (broadcast by
    * construction, the IVF pattern) — assignment never shuffles the
    * corpus. Pair generation joins on the cell key — ONE hash shuffle of
    * skinny (id, v, cell) rows, never a global cross join; candidate
    * volume is Σ cell². For cells too big for that quadratic,
    * `lshInCell = true` adds banded hyperplane signatures AND-ed into
    * the join key (the [[embeddingNearDupPairs]] move, scoped per cell)
    * — same plan shape, candidates shrink to band collisions, recall
    * follows the LSH curve (exact at cosine ≈ 1 since identical vectors
    * share every band). Propagation touches edge-touched ids only.
    *
    * `kmeansIters > 0` refines centroids with distributed Lloyd
    * ([[Similarity.kmeansCentroids]]); 0 keeps the deterministic sampled
    * seed (engine-independent, the oracle path). */
  def semanticDedup(df: DataFrame, vecCol: String, idCol: String,
      nlist: Int = 8, minCosine: Double = 0.85, kmeansIters: Int = 0,
      lshInCell: Boolean = false, planes: Int = 16, bands: Int = 4,
      seed: Long = 42L, maxIters: Int = 10,
      cache: CacheHandle = CacheHandle.unmanaged): DataFrame = {
    require(nlist >= 1, "semanticDedup: nlist must be >= 1")
    val centroids =
      if (kmeansIters > 0)
        Similarity.kmeansCentroids(df, nlist, kmeansIters, vecCol, idCol)
      else Similarity.sampleCentroids(df, nlist, vecCol, idCol)
    // argmax cell + centroid similarity in one greatest(struct) pass:
    // ties break to the HIGHEST cell index (struct lexicographic max)
    val scored = centroids.zipWithIndex.map { case (ct, i) =>
      struct(Similarity.cosine(col("v"), lit(ct)).as("s"),
        lit(i).as("i"))
    }
    val internal = new CacheHandle
    val assigned = internal.track(
      df.select(col(idCol).as("id"), col(vecCol).as("v"))
        .withColumn("__b",
          if (scored.size > 1) greatest(scored: _*) else scored.head)
        .select(col("id"), col("v"), col("__b.i").as("cell"),
          (-col("__b.s")).as("score"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val cand =
      if (!lshInCell)
        assigned.as("a").join(assigned.as("b").hint("shuffle_hash"),
          col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
            col("a.v").as("va"), col("b.v").as("vb"))
      else {
        val dim = Similarity.vectorDim(df, vecCol)
        val r = planes / bands
        val keyed = assigned.select(col("id"), col("cell"), posexplode(
          bandKeys(Similarity.hyperplaneSignature(col("v"), dim, planes,
            seed), bands, r)))
          .select(col("id"), col("cell"), col("pos").as("bd"),
            col("col").as("k"))
        keyed.as("a")
          .join(keyed.as("b").hint("shuffle_hash"),
            col("a.cell") === col("b.cell") && col("a.bd") === col("b.bd") &&
              col("a.k") === col("b.k") && col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .dropDuplicates("id_a", "id_b")
          .join(assigned.select(col("id").as("id_a"), col("v").as("va")),
            "id_a")
          .join(assigned.select(col("id").as("id_b"), col("v").as("vb")),
            "id_b")
      }
    val pairs = internal.track(cand
      .filter(Similarity.cosine(col("va"), col("vb")) >= minCosine)
      .select(col("id_a"), col("id_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    pairs.count()
    val labels = propagateMinLabels(pairs, maxIters, cache)
    // full labeling: edge-free rows are their own cluster
    val labeled = assigned.select(col("id"), col("cell"), col("score"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), col("cell"),
        coalesce(col("cluster"), col("id")).as("cluster"), col("score"))
    // keep-farthest-from-centroid representative (ties → lowest id)
    val reps = clusterRepresentatives(
      labeled.select(col("id"), col("cluster")), labeled, "id", "score")
      .select(col("cluster"), col("id").as("__rep"))
    val out = labeled.join(reps, Seq("cluster"), "left")
      .select(col("id"), col("cell"), col("cluster"), col("score"),
        (col("id") === col("__rep")).as("kept"))
    // labels are checkpointed (lineage-free); the output recomputes the
    // scan-side assignment on use — nothing big stays pinned
    internal.release()
    out
  }

  // ---- paragraph / span dedup -----------------------------------------
  /** Paragraph-level keep-first dedup (the RefinedWeb/CCNet move: drop a
    * repeated paragraph EVERYWHERE except its first occurrence, so
    * boilerplate shared across documents — headers, licence blocks,
    * navigation chrome — is removed while each document keeps its unique
    * content). "First" is the global (id, position) order, which is
    * deterministic and engine-independent.
    *
    * `splitRegex` cuts the text into paragraphs (default "\n{2,}"); for
    * wall-of-text corpora with no newlines, [[chunkDedup]] fixes the span
    * boundary at every `k` words instead. Reassembly joins kept spans with
    * a single `joiner` — corpus-pipeline convention (exact inter-paragraph
    * whitespace is not preserved).
    *
    * Scale shape: one shuffle clustering identical spans (window over the
    * span content — content-collision-free; swap in a 256-bit key to
    * shuffle hashes instead of text if span text dwarfs it), then one
    * groupBy(id) to reassemble. Both are hash shuffles; no global sort,
    * no cross join, span tuples are skinny (id, idx, span).
    */
  def paragraphDedup(df: DataFrame, textCol: String, idCol: String,
      splitRegex: String = "\n{2,}", joiner: String = "\n\n"): DataFrame =
    spanDedup(df, split(col(textCol), splitRegex), idCol, joiner)

  /** [[paragraphDedup]] with span = every `chunkWords` consecutive words —
    * the span definition that works for corpora without paragraph breaks
    * (and the one the oracle checks on the synthetic docs). */
  def chunkDedup(df: DataFrame, textCol: String, idCol: String,
      chunkWords: Int): DataFrame = {
    require(chunkWords > 0, s"chunkDedup: chunkWords must be > 0")
    // bind the word array to an ATTRIBUTE before the chunk lambda:
    // a captured `split(text)` subtree re-splits the document once
    // per chunk in interpreted HOF eval (the gramsOfTokens finding)
    val prepared = df.select(col(idCol), split(col(textCol), " ")
      .as("__words"))
    val words = col("__words")
    val nChunks = floor((size(words) + lit(chunkWords - 1)) /
      lit(chunkWords)).cast(IntegerType)
    val chunks = transform(sequence(lit(0), greatest(nChunks, lit(1)) - 1),
      i => array_join(slice(words, i * chunkWords + 1, lit(chunkWords)), " "))
    spanDedup(prepared, chunks, idCol, " ")
  }

  /** Core keep-first span dedup over a ready array-of-spans column.
    * Returns (id, text_dedup, n_spans, n_kept). Docs whose spans cell is
    * NULL / empty (or holds only NULL spans) vanish through posexplode;
    * they are restored by a final left join with (text_dedup = "",
    * n_spans = 0, n_kept = 0) rather than by injecting a synthetic empty
    * span — a sentinel would enter the keep-first window and could evict
    * another doc's *genuine* "" span (e.g. from a leading paragraph
    * break). `__idx`/`__span`/`__rn` are reserved helper names; the id
    * column may not use them. */
  def spanDedup(df: DataFrame, spans: Column, idCol: String,
      joiner: String): DataFrame = {
    require(!Set("__idx", "__span", "__rn").contains(idCol),
      s"spanDedup: id column '$idCol' clashes with a reserved helper name")
    val exploded = df
      .select(col(idCol), posexplode(spans).as(Seq("__idx", "__span")))
      .where(col("__span").isNotNull)
    // keep-first mark: rank occurrences of identical span content by the
    // global (id, position) order — rank 1 is the survivor
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__span")).orderBy(col(idCol), col("__idx"))
    val deduped = exploded
      .withColumn("__rn", row_number().over(w))
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("__rn") === 1,
            struct(col("__idx"), col("__span"))))),
          s => s.getField("__span")), joiner).as("text_dedup"),
        count(lit(1)).as("n_spans"),
        sum(when(col("__rn") === 1, 1L).otherwise(0L)).as("n_kept"))
    // restore span-less ids; the extra shuffle moves only the skinny id
    // column and keeps the content pool free of synthetic rows
    df.select(col(idCol)).join(deduped, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** EXACT duplicated-substring detection at token granularity (the
    * "deduplicating training data" span-level pass of Lee et al. 2022,
    * re-expressed for Spark): find every maximal token interval whose
    * every L-token window occurs at least `minCount` times corpus-wide.
    * Sliding L-grams (stride 1 — unlike [[chunkDedup]]'s disjoint
    * chunks, a duplicate is caught at ANY alignment) are counted
    * globally; positions of repeated grams merge into maximal per-doc
    * intervals (overlapping OR adjacent — two abutting duplicated
    * windows chain, so a verbatim copy of a whole n-token document
    * reports as ONE [0, n−1] span, and a doc that repeats its own text
    * twice reports one interval covering both copies: the seam windows
    * are unique but the copies' intervals touch).
    *
    * Output: (id, span_id, start_tok, end_tok, n_tok), span_id 1-based
    * in position order; only documents containing duplicated spans
    * appear (report shape — callers strip or mask with the span list).
    *
    * Scale shape: the corpus tokenizes once and explodes to skinny
    * (gram-key, id, start) triples — the gram itself never moves; keys
    * are 128-bit sha2 prefixes (fixed width; a collision needs 2^64
    * grams, and the oracle re-derives from gram STRINGS to prove the
    * hashed path exact). One count shuffle with map-side partials finds
    * repeated keys; survivors hash-join back (shuffle-hash pinned — the
    * dup-key side is a filtered aggregate, orders of magnitude smaller
    * than the positions side); interval merging is the gaps-and-islands
    * window pair partitioned per doc — no global sort anywhere. */
  def duplicateSpans(df: DataFrame, textCol: String, idCol: String,
      l: Int, minCount: Long = 2): DataFrame = {
    require(l >= 2, "duplicateSpans: l must be >= 2")
    require(minCount >= 2, "duplicateSpans: minCount must be >= 2")
    import org.apache.spark.sql.expressions.Window
    val tk = graft.functions.TextFunctions.tokens(col(textCol))
    val grams = df.select(col(idCol).as("id"), posexplode(
        when(size(tk) >= l,
          transform(
            graft.functions.TextFunctions.gramsOfTokens(tk, l),
            g => substring(sha2(g, 256), 1, 32)))
          .otherwise(array().cast("array<string>")))
        .as(Seq("st", "key")))
    val dupKeys = grams.groupBy(col("key"))
      .agg(count(lit(1)).as("c"))
      .where(col("c") >= minCount)
      .select(col("key"))
    val hits = grams.join(dupKeys.hint("shuffle_hash"), "key")
      .select(col("id"), col("st").cast(LongType).as("st"),
        (col("st") + lit(l - 1)).cast(LongType).as("en"))
    val wPrev = Window.partitionBy(col("id")).orderBy(col("st"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("id")).orderBy(col("st"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spans = hits
      .withColumn("pmax", max(col("en")).over(wPrev))
      .withColumn("brk",
        when(col("pmax").isNull || col("st") > col("pmax") + 1, lit(1L))
          .otherwise(lit(0L)))
      .withColumn("grp", sum(col("brk")).over(wRun))
      .groupBy(col("id"), col("grp"))
      .agg(min(col("st")).as("start_tok"), max(col("en")).as("end_tok"))
    spans
      .withColumn("span_id", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("start_tok"))))
      .select(col("id").as(idCol), col("span_id"),
        col("start_tok"), col("end_tok"),
        (col("end_tok") - col("start_tok") + 1).as("n_tok"))
  }

  /** SURGICAL span-level decontamination: splice out of every corpus
    * document each token interval covered by an L-gram that appears
    * ANYWHERE in the benchmark — the middle ground between
    * [[ngramContamination]] (tag only) and [[bloomDecontaminate]] (drop
    * the whole doc): a crawl page that quotes one eval question loses
    * the quote, not the page. Returns (id, text_clean, n_tok,
    * n_removed), total over the corpus (null text → 0-token row).
    * A doc that IS a benchmark member strips to empty; the seam tokens
    * around an embedded quote survive (their windows straddle out of
    * the quote and aren't benchmark grams).
    *
    * Scale shape: both sides collapse to skinny 128-bit gram keys (the
    * gram string never moves); the benchmark side is distinct grams —
    * eval sets are tiny, so the semi-join resolves broadcast under AQE;
    * corpus-side hits merge per doc to islands (gaps-and-islands
    * windows) and the splice probes the merged interval list only.
    * Corpus text is read once and only flagged docs' token arrays are
    * rebuilt. */
  def decontaminateSpans(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, l: Int): DataFrame = {
    require(l >= 2, "decontaminateSpans: l must be >= 2")
    import org.apache.spark.sql.expressions.Window
    val tk = graft.functions.TextFunctions.tokens(
      coalesce(col(textCol), lit("")))
    def gramsOf(df: DataFrame, withId: Boolean): DataFrame = {
      val g = posexplode(
        when(size(tk) >= l,
          transform(
            graft.functions.TextFunctions.gramsOfTokens(tk, l),
            g => substring(sha2(g, 256), 1, 32)))
          .otherwise(array().cast("array<string>")))
      if (withId)
        df.select(col(idCol).as("id"), g.as(Seq("st", "key")))
      else df.select(g.as(Seq("st", "key"))).select(col("key")).distinct()
    }
    val hits = gramsOf(corpus, withId = true)
      .join(gramsOf(benchmark, withId = false), Seq("key"), "left_semi")
      .select(col("id"), col("st").cast(LongType).as("st"),
        (col("st") + lit(l - 1)).cast(LongType).as("en"))
    val wPrev = Window.partitionBy(col("id")).orderBy(col("st"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("id")).orderBy(col("st"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val islands = hits
      .withColumn("__pmax", max(col("en")).over(wPrev))
      .withColumn("__brk",
        when(col("__pmax").isNull || col("st") > col("__pmax") + 1, lit(1L))
          .otherwise(lit(0L)))
      .withColumn("__grp", sum(col("__brk")).over(wRun))
      .groupBy(col("id"), col("__grp"))
      .agg(min(col("st")).as("st"), max(col("en")).as("en"))
      .groupBy(col("id"))
      .agg(collect_list(struct(col("st"), col("en"))).as("__rm"))
    corpus.select(col(idCol).as("id"), tk.as("__tk"))
      .join(islands, Seq("id"), "left")
      .select(col("id").as(idCol),
        filter(transform(col("__tk"), (t, i) => struct(i.as("p"), t.as("t"))),
          e => col("__rm").isNull || !exists(col("__rm"), r =>
            e.getField("p") >= r.getField("st") &&
              e.getField("p") <= r.getField("en"))).as("__kept"),
        size(col("__tk")).cast(LongType).as("n_tok"))
      .select(col(idCol),
        array_join(transform(col("__kept"), e => e.getField("t")), " ")
          .as("text_clean"),
        col("n_tok"),
        (col("n_tok") - size(col("__kept"))).cast(LongType)
          .as("n_removed"))
  }

  /** The REWRITE side of [[duplicateSpans]]: drop all but one copy of
    * every duplicated substring (Lee et al. 2022 semantics) and return
    * every doc as (id, text_dedup, n_tok, n_removed), text token-joined.
    *
    * Survivorship is decided per duplicated L-GRAM occurrence: rank
    * occurrences of each repeated gram by the global (id, pos) order —
    * rank 1 survives. A token is spliced out iff some redundant
    * (rank > 1) occurrence covers it AND no surviving (rank-1) occurrence
    * does. That gives the right answer for both duplication shapes: a
    * verbatim copy-doc loses its whole text (every covering occurrence is
    * redundant — the original holds all the rank-1s), while a doc that
    * repeats its own text keeps the first copy (its grams are the global
    * firsts) and sheds the second — the seam windows are unique, so they
    * confer no protection. Ties can't happen: (id, pos) is unique per
    * occurrence.
    *
    * Scale shape: same skinny gram pipeline as [[duplicateSpans]] (the
    * gram string never shuffles — 128-bit sha2 keys), one extra window
    * over each repeated key's occurrences (tiny: only duplicated grams),
    * and the splice joins the per-doc covering interval lists (few —
    * they're dup regions) back to flagged docs only; clean docs pass
    * through the left join untouched. */
  def stripDuplicates(df: DataFrame, textCol: String, idCol: String,
      l: Int, minCount: Long = 2): DataFrame = {
    require(l >= 2, "stripDuplicates: l must be >= 2")
    require(minCount >= 2, "stripDuplicates: minCount must be >= 2")
    import org.apache.spark.sql.expressions.Window
    // null text folds to "" so the rewrite is TOTAL — every input id
    // comes back (with n_tok = 0), unlike the report-shaped sibling
    val tk = graft.functions.TextFunctions.tokens(
      coalesce(col(textCol), lit("")))
    val grams = df.select(col(idCol).as("id"), posexplode(
        when(size(tk) >= l,
          transform(
            graft.functions.TextFunctions.gramsOfTokens(tk, l),
            g => substring(sha2(g, 256), 1, 32)))
          .otherwise(array().cast("array<string>")))
        .as(Seq("st", "key")))
    val dupKeys = grams.groupBy(col("key"))
      .agg(count(lit(1)).as("c"))
      .where(col("c") >= minCount)
      .select(col("key"))
    val occ = grams.join(dupKeys.hint("shuffle_hash"), "key")
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("key")).orderBy(col("id"), col("st"))))
      .select(col("id"), col("st").cast(LongType).as("st"),
        (col("st") + lit(l - 1)).cast(LongType).as("en"),
        (col("__rn") === 1).as("keep"))
    // merge each side's occurrence intervals per doc BEFORE the splice
    // (coverage is invariant under union-merge): the containment probe
    // then scans a handful of islands, not raw occurrences — a fully
    // self-duplicated doc has O(tokens) occurrences but O(1) islands,
    // and without this the probe is quadratic in the doc's dup region
    val wPrev = Window.partitionBy(col("id"), col("keep"))
      .orderBy(col("st"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("id"), col("keep"))
      .orderBy(col("st"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val islands = occ
      .withColumn("__pmax", max(col("en")).over(wPrev))
      .withColumn("__brk",
        when(col("__pmax").isNull || col("st") > col("__pmax") + 1, lit(1L))
          .otherwise(lit(0L)))
      .withColumn("__grp", sum(col("__brk")).over(wRun))
      .groupBy(col("id"), col("keep"), col("__grp"))
      .agg(min(col("st")).as("st"), max(col("en")).as("en"))
    val byDoc = islands.groupBy(col("id")).agg(
      collect_list(when(!col("keep"), struct(col("st"), col("en"))))
        .as("__rm"),
      collect_list(when(col("keep"), struct(col("st"), col("en"))))
        .as("__kp"))
    def covered(arr: Column, p: Column): Column =
      exists(arr, r => p >= r.getField("st") && p <= r.getField("en"))
    df.select(col(idCol).as("id"), tk.as("__tk"))
      .join(byDoc, Seq("id"), "left")
      .select(col("id").as(idCol),
        filter(transform(col("__tk"), (t, i) => struct(i.as("p"), t.as("t"))),
          e => col("__rm").isNull ||
            !(covered(col("__rm"), e.getField("p")) &&
              !covered(col("__kp"), e.getField("p")))).as("__kept"),
        size(col("__tk")).cast(LongType).as("n_tok"))
      .select(col(idCol),
        array_join(transform(col("__kept"), e => e.getField("t")), " ")
          .as("text_dedup"),
        col("n_tok"),
        (col("n_tok") - size(col("__kept"))).cast(LongType)
          .as("n_removed"))
  }

  // ---- exact set-similarity join (prefix filtering) -------------------
  /** EXACT set-similarity self-join via prefix filtering (the AllPairs /
    * PPJoin family — Bayardo et al., WWW 2007; Xiao et al., WWW 2008):
    * every unordered pair of docs whose word-token-SET Jaccard is
    * ≥ `threshold`, with NO false negatives — the guarantee banded
    * MinHash ([[nearDupPairs]]) only approaches probabilistically.
    * Returns (id_a, id_b, jaccard) with id_a < id_b. Reference semantics:
    * the pairwise layer under `similarity.kt:31-58`, made total.
    *
    * Candidate generation rests on the prefix-filter lemma: order all
    * tokens by ascending global document frequency (rarest first, ties
    * by token — a total order both engines can reproduce) and keep each
    * doc's first |x| − ceil(t·|x|) + 1 tokens. If jac(a,b) ≥ t then
    * o = |a∩b| ≥ ceil(t·max(|a|,|b|)), and two sets sharing o tokens
    * must share one inside their (|x| − o + 1)-prefixes — the globally
    * smallest common token sits at rank ≤ |x| − o + 1 in both (pigeonhole:
    * all o common tokens order at or after it). So one equi-join on
    * prefix tokens finds every qualifying pair; there is no all-pairs
    * cross join anywhere. The ceil takes a −1e-9 nudge so double
    * rounding can only ever LENGTHEN a prefix, never shorten it below
    * the lemma's requirement.
    *
    * Scale shape (what survives 100 TB):
    *  - frequency order makes prefix tokens the RAREST in the corpus, so
    *    the candidate join buckets are the smallest available ones —
    *    candidate volume is Σ_prefix-token df², which rare-first
    *    minimizes; boilerplate tokens enter a prefix only for docs that
    *    are almost entirely boilerplate; residual hot tokens are
    *    AQE-skew-split in the shuffle-hash join;
    *  - only skinny (token, id, |set|) triples shuffle for candidates,
    *    and the length filter min ≥ t·max (with float-safety slack)
    *    prunes before any set is compared;
    *  - token sets re-join BY ID only for the ~|candidates| verify rows
    *    (the [[nearDupPairs]] discipline);
    *  - the df-count and the per-doc rare-first sort are two aggregations
    *    over exploded (id, token) pairs — linear in corpus tokens, and
    *    the sorted-set frame persists once for prefix generation plus
    *    both verify joins. */
  def setSimilarityJoin(df: DataFrame, textCol: String, idCol: String,
      threshold: Double,
      cache: CacheHandle = CacheHandle.unmanaged,
      tokenMode: String = "word"): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val ex = df.select(col(idCol).as("id"),
        explode(array_distinct(graft.functions.TextFunctions
          .tokensMode(col(textCol), tokenMode))).as("__t"))
    val dfreq = ex.groupBy("__t").agg(count(lit(1)).as("__df"))
    val sorted = cache.track(ex.join(dfreq, "__t")
      .groupBy("id")
      .agg(transform(
        array_sort(collect_list(struct(col("__df"), col("__t")))),
        e => e.getField("__t")).as("__tk"))
      .withColumn("__sz", size(col("__tk")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val prefLen = (col("__sz") -
      ceil(col("__sz") * threshold - lit(1e-9)) + 1).cast(IntegerType)
    val pref = sorted.select(col("id"), col("__sz"),
      explode(slice(col("__tk"), lit(1), prefLen)).as("__t"))
    val cand = pref.as("a")
      .join(pref.as("b").hint("shuffle_hash"),
        col("a.__t") === col("b.__t") && col("a.id") < col("b.id") &&
          least(col("a.__sz"), col("b.__sz")).cast(DoubleType) >=
            greatest(col("a.__sz"), col("b.__sz")) * threshold - lit(1e-6))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .join(sorted.select(col("id").as("id_a"), col("__tk").as("__ta")),
        "id_a")
      .join(sorted.select(col("id").as("id_b"), col("__tk").as("__tb")),
        "id_b")
      .withColumn("__i",
        size(array_intersect(col("__ta"), col("__tb"))).cast(DoubleType))
      .withColumn("jaccard", col("__i") /
        (size(col("__ta")) + size(col("__tb")) - col("__i")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** [[setSimilarityJoin]] with a CHARACTER-level edit-distance refinement:
    * among the exact Jaccard-qualifying pairs, also computes Levenshtein
    * distance on the normalized texts and keeps pairs whose normalized
    * edit similarity 1 − lev/max(len) is ≥ `minEditSim`. Token-set
    * Jaccard is order-blind (it cannot tell "a b c" from "c b a"); the
    * edit layer restores sequence sensitivity, which is how near-dup
    * REVIEW queues rank candidate pairs. Semantics are explicitly "edit
    * filter ON the jaccard-qualifying set", so the composition stays
    * exactly reproducible by any engine with a Levenshtein primitive.
    *
    * Scale shape: the edit distance — the most expensive step — runs
    * ONLY on the ~|qualifying| verified pairs, and texts join in by id
    * at that final stage; the corpus-wide phases never touch
    * character-level comparison. Two bounds keep the per-pair cost
    * honest (found by the unicode-hostile sweep: thousands of
    * IDENTICAL 10k-char docs made the unbounded O(len²) DP the whole
    * job): byte-equal texts short-circuit to distance 0 (a memcmp —
    * and identical texts ARE the common near-dup case), and the DP
    * runs BANDED via the thresholded levenshtein at the only cutoff
    * the filter can keep, ceil((1−minEditSim)·maxCorpusLen) —
    * O((n+m)·band) per pair instead of O(n·m). The corpus max length
    * costs one skinny aggregate (planner-scale driver scalar, the
    * mahalanobis/pca discipline).
    *
    * THIRD bound (found by the hostile-MARKUP sweep, the r15 sibling
    * of the unicode finding): the band itself scales with corpus max
    * length, so NEAR-identical long docs — not caught by the memcmp —
    * cost O(len·band) ∝ len² each; thousands of 16 kB near-dup pairs
    * turned the banded DP back into the whole job. Pairs whose
    * estimated DP cost max(lenA, lenB)·band exceeds `maxDpCells` skip
    * the DP and ship with NULL lev / NULL edit_sim — KEPT in the
    * output as jaccard-qualified but edit-UNVERIFIED (a review queue
    * must see the pair and the flag; silently dropping or silently
    * passing would both lie). The default budget (25M cells, ~10 ms a
    * pair) admits every pair of documents under ~11 kB at
    * minEditSim = 0.8. */
  def editVerifiedPairs(df: DataFrame, textCol: String, idCol: String,
      threshold: Double, minEditSim: Double,
      cache: CacheHandle = CacheHandle.unmanaged,
      maxDpCells: Long = 25000000L): DataFrame = {
    require(maxDpCells >= 1L,
      "editVerifiedPairs: maxDpCells must be >= 1")
    val norm = df.select(col(idCol).as("id"),
      normalizeText(col(textCol)).as("__nt"))
    val maxLen = norm.agg(coalesce(max(length(col("__nt"))), lit(0)))
      .head().getInt(0)
    val band = math.max(1,
      math.ceil((1.0 - minEditSim) * maxLen).toInt)
    setSimilarityJoin(df, textCol, idCol, threshold, cache)
      .join(norm.select(col("id").as("id_a"), col("__nt").as("__na")),
        "id_a")
      .join(norm.select(col("id").as("id_b"), col("__nt").as("__nb")),
        "id_b")
      .withColumn("__cost",
        greatest(length(col("__na")), length(col("__nb")))
          .cast(LongType) * lit(band.toLong))
      .withColumn("lev",
        when(col("__na") === col("__nb"), lit(0L))
          .when(col("__cost") > maxDpCells, lit(null).cast(LongType))
          .otherwise(levenshtein(col("__na"), col("__nb"), band)
            .cast(LongType)))
      // banded DP reports -1 beyond the cutoff: those pairs cannot
      // reach minEditSim for ANY length, drop before the sim division;
      // budget-exceeded pairs (NULL lev) stay — edit-unverified flag
      .filter(col("lev").isNull || col("lev") >= 0L)
      .withColumn("edit_sim", lit(1.0) - col("lev").cast(DoubleType) /
        greatest(length(col("__na")), length(col("__nb")))
          .cast(DoubleType))
      .filter(col("edit_sim").isNull || col("edit_sim") >= minEditSim)
      .select(col("id_a"), col("id_b"), col("jaccard"), col("lev"),
        col("edit_sim"))
  }

  /** First-occurrence NOVELTY scoring (the D4/"data diet" ordering
    * signal): for each document, the fraction of its distinct n-gram
    * shingles whose corpus-wide FIRST occurrence (minimum id) is this
    * document — 10⁶-scaled. A verbatim re-crawl scores 0, fresh content
    * scores 10⁶, quote-heavy pages land between; ordering by id makes
    * the score a deterministic function of the corpus, so re-runs and
    * engines agree exactly. Output: every input row as
    * (id, n_grams, n_novel, novelty_micro) — gram-less docs (null/short
    * text) carry n_grams = 0 and a NULL score, never a fabricated 0
    * (a doc with nothing to judge is not "all duplicate").
    *
    * Scale shape: the corpus tokenizes once and explodes to skinny
    * (128-bit gram key, id) pairs — gram strings never move (the
    * duplicateSpans convention; the oracle re-derives from STRINGS to
    * prove the hashed path exact). One partial-aggregated min shuffle
    * finds each gram's first doc; hits join back shuffle-hash-pinned on
    * the gram key (first-occurrence side ≪ occurrence side after
    * aggregation — sort-merge would sort the big side for nothing);
    * the per-doc rollup is one more skinny shuffle on id. */
  def noveltyScores(df: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 3): DataFrame = {
    require(shingleN >= 1, "noveltyScores: shingleN must be >= 1")
    val tk = graft.functions.TextFunctions.tokens(col(textCol))
    val gramArr = when(size(tk) >= shingleN,
      array_distinct(transform(
        graft.functions.TextFunctions.gramsOfTokens(tk, shingleN),
        g => substring(sha2(g, 256), 1, 32))))
      .otherwise(array().cast("array<string>"))
    val grams = df.select(col(idCol).as("id"),
      explode(gramArr).as("key"))
    val first = grams.groupBy(col("key"))
      .agg(min(col("id")).as("first_id"))
    val perDoc = grams
      .join(first.hint("shuffle_hash"), "key")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_id") === col("id"), 1L).otherwise(0L))
          .as("n_novel"))
    df.select(col(idCol).as("id")).distinct()
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(coalesce(col("n_grams"), lit(0L)) > 0L,
          round(col("n_novel") * lit(1000000.0) / col("n_grams"))
            .cast(LongType))
          .otherwise(lit(null).cast(LongType)).as("novelty_micro"))
  }
}
