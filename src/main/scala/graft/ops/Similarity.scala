package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`), per the brief: brute-force cosine top-k as the
  * correctness baseline, and an LSH-bucketed variant as the scale path.
  *
  * Scale design: brute force is O(n·q) — fine when the QUERY side is small
  * enough to broadcast (the common "probe a corpus" case: corpus-partition
  * parallel, no shuffle of the corpus). The LSH path buckets both sides by
  * random-hyperplane signatures so each query only scores its bucket
  * collisions — candidate generation O((n+q)·bands), one shuffle on the
  * bucket key, AQE handles skewed buckets.
  */
object Similarity {

  /** Vector dimension from the schema-declared first row (driver peek at
    * plan time; dimension is a dataset constant). Empty input throws a
    * NAMED guard — the blind head() would surface as an opaque
    * NoSuchElementException when an upstream filter leaves the corpus
    * empty. */
  def vectorDim(df: DataFrame, vecCol: String): Int = {
    val rows = df.where(col(vecCol).isNotNull)
      .select(size(col(vecCol))).take(1)
    require(rows.nonEmpty,
      s"vectorDim: no non-null '$vecCol' vectors - cannot infer the " +
        "embedding dimension (empty input, or the column is all null?)")
    rows.head.getInt(0)
  }

  /** Cosine similarity of two float-array columns, backed by the native
    * codegen'd [[org.apache.spark.sql.graftnative.CosineSimilarity]] expression: dot and both
    * norms accumulate in ONE fused loop, per-element promoted to double
    * (float products lose ~1e-7 relative accuracy — enough to flip top-k
    * ranks between engines). */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graftnative.NativeFunctions.cosineSimilarity(a, b)

  /** Per-key embedding centroids as skinny (key, dim, value) rows —
    * per-source/cluster mean vectors for drift detection, IVF seeding,
    * and class prototypes. posexplode → ONE shuffle of (key, dim, float)
    * triples with full map-side partial averaging; output cardinality is
    * keys × dim, never corpus-sized. Elements promote to double BEFORE
    * the mean (float partial sums drift between engines). */
  def centroidsBy(df: DataFrame, vecCol: String, keyCol: String)
      : DataFrame =
    df.select(col(keyCol), posexplode(col(vecCol)))
      .groupBy(col(keyCol), col("pos").as("dim"))
      .agg(avg(col("col").cast("double")).as("centroid"))

  /** Deterministic pseudo-random hyperplanes (seeded at plan build — no
    * runtime randomness) packed as a literal matrix; signature bit i =
    * sign(v · plane_i). Returns an array<int> of 0/1. */
  def hyperplaneSignature(v: Column, dim: Int, planes: Int, seed: Long)
      : Column = {
    val rnd = new scala.util.Random(seed)
    val mat = Array.fill(planes, dim)(rnd.nextGaussian())
    val bits = (0 until planes).map { i =>
      val plane = lit(mat(i).map(_.toFloat))
      val dot = aggregate(zip_with(v, plane, (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x)
      when(dot >= 0, 1).otherwise(0)
    }
    array(bits: _*)
  }

  /** Deterministic INTEGER-EXACT hyperplane signature: plane p's
    * components are Rademacher ±1 signs from pure integer hash parity
    * (the [[randomProjection]] formula — no RNG, no libm), and the dot
    * product runs over the vector's exact integer MICRO values
    * (round(x·1e6) per element), so bit p = (Σ_j ±micro_j >= 0) is an
    * exact BIGINT comparison any engine reproduces bit-for-bit —
    * float summation order can never flip a signature bit. Random sign
    * vectors are a standard sign-LSH family (collision probability
    * 1 − θ/π like Gaussian planes, Charikar 2002 applies to any
    * symmetric distribution); the payoff over the Gaussian default is
    * a full SQL replay of the banding pipeline (the `sim_lsh_topk`
    * oracle). Scan-side only — no shuffle, no UDF. */
  def hyperplaneSignatureHash(v: Column, planes: Int): Column = {
    val micro = transform(v, x =>
      round(x.cast(DoubleType) * lit(1e6)).cast(LongType))
    val idx = sequence(lit(0), size(v) - 1)
    val bits = (0 until planes).map { p =>
      val dot = aggregate(
        zip_with(micro, idx, (m, j) =>
          m * when(((j.cast(LongType) * lit(73856093L) +
            lit(p.toLong) * lit(19349663L)) % lit(1000003L)) %
            lit(2L) === 0L, lit(1L)).otherwise(lit(-1L))),
        lit(0L), (a, x) => a + x)
      when(dot >= 0L, 1).otherwise(0)
    }
    array(bits: _*)
  }

  /** True iff every element of the vector is finite — no NaN, no ±Inf.
    * The numeric-hostile sweep's finding: a single poisoned embedding
    * (a bad upstream encoder emits NaN; an overflowed normalization
    * emits Inf) would kill a whole 100 TB job at the integer
    * micro-quantization casts under ANSI. Operators whose outputs are
    * exact integers adopt ONE documented contract instead: ranking
    * operators (lshTopK, mmrRerank) EXCLUDE non-finite vectors at
    * ingress like nulls (a NaN vector has no meaningful angle to
    * anything), and per-row codecs (quantizeInt8, randomProjection)
    * return NULL outputs for them (row preserved, output typed-null —
    * the mahalanobisScores NaN convention). Finite-but-absurd
    * magnitudes (|x|·1e6 beyond long range, i.e. |x| > ~9.2e12) still
    * fail loud in ANSI — embeddings live in [-1, 1]·norm scales and a
    * silent clamp would corrupt signatures. */
  def vecFinite(c: Column): Column =
    forall(c, x => !isnan(x.cast(DoubleType)) &&
      abs(x.cast(DoubleType)) =!= lit(Double.PositiveInfinity))

  /** Hard ceiling on the broadcast-side row count for [[bruteForceTopK]]:
    * beyond this, the query-side broadcast risks driver OOM and the O(n·q)
    * score dominates — use [[lshTopK]] / [[ivfTopK]] instead. */
  val MaxBroadcastQueries: Long = 100000L

  /** Brute-force cosine top-k: every query row scored against every corpus
    * row. The query side is broadcast — ENFORCED small (≤
    * [[MaxBroadcastQueries]] rows, checked with a cheap limit-bounded
    * count so the guard never scans an oversized side); per-query top-k
    * via window on the scored pairs. The correctness baseline for the LSH
    * path. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    // The guard and the broadcast share ONE materialization: the skinny
    // (id, vec) projection is limit-bounded, localCheckpoint'ed (eager),
    // then counted — an expensive query-side plan (joins/LSH upstream)
    // runs once, not once per consumer. Checkpoint blocks are freed by
    // the ContextCleaner when the frame is GC'd.
    val qSel = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .limit((MaxBroadcastQueries + 1).toInt)
      .localCheckpoint()
    val qCount = qSel.count()
    require(qCount <= MaxBroadcastQueries,
      s"bruteForceTopK: query side has > $MaxBroadcastQueries rows - " +
        "broadcasting it would OOM the driver; use lshTopK or ivfTopK " +
        "for large query sets")
    // qCount ≤ the limit bound, so the limited frame IS the full query set
    val scored = corpus.as("c")
      .crossJoin(broadcast(qSel))
      .select(col("query_id"), col(s"c.$idCol").as("neighbor_id"),
        cosine(col(s"c.$vecCol"), col("qv")).as("cosine"))
      .filter(col("query_id") =!= col("neighbor_id"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Hard-negative mining for contrastive training: for each anchor
    * (query) row, the k corpus rows MOST similar by cosine whose
    * `labelCol` DIFFERS from the anchor's — the near-misses that teach a
    * retriever the decision boundary, where random negatives teach
    * nothing. Same broadcast contract as [[bruteForceTopK]] (anchors ≤
    * [[MaxBroadcastQueries]], enforced with the limit-bounded count):
    * the corpus never shuffles for scoring; the label-mismatch filter
    * prunes candidates BEFORE the per-anchor top-k window, so positives
    * never ride the shuffle either. For anchor sets past the broadcast
    * bound, run [[lshTopK]]/[[ivfTopK]] with an over-fetched k and
    * filter labels after — same semantics, LSH recall curve. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id",
      labelCol: String = "label"): DataFrame = {
    require(k > 0, "hardNegatives: k must be > 0")
    val qSel = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        col(labelCol).as("anchor_label"))
      .limit((MaxBroadcastQueries + 1).toInt)
      .localCheckpoint()
    val qCount = qSel.count()
    require(qCount <= MaxBroadcastQueries,
      s"hardNegatives: anchor side has > $MaxBroadcastQueries rows - " +
        "broadcasting it would OOM the driver; over-fetch with lshTopK/" +
        "ivfTopK and filter labels instead")
    val scored = corpus.as("c")
      .crossJoin(broadcast(qSel))
      .filter(col(s"c.$labelCol") =!= col("anchor_label"))
      .select(col("query_id"), col("anchor_label"),
        col(s"c.$idCol").as("neighbor_id"),
        col(s"c.$labelCol").as("neighbor_label"),
        cosine(col(s"c.$vecCol"), col("qv")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** LSH-bucketed top-k: both sides signed with the same hyperplanes,
    * banded; candidates = bucket collisions only. Recall < 1.0 by design —
    * raise `bands`/lower `rowsPerBand` to trade cost for recall.
    * `deterministicPlanes = true` swaps the seeded Gaussian planes for
    * [[hyperplaneSignatureHash]]'s integer-exact Rademacher signs — same
    * sign-LSH family and query shape, engine-replayable signatures.
    * Those planes are FIXED by construction (that is what makes the
    * signatures engine-replayable): `seed` does not vary them, so a
    * non-default seed under `deterministicPlanes` is rejected with a
    * named error rather than silently returning identical signatures —
    * callers wanting independent plane draws use the seeded Gaussian
    * path. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id",
      planes: Int = 16, bands: Int = 8, seed: Long = 42L,
      deterministicPlanes: Boolean = false): DataFrame = {
    require(planes % bands == 0, "bands must divide planes")
    require(!deterministicPlanes || seed == 42L,
      "lshTopK: seed is not used when deterministicPlanes=true (the " +
        "integer Rademacher planes are fixed by construction - that " +
        "fixity is what makes signatures engine-replayable); pass " +
        "deterministicPlanes=false for independent seeded plane draws")
    lazy val dim = vectorDim(corpus, vecCol)
    val r = planes / bands
    def sig: Column =
      if (deterministicPlanes) hyperplaneSignatureHash(col(vecCol), planes)
      else hyperplaneSignature(col(vecCol), dim, planes, seed)
    // skinny candidates: only (id, band, key) rides the bucket join; the
    // vectors are re-joined by id for the |candidates| cosine evaluations.
    // Non-finite vectors are excluded at ingress (vecFinite contract)
    def buckets(in: DataFrame, id: String): DataFrame =
      in.where(col(vecCol).isNotNull && vecFinite(col(vecCol)))
        .repartition(col(idCol))
        .select(col(idCol).as(id),
          posexplode(graft.ops.Dedup.bandKeys(sig, bands, r)))
        .select(col(id), col("pos").as("b"), col("col").as("k"))
    val cand = buckets(queries, "query_id")
      .join(buckets(corpus, "neighbor_id").hint("shuffle_hash"), Seq("b", "k"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cand
      .join(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
        "query_id")
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
        "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF-style coarse quantization alternative: assign each vector to its
    * nearest of `nlist` centroids (centroids = deterministic sample of the
    * corpus), probe only matching cells. Centroid assignment is a
    * broadcast of nlist vectors — no shuffle of the corpus. */
  def ivfAssign(df: DataFrame, centroids: Seq[Array[Float]],
      vecCol: String = "embedding", as: String = "cell"): DataFrame = {
    require(centroids.nonEmpty,
      "ivfAssign: no centroids (empty corpus upstream?)")
    val scored = centroids.zipWithIndex.map { case (ct, i) =>
      struct(cosine(col(vecCol), lit(ct)).as("s"), lit(i).as("i"))
    }
    df.withColumn(as, greatest(scored: _*).getField("i"))
  }

  /** Deterministic centroid seed: the first `nlist` corpus vectors by id
    * (refined by [[kmeansCentroids]]; the IVF *query shape* — cell
    * assignment + cell-local probe — is identical either way). */
  def sampleCentroids(corpus: DataFrame, nlist: Int,
      vecCol: String = "embedding", idCol: String = "vec_id")
      : Seq[Array[Float]] = {
    val seeds = corpus.where(col(vecCol).isNotNull)
      .orderBy(col(idCol)).limit(nlist).select(col(vecCol))
      .collect().map(_.getSeq[Float](0).toArray).toSeq
    require(seeds.nonEmpty,
      "sampleCentroids: no non-null vectors - no centroids to seed IVF")
    seeds
  }

  /** Distributed Lloyd (spherical k-means) refinement of the IVF
    * centroids, seeded from the deterministic sample. Each iteration is
    * one Spark job: assign every vector to its nearest centroid (the
    * centroids ride along as broadcast literals — no shuffle of the
    * corpus), then per-element means via posexplode — skinny
    * (cell, pos, x) rows through ONE hash shuffle, partial-agg before the
    * exchange. Only the nlist×dim mean matrix (tiny, e.g. 16×64 doubles)
    * is collected per round. Cosine assignment is scale-invariant in the
    * centroid, so the un-normalized mean is the correct spherical-k-means
    * update; a cell that loses all members keeps its previous centroid.
    * At 100 TB this is iters × (one scan + one skinny shuffle) — the same
    * shape MLlib's KMeans uses, with no extra dependency. */
  def kmeansCentroids(corpus: DataFrame, nlist: Int, iters: Int = 3,
      vecCol: String = "embedding", idCol: String = "vec_id")
      : Seq[Array[Float]] = {
    var cts = sampleCentroids(corpus, nlist, vecCol, idCol)
    for (_ <- 0 until iters) {
      val means = ivfAssign(corpus, cts, vecCol)
        .select(col("cell"), posexplode(col(vecCol)))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .collect()
      val next = Array.tabulate(cts.length)(i => cts(i).clone())
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2).toFloat
      }
      cts = next.toSeq
    }
    cts
  }

  /** Multi-probe cell assignment: each row lands in its `nprobe` NEAREST
    * cells (one output row per probed cell). `nprobe = 1` degenerates to
    * [[ivfAssign]]'s argmax. Still a broadcast of nlist centroid literals
    * — no shuffle; the fan-out multiplies only the skinny probe rows. */
  def ivfAssignMulti(df: DataFrame, centroids: Seq[Array[Float]],
      vecCol: String = "embedding", nprobe: Int = 1,
      as: String = "cell"): DataFrame = {
    val scored = array(centroids.zipWithIndex.map { case (ct, i) =>
      struct(cosine(col(vecCol), lit(ct)).as("s"), lit(i).as("i"))
    }: _*)
    // sort_array desc orders struct(s, i) by score descending; take the
    // top nprobe cells and explode to one probe row each
    val top = slice(sort_array(scored, asc = false), 1, nprobe)
    df.withColumn(as, explode(transform(top, x => x.getField("i"))))
  }

  // ---- product quantization (PQ) --------------------------------------
  /** Squared-L2 between two float vectors, accumulated in DOUBLE in list
    * order — both engines fold left over the same elements, so the sum
    * is bit-reproducible (the PQ ranking key). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) *
        (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, d) => acc + d)

  /** Product-quantization codebook (Jégou et al., the IVF-PQ building
    * block): the vector space splits into `m` contiguous subspaces and
    * each learns `ksub` centroids. Deterministic training — subspace j's
    * centroids are the j-th slices of the first `ksub` corpus vectors by
    * id — so an independent engine derives the identical codebook (the
    * oracle path, same convention as [[sampleCentroids]]). `iters > 0`
    * refines every subspace with distributed Lloyd in ONE pass per
    * iteration across ALL subspaces: assign codes scan-side (broadcast
    * codebook literals), posexplode each slice to skinny
    * (subspace, code, pos, x) rows, one partial-averaged hash shuffle,
    * and collect only the m×ksub×d mean matrix (e.g. 8×16×8 ≈ 1k
    * doubles) — the [[kmeansCentroids]] pattern, vectorized over
    * subspaces. Returns codebook(j)(c) = the c-th centroid of
    * subspace j. */
  def pqTrain(corpus: DataFrame, m: Int, ksub: Int,
      vecCol: String = "embedding", idCol: String = "vec_id",
      iters: Int = 0): Seq[Seq[Array[Float]]] = {
    require(m >= 1 && ksub >= 1, "pqTrain: m and ksub must be >= 1")
    val seeds = corpus.where(col(vecCol).isNotNull)
      .orderBy(col(idCol)).limit(ksub)
      .select(col(vecCol)).collect().map(_.getSeq[Float](0).toArray)
    require(seeds.nonEmpty, "pqTrain: no non-null vectors in the corpus")
    val dim = seeds.head.length
    require(dim % m == 0, s"pqTrain: dim $dim not divisible by m=$m")
    val d = dim / m
    var cb: Seq[Seq[Array[Float]]] =
      (0 until m).map(j => seeds.toSeq.map(_.slice(j * d, (j + 1) * d)))
    for (_ <- 0 until iters) {
      // one job updates every subspace: skinny (j, code_j, pos, x) rows
      val means = pqEncode(corpus, cb, vecCol)
        .select(posexplode(col("codes")).as(Seq("j", "code")), col(vecCol))
        .select(col("j"), col("code"), posexplode(
          slice(col(vecCol), col("j") * lit(d) + lit(1), lit(d))))
        .groupBy(col("j"), col("code"), col("pos"))
        .agg(avg(col("col")).as("mean"))
        .collect()
      val next = cb.map(_.map(_.clone()).toArray).toArray
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3).toFloat
      }
      // a code that lost all members keeps its previous centroid
      cb = next.toSeq.map(_.toSeq)
    }
    cb
  }

  /** PQ encoding: each vector compresses to `m` small codes — code j =
    * argmin squared-L2 between the vector's j-th slice and subspace j's
    * centroids (ties → lowest code, via lexicographic struct min). The
    * codebook rides as broadcast literals; encoding is scan-side
    * column work, NO shuffle — at 100 TB this is the point: 4·dim bytes
    * of float per row become m single-byte codes (64× smaller at
    * dim=64/m=8), and downstream ANN scans the codes, not the floats. */
  def pqEncode(df: DataFrame, codebook: Seq[Seq[Array[Float]]],
      vecCol: String = "embedding", as: String = "codes"): DataFrame = {
    val m = codebook.size
    val d = codebook.head.head.length
    val codes = (0 until m).map { j =>
      val sub = slice(col(vecCol), j * d + 1, d)
      val scored = codebook(j).zipWithIndex.map { case (ct, c) =>
        struct(l2sq(sub, lit(ct)).as("d"), lit(c).as("c"))
      }
      (if (scored.size > 1) least(scored: _*) else scored.head)
        .getField("c")
    }
    df.withColumn(as, array(codes: _*))
  }

  /** PQ top-k via asymmetric distance computation (ADC): queries stay
    * full-precision; each query precomputes its m×ksub distance table
    * (squared-L2 from its slice to every subspace centroid), and a
    * corpus row's approximate distance is the sum of m TABLE LOOKUPS
    * selected by its codes — no float vector is ever read at query
    * time. Queries + tables broadcast under the [[MaxBroadcastQueries]]
    * bound (same enforced guard as [[bruteForceTopK]]); the encoded
    * corpus never shuffles; per-query top-k via window on (distance asc,
    * neighbor_id). Approximation error is the quantization error —
    * recall vs brute force is pinned by unit; `m = 1, ksub ≥ corpus`
    * degenerates to exact L2 ranking (also pinned). */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, m: Int = 8,
      ksub: Int = 16, vecCol: String = "embedding",
      idCol: String = "vec_id", trainIters: Int = 0): DataFrame = {
    require(k > 0, "pqTopK: k must be > 0")
    val codebook = pqTrain(corpus, m, ksub, vecCol, idCol, trainIters)
    val d = codebook.head.head.length
    val coded = pqEncode(corpus, codebook, vecCol)
      .select(col(idCol).as("neighbor_id"), col("codes"))
    // per-query ADC table: tab(j)(c) = l2sq(query slice j, centroid c)
    val tab = array((0 until m).map { j =>
      val sub = slice(col("qv"), j * d + 1, d)
      array(codebook(j).map(ct => l2sq(sub, lit(ct))): _*)
    }: _*)
    val qSel = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .limit((MaxBroadcastQueries + 1).toInt)
      .localCheckpoint()
    require(qSel.count() <= MaxBroadcastQueries,
      s"pqTopK: query side has > $MaxBroadcastQueries rows - " +
        "broadcasting it would OOM the driver; route queries through " +
        "ivfTopK cells first")
    val qTab = qSel.select(col("query_id"), tab.as("qtab"))
    val scored = coded
      .crossJoin(broadcast(qTab))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, j) =>
          acc + element_at(element_at(col("qtab"), j + lit(1)),
            element_at(col("codes"), j + lit(1)) + lit(1)))
          .as("adc_dist"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc_dist").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF top-k: the corpus is assigned to its single nearest cell; each
    * query probes its `nprobe` nearest cells (recall/cost knob: probing
    * more cells recovers neighbors that fell across a cell boundary —
    * `nprobe = nlist` is exhaustive and matches brute force exactly).
    * Join on the cell id co-locates candidates — one shuffle, never a
    * cross join; candidate volume scales linearly in `nprobe`.
    * Measured on the sf0.1 embeddings table (2000 vectors, 10 queries,
    * k=5): recall@5 vs brute force = 0.82 (nlist=8) / 0.98 (nlist=16) at
    * nprobe=1 with sampled centroids. `kmeansIters > 0` refines the
    * centroids with distributed Lloyd ([[kmeansCentroids]]) — measured
    * on the SAME data: 0.76 / 0.94, i.e. on near-uniform synthetic
    * embeddings k-means slightly REDUCES recall at equal nprobe
    * (sampled data-point centroids are already balanced here — max/min
    * cell 148/105 vs k-means 140/113 — and cell means are less "spiky"
    * than data points, so more true neighbors straddle boundaries). On
    * real clustered data Lloyd is the standard choice; exhaustive-mode
    * exactness of the k-means path is pinned by the
    * `sim_ivf_kmeans_exhaustive` oracle query. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, vecCol: String = "embedding",
      idCol: String = "vec_id", nprobe: Int = 1,
      kmeansIters: Int = 0): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist,
      s"ivfTopK: nprobe must be in [1, nlist=$nlist], got $nprobe")
    val centroids =
      if (kmeansIters > 0)
        kmeansCentroids(corpus, nlist, kmeansIters, vecCol, idCol)
      else sampleCentroids(corpus, nlist, vecCol, idCol)
    val c = ivfAssign(corpus, centroids, vecCol)
      .select(col("cell"), col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val q = ivfAssignMulti(queries, centroids, vecCol, nprobe)
      .select(col("cell"), col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF-PQ top-k — the composed billion-scale ANN architecture (Jégou
    * et al.'s IVFADC): a coarse quantizer routes every corpus vector to
    * its nearest of `nlist` cells BY SQUARED-L2 (the PQ metric, ties →
    * lowest cell), and PQ encodes each vector's RESIDUAL (v − cell
    * centroid) — residuals concentrate near 0, so the same code budget
    * quantizes them far better than raw vectors. Each query probes its
    * `nprobe` nearest cells and carries a PER-CELL residual ADC table;
    * a candidate's distance is m table lookups, and since both
    * residuals subtract the SAME probed-cell centroid, ADC approximates
    * ‖q − v‖² directly (exactly, at ksub ≥ corpus — the pinned law).
    *
    * Scale shape: cell assignment, residuals, and codes are all
    * scan-side expressions over broadcast centroid literals — the
    * corpus never shuffles to build the index; the candidate join
    * co-locates on the CELL key (one skinny shuffle of
    * (cell, id, codes) rows — the float vectors never move), and the
    * query side (queries × nprobe rows + their m×ksub tables) is
    * broadcast under the enforced bound. Candidate volume is
    * nprobe/nlist of the corpus instead of all of it — the IVF
    * pruning PQ alone lacks — and each candidate costs m lookups
    * instead of a dim-length float scan. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, m: Int = 8, ksub: Int = 16,
      vecCol: String = "embedding", idCol: String = "vec_id",
      trainIters: Int = 0): DataFrame = {
    require(k > 0, "ivfPqTopK: k must be > 0")
    require(nprobe >= 1 && nprobe <= nlist,
      s"ivfPqTopK: nprobe must be in [1, nlist=$nlist], got $nprobe")
    val coarse = sampleCentroids(corpus, nlist, vecCol, idCol)
    val cmat = array(coarse.map(ct => lit(ct)): _*)
    def cellOf(v: Column): Column = {
      val scored = coarse.zipWithIndex.map { case (ct, i) =>
        struct(l2sq(v, lit(ct)).as("d"), lit(i).as("c"))
      }
      (if (scored.size > 1) least(scored: _*) else scored.head)
        .getField("c")
    }
    // float subtraction, same as the oracle replays it
    def residual(v: Column, cell: Column): Column =
      zip_with(v, element_at(cmat, cell + lit(1)), (x, y) => x - y)
    val corpusResid = corpus
      .withColumn("__cell", cellOf(col(vecCol)))
      .withColumn("__resid", residual(col(vecCol), col("__cell")))
    val codebook = pqTrain(corpusResid, m, ksub, "__resid", idCol,
      trainIters)
    val d = codebook.head.head.length
    val coded = pqEncode(corpusResid, codebook, "__resid")
      .select(col("__cell"), col(idCol).as("neighbor_id"), col("codes"))
    val qSel = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .limit((MaxBroadcastQueries + 1).toInt)
      .localCheckpoint()
    require(qSel.count() * nprobe <= MaxBroadcastQueries,
      s"ivfPqTopK: queries x nprobe exceeds $MaxBroadcastQueries - " +
        "broadcasting the probe tables would OOM the driver; shrink the " +
        "query batch")
    // nprobe nearest cells by (distance, cell id) — one probe row each,
    // with its OWN residual and ADC table against that cell's frame
    val qScored = array(coarse.zipWithIndex.map { case (ct, i) =>
      struct(l2sq(col("qv"), lit(ct)).as("d"), lit(i).as("c"))
    }: _*)
    val probes = qSel
      .withColumn("__cell", explode(transform(
        slice(sort_array(qScored, asc = true), 1, nprobe),
        x => x.getField("c"))))
      .withColumn("__qresid", residual(col("qv"), col("__cell")))
    val tab = array((0 until m).map { j =>
      val sub = slice(col("__qresid"), j * d + 1, d)
      array(codebook(j).map(ct => l2sq(sub, lit(ct))): _*)
    }: _*)
    val qTab = probes.select(col("query_id"), col("__cell"),
      tab.as("qtab"))
    val scored = coded.join(broadcast(qTab), Seq("__cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, j) =>
          acc + element_at(element_at(col("qtab"), j + lit(1)),
            element_at(col("codes"), j + lit(1)) + lit(1)))
          .as("adc_dist"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc_dist").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the standard hybrid-
    * retrieval merge: given several per-query rankings of the same
    * candidate space (BM25, embedding ANN, recency, …), score each
    * (query, id) by Σ_lists 1/(k + rank) and re-rank. Robust to
    * incomparable raw scores because only RANKS enter; a candidate
    * missing from a list simply contributes nothing there.
    *
    * Exactness: each list's contribution rounds to integer MICRO units
    * before the sum (the lmScore convention), so fused scores are exact
    * BIGINT sums any engine reproduces; ties break on id ascending.
    * Output: (query_id, id, rrf_micro, fused_rank), topN per query.
    *
    * Scale shape: inputs are already top-k lists — skinny
    * (query_id, id, rank) triples, bounded by queries × k × lists. One
    * union (no shuffle) → one hash aggregation on (query_id, id) → the
    * per-query re-rank window partitions on query_id: candidate sets
    * per query are ≤ k · lists rows, so the window never sees corpus-
    * scale data. */
  def rankFusion(rankings: Seq[DataFrame], k: Int = 60, topN: Int = 10)
      : DataFrame = {
    require(rankings.nonEmpty, "rankFusion: no rankings")
    require(k >= 1, "rankFusion: k must be >= 1")
    require(topN >= 1, "rankFusion: topN must be >= 1")
    val cols = Seq("query_id", "id", "rank")
    val contrib = rankings.map { r =>
      require(cols.forall(r.columns.contains),
        s"rankFusion: each ranking needs columns $cols")
      r.select(col("query_id"), col("id"),
        round(lit(1000000.0) / (lit(k) + col("rank")))
          .cast(LongType).as("c"))
    }.reduce(_ unionByName _)
    val fused = contrib.groupBy(col("query_id"), col("id"))
      .agg(sum(col("c")).as("rrf_micro"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_micro").desc, col("id").asc)
    fused.withColumn("fused_rank", row_number().over(w))
      .filter(col("fused_rank") <= topN)
  }

  /** Symmetric per-vector INT8 quantization (max-abs scaling, the
    * standard embedding-storage compression: 4·dim float bytes → dim
    * byte codes + one scale): code_j = round(x_j / scale · 127),
    * scale = max|x_j|. Returns (idCol, scale, codes, mse_nano) — the
    * reconstruction mean-squared-error Σ(x_j − code_j·scale/127)²/dim
    * rounded to integer NANOS, so the quality audit column is an exact
    * BIGINT any engine reproduces (the raw codes already are integers).
    * Zero/empty vectors carry scale 0 and all-zero codes, never a
    * division blowup.
    *
    * Scale shape: pure scan-side array expressions — no shuffle, no
    * UDF, no collect; floats promote to double before any arithmetic
    * and both the scale fold and the MSE fold are fixed-order
    * (array_max / sequential aggregate), so codes AND audit match
    * bit-for-bit across engines. */
  def quantizeInt8(df: DataFrame, vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val v0 = transform(col(vecCol), x => x.cast(DoubleType))
    // non-finite vectors → null outputs, row preserved (vecFinite doc)
    val v = when(vecFinite(col(vecCol)), v0)
    val scale = array_max(transform(v, x => abs(x)))
    val codes = when(scale.isNull || scale === 0.0,
      transform(v, _ => lit(0).cast("int")))
      .otherwise(transform(v, x =>
        round(x / scale * lit(127.0)).cast("int")))
    val dq = (c: Column) => c.cast(DoubleType) * col("scale") / lit(127.0)
    df.select(col(idCol), round(scale, 6).as("scale_r6"),
        scale.as("scale"), v.as("__v"), codes.as("codes"))
      .withColumn("mse_nano",
        when(size(col("__v")) > 0,
          round(aggregate(
            zip_with(col("__v"), col("codes"),
              (x, c) => (x - dq(c)) * (x - dq(c))),
            lit(0.0), (acc, e) => acc + e) /
            size(col("__v")) * lit(1e9)).cast(LongType))
          .otherwise(lit(null).cast(LongType)))
      .select(col(idCol), col("scale_r6").as("scale"), col("codes"),
        col("mse_nano"))
  }

  /** Johnson–Lindenstrauss random projection to `k` dimensions with a
    * DETERMINISTIC Rademacher (±1) matrix: out_j = Σ_i v_i·s(i,j)/√k,
    * s(i,j) = ±1 from the parity of (i·73856093 + j·19349663) mod
    * 1000003 — pure integer arithmetic any engine replays, no RNG to
    * seed-sync, and the sign matrix never materializes (Achlioptas
    * 2003: ±1 entries preserve pairwise distances within the JL bound
    * just like Gaussians). The cheap dimensionality-reduction front
    * end for ANN/clustering pipelines: 64-d → 16-d cuts every
    * downstream distance computation 4×.
    *
    * Output: (id, dim, proj) with `proj` the k projected coordinates
    * in exact integer TEN-THOUSANDTHS, ','-joined — integers format
    * identically across engines (a raw double string would diverge on
    * scientific notation) and the driver comparator sorts strings.
    * Per-row fold order is fixed (sequential aggregate over the
    * array), so values match bit-for-bit pre-rounding.
    *
    * Scale shape: pure scan-side array expressions — no shuffle, no
    * UDF, no collect; O(d·k) arithmetic per row. */
  def randomProjection(df: DataFrame, vecCol: String = "embedding",
      idCol: String = "vec_id", k: Int = 16): DataFrame = {
    require(k >= 1, s"randomProjection: k must be >= 1, got $k")
    // non-finite vectors → null proj, row preserved (vecFinite doc)
    val v = when(vecFinite(col(vecCol)),
      transform(col(vecCol), x => x.cast(DoubleType)))
    val idx = sequence(lit(0), size(col(vecCol)) - 1)
    val proj = transform(sequence(lit(0), lit(k - 1)), j =>
      round(aggregate(
        zip_with(v, idx, (x, i) =>
          x * when(((i.cast(LongType) * lit(73856093L) +
            j.cast(LongType) * lit(19349663L)) % lit(1000003L)) %
            lit(2L) === 0L, lit(1.0)).otherwise(lit(-1.0))),
        lit(0.0), (a, x) => a + x) /
        sqrt(lit(k.toDouble)) * lit(1e4)).cast(LongType))
    df.select(col(idCol), size(col(vecCol)).cast(LongType).as("dim"),
      when(vecFinite(col(vecCol)),
        concat_ws(",", transform(proj, p => p.cast("string"))))
        .as("proj"))
  }

  /** MAXIMAL MARGINAL RELEVANCE re-ranking (Carbonell & Goldstein
    * 1998): per query, greedily pick `k` of the top-`nCandidates`
    * cosine neighbors maximizing λ·relevance − (1−λ)·max-similarity-
    * to-already-picked — diversified retrieval (RAG contexts that
    * aren't five paraphrases of one passage; training batches that
    * cover the space). Returns (query_id, rank, id, rel_micro,
    * maxsim_micro, score_pico), rank = selection order.
    *
    * Engine-independent greedy: similarities round to integer MICROS
    * once, then every score is the EXACT integer λμ·relμ −
    * (10⁶−λμ)·simμ (pico units, |·| < 10¹² — no float ever enters the
    * argmax) and ties break on ascending id. A float-scored greedy
    * would diverge across engines on near-ties and cascade — the
    * sequential dependence makes MMR the most rounding-sensitive
    * operator in the library.
    *
    * Scale shape: candidate generation is [[bruteForceTopK]] (corpus
    * never shuffles; swap in lshTopK/ivfTopK upstream for huge query
    * sets and feed the result in as `corpus`); after that EVERYTHING
    * runs on the (queries × nCandidates)-sized frame: one self-join
    * for the pair matrix (fan-out nCandidates² per query, bounded by
    * the argument), then k rounds of {anti-join, max-sim rollup,
    * per-query argmax} — each round's pick is checkpointed
    * (queries-sized) so the plan stays linear in k instead of
    * re-deriving every prior round's subplan. */
  def mmrRerank(corpus: DataFrame, queries: DataFrame,
      nCandidates: Int = 20, k: Int = 5, lambdaMicro: Long = 700000L,
      vecCol: String = "embedding", idCol: String = "vec_id",
      cache: graft.core.CacheHandle = graft.core.CacheHandle.unmanaged)
      : DataFrame = {
    require(k >= 1 && nCandidates >= k,
      s"mmrRerank: need nCandidates >= k >= 1, got ($nCandidates, $k)")
    require(lambdaMicro >= 0L && lambdaMicro <= 1000000L,
      s"mmrRerank: lambdaMicro must be in [0, 1e6], got $lambdaMicro")
    import graft.core.CacheHandle
    val internal = new CacheHandle
    // non-finite vectors have no meaningful angle to rank or diversify
    // against — excluded at ingress like nulls (vecFinite contract)
    val corpusF = corpus
      .where(col(vecCol).isNotNull && vecFinite(col(vecCol)))
    val queriesF = queries
      .where(col(vecCol).isNotNull && vecFinite(col(vecCol)))
    val (cand, freeCand) = CacheHandle.checkpointSmall(
      bruteForceTopK(corpusF, queriesF, nCandidates, vecCol, idCol)
        .select(col("query_id"), col("neighbor_id").as("id"),
          round(col("cosine") * lit(1e6)).cast(LongType).as("rel_micro"))
        .join(corpusF.select(col(idCol).as("id"), col(vecCol).as("__v")),
          "id"))
    internal.trackRelease(freeCand)
    val (pair, freePair) = CacheHandle.checkpointSmall(
      cand.as("a").join(cand.as("b"),
        col("a.query_id") === col("b.query_id") &&
          col("a.id") =!= col("b.id"))
        .select(col("a.query_id").as("query_id"), col("a.id").as("id"),
          col("b.id").as("sid"),
          round(cosine(col("a.__v"), col("b.__v")) * lit(1e6))
            .cast(LongType).as("sim_micro")))
    internal.trackRelease(freePair)
    val lam = lit(lambdaMicro)
    val oneMinus = lit(1000000L - lambdaMicro)
    def pickBest(scoredCands: DataFrame, rank: Int): DataFrame =
      scoredCands
        .withColumn("score_pico",
          lam * col("rel_micro") - oneMinus * col("maxsim_micro"))
        .groupBy(col("query_id"))
        // ascending-id tie-break WITHOUT negating the id (a string idCol
        // is valid everywhere else in this API and would die in an
        // unnamed ANSI cast here): negate the exact-integer score
        // instead and take the struct MIN — lowest -score = highest
        // score, ties to the lowest id in the column's natural order
        .agg(min(struct((-col("score_pico")).as("__ns"),
          col("id"), col("rel_micro"), col("maxsim_micro"))).as("__b"))
        .select(col("query_id"), lit(rank).as("rank"),
          col("__b.id").as("id"), col("__b.rel_micro").as("rel_micro"),
          col("__b.maxsim_micro").as("maxsim_micro"),
          (-col("__b.__ns")).as("score_pico"))
    var (selected, freeSel) = CacheHandle.checkpointSmall(
      pickBest(cand.withColumn("maxsim_micro", lit(0L)), 1))
    (2 to k).foreach { step =>
      val remaining = cand.join(selected.select(col("query_id"),
        col("id")), Seq("query_id", "id"), "left_anti")
      val scored = remaining
        .join(pair.join(selected.select(col("query_id"),
            col("id").as("sid")), Seq("query_id", "sid"))
            .groupBy(col("query_id"), col("id"))
            .agg(max(col("sim_micro")).as("maxsim_micro")),
          Seq("query_id", "id"))
      val (next, freeNext) = CacheHandle.checkpointSmall(
        selected.unionByName(pickBest(scored, step)))
      freeSel(false)
      selected = next
      freeSel = freeNext
    }
    internal.release()
    // working frames freed; the final selection's checkpoint blocks
    // belong to the caller (the pageRank lifetime convention)
    cache.trackRelease(freeSel)
    selected.orderBy(col("query_id"), col("rank"))
  }

  // ---- PCA / whitening -------------------------------------------------
  /** Trained PCA model: per-dim mean, `k` principal components (each a
    * dim-length row, eigenvalue-descending, sign-normalized so each
    * component's largest-|·| entry is positive — deterministic across
    * runs), their eigenvalues (population variances along each
    * component), the total variance (covariance trace), and the row
    * count it was fit on. */
  final case class PcaModel(mean: Array[Double],
      components: Seq[Array[Double]], eigenvalues: Array[Double],
      totalVariance: Double, n: Long)

  /** Classical Jacobi eigendecomposition of a symmetric matrix —
    * driver-side, O(dim³)-ish with max-pivot rotations (dim ≤ 512 by
    * the [[graft.functions.Aggregators.CovarianceMoments]] bound, so
    * planner-scale like [[graft.ops.Stats.linearRegressionMulti]]'s
    * k×k solve). Deterministic: pivot = first largest |off-diag| in
    * row-major order. Returns (eigenvalues, eigenvectors as rows). */
  private def jacobiEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val scale = math.max(1e-300,
      (0 until d).map(i => math.abs(a(i)(i))).max)
    val maxRot = 100 * d * d
    var rot = 0
    var done = false
    while (!done) {
      var (p, q, mx) = (0, 1, 0.0)
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) {
          if (math.abs(a(i)(j)) > mx) { p = i; q = j; mx = math.abs(a(i)(j)) }
          j += 1
        }
        i += 1
      }
      if (d < 2 || mx <= 1e-14 * scale) done = true
      else {
        if (rot >= maxRot) throw new IllegalStateException(
          s"pcaTrain: Jacobi did not converge in $maxRot rotations - " +
            "pathological covariance input")
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t =
          if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
          else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        var k = 0
        while (k < d) {
          val akp = a(k)(p); val akq = a(k)(q)
          a(k)(p) = c * akp - s * akq
          a(k)(q) = s * akp + c * akq
          k += 1
        }
        k = 0
        while (k < d) {
          val apk = a(p)(k); val aqk = a(q)(k)
          a(p)(k) = c * apk - s * aqk
          a(q)(k) = s * apk + c * aqk
          val vkp = v(k)(p); val vkq = v(k)(q)
          v(k)(p) = c * vkp - s * vkq
          v(k)(q) = s * vkp + c * vkq
          k += 1
        }
        rot += 1
      }
    }
    val vals = Array.tabulate(d)(i => a(i)(i))
    val vecs = Array.tabulate(d)(i => Array.tabulate(d)(j => v(j)(i)))
    (vals, vecs)
  }

  /** PCA over an embedding column — the whitening / decorrelation /
    * dimensionality-reduction preprocessor (embedding compression
    * before ANN, feature decorrelation before linear probes, the
    * "remove the dominant direction" cleanup for anisotropic encoder
    * outputs).
    *
    * Scale shape: the ENTIRE distributed cost is one scan through
    * [[graft.functions.Aggregators.CovarianceMoments]] — a mergeable
    * flat-buffer aggregate whose partials are 8·(1+dim+dim²) bytes per
    * task regardless of row count (the CountMin discipline); the
    * eigensolve runs driver-side on the dim×dim matrix (planner-scale,
    * the linearRegressionMulti k³ pattern). No explode, no shuffle of
    * vectors, no iteration over the data.
    *
    * Verification: the distributed machinery is pinned by the
    * `sim_pca_verify` oracle row (whitened projections have unit
    * variance and zero cross-covariance IN-PLAN, full-rank projection
    * preserves distances) and by exact hand-case units; the driver
    * eigensolve is law-checked (orthonormality, eigen-equation
    * residual) rather than SQL-replayed — Jacobi rotations are not
    * SQL.
    *
    * Compression honesty: how much similarity structure a k-dim
    * projection keeps tracks the SPECTRUM DECAY of the corpus, not the
    * operator. The synthetic test embeddings are near-isotropic
    * (measured: 32 of 64 dims explain only 65% of variance; cosine
    * top-5 recall through a k=32 projection is ~0.42 at sf0.01), so
    * no PCA-ANN recall floor is registered — real encoder outputs with
    * fast-decaying spectra are where the compression path earns its
    * keep. The pinned contracts are whitening, decorrelation, and
    * rotation-invariance, which hold on ANY spectrum. */
  def pcaTrain(df: DataFrame, vecCol: String = "embedding", k: Int)
      : PcaModel = {
    val dim = vectorDim(df, vecCol)
    require(k >= 1 && k <= dim,
      s"pcaTrain: k must be in [1, dim=$dim], got $k")
    val m = df.where(col(vecCol).isNotNull)
      .select(graft.functions.Aggregators.covarianceMomentsUdaf(dim)(
        col(vecCol)).as("m"))
      .head().getSeq[Double](0).toArray
    val n = m(0)
    require(n >= 2, "pcaTrain: need >= 2 non-null vectors")
    val off = 1 + dim
    val mean = Array.tabulate(dim)(i => m(1 + i) / n)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      val (hi, lo) = if (i >= j) (i, j) else (j, i)
      m(off + hi * dim + lo) / n - mean(i) * mean(j)
    }
    val (vals, vecs) = jacobiEigen(cov)
    val order = (0 until dim).sortBy(i => (-vals(i), i))
    val top = order.take(k)
    val comps = top.map { i =>
      val w = vecs(i)
      // sign convention: largest-|.| entry positive (first on ties)
      val a = w.indices.maxBy(j => (math.abs(w(j)), -j))
      if (w(a) < 0) w.map(x => -x) else w.clone()
    }
    PcaModel(mean, comps, top.map(i => math.max(vals(i), 0.0)).toArray,
      (0 until dim).map(i => cov(i)(i)).sum, n.toLong)
  }

  /** Project (and optionally whiten) an embedding column through a
    * [[PcaModel]]: adds `as` = array&lt;double&gt; of length k, where
    * proj_c = Σⱼ xⱼ·w_cj − ⟨μ, w_c⟩ (the centering folds into a scalar
    * literal, so the per-row work is k broadcast-literal dot products —
    * pure scan-side, no shuffle). `whiten = true` divides each
    * coordinate by √eigenvalue (unit-variance output); a dead direction
    * (eigenvalue ≤ 1e-12) whitens to 0.0 rather than exploding —
    * a zero-variance axis carries no signal to rescale. */
  def pcaProject(df: DataFrame, model: PcaModel,
      vecCol: String = "embedding", whiten: Boolean = false,
      as: String = "proj"): DataFrame = {
    val nf = org.apache.spark.sql.graftnative.NativeFunctions
    val coords = model.components.zipWithIndex.map { case (w, c) =>
      val bias = -w.zip(model.mean).map { case (wi, mi) => wi * mi }.sum
      // native fused dot (codegen) — k interpreted HOF lambda walks per
      // row would dominate the scan at corpus scale
      val dot = nf.dotProduct(col(vecCol), lit(w)) + lit(bias)
      if (!whiten) dot
      else {
        val ev = model.eigenvalues(c)
        if (ev > 1e-12) dot / lit(math.sqrt(ev)) else lit(0.0)
      }
    }
    df.withColumn(as, array(coords: _*))
  }

  /** Embedding-norm audit — ONE row (n, n_zero, min_norm, max_norm,
    * avg_norm, p50_norm, all 6dp): the sanity check before any cosine
    * pipeline (un-normalized vectors silently break cosine-as-dot
    * shortcuts; zero vectors NaN-poison similarity). Each row's L2
    * norm is a fixed-order fold (Σx² left-to-right, then sqrt) rounded
    * 6dp BEFORE the corpus stats, so every engine aggregates identical
    * inputs; p50 is the exact R-7 median.
    *
    * Scale shape: scan-side per-row fold + one aggregate. The exact
    * median sorts norm values (8 bytes/row); `approxP50 = true` swaps
    * it for `approx_percentile` at accuracy 10000 (fixed-size KLL-style
    * sketch partials, rank error ≤ 1e-4 of n) — the
    * `profileTable.approxDistinct` pattern for when even an 8-byte sort
    * is too hot at 100 TB. */
  def normStats(df: DataFrame, vecCol: String = "embedding",
      approxP50: Boolean = false): DataFrame = {
    val v = transform(col(vecCol), x => x.cast(DoubleType))
    val norm = round(sqrt(aggregate(v, lit(0.0), (a, x) => a + x * x)), 6)
    val p50 =
      if (approxP50) approx_percentile(col("__n"), lit(0.5), lit(10000))
      else percentile(col("__n"), lit(0.5))
    df.select(norm.as("__n"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__n") === 0.0, 1L).otherwise(0L)).as("n_zero"),
        min(col("__n")).as("min_norm"), max(col("__n")).as("max_norm"),
        round(avg(col("__n")), 6).as("avg_norm"),
        round(p50, 6).as("p50_norm"))
  }
}
