package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextFunctions._

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

  // ---- MinHash signatures ----------------------------------------------
  /** k-permutation MinHash signature over word `n`-gram shingles, as one
    * codegen-friendly expression: sig[i] = min over shingles of
    * xxhash64(shingle, i). */
  def minhashSignature(text: Column, numHashes: Int, shingleN: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingles(text, shingleN),
        s => xxhash64(s, i))))

  /** Banded bucket keys from a signature: `bands` buckets of `rowsPerBand`
    * signature slots each; two docs collide iff any band hashes equal. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      j => xxhash64(slice(sig, j * rowsPerBand + 1, lit(rowsPerBand)), j))

  /** Candidate near-dup pairs via MinHash-LSH banding, verified with exact
    * n-gram Jaccard. Returns (id_a, id_b, jaccard) with id_a < id_b.
    *
    * Cost: shuffle #1 groups by (band, bucket) — O(n·bands) rows; pairs
    * are generated only inside buckets; shuffle #2 is the pair dedup.
    */
  def nearDupPairs(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleN: Int = 3,
      minJaccard: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val docs = df.select(col(idCol).as("id"),
        shingles(col(textCol), shingleN).as("sh"),
        minhashSignature(col(textCol), numHashes, shingleN).as("sig"))
      .withColumn("band", explode(
        transform(sequence(lit(0), lit(bands - 1)),
          j => struct(j.as("b"),
            xxhash64(slice(col("sig"), j * r + 1, lit(r)), j).as("k")))))
      .select(col("id"), col("sh"),
        col("band.b").as("b"), col("band.k").as("k"))
    val a = docs.as("a")
    val b = docs.as("b")
    val pairs = a.join(b,
        col("a.b") === col("b.b") && col("a.k") === col("b.k") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    pairs.withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b"))).cast(DoubleType))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** Near-dup dedup: drop every doc that near-matches a smaller-id doc
    * (greedy cluster representative = min id; no transitive closure —
    * documented, same policy most pipeline dedups use). */
  def nearDupDedup(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleN: Int = 3,
      minJaccard: Double = 0.8): DataFrame = {
    val dupIds = nearDupPairs(df, textCol, idCol, numHashes, bands,
      shingleN, minJaccard).select(col("id_b").as(idCol)).distinct()
    df.join(dupIds, Seq(idCol), "left_anti")
  }

  // ---- n-gram Jaccard (direct pairwise verify) ------------------------
  /** Exact n-gram Jaccard similarity between two text columns. */
  def ngramJaccard(a: Column, b: Column, n: Int): Column = {
    val (sa, sb) = (array_distinct(shingles(a, n)), array_distinct(shingles(b, n)))
    size(array_intersect(sa, sb)).cast(DoubleType) /
      size(array_union(sa, sb)).cast(DoubleType)
  }

  // ---- SimHash ---------------------------------------------------------
  /** Per-token 64-bit hashes — materialize this as a column once, then
    * feed [[simhashFromHashes]] (keeps the bit loop from re-tokenizing). */
  def tokenHashes(text: Column): Column =
    transform(tokens(text), t => xxhash64(t))

  /** 64-bit SimHash, pure expression, no UDF: bit j of the result is set
    * iff more token hashes have bit j set than clear (majority vote). The
    * bit loop is unrolled over Scala ints (shift amounts must be
    * literals). */
  def simhashFromHashes(hashes: Column): Column =
    (0 until 64).map { j =>
      val set = size(filter(hashes,
        h => shiftright(h, j).bitwiseAND(1) === 1))
      when(set * 2 > size(hashes), shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  def simhash(text: Column): Column = simhashFromHashes(tokenHashes(text))

  /** Hamming distance between two 64-bit simhashes. */
  def hammingDist(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: docs bucketed by the 4 16-bit quarters of the
    * simhash (pigeonhole: hamming ≤ 3 ⇒ at least one identical quarter),
    * verified by full hamming distance. O(n·4) candidate generation. */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val docs = df
      .select(col(idCol).as("id"), tokenHashes(col(textCol)).as("__h"))
      .select(col("id"), simhashFromHashes(col("__h")).as("sh"))
      .withColumn("q", explode(array((0 until 4).map(j =>
        struct(lit(j).as("b"),
          shiftright(col("sh"), j * 16).bitwiseAND(lit(0xFFFFL)).as("k"))): _*)))
      .select(col("id"), col("sh"), col("q.b").as("b"), col("q.k").as("k"))
    docs.as("a").join(docs.as("b"),
        col("a.b") === col("b.b") && col("a.k") === col("b.k") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hammingDist(col("a.sh"), col("b.sh")).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  // ---- embedding cosine near-dup ---------------------------------------
  /** Embedding-cosine near-dup pairs, LSH-bucketed (random hyperplane
    * signatures, banded) — never the all-pairs cross join. See
    * [[Similarity]] for the shared primitives. */
  def embeddingNearDupPairs(df: DataFrame, vecCol: String, idCol: String,
      minCosine: Double = 0.95, planes: Int = 16, bands: Int = 4,
      seed: Long = 42L): DataFrame = {
    val dim = Similarity.vectorDim(df, vecCol)
    val sigs = Similarity.hyperplaneSignature(col(vecCol), dim, planes, seed)
    val r = planes / bands
    val docs = df.select(col(idCol).as("id"), col(vecCol).as("v"),
        sigs.as("sig"))
      .withColumn("band", explode(
        transform(sequence(lit(0), lit(bands - 1)),
          j => struct(j.as("b"),
            xxhash64(slice(col("sig"), j * r + 1, lit(r)), j).as("k")))))
      .select(col("id"), col("v"), col("band.b").as("b"), col("band.k").as("k"))
    docs.as("a").join(docs.as("b"),
        col("a.b") === col("b.b") && col("a.k") === col("b.k") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        Similarity.cosine(col("a.v"), col("b.v")).as("cosine"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("cosine") >= minCosine)
  }
}
