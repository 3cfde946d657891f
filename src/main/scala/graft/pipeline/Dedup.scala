package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Beyond the reference's relational surface (DISTINCT / GROUP BY —
  * datafusion/optimizer/src/replace_distinct_aggregate.rs): exact dedup,
  * MinHash+LSH banding, SimHash, and exact n-gram Jaccard. Everything is
  * built from codegen'd Column expressions (no UDFs): shingling and
  * signatures are per-row `transform`/`aggregate` lambdas; candidate
  * generation shuffles only (id, band, bandHash) — at 100 TB the raw text
  * never moves, only fixed-size signatures do, and the only quadratic work
  * happens inside an LSH bucket (bounded by design).
  */
object Dedup {

  /** Distinct word n-gram shingles of a text column. */
  def shingles(text: Column, n: Int): Column = {
    val ws = split(text, " ")
    array_distinct(
      transform(sequence(lit(1), greatest(size(ws) - (n - 1), lit(1))),
        i => array_join(slice(ws, i, lit(n)), " ")))
  }

  /** k-wide MinHash signature over a shingle array: sig[i] = min over
    * shingles of xxhash64(i # shingle). One nested codegen'd expression —
    * no explode, no shuffle. */
  def minhashSignature(sh: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(sh,
        s => xxhash64(concat(i.cast("string"), lit("#"), s)))))

  /** Estimated Jaccard from two MinHash signatures: fraction of agreeing
    * positions. */
  def estJaccard(sigA: Column, sigB: Column, k: Int): Column =
    aggregate(zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / k

  /** Exact dedup: one surviving row (min id) per identical text. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash + LSH near-duplicate pairs.
    *
    * Pipeline: shingle → signature (map-side only) → explode `bands` band
    * ids → shuffle on (band, hash(band slice)) → self-join inside buckets
    * → distinct candidate pairs → verify with exact Jaccard on shingle
    * sets. Returns (id_a, id_b, est_jaccard, jaccard) with jaccard ≥
    * threshold.
    */
  def minhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val r = numHashes / bands
    val base = df.select(col(idCol).as("id"),
        shingles(col(textCol), shingleSize).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))

    val banded = base
      .select(col("id"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .select(col("id"), col("band"),
        xxhash64(col("band"), slice(col("sig"), col("band") * r + 1, lit(r)))
          .as("bh"))

    val cand = banded.as("l")
      .join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()

    cand
      .join(base.select(col("id").as("id_a"), col("sh").as("sh_a"),
        col("sig").as("sig_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("sh").as("sh_b"),
        col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(estJaccard(col("sig_a"), col("sig_b"), numHashes), 4)
          .as("est_jaccard"),
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          / size(array_union(col("sh_a"), col("sh_b"))), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 63-bit SimHash over the word array of `textColName` (63, not 64, so
    * the bit-assembly fold can never overflow a signed long under ANSI
    * mode). Raw SQL lambda string because the bit index is a lambda
    * variable (functions.shiftright only takes a literal). */
  def simhash(textColName: String): Column = expr(s"""
    aggregate(
      transform(sequence(0, 62), i ->
        CASE WHEN aggregate(split($textColName, ' '), 0L, (acc, t) ->
               acc + CASE WHEN (shiftright(xxhash64(t), i) & 1L) = 1L
                          THEN 1L ELSE -1L END) > 0
             THEN 1L ELSE 0L END),
      0L, (acc, b) -> acc * 2 + b)""")

  /** SimHash near-duplicate pairs: bucket on any equal 16-bit chunk (a pair
    * within Hamming distance 3 of a 63-bit signature must agree on at least
    * one of 4 chunks), then filter by exact Hamming distance. */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simhash(textCol).as("sig"))
    val chunked = sigs.select(col("id"), col("sig"),
        explode(sequence(lit(0), lit(3))).as("chunk"))
      .select(col("id"), col("sig"), col("chunk"),
        expr("shiftright(sig, CAST(chunk * 16 AS INT)) & 65535L").as("ck"))
    chunked.as("l")
      .join(chunked.as("r"),
        col("l.chunk") === col("r.chunk") && col("l.ck") === col("r.ck") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.sig").as("sig_a"), col("r.sig").as("sig_b"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard pairs (the oracle-able ground truth for the
    * approximate methods): explode shingles, self-join on shingle,
    * jaccard = |∩| / (|A| + |B| - |∩|). Quadratic in docs sharing a
    * shingle — the exact path for verification, not the 100 TB path. */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, threshold: Double = 0.6): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
        explode(shingles(col(textCol), shingleSize)).as("s"))
    val cnt = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(cnt.select(col("id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(cnt.select(col("id").as("id_b"), col("n").as("n_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(col("inter").cast("double")
          / (col("n_a") + col("n_b") - col("inter")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
