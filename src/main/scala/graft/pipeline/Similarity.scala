package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Brute-force cosine top-k is the exact baseline (O(Q·N) — fine when the
  * query set broadcasts); random-hyperplane LSH bucketing is the 100 TB
  * path: signatures are computed map-side from a deterministic projection
  * matrix, candidates meet only inside buckets, and the full N×N product
  * never materializes. The dot products are `zip_with`/`aggregate` lambda
  * expressions — codegen'd, no UDF.
  */
object Similarity {

  /** Cosine similarity of two double arrays as a single expression. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, x) => acc + x * x))
    dot / (na * nb)
  }

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Exact top-k neighbors for each query vector (brute force).
    * `queries` is expected to be small → broadcast; the big side streams. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nvec"))
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qvec"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    c.crossJoin(broadcast(q))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        round(cosine(col("qvec"), col("nvec")), 6).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("cos"))
  }

  /** Deterministic pseudo-random hyperplane weight in [-1, 1] for
    * (salt, plane, dim) — derived from xxhash64, identical on every
    * executor without shipping a matrix. */
  private def planeWeight(salt: Column, plane: Column, dim: Column): Column =
    (pmod(xxhash64(concat(salt.cast("string"), lit("|"),
      plane.cast("string"), lit("_"), dim.cast("string"))),
      lit(2000001L)) - 1000000L).cast("double") / 1000000.0

  /** Random-hyperplane signature: `planes` sign bits packed into a long.
    * `salt` selects an independent plane set (multi-probe rotations). */
  def lshSignature(vec: Column, planes: Int, salt: Column = lit(0)): Column =
    aggregate(
      transform(sequence(lit(0), lit(planes - 1)), p =>
        when(aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1),
            (x, j) => x * planeWeight(salt, p, j)),
          lit(0.0), (acc, x) => acc + x) > 0, 1L).otherwise(0L)),
      lit(0L), (acc, b) => acc * 2 + b)

  /** Sign-bit array (length `planes`) for banding. */
  private def lshBits(vec: Column, planes: Int, salt: Column): Column =
    transform(sequence(lit(0), lit(planes - 1)), p =>
      when(aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, j) => x * planeWeight(salt, p, j)),
        lit(0.0), (acc, x) => acc + x) > 0, 1L).otherwise(0L))

  /** Approximate near-neighbor pairs via BANDED random-hyperplane LSH:
    * candidates collide on any `bandBits`-bit band of any rotation's
    * signature (P[found] = 1-(1-p^bandBits)^(bands·rotations), p =
    * 1-θ/π), then exact cosine verifies, keeping only true positives.
    * The shuffle key is (rot, band, bandHash) — the N×N product never
    * forms; quadratic work is bounded by bucket size. */
  def lshNearPairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      planes: Int = 16, bandBits: Int = 4, rotations: Int = 3,
      threshold: Double = 0.85): DataFrame = {
    require(planes % bandBits == 0, "planes must be divisible by bandBits")
    val bands = planes / bandBits
    val base = corpus.select(col(idCol).as("id"),
      asDouble(col(vecCol)).as("vec"))
    val bucketed = base
      .select(col("id"), col("vec"),
        explode(sequence(lit(0), lit(rotations - 1))).as("rot"))
      .select(col("id"), col("vec"), col("rot"),
        lshBits(col("vec"), planes, col("rot")).as("bits"))
      .select(col("id"), col("vec"), col("rot"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"),
        col("bits"))
      .select(col("id"), col("vec"), col("rot"), col("band"),
        xxhash64(col("rot"), col("band"),
          slice(col("bits"), col("band") * bandBits + 1, lit(bandBits)))
          .as("bucket"))
    bucketed.as("l")
      .join(bucketed.as("r"),
        col("l.rot") === col("r.rot") && col("l.band") === col("r.band") &&
          col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.vec").as("va"), col("r.vec").as("vb"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        round(cosine(col("va"), col("vb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
      .distinct()
  }
}
