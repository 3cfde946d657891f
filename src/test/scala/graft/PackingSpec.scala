package graft

import graft.pipeline.{Chunking, Packing}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Token-stream packing and document chunking properties: the
  * distributed prefix sum must equal the global-window formulation and
  * be partition-count independent; chunk windows must tile documents
  * exactly. */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docs(n: Int) = {
    import spark.implicits._
    // deterministic pseudo-random token counts incl. 0 and budget-sized
    (0 until n).map { i =>
      (i.toLong, ((i * 2654435761L) % 997 + (if (i % 97 == 0) 0 else 1)).abs)
    }.toDF("id", "n")
  }

  test("two-phase prefix sum == global window, any partition count") {
    val df = docs(5000)
    val w = Window.orderBy(col("id")).rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val expected = df.withColumn("tok_end", sum(col("n")).over(w))
      .withColumn("tok_start", col("tok_end") - col("n"))
      .select(col("id"), col("tok_start"), col("tok_end"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    for (parts <- Seq(1, 16)) {
      val got = Packing.packTokenStream(df, "id", "n", budget = 512,
          partitions = parts)
        .select(col("id"), col("tok_start"), col("tok_end"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"partitions=$parts")
    }
  }

  test("sequence ids: contiguous coverage, straddlers span bins") {
    val rows = Packing.packTokenStream(docs(2000), "id", "n", budget = 512)
      .select(col("id"), col("tok_start"), col("tok_end"),
        col("seq_first"), col("seq_last"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    // stream is gapless: each doc starts where the previous ended
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 == a._3, s"gap between ${a._1} and ${b._1}")
    }
    rows.foreach { case (id, s, e, f, l) =>
      assert(f == s / 512, s"doc $id seq_first")
      assert(l == math.max(e - 1, s) / 512, s"doc $id seq_last")
      assert(l >= f)
    }
    // at 997-max token counts over 512-token sequences, straddlers exist
    assert(rows.exists { case (_, _, _, f, l) => l > f })
  }

  test("chunking tiles documents: no overlap=0 token lost or duplicated") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f g"),          // n=7 > chunk
      (2L, "x y z"),                  // n=3 < chunk
      (3L, "p q r s"),                // n=4 == chunk (exact cover)
      (4L, (1 to 100).map("t" + _).mkString(" "))
    ).toDF("doc_id", "text")
    val chunks = Chunking.chunkDocs(df, "text",
        chunkTokens = 4, overlap = 0)
      .orderBy(col("doc_id"), col("chunk_id"))
      .select(col("doc_id"), col("chunk_text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val reassembled = chunks.groupBy(_._1).view
      .mapValues(_.map(_._2).mkString(" ")).toMap
    df.collect().foreach { r =>
      assert(reassembled(r.getLong(0)) == r.getString(1),
        s"doc ${r.getLong(0)} must reassemble")
    }
    // exact-coverage doc yields exactly one chunk, no empty tail
    assert(chunks.count(_._1 == 3L) == 1)
  }

  test("rebalanceToTarget hits the exact mix, bounded by the scarcest class") {
    import spark.implicits._
    val df = (
      (1 to 900).map(i => (i.toLong, "web")) ++
      (1001 to 1300).map(i => (i.toLong, "code")) ++
      (2001 to 2080).map(i => (i.toLong, "books"))).toDF("id", "cls")
    val out = graft.operators.Sampling.rebalanceToTarget(
      df, "cls", "id", Map("web" -> 5, "code" -> 3, "books" -> 2))
    val mix = out.groupBy(col("cls")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // books is scarcest: total = 80*10 div 2 = 400
    assert(mix == Map("web" -> 200L, "code" -> 120L, "books" -> 80L))
    // deterministic: rerun returns the same ids
    val again = graft.operators.Sampling.rebalanceToTarget(
      df, "cls", "id", Map("web" -> 5, "code" -> 3, "books" -> 2))
    assert(out.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      again.select("id").collect().map(_.getLong(0)).sorted.toSeq)
    val err = intercept[IllegalArgumentException] {
      graft.operators.Sampling.rebalanceToTarget(
        df, "cls", "id", Map("web" -> 1, "absent" -> 1)).count()
    }
    assert(err.getMessage.contains("absent"))
  }

  test("temperatureSample: alpha flattens the mix, quotas capped at n") {
    import spark.implicits._
    val df = (
      (1 to 900).map(i => (i.toLong, "web")) ++
      (1001 to 1100).map(i => (i.toLong, "code")) ++
      (2001 to 2004).map(i => (i.toLong, "books"))).toDF("id", "cls")
    val out = graft.operators.Sampling.temperatureSample(
      df, "cls", "id", alpha = 0.5, total = 200)
    val mix = out.groupBy(col("cls")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // sqrt weights: 30 / 10 / 2 over sum 42 → floor(200·w/42): 142 / 47 / 9,
    // books capped at its 4 rows
    assert(mix == Map("web" -> 142L, "code" -> 47L, "books" -> 4L))
    // alpha=1 is proportional: web dominates harder than at alpha=0.5
    val prop = graft.operators.Sampling.temperatureSample(
        df, "cls", "id", alpha = 1.0, total = 200)
      .groupBy(col("cls")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(prop("web") > mix("web"))
    // alpha=0 is uniform-quota: every class gets the same floor(total/3)
    val unif = graft.operators.Sampling.temperatureSample(
        df, "cls", "id", alpha = 0.0, total = 30)
      .groupBy(col("cls")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(unif == Map("web" -> 10L, "code" -> 10L, "books" -> 4L))
    // deterministic rerun
    val again = graft.operators.Sampling.temperatureSample(
      df, "cls", "id", alpha = 0.5, total = 200)
    assert(out.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      again.select("id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("overlap windows share exactly `overlap` tokens") {
    import spark.implicits._
    val df = Seq((1L, (1 to 20).map("w" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = Chunking.chunkDocs(df, "text",
        chunkTokens = 8, overlap = 3)
      .orderBy(col("chunk_id"))
      .select(col("chunk_text")).collect().map(_.getString(0))
    chunks.sliding(2).foreach { case Array(a, b) =>
      assert(a.split(" ").takeRight(3).toSeq == b.split(" ").take(3).toSeq)
    }
    // every token appears in at least one chunk
    val all = chunks.flatMap(_.split(" ")).toSet
    assert(all == (1 to 20).map("w" + _).toSet)
  }
}
