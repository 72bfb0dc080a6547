package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

class BitmapSpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  test("bitmap jaccard equals set jaccard on random position sets") {
    val words = 4 // 256-bit space
    val setGen = Gen.listOf(Gen.chooseNum(0, words * 64 - 1)).map(_.distinct)
    sample(Gen.zip(setGen, setGen), 20).foreach { case (a, b) =>
      val df = Seq((a.toArray, b.toArray)).toDF("pa", "pb")
      val got = df.select(
        Bitmap.jaccard(
          Bitmap.fromPositions($"pa", words),
          Bitmap.fromPositions($"pb", words)).as("j"))
        .head()
      val inter = a.toSet.intersect(b.toSet).size
      val union = a.toSet.union(b.toSet).size
      if (union == 0) assert(got.isNullAt(0))
      else assert(got.getDouble(0) === inter.toDouble / union.toDouble,
        s"a=$a b=$b")
    }
  }

  test("duplicated positions do not change the bitmap") {
    val df = Seq((Array(1, 5, 5, 1, 63), Array(1, 5, 63))).toDF("pa", "pb")
    val j = df.select(Bitmap.jaccard(
      Bitmap.fromPositions($"pa", 1), Bitmap.fromPositions($"pb", 1)))
      .head().getDouble(0)
    assert(j === 1.0)
  }

  test("bitmap tier of near-dup equals the array tier exactly") {
    // 80-word vocab (> TokenBitmask.MaxVocab, within the bitmap tier)
    val words80 = (0 until 80).map(i => s"w$i")
    val rnd = new scala.util.Random(11)
    val bases = (0 until 10).map(_ => rnd.shuffle(words80).take(12))
    val docs = bases.zipWithIndex.flatMap { case (base, i) =>
      Seq(
        (i * 3L, base.mkString(" ")),                      // original
        (i * 3L + 1, rnd.shuffle(base).mkString(" ")),     // exact dup (set)
        (i * 3L + 2,                                        // near dup
          (base.drop(1) :+ s"extra$i").mkString(" ")))
    }.toDF("doc_id", "text")
    def run(maxVocab: Long) = graft.operators.DedupOps
      .minhashNearDupTokens(docs, "doc_id",
        graft.operators.DedupOps.tokenSet(col("text")),
        numHashes = 16, bands = 8, threshold = 0.7,
        bitmapMaxVocab = maxVocab)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val bitmapTier = run(graft.operators.DedupOps.DefaultBitmapMaxVocab)
    val arrayTier = run(0L)
    assert(bitmapTier === arrayTier)
    assert(bitmapTier.nonEmpty)
  }
}
