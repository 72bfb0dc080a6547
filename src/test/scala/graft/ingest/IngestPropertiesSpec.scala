package graft.ingest

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based invariants (SURVEY.md §5.2.3), via scalacheck generators
  * sampled deterministically. Spark jobs are slow, so the case count is
  * small — each case is a full pipeline run. */
class IngestPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def mkLine(sec: Int, user: String, title: String, typ: String,
      len: Option[(Long, Long)]): String = {
    val lenPart = len.map { case (o, nw) =>
      s""","length":{"old":$o,"new":$nw}"""
    }.getOrElse("")
    f"""{"meta":{"dt":"2026-01-08T22:35:$sec%02dZ"},"type":"$typ","title":"$title","title_url":"u","user":"$user","bot":false$lenPart}"""
  }

  private val lineGen: Gen[String] = for {
    sec <- Gen.choose(0, 59)
    user <- Gen.oneOf("Alice", "Bob", "Carol")
    title <- Gen.oneOf("PageA", "PageB")
    typ <- Gen.oneOf("edit", "new", "log")
    len <- Gen.option(Gen.zip(Gen.choose(0L, 5000L), Gen.choose(0L, 5000L)))
  } yield mkLine(sec, user, title, typ, len)

  private val batchGen: Gen[List[String]] = Gen.listOfN(20, lineGen)

  test("dedup is idempotent and replay overlap is absorbed") {
    sample(batchGen, 5).foreach { lines =>
      val raw = lines.toDF("value")
      val once = WikiIngest.pipeline(raw)
      val n = once.count()
      assert(WikiIngest.dedup(once).count() === n) // idempotence
      // replay overlap: batch ++ tail == batch (SURVEY §1.4.3)
      val replay = (lines ++ lines.takeRight(5)).toDF("value")
      assert(WikiIngest.pipeline(replay).count() === n)
    }
  }

  test("length_diff_bytes == new - old under arbitrary length presence") {
    sample(batchGen, 3).foreach { lines =>
      val out = WikiIngest.transform(
        WikiIngest.filterEvents(WikiIngest.parseRaw(lines.toDF("value"))))
      val bad = out.filter(
        $"length_diff_bytes" =!= $"length_bytes_new" - $"length_bytes_old")
      assert(bad.count() === 0L)
    }
  }

  test("retention survivors are exactly the ids >= max(0, max-N)") {
    sample(Gen.zip(Gen.choose(1L, 50L), Gen.choose(51L, 200L)), 5)
      .foreach { case (n, total) =>
        val df = spark.range(0, total).toDF("event_id")
        val kept = WikiIngest.retention(df, "event_id", n)
          .select("event_id").as[Long].collect().sorted
        val threshold = math.max(0L, total - 1 - n)
        assert(kept.toSeq === (threshold until total))
      }
  }

  test("pipeline never emits a null in required sink columns") {
    sample(batchGen, 3).foreach { lines =>
      val out = WikiIngest.pipeline(lines.toDF("value"))
      Seq("event_timestamp", "title", "username", "length_bytes_old",
        "length_bytes_new", "length_diff_bytes").foreach { c =>
        assert(out.filter(out(c).isNull).count() === 0L, s"null in $c")
      }
    }
  }
}
