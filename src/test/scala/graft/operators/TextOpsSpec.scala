package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pii redaction scrubs every match and counts add up") {
    val out = TextOps.queries("q87_pii_redaction")(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // completeness: the redacted text matches NONE of the PII patterns —
    // the property a scrub stage exists to guarantee
    val residual = out
      .filter($"redacted".rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+") ||
        $"redacted".rlike("""\+1-[0-9]{3}-[0-9]{4}""") ||
        $"redacted".rlike("""\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"""))
      .count()
    assert(residual === 0L, "redacted output still contains PII patterns")
    // every row carried exactly one synthesized IP; placeholders appear
    // as many times as the counts claim
    rows.foreach { r =>
      val red = r.getAs[String]("redacted")
      def occ(m: String): Int = red.sliding(m.length).count(_ == m)
      assert(r.getAs[Long]("n_ip") === 1L)
      assert(occ("[EMAIL]") === r.getAs[Long]("n_email").toInt)
      assert(occ("[PHONE]") === r.getAs[Long]("n_phone").toInt)
      assert(occ("[IP]") === r.getAs[Long]("n_ip").toInt)
    }
    // counts vary with event type: signups mail, purchases phone
    assert(rows.exists(_.getAs[Long]("n_email") === 1L))
    assert(rows.exists(_.getAs[Long]("n_email") === 0L))
    assert(rows.exists(_.getAs[Long]("n_phone") === 1L))
  }

  test("q38 open-vocab tier (prefix join, never all-pairs) is pair-" +
      "identical to the brute-force reference under source blocking") {
    // the driver corpus's 31-token vocabulary always takes the bitmap
    // tier, so the open-vocab fallback — rewritten in r13 after the
    // scale sweep caught the all-pairs-within-block shape at 43x for
    // 10x data — needs its own fixture: > 62 distinct tokens, known
    // near-dup pairs inside each source, a cross-source twin that must
    // NOT pair, and ids constructed so the blocked brute force is
    // computable inline
    import java.nio.file.Files
    val dir = Files.createTempDirectory("q38vocab").toString
    val words = (0 until 80).map(i => s"w$i")
    def doc(ids: Seq[Int]): String = ids.map(words).mkString(" ")
    val base = (0 until 40)
    val docs = Seq(
      (1L, doc(base), "sa"),
      (2L, doc(base), "sa"),             // exact dup of 1 (J = 1)
      (3L, doc(base :+ 40), "sa"),       // J = 40/41 >= 0.9
      (4L, doc(base.drop(8)), "sa"),     // J = 32/40 = 0.8 < 0.9 — out
      (5L, doc(base), "sb"),             // cross-source twin of 1 — out
      (6L, doc(40 until 80), "sb"),
      (7L, doc((40 until 80) :+ 0), "sb")) // J = 40/41 within sb
      .map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
    import spark.implicits._
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("q38_jaccard_near_dup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got === Set((1L, 2L, 40L), (1L, 3L, 40L), (2L, 3L, 40L),
      (6L, 7L, 40L)),
      s"open-vocab tier pairs diverge from the blocked reference: $got")
  }
}
