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
}
