package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.DedupOps

/** [[TextNorm]] — the normalization on-ramp to the dedup families:
  * the café/Café/café (NFC vs uppercase vs NFD-decomposed) triple must
  * collapse AFTER normalization and provably NOT before, through the
  * same tokenSet/shingles machinery the near-dup operators use. */
class TextNormSpec extends SparkSpec {
  import spark.implicits._

  test("café triple: three raw variants, one normalized") {
    // precomposed é (U+00E9), uppercase, decomposed e + U+0301 — three
    // DIFFERENT strings encoding the same visible word
    val variants = Seq("caf\u00e9 latte", "Caf\u00e9 latte",
      "cafe\u0301 latte") // NFC, cased, NFD-decomposed
    assert(variants.distinct.size === 3)
    assert(variants.map(TextNorm.normalizeString).distinct ===
      Seq("cafe latte")) // all collapse: lowercase, accent-stripped
  }

  test("shingle dedup misses the triple raw, catches it normalized") {
    val df = Seq((1L, "the café on the corner"),
      (2L, "the Café on the corner"),
      (3L, "the café on the corner")).toDF("doc_id", "text")
    // raw: every pairwise shingle set differs — zero exact-set dups
    val rawSets = df.select(
        array_sort(DedupOps.shingleSet($"text", 2)).as("sh"))
      .distinct().count()
    assert(rawSets === 3, "raw variants must NOT collapse")
    // normalized: one shingle set — the dedup the corpus needs
    val normSets = df.select(array_sort(DedupOps.shingleSet(
        TextNorm.normalize($"text"), 2)).as("sh"))
      .distinct().count()
    assert(normSets === 1, "normalized variants must collapse")
  }

  test("pipeline pieces: casefold, accent strip, pass-throughs") {
    val n = TextNorm.normalizeString _
    assert(n("Mühleisen") === "muhleisen")  // ü → u
    assert(n("ÁÉÍÓÚÜÑÇ") === "aeiouunc")
    assert(n("Straße") === "straße")   // ß not decomposable
    assert(n("łø") === "łø") // ł, ø pass through
    assert(n("HELLO world 42") === "hello world 42") // ASCII fast path
    val already = "no upper here"
    assert(n(already) eq already) // fast path is allocation-free
  }

  test("expression path matches the JVM kernel and handles null") {
    val df = Seq(Some("Voilà DONE"), None).toDF("t")
    val got = df.select(TextNorm.normalize($"t").as("n"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(got === Seq(Some("voila done"), None))
  }
}
