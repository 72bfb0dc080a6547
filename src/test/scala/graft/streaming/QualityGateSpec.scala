package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.NbQuality
import graft.sinks.{AggMatView, ManifestSink}

class QualityGateSpec extends SparkSpec {
  import spark.implicits._

  /** (tok, cls, w) feature stream for the model base table. */
  private def tokCls(f: DataFrame): DataFrame = f.select(
    explode(split($"text", " ")).as("tok"),
    $"cls", lit(1L).as("w"))

  // reference-class docs speak "good" vocabulary, rest speak "bad"
  private def seed(n: Int): DataFrame =
    (0 until n).map { i =>
      if (i % 2 == 0) (i.toLong, "good clean prose text", "p")
      else (i.toLong, "spam junk noise garbage", "n")
    }.toDF("doc_id", "text", "cls")

  private def ids(dir: String): Set[Long] =
    ManifestSink.read(spark, dir).select($"doc_id")
      .collect().map(_.getLong(0)).toSet

  test("epochs split by model score, replays converge, refreshed model " +
      "applies to later epochs without restart") {
    val root = Files.createTempDirectory("qgate").toString
    val (base, view, main, rej) =
      (s"$root/base", s"$root/model", s"$root/main", s"$root/reject")
    ManifestSink.append(tokCls(seed(40)), base)
    AggMatView.create(spark, view, base, Seq("tok", "cls"), "w")

    // epoch 0: two clearly-good docs, one clearly-bad, one off-vocab
    val e0 = Seq(
      (100L, "clean prose"), (101L, "good text"),
      (102L, "junk garbage"), (103L, "zzz qqq")).toDF("doc_id", "text")
    QualityGate.admitEpoch(spark, e0, 0L, view, main, rej)
    assert(ids(main) === Set(100L, 101L))
    assert(ids(rej) === Set(102L, 103L)) // off-vocab quarantined, not admitted

    // the gate's routing equals the batch kernel's verdicts
    val offline = NbQuality.score(e0,
        NbQuality.modelFromState(ManifestSink.read(spark, view)))
      .filter($"keep").select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(main) === offline)

    // quarantine rows carry their scores for triage
    val rejCols = ManifestSink.read(spark, rej).columns.toSet
    assert(Set("avg_llr", "n_tokens").subsetOf(rejCols))

    // replayed epoch (at-least-once delivery): both sides no-ops
    val (vm, vr) =
      (ManifestSink.version(spark, main), ManifestSink.version(spark, rej))
    QualityGate.admitEpoch(spark, e0, 0L, view, main, rej)
    assert(ManifestSink.version(spark, main) === vm)
    assert(ManifestSink.version(spark, rej) === vr)

    // the corpus shifts: "zzz qqq" becomes reference-class vocabulary;
    // the model FOLDS the delta (no retrain) and the next epoch routes
    // the previously-off-vocab doc as a keep — no gate restart
    ManifestSink.append(tokCls(Seq((1000L, "zzz qqq zzz qqq", "p"))
      .toDF("doc_id", "text", "cls")), base)
    val (_, folded) =
      AggMatView.refresh(spark, view, base, Seq("tok", "cls"), "w")
    assert(folded)
    QualityGate.admitEpoch(spark,
      Seq((104L, "zzz qqq")).toDF("doc_id", "text"), 1L, view, main, rej)
    assert(ids(main) === Set(100L, 101L, 104L))
    assert(ids(rej) === Set(102L, 103L))
  }

  test("crash between commits + model refresh before replay: the replay " +
      "scores against the PINNED model version, so every doc lands in " +
      "exactly one table") {
    val root = Files.createTempDirectory("qgate_pin").toString
    val (base, view, main, rej) =
      (s"$root/base", s"$root/model", s"$root/main", s"$root/reject")
    ManifestSink.append(tokCls(seed(40)), base)
    AggMatView.create(spark, view, base, Seq("tok", "cls"), "w")
    // doc 202 is off-vocab under model v0 (→ reject); after the refresh
    // below its vocabulary becomes reference-class (→ keep): the verdict
    // FLIPS between model versions — exactly the ADVICE hazard
    val e0 = Seq((200L, "clean prose"), (201L, "junk garbage"),
      (202L, "xxy wwv")).toDF("doc_id", "text")

    // simulate the crash: run ONLY the reject-side half of epoch 0 the
    // way admitEpoch does (same model read, same pinned header), then
    // "die" before the main-side commit
    val model0 = NbQuality.modelFromState(ManifestSink.read(spark, view))
    val scored0 = NbQuality.score(e0, model0)
      .select($"doc_id", $"n_tokens", $"avg_llr", $"keep")
    val rejected0 = e0.join(scored0, Seq("doc_id"), "left")
      .filter(!coalesce($"keep", lit(false)))
      .drop("keep")
    ManifestSink.appendOnceWithHeader(rejected0, rej, 0L,
      Map(QualityGate.ModelVKey ->
        ManifestSink.version(spark, view).toString))
    assert(ids(rej) === Set(201L, 202L))

    // the model refreshes BETWEEN the crash and the replay: doc 202's
    // vocabulary joins the reference class (keep under v1)
    ManifestSink.append(tokCls(Seq((2000L, "xxy wwv xxy wwv", "p"))
      .toDF("doc_id", "text", "cls")), base)
    val (_, folded) =
      AggMatView.refresh(spark, view, base, Seq("tok", "cls"), "w")
    assert(folded)

    // replay of epoch 0: reject side must no-op (marker), and the main
    // side must admit the complement UNDER THE PINNED v0 — doc 202 stays
    // a reject. Without the pin it would re-score keep under v1 and land
    // in NEITHER table.
    val vrBefore = ManifestSink.version(spark, rej)
    QualityGate.admitEpoch(spark, e0, 0L, view, main, rej)
    assert(ManifestSink.version(spark, rej) === vrBefore,
      "replayed reject side must be a marker no-op")
    assert(ids(main) === Set(200L), "main must receive exactly the v0 keeps")
    assert(ids(rej) === Set(201L, 202L))
    // every epoch-0 doc is in exactly one table
    assert((ids(main) ++ ids(rej)) === Set(200L, 201L, 202L))
    assert((ids(main) & ids(rej)) === Set.empty)

    // a FRESH epoch (no pin) scores against the refreshed model: 202's
    // twin vocabulary now admits
    QualityGate.admitEpoch(spark,
      Seq((203L, "xxy wwv")).toDF("doc_id", "text"), 1L, view, main, rej)
    assert(ids(main) === Set(200L, 203L))
  }

  test("a replay whose reject side carries NO model pin fails loudly " +
      "instead of silently scoring against the freshest model") {
    val root = Files.createTempDirectory("qgate_nopin").toString
    val (base, view, main, rej) =
      (s"$root/base", s"$root/model", s"$root/main", s"$root/reject")
    ManifestSink.append(tokCls(seed(40)), base)
    AggMatView.create(spark, view, base, Seq("tok", "cls"), "w")
    val e0 = Seq((300L, "clean prose"), (301L, "junk garbage"))
      .toDF("doc_id", "text")
    // a PRE-PINNING gate wrote the reject side: batch marker present,
    // ModelVKey absent (appendOnce without the header)
    val model0 = NbQuality.modelFromState(ManifestSink.read(spark, view))
    val rejected0 = e0.join(
        NbQuality.score(e0, model0).select($"doc_id", $"n_tokens",
          $"avg_llr", $"keep"), Seq("doc_id"), "left")
      .filter(!coalesce($"keep", lit(false))).drop("keep")
    ManifestSink.appendOnce(rejected0, rej, 0L)
    // the replay detects the committed epoch but cannot recover WHICH
    // model it scored against — refusing beats the verdict-flip hazard
    val e = intercept[IllegalStateException] {
      QualityGate.admitEpoch(spark, e0, 0L, view, main, rej)
    }
    assert(e.getMessage.contains(QualityGate.ModelVKey))
    // and nothing was admitted by the failed replay
    assert(ManifestSink.version(spark, main) === -1L)
  }
}
