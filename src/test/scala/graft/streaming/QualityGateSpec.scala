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
}
