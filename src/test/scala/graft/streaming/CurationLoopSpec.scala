package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec
import graft.operators.NbQuality
import graft.sinks.{AggMatView, IncrementalAgg, ManifestSink}

/** The full ONLINE curation loop, end to end through one live stream —
  * the composition every piece was built for:
  *
  *   JSONL ingest (corrupt frames → dead letter, q197's channel)
  *     → per-epoch (token, class) features FOLD into the NB model view
  *       (AggMatView.absorbEpoch — the model learns as the corpus lands)
  *     → the SAME epoch's unlabeled docs gate through the
  *       freshest-committed model (QualityGate → main / quarantine).
  *
  * Every table folds via its own batchId marker, so a full checkpoint
  * replay of the whole loop is silent on all five tables at once — the
  * per-table exactly-once arguments COMPOSE. */
class CurationLoopSpec extends SparkSpec {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("src", StringType)))

  private def jl(id: Long, text: String, src: String): String =
    s"""{"doc_id": $id, "text": "$text", "src": "$src"}"""

  test("stream: ingest + dead-letter + model fold + gated admission, " +
      "replay silent across all five tables") {
    val root = Files.createTempDirectory("curloop").toString
    val (base, view, main, quar, dead) = (s"$root/base", s"$root/model",
      s"$root/main", s"$root/quarantine", s"$root/dead")
    val srcDir = s"$root/incoming"
    Files.createDirectories(Paths.get(srcDir))
    // three arrival files = three epochs (maxFilesPerTrigger = 1);
    // reference-class docs dominate the "good" vocabulary from epoch 0,
    // so per-epoch verdicts match the final-model recompute
    Files.write(Paths.get(srcDir, "f0.jsonl"), (Seq(
      jl(1, "clean prose good text", "wiki"),
      jl(2, "clean good text prose", "wiki"),
      jl(100, "clean prose", "web"),
      // junk mass in the SAME epoch keeps the smoothed n-class small
      // for reference vocabulary from the first gate onward
      jl(103, "junk junk garbage garbage junk", "web"),
      """{"oops""") // torn frame: must land in the dead-letter table
      .mkString("\n")).getBytes("UTF-8"))
    Files.write(Paths.get(srcDir, "f1.jsonl"), (Seq(
      jl(3, "good clean text", "wiki"),
      jl(101, "junk garbage junk", "web"))
      .mkString("\n")).getBytes("UTF-8"))
    Files.write(Paths.get(srcDir, "f2.jsonl"), (Seq(
      jl(102, "zzz yyy zzz", "web"))
      .mkString("\n")).getBytes("UTF-8"))
    val ckpt = s"$root/ckpt"

    def run(): Unit = {
      val q = graft.sources.JsonlCorpus
        .taggedStream(spark, srcDir, docSchema,
          Map("maxFilesPerTrigger" -> "1"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, id: Long) =>
          val good = b.filter($"_ok").drop("_raw", "_ok")
          ManifestSink.appendOnce(
            b.filter(!$"_ok").select($"_raw".as("raw")), dead, id)
          AggMatView.absorbEpoch(spark, good.select(
              explode(split($"text", " ")).as("tok"),
              when($"src" === "wiki", "p").otherwise("n").as("cls"),
              lit(1L).as("w")),
            id, base, view, Seq("tok", "cls"), "w")
          QualityGate.admitEpoch(spark,
            good.filter($"src" === "web").select($"doc_id", $"text"),
            id, view, main, quar)
          ()
        }
        .start()
      q.awaitTermination(180000L)
    }
    run()

    def ids(dir: String) = ManifestSink.read(spark, dir)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    // routing ≡ the batch kernel against the final model (the fixture's
    // verdict signs are epoch-stable by construction)
    val web = Seq((100L, "clean prose"), (101L, "junk garbage junk"),
      (102L, "zzz yyy zzz"),
      (103L, "junk junk garbage garbage junk")).toDF("doc_id", "text")
    val offline = NbQuality.score(web,
        NbQuality.modelFromState(ManifestSink.read(spark, view)))
      .filter($"keep").select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(main) === offline)
    assert(ids(main) === Set(100L))
    assert(ids(quar) === Set(101L, 102L, 103L))
    // the torn frame landed exactly once, verbatim
    assert(ManifestSink.read(spark, dead).select($"raw")
      .collect().map(_.getString(0)).toSeq === Seq("""{"oops"""))
    // the folded model state ≡ a direct aggregate of the base stream
    val want = IncrementalAgg.aggregate(
      ManifestSink.read(spark, base), Seq("tok", "cls"), "w")
      .collect().map(_.toString).sorted
    assert(AggMatView.read(spark, view)
      .collect().map(_.toString).sorted === want)

    // full checkpoint replay: silence on every table in the loop
    val versions = Seq(base, view, main, quar, dead)
      .map(d => ManifestSink.version(spark, d))
    run()
    assert(Seq(base, view, main, quar, dead)
      .map(d => ManifestSink.version(spark, d)) === versions)
  }
}
