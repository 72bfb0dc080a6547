package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The naive-Bayes quality model's scoring kernel, shared by the batch
  * gate (q210 trains inline), the incrementally-maintained form (q214
  * reads the [[graft.sinks.AggMatView]] state), and the STREAMING
  * admission gate ([[graft.streaming.QualityGate]] scores each epoch
  * against the current state). One definition of "the score" keeps the
  * three paths row-identical — the property q214's oracle pins
  * (fold ≡ retrain) extends to the stream because the stream calls the
  * same kernel.
  *
  * Scoring shape (the 100 TB envelope): the model frame is
  * vocabulary-sized; totals are a 1-row aggregate OVER the model, never
  * the corpus; per-token LLRs round to 6 dp and sum in DECIMAL(18,6)
  * (q75's order-free recipe), so the score is bit-stable under any
  * partitioning, cluster size, or engine.
  */
object NbQuality {

  /** Pivot the AggMatView state rows (tok, cls ∈ {p, n}, n, …) into the
    * model frame (tok, cp, cn) the scorer consumes. State is
    * vocabulary-sized; so is this. */
  def modelFromState(state: DataFrame): DataFrame =
    state.groupBy(col("tok")).agg(
      sum(when(col("cls") === "p", col("n")).otherwise(0L)).as("cp"),
      sum(when(col("cls") === "n", col("n")).otherwise(0L)).as("cn"))

  /** Score documents (idCol, textCol) against a (tok, cp, cn) model:
    * per-doc mean log-likelihood-ratio of the add-one-smoothed class
    * unigram models, keep at the equal-prior boundary 0. Returns
    * (idCol, n_tokens, avg_llr, keep) — docs whose tokens all miss the
    * model vocabulary drop (no token rows survive the join), exactly as
    * the batch formulation. */
  def score(docs: DataFrame, model: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val tot = model.agg(sum(col("cp")).as("np"), sum(col("cn")).as("nn"),
      count(lit(1)).as("v"))
    val llr: Column = round(
      log((col("cp") + 1).cast("double") /
          (col("np") + col("v")).cast("double")) -
        log((col("cn") + 1).cast("double") /
            (col("nn") + col("v")).cast("double")), 6)
      .cast("decimal(18,6)")
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .join(model, "tok").crossJoin(broadcast(tot))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        (sum(llr).cast("double") / count(lit(1))).as("avg_llr"))
      .select(col(idCol), col("n_tokens"), col("avg_llr"),
        (col("avg_llr") >= 0.0).as("keep"))
  }
}
