package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SEMANTIC (embedding) near-dup admission — SemDeDup (Abbas
  * et al. 2023, arXiv:2303.09540; the batch q82 pipeline) at INGEST
  * time, completing the streaming dedup matrix's fourth family: text
  * MinHash bands, image dHash bands, audio fingerprint bands (all
  * first-writer BUCKET registries), and now embedding cosine, which has
  * no exact-match bucket — a near-dup can differ in every component — so
  * its registry stores the admitted VECTORS per cell and verifies by
  * dot product.
  *
  * The quadratic term is bounded exactly as in batch SemDeDup: vectors
  * are routed to IVF cells (nearest centroid, row-local against a
  * broadcast-tiny centroid table) and only compared WITHIN their cell.
  * Centroids come from the caller — typically the PERSISTED index
  * ([[graft.operators.VectorIndex]], the same artifact q117/q118 query)
  * so stream and batch agree on the cell geometry. Routing is a
  * stateless per-row computation (append-legal; a streaming frame can't
  * run the batch path's row_number window), and the stateful core is one
  * `flatMapGroupsWithState` keyed by cell.
  *
  * Scale shape: the only shuffle is the groupByKey on cell id; state per
  * cell is the admitted (id, vector) list — the 100 TB posture is the
  * SemDeDup paper's: nCells grows with the corpus to hold cell
  * population constant, and `stateTtl` expires idle cells so state
  * tracks the live window, not history. Like the band registries, a
  * REJECTED vector is not added to state (its admitted match already
  * covers its neighborhood at 2τ−1 by the triangle inequality — the
  * standard representative-cover argument).
  *
  * Semantics (replay-stable, matching the band registries): within a
  * batch, ascending doc_id order; a vector is admitted iff no
  * previously-admitted vector in its cell has cosine ≥ τ, else rejected
  * with `dup_of` = the EARLIEST-admitted matching vector. Inputs are
  * assumed L2-normalized (the corpus contract) so cosine = dot.
  */
object StreamingSemanticDedup {

  /** Admission verdict for one vector (public: Catalyst codegen). */
  final case class SemVerdict(doc_id: Long, cell: Long, admit: Boolean,
      dup_of: Long)

  /** One admitted vector in a cell's registry (public: codegen). */
  final case class AdmittedVec(doc_id: Long, vec: Seq[Double])

  /** Per-cell registry state (public: codegen). */
  final case class CellReg(entries: Seq[AdmittedVec])

  private def dot(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Row-local cell routing + the stateful per-cell registry.
    *
    * `vecs` must carry (`doc_id` long, `embedding` array<float|double>).
    * `centroids` is the (cent_id, cv) table COLLECTED to an array — it is
    * index-sized (nCells rows), not data-sized; pass the rows of a
    * [[graft.operators.VectorIndex]]-stored centroid table to share the
    * batch index's geometry. Ties in routing break to the smaller
    * cent_id, same as the batch assignment's window order. */
  def semanticVerdicts(vecs: DataFrame,
      centroids: Array[(Long, Array[Double])], tau: Double,
      stateTtl: Option[String] = None): Dataset[SemVerdict] = {
    require(centroids.nonEmpty, "centroid table must not be empty")
    val spark = vecs.sparkSession
    import spark.implicits._
    implicit val regEnc = Encoders.product[CellReg]
    implicit val outEnc = Encoders.product[SemVerdict]
    val cents = centroids.sortBy(_._1) // deterministic tie order
    val routed = vecs
      .select(org.apache.spark.sql.functions.col("doc_id").cast("long"),
        org.apache.spark.sql.functions.col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        // row-local nearest-centroid routing against the broadcast-tiny
        // model (the one streaming-legal form of the batch assignment)
        it.map { case (id, v) =>
          var best = cents(0)._1; var bestDot = Double.NegativeInfinity
          cents.foreach { case (cid, cv) =>
            val d = dot(v, cv)
            if (d > bestDot) { bestDot = d; best = cid }
          }
          (best, id, v)
        }
      }
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    routed.groupByKey(_._1)
      .flatMapGroupsWithState[CellReg, SemVerdict](
        OutputMode.Append, timeout) {
        case (cell, rows, state: GroupState[CellReg]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.map(r => (r._2, r._3)).toArray.sortBy(_._1)
            val reg = scala.collection.mutable.ArrayBuffer
              .empty[AdmittedVec]
            state.getOption.foreach(reg ++= _.entries)
            val out = sorted.map { case (id, v) =>
              // earliest-admitted match: the registry buffer is in
              // admission order, so the first hit is the answer
              reg.find(e => dot(e.vec, v) >= tau) match {
                case Some(m) => SemVerdict(id, cell, admit = false, m.doc_id)
                case None =>
                  reg += AdmittedVec(id, v)
                  SemVerdict(id, cell, admit = true, -1L)
              }
            }
            state.update(CellReg(reg.toSeq))
            stateTtl.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }
}
