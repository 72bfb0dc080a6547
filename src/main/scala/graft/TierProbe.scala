package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway tier probe for the r13 scale sweep: time containment /
  * prefix joins at base and x10 under BOTH verify tiers, to separate
  * "tier flip constant" from genuine superlinearity. */
object TierProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.DedupOps
    def run(tag: String, dir: String, vocabCap: Long): Unit = {
      val sets = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          DedupOps.shingles(split(col("text"), " "), 2).as("sh"))
      def time(name: String, f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"""{"probe":"$tag","op":"$name","cap":$vocabCap,""" +
          f""""sec":${(System.nanoTime() - t0) / 1e9}%.2f,"rows":$n}""")
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(false))
      }
      time("containment", DedupOps.containmentJoin(sets, "doc_id", "sh",
        4, 5, minSize = 5, bitmapMaxVocab = vocabCap).count())
      time("prefix", DedupOps.prefixSimilarityJoin(sets, "doc_id", "sh",
        4, 5, bitmapMaxVocab = vocabCap).count())
    }
    /** Candidate-VOLUME recount for the open-vocab tiers, computed
      * definitionally (plain equi-join, no block decomposition — the
      * cap reshapes reducers, never the row count): occurrences
      * surviving (a) the bare prefix filter, (b) +length, (c) +the
      * PPJoin positional bound — the r14 evidence that the positional
      * filter cuts pre-distinct volume, not just wall time. */
    def candVolume(tag: String, dir: String): Unit = {
      import org.apache.spark.sql.DataFrame
      import org.apache.spark.sql.expressions.Window
      val (num, den) = (4, 5)
      val sets = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          DedupOps.shingles(split(col("text"), " "), 2).as("sh"))
      val s = sets.select(col("doc_id").as("id"),
          array_distinct(col("sh")).as("set"))
        .filter(size(col("set")) >= 5).localCheckpoint()
      val ex = s.select(col("id"), size(col("set")).as("sz"),
        explode(col("set")).as("el"))
      val dfreq = ex.groupBy(col("el")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("id"))
        .orderBy(col("df").asc, col("el").asc)
      val ranked = ex.join(dfreq, "el")
        .withColumn("pos", row_number().over(w)).localCheckpoint()
      val ceil = expr(s"(CAST(sz AS BIGINT) * $num + ${den - 1}) div $den")
      val prefix = ranked.filter(col("pos") <= col("sz") - ceil + 1)
      def side(df: DataFrame, sfx: String): DataFrame =
        df.select(col("id").as(s"id$sfx"), col("el"),
          col("sz").as(s"sz$sfx"), col("pos").as(s"pos$sfx"))
      def bound = least(col("posa"), col("posb")) +
        least(col("sza") - col("posa"), col("szb") - col("posb"))
      def report(op: String, raw: DataFrame, len: org.apache.spark.sql.Column,
          pos: org.apache.spark.sql.Column): Unit = {
        // ONE aggregation pass, nothing materialized: the raw candidate
        // stream at x100 is tens of GB — counting it must never write it
        val r = raw.agg(count(lit(1)),
          sum(when(len, 1L).otherwise(0L)),
          sum(when(len && pos, 1L).otherwise(0L))).head()
        println(s"""{"probe":"$tag","op":"$op","raw":${r.getLong(0)},""" +
          s""""len":${r.getLong(1)},"pos":${r.getLong(2)}}""")
        spark.sharedState.cacheManager.clearCache()
      }
      report("cand_prefix",
        side(prefix, "a").join(side(prefix, "b"), "el")
          .filter(col("ida") < col("idb")),
        col("sza") * den >= col("szb") * num &&
          col("szb") * den >= col("sza") * num,
        bound.cast("long") * (num + den) >=
          (col("sza") + col("szb")).cast("long") * num)
      report("cand_containment",
        side(prefix, "a").join(side(ranked, "b"), "el")
          .filter(col("ida") =!= col("idb")),
        col("szb").cast("long") * den >= col("sza").cast("long") * num,
        bound.cast("long") * den >= col("sza").cast("long") * num)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(false))
    }
    // args: optional `tag=dir` pairs → candidate-volume recount ONLY on
    // those corpora (the ×100 fixture is too heavy to re-time the full
    // tier matrix on); no args = the full r13 probe + volumes
    if (args.nonEmpty) {
      args.foreach { a =>
        val Array(tag, dir) = a.split("=", 2)
        candVolume(tag, dir)
      }
    } else {
      for (cap <- Seq(1L, 1L << 16)) {
        run("base", "/root/testdata/sf0.1", cap)
        run("x10", "/tmp/graft-sf1", cap)
      }
      candVolume("base", "/root/testdata/sf0.1")
      candVolume("x10", "/tmp/graft-sf1")
    }
    spark.stop()
  }
}
