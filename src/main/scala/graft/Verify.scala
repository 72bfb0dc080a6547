package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      if (Files.isDirectory(p)) {
        val children = Files.list(p)
        try children.forEach(c => deleteRecursively(c))
        finally children.close()
      }
      Files.delete(p)
    }

  def main(args: Array[String]): Unit = {
    // optional 3rd arg (builder tooling, driver never passes it): comma-
    // separated query-name filter for fast single-query iteration
    val Array(sfDir, outDir) = args.take(2)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // Stale-artifact guard (ADVICE r9): if the outDir is reused across
      // runs, a newly-crashing query must not leave last run's successful
      // dump in place (check_oracle would silently compare stale results),
      // and a newly-passing query must not leave last run's .err beside a
      // fresh dump. Clear both before every attempt.
      deleteRecursively(Paths.get(s"$outDir/$name"))
      Files.deleteIfExists(Paths.get(s"$outDir/$name.err"))
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // A crash must leave a visible artifact, never an absent row: the
        // driver's comparator treats a missing dump as "query not present",
        // which silently shrinks the correctness file (r8: 121→116). The
        // .err file makes the failure first-class in the signal of record.
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        Files.writeString(Paths.get(s"$outDir/$name.err"),
          s"${e.getClass.getName}: ${e.getMessage}\n")
      }
      // drop cache a query persisted for its own internal reuse — dead
      // after the write; letting it pile up across 69 queries evicts and
      // thrashes later ones (see Bench.clearLeakedCache)
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
