package graft

/** Engine settings mirroring the reference's pydantic config
  * (config.py:8-21, config.yaml.example, FIXTURES.md §4).
  * Precedence: environment > defaults (the YAML layer of the reference
  * collapses into the defaults here; env keys match the reference's).
  */
final case class GraftConfig(
    streamUrl: String = "https://stream.wikimedia.org/v2/stream/recentchange",
    dbTableName: String = "wiki_events",
    userAgent: String = "WikiETL-Bot",
    dbMaxEvents: Long = 100000L,
    commitIntervalSeconds: Int = 2,
    cleanupHysteresis: Double = 1.1,
    reconnectBackoffSeconds: Int = 5,
    sinceOverride: Option[String] = None)

object GraftConfig {
  /** env > default, same keys the reference reads (ETL_USER_AGENT,
    * main.py:140; SINCE_OVERRIDE, pipeline.py:223). */
  def load(env: Map[String, String] = sys.env): GraftConfig =
    fromLayers(env, Map.empty)

  /** Full reference precedence: env > yaml > default (config.py:23-39,
    * main.py:114-149). `yamlPath` points at a flat `key: value` file in
    * the shape of the reference's config.yaml.example; yaml keys are the
    * snake_case setting names (stream_url, db_max_events, ...). */
  def loadWithYaml(yamlPath: String,
      env: Map[String, String] = sys.env): GraftConfig =
    fromLayers(env, parseFlatYaml(yamlPath))

  /** Minimal flat-YAML subset parser (`key: value` lines, `#` comments,
    * quotes optional) — all the structure the reference's config file
    * uses; no external dependency. */
  private[graft] def parseFlatYaml(path: String): Map[String, String] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) return Map.empty
    scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(p)).asScala.toSeq
      .map(_.takeWhile(_ != '#').trim)
      .filter(l => l.nonEmpty && l.contains(":"))
      .map { l =>
        val i = l.indexOf(':')
        val v = l.substring(i + 1).trim.stripPrefix("\"").stripSuffix("\"")
        l.substring(0, i).trim -> v
      }.toMap
  }

  private def fromLayers(env: Map[String, String],
      yaml: Map[String, String]): GraftConfig = {
    val d = GraftConfig()
    def s(envKey: String, yamlKey: String, dflt: String): String =
      env.getOrElse(envKey, yaml.getOrElse(yamlKey, dflt))
    GraftConfig(
      streamUrl = s("ETL_STREAM_URL", "stream_url", d.streamUrl),
      dbTableName = s("ETL_DB_TABLE_NAME", "db_table_name", d.dbTableName),
      userAgent = s("ETL_USER_AGENT", "user_agent", d.userAgent),
      dbMaxEvents = s("ETL_DB_MAX_EVENTS", "db_max_events",
        d.dbMaxEvents.toString).toLong,
      commitIntervalSeconds = s("ETL_COMMIT_INTERVAL_SECONDS",
        "commit_interval_seconds", d.commitIntervalSeconds.toString).toInt,
      cleanupHysteresis = s("ETL_CLEANUP_HYSTERESIS", "cleanup_hysteresis",
        d.cleanupHysteresis.toString).toDouble,
      reconnectBackoffSeconds = s("ETL_RECONNECT_BACKOFF_SECONDS",
        "reconnect_backoff_seconds", d.reconnectBackoffSeconds.toString).toInt,
      // env-only, as in the reference: the yaml `events-since` setting
      // exists there but is read by nothing (SURVEY.md §1.4.3 — a latent
      // inconsistency we deliberately do not replicate)
      sinceOverride = env.get("SINCE_OVERRIDE"))
  }
}
