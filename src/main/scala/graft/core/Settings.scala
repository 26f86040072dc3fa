package graft.core

/** Typed runtime settings, ported from the reference's pydantic-settings
  * model (`/root/reference/src/utils/settings.py`): values come from the
  * process environment and an optional `.env` file, nested with the
  * `__` delimiter (`DATABASE__HOST=…` → `database.host`), with real env
  * vars overriding the file. Database credentials may be hydrated from
  * a secret provider (the Vault AppRole client in production; an
  * env/in-memory provider in tests — this build has zero egress).
  */
case class VaultSettings(
    url: String,
    username: String,
    password: String,
    secretPath: String)

case class DatabaseSettings(
    dbType: String,
    host: String,
    port: Int,
    user: String,
    password: String)

case class StorageSettings(
    profile: Option[String],
    catalog: String,
    catalogType: String, // glue | polaris | local
    bucket: String,
    dataPath: String)

case class PolarisSettings(
    uri: String,
    oauth2ServerUri: String,
    credential: String,
    scope: String = "PRINCIPAL_ROLE:ALL",
    realm: String = "default")

case class KafkaSettings(
    bootstrapServers: String,
    schemaRegistry: String,
    metricNamespace: String,
    maxOffsetsPerTrigger: Long,
    startingOffsets: String)

case class Settings(
    storage: StorageSettings,
    vault: Option[VaultSettings] = None,
    database: Option[DatabaseSettings] = None,
    kafka: Option[KafkaSettings] = None,
    polaris: Option[PolarisSettings] = None) {

  /** `settings.py:119-125`. */
  def catalog: String = storage.catalog
  def warehouse: String = s"s3a://${storage.bucket}${storage.dataPath}"
}

object Settings {

  /** Credential hydration seam (Vault KV v2 in production,
    * `settings.py:49-86`). */
  trait SecretProvider {
    /** → keys host/port/user/password. */
    def fetch(secretPath: String): Map[String, String]
  }

  class StaticSecretProvider(secrets: Map[String, Map[String, String]])
    extends SecretProvider {
    def fetch(secretPath: String): Map[String, String] =
      secrets.getOrElse(secretPath,
        throw new NoSuchElementException(s"no secret at '$secretPath'"))
  }

  /** `KEY=VALUE` lines; blank lines and `#` comments ignored; values may
    * be single- or double-quoted. */
  def parseDotEnv(content: String): Map[String, String] =
    content.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains('='))
      .map { l =>
        val i = l.indexOf('=')
        val key = l.substring(0, i).trim
        val raw = l.substring(i + 1).trim
        val value =
          if (raw.length >= 2 &&
            ((raw.head == '"' && raw.last == '"') || (raw.head == '\'' && raw.last == '\'')))
            raw.substring(1, raw.length - 1)
          else raw
        key -> value
      }
      .toMap

  private def section(env: Map[String, String], name: String): Map[String, String] = {
    val prefix = name.toUpperCase + "__"
    env.collect {
      case (k, v) if k.toUpperCase.startsWith(prefix) =>
        k.substring(prefix.length).toLowerCase -> v
    }
  }

  /** Build Settings from a flat env map (`__`-nested keys). Order of
    * precedence for callers: file entries first, then real env on top. */
  def fromEnv(
      env: Map[String, String],
      secretProvider: Option[SecretProvider] = None): Settings = {
    val st = section(env, "storage")
    val storage = StorageSettings(
      profile = st.get("profile"),
      catalog = st.getOrElse("catalog",
        throw new IllegalArgumentException("STORAGE__CATALOG is required")),
      catalogType = st.getOrElse("catalog_type", "glue"),
      bucket = st.getOrElse("bucket", ""),
      dataPath = st.getOrElse("data_path", ""))

    val vault = {
      val v = section(env, "vault")
      if (v.isEmpty) None
      else Some(VaultSettings(v.getOrElse("url", ""), v.getOrElse("username", ""),
        v.getOrElse("password", ""), v.getOrElse("secret_path", "")))
    }

    // DB credentials: env values, overlaid by the secret provider when a
    // vault section names a secret path (settings.py:66-82). A TRANSIENT
    // vault failure (unreachable / timeout / 5xx) falls back to the env
    // credentials ONLY when they are complete (host, user and password
    // all present) — an outage then degrades startup instead of killing
    // it, but a partial env map can no longer boot a half-configured
    // daemon that fails later with a confusing auth error; with
    // incomplete env credentials the outage is rethrown at startup.
    // Misconfiguration (4xx, bad path) always fails loudly.
    val database = {
      val d = section(env, "database")
      val envCredsComplete =
        Seq("host", "user", "password").forall(k => d.get(k).exists(_.nonEmpty))
      val secret = for {
        vs <- vault
        sp <- secretProvider
      } yield
        try sp.fetch(vs.secretPath)
        catch { case e: VaultUnavailableException =>
          if (!envCredsComplete) throw new VaultUnavailableException(
            s"vault unavailable (${e.getMessage}) and env credentials are " +
              "incomplete (need DATABASE__HOST, DATABASE__USER, " +
              "DATABASE__PASSWORD to ride out a vault outage)", e)
          System.err.println(
            s"WARN vault unavailable (${e.getMessage}); using env credentials")
          Map.empty[String, String]
        }
      val merged = d ++ secret.getOrElse(Map.empty)
      if (merged.isEmpty) None
      else Some(DatabaseSettings(
        dbType = merged.getOrElse("type", "mysql"),
        host = merged.getOrElse("host", ""),
        port = merged.get("port").map(_.toInt).getOrElse(0),
        user = merged.getOrElse("user", ""),
        password = merged.getOrElse("password", "")))
    }

    val kafka = {
      val k = section(env, "kafka")
      if (k.isEmpty) None
      else Some(KafkaSettings(
        bootstrapServers = k.getOrElse("bootstrap_servers", ""),
        schemaRegistry = k.getOrElse("schema_registry", ""),
        metricNamespace = k.getOrElse("metric_namespace", ""),
        maxOffsetsPerTrigger = k.get("max_offsets_per_trigger").map(_.toLong)
          .getOrElse(1000000L),
        startingOffsets = k.getOrElse("starting_offsets", "earliest")))
    }

    val polaris = {
      val p = section(env, "polaris")
      if (p.isEmpty) None
      else Some(PolarisSettings(
        uri = p.getOrElse("uri", ""),
        oauth2ServerUri = p.getOrElse("oauth2_server_uri", ""),
        credential = p.getOrElse("credential", ""),
        scope = p.getOrElse("scope", "PRINCIPAL_ROLE:ALL"),
        realm = p.getOrElse("realm", "default")))
    }

    Settings(storage, vault, database, kafka, polaris)
  }

  /** Load from an optional .env file overlaid by the real environment. */
  def load(
      envFile: Option[java.nio.file.Path],
      env: Map[String, String] = sys.env.toMap,
      secretProvider: Option[SecretProvider] = None): Settings = {
    val fileEnv = envFile
      .filter(java.nio.file.Files.exists(_))
      .map(p => parseDotEnv(java.nio.file.Files.readString(p)))
      .getOrElse(Map.empty)
    fromEnv(fileEnv ++ env, secretProvider)
  }
}

/** Catalog session configuration (`/root/reference/src/utils/spark.py:18-83`)
  * as a pure config map: the glue / polaris / local branches produce the
  * `spark.sql.catalog.*` keys the reference sets, unit-testable without
  * the catalog jars being loadable. */
object SessionConfig {

  def catalogConfigs(settings: Settings): Map[String, String] = {
    val catalog = settings.catalog
    val base = Map(
      "spark.sql.defaultCatalog" -> catalog,
      "spark.sql.extensions" ->
        "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
      "spark.sql.session.timeZone" -> "UTC")

    settings.storage.catalogType match {
      case "polaris" =>
        val p = settings.polaris.getOrElse(
          throw new IllegalArgumentException(
            "catalog_type='polaris' requires POLARIS__* settings"))
        base ++ Map(
          s"spark.sql.catalog.$catalog" -> "org.apache.iceberg.spark.SparkCatalog",
          s"spark.sql.catalog.$catalog.type" -> "rest",
          s"spark.sql.catalog.$catalog.warehouse" -> catalog,
          s"spark.sql.catalog.$catalog.uri" -> p.uri,
          s"spark.sql.catalog.$catalog.oauth2-server-uri" -> p.oauth2ServerUri,
          s"spark.sql.catalog.$catalog.header.Polaris-Realm" -> p.realm,
          s"spark.sql.catalog.$catalog.header.X-Iceberg-Access-Delegation" ->
            "vended-credentials",
          s"spark.sql.catalog.$catalog.credential" -> p.credential,
          s"spark.sql.catalog.$catalog.scope" -> p.scope,
          s"spark.sql.catalog.$catalog.token-refresh-enabled" -> "true")
      case "glue" =>
        base ++ Map(
          s"spark.sql.catalog.$catalog" -> "org.apache.iceberg.spark.SparkCatalog",
          s"spark.sql.catalog.$catalog.catalog-impl" ->
            "org.apache.iceberg.aws.glue.GlueCatalog",
          s"spark.sql.catalog.$catalog.io-impl" -> "org.apache.iceberg.aws.s3.S3FileIO",
          s"spark.sql.catalog.$catalog.warehouse" -> settings.warehouse,
          s"spark.sql.catalog.$catalog.s3.path-style-access" -> "true",
          "spark.hadoop.fs.s3a.aws.credentials.provider" ->
            "software.amazon.awssdk.auth.credentials.DefaultCredentialsProvider")
      case _ =>
        // local/test: the LakeCatalog store needs no catalog plugin
        Map("spark.sql.session.timeZone" -> "UTC")
    }
  }
}
