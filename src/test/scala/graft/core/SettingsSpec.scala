package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.apps.AppArgs
import graft.streaming.KafkaSource

class SettingsSpec extends AnyFunSuite with Matchers {

  private val env = Map(
    "STORAGE__CATALOG" -> "lake",
    "STORAGE__CATALOG_TYPE" -> "glue",
    "STORAGE__BUCKET" -> "bkt",
    "STORAGE__DATA_PATH" -> "/iceberg",
    "DATABASE__TYPE" -> "mysql",
    "DATABASE__HOST" -> "h1",
    "DATABASE__PORT" -> "3306",
    "DATABASE__USER" -> "u",
    "DATABASE__PASSWORD" -> "p",
    "KAFKA__BOOTSTRAP_SERVERS" -> "k1:9092",
    "KAFKA__SCHEMA_REGISTRY" -> "http://sr:8081",
    "KAFKA__METRIC_NAMESPACE" -> "ns",
    "KAFKA__MAX_OFFSETS_PER_TRIGGER" -> "1000000",
    "KAFKA__STARTING_OFFSETS" -> "earliest")

  test("nested __ env parsing and derived properties") {
    val s = Settings.fromEnv(env)
    s.catalog shouldBe "lake"
    s.warehouse shouldBe "s3a://bkt/iceberg"
    s.database.get.host shouldBe "h1"
    s.database.get.port shouldBe 3306
    s.kafka.get.maxOffsetsPerTrigger shouldBe 1000000L
    s.polaris shouldBe None
  }

  test("dotenv parsing: comments, quotes, precedence under real env") {
    val dotenv = Settings.parseDotEnv(
      """# comment
        |STORAGE__CATALOG=filecat
        |STORAGE__BUCKET="quoted-bucket"
        |EMPTY_LINE_NEXT=
        |
        |DATABASE__HOST='quoted'
        |""".stripMargin)
    dotenv("STORAGE__BUCKET") shouldBe "quoted-bucket"
    dotenv("DATABASE__HOST") shouldBe "quoted"
    // real env wins over file values
    val merged = Settings.fromEnv(dotenv ++ Map("STORAGE__CATALOG" -> "envcat"))
    merged.catalog shouldBe "envcat"
  }

  test("vault secret provider hydrates database credentials") {
    val withVault = env ++ Map(
      "VAULT__URL" -> "http://vault:8200",
      "VAULT__USERNAME" -> "role",
      "VAULT__PASSWORD" -> "secret",
      "VAULT__SECRET_PATH" -> "kv/data/db/shop")
    val provider = new Settings.StaticSecretProvider(Map(
      "kv/data/db/shop" -> Map("host" -> "vault-host", "port" -> "3307",
        "user" -> "vu", "password" -> "vp")))
    val s = Settings.fromEnv(withVault, Some(provider))
    s.database.get.host shouldBe "vault-host"
    s.database.get.port shouldBe 3307
    s.database.get.user shouldBe "vu"
  }

  private val vaultEnv = Map(
    "VAULT__URL" -> "http://vault:8200",
    "VAULT__USERNAME" -> "role",
    "VAULT__PASSWORD" -> "secret",
    "VAULT__SECRET_PATH" -> "kv/data/db/shop")

  private val outageProvider = new Settings.SecretProvider {
    def fetch(secretPath: String): Map[String, String] =
      throw new VaultUnavailableException("503 from vault", null)
  }

  test("vault outage + COMPLETE env credentials degrades to env values") {
    val s = Settings.fromEnv(env ++ vaultEnv, Some(outageProvider))
    s.database.get.host shouldBe "h1"
    s.database.get.user shouldBe "u"
    s.database.get.password shouldBe "p"
  }

  test("vault outage + INCOMPLETE env credentials fails startup loudly") {
    // no DATABASE__PASSWORD: a fallback would boot a daemon that can
    // never authenticate — the outage must surface at startup instead
    val partial = (env - "DATABASE__PASSWORD") ++ vaultEnv
    val e = intercept[VaultUnavailableException] {
      Settings.fromEnv(partial, Some(outageProvider))
    }
    e.getMessage should include("incomplete")
    // empty-string credentials are incomplete too, not merely absent keys
    intercept[VaultUnavailableException] {
      Settings.fromEnv(env ++ vaultEnv ++ Map("DATABASE__PASSWORD" -> ""),
        Some(outageProvider))
    }
  }

  test("vault MISCONFIGURATION fails loudly even with complete env creds") {
    // a bad secret path is not an outage: no fallback, regardless of env
    val provider = new Settings.StaticSecretProvider(Map.empty)
    intercept[NoSuchElementException] {
      Settings.fromEnv(env ++ vaultEnv, Some(provider))
    }
  }

  test("catalog session configs per catalog type") {
    val glue = SessionConfig.catalogConfigs(Settings.fromEnv(env))
    glue("spark.sql.defaultCatalog") shouldBe "lake"
    glue("spark.sql.catalog.lake.catalog-impl") shouldBe
      "org.apache.iceberg.aws.glue.GlueCatalog"
    glue("spark.sql.catalog.lake.warehouse") shouldBe "s3a://bkt/iceberg"

    val pEnv = env ++ Map(
      "STORAGE__CATALOG_TYPE" -> "polaris",
      "POLARIS__URI" -> "http://polaris/api/catalog",
      "POLARIS__OAUTH2_SERVER_URI" -> "http://polaris/oauth",
      "POLARIS__CREDENTIAL" -> "id:secret")
    val pol = SessionConfig.catalogConfigs(Settings.fromEnv(pEnv))
    pol("spark.sql.catalog.lake.type") shouldBe "rest"
    pol("spark.sql.catalog.lake.warehouse") shouldBe "lake" // logical name
    pol("spark.sql.catalog.lake.header.Polaris-Realm") shouldBe "default"
    pol("spark.sql.catalog.lake.scope") shouldBe "PRINCIPAL_ROLE:ALL"

    // polaris type without POLARIS__* settings is an explicit error
    intercept[IllegalArgumentException] {
      SessionConfig.catalogConfigs(
        Settings.fromEnv(env ++ Map("STORAGE__CATALOG_TYPE" -> "polaris")))
    }
  }

  test("kafka source option map incl. per-topic offsets override") {
    val base = KafkaSource.Config("k1:9092", "pfx.db.t1")
    KafkaSource.options(base) shouldBe Map(
      "kafka.bootstrap.servers" -> "k1:9092",
      "subscribe" -> "pfx.db.t1",
      "maxOffsetsPerTrigger" -> "1000000",
      "startingOffsets" -> "earliest",
      "failOnDataLoss" -> "false")
    val withMap = base.copy(
      startingOffsetsByPartition = Some(Map("0" -> 100L, "1" -> 250L)))
    KafkaSource.startingOffsetsJson(withMap) shouldBe
      """{"pfx.db.t1": {"0": 100, "1": 250}}"""
  }

  test("app arg parsing mirrors the reference CLIs") {
    val a = AppArgs.parse(Array(
      "--dag-id", "cdc_shop", "--service", "SVC", "--topics", "a.b.c,a.b.d",
      "--concurrency", "4", "--round-interval", "300", "--dry-run"))
    a("dag_id") shouldBe "cdc_shop"
    a("topics") shouldBe "a.b.c,a.b.d"
    a.int("concurrency", 3) shouldBe 4
    a.long("round_interval", 0) shouldBe 300L
    a.getOrElse("dry_run", "false") shouldBe "true"
    a.int("compaction_interval", 14400) shouldBe 14400
    intercept[IllegalArgumentException](a("missing"))
    intercept[IllegalArgumentException](AppArgs.parse(Array("stray")))
  }

  test("base64 per-topic offsets map decoding") {
    val b64 = java.util.Base64.getEncoder.encodeToString(
      """{"prefix.schema.table1": {"0": 100, "1": 7}}""".getBytes)
    AppArgs.decodeOffsetsMap(b64) shouldBe
      Map("prefix.schema.table1" -> Map("0" -> 100L, "1" -> 7L))
  }
}
