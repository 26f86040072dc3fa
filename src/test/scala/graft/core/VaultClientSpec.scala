package graft.core

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** AppRole login + KV-v2 read against a stub Vault server — the same
  * fake-HTTP approach as the schema-registry path (no egress in this
  * build). */
class VaultClientSpec extends AnyFunSuite with Matchers {

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    x.sendResponseHeaders(code, bytes.length)
    x.getResponseBody.write(bytes)
    x.close()
  }

  private def withStubVault[A](f: (String, () => Int) => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    var logins = 0
    server.createContext("/v1/auth/approle/login", (x: HttpExchange) => {
      val body = new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      logins += 1
      if (body.contains("\"role_id\":\"role-1\"") && body.contains("\"secret_id\":\"sec-1\""))
        respond(x, 200, """{"auth":{"client_token":"tok-xyz"}}""")
      else respond(x, 403, """{"errors":["invalid role or secret id"]}""")
    })
    server.createContext("/v1/secret/data/db", (x: HttpExchange) => {
      if (x.getRequestHeaders.getFirst("X-Vault-Token") != "tok-xyz")
        respond(x, 403, """{"errors":["permission denied"]}""")
      else respond(x, 200,
        """{"data":{"metadata":{"version":3},
           "data":{"host":"db.internal","port":"3306","user":"svc","password":"pw9"}}}"""
          .replaceAll("\n", ""))
    })
    server.createContext("/v1/secret/data/empty", (x: HttpExchange) =>
      respond(x, 200, """{"data":{}}"""))
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", () => logins)
    finally server.stop(0)
  }

  test("approle login then KV-v2 read returns the inner data map; token reused") {
    withStubVault { (url, logins) =>
      val c = new VaultClient(url, "role-1", "sec-1")
      val secret = c.fetch("secret/data/db")
      secret shouldBe Map(
        "host" -> "db.internal", "port" -> "3306", "user" -> "svc", "password" -> "pw9")
      c.fetch("secret/data/db") // second read
      logins() shouldBe 1 // one login for the client's lifetime
    }
  }

  test("bad credentials and missing data fail loudly") {
    withStubVault { (url, _) =>
      val bad = new VaultClient(url, "role-1", "WRONG")
      val e = intercept[IllegalStateException](bad.fetch("secret/data/db"))
      e.getMessage should include("403")
      val ok = new VaultClient(url, "role-1", "sec-1")
      a[NoSuchElementException] should be thrownBy ok.fetch("secret/data/empty")
    }
  }

  test("expired token: client re-logins once and the read succeeds (AppRole renewal)") {
    // stub Vault whose tokens die after ONE secret read — every fetch
    // after the first forces the renewal path
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    var logins = 0
    var readsOnToken = Map.empty[String, Int]
    server.createContext("/v1/auth/approle/login", (x: HttpExchange) => {
      logins += 1
      respond(x, 200, s"""{"auth":{"client_token":"tok-$logins"}}""")
    })
    server.createContext("/v1/secret/data/db", (x: HttpExchange) => {
      val tok = x.getRequestHeaders.getFirst("X-Vault-Token")
      val used = readsOnToken.getOrElse(tok, 0)
      if (tok == null || !tok.startsWith("tok-") || used >= 1)
        respond(x, 403, """{"errors":["permission denied"]}""") // TTL expired
      else {
        readsOnToken += tok -> (used + 1)
        respond(x, 200, """{"data":{"data":{"user":"svc","password":"pw9"}}}""")
      }
    })
    server.start()
    try {
      val c = new VaultClient(
        s"http://127.0.0.1:${server.getAddress.getPort}", "role-1", "sec-1")
      c.fetch("secret/data/db")("user") shouldBe "svc" // login 1, read 1
      c.fetch("secret/data/db")("user") shouldBe "svc" // 403 -> re-login -> read
      logins shouldBe 2
    } finally server.stop(0)
  }

  test("5xx and unreachable endpoints raise the transient failure type") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/auth/approle/login", (x: HttpExchange) =>
      respond(x, 503, """{"errors":["sealed"]}"""))
    server.start()
    try {
      val sealed_ = new VaultClient(
        s"http://127.0.0.1:${server.getAddress.getPort}", "role-1", "sec-1")
      val e = intercept[VaultUnavailableException](sealed_.fetch("secret/data/db"))
      e.getMessage should include("503")
    } finally server.stop(0)
    // nothing listens here: connection refusal is transient too
    val dead = new VaultClient("http://127.0.0.1:1", "role-1", "sec-1")
    a[VaultUnavailableException] should be thrownBy dead.fetch("secret/data/db")
  }

  test("Settings falls back to env credentials when vault is unavailable — and only then") {
    val env = Map(
      "STORAGE__CATALOG" -> "cat",
      "VAULT__URL" -> "http://127.0.0.1:1",
      "VAULT__USERNAME" -> "role-1",
      "VAULT__PASSWORD" -> "sec-1",
      "VAULT__SECRET_PATH" -> "secret/data/db",
      "DATABASE__TYPE" -> "mysql",
      "DATABASE__HOST" -> "fallback.host",
      "DATABASE__PORT" -> "3306",
      "DATABASE__USER" -> "env-user",
      "DATABASE__PASSWORD" -> "env-pw")
    // transient failure (refused connection): env credentials win
    val transient = new Settings.SecretProvider {
      def fetch(p: String): Map[String, String] =
        throw new VaultUnavailableException("vault unreachable: test", null)
    }
    val s = Settings.fromEnv(env, Some(transient))
    s.database.get.host shouldBe "fallback.host"
    s.database.get.user shouldBe "env-user"
    // misconfiguration still fails loudly — no silent fallback
    val misconfigured = new Settings.SecretProvider {
      def fetch(p: String): Map[String, String] =
        throw new IllegalStateException("vault GET failed: HTTP 403")
    }
    an[IllegalStateException] should be thrownBy
      Settings.fromEnv(env, Some(misconfigured))
    // and a live client against a dead endpoint takes the same path
    val vs = Settings.fromEnv(env).vault.get
    Settings.fromEnv(env, Some(VaultClient.fromSettings(vs)))
      .database.get.host shouldBe "fallback.host"
  }

  test("Settings.fromEnv hydrates database credentials through the vault client") {
    withStubVault { (url, _) =>
      val env = Map(
        "STORAGE__CATALOG" -> "cat",
        "VAULT__URL" -> url,
        "VAULT__USERNAME" -> "role-1",
        "VAULT__PASSWORD" -> "sec-1",
        "VAULT__SECRET_PATH" -> "secret/data/db",
        "DATABASE__TYPE" -> "mysql")
      val vs = Settings.fromEnv(env).vault.get
      val s = Settings.fromEnv(env, Some(VaultClient.fromSettings(vs)))
      val db = s.database.get
      db.host shouldBe "db.internal"
      db.port shouldBe 3306
      db.user shouldBe "svc"
      db.password shouldBe "pw9"
      db.dbType shouldBe "mysql" // env key not shadowed by the secret
    }
  }
}
