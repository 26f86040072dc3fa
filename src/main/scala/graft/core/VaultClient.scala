package graft.core

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper

/** HashiCorp Vault client: AppRole login + KV-v2 secret read, the
  * production [[Settings.SecretProvider]]
  * (`/root/reference/src/utils/settings.py:49-86`, where hvac does
  * `client.auth.approle.login(role_id, secret_id)` then
  * `client.read(secret_path)` and returns `response["data"]["data"]`).
  *
  * HTTP only — no SDK ships in this build — against Vault's public API:
  *
  *  - `POST {url}/v1/auth/approle/login` with `{role_id, secret_id}`
  *    → `.auth.client_token`;
  *  - `GET {url}/v1/{secretPath}` with `X-Vault-Token` → `.data.data`
  *    (the KV-v2 envelope: metadata wraps the user payload).
  *
  * The token is fetched once per client (lazily) and reused; Vault-side
  * TTL expiry surfaces as a 403, which a daemon handles by rebuilding
  * its Settings (same lifecycle as the reference's process-start
  * hydration). Failures throw with the HTTP status and body so a
  * misconfigured role id fails loudly at startup, not as an empty
  * credential map.
  */
class VaultClient(url: String, roleId: String, secretId: String)
  extends Settings.SecretProvider {

  private val mapper = new ObjectMapper()
  // bounded timeouts: a blackholed Vault endpoint must fail loudly at
  // startup (this class's contract), never hang credential hydration
  private val http = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10))
    .build()
  private val requestTimeout = java.time.Duration.ofSeconds(30)
  private def base = url.stripSuffix("/")

  private def post(uri: String, body: String): String = {
    val req = HttpRequest.newBuilder(URI.create(uri))
      .timeout(requestTimeout)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new IllegalStateException(
        s"vault POST $uri failed: HTTP ${resp.statusCode()} ${resp.body().take(200)}")
    resp.body()
  }

  private def get(uri: String, token: String): String = {
    val req = HttpRequest.newBuilder(URI.create(uri))
      .timeout(requestTimeout)
      .header("X-Vault-Token", token)
      .GET().build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new IllegalStateException(
        s"vault GET $uri failed: HTTP ${resp.statusCode()} ${resp.body().take(200)}")
    resp.body()
  }

  private lazy val token: String = {
    val login = mapper.createObjectNode()
    login.put("role_id", roleId)
    login.put("secret_id", secretId)
    val body = post(s"$base/v1/auth/approle/login", login.toString)
    val t = mapper.readTree(body).path("auth").path("client_token").asText("")
    if (t.isEmpty)
      throw new IllegalStateException("vault approle login returned no client_token")
    t
  }

  /** KV-v2 read of `secretPath` → the inner data map (host/port/user/
    * password for the database secret). */
  override def fetch(secretPath: String): Map[String, String] = {
    val body = get(s"$base/v1/${secretPath.stripPrefix("/")}", token)
    val data = mapper.readTree(body).path("data").path("data")
    if (data.isMissingNode || data.isNull)
      throw new NoSuchElementException(s"no data at vault path '$secretPath'")
    val b = Map.newBuilder[String, String]
    data.properties().forEach(e => b += e.getKey -> e.getValue.asText())
    b.result()
  }
}

object VaultClient {
  /** Provider wired from the env's vault section, mirroring the
    * reference's source order: username=role_id, password=secret_id. */
  def fromSettings(vs: VaultSettings): VaultClient =
    new VaultClient(vs.url, vs.username, vs.password)
}
