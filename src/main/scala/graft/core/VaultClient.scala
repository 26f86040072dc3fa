package graft.core

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper

/** Vault could not be reached or answered 5xx — a TRANSIENT
  * infrastructure failure, distinct from misconfiguration (bad role id,
  * missing secret path), which stays a loud [[IllegalStateException]].
  * [[Settings.fromEnv]] catches this type and falls back to
  * env-provided credentials — but ONLY when the env map carries a
  * complete credential set (host/user/password); otherwise the outage
  * is rethrown so startup fails loudly instead of booting a
  * half-configured daemon. */
class VaultUnavailableException(msg: String, cause: Throwable)
  extends RuntimeException(msg, cause)

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
  * Token lifecycle: fetched on first use and cached; a 403 on a secret
  * read means the token's Vault-side TTL expired (or it was revoked) —
  * the client RE-LOGINS once and retries the read, the AppRole
  * re-authentication path a long-lived daemon needs (the reference's
  * hvac client re-logins the same way on renewal failure). A second
  * 403 after a fresh login is a real permission problem and throws.
  *
  * Failure taxonomy: unreachable endpoint / request timeout / HTTP 5xx
  * throw [[VaultUnavailableException]] (transient — Settings falls back
  * to env credentials); 4xx and malformed responses throw
  * [[IllegalStateException]] (misconfiguration — fails loudly at
  * startup, never as an empty credential map).
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

  private def send(req: HttpRequest, uri: String): HttpResponse[String] =
    try http.send(req, HttpResponse.BodyHandlers.ofString())
    catch {
      case e: java.io.IOException => // incl. HttpTimeoutException, connect refusal
        throw new VaultUnavailableException(s"vault unreachable: $uri (${e.getMessage})", e)
    }

  private def require2xx(resp: HttpResponse[String], what: String): String = {
    val code = resp.statusCode()
    if (code / 100 == 5)
      throw new VaultUnavailableException(
        s"vault $what failed: HTTP $code ${resp.body().take(200)}", null)
    if (code / 100 != 2)
      throw new IllegalStateException(
        s"vault $what failed: HTTP $code ${resp.body().take(200)}")
    resp.body()
  }

  private def post(uri: String, body: String): String = {
    val req = HttpRequest.newBuilder(URI.create(uri))
      .timeout(requestTimeout)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build()
    require2xx(send(req, uri), s"POST $uri")
  }

  private def getRaw(uri: String, token: String): HttpResponse[String] = {
    val req = HttpRequest.newBuilder(URI.create(uri))
      .timeout(requestTimeout)
      .header("X-Vault-Token", token)
      .GET().build()
    send(req, uri)
  }

  @volatile private var cachedToken: Option[String] = None

  private def token(): String = cachedToken.getOrElse(refreshToken())

  /** AppRole login; caches and returns the fresh client token. */
  private def refreshToken(): String = synchronized {
    val login = mapper.createObjectNode()
    login.put("role_id", roleId)
    login.put("secret_id", secretId)
    val body = post(s"$base/v1/auth/approle/login", login.toString)
    val t = mapper.readTree(body).path("auth").path("client_token").asText("")
    if (t.isEmpty)
      throw new IllegalStateException("vault approle login returned no client_token")
    cachedToken = Some(t)
    t
  }

  /** KV-v2 read of `secretPath` → the inner data map (host/port/user/
    * password for the database secret). On a 403 the cached token's TTL
    * has expired — re-login once and retry before giving up. */
  override def fetch(secretPath: String): Map[String, String] = {
    val uri = s"$base/v1/${secretPath.stripPrefix("/")}"
    val first = getRaw(uri, token())
    val body =
      if (first.statusCode() == 403) require2xx(getRaw(uri, refreshToken()), s"GET $uri")
      else require2xx(first, s"GET $uri")
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
