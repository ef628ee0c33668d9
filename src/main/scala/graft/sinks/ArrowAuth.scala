package graft.sinks

import java.nio.charset.StandardCharsets
import java.util.Base64

/** Client-side auth header management: send HTTP basic credentials until
  * the server hands back a bearer token, then send the bearer (reference
  * AuthFactory/AuthMiddleware, neo4j_arrow_client.py:298-350).
  *
  * `tokenTtlSeconds = 0` reproduces the reference's shipped behavior of
  * always re-sending basic auth (its `token()` unconditionally resets);
  * a positive TTL enables the commented-out 10-minute bearer cache.
  */
final class ArrowAuth(user: String, password: String,
                      tokenTtlSeconds: Long = 0L,
                      now: () => Long = () => System.currentTimeMillis() / 1000) {

  @volatile private var token: Option[String] = None
  @volatile private var tokenTimestamp: Long = 0L

  private def basicHeader: String = {
    val raw = s"$user:$password".getBytes(StandardCharsets.UTF_8)
    "Basic " + Base64.getEncoder.encodeToString(raw)
  }

  /** Headers for an outgoing call. Lowercase key — the reference notes the
    * server requires `authorization` in lower case.
    */
  def sendingHeaders(): Map[String, String] = {
    val t = currentToken()
    val value = t.map("Bearer " + _).getOrElse(basicHeader)
    Map("authorization" -> value)
  }

  /** Capture a bearer token from response headers. */
  def receivedHeaders(headers: Map[String, String]): Unit =
    headers.collectFirst {
      case (k, v) if k.equalsIgnoreCase("authorization") => v
    }.foreach { auth =>
      auth.split(" ", 2) match {
        case Array("Bearer", t) =>
          token = Some(t)
          tokenTimestamp = now()
        case _ => ()
      }
    }

  private def currentToken(): Option[String] = {
    if (tokenTtlSeconds <= 0) None
    else token.filter(_ => now() - tokenTimestamp <= tokenTtlSeconds)
  }
}
