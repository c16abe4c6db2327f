package graft.serve

import java.nio.charset.StandardCharsets
import java.util.Base64
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec
import org.json4s._
import org.json4s.jackson.JsonMethods

/** HS256 bearer-token authentication for the deployed serving face — the
  * contract of the reference's `http-server-deployed/src/authentication.rs`:
  *
  *  - the shared secret is read from a file and whitespace-trimmed
  *    (authentication.rs:42-53; empty after trim is a construction error);
  *  - claims are `{iss, iat, exp}` with issuer fixed to "gitlab"
  *    (authentication.rs:15-33), validated on expiry and issuer;
  *  - requests carry `Authorization: Bearer <jwt>`; a missing header, bad
  *    prefix, bad signature, wrong issuer or expired token are all 401 with
  *    an `{"error": …}` body (authentication.rs:90-121);
  *  - `/health` and `/metrics` stay public (endpoints.rs:10).
  *
  * Pure-JDK HS256 (HMAC-SHA256 + base64url) — the deployed face must not
  * pull a JWT library the environment doesn't ship.
  */
final class JwtAuth(secretPath: String) {

  val issuer = "gitlab" // authentication.rs:15

  private val secret: Array[Byte] = {
    val raw = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(secretPath))
    val trimmed = new String(raw, StandardCharsets.UTF_8).trim
    require(trimmed.nonEmpty, s"Secret file is empty after trimming: $secretPath")
    trimmed.getBytes(StandardCharsets.UTF_8)
  }

  private def b64(bytes: Array[Byte]): String =
    Base64.getUrlEncoder.withoutPadding.encodeToString(bytes)
  private def hmac(data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret, "HmacSHA256"))
    mac.doFinal(data.getBytes(StandardCharsets.UTF_8))
  }

  /** Mint a token (the test_helpers.rs generate_jwt face). */
  def generateToken(ttlSeconds: Long): String = {
    val now = System.currentTimeMillis() / 1000
    val header = """{"alg":"HS256","typ":"JWT"}"""
    val payload = s"""{"iss":"$issuer","iat":$now,"exp":${now + ttlSeconds}}"""
    val signingInput =
      b64(header.getBytes(StandardCharsets.UTF_8)) + "." +
        b64(payload.getBytes(StandardCharsets.UTF_8))
    signingInput + "." + b64(hmac(signingInput))
  }

  /** Verify an Authorization header value. Right(claims iss) or Left(err). */
  def verifyBearer(authHeader: String): Either[String, String] = {
    val BearerPrefix = "Bearer "
    if (!authHeader.startsWith(BearerPrefix))
      return Left("Authorization header must start with 'Bearer '")
    verifyToken(authHeader.stripPrefix(BearerPrefix))
  }

  def verifyToken(token: String): Either[String, String] = {
    val parts = token.split("\\.", -1)
    if (parts.length != 3) return Left("JWT verification failed: malformed token")
    val signingInput = parts(0) + "." + parts(1)
    val expected = hmac(signingInput)
    val got =
      try Base64.getUrlDecoder.decode(parts(2))
      catch { case _: IllegalArgumentException =>
        return Left("JWT verification failed: bad signature encoding") }
    if (!java.security.MessageDigest.isEqual(expected, got))
      return Left("JWT verification failed: invalid signature")
    val claims =
      try JsonMethods.parse(new String(Base64.getUrlDecoder.decode(parts(1)),
        StandardCharsets.UTF_8))
      catch { case _: Exception =>
        return Left("JWT verification failed: bad claims encoding") }
    val now = System.currentTimeMillis() / 1000
    (claims \ "exp") match {
      case JInt(exp) if exp.toLong > now => ()
      case JInt(_) => return Left("JWT verification failed: ExpiredSignature")
      case _ => return Left("JWT verification failed: missing exp claim")
    }
    (claims \ "iss") match {
      case JString(iss) if iss == issuer => Right(iss)
      case _ => Left("JWT verification failed: InvalidIssuer")
    }
  }
}

object JwtAuth {
  /** endpoints.rs:10 — routes that bypass authentication. */
  val PublicEndpoints: Set[String] = Set("/health", "/metrics")
}
