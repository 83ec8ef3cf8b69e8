package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

/** Static AWS credentials for [[AwsSigV4]] / [[KinesisHttpApi]]. Values
  * come from source options (or the standard public `AWS_ACCESS_KEY_ID` /
  * `AWS_SECRET_ACCESS_KEY` / `AWS_SESSION_TOKEN` environment variables) —
  * this library carries no credential-provider machinery beyond that. */
final case class AwsCredentials(
    accessKeyId: String,
    secretAccessKey: String,
    sessionToken: Option[String] = None)

/** AWS Signature Version 4 request signing, implemented from the PUBLIC
  * specification ("Signature Version 4 signing process", AWS General
  * Reference) with nothing but the JDK: SHA-256 + HmacSHA256 from
  * `javax.crypto`, RFC 3986 percent-encoding by hand. This is the last
  * seam between the engine's Kinesis source and the real service — with it
  * the transport ([[KinesisHttpApi]]) speaks the same
  * `application/x-amz-json-1.1` protocol the AWS SDK does, with zero SDK
  * dependency.
  *
  * Correctness is pinned by `AwsSigV4Spec` to the PUBLISHED worked
  * examples in the specification (the signing-key derivation vector and
  * the `iam ListUsers` GET request vector), not to a
  * re-implementation of this code.
  *
  * Reference behavior mirrored: the reference's SDK client signs every
  * `ListShards`/`GetShardIterator`/`GetRecords` call the same way
  * (`kinesisReader/index.js:19-27` constructs the region-bound client that
  * does it); here the signature is explicit instead of hidden in the SDK. */
object AwsSigV4 {

  private val Algorithm = "AWS4-HMAC-SHA256"

  def sha256Hex(data: Array[Byte]): String =
    hex(java.security.MessageDigest.getInstance("SHA-256").digest(data))

  def hmacSha256(key: Array[Byte], data: String): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  private def hex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString

  /** The derived signing key: HMAC chain over date / region / service /
    * the literal "aws4_request", seeded with "AWS4" + secret. */
  def signingKey(secret: String, date: String, region: String,
                 service: String): Array[Byte] = {
    val kDate = hmacSha256(s"AWS4$secret".getBytes(UTF_8), date)
    val kRegion = hmacSha256(kDate, region)
    val kService = hmacSha256(kRegion, service)
    hmacSha256(kService, "aws4_request")
  }

  /** RFC 3986 percent-encoding with the SigV4 unreserved set
    * (A–Z a–z 0–9 - _ . ~); `keepSlash` leaves path separators intact for
    * canonical-URI encoding. */
  def uriEncode(s: String, keepSlash: Boolean = false): String = {
    val out = new StringBuilder
    s.getBytes(UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      if (c.isLetterOrDigit && c < 0x80 || "-_.~".contains(c)) out.append(c)
      else if (c == '/' && keepSlash) out.append(c)
      else out.append(f"%%${b & 0xff}%02X")
    }
    out.toString
  }

  /** Canonical query string: each name and value RFC3986-encoded, pairs
    * sorted by encoded name then encoded value, joined `name=value` with
    * '&'. Empty for the JSON-protocol POSTs Kinesis uses. */
  def canonicalQuery(params: Seq[(String, String)]): String =
    params.map { case (k, v) => (uriEncode(k), uriEncode(v)) }
      .sorted.map { case (k, v) => s"$k=$v" }.mkString("&")

  /** Canonical headers: lowercase names, values trimmed with internal
    * whitespace runs collapsed (the spec's "trimall"), sorted by name. */
  private def canonicalHeaders(headers: Seq[(String, String)]): (String, String) = {
    val canon = headers
      .map { case (k, v) => (k.toLowerCase(java.util.Locale.ROOT),
        v.trim.replaceAll("\\s+", " ")) }
      .sortBy(_._1)
    (canon.map { case (k, v) => s"$k:$v\n" }.mkString,
      canon.map(_._1).mkString(";"))
  }

  /** Sign one request; returns the headers to attach: `Authorization`,
    * plus `x-amz-date` (and `x-amz-security-token` for temporary
    * credentials) which are part of the signed set.
    *
    * @param amzDate ISO-basic request timestamp, e.g. `20150830T123600Z`
    *                (its first 8 chars are the credential-scope date) */
  def sign(
      method: String,
      canonicalUri: String,
      queryParams: Seq[(String, String)],
      headers: Seq[(String, String)],   // MUST include host
      payload: Array[Byte],
      region: String,
      service: String,
      creds: AwsCredentials,
      amzDate: String): Map[String, String] = {
    val date = amzDate.take(8)
    val withAuthHeaders = headers ++
      Seq("x-amz-date" -> amzDate) ++
      creds.sessionToken.map("x-amz-security-token" -> _)
    val (canonHdrs, signedHdrs) = canonicalHeaders(withAuthHeaders)
    val canonicalRequest =
      s"$method\n${uriEncode(canonicalUri, keepSlash = true)}\n" +
        s"${canonicalQuery(queryParams)}\n$canonHdrs\n$signedHdrs\n" +
        sha256Hex(payload)
    val scope = s"$date/$region/$service/aws4_request"
    val stringToSign =
      s"$Algorithm\n$amzDate\n$scope\n" +
        sha256Hex(canonicalRequest.getBytes(UTF_8))
    val signature =
      hex(hmacSha256(signingKey(creds.secretAccessKey, date, region, service),
        stringToSign))
    Map(
      "Authorization" ->
        (s"$Algorithm Credential=${creds.accessKeyId}/$scope, " +
          s"SignedHeaders=$signedHdrs, Signature=$signature"),
      "x-amz-date" -> amzDate) ++
      creds.sessionToken.map("x-amz-security-token" -> _)
  }

  /** `yyyyMMdd'T'HHmmss'Z'` for [[sign]]'s `amzDate`, UTC. */
  def amzDateOf(instant: java.time.Instant): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")
      .withZone(java.time.ZoneOffset.UTC).format(instant)
}
