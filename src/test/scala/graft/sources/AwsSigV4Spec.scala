package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins [[AwsSigV4]] to the PUBLISHED worked examples of the public
  * SigV4 specification ("Signature Version 4 signing process", AWS General
  * Reference) — not to a re-implementation of the code under test. If any
  * canonicalization or HMAC-chain detail drifts, these exact hex values
  * break. */
class AwsSigV4Spec extends AnyFunSuite with Matchers {

  private val DocsSecret = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"

  test("signing-key derivation matches the specification's worked example") {
    // Published vector: date 20120215, us-east-1, iam.
    AwsSigV4.signingKey(DocsSecret, "20120215", "us-east-1", "iam")
      .map(b => f"${b & 0xff}%02x").mkString shouldBe
      "f4780e2d9f65fa895f9c67b32ce1baf0b0d8a43505a000a1a9e090d414db404d"
  }

  test("full signature matches the specification's iam ListUsers GET example") {
    // Published vector: GET https://iam.amazonaws.com/?Action=ListUsers&
    // Version=2010-05-08 at 20150830T123600Z with AKIDEXAMPLE.
    val signed = AwsSigV4.sign(
      method = "GET",
      canonicalUri = "/",
      queryParams = Seq("Action" -> "ListUsers", "Version" -> "2010-05-08"),
      headers = Seq(
        "host" -> "iam.amazonaws.com",
        "content-type" -> "application/x-www-form-urlencoded; charset=utf-8"),
      payload = Array.emptyByteArray,
      region = "us-east-1",
      service = "iam",
      creds = AwsCredentials("AKIDEXAMPLE", DocsSecret),
      amzDate = "20150830T123600Z")
    signed("Authorization") shouldBe
      "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, " +
        "SignedHeaders=content-type;host;x-amz-date, " +
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7"
    signed("x-amz-date") shouldBe "20150830T123600Z"
  }

  test("canonicalization details: encoding set, query ordering, header trimall") {
    // SigV4 unreserved set only; everything else percent-encoded UPPERCASE.
    AwsSigV4.uriEncode("a-b_c.d~e") shouldBe "a-b_c.d~e"
    AwsSigV4.uriEncode("a b+c/d") shouldBe "a%20b%2Bc%2Fd"
    AwsSigV4.uriEncode("/path/to thing", keepSlash = true) shouldBe "/path/to%20thing"
    AwsSigV4.uriEncode("é") shouldBe "%C3%A9" // UTF-8 bytes, not Latin-1

    // Pairs sorted by encoded name then encoded value.
    AwsSigV4.canonicalQuery(Seq("b" -> "2", "a" -> "1", "a" -> "0")) shouldBe
      "a=0&a=1&b=2"

    // Session-token credentials add x-amz-security-token to the signed set.
    val tok = AwsSigV4.sign("POST", "/", Seq.empty,
      Seq("host" -> "kinesis.us-east-1.amazonaws.com"),
      "{}".getBytes(UTF_8), "us-east-1", "kinesis",
      AwsCredentials("AKID", "secret", Some("SESSION")), "20240101T000000Z")
    tok("Authorization") should include(
      "SignedHeaders=host;x-amz-date;x-amz-security-token")
    tok("x-amz-security-token") shouldBe "SESSION"

    // Header values are trimmed with internal whitespace runs collapsed,
    // and names lowercased — same input, same signature, per the spec.
    val a = AwsSigV4.sign("POST", "/", Seq.empty,
      Seq("Host" -> "h", "X-Custom" -> "  a   b  "),
      Array.emptyByteArray, "r", "s", AwsCredentials("k", "sec"), "20240101T000000Z")
    val b = AwsSigV4.sign("POST", "/", Seq.empty,
      Seq("host" -> "h", "x-custom" -> "a b"),
      Array.emptyByteArray, "r", "s", AwsCredentials("k", "sec"), "20240101T000000Z")
    a("Authorization") shouldBe b("Authorization")
  }
}
