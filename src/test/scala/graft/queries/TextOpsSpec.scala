package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Behavior proofs for the round-5 text operators that the hash-match gate
  * alone can't establish: winnowing's coverage guarantee, the LM score's
  * probability-domain invariants, and the PII redaction regexes on a
  * fixture that actually CONTAINS PII (the synthetic corpus has none, so
  * the registry run only exercises the zero-match path). */
class TextOpsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("winnowing: consecutive selected positions gap by at most w (coverage)") {
    // The winnowing guarantee: every window of w consecutive grams
    // contains a selected fingerprint, so the gap between consecutive
    // selected positions within a document is ≤ w.
    val sel = TextAnalysis.qTxtWinnow(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    sel should not be empty
    sel.values.foreach { ps =>
      val pos = ps.map(_._2).sorted
      pos.toSeq.sliding(2).foreach {
        case Seq(a, b) => (b - a) should be <= 4L
        case _         => ()
      }
    }
  }

  test("winnowing: density lands near the 2/(w+1) guarantee, every doc present") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, dir).select($"doc_id")
      .as[Long].collect().toSet
    val sel = TextAnalysis.qTxtWinnow(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    sel.map(_._1).toSet shouldBe docs // no document vanishes
    // expected density 2/(w+1) = 0.4; allow a generous band
    val grams = graft.Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.size(
        graft.functions.TextHash.tokens($"text"))).as[Int].collect()
      .map(n => math.max(n - 2, 1).toLong).sum
    val density = sel.length.toDouble / grams
    density should be > 0.25
    density should be < 0.55
  }

  test("lm score: probabilities stay in (0, 1e6] and min bounds mean") {
    val rows = TextAnalysis.qTxtLmScore(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows should not be empty
    rows.foreach { case (_, n, mean, min) =>
      n should be >= 1L
      min should be >= 0L   // floor of a positive rational can reach 0
      min should be <= mean
      mean should be <= 1000000L
    }
  }

  test("redaction counts, sequencing and fingerprint change on a PII fixture") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact me at alice.smith+spam@example.co.uk or 555-867-5309 now"),
      (2L, "server at 192.168.1.254 pinged 10.0.0.1 twice"),
      (3L, "no pii here just words"),
      (4L, "bob@site.org and carol@site.org and 212.555.1234")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.redactFrom(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getLong(6)))).toMap
    got(1L)._1 shouldBe 1L // email
    got(1L)._2 shouldBe 1L // phone
    got(1L)._3 shouldBe 0L
    got(2L)._3 shouldBe 2L // both IPs
    got(3L) shouldBe ((0L, 0L, 0L, 0L, true, got(3L)._6))
    got(4L)._1 shouldBe 2L
    got(4L)._2 shouldBe 1L // 212.555.1234 matches the dotted phone form
    // a clean doc's fingerprint is the fingerprint of its unchanged text;
    // a dirty doc's fingerprint differs from its raw text's
    val rawFp = docs.select($"doc_id",
      graft.functions.TextHash.h32($"text").as("fp")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got(3L)._6 shouldBe rawFp(3L)
    got(1L)._6 should not be rawFp(1L)
  }

  test("temperature mixture: damps large sources, boosts small, shares consistent") {
    val rows = TextAnalysis.qTxtTemperature(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.length should be > 1
    rows.foreach { case (_, _, share, tshare, factor) =>
      // sqrt flattens the distribution: a source above the mean share
      // moves DOWN toward it, one below moves UP — factor tracks that
      if (share > tshare) factor should be < 10000L
      if (share < tshare) factor should be > 10000L
    }
    // floored shares each sum to <= 1e4 and within rounding slack of it
    val (ss, ts) = (rows.map(_._3).sum, rows.map(_._4).sum)
    ss should be <= 10000L
    ss should be > 10000L - rows.length.toLong
    ts should be <= 10000L
    ts should be > 10000L - rows.length.toLong
  }

  test("bpe merges: left-to-right non-overlap semantics on a crafted corpus") {
    import spark.implicits._
    // tokens: "aaa" ×2, "bb" ×1. Hand-computed merge sequence:
    //  round 1: (a,a) appears twice per "aaa" ×2 = 4 — but left-to-right
    //           non-overlap merges ONE pair per run: aaa → [aa, a]
    //  round 2: (aa,a) ×2 beats (b,b) ×1
    //  round 3: only (b,b) remains
    val docs = Seq((1L, "aaa aaa bb")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeMergesFrom(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
                 r.getString(3), r.getLong(4))).sortBy(_._1)
    got shouldBe Array(
      (1L, "a", "a", "aa", 4L),
      (2L, "aa", "a", "aaa", 2L),
      (3L, "b", "b", "bb", 1L))
  }

  test("redacted text has the PII replaced, not merely counted") {
    import spark.implicits._
    val docs = Seq((1L, "mail a@b.io, dial 555-867-5309, host 10.0.0.1")).toDF("doc_id", "text")
    // reproduce the redaction expression directly to inspect the text
    val red = TextAnalysis.PiiPatterns.foldLeft(org.apache.spark.sql.functions.col("text")) {
      case (c, (_, pat, repl)) => org.apache.spark.sql.functions.regexp_replace(c, pat, repl)
    }
    val out = docs.select(red).as[String].head()
    out shouldBe "mail <EMAIL>, dial <PHONE>, host <IP>"
  }

  test("dsir: docs resembling the target set outscore off-domain docs") {
    import spark.implicits._
    // Target docs define the "looks like my domain" distribution; the raw
    // pool holds one doc echoing the target phrasing and one about
    // something else entirely. The target-like doc must win, and must sit
    // above the uniform-prior baseline (ratio 1.0 = 10000 e4).
    val docs = Seq(
      (1L, true, "alpha beta alpha beta gamma"),
      (2L, true, "alpha beta delta alpha beta"),
      (10L, false, "alpha beta alpha gamma beta alpha"),
      (11L, false, "omega psi chi omega psi chi omega"))
      .toDF("doc_id", "is_target", "text")
      .withColumn("w", graft.functions.TextHash.tokens($"text"))
      .select($"doc_id", $"is_target", $"w")
    val got = TextAnalysis.dsirScoresFrom(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap // avg_e4
    got.keySet shouldBe Set(10L, 11L) // target docs are never candidates
    got(10L) should be > got(11L)
    got(10L) should be > 10000L
  }

  test("dsir: selection excludes the target set; scores and jitter consistent") {
    import spark.implicits._
    val rows = TextAnalysis.qTxtDsir(spark, dir).collect()
    rows should not be empty
    val targetIds = graft.Tables.documents(spark, dir)
      .filter($"source" === "src19").select($"doc_id").as[Long].collect().toSet
    rows.map(_.getLong(0)).toSet.intersect(targetIds) shouldBe empty
    rows.foreach { r =>
      val (n, sum, avg, key) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      avg shouldBe sum / n
      key should be >= avg
      key should be < avg + 256
    }
    // emitted in selection order: key_e4 descending
    val keys = rows.map(_.getLong(4)).toSeq
    keys shouldBe keys.sorted.reverse
  }

  test("hashed linear classifier covers every doc and splits the corpus") {
    import org.apache.spark.sql.functions._
    import graft.syntax._
    val rows = TextAnalysis.qTxtClassifier(spark, dir)
    // total function of the corpus: one verdict per document
    rows.count() shouldBe graft.Tables.documents(spark, dir).count()
    rows.select($"doc_id").distinct().count() shouldBe rows.count()
    // a fixed nonzero weight table must actually discriminate — both
    // classes present (a degenerate all-accept classifier is vacuous)
    val byClass = rows.groupBy($"accept").agg(count(lit(1))).collect()
    byClass.length shouldBe 2
    // margin sign and verdict agree
    rows.filter(($"margin" >= 0L) =!= $"accept").count() shouldBe 0L
  }

  test("html extraction round-trips text the fixtures never exercise: entities, newlines, tag-like runs") {
    // The oracle gate proves the chain on fixture word soup; this pins
    // the paths real crawl text hits — ampersands, angle brackets (a
    // tag-like run in the SOURCE text must survive escaping, never be
    // stripped as markup), newlines, and boilerplate-like words.
    import spark.implicits._
    val crafted = Seq(
      1L -> "a & b < c > d && <script>not a tag</script> &amp; done",
      2L -> "line one\nline two\n\ttabbed <nav> fake </nav>",
      3L -> "plain words only",
      4L -> "<html><body>looks like a page</body></html>",
      5L -> "trailing space ")
    val df = crafted.toDF("doc_id", "text")
    val out = df.select($"doc_id", $"text",
      TextAnalysis.extractedOf(
        TextAnalysis.htmlOf($"text", $"doc_id")).as("extracted"))
      .collect()
    out.foreach { r =>
      withClue(s"doc ${r.getLong(0)}: ") {
        r.getString(2) shouldBe r.getString(1)
      }
    }
  }

  test("html extraction strips MULTILINE boilerplate blocks and never cross-pairs tags") {
    // Real crawl pages put newlines inside <head>/<script>/<nav>/<footer>;
    // without DOTALL those blocks leak CSS/JS/nav text into the extract
    // and silently corrupt downstream quality/language/dedup verdicts.
    // Also: an open tag must pair only with its OWN close tag — a lazy
    // alternation like </(script|nav)> would let <script>…</nav> span
    // and swallow body text between them.
    import spark.implicits._
    val multiline =
      "<html><head>\n<title>t</title>\n<style>\nbody{margin:0}\n</style>\n</head>" +
        "<body><nav>\n<a href=\"/\">home</a>\n</nav><main><p>real text here</p></main>" +
        "<script>\nvar x = 1;\nvar y = 2;\n</script>\n<footer>\n(c) corp\n</footer></body></html>"
    val crossPair =
      "<html><head><title>t</title></head><body>" +
        "<script>var a=1;</script><nav>menu</nav><p>kept words</p>" +
        "<footer>foot</footer></body></html>"
    val out = Seq(1L -> multiline, 2L -> crossPair).toDF("doc_id", "html")
      .select($"doc_id", TextAnalysis.extractedOf($"html").as("x"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // multiline blocks fully stripped: no CSS/JS/nav/footer residue
    out(1L) should include("real text here")
    out(1L) should not include "margin"
    out(1L) should not include "var x"
    out(1L) should not include "home"
    out(1L) should not include "(c) corp"
    // per-tag pairing: the text BETWEEN script-close and nav-open survives;
    // with a cross-pairing alternation "kept words" could be swallowed
    out(2L) should include("kept words")
    out(2L) should not include "var a"
    out(2L) should not include "menu"
    out(2L) should not include "foot"
  }
}
