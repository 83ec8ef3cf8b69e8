package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The public frame-parametric API must be the SAME engine as the
  * oracle-gated registry queries: each facade call on the fixture tables
  * (under caller-chosen column names) must reproduce the corresponding
  * registry query's rows exactly — which transitively extends the DuckDB
  * oracle gate to this surface — and the flagship deduplicate() must also
  * work end-to-end on a non-fixture inline frame. */
class CorpusOpsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** documents under caller-chosen names (exercises canonicalization). */
  private def myDocs = graft.Tables.documents(spark, dir)
    .select(col("doc_id").as("id"), col("text").as("body"), col("source"))

  test("jaccardPairs on caller columns equals q_dedup_jaccard") {
    val got = CorpusDedup.jaccardPairs(myDocs, "id", "body")
      .collect().map(_.toSeq).toSet
    val want = graft.queries.Dedup.qDedupJaccard(spark, dir)
      .collect().map(_.toSeq).toSet
    got shouldBe want
    got should not be empty
  }

  test("minhashSignatures equals q_dedup_minhash") {
    val got = CorpusDedup.minhashSignatures(myDocs, "id", "body")
      .collect().map(_.toSeq).toSet
    val want = graft.queries.Dedup.qDedupMinhash(spark, dir)
      .collect().map(_.toSeq).toSet
    got shouldBe want
  }

  test("clusterLabels equals q_dedup_clusters") {
    val got = CorpusDedup.clusterLabels(myDocs, "id", "body")
      .collect().map(_.toSeq).toSet
    val want = graft.queries.Dedup.qDedupClusters(spark, dir)
      .collect().map(_.toSeq).toSet
    got shouldBe want
    got should not be empty
  }

  test("editVerify composes with nearDupPairs and matches q_dedup_editdist") {
    val pairs = CorpusDedup.nearDupPairs(myDocs, "id", "body")
      .filter(col("est_e4") >= graft.queries.Dedup.ClusterEdgeE4)
    val got = CorpusDedup.editVerify(myDocs, "id", "body", pairs)
      .collect().map(_.toSeq).toSet
    val want = graft.queries.Dedup.qDedupEditdist(spark, dir)
      .collect().map(_.toSeq).toSet
    got shouldBe want
    got should not be empty
  }

  test("editVerify: empty texts verify as identical; missing ids stay visible, unverified") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, ""), (3L, "some text")).toDF("id", "body")
    // pair (1,2): both empty — identical, distance 0, confirmed (not a
    // NULL division); pair (3,99): 99 is absent from docs — the row must
    // SURVIVE with NULL metrics (unverifiable), never vanish
    val pairs = Seq((1L, 2L), (3L, 99L)).toDF("da", "db")
    val got = CorpusDedup.editVerify(docs, "id", "body", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(4)), Option(r.get(5)))).toSet
    got shouldBe Set(
      (1L, 2L, Some(0L), Some(0L), Some(true)),
      (3L, 99L, None, None, None))
  }

  test("substrVerify: verbatim spans measured, gram-free pairs visible with zeros") {
    import spark.implicits._
    val shared = (1 to 25).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $shared gamma"),
      (2L, s"$shared delta epsilon zeta"),
      (3L, "entirely different words here")).toDF("id", "body")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("da", "db")
    val got = CorpusDedup.substrVerify(docs, "id", "body", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    // 25 shared tokens → run of 18 grams → 25-token span, above threshold
    got((1L, 2L)) shouldBe ((18L, 25L, true))
    got((1L, 3L)) shouldBe ((0L, 0L, false)) // no shared gram, still visible
  }

  test("deduplicate keeps caller columns and matches q_dedup_survivors") {
    val got = CorpusDedup.deduplicate(myDocs, "id", "body")
    got.columns.toSeq shouldBe
      Seq("id", "body", "source", "cluster_id", "n_merged", "is_representative")
    val gotRows = got.select("id", "cluster_id", "n_merged", "is_representative")
      .collect().map(_.toSeq).toSet
    val want = graft.queries.Dedup.qDedupSurvivors(spark, dir)
      .select("doc_id", "cluster_id", "n_merged", "is_representative")
      .collect().map(_.toSeq).toSet
    gotRows shouldBe want
  }

  test("cosineTopK on caller columns equals q_sim_topk") {
    val vecs = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id").as("vid"), col("embedding").as("emb"))
    val got = VectorSearch.cosineTopK(
        vecs, vecs.filter(col("vid") < 10), "vid", "emb", 5)
      .collect().map(_.toSeq).toSet
    val want = graft.queries.Similarity.qSimTopk(spark, dir)
      .collect().map(_.toSeq).toSet
    got shouldBe want
  }

  test("deduplicate collapses an inline non-fixture corpus end-to-end") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val docs = Seq(
      (1L, base, "a"),
      (2L, base + "tail words here", "a"),       // near-dup of 1
      (3L, base.replace("beta", "BETA2"), "b"),  // near-dup of 1
      (4L, "completely different content " + ("xyzzy plugh quux " * 20), "b"),
      (5L, "another unrelated document " + ("lorem ipsum dolor sit " * 20), "c"))
      .toDF("k", "txt", "src")
    val out = CorpusDedup.deduplicate(docs, "k", "txt")
      .orderBy("k").collect()
    val ids = out.map(_.getLong(0)).toSeq
    ids shouldBe Seq(1L, 4L, 5L) // 2 and 3 collapse into 1
    val rep = out.find(_.getLong(0) == 1L).get
    rep.getAs[Long]("n_merged") shouldBe 3L
    rep.getAs[Boolean]("is_representative") shouldBe true
    out.filter(_.getLong(0) != 1L)
      .foreach(_.getAs[Long]("n_merged") shouldBe 1L)
  }

  test("non-integral id columns are rejected loudly, not silently nulled") {
    import spark.implicits._
    val docs = Seq(("uuid-1", "some text here")).toDF("id", "txt")
    val vecs = Seq(("uuid-1", Seq(1.0f), 1L)).toDF("vid", "emb", "grp")
    an[IllegalArgumentException] should be thrownBy
      CorpusDedup.deduplicate(docs, "id", "txt")
    an[IllegalArgumentException] should be thrownBy
      VectorSearch.cosineTopK(vecs, vecs, "vid", "emb", 5)
    an[IllegalArgumentException] should be thrownBy
      VectorSearch.semanticVerdict(vecs, "vid", "emb", "grp")
  }

  test("semanticVerdict drops within-cluster near-dups, respects cluster walls") {
    import spark.implicits._
    val docs = Seq(
      // cluster 10: 2 is a near-copy of 1 (cos ≈ 1) → dropped; 1 kept
      (1L, Seq(1.0f, 0.0f, 0.0f), 10L),
      (2L, Seq(0.99f, 0.01f, 0.0f), 10L),
      // cluster 20: identical direction to vec 1, but a different cluster
      // — SemDeDup never compares across clusters, so it survives
      (3L, Seq(1.0f, 0.0f, 0.0f), 20L),
      // cluster 10: orthogonal to everything in its cluster → kept
      (4L, Seq(0.0f, 0.0f, 1.0f), 10L))
      .toDF("vid", "emb", "grp")
    val got = VectorSearch.semanticVerdict(docs, "vid", "emb", "grp")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    got shouldBe Map(1L -> true, 2L -> false, 3L -> true, 4L -> true)
  }

  test("snapshotDiff classifies a constructed delta exactly") {
    import spark.implicits._
    val curr = Seq((1L, 10L), (2L, 20L), (3L, 30L), (5L, 50L))
      .toDF("id", "fingerprint")
    val prev = Seq((1L, 10L), (2L, 99L), (4L, 40L), (5L, 50L))
      .toDF("id", "fingerprint")
    val got = TableMaintenance.snapshotDiff(curr, prev, "id", "fingerprint")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 1,5 unchanged; 2 changed; 3 only in curr (added); 4 only in prev
    got shouldBe Map(
      "unchanged" -> 2L, "changed" -> 1L, "added" -> 1L, "removed" -> 1L)
  }

  test("deletionManifest: request-list form agrees with the predicate form") {
    import spark.implicits._
    val t = (1L to 100L).map(i => (i, s"row$i")).toDF("k", "payload")
    val requests = Seq(3L, 7L, 7L, 50L, 999L).toDF("del_id") // dup + miss ok
    val byList = TableMaintenance
      .deletionManifest("t", t, "k", requests, "del_id").head()
    val byPred = TableMaintenance
      .deletionManifest("t", t, "k", col("k").isin(3L, 7L, 50L)).head()
    byList.toSeq shouldBe byPred.toSeq
    byList.getLong(1) shouldBe 100L // n_total
    byList.getLong(2) shouldBe 3L   // n_deleted (dup and missing ids ignored)
    byList.getLong(3) shouldBe 97L  // n_surviving
    // the surviving checksum actually tracks content: deleting one more
    // row changes it
    val more = TableMaintenance
      .deletionManifest("t", t, "k", col("k").isin(3L, 7L, 50L, 51L)).head()
    more.getLong(4) should not be byList.getLong(4)
  }
}
