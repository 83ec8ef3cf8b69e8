package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.syntax._

/** The `_schemas` sidecar contract: every raw read of a stored artifact
  * survives a ZERO-data-file directory. A pairless corpus writes an empty
  * `edges/`; an erasure can empty any artifact; the promotion window of an
  * interrupted rewrite can crash into one — and before the sidecar, each
  * of those wedged `removeFromIndex` / `compactIndex` /
  * `erasureCertificate` / fresh-session appends with "Unable to infer
  * schema", which broke the forget queue's crash-anywhere-repaired-by-
  * redelivery contract (every redelivery re-threw). This spec pins the
  * whole lifecycle over an index whose edges artifact holds no files. */
class ArtifactSchemaSpec extends AnyFunSuite with Matchers with SparkSpec {

  // Five documents from five disjoint 21-word templates: no shared
  // shingles, no shared band buckets, zero near-dup pairs → empty edges/.
  private val templates = Seq(
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu " +
      "nu xi omicron pi rho sigma tau upsilon phi",
    "red orange yellow green blue indigo violet crimson teal amber coral " +
      "jade ivory onyx pearl ruby topaz garnet opal quartz slate",
    "north south east west summit valley river basin canyon mesa tundra " +
      "prairie fjord atoll lagoon reef dune crag moor heath glen",
    "oak elm ash birch cedar maple willow poplar spruce fir pine yew " +
      "hazel alder rowan beech hornbeam larch juniper cypress holly",
    "zero one two three four five six seven eight nine ten eleven twelve " +
      "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty")

  private def docs = {
    val sess = spark
    import sess.implicits._
    templates.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
      .toDF("doc_id", "text")
  }

  private def buildPairless(): String = {
    val tmp = java.nio.file.Files.createTempDirectory("schema-spec").toString
    CorpusDedup.buildIndex(docs, "doc_id", "text", tmp)
    tmp
  }

  test("a pairless build writes the sidecar and a zero-file edges artifact") {
    val dir = buildPairless()
    CorpusDedup.dataFileCount(spark, s"$dir/edges") shouldBe 0L
    val schemas = CorpusDedup.artifactSchemas(spark, dir)
    schemas.keySet shouldBe Set(
      "postings", "capped", "prefix", "signatures", "bands", "edges")
    // the recorded schema is the inference-normalized (all-nullable) form
    schemas("edges").fieldNames should contain allOf ("da", "db")
    schemas.values.foreach(_.fields.foreach(_.nullable shouldBe true))
  }

  test("absent sidecar answers immediately; an in-flight fallback commit is retried") {
    // A dir that simply has no _schemas yet (fresh build, pre-sidecar
    // index) must NOT pay the commit-window retry sleep — only a read
    // that finds the fallback delete+rename visibly in flight (its
    // _schemas.tmp present) waits for the rename to land.
    val dir = java.nio.file.Files.createTempDirectory("schema-retry").toString
    val t0 = System.nanoTime()
    CorpusDedup.artifactSchemas(spark, dir) shouldBe empty
    (System.nanoTime() - t0) should be < 90L * 1000000L // no 100 ms sleep
    // now simulate the window: tmp present, destination renamed in late
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(s"$dir/_schemas")
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/_schemas.tmp")
    val fs = p.getFileSystem(conf)
    val line = "edges\t" + org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        "da", org.apache.spark.sql.types.LongType))).json + "\n"
    val out = fs.create(tmp, true)
    try out.write(line.getBytes("UTF-8")) finally out.close()
    val committer = new Thread(() => {
      Thread.sleep(30L)
      val o2 = fs.create(p, true)
      try o2.write(line.getBytes("UTF-8")) finally o2.close()
    })
    committer.start()
    try {
      val read = CorpusDedup.artifactSchemas(spark, dir)
      read.keySet shouldBe Set("edges")
    } finally committer.join()
  }

  test("fresh-session raw reads of the empty artifact serve an empty frame") {
    val dir = buildPairless()
    // a file COPY has no catalog tables — every read is raw
    val copy = graft.TempIndexDirs.copyOf(dir, "schema-spec-copy")
    val idx = CorpusDedup.fromIndex(spark, copy)
    idx.edges.count() shouldBe 0L
    idx.edges.schema.fieldNames should contain allOf ("da", "db")
    idx.postings.count() should be > 0L
  }

  test("erasureCertificate certifies clean over a zero-file artifact") {
    val sess = spark
    import sess.implicits.{localSeqToDatasetHolder, newLongEncoder}
    val dir = buildPairless()
    val copy = graft.TempIndexDirs.copyOf(dir, "schema-spec-cert")
    val cert = CorpusDedup.erasureCertificate(
      spark, copy, Seq(99L).toDF("doc_id")).collect()
    cert.length shouldBe 6
    cert.foreach(_.getBoolean(2) shouldBe true)
  }

  test("removeFromIndex and redelivery survive zero-file artifacts") {
    val sess = spark
    import sess.implicits.{localSeqToDatasetHolder, newLongEncoder}
    val dir = buildPairless()
    val copy = graft.TempIndexDirs.copyOf(dir, "schema-spec-forget")
    val ids = Seq(2L).toDF("doc_id")
    CorpusDedup.removeFromIndex(spark, copy, ids)
    CorpusDedup.fromIndex(spark, copy).signatures
      .select($"doc_id").collect().map(_.getLong(0)).sorted shouldBe
      Array(1L, 3L, 4L, 5L)
    // redelivered erasure batch (the forget-queue contract): idempotent,
    // and it must re-run the SAME anti-join rewrites over the now-possibly-
    // empty artifacts without throwing
    CorpusDedup.removeFromIndex(spark, copy, ids)
    CorpusDedup.erasureCertificate(spark, copy, ids)
      .collect().foreach(_.getBoolean(2) shouldBe true)
  }

  test("compactIndex compacts an index with a zero-file artifact") {
    val dir = buildPairless()
    val copy = graft.TempIndexDirs.copyOf(dir, "schema-spec-compact")
    CorpusDedup.compactIndex(spark, copy)
    CorpusDedup.dataFileCount(spark, s"$copy/edges") shouldBe 0L
    CorpusDedup.fromIndex(spark, copy).postings.count() should be > 0L
  }

  test("fresh-session append into a zero-file edges artifact registers via the sidecar") {
    val sess = spark
    import sess.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val dir = buildPairless()
    val copy = graft.TempIndexDirs.copyOf(dir, "schema-spec-append")
    // the batch is another disjoint template: still no pairs, so the
    // edges append must register the catalog table over a dir with zero
    // data files — exactly where inference used to throw
    val batch = Seq((10L,
      "sun moon star comet nebula quasar pulsar nova aurora eclipse " +
        "zenith nadir orbit apogee perigee halo corona flare plasma " +
        "photon meteor")).toDF("doc_id", "text")
    CorpusDedup.appendToIndex(batch, "doc_id", "text", copy)
    CorpusDedup.fromIndex(spark, copy).signatures.count() shouldBe 6L
    CorpusDedup.fromIndex(spark, copy).edges.count() shouldBe 0L
  }

  test("pre-sidecar index: first mutation upgrades it lazily") {
    val dir = buildPairless()
    val copy = graft.TempIndexDirs.copyOf(dir, "schema-spec-legacy")
    // simulate a pre-sidecar index by deleting the sidecar
    new java.io.File(s"$copy/_schemas").delete() shouldBe true
    CorpusDedup.artifactSchemas(spark, copy) shouldBe empty
    CorpusDedup.compactIndex(spark, copy)
    // the mutator derived the fileful artifacts by inference and the
    // zero-file edges from the builder expressions (canonical fallback)
    val schemas = CorpusDedup.artifactSchemas(spark, copy)
    schemas.keySet shouldBe Set(
      "postings", "capped", "prefix", "signatures", "bands", "edges")
    schemas("edges").fieldNames should contain allOf ("da", "db")
  }

  test("IVF: erase-all then certificate/compact/redelivery over empty lists") {
    val sess = spark
    import sess.implicits.{localSeqToDatasetHolder, newLongEncoder, newProductEncoder}
    val dir = java.nio.file.Files.createTempDirectory("schema-spec-ivf").toString
    val vecs = (1L to 8L).map(i =>
        (i, Seq.tabulate(graft.queries.Similarity.Dim)(
          d => (i * 10 + d).toFloat)))
      .toDF("vec_id", "embedding")
    VectorSearch.buildIvfIndex(vecs, "vec_id", "embedding", dir)
    CorpusDedup.artifactSchemas(spark, dir).keySet shouldBe
      Set("centroids", "vectors")
    val all = (1L to 8L).toDF("vec_id")
    VectorSearch.removeFromIvfIndex(spark, dir, all)
    // catalog refresh so this session's cached listing is dropped, then
    // the raw path: zero-file lists serve empty, never throw
    spark.catalog.refreshByPath(dir)
    VectorSearch.fromIvfIndex(spark, dir).vectors.count() shouldBe 0L
    VectorSearch.erasureCertificate(spark, dir, all)
      .collect().foreach(_.getBoolean(2) shouldBe true)
    VectorSearch.removeFromIvfIndex(spark, dir, all) // redelivery
    VectorSearch.compactIvfIndex(spark, dir)
    VectorSearch.fromIvfIndex(spark, dir).vectors.count() shouldBe 0L
  }
}
