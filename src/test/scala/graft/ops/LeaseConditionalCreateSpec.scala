package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The conditional-create lease fence on S3-shaped stores
  * (`CorpusDedup.LeaseCreateMustPrefix`): a scheme whose plain
  * create-if-absent is non-atomic gets a REAL single-writer fence when
  * the connector's conditional-PUT create option is configured — and the
  * best-effort degrade warning is retained ONLY for schemes with neither
  * capability. Driven against [[CondStoreFs]], a mocked store whose only
  * atomic create is the conditional option (rejecting unknown mandatory
  * options at build, per the Hadoop builder contract). */
class LeaseConditionalCreateSpec extends AnyFunSuite with Matchers
    with SparkSpec {

  private def hc = spark.sparkContext.hadoopConfiguration

  private def withCondStore[A](musts: Option[String])(body: String => A): A = {
    hc.set("fs.condstore.impl", classOf[CondStoreFs].getName)
    // fresh FS instance per test: the cached instance pins the conf it
    // was first created with, which would leak one test's musts into the
    // next
    hc.set("fs.condstore.impl.disable.cache", "true")
    musts match {
      case Some(m) => hc.set(CorpusDedup.LeaseCreateMustPrefix + "condstore", m)
      case None => hc.unset(CorpusDedup.LeaseCreateMustPrefix + "condstore")
    }
    try body("condstore://" +
      java.nio.file.Files.createTempDirectory("condlease").toString)
    finally hc.unset(CorpusDedup.LeaseCreateMustPrefix + "condstore")
  }

  test("configured conditional create fences a non-atomic scheme: no degrade warning, holder refusal, conditional path exercised") {
    withCondStore(Some(s"${CondStoreFs.CondKey}=*")) { dir =>
      val before = CondStoreFs.conditionalCreates.get()
      val lease = CorpusDedup.acquireLease(spark, dir, "ingest")
      try {
        // the lock went through the store's conditional create
        CondStoreFs.conditionalCreates.get() should be > before
        // the fence is REAL here — no best-effort degrade recorded
        CorpusDedup.nonAtomicSchemeWarned.contains("condstore") shouldBe false
        // and a second mutator refuses, naming the holder
        val err = the[IllegalStateException] thrownBy
          CorpusDedup.acquireLease(spark, dir, "compact")
        err.getMessage should include("being mutated by another writer")
      } finally CorpusDedup.releaseLease(lease)
      // released: the next acquire wins again, through the same path
      CorpusDedup.releaseLease(
        CorpusDedup.acquireLease(spark, dir, "compact"))
    }
  }

  test("racing acquirers through the conditional path: exactly one wins") {
    withCondStore(Some(s"${CondStoreFs.CondKey}=*")) { dir =>
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        val results = (1 to 8).map { i =>
          pool.submit(new java.util.concurrent.Callable[Boolean] {
            override def call(): Boolean =
              try {
                // winners HOLD (no release): every later acquirer must
                // observe the single fresh holder and refuse
                CorpusDedup.acquireLease(spark, dir, s"op$i"); true
              } catch { case _: IllegalStateException => false }
          })
        }
        results.count(_.get()) shouldBe 1
      } finally pool.shutdown()
    }
  }

  test("a mandatory option the store cannot honor fails LOUDLY at acquire — never a silent degrade") {
    withCondStore(Some("test.condstore.not.a.real.option=*")) { dir =>
      val err = the[IllegalArgumentException] thrownBy
        CorpusDedup.acquireLease(spark, dir, "ingest")
      err.getMessage should include("unsupported mandatory options")
    }
  }

  test("no conditional option configured: the degrade warning is recorded for the incapable scheme (and only then)") {
    withCondStore(None) { dir =>
      CorpusDedup.releaseLease(
        CorpusDedup.acquireLease(spark, dir, "ingest"))
      CorpusDedup.nonAtomicSchemeWarned.contains("condstore") shouldBe true
    }
  }
}
