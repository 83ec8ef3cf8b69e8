package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.syntax._

/** The single-writer FENCE (`<indexDir>/_lock`): every in-place mutator
  * acquires the lease before touching an artifact and releases it in
  * `finally`, so a maintenance compaction racing a streaming ingest on
  * one dir can no longer interleave two rename promotions (the failure
  * mode that drops an artifact generation). This spec proves the contract
  * the docs used to merely state: while one mutator holds the dir,
  * EXACTLY ONE writer wins and the other refuses loudly — plus the
  * crash-recovery face (stale-lease takeover) and the release-on-failure
  * face (a refused mutation must not wedge the dir). */
class IndexLeaseSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def t(id: Long, tail: String) = (id,
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda " +
      "mu nu xi omicron pi rho sigma tau " + tail)

  private def docsDf(rows: (Long, String)*) = {
    val sess = spark
    import sess.implicits._
    rows.toDF("doc_id", "text")
  }

  private def freshIndex(prefix: String): String = {
    val tmp = java.nio.file.Files.createTempDirectory(prefix).toString
    CorpusDedup.buildIndex(
      docsDf(t(1, "one"), t(2, "two")), "doc_id", "text", tmp)
    tmp
  }

  test("a held lease makes every other mutator refuse loudly, naming the holder") {
    val dir = freshIndex("lease-refuse")
    val lease = CorpusDedup.acquireLease(spark, dir, "ingest")
    try {
      val batch = docsDf(t(10, "ten"))
      val e1 = intercept[IllegalStateException] {
        CorpusDedup.appendToIndex(batch, "doc_id", "text", dir)
      }
      e1.getMessage should include("another writer")
      e1.getMessage should include("op=ingest")
      val e2 = intercept[IllegalStateException] {
        CorpusDedup.compactIndex(spark, dir)
      }
      e2.getMessage should include("op=ingest")
      val sess = spark
      import sess.implicits.{localSeqToDatasetHolder, newLongEncoder}
      val e3 = intercept[IllegalStateException] {
        CorpusDedup.removeFromIndex(spark, dir, Seq(1L).toDF("doc_id"))
      }
      e3.getMessage should include("refusing op=forget")
      intercept[IllegalStateException] {
        CorpusDedup.vacuumIndex(spark, dir)
      }
    } finally CorpusDedup.releaseLease(lease)
    // released: the same mutation now proceeds
    CorpusDedup.appendToIndex(docsDf(t(10, "ten")), "doc_id", "text", dir)
    CorpusDedup.fromIndex(spark, dir).signatures.count() shouldBe 3L
  }

  test("compaction racing an in-flight ingest: exactly one wins, the loser refuses") {
    // Deterministic concurrency: a writer thread takes the lease through
    // the real withLease bracket and parks inside the critical section on
    // a latch; the main thread's compaction then races it and MUST lose.
    val dir = freshIndex("lease-race")
    val inCritical = new java.util.concurrent.CountDownLatch(1)
    val mayFinish = new java.util.concurrent.CountDownLatch(1)
    val writer = new Thread(() => {
      CorpusDedup.withLease(spark, dir, "ingest") {
        inCritical.countDown()
        mayFinish.await()
      }
    })
    writer.start()
    inCritical.await()
    try {
      val e = intercept[IllegalStateException] {
        CorpusDedup.compactIndex(spark, dir)
      }
      e.getMessage should include("another writer")
    } finally {
      mayFinish.countDown()
      writer.join()
    }
    // the ingest released on exit — the compaction now wins
    CorpusDedup.compactIndex(spark, dir)
    CorpusDedup.fromIndex(spark, dir).postings.count() should be > 0L
  }

  test("stale lease (crashed holder): takeover after ttl, with the index intact") {
    val dir = freshIndex("lease-stale")
    // a crashed mutator's leftover lock, mtime pushed past the ttl
    val lease = CorpusDedup.acquireLease(spark, dir, "ingest")
    lease.fs.setTimes(lease.path, System.currentTimeMillis() - 3600L * 1000L, -1)
    val prev = sys.props.get("graft.index.lease.ttlMs")
    sys.props("graft.index.lease.ttlMs") = "1000"
    try {
      // takeover: the new mutator proceeds instead of wedging forever
      CorpusDedup.compactIndex(spark, dir)
      CorpusDedup.fromIndex(spark, dir).signatures.count() shouldBe 2L
    } finally {
      prev match {
        case Some(v) => sys.props("graft.index.lease.ttlMs") = v
        case None => sys.props -= "graft.index.lease.ttlMs"
      }
    }
    // the takeover's own lease was released on exit
    lease.fs.exists(lease.path) shouldBe false
  }

  test("a refused mutation releases the lease (no wedged dir after failure)") {
    val dir = freshIndex("lease-fail")
    // duplicate-id refusal fires INSIDE the leased section
    intercept[IllegalArgumentException] {
      CorpusDedup.appendToIndex(docsDf(t(1, "one")), "doc_id", "text", dir)
    }
    val (fs, p) = {
      val hp = new org.apache.hadoop.fs.Path(s"$dir/_lock")
      (hp.getFileSystem(spark.sessionState.newHadoopConf()), hp)
    }
    fs.exists(p) shouldBe false
    // and the dir accepts the next mutator
    CorpusDedup.compactIndex(spark, dir)
  }

  test("IVF twin: a held lease fences list mutations the same way") {
    val sess = spark
    import sess.implicits.{localSeqToDatasetHolder, newLongEncoder, newProductEncoder}
    val dir = java.nio.file.Files.createTempDirectory("lease-ivf").toString
    val vecs = (1L to 6L).map(i =>
        (i, Seq.tabulate(graft.queries.Similarity.Dim)(d => (i + d).toFloat)))
      .toDF("vec_id", "embedding")
    VectorSearch.buildIvfIndex(vecs, "vec_id", "embedding", dir)
    val lease = CorpusDedup.acquireLease(spark, dir, "compact")
    try {
      val e = intercept[IllegalStateException] {
        VectorSearch.removeFromIvfIndex(spark, dir, Seq(1L).toDF("vec_id"))
      }
      e.getMessage should include("op=compact")
    } finally CorpusDedup.releaseLease(lease)
    VectorSearch.removeFromIvfIndex(spark, dir, Seq(1L).toDF("vec_id"))
    spark.catalog.refreshByPath(dir)
    VectorSearch.fromIvfIndex(spark, dir).vectors.count() shouldBe 5L
  }

  test("heartbeat: a live-but-slow holder outlasting the ttl is NOT usurped") {
    // ttl set BEFORE acquiring, so the holder's heartbeat runs at ttl/3
    // and keeps renewing the lock mtime — a second mutator arriving well
    // past the ttl must still refuse (the holder is alive, just slow),
    // instead of presuming a crash and interleaving rename promotions.
    val dir = freshIndex("lease-heartbeat")
    val prev = sys.props.get("graft.index.lease.ttlMs")
    sys.props("graft.index.lease.ttlMs") = "600"
    try {
      val lease = CorpusDedup.acquireLease(spark, dir, "compact")
      try {
        Thread.sleep(1500L) // 2.5× the ttl; heartbeat renews every 200ms
        val e = intercept[IllegalStateException] {
          CorpusDedup.acquireLease(spark, dir, "ingest")
        }
        e.getMessage should include("another writer")
        lease.lost.get() shouldBe false
      } finally CorpusDedup.releaseLease(lease)
      // released cleanly: the next mutator proceeds
      CorpusDedup.withLease(spark, dir, "ingest") { () }
    } finally prev match {
      case Some(v) => sys.props("graft.index.lease.ttlMs") = v
      case None => sys.props -= "graft.index.lease.ttlMs"
    }
  }

  test("fenced release: a usurped holder does not delete the new holder's lock") {
    val dir = freshIndex("lease-fenced")
    val lease = CorpusDedup.acquireLease(spark, dir, "compact")
    // simulate a ttl-overrun takeover: the lock now carries another
    // holder's token (what acquireLease's takeover path writes)
    lease.fs.delete(lease.path, false)
    val out = lease.fs.create(lease.path, false)
    try out.write("op=ingest pid=999 id=usurper".getBytes("UTF-8"))
    finally out.close()
    CorpusDedup.releaseLease(lease)
    // the usurper's lock survived the original holder's release
    lease.fs.exists(lease.path) shouldBe true
    val in = lease.fs.open(lease.path)
    val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    txt should include("usurper")
    lease.fs.delete(lease.path, false) // cleanup
  }

  test("atomic-create capability probe: lease-safe schemes vs raw object stores") {
    for (s <- Seq("file", "hdfs", "viewfs", "abfs", null))
      CorpusDedup.leaseCreateIsAtomic(s) shouldBe true
    for (s <- Seq("s3a", "s3", "s3n", "gs", "wasb"))
      CorpusDedup.leaseCreateIsAtomic(s) shouldBe false
  }

  test("claimed takeover: N usurpers racing one stale lock — exactly one claims") {
    // The round-11 fence's residual race: two usurpers that both observed
    // the SAME stale holder both delete-and-create, and the second delete
    // removes the first usurper's FRESH lock. The claim is an atomic
    // RENAME to a caller-unique path, so at most one racer ever deletes
    // anything — pinned here by racing the claim itself.
    val dir = java.nio.file.Files.createTempDirectory("lease-claim").toString
    val p = new org.apache.hadoop.fs.Path(s"$dir/_lock")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val stale = "op=ingest pid=1 id=crashed ts=0"
    val out = fs.create(p, false)
    try out.write(stale.getBytes("UTF-8")) finally out.close()
    val start = new java.util.concurrent.CountDownLatch(1)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        start.await()
        if (CorpusDedup.claimStaleLock(fs, p, stale)) { wins.incrementAndGet(); () }
      })
    }
    threads.foreach(_.start())
    start.countDown()
    threads.foreach(_.join())
    wins.get() shouldBe 1
    // the winner owns the takeover: the lock path is now absent
    fs.exists(p) shouldBe false
  }

  test("a claim aimed at a superseded stale lock restores the fresh holder's lock") {
    // Deterministic pin of the old double-delete interleaving: usurper B
    // observed stale holder T, but usurper A already completed its
    // takeover and created a FRESH lock. The old code had B delete A's
    // fresh lock unconditionally; the claimed takeover verifies the
    // renamed content against what it observed and puts the fresh lock
    // STRAIGHT BACK.
    val dir = java.nio.file.Files.createTempDirectory("lease-restore").toString
    val p = new org.apache.hadoop.fs.Path(s"$dir/_lock")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val fresh = "op=compact pid=2 id=new-holder ts=9"
    val out = fs.create(p, false)
    try out.write(fresh.getBytes("UTF-8")) finally out.close()
    CorpusDedup.claimStaleLock(
      fs, p, observedOwner = "op=ingest pid=1 id=crashed ts=0") shouldBe false
    // the fresh holder's lock survived, content intact
    fs.exists(p) shouldBe true
    val in = fs.open(p)
    val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    txt shouldBe fresh
    // and no orphaned claim file was left behind
    fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).count(_.startsWith("_lock")) shouldBe 1
  }

  test("heartbeat detects a foreign owner; the write fence then refuses") {
    val dir = freshIndex("lease-lost")
    val prev = sys.props.get("graft.index.lease.ttlMs")
    sys.props("graft.index.lease.ttlMs") = "300" // heartbeat every 100ms
    try {
      val lease = CorpusDedup.acquireLease(spark, dir, "compact")
      try {
        // a usurper replaced the lock mid-operation (ttl overrun)
        lease.fs.delete(lease.path, false)
        val out = lease.fs.create(lease.path, false)
        try out.write("op=ingest pid=999 id=usurper".getBytes("UTF-8"))
        finally out.close()
        val deadline = System.currentTimeMillis() + 5000L
        while (!lease.lost.get() && System.currentTimeMillis() < deadline)
          Thread.sleep(20L)
        lease.lost.get() shouldBe true
        // the compute→write fence refuses to start the write phase
        val e = intercept[IllegalStateException] {
          lease.checkStillHeld("append the batch artifacts")
        }
        e.getMessage should include("lost")
      } finally CorpusDedup.releaseLease(lease)
      // the usurper's lock survived the fenced release
      lease.fs.exists(lease.path) shouldBe true
      lease.fs.delete(lease.path, false) // cleanup
    } finally prev match {
      case Some(v) => sys.props("graft.index.lease.ttlMs") = v
      case None => sys.props -= "graft.index.lease.ttlMs"
    }
  }

  test("heartbeat grace: one transient missing-lock read does not kill the lease") {
    // claimStaleLock's verify-and-restore makes the lock path vanish for
    // a moment when a mis-aimed takeover puts a live lock back; the
    // heartbeat tolerates ONE missing read (a foreign owner is an instant
    // loss; two consecutive misses are a genuine deletion).
    val dir = freshIndex("lease-grace")
    val prev = sys.props.get("graft.index.lease.ttlMs")
    sys.props("graft.index.lease.ttlMs") = "1500" // heartbeat every 500ms
    try {
      val lease = CorpusDedup.acquireLease(spark, dir, "compact")
      try {
        val bytes = lease.owner.getBytes("UTF-8")
        // vanish-and-restore across (at most) one beat
        lease.fs.delete(lease.path, false)
        Thread.sleep(600L) // one beat observes the miss
        val out = lease.fs.create(lease.path, false)
        try out.write(bytes) finally out.close()
        Thread.sleep(1200L) // two beats observe the owner again
        lease.lost.get() shouldBe false
        // a PERSISTENT deletion, by contrast, is a loss within two beats
        lease.fs.delete(lease.path, false)
        val deadline = System.currentTimeMillis() + 5000L
        while (!lease.lost.get() && System.currentTimeMillis() < deadline)
          Thread.sleep(20L)
        lease.lost.get() shouldBe true
      } finally CorpusDedup.releaseLease(lease)
    } finally prev match {
      case Some(v) => sys.props("graft.index.lease.ttlMs") = v
      case None => sys.props -= "graft.index.lease.ttlMs"
    }
  }

  test("heartbeat: renewals failing for a full ttl flip lost; transient I/O failures do not") {
    // The unit face of the loss rule a live FileSystem can't fault-inject:
    // a holder partitioned from the store (every readLockOwner/setTimes
    // throwing) must NOT sail through the write fence once the outage
    // outlives the ttl — a usurper may legitimately have claimed the
    // un-renewed lock during the partition.
    def boom(): Option[String] = throw new java.io.IOException("partition")
    val lost1 = new java.util.concurrent.atomic.AtomicBoolean(false)
    val loop1 = new CorpusDedup.HeartbeatLoop("me", 60L, "test", lost1)
    loop1.beat(() => boom(), () => ()) shouldBe true // within ttl: transient
    lost1.get() shouldBe false
    Thread.sleep(80L) // the outage outlives the ttl with no renewal
    loop1.beat(() => boom(), () => ()) shouldBe false
    lost1.get() shouldBe true
    // a SUCCESSFUL renewal resets the clock: the same late failure is
    // transient again when a renewal landed in between
    val lost2 = new java.util.concurrent.atomic.AtomicBoolean(false)
    val loop2 = new CorpusDedup.HeartbeatLoop("me", 60L, "test", lost2)
    Thread.sleep(80L)
    loop2.beat(() => Some("me"), () => ()) shouldBe true // renewed
    loop2.beat(() => boom(), () => ()) shouldBe true // young again
    lost2.get() shouldBe false
    // and a renew() that itself throws counts as a failed renewal
    val lost3 = new java.util.concurrent.atomic.AtomicBoolean(false)
    val loop3 = new CorpusDedup.HeartbeatLoop("me", 60L, "test", lost3)
    Thread.sleep(80L)
    loop3.beat(() => Some("me"),
      () => throw new java.io.IOException("renew failed")) shouldBe false
    lost3.get() shouldBe true
  }

  test("streams hold the lease per batch: no lock left after a drained mutation chain") {
    // transitively: gateStream/ingestStream mutate via appendToIndex,
    // which acquires and releases per micro-batch — after the drain the
    // dir must be lock-free for the maintenance schedule
    val dir = freshIndex("lease-stream")
    CorpusDedup.appendToIndex(docsDf(t(20, "twenty")), "doc_id", "text", dir)
    val (fs, p) = {
      val hp = new org.apache.hadoop.fs.Path(s"$dir/_lock")
      (hp.getFileSystem(spark.sessionState.newHadoopConf()), hp)
    }
    fs.exists(p) shouldBe false
    CorpusDedup.compactIndex(spark, dir)
    fs.exists(p) shouldBe false
  }
}
