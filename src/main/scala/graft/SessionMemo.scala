package graft

import org.apache.spark.sql.SparkSession

/** Session-scoped memoization keyed on the `SparkSession` (with a plain
  * string sub-key, usually the fixture dir), BOUNDED to the
  * [[SessionMemo.MaxSessions]] most recently used sessions.
  *
  * Why bounded eviction rather than weak keys: the memoized values are
  * `DataFrame`s (or wrappers), which strongly reference their own
  * `SparkSession` — the documented `WeakHashMap` caveat ("the value
  * objects ... must not strongly refer to its own key") means a weak-keyed
  * map could never actually collect these entries, silently reverting to
  * process-lifetime pinning. LRU eviction bounds the MEMO MAP
  * deterministically instead: a session-churning process (cold-bench
  * loops calling `newSession()` per run, notebook servers) holds at most
  * [[SessionMemo.MaxSessions]] sessions' memo entries.
  *
  * Eviction does NOT by itself release cached blocks: Spark's
  * `CacheManager` lives in `SharedState` — shared across every session of
  * one `SparkContext` — and holds cached `InMemoryRelation`s STRONGLY, so
  * dropping the memo entry leaves the evicted session's persisted frames
  * pinned in the executor block store. Memos whose values hold persisted
  * frames must therefore pass `onEvict` to unpersist them on eviction;
  * value types with nothing persisted (plain tuples) use the no-op
  * default. An evicted-but-still-live session merely rebuilds its memo
  * (and re-persists) on next access.
  *
  * Same contract as every session memo here: the files under the sub-key
  * are assumed immutable for the session's lifetime, and computation is
  * single-flighted under the memo's lock so concurrent first calls cannot
  * race two builds and leak the loser's cached blocks. */
final class SessionMemo[V](onEvict: V => Unit = (_: V) => ()) {
  private val bySession =
    new java.util.LinkedHashMap[SparkSession,
        scala.collection.mutable.Map[String, V]](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[SparkSession,
            scala.collection.mutable.Map[String, V]]): Boolean = {
        val evict = size() > SessionMemo.MaxSessions
        // best-effort: an unpersist that throws (session already stopped)
        // must not poison the insert that triggered the eviction
        if (evict) e.getValue.values.foreach(v =>
          try onEvict(v) catch { case _: Exception => () })
        evict
      }
    }

  def getOrElseUpdate(spark: SparkSession, key: String)(build: => V): V =
    bySession.synchronized {
      val perDir = Option(bySession.get(spark)).getOrElse {
        val m = scala.collection.mutable.Map.empty[String, V]
        bySession.put(spark, m)
        m
      }
      perDir.getOrElseUpdate(key, build)
    }
}

object SessionMemo {
  /** Sessions retained per memo — enough for a main session plus a few
    * concurrently-live derived ones; churn beyond this evicts eldest. */
  val MaxSessions = 4
}

/** Registry for process-lifetime temp directories holding persisted index
  * artifacts (the dedup / IVF stored-index demos): each registered dir is
  * recursively deleted by ONE JVM shutdown hook, so session churn cannot
  * leak index copies on disk past the process. */
object TempIndexDirs {
  private val dirs = scala.collection.mutable.Set.empty[String]
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteAll()))

  /** Create and register a fresh temp directory under `prefix`. */
  def create(prefix: String): String = dirs.synchronized {
    hookInstalled
    val d = java.nio.file.Files.createTempDirectory(prefix).toString
    dirs += d
    d
  }

  /** Recursively copy an on-disk index into a fresh registered temp dir.
    * The compaction queries mutate a COPY so the per-JVM stored-index
    * memos they share with the probe/append queries stay untouched —
    * each lifecycle query prices exactly its own operator. */
  def copyOf(srcDir: String, prefix: String): String = {
    val dst = create(prefix)
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    val src = Paths.get(srcDir)
    // Files.walk holds open directory handles until closed — an index
    // tree is hundreds of files and the bench/scale lanes copy indexes
    // repeatedly, so an unclosed stream leaks fds toward EMFILE.
    val walk = Files.walk(src)
    try walk.iterator().asScala.foreach { p =>
      val t = Paths.get(dst).resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
    } finally walk.close()
    dst
  }

  private def deleteAll(): Unit = dirs.synchronized {
    dirs.foreach { d =>
      try {
        import java.nio.file.{Files, Paths}
        import scala.jdk.CollectionConverters._
        val root = Paths.get(d)
        if (Files.exists(root)) {
          Files.walk(root).iterator().asScala.toSeq.reverseIterator
            .foreach(p => try Files.deleteIfExists(p) catch { case _: Exception => () })
        }
      } catch { case _: Exception => () } // best-effort at JVM exit
    }
    dirs.clear()
  }
}
