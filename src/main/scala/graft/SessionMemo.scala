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
  * process-lifetime pinning. LRU eviction releases old sessions
  * deterministically instead: a session-churning process (cold-bench
  * loops calling `newSession()` per run, notebook servers) holds at most
  * [[SessionMemo.MaxSessions]] sessions' memo entries, and an evicted
  * session's frames become unreachable (its cached blocks die with the
  * session). An evicted-but-still-live session merely rebuilds its memo
  * on next access — and the plan-equality cache-manager lookup typically
  * re-serves the still-cached blocks, so eviction costs a frame rebuild,
  * not a recompute.
  *
  * Same contract as every session memo here: the files under the sub-key
  * are assumed immutable for the session's lifetime, and computation is
  * single-flighted under the memo's lock so concurrent first calls cannot
  * race two builds and leak the loser's cached blocks. */
final class SessionMemo[V] {
  private val bySession =
    new java.util.LinkedHashMap[SparkSession,
        scala.collection.mutable.Map[String, V]](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[SparkSession,
            scala.collection.mutable.Map[String, V]]): Boolean =
        size() > SessionMemo.MaxSessions
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
