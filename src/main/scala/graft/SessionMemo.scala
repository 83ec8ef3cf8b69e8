package graft

import org.apache.spark.sql.SparkSession

/** Session-scoped memoization keyed WEAKLY on the `SparkSession` (with a
  * plain string sub-key, usually the fixture dir): a collected session's
  * entries vanish with it, so long-lived processes that churn sessions —
  * cold-bench loops calling `newSession()` per run, notebook servers —
  * never accumulate strong `SparkSession` references (each of which pins
  * the session's cached frames) for process lifetime.
  *
  * Same contract as every session memo here: the files under the sub-key
  * are assumed immutable for the session's lifetime, and computation is
  * single-flighted under the memo's lock so concurrent first calls cannot
  * race two builds and leak the loser's cached blocks. */
final class SessionMemo[V] {
  private val bySession =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, V]]()

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
