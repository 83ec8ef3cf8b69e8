package graft.ops

import java.net.URI

import scala.language.existentials

import org.apache.hadoop.fs.{FSDataOutputStream, FSDataOutputStreamBuilder, Path, RawLocalFileSystem}

/** Mock of an S3-shaped object store for the lease's conditional-create
  * fence (`CorpusDedup.LeaseCreateMustPrefix`): the scheme `condstore` is
  * NOT in the atomic-create whitelist, and the only ATOMIC
  * create-if-absent it offers is the conditional-PUT-style mandatory
  * option [[CondStoreFs.CondKey]], honored by its `createFile` builder —
  * the If-None-Match shape S3-compatible stores expose through their
  * connectors. Per the Hadoop builder contract, a mandatory option the
  * store does not recognize is REJECTED at `build()`. Backed by the
  * local filesystem so the spec can race real file operations. */
class CondStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "condstore"
  override def getUri: URI = URI.create("condstore:///")
  override def createFile(path: Path)
      : FSDataOutputStreamBuilder[S, B] forSome {
        type S <: FSDataOutputStream
        type B <: FSDataOutputStreamBuilder[S, B]
      } =
    new CondStoreFs.Builder(this, path)
}

object CondStoreFs {
  /** The store's conditional-create option — the test stand-in for a
    * connector's If-None-Match create option. */
  val CondKey = "test.condstore.create.if-none-match"

  /** Conditional creates served — the spec asserts the fence actually
    * went through the conditional path, not a silent plain create. */
  val conditionalCreates = new java.util.concurrent.atomic.AtomicInteger(0)

  final class Builder(fs: CondStoreFs, p: Path)
      extends FSDataOutputStreamBuilder[FSDataOutputStream, Builder](fs, p) {
    override def getThisBuilder: Builder = this
    override def build(): FSDataOutputStream = {
      val keys = new java.util.HashSet[String](getMandatoryKeys)
      keys.remove(CondKey)
      if (!keys.isEmpty)
        throw new IllegalArgumentException(
          s"condstore: unsupported mandatory options: $keys")
      if (!getMandatoryKeys.contains(CondKey))
        // no conditional option requested: the store's plain create,
        // which for this mock (as for raw S3) carries NO atomicity claim
        return fs.create(getPath, true)
      // server-side conditional create (If-None-Match): atomic
      // create-if-absent; an existing object fails the precondition,
      // surfaced as the contract-mandated FileAlreadyExistsException
      val io = new java.io.File(getPath.toUri.getPath)
      Option(io.getParentFile).foreach(_.mkdirs())
      if (!io.createNewFile())
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(
          getPath.toString)
      conditionalCreates.incrementAndGet()
      fs.create(getPath, true)
    }
  }
}
