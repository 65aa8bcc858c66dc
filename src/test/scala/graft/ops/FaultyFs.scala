package graft.ops

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, Path, RawLocalFileSystem}

/** Fault-injection filesystem for the crash-ordering specs: a local FS
  * under the `faulty://` scheme whose RENAMES fail (return false /
  * throw in the committer) when the destination matches the predicate
  * in [[FaultyFs.failWhen]]. Everything else delegates to the real
  * local filesystem — so a spec can run a REAL op against a
  * `faulty:///...` layout and make exactly one targeted metadata
  * operation die, reproducing the crash windows the ops document
  * (Bloom-before-keys, rename-aside compaction) without sleeping,
  * forking or mocking Spark.
  *
  * (Permission tricks cannot inject these faults here: tests run as
  * root, which bypasses file modes.)
  */
class FaultyFs extends RawLocalFileSystem {
  override def getScheme: String = "faulty"
  override def getUri: URI = URI.create("faulty:///")
  override def rename(src: Path, dst: Path): Boolean = {
    if (FaultyFs.shouldFail(dst)) false
    else super.rename(src, dst)
  }
}

object FaultyFs {
  /** Destination-path predicate for renames that must fail; None = no
    * injection. Matched against the scheme-less path string.
    */
  @volatile var failWhen: Option[String => Boolean] = None

  /** Every dst this injection actually failed (diagnostics: a crash
    * spec can assert WHICH renames its window killed).
    */
  val failedRenames = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  def shouldFail(dst: Path): Boolean = {
    val hit = failWhen.exists(_(dst.toUri.getPath))
    if (hit) failedRenames.add(dst.toUri.getPath)
    hit
  }

  /** Install the faulty scheme (FileSystem + FileContext bindings). */
  def install(conf: Configuration): Unit = {
    conf.set("fs.faulty.impl", classOf[FaultyFs].getName)
    conf.set("fs.AbstractFileSystem.faulty.impl",
      classOf[FaultyAbstractFs].getName)
  }
}

/** FileContext binding for the faulty scheme (writeBloom swaps the
  * filter through FileContext.rename).
  */
class FaultyAbstractFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new FaultyFs, conf, "faulty", false)
