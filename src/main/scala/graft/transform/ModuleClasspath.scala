package graft.transform

import java.io.File
import java.net.URLClassLoader
import scala.collection.concurrent.TrieMap

/** Drop-in module loading — the reference's hot-import surface
  * (task.py:129-130: importlib + reload of `.py` files dropped into
  * `module/`; processor.py:219-222 routes them there) re-expressed for
  * the JVM: the watcher routes `.jar` files into `workDir/module`
  * (watch/Watcher.scala), and every reflective load (transform modules,
  * `custom` tasks, `exec` mains) consults a URLClassLoader over that
  * directory's jars AFTER the launch classpath.
  *
  * The loader is rebuilt whenever the jar set CHANGES (name, size or
  * mtime) — the JVM analog of the reference's unconditional
  * `importlib.reload`: dropping a new jar (or a new version of one) is
  * visible to the NEXT task run without restarting the daemon. Old
  * loaders are simply dropped (no explicit close: a running task may
  * still hold classes from them; they unload with GC once unreferenced
  * — the same lifecycle reloaded Python modules have).
  *
  * Launch-classpath classes always win: a jar cannot shadow the
  * engine's own classes (parent-first delegation), which also keeps the
  * SPI interfaces ([[TransformModule]], `graft.tasks.CustomTask`)
  * loaded once, so jar-provided implementations satisfy the engine's
  * `isInstanceOf` checks.
  */
object ModuleClasspath {

  private type Sig = Seq[(String, Long, Long)] // (path, mtime, size)

  private val loaders = TrieMap.empty[String, (Sig, URLClassLoader)]

  private def signature(dir: File): Sig =
    Option(dir.listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.isFile && f.getName.endsWith(".jar"))
      .sortBy(_.getName)
      .map(f => (f.getPath, f.lastModified(), f.length()))
      .toSeq

  /** The classloader for `workDir`: launch classpath + module/ jars,
    * rebuilt when the jar set changes.
    */
  def loaderFor(workDir: String): ClassLoader = {
    val dir = new File(s"$workDir/module")
    val sig = signature(dir)
    loaders.get(workDir) match {
      case Some((cached, ld)) if cached == sig => ld
      case _ =>
        val ld = new URLClassLoader(
          sig.map(s => new File(s._1).toURI.toURL).toArray,
          getClass.getClassLoader)
        loaders.put(workDir, (sig, ld))
        ld
    }
  }

  /** `Class.forName` through the workDir's module loader (falls back to
    * the plain launch classpath when no workDir is in play — library
    * use outside the task runner).
    */
  def classFor(name: String, workDir: Option[String]): Class[_] =
    workDir match {
      case Some(wd) => Class.forName(name, true, loaderFor(wd))
      case None     => Class.forName(name)
    }
}
