package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** JVM-scoped scratch directories for catalog queries that stage
  * state (IVF indexes, signature tables, connector fixtures). Bench
  * invokes each query function 2-3 times per sweep and Verify once
  * more — plain `Files.createTempDirectory` per call accumulates
  * unbounded /tmp parquet garbage on a long-lived box. Every dir
  * handed out here is deleted on JVM exit.
  */
object Scratch {
  private val dirs = scala.collection.mutable.ArrayBuffer.empty[Path]

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    dirs.synchronized(dirs.foreach { d =>
      try Files.walk(d).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => { Files.deleteIfExists(p); () })
      catch { case _: Throwable => () }
    })))

  def dir(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    dirs.synchronized { dirs += d }
    d.toString
  }
}
