package graft.sources

import java.nio.file.{Files, Path}

/** JVM-lifetime scratch directories with RELIABLE cleanup:
  * File.deleteOnExit silently never removes non-empty directories,
  * so every scratch root registers here and one shutdown hook
  * deletes them recursively. */
object TempDirs {
  private val roots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      roots.forEach { root =>
        try {
          Files.walk(root)
            .sorted(java.util.Comparator.reverseOrder[Path]())
            .forEach(p => Files.deleteIfExists(p))
        } catch { case _: Exception => () }
      }))
  }

  /** A fresh temp directory, recursively deleted at JVM exit. */
  def scratch(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    roots.add(p)
    p
  }
}
