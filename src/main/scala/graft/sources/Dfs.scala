package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** FsShell-equivalent utilities over the Hadoop FileSystem API (the
  * hadoop-hdfs client surface: ls/du/mkdir/rm). Driver-side metadata
  * ops — these are namenode calls, not data-path work, so no
  * distribution is involved (same as FsShell).
  *
  * Reference anchors (hadoop-common-project/hadoop-common/src/main/
  * java/org/apache/hadoop): fs/FileSystem.java:181 (the abstract FS
  * contract; getContentSummary :1824, listStatus :1907),
  * fs/shell/Ls.java:44 (the shell command this mirrors).
  */
object Dfs {
  private def fs(path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(new Configuration()), p)
  }

  /** (name, isDir, length) per child. */
  def ls(path: String): Seq[(String, Boolean, Long)] = {
    val (f, p) = fs(path)
    f.listStatus(p).toSeq
      .map(st => (st.getPath.getName, st.isDirectory, st.getLen))
  }

  /** Total bytes under the path (du -s). */
  def du(path: String): Long = {
    val (f, p) = fs(path)
    f.getContentSummary(p).getLength
  }

  def mkdirs(path: String): Boolean = { val (f, p) = fs(path); f.mkdirs(p) }

  def rm(path: String, recursive: Boolean = false): Boolean = {
    val (f, p) = fs(path)
    f.delete(p, recursive)
  }

  def exists(path: String): Boolean = { val (f, p) = fs(path); f.exists(p) }
}
