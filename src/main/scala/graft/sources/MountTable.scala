package graft.sources

import org.apache.hadoop.security.AccessControlException

/** One logical namespace over several filesystems — the Spark-native
  * analog of federation-era viewfs (reference hadoop-common/.../fs/
  * viewfs/ViewFileSystem.java:1, with link resolution per
  * InodeTree.java:1). A multi-cluster shop mounts each lake under a
  * logical prefix and every job addresses `/warm/...`, `/cold/...`
  * paths that resolve to the right backend at access time.
  *
  * Rather than register a `FileSystem` scheme (the Hadoop route), the
  * mount table is a PATH-MAPPING layer the `Dfs` shell family and
  * Spark reads resolve through — `spark.read.parquet(mt.resolve(p))`
  * — because on Spark the filesystem client underneath is already
  * whatever the resolved URI names; only the namespace stitching is
  * missing. Contracts carried over from the reference:
  *
  *  - longest-prefix link resolution (the InodeTree walk: a nested
  *    link shadows its parent link for paths under it);
  *  - ancestors of mount points that no link covers are INTERNAL
  *    dirs: they list their mount-point children, and every mutation
  *    on them is rejected read-only (ViewFileSystem.java PERMISSION_555
  *    semantics — "InternalDirOfViewFs");
  *  - renames may not cross mount points (ViewFileSystem.rename's
  *    "Renames across Mount points not supported"); a cross-backend
  *    move is an explicit copy+delete the caller opts into ([[cp]]);
  *  - an optional FALLBACK target (linkFallback, ConfigUtil.java)
  *    catches paths no link covers.
  */
final class MountTable private (
    links: Seq[(String, String)], fallback: Option[String]) {

  /** Resolve a logical path to its backend path: longest matching
    * link prefix wins, remainder appended; unlinked paths go to the
    * fallback or fail like viewfs' NotInMountpointException. */
  def resolve(logical: String): String = {
    val p = MountTable.norm(logical)
    links.find { case (pre, _) => p == pre || p.startsWith(pre + "/") } match {
      case Some((pre, target)) => target + p.drop(pre.length)
      case None =>
        if (isInternal(p)) throw new AccessControlException(
          s"$logical is an internal mount-table dir, not a file path")
        fallback match {
          case Some(fb) => fb + p
          case None => throw new java.io.FileNotFoundException(
            s"$logical: no mount link covers it and no fallback is configured")
        }
    }
  }

  /** An internal dir is "/" or a proper ancestor of some mount point
    * that no link itself covers — synthesized by the view, read-only. */
  def isInternal(logical: String): Boolean = {
    val p = MountTable.norm(logical)
    val linked = links.exists { case (pre, _) =>
      p == pre || p.startsWith(pre + "/") }
    !linked && (p == "/" ||
      links.exists { case (pre, _) => pre.startsWith(p + "/") })
  }

  private def mountChildren(p: String): Seq[String] = {
    val base = if (p == "/") "/" else p + "/"
    links.map(_._1).filter(pre => pre != p && pre.startsWith(base))
      .map(_.drop(base.length).split('/').head).distinct.sorted
  }

  /** ls through the view: internal dirs list their mount-point
    * children (dirs of length 0, like viewfs' synthetic internal
    * statuses) merged with fallback children (mount points win on a
    * name clash); linked paths delegate to the backend. */
  def ls(logical: String): Seq[(String, Boolean, Long)] = {
    val p = MountTable.norm(logical)
    if (!isInternal(p)) Dfs.ls(resolve(p))
    else {
      val mounts = mountChildren(p).map(n => (n, true, 0L))
      val taken = mounts.map(_._1).toSet
      val fb = fallback.toSeq
        .filter(f => Dfs.exists(f + (if (p == "/") "" else p)))
        .flatMap(f => Dfs.ls(f + (if (p == "/") "" else p)))
        .filterNot(c => taken(c._1))
      mounts ++ fb
    }
  }

  def exists(logical: String): Boolean =
    isInternal(logical) || Dfs.exists(resolve(logical))

  def du(logical: String): Long = Dfs.du(resolve(logical))

  private def mutable(logical: String): String = {
    val p = MountTable.norm(logical)
    val linked = links.exists { case (pre, _) =>
      p == pre || p.startsWith(pre + "/") }
    val parent =
      if (p == "/") "/" else p.substring(0, math.max(1, p.lastIndexOf('/')))
    // a mutation on an internal dir, or a NEW name directly under one
    // with no fallback to receive it, hits viewfs' read-only contract
    if (isInternal(p) || (!linked && fallback.isEmpty && isInternal(parent)))
      throw new AccessControlException(
        s"$logical: internal mount-table dirs are read-only (viewfs contract)")
    resolve(p)
  }

  def mkdirs(logical: String): Boolean = Dfs.mkdirs(mutable(logical))

  def rm(logical: String, recursive: Boolean = false): Boolean =
    Dfs.rm(mutable(logical), recursive)

  /** Copy through the view — the ONE op that legitimately crosses
    * backends (it moves bytes, not names). */
  def cp(srcLogical: String, dstLogical: String): Long =
    Dfs.cp(resolve(srcLogical), mutable(dstLogical))

  private def linkOf(logical: String): Option[String] = {
    val p = MountTable.norm(logical)
    links.collectFirst {
      case (pre, _) if p == pre || p.startsWith(pre + "/") => pre }
  }

  /** Rename through the view. A rename that crosses mount points is
    * REJECTED, exactly as ViewFileSystem.rename does: the namespaces
    * may live on different stores where rename cannot be atomic —
    * an impossible contract should fail, not silently degrade. */
  def mv(srcLogical: String, dstLogical: String): Boolean = {
    val (sl, dl) = (linkOf(srcLogical), linkOf(dstLogical))
    if (sl != dl || sl.isEmpty && fallback.isEmpty)
      throw new java.io.IOException(
        s"rename $srcLogical -> $dstLogical crosses mount points " +
          "(not supported; use cp + rm for a cross-backend move)")
    Dfs.mv(mutable(srcLogical), mutable(dstLogical))
  }
}

object MountTable {
  private[sources] def norm(p: String): String = {
    require(p.startsWith("/"), s"mount-table paths are absolute: $p")
    val squashed = p.replaceAll("/+", "/")
    if (squashed.length > 1 && squashed.endsWith("/"))
      squashed.dropRight(1) else squashed
  }

  /** Backend targets may carry a scheme (hdfs://, file:) — only trim
    * the trailing slash so resolve's concatenation stays clean. */
  private def normTarget(t: String): String =
    if (t.length > 1 && t.endsWith("/")) t.dropRight(1) else t

  /** Build a view from logical-prefix -> backend-path links (plus an
    * optional fallback backend for unlinked paths). Links sort
    * longest-first so [[MountTable.resolve]]'s first match IS the
    * longest-prefix match. */
  def apply(links: Map[String, String],
      fallback: Option[String] = None): MountTable = {
    require(links.nonEmpty, "a mount table needs at least one link")
    val normed = links.map { case (pre, target) =>
      (norm(pre), normTarget(target)) }
    new MountTable(
      normed.toSeq.sortBy { case (pre, _) => (-pre.length, pre) },
      fallback.map(normTarget))
  }
}
