package graft.sim

import org.apache.hadoop.fs.{FileSystem, Path}

/** Retention for the shared manifested-index layout ([[IvfIndex]],
  * [[KmeansModel]]: `codebooks/cb-*`, `segments/seg-*`, `m=N`
  * manifests): keep the newest `keep` manifest versions, delete older
  * manifests and every data dir no retained manifest references. Both
  * classes' scaladocs promise old versions stay readable "until
  * vacuumed" — this is the vacuum.
  *
  * MAINTENANCE-WINDOW op, like Delta's VACUUM: a build publishing
  * CONCURRENTLY stages uuid-dirs that are unreferenced until its
  * manifest lands, and a racing vacuum would sweep them. Two guards
  * keep the common races harmless — the newest-version snapshot is
  * taken FIRST (a build finishing mid-vacuum keeps its manifest: only
  * versions ≤ the snapshot are deleted), and data dirs are re-checked
  * against every manifest that exists at sweep time — but a build
  * still mid-stage when the sweep runs is not protected; run vacuum
  * without concurrent builds. */
private[graft] object IndexVacuum {

  /** Returns (manifests deleted, data dirs deleted). `referenced(v)` =
    * every data-dir name manifest v keeps alive; `dataDirs` = the
    * (subdir, name-prefix) pairs holding uuid-named data. */
  def vacuum(fs: FileSystem, indexDir: String, keep: Int,
      referenced: Long => Seq[String],
      dataDirs: Seq[(String, String)]): (Int, Int) = {
    require(keep >= 1, "must retain at least the live version")
    val root = new Path(indexDir)
    val versions = graft.ops.VersionedPaths
      .listNumbered(fs, root, "m=", dirsOnly = false).map(_._2).sorted
    if (versions.isEmpty) return (0, 0)
    val snapshot = versions.last
    val drop = versions.filter(_ <= snapshot - keep)
    var manifestsDeleted = 0
    drop.foreach { v =>
      if (fs.delete(new Path(root, s"m=$v"), false)) manifestsDeleted += 1
    }
    // Live set = union over every manifest STILL present (including any
    // version published while we were deleting — re-list, don't reuse
    // the snapshot).
    val live: Set[String] = graft.ops.VersionedPaths
      .listNumbered(fs, root, "m=", dirsOnly = false).map(_._2)
      .flatMap(referenced).toSet
    var dirsDeleted = 0
    for ((sub, prefix) <- dataDirs) {
      val d = new Path(root, sub)
      if (fs.exists(d)) fs.listStatus(d).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(prefix) && !live(n) && fs.delete(st.getPath, true))
          dirsDeleted += 1
      }
    }
    (manifestsDeleted, dirsDeleted)
  }
}
