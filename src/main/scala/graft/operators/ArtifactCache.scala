package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Cross-process-safe build-once / read-many publication for the
  * compute-once artifacts (Jaccard pair list, cluster labels, BPE merges,
  * stored ANN index).
  *
  * The JVM-local lock each call site holds keeps concurrent first-demands
  * in ONE process single-writer, but two JVMs sharing `java.io.tmpdir`
  * could both pass a bare marker check, overwrite each other's parquet
  * mid-read, and crash on the marker create (round-9 advice). Here the
  * build fills a process-unique staging directory and publishes with ONE
  * atomic rename: exactly one racer's rename lands; the loser discards its
  * staging and reads the winner's — builds are deterministic, so the two
  * are byte-equivalent and the loser loses nothing but the build time.
  * This is the same stage-and-swap shape as `Warehouse.commit`, minus
  * versioning (artifacts are immutable per key).
  */
object ArtifactCache {

  /** Ensure the artifact at `root` exists complete (its `markerName` file
    * present), building it via `build(stagingDir)` if not. Returns `root`.
    *
    * `build` must write everything under the staging dir it is handed;
    * the marker is stamped inside staging BEFORE the publish rename, so a
    * published root is complete by construction — there is no state where
    * the data is visible without its marker.
    */
  def ensure(root: String, markerName: String)(build: String => Unit): String = {
    val rootP = Paths.get(root)
    val marker = rootP.resolve(markerName)
    if (Files.exists(marker)) return root
    val staging = Paths.get(root + ".stage_" +
      ProcessHandle.current().pid() + "_" +
      java.util.UUID.randomUUID().toString.take(8))
    Files.createDirectories(staging)
    try {
      build(staging.toString)
      Files.createFile(staging.resolve(markerName))
    } catch {
      case t: Throwable =>
        deleteRecursively(staging) // never leave a half-built staging dir
        throw t
    }
    // publish: tmpdir staging and root share a filesystem, so ATOMIC_MOVE
    // holds. Rename-onto-existing surfaces differently per platform —
    // Linux rename(2) gives ENOTEMPTY/EEXIST which the JDK wraps as a
    // PLAIN FileSystemException (verified on this host); other paths give
    // FileAlreadyExists/DirectoryNotEmpty/AccessDenied, all subtypes of
    // FileSystemException. Catch the parent ON THE PUBLISH STEP ONLY and
    // decide by the marker: complete winner -> use theirs; else loud.
    try Files.move(staging, rootP, StandardCopyOption.ATOMIC_MOVE)
    catch {
      // only a move that failed BECAUSE THE TARGET EXISTS is the
      // race/stale-root case; any other FileSystemException (parent went
      // read-only, I/O error) must not destroy the finished build or be
      // misattributed to a stale directory — rethrow with staging intact
      case fse: java.nio.file.FileSystemException
          if Files.exists(rootP, java.nio.file.LinkOption.NOFOLLOW_LINKS) =>
        deleteRecursively(staging)
        if (!Files.exists(marker))
          throw new IllegalStateException(
            s"artifact root $root exists without $markerName — stale " +
              "directory from a crashed pre-staging build; remove it", fse)
    }
    root
  }

  private def deleteRecursively(p: Path): Unit =
    graft.sources.Tables.deleteRecursively(p)
}
