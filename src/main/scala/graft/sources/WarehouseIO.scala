package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}

/** The FOUR filesystem primitives the whole commit protocol stands on —
  * extracted so the object-store deployment is a documented SUBSTITUTION
  * of this seam, not a rewrite of the engine (round-12 verdict item 6;
  * the strategy note lives in SCALE.md §"Object-store commit mapping").
  *
  * Every atomicity claim in [[Tables.Warehouse]] reduces to these:
  *
  *  - `createExclusive` — the O_EXCL token: stage-number ownership
  *    ([[Tables.Warehouse.allocateStage]]'s sibling marker) and the
  *    commit lock. On S3 there is no O_EXCL; the mapping is a
  *    conditional PUT (`If-None-Match: *`, GA on S3 since 2024) or the
  *    catalog's own CAS row — either gives the same "exactly one winner"
  *    contract.
  *  - `atomicPointerSwap` — publish: the version pointer moves to a new
  *    target in one atomic step, readers resolve it at open. On S3 the
  *    pointer is not a symlink but a tiny metadata object (Iceberg's
  *    `metadata.json` indirection) swapped by compare-and-swap on its
  *    ETag / a catalog CAS; readers GET the pointer object first, then
  *    address data by the absolute keys it names.
  *  - `atomicMove` — stage discard / legacy migration. On S3: the stage
  *    is never "moved" — uncommitted objects are simply never referenced
  *    by any pointer and age out via the orphan sweep (the engine's
  *    removeOrphans already models exactly this).
  *  - `linkOrCopy` — the zero-copy carry (fast append, COW file
  *    grouping, incremental re-cluster). On S3 a "hard link" is a
  *    MANIFEST REFERENCE: the new snapshot's file list names the old
  *    object keys verbatim instead of duplicating bytes — which is why
  *    every carry site in this engine records RELATIVE file names it
  *    could just as well write into a manifest.
  *
  * The local implementation below is the offline-build default
  * (SURVEY §7.1); nothing outside this file touches the primitives
  * directly, so the substitution point is exactly one object.
  */
private[graft] trait WarehouseIO {
  /** Create `p` exclusively — throws FileAlreadyExistsException when an
    * owner exists. The "exactly one winner" primitive.
    */
  def createExclusive(p: Path): Unit

  /** Create directory `p` exclusively (stage dirs — guards the version
    * number against existing published dirs).
    */
  def createDirExclusive(p: Path): Unit

  /** Atomically repoint `pointer` at `target` (relative), replacing any
    * previous pointer. Readers resolving mid-swap see old or new, never
    * neither.
    */
  def atomicPointerSwap(pointer: Path, target: Path, scratch: Path): Unit

  /** Atomic rename, failing if non-atomic is the only option. */
  def atomicMove(src: Path, dst: Path, replaceExisting: Boolean = false): Unit

  /** Zero-copy carry when the store supports it, byte copy otherwise. */
  def linkOrCopy(src: Path, dst: Path): Unit
}

/** Local-filesystem implementation: O_EXCL create, symlink pointer +
  * ATOMIC_MOVE, hard links.
  */
private[graft] object LocalWarehouseIO extends WarehouseIO {
  override def createExclusive(p: Path): Unit = Files.createFile(p)

  override def createDirExclusive(p: Path): Unit = Files.createDirectory(p)

  override def atomicPointerSwap(pointer: Path, target: Path,
      scratch: Path): Unit = {
    Files.deleteIfExists(scratch)
    // relative target keeps the warehouse relocatable
    Files.createSymbolicLink(scratch, target)
    Files.move(scratch, pointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  override def atomicMove(src: Path, dst: Path,
      replaceExisting: Boolean): Unit =
    if (replaceExisting)
      Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    else Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE)

  override def linkOrCopy(src: Path, dst: Path): Unit =
    try Files.createLink(dst, src)
    catch {
      case _: UnsupportedOperationException |
           _: java.nio.file.FileSystemException => Files.copy(src, dst)
    }
}
