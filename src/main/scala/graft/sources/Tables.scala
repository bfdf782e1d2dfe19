package graft.sources

import java.nio.file.{FileSystems, Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** File-level sources/sinks: glob-EXCLUSION listing and idempotent table
  * bootstrap over a plain-parquet warehouse.
  *
  * The reference delegates file loading to a managed service configured with
  * an *exclusion* glob (`fileFilter`, tabular.py:137; `**&#47;LOAD*` at
  * batch_bootstrapper.py:69 and `**&#47;*-*` at :85). Spark's
  * `pathGlobFilter` is *inclusive*, so exclusion is done by pre-filtering the
  * file list driver-side and passing explicit paths to the reader. At 100 TB
  * the listing is a cheap metadata operation (S3 LIST / inventory) and the
  * explicit-file read parallelizes identically to a directory read.
  */
object Tables {

  /** The commit protocol's filesystem primitives — THE substitution
    * point for an object-store deployment (see [[WarehouseIO]] and
    * SCALE.md §"Object-store commit mapping"). Local by default;
    * `GRAFT_WAREHOUSE_IO=objectstore` flips the fleet default (how the
    * cross-process checkers parameterize), and each [[Warehouse]] can
    * pick explicitly. Code paths holding a Warehouse must use `wh.io`;
    * this value is only the default for paths with no table in hand.
    */
  private[graft] val io: WarehouseIO = WarehouseIO.fromEnv()

  /** List parquet files under `dir` (recursively), excluding paths that match
    * `excludeGlob` — the exact `**&#47;...`-style semantics of the reference's
    * `fileFilter`. Listing order is sorted for deterministic ingestion order.
    */
  def listFilesExcluding(
      dir: String,
      excludeGlob: Option[String],
      extension: Option[String] = None): Seq[String] = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) return Seq.empty
    // `**/<tail>` globs (the reference's fileFilter shape) match the tail
    // against ANY contiguous segment span of the prefix-relative path —
    // the same semantics as CdcStream.excludePredicate, so the driver-side
    // listing and the streaming scan exclude the same files. In
    // particular a writer-wrapped `LOAD*.parquet/part-*` directory is
    // excluded here too (final-segment-only matching would let its part
    // files through and poison schema inference with the LOAD schema).
    val spanRx = excludeGlob.filter(_.startsWith("**/")).map { g =>
      val rx = g.drop(3).flatMap {
        case '*' => "[^/]*"
        case '?' => "[^/]"
        case c if "\\^$.|+()[]{}".contains(c) => "\\" + c
        case c => c.toString
      }
      ("(^|/)" + rx + "($|/)").r
    }
    val matcher = excludeGlob.filterNot(_.startsWith("**/"))
      .map(g => FileSystems.getDefault.getPathMatcher(s"glob:$g"))
    // FOLLOW_LINKS: versioned tables surface as a symlink pointer to the
    // current version directory (Warehouse.commit)
    val stream = Files.walk(root, java.nio.file.FileVisitOption.FOLLOW_LINKS)
    try {
      stream.iterator().asScala
        .filter(p => Files.isRegularFile(p))
        .filter(p => !p.getFileName.toString.startsWith("_") &&
                     !p.getFileName.toString.startsWith("."))
        // a stray file of another format must not reach the reader
        .filter(p => extension.forall(e =>
          p.getFileName.toString.endsWith(s".$e") ||
            p.getParent.getFileName.toString.endsWith(s".$e")))
        .filter { p =>
          // The reference's globs are matched against the key relative to the
          // monitored prefix (tabular.py:130-139 sends bucket+prefix and the
          // filter separately).
          val rel = root.relativize(p)
          spanRx.forall(_.findFirstIn(rel.toString).isEmpty) &&
            matcher.forall(m => !m.matches(rel))
        }
        .map(_.toString)
        .toSeq
        .sorted
    } finally stream.close()
  }

  /** Read parquet from an explicit (already exclusion-filtered) file list. */
  def readFiles(spark: SparkSession, files: Seq[String]): Option[DataFrame] =
    if (files.isEmpty) None else Some(spark.read.parquet(files: _*))

  /** Format-parameterized variant (the reference's
    * `fileLoaderConfig.fileFormat`, tabular.py:136): parquet, json
    * (newline-delimited), or headered csv with schema inference.
    */
  def readFilesAs(spark: SparkSession, format: String,
      files: Seq[String]): Option[DataFrame] =
    if (files.isEmpty) None
    else {
      val r = spark.read
      Some(format match {
        // mergeSchema: the file set may straddle an upstream schema
        // evolution (a column added in a later DMS batch); default
        // inference reads ONE footer and would pin the stream to
        // whichever file it sampled — restart then silently drops the
        // new column (caught by CdcStreamSpec's evolution test)
        case "parquet" => r.option("mergeSchema", "true").parquet(files: _*)
        case "json" => r.json(files: _*)
        case "csv" => r.option("header", "true").option("inferSchema", "true")
          .csv(files: _*)
        case other => throw new IllegalArgumentException(
          s"unsupported source format '$other'")
      })
    }

  /** Warehouse = a directory of `<table>` parquet dirs (offline stand-in for
    * the Iceberg catalog the reference talks to, tabular.py:92).
    *
    * `retain` = number of versions kept per table INCLUDING the current one
    * (default 2: current + one previous for in-flight readers — the round-9
    * behavior). Deeper retention is what makes multi-hop time travel
    * ([[readVersion]]) and incremental changelog consumption
    * ([[graft.plans.MirrorChangelog]]) work across more than one commit —
    * the capability the reference's users get from Iceberg's snapshot log.
    */
  final case class Warehouse(root: String, retain: Int = 2,
      io: WarehouseIO = Tables.io) {
    require(retain >= 1, s"retain must keep at least the current version, got $retain")
    def tablePath(name: String): String = s"$root/$name"
    def exists(name: String): Boolean = {
      // resolve through the pointer seam: a symlink pointer FOLLOWS via
      // isDirectory, but an object-store pointer OBJECT does not — both
      // resolve explicitly here
      val p = Paths.get(snapshotPath(name))
      if (!Files.isDirectory(p)) return false
      val stream = Files.list(p)
      try stream.iterator().asScala.exists(f =>
        f.getFileName.toString == "_SUCCESS" || f.toString.endsWith(".parquet") ||
          Files.isDirectory(f)) // batch_N / partition subdirs count as data
      finally stream.close()
    }
    /** Read a (possibly batch-subdir-structured) flat table. NOT for
      * partition-discovered layouts — PartitionedMirror reads its own path.
      *
      * The version POINTER is resolved here, at open time, and the real
      * version directory is what Spark scans: handing Spark the symlink
      * path instead would let a commit swap the pointer between file
      * listing and file reading, re-resolving listed v(N) part files
      * against v(N+1) — FILE_NOT_EXIST mid-query. Pinning the real
      * directory gives the reader snapshot isolation for as long as the
      * version is retained (current + one previous, see [[commit]] GC).
      */
    def read(spark: SparkSession, name: String,
        mergeSchema: Boolean = false): DataFrame = {
      val p = snapshotPath(name)
      // uniform-footer shortcut (round 21): identical schema served
      // driver-side, no inference job; heterogeneous layouts decline
      // and take the inferring read below unchanged
      SchemaEvolution.uniformFooterSchema(spark, p) match {
        case Some(s) =>
          spark.read.schema(s).option("recursiveFileLookup", "true")
            .parquet(p)
        case None =>
          spark.read.option("recursiveFileLookup", "true")
            // mergeSchema for multi-batch layouts that may straddle a
            // schema evolution (the changelog); versioned single-write
            // tables are uniform and skip the extra footer reads
            .option("mergeSchema", mergeSchema.toString)
            .parquet(p)
      }
    }

    /** Current version directory of `name` (symlink resolved), or the
      * plain table path for legacy/non-versioned layouts.
      */
    def snapshotPath(name: String): String = {
      verifySubstrate(stamp = false)
      val p = Paths.get(tablePath(name))
      io.readPointer(p) match {
        case Some(target) => p.getParent.resolve(target).toString
        case None => tablePath(name)
      }
    }

    /** Fail fast when this Warehouse's configured [[WarehouseIO]]
      * disagrees with the substrate the warehouse was COMMITTED under —
      * a mismatched impl does not merely misread: LocalWarehouseIO sees
      * an object-store pointer OBJECT as a legacy real dir and
      * migrateLegacy corrupts the table by moving the pointer aside.
      * The `_warehouse_io` root marker is stamped by the first commit
      * (exclusively — concurrent first committers converge on one
      * winner's stamp, which both then verify) and checked once per
      * Warehouse instance on the first pointer resolution or commit.
      */
    @volatile private var substrateReadOk = false // read-path memo
    @volatile private var substrateStamped = false // commit-path memo
    private def verifySubstrate(stamp: Boolean): Unit = {
      if (if (stamp) substrateStamped else substrateReadOk) return
      val marker = Paths.get(root, SubstrateMarker)
      // an empty read is a rival mid-stamp (create won, content not yet
      // written) — treat as no claim yet; the next check re-reads
      def recorded: Option[String] =
        try Some(Files.readString(marker).trim).filter(_.nonEmpty)
        catch { case _: java.io.IOException => None }
      def mismatch(s: String): Nothing = throw new IllegalStateException(
        s"warehouse '$root' was committed under the '$s' IO substrate " +
          s"but this session is configured for '${io.name}' — a " +
          "mismatched impl misreads table pointers and would corrupt " +
          "the layout; set GRAFT_WAREHOUSE_IO / -Dgraft.warehouse.io " +
          "(or the Warehouse constructor) to match")
      recorded match {
        case Some(s) if s != io.name => mismatch(s)
        case Some(_) => substrateReadOk = true; substrateStamped = true
        case None if stamp =>
          try { io.createExclusive(marker); Files.writeString(marker, io.name) }
          catch { case _: java.nio.file.FileAlreadyExistsException => () }
          // re-read: a rival may have stamped first — its substrate must
          // match; an empty re-read (rival mid-stamp) retries next commit
          recorded match {
            case Some(s) if s != io.name => mismatch(s)
            case Some(_) => substrateReadOk = true; substrateStamped = true
            case None => ()
          }
        // unstamped (pre-marker or read-only): no claim yet — memoize so
        // the hot pointer-resolution path pays no per-call stat; the
        // first commit through THIS instance still stamps (own flag)
        case None => substrateReadOk = true
      }
    }

    /** Version number the table pointer currently publishes (None for
      * legacy / non-versioned layouts).
      */
    def currentVersion(name: String): Option[Long] = {
      val p = Paths.get(tablePath(name))
      io.readPointer(p).flatMap { target =>
        val m = versionPattern(name).matcher(target.getFileName.toString)
        if (m.matches()) Some(m.group(1).toLong) else None
      }
    }

    /** Dissolve a versioned (pointer) layout back to a plain path — the
      * one-way migration used when a table moves to an IN-PLACE-managed
      * layout (the partitioned mirror's dynamic partition overwrites).
      * Removes the pointer and retained version dirs; the caller writes
      * the new layout to the now-plain `tablePath` afterwards. Must only
      * run from the table's single writer.
      */
    def dissolveVersioned(name: String): Unit = {
      val p = Paths.get(tablePath(name))
      io.deletePointerIfExists(p)
      versions(name).foreach { case (_, dir) => deleteRecursively(dir) }
    }

    private def versionPattern(name: String) =
      java.util.regex.Pattern.compile(
        java.util.regex.Pattern.quote(name) + "\\.v(\\d+)")

    /** Version directories of `name` currently present, ascending. */
    private def versions(name: String): Seq[(Long, Path)] = {
      val rootP = Paths.get(root)
      if (!Files.isDirectory(rootP)) return Seq.empty
      val pat = versionPattern(name)
      val stream = Files.list(rootP)
      try stream.iterator().asScala.flatMap { p =>
        val m = pat.matcher(p.getFileName.toString)
        if (m.matches()) Some((m.group(1).toLong, p)) else None
      }.toSeq.sortBy(_._1)
      finally stream.close()
    }

    /** Atomic snapshot commit — the offline analog of an Iceberg
      * metadata-pointer swap (tabular.py:69-70): `write` fills a fresh
      * `<name>.v<N>` version directory, then the table path (a symlink
      * pointer) is swapped to it with one atomic rename. A reader resolves
      * the pointer at open time and always sees a complete version — never
      * a half-written table. The previous version is retained for in-flight
      * readers; older ones are GC'd. At scale the same shape is the
      * catalog's transactional snapshot commit (`MERGE INTO` / Iceberg).
      *
      * One caveat, documented not hidden: a table created by plain
      * directory writes (legacy layout) is migrated on its first commit by
      * renaming the real directory aside — that single migration has a
      * sub-millisecond absence window; every subsequent commit is atomic.
      *
      * `write` receives an EXISTING empty staging directory (pre-created
      * atomically to make the allocation race-free across processes) —
      * parquet writes into it must use Overwrite mode, as every caller in
      * this engine does. A `write` that throws has its stage deleted
      * immediately (no orphan).
      *
      * @return the version number THIS commit published (from the staged
      *         dir's own name) — not `currentVersion` re-read afterwards,
      *         which a rival commit landing in between could have moved
      *         past it (advice finding: cherrypick's rebase needs its own
      *         apply version, exactly the one journal settlement picks)
      */
    def commit(name: String, expectCurrent: Option[Long] = None,
        expectAbsent: Boolean = false)
        (write: String => Unit): Long = {
      require(!name.contains("/"),
        s"commit is table-level; '$name' looks like a subdirectory")
      Files.createDirectories(Paths.get(root))
      verifySubstrate(stamp = true)
      val legacyMoved = migrateLegacy(name)
      val versionDir = allocateStage(name)
      try write(versionDir.toString)
      catch { case t: Throwable => discardStage(versionDir); throw t }
      publishStage(name, versionDir, expectCurrent, legacyMoved, expectAbsent)
      val m = versionPattern(name).matcher(versionDir.getFileName.toString)
      require(m.matches(), s"$versionDir is not a stage of '$name'")
      m.group(1).toLong
    }

    /** Legacy real-dir layout: move it aside FIRST (becomes a retained
      * version) so a crash mid-commit can never wedge on a half-done
      * migration — a crash here leaves only the documented one-time
      * absence window, and the next commit proceeds normally.
      * @return true when a legacy dir was migrated (the CAS skips its
      *         expectation for exactly that first commit)
      */
    private[sources] def migrateLegacy(name: String): Boolean = {
      val table = Paths.get(tablePath(name))
      if (Files.exists(table, java.nio.file.LinkOption.NOFOLLOW_LINKS) &&
          !io.isPointer(table)) {
        val slot = versions(name).lastOption.map(_._1 + 1).getOrElse(0L)
        val dest = Paths.get(s"${tablePath(name)}.v$slot")
        io.adoptLegacyDir(table, dest)
        // the legacy dir WAS the published table — mark it so normal
        // retention GC applies to it
        Files.writeString(dest.resolve(PublishedMarker), "")
        true
      } else false
    }

    /** Exclusive stage-dir allocation — [[commit]]'s first half, exposed
      * separately for EXTERNALLY-DRIVEN writes (the catalog's V2
      * BatchWrite path, where executor tasks write into the stage before
      * the driver publishes). Every allocation MUST end in
      * [[publishStage]] or [[discardStage]].
      */
    // UNIQUE version-dir allocation: two INDEPENDENT committers (an
      // ingest stream's JVM and a scheduled maintenance JVM sharing the
      // warehouse) must never stage into the same directory — before this
      // existed, both would pick the same `next`, and the CAS loser's
      // cleanup deleted the winner's committed files (a lost update).
      // TWO exclusive checks, because neither alone covers both races:
      //  - the SIBLING stage marker is the allocation token (createFile
      //    is O_EXCL). The dir itself CANNOT be the token: Spark's
      //    Overwrite write DELETES and recreates the staged dir mid-write,
      //    and during that window a rival scanning versions() sees the
      //    number free, re-creates the dir, and two writers interleave
      //    part files into one stage — a lost update the breaker-storm
      //    spec caught flaking under heavy load. The marker lives OUTSIDE
      //    the dir and spans the whole stage lifetime, so it is immune to
      //    the clobber. While it exists, the number is owned; its absence
      //    on an unmarked dir is also what lets isPublishedDir grandfather
      //    PRE-MARKER version dirs as published history (advice finding).
      //  - createDirectory (O_EXCL too) still guards the number against
      //    EXISTING dirs that carry no marker: published/retained
      //    versions and pre-marker history have no sibling, and writing
      //    into one of those would corrupt a live snapshot.
      // On either collision: roll back only what this writer created,
      // bump, retry — each writer ends up sole owner of its stage, so the
      // data write itself needs no lock at all.
    private[sources] def allocateStage(name: String): Path = {
      require(!name.contains("/"),
        s"allocation is table-level; '$name' looks like a subdirectory")
      Files.createDirectories(Paths.get(root))
      verifySubstrate(stamp = true) // external writes stamp/verify too
      var next = versions(name).lastOption.map(_._1 + 1).getOrElse(1L)
      var versionDir: Path = null
      while (versionDir == null) {
        val cand = Paths.get(s"${tablePath(name)}.v$next")
        try {
          io.createExclusive(stageMarkerPath(cand))
          try io.createDirExclusive(cand)
          catch { case e: java.nio.file.FileAlreadyExistsException =>
            Files.deleteIfExists(stageMarkerPath(cand)); throw e
          }
          versionDir = cand
        }
        catch { case _: java.nio.file.FileAlreadyExistsException => next += 1 }
      }
      versionDir
    }

    /** Publish an allocated-and-written stage — [[commit]]'s second half.
      * The decide-and-swap is the only contended region, and it is
      * microseconds long — serialize it with an exclusive lock file so
      * the CAS is a real compare-and-swap across PROCESSES, not a
      * check-then-act with a window. A real catalog does exactly this as
      * its transactional commit (the Iceberg optimistic-concurrency
      * commit underlying the reference's table.transaction(),
      * tabular.py:69-70); the lock file is the offline stand-in.
      */
    private[sources] def publishStage(name: String, versionDir: Path,
        expectCurrent: Option[Long], legacyMoved: Boolean,
        expectAbsent: Boolean = false): Unit = {
      val table = Paths.get(tablePath(name))
      val next = {
        val m = versionPattern(name).matcher(versionDir.getFileName.toString)
        require(m.matches(), s"$versionDir is not a stage of '$name'")
        m.group(1).toLong
      }
      withCommitLock(name) {
        // settle any crashed fast_forward before moving the pointer —
        // once main commits on top of a half-promoted branch head, the
        // journal's base-vs-elsewhere dichotomy is the ONLY thing that
        // can still tell a completed swap from one that never ran
        settleFastForwards(name, TableProps.read(this, name))
        // optimistic concurrency for offline rewrites (compaction/GC):
        // the swap only publishes if the version the rewriter read is
        // still the current one — a stream commit that landed mid-rewrite
        // wins, and the rewriter gets a retryable conflict (re-read,
        // re-validate, re-commit — the callers' retry loops) instead of
        // silently discarding that batch.
        expectCurrent.foreach { e =>
          val cur = currentVersion(name)
          if (!legacyMoved && cur != Some(e)) {
            discardStage(versionDir)
            throw new java.util.ConcurrentModificationException(
              s"$name moved from v$e to ${cur.fold("none")(v => s"v$v")} during rewrite")
          }
        }
        // expectCurrent=None means "no compare" — a committer whose read
        // observed NO table must instead demand it STILL does not exist,
        // or two concurrent first-writers are last-wins (advice finding:
        // merge_changes' first fold). Checked under the same lock, so
        // this is a real CAS arm, not a check-then-act.
        if (expectAbsent) {
          val cur = currentVersion(name)
          if (cur.isDefined) {
            discardStage(versionDir)
            throw new java.util.ConcurrentModificationException(
              s"$name was created (v${cur.get}) by a rival during a " +
                "create-expecting commit")
          }
        }
        // capture the pre-swap current target: if it is unmarked (a crash
        // between a previous swap and its stamp, or a warehouse written
        // by pre-marker code), it gets its stamp NOW — lazy migration
        val prevTarget = currentVersion(name)
          .map(v => Paths.get(s"${tablePath(name)}.v$v"))
        // exact lineage for t.history: the version current at swap time
        // IS this snapshot's parent (stamped before the swap, under the
        // lock; version-local, never carried)
        currentVersion(name).foreach(v =>
          Files.writeString(versionDir.resolve(ParentMarker), v.toString))
        io.atomicPointerSwap(table, versionDir.getFileName,
          scratch = Paths.get(s"${tablePath(name)}.ptr$next"))
        // stamp PUBLICATION — AFTER the swap, so a marked dir was
        // provably current at some point (stamping before the swap
        // created "zombie" published-never-current dirs that consumed a
        // retention slot and pushed the real previous version out of
        // GC's keep set — review finding). The crash window between swap
        // and stamp is covered twice over: the CURRENT pointer target is
        // implicitly published everywhere publication is consulted, and
        // the next commit's lazy stamp above closes it durably.
        // Retention GC reasons ONLY about published dirs: numeric order
        // says nothing about publication order (a slow rival's stage
        // allocated at v3 can still be mid-write when the stream
        // publishes v4 and v5). Unmarked dirs are untouchable here — a
        // live rival cleans its own stage on CAS failure, a crashed one
        // becomes age-guarded removeOrphans work.
        Files.writeString(versionDir.resolve(PublishedMarker), "")
        Files.deleteIfExists(stageMarkerPath(versionDir))
        prevTarget.filter(p => Files.isDirectory(p) &&
            !Files.exists(p.resolve(PublishedMarker)))
          .foreach { p =>
            Files.writeString(p.resolve(PublishedMarker), "")
            Files.deleteIfExists(stageMarkerPath(p))
          }
        // durable grandfather: stamp every PRE-MARKER dir (no published
        // marker, no stage sibling) at-or-below the freshly published
        // version — on the first post-upgrade commit this migrates the
        // whole retained history in one pass, so time travel and the
        // changelog feed keep seeing it and removeOrphans never will.
        // _SUCCESS required: a stage crashed under PRE-upgrade code is
        // half-written with no completion marker, and stamping it would
        // permanently publish garbage as history (advice finding) — the
        // age-guarded orphan sweep owns it instead. Every legitimately
        // published pre-marker dir was a completed Spark write and
        // carries _SUCCESS. BranchMarker dirs are excluded: a branch
        // append dir also has no published marker, no stage sibling, and
        // a _SUCCESS — stamping it here would publish unaudited staged
        // branch data into main history the moment any main commit lands
        // at a higher version (advice finding, round 16).
        versions(name).foreach { case (v, p) =>
          if (v <= next && Files.isDirectory(p) &&
              !Files.exists(p.resolve(PublishedMarker)) &&
              !Files.exists(p.resolve(BranchMarker)) &&
              !Files.exists(stageMarkerPath(p)) &&
              Files.exists(p.resolve("_SUCCESS")))
            Files.writeString(p.resolve(PublishedMarker), "")
        }
        // the CURRENT pointer target is excluded unconditionally, not
        // assumed to be the numerically newest: racing no-CAS publishers
        // can publish out of numeric order, and "keep the newest N
        // published" would then GC the freshly-swapped current version
        // itself, leaving the pointer dangling (caught by the
        // breaker-storm spec)
        val curName = Paths.get(snapshotPath(name)).getFileName.toString
        // tags AND branch heads + fork bases pin by name (the Iceberg
        // ref contract: refs pin their reachable snapshots): retention
        // never ages them out; drop_tag / drop_branch releases
        val tagged = taggedVersions(name) ++ branchPinnedVersions(name)
        versions(name)
          .filter { case (v, p) =>
            Files.exists(p.resolve(PublishedMarker)) &&
              p.getFileName.toString != curName &&
              !tagged.contains(v)
          }
          .dropRight(retain - 1)
          .foreach { case (_, p) => deleteRecursively(p) }
        // branch debris: a BRANCH-marked dir whose version no active
        // branch can still reach — not in any (base, head] window and
        // never promoted to main — lost its ref (drop_branch, or a
        // superseded head). The window is a safe superset: another
        // branch's numeric range shields a dir at worst one sweep longer.
        val windows = branches(name).values
        versions(name).foreach { case (v, p) =>
          if (Files.exists(p.resolve(BranchMarker)) &&
              !Files.exists(p.resolve(PublishedMarker)) &&
              !windows.exists { case (head, base) => v > base && v <= head })
            deleteRecursively(p)
        }
      }
    }

    /** Discard an abandoned stage ([[WarehouseIO.discardDir]] — each IO
      * impl vacates the version number its own safe way; the rationale
      * lives with the impls).
      */
    private[sources] def discardStage(versionDir: Path): Unit =
      // the IO impl vacates the number its own safe way (rename-first on
      // POSIX, in-place delete on object stores); the allocation MARKER
      // owns the number until it is deleted LAST, either way
      try io.discardDir(versionDir)
      finally Files.deleteIfExists(stageMarkerPath(versionDir))

    /** Serialize the pointer swap across processes. The lock file is
      * created O_EXCL; a holder crashing between create and delete would
      * deadlock every later committer, so a lock older than
      * [[Tables.CommitLockStaleMs]] is broken — safe because the guarded
      * region is a validate + one atomic rename (no partial state to
      * protect), so a breaker can at worst race a STALLED-not-crashed
      * holder, which then fails its own delete harmlessly (deleteIfExists).
      */
    private[sources] def withCommitLock[T](name: String)(body: => T): T = {
      val lock = Paths.get(s"${tablePath(name)}.commitlock")
      val deadline = System.nanoTime() + CommitLockTimeoutMs * 1000000L
      // ownership token: release must delete only ITS OWN lock — a
      // holder stalled past the stale threshold whose lock was broken
      // would otherwise blind-delete its SUCCESSOR's fresh lock and
      // admit a third committer mid-swap (review finding). The stalled
      // holder's own concurrent swap remains a documented residual (a
      // >30s pause inside a millisecond region), but it no longer
      // cascades.
      val token = s"${ProcessHandle.current().pid()}-${System.nanoTime()}"
      var acquired = false
      while (!acquired) {
        try {
          io.createExclusive(lock)
          Files.writeString(lock, token)
          acquired = true
        }
        catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            val stale =
              try Files.getLastModifiedTime(lock).toMillis <
                System.currentTimeMillis() - CommitLockStaleMs
              catch { case _: java.io.IOException => false } // holder just released
            if (stale) {
              // at-most-one-breaker per lock incarnation — the mechanism
              // is per-IO ([[WarehouseIO.breakStaleLock]]: atomic rename
              // aside on POSIX, a conditional-PUT break token on object
              // stores); losers loop back to the create race either way
              io.breakStaleLock(lock)
            }
            else if (System.nanoTime() > deadline)
              throw new IllegalStateException(
                s"timed out waiting for commit lock $lock — a committer is " +
                  "stalled (not crashed: crashed holders age out after " +
                  s"${CommitLockStaleMs}ms)")
            else Thread.sleep(2)
        }
      }
      try body finally {
        try {
          if (Files.exists(lock) && Files.readString(lock) == token)
            Files.deleteIfExists(lock)
        } catch { case _: java.io.IOException => () } // successor owns it
      }
    }

    /** Run `body` with optimistic conflict retry — THE one copy of the
      * maintenance callers' loop (compaction, tombstone expiry in both
      * layouts). `body` must re-read all state it depends on at the top
      * of each evaluation: a retry IS a fresh attempt against the
      * rival's new current version. Retries on the commit CAS's
      * ConcurrentModificationException and on a pinned snapshot aging
      * out mid-read ([[Tables.isSnapshotRace]]); bounded — pathological
      * contention fails loudly rather than spinning.
      */
    def retryingConflicts[T](maxAttempts: Int = 3)(body: => T): T = {
      var attempt = 0
      while (true) {
        try return body
        catch {
          case e: java.util.ConcurrentModificationException =>
            attempt += 1
            if (attempt > maxAttempts) throw e
          case scala.util.control.NonFatal(e) if isSnapshotRace(e, Some(root)) =>
            attempt += 1
            if (attempt > maxAttempts) throw e
        }
      }
      throw new IllegalStateException("unreachable")
    }

    /** True when a version dir is PUBLISHED: it carries the marker, or
      * it is the current pointer target (the swap-to-stamp crash window),
      * or it is a GRANDFATHERED pre-marker snapshot — neither marker nor
      * stage sibling, numerically at-or-below the current pointer target.
      * The last clause is what keeps retained history written by
      * pre-marker code visible (and un-GC-able) after an upgrade: those
      * dirs have no `_published`, but they also provably lack the
      * `.stage` sibling every marker-aware stage carries from allocation
      * to publication, while a live overtaken rival's stage below
      * current still has its sibling and stays unpublished (advice
      * finding). Everything that reads or retains snapshots consults
      * this — an unpublished dir is a rival's half-written stage and
      * must never be served as a committed snapshot (review finding:
      * emitPending diffing a mid-write stage would feed garbage rows
      * downstream).
      */
    private def isPublishedDir(name: String, version: Long, dir: Path): Boolean =
      Files.exists(dir.resolve(PublishedMarker)) ||
        dir.toAbsolutePath.normalize.toString ==
          Paths.get(snapshotPath(name)).toAbsolutePath.normalize.toString ||
        (!Files.exists(stageMarkerPath(dir)) &&
          // a BRANCH-committed dir is definitively not pre-marker
          // history: it stays out of main until fast_forward stamps it
          // (without this, main overtaking a branch's version numbers
          // would grandfather the branch's dirs into main history)
          !Files.exists(dir.resolve(BranchMarker)) &&
          // _SUCCESS: a COMPLETED pre-marker Spark write — a stage
          // crashed under pre-upgrade code is half-written without it
          // and must never be served as a snapshot (advice finding)
          Files.exists(dir.resolve("_SUCCESS")) &&
          currentVersion(name).exists(version <= _))

    /** PUBLISHED version numbers of `name` currently retained, ascending.
      * In-flight/crashed stages are excluded — they are not snapshots.
      */
    def listVersions(name: String): Seq[Long] =
      versions(name).collect { case (v, p) if isPublishedDir(name, v, p) => v }

    /** Retained PUBLISHED versions with their directories, ascending —
      * the snapshot-log face consumed by the SQL catalog
      * ([[GraftCatalog]]): `VERSION AS OF` resolves a number to its dir,
      * `TIMESTAMP AS OF` scans the publish stamps.
      */
    def publishedVersions(name: String): Seq[(Long, Path)] =
      versions(name).filter { case (v, p) => isPublishedDir(name, v, p) }

    /** Publish stamp (epoch millis) of a published version dir: the
      * `_published` marker's mtime (written at pointer-swap time). A
      * GRANDFATHERED pre-marker dir has no marker yet — its own mtime
      * stands in (the write-completion time, at or before publication,
      * so `TIMESTAMP AS OF` stays conservative: it never serves a
      * version as-of a time before that version existed).
      */
    def publishTimeMillis(dir: Path): Long = {
      val marker = dir.resolve(PublishedMarker)
      val p = if (Files.exists(marker)) marker else dir
      Files.getLastModifiedTime(p).toMillis
    }

    /** Version directories that were never PUBLISHED (no
      * [[Tables.PublishedMarker]]) — another writer's in-flight stage, or
      * a crashed commit's leftover at ANY version number (an overtaken
      * slow rival's stage can sit numerically below the current
      * version). Never GC'd by [[commit]] (the writer may still be
      * alive); exposed for
      * [[graft.plans.Maintenance.removeOrphans]]'s age-guarded sweep.
      */
    private[graft] def unpublishedStages(name: String): Seq[Path] =
      versions(name).collect {
        // BRANCH-committed dirs are durable refs, not crashed stages —
        // the orphan sweep must never age out a live branch's history
        // (the branch-debris sweep in publishStage owns their GC)
        case (v, p) if !isPublishedDir(name, v, p) &&
          !Files.exists(p.resolve(BranchMarker)) => p
      }

    /** Time-travel read of a specific retained version. Fails loudly when
      * the version was GC'd (or never existed) — silently serving a
      * different snapshot would corrupt every incremental consumer
      * downstream.
      */
    def readVersion(spark: SparkSession, name: String, version: Long,
        mergeSchema: Boolean = false): DataFrame = {
      val p = versions(name).collectFirst {
        case (`version`, dir) if isPublishedDir(name, version, dir) => dir
      }
        .getOrElse(throw new NoSuchElementException(
          s"$name has no retained version $version (published only) " +
            s"(retained: ${listVersions(name).mkString(", ")}; retain=$retain)"))
      // uniform-footer shortcut — see [[read]]; a retained version dir
      // is immutable, so the memoized footers make re-reads free
      SchemaEvolution.uniformFooterSchema(spark, p.toString) match {
        case Some(s) =>
          spark.read.schema(s).option("recursiveFileLookup", "true")
            .parquet(p.toString)
        case None =>
          spark.read.option("recursiveFileLookup", "true")
            .option("mergeSchema", mergeSchema.toString)
            .parquet(p.toString)
      }
    }

    /** Overwrite via an atomic versioned commit (see [[commit]]). */
    def overwrite(df: DataFrame, name: String): Unit = {
      // root markers ride every snapshot rewrite (stream replay
      // positions, cursors) — overwrite replaces DATA, not the table's
      // cross-commit contracts
      val markers = Tables.readRootMarkers(snapshotPath(name))
      commit(name) { path =>
        df.write.mode(SaveMode.Overwrite).parquet(path)
        Tables.writeRootMarkers(markers, path)
      }
    }
    def append(df: DataFrame, name: String): Unit =
      df.write.mode(SaveMode.Append).parquet(tablePath(name))

    /** Atomic versioned APPEND: commit a new snapshot holding the previous
      * version's files (zero-copy hard links) plus `df`'s rows — O(new
      * data) cost with full snapshot semantics (the previous version stays
      * readable through time travel; the publish is the same pointer CAS
      * as [[overwrite]]). This is Iceberg's fast append (a new snapshot
      * REFERENCES the old data files instead of rewriting them,
      * `tabular.py:69-70`'s managed substrate) re-expressed on plain
      * parquet, where a reference is a hard link. The SQL `INSERT INTO`
      * path of [[graft.sources.GraftCatalog]] lands here.
      *
      * Carried along with the data: root marker files (the compaction
      * paths' marker-carry contract) and a `_zonemap` manifest when one
      * exists. The carried manifest is STALE BY CENSUS — the appended
      * files are not in it — which is precisely the state
      * [[graft.plans.Maintenance.clusterIncremental]] repairs with a
      * churn-proportional re-sort instead of a full rewrite; zone-map
      * reads detect the census mismatch and fall back loudly to the full
      * scan until then.
      *
      * Concurrency: the carried previous version is resolved INSIDE the
      * staged write (freshest published below the stage), and the pointer
      * swap CAS-checks the version observed at entry — a rival landing
      * mid-append surfaces as ConcurrentModificationException for
      * [[retryingConflicts]], never as a lost update. One residual,
      * documented not hidden: when the table does not exist yet (or is a
      * legacy real-dir layout) there is no version to CAS against, so two
      * concurrent FIRST appends follow [[overwrite]]'s last-wins — the
      * catalog's SQL path never hits it (CREATE TABLE gates existence and
      * refuses rivals), and direct API users own first-write coordination
      * exactly as they do for overwrite.
      */
    def appendVersioned(df: DataFrame, name: String): Unit = {
      require(timePartitionCol(name).isEmpty,
        s"$name is a hidden-time-partitioned append table; its appends " +
          "are batch-granular (appendBatch), not versioned snapshots")
      val expected = currentVersion(name)
      commit(name, expectCurrent = expected) { staged =>
        df.write.mode(SaveMode.Overwrite).parquet(staged)
        carryPreviousInto(name, Paths.get(staged))
      }
    }

    /** Zero-copy carry of the freshest published version BELOW a staged
      * one into the stage — [[appendVersioned]]'s append half, exposed
      * for externally-staged appends (the catalog's streaming write).
      */
    private[graft] def carryPreviousInto(name: String, stagedP: Path): Unit = {
      val m = versionPattern(name).matcher(stagedP.getFileName.toString)
      require(m.matches(), s"stage dir $stagedP outside the version layout")
      val next = m.group(1).toLong
      versions(name)
        .filter { case (v, p) => v < next && isPublishedDir(name, v, p) }
        .lastOption
        .foreach { case (_, prev) => carryVersionInto(prev, stagedP) }
    }

    /** Zero-copy carry of a published version's contents into a staged
      * append (see [[appendVersioned]]): data files hard-link under their
      * own relative names (Spark part-file names are UUID-unique; a
      * collision falls back to a prefixed name and drops the manifest
      * carry, whose census could not cover the rename), the `_zonemap`
      * manifest links under its own directory, root markers copy
      * byte-for-byte. `_SUCCESS` and [[Tables.PublishedMarker]] are NOT
      * carried — publication is the commit's own act on the new dir.
      */
    private[graft] def carryVersionInto(prev: Path, staged: Path): Unit = {
      def linkOrCopy(src: Path, dst: Path): Unit = io.linkOrCopy(src, dst)
      var manifestSafe = true
      def carryData(dir: Path, rel: String): Unit = {
        val s = Files.list(dir)
        try s.iterator().asScala.foreach { p =>
          val fn = p.getFileName.toString
          if (fn.startsWith("_") || fn.startsWith(".")) ()
          else if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
            Files.createDirectories(staged.resolve(rel).resolve(fn))
            carryData(p, s"$rel$fn/")
          } else {
            val dst = staged.resolve(rel).resolve(fn)
            if (Files.exists(dst)) { // UUID collision: vanishingly rare
              linkOrCopy(p, staged.resolve(rel)
                .resolve(s"carried-${System.nanoTime()}-$fn"))
              manifestSafe = false
            } else linkOrCopy(p, dst)
          }
        } finally s.close()
      }
      def carryTree(src: Path, dst: Path): Unit = {
        Files.createDirectories(dst)
        val es = Files.list(src)
        try es.iterator().asScala.foreach { p =>
          val fn = p.getFileName.toString
          // skip write-attempt debris (dot-prefixed / .tmp): a zombie
          // speculative task can land a .tmp AFTER the writer's own
          // sweep, and carrying it would hard-link the debris into every
          // later snapshot forever (advice finding). Readers key on the
          // committed names only, so the skip is content-neutral.
          if (fn.startsWith(".") || fn.endsWith(".tmp")) ()
          else {
            val t = dst.resolve(fn)
            if (Files.isDirectory(p)) carryTree(p, t) else linkOrCopy(p, t)
          }
        } finally es.close()
      }
      // ONE listing of the previous root dispatches every carry class
      // (data walked first — the zone-map manifest only carries when no
      // collision renamed a data file out from under its census):
      //  - plain names: data files/dirs, hard-link under their own names
      //  - `_<marker>` files: root markers (_ivm_batch_id, _feed_cursor,
      //    streaming epochs) copy byte-for-byte; publication/_SUCCESS
      //    excluded — publication is the commit's own act on the new dir
      //  - `_zonemap`: per-file stats stay valid because data files
      //    carry under their own names
      //  - `_eqdeletes`: pending merge-on-read sidecars are part of the
      //    snapshot's LOGICAL content — dropping them on an append or
      //    roll-forward would resurrect deleted rows; censuses stay
      //    valid for the same reason the manifest does
      val entries = {
        val s = Files.list(prev)
        try s.iterator().asScala.toVector finally s.close()
      }
      // data first (manifestSafe must be decided before _zonemap carries)
      entries.foreach { p =>
        val fn = p.getFileName.toString
        if (fn.startsWith("_") || fn.startsWith(".")) ()
        else if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
          Files.createDirectories(staged.resolve(fn))
          carryData(p, s"$fn/")
        } else {
          val dst = staged.resolve(fn)
          if (Files.exists(dst)) {
            linkOrCopy(p, staged.resolve(s"carried-${System.nanoTime()}-$fn"))
            manifestSafe = false
          } else linkOrCopy(p, dst)
        }
      }
      entries.foreach { p =>
        val fn = p.getFileName.toString
        if (fn == "_zonemap" && Files.isDirectory(p)) {
          if (manifestSafe) {
            val dst = staged.resolve("_zonemap")
            Files.createDirectories(dst)
            val zs = Files.list(p)
            try zs.iterator().asScala.filter(Files.isRegularFile(_))
              .foreach(f => linkOrCopy(f, dst.resolve(f.getFileName.toString)))
            finally zs.close()
          }
        } else if (fn == EqDeletes.Dir && Files.isDirectory(p))
          carryTree(p, staged.resolve(EqDeletes.Dir))
        else if (fn == PosDeletes.Dir && Files.isDirectory(p))
          // positional tombstones are snapshot content exactly like the
          // equality sidecars: data files carry under their own names,
          // so every (file, ordinal) stays valid
          carryTree(p, staged.resolve(PosDeletes.Dir))
        else if (fn.startsWith("_") && fn != "_SUCCESS" &&
            fn != PublishedMarker && fn != BranchMarker &&
            fn != RollbackMarker && fn != PromotedMarker &&
            fn != CherrypickMarker && fn != ParentMarker && // version-local lineage, never carries
            Files.isRegularFile(p))
          Files.copy(p, staged.resolve(fn),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }

    /** Restore a retained snapshot as the CURRENT table state — the
      * recovery move the retained history exists for (Iceberg's
      * `rollback_to_snapshot`). Implemented as a ROLL-FORWARD: a new
      * version is committed whose content hard-links the target
      * version's files ([[carryVersionInto]], zero-copy), so
      *
      *  - the snapshot log stays APPEND-ONLY: every old version keeps
      *    its number and publish stamp, `TIMESTAMP AS OF` history never
      *    rewrites, and "as of now" serves the restored state because
      *    the roll-forward is the latest publication (a naive pointer
      *    swap back to the old dir would leave `TIMESTAMP AS OF now`
      *    resolving the bad write — the newest stamp — forever);
      *  - the restored state is protected from retention GC the same
      *    way every current version is: it IS the current version;
      *  - concurrency is the plain commit CAS — a rival landing during
      *    the rollback surfaces as a conflict, never a lost update.
      *
      * The bad versions stay retained (still readable via `VERSION AS
      * OF` for forensics) until normal retention ages them out.
      * @return the new current version number
      */
    def rollbackTo(name: String, version: Long): Long = {
      val src = versions(name).collectFirst {
        case (`version`, dir) if isPublishedDir(name, version, dir) => dir
      }.getOrElse(throw new NoSuchElementException(
        s"$name has no retained published version $version " +
          s"(retained: ${listVersions(name).mkString(", ")})"))
      val cur = currentVersion(name).getOrElse(
        throw new IllegalStateException(
          s"$name is not a versioned table — nothing to roll back"))
      var rolled = -1L
      commit(name, expectCurrent = Some(cur)) { staged =>
        val stagedP = Paths.get(staged)
        carryVersionInto(src, stagedP)
        // lineage for `t.history`: this version is a rollback, and its
        // SOURCE is otherwise invisible in the append-only log (written
        // after the carry so a source that was itself a rollback never
        // leaks its own marker in)
        Files.writeString(stagedP.resolve(RollbackMarker),
          version.toString)
        val m = versionPattern(name).matcher(stagedP.getFileName.toString)
        require(m.matches(), s"stage dir $staged outside the version layout")
        rolled = m.group(1).toLong
      }
      rolled
    }

    /** Explicit snapshot expiry (Iceberg's `expire_snapshots`): drop
      * retained PUBLISHED versions beyond the newest `keepLast`,
      * never the current pointer target (whatever its number — rollback
      * and out-of-order publishes both make "current" independent of
      * "newest"). Serialized with committers by the commit lock.
      *
      * `olderThanMs` adds Iceberg's PRIMARY expiry axis (round-19
      * verdict item 3): when set, a version expires only if its publish
      * stamp — the same stamp `t.history.made_current_at` surfaces — is
      * strictly before that epoch-millis cutoff. keepLast stays the
      * retained FLOOR (a bursty commit rate can't age out the newest
      * `keepLast` even when they're all past the cutoff); tags, branch
      * pins, and the current pointer keep overriding both axes.
      * @return the version numbers deleted
      */
    def expireSnapshots(name: String, keepLast: Int,
        olderThanMs: Option[Long] = None): Seq[Long] = {
      require(keepLast >= 1, s"keepLast must retain the current version, got $keepLast")
      withCommitLock(name) {
        val curName = Paths.get(snapshotPath(name)).getFileName.toString
        // tags AND branch heads + fork bases pin (a fast-forwarded
        // branch can point at a _published version; a live branch's
        // base is its ancestry witness); drop_tag / drop_branch releases
        val tagged = taggedVersions(name) ++ branchPinnedVersions(name)
        val expirable = versions(name)
          .filter { case (v, p) => isPublishedDir(name, v, p) &&
            p.getFileName.toString != curName &&
            !tagged.contains(v) }
        val doomed = expirable.dropRight(keepLast - 1)
          .filter { case (_, p) =>
            olderThanMs.forall(cut => publishTimeMillis(p) < cut) }
        doomed.foreach { case (_, p) => deleteRecursively(p) }
        doomed.map(_._1)
      }
    }

    /** TAGS — Iceberg's named snapshot refs: a tag pins one published
      * version by name, protects it from BOTH retention GC and explicit
      * expiry for as long as it exists, and resolves in SQL as
      * `VERSION AS OF '<tag>'`. Stored as `tag.<name>` table props (the
      * same sidecar every other declaration uses); creating over an
      * existing tag name refuses — retag is an explicit drop + create.
      */
    def createTag(name: String, tag: String, version: Long): Unit = {
      require(tag.nonEmpty && !tag.forall(_.isDigit),
        s"tag '$tag' must be non-empty and non-numeric (numbers are versions)")
      val key = s"$TagPropPrefix$tag"
      // UNDER THE COMMIT LOCK: retention GC (publishStage) and explicit
      // expiry read the tag set while holding it — validating and
      // writing the prop outside would let a concurrent commit's GC miss
      // the new tag and delete the version mid-tagging (validated, then
      // gone). The lock makes validate+pin atomic against both sweeps.
      withCommitLock(name) {
        val props = TableProps.read(this, name)
        require(!props.contains(key),
          s"tag '$tag' already exists on '$name' (-> v${props(key)}); " +
            "drop it first to retag")
        require(listVersions(name).contains(version),
          s"'$name' has no retained published version $version " +
            s"(retained: ${listVersions(name).mkString(", ")})")
        TableProps.write(this, name, props + (key -> version.toString))
      }
    }

    /** Drop a tag: the pinned version re-enters the normal retention
      * window (GC'd on the next commit if outside it).
      * @return true when the tag existed
      */
    def dropTag(name: String, tag: String): Boolean = {
      val key = s"$TagPropPrefix$tag"
      val props = TableProps.read(this, name)
      if (!props.contains(key)) return false
      TableProps.write(this, name, props - key)
      true
    }

    /** All tags of `name`: tag -> version. */
    def tags(name: String): Map[String, Long] =
      TableProps.read(this, name).collect {
        case (k, v) if k.startsWith(TagPropPrefix) =>
          k.drop(TagPropPrefix.length) -> v.toLong
      }

    private def taggedVersions(name: String): Set[Long] =
      tags(name).values.toSet

    // ------------------------------------------------------------------
    // Branches — write-audit-publish (Iceberg branch refs re-expressed
    // on the props sidecar; the reference's substrate inherits them from
    // the same v2 spec as tags, tabular.py:69-70). A branch is a named
    // MUTABLE ref: `branch.<name>.head` is the version it serves,
    // `branch.<name>.base` the MAIN version it forked from (the
    // fast-forward ancestry witness). Branch commits allocate stage dirs
    // from the table's one version sequence (numbers are global; refs
    // select), carry from the BRANCH head, stamp the published marker,
    // and CAS the head prop under the table's commit lock — the same
    // optimistic concurrency as the main pointer, on the same lock.
    // Branch-committed versions stay OUT of main's history
    // (isPublishedDir gates on the main pointer) until fast_forward
    // publishes them with one pointer CAS; retention GC pins every
    // branch HEAD exactly like a tag.
    // ------------------------------------------------------------------

    private def branchHeadKey(b: String) = s"$BranchPropPrefix$b.head"
    private def branchBaseKey(b: String) = s"$BranchPropPrefix$b.base"
    // idempotent fast-forward journal: written BEFORE the pointer swap,
    // cleared by the final prop write — its presence means a crashed
    // fast_forward whose promotion/props may be incomplete
    private def ffPendingKey(b: String) = s"$BranchPropPrefix$b.ff-pending"
    // idempotent cherrypick journal (round 18): written BEFORE the
    // apply commit, cleared by the post-publish rebase — its presence
    // means a cherrypick whose publish/rebase may be incomplete. The
    // value is the plan-time expected current version; the published
    // apply commit identifies itself with a version-local
    // [[Tables.CherrypickMarker]], which makes settlement exact.
    private def cpPendingKey(b: String) = s"$BranchPropPrefix$b.cp-pending"

    /** Record a cherrypick journal for `branch` (see [[cpPendingKey]]).
      * Under the commit lock like every branch-prop write.
      */
    private[graft] def writeCherrypickJournal(name: String, branch: String,
        expect: Long): Unit = withCommitLock(name) {
      TableProps.write(this, name,
        TableProps.read(this, name) + (cpPendingKey(branch) -> expect.toString))
    }

    /** Settle any crashed fast_forward / cherrypick journals now (the
      * same settlement every pointer swap runs) — called by cherrypick
      * before planning so a prior crash heals first and the re-run sees
      * the healed (usually empty) diff.
      */
    private[graft] def settleBranchJournals(name: String): Unit =
      withCommitLock(name) {
        settleFastForwards(name, TableProps.read(this, name))
        ()
      }

    /** Settle crashed fast_forwards (advice finding): the old replay
      * clause healed only while main still POINTED at the branch head —
      * a main commit landing first stranded the branch's intermediate
      * versions as BranchMarker'd forever (hidden from time travel) with
      * stale branch props. The journal makes recovery unambiguous under
      * any later pointer position: main still at the fork base → the
      * swap never ran, the fast_forward never took effect, drop the
      * journal; main anywhere else → the swap ran (the pointer can only
      * have left the base through our swap — settlement runs before
      * every other swap on this lock), so complete the marker promotion
      * and re-base the branch. Idempotent; MUST run under the commit
      * lock. Called at the top of every [[publishStage]] and
      * [[fastForward]] — the only two pointer-swap sites.
      * @return the settled props
      */
    private def settleFastForwards(name: String,
        props0: Map[String, String]): Map[String, String] = {
      var props = props0
      props0.keys.toSeq
        .filter(k => k.startsWith(BranchPropPrefix) &&
          k.endsWith(".ff-pending"))
        .foreach { k =>
          val b = k.drop(BranchPropPrefix.length)
            .dropRight(".ff-pending".length)
          val parts = props(k).split(':')
          val (base, head) = (parts(0).toLong, parts(1).toLong)
          val cur = currentVersion(name)
          if (cur.contains(base) && base != head) {
            props = props - k // swap never ran: the ff never took effect
          } else {
            val ownedChain = versions(name).filter { case (v, p) =>
              try v > base && v <= head &&
                Files.readString(p.resolve(BranchMarker)) == b
              catch { case _: java.io.IOException => false }
            }
            ownedChain.zipWithIndex.foreach { case ((v, p), i) =>
              Files.writeString(p.resolve(PublishedMarker), "")
              // keep the branch provenance for t.history (the marker
              // itself must go: it means "not main history"); parent =
              // the previous version of the promoted chain (the fork
              // base for its first commit)
              Files.writeString(p.resolve(PromotedMarker), b)
              Files.writeString(p.resolve(ParentMarker),
                (if (i == 0) base else ownedChain(i - 1)._1).toString)
              Files.deleteIfExists(p.resolve(BranchMarker))
            }
            props = props - k + (branchBaseKey(b) -> head.toString)
          }
          TableProps.write(this, name, props)
        }
      // crashed CHERRYPICKS (round 18): the journal names the plan-time
      // expected version E; the apply commit (expectCurrent = E) either
      // landed — in which case EXACTLY one published version > E carries
      // this branch's CherrypickMarker (written inside the staged
      // commit, atomic with publication) and the branch rebases there —
      // or it never published (the CAS bound guarantees no silent
      // partial state) and the journal simply drops. A branch dropped
      // mid-crash only drops its journal (never resurrects).
      props.keys.toSeq
        .filter(k => k.startsWith(BranchPropPrefix) &&
          k.endsWith(".cp-pending"))
        .foreach { k =>
          val b = k.drop(BranchPropPrefix.length)
            .dropRight(".cp-pending".length)
          val expect = props(k).toLong
          val landed = publishedVersions(name).collectFirst {
            case (v, p) if v > expect && {
              val m = p.resolve(CherrypickMarker)
              try Files.readString(m).trim == b
              catch { case _: java.io.IOException => false }
            } => v
          }
          landed match {
            case Some(v) =>
              // the apply PUBLISHED (the marker is proof): complete the
              // rebase — a dropped branch only clears its journal
              props =
                if (props.contains(branchHeadKey(b)))
                  props - k + (branchHeadKey(b) -> v.toString) +
                    (branchBaseKey(b) -> v.toString)
                else props - k
              TableProps.write(this, name, props)
            case None if currentVersion(name).contains(expect) =>
              // main still AT the journaled version and nothing landed:
              // the owning cherrypick may be in flight right now (its
              // own publish runs this very settlement first) — leave
              // it; a crashed-pre-publish journal clears one commit
              // later, when the pointer has provably moved past it
              ()
            case None =>
              props = props - k // never published (the CAS bound)
              TableProps.write(this, name, props)
          }
        }
      props
    }

    /** All branches of `name`: branch -> (head version, fork base). */
    def branches(name: String): Map[String, (Long, Long)] = {
      val props = TableProps.read(this, name)
      props.collect {
        case (k, v) if k.startsWith(BranchPropPrefix) && k.endsWith(".head") =>
          val b = k.drop(BranchPropPrefix.length).dropRight(".head".length)
          b -> (v.toLong, props(branchBaseKey(b)).toLong)
      }
    }

    private[graft] def branchHeadVersions(name: String): Set[Long] =
      branches(name).values.map(_._1).toSet

    /** Versions a LIVE branch pins: its head AND its fork base (round
      * 18 — the Iceberg refs-pin-reachable-snapshots rule). The base is
      * the branch's ancestry witness: `branchDiff` and divergence
      * detection read it from main's retained history, so retention and
      * explicit expiry must not age it out while the branch lives;
      * `drop_branch` releases both pins.
      */
    private[graft] def branchPinnedVersions(name: String): Set[Long] =
      branches(name).values.flatMap { case (head, base) =>
        Seq(head, base)
      }.toSet

    /** Fork a branch at the current MAIN version. Validate+record runs
      * under the commit lock for the same reason create_tag does: the
      * retention sweep reads the pinned set while holding it.
      */
    def createBranch(name: String, branch: String): Long = {
      require(branch.nonEmpty && !branch.forall(_.isDigit) &&
        !branch.contains(".") && !branch.contains("/"),
        s"branch '$branch' must be non-empty, non-numeric, and dot/slash-free")
      withCommitLock(name) {
        val props = TableProps.read(this, name)
        require(!props.contains(branchHeadKey(branch)),
          s"branch '$branch' already exists on '$name' " +
            s"(-> v${props(branchHeadKey(branch))})")
        val cur = currentVersion(name).getOrElse(
          throw new IllegalStateException(
            s"'$name' is not a versioned table; branches need the " +
              "pointer layout"))
        TableProps.write(this, name, props +
          (branchHeadKey(branch) -> cur.toString) +
          (branchBaseKey(branch) -> cur.toString))
        cur
      }
    }

    /** Re-point a branch's head AND base to `version` (the
      * post-cherrypick rebase: the branch's changes are merged into
      * main, the old head/base pins release, and new branch work forks
      * from the merged state). Under the commit lock for the same
      * reason create_branch is: the retention sweep reads the pinned
      * set while holding it.
      */
    private[graft] def rebaseBranch(name: String, branch: String,
        version: Long): Unit = withCommitLock(name) {
      val props = TableProps.read(this, name)
      require(props.contains(branchHeadKey(branch)),
        s"'$name' has no branch '$branch' to rebase")
      TableProps.write(this, name, props - cpPendingKey(branch) +
        (branchHeadKey(branch) -> version.toString) +
        (branchBaseKey(branch) -> version.toString))
    }

    /** Drop a branch ref. Its unmerged versions lose their pin and age
      * out under normal retention (still readable until then).
      */
    def dropBranch(name: String, branch: String): Boolean =
      withCommitLock(name) {
        // settle first: dropping a branch mid-crashed-fast_forward must
        // not orphan the journal (its promotion work would be lost)
        val props = settleFastForwards(name, TableProps.read(this, name))
        if (!props.contains(branchHeadKey(branch))) false
        else {
          TableProps.write(this, name,
            props - branchHeadKey(branch) - branchBaseKey(branch))
          true
        }
      }

    /** Version dir a branch currently serves (readable even though main
      * does not publish it yet — the AUDIT face of write-audit-publish).
      */
    def branchSnapshotDir(name: String, branch: String): Path = {
      val (head, _) = branches(name).getOrElse(branch,
        throw new NoSuchElementException(
          s"'$name' has no branch '$branch' " +
            s"(branches: ${branches(name).keys.toSeq.sorted.mkString(", ")})"))
      val dir = Paths.get(s"${tablePath(name)}.v$head")
      require(Files.isDirectory(dir) &&
        (Files.exists(dir.resolve(PublishedMarker)) ||
          Files.exists(dir.resolve(BranchMarker))),
        s"branch '$branch' of '$name' points at missing/unstamped v$head")
      dir
    }

    /** Atomic versioned APPEND onto a branch: stage from the table's one
      * version sequence, carry the BRANCH head's files (zero-copy), CAS
      * the head prop. The write-audit-publish ingest face.
      */
    def appendToBranch(df: DataFrame, name: String, branch: String): Unit = {
      val expectHead = branches(name).getOrElse(branch,
        throw new NoSuchElementException(
          s"'$name' has no branch '$branch'"))._1
      val headDir = branchSnapshotDir(name, branch)
      val versionDir = allocateStage(name)
      try {
        df.write.mode(SaveMode.Overwrite).parquet(versionDir.toString)
        carryVersionInto(headDir, versionDir)
      } catch { case t: Throwable => discardStage(versionDir); throw t }
      publishStageToBranch(name, versionDir, branch, expectHead)
    }

    /** Publish an externally-staged version dir as the new HEAD of
      * `branch` — one CAS on the recorded head prop, the branch analog
      * of [[publishStage]]. The stage must already hold the branch's
      * full post-commit content (the caller carried/wrote it); on CAS
      * failure the stage is discarded and the conflict thrown for
      * [[retryingConflicts]]. The write-audit-publish DML face
      * (branch-routed DELETE/UPDATE/MERGE) commits through here.
      */
    private[graft] def publishStageToBranch(name: String, versionDir: Path,
        branch: String, expectHead: Long): Unit = {
      val next = {
        val m = versionPattern(name).matcher(versionDir.getFileName.toString)
        require(m.matches()); m.group(1).toLong
      }
      withCommitLock(name) {
        val props = TableProps.read(this, name)
        val head = props.get(branchHeadKey(branch)).map(_.toLong)
        if (head != Some(expectHead)) {
          discardStage(versionDir)
          throw new java.util.ConcurrentModificationException(
            s"branch '$branch' of '$name' moved from v$expectHead to " +
              s"${head.fold("dropped")(v => s"v$v")} during the commit")
        }
        // the BRANCH marker, not `_published`: main's history, carries,
        // and retention reason over `_published` — a branch commit is
        // durable and pinned but invisible to main until fast_forward
        Files.writeString(versionDir.resolve(BranchMarker), branch)
        Files.deleteIfExists(stageMarkerPath(versionDir))
        TableProps.write(this, name,
          props + (branchHeadKey(branch) -> next.toString))
        // no retention sweep here: branch commits never unpin main
        // history; main's own commits sweep, with branch heads pinned
      }
    }

    /** Publish a branch into main with ONE pointer CAS — legal only when
      * main has not moved since the fork (the recorded base IS the
      * ancestry witness: branch history is linear on top of it, so main
      * == base means every branch version descends from main's current).
      * The branch stays, re-based at its own head (Iceberg semantics).
      * @return the new main version (the branch head)
      */
    def fastForward(name: String, branch: String): Long =
      withCommitLock(name) {
        // settle any crashed fast_forward FIRST — including this
        // branch's own, which makes the re-run a clean no-op below
        val props = settleFastForwards(name, TableProps.read(this, name))
        val head = props.getOrElse(branchHeadKey(branch),
          throw new NoSuchElementException(
            s"'$name' has no branch '$branch'")).toLong
        val base = props(branchBaseKey(branch)).toLong
        val cur = currentVersion(name)
        require(cur.contains(base),
          s"fast_forward('$name', '$branch') is not fast-forwardable: " +
            s"main moved from the fork base v$base to " +
            s"${cur.fold("none")(v => s"v$v")}; rebase the branch " +
            "(drop + re-create + re-apply) or merge manually")
        if (head != base) {
          val headDir = Paths.get(s"${tablePath(name)}.v$head")
          require(Files.isDirectory(headDir),
            s"branch '$branch' head v$head is missing")
          // journal the intent BEFORE the swap (idempotent recovery —
          // advice finding): a crash anywhere between the swap and the
          // final prop write is settled by the next publishStage /
          // fast_forward on this table, wherever main's pointer has
          // moved by then — the old replay clause healed only while
          // main still pointed at the branch head.
          TableProps.write(this, name,
            props + (ffPendingKey(branch) -> s"$base:$head"))
          io.atomicPointerSwap(Paths.get(tablePath(name)),
            headDir.getFileName,
            scratch = Paths.get(s"${tablePath(name)}.ptr$head"))
          // THIS branch's commits join main history (Iceberg ancestry:
          // the audited intermediates stay readable as snapshots until
          // retention ages them out) — promote the branch marker to
          // `_published` on exactly the dirs this branch stamped; their
          // publish stamp is NOW, when they became visible to main.
          // Promotion runs AFTER the swap (the swap-then-stamp discipline
          // publishStage follows — advice finding): a crash before the
          // swap must never leave branch versions stamped as published
          // main history while the pointer still serves the base. The
          // converse crash (swap done, promotion pending) hides the
          // intermediates from time travel until the journal settles;
          // the head itself is served via the pointer-target clause
          // of isPublishedDir throughout.
          val ownedChain = versions(name).filter { case (v, p) =>
            try v > base && v <= head &&
              Files.readString(p.resolve(BranchMarker)) == branch
            catch { case _: java.io.IOException => false }
          }
          ownedChain.zipWithIndex.foreach { case ((v, p), i) =>
            Files.writeString(p.resolve(PublishedMarker), "")
            // keep the branch provenance for t.history (the marker
            // itself must go: it means "not main history"); parent =
            // the previous version of the promoted chain (the fork
            // base for its first commit)
            Files.writeString(p.resolve(PromotedMarker), branch)
            Files.writeString(p.resolve(ParentMarker),
              (if (i == 0) base else ownedChain(i - 1)._1).toString)
            Files.deleteIfExists(p.resolve(BranchMarker))
          }
        }
        TableProps.write(this, name,
          props - ffPendingKey(branch) +
            (branchBaseKey(branch) -> head.toString))
        head
      }

    /** Drop `name` entirely: pointer (or legacy dir), every retained
      * version, staged/discard debris, pointer temps, and the `_metadata`
      * sidecar. Serialized against committers by the commit lock; a
      * committer racing the drop fails loudly on its next file operation
      * — the drop is the operator's explicit intent, not a conflict to
      * retry. The SQL `DROP TABLE` path of [[graft.sources.GraftCatalog]].
      * @return true when the table (or any version of it) existed
      */
    def drop(name: String): Boolean = {
      require(!name.contains("/"), s"drop is table-level; got '$name'")
      val existed = exists(name) || versions(name).nonEmpty
      withCommitLock(name) {
        val p = Paths.get(tablePath(name))
        if (io.isPointer(p)) io.deletePointerIfExists(p)
        else if (Files.exists(p, java.nio.file.LinkOption.NOFOLLOW_LINKS))
          deleteRecursively(p)
        versions(name).foreach { case (_, d) =>
          Files.deleteIfExists(stageMarkerPath(d))
          deleteRecursively(d)
        }
        // machinery siblings: `.vN.stage`/`.vN.discardM` leftovers of
        // crashed stages, `.ptrN` temps, MOR staging dirs — everything
        // the version walk above does not match
        val rootP = Paths.get(root)
        if (Files.isDirectory(rootP)) {
          val pat = java.util.regex.Pattern.compile(
            java.util.regex.Pattern.quote(name) +
              "\\.(v\\d+\\..+|ptr\\d+.*|morstage.*|streamepoch.*)")
          val s = Files.list(rootP)
          val debris =
            try s.iterator().asScala
              .filter(q => pat.matcher(q.getFileName.toString).matches())
              .toList
            finally s.close()
          debris.foreach(deleteRecursively)
        }
        TableProps.delete(this, name)
      }
      existed
    }
    /** Idempotent per-batch append: batch `id` lands in its own
      * subdirectory via an IN-PLACE overwrite, so an at-least-once replay
      * of the same micro-batch rewrites the same files instead of
      * duplicating rows (foreachBatch reruns a batch when a crash precedes
      * the checkpoint commit). Deliberately not versioned: the subdir is
      * append-granular, and replay idempotency is the invariant that
      * matters here.
      *
      * HIDDEN TIME PARTITIONING (the Iceberg `days(ts)` transform on plain
      * parquet): when the table declares [[Tables.TimePartitionProp]], the
      * batch lands as Hive-style `p_day=<date>/p_batch=<id>` partitions
      * via a DYNAMIC partition overwrite — replaying the same batch
      * rewrites exactly its own (day, batch) partitions, so the replay
      * contract is preserved while every time-bounded reader
      * ([[readTimePruned]], partitioned tombstone expiry) prunes whole
      * day directories instead of scanning every batch subdir. Hidden:
      * the partition columns are DERIVED (p_day = to_date(timeCol)) and
      * never surface in the reader-facing schema — plain recursive reads
      * ([[read]]) see the exact same columns as the flat layout.
      */
    def appendBatch(df: DataFrame, name: String, batchId: Long): Unit =
      timePartitionCol(name) match {
        case Some(tc) if df.columns.contains(tc) =>
          val reserved = Seq(PartDayCol, PartHourCol, PartMonthCol, PartBatchCol)
          require(!reserved.exists(df.columns.contains),
            s"columns ${reserved.mkString("/")} are reserved for the " +
              "hidden time-partition layout")
          val c = org.apache.spark.sql.functions.col(tc)
          val zone = timePartitionZone(name)
          val grain = timeGranularity(name)
          require(grain == "day" || zone.contains("UTC"),
            s"'$grain' granularity requires the UTC derivation zone " +
              "(declareTimePartition since the zone prop); legacy " +
              "session-zone layouts are day-grain only")
          // derivations are TYPE-aware so every supported time-column
          // type is zone-free on the write side (the read side's literal
          // conversions assume exactly these rules — advice finding)
          val tcType = df.schema(df.schema.fieldIndex(tc)).dataType
          if (zone.contains("UTC")) tcType match {
            case org.apache.spark.sql.types.TimestampType |
                 org.apache.spark.sql.types.DateType |
                 org.apache.spark.sql.types.TimestampNTZType |
                 org.apache.spark.sql.types.StringType => ()
            case other => throw new IllegalArgumentException(
              s"time partition column '$tc' of '$name' has type $other; " +
                "supported: TIMESTAMP, DATE, TIMESTAMP_NTZ, STRING " +
                "(zone-free day derivation is undefined otherwise)")
          }
          // layout per grain (all derivations UTC-exact for zone tables):
          //  day:   p_day=<date>/p_batch
          //  hour:  p_day=<date>/p_hour=<hours-since-epoch>/p_batch —
          //         Iceberg's hours() (monotone in ts, so pruning is a
          //         plain range conjunct); nested under p_day so day
          //         pruning composes and day->hour evolution shares the
          //         top-level structure
          //  month: p_month=<months-since-epoch>/p_batch — months()
          val partCols = grain match {
            case "day" => Seq(PartDayCol, PartBatchCol)
            case "hour" => Seq(PartDayCol, PartHourCol, PartBatchCol)
            case "month" => Seq(PartMonthCol, PartBatchCol)
          }
          var out = df
          if (partCols.contains(PartDayCol))
            out = out.withColumn(PartDayCol, dayOfTimeCol(c, tcType, zone))
          if (partCols.contains(PartHourCol))
            out = out.withColumn(PartHourCol, hourOfTimeCol(c, tcType))
          if (partCols.contains(PartMonthCol))
            out = out.withColumn(PartMonthCol, monthOfTimeCol(c, tcType, zone))
          // co-locate each (day[, hour], batch) partition's rows into ONE
          // task before the write: without this, every input task
          // holding rows of a partition writes its own file there — an
          // epoch spread over T tasks × P time partitions fans out to
          // T×P small files (the hour grain multiplies P 24-fold), which
          // at changelog scale is a file-count explosion the downstream
          // pruned readers pay on every listing. One shuffle of exactly
          // the epoch's rows buys one file per partition dir per epoch
          // (AQE coalesces the near-empty hash buckets).
          // EXPLICIT partition count: a column-only repartition is
          // AQE-coalescable, and a small epoch would collapse to ONE
          // task writing every partition file serially — the pinned
          // count keeps the write parallel while the hash still
          // co-locates each partition into exactly one task
          val colocated = out.withColumn(PartBatchCol,
              org.apache.spark.sql.functions.lit(batchId))
            .repartition(
              df.sparkSession.sessionState.conf.numShufflePartitions,
              partCols.map(org.apache.spark.sql.functions.col): _*)
          io match {
            case ObjectStoreIO =>
              partitionedOverwriteNoRename(colocated, name, partCols)
            case _ =>
              colocated.write.mode(SaveMode.Overwrite)
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(partCols: _*)
                .parquet(tablePath(name))
          }
          // replay across a day->hour flip: a PRE-flip batch replayed
          // now lands hour-grain above, but its day-era dirs (direct
          // p_batch=<id>) are different partition paths the dynamic
          // overwrite never touches — delete them AFTER the write so the
          // replay heals the spec instead of duplicating. Crash between
          // write and delete self-heals: the checkpoint was not
          // committed, so the batch replays and deletes again.
          if (grain == "hour") {
            val (dayEra, _) = classifyDayDirs(tablePath(name))
            dayEra.foreach { d =>
              val stale = d.resolve(s"$PartBatchCol=$batchId")
              if (Files.isDirectory(stale)) deleteRecursively(stale)
            }
          }
        case _ =>
          df.write.mode(SaveMode.Overwrite)
            .parquet(s"${tablePath(name)}/batch_$batchId")
      }

    /** OBJECT-STORE dynamic partition overwrite (no rename): Spark's
      * own dynamic mode publishes by per-partition RENAME, a primitive
      * the store does not have. Instead: stage the output under a
      * PRIVATE prefix (uncommitted objects, referenced by nothing),
      * then per staged partition DELETE the final prefix's prior
      * objects and CopyObject the staged files in. Used by the
      * streaming epoch commit (where the batch id in the path makes
      * every final prefix epoch-scoped and checkpoint replay heals a
      * crashed half-commit) and by the in-place time-partitioned
      * compaction (same per-partition replace the POSIX path does by
      * rename). A reader can see a partially-replaced partition for the
      * copy's duration — the same window the rename path already has
      * ACROSS partitions.
      *
      * Crash safety (advice finding, round 16): the old delete-dir-then-
      * copy order had a zero-copy window — a crash after the delete
      * destroyed the partition AND its staged replacement (the finally
      * swept staging, and removeOrphans would age-sweep it otherwise),
      * permanent loss for the compaction/expiry/mirror callers that have
      * no checkpoint replay. Replaced with a per-partition manifest
      * protocol that never leaves the partition empty: (1) PUT a
      * `_replacing` manifest listing the incoming file names, (2) copy
      * new files IN (old files untouched — staged part names carry task
      * UUIDs, collision-free), (3) delete old files, (4) delete the
      * manifest. Any later toucher ([[healReplacing]]) rolls a crashed
      * replace forward (all listed files present → finish deleting old)
      * or back (copy incomplete → delete the partial new files, keep
      * old). Both crash states are well-formed; staging can then be
      * swept unconditionally — it is never the only copy of anything.
      */
    private[graft] def partitionedOverwriteNoRename(out: DataFrame,
        name: String, partCols: Seq[String]): Unit = {
      val staging = Paths.get(s"${tablePath(name)}.epochstage_" +
        s"${System.nanoTime()}_${java.util.UUID.randomUUID().toString.take(8)}")
      try {
        out.write.mode(SaveMode.Overwrite)
          .partitionBy(partCols: _*).parquet(staging.toString)
        def partDirs(dir: Path, rel: String,
            acc: scala.collection.mutable.Map[String, Seq[Path]]): Unit = {
          val s = Files.list(dir)
          try s.iterator().asScala.foreach { p =>
            val fn = p.getFileName.toString
            // a `col=value` DIRECTORY is a partition even when the
            // column name starts with an underscore (the mirror's
            // `__bucket=K`) — only metadata files/dirs are skipped
            val isPartDir = Files.isDirectory(p) && fn.contains("=")
            if (!isPartDir && (fn.startsWith("_") || fn.startsWith("."))) ()
            else if (Files.isDirectory(p)) partDirs(p, s"$rel$fn/", acc)
            else acc(rel) = acc.getOrElse(rel, Seq.empty) :+ p
          } finally s.close()
        }
        val staged = scala.collection.mutable.Map[String, Seq[Path]]()
        partDirs(staging, "", staged)
        staged.foreach { case (rel, files) =>
          val finalDir = Paths.get(tablePath(name), rel)
          Files.createDirectories(finalDir)
          // a manifest already here is a CRASHED prior replace of this
          // partition — settle it before layering a new one on top
          healReplacing(finalDir)
          val newNames = files.map(_.getFileName.toString)
          Files.writeString(finalDir.resolve(ReplacingManifest),
            newNames.mkString("\n"))
          files.foreach(f =>
            io.linkOrCopy(f, finalDir.resolve(f.getFileName.toString)))
          val keep = newNames.toSet
          val s = Files.list(finalDir)
          val old = try s.iterator().asScala.filter { p =>
            val fn = p.getFileName.toString
            !keep(fn) && !fn.startsWith("_") && !fn.startsWith(".")
          }.toVector finally s.close()
          old.foreach(deleteRecursively)
          Files.deleteIfExists(finalDir.resolve(ReplacingManifest))
        }
      } finally deleteRecursively(staging)
    }

    /** Settle a crashed [[partitionedOverwriteNoRename]] of ONE partition
      * dir. No manifest → nothing to do. All manifest-listed files
      * present → the copy completed: roll FORWARD (the new files are
      * authoritative; finish deleting the old ones). Any listed file
      * missing → the copy crashed mid-way: roll BACK (delete the partial
      * new files; the untouched old files keep serving). Idempotent and
      * safe to call on any partition dir at any time.
      */
    private[graft] def healReplacing(dir: Path): Unit = {
      val mf = dir.resolve(ReplacingManifest)
      if (!Files.exists(mf)) return
      val listed = Files.readAllLines(mf).asScala.filter(_.nonEmpty).toSet
      val s = Files.list(dir)
      val entries = try s.iterator().asScala.map(_.getFileName.toString)
        .filter(fn => !fn.startsWith("_") && !fn.startsWith("."))
        .toSet finally s.close()
      if (listed.subsetOf(entries))
        (entries -- listed).foreach(fn => deleteRecursively(dir.resolve(fn)))
      else
        listed.intersect(entries)
          .foreach(fn => deleteRecursively(dir.resolve(fn)))
      Files.delete(mf)
    }

    /** Declare hidden time partitioning for an append-batch table: every
      * subsequent [[appendBatch]] lays out `p_day=to_date(timeCol)` day
      * partitions. Declare BEFORE the first append (the engine does not
      * rewrite existing flat batches — migration is a [[graft.plans.Maintenance.compact]]
      * concern). The self-describing-props pattern shared with cdc.* and
      * cluster.*: layout is table metadata, not caller configuration.
      */
    def declareTimePartition(name: String, timeCol: String,
        granularity: String = "day"): Unit = {
      require(timeCol.nonEmpty, "partition.time-column must be non-empty")
      require(TimeGranularities.contains(granularity),
        s"granularity must be one of ${TimeGranularities.mkString("/")}, " +
          s"got '$granularity'")
      TableProps.write(this, name,
        TableProps.read(this, name) +
          (TimePartitionProp -> timeCol) +
          (TimeGranularityProp -> granularity) +
          // day derivation is pinned to UTC (Iceberg defines days() in
          // UTC for exactly this reason): a writer and a reader with
          // different session timezones must derive the SAME day, or the
          // derived day conjunct can prune a directory that holds
          // matching rows (advice finding). Tables declared before the
          // prop existed keep the legacy session-zone derivation.
          (TimePartitionZoneProp -> "UTC"))
    }

    /** The declared time granularity (`day` when undeclared — every
      * pre-granularity table is a day layout).
      */
    def timeGranularity(name: String): String =
      TableProps.read(this, name).getOrElse(TimeGranularityProp, "day")

    /** Partition-SPEC EVOLUTION on the time dimension (Iceberg's
      * spec-versioned partitioning, the I13 pattern applied to time):
      * flip a changelog between day and hour grain WITHOUT
      * stop-the-world. Metadata-only — batches appended after the flip
      * lay out under the NEW grain; existing days keep serving under
      * their own recorded spec (the spec travels WITH the data: a day
      * dir's grain is discoverable from its own structure — `p_hour=`
      * children or direct `p_batch=` children — atomic with the dynamic
      * overwrite that wrote it). Time-pruned reads handle the mixed
      * tree exactly ([[readTimePruned]], both directions); the
      * background rewrite that migrates old days to the declared spec
      * is [[graft.plans.Maintenance.migrateTimeGranularity]], day-dir-
      * atomic and churn-proportional.
      *
      * Both directions are defined (round-19 verdict item 5):
      * day→hour SPLITS a day's batches under `p_hour=` (hot data,
      * finer pruning); hour→day MERGES the hour dirs back into the
      * day's `p_batch=` layout (cooling data — hour dirs of a quiet
      * table are listing overhead with no pruning payoff). Month
      * re-basing stays undefined.
      */
    def evolveTimeGranularity(name: String, target: String = "hour"): Unit = {
      require(timePartitionCol(name).isDefined,
        s"$name declares no time partitioning — nothing to evolve")
      val cur = timeGranularity(name)
      require((cur, target) match {
        case ("day", "hour") | ("hour", "day") => true
        case _ => false
      }, s"only day<->hour evolution is defined; $name is '$cur', " +
        s"asked for '$target'")
      require(timePartitionZone(name).contains("UTC"),
        s"$name is a legacy session-zone layout; grain evolution " +
          "requires the UTC derivation (declareTimePartition since the " +
          "zone prop)")
      TableProps.write(this, name,
        TableProps.read(this, name) + (TimeGranularityProp -> target))
    }

    /** The declared hidden-time-partition column, if any. */
    def timePartitionCol(name: String): Option[String] =
      TableProps.read(this, name).get(TimePartitionProp)

    /** The declared day-derivation zone: `Some("UTC")` for tables
      * declared since the zone prop exists, `None` for legacy tables
      * (session-zone derivation, the documented hazard when sessions
      * differ). Only UTC is ever declared — [[declareTimePartition]].
      */
    def timePartitionZone(name: String): Option[String] =
      TableProps.read(this, name).get(TimePartitionZoneProp)

    /** Time-bounded read of a time-partitioned append table: the time
      * predicate is REWRITTEN into a day-partition predicate (pruned by
      * Spark as real PartitionFilters — whole day dirs never open) plus
      * the exact residual on the declared column, and the hidden
      * partition columns are dropped so the result schema equals the flat
      * layout's. This is THE changelog access path the layout exists for:
      * at 100 TB a time-bounded replay (late-data audit, feed bootstrap,
      * tombstone-horizon work) reads days, not the table. Bounds are
      * inclusive. Rows with a NULL time column live in the Hive default
      * partition and are excluded by any bound — a time-bounded read of
      * un-timestamped rows is meaningless by construction.
      */
    def readTimePruned(spark: SparkSession, name: String,
        fromTs: Option[java.sql.Timestamp] = None,
        toTs: Option[java.sql.Timestamp] = None): DataFrame = {
      import org.apache.spark.sql.functions.{col, lit, to_date}
      val tc = timePartitionCol(name).getOrElse(throw new IllegalStateException(
        s"$name has no $TimePartitionProp declared — time-pruned reads " +
          "need the hidden-partition layout (declareTimePartition)"))
      // every partition bound must be derived in the SAME zone the
      // layout was written in — a session-zone derivation against a UTC
      // layout can prune a dir holding matching rows (advice finding)
      val zone = timePartitionZone(name)
      def dayBound(b: java.sql.Timestamp): org.apache.spark.sql.Column =
        zone match {
          case Some(z) => lit(b.toInstant.atZone(java.time.ZoneId.of(z))
            .toLocalDate)
          case None => to_date(lit(b)) // legacy: session-zone layout
        }
      val base = snapshotPath(name)
      def bounded(df0: DataFrame, withHour: Boolean,
          withMonth: Boolean): DataFrame = {
        var df = df0
        fromTs.foreach { f =>
          var p = col(tc) >= lit(f)
          if (df.columns.contains(PartDayCol)) p = p && col(PartDayCol) >= dayBound(f)
          if (withHour) p = p && col(PartHourCol) >= lit(hourIndexOf(f))
          if (withMonth) p = p && col(PartMonthCol) >= lit(monthIndexOf(f))
          df = df.filter(p)
        }
        toTs.foreach { t =>
          var p = col(tc) <= lit(t)
          if (df.columns.contains(PartDayCol)) p = p && col(PartDayCol) <= dayBound(t)
          if (withHour) p = p && col(PartHourCol) <= lit(hourIndexOf(t))
          if (withMonth) p = p && col(PartMonthCol) <= lit(monthIndexOf(t))
          df = df.filter(p)
        }
        df.drop(PartDayCol, PartHourCol, PartMonthCol, PartBatchCol)
      }
      timeGranularity(name) match {
        case "month" =>
          bounded(spark.read.option("basePath", base)
            .option("mergeSchema", "true").parquet(base),
            withHour = false, withMonth = true)
        case grain =>
          // the spec travels WITH the data: a day dir's grain is its own
          // structure. A PURE tree is one discovery-pruned scan; a MIXED
          // tree (mid-evolution — either direction, and a day can even
          // straddle both specs) splits per spec at the LEAF level: each
          // era scans a consistent partition schema, day dirs pre-pruned
          // by the same bounds DRIVER-SIDE (the listing is
          // planning-scale, and this IS partition pruning, done where
          // the split must happen)
          val (dayEra, hourEra) = classifyDayDirs(base)
          def inBounds(dayDir: Path): Boolean = {
            val day = dayDir.getFileName.toString.drop(PartDayCol.length + 1)
            if (day == "__HIVE_DEFAULT_PARTITION__") return false
            val d = java.time.LocalDate.parse(day)
            fromTs.forall(f => !d.isBefore(
              f.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate)) &&
              toTs.forall(t => !d.isAfter(
                t.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate))
          }
          def scan(leafs: Seq[Path], withHour: Boolean): Option[DataFrame] =
            if (leafs.isEmpty) None
            else Some(bounded(spark.read.option("basePath", base)
              .option("mergeSchema", "true")
              .parquet(leafs.map(_.toString): _*),
              withHour = withHour, withMonth = false))
          val pure = (grain == "hour" && dayEra.isEmpty) ||
            (grain == "day" && hourEra.isEmpty)
          if (pure)
            bounded(spark.read.option("basePath", base)
              .option("mergeSchema", "true").parquet(base),
              withHour = grain == "hour", withMonth = false)
          else {
            val dayLeafs = dayEra.filter(inBounds)
              .flatMap(childDirs(_, s"$PartBatchCol="))
            val hourLeafs = hourEra.filter(inBounds)
              .flatMap(childDirs(_, s"$PartHourCol="))
            (scan(hourLeafs, withHour = true),
              scan(dayLeafs, withHour = false)) match {
              // allowMissingColumns: additive schema evolution present in
              // only ONE era (mergeSchema is per-era) must union as NULLs,
              // not throw (advice finding)
              case (Some(h), Some(d)) =>
                h.unionByName(d, allowMissingColumns = true)
              case (Some(h), None) => h
              case (None, Some(d)) => d
              case (None, None) => // nothing in range: schema-stable empty
                val anyLeaf = dayEra.flatMap(childDirs(_, s"$PartBatchCol="))
                  .headOption
                  .getOrElse(hourEra.flatMap(childDirs(_, s"$PartHourCol="))
                    .head)
                bounded(spark.read.option("basePath", base)
                  .option("mergeSchema", "true").parquet(anyLeaf.toString),
                  withHour = false, withMonth = false).limit(0)
            }
          }
      }
    }

    /** Classify a (possibly mid-evolution) hour-grain table's day dirs
      * by the spec of their CHILDREN: a day dir with direct `p_batch=`
      * children carries day-era data, one with `p_hour=` children
      * carries hour-era data — a day STRADDLING the flip appears in
      * both lists. One planning-scale listing.
      */
    private[graft] def classifyDayDirs(base: String): (Seq[Path], Seq[Path]) = {
      val baseP = Paths.get(base)
      if (!Files.isDirectory(baseP)) return (Nil, Nil)
      val s = Files.list(baseP)
      val dayDirs =
        try s.iterator().asScala
          .filter(p => p.getFileName.toString.startsWith(s"$PartDayCol=") &&
            Files.isDirectory(p))
          .toList
        finally s.close()
      def childrenWith(d: Path, prefix: String): Boolean = {
        val cs = Files.list(d)
        try cs.iterator().asScala.exists(
          _.getFileName.toString.startsWith(prefix))
        finally cs.close()
      }
      (dayDirs.filter(childrenWith(_, s"$PartBatchCol=")),
        dayDirs.filter(childrenWith(_, s"$PartHourCol=")))
    }

    /** Direct children of `dir` named `<prefix>...` (one listing). */
    private[graft] def childDirs(dir: Path, prefix: String): Seq[Path] = {
      val s = Files.list(dir)
      try s.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith(prefix) &&
          Files.isDirectory(p)).toList
      finally s.close()
    }
  }

  /** True for failures caused by a pinned snapshot aging out mid-read
    * under a concurrent committer: the reader resolved version vN, a
    * rival committed twice before the lazy read materialized, and the
    * retention GC removed vN. For a MAINTENANCE caller this is exactly a
    * CAS conflict that surfaced during the read instead of the commit —
    * retryable by re-resolving the current snapshot (the callers' retry
    * loops). Pure readers keep the documented contract instead: snapshot
    * isolation holds for as long as the version is retained, then fails
    * loudly.
    *
    * PUBLIC because incremental consumers outside the engine need the
    * same classification: a feed reader racing compactions must treat
    * exactly these failures as "retry, then re-bootstrap from
    * `MorMirror.read` + `foldHorizon`" (the recovery the engine's own
    * consumer role implements) rather than dying or retrying every
    * unrelated error.
    */
  def isSnapshotRace(t: Throwable, underRoot: Option[String] = None): Boolean = {
    // when the caller knows its warehouse root, the missing path must lie
    // UNDER it — a FileNotFound on some unrelated path (missing table,
    // typo'd input dir) is a genuine misconfiguration that must fail
    // fast, not be retried/re-bootstrapped into masking the real error
    // (advice finding). Messages carry the absolute resolved path
    // (Spark resolves against the same cwd this normalizes against).
    val rootAbs = underRoot.map(r =>
      java.nio.file.Paths.get(r).toAbsolutePath.normalize.toString)
    def scoped(m: String): Boolean = rootAbs.forall(m.contains)
    val chain = Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
    chain.exists { e =>
      val m = Option(e.getMessage).getOrElse("")
      val cond = e match {
        case st: org.apache.spark.SparkThrowable => Option(st.getCondition)
        case _ => None
      }
      // narrow to the exact Spark error classes a vanished snapshot
      // raises, not free-text substrings of arbitrary errors
      val sparkRaceClass = cond.exists(c =>
        c.startsWith("PATH_NOT_FOUND") || c.startsWith("FAILED_READ_FILE"))
      // UNABLE_TO_INFER_SCHEMA (snapshot GC'd between listing and schema
      // inference) names only the FORMAT in its message, never a path —
      // path-scoping it would un-classify that race entirely (advice
      // finding). Kept unscoped, like the checkpoint-block case.
      val inferRace = cond.exists(_.startsWith("UNABLE_TO_INFER_SCHEMA"))
      // executor-side FileNotFounds arrive as a SparkException whose
      // MESSAGE embeds the remote stack trace (no typed cause) — the
      // substring stays, but path-scoped like everything else
      val fileGone = e.isInstanceOf[java.io.FileNotFoundException] ||
        e.isInstanceOf[java.nio.file.NoSuchFileException] ||
        m.contains("FileNotFoundException")
      ((sparkRaceClass || fileGone) && scoped(m)) || inferRace ||
        // a localCheckpoint whose source files were GC'd mid-materialize
        // fails block puts, then surfaces as a missing checkpoint block
        // (no path in the message — kept unscoped)
        m.contains("Checkpoint block")
    }
  }

  /** Marker stamped into a version directory at PUBLICATION (just before
    * its pointer swap): retention GC only deletes marked dirs, so a
    * rival's still-being-written stage — at any version number — is never
    * garbage-collected out from under it. `_`-prefixed: invisible to
    * parquet scans.
    */
  private[graft] val PublishedMarker = "_published"
  /** Branch-scoped publication marker (content = the owning branch's
    * name): a branch commit is durable and protected but NOT main
    * history — `_published` stays absent until fast_forward stamps it.
    */
  private[graft] val BranchMarker = "_published_branch"
  /** Lineage marker of a roll-forward rollback (content = the restored
    * source version): `t.history` reads it to surface the rollback
    * story, which the append-only log otherwise hides. Version-LOCAL —
    * excluded from every marker carry (a later commit is not a
    * rollback just because its parent was).
    */
  private[graft] val RollbackMarker = "_rolled_back_from"
  /** Lineage marker of a fast_forward promotion (content = the branch
    * name whose staged commit this version was): `t.history` reads it —
    * promotion otherwise erases the branch provenance with the
    * BranchMarker. Version-local like [[RollbackMarker]].
    */
  private[graft] val PromotedMarker = "_promoted_from"
  /** Identity marker of a cherrypick's apply commit (content = the
    * branch name): written inside the staged commit, so journal
    * settlement can decide EXACTLY whether a crashed cherrypick
    * published before the rebase. `t.history` reads it as provenance.
    * Version-local like [[RollbackMarker]].
    */
  private[graft] val CherrypickMarker = "_cherrypicked_from"
  /** Stored parent version of a published snapshot (content = the
    * version that was current when this one published): written at the
    * pointer-swap / promotion sites, read by `t.history` — a DERIVED
    * parent (previous retained by stamp order) mis-attributes across
    * expiry gaps; the stored one is exact. Version-local.
    */
  private[graft] val ParentMarker = "_parent_version"
  /** Warehouse-root record of the [[WarehouseIO]] substrate the
    * warehouse was first committed under — see Warehouse.verifySubstrate.
    */
  private[graft] val SubstrateMarker = "_warehouse_io"
  /** Per-partition replace manifest (content = the incoming file names,
    * one per line): present only while a
    * [[Warehouse.partitionedOverwriteNoRename]] of that partition is
    * in flight; a crashed replace is settled by
    * [[Warehouse.healReplacing]] (roll forward when the copy completed,
    * roll back otherwise) so the partition is never left empty or mixed.
    */
  private[graft] val ReplacingManifest = "_replacing"

  /** Root-level `_`-prefixed marker FILES (not dirs) of a snapshot,
    * excluding the write/commit machinery's own, read INTO MEMORY (they
    * are cursor-sized). These hold CROSS-COMMIT contracts — streaming
    * epoch positions (`_stream_epoch_*`), IVM batch ids, feed cursors —
    * so every committer that REWRITES the snapshot must carry them
    * forward: a SQL UPDATE/DELETE/MERGE/ALTER landing between a
    * streaming epoch's commit and its checkpoint write would otherwise
    * drop the epoch marker, and the crashed stream's replayed epoch
    * would double-append (advice finding). Capture BEFORE `commit` when
    * the table may be legacy (the commit migrates the real dir aside).
    */
  private[graft] def readRootMarkers(from: String): Seq[(String, Array[Byte])] = {
    val src = Paths.get(from)
    if (!Files.isDirectory(src)) return Seq.empty
    val s = Files.list(src)
    try s.iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .filter(_.getFileName.toString.startsWith("_"))
      .filterNot(p => Set("_SUCCESS", PublishedMarker, RollbackMarker, PromotedMarker,
        CherrypickMarker, ParentMarker)
        .contains(p.getFileName.toString))
      .map(p => (p.getFileName.toString, Files.readAllBytes(p)))
      .toSeq
    finally s.close()
  }

  /** Carry captured markers into a staged rewrite (see
    * [[readRootMarkers]]). Write AFTER the stage's parquet write — an
    * Overwrite-mode write recreates the directory.
    */
  private[graft] def writeRootMarkers(markers: Seq[(String, Array[Byte])],
      to: String): Unit =
    markers.foreach { case (name, bytes) =>
      Files.write(Paths.get(to).resolve(name), bytes)
    }

  /** Hidden time partitioning (the Iceberg `days(ts)` partition transform
    * expressed on plain parquet): the table prop naming the timestamp
    * column whose DATE derives the day partition of every appended batch.
    */
  val TimePartitionProp = "partition.time-column"
  /** Zone the day derivation is pinned to (written as `UTC` by
    * [[Warehouse.declareTimePartition]] — Iceberg's `days()` definition).
    * Absent on legacy tables: those keep session-zone derivation.
    */
  val TimePartitionZoneProp = "partition.time-zone"

  /** `p_day` derivation for one time column, TYPE-AWARE and zone-free
    * for every supported type when the table declares the UTC zone
    * (the legacy session-zone `to_date` serves pre-zone-prop tables):
    *
    *  - TIMESTAMP: exact UTC epoch-day arithmetic — `unix_micros` reads
    *    the stored instant directly; floor-division by a day of micros
    *    never consults any session zone. Integer-exact: the pmod
    *    subtraction makes the division exact for all instants,
    *    including pre-1970.
    *  - DATE: the value IS the day — identity, no cast. (The old
    *    `cast("timestamp")` route converted local midnight through the
    *    SESSION zone, so an eastern-zone writer landed the previous UTC
    *    day while the read side assumed UTC — silent mis-pruning;
    *    advice finding.)
    *  - TIMESTAMP_NTZ: the LOCAL date of the local datetime (Spark's
    *    NTZ→DATE cast is zone-free by definition) — exactly what
    *    [[HiddenDayBounds.derive]] computes for an NTZ literal.
    *  - STRING: parsed as a LOCAL datetime (`to_timestamp_ntz` — no
    *    session zone; a zone suffix in the text is NOT honored), then
    *    the NTZ rule. Unparseable values derive NULL and land in the
    *    default partition, same as before.
    *
    * Anything else refuses loudly at [[Warehouse.appendBatch]].
    */
  private[graft] def dayOfTimeCol(c: org.apache.spark.sql.Column,
      dt: org.apache.spark.sql.types.DataType,
      zone: Option[String]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    zone match {
      case Some(z) =>
        require(z == "UTC",
          s"only UTC day derivation is supported (Iceberg's days()); got $z")
        dt match {
          case TimestampType =>
            val us = unix_micros(c)
            val day = lit(86400000000L)
            date_from_unix_date(((us - pmod(us, day)) / day).cast("int"))
          case DateType => c
          case TimestampNTZType => c.cast(DateType)
          case StringType => to_timestamp_ntz(c).cast(DateType)
          case other => throw new IllegalArgumentException(
            s"time partitioning supports TIMESTAMP/DATE/TIMESTAMP_NTZ/" +
              s"STRING time columns; got $other")
        }
      case None => to_date(c)
    }
  }
  /** Derived day-partition directory column (`p_day=<date>`); hidden from
    * readers. NOT `_`-prefixed: Spark ignores underscore-prefixed paths.
    */
  val PartDayCol = "p_day"
  /** Batch-id partition directory column (`p_batch=<id>`) — the replay
    * idempotency unit of the partitioned layout; hidden from readers.
    */
  val PartBatchCol = "p_batch"
  /** Hour partition column for `hours(ts)` grain: HOURS SINCE EPOCH
    * (Iceberg's hours transform — monotone in ts, so time bounds prune
    * as plain range conjuncts), nested under `p_day`. Hidden.
    */
  val PartHourCol = "p_hour"
  /** Month partition column for `months(ts)` grain: MONTHS SINCE EPOCH
    * (Iceberg's months transform). Hidden.
    */
  val PartMonthCol = "p_month"
  /** Declared time granularity (`day` default / `hour` / `month`). */
  val TimeGranularityProp = "partition.time-granularity"
  /** The persistent queryId of THE registered streaming writer of a
    * time-partitioned table ([[GraftAppendBatchStreamingWrite]] stamps
    * it at its first commit). Epochs land as `p_batch=<epoch>` dirs with
    * no writer identity in the path, so two lineages would silently
    * dynamic-overwrite each other's epochs — the prop turns that silent
    * loss into a loud refusal. Hand over by clearing the prop
    * (`ALTER TABLE t UNSET TBLPROPERTIES ('stream.writer.query-id')`).
    */
  val StreamWriterProp = "stream.writer.query-id"
  /** Tag props: `tag.<name> = <version>` — named, GC-pinned snapshot
    * refs ([[Warehouse.createTag]]).
    */
  val TagPropPrefix = "tag."
  val BranchPropPrefix = "branch."
  private[sources] val TimeGranularities = Set("day", "hour", "month")

  /** `p_hour` derivation: hours since epoch, zone-free per type —
    * exact UTC floor-division of the instant's micros for TIMESTAMP;
    * `local_epoch_day * 24 + local_hour` for NTZ/STRING (equal to the
    * floor-division of the LOCAL micros, matching
    * [[HiddenDayBounds.deriveIndexed]]'s literal rule); `day * 24` for
    * DATE (local midnight).
    */
  private[graft] def hourOfTimeCol(c: org.apache.spark.sql.Column,
      dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val epoch = lit("1970-01-01").cast(DateType)
    def localIdx(ntz: org.apache.spark.sql.Column) =
      datediff(ntz.cast(DateType), epoch).cast("long") * 24 + hour(ntz)
    dt match {
      case TimestampType =>
        val us = unix_micros(c)
        val hr = lit(3600000000L)
        ((us - pmod(us, hr)) / hr).cast("long")
      case DateType => datediff(c, epoch).cast("long") * 24
      case TimestampNTZType => localIdx(c)
      case StringType => localIdx(to_timestamp_ntz(c))
      case other => throw new IllegalArgumentException(
        s"time partitioning supports TIMESTAMP/DATE/TIMESTAMP_NTZ/" +
          s"STRING time columns; got $other")
    }
  }

  /** `p_month` derivation: calendar months since epoch of the UTC day
    * (`months_between` on DATEs is zone-free and calendar-exact).
    */
  private[graft] def monthOfTimeCol(c: org.apache.spark.sql.Column,
      dt: org.apache.spark.sql.types.DataType,
      zone: Option[String]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    floor(months_between(dayOfTimeCol(c, dt, zone), lit("1970-01-01")))
      .cast("int")
  }

  /** Scala-side hour index of an instant (read-bound derivation). */
  private[graft] def hourIndexOf(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.toInstant.toEpochMilli, 3600000L)

  /** Scala-side month index of an instant's UTC day. */
  private[graft] def monthIndexOf(t: java.sql.Timestamp): Int = {
    val d = t.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate
    (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
  }

  /** Sibling `.stage` marker of a version dir: exists from stage
    * allocation until publication (or discard). Lives NEXT TO the dir,
    * not inside it, because the data write itself is a Spark Overwrite
    * that replaces the dir's contents. Its presence is the proof a
    * marker-aware writer owns the dir; its absence on an unmarked dir
    * at-or-below the current pointer proves pre-marker legacy history.
    */
  private[graft] def stageMarkerPath(versionDir: java.nio.file.Path): java.nio.file.Path =
    versionDir.resolveSibling(versionDir.getFileName.toString + ".stage")

  /** Commit-lock tuning: the guarded region is a validate + one atomic
    * rename, so a healthy holder releases in single-digit milliseconds;
    * 30 s of age means the holder is gone. The acquisition timeout is
    * deliberately much longer than the stale threshold so a waiter always
    * gets to break a crashed holder's lock before giving up.
    */
  private[sources] val CommitLockStaleMs = 30000L
  private val CommitLockTimeoutMs = 120000L

  /** Recursive delete that never follows symlinks (a version-pointer link
    * is deleted as a link, not traversed) — THE one copy shared by the
    * warehouse GC, the MOR delta GC, and the artifact cache.
    */
  private[graft] def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val s = Files.list(p)
      try s.iterator().asScala.foreach(deleteRecursively)
      finally s.close()
    }
    Files.deleteIfExists(p)
  }

  /** Durable table properties — the engine's analog of the reference's
    * Iceberg table-property commits (`tabular.py:66-75`: `etl.job-type`,
    * `cdc.type`, `cdc.ts-column`, `cdc.key-column`, `dependent-tables`).
    * Stored under the warehouse's `_metadata/` dir — OUTSIDE the table's
    * data directory, which data rewrites (overwrite commits) replace
    * wholesale; at scale the same keys live in the catalog's TBLPROPERTIES.
    */
  object TableProps {
    private def propsPath(wh: Warehouse, table: String): Path =
      Paths.get(wh.root, "_metadata", s"$table.json")

    def write(wh: Warehouse, table: String, props: Map[String, String]): Unit = {
      val p = propsPath(wh, table)
      Files.createDirectories(p.getParent)
      val json = props.toSeq.sorted
        .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
        .mkString("{", ", ", "}")
      // write-temp + atomic rename: a reader in another process must never
      // see a truncated/half-written props file (a torn read of the MOR
      // layout props would mis-parse the bucket modulus). Read-modify-
      // write races on the SAME key remain excluded by contract — each
      // prop key has a single writer (stream batch markers, changelog
      // cursor, layout props each belong to exactly one role).
      val tmp = p.resolveSibling(
        s".${p.getFileName}.tmp${ProcessHandle.current().pid()}")
      Files.writeString(tmp, json)
      Files.move(tmp, p,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      cache.remove(p) // next read re-validates against the new mtime/size
    }

    /** Mtime+size-validated read cache: one publish consults the props
      * sidecar many times (time-partition layout checks, cdc config,
      * MOR mode, clustering declaration — each call site reads
      * independently), and the scan path consults it per resolution.
      * The cache turns each repeat into one stat; a cross-process
      * writer's atomic replace changes mtime/size and invalidates. An
      * mtime-granularity collision (same millisecond, same byte count)
      * is the documented residual — props writes are rare,
      * human-driven DDL, not a data path.
      */
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[Path,
        (java.nio.file.attribute.FileTime, Long, Map[String, String])]()

    def read(wh: Warehouse, table: String): Map[String, String] = {
      val p = propsPath(wh, table)
      val attrs =
        try Files.readAttributes(p,
          classOf[java.nio.file.attribute.BasicFileAttributes])
        catch { case _: java.io.IOException =>
          cache.remove(p); return Map.empty
        }
      val cached = cache.get(p)
      if (cached != null && cached._1 == attrs.lastModifiedTime() &&
          cached._2 == attrs.size()) return cached._3
      val s = Files.readString(p)
      // flat string->string object; fields were written escaped
      val parsed = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
        .findAllMatchIn(s)
        .map(m => unesc(m.group(1)) -> unesc(m.group(2))).toMap
      cache.put(p, (attrs.lastModifiedTime(), attrs.size(), parsed))
      parsed
    }

    /** Remove the sidecar entirely (table drop). */
    def delete(wh: Warehouse, table: String): Unit = {
      cache.remove(propsPath(wh, table))
      Files.deleteIfExists(propsPath(wh, table))
    }

    private def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }
    private def unesc(s: String): String =
      s.replace("\\\"", "\"").replace("\\\\", "\\")
  }

  /** Save a DataFrame as a catalog table bucketed (hash-clustered) and
    * sorted by `key` — the layout that makes repeated joins/aggregations on
    * `key` shuffle-free: two tables bucketed the same way sort-merge join
    * with NO exchange on either side (asserted in BucketedJoinSpec). This is
    * the at-rest co-location strategy SCALE.md prescribes for the 100 TB
    * mirror and fact tables.
    */
  def saveBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Idempotent create (reference: tabular.py:91-99 probe + early return).
    * Returns true when the table was created by this call, false when it
    * already existed (no-op).
    */
  def bootstrapTable(
      spark: SparkSession,
      wh: Warehouse,
      name: String,
      sourceDir: String,
      excludeGlob: String,
      load: Boolean,
      transform: DataFrame => DataFrame = identity,
      format: String = "parquet"): Boolean = {
    if (wh.exists(name)) return false // tabular.py:93-99 — second run is a no-op
    val files = listFilesExcluding(sourceDir, Some(excludeGlob),
      extension = Some(format))
    readFilesAs(spark, format, files) match {
      case Some(df) if load => wh.overwrite(transform(df), name); true
      case Some(df) => // create empty table with the inferred schema only
        wh.overwrite(transform(df).limit(0), name); true
      case None => false // nothing to infer a schema from yet
    }
  }
}
