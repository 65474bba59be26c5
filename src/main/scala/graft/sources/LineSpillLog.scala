package graft.sources

import java.nio.charset.StandardCharsets

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

import scala.util.Try

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataOutputStream, FileContext, FileSystem, Options, Path}

/** Durable replay log for the dump1090 source's framed lines — the piece
  * that upgrades restart delivery from at-most-once to exactly-once
  * (reference analog: the WAL that lets the upstream product survive a
  * process restart with its database intact,
  * reference-reconstruction/dump1090-stream-parser.py P:52).
  *
  * Layout under one directory (per source, inside the query checkpoint):
  *
  *   00000000000000000042.log   lines for offsets [42, 42+count)
  *   committed                  highest source-committed offset (atomic
  *                              rename; files fully below it are deleted)
  *
  * Contract with the stream:
  *  - [[append]] runs BEFORE the lines become visible to `latestOffset`
  *    (same monitor), so any offset range a checkpoint can reference is
  *    already on disk — a crash between epoch planning and commit cannot
  *    lose the in-flight range.
  *  - [[commit]] persists the watermark FIRST, then deletes fully-covered
  *    files; a crash in between leaves stale files that recovery skips.
  *  - [[recover]] returns (trimOffset, lines) = the contiguous uncommitted
  *    suffix, which the stream preloads into its buffer; global line
  *    numbering therefore continues across restarts.
  *
  * Durability is to PROCESS failure: appends hflush() to the filesystem
  * (page cache locally, pipeline-pushed on HDFS) rather than fsync per
  * chunk — the upstream WAL makes the same trade at `synchronous=NORMAL`.
  * Uses the Hadoop FileSystem API throughout, so the same code serves a
  * local checkpoint and a cluster one (HDFS/S3A via the checkpoint URI).
  *
  * All methods are called under the stream's buffer lock — single-threaded
  * by construction.
  */
private[graft] class LineSpillLog(dirUri: String, rollEvery: Int = 8192) {

  private val dir = new Path(dirUri)
  private val conf = new Configuration()
  // A PRIVATE FileSystem handle: the checksum flags below must not leak
  // into the process-wide cached instance (FileSystem.get caches on
  // scheme/authority/ugi — flipping flags there would silently disable
  // checksums for every other writer in the JVM, Spark included).
  private val fs: FileSystem = FileSystem.newInstance(dir.toUri, conf)
  // torn-write tolerance comes from the line-termination scan in
  // readLines; sidecar checksums would instead turn a torn tail into an
  // unreadable file (ChecksumException) and sink the whole recovery
  fs.setWriteChecksum(false)
  fs.setVerifyChecksum(false)
  fs.mkdirs(dir)

  private val committedPath = new Path(dir, "committed")
  private val committedTmpPath = new Path(dir, "committed.tmp")

  // FileContext exposes the atomic overwrite-rename the commit path needs
  // (FileSystem.rename(src, dst) can't replace an existing target).
  private lazy val fc: FileContext = FileContext.getFileContext(dir.toUri, conf)

  // start offset -> line count, every closed or active .log file
  private val files = mutable.TreeMap.empty[Long, Long]

  private var out: FSDataOutputStream = _
  private var outStart = 0L
  private var outCount = 0L
  private var nextOffset = 0L

  private def logPath(start: Long): Path = new Path(dir, f"$start%020d.log")

  private def readWatermark(p: Path): Option[Long] =
    // a marker torn mid-write (empty / partial digits) reads as absent,
    // never as a crash-the-recovery NumberFormatException
    if (!fs.exists(p)) None
    else Try {
      val in = fs.open(p)
      try new String(in.readAllBytes(), StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    }.toOption

  /** Load the uncommitted suffix: (trimOffset, buffered lines). */
  def recover(): (Long, ArrayBuffer[String]) = {
    val logFiles = fs.listStatus(dir).toSeq
      .filter(_.getPath.getName.endsWith(".log"))
      .sortBy(_.getPath.getName)
    val committed: Long = readWatermark(committedPath)
      // crash inside commit()'s rename window: the tmp marker holds the
      // same (engine-committed) watermark — honor it rather than replaying
      // already-dropped ranges or, worse, treating surviving logs as a gap
      .orElse(readWatermark(committedTmpPath))
      // no marker survived at all: infer from the lowest surviving log
      // file — commit() only deletes files fully below the watermark, so
      // that start is ≤ the true watermark and replay is merely wider
      // (the transactional sink's claims dedupe it), never gap-deleted
      .orElse(logFiles.headOption.map(_.getPath.getName.stripSuffix(".log").toLong))
      .getOrElse(0L)
    val buf = ArrayBuffer.empty[String]
    var next = committed
    logFiles.foreach { st =>
      val start = st.getPath.getName.stripSuffix(".log").toLong
      if (start > next) {
        // a gap means files below were deleted ahead of the watermark
        // (should not happen — commit persists the watermark first); the
        // non-contiguous tail is unreferencable, drop it
        fs.delete(st.getPath, false)
      } else {
        val lines = readLines(st.getPath)
        val fresh = lines.drop((next - start).toInt)
        if (fresh.isEmpty && start + lines.length <= committed) {
          fs.delete(st.getPath, false) // fully-committed leftover
        } else {
          buf ++= fresh
          next = start + lines.length
          files(start) = lines.length.toLong
        }
      }
    }
    nextOffset = next
    (next - buf.length, buf)
  }

  /** Only newline-TERMINATED lines count: a crash can tear the final
    * write, and `BufferedReader.readLine` would surface that fragment as
    * a complete line — serving corrupt data on replay. A torn tail was
    * never offset-visible under the append-before-visible invariant
    * (visibility follows a successful full-batch flush), so dropping it
    * is correct, not lossy.
    */
  private def readLines(p: Path): ArrayBuffer[String] = {
    val in = fs.open(p)
    val bytes = try in.readAllBytes() finally in.close()
    val acc = ArrayBuffer.empty[String]
    var start = 0
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == '\n') {
        acc += new String(bytes, start, i - start, StandardCharsets.UTF_8)
        start = i + 1
      }
      i += 1
    }
    acc
  }

  /** Durably append a batch of framed lines (call before making them
    * offset-visible).
    */
  def append(batch: collection.Seq[String]): Unit = {
    if (batch.isEmpty) return
    if (out == null || outCount >= rollEvery) roll()
    try {
      batch.foreach { l =>
        out.write(l.getBytes(StandardCharsets.UTF_8)); out.write('\n')
      }
      out.hflush()
    } catch { case t: Throwable => salvage(); throw t }
    outCount += batch.length
    nextOffset += batch.length
    files(outStart) = outCount
  }

  /** A failed mid-batch write leaves the active file TORN: some fully
    * terminated-but-unaccounted lines plus possibly a partial fragment.
    * Writing on regardless would merge the fragment with the next record,
    * and a later recovery would count the unaccounted terminated lines —
    * shifting every replayed offset and serving corrupt data. Salvage:
    * retire the stream and rewrite the file to EXACTLY the accounted
    * prefix (atomic tmp + rename), so disk state equals the bookkeeping;
    * the next append rolls to a fresh file contiguous at [[nextOffset]].
    * Best-effort (Try): if the filesystem is down the rewrite fails too —
    * the caller's rethrown error fails the stream, and recovery's
    * terminated-line scan plus the offset-visibility invariant still hold
    * for the crash path.
    */
  private def salvage(): Unit = {
    Try(if (out != null) out.close())
    out = null
    val p = logPath(outStart)
    Try {
      val keep = readLines(p).take(outCount.toInt)
      val tmp = new Path(dir, p.getName + ".tmp") // not *.log: invisible to recover()
      val o = fs.create(tmp, true)
      try keep.foreach { l =>
        o.write(l.getBytes(StandardCharsets.UTF_8)); o.write('\n')
      } finally o.close()
      fc.rename(tmp, p, Options.Rename.OVERWRITE)
    }
  }

  private def roll(): Unit = {
    if (out != null) out.close()
    outStart = nextOffset
    outCount = 0L
    out = fs.create(logPath(outStart), true)
  }

  /** Epoch committed through `end`: persist the watermark, then drop every
    * file whose range sits fully below it.
    */
  def commit(end: Long): Unit = {
    val o = fs.create(committedTmpPath, true)
    try o.write(end.toString.getBytes(StandardCharsets.UTF_8)) finally o.close()
    // single atomic replace — no delete-then-rename window in which a
    // crash leaves NO watermark on disk (recover() additionally falls
    // back to the tmp marker if the platform rename itself tears)
    fc.rename(committedTmpPath, committedPath, Options.Rename.OVERWRITE)
    files.toSeq.takeWhile { case (start, n) => start + n <= end }.foreach {
      case (start, _) =>
        if (start == outStart && out != null) { out.close(); out = null }
        fs.delete(logPath(start), false)
        files.remove(start)
    }
  }

  def close(): Unit = {
    if (out != null) { out.close(); out = null }
    fs.close() // private newInstance handle — not the process-wide cache
  }
}
