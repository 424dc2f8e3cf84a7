package graft.streaming

import java.io.File
import java.nio.channels.FileChannel
import java.nio.file.{Files, StandardCopyOption, StandardOpenOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, TimestampType}

/** Shared scaffold for the streaming replay harnesses (q52/q64/q73 and
  * the q80-q89 state family): spool reuse + fresh per-run
  * sink/checkpoint dirs.
  *
  * A replay spool is a pure function of (corpus dir, generator config),
  * so rebuilding it on every run only re-measures the harness — a bench
  * rep pays the generator 5×. The spool lives under a dir keyed by the
  * corpus path and carries a marker recording the SOURCE parquet's
  * size+mtime fingerprint, the generator's config stamp, the spool
  * WRITER code version, and the built spool's own batch-file listing
  * (names + sizes + mtimes as a freshness witness — never an order
  * contract); a marker matching ALL of those skips the rebuild, while
  * a regenerated corpus under the same path (the r8 lesson), a changed
  * config, an older writer, or a disturbed spool (missing or extra
  * file) misses and rebuilds.
  *
  * Order-sensitive replays (q86-q89 running counters, q105/q110 running
  * sketches) arrive via [[ManifestReplaySource]] since round 13: batch i
  * of the stream IS the file group named `batch-i[-pJJ].jsonl`, served
  * at trigger i in lexicographic index order — a pure code contract
  * ([[writeManifestBatch]] writes it, the DSv2 stream serves it), with
  * no filesystem-mtime dependence left to defend (VERDICT r12 #1b; two
  * driver-red rounds against nine local greens localized the q87/q89
  * fault to the file source's mtime-derived order on the driver's
  * tmpdir). Since round 13 EVERY replay spool is
  * manifest-staged — the pinned-mtime parquet path is gone, there is
  * no mtime left to defend. Build-path defenses:
  *  - shared-cache builds run under a cross-JVM file lock, so a bench
  *    beside a verify can no longer interleave rmTree/write;
  *  - [[privateSpools]] (the DEFAULT; Bench opts out) bypasses the
  *    shared cache entirely: each process builds into a private dir,
  *    immune to any cache state another JVM may be mutating.
  *
  * Checkpoints and sinks are NEVER reused — [[freshRunDir]] sweeps old
  * run dirs and hands out a new one, so streaming state can never
  * resume stale (a resumed checkpoint would emit nothing; a stale sink
  * would double rows). */
object ReplayScaffold {

  /** Version of the spool WRITER code, folded into every [[spoolFor]]
    * stamp: a cached spool built by an older generator (different file
    * naming, different sharding) must miss and rebuild, never replay
    * in a different arrival order. Bump on any change to
    * [[writeManifestBatch]] or a caller's spool writer. */
  val SpoolFormatVersion: String = "spoolfmt-5" // 5: 4-part manifest batches

  /** When true (the DEFAULT since round 13 — VERDICT r12 #1a), [[spoolFor]]
    * never touches the shared tmpdir cache: every (kind, stamp) is built
    * into a process-private dir, once per JVM (reused within the process
    * — nothing else may mutate a live process's dir). Bench opts OUT at
    * its main (the only caller that benefits from the cross-JVM cache,
    * and the only one whose reps re-pay the generator otherwise); any
    * other entry point — the driver's harness included — gets the
    * cache-independent path without knowing the knob exists. Also
    * settable via `-Dgraft.spool.private=false`. */
  @volatile var privateSpools: Boolean =
    !sys.props.get("graft.spool.private").exists(_.equalsIgnoreCase("false"))

  /** Publish `df` into `dir` as staged MANIFEST batch `index` — up to
    * `parts` files named `batch-<index padded>-p<j>.jsonl`, one JSON
    * object per row, timestamps encoded as epoch-micros longs. Arrival
    * order for these spools is the lexicographic order of the batch
    * INDEX in the filename, served by [[ManifestReplaySource]] (all
    * `-p*` parts of one index arrive in one trigger); no mtime is
    * pinned or consulted (VERDICT r12 #1b: the order contract is code,
    * not filesystem metadata). Multiple parts exist so the executor
    * parse of a large staged batch is PARALLEL — one partition per
    * part, rows within a trigger are unordered by definition (the
    * stateful processors sort per key). An empty batch still stages
    * one (empty) file, so the trigger structure is preserved
    * regardless of data.
    *
    * Default 4 parts (VERDICT r15 #4): the replay family's wall on the
    * driver's slow-IO phase is dominated by per-file costs (open +
    * fsync + commit-log entry per staged file); at sf0.1 each batch is
    * small enough that 4 parse partitions still saturate, and halving
    * the file count halves that floor. At a real cluster scale the
    * caller passes parts ≈ executor parallelism. */
  def writeManifestBatch(dir: File, df: DataFrame, index: Int,
      parts: Int = 4): Unit = {
    val enc = df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case TimestampType => d.withColumn(f.name, unix_micros(col(f.name)))
        case _ => d
      }
    }
    dir.mkdirs()
    def partFiles() = Option(dir.listFiles())
      .getOrElse(Array.empty[File]).filter(_.getName.startsWith("part-"))
    val seen = partFiles().map(_.getName).toSet
    enc.toJSON.repartition(parts).write.mode("append").text(dir.toString)
    val fresh = partFiles().filterNot(f => seen(f.getName)).sortBy(_.getName)
    if (fresh.isEmpty) {
      // an all-empty write may commit no files at all — stage one empty
      // part so the trigger slot survives
      Files.createFile(new File(dir, f"batch-$index%05d-p00.jsonl").toPath)
    } else fresh.zipWithIndex.foreach { case (part, j) =>
      val target = new File(dir, f"batch-$index%05d-p$j%02d.jsonl")
      Files.move(part.toPath, target.toPath, StandardCopyOption.ATOMIC_MOVE)
      val crc = new File(dir, s".${part.getName}.crc")
      if (crc.exists()) {
        val crcTarget = new File(dir, s".${target.getName}.crc")
        try Files.move(crc.toPath, crcTarget.toPath, StandardCopyOption.ATOMIC_MOVE)
        catch { case _: Throwable => crc.delete() }
      }
    }
  }

  /** Split `ev` into
    * `cuts.length + 1` staged manifest batches on a timestamp column —
    * batch i = rows in `[cut(i-1), cut(i))` — named by index so
    * [[ManifestReplaySource]] serves them in time order by construction. */
  def writeTimeSplitManifest(spool: File, ev: DataFrame, tsCol: String,
      cuts: Seq[String]): Unit = {
    val cutCols = cuts.map(c => expr(s"TIMESTAMP '$c'"))
    val preds = (0 to cuts.length).map { i =>
      val lo = if (i == 0) lit(true) else col(tsCol) >= cutCols(i - 1)
      val hi = if (i == cuts.length) lit(true) else col(tsCol) < cutCols(i)
      lo && hi
    }
    preds.zipWithIndex.foreach { case (p, i) =>
      writeManifestBatch(spool, ev.filter(p), i)
    }
  }

  /** Open `spool` as a manifest-ordered replay stream: one staged batch
    * per trigger, in filename order, via [[ManifestReplaySource]]. */
  def manifestStream(spark: SparkSession, spool: File, schema: StructType): DataFrame =
    spark.readStream.format(classOf[ManifestReplaySource].getName)
      .schema(schema).option("path", spool.toString).load()

  /** The shared time-split instants for the cross-batch state replays
    * (q86/q88/q89) — one source of truth so tuning batch sizes cannot
    * silently desync the three spools from their specs' straddle checks. */
  val DefaultCuts: Seq[String] =
    Seq("2024-01-08 00:00:00", "2024-01-16 00:00:00", "2024-01-23 00:00:00")

  /** Refcounted per-session pin of `spark.sql.shuffle.partitions`
    * (VERDICT r13 #4): the old bare set/restore raced when two replays
    * overlapped in one session — whichever restored LAST could leave
    * the session at the pinned value (or at a mid-flight "previous"
    * that was itself a pin). Now the first acquirer records the true
    * previous value and sets the pin; same-value acquirers stack; the
    * last release restores. A concurrent request for a DIFFERENT value
    * blocks until the current pin fully releases — correctness over
    * throughput for a knob whose callers all use the same default. */
  private object ShufflePin {
    private final class Pin(val prev: String, val value: Int, var refs: Int)
    private val pins = scala.collection.mutable.Map.empty[SparkSession, Pin]

    def acquire(spark: SparkSession, value: Int): Unit = synchronized {
      while (pins.get(spark).exists(_.value != value)) wait()
      pins.get(spark) match {
        case Some(p) => p.refs += 1
        case None =>
          val prev = spark.conf.get("spark.sql.shuffle.partitions")
          spark.conf.set("spark.sql.shuffle.partitions", value.toString)
          pins(spark) = new Pin(prev, value, 1)
      }
    }

    def release(spark: SparkSession): Unit = synchronized {
      val p = pins(spark)
      p.refs -= 1
      if (p.refs == 0) {
        spark.conf.set("spark.sql.shuffle.partitions", p.prev)
        pins.remove(spark)
        notifyAll()
      }
    }
  }

  /** The shared sink contract: append `streaming` to a parquet sink
    * under `runDir`, drain it (`processAllAvailable`), stop, and hand
    * back the materialized result for the caller to filter/order.
    *
    * State partitioning: every trigger commits ONE state-store instance
    * per shuffle partition, so a 5-trigger replay over 32 partitions
    * pays ~160 RocksDB commits (open, changelog upload, metadata fsync)
    * for kilobytes of state — the scaffold tax VERDICT r11 #6 measured
    * at ~33 s of the suite. The replay pins `statePartitions` (8) for
    * the stream's lifetime instead; per-key processing and output are
    * IDENTICAL (hash partitioning by key either way), only the commit
    * fan-out shrinks. The pin is refcounted per session ([[ShufflePin]])
    * so concurrent replays can overlap without racing the restore. At
    * production scale this knob goes the other way — state partitions
    * should match cluster parallelism, which a fresh checkpoint picks
    * up from the session automatically. */
  def runToParquet(streaming: DataFrame, runDir: File,
      statePartitions: Int = 8): DataFrame = {
    val spark = streaming.sparkSession
    val outDir = new File(runDir, "out")
    ShufflePin.acquire(spark, statePartitions)
    try {
      val q = streaming.writeStream.format("parquet")
        .option("path", outDir.toString)
        .outputMode("append")
        .option("checkpointLocation", new File(runDir, "ckpt").toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    } finally ShufflePin.release(spark)
    spark.read.parquet(outDir.toString)
  }

  def rmTree(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete()
  }

  /** Recursive listing of the spool's staged-batch files — relative
    * path, size and (pinned) mtime — the arrival-order contract in one
    * string. Recorded in the marker at build time and re-checked on
    * every reuse, so a disturbed spool (lost pin, deleted file, stray
    * extra batch) rebuilds instead of replaying in the wrong order. */
  private def batchListing(spool: File): String = {
    def walk(f: File, prefix: String): Seq[String] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq
          .flatMap(c => walk(c, s"$prefix${f.getName}/"))
      else if (f.getName.startsWith("batch-"))
        Seq(s"$prefix${f.getName}=${f.length()}:${f.lastModified()}")
      else Seq.empty
    Option(spool.listFiles()).getOrElse(Array.empty).toSeq
      .flatMap(c => walk(c, "")).sorted.mkString(",")
  }

  /** Post-build invariant: expected staged-batch count, when the
    * caller declares one. Manifest batches are name-ordered — mtimes
    * carry no order, so there is nothing else to defend. */
  private def assertSpool(spool: File, expectedFiles: Int): Unit = {
    def dirs(f: File): Seq[File] =
      if (!f.isDirectory) Seq.empty
      else f +: Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(dirs)
    val batchFiles = dirs(spool).flatMap(d =>
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.startsWith("batch-")))
    // a staged BATCH is one jsonl part-GROUP (all -pNN shards of one
    // index arrive in one trigger)
    val batchCount = batchFiles.flatMap(f => f.getName match {
        case ManifestReplaySource.BatchFile(idx) => Some((f.getParentFile, idx))
        case _ => None
      }).distinct.length
    if (expectedFiles >= 0)
      require(batchCount == expectedFiles,
        s"spool $spool has $batchCount staged batches, expected $expectedFiles")
  }

  // serializes same-JVM builders (sbt runs suites in parallel; FileLock
  // throws OverlappingFileLockException on same-JVM re-entry)
  private val buildLock = new Object

  /** Retention for shared spool caches: a `graft-*` base whose marker
    * has not been read (reuse touches it) or rewritten (build) for this
    * many days is abandoned — its kind was renamed/removed, or the
    * machine stopped running that suite — and is swept so the shared
    * tmpdir stays bounded across a multi-round soak (VERDICT r12 #7). */
  val SharedCacheMaxAgeDays: Int = 7

  // once per JVM: the sweep is a hygiene pass, not a per-call cost
  private lazy val staleSweepDone = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Sweep shared `graft-*` cache bases (and their `.lock` twins) whose
    * marker is older than [[SharedCacheMaxAgeDays]]. Conservative: only
    * dirs WITH an aged marker are touched — a dir mid-build has no (or
    * a fresh) marker and is left alone; live users re-touch the marker
    * on every reuse, so "aged" means genuinely unused. */
  private def sweepStaleSharedCaches(tmp: File): Unit = {
    if (!staleSweepDone.compareAndSet(false, true)) return
    val cutoff = System.currentTimeMillis() - SharedCacheMaxAgeDays * 24L * 3600 * 1000
    Option(tmp.listFiles()).getOrElse(Array.empty).foreach { f =>
      val n = f.getName
      if (f.isDirectory && n.startsWith("graft-") && !n.matches(".*-p\\d+$")) {
        val marker = new File(f, "spool.ok")
        if (marker.exists() && marker.lastModified() < cutoff) {
          System.err.println(s"[replay-audit] sweeping stale shared spool cache $f " +
            s"(marker age ${(System.currentTimeMillis() - marker.lastModified()) / 86400000L} days)")
          rmTree(f)
          val lock = new File(tmp, s"$n.lock")
          if (lock.exists()) lock.delete()
        }
      } else if (f.isFile && n.startsWith("graft-") && n.endsWith(".lock") &&
          f.lastModified() < cutoff && !new File(tmp, n.stripSuffix(".lock")).exists()) {
        f.delete() // orphaned lock of an already-swept base
      }
    }
  }

  // private-path build memo: (kind, key) -> stamp of the spool already
  // built by THIS process. A live process's private dir is immutable to
  // everyone else (the sweep only removes dead owners' dirs), so a
  // same-stamp re-request within the JVM can reuse instead of rebuild —
  // without this, privateSpools-by-default would re-pay every generator
  // on every call (e.g. the q88 gap sweep, or a spec calling run() twice)
  private val privateBuilt = scala.collection.mutable.Map.empty[(String, String), String]

  /** Build-or-reuse the spool for `kind` over `dir`, fingerprinting
    * `dir/sourceFile` and `extraStamp` (generator knobs that change the
    * spool content — e.g. q52's connection count). `expectedFiles`, when
    * ≥0, pins the staged-batch count the writer must produce.
    *
    * Shared-cache path: the build runs under a cross-JVM `FileLock`, and
    * the marker records the built spool's own batch listing, re-verified
    * on every reuse. Private path ([[privateSpools]]): unconditional
    * rebuild into a per-process dir; stale private dirs of dead
    * processes are swept. */
  def spoolFor(spark: SparkSession, dir: String, kind: String,
      sourceFile: String, extraStamp: String,
      write: (SparkSession, String, File) => Unit,
      expectedFiles: Int = -1): File = {
    // names are part of the fingerprint: two part files swapping contents
    // at equal sizes within one mtime tick must still miss the marker
    def fingerprint(f: File): String =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).map(fingerprint).sorted.mkString(",")
      else s"${f.getName}=${f.length()}:${f.lastModified()}"
    val src = new File(dir, sourceFile)
    val stamp = s"$SpoolFormatVersion\n$dir\n${fingerprint(src)}\n$extraStamp"
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(6).map(b => f"${b & 0xff}%02x").mkString
    val tmp = new File(sys.props("java.io.tmpdir"))

    if (privateSpools) {
      val pid = ProcessHandle.current().pid()
      val prefix = s"graft-$kind-$key-p"
      val base = new File(tmp, s"$prefix$pid")
      val spool = new File(base, "spool")
      buildLock.synchronized {
        val memoKey = (kind, key)
        if (privateBuilt.get(memoKey).contains(stamp) && spool.isDirectory) {
          assertSpool(spool, expectedFiles)
          return spool
        }
        // sweep private dirs owned by this or dead processes (bounded tmp)
        Option(tmp.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.startsWith(prefix))
          .filter { f =>
            val p = f.getName.stripPrefix(prefix)
            p.nonEmpty && p.forall(_.isDigit) && {
              val owner = p.toLong
              owner == pid ||
                !ProcessHandle.of(owner).map[Boolean](_.isAlive).orElse(false)
            }
          }.foreach(rmTree)
        spool.mkdirs()
        write(spark, dir, spool)
        assertSpool(spool, expectedFiles)
        privateBuilt(memoKey) = stamp
      }
      return spool
    }

    sweepStaleSharedCaches(tmp)
    val base = new File(tmp, s"graft-$kind-$key")
    val spool = new File(base, "spool")
    val marker = new File(base, "spool.ok")
    def markerContent = stamp + "\n#spool#\n" + batchListing(spool)
    def fresh = marker.exists() &&
      Files.readString(marker.toPath) == markerContent
    // touch the marker on every reuse so the retention sweep's "last
    // used" signal is real: a cache a long-lived bench keeps hitting
    // never ages out (content equality, not mtime, decides freshness)
    if (fresh) marker.setLastModified(System.currentTimeMillis())
    if (!fresh) buildLock.synchronized {
      val lockFile = new File(tmp, s"graft-$kind-$key.lock")
      val ch = FileChannel.open(lockFile.toPath,
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try {
        val lk = ch.lock()
        try {
          if (!fresh) { // re-check under the lock: a racing JVM may have built
            rmTree(base); spool.mkdirs()
            write(spark, dir, spool)
            assertSpool(spool, expectedFiles)
            Files.writeString(marker.toPath, markerContent)
          }
        } finally lk.release()
      } finally ch.close()
    }
    assertSpool(spool, expectedFiles)
    spool
  }

  /** Fresh per-run sink+checkpoint dir next to the (reused) spool;
    * previous run dirs are swept first so tmp usage stays bounded.
    *
    * Dirs are OWNED by the creating process (`run-<pid>-<nano>`) and the
    * sweep only removes dirs whose owner is this process or is dead —
    * two JVMs replaying the same corpus concurrently (a bench beside a
    * test run) can no longer delete each other's live checkpoint/sink
    * mid-stream. Legacy unowned `run-<nano>` dirs are swept
    * unconditionally (pre-ownership leftovers, by definition not live).
    *
    * Within ONE process, the newest own-pid dir is kept: two SAME-KIND
    * replays overlapping in one JVM (ConcurrentReplaySpec) would
    * otherwise each sweep the other's live checkpoint mid-stream —
    * the second call now spares the first call's (newest) dir and only
    * reclaims everything older, which a sequential caller has already
    * consumed. Three-deep same-kind concurrency would still collide;
    * the replay harnesses are at most pairwise-concurrent by
    * construction (one bench, one verify). */
  def freshRunDir(spool: File): File = {
    val base = spool.getParentFile
    val pid = ProcessHandle.current().pid()
    def owner(name: String): Option[Long] = name.split("-") match {
      case Array(_, p, _) if p.nonEmpty && p.forall(_.isDigit) => Some(p.toLong)
      case _ => None // legacy unowned dir
    }
    def ownerGone(name: String): Boolean = owner(name) match {
      case Some(o) => o == pid ||
        !ProcessHandle.of(o).map[Boolean](_.isAlive).orElse(false)
      case None => true
    }
    val sweepable = Option(base.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("run-") && ownerGone(f.getName))
    val newestOwn = sweepable.filter(f => owner(f.getName).contains(pid))
      .sortBy(_.getName.split("-").last.toLong).lastOption
    sweepable.filterNot(f => newestOwn.exists(_.getAbsolutePath == f.getAbsolutePath))
      .foreach(rmTree)
    val d = new File(base, s"run-$pid-${System.nanoTime()}")
    d.mkdirs(); d
  }
}
