package graft

import java.nio.file.{Files, Path => JPath, Paths}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import graft.operators.{IndexMaintenance, LayoutLog}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** READER-vs-SWAP isolation (round-16): the staged in-place swap
  * ([[IndexMaintenance.fencedSwap]]) replaced delete-then-rename with
  * retire-then-install so its contract for a racing reader is
  * SNAPSHOT-OR-FAIL — a probe concurrent with the swap observes the
  * old generation, the new generation, or a loud path-does-not-exist
  * error in the instant between the two renames; NEVER an empty dir, a
  * mixed-generation file set, or an installed generation whose commit
  * log has not landed yet (the log is carried into the staging dir
  * before the rename, so one rename installs data + history
  * atomically).
  *
  * Two probes hammer the window while swaps run in a tight loop:
  *  - a structural FS probe (thousands of samples/sec — fast enough to
  *    actually land inside the rename window) checks generation-marker
  *    uniqueness, data-implies-log, and version monotonicity;
  *  - a Spark read probe checks result parity: every successful read
  *    returns exactly the live id set.
  *
  * A third test races a lifecycle WRITER against the swap loop and
  * asserts the conflict surface is loud-and-recoverable on both sides
  * (fence/rollback CME on the maintainer, vacuum-horizon /
  * missing-dir CME on the racer), with the layout readable and
  * version-consistent after the dust settles.
  */
class SwapIsolationSpec extends SparkSpec {
  import spark.implicits._

  private object M extends IndexMaintenance

  private def freshDir(): String =
    Files.createTempDirectory("graft_swapiso_").toString + "/idx"

  private def buildLayout(dir: String, n: Int): Unit =
    M.writeClustered(
      (0 until n).map(i => (i.toLong, i % 4)).toDF("id", "cluster"),
      dir, "overwrite")

  /** Copy the layout's data files (not `_log`, not markers) into a
    * fresh staging dir — a content-identical next generation staged in
    * milliseconds so the race loop can run hundreds of swaps.
    */
  private def stageCopy(dir: String, staging: String, gen: Int): Unit = {
    val src = Paths.get(dir)
    val dst = Paths.get(staging)
    // never WALK into _log: a concurrent committer's _tmp files appear
    // and vanish there, and Files.walk throws on a mid-walk vanish —
    // enumerate the stable top-level entries and walk only those
    val top = Files.list(src)
    val roots =
      try top.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        n != "_log" && !n.startsWith("_gen-")
      }.toVector
      finally top.close()
    roots.flatMap { r =>
      val walk = Files.walk(r)
      try walk.iterator().asScala.toVector finally walk.close()
    }.foreach { p =>
      val rel = src.relativize(p).toString
      if (rel.nonEmpty && !rel.endsWith(".crc")) {
        // per-generation data-file names: a reader planned against one
        // generation must FAIL on the next, never silently read its
        // same-named twin (parquet task files are UUID-named in real
        // layouts — the copy must not weaken that property)
        val renamed = rel.replaceAll("-g\\d+\\.parquet$", ".parquet")
          .replace(".parquet", s"-g$gen.parquet")
        val to = dst.resolve(renamed)
        if (Files.isDirectory(p)) Files.createDirectories(to)
        else { Files.createDirectories(to.getParent); Files.copy(p, to) }
      }
    }
  }

  private def writeMarker(dir: String, gen: Int): Unit =
    Files.write(Paths.get(dir, s"_gen-$gen"), Array.emptyByteArray)

  /** One structural sample of the layout dir. Returns None when the dir
    * is absent or vanished mid-walk (the allowed between-renames
    * instant); otherwise (markers, hasData, maxLogVersion).
    */
  private def structuralSample(dir: String): Option[(Seq[String], Boolean, Long)] = {
    val p = Paths.get(dir)
    try {
      if (!Files.exists(p)) return None
      val walk = Files.walk(p)
      val names =
        try walk.iterator().asScala.map(q => p.relativize(q).toString).toVector
        finally walk.close()
      val markers = names.filter(n => n.startsWith("_gen-"))
      val hasData = names.exists(_.endsWith(".parquet"))
      val logVersions = names.collect {
        case n if n.startsWith("_log/v") && n.endsWith(".commit") =>
          n.stripPrefix("_log/v").stripSuffix(".commit").toLong
      }
      Some((markers, hasData, if (logVersions.isEmpty) 0L else logVersions.max))
    } catch {
      case _: java.nio.file.NoSuchFileException => None
      case e: java.io.UncheckedIOException
          if e.getCause.isInstanceOf[java.nio.file.NoSuchFileException] => None
    }
  }

  /** The tolerated TRANSIENT class is the production classifier itself
    * ([[graft.operators.LayoutCache.isSwapTransient]]): path absent in
    * the between-renames instant, a listed partition dir vanishing
    * mid-scan, an empty root resolved across the retire, or
    * execution-time file loss against a pre-swap listing — loud,
    * retriable, never torn. Keeping the spec on the SAME predicate the
    * serving retry uses means a new failure shape fails BOTH the spec
    * and production, instead of being quietly absorbed by one of them.
    */
  private def isMissingPathFailure(e: Throwable): Boolean =
    graft.operators.LayoutCache.isSwapTransient(e)

  test("structural probe racing 300 swaps: never mixed generations, never data without log, versions monotone") {
    val dir = freshDir()
    buildLayout(dir, 100)   // v1 build
    writeMarker(dir, 0)
    val violations = new ConcurrentLinkedQueue[String]()
    val absents = new AtomicInteger(0)
    val samples = new AtomicInteger(0)
    @volatile var stop = false
    val prober = new Thread(() => {
      var lastVersion = 0L
      while (!stop) {
        structuralSample(dir) match {
          case None => absents.incrementAndGet(): Unit
          case Some((markers, hasData, logV)) =>
            samples.incrementAndGet()
            if (markers.size > 1)
              violations.add(s"mixed generations visible: $markers")
            if (hasData && logV == 0L)
              violations.add("data files visible with no commit log — install was not atomic")
            if (logV != 0L && logV < lastVersion)
              violations.add(s"version went backwards: $lastVersion -> $logV")
            if (logV != 0L) lastVersion = logV
        }
      }
    })
    prober.start()
    try {
      var observed = 1L
      (1 to 300).foreach { gen =>
        val staging = dir + s"-stage$gen"
        stageCopy(dir, staging, gen)
        writeMarker(staging, gen)
        M.fencedSwap(spark, "SwapIsolationSpec", dir, staging, observed, "compact")
        LayoutLog.vacuum(spark, dir): Unit // keep the carried history bounded across 300 folds
        observed += 1
      }
    } finally { stop = true; prober.join() }
    assert(violations.isEmpty, s"isolation violations: ${violations.asScala.take(5).mkString("; ")}")
    assert(samples.get() > 1000, s"probe must actually sample under load (got ${samples.get()})")
    assert(LayoutLog.version(spark, dir) == 301L)
    assert(LayoutLog.history(spark, dir).last.verb == "compact")
  }

  test("Spark read probe racing swaps: every successful read returns exactly the live rows") {
    val dir = freshDir()
    buildLayout(dir, 100)
    val expected = (0L until 100L).toSet
    val wrongs = new ConcurrentLinkedQueue[String]()
    val successes = new AtomicInteger(0)
    val misses = new AtomicInteger(0)
    @volatile var stop = false
    val prober = new Thread(() => {
      while (!stop) {
        try {
          val got = spark.read.parquet(dir).select("id").collect().map(_.getLong(0)).toSet
          if (got == expected) successes.incrementAndGet(): Unit
          else wrongs.add(s"read returned ${got.size} ids (missing ${(expected -- got).take(3)}...)")
        } catch {
          case e: Throwable if isMissingPathFailure(e) => misses.incrementAndGet(): Unit
          case e: Throwable => wrongs.add(s"unexpected probe failure (not missing-path): $e")
        }
      }
    })
    prober.start()
    try {
      var observed = 1L
      (1 to 60).foreach { gen =>
        val staging = dir + s"-stage$gen"
        stageCopy(dir, staging, gen)
        M.fencedSwap(spark, "SwapIsolationSpec", dir, staging, observed, "compact")
        LayoutLog.vacuum(spark, dir): Unit
        observed += 1
        // give the reader room to complete whole reads between swaps —
        // the parity claim needs successes, not only loud misses
        Thread.sleep(100)
      }
    } finally { stop = true; prober.join() }
    assert(wrongs.isEmpty,
      s"a racing reader saw a half-swapped layout: ${wrongs.asScala.take(3).mkString("; ")}")
    assert(successes.get() > 0, "the probe must complete some reads under load")
  }

  test("serving probe through LayoutCache.probeRetry: zero surfaced failures under racing swaps") {
    // the raw-reader test above pins the DICHOTOMY (success = exactly
    // one complete generation, failure = the loud transient class);
    // this one pins the serving contract built on it — the bounded
    // retry absorbs the transient class entirely, so a probe layer
    // never sees the swap window at all
    val dir = freshDir()
    buildLayout(dir, 100)
    val expected = (0L until 100L).toSet
    val wrongs = new ConcurrentLinkedQueue[String]()
    val successes = new AtomicInteger(0)
    @volatile var stop = false
    val prober = new Thread(() => {
      while (!stop) {
        try {
          val got = graft.operators.LayoutCache.probeRetry(dir) {
            graft.operators.LayoutCache.readCached(spark, dir)
              .select("id").collect().map(_.getLong(0)).toSet
          }
          if (got == expected) successes.incrementAndGet(): Unit
          else wrongs.add(s"read returned ${got.size} ids")
        } catch {
          case e: Throwable => wrongs.add(s"probeRetry surfaced a failure: $e")
        }
      }
    })
    prober.start()
    try {
      var observed = 1L
      (1 to 60).foreach { gen =>
        val staging = dir + s"-stage$gen"
        stageCopy(dir, staging, gen)
        M.fencedSwap(spark, "SwapIsolationSpec", dir, staging, observed, "compact")
        LayoutLog.vacuum(spark, dir): Unit
        observed += 1
        Thread.sleep(50)
      }
    } finally { stop = true; prober.join() }
    assert(wrongs.isEmpty,
      s"serving probe leaked the swap window: ${wrongs.asScala.take(3).mkString("; ")}")
    assert(successes.get() > 0, "the serving probe must complete reads under load")
  }

  test("a lifecycle writer racing the swap loop: conflicts are loud on both sides and the layout survives") {
    val dir = freshDir()
    buildLayout(dir, 100)
    val racerConflicts = new AtomicInteger(0)
    val racerCommits = new AtomicInteger(0)
    val racerUnexpected = new ConcurrentLinkedQueue[String]()
    @volatile var stop = false
    // pause/parked handshake: when the contention phase ends without a
    // landed swap (a saturating writer CAN legitimately starve the
    // fence — the protocol's documented answer is "serialize writers
    // upstream"), the main thread parks the racer and lands ONE
    // uncontended swap, turning the liveness meta-check from a tuned-
    // sleep coin flip into a handshake-guaranteed property. The
    // contention-phase safety assertions are unaffected either way.
    @volatile var pause = false
    val racerParked = new java.util.concurrent.atomic.AtomicBoolean(false)
    val racer = new Thread(() => {
      while (!stop) {
        if (pause) {
          racerParked.set(true)
          Thread.sleep(5)
        } else {
        racerParked.set(false)
        try {
          // a delete-verb writer with a fresh token each attempt — the
          // realistic concurrent maintainer shape
          val obs = LayoutLog.version(spark, dir)
          LayoutLog.commitVerb(spark, dir, "delete", obs): Unit
          racerCommits.incrementAndGet(): Unit
        } catch {
          case _: java.util.ConcurrentModificationException =>
            // the adjudicated conflict surface (stale token, vacuumed
            // hole, dir retired and still absent at translation time)
            racerConflicts.incrementAndGet(): Unit
          case _: java.io.IOException =>
            // a commit overlapping the retire->install window can also
            // die on the vanished _log before adjudication — loud, and
            // the dir may already be back when the error surfaces, so it
            // stays an infrastructure error rather than a CME. Both are
            // the documented loud-failure contract; silence is the bug.
            racerConflicts.incrementAndGet(): Unit
          case e: Throwable => racerUnexpected.add(e.toString): Unit
        }
        // Contention comes in PHASES: bursts of commits with quiet gaps.
        // A writer committing continuously every ~1 ms starves the swap
        // fence BY DESIGN (the maintainer's observe→copy→install window
        // always sees a newer version; the protocol's documented answer
        // to a saturating writer is "serialize writers upstream") — and
        // the round-16 link(2) commit primitive made the racer fast
        // enough that 120 swap attempts could ALL lose, flaking the
        // some-swaps-land assertion below. Quiet gaps are the realistic
        // shape AND what makes swap progress a property instead of a
        // coin flip.
        // gap must exceed the maintainer's full observe→copy→install
        // window (stageCopy is real file copies; ~50-100 ms on /tmp)
        if (racerCommits.get() % 10 == 0) Thread.sleep(150) else Thread.sleep(1)
        }
      }
    })
    racer.start()
    var swaps = 0
    var maintainerConflicts = 0
    var recoveries = 0
    try {
      // 120 contended attempts; the PROPERTY assertions hold for every
      // attempt. If every window lost to the racer (possible under
      // load by design), the post-loop handshake below lands one
      // UNcontended swap — liveness by construction, not by timing.
      var gen = 0
      while (gen < 120 || (swaps == 0 && gen < 122)) {
        if (gen == 120 && swaps == 0) {
          // park the racer and wait for the acknowledgment — after
          // this no commit can move the version under the maintainer
          pause = true
          while (!racerParked.get()) Thread.sleep(5)
        }
        gen += 1
        val staging = dir + s"-stage$gen"
        try {
          val observed = LayoutLog.version(spark, dir)
          stageCopy(dir, staging, gen)
          M.fencedSwap(spark, "SwapIsolationSpec", dir, staging, observed, "compact")
          LayoutLog.vacuum(spark, dir): Unit
          swaps += 1
        } catch {
          case _: java.util.ConcurrentModificationException =>
            // fence or rollback fired — loud, layout intact by contract
            maintainerConflicts += 1
          case e: java.io.IOException =>
            // the documented install-failure recovery: a racer's commit
            // re-created the dir inside the window; remove the ghost and
            // restore the newest intact generation
            val parent = Paths.get(dir).getParent
            val ghost = Paths.get(dir)
            // the racer thread may still be creating/reaping _tmp files in
            // the ghost dir mid-walk — retry until the tree is gone,
            // tolerating files vanishing or appearing between passes
            def rmTree(p: JPath): Unit = {
              var attempts = 0
              while (Files.exists(p) && attempts < 50) {
                attempts += 1
                try {
                  val w = Files.walk(p)
                  try w.sorted(java.util.Comparator.reverseOrder())
                    .iterator().asScala.foreach { q =>
                      try Files.deleteIfExists(q): Unit
                      catch { case _: java.io.IOException => () }
                    }
                  finally w.close()
                } catch {
                  case _: java.io.IOException | _: java.io.UncheckedIOException => ()
                }
              }
              assert(!Files.exists(p), s"could not clear $p for recovery")
            }
            rmTree(ghost)
            val retired = Files.list(parent).iterator().asScala
              .filter(_.getFileName.toString.startsWith("idx-retired-")).toSeq
            val source =
              if (Files.exists(Paths.get(staging))) Paths.get(staging)
              else retired.head
            Files.move(source, ghost)
            retired.filter(Files.exists(_)).foreach(rmTree)
            M.refresh(dir)
            recoveries += 1
            assert(e.getMessage.contains("intact"), e.getMessage)
        }
      }
    } finally { stop = true; racer.join() }
    assert(racerUnexpected.isEmpty,
      s"racer may only fail via CME: ${racerUnexpected.asScala.take(3).mkString("; ")}")
    assert(swaps > 0, "some swaps must land under contention")
    // and the layout is whole afterwards: readable, consistent version
    val got = spark.read.parquet(dir).select("id").collect().map(_.getLong(0)).toSet
    assert(got == (0L until 100L).toSet,
      s"layout must be intact after contention (got ${got.size} rows; " +
        s"swaps=$swaps fences=$maintainerConflicts recoveries=$recoveries " +
        s"racerCommits=${racerCommits.get()} racerConflicts=${racerConflicts.get()})")
    assert(LayoutLog.version(spark, dir) > 0L)
  }
}
