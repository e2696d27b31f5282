package graft.store

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.crawl.{CrawlFixture, Robots}

/** Single-writer guard on the snapshot store (SURVEY §7 scopes out
  * concurrent-WRITER semantics; this spec pins that the store FAILS FAST
  * instead of silently interleaving commits when two drivers point at one
  * root). Covered: same-process double-open, live foreign-process holder,
  * stale lock from a dead holder (kill-recovery without manual unlock),
  * recycled-pid self-lock, reads never locking, release on close(). */
class WriterLockSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val mapper = new ObjectMapper()

  private def robots = Robots.load(spark, s"${CrawlFixture.fixturesDir}/robots.json")
  private def seeds = Files.readAllLines(
    Paths.get(s"${CrawlFixture.fixturesDir}/seeds.txt")).asScala.toSeq

  private def newRoot(tag: String) = Files.createTempDirectory(tag).toString

  private def writeLockFile(root: String, pid: Long): Unit = {
    Files.createDirectories(Paths.get(root))
    val n = mapper.createObjectNode()
    n.put("pid", pid)
    n.put("token", "foreign-token")
    n.put("heartbeatMs", 0L)
    Files.writeString(Paths.get(root, ".writer.lock"), n.toString)
  }

  test("second writer in the same process fails fast; close() releases") {
    val root = newRoot("lockSameProc")
    val a = new DurableCrawler(spark, root, CrawlFixture.cfg)
    a.init(seeds, robots)
    assert(Files.exists(Paths.get(root, ".writer.lock")))

    val b = new DurableCrawler(spark, root, CrawlFixture.cfg)
    // init on an already-initialized store is a read-only no-op, so drive a
    // real mutating op (gc) to force b through the lock acquisition
    val e = intercept[IllegalStateException] { b.gc(keepLastRounds = 1) }
    assert(e.getMessage.contains("single-writer"))

    a.close()
    assert(!Files.exists(Paths.get(root, ".writer.lock")))
    b.gc(keepLastRounds = 1) // lock is free now — the same op succeeds
    assert(b.lastCompleteRound.contains(-1))
    b.close()
  }

  test("a LIVE foreign holder is refused with a clear message") {
    val root = newRoot("lockLive")
    // a real live process that is not us: its pid passes the liveness probe
    val p = new ProcessBuilder("sleep", "60").start()
    try {
      writeLockFile(root, p.pid())
      val d = new DurableCrawler(spark, root, CrawlFixture.cfg)
      val e = intercept[IllegalStateException] { d.init(seeds, robots) }
      assert(e.getMessage.contains("live writer") &&
        e.getMessage.contains(p.pid().toString))
    } finally p.destroy()
  }

  test("a crashed holder's stale lock is recovered automatically") {
    val root = newRoot("lockStale")
    // a process that has already exited: dead pid → stale lock
    val p = new ProcessBuilder("true").start()
    p.waitFor()
    writeLockFile(root, p.pid())
    val d = new DurableCrawler(spark, root, CrawlFixture.cfg)
    d.init(seeds, robots) // steals the stale lock, crawl proceeds
    assert(d.lastCompleteRound.contains(-1))
    val n = mapper.readTree(Files.readString(Paths.get(root, ".writer.lock")))
    assert(n.get("pid").asLong() == ProcessHandle.current().pid(),
      "recovered lock must now name the new holder")
    d.close()
  }

  test("our own pid in the file with no registry entry = recycled pid, recovered") {
    // the instance registers in the JVM-local registry BEFORE creating the
    // file and unregisters only AFTER deleting it, so this state can only
    // be a stale file from a previous process that got our recycled pid
    val root = newRoot("lockRecycled")
    writeLockFile(root, ProcessHandle.current().pid())
    val d = new DurableCrawler(spark, root, CrawlFixture.cfg)
    d.init(seeds, robots)
    assert(d.lastCompleteRound.contains(-1))
    d.close()
  }

  test("readers never take the lock; reads keep working after close()") {
    val root = newRoot("lockRead")
    val w = new DurableCrawler(spark, root, CrawlFixture.cfg)
    w.init(seeds, robots)
    // a second handle can READ while the writer holds the lock
    val r = new DurableCrawler(spark, root, CrawlFixture.cfg)
    assert(r.lastCompleteRound.contains(-1))
    assert(r.currentState().frontier.count() > 0)
    assert(!Files.exists(Paths.get(root, ".writer.lock")) ||
      mapper.readTree(Files.readString(Paths.get(root, ".writer.lock")))
        .get("pid").asLong() == ProcessHandle.current().pid())
    w.close()
    w.close() // idempotent
    assert(w.currentState().frontier.count() > 0) // handle still reads after close
  }

  test("stale-lock steal is a guarded compare-and-delete, not blind delete") {
    // r6 TOCTOU fix: the steal re-reads under an exclusive FileLock on the
    // side file and deletes ONLY the exact observed (pid, token). A
    // leftover guard file from a previous (possibly killed) stealer must
    // not block recovery, and after recovery the guard file must still
    // exist (deleting it would split the mutual exclusion across inodes).
    val root = newRoot("lockSteal")
    val p = new ProcessBuilder("true").start()
    p.waitFor()
    writeLockFile(root, p.pid())
    Files.writeString(Paths.get(root, ".writer.lock.steal"), "") // stale guard
    val d = new DurableCrawler(spark, root, CrawlFixture.cfg)
    d.init(seeds, robots)
    assert(d.lastCompleteRound.contains(-1))
    val n = mapper.readTree(Files.readString(Paths.get(root, ".writer.lock")))
    assert(n.get("pid").asLong() == ProcessHandle.current().pid())
    assert(Files.exists(Paths.get(root, ".writer.lock.steal")),
      "guard file must never be deleted")
    d.close()
  }

  test("heartbeat rewrite is atomic: no torn lock file is ever observable") {
    // r6 fix: writeLockContent goes tempfile → ATOMIC_MOVE, so the lock
    // file always parses with a pid even if a kill lands mid-heartbeat.
    // Drive a real mutating op (which heartbeats) and pin the invariant.
    val root = newRoot("lockHb")
    val d = new DurableCrawler(spark, root, CrawlFixture.cfg)
    d.init(seeds, robots)
    val n = mapper.readTree(Files.readString(Paths.get(root, ".writer.lock")))
    assert(n.get("pid").asLong() == ProcessHandle.current().pid())
    assert(n.get("token").asText().nonEmpty && n.get("heartbeatMs").asLong() > 0)
    // no orphan tempfiles after the move
    val leftovers = Files.list(Paths.get(root)).iterator().asScala
      .filter(_.getFileName.toString.startsWith(".writer.lock.tmp-")).toSeq
    assert(leftovers.isEmpty, s"heartbeat tempfile leaked: $leftovers")
    d.close()
  }
}
