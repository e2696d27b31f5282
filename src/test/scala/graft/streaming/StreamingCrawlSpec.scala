package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.crawl.FrontierEntry
import graft.fixtures.SyntheticCorpus

class StreamingCrawlSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def entry(url: String, prio: Double): FrontierEntry = {
    val canonical = graft.expr.UrlCanonicalizer.canonicalize(url)
    FrontierEntry(canonical,
      urlHash = canonical.hashCode.toLong, // any deterministic id works here
      host = new java.net.URI(canonical).getHost, prio, depth = 0, round = 0)
  }

  test("hostWindowCounts: batch semantics — counts per (host, window)") {
    val pages = SyntheticCorpus.pages(spark, 200L, nHosts = 10).toDF()
    val out = StreamingCrawl.hostWindowCounts(pages, "7 days", "1 hour")
      .collect()
    assert(out.map(_.getLong(2)).sum == 200L)
    assert(out.forall(_.getLong(2) > 0))
  }

  /** Both politeness implementations — the legacy flatMapGroupsWithState
    * gate and the transformWithState successor — must satisfy the same
    * scenarios. transformWithState requires the RocksDB state store, set
    * only around its queries. */
  private type Gate =
    (org.apache.spark.sql.Dataset[FrontierEntry], Int, Long) => org.apache.spark.sql.Dataset[FrontierEntry]
  private val impls: Seq[(String, Gate, Boolean)] = Seq(
    ("fmgws", StreamingCrawl.politenessGate(_, _, _), false),
    ("tws", StreamingCrawl.politenessGateTws(_, _, _), true))

  private def withProvider[T](rocksdb: Boolean)(f: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    try {
      if (rocksdb) spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      f
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  for ((name, gate, rocksdb) <- impls) {
    test(s"politenessGate[$name] streaming: ≤ budget per host per trigger, priority order") {
      withProvider(rocksdb) {
        val ms = MemoryStream[FrontierEntry](spark)
        val gated = gate(ms.toDS(), 2, -1L)
        val q = gated.writeStream
          .format("memory").queryName(s"gate_out_$name").outputMode(OutputMode.Append)
          .start()
        try {
          // trigger 1: host a has 3 candidates — only top-2 by priority emit
          ms.addData(
            entry("https://a.example/1", 0.9), entry("https://a.example/2", 0.5),
            entry("https://a.example/3", 0.7), entry("https://b.example/1", 0.1))
          q.processAllAvailable()
          val t1 = spark.table(s"gate_out_$name").as[FrontierEntry].collect()
          assert(t1.count(_.host == "a.example") == 2)
          assert(t1.filter(_.host == "a.example").map(_.priority).sorted.toSeq == Seq(0.7, 0.9))
          assert(t1.count(_.host == "b.example") == 1)

          // trigger 2: fresh budget for host a
          ms.addData(entry("https://a.example/4", 0.2), entry("https://a.example/5", 0.3))
          q.processAllAvailable()
          val t2 = spark.table(s"gate_out_$name").as[FrontierEntry].collect()
          assert(t2.count(_.host == "a.example") == 4)
        } finally q.stop()
      }
    }

    test(s"politenessGate[$name]: maxTotalPerHost caps a host across triggers") {
      withProvider(rocksdb) {
        val ms = MemoryStream[FrontierEntry](spark)
        val gated = gate(ms.toDS(), 2, 3L)
        val q = gated.writeStream
          .format("memory").queryName(s"gate_cap_$name").outputMode(OutputMode.Append)
          .start()
        try {
          ms.addData(entry("https://c.example/1", 0.9), entry("https://c.example/2", 0.8))
          q.processAllAvailable()
          ms.addData(entry("https://c.example/3", 0.7), entry("https://c.example/4", 0.6))
          q.processAllAvailable()
          ms.addData(entry("https://c.example/5", 0.5))
          q.processAllAvailable()
          val out = spark.table(s"gate_cap_$name").as[FrontierEntry].collect()
          // 2 in trigger 1, 1 in trigger 2 (ledger hits the cap), 0 in trigger 3
          assert(out.length == 3)
          assert(out.map(_.priority).sorted.toSeq == Seq(0.7, 0.8, 0.9))
        } finally q.stop()
      }
    }
  }

  test("the two politeness implementations emit identical sets on a shared scenario") {
    def run(gate: Gate, rocksdb: Boolean, tag: String): Set[(String, Double)] =
      withProvider(rocksdb) {
        val ms = MemoryStream[FrontierEntry](spark)
        val q = gate(ms.toDS(), 3, 5L).writeStream
          .format("memory").queryName(s"gate_par_$tag").outputMode(OutputMode.Append)
          .start()
        try {
          ms.addData((1 to 7).map(i => entry(s"https://p.example/$i", i / 10.0)): _*)
          q.processAllAvailable()
          ms.addData((8 to 12).map(i => entry(s"https://p.example/$i", i / 100.0)): _*)
          q.processAllAvailable()
          spark.table(s"gate_par_$tag").as[FrontierEntry].collect()
            .map(e => (e.url, e.priority)).toSet
        } finally q.stop()
      }
    val a = run(StreamingCrawl.politenessGate(_, _, _), rocksdb = false, "a")
    val b = run(StreamingCrawl.politenessGateTws(_, _, _), rocksdb = true, "b")
    assert(a == b, s"implementations disagree: ${a.diff(b)} vs ${b.diff(a)}")
  }
}
