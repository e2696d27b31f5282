package graft.crawl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Crawl-delay → per-round budget derivation: a robots crawlDelayMs is
  * politeness DATA; in batch rounds it becomes ⌊window/delay⌋ fetches per
  * round, explicit budgets taking precedence. */
class RobotsBudgetSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val robots = Seq(
    RobotsRules("slow.example", Seq(), Seq(), 5000L),   // 2/round @ 10s window
    RobotsRules("fast.example", Seq(), Seq(), 100L),    // 100/round
    RobotsRules("glacial.example", Seq(), Seq(), 60000L), // floor: 1/round
    RobotsRules("free.example", Seq(), Seq(), 0L)       // no delay → default
  ).toDF()

  test("derived budgets = floor(window/delay), min 1, no row for delay-free hosts") {
    val b = Robots.budgetsFromCrawlDelay(robots, 10000L)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(b == Map("slow.example" -> 2, "fast.example" -> 100, "glacial.example" -> 1))
  }

  test("explicit budgets override derived ones") {
    val explicit = Seq(("slow.example", 7)).toDF("host", "budget")
    val merged = Robots.mergedBudgets(explicit, robots, 10000L)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(merged("slow.example") == 7)     // explicit wins
    assert(merged("fast.example") == 100)   // derived fills the rest
    assert(!merged.contains("free.example"))
  }

  test("frontier pop honors a delay-derived budget") {
    val entries = (0 until 50).map { i =>
      FrontierEntry(s"https://slow.example/p$i", i.toLong * 7919, "slow.example",
        i / 50.0, 0, 0)
    }.toDF()
    val budgets = Robots.budgetsFromCrawlDelay(robots, 10000L)
    val (popped, remaining) = Frontier.pop(entries, budgets, defaultBudget = 25,
      saltBuckets = 4)
    assert(popped.count() == 2) // crawl-delay cap, not the default 25
    assert(remaining.count() == 48)
  }
}
