package graft

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper

/** Enforces `PERF_BUDGET.json`: every budgeted query, re-measured in
  * this suite's session (the same local[4]/shuffle=4 shape the budget
  * was recorded under), must finish inside its steady-state ceiling.
  * Min-of-two runs absorbs one-off stalls; a genuine order-of-magnitude
  * regression cannot hide behind the margin. Re-baseline deliberately
  * with `runMain graft.PerfBudget` after an intentional perf change. */
class PerfBudgetSpec extends SparkSpec {

  test("no budgeted query exceeds its steady-state ceiling") {
    val path = Paths.get("PERF_BUDGET.json")
    assume(Files.exists(path), "PERF_BUDGET.json not recorded yet")
    val root = new ObjectMapper().readTree(Files.readAllBytes(path))
    val sfDir = root.get("sf").asText()
    assume(Files.exists(Paths.get(sfDir)),
      s"budget test data '$sfDir' not present on this machine — re-baseline here")
    val budgets = {
      val it = root.get("queries").properties().iterator()
      val b = Seq.newBuilder[(String, Double)]
      while (it.hasNext) {
        val e = it.next()
        b += e.getKey -> e.getValue.get("budget_sec").asDouble()
      }
      b.result()
    }
    budgets should not be empty
    // one neutral warmup so the first budgeted query doesn't absorb
    // session bring-up (same as Bench/PerfBudget)
    spark.range(1000).groupBy((org.apache.spark.sql.functions.col("id") % 10).as("k"))
      .count().write.format("noop").mode("overwrite").save()
    val over = budgets.flatMap { case (name, budget) =>
      val fn = SparkEntry.queries.getOrElse(name, fail(
        s"stale budget entry '$name' (no such query) — re-run graft.PerfBudget"))
      val best = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      if (best > budget) Some(f"$name: $best%.2fs > budget $budget%.2fs") else None
    }
    withClue(s"queries over budget (re-baseline deliberately if intended):\n${over.mkString("\n")}\n") {
      over shouldBe empty
    }
  }
}
