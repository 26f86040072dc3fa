package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BaseJoinExec, CartesianProductExec}

import graft.{SparkEntry, SparkSpec}

/** The plans the 100 TB claims rest on, pinned as tests so a regression
  * shows up as a red suite instead of a silent 100× slowdown. Each
  * check is an invariant of the plan SHAPE (pushdown reached the scan,
  * no cartesian candidate generation, no unnecessary shuffle), not a
  * timing — timings live in Bench/ScaleProbe. */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  private def ops(p: SparkPlan): Seq[SparkPlan] = {
    val nested = p match {
      case a: AdaptiveSparkPlanExec => ops(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => ops(q.plan)
      case _ => Nil
    }
    (p +: p.children.flatMap(ops)) ++ nested
  }

  private def planOps(name: String): Seq[SparkPlan] =
    ops(run(name).queryExecution.executedPlan)

  test("q02: filter and projection are pushed into the parquet scan") {
    val scans = planOps("q02_filter_project").collect { case s: FileSourceScanExec => s }
    scans should not be empty
    // the predicate reached the source (footer/page-level skipping)...
    scans.exists(_.metadata.get("PushedFilters").exists(f =>
      f != "[]" && f.nonEmpty)) shouldBe true
    // ...and no scan reads more than the handful of projected columns
    all(scans.map(_.schema.fieldNames.length)) should be <= 6
  }

  test("LSH near-dup candidate generation never plans a cartesian product") {
    val p = planOps("d07_lsh_near_dup")
    p.collect { case c: CartesianProductExec => c } shouldBe empty
    // every join is an equi-join on band/id keys
    all(p.collect { case j: BaseJoinExec => j.leftKeys.nonEmpty }) shouldBe true
  }

  test("exact dedup is join-free: one hash-agg pass over fingerprints") {
    val p = planOps("d05_dedup_exact")
    p.collect { case j: BaseJoinExec => j } shouldBe empty
    p.collect { case c: CartesianProductExec => c } shouldBe empty
  }

  test("frame manifest explodes map-side: no shuffle except the output sort") {
    val shuffles = planOps("m06_frame_manifest")
      .collect { case e: ShuffleExchangeExec => e }
    shuffles should have size 1 // the final orderBy's range exchange
  }

  test("token stats stay inside whole-stage codegen") {
    // AQE applies codegen at stage materialization — execute first,
    // then inspect the FINAL plan
    val df = run("d01_token_stats")
    df.collect()
    ops(df.queryExecution.executedPlan)
      .collect { case w: WholeStageCodegenExec => w } should not be empty
  }

  test("no query funnels an unbounded frame through an unpartitioned window") {
    // An unpartitioned WindowExec sorts its ENTIRE input through one
    // partition — the single worst scale hazard a declarative plan can
    // hide (d39's full-vocabulary row_number was exactly this). The
    // invariant: every unpartitioned window in the 151-query surface
    // must run over a provably collapsed frame, and each such case is
    // allowlisted here WITH its bound so the next edit that widens a
    // frame has to argue its case in this map.
    val allowed: Map[String, String] = Map(
      "d23_quality_filter" -> "4dp-score value histogram (≤ ~10^4 rows)",
      "d29_seq_pack" -> "shard base offsets: one row per doc_id shard",
      "d31_vocab_growth" -> "3 growth buckets",
      "d35_training_manifest" -> "shard base offsets (packSequences phase 2)",
      "d37_drift_cdf" -> "doc-length buckets (corpus/50-char bands)",
      "d39_zipf_fit" -> "(count, term-prefix) shard base offsets",
      "q33_funnel" -> "3-row step funnel frame",
      "e18_hybrid_rrf" -> "two k-limited ranked lists (k=10)")
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val unpartitioned = planOps(name).collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
      }
      if (unpartitioned.nonEmpty && !allowed.contains(name)) Some(name) else None
    }
    offenders shouldBe empty
    // and the allowlist carries no stale entries
    val stale = allowed.keySet -- SparkEntry.queries.keySet
    stale shouldBe empty
  }
}
