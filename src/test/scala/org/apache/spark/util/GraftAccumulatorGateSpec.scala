package org.apache.spark.util

import graft.SparkSpec

/** The wait-free write-metric gate ([[GraftAccumulatorGate]]) under
  * the registry conditions that decide whether the store's harvest
  * validation can trust a scan: absent ids (allocated, never
  * registered) are skipped soundly, while a COLLECTED entry anywhere
  * in the bracket abandons the whole scan — a partial scan could have
  * lost the bracketed write's own metric while keeping a smaller
  * foreign one, and that undercount is the one path to a false commit
  * abort. Suites may share this JVM, so value assertions use
  * containment on a per-test unique metric name, never exact sets. */
class GraftAccumulatorGateSpec extends SparkSpec {

  private def uniqueName() = s"graft-gate-spec-${java.util.UUID.randomUUID()}"

  test("named longs inside the bracket are captured; outside, not") {
    val name = uniqueName()
    val before = spark.sparkContext.longAccumulator(name)
    before.add(99L)
    val mark = GraftAccumulatorGate.idWatermark()
    val a = spark.sparkContext.longAccumulator(name)
    a.add(3L)
    val b = spark.sparkContext.longAccumulator(name)
    b.add(7L)
    val got = GraftAccumulatorGate.namedLongsSince(mark, name)
    withClue(s"scan result $got: ") {
      got.isDefined shouldBe true
      got.get should contain allOf (3L, 7L)
      got.get should not contain 99L
    }
  }

  test("ids allocated but never registered are skipped, scan stays trusted") {
    val name = uniqueName()
    val mark = GraftAccumulatorGate.idWatermark()
    (1 to 5).foreach(_ => AccumulatorContext.newId()) // consumed, never registered
    val a = spark.sparkContext.longAccumulator(name)
    a.add(4L)
    val got = GraftAccumulatorGate.namedLongsSince(mark, name)
    got.isDefined shouldBe true
    got.get should contain(4L)
  }

  test("a garbage-collected entry in the bracket abandons the whole scan") {
    // deterministic collection: clear() the weak reference the registry
    // holds for a throwaway accumulator — no System.gc() roulette
    val registry = GraftAccumulatorGate.registry
    assume(registry.isDefined, "reflective registry handle unavailable")
    val name = uniqueName()
    val mark = GraftAccumulatorGate.idWatermark()
    val doomed = spark.sparkContext.longAccumulator // unnamed foreign entry
    val mine = spark.sparkContext.longAccumulator(name)
    mine.add(5L)
    val ref = registry.get.get(java.lang.Long.valueOf(doomed.id))
    ref should not be null
    ref.clear()
    GraftAccumulatorGate.namedLongsSince(mark, name) shouldBe None
  }

  test("an abandoned scan increments the observable abandonment counter") {
    val registry = GraftAccumulatorGate.registry
    assume(registry.isDefined, "reflective registry handle unavailable")
    val name = uniqueName()
    val before = GraftAccumulatorGate.abandonedScans.get()
    val mark = GraftAccumulatorGate.idWatermark()
    val doomed = spark.sparkContext.longAccumulator
    val mine = spark.sparkContext.longAccumulator(name)
    mine.add(5L)
    registry.get.get(java.lang.Long.valueOf(doomed.id)).clear()
    GraftAccumulatorGate.namedLongsSince(mark, name) shouldBe None
    GraftAccumulatorGate.abandonedScans.get() should be > before
  }

  test("registry drift disarms the scan outright (None), never the per-id fallback") {
    // stubbing reg = None reaches the branch a healthy Spark cannot:
    // the pre-r20 fallback per-id scan read collected entries as
    // absent — the undercount → false-abort shape — so drift must
    // yield NO answer, even when the bracket holds a live named match
    val name = uniqueName()
    val mark = GraftAccumulatorGate.idWatermark()
    val a = spark.sparkContext.longAccumulator(name)
    a.add(11L)
    GraftAccumulatorGate.namedLongsSinceWith(None, mark, name) shouldBe None
    // same bracket, real registry: the value is there to be found
    GraftAccumulatorGate.namedLongsSince(mark, name).map(_.toSet) shouldBe Some(Set(11L))
  }

  test("the reflective registry handle resolves against this Spark") {
    // if Spark's private field ever drifts, the gate degrades (scan
    // can't see collected entries) — this makes the drift a loud red
    GraftAccumulatorGate.registry.isDefined shouldBe true
  }
}
