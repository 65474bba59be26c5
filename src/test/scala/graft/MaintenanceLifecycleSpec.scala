package graft

import graft.tools.LifecycleFuzz

/** Randomized maintenance-lifecycle property sweep (VERDICT r17 #2), CI
  * edition: seeded random interleavings of append / retract / compact /
  * crash-inject / foreign-lease (shingle stack) and grow / retract /
  * retrain / crash-inject (frozen-model + encoded-index family), with
  * layer ≡ rebuild, id coverage, and sidecar honesty asserted after
  * EVERY step — the assertions live in [[graft.tools.LifecycleFuzz]],
  * shared with the deeper offline sweep whose record is committed at
  * records/lifecycle_property.json (20 × 8 per family). CI runs fewer
  * sequences to bound suite time; the SEED is fixed so a failure
  * reproduces exactly.
  */
class MaintenanceLifecycleSpec extends SparkSpec {

  test("random shingle-stack interleavings: every step serves layers " +
       "equal to the live plans with honest sidecars (seeded)") {
    for (seed <- 42L to 43L)
      LifecycleFuzz.shingleSequence(spark, seed, steps = 6)
  }

  test("random frozen-model / encoded-index interleavings: every step " +
       "serves an index equal to a cold re-encode, covering exactly the " +
       "corpus ids, with honest sidecars (seeded)") {
    for (seed <- 142L to 143L)
      LifecycleFuzz.modelSequence(spark, seed, steps = 6)
  }
}
