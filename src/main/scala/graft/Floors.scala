package graft

/** Per-key isolated warm floors at the bench config (round 10, VERDICT
  * r9 items 2+5): the recorded healthy-host cost of every registry key,
  * measured by `graft.FloorRecord` (min of 2 warm evaluations per key,
  * local[32], sf0.1, after the standard Bench warmup) and committed as
  * FLOORS_r10.json at round close.
  *
  * Two consumers:
  *  - Bench's stall re-time pass prioritizes keys by measured/floor
  *    RATIO instead of absolute wall (the r9 driver run re-timed only 7
  *    keys before its wall cap because worst-first at a 1.0 s absolute
  *    floor spent budget on keys that are legitimately ~1 s);
  *  - a stalled driver bench can be mechanically diffed key-by-key
  *    against the committed floors (BASELINE.md protocol section).
  *
  * Re-record with `sbt "runMain graft.FloorRecord"` after any
  * deliberate perf-relevant change; RegistrySpec pins map/registry
  * consistency so a renamed key can't leave a stale floor behind. */
object Floors {
  /** key -> isolated warm seconds (min of 2), local[32] sf0.1. */
  val bench: Map[String, Double] = FloorsData.bench
}
