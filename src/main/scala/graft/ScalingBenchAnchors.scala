package graft

/** Pinned expected values for ScalingBench's determinism anchors on the
  * canonical 800k-file corpus (see ScalingBench). Recorded from the first
  * verified round-5 run (2026-08-17, BENCH/BASELINE_run_2to8_7.md) and
  * asserted identical at both parallelism levels of that run; CorpusGen
  * is deterministic, so any future drift is a correctness regression.
  * Kept in their own file so a re-measurement touches nothing else.
  */
object ScalingBenchAnchors {
  /** result rows per Bench.fusedSpecs slot (two Bm25 top-10, two boolean
    * matches, one cover top-10, one prefix match) */
  val fused800k: Seq[Long] =
    Seq(10L, 10L, 358327L, 748563L, 10L, 296257L)
  /** match counts per Bench.countSpecs slot */
  val counts800k: Seq[Long] =
    Seq(358327L, 748563L, 296257L, 761347L, 751734L, 563277L)
  /** result rows per Bench.addonSpecs slot (ordered-scan family: two
    * addon top-10s, two addon ranges, two facet histograms) — recorded
    * from the first verified 800k run of the phase
    * (BENCH/BASELINE_run_2to8_9.md) and asserted identical at both its
    * parallelism levels.
    */
  val addon800k: Seq[Long] =
    Seq(10L, 149852L, 20L, 10L, 10L, 112761L)
}
