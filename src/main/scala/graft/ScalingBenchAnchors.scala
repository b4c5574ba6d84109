package graft

/** Pinned expected values for ScalingBench's determinism anchors on the
  * canonical 800k-file corpus (see ScalingBench). Kept in their own file
  * so a re-measurement touches nothing else.
  */
object ScalingBenchAnchors {
  // placeholder until the first verified 800k run records them; an empty
  // seq means "not yet recorded" and ScalingBench skips the constant check
  val fused800k: Seq[Long] = Seq.empty
  val counts800k: Seq[Long] = Seq.empty
}
