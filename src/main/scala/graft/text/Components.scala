package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pairs — the step that turns
  * pairwise dedup output (minhash/simhash/embedding pairs) into actionable
  * per-document keep/drop decisions: every doc gets the component's minimum
  * docId as its canonical representative (`rep`); `rep == doc_id` means
  * "keeper".
  *
  * Algorithm: deterministic min-label propagation — each iteration every
  * vertex takes the minimum label among itself and its neighbors; converges
  * to the exact component minimum in O(component diameter) iterations.
  * Near-dup graphs are shallow (clusters of copies, diameter a few hops),
  * so the loop is short; the per-iteration work is one equi-join + one
  * aggregation, both shuffling on the vertex id. At extreme scale the
  * alternating large-star/small-star formulation (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond") halves the iteration
  * count; min-label propagation is the simpler exact baseline and is what
  * the SQL oracle's recursive closure replays.
  */
object Components {

  /** `edges`: undirected pair list (aCol, bCol). `allDocs`/`docCol`:
    * the full vertex universe — docs without any pair are emitted with
    * rep = self. Returns (doc_id, rep).
    */
  def components(edges: DataFrame, aCol: String, bCol: String,
                 allDocs: DataFrame, docCol: String,
                 maxIters: Int = 50): DataFrame = {
    val e = edges.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    // localCheckpoint truncates lineage each iteration — without it the
    // logical plan deepens per round and analysis blows up on long chains
    // (a reliable checkpoint dir would serve the same role on a cluster)
    var labels = allDocs.select(col(docCol).cast("long").as("doc")).distinct()
      .withColumn("rep", col("doc"))
      .localCheckpoint(true)

    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      // neighbor minimum per vertex, then take min(self, neighbors)
      val nbrMin = sym
        .join(labels.select(col("doc").as("dst"), col("rep").as("nrep")), Seq("dst"))
        .groupBy(col("src").as("doc"))
        .agg(min("nrep").as("nmin"))
      val next = labels
        .join(nbrMin, Seq("doc"), "left")
        .select(col("doc"),
          least(col("rep"), coalesce(col("nmin"), col("rep"))).as("rep"))
        .localCheckpoint(true)
      changed = next.as("n")
        .join(labels.select(col("doc"), col("rep").as("old")), Seq("doc"))
        .where(col("rep") =!= col("old")).count()
      labels = next
      iter += 1
    }
    sym.unpersist()
    labels.select(col("doc").as("doc_id"), col("rep"))
  }
}
