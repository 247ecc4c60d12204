package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge DataFrames — the OSM model encodes a graph
  * (ways reference nodes through way_nodes, SURVEY.md §1.1), and a
  * training-data pipeline needs connected components for e.g. transitive
  * dedup clusters (near-dup pairs → groups).
  *
  * Connected components by iterative min-label propagation: each round
  * every vertex adopts the smallest label among itself and its neighbors;
  * rounds repeat until no label changes. O(diameter) rounds, each one
  * shuffle keyed by vertex.
  *
  * Scale hygiene for iterative Spark jobs, applied here: persist each
  * round's labels and truncate lineage with localCheckpoint — without it
  * the plan doubles per round and the job dies re-planning long lineages
  * well before data size matters.
  */
object Graph {

  /** Connected components of an undirected edge list (columns src, dst —
    * any integral type). Returns (v, component) where component is the
    * minimum vertex id in the component. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("src").cast("long").as("a"), col("dst").cast("long").as("b"))
      .union(edges.select(col("dst").cast("long"), col("src").cast("long")))
      .distinct()
      .persist()
    var labels = sym.select(col("a").as("v"), col("b"))
      .groupBy("v").agg(least(min(col("b")), col("v")).as("component"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // neighbor labels: for each edge (a,b), a can adopt b's label
      val neighborLabels = sym
        .join(labels.withColumnRenamed("v", "b2"), col("b") === col("b2"))
        .select(col("a").as("v"), col("component"))
      val next = labels.select(col("v"), col("component"))
        .union(neighborLabels)
        .groupBy("v").agg(min("component").as("component"))
        .localCheckpoint()
      changed = next.join(labels.withColumnRenamed("component", "old"), "v")
        .filter(col("component") =!= col("old")).count()
      labels = next
      iter += 1
    }
    sym.unpersist()
    labels
  }

  /** Component summary: size and representative per component. */
  def componentSizes(components: DataFrame): DataFrame =
    components.groupBy("component")
      .agg(count(lit(1)).as("n_vertices"))
      .orderBy(col("n_vertices").desc, col("component"))
}
