package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting by degree-ordered node-iterator
  * (Suri & Vassilvitskii, WWW'11 — the MapReduce-era standard that
  * every Spark/Giraph graph library re-implements). Triangles are the
  * unit of cohesion metrics (clustering coefficient, community
  * density) over co-occurrence graphs — here the parts-bought-together
  * graph, in an LLM pipeline the doc-similarity graph.
  *
  * Why orientation matters at 100 TB: the naive wedge join
  * (adjacency ⋈ adjacency on the center node) explodes on hubs —
  * a degree-d node contributes d² wedge rows, and real co-occurrence
  * graphs are power-law. Orienting every edge from the smaller to the
  * larger endpoint under the total order (degree, id) caps OUT-degree
  * at O(√m), so the wedge join is Σ outdeg² = O(m^1.5) worst-case and
  * skew-free in practice: the hub that dominated the naive plan has
  * huge IN-degree but tiny out-degree, and each triangle {a≺b≺c} is
  * generated exactly once, as the wedge (a→b, a→c) closed by b→c —
  * no post-hoc de-duplication pass.
  *
  * Shape: two shuffles on node keys (degree count, wedge group) plus
  * two equi-joins the optimizer plans as shuffle-hash under AQE; no
  * windows, no driver state.
  */
object Triangles {

  /** Per-node triangle participation over a DISTINCT undirected edge
    * set given as columns (a, b) with a < b. Returns
    * (n, degree, triangles) for every node incident to an edge, with
    * triangles = 0 where none close. */
  def perNode(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("a").as("n"))
      .unionAll(edges.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("degree"))
    // orient each edge from the (degree, id)-smaller endpoint
    val ori = edges
      .join(deg.select(col("n").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("degree").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("u"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("v"))
    val wedges = ori.select(col("u"), col("v").as("x"))
      .join(ori.select(col("u"), col("v").as("y")), "u")
      .filter(col("x") =!= col("y"))
    // the closing edge's own orientation picks exactly one of the two
    // (x,y)/(y,x) wedge copies, so each triangle lands once
    val tri = wedges.join(
      ori.select(col("v").as("y"), col("u").as("x")), Seq("x", "y"))
    val perNode = tri
      .select(explode(array(col("u"), col("x"), col("y"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("n"), "left")
      .select(col("n"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
  }
}
