package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Graph

/** Graph-analytics queries — link-style centrality over relationship
  * edges derived from the TPC-H tables. The LLM-pipeline use is link
  * quality for crawled corpora (PageRank over the hyperlink graph as a
  * document-quality prior); here the customer↔supplier purchase graph
  * stands in for it at test scale.
  */
object GraphQueries {

  /** G1: 3-iteration fixed-point PageRank over the customer↔supplier
    * graph (edge = "this customer ordered from this supplier";
    * supplier ids offset into a disjoint range). Fixed-point BIGINT
    * mass makes the iteration order-independent, so the unrolled-CTE
    * DuckDB oracle hash-gates every round exactly — no tolerance, no
    * float drift (see operators.Graph). Output: supplier nodes only. */
  def pagerankSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val edges = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + 1000000L).as("dst"))
      .distinct()
    Graph.pagerank(edges, iters = 3)
      .where(col("id") >= 1000000L)
      .select(col("id"), col("r"))
      .orderBy("id")
  }

  /** G2: triangle count of the supplier CO-PURCHASE graph (edge =
    * two suppliers sharing an order; the l_orderkey mod filter keeps
    * the graph sparse enough that wedge volume stays join-sized at
    * bench SF). Exactly-once ordered-wedge counting — see
    * operators.Graph.triangleCount for the degree-orientation story. */
  def supplierTriangles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .where(col("l_orderkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_suppkey"))
    val edges = li.as("x").join(li.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_suppkey") < col("y.l_suppkey"))
      .select(col("x.l_suppkey").as("a"), col("y.l_suppkey").as("b"))
      .distinct()
    // the degree-oriented variant is the query path (skew-proof wedge
    // volume); GraphSpec pins equality with the plain ordered count,
    // and the exact-count oracle gates it here
    Graph.triangleCountOriented(edges)
  }

  /** G3: 5-CORE of the sparse supplier co-purchase graph (g2's edge
    * definition at a stronger order filter, so peeling actually bites:
    * ~15-20% of nodes peel off over 2-3 rounds at test SFs). The
    * k-core is unique, so the oracle is EXACT: the SQL side unrolls 8
    * peel rounds (plain CTE chain — each round recomputes survivor
    * degrees); peeling only shrinks, so extra unrolled rounds past the
    * fixpoint are no-ops, and if convergence ever needed more than 8
    * the hash gate fails rather than silently truncating. */
  def supplierKcore(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .where(col("l_orderkey") % 200 === 0)
      .select(col("l_orderkey"), col("l_suppkey"))
    val edges = li.as("x").join(li.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_suppkey") < col("y.l_suppkey"))
      .select(col("x.l_suppkey").as("a"), col("y.l_suppkey").as("b"))
      .distinct()
    Graph.kcore(edges, k = 5)
      .orderBy("id")
  }

  val supplierKcoreSql: String = {
    def round(prev: String, r: Int): String =
      s"""a$r AS (
         |  SELECT v AS id FROM (
         |    SELECT s.v, COUNT(*) AS d
         |    FROM sym s JOIN $prev x ON s.v = x.id JOIN $prev y ON s.u = y.id
         |    GROUP BY s.v)
         |  WHERE d >= 5)""".stripMargin
    val rounds = (1 to 8).map(r => round(s"a${r - 1}", r)).mkString(",\n")
    s"""WITH e AS (
       |  SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b
       |  FROM lineitem x JOIN lineitem y
       |    ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
       |  WHERE x.l_orderkey % 200 = 0),
       |sym AS (SELECT a AS v, b AS u FROM e UNION ALL SELECT b, a FROM e),
       |nodes AS (SELECT DISTINCT v AS id FROM sym),
       |a0 AS (SELECT id FROM nodes),
       |$rounds
       |SELECT n.id, a8.id IS NOT NULL AS in_core
       |FROM nodes n LEFT JOIN a8 ON n.id = a8.id
       |ORDER BY n.id""".stripMargin
  }

  val supplierTrianglesSql: String =
    """WITH e AS (
      |  SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b
      |  FROM lineitem x JOIN lineitem y
      |    ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
      |  WHERE x.l_orderkey % 10 = 0)
      |SELECT (SELECT COUNT(*) FROM e) AS n_edges,
      |       (SELECT COUNT(*) FROM e e1
      |          JOIN e e2 ON e1.b = e2.a
      |          JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles""".stripMargin

  val pagerankSuppliersSql: String = {
    def iter(prev: String, k: Int): String =
      s"""r$k AS (
         |  SELECT nodes.id,
         |    (15 * 1000000000000) // (100 * (SELECT n FROM nn))
         |      + (85 * COALESCE(s.c, 0)) // 100 AS r
         |  FROM nodes LEFT JOIN (
         |    SELECT sym.dst AS id, CAST(SUM(p.r // deg.deg) AS BIGINT) AS c
         |    FROM sym JOIN $prev p ON sym.src = p.id
         |             JOIN deg ON sym.src = deg.src
         |    GROUP BY sym.dst) s ON nodes.id = s.id)""".stripMargin
    s"""WITH edges AS (
       |  SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
       |nodes AS (SELECT DISTINCT src AS id FROM sym),
       |nn AS (SELECT COUNT(*) AS n FROM nodes),
       |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY src),
       |r0 AS (SELECT id, 1000000000000 // (SELECT n FROM nn) AS r FROM nodes),
       |${iter("r0", 1)},
       |${iter("r1", 2)},
       |${iter("r2", 3)}
       |SELECT id, r FROM r3 WHERE id >= 1000000 ORDER BY id""".stripMargin
  }
}
