package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Connected-components edge cases on top of PropertySpec's union-find
  * differential: adversarial diameter beyond maxIter's log bound budget,
  * non-numeric ids, degenerate inputs, and the keep-singletons wrapper. */
class ComponentsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = GraftSession.local("components-spec")
  override def afterAll(): Unit = spark.stop()

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("200-node path collapses under default maxIter (log-round convergence)") {
    import spark.implicits._
    // 4× PropertySpec's path; naive min-flooding would need 200 rounds,
    // the star contraction must stay within the default 25 or throw.
    // smallGraphThreshold = 0 forces the DISTRIBUTED path — the default
    // would route 199 edges to the driver union-find
    val edges = (0L until 199L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(edges, smallGraphThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 200 && got.values.forall(_ == 0L))
  }

  test("duplicate, reversed and self-loop edges are tolerated") {
    val got = run(Seq((5L, 6L), (6L, 5L), (5L, 6L), (7L, 7L), (6L, 7L)))
    assert(got === Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("string node ids order lexicographically") {
    import spark.implicits._
    val edges = Seq(("beta", "alpha"), ("beta", "gamma"), ("x", "y")).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map("alpha" -> "alpha", "beta" -> "alpha",
      "gamma" -> "alpha", "x" -> "x", "y" -> "x"))
  }

  test("empty edge set yields an empty assignment") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty).count() === 0L)
  }

  test("assignComponentsOrSelf keeps singletons as their own cluster") {
    import spark.implicits._
    val nodes = (0L until 10L).toDF("id")
    val edges = Seq((1L, 4L), (4L, 8L)).toDF("id_a", "id_b")
    val got = Dedup.assignComponentsOrSelf(nodes, col("id"), edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (0L until 10L).map(i => i -> (if (Set(1L, 4L, 8L)(i)) 1L else i)).toMap
    assert(got === want)
  }
}
