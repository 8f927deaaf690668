package graft.graph

import graft.SparkSpec

/** Random-graph differential test: [[WebGraph.pageRank]] and
  * [[WebGraph.trustRank]] against a plain-Scala reference with the
  * same exact-integer semantics (the MergeFuzzSpec pattern). Catches
  * any divergence between the distributed join+agg formulation and
  * the definition — dangling targets, empty in-link sets, self-loops,
  * seed handling — across 25 seeded random graphs each.
  */
class PageRankFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val S = WebGraph.Scale

  private def refRanks(nodes: Seq[Long], edges: Seq[(Long, Long)],
      rounds: Int, seeds: Option[Set[Long]]): Map[Long, Long] = {
    val distinct = edges.distinct
    val out = distinct.groupBy(_._1).map { case (k, v) => k -> v.size }
    val teleDen = seeds.map(_.size.toLong).getOrElse(nodes.size.toLong)
    def tele(v: Long, full: Long): Long =
      if (seeds.forall(_.contains(v))) full / teleDen else 0L
    var r = nodes.map(v => v -> tele(v, S)).toMap
    for (_ <- 1 to rounds) {
      val in = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      for ((u, v) <- distinct) in(v) += r(u) / out(u)
      r = nodes.map(v =>
        v -> (tele(v, 15L * S / 100L) + 85L * in(v) / 100L)).toMap
    }
    r
  }

  private def randomGraph(rng: scala.util.Random)
      : (Seq[Long], Seq[(Long, Long)]) = {
    val n = 2 + rng.nextInt(29)
    val nodes = (1L to n).toSeq
    // duplicate edges on purpose: docEdges dedups, pageRank expects
    // distinct — the spec feeds raw pairs through distinct like callers
    val m = rng.nextInt(4 * n + 1)
    val edges = Seq.fill(m)(
      (1L + rng.nextInt(n), 1L + rng.nextInt(n)))
    (nodes, edges)
  }

  test("pageRank matches the plain-Scala reference on 25 random graphs") {
    val rng = new scala.util.Random(411)
    for (i <- 1 to 25) {
      val (nodes, edges) = randomGraph(rng)
      val rounds = 1 + rng.nextInt(4)
      val got = WebGraph.pageRank(nodes.toDF("node"),
          edges.distinct.toDF("src", "dst"), rounds)
        .as[(Long, Long)].collect().toMap
      val exp = refRanks(nodes, edges, rounds, None)
      assert(got == exp, s"graph $i (n=${nodes.size}, rounds=$rounds)")
    }
  }

  test("trustRank matches the plain-Scala reference on 25 random graphs") {
    val rng = new scala.util.Random(412)
    for (i <- 1 to 25) {
      val (nodes, edges) = randomGraph(rng)
      val rounds = 1 + rng.nextInt(4)
      val nSeeds = 1 + rng.nextInt(nodes.size)
      val seeds = rng.shuffle(nodes).take(nSeeds).toSet
      val got = WebGraph.trustRank(nodes.toDF("node"),
          seeds.toSeq.toDF("node"),
          edges.distinct.toDF("src", "dst"), rounds)
        .as[(Long, Long)].collect().toMap
      val exp = refRanks(nodes, edges, rounds, Some(seeds))
      assert(got == exp, s"graph $i (n=${nodes.size}, rounds=$rounds, " +
        s"seeds=$nSeeds)")
    }
  }
}
