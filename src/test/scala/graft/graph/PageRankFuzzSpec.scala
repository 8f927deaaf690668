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

  private def refConverged(nodes: Seq[Long], edges: Seq[(Long, Long)],
      maxRounds: Int, epsDiv: Long): (Map[Long, Long], Int) = {
    val distinct = edges.distinct
    val out = distinct.groupBy(_._1).map { case (k, v) => k -> v.size }
    val n = nodes.size.toLong
    val eps = S / epsDiv
    var r = nodes.map(v => v -> S / n).toMap
    var k = 0
    var done = false
    while (k < maxRounds && !done) {
      val dang = nodes.filter(v => !out.contains(v)).map(r).sum
      val in = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      for ((u, v) <- distinct) in(v) += r(u) / out(u)
      val next = nodes.map(v =>
        v -> (15L * S / (100L * n) +
          85L * (in(v) + dang / n) / 100L)).toMap
      val delta = nodes.map(v => (next(v) - r(v)).abs).sum
      done = delta <= eps
      r = next
      k += 1
    }
    (r, k)
  }

  test("pageRankConverged matches the reference and conserves mass " +
      "on 25 random graphs") {
    val rng = new scala.util.Random(413)
    for (i <- 1 to 25) {
      val (nodes, edges) = randomGraph(rng)
      val epsDiv = Seq(5L, 10L, 20L)(rng.nextInt(3))
      val got = WebGraph.pageRankConverged(nodes.toDF("node"),
          edges.distinct.toDF("src", "dst"), maxRounds = 15, epsDiv)
        .as[(Long, Long, Int)].collect()
      val gotRanks = got.map(t => t._1 -> t._2).toMap
      val gotRounds = got.map(_._3).distinct.toSeq
      val (exp, expRounds) = refConverged(nodes, edges, 15, epsDiv)
      assert(gotRanks == exp && gotRounds == Seq(expRounds),
        s"graph $i (n=${nodes.size}, epsDiv=$epsDiv)")
      // mass conservation: truncation only ever LOSES ulps, and the
      // dangling redistribution keeps the loss bounded by the per-round
      // division count amplified by the 1/0.15 equilibrium factor —
      // mass never leaks wholesale the way plain pageRank drops
      // dangling rank
      val total = gotRanks.values.sum
      val bound = 7L * (edges.distinct.size + 4L * nodes.size + 100L)
      assert(total <= S && S - total <= bound,
        s"graph $i mass $total vs $S (bound $bound)")
    }
  }

  private def refHits(nodes: Seq[Long], edges: Seq[(Long, Long)],
      rounds: Int): Map[Long, (Long, Long)] = {
    val distinct = edges.distinct
    val n = nodes.size.toLong
    def norm(m: Map[Long, Long]): Map[Long, Long] = {
      val d = math.max(m.values.sum / S, 1L)
      m.map { case (k, v) => k -> v / d }
    }
    var hub = nodes.map(v => v -> S / n).toMap
    var auth = hub
    for (_ <- 1 to rounds) {
      val ra = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      for ((u, v) <- distinct) ra(v) += hub(u)
      auth = norm(nodes.map(v => v -> ra(v)).toMap)
      val rh = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      for ((u, v) <- distinct) rh(u) += auth(v)
      hub = norm(nodes.map(v => v -> rh(v)).toMap)
    }
    nodes.map(v => v -> (hub(v), auth(v))).toMap
  }

  test("hits matches the plain-Scala reference on 25 random graphs") {
    val rng = new scala.util.Random(414)
    for (i <- 1 to 25) {
      val (nodes, edges) = randomGraph(rng)
      val rounds = 1 + rng.nextInt(4)
      val got = WebGraph.hits(nodes.toDF("node"),
          edges.distinct.toDF("src", "dst"), rounds)
        .as[(Long, Long, Long)].collect()
        .map(t => t._1 -> (t._2, t._3)).toMap
      val exp = refHits(nodes, edges, rounds)
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
