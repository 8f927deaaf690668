package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{NumericType, StringType}

/** SQL table-valued entry points for the composite pipeline operators —
  * the `spark-sql` front door the scalar registrations in
  * [[GraftExtensions]] cannot provide. Each TVF takes table/view NAMES
  * and column names as string literals, resolves them through the
  * session catalog, and returns the SAME logical plan the Scala API
  * builds — so a pure-SQL user drives the dedup/ANN/packing operators
  * exactly as q101 drives MERGE:
  *
  * {{{
  * spark.sql("SELECT * FROM graft_near_duplicates('docs', 'doc_id', 'text', 0.5)")
  * spark.sql("SELECT * FROM graft_ann_topk('queries', 'corpus', 'vec_id', 'embedding', 10)")
  * spark.sql("SELECT * FROM graft_pack_sequences('docs', 'doc_id', 'text', 2048, 8)")
  * spark.sql("SELECT * FROM graft_semantic_dedup('embs', 'vec_id', 'embedding', 0.99, 16)")
  * spark.sql("SELECT * FROM graft_clean_corpus('docs', 'doc_id', 'text')")
  * spark.sql("SELECT * FROM graft_dsir_resample('raw', 'target', 'doc_id', 'text')")
  * spark.sql("SELECT * FROM graft_diversity_sample('embs', 'vec_id', 'embedding', 5)")
  * spark.sql("SELECT * FROM graft_source_drift('snapA', 'snapB', 'doc_id', 'source', 'text')")
  * spark.sql("SELECT * FROM graft_backoff_score('reference', 'docs', 'doc_id', 'text')")
  * spark.sql("SELECT * FROM graft_cross_matches('train', 'eval', 'doc_id', 'text', 0.5)")
  * spark.sql("SELECT * FROM graft_chunks('docs', 'doc_id', 'text', 2048, 1536)")
  * spark.sql("SELECT * FROM graft_length_batches('docs', 'doc_id', 'text', 32, 16)")
  * spark.sql("SELECT * FROM graft_table_at('/cat/root', 'dim_user', 3)")
  * spark.sql("SELECT * FROM graft_curriculum('docs', 'doc_id', 'text', 3, 5)")
  * spark.sql("SELECT * FROM graft_funnel('docs', 'doc_id', 'source', 'text')")
  * spark.sql("SELECT * FROM graft_upsample('docs', 'doc_id', 'weight_ppm')")
  * spark.sql("SELECT * FROM graft_token_shards('docs', 'doc_id', 'text', 8)")
  * spark.sql("SELECT * FROM graft_release_diff('rel_v1', 'rel_v2', 'doc_id')")
  * spark.sql("SELECT * FROM graft_scrub_cross('train', 'eval', 'doc_id', 'text', 8, 64)")
  * spark.sql("SELECT * FROM graft_calibrated_gate('docs', 'doc_id', 'source', 'text', 3, 4)")
  * spark.sql("SELECT * FROM graft_contamination_report('train', 'eval', 'doc_id', 'text', 8, 64)")
  * spark.sql("SELECT * FROM graft_rank_buckets('scored', 'doc_id', 'source', 'score', 3)")
  * spark.sql("SELECT * FROM graft_links('pages', 'doc_id', 'html')")
  * spark.sql("SELECT * FROM graft_pagerank('pages', 'doc_id', 'html', 5)")
  * spark.sql("SELECT * FROM graft_paragraph_scrub('docs', 'doc_id', 'text', 8)")
  * spark.sql("SELECT * FROM graft_trustrank('pages', 'seeds', 'doc_id', 'html', 5)")
  * spark.sql("SELECT * FROM graft_url_decisions('urls', 'rules')")
  * }}}
  *
  * Arguments must be literals (they configure the plan, they are not
  * data). `graft_ann_topk` trains its IVF-PQ index eagerly when the
  * query is ANALYZED (centroids/codebooks are driver-bounded state, the
  * same contract as the Scala path); the other TVFs are pure plan
  * construction.
  */
object GraftTableFunctions {

  private type Builder = Seq[Expression] => LogicalPlan

  private def str(e: Expression, usage: String): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$usage: expected a string literal, got $other")
  }

  private def dbl(e: Expression, usage: String): Double = e match {
    case l @ Literal(v, _: NumericType) if v != null =>
      l.eval() match {
        case d: java.lang.Number => d.doubleValue()
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case other => throw new IllegalArgumentException(
          s"$usage: expected a numeric literal, got $other")
      }
    case other => throw new IllegalArgumentException(
      s"$usage: expected a numeric literal, got $other")
  }

  private def int(e: Expression, usage: String): Int = {
    val d = dbl(e, usage)
    require(d == math.rint(d), s"$usage: expected an integer literal")
    d.toInt
  }

  private def plan(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  private val nearDuplicates: Builder = { args =>
    val u = "graft_near_duplicates(table, idCol, textCol[, threshold])"
    require(args.length == 3 || args.length == 4, u)
    val s = SparkSession.active
    val th = if (args.length == 4) dbl(args(3), u) else 0.5
    plan(graft.dedup.Dedup.minhashNearDuplicates(
      s.table(str(args.head, u)), str(args(1), u), str(args(2), u), th))
  }

  private val annTopK: Builder = { args =>
    val u = "graft_ann_topk(queriesTable, corpusTable, idCol, vecCol, k)"
    require(args.length == 5, u)
    val s = SparkSession.active
    plan(graft.similarity.Similarity.ivfPqTopKRefined(
      s.table(str(args.head, u)), s.table(str(args(1), u)),
      str(args(2), u), str(args(3), u), int(args(4), u)))
  }

  private val packSequences: Builder = { args =>
    val u = "graft_pack_sequences(table, idCol, textCol, seqLen, numGroups)"
    require(args.length == 5, u)
    val s = SparkSession.active
    plan(graft.pipeline.Packing.packSequences(
      s.table(str(args.head, u)), str(args(1), u), str(args(2), u),
      int(args(3), u), int(args(4), u)))
  }

  private val semanticDedup: Builder = { args =>
    val u = "graft_semantic_dedup(table, idCol, vecCol[, threshold[, c]])"
    require(args.length >= 3 && args.length <= 5, u)
    val s = SparkSession.active
    val th = if (args.length >= 4) dbl(args(3), u) else 0.99
    val c = if (args.length == 5) int(args(4), u) else 16
    plan(graft.similarity.Similarity.semanticDedup(
      s.table(str(args.head, u)), str(args(1), u), str(args(2), u),
      th, c))
  }

  private val cleanCorpus: Builder = { args =>
    val u = "graft_clean_corpus(table, idCol, textCol[, minQuality[, jaccardThreshold]])"
    require(args.length >= 3 && args.length <= 5, u)
    val s = SparkSession.active
    val cfg = graft.pipeline.CorpusPipeline.Config(
      minQuality =
        if (args.length >= 4) dbl(args(3), u)
        else graft.pipeline.CorpusPipeline.Config().minQuality,
      jaccardThreshold =
        if (args.length == 5) dbl(args(4), u)
        else graft.pipeline.CorpusPipeline.Config().jaccardThreshold)
    plan(graft.pipeline.CorpusPipeline.clean(
      s.table(str(args.head, u)), str(args(1), u), str(args(2), u), cfg))
  }

  private val release: Builder = { args =>
    val u = "graft_release(docsTable, evalTable, idCol, textCol[, minQuality])"
    require(args.length == 4 || args.length == 5, u)
    val s = SparkSession.active
    val cfg = graft.pipeline.CorpusPipeline.Config(
      minQuality =
        if (args.length == 5) dbl(args(4), u)
        else graft.pipeline.CorpusPipeline.Config().minQuality)
    plan(graft.pipeline.CorpusPipeline.release(
      s.table(str(args.head, u)), s.table(str(args(1), u)),
      str(args(2), u), str(args(3), u), cfg))
  }

  private val dsirResample: Builder = { args =>
    val u = "graft_dsir_resample(rawTable, targetTable, idCol, textCol" +
      "[, dim[, keepPpm]])"
    require(args.length >= 4 && args.length <= 6, u)
    val s = SparkSession.active
    val dim = if (args.length >= 5) int(args(4), u) else 1024
    val keepPpm = if (args.length == 6) int(args(5), u).toLong else 500000L
    plan(graft.pipeline.Dsir.resample(
      s.table(str(args.head, u)), s.table(str(args(1), u)),
      str(args(2), u), str(args(3), u), dim, keepPpm))
  }

  private val diversitySample: Builder = { args =>
    val u = "graft_diversity_sample(table, idCol, vecCol, perCluster[, c])"
    require(args.length == 4 || args.length == 5, u)
    val s = SparkSession.active
    val c = if (args.length == 5) int(args(4), u) else 16
    plan(graft.similarity.Similarity.diversitySample(
      s.table(str(args.head, u)), str(args(1), u), str(args(2), u),
      int(args(3), u), c))
  }

  private val sourceDrift: Builder = { args =>
    val u = "graft_source_drift(tableA, tableB, idCol, srcCol, textCol[, dim])"
    require(args.length == 5 || args.length == 6, u)
    val s = SparkSession.active
    val dim = if (args.length == 6) int(args(5), u) else 256
    plan(graft.quality.Drift.sourceDrift(
      s.table(str(args.head, u)), s.table(str(args(1), u)),
      str(args(2), u), str(args(3), u), str(args(4), u), dim))
  }

  private val backoffScore: Builder = { args =>
    val u = "graft_backoff_score(trainTable, docsTable, idCol, textCol)"
    require(args.length == 4, u)
    val s = SparkSession.active
    plan(graft.text.Repetition.backoffScore(
      s.table(str(args.head, u)), s.table(str(args(1), u)),
      str(args(2), u), str(args(3), u)))
  }

  private val crossMatches: Builder = { args =>
    val u = "graft_cross_matches(trainTable, evalTable, idCol, textCol[, threshold])"
    require(args.length == 4 || args.length == 5, u)
    val s = SparkSession.active
    val th = if (args.length == 5) dbl(args(4), u) else 0.5
    val id = str(args(2), u)
    val text = str(args(3), u)
    plan(graft.dedup.Dedup.crossCorpusMatches(
      s.table(str(args.head, u)), id, text,
      s.table(str(args(1), u)), id, text, th))
  }

  private val chunks: Builder = { args =>
    val u = "graft_chunks(table, idCol, textCol, window, stride)"
    require(args.length == 5, u)
    val s = SparkSession.active
    plan(graft.pipeline.Packing.chunkManifest(
      s.table(str(args.head, u)), str(args(1), u), str(args(2), u),
      int(args(3), u), int(args(4), u)))
  }

  private val lengthBatches: Builder = { args =>
    val u = "graft_length_batches(table, idCol, textCol, bucketWidth, batchSize)"
    require(args.length == 5, u)
    val s = SparkSession.active
    plan(graft.pipeline.Packing.lengthBatches(
      s.table(str(args.head, u)), str(args(1), u), str(args(2), u),
      int(args(3), u), int(args(4), u)))
  }

  private val curriculum: Builder = { args =>
    val u = "graft_curriculum(table, idCol, textCol[, epochs[, bands]])"
    require(args.length >= 3 && args.length <= 5, u)
    val s = SparkSession.active
    val epochs = if (args.length >= 4) int(args(3), u) else 3
    val bands = if (args.length == 5) int(args(4), u) else 5
    plan(graft.pipeline.Curriculum.schedule(
      s.table(str(args.head, u)), str(args(1), u), str(args(2), u),
      epochs, bands))
  }

  private val funnel: Builder = { args =>
    val u = "graft_funnel(table, idCol, srcCol, textCol[, minQuality])"
    require(args.length == 4 || args.length == 5, u)
    val s = SparkSession.active
    val cfg = graft.pipeline.CorpusPipeline.Config(
      minQuality =
        if (args.length == 5) dbl(args(4), u)
        else graft.pipeline.CorpusPipeline.Config().minQuality)
    plan(graft.pipeline.CorpusPipeline.funnelReport(
      s.table(str(args.head, u)), str(args(1), u), str(args(2), u),
      str(args(3), u), cfg))
  }

  private val upsample: Builder = { args =>
    val u = "graft_upsample(table, idCol, weightColOrPpm) — 3rd arg: a " +
      "column name (string literal) holding per-row ppm weights, or a " +
      "numeric literal ppm weight applied to every row"
    require(args.length == 3, u)
    val s = SparkSession.active
    val w = args(2) match {
      case Literal(v, StringType) if v != null =>
        org.apache.spark.sql.functions.col(v.toString)
      case other =>
        org.apache.spark.sql.functions.lit(dbl(other, u).toLong)
    }
    plan(graft.pipeline.Mixture.upsample(
      s.table(str(args.head, u)), str(args(1), u), w))
  }

  private val tokenShards: Builder = { args =>
    val u = "graft_token_shards(table, idCol, textCol, numShards)"
    require(args.length == 4, u)
    val s = SparkSession.active
    plan(graft.pipeline.Packing.tokenShards(
      s.table(str(args.head, u)), str(args(1), u), str(args(2), u),
      int(args(3), u)))
  }

  private val releaseDiff: Builder = { args =>
    val u = "graft_release_diff(prevTable, nextTable, idCol)"
    require(args.length == 3, u)
    val s = SparkSession.active
    plan(graft.pipeline.CorpusPipeline.releaseDiff(
      s.table(str(args.head, u)), s.table(str(args(1), u)),
      str(args(2), u)))
  }

  private val scrubCross: Builder = { args =>
    val u = "graft_scrub_cross(trainTable, evalTable, idCol, textCol" +
      "[, k[, maxDf]])"
    require(args.length >= 4 && args.length <= 6, u)
    val s = SparkSession.active
    val k = if (args.length >= 5) int(args(4), u) else 8
    val maxDf = if (args.length == 6) int(args(5), u).toLong else 0L
    val id = str(args(2), u)
    val text = str(args(3), u)
    plan(graft.dedup.Dedup.scrubCrossSpans(
      s.table(str(args.head, u)), id, text,
      s.table(str(args(1), u)), id, text, k, maxDf))
  }

  private val calibratedGate: Builder = { args =>
    val u = "graft_calibrated_gate(table, idCol, srcCol, textCol, " +
      "keepNum, keepDen)"
    require(args.length == 6, u)
    val s = SparkSession.active
    plan(graft.quality.Calibrate.topFractionBySource(
      s.table(str(args.head, u)), str(args(1), u), str(args(2), u),
      str(args(3), u), int(args(4), u).toLong, int(args(5), u).toLong))
  }

  private val contaminationReport: Builder = { args =>
    val u = "graft_contamination_report(trainTable, evalTable, idCol, " +
      "textCol[, k[, maxDf]])"
    require(args.length >= 4 && args.length <= 6, u)
    val s = SparkSession.active
    val k = if (args.length >= 5) int(args(4), u) else 8
    val maxDf = if (args.length == 6) int(args(5), u).toLong else 0L
    val id = str(args(2), u)
    val text = str(args(3), u)
    plan(graft.dedup.Dedup.crossContaminationReport(
      s.table(str(args.head, u)), id, text,
      s.table(str(args(1), u)), id, text, k, maxDf))
  }

  private val rankBuckets: Builder = { args =>
    val u = "graft_rank_buckets(table, idCol, srcCol, scoreCol, nBuckets)"
    require(args.length == 5, u)
    val s = SparkSession.active
    plan(graft.quality.Calibrate.rankBucketsBySource(
      s.table(str(args.head, u)), str(args(1), u), str(args(2), u),
      str(args(3), u), int(args(4), u)))
  }

  private val htmlExtract: Builder = { args =>
    val u = "graft_html_extract(table, idCol, htmlCol[, minTextLen[, " +
      "linkNum, linkDen]])"
    require(args.length == 3 || args.length == 4 || args.length == 6, u)
    val s = SparkSession.active
    val minLen = if (args.length >= 4) int(args(3), u) else 20
    val (num, den) =
      if (args.length == 6) (int(args(4), u), int(args(5), u)) else (1, 3)
    plan(graft.text.Html.extract(s.table(str(args.head, u)),
      str(args(1), u), str(args(2), u), minLen, num, den))
  }

  private val linkGraph: Builder = { args =>
    val u = "graft_links(pagesTable, idCol, htmlCol)"
    require(args.length == 3, u)
    val s = SparkSession.active
    plan(graft.graph.WebGraph.links(s.table(str(args.head, u)),
      str(args(1), u), str(args(2), u)))
  }

  private val pagerank: Builder = { args =>
    val u = "graft_pagerank(pagesTable, idCol, htmlCol[, rounds])"
    require(args.length == 3 || args.length == 4, u)
    val s = SparkSession.active
    val rounds = if (args.length == 4) int(args(3), u) else 5
    val pages = s.table(str(args.head, u))
    val nodes = pages.select(
      org.apache.spark.sql.functions.col(str(args(1), u)).as("node"))
    val edges = graft.graph.WebGraph.docEdges(
      graft.graph.WebGraph.links(pages, str(args(1), u), str(args(2), u)))
    plan(graft.graph.WebGraph.pageRank(nodes, edges, rounds))
  }

  private val resolvedLinks: Builder = { args =>
    val u = "graft_resolved_links(pagesTable, idCol, urlCol, htmlCol)"
    require(args.length == 4, u)
    val s = SparkSession.active
    plan(graft.graph.WebGraph.resolvedLinks(s.table(str(args.head, u)),
      str(args(1), u), str(args(2), u), str(args(3), u)))
  }

  private val pagerankConverged: Builder = { args =>
    val u = "graft_pagerank_converged(pagesTable, idCol, htmlCol" +
      "[, maxRounds[, epsDiv]])"
    require(args.length >= 3 && args.length <= 5, u)
    val s = SparkSession.active
    val maxRounds = if (args.length >= 4) int(args(3), u) else 25
    val epsDiv = if (args.length == 5) int(args(4), u).toLong else 100000L
    val pages = s.table(str(args.head, u))
    val nodes = pages.select(
      org.apache.spark.sql.functions.col(str(args(1), u)).as("node"))
    val edges = graft.graph.WebGraph.docEdges(
      graft.graph.WebGraph.links(pages, str(args(1), u), str(args(2), u)))
    plan(graft.graph.WebGraph.pageRankConverged(nodes, edges,
      maxRounds, epsDiv))
  }

  private val resolvedLinksBase: Builder = { args =>
    val u = "graft_resolved_links_base(pagesTable, idCol, urlCol, htmlCol)"
    require(args.length == 4, u)
    val s = SparkSession.active
    plan(graft.graph.WebGraph.resolvedLinksBase(
      s.table(str(args.head, u)),
      str(args(1), u), str(args(2), u), str(args(3), u)))
  }

  private val robotsRules: Builder = { args =>
    val u = "graft_robots_rules(robotsTable, hostCol, txtCol, agent)"
    require(args.length == 4, u)
    val s = SparkSession.active
    plan(graft.graph.WebGraph.parseRobotsFor(s.table(str(args.head, u)),
      str(args(1), u), str(args(2), u), str(args(3), u)))
  }

  private val crawlDelays: Builder = { args =>
    val u = "graft_crawl_delays(robotsTable, hostCol, txtCol, agent)"
    require(args.length == 4, u)
    val s = SparkSession.active
    plan(graft.graph.WebGraph.crawlDelays(s.table(str(args.head, u)),
      str(args(1), u), str(args(2), u), str(args(3), u)))
  }

  private val sitemapsNested: Builder = { args =>
    val u = "graft_sitemaps_nested(rootsTable, hostCol, xmlCol, " +
      "fetchedTable, urlCol, fetchedXmlCol)"
    require(args.length == 6, u)
    val s = SparkSession.active
    plan(graft.graph.WebGraph.parseSitemapsNested(
      s.table(str(args.head, u)), str(args(1), u), str(args(2), u),
      s.table(str(args(3), u)), str(args(4), u), str(args(5), u)))
  }

  private val sitemapTree: Builder = { args =>
    val u = "graft_sitemap_tree(rootsTable, hostCol, xmlCol, " +
      "fetchedTable, urlCol, fetchedXmlCol[, maxDepth])"
    require(args.length == 6 || args.length == 7, u)
    val s = SparkSession.active
    val depth = if (args.length == 7) int(args(6), u) else 8
    plan(graft.graph.WebGraph.parseSitemapsRecursive(
      s.table(str(args.head, u)), str(args(1), u), str(args(2), u),
      s.table(str(args(3), u)), str(args(4), u), str(args(5), u),
      depth))
  }

  private val langClassify: Builder = { args =>
    val u = "graft_lang_classify(seedsTable, idCol, labelCol, " +
      "textCol, docsTable)"
    require(args.length == 5, u)
    val s = SparkSession.active
    val id = str(args(1), u)
    val text = str(args(3), u)
    val model = graft.text.LangClassifier.fit(
      s.table(str(args.head, u)), id, str(args(2), u), text)
    plan(graft.text.LangClassifier.classify(
      s.table(str(args(4), u)), id, text, model))
  }

  private val routeLanguage: Builder = { args =>
    val u = "graft_route_language(seedsTable, idCol, labelCol, " +
      "textCol, docsTable, keepCsv)"
    require(args.length == 6, u)
    val s = SparkSession.active
    val id = str(args(1), u)
    val text = str(args(3), u)
    val keep = str(args(5), u).split(",").map(_.trim)
      .filter(_.nonEmpty).toSeq
    require(keep.nonEmpty, u + ": keepCsv must name at least one label")
    val model = graft.text.LangClassifier.fit(
      s.table(str(args.head, u)), id, str(args(2), u), text)
    plan(graft.pipeline.CorpusPipeline.routeByLanguage(
      s.table(str(args(4), u)), id, text,
      graft.pipeline.CorpusPipeline.Config(langGate =
        Some(graft.pipeline.CorpusPipeline.LangGate(model, keep)))))
  }

  private val gopherRules: Builder = { args =>
    val u = "graft_gopher_rules(table, idCol, textCol[, minTok[, maxTok]])"
    require(args.length >= 3 && args.length <= 5, u)
    val s = SparkSession.active
    val minTok = if (args.length >= 4) int(args(3), u).toLong else 50L
    val maxTok = if (args.length == 5) int(args(4), u).toLong else 100000L
    plan(graft.text.GopherQuality.signals(s.table(str(args.head, u)),
      str(args(1), u), str(args(2), u), minTok, maxTok))
  }

  private val c4Clean: Builder = { args =>
    val u = "graft_c4_clean(table, idCol, textCol[, minWordsPerLine[, " +
      "minSentences]])"
    require(args.length >= 3 && args.length <= 5, u)
    val s = SparkSession.active
    val minW = if (args.length >= 4) int(args(3), u) else 3
    val minS = if (args.length == 5) int(args(4), u).toLong else 5L
    plan(graft.text.C4Quality.clean(s.table(str(args.head, u)),
      str(args(1), u), str(args(2), u), Nil, minW, minS))
  }

  private val canonicalLinks: Builder = { args =>
    val u = "graft_canonical_links(pagesTable, idCol, urlCol, htmlCol)"
    require(args.length == 4, u)
    val s = SparkSession.active
    plan(graft.graph.WebGraph.canonicalLinks(
      s.table(str(args.head, u)), str(args(1), u), str(args(2), u),
      str(args(3), u)))
  }

  private val paragraphScrub: Builder = { args =>
    val u = "graft_paragraph_scrub(table, idCol, textCol, maxDf)"
    require(args.length == 4, u)
    val s = SparkSession.active
    plan(graft.dedup.Dedup.scrubFrequentParagraphs(
      s.table(str(args.head, u)), str(args(1), u), str(args(2), u),
      int(args(3), u).toLong))
  }

  private val trustrank: Builder = { args =>
    val u = "graft_trustrank(pagesTable, seedsTable, idCol, htmlCol[, rounds])"
    require(args.length == 4 || args.length == 5, u)
    val s = SparkSession.active
    val rounds = if (args.length == 5) int(args(4), u) else 5
    val pages = s.table(str(args.head, u))
    val idc = str(args(2), u)
    val nodes = pages.select(
      org.apache.spark.sql.functions.col(idc).as("node"))
    val seeds = s.table(str(args(1), u)).select(
      org.apache.spark.sql.functions.col(idc).as("node"))
    val edges = graft.graph.WebGraph.docEdges(
      graft.graph.WebGraph.links(pages, idc, str(args(3), u)))
    plan(graft.graph.WebGraph.trustRank(nodes, seeds, edges, rounds))
  }

  private val urlDecisions: Builder = { args =>
    val u = "graft_url_decisions(urlsTable, rulesTable)"
    require(args.length == 2, u)
    val s = SparkSession.active
    plan(graft.graph.WebGraph.urlDecisions(
      s.table(str(args.head, u)), s.table(str(args(1), u))))
  }

  private val tableAt: Builder = { args =>
    val u = "graft_table_at(catalogRoot, table[, version])"
    require(args.length == 2 || args.length == 3, u)
    val s = SparkSession.active
    val cat = new graft.catalog.ParquetCatalog(s, str(args.head, u))
    val name = str(args(1), u)
    plan(
      if (args.length == 3) cat.tableAsOfVersion(name, int(args(2), u).toLong)
      else cat.table(name))
  }

  /** All SQL-exposed table functions. */
  private[functions] val builders: Seq[(String, Builder)] = Seq(
    "graft_near_duplicates" -> nearDuplicates,
    "graft_ann_topk" -> annTopK,
    "graft_pack_sequences" -> packSequences,
    "graft_semantic_dedup" -> semanticDedup,
    "graft_clean_corpus" -> cleanCorpus,
    "graft_release" -> release,
    "graft_dsir_resample" -> dsirResample,
    "graft_diversity_sample" -> diversitySample,
    "graft_source_drift" -> sourceDrift,
    "graft_backoff_score" -> backoffScore,
    "graft_cross_matches" -> crossMatches,
    "graft_chunks" -> chunks,
    "graft_length_batches" -> lengthBatches,
    "graft_curriculum" -> curriculum,
    "graft_funnel" -> funnel,
    "graft_upsample" -> upsample,
    "graft_token_shards" -> tokenShards,
    "graft_release_diff" -> releaseDiff,
    "graft_scrub_cross" -> scrubCross,
    "graft_calibrated_gate" -> calibratedGate,
    "graft_contamination_report" -> contaminationReport,
    "graft_rank_buckets" -> rankBuckets,
    "graft_html_extract" -> htmlExtract,
    "graft_links" -> linkGraph,
    "graft_resolved_links" -> resolvedLinks,
    "graft_resolved_links_base" -> resolvedLinksBase,
    "graft_robots_rules" -> robotsRules,
    "graft_crawl_delays" -> crawlDelays,
    "graft_sitemaps_nested" -> sitemapsNested,
    "graft_sitemap_tree" -> sitemapTree,
    "graft_lang_classify" -> langClassify,
    "graft_route_language" -> routeLanguage,
    "graft_gopher_rules" -> gopherRules,
    "graft_c4_clean" -> c4Clean,
    "graft_canonical_links" -> canonicalLinks,
    "graft_pagerank" -> pagerank,
    "graft_pagerank_converged" -> pagerankConverged,
    "graft_paragraph_scrub" -> paragraphScrub,
    "graft_trustrank" -> trustrank,
    "graft_url_decisions" -> urlDecisions,
    "graft_table_at" -> tableAt)
}
