package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** [EXT] Link-graph operators for web-corpus curation: anchor extraction,
  * host-level edge aggregation, and fixed-iteration PageRank — the
  * link-based quality signal web-scale corpus builders rank hosts with
  * (the Common-Crawl-style host ranking that feeds crawl prioritization
  * and source-quality weighting), composing with the URL family
  * ([[TextAnalysis.urlHost]]/[[TextAnalysis.canonicalizeUrl]]) and the
  * block-tier HTML extraction.
  *
  * Determinism doctrine: ranks live in integer NANOS of probability mass
  * (Σ init = ~1e9) and every per-edge contribution is an integer floor
  * division — aggregation-order-independent exact integers end to end, so
  * a DuckDB oracle replays all iterations bit-for-bit (`div` on
  * non-negative longs ≡ DuckDB `//`). ANSI mode turns any overflow into a
  * loud error rather than silent wraparound (per-edge products stay in
  * range while rank ≤ 1e9 and edge weight < ~9e9 — far above any real
  * host-pair link count).
  */
object LinkGraph {

  /** href targets of anchor tags: group 1 of the quoted href attribute.
    * RE2-compatible (lazy quantifier + group, no backreferences — the
    * [[TextAnalysis.htmlToText]] rule), so the oracle runs the identical
    * pattern. Unquoted/single-quoted hrefs are out of scope by contract
    * (the corpus synthesizers emit quoted attributes; a production crawl
    * normalizes at fetch time). */
  def extractHrefs(html: Column): Column =
    regexp_extract_all(html,
      lit("(?is)<a\\s[^>]*?href\\s*=\\s*\"([^\"]*)\""), lit(1))

  /** host-level link edges (src_host, dst_host, n_links): explode each
    * page's hrefs, reduce targets to their lowercased host, and count.
    * Schemeless/relative hrefs (no extractable host) and SELF-LOOPS are
    * dropped — a host linking to itself carries no cross-host authority
    * signal and would otherwise let template navigation dominate the
    * graph. One shuffle keyed on the (src, dst) pair — high cardinality,
    * map-side combined; the explode's output is the answer's own size. */
  def hostEdges(pages: DataFrame, srcHostCol: String,
                htmlCol: String): DataFrame =
    pages.select(col(srcHostCol).as("src_host"),
        explode(extractHrefs(col(htmlCol))).as("__url"))
      .select(col("src_host"),
        TextAnalysis.urlHost(col("__url")).as("dst_host"))
      .filter(col("dst_host") =!= "" && col("dst_host") =!= col("src_host"))
      .groupBy("src_host", "dst_host")
      .agg(count(lit(1)).cast(LongType).as("n_links"))

  /** the anchor-pair pattern: group 1 = quoted href, group 2 = the
    * anchor's inner text (lazy up to the closing tag). Shared between the
    * two positional extract_all passes and the oracle replay. */
  private[graft] val AnchorPairPattern =
    "(?is)<a\\s[^>]*?href\\s*=\\s*\"([^\"]*)\"[^>]*>(.*?)</a\\s*>"

  /** anchor-TEXT postings (dst_host, anchor, n): what the web calls a
    * target, aggregated by target host — the classic retrieval-corpus
    * signal (anchor text ≈ human-written queries for the page; the
    * MS-MARCO/ORCAS-style mining step). Hrefs and inner texts come from
    * two positional `regexp_extract_all` passes over the SAME pattern,
    * zipped — still a pure codegen'd projection (no UDF, no parse state),
    * and the oracle replays both passes identically. Unlike [[hostEdges]],
    * SELF-LOOPS are KEPT: a site's own navigation text still describes
    * the target page (different semantics from authority flow — anchor
    * text is content, not endorsement). Hostless targets and whitespace-
    * only anchors drop. One shuffle on the (dst_host, anchor) pair —
    * high cardinality, map-side combined. */
  def anchorTexts(pages: DataFrame, htmlCol: String): DataFrame =
    pages.select(explode(zip_with(
        regexp_extract_all(col(htmlCol), lit(AnchorPairPattern), lit(1)),
        regexp_extract_all(col(htmlCol), lit(AnchorPairPattern), lit(2)),
        (u, t) => struct(u.as("u"), t.as("t")))).as("__a"))
      .select(TextAnalysis.urlHost(col("__a.u")).as("dst_host"),
        trim(lower(col("__a.t"))).as("anchor"))
      .filter(col("dst_host") =!= "" && col("anchor") =!= "")
      .groupBy("dst_host", "anchor")
      .agg(count(lit(1)).cast(LongType).as("n"))

  /** fixed-iteration weighted PageRank over host edges, exact-integer
    * deterministic: rank_{t+1}(v) = (1−d)/N + d · Σ_{u→v}
    * rank_t(u) · w(u,v) / out(u), with d = 17/20 (0.85) kept as an
    * integer ratio, every rank in nanos, and every division an integer
    * floor — so the emitted ranks are EXACTLY replayable (and the oracle
    * unrolls the same iterations in SQL). Dangling mass (hosts with no
    * out-edges) is not redistributed — the standard simplified variant;
    * at the ranking use case (relative host ordering) the omission is
    * immaterial and keeps every iteration one join + one aggregate.
    *
    * Scale shape: per iteration, one equi-join of the rank table to the
    * edge table on src (rank/out-degree tables are HOSTS-sized — AQE
    * broadcasts them at any realistic host count; the EDGE table, the big
    * side, is never re-keyed) and one map-side-combined aggregate on dst.
    * Lineage is localCheckpoint'd per iteration — iterative plans
    * otherwise nest exponentially (the componentLabels doctrine). N (the
    * node count) is one tiny distinct-count action at call time, the
    * offline-rates shape. */
  def pageRankHosts(edges: DataFrame, iterations: Int = 3): DataFrame = {
    require(iterations >= 1 && iterations <= 20,
      s"pageRankHosts: iterations must be in [1,20], got $iterations")
    val e0 = edges
      .select(col("src_host"), col("dst_host"),
        col("n_links").cast(LongType).as("n_links"))
      .filter(col("src_host") =!= col("dst_host"))
      .localCheckpoint() // reused every iteration: scan once
    val out = e0.groupBy("src_host")
      .agg(sum("n_links").as("__out")).localCheckpoint()
    // fold the LOOP-INVARIANT out-degree join into the edge table ONCE
    // (r22, guide §2.4): e⋈out inside the loop re-built the same broadcast
    // relation every iteration — one join (and its broadcast-build job)
    // per iteration for a table that never changes.
    val e = e0.join(out, Seq("src_host")).localCheckpoint()
    val nodes = e0.select(col("src_host").as("host"))
      .unionAll(e0.select(col("dst_host").as("host")))
      .distinct().localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pageRankHosts: empty edge set")
    val init = 1000000000L / n
    val base = (3L * 1000000000L) / (20L * n) // (1−d)/N in nanos, d=17/20
    var ranks = nodes.withColumn("rank_nanos", lit(init))
    (1 to iterations).foreach { _ =>
      val contribs = e
        .join(ranks.withColumnRenamed("host", "src_host"), Seq("src_host"))
        .select(col("dst_host").as("host"),
          expr("(rank_nanos * n_links) div __out").as("__c"))
      val agged = contribs.groupBy("host").agg(sum("__c").as("__sum"))
      ranks = nodes.join(agged, Seq("host"), "left")
        .select(col("host"),
          (lit(base) +
            expr("(17 * coalesce(__sum, CAST(0 AS BIGINT))) div 20"))
            .cast(LongType).as("rank_nanos"))
        .localCheckpoint()
    }
    ranks.select(col("host"), col("rank_nanos"))
  }

  /** [[pageRankHosts]] with the dangling-mass term RESTORED: hosts with no
    * out-edges (link sinks — in a real web graph, a large fraction) leak
    * their whole rank each iteration under the simplified variant, so total
    * mass decays and ranks are not comparable across graphs or iteration
    * counts. Here each iteration redistributes the danglings' mass
    * uniformly: rank_{t+1}(v) = (1−d)/N + d·Σ contribs + d·D_t/N with
    * D_t = Σ_{dangling u} rank_t(u) — the full Brin-Page random-surfer
    * model. Still exact-integer: D_t is a single hosts-sized aggregate
    * (one extra tiny job per iteration, broadcast back as a 1-row frame),
    * and the per-node dangling share is one more integer floor division
    * ((17·D_t) div (20·N)), so the oracle unrolls bit-for-bit as before.
    *
    * Scale shape unchanged from [[pageRankHosts]]: the edge table is never
    * re-keyed; the additions are hosts-sized (the anti-join against the
    * out-degree table) or 1-row (the broadcast scalar). */
  def pageRankHostsDangling(edges: DataFrame, iterations: Int = 3): DataFrame =
    pageRankDanglingLoop(edges, iterations)._1

  /** per-iteration convergence evidence for [[pageRankHostsDangling]]:
    * (iteration, dangling_in_nanos, l1_delta_nanos) where
    * dangling_in_nanos = D_{t−1} (the mass redistributed INTO that
    * iteration) and l1_delta_nanos = Σ_v |rank_t(v) − rank_{t−1}(v)| — the
    * standard stopping diagnostic, so callers pick `iterations` from a
    * measured decay curve instead of folklore. Exact integers end to end
    * (sums of abs-differences of nanos), so the report is oracle-pinnable
    * like the ranks themselves. Output is iterations-sized. */
  def pageRankDanglingReport(edges: DataFrame, iterations: Int = 3): DataFrame =
    pageRankDanglingLoop(edges, iterations)._2

  private def pageRankDanglingLoop(edges: DataFrame,
                                   iterations: Int): (DataFrame, DataFrame) = {
    require(iterations >= 1 && iterations <= 20,
      s"pageRankHostsDangling: iterations must be in [1,20], got $iterations")
    val e0 = edges
      .select(col("src_host"), col("dst_host"),
        col("n_links").cast(LongType).as("n_links"))
      .filter(col("src_host") =!= col("dst_host"))
      .localCheckpoint()
    val out = e0.groupBy("src_host")
      .agg(sum("n_links").as("__out")).localCheckpoint()
    // loop-invariant out-degree join hoisted out of the loop — see
    // [[pageRankHosts]] (r22, guide §2.4)
    val e = e0.join(out, Seq("src_host")).localCheckpoint()
    val nodes = e0.select(col("src_host").as("host"))
      .unionAll(e0.select(col("dst_host").as("host")))
      .distinct().localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pageRankHostsDangling: empty edge set")
    val init = 1000000000L / n
    val base = (3L * 1000000000L) / (20L * n) // (1−d)/N in nanos, d=17/20
    var ranks = nodes.withColumn("rank_nanos", lit(init)).localCheckpoint()
    val reports = Vector.newBuilder[DataFrame]
    (1 to iterations).foreach { k =>
      // D_{t−1}: rank mass sitting on hosts with no out-edge — one
      // hosts-sized anti-join + scalar aggregate, broadcast back
      val dang = ranks
        .join(out.select(col("src_host").as("host")), Seq("host"), "left_anti")
        .agg(coalesce(sum("rank_nanos"), lit(0L)).cast(LongType).as("__dang"))
      val contribs = e
        .join(ranks.withColumnRenamed("host", "src_host"), Seq("src_host"))
        .select(col("dst_host").as("host"),
          expr("(rank_nanos * n_links) div __out").as("__c"))
      val agged = contribs.groupBy("host").agg(sum("__c").as("__sum"))
      val next = nodes.join(agged, Seq("host"), "left")
        .crossJoin(broadcast(dang))
        .select(col("host"),
          (lit(base) +
            expr("(17 * coalesce(__sum, CAST(0 AS BIGINT))) div 20") +
            expr(s"(17 * __dang) div ${20L * n}"))
            .cast(LongType).as("rank_nanos"))
        .localCheckpoint()
      reports += next
        .join(ranks.withColumnRenamed("rank_nanos", "__prev"), Seq("host"))
        .agg(sum(abs(col("rank_nanos") - col("__prev")))
          .cast(LongType).as("l1_delta_nanos"))
        .crossJoin(broadcast(dang))
        .select(lit(k.toLong).as("iteration"),
          col("__dang").as("dangling_in_nanos"), col("l1_delta_nanos"))
      ranks = next
    }
    (ranks.select(col("host"), col("rank_nanos")),
      reports.result().reduce(_ unionByName _).orderBy("iteration"))
  }
}
