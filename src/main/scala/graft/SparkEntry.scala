package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract (see /root/repo/SURVEY.md §7 + the builder prompt):
  * `queries` = one entry per implemented operator; `oracleSql` = the ANSI
  * SQL DuckDB equivalent over the same parquet tables (omitted only for
  * ops whose semantics SQL can't express — those get rows-only checks and
  * stronger ScalaTest assertions instead).
  */
object SparkEntry {

  /** Flagship: disjunctive BM25 top-10 through the full inverted-index +
    * block-max-WAND read path over the documents table.
    */
  def entry(spark: SparkSession): DataFrame =
    DocSearchOps.searchOr(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- the search engine itself (SURVEY.md §2.5/§2.6) --
    "search_term_bm25" -> (DocSearchOps.searchTerm(_, _)),
    "replication_tail" -> ((s, d) => DocSearchOps.replicationTail(s, d)),
    "search_explain" -> ((s, d) => DocSearchOps.searchExplain(s, d)),
    "search_covering" -> ((s, d) => DocSearchOps.searchCovering(s, d)),
    "search_boolean_sim" -> ((s, d) => DocSearchOps.searchBooleanSim(s, d)),
    "suggest_fuzzy" -> ((s, d) => DocSearchOps.suggestFuzzy(s, d)),
    "suggest_fuzzy_transpose" -> ((s, d) => DocSearchOps.suggestFuzzyTranspose(s, d)),
    "mlt_interesting_terms" -> ((s, d) =>
      DocSearchOps.mltInterestingTerms(s, d)),
    "chunk_documents" -> ((s, d) => PipelineOps.chunkDocuments(s, d)),
    "cluster_assign" -> ((s, d) => ClassifyOps.clusterAssign(s, d)),
    "search_backup_restore" -> (DocSearchOps.searchRestored(_, _)),
    "search_or_bm25" -> (DocSearchOps.searchOr(_, _)),
    "search_and_bm25" -> (DocSearchOps.searchAnd(_, _)),
    "search_not_bm25" -> (DocSearchOps.searchNot(_, _)),
    "search_filtered_bm25" -> (DocSearchOps.searchFiltered(_, _)),
    "search_prefix" -> (DocSearchOps.searchPrefix(_, _)),
    "search_dismax" -> (DocSearchOps.searchDismax(_, _)),
    "search_boosted" -> (DocSearchOps.searchBoosted(_, _)),
    "search_phrase" -> ((s, d) => DocSearchOps.searchPhrase(s, d)),
    "search_span_first" -> ((s, d) => DocSearchOps.searchSpanFirst(s, d)),
    "search_span_near" -> ((s, d) => DocSearchOps.searchSpanNear(s, d)),
    "search_span_not" -> ((s, d) => DocSearchOps.searchSpanNot(s, d)),
    "search_span_near_phrase" -> ((s, d) => DocSearchOps.searchSpanNearPhrase(s, d)),
    "search_span_near_unordered" -> ((s, d) =>
      DocSearchOps.searchSpanNear(s, d,
        terms = Seq("sort", "merge", "window"), slop = 6, ordered = false)),
    "search_span_or" -> ((s, d) => DocSearchOps.searchSpanOr(s, d)),
    "search_span_or_near" -> ((s, d) => DocSearchOps.searchSpanOrNear(s, d)),
    "search_span_not_nested" -> ((s, d) =>
      DocSearchOps.searchSpanNotNested(s, d)),
    "search_span_containing" -> ((s, d) => DocSearchOps.searchSpanContaining(s, d)),
    "search_span_within" -> ((s, d) => DocSearchOps.searchSpanWithin(s, d)),
    "search_span_posrange" -> ((s, d) => DocSearchOps.searchSpanPosRange(s, d)),
    "search_span_multiterm" -> ((s, d) => DocSearchOps.searchSpanMultiTerm(s, d)),
    "search_surround_qp" -> ((s, d) => DocSearchOps.searchSurround(s, d)),
    "facet_dynamic_range" -> ((s, d) => RelationalOps.facetDynamicRange(s, d)),
    "facet_relatedness" -> ((s, d) => RelationalOps.facetRelatedness(s, d)),
    "facet_exclude_tags" -> ((s, d) => RelationalOps.facetExcludeTags(s, d)),
    "facet_range_date" -> ((s, d) => RelationalOps.facetRangeDate(s, d)),
    "facet_refined_topk" -> ((s, d) => RelationalOps.facetRefinedTopk(s, d)),
    "transform_child_docs" -> ((s, d) => RelationalOps.transformChildDocs(s, d)),
    "analysis_stem_override" -> ((s, d) => AnalysisOps.stemOverride(s, d)),
    "ml_train_logreg" -> ((s, d) => MlOps.trainLogReg(s, d)),
    "ml_features_ig" -> ((s, d) => MlOps.featuresIg(s, d)),
    "ml_predict" -> ((s, d) => MlOps.predictLogReg(s, d)),
    "stream_random" -> ((s, d) => RelationalOps.streamRandom(s, d)),
    "source_json_props" -> ((s, d) => RelationalOps.sourceJsonProps(s, d)),
    "analysis_ngram" -> ((s, d) => AnalysisOps.ngramFilter(s, d)),
    "search_external_boost" -> ((s, d) => DocSearchOps.searchExternalBoost(s, d)),
    "interval_ordered" -> ((s, d) => DocSearchOps.intervalOrdered(s, d)),
    "interval_unordered" -> ((s, d) => DocSearchOps.intervalUnordered(s, d)),
    "interval_containing" -> ((s, d) => DocSearchOps.intervalContaining(s, d)),
    "interval_not_containing" -> ((s, d) =>
      DocSearchOps.intervalContaining(s, d, negate = true)),
    "interval_before" -> ((s, d) => DocSearchOps.intervalBefore(s, d)),
    "interval_after" -> ((s, d) => DocSearchOps.intervalAfter(s, d)),
    "interval_contained_by" -> ((s, d) => DocSearchOps.intervalContainedBy(s, d)),
    "interval_or" -> ((s, d) => DocSearchOps.intervalOr(s, d)),
    "interval_overlapping" -> ((s, d) => DocSearchOps.intervalOverlapping(s, d)),
    "classify_knn" -> ((s, d) => ClassifyOps.classifyKnn(s, d)),
    "classify_naive_bayes" -> ((s, d) => ClassifyOps.classifyNaiveBayes(s, d)),
    "percolate_monitor" -> (MonitorOps.percolate(_, _)),
    "tag_entities" -> (TextOps.tagEntities(_, _)),
    "facet_pivot" -> (RelationalOps.facetPivot(_, _)),
    "facet_pivot_stats" -> (RelationalOps.facetPivotStats(_, _)),
    "stream_topic" -> ((s, d) => RelationalOps.streamTopic(s, d)),
    "facet_intervals" -> (RelationalOps.facetIntervals(_, _)),
    "facet_drill_sideways" -> (RelationalOps.facetDrillSideways(_, _)),
    "facet_range_other" -> ((s, d) => RelationalOps.facetRangeOther(s, d)),
    "facet_grouped" -> (RelationalOps.facetGrouped(_, _)),
    "function_recency" -> ((s, d) => RelationalOps.functionRecency(s, d)),
    "search_common_terms" -> ((s, d) => DocSearchOps.searchCommonTerms(s, d)),
    "solr_join_score" -> ((s, d) => DocSearchOps.solrJoinScore(s, d)),
    "analysis_phonetic" -> (AnalysisOps.phonetic(_, _)),
    "search_interval_scored" -> ((s, d) =>
      DocSearchOps.searchIntervalScored(s, d)),
    "payload_score" -> ((s, d) => DocSearchOps.payloadScore(s, d)),
    "stream_corr" -> (RelationalOps.streamCorr(_, _)),
    "search_complex_phrase" -> ((s, d) => DocSearchOps.searchComplexPhrase(s, d)),
    "search_atomic_update" -> ((s, d) => DocSearchOps.searchAtomicUpdate(s, d)),
    "search_index_sorted" -> ((s, d) => DocSearchOps.searchIndexSorted(s, d)),
    "function_range" -> ((s, d) => DocSearchOps.functionRange(s, d)),
    "suggest_freetext" -> ((s, d) => DocSearchOps.suggestFreeText(s, d)),
    "spell_wordbreak" -> ((s, d) => DocSearchOps.wordBreakSpell(s, d)),
    "text_perplexity" -> ((s, d) => TextOps.perplexity(s, d)),
    "index_field_stats" -> (DocSearchOps.indexFieldStats(_, _)),
    "stream_leftouter" -> (RelationalOps.streamLeftOuterJoin(_, _)),
    "stream_fetch" -> (RelationalOps.streamFetch(_, _)),
    "stream_cartesian" -> (RelationalOps.streamCartesianProduct(_, _)),
    "search_phrase_sloppy" -> ((s, d) => DocSearchOps.searchPhraseSloppy(s, d)),
    "search_min_should_match" -> (DocSearchOps.searchMinShouldMatch(_, _)),
    "search_mm_spec" -> ((s, d) => DocSearchOps.searchMmSpec(s, d)),
    "search_simple_qp" -> ((s, d) => DocSearchOps.searchSimpleQp(s, d)),
    "search_wildcard" -> ((s, d) => DocSearchOps.searchWildcard(s, d)),
    "search_wildcard_leading" ->
      ((s, d) => DocSearchOps.searchWildcardLeading(s, d)),
    "search_date_math" -> ((s, d) => RelationalOps.searchDateMath(s, d)),
    "match_all_docs" -> (DocSearchOps.matchAllDocs(_, _)),
    "search_classic_tfidf" -> (DocSearchOps.searchClassic(_, _)),
    "search_lm_dirichlet" -> (DocSearchOps.searchLmDirichlet(_, _)),
    "search_lm_jm" -> (DocSearchOps.searchLmJm(_, _)),
    "search_dfr_inb2" -> (DocSearchOps.searchDfr(_, _)),
    "search_ib_ll" -> (DocSearchOps.searchIb(_, _)),
    "search_axiomatic_f2exp" -> (DocSearchOps.searchAxiomatic(_, _)),
    "search_term_in_set" -> (DocSearchOps.searchTermInSet(_, _)),
    "realtime_get" -> (DocSearchOps.realtimeGet(_, _)),
    "function_expression" -> (DocSearchOps.functionExpression(_, _)),
    "highlight_passages" -> (DocSearchOps.highlightPassages(_, _)),
    "highlight_offsets" -> (DocSearchOps.highlightOffsets(_, _)),
    "spell_collate_query" -> (DocSearchOps.spellCollateQuery(_, _)),
    "group_query" -> (DocSearchOps.groupQuery(_, _)),
    "term_vector_positions" -> (DocSearchOps.termVectorPositions(_, _)),
    "search_dfi_chi2" -> (DocSearchOps.searchDfi(_, _)),
    "block_join_parent" -> (DocSearchOps.blockJoinParent(_, _)),
    "block_join_child" -> (DocSearchOps.blockJoinChild(_, _)),
    "search_edismax_qf" -> (DocSearchOps.searchEdismaxQf(_, _)),
    "search_edismax_pf" -> ((s, d) => DocSearchOps.searchEdismaxPf(s, d)),
    "search_stemmed_bm25" -> ((s, d) => DocSearchOps.searchStemmed(s, d)),
    "search_porter_bm25" -> ((s, d) => DocSearchOps.searchPorter(s, d)),
    "search_fuzzy" -> ((s, d) => DocSearchOps.searchFuzzy(s, d)),
    "search_fuzzy_transpose" -> ((s, d) =>
      DocSearchOps.searchFuzzyTranspose(s, d)),
    "sort_searchafter" -> (DocSearchOps.sortSearchAfter(_, _)),
    "function_query" -> (DocSearchOps.functionQuery(_, _)),
    "facet_sampled" -> ((s, d) => RelationalOps.facetSampled(s, d)),
    "facet_block_domain" -> ((s, d) => RelationalOps.facetBlockDomain(s, d)),
    "collapse_ngroups" -> ((s, d) => RelationalOps.collapseNgroups(s, d)),
    "function_query_tfidf" -> ((s, d) => DocSearchOps.functionQueryTfIdf(s, d)),
    "search_combined_field" -> ((s, d) => DocSearchOps.searchCombinedField(s, d)),
    "search_feature_boost" -> ((s, d) => DocSearchOps.searchFeatureBoost(s, d)),
    "search_diversified" -> ((s, d) => DocSearchOps.searchDiversified(s, d)),
    "more_like_this" -> ((s, d) => DocSearchOps.moreLikeThis(s, d)),
    "significant_terms" -> ((s, d) => DocSearchOps.significantTerms(s, d)),
    "search_sql_expr" -> (DocSearchOps.searchSqlExpr(_, _)),
    "search_parsed" -> ((s, d) => DocSearchOps.searchParsed(s, d)),
    "search_tree_batch" -> ((s, d) => DocSearchOps.searchTreeBatch(s, d)),
    "search_parsed_filter" -> ((s, d) => DocSearchOps.searchParsedFilter(s, d)),
    "search_parsed_nested" -> ((s, d) => DocSearchOps.searchParsedNested(s, d)),
    "search_phrase_scored" -> ((s, d) => DocSearchOps.searchPhraseScored(s, d)),
    "search_multi_phrase" -> ((s, d) => DocSearchOps.searchMultiPhrase(s, d)),
    "search_range_adaptive" -> ((s, d) => DocSearchOps.searchRangeAdaptive(s, d)),
    "search_phrase_sloppy3" -> ((s, d) => DocSearchOps.searchPhraseSloppyScored(s, d)),
    "search_fuzzy_docs" -> ((s, d) => DocSearchOps.searchFuzzyDocs(s, d)),
    "search_term_range" -> ((s, d) => DocSearchOps.searchTermRange(s, d)),
    "search_synonym" -> ((s, d) => DocSearchOps.searchSynonym(s, d)),
    "search_synonym_config" -> ((s, d) =>
      DocSearchOps.searchSynonymConfig(s, d)),
    "search_synonym_graph" -> ((s, d) =>
      DocSearchOps.searchSynonymGraph(s, d)),
    "search_synonym_index" -> ((s, d) =>
      DocSearchOps.searchSynonymIndex(s, d)),
    "search_lang_routed" -> ((s, d) => DocSearchOps.searchLangRouted(s, d)),
    "search_rerank" -> ((s, d) => DocSearchOps.searchRerank(s, d)),
    "search_ltr_linear" -> ((s, d) => DocSearchOps.searchLtr(s, d)),
    "search_ltr_trees" -> ((s, d) => DocSearchOps.searchLtrTrees(s, d)),
    "search_rrf_hybrid" -> ((s, d) => DocSearchOps.searchRrf(s, d)),
    "search_after_score" -> (DocSearchOps.searchAfterScore(_, _)),
    "facet_search_domain" -> (DocSearchOps.facetSearchDomain(_, _)),
    "suggest_terms" -> ((s, d) => DocSearchOps.suggestTerms(s, d)),
    "term_vectors" -> ((s, d) => DocSearchOps.termVectors(s, d)),
    "search_elevate" -> ((s, d) => DocSearchOps.searchElevate(s, d)),
    "suggest_infix" -> ((s, d) => DocSearchOps.suggestInfix(s, d)),
    "suggest_blended_infix" -> ((s, d) =>
      DocSearchOps.suggestBlendedInfix(s, d)),
    "analysis_common_grams" -> ((s, d) => AnalysisOps.commonGrams(s, d)),
    "boilerplate_strip" -> ((s, d) => PipelineOps.boilerplateStrip(s, d)),
    "suggest_context" -> ((s, d) => DocSearchOps.suggestContext(s, d)),
    "spell_collate" -> ((s, d) => DocSearchOps.spellCollate(s, d)),
    "search_regex" -> ((s, d) => DocSearchOps.searchRegex(s, d)),
    "search_highlight" -> ((s, d) => DocSearchOps.searchHighlight(s, d)),
    "index_term_stats" -> (DocSearchOps.indexTermStats(_, _)),
    "terms_regex" -> ((s, d) => DocSearchOps.termsRegex(s, d)),
    // -- facets / OLAP (SURVEY.md §2.7) --
    "facet_terms" -> (RelationalOps.facetTerms(_, _)),
    "facet_terms_params" -> ((s, d) => RelationalOps.facetTermsParams(s, d)),
    "facet_range" -> (RelationalOps.facetRange(_, _)),
    "facet_query" -> (RelationalOps.facetQuery(_, _)),
    "facet_heatmap" -> (RelationalOps.facetHeatmap(_, _)),
    "geo_distance" -> ((s, d) => RelationalOps.geoDistance(s, d)),
    "geo_bbox" -> ((s, d) => RelationalOps.geoBbox(s, d)),
    "geo_polygon" -> ((s, d) => RelationalOps.geoPolygon(s, d)),
    "range_field" -> ((s, d) => RelationalOps.rangeField(s, d)),
    "search_expunge_deletes" -> ((s, d) =>
      DocSearchOps.searchExpungeDeletes(s, d)),
    "facet_taxonomy" -> ((s, d) => RelationalOps.facetTaxonomy(s, d)),
    "facet_json_api" -> (RelationalOps.jsonFacet(_, _)),
    "facet_nested" -> (RelationalOps.facetNested(_, _)),
    "facet_stats" -> (RelationalOps.facetStats(_, _)),
    "facet_unique" -> (RelationalOps.facetUnique(_, _)),
    "facet_percentile" -> (RelationalOps.facetPercentile(_, _)),
    "facet_stats_full" -> (RelationalOps.facetStatsFull(_, _)),
    // -- Solr streaming expressions (SURVEY.md §2.8) --
    "stream_innerjoin" -> (RelationalOps.streamInnerJoin(_, _)),
    "graph_shortest_path" -> ((s, d) => RelationalOps.shortestPath(s, d)),
    "graph_gather_nodes" -> (RelationalOps.gatherNodes(_, _)),
    "graph_score_nodes" -> (RelationalOps.scoreNodes(_, _)),
    "export_sorted" -> ((s, d) => DocSearchOps.exportSorted(s, d)),
    "stream_hashjoin" -> (RelationalOps.streamHashJoin(_, _)),
    "stream_intersect" -> (RelationalOps.streamIntersect(_, _)),
    "stream_complement" -> (RelationalOps.streamComplement(_, _)),
    "stream_rollup" -> (RelationalOps.streamRollup(_, _)),
    "stream_top" -> (RelationalOps.streamTop(_, _)),
    "stream_unique" -> (RelationalOps.streamUnique(_, _)),
    "stream_select_having" -> (RelationalOps.streamSelectHaving(_, _)),
    "collapse_top1" -> (RelationalOps.collapseTop1(_, _)),
    "collapse_topk" -> ((s, d) => RelationalOps.collapseTopK(s, d)),
    "collapse_func" -> ((s, d) => RelationalOps.collapseFunc(s, d)),
    "expand_groups" -> ((s, d) => RelationalOps.expandGroups(s, d)),
    "solr_join" -> (RelationalOps.solrJoin(_, _)),
    "timeseries_daily" -> (RelationalOps.timeseriesDaily(_, _)),
    "sessionize" -> (RelationalOps.sessionize(_, _)),
    // -- text analysis for training-data pipelines --
    "text_token_count" -> (TextOps.tokenCount(_, _)),
    "text_quality" -> (TextOps.qualityScore(_, _)),
    "text_fingerprint" -> (TextOps.fingerprint(_, _)),
    "text_langid" -> (TextOps.langId(_, _)),
    "text_pii" -> (TextOps.piiScan(_, _)),
    "text_repetition" -> (TextOps.repetition(_, _)),
    "text_bpe_count" -> (TextOps.bpeCount(_, _)),
    // -- analyzer-chain filters (Lucene analysis-common breadth) --
    "analysis_word_delimiter" -> (AnalysisOps.wordDelimiter(_, _)),
    "analysis_ascii_folding" -> (AnalysisOps.asciiFolding(_, _)),
    "analysis_debug" -> (AnalysisOps.analysisDebug(_, _)),
    "analysis_shingle" -> (AnalysisOps.shingle(_, _)),
    "analysis_edge_ngram" -> (AnalysisOps.edgeNgram(_, _)),
    "analysis_pattern_replace" -> (AnalysisOps.patternReplace(_, _)),
    "analysis_length_filter" -> ((s, d) => AnalysisOps.lengthFilter(s, d)),
    "analysis_multilang_stem" -> ((s, d) => AnalysisOps.multilangStem(s, d)),
    "analysis_html_strip" -> ((s, d) => AnalysisOps.htmlStrip(s, d)),
    "analysis_cjk_bigram" -> ((s, d) => AnalysisOps.cjkBigram(s, d)),
    "analysis_uax29" -> ((s, d) => AnalysisOps.uax29(s, d)),
    "sample_hash" -> ((s, d) => PipelineOps.sampleHash(s, d)),
    "sample_stratified" -> ((s, d) => PipelineOps.sampleStratified(s, d)),
    "host_cap" -> ((s, d) => PipelineOps.hostCap(s, d)),
    "mix_weights" -> ((s, d) => PipelineOps.mixWeights(s, d)),
    "decontaminate_ngram" -> ((s, d) => PipelineOps.decontaminate(s, d)),
    "decontaminate_fraction" -> ((s, d) => PipelineOps.decontaminateFraction(s, d)),
    "quality_bins" -> ((s, d) => TextOps.qualityBins(s, d)),
    "pack_sequences" -> ((s, d) => PipelineOps.packSequences(s, d)),
    "dedup_span_coverage" -> ((s, d) => PipelineOps.dedupSpanCoverage(s, d)),
    // production shape: the benchmark is its OWN table argument, so the
    // training corpus is scanned exactly once (bench = %19==3 slice read
    // as a separate frame, standing in for an external eval suite)
    "decontaminate_table" -> ((s, d) => {
      val train = s.read.parquet(s"$d/documents.parquet")
        .where(org.apache.spark.sql.functions.col("doc_id") % 19 =!= 3)
      val bench = s.read.parquet(s"$d/documents.parquet")
        .where(org.apache.spark.sql.functions.col("doc_id") % 19 === 3)
        .select("doc_id", "text")
      PipelineOps.decontaminateAgainst(train, bench)
    }),
    "dedup_spans" -> ((s, d) => PipelineOps.dedupSpans(s, d)),
    "text_term_stats" -> (TextOps.termStats(_, _)),
    // -- dedup family --
    "dedup_exact" -> (DedupOps.dedupExact(_, _)),
    "dedup_fingerprint" -> (DedupOps.dedupFingerprint(_, _)),
    "dedup_minhash_lsh" -> (DedupOps.dedupMinhashLsh(_, _)),
    "dedup_simhash" -> (DedupOps.dedupSimhash(_, _)),
    "dedup_clusters" -> ((s, d) => DedupOps.duplicateClusters(s, d)),
    "dedup_keep_best" -> ((s, d) => DedupOps.keepBest(s, d)),
    "dedup_ngram_jaccard" -> (DedupOps.ngramJaccard(_, _)),
    // -- similarity search --
    "ann_brute_force" -> (AnnOps.annBruteForce(_, _)),
    "ann_filtered" -> ((s, d) => AnnOps.annFiltered(s, d)),
    "ann_ivf_exact" -> (AnnOps.annIvf(_, _)),
    "ann_lsh" -> (AnnOps.annLsh(_, _)),
    "dedup_embedding" -> ((s, d) => AnnOps.dedupEmbedding(s, d)),
    // -- multimodal plumbing --
    "multimodal_meta" -> (MultimodalOps.mediaMeta(_, _)),
    "multimodal_frames" -> (MultimodalOps.frameSample(_, _)),
    // -- Structured Streaming (real streaming queries, drained via
    //    Trigger.AvailableNow into a memory sink) --
    "stream_window_hourly" -> (graft.streaming.StreamingOps.windowedCounts(_, _)),
    "stream_session_window" -> (graft.streaming.StreamingOps.sessionWindows(_, _)),
    "stream_dedup_events" -> (graft.streaming.StreamingOps.streamDedupEvents(_, _)),
    "stream_stream_join" -> (graft.streaming.StreamingOps.streamStreamJoin(_, _)))

  // ---------------------------------------------------------------------
  // DuckDB oracle SQL
  // ---------------------------------------------------------------------

  private val StopSql: String = graft.core.Analyzer.EnglishStopWords.toSeq.sorted
    .map(w => s"'$w'").mkString(", ")

  /** Tokenizer-equivalent SQL fragment: (doc_id, term) one row per analyzed
    * token occurrence. Matches graft.core.Analyzer in the ASCII domain.
    */
  private val TokCte: String =
    s"""tok AS (
       |  SELECT d.doc_id, t.term
       |  FROM documents d,
       |       unnest(list_filter(string_split_regex(lower(d.text), '[^a-z0-9_]+'),
       |              x -> x <> '' AND x NOT IN ($StopSql))) AS t(term)
       |)""".stripMargin

  /** Full BM25 (Lucene 8 semantics incl. SmallFloat byte4 doc-length
    * quantization, k1=1.2 b=0.75) in ANSI SQL. Quantization mirrors
    * Lucene's SmallFloat free-values offset: dl < 32 exact (24 free codes
    * + 8 subnormals), else 24 + top-4-significant-bits(dl - 24) —
    * identical to SmallFloatUtil.byte4ToInt(intToByte4(dl)).
    */
  private def bm25Sql(scored: Seq[String], musts: Seq[String],
      nots: Seq[String] = Nil, lang: Option[String] = None, k: Int = 10,
      boosts: Map[String, Double] = Map.empty,
      dismaxTb: Option[Double] = None, minShouldMatch: Int = 0,
      /** searchAfter page: skip the first `offset` ranks, re-rank 1..k. */
      offset: Int = 0): String = {
    val termsIn = scored.map(t => s"'$t'").mkString(", ")
    val havings = Seq.newBuilder[String]
    if (musts.nonEmpty) {
      val mi = musts.map(t => s"'$t'").mkString(", ")
      havings += s"count(DISTINCT CASE WHEN tf.term IN ($mi) THEN tf.term END) = ${musts.distinct.size}"
    }
    if (minShouldMatch > 0) {
      val shoulds = scored.filterNot(musts.contains)
      val si = shoulds.map(t => s"'$t'").mkString(", ")
      havings += s"count(DISTINCT CASE WHEN tf.term IN ($si) THEN tf.term END) >= $minShouldMatch"
    }
    val hs = havings.result()
    val mustFilter = if (hs.isEmpty) "" else hs.mkString("HAVING ", " AND ", "")
    val notFilter =
      if (nots.isEmpty) ""
      else {
        val ni = nots.map(t => s"'$t'").mkString(", ")
        s"AND tf.doc_id NOT IN (SELECT DISTINCT doc_id FROM tok WHERE term IN ($ni))"
      }
    val langJoin = lang.map(l =>
      s"JOIN documents dd ON dd.doc_id = tf.doc_id AND dd.lang = '$l'").getOrElse("")
    val boostExpr =
      if (boosts.isEmpty) "1.0"
      else boosts.map { case (t, b) => s"WHEN tf.term = '$t' THEN $b" }
        .mkString("CASE ", " ", " ELSE 1.0 END")
    val termScore =
      s"""$boostExpr * ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |             / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))""".stripMargin
    val combine = dismaxTb match {
      case None => s"sum($termScore)"
      case Some(tb) => // DisjunctionMaxQuery combine
        s"max($termScore) + $tb * (sum($termScore) - max($termScore))"
    }
    s"""WITH $TokCte,
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
       |qdl AS (SELECT doc_id, CASE WHEN dl < 32 THEN dl
       |        ELSE 24 + (((dl - 24) >> (length(printf('%b', dl - 24)) - 4)) << (length(printf('%b', dl - 24)) - 4))
       |        END AS qdl FROM dl),
       |st AS (SELECT (SELECT count(*) FROM documents) AS n,
       |              (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl),
       |dfs AS (SELECT term, count(*) AS df FROM tf WHERE term IN ($termsIn) GROUP BY term),
       |sc AS (
       |  SELECT tf.doc_id,
       |         $combine AS score
       |  FROM tf JOIN dfs ON tf.term = dfs.term
       |       JOIN qdl ON tf.doc_id = qdl.doc_id
       |       $langJoin
       |       CROSS JOIN st
       |  WHERE 1=1 $notFilter
       |  GROUP BY tf.doc_id
       |  $mustFilter
       |)
       |SELECT rank - $offset AS rank, doc_id, score FROM (
       |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
       |         doc_id, round(score, 4) AS score
       |  FROM sc)
       |WHERE rank > $offset AND rank <= $offset + $k ORDER BY rank""".stripMargin
  }

  /** SmallFloat byte4 quantization of an arbitrary length expression — the
    * same formula the qdl CTE applies to dl (used by the BM25F oracle for
    * per-FIELD lengths; a length bounded below 32 quantizes to itself).
    */
  private def qlenOracle(e: String): String =
    s"""CASE WHEN $e < 32 THEN $e
       |ELSE 24 + ((($e - 24) >> (length(printf('%b', $e - 24)) - 4))
       |           << (length(printf('%b', $e - 24)) - 4)) END""".stripMargin

  private val QualityTokSql =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'), x -> x <> '')"

  /** BM25 scaffolding shared by the scored-query oracles: per-doc term
    * freq, SmallFloat-quantized doc length, collection stats.
    */
  private val Bm25Ctes: String =
    """tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
      |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
      |qdl AS (SELECT doc_id, CASE WHEN dl < 32 THEN dl
      |        ELSE 24 + (((dl - 24) >> (length(printf('%b', dl - 24)) - 4)) << (length(printf('%b', dl - 24)) - 4))
      |        END AS qdl FROM dl),
      |st AS (SELECT (SELECT count(*) FROM documents) AS n,
      |       (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl)""".stripMargin

  /** Raw token POSITIONS (stop words keep their slot — the oracle mirror of
    * StopFilter position-increment holes): pp(doc_id, pos, term).
    */
  private val PosCtes: String =
    s"""tkp AS (SELECT doc_id, $QualityTokSql AS toks FROM documents),
       |pp AS (SELECT doc_id, CAST(i AS INT) AS pos, toks[i + 1] AS term
       |       FROM tkp, unnest(range(len(toks))) AS r(i))""".stripMargin

  /** Minimal-interval reduction over a `cand(doc_id, s, e)` CTE — the SQL
    * mirror of IntervalAlgebra.minimize: drop any candidate strictly
    * containing another candidate of the same doc.
    */
  private val IntervalMiniSql: String =
    """SELECT doc_id, s, e FROM cand i
      |         WHERE NOT EXISTS (SELECT 1 FROM cand j WHERE j.doc_id = i.doc_id
      |               AND j.s >= i.s AND j.e <= i.e AND (j.s > i.s OR j.e < i.e))""".stripMargin

  /** Shared scaffolding for the CONTAINING/NOT_CONTAINING pair: minimal
    * unordered(key, table) windows as `mini`, minimal or(value, phrase
    * "key order") intervals as `sm`.
    */
  private val IntervalContCtes: String =
    s"""$PosCtes,
       |a AS (SELECT doc_id, pos FROM pp WHERE term = 'key'),
       |b AS (SELECT doc_id, pos FROM pp WHERE term = 'table'),
       |cand AS (SELECT DISTINCT a.doc_id, least(a.pos, b.pos) AS s,
       |                greatest(a.pos, b.pos) + 1 AS e
       |         FROM a JOIN b ON b.doc_id = a.doc_id),
       |mini AS ($IntervalMiniSql),
       |small AS (SELECT doc_id, pos AS s, pos + 1 AS e FROM pp WHERE term = 'value'
       |          UNION ALL
       |          SELECT k.doc_id, k.pos, k.pos + 2
       |          FROM pp k JOIN pp o ON o.doc_id = k.doc_id AND o.pos = k.pos + 1
       |          WHERE k.term = 'key' AND o.term = 'order'),
       |sm AS (SELECT doc_id, s, e FROM small i
       |       WHERE NOT EXISTS (SELECT 1 FROM small j WHERE j.doc_id = i.doc_id
       |             AND j.s >= i.s AND j.e <= i.e AND (j.s > i.s OR j.e < i.e)))""".stripMargin

  /** EnglishMinimalStemmer (S-stemmer) as SQL — mirrors
    * Analyzer.minimalStem exactly (suffix CASE logic only).
    */
  private def stemSql(t: String): String =
    s"""CASE
       |  WHEN length($t) < 3 OR substr($t, length($t), 1) <> 's' THEN $t
       |  WHEN substr($t, length($t)-1, 1) IN ('u', 's') THEN $t
       |  WHEN substr($t, length($t)-1, 1) = 'e' THEN
       |    CASE WHEN length($t) > 3 AND substr($t, length($t)-2, 1) = 'i'
       |              AND substr($t, length($t)-3, 1) NOT IN ('a', 'e')
       |         THEN substr($t, 1, length($t)-3) || 'y'
       |         WHEN substr($t, length($t)-2, 1) IN ('i', 'a', 'o', 'e') THEN $t
       |         ELSE substr($t, 1, length($t)-1) END
       |  ELSE substr($t, 1, length($t)-1) END""".stripMargin

  private val ProbeTermsIn = TextOps.ProbeTerms.map(t => s"'$t'").mkString(", ")

  // ---- near-dup oracle fragments (dedup ops run on the augmented corpus:
  // docs 0..4 duplicated at id+1,000,000 with a marker token appended) ----

  private val AugCte: String =
    """aug AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text || ' graft_near_dup_marker' AS text
      |  FROM documents WHERE doc_id < 5)""".stripMargin

  private val RawTokCte: String =
    s"tk AS (SELECT doc_id, $QualityTokSql AS toks FROM aug)"

  private val U64 = "18446744073709551616::HUGEINT" // 2^64
  /** FNV-1a 64 over a token column, 64-bit-wrapped, exactly DedupOps.fnv1a64. */
  private def fnvSql(tokCol: String): String =
    s"""list_reduce(list_prepend(14695981039346656037::HUGEINT,
       |  list_transform(split($tokCol, ''), c -> CAST(ord(c) AS HUGEINT))),
       |  (h, c) -> (xor(h, c) * 1099511628211::HUGEINT) % $U64)""".stripMargin

  /** Shared minhash-signature CTE chain -> `sig(doc_id, k, mh)` + `est`
    * pair table, exactly DedupOps.minhashSignature (xorshift64 permutations
    * of the FNV base hash, min over shingles as SIGNED 64-bit).
    */
  private val MinhashCtes: String =
    s"""$AugCte,
       |$RawTokCte,
       |sh3 AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks) - 2),
       |         i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3]))) AS sh
       |        FROM tk WHERE len(toks) >= 3),
       |base AS (SELECT doc_id, ${fnvSql("sh")} AS b FROM sh3),
       |h0 AS (SELECT doc_id, kk.k AS k,
       |       (b + CAST(kk.k AS HUGEINT) * 11400714819323198485::HUGEINT) % $U64 AS h
       |       FROM base, unnest(range(32)) kk(k)),
       |h1 AS (SELECT doc_id, k, xor(h, (h * 8192::HUGEINT) % $U64) AS h FROM h0),
       |h2 AS (SELECT doc_id, k, xor(h, h // 128::HUGEINT) AS h FROM h1),
       |h3 AS (SELECT doc_id, k, xor(h, (h * 131072::HUGEINT) % $U64) AS h FROM h2),
       |sig AS (SELECT doc_id, k,
       |        min(CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
       |                 THEN h - $U64 ELSE h END AS BIGINT)) AS mh
       |        FROM h3 GROUP BY doc_id, k),
       |est AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |        sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) / 32.0 AS est_jaccard
       |        FROM sig a JOIN sig b ON a.k = b.k AND a.doc_id < b.doc_id
       |        GROUP BY 1, 2)""".stripMargin

  private val CosSql =
    "list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.qvec AS DOUBLE[])) / " +
      "(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) * " +
      "sqrt(list_dot_product(CAST(q.qvec AS DOUBLE[]), CAST(q.qvec AS DOUBLE[]))))"

  private val AnnSql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id IN (0, 1, 2)),
       |s AS (SELECT q.query_id, e.vec_id, $CosSql AS cos
       |      FROM embeddings e, q WHERE e.vec_id <> q.query_id)
       |SELECT query_id, rank, vec_id, cos FROM (
       |  SELECT query_id, vec_id, round(cos, 4) AS cos,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM s)
       |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** Random-hyperplane LSH ANN, regenerated bit-for-bit in SQL: the
    * hyperplane doubles come from the SAME integer formula (inlined as
    * shortest-roundtrip literals), each sketch dot is a left-associative
    * 64-term sum exactly matching the engine's sequential loop, banding is
    * 4 x 4 bits with multiprobe-1 (engine: query-side probe expansion;
    * oracle: the equivalent Hamming-distance-<=-1 band join), exact cosine
    * ranks the candidates.
    */
  private val LshAnnSql: String = {
    val planes = AnnOps.lshPlanes(16, 64)
    val perBand = 4
    def dotSql(h: Array[Double]): String =
      h.zipWithIndex.map { case (c, j) =>
        s"CAST(e.embedding[${j + 1}] AS DOUBLE)*($c)"
      }.mkString(" + ")
    val bandExprs = (0 until 4).map { b =>
      val bits = (0 until perBand).map { j =>
        val i = b * perBand + j
        s"(CASE WHEN ${dotSql(planes(i))} >= 0 THEN 1 ELSE 0 END) * ${1 << (perBand - 1 - j)}"
      }.mkString(" + ")
      s"$bits AS b$b"
    }.mkString(",\n  ")
    s"""WITH sig AS (SELECT e.vec_id,
       |  $bandExprs
       |FROM embeddings e),
       |sb AS (SELECT vec_id, band, bucket FROM (
       |   SELECT vec_id, 0 AS band, b0 AS bucket FROM sig UNION ALL
       |   SELECT vec_id, 1, b1 FROM sig UNION ALL
       |   SELECT vec_id, 2, b2 FROM sig UNION ALL
       |   SELECT vec_id, 3, b3 FROM sig)),
       |cand AS (SELECT DISTINCT q.vec_id AS query_id, s.vec_id
       |         FROM sb s JOIN sb q ON s.band = q.band
       |              AND bit_count(CAST(xor(s.bucket, q.bucket) AS BIGINT)) <= 1
       |         WHERE q.vec_id IN (0, 1, 2) AND s.vec_id <> q.vec_id),
       |s AS (SELECT c.query_id, c.vec_id, $CosSql AS cos
       |      FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id
       |           JOIN (SELECT vec_id, embedding AS qvec FROM embeddings) q
       |             ON q.vec_id = c.query_id)
       |SELECT query_id, rank, vec_id, cos FROM (
       |  SELECT query_id, vec_id, round(cos, 4) AS cos,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM s)
       |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  private val LangIdSql: String = {
    val markers = TextOps.LangMarkers.toSeq.sortBy(_._1)
    val hitCols = markers.map { case (l, ws) =>
      val in = ws.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(toks, x -> x IN ($in))) AS hits_$l"
    }.mkString(",\n  ")
    val langs = markers.map(_._1)
    val g = langs.map(l => s"hits_$l").mkString("greatest(", ", ", ")")
    val cases = langs.map(l =>
      s"WHEN hits_$l = g AND g > 0 THEN '$l'").mkString(" ")
    s"""WITH tk AS (SELECT doc_id, $QualityTokSql AS toks FROM documents),
       |h AS (SELECT doc_id,
       |  $hitCols
       |FROM tk),
       |hg AS (SELECT *, $g AS g FROM h)
       |SELECT doc_id, CASE $cases ELSE 'und' END AS pred_lang
       |FROM hg ORDER BY doc_id""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "search_term_bm25" -> bm25Sql(Seq("merge"), Nil),
    // NRT tailing follower: the follower index (2-stage leader commits,
    // incremental pulls) must answer exactly like one full-corpus build
    "replication_tail" -> bm25Sql(Seq("merge"), Nil),
    // BooleanSimilarity: score = sum of matched clauses' boosts, nothing else
    "search_boolean_sim" ->
      s"""WITH $TokCte,
         |m AS (SELECT DISTINCT doc_id, term FROM tok
         |      WHERE term IN ('batch', 'merge', 'window')),
         |sc AS (SELECT doc_id,
         |         sum(CASE term WHEN 'merge' THEN 3.0 WHEN 'window' THEN 2.0
         |             ELSE 1.0 END) AS score
         |       FROM m GROUP BY doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score
         |  FROM sc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // IndexSearcher.explain(): per-(doc, term) BM25 factor breakdown for the
    // top-10 docs of the merge/sort disjunction
    "search_explain" ->
      s"""WITH $TokCte,
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         |qdl AS (SELECT doc_id, CASE WHEN dl < 32 THEN dl
         |        ELSE 24 + (((dl - 24) >> (length(printf('%b', dl - 24)) - 4)) << (length(printf('%b', dl - 24)) - 4))
         |        END AS qdl FROM dl),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n,
         |              (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl),
         |dfs AS (SELECT term, count(*) AS df FROM tf WHERE term IN ('merge', 'sort') GROUP BY term),
         |sc AS (
         |  SELECT tf.doc_id,
         |         sum(ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |             / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |  FROM tf JOIN dfs ON tf.term = dfs.term
         |       JOIN qdl ON tf.doc_id = qdl.doc_id
         |       CROSS JOIN st
         |  GROUP BY tf.doc_id),
         |top AS (SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score
         |  FROM sc) WHERE rank <= 10)
         |SELECT t.rank, t.doc_id, f.term, f.tf AS freq, dfs.df,
         |       round(ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)), 4) AS idf,
         |       qdl.qdl AS dl,
         |       round(ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * f.tf
         |             / (f.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl)), 4) AS contrib,
         |       t.score
         |FROM top t
         |     JOIN tf f ON f.doc_id = t.doc_id AND f.term IN ('merge', 'sort')
         |     JOIN dfs ON dfs.term = f.term
         |     JOIN qdl ON qdl.doc_id = f.doc_id
         |     CROSS JOIN st
         |ORDER BY t.rank, f.term""".stripMargin,
    // CoveringQuery: per-doc minimumNumberShouldMatch = 1 + doc_id % 3
    "search_covering" ->
      s"""WITH $TokCte,
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         |qdl AS (SELECT doc_id, CASE WHEN dl < 32 THEN dl
         |        ELSE 24 + (((dl - 24) >> (length(printf('%b', dl - 24)) - 4)) << (length(printf('%b', dl - 24)) - 4))
         |        END AS qdl FROM dl),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n,
         |              (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl),
         |dfs AS (SELECT term, count(*) AS df FROM tf
         |        WHERE term IN ('merge', 'sort', 'window', 'join') GROUP BY term),
         |sc AS (
         |  SELECT tf.doc_id,
         |         sum(ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |             / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score,
         |         count(DISTINCT tf.term) AS matched
         |  FROM tf JOIN dfs ON tf.term = dfs.term
         |       JOIN qdl ON tf.doc_id = qdl.doc_id
         |       CROSS JOIN st
         |  GROUP BY tf.doc_id),
         |f AS (SELECT doc_id, matched, 1 + doc_id % 3 AS min_match, score
         |      FROM sc WHERE matched >= 1 + doc_id % 3)
         |SELECT rank, doc_id, matched, min_match, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, matched, min_match, round(score, 4) AS score
         |  FROM f)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // FuzzySuggester: prefix-edit-distance <= 1 completions of 'strem'
    // (nonFuzzyPrefix=1: first char exact), weight = df
    "suggest_fuzzy" ->
      s"""WITH $TokCte,
         |d AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term)
         |SELECT term, df FROM d
         |WHERE term LIKE 's%' AND length(term) >= 4
         |  AND least(levenshtein(substr(term, 1, 4), 'strem'),
         |            levenshtein(substr(term, 1, 5), 'strem'),
         |            levenshtein(substr(term, 1, 6), 'strem')) <= 1
         |ORDER BY df DESC, term LIMIT 8""".stripMargin,
    // FuzzySuggester transpositions=true: prefix-Damerau <= 1 completions
    // of 'srot' ("sort..." is one adjacent swap away; plain Levenshtein
    // would charge 2 and miss) — first char exact, weight = df
    "suggest_fuzzy_transpose" ->
      s"""WITH $TokCte,
         |d AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term)
         |SELECT term, df FROM d
         |WHERE term LIKE 's%' AND length(term) >= 3
         |  AND least(damerau_levenshtein(substr(term, 1, 3), 'srot'),
         |            damerau_levenshtein(substr(term, 1, 4), 'srot'),
         |            damerau_levenshtein(substr(term, 1, 5), 'srot')) <= 1
         |ORDER BY df DESC, term LIMIT 8""".stripMargin,
    // MLT interestingTerms=details: seed doc 42's terms ranked by idf
    "mlt_interesting_terms" ->
      s"""WITH $TokCte,
         |seed AS (SELECT DISTINCT term FROM tok WHERE doc_id = 42),
         |d AS (SELECT t.term, count(DISTINCT t.doc_id) AS df
         |      FROM tok t JOIN seed s ON t.term = s.term GROUP BY t.term),
         |n AS (SELECT count(*) AS n FROM documents)
         |SELECT term, df,
         |       round(ln(1 + (n.n - df + 0.5) / (df + 0.5)), 4) AS idf
         |FROM d CROSS JOIN n
         |ORDER BY round(ln(1 + (n.n - df + 0.5) / (df + 0.5)), 9) DESC, term
         |LIMIT 5""".stripMargin,
    // Token-window chunking: size 64 stride 48, md5 digest per chunk
    "chunk_documents" ->
      s"""WITH tk AS (SELECT doc_id, $QualityTokSql AS toks FROM documents
         |            WHERE doc_id < 300),
         |c AS (SELECT doc_id, i AS chunk_idx,
         |             list_slice(toks, i * 48 + 1, i * 48 + 64) AS chunk
         |      FROM tk, unnest(range((len(toks) - 1) // 48 + 1)) AS r(i)
         |      WHERE len(toks) > 0)
         |SELECT doc_id, chunk_idx, len(chunk) AS n_tokens,
         |       md5(array_to_string(chunk, ' ')) AS chunk_md5
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    // Nearest-centroid tf-idf cluster assignment (centroids = docs 0/1/2)
    "cluster_assign" -> {
      val vocabIn = graft.ops.ClassifyOps.ClusterVocab
        .map(t => s"'$t'").mkString(", ")
      s"""WITH $TokCte,
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
         |       WHERE term IN ($vocabIn) GROUP BY doc_id, term),
         |dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |n AS (SELECT count(*) AS n FROM documents),
         |w AS (SELECT tf.doc_id, tf.term,
         |             tf.tf * ln((n.n + 1.0) / (dfs.df + 1.0)) AS w
         |      FROM tf JOIN dfs ON tf.term = dfs.term CROSS JOIN n),
         |cent AS (SELECT doc_id AS cid, term, w AS cw FROM w
         |         WHERE doc_id IN (0, 1, 2)),
         |dots AS (SELECT w.doc_id, c.cid, sum(w.w * c.cw) AS dot
         |         FROM w JOIN cent c ON w.term = c.term GROUP BY 1, 2),
         |nd AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id),
         |nc AS (SELECT cid, sqrt(sum(cw * cw)) AS nrm FROM cent GROUP BY cid),
         |cs AS (SELECT d.doc_id, d.cid, d.dot / (nd.nrm * nc.nrm) AS cos
         |       FROM dots d JOIN nd ON nd.doc_id = d.doc_id
         |            JOIN nc ON nc.cid = d.cid),
         |b AS (SELECT doc_id, cid, cos,
         |        row_number() OVER (PARTITION BY doc_id
         |                           ORDER BY round(cos, 9) DESC, cid) AS rn
         |      FROM cs)
         |SELECT doc_id, cid AS cluster, round(cos, 4) AS cos
         |FROM b WHERE rn = 1 AND doc_id < 500 ORDER BY doc_id""".stripMargin
    },
    "search_backup_restore" -> bm25Sql(Seq("stream", "window"), Nil),
    "search_sql_expr" -> bm25Sql(Seq("merge"), Nil),
    "search_or_bm25" -> bm25Sql(Seq("merge", "sort", "window"), Nil),
    "search_and_bm25" -> bm25Sql(Seq("stream", "batch"), Seq("stream", "batch")),
    "search_not_bm25" -> bm25Sql(Seq("join"), Seq("join"), nots = Seq("error")),
    "search_filtered_bm25" -> bm25Sql(Seq("scan", "table"), Nil, lang = Some("en")),
    "search_min_should_match" -> bm25Sql(Seq("merge", "sort", "window"), Nil,
      minShouldMatch = 2),
    // mm spec "2<75%" over 4 optionals: 4 > 2, so 75% of 4 = 3 must match
    "search_mm_spec" -> bm25Sql(Seq("merge", "sort", "window", "table"), Nil,
      minShouldMatch = 3),
    // SimpleQueryParser "merge + window | scan -error":
    // ((merge AND window) OR scan) NOT error; score = the AND pair's sum
    // when both matched, plus scan's score when it matched
    "search_simple_qp" ->
      s"""WITH $TokCte,
         |$Bm25Ctes,
         |dfs AS (SELECT term, count(*) AS df FROM tf
         |        WHERE term IN ('merge', 'window', 'scan') GROUP BY term),
         |per AS (SELECT tf.doc_id, tf.term,
         |        ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |          / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl)) AS s
         |        FROM tf JOIN dfs ON tf.term = dfs.term
         |             JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st),
         |agg AS (SELECT doc_id,
         |        max(CASE WHEN term = 'merge' THEN s END) AS sm,
         |        max(CASE WHEN term = 'window' THEN s END) AS sw,
         |        max(CASE WHEN term = 'scan' THEN s END) AS ss
         |        FROM per GROUP BY doc_id),
         |sc AS (SELECT doc_id,
         |        CASE WHEN sm IS NOT NULL AND sw IS NOT NULL
         |             THEN sm + sw ELSE 0 END + coalesce(ss, 0) AS score
         |       FROM agg
         |       WHERE ((sm IS NOT NULL AND sw IS NOT NULL) OR ss IS NOT NULL)
         |         AND doc_id NOT IN (SELECT DISTINCT doc_id FROM tok
         |                            WHERE term = 'error'))
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score FROM sc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    "search_wildcard" ->
      s"""WITH $TokCte
         |SELECT DISTINCT doc_id FROM tok
         |WHERE regexp_matches(term, '^w.ndo.*$$')
         |ORDER BY doc_id LIMIT 200""".stripMargin,
    // leading wildcard *er via the suffix-gram table (ReversedWildcardFilter
    // role): EqualTo(gram) pushdown instead of a dictionary regex scan
    "search_wildcard_leading" ->
      s"""WITH $TokCte
         |SELECT DISTINCT doc_id FROM tok
         |WHERE term LIKE '%er'
         |ORDER BY doc_id LIMIT 200""".stripMargin,
    "match_all_docs" ->
      "SELECT doc_id, CAST(1.0 AS DOUBLE) AS score FROM documents ORDER BY doc_id",
    // ClassicSimilarity (Lucene 8.11 TFIDFScorer): weight = idf =
    // 1+ln((N+1)/(df+1)) applied ONCE (the idf^2 queryNorm composition died
    // in Lucene 7); tf = sqrt(freq); lengthNorm = 1/sqrt(quantized dl) —
    // same SmallFloat bucketing
    "search_classic_tfidf" ->
      s"""WITH $TokCte,
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         |qdl AS (SELECT doc_id, CASE WHEN dl < 32 THEN dl
         |        ELSE 24 + (((dl - 24) >> (length(printf('%b', dl - 24)) - 4)) << (length(printf('%b', dl - 24)) - 4))
         |        END AS qdl FROM dl),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n),
         |dfs AS (SELECT term, count(*) AS df FROM tf WHERE term IN ('merge', 'sort') GROUP BY term),
         |sc AS (
         |  SELECT tf.doc_id,
         |         sum((1 + ln((st.n + 1.0) / (dfs.df + 1.0)))
         |             * sqrt(tf.tf) / sqrt(qdl.qdl)) AS score
         |  FROM tf JOIN dfs ON tf.term = dfs.term
         |       JOIN qdl ON tf.doc_id = qdl.doc_id
         |       CROSS JOIN st
         |  GROUP BY tf.doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score
         |  FROM sc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // LM Dirichlet (mu=2000): per-term contribution clamped at 0, summed
    // over matched query terms; p(t|C) = (ttf+1)/(sumTtf+2), dl is the
    // SmallFloat-quantized doc length (qdl), sumTtf = sum of post-stop dl
    "search_lm_dirichlet" ->
      s"""WITH $TokCte,
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         |qdl AS (SELECT doc_id, CASE WHEN dl < 32 THEN dl
         |        ELSE 24 + (((dl - 24) >> (length(printf('%b', dl - 24)) - 4)) << (length(printf('%b', dl - 24)) - 4))
         |        END AS qdl FROM dl),
         |st AS (SELECT (SELECT sum(dl) FROM dl) AS sumttf),
         |ttfs AS (SELECT term, count(*) AS ttf FROM tok
         |         WHERE term IN ('merge', 'sort') GROUP BY term),
         |sc AS (
         |  SELECT tf.doc_id,
         |         sum(greatest(0, ln(1 + tf.tf / (2000.0 * (ttfs.ttf + 1.0) / (st.sumttf + 2.0)))
         |             + ln(2000.0 / (qdl.qdl + 2000.0)))) AS score
         |  FROM tf JOIN ttfs ON tf.term = ttfs.term
         |       JOIN qdl ON tf.doc_id = qdl.doc_id
         |       CROSS JOIN st
         |  GROUP BY tf.doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score
         |  FROM sc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // LM Jelinek-Mercer: p(t|C) = (ttf+1)/(sumttf+2), per-term score =
    // ln(1 + tf * (1/qdl) / (0.7 * p / 0.3)) — op order mirrors the
    // engine's scoreFreq(weight, freq, normVal) folding exactly
    "search_lm_jm" ->
      s"""WITH $TokCte,
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         |qdl AS (SELECT doc_id, CASE WHEN dl < 32 THEN dl
         |        ELSE 24 + (((dl - 24) >> (length(printf('%b', dl - 24)) - 4)) << (length(printf('%b', dl - 24)) - 4))
         |        END AS qdl FROM dl),
         |st AS (SELECT (SELECT sum(dl) FROM dl) AS sumttf),
         |ttfs AS (SELECT term, count(*) AS ttf FROM tok
         |         WHERE term IN ('merge', 'sort') GROUP BY term),
         |sc AS (
         |  SELECT tf.doc_id,
         |         sum(ln(1 + tf.tf * (1.0 / qdl.qdl)
         |             / (0.7 * ((ttfs.ttf + 1.0) / (st.sumttf + 2.0)) / (1.0 - 0.7)))) AS score
         |  FROM tf JOIN ttfs ON tf.term = ttfs.term
         |       JOIN qdl ON tf.doc_id = qdl.doc_id
         |       CROSS JOIN st
         |  GROUP BY tf.doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score
         |  FROM sc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // DFI chi-squared: expected = ttf*qdl/sumttf, score = 0 when
    // tf <= expected else log2((tf-expected)^2/expected + 1)
    "search_dfi_chi2" ->
      s"""WITH $TokCte,
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         |qdl AS (SELECT doc_id, CASE WHEN dl < 32 THEN dl
         |        ELSE 24 + (((dl - 24) >> (length(printf('%b', dl - 24)) - 4)) << (length(printf('%b', dl - 24)) - 4))
         |        END AS qdl FROM dl),
         |st AS (SELECT (SELECT sum(dl) FROM dl) AS sumttf),
         |ttfs AS (SELECT term, count(*) AS ttf FROM tok
         |         WHERE term IN ('merge', 'sort') GROUP BY term),
         |sc AS (
         |  SELECT tf.doc_id,
         |         sum(CASE WHEN ttfs.ttf * qdl.qdl = 0
         |                    OR tf.tf <= ttfs.ttf * 1.0 * qdl.qdl / st.sumttf THEN 0
         |             ELSE ln(pow(tf.tf - ttfs.ttf * 1.0 * qdl.qdl / st.sumttf, 2)
         |                     / (ttfs.ttf * 1.0 * qdl.qdl / st.sumttf) + 1) / ln(2)
         |             END) AS score
         |  FROM tf JOIN ttfs ON tf.term = ttfs.term
         |       JOIN qdl ON tf.doc_id = qdl.doc_id
         |       CROSS JOIN st
         |  GROUP BY tf.doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score
         |  FROM sc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // DFR I(n)B2: weight = (ttf+1)/df * log2((N+1)/(df+0.5)), per-doc
    // tfn = tf * log2(1 + avgdl/qdl), score = weight * tfn/(tfn+1)
    "search_dfr_inb2" ->
      s"""WITH $TokCte,
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         |qdl AS (SELECT doc_id, CASE WHEN dl < 32 THEN dl
         |        ELSE 24 + (((dl - 24) >> (length(printf('%b', dl - 24)) - 4)) << (length(printf('%b', dl - 24)) - 4))
         |        END AS qdl FROM dl),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n,
         |       (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl),
         |stats AS (SELECT term, count(DISTINCT doc_id) AS df, count(*) AS ttf
         |          FROM (SELECT doc_id, term FROM tok) GROUP BY term),
         |dfs AS (SELECT term, df, ttf FROM stats WHERE term IN ('merge', 'sort')),
         |sc AS (SELECT tf.doc_id,
         |        sum(((dfs.ttf + 1.0) / dfs.df) * (ln((st.n + 1.0) / (dfs.df + 0.5)) / ln(2))
         |            * (tf.tf * (ln(1 + st.avgdl / qdl.qdl) / ln(2)))
         |            / (tf.tf * (ln(1 + st.avgdl / qdl.qdl) / ln(2)) + 1.0)) AS score
         |        FROM tf JOIN dfs ON tf.term = dfs.term
         |             JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st
         |        GROUP BY tf.doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score FROM sc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // TermInSetQuery: constant-score terms filter — any doc containing any
    // of the set's terms, first 100 by doc id
    "search_term_in_set" ->
      s"""WITH $TokCte
         |SELECT doc_id, 1.0 AS score FROM (
         |  SELECT DISTINCT doc_id FROM tok
         |  WHERE term IN ('dup', 'vector', 'line'))
         |ORDER BY doc_id LIMIT 100""".stripMargin,
    // realtime get: stored fields for an explicit id list; token_count is
    // the post-stop analyzed token count and sha256 the ingest digest —
    // both recomputed from the raw corpus here
    "realtime_get" ->
      s"""WITH $TokCte,
         |tc AS (SELECT doc_id, count(*) AS token_count FROM tok GROUP BY doc_id)
         |SELECT d.doc_id, d.lang, coalesce(tc.token_count, 0) AS token_count,
         |       sha256(d.text) AS sha256
         |FROM documents d LEFT JOIN tc ON tc.doc_id = d.doc_id
         |WHERE d.doc_id IN (3, 5, 8, 13, 21, 34, 55, 89, 144, 233, 377)
         |ORDER BY d.doc_id""".stripMargin,
    // term vector with positions for doc 7: freq + md5 of the ascending
    // raw-token position list (stop slots counted), per query term
    "term_vector_positions" ->
      s"""WITH $PosCtes
         |SELECT term, count(*) AS freq,
         |       md5(string_agg(CAST(pos AS VARCHAR), ' ' ORDER BY pos)) AS positions_md5
         |FROM pp
         |WHERE doc_id = 7 AND term IN ('merge', 'sort', 'window')
         |GROUP BY term ORDER BY term""".stripMargin,
    // spellcheck.collate with hit verification: per-term best correction
    // (dist, df desc, term), reassembled in query order, hits = docs
    // matching ALL corrected terms
    "spell_collate_query" ->
      s"""WITH $TokCte,
         |dict AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
         |q(pos, qterm) AS (VALUES (1, 'mrge'), (2, 'sorrt'), (3, 'wnidow')),
         |cand AS (SELECT q.pos, q.qterm, d.term,
         |         levenshtein(q.qterm, d.term) AS dist, d.df
         |         FROM q JOIN dict d
         |           ON substring(d.term, 1, 1) = substring(q.qterm, 1, 1)
         |          AND abs(length(d.term) - length(q.qterm)) <= 2
         |          AND levenshtein(q.qterm, d.term) <= 2),
         |best AS (SELECT pos, qterm, term FROM (
         |   SELECT pos, qterm, term,
         |          row_number() OVER (PARTITION BY qterm
         |            ORDER BY dist, df DESC, term) AS rk
         |   FROM cand) WHERE rk = 1),
         |coll AS (SELECT string_agg(coalesce(b.term, q.qterm), ' ' ORDER BY q.pos) AS collation
         |         FROM q LEFT JOIN best b ON b.pos = q.pos),
         |corrset AS (SELECT DISTINCT coalesce(b.term, q.qterm) AS term
         |            FROM q LEFT JOIN best b ON b.pos = q.pos),
         |h AS (SELECT count(*) AS hits FROM (
         |  SELECT t.doc_id FROM tok t JOIN corrset c ON t.term = c.term
         |  GROUP BY t.doc_id
         |  HAVING count(DISTINCT t.term) = (SELECT count(*) FROM corrset)))
         |SELECT coll.collation, h.hits FROM coll CROSS JOIN h""".stripMargin,
    // group.query: two query-defined groups — g1 must(merge, window),
    // g2 should(batch, stream) — each with exact matches + top-2 docs
    "group_query" ->
      s"""WITH $TokCte,
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         |qdl AS (SELECT doc_id, CASE WHEN dl < 32 THEN dl
         |        ELSE 24 + (((dl - 24) >> (length(printf('%b', dl - 24)) - 4)) << (length(printf('%b', dl - 24)) - 4))
         |        END AS qdl FROM dl),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n,
         |       (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl),
         |dfs AS (SELECT term, count(*) AS df FROM tf
         |        WHERE term IN ('merge', 'window', 'batch', 'stream') GROUP BY term),
         |sc AS (SELECT tf.doc_id, tf.term,
         |        ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |          / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl)) AS ts
         |        FROM tf JOIN dfs ON tf.term = dfs.term
         |             JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st),
         |g1 AS (SELECT doc_id, sum(ts) AS score FROM sc
         |       WHERE term IN ('merge', 'window') GROUP BY doc_id
         |       HAVING count(DISTINCT term) = 2),
         |g2 AS (SELECT doc_id, sum(ts) AS score FROM sc
         |       WHERE term IN ('batch', 'stream') GROUP BY doc_id),
         |u AS (SELECT 'g1' AS group_query, doc_id, score FROM g1
         |      UNION ALL SELECT 'g2', doc_id, score FROM g2),
         |r AS (SELECT group_query,
         |        count(*) OVER (PARTITION BY group_query) AS matches,
         |        row_number() OVER (PARTITION BY group_query
         |          ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |        doc_id, round(score, 4) AS score FROM u)
         |SELECT group_query, matches, rank, doc_id, score FROM r
         |WHERE rank <= 2 ORDER BY group_query, rank""".stripMargin,
    // offsets-from-postings highlighting: per-occurrence (start, end)
    // char offsets read from the index's offsets channel; snippet cut
    // purely by offsets (±10 chars, <b>-bracketed), no re-analysis
    "highlight_offsets" ->
      """WITH tk AS (SELECT doc_id, text, string_split(text, ' ') AS toks
        |            FROM documents WHERE doc_id < 2000),
        |ix AS (SELECT doc_id, text, toks,
        |       CAST(unnest(range(len(toks))) AS INT) AS i FROM tk),
        |occ AS (SELECT doc_id, text,
        |        CASE WHEN i = 0 THEN 0
        |             ELSE length(array_to_string(toks[1:i], ' ')) + 1 END AS s
        |        FROM ix WHERE toks[i + 1] = 'merge'),
        |agg AS (SELECT doc_id, any_value(text) AS text,
        |        CAST(count(*) AS BIGINT) AS n_occ,
        |        CAST(min(s) AS BIGINT) AS first_start,
        |        CAST(min(s) + 5 AS BIGINT) AS first_end,
        |        md5(string_agg(CAST(s AS VARCHAR) || ':' || CAST(s + 5 AS VARCHAR),
        |                       ' ' ORDER BY s)) AS offs_md5
        |        FROM occ GROUP BY doc_id)
        |SELECT doc_id, n_occ, first_start, first_end, offs_md5,
        |  substr(text, CAST(greatest(first_start - 10, 0) AS INT) + 1,
        |         CAST(first_start - greatest(first_start - 10, 0) AS INT))
        |  || '<b>' || substr(text, CAST(first_start AS INT) + 1, 5) || '</b>'
        |  || substr(text, CAST(first_end AS INT) + 1, 10) AS snippet
        |FROM agg ORDER BY doc_id""".stripMargin,
    // UnifiedHighlighter maxPassages=2: top-5 BM25 docs -> 16-token
    // windows over RAW (pre-stop) tokens of the stored text, passage
    // score = sum idf(t)*tf_t(window), top-2 passages per doc
    "highlight_passages" ->
      s"""WITH $TokCte,
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         |qdl AS (SELECT doc_id, CASE WHEN dl < 32 THEN dl
         |        ELSE 24 + (((dl - 24) >> (length(printf('%b', dl - 24)) - 4)) << (length(printf('%b', dl - 24)) - 4))
         |        END AS qdl FROM dl),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n,
         |       (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl),
         |dfs AS (SELECT term, count(*) AS df FROM tf
         |        WHERE term IN ('merge', 'sort') GROUP BY term),
         |sc AS (SELECT tf.doc_id,
         |        sum(ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |            / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |        FROM tf JOIN dfs ON tf.term = dfs.term
         |             JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st
         |        GROUP BY tf.doc_id),
         |hits AS (SELECT doc_id, round(score, 4) AS score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, score FROM sc) WHERE rank <= 5),
         |rawt AS (SELECT d.doc_id,
         |        list_filter(string_split_regex(lower(d.text), '[^a-z0-9_]+'),
         |                    x -> x <> '') AS rtoks
         |        FROM documents d JOIN hits ON hits.doc_id = d.doc_id),
         |wins AS (SELECT r.doc_id, w.win,
         |        list_slice(r.rtoks, w.win * 16 + 1, w.win * 16 + 16) AS ptoks
         |        FROM rawt r,
         |             unnest(range(0, cast(floor((len(r.rtoks) - 1) / 16) AS int) + 1)) AS w(win)),
         |idfs AS (SELECT term, ln(1 + (st.n - df + 0.5) / (df + 0.5)) AS idf
         |         FROM dfs CROSS JOIN st),
         |scored AS (SELECT w.doc_id, w.win, w.ptoks,
         |        (SELECT coalesce(sum(i.idf * len(list_filter(w.ptoks, x -> x = i.term))), 0)
         |         FROM idfs i) AS pscore
         |        FROM wins w),
         |ranked AS (SELECT doc_id, win, ptoks, pscore,
         |        row_number() OVER (PARTITION BY doc_id
         |          ORDER BY round(pscore, 9) DESC, win) AS passage_rank
         |        FROM scored WHERE pscore > 0)
         |SELECT h.doc_id, h.score, r.passage_rank,
         |       r.win * 16 AS start_token,
         |       round(r.pscore, 4) AS passage_score,
         |       md5(array_to_string(r.ptoks, ' ')) AS passage_md5
         |FROM ranked r JOIN hits h ON h.doc_id = r.doc_id
         |WHERE r.passage_rank <= 2
         |ORDER BY h.doc_id, r.passage_rank""".stripMargin,
    // expressions module: _score + 0.2*ln(1+token_count) + (token_count >
    // 120 ? 0.5 : 0) over the merge/sort BM25 disjunction, re-ranked
    "function_expression" ->
      s"""WITH $TokCte,
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         |qdl AS (SELECT doc_id, CASE WHEN dl < 32 THEN dl
         |        ELSE 24 + (((dl - 24) >> (length(printf('%b', dl - 24)) - 4)) << (length(printf('%b', dl - 24)) - 4))
         |        END AS qdl FROM dl),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n,
         |       (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl),
         |dfs AS (SELECT term, count(*) AS df FROM tf
         |        WHERE term IN ('merge', 'sort') GROUP BY term),
         |sc AS (SELECT tf.doc_id,
         |        sum(ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |            / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |        FROM tf JOIN dfs ON tf.term = dfs.term
         |             JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st
         |        GROUP BY tf.doc_id),
         |fin AS (SELECT sc.doc_id, sc.score,
         |        sc.score + 0.2 * ln(1 + dl.dl)
         |          + CASE WHEN dl.dl > 120 THEN 0.5 ELSE 0 END AS final_score
         |        FROM sc JOIN dl ON dl.doc_id = sc.doc_id)
         |SELECT rank, doc_id, score, final_score FROM (
         |  SELECT row_number() OVER (ORDER BY round(final_score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score,
         |         round(final_score, 4) AS final_score FROM fin)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // IB LL-DF-H2: lambda = (df+1)/(N+1), tfn = tf * log2(1 + avgdl/qdl),
    // per-term score = ln(1 + tfn/lambda), summed over matched query terms
    "search_ib_ll" ->
      s"""WITH $TokCte,
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         |qdl AS (SELECT doc_id, CASE WHEN dl < 32 THEN dl
         |        ELSE 24 + (((dl - 24) >> (length(printf('%b', dl - 24)) - 4)) << (length(printf('%b', dl - 24)) - 4))
         |        END AS qdl FROM dl),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n,
         |       (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl),
         |dfs AS (SELECT term, count(*) AS df FROM tf
         |        WHERE term IN ('merge', 'sort') GROUP BY term),
         |sc AS (SELECT tf.doc_id,
         |        sum(ln(1 + tf.tf * (ln(1 + st.avgdl / qdl.qdl) / ln(2))
         |               / ((dfs.df + 1.0) / (st.n + 1.0)))) AS score
         |        FROM tf JOIN dfs ON tf.term = dfs.term
         |             JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st
         |        GROUP BY tf.doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score FROM sc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // Axiomatic F2EXP: idf = ((N+1)/df)^0.35,
    // per-term score = idf * tf / (tf + 0.5 + 0.5 * qdl / avgdl)
    "search_axiomatic_f2exp" ->
      s"""WITH $TokCte,
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         |qdl AS (SELECT doc_id, CASE WHEN dl < 32 THEN dl
         |        ELSE 24 + (((dl - 24) >> (length(printf('%b', dl - 24)) - 4)) << (length(printf('%b', dl - 24)) - 4))
         |        END AS qdl FROM dl),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n,
         |       (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl),
         |dfs AS (SELECT term, count(*) AS df FROM tf
         |        WHERE term IN ('merge', 'sort') GROUP BY term),
         |sc AS (SELECT tf.doc_id,
         |        sum(pow((st.n + 1.0) / dfs.df, 0.35) * tf.tf
         |            / (tf.tf + 0.5 + 0.5 * qdl.qdl / st.avgdl)) AS score
         |        FROM tf JOIN dfs ON tf.term = dfs.term
         |             JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st
         |        GROUP BY tf.doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score FROM sc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // block join to parents: BM25 MUST(merge, window) over children, then
    // ScoreMode.Max + child count rolled up per parent `source`
    "block_join_parent" ->
      s"""WITH $TokCte,
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         |qdl AS (SELECT doc_id, CASE WHEN dl < 32 THEN dl
         |        ELSE 24 + (((dl - 24) >> (length(printf('%b', dl - 24)) - 4)) << (length(printf('%b', dl - 24)) - 4))
         |        END AS qdl FROM dl),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n,
         |       (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl),
         |dfs AS (SELECT term, count(*) AS df FROM tf
         |        WHERE term IN ('merge', 'window') GROUP BY term),
         |sc AS (SELECT tf.doc_id,
         |        sum(ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |            / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |        FROM tf JOIN dfs ON tf.term = dfs.term
         |             JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st
         |        GROUP BY tf.doc_id
         |        HAVING count(DISTINCT CASE WHEN tf.term IN ('merge', 'window')
         |               THEN tf.term END) = 2)
         |SELECT d.source, round(max(sc.score), 4) AS parent_score,
         |       count(*) AS n_children
         |FROM sc JOIN documents d ON d.doc_id = sc.doc_id
         |GROUP BY d.source
         |ORDER BY parent_score DESC, d.source""".stripMargin,
    "block_join_child" ->
      s"""WITH $TokCte,
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         |qdl AS (SELECT doc_id, CASE WHEN dl < 32 THEN dl
         |        ELSE 24 + (((dl - 24) >> (length(printf('%b', dl - 24)) - 4)) << (length(printf('%b', dl - 24)) - 4))
         |        END AS qdl FROM dl),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n,
         |       (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl),
         |dfs AS (SELECT term, count(*) AS df FROM tf
         |        WHERE term IN ('merge', 'window') GROUP BY term),
         |sc AS (SELECT tf.doc_id,
         |        sum(ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |            / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |        FROM tf JOIN dfs ON tf.term = dfs.term
         |             JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st
         |        GROUP BY tf.doc_id
         |        HAVING count(DISTINCT CASE WHEN tf.term IN ('merge', 'window')
         |               THEN tf.term END) = 2),
         |par AS (SELECT d.source, round(max(sc.score), 4) AS parent_score
         |        FROM sc JOIN documents d ON d.doc_id = sc.doc_id
         |        GROUP BY d.source
         |        ORDER BY parent_score DESC, d.source LIMIT 2)
         |SELECT d.source, d.doc_id, par.parent_score
         |FROM documents d JOIN par ON d.source = par.source
         |ORDER BY parent_score DESC, d.source, d.doc_id""".stripMargin,
    // stemmed analyzer chain: query "merges windows" -> stems (merge,
    // window) scored over the stemmed-token index (dl unchanged — stemming
    // is 1:1 on tokens)
    "search_stemmed_bm25" ->
      s"""WITH $TokCte,
         |stok AS (SELECT doc_id, ${stemSql("term")} AS term FROM tok),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM stok GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, count(*) AS dl FROM stok GROUP BY doc_id),
         |qdl AS (SELECT doc_id, CASE WHEN dl < 32 THEN dl
         |        ELSE 24 + (((dl - 24) >> (length(printf('%b', dl - 24)) - 4)) << (length(printf('%b', dl - 24)) - 4))
         |        END AS qdl FROM dl),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n,
         |       (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl),
         |dfs AS (SELECT term, count(*) AS df FROM tf
         |        WHERE term IN ('merge', 'window') GROUP BY term),
         |sc AS (SELECT tf.doc_id,
         |        sum(ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |            / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |        FROM tf JOIN dfs ON tf.term = dfs.term
         |             JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st
         |        GROUP BY tf.doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score FROM sc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // full Porter chain: query "merged queries" -> stems (merg, queri)
    // scored over the Porter-stemmed index. The oracle inlines the Porter
    // map of the documents vocabulary as a CASE (only 6 of 31 tokens
    // change; PorterStemmerSpec pins the mapping against the published
    // algorithm, and drifts there must move this CASE in lockstep).
    "search_porter_bm25" ->
      s"""WITH $TokCte,
         |stok AS (SELECT doc_id, CASE term
         |  WHEN 'customer' THEN 'custom' WHEN 'merge' THEN 'merg'
         |  WHEN 'query' THEN 'queri' WHEN 'table' THEN 'tabl'
         |  WHEN 'value' THEN 'valu' WHEN 'key' THEN 'kei'
         |  ELSE term END AS term FROM tok),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM stok GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, count(*) AS dl FROM stok GROUP BY doc_id),
         |qdl AS (SELECT doc_id, CASE WHEN dl < 32 THEN dl
         |        ELSE 24 + (((dl - 24) >> (length(printf('%b', dl - 24)) - 4)) << (length(printf('%b', dl - 24)) - 4))
         |        END AS qdl FROM dl),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n,
         |       (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl),
         |dfs AS (SELECT term, count(*) AS df FROM tf
         |        WHERE term IN ('merg', 'queri') GROUP BY term),
         |sc AS (SELECT tf.doc_id,
         |        sum(ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |            / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |        FROM tf JOIN dfs ON tf.term = dfs.term
         |             JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st
         |        GROUP BY tf.doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score FROM sc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // multi-field edismax qf: content:merge + repo:src3^2, each clause
    // scored against its own field stats (repo: tf=1, dl=1, avgdl=ttf/N)
    "search_edismax_qf" ->
      s"""WITH $TokCte,
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         |qdl AS (SELECT doc_id, CASE WHEN dl < 32 THEN dl
         |        ELSE 24 + (((dl - 24) >> (length(printf('%b', dl - 24)) - 4)) << (length(printf('%b', dl - 24)) - 4))
         |        END AS qdl FROM dl),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n,
         |       (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl),
         |dfs AS (SELECT term, count(*) AS df FROM tf WHERE term = 'merge' GROUP BY term),
         |csc AS (SELECT tf.doc_id,
         |        sum(ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |            / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |        FROM tf JOIN dfs ON tf.term = dfs.term
         |             JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st
         |        GROUP BY tf.doc_id),
         |rtok AS (SELECT doc_id, lower(source) AS rterm FROM documents),
         |rstat AS (SELECT count(*) * 1.0 / (SELECT count(*) FROM documents) AS avgdl FROM rtok),
         |rdf AS (SELECT count(*) AS df FROM rtok WHERE rterm = 'src3'),
         |rsc AS (SELECT r.doc_id,
         |        2.0 * ln(1 + ((SELECT count(*) FROM documents) - rdf.df + 0.5) / (rdf.df + 0.5))
         |            / (1 + 1.2 * (0.25 + 0.75 * 1.0 / rstat.avgdl)) AS score
         |        FROM rtok r, rdf, rstat WHERE r.rterm = 'src3'),
         |allsc AS (SELECT coalesce(c.doc_id, r.doc_id) AS doc_id,
         |          coalesce(c.score, 0) + coalesce(r.score, 0) AS score
         |          FROM csc c FULL OUTER JOIN rsc r ON c.doc_id = r.doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score FROM allsc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // "+merge window^2.5 -error" through the text query parser
    "search_parsed" -> bm25Sql(Seq("merge", "window"), Seq("merge"),
      nots = Seq("error"), boosts = Map("window" -> 2.5)),
    // three parsed queries batched through ONE searchTrees scan; each
    // query's BM25 ranking is independent, ranks restart per qid
    "search_tree_batch" ->
      s"""WITH $TokCte,
         |$Bm25Ctes,
         |dfs AS (SELECT term, count(*) AS df FROM tf
         |        WHERE term IN ('merge', 'window', 'scan', 'table', 'class', 'extends')
         |        GROUP BY term),
         |sc1 AS (SELECT tf.doc_id,
         |        sum((CASE WHEN tf.term = 'window' THEN 2.5 ELSE 1.0 END) *
         |            ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |            / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |        FROM tf JOIN dfs ON tf.term = dfs.term
         |             JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st
         |        WHERE tf.term IN ('merge', 'window')
         |          AND tf.doc_id NOT IN (SELECT DISTINCT doc_id FROM tok WHERE term = 'error')
         |        GROUP BY tf.doc_id
         |        HAVING count(DISTINCT CASE WHEN tf.term = 'merge' THEN tf.term END) = 1),
         |sc2 AS (SELECT tf.doc_id,
         |        sum(ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |            / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |        FROM tf JOIN dfs ON tf.term = dfs.term
         |             JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st
         |        WHERE tf.term IN ('scan', 'table')
         |        GROUP BY tf.doc_id),
         |sc3 AS (SELECT tf.doc_id,
         |        sum(ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |            / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |        FROM tf JOIN dfs ON tf.term = dfs.term
         |             JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st
         |        WHERE tf.term IN ('class', 'extends')
         |        GROUP BY tf.doc_id
         |        HAVING count(DISTINCT CASE WHEN tf.term = 'extends' THEN tf.term END) = 1),
         |ranked AS (
         |  SELECT 'b1' AS qid, row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score FROM sc1
         |  UNION ALL
         |  SELECT 'b2', row_number() OVER (ORDER BY round(score, 9) DESC, doc_id),
         |         doc_id, round(score, 4) FROM sc2
         |  UNION ALL
         |  SELECT 'b3', row_number() OVER (ORDER BY round(score, 9) DESC, doc_id),
         |         doc_id, round(score, 4) FROM sc3)
         |SELECT qid, rank, doc_id, score FROM ranked
         |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,
    // compositional tree: '+(merge OR sort) "key order" wind* -lang:fr' —
    // required nested disjunction (BM25 sum over matching members), an
    // optional SCORED phrase (freq-scored, weight = idf(key)+idf(order)),
    // an optional constant-score wildcard expansion (wind* -> {window},
    // +1.0), and a prohibited lang filter
    "search_parsed_nested" ->
      s"""WITH $TokCte,
         |$Bm25Ctes,
         |$PosCtes,
         |dfs AS (SELECT term, count(*) AS df FROM tf WHERE term IN ('merge', 'sort') GROUP BY term),
         |base AS (SELECT tf.doc_id,
         |         sum(ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |             / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |         FROM tf JOIN dfs ON tf.term = dfs.term
         |              JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st
         |         GROUP BY tf.doc_id),
         |a AS (SELECT doc_id, pos FROM pp WHERE term = 'key'),
         |b AS (SELECT doc_id, pos FROM pp WHERE term = 'order'),
         |pf AS (SELECT a.doc_id, count(*) * 1.0 AS pf
         |       FROM a JOIN b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |       GROUP BY a.doc_id),
         |pdfs AS (SELECT term, count(*) AS df FROM tf WHERE term IN ('key', 'order') GROUP BY term),
         |pw AS (SELECT sum(ln(1 + ((SELECT n FROM st) - df + 0.5) / (df + 0.5))) AS w FROM pdfs),
         |wnd AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'window'),
         |sc AS (SELECT base.doc_id,
         |       base.score
         |       + coalesce(pw.w * pf.pf / (pf.pf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl)), 0)
         |       + CASE WHEN wnd.doc_id IS NOT NULL THEN 1.0 ELSE 0.0 END AS score
         |       FROM base
         |            JOIN documents dd ON dd.doc_id = base.doc_id AND dd.lang <> 'fr'
         |            JOIN qdl ON qdl.doc_id = base.doc_id
         |            CROSS JOIN st CROSS JOIN pw
         |            LEFT JOIN pf ON pf.doc_id = base.doc_id
         |            LEFT JOIN wnd ON wnd.doc_id = base.doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score FROM sc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // scored exact phrase "key order": phrase freq = adjacency count,
    // weight = idf(key) + idf(order), BM25-shaped freq saturation
    "search_phrase_scored" ->
      s"""WITH $TokCte,
         |$Bm25Ctes,
         |$PosCtes,
         |a AS (SELECT doc_id, pos FROM pp WHERE term = 'key'),
         |b AS (SELECT doc_id, pos FROM pp WHERE term = 'order'),
         |pf AS (SELECT a.doc_id, count(*) * 1.0 AS pf
         |       FROM a JOIN b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |       GROUP BY a.doc_id),
         |dfs AS (SELECT term, count(*) AS df FROM tf WHERE term IN ('key', 'order') GROUP BY term),
         |w AS (SELECT sum(ln(1 + ((SELECT n FROM st) - df + 0.5) / (df + 0.5))) AS w FROM dfs),
         |sc AS (SELECT pf.doc_id,
         |       w.w * pf.pf / (pf.pf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl)) AS score
         |       FROM pf CROSS JOIN w CROSS JOIN st
         |            JOIN qdl ON qdl.doc_id = pf.doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score FROM sc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // scored MultiPhrase "merge (sort|window)": slot-2 union, phrase freq
    // over merged positions, weight = sum of all three member idfs
    "search_multi_phrase" ->
      s"""WITH $TokCte,
         |$Bm25Ctes,
         |$PosCtes,
         |a AS (SELECT doc_id, pos FROM pp WHERE term = 'merge'),
         |b AS (SELECT doc_id, pos FROM pp WHERE term IN ('sort', 'window')),
         |pf AS (SELECT a.doc_id, count(*) * 1.0 AS pf
         |       FROM a JOIN b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |       GROUP BY a.doc_id),
         |dfs AS (SELECT term, count(*) AS df FROM tf
         |        WHERE term IN ('merge', 'sort', 'window') GROUP BY term),
         |w AS (SELECT sum(ln(1 + ((SELECT n FROM st) - df + 0.5) / (df + 0.5))) AS w FROM dfs),
         |sc AS (SELECT pf.doc_id,
         |       w.w * pf.pf / (pf.pf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl)) AS score
         |       FROM pf CROSS JOIN w CROSS JOIN st
         |            JOIN qdl ON qdl.doc_id = pf.doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score FROM sc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // adaptive range execution: per-lang count of docs holding any
    // non-stop term in [sa, so) — path choice is execution-only
    "search_range_adaptive" ->
      s"""WITH $TokCte,
         |hit AS (SELECT DISTINCT doc_id FROM tok
         |        WHERE term >= 'sa' AND term < 'so')
         |SELECT d.lang, count(*) AS cnt
         |FROM hit h JOIN documents d ON d.doc_id = h.doc_id
         |GROUP BY d.lang ORDER BY cnt DESC, lang""".stripMargin,
    // edismax pf: BM25 over should(key, order) + 2.0-boosted exact-phrase
    // component for docs where "key order" occurs adjacently
    "search_edismax_pf" ->
      s"""WITH $TokCte,
         |$Bm25Ctes,
         |$PosCtes,
         |dfs AS (SELECT term, count(*) AS df FROM tf WHERE term IN ('key', 'order') GROUP BY term),
         |base AS (
         |  SELECT tf.doc_id,
         |         sum(ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |             / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |  FROM tf JOIN dfs ON tf.term = dfs.term
         |       JOIN qdl ON tf.doc_id = qdl.doc_id
         |       CROSS JOIN st
         |  GROUP BY tf.doc_id),
         |a AS (SELECT doc_id, pos FROM pp WHERE term = 'key'),
         |b AS (SELECT doc_id, pos FROM pp WHERE term = 'order'),
         |pf AS (SELECT a.doc_id, count(*) * 1.0 AS pf
         |       FROM a JOIN b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |       GROUP BY a.doc_id),
         |w AS (SELECT sum(ln(1 + ((SELECT n FROM st) - df + 0.5) / (df + 0.5))) AS w FROM dfs),
         |sc AS (SELECT base.doc_id,
         |       base.score
         |       + coalesce(2.0 * w.w * pf.pf / (pf.pf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl)), 0) AS score
         |       FROM base JOIN qdl ON qdl.doc_id = base.doc_id
         |            CROSS JOIN st CROSS JOIN w
         |            LEFT JOIN pf ON pf.doc_id = base.doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score FROM sc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // scored 3-term sloppy phrase "key order sort"~2: anchored total
    // displacement d(p0) = min|p_order-(p0+1)| + min|p_sort-(p0+2)|,
    // freq = sum of 1/(d+1) over anchors with d <= 2
    "search_phrase_sloppy3" ->
      s"""WITH $TokCte,
         |$Bm25Ctes,
         |$PosCtes,
         |a AS (SELECT doc_id, pos FROM pp WHERE term = 'key'),
         |b AS (SELECT doc_id, pos FROM pp WHERE term = 'order'),
         |c AS (SELECT doc_id, pos FROM pp WHERE term = 'sort'),
         |d1 AS (SELECT a.doc_id, a.pos, min(abs(b.pos - (a.pos + 1))) AS d1
         |       FROM a JOIN b ON a.doc_id = b.doc_id GROUP BY a.doc_id, a.pos),
         |d2 AS (SELECT a.doc_id, a.pos, min(abs(c.pos - (a.pos + 2))) AS d2
         |       FROM a JOIN c ON a.doc_id = c.doc_id GROUP BY a.doc_id, a.pos),
         |pf AS (SELECT d1.doc_id, sum(1.0 / (d1.d1 + d2.d2 + 1)) AS pf
         |       FROM d1 JOIN d2 ON d1.doc_id = d2.doc_id AND d1.pos = d2.pos
         |       WHERE d1.d1 + d2.d2 <= 2 GROUP BY d1.doc_id),
         |dfs AS (SELECT term, count(*) AS df FROM tf WHERE term IN ('key', 'order', 'sort') GROUP BY term),
         |w AS (SELECT sum(ln(1 + ((SELECT n FROM st) - df + 0.5) / (df + 0.5))) AS w FROM dfs),
         |sc AS (SELECT pf.doc_id,
         |       w.w * pf.pf / (pf.pf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl)) AS score
         |       FROM pf CROSS JOIN w CROSS JOIN st
         |            JOIN qdl ON qdl.doc_id = pf.doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score FROM sc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // fuzzy 'sort'~2 as RANKED DOCS: dictionary expansion by edit distance
    // within the prefixLength=1 gate (first char shared), per-term boost
    // 1 - dist/min(len, 4), BM25 sum over matching expansions
    "search_fuzzy_docs" ->
      s"""WITH $TokCte,
         |$Bm25Ctes,
         |dfs AS (SELECT term, count(*) AS df FROM tf
         |        WHERE substr(term, 1, 1) = 's' GROUP BY term
         |        HAVING levenshtein(term, 'sort') <= 2),
         |sc AS (SELECT tf.doc_id,
         |       sum((1 - levenshtein(tf.term, 'sort') * 1.0 / least(length(tf.term), 4))
         |           * ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |           / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |       FROM tf JOIN dfs ON tf.term = dfs.term
         |            JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st
         |       GROUP BY tf.doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score FROM sc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // TermRangeQuery [fast TO key]: docs containing any dictionary term in
    // the range, constant-score set semantics
    "search_term_range" ->
      s"""WITH $TokCte
         |SELECT DISTINCT doc_id FROM tok
         |WHERE term >= 'fast' AND term <= 'key'
         |ORDER BY doc_id LIMIT 100""".stripMargin,
    // SynonymQuery(merge, join): blended stats — pseudo-term freq = sum of
    // member tfs per doc, df = MAX of member dfs, scored ONCE by BM25
    "search_synonym" ->
      s"""WITH $TokCte,
         |$Bm25Ctes,
         |dfs AS (SELECT term, count(*) AS df FROM tf WHERE term IN ('merge', 'join') GROUP BY term),
         |sdf AS (SELECT max(df) AS df FROM dfs),
         |stf AS (SELECT doc_id, sum(tf) AS tf FROM tf WHERE term IN ('merge', 'join') GROUP BY doc_id),
         |sc AS (
         |  SELECT stf.doc_id,
         |         ln(1 + (st.n - sdf.df + 0.5) / (sdf.df + 0.5)) * stf.tf
         |           / (stf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl)) AS score
         |  FROM stf JOIN qdl ON stf.doc_id = qdl.doc_id
         |       CROSS JOIN st CROSS JOIN sdf)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score
         |  FROM sc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // "merge sort" parsed under synonym config sort={order}: score =
    // bm25(merge) + synonym-blend(sort, order) (freq = sum of member tfs,
    // df = max of member dfs), docs matching either clause
    "search_synonym_config" ->
      s"""WITH $TokCte,
         |$Bm25Ctes,
         |mdf AS (SELECT count(*) AS df FROM tf WHERE term = 'merge'),
         |msc AS (SELECT tf.doc_id,
         |        ln(1 + (st.n - mdf.df + 0.5) / (mdf.df + 0.5)) * tf.tf
         |          / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl)) AS score
         |        FROM tf JOIN qdl ON tf.doc_id = qdl.doc_id
         |             CROSS JOIN st CROSS JOIN mdf
         |        WHERE tf.term = 'merge'),
         |sdf AS (SELECT max(df) AS df FROM (
         |        SELECT term, count(*) AS df FROM tf
         |        WHERE term IN ('sort', 'order') GROUP BY term)),
         |stf AS (SELECT doc_id, sum(tf) AS tf FROM tf
         |        WHERE term IN ('sort', 'order') GROUP BY doc_id),
         |ssc AS (SELECT stf.doc_id,
         |        ln(1 + (st.n - sdf.df + 0.5) / (sdf.df + 0.5)) * stf.tf
         |          / (stf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl)) AS score
         |        FROM stf JOIN qdl ON stf.doc_id = qdl.doc_id
         |             CROSS JOIN st CROSS JOIN sdf),
         |allsc AS (SELECT coalesce(m.doc_id, s.doc_id) AS doc_id,
         |                 coalesce(m.score, 0) + coalesce(s.score, 0) AS score
         |          FROM msc m FULL OUTER JOIN ssc s ON m.doc_id = s.doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score FROM allsc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // multi-word (graph) synonym: TermQuery(sort) OR PhraseQuery("merge
    // order") — the boolean QueryBuilder.analyzeGraphBoolean emits for a
    // one-to-many-token rule; phrase side scored with weight = sum of
    // member idfs over exact-adjacency freq
    "search_synonym_graph" ->
      s"""WITH $TokCte,
         |$Bm25Ctes,
         |$PosCtes,
         |a AS (SELECT doc_id, pos FROM pp WHERE term = 'merge'),
         |b AS (SELECT doc_id, pos FROM pp WHERE term = 'order'),
         |pf AS (SELECT a.doc_id, count(*) * 1.0 AS pf
         |       FROM a JOIN b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |       GROUP BY a.doc_id),
         |pdfs AS (SELECT term, count(*) AS df FROM tf
         |         WHERE term IN ('merge', 'order') GROUP BY term),
         |pw AS (SELECT sum(ln(1 + ((SELECT n FROM st) - df + 0.5) / (df + 0.5))) AS w FROM pdfs),
         |psc AS (SELECT pf.doc_id,
         |        pw.w * pf.pf / (pf.pf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl)) AS score
         |        FROM pf CROSS JOIN pw CROSS JOIN st
         |             JOIN qdl ON qdl.doc_id = pf.doc_id),
         |tdf AS (SELECT count(*) AS df FROM tf WHERE term = 'sort'),
         |tsc AS (SELECT tf.doc_id,
         |        ln(1 + (st.n - tdf.df + 0.5) / (tdf.df + 0.5)) * tf.tf
         |          / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl)) AS score
         |        FROM tf CROSS JOIN tdf CROSS JOIN st
         |             JOIN qdl ON qdl.doc_id = tf.doc_id
         |        WHERE tf.term = 'sort'),
         |sc AS (SELECT coalesce(t.doc_id, p.doc_id) AS doc_id,
         |       coalesce(t.score, 0) + coalesce(p.score, 0) AS score
         |       FROM tsc t FULL OUTER JOIN psc p ON p.doc_id = t.doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score FROM sc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // index-time synonym canonicalization: order -> sort applied in the
    // index analyzer, so the group's postings and df are TRULY merged
    // (contrast search_synonym_config's query-time max-df blend above);
    // query "sort merge" over the canonicalized token stream
    "search_synonym_index" ->
      s"""WITH $TokCte,
         |stok AS (SELECT doc_id,
         |         CASE term WHEN 'order' THEN 'sort' ELSE term END AS term
         |         FROM tok),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM stok GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, count(*) AS dl FROM stok GROUP BY doc_id),
         |qdl AS (SELECT doc_id, CASE WHEN dl < 32 THEN dl
         |        ELSE 24 + (((dl - 24) >> (length(printf('%b', dl - 24)) - 4)) << (length(printf('%b', dl - 24)) - 4))
         |        END AS qdl FROM dl),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n,
         |       (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl),
         |dfs AS (SELECT term, count(*) AS df FROM tf
         |        WHERE term IN ('sort', 'merge') GROUP BY term),
         |sc AS (SELECT tf.doc_id,
         |        sum(ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |            / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |        FROM tf JOIN dfs ON tf.term = dfs.term
         |             JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st
         |        GROUP BY tf.doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score FROM sc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // language-routed search: every doc analyzed by its lang's stemmer in
    // ONE index (no stop filtering on either side), query "customers
    // filter" stemmed under fr rules -> (custom, filt), scored docs
    // filtered to lang='fr' (unscored FILTER channel; stats collection-wide)
    "search_lang_routed" ->
      s"""WITH rawt AS (SELECT doc_id, lang,
         |  list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
         |              x -> x <> '') AS toks0
         |  FROM documents),
         |sm AS (SELECT doc_id, lang,
         |  CASE WHEN lang = 'fr' THEN list_transform(toks0, x -> CASE x
         |         WHEN 'customer' THEN 'custom' WHEN 'filter' THEN 'filt'
         |         WHEN 'vector' THEN 'vecto' ELSE x END)
         |       WHEN lang = 'de' THEN list_transform(toks0, x -> CASE x
         |         WHEN 'merge' THEN 'merg' WHEN 'table' THEN 'tabl'
         |         WHEN 'value' THEN 'valu' WHEN 'column' THEN 'colum'
         |         ELSE x END)
         |       ELSE toks0 END AS toks FROM rawt),
         |tok AS (SELECT doc_id, t.term FROM sm, unnest(toks) AS t(term)),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         |qdl AS (SELECT doc_id, CASE WHEN dl < 32 THEN dl
         |        ELSE 24 + (((dl - 24) >> (length(printf('%b', dl - 24)) - 4)) << (length(printf('%b', dl - 24)) - 4))
         |        END AS qdl FROM dl),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n,
         |       (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl),
         |dfs AS (SELECT term, count(*) AS df FROM tf
         |        WHERE term IN ('custom', 'filt') GROUP BY term),
         |sc AS (SELECT tf.doc_id,
         |        sum(ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |            / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |        FROM tf JOIN dfs ON tf.term = dfs.term
         |             JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st
         |             JOIN documents d ON d.doc_id = tf.doc_id
         |        WHERE d.lang = 'fr'
         |        GROUP BY tf.doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score FROM sc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // Solr rerank: top-30 window of (merge OR sort), rescored as
    // firstPass + 2.0 * bm25(window); misses keep their first-pass score
    "search_rerank" ->
      s"""WITH $TokCte,
         |$Bm25Ctes,
         |df1 AS (SELECT term, count(*) AS df FROM tf WHERE term IN ('merge', 'sort') GROUP BY term),
         |sc1 AS (
         |  SELECT tf.doc_id,
         |         sum(ln(1 + (st.n - df1.df + 0.5) / (df1.df + 0.5)) * tf.tf
         |             / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |  FROM tf JOIN df1 ON tf.term = df1.term
         |       JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st
         |  GROUP BY tf.doc_id),
         |fw AS (SELECT doc_id, score FROM (
         |  SELECT doc_id, score,
         |         row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rn
         |  FROM sc1) WHERE rn <= 30),
         |df2 AS (SELECT term, count(*) AS df FROM tf WHERE term IN ('window') GROUP BY term),
         |sc2 AS (
         |  SELECT tf.doc_id,
         |         sum(ln(1 + (st.n - df2.df + 0.5) / (df2.df + 0.5)) * tf.tf
         |             / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |  FROM tf JOIN df2 ON tf.term = df2.term
         |       JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st
         |  GROUP BY tf.doc_id),
         |comb AS (
         |  SELECT fw.doc_id, fw.score + 2.0 * coalesce(sc2.score, 0) AS score
         |  FROM fw LEFT JOIN sc2 ON fw.doc_id = sc2.doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score
         |  FROM comb)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // LTR linear model over the first-pass window: 0.6*orig +
    // 0.25*ln(1+dl) + 0.15*(lang='en'); dl == the analyzer token count
    // (the same dl CTE the norms derive from)
    "search_ltr_linear" ->
      s"""WITH $TokCte,
         |$Bm25Ctes,
         |df1 AS (SELECT term, count(*) AS df FROM tf WHERE term IN ('merge', 'sort') GROUP BY term),
         |sc1 AS (
         |  SELECT tf.doc_id,
         |         sum(ln(1 + (st.n - df1.df + 0.5) / (df1.df + 0.5)) * tf.tf
         |             / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |  FROM tf JOIN df1 ON tf.term = df1.term
         |       JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st
         |  GROUP BY tf.doc_id),
         |fw AS (SELECT doc_id, score FROM (
         |  SELECT doc_id, score,
         |         row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rn
         |  FROM sc1) WHERE rn <= 30),
         |lt AS (
         |  SELECT fw.doc_id,
         |         0.6 * fw.score + 0.25 * ln(1.0 + dl.dl)
         |           + 0.15 * (CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.0 END) AS ltr
         |  FROM fw JOIN dl ON dl.doc_id = fw.doc_id
         |       JOIN documents d ON d.doc_id = fw.doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(ltr, 9) DESC, doc_id) AS rank,
         |         doc_id, round(ltr, 4) AS score
         |  FROM lt)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // LTR additive-trees ensemble: the same BM25 window as ltr_linear,
    // rescored by 3 fixed depth-2 trees (weights 1.0 / 0.5 / 0.25) over
    // (first-pass score, analyzed doc length, lang) — thresholds on the
    // score compare at round(.,9) so sub-ulp sum differences can't flip
    "search_ltr_trees" ->
      s"""WITH $TokCte,
         |$Bm25Ctes,
         |df1 AS (SELECT term, count(*) AS df FROM tf WHERE term IN ('merge', 'sort') GROUP BY term),
         |sc1 AS (
         |  SELECT tf.doc_id,
         |         sum(ln(1 + (st.n - df1.df + 0.5) / (df1.df + 0.5)) * tf.tf
         |             / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |  FROM tf JOIN df1 ON tf.term = df1.term
         |       JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st
         |  GROUP BY tf.doc_id),
         |fw AS (SELECT doc_id, score FROM (
         |  SELECT doc_id, score,
         |         row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rn
         |  FROM sc1) WHERE rn <= 30),
         |lt AS (
         |  SELECT fw.doc_id,
         |         (CASE WHEN round(fw.score, 9) <= 2.0
         |               THEN CASE WHEN dl.dl <= 300 THEN 0.1 ELSE 0.3 END
         |               ELSE CASE WHEN round(fw.score, 9) <= 4.0 THEN 0.8 ELSE 1.2 END END)
         |         + 0.5 * (CASE WHEN d.lang <> 'en' THEN 0.05
         |                  ELSE CASE WHEN dl.dl <= 500 THEN 0.4 ELSE 0.6 END END)
         |         + 0.25 * (CASE WHEN dl.dl <= 100 THEN -0.2
         |                   ELSE CASE WHEN round(fw.score, 9) <= 3.0 THEN 0.2 ELSE 0.5 END END) AS ltr
         |  FROM fw JOIN dl ON dl.doc_id = fw.doc_id
         |       JOIN documents d ON d.doc_id = fw.doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(ltr, 9) DESC, doc_id) AS rank,
         |         doc_id, round(ltr, 4) AS score
         |  FROM lt)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // significantTerms: foreground = docs containing 'merge'; score =
    // (fg_df/fgN) * ln((N+1)/(df+1)); bg df == termdict df by construction
    "significant_terms" ->
      s"""WITH $TokCte,
         |fgids AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'merge'),
         |fgn AS (SELECT count(*) AS n FROM fgids),
         |fgt AS (SELECT t.term, count(DISTINCT t.doc_id) AS fg_df
         |        FROM tok t JOIN fgids f ON t.doc_id = f.doc_id
         |        GROUP BY t.term
         |        HAVING count(DISTINCT t.doc_id) >= 5),
         |bg AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term)
         |SELECT fgt.term, fgt.fg_df, bg.df,
         |       round((fgt.fg_df * 1.0 / fgn.n)
         |             * ln(((SELECT count(*) FROM documents) + 1.0) / (bg.df + 1.0)), 6) AS score
         |FROM fgt JOIN bg ON fgt.term = bg.term CROSS JOIN fgn
         |ORDER BY score DESC, fgt.term LIMIT 20""".stripMargin,
    // RRF hybrid: BM25(merge, sort) top-20 ranking fused with the cosine
    // top-20 ranking against embedding 0 via sum of 1/(60 + rank)
    "search_rrf_hybrid" ->
      s"""WITH $TokCte,
         |$Bm25Ctes,
         |dfs AS (SELECT term, count(*) AS df FROM tf WHERE term IN ('merge', 'sort') GROUP BY term),
         |sc AS (
         |  SELECT tf.doc_id,
         |         sum(ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |             / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |  FROM tf JOIN dfs ON tf.term = dfs.term
         |       JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st
         |  GROUP BY tf.doc_id),
         |lex AS (SELECT doc_id, lrank FROM (
         |  SELECT doc_id, row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS lrank
         |  FROM sc) WHERE lrank <= 20),
         |q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
         |vec AS (SELECT doc_id, vrank FROM (
         |  SELECT vec_id AS doc_id,
         |         row_number() OVER (ORDER BY cos DESC, vec_id) AS vrank
         |  FROM (SELECT e.vec_id, $CosSql AS cos
         |        FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0))
         |  WHERE vrank <= 20),
         |fused AS (
         |  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
         |         round(coalesce(CAST(1.0 AS DOUBLE) / (60 + l.lrank), 0)
         |               + coalesce(CAST(1.0 AS DOUBLE) / (60 + v.vrank), 0), 6) AS rrf
         |  FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id)
         |SELECT rank, doc_id, rrf FROM (
         |  SELECT row_number() OVER (ORDER BY rrf DESC, doc_id) AS rank,
         |         doc_id, rrf FROM fused)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // searchAfter score cursor: page 2 (ranks 11..20 re-ranked 1..10) of
    // the (merge, sort, window) ranking
    "search_after_score" -> bm25Sql(Seq("merge", "sort", "window"), Nil,
      offset = 10),
    // facet over a query's MATCH DOMAIN (q = stream AND batch): lang
    // terms-facet + tokenCount stat, computed only over matching docs
    "facet_search_domain" ->
      s"""WITH $TokCte,
         |m AS (SELECT doc_id FROM tok WHERE term IN ('stream', 'batch')
         |      GROUP BY doc_id HAVING count(DISTINCT term) = 2),
         |tc AS (SELECT doc_id,
         |       len(list_filter($QualityTokSql, x -> x NOT IN ($StopSql))) AS token_count
         |       FROM documents)
         |SELECT d.lang, count(*) AS cnt,
         |       CAST(sum(tc.token_count) AS BIGINT) AS sum_tokens
         |FROM m JOIN documents d ON d.doc_id = m.doc_id
         |       JOIN tc ON tc.doc_id = m.doc_id
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
    // "scan table +lang:en": lang filter lowered from field syntax
    "search_parsed_filter" -> bm25Sql(Seq("scan", "table"), Nil, lang = Some("en")),
    "search_prefix" ->
      s"""WITH $TokCte
         |SELECT DISTINCT doc_id FROM tok WHERE term LIKE 'wind%'
         |ORDER BY doc_id LIMIT 100""".stripMargin,
    "search_dismax" -> bm25Sql(Seq("merge", "sort", "window"), Nil,
      dismaxTb = Some(0.3)),
    "search_boosted" -> bm25Sql(Seq("merge", "sort"), Nil,
      boosts = Map("merge" -> 2.5)),
    "search_phrase" ->
      s"""SELECT doc_id FROM (
         |  SELECT doc_id, ' ' || array_to_string($QualityTokSql, ' ') || ' ' AS tokstr
         |  FROM documents)
         |WHERE contains(tokstr, ' key order ') ORDER BY doc_id""".stripMargin,
    // SpanFirstQuery(window, 12): an occurrence whose raw token position p
    // (stop-word slots counted) satisfies endPosition = p + 1 <= 12
    "search_span_first" ->
      s"""WITH $PosCtes
         |SELECT DISTINCT doc_id FROM pp
         |WHERE term = 'window' AND pos + 1 <= 12
         |ORDER BY doc_id""".stripMargin,
    // SpanNearQuery(merge, sort; slop=4, ordered): positions in query order,
    // intervening-slack (pb - pa + 1) - 2 <= 4; greedy chain == EXISTS join
    "search_span_near" ->
      s"""WITH $PosCtes,
         |a AS (SELECT doc_id, pos FROM pp WHERE term = 'merge'),
         |b AS (SELECT doc_id, pos FROM pp WHERE term = 'sort')
         |SELECT DISTINCT a.doc_id AS doc_id
         |FROM a JOIN b ON a.doc_id = b.doc_id
         |WHERE b.pos > a.pos AND (b.pos - a.pos + 1) - 2 <= 4
         |ORDER BY doc_id""".stripMargin,
    // Nested spans: SpanNear(ordered, slop=20) over [SpanTerm(merge),
    // phrase-span "key order"]: phrase span [k, k+2) starts at or after the
    // merge span's end (m+1); slack = (k+2 - m) - 3 <= 20
    "search_span_near_phrase" ->
      s"""WITH $PosCtes,
         |a AS (SELECT doc_id, pos FROM pp WHERE term = 'merge'),
         |ph AS (SELECT k.doc_id, k.pos
         |       FROM pp k JOIN pp o ON o.doc_id = k.doc_id AND o.pos = k.pos + 1
         |       WHERE k.term = 'key' AND o.term = 'order')
         |SELECT DISTINCT a.doc_id AS doc_id
         |FROM a JOIN ph ON ph.doc_id = a.doc_id
         |WHERE ph.pos >= a.pos + 1 AND (ph.pos + 2 - a.pos) - 3 <= 20
         |ORDER BY doc_id""".stripMargin,
    // SpanNotQuery(merge, sort; dist=3): an occurrence of 'merge' more than
    // 3 positions from every 'sort' (docs without 'sort' pass trivially)
    "search_span_not" ->
      s"""WITH $PosCtes,
         |a AS (SELECT doc_id, pos FROM pp WHERE term = 'merge'),
         |b AS (SELECT doc_id, pos FROM pp WHERE term = 'sort')
         |SELECT DISTINCT a.doc_id AS doc_id FROM a
         |WHERE NOT EXISTS (SELECT 1 FROM b
         |       WHERE b.doc_id = a.doc_id AND abs(b.pos - a.pos) <= 3)
         |ORDER BY doc_id""".stripMargin,
    // SpanNearQuery(sort, merge, window; slop=6, unordered): any-order
    // covering window, slack (max - min + 1) - 3 <= 6
    "search_span_near_unordered" ->
      s"""WITH $PosCtes,
         |a AS (SELECT doc_id, pos FROM pp WHERE term = 'sort'),
         |b AS (SELECT doc_id, pos FROM pp WHERE term = 'merge'),
         |c AS (SELECT doc_id, pos FROM pp WHERE term = 'window')
         |SELECT DISTINCT a.doc_id AS doc_id
         |FROM a JOIN b ON a.doc_id = b.doc_id
         |       JOIN c ON a.doc_id = c.doc_id
         |WHERE (greatest(a.pos, b.pos, c.pos) - least(a.pos, b.pos, c.pos) + 1) - 3 <= 6
         |ORDER BY doc_id""".stripMargin,
    // SpanOr at the top: SpanNear(merge, sort; slop=4, ordered) OR the
    // exact-phrase span "key order" — union of the two span sets
    "search_span_or" ->
      s"""WITH $PosCtes,
         |a AS (SELECT doc_id, pos FROM pp WHERE term = 'merge'),
         |b AS (SELECT doc_id, pos FROM pp WHERE term = 'sort'),
         |near AS (SELECT DISTINCT a.doc_id FROM a JOIN b ON a.doc_id = b.doc_id
         |         WHERE b.pos > a.pos AND (b.pos - a.pos + 1) - 2 <= 4),
         |ph AS (SELECT DISTINCT k.doc_id
         |       FROM pp k JOIN pp o ON o.doc_id = k.doc_id AND o.pos = k.pos + 1
         |       WHERE k.term = 'key' AND o.term = 'order')
         |SELECT doc_id FROM (SELECT doc_id FROM near UNION SELECT doc_id FROM ph)
         |ORDER BY doc_id""".stripMargin,
    // SpanOr AS A SUBSPAN: SpanNear(ordered, slop=8) over
    // [SpanOr(merge | "key order"), window] — or-spans have widths 1 and 2,
    // the chain uses the PICKED span's (s, e): window w >= e and slack
    // (w + 1 - s) - ((e - s) + 1) <= 8
    "search_span_or_near" ->
      s"""WITH $PosCtes,
         |orsp AS (SELECT doc_id, pos AS s, pos + 1 AS e FROM pp WHERE term = 'merge'
         |         UNION ALL
         |         SELECT k.doc_id, k.pos, k.pos + 2
         |         FROM pp k JOIN pp o ON o.doc_id = k.doc_id AND o.pos = k.pos + 1
         |         WHERE k.term = 'key' AND o.term = 'order'),
         |w AS (SELECT doc_id, pos FROM pp WHERE term = 'window')
         |SELECT DISTINCT orsp.doc_id AS doc_id
         |FROM orsp JOIN w ON w.doc_id = orsp.doc_id
         |WHERE w.pos >= orsp.e AND (w.pos + 1 - orsp.s) - (orsp.e - orsp.s + 1) <= 8
         |ORDER BY doc_id""".stripMargin,
    // SpanNot AS A SUBSPAN: SpanNear(ordered, slop=10) over
    // [SpanNot(merge, sort; dist=2), window]: surviving merge positions
    // (no sort within 2) chain to a window at w >= p + 1, slack
    // (w + 1 - p) - 2 <= 10
    "search_span_not_nested" ->
      s"""WITH $PosCtes,
         |inc AS (SELECT a.doc_id, a.pos FROM pp a WHERE a.term = 'merge'
         |        AND NOT EXISTS (SELECT 1 FROM pp b
         |             WHERE b.doc_id = a.doc_id AND b.term = 'sort'
         |               AND abs(b.pos - a.pos) <= 2)),
         |w AS (SELECT doc_id, pos FROM pp WHERE term = 'window')
         |SELECT DISTINCT inc.doc_id AS doc_id
         |FROM inc JOIN w ON w.doc_id = inc.doc_id
         |WHERE w.pos >= inc.pos + 1 AND (w.pos + 1 - inc.pos) - 2 <= 10
         |ORDER BY doc_id""".stripMargin,
    // SpanContaining: merge..window near spans (slop 8, widths 1+1) that
    // contain a 'sort' position
    "search_span_containing" ->
      s"""WITH $PosCtes,
         |m AS (SELECT doc_id, pos FROM pp WHERE term = 'merge'),
         |w AS (SELECT doc_id, pos FROM pp WHERE term = 'window'),
         |big AS (SELECT m.doc_id, m.pos AS s, w.pos + 1 AS e
         |        FROM m JOIN w ON w.doc_id = m.doc_id
         |        WHERE w.pos >= m.pos + 1 AND (w.pos + 1 - m.pos) - 2 <= 8),
         |lit AS (SELECT doc_id, pos FROM pp WHERE term = 'sort')
         |SELECT DISTINCT big.doc_id AS doc_id
         |FROM big JOIN lit ON lit.doc_id = big.doc_id
         |WHERE big.s <= lit.pos AND lit.pos + 1 <= big.e
         |ORDER BY doc_id""".stripMargin,
    // SpanWithin under SpanFirst: 'sort' inside a merge..window span,
    // ending by position 60
    "search_span_within" ->
      s"""WITH $PosCtes,
         |m AS (SELECT doc_id, pos FROM pp WHERE term = 'merge'),
         |w AS (SELECT doc_id, pos FROM pp WHERE term = 'window'),
         |big AS (SELECT m.doc_id, m.pos AS s, w.pos + 1 AS e
         |        FROM m JOIN w ON w.doc_id = m.doc_id
         |        WHERE w.pos >= m.pos + 1 AND (w.pos + 1 - m.pos) - 2 <= 8),
         |lit AS (SELECT doc_id, pos FROM pp WHERE term = 'sort')
         |SELECT DISTINCT lit.doc_id AS doc_id
         |FROM lit JOIN big ON big.doc_id = lit.doc_id
         |WHERE big.s <= lit.pos AND lit.pos + 1 <= big.e AND lit.pos + 1 <= 60
         |ORDER BY doc_id""".stripMargin,
    // SpanPositionRange over merge..sort near spans: wholly inside [5, 80]
    "search_span_posrange" ->
      s"""WITH $PosCtes,
         |m AS (SELECT doc_id, pos FROM pp WHERE term = 'merge'),
         |srt AS (SELECT doc_id, pos FROM pp WHERE term = 'sort'),
         |sp AS (SELECT m.doc_id, m.pos AS s, srt.pos + 1 AS e
         |       FROM m JOIN srt ON srt.doc_id = m.doc_id
         |       WHERE srt.pos >= m.pos + 1 AND (srt.pos + 1 - m.pos) - 2 <= 4)
         |SELECT DISTINCT doc_id FROM sp
         |WHERE s >= 5 AND e <= 80 ORDER BY doc_id""".stripMargin,
    // IntervalQuery + saturation: freq = sum 1/(1+gaps) over minimal
    // ordered(key, value) intervals, score = freq/(freq+1)
    "search_interval_scored" ->
      s"""WITH $PosCtes,
         |a AS (SELECT doc_id, pos FROM pp WHERE term = 'key'),
         |b AS (SELECT doc_id, pos FROM pp WHERE term = 'value'),
         |cand AS (SELECT DISTINCT a.doc_id, a.pos AS s, b.pos + 1 AS e
         |         FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos > a.pos),
         |mini AS ($IntervalMiniSql),
         |sc AS (SELECT doc_id, sum(1.0 / (1 + (e - s - 2))) AS freq
         |       FROM mini GROUP BY doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(freq / (freq + 1), 9) DESC,
         |         doc_id) AS rank,
         |         doc_id, round(freq / (freq + 1), 4) AS score FROM sc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // PayloadScoreQuery(max): payload(occurrence) = pos % 5 + 1 (synth,
    // same derivation both sides), doc score = max over occurrences
    "payload_score" ->
      s"""WITH $PosCtes,
         |sc AS (SELECT doc_id, max(pos % 5 + 1) AS payload FROM pp
         |       WHERE term = 'merge' GROUP BY doc_id)
         |SELECT rank, doc_id, payload FROM (
         |  SELECT row_number() OVER (ORDER BY payload DESC, doc_id) AS rank,
         |         doc_id, CAST(payload AS BIGINT) AS payload FROM sc)
         |WHERE rank <= 20 ORDER BY rank""".stripMargin,
    // Luke field stats: the norm byte's encode/decode round-trip — avg
    // quantized dl recomputed from raw text via the same byte4 bucketing
    "index_field_stats" ->
      s"""WITH $TokCte,
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         |qdl AS (SELECT doc_id, CASE WHEN dl < 32 THEN dl
         |        ELSE 24 + (((dl - 24) >> (length(printf('%b', dl - 24)) - 4)) << (length(printf('%b', dl - 24)) - 4))
         |        END AS qdl FROM dl)
         |SELECT d.lang, count(*) AS n_docs,
         |       CAST(sum(dl.dl) AS BIGINT) AS sum_tokens,
         |       round(avg(qdl.qdl), 6) AS avg_qdl
         |FROM documents d JOIN dl ON dl.doc_id = d.doc_id
         |     JOIN qdl ON qdl.doc_id = d.doc_id
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
    // streaming-math corr evaluator
    "stream_corr" ->
      """SELECT event_type,
        |round(corr(value, CAST(hour(ts) AS DOUBLE)), 6) AS corr_value_hour,
        |round(stddev_samp(value), 6) AS stddev_value, count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // Soundex over the corpus vocabulary (generated collapse-pass SQL)
    "analysis_phonetic" -> AnalysisOps.phoneticOracleSql,
    // JoinUtil ScoreMode.Max: from-hits (must 'dup', scored with 'merge')
    // roll up to max score per source, every doc of a matched source
    // returned with the propagated score
    "solr_join_score" ->
      s"""WITH $TokCte,
         |$Bm25Ctes,
         |dfs AS (SELECT term, count(*) AS df FROM tf
         |        WHERE term IN ('dup', 'merge') GROUP BY term),
         |sc AS (SELECT tf.doc_id,
         |       sum(ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |           / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |       FROM tf JOIN dfs ON tf.term = dfs.term
         |            JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st
         |       GROUP BY tf.doc_id
         |       HAVING count(DISTINCT CASE WHEN tf.term = 'dup' THEN tf.term END) = 1),
         |fj AS (SELECT d.source, max(round(sc.score, 9)) AS jscore
         |       FROM sc JOIN documents d ON d.doc_id = sc.doc_id
         |       GROUP BY d.source),
         |tt AS (SELECT d.doc_id, fj.jscore FROM documents d
         |       JOIN fj ON fj.source = d.source)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY jscore DESC, doc_id) AS rank,
         |         doc_id, round(jscore, 4) AS score FROM tt)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // facet.range.other=all: BEFORE/BETWEEN/AFTER window counts
    "facet_range_other" ->
      """SELECT bucket, cnt FROM (
        |SELECT 'before' AS bucket, count(*) FILTER (WHERE l_quantity < 10) AS cnt FROM lineitem
        |UNION ALL SELECT 'between', count(*) FILTER (WHERE l_quantity >= 10 AND l_quantity < 40) FROM lineitem
        |UNION ALL SELECT 'after', count(*) FILTER (WHERE l_quantity >= 40) FROM lineitem)
        |ORDER BY bucket""".stripMargin,
    // group.facet: one count per distinct group per facet value
    "facet_grouped" ->
      """SELECT lang, count(DISTINCT source) AS n_groups, count(*) AS n_docs
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // drill-sideways: per dimension, counts with its own filter excluded
    "facet_drill_sideways" ->
      """SELECT dim, value, cnt FROM (
        |SELECT 'lang' AS dim, lang AS value, count(*) AS cnt
        |FROM documents WHERE source = 'src3' GROUP BY lang
        |UNION ALL
        |SELECT 'source', source, count(*) FROM documents WHERE lang = 'en'
        |GROUP BY source)
        |ORDER BY dim, value""".stripMargin,
    // recip(age_days) recency boost against a pinned NOW
    "function_recency" ->
      """SELECT o_orderkey,
        |round(1.0 / (0.01 * datediff('day', CAST(o_orderdate AS DATE),
        |                             DATE '2002-01-01') + 1.0), 9) AS score
        |FROM orders
        |ORDER BY score DESC, o_orderkey LIMIT 20""".stripMargin,
    // CommonTermsQuery: the df split (df/N > 0.5 => common) happens in SQL
    // too, so oracle and engine agree at every scale factor; candidates
    // must hit >= 1 rare term (unless no term is rare at this sf)
    "search_common_terms" ->
      s"""WITH $TokCte,
         |$Bm25Ctes,
         |dfs AS (SELECT term, count(*) AS df FROM tf
         |        WHERE term IN ('dup', 'merge', 'sort') GROUP BY term),
         |split AS (SELECT dfs.term, dfs.df,
         |          CASE WHEN dfs.df * 1.0 / st.n > 0.5 THEN 1 ELSE 0 END AS is_common
         |          FROM dfs CROSS JOIN st),
         |sc AS (SELECT tf.doc_id,
         |       sum(ln(1 + (st.n - s.df + 0.5) / (s.df + 0.5)) * tf.tf
         |           / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |       FROM tf JOIN split s ON tf.term = s.term
         |            JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st
         |       GROUP BY tf.doc_id
         |       HAVING count(DISTINCT CASE WHEN s.is_common = 0 THEN tf.term END)
         |              >= least(1, (SELECT count(*) FROM split WHERE is_common = 0)))
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score
         |  FROM sc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // pivot facet: leaf counts once, parent counts as a window sum
    "facet_pivot" ->
      """WITH leaf AS (SELECT lang, source AS src, count(*) AS src_cnt
        |              FROM documents GROUP BY lang, source),
        |wp AS (SELECT lang, src, src_cnt,
        |              CAST(sum(src_cnt) OVER (PARTITION BY lang) AS BIGINT) AS lang_cnt FROM leaf),
        |rk AS (SELECT *, dense_rank() OVER (ORDER BY lang_cnt DESC, lang) AS lr,
        |              row_number() OVER (PARTITION BY lang
        |                  ORDER BY src_cnt DESC, src) AS sr FROM wp)
        |SELECT lang, lang_cnt, src, src_cnt FROM rk WHERE lr <= 3 AND sr <= 2
        |ORDER BY lang_cnt DESC, lang, src_cnt DESC, src""".stripMargin,
    // interval facet: overlapping intervals each counted independently
    "facet_intervals" ->
      """SELECT iv, cnt FROM (
        |SELECT '[0,100)' AS iv, count(*) FILTER (WHERE n_chars >= 0 AND n_chars < 100) AS cnt FROM documents
        |UNION ALL SELECT '[50,200)', count(*) FILTER (WHERE n_chars >= 50 AND n_chars < 200) FROM documents
        |UNION ALL SELECT '[100,400)', count(*) FILTER (WHERE n_chars >= 100 AND n_chars < 400) FROM documents
        |UNION ALL SELECT '[0,*)', count(*) FILTER (WHERE n_chars >= 0) FROM documents)
        |ORDER BY iv""".stripMargin,
    "stream_leftouter" ->
      """SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n_orders,
        |round(coalesce(sum(o_totalprice), 0), 2) AS sum_price
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_mktsegment ORDER BY c_custkey""".stripMargin,
    "stream_fetch" ->
      """WITH top AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |             ORDER BY o_totalprice DESC, o_orderkey LIMIT 20)
        |SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
        |FROM top JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin,
    "stream_cartesian" ->
      s"""SELECT doc_id, CAST(i AS INT) AS pos, toks[i + 1] AS term
         |FROM (SELECT doc_id, $QualityTokSql AS toks FROM documents
         |      WHERE doc_id < 20) t, unnest(range(len(toks))) AS r(i)
         |ORDER BY doc_id, pos""".stripMargin,
    // reverse search (Monitor/percolator): generated from the SAME
    // registered-query value the operator runs, so query set and oracle
    // cannot drift
    "percolate_monitor" -> MonitorOps.oracleSql(TokCte),
    // dictionary entity tagging over raw token positions, generated from
    // the same TagDictionary value
    "tag_entities" -> TextOps.tagOracleSql(PosCtes),
    // ---- Lucene classification module. Deterministic split: doc_id % 10
    // == 0 is the test batch, the rest is the labeled train set. ----
    // KNN: per test doc, BM25 top-7 over the TRAIN-split index with the
    // doc's distinct terms as the query; majority lang among the hits
    // (count, then summed score, then label order)
    "classify_knn" ->
      s"""WITH $TokCte,
         |train AS (SELECT * FROM tok WHERE doc_id % 10 <> 0),
         |test AS (SELECT DISTINCT doc_id, term FROM tok WHERE doc_id % 10 = 0),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM train GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, count(*) AS dl FROM train GROUP BY doc_id),
         |qdl AS (SELECT doc_id, CASE WHEN dl < 32 THEN dl
         |        ELSE 24 + (((dl - 24) >> (length(printf('%b', dl - 24)) - 4)) << (length(printf('%b', dl - 24)) - 4))
         |        END AS qdl FROM dl),
         |st AS (SELECT (SELECT count(*) FROM dl) AS n,
         |              (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM dl) AS avgdl),
         |dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |sc AS (SELECT te.doc_id AS qid, tf.doc_id AS doc_id,
         |         sum(ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |             / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |       FROM test te JOIN tf ON tf.term = te.term
         |            JOIN dfs ON dfs.term = tf.term
         |            JOIN qdl ON qdl.doc_id = tf.doc_id
         |            CROSS JOIN st
         |       GROUP BY te.doc_id, tf.doc_id),
         |topk AS (SELECT qid, doc_id, score,
         |                row_number() OVER (PARTITION BY qid ORDER BY round(score, 9) DESC, doc_id) AS rnk
         |         FROM sc),
         |votes AS (SELECT t.qid, d.lang, count(*) AS c, round(sum(t.score), 9) AS ssum
         |          FROM topk t JOIN documents d ON d.doc_id = t.doc_id
         |          WHERE t.rnk <= 7 GROUP BY t.qid, d.lang)
         |SELECT qid AS doc_id, lang AS pred_lang FROM (
         |  SELECT qid, lang, row_number() OVER (PARTITION BY qid
         |         ORDER BY c DESC, ssum DESC, lang) AS rn
         |  FROM votes) WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // multinomial NB, add-one smoothing: score(d,c) = ln(N_c/N)
    // + sum_t ln(tf(t,c)+1) - |d| * ln(F_c + |V|)
    "classify_naive_bayes" ->
      s"""WITH $TokCte,
         |train AS (SELECT t.doc_id, d.lang, t.term FROM tok t
         |          JOIN documents d ON d.doc_id = t.doc_id
         |          WHERE t.doc_id % 10 <> 0),
         |test AS (SELECT doc_id, term FROM tok WHERE doc_id % 10 = 0),
         |cstat AS (SELECT lang, count(*) AS f_c, count(DISTINCT doc_id) AS n_c
         |          FROM train GROUP BY lang),
         |tot AS (SELECT count(DISTINCT doc_id) AS n_train,
         |               count(DISTINCT term) AS v FROM train),
         |tc AS (SELECT term, lang, count(*) AS tf FROM train GROUP BY term, lang),
         |present AS (SELECT te.doc_id, tc.lang, sum(ln(tc.tf + 1.0)) AS s1
         |            FROM test te JOIN tc ON tc.term = te.term
         |            GROUP BY te.doc_id, tc.lang),
         |dlen AS (SELECT doc_id, count(*) AS len FROM test GROUP BY doc_id),
         |scored AS (SELECT dlen.doc_id, c.lang,
         |             coalesce(p.s1, 0) - dlen.len * ln(c.f_c + t.v)
         |             + ln(c.n_c * 1.0 / t.n_train) AS score
         |           FROM dlen CROSS JOIN cstat c CROSS JOIN tot t
         |                LEFT JOIN present p ON p.doc_id = dlen.doc_id
         |                     AND p.lang = c.lang)
         |SELECT doc_id, lang AS pred_lang FROM (
         |  SELECT doc_id, lang, row_number() OVER (PARTITION BY doc_id
         |         ORDER BY round(score, 9) DESC, lang) AS rn
         |  FROM scored) WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // ---- Intervals API: MINIMAL-interval semantics. Candidates = every
    // combination window; `NOT EXISTS a strictly-contained sibling` is the
    // minimisation; filters (maxgaps/containing/before) apply AFTER it,
    // matching Lucene's wrapper order. n_intervals makes the oracle check
    // occurrence counts, not just doc membership. ----
    // Intervals.maxgaps(6, ordered(key, value, table))
    "interval_ordered" ->
      s"""WITH $PosCtes,
         |a AS (SELECT doc_id, pos FROM pp WHERE term = 'key'),
         |b AS (SELECT doc_id, pos FROM pp WHERE term = 'value'),
         |c AS (SELECT doc_id, pos FROM pp WHERE term = 'table'),
         |cand AS (SELECT DISTINCT a.doc_id, a.pos AS s, c.pos + 1 AS e
         |         FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos > a.pos
         |                JOIN c ON c.doc_id = b.doc_id AND c.pos > b.pos),
         |mini AS ($IntervalMiniSql)
         |SELECT doc_id, count(*) AS n_intervals FROM mini
         |WHERE (e - s) - 3 <= 6
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Intervals.unordered(sort, merge)
    "interval_unordered" ->
      s"""WITH $PosCtes,
         |a AS (SELECT doc_id, pos FROM pp WHERE term = 'sort'),
         |b AS (SELECT doc_id, pos FROM pp WHERE term = 'merge'),
         |cand AS (SELECT DISTINCT a.doc_id, least(a.pos, b.pos) AS s,
         |                greatest(a.pos, b.pos) + 1 AS e
         |         FROM a JOIN b ON b.doc_id = a.doc_id),
         |mini AS ($IntervalMiniSql)
         |SELECT doc_id, count(*) AS n_intervals FROM mini
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Intervals.containing(unordered(key, table), or(value, phrase("key order")))
    "interval_containing" ->
      s"""WITH $IntervalContCtes
         |SELECT doc_id, count(*) AS n_intervals FROM mini m
         |WHERE EXISTS (SELECT 1 FROM sm WHERE sm.doc_id = m.doc_id
         |              AND sm.s >= m.s AND sm.e <= m.e)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Intervals.notContaining — same big source, negated filter
    "interval_not_containing" ->
      s"""WITH $IntervalContCtes
         |SELECT doc_id, count(*) AS n_intervals FROM mini m
         |WHERE NOT EXISTS (SELECT 1 FROM sm WHERE sm.doc_id = m.doc_id
         |              AND sm.s >= m.s AND sm.e <= m.e)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Intervals.before(unordered(sort, merge), window)
    "interval_before" ->
      s"""WITH $PosCtes,
         |a AS (SELECT doc_id, pos FROM pp WHERE term = 'sort'),
         |b AS (SELECT doc_id, pos FROM pp WHERE term = 'merge'),
         |cand AS (SELECT DISTINCT a.doc_id, least(a.pos, b.pos) AS s,
         |                greatest(a.pos, b.pos) + 1 AS e
         |         FROM a JOIN b ON b.doc_id = a.doc_id),
         |mini AS ($IntervalMiniSql)
         |SELECT doc_id, count(*) AS n_intervals FROM mini m
         |WHERE EXISTS (SELECT 1 FROM pp w WHERE w.doc_id = m.doc_id
         |              AND w.term = 'window' AND w.pos >= m.e)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Intervals.after(unordered(sort, merge), window) — the before mirror
    "interval_after" ->
      s"""WITH $PosCtes,
         |a AS (SELECT doc_id, pos FROM pp WHERE term = 'sort'),
         |b AS (SELECT doc_id, pos FROM pp WHERE term = 'merge'),
         |cand AS (SELECT DISTINCT a.doc_id, least(a.pos, b.pos) AS s,
         |                greatest(a.pos, b.pos) + 1 AS e
         |         FROM a JOIN b ON b.doc_id = a.doc_id),
         |mini AS ($IntervalMiniSql)
         |SELECT doc_id, count(*) AS n_intervals FROM mini m
         |WHERE EXISTS (SELECT 1 FROM pp w WHERE w.doc_id = m.doc_id
         |              AND w.term = 'window' AND w.pos + 1 <= m.s)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Intervals.containedBy(or(value, phrase "key order"), unordered(key, table))
    // — same CTEs as containing, output side flipped to the small intervals
    "interval_contained_by" ->
      s"""WITH $IntervalContCtes
         |SELECT doc_id, count(*) AS n_intervals FROM sm s
         |WHERE EXISTS (SELECT 1 FROM mini m WHERE m.doc_id = s.doc_id
         |              AND m.s <= s.s AND m.e >= s.e)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // standalone Intervals.or(phrase("merge sort"), window): union re-minimised
    "interval_or" ->
      s"""WITH $PosCtes,
         |cand AS (SELECT k.doc_id, k.pos AS s, k.pos + 2 AS e
         |         FROM pp k JOIN pp o ON o.doc_id = k.doc_id AND o.pos = k.pos + 1
         |         WHERE k.term = 'merge' AND o.term = 'sort'
         |         UNION ALL
         |         SELECT doc_id, pos, pos + 1 FROM pp WHERE term = 'window'),
         |mini AS ($IntervalMiniSql)
         |SELECT doc_id, count(*) AS n_intervals FROM mini
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Intervals.overlapping(unordered(sort, merge), unordered(key, table))
    "interval_overlapping" ->
      s"""WITH $PosCtes,
         |a AS (SELECT doc_id, pos FROM pp WHERE term = 'sort'),
         |b AS (SELECT doc_id, pos FROM pp WHERE term = 'merge'),
         |cand AS (SELECT DISTINCT a.doc_id, least(a.pos, b.pos) AS s,
         |                greatest(a.pos, b.pos) + 1 AS e
         |         FROM a JOIN b ON b.doc_id = a.doc_id),
         |mini AS ($IntervalMiniSql),
         |ra AS (SELECT doc_id, pos FROM pp WHERE term = 'key'),
         |rb AS (SELECT doc_id, pos FROM pp WHERE term = 'table'),
         |rcand AS (SELECT DISTINCT ra.doc_id, least(ra.pos, rb.pos) AS s,
         |                 greatest(ra.pos, rb.pos) + 1 AS e
         |          FROM ra JOIN rb ON rb.doc_id = ra.doc_id),
         |rmini AS (SELECT doc_id, s, e FROM rcand i
         |          WHERE NOT EXISTS (SELECT 1 FROM rcand j WHERE j.doc_id = i.doc_id
         |                AND j.s >= i.s AND j.e <= i.e AND (j.s > i.s OR j.e < i.e)))
         |SELECT doc_id, count(*) AS n_intervals FROM mini m
         |WHERE EXISTS (SELECT 1 FROM rmini r WHERE r.doc_id = m.doc_id
         |              AND r.s < m.e AND m.s < r.e)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // sloppy phrase "key order"~2: raw token positions (stop words count,
    // mirroring StopFilter position-increment holes), window |pb-pa-1|<=2
    "search_phrase_sloppy" ->
      s"""WITH tk AS (SELECT doc_id, $QualityTokSql AS toks FROM documents),
         |p AS (SELECT doc_id, CAST(i AS INT) AS pos, toks[i + 1] AS term
         |      FROM tk, unnest(range(len(toks))) AS r(i)),
         |a AS (SELECT doc_id, pos FROM p WHERE term = 'key'),
         |b AS (SELECT doc_id, pos FROM p WHERE term = 'order')
         |SELECT DISTINCT a.doc_id AS doc_id FROM a JOIN b ON a.doc_id = b.doc_id
         |WHERE abs(b.pos - a.pos - 1) <= 2 ORDER BY doc_id""".stripMargin,
    "search_regex" ->
      s"""WITH $TokCte
         |SELECT DISTINCT doc_id FROM tok
         |WHERE regexp_matches(term, '^wi.*w$$')
         |ORDER BY doc_id LIMIT 200""".stripMargin,
    "suggest_terms" ->
      s"""WITH $TokCte
         |SELECT term, count(DISTINCT doc_id) AS df FROM tok
         |WHERE term LIKE 's%' GROUP BY term
         |ORDER BY df DESC, term LIMIT 8""".stripMargin,
    // FreeTextSuggester: bigram LM with 0.4 stupid backoff to unigrams
    "suggest_freetext" ->
      s"""WITH tk AS (SELECT doc_id, $QualityTokSql AS toks FROM documents),
         |bi AS (SELECT toks[i + 1] AS w1, toks[i + 2] AS w2
         |       FROM tk, unnest(range(len(toks) - 1)) AS r(i)
         |       WHERE len(toks) >= 2),
         |ctx AS (SELECT count(*) AS c FROM bi WHERE w1 = 'merge'),
         |tot AS (SELECT sum(len(toks)) AS t FROM tk),
         |bg AS (SELECT w2 AS term, 'bigram' AS src,
         |         round(CAST(count(*) AS DOUBLE) /
         |               (SELECT CAST(c AS DOUBLE) FROM ctx), 6) AS score
         |       FROM bi WHERE w1 = 'merge' AND w2 LIKE 's%' GROUP BY w2),
         |un AS (SELECT term, 'backoff' AS src,
         |         round(0.4 * CAST(count(*) AS DOUBLE) /
         |               (SELECT CAST(t AS DOUBLE) FROM tot), 6) AS score
         |       FROM (SELECT unnest(toks) AS term FROM tk)
         |       WHERE term LIKE 's%' AND term NOT IN (SELECT term FROM bg)
         |       GROUP BY term)
         |SELECT term, src, score FROM (SELECT * FROM bg UNION ALL SELECT * FROM un)
         |ORDER BY score DESC, term LIMIT 8""".stripMargin,
    // WordBreakSolrSpellChecker: break unknown terms / combine adjacent ones
    "spell_wordbreak" ->
      s"""WITH $TokCte,
         |dict AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
         |inp AS (SELECT * FROM (VALUES ('mergesort'), ('bigtable'), ('hashjoin'),
         |                              ('keyorder')) AS v(input)),
         |sp AS (SELECT input, substring(input, 1, CAST(i AS INT)) AS l,
         |              substring(input, CAST(i AS INT) + 1) AS r, CAST(i AS INT) AS pos
         |       FROM inp, unnest(range(3, length(input) - 2)) AS rr(i)),
         |br AS (SELECT sp.input, 'break' AS kind, sp.l || ' ' || sp.r AS suggestion,
         |              least(dl.df, dr.df) AS rarest_df, sp.pos
         |       FROM sp JOIN dict dl ON dl.term = sp.l
         |               JOIN dict dr ON dr.term = sp.r),
         |cmb AS (SELECT * FROM (VALUES ('mer', 'ge'), ('ta', 'ble'),
         |                              ('so', 'rt')) AS v(t1, t2)),
         |cm AS (SELECT t1 || ' ' || t2 AS input, 'combine' AS kind,
         |              t1 || t2 AS suggestion, d.df AS rarest_df, CAST(0 AS INT) AS pos
         |       FROM cmb JOIN dict d ON d.term = t1 || t2)
         |SELECT input, kind, suggestion, rarest_df, pos
         |FROM (SELECT * FROM br UNION ALL SELECT * FROM cm)
         |ORDER BY input, rarest_df DESC, pos""".stripMargin,
    // TermVectorComponent: one doc's term-frequency vector
    "term_vectors" ->
      s"""WITH t AS (SELECT doc_id, unnest($QualityTokSql) AS term
         |           FROM documents WHERE doc_id = 42)
         |SELECT doc_id, term, count(*) AS tf FROM t
         |GROUP BY doc_id, term ORDER BY term""".stripMargin,
    // QueryElevationComponent: docs 7, 123 pinned at ranks 1-2 (score 0),
    // organic BM25 OR(merge, sort) excluding them renumbered from rank 3
    "search_elevate" ->
      s"""WITH $TokCte,
         |$Bm25Ctes,
         |dfs AS (SELECT term, count(*) AS df FROM tf WHERE term IN ('merge', 'sort') GROUP BY term),
         |sc AS (
         |  SELECT tf.doc_id,
         |         sum(ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |             / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |  FROM tf JOIN dfs ON tf.term = dfs.term
         |       JOIN qdl ON tf.doc_id = qdl.doc_id
         |       CROSS JOIN st
         |  WHERE tf.doc_id NOT IN (7, 123)
         |  GROUP BY tf.doc_id),
         |org AS (SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) + 2 AS rank,
         |               doc_id, round(score, 4) AS score FROM sc)
         |SELECT rank, doc_id, score FROM (
         |  SELECT 1 AS rank, CAST(7 AS BIGINT) AS doc_id, 0.0 AS score
         |  UNION ALL SELECT 2, CAST(123 AS BIGINT), 0.0
         |  UNION ALL SELECT rank, doc_id, score FROM org WHERE rank <= 10)
         |ORDER BY rank""".stripMargin,
    // AnalyzingInfixSuggester: completions containing the fragment, by weight
    "suggest_infix" ->
      s"""WITH $TokCte
         |SELECT term, count(DISTINCT doc_id) AS df FROM tok
         |WHERE contains(term, 'or') GROUP BY term
         |ORDER BY df DESC, term LIMIT 8""".stripMargin,
    // context-filtered suggestions: prefix 's', df re-counted within lang='de'
    "suggest_context" ->
      s"""WITH $TokCte
         |SELECT t.term, count(DISTINCT t.doc_id) AS df
         |FROM tok t JOIN documents d ON d.doc_id = t.doc_id
         |WHERE t.term LIKE 's%' AND d.lang = 'de'
         |GROUP BY t.term ORDER BY df DESC, t.term LIMIT 8""".stripMargin,
    // DirectSpellChecker + collation: best correction per query term by
    // (edit distance, -df, term); a present term self-matches at dist 0.
    // minPrefix=1 (the DirectSpellChecker default): candidate and query
    // term share the first character.
    "spell_collate" ->
      s"""WITH $TokCte,
         |dict AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
         |q AS (SELECT unnest(['mrge', 'sorrt', 'window']) AS qterm),
         |cand AS (SELECT q.qterm, d.term AS suggestion,
         |         CAST(levenshtein(q.qterm, d.term) AS BIGINT) AS dist, d.df
         |         FROM q, dict d
         |         WHERE substr(d.term, 1, 1) = substr(q.qterm, 1, 1)
         |           AND levenshtein(q.qterm, d.term) <= 2),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY qterm
         |       ORDER BY dist, df DESC, suggestion) AS rk FROM cand)
         |SELECT qterm, suggestion, dist, df FROM rk WHERE rk = 1
         |ORDER BY qterm""".stripMargin,
    // prefixLength=1 semantics: candidates share the target's first char
    "search_fuzzy" ->
      s"""WITH $TokCte
         |SELECT term, count(DISTINCT doc_id) AS df FROM tok
         |WHERE substr(term, 1, 1) = 'm'
         |GROUP BY term HAVING levenshtein(term, 'merge') <= 1 ORDER BY term""".stripMargin,
    // transpositions=true: DuckDB's damerau_levenshtein is the same
    // unrestricted Damerau-Levenshtein as QueryLowering.damerauLevenshtein
    "search_fuzzy_transpose" ->
      s"""WITH $TokCte
         |SELECT term, count(DISTINCT doc_id) AS df FROM tok
         |WHERE substr(term, 1, 1) = 'm'
         |GROUP BY term HAVING damerau_levenshtein(term, 'mereg') <= 1 ORDER BY term""".stripMargin,
    "sort_searchafter" ->
      s"""WITH tc AS (SELECT doc_id,
         |  len(list_filter($QualityTokSql, x -> x NOT IN ($StopSql))) AS token_count
         |FROM documents)
         |SELECT token_count, doc_id FROM tc
         |ORDER BY token_count DESC, doc_id LIMIT 10 OFFSET 10""".stripMargin,
    "function_query" ->
      s"""WITH tc AS (SELECT doc_id, n_chars,
         |  len(list_filter($QualityTokSql, x -> x NOT IN ($StopSql))) AS token_count
         |FROM documents)
         |SELECT doc_id, round(ln(n_chars * 1.0) * 2 + sqrt(token_count * 1.0), 4) AS fscore
         |FROM tc ORDER BY fscore DESC, doc_id LIMIT 10""".stripMargin,
    // RandomSamplingFacetsCollector: facet over the md5-sampled hit set,
    // counts amortized by the exact totalHits/sampleSize correction
    "facet_sampled" ->
      s"""WITH $TokCte,
         |hit AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'merge'),
         |m AS (SELECT h.doc_id, d.lang FROM hit h JOIN documents d USING (doc_id)),
         |s AS (SELECT * FROM m
         |      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2','3')),
         |st AS (SELECT (SELECT count(*) FROM m) AS nm, (SELECT count(*) FROM s) AS ns)
         |SELECT lang, count(*) AS sampled_cnt,
         |       round(count(*) * st.nm * 1.0 / st.ns, 4) AS est_cnt
         |FROM s CROSS JOIN st GROUP BY lang, st.nm, st.ns
         |ORDER BY sampled_cnt DESC, lang""".stripMargin,
    // blockChildren facet domain: child query 'merge' -> matched parents
    // (source blocks) -> facet ALL their children by lang
    "facet_block_domain" ->
      s"""WITH $TokCte,
         |p AS (SELECT DISTINCT d.source FROM tok t
         |      JOIN documents d ON d.doc_id = t.doc_id WHERE t.term = 'merge')
         |SELECT d2.lang, count(*) AS cnt
         |FROM documents d2 JOIN p USING (source)
         |GROUP BY d2.lang ORDER BY cnt DESC, lang""".stripMargin,
    // group.ngroups: hit count + distinct group count for the term query
    "collapse_ngroups" ->
      s"""WITH $TokCte,
         |hit AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'merge')
         |SELECT (SELECT count(*) FROM hit) AS matches,
         |       (SELECT count(DISTINCT d.source) FROM hit h
         |        JOIN documents d ON d.doc_id = h.doc_id) AS ngroups""".stripMargin,
    // Solr termfreq()/idf() value sources: tf('merge') from postings,
    // classic idf 1 + ln(N/(df+1)), composed tf*idf ranking
    "function_query_tfidf" ->
      s"""WITH $TokCte,
         |tf AS (SELECT doc_id, count(*) AS tf FROM tok WHERE term = 'merge'
         |       GROUP BY doc_id),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n,
         |              (SELECT count(*) FROM tf) AS df)
         |SELECT doc_id, tf,
         |       round(tf * (1 + ln(st.n * 1.0 / (st.df + 1))), 4) AS score
         |FROM tf CROSS JOIN st
         |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin,
    // CombinedFieldQuery / BM25F: title = first 8 analyzed tokens (w=2),
    // body = rest (w=1); freq/dl/df/avgdl merged into one pseudo-field,
    // SmallFloat-quantized per-field lengths, then Lucene-8 BM25
    "search_combined_field" ->
      s"""WITH ftk AS (SELECT doc_id,
         |  list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
         |              x -> x <> '' AND x NOT IN ($StopSql)) AS toks FROM documents),
         |fld AS (SELECT doc_id, list_slice(toks, 1, 8) AS title,
         |               list_slice(toks, 9, len(toks)) AS body FROM ftk),
         |dls AS (SELECT doc_id,
         |        2.0 * len(title) + (${qlenOracle("len(body)")}) AS dl FROM fld),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n,
         |              (SELECT sum(dl) FROM dls) / (SELECT count(*) FROM documents) AS avgdl),
         |tfq AS (SELECT f.doc_id, t.term,
         |        2.0 * len(list_filter(f.title, x -> x = t.term))
         |        + len(list_filter(f.body, x -> x = t.term)) AS freq
         |        FROM fld f, (VALUES ('merge'), ('window')) t(term)),
         |pos AS (SELECT * FROM tfq WHERE freq > 0),
         |dfs AS (SELECT term, count(*) AS df FROM pos GROUP BY term),
         |sc AS (SELECT p.doc_id,
         |       sum(ln(1 + (st.n - d.df + 0.5) / (d.df + 0.5)) * p.freq /
         |           (p.freq + 1.2 * (0.25 + 0.75 * l.dl / st.avgdl))) AS score
         |       FROM pos p JOIN dfs d ON d.term = p.term
         |            JOIN dls l ON l.doc_id = p.doc_id
         |            CROSS JOIN st
         |       GROUP BY p.doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score FROM sc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // FeatureField.newLogQuery: BM25(merge, sort) + 1.5*ln(1 + n_chars/1000)
    "search_feature_boost" ->
      s"""WITH $TokCte,
         |$Bm25Ctes,
         |dfs AS (SELECT term, count(*) AS df FROM tf
         |        WHERE term IN ('merge', 'sort') GROUP BY term),
         |sc AS (SELECT tf.doc_id,
         |       sum(ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |           / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |       FROM tf JOIN dfs ON tf.term = dfs.term
         |            JOIN qdl ON tf.doc_id = qdl.doc_id
         |            CROSS JOIN st
         |       GROUP BY tf.doc_id),
         |fb AS (SELECT sc.doc_id,
         |       sc.score + 1.5 * ln(1.0 + d.n_chars / 1000.0) AS score
         |       FROM sc JOIN documents d ON d.doc_id = sc.doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score FROM fb)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // DiversifiedTopDocsCollector: <=2 hits per source key, then top-10
    "search_diversified" ->
      s"""WITH $TokCte,
         |$Bm25Ctes,
         |dfs AS (SELECT term, count(*) AS df FROM tf
         |        WHERE term IN ('merge', 'window') GROUP BY term),
         |sc AS (SELECT tf.doc_id,
         |       sum(ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |           / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |       FROM tf JOIN dfs ON tf.term = dfs.term
         |            JOIN qdl ON tf.doc_id = qdl.doc_id
         |            CROSS JOIN st
         |       GROUP BY tf.doc_id),
         |keyed AS (SELECT sc.doc_id, d.source, sc.score,
         |          row_number() OVER (PARTITION BY d.source
         |            ORDER BY round(sc.score, 9) DESC, sc.doc_id) AS nkey
         |          FROM sc JOIN documents d ON d.doc_id = sc.doc_id)
         |SELECT rank, doc_id, source, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, source, round(score, 4) AS score
         |  FROM keyed WHERE nkey <= 2)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    "index_term_stats" ->
      s"""WITH $TokCte
         |SELECT term, count(DISTINCT doc_id) AS df, count(*) AS ttf
         |FROM tok WHERE term IN ($ProbeTermsIn)
         |GROUP BY term ORDER BY term""".stripMargin,
    // TermsComponent terms.regex: dictionary terms matching ^s[a-z]*t$
    "terms_regex" ->
      s"""WITH $TokCte
         |SELECT term, count(DISTINCT doc_id) AS df, count(*) AS ttf
         |FROM tok WHERE regexp_matches(term, '^s[a-z]*[kmt]$$')
         |GROUP BY term ORDER BY df DESC, term LIMIT 10""".stripMargin,

    "facet_terms" ->
      "SELECT lang, count(*) AS cnt FROM documents GROUP BY lang ORDER BY cnt DESC, lang LIMIT 5",
    // terms facet with prefix/mincount/sort-by-substat/limit + missing
    // bucket (src NULL; missing-ness synthesized by nullif — see scaladoc)
    "facet_terms_params" ->
      """WITH b AS (SELECT nullif(source, 'src0') AS src, n_chars FROM documents),
        |main AS (
        |  SELECT src, count(*) AS cnt, round(avg(n_chars), 4) AS avg_chars
        |  FROM b WHERE src IS NOT NULL AND src LIKE 'src1%'
        |  GROUP BY src HAVING count(*) >= 3
        |  ORDER BY avg_chars DESC, src LIMIT 8),
        |miss AS (
        |  SELECT CAST(NULL AS VARCHAR) AS src, count(*) AS cnt,
        |         round(avg(n_chars), 4) AS avg_chars
        |  FROM b WHERE src IS NULL)
        |SELECT * FROM main UNION ALL SELECT * FROM miss""".stripMargin,
    "facet_range" ->
      """SELECT CAST(floor(l_quantity / 10) AS BIGINT) AS bucket, count(*) AS cnt,
        |round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin,
    // JSON Facet API flattening: parent bucket rows (source NULL) + per-
    // parent top-2 child rows, both carrying avg(n_chars)
    "facet_json_api" ->
      """WITH p AS (
        |  SELECT lang, count(*) AS cnt, round(avg(n_chars), 4) AS avg_chars
        |  FROM documents GROUP BY lang ORDER BY cnt DESC, lang LIMIT 4),
        |c AS (
        |  SELECT d.lang, d.source, count(*) AS cnt,
        |         round(avg(d.n_chars), 4) AS avg_chars
        |  FROM documents d JOIN p ON d.lang = p.lang
        |  GROUP BY d.lang, d.source),
        |ct AS (SELECT lang, source, cnt, avg_chars FROM (
        |  SELECT c.*, row_number() OVER (PARTITION BY lang
        |                                 ORDER BY cnt DESC, source) AS rn
        |  FROM c) WHERE rn <= 2)
        |SELECT lang, CAST(NULL AS VARCHAR) AS source, cnt, avg_chars FROM p
        |UNION ALL
        |SELECT lang, source, cnt, avg_chars FROM ct
        |ORDER BY lang, source NULLS FIRST, cnt""".stripMargin,
    "facet_heatmap" ->
      """WITH pts AS (
        |  SELECT -90.0 + 180.0 * ((event_id * 48271) % 100003) / 100003.0 AS lat,
        |         -180.0 + 360.0 * ((event_id * 16807) % 100019) / 100019.0 AS lon
        |  FROM events)
        |SELECT CAST(floor((lat - (-45.0)) / 11.25) AS BIGINT) AS grid_y,
        |       CAST(floor((lon - (-90.0)) / 11.25) AS BIGINT) AS grid_x,
        |       count(*) AS cnt
        |FROM pts
        |WHERE lat >= -45.0 AND lat < 45.0 AND lon >= -90.0 AND lon < 90.0
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Index-time sort + early termination: top-k by the index sort field
    "search_index_sorted" ->
      s"""WITH d AS (SELECT doc_id,
         |  len(list_filter($QualityTokSql, x -> x NOT IN ($StopSql))) AS token_count
         |  FROM documents)
         |SELECT doc_id, token_count FROM d
         |ORDER BY token_count DESC, doc_id LIMIT 25""".stripMargin,
    // Atomic update through updateByTerm: docs matching 'dup' get
    // ' atomicupd' appended and are tombstone+re-add replaced; collection
    // stats keep the tombstoned versions until a merge (Lucene semantics),
    // so the oracle scores over originals UNION updated copies (ver 0/1)
    "search_atomic_update" ->
      s"""WITH dup AS (SELECT doc_id, text || ' atomicupd' AS text FROM documents
         |  WHERE len(list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
         |        x -> x = 'dup')) > 0),
         |tokall AS (
         |  SELECT 0 AS ver, d.doc_id, t.term FROM documents d,
         |    unnest(list_filter(string_split_regex(lower(d.text), '[^a-z0-9_]+'),
         |           x -> x <> '' AND x NOT IN ($StopSql))) AS t(term)
         |  UNION ALL
         |  SELECT 1 AS ver, d.doc_id, t.term FROM dup d,
         |    unnest(list_filter(string_split_regex(lower(d.text), '[^a-z0-9_]+'),
         |           x -> x <> '' AND x NOT IN ($StopSql))) AS t(term)),
         |tf AS (SELECT ver, doc_id, term, count(*) AS tf FROM tokall
         |       GROUP BY ver, doc_id, term),
         |dl AS (SELECT ver, doc_id, count(*) AS dl FROM tokall GROUP BY ver, doc_id),
         |qdl AS (SELECT ver, doc_id, CASE WHEN dl < 32 THEN dl
         |        ELSE 24 + (((dl - 24) >> (length(printf('%b', dl - 24)) - 4)) << (length(printf('%b', dl - 24)) - 4))
         |        END AS qdl FROM dl),
         |st AS (SELECT (SELECT count(*) FROM dl) AS n,
         |              (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM dl) AS avgdl),
         |dfs AS (SELECT count(*) AS df FROM tf WHERE term = 'atomicupd'),
         |sc AS (SELECT tf.doc_id,
         |         ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |           / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl)) AS score
         |       FROM tf JOIN qdl ON qdl.ver = tf.ver AND qdl.doc_id = tf.doc_id
         |            CROSS JOIN st CROSS JOIN dfs
         |       WHERE tf.term = 'atomicupd' AND tf.ver = 1)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score FROM sc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // ComplexPhraseQueryParser: "merge s*" — prefix wildcard INSIDE a phrase
    "search_complex_phrase" ->
      s"""WITH $PosCtes,
         |a AS (SELECT doc_id, pos FROM pp WHERE term = 'merge'),
         |b AS (SELECT doc_id, pos FROM pp WHERE term LIKE 's%')
         |SELECT DISTINCT a.doc_id AS doc_id
         |FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
         |ORDER BY doc_id""".stripMargin,
    // {!frange}: unscored filter on a function-query value
    "function_range" ->
      """SELECT doc_id,
        |  round(sqrt(CAST(n_chars AS DOUBLE)) * ln(CAST(n_chars AS DOUBLE)), 4) AS fval
        |FROM documents
        |WHERE sqrt(CAST(n_chars AS DOUBLE)) * ln(CAST(n_chars AS DOUBLE))
        |      BETWEEN 90.0 AND 110.0
        |ORDER BY doc_id""".stripMargin,
    // CCNet-style bigram-LM perplexity: model trained on doc_id % 7 == 3
    "text_perplexity" ->
      s"""WITH tk AS (SELECT doc_id, $QualityTokSql AS toks FROM documents),
         |tk2 AS (SELECT doc_id, toks FROM tk WHERE len(toks) >= 2),
         |bi AS (SELECT doc_id, toks[i + 1] AS w1, toks[i + 2] AS w2
         |       FROM tk2, unnest(range(len(toks) - 1)) AS r(i)),
         |tr AS (SELECT * FROM bi WHERE doc_id % 7 = 3),
         |bm AS (SELECT w1, w2, count(*) AS cb FROM tr GROUP BY w1, w2
         |       ORDER BY cb DESC, w1, w2 LIMIT 1000000),
         |um AS (SELECT w1, count(*) AS cu FROM tr GROUP BY w1),
         |vv AS (SELECT count(DISTINCT w1) AS v FROM tr),
         |dg AS (SELECT doc_id, w1, w2, count(*) AS c FROM bi GROUP BY doc_id, w1, w2)
         |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
         |       round(exp(-sum(c * ln((coalesce(bm.cb, 0) + 1.0) /
         |                             (coalesce(um.cu, 0) + vv.v))) / sum(c)), 4) AS ppl
         |FROM dg LEFT JOIN bm USING (w1, w2) LEFT JOIN um USING (w1) CROSS JOIN vv
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "geo_distance" ->
      """WITH pts AS (
        |  SELECT event_id,
        |         -90.0 + 180.0 * ((event_id * 48271) % 100003) / 100003.0 AS lat,
        |         -180.0 + 360.0 * ((event_id * 16807) % 100019) / 100019.0 AS lon
        |  FROM events),
        |d AS (
        |  SELECT event_id,
        |         2 * 6371.0087714 * asin(sqrt(
        |           pow(sin(radians(lat - 12.5) / 2), 2) +
        |           cos(radians(12.5)) * cos(radians(lat)) *
        |           pow(sin(radians(lon - 42.0) / 2), 2))) AS dist
        |  FROM pts
        |  WHERE lat >= 12.5 - 2500.0 / 6371.0087714 * (180.0 / pi())
        |    AND lat <= 12.5 + 2500.0 / 6371.0087714 * (180.0 / pi()))
        |SELECT event_id, round(dist, 4) AS dist_km FROM d
        |WHERE dist <= 2500.0
        |ORDER BY round(dist, 4), event_id LIMIT 20""".stripMargin,
    // dateline-crossing box: lon predicate is the split OR-range
    "geo_bbox" ->
      """WITH pts AS (
        |  SELECT event_id,
        |         -90.0 + 180.0 * ((event_id * 48271) % 100003) / 100003.0 AS lat,
        |         -180.0 + 360.0 * ((event_id * 16807) % 100019) / 100019.0 AS lon
        |  FROM events)
        |SELECT event_id, round(lat, 4) AS lat, round(lon, 4) AS lon
        |FROM pts
        |WHERE lat >= -25.0 AND lat <= 25.0 AND (lon >= 150.0 OR lon <= -150.0)
        |ORDER BY event_id LIMIT 100""".stripMargin,
    // LatLonPoint.newPolygonQuery: PNPOLY even-odd ray casting, identical
    // double arithmetic ((xj-xi)*(lat-yi)/(yj-yi)+xi) on both sides
    "geo_polygon" ->
      """WITH pts AS (
        |  SELECT event_id,
        |         -90.0 + 180.0 * ((event_id * 48271) % 100003) / 100003.0 AS lat,
        |         -180.0 + 360.0 * ((event_id * 16807) % 100019) / 100019.0 AS lon
        |  FROM events),
        |hits AS (
        |  SELECT event_id, lat, lon,
        |    (CASE WHEN ((10.0 > lat) <> (35.0 > lat)) AND
        |          (lon < (10.0 - -30.0) * (lat - 10.0) / (35.0 - 10.0) + -30.0)
        |          THEN 1 ELSE 0 END
        |   + CASE WHEN ((35.0 > lat) <> (5.0 > lat)) AND
        |          (lon < (45.0 - 10.0) * (lat - 35.0) / (5.0 - 35.0) + 10.0)
        |          THEN 1 ELSE 0 END
        |   + CASE WHEN ((5.0 > lat) <> (-25.0 > lat)) AND
        |          (lon < (20.0 - 45.0) * (lat - 5.0) / (-25.0 - 5.0) + 45.0)
        |          THEN 1 ELSE 0 END
        |   + CASE WHEN ((-25.0 > lat) <> (-15.0 > lat)) AND
        |          (lon < (-25.0 - 20.0) * (lat - -25.0) / (-15.0 - -25.0) + 20.0)
        |          THEN 1 ELSE 0 END
        |   + CASE WHEN ((-15.0 > lat) <> (10.0 > lat)) AND
        |          (lon < (-30.0 - -25.0) * (lat - -15.0) / (10.0 - -15.0) + -25.0)
        |          THEN 1 ELSE 0 END) AS crossings
        |  FROM pts)
        |SELECT event_id, round(lat, 4) AS lat, round(lon, 4) AS lon
        |FROM hits WHERE crossings % 2 = 1
        |ORDER BY event_id LIMIT 200""".stripMargin,
    // DoubleRange INTERSECTS/WITHIN/CONTAINS vs the query box [40, 60]
    "range_field" ->
      """WITH r AS (SELECT value AS lo,
        |  value + 1.0 + CAST(event_id % 17 AS DOUBLE) * 2.5 AS hi FROM events)
        |SELECT CAST(sum(CASE WHEN lo <= 60.0 AND hi >= 40.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_intersects,
        |       CAST(sum(CASE WHEN lo >= 40.0 AND hi <= 60.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_within,
        |       CAST(sum(CASE WHEN lo <= 40.0 AND hi >= 60.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_contains
        |FROM r""".stripMargin,
    // forceMergeDeletes: every 'dup' doc expunged; n / avgdl / df all
    // recomputed over the SURVIVORS (the post-merge stats contract)
    "search_expunge_deletes" ->
      s"""WITH $TokCte,
         |dead AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'dup'),
         |tok2 AS (SELECT doc_id, term FROM tok
         |         WHERE doc_id NOT IN (SELECT doc_id FROM dead)),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2 GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY doc_id),
         |qdl AS (SELECT doc_id, CASE WHEN dl < 32 THEN dl
         |        ELSE 24 + (((dl - 24) >> (length(printf('%b', dl - 24)) - 4)) << (length(printf('%b', dl - 24)) - 4))
         |        END AS qdl FROM dl),
         |st AS (SELECT
         |   (SELECT count(*) FROM documents) - (SELECT count(*) FROM dead) AS n,
         |   (SELECT sum(dl) FROM dl) * 1.0 /
         |   ((SELECT count(*) FROM documents) - (SELECT count(*) FROM dead)) AS avgdl),
         |dfs AS (SELECT term, count(*) AS df FROM tf
         |        WHERE term IN ('merge', 'window') GROUP BY term),
         |sc AS (SELECT tf.doc_id,
         |       sum(ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |           / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |       FROM tf JOIN dfs ON tf.term = dfs.term
         |            JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st
         |       GROUP BY tf.doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score FROM sc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    "facet_taxonomy" ->
      """WITH r AS (
        |  SELECT lang, source, count(*) AS cnt FROM documents
        |  GROUP BY ROLLUP (lang, source)),
        |lv AS (
        |  SELECT CASE WHEN source IS NULL THEN 1 ELSE 2 END AS level,
        |         CASE WHEN source IS NULL THEN lang
        |              ELSE lang || '/' || source END AS path, cnt
        |  FROM r WHERE lang IS NOT NULL)
        |SELECT level, path, cnt FROM (
        |  SELECT lv.*, row_number() OVER (PARTITION BY level
        |    ORDER BY cnt DESC, path) AS rk FROM lv)
        |WHERE rk <= 5 ORDER BY level, cnt DESC, path""".stripMargin,
    // pivot facet with per-bucket stats at BOTH levels from one rollup
    "facet_pivot_stats" ->
      """SELECT CASE WHEN source IS NULL THEN 1 ELSE 2 END AS level,
        |       lang, source, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       round(avg(n_chars), 4) AS avg_chars,
        |       min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY ROLLUP (lang, source)
        |HAVING lang IS NOT NULL
        |ORDER BY lang, level, source""".stripMargin,
    // topic(): two checkpointed pulls partition the matching stream —
    // pull 2 starts strictly after pull 1's max ts
    "stream_topic" ->
      """WITH m AS (SELECT event_id, ts FROM events WHERE event_type = 'signup'),
        |ck AS (SELECT max(ts) AS c FROM m WHERE ts <= TIMESTAMP '2024-01-16 00:00:00')
        |SELECT 1 AS pull, event_id FROM m
        |WHERE ts <= TIMESTAMP '2024-01-16 00:00:00'
        |UNION ALL
        |SELECT 2 AS pull, event_id FROM m, ck WHERE m.ts > ck.c
        |ORDER BY pull, event_id""".stripMargin,
    "facet_query" ->
      """SELECT o_orderstatus, count(*) AS cnt_all,
        |CAST(sum(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_big,
        |CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_urgent
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "facet_nested" ->
      """SELECT lang, source, count(*) AS cnt FROM documents
        |GROUP BY ROLLUP (lang, source)
        |ORDER BY lang NULLS FIRST, source NULLS FIRST""".stripMargin,
    "facet_stats" ->
      """SELECT l_returnflag, count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty,
        |round(avg(l_quantity), 4) AS avg_qty, round(min(l_extendedprice), 2) AS min_price,
        |round(max(l_extendedprice), 2) AS max_price, round(stddev_samp(l_discount), 6) AS sd_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "facet_unique" ->
      """SELECT event_type, count(DISTINCT user_id) AS uniq_users, count(*) AS cnt
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "facet_percentile" ->
      """SELECT l_linestatus, round(quantile_cont(l_quantity, 0.5), 4) AS p50,
        |round(quantile_cont(l_quantity, 0.95), 4) AS p95
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    // full StatsComponent tuple; stddev from the same sum/sumsq
    // composition as StatsValuesFactory (and the engine)
    "facet_stats_full" ->
      """WITH v AS (SELECT l_returnflag, nullif(l_discount, 0.0) AS v FROM lineitem),
        |a AS (SELECT l_returnflag, count(v) AS cnt,
        |      count(*) - count(v) AS missing,
        |      min(v) AS min_raw, max(v) AS max_raw,
        |      sum(v) AS sum_raw, sum(v * v) AS sumsq_raw
        |      FROM v GROUP BY l_returnflag)
        |SELECT l_returnflag, cnt, missing,
        |       round(min_raw, 4) AS min_v, round(max_raw, 4) AS max_v,
        |       round(sum_raw, 4) AS sum_v, round(sumsq_raw, 4) AS sumsq,
        |       round(sum_raw / cnt, 6) AS mean,
        |       round(sqrt((sumsq_raw - sum_raw * sum_raw / cnt) / (cnt - 1)), 6) AS stddev
        |FROM a ORDER BY l_returnflag""".stripMargin,

    // gatherNodes: 1-hop expansion from the bounded root set
    "graph_gather_nodes" ->
      """SELECT l_suppkey AS node, count(*) AS n_edges,
        |       count(DISTINCT o_custkey) AS n_roots
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey <= 50
        |GROUP BY 1 ORDER BY node""".stripMargin,
    // scoreNodes: gathered nodes rescored by count * log((N+1)/(df+1))
    "graph_score_nodes" ->
      """WITH pairs AS (SELECT l_suppkey, o_custkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |g AS (SELECT l_suppkey AS node, count(*) AS n_edges FROM pairs
        |      WHERE o_custkey IN (SELECT c_custkey FROM customer
        |            WHERE c_mktsegment = 'BUILDING' AND c_custkey <= 50)
        |      GROUP BY 1),
        |d AS (SELECT l_suppkey AS node, count(DISTINCT o_custkey) AS doc_freq
        |      FROM pairs GROUP BY 1),
        |n AS (SELECT count(*) AS num FROM customer)
        |SELECT g.node, g.n_edges, d.doc_freq,
        |       round(g.n_edges * ln((n.num + 1.0) / (d.doc_freq + 1.0)), 4) AS score
        |FROM g JOIN d ON d.node = g.node CROSS JOIN n
        |ORDER BY score DESC, g.node LIMIT 20""".stripMargin,
    // /export: full sorted stream of the matching docset, no truncation;
    // token_count == the analyzer token count (the dl CTE)
    "export_sorted" ->
      s"""WITH $TokCte,
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         |ids AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'merge')
         |SELECT d.doc_id, dl.dl AS token_count, d.lang
         |FROM documents d JOIN ids USING (doc_id) JOIN dl USING (doc_id)
         |ORDER BY token_count DESC, d.doc_id""".stripMargin,
    // BFS shortest-path distances from C1 over the customer<->supplier
    // bipartite graph; recursive UNION == the visited-set dedup
    "graph_shortest_path" ->
      """WITH RECURSIVE ed AS (
        |  SELECT DISTINCT 'C' || o.o_custkey AS src, 'S' || l.l_suppkey AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  UNION
        |  SELECT DISTINCT 'S' || l.l_suppkey AS src, 'C' || o.o_custkey AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |bfs AS (
        |  SELECT 'C1' AS node, 0 AS dist
        |  UNION
        |  SELECT e.dst AS node, b.dist + 1 AS dist
        |  FROM bfs b JOIN ed e ON e.src = b.node
        |  WHERE b.dist < 3)
        |SELECT node, min(dist) AS dist FROM bfs
        |GROUP BY node ORDER BY dist, node""".stripMargin,
    "stream_innerjoin" ->
      """SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "stream_hashjoin" ->
      """SELECT p_brand, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "stream_intersect" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "stream_complement" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "stream_rollup" ->
      """SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value,
        |round(avg(value), 4) AS avg_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "stream_top" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "stream_unique" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "stream_select_having" ->
      """SELECT o_custkey, round(sum(o_totalprice), 2) AS total, count(*) AS n
        |FROM orders GROUP BY o_custkey
        |HAVING round(sum(o_totalprice), 2) > 300000 ORDER BY o_custkey""".stripMargin,
    "collapse_top1" ->
      """SELECT event_type, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY event_type""".stripMargin,
    "collapse_topk" ->
      """SELECT event_type, CAST(rn AS INT) AS rn, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
        |  FROM events) WHERE rn <= 3 ORDER BY event_type, rn""".stripMargin,
    // group.func: the group key is a computed value source, not a field
    "collapse_func" ->
      """SELECT band, o_orderkey, price AS o_totalprice FROM (
        |  SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS band,
        |         o_orderkey, round(o_totalprice, 2) AS price,
        |         row_number() OVER (PARTITION BY floor(o_totalprice / 50000)
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn = 1 ORDER BY band""".stripMargin,
    "expand_groups" ->
      """SELECT event_type, winner_event_id, CAST(rn AS INT) AS rn, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn,
        |         first_value(event_id) OVER (PARTITION BY event_type ORDER BY value DESC, event_id
        |                                     ROWS UNBOUNDED PRECEDING) AS winner_event_id
        |  FROM events) WHERE rn > 1 AND rn <= 3 ORDER BY event_type, rn""".stripMargin,
    "solr_join" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,
    "timeseries_daily" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, value, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, value,
        |        CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |      FROM g)
        |SELECT user_id, session_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,

    "text_token_count" ->
      s"""SELECT doc_id, len($QualityTokSql) AS n_tokens,
         |len(list_filter($QualityTokSql, x -> x NOT IN ($StopSql))) AS n_tokens_nostop
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      s"""WITH t AS (SELECT doc_id, text, $QualityTokSql AS toks FROM documents)
         |SELECT doc_id, len(toks) AS n_tokens,
         |round(length(text) * 1.0 / greatest(len(toks), 1), 4) AS avg_token_len,
         |round(len(list_filter(toks, x -> x IN ($StopSql))) * 1.0 / greatest(len(toks), 1), 4) AS stop_ratio,
         |round(len(list_distinct(toks)) * 1.0 / greatest(len(toks), 1), 4) AS uniq_ratio
         |FROM t ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      s"""SELECT doc_id, md5(array_to_string(list_sort(list_distinct($QualityTokSql)), ' ')) AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_langid" -> LangIdSql,
    // PII scan + redaction over deterministically-augmented text (every
    // third doc gets a synthetic email + IP + 32-hex key derived from
    // doc_id — the corpus has no organic PII); counts per pattern class
    // and the md5 of the redacted text (emails -> IPs -> hex, same order
    // as the engine)
    "text_pii" ->
      """WITH aug AS (SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN
        |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |    '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR) ||
        |    '.' || CAST(doc_id % 100 AS VARCHAR) ||
        |    ' apikey ' || md5(CAST(doc_id AS VARCHAR))
        |  ELSE text END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(t, '[0-9a-f]{32,}')) AS BIGINT) AS n_keys,
        |  md5(regexp_replace(regexp_replace(regexp_replace(t,
        |        '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |        '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
        |        '[0-9a-f]{32,}', '<KEY>', 'g')) AS redacted_md5
        |FROM aug ORDER BY doc_id""".stripMargin,
    // Gopher-style repetition metrics: top-2-gram occurrence fraction and
    // duplicate fraction over consecutive 3-token chunks
    "text_repetition" ->
      s"""WITH d AS (SELECT doc_id, $QualityTokSql AS toks FROM documents),
         |g AS (SELECT doc_id, unnest(list_transform(range(0, greatest(len(toks) - 1, 0)),
         |      i -> toks[i + 1] || ' ' || toks[i + 2])) AS gram FROM d),
         |gc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram),
         |gs AS (SELECT doc_id, max(c) AS maxc, sum(c) AS sumc FROM gc GROUP BY doc_id),
         |ch AS (SELECT doc_id, list_transform(range(0, CAST(ceil(len(toks) / 3.0) AS INT)),
         |      i -> array_to_string(toks[i * 3 + 1 : i * 3 + 3], ' ')) AS chunks FROM d)
         |SELECT d.doc_id,
         |  CAST(greatest(len(d.toks) - 1, 0) AS BIGINT) AS n_2grams,
         |  round(coalesce(gs.maxc * 1.0 / gs.sumc, 0.0), 4) AS top_2gram_frac,
         |  round(1.0 - len(list_distinct(ch.chunks)) * 1.0 /
         |        greatest(len(ch.chunks), 1), 4) AS dup_chunk_frac
         |FROM d JOIN ch ON ch.doc_id = d.doc_id
         |     LEFT JOIN gs ON gs.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // subword token counts under the COMMITTED BPE merge table (trained
    // once by graft.tools.BpeTrain, pinned like a production tokenizer);
    // both sides apply the identical ordered replace chain
    "text_bpe_count" -> TextOps.bpeCountOracleSql,
    // analyzer filters: md5-of-token-stream oracles (engine runs the fused
    // JVM/codegen chains, the oracle reproduces them in SQL — hash equality
    // pins every produced token)
    "analysis_word_delimiter" -> AnalysisOps.wordDelimiterOracleSql,
    "analysis_ascii_folding" -> AnalysisOps.asciiFoldingOracleSql,
    // /analysis/field debug: per-stage token streams (tokenize+lower,
    // stop, Porter) digested per doc; the stem CASE inlines the corpus
    // vocabulary's Porter map (6 of 31 tokens change)
    "analysis_debug" ->
      s"""WITH rawt AS (SELECT doc_id,
         |  list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
         |              x -> x <> '') AS raw
         |  FROM documents WHERE doc_id < 50),
         |st AS (SELECT doc_id, raw,
         |  list_filter(raw, x -> x NOT IN ($StopSql)) AS stopped FROM rawt),
         |sm AS (SELECT doc_id, raw, stopped,
         |  list_transform(stopped, x -> CASE x
         |    WHEN 'customer' THEN 'custom' WHEN 'merge' THEN 'merg'
         |    WHEN 'query' THEN 'queri' WHEN 'table' THEN 'tabl'
         |    WHEN 'value' THEN 'valu' WHEN 'key' THEN 'kei'
         |    ELSE x END) AS stemmed FROM st)
         |SELECT doc_id, CAST(len(raw) AS BIGINT) AS n_raw,
         |  CAST(len(stopped) AS BIGINT) AS n_stopped,
         |  md5(array_to_string(raw, ' ')) AS raw_md5,
         |  md5(array_to_string(stopped, ' ')) AS stopped_md5,
         |  md5(array_to_string(stemmed, ' ')) AS stemmed_md5
         |FROM sm ORDER BY doc_id""".stripMargin,
    "analysis_shingle" -> AnalysisOps.shingleOracleSql,
    "analysis_common_grams" -> AnalysisOps.commonGramsOracleSql,
    "analysis_ngram" -> AnalysisOps.ngramFilterOracleSql,
    // SpanMultiTermQueryWrapper(prefix "s*") under SpanNear(key, ·; slop=3,
    // ordered): the prefix leg matches ANY s-term position
    "search_span_multiterm" ->
      s"""WITH $PosCtes,
         |a AS (SELECT doc_id, pos FROM pp WHERE term = 'key'),
         |b AS (SELECT doc_id, pos FROM pp WHERE term LIKE 's%')
         |SELECT DISTINCT a.doc_id AS doc_id
         |FROM a JOIN b ON a.doc_id = b.doc_id
         |WHERE b.pos > a.pos AND (b.pos - a.pos + 1) - 2 <= 3
         |ORDER BY doc_id""".stripMargin,
    // surround "((merge 3W window) OR (key W order)) NOT dup":
    // nW = ordered within n positions (slop n-1); booleans on doc sets
    // (NOT is surround's infix exclusion operator)
    "search_surround_qp" ->
      s"""WITH $PosCtes,
         |m AS (SELECT doc_id, pos FROM pp WHERE term = 'merge'),
         |w AS (SELECT doc_id, pos FROM pp WHERE term = 'window'),
         |near1 AS (SELECT DISTINCT m.doc_id FROM m JOIN w ON w.doc_id = m.doc_id
         |          WHERE w.pos - m.pos BETWEEN 1 AND 3),
         |k AS (SELECT doc_id, pos FROM pp WHERE term = 'key'),
         |o AS (SELECT doc_id, pos FROM pp WHERE term = 'order'),
         |near2 AS (SELECT DISTINCT k.doc_id FROM k JOIN o ON o.doc_id = k.doc_id
         |          WHERE o.pos = k.pos + 1),
         |u AS (SELECT doc_id FROM near1 UNION SELECT doc_id FROM near2)
         |SELECT doc_id FROM u
         |WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM pp WHERE term = 'dup')
         |ORDER BY doc_id""".stripMargin,
    // DynamicRangeUtil: equal-weight (unit weight = equal count) ranges
    "facet_dynamic_range" ->
      """WITH v AS (SELECT l_extendedprice,
        |  l_orderkey * 10000 + l_linenumber AS rid FROM lineitem),
        |b AS (SELECT l_extendedprice,
        |  ntile(4) OVER (ORDER BY l_extendedprice, rid) AS bucket FROM v)
        |SELECT bucket, count(*) AS n,
        |  round(min(l_extendedprice), 2) AS lo,
        |  round(max(l_extendedprice), 2) AS hi,
        |  round(avg(l_extendedprice), 4) AS avg_price
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    // SKG relatedness: one-proportion z-score per source bucket, 1e-10
    // zero-denominator guard, then RelatednessAgg's five-sigmoid blend
    // into [-1,1], round 5
    "facet_relatedness" ->
      """WITH tk AS (SELECT doc_id, source,
        |  list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
        |              x -> x <> '') AS toks FROM documents),
        |d AS (SELECT source, list_contains(toks, 'merge') AS fg FROM tk),
        |b AS (SELECT source, CAST(sum(CASE WHEN fg THEN 1 ELSE 0 END) AS BIGINT) AS fg_count,
        |      count(*) AS bg_count FROM d GROUP BY source),
        |t AS (SELECT CAST(sum(CASE WHEN fg THEN 1 ELSE 0 END) AS BIGINT) AS fg_size,
        |      count(*) AS bg_size FROM d),
        |zc AS (SELECT source, fg_count, bg_count,
        |  (fg_count - fg_size * (bg_count * 1.0 / bg_size))
        |  / (CASE WHEN sqrt(fg_size * (bg_count * 1.0 / bg_size)
        |                    * (1 - bg_count * 1.0 / bg_size)) = 0 THEN 1e-10
        |     ELSE sqrt(fg_size * (bg_count * 1.0 / bg_size)
        |               * (1 - bg_count * 1.0 / bg_size)) END) AS z
        |FROM b, t)
        |SELECT source, fg_count, bg_count,
        |  round(0.2 * ((z - 80) / (50 + abs(z - 80))
        |             + (z - 30) / (30 + abs(z - 30))
        |             + z / (30 + abs(z))
        |             + (z + 30) / (30 + abs(z + 30))
        |             + (z + 80) / (50 + abs(z + 80))), 5) AS relatedness
        |FROM zc ORDER BY relatedness DESC, source LIMIT 10""".stripMargin,
    // multi-select faceting: each dimension's facet excludes its OWN
    // tagged filter; the `both` row pins the fully-filtered count
    "facet_exclude_tags" ->
      """WITH lf AS (SELECT 'lang' AS dim, lang AS value, count(*) AS cnt
        |  FROM documents WHERE source IN ('src3', 'src4')
        |  GROUP BY lang ORDER BY cnt DESC, value LIMIT 5),
        |sf AS (SELECT 'source' AS dim, source AS value, count(*) AS cnt
        |  FROM documents WHERE lang = 'en'
        |  GROUP BY source ORDER BY cnt DESC, value LIMIT 5),
        |bt AS (SELECT 'both' AS dim, '*' AS value, count(*) AS cnt
        |  FROM documents WHERE lang = 'en' AND source IN ('src3', 'src4'))
        |SELECT dim, value, cnt FROM (
        |  SELECT * FROM lf UNION ALL SELECT * FROM sf UNION ALL SELECT * FROM bt)
        |ORDER BY dim, cnt DESC, value""".stripMargin,
    // facet.range over a date field: +7DAY gap anchored at start, with
    // the before/after other buckets
    "facet_range_date" ->
      """SELECT CASE WHEN CAST(ts AS DATE) < DATE '2024-01-08' THEN 'before'
        |            WHEN CAST(ts AS DATE) >= DATE '2024-01-29' THEN 'after'
        |            ELSE strftime(DATE '2024-01-08' +
        |              CAST((date_diff('day', DATE '2024-01-08', CAST(ts AS DATE)) // 7) * 7 AS INT),
        |              '%Y-%m-%d') END AS bucket,
        |       count(*) AS cnt, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,
    // date-math range [NOW/DAY-21DAYS TO NOW/DAY-7DAYS] at pinned
    // NOW=2024-01-29T13:45:30Z resolves to [2024-01-08, 2024-01-22]
    // midnights UTC; the grammar itself is pinned by DateMathSpec
    "search_date_math" ->
      """SELECT event_type, count(*) AS cnt, round(sum(value), 4) AS sum_value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
        |  AND ts <= TIMESTAMP '2024-01-22 00:00:00'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // two-phase refined top-N over the token vocabulary == exact top-N
    // (the refinement wager the operator documents)
    "facet_refined_topk" ->
      """WITH tok AS (SELECT t.term FROM documents d,
        |  unnest(list_filter(string_split_regex(lower(d.text), '[^a-z0-9_]+'),
        |         x -> x <> '')) AS t(term))
        |SELECT term, count(*) AS cnt FROM tok
        |GROUP BY term ORDER BY cnt DESC, term LIMIT 10""".stripMargin,
    // [child] transformer: top parents with childLimit=5 nested ids
    "transform_child_docs" ->
      """WITH ch AS (SELECT source, doc_id,
        |  row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents),
        |par AS (SELECT source, count(*) AS n_children,
        |  md5(string_agg(CASE WHEN rn <= 5 THEN CAST(doc_id AS VARCHAR) END,
        |      ',' ORDER BY doc_id)) AS children_md5
        |  FROM ch GROUP BY source)
        |SELECT source, n_children, children_md5 FROM par
        |ORDER BY n_children DESC, source LIMIT 2""".stripMargin,
    "analysis_stem_override" -> AnalysisOps.stemOverrideOracleSql(stemSql),
    "ml_train_logreg" -> MlOps.trainLogRegOracleSql(),
    "ml_features_ig" -> MlOps.featuresIgOracleSql(),
    "ml_predict" -> MlOps.predictLogRegOracleSql(),
    // random(): seeded hash order == reproducible pseudo-random sample
    "stream_random" ->
      """SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || 'r4') AS h
        |FROM documents ORDER BY h, doc_id LIMIT 25""".stripMargin,
    // /update/json: schema-on-read parse of the props payload, then agg
    "source_json_props" ->
      """SELECT event_type,
        |  count(CAST(json_extract_string(props, '$.k') AS INT)) AS cnt,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // ExternalFileField: BM25 window * (1 + label/10) from the external
    // embeddings table (label keyed by vec_id == doc id)
    "search_external_boost" ->
      s"""WITH $TokCte,
         |$Bm25Ctes,
         |dfs AS (SELECT term, count(*) AS df FROM tf
         |        WHERE term IN ('merge', 'sort') GROUP BY term),
         |sc AS (SELECT tf.doc_id,
         |       sum(ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |           / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |       FROM tf JOIN dfs ON tf.term = dfs.term
         |            JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st
         |       GROUP BY tf.doc_id),
         |win AS (SELECT doc_id, score FROM (
         |  SELECT doc_id, score,
         |         row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rn
         |  FROM sc) WHERE rn <= 100),
         |b AS (SELECT w.doc_id,
         |        w.score * (1.0 + coalesce(e.label, 0) / 10.0) AS bs
         |      FROM win w LEFT JOIN embeddings e ON e.vec_id = w.doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(bs, 9) DESC, doc_id) AS rank,
         |         doc_id, round(bs, 4) AS score FROM b)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // BlendedInfixSuggester: 3-gram suggestions, weight/(matchpos+1)
    "suggest_blended_infix" ->
      """WITH tk AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
        |              x -> x <> '') AS toks FROM documents),
        |sh AS (SELECT toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3] AS suggestion
        |       FROM tk, unnest(range(len(toks) - 2)) AS r(i)
        |       WHERE len(toks) >= 3),
        |w AS (SELECT suggestion, count(*) AS weight FROM sh GROUP BY suggestion),
        |m AS (SELECT suggestion, weight,
        |        list_position(string_split(suggestion, ' '), 'merge') - 1 AS pos
        |      FROM w),
        |s AS (SELECT suggestion, weight,
        |        round(CAST(weight AS DOUBLE) / (pos + 1.0), 6) AS score
        |      FROM m WHERE pos >= 0)
        |SELECT suggestion, weight, score FROM s
        |ORDER BY score DESC, suggestion LIMIT 10""".stripMargin,
    // CCNet-style per-source boilerplate strip at threshold 0.9
    "boilerplate_strip" ->
      """WITH aug AS (SELECT doc_id, source,
        |  text || chr(10) || 'subscribe to ' || source || ' updates' ||
        |  CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'promo: click here'
        |       ELSE '' END AS t FROM documents),
        |ln AS (SELECT doc_id, source, string_split(t, chr(10)) AS lines FROM aug),
        |docline AS (SELECT DISTINCT doc_id, source, unnest(lines) AS line FROM ln),
        |freq AS (SELECT source, line, count(*) AS c FROM docline GROUP BY source, line),
        |tot AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
        |bp AS (SELECT f.source, f.line FROM freq f JOIN tot t ON f.source = t.source
        |       WHERE f.c * 1.0 / t.n_docs >= 0.9),
        |pos AS (SELECT l.doc_id, l.source, lines[i + 1] AS line, i
        |        FROM ln l, unnest(range(len(lines))) AS r(i)),
        |kept AS (SELECT p.doc_id, p.line, p.i FROM pos p
        |         WHERE NOT EXISTS (SELECT 1 FROM bp b
        |               WHERE b.source = p.source AND b.line = p.line))
        |SELECT doc_id, count(*)::BIGINT AS n_kept,
        |       md5(string_agg(line, chr(10) ORDER BY i)) AS kept_md5
        |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "analysis_multilang_stem" -> AnalysisOps.multilangStemOracleSql,
    "analysis_html_strip" -> AnalysisOps.htmlStripOracleSql,
    "analysis_cjk_bigram" -> AnalysisOps.cjkBigramOracleSql,
    "analysis_uax29" -> AnalysisOps.uax29OracleSql,
    "analysis_edge_ngram" -> AnalysisOps.edgeNgramOracleSql,
    "analysis_pattern_replace" -> AnalysisOps.patternReplaceOracleSql,
    "analysis_length_filter" -> AnalysisOps.lengthFilterOracleSql,
    // deterministic hash split: held-out = md5(doc_id) first hex in {0,1}
    "sample_stratified" ->
      """SELECT lang, doc_id, rn FROM (
        |  SELECT lang, doc_id,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY md5(CAST(doc_id AS VARCHAR) || ':strat'), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin,
    "host_cap" ->
      """WITH k AS (
        |  SELECT source, doc_id,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY md5(CAST(doc_id AS VARCHAR) || ':host'), doc_id) AS rn
        |  FROM documents WHERE source NOT IN ('src7'))
        |SELECT source, count(*) AS n_kept,
        |       md5(list_aggregate(list_sort(list(doc_id)), 'string_agg', ',')) AS kept_md5
        |FROM k WHERE rn <= 15 GROUP BY source ORDER BY source""".stripMargin,
    "mix_weights" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       round(200000.0 / sum(n_chars), 6) AS weight,
        |       CAST(CASE WHEN round(200000.0 / sum(n_chars), 6) > 1.0
        |            THEN floor(round(200000.0 / sum(n_chars), 6)) ELSE 0 END AS BIGINT) AS epochs
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "sample_hash" ->
      """SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bucket
        |FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
        |ORDER BY doc_id""".stripMargin,
    // benchmark decontamination: training docs sharing an 8-token shingle
    // with the doc_id % 7 == 0 pseudo-benchmark slice
    "decontaminate_ngram" ->
      s"""WITH tk AS (SELECT doc_id, $QualityTokSql AS toks FROM documents),
         |sh AS (SELECT DISTINCT doc_id,
         |       md5(array_to_string(toks[i + 1 : i + 8], ' ')) AS sh
         |       FROM tk, unnest(range(len(toks) - 7)) AS r(i)
         |       WHERE len(toks) >= 8),
         |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 7 = 0)
         |SELECT s.doc_id, count(*) AS n_hits
         |FROM sh s JOIN bench b ON s.sh = b.sh
         |WHERE s.doc_id % 7 <> 0
         |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    // contamination FRACTION + drop policy: share of a doc's distinct
    // shingles found in the pseudo-benchmark, dropped above 5%
    "decontaminate_fraction" ->
      s"""WITH tk AS (SELECT doc_id, $QualityTokSql AS toks FROM documents),
         |shd AS (SELECT doc_id, list_distinct(list_transform(range(len(toks) - 7),
         |        i -> md5(array_to_string(toks[i + 1 : i + 8], ' ')))) AS shs
         |        FROM tk WHERE len(toks) >= 8),
         |tr AS (SELECT doc_id, len(shs) AS n_sh, unnest(shs) AS sh
         |       FROM shd WHERE doc_id % 7 <> 0),
         |be AS (SELECT DISTINCT unnest(shs) AS sh FROM shd WHERE doc_id % 7 = 0),
         |h AS (SELECT tr.doc_id, tr.n_sh, count(*) AS n_hits
         |      FROM tr JOIN be USING (sh) GROUP BY tr.doc_id, tr.n_sh)
         |SELECT doc_id, n_sh, n_hits,
         |       round(n_hits * 1.0 / n_sh, 4) AS frac,
         |       n_hits * 1.0 / n_sh > 0.05 AS dropped
         |FROM h ORDER BY doc_id""".stripMargin,
    // quality-decile binning: ntile(10) by uniqueness ratio within lang
    "quality_bins" ->
      s"""WITH b AS (SELECT doc_id, lang,
         |  CAST(len($QualityTokSql) AS BIGINT) AS n_tokens,
         |  len(list_distinct($QualityTokSql)) * 1.0 /
         |    greatest(len($QualityTokSql), 1) AS uniq_ratio
         |  FROM documents),
         |n AS (SELECT lang, n_tokens, uniq_ratio,
         |  ntile(10) OVER (PARTITION BY lang
         |    ORDER BY uniq_ratio DESC, doc_id) AS decile FROM b)
         |SELECT lang, decile, count(*) AS cnt,
         |       round(avg(uniq_ratio), 4) AS avg_uniq,
         |       round(avg(n_tokens), 4) AS avg_tokens
         |FROM n GROUP BY lang, decile ORDER BY lang, decile""".stripMargin,
    // duplicate-span coverage: token positions inside any 16-token shingle
    // shared with another doc; keep_ratio = 1 - covered/len
    "dedup_span_coverage" ->
      s"""WITH tk AS (SELECT doc_id, $QualityTokSql AS toks FROM documents),
         |sh AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS len, i AS off,
         |       md5(array_to_string(toks[i + 1 : i + 16], ' ')) AS sh
         |       FROM tk, unnest(range(len(toks) - 15)) AS r(i)
         |       WHERE len(toks) >= 16),
         |dup AS (SELECT sh FROM (SELECT DISTINCT doc_id, sh FROM sh)
         |        GROUP BY sh HAVING count(*) >= 2),
         |cov AS (SELECT DISTINCT s.doc_id, s.len, s.off + u.j AS pos
         |        FROM sh s JOIN dup USING (sh), unnest(range(16)) AS u(j))
         |SELECT doc_id, len, count(*) AS covered,
         |       round(1.0 - count(*) * 1.0 / len, 4) AS keep_ratio
         |FROM cov GROUP BY doc_id, len ORDER BY doc_id""".stripMargin,
    // GPT-style sequence packing: cumulative token offsets chunked into
    // 512-token sequences, straddlers flagged
    "pack_sequences" ->
      s"""WITH tc AS (SELECT doc_id, len($QualityTokSql) AS n_tokens FROM documents),
         |c AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |      CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |        AS start_off FROM tc)
         |SELECT doc_id, n_tokens, start_off,
         |       CAST(floor(start_off / 512.0) AS BIGINT) AS seq_id,
         |       floor((start_off + n_tokens - 1) / 512.0) > floor(start_off / 512.0)
         |         AS spans_boundary
         |FROM c ORDER BY doc_id""".stripMargin,
    // external-benchmark-table decontamination (bench = the %19==3 slice
    // standing in for a separate eval-suite table)
    "decontaminate_table" ->
      s"""WITH tk AS (SELECT doc_id, $QualityTokSql AS toks FROM documents),
         |sh AS (SELECT DISTINCT doc_id,
         |       md5(array_to_string(toks[i + 1 : i + 8], ' ')) AS sh
         |       FROM tk, unnest(range(len(toks) - 7)) AS r(i)
         |       WHERE len(toks) >= 8),
         |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 19 = 3)
         |SELECT s.doc_id, count(*) AS n_hits
         |FROM sh s JOIN bench b ON s.sh = b.sh
         |WHERE s.doc_id % 19 <> 3
         |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    // exact duplicate-span detection: 16-token spans appearing in >= 2 docs
    "dedup_spans" ->
      s"""WITH tk AS (SELECT doc_id, $QualityTokSql AS toks FROM documents),
         |sh AS (SELECT DISTINCT doc_id,
         |       md5(array_to_string(toks[i + 1 : i + 16], ' ')) AS sh
         |       FROM tk, unnest(range(len(toks) - 15)) AS r(i)
         |       WHERE len(toks) >= 16),
         |shared AS (SELECT sh FROM sh GROUP BY sh HAVING count(DISTINCT doc_id) >= 2)
         |SELECT s.doc_id, count(*) AS dup_spans
         |FROM sh s JOIN shared u ON s.sh = u.sh
         |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    "text_term_stats" ->
      s"""WITH t AS (SELECT doc_id, unnest($QualityTokSql) AS term FROM documents)
         |SELECT term, count(DISTINCT doc_id) AS df, count(*) AS ttf
         |FROM t WHERE term IN ($ProbeTermsIn) GROUP BY term ORDER BY term""".stripMargin,

    "dedup_exact" ->
      """SELECT content_hash, n_docs, keep_doc_id FROM (
        |  SELECT md5(text) AS content_hash, count(*) AS n_docs, min(doc_id) AS keep_doc_id
        |  FROM documents GROUP BY 1)
        |ORDER BY n_docs DESC, content_hash LIMIT 20""".stripMargin,
    "dedup_fingerprint" ->
      s"""WITH f AS (SELECT doc_id,
         |  md5(array_to_string(list_sort(list_distinct($QualityTokSql)), ' ')) AS fingerprint
         |FROM documents)
         |SELECT fingerprint, count(*) AS n_docs, min(doc_id) AS keep_doc_id
         |FROM f GROUP BY fingerprint
         |ORDER BY count(*) DESC, fingerprint LIMIT 20""".stripMargin,

    // LSH banding has guaranteed recall at est >= 25/32 (pigeonhole over
    // 8 bands of 4), so the engine's banded join equals this exhaustive scan
    "dedup_minhash_lsh" ->
      s"""WITH $MinhashCtes
         |SELECT doc_a, doc_b, round(est_jaccard, 4) AS est_jaccard FROM est
         |WHERE est_jaccard >= 0.78125 ORDER BY doc_a, doc_b""".stripMargin,
    // duplicate-cluster resolution: transitive closure over the LSH pairs
    // (recursive CTE = the oracle for the engine's pointer-jumped min-label
    // propagation), canonical doc = min id per component
    "dedup_clusters" ->
      s"""WITH RECURSIVE $MinhashCtes,
         |sym AS (SELECT doc_a AS src, doc_b AS dst FROM est WHERE est_jaccard >= 0.78125
         |        UNION SELECT doc_b, doc_a FROM est WHERE est_jaccard >= 0.78125),
         |reach(node, r) AS (
         |  SELECT DISTINCT src, src FROM sym
         |  UNION
         |  SELECT s.dst, r.r FROM reach r JOIN sym s ON s.src = r.node),
         |comp AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node),
         |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id)
         |SELECT c.node AS doc_id, c.cluster_id, s.cluster_size,
         |       c.node = c.cluster_id AS keep
         |FROM comp c JOIN sz s USING (cluster_id)
         |ORDER BY doc_id""".stripMargin,
    // keep-best cluster resolution: longest member (token count) wins
    "dedup_keep_best" ->
      s"""WITH RECURSIVE $MinhashCtes,
         |sym AS (SELECT doc_a AS src, doc_b AS dst FROM est WHERE est_jaccard >= 0.78125
         |        UNION SELECT doc_b, doc_a FROM est WHERE est_jaccard >= 0.78125),
         |reach(node, r) AS (
         |  SELECT DISTINCT src, src FROM sym
         |  UNION
         |  SELECT s.dst, r.r FROM reach r JOIN sym s ON s.src = r.node),
         |comp AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node),
         |q AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM tk),
         |rr AS (SELECT c.node AS doc_id, c.cluster_id, q.n_tokens,
         |       row_number() OVER (PARTITION BY c.cluster_id
         |         ORDER BY q.n_tokens DESC, c.node) AS rn
         |       FROM comp c JOIN q ON q.doc_id = c.node)
         |SELECT doc_id, cluster_id, n_tokens, rn = 1 AS keep
         |FROM rr ORDER BY doc_id""".stripMargin,
    // exact shingle-set Jaccard >= 0.5 over the guaranteed-recall candidates
    "dedup_ngram_jaccard" ->
      s"""WITH $MinhashCtes,
         |shl AS (SELECT doc_id, list_distinct(list_transform(range(len(toks) - 2),
         |        i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3])) AS shingles
         |        FROM tk WHERE len(toks) >= 3),
         |cand AS (SELECT doc_a, doc_b FROM est WHERE est_jaccard >= 0.78125),
         |j AS (SELECT c.doc_a, c.doc_b,
         |      round(len(list_intersect(a.shingles, b.shingles)) * 1.0 /
         |            len(list_distinct(list_concat(a.shingles, b.shingles))), 4) AS jaccard
         |      FROM cand c JOIN shl a ON a.doc_id = c.doc_a
         |                  JOIN shl b ON b.doc_id = c.doc_b)
         |SELECT doc_a, doc_b, jaccard FROM j
         |WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,
    // simhash: tf-weighted bit votes over FNV unigram hashes; 4x16-bit
    // pigeonhole banding has exact recall at hamming <= 3, so the engine
    // equals this exhaustive Hamming scan
    "dedup_simhash" ->
      s"""WITH $AugCte,
         |$RawTokCte,
         |occ AS (SELECT doc_id, unnest(toks) AS tok FROM tk),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM occ GROUP BY doc_id, tok),
         |hh AS (SELECT doc_id, tf, ${fnvSql("tok")} AS h FROM tf),
         |votes AS (SELECT doc_id, bb.b AS b,
         |  sum(CASE WHEN (h >> CAST(bb.b AS INT)) % 2 = 1 THEN tf ELSE -tf END) AS v
         |  FROM hh, unnest(range(64)) bb(b) GROUP BY doc_id, bb.b),
         |shx AS (SELECT doc_id,
         |  CAST(CASE WHEN s >= 9223372036854775808::HUGEINT THEN s - $U64 ELSE s END AS BIGINT) AS simhash
         |  FROM (SELECT doc_id,
         |        sum(CASE WHEN v > 0 THEN (1::HUGEINT << CAST(b AS INT)) ELSE 0::HUGEINT END) AS s
         |        FROM votes GROUP BY doc_id)),
         |sh AS (SELECT tk.doc_id, coalesce(shx.simhash, 0) AS simhash
         |       FROM tk LEFT JOIN shx ON tk.doc_id = shx.doc_id)
         |SELECT doc_a, doc_b, hamming FROM (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin,

    "ann_brute_force" -> AnnSql,
    // pre-filtered KNN: the acceptance predicate restricts the candidate
    // set BEFORE the k selection (KnnFloatVectorQuery filter semantics)
    "ann_filtered" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id IN (0, 1, 2)),
         |s AS (SELECT q.query_id, e.vec_id, $CosSql AS cos
         |      FROM embeddings e, q WHERE e.vec_id <> q.query_id AND e.label = 1)
         |SELECT query_id, rank, vec_id, cos FROM (
         |  SELECT query_id, vec_id, round(cos, 4) AS cos,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
         |  FROM s)
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "ann_ivf_exact" -> AnnSql, // nprobe == nlist -> exact, same oracle
    "ann_lsh" -> LshAnnSql,
    // embedding-cosine near-dup: exhaustive pair scan over the corpus plus
    // the planted exact copies (vec 0..4 at id+1,000,000)
    "dedup_embedding" ->
      s"""WITH ev AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings WHERE vec_id < 5),
         |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |      list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
         |      (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
         |       sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) AS cos
         |      FROM ev a JOIN ev b ON a.vec_id < b.vec_id)
         |SELECT vec_a, vec_b, round(cos, 4) AS cos FROM p
         |WHERE cos >= 0.99 ORDER BY vec_a, vec_b""".stripMargin,

    "stream_window_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
        |count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    // streaming session windows == batch gap-sessionization; Spark closes a
    // session at gap >= 30 min (next start not strictly inside the window)
    "stream_session_window" ->
      """WITH g AS (
        |  SELECT user_id, event_id, value, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, value, ts,
        |        sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                               ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM g)
        |SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS session_start,
        |       count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,
    "stream_dedup_events" ->
      """SELECT event_type, count(*) AS cnt FROM (
        |  SELECT DISTINCT ON (event_id) event_id, event_type FROM events ORDER BY event_id)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // stream-stream interval join == the batch range self-join
    "stream_stream_join" ->
      """SELECT c.user_id, count(*) AS n_pairs
        |FROM events c JOIN events p ON p.user_id = c.user_id
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |GROUP BY c.user_id ORDER BY 1""".stripMargin,

    "multimodal_meta" ->
      """SELECT doc_id, 'GRFT' AS magic, octet_length(encode(text)) AS n_bytes,
        |64 + octet_length(encode(text)) % 577 AS width,
        |64 + octet_length(encode(text)) % 433 AS height,
        |1 + octet_length(encode(text)) % 3 AS channels
        |FROM documents ORDER BY doc_id""".stripMargin,
    // frame sampling: every 4th 256-byte frame, md5 digest. documents.text
    // is pure ASCII at every SF (driver-generated), so VARCHAR slicing ==
    // byte slicing and md5(varchar) == md5 of the payload bytes.
    "multimodal_frames" ->
      """WITH f AS (SELECT doc_id, text, length(text) AS n,
        |  unnest(range(0, (length(text) + 255) // 256, 4)) AS frame
        |FROM documents)
        |SELECT doc_id, CAST(frame AS INT) AS frame,
        |  CAST(least(n - frame * 256, 256) AS INT) AS frame_bytes,
        |  md5(substring(text, CAST(frame * 256 + 1 AS BIGINT), 256)) AS frame_md5
        |FROM f ORDER BY doc_id, frame""".stripMargin,
    // highlight: BM25 top-5 for (merge, sort), snippet = +-40 chars around
    // the leftmost query-term hit — same locate/substr arithmetic as the
    // engine's Catalyst expressions
    "search_highlight" ->
      s"""WITH $TokCte,
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         |qdl AS (SELECT doc_id, CASE WHEN dl < 32 THEN dl
         |        ELSE 24 + (((dl - 24) >> (length(printf('%b', dl - 24)) - 4)) << (length(printf('%b', dl - 24)) - 4))
         |        END AS qdl FROM dl),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n,
         |       (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl),
         |dfs AS (SELECT term, count(*) AS df FROM tf WHERE term IN ('merge', 'sort') GROUP BY term),
         |sc AS (SELECT tf.doc_id,
         |         sum(ln(1 + (st.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
         |             / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |       FROM tf JOIN dfs ON tf.term = dfs.term
         |            JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st
         |       GROUP BY tf.doc_id),
         |top AS (SELECT doc_id, round(score, 4) AS score FROM (
         |  SELECT doc_id, score, row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank FROM sc)
         |  WHERE rank <= 5),
         |hl AS (SELECT t.doc_id, t.score, d.text,
         |  least(coalesce(nullif(strpos(lower(d.text), 'merge'), 0), 2147483647),
         |        coalesce(nullif(strpos(lower(d.text), 'sort'), 0), 2147483647)) AS pos
         |  FROM top t JOIN documents d ON d.doc_id = t.doc_id)
         |SELECT doc_id, score,
         |  CASE WHEN pos = 2147483647 THEN substring(text, 1, 80)
         |       ELSE substring(text, greatest(1, pos - 40),
         |                      least(length(text), pos + 39) - greatest(0, pos - 41)) END AS snippet
         |FROM hl ORDER BY score DESC, doc_id""".stripMargin,
    // MoreLikeThis: seed = top-5 rarest (df asc, term asc) distinct analyzed
    // terms of doc 42, then a plain BM25 OR over them — the seed-term CTE
    // reproduces the engine's idf-descending selection exactly
    "more_like_this" ->
      s"""WITH $TokCte,
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         |qdl AS (SELECT doc_id, CASE WHEN dl < 32 THEN dl
         |        ELSE 24 + (((dl - 24) >> (length(printf('%b', dl - 24)) - 4)) << (length(printf('%b', dl - 24)) - 4))
         |        END AS qdl FROM dl),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n,
         |       (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl),
         |alldf AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |seeds AS (SELECT term, df FROM alldf
         |          WHERE term IN (SELECT DISTINCT term FROM tok WHERE doc_id = 42)
         |          ORDER BY df ASC, term ASC LIMIT 5),
         |sc AS (SELECT tf.doc_id,
         |         sum(ln(1 + (st.n - s.df + 0.5) / (s.df + 0.5)) * tf.tf
         |             / (tf.tf + 1.2 * (0.25 + 0.75 * qdl.qdl / st.avgdl))) AS score
         |       FROM tf JOIN seeds s ON tf.term = s.term
         |            JOIN qdl ON tf.doc_id = qdl.doc_id CROSS JOIN st
         |       GROUP BY tf.doc_id)
         |SELECT rank, doc_id, score FROM (
         |  SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank,
         |         doc_id, round(score, 4) AS score FROM sc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin)
  // every queries() entry now has a DuckDB oracle
}
