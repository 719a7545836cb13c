package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.query.GeoQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from the SURVEY.md §2
  * inventory rebuilt Spark-first; [[oracleSql]] carries the DuckDB-runnable
  * equivalent over the same parquet tables (identical column names/types —
  * the driver hashes columns sorted by name).
  */
object SparkEntry {

  /** Flagship query (SURVEY.md §7.2): point-in-polygon admin lookup —
    * "which level-6 area contains each point" — on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    GeoQueries.pipLookup(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // cell index (T7/T13/T14 + north-star codegen encode)
    "q_cell_points" -> ((s, d) => GeoQueries.cellPoints(s, d)),
    // per-row precision-ladder selection by element type (T12)
    "q_precision_ladder" -> ((s, d) => GeoQueries.precisionLadder(s, d)),
    // flagship PIP lookup (Q3)
    "q_pip_nation" -> ((s, d) => GeoQueries.pipLookup(s, d, level = 4)),
    "q_pip_district" -> ((s, d) => GeoQueries.pipLookup(s, d, level = 8)),
    "q_pip_salted" -> ((s, d) => GeoQueries.pipLookupSalted(s, d)),
    // containment join (Q5)
    "q_containment" -> ((s, d) => GeoQueries.containmentJoin(s, d)),
    // fuzzy-within (0.9) decides metro->state membership end-to-end (Q9)
    "q_metro_fuzzy" -> ((s, d) => GeoQueries.metroFuzzy(s, d)),
    // degenerate bowtie overlays: the Try-failure -> false arm decides (Q9)
    "q_fuzzy_invalid" -> ((s, d) => GeoQueries.fuzzyInvalid(s, d)),
    // hole-bearing areas: PIP excludes points inside the interior ring
    "q_pip_enclave" -> ((s, d) => GeoQueries.pipEnclave(s, d)),
    "q_pip_baarle" -> ((s, d) => GeoQueries.pipBaarle(s, d)),
    // hole-aware within: exact / hole-rejected / fuzzy arms over the donuts
    "q_enclave_within" -> ((s, d) => GeoQueries.enclaveWithin(s, d)),
    // dateline-straddling bbox: two-hemisphere cover + wrapped refine
    "q_dateline_bbox" -> ((s, d) => GeoQueries.datelineBbox(s, d)),
    // hole-aware polyfill: outer grid minus cells strictly inside the hole
    "q_enclave_polyfill" -> ((s, d) => GeoQueries.enclavePolyfill(s, d)),
    "q_baarle_polyfill" -> ((s, d) => GeoQueries.baarlePolyfill(s, d)),
    // geometry-derived area/perimeter over the donuts (JTS honors rings)
    "q_enclave_stats" -> ((s, d) => graft.query.GeoMeasures.enclaveStats(s, d)),
    "q_baarle_stats" -> ((s, d) => graft.query.GeoMeasures.baarleStats(s, d)),
    // chained admin-ladder query (Q11: country -> ... -> community, 8 levels)
    "q_area_chain" -> ((s, d) => graft.api.AstTranslator.areaChain(s, d)),
    // POI queries (Q6 / Q7)
    "q_poi_area" -> ((s, d) => GeoQueries.poiFromArea(s, d)),
    "q_poi_cell" -> ((s, d) => GeoQueries.poiByCell(s, d)),
    // POI catalog as a data table, incl. the multi-tag gym category (Q12)
    "q_poi_catalog" -> ((s, d) => graft.query.PoiCatalog.poisOf(s, d)),
    // kNN + radius (Q8)
    "q_knn" -> ((s, d) => GeoQueries.knn(s, d)),
    // distributed batch kNN-join over a 200-probe grid (ring state in DFs)
    // built THROUGH the serialisable AST (round-5 verdict #4: the batch
    // surface is wire-addressable — translate(KnnBatch) = knnBatchGrid)
    "q_knn_batch" -> ((s, d) => graft.api.AstTranslator.translate(s, d,
      graft.api.GeoAst.KnnBatch("grid", GeoQueries.KNN_BATCH_K, GeoQueries.KNN_BATCH_PRUNE_M))
      .fold(e => throw new IllegalArgumentException(e.msg), identity)),
    "q_radius" -> ((s, d) => GeoQueries.radius(s, d)),
    // tiling (north-star raster/vector)
    "q_tile_assign" -> ((s, d) => GeoQueries.tileAssign(s, d)),
    "q_raster_vector" -> ((s, d) => GeoQueries.rasterVector(s, d)),
    "q_tile_pyramid" -> ((s, d) => GeoQueries.tilePyramid(s, d)),
    // vertex-based cell cover over non-rect geometry (T14)
    "q_vertex_cover" -> ((s, d) => GeoQueries.vertexCoverTable(s, d)),
    // polygon->cell polyfill (H3 polyfill analog) over the inscribed diamond
    "q_area_polyfill" -> ((s, d) => GeoQueries.areaPolyfill(s, d)),
    // counts / search (S8 / S10)
    "q_counts_by_cell" -> ((s, d) => GeoQueries.countsByCell(s, d)),
    "q_counts_by_cell_tag" -> ((s, d) => GeoQueries.countsByCellTag(s, d)),
    "q_name_search" -> ((s, d) => GeoQueries.nameSearch(s, d)),
    // built THROUGH the serialisable AST (wire-addressable scored search)
    "q_name_ranked" -> ((s, d) => graft.api.AstTranslator.translate(s, d,
      graft.api.GeoAst.NameSearch("state 7", 12))
      .fold(e => throw new IllegalArgumentException(e.msg), identity)),
    "q_name_indexed" -> ((s, d) => graft.index.SnapshotQueries.nameIndexedSearch(s, d)),
    // relation-by-name full chain (Q2): search -> mapping -> fetch -> tag -> dedup
    "q_area_by_name" -> ((s, d) => GeoQueries.areaByNameChain(s, d)),
    // normalize + span invariants + way assembly (T2/T3, input_hint)
    "q_normalize" -> ((s, d) => GeoQueries.normalize(s, d)),
    "q_span_roundtrip" -> ((s, d) => GeoQueries.spanRoundtrip(s, d)),
    "q_way_assemble" -> ((s, d) => GeoQueries.wayAssemble(s, d)),
    // training-data text pipeline (dedup / similarity / analysis)
    "q_text_exact_dedup" -> ((s, d) => graft.text.TextOps.exactDedup(s, d)),
    "q_text_lang_id" -> ((s, d) => graft.text.TextOps.langId(s, d)),
    "q_text_quality" -> ((s, d) => graft.text.TextOps.qualityScore(s, d)),
    "q_text_tokens" -> ((s, d) => graft.text.TextOps.tokenCount(s, d)),
    // regex-class pre-tokenizer counts (alpha/number/punct runs)
    "q_text_token_classes" -> ((s, d) => graft.text.TextOps.tokenClasses(s, d)),
    // adaptive per-language quality floor (rank-based decile cut)
    "q_text_quality_floor" -> ((s, d) => graft.text.TextOps.qualityFloor(s, d)),
    "q_text_fingerprint" -> ((s, d) => graft.text.TextOps.fingerprint(s, d)),
    // per-doc tf-idf keywords (integer-ordered rank, score rides along)
    "q_text_keywords" -> ((s, d) => graft.text.TextOps.keywords(s, d)),
    "q_text_minhash_sig" -> ((s, d) => graft.text.TextOps.minhashSignatures(s, d)),
    "q_text_minhash_pairs" -> ((s, d) => graft.text.TextOps.minhashPairs(s, d)),
    // near-dup pairs -> connected components -> canonical survivor per cluster
    "q_text_dup_clusters" -> ((s, d) => graft.text.DedupGraph.dupClusters(s, d)),
    // exact grouped quantiles (approx-sketch twin pinned in tests)
    "q_len_quantiles" -> ((s, d) => graft.text.Stats.lenQuantiles(s, d)),
    // every rollup level of (lang, source) in one aggregate pass
    "q_corpus_rollup" -> ((s, d) => graft.text.Stats.corpusRollup(s, d)),
    // the composite curation pass over all verified hygiene/dedup stages
    "q_text_curate" -> ((s, d) => graft.text.Curate.curate(s, d)),
    // sequence packing via a distributed two-phase prefix sum
    "q_text_seq_pack" -> ((s, d) => graft.text.Packing.seqPack(s, d)),
    // image near-dup pairs: perceptual hash + Hamming-band LSH (media modality)
    "q_media_phash_pairs" -> ((s, d) => graft.media.MediaOps.phashPairs(s, d)),
    // per-level spatial measures: exact deg^2 area + geodesic edge length
    "q_area_stats" -> ((s, d) => graft.query.GeoMeasures.areaStats(s, d)),
    // conversion funnel: first signup -> first subsequent purchase per user
    "q_funnel" -> ((s, d) => graft.query.AsOf.conversionFunnel(s, d)),
    // as-of enrichment: union + LOCF window, one shuffle on the entity key
    "q_asof_enrich" -> ((s, d) => graft.query.AsOf.purchasesWithProfile(s, d)),
    // z-order region query: a coarse cell as ONE contiguous fine-id range
    "q_zorder_range" -> ((s, d) => graft.index.ZLayout.zRangeCount(s, d)),
    // eval-set n-gram leakage flagging (broadcast semi-join)
    "q_text_decontaminate" -> ((s, d) => graft.text.Hygiene.decontaminate(s, d)),
    // fresh-batch digest anti-join vs the ingested corpus
    "q_text_incr_dedup" -> ((s, d) => graft.text.Hygiene.incrDedup(s, d)),
    // the reference's approx->exact Bloom-guarded dedup (same semantics,
    // map-side routing: only might-seen rows pay the anti-join shuffle)
    "q_text_bloom_dedup" -> ((s, d) => graft.text.Hygiene.bloomIncrDedup(s, d)),
    // email/phone scrubbing with portable-regex parity
    "q_text_redact" -> ((s, d) => graft.text.Hygiene.redact(s, d)),
    "q_text_simhash" -> ((s, d) => graft.text.TextOps.simhash(s, d)),
    "q_text_simhash_pairs" -> ((s, d) => graft.text.TextOps.simhashPairs(s, d)),
    // planes pinned to the oracle's fixed count (parity at every SF;
    // planesFor is the deployment dial)
    "q_embed_neardup" -> ((s, d) => graft.vector.VectorOps.nearDupPairs(s, d,
      planesOpt = Some(graft.vector.VectorOps.PLANES_PER_TABLE))),
    "q_text_ngram_jaccard" -> ((s, d) => graft.text.TextOps.ngramJaccard(s, d)),
    "q_text_chunks" -> ((s, d) => graft.text.TextOps.chunks(s, d)),
    "q_text_repetition" -> ((s, d) => graft.text.TextOps.repetition(s, d)),
    "q_sample_stratified" -> ((s, d) => graft.text.TextOps.stratifiedSample(s, d)),
    // corpus-construction ops: passage dedup, LM scoring, mixing, sharding
    "q_text_para_dedup" -> ((s, d) => graft.text.Mixing.passageDedup(s, d)),
    "q_text_unigram_lm" -> ((s, d) => graft.text.Mixing.unigramLm(s, d)),
    "q_sample_temperature" -> ((s, d) => graft.text.Mixing.temperatureSample(s, d)),
    "q_shard_pack" -> ((s, d) => graft.text.Mixing.shardPack(s, d)),
    "q_text_ngram_mine" -> ((s, d) => graft.text.Mixing.ngramMine(s, d)),
    // reverse geocode: the full admin path per point (Q3 up the ladder)
    "q_revgeo" -> ((s, d) => GeoQueries.reverseGeocode(s, d)),
    // similarity search over embeddings
    "q_embed_topk" -> ((s, d) => graft.vector.VectorOps.cosineTopK(s, d)),
    "q_embed_lsh_ann" -> ((s, d) => graft.vector.VectorOps.lshTopK(s, d,
      planes = Some(graft.vector.VectorOps.PLANES_PER_TABLE))),
    "q_embed_ivf" -> ((s, d) => graft.vector.VectorOps.ivfTopK(s, d)),
    "q_embed_buckets" -> ((s, d) => graft.vector.VectorOps.bucketHistogram(s, d)),
    // RAG retrieval: LSH ANN neighbors + metadata attach, corpus never shuffles
    "q_semantic_search" -> ((s, d) => graft.vector.VectorOps.semanticSearch(s, d)),
    // semantic dedup: CC clusters over the embedding near-dup pair list
    "q_embed_dup_clusters" -> ((s, d) => graft.vector.VectorOps.embedDupClusters(s, d)),
    // index builders (T7/T9) + relation assembly (T4) + GeoJSON (Q18)
    "q_mapping_table" -> ((s, d) => graft.index.IndexBuild.mappingTable(s, d)),
    "q_cell_tag_table" -> ((s, d) => graft.index.IndexBuild.cellTagTable(s, d)),
    "q_relation_assemble" -> ((s, d) => graft.index.IndexBuild.relationAssemble(s, d)),
    // two-hop members: relation -> way mapping -> assembled-way fetch (T4 full)
    "q_relation_mixed" -> ((s, d) => graft.index.IndexBuild.relationMixed(s, d)),
    "q_relation_multi" -> ((s, d) => graft.index.IndexBuild.relationMulti(s, d)),
    "q_geojson" -> ((s, d) => graft.index.IndexBuild.geojson(s, d)),
    "q_geojson_way" -> ((s, d) => graft.index.IndexBuild.geojsonWay(s, d)),
    // area boundaries as Polygon / GeometryCollection(MultiPolygon) GeoJSON
    "q_geojson_area" -> ((s, d) => graft.index.IndexBuild.geojsonArea(s, d)),
    // GeoJSON with interior rings: donut polygons carry a ring LIST
    "q_geojson_enclave" -> ((s, d) => graft.index.IndexBuild.geojsonEnclave(s, d)),
    "q_geojson_baarle" -> ((s, d) => graft.index.IndexBuild.geojsonBaarle(s, d)),
    // the full type-routed serialisation dispatch over all object classes (Q14)
    "q_geojson_dispatch" -> ((s, d) => graft.index.IndexBuild.geojsonDispatch(s, d)),
    "q_geojson_multi" -> ((s, d) => graft.index.IndexBuild.geojsonMulti(s, d)),
    // streaming surface: batch twin of the watermarked windowed aggregation
    "q_stream_window" -> ((s, d) =>
      graft.streaming.StreamNormalize.windowedCellCounts(graft.gen.GeoWorld.docs(s, d))),
    "q_stream_sliding" -> ((s, d) =>
      graft.streaming.StreamNormalize.slidingCellCounts(graft.gen.GeoWorld.docs(s, d))),
    "q_stream_session" -> ((s, d) =>
      graft.streaming.StreamNormalize.sessionCellCounts(graft.gen.GeoWorld.docs(s, d))),
    // stream-static enrich join: continuous PIP over the ingest stream
    "q_stream_enrich" -> ((s, d) =>
      graft.streaming.StreamNormalize.enrichedAreaCountsOf(s, d)),
    // multimodal media plumbing (stubbed decode, real batching)
    "q_media_decode" -> ((s, d) => graft.media.MediaOps.decodeMedia(s, d)),
    "q_media_tiles" -> ((s, d) => graft.media.MediaOps.mediaTiles(s, d)),
    "q_media_frames" -> ((s, d) => graft.media.MediaOps.frameSample(s, d)),
    // interleaved multimodal pairing: media span -> nearest preceding text span
    "q_media_caption" -> ((s, d) => graft.media.MediaOps.mediaCaption(s, d)),
    // Iceberg-style snapshot table: COW merge + time travel, read via manifest
    "q_index_upsert" -> ((s, d) => graft.index.SnapshotQueries.indexUpsert(s, d)),
    // full maintenance cycle: upsert -> compact -> expire, layout-only
    "q_snap_maintain" -> ((s, d) => graft.index.SnapshotQueries.snapMaintain(s, d)),
    // S5/S6 bbox fetch served from the snapshot index via manifest pruning
    "q_snap_bbox" -> ((s, d) => graft.index.SnapshotQueries.bboxIndexFetch(s, d)),
    "q_snap_sql" -> ((s, d) => graft.index.SnapshotQueries.bboxSqlFetch(s, d)),
    "q_snap_insert" -> ((s, d) => graft.index.SnapshotQueries.sqlInsertUpsert(s, d)),
    "q_snap_dpp" -> ((s, d) => graft.index.SnapshotQueries.bboxDimFetch(s, d)),
    "q_snap_count" -> ((s, d) => graft.index.SnapshotQueries.snapMetaAgg(s, d)),
    "q_snap_overwrite" -> ((s, d) => graft.index.SnapshotQueries.sqlOverwriteUpsert(s, d)),
    "q_snap_delete" -> ((s, d) => graft.index.SnapshotQueries.sqlDelete(s, d)),
    "q_snap_feed" -> ((s, d) => graft.index.SnapshotQueries.changeFeed(s, d)),
    // catalog DDL/DML lifecycle: CREATE TABLE + INSERT INTO + pruned SELECT
    "q_snap_catalog" -> ((s, d) => graft.index.SnapshotQueries.bboxCatalogFetch(s, d)),
    // three-clause MERGE INTO via the group-based COW row-level path
    "q_snap_merge" -> ((s, d) => graft.index.SnapshotQueries.sqlMergeUpsert(s, d)),
    // storage-partitioned join: co-partitioned fact<->rollup, zero exchange
    "q_snap_spj" -> ((s, d) => graft.index.SnapshotQueries.spjJoin(s, d)),
    // latest-k via TopN pushdown over manifest bounds (event-ordered layout)
    "q_snap_topn" -> ((s, d) => graft.index.SnapshotQueries.snapTopN(s, d)),
    // S5 point fetch: part-pruned manifests + pid IN riding to the readers
    "q_snap_point" -> ((s, d) => graft.index.SnapshotQueries.snapPoint(s, d)),
    // merge-on-read equality delete: SQL DELETE commits delete files, zero rewrites
    "q_snap_mor" -> ((s, d) => graft.index.SnapshotQueries.morDelete(s, d)),
    // tag whitelist (T10/T11) + distinct stats (G7 exact twin)
    "q_tag_whitelist" -> ((s, d) => graft.index.TagOps.tagWhitelist(s, d)),
    "q_cell_distinct" -> ((s, d) => graft.index.TagOps.distinctTagsByCell(s, d)),
  )

  def oracleSql: Map[String, String] = Map(
    "q_cell_points" -> GeoQueries.cellPointsSql,
    "q_precision_ladder" -> GeoQueries.precisionLadderSql,
    "q_pip_nation" -> GeoQueries.pipLookupSql(level = 4),
    "q_pip_district" -> GeoQueries.pipLookupSql(level = 8),
    "q_pip_salted" -> GeoQueries.pipLookupSql(level = 4),
    "q_containment" -> GeoQueries.containmentJoinSql(),
    "q_metro_fuzzy" -> GeoQueries.metroFuzzySql,
    "q_fuzzy_invalid" -> GeoQueries.fuzzyInvalidSql,
    "q_pip_enclave" -> GeoQueries.pipEnclaveSql,
    "q_pip_baarle" -> GeoQueries.pipBaarleSql,
    "q_enclave_within" -> GeoQueries.enclaveWithinSql,
    "q_dateline_bbox" -> GeoQueries.datelineBboxSql,
    "q_enclave_polyfill" -> GeoQueries.enclavePolyfillSql(),
    "q_baarle_polyfill" -> GeoQueries.baarlePolyfillSql(),
    "q_enclave_stats" -> graft.query.GeoMeasures.enclaveStatsSql,
    "q_baarle_stats" -> graft.query.GeoMeasures.baarleStatsSql,
    "q_area_chain" -> graft.api.AstTranslator.areaChainSql(),
    "q_poi_area" -> GeoQueries.poiFromAreaSql(),
    "q_poi_cell" -> GeoQueries.poiByCellSql(),
    "q_poi_catalog" -> graft.query.PoiCatalog.poisOfSql(),
    "q_knn" -> GeoQueries.knnSql(),
    "q_knn_batch" -> GeoQueries.knnBatchGridSql,
    "q_radius" -> GeoQueries.radiusSql(),
    "q_tile_assign" -> GeoQueries.tileAssignSql(),
    "q_raster_vector" -> GeoQueries.rasterVectorSql(),
    "q_tile_pyramid" -> GeoQueries.tilePyramidSql(),
    "q_vertex_cover" -> GeoQueries.vertexCoverSql(),
    "q_area_polyfill" -> GeoQueries.areaPolyfillSql(),
    "q_counts_by_cell" -> GeoQueries.countsByCellSql,
    "q_counts_by_cell_tag" -> GeoQueries.countsByCellTagSql,
    "q_name_search" -> GeoQueries.nameSearchSql(),
    "q_name_ranked" -> GeoQueries.nameRankedSql(),
    "q_name_indexed" -> graft.index.SnapshotQueries.nameIndexedSearchSql(),
    "q_area_by_name" -> GeoQueries.areaByNameChainSql(),
    "q_normalize" -> GeoQueries.normalizeSql,
    "q_span_roundtrip" -> GeoQueries.spanRoundtripSql,
    "q_way_assemble" -> GeoQueries.wayAssembleSql,
    "q_text_exact_dedup" -> graft.text.TextOps.exactDedupSql,
    "q_text_lang_id" -> graft.text.TextOps.langIdSql,
    "q_text_quality" -> graft.text.TextOps.qualityScoreSql,
    "q_text_tokens" -> graft.text.TextOps.tokenCountSql,
    "q_text_fingerprint" -> graft.text.TextOps.fingerprintSql,
    "q_text_minhash_sig" -> graft.text.TextOps.minhashSignaturesSql,
    "q_text_minhash_pairs" -> graft.text.TextOps.minhashPairsSql,
    "q_text_dup_clusters" -> graft.text.DedupGraph.dupClustersSql,
    "q_len_quantiles" -> graft.text.Stats.lenQuantilesSql,
    "q_corpus_rollup" -> graft.text.Stats.corpusRollupSql,
    "q_text_curate" -> graft.text.Curate.curateSql,
    "q_text_seq_pack" -> graft.text.Packing.seqPackSql,
    "q_asof_enrich" -> graft.query.AsOf.purchasesWithProfileSql,
    "q_funnel" -> graft.query.AsOf.conversionFunnelSql,
    "q_area_stats" -> graft.query.GeoMeasures.areaStatsSql,
    "q_media_phash_pairs" -> graft.media.MediaOps.phashPairsSql,
    "q_zorder_range" -> graft.index.ZLayout.zRangeCountSql,
    "q_text_decontaminate" -> graft.text.Hygiene.decontaminateSql,
    "q_text_incr_dedup" -> graft.text.Hygiene.incrDedupSql,
    "q_text_bloom_dedup" -> graft.text.Hygiene.incrDedupSql, // identical semantics by design
    "q_text_redact" -> graft.text.Hygiene.redactSql,
    "q_text_simhash" -> graft.text.TextOps.simhashSql,
    "q_text_simhash_pairs" -> graft.text.TextOps.simhashPairsSql(),
    "q_embed_neardup" -> graft.vector.VectorOps.nearDupPairsSql(),
    "q_embed_dup_clusters" -> graft.vector.VectorOps.embedDupClustersSql(),
    "q_text_keywords" -> graft.text.TextOps.keywordsSql(),
    "q_text_token_classes" -> graft.text.TextOps.tokenClassesSql,
    "q_text_quality_floor" -> graft.text.TextOps.qualityFloorSql,
    "q_text_ngram_jaccard" -> graft.text.TextOps.ngramJaccardSql,
    "q_text_chunks" -> graft.text.TextOps.chunksSql,
    "q_text_repetition" -> graft.text.TextOps.repetitionSql,
    "q_sample_stratified" -> graft.text.TextOps.stratifiedSampleSql,
    "q_text_para_dedup" -> graft.text.Mixing.passageDedupSql,
    "q_text_unigram_lm" -> graft.text.Mixing.unigramLmSql,
    "q_sample_temperature" -> graft.text.Mixing.temperatureSampleSql,
    "q_shard_pack" -> graft.text.Mixing.shardPackSql,
    "q_text_ngram_mine" -> graft.text.Mixing.ngramMineSql,
    "q_revgeo" -> GeoQueries.reverseGeocodeSql,
    "q_embed_topk" -> graft.vector.VectorOps.cosineTopKSql(),
    "q_embed_lsh_ann" -> graft.vector.VectorOps.lshTopKSql(),
    "q_embed_ivf" -> graft.vector.VectorOps.ivfTopKSql(),
    "q_embed_buckets" -> graft.vector.VectorOps.bucketHistogramSql,
    "q_semantic_search" -> graft.vector.VectorOps.semanticSearchSql(),
    "q_mapping_table" -> graft.index.IndexBuild.mappingTableSql,
    "q_cell_tag_table" -> graft.index.IndexBuild.cellTagTableSql,
    "q_relation_assemble" -> graft.index.IndexBuild.relationAssembleSql,
    "q_relation_mixed" -> graft.index.IndexBuild.relationMixedSql,
    "q_relation_multi" -> graft.index.IndexBuild.relationMultiSql,
    "q_geojson" -> graft.index.IndexBuild.geojsonSql,
    "q_geojson_way" -> graft.index.IndexBuild.geojsonWaySql,
    "q_geojson_area" -> graft.index.IndexBuild.geojsonAreaSql,
    "q_geojson_enclave" -> graft.index.IndexBuild.geojsonEnclaveSql,
    "q_geojson_baarle" -> graft.index.IndexBuild.geojsonBaarleSql,
    "q_geojson_dispatch" -> graft.index.IndexBuild.geojsonDispatchSql,
    "q_geojson_multi" -> graft.index.IndexBuild.geojsonMultiSql,
    "q_stream_window" -> graft.streaming.StreamNormalize.windowedCellCountsSql,
    "q_stream_sliding" -> graft.streaming.StreamNormalize.slidingCellCountsSql,
    "q_stream_session" -> graft.streaming.StreamNormalize.sessionCellCountsSql,
    "q_stream_enrich" -> graft.streaming.StreamNormalize.enrichedAreaCountsSql,
    "q_media_decode" -> graft.media.MediaOps.decodeMediaSql,
    "q_media_tiles" -> graft.media.MediaOps.mediaTilesSql(),
    "q_media_frames" -> graft.media.MediaOps.frameSampleSql(),
    "q_media_caption" -> graft.media.MediaOps.mediaCaptionSql,
    "q_index_upsert" -> graft.index.SnapshotQueries.indexUpsertSql,
    "q_snap_maintain" -> graft.index.SnapshotQueries.snapMaintainSql,
    "q_snap_bbox" -> graft.index.SnapshotQueries.bboxIndexFetchSql,
    "q_snap_sql" -> graft.index.SnapshotQueries.bboxSqlFetchSql,
    "q_snap_catalog" -> graft.index.SnapshotQueries.bboxCatalogFetchSql,
    "q_snap_merge" -> graft.index.SnapshotQueries.sqlMergeUpsertSql,
    "q_snap_spj" -> graft.index.SnapshotQueries.spjJoinSql,
    "q_snap_topn" -> graft.index.SnapshotQueries.snapTopNSql,
    "q_snap_point" -> graft.index.SnapshotQueries.snapPointSql,
    "q_snap_mor" -> graft.index.SnapshotQueries.morDeleteSql,
    "q_snap_insert" -> graft.index.SnapshotQueries.sqlInsertUpsertSql,
    "q_snap_dpp" -> graft.index.SnapshotQueries.bboxDimFetchSql,
    "q_snap_count" -> graft.index.SnapshotQueries.snapMetaAggSql,
    "q_snap_overwrite" -> graft.index.SnapshotQueries.sqlOverwriteUpsertSql,
    "q_snap_delete" -> graft.index.SnapshotQueries.sqlDeleteSql,
    "q_snap_feed" -> graft.index.SnapshotQueries.changeFeedSql,
    "q_tag_whitelist" -> graft.index.TagOps.tagWhitelistSql,
    "q_cell_distinct" -> graft.index.TagOps.distinctTagsByCellSql,
  )
}
