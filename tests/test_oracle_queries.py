"""Every registered query with an oracle must match DuckDB exactly
(the driver's t2 gate, replicated locally at sf0.001)."""

from __future__ import annotations

import pytest

from pyspark_mrdf_spark.queries import load_all
from tests.oracle_util import compare_query

SPECS = load_all()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, sf_dir, name):
    spec = SPECS[name]
    compare_query(spark, sf_dir, name, spec.builder, spec.oracle)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.columns) > 0


def test_registry_contract():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 15


DRIVER_SURFACE = [
    # Round-3 rotation: the 10 training-pipeline queries added in round
    # 2 (q70/q71/q73-q80, previously pytest-only) take the slots of ten
    # twice-driver-green siblings (q14/q15/q16/q17/q20/q26/q30/q31/q35/
    # q39 — each family keeps at least one driver representative:
    # scalar fns → q66, sampling → q71, pivot/median aggs → q65/q67,
    # text → q32/q33/q36/q64). Round-5 rotation: the two never-verified
    # queries q22 (lag-window gaps) and q42 (MinHash signatures,
    # re-shaped to scalar rows after its round-1 canonicalizer red)
    # take the slots of the 4×-green q23 and q06 — closing the "every
    # registry query has had a hard verdict" loop. Round-6 rotation:
    # q81 (BMP pixel-path oracle — the r5 verdict's ask #3) takes the
    # slot of the 5×-green q54 (plain join+agg; family keeps q05/q07/
    # q27 as driver representatives). Round-7 rotation (r6 verdict ask
    # #1): the four round-6 pipeline operators — q82 decontamination,
    # q83 PII scrub, q84 deterministic split, q85 shuffle-shards — take
    # the slots of q33/q36 (4-5× driver-green; text family keeps
    # q32/q64/q83) and q60/q62 (byte/frame kernel twins whose codec
    # path q81 now hash-verifies directly; multimodal keeps q61/q81).
    # Also r7: q86 (payload→embed→knn pipeline under one hash verdict —
    # r6 ask #8) takes the slot of the 6×-green q21 (events family keeps
    # q22/q24/q25/q28/q29/q63). Second r7 rotation (same round, new
    # ops): q87 repetition filter, q88 BM25 retrieval, q89 SQ8
    # quantized search, and q90 chunking take the slots of the
    # 6×-green q10 (windows keep q19; top-k-per-key also verified via
    # q50/q80), q13 (set ops keep q68), q27 (joins keep
    # q05/q07/q28/q29/q76), and q65 (aggregations keep q01/q67).
    # Round-8 rotation (r7 verdict ask #1): the six round-7 operators
    # with only pytest evidence — q91 chunk-dup rate, q92 PQ search,
    # q93 funnel, q94 cohort retention, q95 IVF-PQ, q96 rare-token
    # filter — plus the new q97 (recall vs ivecs ground truth, r7 ask
    # #6) and q98 (persisted-index search, r7 ask #2) take the slots of
    # eight 5-7×-green siblings: q41/q43/q45 (dedup keeps
    # q40/q42/q46/q77-q79/q82), q53 (knn keeps q50/q80/q86/q89), q63
    # (streaming twins keep q24/q25), q71 (sampling keeps q84/q85),
    # q73 (clustering keeps q72), q75 (Expand pytest-covered; aggs keep
    # q01/q67).
    # Second r8 rotation (same round, new ops): the six round-8
    # training-pipeline operators — q99 epoch oversampling, q100
    # length quantiles, q101 substring-level exact dedup, q102
    # SemDeDup, q103 concat-and-chunk sequence packing, q104 DSIR
    # importance weights — take the slots of six 7×-green siblings:
    # q24 (windows keep q19/q25), q28 (joins keep q29/q76), q32 (text
    # keeps q64/q83/q87/q88/q96), q40 (dedup keeps q42/q46/q72/
    # q77-q79/q82/q91), q51 (q57 is its trained superset; vector keeps
    # 10 driver reps), q70 (q103 is its production superset; sampling
    # keeps q84/q85).
    # The grading driver records at
    # most 50 verdicts in registration order — changing this list is a
    # deliberate decision, not a side effect of adding a query (new
    # queries default into the pytest-only overflow unless they take a
    # slot explicitly).
    # Third r8 rotation (same round, new ops): the six round-8
    # operators registered after the second rotation — q105 index-cell
    # occupancy monitoring, q106 sampled-quantile-vs-exact, q107 BPE
    # training, q108 BPE application, q109 ExactSubstr scrub, q110
    # CCNet-style LM quality filter — take the slots of six multi-green
    # siblings: q22 (green r5-r7; events keep q29/q66/q76/q93/q94),
    # q25 (windows keep q19), q58 (LSH covered by q46's hyperplane
    # tier), q61 (multimodal keeps q81/q86), q68 (set-op reps green
    # r1-r7), q74 (sketch coverage keeps q106's measured-error row).
    # Fourth r8 rotation (same round, new ops): the six operators
    # registered after the third rotation — q111 cross-corpus LM
    # filter, q112 WAV audio codec, q113 integer PageRank, q114 SCD2
    # history, q115 contrastive pair mining, q116 binary (1-bit)
    # Hamming-quantized search — take the slots of six 6-7x-green
    # siblings: q07 (semi-join; q82 keeps a broadcast-semi driver
    # shape), q12 (global sort/limit; distributed top-k verified via
    # q88/q104), q19 (windows keep q100/q114), q29 (joins keep
    # q05/q76), q64 (text keeps 8 driver reps), q66 (JSON/Variant
    # pytest-covered via q20/q66). Also same-round: q117 NB quality
    # classifier takes the 7x-green q46's slot (embedding near-dup
    # stays driver-verified via q102 SemDeDup) and q118 bloom-pruned
    # incremental dedup takes the 5x-green q80's slot (the external
    # query contract stays driver-verified via q86/q89/q92/q95/q116).
    # Round-9 rotation (r8 backlog): the 18 round-8 operators that
    # registered after the round's surface froze — q119 prefix-dim
    # search, q120 hybrid RRF, q121 image dHash near-dups, q122/q123
    # persisted dedup index + stats, q124 graph ANN serving, q125
    # persisted exact dedup, q126 domain caps, q127 PCA projection,
    # q128 stratified sample, q129 PCA-prefix search, q130 linear
    # attribution, q131 SQ8 drift monitor, q132 snapshot diff, q133
    # PCA+SQ8 composition, q134 PCA energy, q135 user paths, q136
    # TF-IDF top terms — take the slots of 18 multi-green (2-8x)
    # siblings: q05/q67 (relational keeps q01), q76 (events keep
    # q93/q94/q114/q130/q135), q81/q86 (multimodal keeps q112/q121),
    # q42/q77/q78/q79/q82 (dedup keeps q72/q101/q102/q115/q118 +
    # q121-q125), q83/q87/q88 (text keeps q96/q107/q108/q110/q111 +
    # q120/q136), q84/q85/q90 (pipeline keeps q91/q99/q100/q103/q104 +
    # q126/q128/q132), q57/q89 (vector keeps q50/q56 + ten driver
    # reps). Family sentinels q01/q50/q56/q72 stay put.
    # Round-10 rotation (r9 verdict ask #4): the 18 round-9 operators
    # that registered after the surface froze — q137 heavy hitters,
    # q138 triangle counts, q139 fuzzy record linkage, q140 k-core,
    # q141 LPA communities, q142 incremental maintenance, q143 BMP
    # thumbnails, q144 data-quality gate, q145 personalized PageRank,
    # q146 prefix-filtered Jaccard, q147/q148 ORC/CSV fidelity,
    # q149 gap-fill, q150 rate spikes, q151 RANGE frames, q152 skew
    # profile, q153 golden record, q154 MERGE fidelity — plus q155
    # (MRDF pinned unrolled replay: the flagship's first HASH verdict,
    # r9 verdict ask #6) take the slots of 19 twice-green (r8, r9)
    # siblings: q93/q94 (events keep q130/q135 + q149/q150/q152),
    # q91/q103/q104/q99/q100/q106 (pipeline keeps q126/q128/q132 +
    # the new six), q108 (BPE keeps q107), q109 (substring keeps
    # q101), q110/q111/q96 (text keeps q117/q120/q136 + q144),
    # q115/q118 (dedup keeps q101/q102/q122/q123/q125 + q146),
    # q92/q95 (quantized search keeps q98/q116... q116 also demoted —
    # quant family keeps q98/q129/q131/q133), q105 (monitoring keeps
    # q123/q131). Family sentinels q01/q50/q56/q72 stay put.
    # Round-11 rotation (r10 verdict ask #2): q156 weighted sampling
    # (A-Res) and q157 token-budget selection — registered r10 after
    # the surface froze — take the slots of the 2x-green (r9, r10)
    # q128 stratified sample (sampling stays driver-verified via q156)
    # and q132 snapshot diff (pipeline keeps q126 + the new pair).
    # Family sentinels q01/q50/q56/q72 stay put.
    # Round-12 rotation (r11 verdict asks #2/#3): q108 BPE application —
    # whose builder the r11 top-V cap rewrote while it sat pytest-only
    # — re-earns a driver verdict, taking the slot of the 2x-green
    # (r10, r11) q148 CSV fidelity (format fidelity keeps q147 ORC);
    # and q158 incremental kNN-graph append (new r12: the
    # build->serve->APPEND lifecycle) takes the slot of the 3x-green
    # (r9-r11) q126 domain caps (pipeline keeps q156/q157).
    # Also r12: q159 OPQ-balanced PQ (new — rotation + codebook
    # training both replayed bit-identically in the oracle) takes the
    # slot of the 3x-green (r9-r11) q129 PCA-prefix search (PCA
    # candidate search stays driver-verified via q133's composition;
    # projection via q127/q134).
    # Family sentinels q01/q50/q56/q72 stay put.
    # Round-13 rotation (r12 verdict ask #8): the three r13 operators —
    # q160 hot-block SPLIT linkage (oracle = the UNCAPPED chain, so the
    # hash verdict IS the split-loses-nothing law on real data), q161
    # persisted rotated-PQ serving (rotation stored in the index
    # format; oracle replays rotation/codebooks/codes/ADC + the
    # original-space rerank), q162 chained graph append (two
    # materialize=True folds == one rebuild — pin_stats under a driver
    # verdict) — take the slots of the 3x-green q139 (q160 is its
    # superset; linkage keeps q153), the 4x-green q119 (prefix-dim
    # candidates stay verified via q133), and the 4x-green q143
    # (multimodal keeps q112/q121).
    # Family sentinels q01/q50/q56/q72 stay put.
    # Round 14 is an OPTIMIZATION round: the declared surface is FROZEN
    # to the exact r13 set (CORRECTNESS_r13.json keys) — a query that
    # disappears or changes its hash is a regression regardless of
    # speed. The planned r14 rotation (q163/q164/q165 in for
    # q127/q136/q114) was built mid-round and is deferred: the three
    # new operators run oracle-verified in the pytest gate
    # (driver=False) and are rotation candidates for the next BUILD
    # round. The r14 auto-linkage dial needs no new slot: it is the
    # DEFAULT path of q139/q153 (law: auto == uncapped on the oracle
    # corpora, tests/test_linkage.py) and q160 pins the split action.
    # Family sentinels q01/q50/q56/q72 stay put.
    "q114_scd2_history",
    "q130_linear_attribution",
    "q135_top_user_paths",
    "q149_hourly_gap_fill",
    "q150_hourly_rate_spikes",
    "q151_trailing_range_window",
    "q152_user_key_skew_profile",
    "q112_wav_audio_stats",
    "q121_image_dhash_near_dups",
    "q01_pricing_summary",
    "q153_golden_record",
    "q160_linkage_hot_split",
    "q107_bpe_train",
    "q108_bpe_tokenize",
    "q117_nb_quality_classifier",
    "q120_hybrid_rrf_retrieval",
    "q136_tfidf_top_terms",
    "q137_heavy_hitters",
    "q72_dup_clusters",
    "q101_substring_dedup",
    "q102_semantic_dedup",
    "q122_persisted_dedup_index",
    "q123_dedup_index_stats",
    "q125_persisted_exact_dedup",
    "q146_jaccard_prefix_filtered",
    "q113_pagerank_quality",
    "q138_triangle_counts",
    "q140_kcore_parts",
    "q141_part_communities",
    "q142_incremental_agg",
    "q144_data_quality_report",
    "q145_personalized_pagerank",
    "q147_orc_roundtrip_stats",
    "q154_upsert_merge_stats",
    "q156_weighted_sample",
    "q157_token_budget_selection",
    "q50_knn_exact",
    "q56_mrdf_recall",
    "q97_recall_vs_ivecs_gt",
    "q98_ivfpq_persisted_index",
    "q124_graph_ann_search",
    "q127_pca_project",
    "q131_sq8_drift_monitor",
    "q133_pca_sq8_knn",
    "q134_pca_energy",
    "q155_mrdf_pinned_replay",
    "q158_knn_graph_append",
    "q159_opq_pq_knn",
    "q161_rotated_pq_serving",
    "q162_chained_graph_append",
]


def test_driver_surface_is_pinned():
    from pyspark_mrdf_spark.queries import driver_registry

    assert list(driver_registry()) == DRIVER_SURFACE
