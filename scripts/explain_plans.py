"""Capture physical plans of the headline queries -> PLANS.md, with the
scale-relevant properties called out (scan pruning, pushed filters, broadcast
vs sort-merge joins, whole-stage-codegen spans, Arrow eval placement)."""

from __future__ import annotations

import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from dggstools_spark.session import get_spark
    from dggstools_spark.queries import QUERIES

    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.01"

    picks = ["cell_counts", "cell_counts_expr", "cells_by_revenue",
             "pip_polygons", "knn_cells", "prefix_rollup", "embed_knn",
             "ann_topk", "embed_pairs", "resample_cubic", "resample_area",
             "all_touched", "rescale_modes", "subarea", "span_cells",
             "media_features", "auid_groups", "cells_json", "ivf_topk",
             "simhash", "winnow_pairs", "ngram_pairs",
             "hash_sample", "stratified_sample", "weighted_mixture",
             "bm25_topk",
             "decontaminate", "gopher_quality", "ngram_sampled",
             "pack_stats", "pii_scrub",
             "passage_dedup", "cross_dedup", "corpus_stats",
             "html_extract", "vocab_topk", "epoch_shuffle",
             "lm_score", "dsir_select", "pq_topk",
             "oov_rate", "hybrid_rerank", "embed_clusters",
             "mixture_plan", "text_normalize", "dup_profile",
             "novelty_score", "lang_confusion", "cluster_keep",
             "len_histogram", "corpus_diff", "fertility",
             "focal_mean", "morans_i", "hotspots", "local_moran",
             "tile_pyramid", "bbox_cells", "zonal_stats",
             "dedup_pipeline",
             "focal_xface", "morans_xface", "hotspots_xface",
             "lisa_xface", "url_dedup", "semantic_dedup", "cell_trends",
             "lm_score_sink", "stream_sessions_append",
             "cell_trends_dense", "od_flows", "cell_nbrs", "semantic_pq",
             "overlay_area", "user_trips", "mean_center",
             "cell_rank", "near_pairs", "hll_count", "path_cells",
             "change_matrix", "hll_overlap", "idw_interp", "buffer_cells",
             "cell_visitors", "cost_distance", "bloom_prefilter",
             "cm_topk", "morph_close", "region_group", "stream_hll",
             "asof_status", "range_events",
             "kring_xface", "cell_diversity", "join_counts",
             "ann_ivfpq", "route_heat",
             "watershed", "slope_aspect", "ripley_k", "mk_trend",
             "g_function", "flow_accum", "emerging_hotspots",
             "flow_communities", "access_2sfca", "cross_k",
             "kcenter_sample", "trip_balance", "region_shape",
             "bpe_merges", "bpe_tokenize", "areal_interp", "viewshed",
             "theilsen_trend", "stream_topk"]
    # queries whose joins must stay broadcast (dimension-sized side): a
    # SortMergeJoin here is plan creep and fails the script.  embed_pairs'
    # bucket self-join and rescale_modes' agg-agg joins legitimately shuffle
    # at scale, so they are audited but not gated.
    expect_no_smj = {"cells_by_revenue", "pip_polygons", "knn_cells",
                     "embed_knn", "ann_topk", "all_touched"}
    violations = []
    out = ["# PLANS — physical-plan review of headline queries\n",
           "Checked properties: column-pruned scans (`ReadSchema`), pushed filters,",
           "broadcast joins for dimension sides, whole-stage codegen coverage,",
           "ArrowEvalPython placement (narrow inputs only).  Regenerate with",
           "`python scripts/explain_plans.py`.\n"]
    for name in picks:
        df = QUERIES[name](spark, sf)
        buf = io.StringIO()
        import contextlib

        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # keep the operator tree; drop the verbose per-node detail sections
        tree = plan.split("\n\n")[0]
        # summary signals
        n_bhj = tree.count("BroadcastHashJoin")
        n_smj = tree.count("SortMergeJoin")
        if name in expect_no_smj and n_smj > 0:
            violations.append(name)
        n_arrow = tree.count("ArrowEvalPython")
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        schemas = re.findall(r"ReadSchema: ([^\n]*)", plan)
        out.append(f"\n## {name}\n")
        out.append(f"- broadcast joins: {n_bhj}; sort-merge joins: {n_smj}; "
                   f"Arrow eval nodes: {n_arrow} (AQE hides codegen spans pre-execution)")
        for s in schemas[:3]:
            out.append(f"- ReadSchema: `{s.strip()}`")
        for p in pushed[:3]:
            if p.strip():
                out.append(f"- PushedFilters: `{p.strip()}`")
        out.append("\n```\n" + tree.strip() + "\n```")
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out) + "\n")
    print("wrote PLANS.md")
    if violations:
        print("SORT-MERGE-JOIN CREEP in broadcast-expected queries:", violations)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
