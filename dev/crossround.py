#!/usr/bin/env python3
"""Cross-round bench comparison normalized by the box-calibration probes.

Usage: python3 dev/crossround.py bench/r13_final.json bench/r14_final.json \
           bench/r13_calibration.json bench/r14_calibration.json

Prints the total and the biggest per-query movers, each divided by the
ratio of its dominant shape (scan/shuffle/graph) between the two
calibration probes — what survives normalization is the code term
(BENCHNOTES "Box calibration" protocol). Shape assignment is a named
override list for the known heavy queries plus a default of 'shuffle'
(the battery is join/groupBy-dominated).
"""
import json, sys

GRAPH = {"q296_adamic_adar", "q321_adamic_adar_capped", "q353_adamic_adar_staged",
         "q354_local_clustering_staged", "q160_triangle_count", "q272_local_clustering",
         "q166_kcore_peel", "q251_multi_source_bfs", "q207_random_walks",
         "q153_pagerank", "q269_percolation_curve", "q54_dedup_components",
         "q410_threshold_curve_exact", "q97_dedup_prefix_filter", "q411_lsh_recall_curve"}
SCAN = {"q01_agg", "q60_string_funcs", "q17_text_quality", "q174_winnowing",
        "q176_fd_discovery", "q92_content_checksum"}

def shape(q):
    if q in GRAPH: return "graph"
    if q in SCAN: return "scan"
    return "shuffle"

prev, now, calp, caln = (json.load(open(p)) for p in sys.argv[1:5])
ratio = {k: caln["shapes"][k] / calp["shapes"][k] for k in calp["shapes"]}
print("calibration ratios (now/prev):",
      {k: round(v, 3) for k, v in ratio.items()})

pq, nq = prev["queries"], now["queries"]
common = sorted(set(pq) & set(nq))
tot_p = sum(abs(pq[q]) for q in common)
tot_n = sum(abs(nq[q]) for q in common)
print(f"raw total  prev={tot_p:.1f}s now={tot_n:.1f}s  x{tot_n/tot_p:.3f}")

rows = []
geo = 0.0
for q in common:
    r = ratio[shape(q)]
    norm = abs(nq[q]) / r
    sp = abs(pq[q]) / norm if norm > 0 else float("inf")
    rows.append((q, abs(pq[q]), abs(nq[q]), norm, sp))
    import math
    geo += math.log(max(sp, 1e-9))
import math
print(f"calibrated geomean speedup (prev/now_norm): x{math.exp(geo/len(rows)):.3f}")
print(f"{'query':34s} {'prev':>8s} {'now':>8s} {'now_cal':>8s} {'speedup':>8s}")
for q, p, n, nn, sp in sorted(rows, key=lambda r: -abs(r[1] - r[3]))[:20]:
    print(f"{q:34s} {p:8.2f} {n:8.2f} {nn:8.2f} {sp:8.2f}")
