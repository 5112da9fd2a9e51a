#!/bin/bash
# Round-14 closing bench A/B (the r13 protocol that settled the bench-
# median watch item): HEAD twice + the r13 close back-to-back on the
# same machine, full suite at sf0.1. Writes BENCH_AB_r14.json.
set -e
cd "$(dirname "$0")/.."
OUT=BENCH_AB_r14.json
R13=35afa32

run() { # dir tag
  ( cd "$1" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py \
      2>/dev/null | tail -1 ) > "/tmp/bench_ab_$2.json"
}

run . head_a
run . head_b
git worktree add /tmp/r13bench "$R13" >/dev/null 2>&1 || true
run /tmp/r13bench r13
git worktree remove --force /tmp/r13bench

python - <<'EOF'
import json
out = {}
for tag in ("head_a", "head_b", "r13"):
    with open(f"/tmp/bench_ab_{tag}.json") as f:
        out[tag] = json.load(f)
qa, qb, qr = (out[t]["queries"] for t in ("head_a", "head_b", "r13"))
common = sorted(set(qa) & set(qr))
best = {q: min(qa[q], qb[q]) for q in common}
ratios = sorted(best[q] / qr[q] for q in common if qr[q] > 0)
same = sorted(qa[q] / qb[q] for q in common if qb[q] > 0)
out["summary"] = {
    "common_gates": len(common),
    "head_best_vs_r13_median": round(ratios[len(ratios) // 2], 3),
    "head_best_vs_r13_max": round(max(ratios), 3),
    "same_code_ratio_span": [round(min(same), 3), round(max(same), 3)],
    "head_total_best": round(min(out["head_a"]["value"],
                                 out["head_b"]["value"]), 1),
    "r13_total": round(out["r13"]["value"], 1),
}
with open("BENCH_AB_r14.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out["summary"]))
EOF
