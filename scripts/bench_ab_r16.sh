#!/bin/bash
# Round-16 closing bench A/B (the r14/r15 protocol): HEAD twice + the
# r15 close back-to-back on the same machine, full suite at sf0.1.
# Writes BENCH_AB_r16.json.
set -e
cd "$(dirname "$0")/.."
OUT=BENCH_AB_r16.json
R15=8664eac

run() { # dir tag
  ( cd "$1" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py \
      2>/dev/null | tail -1 ) > "/tmp/bench_ab_$2.json"
}

run . head_a
run . head_b
git worktree add /tmp/r15bench "$R15" >/dev/null 2>&1 || true
run /tmp/r15bench r15
git worktree remove --force /tmp/r15bench

python - <<'PYEOF'
import json
out = {}
for tag in ("head_a", "head_b", "r15"):
    with open(f"/tmp/bench_ab_{tag}.json") as f:
        out[tag] = json.load(f)
qa, qb, qr = (out[t]["queries"] for t in ("head_a", "head_b", "r15"))
common = sorted(set(qa) & set(qr))
best = {q: min(qa[q], qb[q]) for q in common}
ratios = sorted(best[q] / qr[q] for q in common if qr[q] > 0)
same = sorted(qa[q] / qb[q] for q in common if qb[q] > 0)
out["summary"] = {
    "common_gates": len(common),
    "new_gates": sorted(set(qa) - set(qr)),
    "head_best_vs_r15_median": round(ratios[len(ratios) // 2], 3),
    "head_best_vs_r15_max": round(max(ratios), 3),
    "same_code_ratio_span": [round(min(same), 3), round(max(same), 3)],
    "head_total_best": round(min(out["head_a"]["value"],
                                 out["head_b"]["value"]), 1),
    "r15_total": round(out["r15"]["value"], 1),
}
with open("BENCH_AB_r16.json", "w") as f:
    json.dump(out, f, indent=1)
# BENCH_FULL_r16: the better HEAD pass verbatim (the r15 convention),
# plus the per-gate best-of-2 sum for reference
better = "head_a" if out["head_a"]["value"] <= out["head_b"]["value"] else "head_b"
full = dict(out[better])
full["per_gate_best_sum"] = round(
    sum(min(qa[q], qb.get(q, qa[q])) for q in qa), 4
)
with open("BENCH_FULL_r16.json", "w") as f:
    json.dump(full, f, indent=1)
print(json.dumps(out["summary"]))
PYEOF
