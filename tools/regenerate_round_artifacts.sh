#!/usr/bin/env bash
# Regenerate every per-round committed gate artifact in one pass
# (r13): the gates only stay trustworthy if regenerating them is one
# command, not a remembered checklist. Run from the repo root on an
# otherwise-idle box (the bench steps are timing-sensitive); expect
# ~2h total at the default scales. Any step failing stops the script
# (set -e) — a red gate should block the round, not scroll past.
#
# Artifacts produced (all committed at the repo root):
#   ADVERSARIAL_PARITY.json  full registry vs DuckDB on the
#                            degenerate-row fixture
#   RELIABLE_PARITY.json     pin-routed queries under
#                            pin.mode=reliable (set pinned by
#                            tests/test_reliable_parity_artifact.py)
#   BENCH_SPREAD.json        sf0.1 bench sidecar (per-query medians,
#                            trial spreads, sentinel verdicts)
#   BENCH_SF1.json           gated x10 run: exponents + regressions
#   PLAN_SCALE_DIFF.json     registry-wide join-strategy diff at x10
#   SHUFFLE_SCALING.json     shuffle-byte growth sf0.01 -> sf0.1
#   PLAN_FINGERPRINTS.json   query-source fingerprints (rotation
#                            fronting of round-touched queries)
#
# Not produced here: CORRECTNESS_r{N}.json / BENCH_r{N}.json (the
# driver writes those), COPYCHECK/LEAKCHECK (driver-side too).

set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/7 adversarial fixture + full-registry sweep"
python tools/make_adversarial_sf.py /tmp/adversarial_sf
python tools/check_parity.py --json ADVERSARIAL_PARITY.json /tmp/adversarial_sf

echo "== 2/7 reliable-pin sweep (pin-routed queries only)"
python tools/check_parity.py --json RELIABLE_PARITY.json \
    --pin-mode reliable --pin-sites /root/testdata/sf0.001

echo "== 3/7 sf0.1 bench (writes BENCH_SPREAD.json sidecar)"
python bench.py

echo "== 4/7 gated x10 bench (builds .scale/x10 if absent)"
python bench.py --sf1

echo "== 5/7 registry-wide x10 join-strategy diff"
python tools/plan_scale_diff.py

echo "== 6/7 shuffle-byte scaling audit"
python tools/shuffle_audit.py

echo "== 7/7 query-source fingerprint snapshot (rotation fronting)"
# round number = latest driver CORRECTNESS round + 1 (the round whose
# driver sampling these changes should front). The inner || true
# matters: with no CORRECTNESS artifacts (fresh checkout) ls exits 2,
# and under pipefail that would abort the whole script at its LAST
# step — after ~2h of bench work — instead of seeding round 1.
ROUND=$( (ls CORRECTNESS_r*.json 2>/dev/null || true) \
    | sed -E 's/.*_r0*([0-9]+)\.json/\1/' | sort -n | tail -1)
python tools/plan_fingerprints.py "$(( ${ROUND:-0} + 1 ))"

echo "all artifacts regenerated — review git diff, then commit"
