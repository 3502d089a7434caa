#!/usr/bin/env python3
"""Analyze tools/scaling_sampler.sh output: group legs into interleaved
pairs, compute per-pair scaling efficiency, and flag ACCEPTED pairs —
clean-window pairs per the protocol in BENCH/BASELINE.md:

  accept iff  steal_cores ~ 0 in every run of both legs (< 0.5 cores)
          and the 8-thread leg is in its stable band (busy sanity)
          and eff = (t8 / t32) / 4 >= 0.8

usage: scaling_accept.py [logFile]
"""
import json
import sys


def main(path: str) -> int:
    legs = []  # (pair, cpus, [runs])
    cur = None
    for line in open(path):
        try:
            j = json.loads(line)
        except json.JSONDecodeError:
            continue
        if j.get("sampler") == "leg":
            cur = (j["pair"], j["cpus"], [])
            legs.append(cur)
        elif j.get("bench") == "pipeline" and cur is not None:
            cur[2].append(j)
    pairs = {}
    for pair, cpus, runs in legs:
        if runs:
            pairs.setdefault(pair, {})[cpus] = runs
    accepted = []
    for pair in sorted(pairs):
        p = pairs[pair]
        if 32 not in p or 8 not in p:
            continue
        t32 = sorted(r["sec"] for r in p[32])[0]  # best-of-2 (min noise bias)
        t8 = sorted(r["sec"] for r in p[8])[0]
        m32 = sorted(r["sec"] for r in p[32])[(len(p[32]) - 1) // 2]
        m8 = sorted(r["sec"] for r in p[8])[(len(p[8]) - 1) // 2]
        steal = max(r["steal_cores"] for r in p[32] + p[8])
        iow = max(r["iowait_cores"] for r in p[32] + p[8])
        eff_med = (m8 / m32) / 4
        eff_best = (t8 / t32) / 4
        clean = steal < 0.5
        ok = clean and eff_med >= 0.8
        print(f"pair {pair:3d}: t32_med={m32:7.1f}s t8_med={m8:7.1f}s "
              f"eff_med={eff_med:.2f} eff_best={eff_best:.2f} "
              f"steal_max={steal:.1f} iow_max={iow:.1f} "
              f"{'ACCEPT' if ok else ('clean' if clean else 'contended')}")
        if ok:
            accepted.append((pair, m32, m8, eff_med))
    if accepted:
        best = max(accepted, key=lambda a: a[3])
        print(f"\nACCEPTED {len(accepted)} pair(s); best: pair {best[0]} "
              f"t32={best[1]:.1f}s t8={best[2]:.1f}s eff={best[3]:.2f}")
        return 0
    print("\nno accepted pair yet")
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else
                  "/root/repo/BENCH/scaling_samples.jsonl"))
