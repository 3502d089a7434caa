#!/usr/bin/env python3
"""Analyze tools/scaling_sampler.sh output: group legs into interleaved
pairs, compute per-pair scaling efficiency, and flag ACCEPTED pairs —
clean-window pairs per the protocol in BENCH/BASELINE.md:

  accept iff  steal_cores ~ 0 in every run of both legs (< 0.5 cores)
          and BOTH legs are in their stable band (busy sanity): each run's
              busy-core-seconds <= BAND x the minimum observed for that
              thread count anywhere in the log — guest-invisible host
              contention inflates cycles for the same work, so an
              inflated-work leg means the window was slow even when steal
              and iowait read zero
          and NO co-runner: system-wide busy_cores during every run stays
              within the leg's own cpu budget plus a small GC/OS allowance
              (cpus + max(0.5, 0.15*cpus)) — busy_cores is whole-host, so
              anything above the leg's budget is another process stealing
              the window (the floor band can't catch this when a thread
              count appears only once in the log: its floor is then its
              own contaminated work and the band reads 1.00)
          and eff = (t_small / t_big) / 4 >= 0.8

usage: scaling_accept.py [logFile]
"""
import json
import sys

BAND = 1.30  # a leg is "stable" if its work is within 30% of the clean floor


def main(path: str) -> int:
    legs = []  # ((epoch, pair), cpus, [runs])
    cur = None
    epoch = 0
    prev_pair = 0
    for line in open(path):
        try:
            j = json.loads(line)
        except json.JSONDecodeError:
            continue
        if j.get("sampler") == "leg":
            if j["pair"] < prev_pair:  # sampler restart reuses pair numbers
                epoch += 1
            prev_pair = j["pair"]
            cur = ((epoch, j["pair"]), j["cpus"], [])
            legs.append(cur)
        elif j.get("bench") == "pipeline" and cur is not None:
            cur[2].append(j)
    # clean-floor busy-core-seconds per thread count, over the WHOLE log:
    # the minimum is by construction from the cleanest window sampled
    floor = {}
    for _, cpus, runs in legs:
        for r in runs:
            w = r["busy_cores"] * r["sec"]
            if w > 0:
                floor[cpus] = min(floor.get(cpus, float("inf")), w)
    pairs = {}
    for pair, cpus, runs in legs:
        if runs:
            pairs.setdefault(pair, {})[cpus] = runs
    accepted = []
    for pair in sorted(pairs):
        p = pairs[pair]
        sizes = sorted(p.keys())
        if len(sizes) != 2 or sizes[1] != 4 * sizes[0]:
            continue
        small, big = sizes
        mb = sorted(r["sec"] for r in p[big])[(len(p[big]) - 1) // 2]
        ms = sorted(r["sec"] for r in p[small])[(len(p[small]) - 1) // 2]
        bb = sorted(r["sec"] for r in p[big])[0]
        bs = sorted(r["sec"] for r in p[small])[0]
        steal = max(r["steal_cores"] for r in p[big] + p[small])
        iow = max(r["iowait_cores"] for r in p[big] + p[small])
        # stable band: worst run work relative to that thread count's floor
        band = max((r["busy_cores"] * r["sec"]) / floor[c]
                   for c in (small, big) for r in p[c])
        eff_med = (ms / mb) / 4
        eff_best = (bs / bb) / 4
        # work-conservation efficiency: total busy core-seconds consumed for
        # the same job, small leg / big leg (1.0 = the 4N level does no extra
        # work; < 1 = per-core inflation on the wide leg)
        wm_b = min(r["busy_cores"] * r["sec"] for r in p[big])
        wm_s = min(r["busy_cores"] * r["sec"] for r in p[small])
        cpu_eff = wm_s / wm_b if wm_b > 0 else float("nan")
        # co-runner check: whole-host busy must fit the leg's cpu budget
        corun = max(r["busy_cores"] - (c + max(0.5, 0.15 * c))
                    for c in (small, big) for r in p[c])
        clean = steal < 0.5 and band <= BAND and corun <= 0
        ok = clean and eff_med >= 0.8
        print(f"pair {pair[0]}.{pair[1]:<3d} [{small}->{big}]: t{big}_med={mb:7.1f}s "
              f"t{small}_med={ms:7.1f}s eff_med={eff_med:.2f} eff_best={eff_best:.2f} "
              f"cpu_eff={cpu_eff:.2f} steal_max={steal:.1f} iow_max={iow:.1f} "
              f"band={band:.2f} corun={max(corun, 0.0):.1f} "
              f"{'ACCEPT' if ok else ('clean' if clean else 'contended')}")
        if ok:
            accepted.append((pair, small, big, mb, ms, eff_med))
    if accepted:
        best = max(accepted, key=lambda a: a[5])
        print(f"\nACCEPTED {len(accepted)} pair(s); best: pair {best[0][0]}.{best[0][1]} "
              f"[{best[1]}->{best[2]}] t_big={best[3]:.1f}s t_small={best[4]:.1f}s "
              f"eff={best[5]:.2f}")
        return 0
    print("\nno accepted pair yet")
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else
                  "/root/repo/BENCH/scaling_samples.jsonl"))
