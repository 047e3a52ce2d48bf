#!/usr/bin/env python3
"""Compare two bench archives (BENCH_LOCAL_r{N}.json shape): common-subset
total and per-query ratios, calibration-adjusted. Usage:
  python3 tools/bench_compare.py bench/BENCH_LOCAL_r18.json bench/BENCH_LOCAL_r19.json
"""
import json
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def main(old_path, new_path):
    old, new = load(old_path), load(new_path)
    oq = {k: v for k, v in old["queries"].items() if v > 0}
    nq = {k: v for k, v in new["queries"].items() if v > 0}
    common = sorted(set(oq) & set(nq))
    ot = sum(oq[k] for k in common)
    nt = sum(nq[k] for k in common)
    ocal = old.get("calibration_sec") or old.get("calibration") or 0
    ncal = new.get("calibration_sec") or new.get("calibration") or 0
    print(f"common subset: {len(common)} queries")
    print(f"old total {ot:8.1f} s   new total {nt:8.1f} s   raw ratio {nt/ot:5.2f}")
    if ocal and ncal:
        print(f"calibration old {ocal:.3f} new {ncal:.3f}  shift {ncal/ocal:5.2f}"
              f"  adjusted ratio {(nt/ot)/(ncal/ocal):5.2f}")
    only_new = sorted(set(nq) - set(oq))
    if only_new:
        print("new queries:", ", ".join(f"{k}={nq[k]:.2f}s" for k in only_new))
    worst = sorted(common, key=lambda k: nq[k] / oq[k], reverse=True)[:8]
    print("worst per-query ratios (new/old):")
    for k in worst:
        print(f"  {k:28s} {oq[k]:7.2f} -> {nq[k]:7.2f}  x{nq[k]/oq[k]:.2f}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
