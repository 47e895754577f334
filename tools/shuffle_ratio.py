#!/usr/bin/env python3
"""Merge two graft.ShuffleLab per-sf JSONs into one artifact with scaling
ratios. For a 10x data step, a ratio near 10 on shuffle_write_bytes means
the operator's network cost is linear in the input; a ratio far above the
row-growth factor is the quadratic-candidate signature the lab exists to
catch (see ShuffleLab.scala scaladoc).

Usage: shuffle_ratio.py <small_sf.json> <big_sf.json> <out.json> [step]
       step = the data growth factor between the two runs (default 10).
"""
import json
import sys


def main() -> None:
    small_path, big_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    step = float(sys.argv[4]) if len(sys.argv) > 4 else 10.0
    small = json.load(open(small_path))
    big = json.load(open(big_path))
    merged = {}
    for name, s in small["queries"].items():
        b = big["queries"].get(name)
        if b is None:
            continue

        def ratio(key):
            return round(b[key] / s[key], 2) if s.get(key) else None

        merged[name] = {
            "small": s,
            "big": b,
            "ratio_shuffle_write": ratio("shuffle_write_bytes"),
            "ratio_shuffle_read": ratio("shuffle_read_bytes"),
            "ratio_input": ratio("input_bytes"),
            "ratio_wall": ratio("wall_sec"),
        }
    worst = max(
        (q["ratio_shuffle_write"] or 0.0) for q in merged.values()
    )
    out = {
        "experiment": "shuffle_bytes_scaling",
        "small_sf": small["sf"],
        "big_sf": big["sf"],
        "data_step": step,
        "worst_shuffle_write_ratio": worst,
        "queries": merged,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
        f.write("\n")
    for name, q in sorted(merged.items(), key=lambda kv: -(kv[1]["ratio_shuffle_write"] or 0)):
        print(
            f"{name:28s} write x{q['ratio_shuffle_write']}  "
            f"read x{q['ratio_shuffle_read']}  input x{q['ratio_input']}  "
            f"wall x{q['ratio_wall']}"
        )
    print(f"worst shuffle-write ratio: x{worst} (data step x{step})")


if __name__ == "__main__":
    main()
