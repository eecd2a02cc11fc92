#!/usr/bin/env python3
"""Paired per-clip delta between two eval arms (round 5).

Usage: python scripts/paired_delta.py TAG_A TAG_B [--jsonl PATH]

Both arms must have been run with the same --seed/--how_many (the mask
stream is seed-deterministic, so clip i is the SAME inpainting task in
both runs) and with cli/test.py's per-clip logging (hole_psnr_clips,
present for n <= 256). Reports mean(A−B) with the PAIRED SEM — clip
difficulty (±1.2 dB unpaired at n=64) cancels in the difference, which
is what makes 0.1-dB recipe comparisons meaningful (VERDICT r4 weak
#4). Uses each tag's newest record.
"""

import argparse
import json
import math
import pathlib


def load(path: str, tag: str) -> dict:
    rec = None
    for line in open(path):
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if d.get("tag") == tag:
            if rec is None or d.get("t", 0) >= rec.get("t", 0):
                rec = d
    if rec is None:
        raise SystemExit(f"no record with tag {tag!r} in {path}")
    if "hole_psnr_clips" not in rec:
        raise SystemExit(
            f"{tag!r} has no per-clip data (predates round-5 logging "
            "or n > 256); re-run the arm")
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("tag_a")
    ap.add_argument("tag_b")
    ap.add_argument("--jsonl", default=str(pathlib.Path(__file__).parent
                                           / "quality_results.jsonl"))
    args = ap.parse_args()

    a, b = load(args.jsonl, args.tag_a), load(args.jsonl, args.tag_b)
    ca, cb = a["hole_psnr_clips"], b["hole_psnr_clips"]
    if len(ca) != len(cb):
        raise SystemExit(f"clip counts differ: {len(ca)} vs {len(cb)} "
                         "(different --how_many/--batchSize?)")
    if a.get("dataset_mode") != b.get("dataset_mode"):
        raise SystemExit("different dataset_mode — deltas are not paired")
    sa, sb = a.get("seed"), b.get("seed")
    if sa is not None and sb is not None and sa != sb:
        raise SystemExit(f"different eval seeds ({sa} vs {sb}) — the mask "
                         "streams differ, deltas are not paired")
    d = [x - y for x, y in zip(ca, cb)]
    n = len(d)
    mean = sum(d) / n
    var = sum((x - mean) ** 2 for x in d) / (n - 1) if n > 1 else 0.0
    sem = math.sqrt(var / n) if n > 1 else float("nan")
    wins = sum(1 for x in d if x > 0)
    print(f"{args.tag_a} vs {args.tag_b} (n={n} paired clips)")
    print(f"  hole-PSNR: {a['hole_psnr_mean']:.2f} vs "
          f"{b['hole_psnr_mean']:.2f}")
    print(f"  paired delta: {mean:+.3f} ± {sem:.3f} dB "
          f"(A wins {wins}/{n} clips)")
    if sem > 0:
        z = mean / sem
    else:                     # all-zero deltas (identical arms) → z = 0
        z = 0.0 if mean == 0 else math.copysign(float("inf"), mean)
    verdict = ("A > B" if z > 2 else "B > A" if z < -2
               else "no separation (|z| <= 2)")
    print(f"  z = {z:+.2f} -> {verdict}")


if __name__ == "__main__":
    main()
