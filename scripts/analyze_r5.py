#!/usr/bin/env python3
"""Consolidate the round-5 program (quality_results.jsonl) into ranked
tables with SEM error bars, one per queue, plus paired verdicts where
per-clip data exists.

Usage: python scripts/analyze_r5.py [--jsonl scripts/quality_results.jsonl]
"""

import argparse
import json
import math
import pathlib

GROUPS = {
    "queue1 (complex decision arms + hybrid, long-gap)":
        ("r5q1_", "snr_mean"),
    "queue2 (n=64 headliner restatements, notes)":
        ("r5q2_", "hole_psnr_mean"),
    "queue3 (seed-ensemble, notes)": ("r5q3_", "hole_psnr_mean"),
    "queue4 (self-cond refiner, notes)": ("r5q4_", "hole_psnr_mean"),
    "queue5 (paired reruns + longer/wider R, notes)":
        ("r5q5_", "hole_psnr_mean"),
    "queue6 (combined winners: ensemble-conditioned R, notes)":
        ("r5q6_", "hole_psnr_mean"),
    "queue8 (post-reboot retrained replicas, notes)":
        ("r5q8_", "hole_psnr_mean"),
}

# (A, B) tag pairs to report as PAIRED per-clip deltas when both
# records carry hole_psnr_clips (same seed → same mask stream).
PAIRED = [
    ("r5q5_mix07_clips", "r5q5_control_clips"),
    ("r5q3_ens2_n64", "r5q5_control_clips"),
    ("r5q3_ens3_n64", "r5q5_control_clips"),
    ("r5q3_ens2_n64", "r5q3_s11_n64"),
    ("r5q3_ens3_n64", "r5q3_ens2_n64"),
    ("r5q3_ens3_n64", "r5q3_s11_n64"),
    ("r5q3_ens3_n64", "r5q3_s23_n64"),
    ("r5q4_sc_t035_s8_avg8_n64", "r5q5_control_clips"),
    ("r5q4_sc_mix07_avg8_n64", "r5q5_mix07_clips"),
    ("r5q5_ho80_avg8_n64", "r5q5_control_clips"),
    ("r5q5_w96_avg8_n64", "r5q5_control_clips"),
    ("r5q6_ens3_ho_avg8_n64", "r5q3_ens3_n64"),
    ("r5q6_ens3_mix07_avg8_n64", "r5q3_ens3_n64"),
    ("r5q6_ens3_mix07_avg8_n64", "r5q5_mix07_clips"),
    ("r5q6_ens3_sc_mix07_avg8_n64", "r5q6_ens3_mix07_avg8_n64"),
    ("r5q6_ens3_w96_mix07_avg8_n64", "r5q6_ens3_mix07_avg8_n64"),
    # queue 8: post-reboot same-seed retrained replicas. newest() picks
    # the rerun rows for the reused r5q5_*/r5q6_* tags automatically,
    # so every pair below is within the retrained model family.
    ("r5q8_ens3_n64", "r5q5_control_clips"),
    ("r5q8_ens2_mix07_avg8_n64", "r5q5_mix07_clips"),
    ("r5q8_ens2_mix07_avg8_n64", "r5q5_control_clips"),
    ("r5q6_ens3_mix07_avg8_n64", "r5q8_ens3_n64"),
    ("r5q6_ens3_ho_avg8_n64", "r5q8_ens3_n64"),
    ("r5q8_ens3_n64", "r5q3_ens3_n64"),
    # Composition vs pure ensemble at K=2 (cross-training-family, same
    # mask stream): does refiner-mix still add on top of the ensemble?
    ("r5q8_ens2_mix07_avg8_n64", "r5q3_ens2_n64"),
]


def newest(rows, tag):
    sel = [d for d in rows if d.get("tag") == tag]
    return max(sel, key=lambda d: d.get("t", 0)) if sel else None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--jsonl", default=str(pathlib.Path(__file__).parent
                                           / "quality_results.jsonl"))
    args = ap.parse_args()

    rows = []
    for line in open(args.jsonl):
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if d.get("exp") == "test_eval" and str(d.get("tag", "")
                                               ).startswith("r5q"):
            rows.append(d)

    for title, (prefix, metric) in GROUPS.items():
        sel = {}
        for d in rows:                       # newest per tag
            if d["tag"].startswith(prefix):
                if (d["tag"] not in sel
                        or d.get("t", 0) > sel[d["tag"]].get("t", 0)):
                    sel[d["tag"]] = d
        sel = sorted(sel.values(),
                     key=lambda d: -d.get(metric, float("-inf")))
        print(f"\n## {title}  (metric: {metric})")
        if not sel:
            print("(no results yet)")
            continue
        print("| arm | hole-PSNR | SNR | spec-conv | n |")
        print("|---|---|---|---|---|")
        for d in sel:
            hp = d.get("hole_psnr_mean", float("nan"))
            hs = d.get("hole_psnr_sem", float("nan"))
            sn = d.get("snr_mean", float("nan"))
            ss = d.get("snr_sem", float("nan"))
            print(f"| {d['tag']} | {hp:.2f} ± {hs:.2f} "
                  f"| {sn:.2f} ± {ss:.2f} "
                  f"| {d.get('spec_conv_mean', float('nan')):.3f} "
                  f"| {d.get('n', '?')} |")

    print("\n## Paired per-clip verdicts (clip difficulty cancels)")
    for ta, tb in PAIRED:
        a, b = newest(rows, ta), newest(rows, tb)
        if not a or not b:
            print(f"- {ta} vs {tb}: (missing arm)")
            continue
        ca, cb = a.get("hole_psnr_clips"), b.get("hole_psnr_clips")
        if not ca or not cb or len(ca) != len(cb):
            print(f"- {ta} vs {tb}: (no paired per-clip data)")
            continue
        # Mask-stream guard: pairing is only valid when both arms drew
        # the same eval seed (records carry it since round 5; older
        # rows, all run at the default, are trusted when absent).
        sa, sb = a.get("seed"), b.get("seed")
        if sa is not None and sb is not None and sa != sb:
            print(f"- {ta} vs {tb}: (UNPAIRABLE: seeds {sa} != {sb})")
            continue
        d = [x - y for x, y in zip(ca, cb)]
        n = len(d)
        mean = sum(d) / n
        var = (sum((x - mean) ** 2 for x in d) / (n - 1)) if n > 1 else 0.0
        sem = math.sqrt(var / n) if n > 1 else float("nan")
        # sem == 0 with a nonzero mean is perfect separation, not "no
        # sep" (matches scripts/paired_delta.py's copysign(inf) edge).
        z = (mean / sem) if sem > 0 else (
            0.0 if mean == 0 else math.copysign(float("inf"), mean))
        verdict = ("A>B" if z > 2 else "B>A" if z < -2 else "no sep")
        print(f"- {ta} vs {tb}: Δ = {mean:+.3f} ± {sem:.3f} dB "
              f"(z={z:+.2f}, n={n}) → {verdict}")


if __name__ == "__main__":
    main()
