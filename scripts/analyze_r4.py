#!/usr/bin/env python3
"""Consolidate the round-4 refiner program (quality_results.jsonl) into
ranked tables: one per queue (magnitude EMA ladder, hole-only+RePaint,
complex-domain long-gap) against the matched no-refiner control.

Usage: python scripts/analyze_r4.py [--jsonl scripts/quality_results.jsonl]
Prints markdown tables ready for BENCHMARKS.md and a verdict line per
program (win >= threshold vs control, else refuted).
"""

import argparse
import json
import pathlib

GROUPS = {
    "queue4 (control: best-stack G, notes)": ("r4q4_", "hole_psnr_mean"),
    "queue1 (mag refiner ladder, notes)": ("r4q1_", "hole_psnr_mean"),
    "queue2 (hole-only + RePaint, notes)": ("r4q2_", "hole_psnr_mean"),
    "queue3 (complex-domain, long-gap)": ("r4q3_", "snr_mean"),
    # Post-snapshot tail (VERDICT r4 weak #3): adjudicated round 5.
    "queue5 (posterior-mean avg-K, notes)": ("r4q5_ema", "hole_psnr_mean"),
    "queue6 (L1 vs L2 estimator fine-tune, notes)":
        ("r4q6_", "hole_psnr_mean"),
    "queue7 (best-stack 60k/80k continuation, notes)":
        ("r4q7_", "hole_psnr_mean"),
    "queue8 (regression+refiner ensemble mix, notes)":
        ("r4q8_", "hole_psnr_mean"),
}

CONTROLS = {
    # queue1/queue2 compare against the frozen G's own no-refiner eval
    # — the 40k best-stack row, NOT the latest r4q4 row (the later
    # retrain row is a trajectory-noise replicate, 39.24 vs 39.62).
    "queue1 (mag refiner ladder, notes)": "r4q4_beststack_40k",
    "queue2 (hole-only + RePaint, notes)": "r4q4_beststack_40k",
    # queue3's control is its own GL x64 arm.
    "queue3 (complex-domain, long-gap)": "r4q3_control",
    # The tail queues all ride the frozen 40k best-stack G control.
    "queue5 (posterior-mean avg-K, notes)": "r4q4_beststack_40k",
    "queue6 (L1 vs L2 estimator fine-tune, notes)": "r4q4_beststack_40k",
    "queue7 (best-stack 60k/80k continuation, notes)":
        "r4q4_beststack_40k",
    "queue8 (regression+refiner ensemble mix, notes)":
        "r4q4_beststack_40k",
}


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
        if d.get("exp") == "test_eval" and str(d.get("tag", "")).startswith("r4q"):
            rows.append(d)

    for title, (prefix, metric) in GROUPS.items():
        sel = [d for d in rows if d["tag"].startswith(prefix)]
        if not sel:
            print(f"\n## {title}\n(no results yet)")
            continue
        ctrl_prefix = CONTROLS.get(title)
        ctrl = None
        if ctrl_prefix:
            exact = [d for d in rows if d["tag"] == ctrl_prefix]
            ctrls = exact or [d for d in rows
                              if d["tag"].startswith(ctrl_prefix)
                              and "refine" not in d["tag"]]
            if ctrls:
                ctrl = max(ctrls, key=lambda d: d["t"])
        sel.sort(key=lambda d: -d.get(metric, float("-inf")))
        print(f"\n## {title}  (metric: {metric})")
        print("| arm | hole-PSNR | PSNR | SNR | spec-conv |")
        print("|---|---|---|---|---|")
        for d in sel:
            print(f"| {d['tag']} | {d.get('hole_psnr_mean', float('nan')):.2f} "
                  f"| {d.get('psnr_mean', float('nan')):.2f} "
                  f"| {d.get('snr_mean', float('nan')):.2f} "
                  f"| {d.get('spec_conv_mean', float('nan')):.3f} |")
        if ctrl is not None:
            best = sel[0]
            delta = best.get(metric, 0.0) - ctrl.get(metric, 0.0)
            verdict = "WIN" if delta > 0.05 else "refuted (control holds)"
            print(f"control: {ctrl['tag']} {metric}={ctrl[metric]:.2f}  "
                  f"best arm: {best['tag']} {best[metric]:.2f}  "
                  f"delta={delta:+.2f}  -> {verdict}")


if __name__ == "__main__":
    main()
