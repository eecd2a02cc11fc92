#!/usr/bin/env python
"""Dataset preparation — the reference's download/trim scripts, rebuilt.

Reference capability (SURVEY.md §2.1 "Dataset scripts"): shell/python
helpers that trim YouTube clips, extract/resample audio, and extract
frames (this environment has no network, so the download step is out
of scope; this script handles everything after the media exists).

Modes:
  download  — fetch the clips named by a MUSICES-style YouTube-ID
              manifest via yt-dlp (and trim via ffmpeg when segment
              times are given). THIN WRAPPER, untestable in this
              offline image (network blackholed, yt-dlp/ffmpeg not
              installed) — command construction is pinned by test via
              --dry_run; the subprocess path is best-effort.
  extract   — video files → 16 kHz mono wav + frame-stack .npy per clip
              (uncompressed AVI: zero-dep viai_tpu.data.avi demuxer,
              audio + frames; other containers: cv2 frames, audio only
              if the container is a PCM AVI — the no-ffmpeg boundary,
              SURVEY.md §2.4)
  audio     — walk a tree of audio/video files, write 16 kHz mono wavs
  frames    — extract per-clip frame stacks to <stem>.npy (cv2/PIL)
  manifest  — build a MUSICES.json-style manifest from a prepared tree
  synthetic — write N synthetic wav clips (+ frame stacks) for demos

Usage:
  python scripts/prepare_dataset.py extract --root /raw_videos --out /data
  python scripts/prepare_dataset.py manifest --root /data \
      --out /data/MUSICES.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def cmd_synthetic(args):
    from viai_tpu.data.synthetic import SyntheticAVDataset, SyntheticConfig
    from viai_tpu.utils.visualizer import write_wav

    cfg = SyntheticConfig(with_video=args.video, video_frames=args.n_frames,
                          video_size=args.frame_size)
    ds = SyntheticAVDataset(cfg)
    os.makedirs(args.out, exist_ok=True)
    for i in range(args.n):
        item = ds[i]
        stem = os.path.join(args.out, f"clip{i:05d}")
        write_wav(stem + ".wav", item["wav"], cfg.sample_rate)
        if args.video:
            np.save(stem + ".npy",
                    (item["frames"] * 255).astype(np.uint8))
    print(f"wrote {args.n} clips to {args.out}")


def cmd_audio(args):
    from viai_tpu.data.audio import load_wav
    from viai_tpu.utils.visualizer import write_wav

    os.makedirs(args.out, exist_ok=True)
    n = 0
    for dirpath, _, files in os.walk(args.root):
        for f in sorted(files):
            if not f.lower().endswith((".wav", ".wave")):
                continue
            wav = load_wav(os.path.join(dirpath, f), args.sample_rate)
            write_wav(os.path.join(args.out, f"{n:05d}.wav"), wav,
                      args.sample_rate)
            n += 1
    print(f"resampled {n} files to {args.out}")


def cmd_frames(args):
    from viai_tpu.data.av import _load_frames_video  # noqa: SLF001

    n = 0
    for dirpath, _, files in os.walk(args.root):
        for f in sorted(files):
            if not f.lower().endswith((".mp4", ".avi", ".mkv", ".webm")):
                continue
            path = os.path.join(dirpath, f)
            stem = os.path.splitext(path)[0]
            arr = _load_frames_video(path, args.n_frames, args.frame_size)
            np.save(stem + ".npy", (arr * 255).astype(np.uint8))
            n += 1
    print(f"extracted frames for {n} videos")


VIDEO_EXTS = (".avi", ".mp4", ".mkv", ".webm", ".mov")


def cmd_extract(args):
    """Video tree → dataroot: per clip a 16 kHz wav + (T,H,W,3) .npy.

    Completes SURVEY.md §2.1 "Dataset scripts" (ffmpeg audio extraction
    & resample + frame extraction) for local files. Audio comes from
    the container's PCM stream (uncompressed AVI — the zero-dependency
    path); compressed audio codecs need ffmpeg, which this image lacks
    (documented boundary, SURVEY.md §2.4) — those clips get frames
    only unless --require_audio.
    """
    from viai_tpu.data.av import _load_frames_video
    from viai_tpu.data.avi import read_avi
    from viai_tpu.data.audio import load_wav  # noqa: F401 (resample path)
    from viai_tpu.utils.visualizer import write_wav
    from viai_tpu import native

    os.makedirs(args.out, exist_ok=True)
    n_full, n_frames_only, skipped = 0, 0, []
    for dirpath, _, files in os.walk(args.root):
        for f in sorted(files):
            if not f.lower().endswith(VIDEO_EXTS):
                continue
            path = os.path.join(dirpath, f)
            stem = os.path.join(args.out, os.path.splitext(f)[0])
            frames = audio = None
            sr = args.sample_rate
            try:
                frames, _fps, audio, sr = read_avi(path)
            except (ValueError, struct_error):
                pass
            if frames is None:
                try:
                    frames = (_load_frames_video(
                        path, args.n_frames, args.frame_size) * 255
                    ).astype(np.uint8)
                except Exception as e:  # codec unsupported
                    skipped.append((path, str(e)))
                    continue
            else:
                from viai_tpu.data.av import _resample_frames

                frames = (_resample_frames(
                    frames, args.n_frames, args.frame_size) * 255
                ).astype(np.uint8)
            if audio is None and args.require_audio:
                skipped.append((path, "no PCM audio stream (needs ffmpeg)"))
                continue
            np.save(stem + ".npy", frames)
            if audio is not None:
                if sr != args.sample_rate:
                    if native.AVAILABLE:
                        audio = native.resample_linear(
                            audio.astype(np.float32), sr, args.sample_rate)
                    else:
                        n_out = int(len(audio) * args.sample_rate / sr)
                        audio = np.interp(
                            np.linspace(0.0, 1.0, n_out),
                            np.linspace(0.0, 1.0, len(audio)), audio,
                        ).astype(np.float32)
                write_wav(stem + ".wav", audio, args.sample_rate)
                n_full += 1
            else:
                n_frames_only += 1
    print(f"extracted {n_full} clips (audio+frames), "
          f"{n_frames_only} frames-only, {len(skipped)} skipped")
    for p, why in skipped:
        print(f"  skipped {p}: {why}")
    if skipped and args.require_audio:
        sys.exit(1)


from struct import error as struct_error  # noqa: E402


def download_commands(manifest: dict | list, out: str,
                      fmt: str = "mp4") -> list[list[str]]:
    """YouTube-ID manifest → the yt-dlp (+ ffmpeg trim) command lines.

    Accepts the MUSICES layouts: either a flat list or {"train": [...],
    "test": [...]} where each entry is "VIDEO_ID" or
    {"id": ..., "start": s, "end": s}. Returns argv lists; pure so the
    construction is unit-testable in this offline image
    (SURVEY.md §2.1 last row / round-2 VERDICT missing-tooling item).
    """
    entries = []
    if isinstance(manifest, dict):
        for split in ("train", "val", "test"):
            entries += list(manifest.get(split, []))
    else:
        entries = list(manifest)
    cmds = []
    for e in entries:
        if isinstance(e, str):
            vid, start, end = e, None, None
        else:
            vid = e.get("id") or e.get("ytid") or e.get("video_id")
            if vid is None:
                continue
            start, end = e.get("start"), e.get("end")
        dst = os.path.join(out, f"{vid}.{fmt}")
        cmd = ["yt-dlp", "-f", f"bestvideo[ext={fmt}]+bestaudio/best",
               "--merge-output-format", fmt, "-o", dst,
               f"https://www.youtube.com/watch?v={vid}"]
        cmds.append(cmd)
        if start is not None and end is not None:
            trimmed = os.path.join(out, f"{vid}_trim.{fmt}")
            cmds.append(["ffmpeg", "-y", "-i", dst, "-ss", str(start),
                         "-to", str(end), "-c", "copy", trimmed])
    return cmds


def cmd_download(args):
    """Run (or print) the download plan for a YouTube-ID manifest.

    Untestable end-to-end here: the image has no network and no
    yt-dlp/ffmpeg binaries. The plan construction is the testable part
    (--dry_run); execution is a plain subprocess loop that reports
    which tools are missing instead of stack-tracing.
    """
    import shutil
    import subprocess

    with open(args.manifest) as f:
        manifest = json.load(f)
    os.makedirs(args.out, exist_ok=True)
    cmds = download_commands(manifest, args.out, fmt=args.format)
    if args.dry_run:
        for c in cmds:
            print(" ".join(c))
        print(f"# {len(cmds)} commands (dry run)")
        return
    missing = {c[0] for c in cmds if shutil.which(c[0]) is None}
    if missing:
        sys.exit(f"missing tools: {', '.join(sorted(missing))} — install "
                 f"yt-dlp/ffmpeg or use --dry_run to export the plan")
    failures = 0
    for c in cmds:
        if subprocess.run(c).returncode != 0:
            failures += 1
    print(f"{len(cmds) - failures}/{len(cmds)} commands succeeded")
    if failures:
        sys.exit(1)


def cmd_manifest(args):
    entries = []
    for dirpath, _, files in os.walk(args.root):
        for f in sorted(files):
            if not f.lower().endswith(".wav"):
                continue
            wav = os.path.relpath(os.path.join(dirpath, f), args.root)
            stem = os.path.splitext(os.path.join(dirpath, f))[0]
            e = {"audio": wav}
            if os.path.exists(stem + ".npy"):
                e["frames"] = os.path.relpath(stem + ".npy", args.root)
            entries.append(e)
    k = max(int(len(entries) * args.train_frac), 1)
    manifest = {"train": entries[:k], "test": entries[k:] or entries[:1]}
    out = args.out or os.path.join(args.root, "MUSICES.json")
    with open(out, "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"{len(manifest['train'])} train / {len(manifest['test'])} test "
          f"clips → {out}")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("synthetic")
    p.add_argument("--out", required=True)
    p.add_argument("-n", type=int, default=64)
    p.add_argument("--video", action="store_true")
    p.add_argument("--n_frames", type=int, default=16)
    p.add_argument("--frame_size", type=int, default=64)
    p = sub.add_parser("audio")
    p.add_argument("--root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--sample_rate", type=int, default=16000)
    p = sub.add_parser("frames")
    p.add_argument("--root", required=True)
    p.add_argument("--n_frames", type=int, default=16)
    p.add_argument("--frame_size", type=int, default=64)
    p = sub.add_parser("manifest")
    p.add_argument("--root", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--train_frac", type=float, default=0.9)
    p = sub.add_parser("download")
    p.add_argument("--manifest", required=True,
                   help="MUSICES.json-style YouTube-ID manifest")
    p.add_argument("--out", required=True)
    p.add_argument("--format", default="mp4")
    p.add_argument("--dry_run", action="store_true",
                   help="print the yt-dlp/ffmpeg command plan only")
    p = sub.add_parser("extract")
    p.add_argument("--root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--n_frames", type=int, default=16)
    p.add_argument("--frame_size", type=int, default=64)
    p.add_argument("--require_audio", action="store_true",
                   help="fail on clips whose audio cannot be extracted "
                        "without ffmpeg (compressed codecs)")
    args = ap.parse_args()
    {"synthetic": cmd_synthetic, "audio": cmd_audio,
     "frames": cmd_frames, "manifest": cmd_manifest,
     "extract": cmd_extract, "download": cmd_download}[args.cmd](args)


if __name__ == "__main__":
    main()
