"""Experiment bookkeeping (behavioral ref: utils/project_utils.py).

print_args config echo, experiment-dir naming, args->YAML/JSON provenance dump
(rank-0 style gating collapses to a simple write here — JAX single-process)."""

from __future__ import annotations

import json
import os


def update_experiment_path(args, short: bool = True):
    """Derive an experiment dir name from the run config (ref :7-27)."""
    parts = [getattr(args, "train_architecture", "lora")]
    if getattr(args, "train_architecture", "lora") == "lora":
        parts.append(str(getattr(args, "lora_rank", 128)))
    name = "_".join(parts)
    prefix = getattr(args, "exp_prefix", None)
    if prefix:
        name = f"{prefix}-{name}"
    full = os.path.join(args.output_path, name)
    os.makedirs(full, exist_ok=True)
    args.output_path = full
    return args


def print_args(args):
    """Aligned config echo (ref :30-44)."""
    d = vars(args)
    width = max(len(k) for k in d)
    print("=" * 80)
    print("CONFIGURATION PARAMETERS:")
    print("=" * 80)
    for k in sorted(d):
        print(f"  {k.ljust(width)} : {d[k]}")
    print("=" * 80)
    print(f"Total number of cfg parameters: {len(d)}")
    print("=" * 80)


def save_args(args, output_path: str, filename: str = "args.yaml"):
    """Provenance dump (ref save_args_to_yaml :46-109); YAML when available,
    JSON otherwise."""
    os.makedirs(output_path, exist_ok=True)
    path = os.path.join(output_path, filename)
    d = {k: (v if isinstance(v, (int, float, str, bool, list, type(None))) else str(v))
         for k, v in vars(args).items()}
    try:
        import yaml

        with open(path, "w") as f:
            yaml.safe_dump(d, f, sort_keys=True)
    except ImportError:
        with open(os.path.splitext(path)[0] + ".json", "w") as f:
            json.dump(d, f, indent=2, sort_keys=True)
    return path


def generate_metadata_with_captions(video_dir, caption_dir, output_csv,
                                    default_text="A person is dancing"):
    """Caption-dir -> metadata.csv (ref utils/metadata_gen.py): one row per
    video with its caption (or the default)."""
    import csv

    rows = []
    for f in sorted(os.listdir(video_dir)):
        if not f.lower().endswith((".mp4", ".mov", ".avi", ".mkv")):
            continue
        stem = os.path.splitext(f)[0]
        caption = default_text
        for ext in (".txt", ".caption"):
            cp = os.path.join(caption_dir, stem + ext)
            if os.path.exists(cp):
                with open(cp, "r", encoding="utf-8") as fh:
                    content = fh.read().strip()
                if content:
                    caption = content
                break
        rows.append({"Filename": f, "Video Description": caption})
    with open(output_csv, "w", newline="", encoding="utf-8") as fh:
        writer = csv.DictWriter(fh, fieldnames=["Filename", "Video Description"])
        writer.writeheader()
        writer.writerows(rows)
    return len(rows)
