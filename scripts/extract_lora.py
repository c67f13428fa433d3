"""Extract inference-format LoRA safetensors from a trained checkpoint.

Behavioral reference: utils/extract_lora.py:38-73 — keep `lora_*` (+ side
modules like `dwpose_embedding`) keys, strip `pipe.dit.` prefixes, write
inference safetensors. Accepts our orbax/safetensors checkpoints AND the
reference's DeepSpeed-merged torch checkpoints.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SIDE_MARKERS = ("dwpose_embedding", "randomref_embedding_pose", "inpaint_embedding",
                "learn_in_embedding", "randomref")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", type=str, required=True,
                   help="trained checkpoint (.safetensors / .pth / .ckpt / .bin)")
    p.add_argument("--output", type=str, required=True, help="inference .safetensors")
    args = p.parse_args()

    from safetensors.numpy import save_file

    from svi_tpu.models.model_io import load_state_dict

    sd = load_state_dict(args.input)
    out = {}
    for key, value in sd.items():
        keep = ("lora_" in key) or any(m in key for m in SIDE_MARKERS)
        if not keep:
            continue
        new_key = key.split("pipe.dit.")[1] if "pipe.dit." in key else key
        out[new_key] = np.ascontiguousarray(np.asarray(value, np.float32))
    if not out:
        raise SystemExit(f"no lora_/side-module tensors found in {args.input}")
    save_file(out, args.output)
    print(f"extracted {len(out)} tensors -> {args.output}")


if __name__ == "__main__":
    main()
