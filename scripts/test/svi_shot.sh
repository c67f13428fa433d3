#!/bin/bash
# SVI-Shot inference: single motion frame, full reference padding (ref
# scripts/test/svi_shot.sh). Same flags as the reference driver; weights are
# the official Wan2.1-I2V-14B-480P checkpoint dir + the SVI LoRA module.
# WARM_COMPILE=1 pre-seeds the persistent compile cache (run once per
# deployment/kernel upgrade; ~5 min; see scripts/warm_compile.py).
[ -n "$WARM_COMPILE" ] && python scripts/warm_compile.py --size 14B
python scripts/test_svi.py \
  --output videos/svi_shot/ \
  --dit_root ./weights/Wan2.1-I2V-14B-480P/ \
  --ref_pad_num -1 \
  --cfg_scale_text 5.0 \
  --num_motion_frames 1 \
  --ref_image_path data/toy_test/shot/frame.jpg \
  --prompt_path data/toy_test/shot/prompt.txt \
  --use_first_prompt_only \
  --extra_module_root weights/Stable-Video-Infinity/version-1.0/svi-shot.safetensors
