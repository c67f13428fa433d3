#!/bin/bash
# SVI-Tom (Tom&Jerry cartoon) inference (ref scripts/test/svi_tom.sh).
# WARM_COMPILE=1 pre-seeds the persistent compile cache (run once per
# deployment/kernel upgrade; ~5 min; see scripts/warm_compile.py).
[ -n "$WARM_COMPILE" ] && python scripts/warm_compile.py --size 14B
python scripts/test_svi.py \
  --output videos/svi_tom/ \
  --dit_root ./weights/Wan2.1-I2V-14B-480P/ \
  --ref_pad_num 0 \
  --cfg_scale_text 5.0 \
  --num_motion_frames 1 \
  --ref_image_path data/toy_test/tom/frame.png \
  --prompt_path data/toy_test/tom/prompt.txt \
  --extra_module_root weights/Stable-Video-Infinity/version-1.0/svi-tom.safetensors
