#!/bin/bash
# SVI-Dance inference: pose-conditioned animation (ref scripts/test/svi_dance.sh).
# WARM_COMPILE=1 pre-seeds the persistent compile cache (run once per
# deployment/kernel upgrade; ~5 min; see scripts/warm_compile.py).
[ -n "$WARM_COMPILE" ] && python scripts/warm_compile.py --size 14B
python scripts/test_svi_dance.py \
  --output videos/svi_dance \
  --dit_root ./weights/Wan2.1-I2V-14B-480P/ \
  --cfg_scale_text 2.0 \
  --ref_pad_num -1 \
  --num_clips 10 \
  --num_steps 50 \
  --num_motion_frames 1 \
  --image_path data/toy_test/dance/image.png \
  --pose_path data/toy_test/dance/pose.mp4 \
  --extra_module_root weights/Stable-Video-Infinity/version-1.0/svi-dance.safetensors
