#!/bin/bash
# SVI-Film inference: 5 motion frames, no reference padding (ref
# scripts/test/svi_film.sh).
# WARM_COMPILE=1 pre-seeds the persistent compile cache (run once per
# deployment/kernel upgrade; ~5 min; see scripts/warm_compile.py).
[ -n "$WARM_COMPILE" ] && python scripts/warm_compile.py --size 14B
python scripts/test_svi.py \
  --output videos/svi_film/ \
  --dit_root ./weights/Wan2.1-I2V-14B-480P/ \
  --ref_pad_num 0 \
  --cfg_scale_text 5.0 \
  --num_motion_frames 5 \
  --ref_image_path data/toy_test/film/frame.jpg \
  --prompt_path data/toy_test/film/prompt.txt \
  --extra_module_root weights/Stable-Video-Infinity/version-1.0/svi-film-opt-10212025.safetensors
