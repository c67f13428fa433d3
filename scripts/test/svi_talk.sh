#!/bin/bash
# SVI-Talk inference: audio-driven talking head (ref scripts/test/svi_talk.sh).
# Requires the multitalk side weights in --dit_root and a local wav2vec2 dir.
# WARM_COMPILE=1 pre-seeds the persistent compile cache (run once per
# deployment/kernel upgrade; ~5 min; see scripts/warm_compile.py).
[ -n "$WARM_COMPILE" ] && python scripts/warm_compile.py --size 14B
python scripts/test_svi_talk.py \
  --output videos/svi_talk/ \
  --dit_root ./weights/Wan2.1-I2V-14B-480P/ \
  --ref_pad_num -1 \
  --num_clips 50 \
  --num_motion_frames 1 \
  --ref_image_path data/toy_test/talk/obama.png \
  --audio_path data/toy_test/talk/obama_5min.wav \
  --extra_module_root weights/Stable-Video-Infinity/version-1.0/svi-talk.safetensors
