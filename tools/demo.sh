#!/usr/bin/env bash
# Batch demo driver (reference tools/demo.sh surface): run the end-to-end
# video -> keypoints pipeline over a list of frame directories.
#
#   tools/demo.sh CONFIG CHECKPOINT FRAME_DIR [FRAME_DIR...]
set -euo pipefail
CFG="$1"; CKPT="$2"; shift 2
for FRAMES in "$@"; do
  OUT="demo_out/$(basename "$FRAMES")"
  echo "==> $FRAMES -> $OUT"
  python "$(dirname "$0")/demo.py" --cfg "$CFG" --checkpoint "$CKPT" \
      --frames "$FRAMES" --out "$OUT" --vis
done
