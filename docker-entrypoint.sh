#!/bin/sh
# Serving entrypoint: run the released-weight acceptance battery ONCE when
# real model files are baked/mounted (mirroring the reference's baked-model
# Docker pattern, reference Dockerfile:18-35), then exec the CLI.
#
# * ISS_VERIFY_ON_START=0 skips the battery entirely.
# * The battery runs only when weight files (hdf5/pth/onnx) are visible and
#   no pass-stamp exists; a PASS writes the stamp so later container starts
#   boot instantly; a FAIL refuses to serve (a corrupt/mismatched weight
#   set must not segment silently wrong).
# * The machine-readable report lands next to the weights
#   (verify_report.json) for fleet tooling to collect.
set -e

MODEL_DIR="${ISS_TPU_MODEL_DIR:-/root/.keras/inaSpeechSegmenter}"
STAMP="$MODEL_DIR/.verify_weights_ok"

if [ "${ISS_VERIFY_ON_START:-1}" != "0" ] && [ ! -f "$STAMP" ] && \
   ls "$MODEL_DIR"/*.hdf5 "$MODEL_DIR"/*.pth "$MODEL_DIR"/*.onnx \
      >/dev/null 2>&1; then
    echo "[entrypoint] model files present in $MODEL_DIR:" \
         "running released-weight acceptance battery"
    if python /opt/iss-tpu/tools/verify_weights.py \
         --json "$MODEL_DIR/verify_report.json" \
         ${ISS_VERIFY_MEDIA_DIR:+--media-dir "$ISS_VERIFY_MEDIA_DIR"}; then
        date -u > "$STAMP"
    else
        echo "[entrypoint] acceptance battery FAILED" \
             "(see $MODEL_DIR/verify_report.json); refusing to serve." >&2
        exit 1
    fi
fi

exec ina_speech_segmenter "$@"
