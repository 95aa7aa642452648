#!/bin/sh
# Serving entrypoint: run the released-weight acceptance battery ONCE when
# real model files are baked/mounted (mirroring the reference's baked-model
# Docker pattern, reference Dockerfile:18-35), then exec the CLI.
#
# * ISS_VERIFY_ON_START=0 skips the battery entirely.
# * The battery runs when any weight file (hdf5/pth/onnx) is visible and
#   the pass-stamp is absent or does not match the current weight set's
#   digest; a PASS stamps the digest so unchanged-weight restarts boot
#   instantly; a FAIL refuses to serve (a corrupt/mismatched weight set
#   must not segment silently wrong).
# * The machine-readable report lands next to the weights
#   (verify_report.json) for fleet tooling to collect.
set -e

MODEL_DIR="${ISS_TPU_MODEL_DIR:-/root/.keras/inaSpeechSegmenter}"
STAMP="$MODEL_DIR/.verify_weights_ok"

# ANY weight file triggers the battery (each glob tested separately: a
# multi-glob ls fails whenever one extension is absent, which would let a
# partial weight set — e.g. the 3 segmentation hdf5s alone — boot
# unverified).  The stamp records a digest (name+size+mtime) of the weight
# files it validated, so replacing weights in the same volume re-runs the
# battery instead of trusting a stale PASS.
have_weights=0
for f in "$MODEL_DIR"/*.hdf5 "$MODEL_DIR"/*.pth "$MODEL_DIR"/*.onnx; do
    [ -e "$f" ] && have_weights=1 && break
done
weights_digest() {
    # shell-only fingerprint: filename, byte size, mtime of every weight file
    for f in "$MODEL_DIR"/*.hdf5 "$MODEL_DIR"/*.pth "$MODEL_DIR"/*.onnx; do
        [ -e "$f" ] || continue
        # wc -c is POSIX; mtime via ls -l is stable enough within one volume
        printf '%s %s %s\n' "$f" "$(wc -c < "$f")" "$(date -r "$f" -u +%s 2>/dev/null || echo 0)"
    done
}

if [ "$have_weights" = "1" ] && [ "${ISS_VERIFY_ON_START:-1}" != "0" ] && \
   { [ ! -f "$STAMP" ] || [ "$(cat "$STAMP")" != "$(weights_digest)" ]; }; then
    echo "[entrypoint] model files present in $MODEL_DIR:" \
         "running released-weight acceptance battery"
    if python /opt/iss-tpu/tools/verify_weights.py \
         --json "$MODEL_DIR/verify_report.json" \
         ${ISS_VERIFY_MEDIA_DIR:+--media-dir "$ISS_VERIFY_MEDIA_DIR"}; then
        weights_digest > "$STAMP"
    else
        echo "[entrypoint] acceptance battery FAILED" \
             "(see $MODEL_DIR/verify_report.json); refusing to serve." >&2
        exit 1
    fi
fi

exec ina_speech_segmenter "$@"
