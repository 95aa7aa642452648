# Serving image: TPU-ready runtime with models baked in (mirrors the
# reference's Dockerfile pattern of pre-seeding /root/.keras, Dockerfile:7-35,
# adapted to the JAX TPU stack).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        ffmpeg g++ make && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /opt/iss-tpu
COPY pyproject.toml README.md ./
COPY inaspeechsegmenter_tpu ./inaspeechsegmenter_tpu
COPY native ./native
COPY tools ./tools
COPY docker-entrypoint.sh /usr/local/bin/docker-entrypoint.sh

RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir numpy scipy pandas h5py \
    && pip install --no-cache-dir -e . \
    && make -C native

# Bake model weights if present in the build context (offline serving);
# the registry also honors ISS_TPU_MODEL_DIR at runtime.  On a networked
# build host, stage them with:  RUN python tools/fetch_weights.py
RUN mkdir -p /root/.keras/inaSpeechSegmenter && \
    chmod +x /usr/local/bin/docker-entrypoint.sh
# COPY models/ /root/.keras/inaSpeechSegmenter/

# First start with real weights present runs the acceptance battery
# (tools/verify_weights.py) and refuses to serve on FAIL; the JSON report
# lands next to the weights.  ISS_VERIFY_ON_START=0 opts out.
ENTRYPOINT ["docker-entrypoint.sh"]
