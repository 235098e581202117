# Serving container for the TPU-native diarized-transcription framework.
# The TPU replacement for the reference's CUDA serverless image
# (reference Dockerfile): a TPU-VM base with libtpu, the libav decoder
# built at image build time, converted model weights mounted or baked,
# and the aiohttp job server as the entry point.

FROM python:3.12-slim

ENV PYTHONUNBUFFERED=1 \
    WNT_MODEL_DIR=/models \
    WNT_SERVING_MODEL=large-v2

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential make \
        libavcodec-dev libavformat-dev libavutil-dev libswresample-dev \
    && rm -rf /var/lib/apt/lists/*

# jax[tpu] pulls libtpu for TPU VMs; CPU wheels serve local testing
ARG JAX_EXTRA=tpu
RUN pip install --no-cache-dir \
        "jax[${JAX_EXTRA}]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        numpy regex nltk pydantic aiohttp

WORKDIR /app
COPY whisper_nemo_tpu ./whisper_nemo_tpu
COPY diarize.py diarize_parallel.py nemo_process.py pyproject.toml ./

RUN make -C whisper_nemo_tpu/audio/native

# build-time import smoke tests (reference Dockerfile:70-72 contract)
RUN python -c "import whisper_nemo_tpu; import whisper_nemo_tpu.serving" \
    && python -c "from whisper_nemo_tpu.audio import decode_audio"

EXPOSE 8000
CMD ["python", "-m", "whisper_nemo_tpu.serving.handler"]
