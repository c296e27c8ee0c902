# Training / serving / embedding-extraction image for TPU VMs.
# Reference counterparts: docker/m2t-train.dockerfile (CUDA training) and
# docker/jukebox-embed.dockerfile (Jukebox GPU inference) — on TPU both
# workloads are plain JAX programs, so one image serves both.
FROM python:3.12-slim

ARG DEBIAN_FRONTEND=noninteractive
RUN apt-get update --fix-missing && \
    apt-get install -y --no-install-recommends g++ make git && \
    rm -rf /var/lib/apt/lists/*

RUN python -m pip install --no-cache-dir --upgrade pip setuptools

# TPU runtime: jax + libtpu from the release channel
RUN python -m pip install --no-cache-dir "jax[tpu]" \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN python -m pip install --no-cache-dir \
    flax optax orbax-checkpoint chex einops numpy transformers safetensors

# torch (CPU wheels) is only needed for HF .bin checkpoint interop
# (llark_tpu/interop/hf.py); skip it for pure-serving images.
RUN python -m pip install --no-cache-dir torch --index-url https://download.pytorch.org/whl/cpu

COPY llark_tpu /llark/llark_tpu
COPY pyproject.toml /llark/
WORKDIR /llark
# builds native/{audioproc,tarloader}.cpp extensions; numpy fallback if g++ absent
RUN python -m pip install -e . --no-deps  # images pin their own runtime set above
ENV PYTHONPATH="${PYTHONPATH}:/llark"

# train:   python -m llark_tpu.train.train --model_name_or_path ... (scripts/training/*.sh)
# extract: python -m llark_tpu.encoders.extract_cli jukebox --input-dir ...
# infer:   python -m llark_tpu.inference.from_webdataset --checkpoint-dir ...
