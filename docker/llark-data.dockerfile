# Data-factory image (CPU): jsonify / convert / crop / annotate /
# instruction generation / WebDataset packing.
# Reference counterpart: docker/m2t-preprocess.dockerfile (Beam SDK +
# madmom + ffmpeg). This build needs none of those: audio decode/resample
# is native C++ (llark_tpu/native/audioproc.cpp), the annotators are
# numpy DSP (llark_tpu/audio/{dsp,annotate}.py), and fan-out is plain
# multiprocess sharding (--num-shards/--shard-index) instead of Beam.
FROM python:3.12-slim

ARG DEBIAN_FRONTEND=noninteractive
RUN apt-get update --fix-missing && \
    apt-get install -y --no-install-recommends g++ make && \
    rm -rf /var/lib/apt/lists/*

RUN python -m pip install --no-cache-dir --upgrade pip setuptools
RUN python -m pip install --no-cache-dir numpy jax[cpu] msgpack

COPY llark_tpu /llark/llark_tpu
COPY pyproject.toml /llark/
WORKDIR /llark
RUN python -m pip install -e . --no-deps  # images pin their own runtime set above
ENV PYTHONPATH="${PYTHONPATH}:/llark"

# jsonify:  python -m llark_tpu.preprocessing.jsonify_cli --dataset musiccaps ...
# pipeline: python -m llark_tpu.preprocessing.pipeline_cli crop|annotate|...
# instruct: python -m llark_tpu.instruct.fetch_openai --input ... (needs OPENAI_API_KEY)
# pack:     python -m llark_tpu.preprocessing.pack_webdataset --input ...
