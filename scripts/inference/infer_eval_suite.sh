#!/bin/bash
# Batched inference over the four eval sets + scripted metrics — replaces
# the reference's m2t/infer.py docstring invocations (infer.py:19-83) and
# the five metric notebooks.
set -e
CKPT=${CKPT:-./checkpoints/llark-7b}
EVAL=${EVAL:-/data/eval}
python -m llark_tpu.inference.from_webdataset --checkpoint-dir "$CKPT" \
  --data-path "$EVAL/gtzan-test-000000.tar" --output-csv gtzan.csv \
  --prompt "What genre is this song?"
python -m llark_tpu.evaluation.harness genre --results gtzan.csv \
  --labels "$EVAL/gtzan-labels.jsonl" \
  --label-set blues,classical,country,disco,hiphop,jazz,metal,pop,reggae,rock
python -m llark_tpu.inference.from_webdataset --checkpoint-dir "$CKPT" \
  --data-path "$EVAL/giantsteps-test-000000.tar" --output-csv gs_key.csv \
  --prompt "What key is this song in?"
python -m llark_tpu.evaluation.harness key --results gs_key.csv \
  --labels "$EVAL/giantsteps-labels.jsonl"
python -m llark_tpu.inference.from_webdataset --checkpoint-dir "$CKPT" \
  --data-path "$EVAL/giantsteps-test-000000.tar" --output-csv gs_tempo.csv \
  --prompt "What is the tempo of this song, in beats per minute?"
python -m llark_tpu.evaluation.harness tempo --results gs_tempo.csv \
  --labels "$EVAL/giantsteps-labels.jsonl"
python -m llark_tpu.inference.from_webdataset --checkpoint-dir "$CKPT" \
  --data-path "$EVAL/musicnet-test-000000.tar" --output-csv mn_inst.csv \
  --prompt "What instruments do you hear in this recording?"
python -m llark_tpu.evaluation.harness instruments --results mn_inst.csv \
  --labels "$EVAL/musicnet-labels.jsonl" \
  --vocab violin,viola,cello,piano,clarinet,bassoon,horn,oboe,flute
