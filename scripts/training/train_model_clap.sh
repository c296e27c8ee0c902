#!/bin/bash
# CLAP-encoder variant — identical to LLark but 512-d audio embeddings
# (parity with reference scripts/clap/train_model_clap.sh:22-33).
set -e
MODEL=${MODEL:-/path/to/llama-2-7b-chat-hf}
DATA=${DATA:-/data/train-clap/mir-{000000..000999}.tar}
python -m llark_tpu.train.train \
  --model_name_or_path "$MODEL" \
  --mm_hidden_size 512 \
  --train_data_path "$DATA" \
  --output_dir ./checkpoints/llark-clap \
  --model_max_length 2048 \
  --per_device_train_batch_size 2 \
  --gradient_accumulation_steps 4 \
  --learning_rate 5e-5 \
  --warmup_ratio 0.03 \
  --lr_scheduler_type cosine \
  --max_steps 100000 \
  --save_steps 5000 \
  --bf16 true \
  --gradient_checkpointing true \
  --mesh_shape 1,4,1
