#!/bin/bash
# MPT-1B ablation of record — parity with reference
# scripts/training/train_mpt_model.sh:23-40 (global batch 128 = 4 x 4 x 8).
set -e
DATA=${DATA:-/data/train/mir-{000000..000999}.tar}
python -m llark_tpu.train.train \
  --model_name_or_path mpt-1b \
  --tune_mm_mlp_adapter true \
  --mm_use_audio_start_end true \
  --mm_hidden_size 4800 \
  --train_data_path "$DATA" \
  --output_dir ./checkpoints/llark-mpt1b \
  --model_max_length 2048 \
  --per_device_train_batch_size 4 \
  --gradient_accumulation_steps 8 \
  --learning_rate 5e-5 \
  --warmup_ratio 0.03 \
  --lr_scheduler_type cosine \
  --max_steps 100000 \
  --save_steps 25000 \
  --save_total_limit 1 \
  --bf16 true \
  --gradient_checkpointing true \
  --mesh_shape 1,4,1
