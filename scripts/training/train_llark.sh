#!/bin/bash
# Hyperparameters of record for the LLark model (Llama-2-7b-chat + Jukebox
# embeddings) — parity with reference scripts/training/train_llark.sh:24-44,
# rebuilt for one TPU slice: the 4-GPU DDP launch becomes a GSPMD mesh
# (data=1, fsdp=4, tensor=1); global batch 32 = bs 2 x accum 4 x 4 chips.
# tune_mm_mlp_adapter=true + unfrozen backbone = the reference's record
# run: full model trains, original embedding rows detached, projector
# side-saved (reference m2t/train.py:143-164 flag semantics).
set -e
MODEL=${MODEL:-/path/to/llama-2-7b-chat-hf}   # HF checkpoint dir (imported)
DATA=${DATA:-/data/train/mir-{000000..000999}.tar}
python -m llark_tpu.train.train \
  --model_name_or_path "$MODEL" \
  --mm_hidden_size 4800 \
  --mm_use_audio_start_end true \
  --tune_mm_mlp_adapter true \
  --train_data_path "$DATA" \
  --output_dir ./checkpoints/llark-7b \
  --model_max_length 2048 \
  --per_device_train_batch_size 2 \
  --gradient_accumulation_steps 4 \
  --learning_rate 5e-5 \
  --warmup_ratio 0.03 \
  --lr_scheduler_type cosine \
  --max_steps 100000 \
  --save_steps 5000 \
  --save_total_limit 1 \
  --logging_steps 1 \
  --bf16 true \
  --gradient_checkpointing true \
  --mesh_shape 1,4,1
