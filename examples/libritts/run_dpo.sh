#!/bin/bash
# DPO fine-tuning variant (reference: examples/libritts/cosyvoice3/run_dpo.sh):
# parquet shards must carry reject_speech_token columns
# (cli/make_parquet_list --dpo), then the llm trains with the sigmoid DPO
# loss against a frozen reference copy (train/dpo.py).
set -e
DATA_DIR=${DATA_DIR:-dataset/libritts}
PARQUET_DIR=${PARQUET_DIR:-${DATA_DIR}/parquet_dpo}
EXP_DIR=${EXP_DIR:-exp/libritts/llm_dpo}
PRETRAIN_DIR=${PRETRAIN_DIR:-pretrained_models/Fun-CosyVoice3-0.5B}
PY=${PY:-python}

$PY -m fangyan_tts_tpu.cli.make_parquet_list --dpo \
    --src_dir "$DATA_DIR" --des_dir "$PARQUET_DIR"
head -n -1 "$PARQUET_DIR/data.list" > "$PARQUET_DIR/train.data.list"
tail -n 1 "$PARQUET_DIR/data.list" > "$PARQUET_DIR/cv.data.list"

$PY -m fangyan_tts_tpu.cli.train --model llm --dpo \
    --train_data "$PARQUET_DIR/train.data.list" \
    --cv_data "$PARQUET_DIR/cv.data.list" \
    --model_dir "$EXP_DIR" --mesh "${MESH:-dp=1}" \
    --qwen_pretrain_path "$PRETRAIN_DIR/tokenizer" \
    --lr 1e-6 --scheduler constantlr --accum_grad 2 --max_epoch 10
