#!/bin/bash
# MagicData-read recipe — reference examples/magicdata-read/cosyvoice/run.sh,
# which is the libritts recipe with openslr-68 paths and dev/test/train set
# names (the two run.sh files differ only in data_url/data_dir/part lists).
# The TPU stack's libritts runner is already parameterized by DATA_DIR, so
# this wrapper just points it at the magicdata kaldi dir.
#
#   bash examples/magicdata-read/run.sh <stage> <stop_stage>
#
# Expects DATA_DIR to hold kaldi files for the merged dev/test/train sets
# (openslr.org/resources/68; local/prepare_data.py equivalent:
# fangyan_tts_tpu.cli.prepare_training_data --mode convert/validate).
set -e
DATA_DIR=${DATA_DIR:-dataset/magicdata-read} \
EXP_DIR=${EXP_DIR:-exp/magicdata-read} \
  exec bash "$(dirname "$0")/../libritts/run.sh" "$@"
