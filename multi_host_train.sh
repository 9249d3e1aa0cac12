#!/bin/bash
# Experiment parallelism: one sweep worker per TPU host/slice
# (the multi_gpu_train.sh equivalent, SURVEY.md §2.4 — the reference runs one
# wandb agent per GPU; here each worker process owns its chip(s)).
#
# Usage: ./multi_host_train.sh <sweep.yaml> [num_workers]
SWEEP=${1:?usage: multi_host_train.sh <sweep.yaml> [workers]}
WORKERS=${2:-1}
python sweep.py "$SWEEP" --workers "$WORKERS"
