#!/bin/bash
# Demo launcher (reference: main.sh): compress lego with LSA at qp=-20.
# On TPU pods, JAX discovers devices itself — no CUDA_VISIBLE_DEVICES pinning.
set -e

python compress_nerf.py \
    --ckpt_path "${CKPT_PATH:-./model_zoo/blender_paper_lego/lego_200000.tar}" \
    --ckpt_nickname lego_200K \
    --base_path_to_save "${SAVE_PATH:-./runs}" \
    --qp -20 \
    --lsa true \
    --epochs 2 \
    --learning_rate 0.0001 \
    --task_type NeRF \
    --dataset_type blender \
    --N_iters 50001 \
    --learning_rate_decay 0.1 \
    --i_save 50000
