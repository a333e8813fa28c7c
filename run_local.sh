#!/bin/bash
# Canonical local runs (port of reference src/run_local.sh / run_slurm.sh /
# pgm/run.sh hyperparameter sets).
set -e

exp_name="${1:-morphomnist_default}"
data_dir="${2:-/root/reference/datasets/morphomnist}"

case "$exp_name" in
  morphomnist_default)
    # reference run_local.sh:3-15 (cond_prior morphomnist run)
    python main.py \
      --hps morphomnist \
      --data_dir "$data_dir" \
      --exp_name "$exp_name" \
      --beta 1 \
      --bs 32 \
      --lr 1e-3 \
      --wd 0.01 \
      --eval_freq 4
    ;;
  ukbb192)
    # reference run_slurm.sh:22-37 (beta=5, z_max_res=96)
    python main.py \
      --hps ukbb192 \
      --data_dir "$data_dir" \
      --exp_name "$exp_name" \
      --beta 5 \
      --z_max_res 96 \
      --eval_freq 2
    ;;
  mimic192)
    # reference run_slurm.sh:39-52 (beta=9)
    python main.py \
      --hps mimic192 \
      --data_dir "$data_dir" \
      --exp_name "$exp_name" \
      --beta 9 \
      --bs 16 \
      --eval_freq 2
    ;;
  pgm)
    python -m causal_gen_tpu.cli.train_pgm \
      --dataset morphomnist --setup sup_pgm \
      --data_dir "$data_dir" --lr 1e-4 --bs 32
    ;;
  aux)
    python -m causal_gen_tpu.cli.train_pgm \
      --dataset morphomnist --setup sup_aux \
      --data_dir "$data_dir" --lr 1e-4 --bs 32
    ;;
  cf)
    # reference pgm/run.sh:25-37 (alpha=0.1 counterfactual fine-tuning)
    python -m causal_gen_tpu.cli.train_cf \
      --pgm_path checkpoints/sup_pgm_morphomnist/default/checkpoint \
      --predictor_path checkpoints/sup_aux_morphomnist/default/checkpoint \
      --vae_path checkpoints/morphomnist/default/checkpoint \
      --data_dir "$data_dir" \
      --alpha 0.1 --bs 32 --lr 1e-4
    ;;
  *)
    echo "unknown experiment: $exp_name" && exit 1
    ;;
esac
