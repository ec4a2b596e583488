#!/usr/bin/env bash
# NYUv2 parity runbook: the full reference-protocol pair-folder chain
#   train (pair folders, --with-gt nyu validation) -> test_disp -> eval_depth
# with the canonical rectified-NYU hyperparameters (reference
# scripts/train_nyu.sh + scripts/test_nyu.sh). With real rectified NYU
# present, this one script runs the published-number gate (Abs Rel
# 0.143 r18 rectified, /root/reference/README.md:136-141) with zero new
# code.
#
# Real data:
#   NYU_TRAIN=/data/rectified_nyu NYU_TEST=/data/nyu_test \
#   IMAGENET_WEIGHTS_DIR=... bash scripts/nyu_parity_runbook.sh
#
# Smoke mode (no data needed; synthesizes a miniature NYU and runs the
# whole chain end-to-end in minutes on CPU):
#   SMOKE=1 bash scripts/nyu_parity_runbook.sh
set -euo pipefail
cd "$(dirname "$0")/.."

SMOKE=${SMOKE:-0}
WORK=${WORK:-/tmp/nyu_parity}
NAME=${NAME:-parity_nyu_r18}

if [ "$SMOKE" = "1" ]; then
    # Force CPU (see kitti_parity_runbook.sh: the ambient JAX_PLATFORMS may
    # point at shared TPU hardware; the smoke chain validates plumbing).
    export JAX_PLATFORMS=${SMOKE_PLATFORM:-cpu}
    if [ "$JAX_PLATFORMS" = "cpu" ]; then
        unset PALLAS_AXON_POOL_IPS PALLAS_AXON_REMOTE_COMPILE
    fi
    export JAX_DISABLE_MOST_OPTIMIZATIONS=${JAX_DISABLE_MOST_OPTIMIZATIONS:-1}
    export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_smoke_cache}
    export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
    H=64; W=96  # multiples of 32 (encoder stride)
    EPOCHS=1; BATCH=2; PRETRAIN=0
    NYU_TRAIN="$WORK/smoke/rectified"
    NYU_TEST="$WORK/smoke/test"
    rm -rf "$WORK"
    python tools/make_smoke_nyu.py "$WORK/smoke" --height $H --width $W
else
    # Reference rectified-NYU protocol: 256x320, batch 16, 50 epochs
    # (train_nyu.sh), full-dataset epochs (--epoch-size 0).
    H=256; W=320
    EPOCHS=${EPOCHS:-50}; BATCH=${BATCH:-16}; PRETRAIN=1
    : "${NYU_TRAIN:?set NYU_TRAIN to the rectified NYU pair-folder root}"
    : "${NYU_TEST:?set NYU_TEST to the NYU test root (color/ + depth.npy)}"
fi

RESULTS="$WORK/results"
mkdir -p "$RESULTS"

echo "== [1/3] train (canonical rectified-NYU r18 config) =="
python train.py "$NYU_TRAIN" \
    --folder-type pair --dataset nyu \
    --resnet-layers 18 --num-scales 1 \
    -b$BATCH -s0.1 -c0.5 --epoch-size 0 --epochs $EPOCHS \
    --with-ssim 1 --with-mask 1 --with-auto-mask 1 \
    --with-pretrain $PRETRAIN \
    ${IMAGENET_WEIGHTS_DIR:+--imagenet-weights-dir "$IMAGENET_WEIGHTS_DIR"} \
    --with-gt --no-tensorboard --name "$NAME"

CKPT_DIR=$(ls -dt checkpoints/"$NAME"/*/ | head -1)
DISP_NET="$CKPT_DIR/dispnet_model_best.msgpack"
echo "   checkpoints: $CKPT_DIR"

echo "== [2/3] test_disp (NYU test inference) =="
python test_disp.py --resnet-layers 18 --img-height $H --img-width $W \
    --pretrained-dispnet "$DISP_NET" --dataset-dir "$NYU_TEST/color" \
    --output-dir "$RESULTS"

echo "== [3/3] eval_depth (NYU protocol: Abs Rel / Log10 gate) =="
python eval_depth.py --dataset nyu \
    --pred_depth "$RESULTS/predictions.npy" --gt_depth "$NYU_TEST/depth.npy"

echo "NYU RUNBOOK COMPLETE — artifacts under $RESULTS"
