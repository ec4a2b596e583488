#!/usr/bin/env bash
# KITTI Abs-Rel parity runbook: the full reference-protocol chain
#   prepare -> pack -> train -> test_disp -> eval_depth -> test_vo -> eval_odom
# with the canonical hyperparameters (reference scripts/train_resnet18_depth_256.sh,
# test_kitti_depth.sh, test_kitti_vo.sh). The moment real KITTI data is
# present, this one script runs the published-number gate (Eigen Abs Rel
# 0.119 / odom seq 09-10, /root/reference/README.md:122-135) with zero new code.
#
# Real data:
#   KITTI_RAW=/data/kitti_raw DEPTH_TEST=/data/kitti_depth_test \
#   ODOM=/data/kitti_odom/sequences IMAGENET_WEIGHTS_DIR=... \
#   bash scripts/kitti_parity_runbook.sh
#
# Smoke mode (no data needed; synthesizes a miniature KITTI and runs the
# whole chain end-to-end in minutes on CPU):
#   SMOKE=1 bash scripts/kitti_parity_runbook.sh
set -euo pipefail
cd "$(dirname "$0")/.."

SMOKE=${SMOKE:-0}
WORK=${WORK:-/tmp/kitti_parity}
NAME=${NAME:-parity_r18}
SEQ=${SEQ:-09}

if [ "$SMOKE" = "1" ]; then
    # Force CPU: the ambient JAX_PLATFORMS may point at shared TPU hardware,
    # and the smoke chain only validates plumbing. SMOKE_PLATFORM overrides.
    export JAX_PLATFORMS=${SMOKE_PLATFORM:-cpu}
    if [ "$JAX_PLATFORMS" = "cpu" ]; then
        # Site customizations key a hardware PJRT plugin off these vars and
        # override jax_platforms; drop them so CPU really means CPU.
        unset PALLAS_AXON_POOL_IPS PALLAS_AXON_REMOTE_COMPILE
    fi
    # The smoke validates plumbing, not codegen: skip XLA's slow backend
    # optimization pipeline (~8x faster compiles, same results at these
    # shapes) and cache compiles across smoke runs.
    export JAX_DISABLE_MOST_OPTIMIZATIONS=${JAX_DISABLE_MOST_OPTIMIZATIONS:-1}
    export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_smoke_cache}
    export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
    H=64; W=128  # must be multiples of 32 (encoder stride)
    EPOCHS=1; EPOCH_SIZE=4; BATCH=2; PRETRAIN=0
    KITTI_RAW="$WORK/smoke/raw"
    DEPTH_TEST="$WORK/smoke/depth_test"
    ODOM="$WORK/smoke/odom"
    GT_DIR="$WORK/smoke/odom/gt"
    rm -rf "$WORK"
    python tools/make_smoke_kitti.py "$WORK/smoke" --height $H --width $W --seq "$SEQ"
else
    H=256; W=832
    EPOCHS=${EPOCHS:-200}; EPOCH_SIZE=${EPOCH_SIZE:-1000}
    BATCH=${BATCH:-4}; PRETRAIN=1
    : "${KITTI_RAW:?set KITTI_RAW to the KITTI raw root}"
    : "${DEPTH_TEST:?set DEPTH_TEST to the Eigen test root (color/ + depth/)}"
    : "${ODOM:?set ODOM to the odometry sequences root (<seq>/image_2)}"
    GT_DIR=${GT_DIR:-kitti_eval/gt_poses}
fi

TRAIN_SET="$WORK/train_set"
RESULTS="$WORK/results"
mkdir -p "$RESULTS"

echo "== [1/6] prepare_train_data =="
if [ ! -f "$TRAIN_SET/train.txt" ]; then
    python data/prepare_train_data.py "$KITTI_RAW" --dataset-format kitti_raw \
        --dump-root "$TRAIN_SET" --width $W --height $H --num-threads 4
else
    echo "   (reusing $TRAIN_SET)"
fi

echo "== [2/6] pack (decode-once uint8 memmap) =="
[ -d "$TRAIN_SET/packed" ] || python -m sc_sfmlearner_release_tpu.data.packed "$TRAIN_SET"

echo "== [3/6] train (canonical r18 config) =="
python train.py "$TRAIN_SET" \
    --resnet-layers 18 --num-scales 1 \
    -b$BATCH -s0.1 -c0.5 --epoch-size $EPOCH_SIZE --epochs $EPOCHS \
    --sequence-length 3 \
    --with-ssim 1 --with-mask 1 --with-auto-mask 1 \
    --with-pretrain $PRETRAIN \
    ${IMAGENET_WEIGHTS_DIR:+--imagenet-weights-dir "$IMAGENET_WEIGHTS_DIR"} \
    --packed --device-augment --fused-steps ${FUSED_STEPS:-1} \
    --no-tensorboard --name "$NAME"

CKPT_DIR=$(ls -dt checkpoints/"$NAME"/*/ | head -1)
DISP_NET="$CKPT_DIR/dispnet_model_best.msgpack"
POSE_NET="$CKPT_DIR/exp_pose_model_best.msgpack"
echo "   checkpoints: $CKPT_DIR"

echo "== [4/6] test_disp (Eigen inference) =="
python test_disp.py --resnet-layers 18 --img-height $H --img-width $W \
    --pretrained-dispnet "$DISP_NET" --dataset-dir "$DEPTH_TEST/color" \
    --output-dir "$RESULTS"

echo "== [5/6] eval_depth (Abs Rel gate) =="
python eval_depth.py --dataset kitti \
    --pred_depth "$RESULTS/predictions.npy" --gt_depth "$DEPTH_TEST/depth"

echo "== [6/6] test_vo + eval_odom (seq $SEQ) =="
python test_vo.py --pretrained-posenet "$POSE_NET" \
    --img-height $H --img-width $W \
    --dataset-dir "$ODOM" --sequence "$SEQ" --output-dir "$RESULTS/vo"
python kitti_eval/eval_odom.py --result "$RESULTS/vo" --gt_dir "$GT_DIR" \
    --align 7dof --seqs "$SEQ" --no-confirm --no-plot

echo "RUNBOOK COMPLETE — artifacts under $RESULTS"
