# For maximum ingest throughput additionally pack the dataset once
# (python -m sc_sfmlearner_release_tpu.data.packed $TRAIN_SET) and pass
# --packed --device-augment. --fused-steps 16 runs 16 optimizer steps
# per dispatch (identical math; docs/DESIGN.md §1).
# Canonical KITTI depth training, ResNet-18 @ 832x256 (parity with the
# reference's train_resnet18_depth_256.sh hyperparameters).
TRAIN_SET=${TRAIN_SET:-/data/kitti_256/}
python train.py $TRAIN_SET \
--resnet-layers 18 \
--num-scales 1 \
-b4 -s0.1 -c0.5 --epoch-size 1000 --sequence-length 3 \
--with-ssim 1 \
--with-mask 1 \
--with-auto-mask 1 \
--with-pretrain 1 ${IMAGENET_WEIGHTS_DIR:+--imagenet-weights-dir "$IMAGENET_WEIGHTS_DIR"} \
--fused-steps ${FUSED_STEPS:-16} \
--log-output --with-gt \
--name resnet18_depth_256
