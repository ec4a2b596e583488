# Pose training on KITTI odometry dumps (sequences 00-08) @ 832x256.
TRAIN_SET=${TRAIN_SET:-/data/kitti_vo_256/}
python train.py $TRAIN_SET \
--resnet-layers 50 \
--num-scales 1 \
-b4 -s0.1 -c0.5 --epoch-size 1000 --sequence-length 3 \
--with-ssim 1 --with-mask 1 --with-auto-mask 1 --with-pretrain 1 ${IMAGENET_WEIGHTS_DIR:+--imagenet-weights-dir "$IMAGENET_WEIGHTS_DIR"} \
--log-output \
--name resnet50_pose_256
