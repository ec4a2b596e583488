# 5-frame snippet pose evaluation on seqs 09/10.
POSE_NET=${POSE_NET:-checkpoints/resnet50_pose_256/exp_pose_model_best.msgpack}
KITTI_VO=${KITTI_VO:-/data/kitti_odom_test/}

python test_pose.py $POSE_NET \
--img-height 256 --img-width 832 \
--dataset-dir $KITTI_VO \
--sequences 09

python test_pose.py $POSE_NET \
--img-height 256 --img-width 832 \
--dataset-dir $KITTI_VO \
--sequences 10
