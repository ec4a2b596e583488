# Full-trajectory VO on seqs 09/10 + KITTI odometry evaluation (7-DoF align).
DATASET_DIR=${DATASET_DIR:-/data/kitti_odom_test/sequences/}
GT_DIR=${GT_DIR:-kitti_eval/gt_poses}   # GT trajectories for seqs 00-10 ship in-repo
OUTPUT_DIR=${OUTPUT_DIR:-vo_results/}
POSE_NET=${POSE_NET:-checkpoints/resnet50_pose_256/exp_pose_model_best.msgpack}

python test_vo.py \
--img-height 256 --img-width 832 \
--sequence 09 \
--pretrained-posenet $POSE_NET --dataset-dir $DATASET_DIR --output-dir $OUTPUT_DIR

python test_vo.py \
--img-height 256 --img-width 832 \
--sequence 10 \
--pretrained-posenet $POSE_NET --dataset-dir $DATASET_DIR --output-dir $OUTPUT_DIR

python ./kitti_eval/eval_odom.py --result=$OUTPUT_DIR --gt_dir=$GT_DIR --align=7dof --no-confirm
