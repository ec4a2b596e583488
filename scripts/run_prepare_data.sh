# Dump KITTI raw to the 832x256 training format with GT depth.
DATASET=${DATASET:-/data/kitti_raw/}
TRAIN_SET=${TRAIN_SET:-/data/kitti_256/}
STATIC_FILES=${STATIC_FILES:-data/static_frames.txt}   # ships with the reference/KITTI tooling
TEST_SCENES=${TEST_SCENES:-data/test_scenes.txt}
python data/prepare_train_data.py $DATASET --dataset-format kitti_raw \
  --dump-root $TRAIN_SET --width 832 --height 256 --num-threads 8 \
  --static-frames $STATIC_FILES --test-scenes $TEST_SCENES --with-depth

# kitti odometry:
# python data/prepare_train_data.py /data/kitti_odom --dataset-format kitti_odom \
#   --dump-root /data/kitti_vo_256 --width 832 --height 256 --num-threads 8
# cityscapes:
# python data/prepare_train_data.py /data/cityscapes --dataset-format cityscapes \
#   --dump-root /data/cs_256 --width 832 --height 342 --num-threads 8
