# Colormapped disparity dump for a directory of images.
INPUT_DIR=${INPUT_DIR:-/data/kitti_odometry/sequences/09/image_2}
OUTPUT_DIR=${OUTPUT_DIR:-results/}
DISP_NET=${DISP_NET:-checkpoints/resnet18_depth_256/dispnet_model_best.msgpack}

python run_inference.py --pretrained $DISP_NET --resnet-layers 18 \
--dataset-dir $INPUT_DIR --output-dir $OUTPUT_DIR --output-disp
