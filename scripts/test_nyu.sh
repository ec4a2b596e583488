# NYUv2 depth test (256x320) + evaluation with visualizations.
DISPNET=${DISPNET:-checkpoints/r18_rectified_nyu/dispnet_model_best.msgpack}
DATA_ROOT=${DATA_ROOT:-/data/nyu_test}
RESULTS_DIR=${RESULTS_DIR:-results/nyu_test/}

python test_disp.py --resnet-layers 18 --img-height 256 --img-width 320 \
--pretrained-dispnet $DISPNET --dataset-dir $DATA_ROOT/color \
--output-dir $RESULTS_DIR

python eval_depth.py \
--dataset nyu \
--pred_depth=$RESULTS_DIR/predictions.npy \
--gt_depth=$DATA_ROOT/depth.npy \
--img_dir $DATA_ROOT/color --vis_dir $RESULTS_DIR
