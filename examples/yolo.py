#!/usr/bin/env python
"""YOLOv3-tiny detection CLI — the yolo example analog (/root/reference/
examples/yolo): -m model.gguf -i image.npy prints detections."""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

COCO80 = ("person bicycle car motorbike aeroplane bus train truck boat "
          "traffic-light fire-hydrant stop-sign parking-meter bench bird cat "
          "dog horse sheep cow elephant bear zebra giraffe backpack umbrella "
          "handbag tie suitcase frisbee skis snowboard sports-ball kite "
          "baseball-bat baseball-glove skateboard surfboard tennis-racket "
          "bottle wine-glass cup fork knife spoon bowl banana apple sandwich "
          "orange broccoli carrot hot-dog pizza donut cake chair sofa "
          "pottedplant bed diningtable toilet tvmonitor laptop mouse remote "
          "keyboard cell-phone microwave oven toaster sink refrigerator book "
          "clock vase scissors teddy-bear hair-drier toothbrush").split()


def main():
    p = argparse.ArgumentParser(description="YOLOv3-tiny object detection")
    p.add_argument("-m", "--model", required=True, help="yolov3-tiny.gguf")
    p.add_argument("-i", "--inp", required=True,
                   help="image: .npy (3,H,W) float [0,1]")
    p.add_argument("--thresh", type=float, default=0.5)
    args = p.parse_args()

    from ggml_imax_tpu.models import yolo
    params = yolo.load_gguf(args.model)
    img = np.load(args.inp).astype(np.float32)
    dets = yolo.detect(params, img, thresh=args.thresh)
    for d in dets:
        k = int(np.argmax(d.prob))
        if d.prob[k] > 0:
            x, y, w, h = d.box
            print(f"{COCO80[k]}: {100*d.prob[k]:.0f}%  "
                  f"box=({x:.3f},{y:.3f},{w:.3f},{h:.3f})")


if __name__ == "__main__":
    main()
