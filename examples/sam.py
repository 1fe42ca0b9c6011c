#!/usr/bin/env python
"""SAM segmentation CLI — the sam example analog (/root/reference/examples/
sam/main.cpp): -m model.bin -i image -p "x,y" prints mask stats per output."""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser(description="SAM point-prompt segmentation")
    p.add_argument("-m", "--model", required=True, help="sam ggml .bin")
    p.add_argument("-i", "--inp", required=True,
                   help="image: .npy (H,W,3) array (no image codecs in-box)")
    p.add_argument("-p", "--point", default="0.5,0.5",
                   help="prompt point as x,y pixels or fractions")
    p.add_argument("-o", "--out", default="masks.npy")
    args = p.parse_args()

    from ggml_imax_tpu.models import sam
    cfg, params = sam.load_legacy(args.model)
    img = np.load(args.inp)
    x, y = (float(v) for v in args.point.split(","))
    if x <= 1.0 and y <= 1.0:
        x, y = x * img.shape[1], y * img.shape[0]
    masks, iou = sam.predict(cfg, params, img, (x, y))
    for i in range(masks.shape[0]):
        print(f"mask {i}: iou={iou[i]:.3f} area={int(masks[i].sum())} px")
    np.save(args.out, masks)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
