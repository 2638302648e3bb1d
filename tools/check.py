#!/usr/bin/env python
"""Count unique gray values in a mask PNG (reference check.py:6-21)."""

import argparse

import numpy as np
from PIL import Image


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("mask_path")
    args = parser.parse_args()
    mask = np.asarray(Image.open(args.mask_path))
    if mask.ndim == 3:
        mask = mask[..., 0]
    values, counts = np.unique(mask, return_counts=True)
    print(f"{args.mask_path}: {len(values)} unique values")
    for v, c in zip(values, counts):
        print(f"  {v}: {c} px")


if __name__ == "__main__":
    main()
