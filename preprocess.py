#!/usr/bin/env python
"""Offline preprocessing CLI: .h5 k-space volumes -> normalized .npy slices
+ metadata.csv.

Parity with the reference's ``preprocessing_script.py`` (studied, not
copied), with the mask parameters configurable instead of hard-coded.

Usage:
    python preprocess.py --path <h5 dir> [--output <dir>]
        [--masks 0.05:6 0.1:6] [--synthetic N]
"""

from __future__ import annotations

import argparse


def parse_mask(spec: str) -> tuple[float, int]:
    cf, acc = spec.split(":")
    return float(cf), int(acc)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--path", "-p", required=True, help="directory of .h5 files")
    parser.add_argument("--output", "-o", default=None)
    parser.add_argument(
        "--masks",
        nargs="+",
        default=["0.05:6", "0.1:6"],
        help="center_fraction:acceleration pairs",
    )
    parser.add_argument(
        "--synthetic",
        type=int,
        default=0,
        metavar="N",
        help="first generate N synthetic phantom volumes into --path",
    )
    # hard-mode phantom knobs (data/synthetic.py): complex phase maps,
    # k-space noise at a target SNR, band-limited tissue texture
    parser.add_argument("--phase", action="store_true",
                        help="synthetic: complex phase maps")
    parser.add_argument("--snr-db", type=float, default=None,
                        help="synthetic: k-space noise SNR in dB")
    parser.add_argument("--texture", type=float, default=0.0,
                        help="synthetic: texture amplitude (e.g. 0.18)")
    from mri_inr_tpu.utils.platform import add_platform_arg, select_platform

    add_platform_arg(parser)
    args = parser.parse_args()
    select_platform(args.platform, args.devices)

    from mri_inr_tpu.data.preprocessing import process_files

    if args.synthetic:
        from mri_inr_tpu.data.synthetic import write_synthetic_h5

        paths = write_synthetic_h5(
            args.path, num_files=args.synthetic,
            phase=args.phase, snr_db=args.snr_db, texture=args.texture,
        )
        print(f"wrote {len(paths)} synthetic volumes to {args.path}")

    masks = [parse_mask(m) for m in args.masks]
    metadata = process_files(args.path, args.output, masks)
    print(f"metadata written to {metadata}")


if __name__ == "__main__":
    main()
