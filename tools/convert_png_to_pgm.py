#!/usr/bin/env python3
"""PNG -> 8-bit binary PGM converter (reference T4 parity:
cpp/tools/convert_templering_png_to_pgm.py — prepares the
``<root>/templeRing_pgm/`` input directory for the C++ pipeline).

Usage: python tools/convert_png_to_pgm.py <root> [--src-subdir templeRing]
"""

import argparse
import sys
from pathlib import Path


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("root", type=Path)
    ap.add_argument("--src-subdir", default="templeRing")
    ap.add_argument("--dst-subdir", default="templeRing_pgm")
    args = ap.parse_args(argv)

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from sfm_tpu.utils.dataset import load_image_gray, write_pgm

    src = args.root / args.src_subdir
    dst = args.root / args.dst_subdir
    dst.mkdir(parents=True, exist_ok=True)
    n = 0
    for png in sorted(src.glob("*.png")):
        write_pgm(dst / (png.stem + ".pgm"), load_image_gray(png))
        n += 1
    print(f"converted {n} images -> {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
