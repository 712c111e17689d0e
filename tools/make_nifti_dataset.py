"""Generate a reference-sized NIfTI dataset on disk for end-to-end data-path runs.

The reference trains from ~1,200 hand-X-ray NIfTI files its first cell downloads
(/root/reference/README.md:43-45) — unfetchable in this offline environment. This
tool writes the same *volume* of data in the same *container format*: N single-file
NIfTI-1 images rendered from the framework's deterministic synthetic styles at
variable per-image source resolutions (like real scans), with arbitrary intensity
ranges (the loader's min-max normalization has to do real work) and a mix of .nii
and .nii.gz (the native decoder's zlib path engages on a third of the files).

Feeding `examples/reproduce_headline.py --data-dir` with this directory exercises
the FULL ingest chain on real files: NiftiDataset -> C++ batch decode (bilinear
resize in native code) -> CachedDataset -> loader -> train, i.e. the path the
reference's own runs take (README.md:50-99), not the in-process synthetic
stand-in.

    python tools/make_nifti_dataset.py --out nii_blobs --n 1200
    python examples/reproduce_headline.py --vae --data-dir nii_blobs --dtype float32
"""

import argparse
import json
import time
from pathlib import Path

import numpy as np

from vaegan_tpu.data.nifti import resize_bilinear, write_nifti


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--n", type=int, default=1200,
                    help="number of images (the reference's dataset is ~1200)")
    ap.add_argument("--style", default="blobs",
                    choices=["blobs", "edges", "texture"],
                    help="synthetic style (matches SyntheticDataset's; "
                         "'texture' renders the fine field at source_size//4 "
                         "like SyntheticDataset does at image_size//4)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--min-size", type=int, default=280)
    ap.add_argument("--max-size", type=int, default=420,
                    help="per-image source resolution drawn uniformly from "
                         "[min,max] per axis (real scans vary; the resize path "
                         "must actually run)")
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    # the same low-frequency generative process as SyntheticDataset (12x12
    # normal fields bilinearly upsampled), rendered at native per-file size
    base = rng.normal(size=(args.n, 12, 12)).astype(np.float32)
    sizes = rng.integers(args.min_size, args.max_size + 1, size=(args.n, 2))
    # arbitrary per-file intensity ranges, like real scanner output
    scales = rng.uniform(500.0, 4000.0, size=args.n).astype(np.float32)
    offsets = rng.uniform(-200.0, 800.0, size=args.n).astype(np.float32)

    def quantize(img, levels=6):
        lo, hi = img.min(), img.max()
        img = (img - lo) / max(hi - lo, 1e-12)
        return np.floor(img * levels).clip(max=levels - 1) / (levels - 1)

    t0 = time.time()
    total_bytes = 0
    for i in range(args.n):
        h, w = int(sizes[i, 0]), int(sizes[i, 1])
        img = resize_bilinear(base[i], h, w)
        if args.style == "edges":
            img = quantize(img)
        elif args.style == "texture":
            fine = rng.normal(size=(max(h // 4, 3), max(w // 4, 3))).astype(np.float32)
            img = 0.6 * quantize(img) + 0.4 * quantize(resize_bilinear(fine, h, w))
        else:
            lo, hi = img.min(), img.max()
            img = (img - lo) / max(hi - lo, 1e-12)
        img = img * scales[i] + offsets[i]
        name = f"img_{i:04d}.nii" + (".gz" if i % 3 == 0 else "")
        write_nifti(out / name, img.astype(np.float32))
        total_bytes += (out / name).stat().st_size
    print(json.dumps({
        "out": str(out), "n": args.n, "style": args.style,
        "size_range": [args.min_size, args.max_size],
        "disk_mb": round(total_bytes / 1e6, 1),
        "wall_s": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
