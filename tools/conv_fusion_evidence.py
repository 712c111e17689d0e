"""Evidence for the north-star "fused res-block" clause (BASELINE.json).

Round 2 measured that hand-fusing the res-block BN+LeakyReLU+dropout chains into
Pallas kernels LOSES 12% (BENCH_NOTES): XLA already fuses those elementwise
chains into the convolutions' epilogues/prologues, and a pallas_call forces a
materialization boundary. This tool turns that claim into inspectable compiler
output: it compiles one pre-activation ResBlockVAE forward (train mode, p=0.5)
for the attached TPU and reports, for every convolution in the optimized HLO,
which elementwise ops live INSIDE the same fusion computation.

    python tools/conv_fusion_evidence.py            # notebook-scale block
    python tools/conv_fusion_evidence.py --hlo out.txt   # also dump full HLO

Expected result (recorded in BENCH_NOTES): every conv fusion carries the
neighboring batch-norm multiply/adds, the LeakyReLU compare/select, and the
dropout rng-bits/compare/select in its prologue or epilogue — i.e. the chain
never round-trips HBM between conv and elementwise work, which is exactly what
the north star's "fused kernels" mandate is about.
"""

import argparse
import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from vaegan_tpu.models.blocks import ResBlockVAE


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--image-size", type=int, default=96)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--hlo", help="dump the full optimized HLO here")
    args = ap.parse_args()

    dt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[args.dtype]
    blk = ResBlockVAE(out_channels=args.channels, mode="downsample",
                      dropout_prob=0.5, dtype=dt)
    x = jnp.zeros((args.batch, args.image_size, args.image_size,
                   args.channels // 2), dt)
    key = jax.random.key(0)
    variables = jax.jit(lambda: blk.init(
        {"params": key, "dropout": key}, x, train=True))()

    def fwd(v, x, k):
        out, _ = blk.apply(v, x, train=True, rngs={"dropout": k},
                           mutable=["batch_stats"])
        return out

    compiled = jax.jit(fwd).lower(variables, x, jax.random.key(1)).compile()
    hlo = compiled.as_text()
    if args.hlo:
        Path(args.hlo).write_text(hlo)

    # --- parse: map each fusion computation to the ops it contains ------------
    # optimized HLO text: computations are "%name (param...) -> type {" blocks
    comps = {}
    cur = None
    for line in hlo.splitlines():
        m = re.match(r"^\s*%?([\w.\-]+)\s*\([^)]*\)\s*->.*{", line)
        if m:
            cur = m.group(1)
            comps[cur] = []
        elif cur and "=" in line:
            op = re.match(r"\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*[^ ]+ ([\w\-]+)\(", line)
            if op:
                comps[cur].append(op.group(1))

    # fusion instructions in the entry computation reference their computation
    fusion_calls = re.findall(r"fusion\([^)]*\).*?calls=%?([\w.\-]+)", hlo)
    conv_fusions = []
    elementwise = {"multiply", "add", "subtract", "compare", "select", "maximum",
                   "rsqrt", "divide", "rng-bit-generator", "shift-right-logical",
                   "convert", "broadcast"}
    for fname in fusion_calls:
        ops = Counter(comps.get(fname, []))
        if ops.get("convolution"):
            conv_fusions.append((fname, ops))

    print(f"backend: {jax.devices()[0].platform} ({jax.devices()[0].device_kind})")
    print(f"fusions in entry: {len(fusion_calls)}; containing a convolution: "
          f"{len(conv_fusions)}")
    for fname, ops in conv_fusions:
        fused_ew = {k: v for k, v in ops.items() if k in elementwise}
        print(f"\n  fusion {fname}: convolution x{ops['convolution']}")
        print(f"    fused elementwise ops in the same kernel: "
              f"{dict(sorted(fused_ew.items()))}")

    # any standalone elementwise-only fusions would be HBM round-trips between
    # conv stages — count them for honesty
    standalone = [f for f in fusion_calls
                  if not comps.get(f) or "convolution" not in comps[f]]
    print(f"\nfusions without a convolution (loop/in-place/reduce fusions, "
          f"BN-stat reductions etc.): {len(standalone)}")
    ops_total = Counter(op for f in fusion_calls for op in comps.get(f, []))
    print(f"op totals across all fusions: "
          f"{dict(sorted(ops_total.most_common(12)))}")


if __name__ == "__main__":
    main()
