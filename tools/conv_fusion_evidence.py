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
from collections import Counter
from pathlib import Path


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

    # --- the decisive number: HBM bytes vs the fully-fused ideal -------------
    # If the compiled block moves ~the same bytes a perfectly-fused schedule
    # would (each conv reads its input once + writes its output once + weights;
    # all BN/LeakyReLU/dropout elementwise work rides along for free; BN-stat
    # reductions re-read each conv output once in train mode), then no
    # elementwise chain is round-tripping HBM and the north-star "fused
    # kernels" property holds regardless of how XLA groups its fusions.
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    measured = ca.get("bytes accessed", float("nan"))
    bpe = jnp.dtype(dt).itemsize

    def nbytes(shape, itemsize=None):
        n = 1
        for s in shape:
            n *= s
        return n * (itemsize or bpe)

    # pre-activation downsample block (mode="downsample"): conv1 and the
    # shortcut conv are both 3x3 stride-2 (cin -> c), conv2 is 3x3 stride-1;
    # all three conv outputs live at the downsampled resolution.
    b, hw, c = args.batch, args.image_size, args.channels
    cin = c // 2
    x_b = nbytes((b, hw, hw, cin))                  # block input
    o_b = nbytes((b, hw // 2, hw // 2, c))          # every conv output
    w_b = (9 * cin * c + 9 * c * c + 9 * cin * c) * bpe
    # reads: conv1(x), shortcut(x), conv2(h), residual-add(shortcut out);
    # writes: h, shortcut out, block out. Dropout masks are generated
    # in-register (rng-bit-generator => no HBM), BN normalize/act ride conv
    # prologues. Aggressive ideal assumes BN-stat reductions ride the
    # PRODUCING conv's epilogue (no re-read); conservative charges one extra
    # read per train-mode BN (bn1 over x, bn2 over h, sc_bn over sc out).
    ideal_aggr = 2 * x_b + 5 * o_b + w_b
    ideal_cons = ideal_aggr + x_b + 2 * o_b
    print(f"\nbytes accessed (XLA cost analysis): {measured/1e6:.1f} MB")
    print(f"fully-fused ideal: {ideal_aggr/1e6:.1f} MB (BN stats ride conv "
          f"epilogues) .. {ideal_cons/1e6:.1f} MB (each BN stats pass re-reads)")
    print(f"ratio measured/ideal: {measured/ideal_cons:.2f}x .. "
          f"{measured/ideal_aggr:.2f}x  "
          f"(~1x => the elementwise chains cost no extra HBM round-trips)")


if __name__ == "__main__":
    main()
