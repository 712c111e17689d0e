"""Multi-seed paired VAE-GAN vs plain-VAE runs on edge-rich data.

Round 4 discovered that the single-seed quality records behind the round-3
"VAE-GAN > VAE on edges" claim sit inside an enormous seed/RNG-stream spread:
at the reference's 96^2 batch-4 x 3-epoch recipe, LIVE eval-mode MSE ranged
0.04-0.5 across otherwise-identical runs with nearly identical train recon
(~0.13-0.17) — BatchNorm running-stat drift luck, the same pathology
`recalibrate_bn_stats` repaired 12x at 256^2 (BENCH_NOTES). A one-seed
ordering is therefore not evidence.

This tool makes the claim (or its refutation) seed-robust: N seeds x 2 arms,
each arm trained by `examples/reproduce_headline.py` at the same recipe, each
endpoint evaluated BOTH live and after BN standing-stats recalibration, every
number anchored to the dataset's mean-predictor floor. The paired per-seed
comparison on the recalibrated iterate is the primary readout (recalibration
removes the drift-luck component that dominates the live numbers).

    python tools/edges_multiseed.py --seeds 4 --image-size 96 \
        --style edges --out result/edges_multiseed

Writes runs.jsonl + summary.json and prints the summary line. Runs are
serialized child processes (one chip, one host core).

Reference finding being tested: the VAE-GAN's published MSE advantage over the
plain VAE (/root/reference/README.md:1266 vs :1319).
"""

import argparse
import json
import subprocess
import sys
from pathlib import Path


def run_arm(vae: bool, seed: int, args) -> dict:
    cmd = [
        sys.executable, "-u", "examples/reproduce_headline.py",
        "--image-size", str(args.image_size),
        "--batch-size", str(args.batch_size),
        "--epochs", str(args.epochs),
        *(["--data-dir", args.data_dir] if args.data_dir
          else ["--data-style", args.style]),
        "--seed", str(seed),
        "--recalibrate-bn", str(args.recalibrate_bn),
        "--dtype", args.dtype,
        "--out", f"{args.out}/runs/{'vae' if vae else 'vaegan'}_s{seed}",
    ]
    if vae:
        cmd.append("--vae")
    if args.save_visuals_seed == seed:
        cmd += ["--save-visuals", f"{args.out}/visuals"]
    r = subprocess.run(cmd, capture_output=True, text=True,
                       timeout=args.per_run_timeout)
    if r.returncode != 0:
        raise RuntimeError(f"{cmd} failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    rec["seed"] = seed
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument("--image-size", type=int, default=96)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--style", default="edges", choices=["blobs", "edges", "texture"])
    ap.add_argument("--data-dir", default=None,
                    help="on-disk NIfTI dir (e.g. nii_blobs from "
                         "tools/make_nifti_dataset.py): run both arms through "
                         "the REAL file-ingest chain instead of the in-process "
                         "synthetic stand-in (VERDICT r4 #2 — seed-robustness "
                         "of the round-4 single-seed band claim)")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--recalibrate-bn", type=int, default=50)
    ap.add_argument("--save-visuals-seed", type=int, default=0,
                    help="the seed whose endpoints also render the qualitative "
                         "panels (-1: none)")
    ap.add_argument("--per-run-timeout", type=int, default=1800)
    ap.add_argument("--out", default="result/edges_multiseed")
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    runs = []
    runs_path = out / "runs.jsonl"
    for seed in range(args.seeds):
        for vae in (False, True):
            rec = run_arm(vae, seed, args)
            runs.append(rec)
            with open(runs_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps({k: rec[k] for k in
                              ("run", "seed", "eval_mse_repeat_draws",
                               "eval_mse_repeat_draws_bn_recalibrated",
                               "eval_mse_mean_predictor_floor")}), flush=True)

    def best(rec, key):
        return min(rec[key])

    floor = runs[0]["eval_mse_mean_predictor_floor"]
    pairs = []
    for seed in range(args.seeds):
        gan = next(r for r in runs if r["seed"] == seed and r["run"] == "VAE-GAN")
        vae = next(r for r in runs if r["seed"] == seed and r["run"] == "plain-VAE")
        pairs.append({
            "seed": seed,
            "vaegan_live": best(gan, "eval_mse_repeat_draws"),
            "vae_live": best(vae, "eval_mse_repeat_draws"),
            "vaegan_recal": best(gan, "eval_mse_repeat_draws_bn_recalibrated"),
            "vae_recal": best(vae, "eval_mse_repeat_draws_bn_recalibrated"),
        })
    wins_recal = sum(p["vaegan_recal"] < p["vae_recal"] for p in pairs)
    wins_live = sum(p["vaegan_live"] < p["vae_live"] for p in pairs)
    mean = lambda k: round(sum(p[k] for p in pairs) / len(pairs), 4)  # noqa: E731
    summary = {
        "experiment": "paired VAE-GAN vs plain-VAE, multi-seed",
        "operating_point": f"{args.image_size}^2 batch {args.batch_size} x "
                           f"{args.epochs} epochs ({args.dtype}), "
                           f"data={args.data_dir or ('synthetic:' + args.style)}, "
                           f"{args.seeds} seeds",
        "mean_predictor_floor": floor,
        "pairs": pairs,
        "vaegan_wins_recalibrated": f"{wins_recal}/{len(pairs)}",
        "vaegan_wins_live": f"{wins_live}/{len(pairs)}",
        "mean_vaegan_recal": mean("vaegan_recal"),
        "mean_vae_recal": mean("vae_recal"),
        "mean_vaegan_live": mean("vaegan_live"),
        "mean_vae_live": mean("vae_live"),
    }
    (out / "summary.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
