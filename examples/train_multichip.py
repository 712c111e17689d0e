"""Data-parallel training over a device mesh — BASELINE config 5's user journey
(the reference is strictly single-device, /root/reference/README.md:694; this is
the TPU-native scaling story the notebook never had).

On a real TPU slice the mesh spans the chips and GSPMD rides ICI; without one,
``--virtual N`` provisions N virtual CPU devices so the same code runs anywhere:

    python examples/train_multichip.py --virtual 8
    python examples/train_multichip.py --virtual 8 --model-axis 2   # + critic-head TP

Multi-host (one process per host, e.g. a pod slice over DCN): run the same
script on every host with ``--coordinator host0:1234 --num-processes P
--process-id <i>`` — each process feeds its own shard of every global batch.
"""

import argparse
import os



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="provision N virtual CPU devices (no TPU needed)")
    ap.add_argument("--model-axis", type=int, default=1,
                    help="mesh model-axis size (tensor-parallel critic head)")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--max-steps", type=int, default=0,
                    help="hard optimizer-step budget (0 = unbounded)")
    ap.add_argument("--image-size", type=int, default=96)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 for multi-host runs")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}").strip()
    import jax
    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    if args.coordinator:
        from vaegan_tpu.parallel import dist
        dist.initialize(coordinator_address=args.coordinator,
                        num_processes=args.num_processes,
                        process_id=args.process_id)

    from vaegan_tpu.config import preset
    from vaegan_tpu.parallel.train import train_data_parallel

    cfg = preset("notebook")
    cfg = cfg.replace(
        data=cfg.data.replace(
            image_size=args.image_size, batch_size=args.batch_size,
            root_dir=args.data_dir or "nii", synthetic=args.data_dir is None),
        train=cfg.train.replace(n_epochs=args.epochs, dtype="bfloat16",
                                max_steps=args.max_steps or None),
        parallel=cfg.parallel.replace(num_model=args.model_axis),
    )
    state, logger = train_data_parallel(cfg)
    steps = int(jax.device_get(state.step))
    tail = [m for m in logger.history if "_wall_s" in m]
    rate = tail[-1]["_images_per_sec"] if tail else float("nan")
    if jax.process_index() == 0:
        print(f"trained {steps} steps over {len(jax.devices())} devices "
              f"({jax.process_count()} process(es)) — {rate:.1f} img/s")


if __name__ == "__main__":
    main()
