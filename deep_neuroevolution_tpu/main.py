"""CLI entry point — the L6 analog of both reference launchers.

Reference surfaces:
* CPU stack: `python -m es_distributed.main master --algo es --exp_file c.json`
  + a `workers` subcommand per machine (es_distributed/main.py:42-86). The
  master/worker split is Redis plumbing; on TPU one SPMD program does both,
  so the single subcommand is `train`.
* GPU stack: `python es.py configurations/es_atari_config.json`
  (gpu_implementation/es.py:290-293) — covered by the same `train` command
  (the schema is auto-detected) and by `python -m deep_neuroevolution_tpu.train cfg.json`.

Examples:
  python -m deep_neuroevolution_tpu.main train --exp_file configurations/es_maze.json \
      --log_dir /tmp/es_maze --iterations 50
  python -m deep_neuroevolution_tpu.main train --exp_str '{...}' --algo ga
  python -m deep_neuroevolution_tpu.main replay --snapshot snap.pkl --env maze
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# Platform override BEFORE jax initializes: NEVO_PLATFORM=cpu forces a
# host-only run even where a TPU plugin (e.g. the axon tunnel) registers
# itself through sitecustomize and pins jax_platforms via jax.config —
# JAX_PLATFORMS alone cannot win against that. Useful for driving the CLI on
# login/build hosts without claiming the chip.
if os.environ.get("NEVO_PLATFORM"):
    import jax._src.xla_bridge as _xb

    for _p in ("axon",):
        if _p != os.environ["NEVO_PLATFORM"]:
            _xb._backend_factories.pop(_p, None)
    import jax

    jax.config.update("jax_platforms", os.environ["NEVO_PLATFORM"])


_LAST_TRAINER = None  # set by cmd_train; lets tests inspect the live trainer


def cmd_train(args) -> int:
    from .parallel import distributed
    from .utils import checkpoint, config, tabular as tlogger

    distributed.init_multihost()  # no-op single-host; pod coordinator on slices

    if args.exp_file:
        with open(args.exp_file) as f:
            exp = json.load(f)
    else:
        exp = json.loads(args.exp_str)

    if args.log_dir and distributed.is_coordinator():
        os.makedirs(args.log_dir, exist_ok=True)
        tlogger.start(args.log_dir)
    tlogger.log(f"experiment: {json.dumps(exp, sort_keys=True)}")

    overrides = json.loads(args.overrides) if args.overrides else {}
    trainer = config.load_experiment(exp, algo=args.algo, seed=args.seed, overrides=overrides)
    global _LAST_TRAINER  # introspection hook for the multi-process CLI test
    _LAST_TRAINER = trainer

    snap_path = os.path.join(args.log_dir, "snapshot.pkl") if args.log_dir else None
    if snap_path and os.path.exists(snap_path) and not args.no_resume:
        tlogger.log(f"resuming from {snap_path}")
        checkpoint.load_trainer(snap_path, trainer)

    import numpy as np

    it = 0
    while args.iterations == 0 or it < args.iterations:
        # jax.profiler trace of one generation (SURVEY §5.1: the tracing the
        # reference never had — view with tensorboard/xprof)
        if args.profile_dir and it == 2:
            import jax

            with jax.profiler.trace(args.profile_dir):
                stats = trainer.train_step()
        else:
            stats = trainer.train_step()
        it += 1
        if (
            snap_path
            and args.snapshot_freq
            and it % args.snapshot_freq == 0
            and distributed.is_coordinator()
        ):
            checkpoint.save_trainer(snap_path, trainer)
            # reference-style policy snapshot with reward in the name
            # (es.py:345-353); reward = eval mean when evals ran this iter
            rew = None
            er = getattr(stats, "eval_returns", None)
            if er is not None and np.size(er):
                rew = float(np.mean(np.asarray(er)))
            elif getattr(stats, "returns", None) is not None and np.size(stats.returns):
                rew = float(np.mean(np.asarray(stats.returns)))
            pol_path = checkpoint.save_policy_snapshot_auto(args.log_dir, trainer, it, rew)
            tlogger.log(f"saved snapshot to {snap_path}" + (f" + {pol_path}" if pol_path else ""))
    if snap_path and distributed.is_coordinator():
        checkpoint.save_trainer(snap_path, trainer)
    return 0


def cmd_replay(args) -> int:
    from .utils.viz import replay_seed_chain, replay_snapshot

    env_kwargs = json.loads(args.env_kwargs) if args.env_kwargs else None
    if args.seeds:
        # elite-from-seed-chain replay (display.py:30-89)
        noise_table = None
        if args.noise_count:
            from .ops import NoiseTable

            noise_table = NoiseTable.from_seed(count=args.noise_count)
        stats = replay_seed_chain(
            json.loads(args.seeds),
            model_name=args.model,
            env_id=args.env or "maze",
            model_kwargs=json.loads(args.model_kwargs) if args.model_kwargs else None,
            genome_style=args.genome_style,
            noise_stdev=args.noise_stdev,
            noise_table=noise_table,
            episodes=args.episodes,
            save_frames=args.save_frames,
            seed=args.seed,
            env_kwargs=env_kwargs,
        )
    else:
        if not args.snapshot:
            print("replay: provide --snapshot or --seeds", file=sys.stderr)
            return 2
        stats = replay_snapshot(
            args.snapshot,
            env_id=args.env,
            episodes=args.episodes,
            save_frames=args.save_frames,
            seed=args.seed,
            env_kwargs=env_kwargs,
        )
    print(json.dumps(stats))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="deep_neuroevolution_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="run a training experiment (either reference JSON schema)")
    t.add_argument("--exp_file", help="experiment JSON path (main.py:48-57 --exp_file)")
    t.add_argument("--exp_str", help="experiment JSON inline (--exp_str)")
    t.add_argument("--algo", choices=["es", "ga", "rs", "nses"], help="override algorithm (main.py:29-40)")
    t.add_argument("--log_dir", default="", help="tabular/JSONL logs + snapshots")
    t.add_argument("--iterations", type=int, default=0, help="generations to run (0 = until budget)")
    t.add_argument("--snapshot_freq", type=int, default=10)
    t.add_argument("--no_resume", action="store_true")
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--overrides", help='engine knobs JSON, e.g. \'{"eval_batch": 64, "noise_size": 1000000}\'')
    t.add_argument("--profile_dir", default="", help="jax.profiler trace of generation 3 → this dir")
    t.set_defaults(fn=cmd_train)

    r = sub.add_parser(
        "replay", help="roll out a policy snapshot or seed-chain elite (scripts/viz.py + display.py)"
    )
    r.add_argument("--snapshot", default=None)
    r.add_argument("--env", default=None, help="env id override")
    r.add_argument("--episodes", type=int, default=1)
    r.add_argument("--save_frames", default="", help="write frames/trajectory .npz here")
    r.add_argument("--seed", type=int, default=0)
    r.add_argument("--env_kwargs", help='env ctor JSON, e.g. \'{"batch_size": 4, "bc_mode": "traj"}\'')
    # seed-chain elite replay (display.py:30-89): chain instead of snapshot
    r.add_argument("--seeds", help='genome JSON, e.g. "[123, [456, 0.002]]" (gpu) or "[123, 456]" (cpu)')
    r.add_argument("--model", default="ContinuousMLP", help="model registry name for --seeds")
    r.add_argument("--model_kwargs", help="model ctor JSON for --seeds")
    r.add_argument("--genome_style", choices=["gpu", "cpu"], default="gpu")
    r.add_argument("--noise_stdev", type=float, default=0.002, help="cpu-style chain mutation stdev")
    r.add_argument("--noise_count", type=int, default=0, help="noise table size override (0 = full 250M)")
    r.set_defaults(fn=cmd_replay)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
