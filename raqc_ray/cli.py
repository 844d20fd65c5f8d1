"""CLI entry point — the ``raqc <config>`` analog (SURVEY.md §3.1/§3.3).

Usable directly or via ``ray job submit -- python -m raqc_ray.cli ...``.
Owns its Ray session (guarded init, shutdown on exit) — library code never
touches ray.init.

Examples::

    python -m raqc_ray.cli validate --input /data/e1 \
        --captions /data/e1/captions.parquet --epoch e1 --out /tmp/out/e1

    python -m raqc_ray.cli validate-pair --baseline /data/e1 --current /data/e2 \
        --out /tmp/out --checkpoint /tmp/ckpt

    python -m raqc_ray.cli gen-fixture --root /tmp/fx --profile t1
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _collect_parts(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.startswith("part-") and f.endswith(".parquet")
        )
    return [path]


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="raqc_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="run the constraint suite on one epoch")
    v.add_argument("--input", required=True, help="partition dir or parquet file")
    v.add_argument("--captions", default="", help="captions side table")
    v.add_argument("--epoch", default="e1")
    v.add_argument("--out", required=True)
    v.add_argument("--checkpoint", default="", help="resume root (optional)")
    v.add_argument("--exposure-permille", type=int, default=None,
                   help="enable the ExposureCheck: flag images whose "
                        "clipped-pixel fraction exceeds this permille")
    v.add_argument("--plots", action="store_true",
                   help="render hist2d + flag-map images (S8) under --out")

    vp = sub.add_parser("validate-pair", help="epoch pair + drift verdicts")
    vp.add_argument("--baseline", required=True)
    vp.add_argument("--current", required=True)
    vp.add_argument("--out", required=True)
    vp.add_argument("--plots", action="store_true",
                    help="render hist2d + flag-map images (S8) under --out")

    g = sub.add_parser("gen-fixture", help="deterministic synthetic fixture")
    g.add_argument("--root", required=True)
    g.add_argument("--profile", default="t1")
    g.add_argument("--seed", type=int, default=42)

    args = p.parse_args(argv)
    ray = _init_ray(args.num_cpus)
    try:
        from .config import default_image_config
        from .io import write_outputs

        if args.cmd == "validate":
            from .pipelines import validate_epoch, validate_epoch_checkpointed

            cfg = default_image_config(args.epoch, captions_path=args.captions)
            if args.exposure_permille is not None:
                from .config import ExposureCheck

                cfg.checks.append(ExposureCheck(
                    max_clip_permille=args.exposure_permille))
            parts = _collect_parts(args.input)
            if args.checkpoint:
                res = validate_epoch_checkpointed(parts, cfg, args.checkpoint)
            else:
                res = validate_epoch(parts, cfg)
            outputs = write_outputs(res, args.out)
            if args.plots:
                from .plots import write_epoch_plots

                outputs["plots"] = write_epoch_plots(res, args.out)
            print(json.dumps(outputs, default=str))
        elif args.cmd == "validate-pair":
            from .pipelines import validate_epoch_pair

            c1 = default_image_config(
                "e1", captions_path=os.path.join(args.baseline, "captions.parquet")
            )
            c2 = default_image_config(
                "e2", captions_path=os.path.join(args.current, "captions.parquet")
            )
            r1, r2 = validate_epoch_pair(
                _collect_parts(args.baseline), _collect_parts(args.current), c1, c2
            )
            out = {
                "e1": write_outputs(r1, os.path.join(args.out, "e1")),
                "e2": write_outputs(r2, os.path.join(args.out, "e2")),
            }
            if args.plots:
                from .plots import write_epoch_plots

                out["plots"] = (write_epoch_plots(r1, args.out)
                                + write_epoch_plots(r2, args.out))
            print(json.dumps(out, default=str))
        elif args.cmd == "gen-fixture":
            from .fixtures import generate

            m = generate(args.root, args.profile, seed=args.seed, parallel=True)
            print(json.dumps(m))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
