"""CLI entrypoint — the deployer/launcher analog (``ray job submit`` target).

Reference: ``deployer/.../CanalLauncher.java`` loads ``canal.properties`` and
starts the instance; here a JSON config file (or flags) builds a
:class:`~canal_ray.config.CdcConfig` and runs the job, printing a lineage
report as the final JSON line.

Usage::

    python -m canal_ray --log-dir .../binlog --lake-dir .../lake \
        [--base-table .../repos.parquet] [--partitions 64] [--follow]
    python -m canal_ray --config job.json [--follow]
    python -m canal_ray --config job.json --compact      # compaction only

Owns the Ray session (guarded init), unlike the library code.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def load_config(args: argparse.Namespace):
    from canal_ray.config import CdcConfig

    if args.config:
        with open(args.config) as f:
            raw = json.load(f)
        # tuples in the dataclass arrive as JSON lists
        for key in ("pk_columns", "initial_schema", "column_filter"):
            if key in raw and raw[key] is not None:
                raw[key] = tuple(
                    tuple(x) if isinstance(x, list) else x for x in raw[key]
                )
        return CdcConfig(**raw)
    if not args.log_dir or not args.lake_dir:
        raise SystemExit("either --config or both --log-dir and --lake-dir required")
    return CdcConfig(
        log_dir=args.log_dir,
        lake_dir=args.lake_dir,
        base_table=args.base_table,
        num_partitions=args.partitions,
        epoch_segments=args.epoch_segments,
        epochs_per_cycle=args.epochs_per_cycle,
        exchange=args.exchange,
        row_filter=args.row_filter,
        txn_aligned_epochs=args.txn_aligned,
    )


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="canal_ray")
    p.add_argument("--config", help="JSON file of CdcConfig fields")
    p.add_argument("--log-dir")
    p.add_argument("--lake-dir")
    p.add_argument("--base-table", default=None)
    p.add_argument("--partitions", type=int, default=32)
    p.add_argument("--epoch-segments", type=int, default=4)
    p.add_argument("--epochs-per-cycle", type=int, default=4)
    p.add_argument("--exchange", choices=["sort", "scatter"], default="scatter")
    p.add_argument(
        "--row-filter", default=None,
        help="content predicate on DML events (canal_ray.rowfilter grammar)",
    )
    p.add_argument(
        "--txn-aligned", action="store_true",
        help="shift ack points to complete-transaction boundaries",
    )
    p.add_argument("--follow", action="store_true", help="tail the log dir")
    p.add_argument("--poll-interval", type=float, default=2.0)
    p.add_argument("--max-idle-polls", type=int, default=3)
    p.add_argument("--compact", action="store_true", help="compact and exit")
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # before ray.init: workers inherit the allocator env (memtune.py).
        # OPT-IN only — measured 11x slower at 32-way (see memtune.py)
        if os.environ.get("CANAL_MEMTUNE", "0") == "1":
            from canal_ray.memtune import apply_allocator_tunables

            apply_allocator_tunables()
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.use_polars_sort = True  # measured: ~25% faster sort exchange
    ctx.target_max_block_size = 256 * 1024 * 1024

    from canal_ray.pipeline import CdcJob

    cfg = load_config(args)
    job = CdcJob(cfg)
    try:
        if args.compact:
            stats = job.compact()
            print(json.dumps({"compacted_partitions": len(stats), "rows": int(stats["rows"].sum())}))
            return 0
        if args.follow:
            report = job.run_follow(
                poll_interval_s=args.poll_interval, max_idle_polls=args.max_idle_polls
            )
        else:
            report = job.run()
        out = {"report": report, "lineage": job.lineage()}
        print(json.dumps(out))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
